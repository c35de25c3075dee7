"""Pallas TPU kernel for pairwise rotated BEV overlap.

The XLA formulation (iou.py) materializes (N, M, 4, 4) side-distance
intermediates in HBM (~0.5 GB of traffic at N=M=1024). This kernel tiles the
pair matrix into (TILE_A, TILE_B) blocks: each grid step loads corner tiles
into VMEM (a few KB) and evaluates the full Green's-theorem contribution sum in
registers — HBM traffic drops to the corner reads + one output tile.

Mosaic constraint honored: NO gathers — corners are passed as separate x/y
component arrays and every edge access is a static-index slice; the 4×4
edge-pair interaction is two unrolled python loops over (TILE_A, TILE_B)
elementwise math.

STATUS: correct under `interpret=True` (tests/test_iou_pallas.py); execution
on the current axon-tunneled chip is blocked by the environment (Mosaic remote
compile hangs; local compile hits a libtpu client/terminal version mismatch —
see .claude/skills/verify/SKILL.md). The XLA path (iou.py) remains the default
everywhere; flip callers to this kernel once the tunnel's libtpu is updated.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .boxes import boxes_to_corners_bev

_EPS = 1e-9
_TOL = 1e-6

TILE_A = 128
TILE_B = 128


def _contrib(px_all, py_all, qx_all, qy_all, shift):
    """Green's contribution of P's edges clipped inside quad Q, one tile.

    px_all/py_all: (TP, 4) P corner components (rows = boxes in the tile).
    qx_all/qy_all: (TQ, 4) Q corner components.
    Returns (TP, TQ) float32.
    """
    tp = px_all.shape[0]
    tq = qx_all.shape[0]
    total = jnp.zeros((tp, tq), jnp.float32)
    for k in range(4):
        k1 = (k + 1) % 4
        pax = px_all[:, k].reshape(tp, 1)
        pay = py_all[:, k].reshape(tp, 1)
        qax = px_all[:, k1].reshape(tp, 1)
        qay = py_all[:, k1].reshape(tp, 1)

        t_lo = jnp.zeros((tp, tq), jnp.float32)
        t_hi = jnp.ones((tp, tq), jnp.float32)
        empty = jnp.zeros((tp, tq), bool)
        for j in range(4):
            j1 = (j + 1) % 4
            e1x = qx_all[:, j].reshape(1, tq)
            e1y = qy_all[:, j].reshape(1, tq)
            dx = qx_all[:, j1].reshape(1, tq) - e1x
            dy = qy_all[:, j1].reshape(1, tq) - e1y
            inv_len = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy, _EPS))
            sp = (dx * (pay - e1y) - dy * (pax - e1x)) * inv_len + shift
            sq = (dx * (qay - e1y) - dy * (qax - e1x)) * inv_len + shift
            den = sp - sq
            den = jnp.where(jnp.abs(den) < _EPS, _EPS, den)
            t_cross = sp / den
            p_in = sp >= 0.0
            q_in = sq >= 0.0
            t_lo = jnp.where(~p_in & q_in, jnp.maximum(t_lo, t_cross), t_lo)
            t_hi = jnp.where(p_in & ~q_in, jnp.minimum(t_hi, t_cross), t_hi)
            empty = empty | (~p_in & ~q_in)
        live = (t_hi > t_lo) & ~empty
        segx = qax - pax
        segy = qay - pay
        sx = pax + segx * t_lo
        sy = pay + segy * t_lo
        ex = pax + segx * t_hi
        ey = pay + segy * t_hi
        contrib = 0.5 * (sx * ey - ex * sy)
        total = total + jnp.where(live, contrib, 0.0)
    return total


def _overlap_kernel(ax_ref, ay_ref, bx_ref, by_ref, out_ref):
    ax, ay = ax_ref[:], ay_ref[:]
    bx, by = bx_ref[:], by_ref[:]
    # joint centering for fp32 precision (shared shift cancels in areas)
    mid_x = (jnp.mean(ax) + jnp.mean(bx)) * 0.5
    mid_y = (jnp.mean(ay) + jnp.mean(by)) * 0.5
    ax = ax - mid_x
    bx = bx - mid_x
    ay = ay - mid_y
    by = by - mid_y

    part_a = _contrib(ax, ay, bx, by, +_TOL)          # (TA, TB)
    part_b = _contrib(bx, by, ax, ay, -_TOL)          # (TB, TA)
    out_ref[:] = jnp.maximum(part_a + part_b.T, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_overlap_bev_pallas(boxes_a, boxes_b, interpret: bool = False):
    """Rotated BEV intersection area via the tiled Pallas kernel."""
    ca = boxes_to_corners_bev(boxes_a).astype(jnp.float32)
    cb = boxes_to_corners_bev(boxes_b).astype(jnp.float32)
    n, m = ca.shape[0], cb.shape[0]
    n_pad = -(-n // TILE_A) * TILE_A
    m_pad = -(-m // TILE_B) * TILE_B
    ax = jnp.pad(ca[..., 0], ((0, n_pad - n), (0, 0)))
    ay = jnp.pad(ca[..., 1], ((0, n_pad - n), (0, 0)))
    bx = jnp.pad(cb[..., 0], ((0, m_pad - m), (0, 0)))
    by = jnp.pad(cb[..., 1], ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        _overlap_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=(n_pad // TILE_A, m_pad // TILE_B),
        in_specs=[
            pl.BlockSpec((TILE_A, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_A, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_B, 4), lambda i, j: (j, 0)),
            pl.BlockSpec((TILE_B, 4), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_A, TILE_B), lambda i, j: (i, j)),
        interpret=interpret,
    )(ax, ay, bx, by)
    return out[:n, :m]


def backend_supports_pallas() -> bool:
    import jax

    return jax.default_backend() not in ("cpu",)
