"""Pallas fused gather-GEMM for sparse 3D convolutions.

The XLA formulation (models/sparse_backbone._gather_gemm) issues 27 separate
HBM row-gathers per layer; on the v5e those cost ~3.7 ns/row and dominate the
SECOND train step. This kernel keeps the whole (V+1, Cin) feature table
VMEM-resident per batch element (stage tables are 1-4 MB in bf16 at DFU3D
capacities) and performs the 27 gathers from VMEM inside one fused kernel,
accumulating tap GEMMs on the MXU without materialising any (B, Q, Cin)
gathered tensors in HBM.

Semantics mirror subm/down gather-GEMM (reference spconv rulebook-mm,
pcdet/ops/spconv): out[q] = Σ_k feats[nbr_k(q)] @ W[k], sentinel index V →
zero contribution (the table's padded zero row).

Forward-only fusion: the backward uses the same kernel shape via the
transpose relation (see models/sparse_backbone._shared_gather_bwd); both
directions are pure gathers, so the same pallas_call serves dX with the
offset-reversed table, while dW keeps the XLA einsum path (it is
MXU-bound, not gather-bound).

HARDWARE STATUS (probed 2026-08-17 on the tunnel's libtpu): Mosaic rejects
every vector-gather formulation in-kernel (jnp.take rows, take_along_axis
on sublanes or lanes: "Shape mismatch in input, indices and output";
row-wise fori dynamic-slice: compiler crash). `pallas_sparse_available()`
returns False there and callers keep the XLA gather path. The kernel is
interpret-verified (tests/test_pallas_sparse.py) and becomes usable the
moment the toolchain grows dynamic-gather support — re-probe each round.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block query count: 27 taps × (TQ, Cin) gathers + (TQ, Cout) accumulator
# stay well under the ~16 MB VMEM budget alongside the resident table
_TQ = 512
# largest feature table the kernel will hold resident (bytes, bf16/fp32 aware)
VMEM_TABLE_BUDGET = 6 * 1024 * 1024


def _fused_kernel(nbr_ref, feats_ref, w_ref, out_ref):
    k = nbr_ref.shape[1]
    v1 = feats_ref.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    table = feats_ref[0]
    for j in range(k):
        idx = jnp.clip(nbr_ref[:, j], 0, v1 - 1)
        rows = jnp.take(table, idx, axis=0)
        acc += jnp.dot(rows, w_ref[j], preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def fused_gather_gemm(feats, valid, nbr, kernel, tq: int = _TQ,
                      interpret: bool = False):
    """Pallas twin of models.sparse_backbone._gather_gemm.

    Args:
        feats: (B, V, Cin); valid: (B, V) bool; nbr: (B, Q, K) int32 with
        sentinel V; kernel: (K, Cin, Cout).
    Returns:
        (B, Q, Cout) — rows whose queries were invalid contain garbage from
        padded grid blocks; callers mask by out_valid (they already do).
    """
    b, v, cin = feats.shape
    q, k = nbr.shape[1], nbr.shape[2]
    cout = kernel.shape[-1]
    feats_masked = jnp.where(valid[..., None], feats, 0.0)
    # zero pad row at index V (sentinel target)
    padded = jnp.concatenate(
        [feats_masked, jnp.zeros((b, 1, cin), feats.dtype)], axis=1
    )
    grid = (b, pl.cdiv(q, tq))
    return pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((b, q, cout), feats.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tq, k), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v + 1, cin), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin, cout), lambda bi, qi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tq, cout), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(nbr, padded, kernel)


def table_bytes(v: int, cin: int, dtype) -> int:
    return (v + 1) * cin * jnp.dtype(dtype).itemsize


def fits_vmem(v: int, cin: int, cout: int, dtype) -> bool:
    """Whether the fused kernel's resident table + working set fit VMEM."""
    item = jnp.dtype(dtype).itemsize
    work = _TQ * (27 * item + cin * item + 4 * cout) * 2  # rough double-buffer
    return table_bytes(v, cin, dtype) * 2 + work < VMEM_TABLE_BUDGET * 2


_PROBED = {"ok": None}


def pallas_sparse_available() -> bool:
    """One real compile probe per process (Mosaic support varies by backend:
    works on TPU ≥ 2026-08 tunnel libtpu, unavailable on CPU without
    interpret)."""
    if _PROBED["ok"] is None:
        try:
            f = jnp.zeros((1, 8, 8), jnp.float32)
            n = jnp.zeros((1, 8, 27), jnp.int32)
            w = jnp.zeros((27, 8, 8), jnp.float32)
            out = fused_gather_gemm(f, jnp.ones((1, 8), bool), n, w, tq=8)
            jax.block_until_ready(out)
            _PROBED["ok"] = True
        except Exception:
            _PROBED["ok"] = False
    return _PROBED["ok"]
