"""MPPNet second stage, rebuilt to the reference's real structure (reference:
pcdet/models/roi_heads/mppnet_head.py:298-799, model_utils/mppnet_utils.py:1-420,
mppnet_memory_bank_e2e.py:15-580; config tools/cfgs/waymo_models/mppnet_4frames.yaml).

Structural parity, all static shapes (TPU contract):

* trajectory generation (`generate_trajectory`): current proposals propagated
  frame-by-frame by their velocity and matched to each previous frame's
  proposal set by 3D IoU >= 0.5 (ref mppnet_head.py:635-659) — matched frames
  adopt that frame's proposal, unmatched hold the propagated box, and
  `valid_length` records the matches.
* per-frame point cropping: topk over a cylinder mask of radius
  1.1*half-diagonal, padding slots repeating the first hit and fully-empty
  rois zeroed (ref crop_current/previous_frame_points, :470-548).
* proposal-aware geometry features: offsets to the 8 corners + center of the
  frame's trajectory box -> spherical coordinates normalized by the box
  diagonal, concat raw extra channels, 3-layer MLP (ref :551-573, 454-468).
* proxy points: a dense grid_size^3 grid in each trajectory box per frame;
  geometry features ball-query max-pooled onto the proxies with MSG radii
  (ref roi_grid_pool :403-442 over StackSAModuleMSG).
* motion features: proxy offsets to the CURRENT box's corners+center ->
  spherical, plus a per-frame timestamp channel, 3-layer MLP, added to the
  geometry stream (ref get_proposal_aware_motion_feature :577-606).
* trajectory auxiliary branch: the t0-canonicalized box sequence through a
  PointNet over time -> aux box regression + a joint feature
  (ref trajectories_auxiliary_branch :608-633, mppnet_utils.PointNet).
* transformer: per group a learnable token over that group's proxy tokens;
  each layer runs an intra-group SpatialMixer (axis-MLP mixer over the
  grid_size^3 axes), token<-group attention + FFN, and (all but the last
  layer) inter-group fusion: groups concat -> 4-layer MLP -> per-group
  cross-attention with its own weights (ref mppnet_utils.py:109-363).
  With num_frames > num_groups, frames are strided into groups and fused by
  an MLP first (ref Transformer.forward :197-238).
* heads: per-layer class logits on the first group token (deep supervision),
  per-group aux box regression per layer, and a joint regression over all
  group tokens + the trajectory feature (ref :316,333-338,726-744).
* E2E memory bank: the head can consume a cached geometry-feature bank for
  frames 1..T-1 (computing fresh features only for the current frame) and
  emits the current frame's proxy geometry features as the next bank entry
  (ref mppnet_memory_bank_e2e.py:360-466 `geometory_feature_memory`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import pointnet2 as P
from ..core.geometry.boxes import boxes_to_corners_3d, rotate_points_along_z
from ..core.geometry.iou import pairwise_iou3d


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def spherical_corner_feature(xyz, roi):
    """Offsets of points to a box's 8 corners + center in spherical coords.

    xyz (..., K, 3); roi (..., 7). Returns (..., K, 27): the reference's
    [dis*9, phi*9, theta*9] layout normalized by the box diagonal
    (mppnet_head.py:454-468, 551-566).
    """
    flat_roi = roi.reshape(-1, roi.shape[-1])
    corners = boxes_to_corners_3d(flat_roi).reshape(roi.shape[:-1] + (8, 3))
    anchors = jnp.concatenate([corners, roi[..., None, :3]], axis=-2)  # (...,9,3)
    off = xyz[..., :, None, :] - anchors[..., None, :, :]  # (..., K, 9, 3)
    diag = jnp.sqrt(jnp.sum(roi[..., 3:6] ** 2, axis=-1))  # (...,)
    dis = jnp.sqrt(jnp.sum(off ** 2, axis=-1))
    phi = jnp.arctan(off[..., 1] / (off[..., 0] + 1e-5))
    the = jnp.arccos(jnp.clip(off[..., 2] / (dis + 1e-5), -1.0, 1.0))
    dis = dis / (diag[..., None, None] + 1e-5)
    return jnp.concatenate([dis, phi, the], axis=-1)  # (..., K, 27)


def proxy_points_of_roi(rois, grid_size: int):
    """Dense grid_size^3 proxy points inside each box (ref :380-389, 444-452).

    rois (..., 7) -> global (..., P, 3), local (..., P, 3).
    """
    g = grid_size
    ii, jj, kk = np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                             indexing="ij")
    idx = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3).astype(np.float32)
    local = (jnp.asarray(idx) + 0.5) / g * rois[..., None, 3:6] \
        - rois[..., None, 3:6] / 2
    local = rotate_points_along_z(local, rois[..., 6])
    return local + rois[..., None, :3], local


def crop_roi_frame_points(points, frame_valid, rois, roi_valid, k: int):
    """Sample k points inside each roi's enlarged BEV circle for one frame.

    points (N, C); frame_valid (N,); rois (R, 7); roi_valid (R,).
    Returns (R, k, C) with reference padding semantics (first hit repeated,
    empty rois zeroed; mppnet_head.py:470-548) and nonempty (R,).
    """
    radii = 1.1 * jnp.sqrt(
        (rois[:, 3] / 2) ** 2 + (rois[:, 4] / 2) ** 2
    )
    d = jnp.linalg.norm(points[None, :, :2] - rois[:, None, :2], axis=-1)
    mask = (d <= radii[:, None]) & frame_valid[None, :] & roi_valid[:, None]
    score, idx = jax.lax.top_k(mask.astype(jnp.float32), k)  # (R, k)
    hit = score > 0
    idx = jnp.where(hit, idx, idx[:, :1])  # repeat first hit into padding
    pts = jnp.take(points, idx, axis=0)  # (R, k, C)
    nonempty = jnp.any(hit, axis=1)
    pts = jnp.where(nonempty[:, None, None], pts, 0.0)
    return pts, nonempty


def generate_trajectory(cur_boxes, cur_valid, proposals_list, proposals_valid,
                        iou_thresh: float = 0.5):
    """Backward trajectory by velocity propagation + per-frame IoU matching.

    cur_boxes (B, R, C>=7) — cols 7:9, when present, are the per-frame xy
    displacement (the reference's velocity channels, mppnet_head.py:643-645).
    proposals_list (B, T, Rp, C) — frame f's proposal set (frame 0 unused).
    Returns trajectory_rois (B, T, R, C) and valid_length (B, T, R).
    """
    b, r, c = cur_boxes.shape
    t = proposals_list.shape[1]
    vel = cur_boxes[..., 7:9] if c > 8 else jnp.zeros((b, r, 2), cur_boxes.dtype)

    def match_frame(prev, props, pvalid):
        # prev (R, C): propagate one frame back, then match frame proposals
        prop = prev.at[..., 0:2].add(prev[..., 7:9] if c > 8 else 0.0)
        iou = pairwise_iou3d(prop[:, :7], props[:, :7])
        iou = jnp.where(pvalid[None, :], iou, -1.0)
        best = jnp.argmax(iou, axis=1)
        matched = jnp.max(iou, axis=1) >= iou_thresh
        nxt = jnp.where(matched[:, None], props[best], prop)
        return nxt, matched

    traj = [cur_boxes]
    valid = [cur_valid]
    prev = cur_boxes
    for f in range(1, t):
        prev, matched = jax.vmap(match_frame)(
            prev, proposals_list[:, f], proposals_valid[:, f]
        )
        traj.append(prev)
        valid.append(matched & cur_valid)
    return jnp.stack(traj, axis=1), jnp.stack(valid, axis=1)


# ---------------------------------------------------------------------------
# building-block modules (ref mppnet_utils.py)
# ---------------------------------------------------------------------------

class PlainMLP(nn.Module):
    """Linear/ReLU stack, no norm (ref mppnet_utils.MLP:96-107)."""

    hidden: int
    out: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"fc{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"fc{self.num_layers - 1}")(x)


class ResidualFFN(nn.Module):
    """Residual add + LN + feedforward + LN (ref mppnet_utils.FFN:377-403)."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update):
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm_in")(
            (x + update).astype(jnp.float32)
        ).astype(self.dtype)
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm_out")(
            (x + h).astype(jnp.float32)
        ).astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """Small static MHA (q/k/v/out projections, torch-MHA-shaped)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        # q (..., Lq, D), k/v (..., Lk, D)
        hd = self.dim // self.heads
        dense = lambda nm: nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                                           param_dtype=jnp.float32, name=nm)
        qh, kh, vh = dense("q")(q), dense("k")(k), dense("v")(v)
        logits = jnp.einsum("...lhd,...mhd->...hlm", qh * hd ** -0.5, kh)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("...hlm,...mhd->...lhd", w, vh)
        return nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                               param_dtype=jnp.float32, name="out")(o)


class SpatialMixerBlock(nn.Module):
    """Axis-MLP mixer over the grid_size^3 proxy lattice + channel FFN
    (ref mppnet_utils.SpatialMixerBlock:109-153)."""

    mixer_hidden: int
    grid_size: int
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x (..., P, C) with P = grid_size**3 in lexicographic (i, j, k) order
        g, c = self.grid_size, self.channels
        s = x.reshape(x.shape[:-2] + (g, g, g, c))
        for ax, nm in ((-2, "x"), (-3, "y"), (-4, "z")):
            m = jnp.moveaxis(s, ax, -1)  # mix over one grid axis
            m = PlainMLP(self.mixer_hidden, g, 3, dtype=self.dtype,
                         name=f"mixer_{nm}")(m)
            s = s + jnp.moveaxis(m, -1, ax)
            s = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name=f"norm_{nm}")(
                s.astype(jnp.float32)
            ).astype(self.dtype)
        s = s.reshape(x.shape)
        h = nn.Dense(2 * c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ffn1")(s)
        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ffn2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm_channel")(
            (s + h).astype(jnp.float32)
        ).astype(self.dtype)


class TrajectoryPointNet(nn.Module):
    """Box-sequence PointNet: pointwise conv stack over time, max-pool, and
    center/size/heading aux regression (ref mppnet_utils.PointNet:11-94)."""

    hidden: int  # TRANS_INPUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, box_seq, train: bool):
        # box_seq (..., T, 8)
        x = box_seq.astype(self.dtype)
        for i, c in enumerate((64, 128, 256, 512)):
            x = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"conv{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name=f"bn{i}")(
                x.astype(jnp.float32)
            ).astype(self.dtype)
            if i < 3:
                x = nn.relu(x)
        x = jnp.max(x, axis=-2)  # pool over time
        x = nn.relu(nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc1")(x))
        feat = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                param_dtype=jnp.float32, name="fc2")(x))
        heads = []
        for nm, out in (("ce", 3), ("s", 3), ("hr", 1)):
            h = nn.relu(nn.Dense(256, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"fc_{nm}1")(feat))
            heads.append(nn.Dense(out, use_bias=False, dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name=f"fc_{nm}2")(h))
        box_reg = jnp.concatenate(heads, axis=-1).astype(jnp.float32)
        return box_reg, feat


class MPPNetEncoderLayer(nn.Module):
    """One encoder layer: intra-group mixer + token attention + (optionally)
    inter-group cross attention (ref mppnet_utils.TransformerEncoderLayer
    forward_post:302-345)."""

    hidden: int
    heads: int
    ffn_hidden: int
    mixer_hidden: int
    grid_size: int
    num_groups: int
    inter_group: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tok, grp, pos):
        # tok (B, R, G, 1, H); grp (B, R, G, P, H); pos (P, H) or None
        mixed = SpatialMixerBlock(self.mixer_hidden, self.grid_size,
                                  self.hidden, dtype=self.dtype,
                                  name="mixer")(grp)
        key = mixed if pos is None else mixed + pos
        upd = MultiHeadAttention(self.hidden, self.heads, dtype=self.dtype,
                                 name="token_attn")(tok, key, mixed)
        tok = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm1")(
            (tok + upd).astype(jnp.float32)
        ).astype(self.dtype)
        h = nn.Dense(self.ffn_hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ffn1")(tok)
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ffn2")(nn.relu(h))
        tok = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm2")(
            (tok + h).astype(jnp.float32)
        ).astype(self.dtype)
        grp = mixed

        if self.inter_group:
            # fuse all groups, then each group cross-attends with own weights
            stacked = jnp.concatenate(
                [grp[..., g, :, :] for g in range(self.num_groups)], axis=-1
            )  # (B, R, P, G*H)
            fused = PlainMLP(self.hidden, self.hidden, 4, dtype=self.dtype,
                             name="fusion_all_groups")(stacked)
            key = fused if pos is None else fused + pos
            outs = []
            for g in range(self.num_groups):
                q = grp[..., g, :, :]
                qp = q if pos is None else q + pos
                att = MultiHeadAttention(self.hidden, self.heads,
                                         dtype=self.dtype,
                                         name=f"cross_attn{g}")(qp, key, fused)
                outs.append(ResidualFFN(self.hidden, self.ffn_hidden,
                                        dtype=self.dtype,
                                        name=f"cross_ffn{g}")(q, att))
            grp = jnp.stack(outs, axis=-3)
        return tok, grp


# ---------------------------------------------------------------------------
# the head
# ---------------------------------------------------------------------------

class MPPNetHead(nn.Module):
    """Multi-frame proposal refinement head (reference MPPNetHead structure,
    config-selectable depth; mppnet_4frames.yaml Transformer block)."""

    num_frames: int = 4
    num_groups: int = 4
    sequence_stride: int = 1
    grid_size: int = 4
    num_lidar_points: int = 128
    hidden: int = 64                    # TRANS_INPUT
    enc_layers: int = 3
    nheads: int = 4
    ffn_hidden: int = 256               # dim_feedforward
    mixer_hidden: int = 16
    pool_radii: Sequence[float] = (0.8, 1.6)
    pool_nsample: int = 16
    frame_dt: float = 0.1
    use_grid_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def num_proxy(self) -> int:
        return self.grid_size ** 3

    def _frame_of(self, points):
        lag = points[..., -1]
        return jnp.clip(jnp.round(lag / self.frame_dt).astype(jnp.int32),
                        0, self.num_frames - 1)

    def _geometry_features(self, geo_mlp, pts, traj_roi):
        """Cropped frame points -> per-point geometry features.

        pts (..., K, C); traj_roi (..., 7). Output (..., K, Hg) with
        Hg = hidden // len(pool_radii) (ref up_dimension_geometry, 29->...).
        """
        sph = spherical_corner_feature(pts[..., :3], traj_roi)
        feat = jnp.concatenate([sph, pts[..., 3:]], axis=-1)
        return geo_mlp(feat.astype(self.dtype))

    def _pool_to_proxies(self, pool_mlps, proxies, pts, feats, nonempty):
        """MSG ball-query max-pool of point features onto the proxy grid
        (ref roi_grid_pool over StackSAModuleMSG, :403-442).

        pool_mlps: one Dense-stack per radius (shared across frames/rois).
        proxies (..., P, 3); pts (..., K, C); feats (..., K, Hg);
        nonempty (...,). Output (..., P, hidden).
        """
        lead = proxies.shape[:-2]
        p_flat = proxies.reshape((-1,) + proxies.shape[-2:])
        x_flat = pts.reshape((-1,) + pts.shape[-2:])[..., :3]
        f_flat = feats.reshape((-1,) + feats.shape[-2:])
        ne_flat = nonempty.reshape(-1)
        outs = []
        for radius, mlp in zip(self.pool_radii, pool_mlps):

            def gather_one(prox, xyz, ft, ok, _radius=radius):
                kvalid = jnp.broadcast_to(ok, (xyz.shape[0],))
                pvalid = jnp.broadcast_to(ok, (prox.shape[0],))
                idx, has = P.ball_query(_radius, self.pool_nsample, xyz,
                                        kvalid, prox, pvalid)
                rel = jnp.take(xyz, idx, axis=0) - prox[:, None, :]
                grp = jnp.concatenate(
                    [rel.astype(self.dtype), jnp.take(ft, idx, axis=0)], -1
                )
                return grp, has

            grp, has = jax.vmap(gather_one)(p_flat, x_flat, f_flat, ne_flat)
            pooled = jnp.max(mlp(grp), axis=2)  # (BFR, P, Hg)
            outs.append(jnp.where(has[..., None], pooled, 0.0))
        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(lead + (self.num_proxy, self.hidden))

    def _motion_features(self, proxies, cur_roi):
        """Proxy offsets to the current box + timestamp channel
        (ref get_proposal_aware_motion_feature :577-606).

        proxies (B, R, T, P, 3); cur_roi (B, R, 7). Output (B, R, T, P, H).
        """
        t = self.num_frames
        sph = spherical_corner_feature(
            proxies.reshape(proxies.shape[:2] + (t * self.num_proxy, 3)),
            cur_roi,
        ).reshape(proxies.shape[:-1] + (27,))
        ts = jnp.arange(t, dtype=jnp.float32) * self.frame_dt
        pad = jnp.zeros(proxies.shape[:-1] + (2,))
        tch = jnp.broadcast_to(ts[None, None, :, None, None],
                               proxies.shape[:-1] + (1,))
        feat = jnp.concatenate([sph, pad, tch], axis=-1)  # (..., 30)
        return PlainMLP(64, self.hidden, 3, dtype=self.dtype,
                        name="up_dimension_motion")(feat.astype(self.dtype))

    def _box_sequence(self, trajectory_rois):
        """t0-canonicalized box sequence (ref :608-633): subtract the current
        center, rotate by -ry_t0, zero heading, append timestamps."""
        t = self.num_frames
        seq = jnp.transpose(trajectory_rois[..., :7], (0, 2, 1, 3))  # (B,R,T,7)
        ctr = seq[..., 0:1, 0:3]
        ry0 = jnp.mod(seq[..., 0, 6], 2 * np.pi)  # (B, R)
        xyz = rotate_points_along_z(seq[..., 0:3] - ctr, -ry0)
        ts = jnp.broadcast_to(
            (jnp.arange(t, dtype=jnp.float32) * self.frame_dt)[None, None, :,
                                                               None],
            seq.shape[:-1] + (1,),
        )
        return jnp.concatenate(
            [xyz, seq[..., 3:6], jnp.zeros_like(seq[..., 6:7]), ts], axis=-1
        )  # (B, R, T, 8)

    @nn.compact
    def __call__(self, rois, roi_valid, trajectory_rois, traj_valid, points,
                 points_valid, train: bool, geometry_bank=None,
                 bank_valid=None):
        """rois (B,R,7); trajectory_rois (B,T,R,7+); points (B,N,C) with the
        time-lag channel last. Optional E2E bank: geometry_bank
        (B, T-1, R, P, H) cached proxy geometry features for frames 1..T-1
        with bank_valid (B, T-1, R) (ref mppnet_memory_bank_e2e.py:360-466).

        Returns a dict: rcnn_cls (B,R), rcnn_reg (B,R,7), per-layer
        cls_layers (L,B,R), aux point_reg (L,G,B,R,7), box_reg (B,R,7),
        geometry_memory (B,R,P,H) — the next bank entry.
        """
        b, r = rois.shape[:2]
        t, g_groups = self.num_frames, self.num_groups
        p = self.num_proxy
        hg = self.hidden // len(self.pool_radii)
        frame_of = self._frame_of(points)

        # shared submodules (one definition, reused across frames)
        geo_mlp = PlainMLP(64, hg, 3, dtype=self.dtype,
                           name="up_dimension_geometry")
        pool_mlps = [
            nn.Sequential([
                nn.Dense(hg, dtype=self.dtype, param_dtype=jnp.float32),
                nn.relu,
                nn.Dense(hg, dtype=self.dtype, param_dtype=jnp.float32),
                nn.relu,
            ], name=f"pool_mlp{ri}")
            for ri in range(len(self.pool_radii))
        ]

        # ---- per-frame crop + geometry features --------------------------
        use_bank = geometry_bank is not None
        n_fresh = 1 if use_bank else t  # frames computed from raw points
        glob_all, _ = proxy_points_of_roi(
            jnp.swapaxes(trajectory_rois[..., :7], 1, 2), self.grid_size
        )  # (B, R, T, P, 3)
        proxies = glob_all

        def crop_frames(pt, fv_all, rf_all, rv_all):
            # pt (N, C); fv_all (F, N); rf_all (F, R, 7); rv_all (F, R)
            return jax.vmap(
                lambda fv, rf, rv: crop_roi_frame_points(
                    pt, fv, rf, rv, self.num_lidar_points
                )
            )(fv_all, rf_all, rv_all)

        fvalid = points_valid[:, None, :] & (
            frame_of[:, None, :] == jnp.arange(n_fresh)[None, :, None]
        )  # (B, F, N)
        pts, nonempty = jax.vmap(crop_frames)(
            points, fvalid, trajectory_rois[:, :n_fresh, :, :7],
            traj_valid[:, :n_fresh],
        )  # (B, F, R, K, C), (B, F, R)
        traj_f = jnp.swapaxes(trajectory_rois[:, :n_fresh, :, :7], 1, 2)
        feats = self._geometry_features(
            geo_mlp, jnp.swapaxes(pts, 1, 2), traj_f
        )  # (B, R, F, K, Hg)
        fresh_geo = self._pool_to_proxies(
            pool_mlps, glob_all[:, :, :n_fresh],
            jnp.swapaxes(pts, 1, 2), feats, jnp.swapaxes(nonempty, 1, 2),
        )  # (B, R, F, P, H)

        if use_bank:
            bank = jnp.swapaxes(geometry_bank, 1, 2)  # (B, R, T-1, P, H)
            bank = jnp.where(
                jnp.swapaxes(bank_valid, 1, 2)[..., None, None], bank, 0.0
            )
            geometry = jnp.concatenate([fresh_geo, bank], axis=2)
        else:
            geometry = fresh_geo  # (B, R, T, P, H)
        geometry_memory = geometry[:, :, 0]      # next E2E bank entry

        # ---- motion stream + sum ----------------------------------------
        motion = self._motion_features(proxies, rois[..., :7])
        src = geometry + motion  # (B, R, T, P, H)
        src = jnp.where(roi_valid[:, :, None, None, None], src, 0.0)

        # ---- frame -> group arrangement (ref Transformer.forward) -------
        if t == g_groups:
            grp = src  # frame axis IS the group axis: (B, R, G, P, H)
        else:
            glen = t // g_groups
            stride = self.sequence_stride
            gathered = [
                jnp.concatenate(
                    [src[:, :, (gi + j * stride) % t] for j in range(glen)],
                    axis=-1,
                )
                for gi in range(g_groups)
            ]
            fused = PlainMLP(self.hidden, self.hidden, 4, dtype=self.dtype,
                             name="fusion_all_group")(
                jnp.stack(gathered, axis=2)
            )
            grp = ResidualFFN(self.hidden, self.ffn_hidden, dtype=self.dtype,
                              name="fusion_norm")(
                src[:, :, :g_groups], fused
            )

        # ---- grid positional embedding (ref use_grid_pos index init) ----
        pos = None
        if self.use_grid_pos:
            gidx = np.stack(
                np.meshgrid(*[np.arange(self.grid_size)] * 3, indexing="ij"),
                axis=-1,
            ).reshape(-1, 3).astype(np.float32)
            pos = PlainMLP(256, self.hidden, 2, dtype=self.dtype,
                           name="grid_pos_embeded")(jnp.asarray(gidx))

        # ---- tokens + encoder stack -------------------------------------
        token0 = self.param("token", nn.initializers.zeros,
                            (g_groups, 1, self.hidden), jnp.float32)
        tok = jnp.broadcast_to(
            token0[None, None], (b, r, g_groups, 1, self.hidden)
        ).astype(self.dtype)
        layer_tokens = []
        for li in range(self.enc_layers):
            tok, grp = MPPNetEncoderLayer(
                hidden=self.hidden, heads=self.nheads,
                ffn_hidden=self.ffn_hidden, mixer_hidden=self.mixer_hidden,
                grid_size=self.grid_size, num_groups=g_groups,
                inter_group=li < self.enc_layers - 1, dtype=self.dtype,
                name=f"layer{li}",
            )(tok, grp, pos)
            layer_tokens.append(tok[..., 0, :])  # (B, R, G, H)

        # ---- heads (ref :726-744) ---------------------------------------
        class_embed = nn.Dense(1, param_dtype=jnp.float32, name="class_embed")
        cls_layers = jnp.stack(
            [class_embed(lt[..., 0, :])[..., 0] for lt in layer_tokens],
            axis=0,
        ).astype(jnp.float32)  # (L, B, R)

        bbox_embeds = [
            PlainMLP(self.hidden, 7, 4, dtype=self.dtype, name=f"bbox_embed{g}")
            for g in range(g_groups)
        ]
        point_reg = jnp.stack(
            [
                jnp.stack([bbox_embeds[g](lt[..., g, :]) for g in
                           range(g_groups)], axis=0)
                for lt in layer_tokens
            ],
            axis=0,
        ).astype(jnp.float32)  # (L, G, B, R, 7)

        box_reg, box_feat = TrajectoryPointNet(
            self.hidden, dtype=self.dtype, name="seqboxembed"
        )(self._box_sequence(trajectory_rois), train)

        hs = layer_tokens[-1].reshape(b, r, g_groups * self.hidden)
        joint = PlainMLP(self.ffn_hidden, 7, 4, dtype=self.dtype,
                         name="jointembed")(
            jnp.concatenate([hs, box_feat], axis=-1)
        ).astype(jnp.float32)

        return {
            "rcnn_cls": cls_layers[-1],
            "cls_layers": cls_layers,
            "rcnn_reg": joint,
            "point_reg": point_reg,
            "box_reg": box_reg,
            "geometry_memory": geometry_memory,
        }
