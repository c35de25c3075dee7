"""Swin Transformer image backbone (reference: pcdet/models/backbones_image/
swin.py, 736 LoC mmdet port — BEVFusion's camera encoder).

TPU-native compact reimplementation: windowed MSA with relative position
bias, cyclic shift via jnp.roll + attention masking, patch merging between
stages. All window partitioning is pure reshapes/transposes (XLA-friendly);
no pretrained weights are shipped (documented deviation — the reference
loads an ImageNet checkpoint; use train.torch_convert for released weights).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, ws: int):
    """(B, H, W, C) → (B·nH·nW, ws·ws, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(win, ws: int, h: int, w: int):
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        ws = self.window_size
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, c // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (c // self.num_heads) ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k).astype(jnp.float32)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads), jnp.float32,
        )
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b_, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, _, c = x.shape
        ws, sh = self.window_size, self.shift
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        y = y.reshape(b, h, w, c)
        # pad to window multiples
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw

        mask = None
        if sh > 0:
            y = jnp.roll(y, (-sh, -sh), axis=(1, 2))
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                for wsl in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws)[..., 0]  # (nW, ws²)
            am = mw[:, None, :] - mw[:, :, None]
            mask = jnp.where(am != 0, -100.0, 0.0)

        win = window_partition(y, ws)
        win = WindowAttention(self.dim, self.num_heads, ws, dtype=self.dtype,
                              name="attn")(win, mask)
        y = window_reverse(win, ws, hp, wp)
        if sh > 0:
            y = jnp.roll(y, (sh, sh), axis=(1, 2))
        y = y[:, :h, :w].reshape(b, h * w, c)
        x = shortcut + y

        z = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)  # torch nn.GELU default is exact erf
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(z)
        return x + z


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, _, c = x.shape
        y = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        y = jnp.concatenate(
            [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2],
             y[:, 1::2, 1::2]], axis=-1,
        )
        h2, w2 = y.shape[1], y.shape[2]
        y = y.reshape(b, h2 * w2, 4 * c)
        y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm")(
            y.astype(jnp.float32)
        ).astype(self.dtype)
        y = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="reduction")(y)
        return y, h2, w2


class SwinTransformer(nn.Module):
    """config keys mirror the reference: EMBED_DIMS, DEPTHS, NUM_HEADS,
    WINDOW_SIZE, PATCH_SIZE, OUT_INDICES."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images (B, H, W, 3) → list of (B, H_i, W_i, C_i) stage maps."""
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(
            images.astype(self.dtype)
        )
        b, h, w, c = x.shape
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="patch_norm")(
            x.reshape(b, h * w, c).astype(jnp.float32)
        ).astype(self.dtype)

        outs = []
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[i], self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{i}_block{j}",
                )(x, h, w)
            if i in self.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name=f"out_norm{i}")(
                    x.astype(jnp.float32)
                ).astype(self.dtype)
                outs.append(y.reshape(b, h, w, dim))
            if i < len(self.depths) - 1:
                x, h, w = PatchMerging(dim, dtype=self.dtype,
                                       name=f"merge{i}")(x, h, w)
                dim *= 2
        return outs
