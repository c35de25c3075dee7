"""Spherical-grid resampling of point clouds.

TPU-native equivalent of the reference's `la_sampling2` / `la_sampling20`
(tools/PENet/dataloaders/my_loader.py:166-275): pseudo-points lifted from dense
depth are resampled on a spherical (range, azimuth, elevation) grid so that at
most one representative survives per angular cell — the reference uses a spconv
voxelizer with vsize ≈ [200 m, 0.002 rad, 0.002 rad] and max 1 point/voxel.
We keep the **minimum-range** point per angular bin (the visible surface),
implemented with two stable sorts instead of a hash-table voxelizer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def to_sphere_coords(points):
    """(N, 3+) xyz → (range, azimuth, elevation) each (N,).

    azimuth = atan2(y, x); elevation = asin(z / r).
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    az = jnp.arctan2(y, x)
    el = jnp.arcsin(z / jnp.maximum(r, 1e-6))
    return r, az, el


@functools.partial(
    jax.jit, static_argnames=("az_res", "el_res", "keep")
)
def spherical_min_range_resample(points, valid, az_res: float = 0.002,
                                 el_res: float = 0.002, keep: str = "min_range"):
    """Keep one point per (azimuth, elevation) cell.

    Args:
        points: (N, 3+)
        valid: (N,) bool
        az_res, el_res: angular bin sizes in radians (reference: 0.002).
        keep: "min_range" (closest surface) or "first" (input order, the spconv
              voxelizer's behavior).
    Returns:
        (N,) bool mask of surviving points.
    """
    n = points.shape[0]
    r, az, el = to_sphere_coords(points)
    n_az = int(np.ceil(2 * np.pi / az_res)) + 1
    n_el = int(np.ceil(np.pi / el_res)) + 1
    az_bin = jnp.clip(((az + np.pi) / az_res).astype(jnp.int32), 0, n_az - 1)
    el_bin = jnp.clip(((el + np.pi / 2) / el_res).astype(jnp.int32), 0, n_el - 1)
    bin_id = az_bin * n_el + el_bin
    bin_id = jnp.where(valid, bin_id, n_az * n_el)  # padding sorts last

    if keep == "min_range":
        # stable two-pass sort: group by bin, ascending range within group
        order_r = jnp.argsort(r)
        order = order_r[jnp.argsort(bin_id[order_r], stable=True)]
    else:
        order = jnp.argsort(bin_id, stable=True)

    sorted_bin = bin_id[order]
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_bin[1:] != sorted_bin[:-1]]
    )
    first = first & (sorted_bin < n_az * n_el)
    mask = jnp.zeros((n,), dtype=bool).at[order].set(first)
    return mask & valid
