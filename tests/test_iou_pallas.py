"""Pallas IoU kernel vs the XLA reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core.geometry.iou import pairwise_overlap_bev
from dfu3d_tpu.core.geometry.iou_pallas import pairwise_overlap_bev_pallas

from test_geometry import _rand_boxes


class TestPallasOverlap:
    def test_matches_xla_reference(self, rng):
        a = _rand_boxes(rng, 150)  # non-multiple of the tile size
        b = _rand_boxes(rng, 70)
        a[:, 0:2] = rng.uniform(-3, 3, (150, 2))
        b[:, 0:2] = rng.uniform(-3, 3, (70, 2))
        want = np.asarray(pairwise_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
        got = np.asarray(
            pairwise_overlap_bev_pallas(jnp.asarray(a), jnp.asarray(b),
                                        interpret=True)
        )
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=2e-3), np.abs(got - want).max()

    def test_identical_boxes(self, rng):
        a = _rand_boxes(rng, 16)
        got = np.asarray(
            pairwise_overlap_bev_pallas(jnp.asarray(a), jnp.asarray(a),
                                        interpret=True)
        )
        area = a[:, 3] * a[:, 4]
        assert np.allclose(np.diag(got), area, rtol=1e-3)
