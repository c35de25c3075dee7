"""PointNet++ op tests against brute-force numpy oracles."""
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core import pointnet2 as P


class TestFPS:
    def test_spreads_points(self, rng):
        # two far clusters: FPS with npoint=2 must take one from each
        c1 = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        c2 = rng.uniform(0, 1, (50, 3)).astype(np.float32) + 100
        xyz = np.concatenate([c1, c2])
        valid = np.ones(100, bool)
        idx = np.asarray(P.farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 2))
        assert (idx[0] < 50) != (idx[1] < 50)

    def test_ignores_invalid(self, rng):
        xyz = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
        valid = np.zeros(64, bool)
        valid[10:20] = True
        idx = np.asarray(P.farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 8))
        assert np.all((idx >= 10) & (idx < 20))

    def test_maximizes_min_distance(self, rng):
        xyz = rng.uniform(-10, 10, (128, 3)).astype(np.float32)
        valid = np.ones(128, bool)
        idx = np.asarray(P.farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 16))
        sel = xyz[idx]
        d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        # min pairwise distance among FPS picks beats random picks on average
        rnd = xyz[rng.choice(128, 16, replace=False)]
        dr = np.linalg.norm(rnd[:, None] - rnd[None, :], axis=-1)
        np.fill_diagonal(dr, np.inf)
        assert d.min() >= dr.min()


class TestBallQuery:
    def test_within_radius_and_padding(self, rng):
        xyz = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        centers = xyz[:10] + 0.01
        idx, has = P.ball_query(
            1.0, 16, jnp.asarray(xyz), jnp.ones(200, bool),
            jnp.asarray(centers), jnp.ones(10, bool),
        )
        idx, has = np.asarray(idx), np.asarray(has)
        assert has.all()
        for m in range(10):
            d = np.linalg.norm(xyz[idx[m]] - centers[m], axis=-1)
            assert (d <= 1.0 + 1e-5).all()

    def test_no_neighbors(self):
        xyz = np.zeros((4, 3), np.float32)
        centers = np.full((2, 3), 50.0, np.float32)
        idx, has = P.ball_query(
            1.0, 4, jnp.asarray(xyz), jnp.ones(4, bool),
            jnp.asarray(centers), jnp.ones(2, bool),
        )
        assert not np.asarray(has).any()


class TestInterpolate:
    def test_three_nn_exact(self, rng):
        known = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
        unknown = rng.uniform(-5, 5, (20, 3)).astype(np.float32)
        dist, idx = P.three_nn(
            jnp.asarray(unknown), jnp.ones(20, bool),
            jnp.asarray(known), jnp.ones(50, bool),
        )
        dist, idx = np.asarray(dist), np.asarray(idx)
        d_all = np.linalg.norm(unknown[:, None] - known[None], axis=-1)
        want = np.sort(d_all, axis=1)[:, :3]
        assert np.allclose(np.sort(dist, axis=1), want, atol=1e-4)

    def test_interpolation_recovers_linear_field(self, rng):
        known = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
        f = (known @ np.array([[1.0], [2.0], [-1.0]])).astype(np.float32)
        unknown = rng.uniform(-4, 4, (30, 3)).astype(np.float32)
        dist, idx = P.three_nn(
            jnp.asarray(unknown), jnp.ones(30, bool),
            jnp.asarray(known), jnp.ones(500, bool),
        )
        out = np.asarray(P.three_interpolate(jnp.asarray(f), idx, dist))
        want = unknown @ np.array([[1.0], [2.0], [-1.0]])
        err = np.abs(out - want).mean()
        # IDW of a linear field: error ~ NN spacing × gradient; sanity-bound it
        assert err < 1.2, err
        assert np.corrcoef(out.ravel(), want.ravel())[0, 1] > 0.97
