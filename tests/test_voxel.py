"""Voxelization / segment-op tests against numpy oracles."""
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core import voxel as V


def _grid():
    return V.VoxelGrid.create([0, -40, -3, 70.4, 40, 1], [0.2, 0.2, 4])


class TestVoxelGrid:
    def test_grid_size(self):
        g = _grid()
        assert g.grid_size == (352, 400, 1)

    def test_coords_and_validity(self, rng):
        g = _grid()
        pts = rng.uniform(-10, 80, (1000, 4)).astype(np.float32)
        valid = rng.uniform(0, 1, 1000) > 0.2
        coords, ok = V.voxel_coords_of_points(g, jnp.asarray(pts), jnp.asarray(valid))
        coords, ok = np.asarray(coords), np.asarray(ok)
        pcr = np.array([0, -40, -3, 70.4, 40, 1])
        inside = np.all((pts[:, :3] >= pcr[:3]) & (pts[:, :3] < pcr[3:]), axis=1)
        # floor-based binning: points exactly on the upper edge are excluded
        want_coords = np.floor((pts[:, :3] - pcr[:3]) / np.array([0.2, 0.2, 4])).astype(int)
        edge = np.any(want_coords >= np.array(g.grid_size), axis=1)
        assert np.array_equal(ok, valid & inside & ~edge)
        assert np.array_equal(coords[ok], want_coords[ok])

    def test_dynamic_voxelize_against_numpy(self, rng):
        g = V.VoxelGrid.create([0, 0, 0, 10, 10, 10], [1, 1, 1])
        pts = rng.uniform(0, 10, (500, 3)).astype(np.float32)
        valid = np.ones(500, dtype=bool)
        valid[::7] = False
        out = V.dynamic_voxelize(g, jnp.asarray(pts), jnp.asarray(valid), max_voxels=600)

        want_coords = np.floor(pts).astype(int)
        lin = (want_coords[:, 2] * 10 + want_coords[:, 1]) * 10 + want_coords[:, 0]
        uniq = np.unique(lin[valid])
        assert int(out.num_voxels) == len(uniq)
        # every valid point maps to a voxel slot whose coords match its own bin
        p2v = np.asarray(out.point_to_voxel)
        vc = np.asarray(out.voxel_coords)
        for i in np.where(valid)[0][:100]:
            assert np.array_equal(vc[p2v[i]], want_coords[i])
        # invalid points map out of range
        assert np.all(p2v[~valid] == 600)

    def test_capacity_cap(self, rng):
        g = V.VoxelGrid.create([0, 0, 0, 10, 10, 10], [1, 1, 1])
        pts = (np.arange(100)[:, None] % 50 * 0.2 * np.ones((100, 3))).astype(np.float32)
        valid = np.ones(100, dtype=bool)
        out = V.dynamic_voxelize(g, jnp.asarray(pts), jnp.asarray(valid), max_voxels=3)
        assert int(out.num_voxels) == 3
        p2v = np.asarray(out.point_to_voxel)
        assert p2v.max() == 3  # overflow points dropped to sentinel


class TestSegmentOps:
    def test_mean_max_sum(self, rng):
        ids = rng.randint(0, 10, 200)
        vals = rng.randn(200, 4).astype(np.float32)
        mean, counts = V.segment_mean(jnp.asarray(vals), jnp.asarray(ids), 10)
        mx = V.segment_max(jnp.asarray(vals), jnp.asarray(ids), 10, empty_value=-1.0)
        sm = V.segment_sum(jnp.asarray(vals), jnp.asarray(ids), 10)
        for k in range(10):
            sel = vals[ids == k]
            if len(sel):
                assert np.allclose(np.asarray(mean)[k], sel.mean(0), atol=1e-5)
                assert np.allclose(np.asarray(mx)[k], sel.max(0), atol=1e-6)
                assert np.allclose(np.asarray(sm)[k], sel.sum(0), atol=1e-4)

    def test_out_of_range_ids_dropped(self):
        vals = jnp.ones((4, 2))
        ids = jnp.array([0, 1, 5, 9])  # 5, 9 out of range for 2 segments
        sm = np.asarray(V.segment_sum(vals, ids, 2))
        assert np.allclose(sm, [[1, 1], [1, 1]])

    def test_empty_segment_values(self):
        vals = jnp.array([[1.0, 2.0]])
        ids = jnp.array([0])
        mx = np.asarray(V.segment_max(vals, ids, 3, empty_value=0.0))
        assert np.allclose(mx[1:], 0.0)
        mean, _ = V.segment_mean(vals, ids, 3)
        assert np.allclose(np.asarray(mean)[1:], 0.0)


class TestSphericalResample:
    def test_keeps_closest_per_direction(self):
        # two points in the same direction, different range → keep the closer
        pts = np.array(
            [
                [10.0, 0, 0],
                [20.0, 0, 0],     # same az/el as above
                [0.0, 10.0, 0],   # different direction
            ],
            dtype=np.float32,
        )
        mask = np.asarray(
            V.spherical_min_range_resample(jnp.asarray(pts), jnp.ones(3, dtype=bool))
        )
        assert mask.tolist() == [True, False, True]

    def test_respects_validity(self):
        pts = np.array([[10.0, 0, 0], [20.0, 0, 0]], dtype=np.float32)
        valid = np.array([False, True])
        mask = np.asarray(
            V.spherical_min_range_resample(jnp.asarray(pts), jnp.asarray(valid))
        )
        assert mask.tolist() == [False, True]

    def test_distinct_cells_all_survive(self, rng):
        # spread points widely: each direction unique at the given resolution
        az = rng.uniform(-np.pi, np.pi, 200)
        el = rng.uniform(-0.3, 0.3, 200)
        r = rng.uniform(5, 50, 200)
        pts = np.stack(
            [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)],
            axis=1,
        ).astype(np.float32)
        mask = np.asarray(
            V.spherical_min_range_resample(
                jnp.asarray(pts), jnp.ones(200, dtype=bool), az_res=1e-4, el_res=1e-4
            )
        )
        assert mask.sum() >= 195  # collisions statistically negligible


class TestOccupancyGuard:
    def test_warns_on_undersized_cap(self, caplog):
        """An undersized MAX_NUMBER_OF_VOXELS silently truncates scenes on
        device — the processor's sampled host check must warn."""
        import logging

        from dfu3d_tpu.data.processor import DataProcessor
        from dfu3d_tpu.utils.config import CfgDict

        rng = np.random.RandomState(0)
        proc = DataProcessor(
            [CfgDict({"NAME": "transform_points_to_voxels_placeholder",
                      "VOXEL_SIZE": [0.1, 0.1, 0.2],
                      "MAX_NUMBER_OF_VOXELS": {"train": 10, "test": 10}})],
            point_cloud_range=[0, -5, -3, 10, 5, 1],
            training=True, num_point_features=4,
        )
        pts = np.zeros((500, 4), np.float32)
        pts[:, 0] = rng.uniform(0, 10, 500)
        pts[:, 1] = rng.uniform(-5, 5, 500)
        pts[:, 2] = rng.uniform(-3, 1, 500)
        with caplog.at_level(logging.WARNING, logger="dfu3d_tpu"):
            proc.forward({"points": pts})
        assert any("MAX_NUMBER_OF_VOXELS" in r.message for r in caplog.records)

    def test_no_warning_when_cap_sufficient(self, caplog):
        import logging

        from dfu3d_tpu.data.processor import DataProcessor
        from dfu3d_tpu.utils.config import CfgDict

        proc = DataProcessor(
            [CfgDict({"NAME": "transform_points_to_voxels_placeholder",
                      "VOXEL_SIZE": [0.1, 0.1, 0.2],
                      "MAX_NUMBER_OF_VOXELS": {"train": 100000,
                                               "test": 100000}})],
            point_cloud_range=[0, -5, -3, 10, 5, 1],
            training=True, num_point_features=4,
        )
        pts = np.zeros((50, 4), np.float32)
        pts[:, 0] = np.linspace(0.05, 9.95, 50)
        with caplog.at_level(logging.WARNING, logger="dfu3d_tpu"):
            proc.forward({"points": pts})
        assert not any("MAX_NUMBER_OF_VOXELS" in r.message
                       for r in caplog.records)

    def test_num_unique_exposed(self):
        from dfu3d_tpu.core.voxel import VoxelGrid, dynamic_voxelize

        grid = VoxelGrid.create([0, 0, 0, 1.6, 1.6, 1.6], [0.4, 0.4, 0.4])
        pts = jnp.asarray(np.array(
            [[0.1, 0.1, 0.1], [0.5, 0.1, 0.1], [0.9, 0.1, 0.1],
             [1.3, 0.1, 0.1], [0.1, 0.5, 0.1]], np.float32))
        valid = jnp.ones(5, bool)
        vox = dynamic_voxelize(grid, pts, valid, max_voxels=3)
        assert int(vox.num_unique) == 5
        assert int(vox.num_voxels) == 3
