"""Native C++ matcher vs pure-Python oracle: bit-identical PR tables."""
import numpy as np
import pytest

from dfu3d_tpu.eval import kitti_eval
from dfu3d_tpu.eval.native import get_lib

from test_kitti_eval import _anno, _rand_frame


def _case(rng, n_frames=15, with_dc=False):
    gts, dts = [], []
    for _ in range(n_frames):
        n = rng.randint(2, 8)
        names, locs, dims, rys = _rand_frame(rng, n)
        if with_dc and rng.uniform() > 0.5:
            names = list(names) + ["DontCare"]
            locs = np.concatenate([locs, [[0, 0, 0]]])
            dims = np.concatenate([dims, [[0, 0, 0]]])
            rys = np.concatenate([rys, [0.0]])
        gts.append(_anno(names, locs, dims, rys))
        keep = rng.uniform(0, 1, n) > 0.3
        dlocs = locs[:n][keep] + rng.normal(0, 0.4, (keep.sum(), 3))
        nfp = rng.randint(0, 3)
        fnames, flocs, fdims, frys = _rand_frame(rng, nfp)
        dts.append(
            _anno(
                [nm for nm, k in zip(names[:n], keep) if k] + list(fnames),
                np.concatenate([dlocs, flocs]) if nfp else dlocs,
                np.concatenate([dims[:n][keep], fdims]) if nfp else dims[:n][keep],
                np.concatenate([rys[:n][keep], frys]) if nfp else rys[:n][keep],
                scores=rng.uniform(0.1, 1.0, keep.sum() + nfp),
                alphas=rng.uniform(-np.pi, np.pi, keep.sum() + nfp),
            )
        )
    return gts, dts


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
class TestNativeMatcher:
    def test_identical_curves_all_metrics(self, rng):
        gts, dts = _case(rng, with_dc=True)
        mo = np.full((2, 3, 2), 0.5)
        mo[1] = 0.25
        for metric in (0, 1, 2):
            a = kitti_eval.eval_class(gts, dts, [0, 8], [0, 1, 2], metric, mo,
                                      compute_aos=True, use_native=True)
            b = kitti_eval.eval_class(gts, dts, [0, 8], [0, 1, 2], metric, mo,
                                      compute_aos=True, use_native=False)
            assert np.array_equal(a["precision"], b["precision"]), metric
            assert np.array_equal(a["recall"], b["recall"]), metric
            assert np.array_equal(a["orientation"], b["orientation"]), metric

    def test_empty_detections(self, rng):
        names, locs, dims, rys = _rand_frame(rng, 4, classes=("Car",))
        gts = [_anno(names, locs, dims, rys)]
        dts = [_anno([], np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0),
                     bboxes=np.zeros((0, 4)), scores=np.zeros(0),
                     alphas=np.zeros(0))]
        mo = np.full((1, 3, 1), 0.5)
        a = kitti_eval.eval_class(gts, dts, [0], [0], 2, mo, use_native=True)
        b = kitti_eval.eval_class(gts, dts, [0], [0], 2, mo, use_native=False)
        assert np.array_equal(a["precision"], b["precision"])

    def test_native_is_fast(self, rng):
        """1000 frames × full PR in well under a second of matching."""
        import time

        gts, dts = _case(rng, n_frames=400)
        mo = np.full((1, 3, 1), 0.5)
        t0 = time.time()
        kitti_eval.eval_class(gts, dts, [0], [0, 1, 2], 2, mo, use_native=True)
        native_t = time.time() - t0
        assert native_t < 10.0, native_t
