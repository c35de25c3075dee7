"""KITTI AP evaluator tests: analytic oracles + golden snapshot."""
import json
from pathlib import Path

import numpy as np
import pytest

from dfu3d_tpu.eval import kitti_eval

GOLDEN = Path(__file__).parent / "golden" / "kitti_eval_golden.json"


def _anno(names, locs, dims, rys, bboxes=None, scores=None, alphas=None,
          trunc=None, occ=None):
    n = len(names)
    locs = np.asarray(locs, np.float64).reshape(n, 3)
    dims = np.asarray(dims, np.float64).reshape(n, 3)
    rys = np.asarray(rys, np.float64)
    if bboxes is None:
        # tall boxes so nothing is difficulty-ignored
        bboxes = np.stack([
            np.full(n, 100.0), np.full(n, 100.0), np.full(n, 200.0), np.full(n, 200.0)
        ], axis=1)
    a = {
        "name": np.asarray(names),
        "truncated": np.zeros(n) if trunc is None else np.asarray(trunc, np.float64),
        "occluded": np.zeros(n) if occ is None else np.asarray(occ, np.float64),
        "alpha": np.zeros(n) if alphas is None else np.asarray(alphas, np.float64),
        "bbox": np.asarray(bboxes, np.float64).reshape(n, 4),
        "dimensions": dims,  # (l, h, w) camera
        "location": locs,
        "rotation_y": rys,
    }
    if scores is not None:
        a["score"] = np.asarray(scores, np.float64)
    return a


def _rand_frame(rng, n_gt, classes=("Car", "Pedestrian")):
    names = [classes[rng.randint(len(classes))] for _ in range(n_gt)]
    locs = np.stack(
        [rng.uniform(-20, 20, n_gt), rng.uniform(1, 2, n_gt), rng.uniform(5, 60, n_gt)],
        axis=1,
    )
    dims = np.stack(
        [rng.uniform(3, 5, n_gt), rng.uniform(1.4, 1.8, n_gt), rng.uniform(1.5, 2, n_gt)],
        axis=1,
    )
    rys = rng.uniform(-np.pi, np.pi, n_gt)
    return names, locs, dims, rys


class TestPerfectDetections:
    def test_ap_100(self, rng):
        # KITTI's 41-point protocol needs >= 41 valid gt per class for AP=100
        gt_annos, dt_annos = [], []
        for _ in range(30):
            names, locs, dims, rys = _rand_frame(rng, 6)
            gt_annos.append(_anno(names, locs, dims, rys))
            dt_annos.append(
                _anno(names, locs, dims, rys,
                      scores=rng.uniform(0.3, 1.0, 6),
                      alphas=np.full(6, -10.0))
            )
        result, ret = kitti_eval.get_official_eval_result(
            gt_annos, dt_annos, ["Car", "Pedestrian"]
        )
        for key in ["Car_3d/easy_R40", "Car_bev/moderate_R40",
                    "Pedestrian_3d/hard_R40"]:
            assert abs(ret[key] - 100.0) < 1e-6, (key, ret[key])

    def test_no_detections_ap_0(self, rng):
        names, locs, dims, rys = _rand_frame(rng, 4, classes=("Car",))
        gt_annos = [_anno(names, locs, dims, rys)]
        dt_annos = [_anno([], np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0),
                          bboxes=np.zeros((0, 4)), scores=np.zeros(0),
                          alphas=np.zeros(0))]
        _, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ["Car"])
        assert ret["Car_3d/easy_R40"] == 0.0


class TestMatchingSemantics:
    def test_shifted_box_below_iou(self, rng):
        """Detections shifted to ~0.38 IoU are FPs at min-IoU 0.5 but TPs at
        0.25 (the third table row)."""
        gts, dts = [], []
        for f in range(20):
            names = ["Car", "Car"]
            locs = np.array([[0.0, 1.5, 20.0 + f], [8.0, 1.5, 30.0 + f]])
            dims = np.tile([[4.0, 1.5, 1.8]], (2, 1))
            rys = np.zeros(2)
            gts.append(_anno(names, locs, dims, rys))
            # shift along x by 1.8 m → IoU_bev = 2.2/(8-2.2) ≈ 0.379
            dts.append(
                _anno(names, locs + np.array([[1.8, 0, 0]]), dims, rys,
                      scores=rng.uniform(0.3, 1.0, 2), alphas=np.full(2, -10.0))
            )
        _, ret = kitti_eval.get_official_eval_result(gts, dts, ["Car"])
        assert ret["Car_bev/easy_R40"] == 0.0  # below 0.5
        mo = np.full((1, 3, 1), 0.25)
        out = kitti_eval.eval_class(gts, dts, [0], [0], 1, mo)
        assert kitti_eval.get_mAP_R40(out["precision"])[0, 0, 0] > 90

    def test_score_ranking_matters(self, rng):
        """Low-scored FPs below all TP thresholds don't hurt 41-pt AP at the
        sampled recall points."""
        gts, dts = [], []
        for _ in range(10):
            names, locs, dims, rys = _rand_frame(rng, 5, classes=("Car",))
            gts.append(_anno(names, locs, dims, rys))
            # dt = all gt with high scores + 3 far FPs with low scores
            fp_locs = locs[:3] + np.array([[30.0, 0, 0]])
            dts.append(_anno(
                list(names) + ["Car"] * 3,
                np.concatenate([locs, fp_locs]),
                np.concatenate([dims, dims[:3]]),
                np.concatenate([rys, rys[:3]]),
                scores=np.concatenate(
                    [rng.uniform(0.6, 1.0, 5), rng.uniform(0.0, 0.2, 3)]
                ),
                alphas=np.full(8, -10.0),
            ))
        _, ret = kitti_eval.get_official_eval_result(gts, dts, ["Car"])
        assert ret["Car_3d/easy_R40"] > 95.0

    def test_dontcare_suppresses_fp(self, rng):
        gts, dts = [], []
        for _ in range(60):
            gts.append(_anno(
                ["Car", "DontCare"],
                [[0, 1.5, 20], [0, 0, 0]],
                [[4, 1.5, 1.8], [0, 0, 0]],
                [0.0, 0.0],
                bboxes=[[100, 100, 200, 200], [300, 100, 400, 200]],
            ))
            # second detection only overlaps the DontCare 2D region
            dts.append(_anno(
                ["Car", "Car"],
                [[0, 1.5, 20], [50, 1.5, 90]],
                [[4, 1.5, 1.8], [4, 1.5, 1.8]],
                [0.0, 0.0],
                bboxes=[[100, 100, 200, 200], [300, 100, 400, 200]],
                scores=rng.uniform(0.3, 1.0, 2),
                alphas=[-10, -10],
            ))
        # metric 0 (bbox): dets on DontCare regions are not FPs
        mo = np.full((1, 3, 1), 0.5)
        out = kitti_eval.eval_class(gts, dts, [0], [0], 0, mo)
        assert kitti_eval.get_mAP_R40(out["precision"])[0, 0, 0] > 95


class TestGolden:
    def _make_case(self):
        rng = np.random.RandomState(42)
        gt_annos, dt_annos = [], []
        for _ in range(10):
            n = rng.randint(3, 9)
            names, locs, dims, rys = _rand_frame(rng, n)
            gt_annos.append(_anno(names, locs, dims, rys))
            # detections: jittered gt (drop some) + random FPs
            keep = rng.uniform(0, 1, n) > 0.25
            dlocs = locs[keep] + rng.normal(0, 0.15, (keep.sum(), 3))
            ddims = dims[keep] * rng.uniform(0.95, 1.05, (keep.sum(), 3))
            drys = rys[keep] + rng.normal(0, 0.05, keep.sum())
            dnames = [nm for nm, k in zip(names, keep) if k]
            nfp = rng.randint(0, 4)
            fnames, flocs, fdims, frys = _rand_frame(rng, nfp)
            dt_annos.append(
                _anno(
                    dnames + list(fnames),
                    np.concatenate([dlocs, flocs]) if nfp else dlocs,
                    np.concatenate([ddims, fdims]) if nfp else ddims,
                    np.concatenate([drys, frys]) if nfp else drys,
                    scores=rng.uniform(0.3, 1.0, keep.sum() + nfp),
                    alphas=np.full(keep.sum() + nfp, -10.0),
                )
            )
        return gt_annos, dt_annos

    def test_golden_snapshot(self):
        gt_annos, dt_annos = self._make_case()
        _, ret = kitti_eval.get_official_eval_result(
            gt_annos, dt_annos, ["Car", "Pedestrian"]
        )
        got = {k: round(float(v), 6) for k, v in ret.items()}
        if not GOLDEN.exists():
            GOLDEN.parent.mkdir(parents=True, exist_ok=True)
            GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True))
            pytest.skip("golden file created — rerun to verify")
        want = json.loads(GOLDEN.read_text())
        assert got == want

    def test_matches_reference_protocol(self):
        """Bit-for-bit AP parity with the REFERENCE's eval_class /
        get_thresholds / AP interpolation (SURVEY §7.3 item 5).

        The golden was produced by running the reference's
        kitti_object_eval_python/eval.py (numba stubbed to identity, overlaps
        injected from this repo's independently-tested rotated IoU) on these
        exact annos — tools/dev/make_reference_eval_golden.py regenerates it.
        """
        ref_golden = GOLDEN.parent / "kitti_eval_reference_golden.json"
        gt_annos, dt_annos = self._make_case()
        _, ret = kitti_eval.get_official_eval_result(
            gt_annos, dt_annos, ["Car", "Pedestrian"]
        )
        got = {k: round(float(v), 6) for k, v in ret.items()}
        want = json.loads(ref_golden.read_text())
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])
