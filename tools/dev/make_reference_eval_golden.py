"""Generate the reference-derived golden file for the KITTI AP evaluator.

Runs the REFERENCE's eval protocol (pcdet/datasets/kitti/kitti_object_eval_python/
eval.py) on the canned annos used by tests/test_kitti_eval.py:TestGolden and
freezes its ret_dict as tests/golden/kitti_eval_reference_golden.json — the
bit-for-bit comparison target demanded by SURVEY §7.3 item 5.

The reference kernels are numba-jitted pure-Python numpy loops; numba is not
installed here, so we exec the module with numba stubbed to identity
decorators (slow but exact). The CUDA rotated IoU (rotate_iou.py) cannot run;
it is injected with this repo's numpy rotated-overlap implementation, whose
geometry is independently validated against shapely-style oracles in
tests/test_geometry.py — so the golden pins the reference's THRESHOLDING,
MATCHING and AP-INTERPOLATION logic (the protocol), with overlaps computed
identically for both sides.

Usage: python tools/dev/make_reference_eval_golden.py
"""
import json
import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
REF_EVAL = Path("/root/reference/pcdet/datasets/kitti/kitti_object_eval_python/eval.py")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def load_reference_eval():
    from dfu3d_tpu.eval.kitti_eval import _rotated_overlap

    def identity_jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    numba_stub = types.ModuleType("numba")
    numba_stub.jit = identity_jit
    numba_stub.njit = identity_jit
    numba_stub.prange = range

    src = REF_EVAL.read_text()
    src = src.replace(
        "from .rotate_iou import rotate_iou_gpu_eval", "", 1
    )
    mod = types.ModuleType("reference_kitti_eval")
    mod.__dict__["numba"] = numba_stub
    mod.__dict__["rotate_iou_gpu_eval"] = (
        lambda boxes, qboxes, criterion=-1: _rotated_overlap(
            np.asarray(boxes, np.float64), np.asarray(qboxes, np.float64),
            criterion,
        )
    )
    sys.modules["numba"] = numba_stub
    exec(compile(src, str(REF_EVAL), "exec"), mod.__dict__)
    return mod


def main():
    import test_kitti_eval as t

    ref = load_reference_eval()

    class _Case(t.TestGolden):
        pass

    gt_annos, dt_annos = _Case()._make_case()
    _result_str, ret = ref.get_official_eval_result(
        gt_annos, dt_annos, ["Car", "Pedestrian"]
    )
    got = {k: round(float(v), 6) for k, v in ret.items()}
    out = REPO / "tests" / "golden" / "kitti_eval_reference_golden.json"
    out.write_text(json.dumps(got, indent=1, sort_keys=True))
    print(f"wrote {out} ({len(got)} keys)")
    for k in sorted(got):
        print(f"  {k}: {got[k]}")


if __name__ == "__main__":
    main()
