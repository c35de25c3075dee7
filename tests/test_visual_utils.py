"""tools/visual_utils — headless counterpart of the reference's
tools/visual_utils/ (open3d/mayavi scene rendering)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from visual_utils import (  # noqa: E402
    calculate_iou,
    draw_scenes,
    get_coor_colors,
    gradient_point_colors,
)


def _scene(rng):
    pts = rng.uniform(-40, 40, (500, 3)).astype(np.float32)
    gt = np.array([[5.0, 2.0, 0.0, 4.0, 1.8, 1.5, 0.3],
                   [-8.0, -3.0, 0.0, 0.8, 0.8, 1.7, 0.0]], np.float32)
    pred = gt.copy()
    pred[:, :2] += 0.15
    return pts, gt, pred


def test_gradient_colors_monotone_ramp():
    pts = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [80.0, 0.0, 0.0]],
                   np.float32)
    c = gradient_point_colors(pts, radius=70.0)
    assert c.shape == (3, 3) and (c >= 0).all() and (c <= 1).all()
    # origin = purple-ish (high B), far = yellow (R+G, no B)
    assert c[0, 2] > 0.9 and c[2, 2] < 0.05 and c[2, 0] > 0.9 and c[2, 1] > 0.9


def test_coor_colors_distinct_per_label():
    c = get_coor_colors(np.array([0, 1, 2, 2, 1]))
    assert c.shape == (5, 3)
    assert np.allclose(c[1], c[4]) and np.allclose(c[2], c[3])
    assert not np.allclose(c[0], c[1])


def test_calculate_iou_matches_best_gt():
    _, gt, pred = _scene(np.random.RandomState(0))
    iou = calculate_iou(pred, gt)
    assert iou.shape == (2,)
    assert (iou > 0.2).all()  # shifted copies still overlap their source
    assert calculate_iou(pred, np.zeros((0, 7), np.float32)).shape == (2,)


def test_draw_scenes_writes_png(tmp_path):
    pts, gt, pred = _scene(np.random.RandomState(1))
    out = draw_scenes(
        pts, gt_boxes=gt, ref_boxes=pred,
        ref_scores=np.array([0.9, 0.4]), ref_labels=np.array([1, 2]),
        class_names=["Car", "Pedestrian"],
        out_png=str(tmp_path / "scene.png"), backend="mpl",
    )
    data = Path(out).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 10_000


def test_draw_scenes_empty_boxes(tmp_path):
    pts, _, _ = _scene(np.random.RandomState(2))
    out = draw_scenes(pts, out_png=str(tmp_path / "empty.png"), backend="mpl")
    assert Path(out).exists()
