"""Waymo extraction contract: the numpy core of tools/waymo_extract.py must
produce exactly the layout dfu3d_tpu.data.WaymoDataset consumes (reference
waymo_utils.py:23-266 -> waymo_dataset.py)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from waymo_extract import (  # noqa: E402
    build_annotations,
    process_single_sequence,
)


def _decoded_frame(seq, idx, rot=0.0):
    rng = np.random.RandomState(idx)
    n = 64
    pts = np.zeros((n, 6), np.float32)
    pts[:, :3] = rng.uniform(-20, 20, (n, 3))
    pts[:, 3] = rng.uniform(0, 1, n)
    pts[:, 4] = rng.uniform(0, 1, n)
    pts[:, 5] = -1.0  # not in any no-label zone
    pts[-4:, 5] = 1.0  # NLZ points the loader must drop
    c, s = np.cos(rot), np.sin(rot)
    pose = np.eye(4)
    pose[:2, :2] = [[c, -s], [s, c]]
    labels = [
        {"name": "Vehicle", "box": np.array([5.0, 1.0, 0.5, 4.5, 2.0, 1.6,
                                             0.2]),
         "speed_global": (3.0, 0.0), "num_points_in_gt": 12},
        {"name": "unknown", "box": np.zeros(7)},
        {"name": "Pedestrian", "box": np.array([-2.0, 4.0, 0.9, 0.8, 0.8,
                                                1.7, 1.2]),
         "speed_global": (0.0, 1.0), "num_points_in_gt": 5},
    ]
    return {"points": pts, "pose": pose, "frame_id": f"{seq}_{idx:03d}",
            "sequence_name": seq, "sample_idx": idx, "timestamp": 1000 + idx,
            "image_shapes": [(1280, 1920)], "labels": labels,
            "num_points_of_each_lidar": [n, 0, 0, 0, 0]}


class TestBuildAnnotations:
    def test_unknown_dropped_and_speed_rotated(self):
        frame = _decoded_frame("seq", 0, rot=np.pi / 2)
        annos = build_annotations(frame["labels"], frame["pose"])
        assert list(annos["name"]) == ["Vehicle", "Pedestrian"]
        boxes = annos["gt_boxes_lidar"]
        assert boxes.shape == (2, 9)
        # global +x speed under a 90deg ego yaw becomes ego -y... the
        # reference rotates with inv(pose[:3,:3].T) = pose rotation itself
        # applied to row vectors: v_ego = v_global @ inv(R^T) = v_global @ R
        expect = np.array([3.0, 0.0, 0.0]) @ np.linalg.inv(
            np.asarray(frame["pose"])[:3, :3].T
        )
        np.testing.assert_allclose(boxes[0, 7:9], expect[:2], atol=1e-9)

    def test_empty_labels(self):
        annos = build_annotations([], np.eye(4))
        assert annos["gt_boxes_lidar"].shape == (0, 9)


class TestLayoutRoundtrip:
    def test_extract_then_load(self, tmp_path):
        seq = "segment-0001"
        frames = [_decoded_frame(seq, i) for i in range(4)]
        tag_dir = tmp_path / "waymo_processed_data"
        infos = process_single_sequence(frames, tag_dir, sampled_interval=2)
        assert len(infos) == 2  # frames 0 and 2
        assert (tag_dir / seq / f"{seq}.pkl").exists()
        assert (tag_dir / seq / "0000.npy").exists()
        assert not (tag_dir / seq / "0001.npy").exists()

        (tmp_path / "ImageSets").mkdir()
        (tmp_path / "ImageSets" / "train.txt").write_text(seq + "\n")

        from dfu3d_tpu.data.waymo_dataset import WaymoDataset
        from dfu3d_tpu.utils.config import CfgDict

        cfg = CfgDict({
            "DATA_PATH": str(tmp_path),
            "DATA_SPLIT": {"train": "train", "test": "train"},
            "PROCESSED_DATA_TAG": "waymo_processed_data",
            "POINT_CLOUD_RANGE": [-30, -30, -3, 30, 30, 3],
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": ["x", "y", "z", "intensity"],
                "src_feature_list": ["x", "y", "z", "intensity"],
            },
            "DATA_PROCESSOR": [
                {"NAME": "mask_points_and_boxes_outside_range",
                 "REMOVE_OUTSIDE_BOXES": True},
            ],
            "MAX_POINTS_PER_FRAME": 128,
        })
        ds = WaymoDataset(cfg, ["Vehicle", "Pedestrian"], training=True)
        assert len(ds) == 2
        item = ds[0]
        # NLZ-flagged points were dropped by the loader (4 per frame)
        assert item["points"].shape[1] == 4
        assert item["points"].shape[0] <= 60
        # gt boxes roundtrip through info (7-dim slice of the 9-dim lidar box)
        assert item["gt_boxes"].shape[1] == 8
        src = frames[0]["labels"][0]["box"]
        found = np.min(
            np.abs(item["gt_boxes"][:, :3] - src[None, :3]).sum(1)
        )
        assert found < 1e-5
