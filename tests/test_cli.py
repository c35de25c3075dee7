"""CLI smoke tests: tools/train.py + tools/test.py as real subprocesses on the
synthetic KITTI dataset (the user-facing surface, reference §3.3-3.4)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from test_e2e import CLASSES, _dataset_cfg, synth_root  # noqa: F401

REPO = Path(__file__).resolve().parents[1]


def _write_cfg(synth_root, tmp_path):
    import json

    # CfgDict → plain dicts for yaml serialization
    ds = json.loads(json.dumps(_dataset_cfg(synth_root)))
    cfg = {
        "CLASS_NAMES": CLASSES,
        "DATA_CONFIG": ds,
        "MODEL": {
            "NAME": "CenterPoint",
            "VFE": {"NAME": "DynPillarVFE", "WITH_DISTANCE": False,
                    "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
                    "NUM_FILTERS": [16]},
            "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
            "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1, 1],
                            "LAYER_STRIDES": [2, 2], "NUM_FILTERS": [16, 32],
                            "UPSAMPLE_STRIDES": [1, 2],
                            "NUM_UPSAMPLE_FILTERS": [16, 16]},
            "DENSE_HEAD": {
                "NAME": "CenterHead", "CLASS_AGNOSTIC": False,
                "CLASS_NAMES_EACH_HEAD": [["Car", "Pedestrian"]],
                "SHARED_CONV_CHANNEL": 16, "USE_BIAS_BEFORE_NORM": True,
                "NUM_HM_CONV": 1,
                "SEPARATE_HEAD_CFG": {
                    "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                    "HEAD_DICT": {
                        "center": {"out_channels": 2, "num_conv": 1},
                        "center_z": {"out_channels": 1, "num_conv": 1},
                        "dim": {"out_channels": 3, "num_conv": 1},
                        "rot": {"out_channels": 2, "num_conv": 1},
                    },
                },
                "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 2,
                                           "NUM_MAX_OBJS": 64,
                                           "GAUSSIAN_OVERLAP": 0.1,
                                           "MIN_RADIUS": 2},
                "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                                 "loc_weight": 0.25,
                                                 "code_weights": [1.0] * 8}},
                "POST_PROCESSING": {
                    "SCORE_THRESH": 0.0,
                    "POST_CENTER_LIMIT_RANGE": [-40, -40, -10, 40, 40, 10],
                    "MAX_OBJ_PER_SAMPLE": 64,
                    "NMS_CONFIG": {"MULTI_CLASSES_NMS": True,
                                   "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.6,
                                   "NMS_PRE_MAXSIZE": 64,
                                   "NMS_POST_MAXSIZE": 16},
                },
            },
            "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                                "EVAL_METRIC": "kitti"},
        },
        "OPTIMIZATION": {"BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 1,
                         "OPTIMIZER": "adam_onecycle", "LR": 0.003,
                         "WEIGHT_DECAY": 0.01, "MOMS": [0.95, 0.85],
                         "PCT_START": 0.4, "DIV_FACTOR": 10,
                         "GRAD_NORM_CLIP": 10},
    }
    # cfg path shape <group>/<name>.yaml so EXP_GROUP_PATH derives cleanly
    cfg_dir = tmp_path / "cfgs" / "smoke"
    cfg_dir.mkdir(parents=True)
    cfg_file = cfg_dir / "centerpoint_smoke.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    return cfg_file


@pytest.mark.slow
class TestCLI:
    def test_train_then_eval(self, synth_root, tmp_path):
        import os

        cfg_file = _write_cfg(synth_root, tmp_path)
        rel_cfg = cfg_file.relative_to(tmp_path)  # EXP_GROUP_PATH derives from
        # the cfg path parts after the first — pass it relative (reference
        # convention: run from tools/ with cfgs/... paths)
        env = dict(os.environ)
        env["DFU3D_PLATFORM"] = "cpu"
        env["DFU3D_CPU_DEVICES"] = "2"
        env["PYTHONPATH"] = str(REPO)

        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "train.py"),
             "--cfg_file", str(rel_cfg), "--epochs", "1", "--workers", "2",
             "--dtype", "float32"],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        out_dir = tmp_path / "output" / "smoke" / "centerpoint_smoke" / "default"
        ckpts = list((out_dir / "ckpt").glob("checkpoint_epoch_*"))
        assert ckpts, (r.stdout[-2000:], r.stderr[-2000:])

        r2 = subprocess.run(
            [sys.executable, str(REPO / "tools" / "test.py"),
             "--cfg_file", str(rel_cfg), "--eval_all",
             "--max_waiting_mins", "0", "--workers", "2", "--save_to_file",
             "--dtype", "float32"],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r2.returncode == 0, r2.stderr[-3000:]
        # AP table printed + KITTI-format predictions written
        eval_dirs = list((out_dir / "eval").glob("epoch_*/val/final_result/data"))
        assert eval_dirs, r2.stdout[-2000:]
        txts = list(eval_dirs[0].glob("*.txt"))
        assert len(txts) == 6
