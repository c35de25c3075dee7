"""End-to-end DFU3D workflow on a synthetic dataset, with a recorded AP.

Runs the reference's full four-pipeline chain (SURVEY overview) against
generated data — the container ships no nuScenes — using the REAL CLIs:

  1. synthesize a KITTI-format dataset (LiDAR + camera + depth + SEEM
     artifacts + ground-truth labels)                [dfu3d_tpu.pseudo.synthetic]
  2. generate pseudo boxes + densified clouds        [tools/generate_pseudo_boxes.py]
  3. build info pkls: train ← PSEUDO labels, val ← GT labels
  4. train the flagship CenterPoint-pillar on the pseudo boxes [tools/train.py]
  5. evaluate on the GT val split → KITTI AP         [tools/test.py]

Prints one JSON line with the resulting Car AP (unsupervised: trained only on
factory pseudo-labels, evaluated against GT — the DFU3D paper's protocol).

Usage: python tools/e2e_synthetic.py [--workdir DIR] [--epochs 12]
       [--n_train 64] [--n_val 16] [--platform tpu|cpu] [--model pillar|voxel]
       [--evolve_rounds N] [--skip_initial --start_refine R]

Recorded round-2 trajectory (160 frames / 40 epochs, TPU): initial 50.7 →
refine0 58.9 → refine1 61.4 → refine2 62.7 → refine3 68.3 → refine4 68.2
(converged) Car 3D AP moderate R40 — the reference's self-evolution protocol
reproduced end-to-end; sparse voxel variant (--model voxel) initial: 42.9.
"""
import argparse
import json
import pickle
import re
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def head_groups(class_names):
    """CLASS_NAMES_EACH_HEAD: vehicles and VRUs in separate grouped heads
    (the reference's per-head class grouping, centerpoint yaml CLASS_NAMES_
    EACH_HEAD) — exercises multi-head target assignment + multi-class NMS."""
    vru = [c for c in class_names if c in ("Pedestrian", "Cyclist")]
    veh = [c for c in class_names if c not in vru]
    return [g for g in (veh, vru) if g]


def build_cfg(root: Path, workdir: Path, batch_size=8, model="pillar",
              class_names=("Car",)):
    import yaml

    class_names = list(class_names)
    pcr = [0.0, -25.6, -5.0, 51.2, 25.6, 3.0]
    cfg = {
        "CLASS_NAMES": class_names,
        "DATA_CONFIG": {
            "DATASET": "KittiDataset",
            "DATA_PATH": str(root),
            "POINT_CLOUD_RANGE": pcr,
            "DATA_SPLIT": {"train": "train", "test": "val"},
            "INFO_PATH": {"train": ["kitti_infos_train.pkl"],
                          "test": ["kitti_infos_val.pkl"]},
            "LABEL_DIR": "label_train",
            "GET_ITEM_LIST": ["points"],
            "FOV_POINTS_ONLY": True,
            "MAX_POINTS_PER_FRAME": 40960,
            "MAX_GT_PER_FRAME": 64,
            "DATA_AUGMENTOR": {
                "DISABLE_AUG_LIST": ["placeholder"],
                "AUG_CONFIG_LIST": [
                    {"NAME": "gt_sampling",
                     "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                     "PREPARE": {"filter_by_min_points":
                                 [f"{c}:5" for c in class_names]},
                     "SAMPLE_GROUPS": [
                         f"{c}:{8 if c == 'Car' else 4}" for c in class_names
                     ],
                     "NUM_POINT_FEATURES": 4,
                     "LIMIT_WHOLE_SCENE": True},
                    {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
                    {"NAME": "random_world_rotation",
                     "WORLD_ROT_ANGLE": [-0.3926, 0.3926]},
                    {"NAME": "random_world_scaling",
                     "WORLD_SCALE_RANGE": [0.95, 1.05]},
                ],
            },
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": ["x", "y", "z", "intensity"],
                "src_feature_list": ["x", "y", "z", "intensity"],
            },
            "DATA_PROCESSOR": [
                {"NAME": "mask_points_and_boxes_outside_range",
                 "REMOVE_OUTSIDE_BOXES": True},
                {"NAME": "shuffle_points",
                 "SHUFFLE_ENABLED": {"train": True, "test": False}},
                {"NAME": "transform_points_to_voxels_placeholder",
                 "VOXEL_SIZE": [0.2, 0.2, 8.0]},
            ],
        },
        "MODEL": {
            "NAME": "CenterPoint",
            "VFE": {"NAME": "DynPillarVFE", "WITH_DISTANCE": False,
                    "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
                    "NUM_FILTERS": [32, 64]},
            "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 64},
            "BACKBONE_2D": {"NAME": "BaseBEVBackbone",
                            "LAYER_NUMS": [3, 5], "LAYER_STRIDES": [2, 2],
                            "NUM_FILTERS": [64, 128],
                            "UPSAMPLE_STRIDES": [1, 2],
                            "NUM_UPSAMPLE_FILTERS": [64, 64]},
            "DENSE_HEAD": {
                "NAME": "CenterHead", "CLASS_AGNOSTIC": False,
                "CLASS_NAMES_EACH_HEAD": head_groups(class_names),
                "SHARED_CONV_CHANNEL": 64, "USE_BIAS_BEFORE_NORM": True,
                "NUM_HM_CONV": 2,
                "SEPARATE_HEAD_CFG": {
                    "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                    "HEAD_DICT": {
                        "center": {"out_channels": 2, "num_conv": 2},
                        "center_z": {"out_channels": 1, "num_conv": 2},
                        "dim": {"out_channels": 3, "num_conv": 2},
                        "rot": {"out_channels": 2, "num_conv": 2},
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
                    "SCORE_THRESH": 0.1,
                    "POST_CENTER_LIMIT_RANGE": [-10, -30, -10, 60, 30, 10],
                    "MAX_OBJ_PER_SAMPLE": 64,
                    "NMS_CONFIG": {"MULTI_CLASSES_NMS": True,
                                   "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.2,
                                   "NMS_PRE_MAXSIZE": 256,
                                   "NMS_POST_MAXSIZE": 32},
                },
            },
            "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                                "EVAL_METRIC": "kitti"},
        },
        "OPTIMIZATION": {"BATCH_SIZE_PER_GPU": batch_size, "NUM_EPOCHS": 12,
                         "OPTIMIZER": "adam_onecycle", "LR": 0.003,
                         "WEIGHT_DECAY": 0.01, "MOMS": [0.95, 0.85],
                         "PCT_START": 0.4, "DIV_FACTOR": 10,
                         "GRAD_NORM_CLIP": 10},
    }
    if model == "voxel":
        # sparse voxel CenterPoint (MeanVFE + VoxelBackBone8x): exercises
        # the sparse-conv path end-to-end, same head/eval contract
        cfg["DATA_CONFIG"]["DATA_PROCESSOR"][-1] = {
            "NAME": "transform_points_to_voxels_placeholder",
            "VOXEL_SIZE": [0.1, 0.1, 0.2],
            # synthetic frames occupy ~28k voxels at this grid — cap above
            # that or dynamic_voxelize truncates an angular sector of the
            # scene (first-seen cells win) and AP collapses
            "MAX_NUMBER_OF_VOXELS": {"train": 32000, "test": 32000},
        }
        cfg["MODEL"]["VFE"] = {"NAME": "MeanVFE"}
        cfg["MODEL"]["BACKBONE_3D"] = {"NAME": "VoxelBackBone8x"}
        cfg["MODEL"]["MAP_TO_BEV"] = {"NAME": "HeightCompression",
                                      "NUM_BEV_FEATURES": 384}
        cfg["MODEL"]["BACKBONE_2D"]["LAYER_STRIDES"] = [1, 2]
        cfg["MODEL"]["DENSE_HEAD"]["TARGET_ASSIGNER_CONFIG"][
            "FEATURE_MAP_STRIDE"] = 8
    cfg_dir = workdir / "cfgs" / "synthetic"
    cfg_dir.mkdir(parents=True, exist_ok=True)
    stem = ("centerpoint_synthetic" if model == "pillar"
            else f"centerpoint_synthetic_{model}")
    if len(class_names) > 1:
        stem += f"_{len(class_names)}c"
    cfg_file = cfg_dir / f"{stem}.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    return cfg_file


def factory_quality(root: Path, class_names, iou_thresh=0.5):
    """Per-class precision/recall of the pseudo-label factory vs the
    generator's GT (BEV IoU ≥ iou_thresh, camera-frame x/z plane — both label
    sets share the KITTI camera frame so no calib round-trip is needed).
    VERDICT r3 item 5: the factory's precision/recall must be recorded
    alongside the AP trajectory (round 2 measured Car precision 0.28 once,
    single-class, and it was never re-measured)."""
    from dfu3d_tpu.data.kitti_io import get_objects_from_label
    from dfu3d_tpu.data.np_geometry import pairwise_iou_bev

    def cam_bev(objs, cls):
        rows = [
            [o.loc[0], o.loc[2], 0.0, o.l, o.w, 1.0, -o.ry]
            for o in objs if o.cls_type == cls
        ]
        return np.asarray(rows, np.float32).reshape(-1, 7)

    stats = {c: {"tp": 0, "fp": 0, "fn": 0} for c in class_names}
    train_ids = (root / "ImageSets" / "train.txt").read_text().split()
    for idx in train_ids:
        pf = root / "label_train" / f"{idx}.txt"
        gf = root / "label_2" / f"{idx}.txt"
        pred = get_objects_from_label(pf) if pf.exists() else []
        gt = get_objects_from_label(gf) if gf.exists() else []
        for c in class_names:
            pb, gb = cam_bev(pred, c), cam_bev(gt, c)
            if len(pb) == 0:
                stats[c]["fn"] += len(gb)
                continue
            if len(gb) == 0:
                stats[c]["fp"] += len(pb)
                continue
            iou = pairwise_iou_bev(pb, gb)
            # greedy one-to-one matching, best IoU first
            matched_p, matched_g = set(), set()
            for pi, gi in sorted(
                np.ndindex(iou.shape), key=lambda t: -iou[t]
            ):
                if iou[pi, gi] < iou_thresh:
                    break
                if pi in matched_p or gi in matched_g:
                    continue
                matched_p.add(pi)
                matched_g.add(gi)
            stats[c]["tp"] += len(matched_p)
            stats[c]["fp"] += len(pb) - len(matched_p)
            stats[c]["fn"] += len(gb) - len(matched_g)
    out = {}
    for c, s in stats.items():
        prec = s["tp"] / max(s["tp"] + s["fp"], 1)
        rec = s["tp"] / max(s["tp"] + s["fn"], 1)
        out[c] = {"precision": round(prec, 4), "recall": round(rec, 4),
                  **s}
    return out


def main():
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/dfu3d_e2e")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_val", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--platform", type=str, default="tpu",
                    choices=["tpu", "cpu"])
    ap.add_argument("--evolve_rounds", type=int, default=0,
                    help="self-evolution refine rounds after the initial "
                         "train (predict@thresh → rebuild infos → retrain)")
    ap.add_argument("--evolve_thresh", type=float, default=0.5)
    ap.add_argument("--skip_initial", action="store_true",
                    help="reuse an existing workdir's initial training "
                         "(steps 1-5) and go straight to the evolve rounds")
    ap.add_argument("--model", type=str, default="pillar",
                    choices=["pillar", "voxel"],
                    help="flagship pillar CenterPoint or the sparse voxel "
                         "variant (MeanVFE + VoxelBackBone8x)")
    ap.add_argument("--start_refine", type=int, default=0,
                    help="first refine-round index (with --skip_initial, "
                         "resumes from refine{start_refine-1}'s checkpoint "
                         "when that round exists)")
    ap.add_argument("--classes", type=str, default="Car",
                    help="comma-separated class list, e.g. "
                         "Car,Pedestrian,Cyclist — multi-class exercises "
                         "the VRU factory radii, grouped heads, multi-class "
                         "NMS and the per-class eval table")
    args = ap.parse_args()
    class_names = args.classes.split(",")

    workdir = Path(args.workdir)
    root = workdir / "data"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + ":" + env.get("PYTHONPATH", "")
    if args.platform == "cpu":
        env["DFU3D_PLATFORM"] = "cpu"

    # 1. dataset
    if not (root / "ImageSets" / "train.txt").exists():
        from dfu3d_tpu.pseudo.synthetic import make_dataset

        print("[1/5] synthesizing dataset ...", flush=True)
        make_dataset(root, n_train=args.n_train, n_val=args.n_val,
                     class_names=class_names)
    else:
        print("[1/5] dataset exists, reusing", flush=True)

    from dfu3d_tpu.data.kitti_dataset import KittiDataset, create_kitti_infos
    from dfu3d_tpu.utils.config import CfgDict
    import yaml as _yaml

    cfg_file = build_cfg(root, workdir, batch_size=args.batch_size,
                         model=args.model, class_names=class_names)
    full_cfg = _yaml.safe_load(cfg_file.read_text())
    rel_cfg = cfg_file.relative_to(workdir)
    out_dir = workdir / "output" / "synthetic" / cfg_file.stem / "default"

    if args.skip_initial:
        prev_dir = out_dir
        if args.start_refine > 0:
            cand = (workdir / "output" / "synthetic" / cfg_file.stem
                    / f"refine{args.start_refine - 1}")
            if (cand / "ckpt").exists():
                prev_dir = cand
        ckpts = sorted((prev_dir / "ckpt").glob("checkpoint_epoch_*"))
        assert ckpts, f"--skip_initial: no checkpoints under {prev_dir}"
        result = {"value": float("nan"), "detail": "skipped (reused workdir)"}
        print(f"[skip_initial] reusing {ckpts[-1]}", flush=True)
        _run_evolve(args, workdir, root, env, rel_cfg, out_dir, ckpts, result,
                    full_cfg, KittiDataset, create_kitti_infos, CfgDict,
                    class_names)
        return

    # 2. pseudo boxes (train split frames only need them, but run on all)
    print("[2/5] generating pseudo boxes ...", flush=True)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "generate_pseudo_boxes.py"),
         "--detpath", str(root), "--ground_z", "-1.7", "--z_offset", "0.0",
         "--classes", args.classes],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    n_lines = sum(
        len(p.read_text().splitlines())
        for p in (root / "label_train").glob("*.txt")
    )
    print(f"      pseudo boxes written: {n_lines} across "
          f"{len(list((root / 'label_train').glob('*.txt')))} frames", flush=True)
    fq = factory_quality(root, class_names)
    print("FACTORY_QUALITY " + json.dumps(fq), flush=True)

    # 3. infos: train ← pseudo labels, val ← GT
    print("[3/5] building infos ...", flush=True)
    ds_pseudo = CfgDict(full_cfg["DATA_CONFIG"])
    create_kitti_infos(ds_pseudo, class_names, root, root, splits=("train",))
    ds_gt = CfgDict(full_cfg["DATA_CONFIG"])
    ds_gt["LABEL_DIR"] = "label_2"
    create_kitti_infos(ds_gt, class_names, root, root, splits=("val",))
    ds = KittiDataset(ds_pseudo, class_names, training=False, root_path=root)
    ds.set_split("train")
    ds.create_groundtruth_database(
        root / "kitti_infos_train.pkl", root, used_classes=class_names,
        split="train",
    )

    # 4. train on pseudo labels
    print("[4/5] training ...", flush=True)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "train.py"),
         "--cfg_file", str(rel_cfg), "--epochs", str(args.epochs),
         "--workers", "2"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=7200,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    ckpts = sorted((out_dir / "ckpt").glob("checkpoint_epoch_*"))
    assert ckpts, out_dir

    # 5. eval against GT
    print("[5/5] evaluating ...", flush=True)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "test.py"),
         "--cfg_file", str(rel_cfg), "--ckpt", str(ckpts[-1]),
         "--workers", "2"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    text = r.stdout + r.stderr
    ap_lines = re.findall(r"AP_DICT (\{.*\})", text)
    if not ap_lines:
        print(text[-3000:])
        raise SystemExit("no AP_DICT found in eval output")
    per_class = _per_class_ap(json.loads(ap_lines[-1]), class_names)
    m = {k: v for k, v in json.loads(ap_lines[-1]).items()
         if any(f"{c}_3d" in k or f"{c}_bev" in k for c in class_names)}
    result = {
        "metric": "synthetic_e2e_ap3d_moderate_R40",
        "value": float(np.mean(list(per_class.values()))),
        "unit": "AP (mean over classes)",
        "per_class": per_class,
        "detail": {k: float(v) for k, v in m.items()},
        "protocol": "trained on factory pseudo-labels only, eval vs GT",
        "epochs": args.epochs,
        "frames": {"train": args.n_train, "val": args.n_val},
        "factory_quality": fq,
    }
    print(json.dumps(result))

    _run_evolve(args, workdir, root, env, rel_cfg, out_dir, ckpts, result,
                full_cfg, KittiDataset, create_kitti_infos, CfgDict,
                class_names)


def _per_class_ap(ap_dict, class_names):
    """{class: 3d moderate R40 AP} from an AP_DICT."""
    return {c: float(ap_dict.get(f"{c}_3d/moderate_R40", 0.0))
            for c in class_names}


def _run_evolve(args, workdir, root, env, rel_cfg, out_dir, ckpts, result,
                full_cfg, KittiDataset, create_kitti_infos, CfgDict,
                class_names):
    """Self-evolution refine rounds (SURVEY §3.6: train → predict on the
    train split at SCORE_THRESH → rebuild infos from the refined labels →
    retrain from scratch → re-eval; the reference's initial/refine0/refine1
    workflow, README.md:78-83)."""
    ap_history = [result["value"]]
    per_class_history = [result.get("per_class")]
    ckpt = ckpts[-1]
    for r_idx in range(args.start_refine,
                       args.start_refine + args.evolve_rounds):
        tag = f"refine{r_idx}"
        print(f"[evolve {tag}] predicting on train split ...", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "test.py"),
             "--cfg_file", str(rel_cfg), "--ckpt", str(ckpt),
             "--save_to_file", "--eval_tag", f"predict_{tag}",
             "--workers", "2", "--set",
             "DATA_CONFIG.DATA_SPLIT.test", "train",
             "DATA_CONFIG.INFO_PATH.test", "['kitti_infos_train.pkl']"],
            cwd=workdir, env=env, capture_output=True, text=True, timeout=3600,
        )
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
        pred_dirs = sorted(out_dir.glob(
            f"eval/epoch_*/train/predict_{tag}/final_result/data"))
        assert pred_dirs, f"no prediction txts under {out_dir}"
        pred_dir = pred_dirs[-1]

        # keep confident boxes only (reference 'obtain pseudo boxes'
        # SCORE_THRESH comment, centerpoint yaml:83)
        label_dir = root / f"label_{tag}"
        label_dir.mkdir(exist_ok=True)
        frames = (root / "ImageSets" / "train.txt").read_text().split()
        per_frame = {}
        all_scores = []
        for txt in frames:
            src = pred_dir / f"{txt}.txt"
            lines = [l for l in (src.read_text().splitlines()
                                 if src.exists() else [])
                     if len(l.split()) >= 16]
            per_frame[txt] = lines
            all_scores.extend(float(l.split()[15]) for l in lines)
        thresh = args.evolve_thresh
        if all_scores and max(all_scores) < thresh:
            # weak-model safety: an undertrained round would emit zero
            # labels and the next round would collapse — relax to the top
            # 30% of the score distribution (floor 0.1)
            import numpy as _np

            thresh = max(0.1, float(_np.percentile(all_scores, 70.0)))
            print(f"[evolve {tag}] no boxes ≥ {args.evolve_thresh}; "
                  f"relaxed threshold to {thresh:.3f}", flush=True)
        kept = total = 0
        for txt in frames:
            keep = [l for l in per_frame[txt]
                    if float(l.split()[15]) >= thresh]
            kept += len(keep)
            total += len(per_frame[txt])
            (label_dir / f"{txt}.txt").write_text("\n".join(keep) + "\n")
        print(f"[evolve {tag}] kept {kept}/{total} boxes ≥ {thresh}",
              flush=True)
        # an all-empty label set would make every training frame resample
        # forever (gt-less frames re-roll); fail fast instead
        assert kept > 0, (
            f"evolve {tag}: no predictions survived filtering — the model "
            "is too weak to self-train; increase --epochs or lower "
            "--evolve_thresh"
        )

        print(f"[evolve {tag}] rebuilding infos + gt db ...", flush=True)
        ds_ref = CfgDict(full_cfg["DATA_CONFIG"])
        ds_ref["LABEL_DIR"] = f"label_{tag}"
        create_kitti_infos(ds_ref, class_names, root, root, splits=("train",))
        ds_r = KittiDataset(ds_ref, class_names, training=False,
                            root_path=root)
        ds_r.set_split("train")
        ds_r.create_groundtruth_database(
            root / "kitti_infos_train.pkl", root, used_classes=class_names,
            split="train",
        )

        print(f"[evolve {tag}] retraining ...", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "train.py"),
             "--cfg_file", str(rel_cfg), "--epochs", str(args.epochs),
             "--extra_tag", tag, "--workers", "2"],
            cwd=workdir, env=env, capture_output=True, text=True,
            timeout=7200,
        )
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
        tag_dir = workdir / "output" / "synthetic" / Path(rel_cfg).stem / tag
        tag_ckpts = sorted((tag_dir / "ckpt").glob("checkpoint_epoch_*"))
        assert tag_ckpts, tag_dir
        ckpt = tag_ckpts[-1]

        print(f"[evolve {tag}] evaluating vs GT ...", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "test.py"),
             "--cfg_file", str(rel_cfg), "--ckpt", str(ckpt),
             "--extra_tag", tag, "--workers", "2"],
            cwd=workdir, env=env, capture_output=True, text=True, timeout=3600,
        )
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
        ap_lines = re.findall(r"AP_DICT (\{.*\})", r.stdout + r.stderr)
        assert ap_lines, "no AP_DICT in refine eval output"
        per_class = _per_class_ap(json.loads(ap_lines[-1]), class_names)
        ap_r = float(np.mean(list(per_class.values())))
        ap_history.append(ap_r)
        per_class_history.append(per_class)
        print(json.dumps({
            "metric": f"synthetic_e2e_ap3d_moderate_R40_{tag}",
            "value": ap_r, "unit": "AP (mean over classes)",
            "per_class": per_class, "ap_history": ap_history,
            "per_class_history": per_class_history,
        }), flush=True)


if __name__ == "__main__":
    main()
