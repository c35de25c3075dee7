"""Dynamic self-evolution driver (SURVEY §3.6).

Replaces the reference's comment-toggling workflow (INFO_PATH lines in
nuscenes2kitti_dataset_centerpoint.yaml:12-19 + SCORE_THRESH comments) with an
explicit round loop:

round r:
  1. train the detector on infos for round r
  2. predict on the train split at SCORE_THRESH=0.5, writing KITTI label txts
  3. rebuild info pkls + gt database from the refined labels
  4. point round r+1 at the new infos

Usage:
    python tools/evolve.py --cfg_file cfgs/kitti_models/centerpoint_nuscenes2kitti.yaml \
        --rounds 2 [--score_thresh 0.5]
"""
import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROUND_NAMES = ["initial", "refine0", "refine1", "refine2", "refine3"]


def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run([str(c) for c in cmd], check=True, **kw)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--rounds", type=int, default=2)
    parser.add_argument("--start_round", type=int, default=0)
    parser.add_argument("--score_thresh", type=float, default=0.5,
                        help="pseudo-box emission threshold (reference comment "
                             "'obtain pseudo boxes', centerpoint yaml:83)")
    parser.add_argument("--epochs", type=int, default=None)
    args = parser.parse_args()

    from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

    cfg = CfgDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    data_root = Path(cfg.DATA_CONFIG.DATA_PATH)
    tools = Path(__file__).parent

    for r in range(args.start_round, args.start_round + args.rounds):
        cur_name = ROUND_NAMES[r]
        next_name = ROUND_NAMES[r + 1]
        tag = f"evolve_round{r}"
        info_name = f"nuscenes2kitti_infos_train_28130_{cur_name}_pseudo_box.pkl"

        # 1. train on this round's infos
        train_cmd = [
            sys.executable, tools / "train.py", "--cfg_file", args.cfg_file,
            "--extra_tag", tag,
            "--set", "DATA_CONFIG.INFO_PATH.train", f"['{info_name}']",
            "DATA_CONFIG.PSEUDO_LABEL_ROUND", cur_name,
        ]
        if args.epochs:
            train_cmd[6:6] = ["--epochs", str(args.epochs)]
        run(train_cmd)

        # 2. predict on the train split at high threshold, save KITTI txts
        out_dir = Path("output") / cfg.get("EXP_GROUP_PATH", "") / Path(args.cfg_file).stem / tag
        run([
            sys.executable, tools / "test.py", "--cfg_file", args.cfg_file,
            "--extra_tag", tag, "--eval_all", "--max_waiting_mins", "0",
            "--save_to_file",
            "--set",
            "MODEL.DENSE_HEAD.POST_PROCESSING.SCORE_THRESH", str(args.score_thresh),
            "DATA_CONFIG.DATA_SPLIT.test", "train",
            "DATA_CONFIG.INFO_PATH.test", f"['{info_name}']",
        ])

        # 3. rebuild infos + gt database from refined labels
        refined_label_dir = f"label_{next_name}"
        # predictions were written under eval/.../final_result/data — link them
        pred_dirs = sorted(out_dir.glob("eval/epoch_*/train/final_result/data"))
        assert pred_dirs, f"no prediction dir under {out_dir}"
        src = pred_dirs[-1]
        dst = data_root / refined_label_dir
        if dst.exists():
            import shutil

            shutil.rmtree(dst)
        import shutil

        shutil.copytree(src, dst)

        run([
            sys.executable, tools / "create_infos.py", "--cfg_file", args.cfg_file,
            "--label_dir", refined_label_dir,
            "--suffix", f"_{next_name}_pseudo_box",
            "--splits", "train",
        ])
        print(f"round {r} complete → {next_name} infos ready", flush=True)


if __name__ == "__main__":
    main()
