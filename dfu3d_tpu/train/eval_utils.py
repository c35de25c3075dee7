"""Evaluation loop (reference: tools/eval_utils/eval_utils.py eval_one_epoch).

Batched jitted inference → per-frame prediction dicts → recall statistics
against gt (reference detector3d_template.generate_recall_record:286-327) →
dataset.evaluation() (KITTI AP). Cross-host merge uses
`multihost_utils.process_allgather` semantics when running multi-process; on a
single host it is a no-op.
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np
import tqdm

from ..parallel import make_mesh, shard_batch
from .train_state import make_eval_step


def eval_one_epoch(model, state, dataset, dataloader, cfg, logger,
                   result_dir=None, save_to_file=False, mesh=None):
    """Returns (ap_result_str, ap_dict)."""
    class_names = cfg.CLASS_NAMES
    thresh_list = cfg.MODEL.get("POST_PROCESSING", {}).get(
        "RECALL_THRESH_LIST", [0.3, 0.5, 0.7]
    )
    # recall counters run in-graph (fixed shapes, one compile); counting on
    # host recompiled pairwise_iou3d per frame — see make_eval_step
    eval_step = jax.jit(make_eval_step(model, recall_thresh=tuple(thresh_list)))

    det_annos = []
    metric = {"gt_num": 0, **{f"recall_rcnn_{t}": 0 for t in thresh_list}}
    out_label_dir = None
    if save_to_file and result_dir is not None:
        out_label_dir = Path(result_dir) / "final_result" / "data"
        out_label_dir.mkdir(parents=True, exist_ok=True)

    start = time.time()
    num_frames = 0

    def drain(meta, batch_size, outputs):
        nonlocal num_frames
        boxes, scores, labels, valid, recall = jax.device_get(outputs)
        metric["gt_num"] += int(recall["gt_num"])
        for t in thresh_list:
            metric[f"recall_rcnn_{t}"] += int(recall[f"recall_rcnn_{t}"])
        pred_dicts = []
        for i in range(batch_size):
            v = valid[i]
            order = np.argsort(-scores[i][v])
            pred_dicts.append(
                {
                    "pred_boxes": boxes[i][v][order],
                    "pred_scores": scores[i][v][order],
                    "pred_labels": labels[i][v][order],
                }
            )
        annos = dataset.generate_prediction_dicts(
            meta, pred_dicts, class_names, output_path=out_label_dir
        )
        det_annos.extend(annos)
        num_frames += batch_size

    # bounded prefetch: dispatch up to PREFETCH batches ahead and drain in
    # order, overlapping device compute / tunnel transfer of batch k+1 with
    # host-side anno generation of batch k (jax async dispatch makes
    # eval_step return device futures immediately; only device_get blocks)
    PREFETCH = 2
    pending = []
    for batch, meta in tqdm.tqdm(dataloader, desc="eval", dynamic_ncols=True):
        if mesh is None:
            # data axis must divide the batch; fall back to fewer devices
            n = jax.local_device_count()
            while batch.batch_size % n:
                n -= 1
            mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        sharded = shard_batch(mesh, batch)
        pending.append((meta, batch.batch_size, eval_step(state, sharded)))
        if len(pending) > PREFETCH:
            drain(*pending.pop(0))
    for item in pending:
        drain(*item)

    # cross-host merge (reference merge_results_dist, common_utils.py:223-257):
    # each host evaluated its loader shard; gather every host's annos +
    # recall counters, restore dataset order by frame_id, and compute AP on
    # the union. Single-process: no-op.
    if jax.process_count() > 1:
        from ..parallel.distributed import all_gather_objects

        gathered = all_gather_objects({"annos": det_annos, "metric": metric})
        det_annos = [a for g in gathered for a in g["annos"]]
        merged = {k: 0 for k in metric}
        for g in gathered:
            for k, v in g["metric"].items():
                merged[k] += v
        metric = merged
        order = {
            str(info.get("frame_id", info.get("point_cloud", {}).get(
                "lidar_idx", i))): i
            for i, info in enumerate(getattr(dataset, "infos", []))
        }
        det_annos.sort(
            key=lambda a: order.get(str(a.get("frame_id")), len(order))
        )
        num_frames = len(det_annos)

    sec_per_example = (time.time() - start) / max(num_frames, 1)
    if logger:
        logger.info(f"eval: {sec_per_example:.4f} s/frame ({num_frames} frames)")
        gt_num = max(metric["gt_num"], 1)
        for t in thresh_list:
            logger.info(
                f"recall_rcnn_{t}: {metric[f'recall_rcnn_{t}'] / gt_num:.4f}"
            )

    result_str, result_dict = dataset.evaluation(det_annos, class_names)
    if logger:
        logger.info(result_str)
        # machine-readable AP line for scripting (self-evolution drivers,
        # e2e harnesses) — one JSON object after the pretty table
        import json as _json

        logger.info(
            "AP_DICT " + _json.dumps(
                {k: float(v) for k, v in result_dict.items()}, sort_keys=True
            )
        )
    result_dict["sec_per_example"] = sec_per_example
    for t in thresh_list:
        result_dict[f"recall/rcnn_{t}"] = metric[f"recall_rcnn_{t}"] / max(
            metric["gt_num"], 1
        )
    return result_str, result_dict, det_annos
