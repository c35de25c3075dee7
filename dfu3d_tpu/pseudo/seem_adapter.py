"""In-process SEEM/X-Decoder segmentation adapter (reference:
tools/PENet/vis_utils.py SegSeem:169-224).

The reference calls an X-Decoder ("SEEM") open-vocabulary segmenter
in-process per frame: resize-800 BICUBIC, crop to 352x1216, prompt with the
thing-class list, keep instances with score > 0.7, and derive 2D boxes from
the bit masks. This module gives that adapter shape a first-class
counterpart with three interchangeable backends:

* ``xdecoder`` — the reference's own stack (X-Decoder weights + detectron2
  utils + torch CUDA), import-gated: constructing it without the packages
  raises with install instructions. Checkpoints cannot ship in this
  container, so this backend exists for parity of FORM and for deployments
  that have the weights.
* ``artifact`` — reads the factory's out-of-process contract
  (``seem/<idx>.npz``); this is what the hermetic TPU pipeline uses.
* any callable ``image -> SegmentationResult`` — lets tests and custom
  segmenters drop in without touching the factory.

``SeemSegmenter.cache_artifact`` writes a result back as the npz contract,
making the artifact directory exactly what it is in the reference: a cache
of the in-process adapter's outputs.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Sequence, Union

import numpy as np

DEFAULT_THING_CLASSES = ("Car", "Pedestrian", "Person ride a bike")
SCORE_THRESH = 0.7         # ref vis_utils.py:221
CROP_HW = (352, 1216)      # ref vis_utils.py:197
RESIZE_SHORT = 800         # ref vis_utils.py:178


@dataclass
class SegmentationResult:
    """One frame's instance segmentation (the SegSeem return contract)."""

    masks: np.ndarray    # (K, H, W) bool
    classes: np.ndarray  # (K,) int — indices into thing_classes
    scores: np.ndarray   # (K,) float
    boxes2d: np.ndarray  # (K, 4) x1 y1 x2 y2


def boxes2d_from_masks(masks: np.ndarray) -> np.ndarray:
    """Tight 2D boxes of bit masks (the detectron2
    ``BitMasks.get_bounding_boxes`` step at vis_utils.py:219), numpy-only.
    Empty masks produce a zero box, matching detectron2."""
    masks = np.asarray(masks).astype(bool)
    k = masks.shape[0]
    boxes = np.zeros((k, 4), np.float32)
    for i in range(k):
        ys, xs = np.nonzero(masks[i])
        if len(xs):
            boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
    return boxes


class SeemSegmenter:
    """Front-end over the three backends; ``__call__`` runs one frame."""

    def __init__(self,
                 backend: Union[str, Callable] = "artifact",
                 thing_classes: Sequence[str] = DEFAULT_THING_CLASSES,
                 artifact_root: Optional[Path] = None,
                 score_thresh: float = SCORE_THRESH,
                 weights_path: Optional[str] = None):
        self.thing_classes = list(thing_classes)
        self.score_thresh = float(score_thresh)
        self.artifact_root = Path(artifact_root) if artifact_root else None
        self._fn = None
        self._model = None
        if callable(backend):
            self.backend = "callable"
            self._fn = backend
        elif backend == "artifact":
            self.backend = "artifact"
        elif backend == "xdecoder":
            self.backend = "xdecoder"
            self._model = self._build_xdecoder(weights_path)
        else:
            raise ValueError(f"unknown SEEM backend {backend!r}")

    # -- backends ----------------------------------------------------------

    def _build_xdecoder(self, weights_path):  # pragma: no cover - deps absent
        """The reference's model construction (vis_utils.py:170-196)."""
        try:
            import torch  # noqa: F401
            from xdecoder.BaseModel import BaseModel
            from xdecoder import build_model
            from utils.arguments import load_opt_command
            from utils.distributed import init_distributed
        except ImportError as e:
            raise ImportError(
                "The xdecoder backend needs the X-Decoder package and its "
                "detectron2 utilities plus the xdecoder_focalt_best_openseg "
                "checkpoint (reference vis_utils.py:169-196). Install them "
                "and pass weights_path=, or use the 'artifact' backend with "
                "precomputed seem/<idx>.npz files."
            ) from e
        opt, _ = load_opt_command(None)
        opt = init_distributed(opt)
        model = BaseModel(opt, build_model(opt)).from_pretrained(
            weights_path
        ).eval()
        model.model.sem_seg_head.predictor.lang_encoder.get_text_embeddings(
            self.thing_classes + ["background"], is_eval=False
        )
        model.model.sem_seg_head.num_classes = len(self.thing_classes)
        return model

    def _run_xdecoder(self, image):  # pragma: no cover - deps absent
        import torch
        from PIL import Image as PILImage
        from torchvision import transforms

        h, w = CROP_HW
        image = np.asarray(image)[:h, :w]
        height, width = image.shape[:2]
        pil = PILImage.fromarray(image)
        resized = np.asarray(
            transforms.Resize(RESIZE_SHORT,
                              interpolation=PILImage.BICUBIC)(pil)
        )
        tensor = torch.from_numpy(resized.copy()).permute(2, 0, 1)
        with torch.no_grad():
            out = self._model.forward(
                [{"image": tensor, "height": height, "width": width}]
            )
        inst = out[0]["instances"]
        keep = (inst.scores > self.score_thresh).cpu().numpy()
        masks = inst.pred_masks.cpu().numpy() > 0
        return SegmentationResult(
            masks=masks[keep],
            classes=inst.pred_classes.cpu().numpy()[keep].astype(int),
            scores=inst.scores.cpu().numpy()[keep].astype(np.float32),
            boxes2d=boxes2d_from_masks(masks[keep]),
        )

    def _load_artifact(self, frame_id) -> SegmentationResult:
        if self.artifact_root is None:
            raise ValueError("artifact backend needs artifact_root=")
        seem = np.load(self.artifact_root / f"{frame_id}.npz")
        return SegmentationResult(
            masks=seem["masks"].astype(bool),
            classes=seem["classes"].astype(int),
            scores=seem["scores"].astype(np.float32),
            boxes2d=seem["boxes2d"].astype(np.float32),
        )

    # -- API ---------------------------------------------------------------

    def __call__(self, image, frame_id: Optional[str] = None
                 ) -> SegmentationResult:
        if self.backend == "artifact":
            return self._load_artifact(frame_id)
        if self.backend == "callable":
            res = self._fn(image)
            if res.boxes2d is None or not len(res.boxes2d):
                res.boxes2d = boxes2d_from_masks(res.masks)
            keep = np.asarray(res.scores) > self.score_thresh
            return SegmentationResult(
                masks=np.asarray(res.masks)[keep],
                classes=np.asarray(res.classes)[keep],
                scores=np.asarray(res.scores)[keep],
                boxes2d=np.asarray(res.boxes2d)[keep],
            )
        return self._run_xdecoder(image)

    def cache_artifact(self, root: Path, frame_id: str,
                       result: SegmentationResult) -> Path:
        """Persist a result as the out-of-process npz contract, so a live
        segmenter populates the same cache the hermetic pipeline reads."""
        out = Path(root) / "seem"
        out.mkdir(parents=True, exist_ok=True)
        path = out / f"{frame_id}.npz"
        np.savez_compressed(
            path, masks=result.masks.astype(bool),
            classes=result.classes.astype(np.int64),
            scores=result.scores.astype(np.float32),
            boxes2d=result.boxes2d.astype(np.float32),
        )
        return path
