"""In-process SEEM adapter (reference SegSeem, tools/PENet/vis_utils.py
:150-224): backend selection, score gating, mask->box derivation, and the
npz cache being exactly the out-of-process contract."""
import numpy as np
import pytest

from dfu3d_tpu.pseudo.seem_adapter import (
    SegmentationResult,
    SeemSegmenter,
    boxes2d_from_masks,
)


def _synthetic_result(h=40, w=60):
    masks = np.zeros((3, h, w), bool)
    masks[0, 5:15, 10:30] = True
    masks[1, 20:35, 40:55] = True
    # masks[2] empty on purpose
    return SegmentationResult(
        masks=masks,
        classes=np.array([0, 1, 2]),
        scores=np.array([0.9, 0.8, 0.5], np.float32),
        boxes2d=np.zeros((0, 4), np.float32),
    )


class TestBoxesFromMasks:
    def test_tight_boxes_and_empty(self):
        res = _synthetic_result()
        boxes = boxes2d_from_masks(res.masks)
        np.testing.assert_allclose(boxes[0], [10, 5, 30, 15])
        np.testing.assert_allclose(boxes[1], [40, 20, 55, 35])
        np.testing.assert_allclose(boxes[2], [0, 0, 0, 0])


class TestCallableBackend:
    def test_score_gate_and_derived_boxes(self):
        seg = SeemSegmenter(backend=lambda img: _synthetic_result())
        out = seg(np.zeros((40, 60, 3), np.uint8))
        # the 0.5-score instance is dropped by the reference's 0.7 gate
        assert out.masks.shape[0] == 2
        assert list(out.classes) == [0, 1]
        np.testing.assert_allclose(out.boxes2d[0], [10, 5, 30, 15])


class TestArtifactCacheRoundtrip:
    def test_cache_equals_contract(self, tmp_path):
        live = SeemSegmenter(backend=lambda img: _synthetic_result())
        result = live(np.zeros((40, 60, 3), np.uint8))
        live.cache_artifact(tmp_path, "000007", result)

        cached = SeemSegmenter(backend="artifact",
                               artifact_root=tmp_path / "seem")
        out = cached(None, frame_id="000007")
        np.testing.assert_array_equal(out.masks, result.masks)
        np.testing.assert_array_equal(out.classes, result.classes)
        np.testing.assert_allclose(out.scores, result.scores)
        np.testing.assert_allclose(out.boxes2d, result.boxes2d)

    def test_load_frame_inputs_accepts_segmenter(self, tmp_path):
        # minimal frame dir without a seem/ artifact: the in-process
        # segmenter replaces it (factory.load_frame_inputs segmenter=)
        from PIL import Image

        from dfu3d_tpu.pseudo.factory import load_frame_inputs

        (tmp_path / "calib").mkdir()
        (tmp_path / "velodyne").mkdir()
        (tmp_path / "image_2").mkdir()
        (tmp_path / "depth").mkdir()
        (tmp_path / "calib" / "000000.txt").write_text(
            "P2: 700 0 620 0 0 700 180 0 0 0 1 0\n"
            "R0_rect: 1 0 0 0 1 0 0 0 1\n"
            "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
        )
        np.zeros((8, 4), np.float32).tofile(tmp_path / "velodyne" /
                                            "000000.bin")
        Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(
            tmp_path / "image_2" / "000000.png"
        )
        np.save(tmp_path / "depth" / "000000.npy",
                np.zeros((40, 60), np.float32))
        seg = SeemSegmenter(backend=lambda img: _synthetic_result())
        frame = load_frame_inputs(tmp_path, "000000", segmenter=seg)
        assert frame.masks.shape[0] == 2
        assert frame.masks.dtype == bool


class TestXDecoderGate:
    def test_missing_stack_raises_helpfully(self):
        with pytest.raises(ImportError, match="artifact"):
            SeemSegmenter(backend="xdecoder")
