"""End-to-end AP parity vs the REFERENCE'S OWN eval chain.

Closes the last unpinned stage between "final boxes equal" (TestReference-
DecodeParity) and "the number the paper reports is computed identically":
on a synthetic KITTI-format dataset, both sides run

  model forward (converted weights)
    -> final boxes (shared CPU rotated-NMS oracle, as in decode parity)
    -> generate_prediction_dicts  (lidar->camera conversion + KITTI writer,
       reference pcdet/datasets/kitti/kitti_dataset.py:339-419)
    -> GT info annos               (reference get_infos :158-266 vs our
       create_kitti_infos)
    -> get_official_eval_result    (reference kitti_object_eval_python/eval.py
       :693-836, numba stubbed to pure python, vs our eval/kitti_eval.py)

and the resulting KITTI ap_dicts must be EQUAL. The reference side is the
reference's actual code: its KittiDataset.generate_prediction_dicts
staticmethod, its get_infos (run on a detached instance so the CUDA/voxel
config machinery of DatasetTemplate stays out of the loop), its
object3d_kitti label parser, its calibration_kitti, and its eval.py exec'd
with numba stubbed (tools/dev/make_reference_eval_golden.load_reference_eval
— both sides share one rotated-overlap geometry so the comparison pins the
protocol + conversion math, as the round-3 golden established).

Container substitutions (each shared or inert): CUDA NMS -> one shared CPU
oracle on both sides; skimage.io.imread -> PIL (image SHAPE only);
count_inside_pts=False on the reference get_infos (needs the CUDA roiaware
op; num_points_in_gt is unused by eval).
"""
import copy
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not Path("/root/reference/pcdet").is_dir():  # pragma: no cover
    pytest.skip("reference tree not present", allow_module_level=True)

import jax
import jax.numpy as jnp

from reference_stubs import EDict, install_reference_stubs, no_cuda
from test_reference_parity import (
    CLASS_NAMES,
    CLASS_NAMES_EACH_HEAD,
    _build_reference_flagship,
    _match_rows_and_compare,
    _oracle_rotated_nms,
)

from dfu3d_tpu.train import torch_convert as tc

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools" / "dev"))

pytestmark = pytest.mark.slow

# medium grid covering the synthetic scenes (objects at x 8-45, |y| < 10;
# tools/e2e_synthetic.py uses the same range)
PCR_M = [0.0, -25.6, -5.0, 51.2, 25.6, 3.0]
VOXEL_M = [0.4, 0.4, 8.0]
GRID_M = [128, 128, 1]
N_FRAMES = 16
N_PAD = 40960

POST = dict(
    SCORE_THRESH=0.1,
    POST_CENTER_LIMIT_RANGE=[-75.0, -75.0, -10.0, 75.0, 75.0, 10.0],
    MAX_OBJ_PER_SAMPLE=64,
    NMS_CONFIG=dict(NMS_TYPE="nms_gpu", NMS_THRESH=0.6,
                    NMS_PRE_MAXSIZE=1000, NMS_POST_MAXSIZE=16),
)


@pytest.fixture(scope="module")
def ref_modules():
    install_reference_stubs()
    from pcdet.models.backbones_2d.base_bev_backbone import BaseBEVBackbone
    from pcdet.models.backbones_2d.map_to_bev.pointpillar_scatter import (
        PointPillarScatter,
    )
    from pcdet.models.backbones_3d.vfe.dynamic_pillar_vfe import (
        DynamicPillarVFE,
    )
    from pcdet.models.dense_heads.center_head import CenterHead

    return dict(
        DynamicPillarVFE=DynamicPillarVFE,
        PointPillarScatter=PointPillarScatter,
        BaseBEVBackbone=BaseBEVBackbone,
        CenterHead=CenterHead,
    )


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    from dfu3d_tpu.pseudo.synthetic import make_dataset

    root = tmp_path_factory.mktemp("ap_parity_kitti")
    make_dataset(root, n_train=1, n_val=N_FRAMES, n_instances=8,
                 class_names=("Car",))
    return root


def _ours_model():
    from dfu3d_tpu.core.voxel import VoxelGrid
    from dfu3d_tpu.models import build_network
    from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

    cfg = CfgDict()
    cfg_from_yaml_file(
        REPO / "tools/cfgs/kitti_models/centerpoint_nuscenes2kitti.yaml", cfg)
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = PCR_M
    grid = VoxelGrid.create(PCR_M, VOXEL_M)
    model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid, dtype=jnp.float32)
    return model


def _load_points(root, fid):
    from dfu3d_tpu.data import kitti_io

    pts = kitti_io.read_velodyne_bin(root / "velodyne" / f"{fid}.bin")
    lo, hi = np.array(PCR_M[:3]), np.array(PCR_M[3:])
    m = np.all((pts[:, :3] >= lo) & (pts[:, :3] < hi - 1e-4), axis=1)
    return pts[m][:N_PAD]


def _point_batch(frames):
    from dfu3d_tpu.data.dataset import PointBatch

    b = len(frames)
    pts = np.zeros((b, N_PAD, 4), np.float32)
    valid = np.zeros((b, N_PAD), bool)
    for i, p in enumerate(frames):
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
    gt = np.zeros((b, 8, 8), np.float32)
    gt[..., 3:6] = 1.0
    return PointBatch(pts, valid, gt, np.zeros((b, 8), bool))


def _torch_points(frames):
    rows = [
        np.concatenate(
            [np.full((len(p), 1), i, np.float32), p.astype(np.float32)], axis=1
        )
        for i, p in enumerate(frames)
    ]
    return torch.tensor(np.concatenate(rows, axis=0))


class _RefDetachedKitti:
    """Run the reference KittiDataset's get_infos on a detached instance:
    the method only reads split/root_split_path/sample_id_list and the
    get_label/get_calib/get_image_shape getters, so DatasetTemplate's
    augmentor/processor config machinery (CUDA/spconv-facing) stays out."""

    def __new__(cls, root, split, sample_ids):
        from pcdet.datasets.kitti.kitti_dataset import KittiDataset as RefKD

        ds = object.__new__(RefKD)
        ds.split = split
        ds.root_split_path = Path(root)
        ds.sample_id_list = list(sample_ids)

        def get_image_shape(idx, _ds=ds):
            # reference get_image_shape uses skimage.io (absent here); only
            # the (H, W) ints are consumed
            from PIL import Image

            with Image.open(_ds.root_split_path / "image_2" / f"{idx}.png") as im:
                return np.array([im.height, im.width], dtype=np.int32)

        ds.get_image_shape = get_image_shape
        return ds


@pytest.fixture(scope="module")
def pipeline(ref_modules, kitti_root, tmp_path_factory):
    """Forward all val frames through both converted models and produce
    final per-frame (boxes, scores, labels) on each side."""
    ref = _build_reference_flagship(
        ref_modules, pcr=PCR_M, voxel=VOXEL_M, grid=GRID_M)
    # spread the random-init heatmap scores so top-K boundaries have real
    # gaps (same device both sides — tests selection, not tie-breaking)
    with torch.no_grad():
        for h in ref.dense_head.heads_list:
            convs = [m for m in h.hm.modules()
                     if isinstance(m, torch.nn.Conv2d)]
            convs[-1].weight.mul_(12.0)

    model = _ours_model()
    fids = sorted(
        (kitti_root / "ImageSets" / "val.txt").read_text().split())
    assert len(fids) == N_FRAMES
    frames = [_load_points(kitti_root, f) for f in fids]

    batch0 = _point_batch(frames[:2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch0, train=False,
        method=lambda m, b, train: m._features(b, train),
    )
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    new_vars, report = tc.apply_mapping(
        variables, state, tc.centerpoint_pillar_mapping())
    assert not report["missing_in_torch"]
    converted = {"params": new_vars["params"],
                 "batch_stats": new_vars["batch_stats"]}

    from dfu3d_tpu.utils.config import CfgDict

    post = CfgDict(POST)
    decode = jax.jit(
        lambda v, b: model.apply(
            v, b, train=False,
            method=lambda m, bb, train: m.dense_head.decode_topk(
                m._features(bb, train), post),
        )
    )
    ref.dense_head.model_cfg["POST_PROCESSING"] = EDict(POST)

    nms_cfg = POST["NMS_CONFIG"]
    mapping = [np.asarray([CLASS_NAMES.index(n) + 1 for n in head])
               for head in CLASS_NAMES_EACH_HEAD]

    ours_pred, ref_pred = [], []
    bsz = 4
    for i in range(0, N_FRAMES, bsz):
        chunk = frames[i:i + bsz]
        # ours: decode_topk + oracle NMS (the converted eval path under the
        # shared oracle, as in TestReferenceDecodeParity)
        per_head = decode(converted, _point_batch(chunk))
        per_head = [tuple(np.asarray(t) for t in h) for h in per_head]
        for b in range(len(chunk)):
            got_b, got_s, got_l = [], [], []
            for hi, (boxes, scores, cls, valid) in enumerate(per_head):
                bx, sc, cl = (boxes[b][valid[b]], scores[b][valid[b]],
                              cls[b][valid[b]])
                keep = _oracle_rotated_nms(
                    bx, sc, nms_cfg["NMS_THRESH"],
                    pre_max=nms_cfg["NMS_PRE_MAXSIZE"],
                    post_max=nms_cfg["NMS_POST_MAXSIZE"])
                got_b.append(bx[keep])
                got_s.append(sc[keep])
                got_l.append(mapping[hi][cl[keep]])
            ours_pred.append(dict(
                pred_boxes=np.concatenate(got_b),
                pred_scores=np.concatenate(got_s),
                pred_labels=np.concatenate(got_l).astype(np.int64),
            ))

        # reference: its own forward + generate_predicted_boxes with the
        # oracle patched over the CUDA nms_gpu
        from pcdet.ops.iou3d_nms import iou3d_nms_utils

        bd = {"points": _torch_points(chunk), "batch_size": len(chunk)}
        with torch.no_grad():
            bd = ref.vfe(bd)
            bd = ref.map_to_bev(bd)
            bd = ref.backbone_2d(bd)
            x = ref.dense_head.shared_conv(bd["spatial_features_2d"])
            preds = [dict(h(x)) for h in ref.dense_head.heads_list]

        def fake_nms_gpu(boxes, scores, thresh, **kw):
            keep = _oracle_rotated_nms(
                boxes.numpy(), scores.numpy(), thresh,
                pre_max=len(scores), post_max=nms_cfg["NMS_POST_MAXSIZE"])
            return torch.as_tensor(keep), None

        orig = getattr(iou3d_nms_utils, "nms_gpu", None)
        iou3d_nms_utils.nms_gpu = fake_nms_gpu
        try:
            with no_cuda(), torch.no_grad():
                ret = ref.dense_head.generate_predicted_boxes(
                    len(chunk), preds)
        finally:
            iou3d_nms_utils.nms_gpu = orig
        ref_pred.extend(ret)

    # Inject IDENTICAL near-GT detections on both sides: the random-init
    # model never overlaps GT, which would leave every AP at 0 and the
    # eval-chain comparison toothless. The injected rows flow through each
    # side's own generate_prediction_dicts + eval independently, so the
    # matching / difficulty / AP-interpolation stages see real matches.
    rng = np.random.RandomState(7)
    from dfu3d_tpu.data.kitti_io import get_objects_from_label

    for i, fid in enumerate(fids):
        objs = get_objects_from_label(kitti_root / "label_2" / f"{fid}.txt")
        from dfu3d_tpu.core.geometry.calibration import Calibration

        calib = Calibration(str(kitti_root / "calib" / f"{fid}.txt"))
        add_b, add_s = [], []
        for o in objs:
            if o.cls_type != "Car":
                continue
            loc = calib.rect_to_lidar(o.loc.reshape(1, 3))[0]
            box = np.array([
                loc[0] + rng.normal(0, 0.15),
                loc[1] + rng.normal(0, 0.15),
                loc[2] + o.h / 2 + rng.normal(0, 0.1),
                o.l * (1 + rng.normal(0, 0.03)),
                o.w * (1 + rng.normal(0, 0.03)),
                o.h * (1 + rng.normal(0, 0.03)),
                -(np.pi / 2 + o.ry) + rng.normal(0, 0.05),
            ], np.float32)
            add_b.append(box)
            add_s.append(0.95 - 0.013 * len(add_s) - 0.001 * i)
        if not add_b:
            continue
        add_b = np.stack(add_b)
        add_s = np.array(add_s, np.float32)
        add_l = np.ones(len(add_b), np.int64)  # Car
        op = ours_pred[i]
        ours_pred[i] = dict(
            pred_boxes=np.concatenate([op["pred_boxes"], add_b]),
            pred_scores=np.concatenate([op["pred_scores"], add_s]),
            pred_labels=np.concatenate([op["pred_labels"], add_l]),
        )
        rp = ref_pred[i]
        ref_pred[i] = dict(
            pred_boxes=torch.cat(
                [rp["pred_boxes"].float(), torch.tensor(add_b)]),
            pred_scores=torch.cat(
                [rp["pred_scores"].float(), torch.tensor(add_s)]),
            pred_labels=torch.cat(
                [rp["pred_labels"].long(), torch.tensor(add_l)]),
        )

    return kitti_root, fids, ours_pred, ref_pred


class TestReferenceAPParity:
    def test_final_boxes_match(self, pipeline):
        _root, fids, ours_pred, ref_pred = pipeline
        for i in range(N_FRAMES):
            got = ours_pred[i]
            want_b = ref_pred[i]["pred_boxes"].numpy()
            want_s = ref_pred[i]["pred_scores"].numpy()
            want_l = ref_pred[i]["pred_labels"].numpy()
            assert got["pred_boxes"].shape == want_b.shape, fids[i]
            _match_rows_and_compare(
                got["pred_boxes"], got["pred_scores"], got["pred_labels"],
                want_b, want_s, want_l, min_frac=0.9)

    @pytest.fixture(scope="class")
    def det_annos(self, pipeline, tmp_path_factory):
        root, fids, ours_pred, ref_pred = pipeline
        out_ref = tmp_path_factory.mktemp("ref_txt")
        out_ours = tmp_path_factory.mktemp("ours_txt")

        # reference side: its own staticmethod, with its own calib objects
        from pcdet.datasets.kitti.kitti_dataset import KittiDataset as RefKD
        from pcdet.utils import calibration_kitti

        ref_calibs = [
            calibration_kitti.Calibration(str(root / "calib" / f"{f}.txt"))
            for f in fids
        ]
        shapes = []
        from PIL import Image

        for f in fids:
            with Image.open(root / "image_2" / f"{f}.png") as im:
                shapes.append([im.height, im.width])
        batch_dict = {
            "frame_id": np.array(fids),
            "calib": ref_calibs,
            "image_shape": torch.tensor(shapes),
        }
        ref_pred_t = [
            {k: torch.as_tensor(np.asarray(v)) for k, v in p.items()}
            for p in ref_pred
        ]
        annos_ref = RefKD.generate_prediction_dicts(
            batch_dict, ref_pred_t, CLASS_NAMES, output_path=out_ref)

        # our side: our dataset's writer with our calibration
        from dfu3d_tpu.data.dataset import BatchMeta

        ds = _our_dataset(root)
        our_calibs = [ds.get_calib(f) for f in fids]
        meta = BatchMeta(frame_ids=fids, calibs=our_calibs,
                         image_shapes=[np.array(s) for s in shapes])
        annos_ours = ds.generate_prediction_dicts(
            meta, ours_pred, CLASS_NAMES, output_path=out_ours)
        return annos_ref, annos_ours, out_ref, out_ours, ds

    def test_prediction_dicts_match(self, det_annos):
        """The lidar->camera conversion + image-box projection produce the
        same KITTI annos on both sides (reference box_utils math vs ours)."""
        annos_ref, annos_ours, *_ = det_annos
        for ar, ao in zip(annos_ref, annos_ours):
            assert ar["frame_id"] == ao["frame_id"]
            n = len(ar["name"])
            assert len(ao["name"]) == n
            if n == 0:
                continue
            # NMS emission order can differ between sides; compare as
            # score-sorted sets (scores are distinct by construction)
            pr = np.argsort(-ar["score"], kind="stable")
            po = np.argsort(-ao["score"], kind="stable")
            assert list(ar["name"][pr]) == list(ao["name"][po])
            for k, tol in (("score", 1e-5), ("alpha", 1e-3),
                           ("rotation_y", 1e-3), ("location", 1e-3),
                           ("dimensions", 1e-3), ("bbox", 0.1),
                           ("boxes_lidar", 1e-3)):
                np.testing.assert_allclose(
                    np.asarray(ar[k], np.float64)[pr],
                    np.asarray(ao[k], np.float64)[po],
                    atol=tol, rtol=0, err_msg=f"{ar['frame_id']}:{k}")

    def test_written_txt_match(self, det_annos):
        """The KITTI result txt files parse to the same values (reference
        writer :405-419 vs kitti_io.write_kitti_label_file)."""
        _ar, _ao, out_ref, out_ours, _ds = det_annos
        ref_files = sorted(out_ref.glob("*.txt"))
        assert ref_files
        for rf in ref_files:
            of = out_ours / rf.name
            assert of.exists()
            a = _parse_txt(rf)
            b = _parse_txt(of)
            assert a["name"] == b["name"] or sorted(a["name"]) == sorted(
                b["name"])
            ra = np.asarray(a["vals"])
            rb = np.asarray(b["vals"])
            pa = np.argsort(-ra[:, -1], kind="stable")
            pb = np.argsort(-rb[:, -1], kind="stable")
            np.testing.assert_allclose(ra[pa], rb[pb], atol=2e-3, rtol=0,
                                       err_msg=rf.name)

    def test_official_ap_equal(self, pipeline, det_annos):
        """The headline gate: our full eval chain computes the same KITTI
        result values as the reference's own chain."""
        root, fids, _op, _rp = pipeline
        annos_ref, annos_ours, *_ , ds = det_annos

        # reference GT infos via the reference's own get_infos
        ref_ds = _RefDetachedKitti(root, "val", fids)
        ref_infos = ref_ds.get_infos(
            num_workers=1, has_label=True, count_inside_pts=False)
        gt_ref = [copy.deepcopy(i["annos"]) for i in ref_infos]

        # reference eval protocol, numba stubbed, shared rotated overlap
        from make_reference_eval_golden import load_reference_eval

        ref_eval = load_reference_eval()
        _s_ref, ap_ref = ref_eval.get_official_eval_result(
            gt_ref, copy.deepcopy(annos_ref), ["Car"])

        # ours: dataset.evaluation over our create_kitti_infos GT
        _s_ours, ap_ours = ds.evaluation(annos_ours, ["Car"])

        ap_ref = {k: float(v) for k, v in ap_ref.items()}
        ap_ours = {k: float(v) for k, v in ap_ours.items()}
        shared = sorted(set(ap_ref) & set(ap_ours))
        assert shared, (sorted(ap_ref)[:5], sorted(ap_ours)[:5])
        # the chain must produce detections that actually score (teeth check)
        assert any(v > 0 for v in ap_ref.values())
        for k in shared:
            assert abs(ap_ref[k] - ap_ours[k]) < 1e-6, (
                k, ap_ref[k], ap_ours[k])


def _our_dataset(root):
    from dfu3d_tpu.data.kitti_dataset import KittiDataset, create_kitti_infos
    from dfu3d_tpu.utils.config import CfgDict

    ds_cfg = CfgDict(dict(
        DATASET="KittiDataset",
        DATA_PATH=str(root),
        POINT_CLOUD_RANGE=PCR_M,
        DATA_SPLIT={"train": "train", "test": "val"},
        INFO_PATH={"train": ["kitti_infos_train.pkl"],
                   "test": ["kitti_infos_val.pkl"]},
        LABEL_DIR="label_2",
        GET_ITEM_LIST=["points"],
        FOV_POINTS_ONLY=False,
        POINT_FEATURE_ENCODING={
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        DATA_PROCESSOR=[
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "transform_points_to_voxels_placeholder",
             "VOXEL_SIZE": VOXEL_M},
        ],
    ))
    if not (Path(root) / "kitti_infos_val.pkl").exists():
        create_kitti_infos(ds_cfg, ["Car"], root, root, splits=("val",))
    return KittiDataset(ds_cfg, ["Car"], training=False, root_path=root)


def _parse_txt(path):
    names, vals = [], []
    for line in path.read_text().splitlines():
        f = line.split()
        if not f:
            continue
        names.append(f[0])
        vals.append([float(x) for x in f[3:]])  # skip name/trunc/occl
    return {"name": names, "vals": vals}
