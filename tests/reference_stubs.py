"""Import the reference's real torch modules from /root/reference with the
CUDA/extension dependency surface stubbed out.

The reference tree (OpenPCDet fork) imports CUDA extension modules, spconv,
torch_scatter, torchvision and SharedArray at package-import time; none of
these exist (or matter) on this CPU-only container. Everything this harness
stubs is *never executed* by the pure-torch modules under test
(BaseBEVBackbone base_bev_backbone.py:6, CenterHead center_head.py:49,
DynamicPillarVFE dynamic_pillar_vfe.py:49, PointPillarScatter
pointpillar_scatter.py:5) — except torch_scatter, whose two entry points get
faithful pure-torch implementations below so the reference's own VFE code
runs unmodified.

This is the strongest AP-parity evidence available in this container (no
datasets, no GPU): the reference's actual code, random-initialised, converted
through train/torch_convert, must produce bit-close logits to ours.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"

_CUDA_EXTS = [
    "pcdet.ops.iou3d_nms.iou3d_nms_cuda",
    "pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda",
    "pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda",
    "pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda",
    "pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda",
    "pcdet.ops.bev_pool.bev_pool_ext",
    "pcdet.ops.ingroup_inds.ingroup_inds_cuda",
]


class _Dummy:
    """Inert placeholder for classes that are referenced but never run."""

    def __init__(self, *a, **k):
        pass


def _permissive_getattr(name):
    if name.startswith("__"):
        raise AttributeError(name)
    return _Dummy


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _make_torch_scatter(torch):
    """Pure-torch scatter_mean/scatter_max with torch_scatter's semantics
    (dim=0 only — all the reference's dynamic VFEs use dim=0)."""
    ts = types.ModuleType("torch_scatter")

    def scatter_mean(src, index, dim=0, dim_size=None):
        assert dim == 0
        n = int(index.max()) + 1 if dim_size is None else dim_size
        tail = (1,) * (src.dim() - 1)
        out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
        cnt = torch.zeros((n,) + tail, dtype=src.dtype)
        out.index_add_(0, index, src)
        cnt.index_add_(0, index, torch.ones((src.shape[0],) + tail, dtype=src.dtype))
        return out / cnt.clamp(min=1)

    def scatter_max(src, index, dim=0, dim_size=None):
        assert dim == 0
        n = int(index.max()) + 1 if dim_size is None else dim_size
        out = torch.full((n,) + src.shape[1:], float("-inf"), dtype=src.dtype)
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        out.scatter_reduce_(0, idx, src, reduce="amax", include_self=True)
        return out, None

    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max
    return ts


def install_reference_stubs():
    """Idempotently set up sys.path + stubs so `pcdet.*` imports work."""
    import torch  # real torch must be imported before permissive stubs

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "SharedArray" not in sys.modules:
        _stub("SharedArray")
    for ext in _CUDA_EXTS:
        if ext not in sys.modules:
            _stub(ext)
    if "spconv" not in sys.modules:
        sp = _stub("spconv", __version__="2.1.0")
        spp = _stub("spconv.pytorch")
        spp.__getattr__ = _permissive_getattr
        spp.conv = _stub("spconv.pytorch.conv", SparseConvolution=_Dummy)
        spp.utils = _stub("spconv.pytorch.utils")
        spp.utils.__getattr__ = _permissive_getattr
        sp.pytorch = spp
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv.__getattr__ = _permissive_getattr
        for sub in ("torchvision.models", "torchvision.ops",
                    "torchvision.transforms"):
            sm = _stub(sub)
            sm.__getattr__ = _permissive_getattr
            setattr(tv, sub.split(".")[-1], sm)
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _make_torch_scatter(torch)
    if "numba" not in sys.modules:
        def _jit(*a, **k):
            # handles both @jit and @jit(...) forms; the decorated numba
            # kernels are never invoked by the modules under test
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]
            return lambda fn: fn

        nb = _stub("numba", jit=_jit, njit=_jit, prange=range)
        nb.cuda = _stub("numba.cuda", jit=_jit)
        nb.__getattr__ = _permissive_getattr
    if "easydict" not in sys.modules:
        _stub("easydict", EasyDict=EDict)
    # the reference was written against numpy<1.24 (np.int/np.float/np.bool
    # scalar aliases); restore them so its code runs unmodified
    import numpy as np

    for alias, builtin in (("int", int), ("float", float), ("bool", bool),
                           ("object", object)):
        if not hasattr(np, alias):  # don't clobber numpy 2.x's np.bool
            setattr(np, alias, builtin)
    # misc leaf deps referenced (not executed) by CaDDN / visualization paths
    for leaf in ("skimage", "skimage.transform", "kornia", "kornia.geometry",
                 "kornia.utils", "av2", "cv2", "open3d", "mayavi",
                 "nuscenes", "numba.typed", "pyquaternion", "sklearn",
                 "sklearn.cluster", "sklearn.linear_model", "fire",
                 "tensorflow", "lyft_dataset_sdk", "pandas", "pandaset"):
        if leaf not in sys.modules:
            m = _stub(leaf)
            m.__getattr__ = _permissive_getattr
            parent, _, child = leaf.rpartition(".")
            if parent and parent in sys.modules:
                setattr(sys.modules[parent], child, m)
    # matplotlib probes sys.modules["tensorflow"].is_tensor on EVERY axis
    # conversion — the permissive stub's truthy answer sends it into a
    # conversion loop (RecursionError in 3D renders). Answer honestly.
    sys.modules["tensorflow"].is_tensor = lambda x: False


class EDict(dict):
    """Minimal easydict substitute (attribute access; easydict isn't
    installed here and only the reference's config layer needs it)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in {**(d or {}), **kw}.items():
            self[k] = edictify(v) if isinstance(v, (dict, list, tuple)) else v

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError:
            raise AttributeError(k)
        return v

    def __setattr__(self, k, v):
        self[k] = v


def edictify(obj):
    if isinstance(obj, dict):
        return EDict({k: edictify(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(edictify(v) for v in obj)
    return obj


class no_cuda:
    """Context manager: make .cuda() a no-op (the reference modules call it
    unconditionally in __init__, e.g. dynamic_pillar_vfe.py:84-86)."""

    def __enter__(self):
        import torch

        self._orig = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self_, *a, **k: self_
        return self

    def __exit__(self, *exc):
        import torch

        torch.Tensor.cuda = self._orig
        return False
