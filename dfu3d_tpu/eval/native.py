"""ctypes binding for the native KITTI matcher (csrc/kitti_match.cpp).

Builds the shared library on first use (g++ -O3); falls back gracefully when
no compiler is available — kitti_eval.py then uses its pure-Python matcher.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "build" / "libkitti_match.so"
_lib = None
_tried = False


def _build():
    _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
    src = _CSRC / "kitti_match.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native matcher; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = _CSRC / "kitti_match.cpp"
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.collect_thresholds.restype = ctypes.c_int
        lib.collect_thresholds.argtypes = [
            dp, ip, dp, ip, dp, ip, ip, ip, dp, ip,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, dp,
        ]
        lib.fused_statistics.restype = None
        lib.fused_statistics.argtypes = [
            dp, ip, dp, ip, dp, ip, ip, ip, dp, ip,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            dp, ctypes.c_int, ctypes.c_int, dp,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class FlatFrames:
    """Concatenated per-frame arrays + offsets, ready for the C ABI."""

    def __init__(self, overlaps, gt_datas_list, dt_datas_list, ignored_gts,
                 ignored_dets, dontcares):
        n = len(gt_datas_list)
        gt_counts = np.array([len(g) for g in gt_datas_list], np.int64)
        dt_counts = np.array([len(d) for d in dt_datas_list], np.int64)
        dc_counts = np.array([len(d) for d in dontcares], np.int64)
        self.gt_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(gt_counts, out=self.gt_offsets[1:])
        self.dt_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(dt_counts, out=self.dt_offsets[1:])
        self.dc_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(dc_counts, out=self.dc_offsets[1:])
        self.overlap_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(gt_counts * dt_counts, out=self.overlap_offsets[1:])

        self.overlaps = (
            np.concatenate([o.reshape(-1) for o in overlaps])
            if n else np.zeros(0)
        ).astype(np.float64)
        self.gt = (
            np.concatenate([np.asarray(g, np.float64).reshape(-1, 5) for g in gt_datas_list])
            if self.gt_offsets[-1] else np.zeros((0, 5))
        ).astype(np.float64)
        self.dt = (
            np.concatenate([np.asarray(d, np.float64).reshape(-1, 6) for d in dt_datas_list])
            if self.dt_offsets[-1] else np.zeros((0, 6))
        ).astype(np.float64)
        self.ign_gt = (
            np.concatenate([np.asarray(g, np.int64) for g in ignored_gts])
            if self.gt_offsets[-1] else np.zeros(0, np.int64)
        ).astype(np.int64)
        self.ign_dt = (
            np.concatenate([np.asarray(d, np.int64) for d in ignored_dets])
            if self.dt_offsets[-1] else np.zeros(0, np.int64)
        ).astype(np.int64)
        self.dc = (
            np.concatenate([np.asarray(d, np.float64).reshape(-1, 4) for d in dontcares])
            if self.dc_offsets[-1] else np.zeros((0, 4))
        ).astype(np.float64)
        self.num_frames = n
        self.total_gt = int(self.gt_offsets[-1])

    def _args(self):
        return (
            _dp(self.overlaps), _ip(self.overlap_offsets),
            _dp(self.gt), _ip(self.gt_offsets),
            _dp(self.dt), _ip(self.dt_offsets),
            _ip(self.ign_gt), _ip(self.ign_dt),
            _dp(self.dc), _ip(self.dc_offsets),
        )

    def collect_thresholds(self, lib, metric, min_overlap):
        out = np.zeros(max(self.total_gt, 1), np.float64)
        n = lib.collect_thresholds(
            *self._args(), self.num_frames, int(metric), float(min_overlap),
            _dp(out),
        )
        return out[:n]

    def fused_statistics(self, lib, metric, min_overlap, thresholds, compute_aos):
        thresholds = np.ascontiguousarray(thresholds, np.float64)
        pr = np.zeros((max(len(thresholds), 1), 4), np.float64)
        if len(thresholds):
            lib.fused_statistics(
                *self._args(), self.num_frames, int(metric), float(min_overlap),
                _dp(thresholds), len(thresholds), int(bool(compute_aos)), _dp(pr),
            )
        return pr[: len(thresholds)]
