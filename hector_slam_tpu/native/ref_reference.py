"""ctypes bindings for the COMPILED ACTUAL REFERENCE (refbuild/).

Unlike ``ref_oracle``/``oracle_np`` — which are the builder's own
transcriptions of the cited formulas — this module drives the reference's
header-only template library itself (slam_main/HectorSlamProcessor.h:54,
matcher/ScanMatcher.h:54, map/OccGridMapUtil.h:287), compiled unmodified
from /root/reference against real Eigen. It exists to break the round-1
circularity: the transcriptions are validated against THIS binary in
tests/test_reference_binary.py, so "bit-exact vs oracle" claims bottom
out in the actual reference, not in the builder's reading of it.

Availability is environment-dependent (needs the reference checkout and
an Eigen); ``available()`` gates the tests.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refbuild")
_SO = os.path.join(_DIR, "ref_reference.so")
_REF_INCLUDE = os.environ.get(
    "HECTOR_REF_INCLUDE",
    "/root/reference/hector_mapping/include/hector_slam_lib")
_lib = None


def available() -> bool:
    """True when the reference checkout + an Eigen are present."""
    if not os.path.isdir(_REF_INCLUDE):
        return False
    if os.environ.get("EIGEN_INCLUDE"):
        return True
    for pat in ("/opt/venv/lib/python*/site-packages/tensorflow/include",
                "/usr/include/eigen3"):
        for d in glob.glob(pat):
            if os.path.isdir(os.path.join(d, "Eigen")):
                return True
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "ref_harness.cpp")
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ref_create.restype = ctypes.c_void_p
    lib.ref_create.argtypes = [ctypes.c_float, ctypes.c_int, ctypes.c_int,
                               ctypes.c_float, ctypes.c_float, ctypes.c_int,
                               ctypes.c_float, ctypes.c_float,
                               ctypes.c_float, ctypes.c_float]
    lib.ref_destroy.argtypes = [ctypes.c_void_p]
    lib.ref_reset.argtypes = [ctypes.c_void_p]
    lib.ref_update.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p,
                               f32p, ctypes.c_int, f32p, f32p]
    lib.ref_map_levels.argtypes = [ctypes.c_void_p]
    lib.ref_map_levels.restype = ctypes.c_int
    lib.ref_map_dims.argtypes = [ctypes.c_void_p,
                                 ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.ref_get_map.argtypes = [ctypes.c_void_p, ctypes.c_int, f32p]
    lib.ref_scale_to_map.argtypes = [ctypes.c_void_p]
    lib.ref_scale_to_map.restype = ctypes.c_float
    lib.ref_interp.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                               ctypes.c_int, f32p]
    lib.ref_hessian.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                                f32p, ctypes.c_int, f32p, f32p]
    _lib = lib
    return lib


def ref_interp(log_odds: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """The reference's interpMapValueWithDerivatives per coord (identity
    transform). Returns [n, 3] of (M, dM/dx, dM/dy)."""
    lib = _load()
    lo = np.ascontiguousarray(log_odds, np.float32)
    c = np.ascontiguousarray(coords, np.float32)
    out = np.empty((len(c), 3), np.float32)
    lib.ref_interp(_fp(lo), lo.shape[1], lo.shape[0], _fp(c), len(c),
                   _fp(out))
    return out


def ref_hessian(log_odds: np.ndarray, pose_map: np.ndarray,
                pts: np.ndarray):
    """The reference's getCompleteHessianDerivs. Returns (H [3,3], dTr [3])."""
    lib = _load()
    lo = np.ascontiguousarray(log_odds, np.float32)
    p = np.ascontiguousarray(pose_map, np.float32)
    q = np.ascontiguousarray(pts, np.float32)
    H = np.empty(9, np.float32)
    d = np.empty(3, np.float32)
    lib.ref_hessian(_fp(lo), lo.shape[1], lo.shape[0], _fp(p), _fp(q),
                    len(q), _fp(H), _fp(d))
    return H.reshape(3, 3), d


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class ReferenceSlam:
    """The actual compiled HectorSlamProcessor, scan by scan."""

    def __init__(self, resolution: float, size_x: int, size_y: int,
                 levels: int, start_coords=(0.5, 0.5),
                 free_factor: float = 0.4, occupied_factor: float = 0.9,
                 dist_thresh: float = 0.4, angle_thresh: float = 0.9):
        self._lib = _load()
        self._h = self._lib.ref_create(
            ctypes.c_float(resolution), size_x, size_y,
            ctypes.c_float(start_coords[0]), ctypes.c_float(start_coords[1]),
            levels, ctypes.c_float(free_factor),
            ctypes.c_float(occupied_factor), ctypes.c_float(dist_thresh),
            ctypes.c_float(angle_thresh))
        self.pose = np.zeros(3, np.float32)
        self.covariance = np.zeros((3, 3), np.float32)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ref_destroy(self._h)
            self._h = None

    def reset(self) -> None:
        self._lib.ref_reset(self._h)
        self.pose = np.zeros(3, np.float32)

    def update(self, points: np.ndarray, origo=(0.0, 0.0),
               pose_hint: Optional[np.ndarray] = None,
               map_without_matching: bool = False) -> np.ndarray:
        """One HectorSlamProcessor::update. ``points`` f32[n,2] real beams
        only (no padding — the reference has no mask concept), map-scale
        units of the finest level. Hint defaults to the last scan-match
        pose (the node's default start estimate)."""
        pts = np.ascontiguousarray(points, np.float32)
        org = np.ascontiguousarray(origo, np.float32)
        hint = np.ascontiguousarray(
            self.pose if pose_hint is None else pose_hint, np.float32)
        out_pose = np.empty(3, np.float32)
        out_cov = np.empty(9, np.float32)
        self._lib.ref_update(self._h, _fp(pts), len(pts), _fp(org),
                             _fp(hint), 1 if map_without_matching else 0,
                             _fp(out_pose), _fp(out_cov))
        self.pose = out_pose
        self.covariance = out_cov.reshape(3, 3)
        return out_pose

    def run(self, points_list, origo=(0.0, 0.0),
            map_without_matching: bool = False,
            poses_hint=None) -> np.ndarray:
        """Whole-log replay; returns poses f32[T,3]."""
        poses = []
        for t, pts in enumerate(points_list):
            hint = None if poses_hint is None else poses_hint[t]
            poses.append(self.update(pts, origo, hint,
                                     map_without_matching).copy())
        return np.stack(poses)

    def map_levels(self) -> int:
        return self._lib.ref_map_levels(self._h)

    def get_map(self, level: int = 0) -> np.ndarray:
        sx = ctypes.c_int()
        sy = ctypes.c_int()
        self._lib.ref_map_dims(self._h, level, ctypes.byref(sx),
                               ctypes.byref(sy))
        out = np.empty((sy.value, sx.value), np.float32)
        self._lib.ref_get_map(self._h, level, _fp(out))
        return out
