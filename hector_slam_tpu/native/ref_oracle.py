"""ctypes bindings for the native reference oracle (ref_engine.cpp).

Auto-builds the shared library on first use (plain g++, no deps). The
native oracle reproduces the reference's serial f32 semantics exactly and
runs full scan logs ~1000x faster than the Python transcription, so the
trajectory-level golden tests use it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libref_engine.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "ref_engine.cpp")
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.hs_ref_interp.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                                  ctypes.c_int, f32p]
    lib.hs_ref_hessian.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                                   f32p, ctypes.c_int, f32p, f32p]
    lib.hs_ref_run.argtypes = [
        f32p, u8p, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, f32p, ctypes.c_int,
        f32p, f32p, u8p, f32p]
    _lib = lib
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def ref_interp(log_odds: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """(M, dx, dy) per coord from the native oracle (identity transform)."""
    lib = _load()
    lo = np.ascontiguousarray(log_odds, np.float32)
    c = np.ascontiguousarray(coords, np.float32)
    out = np.empty((len(c), 3), np.float32)
    lib.hs_ref_interp(_fp(lo), lo.shape[1], lo.shape[0], _fp(c), len(c),
                      _fp(out))
    return out


def ref_hessian(log_odds: np.ndarray, pose_map: np.ndarray,
                pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    lo = np.ascontiguousarray(log_odds, np.float32)
    p = np.ascontiguousarray(pose_map, np.float32)
    q = np.ascontiguousarray(pts, np.float32)
    H = np.empty(9, np.float32)
    d = np.empty(3, np.float32)
    lib.hs_ref_hessian(_fp(lo), lo.shape[1], lo.shape[0], _fp(p), _fp(q),
                       len(q), _fp(H), _fp(d))
    return H.reshape(3, 3), d


def ref_run(
    points: np.ndarray,          # f32[T, N, 2] map-scale (finest)
    mask: np.ndarray,            # bool[T, N]
    origo: np.ndarray,           # f32[2]
    resolution: float, size_x: int, size_y: int, levels: int,
    start_coords=(0.5, 0.5),
    free_factor: float = 0.4, occupied_factor: float = 0.9,
    dist_thresh: float = 0.4, angle_thresh: float = 0.9,
    pose_hints: Optional[np.ndarray] = None,
    known_poses: bool = False,
    want_map: bool = True,
):
    """Runs the full sequential reference SLAM loop. Returns
    (poses f32[T,3], hessians f32[T,3,3], updated bool[T],
    log_odds_l0 f32[size_y, size_x] | None)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    msk = np.ascontiguousarray(mask, np.uint8)
    org = np.ascontiguousarray(origo, np.float32)
    T, N = pts.shape[:2]
    out_poses = np.empty((T, 3), np.float32)
    out_H = np.empty((T, 9), np.float32)
    out_upd = np.empty(T, np.uint8)
    out_map = (np.empty((size_y, size_x), np.float32) if want_map else None)
    hints_p = None
    if pose_hints is not None:
        hints = np.ascontiguousarray(pose_hints, np.float32)
        hints_p = _fp(hints)
    lib.hs_ref_run(
        _fp(pts), _u8(msk), _fp(org), T, N,
        ctypes.c_float(resolution), size_x, size_y, levels,
        ctypes.c_float(start_coords[0]), ctypes.c_float(start_coords[1]),
        ctypes.c_float(free_factor), ctypes.c_float(occupied_factor),
        ctypes.c_float(dist_thresh), ctypes.c_float(angle_thresh),
        hints_p, 1 if known_poses else 0,
        _fp(out_poses), _fp(out_H), _u8(out_upd),
        _fp(out_map) if want_map else ctypes.cast(None,
                                                  ctypes.POINTER(ctypes.c_float)))
    return (out_poses, out_H.reshape(T, 3, 3), out_upd.astype(bool),
            out_map)
