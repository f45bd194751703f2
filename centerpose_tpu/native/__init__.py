"""Native (C++) host-side kernels: soft-NMS + GT-encoder core.

TPU-native counterpart of the reference's native layer (SURVEY.md §2 #16/#17:
the DCNv2 CUDA extension lives on-device as ops/dcn.py + ops/dcn_pallas.py;
the Cython soft-NMS and the Python GT-encode loop live here as C++).

The shared library is built on demand with g++ (no pybind11 in this image —
plain C ABI via ctypes).  Every entry point has a pure-numpy fallback, so the
package works without a toolchain; `available()` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcenterpose_native.so")
_SOURCES = ["soft_nms.cpp", "encoder.cpp"]

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH,
    ] + [os.path.join(_DIR, s) for s in _SOURCES]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        newest_src = max(
            os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES
        )
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest_src:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.soft_nms_39.restype = ctypes.c_int
        lib.soft_nms_39.argtypes = [
            f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, i32p,
        ]
        lib.encode_targets.restype = ctypes.c_int
        lib.encode_targets.argtypes = [
            f32p, f32p, i32p,                       # bboxes, joints, vis
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, f32p, f32p,           # hm, hm_hp, wh, hps, reg
            i32p, f32p, f32p, f32p, i32p, f32p,     # ind..hp_mask
        ]
        _lib = lib
    return _lib


def available() -> bool:
    # CENTERPOSE_DISABLE_NATIVE=1 forces the pure-Python fallbacks — used by
    # tools/bench_input_pipeline.py to A/B the C++ encoder against the
    # Python behavioral reference (works across process-pool workers since
    # the env propagates to forked children).
    if os.environ.get("CENTERPOSE_DISABLE_NATIVE"):
        return False
    return _load() is not None


def soft_nms_39_native(
    dets: np.ndarray,
    sigma: float = 0.5,
    nt: float = 0.5,
    thresh: float = 0.001,
    method: int = 2,
):
    """Native soft-NMS; returns surviving rows in pick order, or None if the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, dtype=np.float32).copy()
    n = dets.shape[0]
    keep = np.zeros((max(n, 1),), np.int32)
    n_keep = lib.soft_nms_39(dets, n, sigma, nt, thresh, method, keep)
    return dets[keep[:n_keep]]


def encode_targets_native(
    bboxes: np.ndarray,
    joints: np.ndarray,
    vis: np.ndarray,
    out_res: int,
    rot_nonzero: bool,
    out: dict,
) -> bool:
    """Fill the target dict's arrays in place via the C++ core.

    `out` must hold C-contiguous float32/int32 arrays with encode.py's
    shapes: hm [R,R,1], hm_hp [R,R,J], wh/reg [K,2], hps/hps_mask [K,2J],
    ind/reg_mask [K], hp_offset [K*J,2], hp_ind/hp_mask [K*J].
    Returns False when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return False
    num_objs, num_joints = vis.shape
    lib.encode_targets(
        np.ascontiguousarray(bboxes, np.float32),
        np.ascontiguousarray(joints, np.float32),
        np.ascontiguousarray(vis, np.int32),
        num_objs, num_joints, out_res, int(rot_nonzero),
        out["hm"].reshape(-1), out["hm_hp"].reshape(-1),
        out["wh"].reshape(-1), out["hps"].reshape(-1), out["reg"].reshape(-1),
        out["ind"], out["reg_mask"], out["hps_mask"].reshape(-1),
        out["hp_offset"].reshape(-1), out["hp_ind"], out["hp_mask"],
    )
    return True
