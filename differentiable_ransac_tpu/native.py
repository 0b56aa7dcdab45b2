"""ctypes bindings for the native σ-consensus module (csrc/).

The counterpart of the reference's pymagsac boundary: the TPU engine does
the batched hypothesis search; this C++ library does the sequential final
polish — σ-marginalized IRLS (MAGSAC-style) and Levenberg–Marquardt E
refinement (the ``optimizeEssentialMatrix`` analogue, reference call site
``ransac.py:157-165``).

Builds on demand with ``make -C csrc`` (g++, no external deps). All entry
points gracefully return the input model if the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libsigma_consensus.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.sigma_consensus_polish.restype = ctypes.c_double
    lib.sigma_consensus_polish.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.sigma_consensus_polish_rigid.restype = ctypes.c_double
    lib.sigma_consensus_polish_rigid.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
    ]
    lib.lm_refine_essential.restype = ctypes.c_double
    lib.lm_refine_essential.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def sigma_consensus_polish(
    matches: np.ndarray,
    model: np.ndarray,
    sigma_max: float,
    essential: bool = True,
    iterations: int = 10,
) -> Tuple[np.ndarray, float]:
    """σ-consensus IRLS polish of an E/F model.

    Args:
        matches: (N, 4) float correspondences (E: calibrated, F: pixels).
        model: (3, 3) initial model (x2ᵀ M x1 = 0 convention).
        sigma_max: maximum inlier noise scale.

    Returns:
        (polished (3, 3), quality): unchanged input + quality -1 if the
        native library is unavailable.
    """
    lib = _load()
    m = np.ascontiguousarray(np.asarray(model, np.float64)).copy()
    if lib is None:
        return m, -1.0
    pts = np.ascontiguousarray(np.asarray(matches, np.float64))
    q = lib.sigma_consensus_polish(
        _dptr(pts), pts.shape[0], _dptr(m), float(sigma_max),
        1 if essential else 0, int(iterations),
    )
    return m, float(q)


def sigma_consensus_polish_rigid(
    points: np.ndarray, model: np.ndarray, sigma_max: float, iterations: int = 10
) -> Tuple[np.ndarray, float]:
    """σ-consensus polish of a rigid (4, 4) transform on (N, 6) points."""
    lib = _load()
    m = np.ascontiguousarray(np.asarray(model, np.float64)).copy()
    if lib is None:
        return m, -1.0
    pts = np.ascontiguousarray(np.asarray(points, np.float64))
    q = lib.sigma_consensus_polish_rigid(
        _dptr(pts), pts.shape[0], _dptr(m), float(sigma_max), int(iterations)
    )
    return m, float(q)


def optimize_essential(
    matches: np.ndarray,
    inlier_indices: np.ndarray,
    model: np.ndarray,
    max_iters: int = 100,
) -> Tuple[np.ndarray, float]:
    """LM refinement of E over (R, t) on the given inliers — the
    ``pymagsac.optimizeEssentialMatrix`` counterpart."""
    lib = _load()
    m = np.ascontiguousarray(np.asarray(model, np.float64)).copy()
    if lib is None:
        return m, -1.0
    pts = np.ascontiguousarray(np.asarray(matches, np.float64))
    idx = np.ascontiguousarray(np.asarray(inlier_indices, np.int64))
    cost = lib.lm_refine_essential(
        _dptr(pts), pts.shape[0],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), idx.shape[0],
        _dptr(m), int(max_iters),
    )
    return m, float(cost)
