"""Grid-MRF energy minimization: ctypes binding to the native alpha-expansion
solver (native/graph_cut.cc), with a numpy ICM fallback.

Equivalent capability to the reference's pymaxflow path
(Space_Carving/mg_3d_to_dist.py:4-40): score volume -> height labels under a
truncated-linear label smoothness.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_FAILED = False


def _native_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    d = _native_dir()
    so = os.path.join(d, "libseason_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", d], check=True,
                           capture_output=True, timeout=240)
        except Exception:
            _LIB_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.season_aexpansion_grid.restype = ctypes.c_double
        lib.season_aexpansion_grid.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.season_grid_energy.restype = ctypes.c_double
        lib.season_grid_energy.argtypes = lib.season_aexpansion_grid.argtypes[:-1]
        _LIB = lib
    except OSError:
        _LIB_FAILED = True
    return _LIB


def truncated_linear_costs(n_labels: int, height: float = 1.0 / 3.0,
                           start: int = 0, end: int = -1) -> np.ndarray:
    """Pairwise label-cost matrix: slope*(|i-j|-start) clamped to [0, height]
    (mg_3d_to_dist.graph_cut:4-14)."""
    if end == -1:
        end = n_labels - 1
    d = np.abs(np.arange(n_labels)[:, None] - np.arange(n_labels)[None, :])
    slope = height / max(end - start, 1)
    return np.clip((d - start) * slope, 0.0, height).astype(np.float32)


def aexpansion_grid(data_cost: np.ndarray, smooth: np.ndarray,
                    init_labels: Optional[np.ndarray] = None,
                    max_cycles: int = 3) -> Tuple[np.ndarray, float]:
    """Minimize sum D[p, l_p] + sum_nbr V[l_p, l_q] on a 4-connected grid.

    data_cost: [H, W, L]; smooth: [L, L] metric.  Returns (labels, energy).
    Uses the native solver when available; falls back to ICM sweeps.
    """
    H, W, L = data_cost.shape
    data = np.ascontiguousarray(data_cost, np.float32)
    sm = np.ascontiguousarray(smooth, np.float32)
    labels = (np.argmin(data, axis=2) if init_labels is None
              else init_labels.copy()).astype(np.int32)
    lib = _load_lib()
    if lib is not None:
        lab = np.ascontiguousarray(labels)
        energy = lib.season_aexpansion_grid(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            H, W, L,
            lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_cycles)
        return lab, float(energy)
    return _icm(data, sm, labels, sweeps=5 * max_cycles)


def grid_energy(data_cost, smooth, labels) -> float:
    H, W, L = data_cost.shape
    data = np.ascontiguousarray(data_cost, np.float32)
    sm = np.ascontiguousarray(smooth, np.float32)
    lab = np.ascontiguousarray(labels, np.int32)
    lib = _load_lib()
    if lib is not None:
        return float(lib.season_grid_energy(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            H, W, L, lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))))
    return _energy_np(data, sm, lab)


def _energy_np(data, sm, lab):
    H, W, _ = data.shape
    e = data[np.arange(H)[:, None], np.arange(W)[None, :], lab].sum()
    e += sm[lab[:, :-1], lab[:, 1:]].sum()
    e += sm[lab[:-1, :], lab[1:, :]].sum()
    return float(e)


def _icm(data, sm, labels, sweeps=10):
    """Iterated conditional modes fallback (greedy local moves)."""
    H, W, L = data.shape
    lab = labels.copy()
    for _ in range(sweeps):
        changed = False
        for y in range(H):
            for x in range(W):
                cost = data[y, x].copy()
                if x > 0:
                    cost += sm[:, lab[y, x - 1]]
                if x + 1 < W:
                    cost += sm[:, lab[y, x + 1]]
                if y > 0:
                    cost += sm[:, lab[y - 1, x]]
                if y + 1 < H:
                    cost += sm[:, lab[y + 1, x]]
                best = int(np.argmin(cost))
                if best != lab[y, x]:
                    lab[y, x] = best
                    changed = True
        if not changed:
            break
    return lab, _energy_np(data, sm, lab)
