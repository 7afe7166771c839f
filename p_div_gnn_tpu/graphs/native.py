"""ctypes bindings for the native host graph builder (csrc/graphcore.cpp).

The shared library is built on first use with the system g++ (the image
ships no pybind11; ctypes over a C ABI keeps the binding dependency-free).
All entry points fall back to the numpy implementations in
graphs/build.py / periodic.py / labels.py — which stay the behavioral
reference — when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "graphcore.cpp"
_SO = Path(__file__).resolve().parent / "_graphcore.so"


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PDG_NO_NATIVE"):
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.pdg_faces_to_edges.restype = ctypes.c_int64
        lib.pdg_faces_to_edges.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p, i64p
        ]
        lib.pdg_label_nodes.restype = ctypes.c_int64
        lib.pdg_label_nodes.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64p, i64p
        ]
        lib.pdg_periodic_pairs.restype = ctypes.c_int64
        lib.pdg_periodic_pairs.argtypes = [
            f64p, ctypes.c_int64, i64p, i64p
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def faces_to_edge_index(faces: np.ndarray, num_nodes: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int64)
    n_faces, arity = faces.shape
    cap = 2 * arity * n_faces
    snd = np.empty(cap, np.int64)
    rcv = np.empty(cap, np.int64)
    m = lib.pdg_faces_to_edges(faces, n_faces, arity, num_nodes, snd, rcv)
    return np.stack([snd[:m], rcv[:m]])


def compute_node_labels(
    faces: np.ndarray, points2d: np.ndarray
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int64)
    pts = np.ascontiguousarray(points2d, np.float64)
    n = len(pts)
    labels = np.empty(n, np.int64)
    n_regions = lib.pdg_label_nodes(
        faces, faces.shape[0], faces.shape[1], n, pts, labels
    )
    assert (
        n_regions == 2
    ), f"Expected 2 regions, found {n_regions} for the given mesh"
    return labels


def periodic_pairs(points2d: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points2d, np.float64)
    n = len(pts)
    cap = 4 * n + 8
    snd = np.empty(cap, np.int64)
    rcv = np.empty(cap, np.int64)
    k = lib.pdg_periodic_pairs(pts, n, snd, rcv)
    assert k >= 0, "non-periodic mesh or missing corners"
    return snd[:k], rcv[:k]
