"""Voxel-grid subsampling: ctypes bridge to the native C++ kernel, with a
pure-numpy fallback.

API-compatible with the reference wrapper (/root/reference/datasets/
s3dis_closer.py:13-31 over cpp_wrappers/cpp_subsampling): barycenter points,
mean features, majority-vote labels per ``sampleDl`` voxel.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))),
    "native", "grid_subsampling", "grid_subsampling.cpp")


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    so_path = _SRC.replace("grid_subsampling.cpp", "libgridsubsample.so")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", so_path],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _LIB = False
            return False
    lib = ctypes.CDLL(so_path)
    lib.voxelize.restype = ctypes.c_int32
    lib.voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32)]
    lib.reduce_cells.restype = None
    lib.reduce_cells.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _native_subsample(points, features, labels, sample_dl, n_label_classes):
    lib = _load_native()
    n = points.shape[0]
    cell_ids = np.empty(n, np.int32)
    n_cells = lib.voxelize(_fptr(points), n, ctypes.c_float(sample_dl),
                           _iptr(cell_ids))
    f_dim = 0 if features is None else features.shape[1]
    out_points = np.empty((n_cells, 3), np.float32)
    out_features = (np.empty((n_cells, f_dim), np.float32)
                    if f_dim else np.empty((0, 0), np.float32))
    out_labels = (np.empty(n_cells, np.int32) if labels is not None
                  else np.empty(0, np.int32))
    lib.reduce_cells(
        _fptr(points),
        _fptr(features) if features is not None else None,
        _iptr(labels) if labels is not None else None,
        _iptr(cell_ids), n, f_dim,
        n_label_classes if labels is not None else 0,
        n_cells, _fptr(out_points), _fptr(out_features),
        _iptr(out_labels))
    return out_points, (out_features if f_dim else None), \
        (out_labels if labels is not None else None)


def _numpy_subsample(points, features, labels, sample_dl, n_label_classes):
    minv = points.min(0)
    vox = np.floor((points - minv) / sample_dl).astype(np.int64)
    key = (vox[:, 0] & 0x1FFFFF) | ((vox[:, 1] & 0x1FFFFF) << 21) | \
        ((vox[:, 2] & 0x1FFFFF) << 42)
    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    n_cells = uniq.shape[0]
    out_points = np.zeros((n_cells, 3), np.float64)
    np.add.at(out_points, inv, points)
    out_points = (out_points / counts[:, None]).astype(np.float32)
    out_features = None
    if features is not None:
        out_features = np.zeros((n_cells, features.shape[1]), np.float64)
        np.add.at(out_features, inv, features)
        out_features = (out_features / counts[:, None]).astype(np.float32)
    out_labels = None
    if labels is not None:
        votes = np.zeros((n_cells, n_label_classes), np.int64)
        np.add.at(votes, (inv, labels.reshape(-1)), 1)
        out_labels = votes.argmax(1).astype(np.int32)
    return out_points, out_features, out_labels


def grid_subsampling(points, features=None, labels=None, sampleDl=0.1,
                     n_label_classes=13, use_native=True):
    """Subsample to one (barycenter, mean-feature, majority-label) tuple per
    occupied voxel.  Returns only the arrays that were provided, like the
    reference wrapper."""
    points = np.ascontiguousarray(points, np.float32)
    if features is not None:
        features = np.ascontiguousarray(features, np.float32)
    if labels is not None:
        labels = np.ascontiguousarray(labels, np.int32).reshape(-1)
        n_label_classes = max(n_label_classes, int(labels.max()) + 1)

    impl = _native_subsample if (use_native and _load_native()) \
        else _numpy_subsample
    out_points, out_features, out_labels = impl(
        points, features, labels, float(sampleDl), n_label_classes)

    result = [out_points]
    if features is not None:
        result.append(out_features)
    if labels is not None:
        result.append(out_labels)
    return result[0] if len(result) == 1 else tuple(result)
