"""ctypes bindings for the native host library (native/gvf_host.cpp).

Auto-builds with g++ on first import if the .so is missing; every function
has a numpy fallback so the package works without a toolchain. Parity with
the jnp implementations is tested in tests/test_native.py (the same
native-vs-framework exact-equality strategy as the reference's vox2seq test,
model/sparse_voxel_diffusion/vox2seq/test.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "gvf_host.cpp")
# lives in a non-package subdir so pkgutil doesn't mistake the .so for an
# importable extension module
_SO = os.path.join(_HERE, "_lib", "libgvf_host.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.z_order_encode.argtypes = [i32p, ctypes.c_int32, i32p]
    lib.z_order_decode.argtypes = [i32p, ctypes.c_int32, i32p]
    lib.hilbert_encode.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.hilbert_decode.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.voxel_downsample.argtypes = [
        i32p, f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, f32p,
    ]
    lib.voxel_downsample.restype = ctypes.c_int32
    lib.fps.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p]
    _lib = lib
    return _lib


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def z_order_encode(coords: np.ndarray) -> np.ndarray:
    """[N, 3] int coords -> [N] Morton codes (native, numpy fallback)."""
    coords = _i32(coords)
    n = len(coords)
    lib = get_lib()
    out = np.empty(n, np.int32)
    if lib is not None:
        lib.z_order_encode(_ptr(coords, ctypes.c_int32), n, _ptr(out, ctypes.c_int32))
        return out
    from ..ops import curves  # fallback through jnp

    return np.asarray(curves.z_order_encode(coords[:, 0], coords[:, 1], coords[:, 2]))


def hilbert_encode(coords: np.ndarray, bits: int = 10) -> np.ndarray:
    coords = _i32(coords)
    n = len(coords)
    lib = get_lib()
    out = np.empty(n, np.int32)
    if lib is not None:
        lib.hilbert_encode(_ptr(coords, ctypes.c_int32), n, bits, _ptr(out, ctypes.c_int32))
        return out
    from ..ops import curves

    return np.asarray(
        curves.hilbert_encode(coords[:, 0], coords[:, 1], coords[:, 2], bits=bits)
    )


def hilbert_decode(codes: np.ndarray, bits: int = 10) -> np.ndarray:
    codes = _i32(codes)
    n = len(codes)
    lib = get_lib()
    out = np.empty((n, 3), np.int32)
    if lib is not None:
        lib.hilbert_decode(_ptr(codes, ctypes.c_int32), n, bits, _ptr(out, ctypes.c_int32))
        return out
    from ..ops import curves

    x, y, z = curves.hilbert_decode(codes, bits=bits)
    return np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], -1)


def voxel_downsample(
    coords: np.ndarray, feats: np.ndarray, factor: int, resolution: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host mean-pool dedup -> (parent_coords [M,3], parent_feats [M,C])."""
    coords = _i32(coords)
    feats = np.ascontiguousarray(feats, np.float32)
    n, c = feats.shape
    lib = get_lib()
    if lib is not None:
        oc = np.empty((n, 3), np.int32)
        of = np.empty((n, c), np.float32)
        m = lib.voxel_downsample(
            _ptr(coords, ctypes.c_int32), _ptr(feats, ctypes.c_float), n, c,
            factor, resolution, _ptr(oc, ctypes.c_int32), _ptr(of, ctypes.c_float),
        )
        return oc[:m].copy(), of[:m].copy()
    # numpy fallback
    pres = resolution // factor
    p = coords // factor
    key = p[:, 0] * pres * pres + p[:, 1] * pres + p[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    pooled = np.zeros((len(uniq), c), np.float32)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(pooled, inv, feats)
    np.add.at(cnt, inv, 1)
    pooled /= cnt[:, None]
    oc = np.stack(
        [uniq // (pres * pres), (uniq // pres) % pres, uniq % pres], -1
    ).astype(np.int32)
    return oc, pooled


def fps(points: np.ndarray, k: int, start: int = 0) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    lib = get_lib()
    if lib is not None:
        out = np.empty(k, np.int32)
        lib.fps(_ptr(points, ctypes.c_float), n, k, start, _ptr(out, ctypes.c_int32))
        return out
    idxs = [start]
    min_d2 = np.full(n, np.inf, np.float32)
    for _ in range(k - 1):
        d2 = np.sum((points - points[idxs[-1]]) ** 2, -1)
        min_d2 = np.minimum(min_d2, d2)
        idxs.append(int(np.argmax(min_d2)))
    return np.asarray(idxs, np.int32)
