"""ctypes bridge to the native C++ runtime components.

Builds ``tpt/native/tptnative.cpp`` into a shared library on first use
(g++ -O2, cached next to the source) and exposes:

  * :func:`pack_std140_native` / :func:`unpack_std140_native`
  * :func:`pcg_floats_native` — bit-exact PCG chain (test oracle)
  * :func:`write_png_native` — zlib PNG encoder with the GL vertical flip

Every entry point has a pure-Python fallback (tpt.scene / tpt.rng /
tpt.utils.image), so the framework works without a compiler; the native
path is preferred when available (``NATIVE_AVAILABLE``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .config import MAX_SPHERES, MAX_CUBOIDS
from .scene import SPHERE_STRIDE_FLOATS, CUBOID_STRIDE_FLOATS, STD140_TOTAL_FLOATS

_SRC = os.path.join(os.path.dirname(__file__), "native", "tptnative.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "native", "libtptnative.so")
_lock = threading.Lock()
_lib = None
_build_error = None


def _build() -> None:
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-o", _LIB, _SRC, "-lz"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_ubyte)
            lib.tpt_pack_std140.restype = ctypes.c_int
            lib.tpt_pack_std140.argtypes = [f32p, f32p, ctypes.c_int,
                                            f32p, f32p, f32p, ctypes.c_int, f32p]
            lib.tpt_unpack_std140.restype = ctypes.c_int
            lib.tpt_unpack_std140.argtypes = [f32p] + [f32p] * 5
            lib.tpt_pcg_floats.restype = None
            lib.tpt_pcg_floats.argtypes = [ctypes.c_uint32, ctypes.c_int, f32p]
            lib.tpt_write_png.restype = ctypes.c_int
            lib.tpt_write_png.argtypes = [ctypes.c_char_p, u8p,
                                          ctypes.c_int, ctypes.c_int]
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            _build_error = e
        return _lib


def native_available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pack_std140_native(scene) -> np.ndarray:
    lib = _load()
    if lib is None:
        from .scene import pack_std140
        return pack_std140(scene)
    spheres = np.ascontiguousarray(scene.sphere_pos_radius, np.float32)
    smats = np.ascontiguousarray(scene.sphere_material, np.float32)
    cmin = np.ascontiguousarray(scene.cuboid_min, np.float32)
    cmax = np.ascontiguousarray(scene.cuboid_max, np.float32)
    cmats = np.ascontiguousarray(scene.cuboid_material, np.float32)
    out = np.zeros(STD140_TOTAL_FLOATS, np.float32)
    rc = lib.tpt_pack_std140(_f32p(spheres), _f32p(smats), MAX_SPHERES,
                             _f32p(cmin), _f32p(cmax), _f32p(cmats),
                             MAX_CUBOIDS, _f32p(out))
    if rc != 0:
        raise RuntimeError(f"tpt_pack_std140 failed: {rc}")
    return out


def unpack_std140_native(buf: np.ndarray):
    """Returns (spheres [256,4], smats [256,16], cmin, cmax, cmats) arrays."""
    lib = _load()
    buf = np.ascontiguousarray(buf, np.float32)
    if buf.size != STD140_TOTAL_FLOATS:
        raise ValueError(f"expected {STD140_TOTAL_FLOATS} floats")
    spheres = np.zeros((MAX_SPHERES, 4), np.float32)
    smats = np.zeros((MAX_SPHERES, 16), np.float32)
    cmin = np.zeros((MAX_CUBOIDS, 3), np.float32)
    cmax = np.zeros((MAX_CUBOIDS, 3), np.float32)
    cmats = np.zeros((MAX_CUBOIDS, 16), np.float32)
    if lib is None:
        from .scene import unpack_std140
        s = unpack_std140(buf, MAX_SPHERES, MAX_CUBOIDS)
        return (np.asarray(s.sphere_pos_radius), np.asarray(s.sphere_material),
                np.asarray(s.cuboid_min), np.asarray(s.cuboid_max),
                np.asarray(s.cuboid_material))
    lib.tpt_unpack_std140(_f32p(buf), _f32p(spheres), _f32p(smats),
                          _f32p(cmin), _f32p(cmax), _f32p(cmats))
    return spheres, smats, cmin, cmax, cmats


def pcg_floats_native(seed: int, n: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from . import rng
        import jax.numpy as jnp
        vals, _ = rng.random_floats(jnp.uint32(seed), n)
        return np.asarray(vals, np.float32)
    out = np.zeros(n, np.float32)
    lib.tpt_pcg_floats(ctypes.c_uint32(seed & 0xFFFFFFFF), n, _f32p(out))
    return out


def write_png_native(path: str, image_gl_rows) -> None:
    """Write RGB PNG from GL-row-ordered float [0,1] or uint8 image."""
    img = np.asarray(image_gl_rows)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    img = np.ascontiguousarray(img[:, :, :3])
    lib = _load()
    if lib is None:
        from .utils.image import write_png
        write_png(path, img)
        return
    h, w = img.shape[:2]
    rc = lib.tpt_write_png(path.encode(), img.ctypes.data_as(
        ctypes.POINTER(ctypes.c_ubyte)), w, h)
    if rc != 0:
        raise RuntimeError(f"tpt_write_png failed: {rc}")
