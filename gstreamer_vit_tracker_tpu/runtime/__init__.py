"""ctypes bindings to the native C++ runtime (runtime/native/framering.cpp).

Builds on demand with the bundled Makefile (g++); every entry point has a
pure-Python/numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframering.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the native library (no-op if current).  Returns success."""
    try:
        if force:
            subprocess.run(["make", "-C", _NATIVE_DIR, "clean"], check=True,
                           capture_output=True)
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


_load_failed = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_LIB_PATH) and not build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # A stale .so for another arch/glibc: rebuild once, else fall back
        # to the pure-Python paths (available() must return False, not
        # raise).
        if not build(force=True):
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.nv12_to_rgb_mt.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
                                   ctypes.c_int]
    lib.yuy2_to_rgb_mt.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
                                   ctypes.c_int]
    lib.synth_nv12.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_int, ctypes.c_uint64]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_push.argtypes = [ctypes.c_void_p, u8p]
    lib.ring_pop.restype = ctypes.c_uint64
    lib.ring_pop.argtypes = [ctypes.c_void_p, u8p]
    lib.ring_len.restype = ctypes.c_int
    lib.ring_len.argtypes = [ctypes.c_void_p]
    for stat in ("pushed", "dropped", "popped"):
        fn = getattr(lib, f"ring_stat_{stat}")
        fn.restype = ctypes.c_uint64
        fn.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def nv12_to_rgb(nv12: np.ndarray, width: int, height: int,
                num_threads: int = 8) -> np.ndarray:
    """Native multithreaded BT.601 NV12->RGB (bit-exact with the JAX op and
    the reference LUT kernel, nv12_convert.rs:46-92)."""
    lib = load()
    nv12 = np.ascontiguousarray(nv12, np.uint8)
    out = np.empty((height, width, 3), np.uint8)
    if lib is None:
        from ..ops import colorspace
        import jax.numpy as jnp

        return np.asarray(colorspace.nv12_to_rgb(jnp.asarray(nv12),
                                                 width=width, height=height))
    lib.nv12_to_rgb_mt(_u8p(nv12), width, height, _u8p(out), num_threads)
    return out


def yuy2_to_rgb(yuy2: np.ndarray, width: int, height: int,
                num_threads: int = 8) -> np.ndarray:
    lib = load()
    yuy2 = np.ascontiguousarray(yuy2, np.uint8)
    out = np.empty((height, width, 3), np.uint8)
    if lib is None:
        from ..ops import colorspace
        import jax.numpy as jnp

        return np.asarray(colorspace.yuy2_to_rgb(jnp.asarray(yuy2),
                                                 width=width, height=height))
    lib.yuy2_to_rgb_mt(_u8p(yuy2), width, height, _u8p(out), num_threads)
    return out


def synth_nv12(width: int, height: int, obj_x: int, obj_y: int,
               obj_size: int) -> np.ndarray:
    """Generate one NV12 frame natively (flat buffer, Y then UV)."""
    lib = load()
    out = np.empty(width * height * 3 // 2, np.uint8)
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    lib.synth_nv12(_u8p(out), width, height, obj_x, obj_y, obj_size)
    return out


class NativeFrameRing:
    """Bounded drop-oldest frame ring backed by C++ (FrameQueue semantics:
    reference pipeline_ir.rs:75-78 leaky queue)."""

    def __init__(self, capacity: int, slot_bytes: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.slot_bytes = slot_bytes
        self._h = ctypes.c_void_p(lib.ring_create(capacity, slot_bytes))

    def push(self, frame: np.ndarray) -> bool:
        """Returns False if an old frame was dropped (producer never blocks)."""
        frame = np.ascontiguousarray(frame.reshape(-1), np.uint8)
        assert frame.nbytes == self.slot_bytes
        return self._lib.ring_push(self._h, _u8p(frame)) == 0

    def pop(self) -> Optional[Tuple[int, np.ndarray]]:
        out = np.empty(self.slot_bytes, np.uint8)
        seq = self._lib.ring_pop(self._h, _u8p(out))
        if seq == 0:
            return None
        return int(seq), out

    def __len__(self) -> int:
        return self._lib.ring_len(self._h)

    @property
    def stats(self):
        return {s: int(getattr(self._lib, f"ring_stat_{s}")(self._h))
                for s in ("pushed", "dropped", "popped")}

    def close(self) -> None:
        if self._h:
            self._lib.ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
