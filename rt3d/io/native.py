"""ctypes binding for the C++ mmap replayer (native/replayer.cpp).

Builds the shared library on demand with g++ (no pip deps). Frame data is
exposed as zero-copy NumPy views into the mapping; a C++ prefetch thread
keeps upcoming frames paged in while the device crunches the current one.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

from rt3d.io.format import SequenceSpec

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "replayer.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "librt3d_replayer.so")


def build_library(force: bool = False) -> str:
    """Compile the replayer if needed. Returns the .so path."""
    if force or not os.path.exists(_LIB) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True,
        )
    return _LIB


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.rts_open.restype = ctypes.c_void_p
        lib.rts_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.rts_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
        lib.rts_frame.restype = ctypes.c_int
        lib.rts_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.rts_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeReplayer:
    def __init__(self, path: str, spec: SequenceSpec, prefetch_frames: int = 4):
        lib = _load()
        self._lib = lib
        self._spec = spec
        self._h = lib.rts_open(path.encode(), prefetch_frames)
        if not self._h:
            raise RuntimeError(f"native replayer failed to open {path}")
        info = (ctypes.c_uint32 * 5)()
        lib.rts_info(self._h, info)
        assert (info[0], info[1], info[2], info[3]) == (
            spec.n_cams, spec.n_frames, spec.height, spec.width
        ), "native/python header disagreement"

    def frame(self, index: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        s = self._spec
        h, w = s.height, s.width
        rgbs, depths, stats = [], [], []
        for cam in range(s.n_cams):
            p_status = ctypes.c_void_p()
            p_rgb = ctypes.c_void_p()
            p_depth = ctypes.c_void_p()
            rc = self._lib.rts_frame(
                self._h, index, cam,
                ctypes.byref(p_status), ctypes.byref(p_rgb), ctypes.byref(p_depth),
            )
            if rc != 0:
                raise IndexError(f"frame {index} cam {cam} out of range")
            stats.append(
                np.ctypeslib.as_array(
                    ctypes.cast(p_status, ctypes.POINTER(ctypes.c_uint32)), (1,)
                )[0]
            )
            rgbs.append(
                np.ctypeslib.as_array(
                    ctypes.cast(p_rgb, ctypes.POINTER(ctypes.c_uint8)), (h, w, 3)
                )
            )
            if s.has_depth and p_depth.value:
                depths.append(
                    np.ctypeslib.as_array(
                        ctypes.cast(p_depth, ctypes.POINTER(ctypes.c_float)), (h, w)
                    )
                )
            else:
                depths.append(np.zeros((h, w), np.float32))
        return np.stack(rgbs), np.stack(depths), np.asarray(stats, np.uint32)

    def close(self) -> None:
        if self._h:
            self._lib.rts_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
