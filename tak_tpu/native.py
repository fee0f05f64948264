"""ctypes bindings for the native takcore engine (native/takcore.cpp).

The native engine is the framework's independent rules oracle and
low-latency host engine; the TPU compute path never uses it.  The shared
library builds on first use (make -C native); if no C++ toolchain exists
the import degrades gracefully (`available()` returns False) and callers
fall back to the JAX engine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtakcore.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tak_new.restype = ctypes.c_void_p
    lib.tak_new.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.tak_clone.restype = ctypes.c_void_p
    lib.tak_clone.argtypes = [ctypes.c_void_p]
    lib.tak_free.argtypes = [ctypes.c_void_p]
    lib.tak_reset.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.tak_play.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tak_result.argtypes = [ctypes.c_void_p]
    lib.tak_legal.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.tak_perft.restype = ctypes.c_longlong
    lib.tak_perft.argtypes = [ctypes.c_void_p, ctypes.c_int]
    for name in ("tak_ply", "tak_to_move", "tak_result", "tak_reversible"):
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("tak_stones", "tak_caps", "tak_height", "tak_top"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tak_stack_color.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.tak_set_reserves.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeGame:
    """Host-side Tak game backed by the C++ engine."""

    def __init__(self, n: int, half_komi: int = 0, _handle=None):
        lib = _load()
        if lib is None:
            raise RuntimeError("takcore native library unavailable")
        self._lib = lib
        self.n = n
        self._g = _handle or lib.tak_new(n, half_komi)

    def __del__(self):
        if getattr(self, "_g", None):
            self._lib.tak_free(self._g)
            self._g = None

    def clone(self) -> "NativeGame":
        return NativeGame(self.n, _handle=self._lib.tak_clone(self._g))

    @property
    def ply(self) -> int:
        return self._lib.tak_ply(self._g)

    @property
    def to_move(self) -> int:
        return self._lib.tak_to_move(self._g)

    @property
    def result(self) -> int:
        return self._lib.tak_result(self._g)

    def play_action(self, action: int) -> None:
        self._lib.tak_play(self._g, int(action))

    def legal_actions(self) -> np.ndarray:
        buf = (ctypes.c_int * 4096)()
        cnt = self._lib.tak_legal(self._g, buf, 4096)
        return np.ctypeslib.as_array(buf)[:cnt].copy()

    def perft(self, depth: int) -> int:
        return self._lib.tak_perft(self._g, depth)

    def reserves(self) -> tuple[int, int, int, int]:
        lib, g = self._lib, self._g
        return (lib.tak_stones(g, 0), lib.tak_caps(g, 0),
                lib.tak_stones(g, 1), lib.tak_caps(g, 1))

    def board_arrays(self):
        """(heights, tops, stack_colors_list) for differential testing."""
        n2 = self.n * self.n
        heights = np.array([self._lib.tak_height(self._g, s) for s in range(n2)])
        tops = np.array([self._lib.tak_top(self._g, s) for s in range(n2)])
        colors = [
            [self._lib.tak_stack_color(self._g, s, h) for h in range(heights[s])]
            for s in range(n2)
        ]
        return heights, tops, colors
