"""Runtime build + load of the native C++ helpers.

The reference is a C++ codebase; the host-side runtime pieces that are
genuinely CPU-bound here (the 145 MB vocabulary text parse, to start)
are C++ too, compiled on first use with the system toolchain into a
shared library next to the sources and loaded via ctypes. Every native
entry point has a pure-Python fallback, so a missing compiler degrades
to slower, not broken.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC_DIR = os.path.join(_NATIVE_DIR, "src")
_LIB_DIR = os.path.join(_NATIVE_DIR, "lib")

_lock = threading.Lock()
_cache: dict[str, ctypes.CDLL | None] = {}


def load_native(name: str) -> ctypes.CDLL | None:
    """Build (if stale) and dlopen native/<src>/<name>.cc.

    Returns None when no compiler is available or the build fails —
    callers must fall back to their Python implementation."""
    with _lock:
        if name in _cache:
            return _cache[name]
        src = os.path.join(_SRC_DIR, f"{name}.cc")
        lib = os.path.join(_LIB_DIR, f"lib{name}.so")
        try:
            if not os.path.exists(lib) or (
                os.path.getmtime(lib) < os.path.getmtime(src)
            ):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-std=c++17",
                        "-shared", "-fPIC", "-o", lib, src,
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            _cache[name] = ctypes.CDLL(lib)
        except Exception:
            _cache[name] = None
        return _cache[name]


class _VocabData(ctypes.Structure):
    _fields_ = [
        ("n_nodes", ctypes.c_int64),
        ("k", ctypes.c_int32),
        ("depth", ctypes.c_int32),
        ("desc", ctypes.POINTER(ctypes.c_uint8)),
        ("parent", ctypes.POINTER(ctypes.c_int32)),
        ("is_leaf", ctypes.POINTER(ctypes.c_uint8)),
        ("weight", ctypes.POINTER(ctypes.c_float)),
    ]


def parse_vocab_text(path: str):
    """C++ DBoW2 text parse. Returns (k, depth, desc_bytes [n,32] u8,
    parent [n] i32, is_leaf [n] bool, weight [n] f32) with node 0 =
    root, or None if the native library is unavailable."""
    import numpy as np

    lib = load_native("vocab_loader")
    if lib is None:
        return None
    lib.vocab_load_text.restype = ctypes.POINTER(_VocabData)
    lib.vocab_load_text.argtypes = [ctypes.c_char_p]
    lib.vocab_free.argtypes = [ctypes.POINTER(_VocabData)]

    h = lib.vocab_load_text(path.encode())
    if not h:
        return None
    try:
        v = h.contents
        n = int(v.n_nodes)
        desc = np.ctypeslib.as_array(v.desc, (n, 32)).copy()
        parent = np.ctypeslib.as_array(v.parent, (n,)).copy()
        is_leaf = np.ctypeslib.as_array(v.is_leaf, (n,)).copy().astype(bool)
        weight = np.ctypeslib.as_array(v.weight, (n,)).copy()
        return int(v.k), int(v.depth), desc, parent, is_leaf, weight
    finally:
        lib.vocab_free(h)
