"""Native (C++) host-runtime components, loaded via ctypes.

Build-on-first-import: the shared library compiles with g++ into a
per-version cache next to the sources; callers fall back to pure-Python
implementations when no compiler is available (``metadata.MetadataIndex``
handles the fallback).
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).parent / "metadata_index.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: Path) -> Optional[Path]:
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out = src.parent / f"_metadata_index_{tag}.so"
    if out.exists():
        return out
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception:
        return None


def load_metadata_lib() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native metadata index; None if no
    toolchain is available."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build(_SRC)
    if so is None:
        return None
    # A stale/foreign-platform .so must degrade to the Python fallback,
    # not crash StorageService init.
    try:
        lib = ctypes.CDLL(str(so))
        _bind_symbols(lib)
    except OSError:
        return None
    except AttributeError:
        return None
    _LIB = lib
    return _LIB


def _bind_symbols(lib: ctypes.CDLL) -> None:
    lib.mdx_new.restype = ctypes.c_void_p
    lib.mdx_free.argtypes = [ctypes.c_void_p]
    lib.mdx_set.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
    ]
    lib.mdx_remove.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mdx_size.argtypes = [ctypes.c_void_p]
    lib.mdx_size.restype = ctypes.c_int64
    lib.mdx_query.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.mdx_query.restype = ctypes.c_int64
