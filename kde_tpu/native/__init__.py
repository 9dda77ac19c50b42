"""ctypes bindings for the native (C++) host components.

The shared library is compiled on first use if not present (g++ is in the
image; pybind11 is not, hence ctypes).  Every native routine has a pure-
Python twin in ops/ with identical output -- the native path is a host-side
throughput optimization (tree construction is O(N log N) serial work that
Python executes ~50x slower at N=1e5), never a semantic fork; equality is
asserted in tests/test_native_balltree.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libballtree.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _compile() -> bool:
    src = os.path.join(_DIR, "balltree.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None if unavailable (callers fall back
    to the Python implementation)."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        src = os.path.join(_DIR, "balltree.cpp")
        stale = (os.path.exists(_SO) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO))
        # recompile when the source is newer than the .so: the bit-identity
        # invariant (CLAUDE.md) requires paired edits to balltree.cpp and
        # ops/balltree.py, and a stale binary would silently shadow the
        # C++ side of such an edit (on failure, fall back to Python rather
        # than load the stale binary)
        if (not os.path.exists(_SO) or stale) and not _compile():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        i64 = ctypes.c_int64
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.kde_build_balltree.restype = None
        lib.kde_build_balltree.argtypes = [
            dp, dp, dp, i64, i64, ctypes.c_int,
            dp, dp, dp, ip, ip, ip, ip, ip, dp, dp, dp, dp, ip]
        _lib = lib
        return _lib
