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
_HOSTOPS_SO = os.path.join(_DIR, "libhostops.so")
_lock = threading.Lock()
_lib = None
_failed = False
_hostops = None
_hostops_failed = False


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


def _compile_hostops() -> bool:
    src = os.path.join(_DIR, "hostops.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fno-math-errno",
             "-fopenmp-simd", "-fPIC", "-shared", "-std=c++17",
             "-o", _HOSTOPS_SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_hostops():
    """The host-ops shared library (fused LOOCV golden-search probe), or
    None if unavailable (callers fall back to the NumPy twin in
    ops/host_small.py).  Built separately from libballtree.so: hostops.cpp
    takes -march=native (it is rebuilt on this host whenever stale), while
    balltree.cpp keeps conservative flags to protect its bit-identity
    invariant with ops/balltree.py."""
    global _hostops, _hostops_failed
    if _hostops is not None or _hostops_failed:
        return _hostops
    with _lock:
        if _hostops is not None or _hostops_failed:
            return _hostops
        src = os.path.join(_DIR, "hostops.cpp")
        stale = (os.path.exists(_HOSTOPS_SO) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_HOSTOPS_SO))
        if (not os.path.exists(_HOSTOPS_SO) or stale) \
                and not _compile_hostops():
            _hostops_failed = True
            return None
        try:
            lib = ctypes.CDLL(_HOSTOPS_SO)
        except OSError:
            _hostops_failed = True
            return None
        i64 = ctypes.c_int64
        dbl = ctypes.c_double
        dp = ctypes.POINTER(ctypes.c_double)
        lib.kde_loo_nll.restype = dbl
        lib.kde_loo_nll.argtypes = [dp, dp, i64, dbl, dbl]
        lib.kde_loo_golden.restype = dbl
        lib.kde_loo_golden.argtypes = [dp, dp, i64, dbl, dbl, dbl,
                                       dbl, dbl, dbl, dbl]
        lib.kde_loo_golden_1d.restype = dbl
        lib.kde_loo_golden_1d.argtypes = [dp, dp, i64, dbl, dbl,
                                          dbl, dbl, dbl, dbl]
        lib.kde_log_eval_1d.restype = None
        lib.kde_log_eval_1d.argtypes = [dp, i64, dp, dp, i64, dbl, dp]
        _hostops = lib
        return _hostops
