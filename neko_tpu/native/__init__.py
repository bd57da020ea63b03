"""Native (C) host-side kernels, loaded via ctypes.

Compiled on first import with the system C compiler into a per-user cache;
every entry point has a numpy fallback so the framework works without a
toolchain.  `lib()` returns the loaded library or None.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "packing.c")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "neko_tpu", "native"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"packing_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cc = os.environ.get("CC") or sysconfig.get_config_var("CC") or "cc"
    cc = cc.split()[0]
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", so_path + ".tmp", _SRC, "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception:
        return None


def lib():
    """The loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        so_path = _build()
        if so_path is not None:
            try:
                L = ctypes.CDLL(so_path)
                i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
                u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
                f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
                c = ctypes.c_int
                cf = ctypes.c_float
                L.pack_continuous_control.restype = c
                L.pack_continuous_control.argtypes = [
                    f32p, c, c, f32p, c, cf, cf, c, c, c, i32p, u8p, i32p,
                ]
                L.pack_discrete_control.restype = c
                L.pack_discrete_control.argtypes = [
                    i32p, c, c, i32p, c, c, c, i32p, u8p, i32p,
                ]
                L.pack_continuous_obs_discrete_act.restype = c
                L.pack_continuous_obs_discrete_act.argtypes = [
                    f32p, c, c, i32p, c, cf, cf, c, c, c, c, i32p, u8p, i32p,
                ]
                _LIB = L
            except Exception:
                _LIB = None
        _TRIED = True
    return _LIB
