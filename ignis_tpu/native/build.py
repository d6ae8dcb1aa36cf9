"""On-demand g++ build + ctypes load of the native helpers.

No pybind11 in this environment (see repo constraints), so native pieces
export a C ABI and are loaded with ctypes.  Shared objects are cached next
to the sources and rebuilt when the source is newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_HERE = Path(__file__).parent
_CACHE: dict = {}


def _build(name: str, sources: list[str], flags: list[str]) -> Path:
    so = _HERE / f"_{name}.so"
    srcs = [_HERE / s for s in sources]
    if so.exists() and all(so.stat().st_mtime >= s.stat().st_mtime
                           for s in srcs):
        return so
    cmd = (["g++", "-O2", "-shared", "-fPIC", "-o", str(so)]
           + [str(s) for s in srcs] + flags)
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def load_exr_shim():
    """ctypes handle for the OpenEXR reader shim, or None when the system
    OpenEXR library is unavailable."""
    if "exr" in _CACHE:
        return _CACHE["exr"]
    lib = None
    try:
        inc = []
        for d in ("/usr/include/OpenEXR", "/usr/include/Imath"):
            if os.path.isdir(d):
                inc.append("-I" + d)
        so = _build("exr_shim", ["exr_shim.cpp"],
                    inc + ["-lOpenEXR-3_1", "-lImath-3_1",
                           "-lIlmThread-3_1", "-lIex-3_1"])
        lib = ctypes.CDLL(str(so))
        lib.ig_exr_read_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ig_exr_read_size.restype = ctypes.c_int
        lib.ig_exr_read.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_float)]
        lib.ig_exr_read.restype = ctypes.c_int
    except Exception:
        lib = None
    _CACHE["exr"] = lib
    return lib
