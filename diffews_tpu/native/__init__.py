"""ctypes loader for the native mask codec (builds lazily with cc).

`load()` returns the loaded CDLL or None.  The shared object is built from
`maskcodec.cc` on first use (g++/cc, ~1 s) and cached next to the source;
set ``DIFFEWS_TPU_NATIVE=0`` to force the pure-Python fallbacks in
`diffews_tpu.data.masks`.  A build failure is never fatal — callers fall
back to NumPy/PIL.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "maskcodec.cc")
_LIB = os.path.join(_DIR, "_maskcodec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64 = ctypes.c_int64
_pi64 = ctypes.POINTER(ctypes.c_int64)
_pu8 = ctypes.POINTER(ctypes.c_uint8)
_pdbl = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    cc = shutil.which("g++") or shutil.which("cc") or shutil.which("clang++")
    if cc is None or not os.path.exists(_SRC):
        return False
    tmp = _LIB + f".tmp.{os.getpid()}"
    cmd = [cc, "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.SubprocessError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.rle_decode_counts.restype = _i64
    lib.rle_decode_counts.argtypes = [ctypes.c_char_p, _i64, _pi64, _i64]
    lib.rle_encode_counts.restype = _i64
    lib.rle_encode_counts.argtypes = [_pi64, _i64, ctypes.c_char_p, _i64]
    lib.rle_expand.restype = None
    lib.rle_expand.argtypes = [_pi64, _i64, _i64, _i64, _pu8]
    lib.rle_from_mask.restype = _i64
    lib.rle_from_mask.argtypes = [_pu8, _i64, _i64, _pi64, _i64]
    lib.polys_to_mask.restype = None
    lib.polys_to_mask.argtypes = [_pdbl, _pi64, _i64, _i64, _i64, _pu8]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib, _tried
    if os.environ.get("DIFFEWS_TPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        stale = (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < src_mtime)
        if stale and not _build():
            return None
        try:
            _lib = _bind(ctypes.CDLL(_LIB))
        except OSError:
            _lib = None
        return _lib
