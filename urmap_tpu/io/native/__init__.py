"""ctypes bindings for the native IO codecs (codecs.cpp).

The shared library is compiled on first import with g++ (no pip/pybind11
in this environment — SURVEY.md env notes) and cached next to the source,
keyed on the source mtime. Import never hard-fails: ``lib()`` returns
None when no compiler is available and callers fall back to the pure-
Python paths (io/fastq.py, io/sam.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codecs.cpp")
_SO = os.path.join(_DIR, "_codecs.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

c_i64 = ctypes.c_int64
c_i32 = ctypes.c_int32
p_i64 = ctypes.POINTER(ctypes.c_int64)
p_i32 = ctypes.POINTER(ctypes.c_int32)
p_u8 = ctypes.POINTER(ctypes.c_uint8)
p_char = ctypes.c_char_p


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO + ".tmp", _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        print(f"urmap_tpu: native codec build failed ({e}); "
              "using Python IO fallback", file=sys.stderr)
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.urmap_parse_fastq.restype = c_i64
    lib.urmap_parse_fastq.argtypes = [
        p_char, c_i64, c_i32, c_i64, p_u8, p_i32, p_i64, p_i32, p_i64,
        p_i32, p_i64, p_i64]
    lib.urmap_format_sam.restype = c_i64
    lib.urmap_format_sam.argtypes = [
        c_i64, p_char, p_i64, p_i32, p_i64, p_i32, p_i64, p_char, p_i64,
        p_char, p_i64, p_i32, p_i32, p_i64, p_i32, p_i32, p_i64, p_i64,
        p_i32, p_i32, p_i32, ctypes.c_void_p, c_i64]
    lib.urmap_cigars_all_match.restype = None
    lib.urmap_cigars_all_match.argtypes = [c_i64, p_i32, ctypes.c_void_p,
                                           p_i64]
    lib.urmap_traceback_batch.restype = c_i64
    lib.urmap_traceback_batch.argtypes = [
        p_u8, c_i64, p_i64, p_u8, c_i64, p_i32, c_i64, c_i32, c_i32,
        c_i32, c_i32, c_i32, ctypes.c_void_p, c_i64, p_i64, p_i32, p_i32,
        p_i32]
    return lib


def lib() -> ctypes.CDLL | None:
    """The codec library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        fresh = os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        if not fresh and not _build():
            return None
        try:
            _lib = _bind(ctypes.CDLL(_SO))
        except OSError as e:
            print(f"urmap_tpu: native codec load failed ({e})",
                  file=sys.stderr)
            _lib = None
        return _lib
