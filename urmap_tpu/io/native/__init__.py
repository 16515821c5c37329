"""ctypes bindings for the native IO codecs (codecs.cpp).

The shared library is compiled on first use with g++ (no pip/pybind11
in this environment — SURVEY.md env notes) and cached next to the source,
keyed on a content hash of the source so a stale or foreign binary can
never be loaded (the build artifact is gitignored; every machine compiles
its own). Import never hard-fails: ``lib()`` returns None when no
compiler is available and callers fall back to the pure-Python paths
(io/fastq.py, io/sam.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codecs.cpp")


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"_codecs_{h}.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

c_i64 = ctypes.c_int64
c_i32 = ctypes.c_int32
p_i64 = ctypes.POINTER(ctypes.c_int64)
p_i32 = ctypes.POINTER(ctypes.c_int32)
p_u8 = ctypes.POINTER(ctypes.c_uint8)
p_char = ctypes.c_char_p


def _build(so: str) -> bool:
    try:
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-pthread",
             "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
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
    lib.urmap_compose_cigars.restype = c_i64
    lib.urmap_compose_cigars.argtypes = [
        c_i64, p_i32, p_i32, p_u8, p_i32, p_char, p_i64,
        ctypes.c_void_p, c_i64, p_i64]
    lib.urmap_traceback_batch.restype = c_i64
    lib.urmap_traceback_batch.argtypes = [
        p_u8, c_i64, p_i64, p_u8, c_i64, p_i32, c_i64, c_i32, c_i32,
        c_i32, c_i32, c_i32, c_i32, c_i32, ctypes.c_void_p, c_i64, p_i64,
        p_i32, p_i32, p_i32]
    lib.urmap_dops_decode_batch.restype = c_i64
    lib.urmap_dops_decode_batch.argtypes = [
        p_i32, c_i64, c_i64, p_i32, p_i32, p_u8, c_i64, p_i64,
        p_u8, c_i64, c_i64, ctypes.c_void_p, c_i64, p_i64,
        p_i32, p_i32, p_u8]
    lib.urmap_pack_reads.restype = None
    lib.urmap_pack_reads.argtypes = [p_u8, c_i64, c_i64, p_u8, p_u8]
    lib.urmap_align_runs.restype = c_i64
    lib.urmap_align_runs.argtypes = [p_i64, c_i64, c_i64, p_i64]
    lib.urmap_align_runs_fixed.restype = c_i64
    lib.urmap_align_runs_fixed.argtypes = [p_i64, c_i64, c_i64, p_i64]
    p_u64 = ctypes.POINTER(ctypes.c_uint64)
    lib.urmap_extract_partition.restype = c_i64
    lib.urmap_extract_partition.argtypes = [
        p_u8, c_i64, c_i64, c_i32, c_i32, c_i32, c_i32, p_u64, p_i64]
    lib.urmap_sort_u64.restype = c_i32
    lib.urmap_sort_u64.argtypes = [p_u64, c_i64]
    p_u32 = ctypes.POINTER(ctypes.c_uint32)
    lib.urmap_recap.restype = c_i32
    lib.urmap_recap.argtypes = [p_u32, c_i64, p_u32, c_i64, c_i32,
                                p_u32, p_u32]
    lib.urmap_place_runs.restype = c_i32
    lib.urmap_place_runs.argtypes = [p_u32, c_i64, p_u32, p_i64, c_i64,
                                     c_i32, p_i32]
    lib.urmap_pack_genome.restype = c_i32
    lib.urmap_pack_genome.argtypes = [p_u8, c_i64, c_i32, p_u32, p_u32,
                                      c_i64]
    lib.urmap_cap_offsets.restype = c_i64
    lib.urmap_cap_offsets.argtypes = [p_u32, c_i64, c_i64, c_i32, p_u32]
    lib.urmap_bucket_csr.restype = c_i64
    lib.urmap_bucket_csr.argtypes = [p_u64, c_i64, c_i64, c_i64, c_i64,
                                     p_u32, p_i64]
    lib.urmap_parse_fasta.restype = c_i64
    lib.urmap_parse_fasta.argtypes = [p_char, c_i64, c_i64, c_i64, p_u8,
                                      p_i64, p_i64, p_i64, p_i64, p_i64]
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
        so = _so_path()
        if not os.path.exists(so) and not _build(so):
            return None
        try:
            _lib = _bind(ctypes.CDLL(so))
        except OSError as e:
            print(f"urmap_tpu: native codec load failed ({e})",
                  file=sys.stderr)
            _lib = None
        return _lib
