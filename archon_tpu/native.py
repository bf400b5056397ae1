"""ctypes bindings for the native host runtime (native/archon_host.cpp).

Compiled on demand with g++ into a cached shared library; every entry point
has a numpy fallback so the package works without a toolchain.  (pybind11 is
not available in this environment; the C ABI + ctypes is the binding layer.)
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent.parent / "native" / "archon_host.cpp"
_LIB = None
_TRIED = False


def _build_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not _SRC.exists():
        return None
    # ARCHON_NATIVE_DEBUG=1 builds the sanitizer variant (the ASAN/UBSAN-era
    # equivalent of the reference's debug/valgrind Makefile targets,
    # bwt/a7/Makefile:7-17, SURVEY section 4.4).  Because the .so is
    # dlopened into an uninstrumented python, run with
    #   LD_PRELOAD=$(g++ -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=0
    # (verified: the parallel decode paths run clean under ASAN+UBSAN)
    debug = os.environ.get("ARCHON_NATIVE_DEBUG") == "1"
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    if debug:
        tag += "-dbg"
    out = Path(tempfile.gettempdir()) / f"archon_host_{tag}.so"
    if not out.exists():
        flags = (
            ["-g", "-O1", "-fsanitize=address,undefined",
             "-fno-omit-frame-pointer"]
            if debug
            else ["-O3", "-march=native"]
        )
        cmd = [
            "g++", "-shared", "-fPIC", "-pthread", *flags,
            "-o", str(out), str(_SRC),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
            return None
    try:
        lib = ctypes.CDLL(str(out))
    except OSError:
        return None
    lib.archon_histogram256.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.archon_unbwt.restype = ctypes.c_int
    lib.archon_unbwt.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.archon_verify_cycle.restype = ctypes.c_int
    lib.archon_verify_cycle.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.archon_bitpack.restype = ctypes.c_int64
    lib.archon_bitpack.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.archon_bitunpack.restype = ctypes.c_int64
    lib.archon_bitunpack.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64]
    lib.archon_map_open.restype = ctypes.c_void_p
    lib.archon_map_open.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.archon_map_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.archon_map_data.argtypes = [ctypes.c_void_p]
    lib.archon_map_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _build_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def histogram256(data: np.ndarray) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    lib = _build_lib()
    if lib is None:
        return np.bincount(data, minlength=256).astype(np.int64)
    out = np.zeros(256, np.int64)
    lib.archon_histogram256(_ptr(data), len(data), _ptr(out))
    return out


def unbwt(L: np.ndarray, base: int, sentinel_large: bool) -> np.ndarray:
    """Native serial LF chain walk (a6/src/bwt.c:459-478 semantics)."""
    L = np.ascontiguousarray(L, np.uint8)
    n = len(L)
    lib = _build_lib()
    if lib is None:
        from .golden.sa import bwt_inverse

        return bwt_inverse(L, base, "large" if sentinel_large else "small")
    P = np.empty(n, np.int32)
    out = np.empty(n, np.uint8)
    rc = lib.archon_unbwt(_ptr(L), n, base, int(sentinel_large), _ptr(P), _ptr(out))
    if rc != 0:
        raise ValueError("invalid BWT payload")
    return out


def verify_cycle(L: np.ndarray, base: int, sentinel_large: bool) -> bool:
    """True iff the LF walk over (L, base) is a single n-cycle."""
    L = np.ascontiguousarray(L, np.uint8)
    n = len(L)
    lib = _build_lib()
    if lib is None:
        seen = np.zeros(n, bool)
        from .golden.sa import bwt_inverse  # walk implicitly checks shape

        try:
            bwt_inverse(L, base, "large" if sentinel_large else "small")
        except Exception:
            return False
        return True
    P = np.empty(n, np.int32)
    seen = np.zeros(n, np.uint8)
    return lib.archon_verify_cycle(_ptr(L), n, base, int(sentinel_large), _ptr(P), _ptr(seen)) == 0


def bitpack(data: np.ndarray, code_values: np.ndarray, code_lengths: np.ndarray):
    """Native a6 bit-stream packer; returns (words u32, total_bits)."""
    data = np.ascontiguousarray(data, np.uint8)
    vals = np.ascontiguousarray(code_values, np.uint32)
    lens = np.ascontiguousarray(code_lengths, np.uint8)
    lib = _build_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    words = np.zeros(len(data) + 2, np.uint32)
    total = lib.archon_bitpack(_ptr(data), len(data), _ptr(vals), _ptr(lens), _ptr(words))
    return words, int(total)


def bitunpack(words: np.ndarray, total_bits: int, code_values, code_lengths, n: int):
    words = np.ascontiguousarray(words, np.uint32)
    # The native first-bits decoder issues 8-byte wide loads that may read up
    # to 8 bytes past the final bit; guarantee that tail is mapped (and zero).
    need = (total_bits + 31) // 32 + 2
    if len(words) < need:
        words = np.concatenate([words, np.zeros(need - len(words), np.uint32)])
    vals = np.ascontiguousarray(code_values, np.uint32)
    lens = np.ascontiguousarray(code_lengths, np.uint8)
    lib = _build_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty(n, np.uint8)
    rc = lib.archon_bitunpack(_ptr(words), total_bits, _ptr(vals), _ptr(lens), _ptr(out), n)
    if rc != 0:
        raise ValueError("undecodable stream")
    return out


class MappedFile:
    """mmap-backed zero-copy file view (data-loader for block streaming)."""

    def __init__(self, path: str):
        lib = _build_lib()
        self._lib = lib
        self._handle = None
        if lib is None:
            self._data = np.fromfile(path, np.uint8)
            return
        size = ctypes.c_int64(0)
        h = lib.archon_map_open(str(path).encode(), ctypes.byref(size))
        if not h:
            raise OSError(f"cannot map {path}")
        self._handle = h
        ptr = lib.archon_map_data(h)
        self._data = (
            np.ctypeslib.as_array(ptr, shape=(size.value,))
            if size.value
            else np.zeros(0, np.uint8)
        )

    @property
    def data(self) -> np.ndarray:
        return self._data

    def blocks(self, block_size: int):
        n = len(self._data)
        for i in range(0, n, block_size):
            yield self._data[i : i + block_size]

    def close(self):
        if self._handle is not None:
            self._data = np.zeros(0, np.uint8)
            self._lib.archon_map_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
