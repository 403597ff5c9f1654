"""ctypes binding for the native decimal<->MP-words codec (csrc/codec.cpp).

This is the framework's native IO layer (the reference's equivalent is
GMP stream IO + RapidJSON in C++; see csrc/codec.cpp header).  The
library is built on demand with `make -C csrc`; if the toolchain or
library is unavailable every entry point returns None and callers fall
back to the mpmath path in sdpb_tpu.mp.decimal.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "build" / "libsdpb_tpu.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        if os.environ.get("SDPB_TPU_NO_NATIVE"):
            return None
        try:
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.sdpb_dec2words.restype = ctypes.c_int
    lib.sdpb_dec2words.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.sdpb_dec2words_batch.restype = ctypes.c_long
    lib.sdpb_dec2words_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.sdpb_words2dec.restype = ctypes.c_int
    lib.sdpb_words2dec.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def dec2words(s: str, k: int):
    """One decimal string -> (k,) float64 array, or None if no native."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(k, dtype=np.float64)
    b = s.encode()
    rc = lib.sdpb_dec2words(
        b, len(b), k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise ValueError(f"native codec could not parse {s!r}")
    return out


def dec2words_batch(strings, k: int):
    """List/array of decimal strings -> (n, k) float64 array, or None."""
    lib = _load()
    if lib is None:
        return None
    enc = [s.encode() if isinstance(s, str) else bytes(s) for s in strings]
    n = len(enc)
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, b in enumerate(enc):
        offsets[i + 1] = offsets[i] + len(b)
    buf = b"".join(enc)
    out = np.zeros((n, k), dtype=np.float64)
    rc = lib.sdpb_dec2words_batch(
        buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n, k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != n:
        idx = -int(rc) - 1
        raise ValueError(
            f"native codec could not parse element {idx}: {strings[idx]!r}")
    return out


def words2dec(words, digits: int = 0):
    """(k,) float64 words -> decimal string, or None if no native.
    digits <= 0 selects full round-trip precision (from the words'
    actual exponent span)."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(words, dtype=np.float64)
    nz = w[w != 0]
    if nz.size:
        # upper bound on the auto-digit count from the exponent span
        _, e_hi = np.frexp(np.max(np.abs(nz)))
        _, e_lo = np.frexp(np.min(np.abs(nz)))
        span_digits = int((int(e_hi) - int(e_lo) + 54) * 0.30103) + 4
    else:
        span_digits = 4
    cap = max(digits, span_digits) + 64
    out = ctypes.create_string_buffer(cap)
    rc = lib.sdpb_words2dec(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), w.shape[-1],
        digits, out, cap)
    if rc < 0:
        return None
    return out.value.decode()
