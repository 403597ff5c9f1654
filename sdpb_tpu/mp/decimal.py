"""Host-side conversions between MP word arrays and decimal strings.

The reference reads/writes all numeric file formats as full-precision
decimal strings (GMP I/O, `src/sdpb_util/set_stream_precision.hxx`).  We
parse and emit them with mpmath at a working precision comfortably above
K*53 bits, then split into / recombine from float64 words exactly.
"""

from __future__ import annotations

import numpy as np
import mpmath

from .core import DEFAULT_K

_GUARD_BITS = 40


def _native():
    """The C codec (csrc/codec.cpp) when built; None -> mpmath path."""
    from ..io import native_codec

    return native_codec if native_codec.available() else None


def _ctx(k: int) -> mpmath.MPContext:
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + _GUARD_BITS
    return ctx


def from_mpf(x, k: int = DEFAULT_K) -> np.ndarray:
    """Split an mpmath mpf (or float/int) into K float64 words (exact
    greedy extraction: w_i = round(x - sum(w_0..w_{i-1})))."""
    ctx = _ctx(k)
    v = ctx.mpf(x)
    words = np.zeros(k, dtype=np.float64)
    for i in range(k):
        w = float(v)
        words[i] = w
        v = v - ctx.mpf(w)
    return words


def from_decimal(s: str, k: int = DEFAULT_K) -> np.ndarray:
    nat = _native()
    if nat is not None:
        return nat.dec2words(s, k)
    ctx = _ctx(k)
    return from_mpf(ctx.mpf(s.strip()), k)


def to_mpf(words, ctx: mpmath.MPContext | None = None):
    """Exact mpmath value of one MP scalar: f64-word expansions are
    summed exactly; f32 arrays are the TPU limb format (mp/limb.py)."""
    if np.asarray(words).dtype == np.float32:
        from . import limb as mplimb

        return mplimb.to_mpf(np.asarray(words), ctx)
    words = np.asarray(words, dtype=np.float64)
    k = words.shape[-1]
    if ctx is None:
        ctx = _ctx(k)
    v = ctx.mpf(0)
    for w in words.reshape(-1) if words.ndim == 1 else words:
        v += ctx.mpf(float(w))
    return v


def to_decimal(words, digits: int | None = None) -> str:
    """Decimal string with full round-trip precision for K words.

    Default digit count comes from the words' actual exponent span
    (greedy expansions can have gaps, so 53*K digits is not always
    enough for an exact round trip)."""
    if np.asarray(words).dtype == np.float32:
        from . import limb as mplimb

        v = mplimb.to_mpf(np.asarray(words))
        k_slots = np.asarray(words).shape[-1]
        ctx = mpmath.mp.clone()
        ctx.prec = 9 * (k_slots + 8)
        if digits is None:
            digits = int(np.ceil(9 * k_slots * 0.30103)) + 2
        return ctx.nstr(v, digits, strip_zeros=True, min_fixed=1,
                        max_fixed=0)
    words = np.asarray(words, dtype=np.float64)
    nat = _native()
    if nat is not None:
        out = nat.words2dec(words, digits or 0)
        if out is not None:
            return out
    k = words.shape[-1]
    ctx = _ctx(k)
    if digits is None:
        nz = words[words != 0]
        if nz.size:
            _, e_hi = np.frexp(np.max(np.abs(nz)))
            _, e_lo = np.frexp(np.min(np.abs(nz)))
            span = int(e_hi) - int(e_lo) + 53
        else:
            span = 53 * k
        digits = int(np.ceil(span * 0.30103)) + 2
    return ctx.nstr(
        to_mpf(words, ctx), digits, strip_zeros=True, min_fixed=1, max_fixed=0
    )


def _np_two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def words_to_dtype(words: np.ndarray, k_out: int, dtype) -> np.ndarray:
    """Host-side (numpy, IEEE-exact) conversion between word dtypes,
    e.g. K f64 words -> K' f32 words.  Used to prepare problem data for
    the TPU f32-word path without running any device arithmetic.

    Splits each source word exactly into destination words, then
    renormalizes with a two_sum chain (inputs are magnitude-ordered by
    construction, so no sort is needed).

    Values beyond the destination dtype's finite range (e.g. the 1e100
    maxComplementarity default under f32 words) are CLAMPED to the
    largest finite value with matching sign - 'effectively infinite'
    thresholds keep their compare semantics without introducing
    inf-inf = NaN into the word arithmetic."""
    words = np.asarray(words)
    dtype = np.dtype(dtype)
    if dtype != words.dtype:
        fmax = float(np.finfo(dtype).max)
        flat = np.asarray(words, dtype=np.float64).reshape(
            -1, words.shape[-1]).copy()
        over = np.abs(flat[:, 0]) >= fmax
        if np.any(over):
            sign = np.where(flat[over, 0] > 0, fmax, -fmax)
            flat[over] = 0.0
            flat[over, 0] = sign
            words = flat.reshape(words.shape)
    src = []
    for i in range(words.shape[-1]):
        r = words[..., i].astype(np.float64)
        for _ in range(3 if dtype == np.float32 else 1):
            w = r.astype(dtype)
            src.append(w)
            r = r - w.astype(np.float64)
    # interleave-free: source list is per-original-word triples, which
    # is only approximately decreasing; a VecSum chain (exact) followed
    # by a top-down emit keeps the value
    m = np.stack([w.astype(dtype) for w in src], axis=-1)
    n = m.shape[-1]
    # bottom-up two_sum distillation
    s = m[..., -1]
    errs = []
    for i in range(n - 2, -1, -1):
        s, e = _np_two_sum(m[..., i], s)
        errs.append(e)
    seq = [s] + errs[::-1]
    # top-down: accumulate, emitting the running value each step
    out = np.zeros(words.shape[:-1] + (k_out,), dtype=dtype)
    acc = seq[0]
    j = np.zeros(words.shape[:-1], dtype=np.int64)
    for w in seq[1:]:
        s2, e2 = _np_two_sum(acc, w)
        emit = (e2 != 0) & (j < k_out - 1)
        if emit.any():
            flat = out.reshape(-1, k_out)
            jf = j.reshape(-1)
            ef = emit.reshape(-1)
            sf = s2.reshape(-1)
            flat[np.nonzero(ef)[0], jf[ef]] = sf[ef]
        j = j + emit
        acc = np.where(emit, e2, s2)
    # final carry lands in the next free slot (j <= k_out-1 always)
    flat = out.reshape(-1, k_out)
    flat[np.arange(flat.shape[0]), j.reshape(-1)] = acc.reshape(-1)
    return out


def array_from_decimal(strings, k: int = DEFAULT_K) -> np.ndarray:
    """Vectorized from_decimal over a nested list of strings."""
    arr = np.asarray(strings, dtype=object)
    flat_in = arr.reshape(-1)
    nat = _native()
    if nat is not None:
        out = nat.dec2words_batch(list(flat_in), k)
        return out.reshape(arr.shape + (k,))
    out = np.zeros(arr.shape + (k,), dtype=np.float64)
    flat_out = out.reshape(-1, k)
    for i, s in enumerate(flat_in):
        flat_out[i] = from_decimal(s, k)
    return out
