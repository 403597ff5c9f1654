"""Core multi-word floating-point expansion arithmetic.

An MP number is a JAX array whose trailing axis holds K words in
decreasing order of magnitude; the represented value is the exact sum of
the words.  All algorithms below are error-free-transform based
(two_sum / Dekker two_prod) and branch-free, so they vectorize over any
leading batch shape and run on the TPU VPU.

Word dtype is float64 on CPU hosts.  On TPU, XLA's f64 is emulated as a
float32 pair *without* correct rounding (verified empirically: two_sum
residuals come back zero), which breaks error-free transforms — so on
TPU the word dtype must be float32, whose add/mul are IEEE
correctly-rounded on the VPU.  Every op here infers the word dtype from
its inputs; only the Dekker splitting constant differs.

This module replaces the role of GMP ``El::BigFloat`` in the reference
(`src/sdp_solve/`, everywhere): K=4 f64 words (~212 bits) cover SDPB's
default 1e-30 duality-gap tolerances; f32 words carry ~24 bits each, so
TPU runs use proportionally more words (K=9 f32 ~ K=4 f64).

Renormalization follows the certified CAMPARY scheme
(Joldes-Muller-Popescu): magnitude sort -> VecSum (bottom-up two_sum
chain) -> VecSumErrBranch (top-down, emit-on-nonzero-error), the last
step vectorized with predicated one-hot writes.

Word count K is static (part of the array shape), so jitted code
specializes per precision.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

MPArray = jax.Array

# Default precision: 4 f64 words ~ 212 bits ~ 63 decimal digits.
DEFAULT_K = 4

# Format dispatch: float64 arrays are word EXPANSIONS (this module's
# native algorithms, correctly-rounded IEEE doubles on CPU); float32
# arrays are the TPU limb format (mp/limb.py: base-2^9 integer limbs +
# per-element exponent).  The f32-expansion format is retired -- it is
# capped at ~150 bits by f32's exponent range, which cannot express the
# reference's 400-bit/1e-30/1e20-scale production contract
# (`Solver_Parameters.cxx:74-92`); the limb format has no such cap.
from . import limb as _limb  # noqa: E402  (no import cycle: limb is leaf)


def is_limb(a) -> bool:
    return jnp.dtype(a.dtype) == jnp.float32


def _limb_dtype(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float32


def precision_bits_of(dtype, k: int) -> int:
    """Significand bits carried by a k-slot MP array of this dtype."""
    if _limb_dtype(dtype):
        return _limb.precision_bits(k)
    return 53 * k


def lead(a: MPArray):
    """Monotonic float sort key of the value (for argmin/argmax over
    MP arrays; exact for expansions, ~2^-17-resolution for limbs)."""
    if is_limb(a):
        return _limb.lead(a)
    return a[..., 0]


def one_np(k: int, dtype) -> np.ndarray:
    """Host-side constant 1 in the given format."""
    if _limb_dtype(dtype):
        return _limb.one(k)
    out = np.zeros((k,), np.dtype(jnp.dtype(dtype).name))
    out[0] = 1.0
    return out

_SPLITTERS = {
    jnp.dtype(jnp.float64): 134217729.0,  # 2**27 + 1
    jnp.dtype(jnp.float32): 4097.0,       # 2**12 + 1
}

#: significand bits per word, by dtype
WORD_BITS = {
    jnp.dtype(jnp.float64): 53,
    jnp.dtype(jnp.float32): 24,
}


def word_bits(a) -> int:
    return WORD_BITS[jnp.dtype(a.dtype)]


def approx_dtype(dtype):
    """The float dtype `approx` returns for MP arrays of this word
    dtype (identity; exists to make call sites self-documenting)."""
    return jnp.dtype(dtype)


def from_f64_np(x: float, k: int, dtype) -> np.ndarray:
    """Host-side (numpy) exact split of a python float into K words.
    Safe to call eagerly with any default backend (no device ops)."""
    if _limb_dtype(dtype):
        return _limb.from_f64_np(x, k)
    dtype = np.dtype(jnp.dtype(dtype).name)
    words = np.zeros(k, dtype=dtype)
    r = np.float64(x)
    for i in range(min(k, 3)):
        w = dtype.type(r)
        words[i] = w
        r = r - np.float64(w)
        if r == 0:
            break
    return words


# ---------------------------------------------------------------------------
# Error-free transforms
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """s + e == a + b exactly, s = fl(a+b). 6 flops (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, requires |a| >= |b| (or a == 0). 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLITTERS[jnp.dtype(a.dtype)] * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly, p = fl(a*b). Dekker, 17 flops (no FMA on VPU)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# Construction / inspection
# ---------------------------------------------------------------------------

def is_mp(x) -> bool:
    return isinstance(x, jax.Array) and x.ndim >= 1


def nwords(a: MPArray) -> int:
    return a.shape[-1]


def zeros(shape, k: int = DEFAULT_K, dtype=jnp.float64) -> MPArray:
    return jnp.zeros((*shape, k), dtype=dtype)


def from_f64(x, k: int = DEFAULT_K, dtype=jnp.float64) -> MPArray:
    """Promote a float64 array (exact) to a K-word MP array.

    For float32 word dtype the f64 value is split exactly across the
    first words (two f32 words hold 48 of f64's 53 bits; three hold all,
    when k allows).
    """
    if _limb_dtype(dtype):
        return _limb.from_float(x, k)
    x = jnp.asarray(x, dtype=jnp.float64)
    dtype = jnp.dtype(dtype)
    if dtype == jnp.dtype(jnp.float64):
        return jnp.concatenate(
            [x[..., None], jnp.zeros((*x.shape, k - 1), dtype=dtype)], axis=-1
        )
    words = []
    r = x
    for _ in range(min(k, 3)):
        w = r.astype(dtype)
        words.append(w)
        r = r - w.astype(jnp.float64)
    while len(words) < k:
        words.append(jnp.zeros_like(words[0]))
    return jnp.stack(words[:k], axis=-1)


def from_array(words) -> MPArray:
    """Stack a list of word arrays (decreasing significance) into MP layout."""
    return jnp.stack([jnp.asarray(w) for w in words], axis=-1)


def to_f64(a: MPArray):
    """Round an MP array to float64 (sum words from least significant)."""
    if is_limb(a):
        return _limb.fst(a)
    a = a.astype(jnp.float64)
    out = a[..., -1]
    for i in range(a.shape[-1] - 2, -1, -1):
        out = out + a[..., i]
    return out


def approx(a: MPArray):
    """Float approximation in the WORD dtype (no f64 cast, so this is
    safe inside TPU kernels where f64 is a broken emulation).  Sums
    words from least significant; relative error ~ ulp(word dtype),
    which is ample for error-norm reporting and threshold compares."""
    if is_limb(a):
        return _limb.fst(a)
    out = a[..., -1]
    for i in range(a.shape[-1] - 2, -1, -1):
        out = out + a[..., i]
    return out


def const_word(x, k: int, dtype=jnp.float64) -> MPArray:
    """MP constant from a value exactly representable in ONE word
    (small ints, powers of two, word-dtype scalars).  Unlike
    ``from_f64`` this never touches f64 arithmetic, so it is safe in
    TPU kernels with f32 words."""
    if _limb_dtype(dtype):
        return _limb.const_word(x, k)
    x = jnp.asarray(x, dtype)
    return jnp.concatenate(
        [x[..., None], jnp.zeros((*x.shape, k - 1), dtype=dtype)], axis=-1
    )


def fst(a: MPArray):
    """Leading word (a word-dtype approximation of the value)."""
    if is_limb(a):
        return _limb.fst(a)
    return a[..., 0]


def astype_words(a: MPArray, dtype, k: int | None = None) -> MPArray:
    """Convert between word dtypes (e.g. K f64 words -> K' f32 words).

    Exact direction f32->f64 pairs words; f64->f32 splits each f64 word
    into up to 3 f32 words then renormalizes.
    """
    src = jnp.dtype(a.dtype)
    dst = jnp.dtype(dtype)
    if src == dst:
        return a if k is None or k == a.shape[-1] else change_k(a, k)
    if dst == jnp.dtype(jnp.float32):
        k_out = k if k is not None else a.shape[-1] * 3
        words = []
        for i in range(a.shape[-1]):
            r = a[..., i]
            for _ in range(3):
                w = r.astype(jnp.float32)
                words.append(w)
                r = r - w.astype(jnp.float64)
        return renorm_words(words, k_out)
    # f32 words -> f64 words: each f64 word can absorb ~2 f32 words.
    k_out = k if k is not None else (a.shape[-1] + 1) // 2
    words = [a[..., i].astype(jnp.float64) for i in range(a.shape[-1])]
    return renorm_words(words, k_out)


def change_k(a: MPArray, k: int) -> MPArray:
    """Truncate or zero-extend the word count (renormalizing on truncate)."""
    k0 = a.shape[-1]
    if k == k0:
        return a
    if k > k0:
        pad = jnp.zeros((*a.shape[:-1], k - k0), dtype=a.dtype)
        return jnp.concatenate([a, pad], axis=-1)
    return renorm_words([a[..., i] for i in range(k0)], k)


# ---------------------------------------------------------------------------
# Renormalization
# ---------------------------------------------------------------------------

def _vecsum(m: MPArray) -> MPArray:
    """Bottom-up two_sum chain (Shewchuk distillation) over the trailing
    word axis; preserves the exact sum and pushes mass toward the
    leading word.  Implemented as lax.scan so the compiled graph size
    is independent of the word count (unrolled chains of tens of
    two_sums send XLA-CPU compile times superlinear)."""
    w = jnp.moveaxis(m, -1, 0)  # (n, ...)

    def step(s, wi):
        s, e = two_sum(wi, s)
        return s, e

    s0 = w[-1]
    s, errs = jax.lax.scan(step, s0, w[:-1], reverse=True)
    out = jnp.concatenate([s[None], errs], axis=0)
    return jnp.moveaxis(out, 0, -1)


def _vecsum_err_branch(m: MPArray, k: int) -> MPArray:
    """CAMPARY VecSumErrBranch, vectorized with predicated writes.

    Walk top-down accumulating with fast_two_sum; emit a word only when
    the link's error is nonzero (otherwise the running value keeps
    absorbing lower words).  Guarantees a P-nonoverlapping K-word
    result.  The final residual lands in the next free slot; overflow
    mass (more than K significant words) folds into the running value,
    whose low bits are below truncation anyway.
    """
    w = jnp.moveaxis(m, -1, 0)  # (n, ...)
    n = w.shape[0]
    shape = w.shape[1:]
    dtype = w.dtype
    slots0 = jnp.zeros((k,) + shape, dtype)
    j0 = jnp.zeros(shape, dtype=jnp.int32)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (k,) + shape, 0)

    def step(carry, wi):
        slots, j, e = carry
        r, e2 = fast_two_sum(e, wi)
        emit = (e2 != 0.0) & (j < k - 1)
        slots = jnp.where((emit & (j == kidx))[...], r[None], slots)
        j = j + emit.astype(jnp.int32)
        e = jnp.where(emit, e2, r)
        return (slots, j, e), None

    (slots, j, e), _ = jax.lax.scan(step, (slots0, j0, w[0]), w[1:])
    slots = jnp.where(j == kidx, e[None], slots)
    return jnp.moveaxis(slots, 0, -1)


def _bitonic_merge_desc(m: MPArray) -> MPArray:
    """Sort a |.|-bitonic sequence (descending-then-ascending along the
    last axis) into descending-|.| order with a static bitonic merge
    network: log2(n) stages of vectorized compare-exchange, no runtime
    argsort.  n must be a power of two.

    Each stage accesses its compare partner via reshape + reverse of
    the stride-``d`` pair axis -- NOT via a gather on ``idx ^ d``: the
    gather+concatenate pattern crashes the TPU fusion emitter inside
    larger fusions (XLA `Check failed: window.pad_low[i] == 0`,
    observed on v5e)."""
    n = m.shape[-1]
    assert n & (n - 1) == 0, n
    lead = m.shape[:-1]
    d = n // 2
    while d >= 1:
        r = m.reshape(*lead, n // (2 * d), 2, d)
        pm = r[..., ::-1, :]                    # partner across the pair axis
        ordered = jnp.abs(r[..., 0:1, :]) >= jnp.abs(r[..., 1:2, :])
        # lo keeps max iff ordered; hi keeps min iff ordered
        m = jnp.where(ordered, r, pm).reshape(*lead, n)
        d //= 2
    return m


def merge_desc(a: MPArray, b: MPArray) -> MPArray:
    """Merge two descending-|.| word sequences into one fully
    descending-|.| sequence via a bitonic merge (static network, no
    argsort).  Zero-pads to a power of two; the zeros sort to the end
    and are harmless to VecSum.

    The bitonic input [a desc | zeros | b asc] is assembled by
    stacking width-1 word slices, NOT by concatenating the three
    multi-word parts: a multi-operand concatenate at a nonzero offset
    inside a large fusion crashes the TPU fusion emitter (XLA
    `Check failed: window.pad_low[i] == 0 (11 vs. 0)`, observed on
    v5e with the offset-11 operand of the K=5 merge)."""
    na, nb = a.shape[-1], b.shape[-1]
    n = 1 << (na + nb - 1).bit_length()
    pad = n - na - nb
    z = jnp.zeros(a.shape[:-1], a.dtype)
    parts = ([a[..., i] for i in range(na)] + [z] * pad +
             [b[..., nb - 1 - i] for i in range(nb)])
    return _bitonic_merge_desc(jnp.stack(parts, axis=-1))


def renorm_words(words: Sequence, k: int, sort: bool = True,
                 passes: int = 1) -> MPArray:
    """Renormalize word arrays into a K-word nonoverlapping expansion.

    ``words`` is a list of word arrays or a single stacked array with
    the word axis last.  ``sort=False`` skips the magnitude sort when
    the caller guarantees (approximately) decreasing-magnitude order;
    ``passes=2`` runs the VecSum distillation twice, which recovers
    near-sorted accuracy for interleaved two-expansion merges without
    the cost of a runtime sort.
    """
    if isinstance(words, jax.Array):
        m = words
    else:
        ws = [jnp.asarray(w) for w in words]
        if len(ws) == 1:
            pad = [jnp.zeros_like(ws[0])] * (k - 1)
            return jnp.stack(ws + pad, axis=-1)
        if len(set(w.shape for w in ws)) > 1:
            ws = list(jnp.broadcast_arrays(*ws))
        m = jnp.stack(ws, axis=-1)
    if m.shape[-1] == 1:
        pad = jnp.zeros(m.shape[:-1] + (k - 1,), m.dtype)
        return jnp.concatenate([m, pad], axis=-1)
    if sort:
        order = jnp.argsort(-jnp.abs(m), axis=-1)
        m = jnp.take_along_axis(m, order, axis=-1)
    for _ in range(passes):
        m = _vecsum(m)
    return _vecsum_err_branch(m, k)


# ---------------------------------------------------------------------------
# Addition / subtraction
# ---------------------------------------------------------------------------

def add(a: MPArray, b: MPArray) -> MPArray:
    """MP + MP (word counts must match)."""
    if is_limb(a):
        return _limb.add(a, b)
    k = a.shape[-1]
    assert b.shape[-1] == k, (a.shape, b.shape)
    if k == 1:
        return (a[..., 0] + b[..., 0])[..., None]
    if k == 2:
        # AccurateDWPlusDW (Joldes-Muller-Popescu, rel err ~ 3u^2).
        s, e = two_sum(a[..., 0], b[..., 0])
        t, te = two_sum(a[..., 1], b[..., 1])
        e = e + t
        s, e = fast_two_sum(s, e)
        e = e + te
        s, e = fast_two_sum(s, e)
        return jnp.stack([s, e], axis=-1)
    # Exact descending merge of the two (already descending) word
    # streams via a static bitonic network -- same accuracy as the
    # argsort path at a fraction of the cost on TPU.
    m = merge_desc(a, b)
    return renorm_words(m, k, sort=False)


def add_f64(a: MPArray, x) -> MPArray:
    """MP + plain float array (x exact in the word dtype)."""
    if is_limb(a):
        return _limb.add_float(a, x)
    k = a.shape[-1]
    x = jnp.broadcast_to(jnp.asarray(x, a.dtype), a.shape[:-1])
    if k == 1:
        return (a[..., 0] + x)[..., None]
    return renorm_words([a[..., i] for i in range(k)] + [x], k)


def neg(a: MPArray) -> MPArray:
    return -a


def sub(a: MPArray, b: MPArray) -> MPArray:
    return add(a, -b)


# ---------------------------------------------------------------------------
# Multiplication
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _mul_order(k: int):
    """Static gather indices selecting the contributing partial
    products of an expansion product, ordered by significance level.

    The flattened word layout is [p (k*k), e (k*k)]; p[i,j] has level
    i+j, e[i,j] level i+j+1.  Levels > k are dropped (below the
    truncated result's last word); level == k keeps only the value
    part.  Returns int indices into the 2*k*k concatenation.
    """
    lvl_p = (np.arange(k)[:, None] + np.arange(k)[None, :]).ravel()
    lvl_e = lvl_p + 1
    lvl = np.concatenate([lvl_p, lvl_e])
    keep = np.nonzero(lvl <= k)[0]
    order = keep[np.argsort(lvl[keep], kind="stable")]
    return tuple(order.tolist())


def mul(a: MPArray, b: MPArray) -> MPArray:
    """MP * MP, truncated product (error O(2^-wK) relative).

    All k^2 partial products run through ONE vectorized two_prod on a
    (..., k, k) grid (graph size O(1) in k); the contributing terms are
    then gathered in STATIC significance-level order (p[i,j] level i+j,
    e one lower), so renormalization needs no runtime sort -- the
    level-ordered sequence is already approximately decreasing, which
    is what VecSum/VecSumErrBranch need.
    """
    if is_limb(a):
        return _limb.mul(a, b)
    k = a.shape[-1]
    assert b.shape[-1] == k, (a.shape, b.shape)
    if k == 1:
        return (a[..., 0] * b[..., 0])[..., None]
    if k == 2:
        p, e = two_prod(a[..., 0], b[..., 0])
        e = e + (a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0])
        p, e = fast_two_sum(p, e)
        return jnp.stack([p, e], axis=-1)
    p, e = two_prod(a[..., :, None], b[..., None, :])  # (..., k, k)
    words = jnp.concatenate(
        [p.reshape(*p.shape[:-2], k * k), e.reshape(*e.shape[:-2], k * k)],
        axis=-1)
    order = jnp.asarray(np.array(_mul_order(k)))
    return renorm_words(words[..., order], k, sort=False)


def mul_f64(a: MPArray, x) -> MPArray:
    """MP * plain float array (x treated as exact in the word dtype)."""
    if is_limb(a):
        return _limb.mul_float(a, x)
    k = a.shape[-1]
    x = jnp.broadcast_to(jnp.asarray(x, a.dtype), a.shape[:-1])
    if k == 1:
        return (a[..., 0] * x)[..., None]
    # vectorized: exact two_prod for words 0..k-2, value-only for k-1;
    # static level interleave [p0, p1, e0, p2, e1, ...] (p_i level i,
    # e_i level i+1) keeps the sequence decreasing without a sort
    p, e = two_prod(a, x[..., None])
    order = np.empty(2 * k - 1, dtype=np.int64)
    order[0] = 0
    order[1::2] = np.arange(1, k)            # p_1 .. p_{k-1}
    order[2::2] = k + np.arange(k - 1)       # e_0 .. e_{k-2}
    words = jnp.concatenate([p, e[..., :-1]], axis=-1)
    return renorm_words(words[..., jnp.asarray(order)], k, sort=False)


def mul_scalar(a: MPArray, s) -> MPArray:
    """Multiply by a python/f64 scalar or an MP scalar."""
    if is_mp_scalar_like(s, a):
        return mul(a, jnp.broadcast_to(s, a.shape))
    return mul_f64(a, s)


def is_mp_scalar_like(s, a) -> bool:
    return isinstance(s, jax.Array) and s.ndim >= 1 and s.shape[-1] == a.shape[-1]


def mul_pow2(a: MPArray, c) -> MPArray:
    """Exact multiply by a power of two (no renormalization needed)."""
    if is_limb(a):
        return _limb.mul_pow2(a, c)
    return a * jnp.asarray(c, a.dtype)


# ---------------------------------------------------------------------------
# Division / reciprocal / sqrt
# ---------------------------------------------------------------------------

def div(a: MPArray, b: MPArray) -> MPArray:
    """MP / MP by long division (K+1 quotient terms, cf. QD library).
    The quotient-digit recurrence is a lax.scan so the compiled graph
    is O(1) in K."""
    if is_limb(a):
        return _limb.div(a, b)
    k = a.shape[-1]
    if k == 1:
        return (a[..., 0] / b[..., 0])[..., None]
    b0 = b[..., 0]

    def step(r, _):
        qi = r[..., 0] / b0
        return sub(r, mul_f64(b, qi)), qi

    _, q_words = jax.lax.scan(step, a, None, length=k + 1)
    q = jnp.moveaxis(q_words, 0, -1)  # (..., k+1)
    return renorm_words(q, k, sort=False)


def recip(b: MPArray) -> MPArray:
    one = const_word(jnp.ones(b.shape[:-1], b.dtype), b.shape[-1],
                     dtype=b.dtype)
    return div(one, b)


def sqrt_rsqrt(a: MPArray):
    """(sqrt(a), 1/sqrt(a)); the converged Newton iterate is the
    full-precision rsqrt, free of charge (see limb.sqrt_rsqrt)."""
    if is_limb(a):
        return _limb.sqrt_rsqrt(a)
    k = a.shape[-1]
    if k == 1:
        return jnp.sqrt(a), jax.lax.rsqrt(a)
    y0 = jax.lax.rsqrt(a[..., 0])
    y = _seed(y0, k)
    half = 0.5
    # Each Newton step doubles correct bits: y <- y + y*(1 - a*y^2)/2.
    # fori_loop keeps the graph size independent of the step count.
    n_steps = max(1, (k * word_bits(a) // (word_bits(a) - 3)).bit_length())

    def newton(_, y):
        ay2 = mul(a, mul(y, y))
        corr = mul_pow2(mul(y, add_f64(-ay2, 1.0)), half)
        return add(y, corr)

    y = jax.lax.fori_loop(0, n_steps, newton, y)
    s = mul(a, y)
    # Heron correction: s <- s + (a - s^2) * y / 2.
    s = add(s, mul_pow2(mul(sub(a, mul(s, s)), y), half))
    return s, y


def sqrt(a: MPArray) -> MPArray:
    """MP sqrt via Newton on 1/sqrt + one Heron correction.

    Negative inputs produce NaN (propagated), mirroring the reference's
    treatment of failed Cholesky as a precision error."""
    return sqrt_rsqrt(a)[0]


def _seed(w0, k):
    """First-word seed as a K-word MP array (for non-f64 word dtypes)."""
    return jnp.concatenate(
        [w0[..., None], jnp.zeros((*w0.shape, k - 1), dtype=w0.dtype)], axis=-1
    )


# ---------------------------------------------------------------------------
# Comparisons / elementwise utilities
# ---------------------------------------------------------------------------

def abs_(a: MPArray) -> MPArray:
    """|a| via sign of the leading word (valid for normalized expansions)."""
    if is_limb(a):
        return _limb.abs_(a)
    sign = jnp.where(a[..., :1] < 0, -1.0, 1.0).astype(a.dtype)
    return a * sign


def cmp_lt(a: MPArray, b: MPArray):
    if is_limb(a):
        return _limb.cmp_lt(a, b)
    d = sub(a, b)
    return d[..., 0] < 0


def cmp_leq(a: MPArray, b: MPArray):
    if is_limb(a):
        return _limb.cmp_leq(a, b)
    d = sub(a, b)
    return d[..., 0] <= 0


def where(pred, a: MPArray, b: MPArray) -> MPArray:
    return jnp.where(pred[..., None], a, b)


def max_(a: MPArray, b: MPArray) -> MPArray:
    return where(cmp_lt(a, b), b, a)


def min_(a: MPArray, b: MPArray) -> MPArray:
    return where(cmp_lt(a, b), a, b)


def max_abs(a: MPArray, axes=None):
    """max |a| over the given batch axes (all by default).

    Argmax on the leading word picks the winner (valid for normalized
    expansions: word 0 dominates; ties differ below one ulp, which is
    irrelevant for the threshold comparisons this feeds)."""
    if is_limb(a):
        return _limb.max_abs(a, axes)
    aa = abs_(a)
    if axes is None:
        axes = tuple(range(a.ndim - 1))
    axes = tuple(ax % (a.ndim - 1) for ax in axes)
    if axes == tuple(range(a.ndim - 1)):
        flat = aa.reshape((-1, a.shape[-1]))
        idx = jnp.argmax(flat[:, 0])
        return flat[idx]
    # subset of batch axes: move reduced axes to the front, flatten,
    # take_along_axis with the leading-word argmax
    nb = a.ndim - 1
    keep = tuple(ax for ax in range(nb) if ax not in axes)
    perm = axes + keep + (nb,)
    m = jnp.transpose(aa, perm)
    red = 1
    for ax in axes:
        red *= a.shape[ax]
    m = m.reshape((red,) + m.shape[len(axes):])  # (red, *keep, K)
    idx = jnp.argmax(m[..., 0], axis=0)
    return jnp.take_along_axis(m, idx[None, ..., None], axis=0)[0]


def sum_(a: MPArray, axis=0) -> MPArray:
    """MP sum-reduce along a batch axis via a binary tree of MP adds."""
    if axis < 0:
        axis += a.ndim - 1
    n = a.shape[axis]
    if n == 1:
        return jnp.take(a, 0, axis=axis)
    a = jnp.moveaxis(a, axis, 0)
    while a.shape[0] > 1:
        m = a.shape[0]
        half = m // 2
        lo, hi = a[:half], a[half : 2 * half]
        merged = add(lo, hi)
        if m % 2:
            merged = jnp.concatenate([merged, a[2 * half : 2 * half + 1]], axis=0)
        a = merged
    return a[0]


def dot(a: MPArray, b: MPArray, axis=0) -> MPArray:
    """MP dot product along a batch axis."""
    return sum_(mul(a, b), axis=axis)
