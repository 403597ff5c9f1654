"""TPU-native arbitrary-precision arithmetic: base-2^9 integer limbs
with a per-element exponent.

Why this format exists
----------------------
The f32-expansion format (mp/core.py with float32 words) is capped at
~150 bits by f32's EXPONENT range: a nonoverlapping expansion's k-th
word sits ~24k bits below the leading word, and words below 2^-149
underflow.  SDPB's production contract (`--precision 400..1024`,
thresholds 1e-30, `initialMatrixScale 1e20` --
`src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:74-92`) needs
hundreds of significand bits on values spanning ~1e-60..1e+40, which no
single-f32-exponent representation can hold.  This module replaces GMP
`El::BigFloat` on the TPU the way the hardware wants it done: integer
limbs stored in f32 and computed with plain f32 multiply-adds (the
VPU's fastest correctly-rounded ops, kept exact by bounding every
intermediate below 2^24), plus an explicit per-element exponent, so
precision and dynamic range are both effectively unbounded.

Representation
--------------
An array of shape (..., 1+L), float32:

  slot 0   exponent code x0, with  e = |x0| - EOFF  in LIMB units
  slot i   limb l_i, an integer-valued float, balanced: |l_i| <~ 270

  value = (sum_{i=1..L} l_i * BETA^(1-i)) * BETA^e,    BETA = 2^9

Normalized arrays have l_1 != 0 (or all limbs zero => value 0).
Precision ~ 9*(L-1)+1 bits; range BETA^(+-EOFF) ~ 10^(+-44000).

The encoding is chosen so the raw-array idioms used across the solver
remain VALID without knowing the format:

  -a                    negates every slot; |x0| is sign-invariant and
                        the limbs negate, so the value negates.
  a * sign (+-1.0)      same.
  jnp.where(m, a, 0.0)  the all-zero vector is a canonical zero.
  zeros_like / concatenate / dynamic_update_slice   as usual.

NaN/Inf: non-finite limbs propagate through the arithmetic, and every
renormalization folds `0 * sum(limbs)` into the exponent slot, so the
solver's `isfinite(x[..., 0])` poisoning checks see them.

Why integer limbs and not float expansions: limb products (|l| <= ~270)
and their convolution sums stay below 2^24, so f32 FMAs are EXACT -- no
error-free transforms, no renormalization sorts -- and the limbs double
as ready-made digits for the int8-MXU CRT matmul pipeline
(ops/exact.py), the TPU redesign of the reference's `bigint_syrk`
(`src/sdp_solve/SDP_Solver/run/bigint_syrk/Readme.md`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

B = 9                    # bits per limb
BETA = 1 << B            # limb base, 512
HALF_BETA = BETA // 2
EOFF = 16384             # exponent code offset; e = |x0| - EOFF
_INV_BETA = np.float32(1.0 / BETA)
_ZERO_E = -(10 ** 7)     # effective exponent of a zero operand

MPArray = jax.Array

# While True (set by ops/limb_kernels.py around Pallas kernel-body
# tracing), the arithmetic avoids constructs Mosaic cannot lower:
#   - mul's chunked convolution unrolls to a static loop instead of a
#     lax.scan (Mosaic scans are carry-only, no xs/ys);
#   - lane-axis shifts/pads become exact 0/1-matrix contractions
#     instead of slice+concatenate (Mosaic cannot concatenate
#     offset-layout lane slices).
_KERNEL_MODE = False


class kernel_mode:
    def __enter__(self):
        global _KERNEL_MODE
        self._prev = _KERNEL_MODE
        _KERNEL_MODE = True

    def __exit__(self, *exc):
        global _KERNEL_MODE
        _KERNEL_MODE = self._prev


unrolled_mul = kernel_mode          # historical alias


def _lane_take(x, idx):
    """x[..., idx] for a TRACED index, as an exact one-hot f32
    contraction (no value-level dynamic_slice exists in Mosaic)."""
    n = x.shape[-1]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
          == idx).astype(x.dtype)[0]
    return jnp.sum(x * oh, axis=-1)


def _lane_place(x, n_out: int, off: int):
    """out[..., j] = x[..., j - off] (zero elsewhere): the lane-axis
    shift/pad as an exact 0/1 contraction.  Values are integer-valued
    f32 (< 2^24) and each output is a single selected input, so the
    matmul is exact.  The shift matrix is built from iotas IN the
    trace: Pallas kernels cannot capture array constants."""
    n_in = x.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
    mat = (c - r == off).astype(jnp.float32)
    # HIGHEST precision: the default MXU f32 path rounds operands to
    # bf16, which destroys limb exactness (limbs need 10+ mantissa
    # bits); each output selects exactly one input, so at full f32
    # precision the contraction is exact.
    return jax.lax.dot_general(
        x, mat, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def n_limbs(a) -> int:
    return a.shape[-1] - 1


def _broadcast_pair(a, b):
    """Broadcast two limb arrays over their batch (leading) dims."""
    if a.shape == b.shape:
        return a, b
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    return (jnp.broadcast_to(a, batch + a.shape[-1:]),
            jnp.broadcast_to(b, batch + b.shape[-1:]))


def slots_for_precision(precision_bits: int) -> int:
    """Trailing-axis size (1 exponent slot + limbs) holding at least
    ``precision_bits`` significant bits plus one guard limb."""
    return 1 + max(3, -(-int(precision_bits) // B) + 1)


def precision_bits(k_slots: int) -> int:
    """Guaranteed significand bits of a (1+L)-slot array."""
    return B * (k_slots - 2) + 1


# ---------------------------------------------------------------------------
# Internal pieces
# ---------------------------------------------------------------------------

def _split(a):
    """(exponent e int32, limbs f32 (..., L))."""
    e = (jnp.abs(a[..., 0]) - EOFF).astype(jnp.int32)
    return e, a[..., 1:]


def _build(e, limbs):
    """Assemble the canonical array: clamps the exponent, canonicalizes
    zero (all-zero limbs -> x0 = 0), folds limb NaN/Inf into slot 0."""
    s = jnp.sum(limbs, axis=-1)
    zero = _is_zero_vec(limbs)
    x0 = (jnp.clip(e, -EOFF, EOFF - 1) + EOFF).astype(limbs.dtype) + 0.0 * s
    x0 = jnp.where(zero, 0.0 * s, x0)
    if _KERNEL_MODE:
        L = limbs.shape[-1]
        return (_lane_place(x0[..., None], 1 + L, 0)
                + _lane_place(limbs, 1 + L, 1))
    return jnp.concatenate([x0[..., None], limbs], axis=-1)


def _shift_sliced(limbs, amount: int, left: bool):
    if _KERNEL_MODE:
        return _lane_place(limbs, limbs.shape[-1],
                           -amount if left else amount)
    z = jnp.zeros(limbs.shape[:-1] + (amount,), limbs.dtype)
    if left:
        return jnp.concatenate([limbs[..., amount:], z], axis=-1)
    return jnp.concatenate([z, limbs[..., :-amount]], axis=-1)


def _barrel_shift(limbs, s, left: bool):
    """Per-element limb shift by s >= 0 positions (zero fill), as
    log2(L) conditional static shifts -- no gathers (TPU-friendly)."""
    n = limbs.shape[-1]
    s = jnp.clip(s, 0, n)
    full = s >= n
    bit = 1
    while bit < n:
        take = (s & bit) != 0
        limbs = jnp.where(_em(take),
                          _shift_sliced(limbs, bit, left), limbs)
        bit <<= 1
    return jnp.where(_em(full), jnp.zeros_like(limbs), limbs)


def _carry(limbs, passes: int):
    """Carry-propagate toward the leading limb; inputs must be f32-exact
    (|l| < 2^24).  Each pass: l = BETA*q + r with r balanced, then
    l_i <- r_i + q_{i+1}.  Callers provide head slots so no carry
    escapes slot 0."""
    for _ in range(passes):
        q = jnp.round(limbs * _INV_BETA)
        r = limbs - q * BETA
        if _KERNEL_MODE:
            limbs = r + _lane_place(q, q.shape[-1], -1)
        else:
            limbs = r + jnp.concatenate(
                [q[..., 1:], jnp.zeros_like(q[..., :1])], axis=-1)
    return limbs


def _em(m):
    """Expand a bool mask with a trailing size-1 axis, Mosaic-safely:
    i1 minor-dim reshapes have no Pallas TPU lowering, so widen to f32
    first and compare after the reshape."""
    return m.astype(jnp.float32)[..., None] != 0.0


def _is_zero_vec(limbs):
    """all(limbs == 0) along the last axis, as an f32 max reduction:
    Mosaic (Pallas TPU) lowers f32 reductions everywhere, while bool
    and/or reductions (and argmax) hit unsupported-type paths."""
    return jnp.max(jnp.abs(limbs), axis=-1) == 0.0


def _leading_zeros(limbs):
    n = limbs.shape[-1]
    nz = limbs != 0.0
    # first-nonzero index as a masked f32 min reduction (argmax has no
    # robust Mosaic lowering)
    idx = jax.lax.broadcasted_iota(jnp.int32, limbs.shape,
                                   limbs.ndim - 1).astype(jnp.float32)
    z = jnp.min(jnp.where(nz, idx, np.float32(n)),
                axis=-1).astype(jnp.int32)
    return z, z < n


def _renorm(e_top, ext, L_out: int, passes: int):
    """Canonicalize: carry-propagate ``ext`` (slot j has weight
    BETA^(e_top - j)), shift out leading zeros, truncate to L_out
    limbs, rebuild.  ``ext`` must include enough zero head slots that
    carries cannot escape slot 0."""
    ext = _carry(ext, passes)
    z, any_nz = _leading_zeros(ext)
    ext = _barrel_shift(ext, z, left=True)
    n = ext.shape[-1]
    if n < L_out:
        ext = jnp.concatenate(
            [ext, jnp.zeros(ext.shape[:-1] + (L_out - n,), ext.dtype)],
            axis=-1)
    elif n > L_out:
        ext = ext[..., :L_out]
    e = jnp.asarray(e_top, jnp.int32) - z
    under = (e < -EOFF) & any_nz
    over = (e >= EOFF) & any_nz
    ext = jnp.where(_em(under), 0.0, ext)
    ext = jnp.where(_em(over),
                    jnp.where(ext[..., :1] > 0, jnp.inf, -jnp.inf), ext)
    return _build(e, ext)


def _heads(limbs, n_head: int):
    if _KERNEL_MODE:
        return _lane_place(limbs, limbs.shape[-1] + n_head, n_head)
    return jnp.concatenate(
        [jnp.zeros(limbs.shape[:-1] + (n_head,), limbs.dtype), limbs],
        axis=-1)


def _offset_add(acc, contrib, off: int):
    """acc += contrib placed at static limb offset ``off`` (contrib has
    acc's trailing size minus off)."""
    if off == 0:
        return acc + contrib
    if _KERNEL_MODE:
        return acc + _lane_place(contrib, acc.shape[-1], off)
    z = jnp.zeros(contrib.shape[:-1] + (off,), acc.dtype)
    return acc + jnp.concatenate([z, contrib], axis=-1)


def _mant3(limbs):
    """f32 mantissa approximation from the top three limbs (relative
    error < 2^-17 for normalized input)."""
    m = limbs[..., 0]
    if limbs.shape[-1] > 1:
        m = m + limbs[..., 1] * _INV_BETA
    if limbs.shape[-1] > 2:
        m = m + limbs[..., 2] * (_INV_BETA * _INV_BETA)
    return m


def _float_limbs(x):
    """Split an f32 array exactly: x = (sum_t l_t BETA^-t) * BETA^e_x
    with 4 integer limbs (t = 1..4).  Returns (e_x int32, limbs
    (..., 4)); non-finite/zero x give zero limbs (callers special-case).
    """
    x = jnp.asarray(x, jnp.float32)
    m, ex = jnp.frexp(x)
    ok = jnp.isfinite(x) & (x != 0.0)
    m = jnp.where(ok, m, 0.0)
    e_x = -((-ex) // B)                          # ceil(ex / B)
    r = (B * e_x - ex).astype(m.dtype)           # 0..B-1
    u = m * jnp.exp2(-r)                         # |u| in (2^-10, 1)
    ls = []
    for _ in range(4):
        u = u * BETA
        li = jnp.round(u)
        ls.append(li)
        u = u - li
    return jnp.where(ok, e_x, 0), jnp.stack(ls, axis=-1)


# ---------------------------------------------------------------------------
# Construction / inspection
# ---------------------------------------------------------------------------

def zeros(shape, k_slots: int) -> MPArray:
    return jnp.zeros((*shape, k_slots), dtype=jnp.float32)


def from_float(x, k_slots: int) -> MPArray:
    """Exact conversion of a float array into limb format (traced-safe;
    f32 values exactly, f64 hosts values via their f32 rounding unless
    x64 is enabled on CPU where frexp keeps 53 bits across 7 limbs)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        # frexp first so the three f32 parts of the mantissa are all
        # normal (a direct 3-way split hits f32 subnormals below
        # ~2^-100 and overflows above 2^128), then apply the exponent
        # exactly in limb units.
        m64, e64 = jnp.frexp(x)
        hi = m64.astype(jnp.float32)
        r = m64 - hi.astype(jnp.float64)
        mid = r.astype(jnp.float32)
        lo = (r - mid.astype(jnp.float64)).astype(jnp.float32)
        out = add(add(from_float(hi, k_slots), from_float(mid, k_slots)),
                  from_float(lo, k_slots))
        out = scale_pow2_bits(out, e64.astype(jnp.int32))
        bad = ~jnp.isfinite(x)
        return jnp.where(_em(bad),
                         from_float(x.astype(jnp.float32), k_slots), out)
    x = x.astype(jnp.float32)
    e_x, ls = _float_limbs(x)
    ext = _heads(ls, 1)
    # limb t=1 sits at ext slot 1 with weight BETA^(e_x - 1)
    out = _renorm(e_x, ext, k_slots - 1, passes=1)
    # +-inf gets a finite exponent slot and an inf leading limb so that
    # fst/lead/compares see a proper infinity (the solver's lambda_min
    # accumulator starts at +inf); NaN poisons every slot.
    isinf = jnp.isinf(x)
    # build via a slot mask, not .at[].set: static scatters have no
    # Mosaic lowering inside Pallas kernel bodies
    slot = jax.lax.broadcasted_iota(jnp.int32, x.shape + (k_slots,),
                                    x.ndim)
    infv = jnp.where(slot == 0, np.float32(2 * EOFF - 1),
                     jnp.where(slot == 1, x[..., None], 0.0))
    out = jnp.where(_em(isinf), infv, out)
    nanm = jnp.isnan(x)
    return jnp.where(_em(nanm), jnp.nan, out)


def const_word(x, k_slots: int) -> MPArray:
    return from_float(x, k_slots)


def one(k_slots: int) -> np.ndarray:
    out = np.zeros((k_slots,), np.float32)
    out[0] = EOFF            # e = 0
    out[1] = 1.0
    return out


def from_f64_np(x: float, k_slots: int) -> np.ndarray:
    """Host-side exact conversion of a python float."""
    return from_words_np(np.asarray(np.float64(x))[None], k_slots)


def from_words_np(words, k_slots: int) -> np.ndarray:
    """Host-side exact conversion: f64-word EXPANSION arrays (..., K)
    -> limb arrays (..., k_slots).  This is how decimal-parsed problem
    data (mp/decimal.py produces f64 words) enters the TPU limb path."""
    words = np.asarray(words, dtype=np.float64)
    lead_shape = words.shape[:-1]
    K = words.shape[-1]
    L = k_slots - 1
    flat = words.reshape(-1, K)
    n = flat.shape[0]
    m, ex = np.frexp(flat)
    m53 = np.round(m * 2.0 ** 53).astype(np.int64)      # |m53| < 2^53
    lw = ex - 53                                        # word = m53*2^lw
    finite = np.isfinite(flat).all(axis=1)
    nzw = flat != 0.0
    any_nz = nzw.any(axis=1)
    hi_bit = np.where(nzw, ex, _ZERO_E).max(axis=1)
    e_top = -(-(hi_bit + 1) // B)                       # |value| < B^e_top
    # ext slot j (0-based, head at j=0) has weight BETA^(e_top - j);
    # limb slots j>=1 cover bits [B*(e_top-j), B*(e_top-j+1))
    n_ext = L + 3
    acc = np.zeros((n, n_ext), dtype=np.int64)
    sgn = np.sign(m53)
    mag = np.abs(m53)
    for w in range(K):
        if not np.any(nzw[:, w]):
            continue
        for j in range(1, n_ext):
            sh = (B * (e_top - j)) - lw[:, w]           # limb LSB - word LSB
            v = np.where(
                (sh > -B) & (sh < 53),
                np.where(sh >= 0,
                         mag[:, w] >> np.clip(sh, 0, 62),
                         mag[:, w] << np.clip(-sh, 0, B - 1)) % BETA,
                0)
            acc[:, j] += sgn[:, w] * v
    for _ in range(3):                                  # balanced carries
        q = (acc + HALF_BETA) >> B
        acc = acc - (q << B)
        acc[:, :-1] += q[:, 1:]
    nz = acc != 0
    first = np.where(nz.any(axis=1), nz.argmax(axis=1), n_ext)
    out_l = np.zeros((n, L), dtype=np.float32)
    for i in range(n):
        z = first[i]
        take = acc[i, z : z + L]
        out_l[i, : take.shape[0]] = take
    e = np.where(any_nz, e_top - first, 0)
    out = np.zeros((n, k_slots), dtype=np.float32)
    out[:, 1:] = out_l
    out[:, 0] = np.where(any_nz, e + EOFF, 0.0)
    bad = ~finite
    if np.any(bad):
        out[bad] = np.nan
        out[bad, 1] = np.where(np.isinf(flat[bad, 0]), flat[bad, 0],
                               np.nan).astype(np.float32)
    return out.reshape(*lead_shape, k_slots)


def to_mpf(a, ctx=None):
    """Exact mpmath value of a limb SCALAR (host)."""
    import mpmath

    a = np.asarray(a, dtype=np.float64)
    assert a.ndim == 1, a.shape
    if ctx is None:
        ctx = mpmath.mp.clone()
        ctx.prec = B * (a.shape[0] + 8)
    if not np.isfinite(a).all():
        if np.isnan(a[1:]).any() or np.isnan(a[0]):
            return ctx.mpf("nan")
        return ctx.mpf("+inf") if a[1] > 0 else ctx.mpf("-inf")
    e = int(abs(a[0])) - EOFF
    L = a.shape[0] - 1
    mant = 0
    for l in a[1:]:
        mant = mant * BETA + int(l)
    if mant == 0:
        return ctx.mpf(0)
    return ctx.mpf(mant) * ctx.mpf(2) ** (B * (e - L + 1))


def fst(a: MPArray):
    """f32 approximation (saturates to +-inf/0 outside f32 range)."""
    e, limbs = _split(a)
    m = _mant3(limbs)
    eb = B * e
    h1 = jnp.clip(eb // 2, -148, 127)
    h2 = jnp.clip(eb - h1, -148, 127)
    return m * jnp.exp2(h1.astype(m.dtype)) * jnp.exp2(h2.astype(m.dtype))


approx = fst


def lead(a: MPArray):
    """Monotonic f32 sort key ~ sign * (log2|value| + OFFSET); exact
    ordering up to ~2^-17 relative value ties.  For argmin/argmax."""
    e, limbs = _split(a)
    m = _mant3(limbs)
    am = jnp.abs(m)
    logv = B * e.astype(m.dtype) + jnp.log2(jnp.maximum(am, 1e-38))
    off = np.float32(2 * EOFF * B + 64)
    key = jnp.sign(m) * (logv + off)
    key = jnp.where(am == 0.0, 0.0, key)
    # propagate NaN mantissas without destroying +-inf keys (a plain
    # `+ 0*m` turns an infinity's key into NaN, and NaN keys win
    # argmin -- which silently selected +inf placeholders over real
    # lambda_min values in the mesh step-length kernel)
    key = jnp.where(jnp.isnan(m), jnp.nan, key)
    # non-finite slot 0 (poisoned / raw-filled values): fall back to
    # the mantissa itself (+-inf/NaN) instead of int-casting garbage
    return jnp.where(jnp.isfinite(a[..., 0]), key, m)


def sign_word(a: MPArray):
    return jnp.sign(a[..., 1])


# ---------------------------------------------------------------------------
# Arithmetic
# ---------------------------------------------------------------------------

def add(a: MPArray, b: MPArray) -> MPArray:
    L = n_limbs(a)
    assert n_limbs(b) == L, (a.shape, b.shape)
    a, b = _broadcast_pair(a, b)
    ea, la = _split(a)
    eb, lb = _split(b)
    za = _is_zero_vec(la)
    zb = _is_zero_vec(lb)
    ea_ = jnp.where(za, _ZERO_E, ea)
    eb_ = jnp.where(zb, _ZERO_E, eb)
    e = jnp.maximum(ea_, eb_)
    la = _barrel_shift(la, e - ea_, left=False)
    lb = _barrel_shift(lb, e - eb_, left=False)
    ext = _heads(la + lb, 1)
    out = _renorm(e + 1, ext, L, passes=1)
    nan = ~(jnp.isfinite(a[..., 0]) & jnp.isfinite(b[..., 0]))
    return jnp.where(_em(nan), _nan_like(out, a, b), out)


def _nan_like(out, *ins):
    """Non-finite result: NaN everywhere, except limb 1 keeps +-inf
    when exactly one operand is an infinity (sign-preserving)."""
    return jnp.full_like(out, jnp.nan)


def neg(a: MPArray) -> MPArray:
    return -a


def sub(a: MPArray, b: MPArray) -> MPArray:
    return add(a, -b)


def mul(a: MPArray, b: MPArray) -> MPArray:
    """Truncated product; relative error < ~2^-(B*(L-1))."""
    L = n_limbs(a)
    assert n_limbs(b) == L, (a.shape, b.shape)
    a, b = _broadcast_pair(a, b)
    G = 2
    ea, la = _split(a)
    eb, lb = _split(b)
    n_out = L + G
    if _KERNEL_MODE:
        lbp = _lane_place(lb, L + G, 0)
    else:
        zpad = jnp.zeros(la.shape[:-1] + (G,), la.dtype)
        lbp = jnp.concatenate([lb, zpad], axis=-1)      # (..., L+G)
    # Chunked Horner-scan convolution: process CHUNK limbs per scan
    # step -- acc <- shift_right_CHUNK(acc) + sum_j la_{c+j} *
    # shift_right_j(lbp).  A scan keeps ONE accumulator live (a fully
    # static L-step loop makes XLA hold O(L) partial buffers -- OOM at
    # production shapes), and chunking divides the number of
    # accumulator HBM sweeps by CHUNK (the scan body's multiply-adds
    # fuse into one kernel; per-limb stepping made the whole solver
    # memory-bound on acc traffic).
    CHUNK = 8
    Lp = -(-L // CHUNK) * CHUNK
    la_t = jnp.moveaxis(la, -1, 0)                      # (L, ...)
    if Lp != L:
        la_t = jnp.concatenate(
            [la_t, jnp.zeros((Lp - L,) + la.shape[:-1], la.dtype)],
            axis=0)
    la_c = la_t.reshape((Lp // CHUNK, CHUNK) + la.shape[:-1])

    def step(acc, chunk):
        if _KERNEL_MODE:
            acc = _lane_place(acc, acc.shape[-1], CHUNK)
        else:
            acc = jnp.concatenate(
                [jnp.zeros(acc.shape[:-1] + (CHUNK,), acc.dtype),
                 acc[..., :-CHUNK]], axis=-1)
        for j in range(CHUNK):
            contrib = chunk[j][..., None] * lbp
            if j:
                if _KERNEL_MODE:
                    contrib = _lane_place(contrib, contrib.shape[-1], j)
                else:
                    contrib = jnp.concatenate(
                        [jnp.zeros(contrib.shape[:-1] + (j,), acc.dtype),
                         contrib[..., :-j]], axis=-1)
            acc = acc + contrib
        return acc, None

    acc0 = jnp.zeros(la.shape[:-1] + (n_out,), la.dtype)
    if _KERNEL_MODE:
        # carry-only fori (Mosaic scans cannot carry xs, and a fully
        # unrolled loop blows the kernel VMEM stack): the chunk limbs
        # are extracted with dynamic one-hot contractions.
        n_chunks = la_c.shape[0]

        def kbody(ci, acc):
            ci = jnp.asarray(ci, jnp.int32)
            acc = _lane_place(acc, n_out, CHUNK)
            c0 = (n_chunks - 1 - ci) * CHUNK
            for j in range(CHUNK):
                aj = _lane_take(la, c0 + j)
                contrib = aj[..., None] * lbp
                if j:
                    contrib = _lane_place(contrib, n_out, j)
                acc = acc + contrib
            return acc

        acc = jax.lax.fori_loop(0, n_chunks, kbody, acc0)
    else:
        acc, _ = jax.lax.scan(step, acc0, la_c, reverse=True)
    ext = _heads(acc, 2)
    out = _renorm(ea + eb + 2, ext, L, passes=3)
    nan = ~(jnp.isfinite(a[..., 0]) & jnp.isfinite(b[..., 0]))
    return jnp.where(_em(nan), _nan_like(out, a, b), out)


def _scalar_operand(a, x):
    """Coerce a float operand to a's batch shape.  Accepts operands
    shaped like the full MP array with a length-1 trailing axis (the
    expansion format's `a * c` broadcast convention)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == a.ndim and x.shape[-1] == 1:
        x = x[..., 0]
    return jnp.broadcast_to(x, a.shape[:-1])


def mul_float(a: MPArray, x) -> MPArray:
    """MP * float array (x treated as exact f32); 4-limb short conv."""
    L = n_limbs(a)
    x = _scalar_operand(a, x)
    ea, la = _split(a)
    e_x, xs = _float_limbs(x)                    # (..., 4)
    n_out = L + 2
    acc = jnp.zeros(la.shape[:-1] + (n_out,), la.dtype)
    if _KERNEL_MODE:
        lap = _lane_place(la, L + 2, 0)
    else:
        lap = jnp.concatenate(
            [la, jnp.zeros(la.shape[:-1] + (2,), la.dtype)], axis=-1)
    for t in range(4):
        if t >= n_out:
            break
        contrib = xs[..., t : t + 1] * lap[..., : n_out - t]
        acc = _offset_add(acc, contrib, t)
    # x limb t (t=0..3 here) has weight BETA^(e_x - 1 - t); a limb i
    # weight BETA^(ea - i); acc slot (i + t) weight BETA^(ea+e_x-1-(i+t))
    out = _renorm(ea + e_x - 1 + 2, _heads(acc, 2), L, passes=3)
    zx = x == 0.0
    out = jnp.where(_em(zx), jnp.zeros_like(out), out)
    nan = ~(jnp.isfinite(a[..., 0]) & jnp.isfinite(x))
    return jnp.where(_em(nan), _nan_like(out, a), out)


def mul_pow2(a: MPArray, c) -> MPArray:
    """Multiply by (an array of) powers of two -- exact."""
    c = np.asarray(c) if not isinstance(c, jax.Array) else c
    if np.ndim(c) == 0 and not isinstance(c, jax.Array) \
            and float(c) == 1.0:
        return a
    return mul_float(a, c)


def _carry_keep_head(limbs, passes: int):
    """Carry pass that treats slot 0 as a wide accumulator: carries out
    of slot 0 are never generated (it absorbs those from slot 1), so no
    value can escape.  Slot 0 must stay below 2^24 by construction."""
    for _ in range(passes):
        q = jnp.round(limbs * _INV_BETA)
        q = jnp.concatenate([jnp.zeros_like(q[..., :1]), q[..., 1:]],
                            axis=-1)
        r = limbs - q * BETA
        limbs = r + jnp.concatenate(
            [q[..., 1:], jnp.zeros_like(q[..., :1])], axis=-1)
    return limbs


def div(a: MPArray, b: MPArray) -> MPArray:
    """Long division with redundant balanced quotient digits.

    Invariant: the remainder stays below ~0.6|M_b| at the current digit
    scale, so quotient digits are bounded by ~0.6*BETA and every f32
    intermediate stays integer-exact (< 2^24)."""
    L = n_limbs(a)
    assert n_limbs(b) == L, (a.shape, b.shape)
    a, b = _broadcast_pair(a, b)
    ea, la = _split(a)
    eb, lb = _split(b)
    bhat = _mant3(lb)
    inv_bhat = jnp.where(bhat == 0.0, jnp.inf, 1.0 / bhat)
    nd = L + 2

    def step(r, _):
        rhat = r[..., 0] + r[..., 1] * _INV_BETA \
            + r[..., 2] * (_INV_BETA * _INV_BETA)
        q = jnp.round(rhat * inv_bhat)
        r = r - q[..., None] * lb
        r = _carry_keep_head(r, 1)
        # shift left one limb, folding the (now small) head down
        head = r[..., 0] * BETA
        r = jnp.concatenate(
            [(r[..., 1] + head)[..., None], r[..., 2:],
             jnp.zeros_like(r[..., :1])], axis=-1)
        return r, q

    _, qd = jax.lax.scan(step, la, None, length=nd)
    qd = jnp.moveaxis(qd, 0, -1)                 # (..., nd)
    # digit q_i (i = 0..nd-1) has weight BETA^(ea - eb - i)
    out = _renorm(ea - eb + 2, _heads(qd, 2), L, passes=3)
    bzero = _is_zero_vec(lb)
    azero = _is_zero_vec(la)
    sgn_a = jnp.sign(la[..., 0])
    slot = jax.lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 1)
    infv = jnp.where(slot == 1,
                     jnp.where(sgn_a < 0, -jnp.inf, jnp.inf)[..., None],
                     jnp.nan)
    out = jnp.where(_em(bzero & ~azero), infv, out)
    out = jnp.where(_em(bzero & azero), jnp.nan, out)
    nan = ~(jnp.isfinite(a[..., 0]) & jnp.isfinite(b[..., 0]))
    return jnp.where(_em(nan), _nan_like(out, a, b), out)


def recip(b: MPArray) -> MPArray:
    return div(from_float(jnp.ones(b.shape[:-1], jnp.float32),
                          b.shape[-1]), b)


def sqrt_rsqrt(a: MPArray):
    """(sqrt(a), 1/sqrt(a)) by Newton on 1/sqrt + one Heron correction
    for the sqrt.  Negative -> NaN; zero -> (0, +inf).

    The converged Newton iterate IS the full-precision reciprocal
    square root, so callers that need to DIVIDE by sqrt(a) (Cholesky
    column scaling, triangular-solve diagonals) get it for free --
    turning a long-division scan per element into one multiply."""
    L = n_limbs(a)
    k_slots = a.shape[-1]
    ea, la = _split(a)
    m = _mant3(la)
    e2 = ea // 2
    rem = ea - 2 * e2                            # 0 or 1
    mm = m * jnp.where(rem == 1, np.float32(BETA), np.float32(1.0))
    y0 = jax.lax.rsqrt(mm)                       # NaN for negative
    y = from_float(y0, k_slots)
    y = scale_limb_exp(y, -e2)
    half = np.float32(0.5)
    n_steps = max(3, int(np.ceil(np.log2(max(2.0, B * L / 11.0)))))

    def newton(_, y):
        ay2 = mul(a, mul(y, y))
        corr = mul_float(mul(y, add_float(-ay2, 1.0)), half)
        return add(y, corr)

    # fori_loop keeps the graph size independent of the step count
    # (matters doubly inside Pallas kernel bodies, where Mosaic's
    # lowering recursion scales with body op count).
    y = jax.lax.fori_loop(0, n_steps, newton, y)
    s = mul(a, y)
    s = add(s, mul_float(mul(sub(a, mul(s, s)), y), half))
    azero = _is_zero_vec(la)
    inf = from_float(jnp.full(a.shape[:-1], jnp.inf, jnp.float32),
                     k_slots)
    return (jnp.where(_em(azero), jnp.zeros_like(s), s),
            jnp.where(_em(azero), inf, y))


def sqrt(a: MPArray) -> MPArray:
    """Newton on 1/sqrt + one Heron correction.  Negative -> NaN."""
    return sqrt_rsqrt(a)[0]


def add_float(a: MPArray, x) -> MPArray:
    return add(a, from_float(_scalar_operand(a, x), a.shape[-1]))


def scale_limb_exp(a: MPArray, d) -> MPArray:
    """a * BETA^d for integer (array) d -- exact, exponent-only."""
    e, limbs = _split(a)
    nz = ~_is_zero_vec(limbs)
    e = jnp.where(nz, e + jnp.asarray(d, jnp.int32), e)
    out = _build(e, limbs)
    nan = ~jnp.isfinite(a[..., 0])
    return jnp.where(_em(nan), a, out)


def scale_pow2_bits(a: MPArray, t) -> MPArray:
    """a * 2^t for integer (array) bit shift t -- exact."""
    t = jnp.asarray(t, jnp.int32)
    t = jnp.broadcast_to(t, a.shape[:-1])
    q = t // B
    r = t - q * B                                # 0..B-1
    e, limbs = _split(a)
    limbs = limbs * jnp.exp2(r.astype(limbs.dtype))[..., None]
    out = _renorm(e + q + 1, _heads(limbs, 1), n_limbs(a), passes=1)
    nan = ~jnp.isfinite(a[..., 0])
    return jnp.where(_em(nan), _nan_like(out, a), out)


def exponent_bits(a: MPArray):
    """int32 upper bound: |value| < 2^exponent_bits (for the CRT column
    normalization, the reference's `Matrix_Normalizer.cxx` role)."""
    e, limbs = _split(a)
    zero = _is_zero_vec(limbs)
    return jnp.where(zero, _ZERO_E, B * (e + 1))


# ---------------------------------------------------------------------------
# Comparisons / elementwise utilities
# ---------------------------------------------------------------------------

def abs_(a: MPArray) -> MPArray:
    s = jnp.where(a[..., 1:2] < 0, -1.0, 1.0).astype(a.dtype)
    return a * s


def cmp_lt(a: MPArray, b: MPArray):
    return sub(a, b)[..., 1] < 0


def cmp_leq(a: MPArray, b: MPArray):
    return sub(a, b)[..., 1] <= 0


def max_abs(a: MPArray, axes=None):
    """max |a| over batch axes via the monotonic lead key."""
    aa = abs_(a)
    key = lead(aa)
    if axes is None:
        flat = aa.reshape((-1, a.shape[-1]))
        idx = jnp.argmax(key.reshape(-1))
        return flat[idx]
    nb = a.ndim - 1
    axes = tuple(ax % nb for ax in axes)
    keep = tuple(ax for ax in range(nb) if ax not in axes)
    perm = axes + keep + (nb,)
    m = jnp.transpose(aa, perm)
    red = 1
    for ax in axes:
        red *= a.shape[ax]
    m = m.reshape((red,) + m.shape[len(axes):])
    kk = jnp.transpose(key, axes + keep).reshape(
        (red,) + tuple(a.shape[ax] for ax in keep))
    idx = jnp.argmax(kk, axis=0)
    return jnp.take_along_axis(m, idx[None, ..., None], axis=0)[0]


# ---------------------------------------------------------------------------
# Digitization for the exact integer-MXU pipeline (ops/exact.py)
# ---------------------------------------------------------------------------

def digits_dev(x, shift_bits: int, n_digits: int):
    """Limb array with |value| <= 1 -> balanced int32 base-256 digits
    (..., n_digits), least significant first: digit t covers bits
    [8t, 8t+8) of value * 2^shift_bits.  Integer-exact (the limbs ARE
    base-2^B digits; this re-grids them to base-256)."""
    e, limbs = _split(x)
    L = limbs.shape[-1]
    li = limbs.astype(jnp.int32)
    sgn = jnp.where(li < 0, -1, 1)
    mag = jnp.abs(li)                            # < 2^10
    t8 = 8 * jnp.arange(n_digits, dtype=jnp.int32)
    acc = jnp.zeros(x.shape[:-1] + (n_digits,), jnp.int32)
    for j in range(L):
        # limb j weight BETA^(e-j): its bit 0 sits at grid position
        # shift_bits + B*(e - j)
        p = shift_bits + B * (e - j)
        sh = t8 - p[..., None]                   # (..., D)
        mj = mag[..., j][..., None]
        sj = sgn[..., j][..., None]
        right = jax.lax.shift_right_logical(mj, jnp.clip(sh, 0, 30))
        left = jax.lax.shift_left(mj, jnp.clip(-sh, 0, 7))
        v = jnp.where(sh >= 0, right, left) & 255
        v = jnp.where((sh > B + 1) | (sh <= -8), 0, v)
        acc = acc + sj * v

    def carry_pass(a_, _):
        d = jnp.bitwise_and(a_ + 128, 255) - 128
        cy = jax.lax.shift_right_arithmetic(a_ - d, jnp.asarray(8, a_.dtype))
        a_ = d + jnp.concatenate(
            [jnp.zeros_like(cy[..., :1]), cy[..., :-1]], axis=-1)
        return a_, None

    acc, _ = jax.lax.scan(carry_pass, acc, None, length=3)
    return acc


def planes_to_limb(planes, ref_bits: int, k_slots: int):
    """Carry-normalized balanced base-256 digit planes (..., P,
    least-significant-first; |plane| < 2^13) -> limb array of
    value * 2^-ref_bits.  The plane grid is static, so each limb is a
    static sum of (at most 3) shifted plane bit-fields."""
    P = planes.shape[-1]
    L = k_slots - 1
    top_bit = 8 * P - ref_bits
    e_top = -(-top_bit // B)                     # value < BETA^e_top
    pf = planes.astype(jnp.int32)
    sgn = jnp.where(pf < 0, -1, 1)
    mag = jnp.abs(pf)                            # < 2^13
    out_limbs = []
    # the grid top carries CRT/carry headroom the actual value may sit
    # well below; extend the window so that even a value of order
    # 2^-ref (i.e. ~1 after normalization) keeps the full L limbs
    # before renorm truncates
    n_ext = L + 2 + max(0, -(-top_bit // B))
    for j in range(n_ext):
        lo = B * (e_top - 1 - j) + ref_bits      # limb LSB on plane grid
        acc = None
        for t in range(P):
            sh = lo - 8 * t                      # static
            if sh >= 14 or sh <= -B:
                continue
            if sh >= 0:
                v = (mag[..., t] >> sh) & (BETA - 1)
            else:
                v = (mag[..., t] << (-sh)) & (BETA - 1)
            term = sgn[..., t] * v
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros(planes.shape[:-1], jnp.int32)
        out_limbs.append(acc.astype(jnp.float32))
    ext = _heads(jnp.stack(out_limbs, axis=-1), 2)
    e_arr = jnp.full(planes.shape[:-1], e_top + 1, jnp.int32)
    return _renorm(e_arr, ext, L, passes=3)
