"""Exact MP-matrix SYRK on the integer MXU, fully on-device.

This closes the loop the round-1 pipeline left open: `ops.exact`
implements the CRT residue SYRK (the TPU redesign of the reference's
`bigint_syrk`, `src/sdp_solve/SDP_Solver/run/bigint_syrk/Readme.md`)
but converted MP words <-> fixed-point digits on the host.  Here the
conversions are device-side and integer-exact (mantissa/exponent
bitcasts, no float rounding anywhere), so a solver iteration can run
`Q = (L^-1 B)^T (L^-1 B)` end-to-end on-chip:

  MP words -> per-column power-of-2 scaling (`Matrix_Normalizer.cxx`
  equivalent; exact, reversible) -> balanced base-256 digits (bit
  extraction) -> residues mod ~13-bit primes -> int8 MXU SYRK ->
  CRT restore -> digit planes -> MP words -> unscale.

Cross-chip: the per-prime int32 Q residues are summed (or `psum`ed)
BEFORE the CRT restore - integer addition cannot round, so the
distributed reduction is exact, replacing `restore_and_reduce.cxx`'s
pairwise Sendrecv rounds.

Accuracy contract (matches the reference's): inputs are truncated at
2^-plan.bits relative to each column's power-of-2 scale (the reference
truncates at 2^-precision relative to the column norm,
`Matrix_Normalizer.cxx`); the product is bit-exact for the truncated
inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..mp import core as mpcore
from ..mp import limb as mplimb
from . import exact
from .exact import CrtPlan

# Per word dtype: (mantissa bits, exponent mask, bias, signed int dtype)
_FINFO = {
    jnp.dtype(jnp.float32): (23, 0xFF, 127, jnp.int32),
    jnp.dtype(jnp.float64): (52, 0x7FF, 1023, jnp.int64),
}


def _split_mantissa(w):
    """Bitcast a float word array -> (sign +-1 int32, mantissa int
    (with implicit bit), unbiased exponent-of-LSB int32).

    value = sign * m * 2^lsb_exp, exactly (subnormals included).
    """
    mant, emask, bias, idt = _FINFO[jnp.dtype(w.dtype)]
    b = jax.lax.bitcast_convert_type(w, idt)
    sign = jnp.where(b < 0, -1, 1).astype(jnp.int32)
    e = (jax.lax.shift_right_logical(b, jnp.asarray(mant, idt))
         & jnp.asarray(emask, idt)).astype(jnp.int32)
    m = b & jnp.asarray((1 << mant) - 1, idt)
    m = jnp.where(e > 0, m | jnp.asarray(1 << mant, idt), m)
    lsb_exp = jnp.maximum(e, 1) - (bias + mant)
    return sign, m, lsb_exp


def exponents(x_mp):
    """Per-element int32 e with |value| < 2^e, from the leading word
    (for normalized expansions word 0 carries >= half the value)."""
    if mpcore.is_limb(x_mp):
        return mplimb.exponent_bits(x_mp)
    mant, emask, bias, _ = _FINFO[jnp.dtype(x_mp.dtype)]
    _, _, lsb = _split_mantissa(x_mp[..., 0])
    # |word0| < 2^(lsb + mant + 1); tail words add < 1 ulp of word0.
    return lsb + (mant + 1)


def pow2(e, dtype):
    """Exact power-of-2 float array 2^e from int32 e (e clamped to the
    normal exponent range of ``dtype``)."""
    mant, emask, bias, idt = _FINFO[jnp.dtype(dtype)]
    e = jnp.clip(e, 1 - bias, bias)
    return jax.lax.bitcast_convert_type(
        ((e + bias).astype(idt)) << mant, jnp.dtype(dtype))


def scale_pow2(x_mp, e):
    """x * 2^e with integer e broadcastable over the batch shape; exact
    (two half-steps keep each factor within the exponent range)."""
    if mpcore.is_limb(x_mp):
        return mplimb.scale_pow2_bits(x_mp, e)
    h1 = e // 2
    h2 = e - h1
    s1 = pow2(h1, x_mp.dtype)[..., None]
    s2 = pow2(h2, x_mp.dtype)[..., None]
    return x_mp * s1 * s2


@functools.partial(jax.jit, static_argnames=("plan",))
def digits_dev(x_mp, plan: CrtPlan):
    """MP array (..., K), |values| <= 1 -> balanced int32 base-256
    digits (..., n_digits), least significant first.  Integer-exact:
    each word's mantissa bits are shifted into the fixed-point grid
    x * 2^shift; bits below the grid are truncated (|error| <
    K * 2^-shift, the documented backward-error contract).

    On-device replacement for `exact.mp_to_digits` (which runs exact
    f64 host arithmetic); this version is pure int ops, so it is safe
    on TPUs for both f32 and f64 word dtypes."""
    if mpcore.is_limb(x_mp):
        return mplimb.digits_dev(x_mp, plan.shift_bits, plan.n_digits)
    D = plan.n_digits
    shift = plan.shift_bits
    k = x_mp.shape[-1]
    mant = _FINFO[jnp.dtype(x_mp.dtype)][0]
    t8 = 8 * jnp.arange(D, dtype=jnp.int32)
    acc = jnp.zeros(x_mp.shape[:-1] + (D,), jnp.int32)
    for i in range(k):
        sign, m, lsb = _split_mantissa(x_mp[..., i])
        # digit t covers grid bits [8t, 8t+8); word bits start at
        # bitpos0 = lsb + shift
        sh = t8 - (lsb + shift)[..., None]          # (..., D)
        m_ = m[..., None]
        right = jax.lax.shift_right_logical(
            m_, jnp.clip(sh, 0, mant + 1).astype(m_.dtype))
        left = jax.lax.shift_left(
            m_, jnp.clip(-sh, 0, 7).astype(m_.dtype))
        v = jnp.where(sh >= 0, right, left) & jnp.asarray(255, m_.dtype)
        v = jnp.where((sh > mant) | (sh <= -8), 0, v).astype(jnp.int32)
        acc = acc + sign[..., None] * v
    # balanced carry normalization: |acc| <= 255*K, three passes bring
    # every digit into [-128, 127] with zero final carry
    def carry_pass(a, _):
        d = jnp.bitwise_and(a + 128, 255) - 128
        cy = jax.lax.shift_right_arithmetic(a - d, jnp.asarray(8, a.dtype))
        a = d + jnp.concatenate(
            [jnp.zeros_like(cy[..., :1]), cy[..., :-1]], axis=-1)
        return a, None
    acc, _ = jax.lax.scan(carry_pass, acc, None, length=3)
    return acc


def _plane_words_spec(plan: CrtPlan, k_out: int, word_dtype):
    """Static (group, n_keep, ref_bits) for planes -> words grouping.

    ``group`` digit planes pack exactly into one word.  Weights are
    relative to ref_bits = 2*shift (the value scale of a product of
    two digitized |x| <= 1 inputs), so words of O(1)-scale results stay
    within the float exponent range for any plan.bits.  The kept groups
    reach from the top plane down below 2^-(wb*k_out + 24) relative to
    the value scale -- the precision contract is relative to the column
    scales (like the reference's `Matrix_Normalizer`), so bits below
    that floor are beneath the digitization error and droppable."""
    wb = 24 if jnp.dtype(word_dtype) == jnp.float32 else 53
    group = 2 if wb == 24 else 5  # |plane| < 2^13 after carry passes
    P = plan.out_planes
    n_groups = -(-P // group)
    ref_bits = 2 * plan.shift_bits
    floor_bits = ref_bits - (wb * k_out + 24)
    n_keep = min(n_groups, max(1, -(-(8 * P - floor_bits) // (8 * group))))
    return group, n_keep, ref_bits, P


@functools.partial(jax.jit, static_argnames=("plan", "k_out", "word_dtype"))
def planes_to_mp_dev(planes, plan: CrtPlan, k_out: int, word_dtype):
    """Carry-normalized balanced digit planes (..., out_planes, lsf)
    -> (value * 2^-ref_bits) as a K-word MP array in ``word_dtype``.

    Groups planes top-down into exact words (each group of balanced
    planes sums below the word's mantissa width), keeps only the top
    groups covering the requested precision, renormalizes.  The
    2^-ref_bits normalization (ref = weight of the top plane) keeps
    every word within the float exponent range regardless of
    plan.bits; callers fold ref_bits into their unscaling step."""
    if jnp.dtype(word_dtype) == jnp.float32:
        # TPU limb format: planes regrid statically onto the base-2^9
        # limb grid; same 2^-ref_bits normalization contract.
        ref_bits = 2 * plan.shift_bits
        return mplimb.planes_to_limb(planes, ref_bits, k_out)
    group, n_keep, ref_bits, P = _plane_words_spec(plan, k_out, word_dtype)
    dt = jnp.dtype(word_dtype)
    words = []
    for g in range(n_keep):
        top = P - 1 - g * group
        lo = max(0, top - group + 1)
        w = jnp.zeros(planes.shape[:-1], dt)
        for t in range(top, lo - 1, -1):
            scale = dt.type(2.0) ** int(8 * t - ref_bits)
            w = w + planes[..., t].astype(dt) * scale
        words.append(w)
    out = mpcore.renorm_words(jnp.stack(words, axis=-1), k_out, sort=False)
    return out


def _poison_nonfinite(out, *inputs):
    """Propagate NaN through the integer pipeline: bitcasts launder
    NaN/Inf words into garbage finite digits, but the solver's
    NaN-on-non-PD-Cholesky convention (matching the reference's
    El::NonHPDMatrixException handling, `docs/Usage.md:270-273`)
    requires non-finite inputs to yield non-finite outputs."""
    bad = jnp.zeros((), jnp.bool_)
    for x in inputs:
        bad = bad | ~jnp.isfinite(jnp.max(jnp.abs(x[..., 0])))
    return jnp.where(bad, jnp.asarray(jnp.nan, out.dtype), out)


@functools.partial(jax.jit, static_argnames=("plan", "k_out"))
def syrk_mp(x_mp, plan: CrtPlan, k_out: int | None = None):
    """Exact X^T X of an MP matrix X (n, m, K) -> (m, m, K_out),
    entirely on-device via the int8 MXU CRT pipeline.

    Matches `compute_Q.cxx:94-131` + `bigint_syrk_blas.cxx:183`:
    per-column power-of-2 normalization (exact, vs the reference's
    norm-based `Matrix_Normalizer`), residues, per-prime integer SYRK,
    CRT restore, un-normalization."""
    k_out = k_out if k_out is not None else x_mp.shape[-1]
    q_res, e_col = syrk_residues_mp(x_mp, plan)
    out = restore_q_mp(q_res, e_col, plan, k_out, x_mp.dtype)
    return _poison_nonfinite(out, x_mp)


@functools.partial(jax.jit, static_argnames=("plan",))
def syrk_residues_mp(x_mp, plan: CrtPlan, e_col=None):
    """First half of `syrk_mp`: per-prime int32 Q residues in [0, p)
    plus the column exponents.  Split out so distributed callers can
    reduce the integer residues across chips/blocks exactly (int32
    psum; `restore_and_reduce.cxx` equivalent) before restoring.

    ``e_col`` (int32 (m,)) forces shared column scales across the
    participants of such a reduction."""
    if e_col is None:
        e_col = jnp.max(exponents(x_mp), axis=0)          # (m,)
    u = scale_pow2(x_mp, -e_col[None, :])
    d = digits_dev(u, plan)                                # (n, m, D)
    r_split = exact.residues_split(d, plan)
    q_res = exact.syrk_residues_split(r_split, plan)       # (P, m, m)
    return q_res, e_col


@functools.partial(jax.jit, static_argnames=("plan", "k_out", "word_dtype"))
def restore_q_mp(q_res, e_col, plan: CrtPlan, k_out: int, word_dtype):
    """Second half of `syrk_mp`: CRT restore + planes -> MP words +
    un-normalization by 2^(e_i + e_j)."""
    planes = exact.crt_restore_planes(q_res, plan)
    w = planes_to_mp_dev(planes, plan, k_out, word_dtype)
    E = (_ref_bits(plan, k_out, word_dtype) - 2 * plan.shift_bits) \
        + e_col[:, None] + e_col[None, :]
    return scale_pow2(w, E)


@functools.partial(jax.jit, static_argnames=("plan", "k_out"))
def gemm_mp(a_mp, b_mp, plan: CrtPlan, k_out: int | None = None):
    """Exact A^T B of MP matrices A (n, ma, K), B (n, mb, K) ->
    (ma, mb, K_out) on-device via the int8 MXU CRT pipeline (the
    reference's off-diagonal dgemm jobs next to `bigint_syrk_blas`).

    Same backward-error contract as `syrk_mp`: inputs truncated at
    2^-plan.bits relative to each column's power-of-2 scale."""
    k_out = k_out if k_out is not None else a_mp.shape[-1]
    e_a = jnp.max(exponents(a_mp), axis=0)
    e_b = jnp.max(exponents(b_mp), axis=0)
    da = digits_dev(scale_pow2(a_mp, -e_a[None, :]), plan)
    db = digits_dev(scale_pow2(b_mp, -e_b[None, :]), plan)
    c_res = exact.gemm_residues_split(
        exact.residues_split(da, plan), exact.residues_split(db, plan), plan)
    planes = exact.crt_restore_planes(c_res, plan)
    w = planes_to_mp_dev(planes, plan, k_out, a_mp.dtype)
    E = (_ref_bits(plan, k_out, a_mp.dtype) - 2 * plan.shift_bits) \
        + e_a[:, None] + e_b[None, :]
    return _poison_nonfinite(scale_pow2(w, E), a_mp, b_mp)


def syrk_mp_batched(x_mp, plan: CrtPlan, k_out: int | None = None):
    """Exact X^T X with leading batch dims: (..., n, m, K) ->
    (..., m, m, K_out).  vmap of `syrk_mp`: per-batch column scales,
    per-batch NaN poisoning; the int8 matmuls batch over
    (batch..., primes) so the MXU sees one large batched contraction
    (the reference's per-(prime, tile) BLAS job batch,
    `blas_jobs/create_blas_job_schedule.cxx`, as a single XLA op)."""
    if x_mp.ndim == 3:
        return syrk_mp(x_mp, plan, k_out)
    return jax.vmap(lambda x: syrk_mp_batched(x, plan, k_out))(x_mp)


def gemm_mp_batched(a_mp, b_mp, plan: CrtPlan, k_out: int | None = None):
    """Exact A^T B with leading batch dims: (..., n, ma, K) x
    (..., n, mb, K) -> (..., ma, mb, K_out); see `syrk_mp_batched`."""
    if a_mp.ndim == 3:
        return gemm_mp(a_mp, b_mp, plan, k_out)
    return jax.vmap(lambda a, b: gemm_mp_batched(a, b, plan, k_out))(
        a_mp, b_mp)


def reduce_residues_mod(q_res_sum, plan: CrtPlan):
    """Re-reduce a SUM of per-prime residue arrays (leading prime axis,
    any trailing shape) into [0, p).  Summands are each in [0, p); up
    to ~2^18 of them fit int32."""
    pp, inv, pow16 = exact._mod_tables(plan.primes)
    shape = (-1,) + (1,) * (q_res_sum.ndim - 1)
    return exact._mod_p(q_res_sum, pp.reshape(shape), inv.reshape(shape),
                        pow16.reshape(shape))


@functools.lru_cache(maxsize=None)
def _plan_cached(bits: int, n_quant: int) -> CrtPlan:
    return CrtPlan(bits=bits, n_rows_max=n_quant)


def plan_for(precision_bits: int, n_rows_max: int) -> CrtPlan:
    """CrtPlan sized for MP inputs of ``precision_bits`` significant
    bits (digit grid carries a margin below the last word).

    Plans are cached with the row bound rounded up to a power of two,
    so jit sees identical plan objects across call sites and reuses
    compiled kernels."""
    n_quant = max(64, 1 << max(0, int(n_rows_max) - 1).bit_length())
    return _plan_cached(precision_bits + 16, n_quant)


def word_bits(dtype) -> int:
    return 24 if jnp.dtype(dtype) == jnp.float32 else 53


def _ref_bits(plan: CrtPlan, k_out: int, word_dtype) -> int:
    if jnp.dtype(word_dtype) == jnp.float32:
        return 2 * plan.shift_bits
    return _plane_words_spec(plan, k_out, word_dtype)[2]


def precision_of(dtype, k: int) -> int:
    """Significand bits of a k-slot MP array (expansion words or the
    limb format); the plan-sizing companion of `plan_for`."""
    return mpcore.precision_bits_of(dtype, k)
