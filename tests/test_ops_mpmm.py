"""On-device exact MP SYRK (ops.mpmm) vs host oracles.

Mirrors the reference's `calculate_matrix_square.test.cxx` role for the
fully on-device pipeline: digit extraction must match the host-exact
converter, and the end-to-end SYRK must match mpmath at the backward
-error contract (2^-plan.bits relative to column scales).
"""

import mpmath
import numpy as np
import pytest

from sdpb_tpu.mp import core, decimal as mpdec
from sdpb_tpu.ops import exact, mpmm


def _rand_mp(rng, shape, k, scale_pow=6, dtype=np.float64):
    """Random MP array: f64 word expansions, or (dtype=float32) the
    TPU limb format with k SLOTS built from f64-word inputs."""
    wb = 53
    w0 = (rng.standard_normal(shape) *
          10.0 ** rng.integers(-scale_pow, scale_pow, shape))
    words = [w0]
    for _ in range(1, 4):
        words.append(words[-1] * rng.standard_normal(shape) * 2.0 ** -wb)
    w64 = np.asarray(core.renorm_words(
        [np.asarray(w) for w in words], 4))
    if np.dtype(dtype) == np.float32:
        from sdpb_tpu.mp import limb

        return limb.from_words_np(w64, k)
    return w64 if k == 4 else np.asarray(core.change_k(w64, k))


def _to_mpf(words, ctx):
    return mpdec.to_mpf(np.asarray(words), ctx)


def test_digits_dev_matches_host():
    """Device bit-extraction == host exact f64 digitization for values
    |x| <= 1 (the contract domain)."""
    rng = np.random.default_rng(0)
    k = 4
    plan = exact.CrtPlan(bits=212, n_rows_max=64)
    x = _rand_mp(rng, (40,), k, scale_pow=1)
    x = np.asarray(core.mul_pow2(x, 2.0 ** -25))  # |x| well below 1
    host = exact.mp_to_digits(x, plan)
    dev = np.asarray(mpmm.digits_dev(x, plan))
    assert dev.min() >= -128 and dev.max() <= 127
    # same VALUE (representations may differ by balanced-carry choices)
    w_host = exact.digits_to_mp(host.astype(np.float64), plan.shift_bits, k)
    w_dev = exact.digits_to_mp(dev.astype(np.float64), plan.shift_bits, k)
    ctx = mpmath.mp.clone()
    ctx.prec = 300
    for a, b in zip(np.asarray(w_host), np.asarray(w_dev)):
        # host version rounds the low digit, device truncates: allow
        # one grid ulp
        assert abs(_to_mpf(a, ctx) - _to_mpf(b, ctx)) <= \
            mpmath.mpf(2) ** (4 - plan.shift_bits)


@pytest.mark.parametrize("dtype,k,prec", [
    (np.float64, 4, 212),
    (np.float32, 26, 217),
])
def test_syrk_mp_accuracy(dtype, k, prec):
    """On-device SYRK vs mpmath at the backward-error contract, with
    wide per-column dynamic range (exercises the power-of-2 column
    scaling)."""
    rng = np.random.default_rng(1)
    n, m = 48, 10
    x = _rand_mp(rng, (n, m), k, scale_pow=1, dtype=dtype)
    # per-column scales spanning ~12 orders of magnitude (f32-safe)
    col_scale = 2.0 ** rng.integers(-20, 20, m)
    x = np.asarray(core.mul_pow2(np.asarray(x), col_scale[None, :, None]
                                 .astype(dtype)))
    plan = mpmm.plan_for(prec, n)
    got = np.asarray(mpmm.syrk_mp(x, plan))
    assert got.dtype == dtype

    ctx = mpmath.mp.clone()
    ctx.prec = plan.bits + 80
    xm = [[_to_mpf(x[i, j], ctx) for j in range(m)] for i in range(n)]
    scale = [max(abs(xm[i][j]) for i in range(n)) for j in range(m)]
    tol = mpmath.mpf(2) ** (-prec + 6) * n
    for i in range(m):
        for j in range(m):
            want = ctx.fsum(xm[t][i] * xm[t][j] for t in range(n))
            err = abs(_to_mpf(got[i, j], ctx) - want)
            assert err <= tol * scale[i] * scale[j], (i, j, err)


def test_syrk_residue_sum_matches_concat():
    """Summing per-part integer Q residues (the exact cross-chip /
    cross-bucket reduction) == SYRK of the stacked matrix."""
    rng = np.random.default_rng(2)
    k, n1, n2, m = 3, 16, 24, 6
    a = _rand_mp(rng, (n1, m), k, scale_pow=2)
    b = _rand_mp(rng, (n2, m), k, scale_pow=2)
    full = np.concatenate([a, b], axis=0)
    plan = mpmm.plan_for(159, n1 + n2)
    e_col = np.maximum(
        np.max(np.asarray(mpmm.exponents(a)), axis=0),
        np.max(np.asarray(mpmm.exponents(b)), axis=0))
    qa, _ = mpmm.syrk_residues_mp(a, plan, e_col=e_col)
    qb, _ = mpmm.syrk_residues_mp(b, plan, e_col=e_col)
    qsum = mpmm.reduce_residues_mod(
        np.asarray(qa).astype(np.int64) + np.asarray(qb), plan)
    got = np.asarray(mpmm.restore_q_mp(
        np.asarray(qsum).astype(np.int32), e_col, plan, k, a.dtype))
    want = np.asarray(mpmm.syrk_mp(full, plan))
    np.testing.assert_array_equal(got, want)


def test_scale_pow2_exact():
    rng = np.random.default_rng(3)
    x = _rand_mp(rng, (20,), 3)
    e = rng.integers(-80, 80, 20).astype(np.int32)
    got = np.asarray(mpmm.scale_pow2(x, e[:, None]))
    np.testing.assert_array_equal(got, np.asarray(x) * 2.0 ** e[:, None, None])
