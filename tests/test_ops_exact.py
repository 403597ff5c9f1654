"""Exact CRT SYRK vs an mpmath big-int oracle.

Mirrors the reference's kernel oracle
`test/src/unit_tests/cases/calculate_matrix_square.test.cxx` (bigint
syrk vs Elemental Syrk vs FLINT cross-validation): the digitized input
is reconstructed as exact integers and squared with python ints; the
CRT result must match bit-for-bit.
"""

import numpy as np
import pytest

from sdpb_tpu.mp import core as mp
from sdpb_tpu.ops import exact


def _exact_int_syrk(digits):
    """Oracle: digits (n, m, D) -> exact integer Q = X^T X via python ints."""
    n, m, D = digits.shape
    vals = [[sum(int(digits[i, j, t]) << (8 * t) for t in range(D))
             for j in range(m)] for i in range(n)]
    q = [[sum(vals[i][a] * vals[i][b] for i in range(n)) for b in range(m)]
         for a in range(m)]
    return q


def _planes_to_int(planes):
    P = planes.shape[-1]
    return sum(int(planes[..., t]) << (8 * t) if planes.ndim == 1 else 0
               for t in range(P))


@pytest.mark.parametrize("bits", [106, 212])
def test_syrk_exact_vs_int_oracle(bits):
    rng = np.random.default_rng(bits)
    n, m = 12, 5
    k = bits // 53 + 1
    words = [rng.uniform(-0.9, 0.9, (n, m))]
    for i in range(1, k):
        words.append(words[-1] * rng.standard_normal((n, m)) * 2.0 ** -53)
    x = np.asarray(mp.renorm_words([np.asarray(w) for w in words], k))

    plan = exact.CrtPlan(bits=bits, n_rows_max=64)
    digits = exact.mp_to_digits(x, plan)

    # device path
    r = exact.residues(digits, plan)
    q = exact.syrk_residues(r, plan)
    planes = np.asarray(exact.crt_restore_planes(q, plan))

    # oracle
    q_int = _exact_int_syrk(digits)
    for a in range(m):
        for b in range(m):
            got = sum(int(planes[a, b, t]) << (8 * t)
                      for t in range(planes.shape[-1]))
            assert got == q_int[a][b], (a, b)


def test_syrk_exact_mp_output_accuracy():
    import mpmath

    rng = np.random.default_rng(7)
    n, m, k = 20, 4, 4
    x64 = rng.uniform(-0.5, 0.5, (n, m))
    x = np.asarray(mp.from_f64(x64, k))
    plan = exact.CrtPlan(bits=53 * k, n_rows_max=64)
    q = exact.syrk_exact(x, plan)

    ctx = mpmath.mp.clone()
    ctx.prec = 500
    for a in range(m):
        for b in range(m):
            want = ctx.fsum(ctx.mpf(x64[i, a]) * ctx.mpf(x64[i, b])
                            for i in range(n))
            got = ctx.mpf(0)
            for w in np.asarray(q)[a, b]:
                got += ctx.mpf(float(w))
            # exact up to the digitization grid (2^-8D per input)
            assert abs(got - want) < ctx.mpf(2) ** (-(53 * k - 8))


def test_residues_match_int_mod():
    rng = np.random.default_rng(3)
    plan = exact.CrtPlan(bits=106, n_rows_max=16)
    digits = rng.integers(-127, 128, (7, 3, plan.n_digits)).astype(np.int32)
    r = np.asarray(exact.residues(digits, plan))
    for i in range(7):
        for j in range(3):
            v = sum(int(digits[i, j, t]) << (8 * t)
                    for t in range(plan.n_digits))
            for pi, p in enumerate(plan.primes):
                assert r[i, j, pi] == v % int(p)
