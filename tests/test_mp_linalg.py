"""MP dense linear algebra vs numpy/mpmath oracles.

Kernel-level oracle role of the reference's
`test/src/unit_tests/cases/calculate_matrix_square.test.cxx` (bigint
SYRK vs Elemental Syrk/Gemm cross-validation).
"""

import mpmath
import numpy as np
import pytest

import sdpb_tpu.mp as mp
from sdpb_tpu.mp import core


def _spd(rng, n):
    g = rng.standard_normal((n, n))
    return g @ g.T + n * np.eye(n)


def _to_mpf_mat(a, ctx):
    a = np.asarray(a)
    return [
        [mp.to_mpf(a[i, j], ctx) for j in range(a.shape[1])]
        for i in range(a.shape[0])
    ]


@pytest.mark.parametrize("k", [2, 4])
def test_matmul_exactish(k):
    rng = np.random.default_rng(0)
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + 100
    m, n, p = 7, 11, 5
    a64 = rng.standard_normal((m, n))
    b64 = rng.standard_normal((n, p))
    c = mp.linalg.matmul(mp.from_f64(a64, k), mp.from_f64(b64, k))
    want = [
        [ctx.fsum(ctx.mpf(a64[i, t]) * ctx.mpf(b64[t, j]) for t in range(n))
         for j in range(p)]
        for i in range(m)
    ]
    got = _to_mpf_mat(c, ctx)
    for i in range(m):
        for j in range(p):
            assert abs(got[i][j] - want[i][j]) < mpmath.mpf(2) ** (-(53 * k - 20))


@pytest.mark.parametrize("k", [2, 4])
def test_matmul_transpose_flags(k):
    rng = np.random.default_rng(1)
    a64 = rng.standard_normal((6, 4))
    b64 = rng.standard_normal((6, 5))
    a, b = mp.from_f64(a64, k), mp.from_f64(b64, k)
    np.testing.assert_allclose(
        core.to_f64(mp.linalg.matmul(a, b, transpose_a=True)),
        a64.T @ b64, rtol=1e-13,
    )
    np.testing.assert_allclose(
        core.to_f64(mp.linalg.matmul(a.transpose(1, 0, 2), b.transpose(1, 0, 2),
                                     transpose_b=True)),
        a64.T @ b64, rtol=1e-13,
    )
    np.testing.assert_allclose(
        core.to_f64(mp.linalg.syrk(a)), a64.T @ a64, rtol=1e-13
    )


def test_matvec():
    rng = np.random.default_rng(2)
    a64 = rng.standard_normal((6, 4))
    x64 = rng.standard_normal((4,))
    a, x = mp.from_f64(a64, 4), mp.from_f64(x64, 4)
    np.testing.assert_allclose(core.to_f64(mp.linalg.matvec(a, x)), a64 @ x64,
                               rtol=1e-13)
    y64 = rng.standard_normal((6,))
    y = mp.from_f64(y64, 4)
    np.testing.assert_allclose(
        core.to_f64(mp.linalg.matvec(a, y, transpose=True)), a64.T @ y64,
        rtol=1e-13,
    )


@pytest.mark.parametrize("k", [2, 4])
def test_cholesky_solve_roundtrip(k):
    """A x = b solved via MP Cholesky must recover x to ~full K-word
    precision (modulo conditioning)."""
    rng = np.random.default_rng(3)
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + 100
    n = 16
    a64 = _spd(rng, n)
    a = mp.from_f64(a64, k)
    l = mp.linalg.cholesky(a)
    x_true = mp.from_f64(rng.standard_normal((n, 3)), k)
    b = mp.linalg.matmul(a, x_true)
    x = mp.linalg.cholesky_solve(l, b)
    err = np.asarray(core.to_f64(core.abs_(core.sub(x, x_true)))).max()
    got = _to_mpf_mat(x, ctx)
    want = _to_mpf_mat(x_true, ctx)
    worst = max(
        abs(got[i][j] - want[i][j]) for i in range(n) for j in range(3)
    )
    assert worst < mpmath.mpf(2) ** (-(53 * k - 30)), f"worst={mpmath.nstr(worst,5)}"
    assert err < 1e-15


def test_cholesky_matches_numpy():
    rng = np.random.default_rng(4)
    a64 = _spd(rng, 12)
    l = mp.linalg.cholesky(mp.from_f64(a64, 4))
    np.testing.assert_allclose(core.to_f64(l), np.linalg.cholesky(a64),
                               rtol=1e-12, atol=1e-14)


def test_cholesky_non_spd_nan():
    a64 = np.diag([1.0, -1.0, 2.0])
    l = mp.linalg.cholesky(mp.from_f64(a64, 4))
    assert np.isnan(np.asarray(core.to_f64(l))).any()


def test_solve_triangular_multi_rhs():
    rng = np.random.default_rng(5)
    n, m = 10, 4
    a64 = _spd(rng, n)
    l64 = np.linalg.cholesky(a64)
    b64 = rng.standard_normal((n, m))
    l = mp.from_f64(l64, 4)
    b = mp.from_f64(b64, 4)
    np.testing.assert_allclose(
        core.to_f64(mp.linalg.solve_lower(l, b)),
        np.linalg.solve(l64, b64), rtol=1e-11,
    )
    np.testing.assert_allclose(
        core.to_f64(mp.linalg.solve_lower_t(l, b)),
        np.linalg.solve(l64.T, b64), rtol=1e-11,
    )


def test_congruence_symmetrize_trace():
    rng = np.random.default_rng(6)
    n = 8
    a64 = _spd(rng, n)
    s64 = rng.standard_normal((n, n))
    s64 = s64 + s64.T
    l64 = np.linalg.cholesky(a64)
    got = mp.linalg.lower_inverse_congruence(mp.from_f64(l64, 4),
                                             mp.from_f64(s64, 4))
    want = np.linalg.solve(l64, np.linalg.solve(l64, s64.T).T)
    np.testing.assert_allclose(core.to_f64(got), want, rtol=1e-11)

    m = mp.from_f64(s64, 4)
    np.testing.assert_allclose(core.to_f64(mp.linalg.symmetrize(m)), s64,
                               rtol=1e-14)
    np.testing.assert_allclose(
        float(core.to_f64(mp.linalg.trace(m))), np.trace(s64), rtol=1e-14
    )
    np.testing.assert_allclose(
        float(core.to_f64(mp.linalg.frobenius(m, m))), (s64 * s64).sum(),
        rtol=1e-13,
    )


def test_add_diag():
    rng = np.random.default_rng(7)
    a64 = rng.standard_normal((5, 5))
    out = mp.linalg.add_diag(mp.from_f64(a64, 4), 2.5)
    np.testing.assert_allclose(core.to_f64(out), a64 + 2.5 * np.eye(5),
                               rtol=1e-14)


def test_batched_cholesky_vmap():
    rng = np.random.default_rng(8)
    a64 = np.stack([_spd(rng, 6) for _ in range(3)])
    l = mp.linalg.cholesky(mp.from_f64(a64, 4))
    want = np.stack([np.linalg.cholesky(a64[i]) for i in range(3)])
    np.testing.assert_allclose(core.to_f64(l), want, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("n", [80, 96])
def test_blocked_cholesky_and_solves(n):
    """n > 2*_PANEL exercises the panel-blocked Cholesky/Trsm paths
    (n=80 additionally exercises the identity padding, 80 % 32 != 0);
    roundtrip accuracy must match the unblocked contract."""
    k = 3
    rng = np.random.default_rng(10 + n)
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + 100
    a64 = _spd(rng, n)
    a = mp.from_f64(a64, k)
    l = mp.linalg.cholesky(a)
    # L is exactly lower triangular and matches numpy at f64
    lf = np.asarray(core.to_f64(l))
    assert np.all(lf[np.triu_indices(n, 1)] == 0.0)
    np.testing.assert_allclose(lf, np.linalg.cholesky(a64),
                               rtol=1e-9, atol=1e-11)
    # MP-accuracy roundtrip: L L^T == A to ~full precision
    res = core.sub(mp.linalg.matmul(l, l, transpose_b=True),
                   mp.from_f64(np.tril(a64) + np.tril(a64, -1).T, k))
    got = _to_mpf_mat(res, ctx)
    scale = float(np.abs(a64).max())
    worst = max(abs(got[i][j]) for i in range(n) for j in range(n))
    assert worst / scale < mpmath.mpf(2) ** (-(53 * k - 40))
    # blocked triangular solves vs the linear system truth
    x_true = mp.from_f64(rng.standard_normal((n, 5)), k)
    b = mp.linalg.matmul(a, x_true)
    x = mp.linalg.cholesky_solve(l, b)
    gx = _to_mpf_mat(x, ctx)
    wx = _to_mpf_mat(x_true, ctx)
    worst = max(abs(gx[i][j] - wx[i][j]) for i in range(n) for j in range(5))
    assert worst < mpmath.mpf(2) ** (-(53 * k - 45)), mpmath.nstr(worst, 5)
