"""Pallas limb kernels vs the XLA limb linalg (interpret mode on CPU).

The kernels run the identical limb arithmetic (mp/limb.py traced inside
the kernel body), so results must match the XLA implementations to the
format's truncation error; Cholesky/solve outputs are additionally
checked against mpmath.
"""

import mpmath
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdpb_tpu.mp import limb
from sdpb_tpu.mp import linalg as la
from sdpb_tpu.ops import limb_kernels as lk

S = 13            # 1 + 12 limbs ~ 100 bits
TOL = 2.0 ** -90


def _spd(rng, bb, n):
    a = rng.standard_normal((bb, n, n))
    spd = a @ np.swapaxes(a, -1, -2) + n * np.eye(n)
    return spd


def _to_limb(x):
    return jnp.asarray(limb.from_words_np(
        np.asarray(x, np.float64)[..., None], S))


def _to_mpf(arr):
    a = np.asarray(arr, np.float64)
    out = np.empty(a.shape[:-1], object)
    for idx in np.ndindex(a.shape[:-1]):
        out[idx] = limb.to_mpf(a[idx])
    return out


def _rel_err(got_limb, want_f64):
    got = _to_mpf(got_limb)
    err = 0.0
    scale = max(1.0, float(np.max(np.abs(want_f64))))
    for idx in np.ndindex(got.shape):
        err = max(err, abs(float(got[idx] - want_f64[idx])) / scale)
    return err


def test_solve_unblocked_batched_matches_xla():
    rng = np.random.default_rng(0)
    bb, n, m = 3, 8, 5
    l_np = np.linalg.cholesky(_spd(rng, bb, n))
    b_np = rng.standard_normal((bb, n, m))
    l, b = _to_limb(l_np), _to_limb(b_np)
    inv_d = limb.recip(l[:, np.arange(n), np.arange(n), :])
    got = lk.solve_unblocked_batched(l, b, inv_d, interpret=True)
    want = np.stack(
        [np.linalg.solve(np.tril(l_np[i]), b_np[i]) for i in range(bb)])
    assert _rel_err(got, want) < 1e-12      # vs f64 oracle
    # vs the XLA limb path: same arithmetic, near-identical rounding
    xla = jax.vmap(lambda li, bi, di:
                   la._solve_lower_unblocked(li, bi, di))(l, b, inv_d)
    gm, xm = _to_mpf(got), _to_mpf(xla)
    scale = max(1.0, float(np.max(np.abs(want))))
    diff = max(abs(float(gm[idx] - xm[idx]))
               for idx in np.ndindex(gm.shape))
    assert diff / scale < TOL


def test_solve_unblocked_transpose():
    rng = np.random.default_rng(1)
    bb, n, m = 2, 6, 3
    l_np = np.linalg.cholesky(_spd(rng, bb, n))
    b_np = rng.standard_normal((bb, n, m))
    l, b = _to_limb(l_np), _to_limb(b_np)
    inv_d = limb.recip(l[:, np.arange(n), np.arange(n), :])
    got = lk.solve_unblocked_batched(l, b, inv_d, transpose=True,
                                     interpret=True)
    want = np.stack([np.linalg.solve(np.tril(l_np[i]).T, b_np[i])
                     for i in range(bb)])
    assert _rel_err(got, want) < 1e-12


def test_solve_rhs_tile_padding():
    """m not a multiple of the tile width pads and slices correctly."""
    rng = np.random.default_rng(2)
    bb, n, m = 1, 4, 7
    l_np = np.linalg.cholesky(_spd(rng, bb, n))
    b_np = rng.standard_normal((bb, n, m))
    l, b = _to_limb(l_np), _to_limb(b_np)
    inv_d = limb.recip(l[:, np.arange(n), np.arange(n), :])
    got = lk.solve_unblocked_batched(l, b, inv_d, interpret=True)
    assert got.shape == (bb, n, m, S)
    want = np.stack([np.linalg.solve(np.tril(l_np[i]), b_np[i])
                     for i in range(bb)])
    assert _rel_err(got, want) < 1e-12


def test_cholesky_unblocked_batched():
    rng = np.random.default_rng(3)
    bb, n = 4, 10
    a_np = _spd(rng, bb, n)
    a = _to_limb(a_np)
    got = lk.cholesky_unblocked_batched(a, interpret=True)
    want = np.stack([np.linalg.cholesky(a_np[i]) for i in range(bb)])
    assert _rel_err(got, want) < 1e-12
    # strict upper triangle must be exactly zero
    gu = np.asarray(got)
    for i in range(n):
        for j in range(i + 1, n):
            assert np.all(gu[:, i, j, 1:] == 0.0)


def test_cholesky_unblocked_non_pd_poisons():
    a_np = -np.eye(4)[None]
    got = lk.cholesky_unblocked_batched(_to_limb(a_np), interpret=True)
    assert not np.isfinite(np.asarray(got)[0, 3, 3]).all()


def test_blocked_cholesky_and_solve_via_kernels(monkeypatch):
    """The blocked limb Cholesky/solve built on the kernels (diagonal
    chol + right-solve panels + matmul trailing updates) matches the
    f64 oracle at n > 2*_PANEL."""
    monkeypatch.setattr(lk, "_FORCE_INTERPRET", True)
    rng = np.random.default_rng(5)
    bb, n, m = 2, 80, 5
    a_np = _spd(rng, bb, n)
    a = _to_limb(a_np)
    L = la._cholesky_limb_batched(a)
    want = np.stack([np.linalg.cholesky(a_np[i]) for i in range(bb)])
    assert _rel_err(L, want) < 1e-12
    b_np = rng.standard_normal((bb, n, m))
    x = la._solve_limb_batched(L, _to_limb(b_np), transpose=False)
    xw = np.stack([np.linalg.solve(np.tril(want[i]), b_np[i])
                   for i in range(bb)])
    assert _rel_err(x, xw) < 1e-12
    xt = la._solve_limb_batched(L, _to_limb(b_np), transpose=True)
    xtw = np.stack([np.linalg.solve(np.tril(want[i]).T, b_np[i])
                    for i in range(bb)])
    assert _rel_err(xt, xtw) < 1e-12


def test_lower_inverse_blocked(monkeypatch):
    """Blocked explicit triangular inverse (diag kernel solves + MXU
    matmul block-rows) matches the f64 oracle, small and blocked."""
    monkeypatch.setattr(lk, "_FORCE_INTERPRET", True)
    rng = np.random.default_rng(6)
    for n in (10, 80):
        a_np = _spd(rng, 2, n)
        l_np = np.stack([np.linalg.cholesky(a_np[i]) for i in range(2)])
        T = la.lower_inverse(_to_limb(l_np))
        want = np.stack([np.linalg.inv(l_np[i]) for i in range(2)])
        assert _rel_err(T, want) < 1e-11
