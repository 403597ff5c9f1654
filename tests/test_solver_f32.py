"""The TPU word-format solver path (base-2^9 limb MP, mp/limb.py) at
the reference's PRODUCTION contract.

The retired f32-expansion path could only run a reduced 110-bit /
gap-1e-10 / scale-1e8 variant (f32 exponent-range cap); the limb format
runs the stock contract unmodified: `--precision 400`-class settings,
`initialMatrixScalePrimal/Dual 1e20` (so mu starts at 1e40),
thresholds 1e-30 (`Solver_Parameters.cxx:74-92`).  Numerics are
identical on CPU and TPU (both evaluate the same correctly-rounded f32
ops), so CI runs these on the CPU backend; the real-chip equivalents
live in tests/test_tpu_backend.py.

Reference anchor: `end-to-end.test.cxx` 1d case.
"""

import json
import pathlib

import jax.numpy as jnp
import mpmath
import pytest

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import (SolverParams, TerminateReason,
                             problem_from_raw, solve)
from sdpb_tpu.solver.data import bucketize

DATA = pathlib.Path("/root/reference/test/data/end-to-end_tests/1d/output")


def limb_params(**kw):
    """STOCK solver parameters (the reference defaults) on the limb
    word format -- nothing is scaled down."""
    base = dict(precision=212, word_dtype="float32", max_iterations=100)
    base.update(kw)
    return SolverParams(**base)


@pytest.fixture(scope="module")
def problem():
    params = limb_params()
    raw = read_sdp(DATA / "sdp", k=6)
    p = bucketize(problem_from_raw(raw, dtype=jnp.float32,
                                   k=params.n_words))
    assert p.b.dtype == jnp.float32
    return p


def test_1d_stock_contract_trajectory(problem):
    """8 iterations at stock flags: mu must start at 1e40 (the
    1e20-scale cold start the f32-expansion path could not represent)
    and track SDPB's golden trajectory."""
    result = solve(problem, limb_params(max_iterations=8))
    golden = json.load(open(DATA / "out" / "iterations.json"))
    ctx = mpmath.mp.clone()
    ctx.prec = 300
    assert len(result.iterations) >= 7
    first = result.iterations[0]
    assert ctx.mpf(first.mu) == ctx.mpf("1e40")
    for rec in result.iterations[1:7]:
        g = golden[rec.iteration - 1]
        mu_ours, mu_gold = ctx.mpf(rec.mu), ctx.mpf(g["mu"])
        # Step lengths come from a WORD-dtype eigh + MP Rayleigh
        # quotient (iteration._min_eig_mp); with f32 words the
        # eigenvector seed carries ~2^-24 error, so steps (and hence
        # mu) drift ~1e-7/iteration vs the reference's full-precision
        # HermitianEig.  This does not affect convergence or the final
        # objectives (see the slow full-convergence test: same 160
        # iterations as the f64 path, golden objectives at 1e-29).
        tol = ctx.mpf(1e-25) if rec.iteration == 1 else \
            ctx.mpf(3e-7) * rec.iteration
        assert abs(mu_ours - mu_gold) <= abs(mu_gold) * tol, rec.iteration
        for field, key in (("primal_step", "P-step"),
                           ("dual_step", "D-step")):
            assert abs(getattr(rec, field) - float(ctx.mpf(g[key]))) \
                <= 1e-5, (rec.iteration, field)


@pytest.mark.slow
def test_1d_stock_contract_full_convergence(problem):
    """Full solve to PrimalDualOptimal at the 1e-30 gap contract;
    objectives match the reference golden out.txt (768-bit GMP)."""
    result = solve(problem, limb_params(max_iterations=250))
    assert result.reason == TerminateReason.PrimalDualOptimal
    gold = {}
    for line in (DATA / "out" / "out.txt").read_text().splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            gold[k.strip()] = v.strip().rstrip(";")
    ctx = mpmath.mp.clone()
    ctx.prec = 400
    for key, field in (("primalObjective", result.primal_objective),
                       ("dualObjective", result.dual_objective)):
        ours = ctx.mpf(field)
        want = ctx.mpf(gold[key])
        assert abs(ours - want) <= abs(want) * ctx.mpf("1e-29"), key
    assert ctx.mpf(result.duality_gap) < ctx.mpf("1e-29")
