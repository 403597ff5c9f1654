"""End-to-end solver validation against the reference's golden data.

Mirrors the role of the reference's integration tests
(`test/src/integration_tests/cases/end-to-end.test.cxx`): run the
solver on the bundled `1d` SDP and compare the iteration trajectory and
final objectives against the golden `iterations.json` / `out.txt`
produced by SDPB (768-bit GMP).
"""

import json
import pathlib

import mpmath
import numpy as np
import pytest

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import problem_from_raw, SolverParams, solve, TerminateReason

DATA = pathlib.Path("/root/reference/test/data/end-to-end_tests/1d/output")


@pytest.fixture(scope="module")
def problem():
    raw = read_sdp(DATA / "sdp", k=8)
    return problem_from_raw(raw)


@pytest.fixture(scope="module")
def golden_iterations():
    return json.load(open(DATA / "out" / "iterations.json"))


def test_trajectory_matches_golden(problem, golden_iterations):
    """The first iterations must track SDPB's trajectory to high
    precision (mu agrees to ~30 digits; step lengths to f64 accuracy
    since our lambda_min path is f64)."""
    params = SolverParams(precision=424, max_iterations=8)
    result = solve(problem, params)
    assert len(result.iterations) >= 7
    ctx = mpmath.mp.clone()
    ctx.prec = 500
    # Step lengths use word-dtype eigh + an MP Rayleigh-quotient
    # refinement (vs the reference's full-precision HermitianEig);
    # the residual 2nd-order RQ error on clustered eigenvalues leaves
    # ~1e-16 relative step drift per iteration.  Iteration 1 agrees at
    # full MP precision.
    for rec in result.iterations[1:7]:
        g = golden_iterations[rec.iteration - 1]
        mu_ours = ctx.mpf(rec.mu)
        mu_gold = ctx.mpf(g["mu"])
        tol = ctx.mpf(1e-25) if rec.iteration == 1 else \
            ctx.mpf(3e-15) * rec.iteration
        assert abs(mu_ours - mu_gold) <= abs(mu_gold) * tol, rec.iteration
        for field, key in (("primal_step", "P-step"), ("dual_step", "D-step")):
            ours = getattr(rec, field)
            gold = float(ctx.mpf(g[key]))
            assert abs(ours - gold) <= 1e-12, (rec.iteration, field)
        d_ours = ctx.mpf(rec.dual_error)
        d_gold = ctx.mpf(g["D-err"])
        assert abs(d_ours - d_gold) <= abs(d_gold) * ctx.mpf(1e-12)


@pytest.mark.slow
def test_full_convergence_matches_out_txt(problem):
    """Solve to the default 1e-30 duality gap and compare objectives
    with out.txt (the reference diffs at 99 binary digits ~ 1e-30)."""
    params = SolverParams(precision=424)
    result = solve(problem, params)
    assert result.reason == TerminateReason.PrimalDualOptimal
    out = (DATA / "out" / "out.txt").read_text()
    gold = {}
    for line in out.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            gold[k.strip()] = v.strip().rstrip(";")
    ctx = mpmath.mp.clone()
    ctx.prec = 500
    for ours, key in ((result.primal_objective, "primalObjective"),
                      (result.dual_objective, "dualObjective")):
        a, b = ctx.mpf(ours), ctx.mpf(gold[key])
        assert abs(a - b) <= abs(b) * ctx.mpf(1e-29), key
