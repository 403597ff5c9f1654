"""approx_objective tests.

The reference ships no golden output for approx_objective, so the
oracle is perturbation theory itself (cf.
`Approx_Objective/Approx_Objective.cxx`): for a small perturbation
d_sdp of size delta, the quadratic approximation must match the exact
objective of the re-solved SDP to O(delta^3), and the linear one only
to O(delta^2).
"""

import json
from pathlib import Path

import jax.numpy as jnp
import mpmath
import numpy as np
import pytest

from sdpb_tpu.apps.approx_objective import (approx_objective,
                                            setup_factorizations, _d_sdp)
from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.mp import core as mp
from sdpb_tpu.mp import decimal as mpdec
from sdpb_tpu.solver import SolverParams, problem_from_raw, solve

REF = Path("/root/reference/test/data/end-to-end_tests")
GOLDEN_SDP = REF / "1d/output/sdp"


def _mpf(words, prec=400):
    ctx = mpmath.mp.clone()
    ctx.prec = prec
    return mpdec.to_mpf(np.asarray(words), ctx)


def test_zero_perturbation_is_exact():
    raw = read_sdp(GOLDEN_SDP, k=2)
    problem = problem_from_raw(raw)
    k = 2
    x = [mp.zeros((bl.shape.schur_size,), k) for bl in problem.blocks]
    y = mp.zeros((problem.dual_dim,), k)
    d = _d_sdp(raw, raw)
    total, d_obj, dd_obj = approx_objective(problem, x, y, *d)
    assert float(_mpf(d_obj)) == 0.0
    assert float(_mpf(dd_obj)) == 0.0
    assert abs(float(_mpf(total))
               - float(_mpf(np.asarray(problem.objective_const)))) == 0.0


@pytest.mark.slow
def test_quadratic_matches_resolve(tmp_path):
    """Solve the 1d SDP, perturb c by a relative delta (which moves the
    optimum, unlike a pure-b scaling that only rescales the objective),
    and compare the quadratic approximation against an exact re-solve:
    error must be far below the linear approximation's O(delta^2)."""
    k = 4
    params = SolverParams(precision=k * 53)

    raw = read_sdp(GOLDEN_SDP, k=k)
    problem = problem_from_raw(raw)
    result = solve(problem, params)
    assert result.reason.name == "PrimalDualOptimal"
    state = result.state

    # perturbed SDP: non-uniform c perturbation (a uniform scaling of c
    # or b only rescales the feasible set and is exactly linear; an
    # alternating one genuinely moves the optimum)
    delta = 1e-4
    import dataclasses

    def perturb_c(c):
        factors = 1.0 + delta * (np.arange(c.shape[0]) % 2)
        return np.asarray(mp.mul_f64(jnp.asarray(c), factors))

    raw2 = dataclasses.replace(raw, blocks=[
        dataclasses.replace(bl, c=perturb_c(bl.c)) for bl in raw.blocks])
    problem2 = problem_from_raw(raw2)
    result2 = solve(problem2, params)
    assert result2.reason.name == "PrimalDualOptimal"

    facts = setup_factorizations(problem, state.X, state.Y,
                                 state.x, state.y)
    d = _d_sdp(raw, raw2)
    total_q, d_obj, dd_obj = approx_objective(
        problem, state.x, state.y, *d, factorizations=facts)
    total_l, _, _ = approx_objective(problem, state.x, state.y, *d)

    # the exact objective of the re-solved SDP (primal = dual at optimum)
    exact = mpmath.mpf(result2.dual_objective)
    err_quad = abs(_mpf(total_q) - exact)
    err_lin = abs(_mpf(total_l) - exact)
    assert err_lin > mpmath.mpf("1e-12"), mpmath.nstr(err_lin, 8)
    assert err_quad < err_lin / 100, (mpmath.nstr(err_quad, 8),
                                      mpmath.nstr(err_lin, 8))


def test_linear_cli_smoke(tmp_path, capsys):
    """CLI run with the reference's golden solution, newSdp = same sdp
    (d = 0 -> d_objective = 0, objective = b.y + const)."""
    from sdpb_tpu.apps import approx_objective as app

    rc = app.main([
        "--sdp", str(GOLDEN_SDP),
        "--precision", "212",
        "--newSdp", str(GOLDEN_SDP),
        "--solutionDir", str(REF / "1d/output/out"),
        "--linear",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out) == 1
    assert float(mpmath.mpf(out[0]["d_objective"])) == 0.0
    golden = (REF / "1d/output/out/out.txt").read_text()
    import re
    dual = re.search(r"dualObjective\s*=\s*([-\d.e+]+)", golden).group(1)
    with mpmath.workprec(400):
        # b.y recomputed from the text y matches the golden dual
        # objective to the solve's own duality-gap accuracy (~1e-31)
        assert abs(mpmath.mpf(out[0]["objective"])
                   - mpmath.mpf(dual)) < mpmath.mpf("1e-25")
