"""Feasible-jump termination modes, end-to-end.

Mirrors `end-to-end.test.cxx:341-380` (SingletScalarAllowed_test_nmax6
primal/dual_feasible_jump: realistic nmax=6 SDPs run with
--detectPrimal/DualFeasibleJump and extreme error thresholds so the
solver terminates when a step length hits 1) and adds fast 1d coverage
of the find{Primal,Dual}Feasible flags
(`compute_feasible_and_termination.cxx:4-72`).
"""

import pathlib

import mpmath
import pytest

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import SolverParams, problem_from_raw, solve
from sdpb_tpu.solver.data import bucketize
from sdpb_tpu.solver.driver import TerminateReason

ALLOWED = pathlib.Path(
    "/root/reference/test/data/end-to-end_tests/"
    "SingletScalarAllowed_test_nmax6")
ONE_D = pathlib.Path(
    "/root/reference/test/data/end-to-end_tests/1d/output")


def _golden_out(case_dir):
    vals = {}
    for line in (case_dir / "output/out/out.txt").read_text().splitlines():
        if "=" in line:
            key, v = line.split("=", 1)
            vals[key.strip()] = v.strip().rstrip(";").strip('"')
    return vals


def _allowed_params(**kw):
    """The reference's exact flags for the Allowed jump cases
    (`end-to-end.test.cxx:348-357`), including the 100.1K shared-memory
    cap that forces Q residue window splitting."""
    base = dict(
        precision=448,
        duality_gap_threshold="1.0e-30",
        primal_error_threshold="1.0e-200",
        dual_error_threshold="1.0e-200",
        initial_matrix_scale_primal="1.0e20",
        initial_matrix_scale_dual="1.0e20",
        detect_primal_feasible_jump=True,
        detect_dual_feasible_jump=True,
        max_iterations=100,
        max_shared_memory="100.1K",
    )
    base.update(kw)
    return SolverParams(**base)


@pytest.mark.slow
@pytest.mark.parametrize("case,reason,golden_iters", [
    ("primal_feasible_jump",
     TerminateReason.PrimalFeasibleJumpDetected, 19),
    ("dual_feasible_jump",
     TerminateReason.DualFeasibleJumpDetected, 33),
])
def test_allowed_nmax6_jump(case, reason, golden_iters):
    params = _allowed_params()
    raw = read_sdp(ALLOWED / case / "output/sdp", k=params.n_words)
    problem = bucketize(problem_from_raw(raw))
    result = solve(problem, params)
    assert result.reason == reason
    # the jump fires within a couple of iterations of the reference
    # (step-length ties at alpha = 1 can shift it by one)
    assert abs(len(result.iterations) + 1 - golden_iters) <= 2
    gold = _golden_out(ALLOWED / case)
    ctx = mpmath.mp.clone()
    ctx.prec = 500
    want = ctx.mpf(gold["primalObjective"])
    ours = ctx.mpf(result.primal_objective)
    # the primal objective at the jump iterate is still far from
    # optimum; it tracks golden to the trajectory-drift level
    assert abs(ours - want) <= abs(want) * ctx.mpf("1e-10")
    assert gold["terminateReason"] == reason.value


@pytest.mark.parametrize("flag,reason", [
    ("find_primal_feasible", TerminateReason.PrimalFeasible),
    ("find_dual_feasible", TerminateReason.DualFeasible),
])
def test_1d_find_feasible(flag, reason):
    """1d with find{Primal,Dual}Feasible stops at first feasibility."""
    params = SolverParams(precision=212, max_iterations=200,
                          **{flag: True})
    raw = read_sdp(ONE_D / "sdp", k=params.n_words)
    problem = bucketize(problem_from_raw(raw))
    result = solve(problem, params)
    assert result.reason == reason
    # must stop well before full optimality (the 1d run takes 160
    # iterations to PrimalDualOptimal)
    assert len(result.iterations) < 120


def test_1d_detect_jump_flags_accepted():
    """1d with detect flags runs and terminates (jump or optimal; the
    1d problem's steps stay < 1 so it reaches PrimalDualOptimal)."""
    params = SolverParams(precision=212, max_iterations=30,
                          detect_primal_feasible_jump=True,
                          detect_dual_feasible_jump=True)
    raw = read_sdp(ONE_D / "sdp", k=params.n_words)
    problem = bucketize(problem_from_raw(raw))
    result = solve(problem, params)
    assert result.reason in (
        TerminateReason.MaxIterationsExceeded,
        TerminateReason.PrimalFeasibleJumpDetected,
        TerminateReason.DualFeasibleJumpDetected,
        TerminateReason.PrimalDualOptimal)
