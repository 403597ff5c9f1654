"""Mesh-sharded multi-chip solver on the virtual 8-device CPU mesh.

The contract (cf. SURVEY §2.3): the sharded solve must reproduce the
single-chip bucketed solve — same iterate trajectory up to reduction
ordering — with blocks sharded over the mesh axis and only Q / dy /
scalars crossing devices.  Padding (block counts not divisible by the
device count) is exercised by the 1d problem (1 block on 8 devices).
"""

import jax
import mpmath
import numpy as np
import pytest
from jax.sharding import Mesh

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.mp import decimal as mpdec
from sdpb_tpu.parallel import mesh as mesh_mod
from sdpb_tpu.solver import SolverParams, problem_from_raw, solve
from sdpb_tpu.solver.data import bucketize, initial_bucketed_state

GOLDEN_SDP = ("/root/reference/test/data/end-to-end_tests/1d/output/sdp")


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    return Mesh(np.array(devs[:8]), (mesh_mod.AXIS,))


def _mpf(words):
    ctx = mpmath.mp.clone()
    ctx.prec = 300
    return mpdec.to_mpf(np.asarray(words), ctx)


def test_sharded_matches_single_chip_iterations(mesh8):
    """Run 6 iterations sharded and unsharded; iterates must agree to
    far below the word-0 precision."""
    k = 3
    raw = read_sdp(GOLDEN_SDP, k=k)
    problem = bucketize(problem_from_raw(raw))
    params = SolverParams(precision=k * 53, max_iterations=6)

    res_single = solve(problem, params)

    mproblem = mesh_mod.shard_problem(problem, mesh8)
    res_mesh = solve(mproblem, params)

    assert res_mesh.reason == res_single.reason
    assert len(res_mesh.iterations) == len(res_single.iterations)
    state_m = mesh_mod.unshard_state(res_mesh.state, mproblem)
    state_s = res_single.state

    for a, b in ((state_m.y, state_s.y),):
        diff = abs(_mpf(np.asarray(a)[0]) - _mpf(np.asarray(b)[0]))
        assert diff < mpmath.mpf("1e-40"), diff
    for bi in range(len(problem.buckets)):
        xa = np.asarray(state_m.x[bi])
        xb = np.asarray(state_s.x[bi])
        assert xa.shape == xb.shape
        worst = max(abs(_mpf(xa.reshape(-1, k)[i])
                        - _mpf(xb.reshape(-1, k)[i]))
                    for i in range(xa.size // k))
        assert worst < mpmath.mpf("1e-40"), worst

    # iteration records agree
    for ra, rb in zip(res_mesh.iterations, res_single.iterations):
        assert abs(mpmath.mpf(ra.duality_gap)
                   - mpmath.mpf(rb.duality_gap)) < mpmath.mpf("1e-30")
        assert ra.primal_step == pytest.approx(rb.primal_step, rel=1e-12)


@pytest.mark.slow
def test_sharded_full_convergence(mesh8):
    """Sharded solve of the 1d SDP to PrimalDualOptimal, matching the
    golden objectives."""
    import re
    from pathlib import Path

    k = 4
    raw = read_sdp(GOLDEN_SDP, k=k)
    problem = bucketize(problem_from_raw(raw))
    mproblem = mesh_mod.shard_problem(problem, mesh8)
    params = SolverParams(precision=k * 53)
    result = solve(mproblem, params)
    assert result.reason.name == "PrimalDualOptimal"

    golden = Path(GOLDEN_SDP).parent.joinpath("out", "out.txt").read_text()
    prim = re.search(r"primalObjective = ([-\d.e+]+)", golden).group(1)
    with mpmath.workprec(400):
        assert abs(mpmath.mpf(result.primal_objective)
                   - mpmath.mpf(prim)) < mpmath.mpf("1e-25")
