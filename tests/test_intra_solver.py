"""Intra-block model parallelism wired into the DRIVER: a problem
whose blocks are row-sharded over the mesh solves through
`parallel.intra_solver` and matches the single-device trajectory.

Reference: blocks assigned num_procs > 1 get an `El::Grid` spanning
ranks (`Block_Map.hxx:8-14`, `sdpb/solve.cxx:31`); here the row-panel
kernels of parallel.intra/dist_q span the mesh, and the driver routes
over-memory-limit problems here instead of aborting.
"""

import jax
import jax.numpy as jnp
import mpmath
import numpy as np
import pytest
from jax.sharding import Mesh

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.parallel import intra_solver
from sdpb_tpu.solver import SolverParams, problem_from_raw, solve
from sdpb_tpu.solver.data import bucketize

GOLDEN_SDP = ("/root/reference/test/data/end-to-end_tests/1d-constraints"
              "/output/sdp")


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    return Mesh(np.array(devs[:8]), (intra_solver.AXIS,))


def _mpf(dec):
    ctx = mpmath.mp.clone()
    ctx.prec = 300
    return ctx.mpf(dec)


def test_intra_driver_matches_plain(mesh8):
    """4 driver iterations through the row-sharded path track the
    plain single-device path."""
    k = 3
    params = SolverParams(precision=k * 53, max_iterations=4)
    raw = read_sdp(GOLDEN_SDP, k=k)
    problem = problem_from_raw(raw)

    res_plain = solve(bucketize(problem), params)
    res_intra = solve(intra_solver.IntraProblem(problem, mesh8), params)

    assert len(res_intra.iterations) == len(res_plain.iterations)
    for r1, r2 in zip(res_plain.iterations, res_intra.iterations):
        for field in ("mu", "primal_objective", "duality_gap"):
            v1, v2 = _mpf(getattr(r1, field)), _mpf(getattr(r2, field))
            assert abs(v1 - v2) <= abs(v1) * mpmath.mpf("1e-25"), \
                (r1.iteration, field)
        assert abs(r1.primal_step - r2.primal_step) < 1e-10
        assert abs(r1.dual_step - r2.dual_step) < 1e-10


def test_driver_routes_over_limit_to_intra(monkeypatch):
    """The over-limit -> intra routing decision: a limit the bucketed
    path exceeds but row-sharding cures must select intra; a limit even
    the sharded state exceeds must not."""
    from sdpb_tpu.solver import memory as mem_mod

    k = 3
    raw = read_sdp(GOLDEN_SDP, k=k)
    problem = bucketize(problem_from_raw(raw))
    est1 = mem_mod.estimate_solver_memory(problem, n_devices=1)
    biggest = max(est1.components.values())
    fit_limit = est1.total // 8 + biggest + 1024
    # the bucketed path needs ~est1 per device (2 blocks pad to 8
    # devices with phantoms): over fit_limit when est1 >> fit_limit
    assert mem_mod.intra_would_fit(problem, fit_limit, 8)
    assert not mem_mod.intra_would_fit(problem, biggest // 2, 8)
    assert not mem_mod.intra_would_fit(problem, fit_limit, 1)
