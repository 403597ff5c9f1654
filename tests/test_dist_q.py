"""Distributed Q: reduce-scattered integer restore + row-panel
Cholesky and triangular solves over the mesh (reference:
`restore_and_reduce.cxx`, `initialize_schur_complement_solver.cxx:95`,
`solve_schur_complement_equation.cxx`)."""

import jax
import jax.numpy as jnp
import mpmath
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.mp import core as mp
from sdpb_tpu.mp import decimal as mpdec
from sdpb_tpu.mp import linalg as la
from sdpb_tpu.parallel import dist_q, mesh as mesh_mod
from sdpb_tpu.parallel._shard import shard_map
from sdpb_tpu.solver import SolverParams, problem_from_raw, solve
from sdpb_tpu.solver.data import bucketize

GOLDEN_SDP = "/root/reference/test/data/end-to-end_tests/1d/output/sdp"


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    return Mesh(np.array(devs[:8]), (mesh_mod.AXIS,))


def _rand_spd(n, k, rng):
    a = rng.standard_normal((n, n))
    spd = a @ a.T + n * np.eye(n)
    out = np.zeros((n, n, k))
    out[..., 0] = spd
    # exact two-word split so words are nontrivial
    out[..., 1] = spd * 2e-18 - np.round(spd * 2e-18)
    return jnp.asarray(out)


def _shard_rows(mesh, a):
    return jax.device_put(a, NamedSharding(mesh, P(mesh_mod.AXIS)))


def test_rowpanel_cholesky_matches_dense(mesh8):
    """_cholesky_rowpanel over 8 devices == single-device blocked
    Cholesky to far below word-0 rounding."""
    rng = np.random.default_rng(0)
    n, k = 64, 3
    a = _rand_spd(n, k, rng)
    l_ref = np.asarray(la.cholesky(a))

    kern = jax.jit(shard_map(
        lambda al: dist_q._cholesky_rowpanel(al, 8), mesh=mesh8,
        in_specs=(P(mesh_mod.AXIS),), out_specs=P(mesh_mod.AXIS)))
    l_dist = np.asarray(kern(_shard_rows(mesh8, a)))

    ref_sum = l_ref.sum(-1)
    err = np.abs(l_dist.sum(-1) - ref_sum).max() / np.abs(ref_sum).max()
    assert err < 1e-28, err


def test_rowpanel_solves_match_dense(mesh8):
    rng = np.random.default_rng(1)
    n, k = 64, 3
    a = _rand_spd(n, k, rng)
    l = la.cholesky(a)
    b = np.zeros((n, k))
    b[:, 0] = rng.standard_normal(n)
    b = jnp.asarray(b)
    x_ref = np.asarray(la.cholesky_solve(l, b))

    x_dist = np.asarray(dist_q.dist_cholesky_solve(
        mesh8, _shard_rows(mesh8, np.asarray(l)), b, n))
    err = np.abs(x_dist.sum(-1) - x_ref.sum(-1)).max() / \
        np.abs(x_ref.sum(-1)).max()
    assert err < 1e-26, err


def test_padded_dual_dim(mesh8):
    """N not divisible by the device count exercises the identity
    padding corner."""
    rng = np.random.default_rng(2)
    n, k = 27, 3
    a = _rand_spd(n, k, rng)
    l = la.cholesky(a)
    b = np.zeros((n, k))
    b[:, 0] = rng.standard_normal(n)
    b = jnp.asarray(b)
    x_ref = np.asarray(la.cholesky_solve(l, b))
    # row-shard the padded factor as the kernel would produce it
    n1 = 32
    lp = np.zeros((n1, n1, k))
    lp[:n, :n] = np.asarray(l)
    lp[np.arange(n, n1), np.arange(n, n1), 0] = 1.0
    x_dist = np.asarray(dist_q.dist_cholesky_solve(
        mesh8, _shard_rows(mesh8, lp), b, n))
    err = np.abs(x_dist.sum(-1) - x_ref.sum(-1)).max() / \
        np.abs(x_ref.sum(-1)).max()
    assert err < 1e-26, err


def _mpf(words):
    ctx = mpmath.mp.clone()
    ctx.prec = 300
    return mpdec.to_mpf(np.asarray(words), ctx)


def test_dist_q_solver_trajectory(mesh8, monkeypatch):
    """Force the distributed Q path on the 1d SDP (N=3) and check the
    mesh solve matches the single-chip trajectory (same contract as
    test_mesh_solver, now through psum_scatter + row-panel kernels)."""
    monkeypatch.setattr(mesh_mod, "DIST_Q_MIN_N", 1)
    k = 3
    raw = read_sdp(GOLDEN_SDP, k=k)
    problem = bucketize(problem_from_raw(raw))
    params = SolverParams(precision=k * 53, max_iterations=5)

    res_single = solve(problem, params)
    mproblem = mesh_mod.shard_problem(problem, mesh8)
    res_mesh = solve(mproblem, params)

    assert res_mesh.reason == res_single.reason
    for r1, r2 in zip(res_single.iterations, res_mesh.iterations):
        for field in ("mu", "duality_gap", "primal_objective"):
            v1 = _mpf_dec(getattr(r1, field))
            v2 = _mpf_dec(getattr(r2, field))
            assert abs(v1 - v2) <= abs(v1) * mpmath.mpf("1e-30"), \
                (r1.iteration, field)


def _mpf_dec(dec_str):
    ctx = mpmath.mp.clone()
    ctx.prec = 300
    return ctx.mpf(dec_str)
