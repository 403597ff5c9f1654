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


def test_dist_q_matches_replicated_at_n512(mesh8):
    """N=512 (a production-scale dual dimension): the row-sharded
    psum_scatter + row-panel Cholesky path must reproduce the
    replicated path's L_Q exactly-to-format, at a size where the
    distributed path actually matters
    (`initialize_schur_complement_solver.cxx:95-104`).  Also times the
    two paths' collectives (informational, printed with -s)."""
    import time

    from sdpb_tpu.ops import mpmm
    from sdpb_tpu.solver import bucket_iteration as bi

    rng = np.random.default_rng(5)
    n, rows, k = 512, 640, 3
    xv = rng.standard_normal((rows, n)) / np.sqrt(rows)
    x = jnp.asarray(np.concatenate(
        [xv[..., None], np.zeros((rows, n, k - 1))], axis=-1))
    plan = mpmm.plan_for(53 * k, rows)

    # replicated: residues -> restore -> full-matrix Cholesky
    t0 = time.time()
    q_res, e_col = mpmm.syrk_residues_mp(x, plan)
    d_res = None
    L_rep = bi._q_restore_cholesky(q_res, e_col, jnp.asarray(True),
                                   plan, k, x)
    L_rep = np.asarray(jax.block_until_ready(L_rep))
    t_rep = time.time() - t0

    # distributed: per-device partials -> psum_scatter -> row-panel
    # Cholesky over the 8-device mesh
    part = x.reshape(8, rows // 8, n, k)
    t0 = time.time()
    parts = []
    for d in range(8):
        qr, _ = mpmm.syrk_residues_mp(part[d], plan, e_col=e_col)
        parts.append(qr[None])
    q_stack = jnp.concatenate(parts, axis=0)
    q_stack = jax.device_put(
        q_stack, jax.sharding.NamedSharding(
            mesh8, jax.sharding.PartitionSpec(dist_q.AXIS)))
    kern = dist_q._restore_chol_kernel(mesh8, plan, k, n, "float64")
    l_sh = kern(q_stack, e_col, jnp.asarray(True))
    l_sh = np.asarray(jax.block_until_ready(l_sh))
    t_dist = time.time() - t0
    print(f"\n[dist-q n=512] replicated {t_rep:.2f}s "
          f"distributed {t_dist:.2f}s (8 virtual devices)")

    assert np.isfinite(L_rep).all()
    v_rep = L_rep.sum(-1)
    v_dist = l_sh[:n, :n].sum(-1)
    denom = np.abs(np.diag(v_rep)).max()
    assert np.abs(v_dist - v_rep).max() / denom < 1e-24


def test_should_distribute_q_thresholds(mesh8, monkeypatch):
    """The distributed path engages from the memory estimate, not only
    the magic N cap."""
    from sdpb_tpu.solver import memory as mem_mod

    class P:
        def __init__(self, n, k):
            import dataclasses

            self.b = jnp.zeros((n, k))
            self.mesh = mesh8

        @property
        def dual_dim(self):
            return self.b.shape[0]

    # small N, plenty of memory -> replicated
    monkeypatch.setattr(mem_mod, "detect_device_memory",
                        lambda: 16 * 2 ** 30)
    assert not mesh_mod.should_distribute_q(P(256, 8))
    # same N, tiny device memory -> distributed
    monkeypatch.setattr(mem_mod, "detect_device_memory",
                        lambda: 2 ** 20)
    assert mesh_mod.should_distribute_q(P(256, 8))
    # giant N -> always distributed
    assert mesh_mod.should_distribute_q(P(4096, 8))
