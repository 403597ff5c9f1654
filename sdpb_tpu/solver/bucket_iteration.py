"""Bucketed interior-point iteration: vmap over same-shape blocks.

Same phase structure and math as solver.iteration (whose per-block
kernels are reused under vmap), but blocks of identical shape are
stacked, so compile cost is O(#distinct shapes), not O(J) — the
equivalent of the reference running the same code on every block of a
`Block_Info` group.  This module is the production path for many-block
problems and the basis of the mesh-sharded multi-chip step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mp import core as mp
from ..mp import linalg as la
from . import iteration as it
from .data import BucketedProblem, BucketedState, SDPBlock


def _parities(shape):
    return [p for p in range(2) if shape.psd_size(p) > 0]


def _vblock(bk, fn, *args):
    """vmap a per-block kernel over the bucket axis."""
    shape = bk.shape

    def wrapped(c_, B_, q_, u_, *rest):
        bl = SDPBlock(c=c_, B=B_, q=q_, u=u_, shape=shape)
        return fn(bl, *rest)

    return jax.vmap(wrapped)(bk.c, bk.B, bk.q, bk.u, *args)


def _empty_like_parity(bk, state_X, p):
    return state_X[p]


class Residues(NamedTuple):
    primal_objective: jax.Array
    dual_objective: jax.Array
    duality_gap: jax.Array
    dual_error: jax.Array
    primal_error_P: jax.Array
    primal_error_p: jax.Array
    L_X: list
    L_Y: list
    ax: list
    ay: list
    dual_res: list
    primal_res: list
    primal_res_p: jax.Array


@jax.jit
def compute_residues(problem: BucketedProblem,
                     state: BucketedState) -> Residues:
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    one = jnp.zeros((k,), dtype).at[0].set(1.0)

    cx = mp.zeros((), k, dtype=dtype)
    for bk, x in zip(problem.buckets, state.x):
        per = jax.vmap(lambda c_, x_: mp.dot(c_, x_, axis=0))(bk.c, x)
        cx = mp.add(cx, mp.sum_(per, axis=0))
    primal_objective = mp.add(problem.objective_const, cx)
    dual_objective = mp.add(problem.objective_const,
                            mp.dot(problem.b, state.y, axis=0))
    gap_num = mp.abs_(mp.sub(primal_objective, dual_objective))
    gap_den = mp.max_(
        mp.add(mp.abs_(primal_objective), mp.abs_(dual_objective)), one)
    duality_gap = mp.div(gap_num, gap_den)

    L_X, L_Y, ax, ay, dual_res, primal_res = [], [], [], [], [], []
    derr, perr = [], []
    for bi, bk in enumerate(problem.buckets):
        pars = _parities(bk.shape)
        lx = tuple(la.cholesky(state.X[bi][p]) if p in pars else
                   state.X[bi][p] for p in range(2))
        ly = tuple(la.cholesky(state.Y[bi][p]) if p in pars else
                   state.Y[bi][p] for p in range(2))
        L_X.append(lx)
        L_Y.append(ly)

        a_, b_ = _vblock(bk, lambda bl, LxT, Yb: it._pairings_block(bl, LxT, Yb),
                         lx, tuple(state.Y[bi]))
        ax.append(a_)
        ay.append(b_)

        d = _vblock(bk, lambda bl, ayl: it._dual_residues_block(
            bl, list(ayl), state.y), tuple(b_))
        dual_res.append(d)
        derr.append(jnp.max(jnp.abs(mp.to_f64(d))))

        w = _vblock(bk, lambda bl, x_: it._weighted_sum_block(bl, x_),
                    state.x[bi])
        pr = tuple(mp.sub(w[p], state.X[bi][p]) if p in pars else w[p]
                   for p in range(2))
        primal_res.append(pr)
        for p in pars:
            perr.append(jnp.max(jnp.abs(mp.to_f64(pr[p]))))

    dual_error = jnp.max(jnp.stack(derr))
    primal_error_P = jnp.max(jnp.stack(perr))

    bx = mp.zeros((problem.dual_dim,), k, dtype=dtype)
    for bk, x in zip(problem.buckets, state.x):
        per = jax.vmap(lambda B_, x_: la.matvec(B_, x_, transpose=True))(
            bk.B, x)
        bx = mp.add(bx, mp.sum_(per, axis=0))
    primal_res_p = mp.sub(problem.b, bx)
    primal_error_p = jnp.max(jnp.abs(mp.to_f64(primal_res_p)))

    # error norms as MP scalars for threshold comparisons: f64 maxima
    # suffice (they gate 1e-30 thresholds with 1e-16 relative accuracy,
    # the same granularity the reference prints); promote to MP.
    to_mp = lambda v: mp.from_f64(v, k, dtype=dtype)
    return Residues(primal_objective, dual_objective, duality_gap,
                    to_mp(dual_error), to_mp(primal_error_P),
                    to_mp(primal_error_p),
                    L_X, L_Y, ax, ay, dual_res, primal_res, primal_res_p)


@jax.jit
def schur_factorize(problem: BucketedProblem, res: Residues):
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    L_S, LinvB = [], []
    Q = mp.zeros((problem.dual_dim, problem.dual_dim), k, dtype=dtype)
    for bi, bk in enumerate(problem.buckets):
        S = _vblock(bk, lambda bl, a, b: it._schur_complement_block(
            bl, list(a), list(b)), tuple(res.ax[bi]), tuple(res.ay[bi]))
        ls = la.cholesky(S)
        lb = la.solve_lower(ls, bk.B)
        L_S.append(ls)
        LinvB.append(lb)
        per = jax.vmap(lambda m_: la.matmul(m_, m_, transpose_a=True))(lb)
        Q = mp.add(Q, mp.sum_(per, axis=0))
    L_Q = la.cholesky(Q)
    return L_S, LinvB, L_Q


@jax.jit
def compute_xy_mu(problem: BucketedProblem, state: BucketedState,
                  max_complementarity):
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    minus_XY = []
    tr = mp.zeros((), k, dtype=dtype)
    r_errs = []
    for bi, bk in enumerate(problem.buckets):
        pars = _parities(bk.shape)
        mb = []
        for p in range(2):
            if p not in pars:
                mb.append(state.X[bi][p])
                continue
            mxy = mp.neg(la.matmul(state.X[bi][p], state.Y[bi][p]))
            mb.append(mxy)
            tr = mp.add(tr, mp.sum_(jax.vmap(la.trace)(mxy), axis=0))
        minus_XY.append(tuple(mb))
    mu = mp.div(mp.neg(tr), mp.from_f64(
        jnp.asarray(float(problem.total_psd_rows)), k, dtype=dtype))
    terminate_max_c = mp.cmp_lt(jnp.asarray(max_complementarity, dtype), mu)
    for bi, bk in enumerate(problem.buckets):
        for p in _parities(bk.shape):
            r = la.add_diag(minus_XY[bi][p], mu)
            r_errs.append(jnp.max(jnp.abs(mp.to_f64(r))))
    R_error = mp.from_f64(jnp.max(jnp.stack(r_errs)), k, dtype=dtype)
    return minus_XY, mu, R_error, terminate_max_c


@jax.jit
def search_direction(problem: BucketedProblem, state: BucketedState,
                     res: Residues, minus_XY, L_S, LinvB, L_Q, beta_mu, dXdY):
    """One Newton solve; predictor passes zero dXdY (see
    solver.iteration.search_direction for the reference anchors)."""
    dx_list = []
    Z_list = []
    R_list = []
    for bi, bk in enumerate(problem.buckets):
        pars = _parities(bk.shape)
        Rb, Zb = [], []
        for p in range(2):
            if p not in pars:
                Rb.append(minus_XY[bi][p])
                Zb.append(minus_XY[bi][p])
                continue
            R = la.add_diag(mp.sub(minus_XY[bi][p], dXdY[bi][p]), beta_mu)
            Rb.append(R)
            py = la.matmul(res.primal_res[bi][p], state.Y[bi][p])
            z = la.cholesky_solve(res.L_X[bi][p], mp.sub(py, R))
            Zb.append(la.symmetrize(z))
        R_list.append(tuple(Rb))
        Z_list.append(tuple(Zb))
        zp = [Z_list[bi][p] for p in pars]
        dx = _vblock(bk, lambda bl, d, *z: it._schur_rhs_block(bl, d, list(z)),
                     res.dual_res[bi], *zp)
        dx_list.append(la.solve_lower(L_S[bi], dx))

    dy_rhs = res.primal_res_p
    for bi in range(len(problem.buckets)):
        per = jax.vmap(lambda lb, d: la.matvec(lb, d, transpose=True))(
            LinvB[bi], dx_list[bi])
        dy_rhs = mp.sub(dy_rhs, mp.sum_(per, axis=0))
    dy = la.cholesky_solve(L_Q, dy_rhs)

    dX, dY = [], []
    for bi, bk in enumerate(problem.buckets):
        pars = _parities(bk.shape)
        dx = mp.add(dx_list[bi],
                    jax.vmap(lambda lb: la.matvec(lb, dy))(LinvB[bi]))
        dx = la.solve_lower_t(L_S[bi], dx)
        dx_list[bi] = dx
        w = _vblock(bk, lambda bl, d: it._weighted_sum_block(bl, d), dx)
        dXb, dYb = [], []
        for p in range(2):
            if p not in pars:
                dXb.append(w[p])
                dYb.append(w[p])
                continue
            dxp = mp.add(w[p], res.primal_res[bi][p])
            dXb.append(dxp)
            t = la.matmul(dxp, state.Y[bi][p])
            t = la.cholesky_solve(res.L_X[bi][p], mp.sub(t, R_list[bi][p]))
            dYb.append(mp.neg(la.symmetrize(t)))
        dX.append(tuple(dXb))
        dY.append(tuple(dYb))
    return dx_list, dX, dy, dY


@jax.jit
def zeros_like_XY(problem: BucketedProblem, state: BucketedState):
    return [tuple(jnp.zeros_like(state.X[bi][p]) for p in range(2))
            for bi in range(len(problem.buckets))]


@jax.jit
def pair_products(problem: BucketedProblem, dX, dY):
    out = []
    for bi, bk in enumerate(problem.buckets):
        pars = _parities(bk.shape)
        out.append(tuple(
            la.matmul(dX[bi][p], dY[bi][p]) if p in pars else dX[bi][p]
            for p in range(2)))
    return out


@jax.jit
def corrector_beta(problem: BucketedProblem, state: BucketedState, dX, dY,
                   mu, feasible, feasible_centering, infeasible_centering):
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    frob = mp.zeros((), k, dtype=dtype)
    for bi, bk in enumerate(problem.buckets):
        for p in _parities(bk.shape):
            per = jax.vmap(lambda a, b, c_, d: la.frobenius(
                mp.add(a, b), mp.add(c_, d)))(
                state.X[bi][p], dX[bi][p], state.Y[bi][p], dY[bi][p])
            frob = mp.add(frob, mp.sum_(per, axis=0))
    r = mp.div(frob, mp.mul_f64(mu, jnp.asarray(
        float(problem.total_psd_rows), dtype)))
    one = mp.from_f64(jnp.asarray(1.0), k, dtype=dtype)
    beta = mp.where(mp.cmp_lt(r, one), mp.mul(r, r), r)
    feas = mp.min_(mp.max_(jnp.asarray(feasible_centering, dtype), beta), one)
    infeas = mp.max_(jnp.asarray(infeasible_centering, dtype), beta)
    return mp.where(jnp.broadcast_to(feasible, ()), feas, infeas)


@functools.partial(jax.jit, static_argnames=("gamma",))
def apply_step(problem: BucketedProblem, state: BucketedState, res: Residues,
               dx, dX, dy, dY, feasible, gamma: float):
    lam_p = jnp.asarray(jnp.inf, jnp.float64)
    lam_d = jnp.asarray(jnp.inf, jnp.float64)
    for bi, bk in enumerate(problem.buckets):
        for p in _parities(bk.shape):
            cp = jax.vmap(la.lower_inverse_congruence)(
                res.L_X[bi][p], dX[bi][p])
            lam_p = jnp.minimum(lam_p, jnp.min(jax.vmap(it._min_eig_f64)(cp)))
            cd = jax.vmap(la.lower_inverse_congruence)(
                res.L_Y[bi][p], dY[bi][p])
            lam_d = jnp.minimum(lam_d, jnp.min(jax.vmap(it._min_eig_f64)(cd)))

    def to_alpha(lam):
        return jnp.where(lam > -gamma, 1.0, -gamma / lam)

    alpha_p = to_alpha(lam_p)
    alpha_d = to_alpha(lam_d)
    both = jnp.minimum(alpha_p, alpha_d)
    alpha_p = jnp.where(feasible, both, alpha_p)
    alpha_d = jnp.where(feasible, both, alpha_d)

    nb = len(problem.buckets)
    new_state = BucketedState(
        x=[mp.add(state.x[bi], mp.mul_f64(dx[bi], alpha_p))
           for bi in range(nb)],
        y=mp.add(state.y, mp.mul_f64(dy, alpha_d)),
        X=[tuple(mp.add(state.X[bi][p], mp.mul_f64(dX[bi][p], alpha_p))
                 for p in range(2)) for bi in range(nb)],
        Y=[tuple(mp.add(state.Y[bi][p], mp.mul_f64(dY[bi][p], alpha_d))
                 for p in range(2)) for bi in range(nb)],
    )
    return new_state, alpha_p, alpha_d


class StepInfo(NamedTuple):
    mu: jax.Array
    beta_corrector: jax.Array
    primal_step: jax.Array
    dual_step: jax.Array
    R_error: jax.Array
    terminate_max_complementarity: jax.Array
    q_cond: float = 0.0
    max_block_cond: float = 0.0
    max_block_cond_name: str = ""


def compute_step(problem: BucketedProblem, state: BucketedState,
                 res: Residues, params, is_primal_and_dual_feasible: bool):
    """Host-orchestrated predictor-corrector step (phase-per-jit)."""
    dtype = problem.b.dtype
    k = problem.b.shape[-1]
    feasible = jnp.asarray(is_primal_and_dual_feasible)

    L_S, LinvB, L_Q = schur_factorize(problem, res)
    minus_XY, mu, R_error, terminate_max_c = compute_xy_mu(
        problem, state, np.asarray(params.max_complementarity_mp(dtype)))

    beta_pred = jnp.asarray(
        params.predictor_beta(is_primal_and_dual_feasible, k, dtype))
    dx, dX, dy, dY = search_direction(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_pred, mu), zeros_like_XY(problem, state))

    beta_corrector = corrector_beta(
        problem, state, dX, dY, mu, feasible,
        np.asarray(params.feasible_centering_mp(dtype)),
        np.asarray(params.infeasible_centering_mp(dtype)))

    dx, dX, dy, dY = search_direction(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_corrector, mu), pair_products(problem, dX, dY))

    new_state, alpha_p, alpha_d = apply_step(
        problem, state, res, dx, dX, dy, dY, feasible,
        params.step_length_reduction)

    q_cond = float(la.cholesky_condition_estimate(L_Q))
    max_c, max_name = 0.0, ""
    for bi, bk in enumerate(problem.buckets):
        conds = np.asarray(jax.vmap(la.cholesky_condition_estimate)(L_S[bi]))
        for pos, j in enumerate(bk.block_indices):
            if conds[pos] > max_c:
                max_c = float(conds[pos])
                max_name = f"schur_complement_cholesky.block_{j}"
        for p in _parities(bk.shape):
            cx_ = np.asarray(jax.vmap(la.cholesky_condition_estimate)(
                res.L_X[bi][p]))
            cy_ = np.asarray(jax.vmap(la.cholesky_condition_estimate)(
                res.L_Y[bi][p]))
            for pos, j in enumerate(bk.block_indices):
                if cx_[pos] > max_c:
                    max_c, max_name = float(cx_[pos]), \
                        f"X_cholesky.block_{j}_{p}"
                if cy_[pos] > max_c:
                    max_c, max_name = float(cy_[pos]), \
                        f"Y_cholesky.block_{j}_{p}"

    info = StepInfo(mu=mu, beta_corrector=beta_corrector,
                    primal_step=alpha_p, dual_step=alpha_d,
                    R_error=R_error,
                    terminate_max_complementarity=terminate_max_c,
                    q_cond=q_cond, max_block_cond=max_c,
                    max_block_cond_name=max_name)
    return new_state, info
