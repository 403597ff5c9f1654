"""Bucketed interior-point iteration: one jitted kernel PER BUCKET.

Same math as solver.iteration (whose per-block kernels are reused under
vmap), but compiled as per-bucket programs plus tiny cross-bucket
combiners.  Rationale:

- compile cost is O(#distinct shapes), and each unit is small: a
  single whole-problem program for a realistic SDP (nmax6: 5 buckets,
  K=5) reaches >80k jaxpr equations and OOMs LLVM; per-bucket programs
  stay ~15k and are cached by (BlockShape, nb, K) across iterations,
  predictor/corrector, and even across problems
- the bucket is also the unit of multi-chip sharding (see
  sdpb_tpu.parallel): per-bucket kernels shard over the mesh's block
  axis, and the only cross-bucket objects are the reductions combined
  here (c.x, B^T x, Q, dy rhs, trace(XY), Frobenius, error maxima) —
  exactly the reference's cross-rank communication contract
  (`restore_and_reduce.cxx`, `Block_Diagonal_Matrix.hxx:113-130`)

The phase structure mirrors `SDP_Solver/run/run.cxx` and `step.cxx`;
per-block math anchors live in solver.iteration.
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


# ---------------------------------------------------------------------------
# Phase 1: residues (per-bucket kernel + tiny combiner)
# ---------------------------------------------------------------------------

@jax.jit
def _residues_bucket(bk, x, X, Y, y):
    """All block-local residue work for one bucket.  Returns the
    per-bucket tensors plus the bucket's contributions to the global
    reductions (c.x, B^T x, error maxima)."""
    pars = _parities(bk.shape)
    L_X = tuple(la.cholesky(X[p]) if p in pars else X[p] for p in range(2))
    L_Y = tuple(la.cholesky(Y[p]) if p in pars else Y[p] for p in range(2))

    ax, ay = _vblock(bk, lambda bl, LxT, Yb: it._pairings_block(bl, LxT, Yb),
                     L_X, tuple(Y))

    dual_res = _vblock(bk, lambda bl, ayl: it._dual_residues_block(
        bl, list(ayl), y), tuple(ay))
    derr = jnp.max(jnp.abs(mp.approx(dual_res)))

    w = _vblock(bk, lambda bl, x_: it._weighted_sum_block(bl, x_), x)
    primal_res = tuple(mp.sub(w[p], X[p]) if p in pars else w[p]
                       for p in range(2))
    perr = jnp.max(jnp.stack(
        [jnp.max(jnp.abs(mp.approx(primal_res[p]))) for p in pars]))

    cx = mp.sum_(jax.vmap(lambda c_, x_: mp.dot(c_, x_, axis=0))(bk.c, x),
                 axis=0)
    bx = mp.sum_(jax.vmap(
        lambda B_, x_: la.matvec(B_, x_, transpose=True))(bk.B, x), axis=0)
    return (L_X, L_Y, ax, ay, dual_res, primal_res, derr, perr, cx, bx)


@jax.jit
def _residues_combine(objective_const, b, y, cx_parts, bx_parts, derrs,
                      perrs):
    k = b.shape[-1]
    dtype = b.dtype
    one = jnp.asarray(mp.one_np(k, dtype))
    cx = cx_parts[0]
    for c_ in cx_parts[1:]:
        cx = mp.add(cx, c_)
    bx = bx_parts[0]
    for b_ in bx_parts[1:]:
        bx = mp.add(bx, b_)
    primal_objective = mp.add(objective_const, cx)
    dual_objective = mp.add(objective_const, mp.dot(b, y, axis=0))
    gap_num = mp.abs_(mp.sub(primal_objective, dual_objective))
    gap_den = mp.max_(
        mp.add(mp.abs_(primal_objective), mp.abs_(dual_objective)), one)
    duality_gap = mp.div(gap_num, gap_den)
    primal_res_p = mp.sub(b, bx)
    primal_error_p = jnp.max(jnp.abs(mp.approx(primal_res_p)))
    # error norms as MP scalars for threshold comparisons: f64 maxima
    # suffice (1e-16 relative granularity on 1e-30 thresholds, same as
    # what the reference prints); promote to MP.
    to_mp = lambda v: mp.const_word(v.astype(dtype), k, dtype=dtype)
    return (primal_objective, dual_objective, duality_gap,
            to_mp(jnp.max(jnp.stack(derrs))),
            to_mp(jnp.max(jnp.stack(perrs))),
            to_mp(primal_error_p), primal_res_p)


def compute_residues(problem: BucketedProblem,
                     state: BucketedState) -> Residues:
    if len(problem.buckets) <= FUSE_MAX_BUCKETS:
        parts, combined = _residues_all(problem, state)
        (primal_objective, dual_objective, duality_gap, dual_error,
         primal_error_P, primal_error_p, primal_res_p) = combined
        return Residues(primal_objective, dual_objective, duality_gap,
                        dual_error, primal_error_P, primal_error_p,
                        [p[0] for p in parts], [p[1] for p in parts],
                        [p[2] for p in parts], [p[3] for p in parts],
                        [p[4] for p in parts], [p[5] for p in parts],
                        primal_res_p)
    L_X, L_Y, ax, ay, dual_res, primal_res = [], [], [], [], [], []
    cx_parts, bx_parts, derrs, perrs = [], [], [], []
    for bi, bk in enumerate(problem.buckets):
        (lx, ly, a_, b_, d, pr, derr, perr, cx, bx) = _residues_bucket(
            bk, state.x[bi], tuple(state.X[bi]), tuple(state.Y[bi]), state.y)
        L_X.append(lx)
        L_Y.append(ly)
        ax.append(a_)
        ay.append(b_)
        dual_res.append(d)
        primal_res.append(pr)
        derrs.append(derr)
        perrs.append(perr)
        cx_parts.append(cx)
        bx_parts.append(bx)

    (primal_objective, dual_objective, duality_gap, dual_error,
     primal_error_P, primal_error_p, primal_res_p) = _residues_combine(
        problem.objective_const, problem.b, state.y, tuple(cx_parts),
        tuple(bx_parts), tuple(derrs), tuple(perrs))
    return Residues(primal_objective, dual_objective, duality_gap,
                    dual_error, primal_error_P, primal_error_p,
                    L_X, L_Y, ax, ay, dual_res, primal_res, primal_res_p)


# ---------------------------------------------------------------------------
# Phase 2a: Schur factorization
# ---------------------------------------------------------------------------
#
# Q = sum_blocks (L^-1 B)^T (L^-1 B) runs through the exact integer
# pipeline (`ops.mpmm`, the TPU redesign of `bigint_syrk`): all buckets
# share one set of power-of-2 column scales, each bucket contributes
# per-prime int32 Q residues, the residues are SUMMED (integer adds
# cannot round -> the reduction is exact, `restore_and_reduce.cxx`
# equivalent), and a single CRT restore + Cholesky closes it out.

@jax.jit
def _schur_chol_bucket(bk, ax, ay):
    """S-Cholesky and L^-1 B for one bucket.

    On the TPU limb path L^-1 B goes through the explicit blocked
    triangular inverse (`la.lower_inverse`): the wide-rhs substitution
    sweep is sequential VPU work, while T = L^-1 is tiny diagonal
    inversions plus int8-MXU matmuls and T @ B is one more matmul."""
    S = _vblock(bk, lambda bl, a, b: it._schur_complement_block(
        bl, list(a), list(b)), tuple(ax), tuple(ay))
    ls = la.cholesky(S)
    if la.use_inverse_panels(ls):
        lb = la.matmul(la.lower_inverse(ls), bk.B)
    else:
        lb = la.solve_lower(ls, bk.B)
    return ls, lb


@jax.jit
def _col_exponents(lb):
    """(N,) int32 column exponents of a bucket's stacked L^-1 B, plus
    an all-finite flag (NaN from a non-PD S-Cholesky must poison Q)."""
    from ..ops import mpmm

    e = mpmm.exponents(lb)                      # (nb, schur, N)
    finite = jnp.isfinite(jnp.max(jnp.abs(lb[..., 0])))
    return jnp.max(e, axis=(0, 1)), finite


@functools.partial(jax.jit, static_argnames=("plan",))
def _q_residues_bucket(lb, e_col, plan):
    """Per-prime Q residues of one bucket PLUS the independently
    computed diagonal residues (the corruption invariant,
    `compute_Q.cxx:66-92` role -- see exact.syrk_diag_residues_split)."""
    from ..ops import exact, mpmm

    nb, schur, n, k = lb.shape
    x = lb.reshape(nb * schur, n, k)
    u = mpmm.scale_pow2(x, -e_col[None, :])
    d = mpmm.digits_dev(u, plan)
    r_split = exact.residues_split(d, plan)
    q_res = exact.syrk_residues_split(r_split, plan)
    diag_res = exact.syrk_diag_residues_split(r_split, plan)
    return q_res, diag_res


@functools.partial(jax.jit, static_argnames=("plan", "k"))
def _q_restore_cholesky(q_sum, e_col, finite, plan, k: int, dtype_ref,
                        diag_sum=None):
    from ..ops import mpmm

    q_sum = mpmm.reduce_residues_mod(q_sum, plan)
    Q = mpmm.restore_q_mp(q_sum, e_col, plan, k, dtype_ref.dtype)
    if diag_sum is not None:
        # corruption invariant: the SYRK's reduced diagonal residues
        # must equal the independently summed squares
        # (`compute_Q.cxx:66-92`); mismatch poisons Q -> the driver
        # surfaces NonFiniteIterateError
        n = q_sum.shape[-1]
        dg = jnp.diagonal(q_sum, axis1=-2, axis2=-1)      # (P, N)
        want = mpmm.reduce_residues_mod(diag_sum, plan)
        finite = finite & jnp.all(dg == want)
    Q = jnp.where(finite, Q, jnp.asarray(jnp.nan, Q.dtype))
    return la.cholesky(Q)


def q_plan(problem: BucketedProblem):
    from ..ops import mpmm

    k = problem.b.shape[-1]
    total_rows = sum(bk.nb * bk.shape.schur_size for bk in problem.buckets)
    return mpmm.plan_for(mpmm.precision_of(problem.b.dtype, k), total_rows)


def q_block_chunk(problem: BucketedProblem, max_bytes: int | None):
    """Blocks per _q_residues_bucket call so the int8/int32 residue
    pipeline buffers stay under ``max_bytes`` -- the TPU equivalent of
    the reference's shared-memory window splitting
    (`bigint_syrk_blas.cxx:195-222`, `--maxSharedMemory`).  Integer
    accumulation across chunks is exact, so tiling never changes Q."""
    if not max_bytes:
        return None
    plan = q_plan(problem)
    n = problem.dual_dim
    # per block-row: digits (schur, N, D) int32 + split residues
    # 2 x (schur, N, P) int8
    worst = max(bk.shape.schur_size for bk in problem.buckets)
    per_block = worst * n * (plan.n_digits * 4 + 2 * plan.n_primes)
    return max(1, int(max_bytes) // max(1, per_block))


def schur_factorize(problem: BucketedProblem, res: Residues,
                    max_q_bytes: int | None = None):
    plan = q_plan(problem)
    k = problem.b.shape[-1]
    chunk = q_block_chunk(problem, max_q_bytes)
    L_S, LinvB = [], []
    e_cols, finites = [], []
    for bi, bk in enumerate(problem.buckets):
        ls, lb = _schur_chol_bucket(bk, res.ax[bi], res.ay[bi])
        L_S.append(ls)
        LinvB.append(lb)
        e, f = _col_exponents(lb)
        e_cols.append(e)
        finites.append(f)
    e_col = e_cols[0]
    finite = finites[0]
    for e, f in zip(e_cols[1:], finites[1:]):
        e_col = jnp.maximum(e_col, e)
        finite = finite & f
    q_sum = d_sum = None
    for bi, bk in enumerate(problem.buckets):
        if chunk is None or bk.nb <= chunk:
            parts = [LinvB[bi]]
        else:
            parts = [LinvB[bi][j:j + chunk]
                     for j in range(0, bk.nb, chunk)]
        for part in parts:
            q_res, d_res = _q_residues_bucket(part, e_col, plan)
            if q_sum is None:
                q_sum, d_sum = q_res, d_res
            else:
                q_sum, d_sum = q_sum + q_res, d_sum + d_res
    L_Q = _q_restore_cholesky(q_sum, e_col, finite, plan, k, problem.b,
                              d_sum)
    return L_S, LinvB, L_Q


# ---------------------------------------------------------------------------
# Phase 2b: -XY, mu, R_error
# ---------------------------------------------------------------------------

@jax.jit
def _xy_bucket(bk, X, Y):
    pars = _parities(bk.shape)
    k = bk.c.shape[-1]
    mb = []
    tr = mp.zeros((), k, dtype=bk.c.dtype)
    for p in range(2):
        if p not in pars:
            mb.append(X[p])
            continue
        mxy = mp.neg(la.matmul(X[p], Y[p]))
        mb.append(mxy)
        tr = mp.add(tr, mp.sum_(jax.vmap(la.trace)(mxy), axis=0))
    return tuple(mb), tr


@functools.partial(jax.jit, static_argnames=("total_psd_rows",))
def _mu_combine(tr_parts, total_psd_rows, max_complementarity):
    k = tr_parts[0].shape[-1]
    dtype = tr_parts[0].dtype
    tr = tr_parts[0]
    for t in tr_parts[1:]:
        tr = mp.add(tr, t)
    mu = mp.div(mp.neg(tr), mp.const_word(
        jnp.asarray(float(total_psd_rows), dtype), k, dtype=dtype))
    terminate = mp.cmp_lt(jnp.asarray(max_complementarity, dtype), mu)
    return mu, terminate


@jax.jit
def _r_error_bucket(bk, minus_XY, mu):
    pars = _parities(bk.shape)
    return jnp.max(jnp.stack([
        jnp.max(jnp.abs(mp.approx(la.add_diag(minus_XY[p], mu))))
        for p in pars]))


def compute_xy_mu(problem: BucketedProblem, state: BucketedState,
                  max_complementarity):
    minus_XY, tr_parts = [], []
    for bi, bk in enumerate(problem.buckets):
        mb, tr = _xy_bucket(bk, tuple(state.X[bi]), tuple(state.Y[bi]))
        minus_XY.append(mb)
        tr_parts.append(tr)
    mu, terminate_max_c = _mu_combine(
        tuple(tr_parts), problem.total_psd_rows, max_complementarity)
    r_errs = [np.asarray(_r_error_bucket(bk, minus_XY[bi], mu))
              for bi, bk in enumerate(problem.buckets)]
    k = problem.b.shape[-1]
    R_error = mp.from_f64_np(float(np.max(r_errs)), k, problem.b.dtype)
    return minus_XY, mu, R_error, terminate_max_c


# ---------------------------------------------------------------------------
# Phase 2c: one Newton direction (predictor AND corrector)
# ---------------------------------------------------------------------------

@jax.jit
def _search_pre_bucket(bk, x, X, Y, L_X, primal_res, dual_res, minus_XY,
                       L_S, LinvB, beta_mu, dXdY):
    """Z, R, the L_S-forward-solved dx, and the dy-rhs contribution."""
    pars = _parities(bk.shape)
    Rb, Zb = [], []
    for p in range(2):
        if p not in pars:
            Rb.append(minus_XY[p])
            Zb.append(minus_XY[p])
            continue
        R = la.add_diag(mp.sub(minus_XY[p], dXdY[p]), beta_mu)
        Rb.append(R)
        py = la.matmul(primal_res[p], Y[p])
        z = la.cholesky_solve(L_X[p], mp.sub(py, R))
        Zb.append(la.symmetrize(z))
    zp = [Zb[p] for p in pars]
    dx = _vblock(bk, lambda bl, d, *z: it._schur_rhs_block(bl, d, list(z)),
                 dual_res, *zp)
    dx = la.solve_lower(L_S, dx)
    dy_part = mp.sum_(jax.vmap(
        lambda lb, d: la.matvec(lb, d, transpose=True))(LinvB, dx), axis=0)
    return tuple(Rb), dx, dy_part


@jax.jit
def _dy_solve(primal_res_p, dy_parts, L_Q):
    dy_rhs = primal_res_p
    for part in dy_parts:
        dy_rhs = mp.sub(dy_rhs, part)
    return la.cholesky_solve(L_Q, dy_rhs)


@jax.jit
def _search_post_bucket(bk, dx, dy, L_S, LinvB, Y, L_X, primal_res, R):
    """Back-substitute dx, then dX and dY for one bucket."""
    pars = _parities(bk.shape)
    dx = mp.add(dx, jax.vmap(lambda lb: la.matvec(lb, dy))(LinvB))
    dx = la.solve_lower_t(L_S, dx)
    w = _vblock(bk, lambda bl, d: it._weighted_sum_block(bl, d), dx)
    dXb, dYb = [], []
    for p in range(2):
        if p not in pars:
            dXb.append(w[p])
            dYb.append(w[p])
            continue
        dxp = mp.add(w[p], primal_res[p])
        dXb.append(dxp)
        t = la.matmul(dxp, Y[p])
        t = la.cholesky_solve(L_X[p], mp.sub(t, R[p]))
        dYb.append(mp.neg(la.symmetrize(t)))
    return dx, tuple(dXb), tuple(dYb)


def search_direction(problem: BucketedProblem, state: BucketedState,
                     res: Residues, minus_XY, L_S, LinvB, L_Q, beta_mu, dXdY):
    """One Newton solve; predictor passes zero dXdY (see
    solver.iteration.search_direction for the reference anchors)."""
    R_list, dx_list, dy_parts = [], [], []
    for bi, bk in enumerate(problem.buckets):
        R, dx, dy_part = _search_pre_bucket(
            bk, state.x[bi], tuple(state.X[bi]), tuple(state.Y[bi]),
            res.L_X[bi], res.primal_res[bi], res.dual_res[bi],
            tuple(minus_XY[bi]), L_S[bi], LinvB[bi], beta_mu,
            tuple(dXdY[bi]))
        R_list.append(R)
        dx_list.append(dx)
        dy_parts.append(dy_part)

    dy = _dy_solve(res.primal_res_p, tuple(dy_parts), L_Q)

    dX, dY = [], []
    for bi, bk in enumerate(problem.buckets):
        dx, dXb, dYb = _search_post_bucket(
            bk, dx_list[bi], dy, L_S[bi], LinvB[bi], tuple(state.Y[bi]),
            res.L_X[bi], res.primal_res[bi], R_list[bi])
        dx_list[bi] = dx
        dX.append(dXb)
        dY.append(dYb)
    return dx_list, dX, dy, dY


def zeros_like_XY(problem: BucketedProblem, state: BucketedState):
    return [tuple(jnp.zeros_like(state.X[bi][p]) for p in range(2))
            for bi in range(len(problem.buckets))]


@jax.jit
def _pair_products_bucket(bk, dX, dY):
    pars = _parities(bk.shape)
    return tuple(la.matmul(dX[p], dY[p]) if p in pars else dX[p]
                 for p in range(2))


def pair_products(problem: BucketedProblem, dX, dY):
    return [_pair_products_bucket(bk, tuple(dX[bi]), tuple(dY[bi]))
            for bi, bk in enumerate(problem.buckets)]


# ---------------------------------------------------------------------------
# Phase 2d: corrector centering parameter
# ---------------------------------------------------------------------------

@jax.jit
def _frob_bucket(bk, X, dX, Y, dY):
    k = bk.c.shape[-1]
    frob = mp.zeros((), k, dtype=bk.c.dtype)
    for p in _parities(bk.shape):
        per = jax.vmap(lambda a, b, c_, d: la.frobenius(
            mp.add(a, b), mp.add(c_, d)))(X[p], dX[p], Y[p], dY[p])
        frob = mp.add(frob, mp.sum_(per, axis=0))
    return frob


@functools.partial(jax.jit, static_argnames=("total_psd_rows",))
def _beta_combine(frob_parts, mu, total_psd_rows, feasible,
                  feasible_centering, infeasible_centering):
    k = mu.shape[-1]
    dtype = mu.dtype
    frob = frob_parts[0]
    for f in frob_parts[1:]:
        frob = mp.add(frob, f)
    r = mp.div(frob, mp.mul_f64(mu, jnp.asarray(float(total_psd_rows),
                                                dtype)))
    one = mp.const_word(jnp.asarray(1.0, dtype), k, dtype=dtype)
    beta = mp.where(mp.cmp_lt(r, one), mp.mul(r, r), r)
    feas = mp.min_(mp.max_(jnp.asarray(feasible_centering, dtype), beta), one)
    infeas = mp.max_(jnp.asarray(infeasible_centering, dtype), beta)
    return mp.where(jnp.broadcast_to(feasible, ()), feas, infeas)


def corrector_beta(problem: BucketedProblem, state: BucketedState, dX, dY,
                   mu, feasible, feasible_centering, infeasible_centering):
    parts = [_frob_bucket(bk, tuple(state.X[bi]), tuple(dX[bi]),
                          tuple(state.Y[bi]), tuple(dY[bi]))
             for bi, bk in enumerate(problem.buckets)]
    return _beta_combine(tuple(parts), mu, problem.total_psd_rows,
                         feasible, feasible_centering, infeasible_centering)


# ---------------------------------------------------------------------------
# Phase 2e: step lengths and update
# ---------------------------------------------------------------------------

def _min_mp_over(lams):
    """MP min over the leading axis by monotonic-key argmin (exact
    leading word for expansions, log2-key for the limb format)."""
    idx = jnp.argmin(mp.lead(lams), axis=0)
    return jnp.take_along_axis(lams, idx[None, ..., None], axis=0)[0]


@jax.jit
def _lambda_bucket(bk, L_X, dX, L_Y, dY):
    k = bk.c.shape[-1]
    dtype = bk.c.dtype
    inf = mp.const_word(jnp.asarray(jnp.inf, dtype), k, dtype=dtype)
    lam_p, lam_d = inf, inf
    for p in _parities(bk.shape):
        cp = jax.vmap(la.lower_inverse_congruence)(L_X[p], dX[p])
        lam_p = it.min_mp(lam_p, _min_mp_over(
            jax.vmap(it._min_eig_mp)(cp)))
        cd = jax.vmap(la.lower_inverse_congruence)(L_Y[p], dY[p])
        lam_d = it.min_mp(lam_d, _min_mp_over(
            jax.vmap(it._min_eig_mp)(cd)))
    return lam_p, lam_d


@functools.partial(jax.jit, static_argnames=("gamma",))
def _alphas(lam_ps, lam_ds, feasible, gamma: float):
    """Full-MP step lengths (`step_length.cxx:27-46`)."""
    lam_p = _min_mp_over(jnp.stack(lam_ps))
    lam_d = _min_mp_over(jnp.stack(lam_ds))
    k = lam_p.shape[-1]
    dtype = lam_p.dtype
    alpha_p = it.alpha_mp(lam_p, gamma, k, dtype)
    alpha_d = it.alpha_mp(lam_d, gamma, k, dtype)
    both = it.min_mp(alpha_p, alpha_d)
    alpha_p = mp.where(feasible, both, alpha_p)
    alpha_d = mp.where(feasible, both, alpha_d)
    return alpha_p, alpha_d


@jax.jit
def _update_bucket(x, X, Y, dx, dX, dY, alpha_p, alpha_d):
    scale = it._scale_mp
    new_x = mp.add(x, scale(dx, alpha_p))
    new_X = tuple(mp.add(X[p], scale(dX[p], alpha_p)) if X[p].size
                  else X[p] for p in range(2))
    new_Y = tuple(mp.add(Y[p], scale(dY[p], alpha_d)) if Y[p].size
                  else Y[p] for p in range(2))
    return new_x, new_X, new_Y


@jax.jit
def _update_y(y, dy, alpha_d):
    return mp.add(y, it._scale_mp(dy, alpha_d))


def apply_step(problem: BucketedProblem, state: BucketedState, res: Residues,
               dx, dX, dy, dY, feasible, gamma: float):
    lam_ps, lam_ds = [], []
    for bi, bk in enumerate(problem.buckets):
        lp, ld = _lambda_bucket(bk, res.L_X[bi], tuple(dX[bi]),
                                res.L_Y[bi], tuple(dY[bi]))
        lam_ps.append(lp)
        lam_ds.append(ld)
    alpha_p, alpha_d = _alphas(tuple(lam_ps), tuple(lam_ds), feasible, gamma)

    new_x, new_X, new_Y = [], [], []
    for bi in range(len(problem.buckets)):
        nx, nX, nY = _update_bucket(
            state.x[bi], tuple(state.X[bi]), tuple(state.Y[bi]),
            dx[bi], tuple(dX[bi]), tuple(dY[bi]), alpha_p, alpha_d)
        new_x.append(nx)
        new_X.append(nX)
        new_Y.append(nY)
    new_state = BucketedState(x=new_x, y=_update_y(state.y, dy, alpha_d),
                              X=new_X, Y=new_Y)
    return new_state, mp.fst(alpha_p), mp.fst(alpha_d)


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


# ---------------------------------------------------------------------------
# Fused-phase path: one jitted program per phase ACROSS buckets.
#
# Per-bucket kernels cost one dispatch each; on a remote-attached TPU
# (and to a lesser degree locally) dispatch RPCs dominate an iteration
# with many small kernels (~35 calls/iteration in the per-bucket path).
# For problems with few distinct shapes the phases are fused across
# buckets -- ~7 dispatches per iteration -- and the condition-number
# reductions run on-device instead of per-bucket host fetches.  Guarded
# by bucket count: jaxpr size scales with the number of buckets, and a
# whole-problem program at nmax6 scale (5 buckets, K=5) overruns LLVM
# (see module docstring), so many-bucket problems keep per-bucket
# kernels.
# ---------------------------------------------------------------------------

import os as _os

FUSE_MAX_BUCKETS = int(_os.environ.get("SDPB_TPU_FUSE_MAX_BUCKETS", "3"))


@jax.jit
def _residues_all(problem, state):
    parts = [
        _residues_bucket.__wrapped__(bk, state.x[bi], tuple(state.X[bi]),
                                     tuple(state.Y[bi]), state.y)
        for bi, bk in enumerate(problem.buckets)]
    combined = _residues_combine.__wrapped__(
        problem.objective_const, problem.b, state.y,
        tuple(p[8] for p in parts), tuple(p[9] for p in parts),
        tuple(p[6] for p in parts), tuple(p[7] for p in parts))
    return parts, combined


@functools.partial(jax.jit, static_argnames=("plan", "max_q_chunk"))
def _schur_all(problem, res, plan, max_q_chunk):
    k = problem.b.shape[-1]
    L_S, LinvB, e_cols, fins = [], [], [], []
    for bi, bk in enumerate(problem.buckets):
        ls, lb = _schur_chol_bucket.__wrapped__(bk, res.ax[bi], res.ay[bi])
        L_S.append(ls)
        LinvB.append(lb)
        e, f = _col_exponents.__wrapped__(lb)
        e_cols.append(e)
        fins.append(f)
    e_col, finite = e_cols[0], fins[0]
    for e, f in zip(e_cols[1:], fins[1:]):
        e_col = jnp.maximum(e_col, e)
        finite = finite & f
    q_sum = d_sum = None
    for bi, bk in enumerate(problem.buckets):
        if max_q_chunk is None or bk.nb <= max_q_chunk:
            parts = [LinvB[bi]]
        else:
            parts = [LinvB[bi][j:j + max_q_chunk]
                     for j in range(0, bk.nb, max_q_chunk)]
        for part in parts:
            q_res, d_res = _q_residues_bucket.__wrapped__(part, e_col,
                                                          plan)
            if q_sum is None:
                q_sum, d_sum = q_res, d_res
            else:
                q_sum, d_sum = q_sum + q_res, d_sum + d_res
    L_Q = _q_restore_cholesky.__wrapped__(q_sum, e_col, finite, plan, k,
                                          problem.b, d_sum)
    return L_S, LinvB, L_Q


@jax.jit
def _xy_all(problem, state, max_complementarity):
    k = problem.b.shape[-1]
    minus_XY, tr_parts = [], []
    for bi, bk in enumerate(problem.buckets):
        mb, tr = _xy_bucket.__wrapped__(bk, tuple(state.X[bi]),
                                        tuple(state.Y[bi]))
        minus_XY.append(mb)
        tr_parts.append(tr)
    mu, terminate = _mu_combine.__wrapped__(
        tuple(tr_parts), problem.total_psd_rows, max_complementarity)
    r_err = jnp.max(jnp.stack([
        _r_error_bucket.__wrapped__(bk, tuple(minus_XY[bi]), mu)
        for bi, bk in enumerate(problem.buckets)]))
    dtype = problem.b.dtype
    R_error = mp.const_word(r_err.astype(dtype), k, dtype=dtype)
    return minus_XY, mu, R_error, terminate


@jax.jit
def _search_all(problem, state, res, minus_XY, L_S, LinvB, L_Q, beta_mu,
                dXdY):
    R_list, dx_list, dy_parts = [], [], []
    for bi, bk in enumerate(problem.buckets):
        R, dx, dy_part = _search_pre_bucket.__wrapped__(
            bk, state.x[bi], tuple(state.X[bi]), tuple(state.Y[bi]),
            res.L_X[bi], res.primal_res[bi], res.dual_res[bi],
            tuple(minus_XY[bi]), L_S[bi], LinvB[bi], beta_mu,
            tuple(dXdY[bi]))
        R_list.append(R)
        dx_list.append(dx)
        dy_parts.append(dy_part)
    dy = _dy_solve.__wrapped__(res.primal_res_p, tuple(dy_parts), L_Q)
    dX, dY = [], []
    for bi, bk in enumerate(problem.buckets):
        dx, dXb, dYb = _search_post_bucket.__wrapped__(
            bk, dx_list[bi], dy, L_S[bi], LinvB[bi], tuple(state.Y[bi]),
            res.L_X[bi], res.primal_res[bi], R_list[bi])
        dx_list[bi] = dx
        dX.append(dXb)
        dY.append(dYb)
    return dx_list, dX, dy, dY


@jax.jit
def _beta_pairs_all(problem, state, dX, dY, mu, feasible,
                    feasible_centering, infeasible_centering):
    parts = [
        _frob_bucket.__wrapped__(bk, tuple(state.X[bi]), tuple(dX[bi]),
                                 tuple(state.Y[bi]), tuple(dY[bi]))
        for bi, bk in enumerate(problem.buckets)]
    beta = _beta_combine.__wrapped__(
        tuple(parts), mu, problem.total_psd_rows, feasible,
        feasible_centering, infeasible_centering)
    dXdY = [_pair_products_bucket.__wrapped__(bk, tuple(dX[bi]),
                                              tuple(dY[bi]))
            for bi, bk in enumerate(problem.buckets)]
    return beta, dXdY


@functools.partial(jax.jit, static_argnames=("gamma",))
def _finish_all(problem, state, res, L_S, L_Q, dx, dX, dy, dY, feasible,
                gamma):
    lam_ps, lam_ds = [], []
    for bi, bk in enumerate(problem.buckets):
        lp, ld = _lambda_bucket.__wrapped__(
            bk, res.L_X[bi], tuple(dX[bi]), res.L_Y[bi], tuple(dY[bi]))
        lam_ps.append(lp)
        lam_ds.append(ld)
    alpha_p, alpha_d = _alphas.__wrapped__(
        tuple(lam_ps), tuple(lam_ds), feasible, gamma)
    new_x, new_X, new_Y = [], [], []
    for bi in range(len(problem.buckets)):
        nx, nX, nY = _update_bucket.__wrapped__(
            state.x[bi], tuple(state.X[bi]), tuple(state.Y[bi]),
            dx[bi], tuple(dX[bi]), tuple(dY[bi]), alpha_p, alpha_d)
        new_x.append(nx)
        new_X.append(nX)
        new_Y.append(nY)
    new_state = BucketedState(x=new_x, y=_update_y.__wrapped__(
        state.y, dy, alpha_d), X=new_X, Y=new_Y)
    # condition numbers, on-device (the per-bucket path fetches these
    # one np.asarray at a time -- synchronous round-trips)
    q_cond = la.cholesky_condition_estimate(L_Q)
    conds = []
    for bi, bk in enumerate(problem.buckets):
        conds.append(jax.vmap(la.cholesky_condition_estimate)(L_S[bi]))
        for p in _parities(bk.shape):
            conds.append(jax.vmap(la.cholesky_condition_estimate)(
                res.L_X[bi][p]))
            conds.append(jax.vmap(la.cholesky_condition_estimate)(
                res.L_Y[bi][p]))
    flat = jnp.concatenate([c.reshape(-1) for c in conds])
    which = jnp.argmax(flat)
    return (new_state, mp.fst(alpha_p), mp.fst(alpha_d), q_cond,
            jnp.max(flat), which)


def _cond_names(problem: BucketedProblem):
    names = []
    for bi, bk in enumerate(problem.buckets):
        names.extend(f"schur_complement_cholesky.block_{j}"
                     for j in bk.block_indices)
        for p in _parities(bk.shape):
            names.extend(f"X_cholesky.block_{j}_{p}"
                         for j in bk.block_indices)
            names.extend(f"Y_cholesky.block_{j}_{p}"
                         for j in bk.block_indices)
    return names


def _compute_step_fused(problem, state, res, params,
                        is_primal_and_dual_feasible: bool):
    dtype = problem.b.dtype
    k = problem.b.shape[-1]
    feasible = jnp.asarray(is_primal_and_dual_feasible)
    plan = q_plan(problem)
    chunk = q_block_chunk(problem, params.max_shared_memory_bytes)

    L_S, LinvB, L_Q = _schur_all(problem, res, plan, chunk)
    minus_XY, mu, R_error, terminate_max_c = _xy_all(
        problem, state, np.asarray(params.max_complementarity_mp(dtype)))

    beta_pred = jnp.asarray(
        params.predictor_beta(is_primal_and_dual_feasible, k, dtype))
    dx, dX, dy, dY = _search_all(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_pred, mu), zeros_like_XY(problem, state))

    beta_corrector, dXdY = _beta_pairs_all(
        problem, state, dX, dY, mu, feasible,
        np.asarray(params.feasible_centering_mp(dtype)),
        np.asarray(params.infeasible_centering_mp(dtype)))

    dx, dX, dy, dY = _search_all(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_corrector, mu), dXdY)

    (new_state, alpha_p, alpha_d, q_cond, max_cond, which) = _finish_all(
        problem, state, res, L_S, L_Q, dx, dX, dy, dY, feasible,
        params.step_length_reduction)

    names = _cond_names(problem)
    which = int(np.asarray(which))
    info = StepInfo(mu=mu, beta_corrector=beta_corrector,
                    primal_step=alpha_p, dual_step=alpha_d,
                    R_error=R_error,
                    terminate_max_complementarity=terminate_max_c,
                    q_cond=float(np.asarray(q_cond)),
                    max_block_cond=float(np.asarray(max_cond)),
                    max_block_cond_name=names[which] if names else "")
    return new_state, info


def compute_step(problem: BucketedProblem, state: BucketedState,
                 res: Residues, params, is_primal_and_dual_feasible: bool):
    """Host-orchestrated predictor-corrector step (kernel-per-bucket)."""
    if len(problem.buckets) <= FUSE_MAX_BUCKETS:
        return _compute_step_fused(problem, state, res, params,
                                   is_primal_and_dual_feasible)
    dtype = problem.b.dtype
    k = problem.b.shape[-1]
    feasible = jnp.asarray(is_primal_and_dual_feasible)

    L_S, LinvB, L_Q = schur_factorize(
        problem, res, max_q_bytes=params.max_shared_memory_bytes)
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
