"""One interior-point iteration, as two jitted phases.

Phase 1 (``compute_residues``) mirrors the top of the reference loop
(`SDP_Solver/run/run.cxx:380-417`): objectives, X/Y Cholesky, bilinear
pairings, dual/primal residues and error norms.  The host then decides
feasibility/termination (`run/compute_feasible_and_termination.cxx`).

Phase 2 (``compute_step``) mirrors `run/step/step.cxx`: Schur
complement S, its Cholesky, the global Q = (L^-1 B)^T (L^-1 B), the
Mehrotra predictor-corrector search directions, step lengths via
lambda_min, and the iterate update.

All math is multi-word MP arithmetic (sdpb_tpu.mp); matrices are dense
per PSD-parity block.  Functions are written per-block and looped over
the (static) block list; the block loop is the data-parallel axis for
multi-device sharding.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mp import core as mp
from ..mp import linalg as la
from .data import SDPProblem, SolverState


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------

def _max_abs_scalar(*mps):
    """max of |MP scalar| over a list -> MP scalar (K,)."""
    out = mp.abs_(mps[0])
    for m_ in mps[1:]:
        out = mp.max_(out, mp.abs_(m_))
    return out


def _block_max_abs(mat):
    """max |entry| of an MP matrix -> (K,)."""
    k = mat.shape[-1]
    return mp.max_abs(mat.reshape(-1, k))


def _parities(bl):
    """Indices of non-empty parity blocks (odd basis can be empty)."""
    return [p for p in range(2) if bl.shape.psd_size(p) > 0]


def _make_symmetric_lower(a):
    """Mirror the element-level lower triangle to the upper, matching
    El::MakeSymmetric(LOWER) calls in the reference pairing/Schur code."""
    n = a.shape[-3]
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    lower = rows >= cols
    return jnp.where(lower[..., None], a, jnp.swapaxes(a, -3, -2))


# ---------------------------------------------------------------------------
# Bilinear pairings (reference: run/compute_bilinear_pairings/*)
# ---------------------------------------------------------------------------

def _pairings_block(bl, L_X, Y):
    """A_X_inv = U^T X^{-1} U and A_Y = U^T Y U per parity, reshaped to
    (m, pts, m, pts, K)."""
    m, pts = bl.shape.m, bl.shape.pts
    ax, ay = [], []
    for p in _parities(bl):
        u = bl.u[p]
        t = la.solve_lower(L_X[p], u)
        ax_full = _make_symmetric_lower(la.matmul(t, t, transpose_a=True))
        yu = la.matmul(Y[p], u)
        ay_full = _make_symmetric_lower(la.matmul(u, yu, transpose_a=True))
        k = ax_full.shape[-1]
        ax.append(ax_full.reshape(m, pts, m, pts, k))
        ay.append(ay_full.reshape(m, pts, m, pts, k))
    return ax, ay


# ---------------------------------------------------------------------------
# Residues (reference: run/compute_*_residues_*.cxx)
# ---------------------------------------------------------------------------

def _dual_residues_block(bl, ay_list, y):
    """d[p] = c[p] - Tr(A_p Y) - (B y)_p  per block.

    Tr(A_(s,r,k) Y) = sum_parity A_Y[r, k, s, k]
    (`compute_dual_residues_and_error.cxx:30-46`)."""
    s_idx, r_idx = bl.shape.tuple_indices()
    pts = bl.shape.pts
    k = bl.c.shape[-1]
    tr = mp.zeros((bl.shape.n_tuples, pts), k, dtype=bl.c.dtype)
    for ay in ay_list:
        kk = jnp.arange(pts)
        # ay[r, k, s, k] for each tuple t=(s,r) and point k
        sub = ay[r_idx[:, None], kk[None, :], s_idx[:, None], kk[None, :], :]
        tr = mp.add(tr, sub)
    d = mp.sub(bl.c, tr.reshape(bl.shape.schur_size, k))
    by = la.matvec(bl.B, y)
    return mp.sub(d, by)


def _weighted_sum_block(bl, a_vec):
    """sum_p a[p] A_p as a parity pair of dense matrices
    (`constraint_matrix_weighted_sum.cxx`):
    sub-block (r,s) of the result = coeff * q diag(a_(s,r,:)) q^T,
    coeff = 1 on diagonal tuples, 1/2 off-diagonal, symmetrized."""
    m, pts = bl.shape.m, bl.shape.pts
    k = a_vec.shape[-1]
    s_idx, r_idx = bl.shape.tuple_indices()
    a_t = a_vec.reshape(bl.shape.n_tuples, pts, k)
    # Symmetric coefficient tensor w[a,b,k] over the m x m grid:
    # w[a,b] = a_(max,min) * (1 if a==b else 1/2)
    A = np.arange(m)
    hi = np.maximum(A[:, None], A[None, :])
    lo = np.minimum(A[:, None], A[None, :])
    t_of = (hi * (hi + 1)) // 2 + lo            # (m, m) tuple index
    w = a_t[t_of.reshape(-1)].reshape(m, m, pts, k)
    half = jnp.asarray(np.where(A[:, None] == A[None, :], 1.0, 0.5),
                       a_vec.dtype)
    w = mp.mul_pow2(w, half[:, :, None, None])
    out = []
    for p in range(2):
        h = bl.shape.he if p == 0 else bl.shape.ho
        if h == 0:
            out.append(mp.zeros((0, 0), k, dtype=a_vec.dtype))
            continue
        q = bl.q[p]                              # (h, pts, K)
        # tmp[a,b,i,kp] = q[i,kp] * w[a,b,kp]
        tmp = mp.mul(q[None, None], w[:, :, None, :, :])
        # full[a,b,i,j] = sum_kp tmp[a,b,i,kp] q[j,kp]
        full = la.matmul(tmp, jnp.broadcast_to(
            la.transpose(q)[None, None], (m, m, pts, h, k)))
        # (a, b, i, j, K) -> (a, i, b, j, K) -> dense (m*h, m*h, K)
        full = jnp.moveaxis(full, 2, 1)
        out.append(full.reshape(m * h, m * h, k))
    return out


def _schur_rhs_block(bl, dres, Z):
    """dx[p] = -d[p] - Tr(A_p Z)  (`compute_schur_RHS.cxx`):
    Tr(A_(s,r,k) Z) = sum_parity (q^T Z[r,s] q)_kk."""
    m, pts = bl.shape.m, bl.shape.pts
    k = dres.shape[-1]
    s_idx, r_idx = bl.shape.tuple_indices()
    total = mp.zeros((bl.shape.n_tuples, pts), k, dtype=dres.dtype)
    for p, Zp in zip(_parities(bl), Z):
        h = bl.shape.he if p == 0 else bl.shape.ho
        q = bl.q[p]
        z4 = Zp.reshape(m, h, m, h, k)
        # m1[r, a, s, kp] = sum_b z4[r,a,s,b] q[b,kp]
        m1 = la.matmul(z4, jnp.broadcast_to(q[None, None], (m, h, h, pts, k)))
        # term[r, s, kp] = sum_a q[a,kp] m1[r,a,s,kp]
        term = mp.sum_(mp.mul(q[None, :, None, :, :], m1), axis=1)
        sub = term[r_idx[:, None], s_idx[:, None], jnp.arange(pts)[None, :], :]
        total = mp.add(total, sub)
    return mp.sub(mp.neg(dres), total.reshape(bl.shape.schur_size, k))


# ---------------------------------------------------------------------------
# Schur complement S (reference: compute_schur_complement.cxx)
# ---------------------------------------------------------------------------

def _schur_complement_block(bl, ax_list, ay_list):
    """S block of size schur_size, from the 4-term symmetrized product
    of pairing sub-blocks."""
    pts = bl.shape.pts
    s_idx, r_idx = bl.shape.tuple_indices()
    T = bl.shape.n_tuples
    k = bl.c.shape[-1]
    s0 = s_idx[:, None]
    r0 = r_idx[:, None]
    s1 = s_idx[None, :]
    r1 = r_idx[None, :]

    acc = None
    for ax, ay in zip(ax_list, ay_list):
        def g(t, a, b):
            # t[a, u, b, v] gathered over tuple index grids -> (T,T,pts,pts,K)
            return t[a[..., None, None], jnp.arange(pts)[None, None, :, None],
                     b[..., None, None], jnp.arange(pts)[None, None, None, :], :]

        term = mp.mul(g(ax, s0, r1), g(ay, r0, s1))
        term = mp.add(term, mp.mul(g(ax, r0, r1), g(ay, s0, s1)))
        term = mp.add(term, mp.mul(g(ax, s0, s1), g(ay, r0, r1)))
        term = mp.add(term, mp.mul(g(ax, r0, s1), g(ay, s0, r1)))
        acc = term if acc is None else mp.add(acc, term)
    acc = mp.mul_pow2(acc, 0.25)
    # (T, T, pts, pts, K) -> (T, pts, T, pts, K) -> (T*pts, T*pts, K)
    acc = jnp.moveaxis(acc, 2, 1)
    return _make_symmetric_lower(acc.reshape(T * pts, T * pts, k))


# ---------------------------------------------------------------------------
# Phase 1: residues
# ---------------------------------------------------------------------------

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
    primal_res: list       # P = sum A_p x_p - X, parity pairs
    primal_res_p: jax.Array  # p = b - B^T x, (N, K)


@functools.partial(jax.jit, static_argnames=())
def compute_residues(problem: SDPProblem, state: SolverState) -> Residues:
    k = problem.b.shape[-1]
    one = jnp.asarray(mp.one_np(k, problem.b.dtype))

    # objectives (`compute_objectives.cxx`)
    cx = mp.zeros((), k, dtype=problem.b.dtype)
    for bl, x in zip(problem.blocks, state.x):
        cx = mp.add(cx, mp.dot(bl.c, x, axis=0))
    primal_objective = mp.add(problem.objective_const, cx)
    dual_objective = mp.add(problem.objective_const,
                            mp.dot(problem.b, state.y, axis=0))
    gap_num = mp.abs_(mp.sub(primal_objective, dual_objective))
    gap_den = mp.max_(
        mp.add(mp.abs_(primal_objective), mp.abs_(dual_objective)), one)
    duality_gap = mp.div(gap_num, gap_den)

    # Cholesky of X and Y (`run/cholesky_decomposition.cxx`)
    L_X = [tuple(la.cholesky(Xp) if Xp.shape[0] else Xp for Xp in Xb)
           for Xb in state.X]
    L_Y = [tuple(la.cholesky(Yp) if Yp.shape[0] else Yp for Yp in Yb)
           for Yb in state.Y]

    # pairings
    ax, ay = [], []
    for bl, lx, Yb in zip(problem.blocks, L_X, state.Y):
        a, b = _pairings_block(bl, lx, Yb)
        ax.append(a)
        ay.append(b)

    # dual residues
    dual_res = [
        _dual_residues_block(bl, ayb, state.y)
        for bl, ayb in zip(problem.blocks, ay)
    ]
    dual_error = _max_abs_scalar(*[_block_max_abs(d) for d in dual_res])

    # primal residues P = sum_p A_p x_p - X
    primal_res = []
    perr = []
    for bl, x, Xb in zip(problem.blocks, state.x, state.X):
        w = _weighted_sum_block(bl, x)
        pr = tuple(mp.sub(w[p], Xb[p]) for p in range(2))
        primal_res.append(pr)
        for p in _parities(bl):
            perr.append(_block_max_abs(pr[p]))
    primal_error_P = _max_abs_scalar(*perr)

    # p = b - B^T x
    bx = mp.zeros((problem.dual_dim,), k, dtype=problem.b.dtype)
    for bl, x in zip(problem.blocks, state.x):
        bx = mp.add(bx, la.matvec(bl.B, x, transpose=True))
    primal_res_p = mp.sub(problem.b, bx)
    primal_error_p = _block_max_abs(primal_res_p)

    return Residues(primal_objective, dual_objective, duality_gap,
                    dual_error, primal_error_P, primal_error_p,
                    L_X, L_Y, ax, ay, dual_res, primal_res, primal_res_p)


# ---------------------------------------------------------------------------
# Phase 2: the predictor-corrector step
# ---------------------------------------------------------------------------

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


# --- Phase 2a: Schur factorization -----------------------------------------

@jax.jit
def schur_factorize(problem: SDPProblem, res: Residues):
    """S per block, its Cholesky, L^-1 B, the global Q and its Cholesky
    (`initialize_schur_complement_solver.cxx`).  The Q accumulation is
    the solver's only cross-block reduction (psum over the block axis
    in the sharded path)."""
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    L_S, LinvB = [], []
    Q = mp.zeros((problem.dual_dim, problem.dual_dim), k, dtype=dtype)
    for i, bl in enumerate(problem.blocks):
        S = _schur_complement_block(bl, res.ax[i], res.ay[i])
        ls = la.cholesky(S)
        lb = la.solve_lower(ls, bl.B)
        L_S.append(ls)
        LinvB.append(lb)
        Q = mp.add(Q, la.matmul(lb, lb, transpose_a=True))
    L_Q = la.cholesky(Q)
    return L_S, LinvB, L_Q


# --- Phase 2b: -XY, mu, R_error --------------------------------------------

@jax.jit
def compute_xy_mu(problem: SDPProblem, state: SolverState, max_complementarity):
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    minus_XY = []
    tr = mp.zeros((), k, dtype=dtype)
    for i, bl in enumerate(problem.blocks):
        mb = []
        for p in range(2):
            if bl.shape.psd_size(p) == 0:
                mb.append(state.X[i][p])
                continue
            mxy = mp.neg(la.matmul(state.X[i][p], state.Y[i][p]))
            mb.append(mxy)
            tr = mp.add(tr, la.trace(mxy))
        minus_XY.append(tuple(mb))
    mu = mp.div(mp.neg(tr), mp.const_word(
        jnp.asarray(float(problem.total_psd_rows), dtype), k, dtype=dtype))
    terminate_max_c = mp.cmp_lt(jnp.asarray(max_complementarity, dtype), mu)
    r_err = []
    for i, bl in enumerate(problem.blocks):
        for p in _parities(bl):
            r_err.append(_block_max_abs(la.add_diag(minus_XY[i][p], mu)))
    R_error = _max_abs_scalar(*r_err)
    return minus_XY, mu, R_error, terminate_max_c


# --- Phase 2c: one Newton direction (used for predictor AND corrector) -----

@jax.jit
def search_direction(problem: SDPProblem, state: SolverState, res: Residues,
                     minus_XY, L_S, LinvB, L_Q, beta_mu, dXdY):
    """One Newton solve for (dx, dX, dy, dY)
    (`compute_search_direction.cxx:44-96`).  The predictor phase passes
    dXdY = 0 so a single compiled function serves both phases."""
    # R = beta*mu*I - XY - dXdY; Z = Sym(X^{-1}(P Y - R))
    Z = []
    R_blocks = []
    for i, bl in enumerate(problem.blocks):
        Rb, Zb = [], []
        for p in range(2):
            if bl.shape.psd_size(p) == 0:
                Rb.append(minus_XY[i][p])
                Zb.append(minus_XY[i][p])
                continue
            R = mp.sub(minus_XY[i][p], dXdY[i][p])
            R = la.add_diag(R, beta_mu)
            Rb.append(R)
            py = la.matmul(res.primal_res[i][p], state.Y[i][p])
            z = mp.sub(py, R)
            z = la.cholesky_solve(res.L_X[i][p], z)
            Zb.append(la.symmetrize(z))
        R_blocks.append(tuple(Rb))
        Z.append(tuple(Zb))

    # RHS and Schur solve (`solve_schur_complement_equation.cxx`)
    dx = [_schur_rhs_block(bl, res.dual_res[i], [Z[i][p] for p in _parities(bl)])
          for i, bl in enumerate(problem.blocks)]
    dy_rhs = res.primal_res_p
    dx = [la.solve_lower(L_S[i], d) for i, d in enumerate(dx)]
    for i in range(len(problem.blocks)):
        dy_rhs = mp.sub(dy_rhs, la.matvec(LinvB[i], dx[i], transpose=True))
    dy = la.cholesky_solve(L_Q, dy_rhs)
    dx = [mp.add(d, la.matvec(LinvB[i], dy)) for i, d in enumerate(dx)]
    dx = [la.solve_lower_t(L_S[i], d) for i, d in enumerate(dx)]

    # dX = P + sum_p A_p dx_p ;  dY = -Sym(X^{-1}(R - dX Y))
    dX, dY = [], []
    for i, bl in enumerate(problem.blocks):
        w = _weighted_sum_block(bl, dx[i])
        dXb, dYb = [], []
        for p in range(2):
            if bl.shape.psd_size(p) == 0:
                dXb.append(w[p])
                dYb.append(w[p])
                continue
            dxp = mp.add(w[p], res.primal_res[i][p])
            dXb.append(dxp)
            t = la.matmul(dxp, state.Y[i][p])
            t = mp.sub(t, R_blocks[i][p])
            t = la.cholesky_solve(res.L_X[i][p], t)
            dYb.append(mp.neg(la.symmetrize(t)))
        dX.append(tuple(dXb))
        dY.append(tuple(dYb))
    return dx, dX, dy, dY


@jax.jit
def zeros_like_pairs(problem: SDPProblem, state: SolverState):
    """Zero dXdY placeholder for the predictor phase."""
    return [tuple(jnp.zeros_like(state.X[i][p]) for p in range(2))
            for i in range(len(problem.blocks))]


@jax.jit
def pair_products(problem: SDPProblem, dX, dY):
    """dX dY per parity block (corrector R term)."""
    out = []
    for i, bl in enumerate(problem.blocks):
        out.append(tuple(
            la.matmul(dX[i][p], dY[i][p]) if bl.shape.psd_size(p) else dX[i][p]
            for p in range(2)))
    return out


# --- Phase 2d: corrector centering parameter -------------------------------

@jax.jit
def corrector_beta(problem: SDPProblem, state: SolverState, dX, dY, mu,
                   feasible, feasible_centering, infeasible_centering):
    """`corrector_centering_parameter.cxx:12-31`; ``feasible`` is a
    traced boolean array."""
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    frob = mp.zeros((), k, dtype=dtype)
    for i, bl in enumerate(problem.blocks):
        for p in _parities(bl):
            xs = mp.add(state.X[i][p], dX[i][p])
            ys = mp.add(state.Y[i][p], dY[i][p])
            frob = mp.add(frob, la.frobenius(xs, ys))
    r = mp.div(frob, mp.mul_f64(mu, jnp.asarray(
        float(problem.total_psd_rows), dtype)))
    one = mp.const_word(jnp.asarray(1.0, dtype), k, dtype=dtype)
    beta = mp.where(mp.cmp_lt(r, one), mp.mul(r, r), r)
    feas = mp.min_(mp.max_(jnp.asarray(feasible_centering, dtype), beta), one)
    infeas = mp.max_(jnp.asarray(infeasible_centering, dtype), beta)
    return mp.where(jnp.broadcast_to(feasible, ()), feas, infeas)


# --- Phase 2e: step lengths and update -------------------------------------

def _min_eig_mp(c_mp):
    """lambda_min of a symmetric MP matrix as an MP scalar (K,):
    word-dtype eigh for the eigenvector, then a multi-word
    Rayleigh-quotient refinement.

    The reference computes full-precision HermitianEig
    (`step_length/min_eigenvalue.cxx`).  The word-dtype eigensolve
    alone is accurate to ~eps * ||C|| ABSOLUTE, which degrades when
    ||C|| >> |lambda_min| (late iterations, ill-conditioned blocks);
    the MP Rayleigh quotient v^T C v / v^T v of the computed
    eigenvector recovers eigenvalue accuracy to second order in the
    eigenvector error (and for clustered eigenvalues lands inside the
    cluster, which is all the step length needs).  Measured against an
    mpmath full-precision eigensolve (tests/test_min_eig.py): relative
    error ~ eps_f64^2 * (||C|| / |lambda_min|) -- 1e-22 at conditioning
    1e8, 1e-10 at 1e20, where plain f64 loses everything past 1e16.
    The result is an upper bound on lambda_min; the (1-gamma) step
    margin absorbs the remaining slack exactly as in the reference."""
    k = c_mp.shape[-1]
    w, v = jnp.linalg.eigh(mp.approx(c_mp))
    v0 = v[:, 0]
    vm = mp.const_word(v0, k, dtype=c_mp.dtype)
    cv = la.matvec(c_mp, vm)
    num = mp.dot(vm, cv, axis=0)
    den = mp.dot(vm, vm, axis=0)
    rq = mp.div(num, den)
    # guard: if eigh failed to return finite vectors, keep its value
    return jnp.where(jnp.isfinite(mp.approx(rq)),
                     rq, mp.const_word(w[0], k, dtype=c_mp.dtype))


# kept name: per-block kernels elsewhere refer to it
_min_eig_f64 = _min_eig_mp


def min_mp(a, b):
    """min of two MP scalars by leading-word compare (ties differ
    below one ulp of word 0, irrelevant for step lengths).

    NaN is sticky: a NaN step-length lambda (the non-PD-Cholesky
    poisoning convention) must survive the min regardless of operand
    order, or a later finite block would silently overwrite it and the
    solver would take a wrong finite step before detection."""
    fa = mp.fst(a)
    return jnp.where((fa <= mp.fst(b)) | jnp.isnan(fa), a, b)


def _min_lambda(L, dM, parities, k, dtype):
    lam = mp.const_word(jnp.asarray(jnp.inf, dtype), k, dtype=dtype)
    for p in parities:
        c = la.lower_inverse_congruence(L[p], dM[p])
        lam = min_mp(lam, _min_eig_mp(c))
    return lam


def alpha_mp(lam, gamma, k, dtype):
    """step = min(1, -gamma/lambda_min), in full MP
    (`step_length.cxx:27-46`; the reference's alpha is a BigFloat)."""
    g = mp.const_word(jnp.asarray(gamma, dtype), k, dtype=dtype)
    one = mp.const_word(jnp.asarray(1.0, dtype), k, dtype=dtype)
    safe = mp.fst(lam) > -float(gamma)
    lam_safe = jnp.where(safe, -one, lam)
    a = mp.div(mp.neg(g), lam_safe)
    return mp.where(safe, one, a)


def _scale_mp(arr, alpha):
    """arr * alpha for an MP scalar alpha (K,), broadcast over batch."""
    a = jnp.broadcast_to(alpha, arr.shape)
    return mp.mul(arr, a)


@functools.partial(jax.jit, static_argnames=("gamma",))
def apply_step(problem: SDPProblem, state: SolverState, res: Residues,
               dx, dX, dy, dY, feasible, gamma: float):
    """Step lengths (`step_length.cxx`) and the iterate update
    (`step.cxx:206-224`), all in full MP (the reference's alpha is a
    BigFloat).  ``feasible`` (traced bool) equalizes the primal/dual
    steps when primal-dual feasible."""
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    lam_p = mp.const_word(jnp.asarray(jnp.inf, dtype), k, dtype=dtype)
    lam_d = mp.const_word(jnp.asarray(jnp.inf, dtype), k, dtype=dtype)
    for i, bl in enumerate(problem.blocks):
        pars = _parities(bl)
        lam_p = min_mp(lam_p, _min_lambda(res.L_X[i], dX[i], pars, k, dtype))
        lam_d = min_mp(lam_d, _min_lambda(res.L_Y[i], dY[i], pars, k, dtype))

    alpha_p = alpha_mp(lam_p, gamma, k, dtype)
    alpha_d = alpha_mp(lam_d, gamma, k, dtype)
    both = min_mp(alpha_p, alpha_d)
    alpha_p = mp.where(feasible, both, alpha_p)
    alpha_d = mp.where(feasible, both, alpha_d)

    new_x = [mp.add(x, _scale_mp(d, alpha_p)) for x, d in zip(state.x, dx)]
    new_y = mp.add(state.y, _scale_mp(dy, alpha_d))
    new_X = [tuple(mp.add(state.X[i][p], _scale_mp(dX[i][p], alpha_p))
                   for p in range(2)) for i in range(len(problem.blocks))]
    new_Y = [tuple(mp.add(state.Y[i][p], _scale_mp(dY[i][p], alpha_d))
                   for p in range(2)) for i in range(len(problem.blocks))]
    new_state = SolverState(x=new_x, y=new_y, X=new_X, Y=new_Y)
    return new_state, mp.fst(alpha_p), mp.fst(alpha_d)


# --- Orchestration (host side, one iteration's step) ------------------------

def compute_step(problem: SDPProblem, state: SolverState, res: Residues,
                 params, is_primal_and_dual_feasible: bool):
    """The full predictor-corrector step; returns (new_state, StepInfo).

    Orchestrates the jitted sub-phases; graph-per-phase keeps XLA/LLVM
    compile times and memory bounded, and the single compiled
    ``search_direction`` serves both predictor and corrector."""
    dtype = problem.b.dtype
    k = problem.b.shape[-1]
    feasible = jnp.asarray(is_primal_and_dual_feasible)

    L_S, LinvB, L_Q = schur_factorize(problem, res)
    minus_XY, mu, R_error, terminate_max_c = compute_xy_mu(
        problem, state, np.asarray(params.max_complementarity_mp(dtype)))

    beta_pred = jnp.asarray(
        params.predictor_beta(is_primal_and_dual_feasible, k, dtype))
    dxdy0 = zeros_like_pairs(problem, state)
    dx, dX, dy, dY = search_direction(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_pred, mu), dxdy0)

    beta_corrector = corrector_beta(
        problem, state, dX, dY, mu, feasible,
        np.asarray(params.feasible_centering_mp(dtype)),
        np.asarray(params.infeasible_centering_mp(dtype)))

    dXdY = pair_products(problem, dX, dY)
    dx, dX, dy, dY = search_direction(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_corrector, mu), dXdY)

    new_state, alpha_p, alpha_d = apply_step(
        problem, state, res, dx, dX, dy, dY, feasible,
        params.step_length_reduction)

    # Cholesky condition estimates ((max diag / min diag)^2, f64; the
    # reference's update_cond_numbers.hxx / cholesky_condition_number.hxx)
    q_cond = float(la.cholesky_condition_estimate(L_Q))
    max_c, max_name = 0.0, ""
    for i, bl in enumerate(problem.blocks):
        c = float(la.cholesky_condition_estimate(L_S[i]))
        if c > max_c:
            max_c, max_name = c, f"schur_complement_cholesky.block_{i}"
        for p_ in _parities(bl):
            c = float(la.cholesky_condition_estimate(res.L_X[i][p_]))
            if c > max_c:
                max_c, max_name = c, f"X_cholesky.block_{i}_{p_}"
            c = float(la.cholesky_condition_estimate(res.L_Y[i][p_]))
            if c > max_c:
                max_c, max_name = c, f"Y_cholesky.block_{i}_{p_}"

    info = StepInfo(mu=mu, beta_corrector=beta_corrector,
                    primal_step=alpha_p, dual_step=alpha_d,
                    R_error=R_error,
                    terminate_max_complementarity=terminate_max_c,
                    q_cond=q_cond, max_block_cond=max_c,
                    max_block_cond_name=max_name)
    return new_state, info


# Back-compat alias used by the driver.
compute_step_jit = compute_step
