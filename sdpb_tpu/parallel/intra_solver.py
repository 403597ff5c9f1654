"""Intra-block model parallelism wired into the solver: the driver path
for problems whose PSD blocks exceed one device's memory.

The reference gives a too-large block to a multi-rank process group
with a 2-D `El::Grid`, so its Cholesky/Trsm/Syrk span ranks
(`Block_Map.hxx:8-14`, `sdpb/solve.cxx:31`).  The TPU equivalent here:

- the PERSISTENT per-block state (X, Y, their Cholesky factors, the
  primal residue P, S-Cholesky, dX/dY) lives ROW-SHARDED over the
  whole mesh, dividing the dominant memory terms by the device count;
- factorizations and triangular solves run through the row-panel
  shard_map kernels of `parallel.intra` / `parallel.dist_q`;
- pairings/Q products run through the exact int8-MXU CRT SYRK with an
  int32 `psum` over row shards (`bigint_syrk` over the block's process
  group);
- everything elementwise (MP add/mul/masking) and every matmul whose
  CONTRACTED axis is unsharded uses the ordinary format-generic
  `mp`/`la` ops -- XLA's SPMD partitioner keeps them row-local;
- blocks are processed sequentially (the reference's group owns one
  big block at a time), so transient full-size tensors exist one at a
  time.

Step lengths gather the congruence matrix to run the word-dtype eigh
(as in the single-device path); a distributed eigensolve is the known
limitation, shared with this path's `_min_eig_mp` contract.

Driver integration: `solver.driver.solve` dispatches on IntraProblem;
`apps/sdpb.py` routes here when `check_memory_limit` predicts a
per-device overflow that row-sharding would cure, instead of aborting.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mp import core as mp
from ..mp import linalg as la
from ..solver import iteration as it
from ..solver.data import SDPProblem, SolverState
from . import intra

AXIS = intra.AXIS


@dataclasses.dataclass
class IntraProblem:
    """An SDPProblem whose per-block PSD matrices are row-sharded over
    ``mesh``.  Block list and small data stay replicated."""

    problem: SDPProblem
    mesh: Mesh

    @property
    def b(self):
        return self.problem.b

    @property
    def dual_dim(self):
        return self.problem.dual_dim

    @property
    def blocks(self):
        return self.problem.blocks

    @property
    def objective_const(self):
        return self.problem.objective_const

    @property
    def total_psd_rows(self):
        return self.problem.total_psd_rows


def _pad_to(n: int, d: int) -> int:
    return -(-n // d) * d


def _shard(mesh, a):
    return jax.device_put(a, NamedSharding(mesh, P(AXIS)))


def _repl(mesh, a):
    return jax.device_put(a, NamedSharding(mesh, P()))


def _pad_rows(a, n1: int):
    """Pad axis 0 of (n, ..., K) with zeros up to n1."""
    n = a.shape[0]
    if n1 == n:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((n1 - n,) + a.shape[1:], a.dtype)], axis=0)


def _pad_eye(m, n1: int, k: int, dtype):
    """Pad (n,n,K) to (n1,n1,K) with identity on the new diagonal."""
    n = m.shape[0]
    if n1 == n:
        return m
    out = jnp.zeros((n1, n1, k), dtype)
    out = jax.lax.dynamic_update_slice(out, m, (0, 0, 0))
    onev = jnp.asarray(mp.one_np(k, dtype))
    idx = n + jnp.arange(n1 - n)
    return out.at[idx, idx, :].set(onev)


def initial_state(iproblem: IntraProblem, scale_primal, scale_dual
                  ) -> SolverState:
    mesh = iproblem.mesh
    d = mesh.devices.size
    problem = iproblem.problem
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    svec_p = jnp.asarray(mp.from_f64_np(float(scale_primal), k, dtype))
    svec_d = jnp.asarray(mp.from_f64_np(float(scale_dual), k, dtype))

    def eye(n, svec):
        n1 = _pad_to(max(n, 1), d)
        m = jnp.zeros((n1, n1, k), dtype)
        onev = jnp.asarray(mp.one_np(k, dtype))
        idx = jnp.arange(n1)
        vals = jnp.where((idx < n)[:, None], svec[None, :], onev[None, :])
        m = m.at[idx, idx, :].set(vals)
        return _shard(mesh, m)

    x, X, Y = [], [], []
    for bl in problem.blocks:
        se, so = bl.shape.psd_sizes
        x.append(mp.zeros((bl.shape.schur_size,), k, dtype=dtype))
        X.append((eye(se, svec_p), eye(so, svec_p)))
        Y.append((eye(se, svec_d), eye(so, svec_d)))
    y = mp.zeros((problem.dual_dim,), k, dtype=dtype)
    return SolverState(x=x, y=y, X=X, Y=Y)


def _gather(a):
    """Replicate a row-sharded array (transient full copy).

    MP matmuls must NEVER contract over a sharded axis: the SPMD
    partitioner then inserts a word-wise cross-device reduction, which
    is not an MP add and silently corrupts the low words (observed:
    the compensation word of 1e20*1e20 came back as garbage).  Every
    matmul in this module therefore contracts against a replicated
    operand."""
    if not isinstance(a, jax.Array) or a.sharding is None:
        return a
    mesh = getattr(a.sharding, "mesh", None)
    if mesh is None:
        return a
    return jax.device_put(a, NamedSharding(mesh, P()))


def _parities(bl):
    return it._parities(bl)


def _padded_u(mesh, bl, p, n1):
    u = _pad_rows(bl.u[p], n1)
    return _repl(mesh, u)


def compute_residues(iproblem: IntraProblem, state: SolverState):
    mesh = iproblem.mesh
    d = mesh.devices.size
    problem = iproblem.problem
    k = problem.b.shape[-1]
    dtype = problem.b.dtype

    L_X, L_Y, ax, ay = [], [], [], []
    dual_res, primal_res = [], []
    derr_parts, perr_parts = [], []
    cx = mp.zeros((), k, dtype=dtype)
    bx = mp.zeros((problem.dual_dim,), k, dtype=dtype)
    for bl, x, Xb, Yb in zip(problem.blocks, state.x, state.X, state.Y):
        lxs, lys, axs, ays = [], [], [], []
        w = it._weighted_sum_block(bl, x)       # replicated, X-sized
        prs = []
        for p in range(2):
            n_p = bl.shape.psd_size(p)
            if n_p == 0:
                lxs.append(Xb[p])
                lys.append(Yb[p])
                prs.append(w[p])
                continue
            n1 = Xb[p].shape[0]
            lx = intra.cholesky(mesh, Xb[p])
            ly = intra.cholesky(mesh, Yb[p])
            lxs.append(lx)
            lys.append(ly)
            u = _padded_u(mesh, bl, p, n1)
            # A_X_inv = (L^-1 U)^T (L^-1 U): distributed Trsm + exact
            # row-psum SYRK
            t = intra.solve_lower(mesh, lx, u)
            axf = it._make_symmetric_lower(
                intra.syrk(mesh, _shard(mesh, t)))
            # A_Y = U^T Y U: row-local matmul + distributed gemm
            yu = la.matmul(Yb[p], u)             # row-sharded rows
            ayf = it._make_symmetric_lower(
                intra.gemm(mesh, _shard(mesh, _gather(u)),
                           _shard(mesh, _gather(yu))))
            m_, pts = bl.shape.m, bl.shape.pts
            axs.append(axf.reshape(m_, pts, m_, pts, k))
            ays.append(ayf.reshape(m_, pts, m_, pts, k))
            # P = sum_p A_p x_p - X, row-sharded persistent
            wp = _shard(mesh, _pad_eye(w[p], n1, k, dtype)
                        if False else _pad_rows(
                            jnp.pad(w[p], ((0, n1 - n_p), (0, n1 - n_p),
                                           (0, 0))), n1))
            pr = mp.sub(wp, Xb[p])
            # padded diagonal of X is identity: cancel it so padded
            # rows of P are zero
            idx = n_p + jnp.arange(n1 - n_p)
            onev = jnp.asarray(mp.one_np(k, dtype))
            pr = pr.at[idx, idx, :].add(onev)
            prs.append(pr)
            perr_parts.append(mp.max_abs(pr.reshape(-1, k)))
        L_X.append(tuple(lxs))
        L_Y.append(tuple(lys))
        ax.append(axs)
        ay.append(ays)
        dres = it._dual_residues_block(bl, ays, state.y)
        dual_res.append(dres)
        derr_parts.append(mp.max_abs(dres.reshape(-1, k)))
        primal_res.append(tuple(prs))
        cx = mp.add(cx, mp.dot(bl.c, x, axis=0))
        bx = mp.add(bx, la.matvec(bl.B, x, transpose=True))

    one = jnp.asarray(mp.one_np(k, dtype))
    primal_objective = mp.add(problem.objective_const, cx)
    dual_objective = mp.add(problem.objective_const,
                            mp.dot(problem.b, state.y, axis=0))
    gap_num = mp.abs_(mp.sub(primal_objective, dual_objective))
    gap_den = mp.max_(
        mp.add(mp.abs_(primal_objective), mp.abs_(dual_objective)), one)
    duality_gap = mp.div(gap_num, gap_den)
    dual_error = it._max_abs_scalar(*derr_parts)
    primal_error_P = it._max_abs_scalar(*perr_parts)
    primal_res_p = mp.sub(problem.b, bx)
    primal_error_p = mp.max_abs(primal_res_p)
    return it.Residues(primal_objective, dual_objective, duality_gap,
                       dual_error, primal_error_P, primal_error_p,
                       L_X, L_Y, ax, ay, dual_res, primal_res,
                       primal_res_p)


def _chol_big(mesh, a_full):
    """Cholesky of a replicated matrix through the row-panel kernels
    (pads to the mesh size); returns (row-sharded L, padded size)."""
    d = mesh.devices.size
    n = a_full.shape[0]
    k = a_full.shape[-1]
    n1 = _pad_to(n, d)
    ap = _pad_eye(a_full, n1, k, a_full.dtype)
    return intra.cholesky(mesh, _shard(mesh, ap)), n1


def compute_step(iproblem: IntraProblem, state: SolverState, res,
                 params, is_primal_and_dual_feasible: bool):
    mesh = iproblem.mesh
    problem = iproblem.problem
    k = problem.b.shape[-1]
    dtype = problem.b.dtype
    feasible = jnp.asarray(is_primal_and_dual_feasible)

    # --- Schur complement, S-Cholesky, L^-1 B, global Q --------------
    from ..ops import mpmm
    from ..solver import bucket_iteration as bi

    L_S, LinvB, nS = [], [], []
    for i, bl in enumerate(problem.blocks):
        S = it._schur_complement_block(bl, res.ax[i], res.ay[i])
        ls, n1s = _chol_big(mesh, S)
        lb = intra.solve_lower(mesh, ls, _pad_rows(bl.B, n1s))
        L_S.append(ls)
        LinvB.append(lb[: bl.shape.schur_size])
        nS.append(n1s)
    total_rows = sum(bl.shape.schur_size for bl in problem.blocks)
    plan = mpmm.plan_for(mpmm.precision_of(dtype, k), total_rows)
    e_col = None
    for lb in LinvB:
        e = jnp.max(mpmm.exponents(lb), axis=(0,))
        e_col = e if e_col is None else jnp.maximum(e_col, e)
    q_sum = d_sum = None
    finite = jnp.asarray(True)
    for lb in LinvB:
        finite = finite & jnp.isfinite(jnp.max(jnp.abs(lb[..., 0])))
        q_res, d_res = bi._q_residues_bucket(lb[None], e_col, plan)
        if q_sum is None:
            q_sum, d_sum = q_res, d_res
        else:
            q_sum, d_sum = q_sum + q_res, d_sum + d_res
    L_Q = bi._q_restore_cholesky(q_sum, e_col, finite, plan, k,
                                 problem.b, d_sum)

    # --- -XY, mu, R error --------------------------------------------
    minus_XY = []
    tr = mp.zeros((), k, dtype=dtype)
    for i, bl in enumerate(problem.blocks):
        mb = []
        for p in range(2):
            n_p = bl.shape.psd_size(p)
            if n_p == 0:
                mb.append(state.X[i][p])
                continue
            yf = _gather(state.Y[i][p])
            mxy = mp.neg(la.matmul(state.X[i][p], yf))  # row-sharded
            mb.append(mxy)
            dg = la.diag(mxy)[:n_p]
            tr = mp.add(tr, mp.sum_(dg, axis=0))
        minus_XY.append(tuple(mb))
    mu = mp.div(mp.neg(tr), mp.const_word(
        jnp.asarray(float(problem.total_psd_rows), dtype), k, dtype=dtype))
    terminate_max_c = mp.cmp_lt(
        jnp.asarray(np.asarray(params.max_complementarity_mp(dtype))), mu)
    r_err = []
    for i, bl in enumerate(problem.blocks):
        for p in _parities(bl):
            n_p = bl.shape.psd_size(p)
            rr = la.add_diag(minus_XY[i][p], mu)[:n_p, :n_p]
            r_err.append(mp.max_abs(rr.reshape(-1, k)))
    R_error = it._max_abs_scalar(*r_err)

    beta_pred = jnp.asarray(
        params.predictor_beta(is_primal_and_dual_feasible, k, dtype))
    zeros = [tuple(jnp.zeros_like(state.X[i][p]) for p in range(2))
             for i in range(len(problem.blocks))]
    dx, dX, dy, dY = _search(iproblem, state, res, minus_XY, L_S, nS,
                             LinvB, L_Q, mp.mul(beta_pred, mu), zeros)

    # corrector centering parameter
    frob = mp.zeros((), k, dtype=dtype)
    for i, bl in enumerate(problem.blocks):
        for p in _parities(bl):
            n_p = bl.shape.psd_size(p)
            xs = mp.add(state.X[i][p], dX[i][p])
            ys = mp.add(state.Y[i][p], dY[i][p])
            prod = mp.mul(xs, ys)
            m_ = prod[:n_p, :n_p].reshape(-1, k)
            frob = mp.add(frob, mp.sum_(m_, axis=0))
    r = mp.div(frob, mp.mul_f64(mu, jnp.asarray(
        float(problem.total_psd_rows), dtype)))
    one = jnp.asarray(mp.one_np(k, dtype))
    beta = mp.where(mp.cmp_lt(r, one), mp.mul(r, r), r)
    feas = mp.min_(mp.max_(jnp.asarray(
        np.asarray(params.feasible_centering_mp(dtype))), beta), one)
    infeas = mp.max_(jnp.asarray(
        np.asarray(params.infeasible_centering_mp(dtype))), beta)
    beta_c = mp.where(jnp.broadcast_to(feasible, ()), feas, infeas)

    dXdY = []
    for i, bl in enumerate(problem.blocks):
        row = []
        for p in range(2):
            if bl.shape.psd_size(p) == 0:
                row.append(dX[i][p])
            else:
                row.append(la.matmul(dX[i][p], _gather(dY[i][p])))
        dXdY.append(tuple(row))
    dx, dX, dy, dY = _search(iproblem, state, res, minus_XY, L_S, nS,
                             LinvB, L_Q, mp.mul(beta_c, mu), dXdY)

    # --- step lengths + update ---------------------------------------
    lam_p = mp.const_word(jnp.asarray(jnp.inf, dtype), k, dtype=dtype)
    lam_d = mp.const_word(jnp.asarray(jnp.inf, dtype), k, dtype=dtype)
    for i, bl in enumerate(problem.blocks):
        for p in _parities(bl):
            n_p = bl.shape.psd_size(p)
            cX = _congruence(mesh, res.L_X[i][p], dX[i][p], n_p)
            lam_p = it.min_mp(lam_p, it._min_eig_mp(cX))
            cY = _congruence(mesh, res.L_Y[i][p], dY[i][p], n_p)
            lam_d = it.min_mp(lam_d, it._min_eig_mp(cY))
    alpha_p = it.alpha_mp(lam_p, params.step_length_reduction, k, dtype)
    alpha_d = it.alpha_mp(lam_d, params.step_length_reduction, k, dtype)
    both = it.min_mp(alpha_p, alpha_d)
    alpha_p = mp.where(feasible, both, alpha_p)
    alpha_d = mp.where(feasible, both, alpha_d)

    new_x = [mp.add(x, it._scale_mp(dxi, alpha_p))
             for x, dxi in zip(state.x, dx)]
    new_y = mp.add(state.y, it._scale_mp(dy, alpha_d))
    new_X = [tuple(mp.add(state.X[i][p], it._scale_mp(dX[i][p], alpha_p))
                   if problem.blocks[i].shape.psd_size(p) else
                   state.X[i][p] for p in range(2))
             for i in range(len(problem.blocks))]
    new_Y = [tuple(mp.add(state.Y[i][p], it._scale_mp(dY[i][p], alpha_d))
                   if problem.blocks[i].shape.psd_size(p) else
                   state.Y[i][p] for p in range(2))
             for i in range(len(problem.blocks))]
    new_state = SolverState(x=new_x, y=new_y, X=new_X, Y=new_Y)
    info = it.StepInfo(
        mu=mu, beta_corrector=beta_c, primal_step=mp.fst(alpha_p),
        dual_step=mp.fst(alpha_d), R_error=R_error,
        terminate_max_complementarity=terminate_max_c)
    return new_state, info


def _congruence(mesh, L_sh, dM_sh, n_p):
    """L^-1 dM L^-T via the distributed solves; gathered (transient)
    for the word-dtype eigensolve."""
    z = intra.solve_lower(mesh, L_sh, _gather(dM_sh))
    zt = la.transpose(z)
    c = intra.solve_lower(mesh, L_sh, zt)
    return la.transpose(c)[:n_p, :n_p]


def _search(iproblem, state, res, minus_XY, L_S, nS, LinvB, L_Q,
            beta_mu, dXdY):
    """One Newton direction (`compute_search_direction.cxx:44-96`) with
    row-sharded X-sized tensors and distributed factor solves."""
    mesh = iproblem.mesh
    problem = iproblem.problem
    k = problem.b.shape[-1]
    dtype = problem.b.dtype

    R_blocks, Z = [], []
    for i, bl in enumerate(problem.blocks):
        Rb, Zb = [], []
        for p in range(2):
            n_p = bl.shape.psd_size(p)
            if n_p == 0:
                Rb.append(minus_XY[i][p])
                Zb.append(minus_XY[i][p])
                continue
            R = la.add_diag(mp.sub(minus_XY[i][p], dXdY[i][p]), beta_mu)
            Rb.append(R)
            py = la.matmul(res.primal_res[i][p],
                           _gather(state.Y[i][p]))
            z = mp.sub(py, R)
            z = intra.cholesky_solve(mesh, res.L_X[i][p], _gather(z))
            Zb.append(la.symmetrize(z)[:n_p, :n_p])
        R_blocks.append(tuple(Rb))
        Z.append(tuple(Zb))

    dx = [it._schur_rhs_block(bl, res.dual_res[i],
                              [Z[i][p] for p in _parities(bl)])
          for i, bl in enumerate(problem.blocks)]
    dy_rhs = res.primal_res_p
    for i, bl in enumerate(problem.blocks):
        dxi = intra.solve_lower(mesh, L_S[i],
                                _pad_rows(dx[i][:, None, :], nS[i]))
        dx[i] = dxi[: bl.shape.schur_size, 0]
        dy_rhs = mp.sub(dy_rhs, la.matvec(LinvB[i], dx[i],
                                          transpose=True))
    dy = la.cholesky_solve(L_Q, dy_rhs)
    dX, dY = [], []
    for i, bl in enumerate(problem.blocks):
        d = mp.add(dx[i], la.matvec(LinvB[i], dy))
        d = intra.solve_lower_t(mesh, L_S[i],
                                _pad_rows(d[:, None, :], nS[i]))
        dx[i] = d[: bl.shape.schur_size, 0]
        w = it._weighted_sum_block(bl, dx[i])
        dXb, dYb = [], []
        for p in range(2):
            n_p = bl.shape.psd_size(p)
            if n_p == 0:
                dXb.append(w[p])
                dYb.append(w[p])
                continue
            n1 = state.X[i][p].shape[0]
            wp = _shard(mesh, jnp.pad(
                w[p], ((0, n1 - n_p), (0, n1 - n_p), (0, 0))))
            dxp = mp.add(wp, res.primal_res[i][p])
            dXb.append(dxp)
            t = la.matmul(dxp, _gather(state.Y[i][p]))
            t = mp.sub(t, R_blocks[i][p])
            t = intra.cholesky_solve(mesh, res.L_X[i][p], _gather(t))
            dYb.append(_shard(mesh, mp.neg(la.symmetrize(t))))
        dX.append(tuple(dXb))
        dY.append(tuple(dYb))
    return dx, dX, dy, dY
