"""Mesh-sharded multi-bucket solver: the production multi-chip path.

The reference partitions J blocks over MPI process groups with
cost-based bin packing (`compute_block_grid_mapping.hxx`); the only
globally-coupled objects per iteration are Q (N x N), dy (N), and
scalar reductions (SURVEY §3.2-§3.3).  Here:

- each bucket's block axis is sharded over the 1-D mesh axis
  ``"blocks"`` with shard_map (per-bucket compiled programs, same
  kernels as the single-chip path in solver.bucket_iteration)
- buckets whose block count is not divisible by the device count are
  padded with phantom blocks (c = B = 0, the bucket's own bilinear
  basis, mask = 0).  Phantom blocks never move (their dx/dX/dY are
  masked to zero) and are excluded from every global reduction, so the
  sharded trajectory is bit-comparable to the single-chip one up to
  reduction ordering
- cross-device reductions: `pmax` for error maxima (like the
  reference's MPI AllReduce MAX); the Q reduction is an EXACT int32
  `psum` of per-prime CRT residues before the restore (integer adds
  cannot round) -- the TPU redesign of the reference's bigint reduce
  (`restore_and_reduce.cxx`), see `_q_residues_kernel`; the remaining
  small MP-valued sums (dy rhs, c.x, trace, Frobenius) use
  all_gather + a local MP tree sum, because a word-wise float psum is
  not exact.

The driver (solver.driver.solve) accepts a MeshProblem/MeshState pair
transparently: this module exports compute_residues / compute_step with
the same contract as solver.bucket_iteration.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ._shard import shard_map

from ..mp import core as mp
from ..mp import linalg as la
from ..solver import bucket_iteration as bi
from ..solver import iteration as it
from ..solver.data import BucketedProblem, BucketedState, SDPBucket

AXIS = "blocks"

from .multihost import fetch as _fetch  # noqa: E402
from .multihost import put_global as _put_g  # noqa: E402


def _put(arr, sharding):
    """Global device placement (single- and multi-process safe)."""
    import numpy as _np

    return _put_g(_np.asarray(arr), sharding)



# ---------------------------------------------------------------------------
# Problem/state sharding
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MeshBucket:
    """A padded, mesh-sharded bucket: bucket data + block validity mask
    (0.0 for phantom padding blocks)."""

    data: SDPBucket
    mask: jax.Array     # (nb_padded,) f64

    @property
    def shape(self):
        return self.data.shape

    @property
    def nb(self):
        return self.data.nb

    def tree_flatten(self):
        return (self.data, self.mask), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


@dataclasses.dataclass
class MeshProblem:
    objective_const: jax.Array
    b: jax.Array
    buckets: list          # [MeshBucket]
    mesh: Mesh
    n_valid: list          # unpadded nb per bucket (static)
    total_psd_rows: int    # over REAL blocks only
    perms: list = None     # per-bucket LPT permutation (or None each)

    @property
    def dual_dim(self):
        return self.b.shape[0]


def shard_problem(problem: BucketedProblem, mesh: Mesh,
                  costs=None) -> MeshProblem:
    """Pad each bucket to a multiple of the mesh size and device_put
    with the block axis sharded.  Phantom blocks reuse the bucket's
    bilinear bases (so their Schur complements stay PD) but have
    c = B = 0 and mask 0.

    ``costs`` (per-bucket lists of per-block costs, from
    `solver.placement.read_block_costs` / `flop_model_costs`) triggers
    the reference's cost-based placement
    (`compute_block_grid_mapping.hxx`): each bucket's block axis is
    LPT-assigned to devices, with every device's group padded to
    exactly ceil(nb/n_dev) slots (phantoms included) so shard_map's
    contiguous chunk boundaries coincide with the LPT bins."""
    from ..solver.placement import bucket_device_permutation

    n_dev = mesh.devices.size
    sharded = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())

    buckets = []
    n_valid = []
    perms = []
    for bi_, bk in enumerate(problem.buckets):
        nb = bk.nb
        pad = (-nb) % n_dev
        slots = None
        if costs is not None and nb > n_dev:
            slots, _ = bucket_device_permutation(costs[bi_], n_dev)
            if np.array_equal(slots[slots >= 0], np.arange(nb)):
                slots = None
        if slots is None:
            slots = np.concatenate(
                [np.arange(nb), np.full(pad, -1)]).astype(np.int64)
        perms.append(slots)
        mask = (slots >= 0).astype(np.dtype(jnp.dtype(bk.c.dtype).name))

        def pad_with(arr, template_zero: bool):
            arr = np.asarray(arr)
            out = arr[np.where(slots >= 0, slots, 0)]
            phantom = slots < 0
            if template_zero:
                out[phantom] = 0
            # else: phantoms keep a copied real block (PD bases)
            return out

        # NOTE: block_indices stays empty so every bucket of a given
        # BlockShape shares one compiled kernel (the kernels' shard_map
        # specs must match the pytree aux data exactly)
        data = SDPBucket(
            c=_put(pad_with(bk.c, True), sharded),
            B=_put(pad_with(bk.B, True), sharded),
            q=tuple(_put(pad_with(q, False), sharded)
                    for q in bk.q),
            u=tuple(_put(pad_with(u, False), sharded)
                    for u in bk.u),
            shape=bk.shape,
        )
        buckets.append(MeshBucket(
            data=data, mask=_put(jnp.asarray(mask), sharded)))
        n_valid.append(nb)

    return MeshProblem(
        objective_const=_put(
            jnp.asarray(problem.objective_const), repl),
        b=_put(jnp.asarray(problem.b), repl),
        buckets=buckets,
        mesh=mesh,
        n_valid=n_valid,
        total_psd_rows=problem.total_psd_rows,
        perms=perms,
    )


def _perm_of(mproblem: MeshProblem, bi_: int):
    """Per-bucket padded slot array (slots[i] = original block index at
    padded position i, -1 for phantoms)."""
    return None if mproblem.perms is None else mproblem.perms[bi_]


def shard_state(state: BucketedState, mproblem: MeshProblem) -> BucketedState:
    """Pad + shard a BucketedState to match a MeshProblem (applying the
    problem's LPT block permutation).  Phantom blocks get
    identity-scaled X/Y copied from block 0 (PD, frozen by the mask)."""
    mesh = mproblem.mesh
    n_dev = mesh.devices.size
    sharded = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())

    def pad_copy(arr, nb, slots):
        arr = np.asarray(arr)
        if slots is None:
            pad = (-nb) % n_dev
            if pad == 0:
                return arr
            return np.concatenate([arr, np.repeat(arr[:1], pad, axis=0)])
        # phantom slots get a copy of a real block (PD, frozen by mask)
        return arr[np.where(slots >= 0, slots, 0)]

    x, X, Y = [], [], []
    for bi_, mb in enumerate(mproblem.buckets):
        nb = mproblem.n_valid[bi_]
        perm = _perm_of(mproblem, bi_)
        x.append(_put(pad_copy(state.x[bi_], nb, perm), sharded))
        X.append(tuple(_put(
            pad_copy(state.X[bi_][p], nb, perm), sharded) for p in range(2)))
        Y.append(tuple(_put(
            pad_copy(state.Y[bi_][p], nb, perm), sharded) for p in range(2)))
    return BucketedState(
        x=x, y=_put(jnp.asarray(state.y), repl), X=X, Y=Y)


def unshard_state(mstate: BucketedState, mproblem: MeshProblem
                  ) -> BucketedState:
    """Gather, strip padding and undo the LPT permutation (for
    checkpoints / solution output, which are in block-index order)."""
    x, X, Y = [], [], []
    for bi_, nb in enumerate(mproblem.n_valid):
        slots = _perm_of(mproblem, bi_)
        inv = None
        if slots is not None:
            inv = np.empty(nb, dtype=np.int64)
            pos = np.nonzero(slots >= 0)[0]
            inv[slots[pos]] = pos

        def take(arr):
            arr = _fetch(arr)
            if inv is None:
                return jnp.asarray(arr[:nb])
            return jnp.asarray(arr[inv])

        x.append(take(mstate.x[bi_]))
        X.append(tuple(take(mstate.X[bi_][p]) for p in range(2)))
        Y.append(tuple(take(mstate.Y[bi_][p]) for p in range(2)))
    return BucketedState(x=x, y=jnp.asarray(_fetch(mstate.y)), X=X, Y=Y)


# ---------------------------------------------------------------------------
# Collective helpers (inside shard_map)
# ---------------------------------------------------------------------------

def _sum_mp(v):
    """Exact-as-local MP sum over the mesh axis (all_gather + tree)."""
    g = jax.lax.all_gather(v, AXIS)
    return mp.sum_(g, axis=0)


def _mask_mp(v, mask):
    """Zero out phantom blocks; mask broadcasts over trailing dims."""
    return v * mask.reshape(mask.shape + (1,) * (v.ndim - 1))


# ---------------------------------------------------------------------------
# Sharded per-bucket kernels
# ---------------------------------------------------------------------------

def _sharded(mesh, fn, in_specs, out_specs):
    return jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs))


def _bucket_spec(shape):
    s = P(AXIS)
    return SDPBucket(c=s, B=s, q=(s, s), u=(s, s), shape=shape)


@functools.lru_cache(maxsize=None)
def _residues_kernel(mesh, shape):
    s = P(AXIS)
    r = P()
    npar = len(bi._parities(shape))

    def fn(bk, mask, x, X, Y, y):
        (L_X, L_Y, ax, ay, dual_res, primal_res, _derr, _perr, _cx,
         _bx) = bi._residues_bucket.__wrapped__(bk, x, X, Y, y)
        # masked global contributions
        derr = jax.lax.pmax(jnp.max(
            jnp.abs(mp.approx(_mask_mp(dual_res, mask)))), AXIS)
        pars = bi._parities(bk.shape)
        perr = jax.lax.pmax(jnp.max(jnp.stack(
            [jnp.max(jnp.abs(mp.approx(_mask_mp(primal_res[p], mask))))
             for p in pars])), AXIS)
        cx = _sum_mp(mp.sum_(jax.vmap(
            lambda c_, x_: mp.dot(c_, x_, axis=0))(
                _mask_mp(bk.c, mask), x), axis=0))
        bx = _sum_mp(mp.sum_(jax.vmap(
            lambda B_, x_: la.matvec(B_, x_, transpose=True))(
                _mask_mp(bk.B, mask), x), axis=0))
        return (L_X, L_Y, ax, ay, dual_res, primal_res, derr, perr, cx, bx)

    return _sharded(
        mesh, fn,
        in_specs=(_bucket_spec(shape), s, s, (s, s), (s, s), r),
        out_specs=((s, s), (s, s), [s] * npar, [s] * npar, s, (s, s),
                   r, r, r, r))


def compute_residues(problem: MeshProblem, state: BucketedState):
    L_X, L_Y, ax, ay, dual_res, primal_res = [], [], [], [], [], []
    cx_parts, bx_parts, derrs, perrs = [], [], [], []
    for i, mb in enumerate(problem.buckets):
        kern = _residues_kernel(problem.mesh, mb.shape)
        (lx, ly, a_, b_, d, pr, derr, perr, cx, bx) = kern(
            mb.data, mb.mask, state.x[i], tuple(state.X[i]),
            tuple(state.Y[i]), state.y)
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
     primal_error_P, primal_error_p, primal_res_p) = bi._residues_combine(
        problem.objective_const, problem.b, state.y, tuple(cx_parts),
        tuple(bx_parts), tuple(derrs), tuple(perrs))
    return bi.Residues(primal_objective, dual_objective, duality_gap,
                       dual_error, primal_error_P, primal_error_p,
                       L_X, L_Y, ax, ay, dual_res, primal_res, primal_res_p)


@functools.lru_cache(maxsize=None)
def _schur_chol_kernel(mesh, shape):
    """Per-bucket S-Cholesky + L^-1 B, plus the bucket's replicated
    column exponents / finiteness for the distributed Q SYRK."""
    from ..ops import mpmm

    s = P(AXIS)
    r = P()
    npar = len(bi._parities(shape))

    def fn(bk, mask, ax, ay):
        S = bi._vblock(bk, lambda bl, a, b: it._schur_complement_block(
            bl, list(a), list(b)), tuple(ax), tuple(ay))
        ls = la.cholesky(S)
        lb = la.solve_lower(ls, bk.B)
        # phantom blocks have B = 0 so lb = 0 and contribute nothing,
        # but mask anyway to stop any NaN leak
        lbm = _mask_mp(lb, mask)
        e_loc = jnp.max(mpmm.exponents(lbm), axis=(0, 1))
        e_col = jax.lax.pmax(e_loc, AXIS)
        fin = jnp.isfinite(jnp.max(jnp.abs(lbm[..., 0]))).astype(jnp.int32)
        fin = jax.lax.pmin(fin, AXIS)
        return ls, lb, lbm, e_col, fin

    return _sharded(mesh, fn,
                    in_specs=(_bucket_spec(shape), s, [s] * npar,
                              [s] * npar),
                    out_specs=(s, s, s, r, r))


@functools.lru_cache(maxsize=None)
def _q_residues_kernel(mesh, shape, plan):
    """Distributed exact Q SYRK contribution: per-device integer
    residue SYRK of the local L^-1 B stack, then an int32 `psum` over
    the mesh axis -- integer adds cannot round, so the cross-chip
    reduction is exact (`restore_and_reduce.cxx` redesigned; this is
    the int-plane reduction `sdpb_tpu.ops`' docstring promises)."""
    from ..ops import mpmm

    s = P(AXIS)
    r = P()

    def fn(lbm, e_col):
        from ..ops import exact

        nb, schur, n, k = lbm.shape
        x = lbm.reshape(nb * schur, n, k)
        u = mpmm.scale_pow2(x, -e_col[None, :])
        d = mpmm.digits_dev(u, plan)
        r_split = exact.residues_split(d, plan)
        q_res = exact.syrk_residues_split(r_split, plan)
        diag_res = exact.syrk_diag_residues_split(r_split, plan)
        # ONE fused int32 psum for both (exact integer reduction)
        return (jax.lax.psum(q_res, AXIS), jax.lax.psum(diag_res, AXIS))

    return _sharded(mesh, fn, in_specs=(s, r), out_specs=(r, r))


@functools.lru_cache(maxsize=None)
def _q_residues_partial_kernel(mesh, shape, plan):
    """As `_q_residues_kernel` but WITHOUT the psum: returns each
    device's int32 partial on a leading sharded device axis, feeding
    the distributed path's `psum_scatter` (the reference's
    reduce-scatter, `restore_and_reduce.cxx:94-101`)."""
    from ..ops import mpmm

    s = P(AXIS)
    r = P()

    def fn(lbm, e_col):
        nb, schur, n, k = lbm.shape
        q_res, _ = mpmm.syrk_residues_mp(
            lbm.reshape(nb * schur, n, k), plan, e_col=e_col)
        return q_res[None]          # (1, P, N, N) -> sharded stack

    return _sharded(mesh, fn, in_specs=(s, r), out_specs=s)


#: dual dimensions >= this ALWAYS use the distributed (row-sharded) Q
#: restore, Cholesky and dy solves; below it the choice comes from the
#: memory estimate (`should_distribute_q`).  Tests lower it to force
#: the distributed path on toy problems.
DIST_Q_MIN_N = 2048

#: fraction of per-device memory the replicated Q working set (Q,
#: L_Q, restore temporaries ~ 6 copies of N^2 MP entries) may occupy
#: before the row-sharded path engages
DIST_Q_MEM_FRACTION = 0.10


def should_distribute_q(problem) -> bool:
    """Engage the distributed Q path when the replicated N x N working
    set would crowd per-device memory (the reference distributes Q
    unconditionally across all ranks,
    `initialize_schur_complement_solver.cxx:95-104`; replicating is the
    TPU fast path for small N, but must yield before Q dominates HBM).
    """
    n = problem.dual_dim
    if n >= DIST_Q_MIN_N:
        return True
    if problem.mesh.devices.size < 2:
        return False
    k = problem.b.shape[-1]
    q_bytes = 6 * n * n * k * np.dtype(
        jnp.dtype(problem.b.dtype).name).itemsize
    from ..solver.memory import detect_device_memory

    mem = detect_device_memory()
    if not mem:
        return False
    return q_bytes > DIST_Q_MEM_FRACTION * mem


@dataclasses.dataclass
class DistLQ:
    """Row-sharded lower Cholesky factor of the (padded) global Q."""

    l_sharded: jax.Array    # (N1, N1, K), rows sharded over AXIS
    mesh: Mesh
    n: int                  # unpadded dual dimension


def schur_factorize(problem: MeshProblem, res):
    from ..ops import mpmm

    k = problem.b.shape[-1]
    total_rows = sum(mb.data.nb * mb.shape.schur_size
                     for mb in problem.buckets)
    plan = mpmm.plan_for(mpmm.precision_of(problem.b.dtype, k), total_rows)
    distributed = should_distribute_q(problem)
    L_S, LinvB = [], []
    lbms, e_cols, fins = [], [], []
    for i, mb in enumerate(problem.buckets):
        ls, lb, lbm, e_col, fin = _schur_chol_kernel(
            problem.mesh, mb.shape)(mb.data, mb.mask, res.ax[i], res.ay[i])
        L_S.append(ls)
        LinvB.append(lb)
        lbms.append(lbm)
        e_cols.append(e_col)
        fins.append(fin)
    e_col = e_cols[0]
    fin = fins[0]
    for e, f in zip(e_cols[1:], fins[1:]):
        e_col = jnp.maximum(e_col, e)
        fin = jnp.minimum(fin, f)
    if distributed:
        from . import dist_q

        q_sum = None
        for i, mb in enumerate(problem.buckets):
            q_part = _q_residues_partial_kernel(
                problem.mesh, mb.shape, plan)(lbms[i], e_col)
            q_sum = q_part if q_sum is None else q_sum + q_part
        kern = dist_q._restore_chol_kernel(
            problem.mesh, plan, k, problem.dual_dim,
            jnp.dtype(problem.b.dtype).name)
        l_sh = kern(q_sum, e_col, fin > 0)
        return L_S, LinvB, DistLQ(l_sharded=l_sh, mesh=problem.mesh,
                                  n=problem.dual_dim)
    q_sum = d_sum = None
    for i, mb in enumerate(problem.buckets):
        q_res, d_res = _q_residues_kernel(problem.mesh, mb.shape, plan)(
            lbms[i], e_col)
        if q_sum is None:
            q_sum, d_sum = q_res, d_res
        else:
            q_sum, d_sum = q_sum + q_res, d_sum + d_res
    L_Q = bi._q_restore_cholesky(q_sum, e_col, fin > 0, plan, k,
                                 problem.b, d_sum)
    return L_S, LinvB, L_Q


@functools.lru_cache(maxsize=None)
def _xy_kernel(mesh, shape):
    s = P(AXIS)
    r = P()

    def fn(bk, mask, X, Y):
        pars = bi._parities(bk.shape)
        k = bk.c.shape[-1]
        mb_ = []
        tr = mp.zeros((), k, dtype=bk.c.dtype)
        for p in range(2):
            if p not in pars:
                mb_.append(X[p])
                continue
            mxy = mp.neg(la.matmul(X[p], Y[p]))
            mb_.append(mxy)
            tr = mp.add(tr, mp.sum_(jax.vmap(la.trace)(
                _mask_mp(mxy, mask)), axis=0))
        return tuple(mb_), _sum_mp(tr)

    return _sharded(mesh, fn,
                    in_specs=(_bucket_spec(shape), s, (s, s), (s, s)),
                    out_specs=((s, s), r))


@functools.lru_cache(maxsize=None)
def _r_error_kernel(mesh, shape):
    s = P(AXIS)
    r = P()

    def fn(mask, minus_XY, mu):
        pars = [p for p in range(2) if minus_XY[p].shape[1] > 0]
        return jax.lax.pmax(jnp.max(jnp.stack([
            jnp.max(jnp.abs(mp.approx(_mask_mp(
                la.add_diag(minus_XY[p], mu), mask))))
            for p in pars])), AXIS)

    return _sharded(mesh, fn, in_specs=(s, (s, s), r), out_specs=r)


def compute_xy_mu(problem: MeshProblem, state: BucketedState,
                  max_complementarity):
    minus_XY, tr_parts = [], []
    for i, mb in enumerate(problem.buckets):
        mb_, tr = _xy_kernel(problem.mesh, mb.shape)(
            mb.data, mb.mask, tuple(state.X[i]), tuple(state.Y[i]))
        minus_XY.append(mb_)
        tr_parts.append(tr)
    mu, terminate_max_c = bi._mu_combine(
        tuple(tr_parts), problem.total_psd_rows, max_complementarity)
    r_errs = [_fetch(_r_error_kernel(problem.mesh, mb.shape)(
        mb.mask, tuple(minus_XY[i]), mu))
        for i, mb in enumerate(problem.buckets)]
    k = problem.b.shape[-1]
    R_error = mp.from_f64_np(float(np.max(r_errs)), k, problem.b.dtype)
    return minus_XY, mu, R_error, terminate_max_c


@functools.lru_cache(maxsize=None)
def _search_pre_kernel(mesh, shape):
    s = P(AXIS)
    r = P()

    def fn(bk, mask, x, X, Y, L_X, primal_res, dual_res, minus_XY, L_S,
           LinvB, beta_mu, dXdY):
        R, dx, _ = bi._search_pre_bucket.__wrapped__(
            bk, x, X, Y, L_X, primal_res, dual_res, minus_XY, L_S, LinvB,
            beta_mu, dXdY)
        dx = _mask_mp(dx, mask)
        dy_part = _sum_mp(mp.sum_(jax.vmap(
            lambda lb, d: la.matvec(lb, d, transpose=True))(LinvB, dx),
            axis=0))
        return R, dx, dy_part

    return _sharded(
        mesh, fn,
        in_specs=(_bucket_spec(shape), s, s, (s, s), (s, s), (s, s),
                  (s, s), s, (s, s), s, s, r, (s, s)),
        out_specs=((s, s), s, r))


@functools.lru_cache(maxsize=None)
def _search_post_kernel(mesh, shape):
    s = P(AXIS)
    r = P()

    def fn(bk, mask, dx, dy, L_S, LinvB, Y, L_X, primal_res, R):
        dx, dXb, dYb = bi._search_post_bucket.__wrapped__(
            bk, dx, dy, L_S, LinvB, Y, L_X, primal_res, R)
        dx = _mask_mp(dx, mask)
        dXb = tuple(_mask_mp(d, mask) for d in dXb)
        dYb = tuple(_mask_mp(d, mask) for d in dYb)
        return dx, dXb, dYb

    return _sharded(
        mesh, fn,
        in_specs=(_bucket_spec(shape), s, s, r, s, s, (s, s), (s, s),
                  (s, s), (s, s)),
        out_specs=(s, (s, s), (s, s)))


def search_direction(problem: MeshProblem, state: BucketedState, res,
                     minus_XY, L_S, LinvB, L_Q, beta_mu, dXdY):
    R_list, dx_list, dy_parts = [], [], []
    for i, mb in enumerate(problem.buckets):
        R, dx, dy_part = _search_pre_kernel(problem.mesh, mb.shape)(
            mb.data, mb.mask, state.x[i], tuple(state.X[i]),
            tuple(state.Y[i]), res.L_X[i], res.primal_res[i],
            res.dual_res[i], tuple(minus_XY[i]), L_S[i], LinvB[i], beta_mu,
            tuple(dXdY[i]))
        R_list.append(R)
        dx_list.append(dx)
        dy_parts.append(dy_part)

    if isinstance(L_Q, DistLQ):
        from . import dist_q

        dy_rhs = res.primal_res_p
        for part in dy_parts:
            dy_rhs = mp.sub(dy_rhs, part)
        dy = dist_q.dist_cholesky_solve(L_Q.mesh, L_Q.l_sharded, dy_rhs,
                                        L_Q.n)
    else:
        dy = bi._dy_solve(res.primal_res_p, tuple(dy_parts), L_Q)

    dX, dY = [], []
    for i, mb in enumerate(problem.buckets):
        dx, dXb, dYb = _search_post_kernel(problem.mesh, mb.shape)(
            mb.data, mb.mask, dx_list[i], dy, L_S[i], LinvB[i],
            tuple(state.Y[i]), res.L_X[i], res.primal_res[i], R_list[i])
        dx_list[i] = dx
        dX.append(dXb)
        dY.append(dYb)
    return dx_list, dX, dy, dY


@functools.lru_cache(maxsize=None)
def _frob_kernel(mesh, shape):
    s = P(AXIS)
    r = P()

    def fn(bk, mask, X, dX, Y, dY):
        k = bk.c.shape[-1]
        frob = mp.zeros((), k, dtype=bk.c.dtype)
        for p in bi._parities(bk.shape):
            per = jax.vmap(lambda a, b, c_, d: la.frobenius(
                mp.add(a, b), mp.add(c_, d)))(X[p], dX[p], Y[p], dY[p])
            frob = mp.add(frob, mp.sum_(_mask_mp(per, mask), axis=0))
        return _sum_mp(frob)

    return _sharded(
        mesh, fn,
        in_specs=(_bucket_spec(shape), s, (s, s), (s, s), (s, s), (s, s)),
        out_specs=r)


def corrector_beta(problem: MeshProblem, state: BucketedState, dX, dY,
                   mu, feasible, feasible_centering, infeasible_centering):
    parts = [_frob_kernel(problem.mesh, mb.shape)(
        mb.data, mb.mask, tuple(state.X[i]), tuple(dX[i]),
        tuple(state.Y[i]), tuple(dY[i]))
        for i, mb in enumerate(problem.buckets)]
    return bi._beta_combine(tuple(parts), mu, problem.total_psd_rows,
                            feasible, feasible_centering,
                            infeasible_centering)


@functools.lru_cache(maxsize=None)
def _lambda_kernel(mesh, shape):
    s = P(AXIS)
    r = P()

    def fn(bk, mask, L_X, dX, L_Y, dY):
        k = bk.c.shape[-1]
        dtype = bk.c.dtype
        inf = mp.const_word(jnp.asarray(jnp.inf, dtype), k, dtype=dtype)
        lam_p, lam_d = inf, inf

        def masked_min(lams):
            # fill phantom slots with a FORMAT-CORRECT +inf (raw inf in
            # every slot corrupts the limb format's exponent slot and
            # made the argmin pick the phantom -> step length 1.0)
            lams = mp.where(mask > 0, lams,
                            jnp.broadcast_to(inf, lams.shape))
            return bi._min_mp_over(lams)

        for p in bi._parities(bk.shape):
            cp = jax.vmap(la.lower_inverse_congruence)(L_X[p], dX[p])
            lam_p = it.min_mp(lam_p, masked_min(
                jax.vmap(it._min_eig_mp)(cp)))
            cd = jax.vmap(la.lower_inverse_congruence)(L_Y[p], dY[p])
            lam_d = it.min_mp(lam_d, masked_min(
                jax.vmap(it._min_eig_mp)(cd)))
        # MP pmin over the mesh axis: all_gather + leading-word argmin
        lam_p = bi._min_mp_over(jax.lax.all_gather(lam_p, AXIS))
        lam_d = bi._min_mp_over(jax.lax.all_gather(lam_d, AXIS))
        return lam_p, lam_d

    return _sharded(
        mesh, fn,
        in_specs=(_bucket_spec(shape), s, (s, s), (s, s), (s, s), (s, s)),
        out_specs=(r, r))


@functools.lru_cache(maxsize=None)
def _update_kernel(mesh, shape):
    s = P(AXIS)
    r = P()

    def fn(x, X, Y, dx, dX, dY, alpha_p, alpha_d):
        return bi._update_bucket.__wrapped__(x, X, Y, dx, dX, dY, alpha_p,
                                             alpha_d)

    return _sharded(
        mesh, fn,
        in_specs=(s, (s, s), (s, s), s, (s, s), (s, s), r, r),
        out_specs=(s, (s, s), (s, s)))


def apply_step(problem: MeshProblem, state: BucketedState, res,
               dx, dX, dy, dY, feasible, gamma: float):
    lam_ps, lam_ds = [], []
    for i, mb in enumerate(problem.buckets):
        lp, ld = _lambda_kernel(problem.mesh, mb.shape)(
            mb.data, mb.mask, res.L_X[i], tuple(dX[i]),
            res.L_Y[i], tuple(dY[i]))
        lam_ps.append(lp)
        lam_ds.append(ld)
    alpha_p, alpha_d = bi._alphas(tuple(lam_ps), tuple(lam_ds),
                                  jnp.asarray(feasible), gamma)

    new_x, new_X, new_Y = [], [], []
    for i, mb in enumerate(problem.buckets):
        nx, nX, nY = _update_kernel(problem.mesh, mb.shape)(
            state.x[i], tuple(state.X[i]), tuple(state.Y[i]),
            dx[i], tuple(dX[i]), tuple(dY[i]), alpha_p, alpha_d)
        new_x.append(nx)
        new_X.append(nX)
        new_Y.append(nY)
    new_state = BucketedState(x=new_x, y=bi._update_y(state.y, dy, alpha_d),
                              X=new_X, Y=new_Y)
    return new_state, mp.fst(alpha_p), mp.fst(alpha_d)


def compute_step(problem: MeshProblem, state: BucketedState, res, params,
                 is_primal_and_dual_feasible: bool):
    """Driver-compatible predictor-corrector step over the mesh."""
    dtype = problem.b.dtype
    k = problem.b.shape[-1]
    feasible = jnp.asarray(is_primal_and_dual_feasible)

    L_S, LinvB, L_Q = schur_factorize(problem, res)
    minus_XY, mu, R_error, terminate_max_c = compute_xy_mu(
        problem, state, np.asarray(params.max_complementarity_mp(dtype)))

    beta_pred = jnp.asarray(
        params.predictor_beta(is_primal_and_dual_feasible, k, dtype))
    zeros = [tuple(jnp.zeros_like(state.X[i][p]) for p in range(2))
             for i in range(len(problem.buckets))]
    dx, dX, dy, dY = search_direction(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_pred, mu), zeros)

    beta_corrector = corrector_beta(
        problem, state, dX, dY, mu, feasible,
        np.asarray(params.feasible_centering_mp(dtype)),
        np.asarray(params.infeasible_centering_mp(dtype)))

    dXdY = [bi._pair_products_bucket(mb.data, tuple(dX[i]), tuple(dY[i]))
            for i, mb in enumerate(problem.buckets)]
    dx, dX, dy, dY = search_direction(
        problem, state, res, minus_XY, L_S, LinvB, L_Q,
        mp.mul(beta_corrector, mu), dXdY)

    new_state, alpha_p, alpha_d = apply_step(
        problem, state, res, dx, dX, dy, dY, feasible,
        params.step_length_reduction)

    if isinstance(L_Q, DistLQ):
        lq_view = L_Q.l_sharded[:L_Q.n, :L_Q.n]
    else:
        lq_view = L_Q
    info = bi.StepInfo(
        mu=mu, beta_corrector=beta_corrector, primal_step=alpha_p,
        dual_step=alpha_d, R_error=R_error,
        terminate_max_complementarity=terminate_max_c,
        q_cond=float(la.cholesky_condition_estimate(lq_view)))
    return new_state, info


# ---------------------------------------------------------------------------
# Driver integration
# ---------------------------------------------------------------------------

def initial_state(problem: MeshProblem, scale_primal, scale_dual
                  ) -> BucketedState:
    """Cold start x = y = 0, X = Omega_p I, Y = Omega_d I, already
    padded and sharded (`SDP_Solver.cxx:23-37`)."""
    mesh = problem.mesh
    sharded = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())
    k = problem.b.shape[-1]
    dtype = problem.b.dtype

    def eye(nb, n, scale):
        m = np.zeros((nb, n, n, k), np.dtype(jnp.dtype(dtype).name))
        if n:
            svec = np.asarray(mp.from_f64_np(float(scale), k, dtype))
            m[:, np.arange(n), np.arange(n), :] = svec
        return _put(m, sharded)

    x, X, Y = [], [], []
    for mb in problem.buckets:
        nb = mb.nb
        se, so = mb.shape.psd_sizes
        x.append(_put(
            jnp.zeros((nb, mb.shape.schur_size, k), dtype), sharded))
        X.append((eye(nb, se, scale_primal), eye(nb, so, scale_primal)))
        Y.append((eye(nb, se, scale_dual), eye(nb, so, scale_dual)))
    y = _put(jnp.zeros((problem.dual_dim, k), dtype), repl)
    return BucketedState(x=x, y=y, X=X, Y=Y)
