"""Bucketed, mesh-sharded solver step: the multi-chip execution path.

The reference parallelizes by partitioning the J PMP blocks across MPI
process groups with cost-based bin packing
(`sdpb_util/block_mapping/compute_block_grid_mapping.hxx`); the only
globally-coupled objects in an iteration are the N x N matrix
Q = sum_j (L_j^-1 B_j)^T (L_j^-1 B_j), the N-vector dy, and scalar
reductions (SURVEY §3.2).

TPU-native equivalent: blocks of identical shape are stacked into a
"bucket" (leading axis nb) and vmapped; the bucket axis is sharded over
a 1-D device mesh axis ``"blocks"`` with shard_map.  Cross-block
reductions become collectives over ICI:

- error norms: `pmax` / `pmin` (f64 scalars, same as MPI AllReduce MAX)
- MP-valued reductions (Q, dy RHS, c.x, traces): word-wise f64 `psum`
  is NOT exact (each word's rounding corrupts the next word), so v1
  uses `all_gather` + a local MP tree sum, which is as accurate as the
  single-device sum.  The production path for large Q replaces this
  with an exact int32 digit-plane `psum` (the CRT/fixed-point layer in
  sdpb_tpu.ops), mirroring how the reference reduces Q in exact bigint
  form (`bigint_syrk/restore_and_reduce.cxx`).

Heterogeneous-shape problems use several buckets (+ padding), assigned
to the mesh by the same LPT cost model as the reference; v1 implements
the single-bucket case with both parities non-empty, which already
exercises the full sharded iteration (used by
`__graft_entry__.dryrun_multichip`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P  # noqa: F401  (re-export)

from ..mp import core as mp
from ..mp import linalg as la
from ..solver import iteration as it
from ..solver.data import BlockShape, SDPBlock


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Bucket:
    """nb same-shape blocks stacked on axis 0."""

    c: jax.Array        # (nb, schur, K)
    B: jax.Array        # (nb, schur, N, K)
    q: tuple            # ((nb, he, pts, K), (nb, ho, pts, K))
    u: tuple            # ((nb, m*he, m*pts, K), ...)
    shape: BlockShape = dataclasses.field(metadata={"static": True})

    @property
    def nb(self):
        return self.c.shape[0]

    def tree_flatten(self):
        return (self.c, self.B, self.q, self.u), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        c, B, q, u = children
        return cls(c=c, B=B, q=q, u=u, shape=shape)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BucketedState:
    x: jax.Array   # (nb, schur, K)
    y: jax.Array   # (N, K) replicated
    X: tuple       # ((nb, se, se, K), (nb, so, so, K))
    Y: tuple

    def tree_flatten(self):
        return (self.x, self.y, self.X, self.Y), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


def make_sharded_step(shape: BlockShape, gamma: float = 0.7,
                      axis: str | None = "blocks"):
    """Build the full-iteration step for one bucket of identical-shape
    blocks; see module docstring for the collective contract.  The
    result is shard_map-able over mesh axis ``axis`` (or runs
    single-device with ``axis=None``)."""
    assert shape.psd_size(0) > 0 and shape.psd_size(1) > 0, \
        "v1 bucketed path requires both parity blocks non-empty"
    parities = (0, 1)

    def step(bucket: Bucket, state: BucketedState, b_vec, total_psd_rows,
             beta_infeasible):
        k = bucket.c.shape[-1]
        dtype = bucket.c.dtype

        def pmax(v):
            return jax.lax.pmax(v, axis) if axis else v

        def pmin(v):
            return jax.lax.pmin(v, axis) if axis else v

        def sum_mp(v):
            """Exact-as-local MP sum across devices (all_gather + tree)."""
            if axis is None:
                return v
            g = jax.lax.all_gather(v, axis)     # (n_dev, ..., K)
            return mp.sum_(g, axis=0)

        def vblock(fn, *args):
            """vmap a per-block kernel over the bucket axis, rebuilding
            the SDPBlock view inside."""
            def wrapped(c_, B_, q_, u_, *rest):
                bl = SDPBlock(c=c_, B=B_, q=q_, u=u_, shape=shape)
                return fn(bl, *rest)
            return jax.vmap(wrapped)(bucket.c, bucket.B, bucket.q, bucket.u,
                                     *args)

        # --- objective piece c.x (global) ---
        cx = sum_mp(mp.sum_(jax.vmap(lambda c_, x_: mp.dot(c_, x_, axis=0))(
            bucket.c, state.x), axis=0))

        # --- Cholesky of X, Y ---
        L_X = tuple(la.cholesky(state.X[p]) for p in parities)
        L_Y = tuple(la.cholesky(state.Y[p]) for p in parities)

        # --- pairings ---
        ax, ay = vblock(lambda bl, Lx, Yb: it._pairings_block(bl, Lx, Yb),
                        L_X, tuple(state.Y[p] for p in parities))

        # --- residues ---
        dres = vblock(
            lambda bl, a: it._dual_residues_block(bl, list(a), state.y),
            tuple(ay))
        dual_error = pmax(jnp.max(jnp.abs(mp.approx(dres))))

        w = vblock(lambda bl, x_: it._weighted_sum_block(bl, x_), state.x)
        primal_res = tuple(mp.sub(w[p], state.X[p]) for p in parities)
        primal_error_P = pmax(jnp.maximum(
            jnp.max(jnp.abs(mp.approx(primal_res[0]))),
            jnp.max(jnp.abs(mp.approx(primal_res[1])))))

        primal_res_p = mp.sub(b_vec, sum_mp(mp.sum_(jax.vmap(
            lambda B_, x_: la.matvec(B_, x_, transpose=True))(
                bucket.B, state.x), axis=0)))
        primal_error_p = jnp.max(jnp.abs(mp.approx(primal_res_p)))

        # --- Schur factorization (Q reduction = the global collective) ---
        S = vblock(lambda bl, a, b: it._schur_complement_block(
            bl, list(a), list(b)), ax, ay)
        L_S = la.cholesky(S)
        LinvB = la.solve_lower(L_S, bucket.B)
        Q = sum_mp(mp.sum_(jax.vmap(
            lambda lb: la.matmul(lb, lb, transpose_a=True))(LinvB), axis=0))
        L_Q = la.cholesky(Q)

        # --- -XY, mu ---
        minus_XY = tuple(mp.neg(la.matmul(state.X[p], state.Y[p]))
                         for p in parities)
        tr_local = mp.zeros((), k, dtype=dtype)
        for p in parities:
            tr_local = mp.add(tr_local,
                              mp.sum_(jax.vmap(la.trace)(minus_XY[p]), axis=0))
        mu = mp.div(mp.neg(sum_mp(tr_local)),
                    mp.const_word(jnp.asarray(float(total_psd_rows), dtype), k,
                                dtype=dtype))

        def direction(beta_mu, dXdY):
            R = tuple(la.add_diag(mp.sub(minus_XY[p], dXdY[p]), beta_mu)
                      for p in parities)
            Z = tuple(la.symmetrize(la.cholesky_solve(
                L_X[p], mp.sub(la.matmul(primal_res[p], state.Y[p]), R[p])))
                for p in parities)
            dx = vblock(lambda bl, d, z0, z1: it._schur_rhs_block(
                bl, d, [z0, z1]), dres, Z[0], Z[1])
            dx = la.solve_lower(L_S, dx)
            dy_rhs = mp.sub(primal_res_p, sum_mp(mp.sum_(jax.vmap(
                lambda lb, d: la.matvec(lb, d, transpose=True))(LinvB, dx),
                axis=0)))
            dy = la.cholesky_solve(L_Q, dy_rhs)
            dx = mp.add(dx, jax.vmap(lambda lb: la.matvec(lb, dy))(LinvB))
            dx = la.solve_lower_t(L_S, dx)
            wd = vblock(lambda bl, d: it._weighted_sum_block(bl, d), dx)
            dX = tuple(mp.add(wd[p], primal_res[p]) for p in parities)
            dY = tuple(mp.neg(la.symmetrize(la.cholesky_solve(
                L_X[p], mp.sub(la.matmul(dX[p], state.Y[p]), R[p]))))
                for p in parities)
            return dx, dX, dy, dY

        # predictor (infeasible-phase beta; the host driver switches to
        # the feasible-phase schedule exactly as in the unbucketed path)
        zeros_pair = tuple(jnp.zeros_like(state.X[p]) for p in parities)
        dx, dX, dy, dY = direction(mp.mul(beta_infeasible, mu), zeros_pair)

        # corrector beta (`corrector_centering_parameter.cxx`)
        frob_local = mp.zeros((), k, dtype=dtype)
        for p in parities:
            frob_local = mp.add(frob_local, mp.sum_(jax.vmap(
                lambda a, b, c_, d: la.frobenius(mp.add(a, b), mp.add(c_, d)))(
                state.X[p], dX[p], state.Y[p], dY[p]), axis=0))
        r = mp.div(sum_mp(frob_local),
                   mp.mul_f64(mu, jnp.asarray(float(total_psd_rows), dtype)))
        one = mp.const_word(jnp.asarray(1.0, dtype), k, dtype=dtype)
        beta = mp.where(mp.cmp_lt(r, one), mp.mul(r, r), r)
        beta = mp.max_(beta_infeasible, beta)

        dXdY = tuple(la.matmul(dX[p], dY[p]) for p in parities)
        dx, dX, dy, dY = direction(mp.mul(beta, mu), dXdY)

        # --- step lengths ---
        lam_p = jnp.asarray(jnp.inf, mp.approx_dtype(bucket.c.dtype))
        lam_d = jnp.asarray(jnp.inf, mp.approx_dtype(bucket.c.dtype))
        for p in parities:
            cp = jax.vmap(la.lower_inverse_congruence)(L_X[p], dX[p])
            lam_p = jnp.minimum(lam_p, jnp.min(jax.vmap(
                lambda c_: jnp.linalg.eigvalsh(mp.approx(c_))[0])(cp)))
            cd = jax.vmap(la.lower_inverse_congruence)(L_Y[p], dY[p])
            lam_d = jnp.minimum(lam_d, jnp.min(jax.vmap(
                lambda c_: jnp.linalg.eigvalsh(mp.approx(c_))[0])(cd)))
        lam_p = pmin(lam_p)
        lam_d = pmin(lam_d)

        def to_alpha(lam):
            return jnp.where(lam > -gamma, jnp.asarray(1.0, lam.dtype),
                             -gamma / lam)

        alpha_p = to_alpha(lam_p)
        alpha_d = to_alpha(lam_d)

        new_state = BucketedState(
            x=mp.add(state.x, mp.mul_f64(dx, alpha_p)),
            y=mp.add(state.y, mp.mul_f64(dy, alpha_d)),
            X=tuple(mp.add(state.X[p], mp.mul_f64(dX[p], alpha_p))
                    for p in parities),
            Y=tuple(mp.add(state.Y[p], mp.mul_f64(dY[p], alpha_d))
                    for p in parities),
        )
        info = {
            "mu": mp.approx(mu),
            "dual_error": dual_error,
            "primal_error_P": primal_error_P,
            "primal_error_p": primal_error_p,
            "primal_step": alpha_p,
            "dual_step": alpha_d,
            "cx": mp.approx(cx),
        }
        return new_state, info

    return step
