"""Intra-block model parallelism: one PSD block sharded over the mesh.

The reference assigns blocks too large for one rank to a process group
with a 2-D block-cyclic `El::Grid`, so the block's Cholesky/Trsm/Syrk
span multiple ranks (`Block_Map.hxx:8-14`, `sdpb/solve.cxx:31`).  The
TPU equivalent: the block's row axis is sharded over the mesh and the
dense MP kernels run as row-panel collectives -- the same machinery
that distributes the global Q (`parallel.dist_q`), exposed here for a
single over-HBM block:

- `cholesky`: row-panel blocked right-looking factorization; the
  O(n^3) trailing update is distributed, the O((n/D)^3) panel work is
  redundantly replicated (cheaper than communicating it).
- `solve_lower` / `solve_lower_t` / `cholesky_solve`: panel-sequential
  triangular solves with matrix RHS (distributed Trsm).
- `syrk`: exact X^T X through the int8-MXU CRT pipeline with an int32
  `psum` over row shards (`bigint_syrk` for one block's pairing).

Layout contract: row-sharded arrays are (n, ..., K) with n divisible
by the mesh size, device d owning rows [d*n/D, (d+1)*n/D); replicated
operands use PartitionSpec().  All results are bit-compatible with the
single-device kernels up to blocked-Cholesky rounding reordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mp import core as mp
from ..mp import linalg as la
from . import dist_q
from ._shard import shard_map

AXIS = dist_q.AXIS


def _row_sharding(mesh):
    return NamedSharding(mesh, P(AXIS))


def shard_rows(mesh: Mesh, a):
    """Place (n, ..., K) with the leading axis sharded over the mesh."""
    n = a.shape[0]
    if n % mesh.devices.size:
        raise ValueError(
            f"row count {n} not divisible by mesh size "
            f"{mesh.devices.size}; pad the block first")
    return jax.device_put(a, _row_sharding(mesh))


@functools.lru_cache(maxsize=None)
def _chol_kernel(mesh):
    n_dev = mesh.devices.size

    def fn(a_loc):
        return dist_q._cholesky_rowpanel(a_loc, n_dev)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(AXIS),),
                             out_specs=P(AXIS)))


def cholesky(mesh: Mesh, a):
    """Lower Cholesky of a row-sharded symmetric MP matrix (n, n, K);
    returns the row-sharded factor."""
    return _chol_kernel(mesh)(a)


@functools.lru_cache(maxsize=None)
def _solve_kernel(mesh, transpose: bool, both: bool):
    n_dev = mesh.devices.size

    def fn(l_loc, b):
        if both:
            x = dist_q._solve_lower_rowpanel(l_loc, b, n_dev)
            return dist_q._solve_lower_t_rowpanel(l_loc, x, n_dev)
        if transpose:
            return dist_q._solve_lower_t_rowpanel(l_loc, b, n_dev)
        return dist_q._solve_lower_rowpanel(l_loc, b, n_dev)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(AXIS), P()),
                             out_specs=P()))


def solve_lower(mesh: Mesh, l_sharded, b):
    """X = L^-1 B; L row-sharded, B (n, K) or (n, m, K) replicated."""
    return _solve_kernel(mesh, False, False)(l_sharded, b)


def solve_lower_t(mesh: Mesh, l_sharded, b):
    return _solve_kernel(mesh, True, False)(l_sharded, b)


def cholesky_solve(mesh: Mesh, l_sharded, b):
    return _solve_kernel(mesh, False, True)(l_sharded, b)


@functools.lru_cache(maxsize=None)
def _syrk_kernel(mesh, plan, k_out: int):
    def fn(x_loc):
        from ..ops import mpmm

        # column scales must be shared across shards: pmax of local
        # per-column exponents, then one residue pass against them
        e_col = jax.lax.pmax(jnp.max(mpmm.exponents(x_loc), axis=0), AXIS)
        q_res, _ = mpmm.syrk_residues_mp(x_loc, plan, e_col=e_col)
        q_sum = jax.lax.psum(q_res, AXIS)
        q_sum = mpmm.reduce_residues_mod(q_sum, plan)
        out = mpmm.restore_q_mp(q_sum, e_col, plan, k_out, x_loc.dtype)
        bad = ~jnp.isfinite(jnp.max(jnp.abs(x_loc[..., 0])))
        bad = jax.lax.pmax(bad.astype(jnp.int32), AXIS) > 0
        return jnp.where(bad, jnp.asarray(jnp.nan, out.dtype), out)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(AXIS),),
                             out_specs=P()))


def syrk(mesh: Mesh, x_sharded, k_out: int | None = None):
    """Exact X^T X of a row-sharded MP matrix (n, m, K) -> replicated
    (m, m, K_out): per-shard int8-MXU residue SYRK + exact int32 psum
    (`bigint_syrk` over the block's process group)."""
    from ..ops import mpmm

    n, m, k = x_sharded.shape
    k_out = k_out if k_out is not None else k
    plan = mpmm.plan_for(mpmm.precision_of(x_sharded.dtype, k), n)
    return _syrk_kernel(mesh, plan, k_out)(x_sharded)


@functools.lru_cache(maxsize=None)
def _gemm_kernel(mesh, plan, k_out: int):
    def fn(x_loc, y_loc):
        from ..ops import exact, mpmm

        e_x = jax.lax.pmax(jnp.max(mpmm.exponents(x_loc), axis=0), AXIS)
        e_y = jax.lax.pmax(jnp.max(mpmm.exponents(y_loc), axis=0), AXIS)
        dx = mpmm.digits_dev(mpmm.scale_pow2(x_loc, -e_x[None, :]), plan)
        dy = mpmm.digits_dev(mpmm.scale_pow2(y_loc, -e_y[None, :]), plan)
        c_res = exact.gemm_residues_split(
            exact.residues_split(dx, plan),
            exact.residues_split(dy, plan), plan)
        c_sum = jax.lax.psum(c_res, AXIS)
        c_sum = mpmm.reduce_residues_mod(c_sum, plan)
        planes = exact.crt_restore_planes(c_sum, plan)
        w = mpmm.planes_to_mp_dev(planes, plan, k_out, x_loc.dtype)
        E = (mpmm._ref_bits(plan, k_out, x_loc.dtype)
             - 2 * plan.shift_bits) + e_x[:, None] + e_y[None, :]
        out = mpmm.scale_pow2(w, E)
        bad = ~(jnp.isfinite(jnp.max(jnp.abs(x_loc[..., 0])))
                & jnp.isfinite(jnp.max(jnp.abs(y_loc[..., 0]))))
        bad = jax.lax.pmax(bad.astype(jnp.int32), AXIS) > 0
        return jnp.where(bad, jnp.asarray(jnp.nan, out.dtype), out)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                             out_specs=P()))


def gemm(mesh: Mesh, x_sharded, y_sharded, k_out: int | None = None):
    """Exact X^T Y of row-sharded MP matrices (n, mx, K), (n, my, K)
    -> replicated (mx, my, K_out), by per-shard int8-MXU residue GEMM
    + exact int32 psum (the off-diagonal dgemm jobs next to
    `bigint_syrk_blas`)."""
    from ..ops import mpmm

    n, m, k = x_sharded.shape
    k_out = k_out if k_out is not None else k
    plan = mpmm.plan_for(mpmm.precision_of(x_sharded.dtype, k), n)
    return _gemm_kernel(mesh, plan, k_out)(x_sharded, y_sharded)
