"""Distributed N x N Q: reduce-scatter + row-panel Cholesky/solves.

The reference distributes the global Q matrix over all ranks: the
bigint SYRK results are reduce-scattered across nodes in exact integer
form (`bigint_syrk/restore_and_reduce.cxx:14-33`), and Q's Cholesky and
the dy solves run on the distributed matrix
(`initialize_schur_complement_solver.cxx:95-104`,
`solve_schur_complement_equation.cxx`).  The replicated path in
`parallel.mesh` caps N at one chip's HBM; this module removes that cap.

TPU-native layout: device d of the 1-D mesh owns the contiguous row
panel [d*rows_loc, (d+1)*rows_loc) of Q (N padded to n_dev * rows_loc
with an identity corner).  Pipeline, all inside shard_map:

1. the per-prime int32 Q residues are `psum_scatter`ed over the row
   axis -- integer adds cannot round, so the cross-chip reduction is
   exact (the reference's pairwise Sendrecv reduce, redesigned as one
   XLA collective);
2. each device CRT-restores only its own row panel to MP words;
3. blocked right-looking Cholesky with panel == device row block:
   the owner's diagonal block is psum-broadcast, every device factors
   it redundantly (O((N/D)^3) flops, negligible), trsm's its local
   rows, and the all_gathered panel drives the local trailing update
   (the O(N^3) bulk, distributed D ways);
4. forward/backward substitution for dy walk the panels with one
   (rows_loc, K) psum per panel.

Numerics: identical MP arithmetic to the replicated path; only the
blocking of the Cholesky differs, so results agree to the usual
rounding-reordering tolerance (<< word-0 precision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..mp import core as mp
from ..mp import linalg as la
from ._shard import shard_map

AXIS = "blocks"


def padded_rows(n: int, n_dev: int) -> int:
    """Rows per device after padding N up to a multiple of n_dev."""
    return -(-n // n_dev)


# ---------------------------------------------------------------------------
# Row-panel restore (inside shard_map)
# ---------------------------------------------------------------------------

def _restore_rows(q_scat, e_col_pad, finite, plan, k, dtype, n: int):
    """CRT-restore this device's Q row panel (P, rows_loc, N) ->
    (rows_loc, N1, K) MP, with identity on padded diagonal entries."""
    from ..ops import exact, mpmm

    n_primes, rows_loc = q_scat.shape[0], q_scat.shape[1]
    idx = jax.lax.axis_index(AXIS)
    row0 = idx * rows_loc
    n_dev = e_col_pad.shape[0] // rows_loc
    n1 = n_dev * rows_loc

    q_scat = mpmm.reduce_residues_mod(q_scat, plan)
    planes = exact.crt_restore_planes(q_scat, plan)
    w = mpmm.planes_to_mp_dev(planes, plan, k, dtype)
    ref_bits = mpmm._ref_bits(plan, k, dtype)
    e_row = jax.lax.dynamic_slice(e_col_pad, (row0,), (rows_loc,))
    E = (ref_bits - 2 * plan.shift_bits) \
        + e_row[:, None] + e_col_pad[:n][None, :]
    q_loc = mpmm.scale_pow2(w, E)
    q_loc = jnp.where(finite, q_loc, jnp.asarray(jnp.nan, q_loc.dtype))

    # pad columns to N1 and put 1 on padded global diagonal entries
    if n1 > n:
        from ..mp import core as mpcore

        q_loc = jnp.pad(q_loc, ((0, 0), (0, n1 - n), (0, 0)))
        rows_g = row0 + jnp.arange(rows_loc)
        pad_diag = (rows_g >= n)
        onev = jnp.asarray(mpcore.one_np(q_loc.shape[-1], q_loc.dtype))
        diag_vals = q_loc[jnp.arange(rows_loc), rows_g, :]
        q_loc = q_loc.at[jnp.arange(rows_loc), rows_g, :].set(
            jnp.where(pad_diag[:, None], onev[None, :], diag_vals))
    return q_loc


# ---------------------------------------------------------------------------
# Row-panel blocked Cholesky (inside shard_map)
# ---------------------------------------------------------------------------

def _cholesky_rowpanel(a_loc, n_dev: int):
    """Lower Cholesky of a row-sharded symmetric MP matrix.

    ``a_loc``: (rows_loc, N1, K), device d owns rows
    [d*rows_loc, (d+1)*rows_loc).  Panel size == rows_loc, so panel pi
    is owned exactly by device pi (`Block_Map`-style contiguous
    ownership without the 2-D cyclic grid -- the trailing update, the
    O(N^3) term, is what must distribute)."""
    rows_loc, n1, k = a_loc.shape
    idx = jax.lax.axis_index(AXIS)

    def panel_step(pi, a):
        j = pi * rows_loc
        own = pi == idx
        # diagonal block, broadcast from the owner
        diag_loc = jax.lax.dynamic_slice(a, (0, j, 0), (rows_loc, rows_loc, k))
        a11 = jax.lax.psum(jnp.where(own, diag_loc, 0.0), AXIS)
        l11 = la.cholesky(a11)
        # local rows of the panel column: L21 = A21 L11^-T
        l21 = la.transpose(la.solve_lower(l11, la.transpose(diag_loc)))
        below = idx > pi
        l_col = jnp.where(below, l21, jnp.where(own, l11, 0.0))
        a = jax.lax.dynamic_update_slice(a, l_col, (0, j, 0))
        # trailing update of rows strictly below the panel
        upd_src = jnp.where(below, l_col, 0.0)
        panel_all = jax.lax.all_gather(upd_src, AXIS,
                                       tiled=True)        # (N1, rows_loc, K)
        u = la.matmul(upd_src, panel_all, transpose_b=True)  # (rows_loc,N1,K)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n1,), 0)
        cmask = (cols >= j + rows_loc)[None, :, None]
        return mp.add(a, jnp.where(cmask, mp.neg(u), 0.0))

    a_loc = jax.lax.fori_loop(0, n_dev, panel_step, a_loc)
    # zero the strict upper triangle (global row < col)
    row0 = idx * rows_loc
    rows_g = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows_loc,), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n1,), 0)
    lower = (rows_g[:, None] >= cols[None, :])[:, :, None]
    return jnp.where(lower, a_loc, 0.0)


def _solve_lower_rowpanel(l_loc, b, n_dev: int):
    """x = L^-1 b with row-sharded L (rows_loc, N1, K) and replicated
    b (N1, K) or (N1, M, K); returns replicated x.  One owner psum per
    panel (cf. `solve_schur_complement_equation.cxx` trsv-down; matrix
    RHS = the reference's intra-block distributed Trsm)."""
    vec = b.ndim == 2
    if vec:
        b = b[:, None, :]
    rows_loc, n1, k = l_loc.shape
    m = b.shape[1]
    idx = jax.lax.axis_index(AXIS)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n1,), 0)

    def panel_step(pi, x):
        j = pi * rows_loc
        own = pi == idx
        # s = b[j:j+r] - L[j:j+r, :j] @ x[:j]  (owner-local)
        lrow = jnp.where((cols < j)[None, :, None], l_loc, 0.0)
        acc = la.matmul(lrow, x)
        bp = jax.lax.dynamic_slice(b, (j, 0, 0), (rows_loc, m, k))
        s = mp.sub(bp, acc)
        l11 = jax.lax.dynamic_slice(l_loc, (0, j, 0),
                                    (rows_loc, rows_loc, k))
        xp = la.solve_lower(l11, s)
        xp = jax.lax.psum(jnp.where(own, xp, 0.0), AXIS)
        return jax.lax.dynamic_update_slice(x, xp, (j, 0, 0))

    out = jax.lax.fori_loop(0, n_dev, panel_step, jnp.zeros_like(b))
    return out[:, 0, :] if vec else out


def _solve_lower_t_rowpanel(l_loc, b, n_dev: int):
    """x = L^-T b, backward panel substitution; the off-diagonal
    contribution (L^T)[panel, below] x[below] = sum over devices of
    their local panel-column blocks -- one exact gathered sum per
    panel.  b replicated (N1, K) or (N1, M, K)."""
    vec = b.ndim == 2
    if vec:
        b = b[:, None, :]
    rows_loc, n1, k = l_loc.shape
    m = b.shape[1]
    idx = jax.lax.axis_index(AXIS)
    row0 = idx * rows_loc

    def panel_step(t, x):
        pi = n_dev - 1 - t
        j = pi * rows_loc
        own = pi == idx
        # contribution from this device's rows (all below the panel iff
        # idx > pi): L[rows_loc rows, panel cols]^T @ x[local rows]
        pcol = jax.lax.dynamic_slice(l_loc, (0, j, 0),
                                     (rows_loc, rows_loc, k))
        zero = jnp.zeros((), row0.dtype)
        x_loc = jax.lax.dynamic_slice(x, (row0, zero, zero),
                                      (rows_loc, m, k))
        contrib = la.matmul(pcol, x_loc, transpose_a=True)
        contrib = jnp.where(idx > pi, contrib, 0.0)
        # word-wise float psum of MP values rounds at word-0 scale;
        # gather + MP tree sum is exact-as-local (mesh._sum_mp contract)
        acc = mp.sum_(jax.lax.all_gather(contrib, AXIS), axis=0)
        bp = jax.lax.dynamic_slice(b, (j, 0, 0), (rows_loc, m, k))
        s = mp.sub(bp, acc)
        l11 = jax.lax.dynamic_slice(l_loc, (0, j, 0),
                                    (rows_loc, rows_loc, k))
        xp = la.solve_lower_t(l11, s)
        xp = jax.lax.psum(jnp.where(own, xp, 0.0), AXIS)
        return jax.lax.dynamic_update_slice(x, xp, (j, 0, 0))

    out = jax.lax.fori_loop(0, n_dev, panel_step, jnp.zeros_like(b))
    return out[:, 0, :] if vec else out


# ---------------------------------------------------------------------------
# shard_map kernels (host-callable)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _restore_chol_kernel(mesh, plan, k: int, n: int, dtype_name: str):
    """q partials (sharded stack) -> row-sharded L_Q.

    Input: per-device int32 partial Q residues stacked on a leading
    device axis (n_dev, P, N, N) sharded over AXIS; e_col (N,) and the
    finiteness flag replicated.  psum_scatter pays one reduce-scatter
    of the integer residues; everything after is device-local except
    the Cholesky's panel collectives."""
    n_dev = mesh.devices.size
    rows_loc = padded_rows(n, n_dev)
    n1 = n_dev * rows_loc
    dtype = jnp.dtype(dtype_name)

    def fn(q_part, e_col, finite):
        q_part = q_part[0]                        # (P, N, N) local partial
        if n1 > n:
            q_part = jnp.pad(q_part, ((0, 0), (0, n1 - n), (0, 0)))
        q_scat = jax.lax.psum_scatter(q_part, AXIS, scatter_dimension=1,
                                      tiled=True)  # (P, rows_loc, N)
        e_pad = jnp.pad(e_col, (0, n1 - n)) if n1 > n else e_col
        q_loc = _restore_rows(q_scat, e_pad, finite, plan, k, dtype, n)
        return _cholesky_rowpanel(q_loc, n_dev)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(AXIS), P(), P()),
                             out_specs=P(AXIS)))


@functools.lru_cache(maxsize=None)
def _dist_solve_kernel(mesh, k: int):
    n_dev = mesh.devices.size

    def fn(l_loc, b):
        x = _solve_lower_rowpanel(l_loc, b, n_dev)
        return _solve_lower_t_rowpanel(l_loc, x, n_dev)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(AXIS), P()),
                             out_specs=P()))


def dist_cholesky_solve(mesh, l_q_sharded, rhs, n: int):
    """A^-1 rhs for the row-sharded L_Q (padded N1 rows); rhs (N, K)
    replicated; returns (N, K)."""
    k = rhs.shape[-1]
    n1 = l_q_sharded.shape[0]
    if n1 > n:
        rhs = jnp.pad(rhs, ((0, n1 - n), (0, 0)))
    x = _dist_solve_kernel(mesh, k)(l_q_sharded, rhs)
    return x[:n] if n1 > n else x
