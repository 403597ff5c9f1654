"""Dense linear algebra on multi-word (MP) matrices.

MP matrices have shape (..., n, m, K) with K trailing float64 words.
These are the TPU-side equivalents of the Elemental BigFloat kernels the
reference leans on (El::Cholesky / Trsm / Syrk / Gemm — e.g.
`src/sdp_solve/SDP_Solver/run/cholesky_decomposition.cxx`,
`.../compute_bilinear_pairings/compute_A_X_inv.cxx`,
`.../initialize_schur_complement_solver/compute_Q.cxx`).

The implementations here are vectorized expansion arithmetic (VPU);
Cholesky/Trsm are panel-blocked so the O(n^3) bulk runs as MP matmuls.
The MXU-accelerated exact integer SYRK backend lives in `sdpb_tpu.ops`
and is wired into the solver's Q computation (see
`solver.bucket_iteration.schur_factorize`), not into this module's
generic `matmul`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .core import MPArray

# Contraction chunk: bounds peak memory of the (m, chunk, p, K) product
# tensor in naive matmul.
_MATMUL_CHUNK = 128


# ---------------------------------------------------------------------------
# Matmul / Syrk
# ---------------------------------------------------------------------------

# Work threshold (contraction * output elements) above which a 3-D MP
# matmul routes to the exact integer-MXU backend (ops.mpmm): measured
# ~70-115x faster than the naive expansion product on both CPU-XLA and
# TPU at realistic solver sizes; below it, conversion overheads win.
_INT_BACKEND_MIN_WORK = 16 * 1024
# Batched products amortize the digitization/CRT fixed cost over the
# batch, so they route at a lower per-matrix threshold as long as the
# batch total clears the 3-D bar.
_INT_BACKEND_MIN_WORK_PER_BATCH = 2 * 1024


def _int_backend_ok(a, b, syrk: bool) -> bool:
    if a.ndim < 3:
        return False
    work = a.shape[-3] * a.shape[-2] * b.shape[-2]
    if a.ndim == 3:
        return work >= _INT_BACKEND_MIN_WORK
    # Batched products: the int8 batched matmuls ride the MXU, but on
    # CPU-XLA int8 dot_general has no fast BLAS path (measured ~1x at
    # best, 0.7x at nb=16 n=240); route batched products only where the
    # MXU exists.
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    batch = int(np.prod(a.shape[:-3]))
    return (work >= _INT_BACKEND_MIN_WORK_PER_BATCH
            and batch * work >= _INT_BACKEND_MIN_WORK)


def matmul(a: MPArray, b: MPArray, transpose_a: bool = False,
           transpose_b: bool = False) -> MPArray:
    """MP matrix product a @ b; shapes (m, n, K) x (n, p, K) -> (m, p, K).

    Large un-batched products route to the exact integer pipeline
    (`ops.mpmm`, the TPU redesign of the reference's `bigint_syrk`),
    with `a is b` SYRK detection (checked here, outside jit, where
    argument identity is visible); small/batched products use the naive
    vectorized expansion arithmetic.

    Sharding contract: the CONTRACTED axis must not be sharded -- the
    SPMD partitioner would reduce the per-device partial products with
    a word-wise float sum, which is not an MP add and corrupts the low
    words.  Distributed contractions belong to `parallel.intra`
    (explicit shard_map + exact integer psum)."""
    syrk = a is b and transpose_a != transpose_b
    return _matmul_impl(a, b, transpose_a, transpose_b, syrk)


@functools.partial(jax.jit, static_argnames=("transpose_a", "transpose_b",
                                             "syrk"))
def _matmul_impl(a: MPArray, b: MPArray, transpose_a: bool,
                 transpose_b: bool, syrk: bool) -> MPArray:
    if transpose_a:
        a = jnp.swapaxes(a, -3, -2)
    if transpose_b:
        b = jnp.swapaxes(b, -3, -2)
    m, n, k = a.shape[-3], a.shape[-2], a.shape[-1]
    p = b.shape[-2]
    assert b.shape[-3] == n, (a.shape, b.shape)
    if _int_backend_ok(a, b, syrk):
        from ..ops import mpmm

        plan = mpmm.plan_for(core.precision_bits_of(a.dtype, k), n)
        at = jnp.swapaxes(a, -3, -2)          # (..., n, m, K)
        if syrk:
            return mpmm.syrk_mp_batched(at, plan)
        return mpmm.gemm_mp_batched(at, b, plan)
    partials = []
    for start in range(0, n, _MATMUL_CHUNK):
        stop = min(start + _MATMUL_CHUNK, n)
        prod = core.mul(
            a[..., :, start:stop, None, :], b[..., None, start:stop, :, :]
        )
        # prod batch axes are (..., m, chunk, p); contract the chunk axis
        # (batch-axis -2 in core.sum_'s batch-relative convention).
        partials.append(core.sum_(prod, axis=-2))
    out = partials[0]
    for q in partials[1:]:
        out = core.add(out, q)
    return out


def syrk(a: MPArray, transpose: bool = True) -> MPArray:
    """a^T a (transpose=True) or a a^T. Symmetry exploitation TODO: the
    MXU backend halves the work; the naive path computes the full square."""
    if transpose:
        return matmul(a, a, transpose_a=True)
    return matmul(a, a, transpose_b=True)


def matvec(a: MPArray, x: MPArray, transpose: bool = False) -> MPArray:
    """(..., n, m, K) @ (m, K) -> (..., n, K).

    Routed through `matmul` with a width-1 right operand: the chunked
    contraction bounds peak memory (a direct elementwise product of
    the full (..., n, m, K+2) conv tensor OOMs at production shapes),
    and large batched cases ride the exact integer MXU backend."""
    if transpose:
        a = jnp.swapaxes(a, -3, -2)
    out = matmul(a, jnp.broadcast_to(x[..., None, :],
                                     a.shape[:-3] + x.shape[:-1] + (1,)
                                     + x.shape[-1:]))
    return out[..., 0, :]


def transpose(a: MPArray) -> MPArray:
    return jnp.swapaxes(a, -3, -2)


def symmetrize(a: MPArray) -> MPArray:
    """(A + A^T)/2, the reference's Block_Diagonal_Matrix::symmetrize."""
    return core.mul_pow2(core.add(a, transpose(a)), 0.5)


def diag(a: MPArray) -> MPArray:
    n = a.shape[-3]
    return a[..., jnp.arange(n), jnp.arange(n), :]


def add_diag(a: MPArray, s) -> MPArray:
    """A + s*I for f64 or MP scalar s."""
    n = a.shape[-3]
    d = diag(a)
    if isinstance(s, jax.Array) and s.ndim >= 1 and s.shape[-1] == a.shape[-1]:
        new_d = core.add(d, jnp.broadcast_to(s, d.shape))
    else:
        new_d = core.add_f64(d, s)
    return a.at[..., jnp.arange(n), jnp.arange(n), :].set(new_d)


def trace(a: MPArray) -> MPArray:
    """Sum of the diagonal (no leading batch dims)."""
    return core.sum_(diag(a), axis=0)


def frobenius(a: MPArray, b: MPArray) -> MPArray:
    """Tr(a^T b) = elementwise dot (no leading batch dims)."""
    k = a.shape[-1]
    prod = core.mul(a, b)
    return core.sum_(prod.reshape(-1, k), axis=0)


# ---------------------------------------------------------------------------
# Cholesky and triangular solves
# ---------------------------------------------------------------------------
#
# All three are PANEL-BLOCKED (the reference gets blocked kernels from
# Elemental for free, e.g. `run/cholesky_decomposition.cxx`): the O(n^3)
# bulk runs as MP matmuls (vectorized expansion products), and only the
# O(n * panel) panel factorizations stay sequential.  Padding to a panel
# multiple uses an identity diagonal, which factors/solves trivially.
#
# On TPU with the limb word format, the sequential panel work routes to
# Pallas kernels (ops/limb_kernels.py) that keep the substitution /
# factorization state VMEM-resident -- the XLA loops re-sweep the full
# working set through HBM on every MP op and are memory-bound by >100x.

_PANEL = 32

# Pallas panel kernels keep (rows, _PANEL, S) slabs + conv temps in
# VMEM (~16 MB); beyond this row count fall back to the XLA path.
_KERNEL_MAX_ROWS = 512


def _kernels_on(a) -> bool:
    from ..ops import limb_kernels as lk

    return core.is_limb(a) and lk.enabled()


@jax.jit
def _cholesky_unblocked(a: MPArray) -> MPArray:
    """Unblocked right-looking Cholesky (n,n,K); non-PD inputs yield
    NaNs, which the solver treats as a precision failure exactly as the
    reference treats Elemental's non-HPD exception
    (`docs/Usage.md:270-273`).

    Column scaling multiplies by the pivot's rsqrt (a Newton byproduct
    of the pivot sqrt) instead of dividing: MP long division is a
    ~(K+2)-step sequential scan PER ELEMENT and sat on the critical
    path of every column."""
    n, k = a.shape[-3], a.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)

    def body(j, mat):
        d, dinv = core.sqrt_rsqrt(mat[j, j])
        col = core.mul(mat[:, j], jnp.broadcast_to(dinv, (n, k)))
        below = rows > j
        col = jnp.where(
            below[:, None], col, jnp.where((rows == j)[:, None], d[None, :], 0.0)
        )
        mat = jax.lax.dynamic_update_slice(mat, col[:, None, :], (0, j, 0))
        upd = core.mul(col[:, None, :], col[None, :, :])
        mask = (below[:, None] & below[None, :])[:, :, None]
        mat = core.add(mat, jnp.where(mask, -upd, 0.0))
        return mat

    out = jax.lax.fori_loop(0, n, body, a)
    cols = rows
    lower_mask = (rows[:, None] >= cols[None, :])[:, :, None]
    return jnp.where(lower_mask, out, 0.0)


def _pad_identity(a: MPArray, npad: int) -> MPArray:
    """Extend (n,n,K) to (n+npad, n+npad, K) with an identity corner."""
    n, k = a.shape[-3], a.shape[-1]
    out = jnp.zeros((n + npad, n + npad, k), a.dtype)
    out = jax.lax.dynamic_update_slice(out, a, (0, 0, 0))
    idx = n + jnp.arange(npad)
    onev = jnp.asarray(core.one_np(k, a.dtype))
    return out.at[idx, idx, :].set(onev)


def _cholesky_limb_batched(a: MPArray) -> MPArray:
    """Batched limb Cholesky via the Pallas kernels; a (BB, n, n, S).

    Blocked right-looking with the panel step decomposed as
    L11 = chol(A11) (unblocked kernel on the nb x nb diagonal block)
    and L21 = A21 L11^{-T} (the rhs-tiled solve kernel on the panel
    transposed) -- so per-program VMEM use is independent of n; the
    trailing update is an MP matmul on the int8-MXU path."""
    from ..ops import limb_kernels as lk

    BB, n, k = a.shape[0], a.shape[-3], a.shape[-1]
    nb = _PANEL
    if n <= 2 * nb:
        return lk.cholesky_unblocked_batched(a)
    npad = (-n) % nb
    if npad:
        a = jax.vmap(lambda m: _pad_identity(m, npad))(a)
    N = n + npad
    rows = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    didx = jnp.arange(nb)

    def panel_step(pi, mat):
        j = pi * nb
        a11 = jax.lax.dynamic_slice(mat, (0, j, j, 0), (BB, nb, nb, k))
        l11 = lk.cholesky_unblocked_batched(a11)
        inv_d = core.recip(l11[:, didx, didx, :])
        C = jax.lax.dynamic_slice(mat, (0, 0, j, 0), (BB, N, nb, k))
        # right-solve the whole column slab (rows outside (j+nb, N)
        # produce garbage and are masked below): L21^T = L11^{-1} C^T
        x = lk.solve_unblocked_batched(
            l11, jnp.swapaxes(C, 1, 2), inv_d)
        l21 = jnp.swapaxes(x, 1, 2)                       # (BB, N, nb, S)
        slab = jnp.where((rows >= j + nb)[:, None, None], l21, 0.0)
        slab = jax.lax.dynamic_update_slice(slab, l11, (0, j, 0, 0))
        mat = jax.lax.dynamic_update_slice(mat, slab, (0, 0, j, 0))
        P = jnp.where((rows >= j + nb)[:, None, None], slab, 0.0)
        return core.add(mat, core.neg(matmul(P, P, transpose_b=True)))

    out = jax.lax.fori_loop(0, N // nb, panel_step, a)
    lower_mask = (rows[:, None] >= rows[None, :])[:, :, None]
    out = jnp.where(lower_mask, out, 0.0)
    return out[:, :n, :n] if npad else out


@jax.jit
def cholesky(a: MPArray) -> MPArray:
    """Lower Cholesky of a symmetric positive-definite MP matrix (n,n,K).

    Panel-blocked right-looking: sequential work is one _PANEL-wide
    panel factorization per step; the trailing update is a single MP
    matmul (`Elemental's blocked Cholesky, used by the reference's
    run/cholesky_decomposition.cxx`)."""
    n, k = a.shape[-3], a.shape[-1]
    if _kernels_on(a) and n <= _KERNEL_MAX_ROWS:
        batch = a.shape[:-3]
        out = _cholesky_limb_batched(a.reshape((-1,) + a.shape[-3:]))
        return out.reshape(batch + out.shape[1:])
    if a.ndim > 3:
        return jax.vmap(cholesky)(a)
    nb = _PANEL
    if n <= 2 * nb:
        return _cholesky_unblocked(a)
    npad = (-n) % nb
    if npad:
        a = _pad_identity(a, npad)
    N = n + npad
    rows = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)

    def col_step(j, t, C):
        piv = jax.lax.dynamic_slice(C, (j + t, t, 0), (1, 1, k))[0, 0]
        d, dinv = core.sqrt_rsqrt(piv)
        col = core.mul(C[:, t], jnp.broadcast_to(dinv, (N, k)))
        below = rows > (j + t)
        col = jnp.where(below[:, None], col,
                        jnp.where((rows == j + t)[:, None], d[None, :], 0.0))
        C = jax.lax.dynamic_update_slice(C, col[:, None, :], (0, t, 0))
        colp = jax.lax.dynamic_slice(col, (j, 0), (nb, k))  # multipliers
        upd = core.mul(col[:, None, :], colp[None, :, :])   # (N, nb, K)
        cmask = (jnp.arange(nb) > t)[None, :, None]
        return core.add(C, jnp.where(cmask, -upd, 0.0))

    def panel_step(pi, mat):
        j = pi * nb
        C = jax.lax.dynamic_slice(mat, (0, j, 0), (N, nb, k))
        C = jnp.where((rows >= j)[:, None, None], C, 0.0)
        C = jax.lax.fori_loop(0, nb, lambda t, c: col_step(j, t, c), C)
        mat = jax.lax.dynamic_update_slice(mat, C, (0, j, 0))
        P = jnp.where((rows >= j + nb)[:, None, None], C, 0.0)
        return core.add(mat, core.neg(matmul(P, P, transpose_b=True)))

    out = jax.lax.fori_loop(0, N // nb, panel_step, a)
    lower_mask = (rows[:, None] >= rows[None, :])[:, :, None]
    out = jnp.where(lower_mask, out, 0.0)
    return out[:n, :n] if npad else out


def _inv_diag(l: MPArray) -> MPArray:
    """Reciprocals of the diagonal, (n, K) -- ONE vectorized MP
    division for the whole matrix, hoisted out of the sequential
    substitution loops (long division is a ~(K+2)-step scan; doing it
    per row put it on the critical path n times)."""
    return core.recip(diag(l))


@jax.jit
def _solve_lower_unblocked(l: MPArray, b: MPArray,
                           inv_d: MPArray | None = None) -> MPArray:
    """X = L^{-1} B by forward substitution; L (n,n,K) lower, B (n,m,K)."""
    n, k = l.shape[-3], l.shape[-1]
    m = b.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    if inv_d is None:
        inv_d = _inv_diag(l)

    def body(i, x):
        # s = B[i] - sum_{t<i} L[i,t] x[t]
        li = jnp.where((rows < i)[:, None], l[i, :, :], 0.0)  # (n,K)
        acc = core.sum_(core.mul(li[:, None, :], x), axis=0)  # (m,K)
        s = core.sub(b[i], acc)
        xi = core.mul(s, jnp.broadcast_to(inv_d[i], (m, k)))
        return jax.lax.dynamic_update_slice(x, xi[None, :, :], (i, 0, 0))

    x0 = jnp.zeros_like(b)
    return jax.lax.fori_loop(0, n, body, x0)


def _solve_limb_batched(l: MPArray, b: MPArray,
                        transpose: bool) -> MPArray:
    """Batched limb triangular solve through the Pallas kernels;
    l (BB, n, n, S), b (BB, n, m, S)."""
    from ..ops import limb_kernels as lk

    BB, n, k = l.shape[0], l.shape[-3], l.shape[-1]
    m = b.shape[-2]
    nb = _PANEL
    didx = jnp.arange(n)
    inv_d = core.recip(l[:, didx, didx, :])      # (BB, n, S)
    if n <= 2 * nb:
        return lk.solve_unblocked_batched(l, b, inv_d, transpose=transpose)
    npad = (-n) % nb
    if npad:
        l = jax.vmap(lambda mm: _pad_identity(mm, npad))(l)
        b = jnp.concatenate(
            [b, jnp.zeros((BB, npad, m, k), b.dtype)], axis=1)
        onev = jnp.asarray(core.one_np(k, l.dtype))
        inv_d = jnp.concatenate(
            [inv_d, jnp.broadcast_to(onev, (BB, npad, k))], axis=1)
    N = n + npad
    rows = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    npanels = N // nb

    def fwd_step(pi, x):
        j = pi * nb
        l11 = jax.lax.dynamic_slice(l, (0, j, j, 0), (BB, nb, nb, k))
        bp = jax.lax.dynamic_slice(x, (0, j, 0, 0), (BB, nb, m, k))
        dp = jax.lax.dynamic_slice(inv_d, (0, j, 0), (BB, nb, k))
        xp = lk.solve_unblocked_batched(l11, bp, dp, transpose=False)
        x = jax.lax.dynamic_update_slice(x, xp, (0, j, 0, 0))
        lcol = jax.lax.dynamic_slice(l, (0, 0, j, 0), (BB, N, nb, k))
        lcol = jnp.where((rows >= j + nb)[:, None, None], lcol, 0.0)
        return core.add(x, core.neg(matmul(lcol, xp)))

    def bwd_step(t, x):
        j = (npanels - 1 - t) * nb
        l11 = jax.lax.dynamic_slice(l, (0, j, j, 0), (BB, nb, nb, k))
        bp = jax.lax.dynamic_slice(x, (0, j, 0, 0), (BB, nb, m, k))
        dp = jax.lax.dynamic_slice(inv_d, (0, j, 0), (BB, nb, k))
        xp = lk.solve_unblocked_batched(l11, bp, dp, transpose=True)
        x = jax.lax.dynamic_update_slice(x, xp, (0, j, 0, 0))
        lrow = jax.lax.dynamic_slice(l, (0, j, 0, 0), (BB, nb, N, k))
        lrow = jnp.where((rows < j)[None, :, None], lrow, 0.0)
        return core.add(x, core.neg(matmul(lrow, xp, transpose_a=True)))

    out = jax.lax.fori_loop(0, npanels, bwd_step if transpose else fwd_step,
                            b)
    return out[:, :n] if npad else out


def _route_limb_solve(l, b, transpose: bool):
    """Reshape arbitrary (batch..., n, n, S) solves onto the batched
    Pallas path; returns None when the kernels do not apply."""
    n = l.shape[-3]
    if not (_kernels_on(l) and n <= _KERNEL_MAX_ROWS):
        return None
    vec = b.ndim == l.ndim - 1                   # (..., n, S) rhs
    if vec:
        b = b[..., None, :]
    batch = l.shape[:-3]
    if b.shape[:-3] != batch:
        return None
    out = _solve_limb_batched(
        l.reshape((-1,) + l.shape[-3:]), b.reshape((-1,) + b.shape[-3:]),
        transpose)
    out = out.reshape(batch + out.shape[1:])
    return out[..., 0, :] if vec else out


@jax.jit
def solve_lower(l: MPArray, b: MPArray) -> MPArray:
    """X = L^{-1} B, panel-blocked forward substitution: per panel one
    small unblocked solve plus one MP matmul update of the rows below."""
    n, k = l.shape[-3], l.shape[-1]
    routed = _route_limb_solve(l, b, transpose=False)
    if routed is not None:
        return routed
    if l.ndim > 3:
        return jax.vmap(solve_lower)(l, b)
    if b.ndim == 2:
        return solve_lower(l, b[:, None, :])[:, 0, :]
    nb = _PANEL
    if n <= 2 * nb:
        return _solve_lower_unblocked(l, b)
    m = b.shape[-2]
    npad = (-n) % nb
    if npad:
        l = _pad_identity(l, npad)
        b = jnp.concatenate(
            [b, jnp.zeros((npad, m, k), b.dtype)], axis=0)
    N = n + npad
    rows = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    inv_d = _inv_diag(l)                         # (N, K), one vector op

    def panel_step(pi, x):
        j = pi * nb
        l11 = jax.lax.dynamic_slice(l, (j, j, 0), (nb, nb, k))
        bp = jax.lax.dynamic_slice(x, (j, 0, 0), (nb, m, k))
        dp = jax.lax.dynamic_slice(inv_d, (j, 0), (nb, k))
        xp = _solve_lower_unblocked.__wrapped__(l11, bp, dp)
        x = jax.lax.dynamic_update_slice(x, xp, (j, 0, 0))
        lcol = jax.lax.dynamic_slice(l, (0, j, 0), (N, nb, k))
        lcol = jnp.where((rows >= j + nb)[:, None, None], lcol, 0.0)
        return core.add(x, core.neg(matmul(lcol, xp)))

    out = jax.lax.fori_loop(0, N // nb, panel_step, b)
    return out[:n] if npad else out


@jax.jit
def _solve_lower_t_unblocked(l: MPArray, b: MPArray,
                             inv_d: MPArray | None = None) -> MPArray:
    """X = L^{-T} B by backward substitution."""
    n, k = l.shape[-3], l.shape[-1]
    m = b.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    if inv_d is None:
        inv_d = _inv_diag(l)

    def body(t, x):
        i = n - 1 - t
        # s = B[i] - sum_{r>i} L[r,i] x[r]
        ci = jnp.where((rows > i)[:, None], l[:, i, :], 0.0)  # (n,K)
        acc = core.sum_(core.mul(ci[:, None, :], x), axis=0)
        s = core.sub(b[i], acc)
        xi = core.mul(s, jnp.broadcast_to(inv_d[i], (m, k)))
        return jax.lax.dynamic_update_slice(x, xi[None, :, :], (i, 0, 0))

    x0 = jnp.zeros_like(b)
    return jax.lax.fori_loop(0, n, body, x0)


@jax.jit
def solve_lower_t(l: MPArray, b: MPArray) -> MPArray:
    """X = L^{-T} B, panel-blocked backward substitution."""
    n, k = l.shape[-3], l.shape[-1]
    routed = _route_limb_solve(l, b, transpose=True)
    if routed is not None:
        return routed
    if l.ndim > 3:
        return jax.vmap(solve_lower_t)(l, b)
    if b.ndim == 2:
        return solve_lower_t(l, b[:, None, :])[:, 0, :]
    nb = _PANEL
    if n <= 2 * nb:
        return _solve_lower_t_unblocked(l, b)
    m = b.shape[-2]
    npad = (-n) % nb
    if npad:
        l = _pad_identity(l, npad)
        b = jnp.concatenate(
            [b, jnp.zeros((npad, m, k), b.dtype)], axis=0)
    N = n + npad
    cols = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    npanels = N // nb
    inv_d = _inv_diag(l)                         # (N, K), one vector op

    def panel_step(t, x):
        j = (npanels - 1 - t) * nb
        l11 = jax.lax.dynamic_slice(l, (j, j, 0), (nb, nb, k))
        bp = jax.lax.dynamic_slice(x, (j, 0, 0), (nb, m, k))
        dp = jax.lax.dynamic_slice(inv_d, (j, 0), (nb, k))
        xp = _solve_lower_t_unblocked.__wrapped__(l11, bp, dp)
        x = jax.lax.dynamic_update_slice(x, xp, (j, 0, 0))
        # rows r < j depend on L[j:j+nb, r]^T: x[:j] -= L_panel^T xp
        lrow = jax.lax.dynamic_slice(l, (j, 0, 0), (nb, N, k))
        lrow = jnp.where((cols < j)[None, :, None], lrow, 0.0)
        return core.add(x, core.neg(matmul(lrow, xp, transpose_a=True)))

    out = jax.lax.fori_loop(0, npanels, panel_step, b)
    return out[:n] if npad else out


def _eye_mp(n: int, k: int, dtype) -> np.ndarray:
    out = np.zeros((n, n, k), np.float32 if jnp.dtype(dtype) == jnp.float32
                   else np.float64)
    onev = core.one_np(k, dtype)
    for i in range(n):
        out[i, i] = onev
    return out


def use_inverse_panels(l) -> bool:
    """True when matrix-rhs triangular solves should go through the
    explicit blocked inverse (TPU limb path): the substitution sweep is
    sequential VPU work per rhs column, while T = L^-1 costs only tiny
    diagonal-block inversions plus int8-MXU matmuls, after which every
    solve IS a matmul.  At 400+ bits the cond(L)*eps error this adds is
    ~2^-360 -- far inside the IPM's self-correction margin (the
    reference runs the same algebra at similar conditioning,
    `initialize_schur_complement_solver.cxx`)."""
    return _kernels_on(l)


def lower_inverse(l: MPArray) -> MPArray:
    """T = L^{-1} for lower-triangular L (..., n, n, K), blocked:
    diagonal nb x nb blocks invert via the substitution kernel against
    an identity rhs; off-diagonal block-rows are MP matmuls
    (T[i,:i] = -T[i][i] (L[i,:i] T[:i,:i])) on the int8-MXU path."""
    n, k = l.shape[-3], l.shape[-1]
    batch = l.shape[:-3]
    lb = l.reshape((-1,) + l.shape[-3:])
    out = _lower_inverse_batched(lb)
    return out.reshape(batch + out.shape[1:])


def _lower_inverse_batched(l: MPArray) -> MPArray:
    from ..ops import limb_kernels as lk

    BB, n, k = l.shape[0], l.shape[-3], l.shape[-1]
    nb = _PANEL
    didx_n = jnp.arange(n)
    eye_np = _eye_mp(min(n, nb) if n > 2 * nb else n, k, l.dtype)
    if n <= 2 * nb:
        inv_d = core.recip(l[:, didx_n, didx_n, :])
        eye = jnp.broadcast_to(jnp.asarray(eye_np), (BB,) + eye_np.shape)
        if _kernels_on(l):
            return lk.solve_unblocked_batched(l, eye, inv_d)
        return jax.vmap(_solve_lower_unblocked)(l, eye, inv_d)
    npad = (-n) % nb
    if npad:
        l = jax.vmap(lambda m: _pad_identity(m, npad))(l)
    N = n + npad
    nblk = N // nb
    # all diagonal blocks inverted in ONE batched kernel call
    dblk = jnp.stack([l[:, i * nb:(i + 1) * nb, i * nb:(i + 1) * nb]
                      for i in range(nblk)], axis=1)
    dflat = dblk.reshape((BB * nblk, nb, nb, k))
    didx = jnp.arange(nb)
    inv_d = core.recip(dflat[:, didx, didx, :])
    eye = jnp.broadcast_to(jnp.asarray(eye_np), (BB * nblk, nb, nb, k))
    if _kernels_on(l):
        tii_flat = lk.solve_unblocked_batched(dflat, eye, inv_d)
    else:
        tii_flat = jax.vmap(_solve_lower_unblocked)(dflat, eye, inv_d)
    tii = tii_flat.reshape((BB, nblk, nb, nb, k))
    T = jnp.zeros((BB, N, N, k), l.dtype)
    for i in range(nblk):
        T = jax.lax.dynamic_update_slice(
            T, tii[:, i], (0, i * nb, i * nb, 0))
    for i in range(1, nblk):
        rowL = l[:, i * nb:(i + 1) * nb, :i * nb]
        prod = matmul(rowL, T[:, :i * nb, :i * nb])
        trow = core.neg(matmul(tii[:, i], prod))
        T = jax.lax.dynamic_update_slice(T, trow, (0, i * nb, 0, 0))
    return T[:, :n, :n] if npad else T


def cholesky_solve(l: MPArray, b: MPArray) -> MPArray:
    """A^{-1} B given A = L L^T (the reference's cholesky_solve,
    `run/step/compute_search_direction/cholesky_solve.cxx`)."""
    return solve_lower_t(l, solve_lower(l, b))


def lower_inverse_congruence(l: MPArray, a: MPArray) -> MPArray:
    """L^{-1} A L^{-T} for symmetric A
    (`run/step/step_length/lower_triangular_inverse_congruence.cxx`)."""
    z = solve_lower(l, a)
    return transpose(solve_lower(l, transpose(z)))


def cholesky_condition_estimate(l: MPArray):
    """(max diag / min diag)^2 estimate, as the reference's
    `sdpb_util/cholesky_condition_number.hxx` (f64 is plenty)."""
    d = core.fst(diag(l))
    return (jnp.max(d) / jnp.min(d)) ** 2
