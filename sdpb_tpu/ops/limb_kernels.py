"""Pallas TPU kernels for the limb-format MP sequential linalg.

Why these exist
---------------
The solver's O(n^3) matmul bulk rides the exact int8-MXU CRT pipeline
(ops/exact.py).  What remains on the VPU is the SEQUENTIAL part of the
factorizations: unblocked Cholesky columns and triangular-solve
substitution sweeps over limb arrays (mp/limb.py).  Expressed as XLA
loops, every step reads and writes the full working set from HBM
(~15 sweeps of the accumulator per MP op): at production shapes the
substitution loops alone move tens of GB per iteration and the chip
sits memory-bound at <1% VPU utilization.

These kernels run the whole unblocked factorization/substitution with
the working set resident in VMEM: one HBM read of the inputs, one HBM
write of the result, all intermediate limb arithmetic on-chip.  The
limb arithmetic itself is literally `mp.limb`'s jnp code, traced inside
the kernel body on VMEM-resident values.

This is the TPU counterpart of the reference pairing
Elemental-BigFloat BLAS-3 with tuned sequential panel kernels
(`src/sdp_solve/SDP_Solver/run/cholesky_decomposition.cxx` leans on
El::Cholesky's blocked panels the same way).

Shapes use the limb convention: trailing axis S = 1 + L slots
(exponent + limbs), float32.  All kernels are batched over a leading
BB axis (the bucket's block axis), mapped onto the Pallas grid.
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mp import limb

# Rhs tile width for the solve kernels.  128 lanes is the natural VPU
# width; larger tiles amortize the per-step L-column loads.
_TM = 128

_i0 = np.int32(0)   # dynamic_slice needs uniform index dtypes under x64

# The limb bodies hold several (n, TM, S)-shaped temporaries whose lane
# dim pads to 128; the default 16 MiB scoped-vmem budget is too small.
# Half the v5e's physical 128 MiB, leaving the other half for the
# enclosing XLA module's own buffers (a 100 MiB limit made big fused
# modules fail at 130/128 MiB total).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

# Mosaic lowers some kernel-body op chains recursively (one Python
# frame set per convert_element_type in the body), so large limb
# arithmetic bodies blow the default 1000-frame recursion cap.
if sys.getrecursionlimit() < 100000:
    sys.setrecursionlimit(100000)

_ENABLED = os.environ.get("SDPB_TPU_PALLAS", "1") != "0"
# Test hook: force the kernels ON via the Pallas interpreter on any
# backend (exercises the routed code paths on CPU CI).
_FORCE_INTERPRET = os.environ.get("SDPB_TPU_PALLAS_INTERPRET", "0") == "1"

# Platform the enclosing computation lowers onto, when known to differ
# from `jax.default_backend()` — set by parallel._shard.shard_map while
# tracing mesh kernels (a virtual-CPU mesh on a TPU-plugin host must
# not route to Pallas TPU kernels).
_PLATFORM_OVERRIDE: str | None = None


class force_platform:
    """Context manager pinning `enabled()`'s platform while tracing."""

    def __init__(self, platform: str | None):
        self._platform = platform

    def __enter__(self):
        global _PLATFORM_OVERRIDE
        self._prev = _PLATFORM_OVERRIDE
        _PLATFORM_OVERRIDE = self._platform
        return self

    def __exit__(self, *exc):
        global _PLATFORM_OVERRIDE
        _PLATFORM_OVERRIDE = self._prev
        return False


def enabled(backend: str | None = None) -> bool:
    if not _ENABLED:
        return False
    if _FORCE_INTERPRET:
        return True
    b = backend or _PLATFORM_OVERRIDE or jax.default_backend()
    return b in ("tpu", "axon")


def _broadcast_row(v, shape):
    return jnp.broadcast_to(v, shape)


# ---------------------------------------------------------------------------
# Batched unblocked triangular solves
# ---------------------------------------------------------------------------

def _solve_kernel(l_ref, b_ref, d_ref, out_ref, acc_ref, *, n: int,
                  transpose: bool):
    # All dynamic indexing goes through refs with pl.ds (Mosaic has no
    # value-level dynamic_slice lowering); the substitution state acc
    # is mutated in place in VMEM.  Kernel bodies trace with mul's
    # convolution unrolled (Mosaic scans are carry-only).
    with limb.unrolled_mul():
        _solve_body(l_ref, b_ref, d_ref, out_ref, acc_ref, n=n,
                    transpose=transpose)


def _solve_body(l_ref, b_ref, d_ref, out_ref, acc_ref, *, n: int,
                transpose: bool):
    acc_ref[:] = b_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    def body(t, carry):
        t = jnp.asarray(t, jnp.int32)
        i = (n - 1 - t) if transpose else t
        si = acc_ref[pl.ds(i, 1)][0]      # (TM, S)
        xi = limb.mul(si, _broadcast_row(d_ref[0, pl.ds(i, 1)][0],
                                         si.shape))
        out_ref[0, pl.ds(i, 1)] = xi[None]
        if transpose:
            colL = l_ref[0, pl.ds(i, 1)][0]                     # L[i, :]
            mask = rows < i
        else:
            colL = l_ref[0, :, pl.ds(i, 1)][:, 0]               # L[:, i]
            mask = rows > i
        upd = limb.mul(colL[:, None, :], xi[None, :, :])        # (n, TM, S)
        acc_ref[:] = limb.add(acc_ref[:], jnp.where(mask, -upd, 0.0))
        return carry

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("transpose", "interpret"))
def solve_unblocked_batched(l, b, inv_d, transpose: bool = False,
                            interpret: bool = False):
    """X = L^{-1} B (or L^{-T} B) for a BATCH of small lower-triangular
    limb systems, one Pallas program per (block, rhs-tile):

      l      (BB, n, n, S)
      b      (BB, n, m, S)
      inv_d  (BB, n, S)     reciprocals of diag(l), precomputed
      ->     (BB, n, m, S)

    The substitution state lives in VMEM for all n steps; HBM sees one
    read of (l, b) and one write of X.
    """
    interpret = interpret or _FORCE_INTERPRET
    BB, n, m, S = b.shape[0], b.shape[1], b.shape[2], b.shape[3]
    assert l.shape == (BB, n, n, S), (l.shape, b.shape)
    assert inv_d.shape == (BB, n, S), (inv_d.shape, b.shape)
    # The body's limb-arithmetic temporaries are (n, tm, S)-shaped with
    # the S axis lane-padded to 128; Mosaic's stack allocator keeps a
    # few dozen of them live, so bound n*tm to stay inside the scoped
    # VMEM budget at any n (also under vmap's pallas batching rule).
    tm = max(8, min(_TM, m, 3072 // n))
    mpad = (-m) % tm
    if mpad:
        b = jnp.concatenate(
            [b, jnp.zeros((BB, n, mpad, S), b.dtype)], axis=2)
    mt = (m + mpad) // tm

    kernel = functools.partial(_solve_kernel, n=n, transpose=transpose)
    # Kernel bodies must trace with 32-bit default ints: the package
    # enables x64 globally (CPU correctness), but Mosaic cannot lower
    # i64 (and its convert_element_type fallback loops on i64->i32).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BB, n, m + mpad, S), b.dtype),
            grid=(BB, mt),
            in_specs=[
                pl.BlockSpec((1, n, n, S), lambda bb, j: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, tm, S), lambda bb, j: (bb, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, S), lambda bb, j: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n, tm, S),
                                   lambda bb, j: (bb, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, tm, S), b.dtype)],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(l, b, inv_d)
    return out[:, :, :m] if mpad else out


# ---------------------------------------------------------------------------
# Batched unblocked Cholesky
# ---------------------------------------------------------------------------

def _chol_kernel(a_ref, out_ref, *, n: int):
    with limb.unrolled_mul():
        _chol_body(a_ref, out_ref, n=n)


def _chol_body(a_ref, out_ref, *, n: int):
    # out_ref doubles as the in-place working buffer.
    out_ref[0] = a_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(j, carry):
        j = jnp.asarray(j, jnp.int32)
        piv = out_ref[0, pl.ds(j, 1), pl.ds(j, 1)][0]           # (1, S)
        d, dinv = limb.sqrt_rsqrt(piv)
        colj = out_ref[0, :, pl.ds(j, 1)][:, 0]                 # (n, S)
        col = limb.mul(colj, _broadcast_row(dinv, colj.shape))
        below = rows > j
        col = jnp.where(below, col,
                        jnp.where(rows == j, _broadcast_row(d, col.shape),
                                  0.0))
        out_ref[0, :, pl.ds(j, 1)] = col[:, None]
        upd = limb.mul(col[:, None, :], col[None, :, :])        # (n, n, S)
        # 3-D iota mask: i1 minor-dim reshapes have no Mosaic lowering
        r3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        c3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
        mask = (r3 > j) & (c3 > j)
        out_ref[0] = limb.add(out_ref[0], jnp.where(mask, -upd, 0.0))
        return carry

    jax.lax.fori_loop(0, n, body, 0)
    r3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    c3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    out_ref[0] = jnp.where(r3 >= c3, out_ref[0], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_unblocked_batched(a, interpret: bool = False):
    """Lower Cholesky of a BATCH of small SPD limb matrices
    (BB, n, n, S) -> (BB, n, n, S); the factorization state stays in
    VMEM for all n column steps.  Non-PD pivots propagate NaN exactly
    like the XLA path (sqrt of a negative -> NaN limbs)."""
    interpret = interpret or _FORCE_INTERPRET
    BB, n, _, S = a.shape
    kernel = functools.partial(_chol_kernel, n=n)
    with jax.enable_x64(False):     # see solve_unblocked_batched
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=(BB,),
            in_specs=[pl.BlockSpec((1, n, n, S), lambda bb: (bb, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, n, n, S), lambda bb: (bb, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(a)
