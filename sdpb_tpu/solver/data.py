"""Solver-side problem containers (JAX pytrees of MP word arrays).

The reference holds problem data in `SDP` (`src/sdp_solve/SDP.hxx:85`)
with Elemental DistMatrix blocks; here each PMP constraint block j is a
pytree of dense MP arrays, and the set of blocks is a Python list whose
structure is static under jit.  Multi-device sharding assigns blocks to
mesh devices (see sdpb_tpu.parallel).

Index conventions (mirroring `SDP.hxx:49-80`):
- constraint tuples p <-> (j, r, s, k), 0 <= r <= s < m_j, 0 <= k < pts_j,
  flattened as p_local = (s(s+1)/2 + r) * pts + k
- two PSD parity blocks per j: even basis height he = (pts-1)//2 + 1,
  odd ho = pts - he (may be 0 for degree-0 blocks); PSD block size
  m * h_parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..mp import core as mpcore


@dataclasses.dataclass(frozen=True)
class BlockShape:
    """Static shape metadata for one PMP constraint block."""

    m: int       # matrix dimension m_j
    pts: int     # number of sample points = d_j + 1
    he: int      # even bilinear basis height
    ho: int      # odd bilinear basis height

    @property
    def n_tuples(self) -> int:
        return self.m * (self.m + 1) // 2

    @property
    def schur_size(self) -> int:
        return self.n_tuples * self.pts

    def psd_size(self, parity: int) -> int:
        return self.m * (self.he if parity == 0 else self.ho)

    @property
    def psd_sizes(self):
        return (self.psd_size(0), self.psd_size(1))

    def tuple_indices(self):
        """(s_idx, r_idx) arrays of length n_tuples, tuple order
        t = s(s+1)/2 + r with r <= s (reference `compute_schur_complement.cxx`
        offset convention)."""
        s_idx, r_idx = [], []
        for s in range(self.m):
            for r in range(s + 1):
                s_idx.append(s)
                r_idx.append(r)
        return np.array(s_idx), np.array(r_idx)


def block_shape_of(dim: int, pts: int) -> BlockShape:
    he = (pts - 1) // 2 + 1
    return BlockShape(m=dim, pts=pts, he=he, ho=pts - he)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SDPBlock:
    """Per-block problem data.  ``q`` are the sampled-and-scaled
    bilinear bases sqrt(s_k) q_m(x_k) (`Dual_Constraint_Group.cxx`);
    ``u`` are the block-diagonal bases blocks I_m (x) q
    (`SDP/set_bases_blocks.cxx`)."""

    c: jax.Array          # (schur_size, K)
    B: jax.Array          # (schur_size, N, K)
    q: tuple              # (q_even (he,pts,K), q_odd (ho,pts,K))
    u: tuple              # (U_even (m*he, m*pts, K), U_odd)
    shape: BlockShape = dataclasses.field(metadata={"static": True})

    def tree_flatten(self):
        return (self.c, self.B, self.q, self.u), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        c, B, q, u = children
        return cls(c=c, B=B, q=q, u=u, shape=shape)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SDPProblem:
    objective_const: jax.Array  # (K,)
    b: jax.Array                # (N, K)
    blocks: list                # [SDPBlock]

    @property
    def dual_dim(self):
        return self.b.shape[0]

    @property
    def total_psd_rows(self):
        return sum(sum(bl.shape.psd_sizes) for bl in self.blocks)

    def tree_flatten(self):
        return (self.objective_const, self.b, self.blocks), None

    @classmethod
    def tree_unflatten(cls, _, children):
        objective_const, b, blocks = children
        return cls(objective_const=objective_const, b=b, blocks=blocks)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SolverState:
    """The interior-point iterate (x, X, y, Y)
    (`SDP_Solver.hxx:25-122`).  X and Y are lists (per block) of
    parity pairs of dense PSD matrices."""

    x: list      # [(schur_size, K)]
    y: jax.Array  # (N, K)
    X: list      # [((se,se,K), (so,so,K))]
    Y: list      # same structure as X

    def tree_flatten(self):
        return (self.x, self.y, self.X, self.Y), None

    @classmethod
    def tree_unflatten(cls, _, children):
        x, y, X, Y = children
        return cls(x=x, y=y, X=X, Y=Y)


def build_u(q: np.ndarray, m: int) -> np.ndarray:
    """Block-diagonal bases block U = I_m (x) q, shape (m*h, m*pts, K)."""
    h, pts, k = q.shape
    u = np.zeros((m, h, m, pts, k), dtype=q.dtype)
    for i in range(m):
        u[i, :, i, :, :] = q
    return u.reshape(m * h, m * pts, k)


def raw_to_dtype(raw, k: int, dtype):
    """Convert a RawSDP's f64-word arrays to ``k`` words of ``dtype``
    (host-side, numpy-exact).  Used to prepare the TPU f32-word path:
    a plain elementwise cast would silently drop each word's low 29
    bits; this renormalizes properly (mp/decimal.words_to_dtype)."""
    import copy

    from ..mp import decimal as mpdec

    dtype = np.dtype(jnp.dtype(dtype).name)
    if dtype == np.float32:
        from ..mp import limb as mplimb

        conv = lambda a: mplimb.from_words_np(np.asarray(a), k)
    else:
        conv = lambda a: mpdec.words_to_dtype(np.asarray(a), k, dtype)
    out = copy.copy(raw)
    out.objective_const = conv(raw.objective_const)
    out.b = conv(raw.b)
    out.blocks = [
        dataclasses.replace(
            rb,
            bilinear_bases_even=conv(rb.bilinear_bases_even),
            bilinear_bases_odd=conv(rb.bilinear_bases_odd),
            c=conv(rb.c), B=conv(rb.B),
        )
        for rb in raw.blocks
    ]
    return out


def problem_from_raw(raw, dtype=jnp.float64, k: int | None = None
                     ) -> SDPProblem:
    """Build an SDPProblem from io.sdp_json.RawSDP.

    When ``dtype`` differs from the raw word dtype (the f32-word TPU
    path reads decimal data as f64 words first), the words are
    converted exactly via ``raw_to_dtype`` to ``k`` words of ``dtype``
    (default: the raw word count) -- a plain cast would corrupt them."""
    if jnp.dtype(dtype) != jnp.dtype(np.asarray(raw.b).dtype):
        k = k if k is not None else np.asarray(raw.b).shape[-1]
        raw = raw_to_dtype(raw, k, dtype)
    blocks = []
    for rb in raw.blocks:
        shape = block_shape_of(rb.dim, rb.num_points)
        assert rb.bilinear_bases_even.shape[0] == shape.he
        assert rb.bilinear_bases_odd.shape[0] == shape.ho
        q = (jnp.asarray(rb.bilinear_bases_even, dtype),
             jnp.asarray(rb.bilinear_bases_odd, dtype))
        u = (jnp.asarray(build_u(rb.bilinear_bases_even, shape.m), dtype),
             jnp.asarray(build_u(rb.bilinear_bases_odd, shape.m), dtype))
        blocks.append(SDPBlock(
            c=jnp.asarray(rb.c, dtype), B=jnp.asarray(rb.B, dtype),
            q=q, u=u, shape=shape,
        ))
    return SDPProblem(
        objective_const=jnp.asarray(raw.objective_const, dtype),
        b=jnp.asarray(raw.b, dtype),
        blocks=blocks,
    )


def initial_state(problem: SDPProblem, scale_primal, scale_dual,
                  k: int | None = None) -> SolverState:
    """Cold start: x = y = 0, X = Omega_p I, Y = Omega_d I
    (`SDP_Solver/SDP_Solver.cxx:23-37`)."""
    k = k if k is not None else problem.b.shape[-1]
    dtype = problem.b.dtype

    def eye(n, scale):
        m = mpcore.zeros((n, n), k, dtype=dtype)
        svec = jnp.asarray(mpcore.from_f64_np(float(scale), k, dtype))
        return m.at[jnp.arange(n), jnp.arange(n), :].set(svec)

    X = []
    x = []
    for bl in problem.blocks:
        se, so = bl.shape.psd_sizes
        X.append((eye(se, scale_primal), eye(so, scale_primal)))
        x.append(mpcore.zeros((bl.shape.schur_size,), k, dtype=dtype))
    Y = [(eye(Xe.shape[0], scale_dual), eye(Xo.shape[0], scale_dual))
         for (Xe, Xo) in X]
    y = mpcore.zeros((problem.dual_dim,), k, dtype=dtype)
    return SolverState(x=x, y=y, X=X, Y=Y)


# ---------------------------------------------------------------------------
# Bucketed representation: blocks grouped by identical shape and stacked
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SDPBucket:
    """nb same-shape blocks stacked on a leading axis.  This is the
    unit of vmap (single device) and of mesh sharding (multi device):
    one compiled kernel serves every block in the bucket, which is what
    makes many-block problems (the reference's typical J ~ hundreds,
    `Block_Info`) compile in O(#shapes) instead of O(J)."""

    c: jax.Array          # (nb, schur, K)
    B: jax.Array          # (nb, schur, N, K)
    q: tuple              # ((nb, he, pts, K), (nb, ho, pts, K))
    u: tuple              # ((nb, m*he, m*pts, K), ...)
    shape: BlockShape = dataclasses.field(metadata={"static": True})
    block_indices: tuple = ()   # original block ids, static

    @property
    def nb(self) -> int:
        return self.c.shape[0]

    def block_view(self, arrays=None):
        """SDPBlock view whose arrays keep the leading nb axis (for
        vmap over the per-block kernels)."""
        return SDPBlock(c=self.c, B=self.B, q=self.q, u=self.u,
                        shape=self.shape)

    def tree_flatten(self):
        return (self.c, self.B, self.q, self.u), (self.shape,
                                                  self.block_indices)

    @classmethod
    def tree_unflatten(cls, aux, children):
        c, B, q, u = children
        return cls(c=c, B=B, q=q, u=u, shape=aux[0], block_indices=aux[1])


def bucketize(problem: SDPProblem) -> "BucketedProblem":
    """Group an SDPProblem's blocks by BlockShape into stacked buckets."""
    groups: dict = {}
    for j, bl in enumerate(problem.blocks):
        groups.setdefault(bl.shape, []).append(j)
    buckets = []
    for shape, idxs in groups.items():
        blocks = [problem.blocks[j] for j in idxs]
        buckets.append(SDPBucket(
            c=jnp.stack([b.c for b in blocks]),
            B=jnp.stack([b.B for b in blocks]),
            q=tuple(jnp.stack([b.q[p] for b in blocks]) for p in range(2)),
            u=tuple(jnp.stack([b.u[p] for b in blocks]) for p in range(2)),
            shape=shape,
            block_indices=tuple(idxs),
        ))
    return BucketedProblem(
        objective_const=problem.objective_const,
        b=problem.b,
        buckets=buckets,
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BucketedProblem:
    objective_const: jax.Array
    b: jax.Array
    buckets: list

    @property
    def dual_dim(self):
        return self.b.shape[0]

    @property
    def num_blocks(self):
        return sum(bk.nb for bk in self.buckets)

    @property
    def total_psd_rows(self):
        return sum(bk.nb * sum(bk.shape.psd_sizes) for bk in self.buckets)

    def tree_flatten(self):
        return (self.objective_const, self.b, self.buckets), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BucketedState:
    """Iterate (x, y, X, Y) with per-bucket stacked blocks."""

    x: list       # [(nb, schur, K)]
    y: jax.Array  # (N, K)
    X: list       # [((nb, se, se, K), (nb, so, so, K))]
    Y: list

    def tree_flatten(self):
        return (self.x, self.y, self.X, self.Y), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    # -- per-original-block accessors for IO/checkpoint ------------------
    def block_x(self, problem: BucketedProblem, j: int):
        bi, pos = _locate(problem, j)
        return self.x[bi][pos]

    def block_XY(self, problem: BucketedProblem, j: int, which: str = "X"):
        bi, pos = _locate(problem, j)
        mats = self.X if which == "X" else self.Y
        return tuple(mats[bi][p][pos] for p in range(2))


def _locate(problem: BucketedProblem, j: int):
    for bi, bk in enumerate(problem.buckets):
        if j in bk.block_indices:
            return bi, bk.block_indices.index(j)
    raise KeyError(j)


def initial_bucketed_state(problem: BucketedProblem, scale_primal,
                           scale_dual) -> BucketedState:
    """Cold start x = y = 0, X = Omega_p I, Y = Omega_d I."""
    k = problem.b.shape[-1]
    dtype = problem.b.dtype

    def eye(nb, n, scale):
        m = jnp.zeros((nb, n, n, k), dtype=dtype)
        if n == 0:
            return m
        svec = jnp.asarray(mpcore.from_f64_np(float(scale), k, dtype))
        return m.at[:, jnp.arange(n), jnp.arange(n), :].set(svec)

    x, X, Y = [], [], []
    for bk in problem.buckets:
        se, so = bk.shape.psd_sizes
        x.append(jnp.zeros((bk.nb, bk.shape.schur_size, k), dtype=dtype))
        X.append((eye(bk.nb, se, scale_primal), eye(bk.nb, so, scale_primal)))
        Y.append((eye(bk.nb, se, scale_dual), eye(bk.nb, so, scale_dual)))
    return BucketedState(x=x, y=jnp.zeros((problem.dual_dim, k), dtype=dtype),
                         X=X, Y=Y)
