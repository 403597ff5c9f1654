"""Exact high-precision SYRK/GEMM via CRT residue arithmetic on the MXU.

TPU-native re-design of the reference's bigint_syrk
(`src/sdp_solve/SDP_Solver/run/bigint_syrk/Readme.md`,
`BigInt_Shared_Memory_Syrk_Context.cxx`, `fmpz/Fmpz_Comb.cxx`): the
reference normalizes BigFloat columns to integers, reduces mod ~32-bit
primes, runs f64 BLAS per prime and CRT-restores with FLINT.  On TPU
the native exact-matmul unit is the int8 MXU (int8 x int8 -> int32),
so:

1. Fixed-point: each input value (|x| < 1 after column normalization)
   becomes D balanced base-256 digits d_t in [-128, 127]:
   x ~= 2^-shift * sum_t d_t 256^t  (shift = 8 D; exact for the
   digitized value).
2. Residues mod ~13-bit primes p_i, via two int8 matmuls against the
   table (256^t mod p_i), reduced into [0, p).
3. Per-prime SYRK: three batched int8 matmuls (hi*hi, cross, lo*lo) of
   the 7-bit halves, combined mod p in int32.  This is where the
   O(n^3) work lands, exactly, on the MXU.
4. CRT restore as digit planes: Q = sum_i r_i W_i - k M with
   W_i = c_i (M/p_i), c_i = (M/p_i)^{-1} mod p_i, M = prod p_i.
   k = floor(sum r_i c_i / p_i) is split into an exact int32 part
   (sum of (r c)//p) plus a small fractional sum rounded in f32
   (< 1e-5 absolute error; FLINT's trick).  The plane contractions are
   again int8 matmuls; 5 carry passes normalize the planes.
5. Digit planes -> K-word MP floats (f64 words: 5 digits/word, exact).

Every device-side op is int8/int32/float32 - no f64 - so this path is
bit-exact on real TPUs (whose f64 is a non-IEEE emulation).  The
digit/residue/plane axes are small (~60-120); n and m ride the MXU.

Unlike the reference there is no shared-memory window machinery: HBM is
chip-local, and the cross-chip Q reduction is an int32 `psum` of
residue planes (before restore) - exact, since integer addition cannot
round.  This replaces `restore_and_reduce.cxx`'s pairwise Sendrecv
reduce; the int32 accumulator leaves 2^31 / (n p^2) headroom, i.e.
hundreds of chips at practical n.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..mp import core as mpcore

_BASE_BITS = 8
_BASE = 1 << _BASE_BITS


def _primes_in(lo: int, hi: int) -> list[int]:
    sieve = np.ones(hi, dtype=bool)
    sieve[:2] = False
    for i in range(2, int(hi ** 0.5) + 1):
        if sieve[i]:
            sieve[i * i:: i] = False
    return [int(p) for p in np.nonzero(sieve)[0] if p >= lo]


def _balance(v, p):
    half = p // 2
    return ((v + half) % p) - half


def _balanced_digits(w: int, n_planes: int) -> np.ndarray:
    """Balanced base-256 digits of a (possibly huge) python int."""
    out = np.zeros(n_planes, dtype=np.int64)
    ww = int(w)
    for t in range(n_planes):
        d = ((ww + _BASE // 2) % _BASE) - _BASE // 2
        out[t] = d
        ww = (ww - d) >> _BASE_BITS
    assert ww == 0, "out_planes too small for CRT weight"
    return out


@dataclasses.dataclass(eq=False)
class CrtPlan:
    """Static CRT configuration for an exact SYRK at a given precision.

    ``bits``: fixed-point precision of each input (values |x| < 1 are
    represented to 2^-bits); ``n_rows_max``: bound on the contraction
    length INCLUDING any cross-chip psum fan-in (sets the prime budget,
    like the reference's `Fmpz_Comb` prime selection)."""

    bits: int
    n_rows_max: int

    def __hash__(self):
        return hash((self.bits, self.n_rows_max))

    @functools.cached_property
    def n_digits(self) -> int:
        # two extra low digits of resolution padding plus one spare
        # high digit: balanced base-256 digits of |x| < 1 scaled by
        # 2^shift_bits top out at +-128 and may carry upward once.
        return self.bits // _BASE_BITS + 3

    @property
    def shift_bits(self) -> int:
        return _BASE_BITS * (self.n_digits - 1)

    @functools.cached_property
    def primes(self) -> np.ndarray:
        # prod(p) must exceed 2 * n * (max |value| = 2^(8 D))^2 with
        # margin so |Q|/M < 1/2 - eps keeps the k-round safe.
        need = 2 * (self.n_digits * _BASE_BITS + 1) + \
            int(np.ceil(np.log2(max(2, self.n_rows_max)))) + 8
        primes, total = [], 0.0
        for p in _primes_in(4099, 8192):
            primes.append(p)
            total += np.log2(p)
            if total >= need:
                break
        else:
            raise ValueError("prime pool exhausted; raise the prime range")
        return np.array(primes, dtype=np.int64)

    @functools.cached_property
    def n_primes(self) -> int:
        return len(self.primes)

    @functools.cached_property
    def base_pow_mod(self) -> np.ndarray:
        """(n_digits, n_primes) balanced (256^t mod p)."""
        out = np.zeros((self.n_digits, self.n_primes), dtype=np.int64)
        for j, p in enumerate(self.primes):
            v = 1
            for t in range(self.n_digits):
                out[t, j] = v
                v = (v * _BASE) % int(p)
        return _balance(out, self.primes[None, :])

    @functools.cached_property
    def _M(self) -> int:
        m = 1
        for p in self.primes:
            m *= int(p)
        return m

    @functools.cached_property
    def out_planes(self) -> int:
        return self._M.bit_length() // _BASE_BITS + 3

    @functools.cached_property
    def crt_c(self) -> np.ndarray:
        """(n_primes,) int64: c_i = (M/p_i)^{-1} mod p_i."""
        M = self._M
        return np.array([pow((M // int(p)) % int(p), -1, int(p))
                         for p in self.primes], dtype=np.int64)

    @functools.cached_property
    def crt_weights(self) -> np.ndarray:
        """(n_primes, out_planes) balanced digits of W_i = c_i (M/p_i)."""
        M = self._M
        return np.stack([
            _balanced_digits(int(c) * (M // int(p)), self.out_planes)
            for c, p in zip(self.crt_c, self.primes)])

    @functools.cached_property
    def m_planes(self) -> np.ndarray:
        """(out_planes,) balanced digits of M."""
        return _balanced_digits(self._M, self.out_planes)


# ---------------------------------------------------------------------------
# Host-side conversions (CPU, exact)
# ---------------------------------------------------------------------------

def mp_to_digits(x, plan: CrtPlan) -> np.ndarray:
    """MP array (..., K) with |values| < 1 -> balanced int32 digits
    (..., n_digits), least significant first (exact for the digitized
    value; mass below 2^-(8 n_digits) is rounded)."""
    x = np.asarray(x, dtype=np.float64)
    D = plan.n_digits
    digits = np.zeros(x.shape[:-1] + (D,), dtype=np.int64)
    r = x * np.float64(2.0) ** plan.shift_bits  # exact per-word scaling
    for t in range(D - 1, -1, -1):
        scale = np.float64(2.0) ** (t * _BASE_BITS)
        q = np.round(r[..., 0] / scale)
        r = np.asarray(mpcore.add_f64(jnp.asarray(r), jnp.asarray(-q * scale)))
        digits[..., t] = q.astype(np.int64)
    assert np.all(np.abs(r[..., 0]) <= 1.0), np.abs(r[..., 0]).max()
    # fold the rare +-128 edges into the next digit (balanced carry);
    # the top digit has headroom since |x| < 1 and the grid spans one
    # extra high digit.
    for t in range(D - 1):
        d = ((digits[..., t] + 128) % 256) - 128
        digits[..., t + 1] += (digits[..., t] - d) // 256
        digits[..., t] = d
    assert digits.max() <= 127 and digits.min() >= -128, (
        digits.min(), digits.max())
    return digits.astype(np.int32)


def digits_to_mp(planes: np.ndarray, shift_bits: int, k: int) -> np.ndarray:
    """Carry-normalized balanced int32 digit planes (..., P, least
    significant first) -> K-word f64 MP array of value * 2^-shift_bits."""
    planes = np.asarray(planes, dtype=np.float64)
    P = planes.shape[-1]
    group = 5  # 5 digits * 8 bits + sign < 53 bits: exact f64 word
    words = []
    for g0 in range(0, P, group):
        w = np.zeros(planes.shape[:-1])
        for t in range(g0, min(g0 + group, P)):
            w += planes[..., t] * 2.0 ** (t * _BASE_BITS - shift_bits)
        words.append(w)
    words = words[::-1]  # most significant first
    return np.asarray(mpcore.renorm_words(
        [jnp.asarray(w) for w in words], k))


# ---------------------------------------------------------------------------
# Device-side exact kernels (int8 / int32 / f32 only)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Fast modular reduction (no integer division: TPU's VPU has no divider)
# ---------------------------------------------------------------------------

def _fold16(x, pow16_mod):
    """One fold x -> hi*(2^16 mod p) + lo, halving the bit-length."""
    hi = jax.lax.shift_right_arithmetic(x, jnp.asarray(16, x.dtype))
    lo = jnp.bitwise_and(x, (1 << 16) - 1)
    return hi * pow16_mod + lo


def _mod_p(x, p, inv_p_f32, pow16_mod):
    """x mod p (result in [0, p)) for int32 x (|x| < 2^31), vector p.

    Two shift-folds bring |x| under 2^24 (f32-exact), then a Barrett
    step with the f32 reciprocal and two conditional subtracts."""
    x = _fold16(x, pow16_mod)          # |x| < 2^15 * p + 2^16 < 2^28
    x = _fold16(x, pow16_mod)          # |x| < 2^12 * p ... < 2^25-ish
    x = _fold16(x, pow16_mod)          # |x| < p * 2^9 < 2^23: f32 exact
    q = jnp.floor(x.astype(jnp.float32) * inv_p_f32).astype(jnp.int32)
    r = x - q * p
    r = jnp.where(r < 0, r + p, r)
    r = jnp.where(r >= p, r - p, r)
    r = jnp.where(r >= p, r - p, r)
    return r


def _divmod_small(x, p, inv_p_f32):
    """Exact (x // p, x mod p) for int32 0 <= x < 2^26 via f32 Barrett
    with quotient correction (f32(x) errs by <= 4, so q0 errs by <= 1
    for p > 4096; correct twice each way to be safe)."""
    q = jnp.floor(x.astype(jnp.float32) * inv_p_f32).astype(jnp.int32)
    r = x - q * p
    for _ in range(2):
        under = r < 0
        q = q - under.astype(jnp.int32)
        r = r + jnp.where(under, p, 0)
    for _ in range(2):
        over = r >= p
        q = q + over.astype(jnp.int32)
        r = r - jnp.where(over, p, 0)
    return q, r


def _mod_tables(primes):
    p = primes.astype(jnp.int32)
    inv = (1.0 / primes.astype(np.float64)).astype(np.float32)
    pow16 = (np.int64(1 << 16) % primes.astype(np.int64)).astype(np.int32)
    return p, jnp.asarray(inv), jnp.asarray(pow16)


def _split7(v):
    """Split v = hi*128 + lo with lo balanced in [-64, 63].
    Pure bit ops (TPU's VPU has no integer divider; % and // lower to
    slow emulation)."""
    lo = jnp.bitwise_and(v + 64, 127) - 64
    hi = jax.lax.shift_right_arithmetic(v - lo, jnp.asarray(7, v.dtype))
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _balance_dev(r, p):
    """[0, p) -> balanced (-p/2, p/2] without integer modulo: for r
    already reduced, balancing is one compare + subtract."""
    half = jax.lax.shift_right_logical(p, jnp.asarray(1, p.dtype))
    return r - jnp.where(r > half, p, 0)


@functools.partial(jax.jit, static_argnames=("plan",))
def residues(digits, plan: CrtPlan):
    """Residues in [0, p) of digit arrays (..., n_digits) ->
    (..., n_primes) int32."""
    primes = jnp.asarray(plan.primes.astype(np.int32))
    table = jnp.asarray(plan.base_pow_mod.astype(np.int32))
    th, tl = _split7(table)       # th in [-33, 32], tl 7-bit
    d8 = digits.astype(jnp.int8)
    dims = (((d8.ndim - 1,), (0,)), ((), ()))
    sh = jax.lax.dot_general(d8, th, dims, preferred_element_type=jnp.int32)
    sl = jax.lax.dot_general(d8, tl, dims, preferred_element_type=jnp.int32)
    pp, inv, pow16 = _mod_tables(plan.primes)
    return _mod_p(sh * 128 + sl, pp, inv, pow16)


@functools.partial(jax.jit, static_argnames=("plan",))
def residues_split(digits, plan: CrtPlan):
    """Balanced 7-bit-split residues: digits (n, m, n_digits) ->
    (rh, rl) int8 of shape (n, m, n_primes) with r = 128*rh + rl
    (mod p, balanced).  Stays in the digit layout (no 300 MB
    transpose); the SYRK batches over the trailing prime axis."""
    primes = jnp.asarray(plan.primes.astype(np.int32))
    table = jnp.asarray(plan.base_pow_mod.astype(np.int32))
    th, tl = _split7(table)       # (D, P)
    d8 = digits.astype(jnp.int8)
    dims = (((d8.ndim - 1,), (0,)), ((), ()))
    sh = jax.lax.dot_general(d8, th, dims, preferred_element_type=jnp.int32)
    sl = jax.lax.dot_general(d8, tl, dims, preferred_element_type=jnp.int32)
    pp, inv, pow16 = _mod_tables(plan.primes)
    r = _mod_p(sh * 128 + sl, pp, inv, pow16)
    rb = _balance(r, primes)
    return _split7(rb)


def _syrk_combine(s2, s1, s0, plan):
    """Combine half-split partial products mod p:
    q = 2^14 s2 + 2^7 s1 + s0 (mod p)."""
    pp, inv, pow16 = _mod_tables(plan.primes)
    p3, inv3, pw3 = (v[:, None, None] for v in (pp, inv, pow16))
    t14 = jnp.asarray((np.int64(1 << 14) % plan.primes).astype(np.int32))[
        :, None, None]
    t7 = jnp.asarray((np.int64(1 << 7) % plan.primes).astype(np.int32))[
        :, None, None]
    s2m = _mod_p(s2, p3, inv3, pw3)
    s1m = _mod_p(s1, p3, inv3, pw3)
    s0m = _mod_p(s0, p3, inv3, pw3)
    return _mod_p(s2m * t14 + s1m * t7 + s0m, p3, inv3, pw3)


@functools.partial(jax.jit, static_argnames=("plan",))
def syrk_residues(r, plan: CrtPlan):
    """Per-prime exact A^T A of residues r (n, m, n_primes) in [0,p):
    -> (n_primes, m, m) int32 in [0, p)."""
    primes = jnp.asarray(plan.primes.astype(np.int32))
    rb = _balance(r, primes)
    return syrk_residues_split(_split7(rb), plan)


@functools.partial(jax.jit, static_argnames=("plan",))
def syrk_residues_split(r_split, plan: CrtPlan):
    """Per-prime exact A^T A from balanced split residues
    (rh, rl) int8 (n, m, n_primes) -> (n_primes, m, m) int32 in [0, p).

    Karatsuba-style 3-matmul form: s1 = (rh+rl)^2 - s2 - s0
    (|rh + rl| <= 96 stays int8; |sum| <= 96^2 * n < 2^31 for
    n <= 2^17).  The prime axis rides as a dot_general batch dim so no
    explicit transpose of the ~300 MB residue tensor is materialized."""
    rh, rl = r_split
    dims = (((0,), (0,)), ((2,), (2,)))  # contract n, batch P

    def mm(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.int32)

    s2 = mm(rh, rh)
    s0 = mm(rl, rl)
    rs = (rh.astype(jnp.int32) + rl.astype(jnp.int32)).astype(jnp.int8)
    s1 = mm(rs, rs) - s2 - s0
    return _syrk_combine(s2, s1, s0, plan)


@functools.partial(jax.jit, static_argnames=("plan",))
def syrk_diag_residues_split(r_split, plan: CrtPlan):
    """Independently computed per-prime DIAGONAL of A^T A (elementwise
    squares summed over rows): (rh, rl) int8 (n, m, n_primes) ->
    (n_primes, m) int32 in [0, p).

    This is the runtime data-corruption invariant mirroring the
    reference's `check_normalized_Q_diagonal` (`compute_Q.cxx:66-92`,
    which verifies Q_ii = 2^2N after restore): the solver compares it
    against the diagonal of the MXU SYRK's residues after the
    cross-chip reduction, and poisons Q on mismatch.  O(n m P)
    elementwise work vs the SYRK's O(n m^2 P) matmuls."""
    rh, rl = r_split
    h = rh.astype(jnp.int32)
    l = rl.astype(jnp.int32)
    s2 = jnp.sum(h * h, axis=0)                   # (m, P)
    s0 = jnp.sum(l * l, axis=0)
    s1 = jnp.sum(2 * h * l, axis=0)
    pp, inv, pow16 = _mod_tables(plan.primes)
    p2, inv2, pw2 = (v[None, :] for v in (pp, inv, pow16))
    q = (_mod_p(s2, p2, inv2, pw2) * (1 << 14)
         + _mod_p(s1, p2, inv2, pw2) * (1 << 7)
         + _mod_p(s0, p2, inv2, pw2))
    out = _mod_p(q, p2, inv2, pw2)                # (m, P)
    return jnp.moveaxis(out, 0, 1)                # (P, m)


@functools.partial(jax.jit, static_argnames=("plan",))
def gemm_residues_split(a_split, b_split, plan: CrtPlan):
    """Per-prime exact A^T B from balanced split residues
    (ah, al) int8 (n, ma, n_primes), (bh, bl) (n, mb, n_primes)
    -> (n_primes, ma, mb) int32 in [0, p).

    Karatsuba 3-matmul form, mirroring `syrk_residues_split` (the
    reference's off-diagonal dgemm jobs, `blas_jobs/Blas_Job.cxx`)."""
    ah, al = a_split
    bh, bl = b_split
    dims = (((0,), (0,)), ((2,), (2,)))  # contract n, batch P

    def mm(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.int32)

    s2 = mm(ah, bh)
    s0 = mm(al, bl)
    asum = (ah.astype(jnp.int32) + al.astype(jnp.int32)).astype(jnp.int8)
    bsum = (bh.astype(jnp.int32) + bl.astype(jnp.int32)).astype(jnp.int8)
    s1 = mm(asum, bsum) - s2 - s0
    return _syrk_combine(s2, s1, s0, plan)


@functools.partial(jax.jit, static_argnames=("plan",))
def crt_restore_planes(q_res, plan: CrtPlan):
    """CRT-restore per-prime results q_res (P, ...) int32 in [0,p) to
    balanced carry-normalized digit planes (..., out_planes)."""
    primes = jnp.asarray(plan.primes.astype(np.int32))
    c = jnp.asarray(plan.crt_c.astype(np.int32))
    r = jnp.moveaxis(q_res, 0, -1)                 # (..., P), in [0,p)

    # k = floor(sum_i r_i c_i / p_i) + round(residual fraction):
    # integer part exactly in int32, fractional part in f32 (error
    # ~ n_primes * 2^-24 << 1/2).
    rc = r * c                                      # < p^2 <= 2^26
    pp, inv, pow16 = _mod_tables(plan.primes)
    rc_div, rc_mod = _divmod_small(rc, pp, inv)
    # dtype pinned: jnp.sum would promote to int64, which TPUs lack
    k_int = jnp.sum(rc_div, axis=-1, dtype=jnp.int32)
    frac = jnp.sum(rc_mod.astype(jnp.float32) /
                   primes.astype(jnp.float32), axis=-1)
    k = k_int + jnp.round(frac).astype(jnp.int32)

    # balanced W digits fit int8 directly; only r needs the 7-bit split
    w8 = jnp.asarray(plan.crt_weights.astype(np.int8))   # (P, planes)
    rh, rl = _split7(r)           # rh in [0, 64], |rl| <= 64
    dims = (((r.ndim - 1,), (0,)), ((), ()))

    def mm(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.int32)

    planes = mm(rh, w8) * 128 + mm(rl, w8)
    m_pl = jnp.asarray(plan.m_planes.astype(np.int32))
    planes = planes - k[..., None] * m_pl

    def carry_pass(pl, _):
        d = jnp.bitwise_and(pl + 128, 255) - 128
        cy = jax.lax.shift_right_arithmetic(pl - d, jnp.asarray(8, pl.dtype))
        pl = d + jnp.concatenate(
            [jnp.zeros_like(cy[..., :1]), cy[..., :-1]], axis=-1)
        return pl, None

    # Two passes are enough for the exact f64 grouping downstream: raw
    # plane magnitudes are < 2^28 (sum_i p |W_i digit| + |k| |M digit|),
    # pass 1 leaves |plane| < 2^20 + 128, pass 2 < 2^12 + 128, and a
    # group of five planes then sums below 2^45 -- exactly
    # representable in the f64 words digits_to_mp builds.  (Full
    # balancing would need 5 passes and is pure HBM traffic.)
    planes, _ = jax.lax.scan(carry_pass, planes, None, length=2)
    return planes


def syrk_exact(x_mp, plan: CrtPlan, k_out: int | None = None):
    """Exact X^T X of an MP matrix X (n, m, K) with |entries| < 1.

    Host orchestrates: digits (CPU, exact) -> device residue SYRK +
    CRT restore (integer MXU ops) -> MP words (CPU).  Returns
    (m, m, K_out).  Exact for the digitized inputs."""
    k_out = k_out if k_out is not None else x_mp.shape[-1]
    digits = mp_to_digits(x_mp, plan)
    r = residues_split(jnp.asarray(digits), plan)
    q = syrk_residues_split(r, plan)
    planes = crt_restore_planes(q, plan)
    return digits_to_mp(np.asarray(planes), 2 * plan.shift_bits, k_out)
