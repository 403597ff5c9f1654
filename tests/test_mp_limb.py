"""Unit tests for the TPU limb MP format (mp/limb.py) against mpmath.

This format is the TPU-side replacement for GMP BigFloat at the
reference's production contract (400+ bits, values spanning 1e-60 to
1e+40 -- `Solver_Parameters.cxx:74-92`), where the retired f32-expansion
format was capped at ~150 bits by f32's exponent range.
"""

import jax
import jax.numpy as jnp
import mpmath
import numpy as np
import pytest

from sdpb_tpu.mp import decimal as mpdec
from sdpb_tpu.mp import limb

K = 26                 # slots -> 25 limbs, ~217 bits
CTX = mpmath.mp.clone()
CTX.prec = 500


def rand_vals(n, seed, emin=-140, emax=140):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        m = CTX.mpf(rng.uniform(-1, 1))
        for _ in range(6):
            m += CTX.mpf(rng.uniform(-1, 1)) * CTX.mpf(2) ** int(
                -53 * rng.integers(1, 6))
        out.append(m * CTX.mpf(2) ** int(rng.integers(emin, emax)))
    return out


def to_limb(vals, k=K):
    words = np.stack([mpdec.from_mpf(v, 8) for v in vals])
    return jnp.asarray(limb.from_words_np(words, k))


def worst_rel(got_arr, want_vals):
    worst = 0.0
    for i, w in enumerate(want_vals):
        g = limb.to_mpf(np.asarray(got_arr[i]), CTX)
        err = abs(g) if w == 0 else abs((g - w) / w)
        worst = max(worst, float(err))
    return worst


@pytest.fixture(scope="module")
def ab():
    va = rand_vals(48, 1)
    vb = rand_vals(48, 2)
    return va, vb, to_limb(va), to_limb(vb)


def test_roundtrip(ab):
    va, _, a, _ = ab
    assert worst_rel(a, va) < 2.0 ** -(limb.precision_bits(K) - 2)


def test_add_mul_div(ab):
    va, vb, a, b = ab
    tol = 2.0 ** -(limb.precision_bits(K) - 12)
    assert worst_rel(jax.jit(limb.add)(a, b),
                     [x + y for x, y in zip(va, vb)]) < tol
    assert worst_rel(jax.jit(limb.mul)(a, b),
                     [x * y for x, y in zip(va, vb)]) < tol
    assert worst_rel(jax.jit(limb.div)(a, b),
                     [x / y for x, y in zip(va, vb)]) < tol


def test_cancellation(ab):
    va, _, a, _ = ab
    vb = [-x * (1 + CTX.mpf(2) ** -100) for x in va]
    b = to_limb(vb)
    got = jax.jit(limb.add)(a, b)
    # 100 bits cancel; ~117 remain representable
    assert worst_rel(got, [x + y for x, y in zip(va, vb)]) \
        < 2.0 ** -(limb.precision_bits(K) - 100 - 14)


def test_sqrt(ab):
    va, _, a, _ = ab
    ap = jax.jit(limb.abs_)(a)
    tol = 2.0 ** -(limb.precision_bits(K) - 14)
    assert worst_rel(jax.jit(limb.sqrt)(ap),
                     [CTX.sqrt(abs(x)) for x in va]) < tol


def test_float_ops(ab):
    va, _, a, _ = ab
    tol = 2.0 ** -(limb.precision_bits(K) - 12)
    c = np.float32(3.140625)
    assert worst_rel(jax.jit(limb.mul_float)(a, jnp.asarray(c)),
                     [x * CTX.mpf(float(c)) for x in va]) < tol
    assert worst_rel(jax.jit(lambda x: limb.mul_pow2(x, 0.5))(a),
                     [x / 2 for x in va]) < tol
    assert worst_rel(
        jax.jit(lambda x: limb.scale_pow2_bits(x, jnp.asarray(-13)))(a),
        [x * CTX.mpf(2) ** -13 for x in va]) < 2.0 ** -200


def test_raw_idioms(ab):
    """The raw-array idioms the solver uses must stay valid."""
    va, _, a, _ = ab
    stored = [limb.to_mpf(np.asarray(a[i]), CTX) for i in range(len(va))]
    assert worst_rel(-a, [-x for x in stored]) == 0.0
    sign = jnp.where(jnp.arange(len(va)) % 2 == 0, -1.0, 1.0)
    assert worst_rel(a * sign[:, None],
                     [x * int(s) for x, s in
                      zip(stored, np.asarray(sign))]) == 0.0
    z = jnp.where(jnp.zeros(len(va), bool)[:, None], a, 0.0)
    assert worst_rel(z, [CTX.mpf(0)] * len(va)) == 0.0


def test_compare_and_keys(ab):
    va, vb, a, b = ab
    lt = np.asarray(jax.jit(limb.cmp_lt)(a, b))
    assert (lt == np.array([x < y for x, y in zip(va, vb)])).all()
    key = np.asarray(limb.lead(a))
    assert (np.argsort(key) == np.argsort(
        [float(x) for x in va])).all()
    m = limb.max_abs(a)
    want = max(abs(x) for x in va)
    assert abs(limb.to_mpf(np.asarray(m), CTX) - want) / want < 1e-40


def test_fst_saturates():
    vals = [CTX.mpf(2) ** 300, -CTX.mpf(2) ** 300, CTX.mpf(2) ** -300,
            CTX.mpf("1.25")]
    a = to_limb(vals)
    f = np.asarray(limb.fst(a))
    assert f[0] == np.inf and f[1] == -np.inf
    assert f[2] == 0.0 or abs(f[2]) < 1e-44
    assert f[3] == np.float32(1.25)


def test_nonfinite_propagation(ab):
    _, _, a, b = ab
    an = a.at[3, 5].set(jnp.nan)
    s = jax.jit(limb.add)(an, b)
    assert not bool(jnp.isfinite(s[3, 0]))       # slot-0 poisoning
    assert bool(jnp.isfinite(s[2, 0]))
    m = jax.jit(limb.mul)(an, b)
    assert not bool(jnp.isfinite(m[3, 0]))
    dv = jax.jit(limb.div)(a, jnp.zeros_like(b))
    assert np.isinf(np.asarray(dv[0, 1]))
    assert not bool(jnp.isfinite(dv[0, 0]))
    sn = jax.jit(limb.sqrt)(-jax.jit(limb.abs_)(a))
    assert bool(jnp.isnan(sn[0, 1]))


def test_inf_constant_compares():
    """const_word(inf) must behave as +infinity in fst/min selection
    (the solver's lambda_min accumulator starts at +inf)."""
    inf = limb.const_word(jnp.asarray(jnp.inf, jnp.float32), K)
    assert np.asarray(limb.fst(inf)) == np.inf
    fin = to_limb([CTX.mpf("2.5")])[0]
    fa = limb.fst(inf)
    assert not bool(jnp.isnan(fa))
    # min_mp logic: (fst(a) <= fst(b)) | isnan -> picks b here
    assert not bool((fa <= limb.fst(fin)) | jnp.isnan(fa))


def test_digits_roundtrip():
    vals = [v / CTX.mpf(2) ** (int(CTX.floor(CTX.log(abs(v), 2))) + 1)
            for v in rand_vals(16, 7)]
    a = to_limb(vals, 48)
    shift = 420
    D = (shift + 16) // 8
    digs = jax.jit(lambda x: limb.digits_dev(x, shift, D))(a)
    for i, w in enumerate(vals):
        d = np.asarray(digs[i])
        v = sum(int(d[t]) << (8 * t) for t in range(D))
        got = CTX.mpf(int(v)) * CTX.mpf(2) ** -shift
        assert abs((got - w) / w) < 2.0 ** -400
        assert np.abs(d).max() <= 128


def test_exponent_bits(ab):
    va, _, a, _ = ab
    eb = np.asarray(limb.exponent_bits(a))
    for x, e in zip(va, eb):
        assert abs(x) < CTX.mpf(2) ** int(e)
        assert abs(x) > CTX.mpf(2) ** (int(e) - 2 * limb.B)


def test_one_np():
    assert limb.to_mpf(limb.one(K), CTX) == 1
    assert limb.to_mpf(limb.from_f64_np(1e20, 48), CTX) == CTX.mpf("1e20")
