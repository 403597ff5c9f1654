"""Accuracy tests for multi-word float64 arithmetic vs mpmath.

Mirrors the role of the reference's kernel-level oracles
(`test/src/unit_tests/cases/calculate_matrix_square.test.cxx` et al.):
every MP primitive is validated against a trusted arbitrary-precision
implementation (mpmath) at tolerances tied to the word count K.
"""

import mpmath
import numpy as np
import pytest

from sdpb_tpu.mp import core, decimal as mpdec


def _rand_mp(rng, shape, k, scale_pow=30):
    """Random MP values with wide dynamic range, built exactly from words."""
    w0 = rng.standard_normal(shape) * 10.0 ** rng.integers(
        -scale_pow, scale_pow, shape
    )
    words = [w0]
    for i in range(1, k):
        words.append(words[-1] * rng.standard_normal(shape) * 2.0**-53)
    arr = np.stack(words, axis=-1)
    # Normalize through renorm so inputs are canonical expansions.
    return np.asarray(core.renorm_words([arr[..., i] for i in range(k)], k))


def _to_mpf_vec(a, ctx):
    flat = np.asarray(a).reshape(-1, a.shape[-1])
    return [mpdec.to_mpf(w, ctx) for w in flat]


def _rel_err(got, want, ctx):
    errs = []
    for g, w in zip(got, want):
        denom = abs(w) if w != 0 else ctx.mpf(1)
        errs.append(abs(g - w) / denom)
    return max(errs) if errs else ctx.mpf(0)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 6])
@pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
def test_binary_ops_accuracy(k, op):
    rng = np.random.default_rng(k * 101 + sum(map(ord, op)))
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + 120
    a = _rand_mp(rng, (200,), k)
    b = _rand_mp(rng, (200,), k)
    got = np.asarray(getattr(core, op)(a, b))
    av, bv = _to_mpf_vec(a, ctx), _to_mpf_vec(b, ctx)
    opf = {
        "add": lambda x, y: x + y,
        "sub": lambda x, y: x - y,
        "mul": lambda x, y: x * y,
        "div": lambda x, y: x / y,
    }[op]
    want = [opf(x, y) for x, y in zip(av, bv)]
    err = _rel_err(_to_mpf_vec(got, ctx), want, ctx)
    # Allow ~12 bits of slack below full K*53-bit precision; add/sub of
    # same-magnitude opposite-sign values can cancel, so measure against
    # |result| via relative error on the op output.
    tol = mpmath.mpf(2) ** (-(53 * k - 12))
    if op in ("add", "sub"):
        # Cancellation makes *relative* error to the exact result
        # unbounded in principle; expansions still guarantee error
        # relative to the operand magnitudes.
        for g, w, x, y in zip(_to_mpf_vec(got, ctx), want, av, bv):
            denom = max(abs(x), abs(y), mpmath.mpf(1e-300))
            assert abs(g - w) / denom < tol
    else:
        assert err < tol, f"rel err {mpmath.nstr(err, 5)} k={k} op={op}"


@pytest.mark.parametrize("k", [2, 4, 6])
def test_sqrt_accuracy(k):
    rng = np.random.default_rng(k)
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + 120
    a = np.abs(_rand_mp(rng, (100,), k))
    got = _to_mpf_vec(np.asarray(core.sqrt(a)), ctx)
    want = [ctx.sqrt(v) for v in _to_mpf_vec(a, ctx)]
    err = _rel_err(got, want, ctx)
    assert err < mpmath.mpf(2) ** (-(53 * k - 12))


@pytest.mark.parametrize("k", [2, 4])
def test_sum_dot(k):
    rng = np.random.default_rng(7 + k)
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + 200
    a = _rand_mp(rng, (64,), k, scale_pow=5)
    b = _rand_mp(rng, (64,), k, scale_pow=5)
    got = mpdec.to_mpf(np.asarray(core.dot(a, b, axis=0)), ctx)
    want = ctx.fsum(
        x * y for x, y in zip(_to_mpf_vec(a, ctx), _to_mpf_vec(b, ctx))
    )
    scale = ctx.fsum(abs(x * y) for x, y in zip(_to_mpf_vec(a, ctx), _to_mpf_vec(b, ctx)))
    assert abs(got - want) / scale < mpmath.mpf(2) ** (-(53 * k - 14))


def test_decimal_roundtrip():
    k = 4
    s = "1.8402657631320492466880401717305542005635853203028255646576190613343"
    words = mpdec.from_decimal(s, k)
    s2 = mpdec.to_decimal(words)
    ctx = mpmath.mp.clone()
    ctx.prec = 53 * k + 40
    assert abs(ctx.mpf(s) - ctx.mpf(s2)) < ctx.mpf(10) ** (-60)


def test_comparisons_and_maxabs():
    k = 3
    rng = np.random.default_rng(3)
    a = _rand_mp(rng, (50,), k)
    b = _rand_mp(rng, (50,), k)
    lt = np.asarray(core.cmp_lt(a, b))
    want = core.to_f64(a) < core.to_f64(b)
    np.testing.assert_array_equal(lt, np.asarray(want))
    ma = np.asarray(core.max_abs(a))
    assert abs(core.to_f64(ma)) == np.max(np.abs(core.to_f64(a)))


def test_mul_pow2_exact():
    k = 4
    rng = np.random.default_rng(11)
    a = _rand_mp(rng, (20,), k)
    out = np.asarray(core.mul_pow2(a, 0.25))
    np.testing.assert_array_equal(out, np.asarray(a) * 0.25)


@pytest.mark.parametrize("k", [2, 4])
def test_jit_and_vmap(k):
    import jax

    rng = np.random.default_rng(5)
    a = _rand_mp(rng, (16, 8), k, scale_pow=3)
    b = _rand_mp(rng, (16, 8), k, scale_pow=3)
    f = jax.jit(core.mul)
    np.testing.assert_allclose(
        core.to_f64(f(a, b)), core.to_f64(a) * core.to_f64(b), rtol=1e-13
    )
    g = jax.vmap(core.add)
    np.testing.assert_allclose(
        core.to_f64(g(a, b)), core.to_f64(a) + core.to_f64(b), rtol=1e-13
    )


# ---------------------------------------------------------------------------
# float32-word expansions (the TPU word dtype; ~24 bits/word)
# ---------------------------------------------------------------------------

def _rand_mp32(rng, shape, k, scale_pow=1):
    """Random f32-word expansions with NARROW dynamic range.

    f32's exponent floor (min subnormal ~1e-45) means a value of
    magnitude v can carry at most ~log2(v/1e-45) bits of expansion
    before tail words underflow: the f32-word contract is *normalized*
    values (|x| within a few decades of 1) and k <= 5 (~120 bits).
    Wide-dynamic-range / higher-precision TPU work goes through the
    normalize-to-integer MXU path in sdpb_tpu.ops instead (mirroring
    the reference's Matrix_Normalizer + bigint_syrk design,
    `src/sdp_solve/SDP_Solver/run/bigint_syrk/Readme.md`).
    """
    import jax.numpy as jnp

    w0 = (
        rng.standard_normal(shape) * 10.0 ** rng.integers(-scale_pow, scale_pow, shape)
    ).astype(np.float32)
    words = [w0]
    for _ in range(1, k):
        words.append(
            (words[-1] * rng.standard_normal(shape) * 2.0**-24).astype(np.float32)
        )
    return np.asarray(
        core.renorm_words([jnp.asarray(w) for w in words], k)
    )


def _f32_to_mpf_vec(a, ctx):
    flat = np.asarray(a, dtype=np.float64).reshape(-1, a.shape[-1])
    out = []
    for w in flat:
        v = ctx.mpf(0)
        for x in w:
            v += ctx.mpf(float(x))
        out.append(v)
    return out


@pytest.mark.parametrize("k", [20, 26])
@pytest.mark.parametrize("op", ["add", "mul", "div"])
def test_f32_dispatch_routes_to_limb(k, op):
    """float32 MP arrays are the TPU limb format (mp/limb.py); the
    core API must dispatch there and deliver ~9*(k-2)-bit accuracy
    (the retired f32-expansion format was capped at ~150 bits by the
    f32 exponent range and could not run the reference's production
    contract -- see mp/limb.py docstring)."""
    from sdpb_tpu.mp import limb

    rng = np.random.default_rng(k * 31 + sum(map(ord, op)))
    ctx = mpmath.mp.clone()
    ctx.prec = 9 * k + 120
    xv = rng.standard_normal(64) * 2.0 ** rng.integers(-80, 80, 64)
    yv = rng.standard_normal(64) * 2.0 ** rng.integers(-80, 80, 64)
    a = core.from_f64(xv, k=k, dtype=np.float32)
    b = core.from_f64(yv, k=k, dtype=np.float32)
    assert np.asarray(a).dtype == np.float32
    got = np.asarray(getattr(core, op)(a, b))
    opf = {
        "add": lambda x, y: x + y,
        "mul": lambda x, y: x * y,
        "div": lambda x, y: x / y,
    }[op]
    tol = mpmath.mpf(2) ** (-(9 * (k - 2) - 12))
    for i in range(64):
        g = limb.to_mpf(got[i], ctx)
        w = opf(ctx.mpf(float(xv[i])), ctx.mpf(float(yv[i])))
        denom = abs(w) if w != 0 else mpmath.mpf(1)
        if op == "add":
            denom = max(abs(ctx.mpf(float(xv[i]))),
                        abs(ctx.mpf(float(yv[i]))))
        assert abs(g - w) / denom < tol, f"k={k} op={op} i={i}"


def test_f32_from_f64_roundtrip():
    from sdpb_tpu.mp import limb

    rng = np.random.default_rng(0)
    x = rng.standard_normal(50) * 10.0 ** rng.integers(-20, 20, 50)
    mp32 = core.from_f64(x, k=10, dtype=np.float32)
    assert np.asarray(mp32).dtype == np.float32
    # to_f64/fst on limb arrays is a top-3-limbs approximation; its
    # relative error is bounded by 2^-17 only when the leading limb is
    # large, and ~2^-18.5 * BETA / l_1 in general
    np.testing.assert_allclose(core.to_f64(mp32), x.astype(np.float32),
                               rtol=1e-5)
    ctx = mpmath.mp.clone()
    ctx.prec = 200
    # the conversion preserves the FULL f64 value (53 bits), not its
    # f32 rounding
    for i in range(50):
        g = limb.to_mpf(np.asarray(mp32[i]), ctx)
        assert g == ctx.mpf(float(x[i]))
