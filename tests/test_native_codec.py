"""Native decimal<->words codec (csrc/codec.cpp) vs exact oracles.

The reference validates its numeric kernels against independent
implementations (`calculate_matrix_square.test.cxx` cross-checks
bigint_syrk vs Elemental vs FLINT); here the C codec is cross-checked
against CPython's exactly-rounded Fraction->float and against the
mpmath path it replaces.
"""

import random
from decimal import Decimal
from fractions import Fraction

import numpy as np
import pytest

from sdpb_tpu.io import native_codec as nc
from sdpb_tpu.mp import decimal as mpdec

pytestmark = pytest.mark.skipif(not nc.available(),
                                reason="native codec not built")


def exact_words(s, k):
    """True greedy split via Fraction (correctly-rounded float())."""
    v = Fraction(Decimal(s))
    out = []
    for _ in range(k):
        w = float(v)
        out.append(w)
        v = v - Fraction(w)
    return np.array(out)


def _random_cases(n, emin=-250, emax=60, seed=0):
    rng = random.Random(seed)
    cases = ["0", "1", "-1", "0.5", "-0.125", "1e-30", "-3.25e100", "1e20",
             "2", "10", "0.1", "1234567890123456789012345678901234567890"]
    for _ in range(n):
        mant = "".join(rng.choice("0123456789")
                       for _ in range(rng.randint(1, 240)))
        e = rng.randint(emin, emax)
        cases.append(rng.choice(["", "-"])
                     + mant[:rng.randint(1, len(mant))] + "." + mant
                     + f"e{e}")
    return cases


@pytest.mark.parametrize("k", [2, 4, 8, 15])
def test_dec2words_matches_exact_oracle(k):
    cases = _random_cases(400)
    got = nc.dec2words_batch(cases, k)
    for i, s in enumerate(cases):
        assert np.array_equal(got[i], exact_words(s, k)), s


def test_single_matches_batch():
    cases = _random_cases(50, seed=3)
    batch = nc.dec2words_batch(cases, 6)
    for i, s in enumerate(cases):
        assert np.array_equal(nc.dec2words(s, 6), batch[i])


@pytest.mark.parametrize("k", [2, 4, 8])
def test_words2dec_roundtrip(k):
    cases = _random_cases(300, emin=-150, emax=60, seed=1)
    words = nc.dec2words_batch(cases, k)
    for i in range(len(cases)):
        d = nc.words2dec(words[i])
        back = nc.dec2words(d, k)
        assert np.array_equal(back, words[i]), (cases[i], d)


def test_mp_decimal_uses_native():
    """from_decimal/array_from_decimal/to_decimal agree across the
    native and mpmath paths."""
    import os

    cases = _random_cases(50, seed=7)
    k = 5
    native = mpdec.array_from_decimal(cases, k)
    # force the mpmath fallback
    nc_avail = nc.available
    try:
        nc.available = lambda: False
        fallback = mpdec.array_from_decimal(cases, k)
    finally:
        nc.available = nc_avail
    assert np.array_equal(native, fallback)

    for i in range(0, len(cases), 5):
        s = mpdec.to_decimal(native[i])
        assert np.array_equal(mpdec.from_decimal(s, k), native[i])


def test_invalid_input_raises():
    with pytest.raises(ValueError):
        nc.dec2words("not-a-number", 4)
