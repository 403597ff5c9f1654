"""Binary block_data codec round-trips and pipeline equivalence.

The reference defaults to `.bin` block data (Boost binary archive +
Elemental BigFloat serialization, `write_block_data.cxx`,
`read_block_data.cxx:17-20`).  The reference repo ships no binary
fixtures (test/data is all JSON), so these tests enforce (a) exact
value round-trips through the byte format, (b) bit-identical problem
data whether an SDP is compiled to .bin or .json, (c) archive-layout
invariants the reader checks against the documented Boost/Elemental
encoding.
"""

import pathlib
import zipfile

import mpmath
import numpy as np
import pytest

from sdpb_tpu.io import sdp_bin
from sdpb_tpu.io.sdp_json import read_sdp

REF_1D = pathlib.Path("/root/reference/test/data/end-to-end_tests/1d/input")


def test_int_exp_words_roundtrip():
    rng = np.random.default_rng(0)
    k = 6
    w0 = rng.standard_normal(50) * 10.0 ** rng.integers(-30, 30, 50)
    words = np.zeros((50, k))
    words[:, 0] = w0
    for i in range(1, k):
        words[:, i] = words[:, i - 1] * rng.standard_normal(50) * 2.0 ** -53
    for row in words:
        M, E = sdp_bin.words_to_int_exp(row)
        back = sdp_bin.int_exp_to_words(M, E, k)
        M2, E2 = sdp_bin.words_to_int_exp(back)
        # same exact dyadic value
        assert M * mpmath.mpf(2) ** E == M2 * mpmath.mpf(2) ** E2


def test_block_data_bin_roundtrip_words():
    # prec > the words' worst-case bit span (8*53 + inter-word gaps) so
    # the mpfr mantissa round is exact and the round-trip is bitwise
    rng = np.random.default_rng(1)
    k, prec = 8, 512
    schur, N, he, ho, pts = 7, 5, 3, 2, 5

    def arr(*shape):
        out = np.zeros(shape + (k,))
        out[..., 0] = rng.standard_normal(shape) * 10.0 ** rng.integers(
            -8, 8, shape)
        out[..., 1] = out[..., 0] * rng.standard_normal(shape) * 2.0 ** -53
        return out

    B, c = arr(schur, N), arr(schur)
    even, odd = arr(he, pts), arr(ho, pts)
    B[0, 0] = 0.0  # exercise the is_zero flag
    buf = sdp_bin.write_block_data_bin(B, c, even, odd, prec)
    out = sdp_bin.read_block_data_bin(buf, k)
    assert out["precision"] == prec

    def canon(words):
        M, E = sdp_bin.words_to_int_exp(words)
        if M == 0:
            return (0, 0)
        while M % 2 == 0:
            M //= 2
            E += 1
        return (M, E)

    def assert_exact_values(a, b):
        # word SPLITS may differ (inputs here are not canonical
        # nearest-split expansions); the dyadic VALUES must be exact
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        flat_a = a.reshape(-1, a.shape[-1])
        flat_b = b.reshape(-1, b.shape[-1])
        for ra, rb in zip(flat_a, flat_b):
            assert canon(ra) == canon(rb)

    assert_exact_values(out["B"], B)
    assert_exact_values(out["c"], c)
    assert_exact_values(out["bilinear_bases_even"], even)
    assert_exact_values(out["bilinear_bases_odd"], odd)


def test_archive_layout_invariants():
    """Byte stream follows the Boost binary archive encoding the
    reference produces: size_t-prefixed signature, 2-byte library
    version, and on a class's first occurrence a tracking byte plus a
    4-byte version_type -- NO class id (binary archives' save_override
    for class_id_optional_type is an explicit no-op)."""
    B = np.zeros((1, 1, 2))
    B[0, 0, 0] = 1.5
    buf = sdp_bin.write_block_data_bin(B, B[:, 0], B, B, 64)
    assert buf[:8] == (22).to_bytes(8, "little")
    assert buf[8:30] == b"serialization::archive"
    # 2-byte library version, low enough for any modern Boost reader
    lib_ver = int.from_bytes(buf[30:32], "little")
    assert 7 < lib_ver <= 17
    # mpfr_prec_t = 64 (raw long)
    assert int.from_bytes(buf[32:40], "little") == 64
    # first class (El::Matrix): tracking byte 0 + version_type 0
    o = 40
    assert buf[o:o + 5] == bytes([0, 0, 0, 0, 0])
    o += 5
    # Height, Width, LDim as raw El::Int (32-bit)
    assert buf[o:o + 12] == (1).to_bytes(4, "little") * 3
    o += 12
    # first El::BigFloat: tracking byte 0 + version_type 1, then the
    # is_zero flag (0 for the 1.5 payload)
    assert buf[o:o + 5] == bytes([0, 1, 0, 0, 0])
    assert buf[o + 5] == 0


def test_vector_after_empty_matrix():
    """If every matrix before the c-vector is empty (h*w == 0), the
    first BigFloat bookkeeping lands INSIDE the vector, right after
    its 4-byte item_version; the reader must still parse it."""
    k = 3
    B = np.zeros((0, 0, k))
    c = np.zeros((2, k))
    c[0, 0] = -0.75
    c[1, 0] = 3.0
    even = np.zeros((1, 1, k))
    even[0, 0, 0] = 2.0
    buf = sdp_bin.write_block_data_bin(B, c, even, even, 128)
    out = sdp_bin.read_block_data_bin(buf, k)
    assert out["B"].shape == (0, 0, k)
    assert out["c"][0, 0] == -0.75 and out["c"][1, 0] == 3.0
    assert out["bilinear_bases_even"][0, 0, 0] == 2.0


@pytest.mark.parametrize("as_zip", [False, True])
def test_pmp2sdp_bin_matches_json(tmp_path, as_zip):
    """Compiling the 1d PMP with -f bin and -f json must load into
    bit-identical problem data (the bin path is exact: mpf mantissa ->
    mpfr limbs -> f64 words)."""
    from sdpb_tpu.pmp.compile import compile_pmp, write_sdp
    from sdpb_tpu.pmp.core import make_ctx
    from sdpb_tpu.pmp.read import read_pmp

    ctx = make_ctx(424)
    pmp = read_pmp(REF_1D / "pmp.json", ctx)
    sdp = compile_pmp(pmp, ctx)
    pj = tmp_path / ("j.zip" if as_zip else "j")
    pb = tmp_path / ("b.zip" if as_zip else "b")
    write_sdp(pj, sdp, pmp, ctx, as_zip=as_zip, block_format="json")
    write_sdp(pb, sdp, pmp, ctx, as_zip=as_zip, block_format="bin")
    if as_zip:
        names = zipfile.ZipFile(pb).namelist()
    else:
        names = [p.name for p in pb.iterdir()]
    assert "block_data_0.bin" in names
    assert not any(n.endswith("block_data_0.json") for n in names)
    k = 8
    rj = read_sdp(pj, k=k)
    rb = read_sdp(pb, k=k)
    assert rb.num_blocks == rj.num_blocks

    def assert_same_values(a, b):
        """Equal to within the 424-bit storage precision (the two
        paths split the identical prec-bit value into words with
        different bottom-bit rounding conventions)."""
        a = np.asarray(a)
        b = np.asarray(b)
        assert a.shape == b.shape
        scale = np.maximum(np.abs(a[..., 0]), np.abs(b[..., 0]))
        diff = np.zeros(a.shape[:-1])
        for i in range(a.shape[-1] - 1, -1, -1):
            diff = diff + (a[..., i] - b[..., i])
        np.testing.assert_array_less(
            np.abs(diff), np.maximum(scale, 1e-300) * 2.0 ** -420)

    assert_same_values(rb.b, rj.b)
    for bj, bb in zip(rj.blocks, rb.blocks):
        assert_same_values(bb.c, bj.c)
        assert_same_values(bb.B, bj.B)
        assert_same_values(bb.bilinear_bases_even, bj.bilinear_bases_even)
        assert_same_values(bb.bilinear_bases_odd, bj.bilinear_bases_odd)
