"""pmp_writer (the SDPB.m WritePmpJson equivalent) round-trips through
the pmp reader + compiler and matches the reference's 1d golden SDP."""

import json
from pathlib import Path

import mpmath
import pytest

from sdpb_tpu.io.pmp_writer import (DampedRational,
                                    PositiveMatrixWithPrefactor,
                                    write_pmp_json)
from sdpb_tpu.pmp import compile as pmp_compile
from sdpb_tpu.pmp import core, read

REF = Path("/root/reference/test/data/end-to-end_tests/1d")


def test_write_pmp_json_roundtrip(tmp_path):
    base = json.loads((REF / "input/pmp.json").read_text())
    dr = base["PositiveMatrixWithPrefactorArray"][0]["DampedRational"]
    twelfth = mpmath.mpf(1) / 12
    with mpmath.workprec(800):
        write_pmp_json(
            tmp_path / "pmp.json",
            objective=[0, -1],
            normalization=[1, 0],
            matrices=[PositiveMatrixWithPrefactor(
                DampedRational(constant=1, base=dr["base"], poles=[]),
                polynomials=[[[[1, 0, 0, 0, 1],
                               [0, 0, 1, 0, "1/12"]]]])])

    ctx = core.make_ctx(768)
    ours = read.read_pmp(tmp_path / "pmp.json", ctx)
    golden = read.read_pmp(REF / "input/pmp.json", ctx)
    assert ours.num_matrices == golden.num_matrices
    tol = ctx.mpf("1e-190")
    for va, vb in zip(ours.matrices[0].polynomials[0][0],
                      golden.matrices[0].polynomials[0][0]):
        for ca, cb in zip(va, vb):
            assert abs(ca - cb) < tol, (ca, cb)
    for a, b in zip(ours.matrices[0].sample_points,
                    golden.matrices[0].sample_points):
        assert abs(a - b) < ctx.mpf("1e-90")

    # compile and diff the sampled block data vs golden
    sdp = pmp_compile.compile_pmp(ours, ctx)
    gold = json.loads((REF / "output/sdp/block_data_0.json").read_text())
    for v, s in zip(sdp.groups[0].c, gold["c"]):
        g = ctx.mpf(s)
        assert abs(v - g) < ctx.mpf("1e-80") * max(1, abs(g))


def test_deprecated_forwarders(tmp_path, capsys):
    from sdpb_tpu.apps import sdp2input

    rc = sdp2input.main([
        "-i", str(REF / "input/pmp.json"),
        "-o", str(tmp_path / "sdp"), "-p", "256"])
    assert rc == 0
    # pmp2sdp defaults to the reference's binary block format
    # (write_sdp.cxx:81); the forwarders inherit that default.
    assert ((tmp_path / "sdp" / "block_data_0.bin").exists()
            or (tmp_path / "sdp" / "block_data_0.json").exists())
