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


def test_write_pmp_xml_roundtrip(tmp_path):
    """write_pmp_xml (the WriteBootstrapSDP equivalent,
    `mathematica/SDPB.m:134`) produces XML our own XML front end reads
    back to the same PMP as the JSON path."""
    from sdpb_tpu.io.pmp_writer import write_pmp_xml

    mats = [PositiveMatrixWithPrefactor(
        polynomials=[[[[1, 0, 0, 0, 1],
                       [0, 0, 1, 0, "1/12"]]]])]
    write_pmp_xml(tmp_path / "pmp.xml", objective=[0, -1], matrices=mats)
    write_pmp_json(tmp_path / "pmp.json", objective=[0, -1],
                   matrices=mats)

    ctx = core.make_ctx(512)
    via_xml = read.read_pmp(tmp_path / "pmp.xml", ctx)
    via_json = read.read_pmp(tmp_path / "pmp.json", ctx)
    assert via_xml.num_matrices == via_json.num_matrices == 1
    assert via_xml.objective == via_json.objective
    tol = ctx.mpf("1e-120")
    for va, vb in zip(via_xml.matrices[0].polynomials[0][0],
                      via_json.matrices[0].polynomials[0][0]):
        for ca, cb in zip(va, vb):
            assert abs(ca - cb) < tol
    # old-sampling XML => same default sampling as the JSON path when
    # the JSON carries no prefactor either
    for a, b in zip(via_xml.matrices[0].sample_points,
                    via_json.matrices[0].sample_points):
        assert abs(a - b) < ctx.mpf("1e-100")


def test_write_pmp_xml_explicit_sampling(tmp_path):
    """Explicit samplePoints/sampleScalings survive the XML round
    trip (the old-sampling schema of `1d-old-sampling/input/pmp.xml`)."""
    from sdpb_tpu.io.pmp_writer import write_pmp_xml

    pts = ["0.5", "1.5", "3.25"]
    scal = ["1", "0.25", "0.125"]
    mats = [PositiveMatrixWithPrefactor(
        polynomials=[[[[1, 0, 1], [0, 1, 0]]]],
        sample_points=pts, sample_scalings=scal,
        bilinear_basis_even=[[1], [0, 1]])]
    write_pmp_xml(tmp_path / "pmp.xml", objective=[1, 2], matrices=mats)

    ctx = core.make_ctx(256)
    pmp = read.read_pmp(tmp_path / "pmp.xml", ctx)
    got = pmp.matrices[0]
    for a, b in zip(got.sample_points, pts):
        assert abs(a - ctx.mpf(b)) < ctx.mpf("1e-60")
    for a, b in zip(got.sample_scalings, scal):
        assert abs(a - ctx.mpf(b)) < ctx.mpf("1e-60")
