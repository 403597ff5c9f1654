"""pmp2sdp front-end tests against the reference's golden data.

Oracles (cf. `test/src/integration_tests/cases/pmp2sdp.test.cxx` and
`unit_tests/cases/pmp_sampling.test.cxx:118` in the reference):
- sampling defaults: pmp.json (no sampling fields) must reproduce the
  samplePoints/sampleScalings the reference computed into
  `pmp-all-sampling-fields.json` and `1d/output/sdp/pmp_info.json`
- full compile: block_data/objectives must match the golden SDP dir
  at the reference's own reduced-precision diff tolerance
  (`end-to-end.test.cxx:25-27` diffs at ~1e-30; we check much tighter)
- all input formats (.json, .xml, .m, .nsv) must agree with each other
"""

import json
from pathlib import Path

import mpmath
import pytest

from sdpb_tpu.pmp import compile as pmp_compile
from sdpb_tpu.pmp import core, read, sampling

REF = Path("/root/reference/test/data/end-to-end_tests")


def ctx768():
    return core.make_ctx(768)


def rel_err(a, b, ctx):
    d = abs(a - b)
    m = max(abs(a), abs(b))
    return d / m if m != 0 else d


def assert_close_str(ours, golden_str, ctx, tol):
    g = ctx.mpf(golden_str)
    assert rel_err(ours, g, ctx) < tol, (ours, golden_str)


class TestSampling1d:
    @pytest.fixture(scope="class")
    def golden(self):
        return json.loads(
            (REF / "1d/input/pmp-all-sampling-fields.json").read_text()
        )["PositiveMatrixWithPrefactorArray"][0]

    def test_sample_points_scalings(self, golden):
        ctx = ctx768()
        pref = core.DampedRational(
            ctx.mpf(golden["prefactor"]["constant"]),
            ctx.mpf(golden["prefactor"]["base"]), [])
        pts = sampling.sample_points(5, pref, ctx)
        for p, g in zip(pts, golden["samplePoints"]):
            assert_close_str(p, g, ctx, ctx.mpf("1e-100"))
        sc = sampling.sample_scalings(pts, pref, ctx)
        for s, g in zip(sc, golden["sampleScalings"]):
            assert_close_str(s, g, ctx, ctx.mpf("1e-100"))

    def test_pvm_defaults_match_reference_pmp_info(self, golden):
        """Parsing pmp.json (no sampling fields) must auto-sample to the
        reference's pmp_info.json values."""
        ctx = ctx768()
        pmp = read.read_pmp(REF / "1d/input/pmp.json", ctx)
        info = json.loads((REF / "1d/output/sdp/pmp_info.json").read_text())
        m = pmp.matrices[0]
        blk = info[0]
        assert blk["dim"] == m.dim
        for p, g in zip(m.sample_points, blk["samplePoints"]):
            assert_close_str(p, g, ctx, ctx.mpf("1e-100"))
        for s, g in zip(m.sample_scalings, blk["sampleScalings"]):
            assert_close_str(s, g, ctx, ctx.mpf("1e-100"))
        for s, g in zip(m.reduced_sample_scalings,
                        blk["reducedSampleScalings"]):
            assert_close_str(s, g, ctx, ctx.mpf("1e-100"))


class TestCompile1d:
    @pytest.fixture(scope="class")
    def compiled(self):
        ctx = ctx768()
        pmp = read.read_pmp(REF / "1d/input/pmp.json", ctx)
        sdp = pmp_compile.compile_pmp(pmp, ctx)
        return ctx, pmp, sdp

    def test_objectives(self, compiled):
        ctx, _, sdp = compiled
        golden = json.loads(
            (REF / "1d/output/sdp/objectives.json").read_text())
        assert_close_str(sdp.objective_const, golden["constant"], ctx,
                         ctx.mpf("1e-200"))
        assert len(sdp.dual_objective_b) == len(golden["b"])
        for v, g in zip(sdp.dual_objective_b, golden["b"]):
            assert_close_str(v, g, ctx, ctx.mpf("1e-200"))

    def test_block_data_matches_golden(self, compiled):
        ctx, _, sdp = compiled
        golden = json.loads(
            (REF / "1d/output/sdp/block_data_0.json").read_text())
        g = sdp.groups[0]
        assert g.dim == 1 and g.num_points == 5
        tol = ctx.mpf("1e-100")
        for ours, theirs in zip(g.bilinear_bases[0],
                                golden["bilinear_bases_even"]):
            for v, s in zip(ours, theirs):
                assert_close_str(v, s, ctx, tol)
        for ours, theirs in zip(g.bilinear_bases[1],
                                golden["bilinear_bases_odd"]):
            for v, s in zip(ours, theirs):
                assert_close_str(v, s, ctx, tol)
        for v, s in zip(g.c, golden["c"]):
            assert_close_str(v, s, ctx, tol)
        for row, grow in zip(g.B, golden["B"]):
            for v, s in zip(row, grow):
                assert_close_str(v, s, ctx, tol)

    def test_write_and_reload(self, compiled, tmp_path):
        """Round trip through write_sdp -> io.sdp_json.read_sdp ->
        solver containers."""
        ctx, pmp, sdp = compiled
        out = tmp_path / "sdp"
        pmp_compile.write_sdp(out, sdp, pmp, ctx, command="test")
        from sdpb_tpu.io.sdp_json import read_sdp

        raw = read_sdp(out, k=4)
        assert raw.num_blocks == 1
        assert raw.dual_dim == 1
        # zip flavor too
        outz = tmp_path / "sdp.zip"
        pmp_compile.write_sdp(outz, sdp, pmp, ctx, as_zip=True)
        rawz = read_sdp(outz, k=4)
        assert rawz.num_blocks == 1


class TestInputFormats:
    def test_xml_old_sampling(self):
        """1d-old-sampling ships pmp.xml with explicit samplePoints/
        scalings/bilinearBasis; its golden sdp dir must match."""
        ctx = ctx768()
        src = REF / "1d-old-sampling/input/pmp.xml"
        pmp = read.read_pmp(src, ctx)
        sdp = pmp_compile.compile_pmp(pmp, ctx)
        golden_dir = REF / "1d-old-sampling/output/sdp"
        if not golden_dir.exists():
            pytest.skip("no golden sdp for 1d-old-sampling")
        golden = json.loads((golden_dir / "block_data_0.json").read_text())
        g = sdp.groups[0]
        tol = ctx.mpf("1e-100")
        for v, s in zip(g.c, golden["c"]):
            assert_close_str(v, s, ctx, tol)
        for ours, theirs in zip(g.bilinear_bases[0],
                                golden["bilinear_bases_even"]):
            for v, s in zip(ours, theirs):
                assert_close_str(v, s, ctx, tol)

    def test_mathematica_matches_json(self, tmp_path):
        """An SDP[...] .m expression equivalent to 1d/pmp.json parses to
        the same compiled SDP."""
        ctx = ctx768()
        base = json.loads((REF / "1d/input/pmp.json").read_text())
        b = base["PositiveMatrixWithPrefactorArray"][0]["DampedRational"]["base"]
        m_text = (
            "SDP[{0, -1}, {1, 0},\n"
            " {PositiveMatrixWithPrefactor[\n"
            f"   DampedRational[1, {{}}, {b}, x],\n"
            "   {{{1 + x^4, x^4/12 + x^2 /. placeholder}}}]}]"
        )
        # write the polynomial exactly as SDPB.m would (decimal coeffs)
        twelfth = mpmath.nstr(ctx.mpf(1) / 12, 230, strip_zeros=True)
        m_text = m_text.replace("x^4/12 + x^2 /. placeholder",
                                f"{twelfth}*x^4 + x^2")
        src = tmp_path / "pmp.m"
        src.write_text(m_text)
        pmp_m = read.read_pmp(src, ctx)
        pmp_j = read.read_pmp(REF / "1d/input/pmp.json", ctx)
        assert pmp_m.num_matrices == pmp_j.num_matrices == 1
        assert [float(v) for v in pmp_m.objective] == \
            [float(v) for v in pmp_j.objective]
        mm, mj = pmp_m.matrices[0], pmp_j.matrices[0]
        assert mm.num_points == mj.num_points
        tol = ctx.mpf("1e-100")
        for a, b2 in zip(mm.sample_points, mj.sample_points):
            assert rel_err(a, b2, ctx) < tol
        # polynomial coefficients match to parse precision
        for va, vb in zip(mm.polynomials[0][0], mj.polynomials[0][0]):
            for ca, cb in zip(va, vb):
                assert abs(ca - cb) < ctx.mpf("1e-200")

    def test_nsv_expansion(self, tmp_path):
        inner = tmp_path / "inner.nsv"
        inner.write_bytes(b"a.json\0b.json\0")
        outer = tmp_path / "outer.nsv"
        outer.write_bytes(bytes(f"{inner}\0c.json\0", "utf-8"))
        files = read.expand_nsv(outer)
        assert [f.name for f in files] == ["a.json", "b.json", "c.json"]
        assert files[0].parent == tmp_path


class TestEndToEnd1d:
    @pytest.mark.slow
    def test_compile_then_solve_matches_out_txt(self, tmp_path):
        """Full pipeline: our pmp2sdp -> our sdpb solver ->
        objectives match the reference's golden out.txt."""
        ctx = ctx768()
        pmp = read.read_pmp(REF / "1d/input/pmp.json", ctx)
        sdp = pmp_compile.compile_pmp(pmp, ctx)
        out = tmp_path / "sdp"
        pmp_compile.write_sdp(out, sdp, pmp, ctx)

        from sdpb_tpu.io.sdp_json import read_sdp
        from sdpb_tpu.solver import SolverParams, problem_from_raw, solve
        from sdpb_tpu.solver.data import bucketize

        raw = read_sdp(out, k=4)
        problem = bucketize(problem_from_raw(raw))
        params = SolverParams(precision=212)
        result = solve(problem, params)
        assert result.reason.name == "PrimalDualOptimal"

        golden = (REF / "1d/output/out/out.txt").read_text()
        import re
        prim = re.search(r"primalObjective = ([-\d.e+]+)", golden).group(1)
        assert rel_err(ctx.mpf(result.primal_objective), ctx.mpf(prim),
                       ctx) < ctx.mpf("1e-25")
