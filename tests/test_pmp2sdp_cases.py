"""pmp2sdp golden-diff across every end-to-end case that ships an input
PMP and a golden sdp directory (mirrors
`test/src/integration_tests/cases/end-to-end.test.cxx`'s pmp2sdp leg:
compile at 768 bits, diff against the golden output at reduced
precision).  Exercises poles (incl. duplicates), dim>1 blocks, and the
XML front end on realistic inputs.
"""

import json
from pathlib import Path

import mpmath
import pytest

from sdpb_tpu.pmp import compile as pmp_compile
from sdpb_tpu.pmp import core, read

REF = Path("/root/reference/test/data/end-to-end_tests")

CASES = [
    ("1d-duplicate-poles", "pmp.json"),
    ("1d-constraints", "pmp.xml"),
    ("dfibo-0-0-j=3-c=3.0000-d=3-s=6", "pmp.xml"),
]


@pytest.mark.parametrize("case,fname", CASES,
                         ids=[c for c, _ in CASES])
def test_compile_matches_golden_sdp(case, fname):
    ctx = core.make_ctx(768)
    pmp = read.read_pmp(REF / case / "input" / fname, ctx)
    sdp = pmp_compile.compile_pmp(pmp, ctx)

    golden_dir = REF / case / "output" / "sdp"
    control = json.loads((golden_dir / "control.json").read_text())
    assert sdp.num_blocks == control["num_blocks"]

    gold_obj = json.loads((golden_dir / "objectives.json").read_text())
    tol = ctx.mpf("1e-90")

    def close(ours, theirs):
        g = ctx.mpf(theirs)
        m = max(abs(ours), abs(g), ctx.mpf(1))
        assert abs(ours - g) < tol * m, (ours, theirs)

    close(sdp.objective_const, gold_obj["constant"])
    for v, g in zip(sdp.dual_objective_b, gold_obj["b"]):
        close(v, g)

    for grp in sdp.groups:
        i = grp.block_index
        info = json.loads((golden_dir / f"block_info_{i}.json").read_text())
        assert info["dim"] == grp.dim
        assert info["num_points"] == grp.num_points
        data = json.loads((golden_dir / f"block_data_{i}.json").read_text())
        for ours_row, gold_row in zip(grp.bilinear_bases[0],
                                      data["bilinear_bases_even"]):
            for v, g in zip(ours_row, gold_row):
                close(v, g)
        for ours_row, gold_row in zip(grp.bilinear_bases[1],
                                      data["bilinear_bases_odd"]):
            for v, g in zip(ours_row, gold_row):
                close(v, g)
        for v, g in zip(grp.c, data["c"]):
            close(v, g)
        for row, grow in zip(grp.B, data["B"]):
            for v, g in zip(row, grow):
                close(v, g)


@pytest.mark.parametrize("variant", ["primal_dual_optimal_reduced",
                                     "primal_dual_optimal_reduced_max_num_poles_14"])
def test_nmax6_reduced_prefactor_compile(variant):
    """SingletScalar_cT nmax6 with reducedPrefactor / maxNumPoles: the
    realistic bootstrap input, multi-file NSV, many poles."""
    base = REF / "SingletScalar_cT_test_nmax6"
    inputs = list((base / variant / "input").glob("*.nsv"))
    if not inputs:
        pytest.skip("no input nsv")
    golden_dir = base / variant / "output" / "sdp"
    if not golden_dir.exists():
        pytest.skip("no golden sdp")
    ctx = core.make_ctx(768)
    pmp = read.read_pmp(inputs[0], ctx)
    sdp = pmp_compile.compile_pmp(pmp, ctx)
    control = json.loads((golden_dir / "control.json").read_text())
    assert sdp.num_blocks == control["num_blocks"]
    tol = ctx.mpf("1e-60")
    # spot-check block 0's c and bases against golden
    data = json.loads((golden_dir / "block_data_0.json").read_text())
    grp = sdp.groups[0]
    for v, g in zip(grp.c, data["c"]):
        gg = ctx.mpf(g)
        m = max(abs(v), abs(gg), ctx.mpf(1))
        assert abs(v - gg) < tol * m, (v, g)
    for ours_row, gold_row in zip(grp.bilinear_bases[0],
                                  data["bilinear_bases_even"]):
        for v, g in zip(ours_row, gold_row):
            gg = ctx.mpf(g)
            m = max(abs(v), abs(gg), ctx.mpf(1))
            assert abs(v - gg) < tol * m, (v, g)
