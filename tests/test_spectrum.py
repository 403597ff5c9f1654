"""spectrum app tests against the reference's golden spectrum.json.

Mirrors the reference's end-to-end spectrum check
(`end-to-end.test.cxx:140-160`: threshold 1e-10, precision 768,
diff at reduced precision; we diff much tighter).
"""

import json
from pathlib import Path

import mpmath
import pytest

from sdpb_tpu.apps import spectrum as spec
from sdpb_tpu.pmp.core import make_ctx

REF = Path("/root/reference/test/data/end-to-end_tests")

CASES = ["1d", "1d-constraints", "1d-old-sampling"]


@pytest.mark.parametrize("case", CASES)
def test_spectrum_matches_golden(case, tmp_path):
    d = REF / case / "output"
    if not (d / "spectrum.json").exists():
        pytest.skip("no golden spectrum")
    ctx = make_ctx(768)
    pmp_info = spec.read_pmp_info(d / "sdp" / "pmp_info.json", ctx)
    c_minus_By = spec.read_c_minus_By(
        d / "out" / "c_minus_By" / "c_minus_By.json", pmp_info, ctx)
    x = spec.read_x(d / "out", pmp_info, ctx)
    results = spec.compute_spectrum(
        pmp_info, c_minus_By, x, ctx.mpf("1e-10"), ctx.mpf(0), True, ctx)
    out = tmp_path / "spectrum.json"
    spec.write_spectrum(out, results, ctx)

    ours = json.loads(out.read_text())
    gold = json.loads((d / "spectrum.json").read_text())
    assert len(ours) == len(gold)
    tol = mpmath.mpf("1e-100")
    with mpmath.workprec(800):
        for o, g in zip(ours, gold):
            assert len(o["zeros"]) == len(g["zeros"]), o["block_path"]
            for zo, zg in zip(o["zeros"], g["zeros"]):
                assert abs(mpmath.mpf(zo["zero"])
                           - mpmath.mpf(zg["zero"])) < tol
                # eigenvector sign is arbitrary: compare |lambda|
                for lo, lg in zip(zo.get("lambda", []),
                                  zg.get("lambda", [])):
                    assert abs(abs(mpmath.mpf(lo))
                               - abs(mpmath.mpf(lg))) < tol
            if "error" in o and "error" in g:
                assert abs(mpmath.mpf(o["error"])
                           - mpmath.mpf(g["error"])) \
                    < mpmath.mpf("1e-30") + mpmath.mpf(g["error"])


def test_spectrum_parallel_matches_serial(tmp_path):
    """Block-parallel spectrum (LPT over worker processes, the
    reference's MPI distribution in `compute_spectrum.cxx:17-75`)
    produces byte-identical output to the serial path."""
    d = REF / "1d-constraints" / "output"
    ctx = make_ctx(512)
    pmp_info = spec.read_pmp_info(d / "sdp" / "pmp_info.json", ctx)
    if len(pmp_info) < 2:
        pytest.skip("need >= 2 blocks")
    cb_path = d / "out" / "c_minus_By" / "c_minus_By.json"
    c_minus_By = spec.read_c_minus_By(cb_path, pmp_info, ctx)
    x = spec.read_x(d / "out", pmp_info, ctx)
    serial = spec.compute_spectrum(
        pmp_info, c_minus_By, x, ctx.mpf("1e-10"), ctx.mpf(0), True, ctx)
    parallel = spec.compute_spectrum_parallel(
        d / "sdp" / "pmp_info.json", cb_path, d / "out", 512,
        "1e-10", "0", True, len(pmp_info),
        [len(i.sample_points) for i in pmp_info], 2, ctx)
    out_s = tmp_path / "serial.json"
    out_p = tmp_path / "parallel.json"
    spec.write_spectrum(out_s, serial, ctx)
    spec.write_spectrum(out_p, parallel, ctx)
    assert out_s.read_text() == out_p.read_text()
