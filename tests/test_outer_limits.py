"""pmp2functions + outer_limits tests against the reference's golden
data (mirrors `test/src/integration_tests/cases/outer_limits.test.cxx`:
pmp2functions at precision 128 diffed against functions_orig.json, then
outer_limits optimal diffed against out_orig.json at 64-bit tolerance).
"""

import json
from pathlib import Path

import mpmath
import pytest

from sdpb_tpu.apps import outer_limits as ol
from sdpb_tpu.apps.pmp2functions import pmp_to_functions
from sdpb_tpu.pmp.core import make_ctx
from sdpb_tpu.pmp.read import read_pmp

DATA = Path("/root/reference/test/data/outer_limits")
PMP = Path("/root/reference/test/data/end-to-end_tests/"
           "1d-old-sampling/input/pmp.json")


@pytest.fixture(scope="module")
def functions_doc():
    ctx = make_ctx(128)
    pmp = read_pmp(PMP, ctx)
    return pmp_to_functions(pmp, ctx)


def test_pmp2functions_matches_golden(functions_doc):
    gold = json.loads((DATA / "functions_orig.json").read_text())
    tol = mpmath.mpf("1e-19")  # precision/2 = 64 bits

    def walk(a, b):
        if isinstance(a, dict):
            assert set(a) == set(b)
            for key in a:
                walk(a[key], b[key])
        elif isinstance(a, list):
            assert len(a) == len(b)
            for x, y in zip(a, b):
                walk(x, y)
        else:
            with mpmath.workprec(256):
                va, vb = mpmath.mpf(a), mpmath.mpf(b)
                assert abs(va - vb) <= tol * max(1, abs(vb)), (a, b)

    walk(functions_doc["functions"], gold["functions"])


def test_chebyshev_roundtrip():
    """values -> coeffs -> eval at the Chebyshev zeros is identity."""
    ctx = make_ctx(256)
    vals = [ctx.mpf(v) for v in ("1.5", "-2.25", "0.125", "7", "-3")]
    n = len(vals)
    coeffs = ol._values_to_coeffs(vals, ctx)
    max_delta = ctx.mpf(10)
    zeros = [ctx.mpf("0.5") * max_delta
             * (1 + ctx.cos(ctx.pi * (n - i - ctx.mpf("0.5")) / n))
             for i in range(n)]
    f = ol.Function(max_delta, ctx.mpf(0), ctx.mpf(0), coeffs)
    eps, inf = ctx.mpf(1e-40), ctx.mpf(1e300)
    for x, v in zip(zeros, vals):
        got = f.eval(eps, inf, x, ctx)
        assert abs(got - v) < ctx.mpf("1e-60"), (x, got, v)


def test_mesh_finds_quadratic_minimum():
    ctx = make_ctx(128)
    # f(x) = (x-3)^2 - 0.01 dips negative at x=3: the mesh must
    # propose a new point there (the quadratic fit is exact here)
    def fn(x):
        return (x - 3) ** 2 - ctx.mpf("0.01")

    mesh = ol._build_mesh(ctx.mpf(0), ctx.mpf(5), ctx.mpf(10),
                          fn(ctx.mpf(0)), fn(ctx.mpf(5)), fn(ctx.mpf(10)),
                          fn, ctx.mpf("0.001"), ctx.mpf("1e-35"), ctx)
    found = []
    ol._get_new_points(mesh, ctx.mpf("1e-35"), found)
    assert found and min(abs(p - 3) for p in found) < ctx.mpf("0.05")


@pytest.mark.slow
def test_outer_limits_toy_matches_golden(functions_doc, tmp_path):
    ctx = make_ctx(128)
    from sdpb_tpu.solver.params import SolverParams

    functions_path = tmp_path / "functions.json"
    functions_path.write_text(json.dumps(functions_doc))
    objectives, normalization, functions = ol.read_function_blocks(
        functions_path, ctx)
    initial_points = ol.read_points(DATA / "points.json", ctx)

    params = SolverParams(
        precision=128, max_iterations=1000,
        duality_gap_threshold="1e-10",
        primal_error_threshold="1e-10", dual_error_threshold="1e-10",
        initial_matrix_scale_primal="1e1", initial_matrix_scale_dual="1e1")
    weights = ol.compute_optimal(
        functions, initial_points, objectives, normalization, params, ctx,
        duality_gap_reduction=ctx.mpf(1024), mesh_threshold=ctx.mpf("0.001"),
        use_svd=True, ck_dir=tmp_path / "ck", verbosity=0)
    optimal = sum(o * w for o, w in zip(objectives, weights))

    gold = json.loads((DATA / "out_orig.json").read_text())
    with mpmath.workprec(256):
        assert abs(optimal - ctx.mpf(gold["optimal"])) < mpmath.mpf("1e-19")
        for w, g in zip(weights, gold["y"]):
            assert abs(w - ctx.mpf(g)) < mpmath.mpf("1e-19")

    # checkpoint round-trip
    ck = ol.load_checkpoint(tmp_path / "ck",
                            ctx.mpf(1.7976931348623157e308), ctx)
    assert ck is not None and ck["generation"] >= 1
