"""f32-word solver path (the word dtype used on real TPU chips).

TPU f64 is a non-IEEE emulation, so the on-chip iteration runs K-word
f32 expansions (~24 bits/word; K <= 5 within the f32 exponent-range
contract, see tests/test_mp_core.py::_rand_mp32).  This validates the
full interior-point loop end-to-end at 110 bits on the reference's 1d
SDP: same code path the TPU backend executes, bit-rules identical on
CPU (both are correctly-rounded IEEE f32).

Reference anchor: `end-to-end.test.cxx` 1d case; tolerances scaled to
the reduced precision (gap 1e-10 instead of 1e-30).
"""

import pathlib

import jax.numpy as jnp
import mpmath
import pytest

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import (SolverParams, TerminateReason,
                             problem_from_raw, solve)
from sdpb_tpu.solver.data import bucketize

DATA = pathlib.Path("/root/reference/test/data/end-to-end_tests/1d/output")


def f32_params(**kw):
    base = dict(precision=110, word_dtype="float32",
                duality_gap_threshold="1e-10",
                primal_error_threshold="1e-10",
                dual_error_threshold="1e-10",
                initial_matrix_scale_primal="1e8",
                initial_matrix_scale_dual="1e8",
                max_iterations=100)
    base.update(kw)
    return SolverParams(**base)


@pytest.fixture(scope="module")
def problem():
    params = f32_params()
    raw = read_sdp(DATA / "sdp", k=6)
    p = bucketize(problem_from_raw(raw, dtype=jnp.float32, k=params.n_words))
    assert p.b.dtype == jnp.float32
    assert p.b.shape[-1] == 5
    return p


def test_1d_f32_converges_to_golden_objectives(problem):
    """PrimalDualOptimal at gap 1e-10; objectives match the reference
    golden out.txt (produced at 768-bit GMP) to the f32-path accuracy."""
    result = solve(problem, f32_params())
    assert result.reason == TerminateReason.PrimalDualOptimal
    gold = {}
    for line in (DATA / "out" / "out.txt").read_text().splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            gold[k.strip()] = v.strip().rstrip(";")
    ctx = mpmath.mp.clone()
    ctx.prec = 200
    for ours, key in ((result.primal_objective, "primalObjective"),
                      (result.dual_objective, "dualObjective")):
        a, b = ctx.mpf(ours), ctx.mpf(gold[key])
        assert abs(a - b) <= abs(b) * ctx.mpf(3e-10), key
