"""Memory estimation / fail-fast limit checks (reference:
`SDP_Solver/run/run.cxx:80-183`, `memory_estimates.hxx`,
`String_To_Bytes_Translator.hxx`)."""

import pathlib

import numpy as np
import pytest

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import SolverParams, problem_from_raw
from sdpb_tpu.solver.data import bucketize
from sdpb_tpu.solver.memory import (MemoryLimitError, check_memory_limit,
                                    estimate_solver_memory, format_bytes,
                                    parse_bytes)

SDP_1D = pathlib.Path(
    "/root/reference/test/data/end-to-end_tests/1d/output/sdp")


def test_parse_bytes_reference_forms():
    # the reference's end-to-end test passes --maxSharedMemory=100.1K
    assert parse_bytes("100.1K") == int(100.1 * 1024)
    assert parse_bytes("2G") == 2 * 2 ** 30
    assert parse_bytes("1024") == 1024
    assert parse_bytes("1.5M") == int(1.5 * 2 ** 20)
    assert parse_bytes("0") == 0
    assert parse_bytes(4096) == 4096
    with pytest.raises(ValueError):
        parse_bytes("12Q")


@pytest.fixture(scope="module")
def problem_1d():
    params = SolverParams(precision=212)
    raw = read_sdp(SDP_1D, k=params.n_words)
    return bucketize(problem_from_raw(raw))


def test_estimate_scales_with_devices(problem_1d):
    e1 = estimate_solver_memory(problem_1d, n_devices=1)
    e4 = estimate_solver_memory(problem_1d, n_devices=4)
    assert e1.total > 0
    # block-local components shrink with devices; replicated Q does not
    assert e4.total <= e1.total
    assert e4.components["Q + L_Q + dy"] == e1.components["Q + L_Q + dy"]
    # sanity: the 1d toy problem is tiny
    assert e1.total < 64 * 2 ** 20
    msg = e1.message(limit=2 ** 30)
    assert "Schur S + L_S" in msg and "limit" in msg


def test_oversized_problem_fails_fast(problem_1d):
    """An undersized limit aborts with the reference-style diagnostic
    instead of an XLA OOM mid-solve."""
    with pytest.raises(MemoryLimitError) as exc:
        check_memory_limit(problem_1d, "10K", n_devices=1)
    text = str(exc.value)
    assert "exceeds the limit" in text
    assert "Q residue pipeline" in text


def test_within_limit_passes(problem_1d):
    est = check_memory_limit(problem_1d, "4G", n_devices=1)
    assert est.total < parse_bytes("4G")


def test_auto_detect_limit(problem_1d):
    # auto-detection (limit 0) must not raise for the toy problem
    est = check_memory_limit(problem_1d, 0, n_devices=1)
    assert est.total > 0


def test_cli_undersized_device_memory_aborts(tmp_path):
    """With device memory forced below the estimate, sdpb exits 1 with
    the reference-style diagnostic instead of an XLA OOM mid-solve
    (`run.cxx:80-183` aborting when the estimate exceeds the node
    budget)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, SDPB_TPU_DEVICE_MEMORY="2K")
    out = subprocess.run(
        [sys.executable, "-m", "sdpb_tpu.apps.sdpb", "-s", str(SDP_1D),
         "-o", str(tmp_path / "out"), "-c", str(tmp_path / "ck"),
         "--precision", "212", "--maxIterations", "1"],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 1
    assert "exceeds the limit" in out.stderr


def _fake_problem(nbs, m, pts, n_dual, k=4):
    """Shape-only BucketedProblem stand-in for the estimator."""
    import numpy as np

    from sdpb_tpu.solver.data import block_shape_of

    class B:
        def __init__(self, nb):
            self.nb = nb
            self.shape = block_shape_of(m, pts)
            self.block_indices = tuple(range(nb))

    class Prob:
        buckets = [B(nb) for nb in nbs]
        b = np.zeros((n_dual, k))
        dual_dim = n_dual

    return Prob()


def test_max_shared_memory_caps_q_window():
    """--maxSharedMemory shrinks the Q pipeline component (window
    splitting), it is not a total limit."""
    prob = _fake_problem([64], m=2, pts=32, n_dual=384)
    full = estimate_solver_memory(prob)
    capped = estimate_solver_memory(prob, q_bytes_cap=1 * 2 ** 20)
    assert capped.components["Q residue pipeline (int)"] < \
        full.components["Q residue pipeline (int)"]
    # everything else unchanged
    for key in full.components:
        if "pipeline" not in key:
            assert capped.components[key] == full.components[key]


def test_q_tiling_is_exact(problem_1d):
    """Tiled Q (maxSharedMemory) reproduces the untiled Q Cholesky
    bit-for-bit: integer residue accumulation cannot round
    (`bigint_syrk_blas.cxx:195-222` window splitting, exactness by
    construction)."""
    import numpy as np

    from sdpb_tpu.solver import SolverParams, bucket_iteration as bi
    from sdpb_tpu.solver.data import initial_bucketed_state

    params = SolverParams(precision=212)
    state = initial_bucketed_state(problem_1d, 2.0, 3.0)
    res = bi.compute_residues(problem_1d, state)
    _, _, lq_full = bi.schur_factorize(problem_1d, res)
    _, _, lq_tiled = bi.schur_factorize(problem_1d, res, max_q_bytes=1)
    assert bi.q_block_chunk(problem_1d, 1) == 1
    np.testing.assert_array_equal(np.asarray(lq_full),
                                  np.asarray(lq_tiled))


def test_format_bytes():
    assert format_bytes(2 ** 30) == "1.00 GB"
    assert format_bytes(1536) == "1.50 KB"
    assert format_bytes(100) == "100 B"
