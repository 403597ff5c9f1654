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


def test_cli_undersized_limit_aborts(tmp_path):
    """`sdpb --maxSharedMemory 10K` exits 1 with a diagnostic
    (mirrors the reference aborting in `run.cxx` when the estimate
    exceeds the window budget)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "sdpb_tpu.apps.sdpb", "-s", str(SDP_1D),
         "-o", str(tmp_path / "out"), "-c", str(tmp_path / "ck"),
         "--precision", "212", "--maxIterations", "1",
         "--maxSharedMemory", "10K"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 1
    assert "exceeds the limit" in out.stderr


def test_format_bytes():
    assert format_bytes(2 ** 30) == "1.00 GB"
    assert format_bytes(1536) == "1.50 KB"
    assert format_bytes(100) == "100 B"
