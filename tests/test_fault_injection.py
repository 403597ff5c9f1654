"""Fault injection / restart determinism (reference: `sdpb.test.cxx`).

Covers the reference's IO-error and corruption cases: read-only output
directory, corrupt binary checkpoints with backup-generation fallback,
run-twice determinism, and checkpoint-restart continuation; plus (slow)
SIGTERM drain through the real CLI, mirroring `Environment.cxx:12-18` +
`run.cxx:330-360` semantics (exit code 143, checkpoint written).
"""

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import jax.numpy as jnp
import numpy as np
import pytest

from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import SolverParams, problem_from_raw, solve
from sdpb_tpu.solver.checkpoint import load_checkpoint, save_checkpoint
from sdpb_tpu.solver.data import bucketize

SDP_1D = pathlib.Path(
    "/root/reference/test/data/end-to-end_tests/1d/output/sdp")


@pytest.fixture(scope="module")
def setup():
    params = SolverParams(precision=212, max_iterations=4)
    raw = read_sdp(SDP_1D, k=params.n_words)
    problem = bucketize(problem_from_raw(raw))
    return problem, params


def _state_arrays(state):
    out = [np.asarray(state.y)]
    for i in range(len(state.x)):
        out.append(np.asarray(state.x[i]))
        for p in range(2):
            out.append(np.asarray(state.X[i][p]))
            out.append(np.asarray(state.Y[i][p]))
    return out


def test_run_twice_determinism(setup):
    """Two cold solves produce bit-identical iterates and records
    (`end-to-end.test.cxx` run_sdpb_twice)."""
    problem, params = setup
    r1 = solve(problem, params)
    r2 = solve(problem, params)
    for a, b in zip(_state_arrays(r1.state), _state_arrays(r2.state)):
        np.testing.assert_array_equal(a, b)
    assert [rec.mu for rec in r1.iterations] == \
        [rec.mu for rec in r2.iterations]


def test_checkpoint_restart_determinism(setup, tmp_path):
    """Interrupt-after-2 + restart matches the uninterrupted run
    bitwise (checkpoints store exact words; our layout is additionally
    rank-count free, unlike the reference's per-rank dumps)."""
    problem, params = setup
    import dataclasses

    p2 = dataclasses.replace(params, max_iterations=2)
    r_first = solve(problem, p2)
    save_checkpoint(tmp_path, r_first.state, problem, p2)
    state = load_checkpoint(tmp_path, problem, p2)
    for a, b in zip(_state_arrays(r_first.state), _state_arrays(state)):
        np.testing.assert_array_equal(a, b)
    # resume for 2 more iterations: must land bitwise on the straight
    # 4-iteration run (iteration numbering restarts at 1 on resume,
    # matching the reference's per-run maxIterations semantics)
    r_resumed = solve(problem, p2, state=state)
    r_straight = solve(problem, params)
    straight_mu = [rec.mu for rec in r_straight.iterations]
    resumed_mu = [rec.mu for rec in r_resumed.iterations]
    assert resumed_mu == straight_mu[2:2 + len(resumed_mu)]
    for a, b in zip(_state_arrays(r_resumed.state),
                    _state_arrays(r_straight.state)):
        np.testing.assert_array_equal(a, b)


def test_corrupt_checkpoint_falls_back_to_backup(setup, tmp_path):
    problem, params = setup
    r = solve(problem, params)
    save_checkpoint(tmp_path, r.state, problem, params)   # gen 0
    save_checkpoint(tmp_path, r.state, problem, params)   # gen 1 (backup 0)
    meta = json.loads((tmp_path / "checkpoint.json").read_text())
    assert meta["current"] == 1 and meta["backup"] == 0
    # corrupt the current generation
    (tmp_path / "checkpoint_1.npz").write_bytes(b"garbage" * 10)
    state = load_checkpoint(tmp_path, problem, params)
    for a, b in zip(_state_arrays(r.state), _state_arrays(state)):
        np.testing.assert_array_equal(a, b)
    # corrupt both -> hard error, not silent cold start
    (tmp_path / "checkpoint_0.npz").write_bytes(b"garbage")
    with pytest.raises(RuntimeError, match="corrupt checkpoint"):
        load_checkpoint(tmp_path, problem, params)


def test_checkpoint_write_failure_retries_then_raises(setup, tmp_path,
                                                      monkeypatch):
    """Write failures retry (save_checkpoint.cxx:67-100) then raise."""
    problem, params = setup
    r = solve(problem, params)
    calls = {"n": 0}
    orig = np.savez

    def failing(path, **kw):
        calls["n"] += 1
        raise OSError("disk full")

    monkeypatch.setattr(np, "savez", failing)
    with pytest.raises(OSError):
        save_checkpoint(tmp_path, r.state, problem, params, retries=3)
    assert calls["n"] == 3
    monkeypatch.setattr(np, "savez", orig)


def test_readonly_output_dir_fails(tmp_path):
    """Write into a read-only output directory fails loudly
    (`sdpb.test.cxx:40-46`)."""
    if os.geteuid() == 0:
        pytest.skip("running as root: chmod cannot enforce read-only")
    ro = tmp_path / "out"
    ro.mkdir()
    ro.chmod(0o555)
    from sdpb_tpu.io.output import IterationsJsonWriter

    with pytest.raises(OSError):
        w = IterationsJsonWriter(ro / "iterations.json")
        w.write(None, total_time=0.0)


@pytest.mark.slow
def test_sigterm_drains_and_checkpoints(tmp_path):
    """SIGTERM mid-solve: exit 143, checkpoint on disk, restartable
    (`run.cxx:330-360`, `solve.cxx:101-107`)."""
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    proc = subprocess.Popen(
        [sys.executable, "-m", "sdpb_tpu.apps.sdpb",
         "-s", str(SDP_1D), "-o", str(out), "-c", str(ck),
         "-p", "212", "--maxIterations", "500",
         "--checkpointInterval", "0"],
        cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    # wait for the first checkpoint (proves iterations are running)
    deadline = time.time() + 400
    while time.time() < deadline:
        if (ck / "checkpoint.json").exists():
            break
        if proc.poll() is not None:
            pytest.fail(f"sdpb exited early:\n{proc.communicate()[0]}")
        time.sleep(1)
    else:
        proc.kill()
        pytest.fail("no checkpoint appeared within 400s")
    proc.send_signal(signal.SIGTERM)
    try:
        output, _ = proc.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        proc.kill()
        pytest.fail("sdpb did not drain SIGTERM within 120s")
    assert proc.returncode == 143, output
    assert (ck / "checkpoint.json").exists()
