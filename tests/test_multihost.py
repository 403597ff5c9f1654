"""Two-process (DCN-axis) mesh execution: the same global 8-device
mesh split across 2 jax.distributed processes must reproduce the
single-host trajectory exactly.

Reference: the MPI multi-node layer (`Environment.cxx:63-85`) and the
cross-node Q reduce (`restore_and_reduce.cxx:94-140`); here the two
CPU processes stand in for two hosts, and the int32 Q `psum` crosses
the process boundary (integer adds cannot round, so the trajectory is
bit-identical to single-host).
"""

import pathlib
import socket
import subprocess
import sys

import mpmath
import pytest

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(n_proc, timeout=2400):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(n_proc), str(pid),
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(n_proc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, (out[-2000:], err[-4000:])
        outs.append(out)
    traj = {}
    for line in outs[0].splitlines():
        if line.startswith("TRAJ "):
            _, it, mu, ps, ds = line.split()
            traj[int(it)] = (mu, float(ps), float(ds))
    assert traj, outs[0][-2000:]
    return traj


@pytest.mark.slow
def test_two_process_mesh_matches_single_host():
    single = _run(1)
    double = _run(2)
    assert set(single) == set(double) and len(single) == 3
    ctx = mpmath.mp.clone()
    ctx.prec = 150
    for it in single:
        mu1, ps1, ds1 = single[it]
        mu2, ps2, ds2 = double[it]
        # identical f32 limb kernels + exact int32 cross-process Q
        # reduction: trajectories agree to the step-length eigh noise
        assert abs(ctx.mpf(mu1) - ctx.mpf(mu2)) <= \
            abs(ctx.mpf(mu1)) * ctx.mpf(1e-6), it
        assert abs(ps1 - ps2) < 1e-5 and abs(ds1 - ds2) < 1e-5, it
