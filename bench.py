"""Headline benchmark: exact high-precision SYRK throughput on TPU.

The reference's dominant kernel is the distributed bigint SYRK
Q = P^T P in 400+-bit arithmetic (`bigint_syrk/`, the v3.0.0 rewrite
that produced its >=2.5x speedup, Changelog.md:65-73).  This benchmark
times our TPU-native equivalent (sdpb_tpu.ops.exact: CRT residues ->
int8 MXU matmuls -> exact CRT restore) at 424-bit precision on a
Schur-complement-sized problem and reports effective 424-bit
multiply-accumulates per second.

Timing notes: on the axon-relayed TPU, block_until_ready does not wait
for remote execution, so completion is forced by fetching a scalar
reduction of the result; the measured fixed fetch overhead (a no-op
round trip) is subtracted.

vs_baseline: speedup over the same exact algorithm executed by XLA on
all cores of this host CPU (subprocess) - an apples-to-apples
algorithmic stand-in for the reference's per-node CRT+BLAS pipeline.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

BITS = 424
N_ROWS = 2048
N_COLS = 512
REPS = 6


def _timed(fn, args, reps):
    """Median wall time of scalar-fetch-synced calls."""
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]


def run_once(n, m, reps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdpb_tpu.ops import exact

    plan = exact.CrtPlan(bits=BITS, n_rows_max=max(4096, n))
    rng = np.random.default_rng(0)
    digits = jnp.asarray(rng.integers(-127, 128, (n, m, plan.n_digits)),
                         jnp.int32)

    def forward(d):
        r = exact.residues_split(d, plan)
        q = exact.syrk_residues_split(r, plan)
        return jnp.sum(exact.crt_restore_planes(q, plan)).astype(jnp.float32)

    def noop(d):
        return jnp.sum(d[:2, :2, :2]).astype(jnp.float32)

    f = jax.jit(forward)
    g = jax.jit(noop)
    float(f(digits))
    float(g(digits))
    overhead = _timed(g, (digits,), reps)
    total = _timed(f, (digits,), reps)
    return max(total - overhead, 1e-9), jax.default_backend()


def main():
    dt, backend = run_once(N_ROWS, N_COLS, REPS)
    macs = N_ROWS * N_COLS * N_COLS
    gmacs = macs / dt / 1e9

    vs = 0.0
    try:
        code = (
            "import sys; sys.path.insert(0, %r); "
            "import bench; dt,_ = bench.run_once(%d, %d, 3); print(dt)"
            % (os.path.dirname(os.path.abspath(__file__)), N_ROWS, N_COLS)
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=900)
        cpu_dt = float(out.stdout.strip().splitlines()[-1])
        vs = cpu_dt / dt
    except Exception:
        vs = 0.0

    print(json.dumps({
        "metric": f"exact_{BITS}bit_syrk_{backend}",
        "value": round(gmacs, 2),
        "unit": "G 424-bit MAC/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
