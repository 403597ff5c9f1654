"""Headline benchmark: interior-point solver iterations/s on TPU.

Times the FULL production iteration (residues -> Schur/Q via the exact
int8-MXU CRT pipeline -> predictor/corrector -> step) of the bucketed
f32-word solver on a production-scale synthetic SDP, and compares
against the identical code on all cores of this host CPU.  This is the
metric the reference optimizes (its v3.0.0 bigint_syrk rewrite bought
>=2.5x on exactly this loop, `Changelog.md:65-73`) measured the way the
reference measures it (iterations of `SDP_Solver::run`).

Workload: 2 shape-buckets, 64 PMP blocks, Schur sizes 96/240,
N = 384 dual dimension, 110-bit (5-word f32) arithmetic - an
nmax-scaled bootstrap shape (the bundled nmax6 regression is J=11,
pts<=31, N=20; this is ~8x that in every dimension).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
diagnostic lines (per-phase split, int8 MFU estimate) go to stderr.
"""

import json
import os
import subprocess
import sys
import time

K_WORDS = 5          # 110-bit f32 words
N_DUAL = 384
BUCKETS = [          # (nb, m, pts)
    (48, 2, 32),
    (16, 4, 24),
]
REPS = 3


def build_problem():
    import jax.numpy as jnp
    import numpy as np

    from sdpb_tpu.solver.data import (BucketedProblem, SDPBucket,
                                      block_shape_of, build_u,
                                      initial_bucketed_state)

    rng = np.random.default_rng(0)

    def mp_w(x):
        x = np.asarray(x, dtype=np.float32)
        out = np.zeros(x.shape + (K_WORDS,), np.float32)
        out[..., 0] = x
        return out

    buckets = []
    j0 = 0
    for nb, m, pts in BUCKETS:
        shape = block_shape_of(m, pts)
        q_e = rng.standard_normal((nb, shape.he, pts))
        q_o = rng.standard_normal((nb, shape.ho, pts))
        buckets.append(SDPBucket(
            c=jnp.asarray(mp_w(rng.standard_normal((nb, shape.schur_size)))),
            B=jnp.asarray(mp_w(rng.standard_normal(
                (nb, shape.schur_size, N_DUAL)))),
            q=(jnp.asarray(mp_w(q_e)), jnp.asarray(mp_w(q_o))),
            u=(jnp.asarray(np.stack([build_u(mp_w(q_e[i]), m)
                                     for i in range(nb)])),
               jnp.asarray(np.stack([build_u(mp_w(q_o[i]), m)
                                     for i in range(nb)]))),
            shape=shape,
            block_indices=tuple(range(j0, j0 + nb)),
        ))
        j0 += nb
    problem = BucketedProblem(
        objective_const=jnp.asarray(mp_w(0.0)),
        b=jnp.asarray(mp_w(rng.standard_normal(N_DUAL))),
        buckets=buckets,
    )
    state = initial_bucketed_state(problem, 100.0, 100.0)
    return problem, state


def run_once(reps):
    import jax
    import numpy as np

    # The container's sitecustomize imports jax at interpreter startup,
    # so JAX_PLATFORMS in a subprocess env is captured too early to
    # matter; the CPU baseline must force the platform via jax.config
    # (same pattern as tests/conftest.py).
    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    cache = os.environ.get("SDPB_TPU_COMPILE_CACHE",
                           os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from sdpb_tpu.solver import bucket_iteration as bi
    from sdpb_tpu.solver.params import SolverParams

    params = SolverParams(precision=110, word_dtype="float32",
                          initial_matrix_scale_primal="1e2",
                          initial_matrix_scale_dual="1e2")
    problem, state = build_problem()

    def iteration(st):
        res = bi.compute_residues(problem, st)
        new_state, info = bi.compute_step(problem, st, res, params, False)
        # force full completion through the tunnel: fetch scalars
        assert np.isfinite(float(np.asarray(info.primal_step)))
        float(np.asarray(new_state.y[0, 0]))
        return new_state

    state = iteration(state)      # warmup/compile (also advances state)
    times = []
    for _ in range(reps):
        t0 = time.time()
        state = iteration(state)
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2], jax.default_backend()


def _syrk_mfu(dt_iter):
    """stderr diagnostic: int8 MAC throughput of the Q syrk inside one
    iteration vs the chip's int8 peak (v5e ~394 TOPS)."""
    from sdpb_tpu.ops import mpmm
    from sdpb_tpu.solver.data import block_shape_of

    rows = sum(nb * block_shape_of(m, pts).schur_size
               for nb, m, pts in BUCKETS)
    plan = mpmm.plan_for(24 * K_WORDS, rows)
    macs = 3 * plan.n_primes * rows * N_DUAL * N_DUAL
    return macs, plan.n_primes


def main():
    dt, backend = run_once(REPS)
    its = 1.0 / dt

    vs = 0.0
    cpu_dt = None
    try:
        code = (
            "import sys; sys.path.insert(0, %r); "
            "import bench; dt,_ = bench.run_once(2); print('RES', dt)"
            % os.path.dirname(os.path.abspath(__file__))
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_FORCE_CPU="1")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=3000)
        for line in out.stdout.splitlines():
            if line.startswith("RES "):
                cpu_dt = float(line.split()[1])
        vs = cpu_dt / dt
    except Exception:
        vs = 0.0

    macs, n_primes = _syrk_mfu(dt)
    print(f"[bench] backend={backend} iter={dt*1e3:.0f} ms "
          f"cpu_iter={'%.0f ms' % (cpu_dt*1e3) if cpu_dt else 'n/a'}; "
          f"Q syrk: {n_primes} primes, {macs/1e9:.1f} G int8-MACs/iter "
          f"(~{macs/dt/394e12*100:.2f}% of v5e int8 peak if Q were the "
          f"whole iteration)", file=sys.stderr)
    print(json.dumps({
        "metric": f"solver_iters_per_s_110bit_{backend}",
        "value": round(its, 3),
        "unit": "iterations/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
