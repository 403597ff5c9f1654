"""Worker for the 2-process (DCN) mesh test: each process owns 4
virtual CPU devices; jax.distributed connects them into one 8-device
global mesh; the mesh driver runs 3 interior-point iterations on a
synthetic 2-bucket problem in the TPU word format (limb) and prints the
mu/step trajectory for the parent to compare against single-host.

Usage: python multihost_worker.py <num_processes> <process_id> <port>
(run with num_processes=1 for the single-host reference trajectory).
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    n_proc = int(sys.argv[1])
    pid = int(sys.argv[2])
    port = sys.argv[3]
    n_local = 8 // n_proc

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=n_proc, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from sdpb_tpu.mp import limb
    from sdpb_tpu.parallel import mesh as mesh_mod
    from sdpb_tpu.solver.data import (BucketedProblem, SDPBucket,
                                      block_shape_of, build_u)
    from sdpb_tpu.solver.driver import solve
    from sdpb_tpu.solver.params import SolverParams

    rng = np.random.default_rng(7)
    N = 6
    params = SolverParams(precision=140, word_dtype="float32",
                          max_iterations=3,
                          initial_matrix_scale_primal="1e2",
                          initial_matrix_scale_dual="1e2")
    k = params.n_words                 # ~80-bit limb format

    def mp_w(x):
        return limb.from_words_np(
            np.asarray(x, dtype=np.float64)[..., None], k)

    def synth_bucket(nb, m, pts):
        shape = block_shape_of(m, pts)
        q_e = rng.standard_normal((nb, shape.he, pts))
        q_o = rng.standard_normal((nb, shape.ho, pts))
        return SDPBucket(
            c=jnp.asarray(mp_w(rng.standard_normal(
                (nb, shape.schur_size)))),
            B=jnp.asarray(mp_w(rng.standard_normal(
                (nb, shape.schur_size, N)))),
            q=(jnp.asarray(mp_w(q_e)), jnp.asarray(mp_w(q_o))),
            u=(jnp.asarray(np.stack([build_u(mp_w(q_e[i]), m)
                                     for i in range(nb)])),
               jnp.asarray(np.stack([build_u(mp_w(q_o[i]), m)
                                     for i in range(nb)]))),
            shape=shape,
            block_indices=tuple(range(nb)),
        )

    problem = BucketedProblem(
        objective_const=jnp.asarray(mp_w(0.0)),
        b=jnp.asarray(mp_w(rng.standard_normal(N))),
        buckets=[synth_bucket(8, 2, 3), synth_bucket(3, 1, 2)],
    )
    mesh = Mesh(np.array(jax.devices()), (mesh_mod.AXIS,))
    mproblem = mesh_mod.shard_problem(problem, mesh)
    result = solve(mproblem, params)
    if pid == 0:
        for rec in result.iterations:
            print(f"TRAJ {rec.iteration} {rec.mu} "
                  f"{rec.primal_step:.12f} {rec.dual_step:.12f}",
                  flush=True)
        print("DONE", flush=True)


if __name__ == "__main__":
    main()
