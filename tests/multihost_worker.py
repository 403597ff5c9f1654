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

    from sdpb_tpu.io.sdp_json import read_sdp
    from sdpb_tpu.parallel import mesh as mesh_mod
    from sdpb_tpu.solver import problem_from_raw
    from sdpb_tpu.solver.data import bucketize
    from sdpb_tpu.solver.driver import solve
    from sdpb_tpu.solver.params import SolverParams

    params = SolverParams(precision=212, word_dtype="float32",
                          max_iterations=3)
    raw = read_sdp(
        "/root/reference/test/data/end-to-end_tests/1d-constraints"
        "/output/sdp", k=6)
    problem = bucketize(problem_from_raw(
        raw, dtype=jnp.float32, k=params.n_words))
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
