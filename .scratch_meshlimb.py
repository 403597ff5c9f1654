import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.parallel import mesh as mesh_mod
from sdpb_tpu.solver import problem_from_raw
from sdpb_tpu.solver.data import bucketize
from sdpb_tpu.solver.driver import solve, NonFiniteIterateError
from sdpb_tpu.solver.params import SolverParams

params = SolverParams(precision=212, word_dtype="float32", max_iterations=3)
raw = read_sdp("/root/reference/test/data/end-to-end_tests/1d-constraints/output/sdp", k=6)
problem = bucketize(problem_from_raw(raw, dtype=jnp.float32, k=params.n_words))
print("buckets:", [(bk.nb, bk.shape) for bk in problem.buckets])

# single-device reference
r1 = solve(problem, params)
for rec in r1.iterations: print("SINGLE", rec.iteration, rec.mu[:20], rec.primal_step, rec.dual_step)

mesh = Mesh(np.array(jax.devices()[:8]), (mesh_mod.AXIS,))
mp_ = mesh_mod.shard_problem(problem, mesh)
try:
    r2 = solve(mp_, params)
    for rec in r2.iterations: print("MESH  ", rec.iteration, rec.mu[:20], rec.primal_step, rec.dual_step)
except NonFiniteIterateError as e:
    print("MESH FAIL:", e)
