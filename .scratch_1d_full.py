import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np, pathlib, time, json
from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import problem_from_raw, SolverParams, solve
from sdpb_tpu.solver.data import bucketize
DATA = pathlib.Path("/root/reference/test/data/end-to-end_tests/1d/output")
params = SolverParams(precision=400, max_iterations=200, word_dtype="float32")
print("slots:", params.n_words)
raw = read_sdp(DATA / "sdp", k=9)
problem = bucketize(problem_from_raw(raw, dtype=jnp.float32, k=params.n_words))
t0 = time.time()
res = solve(problem, params, verbose=True)
print("reason:", res.reason, "iters:", len(res.iterations), "t=", time.time()-t0)
print("primal:", res.primal_objective[:60])
print("dual  :", res.dual_objective[:60])
print("golden out.txt:")
print(open(DATA/"out"/"out.txt").read())
