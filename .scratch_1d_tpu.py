import jax, numpy as np, jax.numpy as jnp, pathlib, time
print("backend:", jax.default_backend())
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.solver import problem_from_raw, SolverParams, solve
from sdpb_tpu.solver.data import bucketize
DATA = pathlib.Path("/root/reference/test/data/end-to-end_tests/1d/output")
params = SolverParams(precision=400, max_iterations=200, word_dtype="float32")
raw = read_sdp(DATA / "sdp", k=9)
problem = bucketize(problem_from_raw(raw, dtype=jnp.float32, k=params.n_words))
t0 = time.time()
res = solve(problem, params, verbose=True)
print("reason:", res.reason, "iters:", len(res.iterations), "t=", time.time()-t0)
print("primal:", res.primal_objective[:60])
print("dual  :", res.dual_objective[:60])
