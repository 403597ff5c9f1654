import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp, mpmath
from jax.sharding import Mesh
from sdpb_tpu.io.sdp_json import read_sdp
from sdpb_tpu.parallel import mesh as mesh_mod
from sdpb_tpu.solver import problem_from_raw
from sdpb_tpu.solver.data import bucketize, initial_bucketed_state
from sdpb_tpu.solver import bucket_iteration as bi
from sdpb_tpu.solver import iteration as it
from sdpb_tpu.solver.params import SolverParams
from sdpb_tpu.mp import core as mp, limb, decimal as mpdec
ctx = mpmath.mp.clone(); ctx.prec = 300
v = lambda w: mpdec.to_mpf(np.asarray(w), ctx)

params = SolverParams(precision=212, word_dtype="float32", max_iterations=1)
raw = read_sdp("/root/reference/test/data/end-to-end_tests/1d-constraints/output/sdp", k=6)
problem = bucketize(problem_from_raw(raw, dtype=jnp.float32, k=params.n_words))
state0 = initial_bucketed_state(problem, 1e20, 1e20)
res = bi.compute_residues(problem, state0)
# single search direction
plan = bi.q_plan(problem)
L_S, LinvB, L_Q = bi.schur_factorize(problem, res)
minus_XY, mu, R_error, tmc = bi.compute_xy_mu(problem, state0, np.asarray(params.max_complementarity_mp(problem.b.dtype)))
beta = jnp.asarray(params.predictor_beta(False, params.n_words, problem.b.dtype))
dx, dX, dy, dY = bi.search_direction(problem, state0, res, minus_XY, L_S, LinvB, L_Q, mp.mul(beta, mu), bi.zeros_like_XY(problem, state0))
print("single dy0:", v(np.asarray(dy)[0]))
print("single dX[0][0][0,0,0]:", v(np.asarray(dX[0][0])[0,0,0]))

mesh = Mesh(np.array(jax.devices()[:8]), (mesh_mod.AXIS,))
mpb = mesh_mod.shard_problem(problem, mesh)
ms0 = mesh_mod.initial_state(mpb, 1e20, 1e20)
mres = mesh_mod.compute_residues(mpb, ms0)
mL_S, mLinvB, mL_Q = mesh_mod.schur_factorize(mpb, mres)
mXY, mmu, mRe, mt = mesh_mod.compute_xy_mu(mpb, ms0, np.asarray(params.max_complementarity_mp(problem.b.dtype)))
mdx, mdX, mdy, mdY = mesh_mod.search_direction(mpb, ms0, mres, mXY, mL_S, mLinvB, mL_Q, mp.mul(beta, mmu), [tuple(jnp.zeros_like(ms0.X[i][p]) for p in range(2)) for i in range(1)])
print("mesh   dy0:", v(np.asarray(mdy)[0]))
print("mesh   dX[0][0] block0 [0,0]:", v(np.asarray(mdX[0][0])[0,0,0]))
# lambda kernels
lp, ld = mesh_mod._lambda_kernel(mesh, mpb.buckets[0].shape)(mpb.buckets[0].data, mpb.buckets[0].mask, mres.L_X[0], tuple(mdX[0]), mres.L_Y[0], tuple(mdY[0]))
print("mesh lambda_p:", v(np.asarray(lp)), " lambda_d:", v(np.asarray(ld)))
lp1, ld1 = bi._lambda_bucket(problem.buckets[0], res.L_X[0], tuple(dX[0]), res.L_Y[0], tuple(dY[0]))
print("single lambda_p:", v(np.asarray(lp1)), " lambda_d:", v(np.asarray(ld1)))
