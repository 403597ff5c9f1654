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
from sdpb_tpu.solver.data import bucketize, initial_bucketed_state
from sdpb_tpu.solver import bucket_iteration as bi
from sdpb_tpu.solver.params import SolverParams
from sdpb_tpu.mp import limb

params = SolverParams(precision=212, word_dtype="float32", max_iterations=1)
raw = read_sdp("/root/reference/test/data/end-to-end_tests/1d-constraints/output/sdp", k=6)
problem = bucketize(problem_from_raw(raw, dtype=jnp.float32, k=params.n_words))
state0 = initial_bucketed_state(problem, 1e20, 1e20)
res = bi.compute_residues(problem, state0)
s1, info1 = bi.compute_step(problem, state0, res, params, False)

mesh = Mesh(np.array(jax.devices()[:8]), (mesh_mod.AXIS,))
mpb = mesh_mod.shard_problem(problem, mesh)
ms0 = mesh_mod.initial_state(mpb, 1e20, 1e20)
mres = mesh_mod.compute_residues(mpb, ms0)
# compare residues first
import mpmath
ctx = mpmath.mp.clone(); ctx.prec = 300
def v(x): return limb.to_mpf(np.asarray(x), ctx)
print("gap single:", v(res.duality_gap), " mesh:", v(mres.duality_gap))
print("Perr single:", v(res.primal_error_P), " mesh:", v(mres.primal_error_P))
ms1, minfo1 = mesh_mod.compute_step(mpb, ms0, mres, params, False)
print("steps single:", float(np.asarray(info1.primal_step)), float(np.asarray(info1.dual_step)))
print("steps mesh  :", float(np.asarray(minfo1.primal_step)), float(np.asarray(minfo1.dual_step)))
print("mu single:", v(info1.mu), " mesh:", v(minfo1.mu))
hs1 = mesh_mod.unshard_state(ms1, mpb)
for name, a, b in [("x0", s1.x[0], hs1.x[0]), ("y", s1.y, hs1.y),
                   ("X0e", s1.X[0][0], hs1.X[0][0]), ("Y0e", s1.Y[0][0], hs1.Y[0][0])]:
    aa, bb = np.asarray(a), np.asarray(b)
    flat_a = aa.reshape(-1, aa.shape[-1]); flat_b = bb.reshape(-1, bb.shape[-1])
    worst = 0.0; wi = -1
    for i in range(flat_a.shape[0]):
        va, vb = v(flat_a[i]), v(flat_b[i])
        d = abs(va - vb) / max(abs(va), mpmath.mpf(1e-30))
        if d > worst: worst, wi = d, i
    print(name, "worst rel diff:", float(worst), "at", wi)
