import jax, time, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
print("backend:", jax.default_backend())
from sdpb_tpu.mp import limb, linalg as la, core as mp
from sdpb_tpu.solver import bucket_iteration as bi
from sdpb_tpu.solver.params import SolverParams
import bench
params = SolverParams(precision=400, word_dtype="float32")
problem, state = bench.build_problem(params)
res = bi.compute_residues(problem, state)
jax.block_until_ready(res.L_X)

def t(name, fn, *a):
    out = fn(*a); jax.block_until_ready(out); t0=time.time()
    out = fn(*a); jax.block_until_ready(out)
    print(f"{name:28s} {time.time()-t0:7.3f}s"); return out

plan = bi.q_plan(problem)
for bidx in range(2):
    bk = problem.buckets[bidx]
    print(f"-- bucket {bidx}: nb={bk.nb} schur={bk.shape.schur_size}")
    import functools
    S = t("S assembly", jax.jit(lambda bk_, ax, ay: bi._vblock(bk_, lambda bl, a, b: __import__('sdpb_tpu.solver.iteration', fromlist=['x'])._schur_complement_block(bl, list(a), list(b)), tuple(ax), tuple(ay))), bk, res.ax[bidx], res.ay[bidx])
    ls = t("cholesky(S)", jax.jit(la.cholesky), S)
    lb = t("solve_lower(ls, B)", jax.jit(la.solve_lower), ls, bk.B)
    qr = t("q residues", jax.jit(functools.partial(bi._q_residues_bucket, plan=plan)), lb, jnp.zeros((384,), jnp.int32))
