"""Cost-based block placement and the measured timing run.

The reference assigns PMP blocks to MPI process groups by cost-based
bin packing (`sdpb_util/block_mapping/compute_block_grid_mapping.hxx`,
LPT/Worst-Fit-First over per-block costs), where the costs come from a
2-iteration measured timing run (`sdpb/main.cxx:85-150`,
`write_timing.cxx`) written to `ck/block_timings` and re-read on
restart (`Block_Info/read_block_costs.cxx`), falling back to block_data
file sizes.

TPU-native mapping: blocks of one shape-bucket are SPMD-sharded over
the mesh's block axis, so within a bucket every device holds
ceil(nb/n_dev) blocks of identical compiled cost -- the reference's
load-balancing concern reduces to (a) which blocks share a device when
measured costs differ (LPT permutation of the bucket axis, applied by
`parallel.mesh.shard_problem`), and (b) distributing heterogeneous
work-items over host workers (pmp2sdp input files, spectrum blocks),
which reuses the same LPT.  Costs are measured per bucket by timing the
per-bucket kernels of a real iteration (first iteration discarded:
cold-start zeros are artificially fast, exactly the reference's note in
`sdpb/main.cxx`), divided per block.
"""

from __future__ import annotations

import pathlib
import time

import numpy as np


# ---------------------------------------------------------------------------
# LPT / bin-packing primitives (`LPT_scheduling.hxx`,
# `compute_block_grid_mapping.hxx`)
# ---------------------------------------------------------------------------

def lpt_assign(costs, n_bins: int, capacity: int | None = None):
    """Longest-Processing-Time-first assignment of items to bins.

    Sort items by descending cost, place each in the least-loaded bin
    (respecting an optional per-bin item-count ``capacity``).  Returns
    (bin_of_item int array, bin_loads float array).  This is the
    reference's LPT scheduler (`blas_jobs/LPT_scheduling.hxx`) and the
    core of its block->process-group mapping."""
    costs = np.asarray(costs, dtype=np.float64)
    order = np.argsort(-costs, kind="stable")
    bin_of = np.zeros(len(costs), dtype=np.int64)
    loads = np.zeros(n_bins, dtype=np.float64)
    counts = np.zeros(n_bins, dtype=np.int64)
    for i in order:
        eligible = np.arange(n_bins) if capacity is None else \
            np.nonzero(counts < capacity)[0]
        b = eligible[np.argmin(loads[eligible])]
        bin_of[i] = b
        loads[b] += costs[i]
        counts[b] += 1
    return bin_of, loads


def imbalance(loads) -> float:
    """(max - mean) / mean of bin loads; the reference's figure of
    merit for a block mapping (perfect balance -> 0)."""
    loads = np.asarray(loads, dtype=np.float64)
    mean = loads.mean()
    if mean == 0:
        return 0.0
    return float((loads.max() - mean) / mean)


def bucket_device_permutation(costs, n_devices: int):
    """Permutation of one bucket's block axis so that shard_map's
    contiguous per-device chunks are LPT-balanced.

    ``costs``: per-block measured costs (length nb).  The bucket is
    padded to ceil(nb/n_dev)*n_dev by the mesh layer; each device takes
    one contiguous chunk of the permuted axis.  Phantom padding slots
    count as zero cost and land on the most loaded devices' chunks
    automatically (fewest real blocks).  Returns (perm, loads):
    ``perm[i]`` = original block position placed at padded slot i is
    NOT produced here -- this returns the order of original block
    positions (length nb) grouped by device."""
    costs = np.asarray(costs, dtype=np.float64)
    nb = len(costs)
    per_dev = -(-nb // n_devices)
    bin_of, loads = lpt_assign(costs, n_devices, capacity=per_dev)
    perm = np.concatenate([np.nonzero(bin_of == d)[0]
                           for d in range(n_devices)])
    return perm.astype(np.int64), loads


# ---------------------------------------------------------------------------
# Cost IO (`read_block_costs.cxx`, `write_timing.cxx`)
# ---------------------------------------------------------------------------

def read_block_costs(ck_dir, sdp_dir, num_blocks: int):
    """Per-block costs: `ck/block_timings` if present (one integer per
    line, block order), else block_data file sizes, else uniform
    (`Block_Info/read_block_costs.cxx:13` fallback chain)."""
    ck_dir = pathlib.Path(ck_dir) if ck_dir else None
    if ck_dir is not None:
        f = ck_dir / "block_timings"
        if f.exists():
            vals = [int(line) for line in f.read_text().split()]
            if len(vals) == num_blocks:
                return np.asarray(vals, dtype=np.float64)
    sdp_dir = pathlib.Path(sdp_dir) if sdp_dir else None
    if sdp_dir is not None and sdp_dir.is_dir():
        sizes = []
        for j in range(num_blocks):
            for suffix in (".bin", ".json"):
                f = sdp_dir / f"block_data_{j}{suffix}"
                if f.exists():
                    sizes.append(f.stat().st_size)
                    break
            else:
                sizes = None
                break
        if sizes:
            return np.asarray(sizes, dtype=np.float64)
    return np.ones(num_blocks, dtype=np.float64)


def write_block_timings(ck_dir, problem, costs) -> None:
    """ck/block_timings in the reference's format: one integer
    (microseconds here) per block, in block-index order
    (`write_timing.cxx`)."""
    ck_dir = pathlib.Path(ck_dir)
    ck_dir.mkdir(parents=True, exist_ok=True)
    pairs = []
    for bi, bk in enumerate(problem.buckets):
        for pos, j in enumerate(bk.block_indices):
            pairs.append((j, costs[bi][pos]))
    pairs.sort()
    (ck_dir / "block_timings").write_text(
        "\n".join(str(max(1, int(c * 1e6))) for _, c in pairs) + "\n")


# ---------------------------------------------------------------------------
# Measured timing run (`sdpb/main.cxx:85-150`)
# ---------------------------------------------------------------------------

def measure_block_costs(problem, params, n_iterations: int = 2):
    """Run ``n_iterations`` real interior-point iterations timing each
    bucket's kernels synchronously; return per-bucket lists of
    per-block costs (seconds).  The last iteration's times are used
    (iteration 1 is discarded: X = Omega I and x = 0 make the first
    pass artificially regular, the reference discards it for the same
    reason).  Blocks within a bucket share one SPMD kernel, so their
    measured cost is the bucket time divided evenly -- which is also
    the truth: identical shapes execute identical programs."""
    import jax

    from . import bucket_iteration as bi
    from .data import initial_bucketed_state

    state = initial_bucketed_state(
        problem, float(params.initial_matrix_scale_primal),
        float(params.initial_matrix_scale_dual))

    bucket_times = None
    for _ in range(max(1, n_iterations)):
        bucket_times = [0.0] * len(problem.buckets)

        def timed(bi_, fn, *args):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            bucket_times[bi_] += time.time() - t0
            return out

        # residues phase, per bucket
        parts = []
        for i, bk in enumerate(problem.buckets):
            parts.append(timed(i, bi._residues_bucket, bk, state.x[i],
                               tuple(state.X[i]), tuple(state.Y[i]),
                               state.y))
        (primal_objective, dual_objective, duality_gap, dual_error,
         primal_error_P, primal_error_p, primal_res_p) = \
            bi._residues_combine(
                problem.objective_const, problem.b, state.y,
                tuple(p[8] for p in parts), tuple(p[9] for p in parts),
                tuple(p[6] for p in parts), tuple(p[7] for p in parts))
        res = bi.Residues(primal_objective, dual_objective, duality_gap,
                          dual_error, primal_error_P, primal_error_p,
                          [p[0] for p in parts], [p[1] for p in parts],
                          [p[2] for p in parts], [p[3] for p in parts],
                          [p[4] for p in parts], [p[5] for p in parts],
                          primal_res_p)
        # Schur factorization, per bucket (the Q restore/Cholesky is
        # global; charge it to no bucket)
        plan = bi.q_plan(problem)
        k = problem.b.shape[-1]
        L_S, LinvB, e_cols, fins = [], [], [], []
        import jax.numpy as jnp
        for i, bk in enumerate(problem.buckets):
            ls, lb = timed(i, bi._schur_chol_bucket, bk, res.ax[i],
                           res.ay[i])
            L_S.append(ls)
            LinvB.append(lb)
            e, f = bi._col_exponents(lb)
            e_cols.append(e)
            fins.append(f)
        e_col, fin = e_cols[0], fins[0]
        for e, f in zip(e_cols[1:], fins[1:]):
            e_col = jnp.maximum(e_col, e)
            fin = fin & f
        q_sum = None
        for i in range(len(problem.buckets)):
            q_res = timed(i, bi._q_residues_bucket, LinvB[i], e_col, plan)
            q_sum = q_res if q_sum is None else q_sum + q_res
        bi._q_restore_cholesky(q_sum, e_col, fin, plan, k, problem.b)

        # one full step advances the state so iteration 2 is warm
        state, _info = bi.compute_step(problem, state, res, params, False)
        jax.block_until_ready(state.y)

    return [[bucket_times[i] / bk.nb] * bk.nb
            for i, bk in enumerate(problem.buckets)]
