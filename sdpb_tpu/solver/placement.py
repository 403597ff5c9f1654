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
which reuses the same LPT.

Why there is NO measured timing run here (unlike `sdpb/main.cxx:85-150`):
within a shape bucket every block executes the same compiled SPMD
program, so a measurement can only produce bucket_time/nb -- uniform
per-block costs that the LPT permutation cannot improve on -- while the
reference-style 2-iteration pre-pass runs the whole problem unsharded
on one device (an OOM hazard for exactly the problems that need
sharding).  Per-block costs therefore come from the flop model
(`flop_model_costs`), which distinguishes buckets exactly as well as a
measurement would, or from `ck/block_timings` written by a previous
run.
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

    ``costs``: per-block costs (length nb).  The mesh layer pads the
    bucket to per_dev = ceil(nb/n_dev) blocks per device; each device
    takes one contiguous chunk of the permuted-then-padded axis.  The
    returned order is grouped by device WITH each device's group padded
    to exactly per_dev slots (-1 = phantom), so chunk boundaries always
    coincide with LPT bins -- without the explicit padding, an
    under-filled early bin would shift every later chunk boundary and
    the realized loads could be worse than unpermuted.  Returns
    (slots int array of length per_dev*n_devices with -1 phantoms,
    loads)."""
    costs = np.asarray(costs, dtype=np.float64)
    nb = len(costs)
    per_dev = -(-nb // n_devices)
    bin_of, loads = lpt_assign(costs, n_devices, capacity=per_dev)
    slots = np.full(per_dev * n_devices, -1, dtype=np.int64)
    for d in range(n_devices):
        mine = np.nonzero(bin_of == d)[0]
        slots[d * per_dev : d * per_dev + len(mine)] = mine
    return slots, loads


# ---------------------------------------------------------------------------
# Cost IO (`read_block_costs.cxx`, `write_timing.cxx`)
# ---------------------------------------------------------------------------

def read_block_costs(ck_dir, sdp_dir, num_blocks: int, problem=None):
    """Per-block costs: `ck/block_timings` if present (one integer per
    line, block order), else the flop model when ``problem`` is given,
    else block_data file sizes, else uniform
    (`Block_Info/read_block_costs.cxx:13` fallback chain, with the
    flop model replacing the measured run -- see module docstring)."""
    ck_dir = pathlib.Path(ck_dir) if ck_dir else None
    if ck_dir is not None:
        f = ck_dir / "block_timings"
        if f.exists():
            vals = [int(line) for line in f.read_text().split()]
            if len(vals) == num_blocks:
                return np.asarray(vals, dtype=np.float64)
    if problem is not None:
        return flop_model_costs(problem)
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
# Flop-model costs (replacing the reference's measured timing run; see
# module docstring)
# ---------------------------------------------------------------------------

def flop_model_cost_of(shape, dual_dim: int) -> float:
    """Per-block cost model: the per-iteration O(n^3) terms of one
    block -- S Cholesky/Trsm, bilinear pairings, XY products
    (`run.cxx` phase structure)."""
    s_ = shape.schur_size
    he, ho = shape.he, shape.ho
    m, pts = shape.m, shape.pts
    return float(s_ ** 3 + 2 * s_ * s_ * dual_dim
                 + 2 * (m * he) ** 3 + 2 * (m * ho) ** 3
                 + 2 * (m * pts) * (m * he) ** 2
                 + 2 * (m * pts) * (m * ho) ** 2)


def flop_model_costs(problem):
    """Per-block costs in block-index order for a BucketedProblem."""
    num_blocks = problem.num_blocks
    costs = np.zeros(num_blocks, dtype=np.float64)
    for bk in problem.buckets:
        c = flop_model_cost_of(bk.shape, problem.dual_dim)
        for j in bk.block_indices:
            costs[j] = c
    return costs


def bucket_loads(problem, costs, n_devices: int):
    """Realized per-device loads of the bucketed SPMD sharding: every
    bucket pads to ceil(nb/n_dev) blocks per device, so each device
    carries that many block-programs of the bucket's cost (phantoms
    cost the same as real blocks -- the honest number)."""
    loads = np.zeros(n_devices, dtype=np.float64)
    for bk in problem.buckets:
        per_dev = -(-bk.nb // n_devices) if bk.nb else 0
        c = flop_model_cost_of(bk.shape, problem.dual_dim)
        loads += per_dev * c
    return loads
