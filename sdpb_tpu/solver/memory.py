"""Per-device memory estimation and fail-fast limit checks.

The reference predicts its per-node BigFloat allocation before the
solver runs (`SDP_Solver/run/run.cxx:80-183`,
`sdp_solve/memory_estimates.hxx`, `sdpb_util/memory_estimates.cxx`) so
an oversized problem aborts with a per-component allocation message
instead of dying mid-solve; the prediction also auto-sizes the shared
memory windows against `--maxSharedMemory` / /proc/meminfo.

TPU-native equivalent: predict the HBM-resident MP arrays of one
interior-point iteration per device (state + factorizations + search
direction + the integer Q pipeline's digit/residue/restore buffers),
compare against the device memory (or an explicit --maxSharedMemory
cap), and raise a diagnostic error at startup rather than letting XLA
OOM mid-solve.  The accounting mirrors the reference's component list
(#(X)-multiples + pairings + S + B + Q, `run.cxx:98-160`) with the
CRT-pipeline buffers replacing the MPI shared windows.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import numpy as np


class MemoryLimitError(RuntimeError):
    """Predicted per-device allocation exceeds the memory limit."""


def parse_bytes(text) -> int:
    """Parse '100.1K' / '2G' / '1024' byte strings (the reference's
    `String_To_Bytes_Translator.hxx`: optional float + B/K/M/G/T suffix,
    case-insensitive).  Returns 0 for 0/empty (meaning 'auto')."""
    if isinstance(text, (int, float)):
        return int(text)
    s = str(text).strip()
    if not s:
        return 0
    m = re.fullmatch(r"([0-9]*\.?[0-9]+)\s*([bBkKmMgGtT]?)[bB]?", s)
    if not m:
        raise ValueError(f"cannot parse byte size: {text!r}")
    mult = {"": 1, "b": 1, "k": 2 ** 10, "m": 2 ** 20,
            "g": 2 ** 30, "t": 2 ** 40}[m.group(2).lower()]
    return int(float(m.group(1)) * mult)


def format_bytes(n: int) -> str:
    for unit, w in (("GB", 2 ** 30), ("MB", 2 ** 20), ("KB", 2 ** 10)):
        if n >= w:
            return f"{n / w:.2f} {unit}"
    return f"{n} B"


@dataclasses.dataclass
class MemoryEstimate:
    """Per-device predicted allocation, by component (bytes)."""

    components: dict
    n_devices: int

    @property
    def total(self) -> int:
        return sum(self.components.values())

    def message(self, limit: int | None = None) -> str:
        """Reference-style allocation report
        (`print_allocation_message_per_node`, `memory_estimates.cxx`)."""
        lines = [f"Predicted memory allocation per device "
                 f"({self.n_devices} device(s)):"]
        for name, b in sorted(self.components.items(),
                              key=lambda kv: -kv[1]):
            lines.append(f"  {name:<28} {format_bytes(b):>12}")
        lines.append(f"  {'total':<28} {format_bytes(self.total):>12}")
        if limit:
            lines.append(f"  {'limit':<28} {format_bytes(limit):>12}")
        return "\n".join(lines)


def _q_plan_dims(problem):
    """(n_primes, n_digits, out_planes, total_rows) of the Q pipeline's
    CrtPlan for this problem (see bucket_iteration.q_plan)."""
    from ..ops import mpmm

    k = problem.b.shape[-1]
    total_rows = sum(bk.nb * bk.shape.schur_size for bk in problem.buckets)
    plan = mpmm.plan_for(mpmm.precision_of(problem.b.dtype, k), total_rows)
    return plan.n_primes, plan.n_digits, plan.out_planes, total_rows


def estimate_solver_memory(problem, n_devices: int = 1,
                           q_bytes_cap: int | None = None) -> MemoryEstimate:
    """Predict the peak per-device HBM footprint of one bucketed
    interior-point iteration.

    ``problem`` needs only shape metadata: `.buckets[i].nb/.shape`,
    `.b.shape`, `.b.dtype` (a BucketedProblem or MeshProblem).  Block
    counts are divided over ``n_devices`` rounding up (phantom-block
    padding), mirroring how `parallel.mesh.shard_problem` pads; Q and
    dy are replicated, as in the mesh path.

    ``q_bytes_cap``: --maxSharedMemory cap on the Q residue pipeline's
    per-call digit/residue buffers (the solver tiles the exact SYRK to
    respect it, `bucket_iteration.q_block_chunk`); the estimate's
    pipeline component is reduced accordingly.
    """
    k = int(problem.b.shape[-1])
    n = int(problem.b.shape[0])
    word = np.dtype(problem.b.dtype).itemsize
    mp_item = k * word

    comp = {key: 0 for key in (
        "state X,Y + step dX,dY", "Cholesky L_X,L_Y", "minus_XY, R, Z",
        "bilinear pairings A_X_inv,A_Y", "Schur S + L_S",
        "B + schur_off_diagonal", "x, dx, residues", "problem data (c,B,q,u)",
    )}
    for bk in problem.buckets:
        nb = -(-bk.nb // n_devices)
        sh = bk.shape
        psd = sum(s * s for s in sh.psd_sizes)
        schur = sh.schur_size
        # X, Y, dX, dY (4) -- predictor's dXdY pair products alias dX/dY
        # peak-wise with the corrector's, count 2 extra transient pairs
        comp["state X,Y + step dX,dY"] += 6 * nb * psd * mp_item
        comp["Cholesky L_X,L_Y"] += 2 * nb * psd * mp_item
        comp["minus_XY, R, Z"] += 3 * nb * psd * mp_item
        # A_X_inv + A_Y: (m pts)^2 grids per parity
        pair = sum(2 * (sh.m * sh.pts) ** 2 for _ in range(2))
        comp["bilinear pairings A_X_inv,A_Y"] += nb * pair * mp_item
        comp["Schur S + L_S"] += 2 * nb * schur * schur * mp_item
        comp["B + schur_off_diagonal"] += 2 * nb * schur * n * mp_item
        comp["x, dx, residues"] += 4 * nb * schur * mp_item
        data = (schur + schur * n
                + sum(h * sh.pts for h in (sh.he, sh.ho))
                + sum((sh.m * h) * (sh.m * sh.pts) for h in (sh.he, sh.ho)))
        comp["problem data (c,B,q,u)"] += nb * data * mp_item

    # Q pipeline (the reference's shared windows, `run.cxx:129-160`):
    # per-device digit tensor (rows_dev, N, D) int32 transient, split
    # residues 2x int8 (rows_dev, N, P), per-prime Q residues
    # (P, N, N) int32 (replicated; summed across devices via psum),
    # CRT planes (N, N, out_planes) int32, Q + L_Q MP.
    n_primes, n_digits, out_planes, total_rows = _q_plan_dims(problem)
    rows_dev = -(-total_rows // n_devices)
    per_row = n * (n_digits * 4 + 2 * n_primes)
    window = rows_dev * per_row
    if q_bytes_cap:
        # tiled to --maxSharedMemory: at least one worst-case block row
        worst = max(bk.shape.schur_size for bk in problem.buckets)
        window = min(window, max(worst * per_row, int(q_bytes_cap)))
    comp["Q residue pipeline (int)"] = (
        window
        + n_primes * n * n * 4
        + n * n * out_planes * 4)
    comp["Q + L_Q + dy"] = (2 * n * n + 2 * n) * mp_item
    return MemoryEstimate(components=comp, n_devices=n_devices)


def detect_device_memory() -> int | None:
    """Bytes of memory per device: HBM for TPU backends (via
    memory_stats when the runtime exposes it), MemAvailable for CPU
    (the reference reads /proc/meminfo, `Proc_Meminfo.hxx`)."""
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return None
    if dev.platform == "cpu":
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemAvailable:"):
                        return int(line.split()[1]) * 1024
        except OSError:
            return None
        return None
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    # v5e/v5p HBM floor when the plugin hides memory_stats
    return 16 * 2 ** 30


def check_memory_limit(problem, limit=None, n_devices: int = 1,
                       verbose: bool = False,
                       q_bytes_cap=None) -> MemoryEstimate:
    """Fail fast if the predicted allocation exceeds ``limit`` bytes.

    ``limit`` 0/None = auto-detect device memory (the
    SDPB_TPU_DEVICE_MEMORY env var overrides detection, for tests); no
    detection -> skip the check.  ``q_bytes_cap`` is the
    --maxSharedMemory window cap (shrinks the Q pipeline component via
    tiling; it is NOT a total-memory limit -- same semantics as the
    reference, `run.cxx:80-183` + `BigInt_Shared_Memory_Syrk_Context`
    window splitting).  Raises MemoryLimitError with the
    reference-style per-component report."""
    import os

    est = estimate_solver_memory(problem, n_devices=n_devices,
                                 q_bytes_cap=parse_bytes(q_bytes_cap or 0))
    limit = parse_bytes(limit) if limit else 0
    if not limit:
        env = os.environ.get("SDPB_TPU_DEVICE_MEMORY")
        limit = parse_bytes(env) if env else (detect_device_memory() or 0)
    if verbose:
        print(est.message(limit or None))
    if limit and est.total > limit:
        raise MemoryLimitError(
            f"predicted allocation {format_bytes(est.total)} per device "
            f"exceeds the limit {format_bytes(limit)}\n" + est.message(limit))
    return est


def intra_would_fit(problem, limit, n_devices: int) -> bool:
    """Would row-sharding each block's PSD-sized state over
    ``n_devices`` (parallel.intra_solver) bring the footprint under
    ``limit``?  The intra path divides every PSD/Schur-sized persistent
    tensor by the device count while keeping one full-size transient
    alive at a time, so the estimate is total/n_devices plus the
    largest single component.  Used by the sdpb driver to route
    over-limit problems to the intra path instead of aborting
    (`Block_Map.hxx:8-14` role)."""
    limit = parse_bytes(limit) if limit else 0
    if not limit or n_devices < 2:
        return False
    est = estimate_solver_memory(problem, n_devices=1)
    biggest = max(est.components.values()) if est.components else 0
    return est.total // n_devices + biggest <= limit
