"""`sdpb` CLI: solve an SDP directory, reference-compatible flags.

Mirrors `src/sdpb/main.cxx` + `SDPB_Parameters.cxx:22-73` +
`Solver_Parameters/Solver_Parameters.cxx:10-157` (same names and
defaults).  Outputs: out/out.txt, out/y.txt, out/x_<i>.txt,
out/iterations.json, out/c_minus_By/c_minus_By.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import signal
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sdpb",
        description="TPU-native SDPB: arbitrary-precision SDP solver "
                    "for polynomial matrix programs")
    p.add_argument("-s", "--sdpDir", required=True,
                   help="Directory (or .zip) containing the SDP")
    p.add_argument("-o", "--outDir", default=None,
                   help="Output directory (default: <sdpDir sibling>/out)")
    p.add_argument("-p", "--precision", type=int, default=400,
                   help="Binary precision (bits)")
    p.add_argument("--maxIterations", type=int, default=500)
    p.add_argument("--maxRuntime", type=float, default=2 ** 53)
    p.add_argument("--checkpointInterval", type=float, default=3600)
    p.add_argument("--maxSharedMemory", default="0",
                   help="Byte cap (optional K/M/G suffix) on the Q "
                        "residue window buffers: the exact integer "
                        "SYRK is tiled into row chunks that fit under "
                        "it, matching the reference's shared-memory "
                        "window splitting (bigint_syrk_blas.cxx:"
                        "195-222). 0 = no cap. The TOTAL allocation "
                        "is separately checked against auto-detected "
                        "device memory at startup (run.cxx:80-183).")
    p.add_argument("--dualityGapThreshold", default="1e-30")
    p.add_argument("--primalErrorThreshold", default="1e-30")
    p.add_argument("--dualErrorThreshold", default="1e-30")
    p.add_argument("--initialMatrixScalePrimal", default="1e20")
    p.add_argument("--initialMatrixScaleDual", default="1e20")
    p.add_argument("--feasibleCenteringParameter", default="0.1")
    p.add_argument("--infeasibleCenteringParameter", default="0.3")
    p.add_argument("--stepLengthReduction", type=float, default=0.7)
    p.add_argument("--minPrimalStep", default="0")
    p.add_argument("--minDualStep", default="0")
    p.add_argument("--maxComplementarity", default="1e100")
    p.add_argument("--findPrimalFeasible", action="store_true")
    p.add_argument("--findDualFeasible", action="store_true")
    p.add_argument("--detectPrimalFeasibleJump", action="store_true")
    p.add_argument("--detectDualFeasibleJump", action="store_true")
    p.add_argument("--writeSolution", default="x,y",
                   help="Comma-separated subset of x,y,z,X,Y")
    p.add_argument("--noFinalCheckpoint", action="store_true")
    p.add_argument("-c", "--checkpointDir", default=None)
    p.add_argument("-i", "--initialCheckpointDir", default=None)
    p.add_argument("--verbosity", type=int, default=1,
                   help="0=none, 1=regular, 2=debug, 3=trace")
    p.add_argument("--device", default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="auto (default): tpu when a chip is present, "
                        "else cpu. cpu: f64-word expansions "
                        "(correctly-rounded IEEE doubles). tpu: the "
                        "base-2^9 limb MP format (mp/limb.py) on the "
                        "VPU + the exact int8-MXU CRT pipeline for the "
                        "O(n^3) products -- full --precision support "
                        "(400-1024 bits and beyond), no caps.")
    # obsolete in the reference too (`SDPB_Parameters.cxx:22-73`);
    # accepted and ignored for compatibility
    p.add_argument("--procsPerNode", type=int, default=None,
                   help="[OBSOLETE] determined automatically")
    p.add_argument("--procGranularity", type=int, default=None,
                   help="[OBSOLETE]")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # CPU + x64: solver numerics need IEEE f64 words (conftest notes:
    # the TPU's f64 emulation is not correctly rounded; the TPU is used
    # via the integer ops path, not the driver loop word arithmetic).
    import jax

    # Multi-host: connect processes BEFORE any backend is touched
    # (reference: `Environment.cxx:63-85` MPI init + node topology;
    # here jax.distributed + one global mesh, with XLA lowering the
    # collectives over ICI within a slice and DCN across hosts).
    from ..parallel.multihost import maybe_init_distributed

    maybe_init_distributed()

    if args.device == "auto":
        # default to the TPU when a chip is present (`sdpb` is the
        # flagship CLI of a TPU-native framework); CPU otherwise
        try:
            backend = jax.default_backend()
        except RuntimeError:
            backend = "cpu"
        args.device = "tpu" if backend in ("tpu", "axon") else "cpu"

    word_dtype = "float64"
    if args.device == "cpu":
        # NB: must happen before any backend is touched; the solver's
        # f64-word arithmetic needs IEEE round-to-nearest f64, which
        # TPUs do not provide (f32-pair emulation without rounding).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    else:
        # TPU: the base-2^9 limb MP format (f32 storage, integer
        # semantics -- mp/limb.py) carries the FULL requested
        # precision; the reference's stock contract (precision 400,
        # initialMatrixScale 1e20, thresholds 1e-30,
        # `Solver_Parameters.cxx:74-92`) runs unmodified.
        word_dtype = "float32"
        try:
            backend = jax.default_backend()
        except RuntimeError:
            backend = "cpu"
        if backend not in ("tpu", "axon"):
            print("sdpb: no TPU backend registered; falling back to CPU "
                  "(still the limb format - identical numerics)",
                  file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("SDPB_TPU_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/sdpb_tpu_xla"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import pathlib

    from ..utils import ensure_map_count

    ensure_map_count()

    from ..io import output as out_io
    from ..io.sdp_json import read_sdp
    from ..solver import SolverParams, problem_from_raw, solve
    from ..solver.data import bucketize
    from ..solver.checkpoint import load_checkpoint, save_checkpoint

    params = SolverParams(
        precision=args.precision,
        max_iterations=args.maxIterations,
        max_runtime=args.maxRuntime,
        checkpoint_interval=args.checkpointInterval,
        duality_gap_threshold=args.dualityGapThreshold,
        primal_error_threshold=args.primalErrorThreshold,
        dual_error_threshold=args.dualErrorThreshold,
        initial_matrix_scale_primal=args.initialMatrixScalePrimal,
        initial_matrix_scale_dual=args.initialMatrixScaleDual,
        feasible_centering_parameter=args.feasibleCenteringParameter,
        infeasible_centering_parameter=args.infeasibleCenteringParameter,
        step_length_reduction=args.stepLengthReduction,
        min_primal_step=args.minPrimalStep,
        min_dual_step=args.minDualStep,
        max_complementarity=args.maxComplementarity,
        find_primal_feasible=args.findPrimalFeasible,
        find_dual_feasible=args.findDualFeasible,
        detect_primal_feasible_jump=args.detectPrimalFeasibleJump,
        detect_dual_feasible_jump=args.detectDualFeasibleJump,
        word_dtype=word_dtype,
        max_shared_memory=str(args.maxSharedMemory),
    )

    sdp_dir = pathlib.Path(args.sdpDir)
    out_dir = pathlib.Path(args.outDir) if args.outDir else \
        sdp_dir.parent / "out"
    ck_dir = pathlib.Path(args.checkpointDir) if args.checkpointDir else \
        sdp_dir.parent / "ck"

    t_start = time.time()
    # decimal data is always parsed into f64 words first (exact); the
    # limb path then converts exactly via raw_to_dtype
    k_read = params.n_words if word_dtype == "float64" else \
        max(2, -(-args.precision // 53)) + 1
    raw = read_sdp(sdp_dir, k=k_read)
    import jax.numpy as jnp

    problem = bucketize(problem_from_raw(
        raw, dtype=jnp.dtype(word_dtype), k=params.n_words))

    # Fail fast on memory before any device allocation mid-solve
    # (`run.cxx:80-183`): predicted per-device bytes vs the device
    # memory; --maxSharedMemory caps the Q residue windows (tiling),
    # exactly the reference's semantics.
    from ..solver.memory import (MemoryLimitError, check_memory_limit,
                                 intra_would_fit)

    use_intra = False
    try:
        check_memory_limit(problem,
                           n_devices=max(1, len(jax.devices())),
                           verbose=args.verbosity >= 2,
                           q_bytes_cap=args.maxSharedMemory)
    except MemoryLimitError as e:
        # Over per-device limit: route through intra-block model
        # parallelism (row-sharded blocks over the mesh,
        # parallel.intra_solver -- the reference's multi-rank
        # El::Grid blocks, Block_Map.hxx:8-14) when sharding the
        # per-block state would cure it; otherwise abort as before.
        n_dev_all = max(1, len(jax.devices()))
        import os as _os

        limit = _os.environ.get("SDPB_TPU_DEVICE_MEMORY") or None
        from ..solver.memory import detect_device_memory

        lim = limit or detect_device_memory()
        if n_dev_all > 1 and intra_would_fit(problem, lim, n_dev_all):
            use_intra = True
            if args.verbosity >= 1:
                print("memory: blocks exceed one device; using "
                      "intra-block row sharding over "
                      f"{n_dev_all} devices")
        else:
            print(f"sdpb: {e}", file=sys.stderr)
            return 1

    # Multi-chip: shard the block axis over every visible device
    # (the reference's block data-parallelism over MPI ranks).
    # host_problem stays unsharded for checkpoint/solution IO.
    host_problem = problem
    mesh_mod = None
    n_dev = len(jax.devices())
    if use_intra:
        from jax.sharding import Mesh as _Mesh

        import numpy as _np

        from ..parallel import intra_solver

        imesh = _Mesh(_np.array(jax.devices()),
                      (intra_solver.AXIS,))
        problem = intra_solver.IntraProblem(
            problem_from_raw(raw, dtype=jnp.dtype(word_dtype),
                             k=params.n_words), imesh)
    elif n_dev > 1:
        from jax.sharding import Mesh

        from ..parallel import mesh as mesh_mod
        from ..solver import placement

        import numpy as _np

        # Cost-based placement (`compute_block_grid_mapping.hxx`):
        # block_timings from a previous run if present, else the flop
        # model (NOT a measured pre-pass: within a shape bucket every
        # block executes the same SPMD program, so a timing run can
        # only ever measure bucket_time/nb -- uniform costs that LPT
        # cannot improve on -- while costing two full unsharded
        # iterations that may not even fit one device).
        costs = placement.read_block_costs(
            ck_dir, sdp_dir, host_problem.num_blocks,
            problem=host_problem)
        costs_by_bucket = [[costs[j] for j in bk.block_indices]
                           for bk in host_problem.buckets]
        mesh = Mesh(_np.array(jax.devices()), (mesh_mod.AXIS,))
        problem = mesh_mod.shard_problem(problem, mesh,
                                         costs=costs_by_bucket)
        if args.verbosity >= 1:
            loads = placement.bucket_loads(host_problem, costs, n_dev)
            print(f"sharding blocks over {n_dev} devices "
                  f"(imbalance {placement.imbalance(loads):.3f})")
    if args.verbosity >= 1:
        dims = sum(bk.nb * bk.shape.schur_size
                   for bk in host_problem.buckets)
        print(f"SDPB-TPU started at {time.strftime('%Y-%m-%d %H:%M:%S')}")
        print(f"SDP directory   : {sdp_dir}")
        print(f"out directory   : {out_dir}")
        print(f"\tprimal dimension: {dims}\n"
              f"\tdual dimension: {host_problem.dual_dim}\n"
              f"\tSDP blocks: {host_problem.num_blocks}")

    state = None
    if use_intra and (args.initialCheckpointDir
                      or (ck_dir / "checkpoint.json").exists()):
        print("sdpb: checkpoint restart into the intra-block path is "
              "not supported yet; starting cold", file=sys.stderr)
    elif args.initialCheckpointDir or (ck_dir / "checkpoint.json").exists():
        ck_in = pathlib.Path(args.initialCheckpointDir or ck_dir)
        state = load_checkpoint(ck_in, host_problem, params)
        if state is not None:
            if mesh_mod is not None:
                state = mesh_mod.shard_state(state, problem)
            if args.verbosity >= 1:
                print(f"Loaded checkpoint from {ck_in}")

    # SIGTERM drain (`Environment.cxx:12-18`, `run.cxx:330-360`)
    sigterm = {"flag": False}

    def _on_sigterm(signum, frame):
        sigterm["flag"] = True

    old_handler = signal.signal(signal.SIGTERM, _on_sigterm)

    rank0 = jax.process_index() == 0

    class _NullWriter:
        def write(self, *a, **kw):
            pass

        def close(self):
            pass

    # rank 0 owns all file output (the reference gathers to rank 0 and
    # writes there, `save_solution.cxx:8`)
    it_writer = out_io.IterationsJsonWriter(out_dir / "iterations.json") \
        if rank0 else _NullWriter()
    last_ck = {"t": time.time()}

    def hook(rec, cur_state):
        it_writer.write(rec, total_time=time.time() - t_start)
        if args.verbosity >= 1 and rank0:
            import mpmath as _mp

            def _sci(dec):
                try:
                    return f"{float(_mp.mpf(dec)):.3e}"
                except (ValueError, OverflowError):
                    return dec[:10]
            print(f"it {rec.iteration:3d} mu={_sci(rec.mu):>10} "
                  f"gap={_sci(rec.duality_gap):>10} "
                  f"steps=({rec.primal_step:.4f},{rec.dual_step:.4f})")
        if time.time() - last_ck["t"] >= params.checkpoint_interval:
            if rank0:
                save_checkpoint(ck_dir, _host_state(cur_state),
                                host_problem, params)
            last_ck["t"] = time.time()
        if sigterm["flag"]:
            # drain: write a final checkpoint, then unwind
            # (`run.cxx:330-360`, `solve.cxx:101-107`)
            if rank0:
                save_checkpoint(ck_dir, _host_state(cur_state),
                                host_problem, params)
            raise KeyboardInterrupt("SIGTERM")

    def _host_state(st):
        if mesh_mod is not None:
            return mesh_mod.unshard_state(st, problem)
        if use_intra:
            # strip the intra path's row padding and repack the
            # per-block SolverState into the BucketedState layout the
            # IO layer expects (host_problem is bucketized)
            import numpy as _np

            from ..solver.data import BucketedState as _BS

            blocks = problem.blocks

            def blk(i, which, p):
                bl = blocks[i]
                n_p = bl.shape.psd_size(p)
                arr = _np.asarray((st.X if which == "X" else st.Y)[i][p])
                return arr[:n_p, :n_p]

            x, X, Y = [], [], []
            for bk in host_problem.buckets:
                idxs = list(bk.block_indices)
                x.append(jnp.asarray(_np.stack(
                    [_np.asarray(st.x[j]) for j in idxs])))
                X.append(tuple(jnp.asarray(_np.stack(
                    [blk(j, "X", p) for j in idxs])) for p in range(2)))
                Y.append(tuple(jnp.asarray(_np.stack(
                    [blk(j, "Y", p) for j in idxs])) for p in range(2)))
            return _BS(x=x, y=jnp.asarray(_np.asarray(st.y)), X=X, Y=Y)
        return st

    from ..utils.timers import Timers, Verbosity, rotate_profiling_dir

    timers = Timers(Verbosity(min(args.verbosity, 3)))

    def write_profiling():
        """ck.profiling/profiling.<rank> at debug+ verbosity
        (`sdpb/main.cxx:118-137`, rank is always 0 here: one host
        process drives the whole mesh)."""
        if args.verbosity >= 2:
            prof_dir = rotate_profiling_dir(
                ck_dir.parent / (ck_dir.name + ".profiling"))
            timers.write_profile(prof_dir / "profiling.0")
            if timers.max_mem_used:
                print(f"max MemUsed: {timers.max_mem_used / 2**30:.2f} GB "
                      f"at {timers.max_mem_used_name}")

    def write_block_timings():
        """ck/block_timings: per-block flop-model costs for the
        placement pass (`write_timing.cxx` role; see
        placement.flop_model_costs for why these are not measured)."""
        from ..solver import placement

        ck_dir.mkdir(parents=True, exist_ok=True)
        costs = placement.flop_model_costs(host_problem)
        (ck_dir / "block_timings").write_text(
            "\n".join(str(max(1, int(c))) for c in costs) + "\n")

    try:
        with timers.scoped("sdpb.solve"):
            result = solve(problem, params, state=state,
                           iteration_hook=hook, timers=timers)
        write_block_timings()
        write_profiling()
    except Exception as e:
        from ..solver import NonFiniteIterateError

        if not isinstance(e, NonFiniteIterateError):
            raise
        it_writer.close()
        signal.signal(signal.SIGTERM, old_handler)
        print(f"sdpb: {e}", file=sys.stderr)
        return 1
    except KeyboardInterrupt:
        it_writer.close()
        signal.signal(signal.SIGTERM, old_handler)
        if args.verbosity >= 1:
            print("SIGTERM received; checkpoint written")
        return 143
    finally:
        signal.signal(signal.SIGTERM, old_handler)

    it_writer.close()
    runtime = int(time.time() - t_start)

    final_state = _host_state(result.state)
    result = dataclasses.replace(result, state=final_state)
    if rank0 and not args.noFinalCheckpoint:
        save_checkpoint(ck_dir, final_state, host_problem, params)
    if rank0:
        out_io.save_solution(out_dir, result, host_problem, runtime,
                             write_solution=args.writeSolution,
                             normalization=raw.normalization)
        out_io.save_c_minus_By(out_dir / "c_minus_By" / "c_minus_By.json",
                               host_problem, final_state.y)
    if args.verbosity >= 1 and rank0:
        print(f"terminateReason = \"{result.reason.value}\"")
        print(f"primalObjective = {result.primal_objective[:50]}...")
        print(f"Solver runtime  = {runtime}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
