"""`approx_objective` CLI: perturbation-theory estimate of the
objective for nearby SDPs.

Mirrors `src/approx_objective/`:
- flags / defaults   <- `Approx_Parameters.cxx:16-92` (solutionDir
  defaults to "<sdp>_out", --linear skips the Schur setup,
  --writeSolverState caches factorizations as text files)
- linear term        <- `Approx_Objective/Approx_Objective.cxx:11-53`:
  d_obj = dconst + db.y + dc.x - x.dB.y
- quadratic term     <- `Approx_Objective.cxx:56-150` +
  `compute_dx_dy.cxx`: solve the Schur system for (dx, dy) from
  rhs (dB.y - dc, db - dB^T.x), then
  dd_obj = (db.dy + dc.dx - dx.dB.y - x.dB.dy)/2
- solver setup       <- `setup_solver.cxx` (rebuild X/Y Cholesky,
  pairings, S-Cholesky, L^-1 B, Q from the solution's X/Y matrices,
  or load cached solver state)
- output             <- `main.cxx:123-150`: JSON array of
  {path, objective, d_objective, dd_objective}

The factorizations reuse the solver's jitted phases
(`sdpb_tpu.solver.iteration.compute_residues` / `schur_factorize`).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _solve_schur(problem, L_S, LinvB, L_Q, dx, dy):
    """Solve {{S, -B}, {B^T, 0}} {dx, dy} = {rhs_x, rhs_y} in-place
    (`solve_schur_complement_equation.cxx:16-80`); same sequence as the
    solver's search_direction."""
    from ..mp import core as mp
    from ..mp import linalg as la

    dx = [la.solve_lower(L_S[i], d) for i, d in enumerate(dx)]
    for i in range(len(dx)):
        dy = mp.sub(dy, la.matvec(LinvB[i], dx[i], transpose=True))
    dy = la.cholesky_solve(L_Q, dy)
    dx = [la.solve_lower_t(L_S[i], mp.add(d, la.matvec(LinvB[i], dy)))
          for i, d in enumerate(dx)]
    return dx, dy


def _read_solution_vectors(solution_dir, problem, k):
    from ..io.text_io import read_text_vector

    x = [jnp.asarray(read_text_vector(
        Path(solution_dir) / f"x_{j}.txt", k))
        for j in range(len(problem.blocks))]
    y = jnp.asarray(read_text_vector(Path(solution_dir) / "y.txt", k))
    return x, y


def _read_solution_XY(solution_dir, problem, k):
    from ..io.text_io import read_text_matrix

    X, Y = [], []
    for j, bl in enumerate(problem.blocks):
        Xb, Yb = [], []
        for p in range(2):
            n = bl.shape.psd_size(p)
            if n == 0:
                Xb.append(jnp.zeros((0, 0, k)))
                Yb.append(jnp.zeros((0, 0, k)))
                continue
            Xb.append(jnp.asarray(read_text_matrix(
                Path(solution_dir) / f"X_matrix_{2 * j + p}.txt", k)))
            Yb.append(jnp.asarray(read_text_matrix(
                Path(solution_dir) / f"Y_matrix_{2 * j + p}.txt", k)))
        X.append(tuple(Xb))
        Y.append(tuple(Yb))
    return X, Y


def _d_sdp(raw_old, raw_new):
    """d_sdp = new - old on (const, b, c, B) (`Axpy.cxx`)."""
    from ..mp import core as mp

    assert raw_new.num_blocks == raw_old.num_blocks
    d_const = mp.sub(jnp.asarray(raw_new.objective_const),
                     jnp.asarray(raw_old.objective_const))
    d_b = mp.sub(jnp.asarray(raw_new.b), jnp.asarray(raw_old.b))
    d_c, d_B = [], []
    for bo, bn in zip(raw_old.blocks, raw_new.blocks):
        assert (bo.dim, bo.num_points) == (bn.dim, bn.num_points)
        d_c.append(mp.sub(jnp.asarray(bn.c), jnp.asarray(bo.c)))
        d_B.append(mp.sub(jnp.asarray(bn.B), jnp.asarray(bo.B)))
    return d_const, d_b, d_c, d_B


def approx_objective(problem, x, y, d_const, d_b, d_c, d_B,
                     factorizations=None):
    """Returns (objective, d_objective, dd_objective) as MP scalars.
    ``factorizations=None`` computes the linear approximation only."""
    from ..mp import core as mp
    from ..mp import linalg as la

    k = problem.b.shape[-1]
    dtype = problem.b.dtype

    objective = mp.add(problem.objective_const, mp.dot(problem.b, y, axis=0))

    # linear: dconst + db.y + sum_b (dc.x - x.dB.y)
    d_obj = mp.add(d_const, mp.dot(d_b, y, axis=0))
    for i in range(len(problem.blocks)):
        d_obj = mp.add(d_obj, mp.dot(d_c[i], x[i], axis=0))
        dBy = la.matvec(d_B[i], y)
        d_obj = mp.sub(d_obj, mp.dot(dBy, x[i], axis=0))

    dd_obj = mp.zeros((), k, dtype=dtype)
    if factorizations is not None:
        L_S, LinvB, L_Q = factorizations
        # rhs: dx = dB.y - dc ; dy = db - dB^T.x  (`compute_dx_dy.cxx`)
        dx_rhs = [mp.sub(la.matvec(d_B[i], y), d_c[i])
                  for i in range(len(problem.blocks))]
        dy_rhs = d_b
        for i in range(len(problem.blocks)):
            dy_rhs = mp.sub(dy_rhs, la.matvec(d_B[i], x[i], transpose=True))
        dx, dy = _solve_schur(problem, L_S, LinvB, L_Q, dx_rhs, dy_rhs)

        # dd = (db.dy + dc.dx - dx.dB.y - x.dB.dy)/2
        dd_obj = mp.dot(d_b, dy, axis=0)
        for i in range(len(problem.blocks)):
            dd_obj = mp.add(dd_obj, mp.dot(d_c[i], dx[i], axis=0))
            dBy = la.matvec(d_B[i], y)
            dd_obj = mp.sub(dd_obj, mp.dot(dBy, dx[i], axis=0))
            dBdy = la.matvec(d_B[i], dy)
            dd_obj = mp.sub(dd_obj, mp.dot(dBdy, x[i], axis=0))
        dd_obj = mp.mul_pow2(dd_obj, 0.5)

    total = mp.add(objective, mp.add(d_obj, dd_obj))
    return total, d_obj, dd_obj


def setup_factorizations(problem, X, Y, x, y):
    """Rebuild S-Cholesky, L^-1 B and Q-Cholesky from the solution
    (`setup_solver.cxx:153-224`, fresh-build branch)."""
    from ..solver import iteration
    from ..solver.data import SolverState

    state = SolverState(x=x, y=y, X=X, Y=Y)
    res = iteration.compute_residues(problem, state)
    return iteration.schur_factorize(problem, res)


def write_solver_state(solution_dir, factorizations) -> None:
    """Cache S-Cholesky, L^-1 B, Q-Cholesky as text blocks so later
    invocations skip the expensive setup (`write_solver_state.cxx`).
    NB: our Q factor is LOWER-triangular (the reference stores the
    UPPER factor); the file is for this framework's own round trip."""
    from ..io.output import write_matrix

    L_S, LinvB, L_Q = factorizations
    solution_dir = Path(solution_dir)
    for j in range(len(L_S)):
        write_matrix(solution_dir / f"schur_complement_cholesky_{j}.txt",
                     np.asarray(L_S[j]))
        write_matrix(solution_dir / f"schur_off_diagonal_{j}.txt",
                     np.asarray(LinvB[j]))
    write_matrix(solution_dir / "Q_cholesky.txt", np.asarray(L_Q))


def load_solver_state(solution_dir, problem, k):
    """Load the cached factorizations if present, else None
    (`setup_solver.cxx:160-174`)."""
    from ..io.text_io import read_text_matrix

    solution_dir = Path(solution_dir)
    if not (solution_dir / "Q_cholesky.txt").exists():
        return None
    L_S, LinvB = [], []
    for j in range(len(problem.blocks)):
        L_S.append(jnp.asarray(read_text_matrix(
            solution_dir / f"schur_complement_cholesky_{j}.txt", k)))
        LinvB.append(jnp.asarray(read_text_matrix(
            solution_dir / f"schur_off_diagonal_{j}.txt", k)))
    L_Q = jnp.asarray(read_text_matrix(solution_dir / "Q_cholesky.txt", k))
    return L_S, LinvB, L_Q


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="approx_objective",
        description="Quadratic perturbation estimate of SDP objectives")
    p.add_argument("--sdp", required=True, help="The solved SDP directory")
    p.add_argument("--precision", type=int, required=True)
    p.add_argument("--newSdp", default=None,
                   help="New SDP (or .nsv list) to approximate")
    p.add_argument("--solutionDir", default=None,
                   help="Directory with x_<i>.txt/y.txt (+ X/Y matrices "
                        "for quadratic); default '<sdp>_out'")
    p.add_argument("--linear", action="store_true",
                   help="Only the linear correction")
    p.add_argument("--writeSolverState", action="store_true")
    p.add_argument("--maxSharedMemory", default="0",
                   help="Accepted for compatibility (no-op on TPU)")
    p.add_argument("-v", "--verbosity", type=int, default=1)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..utils import ensure_map_count

    ensure_map_count()

    # f64-word arithmetic requires IEEE f64 -> CPU (see apps/sdpb.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from ..io.sdp_json import read_sdp
    from ..mp import decimal as mpdec
    from ..pmp.read import expand_nsv
    from ..solver.data import problem_from_raw
    from ..solver.params import SolverParams

    k = SolverParams(precision=args.precision).n_words
    sdp_path = Path(args.sdp)
    solution_dir = Path(args.solutionDir) if args.solutionDir else \
        sdp_path.parent / (sdp_path.name + "_out")

    raw = read_sdp(sdp_path, k=k)
    problem = problem_from_raw(raw)
    x, y = _read_solution_vectors(solution_dir, problem, k)

    factorizations = None
    if not args.linear:
        factorizations = load_solver_state(solution_dir, problem, k)
        if factorizations is None:
            X, Y = _read_solution_XY(solution_dir, problem, k)
            factorizations = setup_factorizations(problem, X, Y, x, y)
            if args.writeSolverState:
                write_solver_state(solution_dir, factorizations)
                if args.verbosity >= 1:
                    print(f"wrote solver state to {solution_dir}",
                          file=sys.stderr)
        elif args.verbosity >= 1:
            print(f"loaded solver state from {solution_dir}",
                  file=sys.stderr)

    results = []
    if args.newSdp:
        for path in expand_nsv(args.newSdp):
            raw_new = read_sdp(path, k=k)
            d = _d_sdp(raw, raw_new)
            total, d_obj, dd_obj = approx_objective(
                problem, x, y, *d, factorizations=factorizations)
            entry = {
                "path": str(path),
                "objective": mpdec.to_decimal(np.asarray(total)),
                "d_objective": mpdec.to_decimal(np.asarray(d_obj)),
            }
            if not args.linear:
                entry["dd_objective"] = mpdec.to_decimal(np.asarray(dd_obj))
            results.append(entry)

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
