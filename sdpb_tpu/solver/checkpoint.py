"""Checkpoint save/load with the reference's semantics.

The reference writes binary per-rank dumps of the local blocks of
(x, X, y, Y), keeps two generations (current + backup), and commits via
an atomic rename of `checkpoint_new.json` -> `checkpoint.json` holding
generation numbers, version, and solver options
(`SDP_Solver/save_checkpoint.cxx:38-119`,
`load_checkpoint/load_checkpoint.cxx:13`).

Here a generation is one ``checkpoint_<gen>.npz`` file holding every
block's word array exactly (f64 words round-trip losslessly, the reason
the reference uses binary too); metadata carries generation numbers and
the solver parameters.  Layout is rank-count independent (unlike the
reference, which requires the same MPI layout to restart - our arrays
are global, so restarts can re-shard freely).  Retries on write failure
mirror `save_checkpoint.cxx:67-100`.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time

import jax.numpy as jnp
import numpy as np

from .data import SDPProblem, SolverState

_VERSION = "sdpb-tpu-0.1"


def _flatten_state(state) -> dict:
    """Keyed arrays for either state representation.  Bucketed states
    store per-bucket stacks (restart re-derives the same deterministic
    bucketization from the SDP, so keys line up)."""
    out = {"y": np.asarray(state.y)}
    for i, x in enumerate(state.x):
        out[f"x_{i}"] = np.asarray(x)
        for p in range(2):
            out[f"X_{i}_{p}"] = np.asarray(state.X[i][p])
            out[f"Y_{i}_{p}"] = np.asarray(state.Y[i][p])
    return out


def _n_groups(problem) -> int:
    return len(problem.buckets) if hasattr(problem, "buckets") else \
        len(problem.blocks)


def save_checkpoint(ck_dir, state: SolverState, problem: SDPProblem,
                    params, retries: int = 10) -> None:
    ck_dir = pathlib.Path(ck_dir)
    ck_dir.mkdir(parents=True, exist_ok=True)
    meta_path = ck_dir / "checkpoint.json"
    old_meta = {}
    if meta_path.exists():
        try:
            old_meta = json.loads(meta_path.read_text())
        except json.JSONDecodeError:
            old_meta = {}
    current = old_meta.get("current", None)
    new_gen = (current + 1) if current is not None else 0

    arrays = _flatten_state(state)
    for attempt in range(retries):
        try:
            np.savez(ck_dir / f"checkpoint_{new_gen}.npz", **arrays)
            break
        except OSError:
            if attempt == retries - 1:
                raise
            time.sleep(1)

    meta = {
        "version": _VERSION,
        "current": new_gen,
        "backup": current,
        "num_blocks": (problem.num_blocks if hasattr(problem, "buckets")
                       else len(problem.blocks)),
        "options": dataclasses.asdict(params),
        "time": time.time(),
    }
    tmp = ck_dir / "checkpoint_new.json"
    tmp.write_text(json.dumps(meta, indent=1))
    tmp.rename(meta_path)  # atomic commit (save_checkpoint.cxx:103-117)

    # prune generations older than backup (two kept)
    keep = {new_gen, current}
    for f in ck_dir.glob("checkpoint_*.npz"):
        try:
            gen = int(f.stem.split("_")[1])
        except (IndexError, ValueError):
            continue
        if gen not in keep:
            f.unlink()


def load_checkpoint(ck_dir, problem: SDPProblem, params) -> SolverState | None:
    """Load the newest readable generation (fall back to backup, like
    the reference's generation handling); None if no checkpoint."""
    ck_dir = pathlib.Path(ck_dir)
    meta_path = ck_dir / "checkpoint.json"
    if not meta_path.exists():
        return _load_text_checkpoint(ck_dir, problem, params)
    meta = json.loads(meta_path.read_text())
    for gen in (meta.get("current"), meta.get("backup")):
        if gen is None:
            continue
        path = ck_dir / f"checkpoint_{gen}.npz"
        if not path.exists():
            continue
        try:
            with np.load(path) as z:
                y = jnp.asarray(z["y"])
                x, X, Y = [], [], []
                for i in range(_n_groups(problem)):
                    x.append(jnp.asarray(z[f"x_{i}"]))
                    X.append(tuple(jnp.asarray(z[f"X_{i}_{p}"])
                                   for p in range(2)))
                    Y.append(tuple(jnp.asarray(z[f"Y_{i}_{p}"])
                                   for p in range(2)))
            if hasattr(problem, "buckets"):
                from .data import BucketedState

                return BucketedState(x=x, y=y, X=X, Y=Y)
            return SolverState(x=x, y=y, X=X, Y=Y)
        except (OSError, KeyError, ValueError):
            continue
    raise RuntimeError(f"corrupt checkpoint in {ck_dir}")


def _load_text_checkpoint(ck_dir, problem, params) -> SolverState | None:
    """Text checkpoint from --writeSolution=x,y,X,Y output
    (`load_checkpoint/load_text_checkpoint.cxx`): enables restarts from
    a solution directory."""
    ck_dir = pathlib.Path(ck_dir)
    if not (ck_dir / "y.txt").exists():
        return None
    if hasattr(problem, "buckets"):
        return _load_text_checkpoint_bucketed(ck_dir, problem, params)
    from ..io.text_io import read_text_vector, read_text_matrix

    k = params.n_words
    y = jnp.asarray(read_text_vector(ck_dir / "y.txt", k))
    x, X, Y = [], [], []
    for i, bl in enumerate(problem.blocks):
        x.append(jnp.asarray(read_text_vector(ck_dir / f"x_{i}.txt", k)))
        Xp, Yp = [], []
        for p in range(2):
            if bl.shape.psd_size(p) == 0:
                Xp.append(jnp.zeros((0, 0, k)))
                Yp.append(jnp.zeros((0, 0, k)))
                continue
            Xp.append(jnp.asarray(read_text_matrix(
                ck_dir / f"X_matrix_{2 * i + p}.txt", k)))
            Yp.append(jnp.asarray(read_text_matrix(
                ck_dir / f"Y_matrix_{2 * i + p}.txt", k)))
        X.append(tuple(Xp))
        Y.append(tuple(Yp))
    return SolverState(x=x, y=y, X=X, Y=Y)


def _load_text_checkpoint_bucketed(ck_dir, problem, params):
    """Text-checkpoint loading into a bucketed state (per-block files
    regrouped into bucket stacks)."""
    import pathlib

    from ..io.text_io import read_text_vector, read_text_matrix
    from .data import BucketedState

    ck_dir = pathlib.Path(ck_dir)
    k = params.n_words
    y = jnp.asarray(read_text_vector(ck_dir / "y.txt", k))
    x, X, Y = [], [], []
    for bk in problem.buckets:
        xs, Xs, Ys = [], [[], []], [[], []]
        for j in bk.block_indices:
            xs.append(read_text_vector(ck_dir / f"x_{j}.txt", k))
            for p in range(2):
                if bk.shape.psd_size(p) == 0:
                    Xs[p].append(np.zeros((0, 0, k)))
                    Ys[p].append(np.zeros((0, 0, k)))
                    continue
                Xs[p].append(read_text_matrix(
                    ck_dir / f"X_matrix_{2 * j + p}.txt", k))
                Ys[p].append(read_text_matrix(
                    ck_dir / f"Y_matrix_{2 * j + p}.txt", k))
        x.append(jnp.asarray(np.stack(xs)))
        X.append(tuple(jnp.asarray(np.stack(Xs[p])) for p in range(2)))
        Y.append(tuple(jnp.asarray(np.stack(Ys[p])) for p in range(2)))
    return BucketedState(x=x, y=y, X=X, Y=Y)
