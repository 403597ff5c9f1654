"""Runtime data-corruption invariant on the exact Q pipeline.

The reference verifies `Q_ii = 2^{2N}` after the CRT restore as a
corruption detector (`compute_Q.cxx:66-92`).  The TPU pipeline's
equivalent: the per-prime DIAGONAL residues of Q are recomputed
independently (elementwise squares, `exact.syrk_diag_residues_split`)
and compared against the MXU SYRK's diagonal after the cross-chip
integer reduction; any mismatch poisons Q with NaN, which the driver
surfaces as NonFiniteIterateError.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdpb_tpu.ops import exact, mpmm


def _residues(n=37, m=9, bits=212, seed=0):
    rng = np.random.default_rng(seed)
    plan = mpmm.plan_for(bits, 64)
    digits = jnp.asarray(
        rng.integers(-127, 128, (n, m, plan.n_digits)), jnp.int32)
    r_split = exact.residues_split(digits, plan)
    return plan, r_split


def test_diag_residues_match_syrk():
    plan, r_split = _residues()
    q = np.asarray(exact.syrk_residues_split(r_split, plan))
    d = np.asarray(exact.syrk_diag_residues_split(r_split, plan))
    np.testing.assert_array_equal(
        d, np.diagonal(q, axis1=-2, axis2=-1))


def test_corrupted_residue_plane_trips_invariant():
    """Flipping ONE residue value must poison the restored Q."""
    from sdpb_tpu.solver import bucket_iteration as bi

    plan, r_split = _residues()
    q_res = exact.syrk_residues_split(r_split, plan)
    d_res = exact.syrk_diag_residues_split(r_split, plan)
    # corrupt one entry of one prime plane ON THE DIAGONAL
    bad = q_res.at[3, 4, 4].add(1)
    k = 10
    e_col = jnp.zeros((q_res.shape[-1],), jnp.int32)
    fin = jnp.asarray(True)
    L_ok = bi._q_restore_cholesky(q_res, e_col, fin, plan, k,
                                  jnp.zeros((1,), jnp.float32), d_res)
    L_bad = bi._q_restore_cholesky(bad, e_col, fin, plan, k,
                                   jnp.zeros((1,), jnp.float32), d_res)
    assert bool(jnp.isfinite(L_ok).all())
    assert bool(jnp.isnan(L_bad).any())


def test_corrupted_diag_check_also_trips():
    plan, r_split = _residues()
    q_res = exact.syrk_residues_split(r_split, plan)
    d_res = exact.syrk_diag_residues_split(r_split, plan)
    bad_d = d_res.at[0, 0].add(2)
    k = 10
    e_col = jnp.zeros((q_res.shape[-1],), jnp.int32)
    from sdpb_tpu.solver import bucket_iteration as bi

    L = bi._q_restore_cholesky(q_res, e_col, jnp.asarray(True), plan, k,
                               jnp.zeros((1,), jnp.float32), bad_d)
    assert bool(jnp.isnan(L).any())
