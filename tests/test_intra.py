"""Intra-block model parallelism: one PSD block's dense MP linear
algebra sharded over the mesh (reference: `Block_Map.hxx:8-14`,
`El::Grid` per block group, `sdpb/solve.cxx:31`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sdpb_tpu.mp import linalg as la
from sdpb_tpu.parallel import intra, mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    return Mesh(np.array(devs[:8]), (mesh_mod.AXIS,))


def _mk_spd(n, k, rng):
    a = rng.standard_normal((n, n))
    spd = a @ a.T + n * np.eye(n)
    out = np.zeros((n, n, k))
    out[..., 0] = spd
    out[..., 1] = spd * 3e-18
    return jnp.asarray(out)


def _relerr(a, b):
    a, b = np.asarray(a).sum(-1), np.asarray(b).sum(-1)
    return np.abs(a - b).max() / np.abs(b).max()


def test_sharded_block_cholesky_and_trsm(mesh8):
    """A 128x128 block with only 16 rows per device: factorize and
    solve the bilinear-pairing Trsm across the mesh, matching the
    single-device kernels."""
    rng = np.random.default_rng(0)
    n, m, k = 128, 24, 3
    a = _mk_spd(n, k, rng)
    u = np.zeros((n, m, k))
    u[..., 0] = rng.standard_normal((n, m))
    u = jnp.asarray(u)

    l_ref = la.cholesky(a)
    t_ref = la.solve_lower(l_ref, u)

    a_sh = intra.shard_rows(mesh8, np.asarray(a))
    l_sh = intra.cholesky(mesh8, a_sh)
    assert _relerr(l_sh, l_ref) < 1e-28
    t_dist = intra.solve_lower(mesh8, l_sh, u)
    assert _relerr(t_dist, t_ref) < 1e-26
    x_ref = la.cholesky_solve(l_ref, u)
    x_dist = intra.cholesky_solve(mesh8, l_sh, u)
    assert _relerr(x_dist, x_ref) < 1e-24


def test_sharded_syrk_exact(mesh8):
    """Row-sharded exact SYRK (per-shard int8 residues + int32 psum)
    equals the single-device exact SYRK bit-for-bit."""
    from sdpb_tpu.ops import mpmm

    rng = np.random.default_rng(1)
    n, m, k = 64, 24, 3
    x = np.zeros((n, m, k))
    x[..., 0] = rng.standard_normal((n, m))
    x[..., 1] = x[..., 0] * 1e-17
    x = jnp.asarray(x)

    plan = mpmm.plan_for(mpmm.precision_of(x.dtype, k), n)
    ref = np.asarray(mpmm.syrk_mp(x, plan))
    got = np.asarray(intra.syrk(mesh8, intra.shard_rows(mesh8,
                                                        np.asarray(x))))
    np.testing.assert_array_equal(got, ref)


def test_shard_rows_rejects_ragged(mesh8):
    with pytest.raises(ValueError):
        intra.shard_rows(mesh8, np.zeros((10, 10, 3)))
