"""Cost-based block placement (reference:
`compute_block_grid_mapping.hxx`, `LPT_scheduling.hxx`,
`read_block_costs.cxx`; the measured timing run of
`sdpb/main.cxx:85-150` is replaced by the flop model -- see
solver/placement.py module docstring)."""

import numpy as np
import pytest

from sdpb_tpu.solver.placement import (bucket_device_permutation, imbalance,
                                       lpt_assign, read_block_costs,
                                       write_block_timings)


def test_lpt_balances_heterogeneous_costs():
    """Mirrors LPT_scheduling.test.cxx: heterogeneous costs over bins
    end < 10% imbalanced when items are plentiful."""
    rng = np.random.default_rng(0)
    costs = rng.uniform(1.0, 20.0, size=64)
    bin_of, loads = lpt_assign(costs, 8)
    assert sorted(np.bincount(bin_of, minlength=8)) != []  # smoke
    assert imbalance(loads) < 0.10
    assert loads.sum() == pytest.approx(costs.sum())


def test_lpt_capacity_respected():
    costs = np.asarray([10.0, 9, 8, 1, 1, 1, 1, 1])
    bin_of, loads = lpt_assign(costs, 4, capacity=2)
    assert np.bincount(bin_of, minlength=4).max() == 2
    # the three big items must land in different bins
    assert len({bin_of[0], bin_of[1], bin_of[2]}) == 3


def test_bucket_permutation_balances_chunks():
    """shard_map chunks are contiguous; the LPT permutation must make
    per-device chunk sums balanced (<10%, the reference's bar)."""
    rng = np.random.default_rng(1)

    def chunk_sums(costs, slots, n_dev):
        per_dev = len(slots) // n_dev
        return [sum(costs[j] for j in
                    slots[d * per_dev:(d + 1) * per_dev] if j >= 0)
                for d in range(n_dev)]

    costs = rng.uniform(1.0, 10.0, size=40)
    n_dev = 8
    slots, _ = bucket_device_permutation(costs, n_dev)
    assert sorted(s for s in slots if s >= 0) == list(range(40))
    assert imbalance(chunk_sums(costs, slots, n_dev)) < 0.10
    # adversarial: sorted-descending costs
    adv = np.sort(costs)[::-1]
    slots2, _ = bucket_device_permutation(adv, n_dev)
    assert imbalance(chunk_sums(adv, slots2, n_dev)) < 0.10
    # nb % n_dev != 0: chunk boundaries must still respect LPT bins
    # (the pre-fix failure mode: costs [10,1,1,1,1] on 2 devices gave
    # bin0 two items but the chunk cut after three)
    c5 = np.asarray([10.0, 1, 1, 1, 1])
    slots3, loads3 = bucket_device_permutation(c5, 2)
    assert len(slots3) == 6 and (slots3 < 0).sum() == 1
    assert imbalance(chunk_sums(c5, slots3, 2)) == pytest.approx(
        imbalance(loads3))


def test_read_block_costs_chain(tmp_path):
    # 1. block_timings wins
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "block_timings").write_text("5\n7\n9\n")
    costs = read_block_costs(ck, None, 3)
    assert list(costs) == [5, 7, 9]
    # 2. stale count -> fall through to file sizes
    sdp = tmp_path / "sdp"
    sdp.mkdir()
    for j, size in enumerate([100, 300]):
        (sdp / f"block_data_{j}.json").write_bytes(b"x" * size)
    costs = read_block_costs(ck, sdp, 2)
    assert list(costs) == [100, 300]
    # 3. nothing -> uniform
    costs = read_block_costs(None, None, 4)
    assert list(costs) == [1, 1, 1, 1]


def test_write_block_timings_roundtrip(tmp_path):
    class FakeBucket:
        def __init__(self, idxs):
            self.block_indices = tuple(idxs)

    class FakeProblem:
        buckets = [FakeBucket([2, 0]), FakeBucket([1])]

    write_block_timings(tmp_path, FakeProblem(),
                        [[0.25, 0.5], [0.125]])
    costs = read_block_costs(tmp_path, None, 3)
    # block order: j=0 -> 0.5s, j=1 -> 0.125s, j=2 -> 0.25s (micros)
    assert list(costs) == [500000, 125000, 250000]


def test_flop_model_costs_1d():
    """Flop-model costs are positive, per-block, and distinguish
    buckets by shape (replacing the measured run; a measurement can
    only ever produce bucket_time/nb, uniform within a bucket)."""
    from sdpb_tpu.io.sdp_json import read_sdp
    from sdpb_tpu.solver import problem_from_raw
    from sdpb_tpu.solver.data import bucketize
    from sdpb_tpu.solver.placement import (bucket_loads,
                                           flop_model_costs)

    raw = read_sdp(
        "/root/reference/test/data/end-to-end_tests/1d/output/sdp",
        k=3)
    problem = bucketize(problem_from_raw(raw))
    costs = flop_model_costs(problem)
    assert len(costs) == problem.num_blocks
    assert (costs > 0).all()
    # read_block_costs prefers the flop model when a problem is given
    from sdpb_tpu.solver.placement import read_block_costs

    assert (read_block_costs(None, None, problem.num_blocks,
                             problem=problem) == costs).all()
    loads = bucket_loads(problem, costs, 4)
    assert loads.shape == (4,) and (loads > 0).all()


def test_mesh_permutation_roundtrip(tmp_path):
    """Sharding with an LPT permutation and unsharding restores block
    order exactly (state arrays bit-identical)."""
    import jax
    from jax.sharding import Mesh

    from sdpb_tpu.parallel import mesh as mesh_mod
    from sdpb_tpu.solver import SolverParams, problem_from_raw
    from sdpb_tpu.io.sdp_json import read_sdp
    from sdpb_tpu.solver.data import bucketize, initial_bucketed_state

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 virtual devices")
    mesh = Mesh(np.array(devs[:2]), (mesh_mod.AXIS,))

    raw = read_sdp(
        "/root/reference/test/data/end-to-end_tests/1d-constraints"
        "/output/sdp", k=3)
    problem = bucketize(problem_from_raw(raw))
    state = initial_bucketed_state(problem, 3.0, 5.0)
    # make per-block state distinguishable
    state.x[0] = state.x[0] + np.arange(problem.buckets[0].nb)[
        :, None, None] * 0.0  # keep zeros; x identical is fine
    costs = [list(rngc) for rngc in
             [np.linspace(1, 2, bk.nb) for bk in problem.buckets]]
    mp_ = mesh_mod.shard_problem(problem, mesh, costs=costs)
    ms = mesh_mod.shard_state(state, mp_)
    back = mesh_mod.unshard_state(ms, mp_)
    for bi in range(len(problem.buckets)):
        np.testing.assert_array_equal(np.asarray(back.x[bi]),
                                      np.asarray(state.x[bi]))
        for p in range(2):
            np.testing.assert_array_equal(np.asarray(back.X[bi][p]),
                                          np.asarray(state.X[bi][p]))
