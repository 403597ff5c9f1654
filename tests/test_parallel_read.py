"""File-parallel PMP reading (reference:
`pmp_read/read_polynomial_matrix_program.cxx:12-50`, which bin-packs
input files over MPI process groups by size; here a process pool with
LPT submission order).  The contract: parallel results are
bit-identical to serial, in file order."""

import pathlib

import pytest

from sdpb_tpu.pmp.core import make_ctx
from sdpb_tpu.pmp.read import read_pmp

NMAX6_INPUT = pathlib.Path(
    "/root/reference/test/data/end-to-end_tests/"
    "SingletScalar_cT_test_nmax6/primal_dual_optimal/input")


def test_parallel_read_matches_serial(tmp_path):
    # two json files from the nmax6 nsv (objective file + one block)
    files = [NMAX6_INPUT / "json" /
             "obj_mat_MBDKYxVC2zKn6R09Zb7nfzNSP8Rkw9d0t1ZUZXfQhbs.json",
             NMAX6_INPUT / "json" /
             "norm_mat_Dg5aXJhNmwPwysx5qmbql5hU2mN0QLsymZLx12KEkko.json"]
    nsv = tmp_path / "pmp.nsv"
    nsv.write_bytes(b"\0".join(str(f).encode() for f in files))

    ctx = make_ctx(320)
    serial = read_pmp(nsv, ctx, jobs=1)
    parallel = read_pmp(nsv, ctx, jobs=2)

    assert parallel.num_matrices == serial.num_matrices
    assert parallel.objective == serial.objective
    assert parallel.normalization == serial.normalization
    assert parallel.source_paths == serial.source_paths
    for a, b in zip(serial.matrices, parallel.matrices):
        assert a.sample_points == b.sample_points
        assert a.sample_scalings == b.sample_scalings
        assert a.reduced_sample_scalings == b.reduced_sample_scalings
        assert a.polynomials == b.polynomials
        for pa, pb in zip(a.bilinear_basis, b.bilinear_basis):
            assert pa == pb
        assert a.prefactor.poles == b.prefactor.poles
        assert a.prefactor.constant == b.prefactor.constant
