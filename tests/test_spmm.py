"""Dense-accumulator SpMM chain kernel tests: exact agreement with ESC."""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, spgemm_auto
from sparsetpu.bench.chain import run_chain_dense, tuple_to_f32_dense
from sparsetpu.graphs import generate
from sparsetpu.ops.spmm import dense_to_csr, prepare_spmm_operand, spmm_dense


def _dev(coo):
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=U64)


def test_spmm_matches_esc():
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.5, seed=1)
    a = _dev(coo)
    # numpy int64 oracle (exact here) instead of compiling the ESC stack
    ad = a.to_dense_numpy().astype(np.int64)
    cols, vals, lrow, rpc = prepare_spmm_operand(a, n_chunks=4)
    p = tuple_to_f32_dense(a)
    c = spmm_dense(cols, vals, lrow, p, rows_per_chunk=rpc)
    got = dense_to_csr(c, U64)
    np.testing.assert_array_equal(got.to_dense_numpy().astype(np.int64),
                                  ad @ ad)


def test_spmm_chain_matches_esc():
    coo = generate.lattice([3, 3, 3], torus=True)
    a = _dev(coo)
    results = run_chain_dense(a, max_step=4, iters=1, n_chunks=3, verbose=False)
    ad = a.to_dense_numpy().astype(np.int64)
    cur = ad
    for rec in results:
        cur = cur @ ad
        assert rec.nnz == int((cur != 0).sum()), rec.step


def test_spmm_rejects_huge_values():
    a = SparseCSR.from_coo([0], [1], [1 << 25], 2, sr=U64)
    with pytest.raises(ValueError, match="2\\^24"):
        prepare_spmm_operand(a, n_chunks=1)


def test_spmm_uneven_chunks():
    # n not divisible by n_chunks; empty rows in tail
    coo = generate.random_graph(23, 60, seed=9)
    a = _dev(coo)
    want = spgemm_auto(a, a)
    cols, vals, lrow, rpc = prepare_spmm_operand(a, n_chunks=5)
    c = spmm_dense(cols, vals, lrow, tuple_to_f32_dense(a), rows_per_chunk=rpc)
    got = dense_to_csr(c, U64)
    np.testing.assert_array_equal(got.to_dense_numpy(), want.to_dense_numpy())
