"""SparseCSR construction/conversion tests (reference from_coo semantics:
sort by (row,col), merge duplicates, drop zeros — src/graph_csr.rs:85-129)."""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U32, U64, F32SR
from sparsetpu.graphs import generate


def test_from_coo_basic():
    m = SparseCSR.from_coo([0, 1, 2], [1, 2, 0], [5, 6, 7], 3, sr=U64)
    assert int(m.nnz) == 3
    d = m.to_dense_numpy()
    want = np.zeros((3, 3), np.uint64)
    want[0, 1], want[1, 2], want[2, 0] = 5, 6, 7
    np.testing.assert_array_equal(d, want)


def test_from_coo_dedup_and_sort():
    # duplicates merge by summing; entries arrive unsorted
    m = SparseCSR.from_coo(
        [2, 0, 2, 0, 0], [1, 5, 1, 5, 3], [1, 2, 10, 3, 4], 3, 6, sr=U64, capacity=8
    )
    assert int(m.nnz) == 3
    row_ptr, col_idx, vals = m.to_numpy()
    np.testing.assert_array_equal(row_ptr, [0, 2, 2, 3])
    np.testing.assert_array_equal(col_idx, [3, 5, 1])
    np.testing.assert_array_equal(vals, [4, 5, 11])


def test_from_coo_drops_zeros():
    m = SparseCSR.from_coo([0, 1], [0, 1], [0, 3], 2, sr=U64, capacity=4)
    assert int(m.nnz) == 1
    assert m.get(1, 1) == 3
    assert m.get(0, 0) == 0


def test_identity():
    m = SparseCSR.identity(5, sr=U64)
    np.testing.assert_array_equal(m.to_dense_numpy(), np.eye(5, dtype=np.uint64))


def test_big_key_path():
    # force the two-key lexicographic sort path with a huge logical shape
    n = 70000  # (n+1)*n > 2^31
    m = SparseCSR.from_coo([0, 69999, 5], [69999, 0, 5], [1, 2, 3], n, sr=U32, capacity=4)
    assert int(m.nnz) == 3
    assert m.get(0, 69999) == 1
    assert m.get(69999, 0) == 2
    assert m.get(5, 5) == 3


def test_transpose():
    rng = np.random.default_rng(3)
    dense = rng.integers(0, 3, size=(17, 9)).astype(np.uint64)
    m = SparseCSR.from_dense_numpy(dense, sr=U64)
    t = m.transpose()
    np.testing.assert_array_equal(t.to_dense_numpy(), dense.T)


def test_with_capacity_roundtrip():
    m = SparseCSR.from_coo([0, 1], [1, 0], [1, 2], 2, sr=U64, capacity=2)
    big = m.with_capacity(16)
    assert big.capacity == 16
    np.testing.assert_array_equal(big.to_dense_numpy(), m.to_dense_numpy())
    back = big.with_capacity(2)
    np.testing.assert_array_equal(back.to_dense_numpy(), m.to_dense_numpy())


def test_from_generator_coo():
    coo = generate.lattice([3, 3], torus=False)
    rows, cols, vals, n = coo
    m = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    d = m.to_dense_numpy()
    # corner node has 3 neighbors, center has 8
    assert d.sum(axis=1)[0] == 3
    assert d.sum(axis=1)[4] == 8
    np.testing.assert_array_equal(d, d.T)
