"""GroupedCSR (compound-row batched CSR) tests: batched matmul as one
block-diagonal SpGEMM, and the einsum planner's bij,bjk->bik lowering."""

import numpy as np
import pytest

from sparsetpu import U64, F32SR
from sparsetpu.einsum.engine import einsum
from sparsetpu.grouped import GroupedCSR


def _rand_batched(g, n, m, seed, density=0.4):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 4, size=(g, n, m)).astype(np.uint64)
    x *= (rng.random((g, n, m)) < density).astype(np.uint64)
    return x


def test_roundtrip():
    x = _rand_batched(3, 4, 5, 0)
    gc = GroupedCSR.from_dense(x, sr=U64)
    np.testing.assert_array_equal(gc.to_dense(), x)


def test_batched_matmul():
    a = _rand_batched(3, 4, 5, 1)
    b = _rand_batched(3, 5, 6, 2)
    ga, gb = GroupedCSR.from_dense(a, sr=U64), GroupedCSR.from_dense(b, sr=U64)
    c = ga.matmul(gb)
    want = np.einsum("bij,bjk->bik", a.astype(np.int64), b.astype(np.int64))
    np.testing.assert_array_equal(c.to_dense().astype(np.int64), want)


def test_transpose():
    x = _rand_batched(2, 3, 4, 3)
    gc = GroupedCSR.from_dense(x, sr=U64)
    np.testing.assert_array_equal(gc.transpose().to_dense(),
                                  np.swapaxes(x, 1, 2))


def test_einsum_batched_lowering():
    a = _rand_batched(2, 3, 4, 4).astype(np.float32)
    b = _rand_batched(2, 4, 3, 5).astype(np.float32)
    ga = GroupedCSR.from_dense(a, sr=F32SR)
    gb = GroupedCSR.from_dense(b, sr=F32SR)
    (got,) = einsum("bij,bjk->bik", [ga, gb])
    want = np.einsum("bij,bjk->bik", a, b)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_einsum_batched_u64():
    a = _rand_batched(2, 3, 3, 6)
    b = _rand_batched(2, 3, 3, 7)
    ga = GroupedCSR.from_dense(a, sr=U64)
    gb = GroupedCSR.from_dense(b, sr=U64)
    (got,) = einsum("gxy,gyz->gxz", [ga, gb], sr=U64)
    want = np.einsum("bij,bjk->bik", a.astype(np.int64), b.astype(np.int64))
    np.testing.assert_array_equal(U64.to_numpy(got).astype(np.int64), want)
