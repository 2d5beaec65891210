"""Block-sparse format + Pallas SDD kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

from sparsetpu.kernels import blocksparse as bs


def test_block_sparse_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 256)).astype(np.float32)
    x[:128, 128:] = 0.0  # absent block
    m = bs.BlockSparseMatrix.from_dense(x, (128, 128))
    assert m.nblocks == 3
    assert m.density() == 0.75
    np.testing.assert_array_equal(np.asarray(m.to_dense()), x)
    assert m.memory_bytes() < x.nbytes


def test_sdd_kernel_matches_dense():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((256, 64)).astype(np.float32)
    k = rng.standard_normal((384, 64)).astype(np.float32)
    qi = np.array([0, 1, 1], np.int32)
    ki = np.array([2, 0, 1], np.int32)
    blocks = np.asarray(bs.sdd_block_scores(q, k, qi, ki))
    full = q @ k.T
    for t in range(3):
        want = full[qi[t]*128:(qi[t]+1)*128, ki[t]*128:(ki[t]+1)*128]
        np.testing.assert_allclose(blocks[t], want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("density", [1.0, 0.2])
def test_block_sparse_attention_scores(density):
    from sparsetpu.attention import scores as att

    shape = (2, 3, 16, 32)  # groups of 16 rows; 6 groups -> 96 rows, 1 block
    q = att.random_sparse_tensor(shape, density, seed=3)
    k = att.random_sparse_tensor(shape, density, seed=4)
    blocks, qi, ki, meta = bs.block_sparse_attention_scores(q, k, block=128)
    got = bs.scores_blocks_to_dense(blocks, qi, ki, meta)
    want = np.einsum("bshd,bsgd->bshg", q, k)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_block_skipping_when_zero():
    from sparsetpu.attention import scores as att

    shape = (4, 4, 16, 32)  # 256 rows = 2 blocks of 128
    q = att.random_sparse_tensor(shape, 0.5, seed=5)
    k = att.random_sparse_tensor(shape, 0.5, seed=6)
    q.reshape(-1, 32)[:128] = 0.0  # first q block entirely zero
    blocks, qi, ki, meta = bs.block_sparse_attention_scores(q, k, block=128)
    assert 0 not in np.asarray(qi)  # zero block skipped
    got = bs.scores_blocks_to_dense(blocks, qi, ki, meta)
    want = np.einsum("bshd,bsgd->bshg", q, k)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
