"""Attention-score kernel tests: dense vs naive oracle, sparse vs dense
(reference rel-err discipline: src/main.rs:100-114, EPS=1e-4)."""

import numpy as np
import pytest

from sparsetpu import symbolic_flops
from sparsetpu.attention import scores


SHAPE = (2, 5, 4, 8)  # (batch, seq, heads, head_dim) — toy config


def _naive_scores(q, k):
    b, s, h, d = q.shape
    out = np.zeros((b, s, h, h), np.float32)
    for bi in range(b):
        for si in range(s):
            out[bi, si] = q[bi, si] @ k[bi, si].T
    return out


def test_dense_matches_naive():
    rng = np.random.default_rng(0)
    q = rng.standard_normal(SHAPE).astype(np.float32)
    k = rng.standard_normal(SHAPE).astype(np.float32)
    got = np.asarray(scores.attention_scores_dense_jit(q, k))
    np.testing.assert_allclose(got, _naive_scores(q, k), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("density", [1.0, 0.3, 0.05])
def test_sparse_matches_dense(density):
    q = scores.random_sparse_tensor(SHAPE, density, seed=1)
    k = scores.random_sparse_tensor(SHAPE, density, seed=2)
    want = _naive_scores(q, k)

    q_csr = scores.tensor_to_grouped_csr(q)
    kt_csr = scores.tensor_to_grouped_csr(k, transpose_last=True)
    flops = int(symbolic_flops(q_csr, kt_csr))
    cap = max(1 << (max(flops, 1) - 1).bit_length(), 4)
    c = scores.attention_scores_sparse(q_csr, kt_csr, expand_cap=cap)
    got = scores.sparse_scores_to_dense(c, SHAPE)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flop_count():
    assert scores.attention_flops(SHAPE) == 2 * 5 * 4 * 4 * 8
