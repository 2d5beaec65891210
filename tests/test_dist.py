"""Row-partitioned distributed SpGEMM tests on a virtual 8-device CPU mesh.

The reference asserts matmul_par == matmul (linalg/src/csr.rs:974-988); here
the sharded result must equal the single-device kernel bit-exactly, and the
chain must stay sharded in place across steps.
"""

import jax
import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, spgemm_auto
from sparsetpu.dist import shard as dist
from sparsetpu.graphs import generate


def _dev(coo):
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=U64)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return dist.default_mesh(8)


def test_shard_unshard_roundtrip(mesh8):
    coo = generate.lattice([5, 5], torus=True)
    a = _dev(coo)
    s = dist.shard(a, 8, mesh=mesh8)
    back = dist.unshard(s)
    np.testing.assert_array_equal(back.to_dense_numpy(), a.to_dense_numpy())
    assert int(s.total_nnz()) == int(a.nnz)


def test_sharded_spgemm_matches_single(mesh8):
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.3, seed=1)
    a = _dev(coo)
    want = spgemm_auto(a, a)

    s = dist.shard(a, 8, mesh=mesh8)
    flops = np.asarray(jax.device_get(dist.symbolic_flops_sharded(s, a, mesh=mesh8)))
    cap = 1 << (int(flops.max()) - 1).bit_length()
    c = dist.spgemm_sharded(s, a, expand_cap=cap, mesh=mesh8)
    got = dist.unshard(c)
    np.testing.assert_array_equal(got.to_dense_numpy(), want.to_dense_numpy())
    assert int(c.total_nnz()) == int(want.nnz)


def test_sharded_chain_stays_sharded(mesh8):
    """A^2..A^4 chain: the product remains a ShardedCSR across steps."""
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.25, seed=3)
    a = _dev(coo)

    cur_s = dist.shard(a, 8, mesh=mesh8)
    cur_single = a
    for _ in range(3):
        flops = np.asarray(
            jax.device_get(dist.symbolic_flops_sharded(cur_s, a, mesh=mesh8))
        )
        cap = 1 << (max(int(flops.max()), 1) - 1).bit_length()
        cur_s = dist.spgemm_sharded(cur_s, a, expand_cap=cap, mesh=mesh8)
        cur_single = spgemm_auto(cur_single, a)
        got = dist.unshard(cur_s)
        np.testing.assert_array_equal(
            got.to_dense_numpy(), cur_single.to_dense_numpy()
        )


def test_rectangular_blocks_padding(mesh8):
    # n_rows not divisible by 8: tail block rows are padded empty
    coo = generate.random_graph(21, 60, seed=5)
    a = _dev(coo)
    want = spgemm_auto(a, a)
    s = dist.shard(a, 8, mesh=mesh8)
    flops = np.asarray(jax.device_get(dist.symbolic_flops_sharded(s, a, mesh=mesh8)))
    cap = 1 << (max(int(flops.max()), 1) - 1).bit_length()
    c = dist.spgemm_sharded(s, a, expand_cap=cap, mesh=mesh8)
    got = dist.unshard(c)
    np.testing.assert_array_equal(got.to_dense_numpy(), want.to_dense_numpy())
