"""Pallas dense-accumulator SpMM (kernels/spmm_pallas.py): interpreter-mode
differential tests vs numpy, plus host-side CSR builder agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparsetpu import SparseCSR, U64, F32SR
from sparsetpu.graphs import generate
from sparsetpu.kernels import spmm_pallas as sp


def _torus(dims, density, seed):
    coo = generate.lattice(list(dims), torus=True)
    coo = generate.thin(coo, density, seed=seed)
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=U64)


@pytest.mark.parametrize("dims,rpt", [([4, 4, 4], 8), ([8, 8], 16), ([4, 4], 8)])
def test_spmm_pallas_matches_numpy(dims, rpt):
    a = _torus(dims, 0.4, seed=dims[0])
    n = a.n_rows
    if n % rpt:
        pytest.skip("tile size must divide n")
    cnt, cols, lrow, vals, _ = sp.tile_sparse_operand(a, rows_per_tile=rpt)
    ad = a.to_dense_numpy().astype(np.float64)
    rng = np.random.default_rng(0)
    p_np = rng.integers(0, 5, size=(n, n)).astype(np.float32)
    c = sp.spmm_pallas(cnt, cols, lrow, vals, sp.to_row_planes(jnp.asarray(p_np)),
                       rows_per_tile=rpt)
    got = np.asarray(jax.device_get(sp.from_row_planes(c, n)))
    want = (ad @ p_np.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_spmm_pallas_chain_matches_dense_chain():
    from sparsetpu.bench.chain import host_f32_dense

    a = _torus([4, 4, 4], 0.3, seed=7)
    n = a.n_rows
    cnt, cols, lrow, vals, _ = sp.tile_sparse_operand(a, rows_per_tile=8)
    ad = host_f32_dense(a).astype(np.float64)
    p = sp.to_row_planes(jnp.asarray(ad, jnp.float32))
    want = ad.copy()
    for _ in range(3):  # A^2..A^4
        c = sp.spmm_pallas(cnt, cols, lrow, vals, p, rows_per_tile=8)
        want = ad @ want
        got = np.asarray(jax.device_get(sp.from_row_planes(c, n)))
        np.testing.assert_array_equal(got, want.astype(np.float32))
        p = c


def test_value_bound_guard():
    a = SparseCSR.from_coo([0], [0], [1 << 24], 8, 8, sr=U64)
    with pytest.raises(ValueError):
        sp.tile_sparse_operand(a, rows_per_tile=8)


class TestFromCooHost:
    def test_matches_device_build(self):
        coo = generate.lattice([5, 5], torus=True)
        rows, cols, vals, n = coo
        dev = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
        host = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
        np.testing.assert_array_equal(host.to_dense_numpy(), dev.to_dense_numpy())
        np.testing.assert_array_equal(
            np.asarray(host.row_ptr), np.asarray(dev.row_ptr)
        )
        assert int(host.nnz) == int(dev.nnz)

    def test_duplicate_merge_and_saturation(self):
        big = (1 << 63) + (1 << 63) - 1  # saturates to u64 max when doubled
        h = SparseCSR.from_coo_host(
            [0, 0, 1], [1, 1, 0], [1 << 63, 1 << 63, 5], 2, sr=U64
        )
        d = h.to_dense_numpy()
        assert d[0, 1] == 0xFFFFFFFFFFFFFFFF
        assert d[1, 0] == 5

    def test_zero_filtering_and_empty(self):
        h = SparseCSR.from_coo_host([0], [0], [0], 3, sr=U64)
        assert int(h.nnz) == 0
        e = SparseCSR.from_coo_host([], [], [], 3, sr=U64)
        assert int(e.nnz) == 0

    def test_f32(self):
        h = SparseCSR.from_coo_host([0, 1], [1, 0], [1.5, -2.0], 2, sr=F32SR)
        d = h.to_dense_numpy()
        assert d[0, 1] == np.float32(1.5) and d[1, 0] == np.float32(-2.0)


@pytest.mark.parametrize("dims,rpt,g", [([4, 4, 4], 8, 4), ([8, 8], 16, 8),
                                        ([4, 4, 4], 8, 32)])
def test_spmm_mxu_matches_numpy(dims, rpt, g):
    a = _torus(dims, 0.4, seed=dims[0] + 1)
    n = a.n_rows
    cnt, cols, m, meta = sp.tile_sparse_operand_mxu(a, rows_per_tile=rpt, g=g)
    ad = a.to_dense_numpy().astype(np.float64)
    rng = np.random.default_rng(1)
    p_np = rng.integers(0, 5, size=(n, n)).astype(np.float32)
    c = sp.spmm_pallas_mxu(cnt, cols, m, sp.to_row_planes(jnp.asarray(p_np)),
                           rows_per_tile=rpt, g=g)
    got = np.asarray(jax.device_get(sp.from_row_planes(c, n)))
    want = (ad @ p_np.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_spmm_mxu_chain_matches_dense_chain():
    from sparsetpu.bench.chain import host_f32_dense

    a = _torus([4, 4, 4], 0.3, seed=7)
    n = a.n_rows
    cnt, cols, m, _ = sp.tile_sparse_operand_mxu(a, rows_per_tile=8, g=8)
    ad = host_f32_dense(a).astype(np.float64)
    p = sp.to_row_planes(jnp.asarray(ad, jnp.float32))
    want = ad.copy()
    for _ in range(3):  # A^2..A^4
        c = sp.spmm_pallas_mxu(cnt, cols, m, p, rows_per_tile=8, g=8)
        want = ad @ want
        got = np.asarray(jax.device_get(sp.from_row_planes(c, n)))
        np.testing.assert_array_equal(got, want.astype(np.float32))
        p = c


def test_mxu_value_bound_guard():
    a = SparseCSR.from_coo([0], [0], [300], 8, 8, sr=U64)
    with pytest.raises(ValueError):
        sp.tile_sparse_operand_mxu(a, rows_per_tile=8)
