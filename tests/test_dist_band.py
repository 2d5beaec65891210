"""Sharded block-band chain: sharded result must equal the single-device
band kernel bit-exactly on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from sparsetpu import SparseCSR, U64
from sparsetpu.dist import band as dband
from sparsetpu.dist import shard as dist
from sparsetpu.graphs import generate
from sparsetpu.kernels import bandmm


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return dist.default_mesh(8)


def test_sharded_band_chain_matches_single(mesh8):
    # 4x4x4 torus: nb = 64/8 = 8 block-rows, one per device
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.5, seed=2)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    band, out = bandmm.csr_band_split(a, half_width=21, block=8, cyclic=True)
    assert int(out.nnz) == 0

    single = bandmm.band_matmul(band, band)
    p_sh = dband.shard_band(band, mesh=mesh8)
    c_sh = dband.band_matmul_sharded(p_sh, band, mesh=mesh8)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(c_sh.data)),
        np.asarray(jax.device_get(single.data)),
    )

    # second step, sharded in place (with limb decomposition)
    single2 = bandmm.band_matmul(single, band, p_limbs=2, a_limbs=1)
    c_sh2 = dband.band_matmul_sharded(c_sh, band, p_limbs=2, a_limbs=1,
                                      mesh=mesh8)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(c_sh2.data)),
        np.asarray(jax.device_get(single2.data)),
    )
    # result slab stays sharded over the mesh
    assert len(c_sh2.data.sharding.device_set) == 8


def test_sharded_band_noncyclic_matches_single(mesh8):
    # non-cyclic band: exercises the clip/valid row_offset path in
    # _band_matmul_data (no wraparound blocks)
    coo = generate.lattice([64], torus=False)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    band, out = bandmm.csr_band_split(a, half_width=7, block=8, cyclic=False)
    assert int(out.nnz) == 0

    single = bandmm.band_matmul(band, band)
    p_sh = dband.shard_band(band, mesh=mesh8)
    c_sh = dband.band_matmul_sharded(p_sh, band, mesh=mesh8)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(c_sh.data)),
        np.asarray(jax.device_get(single.data)),
    )


def test_sharded_band_fold_cyclic_matches_single(mesh8):
    # small nb with wide band: product width kbc = 2*(wbp+wba)+1 exceeds nb,
    # so fold_cyclic runs per shard; result must still match single-device
    coo = generate.lattice([4, 4, 4], torus=True)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    band, out = bandmm.csr_band_split(a, half_width=21, block=8, cyclic=True)
    assert int(out.nnz) == 0
    wbc = 2 * band.half_width_blocks
    assert 2 * wbc + 1 > band.nb  # fold actually triggers in the product

    single = bandmm.band_matmul(band, band)
    assert single.half_width_blocks == 0  # folded to a full block-circulant
    p_sh = dband.shard_band(band, mesh=mesh8)
    c_sh = dband.band_matmul_sharded(p_sh, band, mesh=mesh8)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(c_sh.data)),
        np.asarray(jax.device_get(single.data)),
    )
