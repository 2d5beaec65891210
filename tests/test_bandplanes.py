"""Fold-band chain kernel (kernels/bandplanes.py) vs the native oracle.

The fold permutation must make every torus edge a LINEAR band entry (no
wrap), the band layouts must chain alignment-exactly, and the kernel's
per-step values must match the C++ Gustavson oracle run on the folded
matrix (pallas interpret mode on CPU)."""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, native
from sparsetpu.graphs import generate
from sparsetpu.kernels import bandplanes as bp


def test_fold_perm_bounds_band():
    dims = [6, 6, 6]
    rows, cols, vals, n = generate.lattice(dims, torus=True)
    perm = bp.fold_perm(dims)
    assert sorted(perm) == list(range(n))
    h = bp.band_halfwidth(perm[rows], perm[cols])
    # bound: 2 * (36 + 6 + 1)
    assert h <= 2 * (36 + 6 + 1), h
    # unfolded torus has full-span wrap entries
    assert bp.band_halfwidth(rows, cols) > n // 2


def test_band_layout_alignment():
    base, s = bp.band_layout(512, 37, 16)
    assert s % 8 == 0 and (base % 8 == 0).all()
    assert base.min() >= 0 and int(base.max()) + s <= 16


def _fold_csr(dims, density_seed=3):
    rows, cols, vals, n = generate.lattice(dims, torus=True)
    rng = np.random.default_rng(density_seed)
    keep = rng.random(len(rows)) < 0.7
    # symmetric keep: decide per unordered pair
    key = np.minimum(rows, cols) * n + np.maximum(rows, cols)
    order = np.argsort(key, kind="stable")
    k2 = key[order]
    first = np.concatenate([[True], k2[1:] != k2[:-1]])
    pair_keep = {}
    kr = rng.random(int(first.sum())) < 0.7
    pi = np.cumsum(first) - 1
    keep = kr[pi]
    rows, cols, vals = rows[order][keep], cols[order][keep], vals[order][keep]
    perm = bp.fold_perm(dims)
    return perm[rows], perm[cols], vals, n


def test_foldband_chain_matches_oracle():
    dims = [6, 6, 6]
    rf, cf, vals, n = _fold_csr(dims)
    a = SparseCSR.from_coo_host(rf, cf, vals, n, sr=U64)
    h_a = bp.band_halfwidth(rf, cf)
    total = -(-(-(-n // 128)) // 8) * 8
    rpt = 8
    assert n % rpt == 0

    rp_h, ci_h, v_h = a.to_numpy()
    prev_o = native.as_host_csr(rp_h.astype(np.int64), ci_h, v_h)
    base_o = prev_o

    base_in, s_in = bp.band_layout(n, h_a, total)
    p = bp.csr_to_band(a, base_in, s_in)
    for step in range(2, 5):
        base_out, s_out = bp.band_layout(n, step * h_a, total)
        cnt, src, dst, vv = bp.tile_band_operand(
            a, base_in, s_in, base_out, s_out, rpt, nbuf=4)
        p = bp.spmm_band(cnt, src, dst, vv, p, s_in=s_in, s_out=s_out,
                         rows_per_tile=rpt, nbuf=4)
        prev_o = native.spgemm(prev_o, base_o, n)
        # dense compare via unfold
        import jax

        planes = np.asarray(jax.device_get(
            bp.band_to_planes(p, jnp_base(base_out), n)))
        got = planes.reshape(n, -1)[:, :n]
        rp2, cc2, vv2 = prev_o
        want = np.zeros((n, n), np.float64)
        r2 = np.repeat(np.arange(n), np.diff(rp2[: n + 1]))
        want[r2, cc2[: len(r2)]] = vv2[: len(r2)].astype(np.float64)
        assert np.array_equal(got.astype(np.float64), want), step
        base_in, s_in = base_out, s_out


def jnp_base(base):
    import jax.numpy as jnp

    return jnp.asarray(base)
