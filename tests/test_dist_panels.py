"""Ring B-panel-exchange SpGEMM: both operands sharded, result must equal
the single-device kernel bit-exactly on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, spgemm_auto
from sparsetpu.dist import panels, shard as dist
from sparsetpu.graphs import generate


def _dev(coo):
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=U64)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return dist.default_mesh(8)


def test_panel_flops_match_replicated(mesh8):
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.3, seed=1)
    a = _dev(coo)
    s = dist.shard(a, 8, mesh=mesh8)
    sb = dist.shard(a, 8, mesh=mesh8)
    per_panel = np.asarray(
        jax.device_get(panels.symbolic_flops_panels(s, sb, mesh=mesh8))
    )
    total_rep = np.asarray(
        jax.device_get(dist.symbolic_flops_sharded(s, a, mesh=mesh8))
    )
    assert per_panel.shape == (8, 8)
    np.testing.assert_array_equal(per_panel.sum(axis=1), total_rep)


def test_panel_spgemm_matches_single(mesh8):
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.3, seed=1)
    a = _dev(coo)
    want = spgemm_auto(a, a)

    s = dist.shard(a, 8, mesh=mesh8)
    sb = dist.shard(a, 8, mesh=mesh8)
    c = panels.spgemm_panels_auto(s, sb, mesh=mesh8)
    got = dist.unshard(c)
    np.testing.assert_array_equal(got.to_dense_numpy(), want.to_dense_numpy())
    assert int(c.total_nnz()) == int(want.nnz)


def test_panel_chain_squaring(mesh8):
    """Squaring a grown product (C = P x P) is the case panel exchange is
    for: both operands are the large sharded matrix."""
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.4, seed=9)
    a = _dev(coo)
    # numpy int64 oracle (exact at this scale) — the two single-device
    # spgemm_auto calls compiled a second kernel stack just for `want`
    ad = a.to_dense_numpy().astype(np.int64)
    want = (ad @ ad) @ (ad @ ad)

    s = dist.shard(a, 8, mesh=mesh8)
    sb = dist.shard(a, 8, mesh=mesh8)
    p_sh = panels.spgemm_panels_auto(s, sb, mesh=mesh8)
    c = panels.spgemm_panels_auto(p_sh, p_sh, mesh=mesh8)
    got = dist.unshard(c)
    np.testing.assert_array_equal(
        got.to_dense_numpy().astype(np.int64), want)


def test_panel_rectangular_padding(mesh8):
    coo = generate.random_graph(21, 70, seed=5)
    a = _dev(coo)
    want = spgemm_auto(a, a)
    s = dist.shard(a, 8, mesh=mesh8)
    sb = dist.shard(a, 8, mesh=mesh8)
    c = panels.spgemm_panels_auto(s, sb, mesh=mesh8)
    got = dist.unshard(c)
    np.testing.assert_array_equal(got.to_dense_numpy(), want.to_dense_numpy())


def test_panel_step_cap_overflow_poisons(mesh8):
    coo = generate.lattice([4, 4], torus=True)
    a = _dev(coo)
    s = dist.shard(a, 8, mesh=mesh8)
    sb = dist.shard(a, 8, mesh=mesh8)
    c = panels.spgemm_panels(s, sb, step_cap=1, mesh=mesh8)
    with pytest.raises(ValueError):
        dist.unshard(c)


def test_panel_per_step_overflow_poisons(mesh8):
    """One ring step over step_cap must poison even when the aggregate
    total stays under nd * step_cap (products are dropped per step)."""
    # B: all entries in panel 0 (rows 0..1); A: every row points at col 0.
    # Each device's expansion is concentrated in its single panel-0 step.
    n = 16
    rb = np.array([0, 0, 0, 1, 1, 1])
    cb = np.array([2, 5, 9, 3, 7, 11])
    b = SparseCSR.from_coo(rb, cb, np.ones(6, np.uint64), n, sr=U64)
    ra = np.arange(n)
    ca = np.zeros(n, np.int64)
    a = SparseCSR.from_coo(ra, ca, np.ones(n, np.uint64), n, sr=U64)
    s = dist.shard(a, 8, mesh=mesh8)
    sb = dist.shard(b, 8, mesh=mesh8)
    per_panel = np.asarray(
        jax.device_get(panels.symbolic_flops_panels(s, sb, mesh=mesh8))
    )
    step_cap = int(per_panel.max()) - 1          # one step over cap...
    assert per_panel.sum(axis=1).max() <= 8 * step_cap  # ...aggregate under
    c = panels.spgemm_panels(s, sb, step_cap=step_cap, mesh=mesh8)
    with pytest.raises(ValueError):
        dist.unshard(c)
