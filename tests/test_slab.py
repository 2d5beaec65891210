"""Slab ESC SpGEMM (ops/slab.py) vs the oracle, escb, and edge cases.

The per-entry row-gather formulation that removes the per-product gather
floor; must agree bit-exact with the host oracle on the u64 saturating
semiring (reference agreement discipline, src/graph_magnus.rs:859-881).
"""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, U32, F32SR
from sparsetpu.graphs import generate
from sparsetpu.ops.slab import pack_rows_ordered, spgemm_slab
from sparsetpu.utils import oracle


def _to_map(rows, cols, vals):
    m = {}
    for r, c, v in zip(rows, cols, vals):
        k = (int(r), int(c))
        m[k] = m.get(k, 0) + int(v)
    return m


def _check_equal(c: SparseCSR, want_map, n, m=None):
    m = m or n
    want = oracle.to_dense(want_map, n) if m == n else None
    got = np.zeros((n, m), np.uint64)
    rp, ci, v = c.to_numpy()
    rows = np.repeat(np.arange(n), np.diff(rp))
    got[rows, ci] = v
    assert np.array_equal(got, want)


def test_pack_rows_ordered_invariants():
    rc = np.array([5, 100, 3, 64, 0, 31], np.int64)
    sel, starts, nb = pack_rows_ordered(rc, 128)
    # natural order preserved, zero rows skipped
    assert sel.tolist() == [0, 1, 2, 3, 5]
    ends = starts + rc[sel]
    # rows never straddle blocks, blocks never overfill
    for s, e_, f in zip(starts, ends, rc[sel]):
        assert s // 128 == (e_ - 1) // 128
    for b in range(nb):
        in_b = (starts // 128) == b
        assert rc[sel][in_b].sum() <= 128
    # blocks cover ascending row ranges (needed for global key order)
    assert np.all(np.diff(starts) > 0)


@pytest.mark.parametrize("case", ["torus", "er", "powerlaw"])
def test_slab_matches_oracle(case):
    if case == "torus":
        rows, cols, vals, n = generate.thin(
            generate.lattice([5, 5, 5], torus=True), 0.4, seed=3
        )
    elif case == "er":
        rows, cols, vals, n = generate.random_graph(400, 3200, seed=11)
    else:
        from sparsetpu.graphs import datasets

        rows, cols, vals, n = datasets.power_law(400, 6, seed=5)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    want = oracle.matmul(_to_map(rows, cols, vals), _to_map(rows, cols, vals))
    c = spgemm_slab(a, a)
    _check_equal(c, want, n)


def test_slab_small_L_forces_many_blocks_and_wide_rows():
    # L tiny so most rows go through the packed path in many blocks and
    # the hub rows exercise the wide-row program + disjoint merge
    from sparsetpu.graphs import datasets

    rows, cols, vals, n = datasets.power_law(300, 5, seed=7)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    want = oracle.matmul(_to_map(rows, cols, vals), _to_map(rows, cols, vals))
    c = spgemm_slab(a, a, L=256, C=4)
    _check_equal(c, want, n)


def test_slab_wide_values_two_limb_path():
    # values >= 2^32 force the general (non-narrow) 2-limb pipeline,
    # and saturation must engage on the product sums
    big = np.uint64(1 << 40)
    rows = np.array([0, 0, 1, 2, 2, 2])
    cols = np.array([1, 2, 0, 0, 1, 2])
    vals = np.array([big, 3, big, 5, big * 2, 7], np.uint64)
    a = SparseCSR.from_coo_host(rows, cols, vals, 3, sr=U32 if False else U64)
    want = oracle.matmul(_to_map(rows, cols, vals),
                         _to_map(rows, cols, vals))
    c = spgemm_slab(a, a)
    _check_equal(c, want, 3)


def test_slab_u32_and_f32():
    rows, cols, vals, n = generate.random_graph(200, 1400, seed=2)
    a32 = SparseCSR.from_coo_host(rows, cols, vals.astype(np.uint32), n,
                                  sr=U32)
    c32 = spgemm_slab(a32, a32)
    d = np.zeros((n, n), np.uint64)
    d[rows, cols] = vals
    want32 = np.minimum(d.astype(object) @ d.astype(object), 2**32 - 1)
    got = np.zeros((n, n), np.uint64)
    rp, ci, v = c32.to_numpy()
    got[np.repeat(np.arange(n), np.diff(rp)), ci] = v
    assert np.array_equal(got.astype(object), want32)

    fvals = (vals % 7 + 1).astype(np.float32)
    af = SparseCSR.from_coo_host(rows, cols, fvals, n, sr=F32SR)
    cf = spgemm_slab(af, af)
    df = np.zeros((n, n), np.float32)
    df[rows, cols] = fvals
    rp, ci, v = cf.to_numpy()
    gotf = np.zeros((n, n), np.float32)
    gotf[np.repeat(np.arange(n), np.diff(rp)), ci] = v
    np.testing.assert_allclose(gotf, df @ df, rtol=1e-6)


def test_slab_chain_steps_vs_scipy():
    coo = generate.thin(generate.lattice([6, 6, 6], torus=True),
                        3.0 / 26.0, seed=42)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    cur = a
    cur_coo = coo
    for step in (2, 3):
        cur = spgemm_slab(cur, a)
        want = oracle.scipy_matmul_int(cur_coo, coo)
        got = cur.to_dense_numpy()
        assert np.array_equal(got, oracle.to_dense(want, n))
        rp, ci, v = cur.to_numpy()
        cur_coo = (np.repeat(np.arange(n), np.diff(rp)), ci, v, n)


def test_slab_rectangular():
    # (4 x 6) x (6 x 3): rectangular shapes through the whole pipeline
    ra = np.array([0, 0, 1, 3])
    ca = np.array([5, 1, 0, 2])
    va = np.array([2, 3, 4, 5], np.uint64)
    rb = np.array([0, 1, 2, 5])
    cb = np.array([1, 2, 0, 2])
    vb = np.array([7, 1, 9, 11], np.uint64)
    a = SparseCSR.from_coo_host(ra, ca, va, 4, n_cols=6, sr=U64)
    b = SparseCSR.from_coo_host(rb, cb, vb, 6, n_cols=3, sr=U64)
    c = spgemm_slab(a, b)
    da = np.zeros((4, 6), np.uint64)
    da[ra, ca] = va
    db = np.zeros((6, 3), np.uint64)
    db[rb, cb] = vb
    assert np.array_equal(c.to_dense_numpy(), da @ db)


def test_slab_large_nm_local_keys():
    # n * m > 2^31: the global fused key r*m+j wraps int32 (the latent
    # escb hazard at nell/ogbn scale); block-local keys must not.
    n = 70000
    rows = np.array([0, 1, 69999, 69999, 35000])
    cols = np.array([69999, 0, 69998, 0, 35000])
    vals = np.array([3, 5, 7, 11, 13], np.uint64)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    want = oracle.matmul(_to_map(rows, cols, vals),
                         _to_map(rows, cols, vals))
    c = spgemm_slab(a, a)
    rp, ci, v = c.to_numpy()
    got = {}
    rr = np.repeat(np.arange(n), np.diff(rp))
    for r_, c_, v_ in zip(rr, ci, v):
        got[(int(r_), int(c_))] = int(v_)
    assert got == {k: int(v_) for k, v_ in want.items() if v_}


def test_slab_empty_and_poison():
    e = SparseCSR.empty(5, 5, 4, U64)
    c = spgemm_slab(e, e)
    assert int(c.nnz) == 0
    # undersized out_cap must poison nnz to -1
    rows, cols, vals, n = generate.random_graph(100, 800, seed=4)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    bad = spgemm_slab(a, a, out_cap=16)
    assert int(bad.nnz) == -1
    with pytest.raises(ValueError):
        bad.check()


def test_slab_matches_escb():
    from sparsetpu.ops.escb import spgemm_blocked

    rows, cols, vals, n = generate.random_graph(300, 2500, seed=9)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    c1 = spgemm_slab(a, a)
    c2 = spgemm_blocked(a, a)
    assert int(c1.nnz) == int(c2.nnz)
    assert np.array_equal(c1.to_dense_numpy(), c2.to_dense_numpy())


def test_slab_poison_propagates():
    import dataclasses
    import jax.numpy as jnp

    rows, cols, vals, n = generate.random_graph(50, 200, seed=6)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    bad = dataclasses.replace(a, nnz=jnp.asarray(-1, jnp.int32))
    out = spgemm_slab(bad, a)
    assert int(out.nnz) == -1
    out2 = spgemm_slab(a, bad)
    assert int(out2.nnz) == -1
