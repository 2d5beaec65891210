"""Blocked (row-packed, batched-sort) ESC SpGEMM vs the oracle and ESC.

The compile-bounded formulation that lifts the ~2M-product ceiling
(scripts/probe_sort.py measurements); must agree bit-exact with the host
oracle on the u64 saturating semiring (reference agreement discipline,
src/graph_magnus.rs:859-881).
"""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64
from sparsetpu.graphs import generate
from sparsetpu.ops.escb import merge_disjoint_rows, pack_rows, spgemm_blocked
from sparsetpu.ops.spgemm import spgemm_auto
from sparsetpu.utils import oracle


def _to_map(rows, cols, vals):
    m = {}
    for r, c, v in zip(rows, cols, vals):
        k = (int(r), int(c))
        m[k] = m.get(k, 0) + int(v)
    return m


def _check_equal(c: SparseCSR, want_map, n):
    want = oracle.to_dense(want_map, n)
    got = np.zeros((n, n), np.uint64)
    rp, ci, v = c.to_numpy()
    rows = np.repeat(np.arange(n), np.diff(rp))
    got[rows, ci] = v
    assert np.array_equal(got, want)


def test_pack_rows_invariants():
    fr = np.array([5, 100, 3, 64, 0, 31], np.int64)
    p2r, starts, nb = pack_rows(fr, 128)
    assert sorted(p2r.tolist()) == list(range(6))
    # rows never straddle blocks and blocks never overfill
    ends = starts + fr[p2r]
    assert np.all(starts // 128 == (ends - np.minimum(fr[p2r], 1)) // 128)
    for b in range(nb):
        in_b = (starts // 128) == b
        assert fr[p2r][in_b].sum() <= 128


@pytest.mark.parametrize("case", ["torus", "er", "powerlaw"])
def test_blocked_matches_oracle(case):
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
    amap = _to_map(rows, cols, vals)
    want = oracle.matmul(amap, amap)
    # small L forces multi-block packing; wide rows exercise the L2 path
    c = spgemm_blocked(a, a, L=256).check()
    _check_equal(c, want, n)
    # agreement with the routed kernel too
    c2 = spgemm_auto(a, a)
    assert int(c.nnz) == int(c2.nnz)


def test_blocked_empty_and_identity():
    n = 8
    eye = SparseCSR.from_coo_host(
        np.arange(n), np.arange(n), np.ones(n, np.uint64), n, sr=U64
    )
    c = spgemm_blocked(eye, eye, L=16).check()
    rp, ci, v = c.to_numpy()
    assert int(c.nnz) == n
    assert np.array_equal(ci, np.arange(n))
    assert np.all(v == 1)


def test_merge_disjoint_rows():
    n = 6
    c1 = SparseCSR.from_coo_host(
        np.array([0, 0, 2]), np.array([1, 3, 2]),
        np.array([7, 8, 9], np.uint64), n, sr=U64)
    c2 = SparseCSR.from_coo_host(
        np.array([1, 5]), np.array([0, 5]),
        np.array([3, 4], np.uint64), n, sr=U64)
    m = merge_disjoint_rows(c1, c2, out_cap=8).check()
    want = _to_map([0, 0, 2, 1, 5], [1, 3, 2, 0, 5], [7, 8, 9, 3, 4])
    _check_equal(m, want, n)


def test_escb_narrow_matches_wide():
    """escb's single-limb narrow mode agrees bit-exactly with the wide
    path, including hi limbs reconstructed from lane-merge plane carries."""
    from sparsetpu.ops.escb import _numeric, pack_rows, row_flops, \
        spgemm_blocked

    rng = np.random.default_rng(31)
    n = 250
    r = rng.integers(0, n, 3000)
    c = rng.integers(0, n, 3000)
    v = rng.integers(1, 60000, 3000).astype(np.uint64)
    a = SparseCSR.from_coo_host(r, c, v, n)
    got = spgemm_blocked(a, a).check()  # auto-detects narrow
    import scipy.sparse as ss

    # u64 scipy matmul is exact here: totals stay far below 2^63
    sa = ss.coo_matrix((v.astype(np.int64), (r, c)), shape=(n, n)).tocsr()
    sa.sum_duplicates()
    ref = (sa @ sa).toarray().astype(np.uint64)
    got_d = got.to_dense_numpy().astype(np.uint64)
    assert np.array_equal(got_d, ref)
    assert int(got_d.max()) > (1 << 32)  # hi limbs genuinely exercised
