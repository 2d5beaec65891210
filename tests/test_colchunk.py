"""Column-chunked MAGNUS-style SpGEMM (ops/colchunk.py) vs the oracle.

Budget forced small so the chunking, uniform-padding, and per-row
interleave paths actually engage at test sizes (reference agreement
discipline, src/graph_magnus.rs:859-881)."""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, F32SR
from sparsetpu.graphs import generate
from sparsetpu.ops.colchunk import plan_chunks, spgemm_colchunk
from sparsetpu.ops.spgemm import spgemm_auto
from sparsetpu.utils import oracle


def _dense_u64(c: SparseCSR, n, m):
    got = np.zeros((n, m), np.uint64)
    rp, ci, v = c.to_numpy()
    rows = np.repeat(np.arange(n), np.diff(rp))
    got[rows, ci] = v
    return got


def _oracle_u64(a: SparseCSR, b: SparseCSR):
    rp, ci, v = a.to_numpy()
    rows = np.repeat(np.arange(a.n_rows), np.diff(rp))
    am = {(int(r), int(c)): int(x) for r, c, x in zip(rows, ci, v)}
    rp, ci, v = b.to_numpy()
    rows = np.repeat(np.arange(b.n_rows), np.diff(rp))
    bm = {(int(r), int(c)): int(x) for r, c, x in zip(rows, ci, v)}
    return oracle.matmul(am, bm)


def _want_dense(a, b):
    want_map = _oracle_u64(a, b)
    want = np.zeros((a.n_rows, b.n_cols), np.uint64)
    for (r, c), x in want_map.items():
        want[r, c] = x
    return want


def test_colchunk_matches_oracle_er():
    rows, cols, vals, n = generate.random_graph(300, 2400, seed=7)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    c = spgemm_colchunk(a, a, slot_budget=4096).check()
    assert np.array_equal(_dense_u64(c, n, n), _want_dense(a, a))
    # row streams must stay column-sorted after the per-row interleave
    rp, ci, _ = c.to_numpy()
    for r in range(n):
        seg = ci[rp[r]:rp[r + 1]]
        assert np.all(np.diff(seg) > 0), r


def test_colchunk_single_chunk_delegates():
    rows, cols, vals, n = generate.random_graph(60, 240, seed=3)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    c = spgemm_colchunk(a, a, slot_budget=1 << 22).check()
    assert np.array_equal(_dense_u64(c, n, n), _want_dense(a, a))


def test_colchunk_rectangular_and_values():
    rng = np.random.default_rng(11)
    n, kk, m = 80, 50, 120
    ra = rng.integers(0, n, 400)
    ca = rng.integers(0, kk, 400)
    va = rng.integers(1, 1000, 400).astype(np.uint64)
    rb = rng.integers(0, kk, 500)
    cb = rng.integers(0, m, 500)
    vb = rng.integers(1, 1000, 500).astype(np.uint64)
    a = SparseCSR.from_coo_host(ra, ca, va, n, n_cols=kk, sr=U64)
    b = SparseCSR.from_coo_host(rb, cb, vb, kk, n_cols=m, sr=U64)
    c = spgemm_colchunk(a, b, slot_budget=2048).check()
    assert np.array_equal(_dense_u64(c, n, m), _want_dense(a, b))


def test_colchunk_agrees_with_auto_powerlaw():
    from sparsetpu.graphs.datasets import power_law

    rows, cols, vals, n = power_law(500, 4, seed=5)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    ref = spgemm_auto(a, a).check()
    c = spgemm_colchunk(a, a, slot_budget=8192).check()
    assert int(c.nnz) == int(ref.nnz)
    assert np.array_equal(_dense_u64(c, n, n), _dense_u64(ref, n, n))


def test_colchunk_wide_hub_rows():
    # one hub row whose products in a single chunk exceed the narrow
    # lane budget -> wide program + merge path
    rng = np.random.default_rng(2)
    n = 600
    hub_cols = np.arange(1, n, 2)
    rows = np.concatenate([np.zeros(len(hub_cols), np.int64),
                           rng.integers(0, n, 800)])
    cols = np.concatenate([hub_cols, rng.integers(0, n, 800)])
    vals = np.ones(len(rows), np.uint64)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    c = spgemm_colchunk(a, a, slot_budget=4096, l=1024).check()
    assert np.array_equal(_dense_u64(c, n, n), _want_dense(a, a))


def test_colchunk_poison_propagates():
    import dataclasses
    import jax.numpy as jnp

    rows, cols, vals, n = generate.random_graph(60, 240, seed=3)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    bad = dataclasses.replace(a, nnz=jnp.asarray(-1, jnp.int32))
    out = spgemm_colchunk(a, bad, slot_budget=1024)
    assert int(out.nnz) < 0
    with pytest.raises(ValueError):
        out.check()


def test_plan_chunks_balance():
    rows, cols, vals, n = generate.random_graph(400, 4000, seed=9)
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    bnd, fk = plan_chunks(a, a, slot_budget=4096)
    assert bnd[0] == 0 and bnd[-1] == n
    assert fk.sum() == sum(
        fk2 for fk2 in fk)  # trivially consistent
    from sparsetpu.ops.spgemm import symbolic_flops_exact

    assert int(fk.sum()) == symbolic_flops_exact(a, a)
    # every chunk under the budget discount
    assert int(fk.max()) <= 4096
