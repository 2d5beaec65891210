"""SpGEMM / SpAdd differential tests vs the exact Python oracle.

Mirrors the reference's cross-implementation agreement discipline
(src/graph_magnus.rs:859-881): assert nnz equality and full element-wise
value equality on the saturating semiring before any benchmarking.
"""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U32, U64, F32SR, spadd, spgemm, spgemm_auto, symbolic_flops
from sparsetpu.graphs import generate
from sparsetpu.utils import oracle


def _to_device(coo, sr=U64, capacity=None):
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=sr, capacity=capacity)


def _assert_matches(got: SparseCSR, want_dict, n):
    want = oracle.to_dense(want_dict, n)
    np.testing.assert_array_equal(got.to_dense_numpy(), want)
    assert int(got.nnz) == len(want_dict)


class TestSpgemmSmall:
    def test_identity_matmul(self):
        coo = generate.lattice([2, 3], torus=False)
        a = _to_device(coo)
        i = SparseCSR.identity(6, sr=U64)
        c = spgemm_auto(a, i)
        np.testing.assert_array_equal(c.to_dense_numpy(), a.to_dense_numpy())

    def test_triangle_path_counts(self):
        # canonical battery: A^2/A^3 on a triangle counts paths
        # (reference test battery, src/graph_csr.rs:873-1145)
        coo = generate.from_edges(3, [(0, 1), (1, 2), (2, 0)], undirected=True)
        a = _to_device(coo)
        d = oracle.coo_to_dict(coo)
        a2 = spgemm_auto(a, a)
        _assert_matches(a2, oracle.matmul(d, d), 3)
        a3 = spgemm_auto(a2, a)
        _assert_matches(a3, oracle.matmul(oracle.matmul(d, d), d), 3)
        # A^3 diagonal counts round-trips: 2 triangles each way
        assert a3.get(0, 0) == 2

    def test_parallel_edges_multigraph(self):
        coo = generate.from_edges(2, [(0, 1), (0, 1), (1, 0)])
        a = _to_device(coo)
        d = oracle.coo_to_dict(coo)
        c = spgemm_auto(a, a)
        _assert_matches(c, oracle.matmul(d, d), 2)
        assert c.get(0, 0) == 2  # 2 paths 0->1->0

    def test_diamond_two_paths(self):
        coo = generate.from_edges(4, [(0, 1), (0, 2), (1, 3), (2, 3)])
        a = _to_device(coo)
        c = spgemm_auto(a, a)
        assert c.get(0, 3) == 2
        assert int(c.nnz) == 1

    def test_rectangular(self):
        rng = np.random.default_rng(5)
        da = rng.integers(0, 3, (4, 7)).astype(np.uint64)
        db = rng.integers(0, 3, (7, 5)).astype(np.uint64)
        a = SparseCSR.from_dense_numpy(da, sr=U64)
        b = SparseCSR.from_dense_numpy(db, sr=U64)
        c = spgemm_auto(a, b)
        np.testing.assert_array_equal(c.to_dense_numpy(), da @ db)

    def test_undersized_capacity_poisons_nnz(self):
        # silent truncation is forbidden: too-small expand_cap -> nnz == -1
        coo = generate.lattice([4, 4], torus=True)
        a = _to_device(coo)
        flops = int(symbolic_flops(a, a))
        c = spgemm(a, a, expand_cap=flops // 2)
        assert int(c.nnz) == -1
        with pytest.raises(ValueError, match="capacity overflow"):
            c.check()
        # properly sized: check() passes
        spgemm(a, a, expand_cap=flops).check()

    def test_empty_result(self):
        a = SparseCSR.from_coo([0], [1], [1], 3, sr=U64)
        b = SparseCSR.from_coo([0], [2], [1], 3, sr=U64)
        # A has col 1, B has only row 0 -> no products
        c = spgemm(a, b, expand_cap=4)
        assert int(c.nnz) == 0
        assert int(symbolic_flops(a, b)) == 0

    def test_saturation_u32(self):
        big = 0xFFFFFFF0
        a = SparseCSR.from_coo([0, 0], [0, 1], [big, big], 2, sr=U32)
        b = SparseCSR.from_coo([0, 1], [0, 0], [2, 3], 2, sr=U32)
        c = spgemm_auto(a, b)
        # both products saturate; their sum saturates
        assert c.get(0, 0) == 0xFFFFFFFF

    def test_saturation_u64(self):
        big = (1 << 63) + 12345
        a = SparseCSR.from_coo([0, 0], [0, 1], [big, 7], 2, sr=U64)
        b = SparseCSR.from_coo([0, 1], [0, 0], [3, 11], 2, sr=U64)
        c = spgemm_auto(a, b)
        assert c.get(0, 0) == 0xFFFFFFFFFFFFFFFF  # big*3 saturates, +77 stays
        d = oracle.matmul(
            {(0, 0): big, (0, 1): 7}, {(0, 0): 3, (1, 0): 11}, "u64"
        )
        assert c.get(0, 0) == d[(0, 0)]

    def test_f32_semiring(self):
        rng = np.random.default_rng(6)
        da = (rng.random((5, 5)) * (rng.random((5, 5)) < 0.5)).astype(np.float32)
        db = (rng.random((5, 5)) * (rng.random((5, 5)) < 0.5)).astype(np.float32)
        a = SparseCSR.from_dense_numpy(da, sr=F32SR)
        b = SparseCSR.from_dense_numpy(db, sr=F32SR)
        c = spgemm_auto(a, b)
        got = c.to_dense_numpy()
        np.testing.assert_allclose(got, da @ db, rtol=1e-6)


class TestSpgemmRandomDifferential:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("n,m", [(10, 30), (50, 200), (100, 150)])
    def test_vs_oracle(self, seed, n, m):
        coo_a = generate.random_graph(n, m, seed=seed)
        coo_b = generate.random_graph(n, m, seed=seed + 100)
        a, b = _to_device(coo_a), _to_device(coo_b)
        da, db = oracle.coo_to_dict(coo_a), oracle.coo_to_dict(coo_b)
        c = spgemm_auto(a, b)
        _assert_matches(c, oracle.matmul(da, db), n)

    def test_lattice_power(self):
        coo = generate.lattice([4, 4, 4], torus=True)
        a = _to_device(coo)
        d = oracle.coo_to_dict(coo)
        a2 = spgemm_auto(a, a)
        _assert_matches(a2, oracle.matmul(d, d), 64)


class TestSpAdd:
    def test_basic(self):
        a = SparseCSR.from_coo([0, 1], [1, 0], [1, 2], 2, sr=U64)
        b = SparseCSR.from_coo([0, 0], [0, 1], [5, 7], 2, sr=U64)
        c = spadd(a, b)
        want = np.array([[5, 8], [2, 0]], np.uint64)
        np.testing.assert_array_equal(c.to_dense_numpy(), want)

    def test_vs_oracle_random(self):
        coo_a = generate.random_graph(30, 100, seed=9)
        coo_b = generate.random_graph(30, 80, seed=10)
        c = spadd(_to_device(coo_a), _to_device(coo_b))
        want = oracle.add(oracle.coo_to_dict(coo_a), oracle.coo_to_dict(coo_b))
        _assert_matches(c, want, 30)

    def test_saturating(self):
        a = SparseCSR.from_coo([0], [0], [0xFFFFFFFFFFFFFFF0], 1, sr=U64)
        b = SparseCSR.from_coo([0], [0], [0x100], 1, sr=U64)
        c = spadd(a, b)
        assert c.get(0, 0) == 0xFFFFFFFFFFFFFFFF


class TestChooseStrategy:
    def test_torus_chain_routes_dense_acc(self):
        from sparsetpu.ops.hybrid import choose_strategy
        from sparsetpu.graphs import generate

        coo = generate.lattice([8, 8, 8], torus=True)
        coo = generate.thin(coo, 3.0 / 26.0, seed=42)
        rows, cols, vals, n = coo
        a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
        # 8^3 torus: bandwidth ~ 73 of n=512 -> one product already covers
        # >50% of the matrix -> dense-accumulator chain
        assert choose_strategy(a, steps=6) == "dense-acc"

    def test_narrow_band_routes_band(self):
        from sparsetpu.ops.hybrid import choose_strategy

        n = 4096
        r = np.arange(n - 1)
        rows = np.concatenate([r, r + 1])
        cols = np.concatenate([r + 1, r])
        a = SparseCSR.from_coo_host(rows, cols, np.ones(len(rows)), n, sr=U64)
        assert choose_strategy(a, steps=1) == "band"

    def test_scattered_routes_esc(self):
        from sparsetpu.ops.hybrid import choose_strategy
        from sparsetpu.graphs import generate

        coo = generate.random_graph(4096, 8192, seed=1)
        rows, cols, vals, n = coo
        a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
        # random graph: full-width band, nearly empty -> ESC
        assert choose_strategy(a, steps=1) == "esc"

    def test_big_values_route_esc(self):
        from sparsetpu.ops.hybrid import choose_strategy

        a = SparseCSR.from_coo_host([0, 1], [1, 0], [1 << 40, 1], 4, sr=U64)
        assert choose_strategy(a) == "esc"


def test_symbolic_flops_exact_matches_device():
    from sparsetpu.ops.spgemm import symbolic_flops, symbolic_flops_exact

    coo = generate.random_graph(50, 300, seed=9)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    assert symbolic_flops_exact(a, a) == int(symbolic_flops(a, a))


def test_spgemm_narrow_matches_wide():
    """Single-limb narrow ESC must agree bit-exactly with the 2-limb path,
    including hi-limb reconstruction from plane carries."""
    from sparsetpu.ops.spgemm import narrow_u64_ok, spgemm

    rng = np.random.default_rng(21)
    n = 300
    r = rng.integers(0, n, 4000)
    c = rng.integers(0, n, 4000)
    # duplicates merge by saturating ADD at build time, so stored values
    # can exceed the draw cap — keep max(A)^2 safely < 2^32, and plant a
    # dense row/column pair whose product C[0,5] sums past 2^32
    v = rng.integers(1, 1000, 4000).astype(np.uint64)
    ks = np.arange(n, dtype=np.int64)
    r = np.concatenate([r, np.zeros(n, np.int64), ks])
    c = np.concatenate([c, ks, np.full(n, 5, np.int64)])
    # 30000 keeps the worst merged value (the doubled (0,5) cell plus
    # random-duplicate spill) around 63k, so max(A)^2 stays under 2^32
    v = np.concatenate([v, np.full(2 * n, 30000, np.uint64)])
    a = SparseCSR.from_coo_host(r, c, v, n)
    assert narrow_u64_ok(a, a)
    cap = 1 << 22
    wide = spgemm(a, a, expand_cap=cap).check()
    nar = spgemm(a, a, expand_cap=cap, narrow=True).check()
    assert int(wide.nnz) == int(nar.nnz)
    rw, cw, vw = wide.to_numpy()
    rn, cn, vn = nar.to_numpy()
    assert np.array_equal(rw, rn) and np.array_equal(cw, cn)
    assert np.array_equal(vw, vn)
    # hi limbs really exercised: some totals exceed 2^32
    assert int(vw.max()) > (1 << 32)


def test_narrow_u64_ok_rejects_wide_values():
    from sparsetpu.ops.spgemm import narrow_u64_ok

    r = np.array([0, 1])
    c = np.array([1, 0])
    v = np.array([1 << 40, 3], np.uint64)
    a = SparseCSR.from_coo_host(r, c, v, 2)
    assert not narrow_u64_ok(a, a)
