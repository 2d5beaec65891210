"""Canonical-graph battery + graph algorithm tests.

The reference copy-pastes the same battery into every storage format
(src/graph_csr.rs:873-1145 etc.); here the single device format answers the
identical questions: lattice neighbor counts/symmetry/torus wrap,
reachability chains, power-until-stable, components, RCM round trips,
bandwidth stats.
"""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, spgemm_auto
from sparsetpu.graphs import algos, generate
from sparsetpu.utils import oracle


def _dev(coo, capacity=None):
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=U64, capacity=capacity)


class TestGenerators:
    def test_lattice_1d(self):
        d = _dev(generate.lattice([5], torus=False)).to_dense_numpy()
        # path graph: end nodes 1 neighbor, middle 2
        np.testing.assert_array_equal(d.sum(axis=1), [1, 2, 2, 2, 1])
        np.testing.assert_array_equal(d, d.T)

    def test_lattice_1d_torus(self):
        d = _dev(generate.lattice([5], torus=True)).to_dense_numpy()
        np.testing.assert_array_equal(d.sum(axis=1), [2] * 5)
        assert d[0, 4] == 1 and d[4, 0] == 1  # wrap-around

    def test_lattice_2d_neighbor_counts(self):
        d = _dev(generate.lattice([3, 3], torus=False)).to_dense_numpy()
        deg = d.sum(axis=1).reshape(3, 3)
        assert deg[0, 0] == 3 and deg[0, 1] == 5 and deg[1, 1] == 8

    def test_lattice_2d_torus_uniform(self):
        d = _dev(generate.lattice([4, 4], torus=True)).to_dense_numpy()
        np.testing.assert_array_equal(d.sum(axis=1), [8] * 16)

    def test_lattice_3d(self):
        coo = generate.lattice([3, 3, 3], torus=False)
        d = _dev(coo).to_dense_numpy()
        assert d.sum(axis=1)[13] == 26  # center of 3^3 has 26 Moore neighbors
        np.testing.assert_array_equal(d, d.T)

    def test_lattice_3d_torus(self):
        d = _dev(generate.lattice([3, 3, 3], torus=True)).to_dense_numpy()
        np.testing.assert_array_equal(d.sum(axis=1), [26] * 27)

    def test_random_no_self_loops(self):
        rows, cols, vals, n = generate.random_graph(20, 100, seed=1)
        assert not np.any(rows == cols)
        assert vals.sum() == 100  # multigraph draws preserved as counts

    def test_thin_symmetric(self):
        coo = generate.lattice([6, 6], torus=True)
        thinned = generate.thin(coo, 0.4, seed=2)
        d = _dev(thinned).to_dense_numpy()
        np.testing.assert_array_equal(d, d.T)
        full = _dev(coo).to_dense_numpy()
        assert d.sum() < full.sum()

    def test_from_adjacency(self):
        coo, names = generate.from_adjacency(
            [("a", "b"), ("b", "c"), ("a", "b")]
        )
        assert names == {"a": 0, "b": 1, "c": 2}
        d = _dev(coo).to_dense_numpy()
        assert d[0, 1] == 2  # duplicate edge summed
        assert d[1, 2] == 1


class TestAlgorithms:
    def test_reachability_chain(self):
        # directed chain 0->1->2->3: reachability sum covers all i<j pairs
        coo = generate.from_edges(4, [(0, 1), (1, 2), (2, 3)])
        total, k = algos.reachability_sum(_dev(coo))
        d = total.to_dense_numpy()
        want = np.triu(np.ones((4, 4), np.uint64), 1)
        np.testing.assert_array_equal((d > 0).astype(np.uint64), want)

    def test_power_until_stable_chain(self):
        # 16-chain with identity: stabilizes in <= 4 squarings
        n = 16
        edges = [(i, i + 1) for i in range(n - 1)]
        a = algos.add(_dev(generate.from_edges(n, edges, undirected=True)),
                      SparseCSR.identity(n, sr=U64))
        stable, k = algos.power_until_stable(a)
        assert k <= 5
        d = stable.to_dense_numpy()
        assert np.all(d > 0)  # connected: closure is full

    def test_components_two_triangles(self):
        edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
        a = _dev(generate.from_edges(6, edges, undirected=True))
        comp = algos.connected_components(a)
        np.testing.assert_array_equal(comp, [0, 0, 0, 1, 1, 1])
        comp2 = algos.connected_components_closure(a)
        np.testing.assert_array_equal(comp2, comp)
        assert algos.num_components(a) == 2

    def test_components_isolated(self):
        a = _dev(generate.from_edges(5, [(0, 1)], undirected=True))
        comp = algos.connected_components(a)
        np.testing.assert_array_equal(comp, [0, 0, 1, 2, 3])

    def test_bandwidth_stats(self):
        a = _dev(generate.from_edges(10, [(0, 9), (1, 2)], undirected=True))
        max_bw, avg_bw = algos.bandwidth_stats(a)
        assert max_bw == 9
        assert abs(avg_bw - 5.0) < 1e-9

    def test_rcm_reduces_bandwidth_and_roundtrips(self):
        # scramble an optimally-ordered lattice, then RCM must recover a
        # narrow band (RCM cannot improve an already-banded ordering)
        coo = generate.lattice([12, 4], torus=False)
        rng = np.random.default_rng(11)
        shuf = rng.permutation(48)
        a0 = _dev(coo)
        a = algos.permute(a0, shuf)
        before, _ = algos.bandwidth_stats(a)
        permuted, perm = algos.rcm(a)
        after, _ = algos.bandwidth_stats(permuted)
        assert after < before
        back = algos.unpermute(permuted, perm)
        np.testing.assert_array_equal(back.to_dense_numpy(), a.to_dense_numpy())

    def test_rcm_directed_roundtrip(self):
        # strongly-connected directed cycle (the reference's case,
        # src/graph_csr.rs:1133-1145)
        coo = generate.from_edges(
            5, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 3)]
        )
        a = _dev(coo)
        permuted, perm = algos.rcm(a)
        assert sorted(perm.tolist()) == list(range(5))
        back = algos.unpermute(permuted, perm)
        np.testing.assert_array_equal(back.to_dense_numpy(), a.to_dense_numpy())

    def test_rcm_weakly_connected_directed(self):
        # weakly-connected directed graph: peripheral BFS can re-enter
        # visited territory; perm must still be a valid permutation
        coo = generate.from_edges(6, [(0, 3), (3, 5), (1, 2)])
        a = _dev(coo)
        permuted, perm = algos.rcm(a)
        assert sorted(perm.tolist()) == list(range(6))
        back = algos.unpermute(permuted, perm)
        np.testing.assert_array_equal(back.to_dense_numpy(), a.to_dense_numpy())

    def test_diameter_chain(self):
        n = 9
        edges = [(i, i + 1) for i in range(n - 1)]
        a = _dev(generate.from_edges(n, edges, undirected=True))
        assert algos.diameter(a) == 8

    def test_diameter_torus(self):
        a = _dev(generate.lattice([5, 5], torus=True))
        # 5x5 Moore torus: max Chebyshev distance with wrap = 2
        assert algos.diameter(a) == 2


class TestChainAgreement:
    def test_small_torus_chain_vs_scipy(self):
        """A^2..A^5 on an 8x8x8 Moore torus vs scipy int64 oracle
        (small-scale version of the reference north-star chain)."""
        coo = generate.lattice([8, 8, 8], torus=True)
        coo = generate.thin(coo, 3.0 / 26.0, seed=42)
        a = _dev(coo)
        sp = oracle.scipy_matmul_int
        cur_coo = coo
        cur = a
        for step in range(2, 6):
            cur = spgemm_auto(cur, a)
            want = sp(cur_coo, coo)
            got = cur.to_dense_numpy()
            want_dense = oracle.to_dense(want, coo[3])
            np.testing.assert_array_equal(got, want_dense)
            # feed forward as coo for next oracle step
            r, c = np.nonzero(want_dense)
            cur_coo = (r.astype(np.int32), c.astype(np.int32), want_dense[r, c], coo[3])


class TestRealGraphSubstitutes:
    """The power-law stand-ins for the reference's real datasets must match
    the published degree moments (VERDICT r4 Missing #1 / ask #9): exact n,
    directed edges within 5%, and a hub tail at the published order."""

    def test_cora_substitute_moments(self):
        from sparsetpu.bench.real_graphs import load_or_synthesize

        name, coo = load_or_synthesize("cora", 2708, 10556)
        from sparsetpu.graphs import datasets

        stats = datasets.check_substitute("cora", coo)
        assert stats["max_deg"] >= 10 * stats["mean_deg"]

    def test_nell_substitute_moments(self):
        from sparsetpu.bench.real_graphs import load_or_synthesize
        from sparsetpu.graphs import datasets

        name, coo = load_or_synthesize("nell", 65755, 251550)
        datasets.check_substitute("nell", coo)

    def test_check_substitute_rejects_doubled_density(self):
        from sparsetpu.graphs import datasets

        coo = datasets.power_law(2708, 4, seed=1)  # ~2x cora's edges
        import pytest as _pytest

        with _pytest.raises(AssertionError):
            datasets.check_substitute("cora", coo)
