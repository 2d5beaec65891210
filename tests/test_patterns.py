"""Dense int8 pattern engine (graphs/patterns.py): differential tests vs
the sparse ESC route and scipy — the dense route must give identical
answers on every algorithm it fast-paths (reference discipline:
agreement-before-timing, src/graph_magnus.rs:859-881)."""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64
from sparsetpu.graphs import algos, generate, patterns


def _dev(coo, capacity=None):
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=U64, capacity=capacity)


def _random_graphs():
    rng = np.random.default_rng(7)
    out = []
    for n, e in ((12, 20), (30, 45), (50, 60)):
        r = rng.integers(0, n, e)
        c = rng.integers(0, n, e)
        keep = r != c
        out.append((n, r[keep], c[keep]))
    return out


class TestRoundtrip:
    def test_from_to_csr(self):
        a = _dev(generate.lattice([4, 4], torus=True))
        x = patterns.from_csr(a)
        np.testing.assert_array_equal(
            np.asarray(x), (a.to_dense_numpy() > 0).astype(np.int8))
        back = patterns.to_csr(x, a.sr, capacity=a.capacity)
        np.testing.assert_array_equal(
            (back.to_dense_numpy() > 0), (a.to_dense_numpy() > 0))

    def test_matmul_is_boolean_product(self):
        rng = np.random.default_rng(3)
        x = (rng.random((17, 17)) < 0.2).astype(np.int8)
        import jax.numpy as jnp

        got = np.asarray(patterns.matmul(jnp.asarray(x), jnp.asarray(x)))
        want = ((x.astype(np.int64) @ x.astype(np.int64)) > 0).astype(np.int8)
        np.testing.assert_array_equal(got, want)


class TestDifferential:
    """Dense route vs forced-sparse route on the same inputs."""

    @pytest.mark.parametrize("gi", range(3))
    def test_power_until_stable(self, gi):
        n, r, c = _random_graphs()[gi]
        a = algos.add(
            _dev(generate.from_edges(n, list(zip(r, c)), undirected=True)),
            SparseCSR.identity(n, sr=U64))
        s_d, k_d = algos.power_until_stable(a, pattern=True, dense="always")
        s_s, k_s = algos.power_until_stable(a, pattern=True, dense="never")
        assert k_d == k_s
        np.testing.assert_array_equal(
            s_d.to_dense_numpy() > 0, s_s.to_dense_numpy() > 0)

    @pytest.mark.parametrize("gi", range(3))
    def test_reachability(self, gi):
        n, r, c = _random_graphs()[gi]
        a = _dev(generate.from_edges(n, list(zip(r, c))))
        s_d, k_d = algos.reachability_sum(a, pattern=True, dense="always")
        s_s, k_s = algos.reachability_sum(a, pattern=True, dense="never")
        assert k_d == k_s
        np.testing.assert_array_equal(
            s_d.to_dense_numpy() > 0, s_s.to_dense_numpy() > 0)

    @pytest.mark.parametrize("gi", range(3))
    def test_components_closure(self, gi):
        n, r, c = _random_graphs()[gi]
        a = _dev(generate.from_edges(n, list(zip(r, c)), undirected=True))
        got = algos.connected_components_closure(a, dense="always")
        want = algos.connected_components(a)  # label propagation
        np.testing.assert_array_equal(got, want)

    def test_diameter_chain_and_torus(self):
        n = 9
        edges = [(i, i + 1) for i in range(n - 1)]
        a = _dev(generate.from_edges(n, edges, undirected=True))
        assert algos.diameter(a, dense="always") == 8
        assert algos.diameter(a, dense="never") == 8
        t = _dev(generate.lattice([5, 5], torus=True))
        assert algos.diameter(t, dense="always") == 2

    def test_diameter_vs_scipy_bfs(self):
        # random connected graph: compare against an explicit BFS oracle
        rng = np.random.default_rng(11)
        n = 24
        edges = [(i, (i + 1) % n) for i in range(n)]  # ring keeps it connected
        extra = rng.integers(0, n, (8, 2))
        edges += [(int(u), int(v)) for u, v in extra if u != v]
        a = _dev(generate.from_edges(n, edges, undirected=True))
        import scipy.sparse as ssp
        import scipy.sparse.csgraph as csg

        d = csg.shortest_path(
            ssp.csr_matrix((a.to_dense_numpy() > 0).astype(np.int8)),
            unweighted=True)
        want = int(d.max())
        assert algos.diameter(a, dense="always") == want

    def test_diameter_star(self):
        # stable at the very first squaring (diameter 2): exercises the
        # k==1 refinement start
        edges = [(0, i) for i in range(1, 6)]
        a = _dev(generate.from_edges(6, edges, undirected=True))
        assert algos.diameter(a, dense="always") == 2

    def test_diameter_complete(self):
        # closure == base: diameter 1 (refinement from base at d=1)
        n = 5
        edges = [(i, j) for i in range(n) for j in range(n) if i != j]
        a = _dev(generate.from_edges(n, edges))
        assert algos.diameter(a, dense="always") == 1


class TestRouting:
    def test_auto_routes_small_dense(self):
        assert patterns.fits(2708)
        assert patterns.fits(27000)
        assert not patterns.fits(65000)  # nell stays sparse
