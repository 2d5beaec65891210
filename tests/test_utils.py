"""Host utility tests: DenseBTree index structure, datasets, configs."""

import numpy as np
import pytest

from sparsetpu.bench.configs import CHAIN_CONFIGS
from sparsetpu.graphs import datasets
from sparsetpu.utils.dense_btree import DenseBTree, DenseBTreeList, overhead_sweep


class TestDenseBTree:
    @pytest.mark.parametrize("n", [0, 1, 5, 16, 17, 255, 256, 257, 4096, 5000])
    def test_index_exhaustive(self, n):
        rng = np.random.default_rng(n)
        keys = np.unique(rng.integers(0, max(4 * n, 8), size=n).astype(np.uint32))
        t = DenseBTree.from_sorted(keys)
        # every present key found at its exact position
        for i, k in enumerate(keys):
            assert t.index(k) == i
        # absent keys -> None
        present = set(int(k) for k in keys)
        for probe in rng.integers(0, max(4 * n, 8) + 3, size=50):
            if int(probe) not in present:
                assert t.index(np.uint32(probe)) is None

    def test_overhead_asymptote(self):
        t = DenseBTree.from_sorted(np.arange(100000, dtype=np.uint32))
        # -> 1/15 ~ 6.67% (reference bench_report.md:97-129)
        assert 0.06 < t.overhead() < 0.072

    def test_list_packing(self):
        rows = [np.array([1, 5, 9], np.uint32), np.array([], np.uint32),
                np.arange(100, dtype=np.uint32)]
        tl = DenseBTreeList.from_rows(rows)
        assert tl.index(0, 5) == 1
        assert tl.index(0, 4) is None
        assert tl.index(2, 42) == 3 + 0 + 42
        assert tl.index(1, 1) is None

    def test_overhead_sweep_csv(self):
        csv = overhead_sweep(max_n=500, step=117)
        assert csv.startswith("n,overhead")
        assert len(csv.strip().split("\n")) > 3


class TestDatasets:
    def test_power_law_skew(self):
        coo = datasets.power_law(2000, m_per_node=3, seed=1)
        max_deg, mean_deg = datasets.degree_stats(coo)
        # hubs: max degree far above mean (skewed-degree stress property)
        assert max_deg > 8 * mean_deg
        rows, cols, vals, n = coo
        assert n == 2000
        # undirected
        d = {(int(r), int(c)) for r, c in zip(rows, cols)}
        assert all((c, r) in d for r, c in d)

    def test_load_edges(self, tmp_path):
        p = tmp_path / "toy.edges"
        p.write_text("# comment\n0 1\n1 2\n0 1\n")
        rows, cols, vals, n = datasets.load_edges(str(p))
        assert n == 3
        assert vals.sum() == 3  # duplicate edge counted


def test_chain_configs():
    cfg = CHAIN_CONFIGS["torus30"]
    assert cfg.n == 27000 and cfg.n % cfg.block == 0
    assert cfg.half_width == 931


def test_spgemm_surface_plot(tmp_path):
    from sparsetpu.bench.report import try_plot_spgemm_surface

    csv = "\n".join([
        "case,n,e_per_n,nnz_a,flops,nnz_c,algo,seconds,mproducts_per_s",
        "er,1000,2,2000,4000,3900,esc,0.001,4.0",
        "er,1000,2,2000,4000,3900,rowcat,0.002,2.0",
        "er,27000,8,216000,1700000,1690000,esc,DNF_compile,0.0",
        "er,27000,8,216000,1700000,1690000,rowcat,0.05,34.0",
        "powerlaw,27000,8,216000,2000000,1900000,rowcat,0.06,33.0",
    ]) + "\n"
    out = str(tmp_path / "surface.png")
    assert try_plot_spgemm_surface(csv, out)
    import os
    assert os.path.getsize(out) > 0
