"""Benchmark-style long tests (reference --features long-tests analog).

Run with ``pytest -m long``.  Each bench cross-validates every
implementation before timing (the reference discipline,
src/graph_magnus.rs:859-881) and prints CSV rows to stdout.
"""

import time

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, spgemm_auto
from sparsetpu.bench.configs import CHAIN_CONFIGS, RANDOM_SWEEPS
from sparsetpu.graphs import datasets, generate
from sparsetpu.kernels import bandmm
from sparsetpu.ops import hybrid
from sparsetpu import native

pytestmark = pytest.mark.long


def _host_csr_from_coo(coo):
    rows, cols, vals, n = coo
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    row_ptr = np.searchsorted(rows, np.arange(n + 1)).astype(np.int64)
    return native.as_host_csr(row_ptr, cols, vals), n


def test_bench_repeated_exponentiation():
    """A^2..A^5 on torus12: ESC vs band vs native CPU, nnz agreement +
    CSV timing rows (reference bench_repeated_exponentiation,
    src/graph_magnus.rs:700-788)."""
    cfg = CHAIN_CONFIGS["torus12"]
    coo = generate.lattice(list(cfg.dims), torus=True)
    coo = generate.thin(coo, cfg.density, seed=cfg.seed)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    band_a, out = bandmm.csr_band_split(a, cfg.half_width, cfg.block, cyclic=True)
    assert int(out.nnz) == 0
    a_native, _ = _host_csr_from_coo(coo)

    print("\nstep,nnz,esc_s,band_s,native_s")
    prev_esc, prev_band, prev_nat = a, band_a, a_native
    for step in range(2, cfg.max_step + 1):
        t0 = time.perf_counter()
        c_esc = spgemm_auto(prev_esc, a)
        esc_t = time.perf_counter() - t0
        pl = bandmm.limbs_for_max(float(np.asarray(prev_band.data).max()))
        t0 = time.perf_counter()
        c_band = bandmm.band_matmul(prev_band, band_a, p_limbs=pl, a_limbs=1)
        import jax

        jax.block_until_ready(c_band.data)
        band_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        c_nat = native.spgemm(prev_nat, a_native, n)
        nat_t = time.perf_counter() - t0

        nnz_esc = int(c_esc.nnz)
        nnz_band = int(jax.device_get(c_band.nnz()))
        nnz_nat = len(c_nat[1])
        assert nnz_esc == nnz_band == nnz_nat, (step, nnz_esc, nnz_band, nnz_nat)
        # exact value agreement: ESC vs native
        rp, cc, cv = c_esc.to_numpy()
        np.testing.assert_array_equal(rp.astype(np.int64), c_nat[0])
        np.testing.assert_array_equal(cc, c_nat[1])
        np.testing.assert_array_equal(cv, c_nat[2])
        print(f"{step},{nnz_esc},{esc_t:.4f},{band_t:.4f},{nat_t:.4f}")
        prev_esc, prev_band, prev_nat = c_esc, c_band, c_nat


def test_bench_random_sweep():
    """ER grid (side x e/n): ESC vs native oracle agreement + CSV
    (reference bench_matmul_magnus grid, src/graph_magnus.rs:790-929)."""
    print("\nn,epn,nnz_in,nnz_out,esc_s,native_s")
    for n in (1000, 3375):
        for epn in (3.0, 5.0):
            coo = generate.random_graph(n, int(n * epn), seed=42)
            rows, cols, vals, _ = coo
            a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
            a_nat, _ = _host_csr_from_coo(coo)
            t0 = time.perf_counter()
            c = spgemm_auto(a, a)
            esc_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            c_nat = native.spgemm(a_nat, a_nat, n)
            nat_t = time.perf_counter() - t0
            assert int(c.nnz) == len(c_nat[1])
            rp, cc, cv = c.to_numpy()
            np.testing.assert_array_equal(cv, c_nat[2])
            print(f"{n},{epn},{int(a.nnz)},{int(c.nnz)},{esc_t:.4f},{nat_t:.4f}")


def test_bench_power_law_hybrid():
    """Skewed-degree stress: RCM + categorized hybrid vs ESC agreement
    (BASELINE config 4)."""
    from sparsetpu.graphs import algos

    coo = datasets.power_law(2000, m_per_node=3, seed=7)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    banded, perm = algos.rcm(a)
    bw, avg = algos.bandwidth_stats(banded)
    print(f"\npower-law n={n} nnz={int(a.nnz)} rcm_bw={bw} avg_bw={avg:.1f}")
    want = spgemm_auto(banded, banded)
    # categorize with a band narrower than the RCM bandwidth: hubs spill
    # into the outlier (ESC) path — the categorization split under stress
    h = hybrid.hybrid_from_csr(banded, half_width=min(bw, 256), block=8)
    n_out = int(h.outliers.nnz)
    print(f"band entries={int(h.band.nnz())} outliers={n_out}")
    c = hybrid.hybrid_matmul(h, h, a_csr=banded)
    got = c.to_csr(sr=U64)
    assert int(got.nnz) == int(want.nnz)
    np.testing.assert_array_equal(got.to_dense_numpy(), want.to_dense_numpy())


def test_bench_scaling_efficiency():
    """Sharded-chain scaling functional check on the virtual mesh
    (BASELINE north star: 1 chip -> N hosts; here work balance + agreement,
    wall clock being meaningless on shared host cores)."""
    from sparsetpu.bench import scaling

    coo = generate.lattice([8, 8, 8], torus=True)
    coo = generate.thin(coo, 0.3, seed=42)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
    results = scaling.measure_scaling(a, device_counts=(1, 2, 4, 8),
                                      steps=2, iters=1)
    print("\n" + scaling.scaling_csv(results))
    assert len(results) == 4
    # row blocks of a homogeneous torus stay balanced
    assert all(r.work_imbalance < 1.5 for r in results)


def test_engine_bench_smoke():
    """Engine-overhead bench (reference perf.rs / einsum_bench role) runs
    and emits the CSV schema."""
    from sparsetpu.bench import engine_bench

    csv = engine_bench.run(n=32, nnz_per_row=2, reps=2, iters=1,
                           verbose=False)
    lines = csv.strip().split("\n")
    assert lines[0] == "case,impl,seconds,slowdown_vs_direct"
    assert any(l.startswith("spgemm_") for l in lines)
    assert any(l.startswith("chain3_") for l in lines)
