"""Measure column-chunked SpGEMM at ogbn_arxiv_pl scale on the TPU.

VERDICT r4 ask #2's done-bar: ogbn A^2 <= 12 s (round 4: 125.7 s via the
tiled dense accumulator, reports/real_graphs_ogbn_r4.csv).  Also times
nell A^2 for a same-kernel cross-check.  Wall-clock timing includes host
planning (same protocol as bench/real_graphs.py).
"""

import sys
import time

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax
import numpy as np

from sparsetpu.bench.real_graphs import load_or_synthesize
from sparsetpu.csr import SparseCSR
from sparsetpu.ops.colchunk import plan_chunks, spgemm_colchunk
from sparsetpu.semiring import U64

OUT = open("bench_out/probe_colchunk.csv", "a")


def emit(row):
    print(row, flush=True)
    OUT.write(row + "\n")
    OUT.flush()


def run(name, n, m, iters=2):
    from sparsetpu import native

    label, coo = load_or_synthesize(name, n, m)
    r, c, v, nn = coo
    a = SparseCSR.from_coo_host(r, c, v, nn, sr=U64)
    # exact A^2 nnz from the native C++ Gustavson oracle (the agreement-
    # then-time discipline; the substitutes' nnz changed when the round-4
    # density doubling was fixed, so hardcoded counts go stale)
    rp_h, ci_h, v_h = a.to_numpy()
    base = native.as_host_csr(rp_h.astype(np.int64), ci_h, v_h)
    crp, _, _ = native.spgemm(base, base, nn)
    want_nnz = int(crp[-1])
    bnd, fk = plan_chunks(a, a)
    emit(f"# {label}: n={nn} nnz={int(a.nnz)} chunks={len(bnd)-1} "
         f"flops={int(fk.sum())}")
    t0 = time.perf_counter()
    out = spgemm_colchunk(a, a)
    jax.block_until_ready(out.col_idx)
    t_first = time.perf_counter() - t0
    nnz = int(out.nnz)
    emit(f"{label},colchunk,first,{t_first:.3f}s,nnz={nnz}")
    if want_nnz is not None:
        assert nnz == want_nnz, (nnz, want_nnz)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = spgemm_colchunk(a, a)
        jax.block_until_ready(out.col_idx)
        best = min(best, time.perf_counter() - t0)
    emit(f"{label},colchunk,best,{best:.3f}s,"
         f"{int(fk.sum())/best/1e6:.1f}Mpr_s,nnz={int(out.nnz)}")


def main():
    emit(f"# probe_colchunk start {time.strftime('%H:%M:%S')} "
         f"backend={jax.default_backend()}")
    run("nell", 65755, 251550)
    run("ogbn_arxiv", 169343, 1166243)
    emit("# probe_colchunk done")


if __name__ == "__main__":
    main()
