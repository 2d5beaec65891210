"""Focused denseacc timing at the big 27k cells (sweep prelude compiles
priced out the full grid)."""
import sys, time
sys.path.insert(0, ".")
from sparsetpu.bench import configure_cache
configure_cache()
import jax
import numpy as np
from sparsetpu.csr import SparseCSR
from sparsetpu.graphs import datasets, generate
from sparsetpu.semiring import U64
from sparsetpu.ops.denseacc import spgemm_dense_acc
from sparsetpu.ops.spgemm import symbolic_flops_exact
from sparsetpu import native

print("case,n,e_per_n,nnz_a,flops,nnz_c,algo,seconds,mproducts_per_s", flush=True)
for case, coo in (("er", generate.random_graph(27000, 27000*32, seed=27032)),
                  ("powerlaw", datasets.power_law(27000, 8, seed=17))):
    r, c, v, nn = coo
    a = SparseCSR.from_coo_host(r, c, v, nn, sr=U64)
    flops = symbolic_flops_exact(a, a)
    rp_h, ci_h, v_h = a.to_numpy()
    crp, _, _ = native.spgemm(native.as_host_csr(rp_h.astype(np.int64), ci_h, v_h),
                              native.as_host_csr(rp_h.astype(np.int64), ci_h, v_h), nn)
    nnz_c = int(crp[-1])
    out = spgemm_dense_acc(a, a).check()
    assert int(out.nnz) == nnz_c, (int(out.nnz), nnz_c)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = spgemm_dense_acc(a, a)
        jax.block_until_ready(o.nnz)
        best = min(best, time.perf_counter() - t0)
    print(f"{case},{nn},32,{int(a.nnz)},{flops},{nnz_c},denseacc,"
          f"{best:.6f},{flops/best/1e6:.1f}", flush=True)
