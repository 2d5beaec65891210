"""Tune the chain SpMM kernel's pipeline depth and tile height on the
real chip: the headline step is DMA-ISSUE bound (~340 ns/entry measured),
so deeper in-flight buffering (nbuf) and taller output tiles (rows_per_tile
— fewer grid steps, more entries amortizing each tile's zero-fill) are the
two cheap knobs left.  Emits CSV: nbuf,rpt,step_ms,ns_per_entry.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from sparsetpu.bench import configure_cache

configure_cache()

import jax
import jax.numpy as jnp

from sparsetpu.csr import SparseCSR
from sparsetpu.graphs.generate import lattice, thin
from sparsetpu.kernels import spmm_pallas as sp


def main():
    coo = thin(lattice((30, 30, 30), True), 3.0 / 26.0, seed=42)
    r, c, v, n = coo
    a = SparseCSR.from_coo_host(r, c, v, n)
    nnz = int(a.nnz)
    rng = np.random.default_rng(0)
    dense = rng.integers(0, 1000, (n, n)).astype(np.float32)
    print(f"# n={n} nnz={nnz}", flush=True)
    print("nbuf,rpt,step_ms,ns_per_entry", flush=True)
    for nbuf in (4, 8, 16):
        for rpt in (8, 16):
            cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
                a, rows_per_tile=rpt, nbuf=nbuf)
            p = sp.to_row_planes(jnp.asarray(dense))
            out = sp.spmm_pallas(cnt, cols, lrow, vals, p,
                                 rows_per_tile=rpt, nbuf=nbuf)
            jax.block_until_ready(out)
            from sparsetpu.bench.timing import fused_loop_time_args

            def run(bump, cnt_, cols_, lrow_, vals_, p_):
                o = sp.spmm_pallas(cnt_, cols_, lrow_, vals_ + bump * 1e-30,
                                   p_, rows_per_tile=rpt, nbuf=nbuf)
                return o[0, 0, 0]

            dt = fused_loop_time_args(run, (cnt, cols, lrow, vals, p),
                                      reps=8, iters=2)
            tot_entries = int(np.asarray(cnt).sum())
            print(f"{nbuf},{rpt},{dt*1e3:.2f},{dt/tot_entries*1e9:.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
