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
    # P built ON DEVICE: a host-built (n, n) f32 is a multi-GB device_put
    # through the remote tunnel (measured: tens of minutes at 30^3)
    s_planes = sp._round_up(sp._round_up(n, 128) // 128, 8)

    @jax.jit
    def make_p():
        key = jax.random.PRNGKey(0)
        u = jax.random.randint(key, (n, s_planes, 128), 0, 1000,
                               dtype=jnp.int32)
        return u.astype(jnp.float32)

    p = make_p()
    jax.block_until_ready(p)
    print(f"# n={n} nnz={nnz}", flush=True)
    print("nbuf,rpt,step_ms,ns_per_entry", flush=True)
    for nbuf in (8, 16, 32):
        for rpt in (40, 72):  # rpt=120's 13 MB out tile blows the 16 MB
            # scoped-vmem limit; 72 (7.9 MB + ring) is the safe ceiling
            cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
                a, rows_per_tile=rpt, nbuf=nbuf)
            try:
                out = sp.spmm_pallas(cnt, cols, lrow, vals, p,
                                     rows_per_tile=rpt, nbuf=nbuf)
            except Exception as e:
                print(f"{nbuf},{rpt},DNF,{type(e).__name__}", flush=True)
                continue
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
