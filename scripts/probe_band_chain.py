"""Measure the block-band MXU chain at 27k on the TPU (VERDICT r4 ask #4).

The band kernel (kernels/bandmm.py) was built in round 3 but never timed
at the headline scale.  Cost model says band steps beat the 20.7 ms DMA
floor while the product band is narrow (A^2..A^4) and lose once it
saturates — this probe provides the measured switch point for the mixed
chain.  nnz per step is asserted against the native C++ oracle.
"""

import sys
import time

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax
import numpy as np

from sparsetpu.bench.chain import (build_torus_host, native_chain_stats_host,
                                   run_chain_band)

OUT = open("bench_out/probe_band_chain.csv", "a")


def emit(row):
    print(row, flush=True)
    OUT.write(row + "\n")
    OUT.flush()


def main():
    emit(f"# probe_band_chain start {time.strftime('%H:%M:%S')} "
         f"backend={jax.default_backend()}")
    host = build_torus_host()
    stats, _final = native_chain_stats_host(
        host.row_ptr, host.col_idx, host.vals_u64(), host.n, max_step=7)
    a = host.to_device()
    jax.block_until_ready(a.col_idx)
    t0 = time.time()
    results = run_chain_band(a, half_width=1799, block=125, max_step=7,
                             iters=3)
    wall = time.time() - t0
    want = {s[0]: s[1] for s in stats}
    total = 0.0
    for rec in results:
        ok = "OK" if rec.nnz == want[rec.step] else f"WANT{want[rec.step]}"
        emit(f"band,A^{rec.step},{rec.seconds*1e3:.2f}ms,nnz={rec.nnz},{ok}")
        total += rec.seconds
    emit(f"band,total,{total*1e3:.2f}ms,wall={wall:.0f}s")


if __name__ == "__main__":
    main()
