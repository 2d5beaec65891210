"""Fold-band chain at 27k on the TPU (VERDICT r4 ask #4: total < 102 ms,
A^2 < 10 ms).  nnz per step asserted against the native oracle inside
run_chain_foldband."""

import sys
import time

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax

from sparsetpu.bench.chain import (build_torus_host, native_chain_stats_host,
                                   run_chain_foldband)

OUT = open("bench_out/probe_foldband.csv", "a")


def emit(row):
    print(row, flush=True)
    OUT.write(row + "\n")
    OUT.flush()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rpt", type=int, default=40)
    ap.add_argument("--nbuf", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    emit(f"# probe_foldband start {time.strftime('%H:%M:%S')} "
         f"backend={jax.default_backend()} rpt={args.rpt} nbuf={args.nbuf}")
    host = build_torus_host()
    stats, final = native_chain_stats_host(
        host.row_ptr, host.col_idx, host.vals_u64(), host.n, max_step=7)
    a = host.to_device()
    jax.block_until_ready(a.col_idx)
    t0 = time.time()
    keep = {}
    results, total = run_chain_foldband(
        a, stats, max_step=7, iters=3, reps=args.reps,
        rows_per_tile=args.rpt, nbuf=args.nbuf, keep_final=keep)
    # value-level check: 128 sampled A^7 rows vs the native oracle, mapped
    # through the fold permutation (agreement-then-time discipline)
    import numpy as np

    from sparsetpu.kernels import bandplanes as bp

    n = host.n
    perm = keep["perm"]
    import jax.numpy as jnp

    planes = np.asarray(jax.device_get(bp.band_to_planes(
        keep["p"], jnp.asarray(keep["base"]), n)))
    flat = planes.reshape(n, -1)
    crp, cc, cv = final
    rng = np.random.default_rng(0)
    bad = 0
    for r in rng.choice(n, 128, replace=False):
        want = np.zeros(n, np.uint64)
        sl = slice(int(crp[r]), int(crp[r + 1]))
        want[cc[sl]] = cv[sl]
        got_row = flat[perm[r]]
        got = np.zeros(n, np.uint64)
        got[:] = got_row[perm].astype(np.uint64)
        if not np.array_equal(got, want):
            bad += 1
    emit(f"foldband,value_check,{'OK' if bad == 0 else f'BAD {bad}/128'}")
    assert bad == 0
    for rec in results:
        emit(f"foldband,A^{rec.step},{rec.seconds*1e3:.2f}ms,nnz={rec.nnz},"
             f"{rec.nnz_per_s/1e6:.1f}Mnnz_s")
    emit(f"foldband,total,{total*1e3:.2f}ms,wall={time.time()-t0:.0f}s,"
         f"rpt={args.rpt},nbuf={args.nbuf}")


if __name__ == "__main__":
    main()
