"""A/B the MXU group-dot chain kernel vs the per-entry VPU kernel on TPU.

The VPU kernel (spmm_pallas) measures ~27.5 ms per 30^3 chain step and the
dma_share probe attributes ~300 ns/entry to the scalar issue loop + per-
entry (S, 128) FMA dispatch.  spmm_pallas_mxu batches G entries into one
MXU contraction per group; if the per-entry VPU dispatch is the bottleneck
this should approach the DMA/HBM floor (~10-15 ms).

CSV: variant,rpt,g,seconds,ns_per_entry -> bench_out/probe_spmm_mxu.csv
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sparsetpu.bench.chain import build_torus_host
from sparsetpu.bench.timing import fused_loop_time
from sparsetpu.kernels import spmm_pallas as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=30)
    ap.add_argument("--g", type=int, nargs="*", default=[16, 32, 64])
    ap.add_argument("--rpt", type=int, nargs="*", default=[24])
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    h = build_torus_host(dims=(args.dims,) * 3)
    a = h.to_device()
    n = a.n_rows
    nnz = int(a.nnz)
    print(f"devices={jax.devices()} n={n} nnz={nnz}", flush=True)

    # build P ON DEVICE: a host-built (n, n) f32 is a multi-GB device_put
    # through the remote tunnel (measured: tens of minutes at 30^3)
    s_planes = sp._round_up(sp._round_up(n, 128) // 128, 8)

    @jax.jit
    def make_p():
        key = jax.random.PRNGKey(0)
        u = jax.random.randint(key, (n, s_planes, 128), 0, 1 << 20,
                               dtype=jnp.int32)
        return u.astype(jnp.float32)

    p = make_p()
    jax.block_until_ready(p)
    print("# P built on device", flush=True)

    rows = ["variant,rpt,g,seconds,ns_per_entry"]
    print(rows[0], flush=True)

    def timed(kernel_call, reps, iters=3):
        """Fused-loop timing with P as a program ARGUMENT — closing over
        the 3 GB P captures it as a lowering constant (measured: the
        lowering itself stalls)."""

        @jax.jit
        def run(p_arg, bump0):
            def body(i, acc):
                p2 = p_arg.at[0, 0, 0].add(
                    (bump0 + i.astype(jnp.float32)) * 1e-30)
                return acc + kernel_call(p2)[0, 0, 0]

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(run(p, jnp.float32(0.0)))  # compile + warm
        best = float("inf")
        for it in range(iters):
            t0 = time.perf_counter()
            float(run(p, jnp.float32((it + 1) * reps)))
            best = min(best, time.perf_counter() - t0)
        return best / reps

    # reference result from the VPU kernel
    want = {}
    for rpt in args.rpt:
        cnt, cols, lrow, vals, _ = sp.tile_sparse_operand(a, rows_per_tile=rpt)
        t0 = time.time()
        c = sp.spmm_pallas(cnt, cols, lrow, vals, p, rows_per_tile=rpt)
        jax.block_until_ready(c)
        print(f"# vpu rpt={rpt} first-call {time.time()-t0:.1f}s", flush=True)
        want[rpt] = c

        t = timed(lambda p2: sp.spmm_pallas(cnt, cols, lrow, vals, p2,
                                            rows_per_tile=rpt),
                  reps=args.reps)
        line = f"vpu,{rpt},-,{t:.6f},{t / nnz * 1e9:.1f}"
        rows.append(line)
        print(line, flush=True)

        for g in args.g:
            try:
                cntm, colsm, m, _ = sp.tile_sparse_operand_mxu(
                    a, rows_per_tile=rpt, g=g)
                t0 = time.time()
                cm = sp.spmm_pallas_mxu(cntm, colsm, m, p,
                                        rows_per_tile=rpt, g=g)
                jax.block_until_ready(cm)
                print(f"# mxu rpt={rpt} g={g} first-call "
                      f"{time.time()-t0:.1f}s", flush=True)
                assert bool(jnp.array_equal(cm, want[rpt])), "MISMATCH"

                t = timed(lambda p2, cm_=cntm, co_=colsm, m_=m, g_=g:
                          sp.spmm_pallas_mxu(cm_, co_, m_, p2,
                                             rows_per_tile=rpt, g=g_),
                          reps=args.reps)
                line = f"mxu,{rpt},{g},{t:.6f},{t / nnz * 1e9:.1f}"
            except Exception as e:
                line = f"mxu,{rpt},{g},DNF,{type(e).__name__}:{str(e)[:80]}"
            rows.append(line)
            print(line, flush=True)

    with open("bench_out/probe_spmm_mxu.csv", "w") as f:
        f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
