"""Probe the Pallas SpMM chain kernel's DMA ceiling on real TPU.

The A^7 differential measures ~29.6 ms/step at 30^3 (80882 A-entries, each
a (S,128) P-row DMA + FMA): ~340 ns/DMA if issue-bound.  Questions:
  1. does NBUF (ring depth) move it?  -> latency/in-flight bound if yes
  2. does rows_per_tile move it?      -> per-tile overhead if yes
  3. what's the floor with the same traffic in one stream (memcpy bound)?

Usage: python scripts/probe_spmm.py [--dims 30] [--nbuf 4 8] [--rpt 8 24]
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


def probe_dma_share(a, p0, rpt: int, reps: int):
    """Timing-only kernel variant: ONE DMA per NBUF-entry group, all NBUF
    FMAs read that one slot (results are WRONG — this isolates the
    per-entry scalar-loop + VPU cost from the per-DMA start cost)."""
    from functools import partial as _partial

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sparsetpu.kernels import spmm_pallas as sp

    NBUF = 4
    cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(a, rows_per_tile=rpt)
    s_planes = meta["s_planes"]

    def kernel(cnt_ref, cols_ref, lrow_ref, vals_ref, p_hbm, out_ref,
               row_buf, sem):
        i = pl.program_id(0)
        groups = cnt_ref[i] // NBUF
        out_ref[:] = jnp.zeros_like(out_ref)

        def dma(slot, e):
            src = pl.multiple_of(cols_ref[0, 0, e], 8)
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(src, s_planes), :], row_buf.at[slot],
                sem.at[slot])

        def fma(slot, e):
            dst = pl.multiple_of(lrow_ref[0, 0, e], 8)
            out_ref[pl.ds(dst, s_planes), :] += (
                vals_ref[0, 0, e] * row_buf[slot])

        dma(0, 0).start()
        dma(1, NBUF).start()

        def body(g, _):
            base = g * NBUF
            dma(g % 2, base).wait()
            for s in range(NBUF):  # all NBUF FMAs read the one landed slot
                fma(g % 2, base + s)
            dma((g + 2) % 2, base + 2 * NBUF).start()
            return 0

        jax.lax.fori_loop(0, groups - 2, body, 0)
        for g in (groups - 2, groups - 1):
            dma(g % 2, g * NBUF).wait()
            for s in range(NBUF):
                fma(g % 2, g * NBUF + s)

    t_count, _, e_max = cols.shape
    n = a.n_rows
    p_flat = p0.reshape(n * s_planes, 128)
    entry_spec = pl.BlockSpec((1, 1, e_max), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(t_count,),
        in_specs=[entry_spec, entry_spec, entry_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rpt * s_planes, 128), lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.VMEM((2, s_planes, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n * s_planes, 128), jnp.float32),
    )

    @jax.jit
    def chain(p, r):
        def body(j, q):
            q = q.at[0, 0].add(jnp.float32(j) * 1e-30)
            return call(cnt, cols, lrow, vals, q)
        return jax.lax.fori_loop(0, r, body, p)

    t0 = time.time()
    jax.block_until_ready(chain(p_flat, 1))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(p_flat, reps))
        best = min(best, (time.perf_counter() - t0) / reps)
    n_e = int(jax.device_get(cnt).sum())
    print(f"dma_share rpt={rpt} compile={compile_s:.1f}s "
          f"step={best*1e3:.2f}ms ns/entry={best/n_e*1e9:.0f} "
          f"(1 dma per {NBUF} entries)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=30)
    ap.add_argument("--nbuf", type=int, nargs="*", default=[4, 8, 16])
    ap.add_argument("--rpt", type=int, nargs="*", default=[8, 24, 72])
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--share", action="store_true",
                    help="run the 1-DMA-per-NBUF-entries timing variant")
    args = ap.parse_args()

    from sparsetpu.bench.chain import build_torus_host
    from sparsetpu.kernels import spmm_pallas as sp

    h = build_torus_host(dims=(args.dims,) * 3)
    a = h.to_device()
    n = a.n_rows
    print(f"n={n} nnz={h.nnz}", flush=True)
    # build P on DEVICE: a 2.9 GB device_put through the tunnel costs tens
    # of minutes (measured the hard way)
    s_planes = sp._round_up(sp._round_up(n, 128) // 128, 8)
    key = jax.random.PRNGKey(0)
    p0 = jax.jit(
        lambda k: jax.random.randint(
            k, (n, s_planes, 128), 0, 3).astype(jnp.float32)
    )(key)
    jax.block_until_ready(p0)

    import sparsetpu.kernels.spmm_pallas as spm

    if args.share:
        for rpt in args.rpt:
            if n % rpt == 0:
                probe_dma_share(a, p0, rpt, args.reps)
        return

    for rpt in args.rpt:
        if n % rpt:
            print(f"# skip rpt={rpt} (n % rpt != 0)", flush=True)
            continue
        for nbuf in args.nbuf:
            spm.NBUF = nbuf
            cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
                a, rows_per_tile=rpt)

            @jax.jit
            def chain(p, reps):
                def body(r, q):
                    q = q.at[0, 0, 0].add(jnp.float32(r) * 1e-30)
                    return sp.spmm_pallas(cnt, cols, lrow, vals, q,
                                          rows_per_tile=rpt)
                return jax.lax.fori_loop(0, reps, body, p)

            t0 = time.time()
            jax.block_until_ready(chain(p0, 1))
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(chain(p0, args.reps))
                best = min(best, (time.perf_counter() - t0) / args.reps)
            n_dma = int(jax.device_get(cnt).sum())
            ns_per_dma = best / n_dma * 1e9
            print(f"rpt={rpt} nbuf={nbuf} compile={compile_s:.1f}s "
                  f"step={best*1e3:.2f}ms ns/dma={ns_per_dma:.0f} "
                  f"e_max={cols.shape[2]}", flush=True)


if __name__ == "__main__":
    main()
