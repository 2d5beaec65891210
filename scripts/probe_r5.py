"""Round-5 design probes, one TPU process, incremental CSV.

Measures the primitives the round-5 plan hinges on:
  1. chain_tune  — spmm_pallas per-entry ns vs (nbuf, rows_per_tile): is the
     27.5 ms chain step DMA-latency bound (deeper pipeline wins) or
     issue/dispatch bound (it doesn't)?
  2. rowgather   — jnp.take((Nc, C) u32 table, E indices, axis=0): does an
     XLA row gather cost ~10 ns per INDEX (slab-ESC expansion is viable) or
     per ELEMENT (it isn't)?
  3. gather1d    — the known ~10 ns/elem currency, re-measured as control.
  4. scatter_max — marks.at[idx].max(vals): the repeat_index seed scatter.
  5. sort_batch  — batched lax.sort (R, L) u32 key+payload at chain-slab
     shapes (small L, huge R — prior probes only measured L = 2^15).
  6. cumsum_ax1  — native lax.cumsum along lanes at slab shapes.
  7. patmm       — int8 x int8 -> int32 pattern matmul (graph-closure route):
     fused 12-squaring closure at n=2708, single squaring at n=27000.
  8. densify     — scatter a CSR-sized entry set into a zeroed n x n dense
     frame (the sparse -> dense-plane chain transition cost).
  9. coalesce    — Pallas overlapping sequential HBM->HBM block copies
     (the gather-free survivor compaction): correctness + rate.

Emits: bench_out/probe_r5.csv (flushed per row).
"""

import sys
import time
import traceback

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from sparsetpu.bench.timing import fused_loop_time

OUT = open("bench_out/probe_r5.csv", "a")


def emit(row: str):
    print(row, flush=True)
    OUT.write(row + "\n")
    OUT.flush()


def section(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                fn()
            except Exception as e:  # keep probing past failures
                emit(f"{name},ERROR,{type(e).__name__}:{str(e)[:120]}")
                traceback.print_exc()
            print(f"# section {name} done in {time.time()-t0:.1f}s",
                  flush=True)
        return run
    return deco


@section("chain_tune")
def chain_tune():
    from sparsetpu.csr import SparseCSR
    from sparsetpu.graphs.generate import lattice, thin
    from sparsetpu.kernels import spmm_pallas as sp

    coo = thin(lattice((30, 30, 30), True), 3.0 / 26.0, seed=42)
    r, c, v, n = coo
    a = SparseCSR.from_coo_host(r, c, v, n)
    rng = np.random.default_rng(0)
    dense = rng.integers(0, 1000, (n, n)).astype(np.float32)
    p = sp.to_row_planes(jnp.asarray(dense))
    for nbuf, rpt in ((4, 8), (8, 8), (16, 8), (32, 8), (8, 16), (16, 16)):
        cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
            a, rows_per_tile=rpt, nbuf=nbuf)

        def run(bump):
            o = sp.spmm_pallas(cnt, cols, lrow, vals + bump * 1e-30, p,
                               rows_per_tile=rpt, nbuf=nbuf)
            return o[0, 0, 0]

        dt = fused_loop_time(run, reps=8, iters=2)
        tot = int(np.asarray(cnt).sum())
        emit(f"chain_tune,nbuf={nbuf} rpt={rpt},{dt*1e3:.2f}ms,"
             f"{dt/tot*1e9:.0f}ns_per_entry")


@section("rowgather")
def rowgather():
    rng = np.random.default_rng(1)
    nc = 1 << 16
    for c in (4, 8):
        table = jnp.asarray(
            rng.integers(0, 1 << 30, (nc, c)).astype(np.uint32))
        for loge in (18, 20, 22):
            e = 1 << loge
            idx = jnp.asarray(rng.integers(0, nc, e).astype(np.int32))

            def run(bump):
                i = (idx + bump.astype(jnp.int32)) & (nc - 1)
                g = jnp.take(table, i, axis=0, mode="clip")
                return jnp.sum(g & 1).astype(jnp.float32)

            dt = fused_loop_time(run, reps=8, iters=2)
            emit(f"rowgather,C={c} E=2^{loge},{dt*1e3:.3f}ms,"
                 f"{dt/e*1e9:.1f}ns_per_idx,{dt/(e*c)*1e9:.1f}ns_per_elem")


@section("gather1d")
def gather1d():
    rng = np.random.default_rng(2)
    nt = 1 << 20
    table = jnp.asarray(rng.integers(0, 1 << 30, nt).astype(np.uint32))
    for loge in (20, 22):
        e = 1 << loge
        idx = jnp.asarray(rng.integers(0, nt, e).astype(np.int32))

        def run(bump):
            i = (idx + bump.astype(jnp.int32)) & (nt - 1)
            return jnp.sum(table[i] & 1).astype(jnp.float32)

        dt = fused_loop_time(run, reps=8, iters=2)
        emit(f"gather1d,E=2^{loge},{dt*1e3:.3f}ms,{dt/e*1e9:.1f}ns_per_idx")


@section("scatter_max")
def scatter_max():
    rng = np.random.default_rng(3)
    e, s = 1 << 20, 1 << 22
    idx = jnp.asarray(rng.integers(0, s, e).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 30, e).astype(np.int32))

    def run(bump):
        i = (idx + bump.astype(jnp.int32)) & (s - 1)
        m = jnp.full((s,), -1, jnp.int32).at[i].max(vals, mode="drop")
        return jnp.sum(m & 1).astype(jnp.float32)

    dt = fused_loop_time(run, reps=8, iters=2)
    emit(f"scatter_max,E=2^20->2^22,{dt*1e3:.3f}ms,{dt/e*1e9:.1f}ns_per_idx")


@section("sort_batch")
def sort_batch():
    rng = np.random.default_rng(4)
    # (27000, 2048) stalled the remote compiler >35 min and was dropped:
    # mid-height wide batched sorts join the known compile-stall class
    for r, l in ((64, 32768), (1024, 32768)):
        keys = jnp.asarray(
            rng.integers(0, 1 << 31, (r, l)).astype(np.int32))
        pay = jnp.asarray(
            rng.integers(0, 1 << 31, (r, l)).astype(np.int32))

        def run(bump):
            k = keys ^ bump.astype(jnp.int32)
            ks, ps = jax.lax.sort([k, pay], dimension=1, num_keys=1,
                                  is_stable=False)
            return (ks[0, 0] + ps[0, 0]).astype(jnp.float32)

        dt = fused_loop_time(run, reps=4, iters=2)
        emit(f"sort_batch,{r}x{l},{dt*1e3:.2f}ms,"
             f"{r*l/dt/1e9:.2f}Gelem_s")


@section("cumsum_ax1")
def cumsum_ax1():
    rng = np.random.default_rng(5)
    for r, l in ((64, 32768), (1024, 32768)):
        x = jnp.asarray(rng.integers(0, 1 << 16, (r, l)).astype(np.uint32))

        def run(bump):
            y = jax.lax.cumsum(x + bump.astype(jnp.uint32), axis=1)
            return jnp.sum(y[:, -1] & 1).astype(jnp.float32)

        dt = fused_loop_time(run, reps=8, iters=2)
        emit(f"cumsum_ax1,{r}x{l},{dt*1e3:.2f}ms,{r*l/dt/1e9:.2f}Gelem_s")


@section("patmm")
def patmm():
    rng = np.random.default_rng(6)
    for n, iters_in in ((2708, 12), (27000, 1)):
        x = (rng.random((n, n)) < (5.0 / n)).astype(np.int8)
        xd = jnp.asarray(x)

        def run(bump):
            x0 = xd.at[0, 0].set((bump.astype(jnp.int32) & 1).astype(
                jnp.int8))

            def body(i, y):
                z = jax.lax.dot(
                    y, y, preferred_element_type=jnp.int32)
                return (z > 0).astype(jnp.int8)

            y = jax.lax.fori_loop(0, iters_in, body, x0)
            return jnp.sum(y[0].astype(jnp.int32)).astype(jnp.float32)

        dt = fused_loop_time(run, reps=2, iters=2)
        emit(f"patmm,n={n} sq={iters_in},{dt*1e3:.2f}ms,"
             f"{dt/iters_in*1e3:.2f}ms_per_squaring")


@section("densify")
def densify():
    rng = np.random.default_rng(7)
    n = 27000
    e = 646000
    flat = jnp.asarray(
        rng.integers(0, n * n, e, dtype=np.int64).astype(np.int32))
    # int32 flat index overflows at n*n=729M > 2^31? no: 729e6 < 2^31 ok
    vals = jnp.asarray(rng.integers(0, 1 << 12, e).astype(np.float32))

    def run(bump):
        i = (flat + bump.astype(jnp.int32)) % (n * n)
        d = jnp.zeros((n * n,), jnp.float32).at[i].set(vals)
        return d[0]

    dt = fused_loop_time(run, reps=4, iters=2)
    emit(f"densify,E=646k->27k^2,{dt*1e3:.2f}ms,{dt/e*1e9:.1f}ns_per_idx")


@section("coalesce")
def coalesce():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(8)
    nb, l = 512, 32768
    stream = rng.integers(0, 1 << 30, (nb, l)).astype(np.int32)
    counts = rng.integers(1, l + 1, nb).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    total = int(offs[-1])
    out_cap = nb * l

    def kern(offs_ref, stream_hbm, out_hbm, buf, sem_in, sem_out):
        b = pl.program_id(0)
        cp_in = pltpu.make_async_copy(
            stream_hbm.at[b], buf, sem_in)
        cp_in.start()
        cp_in.wait()
        dst = offs_ref[b]
        cp = pltpu.make_async_copy(
            buf, out_hbm.at[pl.ds(dst, l)], sem_out)
        cp.start()
        cp.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((l,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    @jax.jit
    def go(offs_d, stream_d):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_cap,), jnp.int32),
        )(offs_d, stream_d)

    offs_d = jnp.asarray(offs[:-1])
    stream_d = jnp.asarray(stream)
    out = np.asarray(jax.device_get(go(offs_d, stream_d)))
    # correctness: prefix of each block lands at offs[b], later blocks
    # overwrite earlier blocks' overhang
    ref = np.zeros(out_cap, np.int32)
    for b in range(nb):
        ref[offs[b]:offs[b] + l] = stream[b]
    ok = bool((out[:total] == ref[:total]).all())

    def run(bump):
        o = go(offs_d, stream_d ^ bump.astype(jnp.int32))
        return o[0].astype(jnp.float32)

    dt = fused_loop_time(run, reps=4, iters=2)
    emit(f"coalesce,nb={nb} L={l} ok={ok},{dt*1e3:.2f}ms,"
         f"{nb/dt/1e3:.0f}kblocks_s")


def main():
    emit(f"# probe_r5 start {time.strftime('%H:%M:%S')} "
         f"backend={jax.default_backend()}")
    for s in (chain_tune, sort_batch, cumsum_ax1, patmm, densify, coalesce,
              rowgather, gather1d, scatter_max):
        s()
    emit("# probe_r5 done")


if __name__ == "__main__":
    main()
