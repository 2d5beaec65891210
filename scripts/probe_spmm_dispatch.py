"""Decompose the DMA spmm kernel's ~250 ns/entry (VERDICT r4 ask #4).

Three kernel variants at the 30^3 chain shape (n=27000, nnz=80882):
  full    — the production kernel (dynamic-dst RMW FMA + DMA ring)
  static  — same DMA ring, FMA accumulates to a STATIC dst (slot 0):
            wrong output, isolates the dynamic-dst store cost
  nodma   — dynamic-dst FMA from a fixed VMEM slot, no DMA traffic:
            isolates the DMA start/wait cost
  rowacc  — per-row register accumulator + static per-row store
            (the candidate production shape: dynamic SLOT read, no
            dynamic dst)

Emits bench_out/probe_spmm_dispatch.csv.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsetpu.bench.chain import build_torus_host
from sparsetpu.bench.timing import fused_loop_time_args
from sparsetpu.kernels import spmm_pallas as sp

OUT = open("bench_out/probe_spmm_dispatch.csv", "a")
RPT = 40
NBUF = 8


def emit(row):
    print(row, flush=True)
    OUT.write(row + "\n")
    OUT.flush()


def _kernel(s_planes, nbuf, mode, cnt_ref, cols_ref, lrow_ref, vals_ref,
            p_hbm, out_ref, row_buf, sem):
    i = pl.program_id(0)
    groups = cnt_ref[i] // nbuf
    out_ref[:] = jnp.zeros_like(out_ref)

    def dma(slot, e):
        src = pl.multiple_of(cols_ref[0, 0, e], 8)
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(src, s_planes), :], row_buf.at[slot],
            sem.at[slot])

    def fma(slot, e):
        if mode == "static":
            out_ref[pl.ds(0, s_planes), :] += (
                vals_ref[0, 0, e] * row_buf[slot])
        else:
            dst = pl.multiple_of(lrow_ref[0, 0, e], 8)
            out_ref[pl.ds(dst, s_planes), :] += (
                vals_ref[0, 0, e] * row_buf[slot])

    if mode == "nodma":
        def body(g, _):
            base = g * nbuf
            for s in range(nbuf):
                fma(s, base + s)
            return 0

        jax.lax.fori_loop(0, groups, body, 0)
        return

    for s in range(nbuf):
        dma(s, s).start()

    def body(g, _):
        base = g * nbuf
        for s in range(nbuf):
            dma(s, base + s).wait()
            fma(s, base + s)
            dma(s, base + nbuf + s).start()
        return 0

    jax.lax.fori_loop(0, groups - 1, body, 0)
    last = (groups - 1) * nbuf
    for s in range(nbuf):
        dma(s, last + s).wait()
        fma(s, last + s)


@partial(jax.jit, static_argnames=("mode",))
def run_variant(cnt, cols, lrow, vals, p, mode):
    t_count, _, e_max = cols.shape
    n_p, s_planes, lane = p.shape
    n = t_count * RPT
    p_flat = p.reshape(n_p * s_planes, lane)
    entry_spec = pl.BlockSpec((1, 1, e_max), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(t_count,),
        in_specs=[entry_spec, entry_spec, entry_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((RPT * s_planes, lane), lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.VMEM((NBUF, s_planes, lane), jnp.float32),
                        pltpu.SemaphoreType.DMA((NBUF,))])
    return pl.pallas_call(
        partial(_kernel, s_planes, NBUF, mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n * s_planes, lane), jnp.float32),
    )(cnt, cols, lrow, vals, p_flat)


def main():
    emit(f"# probe_spmm_dispatch start {time.strftime('%H:%M:%S')}")
    host = build_torus_host()
    a = host.to_device()
    nnz = int(a.nnz)
    cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
        a, rows_per_tile=RPT, nbuf=NBUF)
    s_planes = meta["s_planes"]

    @jax.jit
    def make_p():
        key = jax.random.PRNGKey(0)
        u = jax.random.randint(key, (meta["n_rows"], s_planes, 128), 0,
                               1000, dtype=jnp.int32)
        return u.astype(jnp.float32)

    p = make_p()
    jax.block_until_ready(p)

    for mode in ("full", "static", "nodma"):
        def step(bump, p_):
            q = p_.at[0, 0, 0].add(bump)
            return run_variant(cnt, cols, lrow, vals, q, mode)[0, 0]

        try:
            dt = fused_loop_time_args(step, (p,), reps=16, iters=2)
            emit(f"{mode},{RPT},{NBUF},{dt*1e3:.2f}ms,"
                 f"{dt/nnz*1e9:.0f}ns_per_entry")
        except Exception as e:
            emit(f"{mode},{RPT},{NBUF},DNF,{type(e).__name__}:"
                 f"{str(e)[:100]}")
    emit("# probe_spmm_dispatch done")


if __name__ == "__main__":
    main()
