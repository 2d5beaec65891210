"""Measure slab ESC (ops/slab.py) on the real chip: the VERDICT-r5 cells.

Sections:
  cells  — ER/power-law sweep cells incl. the 27000x8 mid-band target
           (round-4: 6.3 Mpr/s; ask: >= 50) with escb as in-run comparator.
  chain  — per-step numeric timing of the 30^3 torus chain A^2..A^7 via
           slab (the early-step alternative to the 27.5 ms DMA kernel).

Timing: fused-loop numeric phase with a fixed plan, symmetric with
bench/spgemm_bench.py's protocol (host planning excluded for every
kernel).  Emits bench_out/probe_slab.csv.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax
import jax.numpy as jnp
import numpy as np

from sparsetpu.bench.timing import fused_loop_time_args
from sparsetpu.csr import SparseCSR
from sparsetpu.graphs import generate, datasets
from sparsetpu.ops import slab
from sparsetpu.ops.spgemm import symbolic_flops_exact, narrow_u64_ok
from sparsetpu.semiring import U64

OUT = open("bench_out/probe_slab.csv", "a")


def emit(row):
    print(row, flush=True)
    OUT.write(row + "\n")
    OUT.flush()


def time_slab(a: SparseCSR, b: SparseCSR, reps=8, iters=2,
              L=slab.DEFAULT_L, C=slab.DEFAULT_C):
    narrow = a.sr_name == "u64" and narrow_u64_ok(a, b)
    rc_dev, nch_total, sg_dev = slab.plan_device(a, b, C)
    rc = np.asarray(jax.device_get(rc_dev)).astype(np.int64)
    ncc = max(int(jax.device_get(nch_total)), 1)
    sg = 1 << (max(int(jax.device_get(sg_dev)), 1) - 1).bit_length()
    flops = symbolic_flops_exact(a, b)
    out_cap = 1 << (max(min(flops, a.n_rows * b.n_cols), 1) - 1).bit_length()
    lc = L // C
    wide = rc > lc
    assert not wide.any(), f"wide rows present (max rc={rc.max()}), " \
        "time the packed path on a cell without hubs or raise L"
    sel, starts, nb = slab.pack_rows_ordered(rc, lc)
    sel_d, starts_d = jnp.asarray(sel), jnp.asarray(starts)
    rc_d = jnp.asarray(rc.astype(np.int32))

    c0 = slab._numeric(a, b, sel_d, starts_d, rc_d, C, L, nb, ncc, sg,
                       out_cap, narrow)
    c0.check()

    def step(bump, a_, b_, sel_, starts_, rc_):
        a2 = dataclasses.replace(
            a_, col_idx=a_.col_idx + (bump * 1e-30).astype(jnp.int32))
        out = slab._numeric(a2, b_, sel_, starts_, rc_, C, L, nb, ncc,
                            sg, out_cap, narrow)
        return out.col_idx[0].astype(jnp.float32)

    dt = fused_loop_time_args(step, (a, b, sel_d, starts_d, rc_d),
                              reps=reps, iters=iters)
    return dt, flops, int(c0.nnz), nb


def cells():
    from sparsetpu.bench.spgemm_bench import _time_escb

    for name, build in [
        ("er-1000x8", lambda: generate.random_graph(1000, 8000, seed=1)),
        ("er-8000x8", lambda: generate.random_graph(8000, 64000, seed=2)),
        ("er-27000x2", lambda: generate.random_graph(27000, 54000, seed=3)),
        ("er-27000x8", lambda: generate.random_graph(27000, 216000, seed=4)),
        ("er-27000x32", lambda: generate.random_graph(27000, 864000,
                                                      seed=5)),
    ]:
        rows, cols, vals, n = build()
        a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64)
        try:
            dt, flops, nnz, nb = time_slab(a, a)
            emit(f"cells,{name},slab,{dt*1e3:.2f}ms,"
                 f"{flops/dt/1e6:.1f}Mpr_s,nnz={nnz},nb={nb}")
        except Exception as e:
            emit(f"cells,{name},slab,ERROR,{type(e).__name__}:"
                 f"{str(e)[:100]}")
        if name == "er-27000x8":
            try:
                dt2 = _time_escb(a, reps=4, iters=2)
                emit(f"cells,{name},escb,{dt2*1e3:.2f}ms,"
                     f"{flops/dt2/1e6:.1f}Mpr_s")
            except Exception as e:
                emit(f"cells,{name},escb,ERROR,{type(e).__name__}:"
                     f"{str(e)[:100]}")


def chain():
    from sparsetpu.bench.chain import build_torus_host

    host = build_torus_host()
    a = host.to_device()
    cur = a
    for step_k in range(2, 8):
        try:
            t0 = time.time()
            dt, flops, nnz, nb = time_slab(cur, a, reps=4, iters=2)
            emit(f"chain,A^{step_k},slab,{dt*1e3:.2f}ms,"
                 f"{nnz/dt/1e6:.1f}Mnnz_s,flops={flops},nb={nb},"
                 f"wall={time.time()-t0:.0f}s")
        except Exception as e:
            emit(f"chain,A^{step_k},slab,ERROR,{type(e).__name__}:"
                 f"{str(e)[:100]}")
            break
        cur = slab.spgemm_slab(cur, a)
        cur.check()


def graph_algos():
    """Dense-pattern route timings (VERDICT ask #3): cora-substitute and
    27k-torus diameter / closure end-to-end wall (incl. conversions), plus
    the raw fused squaring rate at n=27000 (int8 MXU)."""
    from sparsetpu.bench.real_graphs import load_or_synthesize
    from sparsetpu.graphs import algos, patterns

    name, coo = load_or_synthesize("cora", 2708, 10556)
    r, c, v, n = coo
    a = SparseCSR.from_coo_host(r, c, v, n, sr=U64)
    t0 = time.time()
    d = algos.diameter(a, dense="always")
    emit(f"algos,{name},diameter_dense,{time.time()-t0:.2f}s,d={d}")
    t0 = time.time()
    comp = algos.connected_components_closure(a, dense="always")
    emit(f"algos,{name},components_closure_dense,{time.time()-t0:.2f}s,"
         f"k={int(comp.max())+1}")
    t0 = time.time()
    s, k = algos.reachability_sum(a, pattern=True, dense="always")
    emit(f"algos,{name},reachability_dense,{time.time()-t0:.2f}s,"
         f"k={k},nnz={int(s.nnz)}")

    from sparsetpu.bench.chain import build_torus_host

    host = build_torus_host()
    at = host.to_device()
    t0 = time.time()
    d = algos.diameter(at, dense="always")
    emit(f"algos,torus27k,diameter_dense,{time.time()-t0:.2f}s,d={d}")

    # raw squaring rate at n=27000 (int8 -> int32 MXU), x0 as jit ARG
    x0 = patterns.from_csr(at)
    jax.block_until_ready(x0)

    def sq(bump, x):
        y = x.at[0, 0].set((bump.astype(jnp.int32) & 1).astype(jnp.int8))
        return jnp.sum(
            patterns.matmul(y, y)[0].astype(jnp.int32)).astype(jnp.float32)

    dt = fused_loop_time_args(sq, (x0,), reps=2, iters=2)
    emit(f"algos,torus27k,patmm_single_squaring,{dt*1e3:.2f}ms,-")


def main():
    emit(f"# probe_slab start {time.strftime('%H:%M:%S')} "
         f"backend={jax.default_backend()}")
    graph_algos()
    cells()
    chain()
    emit("# probe_slab done")


if __name__ == "__main__":
    main()
