#!/usr/bin/env python
"""TPU primitive-cost probes: measures the XLA building blocks the SpGEMM
numeric-kernel design depends on (sort, segment_sum/scatter, cumsum, gather)
plus the current ESC path on ER / power-law graphs, and breaks down the
bench.py build-time mystery.  Writes one JSON line per probe to stdout.

Honest-timing rules per bench/timing.py: fused reps inside one dispatch,
per-rep input perturbation, single sync.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", nargs="*", default=["build", "sort", "scatter",
                                                    "cumsum", "esc"])
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[1 << 20, 1 << 22, 1 << 24])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from sparsetpu.bench.timing import fused_loop_time

    def emit(name, **kw):
        print(json.dumps({"probe": name, **kw}), flush=True)

    if "build" in args.probes:
        from sparsetpu.graphs import generate
        from sparsetpu.csr import SparseCSR
        from sparsetpu.semiring import U64

        t0 = time.time()
        coo = generate.lattice([30, 30, 30], torus=True)
        t1 = time.time()
        coo = generate.thin(coo, 3.0 / 26.0, seed=42)
        t2 = time.time()
        rows, cols, vals, n = coo
        cap = 1 << (len(rows) - 1).bit_length()
        a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64, capacity=cap)
        t3 = time.time()
        jax.block_until_ready(a.col_idx)
        t4 = time.time()
        emit("build_torus", lattice_s=t1 - t0, thin_s=t2 - t1,
             from_coo_host_s=t3 - t2, sync_s=t4 - t3, nnz=int(a.nnz))

    if "sort" in args.probes:
        for n in args.sizes:
            rng = np.random.default_rng(0)
            keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
            pay = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            pay2 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))

            def step1(bump):
                k2 = keys + (bump * 1e-30).astype(jnp.int32)
                sk, sv = jax.lax.sort([k2, pay], num_keys=1)
                return sv[0]

            def step2(bump):
                k2 = keys + (bump * 1e-30).astype(jnp.int32)
                sk, sv, sv2 = jax.lax.sort([k2, pay, pay2], num_keys=1)
                return sv[0]

            t1 = fused_loop_time(step1, reps=4, iters=2)
            t2 = fused_loop_time(step2, reps=4, iters=2)
            emit("sort", n=n, key_payload_s=t1, key_2payload_s=t2,
                 melems_per_s=round(n / t1 / 1e6, 1))

    if "scatter" in args.probes:
        for n in args.sizes:
            m = n  # output segments same order as input
            rng = np.random.default_rng(1)
            ids_rand = jnp.asarray(rng.integers(0, m, n, dtype=np.int32))
            ids_sorted = jnp.sort(ids_rand)
            data = jnp.asarray(rng.standard_normal(n).astype(np.float32))

            def mk(ids, indices_sorted):
                def step(bump):
                    out = jax.ops.segment_sum(
                        data + bump * 1e-30, ids, num_segments=m,
                        indices_are_sorted=indices_sorted)
                    return out[0]
                return step

            ts = fused_loop_time(mk(ids_sorted, True), reps=4, iters=2)
            tr = fused_loop_time(mk(ids_rand, False), reps=4, iters=2)
            emit("segment_sum", n=n, sorted_s=ts, random_s=tr,
                 melems_per_s_sorted=round(n / ts / 1e6, 1),
                 melems_per_s_random=round(n / tr / 1e6, 1))

    if "cumsum" in args.probes:
        for n in args.sizes:
            rng = np.random.default_rng(2)
            data = jnp.asarray(rng.standard_normal(n).astype(np.float32))

            def step(bump):
                return jnp.cumsum(data + bump * 1e-30)[-1]

            t = fused_loop_time(step, reps=4, iters=2)
            emit("cumsum", n=n, seconds=t, melems_per_s=round(n / t / 1e6, 1))

    if "gather" in args.probes:
        for n in args.sizes:
            rng = np.random.default_rng(3)
            src = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))

            def step(bump):
                return (src + bump * 1e-30)[idx][0]

            t = fused_loop_time(step, reps=4, iters=2)
            emit("gather", n=n, seconds=t, melems_per_s=round(n / t / 1e6, 1))

    if "esc" in args.probes:
        # the current sort-based ESC SpGEMM on the BASELINE random configs
        import dataclasses

        from sparsetpu.csr import SparseCSR
        from sparsetpu.graphs import generate
        from sparsetpu.ops.spgemm import spgemm, symbolic_flops
        from sparsetpu.semiring import U64

        from sparsetpu.graphs import datasets

        cases = [
            ("er27k_deg8", generate.random_graph(27000, 27000 * 8, seed=5)),
            ("powerlaw27k", datasets.power_law(27000, m_per_node=8, seed=6)),
        ]
        for name, coo in cases:
            if coo is None:
                continue
            rows, cols, vals, n = coo
            a = SparseCSR.from_coo_host(rows, cols, vals, n, sr=U64,
                                        capacity=1 << (len(rows) - 1).bit_length())
            flops = int(symbolic_flops(a, a))
            cap = 1 << (flops - 1).bit_length()
            c = spgemm(a, a, cap).check()

            def step(bump):
                a2 = dataclasses.replace(
                    a, col_idx=a.col_idx + (bump * 1e-30).astype(jnp.int32))
                out = spgemm(a2, a, cap)
                return out.values[0][0].astype(jnp.float32)

            t = fused_loop_time(step, reps=4, iters=2)
            emit("esc_spgemm", case=name, n=n, nnz_a=int(a.nnz),
                 flops=flops, cap=cap, nnz_c=int(c.nnz), seconds=t,
                 mproducts_per_s=round(flops / t / 1e6, 1),
                 mnnz_per_s=round(int(c.nnz) / t / 1e6, 1))


if __name__ == "__main__":
    main()
