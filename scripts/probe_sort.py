#!/usr/bin/env python
"""Bisect the ESC ~2M-product compile ceiling (VERDICT r2 weak #7).

Measures, per component and size, the XLA *compile* time (cold, first-call)
and the *runtime* (fused-loop, per-rep-perturbed — the remote runtime caches
identical dispatches) on the TPU, flushing a CSV line after each case so a
wedged compile still leaves the record.  Components:

  sort1d    lax.sort([i32 key, u32 limb, u32 limb]) at N      (ESC compress)
  sort2d    batched lax.sort over (N/2^18, 2^18) rows          (chunk phase)
  scan      segmented saturating scan at N                     (merge phase)
  repeat    scatter+cummax repeat_index at N                   (expand phase)
  spgemm    the full fused ESC program at expand_cap=N

Usage: python scripts/probe_sort.py [--sizes 18 20 21 22 23]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_case(make_step, reps: int = 8, iters: int = 3):
    """(compile_s, per_rep_ms): like bench.timing.fused_loop_time but also
    reports the first (compile+run) call's wall time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(bump0):
        def body(i, acc):
            probe = make_step(bump0 + i.astype(jnp.float32))
            return acc + probe

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t0 = time.time()
    float(run(jnp.float32(0.0)))
    compile_s = time.time() - t0
    best = float("inf")
    for it in range(iters):
        t0 = time.perf_counter()
        float(run(jnp.float32((it + 1) * reps)))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[18, 20, 21, 22])
    ap.add_argument("--components", nargs="*",
                    default=["sort1d", "sort2d", "scan", "repeat", "spgemm"])
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--out", default="bench_out/probe_sort.csv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from sparsetpu.ops import segments
    from sparsetpu.semiring import U64

    lines = ["component,log2n,compile_s,run_ms"]

    def flush():
        os.makedirs("bench_out", exist_ok=True)
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")

    def bump_i32(bump):
        return (bump * 1e-30).astype(jnp.int32)

    rng = np.random.default_rng(7)
    for lg in args.sizes:
        n = 1 << lg
        key = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        lo = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.uint32))
        hi = jnp.zeros((n,), jnp.uint32)
        for comp in args.components:
            t_start = time.time()
            try:
                if comp == "sort1d":
                    def step(bump):
                        out = jax.lax.sort([key + bump_i32(bump), lo, hi],
                                           num_keys=1, is_stable=True)
                        return out[0][0].astype(jnp.float32)
                    cs, rt = timed_case(step, args.reps)
                elif comp == "sort2d":
                    chunk = min(n, 1 << 18)
                    k2 = key.reshape(-1, chunk)
                    a2 = lo.reshape(-1, chunk)
                    b2 = hi.reshape(-1, chunk)

                    def step(bump):
                        out = jax.lax.sort(
                            [k2 + bump_i32(bump), a2, b2], dimension=1,
                            num_keys=1, is_stable=True)
                        return out[0][0, 0].astype(jnp.float32)
                    cs, rt = timed_case(step, args.reps)
                elif comp == "scan":
                    def step(bump):
                        heads = segments.segment_heads([key + bump_i32(bump)])
                        tot = segments.segment_reduce_sorted(
                            U64, heads, (lo, hi))
                        return tot[0][0].astype(jnp.float32)
                    cs, rt = timed_case(step, args.reps)
                elif comp == "repeat":
                    starts = jnp.asarray(
                        np.sort(rng.integers(0, n, n // 64)).astype(np.int32))
                    vals = jnp.arange(n // 64, dtype=jnp.int32)

                    def step(bump):
                        out = segments.repeat_index(
                            starts + bump_i32(bump), vals, n)
                        return out[0].astype(jnp.float32)
                    cs, rt = timed_case(step, args.reps)
                elif comp == "spgemm":
                    import dataclasses

                    from sparsetpu.csr import SparseCSR
                    from sparsetpu.graphs import generate
                    from sparsetpu.ops.spgemm import (spgemm,
                                                      symbolic_flops_exact)

                    deg = 8
                    nodes = int(np.sqrt(n / deg))
                    r, c, v, nn = generate.random_graph(
                        nodes, nodes * deg, seed=lg)
                    a = SparseCSR.from_coo_host(
                        r, c, v, nn, sr=U64,
                        capacity=1 << (len(r) - 1).bit_length())
                    fl = symbolic_flops_exact(a, a)
                    print(f"# spgemm case: nodes={nodes} flops={fl} cap={n}",
                          file=sys.stderr, flush=True)

                    def step(bump):
                        a2 = dataclasses.replace(
                            a, col_idx=a.col_idx + bump_i32(bump))
                        out = spgemm(a2, a, n)
                        return out.values[0][0].astype(jnp.float32)
                    cs, rt = timed_case(step, args.reps)
                else:
                    continue
            except Exception as e:
                lines.append(
                    f"{comp},{lg},ERR_{type(e).__name__}_{time.time()-t_start:.0f}s,0")
                flush()
                print(lines[-1], flush=True)
                continue
            lines.append(f"{comp},{lg},{cs:.1f},{rt:.3f}")
            flush()
            print(lines[-1], flush=True)


if __name__ == "__main__":
    main()
