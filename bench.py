#!/usr/bin/env python
"""Headline benchmark: A^2..A^7 SpGEMM chain on the 30^3 Moore torus.

Prints ONE JSON line: output nnz/s at the A^7 step (u64 saturating semiring)
vs the reference CPU baseline (CSR rayon-parallel ~289M nnz/s at A^7,
BASELINE.md).  Run on the TPU backend by default; pass --quick for a small
smoke-test chain.
"""

import argparse
import json
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small chain for smoke tests")
    parser.add_argument("--steps", type=int, default=7)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--csv", type=str, default=None, help="write per-step CSV here")
    parser.add_argument("--profile", type=str, default=None,
                        help="write a jax.profiler trace to this directory "
                             "(the reference's hand-rolled Instant spans "
                             "become proper device traces)")
    parser.add_argument("--rows-per-tile", type=int, default=8,
                        help="pallas kernel output-tile height (tuning knob; "
                             "the step is DMA-issue-rate bound so this mostly "
                             "shifts VMEM usage)")
    parser.add_argument("--no-verify", action="store_true",
                        help="skip the native-oracle agreement check "
                             "(reference discipline is agreement-then-time, "
                             "src/graph_magnus.rs:751-783)")
    parser.add_argument("--algo",
                        choices=["auto", "pallas", "dense", "band", "esc",
                                 "rowcat"],
                        default="pallas",
                        help="auto = self-route via ops.hybrid.choose_strategy "
                             "(the MagnusConfig role); pallas = DMA-ring "
                             "dense-accumulator kernel (speed-of-light for "
                             "the densifying torus chain); dense = XLA "
                             "gather/segment-sum SpMM; band = block-band MXU "
                             "kernel; esc = sort-based general kernel; "
                             "rowcat = row-categorized batched kernel")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from sparsetpu.bench.chain import (
        build_torus, chain_csv, run_chain, run_chain_band, run_chain_dense,
        run_chain_pallas, run_chain_rowcat,
    )

    dims = (12, 12, 12) if args.quick else (30, 30, 30)
    t0 = time.time()
    a = build_torus(dims=dims)
    print(f"built A: n={a.n_rows} nnz={int(a.nnz)} ({time.time()-t0:.1f}s)",
          file=sys.stderr, flush=True)

    if args.algo == "auto":
        # system self-routing (the MagnusConfig role): inspect the matrix
        # and pick the kernel category for this chain
        from sparsetpu.ops.hybrid import choose_strategy

        strat = choose_strategy(a, steps=args.steps - 1)
        args.algo = {"dense-acc": "pallas", "band": "band"}.get(strat,
                                                                "rowcat")
        print(f"choose_strategy -> {strat} (algo={args.algo})",
              file=sys.stderr, flush=True)

    native_stats = None
    if args.algo == "pallas" and not args.no_verify:
        from sparsetpu.bench.chain import verify_chain_against_native

        t0 = time.time()
        native_stats = verify_chain_against_native(a, max_step=args.steps)
        print(f"verified vs native oracle: A^{args.steps} nnz="
              f"{native_stats[-1][1]} max={native_stats[-1][2]} "
              f"({time.time()-t0:.1f}s)", file=sys.stderr, flush=True)

    if args.profile:
        jax.profiler.start_trace(args.profile)

    if args.algo == "pallas":
        results = run_chain_pallas(a, max_step=args.steps, iters=args.iters,
                                   rows_per_tile=args.rows_per_tile)
    elif args.algo == "rowcat":
        results = run_chain_rowcat(a, max_step=args.steps, iters=args.iters)
    elif args.algo == "dense":
        results = run_chain_dense(a, max_step=args.steps, iters=args.iters)
    elif args.algo == "band":
        from sparsetpu.kernels.bandmm import cyclic_bandwidth

        half_width = cyclic_bandwidth(a)
        block = {1728: 108, 27000: 125}.get(a.n_rows, 125)
        print(f"cyclic bandwidth: {half_width}", file=sys.stderr, flush=True)
        results = run_chain_band(a, half_width=half_width, block=block,
                                 max_step=args.steps, iters=args.iters)
    else:
        results = run_chain(a, max_step=args.steps, iters=args.iters)
    if args.profile:
        jax.profiler.stop_trace()

    if native_stats is not None:
        # per-step nnz agreement between the timed run and the oracle
        for rec, (step, want_nnz, _) in zip(results, native_stats):
            assert rec.step == step and rec.nnz == want_nnz, (
                f"A^{rec.step}: nnz {rec.nnz} != native {want_nnz}"
            )

    if args.csv:
        import os

        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w") as f:
            f.write(chain_csv(results))

    last = results[-1]
    baseline_nnz_per_s = 289e6  # reference CSR-par at A^7 (BASELINE.md)
    print(json.dumps({
        "metric": f"spgemm_chain_A{last.step}_nnz_per_s",
        "value": round(last.nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(last.nnz_per_s / baseline_nnz_per_s, 4),
    }))


if __name__ == "__main__":
    main()
