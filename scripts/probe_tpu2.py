#!/usr/bin/env python
"""Probe 2: batched (row-segmented) sort vs global sort — the core question
for the categorized ESC numeric kernel: XLA sorts each row of an (R, L)
array independently along the last axis; small per-row networks should beat
one global N log^2 N bitonic by a large factor."""

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from sparsetpu.bench.timing import fused_loop_time

    def emit(name, **kw):
        print(json.dumps({"probe": name, **kw}), flush=True)

    total = 1 << 24  # ~16.8M elements, matching the global-sort probe
    for L in (128, 256, 512, 2048):
        R = total // L
        rng = np.random.default_rng(0)
        keys = jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.int32))
        pay = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))

        def step(bump):
            k2 = keys + (bump * 1e-30).astype(jnp.int32)
            sk, sv = jax.lax.sort([k2, pay], dimension=-1, num_keys=1)
            return sv[0, 0]

        t = fused_loop_time(step, reps=4, iters=2)
        emit("batched_sort", rows=R, L=L, seconds=t,
             melems_per_s=round(total / t / 1e6, 1))

    # dedup-merge within sorted rows: shift-compare + segmented-scan cost
    L, R = 512, total // 512
    rng = np.random.default_rng(1)
    keys = jnp.asarray(
        np.sort(rng.integers(0, 64, (R, L), dtype=np.int32), axis=-1))
    vals = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))

    def merge_step(bump):
        v = vals + bump * 1e-30
        head = jnp.concatenate(
            [jnp.ones((R, 1), bool), keys[:, 1:] != keys[:, :-1]], axis=1)
        seg = jnp.cumsum(head.astype(jnp.int32), axis=1) - 1
        # per-row segment sums via one-hot-free associative scan:
        # cumsum then gather at segment ends
        cs = jnp.cumsum(v, axis=1)
        return cs[0, 0] + seg[0, 0].astype(jnp.float32)

    t = fused_loop_time(merge_step, reps=4, iters=2)
    emit("rowwise_dedup_scan", rows=R, L=L, seconds=t,
         melems_per_s=round(total / t / 1e6, 1))

    # device_put cost (the from_coo_host 171s mystery): first vs repeat
    import time as _time

    for sz in (1 << 17, 1 << 20):
        x = np.arange(sz, dtype=np.int32)
        t0 = _time.time()
        a = jax.device_put(x)
        jax.block_until_ready(a)
        t_first = _time.time() - t0
        t0 = _time.time()
        for i in range(4):
            a = jax.device_put(x + i)
            jax.block_until_ready(a)
        t_rep = (_time.time() - t0) / 4
        emit("device_put", n=sz, first_s=round(t_first, 3),
             repeat_s=round(t_rep, 3))


if __name__ == "__main__":
    main()
