"""Bisect the sort-path compile ceiling (VERDICT r3 missing #3).

Every sort-based SpGEMM kernel (ESC, blocked ESC, rowcat) stalls the remote
TPU compiler past ~2.5M products even though each op in the program is
nominally compile-bounded (blocked scans at L=2^15, batched sorts at fixed
lane width).  This probe compiles each suspect op IN ISOLATION at a given
element count and reports the compile wall time, so the super-linear op can
be named instead of guessed.

Usage:  timeout 240 python scripts/probe_compile.py <op> <n_elems>
Emits:  one CSV line  op,n,compile_seconds,status
Run each probe in a fresh process (the in-process jit cache would mask
repeat costs); the persistent compilation cache is disabled below.

Ops:
  cumsum        blocked_scan cumsum over n
  repeat        segments.repeat_index over n
  sort          batched lax.sort (nb, 2^15), 1 key + 2 payload limbs
  sort1d        global 1-D lax.sort over n, 1 key + 2 payloads
  lanescan      segmented saturating scan along lanes of (nb, 2^15)
  lanemax       associative_scan(maximum) along lanes of (nb, 2^15)
  scatter       out.at[dest].set(vals) at n
  iscatter      index scatter + 3 gathers (segments.compact pattern) at n
  gather        3x x[idx] gathers at n
  escb          full ops.escb._numeric at ~n products
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    op, n = sys.argv[1], int(float(sys.argv[2]))
    import jax

    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sparsetpu.ops import segments
    from sparsetpu.semiring import U64

    L = 1 << 15
    nb = max(-(-n // L), 1)

    if op == "cumsum":
        fn = jax.jit(segments.cumsum_blocked)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32)]
    elif op == "repeat":
        ne = max(n // 8, 1)

        def f(starts, vals):
            return segments.repeat_index(starts, vals, n)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((ne,), jnp.int32)] * 2
    elif op == "sort":

        def f(k, a, b):
            return jax.lax.sort([k, a, b], dimension=1, num_keys=1,
                                is_stable=False)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((nb, L), jnp.int32),
                jax.ShapeDtypeStruct((nb, L), jnp.uint32),
                jax.ShapeDtypeStruct((nb, L), jnp.uint32)]
    elif op == "sort1d":

        def f(k, a, b):
            return jax.lax.sort([k, a, b], num_keys=1, is_stable=False)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32),
                jax.ShapeDtypeStruct((n,), jnp.uint32),
                jax.ShapeDtypeStruct((n,), jnp.uint32)]
    elif op == "lanescan":

        def f(heads, lo, hi):
            return segments.segment_reduce_sorted(U64, heads, (lo, hi),
                                                  axis=1)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((nb, L), jnp.bool_),
                jax.ShapeDtypeStruct((nb, L), jnp.uint32),
                jax.ShapeDtypeStruct((nb, L), jnp.uint32)]
    elif op == "lanemax":

        def f(x):
            return jax.lax.associative_scan(jnp.maximum, x, axis=1)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((nb, L), jnp.int32)]
    elif op == "scatter":

        def f(dest, vals):
            out = jnp.zeros((n,), jnp.uint32)
            return out.at[dest].set(vals, mode="drop")

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32),
                jax.ShapeDtypeStruct((n,), jnp.uint32)]
    elif op == "iscatter":

        def f(keep, k, lo, hi):
            outs, cnt = segments.compact(
                keep, [k, lo, hi], [0, 0, 0], n)
            return outs, cnt

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.bool_),
                jax.ShapeDtypeStruct((n,), jnp.int32),
                jax.ShapeDtypeStruct((n,), jnp.uint32),
                jax.ShapeDtypeStruct((n,), jnp.uint32)]
    elif op == "gather":

        def f(idx, k, lo, hi):
            return k[idx], lo[idx], hi[idx]

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32)] * 2 + [
            jax.ShapeDtypeStruct((n,), jnp.uint32)] * 2
    elif op == "laxcumsum":

        def f(x):
            return jax.lax.cumsum(x)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32)]
    elif op == "laxcummax":

        def f(x):
            return jax.lax.cummax(x)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32)]
    elif op == "laxcumsum2d":
        # lane-axis native cumsum + small carry: the blocked_scan shape
        # with the per-level slice tree replaced by one HLO op per block
        def f(x):
            blocks = x.reshape(nb, L)
            s = jax.lax.cumsum(blocks, axis=1)
            carry = jnp.concatenate(
                [jnp.zeros((1,), x.dtype), jax.lax.cumsum(s[:, -1])[:-1]])
            return (s + carry[:, None]).reshape(-1)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((nb * L,), jnp.int32)]
    elif op == "cumsum_noslice":
        # blocked_scan minus the final flatten+slice
        def f(x):
            blocks = x.reshape(nb, L)
            s = jax.lax.associative_scan(jnp.add, blocks, axis=1)
            carry = jax.lax.associative_scan(jnp.add, s[:, -1])
            c0 = jnp.concatenate([jnp.zeros((1,), x.dtype), carry[:-1]])
            return s + c0[:, None]

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((nb * L,), jnp.int32)]
    elif op == "cumsum_nocarry":
        # pad+reshape+lane scan+flatten+slice, NO carry combine
        def f(x):
            pad = nb * L - n
            xp = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
            s = jax.lax.associative_scan(jnp.add, xp.reshape(nb, L), axis=1)
            return s.reshape(nb * L)[:n]

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32)]
    elif op == "cumsum_L17":

        def f(x):
            return segments.blocked_scan(jnp.add, x, jnp.int32(0),
                                         L=1 << 17)

        fn = jax.jit(f)
        args = [jax.ShapeDtypeStruct((n,), jnp.int32)]
    elif op == "escb":
        # compile the real blocked-ESC numeric program at ~n products by
        # building a tiny ER matrix whose A^2 expansion is ~n
        from sparsetpu.csr import SparseCSR
        from sparsetpu.ops import escb

        deg = 16
        side = max(int(n // (deg * deg)), 4)
        rng = np.random.default_rng(0)
        nnz = side * deg
        r = np.repeat(np.arange(side), deg)
        c = rng.integers(0, side, nnz)
        v = np.ones(nnz, np.uint64)
        a = SparseCSR.from_coo_host(r, c, v, side, sr=U64)
        t0 = time.perf_counter()
        out = escb.spgemm_blocked(a, a)
        jax.block_until_ready(out.col_idx)
        dt = time.perf_counter() - t0
        print(f"escb,{n},{dt:.2f},ok_run", flush=True)
        return
    else:
        raise SystemExit(f"unknown op {op}")

    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    compiled = lowered.compile()
    dt = time.perf_counter() - t0
    # runtime too: compile-ok is not enough (round 1 rejected the 1-D
    # associative_scan on runtime grounds as well) — run twice, report 2nd
    live = [jnp.zeros(a.shape, a.dtype) for a in args]
    out = compiled(*live)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = compiled(*live)
    jax.block_until_ready(out)
    rt = time.perf_counter() - t1
    print(f"{op},{n},{dt:.2f},ok_run_{rt*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
