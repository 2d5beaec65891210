"""A/B probe: K=16-ary btree lookup vs binary search on TPU.

The reference's CsrBTreeMatrix bets that a flat K-ary node layout beats
binary search through cache-friendliness (src/graph_csr_btree.rs:44-831,
measured by bench_btree_vs_binary_search, src/dense_btree.rs:419-522).
This probe answers the same question for TPU gathers: K-ary descent does
log16(n) levels x one contiguous (Q,16) gather; binary search does
log2(n) scattered (Q,) gathers; jnp.searchsorted is the library baseline.

CSV: n,q,method,seconds,ns_per_query -> bench_out/probe_btree.csv
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparsetpu.bench.timing import fused_loop_time
from sparsetpu.utils.dense_btree import build_device_btree, btree_lookup_device


def binary_lookup(keys, q):
    """Manual branch-free binary search (the SparseCSR.lookup formulation
    over one global segment)."""
    n = keys.shape[0]
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, n, jnp.int32)

    def body(_, lh):
        lo, hi = lh
        act = lo < hi
        mid = (lo + hi) // 2
        v = keys[jnp.clip(mid, 0, n - 1)]
        go = v < q
        lo = jnp.where(act & go, mid + 1, lo)
        hi = jnp.where(act & ~go, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, max(n.bit_length(), 1), body, (lo, hi))
    pos = jnp.clip(lo, 0, n - 1)
    return lo, keys[pos] == q


def main():
    quick = "--quick" in sys.argv
    rng = np.random.default_rng(7)
    qn = 1 << (10 if quick else 16)
    rows = ["n,q,method,seconds,ns_per_query"]
    print(rows[0], flush=True)
    for logn in ((8, 12) if quick else (12, 16, 20, 24)):
        n = 1 << logn
        keys = np.sort(rng.choice(np.uint32(0xFFFFFFF0), size=n,
                                  replace=False).astype(np.uint32))
        # half hits, half uniform misses
        q_hit = rng.choice(keys, qn // 2)
        q_miss = rng.integers(0, 0xFFFFFFF0, qn // 2).astype(np.uint32)
        q = jnp.asarray(np.concatenate([q_hit, q_miss]))
        kd = jnp.asarray(keys)
        levels, padded = build_device_btree(keys)

        # agreement first
        pos_b, hit_b = jax.jit(binary_lookup)(kd, q)
        pos_t, hit_t = jax.jit(
            lambda qq: btree_lookup_device(levels, padded, qq))(q)
        assert bool(jnp.array_equal(hit_b, hit_t)), logn
        # positions agree where hit (padding shifts nothing below len(keys))
        assert bool(jnp.array_equal(
            jnp.where(hit_b, pos_b, 0), jnp.where(hit_t, pos_t, 0))), logn

        def perturb(bump):
            # rotate the query vector by the rep index: real data
            # dependence (defeats loop-invariant motion), same workload
            return jnp.roll(q, bump.astype(jnp.int32))

        for method, fn in (
            ("searchsorted",
             lambda bump: jnp.searchsorted(
                 kd, perturb(bump)).sum().astype(jnp.float32)),
            ("binary",
             lambda bump: binary_lookup(
                 kd, perturb(bump))[0].sum().astype(jnp.float32)),
            ("btree16",
             lambda bump: btree_lookup_device(
                 levels, padded, perturb(bump))[0].sum().astype(jnp.float32)),
        ):
            t = fused_loop_time(fn, reps=32, iters=3)
            line = f"{n},{qn},{method},{t:.6f},{t / qn * 1e9:.1f}"
            rows.append(line)
            print(line, flush=True)
    with open("bench_out/probe_btree.csv", "w") as f:
        f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
