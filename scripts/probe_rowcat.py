#!/usr/bin/env python
"""Piecewise cost breakdown of the rowcat numeric phase on one TPU case:
times progressively larger prefixes of the pipeline (stream, padded
gathers, sort, merge, pack, assemble) under the fused-loop discipline."""

import dataclasses
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
    from sparsetpu.csr import SparseCSR
    from sparsetpu.graphs import generate
    from sparsetpu.ops import rowcat, segments
    from sparsetpu.semiring import U64

    n, epn = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (3375, 8)
    r, c, v, nn = generate.random_graph(n, n * epn, seed=n + epn)
    cap = 1 << (len(r) - 1).bit_length()
    a = SparseCSR.from_coo_host(r, c, v, nn, sr=U64, capacity=cap)
    fr, cat, perm, cats, of_cap, cap_g, out_cap = rowcat.rowcat_config(a, a)
    print(f"cats={cats} cap_g={cap_g} out_cap={out_cap}", file=sys.stderr,
          flush=True)

    def bumped(bump):
        return dataclasses.replace(
            a, col_idx=a.col_idx + (bump * 1e-30).astype(jnp.int32))

    def probe(name, fn, reps=16):
        t = fused_loop_time(fn, reps=reps, iters=2)
        print(json.dumps({"probe": name, "seconds": t}), flush=True)

    # stage 1: shared stream only
    def s1(bump):
        a2 = bumped(bump)
        counts, cincl, cin0, src, shift, ok = rowcat.shared_stream(
            a2, a, cap_g)
        return src[0].astype(jnp.float32) + cincl[-1].astype(jnp.float32)

    probe("stream", s1)

    # helper to run numeric_cat prefixes for the LARGEST category (the
    # one whose L admits the Pallas sort-merge A/B)
    L, rp_c, r_c, off = cats[-1]
    rows_c = jnp.where(jnp.arange(rp_c) < r_c, perm[off: off + rp_c], nn)

    def padded(a2):
        sr = a2.sr
        shared = rowcat.shared_stream(a2, a, cap_g)
        counts, cincl, cin0, src, shift, ok = shared
        rsafe = jnp.clip(rows_c, 0, nn - 1)
        off_r = cin0[a2.row_ptr[rsafe]]
        fr_sel = jnp.where(rows_c < nn, fr[rsafe], 0)
        l = jnp.arange(L, dtype=jnp.int32)
        ok_rl = l[None, :] < fr_sel[:, None]
        src_pad = jnp.clip(off_r[:, None] + l[None, :], 0, cap_g - 1)
        e = jnp.clip(src[src_pad], 0, a2.capacity - 1)
        b_pos = jnp.clip(src_pad + shift[e], 0, a.capacity - 1)
        cols_p = jnp.where(ok_rl, a.col_idx[b_pos], segments.INT32_SENTINEL)
        v_p = sr.mul(sr.gather(a2.values, e), sr.gather(a.values, b_pos))
        limbs_p = sr.where(ok_rl, v_p, sr.zeros(ok_rl.shape))
        return cols_p, limbs_p

    def s2(bump):
        cols_p, limbs_p = padded(bumped(bump))
        return cols_p[0, 0].astype(jnp.float32) + limbs_p[0][0, 0].astype(jnp.float32)

    probe("stream+padded_cat0", s2)

    def s3(bump):
        cols_p, limbs_p = padded(bumped(bump))
        out = jax.lax.sort([cols_p, *limbs_p], dimension=-1, num_keys=1,
                           is_stable=False)
        return out[0][0, 0].astype(jnp.float32)

    probe("..+sort1", s3)

    def s4(bump):
        out = rowcat.numeric_cat(bumped(bump), a, rows_c, fr, L,
                                 rowcat.shared_stream(bumped(bump), a, cap_g))
        return out[0][0, 0].astype(jnp.float32) + out[2][0].astype(jnp.float32)

    probe("..+full_cat0", s4)

    if cap_g <= rowcat.FUSE_MAX_CAP:
        def s5(bump):
            out = rowcat.rowcat_numeric(bumped(bump), a, fr, cat, perm,
                                        cats, of_cap, cap_g, out_cap)
            return out.values[0][0].astype(jnp.float32)

        probe("full_numeric", s5)

    # Pallas sort-merge A/B on the first category's padded slab
    from sparsetpu.kernels import sortmerge
    if sortmerge.available(L, a.sr.nlimbs):
        def s6(bump):
            cols_p, limbs_p = padded(bumped(bump))
            c2, l2 = sortmerge.sortmerge_rows(cols_p, limbs_p, a.sr.name)
            return c2[0, 0].astype(jnp.float32) + l2[0][0, 0].astype(jnp.float32)

        probe("..+pallas_sortmerge", s6)


if __name__ == "__main__":
    main()
