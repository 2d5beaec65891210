"""Probe: fully-dense MXU SpGEMM route (densify A AND B, one matmul, pack).

Question 1 (exactness): is `jnp.dot(a, b, precision=HIGHEST)` bit-exact for
integer-valued f32 inputs?  HIGHEST is the 6-pass bf16 decomposition; an
integer < 2^16 splits exactly into two bf16 terms (b2 = 0), so every
nonzero cross term is among the 6 computed passes and each bf16 x bf16
product is exact in the f32 accumulator -> exact while inputs < 2^16 and
every (partial) row sum < 2^24.  Verify empirically vs numpy int64,
including values near the 2^16 input bound and outputs pushed near 2^24.

Question 2 (speed): matmul + lane-sort pack time at sweep-cell shapes
(n = 1024..8192) -- the candidate to replace ESC/denseacc on small-n cells
(cost model says MXU wins outright; nobody wired the fully-dense route).

Also probes int32 dot_general as the no-carrier alternative.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from sparsetpu.bench.timing import fused_loop_time  # noqa: E402


def exactness():
    rng = np.random.default_rng(7)
    print("case,n,vmax,density,max_out,exact_f32_highest,exact_int32")
    # n kept small: the int64 numpy oracle is O(n^3) on a single core
    for n, vmax, dens in [
        (512, 255, 1.0),
        (512, 4095, 0.2),
        (1024, 65535, 0.003),
        (1024, 46340, 0.02),   # inputs near sqrt(2^31): single products ok
        (1024, 255, 0.3),      # dense-ish, outputs pushed toward 2^24
    ]:
        a = (rng.random((n, n)) < dens) * rng.integers(1, vmax + 1, (n, n))
        b = (rng.random((n, n)) < dens) * rng.integers(1, vmax + 1, (n, n))
        ref = a.astype(np.int64) @ b.astype(np.int64)
        mo = int(ref.max())
        cf = jnp.dot(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
        ok_f = bool((np.asarray(cf).astype(np.int64) == ref).all())
        try:
            ci = jax.lax.dot_general(
                jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32),
                (((1,), (0,)), ((), ())))
            ok_i = bool((np.asarray(ci).astype(np.int64) == ref).all())
        except Exception as e:  # pragma: no cover
            ok_i = f"ERR:{type(e).__name__}"
        print(f"exact,{n},{vmax},{dens},{mo},{ok_f},{ok_i}", flush=True)


def speed():
    print("case,n,what,seconds")
    for n in [1024, 2048, 4096, 8192]:
        rng = np.random.default_rng(3)
        a = ((rng.random((n, n)) < 0.03) *
             rng.integers(1, 100, (n, n))).astype(np.float32)
        ad = jnp.asarray(a)

        def mm(bump, ad=ad):
            c = jnp.dot(ad + bump * 0, ad, precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(c[:1, :128])

        t = fused_loop_time(mm, reps=8)
        print(f"speed,{n},matmul_f32_highest,{t:.6f}", flush=True)

        def mmi(bump, ad=ad):
            ai = (ad + bump * 0).astype(jnp.int32)
            c = jax.lax.dot_general(ai, ai.astype(jnp.int32),
                                    (((1,), (0,)), ((), ())))
            return jnp.sum(c[:1, :128].astype(jnp.float32))

        try:
            t = fused_loop_time(mmi, reps=4)
            print(f"speed,{n},matmul_int32,{t:.6f}", flush=True)
        except Exception as e:
            print(f"speed,{n},matmul_int32,ERR:{type(e).__name__}", flush=True)

        # matmul + full lane-sort pack (the real route's device cost)
        from sparsetpu.ops.denseacc import _dense_to_csr_lanesort

        cap = 1 << int(np.ceil(np.log2(max((np.count_nonzero(a) ** 2) / n, 2))))
        cap = min(cap, n * n)

        def mmp(bump, ad=ad, cap=cap):
            c = jnp.dot(ad + bump * 0, ad, precision=jax.lax.Precision.HIGHEST)
            s = _dense_to_csr_lanesort(c, "f32", cap)
            return jnp.sum(s.values[0][:128]) + s.nnz.astype(jnp.float32)

        t = fused_loop_time(mmp, reps=8)
        print(f"speed,{n},matmul+pack,{t:.6f}", flush=True)


if __name__ == "__main__":
    print(jax.devices(), file=sys.stderr)
    speed()
    exactness()
