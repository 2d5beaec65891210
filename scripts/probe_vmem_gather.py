"""Probe: vectorized gather from a VMEM-resident table inside Pallas.

The fused-ESC design (SPGEMM_APPROACHES §4 next step) keeps B's entry
arrays in VMEM and expands partial products with in-kernel gathers.  Its
viability hinges on one number: elements/s of ``table[idx]`` where both
live in VMEM.  XLA's HBM gather measures ~100 M elem/s; the VPU could in
principle do far better from VMEM — or Mosaic may serialize it through
the scalar core.  Measure, then design.

Emits CSV: kind,table_elems,idx_elems,reps,ms_per_rep,gelem_per_s
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(table_ref, idx_ref, out_ref, reps: int):
    def body(i, acc):
        idx = idx_ref[:] + (acc & 1)  # perturb: defeat CSE across reps
        g = jnp.take(table_ref[:], idx, axis=0)
        return acc + jnp.sum(g)

    out_ref[0, 0] = jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def gather2d_kernel(table_ref, idx_ref, out_ref, reps: int):
    """Gather formulated 2-D: idx (R, 128), table flat; take along lanes."""
    def body(i, acc):
        idx = idx_ref[:] + (acc & 1)
        g = jnp.take(table_ref[:].reshape(-1), idx.reshape(-1)).reshape(
            idx.shape)
        return acc + jnp.sum(g)

    out_ref[0, 0] = jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def run(kind: str, n_table: int, n_idx: int, reps: int):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 100, n_table).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n_table, n_idx).astype(np.int32))
    if kind == "flat":
        kern = functools.partial(gather_kernel, reps=reps)
        args = (table, idx)
    elif kind == "2d":
        kern = functools.partial(gather2d_kernel, reps=reps)
        args = (table.reshape(-1, 128), idx.reshape(-1, 128))
    else:
        raise SystemExit(kind)
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per = dt / reps
    print(f"{kind},{n_table},{n_idx},{reps},{per*1e3:.3f},"
          f"{n_idx/per/1e9:.3f}", flush=True)


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "flat"
    n_table = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1 << 16
    n_idx = int(float(sys.argv[3])) if len(sys.argv) > 3 else 1 << 15
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    run(kind, n_table, n_idx, reps)
