"""Pallas prefix-coalesce: gather-free compaction of block-slab survivors.

Every sort-path SpGEMM ends by compacting per-block survivor prefixes into
flat CSR arrays.  The XLA formulation is an index scatter + K gathers at
~10-14 ns/element (segments.compact) — at large nnz_C that single step
prices out the whole kernel (VERDICT r4 Weak #1).  But after the pack
sort, each block's survivors already sit at the FRONT of the block in
final order; compaction is then just nb variable-offset block copies:

    out[offs[b] : offs[b] + L] = stream[b, :]          (b ascending)

Each copy writes the block's full static L (Mosaic slices must be static);
block b+1's copy starts at offs[b+1] = offs[b] + survivors(b), OVERWRITING
block b's dead tail.  TPU grid steps run sequentially and each copy is
awaited before the next starts, so the overlap is deterministic: last
writer wins, which is exactly the semantics wanted.  Cost: nb x (K+1)
DMA issues (~microseconds total) instead of nnz_C-proportional gathers —
measured correct + ~us-scale in scripts/probe_r5.py (coalesce section).

The kernel also emits each position's source BLOCK id, from which callers
reconstruct global rows (block-local sort keys avoid the int32 overflow of
r*m+j at n*m > 2^31 — the latent escb key-wrap hazard at nell/ogbn scale).

STATUS: correct + ~us-scale in interpret mode, but Mosaic REJECTS the
real-TPU compile (scripts/probe_r5.py coalesce: tpu_compile_helper exit 1
— 1-D HBM DMAs at arbitrary element offsets appear unsupported).  The
production compaction in ops/slab.py therefore uses the arithmetic-gather
form (repeat_index block map + one packed row-gather, ~3.4 ns/index);
this kernel is kept as the recorded experiment and the interpret-mode
tests pin its semantics should a future Mosaic accept it.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _kernel(n_arr: int, l: int, offs_ref, *refs):
    # refs: n_arr stream inputs (HBM), then n_arr+1 outputs (HBM),
    # then scratch: bid buffer (VMEM), n_arr stream bufs, semaphores
    ins = refs[:n_arr]
    outs = refs[n_arr:2 * n_arr + 1]
    bid_buf = refs[2 * n_arr + 1]
    bufs = refs[2 * n_arr + 2:3 * n_arr + 2]
    sems = refs[3 * n_arr + 2]
    b = pl.program_id(0)
    dst = offs_ref[b]

    # stage each stream block through VMEM, then write to its offset;
    # every copy is awaited before the grid step ends, so the next block's
    # overlapping write lands strictly after this one
    for k in range(n_arr):
        cp_in = pltpu.make_async_copy(ins[k].at[b], bufs[k], sems.at[k])
        cp_in.start()
        cp_in.wait()
    bid_buf[:] = jnp.full((l,), b, jnp.int32)
    for k in range(n_arr):
        cp_out = pltpu.make_async_copy(
            bufs[k], outs[k].at[pl.ds(dst, l)], sems.at[k])
        cp_out.start()
        cp_out.wait()
    cp_bid = pltpu.make_async_copy(
        bid_buf, outs[n_arr].at[pl.ds(dst, l)], sems.at[n_arr])
    cp_bid.start()
    cp_bid.wait()


@partial(jax.jit, static_argnames=("out_cap",))
def coalesce_blocks(offs: jnp.ndarray, streams: Sequence[jnp.ndarray],
                    out_cap: int) -> Tuple[jnp.ndarray, ...]:
    """Copy each (nb, L) stream's blocks to positions offs[b] of a flat
    (out_cap + L,) output (later blocks overwrite earlier tails), plus a
    block-id array.  ``offs`` must be nondecreasing with steps <= L; the
    kernel clamps each destination into [0, out_cap] so an undersized
    out_cap corrupts data (callers poison via their nnz bound) but never
    writes out of bounds.  Returns (*compacted_streams, block_id); only
    positions < offs[nb-1] + survivors(nb-1) are meaningful."""
    streams = [jnp.asarray(s) for s in streams]
    nb, l = streams[0].shape
    n_arr = len(streams)
    cap_alloc = out_cap + l
    offs_c = jnp.clip(offs, 0, out_cap).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (n_arr + 1),
        scratch_shapes=[
            pltpu.VMEM((l,), jnp.int32),
            *[pltpu.VMEM((l,), s.dtype) for s in streams],
            pltpu.SemaphoreType.DMA((n_arr + 1,)),
        ],
    )
    outs = pl.pallas_call(
        partial(_kernel, n_arr, l),
        grid_spec=grid_spec,
        out_shape=[
            *[jax.ShapeDtypeStruct((cap_alloc,), s.dtype) for s in streams],
            jax.ShapeDtypeStruct((cap_alloc,), jnp.int32),
        ],
        interpret=_interpret(),
    )(offs_c, *streams)
    return tuple(o[:out_cap] for o in outs)
