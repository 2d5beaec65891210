"""Pallas in-VMEM sort-merge: the per-category SpGEMM numeric kernel.

One (8, L) row-slab tile per grid step: bitonic-sort each row's padded
product list by column (lane-axis compare-exchange network built from
`pltpu.roll` + masked selects — no data movement leaves VMEM), merge
duplicate columns with a segmented *saturating* Hillis-Steele scan, then a
second bitonic pass packs survivors to the front.  This fuses what the XLA
formulation runs as sort -> HBM -> scan -> HBM -> sort into a single
VMEM-resident pass — the BASELINE north-star's "accumulator sized to
VMEM", realized as the sorted-merge structure the VPU actually likes
(hash probes are scalar-serial and dense scratch needs per-element
scatter; both map to this hardware's slowest primitives, see
SPGEMM_APPROACHES.md).

Reference semantics mirrored: the per-row merge is the reference's
per-row accumulator collapse (src/graph_csr.rs:306-346) on the exact
saturating semiring.

Supports L in {128, 256, ..., MAX_L} (pow2 lanes) and 1- or 2-limb
semirings.  Compare-exchange count is L-bound: log2(L)*(log2(L)+1)/2
stages per network; MAX_L keeps the unrolled Mosaic program reasonable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.segments import INT32_SENTINEL as _JSENT
from ..semiring import by_name

MAX_L = 2048
# python/numpy constants (jnp scalars created at module scope would be
# captured consts inside the pallas kernel, which Mosaic rejects)
import numpy as _np
_U32_MAX = _np.uint32(0xFFFFFFFF)
INT32_SENTINEL = int(_JSENT)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def available(L: int, nlimbs: int) -> bool:
    return 128 <= L <= MAX_L and (L & (L - 1)) == 0 and nlimbs in (1, 2)


def _roll(x, shift):
    # lane-axis circular shift; positive shift moves values to higher
    # lanes.  jnp.roll in interpreter mode (pltpu.roll is Mosaic-only and
    # rejects negative shifts — normalize modulo the axis length).
    if _interpret():
        return jnp.roll(x, shift, 1)
    return pltpu.roll(x, shift % x.shape[1], 1)


def _cswap(cols, limbs, idx, d, k):
    """One bitonic compare-exchange stage at distance d (XOR partners)
    inside ascending/descending blocks of size k.

    All mask logic stays as comparisons and boolean algebra — a select
    *returning* a boolean vector makes Mosaic emit an unsupported
    i8 -> i1 truncation."""
    lower = (idx & d) == 0
    pa_c = jnp.where(lower, _roll(cols, -d), _roll(cols, d))
    pa_l = tuple(
        jnp.where(lower, _roll(x, -d), _roll(x, d)) for x in limbs
    )
    # take_min: position holds the min iff bit_d(idx) == bit_k(idx)
    # (computed on integers — even i1 == i1 tempts the unsupported trunc)
    take_min = (((idx // d) ^ (idx // k)) & 1) == 0
    # swap iff the partner belongs at this position; ties never swap, so
    # payloads move consistently on both sides of each pair
    swap = (take_min & (cols > pa_c)) | (~take_min & (cols < pa_c))
    cols = jnp.where(swap, pa_c, cols)
    limbs = tuple(jnp.where(swap, p, x) for p, x in zip(pa_l, limbs))
    return cols, limbs


def _bitonic(cols, limbs, idx, L):
    k = 2
    while k <= L:
        j = k // 2
        while j >= 1:
            cols, limbs = _cswap(cols, limbs, idx, j, k)
            j //= 2
        k *= 2
    return cols, limbs


def _sat_add(sr_name, x, y):
    """Saturating add on limb tuples (mirrors semiring.py, runs on VPU)."""
    if sr_name == "f32":
        return (x[0] + y[0],)
    if sr_name == "u32":
        s = x[0] + y[0]
        return (jnp.where(s < x[0], _U32_MAX, s),)
    alo, ahi = x
    blo, bhi = y
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    h1 = ahi + bhi
    c1 = h1 < ahi
    hi = h1 + carry
    ovf = c1 | (hi < h1)
    return (jnp.where(ovf, _U32_MAX, lo), jnp.where(ovf, _U32_MAX, hi))


def _is_zero(sr_name, v):
    z = v[0] == 0
    for x in v[1:]:
        z = z & (x == 0)
    return z


def _kernel(sr_name, L, n_limbs, *refs):
    in_refs, out_refs = refs[: 1 + n_limbs], refs[1 + n_limbs:]
    cols = in_refs[0][:]
    limbs = tuple(r[:] for r in in_refs[1:])
    idx = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)

    cols, limbs = _bitonic(cols, limbs, idx, L)

    # segment heads at column changes; merge runs with a segmented
    # saturating Hillis-Steele scan along lanes.  Masks live as int32 —
    # Mosaic cannot roll/truncate i1 vectors ("Unsupported target
    # bitwidth for truncation") — and convert to bool only inside selects.
    prev = jnp.where(idx == 0, jnp.int32(-1), _roll(cols, 1))
    head = (cols != prev).astype(jnp.int32)
    flags = head
    vals = limbs
    s = 1
    while s < L:
        f_l = _roll(flags, s)
        v_l = tuple(_roll(x, s) for x in vals)
        valid = idx >= s
        f_l = jnp.where(valid, f_l, 0)
        v_l = tuple(jnp.where(valid, x, 0) for x in v_l)
        summed = _sat_add(sr_name, v_l, vals)
        vals = tuple(
            jnp.where(flags != 0, x, t) for x, t in zip(vals, summed)
        )
        flags = flags | f_l
        s *= 2

    tail = jnp.where(idx == L - 1, jnp.int32(1), _roll(head, -1))
    keep = (tail != 0) & (cols != INT32_SENTINEL) \
        & ~_is_zero(sr_name, vals)
    keyed = jnp.where(keep, cols, INT32_SENTINEL)
    vals = tuple(jnp.where(keep, x, 0) for x in vals)

    keyed, vals = _bitonic(keyed, vals, idx, L)

    out_refs[0][:] = keyed
    for r, x in zip(out_refs[1:], vals):
        r[:] = x


@partial(jax.jit, static_argnames=("sr_name",))
def sortmerge_rows(cols, limbs, sr_name: str):
    """cols (R, L) int32 + limb arrays -> (sorted-merged-packed cols,
    limbs).  R must be a multiple of 8, L a pow2 in [128, MAX_L]."""
    R, L = cols.shape
    assert R % 8 == 0 and available(L, len(limbs)), (R, L, len(limbs))
    n_limbs = len(limbs)
    spec = pl.BlockSpec((8, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, sr_name, L, n_limbs),
        grid=(R // 8,),
        in_specs=[spec] * (1 + n_limbs),
        out_specs=[spec] * (1 + n_limbs),
        out_shape=[jax.ShapeDtypeStruct((R, L), cols.dtype)]
        + [jax.ShapeDtypeStruct((R, L), x.dtype) for x in limbs],
        interpret=_interpret(),
    )(cols, *limbs)
    return out[0], tuple(out[1:])
