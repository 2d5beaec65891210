"""Sorted-segment primitives: the vector backbone of every sparse kernel.

The reference's kernels accumulate into per-row dense/BTreeMap scratch
(src/graph_csr.rs:306-346); on TPU we instead keep everything as flat sorted
streams and use sort + segmented scans, which map onto the VPU without any
scalar scatter loops.

Core primitives:
  - ``sort_by_keys``:      multi-operand lexicographic sort (lax.sort).
  - ``segment_reduce_sorted``: saturating segmented reduction over a sorted
    key stream via ``jax.lax.associative_scan`` (saturating unsigned add is
    associative, so the classic segmented-scan combine applies).
  - ``compact``:           stable front-compaction of masked entries.

All shapes are static; invalid/padded entries carry a sentinel key that sorts
last and is dropped during compaction.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..semiring import Semiring, Value

INT32_SENTINEL = jnp.int32(0x7FFFFFFF)


def sort_by_keys(keys: Sequence[jnp.ndarray], payloads: Sequence[jnp.ndarray]):
    """Lexicographic stable sort by `keys`; returns (sorted_keys, sorted_payloads)."""
    operands = list(keys) + list(payloads)
    out = jax.lax.sort(operands, num_keys=len(keys), is_stable=True)
    return out[: len(keys)], out[len(keys):]


def _shift_right_one(x: jnp.ndarray, fill) -> jnp.ndarray:
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def segment_heads(keys: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Boolean array: True where a new key-segment starts (element 0 is True)."""
    head = None
    for k in keys:
        prev = _shift_right_one(k, k.dtype.type(-1) if jnp.issubdtype(k.dtype, jnp.signedinteger) else 0)
        differs = k != prev
        head = differs if head is None else (head | differs)
    head = head.at[0].set(True)
    return head


def segment_reduce_sorted(sr: Semiring, heads: jnp.ndarray, values: Value) -> Value:
    """Segmented inclusive scan-totals: position i holds the running segment sum.

    The *segment total* lives at each segment's last element.  Combine op:
      (v1, h1) . (v2, h2) = (v2 if h2 else v1 (+) v2,  h1 | h2)
    which is associative because saturating unsigned add is associative.
    """

    def combine(a, b):
        va, ha = a[:-1], a[-1]
        vb, hb = b[:-1], b[-1]
        summed = sr.add(va, vb)
        v = tuple(jnp.where(hb, y, s) for y, s in zip(vb, summed))
        return (*v, ha | hb)

    init = (*values, heads)
    out = jax.lax.associative_scan(combine, init)
    return out[:-1]


def compact(keep: jnp.ndarray, arrays: Sequence[jnp.ndarray], fill_values, out_size: int):
    """Stable-compact elements where ``keep`` to the front of ``out_size`` arrays.

    Entries beyond capacity are silently dropped (mode='drop').  Returns
    (compacted_arrays, count) where count = total number of kept entries
    (may exceed out_size if capacity was too small — caller checks).
    """
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, pos, out_size)  # out-of-bounds => dropped
    outs = []
    for a, fill in zip(arrays, fill_values):
        o = jnp.full((out_size,) + a.shape[1:], fill, a.dtype)
        o = o.at[idx].set(a, mode="drop")
        outs.append(o)
    count = jnp.sum(keep.astype(jnp.int32))
    return outs, count


def reduce_sorted_coo(
    sr: Semiring,
    keys: Sequence[jnp.ndarray],
    values: Value,
    valid: jnp.ndarray,
    out_size: int,
    key_fills: Sequence,
    drop_zeros: bool = True,
):
    """Sort-free dedup of an already-sorted COO stream.

    Given sorted keys (invalid entries sorted last with sentinel keys),
    merges duplicate keys with saturating add, optionally drops zero totals
    (reference from_coo filters zeros, src/graph_csr.rs:106-118), and
    compacts to the front.  Returns (out_keys, out_values, nnz).
    """
    heads = segment_heads(keys)
    totals = segment_reduce_sorted(sr, heads, values)
    n = keys[0].shape[0]
    tail = jnp.concatenate([heads[1:], jnp.ones((1,), bool)])
    keep = tail & valid
    if drop_zeros:
        keep = keep & ~sr.is_zero(totals)
    arrays = list(keys) + list(totals)
    fills = list(key_fills) + [jnp.zeros((), sr.dtype)] * len(totals)
    outs, count = compact(keep, arrays, fills, out_size)
    nk = len(keys)
    return outs[:nk], tuple(outs[nk:]), count
