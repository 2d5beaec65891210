"""Elementwise (Hadamard) sparse ops: intersection multiply, pattern compare.

Reference analog: SparseMatrix::mul — elementwise multiplication, the lattice
meet (src/traits.rs:27-29).  Implemented as a merge of the two sorted entry
streams: a key present in both matrices appears exactly twice after the
concatenated sort, so the product lives at every non-head position.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..csr import SparseCSR
from .segments import INT32_SENTINEL, segment_heads, sort_by_keys, compact


@partial(jax.jit, static_argnames=("out_cap",))
def spmul(a: SparseCSR, b: SparseCSR, out_cap: Optional[int] = None) -> SparseCSR:
    """C[i,j] = A[i,j] (*) B[i,j] where both are nonzero (saturating mul)."""
    assert a.shape == b.shape
    out_cap = out_cap or min(a.capacity, b.capacity)
    sr = a.sr
    valid = jnp.concatenate(
        [jnp.arange(a.capacity) < a.nnz, jnp.arange(b.capacity) < b.nnz]
    )
    rows = jnp.concatenate([a.row_of_slot(), b.row_of_slot()])
    cols = jnp.concatenate([a.col_idx, b.col_idx])
    vals = tuple(jnp.concatenate([x, y]) for x, y in zip(a.values, b.values))
    r = jnp.where(valid, rows, a.n_rows)
    c = jnp.where(valid, cols, INT32_SENTINEL)
    keys, payload = sort_by_keys([r, c], list(vals))
    heads = segment_heads(keys)
    # value at a non-head position = product with its predecessor
    prev = tuple(jnp.concatenate([l[:1], l[:-1]]) for l in payload)
    prod = sr.mul(tuple(payload), prev)
    keep = (~heads) & (keys[0] < a.n_rows)
    keep = keep & ~sr.is_zero(prod)
    arrays = [keys[0], keys[1]] + list(prod)
    fills = [jnp.int32(a.n_rows), INT32_SENTINEL] + [jnp.zeros((), sr.dtype)] * len(prod)
    outs, count = compact(keep, arrays, fills, out_cap)
    row_ptr = jnp.searchsorted(
        outs[0], jnp.arange(a.n_rows + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return SparseCSR(
        row_ptr=row_ptr,
        col_idx=jnp.where(jnp.arange(out_cap) < count, outs[1], INT32_SENTINEL),
        values=tuple(outs[2:]),
        nnz=jnp.minimum(count, out_cap).astype(jnp.int32),
        n_rows=a.n_rows,
        n_cols=a.n_cols,
        sr_name=a.sr_name,
    )


def patterns_equal(a: SparseCSR, b: SparseCSR) -> jnp.ndarray:
    """True iff the sparsity patterns (row_ptr + col_idx over valid entries)
    match exactly (reference power_until_stable check, src/graph_csr.rs:561-575)."""
    if a.shape != b.shape:
        return jnp.asarray(False)
    same_nnz = a.nnz == b.nnz
    rp = jnp.all(a.row_ptr == b.row_ptr)
    cap = max(a.capacity, b.capacity)
    av = a.with_capacity(cap) if a.capacity < cap else a
    bv = b.with_capacity(cap) if b.capacity < cap else b
    idx = jnp.arange(cap)
    mask = idx < a.nnz
    cols = jnp.all(jnp.where(mask, av.col_idx == bv.col_idx, True))
    return same_nnz & rp & cols
