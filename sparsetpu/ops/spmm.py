"""Sparse x dense SpMM and the dense-accumulator chain kernel.

The third kernel category (with ESC and block-band): when the product of a
chain step is *dense-ish* — the A^k torus chain's band covers most of the
matrix by A^6 — the fastest TPU formulation keeps the product as a dense
f32 matrix and computes C = A x P row-wise:

    for each A entry (i, k, v):  C[i, :] += v * P[k, :]

i.e. a gather of P rows by A's column indices, scaled, segment-summed by
A's (sorted) row indices — no scatter, no sort, HBM-bandwidth bound.  This
is the dense-accumulator Gustavson category (the reference's per-row dense
scratch, src/graph_csr.rs:306-346, vectorized over the entire matrix), and
the role MAGNUS's dense-accumulation row category plays (arXiv:2501.07056).

Exactness: integer counts carried in f32; gathers/multiplies/sums are exact
while true values stay < 2^24 (guarded by the caller via max checks).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..csr import SparseCSR


def prepare_spmm_operand(a: SparseCSR, n_chunks: int = 8):
    """Host-side preprocessing of the static sparse operand: split entries
    into row-contiguous chunks of fixed padded size so the device loop is
    fully static.  Returns (cols, vals, local_rows, rows_per_chunk)."""
    n = a.n_rows
    row_ptr, col_idx, vals_np = a.to_numpy()
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    rpc = -(-n // n_chunks)
    counts = [
        int(row_ptr[min((c + 1) * rpc, n)] - row_ptr[min(c * rpc, n)])
        for c in range(n_chunks)
    ]
    cap = max(max(counts), 1)
    cols = np.zeros((n_chunks, cap), np.int32)
    vals = np.zeros((n_chunks, cap), np.float32)
    lrow = np.zeros((n_chunks, cap), np.int32)
    for c in range(n_chunks):
        r0 = min(c * rpc, n)
        base = int(row_ptr[r0])
        cnt = counts[c]
        cols[c, :cnt] = col_idx[base:base + cnt]
        vals[c, :cnt] = vals_np[base:base + cnt].astype(np.float32)
        lrow[c, :cnt] = (rows[base:base + cnt] - r0).astype(np.int32)
    vmax = float(vals_np.max()) if len(vals_np) else 0.0
    if vmax >= float(1 << 24):
        raise ValueError("spmm dense path requires values < 2^24")
    return jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(lrow), rpc


@partial(jax.jit, static_argnames=("rows_per_chunk",))
def spmm_dense(cols, vals, local_rows, p, rows_per_chunk: int):
    """C = A x P with A in chunked form (prepare_spmm_operand) and P dense
    f32 (n x n).  Returns dense C (n x n) f32."""
    n_chunks = cols.shape[0]
    n = p.shape[0]

    def body(ci, c):
        ck = jax.lax.dynamic_index_in_dim(cols, ci, keepdims=False)
        vk = jax.lax.dynamic_index_in_dim(vals, ci, keepdims=False)
        rk = jax.lax.dynamic_index_in_dim(local_rows, ci, keepdims=False)
        g = p[ck, :] * vk[:, None]
        rowsum = jax.ops.segment_sum(
            g, rk, num_segments=rows_per_chunk, indices_are_sorted=True
        )
        return jax.lax.dynamic_update_slice(
            c, rowsum, (ci * rows_per_chunk, 0)
        )

    c0 = jnp.zeros((n_chunks * rows_per_chunk, n), jnp.float32)
    c = jax.lax.fori_loop(0, n_chunks, body, c0)
    return c[:n]


@jax.jit
def spmm_csr_dense(a: SparseCSR, d: jnp.ndarray) -> jnp.ndarray:
    """C = A x D with A a 1-limb (f32) SparseCSR and D dense f32 of shape
    (a.n_cols, m) or (a.n_cols,).  One gather of D rows by A's column
    indices, scaled, segment-summed by row — never leaves the device.

    This is the SpMM lowering target for the einsum planner's sparse x dense
    matmul patterns (the reference VM walks the sparse operand's rows and
    reads the dense operand directly, linalg/src/einsum.rs:591-626).
    Exact for integer counts < 2^24 carried in f32.
    """
    valid = jnp.arange(a.capacity) < a.nnz
    rows = jnp.where(valid, a.row_of_slot(), a.n_rows)
    cols = jnp.where(valid, a.col_idx, 0)
    v = jnp.where(valid, a.values[0].astype(jnp.float32), 0.0)
    g = d[cols] * (v[:, None] if d.ndim == 2 else v)
    out = jax.ops.segment_sum(
        g, rows, num_segments=a.n_rows + 1, indices_are_sorted=True
    )
    return out[: a.n_rows]


def dense_to_csr(c_dense, sr, capacity: Optional[int] = None) -> SparseCSR:
    """Host-side dense f32 -> SparseCSR on `sr` (validation/extraction)."""
    d = np.asarray(jax.device_get(c_dense))
    r, cc = np.nonzero(d)
    vals = np.round(d[r, cc]).astype(np.uint64) if sr.name != "f32" else d[r, cc]
    return SparseCSR.from_coo(
        r, cc, vals, d.shape[0], d.shape[1], sr=sr,
        capacity=capacity or max(len(r), 1),
    )


@jax.jit
def spmm_csr_dense_exact(a: SparseCSR, d_limbs):
    """C = A x D on the exact saturating integer semiring (u32/u64 limb
    tuples) — the SpMM lowering for integer einsum specs the f32 carrier
    cannot serve (reference VM handles integer semirings uniformly,
    linalg/src/einsum.rs:38-85).

    Gather D rows by A's columns, saturating-multiply by A's entry values,
    then segment-sum by row as MODULAR 16-bit plane sums recombined with
    saturation (segments._recombine_sat16): the saturating fold of
    non-negative values equals min(true sum, MAX), so exact plane sums
    suffice.  Exact while every row's entry count < 2^16; returns
    (limbs, exact_ok) and the caller must not use limbs when ~exact_ok —
    the framework's loud-failure discipline.
    """
    from . import segments

    sr = a.sr
    valid = jnp.arange(a.capacity) < a.nnz
    rows = jnp.where(valid, a.row_of_slot(), a.n_rows)
    cols = jnp.where(valid, jnp.clip(a.col_idx, 0, a.n_cols - 1), 0)
    g = tuple(l[cols] for l in d_limbs)                    # (cap, m) limbs
    av = tuple(l[:, None] for l in a.values)
    prod = sr.mul(av, g)
    prod = tuple(jnp.where(valid[:, None], l, 0) for l in prod)
    m16 = jnp.uint32(0xFFFF)
    planes = []
    for limb in prod:
        planes.append(limb & m16)
        planes.append(limb >> 16)
    n_seg = a.n_rows + 1
    sums = [
        jax.ops.segment_sum(p, rows, num_segments=n_seg,
                            indices_are_sorted=True)[: a.n_rows]
        for p in planes
    ]
    out = segments._recombine_sat16(sr, sums)
    # plane exactness: a 16-bit plane of 2^16 max-valued terms wraps uint32
    exact_ok = jnp.max(a.row_nnz()) < 0xFFFF
    return out, exact_ok
