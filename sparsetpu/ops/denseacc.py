"""Dense-accumulator general SpGEMM: C = A x B via B-densify + Pallas SpMM.

The fourth SpGEMM kernel category (after ESC, blocked ESC, and rowcat): the
TPU translation of the reference's per-row dense-scratch Gustavson loop
(src/graph_csr.rs:306-346) for the case where the scratch is the FULL output
row.  Instead of expanding and sorting partial products (cost ~ products x
sort passes), densify B once (one device scatter) and stream C row tiles
through the chain's DMA-ring Pallas kernel (kernels/spmm_pallas.py):

    for each A entry (i, k, v):  C[i, :] += v * B_dense[k, :]

Cost model: nnz(A) DMAs of (S, 128) row slabs (~300-400 ns each, measured)
+ one dense->CSR pack of the (n, m) product — *independent of the product
count*, so it wins over sort-based ESC exactly where Gustavson wins on CPU:
dense-ish products and hub rows whose expansions explode (power-law).  It
loses where m is huge and nnz tiny (every DMA moves a full output row).

Exactness: values ride f32; exact while max(C) < 2^24 — checked ON DEVICE,
poisoning nnz to -1 (the u64-saturating discipline, .check() raises).
Memory: B_dense + C_dense are (n, ~m) f32 — 2.9 GB each at n=27000.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..csr import SparseCSR
from ..semiring import U64
from ..kernels import spmm_pallas as sp


def _pow2(x: int) -> int:
    return 1 << (max(int(x), 1) - 1).bit_length()


def plan_dense_acc(a: SparseCSR, b_n_cols: int, rows_per_tile: int = 8):
    """Host half: tile A's entries for the Pallas kernel (one-time per
    sparse operand, like escb's bin packing / rowcat's categorization)."""
    return sp.tile_sparse_operand(
        a, rows_per_tile=rows_per_tile, n_cols_p=b_n_cols, pad_rows=True
    )


@partial(jax.jit, static_argnames=("rows_per_tile", "cap", "n", "m"))
def dense_acc_numeric(cnt, cols, lrow, vals, b: SparseCSR,
                      rows_per_tile: int, cap: int, n: int, m: int
                      ) -> SparseCSR:
    """Device half: densify B, DMA-ring SpMM, exactness check, CSR pack."""
    bd = b.to_dense()
    bf = bd[0].astype(jnp.float32)
    if len(bd) > 1:
        bf = bf + bd[1].astype(jnp.float32) * float(1 << 32)
    p = sp.to_row_planes(bf)
    c = sp.spmm_pallas(cnt, cols, lrow, vals, p,
                       rows_per_tile=rows_per_tile)
    dense = c.reshape(c.shape[0], -1)[:n, :m]
    exact = jnp.max(dense) < float(1 << 24)
    lo = dense.astype(jnp.uint32)
    out = SparseCSR.from_dense_device((lo, jnp.zeros_like(lo)), U64,
                                      capacity=cap)
    nnz = jnp.where(exact & (out.nnz >= 0), out.nnz, -1).astype(jnp.int32)
    import dataclasses

    return dataclasses.replace(out, nnz=nnz)


@partial(jax.jit, static_argnames=("rows_per_tile", "n", "w"))
def _panel_numeric(cnt, cols, lrow, vals, b: SparseCSR, lo,
                   rows_per_tile: int, n: int, w: int):
    """One column panel of the dense accumulator: densify B's columns
    [lo, lo+w) by device scatter (no full B_dense ever exists), run the
    DMA-ring SpMM, return the dense C panel + exactness flag + nnz."""
    rows = b.row_of_slot()
    valid = (b.col_idx >= lo) & (b.col_idx < lo + w)
    r = jnp.where(valid, rows, jnp.int32(b.n_rows))
    c = jnp.where(valid, b.col_idx - lo, 0)
    bf = b.values[0].astype(jnp.float32)
    if len(b.values) > 1:
        bf = bf + b.values[1].astype(jnp.float32) * float(1 << 32)
    panel = jnp.zeros((b.n_rows, w), jnp.float32).at[r, c].set(
        jnp.where(valid, bf, 0.0), mode="drop")
    p = sp.to_row_planes(panel)
    cd = sp.spmm_pallas(cnt, cols, lrow, vals, p,
                        rows_per_tile=rows_per_tile)
    dense = cd.reshape(cd.shape[0], -1)[:n, :w]
    exact = jnp.max(dense) < float(1 << 24)
    nnzp = jnp.count_nonzero(dense).astype(jnp.int32)
    return dense, exact, nnzp


@partial(jax.jit, static_argnames=("cap",))
def _pack_panel(dense, cap: int) -> SparseCSR:
    lo = dense.astype(jnp.uint32)
    return SparseCSR.from_dense_device((lo, jnp.zeros_like(lo)), U64,
                                       capacity=cap)


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _merge_panel(dst_col, dst_lo, dst_hi, base_off, final_row_ptr,
                 csr_p: SparseCSR, col_off):
    """Scatter one panel's CSR entries into the final arrays.  Panels have
    disjoint, increasing column ranges, so the final (row, col) order is
    reconstructed with per-row offsets — NO global sort (stays under the
    measured sort-kernel compile ceiling, SPGEMM_APPROACHES.md §4).
    Slot rows come from row_of_slot (scatter+cummax), not searchsorted —
    capacity-many binary-search queries cost log2 random-gather passes."""
    n = csr_p.n_rows
    cap_p = csr_p.capacity
    slots = jnp.arange(cap_p, dtype=jnp.int32)
    r = csr_p.row_of_slot()
    valid = slots < csr_p.nnz
    r_safe = jnp.clip(r, 0, n - 1)
    local = slots - csr_p.row_ptr[r_safe]
    dest = final_row_ptr[r_safe] + base_off[r_safe] + local
    dest = jnp.where(valid, dest, jnp.int32(dst_col.shape[0]))
    dst_col = dst_col.at[dest].set(csr_p.col_idx + col_off, mode="drop")
    dst_lo = dst_lo.at[dest].set(csr_p.values[0], mode="drop")
    dst_hi = dst_hi.at[dest].set(csr_p.values[1], mode="drop")
    base_off = base_off + jnp.diff(csr_p.row_ptr)
    return dst_col, dst_lo, dst_hi, base_off


def spgemm_dense_acc_tiled(a: SparseCSR, b: SparseCSR,
                           panel_cols: int = 8192,
                           rows_per_tile: int = 8) -> SparseCSR:
    """C = A x B through COLUMN-PANEL sweeps of the dense accumulator.

    The untiled path (spgemm_dense_acc) needs B_dense + C_dense = 2 (n, m)
    f32 arrays in HBM — dead at n >= ~28k.  This variant keeps only one
    (n, panel_cols) B panel + C panel live at a time: cost = n_panels x
    nnz(A) row-slab DMAs + one pack per panel + a sort-free scatter merge,
    unlocking real-graph scale (nell 65k / ogbn_arxiv 169k, BASELINE
    configs 3-4) where every sort-based kernel exceeds the compile ceiling
    AND the dense product exceeds HBM.  Reference analog: the per-row
    dense-scratch Gustavson loop (src/graph_csr.rs:306-346) whose scratch
    is a column slice of the output row."""
    assert a.n_cols == b.n_rows, (a.shape, b.shape)
    assert a.sr.name == "u64" == b.sr.name, (a.sr.name, b.sr.name)
    assert panel_cols % 1024 == 0, panel_cols
    n, m = a.n_rows, b.n_cols
    cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
        a, rows_per_tile=rows_per_tile, n_cols_p=panel_cols, pad_rows=True)
    n_panels = -(-m // panel_cols)
    panels = []
    all_exact = True
    for pi in range(n_panels):
        dense, exact, nnzp = _panel_numeric(
            cnt, cols, lrow, vals, b, jnp.int32(pi * panel_cols),
            meta["rows_per_tile"], n, panel_cols)
        all_exact = all_exact and bool(exact)
        cap_p = _pow2(max(int(nnzp), 1))
        csr_p = _pack_panel(dense, cap_p)
        panels.append((csr_p, pi * panel_cols))
    counts = panels[0][0].row_ptr
    counts = jnp.diff(counts)
    for csr_p, _ in panels[1:]:
        counts = counts + jnp.diff(csr_p.row_ptr)
    final_row_ptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    total = sum(int(csr_p.nnz) for csr_p, _ in panels)
    poisoned = (not all_exact) or any(
        int(csr_p.nnz) < 0 for csr_p, _ in panels)
    cap = _pow2(max(total, 1))
    from .segments import INT32_SENTINEL

    dst_col = jnp.full((cap,), INT32_SENTINEL, jnp.int32)
    dst_lo = jnp.zeros((cap,), jnp.uint32)
    dst_hi = jnp.zeros((cap,), jnp.uint32)
    base_off = jnp.zeros((n,), jnp.int32)
    for csr_p, col_off in panels:
        dst_col, dst_lo, dst_hi, base_off = _merge_panel(
            dst_col, dst_lo, dst_hi, base_off, final_row_ptr,
            csr_p, jnp.int32(col_off))
    nnz = jnp.asarray(-1 if poisoned else total, jnp.int32)
    return SparseCSR(row_ptr=final_row_ptr, col_idx=dst_col,
                     values=(dst_lo, dst_hi), nnz=nnz,
                     n_rows=n, n_cols=m, sr_name=a.sr.name)


def spgemm_dense_acc(a: SparseCSR, b: SparseCSR,
                     out_cap: Optional[int] = None,
                     rows_per_tile: int = 8) -> SparseCSR:
    """C = A x B (u64 semiring, values < 2^24) through the dense
    accumulator.  One host prep of A + one fused device dispatch."""
    assert a.n_cols == b.n_rows, (a.shape, b.shape)
    assert a.sr.name == "u64" == b.sr.name, (a.sr.name, b.sr.name)
    cnt, cols, lrow, vals, meta = plan_dense_acc(
        a, b.n_cols, rows_per_tile=rows_per_tile)
    if out_cap is None:
        # size the static output from a device nnz count of the dense
        # product's support; cheaper: upper-bound by min(n*m, flops) is
        # huge — run numeric once with the worst-case-free bound from a
        # symbolic count
        from .spgemm import symbolic_flops_exact

        out_cap = _pow2(min(symbolic_flops_exact(a, b),
                            a.n_rows * b.n_cols))
    return dense_acc_numeric(cnt, cols, lrow, vals, b,
                             meta["rows_per_tile"], out_cap,
                             a.n_rows, b.n_cols)
