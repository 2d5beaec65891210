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
