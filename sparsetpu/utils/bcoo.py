"""`jax.experimental.sparse` BCOO comparator — the library baseline.

The reference triangulates its hand-written kernels against the third-party
`sprs` crate (src/graph_sprs.rs:267-273); the JAX-native analog is the
experimental BCOO format.  This module adapts SparseCSR to BCOO and runs
the library's sparse-sparse matmul, giving the agreement suite a third,
independently-implemented point of reference (and benches a library
column).

BCOO carries a single numeric dtype (no u32-limb semiring), so the
comparator is exact only while values stay below the dtype's exact-integer
range — f32: 2^24, int32: 2^31.  Callers guard; the cross-validation tests
use small counts by construction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

from ..csr import SparseCSR
from ..semiring import Semiring, U64


def csr_to_bcoo(a: SparseCSR, dtype=jnp.float32) -> jsparse.BCOO:
    """SparseCSR -> BCOO (host hop for the index concat; comparator only)."""
    row_ptr, col_idx, vals = a.to_numpy()
    rows = np.repeat(np.arange(a.n_rows, dtype=np.int32), np.diff(row_ptr))
    idx = np.stack([rows, col_idx.astype(np.int32)], axis=1)
    data = jnp.asarray(vals.astype(np.float64), dtype)
    return jsparse.BCOO((data, jnp.asarray(idx)), shape=a.shape)


def bcoo_to_csr(m: jsparse.BCOO, sr: Semiring = U64,
                capacity: Optional[int] = None) -> SparseCSR:
    msum = m.sum_duplicates()
    idx = np.asarray(jax.device_get(msum.indices))
    data = np.asarray(jax.device_get(msum.data))
    keep = data != 0
    vals = data[keep]
    if sr.name != "f32":
        vals = np.round(vals).astype(np.uint64)
    return SparseCSR.from_coo_host(
        idx[keep, 0], idx[keep, 1], vals, m.shape[0], m.shape[1], sr=sr,
        capacity=capacity,
    )


def spgemm_bcoo(a: SparseCSR, b: SparseCSR, sr: Optional[Semiring] = None,
                dtype=jnp.float32) -> SparseCSR:
    """C = A x B via the library's bcoo_dot_general (sparse x sparse ->
    sparse).  Saturation never triggers below the exact range, so results
    match the semiring kernels bit-exactly there."""
    sr = sr or a.sr
    am, bm = csr_to_bcoo(a, dtype), csr_to_bcoo(b, dtype)
    cm = jsparse.bcoo_dot_general(
        am, bm, dimension_numbers=(((1,), (0,)), ((), ()))
    )
    return bcoo_to_csr(cm, sr=sr)
