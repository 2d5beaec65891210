"""Bit-exact StdRng (ChaCha12) port vs the reference's committed nnz.

The reference's SPARSE_EINSUM_APPROACHES.md table pins three consecutive
``thin(rng, 4/26)`` calls of ONE ``StdRng::from_seed([42;32])`` stream to
exact nnz values (10^3 -> 4070, 15^3 -> 13844, 20^3 -> 31936; the bench
at src/graph_csr.rs:1645-1670).  Matching all three pins the ChaCha12
keystream, the BlockRng u64 word order, the [1,2)-mantissa float draw,
AND the entry-iteration order of thin() simultaneously."""

import numpy as np

from sparsetpu.graphs import generate
from sparsetpu.utils.stdrng import StdRng, thin_reference


def _thinned_nnz(rng, side):
    rows, cols, vals, n = generate.lattice([side] * 3, torus=True)
    r, c, v = thin_reference(rows, cols, vals, 4.0 / 26.0, rng)
    assert n == side ** 3
    return len(r)


def test_reference_thin_stream_exact():
    rng = StdRng(b"\x2a" * 32)
    assert _thinned_nnz(rng, 10) == 4070
    assert _thinned_nnz(rng, 15) == 13844
    assert _thinned_nnz(rng, 20) == 31936


def test_chain_matrix_matches_reference_rounding():
    """The A^2..A^7 chain matrix (fresh [42;32] stream, 30^3 torus,
    density 3/26 — src/graph_magnus.rs:707-719) must reproduce the
    reference README's per-step nnz to its printed 3 significant digits
    (README.md:39-46: 252k, 655k, 1.57M, 3.38M, 6.59M, 11.7M)."""
    from sparsetpu import native

    rng = StdRng(b"\x2a" * 32)
    rows, cols, vals, n = generate.lattice([30] * 3, torus=True)
    r, c, v = thin_reference(rows, cols, vals, 3.0 / 26.0, rng)
    order = np.lexsort((c, r))
    r, c, v = r[order], c[order], v[order]
    row_ptr = np.zeros(n + 1, np.int64)
    np.add.at(row_ptr, r + 1, 1)
    row_ptr = np.cumsum(row_ptr)
    base = native.as_host_csr(row_ptr, c.astype(np.int32),
                              v.astype(np.uint64))
    want = ["252k", "655k", "1.57M", "3.38M", "6.59M", "11.7M"]

    def fmt(x):
        if x >= 1e7:
            return f"{x/1e6:.1f}M"
        if x >= 1e6:
            return f"{x/1e6:.2f}M"
        return f"{round(x/1e3)}k"

    prev = base
    got = []
    for step in range(2, 8):
        prev = native.spgemm(prev, base, n)
        got.append(fmt(int(prev[0][-1])))
    assert got[0] in want and all(g in want for g in got), got
