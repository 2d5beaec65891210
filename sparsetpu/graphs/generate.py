"""Host-side graph generators (numpy), matching reference semantics.

Mirrors src/graph.rs:54-154 and src/graph_csr.rs:131-247: Moore-neighborhood
N-D lattices with optional torus wrap, Erdős–Rényi-style random multigraphs,
symmetric ``thin`` density reduction, and edge-list builders.  Generation is
host-side (as in the reference, which builds on CPU before benchmarking);
results are COO triplet arrays convertible to device ``SparseCSR``.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

Coo = Tuple[np.ndarray, np.ndarray, np.ndarray, int]  # rows, cols, vals(u64), n


def _dedup_coo(n: int, rows, cols, vals) -> Coo:
    """Sort by (row, col), merge duplicates with saturating-u64 add, drop zeros."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.uint64)
    if rows.size == 0:
        return rows.astype(np.int32), cols.astype(np.int32), vals, n
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    key = rows * n + cols
    head = np.ones(len(key), bool)
    head[1:] = key[1:] != key[:-1]
    seg = np.cumsum(head) - 1
    # saturating segment sum in python ints (exact)
    totals = np.zeros(seg[-1] + 1, dtype=object)
    np.add.at(totals, seg, vals.astype(object))
    totals = np.minimum(totals, 0xFFFFFFFFFFFFFFFF).astype(np.uint64)
    ur, uc = rows[head], cols[head]
    keep = totals != 0
    return ur[keep].astype(np.int32), uc[keep].astype(np.int32), totals[keep], n


def from_edges(n: int, edges: Sequence[Tuple[int, int]], undirected: bool = False) -> Coo:
    """Each edge contributes count 1; duplicates sum (src/graph_csr.rs:133-147)."""
    rows, cols = [], []
    for r, c in edges:
        rows.append(r)
        cols.append(c)
        if undirected and r != c:
            rows.append(c)
            cols.append(r)
    vals = np.ones(len(rows), np.uint64)
    return _dedup_coo(n, rows, cols, vals)


def from_adjacency(pairs: Iterable[Tuple[str, str]]) -> Tuple[Coo, Dict[str, int]]:
    """Named edges; ids assigned in order of first appearance (src/graph_csr.rs:150-160)."""
    names: Dict[str, int] = {}
    edges = []
    for a, b in pairs:
        for x in (a, b):
            if x not in names:
                names[x] = len(names)
        edges.append((names[a], names[b]))
    return from_edges(len(names), edges), names


def random_graph(n: int, m: int, seed: int = 0) -> Coo:
    """Random directed multigraph, m edge draws, no self-loops
    (src/graph_csr.rs:163-174: c drawn in [0, n-1) then shifted past r)."""
    assert n >= 2
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, size=m)
    c = rng.integers(0, n - 1, size=m)
    c = np.where(c >= r, c + 1, c)
    return _dedup_coo(n, r, c, np.ones(m, np.uint64))


def lattice(dims: Sequence[int], torus: bool) -> Coo:
    """N-D Moore-neighborhood lattice; node index row-major
    (src/graph_csr.rs:177-218).  Each node connects to all <=3^N-1 neighbors
    differing by at most 1 per coordinate; torus wraps coordinates.

    Note: with torus=True and any dim <= 2, wrapped offsets can alias, which
    (like the reference, which inserts triplets that from_coo then sums)
    produces summed counts — matched here by _dedup_coo.
    """
    dims = list(dims)
    ndim = len(dims)
    total = int(np.prod(dims))
    # coordinates of every node: shape (total, ndim), row-major
    coords = np.stack(
        np.meshgrid(*[np.arange(d) for d in dims], indexing="ij"), axis=-1
    ).reshape(total, ndim)
    strides = np.ones(ndim, np.int64)
    for i in range(ndim - 2, -1, -1):
        strides[i] = strides[i + 1] * dims[i + 1]

    rows_parts: List[np.ndarray] = []
    cols_parts: List[np.ndarray] = []
    node_ids = np.arange(total, dtype=np.int64)
    # reference decodes off_idx in base 3 with dim 0 as the *least* significant
    # digit; neighbor enumeration order does not matter post-sort.
    for off_idx in range(3**ndim):
        tmp = off_idx
        deltas = []
        for _ in range(ndim):
            deltas.append(tmp % 3 - 1)
            tmp //= 3
        deltas = np.array(deltas, np.int64)
        if not deltas.any():
            continue
        nc = coords + deltas
        if torus:
            nc = nc % np.array(dims, np.int64)
            valid = np.ones(total, bool)
        else:
            valid = ((nc >= 0) & (nc < np.array(dims, np.int64))).all(axis=1)
        neighbor = (nc * strides).sum(axis=1)
        rows_parts.append(node_ids[valid])
        cols_parts.append(neighbor[valid])
    rows = np.concatenate(rows_parts) if rows_parts else np.zeros(0, np.int64)
    cols = np.concatenate(cols_parts) if cols_parts else np.zeros(0, np.int64)
    # reference inserts with value 1 into a set-like map (BTreeMap::insert
    # overwrites), so duplicates collapse to 1 for SparseCountMatrix::lattice,
    # but CsrMatrix::lattice goes through from_coo which SUMS duplicates.
    # We follow CsrMatrix (the primary format).
    return _dedup_coo(total, rows, cols, np.ones(len(rows), np.uint64))


def thin(coo: Coo, density: float, seed: int = 0) -> Coo:
    """Randomly keep a fraction of edges, preserving symmetry
    (src/graph_csr.rs:226-247): decide per ordered entry with r <= c; when an
    upper entry is kept, its transpose (if present) is kept too.

    Vectorized: one rng draw per upper-or-diagonal entry (in the input's
    entry order), transpose membership via a sorted key join."""
    rows, cols, vals, n = coo
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.uint64)
    rng = np.random.default_rng(seed)
    upper = rows <= cols
    keep_up = np.zeros(len(rows), bool)
    keep_up[upper] = rng.random(int(upper.sum())) < density
    # kept upper entries
    ur, uc, uv = rows[keep_up], cols[keep_up], vals[keep_up]
    # transposes of kept strict-upper entries that exist in the input:
    # join on (row, col) keys
    strict = ur != uc
    want_key = uc[strict] * n + ur[strict]  # transposed coordinates
    key_all = rows * n + cols
    order = np.argsort(key_all, kind="stable")
    key_sorted = key_all[order]
    pos = np.searchsorted(key_sorted, want_key)
    pos_c = np.clip(pos, 0, len(key_sorted) - 1)
    found = (len(key_sorted) > 0) & (key_sorted[pos_c] == want_key)
    src_idx = order[pos_c[found]]
    out_r = np.concatenate([ur, rows[src_idx]])
    out_c = np.concatenate([uc, cols[src_idx]])
    out_v = np.concatenate([uv, vals[src_idx]])
    return _dedup_coo(n, out_r, out_c, out_v)


def identity(n: int) -> Coo:
    idx = np.arange(n, dtype=np.int32)
    return idx, idx.copy(), np.ones(n, np.uint64), n
