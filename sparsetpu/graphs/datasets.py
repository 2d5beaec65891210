"""Real-graph loading + skewed-degree synthetic generators.

The reference benches real graphs from ``gen-graphs/*.edges`` files fetched
externally with torch_geometric/ogb (src/graph_csr.rs:1209-1224,
requirements.txt).  This environment has no network egress, so:

  - :func:`load_edges` reads the same whitespace ``src dst`` edge-file
    format when files are present;
  - :func:`power_law` generates Barabási–Albert-style preferential-
    attachment graphs as the skewed-degree stress workload (BASELINE
    config 4 — MAGNUS-categorization stress), with degree skew comparable
    to citation graphs.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .generate import Coo, _dedup_coo


def load_edges(path: str, undirected: bool = False) -> Coo:
    """Read a ``src dst`` edge list file (one edge per line, '#' comments)."""
    src, dst = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            a, b = line.split()[:2]
            src.append(int(a))
            dst.append(int(b))
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    if undirected:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    return _dedup_coo(n, src, dst, np.ones(len(src), np.uint64))


def power_law(n: int, m_per_node: int = 3, seed: int = 0) -> Coo:
    """Preferential-attachment (Barabási–Albert) multigraph, undirected.

    Degree distribution ~ k^-3: a few huge-degree hubs + a long tail, the
    row-cost skew that stresses per-row kernel categorization.
    Vectorized approximate BA: each new node attaches to m endpoints
    sampled from the current edge-endpoint pool (preferential by degree).
    """
    assert n > m_per_node >= 1
    rng = np.random.default_rng(seed)
    # seed clique endpoints
    pool = [i for i in range(m_per_node + 1) for _ in range(m_per_node)]
    src_list = []
    dst_list = []
    for v in range(m_per_node + 1, n):
        targets = rng.choice(len(pool), size=m_per_node)
        ts = {pool[t] for t in targets}
        for t in ts:
            src_list.append(v)
            dst_list.append(t)
            pool.append(t)
            pool.append(v)
    src = np.asarray(src_list, np.int64)
    dst = np.asarray(dst_list, np.int64)
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    return _dedup_coo(n, rows, cols, np.ones(len(rows), np.uint64))


def degree_stats(coo: Coo) -> Tuple[int, float]:
    rows, _, _, n = coo
    deg = np.bincount(rows, minlength=n)
    return int(deg.max()), float(deg.mean())
