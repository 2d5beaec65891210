"""Library-baseline comparator tests: jax.experimental.sparse BCOO as the
third independent SpGEMM implementation (reference role: sprs,
src/graph_sprs.rs:267-273) cross-validated against the ESC kernel and the
exact Python oracle."""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64
from sparsetpu.graphs import generate
from sparsetpu.ops.spgemm import spgemm_auto
from sparsetpu.utils import bcoo as libb
from sparsetpu.utils import oracle as pyoracle


def _csr(coo):
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=U64)


def _as_dict(c: SparseCSR):
    row_ptr, col_idx, vals = c.to_numpy()
    rows = np.repeat(np.arange(c.n_rows), np.diff(row_ptr))
    return {(int(r), int(cc)): int(v) for r, cc, v in zip(rows, col_idx, vals)}


def test_bcoo_roundtrip():
    a = _csr(generate.random_graph(30, 120, seed=0))
    back = libb.bcoo_to_csr(libb.csr_to_bcoo(a))
    assert _as_dict(back) == _as_dict(a)


def test_bcoo_matches_esc_and_oracle():
    coo = generate.random_graph(60, 240, seed=1)
    a = _csr(coo)
    via_esc = spgemm_auto(a, a)
    via_lib = libb.spgemm_bcoo(a, a)
    want = pyoracle.matmul(pyoracle.coo_to_dict(coo), pyoracle.coo_to_dict(coo))
    assert _as_dict(via_lib) == want
    assert _as_dict(via_esc) == want


def test_bcoo_matches_esc_torus_square():
    coo = generate.lattice([4, 4, 4], torus=True)
    a = _csr(coo)
    assert _as_dict(libb.spgemm_bcoo(a, a)) == _as_dict(spgemm_auto(a, a))


def test_bcoo_rectangular():
    rng = np.random.default_rng(3)
    ra, ca = rng.integers(0, 10, 30), rng.integers(0, 20, 30)
    rb, cb = rng.integers(0, 20, 40), rng.integers(0, 15, 40)
    a = SparseCSR.from_coo(ra, ca, np.ones(30, np.uint64), 10, 20, sr=U64)
    b = SparseCSR.from_coo(rb, cb, np.ones(40, np.uint64), 20, 15, sr=U64)
    assert _as_dict(libb.spgemm_bcoo(a, b)) == _as_dict(spgemm_auto(a, b))
