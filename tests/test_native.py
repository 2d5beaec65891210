"""Native C++ oracle tests: builds liboracle.so and checks it against both
the Python exact oracle (small) and the device ESC kernel (medium)."""

import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, spadd, spgemm_auto
from sparsetpu.graphs import generate
from sparsetpu.utils import oracle as pyoracle
from sparsetpu import native


def _host_csr(coo):
    rows, cols, vals, n = coo
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    row_ptr = np.searchsorted(rows, np.arange(n + 1)).astype(np.int64)
    return native.as_host_csr(row_ptr, cols, vals), n


def test_native_builds():
    assert native.lib() is not None


def test_spgemm_matches_python_oracle():
    coo = generate.random_graph(40, 160, seed=3)
    a, n = _host_csr(coo)
    crp, cc, cv = native.spgemm(a, a, n)
    want = pyoracle.matmul(pyoracle.coo_to_dict(coo), pyoracle.coo_to_dict(coo))
    got = {}
    rows = np.repeat(np.arange(n), np.diff(crp))
    for r, c, v in zip(rows, cc, cv):
        got[(int(r), int(c))] = int(v)
    assert got == want


def test_spgemm_saturation():
    big = (1 << 63) + 7
    coo = (np.array([0, 0]), np.array([0, 1]), np.array([big, 5], np.uint64), 2)
    b = (np.array([0, 1]), np.array([0, 0]), np.array([3, 9], np.uint64), 2)
    a_h, n = _host_csr(coo)
    b_h, _ = _host_csr(b)
    _, cc, cv = native.spgemm(a_h, b_h, n)
    assert cv[0] == 0xFFFFFFFFFFFFFFFF


def test_matches_device_esc_medium():
    coo = generate.lattice([6, 6, 6], torus=True)
    coo = generate.thin(coo, 0.3, seed=2)
    a_h, n = _host_csr(coo)
    crp, cc, cv = native.spgemm(a_h, a_h, n, n_threads=2)

    rows_, cols_, vals_, _ = coo
    a_dev = SparseCSR.from_coo(rows_, cols_, vals_, n, sr=U64)
    c_dev = spgemm_auto(a_dev, a_dev)
    drp, dcc, dcv = c_dev.to_numpy()
    np.testing.assert_array_equal(crp, drp.astype(np.int64))
    np.testing.assert_array_equal(cc, dcc)
    np.testing.assert_array_equal(cv, dcv)


def test_spadd_matches_python():
    ca = generate.random_graph(25, 60, seed=5)
    cb = generate.random_graph(25, 50, seed=6)
    a_h, n = _host_csr(ca)
    b_h, _ = _host_csr(cb)
    crp, cc, cv = native.spadd(a_h, b_h, n)
    want = pyoracle.add(pyoracle.coo_to_dict(ca), pyoracle.coo_to_dict(cb))
    rows = np.repeat(np.arange(n), np.diff(crp))
    got = {(int(r), int(c)): int(v) for r, c, v in zip(rows, cc, cv)}
    assert got == want
