"""Multi-host wiring (dist/multihost.py): the single-process parts run on
the virtual mesh; true multi-process behavior is gated on a real pod
(pytest -m long on multi-host hardware)."""

import jax
import numpy as np
import pytest

from sparsetpu import SparseCSR, U64, spgemm_auto
from sparsetpu.dist import multihost, panels, shard as dist
from sparsetpu.graphs import generate


def test_initialize_single_process_noop():
    multihost.initialize()  # no coordinator configured -> no-op
    assert jax.process_count() == 1


def test_pod_mesh_orders_host_major():
    mesh = multihost.pod_mesh()
    devs = list(mesh.devices.flat)
    keys = [(d.process_index, getattr(d, "id", 0)) for d in devs]
    assert keys == sorted(keys)
    assert len(devs) == len(jax.devices())


def test_host_row_block_covers_rows():
    start, stop = multihost.host_row_block(1000)
    assert 0 <= start <= stop <= 1000
    # single process owns everything
    assert (start, stop) == (0, 1000)


def test_panel_ring_on_pod_mesh():
    """The ring-exchange SpGEMM must run unchanged on the pod mesh (here:
    8 virtual devices of one host) — the mesh-generic contract that makes
    the multi-host path the same code."""
    mesh = multihost.pod_mesh()
    nd = len(list(mesh.devices.flat))
    coo = generate.lattice([4, 4, 4], torus=True)
    coo = generate.thin(coo, 0.3, seed=1)
    rows, cols, vals, n = coo
    a = SparseCSR.from_coo(rows, cols, vals, n, sr=U64)
    want = spgemm_auto(a, a)
    s = dist.shard(a, nd, mesh=mesh)
    sb = dist.shard(a, nd, mesh=mesh)
    c = panels.spgemm_panels_auto(s, sb, mesh=mesh)
    got = dist.unshard(c)
    np.testing.assert_array_equal(got.to_dense_numpy(), want.to_dense_numpy())
