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


def test_two_process_localhost_smoke():
    """The true multi-process path: 2 localhost CPU processes through
    jax.distributed.initialize (via multihost.initialize env wiring),
    pod_mesh over 2x2 virtual devices, row-sharded ESC SpGEMM with every
    local shard checked bit-exact against the host oracle (BASELINE
    config 5's '>= 2 hosts' analog without a pod)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = __file__.rsplit("/tests/", 1)[0] + "/scripts/multihost_smoke.py"
    env = {k: v for k, v in __import__("os").environ.items()
           if not k.startswith(("SPARSETPU_", "XLA_", "JAX_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out


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
