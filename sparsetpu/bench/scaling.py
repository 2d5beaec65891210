"""Scaling-efficiency measurement for the sharded A^k chain.

BASELINE.json's north star reports nnz/s at 1 chip / 1 host / N hosts with
>= 80% host->pod scaling efficiency.  With one physical chip available,
this module measures *functional* scaling on the virtual CPU mesh (the
reference's matmul_par == matmul discipline) and per-device work balance —
the quantity that actually determines pod efficiency for row-partitioned
SpGEMM, since the numeric phase is communication-free with a replicated B
and ppermute-pipelined with panel exchange.

Outputs a CSV: devices, seconds, nnz_per_s, efficiency, max/mean work
imbalance (the symbolic per-shard flop skew).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import jax
import numpy as np

from ..csr import SparseCSR
from ..dist import shard as dist
from ..ops.spgemm import spgemm_auto


@dataclass
class ScalePoint:
    devices: int
    seconds: float
    nnz_per_s: float
    efficiency: float      # vs 1-device time * devices
    work_imbalance: float  # max/mean per-shard symbolic flops


def measure_scaling(a: SparseCSR, device_counts=(1, 2, 4, 8), steps: int = 2,
                    iters: int = 2, verbose: bool = True) -> List[ScalePoint]:
    """Time `steps` sharded chain steps at each device count.

    Efficiency is t(1)/ (t(n) * n) normalized so perfect scaling = 1.0 when
    each device does 1/n of the work in the same time t(1)/n... on a single
    physical host the virtual devices share cores, so wall-clock efficiency
    is only meaningful on real multi-chip hardware; work_imbalance is the
    hardware-independent component."""
    results: List[ScalePoint] = []
    t1 = None
    for nd in device_counts:
        if nd > len(jax.devices()):
            break
        mesh = dist.default_mesh(nd)
        s = dist.shard(a, nd, mesh=mesh)
        flops = np.asarray(
            jax.device_get(dist.symbolic_flops_sharded(s, a, mesh=mesh))
        ).astype(np.float64)
        imbalance = float(flops.max() / max(flops.mean(), 1.0))

        def run_chain():
            cur = s
            nnz_total = 0
            for _ in range(steps):
                f = np.asarray(jax.device_get(
                    dist.symbolic_flops_sharded(cur, a, mesh=mesh)
                ))
                c = 1 << (max(int(f.max()), 1) - 1).bit_length()
                cur = dist.spgemm_sharded(cur, a, expand_cap=c, mesh=mesh)
                jax.block_until_ready(cur.nnz)
            return int(cur.total_nnz())

        nnz = run_chain()  # warmup/compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run_chain()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        if t1 is None:
            t1 = dt
        # parallel efficiency t(1) / (t(n) * n): 1.0 = perfect scaling.
        # On the shared-core virtual mesh all n devices time-slice one CPU,
        # so this reads ~1/n there; it is only meaningful on real multi-chip
        # hardware (work_imbalance is the hardware-independent column).
        eff = t1 / (dt * nd)
        pt = ScalePoint(
            devices=nd, seconds=dt, nnz_per_s=nnz / dt,
            efficiency=eff, work_imbalance=imbalance,
        )
        results.append(pt)
        if verbose:
            print(
                f"devices={nd}: {dt*1e3:.1f}ms nnz/s={pt.nnz_per_s/1e6:.2f}M "
                f"eff={eff:.2f} imbalance={imbalance:.3f}",
                flush=True,
            )
    return results


def scaling_csv(results: List[ScalePoint]) -> str:
    lines = ["devices,seconds,nnz_per_s,efficiency,work_imbalance"]
    for r in results:
        lines.append(
            f"{r.devices},{r.seconds:.6f},{r.nnz_per_s:.1f},"
            f"{r.efficiency:.4f},{r.work_imbalance:.4f}"
        )
    return "\n".join(lines) + "\n"
