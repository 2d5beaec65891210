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
import jax.numpy as jnp
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


@dataclass
class HostCSR:
    """Pure-numpy CSR build (no jax) — produced by build_torus_host so graph
    generation AND the native-oracle verification can run in a host thread
    while the main thread waits on the TPU pool claim (the attach can queue
    for minutes; see bench.py)."""
    row_ptr: np.ndarray
    col_idx: np.ndarray
    limbs: list
    nnz: int
    n: int
    sr: Semiring

    def vals_u64(self) -> np.ndarray:
        lo = self.limbs[0][: self.nnz].astype(np.uint64)
        if len(self.limbs) > 1:
            lo = lo | (self.limbs[1][: self.nnz].astype(np.uint64) << np.uint64(32))
        return lo

    def to_device(self) -> SparseCSR:
        return SparseCSR.from_host_arrays(
            self.row_ptr, self.col_idx, self.limbs, self.nnz,
            self.n, self.n, self.sr,
        )


def build_torus_host(dims: Sequence[int] = (30, 30, 30),
                     density: float = 3.0 / 26.0, seed: int = 42,
                     sr: Semiring = U64) -> HostCSR:
    coo = generate.lattice(list(dims), torus=True)
    if density < 1.0:
        coo = generate.thin(coo, density, seed=seed)
    rows, cols, vals, n = coo
    row_ptr, col_idx, limbs, nnz = SparseCSR.host_csr_arrays(
        rows, cols, vals, n, n, sr, capacity=_pow2(len(rows))
    )
    return HostCSR(row_ptr, col_idx, limbs, nnz, n, sr)


def build_torus(dims: Sequence[int] = (30, 30, 30), density: float = 3.0 / 26.0,
                seed: int = 42, sr: Semiring = U64) -> SparseCSR:
    # host-side build: graph generation is host-side anyway, and the device
    # COO sort round-trip costs minutes over a remote-compile tunnel
    return build_torus_host(dims, density, seed, sr).to_device()


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


def run_chain_band(
    a: SparseCSR,
    half_width: int,
    block: int = 125,
    max_step: int = 7,
    iters: int = 3,
    verbose: bool = True,
) -> List[ChainStep]:
    """Band-kernel chain: C_k = C_{k-1} x A entirely as block-band MXU
    matmuls (the categorized fast path; torus matrices are cyclic-banded so
    there are no outliers).  Values are guarded < 2^24; the per-step limb
    counts come from the running max value."""
    from ..kernels import bandmm

    band_a, outliers = bandmm.csr_band_split(
        a, half_width=half_width, block=block, cyclic=True
    )
    assert int(outliers.nnz) == 0, "torus must be fully cyclic-banded"
    a_limbs = bandmm.limbs_for_max(float(jax.device_get(band_a.max_value())))

    results: List[ChainStep] = []
    prev = band_a
    for step in range(2, max_step + 1):
        pmax = float(jax.device_get(prev.max_value()))
        p_limbs = bandmm.limbs_for_max(pmax)
        run = lambda: bandmm.band_matmul(prev, band_a, p_limbs=p_limbs,
                                         a_limbs=a_limbs)
        c = run()
        jax.block_until_ready(c.data)
        cmax = float(jax.device_get(c.max_value()))
        if cmax >= float(1 << 24) - 8:
            raise OverflowError("band chain exceeded f32 exact range")
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = run()
            jax.block_until_ready(out.data)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        nnz = int(jax.device_get(c.nnz()))
        rec = ChainStep(
            step=step, nnz=nnz, flops=0, seconds=dt,
            nnz_per_s=nnz / dt, gflops=0.0,
        )
        results.append(rec)
        if verbose:
            print(
                f"A^{step} [band,{p_limbs}x{a_limbs} limbs]: nnz={nnz} "
                f"time={dt*1e3:.2f}ms nnz/s={rec.nnz_per_s/1e6:.1f}M "
                f"max={cmax:.0f}",
                flush=True,
            )
        prev = c
    return results


def run_chain_dense(
    a: SparseCSR,
    max_step: int = 7,
    iters: int = 3,
    n_chunks: int = 8,
    verbose: bool = True,
) -> List[ChainStep]:
    """Dense-accumulator chain: the product lives as a dense f32 matrix
    and each step is the gather/segment-sum SpMM (ops/spmm.py) — the right
    category once the product band densifies.  One compile for the whole
    chain (step shape is constant)."""
    from ..ops.spmm import spmm_dense, prepare_spmm_operand

    cols, vals, lrow, rpc = prepare_spmm_operand(a, n_chunks=n_chunks)
    p = tuple_to_f32_dense(a)
    results: List[ChainStep] = []
    for step in range(2, max_step + 1):
        c = spmm_dense(cols, vals, lrow, p, rows_per_chunk=rpc)
        jax.block_until_ready(c)
        cmax = float(jax.device_get(jnp.max(c)))
        if cmax >= float(1 << 24) - 8:
            raise OverflowError("dense chain exceeded f32 exact range")
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = spmm_dense(cols, vals, lrow, p, rows_per_chunk=rpc)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        nnz = int(jax.device_get(jnp.count_nonzero(c)))
        rec = ChainStep(step=step, nnz=nnz, flops=0, seconds=dt,
                        nnz_per_s=nnz / dt, gflops=0.0)
        results.append(rec)
        if verbose:
            print(
                f"A^{step} [dense-acc]: nnz={nnz} time={dt*1e3:.2f}ms "
                f"nnz/s={rec.nnz_per_s/1e6:.1f}M max={cmax:.0f}",
                flush=True,
            )
        p = c
    return results


def run_chain_pallas(
    a: SparseCSR,
    max_step: int = 7,
    iters: int = 3,
    rows_per_tile: int = 8,
    verbose: bool = True,
    per_step: bool = True,
    reps: int = 4,
    keep_final: Optional[dict] = None,
    native_stats: Optional[list] = None,
    kernel: str = "vpu",
    nbuf: int = 8,
) -> List[ChainStep]:
    """Pallas dense-accumulator chain (kernels/spmm_pallas.py): P rows are
    streamed HBM->VMEM per A-entry via a scalar-driven DMA ring — the
    speed-of-light formulation of the dense-acc category on TPU.

    The whole A^2..A^max chain runs as ONE jitted program (single dispatch):
    each host sync through the remote-execution tunnel costs ~20-50 ms,
    several times the 30^3 kernel step itself.  Per-step stats (nnz, max,
    exact expansion flops) come from one untimed stats pass; every step's
    time is measured as a TRUE differential t(chain of s) - t(chain of s-1)
    — the reference reports genuine per-k times (README.md:39-46) and so
    does this.  Timing inputs get a per-iteration bump so neither the
    runtime's result cache nor XLA loop-invariant motion can skip real
    work.  ``reps`` whole-chain repetitions are fused into each timed
    program so the adjacent-prefix differential is reps x one step — at
    small (--quick) scales a single step is below the host-sync noise
    floor and a 1-rep differential reads ~0.  ``keep_final``: pass a dict
    to receive the final chain product under key "p" — lets verification
    reuse it instead of compiling another k-step program.

    ``native_stats``: per-step (step, nnz, max, flops) from the host C++
    oracle.  When given, the device-side stats pass is SKIPPED — remote
    compiles through the tunnel cost minutes per program (the round-2
    driver bench died on them), and the oracle already has exact per-step
    stats; the final product is still value-verified on device.  The whole
    timing path is then ONE compiled program: ``steps``/``reps`` are traced
    loop bounds, so every prefix length reuses the same executable."""
    from functools import partial as _partial

    from ..kernels import spmm_pallas as sp

    if kernel == "mxu":
        cnt_m, cols_m, m_mat, meta = sp.tile_sparse_operand_mxu(
            a, rows_per_tile=rows_per_tile
        )
    else:
        cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
            a, rows_per_tile=rows_per_tile, nbuf=nbuf
        )
    # densify + plane-layout ON DEVICE: a host-built (n, n) f32 P is a
    # multi-GB device_put through the remote tunnel (measured: tens of
    # minutes at 30^3) — the CSR operand is already resident, so scatter it
    p0 = jax.jit(lambda m: sp.to_row_planes(tuple_to_f32_dense(m)))(a)
    jax.block_until_ready(p0)
    k = max_step - 1  # number of products in the chain

    # A's per-row nnz laid out like a P row plane, for exact per-step flop
    # counts: flops(P x A) = sum_k colnnz(P)[k] * row_nnz_A[k]
    s_planes = meta["s_planes"]
    rnz_np = np.zeros((s_planes * 128,), np.float32)
    rp_host = np.asarray(jax.device_get(a.row_ptr))
    rnz_np[: a.n_rows] = np.diff(rp_host)
    rnz_planes = jnp.asarray(rnz_np.reshape(s_planes, 128))

    def _step(p):
        if kernel == "mxu":
            return sp.spmm_pallas_mxu(cnt_m, cols_m, m_mat, p,
                                      rows_per_tile=rows_per_tile)
        return sp.spmm_pallas(cnt, cols, lrow, vals, p,
                              rows_per_tile=rows_per_tile, nbuf=nbuf)

    @_partial(jax.jit, static_argnames=("steps",))
    def stats_chain(p, steps: int):
        maxes = jnp.zeros((steps,), jnp.float32)
        nnzs = jnp.zeros((steps,), jnp.int32)
        flops = jnp.zeros((steps,), jnp.float32)

        def body(i, carry):
            p, maxes, nnzs, flops = carry
            colnnz = jnp.sum((p != 0).astype(jnp.float32), axis=0)  # (S,128)
            flops = flops.at[i].set(jnp.sum(colnnz * rnz_planes))
            c = _step(p)
            maxes = maxes.at[i].set(jnp.max(c))
            nnzs = nnzs.at[i].set(jnp.count_nonzero(c).astype(jnp.int32))
            return (c, maxes, nnzs, flops)

        p, maxes, nnzs, flops = jax.lax.fori_loop(
            0, steps, body, (p, maxes, nnzs, flops)
        )
        return p, maxes, nnzs, flops

    @jax.jit
    def timed_chain(p0, bump, steps, reps):
        # `bump` perturbs one input element so (a) the remote-execution
        # runtime cannot serve a cached result for repeated timing calls and
        # (b) XLA cannot hoist any step out of the loop — every step's input
        # is data-dependent on the previous product.  The whole chain runs
        # `reps` times (each rep distinctly perturbed, results chained into
        # the accumulator) so the prefix differential carries reps steps.
        # `steps` and `reps` are TRACED loop bounds: one executable serves
        # every (prefix length, rep count) — the driver path compiles ONE
        # program instead of one per prefix.  A (bump=0, reps=1) call leaves
        # p0 bit-exactly unperturbed, so its returned product doubles as the
        # verification product.
        def rep(r, carry):
            acc, _ = carry
            p = p0.at[0, 0, 0].add(bump + jnp.float32(r) + acc * 1e-30)
            p = jax.lax.fori_loop(0, steps, lambda i, q: _step(q), p)
            return acc + p[0, 0, 0], p

        return jax.lax.fori_loop(0, reps, rep, (jnp.float32(0.0), p0))

    if native_stats is not None:
        # oracle-driven stats: no device stats program at all
        assert len(native_stats) == k, (len(native_stats), k)
        nnzs = np.array([s[1] for s in native_stats], np.int64)
        maxes = np.array([s[2] for s in native_stats], np.float64)
        flops = np.array([s[3] for s in native_stats], np.int64)
        if float(maxes.max()) >= float(1 << 24) - 8:
            raise OverflowError("pallas chain would exceed f32 exact range")
        # compile + warm the single timing executable; the unperturbed
        # 1-rep full-chain call is also the verification product
        _, p_final = timed_chain(p0, 0.0, k, 1)
        jax.block_until_ready(p_final)
    else:
        p_final, maxes, nnzs, flops = stats_chain(p0, k)
        maxes, nnzs, flops = map(np.asarray,
                                 map(jax.device_get, (maxes, nnzs, flops)))
        if float(maxes.max()) >= float(1 << 24) - 8:
            raise OverflowError("pallas chain exceeded f32 exact range")
        acc, _ = timed_chain(p0, 0.0, k, reps)  # compile + warm
        jax.block_until_ready(acc)
    if keep_final is not None:
        keep_final["p"] = p_final

    def _time(steps):
        acc, _ = timed_chain(p0, 0.0, steps, reps)  # warm (cached program)
        jax.block_until_ready(acc)
        best = float("inf")
        for it in range(iters):
            t0 = time.perf_counter()
            acc, _ = timed_chain(p0, float(it + 1), steps, reps)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        return best / reps

    # per-step differentials: time chains of length s, subtract adjacent.
    # the 0-step chain measures the fixed dispatch+sync floor (~30 ms on
    # the tunnel rig), so the A^2 differential doesn't absorb it.  With
    # per_step=False only chains {k-1, k} are compiled+timed — the A^max
    # differential the headline needs — because each prefix length is its
    # own XLA program and a cold compile through the remote tunnel costs
    # 60-300 s (the round-2 driver bench died on exactly this).
    steps_to_time = list(range(k + 1)) if per_step else [k - 1, k]
    prefix = {s: _time(s) for s in steps_to_time}

    results: List[ChainStep] = []
    for idx in range(k):
        step = idx + 2
        timed = (idx in prefix) and (idx + 1 in prefix)
        dt = (max(prefix[idx + 1] - prefix[idx], 1e-9) if timed
              else float("nan"))
        nnz = int(nnzs[idx])
        fl = int(flops[idx])
        rec = ChainStep(step=step, nnz=nnz, flops=fl, seconds=dt,
                        nnz_per_s=nnz / dt if timed else float("nan"),
                        gflops=2.0 * fl / dt / 1e9 if timed else float("nan"))
        results.append(rec)
        if verbose:
            tstr = (f"time={dt*1e3:.2f}ms nnz/s={rec.nnz_per_s/1e6:.1f}M "
                    f"gflops={rec.gflops:.2f}" if timed else "untimed")
            print(
                f"A^{step} [pallas]: nnz={nnz} flops={fl} {tstr} "
                f"max={maxes[idx]:.0f}",
                flush=True,
            )
    return results


def run_chain_rowcat(
    a: SparseCSR,
    max_step: int = 7,
    iters: int = 3,
    verbose: bool = True,
) -> List[ChainStep]:
    """Row-categorized chain: C_k = C_{k-1} x A through ops/rowcat.py —
    the general sparse-output path (product stays CSR; the right category
    kernel per row each step)."""
    from ..ops.rowcat import spgemm_rowcat
    from ..ops.spgemm import symbolic_flops_exact

    results: List[ChainStep] = []
    prev = a
    for step in range(2, max_step + 1):
        flops = symbolic_flops_exact(prev, a)
        c = spgemm_rowcat(prev, a).check()
        jax.block_until_ready(c.nnz)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = spgemm_rowcat(prev, a)
            jax.block_until_ready(out.nnz)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        nnz = int(c.nnz)
        rec = ChainStep(
            step=step, nnz=nnz, flops=flops, seconds=dt,
            nnz_per_s=nnz / dt, gflops=2.0 * flops / dt / 1e9,
        )
        results.append(rec)
        if verbose:
            print(
                f"A^{step} [rowcat]: nnz={nnz} flops={flops} "
                f"time={dt*1e3:.2f}ms nnz/s={rec.nnz_per_s/1e6:.1f}M",
                flush=True,
            )
        prev = c
    return results


def run_chain_escb(
    a: SparseCSR,
    max_step: int = 7,
    iters: int = 3,
    verbose: bool = True,
) -> List[ChainStep]:
    """Blocked-ESC chain: C_k = C_{k-1} x A through ops/escb.py — the
    compile-bounded general sparse-output path (row-packed batched sort;
    see ops/escb.py).  Per-call wall time including the host plan pass
    (one n-sized fetch + bin packing), matching how a user would run it."""
    from ..ops.escb import spgemm_blocked

    results: List[ChainStep] = []
    prev = a
    for step in range(2, max_step + 1):
        c = spgemm_blocked(prev, a).check()
        jax.block_until_ready(c.nnz)
        flops = int(np.int64(0))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = spgemm_blocked(prev, a)
            jax.block_until_ready(out.nnz)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        from ..ops.spgemm import symbolic_flops_exact

        flops = symbolic_flops_exact(prev, a)
        nnz = int(c.nnz)
        rec = ChainStep(
            step=step, nnz=nnz, flops=flops, seconds=dt,
            nnz_per_s=nnz / dt, gflops=2.0 * flops / dt / 1e9,
        )
        results.append(rec)
        if verbose:
            print(
                f"A^{step} [escb]: nnz={nnz} flops={flops} "
                f"time={dt*1e3:.2f}ms nnz/s={rec.nnz_per_s/1e6:.1f}M",
                flush=True,
            )
        prev = c
    return results


def native_chain_stats_host(row_ptr, col_idx, vals, n: int, max_step: int = 7):
    """A^2..A^max on the native C++ oracle from host numpy CSR arrays —
    no jax involvement, so it can run concurrently with the TPU attach."""
    from .. import native

    base = native.as_host_csr(
        np.asarray(row_ptr, np.int64), np.asarray(col_idx, np.int32),
        np.asarray(vals, np.uint64),
    )
    rnz_a = np.diff(np.asarray(row_ptr, np.int64))
    stats = []  # (step, nnz, max_value, expansion_flops)
    prev = base
    for step in range(2, max_step + 1):
        # flops of the multiply producing A^step: every entry (i,k) of the
        # current power expands to row_nnz_A[k] partial products.  col_idx
        # may be capacity-padded (sentinel cols) — gather valid entries only
        p_rp, p_cc = prev[0], prev[1]
        flops = int(rnz_a[np.asarray(p_cc[: p_rp[-1]], np.int64)].sum())
        prev = native.spgemm(prev, base, n)
        crp, cc, cv = prev
        stats.append((step, int(crp[-1]),
                      int(cv.max()) if len(cv) else 0, flops))
    return stats, prev


def native_chain_stats(a: SparseCSR, max_step: int = 7):
    """Run the A^2..A^max chain on the native C++ oracle (exact u64
    saturating semiring) and return per-step stats plus the final CSR.

    The reference's discipline is agreement-then-time
    (src/graph_magnus.rs:751-753); this provides the agreement half for the
    full measured scale (30^3, 11.7M nnz — seconds of host time), not just
    the small CPU test graphs.
    """
    row_ptr, col_idx, vals = a.to_numpy()
    return native_chain_stats_host(row_ptr, col_idx, vals, a.n_rows, max_step)


def chain_final_pallas(a: SparseCSR, max_step: int = 7,
                       rows_per_tile: int = 8):
    """One un-timed pallas chain pass; returns the final product P (device,
    row-plane layout) for agreement checks against the native oracle."""
    from functools import partial as _partial

    from ..kernels import spmm_pallas as sp

    cnt, cols, lrow, vals, _ = sp.tile_sparse_operand(
        a, rows_per_tile=rows_per_tile
    )
    p0 = sp.to_row_planes(host_f32_dense(a))
    k = max_step - 1

    @_partial(jax.jit, static_argnames=("steps",))
    def chain(p, steps: int):
        return jax.lax.fori_loop(
            0, steps,
            lambda i, q: sp.spmm_pallas(cnt, cols, lrow, vals, q,
                                        rows_per_tile=rows_per_tile),
            p,
        )

    return chain(p0, k)


def verify_final_values(a: SparseCSR, native_final, max_step: int = 7,
                        sample_rows: int = 128, rows_per_tile: int = 8,
                        p=None):
    """Exact value check of the pallas chain's final product against a
    precomputed native-oracle CSR: global nnz + max, plus element-exact
    agreement on ``sample_rows`` leading rows.  ``p``: a precomputed final
    product (e.g. run_chain_pallas keep_final) avoids compiling another
    chain program."""
    crp, cc, cv = native_final
    if p is None:
        p = chain_final_pallas(a, max_step, rows_per_tile=rows_per_tile)
    dev_nnz = int(jax.device_get(jnp.count_nonzero(p)))
    dev_max = float(jax.device_get(jnp.max(p)))
    want_nnz = int(crp[-1])
    want_max = int(cv.max()) if len(cv) else 0
    assert dev_nnz == want_nnz, (dev_nnz, want_nnz)
    assert int(dev_max) == want_max, (dev_max, want_max)
    m = min(sample_rows, a.n_rows)
    got = np.asarray(jax.device_get(p[:m])).reshape(m, -1)[:, : a.n_cols]
    want = np.zeros((m, a.n_cols), np.float64)
    for r in range(m):
        s, e = int(crp[r]), int(crp[r + 1])
        want[r, cc[s:e]] = cv[s:e].astype(np.float64)
    assert np.array_equal(got.astype(np.float64), want), (
        "pallas chain values disagree with native oracle in leading rows"
    )


def verify_chain_against_native(a: SparseCSR, max_step: int = 7,
                                sample_rows: int = 128) -> list:
    """Assert the pallas chain agrees with the native oracle at full scale:
    per-step nnz handled by the caller via the returned stats; here the
    final step gets nnz + max + an exact value check on ``sample_rows``
    leading rows.  Returns the native per-step stats for caller use."""
    stats, final = native_chain_stats(a, max_step)
    verify_final_values(a, final, max_step, sample_rows)
    return stats


def host_f32_dense(a: SparseCSR) -> np.ndarray:
    """SparseCSR (small integer values) -> dense f32 on host (no device
    round-trip; for chain P initialization)."""
    row_ptr, col_idx, vals = a.to_numpy()
    n = a.n_rows
    out = np.zeros((n, a.n_cols), np.float32)
    rows = np.repeat(np.arange(n), np.diff(row_ptr))
    out[rows, col_idx] = vals.astype(np.float32)
    return out


def tuple_to_f32_dense(a: SparseCSR):
    """SparseCSR (small integer values) -> dense f32 matrix on device."""
    dense_limbs = a.to_dense()
    f = dense_limbs[0].astype(jnp.float32)
    if len(dense_limbs) > 1:
        f = f + dense_limbs[1].astype(jnp.float32) * float(1 << 32)
    return f


def chain_csv(results: List[ChainStep]) -> str:
    import math

    lines = ["step,nnz,flops,seconds,nnz_per_s,gflops"]
    for r in results:
        if math.isnan(r.seconds):
            continue  # untimed step (per_step=False fast path)
        lines.append(
            f"{r.step},{r.nnz},{r.flops},{r.seconds:.6f},{r.nnz_per_s:.1f},{r.gflops:.3f}"
        )
    return "\n".join(lines) + "\n"


def run_chain_mixed(
    a: SparseCSR,
    native_stats: list,
    max_step: int = 7,
    switch_step: int = 5,
    iters: int = 3,
    reps: int = 4,
    rows_per_tile: int = 24,
    nbuf: int = 8,
    slab_reps: int = 8,
    verbose: bool = True,
) -> Tuple[List[ChainStep], float]:
    """Mixed-kernel chain: slab ESC for the sparse early steps, the Pallas
    DMA dense-accumulator for the dense late steps (VERDICT r5 ask #4 —
    beat the CPU on the WHOLE chain, not just A^7).

    Steps 2..switch_step-1 run the slab kernel with fused-rep numeric
    timing (fixed plan, spgemm_bench protocol); then the sparse power
    densifies into row planes (TIMED — the transition is a real cost, and
    the reported total includes it) and steps switch_step..max_step run
    the DMA kernel with prefix-differential timing.

    Returns (per-step records, total_seconds) where total_seconds =
    sum(early numeric steps) + densify + sum(late differentials): the
    number to put against the reference CSR-par chain total (~102 ms,
    BASELINE.md).
    """
    import dataclasses
    from functools import partial as _partial

    from ..kernels import spmm_pallas as sp
    from ..ops import slab as slab_mod
    from ..ops.spgemm import narrow_u64_ok
    from .timing import fused_loop_time_args

    assert 2 < switch_step <= max_step + 1
    stats_by_step = {s[0]: s for s in native_stats}
    results: List[ChainStep] = []
    total = 0.0

    # ---- early steps: slab ESC, per-step fixed-plan fused timing
    cur = a
    for step in range(2, switch_step):
        narrow = a.sr_name == "u64" and narrow_u64_ok(cur, a)
        rc_dev, nch_total, sg_dev = slab_mod.plan_device(cur, a,
                                                         slab_mod.DEFAULT_C)
        rc = np.asarray(jax.device_get(rc_dev)).astype(np.int64)
        ncc = max(int(jax.device_get(nch_total)), 1)
        sg = _pow2(max(int(jax.device_get(sg_dev)), 1))
        _, want_nnz, _, flops = stats_by_step[step]
        out_cap = _pow2(flops)
        lc = slab_mod.DEFAULT_L // slab_mod.DEFAULT_C
        assert not (rc > lc).any(), "torus chain rows must fit one block"
        sel, starts, nb = slab_mod.pack_rows_ordered(rc, lc)
        sel_d, starts_d = jnp.asarray(sel), jnp.asarray(starts)
        rc_d = jnp.asarray(rc.astype(np.int32))

        c = slab_mod._numeric(cur, a, sel_d, starts_d, rc_d,
                              slab_mod.DEFAULT_C, slab_mod.DEFAULT_L, nb,
                              ncc, sg, out_cap, narrow)
        nnz = int(c.nnz)
        assert nnz == want_nnz, (step, nnz, want_nnz)

        def _bump_step(bump, cur_, a_, sel_x, starts_x, rc_x,
                       _st=(nb, ncc, sg, out_cap, narrow)):
            nb_x, ncc_x, sg_x, cap_x, nar_x = _st
            cur2 = dataclasses.replace(
                cur_, col_idx=cur_.col_idx + (bump * 1e-30).astype(jnp.int32))
            out = slab_mod._numeric(cur2, a_, sel_x, starts_x, rc_x,
                                    slab_mod.DEFAULT_C, slab_mod.DEFAULT_L,
                                    nb_x, ncc_x, sg_x, cap_x, nar_x)
            return out.col_idx[0].astype(jnp.float32)

        dt = fused_loop_time_args(
            _bump_step, (cur, a, sel_d, starts_d, rc_d),
            reps=slab_reps, iters=iters)
        total += dt
        rec = ChainStep(step=step, nnz=nnz, flops=flops, seconds=dt,
                        nnz_per_s=nnz / dt, gflops=2.0 * flops / dt / 1e9)
        results.append(rec)
        if verbose:
            print(f"A^{step} [slab]: nnz={nnz} flops={flops} "
                  f"time={dt*1e3:.2f}ms nnz/s={rec.nnz_per_s/1e6:.1f}M",
                  flush=True)
        cur = c

    if switch_step > max_step:
        return results, total

    # ---- transition: densify A^(switch-1) into row planes (timed)
    @jax.jit
    def densify(m: SparseCSR):
        return sp.to_row_planes(tuple_to_f32_dense(m))

    p0 = densify(cur)
    jax.block_until_ready(p0)

    def _dens_step(bump, cur_):
        cur2 = dataclasses.replace(
            cur_, col_idx=cur_.col_idx + (bump * 1e-30).astype(jnp.int32))
        return densify(cur2)[0, 0, 0]

    t_dens = fused_loop_time_args(_dens_step, (cur,), reps=slab_reps,
                                  iters=iters)
    total += t_dens
    if verbose:
        print(f"densify A^{switch_step-1} [transition]: "
              f"time={t_dens*1e3:.2f}ms", flush=True)

    # ---- late steps: DMA dense-accumulator, prefix differentials
    cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
        a, rows_per_tile=rows_per_tile, nbuf=nbuf)

    @jax.jit
    def timed_chain(p0_, bump, steps, reps_):
        def rep(r, carry):
            acc, _ = carry
            p = p0_.at[0, 0, 0].add(bump + jnp.float32(r) + acc * 1e-30)
            p = jax.lax.fori_loop(
                0, steps,
                lambda i, q: sp.spmm_pallas(cnt, cols, lrow, vals, q,
                                            rows_per_tile=rows_per_tile,
                                            nbuf=nbuf),
                p)
            return acc + p[0, 0, 0], p

        return jax.lax.fori_loop(0, reps_, rep, (jnp.float32(0.0), p0_))

    n_late = max_step - switch_step + 1
    acc, p_final = timed_chain(p0, 0.0, n_late, 1)
    jax.block_until_ready(acc)

    def _time(steps):
        acc, _ = timed_chain(p0, 0.0, steps, reps)
        jax.block_until_ready(acc)
        best = float("inf")
        for it in range(iters):
            t0 = time.perf_counter()
            acc, _ = timed_chain(p0, float(it + 1), steps, reps)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        return best / reps

    prefix = {s: _time(s) for s in range(n_late + 1)}
    for idx in range(n_late):
        step = switch_step + idx
        dt = max(prefix[idx + 1] - prefix[idx], 1e-9)
        _, nnz, vmax, flops = stats_by_step[step]
        if vmax >= float(1 << 24) - 8:
            raise OverflowError("mixed chain exceeds f32 exact range")
        total += dt
        rec = ChainStep(step=step, nnz=nnz, flops=flops, seconds=dt,
                        nnz_per_s=nnz / dt, gflops=2.0 * flops / dt / 1e9)
        results.append(rec)
        if verbose:
            print(f"A^{step} [pallas nbuf={nbuf}]: nnz={nnz} flops={flops} "
                  f"time={dt*1e3:.2f}ms nnz/s={rec.nnz_per_s/1e6:.1f}M",
                  flush=True)
    if verbose:
        print(f"chain total (A^2..A^{max_step}, incl. densify): "
              f"{total*1e3:.2f}ms  [reference CSR-par total ~102 ms]",
              flush=True)
    return results, total


def run_chain_foldband(
    a: SparseCSR,
    native_stats: list,
    max_step: int = 7,
    iters: int = 3,
    reps: int = 8,
    rows_per_tile: int = 40,
    nbuf: int = 8,
    dims: Sequence[int] = (30, 30, 30),
    verbose: bool = True,
    keep_final: Optional[dict] = None,
):
    """Fold-band chain: boustrophedon-relabel the torus (wrap edges become
    local, A becomes a PURE band), then run every step with the
    band-compact Pallas kernel (kernels/bandplanes.py) — per-entry DMA
    and FMA widths shrink to the step's true band (40..216 planes instead
    of a flat 216), which is where the full-width kernel's ~250 ns/entry
    went.

    The fold is a one-time relabeling (the reference's rcm()+permute
    role, src/graph_csr.rs:663-818): A^k of the folded matrix is the
    folded A^k — nnz, max value, and flops per step are permutation-
    invariant, so ``native_stats`` from the unfolded oracle applies
    unchanged.  Per-step times are fused-rep averages (bump-perturbed);
    the initial band scatter of A is input prep (untimed, like the
    full-width driver's p0 densify).

    Returns (records, total_seconds, final_planes_folded, perm)."""
    from functools import partial as _partial

    from ..kernels import bandplanes as bp
    from .timing import fused_loop_time_args

    stats_by_step = {s[0]: s for s in native_stats}
    n = a.n_rows
    row_ptr, col_idx, vals_np = a.to_numpy()
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    perm = bp.fold_perm(dims)
    rf, cf = perm[rows], perm[col_idx.astype(np.int64)]
    a_f = SparseCSR.from_coo_host(rf, cf, vals_np, n, sr=a.sr)
    h_a = bp.band_halfwidth(rf, cf)
    total_planes = -(-(-(-n // 128)) // 8) * 8  # ceil(n/128) to mult of 8

    base_in, s_in = bp.band_layout(n, h_a, total_planes)
    p = bp.csr_to_band(a_f, base_in, s_in)
    jax.block_until_ready(p)
    # chaining slack: a source row's base sits up to this many planes
    # above the output row's base (see band_layout's min_s contract)
    max_dp8 = 8 * (2 * h_a // 1024 + 1)

    results: List[ChainStep] = []
    total = 0.0
    for step in range(2, max_step + 1):
        _, want_nnz, vmax, flops = stats_by_step[step]
        if vmax >= float(1 << 24) - 8:
            raise OverflowError("fold-band chain exceeds f32 exact range")
        base_out, s_out = bp.band_layout(n, step * h_a, total_planes,
                                         min_s=s_in + max_dp8)
        cnt, src, dst, vals = bp.tile_band_operand(
            a_f, base_in, s_in, base_out, s_out, rows_per_tile, nbuf)
        run = _partial(bp.spmm_band, cnt, src, dst,
                       s_in=s_in, s_out=s_out,
                       rows_per_tile=rows_per_tile, nbuf=nbuf)
        c = run(vals, p)
        nnz = int(jax.device_get(jnp.count_nonzero(c)))
        assert nnz == want_nnz, (step, nnz, want_nnz)

        def _step(bump, vals_, p_):
            # bump the (tiny) A-values stream, NOT p: perturbing p costs
            # a full copy of the GB-scale band planes per rep (measured
            # 0.7-3.4 ms/step of pure timing artifact)
            return run(vals_.at[0, 0, 0].add(bump * 1e-7), p_)[0, 0, 0]

        dt = fused_loop_time_args(_step, (vals, p), reps=reps, iters=iters)
        total += dt
        rec = ChainStep(step=step, nnz=nnz, flops=flops, seconds=dt,
                        nnz_per_s=nnz / dt, gflops=2.0 * flops / dt / 1e9)
        results.append(rec)
        if verbose:
            print(f"A^{step} [foldband s_in={s_in} s_out={s_out}]: "
                  f"nnz={nnz} flops={flops} time={dt*1e3:.2f}ms "
                  f"nnz/s={rec.nnz_per_s/1e6:.1f}M", flush=True)
        p, base_in, s_in = c, base_out, s_out
    if verbose:
        print(f"fold-band chain total (A^2..A^{max_step}): "
              f"{total*1e3:.2f}ms  [reference CSR-par total ~102 ms]",
              flush=True)
    if keep_final is not None:
        keep_final["p"] = p
        keep_final["base"] = base_in
        keep_final["s"] = s_in
        keep_final["perm"] = perm
    return results, total
