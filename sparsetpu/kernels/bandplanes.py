"""Band-compact row planes: the chain SpMM at band speed of light.

The full-width DMA chain kernel (spmm_pallas.py) pays ~250 ns per A-entry,
dominated by two width-proportional costs: the (S, 128) HBM->VMEM row
transfer (S = 216 planes = the FULL 27648-column row) and the (S, 128)
VPU FMA's VMEM traffic.  But A^k of a banded matrix is banded: row i of
A^k has support only in columns [i - k*h, i + k*h] (h = A's half-width),
a 13%-89% slice of the full width across the chain — the kernel was
moving mostly zeros.

Two ideas make the band exploitable on TPU:

1. *Fold the torus.*  A Moore-torus adjacency is only CYCLICALLY banded
   (wrap edges connect row 0 to row n-1), and 128 does not divide n, so
   no plane layout aligns across the wrap.  Relabeling every dimension
   by the boustrophedon permutation sigma(x) = 2x / 2(d-x)-1 maps wrap
   neighbors to adjacent labels: every torus edge has per-dim label
   delta <= 2, so the folded flat offset is bounded by 2*(strides sum)
   — a PURE band, no wrap, no outliers (the RCM role, done in closed
   form; reference reorders with rcm() for the same purpose,
   src/graph_csr.rs:663-818).

2. *Plane-aligned per-row windows.*  P_k is stored as (n, S_k, 128)
   where row i's planes cover absolute columns [base_k(i)*128, ...),
   base_k(i) = 8*floor((i - h_k)/1024) clamped — an 8-plane-aligned,
   monotone window.  Every FMA destination offset
   dp = base_in(col) - base_out(i) is then a nonnegative multiple of 8:
   the accumulate stays a full-width UNMASKED (S_in, 128) VPU op at a
   provably sublane-aligned dynamic offset, exactly like the full-width
   kernel — just S_in planes instead of 216.  Successive steps chain
   with no rebase pass: step k's output layout IS step k+1's input.

Exactness: integer counts in f32, exact below 2^24 (callers guard).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_pallas import _interpret, _round_up


def fold_perm(dims: Sequence[int]) -> np.ndarray:
    """Boustrophedon node relabeling: perm[old_flat] = new_flat.

    Per dimension of size d: sigma(x) = 2x for x < ceil(d/2) else
    2(d-x)-1 — wrap neighbors (0, d-1) land at labels (0, 1) and interior
    neighbors differ by <= 2, so a torus edge's folded flat offset is
    bounded by 2 * sum(strides)."""
    dims = list(dims)

    def sigma(d):
        x = np.arange(d)
        return np.where(x < -(-d // 2), 2 * x, 2 * (d - x) - 1)

    coords = np.indices(dims).reshape(len(dims), -1)
    new = np.zeros(coords.shape[1], np.int64)
    for axis, d in enumerate(dims):
        new = new * d + sigma(d)[coords[axis]]
    return new


def band_halfwidth(rows: np.ndarray, cols: np.ndarray) -> int:
    """Max |i - j| over entries (the LINEAR band half-width)."""
    if len(rows) == 0:
        return 0
    return int(np.abs(rows.astype(np.int64) - cols.astype(np.int64)).max())


def band_layout(n: int, h: int, total_planes: int,
                min_s: int = 0) -> Tuple[np.ndarray, int]:
    """(base_planes int32[n], s_planes) for half-width h.

    base is a multiple of 8 (1024-column units) so every inter-layout
    delta is 8-plane aligned; s covers the worst-case window + alignment
    slack, rounded to a multiple of 8 and capped at the full width.

    ``min_s``: chaining constraint — a step's output planes must admit
    the full (s_in, 128) FMA at the worst-case plane delta, i.e.
    s_out >= s_in + 8*(ceil(2*h_edge/1024)+1) (the caller computes it);
    the stored slack planes beyond a row's true window hold zeros, so
    the over-wide FMA only ever adds zeros there."""
    i = np.arange(n, dtype=np.int64)
    base = 8 * np.floor_divide(i - h, 1024)
    s = int(-(-(2 * h + 1) // 128)) + 9  # window + up to 8 planes of slack
    s = min(_round_up(max(s, min_s), 8), total_planes)
    base = np.clip(base, 0, total_planes - s).astype(np.int32)
    # every row's true window must fit its planes
    top = np.minimum(i + h, n - 1) // 128
    lo = np.maximum(i - h, 0) // 128
    assert ((lo >= base) & (top < base + s)).all(), (h, s)
    return base, s


def tile_band_operand(a, base_in: np.ndarray, s_in: int,
                      base_out: np.ndarray, s_out: int,
                      rows_per_tile: int, nbuf: int):
    """Host prep of the static sparse operand for one band-chain step.

    Per entry (i, c, v): DMA src = c * s_in (P_in row slab), FMA dst =
    local_row * s_out + (base_in[c] - base_out[i]).  All dsts are
    asserted 8-plane aligned and in range — the band invariant."""
    n = a.n_rows
    assert n % rows_per_tile == 0, (n, rows_per_tile)
    row_ptr, col_idx, vals_np = a.to_numpy()
    if (getattr(a, "sr_name", "u64") != "f32" and len(vals_np)
            and float(vals_np.max()) >= float(1 << 24)):
        raise ValueError("band spmm requires values < 2^24")
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    cols = col_idx.astype(np.int64)
    dp = base_in[cols].astype(np.int64) - base_out[rows].astype(np.int64)
    assert (dp >= 0).all() and (dp % 8 == 0).all(), "band layout broken"
    assert (dp + s_in <= s_out).all(), (int(dp.max()), s_in, s_out)

    t_count = n // rows_per_tile
    tile_of_entry = rows // rows_per_tile
    counts = np.bincount(tile_of_entry, minlength=t_count)
    cnt_pad = np.maximum(-(-counts // nbuf) * nbuf, nbuf)
    e_max = _round_up(max(int(cnt_pad.max(initial=nbuf)), nbuf), 8)
    src = np.zeros((t_count, 1, e_max), np.int32)
    dst = np.zeros((t_count, 1, e_max), np.int32)
    vals = np.zeros((t_count, 1, e_max), np.float32)
    starts = row_ptr[::rows_per_tile][:t_count]
    for t in range(t_count):
        s0, c = int(starts[t]), int(counts[t])
        sl = slice(s0, s0 + c)
        src[t, 0, :c] = cols[sl] * s_in
        dst[t, 0, :c] = ((rows[sl] - t * rows_per_tile) * s_out + dp[sl])
        vals[t, 0, :c] = vals_np[sl].astype(np.float32)
    return (jnp.asarray(cnt_pad, jnp.int32), jnp.asarray(src),
            jnp.asarray(dst), jnp.asarray(vals))


def _band_kernel(s_in, s_out, nbuf, cnt_ref, src_ref, dst_ref, vals_ref,
                 p_hbm, out_ref, row_buf, sem):
    """One output-row tile, band-compact: identical pipeline to
    spmm_pallas._spmm_kernel but with distinct in/out plane counts and a
    combined (row, plane-offset) destination."""
    i = pl.program_id(0)
    groups = cnt_ref[i] // nbuf
    out_ref[:] = jnp.zeros_like(out_ref)

    def dma(slot, e):
        s0 = pl.multiple_of(src_ref[0, 0, e], 8)
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(s0, s_in), :], row_buf.at[slot], sem.at[slot])

    def fma(slot, e):
        d0 = pl.multiple_of(dst_ref[0, 0, e], 8)
        out_ref[pl.ds(d0, s_in), :] += vals_ref[0, 0, e] * row_buf[slot]

    for s in range(nbuf):
        dma(s, s).start()

    def body(g, _):
        base = g * nbuf
        for s in range(nbuf):
            dma(s, base + s).wait()
            fma(s, base + s)
            dma(s, base + nbuf + s).start()
        return 0

    jax.lax.fori_loop(0, groups - 1, body, 0)
    last = (groups - 1) * nbuf
    for s in range(nbuf):
        dma(s, last + s).wait()
        fma(s, last + s)


@partial(jax.jit, static_argnames=("s_in", "s_out", "rows_per_tile",
                                   "nbuf"))
def spmm_band(cnt, src, dst, vals, p_band, s_in: int, s_out: int,
              rows_per_tile: int, nbuf: int = 8):
    """C_band = A x P_band with A pre-tiled by tile_band_operand.

    p_band: (n, s_in, 128) band-compact planes; returns (n, s_out, 128)
    in the step's output layout."""
    t_count, _, e_max = cnt.shape[0], 1, src.shape[2]
    n, s_chk, lane = p_band.shape
    assert s_chk == s_in and lane == 128, p_band.shape
    p_flat = p_band.reshape(n * s_in, lane)
    entry_spec = pl.BlockSpec((1, 1, e_max), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_count,),
        in_specs=[entry_spec, entry_spec, entry_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows_per_tile * s_out, lane),
                               lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.VMEM((nbuf, s_in, lane), jnp.float32),
                        pltpu.SemaphoreType.DMA((nbuf,))],
    )
    out = pl.pallas_call(
        partial(_band_kernel, s_in, s_out, nbuf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t_count * rows_per_tile * s_out, lane), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(src.size) * s_in * lane,
            bytes_accessed=(int(src.size) * s_in
                            + t_count * rows_per_tile * s_out) * lane * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(cnt, src, dst, vals, p_flat)
    return out.reshape(t_count * rows_per_tile, s_out, lane)


def csr_to_band(a, base: np.ndarray, s: int) -> jnp.ndarray:
    """Device scatter of a (folded) CSR matrix into its band layout."""
    n = a.n_rows
    row_ptr, col_idx, vals_np = a.to_numpy()
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    cols = col_idx.astype(np.int64)
    pos = rows * (s * 128) + (cols - base[rows].astype(np.int64) * 128)
    assert (pos >= rows * (s * 128)).all()
    assert (pos < (rows + 1) * (s * 128)).all()

    @jax.jit
    def scatter(pos_d, vals_d):
        flat = jnp.zeros((n * s * 128,), jnp.float32)
        return flat.at[pos_d].set(vals_d).reshape(n, s, 128)

    return scatter(jnp.asarray(pos), jnp.asarray(vals_np, jnp.float32))


@partial(jax.jit, static_argnames=("n_cols",))
def band_to_planes(p_band: jnp.ndarray, base: jnp.ndarray, n_cols: int):
    """Unfold band-compact planes to full (n, S_total, 128) row planes
    (verification / handoff to the full-width kernel)."""
    n, s, lane = p_band.shape
    total = _round_up(_round_up(n_cols, 128) // 128, 8)
    idx = base.astype(jnp.int32)[:, None] * 128 + jnp.arange(
        s * 128, dtype=jnp.int32)
    out = jnp.zeros((n, total * 128), jnp.float32)
    out = out.at[jnp.arange(n)[:, None], idx].set(
        p_band.reshape(n, s * 128))
    return out.reshape(n, total, lane)
