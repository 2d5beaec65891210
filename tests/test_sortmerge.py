"""Pallas sort-merge kernel vs the XLA reference formulation: per-row
sort + saturating merge + pack must agree bit-exactly (interpret mode on
CPU; the same program compiles via Mosaic on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sparsetpu.kernels import sortmerge
from sparsetpu.ops import segments
from sparsetpu.ops.segments import INT32_SENTINEL
from sparsetpu.semiring import U64, U32, F32SR, by_name


def _xla_reference(cols, limbs, sr):
    """The numeric_cat XLA block: sort, lane-scan merge, pack."""
    out = jax.lax.sort([cols, *limbs], dimension=-1, num_keys=1,
                       is_stable=False)
    cols_s, limbs_s = out[0], tuple(out[1:])
    prev = jnp.pad(cols_s[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    head = cols_s != prev
    totals, _ = segments.segment_reduce_sorted(sr, head, limbs_s, axis=1)
    tail = jnp.concatenate(
        [head[:, 1:], jnp.ones((head.shape[0], 1), bool)], axis=1)
    keep = tail & (cols_s != INT32_SENTINEL) & ~sr.is_zero(totals)
    keyed = jnp.where(keep, cols_s, INT32_SENTINEL)
    tot2 = tuple(jnp.where(keep, x, 0) for x in totals)
    out2 = jax.lax.sort([keyed, *tot2], dimension=-1, num_keys=1,
                        is_stable=False)
    return np.asarray(out2[0]), [np.asarray(x) for x in out2[1:]]


def _random_case(R, L, n_cols, sr, seed, fill=0.7, sentinel_frac=0.3):
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, n_cols, (R, L)).astype(np.int32)
    sent = rng.random((R, L)) < sentinel_frac
    cols[sent] = int(INT32_SENTINEL)
    if sr.name == "f32":
        vals = rng.integers(0, 50, (R, L)).astype(np.float32)
        vals[sent] = 0.0
        limbs = (jnp.asarray(vals),)
    else:
        lo = rng.integers(0, 1 << 32, (R, L), dtype=np.uint64)
        lo[sent] = 0
        if sr.nlimbs == 2:
            hi = rng.integers(0, 4, (R, L), dtype=np.uint64).astype(np.uint32)
            hi[sent] = 0
            limbs = (jnp.asarray(lo.astype(np.uint32)), jnp.asarray(hi))
        else:
            limbs = (jnp.asarray((lo & 0xFFFFFFF).astype(np.uint32)),)
    return jnp.asarray(cols), limbs


@pytest.mark.parametrize("sr_name,L", [
    ("u64", 128), ("u64", 256), ("u32", 128), ("f32", 256),
])
def test_sortmerge_matches_xla(sr_name, L):
    sr = by_name(sr_name)
    cols, limbs = _random_case(16, L, 40, sr, seed=L + len(sr_name))
    got_c, got_l = sortmerge.sortmerge_rows(cols, limbs, sr_name)
    want_c, want_l = _xla_reference(cols, limbs, sr)
    np.testing.assert_array_equal(np.asarray(got_c), want_c)
    for g, w in zip(got_l, want_l):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_sortmerge_saturation():
    # duplicate columns whose limb sums overflow u64 must saturate
    sr = by_name("u64")
    cols = jnp.asarray(np.full((8, 128), 7, np.int32))
    lo = jnp.asarray(np.full((8, 128), 0xFFFFFFFF, np.uint32))
    hi = jnp.asarray(np.full((8, 128), 0xFFFFFFF0, np.uint32))
    got_c, got_l = sortmerge.sortmerge_rows(cols, (lo, hi), "u64")
    gc = np.asarray(got_c)
    assert (gc[:, 0] == 7).all() and (gc[:, 1:] == int(INT32_SENTINEL)).all()
    assert (np.asarray(got_l[0])[:, 0] == 0xFFFFFFFF).all()
    assert (np.asarray(got_l[1])[:, 0] == 0xFFFFFFFF).all()


def test_sortmerge_all_sentinel():
    sr = by_name("u32")
    cols = jnp.full((8, 128), INT32_SENTINEL, jnp.int32)
    limbs = (jnp.zeros((8, 128), jnp.uint32),)
    got_c, got_l = sortmerge.sortmerge_rows(cols, limbs, "u32")
    assert (np.asarray(got_c) == int(INT32_SENTINEL)).all()
