"""Exact saturating-arithmetic tests for the limbed semirings.

Differential against Python arbitrary-precision ints (the role the Rust
``Saturating<u32/u64>`` types play in the reference, src/graph_csr.rs:29-37).
"""

import numpy as np
import pytest

from sparsetpu.semiring import F32SR, U32, U64

U32_MAX = 0xFFFFFFFF
U64_MAX = 0xFFFFFFFFFFFFFFFF


def _interesting_u64():
    base = [0, 1, 2, 3, 7, 255, 256, 65535, 65536, 2**24, 2**31, 2**32 - 1,
            2**32, 2**32 + 1, 2**40, 2**48 + 12345, 2**63, U64_MAX - 1, U64_MAX]
    rng = np.random.default_rng(42)
    rand = list(rng.integers(0, U64_MAX, size=50, dtype=np.uint64))
    return np.array(base + [int(x) for x in rand], dtype=np.uint64)


class TestU64:
    def test_roundtrip(self):
        x = _interesting_u64()
        v = U64.from_numpy(x)
        np.testing.assert_array_equal(U64.to_numpy(v), x)

    def test_sat_add(self):
        xs = _interesting_u64()
        a = np.repeat(xs, len(xs))
        b = np.tile(xs, len(xs))
        got = U64.to_numpy(U64.add(U64.from_numpy(a), U64.from_numpy(b)))
        want = np.array(
            [min(int(x) + int(y), U64_MAX) for x, y in zip(a, b)], np.uint64
        )
        np.testing.assert_array_equal(got, want)

    def test_sat_mul(self):
        xs = _interesting_u64()
        a = np.repeat(xs, len(xs))
        b = np.tile(xs, len(xs))
        got = U64.to_numpy(U64.mul(U64.from_numpy(a), U64.from_numpy(b)))
        want = np.array(
            [min(int(x) * int(y), U64_MAX) for x, y in zip(a, b)], np.uint64
        )
        np.testing.assert_array_equal(got, want)

    def test_ones_zeros(self):
        assert U64.to_numpy(U64.ones((3,))).tolist() == [1, 1, 1]
        assert U64.to_numpy(U64.zeros((2,))).tolist() == [0, 0]
        assert bool(np.all(np.asarray(U64.is_zero(U64.zeros((4,))))))


class TestU32:
    def test_sat_add_mul(self):
        xs = np.array([0, 1, 2, 1000, 65535, 65536, 2**30, U32_MAX - 1, U32_MAX],
                      np.uint64)
        rng = np.random.default_rng(7)
        xs = np.concatenate([xs, rng.integers(0, U32_MAX, 40, dtype=np.uint64)])
        a = np.repeat(xs, len(xs))
        b = np.tile(xs, len(xs))
        got_add = U32.to_numpy(U32.add(U32.from_numpy(a), U32.from_numpy(b)))
        got_mul = U32.to_numpy(U32.mul(U32.from_numpy(a), U32.from_numpy(b)))
        want_add = np.array([min(int(x) + int(y), U32_MAX) for x, y in zip(a, b)], np.uint64)
        want_mul = np.array([min(int(x) * int(y), U32_MAX) for x, y in zip(a, b)], np.uint64)
        np.testing.assert_array_equal(got_add, want_add)
        np.testing.assert_array_equal(got_mul, want_mul)


class TestF32:
    def test_plain_ops(self):
        a = np.array([1.5, -2.0, 0.0], np.float32)
        b = np.array([2.0, 3.0, 5.0], np.float32)
        np.testing.assert_allclose(
            F32SR.to_numpy(F32SR.add(F32SR.from_numpy(a), F32SR.from_numpy(b))), a + b
        )
        np.testing.assert_allclose(
            F32SR.to_numpy(F32SR.mul(F32SR.from_numpy(a), F32SR.from_numpy(b))), a * b
        )
