"""sparsetpu — TPU-native sparse linear algebra (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the Rust reference suite
``imlvts/sparse-linear-algebra-tests``: saturating-semiring CSR/COO, SpGEMM,
graph algorithms, block-sparse attention, a runtime einsum planner, and
row-partitioned multi-chip execution via jax.sharding.
"""

from .semiring import F32SR, U32, U64, Semiring, by_name
from .csr import SparseCSR
from .ops.spgemm import spadd, spgemm, spgemm_auto, symbolic_flops

__all__ = [
    "F32SR",
    "U32",
    "U64",
    "Semiring",
    "by_name",
    "SparseCSR",
    "spadd",
    "spgemm",
    "spgemm_auto",
    "symbolic_flops",
]
