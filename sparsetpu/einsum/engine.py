"""Runtime einsum engine over mixed dense/sparse semiring operands.

The reference builds five engine generations (interpreter, sparse-driven,
bytecode VM v1/v2, Cranelift JIT — SURVEY.md L3); on TPU, ``jax.jit`` *is*
the shape-specializing JIT, so this engine is a **planner**: it classifies
the spec + operand kinds and lowers to the best available kernel:

  tier 1: sparse matmul patterns -> ESC SpGEMM / SpMM kernels (O(flops)),
          the analog of the VM's SparseRowLoop scheduling
          (linalg/src/einsum.rs:327-389).
  tier 2: all-dense f32 -> jnp.einsum on the MXU.
  tier 3: general fallback -> densified loop-nest contraction with exact
          semiring arithmetic (the interpreter-oracle role,
          einsum-dyn/src/lib.rs:456-474), with a joint-space size guard —
          the analog of JitError::Unsupported falling back to the VM
          (linalg/src/jit.rs:50-57).

Operands: jnp arrays / numpy (dense; f32 arrays or semiring limb tuples) or
``SparseCSR`` (2-D sparse).  Outputs are dense limb tuples (single arrays
for 1-limb semirings) per output spec.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..csr import SparseCSR
from ..ops.spgemm import spgemm, symbolic_flops
from ..semiring import F32SR, Semiring, Value
from .parser import EinsumSpec, InvalidSpec, parse_spec, validate_dims

Operand = Union[jnp.ndarray, np.ndarray, tuple, SparseCSR]

# joint-index-space guard for the general fallback (elements)
FALLBACK_MAX_ELEMS = 1 << 22


def _pow2(x: int) -> int:
    return 1 << (max(int(x), 1) - 1).bit_length()


def _operand_info(op: Operand, sr: Semiring):
    """Returns (kind, shape, limbs) with kind in {dense, sparse, grouped}."""
    from ..grouped import GroupedCSR

    if isinstance(op, GroupedCSR):
        return "grouped", op.shape, None
    if isinstance(op, SparseCSR):
        return "sparse", op.shape, None
    if isinstance(op, tuple):
        return "dense", tuple(op[0].shape), tuple(jnp.asarray(l) for l in op)
    arr = jnp.asarray(op)
    if sr.nlimbs == 1:
        return "dense", tuple(arr.shape), (arr.astype(sr.dtype),)
    raise TypeError(
        f"dense operand for {sr.name} must be a {sr.nlimbs}-limb tuple"
    )


def einsum(spec: str, operands: Sequence[Operand], sr: Semiring = F32SR,
           out_caps: Optional[Sequence[int]] = None):
    """Evaluate `spec` over `operands` on semiring `sr`.

    Returns a list of dense outputs (one per output spec); each output is a
    single array for 1-limb semirings, else a limb tuple.
    """
    parsed = parse_spec(spec)
    infos = [_operand_info(op, sr) for op in operands]
    shapes = [i[1] for i in infos]
    dims = validate_dims(parsed, shapes)

    results = []
    for out in parsed.outputs:
        results.append(_einsum_single(parsed, out, operands, infos, dims, sr))
    return results


def _einsum_single(parsed: EinsumSpec, out: Tuple[str, ...], operands, infos,
                   dims: Dict[str, int], sr: Semiring):
    lowered = _try_grouped_matmul(parsed, out, operands, infos, dims, sr)
    if lowered is not None:
        return lowered
    lowered = _try_sparse_matmul(parsed, out, operands, infos, dims, sr)
    if lowered is not None:
        return lowered
    if sr.name == "f32" and all(i[0] == "dense" for i in infos):
        arrs = [i[2][0] for i in infos]
        sub = ",".join("".join(i) for i in parsed.inputs) + "->" + "".join(out)
        return jnp.einsum(sub, *arrs, preferred_element_type=jnp.float32)
    return _fallback_loop_nest(parsed, out, operands, infos, dims, sr)


# ---------------------------------------------------------------------------
# tier 0: batched (compound-row) sparse matmul — "bij,bjk->bik"
# ---------------------------------------------------------------------------

def _try_grouped_matmul(parsed, out, operands, infos, dims, sr):
    """Batched sparse matmul on GroupedCSR operands: the compound-row walk
    of the reference VM v2 (linalg/src/einsum.rs:209-232), lowered to one
    block-diagonal SpGEMM."""
    from ..grouped import GroupedCSR

    if len(parsed.inputs) != 2 or len(out) != 3:
        return None
    a_ix, b_ix = parsed.inputs
    if len(a_ix) != 3 or len(b_ix) != 3:
        return None
    if not (isinstance(operands[0], GroupedCSR)
            and isinstance(operands[1], GroupedCSR)):
        return None
    if a_ix[0] != b_ix[0] or a_ix[0] != out[0]:
        return None
    if a_ix[2] != b_ix[1] or (a_ix[1], b_ix[2]) != (out[1], out[2]):
        return None
    if len({a_ix[0], a_ix[1], a_ix[2], b_ix[2]}) != 4:
        return None
    c = operands[0].matmul(operands[1])
    # block-diag flat dense -> (g, n, m)
    flat = c.flat.to_dense()
    g, n, m = c.g, c.n, c.m
    gi = jnp.arange(g)[:, None, None]
    ri = jnp.arange(n)[None, :, None]
    ci = jnp.arange(m)[None, None, :]
    dense = tuple(l[gi * n + ri, gi * m + ci] for l in flat)
    return dense if sr.nlimbs > 1 else dense[0]


# ---------------------------------------------------------------------------
# tier 1: sparse matmul patterns
# ---------------------------------------------------------------------------

def _try_sparse_matmul(parsed, out, operands, infos, dims, sr):
    """Recognize ``ab,bc->ac``-shaped specs (any letter names; one shared
    contracted index; both operands 2-D; at least one sparse) and lower to
    the ESC SpGEMM kernel, densifying the result."""
    if len(parsed.inputs) != 2 or len(out) != 2:
        return None
    a_ix, b_ix = parsed.inputs
    if len(a_ix) != 2 or len(b_ix) != 2:
        return None
    if len(set(a_ix)) != 2 or len(set(b_ix)) != 2:
        return None
    if not any(i[0] == "sparse" for i in infos):
        return None
    # match (i k),(k j)->(i j) with optional transposes
    candidates = []
    for a_swap in (False, True):
        ai = a_ix[::-1] if a_swap else a_ix
        for b_swap in (False, True):
            bi = b_ix[::-1] if b_swap else b_ix
            if ai[1] == bi[0] and (ai[0], bi[1]) == tuple(out) and ai[0] != bi[1]:
                candidates.append((a_swap, b_swap))
    if not candidates:
        return None
    a_swap, b_swap = candidates[0]
    a = _as_csr(operands[0], infos[0], sr, transpose=a_swap)
    b = _as_csr(operands[1], infos[1], sr, transpose=b_swap)
    flops = int(symbolic_flops(a, b))
    c = spgemm(a, b, _pow2(flops))
    dense = c.to_dense()
    return dense if sr.nlimbs > 1 else dense[0]


def _as_csr(op, info, sr: Semiring, transpose: bool) -> SparseCSR:
    if isinstance(op, SparseCSR):
        return op.transpose() if transpose else op
    limbs = info[2]
    if transpose:
        limbs = tuple(l.T for l in limbs)
    n, m = limbs[0].shape
    # densify host-side: engine fast path for dense operands mixed with sparse
    mask = np.zeros((n, m), bool)
    for l in limbs:
        mask |= np.asarray(jax.device_get(l)) != 0
    r, c = np.nonzero(mask)
    vals = tuple(jnp.asarray(np.asarray(jax.device_get(l))[r, c]) for l in limbs)
    cap = max(len(r), 1)
    return SparseCSR.from_coo_device(
        jnp.asarray(r, jnp.int32), jnp.asarray(c, jnp.int32), vals,
        n, m, sr, cap,
    )


# ---------------------------------------------------------------------------
# tier 3: general loop-nest fallback (exact, any semiring, any spec)
# ---------------------------------------------------------------------------

def _densify(op, info, sr: Semiring):
    from ..grouped import GroupedCSR

    if isinstance(op, GroupedCSR):
        flat = op.flat.to_dense()
        g, n, m = op.shape
        gi = jnp.arange(g)[:, None, None]
        ri = jnp.arange(n)[None, :, None]
        ci = jnp.arange(m)[None, None, :]
        return tuple(l[gi * n + ri, gi * m + ci] for l in flat)
    if isinstance(op, SparseCSR):
        return op.to_dense()
    return info[2]


def _fallback_loop_nest(parsed, out, operands, infos, dims, sr: Semiring):
    """Broadcast every operand into the joint index space (free ++ contracted),
    multiply on the semiring, then reduce contracted axes with saturating adds."""
    letters = list(out) + [s for s in parsed.slots if s not in out]
    joint_shape = tuple(dims[ch] for ch in letters)
    n_elems = int(np.prod(joint_shape)) if joint_shape else 1
    if n_elems > FALLBACK_MAX_ELEMS:
        raise InvalidSpec(
            "Unsupported",
            f"no kernel for spec {parsed.canonical()!r} and joint space "
            f"{n_elems} exceeds the fallback guard",
        )

    prod: Optional[Value] = None
    for op, info, inp in zip(operands, infos, parsed.inputs):
        limbs = _densify(op, info, sr)
        expanded = _broadcast_to_joint(limbs, inp, letters, dims)
        prod = expanded if prod is None else sr.mul(prod, expanded)

    # reduce contracted axes (sequential saturating fold along flattened axis)
    n_free = len(out)
    contracted_size = int(np.prod(joint_shape[n_free:])) if letters[n_free:] else 1
    free_shape = joint_shape[:n_free]
    flat = tuple(l.reshape(free_shape + (contracted_size,)) for l in prod)
    if contracted_size == 1:
        total = tuple(l[..., 0] for l in flat)
    else:
        def body(i, acc):
            cur = tuple(l[..., i] for l in flat)
            return sr.add(acc, cur)

        init = tuple(l[..., 0] for l in flat)
        total = jax.lax.fori_loop(1, contracted_size, body, init)
    return total if sr.nlimbs > 1 else total[0]


def _broadcast_to_joint(limbs: Value, inp: Tuple[str, ...], letters: List[str],
                        dims: Dict[str, int]) -> Value:
    """Extract diagonals for repeated letters, then broadcast to the joint space."""
    uniq: List[str] = []
    for ch in inp:
        if ch not in uniq:
            uniq.append(ch)
    if len(uniq) != len(inp):
        # take diagonals: index each axis by the unique-letter index grids
        grids = jnp.meshgrid(
            *[jnp.arange(dims[ch]) for ch in uniq], indexing="ij"
        ) if uniq else []
        index = tuple(grids[uniq.index(ch)] for ch in inp)
        limbs = tuple(l[index] for l in limbs)
    # now limbs has axes = uniq; move into joint layout
    perm_src = [letters.index(ch) for ch in uniq]
    out = []
    for l in limbs:
        shape = [1] * len(letters)
        for ax, ch in enumerate(uniq):
            shape[letters.index(ch)] = dims[ch]
        lr = l.reshape([dims[ch] for ch in uniq]) if uniq else l
        # permute uniq axes into ascending joint positions
        order = np.argsort(perm_src)
        lr = jnp.transpose(lr, tuple(order)) if len(uniq) > 1 else lr
        out.append(jnp.broadcast_to(lr.reshape(shape), [dims[ch] for ch in letters]))
    return tuple(out)
