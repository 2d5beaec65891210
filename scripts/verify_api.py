"""Verify surface 3: public-API user session (CPU)."""
import numpy as np
import scipy.sparse as ss

import jax

jax.config.update("jax_platforms", "cpu")

from sparsetpu.csr import SparseCSR
from sparsetpu.graphs.generate import lattice, random_graph
from sparsetpu.graphs import algos
from sparsetpu.ops.spgemm import spgemm_auto, spgemm
from sparsetpu.semiring import F32SR, U32, U64

# torus chain vs scipy
coo = lattice((6, 6, 6), True)
r, c, v, n = coo
a = SparseCSR.from_coo_host(r, c, v, n)
sa = ss.coo_matrix((v.astype(np.int64), (r, c)), shape=(n, n)).tocsr()
out = spgemm_auto(a, a)
assert np.array_equal(out.to_dense_numpy().astype(np.int64),
                      (sa @ sa).toarray()), "torus A^2 mismatch"
print("spgemm_auto torus A^2 vs scipy OK", int(out.nnz))

# u32 + f32 routes through spgemm_auto (new this round: non-u64 denseacc)
a32 = SparseCSR.from_coo_host(r, c, v, n, sr=U32)
o32 = spgemm_auto(a32, a32, kernel="denseacc")
assert np.array_equal(o32.to_dense_numpy().astype(np.int64),
                      (sa @ sa).toarray()), "u32 denseacc mismatch"
print("u32 denseacc OK")
vf = (v % 3 + 1).astype(np.float32)
af = SparseCSR.from_coo_host(r, c, vf, n, sr=F32SR)
of = spgemm_auto(af, af, kernel="denseacc")
sf = ss.coo_matrix((vf.astype(np.float64), (r, c)), shape=(n, n)).tocsr()
np.testing.assert_allclose(of.to_dense_numpy(), (sf @ sf).toarray(),
                           rtol=1e-5, atol=1e-6)
print("f32 denseacc OK")

# graph algos
comp = algos.connected_components(a)
assert comp.max() == 0, "torus should be one component"
arcm, perm = algos.rcm(a)
mb0, _ = algos.bandwidth_stats(a)
mb1, _ = algos.bandwidth_stats(arcm)
print(f"rcm bandwidth {mb0} -> {mb1} OK")
back = algos.unpermute(arcm, perm)
assert np.array_equal(back.to_dense_numpy(), a.to_dense_numpy())
print("rcm round-trip OK")

# einsum engine + InvalidSpec
from sparsetpu.einsum.engine import einsum
from sparsetpu.einsum.parser import InvalidSpec

ca = random_graph(40, 200, seed=1)
m1 = SparseCSR.from_coo_host(*ca)
d = np.arange(40 * 8, dtype=np.float32).reshape(40, 8)
from sparsetpu.semiring import F32SR as _F32

m1f = SparseCSR.from_coo_host(ca[0], ca[1], ca[2].astype(np.float32),
                              ca[3], sr=_F32)
(res,) = einsum("ij,jk->ik", [m1f, d])
ref = np.einsum("ij,jk->ik",
                m1f.to_dense_numpy().astype(np.float64),
                d.astype(np.float64))
np.testing.assert_allclose(np.asarray(res, np.float64), ref, rtol=1e-5)
print("einsum CSRxdense OK")
try:
    einsum("ij,jk->iq", [m1f, d])
    raise SystemExit("InvalidSpec not raised")
except InvalidSpec:
    print("InvalidSpec OK")

# undersized expand_cap poisons
bad = spgemm(a, a, expand_cap=8)
try:
    bad.check()
    raise SystemExit("poisoning missed")
except ValueError:
    print("undersized expand_cap poisons OK")

# empty matrix
e = SparseCSR.empty(5, 5, 4, U64)
oe = spgemm_auto(e, e)
assert int(oe.nnz) == 0
print("empty OK")

# attention scores smoke
from sparsetpu.attention import scores as att

print("attention module OK:", hasattr(att, "attention_scores_dense"))
print("ALL API PROBES PASSED")
