"""Root-cause the 1689s 'built A' phase seen in BENCH_r02.json.

Times each sub-phase of bench.py's startup separately:
  1. jax import + backend init (jax.devices())
  2. numpy graph generation (lattice + thin)
  3. host COO->CSR merge (from_coo_host numpy part)
  4. each individual device transfer (jnp.asarray per limb / col_idx / row_ptr)
  5. a second transfer of identical-shaped fresh data (warm-path cost)
"""
import sys
import time

t_start = time.time()


def mark(msg):
    print(f"[{time.time()-t_start:8.1f}s] {msg}", file=sys.stderr, flush=True)


mark("importing jax")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

mark("calling jax.devices()")
d = jax.devices()
mark(f"devices: {d}")

from sparsetpu.graphs import generate

t0 = time.time()
coo = generate.lattice([30, 30, 30], torus=True)
coo = generate.thin(coo, 3.0 / 26.0, seed=42)
rows, cols, vals, n = coo
mark(f"numpy lattice+thin: {time.time()-t0:.2f}s nnz={len(rows)}")

# replicate from_coo_host's numpy part
t0 = time.time()
rows = np.asarray(rows, np.int64)
cols = np.asarray(cols, np.int64)
vals = np.asarray(vals)
order = np.lexsort((cols, rows))
rows, cols, vals = rows[order], cols[order], vals[order]
key = rows * n + cols
head = np.ones(len(key), bool)
head[1:] = key[1:] != key[:-1]
seg = np.cumsum(head) - 1
totals = np.zeros(seg[-1] + 1, dtype=object)
np.add.at(totals, seg, vals.astype(np.uint64).astype(object))
totals = np.minimum(totals, (1 << 64) - 1).astype(np.uint64)
rows, cols = rows[head], cols[head]
keep = totals != 0
rows, cols, totals = rows[keep], cols[keep], totals[keep]
nnz = len(rows)
mark(f"host coo merge: {time.time()-t0:.2f}s nnz={nnz}")

cap = 1 << (nnz - 1).bit_length()
col_idx = np.full(cap, 2**31 - 1, np.int32)
col_idx[:nnz] = cols
row_ptr = np.zeros(n + 1, np.int64)
np.add.at(row_ptr, rows + 1, 1)
row_ptr = np.cumsum(row_ptr).astype(np.int32)
lo = (totals & 0xFFFFFFFF).astype(np.uint32)
hi = (totals >> 32).astype(np.uint32)
lo_pad = np.concatenate([lo, np.zeros(cap - nnz, np.uint32)])
hi_pad = np.concatenate([hi, np.zeros(cap - nnz, np.uint32)])

for name, arr in [("lo limb", lo_pad), ("hi limb", hi_pad),
                  ("col_idx", col_idx), ("row_ptr", row_ptr)]:
    t0 = time.time()
    x = jnp.asarray(arr)
    x.block_until_ready()
    mark(f"device_put {name} shape={arr.shape} dtype={arr.dtype}: "
         f"{time.time()-t0:.2f}s")

# scalar transfer (nnz field)
t0 = time.time()
s = jnp.asarray(np.int32(nnz))
s.block_until_ready()
mark(f"device_put scalar: {time.time()-t0:.2f}s")

# second round, fresh data same shapes (warm path)
for name, arr in [("lo limb#2", lo_pad + 1), ("col_idx#2", col_idx + 1)]:
    t0 = time.time()
    x = jnp.asarray(arr)
    x.block_until_ready()
    mark(f"device_put {name}: {time.time()-t0:.2f}s")

# novel shape transfer
t0 = time.time()
x = jnp.asarray(np.arange(123457, dtype=np.int32))
x.block_until_ready()
mark(f"device_put novel-shape int32 123457: {time.time()-t0:.2f}s")

# big dense transfer (the chain also ships a 27000x27000-ish f32 p0 in planes)
t0 = time.time()
big = np.zeros((27000 // 8, 8, 128 * 212), np.float32)  # ~1.1GB? no - keep small
mark("skip big")
mark("DONE")
