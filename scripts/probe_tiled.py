"""Phase profile of spgemm_dense_acc_tiled at nell scale (65k power-law)."""
import time
import sys; sys.path.insert(0, "/root/repo")
import numpy as np

from sparsetpu.bench import configure_cache
configure_cache()

import jax
import jax.numpy as jnp
from sparsetpu.csr import SparseCSR
from sparsetpu.graphs import datasets
from sparsetpu.semiring import U64
from sparsetpu.kernels import spmm_pallas as sp
from sparsetpu.ops import denseacc as da

n, m = 65755, 251550
coo = datasets.power_law(n, max(1, round(m / n)), seed=hash("nell") % (1 << 31))
r, c, v, nn = coo
a = SparseCSR.from_coo_host(r, c, v, nn, sr=U64)
print("nnz(a)=", int(a.nnz), flush=True)

W = 8192
t0 = time.perf_counter()
cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
    a, rows_per_tile=8, n_cols_p=W, pad_rows=True)
jax.block_until_ready(vals)
print(f"tile_sparse_operand: {time.perf_counter()-t0:.2f}s  e_max={cols.shape[2]} t={cols.shape[0]}", flush=True)

# warm one full call
t0 = time.perf_counter()
out = da.spgemm_dense_acc_tiled(a, a, panel_cols=W)
jax.block_until_ready(out.nnz)
print(f"full call (cold): {time.perf_counter()-t0:.2f}s nnz={int(out.nnz)}", flush=True)

t0 = time.perf_counter()
out = da.spgemm_dense_acc_tiled(a, a, panel_cols=W)
jax.block_until_ready(out.nnz)
print(f"full call (warm): {time.perf_counter()-t0:.2f}s", flush=True)

# phase timing inside one warm call
t0 = time.perf_counter()
cnt, cols, lrow, vals, meta = sp.tile_sparse_operand(
    a, rows_per_tile=8, n_cols_p=W, pad_rows=True)
jax.block_until_ready(vals)
t_prep = time.perf_counter() - t0
print(f"prep: {t_prep:.2f}s", flush=True)

for pi in range(3):
    t0 = time.perf_counter()
    dense, exact, nnzp = da._panel_numeric(
        cnt, cols, lrow, vals, a, jnp.int32(pi * W), 8, n, W)
    jax.block_until_ready(dense)
    t_num = time.perf_counter() - t0
    t0 = time.perf_counter()
    nz = int(nnzp)
    cap_p = 1 << (max(nz, 1) - 1).bit_length()
    csr_p = da._pack_panel(dense, cap_p)
    jax.block_until_ready(csr_p.col_idx)
    t_pack = time.perf_counter() - t0
    print(f"panel {pi}: numeric={t_num*1e3:.0f}ms pack={t_pack*1e3:.0f}ms nnz={nz}", flush=True)
