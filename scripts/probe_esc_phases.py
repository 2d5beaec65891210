"""Pass accounting of the ESC SpGEMM pipeline at the mid-band reference
cell (er-27000x8, ~1.7M products): time expansion, sort+merge (COO->CSR),
and the full kernel, wide vs narrow — the measured basis for the
SPGEMM_APPROACHES.md mid-band section.

Emits CSV: phase,mode,ms,ns_per_product
"""

import sys
import time

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax
import jax.numpy as jnp
import numpy as np

from sparsetpu.csr import SparseCSR
from sparsetpu.graphs.generate import random_graph
from sparsetpu.ops import spgemm as sg


def timed(fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n, epn = 27000, 8
    coo = random_graph(n, n * epn, seed=n + epn)
    a = SparseCSR.from_coo_host(*coo)
    flops = sg.symbolic_flops_exact(a, a)
    cap = 1 << (flops - 1).bit_length()
    print(f"# n={n} nnz={int(a.nnz)} flops={flops} cap={cap}", flush=True)
    print("phase,mode,ms,ns_per_product", flush=True)

    for narrow in (False, True):
        mode = "narrow" if narrow else "wide"

        expand = jax.jit(lambda: sg.expand_products(a, a, cap,
                                                    narrow=narrow)[:3])
        t = timed(expand)
        print(f"expand,{mode},{t*1e3:.2f},{t/flops*1e9:.0f}", flush=True)

        i, j, v, valid_e, _ = sg.expand_products(a, a, cap, narrow=narrow)
        i, j = jax.block_until_ready((i, j))

        merge = jax.jit(lambda: SparseCSR.from_coo_device(
            i, j, v, n, n, a.sr, cap, valid=valid_e).nnz)
        t = timed(merge)
        print(f"coo2csr,{mode},{t*1e3:.2f},{t/flops*1e9:.0f}", flush=True)

        full = jax.jit(lambda: sg.spgemm(a, a, cap, narrow=narrow).nnz)
        t = timed(full)
        print(f"full,{mode},{t*1e3:.2f},{t/flops*1e9:.0f}", flush=True)


if __name__ == "__main__":
    main()
