"""Warm-cache graph-algorithm timings on cora_pl (VERDICT r4 ask #3).

The cold numbers in real_graphs_r5.csv include one-time remote compiles
of the bucketed pattern programs; this probe re-runs each algorithm
twice in one process (first call loads the persistent cache, second is
pure runtime) and reports both — the per-step post-compile split the
verdict asked for."""

import sys
import time

sys.path.insert(0, ".")

from sparsetpu.bench import configure_cache

configure_cache()

import jax

from sparsetpu.bench.real_graphs import load_or_synthesize
from sparsetpu.csr import SparseCSR
from sparsetpu.graphs import algos
from sparsetpu.semiring import U64

OUT = open("bench_out/algos_warm.csv", "a")


def emit(row):
    print(row, flush=True)
    OUT.write(row + "\n")
    OUT.flush()


def main():
    emit(f"# probe_algos_warm start {time.strftime('%H:%M:%S')} "
         f"backend={jax.default_backend()}")
    label, coo = load_or_synthesize("cora", 2708, 10556)
    r, c, v, n = coo
    a = SparseCSR.from_coo_host(r, c, v, n, sr=U64)
    for name, fn in (
        ("diameter", lambda: algos.diameter(a, dense="always")),
        ("components_closure",
         lambda: int(algos.connected_components_closure(
             a, dense="always").max()) + 1),
        ("reachability", lambda: int(jax.device_get(
            algos.reachability_sum(a, pattern=True,
                                   dense="always")[0].nnz))),
        ("power_until_stable", lambda: algos.power_until_stable(
            a, pattern=True, dense="always")[1]),
    ):
        t0 = time.time()
        out1 = fn()
        t1 = time.time() - t0
        t0 = time.time()
        out2 = fn()
        t2 = time.time() - t0
        assert out1 == out2, (name, out1, out2)
        emit(f"{label},{name},cachewarm,{t1:.3f}s,hot,{t2:.3f}s,"
             f"result={out1}")
    emit("# probe_algos_warm done")


if __name__ == "__main__":
    main()
