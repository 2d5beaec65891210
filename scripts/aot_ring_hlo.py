"""AOT-compile the ring-panel SpGEMM for a multi-chip TPU topology and
verify, at the optimized-HLO level, that the panel rotation is ASYNC and
overlapped with local compute — without any multi-chip hardware.

dist/panels.py claims XLA:TPU lowers the ring's ``ppermute`` to
``collective-permute-(start|done)`` pairs that the latency-hiding scheduler
separates with independent local work (the expansion against the held
panel).  The XLA:CPU virtual mesh cannot show this (it lowers ppermute
synchronously), so this is the one claim round 3 could not evidence.  Here
we build a compile-only v5e:2x4 PJRT topology (jax.experimental.topologies
— no chips needed), AOT-compile ``spgemm_panels`` against it, and inspect
the scheduled module: for each start/done pair, count real compute ops
(fusions/sorts) scheduled between them.

Writes reports/ring_overlap_hlo.txt (summary + the while-body schedule
excerpt) and prints PASS/FAIL.  The same check runs as a unit test
(tests/test_ring_hlo.py) so a regression that serializes the ring fails CI.
"""

import os
import re
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparsetpu.dist.shard import AXIS, ShardedCSR  # noqa: E402
from sparsetpu.dist import panels  # noqa: E402

ND = 8


def build_topology():
    from jax.experimental import topologies

    return topologies.get_topology_desc(
        platform="tpu",
        topology_name="v5e:2x4",
        chips_per_host_bounds=(2, 4, 1),
        num_slices=1,
    )


def compile_ring(topo, n_local=64, cap=512, nlb=64, capb=512,
                 step_cap=1024, out_cap=8192):
    mesh = Mesh(np.array(topo.devices).reshape(ND), (AXIS,))

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(
            shape, dt, sharding=NamedSharding(mesh, P(AXIS)))

    def shard(n_loc, capacity, n_rows, n_cols):
        return ShardedCSR(
            row_ptr=sds((ND, n_loc + 1), jnp.int32),
            col_idx=sds((ND, capacity), jnp.int32),
            values=(sds((ND, capacity), jnp.uint32),
                    sds((ND, capacity), jnp.uint32)),
            nnz=sds((ND,), jnp.int32),
            n_rows=n_rows, n_cols=n_cols, sr_name="u64", n_local=n_loc,
        )

    a = shard(n_local, cap, ND * n_local, ND * nlb)
    b = shard(nlb, capb, ND * nlb, ND * nlb)
    fn = jax.jit(lambda x, y: panels.spgemm_panels(
        x, y, step_cap=step_cap, out_cap=out_cap, mesh=mesh))
    return fn.lower(a, b).compile()


def analyze(hlo: str):
    """Per collective-permute-start: count compute ops (fusion/sort/scatter/
    gather calls) scheduled between it and its matching -done in the same
    computation.  HLO module text lists ops in schedule order."""
    pairs = []
    for block in hlo.split("\n\n"):  # computations are blank-line separated
        lines = block.splitlines()
        opens = {}  # ssa name -> (line index, op line)
        for i, ln in enumerate(lines):
            m = re.match(r"\s*(%?[\w.\-]+) = .*collective-permute-start", ln)
            if m:
                opens[m.group(1)] = i
            m2 = re.search(
                r"collective-permute-done\(([^)]+)\)", ln)
            if m2:
                src = m2.group(1).strip()
                if src in opens:
                    start_i = opens.pop(src)
                    between = lines[start_i + 1:i]
                    compute = [
                        b for b in between
                        if re.search(r"= .*(fusion|sort|scatter|gather|"
                                     r"dynamic-update-slice|reduce)\(", b)
                    ]
                    pairs.append((src, len(between), len(compute)))
    return pairs


def main():
    topo = build_topology()
    compiled = compile_ring(topo)
    hlo = compiled.as_text()
    n_start = hlo.count("collective-permute-start")
    pairs = analyze(hlo)
    overlapped = [p for p in pairs if p[2] > 0]
    ok = len(pairs) > 0 and len(overlapped) > 0
    os.makedirs("reports", exist_ok=True)
    with open("reports/ring_overlap_hlo.txt", "w") as f:
        f.write(
            "# AOT v5e:2x4 topology compile of dist/panels.spgemm_panels\n"
            f"# collective-permute-start mentions: {n_start}\n"
            f"# start/done pairs found: {len(pairs)}\n"
            f"# pairs with >=1 compute op scheduled between start and done: "
            f"{len(overlapped)}\n"
            "# (pair, ops_between, compute_ops_between):\n")
        for p in pairs:
            f.write(f"#   {p}\n")
        f.write("\n# while-body schedule excerpt (permute +/- 3 lines):\n")
        for block in hlo.split("\n\n"):
            if "collective-permute-start" not in block:
                continue
            lines = block.splitlines()
            keep = set()
            for i, ln in enumerate(lines):
                if "collective-permute" in ln:
                    keep.update(range(max(0, i - 3),
                                      min(len(lines), i + 4)))
            for i in sorted(keep):
                f.write(lines[i][:200] + "\n")
            break
    print(f"pairs={len(pairs)} overlapped={len(overlapped)} "
          f"{'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
