"""Pod scaling-efficiency model for the A^2..A^7 chain (VERDICT r5 ask #7).

Round 4 proved the ring-panel SpGEMM's collective-permutes are scheduled
async and overlapped with local compute (reports/ring_overlap_hlo.txt),
but only at toy shapes, and the BASELINE >=80% host->pod target remained
an IOU.  This script turns the proof into a prediction:

  1. AOT-compile dist/panels.spgemm_panels on a compile-only v5e:2x4
     topology at REAL chain-step shard shapes (n=27000 row-partitioned
     over 8 chips, capacities from the measured per-step nnz/flops);
  2. extract the per-ring-step collective-permute BYTE volume from the
     optimized HLO (operand shapes of collective-permute-start in the
     while body, x ND ring steps);
  3. combine with (a) measured single-chip sort-path throughput and
     (b) the public v5e ICI figure to predict per-step compute vs comm
     time under full overlap (max, not sum — the overlap is the proven
     part), with the measured row-partition work imbalance as the
     compute-side penalty.

Efficiency(step) = T_1chip / (8 * T_shard) where
  T_shard = max(T_1chip/8 * imbalance, T_comm_ring).

Writes reports/scaling_model.csv and prints the verdict: at which nnz the
>=80% target holds on compute-bound steps and where comm would bind.

Constants (documented, no egress to re-verify):
  ICI_BW: one-way per-link ICI bandwidth, TPU v5e: 1600 Gbps/chip
  aggregate across 4 links => ~50 GB/s per link one-way; the ring uses
  one link per direction, so 4.5e10 B/s is the conservative figure used.
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
ICI_BW = 4.5e10          # B/s one-way per link (v5e, conservative)
IMBALANCE = 1.07         # measured max/mean shard work (scaling_virtual8)

# measured single-chip chain-step times (seconds) on the v5e, round 5
# (bench_out/probe_slab.csv "chain" rows): the SLAB sort-path kernel —
# the same expand/sort algorithm family the ring-panel shard distributes,
# so T_1chip/T_shard compare like with like.  (The single-chip HEADLINE
# uses the dense-accumulator DMA kernel, which shards by the same row
# partition but does not ring-exchange panels; its model would be
# trivially compute-bound at the same imbalance.)
MEASURED = {
    2: (248957, 314066, 0.03915, "slab"),
    3: (645695, 938569, 0.10998, "slab"),
    4: (1544375, 2452943, 0.30342, "slab"),
    5: (3310002, 5752273, 0.93555, "slab"),
    6: (6448685, 12130476, 1.92900, "slab"),
    7: (11493935, 23197725, 4.28974, "slab"),
}


def _pow2(x):
    return 1 << (max(int(x), 1) - 1).bit_length()


def build_topology():
    from jax.experimental import topologies

    return topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4",
        chips_per_host_bounds=(2, 4, 1), num_slices=1)


def compile_step(topo, n, nnz_prev, nnz_a, flops):
    """AOT-compile one chain step C = P x A at its real shard shapes."""
    mesh = Mesh(np.array(topo.devices).reshape(ND), (AXIS,))
    n_local = -(-n // ND)

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(
            shape, dt, sharding=NamedSharding(mesh, P(AXIS)))

    def shard(capacity):
        return ShardedCSR(
            row_ptr=sds((ND, n_local + 1), jnp.int32),
            col_idx=sds((ND, capacity), jnp.int32),
            values=(sds((ND, capacity), jnp.uint32),
                    sds((ND, capacity), jnp.uint32)),
            nnz=sds((ND,), jnp.int32),
            n_rows=n, n_cols=n, sr_name="u64", n_local=n_local,
        )

    cap_p = _pow2(-(-nnz_prev // ND) * 2)     # 2x headroom, as real runs
    cap_a = _pow2(-(-nnz_a // ND) * 2)
    step_cap = _pow2(-(-flops // (ND * ND)) * 2)
    out_cap = _pow2(-(-flops // ND))
    p = shard(cap_p)
    a = shard(cap_a)
    fn = jax.jit(lambda x, y: panels.spgemm_panels(
        x, y, step_cap=step_cap, out_cap=out_cap, mesh=mesh))
    return fn.lower(p, a).compile(), cap_a


def permute_bytes(hlo: str) -> int:
    """Sum the operand bytes of every collective-permute-start in the
    while body (= bytes moved per ring step per chip)."""
    sizes = {"u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8, "pred": 1,
             "u8": 1, "s8": 1, "bf16": 2, "u16": 2, "s16": 2}
    total = 0
    for m in re.finditer(
            r"collective-permute-start\(([^)]*)\)", hlo):
        pass
    # operand shapes appear in the op's result tuple type; parse the
    # start op lines instead: "(u32[16384], u32[16384], ...) ...start"
    for ln in hlo.splitlines():
        if "collective-permute-start" not in ln or "= " not in ln:
            continue
        lhs = ln.split("= ")[0]
        # operand types: take the argument list's shapes
        args = re.findall(r"\b([a-z]+\d*)\[([\d,]*)\]", ln.split("= ")[1])
        # the start op lists (operand) then result aliases; operands are
        # inside the (...) call — restrict to the call parentheses
        call = re.search(r"collective-permute-start\((.*?)\)", ln)
        shapes = re.findall(r"\b([a-z]+\d*)\[([\d,]*)\]",
                            call.group(1)) if call else args
        if not shapes:
            # operands given as %names: fall back to the result tuple's
            # FIRST half (start returns (in, out, ...) aliases)
            res = re.search(r"^\s*%?[\w.\-]+ = \((.*?)\) collective",
                            ln)
            if res:
                shapes = re.findall(r"\b([a-z]+\d*)\[([\d,]*)\]",
                                    res.group(1))
                shapes = shapes[: len(shapes) // 2]
        for dt, dims in shapes:
            if dt not in sizes:
                continue
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            total += elems * sizes[dt]
    return total


def main():
    topo = build_topology()
    os.makedirs("reports", exist_ok=True)
    rows = ["step,nnz_out,flops,bytes_per_ring_step,t_comm_s,"
            "t_1chip_s,t_shard_s,pred_efficiency,binding"]
    nnz_prev = 80882
    nnz_a = 80882
    for step in sorted(MEASURED):
        nnz_out, flops, t1, kern = MEASURED[step]
        compiled, cap_a = compile_step(topo, 27000, nnz_prev, nnz_a, flops)
        hlo = compiled.as_text()
        b_step = permute_bytes(hlo)
        t_comm = ND * b_step / ICI_BW
        if t1 is None:
            line = (f"{step},{nnz_out},{flops},{b_step},{t_comm:.6f},"
                    f"NA,NA,NA,need_t1chip")
        else:
            t_shard = max(t1 / ND * IMBALANCE, t_comm)
            eff = t1 / (ND * t_shard)
            binding = "compute" if t1 / ND * IMBALANCE >= t_comm else "comm"
            line = (f"{step},{nnz_out},{flops},{b_step},{t_comm:.6f},"
                    f"{t1:.6f},{t_shard:.6f},{eff:.4f},{binding}")
        rows.append(line)
        print(line, flush=True)
        nnz_prev = nnz_out
    with open("reports/scaling_model.csv", "w") as f:
        f.write("\n".join(rows) + "\n")
    print("wrote reports/scaling_model.csv")


if __name__ == "__main__":
    main()
