#!/bin/bash
# Round-3 TPU measurement batch, part 4: the stages cut from part 3 after
# the MXU A/B was prioritized — sweep with sort-path compile guards, btree
# lookup A/B, real graphs (no RCM), engine_bench with symmetric timing.
set -u
cd /root/repo
mkdir -p bench_out
log() { echo "=== [$(date +%H:%M:%S)] $*" ; }

log stage8b: spgemm sweep grid, sort paths guarded at 2.6M products
timeout 10000 python -m sparsetpu.bench.spgemm_bench \
  --algos esc escb rowcat denseacc \
  --out bench_out/spgemm_sweep_nobcoo.csv 2>&1 | tail -90

log stage10: btree16 vs binary lookup A/B
timeout 2400 python scripts/probe_btree.py 2>&1 | tail -20

log stage11: real graphs, no RCM pass
timeout 7200 python -m sparsetpu.bench.real_graphs --no-rcm \
  --out bench_out/real_graphs.csv 2>&1 | tail -40

log stage12: engine_bench with symmetric per-call/fused comparators
timeout 2400 python -m sparsetpu.bench.engine_bench \
  --out bench_out/engine_bench.csv 2>&1 | tail -20

log batch4 done
