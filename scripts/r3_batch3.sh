#!/bin/bash
# Round-3 TPU measurement batch, part 3: (a) the sweep grid WITHOUT the
# bcoo column — the library's sparse-sparse compile hung >49 min on the
# 3375x8 cell and would have burned the whole stage budget (bcoo cells for
# the small sizes are already recorded in spgemm_sweep_full.csv and
# reports/spgemm_bcoo.csv); (b) the MXU-vs-VPU chain kernel A/B; (c) the
# btree-vs-binary lookup A/B.
set -u
cd /root/repo
mkdir -p bench_out
log() { echo "=== [$(date +%H:%M:%S)] $*" ; }

log stage8: spgemm sweep grid, no bcoo
timeout 10000 python -m sparsetpu.bench.spgemm_bench \
  --algos esc escb rowcat denseacc \
  --out bench_out/spgemm_sweep_nobcoo.csv 2>&1 | tail -80

log stage9: MXU vs VPU chain kernel A/B
timeout 3600 python scripts/probe_spmm_mxu.py 2>&1 | tail -30

log stage10: btree16 vs binary lookup A/B
timeout 2400 python scripts/probe_btree.py 2>&1 | tail -20

log stage11: real graphs, no RCM pass (host BFS took 3.3 min on cora and
# wedged 30+ min on nell in stage6; structure analysis minus RCM is fast)
timeout 7200 python -m sparsetpu.bench.real_graphs --no-rcm \
  --out bench_out/real_graphs.csv 2>&1 | tail -40

log stage12: engine_bench with symmetric per-call/fused comparators
timeout 2400 python -m sparsetpu.bench.engine_bench \
  --out bench_out/engine_bench.csv 2>&1 | tail -20

log batch3 done
