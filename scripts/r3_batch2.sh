#!/bin/bash
# Round-3 TPU measurement batch, part 2: the stages the first batch did not
# reach (it was cut at stage 3).  Sequential, per-stage timeouts, a failure
# moves on.  Logs land in bench_out/, artifacts committed after inspection.
set -u
cd /root/repo
mkdir -p bench_out
log() { echo "=== [$(date +%H:%M:%S)] $*" ; }

log stage3: fine tipover config 0
timeout 3600 python -m sparsetpu.bench.tipover --fine --configs 0 \
  --out-dir bench_out 2>&1 | tail -30

log stage4: escb general-sparse chain at 30^3
timeout 3600 python bench.py --algo escb --no-verify \
  --csv bench_out/chain_escb_r3.csv 2>&1 | tail -12

log stage5: full spgemm sweep grid
timeout 14000 python -m sparsetpu.bench.spgemm_bench \
  --algos esc escb rowcat denseacc bcoo \
  --out bench_out/spgemm_sweep_full.csv 2>&1 | tail -80

log stage6: real-graph-scale bench
timeout 7200 python -m sparsetpu.bench.real_graphs \
  --out bench_out/real_graphs.csv 2>&1 | tail -40

log stage7: engine_bench rerun with jit-cached tiers
timeout 2400 python -m sparsetpu.bench.engine_bench \
  --out bench_out/engine_bench.csv 2>&1 | tail -20

log batch done
