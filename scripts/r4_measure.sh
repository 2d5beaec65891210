#!/bin/bash
# Round-4 definitive TPU measurement batch at HEAD (post ceiling-removal +
# gather-pass reduction + narrow mode).  Serialized: one chip.
set -x
cd "$(dirname "$0")/.."
mkdir -p bench_out

# 1. headline chain — regression check (routes via the Pallas dense acc)
timeout 900 python bench.py 2>&1 | tail -12

# 2. mid-band sweep at HEAD
timeout 7200 python -m sparsetpu.bench.spgemm_bench \
  --sides 1000 3375 8000 27000 --e-per-n 2 8 32 \
  --algos esc escb rowcat denseacc \
  --out bench_out/spgemm_sweep_r4.csv 2>&1 | tail -60

# 3. real graphs: chains + algos + band hybrid (cora), chains (nell, ogbn)
timeout 3600 python -m sparsetpu.bench.real_graphs \
  --graphs cora --max-power 4 --algos --band-hybrid \
  --out bench_out/real_graphs_cora_r4.csv 2>&1 | tail -25
timeout 5400 python -m sparsetpu.bench.real_graphs \
  --graphs nell --max-power 3 --no-rcm \
  --out bench_out/real_graphs_nell_r4.csv 2>&1 | tail -15
timeout 5400 python -m sparsetpu.bench.real_graphs \
  --graphs ogbn_arxiv --max-power 2 --no-rcm \
  --out bench_out/real_graphs_ogbn_r4.csv 2>&1 | tail -15

# 4. fine tipover scans, configs 1-4 (config 0 committed in round 3)
timeout 5400 python -m sparsetpu.bench.tipover \
  --configs 1 2 3 4 --fine --out-dir bench_out 2>&1 | tail -30

echo MEASURE_DONE
