#!/bin/bash
# Round-4 reruns with the peak-aware panel budget: nell A^2-A^3 (A^3
# previously RESOURCE_EXHAUSTED) and cora algos + band hybrid (previously
# crashed in the un-caught JaxRuntimeError path).
set -x
cd "$(dirname "$0")/.."
mkdir -p bench_out
timeout 4800 python -m sparsetpu.bench.real_graphs \
  --graphs nell --max-power 3 --no-rcm \
  --out bench_out/real_graphs_nell_r4b.csv 2>&1 | tail -12
timeout 3600 python -m sparsetpu.bench.real_graphs \
  --graphs cora --max-power 4 --algos --band-hybrid \
  --out bench_out/real_graphs_cora_r4b.csv 2>&1 | tail -20
echo MEASURE4_DONE
