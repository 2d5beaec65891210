#!/bin/bash
# Focused finish of the round-4 sweep: the 27000-row cells (incl. the
# VERDICT's mid-band reference cell 27000x8) and the power-law case, with
# the kernels that matter (rowcat's 8M+ compiles priced out the full grid).
set -x
cd "$(dirname "$0")/.."
mkdir -p bench_out
timeout 5400 python -m sparsetpu.bench.spgemm_bench \
  --sides 27000 --e-per-n 2 8 32 --power-law-sides 27000 \
  --algos esc escb rowcat denseacc \
  --out bench_out/spgemm_sweep_r4_27k.csv 2>&1 | tail -30
echo MEASURE3_DONE
