#!/bin/bash
# Round-4 TPU validation of the compile-ceiling fix (native cumulative ops
# replacing associative scans).  Serialized: one chip.
set -x
cd /root/repo
mkdir -p bench_out

# 1. the blocked-ESC program at sizes that stalled the old formulation
#    (escb 2.6M timed out at 600 s pre-fix; 5.8M stalled >40 min in r3)
for n in 2.6e6 5.2e6 2.1e7; do
  timeout 900 python scripts/probe_compile.py escb $n 2>/dev/null | tail -1 \
    | tee -a bench_out/probe_escb_r4.csv
done

# 2. mid-band sweep with lifted guards (esc/escb/rowcat/denseacc)
timeout 5400 python -m sparsetpu.bench.spgemm_bench \
  --sides 1000 3375 8000 27000 --e-per-n 2 8 32 \
  --algos esc escb rowcat denseacc \
  --out bench_out/spgemm_sweep_r4.csv 2>&1 | tail -60

# 3. real graphs: cora + nell chains (escb now covers nell A^2's 14.6M
#    products; denseacc_tiled rebuilt) + algo timings
timeout 5400 python -m sparsetpu.bench.real_graphs \
  --graphs cora nell --max-power 4 --algos --no-rcm \
  --out bench_out/real_graphs_r4.csv 2>&1 | tail -40

echo VALIDATE_DONE
