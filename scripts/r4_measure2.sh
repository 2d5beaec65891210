#!/bin/bash
# Round-4 follow-up TPU probes: ESC phase accounting (mid-band doc),
# chain-kernel pipeline tuning.  Run after r4_measure.sh.
set -x
cd "$(dirname "$0")/.."
mkdir -p bench_out
# runtime A/B of the scan primitives at mid-band size (compile-time story
# is settled; the sweep hints the native path may RUN slower small)
for op in cumsum laxcumsum2d cumsum_L17 repeat; do
  timeout 300 python scripts/probe_compile.py $op 2.1e6 2>/dev/null | tail -1 \
    | tee -a bench_out/probe_runtime_r4.csv
done
timeout 2400 python scripts/probe_esc_phases.py 2>&1 | tee bench_out/probe_esc_phases.csv | tail -10
timeout 2400 python scripts/probe_chain_tune.py 2>&1 | tee bench_out/probe_chain_tune.csv | tail -10
echo MEASURE2_DONE
