#!/bin/bash
# Round-4 follow-up TPU probes: ESC phase accounting (mid-band doc),
# chain-kernel pipeline tuning.  Run after r4_measure.sh.
set -x
cd "$(dirname "$0")/.."
mkdir -p bench_out
timeout 2400 python scripts/probe_esc_phases.py 2>&1 | tee bench_out/probe_esc_phases.csv | tail -10
timeout 2400 python scripts/probe_chain_tune.py 2>&1 | tee bench_out/probe_chain_tune.csv | tail -10
echo MEASURE2_DONE
