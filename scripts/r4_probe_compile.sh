#!/bin/bash
# Round-4 bisection of the sort-path compile ceiling (VERDICT r3 item 3).
# Runs each suspect op in a fresh process at sizes bracketing the measured
# ceiling (escb 2.45M ok / 5.8M stall).  Serialized: one TPU chip.
cd /root/repo
OUT=bench_out/probe_compile_r4.csv
mkdir -p bench_out
echo "op,n,compile_seconds,status" > $OUT
for n in 5.2e6; do
  for op in cumsum repeat sort sort1d lanescan lanemax scatter iscatter gather; do
    line=$(timeout 240 python scripts/probe_compile.py $op $n 2>/dev/null | tail -1)
    rc=$?
    if [ $rc -ne 0 ] || [ -z "$line" ]; then line="$op,$n,-1,timeout_or_err_rc$rc"; fi
    echo "$line" | tee -a $OUT
  done
done
# the full blocked-ESC program at bracketing sizes
for n in 2.6e6 5.2e6; do
  line=$(timeout 600 python scripts/probe_compile.py escb $n 2>/dev/null | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$line" ]; then line="escb,$n,-1,timeout_or_err_rc$rc"; fi
  echo "$line" | tee -a $OUT
done
echo DONE
