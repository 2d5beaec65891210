#!/bin/bash
# Round-4 follow-up: blocked_scan named as the super-linear-compile op at
# 5.2M (cumsum/repeat/iscatter timeout; sort/scatter/gather/lanescan all
# ok).  Probe native lax.cumsum/cummax replacements (single HLO op) for
# compile AND runtime at bracketing sizes.
cd /root/repo
OUT=bench_out/probe_compile_r4b.csv
echo "op,n,compile_seconds,status" > $OUT
for n in 2.6e6 5.2e6 2.1e7 1.08e8; do
  for op in laxcumsum laxcummax laxcumsum2d; do
    line=$(timeout 240 python scripts/probe_compile.py $op $n 2>/dev/null | tail -1)
    rc=$?
    if [ $rc -ne 0 ] || [ -z "$line" ]; then line="$op,$n,-1,timeout_or_err_rc$rc"; fi
    echo "$line" | tee -a $OUT
  done
done
# bisect blocked_scan's wrapper: which op trips the backend
for n in 5.2e6; do
  for op in cumsum_noslice cumsum_nocarry cumsum_L17; do
    line=$(timeout 240 python scripts/probe_compile.py $op $n 2>/dev/null | tail -1)
    rc=$?
    if [ $rc -ne 0 ] || [ -z "$line" ]; then line="$op,$n,-1,timeout_or_err_rc$rc"; fi
    echo "$line" | tee -a $OUT
  done
done
# where exactly does blocked_scan's ceiling sit
for n in 3.2e6 4.2e6; do
  for op in cumsum; do
    line=$(timeout 240 python scripts/probe_compile.py $op $n 2>/dev/null | tail -1)
    rc=$?
    if [ $rc -ne 0 ] || [ -z "$line" ]; then line="$op,$n,-1,timeout_or_err_rc$rc"; fi
    echo "$line" | tee -a $OUT
  done
done
echo DONE
