#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
set -x
for TRY in 1 2; do
  timeout 4800 python examples/linearized_x6_probe.py artifacts/mfu_r5/linearized_x6.json \
    > .logs/linearized_x6_try$TRY.log 2>&1
  RC=$?
  echo "R5 LINEARIZED TRY$TRY EXIT $RC $(date -u)" >> "$W"
  [ $RC -eq 0 ] && break
done
# final bench (records BENCH-comparable numbers with this round's state)
timeout 4800 python bench.py > .logs/bench_r5.log 2>&1
echo "R5 BENCH EXIT $? $(date -u)" >> "$W"
echo "R5 PHASE4 DONE $(date -u)" >> "$W"
