#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
set -x
timeout 4800 python examples/linearized_x6_probe.py artifacts/mfu_r5/linearized_x6.json \
  > .logs/linearized_x6_v2.log 2>&1
echo "R5 LINEARIZED-V2 EXIT $? $(date -u)" >> "$W"
echo "R5 PHASE7 DONE $(date -u)" >> "$W"
