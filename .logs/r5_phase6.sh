#!/bin/bash
# Round-5 phase 6: the VERDICT r4 #2 done-criterion measured directly —
# the 35-iter trained-ckpt spectrum at the unchanged certification
# (auto -> blocks-X6, plan reused, zero probe HVPs), target <= 220 s.
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
set -x
for TRY in 1 2; do
  timeout 3600 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
    --checkpoint artifacts/trained124m_r4/ckpt2000 \
    --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
    --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
    --hvp_precision auto \
    --out_spectrum artifacts/trained124m_r5/spec_step2000_35iter_timed \
    > .logs/spec35_timed_try$TRY.log 2>&1
  RC=$?
  echo "R5 SPEC35-TIMED TRY$TRY EXIT $RC $(date -u)" >> "$W"
  [ $RC -eq 0 ] && break
done
echo "R5 PHASE6 DONE $(date -u)" >> "$W"
