#!/bin/bash
# Round-5 phase 5: real-hardware guard escalation — guarded LanczosSGD
# STARTING FROM the sharpened Adam ckpt2000 (lambda_max ~1.9e6, where
# mixed/high fabricate extremes): the initial resolve must walk the
# ladder to blocks-X6, then train 100 guarded steps at the faithful tier.
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
set -x
for TRY in 1 2; do
  timeout 4800 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
    --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
    --attn_block_q 256 --loss_chunk 256 \
    --checkpoint artifacts/trained124m_r4/ckpt2000 \
    --optimiser lanczos-host --k 10 --delta 1e-4 --lr 1e-4 \
    --refresh_every 50 --refresh_batch_size 4 \
    --refresh_precision auto --precision_recheck 1 \
    --max_steps 100 --log_every 25 \
    --out artifacts/flagship_r5_guarded/from_ckpt2000 \
    > .logs/guarded_from_ckpt2000_try$TRY.log 2>&1
  RC=$?
  echo "R5 GUARDED-ESCALATION TRY$TRY EXIT $RC $(date -u)" >> "$W"
  [ $RC -eq 0 ] && break
done
echo "R5 PHASE5 DONE $(date -u)" >> "$W"
