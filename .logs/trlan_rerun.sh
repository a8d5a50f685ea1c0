#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
mkdir -p artifacts/trlan124m_r3
timeout 5400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
  --max_length 512 --lanczos_iters 15 --thick_restart 5 --basis \
  --tr_dtype bfloat16 --tr_tol 2e-3 \
  --hvp_precision mixed --attn_block_q 512 --loss_chunk 512 \
  --out_spectrum artifacts/trlan124m_r3/spec \
  > /root/repo/.logs/trlan124m_r3.log 2>&1
echo "TRLAN EXIT $? $(date -u)" >> "$W"
