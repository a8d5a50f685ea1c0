#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
mkdir -p artifacts/longctx_r3
timeout 4500 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 2 \
  --max_length 2048 --lanczos_iters 20 --host_loop --fused_iter \
  --hvp_precision mixed --attn_block_q 256 --loss_chunk 256 \
  --out_spectrum artifacts/longctx_r3/spec \
  > /root/repo/.logs/longctx_r3.log 2>&1
echo "LONGCTX EXIT $? $(date -u)" >> "$W"
