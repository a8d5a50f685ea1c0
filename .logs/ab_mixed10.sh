#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
timeout 1200 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint artifacts/trained124m_r3/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 10 --host_loop --fused_iter \
  --hvp_precision mixed --out_spectrum /tmp/ab_mixed10 \
  > .logs/spec124m_s2000_mixed10.log 2>&1
echo "AB_MIXED10 EXIT $? $(date -u)" >> "$W"
