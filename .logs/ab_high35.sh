#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
timeout 1500 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint artifacts/trained124m_r3/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
  --hvp_precision high --out_spectrum artifacts/trained124m_r3/spec_step2000_high \
  > .logs/spec124m_s2000_high35.log 2>&1
echo "AB_HIGH35 EXIT $? $(date -u)" >> "$W"
timeout 1500 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint artifacts/trained124m_r3/ckpt1000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
  --hvp_precision high --out_spectrum artifacts/trained124m_r3/spec_step1000_high \
  > .logs/spec124m_s1000_high35.log 2>&1
echo "AB1000_HIGH35 EXIT $? $(date -u)" >> "$W"
