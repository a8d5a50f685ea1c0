#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
timeout 2400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint artifacts/trained124m_r3/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
  --hvp_precision high --kpm 60 --kpm_probes 2 --kpm_deflate 4 \
  --tr_dtype bfloat16 --tr_tol 2e-3 \
  --out_spectrum artifacts/trained124m_r3/spec_step2000_high_kpm \
  > .logs/spec124m_s2000_high_kpm.log 2>&1
echo "S2000_HIGH_KPM EXIT $? $(date -u)" >> "$W"
