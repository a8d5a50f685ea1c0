#!/bin/bash
# Chained chip job #3: after the 124M per-block sweep, compute k=5 CONVERGED
# extremal eigenpairs of the GPT-2 124M Hessian by thick-restart Lanczos
# (bf16-stored 15-vector buffer; beyond the reference's one-pass bases).
cd /root/repo
for i in $(seq 1 260); do
  if grep -q "BLOCK SWEEP EXIT" /root/repo/.logs/tpu_watch.log 2>/dev/null; then
    mkdir -p artifacts/trlan124m_r3
    timeout 5400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
      --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
      --max_length 512 --lanczos_iters 15 --thick_restart 5 --basis \
      --tr_dtype bfloat16 --tr_tol 2e-3 \
      --hvp_precision mixed --attn_block_q 512 --loss_chunk 512 \
      --out_spectrum artifacts/trlan124m_r3/spec \
      > /root/repo/.logs/trlan124m_r3.log 2>&1
    echo "TRLAN EXIT $? $(date -u)" >> /root/repo/.logs/tpu_watch.log
    exit 0
  fi
  sleep 180
done
echo "queue3: block sweep never finished in window $(date -u)" >> /root/repo/.logs/tpu_watch.log
exit 1
