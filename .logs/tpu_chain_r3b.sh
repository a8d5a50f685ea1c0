#!/bin/bash
# Chained chip jobs (one at a time): llama-134m spectrum -> 124M per-block
# layerwise sweep -> thick-restart converged eigenpairs at 124M.
cd /root/repo
W=/root/repo/.logs/tpu_watch.log

mkdir -p artifacts/llama134m_r3
timeout 5400 python -m hessian_llm_vision_tpu.cli.spectrum --model llama-134m \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
  --max_length 512 --lanczos_iters 20 --host_loop \
  --hvp_precision mixed --attn_block_q 512 --loss_chunk 512 \
  --out_spectrum artifacts/llama134m_r3/spec \
  --plot artifacts/llama134m_r3/density.png \
  > /root/repo/.logs/llama134m_r3.log 2>&1
echo "LLAMA JOB EXIT $? $(date -u)" >> "$W"

mkdir -p artifacts/layerwise_block_r3
timeout 5400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
  --max_length 512 --lanczos_iters 10 --layerwise --layerwise_group block \
  --host_loop --hvp_precision mixed --attn_block_q 512 --loss_chunk 512 \
  --out_spectrum artifacts/layerwise_block_r3/blk \
  --plot artifacts/layerwise_block_r3/grid.png \
  > /root/repo/.logs/layerwise_block_r3.log 2>&1
echo "BLOCK SWEEP EXIT $? $(date -u)" >> "$W"

mkdir -p artifacts/trlan124m_r3
timeout 5400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
  --max_length 512 --lanczos_iters 15 --thick_restart 5 --basis \
  --tr_dtype bfloat16 --tr_tol 2e-3 \
  --hvp_precision mixed --attn_block_q 512 --loss_chunk 512 \
  --out_spectrum artifacts/trlan124m_r3/spec \
  > /root/repo/.logs/trlan124m_r3.log 2>&1
echo "TRLAN EXIT $? $(date -u)" >> "$W"
