#!/bin/bash
# Trained-124M spectrum capstone: the reference's central workflow
# (train GPT-2, then gpt2_savehessian the checkpoint) end-to-end on one chip.
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
A=artifacts/trained124m_r3
mkdir -p $A
set -x
# Phase A1: 0 -> 1000 Adam steps on the real local byte-level corpus
timeout 1800 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
  --attn_block_q 256 --loss_chunk 256 \
  --optimiser adam --lr 1e-3 --max_steps 1000 --log_every 50 \
  --save_state $A/state1000 --save_checkpoint $A/ckpt1000 \
  > .logs/train124m_s1000.log 2>&1
echo "TRAIN1000 EXIT $? $(date -u)" >> "$W"
# Phase A2: resume 1000 -> 2000
timeout 1800 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
  --attn_block_q 256 --loss_chunk 256 \
  --optimiser adam --lr 1e-3 --max_steps 2000 --log_every 50 \
  --resume_state $A/state1000 --save_checkpoint $A/ckpt2000 \
  > .logs/train124m_s2000.log 2>&1
echo "TRAIN2000 EXIT $? $(date -u)" >> "$W"
# Phase B1: SLQ spectrum at step 1000 (fused host loop, real-text batches)
timeout 2400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $A/ckpt1000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
  --hvp_precision mixed --out_spectrum $A/spec_step1000 \
  > .logs/spec124m_s1000.log 2>&1
echo "SPEC1000 EXIT $? $(date -u)" >> "$W"
# Phase B2: deflated-KPM density at step 2000 (exact outlier spikes + bulk)
timeout 2400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $A/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
  --hvp_precision mixed --kpm 60 --kpm_probes 2 --kpm_deflate 4 \
  --tr_dtype bfloat16 --tr_tol 2e-3 --out_spectrum $A/spec_step2000 \
  > .logs/spec124m_s2000.log 2>&1
echo "SPEC2000 EXIT $? $(date -u)" >> "$W"
