#!/bin/bash
cd /root/repo
A=artifacts/trained124m_r4
mkdir -p $A
set -x
timeout 1800 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
  --attn_block_q 256 --loss_chunk 256 \
  --optimiser adam --lr 1e-3 --max_steps 1000 --log_every 50 \
  --save_state $A/state1000 --save_checkpoint $A/ckpt1000 \
  > .logs/train124m_r4_s1000.log 2>&1
echo "TRAIN1000 EXIT $?"
timeout 1800 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
  --attn_block_q 256 --loss_chunk 256 \
  --optimiser adam --lr 1e-3 --max_steps 2000 --log_every 50 \
  --resume_state $A/state1000 --save_checkpoint $A/ckpt2000 \
  > .logs/train124m_r4_s2000.log 2>&1
echo "TRAIN2000 EXIT $?"
