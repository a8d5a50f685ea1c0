#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
timeout 5400 python -m hessian_llm_vision_tpu.cli.spectrum --model pythia-1.4b \
  --host_loop --bigmodel --bigmodel_q bfloat16 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 1 \
  --max_length 256 --lanczos_iters 45 \
  --attn_block_q 64 --loss_chunk 64 --vector_seed 997 \
  --t_checkpoint artifacts/pythia1p4b_r3/T45.npz \
  --out_spectrum artifacts/pythia1p4b_r3/spectrum45 \
  > /root/repo/.logs/pythia1p4b_45.log 2>&1
echo "PYTHIA45 EXIT $? $(date -u)" >> "$W"
