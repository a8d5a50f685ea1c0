#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
timeout 1500 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint artifacts/trained124m_r3/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 1 --host_loop --fused_iter \
  --hvp_precision mixed --precision_check \
  > .logs/prec_check_trained2.log 2>&1
echo "PRECCHECK2_TRAINED EXIT $? $(date -u)" >> "$W"
timeout 900 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --dataset random --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 1 --host_loop --fused_iter \
  --hvp_precision mixed --precision_check \
  > .logs/prec_check_init2.log 2>&1
echo "PRECCHECK2_INIT EXIT $? $(date -u)" >> "$W"
