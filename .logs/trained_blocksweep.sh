#!/bin/bash
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
mkdir -p artifacts/trained124m_r3/blocks
timeout 2400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint artifacts/trained124m_r3/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
  --max_length 512 --lanczos_iters 10 --layerwise \
  --group_regex '(h_\d+|wte|wpe|ln_f)' \
  --host_loop --hvp_precision high --attn_block_q 512 --loss_chunk 512 \
  --out_spectrum artifacts/trained124m_r3/blocks/blk \
  --plot artifacts/trained124m_r3/blocks/grid.png \
  > .logs/trained_blocksweep.log 2>&1
echo "TRAINED_BLOCKSWEEP EXIT $? $(date -u)" >> "$W"
