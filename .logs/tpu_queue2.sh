#!/bin/bash
# Chained chip job: wait for the llama-134m watcher job to finish, then run
# the 124M per-block layerwise sweep (visual-eigen.ipynb cells 12-13 at the
# reference's own scale). ONE TPU job at a time.
cd /root/repo
for i in $(seq 1 200); do
  if grep -q "LLAMA JOB EXIT" /root/repo/.logs/tpu_watch.log 2>/dev/null; then
    mkdir -p artifacts/layerwise_block_r3
    timeout 4500 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
      --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
      --max_length 512 --lanczos_iters 10 --layerwise --layerwise_group block \
      --host_loop --hvp_precision mixed --attn_block_q 512 --loss_chunk 512 \
      --out_spectrum artifacts/layerwise_block_r3/blk \
      --plot artifacts/layerwise_block_r3/grid.png \
      > /root/repo/.logs/layerwise_block_r3.log 2>&1
    echo "BLOCK SWEEP EXIT $? $(date -u)" >> /root/repo/.logs/tpu_watch.log
    exit 0
  fi
  sleep 180
done
echo "queue2: llama job never finished in window $(date -u)" >> /root/repo/.logs/tpu_watch.log
exit 1
