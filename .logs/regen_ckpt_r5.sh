#!/bin/bash
# Round-5 (session 2): regenerate the trained-124M checkpoint instance.
# The container reset between round-5 sessions wiped the non-committed
# orbax checkpoints (artifacts/trained124m_r4/ckpt{1000,2000}); bench.py's
# trained-ckpt precision cross-check and every trained-landscape job need
# one on disk.  Same protocol as .logs/trained124m_run.sh (2000 Adam steps,
# byte-level local corpus, bs8/seq512).  Extremes are per-instance
# (documented provenance: top embedding spike moves ~20% between instances
# at matched loss) — the ladder verdicts and two-scale structure are not.
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
A=artifacts/trained124m_r4
mkdir -p $A
set -x
for TRY in 1 2 3; do
  timeout 1800 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
    --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
    --attn_block_q 256 --loss_chunk 256 \
    --optimiser adam --lr 1e-3 --max_steps 1000 --log_every 100 \
    --save_state $A/state1000 --save_checkpoint $A/ckpt1000 \
    > .logs/regen_train_s1000_try$TRY.log 2>&1
  RC=$?
  echo "R5 REGEN-TRAIN1000 TRY$TRY EXIT $RC $(date -u)" >> "$W"
  [ $RC -eq 0 ] && break
done
[ $RC -ne 0 ] && exit $RC
for TRY in 1 2 3; do
  timeout 1800 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
    --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
    --attn_block_q 256 --loss_chunk 256 \
    --optimiser adam --lr 1e-3 --max_steps 2000 --log_every 100 \
    --resume_state $A/state1000 --save_checkpoint $A/ckpt2000 \
    > .logs/regen_train_s2000_try$TRY.log 2>&1
  RC=$?
  echo "R5 REGEN-TRAIN2000 TRY$TRY EXIT $RC $(date -u)" >> "$W"
  [ $RC -eq 0 ] && break
done
echo "R5 REGEN DONE EXIT $RC $(date -u)" >> "$W"
exit $RC
