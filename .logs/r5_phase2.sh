#!/bin/bash
# Round-5 phase 2 (runs after trained124m_r5.sh drains):
# 1) discriminate the lambda_max disagreement (r4 trlan 1.5702e6 vs r5
#    kpm-deflate 1.8797e6, both "converged"): two independent-seed
#    tight-tol thick-restart runs at the faithful tier;
# 2) the flagship guarded A/B (VERDICT r4 #3): 1000-step lanczos-host
#    with --refresh_precision auto + periodic/growth re-probes.
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
A=artifacts/trained124m_r5
CK=artifacts/trained124m_r4
set -x
# re-run the block sweep (failed on the old --block_precision choices list)
timeout 7200 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $CK/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
  --max_length 512 --lanczos_iters 10 --layerwise \
  --group_regex '(h_\d+|wte|wpe|ln_f)' \
  --host_loop --hvp_precision high --block_precision BF16_BF16_F32_X6 \
  --attn_block_q 512 --loss_chunk 512 \
  --out_spectrum $A/blocks/blk --plot $A/blocks/grid.png \
  > .logs/blocksweep_r5b.log 2>&1
echo "R5B-RETRY BLOCKSWEEP EXIT $? $(date -u)" >> "$W"
# re-run the persisted-plan reuse proof (hung in a wedged tunnel compile)
timeout 2400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $CK/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 5 --host_loop --fused_iter \
  --hvp_precision auto --out_spectrum $A/spec_step2000_reuse \
  > .logs/spec124m_r5_s2000_reuse2.log 2>&1
echo "R5A2-RETRY REUSE EXIT $? $(date -u)" >> "$W"
timeout 2400 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $CK/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 5 --host_loop --fused_iter \
  --hvp_precision auto --out_spectrum $A/spec_step2000_reuse_b \
  > .logs/spec124m_r5_s2000_reuse3.log 2>&1
echo "R5A2-RETRY REUSE-HIT EXIT $? $(date -u)" >> "$W"
for SEED in 997 1999; do
  timeout 4800 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
    --checkpoint $CK/ckpt2000 \
    --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
    --max_length 512 --lanczos_iters 12 --thick_restart 4 --tr_which both \
    --tr_dtype bfloat16 --tr_tol 2e-4 --vector_seed $SEED \
    --hvp_precision high --block_precision BF16_BF16_F32_X6 \
    --out_spectrum $A/trlan2000_x6_seed$SEED \
    > .logs/trlan_r5_seed$SEED.log 2>&1
  echo "R5 TRLAN seed=$SEED EXIT $? $(date -u)" >> "$W"
done
# flagship guarded A/B: 1000 steps from init on real text, k=10,
# refresh every 100, auto tier + recheck every 2 refreshes
timeout 5400 python -m hessian_llm_vision_tpu.cli.train --model gpt2 \
  --dataset local:/usr/local/lib/python3.12 --batch_size 8 --max_length 512 \
  --attn_block_q 256 --loss_chunk 256 \
  --optimiser lanczos-host --k 10 --delta 1e-4 --lr 1e-3 \
  --refresh_every 100 --refresh_batch_size 4 \
  --refresh_precision auto --precision_recheck 2 \
  --max_steps 1000 --log_every 50 \
  --out artifacts/flagship_r5_guarded \
  > .logs/flagship_r5_guarded.log 2>&1
echo "R5 FLAGSHIP GUARDED EXIT $? $(date -u)" >> "$W"
echo "R5 PHASE2 DONE $(date -u)" >> "$W"
