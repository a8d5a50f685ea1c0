#!/bin/bash
# Round-5 item 1: recompute the trained-endpoint landscape — bulk
# (deflated KPM) and blockwise — at the certified faithful tier
# (--hvp_precision auto resolves to blocks-X6 on trained checkpoints).
# Also proves the persisted-plan reuse path on the real workload (item 5).
cd /root/repo
W=/root/repo/.logs/tpu_watch.log
A=artifacts/trained124m_r5
CK=artifacts/trained124m_r4
mkdir -p $A
set -x
# R5-A: step-2000 deflated-KPM two-scale density at AUTO (probes the
# ladder, persists the plan next to the checkpoint)
timeout 7200 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $CK/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
  --hvp_precision auto --kpm 60 --kpm_probes 2 --kpm_deflate 4 \
  --tr_dtype bfloat16 --tr_tol 2e-3 --out_spectrum $A/spec_step2000_auto \
  > .logs/spec124m_r5_s2000.log 2>&1
echo "R5A SPEC2000 EXIT $? $(date -u)" >> "$W"
# R5-A2: same checkpoint + shapes, short job — MUST print 'reusing
# persisted plan' and pay zero probe HVPs (item 5 measured evidence)
timeout 3600 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $CK/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 5 --host_loop --fused_iter \
  --hvp_precision auto --out_spectrum $A/spec_step2000_reuse \
  > .logs/spec124m_r5_s2000_reuse.log 2>&1
echo "R5A2 REUSE EXIT $? $(date -u)" >> "$W"
cp $CK/ckpt2000.autoprec.json $A/ 2>/dev/null
# R5-B: 15-group block sweep at the faithful tier (pinned blocks-X6 —
# the tier R5-A's auto probe certifies; single-batch bs8 operator like r3)
timeout 7200 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $CK/ckpt2000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 1 --batch_size 8 \
  --max_length 512 --lanczos_iters 10 --layerwise \
  --group_regex '(h_\d+|wte|wpe|ln_f)' \
  --host_loop --hvp_precision high --block_precision BF16_BF16_F32_X6 \
  --attn_block_q 512 --loss_chunk 512 \
  --out_spectrum $A/blocks/blk --plot $A/blocks/grid.png \
  > .logs/blocksweep_r5.log 2>&1
echo "R5B BLOCKSWEEP EXIT $? $(date -u)" >> "$W"
# R5-C: step-1000 at AUTO with the same certified protocol (the r3 row
# was mixed-tier; restate the sharpness-growth story faithfully)
timeout 7200 python -m hessian_llm_vision_tpu.cli.spectrum --model gpt2 \
  --checkpoint $CK/ckpt1000 \
  --dataset local:/usr/local/lib/python3.12 --num_batches 8 --batch_size 4 \
  --max_length 512 --lanczos_iters 35 --host_loop --fused_iter \
  --hvp_precision auto --kpm 60 --kpm_probes 2 --kpm_deflate 4 \
  --tr_dtype bfloat16 --tr_tol 2e-3 --out_spectrum $A/spec_step1000_auto \
  > .logs/spec124m_r5_s1000.log 2>&1
echo "R5C SPEC1000 EXIT $? $(date -u)" >> "$W"
echo "R5 QUEUE DONE $(date -u)" >> "$W"
