#!/bin/bash
# Round-3 follow-ups — launch AFTER tools/chip_session_r2.sh drains
# (sequential; tunnel contention rules in CLAUDE.md apply).
# Each item closes a loose end from the r2 queue run (BACKLOG
# "Round 3 session 2"):
#   1. Stage-1 layer_block re-measure: the queued run crashed Mosaic
#      (f32 dqkv 124.55 MB > 120 MB); auto-bf16-dqkv fix landed in
#      685024b.  A/B target: XLA/remat baseline 335.4 ms/step @ B=4.
#   2. certify_int8 at chip strength: queued run died on a stale import
#      (fixed in 8359848); reuse the 2000-step toy state from
#      certify_blocked.
#   3. Serving exact/fast re-bench: the queued runs predated 12e1092 so
#      the CLI's explicit quant="none" overrode the engine int8 default
#      (exact 0.672 seqs/s, fast 4.69 were bf16 numbers).
#   4. PenCL B=32 quant A/B: int8 may shift the B=16/32 tie recorded in
#      BACKLOG round-4-closing notes.
set -x
mkdir -p /tmp/chip_r3
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 3600 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 4 --steps 4 > /tmp/chip_r3/train_block_bf16dq.log 2>&1

timeout 4200 python tools/certify_int8.py --steps 2000 --batch 64 \
    --state-path /tmp/chip_r2/toy_state.pkl \
    > /tmp/chip_r3/certify_int8.log 2>&1

timeout 3600 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 2 > /tmp/chip_r3/serving_exact_int8.log 2>&1
timeout 3600 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 2 --positions-per-step 8 --decode-order confidence \
    > /tmp/chip_r3/serving_fast_int8.log 2>&1

timeout 3000 python tools/exp_pencl_quant.py --batch 32 \
    > /tmp/chip_r3/pencl_quant_b32.log 2>&1

# 5. inpaint+maskgit serving re-bench: the r2-queue run's warmup request
#    500'd at the 600 s server deadline mid-compile (921 s executable) and
#    polluted the measured phase; bench_serving now retries warmup with a
#    2400 s window.
timeout 4800 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 2 --endpoint inpaint --sampler maskgit --maskgit-steps 16 \
    > /tmp/chip_r3/serving_inpaint_maskgit.log 2>&1

echo "chip session r3 follow-ups complete: $(date -Is)" \
    >> /tmp/chip_r3/driver.log

mkdir -p /root/repo/outputs/chip_session_logs
for f in /tmp/chip_r3/*.log; do
  cp "$f" "/root/repo/outputs/chip_session_logs/r3_$(basename "$f")"
done
python tools/summarize_chip_session.py --dir /tmp/chip_r3 \
    > /root/repo/outputs/chip_session_logs/SUMMARY_r3_followups.txt 2>&1
