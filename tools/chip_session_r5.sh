#!/bin/bash
# Round-5 chip session (VERDICT r4 tasks 1, 2, 4, 5).  Sequential —
# tunnel contention rules in CLAUDE.md apply.  Items:
#   0. Compiler-killer re-test FIRST (per-session automation, r4 task 6
#      carryover) — backend version + minimal repros + full-size scan_bwd.
#   1. MaskGIT serving through the NEW row-granular depth-1-pipelined
#      TrajectoryBatcher (task 1: 45.1 -> >=65 seqs/s, or a measured
#      overhead breakdown).  r4 baseline (MicroBatcher, same load):
#      45.1 seqs/s @ 0.79 occupancy (r4_serving_maskgit_r32x4.log).
#   2. Stage-1 training HBM-wall A/B (task 2): adafactor + bf16-mu vs
#      the B=16 AdamW baseline (21.9 pairs/s, 56% MFU); B=24/32 attempts.
#   3. Exact-serving latency/throughput Pareto (task 5): chunk 32/16 at
#      32 rows vs the r4 chunk-64 point (1.766 seqs/s, occ 1.00,
#      p50 36.2 s @ 16 clients).
#   4. bench.py full run (task 4: validates served_seqs_per_sec).
#   5. Mixed maskgit generate+inpaint (merged dispatches — new in r5).
set -x
mkdir -p /tmp/chip_r5
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# --- 0. backend version + compiler-killer status (one line per session)
python - <<'EOF' >> /tmp/chip_r5/backend.log 2>&1
import datetime, jax
d = jax.devices()[0]
print(f"{datetime.datetime.now().isoformat()} backend={jax.default_backend()} "
      f"device={d.device_kind} jax={jax.__version__}")
EOF
timeout 2400 python tools/repro_compiler_crashes.py --which all \
    > /tmp/chip_r5/repro_crashes.log 2>&1
timeout 2400 python tools/bench_train.py --variants scan_u1 \
    --steps 2 --runs 1 > /tmp/chip_r5/scan_bwd_fullsize.log 2>&1
{ echo "=== $(date -Is) compiler-killer status ==="; \
  grep -E "PASS|CRASH|TIMEOUT" /tmp/chip_r5/repro_crashes.log; \
  grep -E "ms/step|FAILED|Error" /tmp/chip_r5/scan_bwd_fullsize.log | tail -3; \
} >> /tmp/chip_r5/backend.log
touch /tmp/chip_r5/done_0

# --- 1. MaskGIT serving: trajectory scheduler (r4 load shape) ----------
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj.log 2>&1
touch /tmp/chip_r5/done_1

# --- 2. Stage-1 optimizer-state A/B ------------------------------------
timeout 3600 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 16 --steps 4 --optimizer adafactor \
    > /tmp/chip_r5/train_s1_b16_adafactor.log 2>&1
timeout 3600 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 24 --steps 4 --moment-dtype bfloat16 \
    > /tmp/chip_r5/train_s1_b24_bf16mu.log 2>&1
timeout 3600 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 24 --steps 4 --optimizer adafactor \
    > /tmp/chip_r5/train_s1_b24_adafactor.log 2>&1
timeout 3600 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 32 --steps 4 --optimizer adafactor \
    > /tmp/chip_r5/train_s1_b32_adafactor.log 2>&1
touch /tmp/chip_r5/done_2

# --- 3. exact-serving Pareto: admission chunk 32 / 16 ------------------
timeout 4200 python tools/bench_serving.py --rows 32 --clients 16 \
    --requests 2 --replicas 2 --chunk-steps 32 --continuous on \
    > /tmp/chip_r5/serving_exact_chunk32.log 2>&1
timeout 4200 python tools/bench_serving.py --rows 32 --clients 16 \
    --requests 2 --replicas 2 --chunk-steps 16 --continuous on \
    > /tmp/chip_r5/serving_exact_chunk16.log 2>&1
touch /tmp/chip_r5/done_3

# --- 4. bench.py (served_seqs_per_sec validation) ----------------------
timeout 3600 python bench.py > /tmp/chip_r5/bench_full.log 2>&1
touch /tmp/chip_r5/done_4

# --- 5. mixed maskgit traffic (merged generate+inpaint dispatches) -----
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 --endpoint mixed \
    > /tmp/chip_r5/serving_maskgit_mixed.log 2>&1
touch /tmp/chip_r5/done_5

touch /tmp/chip_r5/done_all
