#!/bin/bash
# Round-4 chip session (VERDICT r3 tasks 2-6).  Sequential — tunnel
# contention rules in CLAUDE.md apply.  Items:
#   0. Compiler-killer re-test FIRST, recording backend version +
#      pass/fail (VERDICT task 6: the re-test happens by construction,
#      not by memory) — minimal repros + the FULL-SIZE scan_bwd case.
#   1. Serving exact-mode 16-client bench with chunk-boundary continuous
#      batching (task 2: target >=1.5 seqs/s at >=0.8 row occupancy,
#      from 1.13 @ 0.52) + packed-mode control run.
#   2. BASELINE config #5: 1k-prompt sweep (task 3) — fast mode at full
#      scale, exact mode on a 32x5 sample.
#   3. Stage-1 training knee: extend the B=4/8/16 curve to B=24/32
#      (task 4).
#   4. PenCL serving past B=32: one B=64 A/B (task 5).
set -x
mkdir -p /tmp/chip_r4
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# --- 0. backend version + compiler-killer status (one line per session) —
python - <<'EOF' >> /tmp/chip_r4/backend.log 2>&1
import datetime, jax
d = jax.devices()[0]
print(f"{datetime.datetime.now().isoformat()} backend={jax.default_backend()} "
      f"device={d.device_kind} jax={jax.__version__}")
EOF
timeout 2400 python tools/repro_compiler_crashes.py --which all \
    > /tmp/chip_r4/repro_crashes.log 2>&1
# full-size scan_bwd (the case the minimal repro misses): B=32 reference
# config, 2 steps is enough to force the backward compile
timeout 2400 python tools/bench_train.py --variants scan_u1 \
    --steps 2 --runs 1 > /tmp/chip_r4/scan_bwd_fullsize.log 2>&1
{ echo "=== $(date -Is) compiler-killer status ==="; \
  grep -E "PASS|CRASH|TIMEOUT" /tmp/chip_r4/repro_crashes.log; \
  grep -E "ms/step|FAILED|Error" /tmp/chip_r4/scan_bwd_fullsize.log | tail -3; \
} >> /tmp/chip_r4/backend.log

# --- 1. continuous-batching serving bench (+ packed control) ------------
timeout 4200 python tools/bench_serving.py --rows 16 --clients 16 \
    --requests 4 --continuous on \
    > /tmp/chip_r4/serving_exact_continuous.log 2>&1
timeout 4200 python tools/bench_serving.py --rows 16 --clients 16 \
    --requests 4 --continuous off \
    > /tmp/chip_r4/serving_exact_packed.log 2>&1

# --- 2. the 1k-prompt sweep (BASELINE config #5) ------------------------
timeout 4200 python tools/run_sweep.py --prompts 1000 --replicas 5 \
    --mode fast --out /tmp/chip_r4/sweep_fast.json \
    > /tmp/chip_r4/sweep_fast.log 2>&1
timeout 3600 python tools/run_sweep.py --prompts 32 --replicas 5 \
    --mode exact --out /tmp/chip_r4/sweep_exact.json \
    > /tmp/chip_r4/sweep_exact.log 2>&1

# --- 3. Stage-1 training knee: B=24/32 ----------------------------------
timeout 3600 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 24 --steps 4 > /tmp/chip_r4/train_s1_b24.log 2>&1
timeout 3600 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 32 --steps 4 > /tmp/chip_r4/train_s1_b32.log 2>&1

# --- 4. PenCL B=64 ------------------------------------------------------
timeout 3600 python tools/exp_pencl_quant.py --batch 64 \
    > /tmp/chip_r4/pencl_quant_b64.log 2>&1

# --- 5. Stage-3 batch geometry: B=64 vs B=32 sampler step A/B -----------
timeout 2400 python tools/profile_sampler.py --batch 32 --which step \
    > /tmp/chip_r4/sampler_step_b32.log 2>&1
timeout 2400 python tools/profile_sampler.py --batch 64 --which step \
    > /tmp/chip_r4/sampler_step_b64.log 2>&1

echo "chip session r4 complete: $(date -Is)" >> /tmp/chip_r4/driver.log
mkdir -p /root/repo/outputs/chip_session_logs
for f in /tmp/chip_r4/*.log /tmp/chip_r4/*.json; do
  [ -f "$f" ] && cp "$f" "/root/repo/outputs/chip_session_logs/r4_$(basename "$f")"
done
python tools/summarize_chip_session.py --dir /tmp/chip_r4 \
    > /root/repo/outputs/chip_session_logs/SUMMARY_r4.txt 2>&1
