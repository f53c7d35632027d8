#!/bin/bash
# Round-2 queued on-chip A/Bs — run when the TPU tunnel is back.
# Sequential (tunnel contention: batch experiments per process); each step
# logs to /tmp/chip_r2/. Order = most-important-first in case the window
# is short.
set -x
mkdir -p /tmp/chip_r2
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# 1. PenCL pair-level quant combos (validates the committed int8-FF default
#    + measures esm-proj / bert-ff candidates, with drift cosines)
timeout 3000 python tools/exp_pencl_quant.py > /tmp/chip_r2/pencl_quant.log 2>&1

# 2. Stage-3 stack kernel int8 A/B (headline lever)
timeout 3000 python tools/exp_kernels.py --which int8 --steps 64 \
    > /tmp/chip_r2/stack_int8.log 2>&1

# 3. Stage-1 training layer-block vs remat/XLA (new custom-VJP kernels)
timeout 3000 python tools/bench_train_stage1.py --layer-mode layer_block \
    --batch 4 --steps 4 > /tmp/chip_r2/train_block.log 2>&1
timeout 3000 python tools/bench_train_stage1.py --remat-mode dots \
    --batch 4 --steps 4 > /tmp/chip_r2/train_xla.log 2>&1

# 3b. streamed-weights stack path (the big-config fallback, never timed)
timeout 3000 python tools/exp_kernels.py --which streamed --steps 64 \
    > /tmp/chip_r2/stack_streamed.log 2>&1

# 4. int8 on TRAINED weights (certification for PARITY.md)
timeout 3000 python tools/certify_int8.py --steps 600 --batch 64 \
    > /tmp/chip_r2/certify_int8.log 2>&1

# 5. Full bench refresh (new PenCL int8 default path end-to-end)
timeout 5400 python bench.py > /tmp/chip_r2/bench.log 2>&1

# 5b. Confidence-vs-path ordering + MaskGIT quality A/B at full training
#     strength (the CPU run only reaches ~600 steps; 2000 matches the
#     recorded PARITY.md blocked-decoding table)
timeout 4200 python tools/certify_blocked.py --steps 2000 --batch 64 \
    --ks 1 8 --temps 1.0 0.5 0.0 --orders path confidence \
    --maskgit-steps 8 16 32 --state-path /tmp/chip_r2/toy_state.pkl \
    > /tmp/chip_r2/certify_order.log 2>&1

# 6. Serving daemon on-chip: HTTP round-trip throughput via the real
#    batcher (exact mode, then blocked+confidence fast mode)
timeout 3600 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 2 > /tmp/chip_r2/serving_exact.log 2>&1
timeout 3600 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 2 --positions-per-step 8 --decode-order confidence \
    > /tmp/chip_r2/serving_fast.log 2>&1
timeout 3600 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 4 --sampler maskgit --maskgit-steps 16 \
    > /tmp/chip_r2/serving_maskgit.log 2>&1

# 6b. Inpainting endpoint on-chip (new surface: confidence-order inpainter
#     with chunked early exit; 300 residues, 25% masked)
timeout 3600 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 2 --endpoint inpaint --inpaint-len 300 \
    --inpaint-masked-frac 0.25 > /tmp/chip_r2/serving_inpaint.log 2>&1
timeout 3600 python tools/bench_serving.py --rows 16 --clients 8 \
    --requests 2 --endpoint inpaint --sampler maskgit --maskgit-steps 16 \
    > /tmp/chip_r2/serving_inpaint_maskgit.log 2>&1

# 5c. Inpainting restoration certification at full training strength
#     (copy task: restore_acc must be ~1.0 at temp 0 for all methods)
timeout 4200 python tools/certify_inpaint.py --steps 2000 --batch 64 \
    --fracs 0.5 0.25 0.05 --temps 0.0 1.0 --maskgit-steps 16 \
    --state-path /tmp/chip_r2/toy_state.pkl \
    > /tmp/chip_r2/certify_inpaint.log 2>&1

# 7. (r3) Backend-crash re-test: the two fenced compiler killers
#    (scan-without-remat bwd, stack dl+rows2). CRASH = keep guards,
#    PASS = backend fixed, lift them (models/proteoscribe.py,
#    ops/pallas/stack_kernel_tpu.py).
timeout 2000 python tools/repro_compiler_crashes.py --which all \
    > /tmp/chip_r2/repro_crashes.log 2>&1

# 8. (r3) ESM2 streamed-tower timing-vs-B sweep (VERDICT r2 weak #4:
#    the streamed path makes promises nothing has timed at B != 16)
for B in 4 8 16 32; do
  timeout 2400 python tools/exp_esm2_stack.py --batch $B --iters 8 \
      --skip-xla --ff-quant none int8 \
      > /tmp/chip_r2/esm2_stack_B${B}.log 2>&1
done

echo "chip session r2+r3 queue complete: $(date -Is)" \
    >> /tmp/chip_r2/session_driver.log

# 9. (r3) Archive: logs are decision records — keep them with the repo
#    (/tmp does not survive between rounds) plus a folded summary.
mkdir -p /root/repo/outputs/chip_session_logs
cp /tmp/chip_r2/*.log /root/repo/outputs/chip_session_logs/ 2>/dev/null
python tools/summarize_chip_session.py \
    > /root/repo/outputs/chip_session_logs/SUMMARY.txt 2>&1
