#!/bin/bash
# Round-5 session J: blocked-k8 temp-0 via the trajectory scheduler
# (vs r4's 12.3 seqs/s through continuous), and mixed maskgit with the
# embed cache.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
timeout 4200 python tools/bench_serving.py --rows 32 --clients 16 \
    --requests 4 --replicas 4 --positions-per-step 8 --temperature 0 \
    --chunk-steps 16 --continuous off \
    > /tmp/chip_r5/serving_blocked8_t0_traj.log 2>&1
touch /tmp/chip_r5/done_j1
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 --endpoint mixed \
    > /tmp/chip_r5/serving_maskgit_mixed_cache.log 2>&1
touch /tmp/chip_r5/done_j_all
