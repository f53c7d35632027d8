#!/bin/bash
# Round-5 session E: stamp the FINAL maskgit serving numbers on the
# restored synchronous-embed trajectory scheduler (+ EMA/window fixes),
# generate-only and mixed generate+inpaint.
set -x
mkdir -p /tmp/chip_r5
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_final.log 2>&1
touch /tmp/chip_r5/done_e1
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 --endpoint mixed \
    > /tmp/chip_r5/serving_maskgit_mixed_final.log 2>&1
touch /tmp/chip_r5/done_e_all
