#!/bin/bash
# Round-5 session C: maskgit serving with two-phase pipelined admission
# embeds (the v1 61.4 / v2 41.3 split needs a same-process A/B: the two
# runs differed by ~25% tunnel variance).  Run the SAME config twice in
# a row to bound run-to-run noise, then once with --packed-scheduler
# micro as the in-session legacy control.
set -x
mkdir -p /tmp/chip_r5
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_v3.log 2>&1
touch /tmp/chip_r5/done_c1
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_v3b.log 2>&1
touch /tmp/chip_r5/done_c2
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 --packed-scheduler micro \
    > /tmp/chip_r5/serving_maskgit_micro_ctl.log 2>&1
touch /tmp/chip_r5/done_c_all
