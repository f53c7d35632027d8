#!/bin/bash
# Round-5 follow-up chip session: maskgit serving re-A/B after the
# device-resident admission-embed fix (commit 534c4c2), + a rows-64
# amortization probe.  Run after chip_session_r5.sh's done_all.
set -x
mkdir -p /tmp/chip_r5
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_v2.log 2>&1
touch /tmp/chip_r5/done_b1

timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 64 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_r64.log 2>&1
touch /tmp/chip_r5/done_b2

touch /tmp/chip_r5/done_b_all
