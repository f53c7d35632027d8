#!/bin/bash
# Round-5 session H: final generate-only stamp with the 2x-EMA window.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_final3.log 2>&1
touch /tmp/chip_r5/done_h_all
