#!/bin/bash
# Round-5 session D: final maskgit measurement with lazy-resolved
# pipelined admission embeds (v4), then a full bench.py to stamp the
# served metric with the staggered-client fix.
set -x
mkdir -p /tmp/chip_r5
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_v4.log 2>&1
touch /tmp/chip_r5/done_d1
timeout 3600 python bench.py > /tmp/chip_r5/bench_full_v2.log 2>&1
touch /tmp/chip_r5/done_d_all
