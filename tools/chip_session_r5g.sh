#!/bin/bash
# Round-5 session G: stamp maskgit generate + mixed with the 1x-EMA
# window (final config).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_traj_final2.log 2>&1
touch /tmp/chip_r5/done_g_all
