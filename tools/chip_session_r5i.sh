#!/bin/bash
# Round-5 session I: embed-cache A/B on the final trajectory config.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
timeout 4200 python tools/bench_serving.py --sampler maskgit --rows 32 \
    --clients 16 --requests 4 --replicas 4 \
    > /tmp/chip_r5/serving_maskgit_cache.log 2>&1
touch /tmp/chip_r5/done_i_all
