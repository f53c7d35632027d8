#!/bin/bash
# Round-5 session F: validate the fixed served-metric estimator.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
timeout 3600 python bench.py > /tmp/chip_r5/bench_full_v3.log 2>&1
touch /tmp/chip_r5/done_f_all
