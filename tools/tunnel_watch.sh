#!/bin/bash
# Poll the TPU tunnel; when it answers, run the queued chip session once.
# Usage: setsid nohup bash tools/tunnel_watch.sh > /tmp/tunnel_watch.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p /tmp/chip_r2
while true; do
  if timeout 420 python - <<'EOF' 2>/tmp/chip_r2/probe_err.log
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
import numpy as np
x = jnp.ones((256, 256), jnp.bfloat16)
np.asarray(x @ x)  # prove a real dispatch round-trips
print("tunnel up:", d)
EOF
  then
    echo "$(date -Is) tunnel UP — starting chip session" >> /tmp/chip_r2/watch.log
    bash tools/chip_session_r2.sh >> /tmp/chip_r2/session_driver.log 2>&1
    echo "$(date -Is) chip session finished" >> /tmp/chip_r2/watch.log
    break
  fi
  echo "$(date -Is) tunnel still down" >> /tmp/chip_r2/watch.log
  sleep 300
done
