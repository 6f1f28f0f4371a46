#!/bin/bash
# Poll the TPU relay (default/axon platform); run the r6 session when up.
set -u
cd /root/repo
while true; do
  rm -f /tmp/libtpu_lockfile
  if timeout 110 python -c "import jax; print(jax.devices()[0])" > /tmp/metal6_probe.log 2>&1; then
    echo "relay UP at $(date -u +%H:%M:%S)" >> /tmp/metal6_probe.log
    bash tools/metal_session_r6m.sh
    exit 0
  fi
  sleep 180
done
