#!/bin/bash
# Poll the TPU relay; when it answers, run the one-shot metal session.
# Probe is config-level-pinned to tpu so a down relay fails fast instead of
# hanging (see BENCHLOG relay notes).
set -u
cd /root/repo
PROBE='import jax; jax.config.update("jax_platforms","tpu"); print(jax.devices()[0])'
while true; do
  # a probe killed mid-init (timeout) or two colliding probes can leave a
  # stale libtpu lockfile that makes every later init fail with "Internal
  # error when accessing libtpu multi-process lockfile" -- clear it first
  rm -f /tmp/libtpu_lockfile
  if timeout 90 python -c "$PROBE" > /tmp/metal_probe.log 2>&1; then
    echo "relay UP at $(date -u +%H:%M:%S)" | tee -a /tmp/metal_probe.log
    bash tools/metal_session.sh
    exit 0
  fi
  sleep 240
done
