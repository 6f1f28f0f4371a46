#!/bin/bash
# Round-6 session M: GiantKernel per-op dump + cam-mid sweep.
set -u
mkdir -p /tmp/metal6
cd /root/repo
echo "== M probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1
echo "== M1 giant scope dump ==" | tee -a /tmp/metal6/log
PROF_ITERS=4 PROF_SCOPE_DUMP=GiantKernel timeout 2400 \
  python tools/prof_frame.py traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameM1.txt | tail -50
echo "== M done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
