#!/bin/bash
# Round-4 metal batch 3: validate the post-batch-2 semantic work on metal
# (fused PCF bitmask kernel, seamless cube env rows, analytic-LOD alpha
# test, trilinear headline default) and record the round's bench numbers.
set -u
mkdir -p /tmp/metal4c
cd /root/repo
export PROF_PACKED_TRI=1
export PROF_FILTER=trilinear

echo "== probe ==" | tee /tmp/metal4c/log
rm -f /tmp/libtpu_lockfile
timeout 180 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal4c/log || exit 1

echo "== in-frame attribution (fused PCF + sub-scopes) ==" | tee -a /tmp/metal4c/log
timeout 2400 python tools/prof_frame.py traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal4c/traceattr.txt | tail -30

echo "== pcf stage rows (fused kernel) ==" | tee -a /tmp/metal4c/log
timeout 1800 python tools/prof_frame.py pcf full 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal4c/pcf.txt | tail -12

echo "== bench (headline) ==" | tee -a /tmp/metal4c/log
timeout 5400 python bench.py 2>&1 | tee /tmp/metal4c/bench.txt | tail -3

echo "== done batch 3 ==" | tee -a /tmp/metal4c/log
