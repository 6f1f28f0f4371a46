#!/bin/bash
# Round-6 session I: final frame attribution + the complete judged bench.
set -u
mkdir -p /tmp/metal6
cd /root/repo
echo "== I probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1
echo "== I1 frame defaults ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameI1.txt | tail -44
echo "== I bench ==" | tee -a /tmp/metal6/log
timeout 7200 python bench.py > /tmp/metal6/bench_full5.log 2>&1
tail -2 /tmp/metal6/bench_full5.log | tee /tmp/metal6/benchI.json
echo "== I done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
