#!/bin/bash
# Round-6 session H: frame at final defaults (mask matmul) + judged bench.
set -u
mkdir -p /tmp/metal6
cd /root/repo
echo "== H probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1
echo "== H1 frame defaults ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameH1.txt | tail -40
echo "== H bench ==" | tee -a /tmp/metal6/log
timeout 5400 python bench.py > /tmp/metal6/bench_full4.log 2>&1
tail -2 /tmp/metal6/bench_full4.log | tee /tmp/metal6/benchH.json
echo "== H done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
