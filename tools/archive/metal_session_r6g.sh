#!/bin/bash
# Round-6 session G: single-sort giant + VPU id emission validation,
# "(other)" op dump, then the judged bench.
set -u
mkdir -p /tmp/metal6
cd /root/repo
echo "== G probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1
echo "== G1 frame defaults ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameG1.txt | tail -44
echo "== G2 sponza frame ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_TEX_SOURCE=sponza PROF_PACKED_TRI=1 timeout 2400 \
  python tools/prof_frame.py frame 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameG2.txt | tail -4
echo "== G bench ==" | tee -a /tmp/metal6/log
timeout 5400 python bench.py > /tmp/metal6/bench_full3.log 2>&1
tail -2 /tmp/metal6/bench_full3.log | tee /tmp/metal6/benchG.json
echo "== G done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
