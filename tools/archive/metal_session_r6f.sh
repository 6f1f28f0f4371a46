#!/bin/bash
# Round-6 session F: giant-id VMEM fix + env one-hot validation + the
# auto-packed sponza frame, then the judged bench.
set -u
mkdir -p /tmp/metal6
cd /root/repo

echo "== F probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1

echo "== F1 frame defaults (giant-id fix) ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameF1.txt | tail -30

echo "== F2 sponza frame (auto -> packed) ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_TEX_SOURCE=sponza PROF_PACKED_TRI=1 timeout 2400 \
  python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameF2.txt | tail -30

echo "== F3 env matmul gather ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_ENV_MM=1 timeout 2400 python tools/prof_frame.py frame 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameF3.txt | tail -4

echo "== F bench ==" | tee -a /tmp/metal6/log
timeout 5400 python bench.py > /tmp/metal6/bench_full2.log 2>&1
tail -2 /tmp/metal6/bench_full2.log | tee /tmp/metal6/benchF.json

echo "== F done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
