#!/bin/bash
# Round-6 session B: coef-gather + giant decomposition decision rows, then
# the judge-facing bench.
set -u
mkdir -p /tmp/metal6
cd /root/repo

echo "== B probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1

echo "== coef rows ==" | tee -a /tmp/metal6/log
timeout 2400 python tools/prof_coef.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/coef.txt | tail -14

echo "== giant rows ==" | tee -a /tmp/metal6/log
timeout 2400 python tools/prof_giant.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/giant.txt | tail -20

echo "== bench ==" | tee -a /tmp/metal6/log
timeout 5400 python bench.py 2>&1 | tail -2 | tee /tmp/metal6/bench.json

echo "== B done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
