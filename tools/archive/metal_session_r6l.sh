#!/bin/bash
# Round-6 session L: final judged bench at settled defaults.
set -u
mkdir -p /tmp/metal6
cd /root/repo
echo "== L probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1
echo "== L bench ==" | tee -a /tmp/metal6/log
timeout 7200 python bench.py > /tmp/metal6/bench_full7.log 2>&1
tail -2 /tmp/metal6/bench_full7.log | tee /tmp/metal6/benchL.json
echo "== L done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
