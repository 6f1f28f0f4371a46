#!/bin/bash
# One-shot on-metal measurement session: run when the TPU relay is reachable.
# Produces /tmp/metal/{prof.txt,bench.json,screenshot log} sequentially (the
# relay serves one client at a time).
set -u
mkdir -p /tmp/metal
cd /root/repo

echo "== probe ==" | tee /tmp/metal/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal/log || exit 1

echo "== stage profile ==" | tee -a /tmp/metal/log
timeout 3000 python tools/prof_frame.py 2>&1 | grep -vE "WARNING|INFO" | tee /tmp/metal/prof.txt | tail -30

echo "== bench ==" | tee -a /tmp/metal/log
timeout 5400 python bench.py 2>&1 | tail -3 | tee /tmp/metal/bench.json

echo "== done ==" | tee -a /tmp/metal/log
