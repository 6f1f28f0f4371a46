#!/bin/bash
# Round-6 session K: revert validation + pica decision rows (packed atlas,
# env one-hot) + bench.
set -u
mkdir -p /tmp/metal6
cd /root/repo
echo "== K probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1
echo "== K1 frame (revert validation) ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameK1.txt | tail -4
echo "== K2 pica packed ==" | tee -a /tmp/metal6/log
PICA_PACKED=1 timeout 2400 python tools/prof_pica.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/picaK2.txt | tail -24
echo "== K3 pica env one-hot ==" | tee -a /tmp/metal6/log
PICA_ENV_MM=1 timeout 2400 python tools/prof_pica.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/picaK3.txt | tail -24
echo "== K4 pica packed + env ==" | tee -a /tmp/metal6/log
PICA_PACKED=1 PICA_ENV_MM=1 timeout 2400 python tools/prof_pica.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/picaK4.txt | tail -8
echo "== K done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
