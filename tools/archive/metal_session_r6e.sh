#!/bin/bash
# Round-6 session E: the MaterialTap coherence hunt (sponza tier) + flip
# validations.
#   1. frame, defaults (compact sort restored + align scatter) -- baseline
#   2. frame, sponza + packed-trilinear (1x256B vs 2x64B incoherent taps)
#   3. frame, sponza + bilinear (single tap: latency vs ALU split)
#   4. frame, procedural + env_matmul_gather (MXU one-hot env decision row)
#   5. tapparts on the sponza tier (bare gather vs full tap)
set -u
mkdir -p /tmp/metal6
cd /root/repo

echo "== E probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1

echo "== E1 frame defaults ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameE1.txt | tail -30

echo "== E2 sponza packed-tri ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_TEX_SOURCE=sponza PROF_PACKED_TRI=1 timeout 2400 \
  python tools/prof_frame.py frame 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameE2.txt | tail -4

echo "== E3 sponza bilinear ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_TEX_SOURCE=sponza PROF_FILTER=bilinear timeout 2400 \
  python tools/prof_frame.py frame 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameE3.txt | tail -4

echo "== E4 env matmul gather ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_ENV_MM=1 timeout 2400 python tools/prof_frame.py frame 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameE4.txt | tail -4

echo "== E5 sponza tapparts ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_TEX_SOURCE=sponza timeout 2400 \
  python tools/prof_frame.py tapparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameE5.txt | tail -10

echo "== E done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
