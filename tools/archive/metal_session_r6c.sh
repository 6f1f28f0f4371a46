#!/bin/bash
# Round-6 session C: fusion/materialize + compact-scatter decision rows,
# judged bench (sponza-256 tier + fixed parity gates), then the DANGEROUS
# big-upload probe last (it may wedge the relay worker).
set -u
mkdir -p /tmp/metal6
cd /root/repo

echo "== C probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1

echo "== fuse rows ==" | tee -a /tmp/metal6/log
timeout 3000 python tools/prof_fuse.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/fuse.txt | tail -20

echo "== bench ==" | tee -a /tmp/metal6/log
timeout 5400 python bench.py > /tmp/metal6/bench_full.log 2>&1
tail -2 /tmp/metal6/bench_full.log | tee /tmp/metal6/bench.json

echo "== upload probe (dangerous: may wedge the worker) ==" | tee -a /tmp/metal6/log
timeout 600 python - > /tmp/metal6/upload.txt 2>&1 <<'EOF'
import time
import numpy as np, jax, jax.numpy as jnp
x = np.ones((805, 1 << 20), np.uint8)  # ~805 MB
t0 = time.monotonic()
try:
    d = jax.device_put(x)
    d.block_until_ready()
    print(f"805MB one-shot device_put OK in {time.monotonic()-t0:.1f}s", flush=True)
except Exception as e:
    print("805MB one-shot FAILED:", repr(e)[:200], flush=True)
t0 = time.monotonic()
try:
    parts = [jax.device_put(x[i::4]) for i in range(4)]
    d2 = jnp.concatenate([p for p in parts], axis=0)
    d2.block_until_ready()
    print(f"805MB chunked (4x~200MB) OK in {time.monotonic()-t0:.1f}s", flush=True)
except Exception as e:
    print("chunked FAILED:", repr(e)[:200], flush=True)
EOF
grep -v WARNING /tmp/metal6/upload.txt | tail -4 | tee -a /tmp/metal6/log
echo "== C done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
