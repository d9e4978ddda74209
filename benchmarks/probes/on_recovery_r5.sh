#!/bin/bash
# Round-5 runbook (real v5e): hardware checks + the round-5 perf
# candidates in order of expected value. Each step independently
# skippable; results drive which flags become defaults.
set -x
cd /root/repo

# 0. sanity
python - <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: a + 1)(jnp.float32(1))))
EOF

# 1. bitwise run-to-run determinism on hardware (SURVEY 5.2; the CPU
#    half lives in tests/test_determinism.py)
python benchmarks/probes/probe_determinism.py 2>&1 | grep -v WARNING | tail -4

# 2. fresh realworld phase attribution (what is the 543 ms/frame now?)
python benchmarks/probes/probe_realworld.py 2>&1 | grep -v WARNING | tail -12

# 3. pair-build dissection at the 1<<18 budget: global packed sort vs
#    counting rows vs the placement scatter alone
python benchmarks/probes/probe_pairs.py 2>&1 | grep -v WARNING | tail -12

# 4. driver metrics with current defaults
python bench.py 2>&1 | grep -v WARNING | tail -3
