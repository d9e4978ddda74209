#!/bin/bash
# Run when the TPU tunnel recovers: verify, headline, dual-kernel probe.
set -x
cd /root/repo
python examples/smoke_e2e.py --workdir /tmp/smoke_rec --size 48 --frames 3 --epochs 2 2>&1 | tail -1
python bench.py 2>&1 | grep -v WARNING | tail -2
python benchmarks/probes/probe_step70.py 2>&1 | grep -v WARNING | tail -9
NEUMA_DUAL_BWD=1 python benchmarks/probes/probe_step70.py 2>&1 | grep -v WARNING | tail -9
NEUMA_DUAL_BWD=1 NEUMA_DUAL_CHUNK=128 python benchmarks/probes/probe_step70.py 2>&1 | grep -v WARNING | tail -3
