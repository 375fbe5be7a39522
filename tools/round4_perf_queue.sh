#!/bin/bash
# Round-4 perf measurement queue: waits for any running parity_full job,
# then (1) stage breakdown, (2) fused-vs-unfused step timing, (3) fused
# FER spot check at the wrap delay.  Run from repo root.
set -u
cd "$(dirname "$0")/.."

while pgrep -f "parity_full.py" > /dev/null; do sleep 60; done
echo "== TPU free at $(date) =="

echo "== probe_parts3 (unfused baseline breakdown) =="
DVBS2_FUSE=never timeout 2400 python tools/probe_parts3.py 2>&1 | grep -v WARNING

echo "== fused step timing (probe_parts3 with auto fuse) =="
timeout 2400 python tools/probe_parts3.py 2>&1 | grep -v WARNING

echo "== fused FER spot check (delay 4.0, NMS-10) =="
timeout 2400 python tools/diag_ultra_tpu.py ULTRA 150 2>&1 | grep -v WARNING | tail -3
echo "== queue done at $(date) =="
