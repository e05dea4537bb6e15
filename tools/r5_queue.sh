#!/bin/bash
# Round-5 serialized chip queue (the tunneled chip tolerates ONE client at
# a time — PLAN.md round-5 findings): headline bench first (measures the
# decode-diet + exact-limb changes), then the garden-parity 30k evidence
# run. Launch DETACHED (setsid nohup) so a driver/session restart cannot
# kill the long run:
#   setsid nohup bash tools/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== bench.py start $(date -u +%H:%M:%S) ==="
timeout 5400 python -u bench.py
echo "=== garden parity start $(date -u +%H:%M:%S) ==="
python -u tools/garden_parity.py all
echo "=== queue done $(date -u +%H:%M:%S) ==="
