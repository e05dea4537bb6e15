#!/bin/bash
# Round-5 post-garden chip batch: the remaining evidence runs, strictly
# serialized after the garden-parity queue exits (one chip client at a
# time). Ordered by evidence value; each section is individually
# timeboxed so a hang cannot eat the round.
#
# Usage: setsid nohup bash tools/r5_postgarden.sh > /tmp/r5_post.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# wait (up to 6h) for the garden queue to release the chip
for i in $(seq 1 720); do
    if ! ps -p "$(cat /tmp/r5_queue.pid 2>/dev/null || echo 0)" \
            > /dev/null 2>&1; then
        break
    fi
    sleep 30
done

echo "=== bench_variants $(date -u +%H:%M:%S) ==="
timeout 3600 python -u tools/bench_variants.py
echo "=== bench_4d $(date -u +%H:%M:%S) ==="
timeout 5400 python -u tools/bench_4d.py all
echo "=== profile_render $(date -u +%H:%M:%S) ==="
timeout 2400 python -u tools/profile_render.py
echo "=== bench_binning_split $(date -u +%H:%M:%S) ==="
timeout 2400 python -u tools/bench_binning_split.py
echo "=== profile_stages $(date -u +%H:%M:%S) ==="
timeout 2400 python -u tools/profile_stages.py 150000 1245184
echo "=== batch done $(date -u +%H:%M:%S) ==="
