#!/bin/bash
# Round-5 post-garden chip batch: remaining evidence runs, strictly
# serialized after the garden queue exits (one chip client at a time —
# PLAN.md round-5 tunnel findings). Ordered by evidence value; each item
# is timeboxed AND the whole batch refuses to start new items after the
# UTC cutoff so the driver's end-of-round bench finds a free chip.
#
# Usage: setsid nohup bash tools/r5_postgarden.sh > /tmp/r5_post.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CUTOFF_EPOCH=$(date -u -d '23:55' +%s)

# wait (up to 7h) for the garden queue to release the chip
for i in $(seq 1 840); do
    if ! ps -p "$(cat /tmp/r5_queue.pid 2>/dev/null || echo 0)" \
            > /dev/null 2>&1; then
        break
    fi
    sleep 30
done

run_item () {
    local name="$1" tmo="$2"; shift 2
    if [ "$(date -u +%s)" -ge "$CUTOFF_EPOCH" ]; then
        echo "=== SKIP $name (past cutoff) ==="
        return 0
    fi
    echo "=== $name $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@"
    echo "=== $name exit=$? $(date -u +%H:%M:%S) ==="
}

run_item bench_variants 3600 python -u tools/bench_variants.py
run_item bench_4d 4800 python -u tools/bench_4d.py all
run_item profile_render 1800 python -u tools/profile_render.py
run_item profile_stages 1800 python -u tools/profile_stages.py 150000 1245184
echo "=== batch done $(date -u +%H:%M:%S) ==="
