#!/bin/bash
# On-chip kernel-regression tier runner (VERDICT r4 ask #6).
#
# Rules this encodes:
# - FULL output preserved to a timestamped log (no tail-piping: a failure
#   body must never be lost to a pipe buffer);
# - one process at a time against the tunneled chip (run nothing else);
# - transient tunneled-backend JaxRuntimeErrors already get ONE in-test
#   retry (tests/test_tpu_kernels.py:_retry_transient);
# - the persistent compile cache (.jax_cache) makes warm reruns ~5 min.
#
# Usage: bash tools/run_tpu_tier.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
log="/tmp/tpu_tier_$(date +%Y%m%d_%H%M%S).log"
echo "logging to $log"
FASTERGS_TPU_TESTS=1 timeout 3600 python -u -m pytest tests/ -m tpu -v "$@" 2>&1 | tee "$log"
rc=${PIPESTATUS[0]}
echo "exit=$rc  (full log: $log)"
exit "$rc"
