#!/usr/bin/env bash
# One-command FULL test suite (fast tier + all slow e2e tests).
#
# Why batched: every live XLA:CPU executable holds ~3 mmap regions; a
# single process running all 260+ tests at 8 virtual devices exhausts
# vm.max_map_count and dies inside backend_compile_and_load (root cause +
# deterministic repro: tools/xla_cpu_mapcount_repro.py). The per-module
# clear_caches() fixture in tests/conftest.py bounds the count, and this
# script adds process isolation: the fast tier runs in one process, the
# slow tier in BATCH_COUNT fresh processes — each batch also fits a tight
# per-invocation wall-clock (CI-style ~10 min windows on this single-core
# host). A batch failure fails the script (after all batches report).
#
# Usage: tools/run_full_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=      # no axon tunnel: CPU-only, local compiles
export JAX_PLATFORMS=cpu

BATCH_COUNT=${BATCH_COUNT:-3}
FAIL=0

echo "=== fast tier (pytest -m 'not slow') ==="
python -m pytest tests/ -m 'not slow' -q "$@" || FAIL=1

# slow-marked files, round-robined into BATCH_COUNT processes
SLOW_FILES=$(grep -l "pytest.mark.slow" tests/test_*.py | sort)
for ((b = 0; b < BATCH_COUNT; b++)); do
    BATCH=$(echo "$SLOW_FILES" | awk -v b="$b" -v n="$BATCH_COUNT" \
            'NR % n == b')
    [ -z "$BATCH" ] && continue
    echo "=== slow tier batch $((b + 1))/$BATCH_COUNT ==="
    # shellcheck disable=SC2086
    python -m pytest $BATCH -m slow -q "$@" || FAIL=1
done

if [ "$FAIL" -ne 0 ]; then
    echo "FULL SUITE: FAILURES (see above)"
    exit 1
fi
echo "FULL SUITE: all green"
