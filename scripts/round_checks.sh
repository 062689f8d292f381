#!/usr/bin/env bash
# One-command round validation: everything the per-round driver and
# judge will exercise, in dependency order, fail-fast. Usage:
#   bash scripts/round_checks.sh [quick]
# "quick" skips the full pytest suite and the bench (registry + window
# dry-run only).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile check =="
python -m compileall -q database_fragmentation_and_query_processor_spark \
    scripts bench.py __spark_entry__.py tests

echo "== registry window tripwires =="
python -m pytest tests/test_registry_window.py tests/test_bench_contract.py \
    -q -p no:cacheprovider

echo "== driver-invocation dry run (first 50 + next 6, sf0.01) =="
python scripts/driver_sim.py 56 /root/testdata/sf0.01

if [ "${1:-}" = "quick" ]; then
    echo "quick mode: skipping full suite + bench"
    exit 0
fi

echo "== full pytest suite (incl. sf0.001 oracle sweep) =="
python -m pytest tests/ -q -p no:cacheprovider

echo "== bench (sf0.1) =="
python bench.py
