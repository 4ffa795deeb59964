#!/usr/bin/env bash
# Test runner with the reference's mode split (tools/run_tests.sh):
#   unit        — hermetic tests only (integration skipped)
#   integration — subprocess server tests
#   abuse       — backpressure/limit abuse scenarios
#   all         — everything
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-unit}"
case "$MODE" in
  fast)
    # pre-commit lane: hermetic tests minus the compile-heavy `slow`
    # marks. Wall time is dominated by XLA-CPU jit compiles, which have
    # no persistent cache on the CPU backend, so the lane scales with
    # cores: ~14 min on a 1-core image, minutes on a developer machine.
    STT_SKIP_INTEGRATION=1 python -m pytest tests/ -q -m "not slow" ;;
  unit)
    STT_SKIP_INTEGRATION=1 python -m pytest tests/ -q ;;
  integration)
    python -m pytest tests/test_integration.py -q ;;
  abuse)
    STT_RUN_ABUSE_TESTS=1 python -m pytest tests/test_abuse_scenarios.py -q ;;
  all)
    STT_RUN_ABUSE_TESTS=1 python -m pytest tests/ -q ;;
  *)
    echo "usage: $0 [fast|unit|integration|abuse|all]" >&2; exit 2 ;;
esac
