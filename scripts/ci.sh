#!/usr/bin/env bash
# CI entry point (the reference ships GitHub Actions container builds,
# .github/workflows/build_test.yml:1-60; this is the TPU-native repo's
# equivalent: a pure-CPU pytest run, split fast/slow).
#
#   scripts/ci.sh fast   # core suite, no slow marks (< ~3 min warm)
#   scripts/ci.sh slow   # multi-device subprocesses + e2e pipelines
#   scripts/ci.sh        # both groups
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS || true

group="${1:-all}"
case "$group" in
  fast) exec python -m pytest tests/ -q -m "not slow" ;;
  slow) exec python -m pytest tests/ -q -m "slow" ;;
  all)
    python -m pytest tests/ -q -m "not slow"
    exec python -m pytest tests/ -q -m "slow"
    ;;
  *) echo "usage: scripts/ci.sh [fast|slow|all]" >&2; exit 2 ;;
esac
