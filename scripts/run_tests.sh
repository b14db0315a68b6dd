#!/usr/bin/env bash
# Canonical green-suite command for this box (VERDICT r2 Weak #7).
#
# Long single-process pytest runs occasionally SEGFAULT inside XLA's CPU
# backend_compile_and_load at a random position (not a test failure — see
# CLAUDE.md). Two shorter processes sidestep it reproducibly: run the suite
# as two chunks and fail if either chunk fails.
#
# Usage: scripts/run_tests.sh [extra pytest args, e.g. -m "not slow"]
set -u
cd "$(dirname "$0")/.."

rc=0
echo "=== chunk 1/2: tests/test_[a-o]* ==="
python -m pytest tests/test_[a-o]*.py -q "$@" || rc=1
echo "=== chunk 2/2: tests/test_[p-z]* ==="
python -m pytest tests/test_[p-z]*.py -q "$@" || rc=1
exit $rc
