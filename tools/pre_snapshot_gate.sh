#!/bin/sh
# Pre-snapshot gate (VERDICT r8 item "What's wrong" 2 / "Next round" 8):
# the round-8 snapshot was committed with a deterministically-failing test
# in the tree because the suite was never run after the final code change.
# This script IS the gate: run it before every end-of-round commit and
# refuse to snapshot on a non-zero exit. PIPESTATUS-safe by construction —
# the pytest exit code is captured directly, not a pipeline tail's.
set -u
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
rc=$?
if [ "$rc" -ne 0 ]; then
    echo "PRE-SNAPSHOT GATE: RED (pytest exit $rc) — do not commit the snapshot" >&2
    exit "$rc"
fi
echo "PRE-SNAPSHOT GATE: GREEN — safe to snapshot"
