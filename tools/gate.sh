#!/bin/bash
# Local correctness gate: run Verify at the given sf, then the DuckDB compare.
# Usage: tools/gate.sh [sf_dir] (default /root/testdata/sf0.01)
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=/tmp/verify_out_$(basename "$SF")
rm -rf "$OUT"
sbt --batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -Ev '^(Compiling|Using|\[info\] (welcome|loading|compiling|done|running))' | tail -20
python3 tools/check.py "$OUT" "$SF"
