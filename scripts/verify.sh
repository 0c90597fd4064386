#!/bin/bash
# Run graft.Verify at sf0.01 then the DuckDB compare.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -Ev '^\[info\]|WARN' | tail -20
python3 scripts/check.py "$SF" "$OUT"
