#!/bin/bash
# End-to-end correctness chain, producing the round's committable hard
# signal: compile → graft.Verify (parquet dumps + oracle_sql.json) →
# tools/check_oracle.py DuckDB compare → CORRECTNESS_LOCAL.json in the
# driver's exact per-query format. Run at every round close so the round
# is never evidence-free even if the driver-side artifact drops it.
#
# Usage: tools/correctness.sh [sf_dir] [out_json]
set -e
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_JSON="${2:-CORRECTNESS_LOCAL.json}"
VERIFY_OUT="$(mktemp -d /tmp/graft_verify.XXXXXX)"
CLASSES="$(mktemp -d /tmp/graft_classes.XXXXXX)"
trap 'rm -rf "$VERIFY_OUT" "$CLASSES"' EXIT

sbt -batch compile
# snapshot classes: a later sbt recompile must not race the running JVM
cp -r target/scala-2.13/classes/. "$CLASSES"
tools/runmain.sh -cp "$CLASSES" graft.Verify "$SF_DIR" "$VERIFY_OUT"
python3 tools/check_oracle.py "$SF_DIR" "$VERIFY_OUT" "$OUT_JSON"
