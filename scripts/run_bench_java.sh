#!/bin/bash
# Run graft.Bench from the already-compiled classes directory with plain
# java — the adjudication-pair launcher: no sbt involvement, so concurrent
# edits/compiles in the working tree cannot disturb a running measurement
# (the classes dir is COPIED to a snapshot first).
# Usage: run_bench_java.sh <snapshot_dir> <sf_dir> <out_json> [samples]
set -euo pipefail
SNAP="$1"; SF="$2"; OUT="$3"; SAMPLES="${4:-1}"
if [ ! -d "$SNAP" ]; then
  mkdir -p "$SNAP"
  cp -a target/scala-2.13/classes/. "$SNAP/"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_SAMPLES="$SAMPLES" \
java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" graft.Bench > "$OUT" 2> "$OUT.err"
tail -1 "$OUT"
