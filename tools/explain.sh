#!/bin/bash
# Capture explain("formatted") for queries into files. Usage:
#   SPARK_GRAFT_ONLY=q93_pagerank tools/explain.sh plans/r12 before
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
OUT="${1:?outdir}"
SUFFIX="${2:?suffix}"
mkdir -p "$OUT"
OUT="$(cd "$OUT" && pwd)"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd "$(mktemp -d /tmp/graft-explain-XXXX)"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx8g -XX:ReservedCodeCacheSize=512m \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ExplainQuery "$OUT" "$SUFFIX"
