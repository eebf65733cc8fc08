#!/bin/bash
# Per-stage profile of one or more queries (graft.tools.ProfileQuery) —
# same JVM flags as tools/bench.sh. Usage:
#   SPARK_GRAFT_ONLY=q93_pagerank tools/profile.sh [passes]
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MEM="${SPARK_DRIVER_MEM:-16g}"
cd "$(mktemp -d /tmp/graft-prof-XXXX)"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx$MEM -Xms$MEM -XX:ReservedCodeCacheSize=1g \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ProfileQuery "$@"
