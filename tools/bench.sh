#!/bin/bash
# Direct-JVM bench runner — same JVM flags as `sbt "runMain graft.Bench"`
# (build.sbt javaOptions) without sbt's lock/startup. Usage:
#   SPARK_GRAFT_ONLY=q170_hits tools/bench.sh [workdir]
# Writes bench_full.json into the workdir (default: a fresh temp dir).
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
WORK="${1:-$(mktemp -d /tmp/graft-bench-XXXX)}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MEM="${SPARK_DRIVER_MEM:-16g}"
cd "$WORK"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx$MEM -Xms$MEM -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
