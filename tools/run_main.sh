#!/usr/bin/env bash
# Run a graft main directly on the compiled classes — bypasses the sbt
# launcher (and its project lock), so long evidence benches can run
# while sbt compiles/tests in parallel. Compile first (`sbt compile`);
# this script does NOT rebuild.
#
# Usage: tools/run_main.sh <MainClass> [args...]
# Env:   SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
set -euo pipefail
cd "$(dirname "$0")/.."
CP="$PWD/target/scala-2.13/classes:/opt/spark/jars/*"
# JDK17 module opens Spark needs outside spark-submit (same list as build.sbt)
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
ARGS=()
for p in $OPENS; do ARGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${ARGS[@]}" -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
