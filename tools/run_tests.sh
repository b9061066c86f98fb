#!/usr/bin/env bash
# Run ScalaTest suites directly on the compiled test-classes — bypasses
# the sbt launcher (and its project lock), so a spec subset can run
# under an alternate master (SPARK_GRAFT_MASTER=local-cluster[2,2,2048])
# or while sbt is busy. Compile first (`sbt Test/compile`); this script
# does NOT rebuild.
#
# Usage: tools/run_tests.sh <SuiteFQCN> [more suites...]
# Env:   SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_MASTER
set -euo pipefail
cd "$(dirname "$0")/.."
# Locate the test-scope jars in whatever coursier cache this machine has
# (any mirror layout works — we glob for the artifact names, not a URL).
CACHE="${COURSIER_CACHE:-$HOME/.cache/coursier}"
TESTCP="$(find "$CACHE" \
  \( -name 'scalatest*_2.13-3.2.19.jar' -o -name 'scalatest-compatible-3.2.19.jar' \
     -o -name 'scalactic_2.13-3.2.19.jar' -o -name 'scala-xml_2.13-2.1.0.jar' \) \
  | sort -u | paste -sd:)"
CP="$PWD/target/scala-2.13/classes:$PWD/target/scala-2.13/test-classes:/opt/spark/jars/*:$TESTCP"
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
ARGS=()
for p in $OPENS; do ARGS+=(--add-opens "$p=ALL-UNNAMED"); done
SUITES=()
for s in "$@"; do SUITES+=(-s "$s"); done
exec java "${ARGS[@]}" -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" org.scalatest.tools.Runner \
  -R "$PWD/target/scala-2.13/test-classes" -o "${SUITES[@]}"
