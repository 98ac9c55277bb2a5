#!/bin/bash
# Direct-JVM runner for graft mains: skips sbt startup (~20s) during
# optimization iteration. Usage: scripts/run_main.sh graft.Bench [args...]
# Env (SPARK_GRAFT_*) passes through unchanged. NOT the driver contract
# (the driver runs `sbt "runMain graft.Bench"`); this exists so local
# measurement loops are cheap.
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC ${SPARK_EXTRA_JAVA_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
