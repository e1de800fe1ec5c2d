#!/bin/bash
# Run a graft main from a FROZEN jar snapshot, bypassing sbt, so long
# rehearsal phases survive concurrent `sbt compile` rewrites of
# target/scala-2.13/classes (the class-file race in MEMORY). Mirrors
# build.sbt's javaOptions (JDK17 add-opens, UTC, UI off, heap).
# Usage: tools/run_main_jar.sh <jar> <mainClass> [args...]
set -euo pipefail
JAR="$1"; MAIN="$2"; shift 2
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io \
         java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-32g}" \
  -cp "$JAR:/opt/spark/jars/*" "$MAIN" "$@"
