#!/bin/bash
# Plain-java runner for the graft mains — avoids the sbt build lock so
# long pressure/gate runs can share the box with compiles. Mirrors
# build.sbt's jdk17AddOpens + default confs.
# Usage: HEAP=80g tools/spark_java.sh graft.BenchAtScale <args...>
set -euo pipefail
cd "$(dirname "$0")/.."
HEAP="${HEAP:-8g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"$HEAP" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
