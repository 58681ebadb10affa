#!/bin/bash
# Run a graft main class on the compiled classes directly (outside sbt),
# so long ParityRun/GoldenRun jobs don't hold the sbt project lock that
# `sbt test` iterations need. Mirrors build.sbt's forked-run JVM flags.
set -euo pipefail
cd "$(dirname "$0")/.."
# GRAFT_CLASSES: point long background runs at a frozen snapshot of the
# classes dir so concurrent `sbt compile` can't swap bytecode under a
# running JVM (lazily-loaded lambda classes would mismatch).
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
