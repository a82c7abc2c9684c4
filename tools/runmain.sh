#!/bin/bash
# Run a graft main class against the compiled classes dir without sbt
# (avoids the sbt lock; same JVM flags as build.sbt's javaOptions).
# Usage: tools/runmain.sh [-cp <classesdir>] graft.Verify args...
CLASSES=target/scala-2.13/classes
if [ "$1" = "-cp" ]; then CLASSES="$2"; shift 2; fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"${SPARK_DRIVER_MEM:-8g}" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
