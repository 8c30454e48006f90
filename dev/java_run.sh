#!/bin/bash
# Direct JVM launcher for graft mains (same flags as build.sbt) — lets
# long passes run outside the sbt server so dev compiles stay unblocked.
CP="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS --add-modules=jdk.incubator.vector \
  -Xmx${SPARK_DRIVER_MEM:-16g} -Xms${SPARK_DRIVER_MEM:-16g} \
  -XX:ReservedCodeCacheSize=1g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
