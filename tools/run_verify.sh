#!/bin/bash
# Dev runner for graft.Verify/Bench/tools with the same JVM flags sbt's
# forked run uses (Spark 4 on JDK 17 needs the add-opens; MLlib's Kryo
# breaks without java.nio open — the round-10 q70 false alarm).
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# GRAFT_CLASSES: override the class dir (bench_ab.sh points it at a
# worktree's build to bench a past ref in the same host window)
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-24g} $EXTRA_JAVA_OPTS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" "$@"
