#!/bin/bash
# Direct-JVM graft.Verify runner (no sbt lock — protocol sweeps can run
# in parallel). Usage:
#   tools/run_verify_java.sh <sfDir> <outDir> [xmx]
# Env passthrough: SPARK_GRAFT_CPUS/ANSI/AQE/CODEGEN/ONLY as in Verify.
set -e
SF="$1"; OUT="$2"; XMX="${3:-12g}"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS -Xmx$XMX \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  graft.Verify "$SF" "$OUT"
