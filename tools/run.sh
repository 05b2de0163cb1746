#!/usr/bin/env bash
# Fast local runner: compile once with sbt, then run mains with plain java
# (skips sbt JVM startup). Usage:
#   tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/graft_verify
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS ${GRAFT_JVM_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Djts.overlay=ng \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" "$@"
