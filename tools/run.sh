#!/usr/bin/env bash
# Run a graft main class directly on the compiled classes + the Spark
# distribution jars, bypassing sbt (so long sweeps don't hold the
# build lock). Usage: tools/run.sh graft.ScaleSweep /tmp/graft_sf1 out.json
set -euo pipefail
cd "$(dirname "$0")/.."
CLS="$1"; shift
# the JPMS opens Spark's own launcher injects (JavaModuleOptions)
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# heap matches build.sbt's forked-run default so timings stay
# comparable with sbt-launched artifacts
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dderby.system.home=/tmp/graft-derby \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLS" "$@"
