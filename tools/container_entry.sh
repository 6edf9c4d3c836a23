#!/usr/bin/env bash
# Container entrypoint: spark-submit the retention job with the
# env-var contract the reference pod carries (pod.yaml:14-33).
# The SAME script is the in-container smoke: point GRAFT_DATA_DIR at a
# mounted fixture dir and check the "PROCESS END" line + sink buckets,
# which is exactly what tools/submit_smoke.sh asserts outside the
# container.
set -euo pipefail

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
JAR="${GRAFT_JAR:-/opt/graft/graft.jar}"
MASTER="${SPARK_MASTER:-local[*]}"

exec "$SPARK_HOME/bin/spark-submit" \
  --class graft.retention.RetentionJob \
  --master "$MASTER" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  "$JAR" \
  "${CLIENT_CODE:-ALL}" \
  "${GRAFT_DATA_DIR:-/data}" \
  "${GRAFT_SINK:-/sink}" \
  "${SPARK_PROCESS_BATCH_SIZE:-10000}"
