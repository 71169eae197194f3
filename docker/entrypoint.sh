#!/usr/bin/env bash
# Container entrypoint: validate the environment contract, then submit
# the streaming app in client mode against the configured master.
#
# The eight-variable contract matches the reference deployment
# (entrypoint.sh:7-14 there); validation is delegated to the package's
# typed config loader (`--check-config`), which names EVERY missing or
# malformed variable instead of stopping at the first.
set -euo pipefail

echo "[entrypoint] validating environment contract"
python3 -m ohlc_spark_streaming_spark --check-config

# Debug escape hatch: any provided command replaces spark-submit.
if [ "$#" -gt 0 ]; then
  echo "[entrypoint] executing provided command: $*"
  exec "$@"
fi

SCALA_SUFFIX="2.13"
SPARK_VERSION="$(/opt/spark/bin/spark-submit --version 2>&1 \
  | grep -oE 'version [0-9]+\.[0-9]+\.[0-9]+' | head -1 | cut -d' ' -f2)"

SPARK_CMD=(/opt/spark/bin/spark-submit
  --master "${SPARK_MASTER_URL}"
  --deploy-mode client
  --name "${SPARK_APP_NAME}"
  --conf "spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_${SCALA_SUFFIX}:${SPARK_VERSION}"
  --conf "spark.sql.adaptive.enabled=true"
  --py-files /opt/app/ohlc_spark_streaming_spark
  /opt/app/ohlc_spark_streaming_spark/__main__.py
)

echo "[entrypoint] running: ${SPARK_CMD[*]}"
exec "${SPARK_CMD[@]}"
