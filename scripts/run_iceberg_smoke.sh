#!/usr/bin/env bash
# Iceberg smoke test — the PRODUCTION path for open_table's first branch.
#
# This sandbox ships no iceberg-spark-runtime jar and has no network to
# resolve one (verified: ~/.ivy2 and ~/.m2 absent, maven unreachable, no
# *iceberg* jar anywhere on disk), so this script is the documented,
# runnable-on-a-real-cluster recipe rather than a CI-gated test here.
# Everything it exercises EXCEPT the catalog wiring is covered live by
# tests: the parquet snapshot surrogate (table_snapshot) and the
# changed-snapshot resume e2e (tests/test_checkpoint.py).
#
# Usage (any Spark 4.x cluster or laptop with network):
#   ICEBERG_VER=1.10.0 WAREHOUSE=/tmp/iceberg_wh ./scripts/run_iceberg_smoke.sh
set -euo pipefail

ICEBERG_VER="${ICEBERG_VER:-1.10.0}"
WAREHOUSE="${WAREHOUSE:-/tmp/tag_spark_iceberg_wh}"
PKG="org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:${ICEBERG_VER}"

exec spark-submit \
  --packages "${PKG}" \
  --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
  --conf spark.sql.catalog.local.type=hadoop \
  --conf "spark.sql.catalog.local.warehouse=${WAREHOUSE}" \
  --py-files dist/tag_spark.zip \
  scripts/iceberg_smoke_job.py
