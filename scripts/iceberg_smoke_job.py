"""Driven by scripts/run_iceberg_smoke.sh (spark-submit --packages ...).

Creates a tiny Iceberg transcripts table, opens it through the SAME
open_table() entry the engine uses, runs the full constraint suite on it,
and prints the Iceberg snapshot id that would feed
CheckpointManifest.snapshot_id for lineage pinning. Exit 0 = the Iceberg
branch of open_table is live end-to-end.
"""

from pyspark.sql import SparkSession

from tag_spark.generate import dim_role, dim_tool, generate_transcripts
from tag_spark.operators.suite import default_transcript_suite
from tag_spark.sources.reader import open_table

spark = SparkSession.builder.appName("tag-spark-iceberg-smoke").getOrCreate()

TABLE = "local.db.transcripts_smoke"
generate_transcripts(spark, n_convs=200, seed=7).writeTo(TABLE).createOrReplace()

df = open_table(spark, TABLE)  # the Iceberg branch — jar present via --packages
res = default_transcript_suite(dim_role(spark), dim_tool(spark)).run(df)
n_viol = res.violations.count()

snap = spark.sql(f"SELECT snapshot_id FROM {TABLE}.snapshots ORDER BY committed_at DESC LIMIT 1").first()
print(f"ICEBERG SMOKE OK: {df.count()} turns, {n_viol} violations, snapshot_id={snap['snapshot_id']}")
spark.stop()
