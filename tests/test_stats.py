"""Per-bucket stats collectors: builtin vs Arrow-UDAF cross-check (A6)."""

from pyspark.sql import functions as F

from tag_spark.operators.stats import collect_stats_arrow, collect_stats_builtin

COLS = ["turn_idx", "role", "text", "tool", "ts"]


def test_arrow_and_builtin_agree_on_exact_fields(spark, transcripts):
    a = collect_stats_arrow(transcripts, COLS, n_buckets=8).toPandas().set_index(["bucket_id", "column"]).sort_index()
    b = collect_stats_builtin(transcripts, COLS, n_buckets=8).toPandas().set_index(["bucket_id", "column"]).sort_index()
    assert list(a.index) == list(b.index)
    # exact fields must agree exactly
    assert (a["count"] == b["count"]).all()
    assert (a["nulls"] == b["nulls"]).all()
    # string min/max agree for string columns
    roles = a.xs("role", level="column")["min"], b.xs("role", level="column")["min"]
    assert (roles[0] == roles[1]).all()


def test_stats_totals(spark, transcripts):
    s = collect_stats_arrow(transcripts, ["text"], n_buckets=8)
    total = s.agg(F.sum("count")).first()[0]
    nulls = s.agg(F.sum("nulls")).first()[0]
    assert total == transcripts.count()
    assert nulls == transcripts.filter(F.col("text").isNull()).count()


def test_arrow_handles_adversarial_timestamps(spark, transcripts):
    # year-9999 rows must not break the Arrow path (they did pre-fix)
    s = collect_stats_arrow(transcripts, ["ts"], n_buckets=4).toPandas()
    assert len(s) > 0
    # ts is reported as epoch seconds; year-9999 shows up as a huge max
    assert s["max"].astype(float).max() > 2e11


def test_builtin_quantiles_sane(spark, transcripts):
    s = collect_stats_builtin(transcripts, ["turn_idx"], n_buckets=4).toPandas()
    assert ((s["p25"] <= s["p50"]) & (s["p50"] <= s["p75"]) & (s["p75"] <= s["p95"])).all()
