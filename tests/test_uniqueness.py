"""HLL screen + exact confirm two-phase uniqueness (A2)."""

from pyspark.sql import functions as F

from tag_spark.generate import generate_transcripts
from tag_spark.operators.uniqueness import check_uniqueness


def test_clean_data_screens_clean(spark):
    df = generate_transcripts(spark, n_convs=300, seed=3, plants=False)
    rep = check_uniqueness(df, ["conv_id", "turn_idx"])
    assert rep.screened_clean
    assert rep.duplicates is None


def test_planted_dups_found_exactly(spark, transcripts):
    rep = check_uniqueness(transcripts, ["conv_id", "turn_idx"], force_exact=True)
    assert not rep.screened_clean
    assert rep.duplicates is not None
    dups = rep.duplicates
    n_dup_rows = dups.count()
    # every duplicate group fully materialized with ranks 0..k-1
    per_group = dups.groupBy("conv_id", "turn_idx").agg(F.count(F.lit(1)).alias("n"), F.min("dup_rank").alias("lo"), F.max("dup_rank").alias("hi"))
    bad = per_group.filter((F.col("n") < 2) | (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    assert bad.count() == 0
    # cross-check against a plain exact count
    exact = (
        transcripts.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).agg(F.sum("count")).first()[0]
    )
    assert n_dup_rows == exact


def test_force_exact_on_clean_returns_empty(spark):
    df = generate_transcripts(spark, n_convs=100, seed=5, plants=False)
    rep = check_uniqueness(df, ["conv_id", "turn_idx"], force_exact=True)
    assert rep.duplicates.count() == 0
