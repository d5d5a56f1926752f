"""Declared-vs-actual count check (A4, vorbis.go:41-60 analog)."""

from pyspark.sql import functions as F

from tag_spark.operators.declared import conversation_meta, declared_count_violations


def test_matching_counts_pass(spark, transcripts):
    meta = conversation_meta(transcripts)
    v = declared_count_violations(transcripts, meta)
    assert v.count() == 0


def test_mismatch_and_missing_flagged(spark, transcripts):
    meta = conversation_meta(transcripts)
    # corrupt one declaration, drop another conversation from the metadata
    some = [r["conv_id"] for r in meta.select("conv_id").orderBy("conv_id").limit(2).collect()]
    tampered = (
        meta.withColumn(
            "declared_turns",
            F.when(F.col("conv_id") == some[0], F.col("declared_turns") + 5).otherwise(F.col("declared_turns")),
        )
        .filter(F.col("conv_id") != some[1])
    )
    v = {r["conv_id"]: r["reason"] for r in declared_count_violations(transcripts, tampered).collect()}
    assert set(v) == set(some)
    assert "declared" in v[some[0]] and "found" in v[some[0]]
    assert "missing from metadata" in v[some[1]]
