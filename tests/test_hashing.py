"""Canonical digest family (C1-C3 analogs, sum.go:14-219)."""

import hashlib

from pyspark.sql import functions as F

from tag_spark.functions.hashing import column_subset_digest, conversation_digest, turn_sha1


def test_turn_sha1_matches_reference_formula(spark):
    df = spark.createDataFrame([("c1", 0, "hello")], "conv_id string, turn_idx int, text string")
    got = df.select(turn_sha1().alias("h")).first()["h"]
    want = hashlib.sha1("c1\x1f0\x1fhello".encode()).hexdigest()
    assert got == want


def test_turn_sha1_null_text(spark):
    df = spark.createDataFrame([("c1", 0, None)], "conv_id string, turn_idx int, text string")
    got = df.select(turn_sha1().alias("h")).first()["h"]
    assert got == hashlib.sha1("c1\x1f0\x1f<null>".encode()).hexdigest()


def test_conversation_digest_order_invariant(spark, transcripts):
    a = conversation_digest(transcripts)
    b = conversation_digest(transcripts.orderBy(F.rand(7)))
    ja = {r["conv_id"]: r["conv_sha1"] for r in a.collect()}
    jb = {r["conv_id"]: r["conv_sha1"] for r in b.collect()}
    assert ja == jb


def test_column_subset_digest_is_metadata_invariant(spark, transcripts):
    # SumAtoms analog: mutating excluded columns must not change the digest
    base = column_subset_digest(transcripts, ["text"])
    mutated = column_subset_digest(transcripts.withColumn("role", F.lit("zzz")), ["text"])
    ja = {r["conv_id"]: r["payload_sha1"] for r in base.collect()}
    jb = {r["conv_id"]: r["payload_sha1"] for r in mutated.collect()}
    assert ja == jb
    # but mutating an included column must change it
    changed = column_subset_digest(transcripts.withColumn("text", F.concat(F.coalesce("text", F.lit("")), F.lit("!"))), ["text"])
    jc = {r["conv_id"]: r["payload_sha1"] for r in changed.collect()}
    assert ja != jc
