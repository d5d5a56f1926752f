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


def test_exclusion_digests_c4_c6(spark):
    """C4/C5/C6: mutating EXCLUDED turns leaves the digest unchanged;
    mutating a KEPT turn changes it (sum.go:117-215 analogs)."""
    from tag_spark.functions.hashing import (
        digest_excluding_edges,
        digest_excluding_header,
        digest_excluding_trailer,
    )

    def tdf(head, mid, tail):
        return spark.createDataFrame(
            [("c", 0, head), ("c", 1, mid), ("c", 2, "steady"), ("c", 3, tail)],
            "conv_id string, turn_idx int, text string",
        )

    base = tdf("h", "m", "t")
    for fn, mutant_same, mutant_diff in [
        (digest_excluding_header, tdf("CHANGED", "m", "t"), tdf("h", "CHANGED", "t")),
        (digest_excluding_trailer, tdf("h", "m", "CHANGED"), tdf("h", "CHANGED", "t")),
        (digest_excluding_edges, tdf("CHANGED", "m", "ALSO"), tdf("h", "CHANGED", "t")),
    ]:
        d0 = fn(base).first()["payload_sha1"]
        assert fn(mutant_same).first()["payload_sha1"] == d0, fn.__name__
        assert fn(mutant_diff).first()["payload_sha1"] != d0, fn.__name__
    # order-insensitive: physical row order never matters
    from pyspark.sql import functions as F

    shuffled = base.orderBy(F.rand(3))
    assert digest_excluding_edges(shuffled).first()["payload_sha1"] == digest_excluding_edges(base).first()["payload_sha1"]


def test_exclusion_digest_short_conversation(spark):
    """Fewer turns than the exclusion window -> empty-sequence digest, not
    an error; n_hashed clamps at 0."""
    from tag_spark.functions.hashing import exclusion_digest

    df = spark.createDataFrame([("c", 0, "only")], "conv_id string, turn_idx int, text string")
    row = exclusion_digest(df, skip_head=1, skip_tail=1).first()
    assert row["n_hashed"] == 0
    import hashlib

    assert row["payload_sha1"] == hashlib.sha1(b"").hexdigest()


def test_exclusion_digest_md5_variant(spark):
    from tag_spark.functions.hashing import exclusion_digest

    df = spark.createDataFrame([("c", i, f"t{i}") for i in range(4)], "conv_id string, turn_idx int, text string")
    row = exclusion_digest(df, skip_head=1, algo="md5").first()
    assert len(row["payload_md5"]) == 32 and row["n_hashed"] == 3
