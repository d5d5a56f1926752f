"""Versioned vocabularies — the per-version frame dictionaries
(id3v2frames.go:21-287): a value valid in one dialect version may be a
violation in another."""

import datetime

from pyspark.sql import functions as F

from tag_spark.operators.checks import RefIntegrity
from tag_spark.operators.suite import ValidationSuite

TS = datetime.datetime(2024, 1, 1)


def test_versioned_vocab(spark):
    # dialect v1 declares only user/assistant; v2 adds tool (like v2.4
    # adding frames v2.3 lacks)
    dim = spark.createDataFrame(
        [("v1", "user"), ("v1", "assistant"), ("v2", "user"), ("v2", "assistant"), ("v2", "tool")],
        "dialect string, role string",
    )
    rows = [
        ("c1", 0, "user", "x", None, TS, "v1"),
        ("c1", 1, "tool", "y", None, TS, "v1"),  # violation: tool not in v1
        ("c2", 0, "tool", "z", None, TS, "v2"),  # fine in v2
        ("c2", 1, "robot", "w", None, TS, "v2"),  # unknown everywhere
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, dialect string"
    )
    suite = ValidationSuite(
        [
            RefIntegrity(
                "role_in_versioned_vocab",
                col="role",
                dim=dim,
                version_col="dialect",
            )
        ]
    )
    viol = suite.violations(df).collect()
    got = {(r["conv_id"], r["turn_idx"]): r["reason"] for r in viol}
    assert set(got) == {("c1", 1), ("c2", 1)}
    assert got[("c1", 1)] == "role not declared for v1: tool"
    assert got[("c2", 1)] == "role not declared for v2: robot"


def test_unversioned_still_works(spark, transcripts):
    from tag_spark.generate import dim_role

    suite = ValidationSuite([RefIntegrity("role_in_vocab", col="role", dim=dim_role(spark))])
    v = suite.violations(transcripts)
    assert v.filter(F.col("reason").contains("robot")).count() > 0
