"""End-to-end suite semantics: every planted violation class is caught,
clean data passes, output is byte-for-byte deterministic (north_rule)."""

import pytest
from pyspark.sql import functions as F

from tag_spark.functions.hashing import frame_digest
from tag_spark.generate import dim_role, dim_tool, generate_transcripts
from tag_spark.operators.suite import ValidationSuite, default_transcript_suite

VIOL_COLS = ["check_id", "severity", "conv_id", "turn_idx", "column", "reason", "text_sha1"]


@pytest.fixture(scope="module")
def result(spark, transcripts):
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(transcripts)
    res.violations = res.violations.cache()
    res.verdicts = res.verdicts.cache()
    return res


def _ids(result):
    return {r["check_id"] for r in result.violations.select("check_id").distinct().collect()}


def test_every_planted_class_caught(result):
    got = _ids(result)
    expected = {
        "role_in_vocab",  # PLANT_UNKNOWN_ROLE
        "tool_in_vocab",  # PLANT_UNKNOWN_TOOL
        "unique_turn",  # PLANT_DUP_TURN
        "turn_contiguous",  # PLANT_TURN_GAP / PLANT_NEG_IDX
        "ts_monotone",  # PLANT_TS_REGRESS
        "text_not_null",  # PLANT_NULL_TEXT
        "tool_requires_assistant",  # PLANT_TOOL_ON_USER
        "ts_in_epoch_range",  # PLANT_TS_RANGE
        "turn_idx_nonneg",  # PLANT_NEG_IDX
        "text_max_len",  # PLANT_OVERSIZE
        "text_nonempty",  # empty-edge population (warn)
        "text_no_nul",  # encoding population (warn)
    }
    assert expected <= got, f"missing: {expected - got}"


def test_unique_turn_materializes_all_members(result):
    # reference KEEPS duplicate frames (renames _0/_1, id3v2.go:329-336):
    # every member of a duplicate group must appear, ranked.
    dups = result.violations.filter(F.col("check_id") == "unique_turn")
    per_key = dups.groupBy("conv_id", "turn_idx").count()
    assert per_key.count() > 0
    assert per_key.filter(F.col("count") < 2).count() == 0
    ranks = {r["reason"].rsplit("=", 1)[1] for r in dups.collect()}
    assert {"0", "1"} <= ranks


def test_clean_data_has_no_error_violations(spark):
    clean = generate_transcripts(spark, n_convs=150, seed=42, plants=False)
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    v = suite.run(clean).violations
    errors = v.filter(F.col("severity") == "error")
    assert errors.count() == 0, errors.limit(5).collect()
    # warn-class anomalies (empty-edge, NUL text) are tolerated but reported
    assert v.filter(F.col("severity") == "warn").count() > 0


def test_byte_for_byte_determinism_across_parallelism(spark, transcripts):
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    v1 = suite.violations(transcripts)
    v2 = suite.violations(transcripts.repartition(17))
    assert frame_digest(v1, VIOL_COLS) == frame_digest(v2, VIOL_COLS)


def test_verdict_matrix(result, transcripts):
    verd = result.verdicts
    n_checks = 15
    buckets = result.bucket_counts.count()
    assert verd.count() == buckets * n_checks
    assert {r["verdict"] for r in verd.select("verdict").distinct().collect()} <= {"PASS", "FAIL", "WARN"}
    # rows_checked sums to table size per check
    total = transcripts.count()
    per_check = verd.groupBy("check_id").agg(F.sum("rows_checked").alias("n")).collect()
    assert all(r["n"] == total for r in per_check)
    # warn-severity checks never FAIL
    warn_fail = verd.filter((F.col("check_id").isin("text_nonempty", "text_no_nul")) & (F.col("verdict") == "FAIL"))
    assert warn_fail.count() == 0
    # violation counts agree with the violations frame
    vc = result.violations.groupBy("check_id").count().collect()
    vmap = {r["check_id"]: r["count"] for r in vc}
    agg = verd.groupBy("check_id").agg(F.sum("rows_violating").alias("n")).collect()
    for r in agg:
        assert r["n"] == vmap.get(r["check_id"], 0)


def test_stable_order(result):
    rows = ValidationSuite.stable_violations(result.violations).limit(100).collect()
    keys = [(r["check_id"], r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys, key=lambda k: (k[0], k[1], k[2] if k[2] is not None else -(10**9)))


def test_conditional_null_antecedent_is_a_pass(spark):
    """NULL `when` means the rule doesn't apply — matching SQL-oracle
    semantics (`when AND NOT coalesce(then, FALSE)` skips NULL-when rows).
    Regression for the advisor finding on Conditional.predicate."""
    from tag_spark.operators.checks import Conditional, SEV_WARN

    df = spark.createDataFrame(
        [
            ("purchase", -1.0),  # when TRUE, then FALSE -> violation
            ("purchase", 5.0),  # when TRUE, then TRUE  -> pass
            (None, -1.0),  # when NULL -> rule doesn't apply -> pass
            (None, None),  # when NULL, then NULL -> pass
            ("purchase", None),  # when TRUE, then NULL -> violation
            ("click", -1.0),  # when FALSE -> pass
        ],
        "event_type string, value double",
    )
    suite = ValidationSuite(
        [Conditional("purchase_value_positive", SEV_WARN, when_sql="event_type = 'purchase'", then_sql="value > 0")],
        key_cols=("event_type", "value"),
        hash_col="event_type",
    )
    viol = suite.violations(df).collect()
    flagged = {(r["conv_id"], r["turn_idx"]) for r in viol}
    assert flagged == {("purchase", -1.0), ("purchase", None)}


def test_screened_unique_skips_exchange_on_clean_table(spark):
    """Unique(screen='exact') must not plan a row exchange on its keys when
    the table is duplicate-free — and must still appear as PASS in the
    verdict matrix. On a dirty table the violations are identical to the
    unscreened check."""
    from tag_spark.operators.checks import NotNull, SEV_ERROR, Unique

    def mk_suite(screen):
        return ValidationSuite(
            [
                NotNull("eid_not_null", SEV_ERROR, col="event_id"),
                Unique("unique_event_id", SEV_ERROR, keys=("event_id",), rank_by=("ts", "__sha1"), screen=screen),
            ],
            key_cols=("user_id", "event_id"),
            hash_col="props",
        )

    clean = spark.createDataFrame(
        [(i, i % 7, None, "{}") for i in range(500)], "event_id long, user_id long, ts timestamp, props string"
    )
    dirty = clean.union(spark.createDataFrame([(13, 1, None, "{}"), (14, 2, None, "{}")], clean.schema))

    res_clean = mk_suite("exact").run(clean)
    plan = res_clean.violations._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(event_id" not in plan, "screened-clean Unique still planned its exchange"
    verd = {r["check_id"]: r["verdict"] for r in res_clean.verdicts.collect()}
    assert verd["unique_event_id"] == "PASS"

    dirty_screened = mk_suite("exact").violations(dirty)
    plan_dirty = dirty_screened._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(event_id" in plan_dirty, "screen must fall through to the exact window on dup data"
    got = {(r["check_id"], r["conv_id"], r["turn_idx"]) for r in dirty_screened.collect()}
    want = {(r["check_id"], r["conv_id"], r["turn_idx"]) for r in mk_suite(None).violations(dirty).collect()}
    assert got == want and any(c == "unique_event_id" for c, _, _ in got)
