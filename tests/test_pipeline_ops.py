"""Round-5 pipeline operators: as-of join (vs pandas merge_asof), PII
detection/redaction (vs Python re), repetition metrics (hand counts),
benchmark decontamination (hand fixture), and plan-shape pins."""

import re
from datetime import datetime

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from tag_spark.operators.asof import asof_join
from tag_spark.operators.dedup import contamination_check
from tag_spark.operators.pii import PII_PATTERNS, pii_profile, redact
from tag_spark.operators.text import repetition_profile


def _ts(s):
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

LEFT = [
    Row(event_id=10, user_id=1, ts=_ts("2024-01-01 00:00:05")),
    Row(event_id=11, user_id=1, ts=_ts("2024-01-01 00:00:10")),  # == right ts: inclusive
    Row(event_id=12, user_id=1, ts=_ts("2024-01-01 00:00:20")),
    Row(event_id=13, user_id=2, ts=_ts("2024-01-01 00:00:01")),  # no prior right row
    Row(event_id=14, user_id=3, ts=_ts("2024-01-01 00:00:30")),  # key absent on right
]
RIGHT = [
    Row(user_id=1, ts=_ts("2024-01-01 00:00:02"), event_id=100, value=1.0),
    Row(user_id=1, ts=_ts("2024-01-01 00:00:10"), event_id=101, value=2.0),
    Row(user_id=1, ts=_ts("2024-01-01 00:00:10"), event_id=102, value=3.0),  # dup ts: max wins
    Row(user_id=2, ts=_ts("2024-01-01 00:00:05"), event_id=103, value=4.0),
]


def test_asof_join_semantics(spark):
    out = asof_join(
        spark.createDataFrame(LEFT),
        spark.createDataFrame(RIGHT),
        on="user_id",
        ts_col="ts",
        payload_cols=["event_id", "value"],
        tie_break="event_id",
    )
    got = {r["event_id"]: (r["asof_event_id"], r["asof_value"]) for r in out.collect()}
    assert got == {
        10: (100, 1.0),  # latest prior
        11: (102, 3.0),  # equal ts inclusive + dup-ts tie-break to max event_id
        12: (102, 3.0),  # carried forward
        13: (None, None),  # nothing at or before
        14: (None, None),  # key never on right
    }
    # left rows are never duplicated or dropped
    assert out.count() == len(LEFT)


def test_asof_join_matches_pandas_merge_asof(spark, transcripts):
    """Independent engine replay: pandas merge_asof (backward, inclusive)
    over a few hundred deterministic rows derived from the transcript
    generator's event-ish columns."""
    base = (
        transcripts.select(
            F.col("conv_id"),
            F.col("turn_idx"),
            (F.xxhash64("conv_id") % 5).alias("k"),
            F.timestamp_seconds(F.unix_timestamp(F.col("ts").cast("timestamp"))).alias("ts"),
        )
        .filter(F.col("turn_idx") < 6)
        .limit(400)
        .cache()
    )
    left = base.filter(F.col("turn_idx") % 2 == 0).select("k", "ts", F.col("turn_idx").alias("lid"))
    right = base.filter(F.col("turn_idx") % 2 == 1).select(
        "k", "ts", F.col("turn_idx").alias("rid"), (F.col("turn_idx") * 1.5).alias("v")
    )
    # collapse duplicate (k, ts) exactly as the operator will
    out = asof_join(left, right, on="k", ts_col="ts", payload_cols=["rid", "v"], tie_break="rid")
    got = out.toPandas().sort_values(["k", "ts", "lid"]).reset_index(drop=True)

    lp = left.toPandas()
    rp = right.toPandas()
    rp = rp.sort_values("rid").groupby(["k", "ts"], as_index=False).last()  # max rid per (k,ts)
    exp = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts").rename(columns={"rid": "asof_rid", "v": "asof_v"}),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values(["k", "ts", "lid"]).reset_index(drop=True)
    assert list(got["asof_rid"].fillna(-1)) == list(exp["asof_rid"].fillna(-1))
    assert list(got["asof_v"].fillna(-1.0)) == list(exp["asof_v"].fillna(-1.0))


def test_asof_join_single_exchange(spark):
    """One shuffle (on the key) and one sort: the union-sort-fill plan,
    not a range-join explosion."""
    out = asof_join(
        spark.createDataFrame(LEFT),
        spark.createDataFrame(RIGHT),
        on="user_id",
        payload_cols=["value"],
        tie_break="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # pre-dedup agg + window may each exchange on user_id, but there must
    # be no join operator at all and no nested-loop amplification
    assert "Join" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

PII_DOCS = [
    Row(doc_id=0, text="mail a.b+c@ex-1.org and 10.0.0.255 done"),
    Row(doc_id=1, text="ssn 123-45-6789 card 4111 1111 1111 1111"),
    Row(doc_id=2, text="call +1 555 867 5309 x2"),
    Row(doc_id=3, text="clean text with digits 12345"),
    Row(doc_id=4, text=None),
]


def test_pii_counts_and_redaction_match_python_re(spark):
    prof = pii_profile(spark.createDataFrame(PII_DOCS)).collect()
    by_id = {r["doc_id"]: r for r in prof}
    for row in PII_DOCS:
        text = row.text or ""
        exp_counts = {name: len(re.findall(pat, text)) for name, pat in PII_PATTERNS}
        got = by_id[row.doc_id]
        for name, n in exp_counts.items():
            assert got[f"n_{name}"] == n, (row.doc_id, name)
        assert got["n_pii"] == sum(exp_counts.values())
        assert got["has_pii"] == (sum(exp_counts.values()) > 0)
        red = text
        for name, pat in PII_PATTERNS:
            red = re.sub(pat, f"<{name.upper()}>", red)
        import hashlib

        assert got["redacted_md5"] == hashlib.md5(red.encode()).hexdigest()


def test_redact_consumes_most_specific_first(spark):
    # the 16-digit card is rewritten before the SSN/phone shapes could
    # partially match its digit groups
    df = spark.createDataFrame([Row(t="pay 4111 1111 1111 1111 now")])
    out = df.select(redact("t").alias("r")).first()["r"]
    assert out == "pay <CC16> now"


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


def test_repetition_profile_hand_counts(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b a b a"),  # words: a×3 b×2; bigrams: ab×2 ba×2
            Row(doc_id=1, text="x"),  # one word, no bigrams
            Row(doc_id=2, text="  "),  # tokenless
            Row(doc_id=3, text=None),
        ]
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_profile(docs).collect()}
    assert got[0]["n_words"] == 5 and got[0]["n_distinct_words"] == 2
    assert got[0]["dup_word_frac"] == round(1 - 2 / 5, 6)
    assert got[0]["top_word_frac"] == round(3 / 5, 6)
    assert got[0]["top_bigram_frac"] == 0.5  # 2 of 4 bigrams
    assert got[1] == {
        "doc_id": 1,
        "n_words": 1,
        "n_distinct_words": 1,
        "dup_word_frac": 0.0,
        "top_word_frac": 1.0,
        "top_bigram_frac": 0.0,
    }
    for d in (2, 3):  # degenerate docs stay present with zero metrics
        assert got[d]["n_words"] == 0 and got[d]["dup_word_frac"] == 0.0


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_check(spark):
    bench = spark.createDataFrame([Row(doc_id=100, text="q w e r t y")])
    corpus = spark.createDataFrame(
        [
            Row(doc_id=0, text="q w e r t y u"),  # superstring: all 4 bench shingles hit
            Row(doc_id=1, text="z q w e r z z z"),  # one shared 4-gram
            Row(doc_id=2, text="totally different words here now"),  # clean
            Row(doc_id=3, text="q w e"),  # too short for a 4-gram
        ]
    )
    got = {r["doc_id"]: r.asDict() for r in contamination_check(corpus, bench, k=4).collect()}
    assert set(got) == {0, 1}  # clean/short docs are absent
    # doc 0: shingles {qwer, wert, erty, rtyu} -> 3 of 4 in bench {qwer, wert, erty}
    assert got[0]["n_hits"] == 3 and got[0]["n_shingles"] == 4
    assert got[0]["contamination"] == 0.75
    assert got[1]["n_hits"] == 1 and got[1]["n_shingles"] == 5
    plan = contamination_check(corpus, bench, k=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the eval set is the broadcast side


# ---------------------------------------------------------------------------
# sessionization + binned range join
# ---------------------------------------------------------------------------

from tag_spark.operators.sessions import range_join_binned, session_stats, sessionize  # noqa: E402


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: 3 events, gap of exactly 1800s (NOT a boundary: > only),
        # then 1801s (boundary)
        Row(user_id=1, event_id=1, ts=_ts("2024-01-01 00:00:00")),
        Row(user_id=1, event_id=2, ts=_ts("2024-01-01 00:30:00")),  # +1800s: same session
        Row(user_id=1, event_id=3, ts=_ts("2024-01-01 01:00:01")),  # +1801s: new session
        # user 2: duplicate ts rows stay deterministic via event_id order
        Row(user_id=2, event_id=4, ts=_ts("2024-01-01 00:00:00")),
        Row(user_id=2, event_id=5, ts=_ts("2024-01-01 00:00:00")),
    ]
    out = sessionize(spark.createDataFrame(rows), gap_seconds=1800, tie_break="event_id")
    got = {r["event_id"]: (r["session_idx"], r["session_id"]) for r in out.collect()}
    assert got[1] == (0, "1#0") and got[2] == (0, "1#0")
    assert got[3] == (1, "1#1")
    assert got[4] == (0, "2#0") and got[5] == (0, "2#0")


def test_sessionize_single_sort(spark):
    rows = [Row(user_id=1, event_id=i, ts=_ts(f"2024-01-01 00:00:{i:02d}")) for i in range(5)]
    out = sessionize(spark.createDataFrame(rows), gap_seconds=10, tie_break="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lag + running sum share one window spec -> exactly one Sort
    assert plan.count("Sort ") <= 1 or plan.count("[Sort") <= 1
    assert plan.count("Exchange") <= 1 + plan.count("Exchange SinglePartition")


def test_session_stats(spark):
    rows = [
        Row(user_id=1, event_id=1, ts=_ts("2024-01-01 00:00:00")),
        Row(user_id=1, event_id=2, ts=_ts("2024-01-01 00:10:00")),
        Row(user_id=1, event_id=3, ts=_ts("2024-01-01 02:00:00")),
    ]
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in session_stats(spark.createDataFrame(rows), gap_seconds=1800, tie_break="event_id").collect()
    }
    assert got == {(1, 0): (2, 600.0), (1, 1): (1, 0.0)}


def test_range_join_binned_matches_naive(spark):
    # window 60s; right events placed same-bin, next-bin-within-window,
    # next-bin-outside-window, before-left, and other-key
    left = spark.createDataFrame([Row(user_id=1, lid=0, ts=_ts("2024-01-01 00:00:50"))])
    right = spark.createDataFrame(
        [
            Row(user_id=1, rid=0, ts=_ts("2024-01-01 00:00:55")),  # same bin, in window
            Row(user_id=1, rid=1, ts=_ts("2024-01-01 00:01:30")),  # next bin, in window (40s later)
            Row(user_id=1, rid=2, ts=_ts("2024-01-01 00:01:50")),  # exactly +60s: inclusive
            Row(user_id=1, rid=3, ts=_ts("2024-01-01 00:01:51")),  # +61s: out
            Row(user_id=1, rid=4, ts=_ts("2024-01-01 00:00:40")),  # before left: out
            Row(user_id=2, rid=5, ts=_ts("2024-01-01 00:00:55")),  # other key: out
        ]
    )
    out = range_join_binned(left, right, on="user_id", window_seconds=60)
    assert sorted(r["r_rid"] for r in out.collect()) == [0, 1, 2]
    # a left row is never duplicated per matching right row beyond the match itself
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_join_binned_matches_naive_bulk(spark, transcripts):
    """Randomized-ish (deterministic-generator) cross-check vs the naive
    O(n^2) join on a few hundred rows."""
    ev = (
        transcripts.select(
            (F.xxhash64("conv_id") % 4).alias("k"),
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("turn_idx").alias("eid"),
        )
        .filter(F.col("ts").isNotNull())
        .limit(300)
        .cache()
    )
    left = ev.select("k", "ts", F.col("eid").alias("lid"))
    right = ev.select("k", "ts", F.col("eid").alias("rid"))
    w = 3600
    fast = range_join_binned(left, right, on="k", window_seconds=w).select("k", "lid", "r_rid", "r_ts")
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.unix_micros(F.col("r.ts")) <= F.unix_micros(F.col("l.ts")) + w * 1_000_000),
        )
        .select(F.col("l.k"), F.col("l.lid"), F.col("r.rid").alias("r_rid"), F.col("r.ts").alias("r_ts"))
    )
    assert fast.count() == naive.count()
    assert fast.exceptAll(naive).count() == 0 and naive.exceptAll(fast).count() == 0
