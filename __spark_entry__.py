"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the validation engine's
violation output over the sf0.001 events table). ``queries()`` exposes each
implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB
ANSI-SQL equivalent the driver cross-checks at sf0.01.

Numeric outputs are either exact integers, exact decimal-backed sums cast to
double after aggregation, or doubles rounded to ≤6 dp, so value hashes are
stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# engine-on-testdata queries: the suite's own violation rows, oracle-checked
# ---------------------------------------------------------------------------


def _events_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tag_spark.operators.generic_suites import events_suite, violation_keys

    return violation_keys(events_suite(), _t(spark, sf_dir, "events"), ("user_id", "event_id"))


_EVENTS_VIOLATIONS_SQL = """
WITH viol AS (
    SELECT 'event_type_in_vocab' AS check_id, 'error' AS severity, user_id, event_id
    FROM events
    WHERE event_type IS NOT NULL AND event_type NOT IN ('click','view','purchase','signup')
  UNION ALL
    SELECT 'value_nonneg', 'error', user_id, event_id FROM events
    WHERE value IS NOT NULL AND value < 0
  UNION ALL
    SELECT 'purchase_value_positive', 'warn', user_id, event_id FROM events
    WHERE event_type = 'purchase' AND NOT coalesce(value > 0, FALSE)
  UNION ALL
    SELECT 'unique_event_id', 'error', user_id, event_id FROM (
        SELECT user_id, event_id, count(*) OVER (PARTITION BY event_id) AS c FROM events
    ) WHERE c > 1
  UNION ALL
    SELECT 'ts_monotone', 'error', user_id, event_id FROM (
        -- NULLS FIRST pins DuckDB (default NULLS LAST) to Spark's ASC default
        SELECT user_id, event_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id NULLS FIRST) AS prev
        FROM events
    ) WHERE prev IS NOT NULL AND ts IS NOT NULL AND ts < prev
  UNION ALL
    SELECT 'event_id_not_null', 'error', user_id, event_id FROM events WHERE event_id IS NULL
  UNION ALL
    SELECT 'ts_not_null', 'error', user_id, event_id FROM events WHERE ts IS NULL
)
SELECT check_id, severity, CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id
FROM viol
"""


def _lineitem_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tag_spark.operators.generic_suites import lineitem_suite, violation_keys

    return violation_keys(lineitem_suite(), _t(spark, sf_dir, "lineitem"), ("l_orderkey", "l_linenumber"))


_LINEITEM_VIOLATIONS_SQL = """
WITH viol AS (
    SELECT 'returnflag_in_vocab' AS check_id, 'error' AS severity, l_orderkey, l_linenumber
    FROM lineitem WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R')
  UNION ALL
    SELECT 'quantity_in_range', 'error', l_orderkey, l_linenumber FROM lineitem
    WHERE l_quantity IS NOT NULL AND NOT (l_quantity >= 1.0 AND l_quantity <= 50.0)
  UNION ALL
    SELECT 'discount_in_range', 'error', l_orderkey, l_linenumber FROM lineitem
    WHERE l_discount IS NOT NULL AND NOT (l_discount >= 0.0 AND l_discount <= 1.0)
  UNION ALL
    SELECT 'unique_lineitem', 'error', l_orderkey, l_linenumber FROM (
        SELECT l_orderkey, l_linenumber, count(*) OVER (PARTITION BY l_orderkey, l_linenumber) AS c
        FROM lineitem
    ) WHERE c > 1
  UNION ALL
    SELECT 'linenumber_contiguous', 'warn', l_orderkey, l_linenumber FROM (
        SELECT l_orderkey, l_linenumber,
               lag(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS prev
        FROM lineitem
    ) WHERE (prev IS NULL AND l_linenumber <> 1)
       OR (prev IS NOT NULL AND l_linenumber <> prev + 1 AND l_linenumber <> prev)
  UNION ALL
    SELECT 'shipdate_monotone', 'warn', l_orderkey, l_linenumber FROM (
        SELECT l_orderkey, l_linenumber, l_shipdate,
               lag(l_shipdate) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_shipdate) AS prev
        FROM lineitem
    ) WHERE prev IS NOT NULL AND l_shipdate IS NOT NULL AND l_shipdate < prev
)
SELECT check_id, severity, CAST(l_orderkey AS BIGINT) AS l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
FROM viol
"""


# ---------------------------------------------------------------------------
# scalar / agg / join operators (SURVEY.md §2.2-2.8 analogs)
# ---------------------------------------------------------------------------


def _dialect_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S2/Identify analog: cheap classification pre-pass
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def _unique_event_id_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2 analog: duplicate screening (exact arm; HLL screen is engine-internal)
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("n_dupes"),
    )


def _ref_orders_customer_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1 analog: referential integrity via broadcast anti-join
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    orphans = o.join(F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))), "o_custkey", "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # flagship analytics query (A1-style histogramming at full width);
    # decimal-exact sums, cast to double post-agg for a stable hash.
    # Averages are ONE double division of the exact decimal sum by the
    # non-null count — NOT avg(decimal): Spark's decimal avg divides in
    # exact decimal (HALF_UP at scale+4) while DuckDB's avg(DECIMAL)
    # returns an inexact DOUBLE, and at a .xxxx5 money boundary the two
    # round(…, 4) results differ by one ulp (caught by the generated-
    # corpus fuzz planting 901.005 prices). Identical exact operands →
    # identical double → identical rounding in both engines. try_divide:
    # an all-NULL group averages to NULL, not a crash.
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("count_order"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        # exact integer state for the averages: cent-scaled sums (x100 of
        # a scale-2 decimal is integer-valued, the cast is lossless) and
        # non-null counts
        (F.sum(dec("l_quantity")) * 100).cast("long").alias("__aq"),
        F.count("l_quantity").alias("__nq"),
        (F.sum(dec("l_extendedprice")) * 100).cast("long").alias("__ap"),
        F.count("l_extendedprice").alias("__np"),
    )

    def _avg4(a: str, b: str):
        # HALF-UP-away-from-zero at 4dp in EXACT integer arithmetic:
        # q = (2|a'|+b) div (2b) with a' = cents*100 (so q is the avg
        # scaled by 1e4), then ONE division of a small exact integer by
        # 1e4 — both engines compute the identical double. All-decimal or
        # all-double alternatives are NOT portable: DuckDB decimal
        # division lands in DOUBLE, and the engines' round(double, n)
        # algorithms differ by one ulp at .xxxx5 money boundaries (caught
        # by the generated-corpus fuzz planting 901.005 prices). Overflow
        # bound: |sum| < 2^63/2e4 dollars per group — fine below ~4.6e14.
        q = F.expr(f"(2 * abs({a} * 100) + {b}) div (2 * {b})")
        return F.when(
            F.col(b) > 0, (F.signum(F.col(a)).cast("long") * q).cast("double") / F.lit(10000.0)
        ).otherwise(F.lit(None).cast("double"))

    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "count_order",
        "sum_qty",
        "sum_base_price",
        _avg4("__aq", "__nq").alias("avg_qty"),
        _avg4("__ap", "__np").alias("avg_price"),
    )


def _events_ts_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F9 analog: timestamp validity/span — exact integer microseconds
    e = _t(spark, sf_dir, "events")
    # parquet timestamps load as TIMESTAMP_NTZ; session tz is pinned UTC so
    # the cast is lossless and matches DuckDB's naive-UTC epoch_us()
    return e.agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("min_ts_us"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("max_ts_us"),
        F.count(F.when((F.year("ts") < 1970) | (F.year("ts") > 2100), 1)).alias("n_out_of_range"),
    )


def _null_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P15/A6 analog: null-rate profile in one pass
    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(F.col(c)).alias(f"nn_{c}") for c in cols],
    )


def _props_json_k_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.8 JSON functions: raw-map escape hatch (Raw()/mbz Info analog)
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.agg(
        F.count(k).alias("n_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
    )


def _doc_text_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C1 analog: canonical per-record content hash (md5: common to both engines)
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(F.col("text")).alias("text_md5"))


def _doc_exact_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact dedup via content-hash grouping (A2 hashes analog)
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col("text")))).alias("n_dup_docs"),
    )


def _doc_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drift-histogram builder (engine §2.4 A6 / PSI input)
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.floor(F.length("text") / 100).cast("long").alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


def _events_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's full loop on events: per-(bucket, check) verdict matrix."""
    from tag_spark.operators.generic_suites import events_suite

    res = events_suite().run(_t(spark, sf_dir, "events"))
    return res.verdicts.select(
        F.col("bucket_id").cast("long").alias("bucket_id"),
        "check_id",
        "verdict",
        "rows_checked",
        "rows_violating",
    )


_EVENTS_VERDICTS_SQL = """
WITH viol AS (
    SELECT 'event_type_in_vocab' AS check_id, coalesce(user_id % 64, 0) AS bucket_id FROM events
    WHERE event_type IS NOT NULL AND event_type NOT IN ('click','view','purchase','signup')
  UNION ALL
    SELECT 'value_nonneg', coalesce(user_id % 64, 0) FROM events WHERE value IS NOT NULL AND value < 0
  UNION ALL
    SELECT 'purchase_value_positive', coalesce(user_id % 64, 0) FROM events
    WHERE event_type = 'purchase' AND NOT coalesce(value > 0, FALSE)
  UNION ALL
    SELECT 'unique_event_id', coalesce(user_id % 64, 0) FROM (
        SELECT user_id, count(*) OVER (PARTITION BY event_id) AS c FROM events) WHERE c > 1
  UNION ALL
    SELECT 'ts_monotone', coalesce(user_id % 64, 0) FROM (
        SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id NULLS FIRST) AS prev FROM events
    ) WHERE prev IS NOT NULL AND ts IS NOT NULL AND ts < prev
  UNION ALL
    SELECT 'event_id_not_null', coalesce(user_id % 64, 0) FROM events WHERE event_id IS NULL
  UNION ALL
    SELECT 'ts_not_null', coalesce(user_id % 64, 0) FROM events WHERE ts IS NULL
),
buckets AS (SELECT coalesce(user_id % 64, 0) AS bucket_id, count(*) AS rows_checked FROM events GROUP BY 1),
checks(check_id, severity) AS (VALUES
  ('event_id_not_null','error'), ('ts_not_null','error'), ('event_type_in_vocab','error'),
  ('value_nonneg','error'), ('purchase_value_positive','warn'), ('unique_event_id','error'),
  ('ts_monotone','error')),
vc AS (SELECT check_id, bucket_id, count(*) AS rows_violating FROM viol GROUP BY 1, 2)
SELECT CAST(b.bucket_id AS BIGINT) AS bucket_id, c.check_id,
  CASE WHEN coalesce(vc.rows_violating, 0) = 0 THEN 'PASS'
       WHEN c.severity = 'warn' THEN 'WARN' ELSE 'FAIL' END AS verdict,
  CAST(b.rows_checked AS BIGINT) AS rows_checked,
  CAST(coalesce(vc.rows_violating, 0) AS BIGINT) AS rows_violating
FROM buckets b CROSS JOIN checks c
LEFT JOIN vc ON vc.bucket_id = b.bucket_id AND vc.check_id = c.check_id
"""


def _doc_len_drift_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift module's fixed-layout clamped histogram (PSI input)."""
    from tag_spark.operators.drift import histogram

    d = _t(spark, sf_dir, "documents")
    return histogram(d, F.length("text"), "doc_len", 0.0, 500.0, 10).select(
        "metric", F.col("bucket").cast("long").alias("bucket"), F.round("lo", 6).alias("lo"), F.round("hi", 6).alias("hi"), "count"
    )


_DOC_LEN_DRIFT_SQL = """
WITH b AS (
  SELECT CAST(least(greatest(floor(length(text) / 50.0), 0), 9) AS BIGINT) AS bucket
  FROM documents WHERE length(text) IS NOT NULL)
SELECT 'doc_len' AS metric, bucket,
  round(bucket * 50.0, 6) AS lo, round((bucket + 1) * 50.0, 6) AS hi,
  CAST(count(*) AS BIGINT) AS count
FROM b GROUP BY bucket
"""


def _doc_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tag_spark.operators.text import bpe_ish_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.sum(token_count("text")).alias("total_tokens"),
        F.sum(bpe_ish_token_count("text")).alias("total_tokens_bpe"),
        F.round(F.avg(token_count("text")), 6).alias("avg_tokens"),
    )


_DOC_TOKEN_TOTALS_SQL = r"""
WITH t AS (
  SELECT CASE WHEN text IS NULL THEN NULL
              WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         CASE WHEN text IS NULL THEN NULL
              ELSE greatest(
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+')) END,
                CAST(ceil(length(trim(text)) / 4.0) AS BIGINT)) END AS n_bpe
  FROM documents)
SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_bpe) AS BIGINT) AS total_tokens_bpe,
       round(avg(n_tokens), 6) AS avg_tokens
FROM t
"""


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (chunk 64 / stride 48) — the RAG /
    long-context split step, frame-loop analog (id3v2.go:319-344: one
    payload sliced into bounded frames). The engine explodes words ONCE and
    reassembles chunks in one partial-aggregable groupBy (no per-chunk
    re-split — CLAUDE.md's CollapseProject rule); the oracle rebuilds every
    chunk independently with DuckDB list slicing."""
    from tag_spark.operators.packing import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), chunk_size=64, stride=48)


_DOC_CHUNKS_SQL = r"""
WITH docs AS (
  SELECT doc_id, list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '') AS w
  FROM documents
)
SELECT doc_id,
       CAST(k AS INT) AS chunk_idx,
       CAST(len(list_slice(w, k * 48 + 1, k * 48 + 64)) AS BIGINT) AS n_tokens,
       md5(list_aggregate(list_slice(w, k * 48 + 1, k * 48 + 64), 'string_agg', ' ')) AS chunk_md5
FROM docs, unnest(range(0, CAST(ceil(len(w) / 48.0) AS BIGINT))) AS t(k)
"""


def _doc_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: each doc's global token offset and the
    first/last 2048-token training sequence it lands in under concat-then-
    cut in doc_id order (byte-offset bookkeeping analog, id3v2.go:319-330).
    The engine computes the global prefix sum WITHOUT a single-partition
    sort (range buckets + bounded driver collect of per-bucket totals +
    per-bucket window); the oracle is the plain global window cumsum the
    two-phase plan must equal by construction."""
    from tag_spark.operators.packing import pack_token_stream

    return pack_token_stream(_t(spark, sf_dir, "documents"), budget=2048, n_buckets=64)


_DOC_PACK_OFFSETS_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN 0
              WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
  FROM documents),
c AS (
  SELECT doc_id, n,
         sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n AS off
  FROM t)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(off AS BIGINT) AS token_offset,
       CAST(off // 2048 AS BIGINT) AS first_seq,
       CAST(CASE WHEN n > 0 THEN (off + n - 1) // 2048 ELSE off // 2048 END AS BIGINT) AS last_seq,
       CAST(CASE WHEN n > 0 THEN (off + n - 1) // 2048 - off // 2048 + 1 ELSE 0 END AS BIGINT) AS n_seqs
FROM c
"""


def _events_as_transcripts_sql(ts_kw: str) -> str:
    """Transcript view derived from the events table by expressions BOTH
    engines evaluate identically (row_number over the unique event_id,
    residue-class violation plants). ``ts_kw`` is the only dialect split:
    Spark needs TIMESTAMP_NTZ for the literal to match the parquet column
    type; DuckDB's TIMESTAMP is already naive."""
    return f"""
WITH base AS (
  SELECT user_id, event_id, event_type, ts, props,
         -- NULLS FIRST pins Spark/DuckDB divergence; md5(props) tie-breaks
         -- duplicate event_ids deterministically in BOTH engines (today's
         -- testdata has unique non-null event_ids, but the view must stay
         -- parity-stable if that ever changes)
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY event_id NULLS FIRST, md5(coalesce(props, '')) NULLS FIRST
         ) - 1 AS rn
  FROM events
)
SELECT CAST(user_id AS STRING) AS conv_id,
  CASE WHEN event_id % 997 = 13 THEN -1
       WHEN event_id % 97 = 5 THEN rn + 1
       ELSE rn END AS turn_idx,
  CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
       WHEN 'purchase' THEN 'assistant' WHEN 'signup' THEN 'system'
       ELSE 'robot' END AS role,
  CASE WHEN event_id % 211 = 7 THEN ''
       WHEN event_id % 223 = 11 THEN NULL
       WHEN event_id % 227 = 3 THEN props || chr(0) || 'x'
       WHEN event_id % 231 = 9 THEN repeat('x', 20000)
       ELSE props END AS text,
  CASE WHEN event_type = 'purchase' AND event_id % 3 = 0 THEN 'search'
       WHEN event_type = 'signup' AND event_id % 11 = 0 THEN 'bash'
       WHEN event_type = 'view' AND event_id % 13 = 0 THEN 'frobnicate'
       ELSE NULL END AS tool,
  CASE WHEN event_id % 229 = 17 THEN {ts_kw} '9999-01-01 00:00:00'
       WHEN event_id % 233 = 19 THEN NULL
       ELSE ts END AS ts
FROM base
"""


def _transcript_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL default transcript suite (all 15 checks: required fields,
    hygiene warns, bounds, the cross-field conditional, both vocabulary
    referential checks, uniqueness, contiguity, monotonicity) driven over a
    transcript view derived from the events table — so the complete engine
    loop is verified row-for-row by an independent SQL oracle. The
    synthetic-generator corpus stays byte-pinned in tests/test_golden.py."""
    from tag_spark.generate import dim_role, dim_tool
    from tag_spark.operators.suite import default_transcript_suite

    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    tview = spark.sql(_events_as_transcripts_sql("TIMESTAMP_NTZ"))
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    return suite.violations(tview).select(
        "check_id", "severity", "conv_id", F.col("turn_idx").cast("long").alias("turn_idx")
    )


def _transcript_violations_oracle() -> str:
    from tag_spark.schema import DEFAULT_ROLES, DEFAULT_TOOLS

    roles = ", ".join(f"'{r}'" for r in DEFAULT_ROLES)
    tools = ", ".join(f"'{t}'" for t in DEFAULT_TOOLS)
    return f"""
WITH tview AS ({_events_as_transcripts_sql("TIMESTAMP")}),
w AS (
  SELECT conv_id, turn_idx, ts,
         lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx NULLS FIRST, ts NULLS FIRST) AS prev_idx,
         lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx NULLS FIRST, ts NULLS FIRST) AS prev_ts,
         count(*) OVER (PARTITION BY conv_id, turn_idx) AS dup_c
  FROM tview
), viol AS (
    SELECT 'turn_idx_not_null' AS check_id, 'error' AS severity, conv_id, turn_idx FROM tview WHERE turn_idx IS NULL
  UNION ALL SELECT 'role_not_null', 'error', conv_id, turn_idx FROM tview WHERE role IS NULL
  UNION ALL SELECT 'ts_not_null', 'error', conv_id, turn_idx FROM tview WHERE ts IS NULL
  UNION ALL SELECT 'text_not_null', 'error', conv_id, turn_idx FROM tview WHERE text IS NULL
  UNION ALL SELECT 'text_nonempty', 'warn', conv_id, turn_idx FROM tview
    WHERE text IS NOT NULL AND length(text) = 0
  UNION ALL SELECT 'text_no_nul', 'warn', conv_id, turn_idx FROM tview
    WHERE text IS NOT NULL AND contains(text, chr(0))
  UNION ALL SELECT 'turn_idx_nonneg', 'error', conv_id, turn_idx FROM tview
    WHERE turn_idx IS NOT NULL AND turn_idx < 0
  UNION ALL SELECT 'ts_in_epoch_range', 'error', conv_id, turn_idx FROM tview
    WHERE ts IS NOT NULL AND NOT (ts >= TIMESTAMP '1970-01-01 00:00:00' AND ts <= TIMESTAMP '2100-01-01 00:00:00')
  UNION ALL SELECT 'text_max_len', 'error', conv_id, turn_idx FROM tview
    WHERE text IS NOT NULL AND length(text) > 16384
  UNION ALL SELECT 'tool_requires_assistant', 'error', conv_id, turn_idx FROM tview
    WHERE tool IS NOT NULL AND NOT coalesce(role = 'assistant', FALSE)
  UNION ALL SELECT 'role_in_vocab', 'error', conv_id, turn_idx FROM tview
    WHERE role IS NOT NULL AND role NOT IN ({roles})
  UNION ALL SELECT 'tool_in_vocab', 'error', conv_id, turn_idx FROM tview
    WHERE tool IS NOT NULL AND tool NOT IN ({tools})
  UNION ALL SELECT 'unique_turn', 'error', conv_id, turn_idx FROM w WHERE dup_c > 1
  UNION ALL SELECT 'turn_contiguous', 'error', conv_id, turn_idx FROM w
    WHERE NOT coalesce((prev_idx IS NOT NULL OR turn_idx = 0)
                   AND (prev_idx IS NULL OR turn_idx = prev_idx + 1 OR turn_idx = prev_idx), FALSE)
  UNION ALL SELECT 'ts_monotone', 'error', conv_id, turn_idx FROM w
    WHERE prev_ts IS NOT NULL AND ts IS NOT NULL AND ts < prev_ts
)
SELECT check_id, severity, conv_id, CAST(turn_idx AS BIGINT) AS turn_idx FROM viol
"""


def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join analytics breadth (lineitem ⋈ orders ⋈ customer ⋈ nation):
    big-big sort-merge joins + broadcast dims, decimal-exact revenue."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1.0).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))).alias("rev")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        )
    )


def _events_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-normalization surface over events: alias-folded event_type,
    trimmed props, epoch-us ts — the Metadata-interface analog phrased on an
    oracle-checkable table."""
    from tag_spark.operators.canonical import _alias_fold

    e = _t(spark, sf_dir, "events")
    etype = _alias_fold(F.col("event_type"), {"click": "click", "tap": "click", "pageview": "view"})
    return e.select(
        "event_id",
        etype.alias("event_type_norm"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value"), 6).alias("value_r"),
    )


_EVENTS_CANONICAL_SQL = """
WITH folded AS (
  SELECT event_id, lower(trim(event_type)) AS et, epoch_us(ts) AS ts_us, round(value, 6) AS value_r
  FROM events)
SELECT event_id,
  CASE et WHEN 'tap' THEN 'click' WHEN 'pageview' THEN 'view' ELSE et END AS event_type_norm,
  ts_us, value_r
FROM folded
"""

_REVENUE_BY_NATION_SQL = """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
  CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def _stats_lineitem_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A6 per-bucket stats collector itself (collect_stats_builtin),
    projected to the exactly-comparable fields (HLL n_distinct and GK
    quantiles are engine sketches — cross-checked engine-vs-engine in
    tests/test_stats.py instead)."""
    from tag_spark.operators.generic_suites import mod_bucket
    from tag_spark.operators.stats import collect_stats_builtin

    li = _t(spark, sf_dir, "lineitem")
    s = collect_stats_builtin(li, ["l_extendedprice", "l_quantity"], n_buckets=8, bucket_fn=mod_bucket, bucket_col="l_orderkey")
    return s.select(
        F.col("bucket_id").cast("long").alias("bucket_id"),
        "column",
        "count",
        "nulls",
        F.round(F.col("min").cast("double"), 6).alias("min_v"),
        F.round(F.col("max").cast("double"), 6).alias("max_v"),
        F.round("mean", 6).alias("mean_v"),
    )


_STATS_LINEITEM_SQL = """
WITH b AS (SELECT l_orderkey % 8 AS bucket_id, l_extendedprice, l_quantity FROM lineitem),
u AS (
  SELECT bucket_id, 'l_extendedprice' AS "column", count(*) AS count,
         count(*) - count(l_extendedprice) AS nulls,
         round(min(l_extendedprice), 6) AS min_v, round(max(l_extendedprice), 6) AS max_v,
         round(avg(l_extendedprice), 6) AS mean_v
  FROM b GROUP BY bucket_id
  UNION ALL
  SELECT bucket_id, 'l_quantity', count(*), count(*) - count(l_quantity),
         round(min(l_quantity), 6), round(max(l_quantity), 6), round(avg(l_quantity), 6)
  FROM b GROUP BY bucket_id
)
SELECT CAST(bucket_id AS BIGINT) AS bucket_id, "column", CAST(count AS BIGINT) AS count,
       CAST(nulls AS BIGINT) AS nulls, min_v, max_v, mean_v
FROM u
"""


def _conversation_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 ordered per-conversation digest over events-as-conversations,
    md5 variant so DuckDB (which has md5 but no sha1) can recompute the
    exact digest: per-row hash over null-sentineled fields, rows ordered by
    (idx NULLS-FIRST-as-long-min, row-hash), digest = hash of the 0x1f-joined
    row hashes. The sha1 default stays pinned in tests/test_golden.py."""
    from tag_spark.functions.hashing import conversation_digest

    e = _t(spark, sf_dir, "events")
    return conversation_digest(e, conv_col="user_id", idx_col="event_id", text_col="props", algo="md5")


_CONVERSATION_DIGESTS_SQL = """
WITH t AS (
  SELECT user_id,
         coalesce(CAST(event_id AS BIGINT), -4611686018427387904) AS ord,
         md5(coalesce(CAST(user_id AS VARCHAR), '<null>') || chr(31)
          || coalesce(CAST(event_id AS VARCHAR), '<null>') || chr(31)
          || coalesce(props, '<null>')) AS h
  FROM events)
SELECT user_id,
       md5(string_agg(h, chr(31) ORDER BY ord, h)) AS conv_md5,
       CAST(count(*) AS BIGINT) AS n_turns
FROM t GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------


def _doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-mix construction: at most k=5 documents per
    language, chosen by (md5(doc_id), doc_id) order — deterministic at any
    parallelism, one shuffle on the stratum key."""
    from tag_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_sample(d, "lang", k=5, id_col="doc_id").select("lang", "doc_id")


_DOC_STRATIFIED_SAMPLE_SQL = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 5
"""


def _doc_hash_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic ~20% subsample as a row-local md5 filter (no
    shuffle; dropped rows never leave the scan stage) — summarized so the
    oracle pins exactly which rows survived."""
    from tag_spark.operators.sampling import hash_sample

    d = _t(spark, sf_dir, "documents")
    s = hash_sample(d, 0.2, "doc_id")
    return s.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        F.sum("doc_id").alias("id_sum"),
    )


_DOC_HASH_SAMPLE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents WHERE md5(CAST(doc_id AS VARCHAR)) < '33333333'
"""


def _embedding_quantized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric per-vector quantization (scale = max|x|/127,
    q = round(x/scale)) — the 4x-smaller-vector form for shuffle-heavy ANN
    candidate stages. Per-vector stats pin the scale and every quantized
    coordinate (sum/min/max over q) against the oracle's replay."""
    from tag_spark.operators.sampling import quantize_embeddings

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale6"),
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


_EMBEDDING_QUANTIZED_SQL = """
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
         embedding
  FROM embeddings
), qq AS (
  -- half-away-from-zero spelled as sign(r)*floor(abs(r)+0.5): floor
  -- arithmetic is bit-identical across engines, round(double) is not
  -- pinned at representable .5 boundaries (Spark HALF_UP on shortest
  -- repr vs DuckDB C round on the raw double)
  SELECT vec_id, scale,
         CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding, x -> CAST(sign(CAST(x AS DOUBLE) / scale) * floor(abs(CAST(x AS DOUBLE) / scale) + 0.5) AS INT)) END AS qv
  FROM q
)
SELECT vec_id, round(scale, 6) AS scale6,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS INT) AS q_min,
       CAST(list_max(qv) AS INT) AS q_max
FROM qq
"""


def _doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tag_spark.operators.text import lang_id, md5_fingerprint, quality_score, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        lang_id("text").alias("lang_guess"),
        md5_fingerprint("text").alias("fingerprint"),
    )


_DOC_PROFILE_SQL = r"""
WITH base AS (
  -- quality/lang/fingerprint coalesce NULL text to '' exactly like the
  -- engine (text.py quality_score/lang_scores/md5_fingerprint); without
  -- the coalesce, DuckDB's NULL-skipping least() scores a NULL doc 0.4
  -- and md5(NULL) is NULL — a parity break the generated-corpus fuzz
  -- (tests/test_oracle_fuzz.py) caught that the NULL-free driver
  -- testdata never exercises. n_tokens stays NULL-in-NULL-out (engine
  -- token_count semantics).
  SELECT doc_id, coalesce(text, '') AS ctext,
         ' ' || coalesce(text, '') || ' ' AS padded,
         CASE WHEN text IS NULL THEN NULL
              WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
), scored AS (
  SELECT doc_id, ctext, n_tokens,
    CAST((length(padded)-length(replace(padded,' the ','')))/5
       + (length(padded)-length(replace(padded,' and ','')))/5
       + (length(padded)-length(replace(padded,' of ','')))/4 AS BIGINT) AS s_en,
    CAST((length(padded)-length(replace(padded,' der ','')))/5
       + (length(padded)-length(replace(padded,' und ','')))/5
       + (length(padded)-length(replace(padded,' die ','')))/5 AS BIGINT) AS s_de,
    CAST((length(padded)-length(replace(padded,' el ','')))/4
       + (length(padded)-length(replace(padded,' los ','')))/5
       + (length(padded)-length(replace(padded,' que ','')))/5 AS BIGINT) AS s_es,
    CAST((length(padded)-length(replace(padded,' le ','')))/4
       + (length(padded)-length(replace(padded,' les ','')))/5
       + (length(padded)-length(replace(padded,' est ','')))/5 AS BIGINT) AS s_fr,
    CAST(length(padded)-length(regexp_replace(padded,'[\x{4e00}-\x{9fff}]','','g')) AS BIGINT) AS s_zh
  FROM base
)
SELECT doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  round(0.4*least(length(ctext)/1000.0, 1.0)
      + 0.3*(CASE WHEN length(ctext) > 0
                  THEN length(regexp_replace(ctext,'[^a-zA-Z0-9 ]','','g'))*1.0/length(ctext)
                  ELSE 0 END)
      + 0.3*least(coalesce(n_tokens,0)/200.0, 1.0), 6) AS quality,
  CASE WHEN s_zh > 0 AND s_zh >= s_en AND s_zh >= s_de AND s_zh >= s_es AND s_zh >= s_fr THEN 'zh'
       WHEN s_en > 0 AND s_en >= s_zh AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_de > 0 AND s_de >= s_zh AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_es > 0 AND s_es >= s_zh AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
       WHEN s_fr > 0 AND s_fr >= s_zh AND s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
       ELSE 'und' END AS lang_guess,
  md5(trim(regexp_replace(regexp_replace(lower(ctext),'[^a-z0-9\s]','','g'),'\s+',' ','g'))) AS fingerprint
FROM scored
"""


def _doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tag_spark.operators.dedup import ngram_jaccard_pairs

    # the frequency cap is MANDATORY at scale: an uncapped boilerplate
    # shingle shared by d docs yields d^2 candidate rows. 1000 is far above
    # any real shingle frequency in this corpus (max observed: 7), so the
    # result set is unchanged — the cap is the 100 TB safety rail.
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), k=3, threshold=0.3, max_shingle_freq=1000)


def _doc_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup endgame: exact-Jaccard pairs resolved into duplicate CLUSTERS
    via distributed connected components (min-label propagation + pointer
    jumping — O(log diameter) rounds of lean (long,long) joins). Every doc
    gets (cluster_id = min id of its component, cluster_size,
    is_canonical); dropping near-dups is then a filter on is_canonical.
    The oracle replays the same components with a recursive CTE."""
    from tag_spark.operators.dedup import neardup_clusters, ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.3, max_shingle_freq=1000)
    return neardup_clusters(d, pairs)


def _doc_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster merge in the driver gate: the stored corpus
    (doc_id % 10 != 7) carries a standing cluster table built from its own
    pairs; the new shard (doc_id % 10 == 7) contributes only
    incrementally-generated pairs (minhash band table vs persisted corpus
    signatures — recall-complete 32x2 banding, exact-Jaccard verified) and
    is merged through the stored table's star edges. Because the star
    graph encodes the old components exactly and the shard pairs equal the
    exact pairs touching the shard, the merged result EQUALS a full
    recompute over all documents — which is precisely what the oracle
    computes (same recursive CTE as doc_neardup_clusters). End-to-end
    incremental correctness, engine vs independent full replay.

    DATA-DEPENDENCE, made loud: the 'merged == full recompute' equality
    relies on the probabilistic MinHash banding (64 hashes / 32 bands)
    being recall-COMPLETE on this corpus — a borderline pair at j≈0.3
    would be missed with p ≈ (1-0.3²)^32 ≈ 5%, which holds empirically for
    the current seeded testdata (every true pair has j ≥ 0.9) but is not
    guaranteed by construction. Rather than let a regenerated corpus
    surface as an opaque hash mismatch, this gate query VERIFIES the
    premise inline: the LSH shard pairs must equal the exact shard-touching
    Jaccard pairs, else it raises with the actionable message."""
    from tag_spark.operators.dedup import (
        minhash_band_table,
        minhash_lsh_pairs_incremental,
        neardup_clusters,
        neardup_clusters_incremental,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 7)
    shard = d.filter(F.col("doc_id") % 10 == 7)
    stored = neardup_clusters(corpus, ngram_jaccard_pairs(corpus, k=3, threshold=0.3, max_shingle_freq=1000))
    index = minhash_band_table(corpus, bands=32)
    shard_pairs = minhash_lsh_pairs_incremental(shard, index, corpus_df=corpus, bands=32, threshold=0.3)
    touching = F.col("id_a") % 10 == 7, F.col("id_b") % 10 == 7
    exact_shard = (
        ngram_jaccard_pairs(d, k=3, threshold=0.3, max_shingle_freq=1000)
        .filter(touching[0] | touching[1])
        .select("id_a", "id_b")
    )
    n_miss = (
        exact_shard.withColumn("__x", F.lit(1))
        .join(shard_pairs.select("id_a", "id_b").withColumn("__l", F.lit(1)), ["id_a", "id_b"], "full_outer")
        .filter(F.col("__x").isNull() | F.col("__l").isNull())
        .count()
    )
    if n_miss:
        raise RuntimeError(
            f"minhash banding is no longer recall-complete on this corpus ({n_miss} "
            "pair(s) differ from the exact shard-touching Jaccard pairs): the "
            "'incremental merge == full recompute' oracle premise broke — the "
            "testdata was likely regenerated with borderline-jaccard near-dups; "
            "raise bands/hashes in _doc_clusters_incremental or re-seed"
        )
    return neardup_clusters_incremental(shard, shard_pairs, stored)


_DOC_JACCARD_SQL = r"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS s
    FROM docs WHERE len(w) >= 3)
), shf AS (  -- mirror of max_shingle_freq=1000: drop boilerplate shingles
  SELECT sh.doc_id, sh.s FROM sh
  JOIN (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000) keep ON keep.s = sh.s
), sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS ni
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
), j AS (
  SELECT ia AS id_a, ib AS id_b, round(ni*1.0/(sa.n + sb.n - ni), 6) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.3
"""

# connected components over the exact-Jaccard pair graph, replayed with a
# recursive CTE: reach(id, r) enumerates every component member r that can
# reach id; min(r) per id IS the min-label cluster id the engine's
# pointer-jumping propagation converges to (both are pure functions of the
# same pair set)
_DOC_CLUSTERS_SQL = (
    _DOC_JACCARD_SQL.replace("WITH docs AS", "WITH RECURSIVE docs AS", 1).replace(
        "SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.3",
        """, pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.3),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM documents
  UNION
  SELECT e.b AS id, rc.r FROM reach rc JOIN edges e ON e.a = rc.id
),
lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
sz AS (SELECT cluster_id, count(*) AS n FROM lab GROUP BY cluster_id)
SELECT l.id AS doc_id, l.cluster_id, CAST(s.n AS BIGINT) AS cluster_size,
       l.id = l.cluster_id AS is_canonical
FROM lab l JOIN sz s USING (cluster_id)""",
        1,
    )
)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).first()
    return [float(x) for x in row["embedding"]]


def _embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tag_spark.operators.similarity import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10)


_EMBEDDING_TOPK_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
  round(
    list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
    / nullif(sqrt(list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE)^2)))
           * sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> CAST(qe[i] AS DOUBLE)^2))), 0), 6) AS cos_sim
FROM embeddings, q
ORDER BY cos_sim DESC NULLS LAST, vec_id
LIMIT 10
"""


def _embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via the BUCKETED plan (signature equi-join per
    table + exact cosine verify) — the shape that survives 100 TB, promoted
    from the O(n²) BroadcastNestedLoopJoin baseline which now serves only as
    the oracle. 2 planes × 24 tables is recall-complete down to this
    corpus's weakest qualifying pair (cos 0.4 → per-table p ≈ 0.40,
    P(miss) ≈ 0.60^24 ≈ 5e-6); real near-dup thresholds (≥0.9) need far
    fewer tables with more planes."""
    from tag_spark.operators.similarity import lsh_neardup_pairs

    return lsh_neardup_pairs(_t(spark, sf_dir, "embeddings"), dim=64, threshold=0.4, n_planes=2, n_tables=24)


_EMBEDDING_NEARDUP_SQL = """
WITH v AS (SELECT vec_id, embedding FROM embeddings)
SELECT id_a, id_b, cos_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round(
      list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE)^2)))
       * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> CAST(b.embedding[i] AS DOUBLE)^2)))), 6) AS cos_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
) WHERE cos_sim >= 0.4
"""


def _minhash_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tag_spark.operators.dedup import minhash_lsh_pairs

    # 32 bands x 2 rows: P(candidate | j) = 1-(1-j^2)^32 — every true pair
    # in this corpus has j >= 0.9 (miss prob < 1e-22), and verify=True
    # filters candidates by EXACT jaccard, so the output equals the exact
    # inverted-index result and shares its SQL oracle. The LSH path's value
    # is the plan: band-key equi-joins bound work by bucket size, never n².
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), k=3, threshold=0.3, bands=32)


def _minhash_incremental_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup in the driver gate: documents are split into a
    'stored corpus' (doc_id % 10 != 7) whose band table is built once, and
    a 'new shard' (doc_id % 10 == 7) that joins against it — the daily
    new-data-vs-corpus shape, corpus signatures never recomputed. At
    recall-complete 32×2 banding with exact-Jaccard verification the result
    equals the exact inverted-index pairs restricted to pairs touching the
    shard, which is what the oracle computes."""
    from tag_spark.operators.dedup import minhash_band_table, minhash_lsh_pairs_incremental

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 7)
    shard = d.filter(F.col("doc_id") % 10 == 7)
    index = minhash_band_table(corpus, bands=32)
    return minhash_lsh_pairs_incremental(shard, index, corpus_df=corpus, bands=32, threshold=0.3)


_MINHASH_INCREMENTAL_SQL = _DOC_JACCARD_SQL.replace(
    "SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.3",
    "SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.3 AND (id_a % 10 = 7 OR id_b % 10 = 7)",
)


def _simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-derived SimHash so DuckDB can recompute the exact fingerprint
    (the xxhash64 engine variant stays the fast path, pytest-covered)."""
    from tag_spark.operators.dedup import simhash_md5

    return simhash_md5(_t(spark, sf_dir, "documents"))


def _simhash_md5_oracle() -> str:
    votes = ",\n    ".join(
        f"sum(((strpos('0123456789abcdef', substr(h, {b // 4 + 1}, 1)) - 1) // {1 << (b % 4)}) % 2 * 2 - 1) AS v{b}"
        for b in range(64)
    )
    digit = lambda d: " + ".join(f"(CASE WHEN v{4 * d + k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(4))  # noqa: E731
    out = " || ".join(f"substr('0123456789abcdef', ({digit(d)}) + 1, 1)" for d in range(16))
    return rf"""
WITH tok AS (
  SELECT doc_id, md5(t) AS h FROM (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS t
    FROM documents)
), votes AS (
  SELECT doc_id, count(*) AS n_tokens,
    {votes}
  FROM tok GROUP BY doc_id
)
SELECT doc_id AS id, {out} AS simhash_hex, CAST(n_tokens AS BIGINT) AS n_tokens
FROM votes
"""


def _simhash_incremental_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash near-dup in the driver gate, md5-portable twin of
    minhash_incremental_docs: the stored corpus (doc_id % 10 != 7) gets its
    pigeonhole chunk table built once, the new shard (doc_id % 10 == 7)
    joins against it — corpus fingerprints never recomputed. Pigeonhole
    banding (4 chunks, hamming <= 3) makes candidate recall exact, so the
    result equals ALL pairs touching the shard within the hamming ball,
    which the oracle computes directly from replayed fingerprints."""
    from tag_spark.operators.dedup import simhash_chunk_table_md5, simhash_pairs_incremental_md5

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 7)
    shard = d.filter(F.col("doc_id") % 10 == 7)
    index = simhash_chunk_table_md5(corpus)
    return simhash_pairs_incremental_md5(shard, index)


def _simhash_incremental_oracle() -> str:
    """DuckDB replay: per-doc md5-derived simhash_hex (same CTEs as the
    simhash_docs oracle), then all pairs touching the shard with bit-level
    hamming(hex_a, hex_b) <= 3 — pigeonhole candidate generation is
    recall-exact inside the ball, so the chunk join needs no replay."""
    votes = ",\n    ".join(
        f"sum(((strpos('0123456789abcdef', substr(h, {b // 4 + 1}, 1)) - 1) // {1 << (b % 4)}) % 2 * 2 - 1) AS v{b}"
        for b in range(64)
    )
    digit = lambda d: " + ".join(f"(CASE WHEN v{4 * d + k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(4))  # noqa: E731
    out = " || ".join(f"substr('0123456789abcdef', ({digit(d)}) + 1, 1)" for d in range(16))
    dig = lambda side, d: f"(strpos('0123456789abcdef', substr({side}.simhash_hex, {d + 1}, 1)) - 1)"  # noqa: E731
    hamming = " + ".join(f"bit_count(xor({dig('a', d)}, {dig('b', d)}))" for d in range(16))
    return rf"""
WITH tok AS (
  SELECT doc_id, md5(t) AS h FROM (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS t
    FROM documents)
), votes AS (
  SELECT doc_id, count(*) AS n_tokens,
    {votes}
  FROM tok GROUP BY doc_id
), sim AS (
  SELECT doc_id AS id, {out} AS simhash_hex FROM votes
)
SELECT a.id AS id_a, b.id AS id_b, CAST({hamming} AS INT) AS hamming
FROM sim a JOIN sim b ON a.id < b.id
WHERE (a.id % 10 = 7 OR b.id % 10 = 7)
  AND ({hamming}) <= 3
"""


_ANN_INDEX_CACHE: dict = {}


def _ann_cache_key(spark: SparkSession, sf_dir: str, kind: str) -> tuple:
    """Cache key for process-lifetime ANN indexes, pinned to the DATA's
    snapshot identity (table_snapshot: sha1 of the file listing), not just
    the path — a path whose parquet was overwritten between calls must miss
    the cache instead of serving a stale index. Same invalidation rule the
    persisted IvfIndex gets from its corpus fingerprint."""
    from tag_spark.sources.reader import table_snapshot

    return (kind, sf_dir, table_snapshot(spark, f"{sf_dir}/embeddings.parquet"))


def _lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-ANN through a build-once signature index. 2 planes × 16 tables is
    recall-complete on this corpus even for its weak neighbors (10th-nearest
    cos ≈ 0.28 → per-table match p ≈ 0.35, P(miss) ≈ 0.65^16 ≈ 1e-3), so
    the exact top-k SQL doubles as the oracle."""
    from tag_spark.operators.similarity import LshAnnIndex

    key = _ann_cache_key(spark, sf_dir, "lsh")
    if key not in _ANN_INDEX_CACHE:
        _ANN_INDEX_CACHE[key] = LshAnnIndex(_t(spark, sf_dir, "embeddings"), dim=64, n_planes=2, n_tables=16)
    return _ANN_INDEX_CACHE[key].topk(_query_vec(spark, sf_dir), k=10)


def _ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN through a build-once assignment table materialized
    PARTITIONED BY cell (the probe is a partition-pruned read). Centroid
    sampling is md5-ordered so the oracle replays the complete algorithm —
    sample, assign, probe, re-rank — independently in DuckDB."""
    from tag_spark.operators.similarity import IvfIndex

    key = _ann_cache_key(spark, sf_dir, "ivf")
    if key not in _ANN_INDEX_CACHE:
        tag = sf_dir.rstrip("/").replace("/", "_")
        _ANN_INDEX_CACHE[key] = IvfIndex(
            _t(spark, sf_dir, "embeddings"), n_cells=16, path=f"/tmp/tag_spark_ivf_index{tag}_c16"
        )
    return _ANN_INDEX_CACHE[key].topk(_query_vec(spark, sf_dir), k=10, nprobe=4)


def _ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with DISTRIBUTED k-means refinement (2 Lloyd rounds): centroids
    start as the md5 sample, each round reassigns through the broadcast
    numpy-matrix argmin (no per-centroid literal expressions — the 100 TB
    shape, cf. the reference precomputing its CRC table once at init,
    ogg.go:20-40) and recomputes 6dp-rounded per-cell means. The oracle
    replays every round, the empty-cell carry rule, the final assignment
    and the probe — the complete approximate algorithm — in SQL."""
    from tag_spark.operators.similarity import IvfIndex

    key = _ann_cache_key(spark, sf_dir, "ivf_kmeans")
    if key not in _ANN_INDEX_CACHE:
        tag = sf_dir.rstrip("/").replace("/", "_")
        _ANN_INDEX_CACHE[key] = IvfIndex(
            _t(spark, sf_dir, "embeddings"),
            n_cells=32,
            kmeans_iters=2,
            path=f"/tmp/tag_spark_ivf_index{tag}_c32k2",
        )
    return _ANN_INDEX_CACHE[key].topk(_query_vec(spark, sf_dir), k=10, nprobe=8)


def _ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN ingest — the daily-pipeline shape: the standing
    index is built over the corpus (vec_id % 10 != 0, one Lloyd round);
    the 'new shard' (vec_id % 10 == 0) is assigned to the FROZEN centroids
    in one broadcast-argmin pass over only the new rows, no corpus
    recompute (reference analog: cmd/check re-validates only what you
    point it at, cmd/check/main.go:77-99). The oracle replays the corpus
    sampling, its Lloyd round, and the shard assignment in SQL."""
    from tag_spark.operators.similarity import IvfIndex

    key = _ann_cache_key(spark, sf_dir, "ivf_incr")
    emb = _t(spark, sf_dir, "embeddings")
    if key not in _ANN_INDEX_CACHE:
        _ANN_INDEX_CACHE[key] = IvfIndex(emb.filter(F.col("vec_id") % 10 != 0), n_cells=16, kmeans_iters=1)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    return _ANN_INDEX_CACHE[key].assign_shard(new).select("vec_id", F.col("cell").cast("long").alias("cell"))


def _ivf_cte_chain(n_cells: int, kmeans_iters: int, dim: int, where: str = "TRUE") -> tuple[list, str, str]:
    """Shared CTE builder for the IVF oracles: md5 centroid sample over the
    ``where``-filtered corpus, kmeans_iters Lloyd rounds (means rounded to
    6dp each round, exactly as kmeans_refine does; empty cells keep the
    previous centroid via the LEFT JOIN + coalesce). Returns (ctes,
    final_cent_name, d2(e.embedding, c.cv) expression) — generated
    iteration-by-iteration so any kmeans_iters is expressible."""
    rng = f"range(1, {dim + 1})"
    d2_ec = f"list_sum(list_transform({rng}, i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])^2))"
    corpus = f"(SELECT vec_id, embedding FROM embeddings WHERE {where})"

    def assign_cte(name: str, cent: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2_ec} ASC, c.cell ASC) AS rn
    FROM {corpus} e CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""

    ctes = [
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM (SELECT vec_id, embedding FROM {corpus} s ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells})
)"""
    ]
    for j in range(1, kmeans_iters + 1):
        ctes.append(assign_cte(f"assign{j - 1}", f"cent{j - 1}"))
        ctes.append(
            f"""cent{j} AS (
  SELECT c.cell, coalesce(m.cv, c.cv) AS cv
  FROM cent{j - 1} c LEFT JOIN (
    SELECT cell, list(mv ORDER BY i) AS cv FROM (
      SELECT cell, i, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mv
      FROM assign{j - 1} CROSS JOIN (SELECT unnest({rng}) AS i) t
      GROUP BY cell, i
    ) GROUP BY cell
  ) m USING (cell)
)"""
        )
    return ctes, f"cent{kmeans_iters}", d2_ec


def _ivf_oracle(n_cells: int = 16, nprobe: int = 4, k: int = 10, kmeans_iters: int = 0, dim: int = 64) -> str:
    """DuckDB replay of the COMPLETE IVF algorithm — the shared centroid
    chain (_ivf_cte_chain) plus final nearest-cell assignment (ties ->
    lowest cell), nprobe probe, exact cosine re-rank."""
    rng = f"range(1, {dim + 1})"
    d2_cq = f"list_sum(list_transform({rng}, i -> (c.cv[i] - CAST(qe[i] AS DOUBLE))^2))"
    cos = (
        f"list_sum(list_transform({rng}, i -> CAST(a.embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({rng}, i -> CAST(a.embedding[i] AS DOUBLE)^2)))"
        f" * sqrt(list_sum(list_transform({rng}, i -> CAST(qe[i] AS DOUBLE)^2))))"
    )
    ctes, fin, _ = _ivf_cte_chain(n_cells, kmeans_iters, dim)
    ctes = ctes[:1] + ["q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)"] + ctes[1:]
    # final assignment over the full corpus against the refined centroids
    _, _, d2_ec = _ivf_cte_chain(n_cells, kmeans_iters, dim)
    ctes.append(f"""afin AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2_ec} ASC, c.cell ASC) AS rn
    FROM embeddings e CROSS JOIN {fin} c
  ) WHERE rn = 1
)""")
    ctes.append(f"""probe AS (
  SELECT c.cell FROM {fin} c CROSS JOIN q ORDER BY {d2_cq} ASC, c.cell ASC LIMIT {nprobe}
)""")
    return f"""
WITH {", ".join(ctes)}
SELECT a.vec_id, round({cos}, 6) AS cos_sim
FROM afin a JOIN probe p ON a.cell = p.cell CROSS JOIN q
ORDER BY cos_sim DESC, a.vec_id
LIMIT {k}
"""


def _ivf_incremental_oracle(n_cells: int = 16, kmeans_iters: int = 1, dim: int = 64) -> str:
    """DuckDB replay of incremental ingest: the centroid chain is built
    over the STANDING corpus only (vec_id % 10 <> 0, including its Lloyd
    round), then the new shard (vec_id % 10 = 0) is assigned to those
    frozen centroids — exactly IvfIndex.assign_shard."""
    ctes, fin, d2_ec = _ivf_cte_chain(n_cells, kmeans_iters, dim, where="vec_id % 10 <> 0")
    return f"""
WITH {", ".join(ctes)}
SELECT vec_id, cell FROM (
  SELECT e.vec_id, c.cell,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2_ec} ASC, c.cell ASC) AS rn
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0) e CROSS JOIN {fin} c
) WHERE rn = 1
"""


def _asset_binary_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end WITH an oracle: documents become
    binary assets (ASCII 'RIFF' magic + utf-8 text bytes — chosen so DuckDB,
    whose sha256 is VARCHAR-only, hashes the identical byte stream), flow
    through the real mapInPandas Arrow-batch feature extractor (stub decode,
    honestly labeled), and the magic-byte sniffer classifies the payload.
    Verifies batch shape, binary round-trip, and the sniff dispatch."""
    from tag_spark.operators.multimodal import decode_image_features, sniff_kind

    d = _t(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("kind"),
        F.encode(F.concat(F.lit("RIFF"), F.coalesce(F.col("text"), F.lit(""))), "UTF-8").alias("payload"),
    )
    feat = decode_image_features(assets)
    sniffed = assets.select("asset_id", sniff_kind().alias("kind_sniffed"))
    return feat.join(sniffed, "asset_id").select("asset_id", "kind_sniffed", "n_bytes", "content_sha256", "decoder")


_ASSET_BINARY_PROFILE_SQL = """
SELECT doc_id AS asset_id, 'wav' AS kind_sniffed,
       CAST(4 + octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
       sha256('RIFF' || coalesce(text, '')) AS content_sha256,
       'stub' AS decoder
FROM documents
"""


def _asset_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling oracled end-to-end: documents become audio assets
    (ASCII 'RIFF' + text bytes, chosen so DuckDB's VARCHAR-only sha256 and
    char-based substring slice the IDENTICAL byte stream — the corpus is
    verified pure ASCII), flow through the real mapInPandas splitter
    (sample_frames: payload -> n_frames equal chunks, trailing remainder
    dropped, sha256 + length per chunk), and the oracle replays the
    chunking arithmetic with substring windows. Verifies the Arrow
    batch fan-out (one input row -> up to 4 frame rows) byte-for-byte.
    Reference analog: lacing-value packet reassembly slices one page into
    segments, ogg.go:120-133."""
    from tag_spark.operators.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("kind"),
        F.encode(F.concat(F.lit("RIFF"), F.coalesce(F.col("text"), F.lit(""))), "UTF-8").alias("payload"),
    )
    return sample_frames(assets, n_frames=4).select(
        "asset_id", F.col("frame_idx").cast("long").alias("frame_idx"), "frame_sha256", "n_bytes"
    )


_ASSET_FRAMES_SQL = """
WITH p AS (
  SELECT doc_id, 'RIFF' || coalesce(text, '') AS s FROM documents
),
c AS (
  SELECT doc_id, s,
         greatest(CAST(floor(length(s) / 4) AS INT), 1) AS step
  FROM p WHERE length(s) > 0
),
f AS (
  SELECT doc_id, i.range AS i, substring(s, CAST(i.range * step + 1 AS INT), step) AS chunk
  FROM c, range(4) i
)
SELECT doc_id AS asset_id, CAST(i AS BIGINT) AS frame_idx,
       sha256(chunk) AS frame_sha256,
       CAST(length(chunk) AS BIGINT) AS n_bytes
FROM f WHERE length(chunk) > 0
"""


def _asset_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-dimension decode oracled (closes the round-4 stub gap
    for fixed-offset formats): documents become image assets whose payloads
    are byte-for-byte spec headers — even doc_ids a PNG signature + IHDR
    chunk with deterministic u32-BE width/height, odd doc_ids a GIF89a
    signature + u16-LE logical-screen dims — constructed with
    hex/lpad/unhex expressions, then decoded BACK by the independent
    substring/hex/conv header parsers inside decode_image_features
    (parsing.py png_ihdr_dims/gif_screen_dims). The oracle recomputes the
    planted dims directly from the doc_id formula, so any byte-order or
    offset bug in the parser (or constructor) hash-mismatches. Reference
    analog: Picture payload fields id3v2frames.go:545-551, PNG sniff
    mp4.go:54-55, BE int fold util.go:27-34."""
    from tag_spark.operators.multimodal import MAGIC, _u16le_bytes, _u32be_bytes, decode_image_features, sniff_kind

    d = _t(spark, sf_dir, "documents")
    width = (F.pmod(F.col("doc_id"), F.lit(1000)) + 16).cast("int")
    height = (F.pmod(F.col("doc_id") * 7, F.lit(1000)) + 16).cast("int")
    png_payload = F.concat(
        F.lit(MAGIC["png"]),
        _u32be_bytes(F.lit(13)),
        F.lit(b"IHDR"),
        _u32be_bytes(width),
        _u32be_bytes(height),
        F.lit(b"\x08\x06\x00\x00\x00"),
    )
    gif_payload = F.concat(F.lit(b"GIF89a"), _u16le_bytes(width), _u16le_bytes(height))
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.when(F.col("doc_id") % 2 == 0, png_payload).otherwise(gif_payload).alias("payload"),
    )
    feat = decode_image_features(assets)
    sniffed = assets.select("asset_id", sniff_kind().alias("fmt"))
    return feat.join(sniffed, "asset_id").select(
        "asset_id", "fmt", F.col("width").cast("int").alias("width"), F.col("height").cast("int").alias("height"), "decoder"
    )


_ASSET_IMAGE_DIMS_SQL = """
SELECT doc_id AS asset_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS fmt,
       CAST(doc_id % 1000 + 16 AS INT) AS width,
       CAST((doc_id * 7) % 1000 + 16 AS INT) AS height,
       'header' AS decoder
FROM documents
"""


def _asset_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-resize kernel oracled end-to-end (completes the brief's
    multimodal quartet: decode / feature-extract / RESIZE / frame-sample):
    documents become RAW1 uncompressed bitmaps (deterministic 4-16 x 4-14
    grayscale, pixel bytes = the ASCII md5-hex stream of doc_id — ASCII so
    the SQL oracle can rebuild the exact bytes), resized to 6x5 by the
    numpy nearest-neighbor gather inside the Arrow-batched mapInPandas
    kernel (multimodal.resize_raw). The oracle re-derives every output
    pixel independently with the integer index rule src=(y*h//out_h,
    x*w//out_w) via substr gathers and must md5-match byte-for-byte — a
    real kernel-math check, not plumbing-only. Up- AND down-sampling both
    occur (sources span 4..16 wide vs the 6x5 target). Reference analog:
    opaque Picture payload + typed metadata, id3v2frames.go:545-551."""
    from tag_spark.operators.multimodal import raw_bitmap_payload, resize_raw

    d = _t(spark, sf_dir, "documents")
    w = (F.pmod(F.col("doc_id"), F.lit(13)) + 4).cast("int")
    h = (F.pmod(F.col("doc_id") * 7, F.lit(11)) + 4).cast("int")
    npix = (w * h).cast("int")
    hexs = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("rawpix")))
    pix = F.substring(F.repeat(hexs, F.ceil(npix / F.lit(32.0)).cast("int")), F.lit(1), npix)
    src = d.select(F.col("doc_id").alias("asset_id"), raw_bitmap_payload(w, h, pix).alias("payload"))
    out = resize_raw(src, out_w=6, out_h=5)
    return out.select(
        "asset_id",
        "src_width",
        "src_height",
        "out_width",
        "out_height",
        F.md5(F.col("resized")).alias("resized_md5"),
        "resizer",
    )


_ASSET_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 13 + 4 AS INT) AS w,
         CAST((doc_id * 7) % 11 + 4 AS INT) AS h
  FROM documents),
src AS (
  SELECT doc_id, w, h,
         substr(repeat(md5(CAST(doc_id AS STRING) || 'rawpix'),
                       CAST(ceil(w * h / 32.0) AS INT)),
                1, w * h) AS p
  FROM dims)
SELECT doc_id AS asset_id,
       w AS src_width,
       h AS src_height,
       CAST(6 AS INT) AS out_width,
       CAST(5 AS INT) AS out_height,
       md5(list_aggregate(
             list_transform(range(0, 30),
               i -> substr(p,
                           CAST((((i // 6) * h) // 5) * w
                                + (((i % 6) * w) // 6) + 1 AS INT),
                           1)),
             'string_agg', '')) AS resized_md5,
       'numpy-nn' AS resizer
FROM src
"""


_BM25_TERMS = ["hash", "merge", "window"]

# The single tokenization definition (lowercase, whitespace split, empties
# dropped) replayed by every relevance oracle below — identical to
# relevance._tokens_col.
_TOKS_SQL = r"list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'), x -> x <> '')"

# BM25 CTE block shared by both relevance oracles (k1=1.2, b=0.75,
# +1-smoothed idf, corpus = docs with >=1 token; every division forced to
# DOUBLE — DuckDB decimal literals would otherwise divide at decimal scale)
_BM25_CTES = f"""
dl AS (
  SELECT doc_id, len({_TOKS_SQL}) AS dl FROM documents
),
base AS (SELECT doc_id, dl FROM dl WHERE dl > 0),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
toks AS (
  SELECT doc_id, t.term FROM documents, unnest({_TOKS_SQL}) AS t(term)
  WHERE t.term IN ('hash', 'merge', 'window')
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         round(sum(
           ln((CAST(s.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
              / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(tf.tf AS DOUBLE) * 2.2)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * CAST(base.dl AS DOUBLE) / CAST(s.avgdl AS DOUBLE)))
         ), 6) AS bm25
  FROM tf
  JOIN dfreq USING (term)
  JOIN base ON base.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)"""


def _bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval oracled end-to-end: one explode projection
    with the query-term filter BEFORE the tf aggregation (the shuffle
    carries only the query's postings), row-local document lengths,
    broadcast scalar corpus stats, TakeOrderedAndProject top-k. The oracle
    replays the full scoring formula (+1-smoothed idf, k1=1.2 b=0.75) in
    SQL. Reference analog: selecting the matching frame while walking the
    frame loop, id3v2.go:229-258."""
    from tag_spark.operators.relevance import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


_BM25_TOPK_SQL = f"""
WITH {_BM25_CTES}
SELECT doc_id, bm25 FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


def _bm25_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Appendable inverted index: the corpus postings (doc_id % 10 != 0)
    play a PERSISTED term_frequencies table; a new shard's postings are
    built from its text alone and UNIONED on — corpus text is never
    re-tokenized (the expensive scan at 100 TB). Scoring over the merged
    postings must equal the full recompute, which is exactly what the
    oracle (the same full-corpus SQL as bm25_topk_docs) checks — the same
    incremental==full gate pattern as minhash_incremental_docs and
    ivf_incremental_assign. Posting keys are disjoint across shards
    (doc_id partitioned), so the union is a pure append."""
    from tag_spark.operators.relevance import bm25_topk, term_frequencies

    docs = _t(spark, sf_dir, "documents")
    corpus_tf = term_frequencies(docs.filter(F.col("doc_id") % 10 != 0))
    shard_tf = term_frequencies(docs.filter(F.col("doc_id") % 10 == 0))
    return bm25_topk(docs, _BM25_TERMS, k=10, tf=corpus_tf.unionByName(shard_tf))


def _hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 fused with exact-cosine top-50
    (query = embedding of vec_id 0; vec_id keys documents 1:1) via
    reciprocal-rank fusion, rrf(d) = sum 1/(60+rank). Both candidate lists
    rank on their 6dp-rounded scores with doc_id tie-break — the oracle
    replays ranking and fusion exactly."""
    from tag_spark.operators.relevance import bm25_topk, ranked, rrf_fuse
    from tag_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = ranked(bm25_topk(docs, _BM25_TERMS, k=50), "bm25")
    vec = ranked(cosine_topk(emb, _query_vec(spark, sf_dir), k=50), "cos_sim", id_col="vec_id")
    return rrf_fuse([lex, vec], k=10)


_HYBRID_RRF_SQL = f"""
WITH {_BM25_CTES},
bmtop AS (SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 50),
bmrank AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM bmtop),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cos AS (
  SELECT vec_id AS doc_id,
    round(
      list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE)^2)))
       * sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> CAST(qe[i] AS DOUBLE)^2)))), 6) AS cos_sim
  FROM embeddings, q
  ORDER BY cos_sim DESC, vec_id
  LIMIT 50
),
cosrank AS (SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rank FROM cos),
unioned AS (
  SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + rank) AS w FROM bmrank
  UNION ALL
  SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + rank) AS w FROM cosrank
)
SELECT doc_id, round(sum(w), 6) AS rrf, count(*) AS n_lists
FROM unioned
GROUP BY doc_id
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


def _events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every click event attributed to the
    latest error event of the same user at or before its timestamp —
    union-sort-fill, one shuffle on user_id, no row amplification. The
    oracle is DuckDB's NATIVE ``ASOF LEFT JOIN``, so the semantics
    (inclusive >=, per-key, latest-prior) are pinned against an
    independent engine's implementation of the same operator, not a SQL
    re-derivation. Duplicate (user_id, ts) error rows are collapsed to the
    max event_id in both engines first (CLAUDE.md: deterministic tie-break
    before any ordered carry). Reference analog: ID3v1 trailer resolution
    — the LAST metadata block at or before EOF wins (id3v1.go:45-56)."""
    from tag_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id", "value")
    res = asof_join(clicks, errors, on="user_id", ts_col="ts", payload_cols=["event_id", "value"], tie_break="event_id")
    return res.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("asof_event_id").alias("last_error_id"),
        F.round(F.col("asof_value"), 6).alias("last_error_value"),
    )


# NULL-ts contract made explicit (generated-corpus fuzz; the fixed
# testdata has no NULL ts): a NULL-ts RIGHT row can never satisfy
# r.ts <= l.ts (filtered), and a NULL-ts LEFT row keeps its row with
# NULL payload — comparison semantics, matching the engine. DuckDB's
# native ASOF would quirkily match a NULL-ts left to the LAST right
# (NULLS-LAST merge order), so NULL-ts lefts bypass it via UNION ALL.
_EVENTS_ASOF_SQL = """
WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
err0 AS (SELECT user_id, ts, max(event_id) AS eid FROM events
         WHERE event_type = 'error' AND ts IS NOT NULL GROUP BY 1, 2),
errs AS (SELECT e0.user_id, e0.ts, e0.eid, e.value FROM err0 e0 JOIN events e ON e.event_id = e0.eid)
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
       e.eid AS last_error_id, round(e.value, 6) AS last_error_value
FROM (SELECT * FROM clicks WHERE ts IS NOT NULL) c
ASOF LEFT JOIN errs e ON c.user_id = e.user_id AND c.ts >= e.ts
UNION ALL
SELECT event_id, user_id, CAST(NULL AS BIGINT) AS ts_us,
       CAST(NULL AS BIGINT) AS last_error_id, CAST(NULL AS DOUBLE) AS last_error_value
FROM clicks WHERE ts IS NULL
"""


def _pii_enriched_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with deterministic PII fragments planted from doc_id (the
    synthetic corpus itself contains none): each modulus class gets one
    PII shape, so coverage spans every pattern, docs outside all classes
    stay clean, and the oracle recomputes the identical enrichment."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    pad4 = F.lpad(s(F.pmod(did, F.lit(10000))), 4, "0")
    frag = lambda mod, *pieces: F.when(  # noqa: E731
        F.pmod(did, F.lit(mod)) == 0, F.concat(*pieces)
    ).otherwise(F.lit(""))
    text = F.concat(
        F.col("text"),
        frag(5, F.lit(" contact user"), s(did), F.lit("@example.com")),
        frag(7, F.lit(" from 10."), s(F.pmod(did, F.lit(256))), F.lit(".0."), s(F.pmod(did, F.lit(100)))),
        frag(11, F.lit(" ssn 123-45-"), pad4),
        frag(13, F.lit(" card 4111 1111 1111 "), pad4),
        frag(17, F.lit(" call +1 555 867 "), pad4),
    )
    return d.select("doc_id", text.alias("text"))


def _doc_pii_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII screen over the enriched corpus (operators/pii.py): per-type
    regexp counts + md5 of the fully-redacted text. Pure per-row JVM
    regex — zero shuffles; the oracle replays the same RE2∩Java-safe
    patterns with DuckDB regexp_extract_all / regexp_replace('g') and
    must reproduce the redacted bytes exactly (md5 equality). Reference
    analog: closed-vocabulary frame screening with quarantined unknowns
    (id3v2.go:374-396)."""
    from tag_spark.operators.pii import PII_PATTERNS, pii_profile

    prof = pii_profile(_pii_enriched_docs(spark, sf_dir))
    return prof.select(
        "doc_id",
        *[f"n_{name}" for name, _ in PII_PATTERNS],
        "n_pii",
        F.col("has_pii").cast("int").alias("has_pii"),
        "redacted_md5",
    )


def _pii_sql() -> str:
    from tag_spark.operators.pii import PII_PATTERNS

    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}" for name, pat in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _ in PII_PATTERNS)
    redacted = "text"
    for name, pat in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
WITH enriched AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS STRING) || '.0.' || CAST(doc_id % 100 AS STRING) ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' card 4111 1111 1111 ' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 17 = 0 THEN ' call +1 555 867 ' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END
    AS text
  FROM documents
), counts AS (
  SELECT doc_id, text,
       {counts}
  FROM enriched
)
SELECT doc_id, {", ".join(f"n_{name}" for name, _ in PII_PATTERNS)},
       CAST({total} AS BIGINT) AS n_pii,
       CAST(({total}) > 0 AS INT) AS has_pii,
       md5({redacted}) AS redacted_md5
FROM counts
"""


def _doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (operators/text.py
    repetition_profile): duplicate-word / top-word / top-bigram fractions
    per document — two partial-aggregable groupBys on the same doc key,
    bigram array built from zip-shifted slices and exploded once
    (CLAUDE.md higher-order-lambda rule). Oracle recomputes all three
    fractions from the shared tokenization."""
    from tag_spark.operators.text import repetition_profile

    return repetition_profile(_t(spark, sf_dir, "documents"))


_DOC_REPETITION_SQL = rf"""
WITH docs AS (
  SELECT doc_id, {_TOKS_SQL} AS w FROM documents
), wc AS (
  SELECT doc_id, word, count(*) AS n FROM (SELECT doc_id, unnest(w) AS word FROM docs) GROUP BY 1, 2
), wm AS (
  SELECT doc_id, sum(n) AS nw, count(*) AS nd, max(n) AS mxw FROM wc GROUP BY 1
), bc AS (
  SELECT doc_id, b, count(*) AS n FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS b
    FROM docs WHERE len(w) >= 2
  ) GROUP BY 1, 2
), bm AS (
  SELECT doc_id, sum(n) AS nb, max(n) AS mxb FROM bc GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(wm.nw, 0) AS BIGINT) AS n_words,
       CAST(coalesce(wm.nd, 0) AS BIGINT) AS n_distinct_words,
       CASE WHEN coalesce(wm.nw, 0) > 0 THEN round(1.0 - wm.nd / wm.nw, 6) ELSE 0.0 END AS dup_word_frac,
       CASE WHEN coalesce(wm.nw, 0) > 0 THEN round(mxw / wm.nw, 6) ELSE 0.0 END AS top_word_frac,
       CASE WHEN coalesce(bm.nb, 0) > 0 THEN round(mxb / bm.nb, 6) ELSE 0.0 END AS top_bigram_frac
FROM (SELECT doc_id FROM documents) d
LEFT JOIN wm ON wm.doc_id = d.doc_id
LEFT JOIN bm ON bm.doc_id = d.doc_id
"""


def _doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py contamination_check):
    docs with doc_id % 11 == 0 play the eval set; corpus docs sharing any
    4-word shingle with it are flagged with their overlap fraction (the
    planted near-dups of eval docs read ~1.0, chance vocabulary overlaps
    read low — k=4 keeps both regimes represented in this corpus). The
    eval shingle set is broadcast; corpus text never shuffles."""
    from tag_spark.operators.dedup import contamination_check

    d = _t(spark, sf_dir, "documents")
    return contamination_check(
        d.filter(F.pmod(F.col("doc_id"), F.lit(11)) != 0),
        d.filter(F.pmod(F.col("doc_id"), F.lit(11)) == 0),
        k=4,
    )


_DOC_CONTAMINATION_SQL = rf"""
WITH docs AS (
  SELECT doc_id, {_TOKS_SQL} AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(w) - 2), i -> list_aggregate(w[i:i+3], 'string_agg', ' '))) AS s
    FROM docs WHERE len(w) >= 4)
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 11 = 0),
corp AS (SELECT * FROM sh WHERE doc_id % 11 <> 0),
hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM corp JOIN bench USING (s) GROUP BY 1),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM corp GROUP BY 1)
SELECT h.doc_id, h.n_hits, z.n_shingles, round(h.n_hits / z.n_shingles, 6) AS contamination
FROM hits h JOIN sizes z USING (doc_id)
"""


def _events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (operators/sessions.py): per-user
    sessions split on >30 min silence, aggregated to (count, start, end,
    duration). ONE window spec drives both the lag and the boundary
    running-sum (single Exchange + Sort; event_id tie-break per
    CLAUDE.md), and the gap test is integer-microsecond exact. The batch
    twin of the streaming stateful session tracker. Reference analog:
    OGG packet reassembly splitting a per-serial stream on lacing-value
    boundaries (ogg.go:104-133)."""
    from tag_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(ev, key_col="user_id", ts_col="ts", gap_seconds=1800, tie_break="event_id")


_EVENTS_SESSIONIZATION_SQL = """
WITH o AS (
  -- NULL-ts rows are excluded, matching the engine contract (a
  -- timestampless event has no session position; sessions.py sessionize
  -- filters them — without this, Spark's NULLS-FIRST vs DuckDB's
  -- NULLS-LAST window ordering silently diverges, caught by the
  -- generated-corpus fuzz)
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events WHERE ts IS NOT NULL
), b AS (
  SELECT user_id, ts, event_id,
         CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800 * 1000000 THEN 1 ELSE 0 END AS nb
  FROM o
), s AS (
  SELECT user_id, ts,
         CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
  FROM b
)
SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
       round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 6) AS duration_s
FROM s GROUP BY 1, 2
"""


def _events_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (operators/sessions.py range_join_binned): for
    each event, the number of OTHER events by the same user within the
    following hour (follow-on activity). The engine buckets both sides
    into W-second epoch bins so the interval join becomes an EQUI-join on
    (key, bin) with exactly-2x left amplification — never the per-key
    cross product a naive theta join plans. The oracle replays the raw
    inequality join (fine at sf0.01; the whole point is that the engine's
    plan does NOT)."""
    from tag_spark.operators.sessions import range_join_binned

    ev = _t(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select("user_id", "ts", "event_id")
    j = range_join_binned(left, right, on="user_id", window_seconds=3600)
    return (
        j.filter(F.col("r_event_id") != F.col("event_id"))
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_followups_1h"))
    )


# NOTE: the microsecond window is a precomputed literal — DuckDB evaluates
# 3600 * 1000000 in INT32 and overflows
_EVENTS_RANGE_JOIN_SQL = """
SELECT e.event_id, e.user_id, CAST(count(*) AS BIGINT) AS n_followups_1h
FROM events e
JOIN events c ON c.user_id = e.user_id AND c.event_id <> e.event_id
  AND epoch_us(c.ts) >= epoch_us(e.ts)
  AND epoch_us(c.ts) <= epoch_us(e.ts) + 3600000000
GROUP BY 1, 2
"""


def _asset_jpeg_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG dimension decode oracled (closes the last decode stub):
    documents become JPEG assets whose payloads are spec-conformant marker
    streams — SOI, a COM segment whose length VARIES per row
    (doc_id % 37 + 1 filler bytes), then SOF0 with planted u16-BE dims.
    Because the SOF offset is row-variable, the engine can only recover
    the dims by actually walking the markers (jpeg_sof_dims in the
    Arrow-batched UDF, decoder='sof-scan'); a fixed-offset cheat would
    hash-mismatch. The oracle recomputes the planted dims from the doc_id
    formula. Reference analog: the frame loop id3v2.go:229-258 walking
    variable-length frames to the one it wants; Picture payload fields
    id3v2frames.go:545-551."""
    from tag_spark.operators.multimodal import decode_image_features, jpeg_payload

    d = _t(spark, sf_dir, "documents")
    width = (F.pmod(F.col("doc_id"), F.lit(1000)) + 16).cast("int")
    height = (F.pmod(F.col("doc_id") * 7, F.lit(1000)) + 16).cast("int")
    pad = F.pmod(F.col("doc_id"), F.lit(37)) + 1
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        jpeg_payload(width, height, pad).alias("payload"),
    )
    return decode_image_features(assets).select(
        "asset_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "decoder",
        # total stream length pins the construction arithmetic too:
        # 2 SOI + (4 + pad) COM + 19 SOF0 + 2 EOI
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )


_ASSET_JPEG_DIMS_SQL = """
SELECT doc_id AS asset_id,
       CAST(doc_id % 1000 + 16 AS INT) AS width,
       CAST((doc_id * 7) % 1000 + 16 AS INT) AS height,
       'sof-scan' AS decoder,
       CAST(2 + 4 + (doc_id % 37 + 1) + 19 + 2 AS BIGINT) AS n_bytes
FROM documents
"""


def _stats_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-bucket quantiles (the t-digest sketch's exact companion —
    percentile() is Spark's exact sorting implementation with linear
    interpolation, same definition as DuckDB's quantile_cont)."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.25, 0.5, 0.75))")
    return (
        # `%` (sign-of-dividend), not pmod: the oracle's l_orderkey % 8 keeps
        # the dividend's sign, so a negative key must bucket identically here
        # (identical for the non-negative driver data; ADVICE r5 parity class)
        li.groupBy((F.col("l_orderkey") % F.lit(8)).cast("long").alias("bucket_id"))
        .agg(q.alias("q"))
        .select(
            "bucket_id",
            F.round(F.element_at("q", 1), 6).alias("p25"),
            F.round(F.element_at("q", 2), 6).alias("p50"),
            F.round(F.element_at("q", 3), 6).alias("p75"),
        )
    )


_STATS_QUANTILES_SQL = """
SELECT CAST(l_orderkey % 8 AS BIGINT) AS bucket_id,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 6) AS p25,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS p50,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 6) AS p75
FROM lineitem GROUP BY 1
"""


def _events_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL drift pipeline oracled end-to-end — one-scan multi-metric
    histograms (GROUPING SETS) per split, then the PSI + KS math itself,
    which DuckDB recomputes from raw rows: p/q eps-clamped at 1e-6 for PSI,
    raw cumulative proportions for KS, bucket union via full outer join."""
    from tag_spark.operators.drift import drift_check, multi_histogram

    e = _t(spark, sf_dir, "events")
    specs = [
        ("value", F.col("value"), 0.0, 100.0, 20),
        ("props_len", F.length("props"), 0.0, 20.0, 10),
    ]
    base = multi_histogram(e.filter(F.col("user_id") % 2 == 0), specs)
    cur = multi_histogram(e.filter(F.col("user_id") % 2 != 0), specs)
    out = drift_check(spark, base, cur)
    return out.select(
        "metric", F.round("psi", 6).alias("psi"), F.round("ks", 6).alias("ks"), "n_base", "n_cur", "drifted"
    )


def _events_drift_oracle() -> str:
    hist = """
  SELECT metric, CAST(least(greatest(floor((x - lo) / w), 0), nb - 1) AS INT) AS bucket, count(*) AS c
  FROM (
    SELECT 'value' AS metric, CAST(value AS DOUBLE) AS x, 0.0 AS lo, 5.0 AS w, 20 AS nb
    FROM events WHERE user_id % 2 {parity} 0 AND value IS NOT NULL
    UNION ALL
    SELECT 'props_len', CAST(length(props) AS DOUBLE), 0.0, 2.0, 10
    FROM events WHERE user_id % 2 {parity} 0 AND length(props) IS NOT NULL
  ) GROUP BY 1, 2
"""
    return f"""
WITH hb AS ({hist.format(parity="=")}),
hc AS ({hist.format(parity="<>")}),
nb AS (SELECT metric, sum(c) AS n FROM hb GROUP BY 1),
nc AS (SELECT metric, sum(c) AS n FROM hc GROUP BY 1),
joined AS (
  SELECT coalesce(hb.metric, hc.metric) AS metric,
         coalesce(hb.bucket, hc.bucket) AS bucket,
         coalesce(hb.c, 0) AS cb, coalesce(hc.c, 0) AS cc
  FROM hb FULL OUTER JOIN hc ON hb.metric = hc.metric AND hb.bucket = hc.bucket
),
prop AS (
  SELECT j.metric, j.bucket,
         j.cb * 1.0 / nb.n AS p_raw, j.cc * 1.0 / nc.n AS q_raw,
         greatest(j.cb * 1.0 / nb.n, 1e-6) AS p, greatest(j.cc * 1.0 / nc.n, 1e-6) AS q,
         nb.n AS n_base, nc.n AS n_cur
  FROM joined j JOIN nb ON nb.metric = j.metric JOIN nc ON nc.metric = j.metric
),
cum AS (
  SELECT metric, bucket, p, q, n_base, n_cur,
         sum(p_raw) OVER (PARTITION BY metric ORDER BY bucket) AS cp,
         sum(q_raw) OVER (PARTITION BY metric ORDER BY bucket) AS cq
  FROM prop
)
SELECT metric,
       round(sum((q - p) * ln(q / p)), 6) AS psi,
       round(max(abs(cp - cq)), 6) AS ks,
       CAST(min(n_base) AS BIGINT) AS n_base,
       CAST(min(n_cur) AS BIGINT) AS n_cur,
       (sum((q - p) * ln(q / p)) > 0.25) AS drifted
FROM cum GROUP BY metric
"""


def _stage_stream_source(spark: SparkSession, table_path: str, dst_dir: str) -> None:
    """The file-stream source needs a DIRECTORY to watch; the testdata
    table is a single parquet file. On the LOCAL filesystem a symlink into
    a fresh dir is free; any other scheme (hdfs://, s3a://) copies the file
    through the Hadoop FileSystem API instead — the gate queries must never
    silently assume local storage (os.symlink on an s3a:// URI would raise
    a confusing ENOENT at stream start)."""
    import os
    from urllib.parse import unquote, urlparse

    os.makedirs(dst_dir, exist_ok=True)
    base = os.path.basename(table_path.rstrip("/"))
    u = urlparse(table_path)
    if u.scheme in ("", "file"):
        os.symlink(os.path.abspath(unquote(u.path) if u.scheme else table_path), f"{dst_dir}/{base}")
        return
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(table_path)
    dst = jvm.org.apache.hadoop.fs.Path(f"{dst_dir}/{base}")
    jvm.org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src, dst.getFileSystem(conf), dst, False, conf)


def _streaming_events_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming in the driver gate: the stateless events suite
    runs as a real readStream -> writeStream(availableNow) micro-batch job
    over the events table (fresh sink+checkpoint per call, exactly-once),
    and the materialized sink must equal the batch result — which is what
    the SQL oracle computes. Window checks stay batch-side by design
    (validate_stream.py), so the oracle is the row-level arms only."""
    import tempfile

    from tag_spark.operators.generic_suites import events_suite
    from tag_spark.streaming.validate_stream import stateless, write_violation_stream

    schema = _t(spark, sf_dir, "events").schema
    d = tempfile.mkdtemp(prefix="tag_spark_stream_")
    _stage_stream_source(spark, f"{sf_dir}/events.parquet", f"{d}/src")
    stream = spark.readStream.schema(schema).parquet(f"{d}/src")
    suite = stateless(events_suite())
    viol = suite.violations(stream, shuffle_for_windows=False)
    q = write_violation_stream(viol, f"{d}/sink", f"{d}/ckpt")
    q.awaitTermination()
    return (
        spark.read.parquet(f"{d}/sink")
        .select(
            "check_id",
            "severity",
            F.col("conv_id").cast("long").alias("user_id"),
            F.col("turn_idx").cast("long").alias("event_id"),
        )
    )


_STREAMING_EVENTS_SQL = """
WITH viol AS (
    SELECT 'event_type_in_vocab' AS check_id, 'error' AS severity, user_id, event_id
    FROM events
    WHERE event_type IS NOT NULL AND event_type NOT IN ('click','view','purchase','signup')
  UNION ALL
    SELECT 'value_nonneg', 'error', user_id, event_id FROM events
    WHERE value IS NOT NULL AND value < 0
  UNION ALL
    SELECT 'purchase_value_positive', 'warn', user_id, event_id FROM events
    WHERE event_type = 'purchase' AND NOT coalesce(value > 0, FALSE)
  UNION ALL
    SELECT 'event_id_not_null', 'error', user_id, event_id FROM events WHERE event_id IS NULL
  UNION ALL
    SELECT 'ts_not_null', 'error', user_id, event_id FROM events WHERE ts IS NULL
)
SELECT check_id, severity, CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id
FROM viol
"""


def _violation_samples_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 ranking/top-k sampling as a driver query: the first 3
    violations per check under the stable (user_id, event_id) order —
    the sink's sampled-report shape (cmd/tag/main.go:69-75 analog),
    returned as rows so DuckDB can recompute the ranks exactly."""
    from tag_spark.sources.sink import violation_samples_topk

    return violation_samples_topk(_events_violations(spark, sf_dir), k=3, order_cols=("user_id", "event_id"))


_VIOLATION_SAMPLES_SQL = f"""
SELECT check_id, severity, user_id, event_id, CAST(sample_rank AS BIGINT) AS sample_rank
FROM (
  SELECT check_id, severity, user_id, event_id,
         row_number() OVER (
           PARTITION BY check_id ORDER BY user_id NULLS FIRST, event_id NULLS FIRST
         ) AS sample_rank
  FROM ({_EVENTS_VIOLATIONS_SQL}) v
) WHERE sample_rank <= 3
"""


def _streaming_violation_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed violation rates through a REAL Structured
    Streaming aggregation: readStream over the events table, the stateless
    suite's violation stream carrying ts, watermark + 1-day tumbling
    windows, complete-mode memory sink (a file sink's append mode would
    withhold every window above the final watermark — the classic
    availableNow pitfall). The oracle recomputes the identical windowed
    counts in batch SQL: Spark's epoch-aligned 1-day window start equals
    date_trunc('day', ts)."""
    import tempfile
    import uuid

    from tag_spark.operators.generic_suites import events_suite
    from tag_spark.streaming.validate_stream import stateless, violation_rate_windows

    schema = _t(spark, sf_dir, "events").schema
    d = tempfile.mkdtemp(prefix="tag_spark_stream_rates_")
    _stage_stream_source(spark, f"{sf_dir}/events.parquet", f"{d}/src")
    stream = spark.readStream.schema(schema).parquet(f"{d}/src")
    suite = stateless(events_suite())
    viol = suite.violations(stream, shuffle_for_windows=False, carry_cols=("ts",))
    # watermarks require TIMESTAMP (not the parquet NTZ load type); the
    # session timezone is pinned UTC so the cast is lossless
    viol = viol.withColumn("ts", F.col("ts").cast("timestamp"))
    rates = violation_rate_windows(viol, window="1 day", watermark="1 day")
    name = f"rates_{uuid.uuid4().hex[:8]}"
    q = (
        rates.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").cast("string").alias("window_start"),
        "check_id",
        "severity",
        F.col("n_violations").cast("long").alias("n_violations"),
    )


_STREAMING_RATES_SQL = """
WITH viol AS (
    SELECT 'event_type_in_vocab' AS check_id, 'error' AS severity, ts FROM events
    WHERE event_type IS NOT NULL AND event_type NOT IN ('click','view','purchase','signup')
  UNION ALL
    SELECT 'value_nonneg', 'error', ts FROM events WHERE value IS NOT NULL AND value < 0
  UNION ALL
    SELECT 'purchase_value_positive', 'warn', ts FROM events
    WHERE event_type = 'purchase' AND NOT coalesce(value > 0, FALSE)
  UNION ALL
    SELECT 'event_id_not_null', 'error', ts FROM events WHERE event_id IS NULL
  UNION ALL
    SELECT 'ts_not_null', 'error', ts FROM events WHERE ts IS NULL
)
-- date_trunc('day', ...) returns DATE in DuckDB; re-cast to TIMESTAMP so
-- the string form carries the midnight time part Spark's window start has
SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS STRING) AS window_start, check_id, severity,
       CAST(count(*) AS BIGINT) AS n_violations
FROM viol WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
"""


def _streaming_session_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM STATEFUL streaming operator oracled end-to-end — closing
    the one beyond-reference component that had no CORRECTNESS row: the
    applyInPandasWithState session tracker (streaming/stateful.py:51, the
    OGG per-serial continued-packet-state analog, ogg.go:104-131) runs as a
    real readStream -> foreachBatch(availableNow) job over the events
    table viewed as transcript sessions (conv_id=user_id, turn_idx=
    event_id), and the per-conversation final state (n_turns / max_idx /
    n_gaps / n_regressions) must equal an independent batch replay of the
    same state machine, which the SQL oracle computes with window prefix
    maxima over the identical (turn_idx NULLS LAST, ts NULLS LAST) order.

    The staged source is ONE file -> ONE micro-batch, so exactly one
    update row per conversation reaches the sink (cross-batch state carry
    is pinned separately by tests/test_stateful_streaming.py; the state
    MATH is batch-count-invariant by construction). ts is pre-cast
    NTZ->TIMESTAMP (session TZ pinned UTC) and the tracker casts it to
    double epoch seconds before Arrow — the year-9999 overflow guard."""
    import tempfile

    from tag_spark.streaming.stateful import session_tracker

    schema = _t(spark, sf_dir, "events").schema
    d = tempfile.mkdtemp(prefix="tag_spark_stream_state_")
    _stage_stream_source(spark, f"{sf_dir}/events.parquet", f"{d}/src")
    stream = spark.readStream.schema(schema).parquet(f"{d}/src")
    conv = stream.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("long").alias("turn_idx"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    out = session_tracker(conv)
    q = (
        out.writeStream.foreachBatch(lambda df, _epoch: df.write.mode("append").parquet(f"{d}/sink"))
        .outputMode("update")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{d}/sink").select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("max_idx").cast("long").alias("max_idx"),
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.col("n_regressions").cast("long").alias("n_regressions"),
    )


# Independent replay of the session-tracker state machine: the tracker
# sorts each conversation by (turn_idx, ts_epoch) NaN-last, seeds
# (max_idx=-1, last_ts=-inf), counts idx > prefix_max(idx)+1 as gaps and
# ts < prefix_max(ts) as regressions (NULLs excluded from both, exactly as
# NaN compares False in numpy). Window prefix maxima with NULLS LAST
# replicate it; -1e300 stands in for -inf (no real value goes below it).
_STREAMING_SESSION_STATE_SQL = """
WITH t AS (
  SELECT CAST(user_id AS STRING) AS conv_id,
         CAST(event_id AS DOUBLE) AS idx,
         event_id,
         epoch_us(ts) / 1000000.0 AS tse
  FROM events
),
w AS (
  SELECT conv_id, idx, event_id, tse,
         max(coalesce(idx, -1e300)) OVER (
           PARTITION BY conv_id ORDER BY idx ASC NULLS LAST, tse ASC NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
         max(coalesce(tse, -1e300)) OVER (
           PARTITION BY conv_id ORDER BY idx ASC NULLS LAST, tse ASC NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt
  FROM t
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(coalesce(max(event_id), -1) AS BIGINT) AS max_idx,
       CAST(count(*) FILTER (
         WHERE idx IS NOT NULL AND idx > greatest(coalesce(pm, -1.0), -1.0) + 1
       ) AS BIGINT) AS n_gaps,
       CAST(count(*) FILTER (
         WHERE tse IS NOT NULL AND tse < coalesce(pt, -1e300)
       ) AS BIGINT) AS n_regressions
FROM w GROUP BY conv_id
"""


def _payload_digests_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 metadata-invariant digest, md5 variant: per-user ordered digest
    over ONLY (event_type, value) — changing any other column must not move
    it — recomputed exactly by the oracle."""
    from tag_spark.functions.hashing import column_subset_digest

    e = _t(spark, sf_dir, "events")
    return column_subset_digest(e, ["event_type", "value"], conv_col="user_id", idx_col="event_id", algo="md5")


_PAYLOAD_DIGESTS_SQL = """
WITH t AS (
  SELECT user_id,
         coalesce(CAST(event_id AS BIGINT), -4611686018427387904) AS ord,
         md5(coalesce(event_type, '<null>') || chr(31)
          || coalesce(CAST(value AS VARCHAR), '<null>')) AS h
  FROM events)
SELECT user_id, md5(string_agg(h, chr(31) ORDER BY ord, h)) AS payload_md5
FROM t GROUP BY user_id
"""


def _exclusion_digests_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 both-ends exclusion digest, md5 variant: per-user digest skipping
    the first 2 and last 1 events in event_id order (SumFLAC/SumOGG shape,
    sum.go:169-215) — the oracle replays the slice with row_number from
    both ends."""
    from tag_spark.functions.hashing import digest_excluding_edges

    e = _t(spark, sf_dir, "events")
    return digest_excluding_edges(
        e, n_head=2, n_tail=1, conv_col="user_id", idx_col="event_id", text_col="props", algo="md5"
    )


_EXCLUSION_DIGESTS_SQL = """
WITH t AS (
  SELECT user_id,
         coalesce(CAST(event_id AS BIGINT), -4611686018427387904) AS ord,
         md5(coalesce(CAST(user_id AS VARCHAR), '<null>') || chr(31)
          || coalesce(CAST(event_id AS VARCHAR), '<null>') || chr(31)
          || coalesce(props, '<null>')) AS h
  FROM events),
r AS (
  SELECT user_id, h,
         row_number() OVER (PARTITION BY user_id ORDER BY ord, h) AS rn,
         row_number() OVER (PARTITION BY user_id ORDER BY ord DESC, h DESC) AS rn_rev
  FROM t)
SELECT user_id,
       md5(coalesce(string_agg(h, chr(31) ORDER BY rn) FILTER (WHERE rn > 2 AND rn_rev > 1), '')) AS payload_md5,
       CAST(greatest(count(*) - 3, 0) AS BIGINT) AS n_hashed
FROM r GROUP BY user_id
"""


def _transcript_violations_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW path oracled: the salted two-phase window (bounded task
    size, boundary-row carries) over the same derived transcript view,
    with block_size=16 so nearly every conversation spans many blocks and
    every block boundary exercises a carry. The oracle is the plain
    global-window SQL — byte-equality here proves the salted rewrite is
    semantically invisible, on real data, to an independent engine."""
    from tag_spark.operators.ordering import salted_order_violations

    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    tview = spark.sql(_events_as_transcripts_sql("TIMESTAMP_NTZ"))
    v = salted_order_violations(tview, block_size=16)
    return v.select("check_id", "severity", "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"))


def _transcript_salted_oracle() -> str:
    return f"""
WITH tview AS ({_events_as_transcripts_sql("TIMESTAMP")}),
w AS (
  SELECT conv_id, turn_idx, ts,
         lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx NULLS FIRST, ts NULLS FIRST) AS prev_idx,
         lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx NULLS FIRST, ts NULLS FIRST) AS prev_ts,
         count(*) OVER (PARTITION BY conv_id, turn_idx) AS dup_c
  FROM tview
), viol AS (
    SELECT 'unique_turn' AS check_id, 'error' AS severity, conv_id, turn_idx FROM w WHERE dup_c > 1
  UNION ALL SELECT 'turn_contiguous', 'error', conv_id, turn_idx FROM w
    WHERE NOT coalesce((prev_idx IS NOT NULL OR turn_idx = 0)
                   AND (prev_idx IS NULL OR turn_idx = prev_idx + 1 OR turn_idx = prev_idx), FALSE)
  UNION ALL SELECT 'ts_monotone', 'error', conv_id, turn_idx FROM w
    WHERE prev_ts IS NOT NULL AND ts IS NOT NULL AND ts < prev_ts
)
SELECT check_id, severity, conv_id, CAST(turn_idx AS BIGINT) AS turn_idx FROM viol
"""


def _declared_turns_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 declared-vs-actual, oracled: a metadata dim derived from events
    with planted over/under declarations, users missing from metadata, and
    one phantom declared-but-absent conversation (the truncated-comment
    abort case, vorbis.go:55-58). Violation reasons compared verbatim."""
    from tag_spark.operators.declared import declared_count_violations

    e = _t(spark, sf_dir, "events")
    actual = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("a"))
    declared = (
        F.col("a")
        + F.when(F.col("user_id") % 7 == 3, 1).otherwise(0)
        - F.when(F.col("user_id") % 11 == 5, 1).otherwise(0)
    )
    meta = actual.filter(F.col("user_id") % 13 != 7).select("user_id", declared.cast("long").alias("declared_turns"))
    phantom = spark.createDataFrame([(999999, 5)], "user_id long, declared_turns long")
    v = declared_count_violations(e, meta.unionByName(phantom), conv_col="user_id")
    return v.select("check_id", "severity", F.col("conv_id").cast("long").alias("conv_id"), "reason")


_DECLARED_TURNS_SQL = """
WITH actual AS (SELECT user_id, count(*) AS a FROM events GROUP BY 1),
meta AS (
  SELECT user_id,
         a + (CASE WHEN user_id % 7 = 3 THEN 1 ELSE 0 END)
           - (CASE WHEN user_id % 11 = 5 THEN 1 ELSE 0 END) AS d
  FROM actual WHERE user_id % 13 <> 7
  UNION ALL SELECT 999999, 5
),
j AS (
  SELECT coalesce(actual.user_id, meta.user_id) AS uid,
         coalesce(actual.a, 0) AS found, meta.d AS d
  FROM actual FULL OUTER JOIN meta ON actual.user_id = meta.user_id
)
SELECT 'declared_turn_count' AS check_id, 'error' AS severity,
       CAST(uid AS BIGINT) AS conv_id,
       CASE WHEN d IS NULL THEN 'conversation missing from metadata; actual=' || found
            ELSE 'declared ' || d || ' turns, found ' || found END AS reason
FROM j WHERE d IS NULL OR found <> d
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "events_violations": _events_violations,
        "events_verdicts": _events_verdicts,
        "lineitem_violations": _lineitem_violations,
        "doc_len_drift_histogram": _doc_len_drift_histogram,
        "doc_token_totals": _doc_token_totals,
        "conversation_digests": _conversation_digests,
        "transcript_violations": _transcript_violations,
        "revenue_by_nation": _revenue_by_nation,
        "events_canonical": _events_canonical,
        "stats_lineitem_buckets": _stats_lineitem_buckets,
        "dialect_histogram": _dialect_histogram,
        "unique_event_id_summary": _unique_event_id_summary,
        "ref_orders_customer_orphans": _ref_orders_customer_orphans,
        "q1_pricing_summary": _q1_pricing_summary,
        "events_ts_span": _events_ts_span,
        "null_profile_orders": _null_profile_orders,
        "props_json_k_stats": _props_json_k_stats,
        "doc_text_md5": _doc_text_md5,
        "doc_exact_dedup_summary": _doc_exact_dedup_summary,
        "doc_len_histogram": _doc_len_histogram,
        "doc_profile": _doc_profile,
        "doc_stratified_sample": _doc_stratified_sample,
        "doc_hash_sample_stats": _doc_hash_sample_stats,
        "embedding_quantized_stats": _embedding_quantized_stats,
        "doc_chunks": _doc_chunks,
        "doc_pack_offsets": _doc_pack_offsets,
        "doc_jaccard_pairs": _doc_jaccard_pairs,
        "doc_neardup_clusters": _doc_neardup_clusters,
        "doc_clusters_incremental": _doc_clusters_incremental,
        "embedding_topk": _embedding_topk,
        "embedding_neardup_pairs": _embedding_neardup_pairs,
        "minhash_neardup_docs": _minhash_neardup_docs,
        "minhash_incremental_docs": _minhash_incremental_docs,
        "simhash_docs": _simhash_docs,
        "simhash_incremental_docs": _simhash_incremental_docs,
        "lsh_ann_topk": _lsh_ann_topk,
        "ivf_ann_topk": _ivf_ann_topk,
        "ivf_kmeans_topk": _ivf_kmeans_topk,
        "ivf_incremental_assign": _ivf_incremental_assign,
        "asset_binary_profile": _asset_binary_profile,
        "asset_image_dims": _asset_image_dims,
        "asset_resize": _asset_resize,
        "asset_jpeg_dims": _asset_jpeg_dims,
        "bm25_topk_docs": _bm25_topk_docs,
        "bm25_incremental_topk": _bm25_incremental_topk,
        "hybrid_rrf_topk": _hybrid_rrf_topk,
        "events_asof_attribution": _events_asof_attribution,
        "doc_pii_profile": _doc_pii_profile,
        "doc_repetition_profile": _doc_repetition_profile,
        "doc_contamination": _doc_contamination,
        "events_sessionization": _events_sessionization,
        "events_range_join_counts": _events_range_join_counts,
        "asset_frames": _asset_frames,
        "stats_quantiles_exact": _stats_quantiles_exact,
        "events_drift_check": _events_drift_check,
        "declared_turns_check": _declared_turns_check,
        "transcript_violations_salted": _transcript_violations_salted,
        "payload_digests_md5": _payload_digests_md5,
        "exclusion_digests_md5": _exclusion_digests_md5,
        "streaming_events_violations": _streaming_events_violations,
        "streaming_violation_rates": _streaming_violation_rates,
        "streaming_session_state": _streaming_session_state,
        "violation_samples_topk": _violation_samples_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "events_violations": _EVENTS_VIOLATIONS_SQL,
        "events_verdicts": _EVENTS_VERDICTS_SQL,
        "lineitem_violations": _LINEITEM_VIOLATIONS_SQL,
        "doc_len_drift_histogram": _DOC_LEN_DRIFT_SQL,
        "doc_token_totals": _DOC_TOKEN_TOTALS_SQL,
        "conversation_digests": _CONVERSATION_DIGESTS_SQL,
        "transcript_violations": _transcript_violations_oracle(),
        "revenue_by_nation": _REVENUE_BY_NATION_SQL,
        "events_canonical": _EVENTS_CANONICAL_SQL,
        "stats_lineitem_buckets": _STATS_LINEITEM_SQL,
        "dialect_histogram": "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type",
        "unique_event_id_summary": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,"
            " CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS n_dupes FROM events"
        ),
        "ref_orders_customer_orphans": (
            "SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM orders o"
            " WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)"
        ),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS count_order,"
            " CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,"
            " CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,"
            " CAST(CASE WHEN count(l_quantity) > 0 THEN"
            "   CAST(sign(sum(CAST(l_quantity AS DECIMAL(18,2))))"
            "     * ((2 * abs(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS BIGINT))"
            "        + count(l_quantity)) // (2 * count(l_quantity))) AS DOUBLE) / 10000.0"
            "   END AS DOUBLE) AS avg_qty,"
            " CAST(CASE WHEN count(l_extendedprice) > 0 THEN"
            "   CAST(sign(sum(CAST(l_extendedprice AS DECIMAL(18,2))))"
            "     * ((2 * abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS BIGINT))"
            "        + count(l_extendedprice)) // (2 * count(l_extendedprice))) AS DOUBLE) / 10000.0"
            "   END AS DOUBLE) AS avg_price"
            " FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "events_ts_span": (
            "SELECT epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us,"
            " CAST(count(*) FILTER (WHERE year(ts) < 1970 OR year(ts) > 2100) AS BIGINT) AS n_out_of_range"
            " FROM events"
        ),
        "null_profile_orders": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows,"
            " CAST(count(o_orderkey) AS BIGINT) AS nn_o_orderkey,"
            " CAST(count(o_custkey) AS BIGINT) AS nn_o_custkey,"
            " CAST(count(o_orderstatus) AS BIGINT) AS nn_o_orderstatus,"
            " CAST(count(o_totalprice) AS BIGINT) AS nn_o_totalprice,"
            " CAST(count(o_orderdate) AS BIGINT) AS nn_o_orderdate,"
            " CAST(count(o_orderpriority) AS BIGINT) AS nn_o_orderpriority"
            " FROM orders"
        ),
        # try_cast to JSON first: Spark's get_json_object returns NULL on
        # malformed props while DuckDB's ->> hard-errors — at scale
        # malformed JSON is inevitable and the replay must tolerate it
        # exactly like the engine (generated-corpus fuzz)
        "props_json_k_stats": (
            "WITH j AS (SELECT CAST(try_cast(props AS JSON)->>'$.k' AS BIGINT) AS k FROM events)"
            " SELECT CAST(count(k) AS BIGINT) AS n_k,"
            " CAST(min(k) AS BIGINT) AS min_k,"
            " CAST(max(k) AS BIGINT) AS max_k,"
            " CAST(sum(k) AS BIGINT) AS sum_k"
            " FROM j"
        ),
        "doc_text_md5": "SELECT doc_id, md5(text) AS text_md5 FROM documents",
        "doc_exact_dedup_summary": (
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,"
            " CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs FROM documents"
        ),
        "doc_len_histogram": (
            "SELECT CAST(floor(length(text) / 100) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n"
            " FROM documents GROUP BY 1"
        ),
        "doc_profile": _DOC_PROFILE_SQL,
        "doc_stratified_sample": _DOC_STRATIFIED_SAMPLE_SQL,
        "doc_hash_sample_stats": _DOC_HASH_SAMPLE_SQL,
        "embedding_quantized_stats": _EMBEDDING_QUANTIZED_SQL,
        "doc_chunks": _DOC_CHUNKS_SQL,
        "doc_pack_offsets": _DOC_PACK_OFFSETS_SQL,
        "doc_jaccard_pairs": _DOC_JACCARD_SQL,
        # connected components replayed as a recursive CTE — min reachable
        # id per doc == the engine's min-label fixpoint
        "doc_neardup_clusters": _DOC_CLUSTERS_SQL,
        # incremental merge == full recompute (stored stars encode old
        # components exactly; shard pairs are recall-complete) -> same oracle
        "doc_clusters_incremental": _DOC_CLUSTERS_SQL,
        "embedding_topk": _EMBEDDING_TOPK_SQL,
        "embedding_neardup_pairs": _EMBEDDING_NEARDUP_SQL,
        # minhash LSH with verify=True equals the exact inverted-index result
        # whenever candidate recall is complete — which 32x2 banding
        # guarantees for this corpus (all true pairs have j >= 0.9)
        "minhash_neardup_docs": _DOC_JACCARD_SQL,
        # incremental LSH at recall-complete banding == exact pairs touching
        # the shard (the band-table join only changes WHERE candidates come
        # from, not which verified pairs survive)
        "minhash_incremental_docs": _MINHASH_INCREMENTAL_SQL,
        "simhash_docs": _simhash_md5_oracle(),
        # incremental SimHash: pigeonhole banding is recall-exact inside the
        # hamming ball, so shard-touching pairs with hamming <= 3 IS the
        # engine result (same argument as minhash_incremental_docs)
        "simhash_incremental_docs": _simhash_incremental_oracle(),
        # LSH-ANN at recall-complete parameters == the exact top-k
        "lsh_ann_topk": _EMBEDDING_TOPK_SQL,
        # the IVF oracle replays the full algorithm (md5-ordered centroid
        # sample -> L2 assignment -> nprobe probe -> exact re-rank), so it
        # verifies the approximate semantics themselves, not just recall
        "ivf_ann_topk": _ivf_oracle(n_cells=16, nprobe=4, k=10),
        "ivf_kmeans_topk": _ivf_oracle(n_cells=32, nprobe=8, k=10, kmeans_iters=2),
        "ivf_incremental_assign": _ivf_incremental_oracle(n_cells=16, kmeans_iters=1),
        "asset_binary_profile": _ASSET_BINARY_PROFILE_SQL,
        # planted-dims formula vs the real byte-level header parse
        "asset_image_dims": _ASSET_IMAGE_DIMS_SQL,
        "asset_resize": _ASSET_RESIZE_SQL,
        # planted-dims formula vs the variable-offset SOF marker walk
        "asset_jpeg_dims": _ASSET_JPEG_DIMS_SQL,
        # full BM25 scoring formula replayed in SQL (shared tokenization)
        "bm25_topk_docs": _BM25_TOPK_SQL,
        # postings-append == full recompute (corpus text never re-read):
        # the oracle is the SAME full-corpus replay, so any drift in the
        # merged-index path hash-mismatches
        "bm25_incremental_topk": _BM25_TOPK_SQL,
        # rank-then-fuse replay: both candidate lists rank on 6dp-rounded
        # scores with doc_id tie-break, rrf = sum 1/(60+rank)
        "hybrid_rrf_topk": _HYBRID_RRF_SQL,
        # DuckDB's NATIVE ASOF LEFT JOIN pins the union-sort-fill engine
        # against an independent implementation of the same operator
        "events_asof_attribution": _EVENTS_ASOF_SQL,
        # identical RE2-and-Java-safe regexes; redacted bytes must md5-match
        "doc_pii_profile": _pii_sql(),
        # shared tokenization; all three fractions recomputed at 6dp
        "doc_repetition_profile": _DOC_REPETITION_SQL,
        # broadcast eval shingle screen replayed via equi-join on 4-grams
        "doc_contamination": _DOC_CONTAMINATION_SQL,
        # same window replay, integer-us gap test, shared (ts, event_id) order
        "events_sessionization": _EVENTS_SESSIONIZATION_SQL,
        # raw inequality join replays what the binned equi-join computes
        "events_range_join_counts": _EVENTS_RANGE_JOIN_SQL,
        # mapInPandas frame fan-out vs substring-window chunking replay
        "asset_frames": _ASSET_FRAMES_SQL,
        "stats_quantiles_exact": _STATS_QUANTILES_SQL,
        "events_drift_check": _events_drift_oracle(),
        "declared_turns_check": _DECLARED_TURNS_SQL,
        "transcript_violations_salted": _transcript_salted_oracle(),
        "payload_digests_md5": _PAYLOAD_DIGESTS_SQL,
        "exclusion_digests_md5": _EXCLUSION_DIGESTS_SQL,
        "streaming_events_violations": _STREAMING_EVENTS_SQL,
        "streaming_violation_rates": _STREAMING_RATES_SQL,
        # the stateful applyInPandasWithState tracker vs an independent
        # window-prefix-max replay of its state machine
        "streaming_session_state": _STREAMING_SESSION_STATE_SQL,
        "violation_samples_topk": _VIOLATION_SAMPLES_SQL,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the validation engine's violation rows over sf0.001 events."""
    return _events_violations(spark, "/root/testdata/sf0.001")
