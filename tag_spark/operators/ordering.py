"""Skew-proof ordering checks: two-phase (salted) windows.

The standard suite evaluates Unique / ContiguousIndex / Monotonic under
``Window.partitionBy(conv_id)`` — one task per conversation. A "hot"
conversation with 10^8 turns (north_rule skew case) would then bottleneck
one executor. This module runs the SAME three checks with a bounded task
size:

  1. rows are salted into blocks: block = floor(turn_idx / block_size)
     (same turn_idx → same block, so duplicate detection stays local);
  2. a tiny per-(conv, block) summary computes each block's LAST row, and a
     per-conv window over blocks (≤ conv_size/block_size rows — bounded,
     skew-free) finds, for every block, the nearest previous non-empty
     block's last row;
  3. that boundary row is injected into the next block as a carry marker so
     lag() at block starts sees the true global predecessor;
  4. windows run over (conv, block) — max task size ≈ block_size + 1 —
     and violations are emitted only for non-carry rows.

Output is byte-for-byte identical to the unsalted suite (asserted in
tests/test_ordering.py), so the engine can switch modes on a conv-size
histogram without changing fixtures. Analog: the reference's stateful
unsynchroniser carries exactly one boundary byte across reads
(id3v2.go:402-424) — same trick, one row instead of one bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tag_spark.functions.hashing import turn_sha1
from tag_spark.operators.suite import bucket_expr
from tag_spark.schema import N_BUCKETS

CHECKS = ("unique_turn", "turn_contiguous", "ts_monotone")


def conv_size_histogram(df: DataFrame, conv_col: str = "conv_id", buckets: list[int] | None = None) -> DataFrame:
    """Guard metric: distribution of conversation sizes, used to decide
    whether salting is needed (max size > block_size)."""
    buckets = buckets or [10, 100, 1_000, 10_000, 100_000, 1_000_000]
    sizes = df.groupBy(conv_col).agg(F.count(F.lit(1)).alias("n"))
    arr = F.array(*[F.lit(b) for b in buckets])
    label = F.coalesce(F.array_min(F.filter(arr, lambda b: F.col("n") <= b)), F.lit(-1))
    return sizes.groupBy(label.alias("size_le")).agg(
        F.count(F.lit(1)).alias("n_convs"), F.max("n").alias("max_turns")
    )


def salted_order_violations(
    df: DataFrame,
    block_size: int = 100_000,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Unique/contiguous/monotone violations with bounded task size.
    Schema matches ValidationSuite.violations()."""
    conv, idx, ts = F.col(conv_col), F.col(idx_col), F.col(ts_col)
    block = F.floor(idx / F.lit(block_size)).cast("long")

    # text never enters the shuffle: its canonical hash is computed map-side
    # (same lean-shuffle policy as ValidationSuite.violations)
    base = df.select(
        conv.alias("__conv"),
        idx.alias("__idx"),
        ts.alias("__ts"),
        turn_sha1(conv_col, idx_col, text_col).alias("__sha1"),
        block.alias("__block"),
        F.lit(False).alias("__carry"),
    )

    # phase 1: per-(conv, block) last row — tiny, partial-aggregated
    last = base.groupBy("__conv", "__block").agg(
        F.max_by(F.struct("__idx", "__ts", "__sha1"), F.struct("__idx", "__ts")).alias("__last")
    )
    # phase 2: nearest previous non-empty block's last row (per-conv window
    # over ≤ size/block_size summary rows — bounded even for the hottest conv)
    wb = Window.partitionBy("__conv").orderBy("__block")
    carries = (
        last.select("__conv", "__block", F.lag("__last").over(wb).alias("__prev"))
        .filter(F.col("__prev").isNotNull())
        .select(
            "__conv",
            F.col("__prev.__idx").alias("__idx"),
            F.col("__prev.__ts").alias("__ts"),
            F.col("__prev.__sha1").alias("__sha1"),
            F.col("__block"),
            F.lit(True).alias("__carry"),
        )
    )

    salted = base.unionByName(carries)

    # phase 3: windows over (conv, block) — bounded task size. The orderBy
    # mirrors the unsalted suite's unified (idx, ts, sha1) ordering so dup
    # ties resolve identically; carry rows sort last within a tie.
    # Window expressions are projected ONCE as named columns before the
    # fail structs reference them: Catalyst extracts one evaluated window
    # column per OCCURRENCE (same rule the main suite works around —
    # embedding these in the fail array evaluated lag() ~6x per row).
    w = Window.partitionBy("__conv", "__block").orderBy("__idx", "__ts", "__sha1", "__carry")
    # duplicate counts must ignore carries (a carry duplicates its source key)
    wk = Window.partitionBy("__conv", "__idx")
    # carries share their source row's (conv, idx): sort them last so real
    # rows' dup ranks are unaffected by the injected boundary copies
    wko = Window.partitionBy("__conv", "__idx").orderBy("__carry", "__ts", "__sha1")
    salted = salted.select(
        "*",
        F.lag("__idx").over(w).alias("__prev_idx"),
        F.lag("__ts").over(w).alias("__prev_ts"),
        F.sum(F.when(~F.col("__carry"), 1).otherwise(0)).over(wk).alias("__dup_n"),
        (F.row_number().over(wko) - 1).alias("__dup_rank"),
    )
    prev_idx = F.col("__prev_idx")
    prev_ts = F.col("__prev_ts")
    dup_n = F.col("__dup_n")
    dup_rank = F.col("__dup_rank")

    # true global first row = first row of the conv's first block: no carry
    # precedes it; elsewhere prev is non-null by construction (carry injected).
    # Compact fail array via concat of conditional single-element arrays —
    # no lambda (F.filter is CodegenFallback and would drag the whole fail
    # subtree into interpreted eval; same fix as the main suite).
    _arr_t = "array<struct<check_id:string,severity:string,column:string,reason:string>>"

    def _fail(cond, check_id, column, reason):
        return F.when(
            cond,
            F.array(
                F.struct(
                    F.lit(check_id).alias("check_id"),
                    F.lit("error").alias("severity"),
                    (F.lit(column) if column else F.lit(None)).cast("string").alias("column"),
                    reason.alias("reason"),
                )
            ),
        ).otherwise(F.array().cast(_arr_t))

    fails = F.concat(
        _fail(
            dup_n > 1,
            "unique_turn",
            None,
            F.concat(F.lit("duplicate key (conv_id,turn_idx) rank="), dup_rank.cast("string")),
        ),
        _fail(
            ~(
                (prev_idx.isNotNull() | (F.col("__idx") == 0))
                & (prev_idx.isNull() | (F.col("__idx") == prev_idx + 1) | (F.col("__idx") == prev_idx))
            ),
            "turn_contiguous",
            None,
            F.when(
                prev_idx.isNull(),
                F.concat(F.lit("sequence must start at 0, got "), F.col("__idx").cast("string")),
            ).otherwise(
                F.concat(F.lit("sequence gap: "), prev_idx.cast("string"), F.lit(" -> "), F.col("__idx").cast("string"))
            ),
        ),
        _fail(
            ~(prev_ts.isNull() | F.col("__ts").isNull() | (F.col("__ts") >= prev_ts)),
            "ts_monotone",
            "ts",
            F.concat(F.lit("ts regressed: "), prev_ts.cast("string"), F.lit(" -> "), F.col("__ts").cast("string")),
        ),
    )

    return (
        salted.withColumn("__fails", fails)
        .filter(~F.col("__carry"))
        .select(
            "__conv",
            "__idx",
            "__sha1",
            F.explode(F.col("__fails")).alias("__f"),
        )
        .select(
            F.col("__f.check_id").alias("check_id"),
            F.col("__f.severity").alias("severity"),
            F.col("__conv").alias("conv_id"),
            F.col("__idx").alias("turn_idx"),
            F.col("__f.column").alias("column"),
            F.col("__f.reason").alias("reason"),
            F.col("__sha1").alias("text_sha1"),
            bucket_expr("__conv", n_buckets).alias("bucket_id"),
        )
    )
