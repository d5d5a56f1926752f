"""Sequence chunking + packing operators for LLM training-data pipelines.

Two deterministic, oracle-replayable building blocks downstream of the
dedup/quality stages:

``chunk_documents``
    Overlapping fixed-token-window chunks per document (the RAG /
    long-context split step). Reference analog: the frame loop slicing one
    tag payload into bounded frames (id3v2.go:319-344) — here one document
    is sliced into bounded, overlapping token windows.

``pack_token_stream``
    GPT-style sequence packing: every document's token span inside the
    single concatenated corpus token stream (docs in ``id_col`` order, cut
    every ``budget`` tokens). Reports each doc's global token offset and
    the first/last training sequence it lands in. Reference analog: the
    byte-offset bookkeeping a single-pass tag reader carries while walking
    concatenated frames (id3v2.go:319-330, offset accumulation).

Scale notes (100 TB):
  * chunking never recomputes ``split(text)`` per chunk — CLAUDE.md's
    CollapseProject rule: a computed array fanned into N consumers is
    re-evaluated N times. Words are exploded ONCE with positions, each
    word emits its (≤ ceil(chunk/stride)) owning chunk ids, and chunks
    reassemble in ONE partial-aggregable groupBy on (doc, chunk).
  * packing needs a GLOBAL prefix sum — the naive global window is a
    single-partition sort (a 100 TB scale-killer). Instead: deterministic
    id-range buckets, per-bucket totals (ONE tiny driver collect, ≤
    n_buckets rows — same bounded-collect class as the histogram bucket
    ids), broadcast prefix offsets, per-bucket window cumsum. Each bucket
    sorts independently; no stage ever sees more than 1/n_buckets of the
    data in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tag_spark.operators.text import token_count


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Chunk ``k`` covers word positions ``[k*stride, k*stride + chunk_size)``
    (0-based, whitespace tokens, empties dropped); a chunk exists for every
    start below the document's token count, so trailing chunks may be
    short. Empty/null documents yield no chunks.

    Returns (doc_id, chunk_idx, n_tokens, chunk_md5) — the md5 is over the
    space-rejoined chunk text, the dedup-friendly shape (chunk text itself
    is reproducible from the source row).
    """
    if not 0 < stride <= chunk_size:
        # stride > chunk_size would leave token gaps between chunks and
        # break the chunk-count formula below
        raise ValueError(f"require 0 < stride <= chunk_size, got stride={stride} chunk_size={chunk_size}")
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    # ROW-LOCAL chunking, zero shuffle: the token array is materialized once
    # per document (a named Project column — the per-chunk slice below
    # references the ATTRIBUTE, so CollapseProject cannot re-inline the
    # split per chunk), chunk ids explode from a guarded sequence (n=0 docs
    # yield NULL → no rows; an unguarded sequence(0,-1) counts DOWN under
    # ANSI), and each chunk is a slice + concat + md5 of its own row's
    # array. This replaces the word-level explode → exchange on
    # (doc, chunk) → collect_list + array_sort reassembly: every word
    # string crossed that shuffle ~chunk/stride times and every chunk paid
    # a sort — now nothing is shuffled at all. Row-local cost is bounded by
    # (n_words/stride) slices of the shared array per doc; for pathological
    # multi-100k-token documents the array copy per slice makes this
    # O(n²/stride) bytes of task-local work — still no exchange, no skew.
    n_chunks = F.ceil(F.size("__w") / F.lit(stride))
    chunks = df.select(F.col(id_col).alias("doc_id"), words.alias("__w")).select(
        "doc_id",
        "__w",
        F.explode(
            F.when(F.size("__w") > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1))
        ).alias("chunk_idx"),
    )
    sl = F.slice(F.col("__w"), (F.col("chunk_idx") * stride + 1).cast("int"), chunk_size)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", sl)).alias("chunk_md5"),
    )


def pack_token_stream(
    df: DataFrame,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global token offsets under GPT-style concat-then-cut packing.

    Documents are concatenated in ``id_col`` order into one token stream
    cut into ``budget``-token training sequences. Returns per document:
    (doc_id, n_tokens, token_offset, first_seq, last_seq, n_seqs) where
    seq ids are ``offset div budget``. Zero-token docs report their stream
    position with n_seqs=0 (they contribute nothing to any sequence).

    Distributed shape: the prefix sum is two-phase. doc ids are range-
    bucketed (bucket boundaries monotone in id, so per-bucket cumsum +
    bucket prefix == the global cumsum by construction); per-bucket totals
    are ONE bounded driver collect (≤ n_buckets rows); the broadcast
    prefix joins back on bucket id. No global single-partition sort.
    """
    # persisted: (doc_id, n) is consumed by the per-bucket totals pass AND
    # the final window pass — without the persist each pass re-tokenizes
    # (re-splits) every document's text, which dominates the scan
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(token_count(F.col(text_col)), F.lit(0)).alias("n"),
    ).persist()
    # deterministic monotone bucketing over the id range: ids need not be
    # dense, only orderable; an empty table short-circuits (min/max null).
    # min/max read the RAW df, not base: through base the persist would
    # force full tokenization + cache build under what is otherwise a
    # column-pruned id-only scan (measured +1.7 s at sf1.0)
    lo_hi = df.agg(F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")).first()
    spark = df.sparkSession
    if lo_hi["lo"] is None:
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, token_offset long, first_seq long, last_seq long, n_seqs long"
        )
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    span = max(1, hi - lo + 1)
    # bucket arithmetic in DOUBLE from the start: (doc_id - lo) * n_buckets
    # as 64-bit integers raises ARITHMETIC_OVERFLOW under ANSI mode once the
    # id span exceeds ~2^63/n_buckets; double rounding preserves the only
    # property the bucket id needs (monotone in doc_id) and cannot overflow
    # (ADVICE r5)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("doc_id").cast("double") - F.lit(float(lo))) * F.lit(float(n_buckets)) / F.lit(float(span))),
    ).cast("int")
    b = base.withColumn("__b", bucket)
    # phase 1: per-bucket totals -> driver (bounded by n_buckets) -> prefix
    totals = {r["__b"]: r["t"] for r in b.groupBy("__b").agg(F.sum("n").alias("t")).collect()}
    prefix, acc = {}, 0
    for k in range(n_buckets):
        prefix[k] = acc
        acc += int(totals.get(k, 0))
    prefix_df = F.broadcast(spark.createDataFrame([(k, v) for k, v in prefix.items()], "__b int, __prefix long"))
    # phase 2: per-bucket cumsum, offset = bucket prefix + within-bucket
    # running sum excluding self
    from pyspark.sql import Window

    w = Window.partitionBy("__b").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        b.join(prefix_df, "__b")
        .withColumn("__off", F.col("__prefix") + F.sum("n").over(w) - F.col("n"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("__off").cast("long").alias("token_offset"),
            F.expr(f"__off div {budget}").cast("long").alias("first_seq"),
            F.when(F.col("n") > 0, F.expr(f"(__off + n - 1) div {budget}"))
            .otherwise(F.expr(f"__off div {budget}"))
            .cast("long")
            .alias("last_seq"),
            F.when(F.col("n") > 0, F.expr(f"(__off + n - 1) div {budget} - __off div {budget} + 1"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_seqs"),
        )
    )
    return out
