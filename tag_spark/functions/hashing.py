"""Canonical content digests — the engine's `Sum` family (sum.go:14-219).

The reference computes metadata-invariant SHA-1s so fixtures can assert
byte-for-byte audio equality without storing audio. We do the same for
turns: a canonical per-turn hash (C1) and an ordered per-conversation /
per-bucket digest (C2), both pure Spark SQL expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 0x1f unit separator — unambiguous field delimiter for canonical hashing
_SEP = "\x1f"


def _hash_fn(algo: str):
    if algo == "sha1":
        return F.sha1
    if algo == "md5":
        return F.md5
    raise ValueError(f"unsupported digest algo: {algo!r}")


def turn_hash(conv_col: str = "conv_id", idx_col: str = "turn_idx", text_col: str = "text", algo: str = "sha1") -> Column:
    """C1: hash(conv_id || 0x1f || turn_idx || 0x1f || text); every NULL
    field hashes as the literal '<null>' — concat_ws silently DROPS null
    arguments, which would make (NULL, 1, t) and ('1', NULL, t) collide.
    Analog: tag.Sum dispatch (sum.go:14-44). ``algo='md5'`` gives the
    SQL-oracle-reproducible variant (DuckDB has md5 but no sha1)."""
    return _hash_fn(algo)(
        F.encode(
            F.concat_ws(
                _SEP,
                F.coalesce(F.col(conv_col).cast("string"), F.lit("<null>")),
                F.coalesce(F.col(idx_col).cast("string"), F.lit("<null>")),
                F.coalesce(F.col(text_col), F.lit("<null>")),
            ),
            "UTF-8",
        )
    )


def turn_sha1(conv_col: str = "conv_id", idx_col: str = "turn_idx", text_col: str = "text") -> Column:
    return turn_hash(conv_col, idx_col, text_col, algo="sha1")


def conversation_digest(
    df: DataFrame, conv_col: str = "conv_id", idx_col: str = "turn_idx", text_col: str = "text", algo: str = "sha1"
) -> DataFrame:
    """C2: one digest per conversation over its turns in stable (turn_idx)
    order — `SumAll` (sum.go:47-54) with the stream replaced by the sorted
    turn sequence. Implemented with sort_array over collected structs so the
    result is independent of physical row order. The sort key coalesces a
    NULL turn_idx to long-min (explicit NULLS FIRST) with the row hash as
    tie-break, so the ordering is total and engine-independent — an SQL
    oracle mirrors it with ``ORDER BY coalesce(idx, <long-min>), h``.
    Output column: ``conv_sha1`` / ``conv_md5`` per ``algo``."""
    row_h = turn_hash(conv_col, idx_col, text_col, algo)
    sort_key = F.coalesce(F.col(idx_col).cast("long"), F.lit(-(1 << 62)))
    return (
        df.select(F.col(conv_col), sort_key.alias("__i"), row_h.alias("h"))
        .groupBy(conv_col)
        .agg(
            _hash_fn(algo)(
                F.encode(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct(F.col("__i").alias("i"), F.col("h").alias("h")))),
                            lambda s: s["h"],
                        ),
                        _SEP,
                    ),
                    "UTF-8",
                )
            ).alias(f"conv_{algo}"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )


def column_subset_digest(
    df: DataFrame, cols: list[str], conv_col: str = "conv_id", idx_col: str = "turn_idx", algo: str = "sha1"
) -> DataFrame:
    """C3: metadata-invariant digest — hash only the payload columns,
    ignoring mutable metadata (SumAtoms hashes mdat only, sum.go:58-100).
    Changing excluded columns must not change the digest. Sort key matches
    conversation_digest (NULL idx -> long-min, row-hash tie-break) so an
    SQL oracle can replay the ordering; ``algo='md5'`` is the replayable
    variant."""
    payload = F.concat_ws(_SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols])
    sort_key = F.coalesce(F.col(idx_col).cast("long"), F.lit(-(1 << 62)))
    return (
        df.select(F.col(conv_col), sort_key.alias("__i"), _hash_fn(algo)(F.encode(payload, "UTF-8")).alias("h"))
        .groupBy(conv_col)
        .agg(
            _hash_fn(algo)(
                F.encode(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct(F.col("__i").alias("i"), F.col("h").alias("h")))),
                            lambda s: s["h"],
                        ),
                        _SEP,
                    ),
                    "UTF-8",
                )
            ).alias(f"payload_{algo}")
        )
    )


def exclusion_digest(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    skip_head: int = 0,
    skip_tail: int = 0,
    algo: str = "sha1",
) -> DataFrame:
    """C4-C6: per-conversation digest over the turn sequence with the first
    ``skip_head`` and/or last ``skip_tail`` turns EXCLUDED — the engine
    analog of the reference's both-ends exclusion sums: SumID3v1 hashes all
    but the 128-byte trailer (sum.go:117-134), SumID3v2 skips the header+tag
    block (sum.go:138-165), SumFLAC/SumOGG skip leading metadata blocks
    (sum.go:169-215). Changing excluded turns must not change the digest.

    One groupBy: turns are collected, sorted by (idx, row-hash), sliced to
    the kept window, then folded into a single digest. A conversation with
    fewer than skip_head+skip_tail turns digests the empty sequence."""
    row_h = turn_hash(conv_col, idx_col, text_col, algo)
    sort_key = F.coalesce(F.col(idx_col).cast("long"), F.lit(-(1 << 62)))
    rows = F.array_sort(F.collect_list(F.struct(F.col("__i").alias("i"), F.col("h").alias("h"))))
    kept = F.slice(rows, skip_head + 1, F.greatest(F.size(rows) - skip_head - skip_tail, F.lit(0)))
    return (
        df.select(F.col(conv_col), sort_key.alias("__i"), row_h.alias("h"))
        .groupBy(conv_col)
        .agg(
            _hash_fn(algo)(F.encode(F.array_join(F.transform(kept, lambda s: s["h"]), _SEP), "UTF-8")).alias(
                f"payload_{algo}"
            ),
            F.greatest(F.count(F.lit(1)) - skip_head - skip_tail, F.lit(0)).alias("n_hashed"),
        )
    )


def digest_excluding_trailer(df: DataFrame, n_tail: int = 1, **kw) -> DataFrame:
    """C4 (SumID3v1, sum.go:117-134): everything but the fixed-size trailer."""
    return exclusion_digest(df, skip_tail=n_tail, **kw)


def digest_excluding_header(df: DataFrame, n_head: int = 1, **kw) -> DataFrame:
    """C5 (SumID3v2, sum.go:138-165): everything after the header block."""
    return exclusion_digest(df, skip_head=n_head, **kw)


def digest_excluding_edges(df: DataFrame, n_head: int = 1, n_tail: int = 1, **kw) -> DataFrame:
    """C6 (SumFLAC/SumOGG, sum.go:169-215): both ends excluded."""
    return exclusion_digest(df, skip_head=n_head, skip_tail=n_tail, **kw)


def frame_digest(df: DataFrame, cols: list[str]) -> str:
    """Whole-DataFrame order-insensitive digest for fixture assertions in
    tests: xor-free, stable — sha1 of the sorted row-hash list. Collects one
    hash per row; use on SMALL frames only (violation sets, verdicts)."""
    row_h = F.sha1(F.encode(F.concat_ws(_SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols]), "UTF-8"))
    hashes = [r[0] for r in df.select(row_h.alias("h")).collect()]
    import hashlib

    agg = hashlib.sha1()
    for h in sorted(hashes):
        agg.update(h.encode())
    return agg.hexdigest()
