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


def turn_sha1(conv_col: str = "conv_id", idx_col: str = "turn_idx", text_col: str = "text") -> Column:
    """C1: sha1(conv_id || 0x1f || turn_idx || 0x1f || text); every NULL
    field hashes as the literal '<null>' — concat_ws silently DROPS null
    arguments, which would make (NULL, 1, t) and ('1', NULL, t) collide.
    Analog: tag.Sum dispatch (sum.go:14-44)."""
    return F.sha1(
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


def conversation_digest(df: DataFrame, conv_col: str = "conv_id", idx_col: str = "turn_idx", text_col: str = "text") -> DataFrame:
    """C2: one SHA-1 per conversation over its turns in stable (turn_idx)
    order — `SumAll` (sum.go:47-54) with the stream replaced by the sorted
    turn sequence. Implemented with sort_array over collected structs so the
    result is independent of physical row order."""
    row_h = turn_sha1(conv_col, idx_col, text_col)
    return (
        df.select(F.col(conv_col), F.col(idx_col), row_h.alias("h"))
        .groupBy(conv_col)
        .agg(
            F.sha1(
                F.encode(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col("h").alias("h")))),
                            lambda s: s["h"],
                        ),
                        _SEP,
                    ),
                    "UTF-8",
                )
            ).alias("conv_sha1"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )


def column_subset_digest(df: DataFrame, cols: list[str], conv_col: str = "conv_id", idx_col: str = "turn_idx") -> DataFrame:
    """C3: metadata-invariant digest — hash only the payload columns,
    ignoring mutable metadata (SumAtoms hashes mdat only, sum.go:58-100).
    Changing excluded columns must not change the digest."""
    payload = F.concat_ws(_SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols])
    return (
        df.select(F.col(conv_col), F.col(idx_col), F.sha1(F.encode(payload, "UTF-8")).alias("h"))
        .groupBy(conv_col)
        .agg(
            F.sha1(
                F.encode(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col("h").alias("h")))),
                            lambda s: s["h"],
                        ),
                        _SEP,
                    ),
                    "UTF-8",
                )
            ).alias("payload_sha1")
        )
    )


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
