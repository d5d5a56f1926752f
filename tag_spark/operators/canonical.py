"""Canonical validated view — the `Metadata` interface analog.

The reference's central abstraction is one canonical record shape that five
independent per-format implementations normalize into (Metadata interface,
tag.go:101-147; impls id3v1.go:117-144, id3v2metadata.go:51-152,
mp4.go:284-379, vorbis.go:159-266, dsf.go:47-109), with the test suite
asserting that the SAME logical content in every dialect normalizes to the
SAME canonical values (tag_test.go:55-84).

Table equivalent: dialect-tolerant normalization of transcript rows —
role/tool synonym folding (the per-format frame-name tables,
id3v2metadata.go:12-33), NUL/whitespace text hygiene (trimString),
tolerant timestamp handling — into one canonical schema, plus the
`mbz.Extract` analog: filtering a raw key→value map by key prefix and
resolving aliases (mbz/mbz.go:43-92).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tag_spark.functions.hashing import turn_sha1
from tag_spark.functions.parsing import trim_nuls

# synonym→canonical folding tables (alias-map analog, mbz/mbz.go:29-40 and
# the per-version frame-name dictionaries id3v2metadata.go:12-33)
ROLE_ALIASES = {
    "ai": "assistant",
    "bot": "assistant",
    "model": "assistant",
    "human": "user",
    "customer": "user",
    "sys": "system",
    "function": "tool",
    "tool_result": "tool",
}

TOOL_ALIASES = {
    "websearch": "search",
    "web_search": "search",
    "shell": "bash",
    "terminal": "bash",
    "py": "python",
    "calc": "calculator",
}


def _alias_fold(col: Column, aliases: dict[str, str]) -> Column:
    """lower/trim then literal-map alias resolution (broadcast-free)."""
    c = F.lower(F.trim(col))
    m = F.create_map(*[x for k, v in aliases.items() for x in (F.lit(k), F.lit(v))])
    return F.coalesce(F.element_at(m, c), c)


def canonicalize_transcripts(df: DataFrame) -> DataFrame:
    """One canonical view from any dialect variant. Pure expressions; the
    same logical conversation written with role synonyms, NUL-padded text or
    cased tool names canonicalizes byte-identically (asserted in
    tests/test_canonical.py — the TestReadFrom equivalence analog)."""
    role = _alias_fold(F.col("role"), ROLE_ALIASES)
    tool_raw = _alias_fold(F.col("tool"), TOOL_ALIASES)
    tool = F.when(tool_raw == "", F.lit(None).cast("string")).otherwise(tool_raw)
    text = trim_nuls(F.col("text"))
    out = df.select(
        F.col("conv_id"),
        # try_cast: dialect-TOLERANT means out-of-range/malformed inputs
        # normalize to null (and get flagged by NotNull checks), never crash
        F.col("turn_idx").try_cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.col("ts").try_cast("timestamp").alias("ts"),
        F.year(F.col("ts").try_cast("timestamp")).alias("year"),
    )
    return out.withColumn("text_sha1", turn_sha1())


# ---------------------------------------------------------------------------
# mbz.Extract analog: prefix-filtered raw-map extraction with alias resolve
# ---------------------------------------------------------------------------


def extract_prefixed(
    df: DataFrame,
    map_col: str,
    prefix: str,
    aliases: dict[str, str] | None = None,
) -> DataFrame:
    """Keep only raw-map keys with the given prefix (prefix-scan of Raw()
    keys, mbz/mbz.go:66-92), strip the prefix, resolve aliases
    (mbz/mbz.go:52-64), return the rebuilt map column ``extracted``."""
    aliases = aliases or {}
    m = F.col(map_col)
    entries = F.filter(F.map_entries(m), lambda e: e["key"].startswith(prefix))
    amap = F.create_map(*[x for k, v in aliases.items() for x in (F.lit(k), F.lit(v))]) if aliases else None

    def fold(e):
        stripped = F.substring(e["key"], len(prefix) + 1, 2**31 - 1)
        resolved = F.coalesce(F.element_at(amap, stripped), stripped) if aliases else stripped
        return F.struct(resolved.alias("key"), e["value"].alias("value"))

    resolved = F.transform(entries, fold)
    # two raw keys may alias to the same resolved key; map_from_entries
    # throws DUPLICATED_MAP_KEY, so keep the LAST occurrence (hostile input
    # must never crash the job — fuzz contract). O(n²) over tiny maps.
    deduped = F.filter(
        resolved,
        lambda e, i: ~F.exists(
            F.slice(resolved, i + 2, F.greatest(F.size(resolved) - i - 1, F.lit(0))),
            lambda later: later["key"] == e["key"],
        ),
    )
    return df.withColumn("extracted", F.map_from_entries(deduped))
