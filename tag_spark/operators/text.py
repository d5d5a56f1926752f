"""Text-analysis operators for training-data pipelines.

All hot-path expressions are pure Spark SQL (JVM-side, codegen'd); the one
genuinely sequential algorithm (64-bit polynomial rolling-hash fingerprint)
is a vectorized pandas UDF over Arrow batches — never per-row Python.

Formulas are deliberately reproducible in ANSI SQL so the driver's DuckDB
oracle can verify them (scripts/check_oracle.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def token_count(col: Column | str) -> Column:
    """Whitespace tokenization; empty/null-safe. (Engine analog of the
    reference's text-frame decode length checks, id3v2frames.go:304-314.)"""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(c.isNull(), F.lit(None)).when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-flavored proxy: word pieces = words + ceil(chars/4) residue for
    long words. Pure-expression approximation of subword token counts
    (useful for budget accounting at 100 TB where a real tokenizer UDF
    would dominate the job)."""
    c = F.col(col) if isinstance(col, str) else col
    words = token_count(c)
    chars = F.length(F.trim(c))
    return F.when(c.isNull(), F.lit(None)).otherwise(F.greatest(words, F.ceil(chars / 4))).cast("long")


# ---------------------------------------------------------------------------
# language identification (marker-count heuristic)
# ---------------------------------------------------------------------------

# literal marker substrings per language — matched with replace()-difference
# counting so both Spark and an ANSI-SQL oracle compute identical scores
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " que "],
    "fr": [" le ", " les ", " est "],
}
CJK_PATTERN = "[\\u4e00-\\u9fff]"
# fixed priority order resolves score ties identically in any engine
LANG_PRIORITY = ["zh", "en", "de", "es", "fr"]


def _occurrences(c: Column, marker: str) -> Column:
    return ((F.length(c) - F.length(F.replace(c, F.lit(marker), F.lit("")))) / len(marker)).cast("long")


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = F.concat(F.lit(" "), F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")), F.lit(" "))
    scores = {lang: sum(_occurrences(c, m) for m in markers) for lang, markers in LANG_MARKERS.items()}
    # CJK: count of han characters (each char is strong evidence)
    scores["zh"] = (F.length(c) - F.length(F.regexp_replace(c, CJK_PATTERN, ""))).cast("long")
    return scores


def lang_id(col: Column | str) -> Column:
    """Argmax over marker scores with the fixed LANG_PRIORITY tie-break;
    'und' (undetermined) when every score is zero."""
    s = lang_scores(col)
    chain = None
    for lang in LANG_PRIORITY:  # when-chain order == tie-break priority
        cond = s[lang] > 0
        for other in LANG_PRIORITY:
            if other != lang:
                cond = cond & (s[lang] >= s[other])
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic:
      0.4 * min(len/1000, 1)          — enough content
    + 0.3 * alnum_space_ratio         — low symbol noise
    + 0.3 * min(tokens/200, 1)        — real word structure
    Rounded to 6 dp for cross-engine hash stability."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    length = F.length(c)
    clean = F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    alnum_ratio = F.when(length > 0, clean / length).otherwise(F.lit(0.0))
    toks = F.coalesce(token_count(c), F.lit(0))
    score = (
        F.lit(0.4) * F.least(length / F.lit(1000.0), F.lit(1.0))
        + F.lit(0.3) * alnum_ratio
        + F.lit(0.3) * F.least(toks / F.lit(200.0), F.lit(1.0))
    )
    return F.round(score, 6)


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def md5_fingerprint(col: Column | str) -> Column:
    """Normalized-content fingerprint: lowercase, collapse whitespace, strip
    punctuation, md5. The exact-dedup key (C1-hash analog, sum.go:14-44)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9\\s]", ""), "\\s+", " "))
    return F.md5(norm)


def _rolling_hash_batch(texts: pd.Series) -> pd.Series:
    """64-bit polynomial rolling hash (Rabin-Karp, base 257, natural 2^64
    wraparound) over the raw text — the classic content-defined fingerprint.

    FULLY vectorized: all documents in the Arrow batch are encoded into one
    flat byte buffer (C-level join) and hashed in a single numpy pass —
    exponent per byte is its offset from its document's end, partial sums
    fold per-segment via ``np.add.reduceat``. No Python loop whose body
    executes per document."""
    out = np.zeros(len(texts), dtype=np.uint64)
    base = np.uint64(257)
    enc = texts.fillna("").str.encode("utf-8", "surrogatepass")
    lens = enc.str.len().to_numpy(dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return pd.Series(out.view(np.int64))
    with np.errstate(over="ignore"):
        flat = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        # base^k mod 2^64 lookup up to the longest doc, one wraparound cumprod
        pows = np.full(int(lens.max()), base, dtype=np.uint64)
        pows[0] = np.uint64(1)
        pows = np.cumprod(pows)
        # hash = Σ b[i]·base^(n-1-i): exponent = (segment end - 1 - position)
        exp = np.repeat(ends, lens) - 1 - np.arange(len(flat), dtype=np.int64)
        terms = flat * pows[exp]
        # reduceat over nonempty segment starts partitions the flat buffer
        # exactly (empty docs contribute no bytes and keep their 0 sentinel)
        out[nz] = np.add.reduceat(terms, starts[nz])
    return pd.Series(out.view(np.int64))


def rolling_hash_64(col: Column | str) -> Column:
    """Column wrapper; the pandas_udf is created lazily because decorator-time
    DDL parsing requires an active SparkSession."""
    return pandas_udf(_rolling_hash_batch, "long")(F.col(col) if isinstance(col, str) else col)


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def repetition_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics — the Gopher/MassiveText-style
    quality filters (Rae et al. 2021 §A1.1, public) over word-soup text
    with no line structure: duplicate-word fraction, most-frequent-word
    fraction, and most-frequent-bigram fraction. High values flag
    boilerplate and degenerate generations for training-data curation.

    Shape (100 TB): tokenization is one row-local array projection; the
    bigram array is built from zip-shifted slices and exploded ONCE
    (CLAUDE.md: never fan a computed array into N interpreted lambda
    consumers), then everything is two partial-aggregable groupBys keyed
    by (doc, gram) → doc — the same shuffle key, so AQE coalesces them
    onto one exchange footprint. No window, no Python.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("__w"))

    def gram_stats(grams_df: DataFrame, out_prefix: str) -> DataFrame:
        counts = grams_df.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("n"))
        return counts.groupBy("doc_id").agg(
            F.sum("n").alias(f"{out_prefix}_total"),
            F.count(F.lit(1)).alias(f"{out_prefix}_distinct"),
            F.max("n").alias(f"{out_prefix}_top"),
        )

    wstats = gram_stats(base.select("doc_id", F.explode("__w").alias("g")), "w")
    # bigrams: zip the array with its shift-by-one; valid while the SECOND
    # word exists (arrays_zip pads the shorter slice with nulls)
    zipped = F.arrays_zip(F.col("__w"), F.slice(F.col("__w"), 2, 1 << 30).alias("__w2"))
    bigrams = F.array_compact(
        F.transform(zipped, lambda s: F.when(s["__w2"].isNotNull(), F.concat_ws(" ", s["__w"], s["__w2"])))
    )
    bstats = gram_stats(
        base.select("doc_id", F.explode(bigrams).alias("g")), "b"
    )

    ids = df.select(F.col(id_col).alias("doc_id"))
    out = ids.join(wstats, "doc_id", "left").join(bstats, "doc_id", "left")
    nw = F.coalesce(F.col("w_total"), F.lit(0))
    nb = F.coalesce(F.col("b_total"), F.lit(0))
    return out.select(
        "doc_id",
        nw.alias("n_words"),
        F.coalesce(F.col("w_distinct"), F.lit(0)).alias("n_distinct_words"),
        F.when(nw > 0, F.round(F.lit(1.0) - F.col("w_distinct") / nw, 6)).otherwise(F.lit(0.0)).alias("dup_word_frac"),
        F.when(nw > 0, F.round(F.col("w_top") / nw, 6)).otherwise(F.lit(0.0)).alias("top_word_frac"),
        F.when(nb > 0, F.round(F.col("b_top") / nb, 6)).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )


def profile_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: tokens, quality, language, fingerprint."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_guess"),
        md5_fingerprint(c).alias("fingerprint"),
    )
