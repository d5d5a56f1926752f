"""Text relevance retrieval: BM25 scoring and reciprocal-rank fusion.

The lexical complement of the vector-ANN family (similarity.py) for the
same training-data pipeline: BM25 top-k answers "which documents match
these query terms", RRF fuses that lexical ranking with the embedding
ranking into one hybrid result — the standard first-stage retrieval stack
for corpus curation and dedup triage at 100 TB.

Reference semantics analog: the reference resolves a lookup by walking
frames and scoring/selecting the matching one (frame loop id3v2.go:229-258
selecting by frame id); here the "lookup" is ranked text retrieval over a
table of documents, re-expressed as declarative DataFrame ops.

Scale design (100 TB):
 - Tokenization is ONE `explode(split(...))` projection; the query-term
   filter lands BEFORE the tf aggregation, so the only shuffle carries
   postings for the query's terms, not the whole corpus (query-time
   scoring without a prebuilt index). A persisted `(doc_id, term, tf)`
   inverted index amortizes that scan across queries — build it with
   `term_frequencies` and pass it via `tf=`.
 - Document length is computed ROW-LOCALLY (size of the token array), so
   the per-doc length join input never shuffles corpus text.
 - N/avgdl are one partial-aggregate scalar row, attached via
   `F.broadcast` crossJoin — no collect, no driver round-trip.
 - df/idf for the query's terms is a tiny broadcast (≤ |query| rows).
 - Top-k is `orderBy(...).limit(k)` → TakeOrderedAndProject, never a full
   sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BM25 constants (Robertson/Sparck-Jones defaults, public)
K1 = 1.2
B = 0.75

_TOKEN_SPLIT = r"\s+"


def _tokens_col(text_col) -> "F.Column":
    """Row-local token array: lowercase, whitespace split, empties dropped.
    The SINGLE tokenization definition shared by doc_tokens / doc_length —
    and replayed verbatim by the DuckDB oracle (string_split_regex +
    list_filter)."""
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col, F.lit(""))
    return F.filter(F.split(F.lower(c), _TOKEN_SPLIT), lambda t: t != "")


def doc_length(text_col) -> "F.Column":
    """|d| in tokens, computed row-locally (no explode, no shuffle)."""
    return F.size(_tokens_col(text_col))


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term) posting stream — one explode projection."""
    return docs.select(F.col(id_col).alias("doc_id"), F.explode(_tokens_col(text_col)).alias("term"))


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The (doc_id, term, tf) inverted index — one shuffle on (doc_id,
    term) with map-side partial aggregation. Persist this to amortize the
    corpus scan across many queries."""
    return doc_tokens(docs, id_col, text_col).groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    tf: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k: score(d,Q) = Σ_t idf(t)·tf·(k1+1) / (tf + k1·(1-b+b·|d|/avgdl))
    with the +1-smoothed idf ln((N-df+0.5)/(df+0.5)+1) (always ≥ 0).

    Corpus statistics (N, avgdl) are defined over documents with ≥1 token.
    Returns (doc_id, bm25) rounded to 6dp, ordered by (bm25 desc, doc_id)
    — the deterministic tie-break the oracle replays. Pass a persisted
    `term_frequencies` output via `tf=` to skip re-tokenizing the corpus.
    """
    terms = sorted(set(query_terms))
    # persisted: (doc_id, dl) feeds both the scalar stats aggregate and the
    # per-doc join — un-persisted, each consumer re-splits the corpus text
    base = (
        docs.select(F.col(id_col).alias("doc_id"), doc_length(text_col).alias("dl"))
        .filter(F.col("dl") > 0)
        .persist()
    )
    # one scalar row (partial agg) — broadcast, never collected
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    if tf is None:
        # query-term filter BEFORE the aggregation: the shuffle carries
        # only the query's postings
        toks = doc_tokens(docs, id_col, text_col).filter(F.col("term").isin(terms))
        tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    else:
        tf = tf.filter(F.col("term").isin(terms))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    denom = tfd + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * tfd * (k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(base, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 10, rrf_k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, public):
    rrf(d) = Σ_lists 1/(rrf_k + rank_list(d)), missing-from-list
    contributes 0. Each input is (doc_id, rank) with rank 1-based; inputs
    are unioned (no join explosion), one groupBy on doc_id, top-k via
    TakeOrderedAndProject. Output: (doc_id, rrf, n_lists) rounded 6dp,
    ordered (rrf desc, doc_id)."""
    tagged = None
    for r in rankings:
        part = r.select("doc_id", (1.0 / (F.lit(rrf_k) + F.col("rank"))).alias("w"))
        tagged = part if tagged is None else tagged.unionByName(part)
    return (
        tagged.groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("rrf"), F.count(F.lit(1)).alias("n_lists"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(k)
    )


def ranked(df: DataFrame, score_col: str, id_col: str = "doc_id", ascending: bool = False) -> DataFrame:
    """Attach a deterministic 1-based dense rank by (score, id) — the
    (score desc|asc, id asc) ordering every retrieval list here uses. A
    single window over an already-small candidate list (top-k outputs),
    not a corpus-wide sort."""
    from pyspark.sql import Window

    order = [F.col(score_col).asc() if ascending else F.col(score_col).desc(), F.col(id_col).asc()]
    w = Window.orderBy(*order)
    return df.select(F.col(id_col).alias("doc_id"), F.row_number().over(w).alias("rank"))
