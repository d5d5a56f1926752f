"""BM25 + reciprocal-rank fusion: scoring math vs an independent Python
replay, persisted-index parity, fusion semantics, plan shape."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tag_spark.operators.relevance import K1, B, bm25_topk, doc_length, ranked, rrf_fuse, term_frequencies

DOCS = [
    Row(doc_id=0, text="x x y"),
    Row(doc_id=1, text="x z"),
    Row(doc_id=2, text="z z z z"),
    Row(doc_id=3, text="  "),  # tokenless: excluded from N/avgdl
    Row(doc_id=4, text=None),
]


def _expected_bm25(query_terms):
    """Independent float replay of the exact formula the operator claims."""
    toks = {0: ["x", "x", "y"], 1: ["x", "z"], 2: ["z", "z", "z", "z"]}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, ts in toks.items():
        s = 0.0
        for t in query_terms:
            tf = ts.count(t)
            if not tf:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
        if s:
            out[d] = round(s, 6)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bm25_matches_hand_formula(spark):
    docs = spark.createDataFrame(DOCS)
    got = [(r["doc_id"], r["bm25"]) for r in bm25_topk(docs, ["x", "y"], k=10).collect()]
    assert got == _expected_bm25(["x", "y"])
    # single-term query exercises the df denominator alone
    got_z = [(r["doc_id"], r["bm25"]) for r in bm25_topk(docs, ["z"], k=10).collect()]
    assert got_z == _expected_bm25(["z"])


def test_bm25_persisted_index_parity(spark):
    """bm25_topk(tf=term_frequencies(...)) must equal the direct path —
    the amortized-index route a 100 TB corpus would take."""
    docs = spark.createDataFrame(DOCS)
    tf = term_frequencies(docs)
    a = bm25_topk(docs, ["x", "y"], k=10).collect()
    b = bm25_topk(docs, ["x", "y"], k=10, tf=tf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_unknown_terms_empty(spark):
    docs = spark.createDataFrame(DOCS)
    assert bm25_topk(docs, ["nosuchterm"], k=10).count() == 0


def test_doc_length_row_local(spark):
    docs = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r["dl"] for r in docs.select("doc_id", doc_length("text").alias("dl")).collect()}
    assert got == {0: 3, 1: 2, 2: 4, 3: 0, 4: 0}


def test_rrf_fusion_math(spark):
    # list1 ranks docs 1,2,3; list2 ranks 3,1 — doc3: 1/63 + 1/61, doc1: 1/61 + 1/62
    l1 = spark.createDataFrame([Row(doc_id=1, rank=1), Row(doc_id=2, rank=2), Row(doc_id=3, rank=3)])
    l2 = spark.createDataFrame([Row(doc_id=3, rank=1), Row(doc_id=1, rank=2)])
    got = {r["doc_id"]: (r["rrf"], r["n_lists"]) for r in rrf_fuse([l1, l2], k=10).collect()}
    assert got[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert got[3] == (round(1 / 63 + 1 / 61, 6), 2)
    assert got[2] == (round(1 / 62, 6), 1)
    # ordering: doc1 (0.032522) > doc3 (0.032266) > doc2
    top = [r["doc_id"] for r in rrf_fuse([l1, l2], k=2).collect()]
    assert top == [1, 3]


def test_ranked_deterministic_ties(spark):
    df = spark.createDataFrame([Row(doc_id=5, s=1.0), Row(doc_id=2, s=1.0), Row(doc_id=9, s=2.0)])
    got = [(r["doc_id"], r["rank"]) for r in ranked(df, "s").orderBy("rank").collect()]
    assert got == [(9, 1), (2, 2), (5, 3)]


def test_bm25_plan_shape(spark):
    """Scale guards: the top-k is a TakeOrderedAndProject (no global
    sort), the df/stats sides are broadcast, and the query-term filter
    sits below the posting aggregation (pushdown — the shuffle carries
    only query-term postings)."""
    docs = spark.createDataFrame(DOCS)
    plan = bm25_topk(docs, ["x", "y"], k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    optimized = bm25_topk(docs, ["x", "y"], k=10)._jdf.queryExecution().optimizedPlan().toString()
    # the isin filter must appear under the first aggregate over postings
    agg_pos = optimized.find("Aggregate")
    assert agg_pos != -1 and ("x,y" in optimized or "x, y" in optimized)
