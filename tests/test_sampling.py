"""Deterministic sampling + quantization: hash_sample, stratified_sample,
quantize_embeddings."""

import pytest
from pyspark.sql import functions as F

from tag_spark.operators.sampling import hash_sample, quantize_embeddings, stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def test_hash_sample_fraction_and_determinism(spark, docs):
    n = docs.count()
    s = hash_sample(docs, 0.5, "doc_id")
    k = s.count()
    assert 0.35 * n < k < 0.65 * n  # ~Binomial(n, .5), generous band
    # identical membership at any parallelism — hash-derived, no RNG
    ids1 = {r["doc_id"] for r in s.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in hash_sample(docs.repartition(17), 0.5, "doc_id").select("doc_id").collect()}
    assert ids1 == ids2
    # boundary semantics
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == n
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, "doc_id")


def test_hash_sample_is_filter_only_no_shuffle(docs):
    plan = hash_sample(docs, 0.3, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # row-local: dropped rows never move


def test_stratified_sample_k_per_stratum_deterministic(docs):
    s = stratified_sample(docs, "lang", k=3, id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in full.items():
        assert counts.get(lang, 0) == min(3, n), (lang, counts.get(lang), n)
    # membership is the md5-smallest ids per stratum, at any parallelism
    got = {(r["lang"], r["doc_id"]) for r in s.select("lang", "doc_id").collect()}
    got17 = {
        (r["lang"], r["doc_id"])
        for r in stratified_sample(docs.repartition(17), "lang", k=3, id_col="doc_id").select("lang", "doc_id").collect()
    }
    assert got == got17
    import hashlib

    rows = [(r["lang"], r["doc_id"]) for r in docs.select("lang", "doc_id").collect()]
    by_lang = {}
    for lang, did in rows:
        by_lang.setdefault(lang, []).append(did)
    expect = set()
    for lang, ids in by_lang.items():
        ids.sort(key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        expect |= {(lang, d) for d in ids[:3]}
    assert got == expect


def test_quantize_embeddings_roundtrip_bounds(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_embeddings(emb)
    rows = q.join(emb, "vec_id").select("vec_id", "scale", "q", "embedding").collect()
    assert rows
    for r in rows[:50]:
        if r["scale"] == 0.0:
            assert all(v == 0 for v in r["q"])
            continue
        # the max-|x| coordinate maps to exactly +/-127; everything within range
        assert max(abs(v) for v in r["q"]) == 127
        # dequantization error bounded by half a step
        for x, v in zip(r["embedding"], r["q"]):
            assert abs(float(x) - v * r["scale"]) <= r["scale"] / 2 + 1e-12


def test_quantize_embeddings_zero_vector_guard(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0]), (2, [0.0, 2.0, -4.0])], "vec_id: long, embedding: array<float>")
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert got[1]["scale"] == 0.0 and got[1]["q"] == [0, 0, 0]
    # 2 / (4/127) = 63.5 exactly: semantics PINNED to half-away-from-zero
    # (sign(r)*floor(|r|+0.5) in both engines) -> 64, never 63
    assert got[2]["q"] == [0, 64, -127]
    assert got[2]["q"][2] == -127
