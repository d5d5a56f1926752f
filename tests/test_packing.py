"""chunk_documents + pack_token_stream vs an independent pure-Python replay."""

from __future__ import annotations

import hashlib

import pytest

from tag_spark.operators.packing import chunk_documents, pack_token_stream

DOCS = [
    (0, "a b c d e f g h i j"),  # 10 tokens
    (1, None),  # null -> 0 tokens, no chunks
    (2, ""),  # empty -> 0 tokens, no chunks
    (3, "  x   y  "),  # messy whitespace -> 2 tokens
    (4, " ".join(f"w{i}" for i in range(150))),  # spans several chunks
    (5, "solo"),
    (7, " ".join(f"q{i}" for i in range(64))),  # exactly one full chunk at size 64
]


def py_tokens(text: str | None) -> list[str]:
    return [t for t in (text or "").split()] if text else []


def py_chunks(docs, chunk_size, stride):
    out = []
    for doc_id, text in docs:
        w = py_tokens(text)
        k = 0
        while k * stride < len(w):
            piece = w[k * stride : k * stride + chunk_size]
            out.append((doc_id, k, len(piece), hashlib.md5(" ".join(piece).encode()).hexdigest()))
            k += 1
    return sorted(out)


def py_pack(docs, budget):
    out, off = [], 0
    for doc_id, text in sorted(docs):
        n = len(py_tokens(text))
        first = off // budget
        last = (off + n - 1) // budget if n > 0 else first
        out.append((doc_id, n, off, first, last, (last - first + 1) if n > 0 else 0))
        off += n
    return out


@pytest.mark.parametrize("chunk_size,stride", [(64, 48), (8, 8), (5, 2)])
def test_chunk_documents_matches_python(spark, chunk_size, stride):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in chunk_documents(df, chunk_size=chunk_size, stride=stride).collect()
    )
    assert got == py_chunks(DOCS, chunk_size, stride)


def test_chunk_documents_rejects_gappy_stride(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, stride=5)


@pytest.mark.parametrize("budget,n_buckets", [(2048, 64), (7, 3), (16, 1)])
def test_pack_token_stream_matches_python(spark, budget, n_buckets):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in pack_token_stream(df, budget=budget, n_buckets=n_buckets).collect())
    assert got == py_pack(DOCS, budget)


def test_pack_bucketed_prefix_equals_global_cumsum(spark):
    # sparse, shuffled ids: the range bucketing must still produce the
    # exact global-order cumsum (bucket boundaries monotone in id)
    docs = [(i * 37 % 1009, f"tok{i} " * (i % 11)) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(13)
    got = sorted(tuple(r) for r in pack_token_stream(df, budget=50, n_buckets=8).collect())
    assert got == py_pack(docs, 50)


def test_pack_empty_table(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = pack_token_stream(df)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "token_offset", "first_seq", "last_seq", "n_seqs"]


def test_chunk_documents_large_doc_no_blowup(spark):
    """A single 60k-token document (1250 chunks at stride 48) must chunk
    correctly — the shape where a per-chunk re-split of the words array
    (the CollapseProject trap pinned in test_plans) would go quadratic.
    Spot-check count plus first/boundary/last chunk digests against the
    Python replay instead of materializing all 1250 tuples twice."""
    n = 60_000
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_size=64, stride=48)
    rows = {r["chunk_idx"]: r for r in out.collect()}
    exp = {c[1]: c for c in py_chunks([(0, text)], 64, 48)}
    assert len(rows) == len(exp) == (n + 47) // 48
    for k in (0, 1, len(exp) - 2, len(exp) - 1):
        r = rows[k]
        assert (r["n_tokens"], r["chunk_md5"]) == (exp[k][2], exp[k][3])


def test_pack_token_stream_hub_bucket_skew(spark):
    """Every doc crowding into one range bucket (ids 0..199 with
    n_buckets=64 but a giant id forcing the span) must still produce the
    exact global cumsum — the skew shape where one bucket holds ~all rows."""
    docs = [(i, "w " * (i % 7)) for i in range(200)] + [(10_000_000, "tail doc")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in pack_token_stream(df, budget=64, n_buckets=64).collect())
    assert got == py_pack(docs, 64)
