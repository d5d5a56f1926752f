"""Text-analysis operators: token counts, lang-id, quality, fingerprints."""

from pyspark.sql import functions as F

from tag_spark.operators.text import (
    lang_id,
    md5_fingerprint,
    profile_documents,
    quality_score,
    rolling_hash_64,
    token_count,
)


def _df(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_token_count(spark):
    df = _df(spark, ["a b c", "  a   b  ", "", None, "one"])
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 2, 0, None, 1]


def test_lang_id(spark):
    df = _df(
        spark,
        [
            "the cat and the dog of the house",
            "der Hund und die Katze und der Vogel",
            "el perro y los gatos que corren el parque",
            "le chat et les chiens est le animal",
            "这是一个中文句子",
            "xyzzy qwerty 12345",
        ],
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == ["en", "de", "es", "fr", "zh", "und"]


def test_quality_score_bounds(spark, transcripts):
    q = transcripts.select(quality_score("text").alias("q"))
    mn, mx = q.agg(F.min("q"), F.max("q")).first()
    assert 0.0 <= mn <= mx <= 1.0


def test_md5_fingerprint_normalizes(spark):
    df = _df(spark, ["Hello,   World!", "hello world", "different text"])
    got = [r[0] for r in df.select(md5_fingerprint("text")).collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_rolling_hash_matches_python(spark):
    df = _df(spark, ["abc", "", None, "a slightly longer text 你好"])
    got = [r[0] for r in df.select(rolling_hash_64("text")).collect()]

    def ph(t):
        acc = 0
        for byte in t.encode("utf-8"):
            acc = (acc * 257 + byte) % (1 << 64)
        return acc - (1 << 64) if acc >= (1 << 63) else acc

    assert got[0] == ph("abc")
    assert got[1] == 0
    assert got[2] == 0  # null → 0 sentinel
    assert got[3] == ph("a slightly longer text 你好")


def test_profile_documents_runs_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = profile_documents(docs)
    row = prof.first()
    assert row["n_tokens"] > 0
    assert 0 <= row["quality"] <= 1
    assert len(row["fingerprint"]) == 32
