"""Generator determinism + population coverage (SURVEY.md §5 engine plan)."""

from pyspark.sql import functions as F

from tag_spark.functions.hashing import frame_digest
from tag_spark.generate import generate_transcripts


def test_schema(transcripts):
    assert [f.name for f in transcripts.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    types = {f.name: f.dataType.simpleString() for f in transcripts.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"


def test_deterministic_across_runs_and_parallelism(spark):
    a = generate_transcripts(spark, n_convs=100, seed=7)
    b = generate_transcripts(spark, n_convs=100, seed=7).repartition(13)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert frame_digest(a, cols) == frame_digest(b, cols)


def test_seed_changes_data(spark):
    a = generate_transcripts(spark, n_convs=50, seed=1)
    b = generate_transcripts(spark, n_convs=50, seed=2)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert frame_digest(a, cols) != frame_digest(b, cols)


def test_populations_present(transcripts):
    df = transcripts
    # hot conversation exists (skew test input)
    top = df.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    assert top["conv_id"] == "conv-00000000"
    assert top["count"] >= 20
    # plants present
    assert df.filter(F.col("role") == "robot").count() > 0
    assert df.filter(F.col("tool") == "frobnicate").count() > 0
    assert df.filter(F.col("text").isNull()).count() > 0
    assert df.filter(F.col("turn_idx") < 0).count() > 0
    assert df.filter(F.year("ts") < 1970).count() > 0
    assert df.filter(F.length("text") > 16_384).count() > 0
    # encoding variants survive round-trip
    assert df.filter(F.col("text").contains("你好世界")).count() > 0
    assert df.filter(F.col("text").contains("\x00")).count() > 0


def test_no_plants_mode_is_clean(spark):
    df = generate_transcripts(spark, n_convs=100, seed=42, plants=False)
    assert df.filter(F.col("role") == "robot").count() == 0
    assert df.filter(F.col("text").isNull()).count() == 0
    # strictly contiguous turn_idx per conv
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = df.withColumn("prev", F.lag("turn_idx").over(w)).filter(
        (F.col("prev").isNotNull()) & (F.col("turn_idx") != F.col("prev") + 1)
    )
    assert bad.count() == 0
