"""Salted two-phase window checks must equal the unsalted suite exactly."""

from pyspark.sql import functions as F

from tag_spark.functions.hashing import frame_digest
from tag_spark.generate import dim_role, dim_tool, generate_transcripts
from tag_spark.operators.ordering import CHECKS, conv_size_histogram, salted_order_violations
from tag_spark.operators.suite import default_transcript_suite

VIOL_COLS = ["check_id", "severity", "conv_id", "turn_idx", "column", "reason", "text_sha1", "bucket_id"]


def _unsalted(spark, df):
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    return suite.violations(df).filter(F.col("check_id").isin(*CHECKS))


def test_salted_equals_unsalted(spark, transcripts):
    base = _unsalted(spark, transcripts)
    for block_size in (4, 16, 1000):  # tiny blocks force many carries
        salted = salted_order_violations(transcripts, block_size=block_size)
        assert frame_digest(salted, VIOL_COLS) == frame_digest(base, VIOL_COLS), f"block_size={block_size}"


def test_salted_on_hot_conversation(spark):
    # one conversation dominating the table: salted mode bounds task size
    df = generate_transcripts(spark, n_convs=50, seed=11)
    base = _unsalted(spark, df)
    salted = salted_order_violations(df, block_size=8)
    assert frame_digest(salted, VIOL_COLS) == frame_digest(base, VIOL_COLS)


def test_gap_spanning_entire_block(spark):
    # gap larger than block_size: the carry must come from the nearest
    # NON-EMPTY earlier block, not block-1
    rows = [("c", 0), ("c", 1), ("c", 50), ("c", 51)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int").select(
        "conv_id", "turn_idx", F.lit("u").alias("role"), F.lit("x").alias("text"), F.lit(None).cast("string").alias("tool"), F.current_timestamp().alias("ts")
    )
    got = salted_order_violations(df, block_size=8).filter(F.col("check_id") == "turn_contiguous").collect()
    assert len(got) == 1
    assert got[0]["turn_idx"] == 50
    assert "sequence gap: 1 -> 50" in got[0]["reason"]


def test_conv_size_histogram(spark, transcripts):
    h = conv_size_histogram(transcripts)
    rows = h.collect()
    assert sum(r["n_convs"] for r in rows) == transcripts.select("conv_id").distinct().count()


def test_auto_salt_mode_selection(spark, tmp_path, capsys):
    """run_validation auto-selects the salted path when the largest
    conversation exceeds the threshold, logs which mode ran, and the
    violations output is byte-identical to the standard window mode."""
    import run_validation
    from tag_spark.functions.hashing import frame_digest

    src = str(tmp_path / "src")
    generate_transcripts(spark, n_convs=600, seed=7).write.parquet(src)

    out_std = str(tmp_path / "out_std")
    out_auto = str(tmp_path / "out_auto")
    # threshold far above the hot conversation -> standard mode
    assert run_validation.main(
        ["--input", src, "--output", out_std, "--salt-auto-threshold", "1000000"], spark=spark
    ) == 0
    assert "standard window mode" in capsys.readouterr().out
    # threshold below the hot conversation (~1% of all turns) -> salted mode
    assert run_validation.main(
        ["--input", src, "--output", out_auto, "--salt-auto-threshold", "16"], spark=spark
    ) == 0
    assert "salted two-phase mode auto-selected" in capsys.readouterr().out

    cols = ["check_id", "severity", "conv_id", "turn_idx", "column", "reason", "text_sha1"]
    v_std = spark.read.parquet(f"{out_std}/violations")
    v_auto = spark.read.parquet(f"{out_auto}/violations")
    assert frame_digest(v_auto, cols) == frame_digest(v_std, cols)
