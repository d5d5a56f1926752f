"""applyInPandasWithState session tracker: state must carry across
micro-batches (the OGG continued-packet-buffer analog, ogg.go:104-131)."""

import datetime

from tag_spark.schema import TRANSCRIPT_SCHEMA
from tag_spark.streaming.stateful import session_tracker

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _rows(spark, rows):
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    out = session_tracker(stream)
    # memory sink can't recover from a checkpoint; foreachBatch + parquet can
    q = (
        out.writeStream.foreachBatch(lambda df, _epoch: df.write.mode("append").parquet(out_dir))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in sorted(rows, key=lambda r: r["n_turns"]):  # last update wins
        latest[r["conv_id"]] = r
    return latest


def test_state_carries_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def ts(s):
        return TS + datetime.timedelta(seconds=s)

    # batch 1: turns 0,1 in order
    _rows(spark, [("c1", 0, "user", "a", None, ts(0)), ("c1", 1, "assistant", "b", None, ts(60))]).write.mode(
        "append"
    ).parquet(src)
    got1 = _run(spark, src, ckpt, str(tmp_path / "out"))
    assert got1["c1"]["n_turns"] == 2
    assert got1["c1"]["max_idx"] == 1
    assert got1["c1"]["n_gaps"] == 0

    # batch 2: turn 5 (gap of 3 vs carried max_idx=1) and a ts regression
    _rows(spark, [("c1", 5, "user", "c", None, ts(30))]).write.mode("append").parquet(src)
    got2 = _run(spark, src, ckpt, str(tmp_path / "out"))
    assert got2["c1"]["n_turns"] == 3  # carried count, not just this batch
    assert got2["c1"]["max_idx"] == 5
    assert got2["c1"]["n_gaps"] == 1  # detected ACROSS the batch boundary
    assert got2["c1"]["n_regressions"] == 1  # ts(30) < carried last_ts(60)


def test_multiple_conversations_isolated_state(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _rows(
        spark,
        [
            ("a", 0, "user", "x", None, TS),
            ("a", 1, "user", "y", None, TS),
            ("b", 0, "user", "z", None, TS),
            ("b", 3, "user", "w", None, TS),  # gap within batch
        ],
    ).write.mode("append").parquet(src)
    got = _run(spark, src, ckpt, str(tmp_path / "out"))
    assert got["a"]["n_gaps"] == 0
    assert got["b"]["n_gaps"] == 1
    assert got["a"]["n_turns"] == 2 and got["b"]["n_turns"] == 2
