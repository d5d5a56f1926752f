"""Custom stateful streaming operator: incremental per-conversation
ordering state via ``applyInPandasWithState``.

The closest reference analogs are the OGG demuxer's per-serial continued-
packet buffers (ogg.go:104-131, state keyed by serial number) and the
unsynchroniser's carried bit (id3v2.go:402-424): bounded per-key state
carried across reads. Here each conversation carries
(max_turn_idx, last_ts_epoch, n_turns, n_gaps, n_regressions) across
micro-batches, so ordering violations are detected incrementally without
re-scanning history — the streaming counterpart of the batch engine's
window checks.

State is a few longs per conversation; within a micro-batch the rows are
sorted vectorized in pandas. Rows arriving across batches out of order are
counted as regressions relative to carried state (late data is an ordering
violation by definition here — the batch engine is the exactness path)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_idx", T.LongType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("n_regressions", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("max_idx", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("n_regressions", T.LongType()),
    ]
)


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        max_idx, last_ts, n_turns, n_gaps, n_regr = state.get
    else:
        max_idx, last_ts, n_turns, n_gaps, n_regr = -1, float("-inf"), 0, 0, 0

    for pdf in pdfs:
        pdf = pdf.sort_values(["turn_idx", "ts_epoch"])  # vectorized in-batch ordering
        # nullable longs arrive as float64 NaN through Arrow — NULL turn_idx
        # / ts rows are counted but excluded from ordering state (the batch
        # suite flags them as NotNull violations). All state math is numpy:
        # the running max BEFORE each element is a prefix maximum seeded with
        # the carried state (NaN -> -inf so it never wins the accumulate),
        # gaps/regressions are mask sums — no per-row Python (input_hint).
        idx = pdf["turn_idx"].to_numpy(dtype="float64", na_value=np.nan)
        ts = pdf["ts_epoch"].to_numpy(dtype="float64", na_value=np.nan)
        n_turns += len(pdf)
        iv = np.where(np.isnan(idx), -np.inf, idx)
        prev_max = np.maximum.accumulate(np.concatenate(([float(max_idx)], iv)))[:-1]
        n_gaps += int(np.count_nonzero(idx > prev_max + 1))  # NaN compares False
        if iv.size and np.isfinite(iv.max()):
            max_idx = max(max_idx, int(iv.max()))
        tv = np.where(np.isnan(ts), -np.inf, ts)
        prev_ts = np.maximum.accumulate(np.concatenate(([last_ts], tv)))[:-1]
        n_regr += int(np.count_nonzero(ts < prev_ts))
        if tv.size:
            last_ts = max(last_ts, float(tv.max()))

    state.update((int(max_idx), float(last_ts), int(n_turns), int(n_gaps), int(n_regr)))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_turns": n_turns,
                "max_idx": max_idx,
                "n_gaps": n_gaps,
                "n_regressions": n_regr,
            }
        ]
    )


def session_tracker(stream: DataFrame) -> DataFrame:
    """Per-conversation running ordering stats over a transcript stream."""
    prepared = stream.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("ts").cast("double").alias("ts_epoch"),  # epoch seconds; Arrow-safe
    )
    return prepared.groupBy("conv_id").applyInPandasWithState(
        _track,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
