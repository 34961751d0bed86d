"""Custom stateful streaming operator — first-seen tracking as true
per-key stream state (``applyInPandasWithState``).

The reference carries ``FirstTimeSeen`` per issue across runs by
diffing against the previous issue list (``IssuesData.cs:56-90``,
recast batch-side in ``operators/issues.carry_first_seen``). In a
long-running stream that lookup is per-key *state*, not a join: this
module keeps the first-seen timestamp in Spark's state store, so a
restarted query resumes it from the checkpoint — the streaming twin
of the catalog's LKG watermark.

Shape notes for 10^12-key scale: state is partitioned by the grouping
key (one shuffle per micro-batch, same as any keyed agg); the kernel
touches only keys present in the batch; state per key is one
timestamp. RocksDB state store (config) keeps it off-heap.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("n_in_batch", T.LongType(), False),
    T.StructField("first_seen", T.StringType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("first_seen", T.StringType(), False),
])


def _first_seen_fn(key, pdf_iter, state):
    n = 0
    min_ts = None
    for pdf in pdf_iter:
        n += len(pdf)
        if len(pdf):
            m = str(pdf["ts"].min())
            min_ts = m if min_ts is None or m < min_ts else min_ts
    if state.exists:
        (first_seen,) = state.get
    else:
        first_seen = min_ts
        state.update((first_seen,))
    yield pd.DataFrame({
        "key": [key[0]], "n_in_batch": [n], "first_seen": [first_seen],
    })


def first_seen_stream(keyed: DataFrame, key: str = "key") -> DataFrame:
    """keyed stream (key STRING, ts STRING-castable) → per-batch rows
    (key, n_in_batch, first_seen) where first_seen is the timestamp of
    the key's FIRST appearance across the whole stream lifetime —
    stable across restarts via the state-store checkpoint."""
    from pyspark.sql import functions as F

    prepared = keyed.select(
        F.col(key).alias("key"), F.col("ts").cast("string").alias("ts")
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
