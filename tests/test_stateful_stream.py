"""applyInPandasWithState first-seen tracking: state survives across
micro-batches AND across query restarts (checkpoint resume)."""

import os

import pandas as pd

from osmnightwatch_spark.streaming.stateful import first_seen_stream

SCHEMA = "key string, ts string"


def _write_batch(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(d)


def _run_available(spark, src, chk, out_rows):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        first_seen_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _bid: out_rows.extend(df.collect()))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_first_seen_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src, exist_ok=True)

    _write_batch(spark, src, [("a", "2026-01-01"), ("b", "2026-01-02")])
    out1: list = []
    _run_available(spark, src, chk, out1)
    got1 = {r.key: r.first_seen for r in out1}
    assert got1 == {"a": "2026-01-01", "b": "2026-01-02"}

    # second run (fresh query object = restart): 'a' reappears later,
    # 'c' is new — a keeps its original first_seen from the state store
    _write_batch(spark, src, [("a", "2026-02-09"), ("c", "2026-02-10")])
    out2: list = []
    _run_available(spark, src, chk, out2)
    got2 = {r.key: r.first_seen for r in out2}
    assert got2["a"] == "2026-01-01"   # resumed from checkpointed state
    assert got2["c"] == "2026-02-10"
    counts = {r.key: r.n_in_batch for r in out2}
    assert counts == {"a": 1, "c": 1}  # only batch-2 rows reprocessed
