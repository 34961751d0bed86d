"""Structured Streaming layer — the minutely-replication loop recast.

The reference's steady state (``Program.cs:75-117``) is: poll for new
diffs → merge → apply → analyze → publish → commit. In Spark terms
that is a file-source stream with ``Trigger.AvailableNow`` +
``foreachBatch``: each micro-batch runs the (batch) operator DAG and
commits atomically to a snapshot table — the checkpoint directory
plays the role of the reference's LMDB transaction watermark
(``KeyValueDatabase.cs:83-115``): a killed job resumes from the last
committed batch without reprocessing.

``windowed_tile_counts`` adds the event-time path the reference lacks
(SURVEY.md §2.9 ST8 marks windows out of scope there): watermarked
tumbling-window per-tile counts over geotagged events, demonstrating
late-data folding for the image-ingest stream at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C
from ..sources.catalog import Table


def read_events_stream(spark: SparkSession, input_dir: str, schema) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .load(input_dir)
    )


def windowed_tile_counts(events: DataFrame, res: int = 4,
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per tile over the derived
    geotag (same arithmetic as plans/queries events geotag)."""
    mlon = (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)
    mlat = (F.col("event_id") * F.lit(2246822519) + F.lit(1234567)) % F.lit(4294967296)
    geo = events.withColumn(
        "lon", F.lit(-180.0) + mlon.cast("double") / F.lit(4294967296.0) * F.lit(360.0)
    ).withColumn(
        "lat", F.lit(-85.0) + mlat.cast("double") / F.lit(4294967296.0) * F.lit(170.0)
    )
    tiled = C.attach_cell(geo, res, out="tile").withColumn(
        "ts", F.col("ts").cast("timestamp")  # NTZ → event-time-capable type
    )
    return (
        tiled.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "tile")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "tile", "n")
    )


def stream_to_snapshot_table(agg: DataFrame, table_root: str,
                             checkpoint_dir: str,
                             keys: tuple[str, ...] = ("win_start", "tile"),
                             cluster_by: str | None = None,
                             n_files: int = 32):
    """foreachBatch → keyed MERGE into a catalog Table per micro-batch
    (the exactly-once publish-then-commit of Program.cs:97-116: the
    stream checkpoint records the batch only after the commit
    succeeds). Update-mode re-emissions of a window upsert by key.

    ``cluster_by`` (e.g. the tile column) keeps every committed
    snapshot Z-order clustered so manifest pruning stays effective as
    the stream runs — the steady-state form of the sort-order write;
    costs one range shuffle per micro-batch, so leave it off for
    high-frequency tiny batches and let a periodic
    ``compact(cluster_by=...)`` restore layout instead (plain
    ``compact`` only coalesces — it cannot re-sort)."""
    table = Table(table_root)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # distinguish "table empty" from "concurrent expire removed
        # the manifest between the pointer read and the open" — the
        # latter must retry, never fall through to merged=batch_df
        # (which would publish a snapshot containing ONLY this batch,
        # silently truncating the table)
        import time as _time

        for _ in range(50):
            if table.current_snapshot() is None:
                merged = batch_df
                break
            try:
                current = table.read(spark)
            except FileNotFoundError:
                _time.sleep(0.02)  # expire raced the read; re-resolve
                continue
            survivors = current.join(
                batch_df.select(*keys).distinct(), list(keys), "left_anti"
            )
            merged = survivors.unionByName(batch_df)
            break
        else:
            raise RuntimeError(
                f"stream sink could not resolve a readable snapshot in "
                f"{table_root} (concurrent expiry churn)")
        table.commit(merged, lineage={"stage": "stream", "batch_id": batch_id},
                     cluster_by=cluster_by, n_files=n_files)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def dedup_stream(docs: DataFrame, id_col: str = "doc_id",
                 text: str = "text", ts: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup for an ingest pipeline: drop any document
    whose md5 fingerprint was already seen, across micro-batches, via
    ``dropDuplicatesWithinWatermark`` — the state store holds one row
    per fingerprint and the watermark bounds state size (a fingerprint
    older than the watermark can be evicted; a late duplicate beyond
    it would pass, which is the standard state/recall trade at
    10^12-doc scale — widen the watermark to widen the guarantee).

    The batch twin is ``operators/dedup.exact_dedup``; this is the
    same semantics as ingest-time state.
    """
    fp = docs.withColumn("_fp", F.md5(F.col(text))).withColumn(
        ts, F.col(ts).cast("timestamp")
    )
    return (
        fp.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
