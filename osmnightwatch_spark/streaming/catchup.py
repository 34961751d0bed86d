"""Replication catch-up laddering (S7 completion).

The reference's ``CatchupReplicationDiffEnumerator.cs:31-187`` walks a
consumer that has fallen far behind back to the head by switching diff
granularity: day diffs while ≥1 day behind, then hour diffs, then
minute diffs — so catching up a week costs ~7+24+60 reads, not ~10 000
minutely replays.

Spark recast over the snapshot catalog: changeset batches are
sequence-numbered parquet directories; a consolidation job
(:func:`consolidate_range`) precompacts aligned coarse blocks (the
analog of the published hour/day diffs — one last-writer-wins pass,
``cdc.compact_changeset``). :func:`ladder_plan` covers the pending
range ``(from_seq, to_seq]`` with the coarsest aligned blocks first;
:func:`catchup` reads each segment (consolidated file when present,
minute-batch union compacted on the fly otherwise), unions the
segments, compacts once more across segments, and applies ONE merge to
the snapshot — output provably equal to sequential application because
last-writer-wins by (version, op-rank) is associative over the
batches' union.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .cdc import apply_changeset, compact_changeset

DEFAULT_GRANULARITIES = (1440, 60, 1)  # day, hour, minute (in batch counts)


def minute_path(changes_dir: str, seq: int) -> str:
    return os.path.join(changes_dir, "minute", f"batch-{seq:08d}.parquet")


def block_path(changes_dir: str, start: int, g: int) -> str:
    return os.path.join(changes_dir, f"g{g}", f"batch-{start:08d}.parquet")


def ladder_plan(from_seq: int, to_seq: int,
                granularities: tuple[int, ...] = DEFAULT_GRANULARITIES
                ) -> list[tuple[int, int, int]]:
    """Segments (start, end, granularity) covering (from_seq, to_seq],
    coarsest aligned block first — mirrors the reference's day→hour→
    minute descent. Segment count is O(range/coarsest + Σ ratios), not
    O(range)."""
    gs = sorted(granularities, reverse=True)
    if gs[-1] != 1:
        raise ValueError("granularities must include 1 (the base batch)")
    segs = []
    s = from_seq + 1
    while s <= to_seq:
        for g in gs:
            if s % g == 0 and s + g - 1 <= to_seq:
                segs.append((s, s + g - 1, g))
                s += g
                break
    return segs


def read_minutes(spark: SparkSession, changes_dir: str,
                 start: int, end: int) -> DataFrame:
    """Union of base batches [start, end] (schema-stable parquet)."""
    paths = [minute_path(changes_dir, q) for q in range(start, end + 1)]
    return spark.read.parquet(*paths)


def consolidate_range(spark: SparkSession, changes_dir: str,
                      start: int, g: int) -> str:
    """Precompact the aligned block [start, start+g) into one coarse
    diff file — the publisher-side job that makes catch-up cheap
    (reference analog: the published hour/day .osc diffs)."""
    if start % g != 0:
        raise ValueError(f"block start {start} not aligned to granularity {g}")
    out = block_path(changes_dir, start, g)
    compacted = compact_changeset(
        read_minutes(spark, changes_dir, start, start + g - 1)
    )
    compacted.write.mode("overwrite").parquet(out)
    return out


def read_segment(spark: SparkSession, changes_dir: str,
                 start: int, end: int, g: int) -> DataFrame:
    """One ladder segment: the consolidated block when published,
    otherwise compact the base batches on the fly."""
    if g > 1:
        p = block_path(changes_dir, start, g)
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            return spark.read.parquet(p)
    return compact_changeset(read_minutes(spark, changes_dir, start, end))


def catchup(spark: SparkSession, snapshot: DataFrame, changes_dir: str,
            from_seq: int, to_seq: int,
            granularities: tuple[int, ...] = DEFAULT_GRANULARITIES,
            key: str = "id") -> tuple[DataFrame, list[tuple[int, int, int]]]:
    """Apply the pending range in ladder segments; returns the new
    snapshot and the plan that was used.

    All segments union into one cross-segment compaction and ONE merge
    against the snapshot — the snapshot-sized side is touched once no
    matter how far behind the consumer is."""
    segs = ladder_plan(from_seq, to_seq, granularities)
    if not segs:
        return snapshot, segs
    pending: DataFrame | None = None
    for start, end, g in segs:
        seg = read_segment(spark, changes_dir, start, end, g)
        pending = seg if pending is None else pending.unionByName(seg)
    merged = compact_changeset(pending)
    return apply_changeset(snapshot, merged, key=key), segs
