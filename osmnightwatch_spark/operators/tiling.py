"""Tile assignment + per-tile aggregation (the "hypertable rollup").

The reference's analog is its per-country feature counting
(``AdminCountPerCountryAnalyzer.cs:222-260``) and the id→blob bucketing
of its scan index (``PbfParser/PbfIndexBuilder.cs:309-350``); here a
tile is a quadtree cell at a chosen resolution and assignment is the
*native* ``cell_col`` expression — pure whole-stage codegen, no Python,
no shuffle until the aggregation itself (which map-side combines).

Skew: city cells concentrate 20%+ of rows in 3 tiles. ``tile_counts``
is a plain count — Spark's partial aggregation absorbs that (each task
pre-aggregates its hot cell to one row). For heavy per-group payloads
(e.g. collect-style rollups) use ``salted_group_count`` which
demonstrates explicit two-phase salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C


def assign_tiles(points: DataFrame, res: int, lon: str = "lon",
                 lat: str = "lat", out: str = "tile") -> DataFrame:
    """Attach the tile (cell id at ``res``) — JVM-native expression."""
    return C.attach_cell(points, res, lon=lon, lat=lat, out=out)


def tile_counts(points: DataFrame, res: int, lon: str = "lon",
                lat: str = "lat") -> DataFrame:
    """images-per-tile rollup; partial agg makes skew a non-issue."""
    return (
        assign_tiles(points, res, lon, lat)
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("n_images"))
    )


def tile_rollup(tiles: DataFrame, steps: int = 1, tile: str = "tile",
                value: str = "n_images") -> DataFrame:
    """Roll a per-tile aggregate up the hierarchy — parent id is pure
    bit arithmetic (``parent_col``), so the rollup is a re-keyed agg
    with no re-encode of the raw data."""
    return (
        tiles.withColumn("parent_tile", C.parent_col(F.col(tile), steps))
        .groupBy("parent_tile")
        .agg(F.sum(value).alias(value))
    )


def salted_group_count(points: DataFrame, key: str, salt_buckets: int = 32,
                       value_alias: str = "n") -> DataFrame:
    """Explicit two-phase (salted) aggregation for skewed keys:
    groupBy(key, salt) partial → groupBy(key) final. Used when the
    aggregate state per group is heavy enough that a single reducer
    per hot key would bottleneck.

    The salt is a deterministic row hash (not ``rand``): task retries
    re-derive the same salt, so a recomputed partition lands in the
    same partial groups — same discipline as ``skew.salted_repartition``.
    """
    salted = points.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in points.columns]),
               F.lit(salt_buckets)).cast("int"),
    )
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_pn"))
    return partial.groupBy(key).agg(F.sum("_pn").alias(value_alias))
