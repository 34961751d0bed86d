"""Coastline validators — connectivity, orientation, crossing.

Recasts ``Analyzers/BrokenCoastline`` (reference):

* endpoint-degree connectivity (``CoastlineValidationTest.cs:16-116``):
  the global first/last-node graph check becomes a union + groupBy
  aggregation — "Unconnected node" for endpoints whose in/out degrees
  don't cancel, "Way with wrong direction" for duplicated directed
  endpoint pairs;
* per-way geometry checks (``BrokenCoastlineAnalyzer.cs:174-217``):
  < 2 nodes, self-intersection (IsSimple), closed-island CW
  orientation ("island should be counterclockwise") — one vectorized
  grouped kernel over the vertices column;
* coastline × coastline crossing (``BrokenCoastlineAnalyzer.cs:79-108``,
  the STRtree self-join): cell-bucketed candidate self-join (explode
  each way's covering cells at a resolution, equi-join, ``a.id <
  b.id``), exact segment-crossing refine in a grouped pandas kernel —
  "Crosses with {id}" both ways, like the reference flags both rows.

Input table (FIXTURES.md §4): coastline_ways(way_id LONG, first_node
LONG, last_node LONG, vertices ARRAY<STRUCT<lon DOUBLE, lat DOUBLE>>).
Issue rows: (issue_type, osm_type='W', osm_id, details).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells as C
from ..functions import geometry as G

ISSUE_SCHEMA = T.StructType([
    T.StructField("issue_type", T.StringType(), False),
    T.StructField("osm_type", T.StringType(), False),
    T.StructField("osm_id", T.LongType(), False),
    T.StructField("details", T.StringType(), True),
])


def _issues(df: DataFrame, issue_type: str, id_col: str, details) -> DataFrame:
    return df.select(
        F.lit(issue_type).alias("issue_type"),
        F.lit("W").alias("osm_type"),
        F.col(id_col).cast("long").alias("osm_id"),
        details.alias("details"),
    )


def endpoint_degree_issues(ways: DataFrame) -> DataFrame:
    """'Unconnected node': a node that starts n ways must end n ways.

    Closed rings (first == last) are self-connected and excluded.
    Global aggregation — the reference's two hash maps
    (CoastlineValidationTest.cs:16-70) become one groupBy(sum).
    """
    open_ways = ways.where(F.col("first_node") != F.col("last_node"))
    firsts = open_ways.select(F.col("first_node").alias("node_id"), F.lit(1).alias("d"),
                              F.col("way_id"))
    lasts = open_ways.select(F.col("last_node").alias("node_id"), F.lit(-1).alias("d"),
                             F.col("way_id"))
    deg = (
        firsts.unionByName(lasts)
        .groupBy("node_id")
        .agg(F.sum("d").alias("degree"), F.sort_array(F.collect_set("way_id")).alias("ways"))
        .where(F.col("degree") != 0)
    )
    return _issues(
        deg, "UnconnectedCoastline", "node_id",
        F.concat(F.lit("Unconnected node, ways: "),
                 F.array_join(F.transform("ways", lambda w: w.cast("string")), ", ")),
    ).withColumn("osm_type", F.lit("N"))


def wrong_direction_issues(ways: DataFrame) -> DataFrame:
    """'Way with wrong direction': two ways sharing the same directed
    (first, last) endpoints reversed — i.e. way A (u→v) and way B
    (v→u) — mirrors CoastlineValidationTest.cs:72-94."""
    a = ways.select(F.col("way_id").alias("id_a"), "first_node", "last_node")
    b = ways.select(
        F.col("way_id").alias("id_b"),
        F.col("first_node").alias("b_first"),
        F.col("last_node").alias("b_last"),
    )
    pairs = a.join(
        b,
        (F.col("first_node") == F.col("b_last"))
        & (F.col("last_node") == F.col("b_first"))
        & (F.col("id_a") < F.col("id_b")),
    )
    both = pairs.select(F.col("id_a").alias("way_id"), F.col("id_b").alias("other")) \
        .unionByName(pairs.select(F.col("id_b").alias("way_id"), F.col("id_a").alias("other")))
    return _issues(
        both, "WrongDirection", "way_id",
        F.concat(F.lit("Way with wrong direction, pair: "), F.col("other").cast("string")),
    )


def _perway_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for row in pdf.itertuples():
        coords = np.array([[c["lon"], c["lat"]] for c in row.vertices], dtype=np.float64)
        if len(coords) < 2:
            out.append(("ShortWay", "W", row.way_id, "Way with less than 2 nodes"))
            continue
        if G.polyline_self_intersects(coords):
            out.append(("SelfIntersection", "W", row.way_id, "Way intersects itself"))
        closed = row.first_node == row.last_node and len(coords) >= 4
        if closed and not G.ring_is_ccw(coords):
            out.append(("WrongOrientation", "W", row.way_id,
                        "island should be counterclockwise"))
    return pd.DataFrame(out, columns=["issue_type", "osm_type", "osm_id", "details"])


def per_way_geometry_issues(ways: DataFrame) -> DataFrame:
    """Vectorized per-way checks (grouped by a partition-bucket key so
    each kernel call sees a batch, not one row)."""
    bucketed = ways.withColumn("_b", F.crc32(F.col("way_id").cast("string")) % 64)
    return bucketed.groupBy("_b").applyInPandas(
        lambda pdf: _perway_kernel(pdf), ISSUE_SCHEMA
    )


@F.pandas_udf(T.ArrayType(T.LongType()))
def _bbox_cells(vertices: pd.Series, res: pd.Series) -> pd.Series:
    """Covering cells of each way's bbox at the given resolution."""
    out = []
    for verts, r in zip(vertices, res):
        arr = np.array([[c["lon"], c["lat"]] for c in verts], dtype=np.float64)
        if len(arr) == 0:
            out.append([])
            continue
        r = int(r)
        x0, y0 = C.grid_xy(arr[:, 0].min(), arr[:, 1].min(), r)
        x1, y1 = C.grid_xy(arr[:, 0].max(), arr[:, 1].max(), r)
        xs = np.arange(int(x0), int(x1) + 1)
        ys = np.arange(int(y0), int(y1) + 1)
        gx, gy = np.meshgrid(xs, ys)
        out.append(C.cell_from_xy(gx.ravel(), gy.ravel(), r).tolist())
    return pd.Series(out)


def _cross_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    lines = {
        int(r.way_id): np.array([[c["lon"], c["lat"]] for c in r.vertices])
        for r in pdf.drop_duplicates("way_id").itertuples()
    }
    seen = set()
    for r in pdf.itertuples():
        a, b = int(r.way_id), int(r.other_id)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        if G.segments_cross(lines[a], np.array([[c["lon"], c["lat"]] for c in r.other_vertices])):
            out.append(("CrossingCoastline", "W", a, f"Crosses with {b}"))
            out.append(("CrossingCoastline", "W", b, f"Crosses with {a}"))
    return pd.DataFrame(out, columns=["issue_type", "osm_type", "osm_id", "details"])


def crossing_issues(ways: DataFrame, res: int = 6) -> DataFrame:
    """Cell-bucketed spatial self-join (J5): candidate pairs share a
    bbox-covering cell; exact refine per pair. Both ways flagged."""
    cells = ways.withColumn(
        "cell", F.explode(_bbox_cells(F.col("vertices"), F.lit(res)))
    ).select("way_id", "vertices", "cell")
    a = cells
    b = cells.select(
        F.col("way_id").alias("other_id"),
        F.col("vertices").alias("other_vertices"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("way_id") < F.col("other_id"))
        .dropDuplicates(["way_id", "other_id"])
    )
    return pairs.groupBy(
        (F.crc32(F.col("way_id").cast("string")) % 64).alias("_b")
    ).applyInPandas(lambda pdf: _cross_kernel(pdf), ISSUE_SCHEMA)


def crossing_issues_incremental(ways: DataFrame, changed_ids: DataFrame,
                                res: int = 6) -> DataFrame:
    """J6 — the neighborhood join restricted to changed geometries
    (``BrokenCoastlineAnalyzer.cs:140-166``): only pairs where at
    least one side changed are re-checked; unchanged×unchanged pairs
    keep their previous verdicts (carried by the caller's issue
    merge)."""
    cells = ways.withColumn(
        "cell", F.explode(_bbox_cells(F.col("vertices"), F.lit(res)))
    ).select("way_id", "vertices", "cell")
    changed_cells = cells.join(
        changed_ids.withColumnRenamed("id", "way_id"), "way_id", "left_semi"
    )
    b = cells.select(
        F.col("way_id").alias("other_id"),
        F.col("vertices").alias("other_vertices"),
        "cell",
    )
    pairs = (
        changed_cells.join(b, "cell")
        .where(F.col("way_id") != F.col("other_id"))
        .withColumn("lo", F.least("way_id", "other_id"))
        .withColumn("hi", F.greatest("way_id", "other_id"))
        .dropDuplicates(["lo", "hi"])
        .drop("lo", "hi")
    )
    return pairs.groupBy(
        (F.crc32(F.col("way_id").cast("string")) % 64).alias("_b")
    ).applyInPandas(lambda pdf: _cross_kernel(pdf), ISSUE_SCHEMA)


def all_coastline_issues(ways: DataFrame) -> DataFrame:
    return (
        endpoint_degree_issues(ways)
        .unionByName(wrong_direction_issues(ways))
        .unionByName(per_way_geometry_issues(ways))
        .unionByName(crossing_issues(ways))
    )
