"""Per-ring geometric aggregates: exact shoelace signed area and
centroid numerators over ordered integer vertex lists.

Reference ancestry: the polygon validity pass — ring orientation
(CW/CCW) is the shoelace SIGN (``BuildPolygonFromRelation.cs`` ring
winding fix-ups), and the admin "representative point" the validators
pin issues to (``plans/admin_validator.py:87``) is the centroid this
operator makes exact. For a training-data pipeline it's the per-tile /
per-region geometry rollup (how much area does this label cover, where
is its mass).

Exactness contract: vertices are INTEGER grid coordinates, so
``area2`` (twice the signed area), ``cx_num`` and ``cy_num`` (centroid
numerators; centroid = (cx_num / (3·area2), cy_num / (3·area2))) are
exact int64 sums — order-free, partition-free, engine-free. The
division is left to the CALLER because it is the only lossy step.

Overflow bound (int64): |term| ≤ 2·M · 2·M² per vertex for coords in
[0, M); with M = 2^16 and rings ≤ ~2^13 vertices the running sum stays
< 2^63. DuckDB raises on BIGINT overflow (the twin is the canary);
at planet scale pre-translate each ring to its local frame first.

Scale shape: ONE shuffle — the lead/first window partitions by ring,
and the following groupBy reuses that partitioning (no second
exchange); partial aggregation is map-side. A ring is the skew unit
(one task sorts one ring) — same contract as polygon assembly
(``operators/assembly.py``), where the reference's rings are ordered
the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ring_shoelace(vertices: DataFrame, ring: str = "ring_id",
                  seq: str = "seq", x: str = "x", y: str = "y") -> DataFrame:
    """``(ring_id, n_vertices, area2, cx_num, cy_num)`` per ring from
    ordered integer vertices (the ring closes last→first implicitly).

    area2 = Σ (x_i·y_{i+1} − x_{i+1}·y_i)  — positive ⇔ CCW;
    cx_num = Σ (x_i + x_{i+1})·cross_i, cy_num likewise (standard
    polygon-centroid numerators, exact integers).
    """
    w = Window.partitionBy(ring).orderBy(seq)
    w_full = (Window.partitionBy(ring).orderBy(seq)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    xi, yi = F.col(x).cast("long"), F.col(y).cast("long")
    # wrap-around: the lead of the last vertex is the FIRST vertex
    x2 = F.coalesce(F.lead(x).over(w), F.first(x).over(w_full)).cast("long")
    y2 = F.coalesce(F.lead(y).over(w), F.first(y).over(w_full)).cast("long")
    cross = xi * y2 - x2 * yi
    # group on the ORIGINAL ring column (no pre-agg alias): an alias
    # projection between the window and the groupBy makes
    # EnsureRequirements re-exchange on the new exprId (measured —
    # plan audit showed hashpartitioning(ring) twice); keyed this way
    # the final agg runs on the window's partitioning, ONE exchange.
    terms = vertices.select(
        F.col(ring),
        cross.alias("_cr"),
        ((xi + x2) * cross).alias("_cx"),
        ((yi + y2) * cross).alias("_cy"),
    )
    return (terms.groupBy(ring).agg(
        F.count("*").alias("n_vertices"),
        F.sum("_cr").alias("area2"),
        F.sum("_cx").alias("cx_num"),
        F.sum("_cy").alias("cy_num"))
        .withColumnRenamed(ring, "ring_id"))


def ring_shoelace_sql(vertices_sql: str, ring: str = "ring_id",
                      seq: str = "seq", x: str = "x", y: str = "y") -> str:
    """DuckDB twin: identical LEAD/FIRST_VALUE window + integer sums
    (CAST to BIGINT — DuckDB SUM(BIGINT) is HUGEINT)."""
    return f"""
WITH _rs_v AS (
  SELECT {ring} AS ring_id,
         CAST({x} AS BIGINT) AS xi, CAST({y} AS BIGINT) AS yi,
         CAST(COALESCE(
           LEAD({x}) OVER (PARTITION BY {ring} ORDER BY {seq}),
           FIRST_VALUE({x}) OVER (PARTITION BY {ring} ORDER BY {seq}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ) AS BIGINT) AS x2,
         CAST(COALESCE(
           LEAD({y}) OVER (PARTITION BY {ring} ORDER BY {seq}),
           FIRST_VALUE({y}) OVER (PARTITION BY {ring} ORDER BY {seq}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ) AS BIGINT) AS y2
  FROM ({vertices_sql})
)
SELECT ring_id,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(xi * y2 - x2 * yi) AS BIGINT) AS area2,
       CAST(SUM((xi + x2) * (xi * y2 - x2 * yi)) AS BIGINT) AS cx_num,
       CAST(SUM((yi + y2) * (xi * y2 - x2 * yi)) AS BIGINT) AS cy_num
FROM _rs_v
GROUP BY ring_id
""".strip()
