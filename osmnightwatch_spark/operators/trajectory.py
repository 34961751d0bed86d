"""Trajectory similarity: discrete Hausdorff distance between entity
tracks, per requested pair.

Reference ancestry: the coastline *change* comparison — "how far does
the edited geometry stray from the previous one" (the neighborhood
frame of ``BrokenCoastlineAnalyzer.cs:140-166`` made quantitative).
For a training-data pipeline it's the trajectory near-dup measure:
two users uploading the same GPS trace (or one user double-logging)
have Hausdorff distance ≈ 0 long before their point sets are equal.

Metric: planar Euclidean degrees (the range-join/kNN default). The
directed distance h(A→B) = max over a∈A of min over b∈B; the
symmetric Hausdorff is max(h(A→B), h(B→A)). Computed on SQUARED
distances, one sqrt at the end — min/max over exact doubles are
order-free, so the result is bit-stable across partitionings and
engines (the oracle compares the identical float sequence).

Scale shape: pairs are EXPLICIT (an upstream candidate generator —
cell-signature buckets, co-location, or a user list — bounds the pair
set; all-pairs Hausdorff at corpus scale is never the plan). Each
side's track joins to its pairs by entity (two broadcast-able joins
when the pair list is small; hash joins otherwise), then ONE
groupBy(pair) Arrow kernel computes the distance matrix per pair —
numpy, not a HOF fold (Spark doesn't codegen lambda folds; the
semdedup lesson). The skew unit is a single giant track: n_a·n_b
doubles per pair — cap track length upstream (`dp_simplify` or
`snap_simplify` are the standard pre-reductions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def track_hausdorff(points: DataFrame, pairs: DataFrame,
                    entity: str = "user_id",
                    lon: str = "lon", lat: str = "lat",
                    a: str = "a", b: str = "b") -> DataFrame:
    """Hausdorff distance per requested pair →
    ``(a, b, n_a, n_b, h_ab, h_ba, hausdorff)`` (degrees; pairs whose
    entities have no fixes are absent — inner semantics)."""
    import numpy as np
    import pandas as pd

    pts = points.select(F.col(entity).alias("_e"),
                        F.col(lon).alias("_x"), F.col(lat).alias("_y"))
    tagged = (
        pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .join(pts, F.col("a") == F.col("_e"))
        .select("a", "b", F.lit(0).alias("_side"), "_x", "_y")
        .unionByName(
            pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
            .join(pts, F.col("b") == F.col("_e"))
            .select("a", "b", F.lit(1).alias("_side"), "_x", "_y"))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        av = pdf[pdf["_side"] == 0]
        bv = pdf[pdf["_side"] == 1]
        if len(av) == 0 or len(bv) == 0:
            return pd.DataFrame(columns=["a", "b", "n_a", "n_b",
                                         "h_ab", "h_ba", "hausdorff"])
        ax = av["_x"].to_numpy(np.float64); ay = av["_y"].to_numpy(np.float64)
        bx = bv["_x"].to_numpy(np.float64); by = bv["_y"].to_numpy(np.float64)
        dx = ax[:, None] - bx[None, :]
        dy = ay[:, None] - by[None, :]
        d2 = dx * dx + dy * dy
        h_ab2 = d2.min(axis=1).max()
        h_ba2 = d2.min(axis=0).max()
        import math
        return pd.DataFrame({
            "a": [int(pdf["a"].iloc[0])], "b": [int(pdf["b"].iloc[0])],
            "n_a": [len(av)], "n_b": [len(bv)],
            "h_ab": [math.sqrt(h_ab2)], "h_ba": [math.sqrt(h_ba2)],
            "hausdorff": [math.sqrt(max(h_ab2, h_ba2))],
        })

    return tagged.groupBy("a", "b").applyInPandas(
        kernel, "a long, b long, n_a long, n_b long, "
                "h_ab double, h_ba double, hausdorff double")


def track_hausdorff_sql(points_sql: str, pairs_sql: str,
                        entity: str = "user_id",
                        lon: str = "lon", lat: str = "lat",
                        a: str = "a", b: str = "b") -> str:
    """DuckDB twin: the same max-of-min over the same squared-distance
    doubles via joins + two-level aggregation, sqrt at the end. CTE
    names are _hd_-prefixed so caller table names cannot collide."""
    d2 = (f"((ap._x - bp._x) * (ap._x - bp._x) "
          f"+ (ap._y - bp._y) * (ap._y - bp._y))")
    return f"""
WITH _hd_pr AS (SELECT {a} AS a, {b} AS b FROM ({pairs_sql})),
_hd_pt AS (SELECT {entity} AS _e, {lon} AS _x, {lat} AS _y,
              row_number() OVER () AS _rid
       FROM ({points_sql})),
_hd_ap AS (SELECT pr.a, pr.b, pt._x, pt._y, pt._rid
       FROM _hd_pr pr JOIN _hd_pt pt ON pt._e = pr.a),
_hd_bp AS (SELECT pr.a, pr.b, pt._x, pt._y, pt._rid
       FROM _hd_pr pr JOIN _hd_pt pt ON pt._e = pr.b),
_hd_mins_ab AS (
  SELECT ap.a, ap.b, ap._rid, MIN({d2}) AS m
  FROM _hd_ap ap JOIN _hd_bp bp ON bp.a = ap.a AND bp.b = ap.b
  GROUP BY 1, 2, 3),
_hd_mins_ba AS (
  SELECT bp.a, bp.b, bp._rid, MIN({d2}) AS m
  FROM _hd_bp bp JOIN _hd_ap ap ON ap.a = bp.a AND ap.b = bp.b
  GROUP BY 1, 2, 3),
_hd_na AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_a FROM _hd_ap ap GROUP BY 1, 2),
_hd_nb AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_b FROM _hd_bp bp GROUP BY 1, 2),
_hd_h1 AS (SELECT a, b, MAX(m) AS h2 FROM _hd_mins_ab GROUP BY 1, 2),
_hd_h2 AS (SELECT a, b, MAX(m) AS h2 FROM _hd_mins_ba GROUP BY 1, 2)
SELECT h1.a, h1.b, na.n_a, nb.n_b,
       sqrt(h1.h2) AS h_ab, sqrt(h2.h2) AS h_ba,
       sqrt(GREATEST(h1.h2, h2.h2)) AS hausdorff
FROM _hd_h1 h1 JOIN _hd_h2 h2 USING (a, b) JOIN _hd_na na USING (a, b) JOIN _hd_nb nb USING (a, b)
""".strip()
