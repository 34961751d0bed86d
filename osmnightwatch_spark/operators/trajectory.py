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

from pyspark.sql import DataFrame, Window
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


def track_resample(points: DataFrame, step_s: int,
                   entity: str = "user_id", ts: str = "te",
                   lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Resample each entity's track onto the uniform time grid
    ``t = k·step_s`` by linear interpolation between bracketing fixes
    → ``(entity, tg, lon_g, lat_g)``.

    Reference ancestry: the minutely-replication clock — the reference
    normalizes an irregular edit stream onto a fixed cadence before
    diffing (``CatchupReplicationDiffEnumerator.cs:31-187``); this is
    the same normalization for GPS tracks, and the standard
    pre-alignment before co-location / OD / Hausdorff comparisons
    (uneven sampling rates otherwise dominate those measures).

    Domain (pinned, ADVICE r5): timestamps must be ``>= 0`` (epoch
    seconds). The grid-index ceiling ``(t + W - 1) div W`` relies on
    truncation-toward-zero matching floor for non-negative operands;
    for pre-1970 (negative) timestamps Spark's ``div`` and DuckDB's
    ``//`` would diverge. Shift epochs before resampling if needed.

    Semantics (pinned): fixes are deduplicated to one per
    ``(entity, ts)`` first (position ties share the row; the dedup is
    on the full tuple, so distinct positions at one ts are a caller
    error surfaced as duplicate grid rows by the twin); grid instants
    covered are the HALF-OPEN span ``t_min ≤ k·step_s < t_max`` of
    each entity (an entity with one fix or a span shorter than its
    first grid gap emits nothing). Interpolation is
    ``p0 + (p1 − p0) · ((tg − t0) / (t1 − t0))`` evaluated in exactly
    this order in both engines — identical IEEE doubles, hash-stable.

    Scale shape: two exchanges — the dedup hash (map-side combined,
    shrinks stationary tracks before any sort) and the entity window;
    the grid explode is per consecutive-fix PAIR, after the window,
    and output-proportional (≤ gap/step_s rows per pair) — no join.
    The skew unit is one entity's fix count, same contract as
    `track_hausdorff` above.
    """
    te = F.col(ts).cast("long")
    pts = points.select(F.col(entity).alias("_e"), te.alias("_t"),
                        F.col(lon).alias("_x"),
                        F.col(lat).alias("_y")).distinct()
    w = Window.partitionBy("_e").orderBy("_t")
    paired = pts.select(
        "_e", "_t", "_x", "_y",
        F.lead("_t").over(w).alias("_t2"),
        F.lead("_x").over(w).alias("_x2"),
        F.lead("_y").over(w).alias("_y2"),
    ).where(F.col("_t2").isNotNull())
    W_ = int(step_s)
    k_lo = F.expr(f"(_t + {W_ - 1}) div {W_}")
    k_hi = F.expr(f"(_t2 - 1) div {W_}")
    grid = (paired
            .withColumn("_klo", k_lo).withColumn("_khi", k_hi)
            .where(F.col("_klo") <= F.col("_khi"))
            .select("_e", "_t", "_x", "_y", "_t2", "_x2", "_y2",
                    F.explode(F.sequence("_klo", "_khi")).alias("_k")))
    tg = (F.col("_k") * F.lit(W_)).cast("long")
    frac = ((tg - F.col("_t")).cast("double")
            / (F.col("_t2") - F.col("_t")).cast("double"))
    return grid.select(
        F.col("_e").alias(entity),
        tg.alias("tg"),
        (F.col("_x") + (F.col("_x2") - F.col("_x")) * frac).alias("lon_g"),
        (F.col("_y") + (F.col("_y2") - F.col("_y")) * frac).alias("lat_g"),
    )


def track_resample_sql(points_sql: str, step_s: int,
                       entity: str = "user_id", ts: str = "te",
                       lon: str = "lon", lat: str = "lat") -> str:
    """DuckDB twin: identical dedup + LEAD window + integer grid
    bounds (`//` ≡ Spark `div` on the non-negative epochs used here)
    + the same interpolation expression order."""
    W_ = int(step_s)
    return f"""
WITH _tr_p AS (
  SELECT DISTINCT {entity} AS _e, CAST({ts} AS BIGINT) AS _t,
         {lon} AS _x, {lat} AS _y
  FROM ({points_sql})
),
_tr_pair AS (
  SELECT _e, _t, _x, _y,
         LEAD(_t) OVER w AS _t2,
         LEAD(_x) OVER w AS _x2,
         LEAD(_y) OVER w AS _y2
  FROM _tr_p
  WINDOW w AS (PARTITION BY _e ORDER BY _t)
),
_tr_grid AS (
  SELECT _e, _t, _x, _y, _t2, _x2, _y2,
         UNNEST(generate_series((_t + {W_ - 1}) // {W_},
                                (_t2 - 1) // {W_})) AS _k
  FROM _tr_pair
  WHERE _t2 IS NOT NULL
    AND (_t + {W_ - 1}) // {W_} <= (_t2 - 1) // {W_}
)
SELECT _e AS {entity},
       CAST(_k * {W_} AS BIGINT) AS tg,
       _x + (_x2 - _x) * (CAST(_k * {W_} - _t AS DOUBLE)
                          / CAST(_t2 - _t AS DOUBLE)) AS lon_g,
       _y + (_y2 - _y) * (CAST(_k * {W_} - _t AS DOUBLE)
                          / CAST(_t2 - _t AS DOUBLE)) AS lat_g
FROM _tr_grid
""".strip()
