"""Per-entity convex hull vertices (minimal set) over integer points.

Reference ancestry: the admin-polygon sanity pass — the reference
derives a representative frame per admin area to position issues and
compare boundary changes (``BuildPolygonFromRelation.cs`` +
``plans/admin_validator.py:87``); the convex hull is the canonical
such frame (extent, orientation-free outline) and the standard
footprint reduction before expensive polygon work (clip / overlay /
coverage pre-filters). For an image corpus it summarizes a user's or
label's geographic footprint in O(hull) rows instead of O(fixes).

Semantics (pinned, engine-independent):
* input points are deduplicated per entity first;
* output = the MINIMAL hull vertex set — a point collinear on the
  interior of a hull edge is NOT a vertex;
* degenerate entities: all-collinear → the two extreme points;
  a single distinct point → NO rows (no supporting edge exists —
  matches the edge-characterization twin's vacuous-∀-over-pairs).

Integer coords keep every cross/dot product exact (int64), so the
vertex SET is bit-stable across engines and partitionings.

Scale shape: distinct (one hash shuffle, map-side combine) then ONE
groupBy(entity) Arrow kernel — the monotone chain is O(n log n) per
entity on numpy arrays. The skew unit is one entity's distinct-point
count; the standard pre-reduction is `sampling.geo_balanced_sample`
or a coarse `cells.attach_cell` snap, both upstream. No joins, no
broadcast, output ≤ input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chain(xs, ys):
    """Monotone chain with STRICT turns (pop on cross ≤ 0) → minimal
    hull vertex list, CCW from the lexicographic minimum. Expects
    deduplicated points; returns [] for n == 1."""
    import numpy as np

    n = len(xs)
    if n < 2:
        return []
    order = np.lexsort((ys, xs))
    px, py = xs[order], ys[order]

    def half(rng):
        out = []
        for i in rng:
            while len(out) >= 2:
                ax, ay = out[-2]
                bx, by = out[-1]
                if (bx - ax) * (py[i] - ay) - (by - ay) * (px[i] - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append((int(px[i]), int(py[i])))
        return out

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    return lower[:-1] + upper[:-1]


def convex_hull(points: DataFrame, entity: str = "entity",
                x: str = "x", y: str = "y") -> DataFrame:
    """``(entity, hx, hy)`` — one row per minimal hull vertex.

    The entity column passes through with its input dtype (the output
    schema is derived from ``points.schema`` — ADVICE r5: it was
    hardcoded ``long``, so string entity keys failed at runtime)."""
    import pandas as pd

    entity_type = points.schema[entity].dataType.simpleString()
    pts = points.select(F.col(entity).alias("entity"),
                        F.col(x).cast("long").alias("_x"),
                        F.col(y).cast("long").alias("_y")).distinct()

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        hull = _chain(pdf["_x"].to_numpy(np.int64),
                      pdf["_y"].to_numpy(np.int64))
        if not hull:
            return pd.DataFrame(columns=["entity", "hx", "hy"])
        e = pdf["entity"].iloc[0]
        return pd.DataFrame({"entity": [e] * len(hull),
                             "hx": [h[0] for h in hull],
                             "hy": [h[1] for h in hull]})

    return pts.groupBy("entity").applyInPandas(
        kernel, f"entity {entity_type}, hx long, hy long")


def convex_hull_sql(points_sql: str, entity: str = "entity",
                    x: str = "x", y: str = "y") -> str:
    """DuckDB twin via the supporting-edge characterization: a directed
    pair (a,b) is a hull edge iff every other point q is strictly left
    of a→b OR collinear strictly between a and b; hull vertices are
    the distinct endpoints of such edges. O(n³) per entity — an
    independent formulation, never the scale path."""
    cross = ("(b.x - a.x) * (q.y - a.y) - (b.y - a.y) * (q.x - a.x)")
    dot = ("(q.x - a.x) * (b.x - a.x) + (q.y - a.y) * (b.y - a.y)")
    d2 = ("(b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)")
    return f"""
WITH _ch_p AS (
  SELECT DISTINCT {entity} AS e, CAST({x} AS BIGINT) AS x,
         CAST({y} AS BIGINT) AS y
  FROM ({points_sql})
),
_ch_edges AS (
  SELECT a.e, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM _ch_p a JOIN _ch_p b
    ON b.e = a.e AND (b.x <> a.x OR b.y <> a.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM _ch_p q
    WHERE q.e = a.e
      AND (q.x <> a.x OR q.y <> a.y) AND (q.x <> b.x OR q.y <> b.y)
      AND NOT ({cross} > 0
               OR ({cross} = 0 AND {dot} > 0 AND {dot} < {d2}))
  )
)
SELECT DISTINCT e AS entity, hx, hy FROM (
  SELECT e, ax AS hx, ay AS hy FROM _ch_edges
  UNION ALL
  SELECT e, bx AS hx, by AS hy FROM _ch_edges
)
""".strip()
