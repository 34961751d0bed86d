"""Point-cloud spatial statistics: IDW surface interpolation and
per-entity great-circle path length.

Reference ancestry: the per-admin scalar-aggregate family
(``AdminCountPerCountryAnalyzer.cs`` — statistics rolled up over
spatially-joined points). These are the two statistics a geo-corpus
pipeline layers on top: a *surface estimate* at probe locations
(inverse-distance-weighted field value — the classic
raster-from-point-cloud step) and a *trajectory length* per entity
(ordered great-circle hop sum).

Determinism design shared by both: each contribution is quantized to
an exact integer (``floor(term · 1e6)`` weights / ``floor(metres ·
1e3)`` hops) BEFORE aggregation, so every SUM is exact integer
arithmetic — order-free across partitions, engines, and runs. The
per-row term itself is a deterministic double written in the
identical operation sequence on both engines (the kNN-haversine-twin
discipline). Distributed float SUMs are NOT order-stable;
quantize-then-sum is what makes these oracle-hashable without
tolerances.

Scale shape: IDW rides the range join (one cell-keyed equi-shuffle,
radius-exact ring covering, payload pass-through — no rejoin) plus
one groupBy on the probe id; a probe's group is its own neighbor
list, bounded by density × radius², so there is no hot key. Path
length is one hash shuffle on the entity id + an ordered window per
entity; a pathological entity (one user owning a large corpus slice)
is the only skew and is capped upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .knn import _dist_haversine, haversine_sql
from .range_join import range_join, range_join_sql

WQ = 1_000_000.0   # IDW weight quantization grain (millionths)
MM = 1_000.0       # path-hop quantization grain (millimetres)


def idw_surface(probes: DataFrame, points: DataFrame, radius: float,
                probe_id: str = "probe_id", point_id: str = "point_id",
                value: str = "value") -> DataFrame:
    """Power-2 inverse-distance-weighted estimate of ``value`` at each
    probe from the points within ``radius`` planar degrees →
    ``(probe_id, n_nbrs, w_den, wv_num, est)``.

    Inputs carry ``(id, lon, lat)`` (+ ``value`` on ``points``).
    ``w = 1/dist²`` per neighbor, ``dist`` being the range join's
    output distance so both engines square the identical double.
    Zero-distance neighbors (a point exactly at a probe — e.g. the
    probe itself in a self-interpolation) are excluded: the documented
    convention (exact assignment is one coalesce away from the same
    join). Probes with no in-radius neighbor are absent (inner
    semantics — the emitted row set is the informative one).

    ``wv_num = Σ floor(v/dist²·1e6)``, ``w_den = Σ floor(1/dist²·1e6)``
    are exact bigints; ``est = wv_num / w_den``.
    """
    pairs = range_join(
        probes, points, radius, left_id=probe_id, right_id=point_id,
        right_extra=(value,),
    ).where(F.col("dist") > 0)
    d2 = F.col("dist") * F.col("dist")
    wq = F.floor(F.lit(WQ) / d2)
    wvq = F.floor(F.lit(WQ) * F.col(value).cast("double") / d2)
    return (
        pairs.groupBy(probe_id)
        .agg(F.count("*").alias("n_nbrs"),
             F.sum(wq).alias("w_den"),
             F.sum(wvq).alias("wv_num"))
        .select(probe_id, "n_nbrs", "w_den", "wv_num",
                (F.col("wv_num").cast("double") / F.col("w_den").cast("double")
                 ).alias("est"))
    )


def idw_surface_sql(probes_sql: str, points_sql: str, radius: float,
                    probe_id: str = "probe_id", point_id: str = "point_id",
                    value: str = "value") -> str:
    """DuckDB twin: brute range join, identical floor-quantized terms."""
    rj = range_join_sql(probes_sql, points_sql, radius,
                        left_id=probe_id, right_id=point_id,
                        right_extra=(value,))
    return (
        f"SELECT {probe_id}, COUNT(*) AS n_nbrs, "
        f"SUM(CAST(FLOOR({WQ!r} / (dist * dist)) AS BIGINT)) AS w_den, "
        f"SUM(CAST(FLOOR({WQ!r} * CAST({value} AS DOUBLE) / (dist * dist)) "
        f"AS BIGINT)) AS wv_num, "
        f"CAST(SUM(CAST(FLOOR({WQ!r} * CAST({value} AS DOUBLE) / (dist * dist)) "
        f"AS BIGINT)) AS DOUBLE) / "
        f"CAST(SUM(CAST(FLOOR({WQ!r} / (dist * dist)) AS BIGINT)) AS DOUBLE) "
        f"AS est "
        f"FROM ({rj}) WHERE dist > 0 GROUP BY {probe_id}"
    )


def path_length(points: DataFrame, entity: str = "user_id",
                ts: str = "ts", tiebreak: str = "event_id",
                lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Total great-circle trajectory length per entity →
    ``(entity, n_points, path_mm)`` — hops ordered by ``(ts,
    tiebreak)`` (the tiebreak pins simultaneous fixes), each hop
    quantized to exact integer millimetres before the sum.

    Single-point entities emit ``path_mm = 0`` (zero hops — SUM over
    an empty set coalesces to 0, both engines).
    """
    w = Window.partitionBy(entity).orderBy(ts, tiebreak)
    hops = points.select(
        F.col(entity), F.col(ts), F.col(tiebreak),
        F.col(lon).alias("_lon"), F.col(lat).alias("_lat"),
        F.lag(lon).over(w).alias("_plon"),
        F.lag(lat).over(w).alias("_plat"),
    )
    # The NULL first-row lag must be guarded EXPLICITLY: both engines'
    # LEAST/least skip NULLs, so sqrt(NULL) inside least(1.0, ...)
    # silently becomes 1.0 and every entity would gain a phantom
    # half-circumference hop (asin(1) = pi/2) — consistently on both
    # engines, i.e. invisible to the oracle, caught by the hand test.
    hop_mm = F.when(
        F.col("_plon").isNotNull(),
        F.floor(_dist_haversine(F.col("_plon"), F.col("_plat"),
                                F.col("_lon"), F.col("_lat")) * F.lit(MM)))
    return (
        hops.groupBy(entity)
        .agg(F.count("*").alias("n_points"),
             F.coalesce(F.sum(hop_mm), F.lit(0)).alias("path_mm"))
    )


def path_length_sql(points_sql: str, entity: str = "user_id",
                    ts: str = "ts", tiebreak: str = "event_id",
                    lon: str = "lon", lat: str = "lat") -> str:
    """DuckDB twin: identical lag window and floor-quantized hops."""
    hav = haversine_sql("_plon", "_plat", lon, lat)
    return (
        f"WITH hops AS (SELECT {entity}, {lon}, {lat}, "
        f"lag({lon}) OVER (PARTITION BY {entity} "
        f"ORDER BY {ts}, {tiebreak}) AS _plon, "
        f"lag({lat}) OVER (PARTITION BY {entity} "
        f"ORDER BY {ts}, {tiebreak}) AS _plat "
        f"FROM ({points_sql})) "
        f"SELECT {entity}, COUNT(*) AS n_points, "
        f"COALESCE(SUM(CASE WHEN _plon IS NULL THEN NULL ELSE "
        f"CAST(FLOOR({hav} * {MM!r}) AS BIGINT) END), 0) AS path_mm "
        f"FROM hops GROUP BY {entity}"
    )


def stay_points(points: DataFrame, res: int = 6, gap_s: int = 3600,
                min_stay_s: int = 1800, entity: str = "user_id",
                ts: str = "ts", tiebreak: str = "event_id",
                lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Stay-point detection (Li et al. 2008, cell-quantized variant):
    consecutive fixes of an entity in the SAME grid cell with
    inter-fix gaps ≤ ``gap_s`` form a visit; visits lasting ≥
    ``min_stay_s`` are stay points → ``(entity, cell, enter_ts,
    exit_ts, n_events)``.

    The classic algorithm is a sequential two-pointer scan; quantizing
    "same place" to a grid cell turns it into a pure window pipeline —
    ``lag`` flags visit starts (cell change OR gap), a running SUM of
    flags numbers the visits, one groupBy aggregates them. Both
    engines share every step exactly (integer epoch-second gaps,
    (ts, tiebreak) ordering), so the output is oracle-hashable.

    Scale shape: one hash shuffle on the entity + ordered windows
    within it, then a groupBy on (entity, visit) — the same skew unit
    as :func:`path_length` (one hot entity), capped upstream.
    """
    from ..functions import cells as C

    w = Window.partitionBy(entity).orderBy(ts, tiebreak)
    cells = points.select(
        F.col(entity), F.col(ts), F.col(tiebreak),
        C.cell_col(F.col(lon), F.col(lat), res).alias("_cell"),
        F.unix_timestamp(F.col(ts)).alias("_t"),
    )
    flagged = cells.select(
        entity, ts, "_cell", "_t",
        F.when(
            F.lag("_cell").over(w).isNull()
            | (F.lag("_cell").over(w) != F.col("_cell"))
            | (F.col("_t") - F.lag("_t").over(w) > gap_s),
            F.lit(1)).otherwise(F.lit(0)).alias("_new"),
        F.col(tiebreak),
    )
    wv = Window.partitionBy(entity).orderBy(ts, tiebreak)
    visits = flagged.withColumn(
        "_visit", F.sum("_new").over(
            wv.rowsBetween(Window.unboundedPreceding, 0)))
    agg = (
        visits.groupBy(entity, "_visit")
        .agg(F.first("_cell").alias("cell"),
             F.min(ts).alias("enter_ts"), F.max(ts).alias("exit_ts"),
             F.min("_t").alias("_t0"), F.max("_t").alias("_t1"),
             F.count(F.lit(1)).alias("n_events"))
        .where(F.col("_t1") - F.col("_t0") >= min_stay_s)
    )
    return agg.select(entity, "cell", "enter_ts", "exit_ts", "n_events")


def stay_points_sql(points_sql: str, res: int = 6, gap_s: int = 3600,
                    min_stay_s: int = 1800, entity: str = "user_id",
                    ts: str = "ts", tiebreak: str = "event_id",
                    lon: str = "lon", lat: str = "lat") -> str:
    """DuckDB twin of :func:`stay_points` (same cell encode, same
    epoch-second gaps, same visit numbering)."""
    from ..functions import cells as C

    cell = C.cell_sql(lon, lat, res)
    return f"""
WITH c AS (
  SELECT {entity}, {ts}, {tiebreak}, {cell} AS _cell,
         CAST(FLOOR(epoch({ts})) AS BIGINT) AS _t
  FROM ({points_sql})),
f AS (
  SELECT *, CASE WHEN lag(_cell) OVER w IS NULL
                   OR lag(_cell) OVER w <> _cell
                   OR _t - lag(_t) OVER w > {int(gap_s)}
            THEN 1 ELSE 0 END AS _new
  FROM c WINDOW w AS (PARTITION BY {entity} ORDER BY {ts}, {tiebreak})),
v AS (
  SELECT *, SUM(_new) OVER (PARTITION BY {entity} ORDER BY {ts}, {tiebreak}
                            ROWS UNBOUNDED PRECEDING) AS _visit
  FROM f)
SELECT {entity}, MIN(_cell) AS cell, MIN({ts}) AS enter_ts,
       MAX({ts}) AS exit_ts, CAST(COUNT(*) AS BIGINT) AS n_events
FROM v GROUP BY {entity}, _visit
HAVING MAX(_t) - MIN(_t) >= {int(min_stay_s)}
""".strip()


def od_matrix(points: DataFrame, res: int = 6, gap_s: int = 3600,
              min_stay_s: int = 1800, entity: str = "user_id",
              ts: str = "ts", tiebreak: str = "event_id",
              lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Origin-destination flow matrix: consecutive stay points of an
    entity define a trip; trips aggregate to ``(origin_cell,
    dest_cell, n_trips, n_entities)`` — the standard mobility rollup
    on top of :func:`stay_points` (origin = earlier visit's cell,
    ordered by visit enter time; same-cell "trips" are excluded — a
    re-detected dwell is not a move).

    Scale shape: stay_points' entity windows + one lag over each
    entity's (few) visits + a groupBy on the (origin, dest) pair. The
    OD pair space is bounded by occupied-cell² but realized flows are
    sparse; partial aggregation absorbs commuter-corridor hot pairs.
    """
    sp = stay_points(points, res, gap_s, min_stay_s, entity, ts,
                     tiebreak, lon, lat)
    w = Window.partitionBy(entity).orderBy("enter_ts")
    trips = (
        sp.select(entity, "cell", "enter_ts")
        .withColumn("_prev", F.lag("cell").over(w))
        .where(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("cell")))
    )
    return (
        trips.groupBy(F.col("_prev").alias("origin_cell"),
                      F.col("cell").alias("dest_cell"))
        .agg(F.count(F.lit(1)).alias("n_trips"),
             F.countDistinct(entity).alias("n_entities"))
    )


def od_matrix_sql(points_sql: str, res: int = 6, gap_s: int = 3600,
                  min_stay_s: int = 1800, entity: str = "user_id",
                  ts: str = "ts", tiebreak: str = "event_id",
                  lon: str = "lon", lat: str = "lat") -> str:
    """DuckDB twin of :func:`od_matrix` (stay_points twin as the CTE,
    same lag-over-enter_ts trip derivation)."""
    sp = stay_points_sql(points_sql, res, gap_s, min_stay_s, entity,
                         ts, tiebreak, lon, lat)
    return f"""
WITH sp AS ({sp}),
t AS (
  SELECT {entity}, cell,
         lag(cell) OVER (PARTITION BY {entity} ORDER BY enter_ts) AS _prev
  FROM sp)
SELECT _prev AS origin_cell, cell AS dest_cell,
       CAST(COUNT(*) AS BIGINT) AS n_trips,
       CAST(COUNT(DISTINCT {entity}) AS BIGINT) AS n_entities
FROM t WHERE _prev IS NOT NULL AND _prev <> cell
GROUP BY 1, 2
""".strip()
