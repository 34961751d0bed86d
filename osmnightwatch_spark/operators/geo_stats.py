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
