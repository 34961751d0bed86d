"""Point-in-polygon containment join — the engine's core spatial operator.

Recasts the reference's filter-and-refine containment join
(``AdminCountPerCountryAnalyzer.cs:615-679``: SpatiaLite R-tree
``search_frame`` candidate pass at :645-648, prepared-geometry
``Intersects``→``Contains``∨``Overlaps`` refinement at :664-674) as a
Spark-native two-phase plan:

1. **Prepare** (driver, once per polygon set — the PreparedPolygon
   analog, :486,637): each polygon → quadtree cell covering with cells
   classified FULL (entirely inside) or BOUNDARY (edge passes through)
   — ``functions.geometry.cover_polygon``.
2. **Candidate pass** (the R-tree analog): points get a cell id via the
   *native* ``cell_col`` expression (whole-stage codegen, no Python),
   then equi-join the covering table on ``cell``. Catalyst picks the
   physical join; for dim-sized polygon sets we force ``broadcast`` so
   the 10^12-row point side is never shuffled.
3. **Refine**: points that hit a FULL cell are inside by construction —
   zero per-point geometry work. Only BOUNDARY-cell hits run the exact
   ray-cast, vectorized in an Arrow-batched pandas UDF against a
   broadcast of the packed polygon edge arrays.

Scale notes (100 TB / 10^12 rows):
* the point side is touched by exactly one narrow projection + one
  map-side join — no shuffle, no Python, unless refinement is needed;
* refinement volume is proportional to the polygon *perimeter* measured
  in cells, not to the point count: finer covering resolution trades a
  bigger broadcast for less Python refine work (``cover_res`` knob,
  ``max_cells`` caps the broadcast);
* hot cells (cities) don't skew this join: broadcast join has no
  shuffle; for the ``shuffle`` strategy AQE skew-join splitting applies.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells as C
from ..functions import geometry as G

FULL = int(G.FULL)
BOUNDARY = int(G.BOUNDARY)


#: memo for :meth:`PreparedPolygons.build` keyed on (res, max_cells,
#: polygon tuple) — see the docstring there
_BUILD_CACHE: dict = {}


@dataclass
class PreparedPolygons:
    """Driver-side prepared polygon set: covering table + packed edges."""

    covering: pd.DataFrame          # polygon_id LONG, cell LONG, kind TINYINT
    edges: dict[int, tuple]         # polygon_id -> (x1, y1, x2, y2) float64 arrays
    res: int                        # leaf (finest) covering resolution
    min_res: int                    # coarsest resolution present in the covering

    @classmethod
    def build(cls, polygons: list[tuple[int, bytes]], res: int = 7,
              max_cells: int = 4096) -> "PreparedPolygons":
        """polygons: [(polygon_id, wkb_polygon_or_multipolygon), ...].

        Memoized on the full input (polygon set is immutable): the
        quadtree covering recursion is driver-side work a caller that
        re-plans the same join (every bench run; any interactive
        session) would otherwise pay per call — measured ~0.6 s per
        flagship run at the 236-polygon fixture (guide §5: keep data
        work off the driver). The cache also carries the per-session
        covering-DataFrame/refine-UDF memos across calls.
        """
        key = (res, max_cells,
               tuple((int(p), bytes(w)) for p, w in polygons))
        hit = _BUILD_CACHE.get(key)
        if hit is not None:
            return hit
        cov_pid, cov_cell, cov_kind = [], [], []
        edges: dict[int, tuple] = {}
        for pid, wkb in polygons:
            polys = G.wkb_to_polygons(wkb)
            ids, kinds = G.cover_polygon(polys, res=res, max_cells=max_cells)
            cov_pid.append(np.full(len(ids), pid, dtype=np.int64))
            cov_cell.append(ids)
            cov_kind.append(kinds)
            soup = G.EdgeSoup(polys)
            edges[int(pid)] = (soup.x1, soup.y1, soup.x2, soup.y2)
        covering = pd.DataFrame({
            "polygon_id": np.concatenate(cov_pid) if cov_pid else np.empty(0, np.int64),
            "cell": np.concatenate(cov_cell) if cov_cell else np.empty(0, np.int64),
            "kind": np.concatenate(cov_kind) if cov_kind else np.empty(0, np.int8),
        })
        min_res = int((covering["cell"].to_numpy() >> 58).min()) if len(covering) else res
        out = cls(covering=covering, edges=edges, res=res, min_res=min_res)
        if len(_BUILD_CACHE) >= 16:  # bounded: a handful of live sets
            _BUILD_CACHE.clear()
        _BUILD_CACHE[key] = out
        return out

    @classmethod
    def build_distributed(cls, spark: SparkSession,
                          polygons: list[tuple[int, bytes]], res: int = 7,
                          max_cells: int = 4096) -> "PreparedPolygons":
        """:meth:`build` with the covering computation fanned out over
        executors.

        The per-polygon quadtree recursion (``cover_polygon``) is the
        expensive half of prepare — minutes of driver time for real
        country polygons with 10^6 vertices — and embarrassingly
        parallel, so it runs as ``mapInPandas`` over a (polygon_id,
        wkb) DataFrame; only the (polygon_id, cell, kind) covering
        table is collected back. The packed edge arrays are parsed
        driver-side (one linear vectorized WKB scan; they must live on
        the driver anyway to become the refine UDF's broadcast).
        Reference analog: the prepared-geometry cache,
        ``AdminCountPerCountryAnalyzer.cs:470-490``.
        """
        if not polygons:
            return cls.build([], res=res, max_cells=max_cells)
        src = spark.createDataFrame(
            pd.DataFrame({
                "polygon_id": [int(p) for p, _ in polygons],
                "geom_wkb": [bytes(w) for _, w in polygons],
            })
        ).repartition(min(len(polygons), spark.sparkContext.defaultParallelism))

        def gen(batches):
            for b in batches:
                for pid, wkb in zip(b["polygon_id"], b["geom_wkb"]):
                    polys = G.wkb_to_polygons(bytes(wkb))
                    ids, kinds = G.cover_polygon(polys, res=res,
                                                 max_cells=max_cells)
                    yield pd.DataFrame({
                        "polygon_id": np.full(len(ids), int(pid), np.int64),
                        "cell": ids,
                        "kind": kinds.astype(np.int32),
                    })

        covering = (
            src.mapInPandas(gen, "polygon_id long, cell long, kind int")
            .toPandas()
        )
        covering["kind"] = covering["kind"].astype(np.int8)
        edges = {}
        for pid, wkb in polygons:
            soup = G.EdgeSoup(G.wkb_to_polygons(wkb))
            edges[int(pid)] = (soup.x1, soup.y1, soup.x2, soup.y2)
        min_res = (int((covering["cell"].to_numpy() >> 58).min())
                   if len(covering) else res)
        return cls(covering=covering, edges=edges, res=res, min_res=min_res)

    def covering_df(self, spark: SparkSession) -> DataFrame:
        # Memoized per session: the covering is immutable and repeated
        # pip_join calls (flagship, coverage, every bench run) were
        # paying the pandas→Arrow→JVM conversion of the same table on
        # every plan build (driver-side, measured ~0.1 s of the per-run
        # planning gap — guide §5 "the driver should do almost no data
        # work"). The returned DataFrame is a LocalRelation, so reuse
        # also lets Catalyst skip re-shipping the rows.
        cache = getattr(self, "_cov_df_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_cov_df_cache", cache)
        # applicationId in the key: build() memoization makes prepared
        # sets outlive sessions, and a recycled id() alone could alias
        # a dead session's DataFrame
        key = (id(spark), spark.sparkContext.applicationId)
        if key not in cache:
            schema = T.StructType([
                T.StructField("polygon_id", T.LongType(), False),
                T.StructField("cell", T.LongType(), False),
                T.StructField("kind", T.IntegerType(), False),
            ])
            pdf = self.covering.copy()
            pdf["kind"] = pdf["kind"].astype("int32")
            cache[key] = spark.createDataFrame(pdf, schema=schema)
        return cache[key]

    def refine_udf(self, spark: SparkSession):
        """Memoized per session: the refine UDF wraps a broadcast of
        the packed edge table — re-broadcasting the same immutable
        arrays on every pip_join call is pure per-plan overhead."""
        cache = getattr(self, "_refine_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_refine_cache", cache)
        key = (id(spark), spark.sparkContext.applicationId)
        if key not in cache:
            cache[key] = _refine_udf(spark, self.edges)
        return cache[key]


def _pack_edge_table(edges: dict[int, tuple]):
    """Flatten the per-polygon edge dict into one set of contiguous
    arrays (driver-side, once per prepared set): sorted pid keys, per-
    pid (offset, count) into concatenated edge arrays, plus the
    derived quantities the ray cast needs (``inv_dy``, per-edge
    bboxes) precomputed once instead of per batch per polygon."""
    keys = np.array(sorted(edges.keys()), dtype=np.int64)
    xs1, ys1, xs2, ys2 = [], [], [], []
    counts = np.zeros(len(keys), dtype=np.int64)
    for i, p in enumerate(keys.tolist()):
        x1, y1, x2, y2 = edges[p]
        counts[i] = len(x1)
        xs1.append(np.asarray(x1, dtype=np.float64))
        ys1.append(np.asarray(y1, dtype=np.float64))
        xs2.append(np.asarray(x2, dtype=np.float64))
        ys2.append(np.asarray(y2, dtype=np.float64))
    cat = (lambda a: np.concatenate(a) if a else np.empty(0, np.float64))
    x1, y1 = cat(xs1), cat(ys1)
    x2, y2 = cat(xs2), cat(ys2)
    offs = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64)
    dy = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_dy = np.where(dy != 0, 1.0 / np.where(dy == 0, 1.0, dy), 0.0)
    return {
        "keys": keys, "offs": offs, "counts": counts,
        "x1": x1, "y1": y1, "x2": x2, "y2": y2, "inv_dy": inv_dy,
        "minx": np.minimum(x1, x2), "maxx": np.maximum(x1, x2),
        "miny": np.minimum(y1, y2), "maxy": np.maximum(y1, y2),
    }


# pair-space chunk for the vectorized ray cast: bounds the transient
# (pairs × ~8 float64 temp arrays) to ~256 MB per concurrent batch
_PAIR_CHUNK = 4_000_000


def _refine_udf(spark: SparkSession, edges: dict[int, tuple]):
    """pandas UDF (lon, lat, polygon_id) -> bool, vectorized ray cast.

    The packed edge arrays ride a Spark broadcast variable — one copy
    per executor, not per task closure. The kernel evaluates ALL
    (point, edge-of-its-polygon) pairs of a batch in one vectorized
    pass: the previous per-polygon Python loop paid ~16 small numpy
    calls per polygon present in the batch (~200 polygons × 48 tasks
    at bench scale — measured 0.7 s of pip_join's 1.2 s, ~31 µs/row
    for 23k boundary rows; guide §4.2 "hand whole batches to
    vectorized native libraries"). Arithmetic per pair is unchanged
    (same expressions as ``points_in_edgesoup``, crossing counts are
    integer parity), so results are bit-identical.
    """
    bc = spark.sparkContext.broadcast(_pack_edge_table(edges))

    @F.pandas_udf(T.BooleanType())
    def inside(lon: pd.Series, lat: pd.Series, pid: pd.Series) -> pd.Series:
        n = len(lon)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        t = bc.value
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        pid_v = pid.to_numpy(dtype=np.int64)
        slot = np.searchsorted(t["keys"], pid_v)
        if (slot >= len(t["keys"])).any() or \
                not np.array_equal(t["keys"][np.minimum(
                    slot, len(t["keys"]) - 1)], pid_v):
            raise KeyError("polygon_id not in prepared edge table")
        # group rows by polygon so each row's edge range is contiguous
        order = np.argsort(slot, kind="stable")
        X = lon_v[order]
        Y = lat_v[order]
        cnt = t["counts"][slot[order]]
        off = t["offs"][slot[order]]
        total = int(cnt.sum())
        if total == 0:
            return pd.Series(out)
        # pair space: row i contributes cnt[i] consecutive pairs whose
        # edge indices are off[i] .. off[i]+cnt[i]-1 (grouped arange)
        start = np.concatenate([[0], np.cumsum(cnt[:-1])]).astype(np.int64)
        pair_row = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        pair_edge = (np.arange(total, dtype=np.int64)
                     - np.repeat(start, cnt) + np.repeat(off, cnt))
        crossings = np.zeros(len(cnt), dtype=np.int64)
        on_edge = np.zeros(len(cnt), dtype=bool)
        for s in range(0, total, _PAIR_CHUNK):
            pr = pair_row[s:s + _PAIR_CHUNK]
            pe = pair_edge[s:s + _PAIR_CHUNK]
            Xp, Yp = X[pr], Y[pr]
            x1, y1 = t["x1"][pe], t["y1"][pe]
            x2, y2 = t["x2"][pe], t["y2"][pe]
            straddle = ((y1 <= Yp) & (Yp < y2)) | ((y2 <= Yp) & (Yp < y1))
            xi = x1 + (Yp - y1) * (x2 - x1) * t["inv_dy"][pe]
            crossings += np.bincount(pr[straddle & (xi > Xp)],
                                     minlength=len(cnt))
            cross = (x2 - x1) * (Yp - y1) - (y2 - y1) * (Xp - x1)
            oe = ((np.abs(cross) <= 1e-12)
                  & (Xp >= t["minx"][pe]) & (Xp <= t["maxx"][pe])
                  & (Yp >= t["miny"][pe]) & (Yp <= t["maxy"][pe]))
            on_edge |= np.bincount(pr[oe], minlength=len(cnt)) > 0
        res = np.where(on_edge, True, (crossings & 1).astype(bool))
        out[order] = res
        return pd.Series(out)

    return inside


def pip_join(points: DataFrame, prepared: PreparedPolygons,
             lon: str = "lon", lat: str = "lat",
             strategy: str = "auto", broadcast_limit: int = 2_000_000,
             single_pass: bool = False) -> DataFrame:
    """points ⋈ polygons containment join.

    Returns ``points`` columns + ``polygon_id`` (inner-join semantics:
    one output row per (point, containing polygon); points in no
    polygon drop out). Boundary points count as inside (reference
    Contains ∨ Overlaps, ``AdminCountPerCountryAnalyzer.cs:515-518``).

    ``single_pass`` picks which resource the plan spends twice:

    * False (default): FULL hits and BOUNDARY hits are separate
      branches unioned — the Python ray-cast runs **only** on boundary
      rows, but the upstream (scan + join) is evaluated once per
      branch. Right when the input is a cheap columnar scan (Python is
      the scarce resource; rescanning pruned parquet is nearly free).
    * True: one pass with an OR-filter — the upstream is scanned once,
      but the refine UDF is evaluated on every joined row (wasted
      ray-casts on FULL hits). Right when the upstream is expensive
      and not re-computable (then prefer materializing upstream — see
      ``images_ops.verified_flagship`` — or use this flag).
    """
    spark = points.sparkSession
    cov = prepared.covering_df(spark)
    if strategy == "auto":
        strategy = "broadcast" if len(prepared.covering) <= broadcast_limit else "shuffle"

    # The quadtree covering holds cells at mixed resolutions (coarse FULL
    # interiors, fine BOUNDARY rims) and its cells are disjoint per
    # polygon, so a point matches at most one covering cell per polygon.
    # Join the point's whole ancestor chain [min_res..res] — a native
    # array of parent_col shifts, exploded (~res-min_res+1 narrow rows,
    # no Python, no shuffle under the broadcast strategy).
    pts_leaf = C.attach_cell(points, prepared.res, lon=lon, lat=lat,
                             out="_leaf")

    def with_chain(base: DataFrame, levels: list[int]) -> DataFrame:
        """Attach ``_cell`` for exactly the given covering levels — an
        ancestor level with no covering cells can never match, so each
        branch explodes only the levels its covering actually holds
        (guide §3: don't multiply the join input for nothing; for the
        typical uncapped covering the BOUNDARY rim lives only at the
        leaf res, so that branch skips the explode entirely)."""
        exprs = [
            C.parent_spark_sql("`_leaf`", prepared.res - lv)
            if lv != prepared.res else "`_leaf`"
            for lv in levels
        ]
        if len(exprs) == 1:
            out = base.withColumn("_cell", F.expr(exprs[0]))
        else:
            out = base.withColumn(
                "_cell", F.explode(F.expr(f"array({', '.join(exprs)})"))
            )
        return out.drop("_leaf")

    cov_res = prepared.covering["cell"].to_numpy() >> 58
    cov_kind = prepared.covering["kind"].to_numpy()
    all_levels = sorted({int(r) for r in np.unique(cov_res)})
    pts = with_chain(pts_leaf, all_levels)
    cov = cov.withColumnRenamed("cell", "_cell")
    if strategy == "broadcast":
        joined = pts.join(F.broadcast(cov), "_cell")
    else:
        # co-partition both sides on the cell key via the join's OWN
        # exchanges. Deliberately NO hand .repartition("_cell"): a
        # user-injected REPARTITION_BY_COL shuffle is off-limits to
        # AQE's OptimizeSkewedJoin (it only splits ENSURE_REQUIREMENTS
        # exchanges), so hand-partitioning would disable exactly the
        # skew mitigation a planted-city hot cell needs (measured:
        # with repartition the hot cell never splits; without it the
        # skew reader kicks in — pinned by the shuffle-PIP plan test).
        joined = pts.join(cov, "_cell")

    inside = prepared.refine_udf(spark)
    if single_pass:
        refined = joined.where(
            (F.col("kind") == F.lit(FULL))
            | inside(F.col(lon), F.col(lat), F.col("polygon_id"))
        )
        return refined.drop("_cell", "kind")
    # Split FULL hits (inside by construction — never touch Python)
    # from BOUNDARY hits (exact ray-cast refine). An OR-filter would
    # run the UDF over every joined row; at scale FULL rows dominate.
    # Each branch scans the input separately anyway, so give each its
    # own minimal ancestor chain (per-kind covering levels).
    if strategy == "broadcast":
        full_levels = sorted({int(r) for r in np.unique(cov_res[cov_kind == FULL])})
        bnd_levels = sorted({int(r) for r in np.unique(cov_res[cov_kind == BOUNDARY])})
        full_hits = with_chain(pts_leaf, full_levels or [prepared.res]).join(
            F.broadcast(cov.where(F.col("kind") == F.lit(FULL))), "_cell"
        )
        boundary_hits = with_chain(pts_leaf, bnd_levels or [prepared.res]).join(
            F.broadcast(cov.where(F.col("kind") == F.lit(BOUNDARY))), "_cell"
        ).where(inside(F.col(lon), F.col(lat), F.col("polygon_id")))
    else:
        full_hits = joined.where(F.col("kind") == F.lit(FULL))
        boundary_hits = joined.where(F.col("kind") == F.lit(BOUNDARY)).where(
            inside(F.col(lon), F.col(lat), F.col("polygon_id"))
        )
    return full_hits.unionByName(boundary_hits).drop("_cell", "kind")


def pip_join_brute(points: DataFrame, polygons: list[tuple[int, bytes]],
                   lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Reference implementation for tests: every point ray-cast against
    every polygon (no covering prefilter). O(points × polygons)."""
    spark = points.sparkSession
    edges = {}
    for pid, wkb in polygons:
        soup = G.EdgeSoup.from_wkb(wkb)
        edges[int(pid)] = (soup.x1, soup.y1, soup.x2, soup.y2)
    pids = spark.createDataFrame(
        pd.DataFrame({"polygon_id": list(edges.keys())}),
        schema=T.StructType([T.StructField("polygon_id", T.LongType(), False)]),
    )
    inside = _refine_udf(spark, edges)
    return (
        points.crossJoin(F.broadcast(pids))
        .where(inside(F.col(lon), F.col(lat), F.col("polygon_id")))
    )
