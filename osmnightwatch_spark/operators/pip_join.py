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
        """polygons: [(polygon_id, wkb_polygon_or_multipolygon), ...]."""
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
        return cls(covering=covering, edges=edges, res=res, min_res=min_res)

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
        schema = T.StructType([
            T.StructField("polygon_id", T.LongType(), False),
            T.StructField("cell", T.LongType(), False),
            T.StructField("kind", T.IntegerType(), False),
        ])
        pdf = self.covering.copy()
        pdf["kind"] = pdf["kind"].astype("int32")
        return spark.createDataFrame(pdf, schema=schema)


def _refine_udf(spark: SparkSession, edges: dict[int, tuple]):
    """pandas UDF (lon, lat, polygon_id) -> bool, ray-cast per polygon.

    The packed edge arrays ride a Spark broadcast variable — one copy
    per executor, not per task closure.
    """
    bc = spark.sparkContext.broadcast(edges)

    @F.pandas_udf(T.BooleanType())
    def inside(lon: pd.Series, lat: pd.Series, pid: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        pid_v = pid.to_numpy(dtype=np.int64)
        table = bc.value
        for p in np.unique(pid_v):
            m = pid_v == p
            x1, y1, x2, y2 = table[int(p)]
            soup = G.EdgeSoup.__new__(G.EdgeSoup)
            soup.x1, soup.y1, soup.x2, soup.y2 = x1, y1, x2, y2
            soup.bbox = (
                (min(x1.min(), x2.min()), min(y1.min(), y2.min()),
                 max(x1.max(), x2.max()), max(y1.max(), y2.max()))
                if len(x1) else (np.inf, np.inf, -np.inf, -np.inf)
            )
            out[m] = G.points_in_edgesoup(lon_v[m], lat_v[m], soup)
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
    pts = C.attach_cell(points, prepared.res, lon=lon, lat=lat, out="_leaf")
    chain = F.array(*[
        C.parent_col(F.col("_leaf"), s) if s else F.col("_leaf")
        for s in range(0, prepared.res - prepared.min_res + 1)
    ])
    pts = pts.withColumn("_cell", F.explode(chain)).drop("_leaf")
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

    inside = _refine_udf(spark, prepared.edges)
    if single_pass:
        refined = joined.where(
            (F.col("kind") == F.lit(FULL))
            | inside(F.col(lon), F.col(lat), F.col("polygon_id"))
        )
        return refined.drop("_cell", "kind")
    # Split FULL hits (inside by construction — never touch Python)
    # from BOUNDARY hits (exact ray-cast refine). An OR-filter would
    # run the UDF over every joined row; at scale FULL rows dominate.
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
