"""Cell-bucketed exact kNN join (north_rule J11).

The reference's nearest semantic ancestor is its bounding-box
neighborhood join ("fetch coastlines in the bbox of a changed
coastline", README.md:40; ``BrokenCoastlineAnalyzer.cs:140-166``).
Here: for each probe point, the k nearest candidate points under the
documented metric — **squared planar degree distance**
``(Δlon)² + (Δlat)²`` (planar, like the reference's R-tree frames; no
great-circle correction, stated so the oracle matches bit-for-bit).

Exact in two rounds (the classic filter-and-refine kNN):

1. **Candidate round** — candidates bucketed by cell at ``res``
   (native encode); probes explode to their own + ring-1 neighbor
   cells (a pandas UDF computes the 9 neighbor ids — ring math needs
   de-interleave — then ``explode``). Equi-join on cell, per-probe
   top-k via ``row_number`` window.
2. **Guarantee check** — a probe's result is provably exact iff its
   k-th distance ≤ its guaranteed radius (distance from the probe to
   the edge of its 3×3 cell block: everything outside the block is
   farther than that radius). Probes that fail (or found < k
   candidates) re-run as a broadcast brute-force against all
   candidates — at sane resolutions that residue is a tiny fraction,
   so the expensive path is O(residue × candidates).

Scale: round 1 shuffles candidates once by cell and probes ×9; the
window partitions by probe_id (no hot key — each probe is its own
group). Resolution choice trades candidate-list length (dense cells)
against residue size (empty rings); pick res so expected cell
occupancy ≈ a few × k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells as C


@F.pandas_udf(T.ArrayType(T.LongType()))
def _ring1_cells(cell: pd.Series) -> pd.Series:
    ring = C.ring_neighbors(cell.to_numpy(dtype=np.int64), k=1)
    return pd.Series([np.unique(r).tolist() for r in ring])


def _dist2(plon, plat, clon, clat):
    return (plon - clon) * (plon - clon) + (plat - clat) * (plat - clat)


def knn_join(probes: DataFrame, candidates: DataFrame, k: int, res: int = 6,
             probe_id: str = "probe_id", cand_id: str = "cand_id",
             lon: str = "lon", lat: str = "lat",
             exact: bool = True) -> DataFrame:
    """Returns (probe_id, cand_id, dist2, rank) — per probe the k
    nearest candidates, rank 1..k by (dist2, cand_id) (deterministic
    tie-break). Probes and candidates may be the same table (self-kNN
    excludes self-matches when ids collide)."""
    p = probes.select(
        F.col(probe_id).alias("_pid"),
        F.col(lon).alias("_plon"),
        F.col(lat).alias("_plat"),
    )
    c = C.attach_cell(
        candidates.select(
            F.col(cand_id).alias("_cid"),
            F.col(lon).alias("_clon"),
            F.col(lat).alias("_clat"),
        ),
        res, lon="_clon", lat="_clat", out="_ccell",
    )

    pc = C.attach_cell(p, res, lon="_plon", lat="_plat", out="_pcell")
    exploded = pc.withColumn(
        "_ccell", F.explode(_ring1_cells(F.col("_pcell")))
    ).drop("_pcell")

    paired = exploded.join(c, "_ccell").where(F.col("_pid") != F.col("_cid"))
    d2 = _dist2(F.col("_plon"), F.col("_plat"), F.col("_clon"), F.col("_clat"))
    w = Window.partitionBy("_pid").orderBy(F.col("dist2").asc(), F.col("_cid").asc())
    ranked = (
        paired.withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )

    if not exact:
        return ranked.select(
            F.col("_pid").alias(probe_id), F.col("_cid").alias(cand_id),
            "dist2", "rank",
        )

    # the exact path reuses `ranked` three times (stats, good, residue
    # anti-join); persist the small top-k result instead of recomputing
    # the candidate join per consumer
    ranked = ranked.persist()

    # guaranteed radius: distance from probe to the edge of its 3x3 block
    n = float(1 << res)
    cw, ch = 360.0 / n, 180.0 / n
    gx = F.floor((F.col("_plon") + F.lit(180.0)) / F.lit(cw))
    gy = F.floor((F.col("_plat") + F.lit(90.0)) / F.lit(ch))
    # block bounds [gx-1, gx+2) x [gy-1, gy+2) in degrees
    bx0 = gx.cast("double") * cw - 180.0 - cw
    bx1 = bx0 + 3 * cw
    by0 = gy.cast("double") * ch - 90.0 - ch
    by1 = by0 + 3 * ch
    guard = F.least(
        F.col("_plon") - bx0, bx1 - F.col("_plon"),
        F.col("_plat") - by0, by1 - F.col("_plat"),
    )
    stats = ranked.groupBy("_pid").agg(
        F.max(F.sqrt(F.col("dist2"))).alias("_kth"),
        F.count(F.lit(1)).alias("_found"),
        F.first("_plon").alias("_plon"), F.first("_plat").alias("_plat"),
    )
    ok = stats.where((F.col("_found") >= k) & (F.col("_kth") <= guard))
    good = ranked.join(ok.select("_pid"), "_pid", "left_semi")

    # residue probes: brute-force (they are few by construction)
    residue = p.join(ok.select("_pid"), "_pid", "left_anti")
    brute = (
        F.broadcast(residue)
        .crossJoin(c.drop("_ccell"))
        .where(F.col("_pid") != F.col("_cid"))
        .withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    out = good.select("_pid", "_cid", "dist2", "rank").unionByName(
        brute.select("_pid", "_cid", "dist2", "rank")
    )
    return out.select(
        F.col("_pid").alias(probe_id), F.col("_cid").alias(cand_id), "dist2", "rank"
    )


def knn_join_brute(probes: DataFrame, candidates: DataFrame, k: int,
                   probe_id: str = "probe_id", cand_id: str = "cand_id",
                   lon: str = "lon", lat: str = "lat") -> DataFrame:
    """O(P×C) reference implementation (tests + small probe sets)."""
    p = probes.select(F.col(probe_id).alias("_pid"), F.col(lon).alias("_plon"),
                      F.col(lat).alias("_plat"))
    c = candidates.select(F.col(cand_id).alias("_cid"), F.col(lon).alias("_clon"),
                          F.col(lat).alias("_clat"))
    d2 = _dist2(F.col("_plon"), F.col("_plat"), F.col("_clon"), F.col("_clat"))
    w = Window.partitionBy("_pid").orderBy(F.col("dist2").asc(), F.col("_cid").asc())
    return (
        F.broadcast(p).crossJoin(c)
        .where(F.col("_pid") != F.col("_cid"))
        .withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("_pid").alias(probe_id), F.col("_cid").alias(cand_id),
                "dist2", "rank")
    )
