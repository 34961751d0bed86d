#!/usr/bin/env python
"""Session-6 scale study: the geometry-aggregate batch (ring shoelace,
convex hull, track resample) at multi-million-row synthetic sizes on
local[32] — structure-asserting like tools/r5_scale_study.py
(deterministic checksums that must be byte-stable across runs AND
partitionings, plus load attribution for this shared box).

    python tools/r5_geom_scale_study.py

Workloads (all inputs derived by integer hash — no rand()):
* ring_shoelace: 4M vertices / 40k rings (incl. ONE hot ring owning
  10% of all vertices — the window skew unit) → Σarea2 / Σcx / Σcy
  checksums; repartition(97) re-run must match bit-for-bit.
* convex_hull: 3M points / 30k entities on a 2^16 grid → total hull
  vertex count + Σhx checksum; hull size per entity is O(log n)-ish
  for hash-uniform points, so output << input (the reduction claim).
* track_resample: 2M fixes / 20k entities over a 30-day span, 6h
  grid → row count + Σtg checksum; output is bounded by
  span/step × entities (grid-proportional, not fix-proportional).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmnightwatch_spark.session import get_spark  # noqa: E402


def timed(fn):
    l0 = os.getloadavg()[0]
    t0 = time.time()
    out = fn()
    dt = round(time.time() - t0, 2)
    timed.last_load = [round(l0, 2), round(os.getloadavg()[0], 2)]
    return dt, out


def main() -> None:
    res: dict = {"load_at_start": [round(x, 2) for x in os.getloadavg()]}
    spark = get_spark("r5-geom-scale",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    # ---- ring_shoelace: 4M vertices, one hot ring --------------------
    from osmnightwatch_spark.operators.ring_metrics import ring_shoelace

    n_v, hot_share = 4_000_000, 10
    base = spark.range(n_v).select(
        F.when(F.col("id") % hot_share == 0, F.lit(0))
         .otherwise(F.col("id") % 40_000).alias("ring_id"),
        F.col("id").alias("seq"),
        ((F.col("id") * 2654435761) % 65536).alias("x"),
        ((F.col("id") * 2246822519 + 1234567) % 65536).alias("y"),
    )

    def run_rings(df):
        out = ring_shoelace(df)
        row = out.agg(F.sum("area2"), F.sum("cx_num"), F.sum("cy_num"),
                      F.sum("n_vertices"), F.count("*")).collect()[0]
        return [int(v) for v in row]

    dt1, chk1 = timed(lambda: run_rings(base))
    dt1b, chk1b = timed(lambda: run_rings(base.repartition(97)))
    assert chk1 == chk1b, (chk1, chk1b)
    # rings r ≡ 0 (mod 10) fold into the hot ring 0 (id%40000 == r with
    # 10|r forces id%10 == 0): 36000 cold rings + ring 0
    assert chk1[3] == n_v and chk1[4] == 36_001
    res["ring_shoelace_4m_hotring"] = {
        "sec": dt1, "sec_repart97": dt1b, "checksum": chk1,
        "load_1m": timed.last_load}

    # ---- convex_hull: 3M points / 30k entities -----------------------
    from osmnightwatch_spark.operators.hull import convex_hull

    pts = spark.range(3_000_000).select(
        (F.col("id") % 30_000).alias("entity"),
        ((F.col("id") * 2654435761) % 65536).alias("x"),
        ((F.col("id") * 2246822519 + 1234567) % 65536).alias("y"),
    )

    def run_hull():
        out = convex_hull(pts)
        row = out.agg(F.count("*"), F.sum("hx"),
                      F.countDistinct("entity")).collect()[0]
        return [int(v) for v in row]

    dt2, chk2 = timed(run_hull)
    assert chk2[2] == 30_000
    # hull of n hash-uniform points in a square has ~(8/3)ln n ≈ 12
    # vertices at n=100 — the reduction claim, with headroom
    assert chk2[0] < 3_000_000 // 4
    res["convex_hull_3m"] = {"sec": dt2, "checksum": chk2,
                             "load_1m": timed.last_load}

    # ---- track_resample: 2M fixes / 20k entities / 30 days -----------
    from osmnightwatch_spark.operators.trajectory import track_resample

    span = 30 * 86400
    fixes = spark.range(2_000_000).select(
        (F.col("id") % 20_000).alias("user_id"),
        ((F.col("id") * 1103515245) % span).alias("te"),
        (((F.col("id") * 2654435761) % 360_000_000).cast("double")
         / 1e6 - 180.0).alias("lon"),
        (((F.col("id") * 2246822519) % 170_000_000).cast("double")
         / 1e6 - 85.0).alias("lat"),
    )

    def run_resample():
        out = track_resample(fixes, step_s=21600, ts="te")
        row = out.agg(F.count("*"), F.sum("tg"),
                      F.countDistinct("user_id")).collect()[0]
        return [int(v) for v in row]

    dt3, chk3 = timed(run_resample)
    # grid-bounded output: <= entities * (span/step + 1)
    assert chk3[0] <= 20_000 * (span // 21600 + 1)
    res["track_resample_2m"] = {"sec": dt3, "checksum": chk3,
                                "load_1m": timed.last_load}

    res["load_at_end"] = [round(x, 2) for x in os.getloadavg()]
    spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
