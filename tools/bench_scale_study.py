"""One-off scale studies recorded in BENCH.md (round-2 evidence):

1. sf0.1 → sf1 flagship scaling (200k → 2M images): wall time should
   grow ~linearly once fixed job overhead amortizes.
2. Skewed rollup (the planted 20%-in-3-cells city skew): naive
   countDistinct-by-tile vs two-phase (partial distinct) vs
   adaptive-cell keying.
3. ANN 10× vectors: lsh_topk with a FIXED plane count (the round-1
   design) vs planes_for(n)-scaled planes — quantifies why bucket
   count must scale with data.

Usage: python tools/bench_scale_study.py [--skip-sf1]
Prints one JSON blob; paste/summarize into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def timed2(fn):
    """Warm + timed run (bench.py discipline)."""
    fn()
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from osmnightwatch_spark.operators import similarity as S
    from osmnightwatch_spark.operators.skew import adaptive_cells
    from osmnightwatch_spark.plans.pipeline import flagship
    from osmnightwatch_spark.session import get_spark
    from osmnightwatch_spark.sources.images import with_geo, write_images
    from osmnightwatch_spark.functions import cells as C

    skip_sf1 = "--skip-sf1" in sys.argv
    out: dict = {}
    spark = get_spark("scale-study", cores=32)

    # --- 1. flagship sf0.1 vs sf1 -----------------------------------------
    results = {}
    for sf, n in (((0.1), 200_000),) + ((() if skip_sf1 else ((1.0, 2_000_000),))):
        path = os.path.join(REPO, "data", f"images_sf{sf}")
        write_images(spark, path, n)
        imgs = spark.read.parquet(path)
        sec = timed2(lambda: flagship(imgs).count())
        results[f"sf{sf}"] = {"n_images": n, "sec": sec,
                              "images_per_sec": round(n / sec, 1)}
    out["flagship_scaling"] = results

    # --- 2a. skew on the PLANTED city rows (point-degenerate: identical
    # geotags per template — no resolution can split them; the fix is
    # two-phase/salted aggregation, NOT cell splitting) -------------------
    big_sf = 0.1 if skip_sf1 else 1.0
    path = os.path.join(REPO, "data", f"images_sf{big_sf}")
    pts = with_geo(spark.read.parquet(path).select("image_id", "phash"))

    def naive():
        C.attach_cell(pts, 8, out="tile").groupBy("tile").agg(
            F.countDistinct("phash")).count()

    def two_phase():
        t = C.attach_cell(pts, 8, out="tile")
        t.groupBy("tile", "phash").agg(F.count(F.lit(1)).alias("_n")) \
            .groupBy("tile").agg(F.count(F.lit(1)).alias("n_distinct")).count()

    out["skew_degenerate_rollup"] = {
        "sf": big_sf,
        "naive_distinct_sec": timed2(naive),
        "two_phase_distinct_sec": timed2(two_phase),
    }

    # --- 2b. skew on dense-but-DISTINCT city points (the adaptive-split
    # case: 20% of rows in 3 patches of ~0.2°, splittable to finer
    # cells). Workload: per-cell window ranking — a hot res-8 cell is
    # one sorting task; adaptive keys bound the partition. -------------
    from pyspark.sql import Window

    n_pts = 2_000_000 if not skip_sf1 else 200_000
    rng = np.random.default_rng(9)
    base = pd.DataFrame({
        "pt_id": np.arange(n_pts),
        "lon": rng.uniform(-180, 180, n_pts),
        "lat": rng.uniform(-85, 85, n_pts),
        "v": rng.integers(0, 1 << 30, n_pts),
    })
    city = base.index[base.pt_id % 5 == 0]
    centers = np.array([[-100.0, 10.0], [12.0, 48.0], [139.0, 35.0]])
    pick = rng.integers(0, 3, len(city))
    base.loc[city, "lon"] = centers[pick, 0] + rng.uniform(0, 0.2, len(city))
    base.loc[city, "lat"] = centers[pick, 1] + rng.uniform(0, 0.2, len(city))
    dense = spark.createDataFrame(base).repartition(64).persist()
    dense.count()

    def rank_over(keyed, key):
        w = Window.partitionBy(key).orderBy(F.col("v").desc())
        return keyed.withColumn("_r", F.row_number().over(w)) \
            .where(F.col("_r") <= 100).count()

    def naive_window():
        rank_over(C.attach_cell(dense, 8, out="tile"), "tile")

    def adaptive_window():
        a = adaptive_cells(dense, base_res=8, max_rows_per_cell=25_000)
        rank_over(a, "acell")

    out["skew_distinct_points_window"] = {
        "n_points": n_pts,
        "hot_fraction": 0.2,
        "naive_res8_sec": timed2(naive_window),
        "adaptive_cells_sec": timed2(adaptive_window),
    }
    dense.unpersist()

    # --- 3. ANN: fixed planes vs planes_for(n) at n and 10n ----------------
    def emb_df(n):
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        pdf = pd.DataFrame({"vec_id": np.arange(n),
                            "embedding": list(map(list, vecs))})
        return spark.createDataFrame(pdf).repartition(32).persist()

    ann = {}
    for n in (10_000, 100_000):
        df = emb_df(n)
        df.count()
        probe = F.col("vec_id") % 100 == 0
        fixed_sec = timed2(lambda: S.lsh_topk(df, probe, k=5, dims=16,
                                              planes=8).count())
        p = S.planes_for(n, target_bucket=64)
        scaled_sec = timed2(lambda: S.lsh_topk(
            df, probe, k=5, dims=16, planes=p, tables=2,
            max_bucket=50 * 64).count())
        ann[f"n{n}"] = {"fixed_planes8_sec": fixed_sec,
                        "scaled_planes": p,
                        "scaled_2tables_sec": scaled_sec}
        df.unpersist()
    out["ann_scaling"] = ann

    spark.stop()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
