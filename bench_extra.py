"""Extra benchmarks for the optimization rounds (guide §1.4).

NOT the driver bench — ``bench.py`` is frozen for measurement. This
file isolates sub-stages of the headline queries with the noop sink
and repeats, so per-operator costs are attributable. Numbers from
here are cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [suite ...]   # default: all suites
Suites: flagship, knn, minhash, similarity, spatial, sf1
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_XRUNS (default 5)

The ``sf1`` suite times the scale-sensitive similarity/dedup
operators over the deterministic 10× replica that
``tools/sf1_oracle_sweep.py`` generates under ``data/sf1_synth``
(run that first) — the scale-holding timing evidence cited in
OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
RUNS = int(os.environ.get("SPARK_GRAFT_XRUNS", "5"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    suites = set(sys.argv[1:]) or {"flagship", "knn", "minhash",
                                   "similarity", "spatial"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from osmnightwatch_spark.operators.pip_join import PreparedPolygons, pip_join
    from osmnightwatch_spark.session import get_spark
    from osmnightwatch_spark.sources.images import with_geo
    from osmnightwatch_spark.sources.polygons import valid_polygon_list

    import bench

    sf = bench.sf_of(sf_dir)
    path = bench.images_path(sf)

    spark = get_spark("bench-extra", cores=cores)
    prep = PreparedPolygons.build(valid_polygon_list(), res=7)

    out: dict[str, list[float]] = {}

    def timed(name, fn, runs=RUNS):
        spark.sparkContext.setJobDescription(name)
        fn()  # warm
        raw = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            raw.append(round(time.time() - t0, 3))
        out[name] = raw
        print(f"{name:40s} min={min(raw):6.3f}  {raw}", flush=True)
        spark.sparkContext.setJobDescription(None)

    def geo():
        return with_geo(spark.read.parquet(path).select("image_id", "phash"))

    if "flagship" in suites:
        from osmnightwatch_spark.functions import cells as C
        from osmnightwatch_spark.plans.pipeline import flagship

        timed("scan_count", lambda: spark.read.parquet(path)
              .select("image_id", "phash").count())
        timed("scan_noop", lambda: noop(
            spark.read.parquet(path).select("image_id", "phash")))
        timed("geo_cell_noop", lambda: noop(
            C.attach_cell(geo(), 8, out="tile")))
        timed("pip_noop", lambda: noop(pip_join(geo(), prep)))
        timed("pip_count", lambda: pip_join(geo(), prep).count())
        timed("flagship_count", lambda: flagship(
            spark.read.parquet(path), prepared=prep).count())
        timed("flagship_noop", lambda: noop(flagship(
            spark.read.parquet(path), prepared=prep)))
        # rollup without the PIP join: tile + per-tile distinct phash
        pts = C.attach_cell(geo(), 8, out="tile")
        timed("rollup_only_count", lambda: C.attach_cell(geo(), 8, out="tile")
              .groupBy("tile")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.countDistinct("phash").alias("nd")).count())

    if "spatial" in suites:
        from osmnightwatch_spark.operators.raster import density_grid
        from osmnightwatch_spark.operators.tiling import tile_counts, tile_pyramid

        timed("tile_counts_r8", lambda: tile_counts(geo(), 8).count())
        timed("tile_pyramid_r2_8", lambda: tile_pyramid(geo(), 2, 8).count())
        timed("density_grid_r6", lambda: density_grid(geo(), res=6).count())
        from osmnightwatch_spark.operators.coverage import observed_coverage
        timed("coverage_observed", lambda: observed_coverage(
            geo(), prep, tile_res=4, fine_res=9).count())

    if "knn" in suites:
        from osmnightwatch_spark.operators.knn import knn_join

        timed("knn_join_k5", lambda: knn_join(
            geo().where(F.crc32(F.col("image_id")) % 1000 == 0)
            .withColumnRenamed("image_id", "probe_id"),
            geo().withColumnRenamed("image_id", "cand_id"), k=5).count())
        timed("knn_probe_count_only", lambda: geo()
              .where(F.crc32(F.col("image_id")) % 1000 == 0).count())

    if "minhash" in suites:
        from osmnightwatch_spark.operators.dedup import (minhash_bands,
                                                         minhash_lsh_pairs,
                                                         shingles)

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        timed("dedup_minhash", lambda: minhash_lsh_pairs(
            docs, "doc_id").count())
        timed("minhash_shingles_noop", lambda: noop(
            shingles(docs, "doc_id", distinct=False)))
        timed("minhash_sig_noop", lambda: noop(minhash_bands(
            shingles(docs, "doc_id", distinct=False), "doc_id")))

    if "similarity" in suites:
        from osmnightwatch_spark.operators.similarity import (
            cosine_topk_brute, ivf_topk, kmeans_centroids, lsh_topk,
            planes_for)

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_emb = emb.count()
        dims = len(emb.select("embedding").head()[0])
        timed("cosine_topk", lambda: cosine_topk_brute(
            emb, F.col("vec_id") % 50 == 0, k=5).count())
        timed("ann_lsh_scaled", lambda: lsh_topk(
            emb, F.col("vec_id") % 50 == 0, k=5, dims=dims,
            planes=planes_for(n_emb, target_bucket=64), tables=2,
            max_bucket=50 * 64).count())
        centroids = kmeans_centroids(emb, dims=dims,
                                     k_centroids=max(16, n_emb // 64))
        timed("ann_ivf_scaled", lambda: ivf_topk(
            emb, F.col("vec_id") % 50 == 0, k=5, dims=dims,
            centroids=centroids, nprobe=4).count())

    if "sf1" in suites:
        from osmnightwatch_spark.operators.dedup import minhash_lsh_pairs
        from osmnightwatch_spark.operators.similarity import (
            cosine_topk_brute, ivf_topk, kmeans_centroids, lsh_topk,
            planes_for)

        emb1 = spark.read.parquet(os.path.join(REPO, "data/sf1_synth/embeddings.parquet"))
        docs1 = spark.read.parquet(os.path.join(REPO, "data/sf1_synth/documents.parquet"))
        n1 = emb1.count()
        d1 = len(emb1.select("embedding").head()[0])
        c1 = kmeans_centroids(emb1, dims=d1, k_centroids=max(16, n1 // 64))
        timed("sf1_minhash", lambda: minhash_lsh_pairs(
            docs1, "doc_id").count(), runs=4)
        timed("sf1_cosine", lambda: cosine_topk_brute(
            emb1, F.col("vec_id") % 50 == 0, k=5).count(), runs=4)
        timed("sf1_ann_lsh", lambda: lsh_topk(
            emb1, F.col("vec_id") % 50 == 0, k=5, dims=d1,
            planes=planes_for(n1, 64), tables=2,
            max_bucket=50 * 64).count(), runs=4)
        timed("sf1_ann_ivf", lambda: ivf_topk(
            emb1, F.col("vec_id") % 50 == 0, k=5, dims=d1,
            centroids=c1, nprobe=4).count(), runs=4)

    print(json.dumps({"mins": {k: min(v) for k, v in out.items()},
                      "raw": out}))
    spark.stop()


if __name__ == "__main__":
    main()
