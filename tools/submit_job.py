"""spark-submit entry point — the cluster deployment story.

Usage (cluster):

    python tools/make_pyfiles.py dist/osmnightwatch_spark.zip
    spark-submit --py-files dist/osmnightwatch_spark.zip \
        tools/submit_job.py --job flagship --images s3://bucket/images \
        --output s3://bucket/out

Locally (this sandbox) the same script runs under a local master; the
package self-ships via addPyFile so --py-files is optional there.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", choices=["flagship", "verified", "knn", "coverage"],
                    default="flagship")
    ap.add_argument("--images", default=None, help="images parquet path")
    ap.add_argument("--n-images", type=int, default=20000,
                    help="generate this many rows when --images is absent")
    ap.add_argument("--output", default=None, help="parquet output path")
    ap.add_argument("--tile-res", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from osmnightwatch_spark.session import _ship_package
    from osmnightwatch_spark.sources.images import images_df

    spark = SparkSession.builder.appName(f"osmnightwatch-{args.job}").getOrCreate()
    _ship_package(spark)

    imgs = (
        spark.read.parquet(args.images)
        if args.images
        else images_df(spark, args.n_images)
    )

    if args.job == "flagship":
        from osmnightwatch_spark.plans.pipeline import flagship

        out = flagship(imgs, tile_res=args.tile_res)
    elif args.job == "verified":
        from osmnightwatch_spark.operators.images_ops import verified_flagship

        out = verified_flagship(imgs, tile_res=args.tile_res)
    elif args.job == "knn":
        from pyspark.sql import functions as F

        from osmnightwatch_spark.operators.knn import knn_join
        from osmnightwatch_spark.sources.images import with_geo

        geo = with_geo(imgs.select("image_id", "phash"))
        out = knn_join(
            geo.where(F.crc32("image_id") % 1000 == 0)
            .withColumnRenamed("image_id", "probe_id"),
            geo.withColumnRenamed("image_id", "cand_id"), k=5, res=5,
        )
    else:
        from osmnightwatch_spark.operators.coverage import observed_coverage
        from osmnightwatch_spark.operators.pip_join import PreparedPolygons
        from osmnightwatch_spark.sources.images import with_geo
        from osmnightwatch_spark.sources.polygons import valid_polygon_list

        prep = PreparedPolygons.build(valid_polygon_list(), res=7)
        out = observed_coverage(with_geo(imgs.select("image_id", "phash")),
                                prep, tile_res=4, fine_res=9)

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        print(f"rows: {out.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
