"""spark-submit entry point for the flagship pipeline (north_rule:
"run via spark-submit --py-files on multi-executor clusters").

The package arrives via ``--py-files osmnightwatch_spark.zip`` — this
script imports it from the submitted zip exactly as executors do on a
real cluster (no repo checkout on the workers). Usage (see
``tools/spark_submit_smoke.sh``):

    spark-submit --master local[8] \
        --py-files /tmp/osmnightwatch_spark.zip \
        tools/submit_flagship.py [n_images]

On a real cluster the same command takes ``--master yarn|k8s://…`` and
``--num-executors N`` — nothing in the job changes; that is the point
of shipping the package as a zip.
"""

import sys

from pyspark.sql import SparkSession


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    spark = SparkSession.builder.appName("flagship-submit").getOrCreate()
    # imports resolve from the --py-files zip, not a local checkout
    from osmnightwatch_spark.plans.pipeline import flagship
    from osmnightwatch_spark.sources.images import images_df

    out = flagship(images_df(spark, n, seed=42, partitions=8)).collect()
    total = sum(r.n_images for r in out)
    print(f"FLAGSHIP_OK rows={len(out)} images={total}")
    spark.stop()
    # flagship counts only geotags that land inside some admin polygon,
    # so total < n by design; success = nonempty and bounded by n
    return 0 if (len(out) > 0 and 0 < total <= n) else 1


if __name__ == "__main__":
    sys.exit(main())
