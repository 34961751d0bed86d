#!/usr/bin/env python
"""Round-5 scale study : the new operators at ~sf1-sf10 synthetic sizes
on local[32] — structure-asserting (deterministic counts, no silent
truncation), not just timings. Prints one JSON line
(with load_at_start/load_at_end — this box is SHARED: a co-tenant
burst was measured turning the 37 s dsir workload into 445 s; numbers
without load attribution are meaningless here).

    python tools/r5_scale_study.py

Workloads:
* asof: 3M refs + 750k probes, ONE key owning 50% of all rows —
  plain single-window vs bucketed (the hot-key fix); both must agree
  on a sampled checksum, and bucketed must not be slower than ~1.5x
  plain on uniform-ish data's budget.
* rect_overlay: 100k x 200k boxes (avg 2 deg) — pair count must be
  duplicate-free (owner-cell dedup) and byte-stable across runs.
* colocation: 2M fixes / 50k entities / zipf-ish hot cells with a
  bucket cap — capped pair count + hot-bucket count byte-stable.
* dsir: 400k docs scored against a 20k-doc target — trainer collect
  stays 4096 rows; scoring+resample timed.
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


def load_now():
    return [round(x, 2) for x in os.getloadavg()]


def main() -> None:
    res: dict = {"load_at_start": [round(x, 2) for x in os.getloadavg()]}
    spark = get_spark("r5-scale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    # ---- dsir at 400k docs -------------------------------------------
    from osmnightwatch_spark.operators.dsir import dsir_sample

    vocab = [f"w{i}" for i in range(600)]
    words = F.array(*[F.lit(w) for w in vocab])
    docs = spark.range(400_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.element_at(
                words,
                (F.conv(F.substring(F.md5(F.concat(F.lit(str(j)), F.col("id"))),
                                    1, 6), 16, 10)
                 % F.when(F.col("id") % 20 == 0, 60).otherwise(600) + 1
                 ).cast("int"))
            for j in range(24)
        ]).alias("text"),
    )
    # materialize the (expensive, 24-md5-per-row) synthesis once — the
    # study times the OPERATOR, not the fixture generator. NOTE: no
    # .limit() on the target — GlobalLimit would funnel the target
    # trainer's whole explode through ONE task (measured 3x the total
    # study cost); the % 20 filter already yields exactly 20k rows.
    docs = docs.persist()
    docs.count()
    target = docs.where(F.col("doc_id") % 20 == 0)

    def run_dsir():
        out = dsir_sample(docs, target, m=10_000)
        return out.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("dsir_logw_q").alias("s")).collect()[0]

    sec_d, row_d = timed(run_dsir)
    res["dsir_400k"] = {"sampled": row_d.n, "logw_checksum": int(row_d.s),
                        "sec": sec_d, "load_1m": timed.last_load}


    # ---- asof hot-key: plain vs bucketed at 3.75M rows --------------
    from osmnightwatch_spark.operators.asof import asof_join, asof_join_bucketed

    n = 3_000_000
    t_span = 2_000_000
    base = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise((F.col("id") % 997).cast("string")).alias("k"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
         .cast("long") % t_span).alias("te"),
        F.col("id").alias("rid"),
    )
    probes = base.where(F.col("id") % 4 == 0).withColumnRenamed("rid", "pid")
    refs = base.where(F.col("id") % 4 != 0)

    def run_plain():
        out = asof_join(probes, refs, key="k", t="te",
                        payload=["rid"], tiebreak="rid")
        return out.agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.col("ref_rid")).alias("s")).collect()[0]

    def run_bucketed():
        out = asof_join_bucketed(probes, refs, key="k", t="te",
                                 payload=["rid"], tiebreak="rid",
                                 slice_width=t_span // 256)
        return out.agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.col("ref_rid")).alias("s")).collect()[0]

    run_bucketed()  # warm
    sec_b, row_b = timed(run_bucketed)
    sec_p, row_p = timed(run_plain)
    assert (row_b.n, row_b.s) == (row_p.n, row_p.s), "bucketed != plain"
    res["asof_hot50"] = {
        "rows": n, "probes": row_p.n, "checksum": int(row_p.s),
        "plain_sec": sec_p, "bucketed_sec": sec_b,
        "speedup": round(sec_p / sec_b, 2), "load_1m": timed.last_load,
    }

    # ---- rect_overlay at 100k x 200k --------------------------------
    from osmnightwatch_spark.operators.overlay import (rect_overlay_join,
                                                       res_for_extent)

    def boxes(n_rows, salt, idc):
        u = lambda s, lo, hi: (  # noqa: E731
            F.conv(F.substring(F.md5(F.concat(F.lit(s), F.col("id"))), 1, 8),
                   16, 10).cast("double") / float(16 ** 8) * (hi - lo) + lo)
        return spark.range(n_rows).select(
            F.col("id").alias(idc),
            (u(salt + "x", -179, 178)).alias("_cx"),
            (u(salt + "y", -84, 84)).alias("_cy"),
            (u(salt + "w", 0.1, 2.0)).alias("_w"),
            (u(salt + "h", 0.1, 1.5)).alias("_h"),
        ).select(idc,
                 (F.col("_cx") - F.col("_w")).alias("lon0"),
                 (F.col("_cx") + F.col("_w")).alias("lon1"),
                 (F.col("_cy") - F.col("_h")).alias("lat0"),
                 (F.col("_cy") + F.col("_h")).alias("lat1"))

    a = boxes(100_000, "a", "a_id")
    b = boxes(200_000, "b", "b_id")
    r = res_for_extent(2.0)

    def run_overlay():
        out = rect_overlay_join(a, b, res=r)
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("a_id", "b_id").alias("nd"),
            F.sum(F.floor(F.col("area") * 1e6)).alias("s")).collect()[0]

    run_overlay()
    sec_o, row_o = timed(run_overlay)
    assert row_o.n == row_o.nd, "owner-cell dedup emitted duplicates"
    res["rect_overlay_100k_200k"] = {
        "res": r, "pairs": row_o.n, "area_checksum": int(row_o.s),
        "sec": sec_o, "load_1m": timed.last_load,
    }

    # ---- colocation at 2M fixes -------------------------------------
    from osmnightwatch_spark.operators.colocation import (colocation_pairs,
                                                          hot_buckets)

    fixes = spark.range(2_000_000).select(
        (F.col("id") % 50_000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                      16, 10).cast("long") % 2_592_000)).alias("ts"),
        # 80% of fixes in 100 hot "city" sites, 20% spread over 50k
        F.when(F.col("id") % 5 != 0, (F.col("id") % 100) * 3.1 - 150.0)
        .otherwise((F.col("id") % 50_000) * 0.007 - 170.0).alias("lon"),
        F.when(F.col("id") % 5 != 0, (F.col("id") % 100) * 1.6 - 80.0)
        .otherwise((F.col("id") % 45_000) * 0.003 - 65.0).alias("lat"),
    )

    def run_colo():
        pairs = colocation_pairs(fixes, res=6, window_s=3600,
                                 max_per_bucket=64)
        return pairs.agg(F.count(F.lit(1)).alias("n"),
                         F.sum("n_sightings").alias("s")).collect()[0]

    run_colo()
    sec_c, row_c = timed(run_colo)
    hot = hot_buckets(fixes, res=6, window_s=3600, min_entities=65).count()
    res["colocation_2m"] = {
        "capped_pairs": row_c.n, "sightings_checksum": int(row_c.s),
        "hot_buckets_reported": hot, "sec": sec_c, "load_1m": timed.last_load,
    }

    res["load_at_end"] = load_now()
    spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
