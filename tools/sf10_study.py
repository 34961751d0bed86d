"""sf10 scale datapoint (VERDICT r3 #8): extend the 200k→2M flagship
curve a decade to 20M images, plus minhash/clusters pairs-throughput at
a 100×-sf0.1 document corpus (500k docs).

Disk-bounded design: images are generated SLIM (image_id, phash only —
the exact columns the flagship trunk reads; the pixel bytes are
synthesized and phash'd, then dropped) so sf10 costs ~0.4 GB, not
~83 GB. Document replicas are text-ROTATED (not just prefixed like the
sf1 oracle sweep): a shared prefix keeps stride-sampled shingles mostly
identical across replicas, which makes cross-replica pair counts grow
quadratically with copies — an artifact of replication, not a property
of a real 10× corpus. Rotation re-phases every shingle window, so pair
growth stays ~linear and pairs/sec measures throughput, not blowup.

Usage: python tools/sf10_study.py   # prints one JSON blob for BENCH.md
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_IMAGES = 20_000_000
DOC_COPIES = 100
DOC_SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def ensure_docs(path: str) -> None:
    import duckdb

    if os.path.exists(os.path.join(path, "_DONE")):
        return
    os.makedirs(path, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""COPY (
      SELECT doc_id + i*{OFFSET} AS doc_id,
             substr(text, 1 + CAST(i % 50 AS INT)) || ' r' || i AS text,
             lang, source, length(substr(text, 1 + CAST(i % 50 AS INT))) + 3 + length(CAST(i AS VARCHAR)) AS n_chars
      FROM read_parquet('{DOC_SRC}/documents.parquet'),
           UNNEST(range(0, {DOC_COPIES})) t(i)
    ) TO '{path}/documents.parquet' (FORMAT PARQUET)""")
    open(os.path.join(path, "_DONE"), "w").close()


def main() -> None:
    from pyspark.sql import functions as F

    from osmnightwatch_spark.operators import dedup as D
    from osmnightwatch_spark.plans.pipeline import flagship
    from osmnightwatch_spark.session import get_spark
    from osmnightwatch_spark.sources.images import write_images_slim

    out: dict = {"load_1m_start": os.getloadavg()[0]}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)  # partial progress survives a crash
    # local-mode heartbeats share the JVM with the work: a >10 s full
    # GC (or a co-tenant host freeze — observed load 30+) times out the
    # executor-driver RPC and Spark shuts itself down mid-stage. Long
    # single-JVM studies need lenient timeouts.
    spark = get_spark("sf10-study", cores=32, extra={
        "spark.executor.heartbeatInterval": "60s",
        "spark.network.timeout": "600s",
    })

    img_path = os.path.join(REPO, "data", "images_sf10_slim")
    t0 = time.time()
    write_images_slim(spark, img_path, N_IMAGES)
    emit("gen_images_sec", round(time.time() - t0, 1))

    imgs = spark.read.parquet(img_path)
    flagship(imgs).count()  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        n_out = flagship(imgs).count()
        best = min(best or 1e9, time.time() - t0)
    emit("flagship_sf10", {
        "n_images": N_IMAGES, "rollup_rows": n_out, "sec": round(best, 2),
        "images_per_sec": round(N_IMAGES / best, 1),
    })

    doc_path = os.path.join(REPO, "data", "docs_sf10")
    ensure_docs(doc_path)
    docs = spark.read.parquet(doc_path + "/documents.parquet")
    n_docs = docs.count()
    # the synthetic corpus's tiny shared vocab makes band minima collide
    # massively: at 500k docs most buckets approach the default 1000-cap
    # and the pair join explodes quadratically INSIDE buckets (O(cap²)
    # per bucket × thousands of buckets ≈ 10^9-10^10 join rows — a
    # corpus artifact, not a throughput property). max_bucket is the
    # operator's documented skew guard for exactly this; 100 keeps the
    # join linear-ish while still emitting millions of candidate pairs.
    MAXB = 100
    t0 = time.time()
    n_pairs = D.minhash_lsh_pairs(docs, "doc_id", max_bucket=MAXB).count()
    sec_pairs = time.time() - t0
    t0 = time.time()
    n_pairs2 = D.minhash_lsh_pairs(docs, "doc_id", max_bucket=MAXB).count()
    sec_pairs = min(sec_pairs, time.time() - t0)
    emit("minhash_sf10", {
        "n_docs": n_docs, "n_pairs": n_pairs, "sec": round(sec_pairs, 2),
        "pairs_per_sec": round(n_pairs / sec_pairs, 1),
        "docs_per_sec": round(n_docs / sec_pairs, 1),
    })

    strong = D.minhash_lsh_pairs(docs, "doc_id", max_bucket=MAXB).where(
        F.col("n_shared_bands") >= 4)
    t0 = time.time()
    # ~500k-node near-path components need ~log2(n) jump rounds; 20 is marginal
    clusters = D.dedup_clusters(strong, all_ids=docs, id_col="doc_id",
                                max_iters=40)
    n_keep = clusters.where(F.col("doc_id") == F.col("keeper_id")).count()
    emit("clusters_sf10", {
        "n_docs": n_docs, "n_keepers": n_keep,
        "sec": round(time.time() - t0, 2),
    })
    out["load_1m_end"] = os.getloadavg()[0]
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
