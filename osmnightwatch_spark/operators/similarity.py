"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:

* ``cosine_topk_brute`` — exact brute-force top-k for a (small) probe
  set: broadcast probes, score every candidate with a *native*
  ``zip_with``+``aggregate`` dot product (JVM, codegen — no Python),
  per-probe top-k window. O(P×C) — the correctness baseline and the
  right tool when P is small.
* ``lsh_topk`` — scale path: random-hyperplane LSH buckets both sides,
  search within the probe's bucket only. Hyperplane weights are
  *rational* pseudo-random numbers (integer arithmetic / 1000) so the
  bucketing is bit-identical in the SQL oracle — no libm dependence.

All scores are computed in float64 after casting the float32 vector
elements, with a sequential left-fold, so Spark and DuckDB agree to
the last bit (same op order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a, b) -> F.Column:
    """Sequential-fold float64 dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a) -> F.Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_cosine(joined: DataFrame, a: str = "emb_a", b: str = "emb_b") -> DataFrame:
    return joined.withColumn(
        "cosine",
        _dot(F.col(a), F.col(b))
        / F.sqrt(_norm2(F.col(a)) * _norm2(F.col(b))),
    )


def cosine_topk_brute(embeddings: DataFrame, probe_pred, k: int,
                      id_col: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Exact top-k neighbors for probe rows (``probe_pred`` selects
    them). Returns (probe_id, neighbor_id, rank). Ties break by
    neighbor_id; self-matches excluded."""
    probes = embeddings.where(probe_pred).select(
        F.col(id_col).alias("probe_id"), F.col(vec).alias("emb_a")
    )
    cands = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("emb_b")
    )
    scored = with_cosine(F.broadcast(probes).crossJoin(cands)).where(
        F.col("probe_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank")
    )


def plane_weight(j: int, d: int) -> float:
    """Deterministic rational hyperplane weight in [-1, 1]."""
    return ((j * 73856093 + d * 19349663) % 2001 - 1000) / 1000.0


def lsh_bucket_col(vec: str, dims: int, planes: int = N_PLANES) -> F.Column:
    """Bucket id: bit j = (w_j · v > 0). Native expression."""
    bucket = F.lit(0)
    for j in range(planes):
        dot = None
        for d in range(dims):
            w = plane_weight(j, d)
            term = F.element_at(F.col(vec), d + 1).cast("double") * F.lit(w)
            dot = term if dot is None else dot + term
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_bucket_sql(vec: str, dims: int, planes: int = N_PLANES) -> str:
    """DuckDB twin of :func:`lsh_bucket_col` (same op order)."""
    parts = []
    for j in range(planes):
        terms = " + ".join(
            f"CAST({vec}[{d + 1}] AS DOUBLE) * {plane_weight(j, d)!r}"
            for d in range(dims)
        )
        parts.append(f"CASE WHEN ({terms}) > 0 THEN {1 << j} ELSE 0 END")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def lsh_topk(embeddings: DataFrame, probe_pred, k: int, dims: int,
             id_col: str = "vec_id", vec: str = "embedding",
             planes: int = N_PLANES) -> DataFrame:
    """ANN top-k within the probe's LSH bucket (approximate: recall
    bounded by bucket collisions). Same output shape as brute."""
    bucketed = embeddings.withColumn("_bkt", lsh_bucket_col(vec, dims, planes))
    probes = bucketed.where(probe_pred).select(
        F.col(id_col).alias("probe_id"), F.col(vec).alias("emb_a"), "_bkt"
    )
    cands = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("emb_b"), "_bkt"
    )
    scored = with_cosine(probes.join(cands, "_bkt")).where(
        F.col("probe_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank")
    )


def embedding_near_dup_pairs(embeddings: DataFrame, dims: int,
                             threshold_pct: int = 99,
                             id_col: str = "vec_id", vec: str = "embedding",
                             planes: int = N_PLANES) -> DataFrame:
    """Embedding-cosine near-dup pairs within LSH buckets:
    (id_a, id_b) with cosine ≥ threshold_pct/100, id_a < id_b."""
    bucketed = embeddings.withColumn("_bkt", lsh_bucket_col(vec, dims, planes))
    a = bucketed.select(F.col(id_col).alias("id_a"), F.col(vec).alias("emb_a"), "_bkt")
    b = bucketed.select(F.col(id_col).alias("id_b"), F.col(vec).alias("emb_b"), "_bkt")
    return (
        with_cosine(a.join(b, "_bkt"))
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("cosine") >= F.lit(threshold_pct) / F.lit(100.0))
        )
        .select("id_a", "id_b")
        .distinct()
    )
