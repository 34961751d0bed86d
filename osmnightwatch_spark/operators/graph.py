"""Graph statistics over pair outputs: exact triangle counting.

The near-dup families (`operators/dedup`) and the spatial joins
(`operators/range_join`) both emit *pair graphs*; triangle count /
clustering structure is the standard next question asked of them
(how clique-ish are the near-dup neighborhoods? is the spatial graph
percolating?). Reference analog: the endpoint-degree aggregate of
``BrokenCoastlineAnalyzer.cs`` (node-local structure) taken one hop
further (closed wedges).

Algorithm: **degree-ordered orientation** (the classic MapReduce
triangle count — Suri & Vassilvitskii, WWW'11): orient every
undirected edge from the endpoint with smaller ``(degree, id)`` to
the larger; every triangle then has exactly ONE vertex with two
out-edges (its minimum under the order), so counting
wedge-closures over out-edges counts each triangle exactly once.
The orientation bounds out-degree by O(√m) — the wedge join's
fan-out is O(m^1.5) worst case instead of Σdeg², which is what a
hub node (a viral image posted everywhere) would otherwise inflate
into a cross-join. Shape: one degree agg, one wedge self-join on the
source, one closing equi-join — three shuffles total, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(pairs: DataFrame) -> DataFrame:
    """Undirected (id_a, id_b) pairs → edges directed by ascending
    ``(degree, id)``, each edge once, endpoints carried with their
    order key as a struct: ``(src, dst, ks, kd)``."""
    e = (
        pairs.select(F.least("id_a", "id_b").alias("lo"),
                     F.greatest("id_a", "id_b").alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    sym = e.select(F.col("lo").alias("n"), F.col("hi").alias("m")).unionByName(
        e.select(F.col("hi").alias("n"), F.col("lo").alias("m")))
    deg = sym.groupBy("n").agg(F.count("*").alias("d"))
    withk = (
        e.join(deg.select(F.col("n").alias("lo"), F.col("d").alias("dlo")), "lo")
        .join(deg.select(F.col("n").alias("hi"), F.col("d").alias("dhi")), "hi")
        .select(
            "lo", "hi",
            F.struct(F.col("dlo").alias("d"), F.col("lo").alias("i")).alias("klo"),
            F.struct(F.col("dhi").alias("d"), F.col("hi").alias("i")).alias("khi"),
        )
    )
    fwd = withk.where(F.col("klo") < F.col("khi")).select(
        F.col("lo").alias("src"), F.col("hi").alias("dst"),
        F.col("klo").alias("ks"), F.col("khi").alias("kd"))
    rev = withk.where(F.col("khi") < F.col("klo")).select(
        F.col("hi").alias("src"), F.col("lo").alias("dst"),
        F.col("khi").alias("ks"), F.col("klo").alias("kd"))
    return fwd.unionByName(rev)


def triangle_count(pairs: DataFrame) -> DataFrame:
    """Exact global triangle count of the undirected pair graph →
    one row ``(n_triangles)``. Input pairs may carry duplicates or
    self-loops; both are dropped (canonicalized) first."""
    o = _oriented(pairs)
    wedges = (
        o.select(F.col("src"), F.col("dst").alias("v"), F.col("kd").alias("kv"))
        .join(o.select(F.col("src"), F.col("dst").alias("w"),
                       F.col("kd").alias("kw")), "src")
        .where(F.col("kv") < F.col("kw"))
        .select(F.col("v").alias("src"), F.col("w").alias("dst"))
    )
    # inner join on the closing edge: (src, dst) is unique in o, so
    # each wedge matches at most once and each triangle counts once
    closed = wedges.join(o.select("src", "dst"), ["src", "dst"])
    return closed.agg(F.count("*").alias("n_triangles"))


def triangle_count_sql(pairs_sql: str) -> str:
    """DuckDB twin: identical canonicalization, degree keys, and
    orientation via row-value comparison."""
    return f"""
WITH p AS ({pairs_sql}),
e AS (
  SELECT DISTINCT LEAST(id_a, id_b) AS lo, GREATEST(id_a, id_b) AS hi
  FROM p WHERE id_a <> id_b),
deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT lo AS n FROM e UNION ALL SELECT hi AS n FROM e) GROUP BY n),
o AS (
  SELECT CASE WHEN (dl.d, e.lo) < (dh.d, e.hi) THEN e.lo ELSE e.hi END AS src,
         CASE WHEN (dl.d, e.lo) < (dh.d, e.hi) THEN e.hi ELSE e.lo END AS dst,
         CASE WHEN (dl.d, e.lo) < (dh.d, e.hi) THEN dh.d ELSE dl.d END AS dd,
         CASE WHEN (dl.d, e.lo) < (dh.d, e.hi) THEN e.hi ELSE e.lo END AS di
  FROM e JOIN deg dl ON dl.n = e.lo JOIN deg dh ON dh.n = e.hi),
wedges AS (
  SELECT a.dst AS src, b.dst AS dst
  FROM o a JOIN o b ON a.src = b.src
  WHERE (a.dd, a.di) < (b.dd, b.di))
SELECT COUNT(*) AS n_triangles
FROM wedges w JOIN o ON o.src = w.src AND o.dst = w.dst
""".strip()
