"""Mergeable quantile sketch: HDR-style log buckets with ``sub_bits``
sub-bucket precision, exact integer arithmetic end to end.

Reference ancestry: the reference tracks per-analyzer issue-count
distributions across minutes to decide "unusually large diff" (the
catch-up ladder's size heuristic, ``CatchupReplicationDiffEnumerator
.cs``); a mergeable quantile sketch is that primitive done right — and
for a training-data pipeline it is the standard corpus profiler
(doc-length / token-count / score quantiles per language or source)
whose per-partition sketches merge without re-scanning.

Why not approx_percentile / t-digest / KLL: all are order- or
float-sensitive, so Spark and an independent engine disagree in the
last ulp and the driver's exact hash can never pin them. The HDR
bucket map is a pure integer function of the VALUE:

    k   = max(0, msb(v) − sub_bits)
    bid = k·2^sub_bits + (v >> k)            (monotonic in v)
    lo(bid) = (bid − k·2^sub_bits) << k      (exact bucket lower bound)

so the sketch — (bid, cnt) per group — is exact, order-free,
partition-free, and merges by summing counts. Quantile extraction
returns the exact lower bound of the hit bucket; relative error
< 2^−sub_bits by construction. ``msb`` is computed WITHOUT floating
log (hex-string length + a first-digit CASE — both engines render hex
of positive BIGINT identically, uppercase and unpadded), because
``floor(log2(v))`` is libm-dependent at bucket edges.

Domain: v ≥ 1 integers (map reals to a fixed-point grid first; rows
with v < 1 are REJECTED by filter, not silently bucketed).

Scale shape: the sketch is ONE map-side-combining aggregate on
(group, bid) — ≤ (64 − sub_bits + 1)·2^sub_bits buckets per group
(~500 at sub_bits=3) regardless of row count; extraction runs windows
over the tiny bucket table and joins it to a broadcast literal
quantile list — no sort of the data, no second pass over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _msb_spark_sql(v: str) -> str:
    """msb(v) for v ≥ 1 as a Spark-SQL string — hex digits, no libm."""
    hx = f"hex(CAST({v} AS BIGINT))"
    c = f"substring({hx}, 1, 1)"
    d = (f"(CASE WHEN {c} = '1' THEN 0 "
         f"WHEN {c} IN ('2','3') THEN 1 "
         f"WHEN {c} IN ('4','5','6','7') THEN 2 ELSE 3 END)")
    return f"((length({hx}) - 1) * 4 + {d})"


def _msb_duck_sql(v: str) -> str:
    """Same formula in DuckDB spelling (to_hex/substr)."""
    hx = f"to_hex(CAST({v} AS BIGINT))"
    c = f"substr({hx}, 1, 1)"
    d = (f"(CASE WHEN {c} = '1' THEN 0 "
         f"WHEN {c} IN ('2','3') THEN 1 "
         f"WHEN {c} IN ('4','5','6','7') THEN 2 ELSE 3 END)")
    return f"((length({hx}) - 1) * 4 + {d})"


def qsketch(df: DataFrame, value: str, group: str | None = None,
            sub_bits: int = 3) -> DataFrame:
    """``(grp?, bid, cnt)`` — the mergeable sketch (merge = groupBy the
    same keys, sum cnt). Rows with value < 1 are dropped.

    Domain (enforced, ADVICE r5): ``value`` must be an integral
    column. A double column would silently diverge between engines —
    Spark ``CAST(double AS LONG)`` truncates while DuckDB rounds
    half-to-even — so non-integral dtypes raise instead."""
    from pyspark.sql import types as _T

    dt = df.schema[value].dataType
    if not isinstance(dt, (_T.ByteType, _T.ShortType, _T.IntegerType,
                           _T.LongType)):
        raise TypeError(
            f"qsketch value column {value!r} must be integral, got {dt}"
            " (Spark casts doubles by truncation, DuckDB by rounding —"
            " floor() explicitly first)")
    m = 1 << sub_bits
    k = f"GREATEST(0, {_msb_spark_sql(value)} - {sub_bits})"
    bid = (f"CAST({k} AS BIGINT) * {m}"
           f" + shiftright(CAST({value} AS BIGINT), CAST({k} AS INT))")
    src = df.where(F.col(value).cast("long") >= 1)
    keys = ([F.col(group).alias("grp")] if group else []) + [
        F.expr(bid).alias("bid")]
    return src.groupBy(*keys).agg(F.count("*").alias("cnt"))


def qsketch_sql(src_sql: str, value: str, group: str | None = None,
                sub_bits: int = 3) -> str:
    """DuckDB twin of :func:`qsketch` (same integer formula)."""
    m = 1 << sub_bits
    k = f"GREATEST(0, {_msb_duck_sql(value)} - {sub_bits})"
    bid = (f"(CAST({k} AS BIGINT) * {m}"
           f" + (CAST({value} AS BIGINT) >> {k}))")
    g = f"{group} AS grp, " if group else ""
    gb = "grp, bid" if group else "bid"
    return f"""
SELECT {g}{bid} AS bid, CAST(COUNT(*) AS BIGINT) AS cnt
FROM ({src_sql}) WHERE CAST({value} AS BIGINT) >= 1
GROUP BY {gb}
""".strip()


_LO_SQL = ("shiftleft(bid - GREATEST(0, CAST(bid DIV {m} AS BIGINT) - 1)"
           " * {m}, CAST(GREATEST(0, CAST(bid DIV {m} AS BIGINT) - 1)"
           " AS INT))")


def qsketch_quantiles(sketch: DataFrame, qs: list[float],
                      group: str | None = None,
                      sub_bits: int = 3) -> DataFrame:
    """``(grp?, q, v_est)`` — for each requested quantile q, the exact
    lower bound of the first bucket whose cumulative count reaches
    ceil(q·total). Underestimates by < 2^−sub_bits relative."""
    from pyspark.sql import Window

    m = 1 << sub_bits
    gcols = ["grp"] if group else []
    w = (Window.partitionBy(*gcols) if group
         else Window.partitionBy(F.lit(1)))
    cum = sketch.select(
        *gcols, "bid", "cnt",
        F.sum("cnt").over(w.orderBy("bid").rowsBetween(
            Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(w).alias("total"),
    )
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double")
    hit = (cum.join(F.broadcast(qdf),
                    F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
           .groupBy(*gcols, "q").agg(F.min("bid").alias("bid")))
    return hit.select(*gcols, "q",
                      F.expr(_LO_SQL.format(m=m)).alias("v_est"))


def qsketch_quantiles_sql(sketch_sql: str, qs: list[float],
                          group: str | None = None,
                          sub_bits: int = 3) -> str:
    """DuckDB twin of :func:`qsketch_quantiles` (same cum/total windows
    over the same bucket rows; `//` ≡ DIV on the non-negative bids)."""
    m = 1 << sub_bits
    g = "grp, " if group else ""
    pb = "PARTITION BY grp" if group else ""
    qvals = ", ".join(f"({float(q)!r})" for q in qs)
    k = f"GREATEST(0, CAST(bid // {m} AS BIGINT) - 1)"
    lo = f"((bid - {k} * {m}) << {k})"
    return f"""
WITH _qs_s AS ({sketch_sql}),
_qs_c AS (
  SELECT {g}bid, cnt,
         SUM(cnt) OVER ({pb + ' ' if pb else ''}ORDER BY bid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER ({pb}) AS total
  FROM _qs_s
),
_qs_q AS (SELECT CAST(qv AS DOUBLE) AS q FROM (VALUES {qvals}) AS _qsv(qv)),
_qs_hit AS (
  SELECT {g}q, MIN(bid) AS bid
  FROM _qs_c JOIN _qs_q ON cum >= CEIL(q * total)
  GROUP BY {g}q
)
SELECT {g}q, CAST({lo} AS BIGINT) AS v_est FROM _qs_hit
""".strip()
