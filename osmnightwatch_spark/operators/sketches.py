"""Deterministic HyperLogLog distinct-count sketch.

Corpus profiling at 100 TB wants one-pass distinct estimates
(vocabulary size, unique URLs/users per shard) whose partial states
MERGE — per-partition, per-file, per-day sketches combine by register
max, so the operator composes with the catalog's incremental commits
(sketch the new files, max-merge with the stored sketch) instead of
re-scanning history. Spark's builtin ``approx_count_distinct`` is an
opaque HLL++ binary — its innards can't be reproduced by another
engine, so it can never be oracle-checked. This one is built from
first principles on the repo's determinism discipline:

* hash = first 15 hex chars of ``md5(value)`` → a 60-bit integer —
  60 (not 64) so the value stays positive and overflow-free in a
  signed BIGINT on BOTH engines (no two's-complement reinterpret
  games), bit-identical everywhere (the MinHash-family rationale);
* register index = top ``p`` bits; rank = leading-zero count of the
  low ``60-p`` bits + 1 (Flajolet et al. 2007 ρ), measured EXACTLY on
  the binary-string rendering (no float log2 near 2^52 precision
  cliffs);
* sketch = ``groupBy(register).max(rank)`` — ONE map-side-combining
  aggregation over ≤2^p groups, associative and order-free, so the
  sketch (and therefore the estimate) is bit-reproducible across
  partitionings, engines, and merge orders;
* estimate = the classic bias-corrected harmonic mean with the
  small-range linear-counting correction, evaluated from the exact
  integer registers in fixed register order.

The estimate is deterministic, not exact — accuracy is the standard
±1.04/√(2^p). The ORACLE comparison is exact anyway, because both
engines derive identical registers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

W = 60  # hash width in bits (15 hex chars: positive in BIGINT everywhere)


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """``(register, rank)`` — the ≤2^p-row sketch of distinct values
    of ``col``; registers no hash landed in are absent (both engines:
    GROUP BY emits only non-empty groups; the estimator treats absent
    as rank 0)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in 4..18, got {p}")
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10) \
        .cast("long")
    reg = F.shiftrightunsigned(h, W - p)
    suffix = h.bitwiseAND(F.lit((1 << (W - p)) - 1))
    # exact leading-zero count: render the (W-p)-bit tail as a fixed-
    # width binary string and measure its '0' prefix (string ops are
    # exact on both engines; float log2 is not, near 2^52)
    tail = F.substring(F.lpad(F.bin(suffix), W, "0"), p + 1, W - p)
    zeros = F.length(F.regexp_extract(tail, "^(0*)", 1))
    rank = F.least(zeros + 1, F.lit(W - p + 1)).cast("int")
    return (
        df.select(reg.alias("register"), rank.alias("rank"))
        .groupBy("register").agg(F.max("rank").alias("rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of register tables → max per register (associative,
    order-free). This is the whole incremental story: sketch the new
    files, max-merge with the stored sketch — never rescan history."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("rank").alias("rank"))


def hll_estimate(registers: list[tuple[int, int]], p: int = 12) -> float:
    """Driver-side estimate from (register, rank) rows: bias-corrected
    harmonic mean, linear counting below 2.5·m. Exact integer inputs,
    fixed ascending-register summation order → identical floats
    everywhere."""
    m = 1 << p
    ranks = {int(r): int(k) for r, k in registers}
    acc = 0.0
    for j in range(m):
        acc += 2.0 ** (-ranks.get(j, 0))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / acc
    zero = m - sum(1 for k in ranks.values() if k > 0)
    if est <= 2.5 * m and zero > 0:
        est = m * math.log(m / zero)
    return est


def hll_registers_sql(table: str, col: str, p: int = 12) -> str:
    """DuckDB twin of :func:`hll_registers` (same 60-bit md5 prefix,
    same register split, same string-measured rank)."""
    h = f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT)"
    reg = f"({h} >> {W - p})"
    suffix = f"({h} & {(1 << (W - p)) - 1})"
    tail = f"substr(lpad(bin({suffix}), {W}, '0'), {p + 1}, {W - p})"
    zeros = f"length(regexp_extract({tail}, '^(0*)', 1))"
    rank = f"LEAST({zeros} + 1, {W - p + 1})"
    return (
        f"SELECT {reg} AS register, CAST(MAX({rank}) AS INTEGER) AS rank "
        f"FROM {table} GROUP BY 1"
    )
