"""Mergeable quantile sketch: bucket-map exactness (numpy brute over
the integer domain), mergeability, extraction error bound, rejection
of sub-domain values."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osmnightwatch_spark.operators.qsketch import (qsketch,
                                                   qsketch_quantiles)

S = 3          # sub_bits used throughout
M = 1 << S


def _brute_bid(v):
    msb = int(v).bit_length() - 1
    k = max(0, msb - S)
    return k * M + (int(v) >> k)


def _brute_lo(bid):
    k = max(0, bid // M - 1)
    return (bid - k * M) << k


def test_bucket_map_matches_brute_and_lo_inverts(spark):
    rng = np.random.default_rng(4)
    vals = np.unique(np.concatenate([
        np.arange(1, 70),                              # small-value path
        2 ** np.arange(1, 40),                          # power boundaries
        2 ** np.arange(1, 40) - 1,
        rng.integers(1, 1 << 50, 300),
    ]))
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    out = qsketch(df, "v").collect()
    got = sorted(r.bid for r in out for _ in range(r.cnt))
    want = sorted(_brute_bid(v) for v in vals)
    assert got == want
    for bid in {r.bid for r in out}:
        lo = _brute_lo(bid)
        # lo is in the bucket, and is its smallest member
        assert _brute_bid(lo) == bid
        assert lo == 1 or _brute_bid(lo - 1) == bid - 1


def test_sketch_merges_and_rejects_subdomain(spark):
    rng = np.random.default_rng(8)
    a = pd.DataFrame({"v": rng.integers(-5, 10_000, 4000)})
    b = pd.DataFrame({"v": rng.integers(1, 1 << 30, 4000)})
    sk_a = qsketch(spark.createDataFrame(a), "v")
    sk_b = qsketch(spark.createDataFrame(b), "v")
    merged = (sk_a.unionByName(sk_b).groupBy("bid")
              .agg(F.sum("cnt").alias("cnt")))
    whole = qsketch(spark.createDataFrame(pd.concat([a, b])), "v")
    assert (sorted((r.bid, r.cnt) for r in merged.collect())
            == sorted((r.bid, r.cnt) for r in whole.collect()))
    # v < 1 rows dropped, not bucketed
    n_valid = int((a["v"] >= 1).sum()) + len(b)
    assert whole.agg(F.sum("cnt")).collect()[0][0] == n_valid


def test_quantile_error_bound_per_group(spark):
    rng = np.random.default_rng(15)
    frames = []
    for g, dist in (("a", rng.integers(1, 500, 5000)),
                    ("b", (rng.pareto(1.5, 5000) * 100 + 1).astype(np.int64)),
                    ("c", 2 ** rng.integers(0, 30, 5000))):
        frames.append(pd.DataFrame({"grp_in": g, "v": dist}))
    pdf = pd.concat(frames)
    df = spark.createDataFrame(pdf)
    sk = qsketch(df, "v", group="grp_in")
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    out = qsketch_quantiles(sk, qs, group="grp_in")
    est = {(r.grp, r.q): r.v_est for r in out.collect()}
    for g in ("a", "b", "c"):
        vals = np.sort(pdf[pdf["grp_in"] == g]["v"].to_numpy())
        for q in qs:
            true = int(vals[int(np.ceil(q * len(vals))) - 1])
            e = est[(g, q)]
            assert e <= true, (g, q, e, true)
            # true lies inside the hit bucket → bounded relative error
            assert true < e + max(1, (e >> S) + 1) * 2 or \
                _brute_bid(true) == _brute_bid(e)


def test_ungrouped_and_determinism(spark):
    rng = np.random.default_rng(23)
    pdf = pd.DataFrame({"v": rng.integers(1, 10**9, 8000)})
    df = spark.createDataFrame(pdf)
    a = sorted((r.q, r.v_est) for r in
               qsketch_quantiles(qsketch(df, "v"), [0.5, 0.9]).collect())
    b = sorted((r.q, r.v_est) for r in
               qsketch_quantiles(qsketch(df.repartition(13), "v"),
                                 [0.5, 0.9]).collect())
    assert a == b and len(a) == 2


def test_qsketch_rejects_non_integral_value(spark):
    """ADVICE r5: Spark CAST(double AS LONG) truncates, DuckDB rounds
    half-to-even — a double-typed value column must raise, not build
    engine-divergent sketches."""
    import pytest

    df = spark.createDataFrame(
        pd.DataFrame({"v": [1.5, 2.5, 3.0]}))
    with pytest.raises(TypeError, match="integral"):
        qsketch(df, "v")
