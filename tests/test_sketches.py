"""HyperLogLog sketch invariants."""
import duckdb
import pandas as pd
import pytest

from osmnightwatch_spark.operators import sketches as SK


def test_hll_registers_match_twin_and_merge(spark):
    """Spark and DuckDB derive identical registers; sketching two
    halves and max-merging equals sketching the whole (the mergeable
    property the incremental story rests on)."""
    pdf = pd.DataFrame({"v": [f"item{i}" for i in range(5000)]})
    df = spark.createDataFrame(pdf)
    whole = (SK.hll_registers(df, "v", p=8)
             .orderBy("register").toPandas())

    con = duckdb.connect(); con.register("t", pdf)
    twin = con.execute(SK.hll_registers_sql("t", "v", p=8)
                       + " ORDER BY register").fetchdf()
    pd.testing.assert_frame_equal(
        whole.astype({"register": "int64", "rank": "int32"}),
        twin.astype({"register": "int64", "rank": "int32"}),
        check_names=False)

    h1 = SK.hll_registers(df.where("v < 'item3'"), "v", p=8)
    h2 = SK.hll_registers(df.where("v >= 'item3'"), "v", p=8)
    merged = (SK.hll_merge(h1, h2).orderBy("register").toPandas())
    pd.testing.assert_frame_equal(whole, merged)


def test_hll_estimate_accuracy_and_duplicates(spark):
    """Estimate within 5 std errors of truth at p=10; duplicates
    change nothing (sketch is a pure function of the distinct set)."""
    vals = [f"u{i}" for i in range(20000)]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    dup = spark.createDataFrame(pd.DataFrame({"v": vals * 2}))
    r1 = SK.hll_registers(df, "v", p=10).collect()
    r2 = SK.hll_registers(dup, "v", p=10).collect()
    assert sorted((x.register, x.rank) for x in r1) == \
           sorted((x.register, x.rank) for x in r2)
    est = SK.hll_estimate([(x.register, x.rank) for x in r1], p=10)
    rel_err = abs(est - 20000) / 20000
    assert rel_err < 5 * 1.04 / (2 ** 5), rel_err   # 5 sigma at m=1024


def test_hll_p_bounds(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": ["a"]}))
    with pytest.raises(ValueError):
        SK.hll_registers(df, "v", p=3)
    with pytest.raises(ValueError):
        SK.hll_registers(df, "v", p=19)
