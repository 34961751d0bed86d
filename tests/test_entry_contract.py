"""Driver-contract smoke: entry() runs, queries()/oracle_sql() keys
line up, and a fast subset cross-checks against DuckDB at sf0.001
(the full sweep runs in tools/compare_oracle.py and in the driver)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
FAST = [
    "agg_pricing", "version_compaction", "cell_encode_counts",
    "pip_rect_join", "knn_events", "jaccard_topk", "cosine_topk",
]


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert {"polygon_id", "tile", "n_images"} <= set(df.columns)


def test_oracle_keys_subset():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # round 2: EVERY query has a SQL twin (assembly/coastline via
    # embedded VALUES corpora, the flagship via events geotags, the
    # golden corpus via DuckDB's own JSON reader)
    assert set(qs) == set(os_)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, name):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = E.queries()[name](spark, SF).toPandas()
    exp = con.execute(E.oracle_sql()[name]).fetchdf()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].round(9)
            if pd.api.types.is_bool_dtype(df[c]):
                df[c] = df[c].astype(int)
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    g, x = norm(got), norm(exp)
    assert list(g.columns) == list(x.columns)
    pd.testing.assert_frame_equal(g, x, check_dtype=False, rtol=1e-9, atol=1e-9)
