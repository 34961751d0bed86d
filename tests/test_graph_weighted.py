"""Triangle counting + weighted sampling invariants."""
import duckdb
import numpy as np
import pandas as pd

from osmnightwatch_spark.operators import sampling as SA
from osmnightwatch_spark.operators.graph import triangle_count, triangle_count_sql


def _tri(spark, edges):
    pdf = pd.DataFrame(edges, columns=["id_a", "id_b"])
    got = triangle_count(spark.createDataFrame(pdf)).collect()[0].n_triangles
    con = duckdb.connect(); con.register("edges_in", pdf)
    want = con.execute(
        triangle_count_sql("SELECT * FROM edges_in")).fetchone()[0]
    assert got == want, (got, want)
    return got


def test_triangle_hand_graphs(spark):
    # K4 has C(4,3) = 4 triangles; dups/self-loops/reversed edges ignored
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert _tri(spark, k4 + [(0, 0), (1, 1)]) == 4
    # a path graph has none
    assert _tri(spark, [(i, i + 1) for i in range(6)]) == 0
    # two disjoint triangles + a pendant edge
    assert _tri(spark, [(0, 1), (1, 2), (2, 0),
                        (10, 11), (11, 12), (12, 10), (12, 99)]) == 2


def test_triangle_random_vs_numpy(spark):
    rng = np.random.default_rng(13)
    n = 40
    adj = np.triu((rng.random((n, n)) < 0.2), 1)
    edges = [(int(i), int(j)) for i, j in zip(*np.nonzero(adj))]
    a = adj | adj.T
    expected = int(np.trace(np.linalg.matrix_power(a.astype(np.int64), 3)) // 6)
    assert _tri(spark, edges) == expected


def test_weighted_sample_nested_and_deterministic(spark):
    pdf = pd.DataFrame({
        "doc_id": range(500),
        "w": [0.0] * 50 + list(np.linspace(1, 100, 450)),
    })
    df = spark.createDataFrame(pdf)
    s10 = SA.weighted_sample(df, 10, "w").toPandas()
    s5 = SA.weighted_sample(df.repartition(7), 5, "w").toPandas()
    assert len(s10) == 10 and len(s5) == 5
    # zero-weight rows never sampled
    assert (s10.doc_id >= 50).all()
    # A-ES nesting: the 5-sample is exactly the top-5 prefix of the 10
    assert list(s5.doc_id) == list(s10.doc_id[:5])

    con = duckdb.connect(); con.register("t", pdf)
    want = con.execute(SA.weighted_sample_sql("t", 10, "w")).fetchdf()
    assert list(want.doc_id) == list(s10.doc_id)
    assert np.allclose(want.skey, s10.skey, rtol=0, atol=1e-15)


def test_weighted_sample_distribution(spark):
    """One dominant weight wins the n=1 draw for most hash salts: check
    the exact-math property instead — the heaviest row has the maximal
    key iff ln(u_h)/w_h beats every other, which the operator must
    reproduce from the twin exactly (already covered) — here assert a
    cheap sanity: expected inclusion rises with weight across a sweep
    of disjoint id blocks."""
    rows = []
    for blk in range(30):
        base = blk * 1000
        rows += [(base + i, 1.0) for i in range(20)] + [(base + 999, 50.0)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "w"])
    df = spark.createDataFrame(pdf)
    got = SA.weighted_sample(df, 30, "w").toPandas()
    heavy = (got.doc_id % 1000 == 999).sum()
    # 30 heavy rows hold 50/(50+20) = 71% of total weight; in a 30-of-630
    # draw heavies should dominate clearly (exact value is hash-pinned)
    assert heavy >= 15, heavy
