"""Property-based tests (hypothesis) for the sampling/packing pure
kernels — no Spark session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from osmnightwatch_spark.operators.knn import auto_res
from osmnightwatch_spark.operators.sampling import HASH_WIDTH, _keep_threshold


@settings(max_examples=200, deadline=None)
@given(f=st.floats(0.0, 1.0, allow_nan=False))
def test_keep_threshold_width_and_range(f):
    """Thresholds compare correctly against HASH_WIDTH-char hex: always
    same width (or the keep-all sentinel), lexicographically ordered
    with the hex alphabet."""
    t = _keep_threshold(f)
    if t == "g":
        assert round(f * 16 ** HASH_WIDTH) >= 16 ** HASH_WIDTH
    else:
        assert len(t) == HASH_WIDTH and int(t, 16) == round(f * 16 ** HASH_WIDTH)
    assert _keep_threshold(0.0) <= t <= "g"


@settings(max_examples=200, deadline=None)
@given(a=st.floats(0.0, 1.0), b=st.floats(0.0, 1.0))
def test_keep_threshold_monotone(a, b):
    """Larger fraction → superset sample: threshold strings order the
    same way the fractions do (string compare == numeric compare)."""
    lo, hi = sorted([a, b])
    assert _keep_threshold(lo) <= _keep_threshold(hi)


@settings(max_examples=200, deadline=None)
@given(n=st.integers(1, 10**13), k=st.integers(1, 1000))
def test_auto_res_bounds_and_monotone(n, k):
    r = auto_res(n, k)
    assert 2 <= r <= 14
    assert auto_res(n * 64, k) >= r      # more candidates → finer grid
    assert auto_res(n, min(1000, k * 64)) <= r  # bigger k → coarser grid


def test_dsir_selects_target_like_docs_and_matches_twin(spark):
    """DSIR sanity on a planted corpus: raw docs that share the
    target's vocabulary must out-rank vocabulary-disjoint junk; the
    SQL twin agrees row-for-row; repartitioning changes nothing."""
    import duckdb

    from osmnightwatch_spark.operators.dsir import (dsir_sample,
                                                    dsir_sample_sql)

    target_rows = [(1000 + i, "alpha beta gamma delta epsilon") for i in range(6)]
    like = [(i, "alpha beta gamma zeta") for i in range(8)]           # target-like
    junk = [(100 + i, "qqq www eee rrr ttt yyy") for i in range(8)]   # disjoint
    raw_rows = like + junk
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")

    got = dsir_sample(raw, target, m=8).toPandas()
    assert set(got.doc_id) == {i for i, _ in like}  # junk never wins

    # twin agreement (counts, weights, Gumbel keys, tiebreak)
    con = duckdb.connect()
    con.execute("CREATE TABLE rawt (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO rawt VALUES (?, ?)", raw_rows)
    con.execute("CREATE TABLE tgt (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tgt VALUES (?, ?)", target_rows)
    exp = con.execute(dsir_sample_sql(
        "SELECT * FROM rawt", "SELECT * FROM tgt", m=8)).fetchdf()
    g = got.sort_values("doc_id").reset_index(drop=True)
    x = exp.sort_values("doc_id").reset_index(drop=True)
    assert list(g.doc_id) == list(x.doc_id)
    assert list(g.dsir_logw_q) == list(x.dsir_logw_q)  # exact integers
    assert (g.skey - x.skey).abs().max() < 1e-9

    again = dsir_sample(raw.repartition(7), target.repartition(5),
                        m=8).toPandas().sort_values("doc_id")
    assert list(again.dsir_logw_q) == list(g.dsir_logw_q)


def test_geo_balanced_sample_caps_cells_deterministically(spark):
    """Cap respected in every cell, under-full cells kept whole,
    membership repartition-stable, twin row-identical."""
    import duckdb

    from osmnightwatch_spark.operators.sampling import (
        geo_balanced_sample, geo_balanced_sample_sql)

    # 40 ids piled into one cell + 3 ids in another
    rows = [(i, 10.0 + (i % 7) * 0.01, 10.0) for i in range(40)]
    rows += [(100 + i, -120.0, -40.0) for i in range(3)]
    df = spark.createDataFrame(rows, "image_id long, lon double, lat double")
    got = geo_balanced_sample(df, res=4, per_cell=5).toPandas()
    per = got.groupby("cell").size()
    assert per.max() == 5 and per.min() == 3 and len(per) == 2
    assert (got.cell_rank <= 5).all()

    again = geo_balanced_sample(df.repartition(9), res=4,
                                per_cell=5).toPandas()
    assert sorted(again.image_id) == sorted(got.image_id)

    con = duckdb.connect()
    con.execute("CREATE TABLE p (image_id BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
    exp = con.execute(geo_balanced_sample_sql(
        "SELECT * FROM p", res=4, per_cell=5)).fetchdf()
    g = got.sort_values("image_id").reset_index(drop=True)
    x = exp.sort_values("image_id").reset_index(drop=True)
    assert list(g.image_id) == list(x.image_id)
    assert list(g.cell) == list(x.cell)
    assert list(g.cell_rank) == list(x.cell_rank)
