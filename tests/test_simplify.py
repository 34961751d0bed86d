"""Polyline simplification invariants (snap + Douglas-Peucker)."""
import duckdb
import numpy as np
import pandas as pd

from osmnightwatch_spark.operators import simplify as SY


def _track(way, pts):
    return [(way, i, float(x), float(y)) for i, (x, y) in enumerate(pts)]


def test_snap_collapses_runs_and_matches_twin(spark):
    rows = _track(1, [(0.01, 0.01), (0.02, 0.02), (20.0, 0.0), (20.1, 0.1),
                      (0.015, 0.015)])       # cells: A A B B A
    rows += _track(2, [(5.0, 5.0)])           # single-point way
    pdf = pd.DataFrame(rows, columns=["way_id", "seq", "lon", "lat"])
    got = (SY.snap_simplify(spark.createDataFrame(pdf), res=5)
           .orderBy("way_id", "seq_out").toPandas())
    # way 1 collapses A A B B A -> A B A (revisits survive)
    assert list(got[got.way_id == 1].seq_out) == [0, 1, 2]
    assert len(got[got.way_id == 2]) == 1

    con = duckdb.connect(); con.register("p", pdf)
    want = con.execute(SY.snap_simplify_sql("SELECT * FROM p", res=5)
                       + " ORDER BY way_id, seq_out").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"way_id": "int64", "seq_out": "int64"}),
        want.astype({"way_id": "int64", "seq_out": "int64"}),
        check_names=False)


def test_dp_simplify_deviation_bound_and_endpoints(spark):
    """DP output: endpoints exact, every dropped point within epsilon
    of the simplified line (verified by brute point-to-segment
    distance), near-collinear wiggle collapses to 2 points."""
    rng = np.random.default_rng(9)
    xs = np.linspace(0, 10, 60)
    ys = np.sin(xs) + rng.normal(scale=0.01, size=60)
    pdf = pd.DataFrame(_track(7, list(zip(xs, ys))),
                       columns=["way_id", "seq", "lon", "lat"])
    eps = 0.25
    got = (SY.dp_simplify(spark.createDataFrame(pdf), eps)
           .orderBy("seq_out").toPandas())
    assert (got.lon.iloc[0], got.lat.iloc[0]) == (xs[0], ys[0])
    assert (got.lon.iloc[-1], got.lat.iloc[-1]) == (xs[-1], ys[-1])
    assert 2 < len(got) < 60
    # brute deviation check of every original point vs kept polyline
    kept = got[["lon", "lat"]].to_numpy()
    for x, y in zip(xs, ys):
        d2 = []
        for (ax, ay), (bx, by) in zip(kept[:-1], kept[1:]):
            dx, dy = bx - ax, by - ay
            t = ((x - ax) * dx + (y - ay) * dy) / (dx * dx + dy * dy)
            t = min(1.0, max(0.0, t))
            d2.append((x - (ax + t * dx)) ** 2 + (y - (ay + t * dy)) ** 2)
        assert min(d2) <= eps * eps + 1e-12

    # nearly-straight line at huge epsilon -> endpoints only
    flat = pd.DataFrame(_track(8, [(i, 0.001 * (i % 2)) for i in range(20)]),
                        columns=["way_id", "seq", "lon", "lat"])
    g2 = SY.dp_simplify(spark.createDataFrame(flat), 1.0).toPandas()
    assert len(g2) == 2


def test_dp_deterministic_under_repartition(spark):
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        [(w, i, float(rng.uniform(-50, 50)), float(rng.uniform(-50, 50)))
         for w in range(6) for i in range(40)],
        columns=["way_id", "seq", "lon", "lat"])
    df = spark.createDataFrame(pdf)
    a = (SY.dp_simplify(df, 3.0).orderBy("way_id", "seq_out").toPandas())
    b = (SY.dp_simplify(df.repartition(11), 3.0)
         .orderBy("way_id", "seq_out").toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_snap_boundary_vertices_clamped(spark):
    """lon=180 / lat=90 floor to grid index n — the center must clamp
    to the last cell (consistent with the dedup cell), never emit
    lat > 90 / lon > 180."""
    import duckdb

    from osmnightwatch_spark.operators.simplify import (snap_simplify,
                                                        snap_simplify_sql)

    pts = spark.createDataFrame(
        [(1, 0, 180.0, 90.0), (1, 1, -180.0, -90.0), (1, 2, 179.9, 89.9)],
        "way_id long, seq long, lon double, lat double")
    out = snap_simplify(pts, res=3).collect()
    assert all(-180.0 <= r.lon <= 180.0 and -90.0 <= r.lat <= 90.0
               for r in out)
    # (180, 90) and (179.9, 89.9) share the clamped last cell -> the
    # run collapses to its first vertex; (-180, -90) survives between
    assert len(out) == 3
    sql = snap_simplify_sql(
        "SELECT * FROM (VALUES (1, 0, 180.0, 90.0), (1, 1, -180.0, -90.0), "
        "(1, 2, 179.9, 89.9)) AS t(way_id, seq, lon, lat)", res=3)
    exp = duckdb.sql(sql).fetchall()
    assert sorted((r.way_id, r.seq_out, r.lon, r.lat) for r in out) == \
        sorted(exp)


def test_dp_twin_fixpoint_and_kernel_equality(spark):
    """The unrolled BFS twin must have CONVERGED at the pinned round
    count (rounds vs rounds+1 identical — otherwise the oracle is a
    truncation, not DP) and equal the numpy kernel bit-for-bit."""
    import duckdb

    from osmnightwatch_spark.operators.simplify import (dp_simplify,
                                                        dp_simplify_sql)

    # jagged deterministic track: enough nested splits to need depth
    vals = ", ".join(
        f"(1, {i}, {(i * 37 % 101) / 3.0!r}, {(i * 53 % 89) / 4.0!r})"
        for i in range(120))
    # CAST: DuckDB types VALUES decimals as DECIMAL, whose squares
    # overflow — the real query reads parquet DOUBLEs
    src = (f"SELECT way_id, seq, CAST(lon AS DOUBLE) AS lon, "
           f"CAST(lat AS DOUBLE) AS lat "
           f"FROM (VALUES {vals}) AS t(way_id, seq, lon, lat)")
    eps = 1.5
    a = duckdb.sql(dp_simplify_sql(src, eps, rounds=18)).fetchall()
    b = duckdb.sql(dp_simplify_sql(src, eps, rounds=19)).fetchall()
    assert sorted(a) == sorted(b)  # fixpoint reached by 18

    pts = spark.createDataFrame(
        [(1, i, (i * 37 % 101) / 3.0, (i * 53 % 89) / 4.0)
         for i in range(120)],
        "way_id long, seq long, lon double, lat double")
    got = sorted((r.way_id, r.seq_out, r.lon, r.lat)
                 for r in dp_simplify(pts, eps).collect())
    assert got == sorted(a)
