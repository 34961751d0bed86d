"""IDW interpolation + path length invariants."""
import duckdb
import math

import pandas as pd

from osmnightwatch_spark.operators import geo_stats as G


def test_idw_hand_computed(spark):
    """One probe, two neighbors at known distances: est equals the
    hand-computed quantized ratio; the coincident point (dist 0) and
    the out-of-radius point are excluded."""
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": [1], "lon": [0.0], "lat": [0.0]}))
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [10, 11, 12, 13],
        "lon": [1.0, 0.0, 0.0, 50.0],
        "lat": [0.0, 2.0, 0.0, 50.0],      # d=1, d=2, d=0 (excl), far (excl)
        "value": [10.0, 20.0, 999.0, 999.0],
    }))
    got = G.idw_surface(probes, pts, radius=3.0).toPandas()
    assert len(got) == 1 and got.n_nbrs[0] == 2
    w1, w2 = math.floor(1e6 / 1.0), math.floor(1e6 / 4.0)
    wv1, wv2 = math.floor(1e6 * 10.0 / 1.0), math.floor(1e6 * 20.0 / 4.0)
    assert got.w_den[0] == w1 + w2 and got.wv_num[0] == wv1 + wv2
    assert got.est[0] == (wv1 + wv2) / (w1 + w2)


def test_idw_matches_twin_random(spark):
    import numpy as np
    rng = np.random.default_rng(11)
    ppdf = pd.DataFrame({"probe_id": range(20),
                         "lon": rng.uniform(-20, 20, 20),
                         "lat": rng.uniform(-20, 20, 20)})
    tpdf = pd.DataFrame({"point_id": range(300),
                         "lon": rng.uniform(-25, 25, 300),
                         "lat": rng.uniform(-25, 25, 300),
                         "value": rng.normal(50, 10, 300)})
    got = (G.idw_surface(spark.createDataFrame(ppdf),
                         spark.createDataFrame(tpdf), radius=5.0)
           .orderBy("probe_id").toPandas())
    con = duckdb.connect()
    con.register("pr", ppdf); con.register("pt", tpdf)
    want = con.execute(G.idw_surface_sql(
        "SELECT * FROM pr", "SELECT * FROM pt", radius=5.0)
        + " ORDER BY probe_id").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"probe_id": "int64", "n_nbrs": "int64",
                    "w_den": "int64", "wv_num": "int64"}),
        want.astype({"probe_id": "int64", "n_nbrs": "int64",
                     "w_den": "int64", "wv_num": "int64"}),
        check_names=False)


def test_path_length_hand_and_ties(spark):
    """Known two-hop path sums exactly; simultaneous fixes order by
    the event_id tiebreak; single-point users emit 0."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 3, 3],
        "ts": [t0, t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=2),
               t0, t0, t0],                      # user 3: tie on ts
        "event_id": [1, 2, 3, 4, 6, 5],
        "lon": [0.0, 1.0, 1.0, 9.0, 10.0, 0.0],
        "lat": [0.0, 0.0, 1.0, 9.0, 0.0, 0.0],
    })
    got = (G.path_length(spark.createDataFrame(pdf))
           .orderBy("user_id").toPandas().set_index("user_id"))
    # user 1: 1 deg lon at equator + 1 deg lat; each 111.19 km
    deg_mm = 111194926  # floor(radians(1)*R*1000) hops share this
    assert got.loc[1, "n_points"] == 3
    assert abs(got.loc[1, "path_mm"] - 2 * deg_mm) < 2
    assert got.loc[2, "n_points"] == 1 and got.loc[2, "path_mm"] == 0
    # user 3 ordered by event_id: (0,0) -> (10,0) = 10 deg, not 0
    assert abs(got.loc[3, "path_mm"] - 10 * deg_mm) < 10

    con = duckdb.connect(); con.register("ev", pdf)
    want = con.execute(G.path_length_sql("SELECT * FROM ev")
                       + " ORDER BY user_id").fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index().astype({"user_id": "int64", "n_points": "int64",
                                  "path_mm": "int64"}),
        want.astype({"user_id": "int64", "n_points": "int64",
                     "path_mm": "int64"}),
        check_names=False)


def test_stay_points_hand_corpus(spark):
    """Planted visits: a 2-hour same-cell dwell is detected with exact
    enter/exit; a gap larger than gap_s splits the visit; a
    below-min-stay dwell and a moving track emit nothing."""
    import datetime as dt

    from osmnightwatch_spark.operators.geo_stats import (
        stay_points, stay_points_sql)

    t0 = dt.datetime(2024, 3, 1)

    def at(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = []
    # user 1: dwell at (10,10) 0..120 min (4 fixes), then far away
    rows += [(1, at(m), 100 + m, 10.0, 10.0) for m in (0, 40, 80, 120)]
    rows += [(1, at(200), 400, 120.0, 40.0)]
    # user 2: same cell but a 2h gap splits it -> two sub-30min visits
    rows += [(2, at(0), 500, -30.0, -30.0), (2, at(10), 501, -30.0, -30.0),
             (2, at(130), 502, -30.0, -30.0), (2, at(140), 503, -30.0, -30.0)]
    # user 3: constant motion across cells
    rows += [(3, at(10 * i), 600 + i, -170.0 + 20.0 * i, 0.0)
             for i in range(6)]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                      "lon", "lat"])
    got = (stay_points(spark.createDataFrame(pdf), res=6, gap_s=3600,
                       min_stay_s=1800)
           .orderBy("user_id", "enter_ts").toPandas())
    assert list(got.user_id) == [1]
    assert got.n_events[0] == 4
    assert got.enter_ts[0] == at(0) and got.exit_ts[0] == at(120)

    con = duckdb.connect(); con.register("p", pdf)
    want = con.execute(stay_points_sql("SELECT * FROM p", res=6,
                                       gap_s=3600, min_stay_s=1800)
                       + " ORDER BY user_id, enter_ts").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"user_id": "int64", "cell": "int64",
                    "n_events": "int64"}),
        want.astype({"user_id": "int64", "cell": "int64",
                     "n_events": "int64"}),
        check_names=False)


def test_od_matrix_hand_corpus(spark):
    """Two users commuting A->B->A: trips counted directionally,
    same-cell consecutive stays excluded, n_entities distinct."""
    import datetime as dt

    from osmnightwatch_spark.operators.geo_stats import (
        od_matrix, od_matrix_sql)

    t0 = dt.datetime(2024, 3, 1)

    def dwell(user, base_min, x, y, eid0):
        return [(user, t0 + dt.timedelta(minutes=base_min + m), eid0 + m,
                 x, y) for m in (0, 40)]

    rows = []
    for u, eid in ((1, 100), (2, 200)):
        rows += dwell(u, 0, 10.0, 10.0, eid)        # A
        rows += dwell(u, 120, 50.0, 20.0, eid + 10)  # B
        rows += dwell(u, 240, 10.0, 10.0, eid + 20)  # back to A
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                      "lon", "lat"])
    got = (od_matrix(spark.createDataFrame(pdf), res=6, gap_s=7200,
                     min_stay_s=1800)
           .orderBy("origin_cell", "dest_cell").toPandas())
    assert len(got) == 2                    # A->B and B->A
    assert (got.n_trips == 2).all() and (got.n_entities == 2).all()

    con = duckdb.connect(); con.register("p", pdf)
    want = con.execute(od_matrix_sql("SELECT * FROM p", res=6, gap_s=7200,
                                     min_stay_s=1800)
                       + " ORDER BY origin_cell, dest_cell").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_names=False)


def test_hotspots_planted_blob(spark):
    """A dense blob on a sparse uniform field: the blob's cell (and its
    ring) carry the max z; a far-away lone point sits near 0; wn
    shrinks at the pole row; twin agrees row-for-row."""
    import numpy as np

    from osmnightwatch_spark.operators.geo_stats import (
        hotspots, hotspots_sql)

    rng = np.random.default_rng(17)
    rows = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-170, 170, 300), rng.uniform(-80, 80, 300))]
    rows += [(45.0 + float(d) * 0.01, 45.0) for d in range(200)]  # blob
    rows += [(0.0, 89.9)]                                         # pole pt
    pdf = pd.DataFrame(rows, columns=["lon", "lat"])
    got = (hotspots(spark.createDataFrame(pdf), res=4)
           .orderBy("gx", "gy").toPandas())
    top = got.loc[got.z.idxmax()]
    # blob at lon 45-47, lat 45: gx = floor((45+180)/360*16) = 10,
    # gy = floor((45+90)/180*16) = 12. Gi* includes the blob in every
    # ring-1 neighbor's sum, so the max-z cell is the blob cell or one
    # of its 8 neighbors — assert Chebyshev distance <= 1 and a
    # strongly-significant score.
    assert abs(top.gx - 10) <= 1 and abs(top.gy - 12) <= 1 and top.z > 3
    pole = got[(got.gy == 15)]
    assert (pole.wn < 9).all()     # clamped neighborhood at the pole row

    con = duckdb.connect(); con.register("p", pdf)
    want = con.execute(hotspots_sql("SELECT * FROM p", res=4)
                       + " ORDER BY gx, gy").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"gx": "int64", "gy": "int64", "n": "int64",
                    "wsum": "int64", "wn": "int64"}),
        want.astype({"gx": "int64", "gy": "int64", "n": "int64",
                     "wsum": "int64", "wn": "int64"}),
        check_names=False)


def test_od_matrix_equal_enter_ts_deterministic(spark):
    """Two visits sharing an enter timestamp (fixes at one ts across
    cells) must order deterministically (cell tiebreak) — same flows
    under any partitioning."""
    from pyspark.sql import functions as F

    from osmnightwatch_spark.operators.geo_stats import od_matrix

    # user 1 dwells 2h at A, then two same-ts fixes start dwells at
    # B and C (equal enter_ts)
    rows = []
    for m in range(0, 121, 10):
        rows.append((1, f"2024-01-01 00:{0:02d}:00", m, 10.0, 10.0))
    rows = [(1, f"2024-01-01 {h:02d}:{mi:02d}:00", i, lon, lat)
            for i, (h, mi, lon, lat) in enumerate(
                [(0, 0, 10.0, 10.0), (0, 30, 10.0, 10.0), (2, 0, 10.0, 10.0),
                 # same enter ts for the B and C dwell starts:
                 (5, 0, 60.0, 10.0), (5, 0, 110.0, 10.0),
                 (7, 0, 60.0, 10.0), (7, 1, 110.0, 10.0)])]
    base = None
    for parts in (1, 4, 8):
        pts = spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, "
            "lon double, lat double"
        ).select("user_id", F.to_timestamp("ts").alias("ts"),
                 "event_id", "lon", "lat").repartition(parts)
        got = sorted(
            (r.origin_cell, r.dest_cell, r.n_trips, r.n_entities)
            for r in od_matrix(pts, res=4, gap_s=86400,
                               min_stay_s=3600).collect())
        base = got if base is None else base
        assert got == base


def test_with_speed_flags_teleports_and_same_ts_moves(spark):
    """Planted trace: stationary fixes clean, a 70 m/s-exceeding hop
    flags, a same-timestamp re-fix that MOVED flags (division-free),
    first fixes never flag; twin row-identical."""
    from pyspark.sql import functions as F

    from osmnightwatch_spark.operators.geo_stats import (with_speed,
                                                         with_speed_sql)

    rows = [
        (1, "2024-01-01 00:00:00", 0, 10.0, 10.0),    # first fix
        (1, "2024-01-01 01:00:00", 1, 10.0, 10.0),    # stationary
        (1, "2024-01-01 01:00:10", 2, 11.0, 10.0),    # ~111km in 10s
        (1, "2024-01-01 02:00:00", 3, 11.0, 10.0),
        (1, "2024-01-01 02:00:00", 4, 12.0, 10.0),    # same-ts move
        (2, "2024-01-01 00:00:00", 5, 50.0, 50.0),    # lone first fix
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
        "lon double, lat double"
    ).select("user_id", F.to_timestamp("ts").alias("ts"),
             "event_id", "lon", "lat")
    got = {r.event_id: r for r in with_speed(pts, vmax_mps=70.0).collect()}
    assert len(got) == 6
    assert [got[i].is_anomaly for i in range(6)] == \
        [False, False, True, False, True, False]
    assert got[1].speed_mmps == 0.0 and got[1].dt_s == 3600
    assert got[2].speed_mmps > 70.0 * 1000
    assert got[4].dt_s == 0 and got[4].speed_mmps is None
    assert got[0].hop_mm is None and got[5].hop_mm is None

    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE p (user_id BIGINT, ts TIMESTAMP, "
                "event_id BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?, ?)", rows)
    exp = {r[1]: r for r in con.execute(
        with_speed_sql("SELECT * FROM p", vmax_mps=70.0)).fetchall()}
    for i in range(6):
        assert exp[i][3] == got[i].dt_s
        assert exp[i][4] == got[i].hop_mm
        assert exp[i][6] == got[i].is_anomaly


def test_track_hausdorff_hand_and_invariants(spark):
    """Hand-computable tracks: identical tracks -> 0; a one-point
    offset drives the directed distances asymmetrically; result is
    partitioning-stable and twin-identical."""
    from pyspark.sql import functions as F  # noqa: F401

    from osmnightwatch_spark.operators.trajectory import (
        track_hausdorff, track_hausdorff_sql)

    pts_rows = (
        [(1, float(x), 0.0) for x in range(5)]          # A: line y=0
        + [(2, float(x), 0.0) for x in range(5)]        # B: same line
        + [(3, float(x), 1.0) for x in range(5)]        # C: y=1
        + [(4, 0.0, 0.0), (4, 10.0, 0.0)]               # D: endpoints only
    )
    pair_rows = [(1, 2), (1, 3), (1, 4), (1, 99)]       # 99: no fixes
    pts = spark.createDataFrame(pts_rows, "user_id long, lon double, lat double")
    pairs = spark.createDataFrame(pair_rows, "a long, b long")
    got = {(r.a, r.b): r for r in
           track_hausdorff(pts.repartition(7), pairs).collect()}
    assert set(got) == {(1, 2), (1, 3), (1, 4)}         # (1,99) absent
    assert got[(1, 2)].hausdorff == 0.0
    assert got[(1, 3)].hausdorff == 1.0                 # parallel lines
    # farthest A point from D = x=4 (min(4, 6) = 4);
    # farthest D point from A = x=10 (closest A at x=4 -> 6)
    assert got[(1, 4)].h_ab == 4.0 and got[(1, 4)].h_ba == 6.0
    assert got[(1, 4)].hausdorff == 6.0

    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE p (user_id BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pts_rows)
    con.execute("CREATE TABLE pr (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO pr VALUES (?, ?)", pair_rows)
    exp = con.execute(track_hausdorff_sql(
        "SELECT * FROM p", "SELECT * FROM pr")).fetchall()
    assert {(a, b): (na, nb, hab, hba, h) for a, b, na, nb, hab, hba, h
            in exp} == {(k): (r.n_a, r.n_b, r.h_ab, r.h_ba, r.hausdorff)
                        for k, r in got.items()}
