"""Round-5 geometry aggregates: ring shoelace metrics, per-entity
convex hull, uniform-grid track resampling — each vs hand values or
an independent brute model plus its pinned degenerate semantics."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osmnightwatch_spark.operators.hull import convex_hull
from osmnightwatch_spark.operators.ring_metrics import ring_shoelace
from osmnightwatch_spark.operators.trajectory import track_resample


# ------------------------------------------------------------ shoelace

def _verts(ring_id, pts):
    return pd.DataFrame({
        "ring_id": [ring_id] * len(pts),
        "seq": np.arange(len(pts), dtype=np.int64),
        "x": [p[0] for p in pts], "y": [p[1] for p in pts],
    })


def test_shoelace_hand_values(spark):
    # unit CCW square at (10,20): area2 = 2, centroid (10.5, 20.5)
    sq = [(10, 20), (11, 20), (11, 21), (10, 21)]
    # CCW right triangle legs 4,3 at origin: area2 = 12
    tri = [(0, 0), (4, 0), (0, 3)]
    df = spark.createDataFrame(pd.concat([_verts(1, sq), _verts(2, tri)]))
    out = {r.ring_id: r for r in ring_shoelace(df).collect()}
    assert out[1].area2 == 2 and out[1].n_vertices == 4
    assert out[1].cx_num / (3 * out[1].area2) == 10.5
    assert out[1].cy_num / (3 * out[1].area2) == 20.5
    assert out[2].area2 == 12
    # centroid of the triangle = mean of vertices = (4/3, 1)
    assert out[2].cx_num == 4 * 3 * out[2].area2 / 3
    assert out[2].cy_num / (3 * out[2].area2) == 1.0


def test_shoelace_reversal_flips_sign_translation_invariant(spark):
    rng = np.random.default_rng(11)
    n = 12
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    pts = [(int(1000 + 500 * np.cos(a)), int(1000 + 500 * np.sin(a)))
           for a in ang]
    rev = list(reversed(pts))
    moved = [(x + 7777, y - 333) for x, y in pts]
    df = spark.createDataFrame(
        pd.concat([_verts(1, pts), _verts(2, rev), _verts(3, moved)]))
    out = {r.ring_id: r for r in ring_shoelace(df).collect()}
    assert out[1].area2 > 0                      # CCW by construction
    assert out[2].area2 == -out[1].area2         # reversal flips sign
    assert out[3].area2 == out[1].area2          # translation invariant
    # centroid translates with the ring
    c1x = out[1].cx_num / (3 * out[1].area2)
    c3x = out[3].cx_num / (3 * out[3].area2)
    assert abs(c3x - (c1x + 7777)) < 1e-9


def test_shoelace_matches_numpy_brute(spark):
    rng = np.random.default_rng(5)
    frames = []
    expect = {}
    for rid in range(6):
        n = int(rng.integers(3, 40))
        xs = rng.integers(0, 65536, n).astype(np.int64)
        ys = rng.integers(0, 65536, n).astype(np.int64)
        x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
        cr = xs * y2 - x2 * ys
        expect[rid] = (n, int(cr.sum()), int(((xs + x2) * cr).sum()),
                       int(((ys + y2) * cr).sum()))
        frames.append(_verts(rid, list(zip(xs.tolist(), ys.tolist()))))
    out = {r.ring_id: r
           for r in ring_shoelace(spark.createDataFrame(
               pd.concat(frames))).collect()}
    for rid, (n, a2, cx, cy) in expect.items():
        r = out[rid]
        assert (r.n_vertices, r.area2, r.cx_num, r.cy_num) == (n, a2, cx, cy)


# ------------------------------------------------------------ convex hull

def _brute_hull(pts):
    """Independent brute: supporting-edge characterization (the twin's
    formulation, in python) over the deduplicated point set."""
    P = sorted(set(pts))
    verts = set()
    for a in P:
        for b in P:
            if a == b:
                continue
            ok = True
            for q in P:
                if q in (a, b):
                    continue
                cr = ((b[0] - a[0]) * (q[1] - a[1])
                      - (b[1] - a[1]) * (q[0] - a[0]))
                dot = ((q[0] - a[0]) * (b[0] - a[0])
                       + (q[1] - a[1]) * (b[1] - a[1]))
                d2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                if not (cr > 0 or (cr == 0 and 0 < dot < d2)):
                    ok = False
                    break
            if ok:
                verts.add(a)
                verts.add(b)
    return verts


def _pts_df(groups):
    rows = [(e, x, y) for e, pts in groups.items() for x, y in pts]
    return pd.DataFrame(rows, columns=["entity", "x", "y"])


def test_hull_matches_brute_random(spark):
    rng = np.random.default_rng(3)
    groups = {e: [(int(x), int(y)) for x, y in
                  rng.integers(0, 1000, (int(rng.integers(2, 25)), 2))]
              for e in range(8)}
    out = convex_hull(spark.createDataFrame(_pts_df(groups))).collect()
    got = {}
    for r in out:
        got.setdefault(r.entity, set()).add((r.hx, r.hy))
    for e, pts in groups.items():
        assert got.get(e, set()) == _brute_hull(pts), f"entity {e}"


def test_hull_degenerate_semantics(spark):
    groups = {
        1: [(5, 5)],                             # single point -> no rows
        2: [(0, 0), (10, 10)],                   # two points -> both
        3: [(0, 0), (5, 5), (10, 10), (2, 2)],   # collinear -> extremes
        4: [(0, 0), (10, 0), (5, 0), (5, 5)],    # edge-interior collinear
        5: [(1, 1), (1, 1), (2, 2)],             # duplicates dedup
    }
    out = convex_hull(spark.createDataFrame(_pts_df(groups))).collect()
    got = {}
    for r in out:
        got.setdefault(r.entity, set()).add((r.hx, r.hy))
    assert 1 not in got
    assert got[2] == {(0, 0), (10, 10)}
    assert got[3] == {(0, 0), (10, 10)}
    assert got[4] == {(0, 0), (10, 0), (5, 5)}   # (5,0) is NOT a vertex
    assert got[5] == {(1, 1), (2, 2)}


def test_hull_is_superset_invariant_and_inside(spark):
    # every input point must be inside-or-on the hull polygon
    rng = np.random.default_rng(9)
    pts = [(int(x), int(y)) for x, y in rng.integers(0, 10000, (60, 2))]
    out = convex_hull(spark.createDataFrame(_pts_df({7: pts}))).collect()
    hull = {(r.hx, r.hy) for r in out}
    assert hull <= set(pts) and len(hull) >= 3
    # all points weakly left of every CCW hull edge (ordered via chain)
    from osmnightwatch_spark.operators.hull import _chain
    xs = np.array([p[0] for p in pts]); ys = np.array([p[1] for p in pts])
    ordered = _chain(xs, ys)
    m = len(ordered)
    for i in range(m):
        ax, ay = ordered[i]; bx, by = ordered[(i + 1) % m]
        for qx, qy in pts:
            assert (bx - ax) * (qy - ay) - (by - ay) * (qx - ax) >= 0


# ------------------------------------------------------------ resample

def _track_df(rows):
    return pd.DataFrame(rows, columns=["user_id", "te", "lon", "lat"])


def test_resample_hand_values(spark):
    # one segment (t=95..205, x 0->11, y 10->-1), W=10:
    # grid t=100..200, linear in t
    rows = [(1, 95, 0.0, 10.0), (1, 205, 11.0, -1.0)]
    out = track_resample(spark.createDataFrame(_track_df(rows)), 10,
                         ts="te").collect()
    got = {r.tg: (r.lon_g, r.lat_g) for r in out}
    assert sorted(got) == list(range(100, 201, 10))
    for tg, (x, y) in got.items():
        f = (tg - 95) / 110.0
        assert abs(x - 11.0 * f) < 1e-12
        assert abs(y - (10.0 - 11.0 * f)) < 1e-12


def test_resample_half_open_and_alignment(spark):
    # fixes AT grid instants: t=100 emitted (start closed), t=300 not
    # (end open); interior fix t=200 emitted exactly once with its own
    # position (frac 0 of the second segment)
    rows = [(1, 100, 0.0, 0.0), (1, 200, 4.0, 4.0), (1, 300, 8.0, 0.0)]
    out = track_resample(spark.createDataFrame(_track_df(rows)), 100,
                         ts="te").collect()
    got = {r.tg: (r.lon_g, r.lat_g) for r in out}
    assert sorted(got) == [100, 200]
    assert got[100] == (0.0, 0.0) and got[200] == (4.0, 4.0)


def test_resample_gap_shorter_than_step_and_single_fix(spark):
    rows = [(1, 101, 0.0, 0.0), (1, 108, 1.0, 1.0),   # no grid pt in span
            (2, 500, 3.0, 3.0)]                        # single fix
    out = track_resample(spark.createDataFrame(_track_df(rows)), 10,
                         ts="te").collect()
    assert out == []


def test_resample_duplicate_fix_dedup_and_determinism(spark):
    rows = [(1, 90, 0.0, 0.0), (1, 90, 0.0, 0.0), (1, 210, 12.0, 0.0)]
    df = spark.createDataFrame(_track_df(rows))
    a = sorted((r.tg, r.lon_g) for r in
               track_resample(df, 100, ts="te").collect())
    b = sorted((r.tg, r.lon_g) for r in
               track_resample(df.repartition(7), 100, ts="te").collect())
    assert a == b == [(100, 1.0), (200, 11.0)]


def test_hull_string_entity_key(spark):
    """ADVICE r5: the output schema derives the entity dtype from the
    input instead of hardcoding long — string keys must work."""
    pdf = pd.DataFrame(
        [("a", 0, 0), ("a", 4, 0), ("a", 0, 4), ("a", 1, 1),
         ("b", 0, 0), ("b", 2, 2)],
        columns=["entity", "x", "y"])
    out = convex_hull(spark.createDataFrame(pdf)).toPandas()
    assert out["entity"].dtype == object
    got = {e: set(map(tuple, g[["hx", "hy"]].to_numpy()))
           for e, g in out.groupby("entity")}
    assert got["a"] == {(0, 0), (4, 0), (0, 4)}
    assert got["b"] == {(0, 0), (2, 2)}
