"""Round-5 geospatial surface: tile pyramid ladder, segment→tile
clipping, map matching, geofence transitions — each vs an independent
numpy/pandas brute model plus its pinned edge semantics."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osmnightwatch_spark.functions import cells as C
from osmnightwatch_spark.operators.clip import clip_segments_to_tiles
from osmnightwatch_spark.operators.geofence import geofence_transitions
from osmnightwatch_spark.operators.map_match import map_match
from osmnightwatch_spark.operators.tiling import tile_counts, tile_pyramid


def _pts(seed, n):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-90, 90, n),
    })


def _segs(seed, n, max_len=3.0):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(-179, 179, n)
    y1 = rng.uniform(-85, 85, n)
    return pd.DataFrame({
        "seg_id": np.arange(n, dtype=np.int64),
        "x1": x1, "y1": y1,
        "x2": np.clip(x1 + rng.uniform(-max_len, max_len, n), -180, 180),
        "y2": np.clip(y1 + rng.uniform(-max_len, max_len, n), -90, 90),
    })


# ---------------------------------------------------------------- pyramid

def test_tile_pyramid_equals_per_level_counts(spark):
    pts = spark.createDataFrame(_pts(7, 500))
    pyr = {(r.cell, r.res): r.n
           for r in tile_pyramid(pts, 1, 5).collect()}
    for res in range(1, 6):
        want = {(r.tile, res): r.n_images
                for r in tile_counts(pts, res).collect()}
        got = {k: v for k, v in pyr.items() if k[1] == res}
        assert got == want, f"res={res}"


def test_tile_pyramid_parent_sum_invariant(spark):
    pts = spark.createDataFrame(_pts(8, 400))
    rows = tile_pyramid(pts, 2, 4).collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r.res, {})[r.cell] = r.n
    for res in (3, 4):
        rolled = {}
        for cell, n in by_res[res].items():
            p = int(C.parent_cell(np.array([cell], dtype=np.int64), 1)[0])
            rolled[p] = rolled.get(p, 0) + n
        assert rolled == by_res[res - 1]
    assert sum(by_res[2].values()) == 400


# ------------------------------------------------------------------- clip

def _clip_brute(seg, res):
    """Liang–Barsky against every grid tile, python floats."""
    n = 1 << res
    w, h = 360.0 / n, 180.0 / n
    out = []
    x1, y1, x2, y2 = seg.x1, seg.y1, seg.x2, seg.y2
    dx, dy = x2 - x1, y2 - y1
    for gx in range(n):
        lon0, lon1 = -180.0 + gx * w, -180.0 + (gx + 1) * w
        for gy in range(n):
            lat0, lat1 = -90.0 + gy * h, -90.0 + (gy + 1) * h
            if dx != 0:
                txm = min((lon0 - x1) / dx, (lon1 - x1) / dx)
                txM = max((lon0 - x1) / dx, (lon1 - x1) / dx)
            else:
                txm, txM = (0.0, 1.0) if lon0 <= x1 <= lon1 else (1.0, 0.0)
            if dy != 0:
                tym = min((lat0 - y1) / dy, (lat1 - y1) / dy)
                tyM = max((lat0 - y1) / dy, (lat1 - y1) / dy)
            else:
                tym, tyM = (0.0, 1.0) if lat0 <= y1 <= lat1 else (1.0, 0.0)
            t0, t1 = max(0.0, txm, tym), min(1.0, txM, tyM)
            if t1 > t0:
                out.append((gx, gy, t0, t1))
    return out


def test_clip_matches_brute_grid(spark):
    segs = _segs(11, 60)
    res = 4
    got = {}
    for r in clip_segments_to_tiles(spark.createDataFrame(segs), res).collect():
        _, gx, gy = C.decode_cell([r.tile])
        got.setdefault(r.seg_id, []).append((int(gx[0]), int(gy[0]),
                                             r.t0, r.t1, r))
    for seg in segs.itertuples():
        want = _clip_brute(seg, res)
        have = sorted(got.get(seg.seg_id, []), key=lambda x: (x[0], x[1]))
        assert [(g[0], g[1]) for g in have] == [(w[0], w[1]) for w in sorted(want)], \
            f"seg {seg.seg_id} tile set"
        for (gx, gy, t0, t1, r), w in zip(have, sorted(want)):
            assert abs(t0 - w[2]) < 1e-12 and abs(t1 - w[3]) < 1e-12
            # clipped endpoints actually interpolate the parameter
            assert abs(r.cx1 - (seg.x1 + t0 * (seg.x2 - seg.x1))) < 1e-12
            assert abs(r.cy2 - (seg.y1 + t1 * (seg.y2 - seg.y1))) < 1e-12


def test_clip_interval_cover_and_edge_touch(spark):
    # horizontal segment crossing 4 tiles at res 3 (45° cells,
    # boundaries at -45/0/45): intervals partition [0,1]; the lat=0
    # EDGE-riding segment is excluded (zero-height overlap everywhere).
    df = spark.createDataFrame(
        [(1, -60.0, 10.0, 60.0, 10.0),
         (2, -60.0, 0.0, 60.0, 0.0)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double")
    rows = clip_segments_to_tiles(df, 3).collect()
    one = sorted([r for r in rows if r.seg_id == 1], key=lambda r: r.t0)
    assert len(one) == 4
    assert one[0].t0 == 0.0 and one[-1].t1 == 1.0
    for a, b in zip(one, one[1:]):
        assert abs(a.t1 - b.t0) < 1e-12
    # an exact-edge rider has t1 == t0 on both adjacent rows → dropped
    assert [r for r in rows if r.seg_id == 2] == []


# -------------------------------------------------------------- map match

def test_map_match_matches_brute(spark):
    rng = np.random.default_rng(21)
    pts = pd.DataFrame({
        "point_id": np.arange(300, dtype=np.int64),
        "lon": rng.uniform(-30, 30, 300), "lat": rng.uniform(-30, 30, 300)})
    segs = _segs(22, 80)
    segs["x1"] = rng.uniform(-30, 30, 80)
    segs["y1"] = rng.uniform(-30, 30, 80)
    segs["x2"] = segs.x1 + rng.uniform(-2, 2, 80)
    segs["y2"] = segs.y1 + rng.uniform(-2, 2, 80)
    r = 1.5
    got = {x.point_id: (x.seg_id, x.d2)
           for x in map_match(spark.createDataFrame(pts),
                              spark.createDataFrame(segs), r).collect()}
    matched = 0
    for p in pts.itertuples():
        best = None
        for s in segs.itertuples():
            dx, dy = s.x2 - s.x1, s.y2 - s.y1
            l2 = dx * dx + dy * dy
            t = 0.0 if l2 == 0 else min(1.0, max(
                0.0, ((p.lon - s.x1) * dx + (p.lat - s.y1) * dy) / l2))
            mx, my = s.x1 + t * dx, s.y1 + t * dy
            d2 = (p.lon - mx) ** 2 + (p.lat - my) ** 2
            if d2 <= r * r and (best is None or (d2, s.seg_id) < best):
                best = (d2, s.seg_id)
        if best is None:
            assert p.point_id not in got
        else:
            matched += 1
            assert got[p.point_id][0] == best[1], f"point {p.point_id}"
            assert abs(got[p.point_id][1] - best[0]) < 1e-12
    assert matched > 20  # fixture actually exercises the radius


def test_map_match_tie_and_degenerate(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0)], "point_id long, lon double, lat double")
    segs = spark.createDataFrame(
        # two mirror segments at equal distance 1.0 → pick seg_id 3;
        # plus a degenerate point-segment FARTHER away
        [(7, -2.0, 1.0, 2.0, 1.0), (3, -2.0, -1.0, 2.0, -1.0),
         (1, 1.5, 0.0, 1.5, 0.0)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double")
    rows = map_match(pts, segs, 2.0).collect()
    assert len(rows) == 1 and rows[0].seg_id == 3 and rows[0].d2 == 1.0
    # degenerate segment wins when nearest
    rows = map_match(pts, segs.where(F.col("seg_id") == 1), 2.0).collect()
    assert rows[0].seg_id == 1 and abs(rows[0].d2 - 2.25) < 1e-12 \
        and rows[0].mt == 0.0


# --------------------------------------------------------------- geofence

def _geofence_brute(pts, fences):
    out = set()
    for f in fences.itertuples():
        for ent, grp in pts.sort_values(["te", "tb"]).groupby("entity"):
            prev = 0
            for p in grp.itertuples():
                inb = int(f.lon0 <= p.lon <= f.lon1 and f.lat0 <= p.lat <= f.lat1)
                if inb != prev:
                    out.add((ent, f.fence_id, p.te,
                             "enter" if inb else "exit"))
                prev = inb
    return out


def test_geofence_matches_brute(spark):
    rng = np.random.default_rng(31)
    n = 600
    pts = pd.DataFrame({
        "entity": rng.integers(0, 12, n),
        "te": rng.integers(0, 10_000, n),
        "tb": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-40, 40, n), "lat": rng.uniform(-40, 40, n)})
    lon0 = rng.uniform(-40, 20, 15)
    lat0 = rng.uniform(-40, 20, 15)
    fences = pd.DataFrame({
        "fence_id": np.arange(15, dtype=np.int64),
        "lon0": lon0, "lon1": lon0 + rng.uniform(5, 25, 15),
        "lat0": lat0, "lat1": lat0 + rng.uniform(5, 25, 15)})
    for res in (2, 4):
        got = {(r.entity, r.fence_id, r.te, r.transition)
               for r in geofence_transitions(
                   spark.createDataFrame(pts),
                   spark.createDataFrame(fences), res=res).collect()}
        want = _geofence_brute(pts, fences)
        assert got == want, f"res={res}"
        assert any(t == "exit" for *_, t in got)


def test_geofence_open_stream_semantics(spark):
    # starts inside → enter at first fix; ends inside → NO exit;
    # brief dip out and back → exit + re-enter.
    pts = spark.createDataFrame(
        [("u", 1, 1, 5.0, 5.0), ("u", 2, 2, 50.0, 5.0),
         ("u", 3, 3, 5.0, 6.0)],
        "entity string, te long, tb long, lon double, lat double")
    fences = spark.createDataFrame(
        [(9, 0.0, 10.0, 0.0, 10.0)],
        "fence_id long, lon0 double, lon1 double, lat0 double, lat1 double")
    got = sorted((r.te, r.transition)
                 for r in geofence_transitions(pts, fences, res=3).collect())
    assert got == [(1, "enter"), (2, "exit"), (3, "enter")]
