"""Shared coastline-validator fixture + its independent DuckDB oracle.

The corpus covers every ``operators.coastline`` issue family
(reference: ``Analyzers/BrokenCoastline/BrokenCoastlineAnalyzer.cs``
and ``CoastlineValidationTest.cs``): endpoint connectivity, reversed
direction pairs, island orientation, self-intersection, and the
coastline × coastline crossing join.

The SQL twin re-derives each check from the raw vertex table with no
engine knowledge: signed endpoint-degree sums, reversed endpoint-pair
self-join, shoelace orientation, and pairwise segment-orientation sign
arithmetic for both self-intersection and cross-way crossings. The
engine's cell-bucketed candidate join is refined by the exact same
proper-crossing predicate, so the all-pairs SQL is a sound oracle
(crossing ways always share a covering cell — their bboxes overlap).
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession

# (way_id, first_node, last_node, [(lon, lat), ...])
WAYS: list[tuple[int, int, int, list[tuple[float, float]]]] = [
    # closed CCW ring — clean
    (1, 10, 10, [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
    # closed CW ring — wrong orientation
    (2, 20, 20, [(5, 0), (5, 2), (7, 2), (7, 0), (5, 0)]),
    # reversed direction pair (connected: degrees cancel)
    (3, 30, 31, [(10, 0), (12, 0)]),
    (4, 31, 30, [(12, 0), (10, 0)]),
    # open chain: both endpoints unconnected
    (5, 40, 41, [(20, 0), (22, 0)]),
    # crossing pair (and four unconnected endpoints)
    (6, 50, 51, [(30, 0), (34, 4)]),
    (7, 52, 53, [(30, 4), (34, 0)]),
    # self-intersecting polyline (and two unconnected endpoints)
    (8, 60, 61, [(40, 0), (44, 0), (44, 2), (42, -2)]),
]


def spark_frame(spark: SparkSession):
    rows = [
        (wid, fn, ln, [Row(lon=float(x), lat=float(y)) for x, y in pts])
        for wid, fn, ln, pts in WAYS
    ]
    return spark.createDataFrame(
        rows,
        "way_id long, first_node long, last_node long,"
        " vertices array<struct<lon:double,lat:double>>")


def _values_ways() -> str:
    return ", ".join(f"({w}, {f}, {l})" for w, f, l, _ in WAYS)


def _values_verts() -> str:
    rows = []
    for wid, _f, _l, pts in WAYS:
        for pos, (x, y) in enumerate(pts, start=1):
            rows.append(f"({wid}, {pos}, {float(x)!r}, {float(y)!r})")
    return ", ".join(rows)


_CROSS = (
    "((a.x2-a.x1)*(b.y1-a.y1)-(a.y2-a.y1)*(b.x1-a.x1))"
    "*((a.x2-a.x1)*(b.y2-a.y1)-(a.y2-a.y1)*(b.x2-a.x1)) < 0 AND "
    "((b.x2-b.x1)*(a.y1-b.y1)-(b.y2-b.y1)*(a.x1-b.x1))"
    "*((b.x2-b.x1)*(a.y2-b.y1)-(b.y2-b.y1)*(a.x2-b.x1)) < 0"
)


def oracle_sql() -> str:
    return f"""
WITH
ways(way_id, first_node, last_node) AS (VALUES {_values_ways()}),
verts(way_id, pos, lon, lat) AS (VALUES {_values_verts()}),
npts AS (SELECT way_id, count(*) AS n FROM verts GROUP BY 1),
open_ways AS (SELECT * FROM ways WHERE first_node <> last_node),
-- signed endpoint degree: a node starting n ways must end n ways
endp AS (
  SELECT first_node AS node_id, 1 AS d, way_id FROM open_ways
  UNION ALL SELECT last_node, -1, way_id FROM open_ways),
unconnected AS (
  SELECT node_id,
    (SELECT string_agg(CAST(w AS VARCHAR), ', ' ORDER BY w)
       FROM (SELECT DISTINCT e2.way_id AS w FROM endp e2
              WHERE e2.node_id = e.node_id)) AS way_list
  FROM endp e GROUP BY node_id HAVING sum(d) <> 0),
segs AS (
  SELECT a.way_id, a.pos AS i, a.lon AS x1, a.lat AS y1,
         b.lon AS x2, b.lat AS y2
  FROM verts a JOIN verts b ON a.way_id = b.way_id AND b.pos = a.pos + 1),
selfx AS (
  SELECT DISTINCT a.way_id FROM segs a JOIN segs b
    ON a.way_id = b.way_id AND b.i > a.i + 1
  WHERE {_CROSS}),
crossing AS (
  SELECT DISTINCT a.way_id AS wa, b.way_id AS wb
  FROM segs a JOIN segs b ON a.way_id < b.way_id
  WHERE {_CROSS}),
shoelace AS (
  SELECT s.way_id, sum(s.x1 * s.y2 - s.x2 * s.y1) AS area2
  FROM segs s GROUP BY 1)
SELECT 'UnconnectedCoastline' AS issue_type, 'N' AS osm_type,
       CAST(node_id AS BIGINT) AS osm_id,
       'Unconnected node, ways: ' || way_list AS details
FROM unconnected
UNION ALL
SELECT 'WrongDirection', 'W', CAST(a.way_id AS BIGINT),
       'Way with wrong direction, pair: ' || CAST(b.way_id AS VARCHAR)
FROM ways a JOIN ways b
  ON a.first_node = b.last_node AND a.last_node = b.first_node
 AND a.way_id <> b.way_id
UNION ALL
SELECT 'ShortWay', 'W', CAST(way_id AS BIGINT), 'Way with less than 2 nodes'
FROM npts WHERE n < 2
UNION ALL
SELECT 'SelfIntersection', 'W', CAST(way_id AS BIGINT), 'Way intersects itself'
FROM selfx
UNION ALL
SELECT 'WrongOrientation', 'W', CAST(w.way_id AS BIGINT),
       'island should be counterclockwise'
FROM ways w JOIN npts n ON n.way_id = w.way_id
JOIN shoelace s ON s.way_id = w.way_id
WHERE w.first_node = w.last_node AND n.n >= 4 AND s.area2 <= 0
UNION ALL
SELECT 'CrossingCoastline', 'W', CAST(wa AS BIGINT),
       'Crosses with ' || CAST(wb AS VARCHAR) FROM crossing
UNION ALL
SELECT 'CrossingCoastline', 'W', CAST(wb AS BIGINT),
       'Crosses with ' || CAST(wa AS VARCHAR) FROM crossing
""".strip()
