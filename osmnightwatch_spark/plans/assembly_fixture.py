"""Shared OSM assembly fixture + its independent DuckDB oracle.

One deterministic entity corpus covering the reference's complete
polygon-assembly failure taxonomy (``BuildPolygonFromRelation.cs:
34-160``), defined ONCE as plain Python data and rendered two ways:

* :func:`spark_frames` — the engine input (nodes/ways/relations
  DataFrames fed to ``operators.assembly.assemble_polygons``);
* :func:`oracle_sql` — a from-scratch ANSI-SQL derivation of the same
  taxonomy + ring statistics that DuckDB runs with NO knowledge of the
  engine: endpoint-degree parity for dangles/cut edges, pairwise
  segment-orientation sign arithmetic for ring validity and shell
  crossings, recursive-CTE connected components for ring counts, and
  bbox containment for hole placement (exact here: every shell in the
  fixture is an axis-aligned rectangle, so bbox == shape).

The SQL is a genuine independent re-derivation, not a lookup table:
change any way's vertices and both sides move together or the driver's
hash check fails.

Documented scope limits of the SQL twin (the engine is more general):
cut-edge detection uses "no free ends but an odd-degree junction"
(covers bridges like the dumbbell below; a theta graph would need the
engine's walk), and hole placement uses bbox containment (exact for
rectangular shells). The fixture stays inside that scope by
construction.
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession

# --- the corpus (id, lon, lat) / (id, [node ids]) / (id, members) ----------

NODES: list[tuple[int, float, float]] = [
    # square A (0..4) + its hole (1..2)
    (1, 0.0, 0.0), (2, 4.0, 0.0), (3, 4.0, 4.0), (4, 0.0, 4.0),
    (11, 1.0, 1.0), (12, 2.0, 1.0), (13, 2.0, 2.0), (14, 1.0, 2.0),
    # open chain
    (21, 10.0, 0.0), (22, 14.0, 0.0), (23, 14.0, 4.0),
    # bowtie ring
    (31, 20.0, 0.0), (32, 24.0, 4.0), (33, 24.0, 0.0), (34, 20.0, 4.0),
    # dumbbell: two triangle loops joined by a path (cut edge)
    (41, 30.0, 0.0), (42, 32.0, 0.0), (43, 34.0, 0.0),
    (44, 29.0, 2.0), (45, 31.0, 2.0), (46, 33.0, 2.0), (47, 35.0, 2.0),
    # two overlapping squares (crossing shells)
    (51, 40.0, 0.0), (52, 44.0, 0.0), (53, 44.0, 4.0), (54, 40.0, 4.0),
    (55, 42.0, -2.0), (56, 46.0, -2.0), (57, 46.0, 2.0), (58, 42.0, 2.0),
    # inner bowtie inside a big square
    (61, 50.0, 0.0), (62, 54.0, 4.0), (63, 54.0, 0.0), (64, 50.0, 4.0),
    (65, 48.0, -1.0), (66, 56.0, -1.0), (67, 56.0, 5.0), (68, 48.0, 5.0),
    # open inner chain (inside the big square)
    (71, 51.0, 1.0), (72, 52.0, 1.0),
    # far square (a hole contained in no shell → silently dropped)
    (81, 100.0, 10.0), (82, 101.0, 10.0), (83, 101.0, 11.0), (84, 100.0, 11.0),
    # inner dumbbell inside the big square 161: two triangle loops
    # joined by a bridge (the inner CUT-EDGE case — bridge dropped,
    # loops become holes)
    (91, 49.0, 0.0), (92, 50.0, 0.0), (93, 49.5, 0.5),
    (94, 51.0, 0.0), (95, 52.0, 0.0), (96, 51.5, 0.5),
]

WAYS: list[tuple[int, list[int]]] = [
    (100, [1, 2, 3]), (101, [3, 4, 1]),          # square A in two halves
    (102, [11, 12, 13, 14, 11]),                 # closed hole ring
    (110, [21, 22, 23]),                         # open chain (dangle)
    (120, [31, 32, 33, 34, 31]),                 # bowtie (self-crossing ring)
    (130, [41, 44, 45, 41]),                     # dumbbell loop at 41
    (131, [41, 42, 43]),                         # dumbbell bridge path
    (132, [43, 46, 47, 43]),                     # dumbbell loop at 43
    (140, [51, 52, 53, 54, 51]),                 # square B
    (141, [55, 56, 57, 58, 55]),                 # square C (crosses B)
    (150, [1, 2]), (151, [2, 1]),                # zero-area 3-pt "ring"
    (160, [61, 62, 63, 64, 61]),                 # inner bowtie
    (161, [65, 66, 67, 68, 65]),                 # big square shell
    (170, [71, 72]),                             # open inner chain
    (175, [81, 82, 83, 84, 81]),                 # far square (unplaced hole)
    (180, [91, 92, 93, 91]),                     # inner triangle loop 1
    (181, [91, 94]),                             # inner bridge (cut edge)
    (182, [94, 95, 96, 94]),                     # inner triangle loop 2
]

# (relation_id, [(member_id, role, member_type)]) — expected reasons in
# comments; the pytest taxonomy test and the SQL oracle must both agree
RELATIONS: list[tuple[int, list[tuple[int, str, str]]]] = [
    (1000, [(100, "outer", "way"), (101, "outer", "way"),
            (102, "inner", "way")]),                # OK: 2 rings, 10 pts
    (1001, [(999, "outer", "way")]),                # missing way reference
    (1002, [(1, "admin_centre", "node"),
            (100, "subarea", "way")]),              # ignored roles → Missing ways
    (1003, [(102, "inner", "way")]),                # No outer ways found
    (1004, [(110, "outer", "way")]),                # outer ways unused (dangle)
    (1005, [(100, "", "way")]),                     # Member without role
    (1006, [(120, "outer", "way")]),                # invalid ring (bowtie)
    (1007, [(130, "outer", "way"), (131, "outer", "way"),
            (132, "outer", "way")]),                # cut edges (dumbbell)
    (1008, [(140, "outer", "way"), (141, "outer", "way")]),  # Invalid polygon.
    (1009, [(161, "outer", "way"), (160, "inner", "way")]),  # inner invalid ring
    (1010, [(161, "outer", "way"), (170, "inner", "way")]),  # inner unused
    (1011, [(100, "outer", "way"), (101, "outer", "way"),
            (175, "inner", "way")]),                # OK: far hole dropped → 1 ring
    (1012, [(140, "outer", "way"), (99, "subarea", "way"),
            (1, "admin_centre", "node")]),          # OK: ignored members
    (1013, [(150, "outer", "way"), (151, "outer", "way")]),  # 3-pt ring invalid
    (1014, []),                                     # empty members → Missing ways
    (1015, None),                                   # null members → Missing ways
    (1016, [(161, "outer", "way"), (180, "inner", "way"),
            (181, "inner", "way"), (182, "inner", "way")]),
    # ^ OK: inner cut edge (bridge 181) silently dropped, both loops
    #   become holes → 3 rings, 5+4+4 = 13 pts
    (1017, [(161, "outer", "way"), (160, "inner", "way"),
            (170, "inner", "way")]),
    # ^ inner bowtie AND inner dangle together → invalid ring lines
    #   wins (reference checks GetInvalidRingLines before GetDangles)
]


def spark_frames(spark: SparkSession):
    n = spark.createDataFrame(
        [(i, lo, la, None) for i, lo, la in NODES],
        "id long, lon double, lat double, tags map<string,string>")
    w = spark.createDataFrame(
        [(i, ns, None) for i, ns in WAYS],
        "id long, nodes array<long>, tags map<string,string>")
    r = spark.createDataFrame(
        [(i,
          None if ms is None
          else [Row(member_id=m, role=ro, member_type=t) for m, ro, t in ms],
          None)
         for i, ms in RELATIONS],
        "id long, members array<struct<member_id:long,role:string,member_type:string>>,"
        " tags map<string,string>")
    return n, w, r


def _values_nodes() -> str:
    return ", ".join(f"({i}, {lo!r}, {la!r})" for i, lo, la in NODES)


def _values_ways() -> str:
    return ", ".join(
        f"({i}, [{', '.join(str(x) for x in ns)}])" for i, ns in WAYS)


def _values_members() -> str:
    rows = []
    for rid, ms in RELATIONS:
        for mid, role, mtype in (ms or []):
            rows.append(f"({rid}, {mid}, '{role}', '{mtype}')")
    return ", ".join(rows)


def _values_rels() -> str:
    return ", ".join(f"({rid})" for rid, _ in RELATIONS)


# proper segment crossing (strict sign change on both orientations) —
# identical arithmetic to functions/geometry.segments_cross
_CROSS = (
    "((a.x2-a.x1)*(b.y1-a.y1)-(a.y2-a.y1)*(b.x1-a.x1))"
    "*((a.x2-a.x1)*(b.y2-a.y1)-(a.y2-a.y1)*(b.x2-a.x1)) < 0 AND "
    "((b.x2-b.x1)*(a.y1-b.y1)-(b.y2-b.y1)*(a.x1-b.x1))"
    "*((b.x2-b.x1)*(a.y2-b.y1)-(b.y2-b.y1)*(a.x2-b.x1)) < 0"
)


def oracle_sql() -> str:
    return f"""
WITH RECURSIVE
nodes(id, lon, lat) AS (VALUES {_values_nodes()}),
ways(id, nodes) AS (VALUES {_values_ways()}),
rels(rel_id) AS (VALUES {_values_rels()}),
members(rel_id, member_id, role, mtype) AS (VALUES {_values_members()}),
-- reference role semantics: only outer/inner/'' way members count as
-- ways; '' on ANY member type trips the role check; other roles ignored.
-- LEFT JOIN from rels: a relation with an empty/null members array
-- still gets a flags row (all zeros → 'Missing ways')
flags AS (
  SELECT r.rel_id,
    coalesce(max(CASE WHEN m.mtype='way' AND m.role IN ('outer','inner','') THEN 1 ELSE 0 END), 0) AS has_way,
    coalesce(max(CASE WHEN m.role='' THEN 1 ELSE 0 END), 0) AS has_empty,
    coalesce(max(CASE WHEN m.mtype='way' AND m.role='outer' THEN 1 ELSE 0 END), 0) AS has_outer
  FROM rels r LEFT JOIN members m ON m.rel_id = r.rel_id GROUP BY r.rel_id),
eligible AS (
  SELECT rel_id FROM flags WHERE has_way=1 AND has_empty=0 AND has_outer=1),
wm AS (
  SELECT m.rel_id, m.member_id AS way_id, m.role, w.nodes
  FROM members m LEFT JOIN ways w ON m.member_id = w.id
  WHERE m.mtype='way' AND m.role IN ('outer','inner')
    AND m.rel_id IN (SELECT rel_id FROM eligible)),
verts AS (
  SELECT u.rel_id, u.way_id, u.role, u.node_id, u.pos, n.lon, n.lat
  FROM (SELECT rel_id, way_id, role,
               unnest(nodes) AS node_id,
               unnest(range(1, len(nodes)+1)) AS pos
        FROM wm WHERE nodes IS NOT NULL) u
  LEFT JOIN nodes n ON u.node_id = n.id),
missing_ref AS (
  SELECT DISTINCT rel_id FROM wm WHERE nodes IS NULL
  UNION SELECT DISTINCT rel_id FROM verts WHERE lon IS NULL),
-- endpoint degrees per role (a closed way contributes 2 to one node)
ends AS (
  SELECT rel_id, way_id, role, nodes[1] AS node FROM wm WHERE nodes IS NOT NULL
  UNION ALL
  SELECT rel_id, way_id, role, nodes[-1] FROM wm WHERE nodes IS NOT NULL),
deg AS (
  SELECT rel_id, role, node, count(*) AS d FROM ends GROUP BY 1, 2, 3),
-- segments with in-way position for orientation arithmetic
segs AS (
  SELECT a.rel_id, a.way_id, a.role, a.pos AS i,
         a.lon AS x1, a.lat AS y1, b.lon AS x2, b.lat AS y2
  FROM verts a JOIN verts b
    ON a.rel_id=b.rel_id AND a.way_id=b.way_id AND b.pos = a.pos + 1),
-- connected components over ways sharing an endpoint node (per rel+role)
adj AS (
  SELECT DISTINCT e1.rel_id, e1.role, e1.way_id AS wa, e2.way_id AS wb
  FROM ends e1 JOIN ends e2
    ON e1.rel_id=e2.rel_id AND e1.role=e2.role AND e1.node=e2.node
   AND e1.way_id <> e2.way_id),
comp(rel_id, role, way_id, label) AS (
  SELECT DISTINCT rel_id, role, way_id, way_id FROM ends
  UNION
  SELECT a.rel_id, a.role, a.wb, c.label
  FROM comp c JOIN adj a
    ON a.rel_id=c.rel_id AND a.role=c.role AND a.wa=c.way_id),
complabel AS (
  SELECT rel_id, role, way_id, min(label) AS comp_id
  FROM comp GROUP BY 1, 2, 3),
-- per-component ring stats: a ring stitched from k chains of len_i
-- vertices has sum(len_i) - (k-1) points (closing vertex included)
ringstat AS (
  SELECT w.rel_id, w.role, c.comp_id,
         sum(len(w.nodes)) - (count(*) - 1) AS ring_pts,
         min(w.nodes[1]) AS first_node
  FROM wm w JOIN complabel c
    ON c.rel_id=w.rel_id AND c.role=w.role AND c.way_id=w.way_id
  GROUP BY 1, 2, 3),
-- taxonomy predicates -------------------------------------------------
outer_unused AS (
  SELECT DISTINCT rel_id FROM deg WHERE role='outer' AND d=1),
outer_cut AS (
  SELECT DISTINCT rel_id FROM deg WHERE role='outer' AND d % 2 = 1
  AND rel_id NOT IN (SELECT rel_id FROM outer_unused)),
-- invalid outer ring: self-crossing (non-adjacent proper cross within
-- one way) or a stitched ring with < 4 points
outer_selfcross AS (
  SELECT DISTINCT a.rel_id FROM segs a JOIN segs b
    ON a.rel_id=b.rel_id AND a.way_id=b.way_id AND b.i > a.i + 1
  WHERE a.role='outer' AND b.role='outer' AND {_CROSS}),
outer_shortring AS (
  SELECT DISTINCT rel_id FROM ringstat WHERE role='outer' AND ring_pts < 4),
outer_invalid AS (
  SELECT rel_id FROM outer_selfcross UNION SELECT rel_id FROM outer_shortring),
-- Invalid polygon.: segments of two DIFFERENT outer rings properly cross
shells_cross AS (
  SELECT DISTINCT a.rel_id
  FROM segs a JOIN segs b ON a.rel_id=b.rel_id AND a.way_id < b.way_id
  JOIN complabel ca ON ca.rel_id=a.rel_id AND ca.role='outer' AND ca.way_id=a.way_id
  JOIN complabel cb ON cb.rel_id=b.rel_id AND cb.role='outer' AND cb.way_id=b.way_id
  WHERE a.role='outer' AND b.role='outer' AND ca.comp_id <> cb.comp_id
    AND {_CROSS}),
-- inner semantics (lenient, NTS Polygonizer): rings = CLOSED inner
-- ways (fixture scope: every inner ring is a single closed way);
-- free-end inner chains are dangles (unused); open inner chains
-- without free ends are cut edges — silently dropped, no failure
inner_closed AS (
  SELECT rel_id, way_id, len(nodes) AS ring_pts, nodes[1] AS first_node
  FROM wm WHERE role='inner' AND nodes[1] = nodes[-1]),
inner_unused AS (
  SELECT DISTINCT rel_id FROM deg WHERE role='inner' AND d=1),
inner_invalid AS (
  SELECT DISTINCT a.rel_id FROM segs a JOIN segs b
    ON a.rel_id=b.rel_id AND a.way_id=b.way_id AND b.i > a.i + 1
  WHERE a.role='inner' AND b.role='inner' AND {_CROSS}
  UNION SELECT rel_id FROM inner_closed WHERE ring_pts < 4),
-- hole placement: bbox containment (fixture shells are rectangles)
outer_bbox AS (
  SELECT s.rel_id, c.comp_id,
         min(least(s.x1, s.x2)) AS x0, min(least(s.y1, s.y2)) AS y0,
         max(greatest(s.x1, s.x2)) AS x1, max(greatest(s.y1, s.y2)) AS y1
  FROM segs s JOIN complabel c
    ON c.rel_id=s.rel_id AND c.role='outer' AND c.way_id=s.way_id
  WHERE s.role='outer' GROUP BY 1, 2),
hole_first AS (
  SELECT ic.rel_id, ic.way_id, ic.ring_pts, n.lon, n.lat
  FROM inner_closed ic JOIN nodes n ON n.id = ic.first_node),
placed AS (
  SELECT DISTINCT h.rel_id, h.way_id, h.ring_pts
  FROM hole_first h JOIN outer_bbox o ON o.rel_id = h.rel_id
  WHERE h.lon >= o.x0 AND h.lon <= o.x1 AND h.lat >= o.y0 AND h.lat <= o.y1),
ringcounts AS (
  SELECT e.rel_id,
    (SELECT count(DISTINCT comp_id) FROM ringstat r
      WHERE r.rel_id=e.rel_id AND r.role='outer')
    + (SELECT count(*) FROM placed p WHERE p.rel_id=e.rel_id) AS n_rings,
    (SELECT sum(ring_pts) FROM ringstat r
      WHERE r.rel_id=e.rel_id AND r.role='outer')
    + coalesce((SELECT sum(ring_pts) FROM placed p WHERE p.rel_id=e.rel_id), 0)
      AS n_pts
  FROM eligible e),
verdict AS (
  SELECT f.rel_id,
    CASE
      WHEN f.has_way = 0 THEN 'Missing ways'
      WHEN f.has_empty = 1 THEN 'Member without role'
      WHEN f.has_outer = 0 THEN 'No outer ways found'
      WHEN f.rel_id IN (SELECT rel_id FROM missing_ref)
        THEN 'Referenced way or node not found.'
      WHEN f.rel_id IN (SELECT rel_id FROM outer_unused)
        THEN 'Some outer ways are unused.'
      WHEN f.rel_id IN (SELECT rel_id FROM outer_cut)
        THEN 'Some outer ways form cut edges.'
      WHEN f.rel_id IN (SELECT rel_id FROM outer_invalid)
        THEN 'Some outer ways form invalid rings.'
      WHEN f.rel_id IN (SELECT rel_id FROM shells_cross)
        THEN 'Invalid polygon.'
      WHEN f.rel_id IN (SELECT rel_id FROM inner_invalid)
        THEN 'Inner ways have invalid ring lines.'
      WHEN f.rel_id IN (SELECT rel_id FROM inner_unused)
        THEN 'Inner ways have unused sections.'
      ELSE NULL END AS reason
  FROM flags f)
SELECT CAST(v.rel_id AS BIGINT) AS relation_id, v.reason,
  CAST(CASE WHEN v.reason IS NULL THEN r.n_rings END AS INTEGER) AS n_rings,
  CAST(CASE WHEN v.reason IS NULL THEN r.n_pts END AS BIGINT) AS n_pts
FROM verdict v LEFT JOIN ringcounts r ON r.rel_id = v.rel_id
""".strip()
