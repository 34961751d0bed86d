"""Relation → polygon assembly (the reference's polygonizer recast).

Reference semantics (NOT a port — re-derived from behavior):
``Analyzers/AdminCountPerCountry/BuildPolygonFromRelation.cs:34-160``
builds a MultiPolygon from a relation's member ways and yields a typed
failure reason instead of a geometry when assembly fails. Failure
strings AND role semantics are the reference's, verbatim:

* members whose role is neither ``outer``/``inner``/``""`` are
  **ignored entirely** (the switch has no default arm, :41-65);
* ``"Missing ways"`` (:68-70) — no way member with role
  outer/inner/"" at all (``atLeastOneWay`` stays false);
* ``"Member without role"`` (:73-75) — any member (any type) with an
  empty role;
* ``"No outer ways found"`` (:78-80) — empty-role ways do NOT count
  as outer (case ``""`` :58-64 never adds to ``outerWays``);
* ``"Some outer ways are unused."`` (:96-98, DeleteDangles) — an
  outer way has a free end (endpoint degree 1);
* ``"Some outer ways form cut edges."`` (:100-102, DeleteCutEdges) —
  bridge ways between rings (the ring walk gets stuck);
* ``"Some outer ways form invalid rings."`` (:105-107) — a stitched
  ring has < 4 points, zero area, or self-intersects;
* ``"Invalid polygon."`` (:111-113) — cross-ring invalidity (shells
  cross each other);
* ``"No valid polygon found."`` (:115-117) — nothing assembled;
* ``"Inner ways have invalid ring lines."`` (:129-131) — checked
  BEFORE the inner dangle check (GetInvalidRingLines precedes
  GetDangles in the reference);
* ``"Inner ways have unused sections."`` (:134-136) — inner dangles
  only; inner **cut edges are silently dropped** (NTS Polygonizer
  DeleteCutEdges removes the bridge and polygonizes the remaining
  loops — no failure);
* inner rings contained in no shell are **silently dropped**
  (:139-150 only attaches contained holes);
* relations whose members array is empty or null have no way member
  at all → ``"Missing ways"`` (``atLeastOneWay`` stays false).

One deliberate divergence: a member way (or way node) absent from the
snapshot surfaces in the reference as a raw exception message
(:156-159, ``ex.Message``); this engine emits the typed reason
``"Referenced way or node not found."`` instead — stable across
runtimes, same failure class.

Spark shape (SURVEY.md J1/A1/U2): the whole failure taxonomy above
*except* ring geometry is computed natively (flag aggregation +
anti-joins — no Python); the member gather is two bulk equi-joins
(relation→way, way→node) — the reference's explicit
``Utils.BatchLoad`` anti-random-I/O batching (Utils.cs:62-84) is what
joins *are* — and only relations that survive the native checks reach
the one ``applyInPandas`` per-relation ring stitch (numpy
endpoint-hash chain walk), O(ways in relation) Python per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geometry as G

MISSING_WAYS = "Missing ways"
MEMBER_WITHOUT_ROLE = "Member without role"
NO_OUTER_WAYS = "No outer ways found"
OUTER_UNUSED = "Some outer ways are unused."
OUTER_CUT_EDGES = "Some outer ways form cut edges."
OUTER_INVALID_RINGS = "Some outer ways form invalid rings."
INVALID_POLYGON = "Invalid polygon."
NO_VALID_POLYGON = "No valid polygon found."
INNER_INVALID_RINGS = "Inner ways have invalid ring lines."
INNER_UNUSED = "Inner ways have unused sections."
MISSING_REF = "Referenced way or node not found."  # engine-specific, see above

OUT_SCHEMA = ("relation_id long, geom_wkb binary, reason string,"
              " n_rings int, n_pts long")


def _key(pt) -> tuple[int, int]:
    """Endpoint grid key on the snapped 1e-7 grid (reference fixed
    precision model)."""
    return (round(pt[0] * G.GRID), round(pt[1] * G.GRID))


def _stitch_rings(chains: list[np.ndarray]) -> tuple[list[np.ndarray] | None, str | None]:
    """Stitch way chains into closed rings by endpoint matching
    (strict: the OUTER-role semantics).

    Returns (rings, None), (None, 'unused') when a chain has a free
    end (the reference's dangle), or (None, 'cut') when the walk
    strands a chain (the reference's cut edge).
    """
    key = _key
    degree: dict = {}
    for ch in chains:
        for pt in (ch[0], ch[-1]):
            degree[key(pt)] = degree.get(key(pt), 0) + 1
    # a free end anywhere → dangling way (reference fails on ANY dangle)
    if any(d == 1 for d in degree.values()):
        return None, "unused"

    by_end: dict = {}
    for i, ch in enumerate(chains):
        by_end.setdefault(key(ch[0]), []).append(i)
        by_end.setdefault(key(ch[-1]), []).append(i)

    rings = []
    used = set()
    for start in range(len(chains)):
        if start in used:
            continue
        ring = [chains[start]]
        used.add(start)
        head = key(chains[start][0])
        tail = key(chains[start][-1])
        while tail != head:
            nxt = next((j for j in by_end.get(tail, []) if j not in used), None)
            if nxt is None:
                return None, "cut"
            used.add(nxt)
            ch = chains[nxt]
            if key(ch[0]) == tail:
                ring.append(ch)
                tail = key(ch[-1])
            else:
                ring.append(ch[::-1])
                tail = key(ch[0])
        pts = np.vstack([ring[0]] + [c[1:] for c in ring[1:]])
        if not np.array_equal(pts[0], pts[-1]):
            pts = np.vstack([pts, pts[:1]])
        rings.append(pts)
    return rings, None


def _stitch_rings_lenient(chains: list[np.ndarray]) -> tuple[list[np.ndarray], bool]:
    """INNER-role stitcher mirroring NTS Polygonizer's edge cleanup:
    dangling chains (free ends, removed iteratively like DeleteDangles)
    are *reported*, chains stranded mid-walk (cut edges, the bridge of
    a dumbbell) are *silently dropped* (DeleteCutEdges), and everything
    that closes becomes a ring. Returns (rings, has_dangle) — the
    caller fails on has_dangle only AFTER checking ring validity
    (reference checks GetInvalidRingLines before GetDangles)."""
    key = _key
    remaining = list(range(len(chains)))
    has_dangle = False
    while True:  # iterative: removing a dangle can expose a new free end
        degree: dict = {}
        for i in remaining:
            for pt in (chains[i][0], chains[i][-1]):
                degree[key(pt)] = degree.get(key(pt), 0) + 1
        drop = [
            i for i in remaining
            if key(chains[i][0]) != key(chains[i][-1])
            and (degree[key(chains[i][0])] == 1 or degree[key(chains[i][-1])] == 1)
        ]
        if not drop:
            break
        has_dangle = True
        remaining = [i for i in remaining if i not in set(drop)]

    rings: list[np.ndarray] = []
    open_idx: list[int] = []
    for i in remaining:
        ch = chains[i]
        if key(ch[0]) == key(ch[-1]):  # closed chain is a ring on its own
            pts = ch if np.array_equal(ch[0], ch[-1]) else np.vstack([ch, ch[:1]])
            rings.append(pts)
        else:
            open_idx.append(i)

    by_end: dict = {}
    for i in open_idx:
        by_end.setdefault(key(chains[i][0]), []).append(i)
        by_end.setdefault(key(chains[i][-1]), []).append(i)
    used: set = set()
    for start in open_idx:
        if start in used:
            continue
        walk = [chains[start]]
        used.add(start)
        head = key(chains[start][0])
        tail = key(chains[start][-1])
        closed = True
        while tail != head:
            nxt = next((j for j in by_end.get(tail, []) if j not in used), None)
            if nxt is None:
                closed = False  # stranded walk = cut edges → dropped
                break
            used.add(nxt)
            ch = chains[nxt]
            if key(ch[0]) == tail:
                walk.append(ch)
                tail = key(ch[-1])
            else:
                walk.append(ch[::-1])
                tail = key(ch[0])
        if closed:
            pts = np.vstack([walk[0]] + [c[1:] for c in walk[1:]])
            if not np.array_equal(pts[0], pts[-1]):
                pts = np.vstack([pts, pts[:1]])
            rings.append(pts)
    return rings, has_dangle


def _ring_invalid(ring: np.ndarray) -> bool:
    """NTS EdgeRing.IsValid analog: ≥4 points, nonzero area, simple."""
    return (len(ring) < 4 or abs(G.polygon_area([ring])) == 0.0
            or G.polyline_self_intersects(ring))


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Geometry-only kernel: role/missing-ref taxonomy already handled
    natively upstream — every group here has ≥1 outer way, no empty
    roles, and all way/node references resolved."""
    rid = int(pdf["relation_id"].iloc[0])

    def fail(reason: str) -> pd.DataFrame:
        return pd.DataFrame({"relation_id": [rid], "geom_wkb": [None],
                             "reason": [reason], "n_rings": [None],
                             "n_pts": [None]})

    outer = pdf[pdf["role"] == "outer"]
    inner = pdf[pdf["role"] == "inner"]

    def chains_of(sub: pd.DataFrame) -> list[np.ndarray]:
        out = []
        for coords in sub["coords"]:
            arr = G.snap(np.array([[c["lon"], c["lat"]] for c in coords]))
            if len(arr) >= 2:
                out.append(arr)
        return out

    shells, err = _stitch_rings(chains_of(outer))
    if err:
        return fail(OUTER_UNUSED if err == "unused" else OUTER_CUT_EDGES)
    if any(_ring_invalid(s) for s in shells):
        return fail(OUTER_INVALID_RINGS)
    if not shells:
        return fail(NO_VALID_POLYGON)
    for i in range(len(shells)):
        for j in range(i + 1, len(shells)):
            if G.segments_cross(shells[i], shells[j]):
                return fail(INVALID_POLYGON)

    holes: list[np.ndarray] = []
    if len(inner):
        # lenient stitch: cut edges silently dropped; ring validity is
        # checked BEFORE the dangle failure (reference order)
        holes, has_dangle = _stitch_rings_lenient(chains_of(inner))
        if any(_ring_invalid(h) for h in holes):
            return fail(INNER_INVALID_RINGS)
        if has_dangle:
            return fail(INNER_UNUSED)

    # attach each hole to the shell containing its first vertex;
    # holes contained in no shell are silently dropped (reference
    # BuildPolygonFromRelation.cs:139-150 only adds contained inners)
    polys: list[list[np.ndarray]] = [[s] for s in shells]
    placed: list[np.ndarray] = []
    for h in holes:
        for p_i, s in enumerate(shells):
            if bool(G.points_in_edgesoup(h[:1, 0], h[:1, 1], G.EdgeSoup([[s]]))[0]):
                polys[p_i].append(h)
                placed.append(h)
                break

    wkb = G.polygons_to_wkb(polys)
    n_rings = len(shells) + len(placed)
    n_pts = int(sum(len(r) for r in shells) + sum(len(r) for r in placed))
    return pd.DataFrame({"relation_id": [rid], "geom_wkb": [wkb],
                         "reason": [None], "n_rings": [n_rings],
                         "n_pts": [n_pts]})


def _fail_frame(ids: DataFrame, reason) -> DataFrame:
    """Native failure rows in OUT_SCHEMA shape (reason may be a Column)."""
    reason_col = reason if not isinstance(reason, str) else F.lit(reason)
    return ids.select(
        "relation_id",
        F.lit(None).cast("binary").alias("geom_wkb"),
        reason_col.cast("string").alias("reason"),
        F.lit(None).cast("int").alias("n_rings"),
        F.lit(None).cast("long").alias("n_pts"),
    )


def assemble_polygons(relations: DataFrame, ways: DataFrame,
                      nodes: DataFrame) -> DataFrame:
    """relations ⋈ ways ⋈ nodes → (relation_id, geom_wkb, reason,
    n_rings, n_pts).

    Role/membership taxonomy is decided by a native flag aggregation;
    two bulk equi-joins gather geometry (``posexplode`` keeps vertex
    order); missing way/node references fail natively; only clean
    relations reach the grouped-map ring stitch.
    """
    # explode_outer: a relation with an empty (or null) members array
    # must still emit a flags row — has_way=0 → "Missing ways" (plain
    # explode would drop it from BOTH native_fails and eligible)
    allm = relations.select(
        F.col("id").alias("relation_id"), F.explode_outer("members").alias("m")
    ).select(
        "relation_id",
        F.col("m.member_id").alias("way_id"),
        F.coalesce(F.col("m.role"), F.lit("")).alias("role"),
        F.col("m.member_type").alias("mtype"),
        F.col("m").isNotNull().alias("is_member"),
    )
    # eqNullSafe: the synthetic null-member row (empty members array)
    # has mtype NULL — a plain == would make the flag NULL, and a NULL
    # has_way escapes both the == 0 and == 1 filters below
    is_way = F.col("mtype").eqNullSafe("way")
    flags = allm.groupBy("relation_id").agg(
        F.max((is_way & F.col("role").isin("outer", "inner", "")).cast("int"))
        .alias("has_way"),
        F.max((F.col("is_member") & (F.col("role") == "")).cast("int"))
        .alias("has_empty"),
        F.max((is_way & (F.col("role") == "outer")).cast("int")).alias("has_outer"),
    )
    # reference check order: Missing ways → Member without role → No outer
    fail_flags = flags.where(
        (F.col("has_way") == 0) | (F.col("has_empty") == 1) | (F.col("has_outer") == 0)
    )
    native_fails = _fail_frame(
        fail_flags,
        F.when(F.col("has_way") == 0, MISSING_WAYS)
        .when(F.col("has_empty") == 1, MEMBER_WITHOUT_ROLE)
        .otherwise(NO_OUTER_WAYS),
    )
    eligible = flags.where(
        (F.col("has_way") == 1) & (F.col("has_empty") == 0) & (F.col("has_outer") == 1)
    ).select("relation_id")

    members = allm.where(is_way & F.col("role").isin("outer", "inner")).join(
        eligible, "relation_id", "left_semi"
    ).select("relation_id", "way_id", "role")
    w = ways.select(F.col("id").alias("way_id"), F.col("nodes").alias("node_ids"))
    mw = members.join(w, "way_id", "left").withColumn(
        "way_missing", F.col("node_ids").isNull()
    )
    # way → vertex gather (order preserved via posexplode + sort on pos)
    exploded = mw.select(
        "relation_id", "way_id", "role", "way_missing",
        F.posexplode_outer("node_ids").alias("pos", "node_id"),
    )
    n = nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    joined = exploded.join(n, "node_id", "left").withColumn(
        "node_missing",
        F.col("node_id").isNotNull() & F.col("lon").isNull(),
    )
    per_way = joined.groupBy("relation_id", "way_id", "role").agg(
        F.max(F.col("way_missing").cast("int")).cast("boolean").alias("way_missing"),
        F.max(F.col("node_missing").cast("int")).cast("boolean").alias("node_missing"),
        F.sort_array(
            F.collect_list(F.struct("pos", "lon", "lat"))
        ).alias("pcoords"),
    ).withColumn(
        "coords",
        F.transform(F.col("pcoords"), lambda s: F.struct(s["lon"].alias("lon"),
                                                         s["lat"].alias("lat"))),
    ).drop("pcoords")

    ref_missing = per_way.groupBy("relation_id").agg(
        F.max((F.col("way_missing") | F.col("node_missing")).cast("int")).alias("bad")
    ).where(F.col("bad") == 1).select("relation_id")
    native_missing = _fail_frame(ref_missing, MISSING_REF)

    clean = per_way.join(ref_missing, "relation_id", "left_anti")
    assembled = clean.groupBy("relation_id").applyInPandas(
        _assemble_group, OUT_SCHEMA
    )
    return assembled.unionByName(native_fails).unionByName(native_missing)
