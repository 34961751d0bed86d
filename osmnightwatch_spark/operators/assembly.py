"""Relation → polygon assembly (the reference's polygonizer recast).

Reference semantics (NOT a port — re-derived from behavior):
``Analyzers/AdminCountPerCountry/BuildPolygonFromRelation.cs:34-161``
builds a MultiPolygon from a relation's member ways and yields a typed
failure reason instead of a geometry when assembly fails; reason
strings (:68-137) are reproduced verbatim so issue outputs diff
cleanly against the reference's.

Spark shape (SURVEY.md J1/A1/U2): the member gather is two bulk
equi-joins (relation→way, way→node) — the reference's explicit
``Utils.BatchLoad`` anti-random-I/O batching (Utils.cs:62-84) is what
joins *are* — followed by one ``applyInPandas`` per-relation ring
stitch (numpy endpoint-hash chain walk). The only Python in the plan
is the per-relation group kernel, which is O(ways in relation).

Failure taxonomy (checked in this order, like the reference):

1. ``Missing ways!``        — a member way is absent from the ways table
                              (or a way references an absent node)
2. ``Member without role!`` — way member whose role is neither
                              outer/inner (empty counts as outer in the
                              reference; explicit other roles fail)
3. ``No outer ways!``       — no outer-role member ways
4. ``Dangles!``             — an endpoint of the outer ring graph has
                              odd degree (chain ends nowhere)
5. ``Cut edges!``           — even degrees but a chain closes through
                              an already-used junction (bridge edge)
6. ``Invalid ring!``        — a stitched ring has < 4 points, zero
                              area, or self-intersects (LinearRing
                              validity)
7. ``Invalid polygon!``     — cross-ring invalidity: shells overlap or
                              a hole lies outside every shell
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geometry as G

MISSING_WAYS = "Missing ways!"
MEMBER_WITHOUT_ROLE = "Member without role!"
NO_OUTER_WAYS = "No outer ways!"
DANGLES = "Dangles!"
CUT_EDGES = "Cut edges!"
INVALID_RING = "Invalid ring!"
INVALID_POLYGON = "Invalid polygon!"

OUT_SCHEMA = "relation_id long, geom_wkb binary, reason string"


def _stitch_rings(chains: list[np.ndarray]) -> tuple[list[np.ndarray] | None, str | None]:
    """Stitch way chains into closed rings by endpoint matching.

    Endpoints are matched on the snapped 1e-7 grid (reference fixed
    precision model). Returns (rings, None) or (None, reason).
    """
    key = lambda pt: (round(pt[0] * G.GRID), round(pt[1] * G.GRID))  # noqa: E731
    # endpoint degree check
    degree: dict = {}
    for ch in chains:
        for pt in (ch[0], ch[-1]):
            degree[key(pt)] = degree.get(key(pt), 0) + 1
    if any(d % 2 for d in degree.values()):
        return None, DANGLES

    unused = list(range(len(chains)))
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
                return None, CUT_EDGES
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
    _ = unused
    return rings, None


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    rid = int(pdf["relation_id"].iloc[0])

    def fail(reason: str) -> pd.DataFrame:
        return pd.DataFrame(
            {"relation_id": [rid], "geom_wkb": [None], "reason": [reason]}
        )

    if pdf["way_missing"].any() or pdf["node_missing"].any():
        return fail(MISSING_WAYS)
    bad_role = ~pdf["role"].isin(["outer", "inner", ""])
    if bad_role.any():
        return fail(MEMBER_WITHOUT_ROLE)
    outer = pdf[pdf["role"].isin(["outer", ""])]
    inner = pdf[pdf["role"] == "inner"]
    if len(outer) == 0:
        return fail(NO_OUTER_WAYS)

    def chains_of(sub: pd.DataFrame) -> list[np.ndarray]:
        out = []
        for coords in sub["coords"]:
            arr = G.snap(np.array([[c["lon"], c["lat"]] for c in coords]))
            if len(arr) >= 2:
                out.append(arr)
        return out

    shells, reason = _stitch_rings(chains_of(outer))
    if reason:
        return fail(reason)
    holes: list[np.ndarray] = []
    if len(inner):
        holes, reason = _stitch_rings(chains_of(inner))
        if reason:
            return fail(reason)

    # ring-level validity (NTS LinearRing semantics): too short,
    # degenerate area, or self-intersecting → "Invalid ring!"
    for ring in (shells or []) + (holes or []):
        if (len(ring) < 4 or abs(G.polygon_area([ring])) == 0.0
                or G.polyline_self_intersects(ring)):
            return fail(INVALID_RING)
    # shells must not cross each other
    for i in range(len(shells)):
        for j in range(i + 1, len(shells)):
            if G.segments_cross(shells[i], shells[j]):
                return fail(INVALID_POLYGON)

    # assign each hole to the shell containing its first vertex
    polys: list[list[np.ndarray]] = [[s] for s in shells]
    for h in holes:
        placed = False
        for p_i, s in enumerate(shells):
            if bool(G.points_in_edgesoup(h[:1, 0], h[:1, 1], G.EdgeSoup([[s]]))[0]):
                polys[p_i].append(h)
                placed = True
                break
        if not placed:
            return fail(INVALID_POLYGON)

    wkb = G.polygons_to_wkb(polys)
    return pd.DataFrame({"relation_id": [rid], "geom_wkb": [wkb], "reason": [None]})


def assemble_polygons(relations: DataFrame, ways: DataFrame,
                      nodes: DataFrame) -> DataFrame:
    """relations ⋈ ways ⋈ nodes → (relation_id, geom_wkb, reason).

    Two bulk equi-joins gather geometry; ``posexplode`` keeps vertex
    order; one grouped-map kernel stitches rings per relation.
    """
    members = relations.select(
        F.col("id").alias("relation_id"), F.explode("members").alias("m")
    ).where(F.col("m.member_type") == "way").select(
        "relation_id",
        F.col("m.member_id").alias("way_id"),
        F.coalesce(F.col("m.role"), F.lit("")).alias("role"),
    )
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
    # relations with no way members at all must still emit a row
    # ("No outer ways!"), not vanish from the output
    no_way_members = relations.select(
        F.col("id").alias("relation_id")
    ).join(members.select("relation_id"), "relation_id", "left_anti").select(
        "relation_id",
        F.lit(None).cast("binary").alias("geom_wkb"),
        F.lit(NO_OUTER_WAYS).alias("reason"),
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
    assembled = per_way.groupBy("relation_id").applyInPandas(
        _assemble_group, OUT_SCHEMA
    )
    return assembled.unionByName(no_way_members)
