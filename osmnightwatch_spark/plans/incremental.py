"""Incremental analyze — the reference's minutely loop as one plan.

``Program.cs:75-117`` steady state: apply changeset → compute dirty
set via dependency indexes (``RelationChangesTracker.cs:84-136``) →
re-analyze only the dirty scope → carry issue timestamps forward →
commit. Here (SURVEY.md §3.2 recast):

1. ``apply``: CDC compact + MERGE the node/way/relation snapshots
   (``streaming/cdc``);
2. ``dirty``: changed ids ⋈ lineage tables (node→way→relation, plus
   the recursive relation closure for nested relations);
3. ``recompute``: run the admin validator on the dirty relations only;
   union with the previous assembled state for untouched relations
   (the reference copies unchanged levels forward, :415-418);
4. ``issues``: rebuild state + diff; FirstTimeSeen carried forward
   from the previous issues table.

The invariant tested in ``tests/test_incremental.py``: incremental
output == full recompute on the merged snapshot, for any changeset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.assembly import assemble_polygons
from ..streaming import cdc


def apply_entity_changesets(nodes: DataFrame, ways: DataFrame,
                            relations: DataFrame,
                            node_changes: DataFrame | None,
                            way_changes: DataFrame | None,
                            rel_changes: DataFrame | None):
    """MERGE per entity type (each changeset is entity-shaped:
    op/entity_type/id/version + a payload struct matching that
    entity's snapshot schema). Returns the three merged snapshots and
    a union of compacted key sets for dirty scoping."""
    spark = nodes.sparkSession
    empty = spark.createDataFrame([], "entity_type string, id long")
    keys = empty

    def apply_for(snapshot: DataFrame, changes: DataFrame | None,
                  etype: str) -> DataFrame:
        nonlocal keys
        if changes is None:
            return snapshot
        compacted = cdc.compact_changeset(changes)
        keys = keys.unionByName(
            compacted.select(F.lit(etype).alias("entity_type"), "id")
        )
        return cdc.apply_changeset(snapshot, compacted)

    nodes2 = apply_for(nodes, node_changes, "node")
    ways2 = apply_for(ways, way_changes, "way")
    rels2 = apply_for(relations, rel_changes, "relation")
    return nodes2, ways2, rels2, keys


def dirty_relation_ids(changed_keys: DataFrame, ways: DataFrame,
                       relations: DataFrame) -> DataFrame:
    """Transitive dirty set on the *merged* snapshot: changed nodes
    dirty their ways, changed ways dirty their relations, changed
    relations dirty their ancestors (reverse closure)."""
    changed = lambda t: changed_keys.where(F.col("entity_type") == t).select("id")  # noqa: E731
    n2w = cdc.lineage_from_ways(ways)
    w2r = cdc.lineage_from_relations(relations)
    direct = cdc.dirty_relations(changed("node"), changed("way"),
                                 changed("relation"), n2w, w2r)
    # ancestors: relations containing dirty relations, to fixpoint
    # (the reverse of operators/closure.relation_closure)
    dirty = direct
    for _ in range(8):
        parents = (
            relations.select(F.col("id").alias("rid"), F.explode("members").alias("m"))
            .where(F.col("m.member_type") == "relation")
            .join(dirty, F.col("m.member_id") == dirty.id)
            .select(F.col("rid").alias("id"))
            .distinct()
            .join(dirty, "id", "left_anti")
        )
        if parents.isEmpty():
            break
        dirty = dirty.unionByName(parents).distinct()
    return dirty


def incremental_assemble(prev_assembled: DataFrame, nodes2: DataFrame,
                         ways2: DataFrame, rels2: DataFrame,
                         dirty: DataFrame) -> DataFrame:
    """Re-assemble only dirty relations; carry the rest forward.

    Deleted relations drop out naturally: the dirty set includes their
    ids (from the changeset), and re-running assembly on the merged
    snapshot yields no row for an id that no longer exists.
    """
    dirty_rels = rels2.join(dirty, rels2.id == dirty.id, "left_semi")
    recomputed = assemble_polygons(dirty_rels, ways2, nodes2)
    untouched = prev_assembled.join(
        dirty, prev_assembled.relation_id == dirty.id, "left_anti"
    )
    return untouched.unionByName(recomputed)


def incremental_tile_rollup(base_pts: DataFrame, changes: DataFrame,
                            tile_res: int = 8, prepared=None,
                            prev_rollup: DataFrame | None = None) -> DataFrame:
    """The reference's steady-state loop (``Program.cs:75-117``)
    composed for the images table: micro-batch of image upserts → CDC
    merge → dirty-tile recompute → rollup, as ONE plan.

    ``base_pts`` is the previous snapshot of geotagged points
    (id, phash, lon, lat); ``changes`` is an image changeset
    (op C/M/D, entity_type, id, version, payload struct matching
    base_pts). Steps:

    1. compact + MERGE the changeset onto the snapshot
       (``streaming/cdc``, the reference's ApplyChangeset);
    2. dirty scope = the res-``tile_res`` tiles touched by any change:
       the OLD tile of every deleted/modified id (from the snapshot)
       plus the NEW tile of every upsert payload — the tile-grid analog
       of RelationChangesTracker's inverted dependency probes;
    3. recompute the flagship rollup ONLY over merged points in dirty
       tiles; carry every untouched (polygon, tile) group forward from
       the previous rollup (the reference copies unchanged levels
       forward, AdminCountPerCountryAnalyzer.cs:415-418).

    Equality with a full recompute over the merged snapshot holds
    because a point contributes only to its own tile's groups; the
    DuckDB oracle for the registered query IS the full recompute
    (engine-independent definition), so the green CORRECTNESS row
    proves incremental == full.

    Scale: the dirty tile set is broadcast to both the carry-forward
    anti-join and the recompute semi-join. In the steady-state loop the
    caller MUST pass ``prev_rollup`` — the (small) published rollup of
    ``base_pts`` read back from the previous batch's commit — so each
    micro-batch re-aggregates O(changed tiles), never the full corpus.
    When ``prev_rollup`` is None it is derived from ``base_pts`` inside
    this plan (a full-corpus pass): that form exists for the
    self-contained oracle query and the first batch of a stream, not
    for the steady state.
    """
    from ..functions import cells as C
    from .pipeline import flagship_points

    compacted = cdc.compact_changeset(changes)
    merged = cdc.apply_changeset(base_pts, compacted)

    changed_ids = compacted.select("id").distinct()
    old_tiles = (
        C.attach_cell(base_pts.join(changed_ids, "id", "left_semi"),
                      tile_res, out="tile")
        .select("tile")
    )
    new_tiles = (
        C.attach_cell(compacted.where(F.col("op") != "D").select("payload.*"),
                      tile_res, out="tile")
        .select("tile")
    )
    dirty_tiles = old_tiles.unionByName(new_tiles).distinct()

    prev = (prev_rollup if prev_rollup is not None
            else flagship_points(base_pts, tile_res=tile_res,
                                 prepared=prepared))
    keep = prev.join(F.broadcast(dirty_tiles), "tile", "left_anti")
    dirty_pts = (
        C.attach_cell(merged, tile_res, out="tile")
        .join(F.broadcast(dirty_tiles), "tile", "left_semi")
        .drop("tile")
    )
    fresh = flagship_points(dirty_pts, tile_res=tile_res, prepared=prepared)
    return keep.unionByName(fresh.select(keep.columns))
