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
