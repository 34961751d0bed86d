"""CDC micro-batch semantics — compaction, apply, dirty-set scoping.

Recasts the reference's changeset machinery:

* ``MergedChangeset.cs:16-102`` merges raw create/modify/delete rows
  into per-entity upsert maps, last-writer-wins by version with
  deletes as tombstones → here a window dedup (ST2);
* ``OsmDatabaseWithReplicationData.ApplyChangeset`` (LMDB puts inside
  a transaction) → here ``apply_changeset``: anti-join the snapshot
  against changed keys, union survivors with non-tombstone payloads —
  the MERGE INTO emulation (no Iceberg runtime jar in this env; the
  snapshot layout in ``sources/catalog.py`` provides the atomic
  commit);
* ``RelationChangesTracker.cs:84-136`` inverted dependency probes →
  ``dirty_relations``: changed node ids ⋈ lineage tables
  node_to_way ⋈ way_to_relation (J7/ST5) — incremental jobs then
  recompute only the dirty scope (ST7).

Changeset schema (FIXTURES.md §6): (op C/M/D, entity_type, id,
version, payload struct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_changeset(changes: DataFrame) -> DataFrame:
    """Last-writer-wins per (entity_type, id): highest version wins;
    among equal versions the later op wins deterministically by op
    ordering D > M > C (a delete+recreate in one batch at the same
    version resolves like the reference's last-applied map write)."""
    op_rank = F.when(F.col("op") == "D", 3).when(F.col("op") == "M", 2).otherwise(1)
    w = Window.partitionBy("entity_type", "id").orderBy(
        F.col("version").desc(), op_rank.desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changeset(snapshot: DataFrame, compacted: DataFrame,
                    key: str = "id") -> DataFrame:
    """Snapshot MERGE: delete tombstones, upsert the rest.

    Equivalent of ``MERGE INTO snapshot USING changes ON key WHEN
    MATCHED AND op='D' THEN DELETE WHEN MATCHED THEN UPDATE WHEN NOT
    MATCHED THEN INSERT`` — expressed as anti-join + union, the
    documented Iceberg-less fallback (SURVEY.md §7.0)."""
    changed_keys = compacted.select(key).distinct()
    untouched = snapshot.join(changed_keys, key, "left_anti")
    # the payload struct is the full entity row (carries its own key)
    upserts = compacted.where(F.col("op") != "D").select("payload.*")
    return untouched.unionByName(upserts, allowMissingColumns=False)


def dirty_relations(changed_nodes: DataFrame, changed_ways: DataFrame,
                    changed_relations: DataFrame,
                    node_to_way: DataFrame, way_to_relation: DataFrame) -> DataFrame:
    """Transitive dirty set: node → way → relation lineage joins plus
    directly-changed entities (ST5/ST7). Input frames carry one column
    ``id``; lineage tables are (node_id, way_id) / (way_id, relation_id).
    Returns distinct relation ids to recompute."""
    ways_from_nodes = (
        changed_nodes.join(node_to_way, changed_nodes.id == node_to_way.node_id)
        .select(F.col("way_id").alias("id"))
    )
    all_ways = changed_ways.select("id").unionByName(ways_from_nodes).distinct()
    rel_from_ways = (
        all_ways.join(way_to_relation, all_ways.id == way_to_relation.way_id)
        .select(F.col("relation_id").alias("id"))
    )
    return rel_from_ways.unionByName(changed_relations.select("id")).distinct()


def lineage_from_ways(ways: DataFrame) -> DataFrame:
    """node_to_way lineage table: explode each way's node array —
    the reference's Tracker_* maps (KeyValueDatabase.cs:151-258)
    maintained as a plain table."""
    return ways.select(
        F.col("id").alias("way_id"), F.explode("nodes").alias("node_id")
    ).select("node_id", "way_id").distinct()


def lineage_from_relations(relations: DataFrame) -> DataFrame:
    """way_to_relation lineage from relation members."""
    return (
        relations.select(F.col("id").alias("relation_id"), F.explode("members").alias("m"))
        .where(F.col("m.member_type") == "way")
        .select(F.col("m.member_id").alias("way_id"), "relation_id")
        .distinct()
    )
