"""Recursive relation closure (J2) — iterative semi-join to fixpoint.

Reference: ``OsmNightWatch/Utils.cs:86-125`` loads child relations of
relations until no new ids appear (nested admin relations). The Spark
shape is the standard iterative-closure loop: keep a frontier of new
ids, join it against the member table for relation-type members, anti-
join against the seen set, repeat until empty. Depth is bounded in
practice (admin hierarchies nest a handful of levels); the loop runs
on the driver but every step is a distributed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relation_closure(relations: DataFrame, seed_ids: DataFrame,
                     max_depth: int = 16) -> DataFrame:
    """All relation ids reachable from ``seed_ids`` (column ``id``)
    through relation-type members, including the seeds."""
    edges = (
        relations.select(F.col("id").alias("parent"), F.explode("members").alias("m"))
        .where(F.col("m.member_type") == "relation")
        .select("parent", F.col("m.member_id").alias("child"))
    )
    seen = seed_ids.select("id").distinct()
    frontier = seen
    for _ in range(max_depth):
        children = (
            frontier.join(edges, frontier.id == edges.parent)
            .select(F.col("child").alias("id"))
            .distinct()
            .join(seen, "id", "left_anti")
        )
        # driver-side fixpoint check: one cheap count per level
        if children.isEmpty():
            break
        seen = seen.unionByName(children).distinct()
        frontier = children
    return seen
