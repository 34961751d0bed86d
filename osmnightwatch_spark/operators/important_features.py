"""Important-features analyzer (U3/C7/C8) — expected-tag validation.

Recasts ``Analyzers/ImportantFeatures/ImportantFeaturesAnalyzer.cs``:
a curated dimension of (entity, tag, allowed values) specs joined
against the live entities (:83-103 id-dictionary lookup joins); a row
whose actual tag value is not among the allowed values yields an
issue whose details use the reference's "'a', 'b', or 'c'" list
formatting (:177-186).

Spark shape: broadcast the spec dimension (small, curated), join on
(osm_type, osm_id), compare with native map/array functions — no
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_allowed(col) -> F.Column:
    """"'a', 'b', or 'c'" — reference list formatting (:177-186)."""
    n = F.size(col)
    quoted = F.transform(col, lambda v: F.concat(F.lit("'"), v, F.lit("'")))
    head = F.array_join(F.slice(quoted, 1, n - 1), ", ")
    last = F.element_at(quoted, -1)
    return (
        F.when(n == 1, last)
        .when(n == 2, F.concat(F.element_at(quoted, 1), F.lit(" or "), last))
        .otherwise(F.concat(head, F.lit(", or "), last))
    )


def important_feature_issues(entities: DataFrame, specs: DataFrame) -> DataFrame:
    """entities(osm_type, osm_id, tags MAP) ⋈
    specs(osm_type, osm_id, tag, allowed ARRAY<STRING>) → issues.

    Missing tag and wrong value are both violations (the reference
    treats absent expected tags as failures)."""
    joined = entities.join(
        F.broadcast(specs), ["osm_type", "osm_id"], "inner"
    ).withColumn("actual", F.element_at(F.col("tags"), F.col("tag")))
    bad = joined.where(
        F.col("actual").isNull() | ~F.array_contains(F.col("allowed"), F.col("actual"))
    )
    details = F.concat(
        F.lit("Tag '"), F.col("tag"), F.lit("' is "),
        F.coalesce(F.concat(F.lit("'"), F.col("actual"), F.lit("'")), F.lit("missing")),
        F.lit(", expected "), format_allowed(F.col("allowed")),
    )
    return bad.select(
        F.lit("ImportantFeature").alias("issue_type"),
        F.col("osm_type"),
        F.col("osm_id").cast("long").alias("osm_id"),
        details.alias("details"),
    )
