"""Issue relation + expected-vs-actual diff + watermark semantics.

Recasts ``OsmNightWatch.Lib/IssuesData.cs`` and the expected-state diff
of ``AdminCountPerCountryAnalyzer.cs:222-260``:

* issue identity = (issue_type, osm_type, osm_id, details)
  (IssuesData.cs:73-89);
* ``FirstTimeSeen`` carry-forward (IssuesData.cs:22-53): new batch
  issues joined against the previous batch; matched rows keep the old
  timestamp (left join + coalesce — no per-row loop);
* last-known-good watermark: advance iff no critical-type issue in the
  batch (conditional aggregate);
* expected ⋈ actual admin diff: one full-outer join classifying
  "lost" (expected only) / "gained" (actual only) per (country,
  admin_level, admin_id), plus "Missing <country>" when a whole
  country vanished — the reference loops countries (:226-257); here
  it's a single relational pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDENTITY = ["issue_type", "osm_type", "osm_id", "details"]


def carry_first_seen(new_issues: DataFrame, old_issues: DataFrame | None,
                     batch_ts: str) -> DataFrame:
    """Attach first_time_seen: previous batch's value if the identical
    issue existed, else the current batch timestamp."""
    if old_issues is None:
        return new_issues.withColumn(
            "first_time_seen", F.lit(batch_ts).cast("timestamp")
        )
    prev = old_issues.select(*IDENTITY, F.col("first_time_seen").alias("_prev_seen"))
    return (
        new_issues.join(prev, IDENTITY, "left")
        .withColumn(
            "first_time_seen",
            F.coalesce(F.col("_prev_seen"), F.lit(batch_ts).cast("timestamp")),
        )
        .drop("_prev_seen")
    )


def last_known_good(issues: DataFrame, critical_types: list[str],
                    batch_ts: str, prev_lkg: str | None) -> str:
    """Advance the LKG watermark iff the batch has no critical issue."""
    n_critical = issues.where(F.col("issue_type").isin(critical_types)).limit(1).count()
    return batch_ts if n_critical == 0 else (prev_lkg or batch_ts)


def admin_diff_issues(expected: DataFrame, actual: DataFrame) -> DataFrame:
    """expected(country_id, country_name, admin_level, admin_id) vs
    actual(same shape) → issue rows.

    One full-outer join on the composite key; null-side classification
    gives both diff directions in one pass (reference does two set
    subtractions per country/level, :240-257)."""
    key = ["country_id", "admin_level", "admin_id"]
    e = expected.select(
        *key, F.col("country_name").alias("e_name"), F.lit(1).alias("e")
    )
    a = actual.select(*key, F.lit(1).alias("a"))
    j = e.join(a, key, "full_outer")
    lost = j.where(F.col("e").isNotNull() & F.col("a").isNull()).select(
        F.concat(F.lit("LostAdmin"), F.col("admin_level").cast("string")).alias("issue_type"),
        F.lit("R").alias("osm_type"),
        F.col("admin_id").cast("long").alias("osm_id"),
        F.concat(
            F.lit("Lost admin in "), F.col("e_name"),
            F.lit(" level "), F.col("admin_level").cast("string"),
        ).alias("details"),
    )
    gained = j.where(F.col("e").isNull() & F.col("a").isNotNull()).select(
        F.concat(F.lit("GainedAdmin"), F.col("admin_level").cast("string")).alias("issue_type"),
        F.lit("R").alias("osm_type"),
        F.col("admin_id").cast("long").alias("osm_id"),
        F.concat(
            F.lit("Gained admin, country "), F.col("country_id").cast("string"),
            F.lit(" level "), F.col("admin_level").cast("string"),
        ).alias("details"),
    )
    # whole-country missing: expected country ids with no actual rows at all
    missing = (
        expected.select("country_id", "country_name").distinct()
        .join(actual.select("country_id").distinct(), "country_id", "left_anti")
        .select(
            F.lit("MissingCountry").alias("issue_type"),
            F.lit("R").alias("osm_type"),
            F.col("country_id").cast("long").alias("osm_id"),
            F.concat(F.lit("Missing "), F.col("country_name")).alias("details"),
        )
    )
    return lost.unionByName(gained).unionByName(missing)


def broken_polygon_issues(assembled: DataFrame, names: DataFrame | None = None) -> DataFrame:
    """assembled(relation_id, geom_wkb, reason) → issues for failures
    (reason strings are the reference's, assembly.py)."""
    broken = assembled.where(F.col("reason").isNotNull())
    return broken.select(
        F.lit("OpenAdminPolygon").alias("issue_type"),
        F.lit("R").alias("osm_type"),
        F.col("relation_id").cast("long").alias("osm_id"),
        F.col("reason").alias("details"),
    )
