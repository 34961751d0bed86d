"""Expected-state JSON source + important-features analyzer + J6
incremental crossing join."""

import json

import pandas as pd
from pyspark.sql import functions as F

from osmnightwatch_spark.operators.coastline import (
    crossing_issues, crossing_issues_incremental,
)
from osmnightwatch_spark.operators.important_features import (
    format_allowed, important_feature_issues,
)
from osmnightwatch_spark.sources.expected_state import (
    normalize_expected, read_expected_state,
)

from tests.test_validators_cdc import COAST_SCHEMA, v


def test_expected_state_json_roundtrip(spark, tmp_path):
    docs = [
        {"RelationId": 100, "EnglishName": "Alpha", "Iso2": "AA", "Iso3": "AAA",
         "Admins": {"4": [11, 12], "6": [21]}},
        {"RelationId": 200, "EnglishName": "Beta", "Iso2": "BB", "Iso3": "BBB",
         "Admins": {"4": [31]}},
    ]
    p = tmp_path / "expected.json"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    nested = read_expected_state(spark, str(p))
    assert nested.count() == 2
    flat = normalize_expected(nested).toPandas()
    assert len(flat) == 4
    row = flat[(flat.country_id == 100) & (flat.admin_level == 6)]
    assert list(row.admin_id) == [21] and row.iloc[0].country_name == "Alpha"


def test_format_allowed_variants(spark):
    df = spark.createDataFrame(pd.DataFrame({"i": [1]}))
    out = df.select(
        format_allowed(F.array(F.lit("a"))).alias("one"),
        format_allowed(F.array(F.lit("a"), F.lit("b"))).alias("two"),
        format_allowed(F.array(F.lit("a"), F.lit("b"), F.lit("c"))).alias("three"),
    ).collect()[0]
    assert out.one == "'a'"
    assert out.two == "'a' or 'b'"
    assert out.three == "'a', 'b', or 'c'"


def test_important_feature_issues(spark):
    entities = spark.createDataFrame(
        [("N", 1, {"place": "city"}), ("N", 2, {"place": "hamlet"}), ("N", 3, {})],
        "osm_type string, osm_id long, tags map<string,string>")
    specs = spark.createDataFrame(
        [("N", 1, "place", ["city", "town"]),
         ("N", 2, "place", ["city", "town"]),
         ("N", 3, "place", ["city"])],
        "osm_type string, osm_id long, tag string, allowed array<string>")
    out = important_feature_issues(entities, specs).toPandas().set_index("osm_id")
    assert 1 not in out.index                       # compliant
    assert out.loc[2].details == "Tag 'place' is 'hamlet', expected 'city' or 'town'"
    assert out.loc[3].details == "Tag 'place' is missing, expected 'city'"


def test_crossing_incremental_subset(spark):
    rows = [
        (1, 10, 11, v((0, 0), (4, 4))),
        (2, 12, 13, v((0, 4), (4, 0))),     # crosses 1
        (3, 20, 21, v((10, 0), (14, 4))),
        (4, 22, 23, v((10, 4), (14, 0))),   # crosses 3
    ]
    ways = spark.createDataFrame(rows, COAST_SCHEMA)
    full = crossing_issues(ways).toPandas()
    assert set(full.osm_id) == {1, 2, 3, 4}
    # only way 1 changed → only the (1,2) pair re-checked
    changed = spark.createDataFrame(pd.DataFrame({"id": [1]}))
    inc = crossing_issues_incremental(ways, changed).toPandas()
    assert set(inc.osm_id) == {1, 2}
