"""As-of join semantics: tie handling, strictness, no-match nulls."""

import pytest
from pyspark.sql import functions as F

from osmnightwatch_spark.operators.asof import asof_join


def _frames(spark):
    probes = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 10, 4), ("c", 10, 5)],
        "k string, te long, pid long",
    )
    refs = spark.createDataFrame(
        [("a", 10, 100, 1.5), ("a", 15, 101, 2.5), ("b", 11, 102, 3.5)],
        "k string, te long, rid long, val double",
    )
    return probes, refs


def test_asof_backward_nonstrict(spark):
    probes, refs = _frames(spark)
    out = asof_join(probes, refs, key="k", t="te", payload=["rid", "val"])
    rows = {r.pid: (r.ref_rid, r.ref_val, r.ref_te) for r in out.collect()}
    assert len(rows) == 5
    # equal-t ref visible (te=10 matches ref te=10)
    assert rows[1] == (100, 1.5, 10)
    # latest at-or-before wins, not just any earlier one
    assert rows[2] == (101, 2.5, 15)
    # probe earlier than every ref, ref key with later-only refs,
    # and an entirely unmatched key → all null
    for pid in (3, 4, 5):
        assert rows[pid] == (None, None, None)


def test_asof_strict_excludes_equal_t(spark):
    probes, refs = _frames(spark)
    out = asof_join(probes, refs, key="k", t="te", payload=["rid"], strict=True)
    rows = {r.pid: r.ref_rid for r in out.collect()}
    assert rows[1] is None          # te=10 ref no longer visible at te=10
    assert rows[2] == 101


def test_asof_probe_columns_pass_through(spark):
    probes, refs = _frames(spark)
    out = asof_join(probes.withColumn("tag", F.lit("x")), refs,
                    key="k", t="te", payload=["rid"])
    assert set(out.columns) == {"k", "te", "pid", "tag", "ref_rid", "ref_te"}
    assert out.where(F.col("tag") != "x").count() == 0


def test_asof_payload_collision_raises(spark):
    probes, refs = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(probes.withColumn("ref_rid", F.lit(1)), refs,
                  key="k", t="te", payload=["rid"])
