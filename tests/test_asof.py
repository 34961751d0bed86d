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


def test_asof_null_payload_not_torn(spark):
    """A NULL inside the MATCHED ref's payload must stay NULL — the
    struct carry makes ref-row presence the only carry-forward signal
    (per-column last(ignorenulls) would inherit the older ref's 100)."""
    probes = spark.createDataFrame([("a", 20, 1)], "k string, te long, pid long")
    refs = spark.createDataFrame(
        [("a", 10, 100, 1.5), ("a", 15, None, 2.5)],
        "k string, te long, rid long, val double",
    )
    out = asof_join(probes, refs, key="k", t="te",
                    payload=["rid", "val"]).collect()[0]
    assert out.ref_te == 15 and out.ref_val == 2.5
    assert out.ref_rid is None  # NOT 100 from the te=10 ref


def test_asof_duplicate_t_tiebreak_deterministic(spark):
    """Duplicate (key, t) refs with distinct payloads: tiebreak pins
    the greatest-tiebreak ref — max_by((t, tiebreak)) semantics —
    regardless of input order or partitioning."""
    probes = spark.createDataFrame([("a", 10, 1)], "k string, te long, pid long")
    rows = [("a", 10, 7, 1.0), ("a", 10, 3, 2.0), ("a", 10, 5, 3.0)]
    for perm in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        refs = spark.createDataFrame(
            perm, "k string, te long, rid long, val double").repartition(4)
        out = asof_join(probes, refs, key="k", t="te",
                        payload=["rid", "val"], tiebreak="rid").collect()[0]
        assert (out.ref_rid, out.ref_val) == (7, 1.0)


def _random_frames(spark, n_probes=300, n_refs=500, keys=7, t_span=1000):
    """Deterministic pseudo-random probe/ref frames via md5 mixing."""
    ids = spark.range(n_probes)
    probes = ids.select(
        (F.conv(F.substring(F.md5(F.concat(F.lit("p"), "id")), 1, 6), 16, 10)
         .cast("long") % keys).cast("string").alias("k"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("q"), "id")), 1, 6), 16, 10)
         .cast("long") % t_span).alias("te"),
        F.col("id").alias("pid"),
    )
    refs = spark.range(n_refs).select(
        (F.conv(F.substring(F.md5(F.concat(F.lit("r"), "id")), 1, 6), 16, 10)
         .cast("long") % keys).cast("string").alias("k"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("s"), "id")), 1, 6), 16, 10)
         .cast("long") % t_span).alias("te"),
        F.col("id").alias("rid"),
        (F.col("id") % 97).cast("double").alias("val"),
    )
    return probes, refs


def test_asof_bucketed_equals_plain(spark):
    """Bucketing is an execution detail: bucketed output == plain
    output on a random fixture (duplicate (k, te) refs present —
    tiebreak pins both paths), across slice widths including ones
    smaller than, comparable to, and larger than the t span."""
    from osmnightwatch_spark.operators.asof import asof_join_bucketed

    probes, refs = _random_frames(spark)
    want = sorted(
        asof_join(probes, refs, key="k", t="te",
                  payload=["rid", "val"], tiebreak="rid").collect())
    for width in (37, 250, 5000):
        got = sorted(
            asof_join_bucketed(probes, refs, key="k", t="te",
                               payload=["rid", "val"], tiebreak="rid",
                               slice_width=width).collect())
        assert got == want, f"slice_width={width}"


def test_asof_bucketed_strict_and_partition_shape(spark):
    """strict mode agrees with the plain path, and the final window
    partitions on the composite (key, slice) struct — the plan-shape
    guarantee that no task receives a whole hot key."""
    from osmnightwatch_spark.operators.asof import asof_join_bucketed

    probes, refs = _random_frames(spark, n_probes=120, n_refs=200)
    want = sorted(asof_join(probes, refs, key="k", t="te",
                            payload=["rid"], strict=True,
                            tiebreak="rid").collect())
    out = asof_join_bucketed(probes, refs, key="k", t="te",
                             payload=["rid"], strict=True,
                             tiebreak="rid", slice_width=100)
    assert sorted(out.collect()) == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_asof_kb" in plan  # windows keyed by the composite struct


def test_asof_bucketed_hot_key_within_2x_of_uniform(spark):
    """Skew guarantee: one key holding 50% of all rows must not
    serialize — bucketed slices keep the hot key parallel, so the
    skewed run finishes within ~2x of the uniform-keys run at the
    same volume (VERDICT r4 #5's acceptance shape, scaled to suite
    budget)."""
    import time

    from osmnightwatch_spark.operators.asof import asof_join_bucketed

    n = 120_000
    t_span = 200_000

    def frames(skewed: bool):
        if skewed:
            # id % 2 == 0 -> key "hot" (50%), rest spread over 31 keys
            key = F.when(F.col("id") % 2 == 0, F.lit("hot")).otherwise(
                (F.col("id") % 31).cast("string"))
        else:
            key = (F.col("id") % 32).cast("string")
        base = spark.range(n).select(
            key.alias("k"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                    16, 10).cast("long") % t_span).alias("te"),
            F.col("id").alias("rid"),
        )
        return (base.where(F.col("id") % 3 == 0)
                .withColumnRenamed("rid", "pid"),
                base.where(F.col("id") % 3 != 0))

    def run(skewed: bool) -> float:
        probes, refs = frames(skewed)
        out = asof_join_bucketed(probes, refs, key="k", t="te",
                                 payload=["rid"], tiebreak="rid",
                                 slice_width=t_span // 64)
        t0 = time.monotonic()
        out.count()
        return time.monotonic() - t0

    run(False)  # JIT/codegen warmup, not timed
    uniform = min(run(False), run(False))
    skew = min(run(True), run(True))
    assert skew <= 2.0 * uniform + 2.0, (skew, uniform)


def test_asof_matches_python_brute_on_random_frames(spark):
    """Independent third implementation: a driver-side brute-force
    as-of (max_by over (t, tiebreak) among refs <= t) must equal the
    union+window engine on random frames, both strict modes."""
    probes, refs = _random_frames(spark, n_probes=200, n_refs=350,
                                  keys=5, t_span=400)
    p_rows = probes.collect()
    r_rows = refs.collect()
    by_key = {}
    for r in r_rows:
        by_key.setdefault(r.k, []).append(r)
    for strict in (False, True):
        out = asof_join(probes, refs, key="k", t="te",
                        payload=["rid", "val"], tiebreak="rid",
                        strict=strict).collect()
        got = {r.pid: (r.ref_rid, r.ref_val, r.ref_te) for r in out}
        assert len(got) == len(p_rows)
        for p in p_rows:
            cands = [r for r in by_key.get(p.k, [])
                     if (r.te < p.te if strict else r.te <= p.te)]
            want = (None, None, None)
            if cands:
                best = max(cands, key=lambda r: (r.te, r.rid))
                want = (best.rid, best.val, best.te)
            assert got[p.pid] == want, (p.pid, strict)
