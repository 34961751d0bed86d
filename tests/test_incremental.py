"""Incremental analyze == full recompute (the ST7 equivalence), node
move dirtying a relation transitively, delete handling, nested-
relation ancestor dirtying."""

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osmnightwatch_spark.operators.assembly import assemble_polygons
from osmnightwatch_spark.plans import incremental as INC

from tests.test_validators_cdc import NODE_SCHEMA, REL_SCHEMA, WAY_SCHEMA, m

CHANGE_NODE_SCHEMA = (
    "op string, entity_type string, id long, version int, "
    "payload struct<id:long, lon:double, lat:double, tags:map<string,string>>"
)


@pytest.fixture(scope="module")
def world(spark):
    nodes = [(i, float(x), float(y)) for i, x, y in [
        (1, 0, 0), (2, 4, 0), (3, 4, 4), (4, 0, 4),
        (11, 10, 0), (12, 14, 0), (13, 14, 4), (14, 10, 4),
    ]]
    ways = [
        (100, [1, 2, 3, 4, 1]),
        (200, [11, 12, 13, 14, 11]),
    ]
    rels = [
        (1000, [m(100, "outer")]),
        (2000, [m(200, "outer")]),
        (3000, [Row(member_id=1000, role="", member_type="relation")]),  # nests 1000
    ]
    return (
        spark.createDataFrame([(i, x, y, None) for i, x, y in nodes], NODE_SCHEMA),
        spark.createDataFrame([(i, ns, None) for i, ns in ways], WAY_SCHEMA),
        spark.createDataFrame([(i, ms, None) for i, ms in rels], REL_SCHEMA),
    )


def test_incremental_equals_full(spark, world):
    nodes, ways, rels = world
    prev = assemble_polygons(rels, ways, nodes)

    # changeset: move node 2 (dirties way 100 → relation 1000 → ancestor 3000)
    node_changes = spark.createDataFrame(
        [("M", "node", 2, 2, Row(id=2, lon=5.0, lat=0.0, tags=None))],
        CHANGE_NODE_SCHEMA)
    n2, w2, r2, keys = INC.apply_entity_changesets(
        nodes, ways, rels, node_changes, None, None)
    assert n2.where("id = 2").collect()[0].lon == 5.0

    dirty = INC.dirty_relation_ids(keys, w2, r2)
    assert set(r.id for r in dirty.collect()) == {1000, 3000}

    inc = INC.incremental_assemble(prev, n2, w2, r2, dirty).toPandas()
    full = assemble_polygons(r2, w2, n2).toPandas()
    inc = inc.sort_values("relation_id").reset_index(drop=True)
    full = full.sort_values("relation_id").reset_index(drop=True)
    assert inc.relation_id.equals(full.relation_id)
    assert inc.reason.fillna("").equals(full.reason.fillna(""))
    assert all(
        (a is None and b is None) or bytes(a) == bytes(b)
        for a, b in zip(inc.geom_wkb, full.geom_wkb)
    )
    # and the untouched relation really was carried forward unchanged
    prev_pdf = prev.toPandas().set_index("relation_id")
    assert bytes(inc.set_index("relation_id").loc[2000].geom_wkb) == \
        bytes(prev_pdf.loc[2000].geom_wkb)


def test_incremental_delete_relation(spark, world):
    nodes, ways, rels = world
    prev = assemble_polygons(rels, ways, nodes)
    rel_changes = spark.createDataFrame(
        [("D", "relation", 2000, 2, None)],
        "op string, entity_type string, id long, version int, "
        "payload struct<id:long, "
        "members:array<struct<member_id:long,role:string,member_type:string>>, "
        "tags:map<string,string>>")
    n2, w2, r2, keys = INC.apply_entity_changesets(
        nodes, ways, rels, None, None, rel_changes)
    assert r2.where("id = 2000").count() == 0
    dirty = INC.dirty_relation_ids(keys, w2, r2)
    inc = INC.incremental_assemble(prev, n2, w2, r2, dirty).toPandas()
    full = assemble_polygons(r2, w2, n2).toPandas()
    # 2000 deleted; 3000 (no way members at all) reports "Missing ways"
    # (reference checks atLeastOneWay before the role check)
    assert set(inc.relation_id) == set(full.relation_id) == {1000, 3000}
    assert full.set_index("relation_id").loc[3000].reason == "Missing ways"


def test_incremental_flagship_equals_full_sf01(spark):
    """VERDICT r3 #3 done-criterion: the composed steady-state loop
    (CDC merge → dirty-tile scope → partial rollup recompute) equals a
    full flagship recompute of the merged snapshot at sf0.1 — both
    sides Spark, so the equality is engine-internal (the registered
    query's DuckDB twin separately proves it against SQL at sf0.01)."""
    import os

    from pyspark.sql import functions as F

    from osmnightwatch_spark.plans import queries as Q
    from osmnightwatch_spark.plans.pipeline import flagship_points

    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    inc = Q.q_incremental_flagship(spark, sf_dir).toPandas()

    # full recompute: rebuild the same merged snapshot, roll up all of it
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    cid = F.col("event_id")
    lon, lat = Q._geo_lonlat(cid)
    base = ev.where(cid % 10 != 0).select(
        cid.alias("id"), ((cid * Q._PHASH_TWIN_MULT) % 1024).alias("phash"),
        lon.alias("lon"), lat.alias("lat"),
    )
    src = ev.where(cid % 10 == 0)
    removed = (
        src.where(cid % 30 == 0).select((cid + 1).alias("id"))
        .unionByName(src.where((cid % 30 != 0) & (cid % 20 == 0))
                     .select((cid + 2).alias("id")))
    )
    mlon, mlat = Q._geo_lonlat(cid + 2 + Q._GEO_SHIFT)
    mods = src.where((cid % 30 != 0) & (cid % 20 == 0)).select(
        (cid + 2).alias("id"),
        (((cid + 2) * Q._PHASH_TWIN_MULT) % 1024).alias("phash"),
        mlon.alias("lon"), mlat.alias("lat"),
    )
    ins = src.where((cid % 30 != 0) & (cid % 20 != 0)).select(
        cid.alias("id"), ((cid * Q._PHASH_TWIN_MULT) % 1024).alias("phash"),
        lon.alias("lon"), lat.alias("lat"),
    )
    merged = (
        base.join(removed, "id", "left_anti").unionByName(mods).unionByName(ins)
    )
    full = flagship_points(merged, prepared=Q._prep_rect()).toPandas()

    key = ["polygon_id", "tile"]
    inc_s = inc.sort_values(key).reset_index(drop=True)
    full_s = full.sort_values(key).reset_index(drop=True)
    assert len(inc_s) == len(full_s) > 0
    assert inc_s[key + ["n_images", "n_distinct_phash"]].equals(
        full_s[key + ["n_images", "n_distinct_phash"]]
    )
    # the batch actually changed something (guard against a vacuous test)
    prev = flagship_points(base, prepared=Q._prep_rect()).toPandas()
    assert not prev.sort_values(key).reset_index(drop=True).equals(full_s)


def test_incremental_prev_rollup_artifact_path(spark):
    """Steady-state form: passing the published prev rollup (read back
    from the previous commit) must give exactly the derived-inside
    result — and is the form whose per-batch plan contains NO
    full-corpus pass over base_pts."""
    import os

    from osmnightwatch_spark.plans import queries as Q
    from osmnightwatch_spark.plans.incremental import incremental_tile_rollup
    from osmnightwatch_spark.plans.pipeline import flagship_points
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    cid = F.col("event_id")
    lon, lat = Q._geo_lonlat(cid)
    base = ev.where(cid % 10 != 0).select(
        cid.alias("id"), ((cid * Q._PHASH_TWIN_MULT) % 1024).alias("phash"),
        lon.alias("lon"), lat.alias("lat"),
    )
    src = ev.where(cid % 10 == 0)
    changes = src.select(
        F.lit("M").alias("op"), F.lit("image").alias("entity_type"),
        (cid + 1).alias("id"), cid.cast("int").alias("version"),
        Q._pt_payload(cid + 1, cid + 1 + Q._GEO_SHIFT).alias("payload"),
    )
    prep = Q._prep_rect()
    prev_art = flagship_points(base, tile_res=8, prepared=prep)

    derived = incremental_tile_rollup(
        base, changes, tile_res=8, prepared=prep).toPandas()
    artifact = incremental_tile_rollup(
        base, changes, tile_res=8, prepared=prep,
        prev_rollup=prev_art).toPandas()

    key = ["polygon_id", "tile"]
    d = derived.sort_values(key).reset_index(drop=True)
    a = artifact.sort_values(key).reset_index(drop=True)
    assert d.equals(a)


def test_incremental_prev_rollup_chains_across_batches(spark):
    """The steady-state loop ACROSS batches: each micro-batch feeds its
    own output back as the next batch's prev_rollup (the published
    artifact), and after three chained batches the result equals one
    full recompute over the final merged snapshot — the composition
    Program.cs:75-117 runs forever."""
    from osmnightwatch_spark.plans import queries as Q
    from osmnightwatch_spark.plans.incremental import incremental_tile_rollup
    from osmnightwatch_spark.plans.pipeline import flagship_points
    from osmnightwatch_spark.streaming import cdc
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    cid = F.col("event_id")
    lon, lat = Q._geo_lonlat(cid)
    base = ev.where(cid % 10 != 0).select(
        cid.alias("id"), ((cid * Q._PHASH_TWIN_MULT) % 1024).alias("phash"),
        lon.alias("lon"), lat.alias("lat"),
    )
    prep = Q._prep_rect()

    def batch(src_mod: int, shift: int):
        src = ev.where(cid % 10 == src_mod)
        return src.select(
            F.lit("M").alias("op"), F.lit("image").alias("entity_type"),
            (cid + shift).alias("id"), cid.cast("int").alias("version"),
            Q._pt_payload(cid + shift, cid + shift + Q._GEO_SHIFT
                          ).alias("payload"),
        )

    snapshot = base
    rollup = flagship_points(base, tile_res=8, prepared=prep)
    for b, (mod, shift) in enumerate([(0, 1), (3, 2), (6, 3)]):
        changes = batch(mod, shift)
        rollup = incremental_tile_rollup(
            snapshot, changes, tile_res=8, prepared=prep,
            prev_rollup=rollup).localCheckpoint(eager=True)
        snapshot = cdc.apply_changeset(
            snapshot, cdc.compact_changeset(changes))

    full = flagship_points(snapshot, tile_res=8, prepared=prep).toPandas()
    inc = rollup.toPandas()[full.columns.tolist()]
    key = ["polygon_id", "tile"]
    assert inc.sort_values(key).reset_index(drop=True).equals(
        full.sort_values(key).reset_index(drop=True))
