"""Replication catch-up laddering (streaming/catchup.py): a consumer
far behind converges in few ladder segments with output identical to
sequential batch application."""

import numpy as np
import pandas as pd
import pytest

from osmnightwatch_spark.streaming import catchup as CU
from osmnightwatch_spark.streaming.cdc import apply_changeset, compact_changeset

N_BATCHES = 130
CHANGE_SCHEMA = ("op string, entity_type string, id long, version long,"
                 " payload struct<id:long, val:long>")


def _batch_rows(seq: int):
    """Deterministic changes for batch ``seq`` (1-based): touch 3 ids,
    delete one id every 10 batches, recreate it 5 later."""
    rows = []
    for j in range(3):
        i = (seq * 7 + j * 13) % 40
        rows.append(("M" if seq > 1 else "C", "node", i, seq * 10 + j,
                     {"id": i, "val": seq * 1000 + j}))
    if seq % 10 == 0:
        rows.append(("D", "node", seq % 40, seq * 10 + 9, {"id": seq % 40, "val": -1}))
    return rows


@pytest.fixture(scope="module")
def changes_dir(spark, tmp_path_factory):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("changes"))
    # arrow-written batch files (fast fixture; schema matches what the
    # engine's own writer would produce)
    schema = pa.schema([
        ("op", pa.string()), ("entity_type", pa.string()),
        ("id", pa.int64()), ("version", pa.int64()),
        ("payload", pa.struct([("id", pa.int64()), ("val", pa.int64())])),
    ])
    for seq in range(1, N_BATCHES + 1):
        rows = _batch_rows(seq)
        tbl = pa.Table.from_pylist(
            [dict(zip(("op", "entity_type", "id", "version", "payload"), r))
             for r in rows], schema=schema)
        d = CU.minute_path(root, seq)
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
    # publisher-side consolidation of the aligned hour block [60, 119]
    CU.consolidate_range(spark, root, 60, 60)
    return root


def _initial_snapshot(spark):
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(40), "val": np.zeros(40, dtype=np.int64)})
    )


def test_ladder_plan_shape():
    segs = CU.ladder_plan(0, 130, (60, 1))
    assert len(segs) == 59 + 1 + 11  # minutes to the boundary, one hour, tail
    assert (60, 119, 60) in segs
    covered = sorted(q for s, e, _ in segs for q in range(s, e + 1))
    assert covered == list(range(1, 131))
    # aligned consumer: one hour block + 11 minutes
    assert len(CU.ladder_plan(59, 130, (60, 1))) == 12
    # three-level ladder covers a multi-day range compactly
    segs3 = CU.ladder_plan(0, 4000, (1440, 60, 1))
    assert len(segs3) < 4000 / 10
    with pytest.raises(ValueError):
        CU.ladder_plan(0, 10, (60,))


def test_catchup_equals_sequential(spark, changes_dir):
    snap0 = _initial_snapshot(spark)

    # sequential oracle in plain python (a 130-deep Spark lineage would
    # only test the planner): fold each batch in order, LWW by version
    state = {i: 0 for i in range(40)}
    for seq in range(1, N_BATCHES + 1):
        batch = {}
        for op, _et, i, ver, payload in _batch_rows(seq):
            if i not in batch or ver > batch[i][1]:
                batch[i] = (op, ver, payload)
        for i, (op, _ver, payload) in batch.items():
            if op == "D":
                state.pop(i, None)
            else:
                state[i] = payload["val"]
    expected = pd.DataFrame(
        sorted(state.items()), columns=["id", "val"]
    ).astype("int64").reset_index(drop=True)

    got_df, segs = CU.catchup(spark, snap0, changes_dir, 0, N_BATCHES,
                              granularities=(60, 1))
    got = got_df.toPandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected)
    assert len(segs) == 71 < N_BATCHES


def test_catchup_uses_consolidated_block(spark, changes_dir):
    """The published hour block is read as one file; an unpublished
    block compacts base batches on the fly — results identical."""
    import os

    assert os.path.exists(os.path.join(CU.block_path(changes_dir, 60, 60),
                                       "_SUCCESS"))
    via_block = CU.read_segment(spark, changes_dir, 60, 119, 60).toPandas()
    on_the_fly = compact_changeset(
        CU.read_minutes(spark, changes_dir, 60, 119)).toPandas()
    key = ["entity_type", "id"]
    a = via_block.sort_values(key).reset_index(drop=True)
    b = on_the_fly.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["op", "entity_type", "id", "version"]],
        b[["op", "entity_type", "id", "version"]])
