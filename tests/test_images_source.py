"""images-table generator: input_hint schema, determinism, per-row
pixel/caption invariants surviving shuffle + parquet, city skew."""

import numpy as np
import pandas as pd
import pytest

from osmnightwatch_spark.functions import codecs as K
from osmnightwatch_spark.sources import images as I

N = 600


@pytest.fixture(scope="module")
def imgs(spark):
    return I.images_df(spark, N, seed=42, partitions=6)


def test_schema_exact(imgs):
    assert [(f.name, f.dataType.simpleString()) for f in imgs.schema.fields] == [
        ("image_id", "string"), ("bytes", "binary"), ("w", "int"), ("h", "int"),
        ("fmt", "string"), ("caption", "string"), ("phash", "bigint"),
    ]


def test_deterministic_regeneration(spark, imgs):
    a = imgs.toPandas().sort_values("image_id").reset_index(drop=True)
    b = (
        I.images_df(spark, N, seed=42, partitions=3)  # different partitioning
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    assert a.image_id.equals(b.image_id) and a.caption.equals(b.caption)
    assert a.phash.equals(b.phash)
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))


def test_row_invariants(imgs):
    pdf = imgs.toPandas()
    assert len(pdf) == N and pdf.image_id.is_unique
    for _, r in pdf.sample(60, random_state=0).iterrows():
        dec = K.decode(r["bytes"], r.fmt, r.w, r.h)
        assert dec.shape == (r.h, r.w, 3)
        if r.fmt == "lossy1":
            # phash computed over the decoded (round-tripped) pixels
            assert K.phash64(dec) == r.phash
        else:
            assert K.phash64(dec) == r.phash
        i = int(r.image_id[3:])
        assert r.caption.startswith(f"synthetic scene {i} ")


def test_city_skew(imgs):
    pdf = imgs.toPandas()
    idx = pdf.image_id.str.slice(3).astype(int)
    city = pdf[idx % I.CITY_MOD == 0]
    assert len(city) == N // I.CITY_MOD
    assert city.phash.nunique() == I.N_CITIES  # 20% of rows in exactly 3 geotags


def test_survives_parquet_and_shuffle(spark, imgs, tmp_path):
    """input_hint: pixels + caption must survive the pipeline
    byte-identically (shuffle + checkpoint)."""
    path = str(tmp_path / "img.parquet")
    imgs.repartition(5, "fmt").write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).toPandas().sort_values("image_id").reset_index(drop=True)
    orig = imgs.toPandas().sort_values("image_id").reset_index(drop=True)
    assert orig.caption.equals(back.caption)
    assert all(x == y for x, y in zip(orig["bytes"], back["bytes"]))
    # decoded-pixel invariant post round-trip
    for _, r in back.sample(20, random_state=1).iterrows():
        dec = K.decode(r["bytes"], r.fmt, r.w, r.h)
        assert K.phash64(dec) == r.phash
