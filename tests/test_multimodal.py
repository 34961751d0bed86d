"""Multimodal operators: resize, rawvid frame sampling, pcm16 audio
features, NamesAnalyzer — real plumbing, deterministic content."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmnightwatch_spark.functions import codecs as K
from osmnightwatch_spark.operators import multimodal as MM


def test_resize_images(spark):
    rng = np.random.default_rng(4)
    rows = []
    origs = {}
    for i in range(6):
        img = rng.integers(0, 256, (16 + 4 * i, 32, 3)).astype(np.uint8)
        fmt = ["raw", "ppm", "raw"][i % 3]
        rows.append((f"i{i}", K.encode(img, fmt), 32, 16 + 4 * i, fmt))
        origs[f"i{i}"] = img
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int,"
                                     " h int, fmt string")
    out = MM.resize_images(df, 8, 8).toPandas().set_index("image_id")
    assert (out.w == 8).all() and (out.h == 8).all() and (out.fmt == "raw").all()
    for i in range(6):
        got = np.frombuffer(out.loc[f"i{i}"].bytes, np.uint8).reshape(8, 8, 3)
        exp = MM.resize_nearest(origs[f"i{i}"], 8, 8)
        np.testing.assert_array_equal(got, exp)


def test_frame_sample(spark):
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (25, 4, 6, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [("v0", MM.encode_rawvid(frames), 6, 4, 25, "rawvid")],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string")
    out = MM.frame_sample(df, every_n=10).toPandas().sort_values("frame_idx")
    assert list(out.frame_idx) == [0, 10, 20]
    got = np.frombuffer(out.iloc[1].bytes, np.uint8).reshape(4, 6, 3)
    np.testing.assert_array_equal(got, frames[10])
    # external container → typed stub, not silent garbage
    bad = spark.createDataFrame(
        [("v1", b"xx", 1, 1, 1, "mp4")],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string")
    with pytest.raises(Exception, match="external decoder"):
        MM.frame_sample(bad).collect()


def test_audio_features(spark):
    t = np.arange(8000)
    wave = (10000 * np.sin(2 * np.pi * t / 100)).astype("<i2")
    silent = np.zeros(100, dtype="<i2")
    df = spark.createDataFrame(
        [("a0", wave.tobytes(), "pcm16"), ("a1", silent.tobytes(), "pcm16")],
        "audio_id string, bytes binary, fmt string")
    out = MM.audio_features(df).toPandas().set_index("audio_id")
    assert out.loc["a0"].n_samples == 8000
    assert abs(out.loc["a0"].rms - 10000 / np.sqrt(2)) < 100
    assert out.loc["a0"].zero_crossings == 2 * 8000 // 100 - 1
    assert out.loc["a1"].rms == 0.0 and out.loc["a1"].peak == 0


def test_names_analyzer(spark):
    from osmnightwatch_spark.plans.analyzers import names_issues

    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, {"name": "*"}), (2, 1.0, 1.0, {"name": "Riga"}),
         (3, 2.0, 2.0, None)],
        "id long, lon double, lat double, tags map<string,string>")
    ways = spark.createDataFrame(
        [(10, [1, 2], {"name": "*"})],
        "id long, nodes array<long>, tags map<string,string>")
    out = names_issues({"nodes": nodes, "ways": ways}).toPandas()
    assert set(zip(out.osm_type, out.osm_id)) == {("N", 1), ("W", 10)}
    assert (out.issue_type == "Invalid characters").all()
    assert (out.details == "*").all()
