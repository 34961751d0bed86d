"""Deterministic synthetic ``images`` table (the graft's primary input).

Schema is exactly BASELINE.json ``input_hint``:

    images(image_id STRING, bytes BINARY, w INT, h INT, fmt STRING,
           caption STRING, phash LONG)

Everything is a pure function of ``(seed, i)`` — no wall clock, no
global RNG — so any slice of the table can be (re)generated on any
executor, which is how a 10^12-row table would be materialized on a
real cluster (a range partition per task; here ``spark.range`` +
``mapInPandas``).

Skew planting (FIXTURES.md §1): rows with ``i % 5 == 0`` (20%) reuse
one of 3 fixed "city" template images. Their pixel hash — and hence
the phash-derived geotag — is identical per template, concentrating
20% of rows in exactly 3 cells at every resolution. This is the
dense-city skew the north_rule requires the join layer to handle
(salting + adaptive cell split), and it doubles as ground truth for
the exact-dedup operators.

Geotag derivation (documented, shared with tests + SQL oracle —
see ``functions.codecs.lonlat_from_phash``):

    lon = -180 + (phash mod 2^32)/2^32*360
    lat =  -85 + ((phash >> 32) mod 2^32)/2^32*170
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codecs

SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("caption", T.StringType(), False),
    T.StructField("phash", T.LongType(), False),
])

_SIZES = np.array([16, 32, 64], dtype=np.int64)
_FMTS = ["raw", "ppm", "lossy1"]
N_CITIES = 3
CITY_MOD = 5  # i % 5 == 0 → city row (20%)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public-domain splitmix64 constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _synth_pixels(i: int, seed: int) -> np.ndarray:
    """Deterministic HxWx3 uint8 content for row i (vectorized)."""
    mixed = (seed * 0x5851F42D4C957F2D + i) & 0xFFFFFFFFFFFFFFFF
    s = int(_splitmix64(np.array([mixed], dtype=np.uint64))[0])
    w = int(_SIZES[s % 3])
    h = int(_SIZES[(s >> 8) % 3])
    a, b, c = 1 + (s >> 16) % 7, 1 + (s >> 24) % 7, (s >> 32) % 256
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    ch = np.array([1, 3, 5])[None, None, :]
    img = (a * x + b * y * ch + c + (x * y * (1 + s % 5)) // (ch + 2)) % 256
    return img.astype(np.uint8)


def _city_template(t: int, seed: int) -> np.ndarray:
    return _synth_pixels(10_000_000_000 + t, seed)


def generate_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    """Rows for the given id array — pure (seed, i) function."""
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    mix = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    templates = [_city_template(t, seed) for t in range(N_CITIES)]
    template_hashes = [codecs.phash64(t) for t in templates]
    for i, s in zip(ids.tolist(), mix.tolist()):
        if i % CITY_MOD == 0:
            t = i % N_CITIES
            img, fmt = templates[t], "raw"
            ph = template_hashes[t]
            buf = img.tobytes()
        else:
            img = _synth_pixels(i, seed)
            fmt = _FMTS[s % 3]
            buf = codecs.encode(img, fmt)
            decoded = codecs.decode(buf, fmt, img.shape[1], img.shape[0])
            ph = codecs.phash64(decoded)
        h, w, _ = img.shape
        rows["image_id"].append(f"img{i:012d}")
        rows["bytes"].append(buf)
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append(fmt)
        rows["caption"].append(f"synthetic scene {i} tags:t{s % 17} c{s % 101}")
        rows["phash"].append(ph)
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    return pdf


def images_df(spark: SparkSession, n: int, seed: int = 42,
              partitions: int | None = None) -> DataFrame:
    """Distributed generation: one range slice per task."""
    if partitions is None:
        partitions = max(8, min(256, n // 4096 or 1))

    def gen(batches):
        for pdf in batches:
            yield generate_batch(pdf["id"].to_numpy(), seed)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, SCHEMA)


def write_images(spark: SparkSession, path: str, n: int, seed: int = 42) -> str:
    """Materialize (cached): generate once, reuse across runs."""
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        images_df(spark, n, seed).write.mode("overwrite").parquet(path)
    return path


SLIM_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("phash", T.LongType(), False),
])


def write_images_slim(spark: SparkSession, path: str, n: int,
                      seed: int = 42) -> str:
    """Metadata-only images table for scale studies past the disk
    budget: the SAME deterministic generator (pixels are synthesized
    and phash'd per row) but the bytes are dropped before writing —
    the flagship trunk reads only (image_id, phash), so its timing is
    identical while sf10 (20M rows) costs ~0.4 GB instead of ~83 GB.
    """
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    partitions = max(8, min(512, n // 32768 or 1))

    def gen(batches):
        for pdf in batches:
            out = generate_batch(pdf["id"].to_numpy(), seed)
            yield out[["image_id", "phash"]]

    (spark.range(0, n, 1, partitions).mapInPandas(gen, SLIM_SCHEMA)
     .write.mode("overwrite").parquet(path))
    return path


def with_geo(df: DataFrame, phash_col: str = "phash") -> DataFrame:
    """Attach lon/lat — native column arithmetic (JVM-side, no UDF).

    Mirrors ``functions.codecs.lonlat_from_phash`` exactly; arithmetic
    shift + mask behave identically on signed int64 across numpy,
    Spark and DuckDB (two's complement), verified in tests.
    """
    p = f"`{phash_col}`"
    lo = f"CAST(({p} & 4294967295L) AS DOUBLE)"
    hi = f"CAST((shiftright({p}, 32) & 4294967295L) AS DOUBLE)"
    return df.withColumns({
        "lon": F.expr(f"-180.0D + (({lo} / 4294967296.0D) * 360.0D)"),
        "lat": F.expr(f"-85.0D + (({hi} / 4294967296.0D) * 170.0D)"),
    })
