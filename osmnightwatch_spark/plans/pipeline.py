"""The flagship pipeline: H3-encode → PIP-join → tile-assign → rollup.

This is the BASELINE.json headline path ("images/sec through the
H3-encode + PIP-join + tile-assign pipeline"): given the images table,

1. derive the geotag from ``phash`` (native arithmetic, codegen'd);
2. assign every image a hierarchical tile (native ``cell_col``);
3. broadcast PIP join against the admin polygon set (prepared
   covering; refine only on boundary cells);
4. aggregate: per (admin polygon, tile) image counts — the engine's
   analog of the reference's per-country admin feature counts
   (``AdminCountPerCountryAnalyzer.cs:222-260``).

The point side is never shuffled before the final aggregation, and the
only Python touched at scale is the boundary-cell refine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..operators.pip_join import PreparedPolygons, pip_join
from ..sources import images as I
from ..sources import polygons as P


def flagship(images: DataFrame, tile_res: int = 8, cover_res: int = 7,
             prepared: PreparedPolygons | None = None) -> DataFrame:
    """images (input_hint shape) → (polygon_id, tile, n_images, n_distinct_phash).

    Deterministic output ordering is left to the caller (sort is a
    presentation concern, not pipeline work).
    """
    if prepared is None:
        prepared = PreparedPolygons.build(
            P.valid_polygon_list(rect_only=True), res=cover_res
        )
    pts = I.with_geo(images.select("image_id", "phash"))
    hits = pip_join(pts, prepared)
    tiled = C.attach_cell(hits, tile_res, out="tile")
    return (
        tiled.groupBy("polygon_id", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.countDistinct("phash").alias("n_distinct_phash"),
        )
    )
