"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship image pipeline at sf0.001; ``queries`` /
``oracle_sql`` expose the engine's operator surface (SURVEY.md §2)
with DuckDB oracle twins — see
``osmnightwatch_spark/plans/queries.py`` for the definitions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmnightwatch_spark.plans import queries as Q  # noqa: E402
from osmnightwatch_spark.session import _ship_package  # noqa: E402


def _harden(spark: SparkSession) -> None:
    """Make a caller-provided session behave like ours: ship the
    package to executors (the --py-files mechanism) and pin the
    runtime-settable configs the oracles depend on — UTC so naive
    timestamps hash identically to DuckDB's, Arrow for the pandas
    kernels."""
    _ship_package(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: images → geotag → PIP join → tile assign → rollup."""
    _harden(spark)
    return Q.flagship_images(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _harden(spark)  # idempotent; the driver builds its own session
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
