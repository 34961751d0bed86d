"""osmnightwatch_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression (NOT a port) of the operator semantics of
DavidKarlas/OsmNightWatch — polygon assembly, spatial filter-and-refine
containment joins, graph-connectivity aggregation, expected-vs-actual
set diffs, CDC micro-batch merge — as idiomatic Spark DataFrame
programs over tables of geotagged image+caption rows.

Layout
------
functions/   pure kernels + Spark column expressions (cell math,
             geometry, image codecs, text analysis)
sources/     synthetic input generators + snapshot catalog (mini
             Iceberg-style manifest layout with lineage + metrics)
operators/   the engine's relational/spatial operators (PIP join,
             kNN join, coverage agg, dedup, similarity, assembly,
             coastline checks, issue diff)
streaming/   CDC compaction + incremental apply
plans/       end-to-end pipelines (the flagship tile/PIP pipeline)
"""

__version__ = "0.1.0"
