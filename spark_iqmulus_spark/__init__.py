"""spark_iqmulus_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of IGNF/spark-iqmulus, rebuilt Spark-first.

The reference (``/root/reference``, IGNF/spark-iqmulus v0.1.1) is a Spark-1.6
DataSource library that makes LiDAR point clouds (PLY / LAS / XYZ) first-class
DataFrames and delegates the relational algebra to the host engine.  This
package provides:

- ``sources``   — PySpark 4 Python DataSources for PLY / LAS / XYZ
                  (vectorized numpy/Arrow decode, record-aligned partitions,
                  ``fid``/``pid`` provenance columns, format-preserving writers)
- ``plans``     — header-catalog metadata fast paths (COUNT / MIN/MAX from
                  headers without scanning data, mirroring the reference's
                  ExtraStrategies physical plans)
- ``functions`` — schema merge with numeric widening, scaled-coordinate
                  helpers, misc column expressions
- ``operators`` — the declared relational query surface (scan/filter/agg/
                  join/window/sort/set-ops/...) plus large-scale pipeline
                  extensions (dedup, similarity search, text analysis,
                  multimodal columns)
- ``streaming`` — Structured Streaming windowed aggregations with exact
                  batch equivalents

Everything here is public-API PySpark (DataFrame / SQL / Catalyst /
Structured Streaming); Python is confined to scan decode (Arrow-batched) and
clearly-marked Pandas-UDF operators.
"""

__version__ = "0.1.0"
