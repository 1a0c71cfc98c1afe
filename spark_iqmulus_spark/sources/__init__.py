"""Point-cloud sources: PLY / LAS Python DataSources + XYZ text helpers."""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sources(spark: SparkSession) -> None:
    """Register the ply/las DataSources on a session (idempotent)."""
    from .las import LasDataSource
    from .ply import PlyDataSource

    spark.dataSource.register(PlyDataSource)
    spark.dataSource.register(LasDataSource)
