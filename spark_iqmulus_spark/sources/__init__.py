"""Point-cloud sources: PLY / LAS / PCD Python DataSources + XYZ text helpers."""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sources(spark: SparkSession) -> None:
    """Register the ply/las/pcd DataSources on a session (idempotent)."""
    from .las import LasDataSource
    from .pcd import PcdDataSource
    from .ply import PlyDataSource

    spark.dataSource.register(PlyDataSource)
    spark.dataSource.register(LasDataSource)
    spark.dataSource.register(PcdDataSource)
