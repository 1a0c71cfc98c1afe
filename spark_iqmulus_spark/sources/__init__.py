"""Point-cloud sources: PLY / LAS / PCD Python DataSources + XYZ text helpers."""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sources(spark: SparkSession) -> None:
    """Register the ply/las/pcd DataSources on a session (idempotent), and
    install the fused fast paths: writes (``df.write.format("las")`` on a
    pure scan→filter plan takes the transcode byte path — see
    sources/fused_write.py; ``.option("fusedWrite", "false")`` opts out)
    and reads (stock ``df.count()`` / global min-max aggregates over a
    bare scan answer from file headers — see plans/fused_read.py;
    ``.option("fusedRead", "false")`` or the ``spark.iqmulus.fusedRead``
    conf opts out)."""
    from ..plans.fused_read import install_fused_read
    from .conf_bridge import install_reader_conf_bridge
    from .fused_write import install_fused_write
    from .las import LasDataSource
    from .pcd import PcdDataSource
    from .ply import PlyDataSource

    spark.dataSource.register(PlyDataSource)
    spark.dataSource.register(LasDataSource)
    spark.dataSource.register(PcdDataSource)
    install_fused_write()
    install_fused_read()
    install_reader_conf_bridge()
