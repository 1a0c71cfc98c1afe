"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` / ``oracle_sql()`` aggregate the declared operator surface from
``spark_iqmulus_spark.operators`` (SURVEY.md §2B/§2C) and
``spark_iqmulus_spark.streaming``; each module co-locates its Spark
implementation with its DuckDB oracle so the two cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_iqmulus_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_iqmulus_spark.operators.relational import q_agg_group

    return q_agg_group(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; keys absent here get the
    weaker rows-only check (non-SQL-expressible ops)."""
    return all_oracles()
