"""Central registry: collects QUERIES / ORACLES from every operator module.

Modules are imported lazily and defensively so one broken optional module
never takes down the whole declared surface.
"""

from __future__ import annotations

import importlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: modules that export QUERIES (name -> callable) and ORACLES (name -> sql)
_MODULES = (
    "spark_iqmulus_spark.operators.relational",
    "spark_iqmulus_spark.operators.relational2",
    "spark_iqmulus_spark.operators.relational3",
    "spark_iqmulus_spark.operators.pointcloud",
    "spark_iqmulus_spark.operators.partitioning",
    "spark_iqmulus_spark.operators.spatial",
    "spark_iqmulus_spark.operators.dedup",
    "spark_iqmulus_spark.operators.graph",
    "spark_iqmulus_spark.operators.sampling",
    "spark_iqmulus_spark.operators.similarity",
    "spark_iqmulus_spark.operators.text",
    "spark_iqmulus_spark.operators.multimodal",
    "spark_iqmulus_spark.streaming.windows",
    "spark_iqmulus_spark.streaming.stateful",
)


def _collect(attr: str) -> dict:
    out: dict = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # keep one broken module from killing all
            print(f"WARNING: {modname} failed to import: {exc!r}", file=sys.stderr)
            continue
        for key, value in getattr(mod, attr, {}).items():
            if key in out:
                raise ValueError(f"duplicate query key {key!r} from {modname}")
            out[key] = value
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect("QUERIES")


def all_oracles() -> dict[str, str]:
    return _collect("ORACLES")
