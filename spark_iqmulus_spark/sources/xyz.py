"""XYZ text source/sink (A3/A21): tab-separated point text files.

The reference's XYZ support is a thin text relation
(``/root/reference/src/main/scala/fr/ign/spark/iqmulus/xyz/XyzRelation.scala:57-70``:
line split, per-schema cast, null-pad missing trailing columns) whose write
path is unimplemented (``prepareJobForWrite = ???``, XyzRelation.scala:55 —
only ``saveAsXyz`` works).  Spark's CSV source covers the exact semantics
(PERMISSIVE mode null-pads short rows), so we use it directly — a Spark-first
replacement rather than a custom source; both read and write work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: default schema: x,y,z float + r,g,b byte (XyzRelation.scala:28-35)
DEFAULT_SCHEMA = T.StructType(
    [
        T.StructField("x", T.FloatType(), False),
        T.StructField("y", T.FloatType(), False),
        T.StructField("z", T.FloatType(), False),
        T.StructField("r", T.ByteType(), True),
        T.StructField("g", T.ByteType(), True),
        T.StructField("b", T.ByteType(), True),
    ]
)


def read_xyz(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read tab-separated XYZ text; missing trailing columns become null."""
    return (
        spark.read.schema(schema or DEFAULT_SCHEMA)
        .options(sep="\t", mode="PERMISSIVE")
        .csv(path)
    )


def write_xyz(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write tab-separated XYZ text (one file set; fid/pid dropped like the
    binary writers strip provenance columns)."""
    cols = [c for c in df.columns if c not in ("fid", "pid")]
    df.select(*cols).write.mode(mode).options(sep="\t").csv(path)
