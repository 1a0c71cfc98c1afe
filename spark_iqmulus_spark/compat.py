"""Optional-dependency shims.

``ensure_protobuf`` makes ``google.protobuf`` importable by pointing
``sys.path`` (and ``PYTHONPATH``, so Spark's Python *workers* inherit it) at
the vendored minimal runtime — ONLY when no real protobuf distribution is
installed, so a genuine installation is never shadowed.  This unlocks
PySpark's ``transformWithStateInPandas`` state-server protocol
(``pyspark.sql.streaming.proto.StateMessage_pb2``) in containers without
protobuf.
"""

from __future__ import annotations

import os
import sys

_VENDOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def ensure_protobuf() -> bool:
    """Return True if ``google.protobuf`` is importable, vendoring the
    minimal shim if (and only if) the real package is absent.

    Must run before the SparkSession starts for executor-side coverage:
    Python workers resolve imports from the PYTHONPATH the JVM captured at
    launch.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if _VENDOR_DIR not in sys.path:
        sys.path.insert(0, _VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    if _VENDOR_DIR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR_DIR + (os.pathsep + existing if existing else "")
        )
    # a partially-imported namespace stub would mask the vendored package
    for mod in ("google", "google.protobuf"):
        m = sys.modules.get(mod)
        if m is not None and not getattr(m, "__file__", None):
            del sys.modules[mod]
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf_on_workers(spark) -> bool:
    """ensure_protobuf + make the vendored path visible to Spark-launched
    Python *worker* processes of an ALREADY-RUNNING session.

    A session created after :func:`ensure_protobuf` inherits PYTHONPATH at
    JVM launch; for a pre-existing session (e.g. one handed to us by an
    external harness) the JVM env is fixed, but worker/daemon processes also
    merge the ``PYTHONPATH`` entry of the Python function's ``envVars`` —
    which Spark reads from ``sparkContext.environment`` at function-wrap
    time.  Injecting there covers the transformWithState driver worker too.
    """
    if not ensure_protobuf():
        return False
    try:
        import google.protobuf as gp

        vendored = str(getattr(gp, "__file__", "")).startswith(_VENDOR_DIR)
        if not vendored:
            return True
        env = spark.sparkContext.environment
        existing = env.get("PYTHONPATH", "")
        if _VENDOR_DIR not in existing.split(os.pathsep):
            env["PYTHONPATH"] = (
                _VENDOR_DIR + (os.pathsep + existing if existing else "")
            )
        return True
    except Exception:
        return False
