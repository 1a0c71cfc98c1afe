"""Bridge the ``spark.sql.files.ignoreCorruptFiles`` SESSION conf to the
point-cloud sources (VERDICT r11 next #3).

Python data sources are instantiated in a planner-side Python worker with
no SparkSession, so they cannot read session confs — the per-read option
was the only knob, and its default is TRUE (reference parity: the
reference skips unreadable files unconditionally, PlyRelation.scala:101-115,
LasRelation.scala:41-55), the opposite of Spark's global default (false =
fail-fast).  A Spark user who set the session conf to false got silence.

``install_reader_conf_bridge()`` (called by ``register_sources``) patches
``DataFrameReader`` driver-side — where the session IS available — so a
``.load()`` of one of our formats injects the conf value as the
``ignoreCorruptFiles`` read option when

- the conf was EXPLICITLY set on the session (``SQLConf.contains`` — the
  un-set default stays reference-parity TRUE, per the documented source
  semantics), and
- the user did not pass the per-read option themselves (the option always
  wins over the conf, matching Spark's option-over-conf precedence).

The injected ``false`` keeps the metadata fast paths live: the fast-path
option gates (plans/fused_read.py, sources/fused_write.py) treat an
explicit ``ignoreCorruptFiles=false`` as output-neutral, because under
fail-fast the scan either equals the raw files or RAISES — and every
raise case already declines via the header-parse / truncation stat-guard,
surfacing the same failure through the real path.
"""

from __future__ import annotations

_FORMATS = ("ply", "las", "pcd")
_CONF_KEY = "spark.sql.files.ignoreCorruptFiles"

_INSTALLED = False


def _conf_override(spark) -> str | None:
    """The session conf value, ONLY when explicitly set to FALSE (None
    otherwise).  ``RuntimeConfig.get`` falls back to the key's default, so
    explicitness is read from ``SQLConf.contains`` through py4j.

    An explicit TRUE is NOT injected (round-12 self-review): true is
    already the sources' default semantics, but injecting it as a
    per-read option would disqualify every metadata fast path and the
    fused byte-path writes (those gates treat the ignore=true OPTION as
    a deliberate opt-in whose skip/partial semantics the header paths
    cannot prove equivalent) — a user globally setting the conf to its
    de-facto value would silently lose O(files) counts for no behavior
    change.  Only false (fail-fast) changes behavior, so only false is
    bridged."""
    try:
        if not spark._jsparkSession.sessionState().conf().contains(_CONF_KEY):
            return None
        v = str(spark.conf.get(_CONF_KEY))
        return v if v.strip().lower() == "false" else None
    except Exception:
        return None


def install_reader_conf_bridge() -> None:
    """Patch ``DataFrameReader`` so format/options are mirrored on the
    Python wrapper (the same pattern as sources/fused_write.py's writer
    patch) and ``load`` injects the explicitly-set session conf as the
    default ``ignoreCorruptFiles`` option for our formats.  Idempotent;
    non-point-cloud reads are delegated untouched."""
    global _INSTALLED
    if _INSTALLED:
        return
    from pyspark.sql.readwriter import DataFrameReader

    orig_format = DataFrameReader.format
    orig_option = DataFrameReader.option
    orig_options = DataFrameReader.options
    orig_load = DataFrameReader.load

    def _format(self, source):
        self._rc_format = source
        return orig_format(self, source)

    def _option(self, key, value):
        keys = getattr(self, "_rc_opt_keys", None)
        if keys is None:
            keys = self._rc_opt_keys = set()
        keys.add(str(key).lower())
        return orig_option(self, key, value)

    def _options(self, **options):
        keys = getattr(self, "_rc_opt_keys", None)
        if keys is None:
            keys = self._rc_opt_keys = set()
        keys.update(str(k).lower() for k in options)
        return orig_options(self, **options)

    def _load(self, path=None, format=None, schema=None, **options):
        eff_format = format or getattr(self, "_rc_format", None)
        if eff_format in _FORMATS:
            given = set(getattr(self, "_rc_opt_keys", ()) or ())
            given.update(str(k).lower() for k in options)
            if "ignorecorruptfiles" not in given:
                override = _conf_override(self._spark)
                if override is not None:
                    options = dict(options)
                    options["ignoreCorruptFiles"] = override
        return orig_load(self, path=path, format=format, schema=schema, **options)

    DataFrameReader.format = _format
    DataFrameReader.option = _option
    DataFrameReader.options = _options
    DataFrameReader.load = _load
    _INSTALLED = True
