"""Deterministic sampling and dataset splitting for training-data pipelines.

At 100 TB, `df.sample()` / `rand()` are the wrong tool for corpus curation:
they are non-reproducible across retries (a recomputed task re-rolls its
random numbers, so a failed-and-retried stage can emit a *different* sample)
and unstable under repartitioning.  The standard fix is **hash-based
sampling**: a row is kept iff a cryptographic hash of its stable key falls
under a threshold.  Membership is then a pure function of the key — stable
across retries, executors, engines, and reruns — and different salts give
independent samples.

We hash with ``md5`` (same definition in every engine, so the DuckDB oracle
runs the *identical* expression) and compare the first 4 hex digits
lexicographically against ``fraction * 16^4``; keys are uniformly spread, so
the realized rate converges to ``fraction`` (binomial, not exact-n).

The reference delegates all row selection to the host engine (SURVEY.md
§2B); these operators are part of the §2C training-pipeline extension
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables


def _hash_bucket(key: Column, salt: str) -> Column:
    """First 4 hex digits of md5(salt || key) — a uniform draw in
    [0, 16^4) encoded as a lexicographically ordered hex string."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4)


def _threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(round(fraction * 0x10000), "04x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep ≈``fraction`` of rows, decided purely by ``md5(salt||key)``.

    Reproducible across runs/retries/partitionings; disjoint samples come
    from disjoint hash ranges, independent samples from different salts.
    """
    return df.where(_hash_bucket(F.col(key_col), salt) < _threshold(fraction))


def split_train_test(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by partitioning the hash range
    according to ``weights`` (e.g. ``{"train": .8, "val": .1, "test": .1}``).

    Splits are disjoint, exhaustive, and stable: a given key lands in the
    same split forever (the property that prevents train/test leakage when
    the corpus is re-ingested or grows).
    """
    total = sum(weights.values())
    bucket = _hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < F.lit(_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


# ---------------------------------------------------------------------------
# declared queries


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic sample of documents, rolled up by language."""
    t = load_tables(spark, sf_dir)
    s = deterministic_sample(t["documents"], "doc_id", 0.10, salt="s1")
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )


def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split with per-split, per-source stats."""
    t = load_tables(spark, sf_dir)
    s = split_train_test(
        t["documents"], "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return s.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates (downsample the dominant source, keep the rest):
    the `sampleBy` pattern, deterministic so the oracle can replay it."""
    t = load_tables(spark, sf_dir)
    bucket = _hash_bucket(F.col("doc_id"), "s2")
    rate = F.when(F.col("source") == "web", F.lit(_threshold(0.05))).otherwise(
        F.lit(_threshold(0.5))
    )
    return (
        t["documents"]
        .where(bucket < rate)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SAMPLE_FILTER = "substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a'"

QUERIES = {
    "q_sample_hash": q_sample_hash,
    "q_split_train_test": q_split_train_test,
    "q_sample_stratified": q_sample_stratified,
}

ORACLES = {
    "q_sample_hash": f"""
        SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents WHERE {_SAMPLE_FILTER}
        GROUP BY lang
    """,
    "q_split_train_test": """
        SELECT CASE
                 WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'
                 WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                 ELSE 'test'
               END AS split,
               source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
        FROM documents
        GROUP BY 1, 2
    """,
    "q_sample_stratified": """
        SELECT source, count(*) AS n_docs
        FROM documents
        WHERE substr(md5('s2' || CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE WHEN source = 'web' THEN '0ccd' ELSE '8000' END
        GROUP BY source
    """,
}


def q_pc_chips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-chip extraction — the point-cloud → ML-dataset prep step:
    tile the cloud into fixed 2-D chips, compute per-chip features, and
    assign every CHIP (not point) to train/val/test by hash of its grid
    key — the leakage-safe split (points of one chip never straddle
    splits, and membership is stable when the survey grows).  One
    hash aggregate + pure codegen hash expressions."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("z"),
    )
    gx = F.floor(F.col("x") / 1000).cast("long")
    gy = F.floor(F.col("y") / 10).cast("long")
    chips = pts.groupBy(gx.alias("gx"), gy.alias("gy")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("z").alias("sum_z"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    )
    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit("chip:"),
                F.col("gx").cast("string"),
                F.lit(":"),
                F.col("gy").cast("string"),
            )
        ),
        1,
        4,
    )
    split = (
        F.when(bucket < F.lit(_threshold(0.8)), F.lit("train"))
        .when(bucket < F.lit(_threshold(0.9)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return chips.withColumn("split", split)


QUERIES["q_pc_chips"] = q_pc_chips

ORACLES["q_pc_chips"] = f"""
    WITH pts AS (
        SELECT CAST(floor(CAST(p_partkey AS DOUBLE) / 1000) AS BIGINT) AS gx,
               CAST(floor(CAST(p_size AS DOUBLE) / 10) AS BIGINT) AS gy,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS z
        FROM part
    ),
    chips AS (
        SELECT gx, gy,
               count(*) AS n_points,
               CAST(sum(z) AS BIGINT) AS sum_z,
               CAST(min(z) AS BIGINT) AS min_z,
               CAST(max(z) AS BIGINT) AS max_z
        FROM pts GROUP BY gx, gy
    )
    SELECT gx, gy, n_points, sum_z, min_z, max_z,
           CASE WHEN substring(md5('chip:' || CAST(gx AS VARCHAR)
                                   || ':' || CAST(gy AS VARCHAR)), 1, 4)
                     < '{_threshold(0.8)}' THEN 'train'
                WHEN substring(md5('chip:' || CAST(gx AS VARCHAR)
                                   || ':' || CAST(gy AS VARCHAR)), 1, 4)
                     < '{_threshold(0.9)}' THEN 'val'
                ELSE 'test' END AS split
    FROM chips
"""


def q_privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression audit (k=5) over customer quasi-identifiers
    — the privacy gate a dataset release runs before shipping rows whose
    (segment, nation, balance-band) combination could re-identify someone.

    QID = (c_mktsegment, c_nationkey, $1000 account-balance band); any QID
    group with fewer than k=5 members is suppressed.  Output per segment:
    group counts and row counts kept/suppressed.

    Exactness: the balance band is computed in integer cents with a
    +$100k shift so the division operand is always positive — Spark `div`
    truncates toward zero while DuckDB `//` floors, and the shift makes
    the two agree without a float in sight.

    Scale shape: one partial-aggregated hash aggregate on the QID, then a
    segment rollup — two shuffles total, both key-bounded; no joins, no
    row explosion.  At 100 TB the QID cardinality (not the row count)
    bounds the second stage.
    """
    t = load_tables(spark, sf_dir)
    band = F.expr(
        "(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 10000000)"
        " div 100000"
    )
    groups = (
        t["customer"]
        .select("c_mktsegment", "c_nationkey", band.alias("bal_band"))
        .groupBy("c_mktsegment", "c_nationkey", "bal_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    suppressed = (F.col("n") < 5).cast("long")
    return groups.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(suppressed).alias("n_suppressed_groups"),
        F.sum(F.col("n") * (1 - suppressed)).alias("n_rows_kept"),
        F.sum(F.col("n") * suppressed).alias("n_rows_suppressed"),
    )


QUERIES["q_privacy_kanon"] = q_privacy_kanon

ORACLES["q_privacy_kanon"] = """
    WITH groups AS (
        SELECT c_mktsegment, c_nationkey,
               (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 10000000)
                   // 100000 AS bal_band,
               count(*) AS n
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suppressed_groups,
           CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT)
               AS n_rows_kept,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS n_rows_suppressed
    FROM groups GROUP BY c_mktsegment
"""


#: DSIR hashed-feature dimension.  256 buckets is deliberately small: the
#: two distribution tables are then 256 rows each regardless of corpus
#: size, so the re-weighting join is always a broadcast.
DSIR_B = 256

#: docs selected by the resampling step.
DSIR_TOP = 100


def q_sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, arXiv:2302.03169): score every document by how much more likely
    its hashed-unigram features are under a *target* distribution (here:
    the corpus's ``lang = 'en'`` slice) than under the raw corpus, then
    keep the top-``DSIR_TOP`` documents by mean log importance ratio.

    Construction (deterministic and engine-portable):

    - features: tokens hashed into ``DSIR_B`` buckets with the portable
      ascii(md5) bucket (same arithmetic in DuckDB);
    - bucket distributions with add-1 smoothing:
      ``p(b) = (count(b) + 1) / (total + B)`` for target and raw;
    - doc weight = round(avg over tokens of ln(p_t / p_r), 6), rounded
      BEFORE ranking so cross-engine float ties resolve identically
      (doc_id asc tiebreak).

    Scale shape: one token-explode pass feeds both distribution aggregates
    (each collapses to <= B rows map-side) and the per-doc score; the
    bucket->log-ratio table is B rows and explicitly broadcast, so the
    only O(corpus) shuffle is the per-doc average.  Nothing here grows
    with corpus size except linear token traffic — the same property that
    lets DSIR select from trillion-token raw corpora."""
    t = load_tables(spark, sf_dir)
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    tok = (
        t["documents"]
        .select("doc_id", "lang", F.explode(F.split(norm, " ")).alias("tok"))
    )
    h = F.md5(F.col("tok"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % DSIR_B
    tok = tok.select("doc_id", "lang", bucket.alias("b")).localCheckpoint()

    raw = tok.groupBy("b").agg(F.count(F.lit(1)).alias("n_raw"))
    tgt = (
        tok.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_tgt"))
    )
    # full outer on the bounded bucket id space: a bucket unseen in one
    # corpus still gets its smoothed probability
    dist = (
        raw.join(tgt, "b", "full_outer")
        .select(
            "b",
            F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
        )
    )
    totals = dist.agg(
        F.sum("n_raw").alias("tot_raw"), F.sum("n_tgt").alias("tot_tgt")
    )
    ratio = (
        dist.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.col("n_tgt") + 1) / (F.col("tot_tgt") + DSIR_B))
                - F.log((F.col("n_raw") + 1) / (F.col("tot_raw") + DSIR_B))
            ).alias("logratio"),
        )
    )
    scored = (
        tok.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.round(F.avg("logratio"), 6).alias("weight"))
    )
    from pyspark.sql import Window as W

    # top-DSIR_TOP via orderBy+limit, which plans as TakeOrderedAndProject
    # (per-partition heap + driver merge of TOP×partitions rows) — never a
    # SinglePartition window over every per-doc score; the rank window then
    # orders only the DSIR_TOP survivors (plan-pinned in tests/test_plans.py)
    top = scored.orderBy(F.desc("weight"), F.asc("doc_id")).limit(DSIR_TOP)
    w = W.orderBy(F.desc("weight"), F.asc("doc_id"))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "weight", "rk")
    )


QUERIES["q_sample_dsir"] = q_sample_dsir

ORACLES["q_sample_dsir"] = f"""
    WITH tok AS (
        SELECT doc_id, lang,
               (ascii(substring(md5(tok), 1, 1)) * 256
                + ascii(substring(md5(tok), 2, 1))) % {DSIR_B} AS b
        FROM (SELECT doc_id, lang,
                     unnest(string_split(
                         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                         ' ')) AS tok
              FROM documents)
    ), raw AS (
        SELECT b, count(*) AS n_raw FROM tok GROUP BY b
    ), tgt AS (
        SELECT b, count(*) AS n_tgt FROM tok WHERE lang = 'en' GROUP BY b
    ), dist AS (
        SELECT coalesce(raw.b, tgt.b) AS b,
               coalesce(n_raw, 0) AS n_raw, coalesce(n_tgt, 0) AS n_tgt
        FROM raw FULL OUTER JOIN tgt ON raw.b = tgt.b
    ), ratio AS (
        SELECT b,
               ln((n_tgt + 1) * 1.0 / ((SELECT sum(n_tgt) FROM dist) + {DSIR_B}))
               - ln((n_raw + 1) * 1.0 / ((SELECT sum(n_raw) FROM dist) + {DSIR_B}))
                   AS logratio
        FROM dist
    ), scored AS (
        SELECT doc_id, round(avg(logratio), 6) AS weight
        FROM tok JOIN ratio USING (b) GROUP BY doc_id
    )
    SELECT doc_id, weight, rk
    FROM (SELECT *, row_number() OVER (ORDER BY weight DESC, doc_id ASC) AS rk
          FROM scored)
    WHERE rk <= {DSIR_TOP}
"""
