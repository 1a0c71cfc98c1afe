"""Training-batch assembly operators: sequence packing + mixture weighting.

Two operations every LLM training-data pipeline runs AFTER curation:

- **Sequence packing** (``q_pack_sequences``): concatenation-style packing
  of tokenized documents into fixed token-budget training sequences
  (GPT-style: the token stream is chunked every BUDGET tokens; documents
  may span a boundary).  The packing is deterministic and shard-parallel:
  documents are assigned to one of 16 hash groups (first hex digit of
  ``md5('pk'||doc_id)``) and packed independently per group in hash order
  — the global-prefix-sum bottleneck of a single stream never appears, and
  group counts stay balanced (md5 is uniform).  At 100 TB the same plan
  holds: the window runs per group (parallel), the explode fans each doc
  to the O(doc_tokens/BUDGET) sequences it touches, and the rollup is one
  hash aggregate bounded by sequence count.

- **Mixture weighting** (``q_mix_weights``): temperature-scaled source
  sampling (the multilingual-sampling rule of XLM-R / mBERT, alpha=0.5):
  sampling weight w_i ∝ sqrt(tokens_i / total), renormalized; the
  oversample factor w_i / natural-share says how many epochs of each
  source a mixture-balanced training run consumes.  One aggregate bounded
  by |sources|, entirely JVM-side arithmetic.

Both are oracle-gated: the DuckDB SQL reproduces the md5 group
assignment, the per-group running offsets, and the sqrt-share weighting
bit for bit (rounding absorbs summation-order ULP drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from .text import _norm

#: fixed token budget of one packed training sequence
PACK_BUDGET = 512

#: number of independent packing groups (parallel shards)
PACK_GROUPS = 16


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tok",
    budget: int = PACK_BUDGET,
    salt: str = "pk",
) -> DataFrame:
    """Assign each document a (group, seq, start offset) under
    concatenation packing: docs are ordered by ``md5(salt||id)`` within 16
    hash groups; running token offsets chunk every ``budget`` tokens.

    Returns the input plus ``grp`` (hex char), ``start`` (group-local
    token offset), ``seq_first``/``seq_last`` (sequence ids the document
    occupies — equal unless the doc crosses a boundary).
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = docs.withColumn("h", h).withColumn("grp", F.substring("h", 1, 1))
    w = Window.partitionBy("grp").orderBy("h", id_col)
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("start")
    d = d.select("*", start)
    return d.select(
        "*",
        F.floor(F.col("start") / budget).alias("seq_first"),
        F.floor((F.col("start") + F.col(tokens_col) - 1) / budget).alias(
            "seq_last"
        ),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group packing audit: how many sequences each hash group yields
    at a 512-token budget, how many docs land in it, how many documents
    span a sequence boundary, and the densest sequence's document count.
    Certifies the whole mechanism — group hashing, per-group running
    offsets, boundary spans, per-sequence membership."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id", F.size(F.split(_norm(), " ")).alias("tok")
    )
    p = pack_sequences(d)
    # fan each doc out to every sequence it touches, count docs per seq
    per_seq = (
        p.select(
            "grp",
            F.explode(F.sequence("seq_first", "seq_last")).alias("seq"),
        )
        .groupBy("grp", "seq")
        .agg(F.count(F.lit(1)).alias("n_docs_in_seq"))
    )
    seq_roll = per_seq.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.max("n_docs_in_seq").alias("max_docs_per_seq"),
    )
    doc_roll = p.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
        F.sum(
            (F.col("seq_last") > F.col("seq_first")).cast("long")
        ).alias("n_split_docs"),
    )
    return doc_roll.join(seq_roll, "grp").select(
        "grp",
        "n_docs",
        "n_seqs",
        "total_tokens",
        "n_split_docs",
        "max_docs_per_seq",
    )


#: temperature for mixture weighting: w ∝ share^ALPHA (0.5 = sqrt rule)
MIX_ALPHA = 0.5


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights per source (alpha = 0.5):
    ``weight_i = sqrt(share_i) / Σ_j sqrt(share_j)``, plus the oversample
    factor weight/share (epochs of that source consumed per balanced
    epoch).  Low-resource sources get factor > 1 (upsampled), the head
    gets < 1 — the knob multilingual/mixed-domain training runs tune."""
    t = load_tables(spark, sf_dir)
    tok = F.size(F.split(_norm(), " "))
    per_src = (
        t["documents"]
        .groupBy("source")
        .agg(F.sum(tok).alias("tokens"))
        .localCheckpoint()  # O(sources) rows; the corpus scan runs once
    )
    total = per_src.agg(
        F.sum("tokens").alias("total"),
        F.sum(F.sqrt(F.col("tokens").cast("double"))).alias("sum_sqrt_tok"),
    )
    # sqrt(share_i)/Σsqrt(share_j) == sqrt(tok_i)/Σsqrt(tok_j): the
    # 1/sqrt(total) factor cancels, so we never divide before the sqrt —
    # fewer rounding sites, identical in both engines
    j = per_src.crossJoin(F.broadcast(total))
    share = F.col("tokens") / F.col("total")
    weight = F.sqrt(F.col("tokens").cast("double")) / F.col("sum_sqrt_tok")
    return j.select(
        "source",
        "tokens",
        F.floor(share * 1000000).cast("long").alias("share_ppm"),
        F.round(weight, 6).alias("weight"),
        F.round(weight / share, 3).alias("oversample"),
    )


QUERIES = {
    "q_pack_sequences": q_pack_sequences,
    "q_mix_weights": q_mix_weights,
}

_SQL_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

ORACLES = {
    "q_pack_sequences": f"""
        WITH d AS (
            SELECT doc_id,
                   len(string_split({_SQL_NORM}, ' ')) AS tok,
                   md5('pk' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ), w AS (
            SELECT *, substr(h, 1, 1) AS grp,
                   sum(tok) OVER (
                       PARTITION BY substr(h, 1, 1)
                       ORDER BY h, doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) - tok AS start
            FROM d
        ), s AS (
            SELECT grp, doc_id, tok, start,
                   CAST(floor(start / {PACK_BUDGET}) AS BIGINT) AS seq_first,
                   CAST(floor((start + tok - 1) / {PACK_BUDGET}) AS BIGINT)
                       AS seq_last
            FROM w
        ), ex AS (
            SELECT grp, u.seq
            FROM s, unnest(generate_series(s.seq_first, s.seq_last)) AS u(seq)
        ), per_seq AS (
            SELECT grp, seq, count(*) AS n_docs_in_seq
            FROM ex GROUP BY grp, seq
        ), seq_roll AS (
            SELECT grp, count(*) AS n_seqs,
                   max(n_docs_in_seq) AS max_docs_per_seq
            FROM per_seq GROUP BY grp
        ), doc_roll AS (
            SELECT grp, count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS total_tokens,
                   CAST(sum(CASE WHEN seq_last > seq_first THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_split_docs
            FROM s GROUP BY grp
        )
        SELECT d.grp, d.n_docs, r.n_seqs, d.total_tokens, d.n_split_docs,
               r.max_docs_per_seq
        FROM doc_roll d JOIN seq_roll r ON d.grp = r.grp
    """,
    "q_mix_weights": f"""
        WITH per_src AS (
            SELECT source,
                   CAST(sum(len(string_split({_SQL_NORM}, ' '))) AS BIGINT)
                       AS tokens
            FROM documents GROUP BY source
        ), tot AS (
            SELECT CAST(sum(tokens) AS BIGINT) AS total,
                   sum(sqrt(CAST(tokens AS DOUBLE))) AS sum_sqrt_tok
            FROM per_src
        )
        SELECT source, tokens,
               CAST(floor(CAST(tokens AS DOUBLE) / total * 1000000) AS BIGINT)
                   AS share_ppm,
               round(sqrt(CAST(tokens AS DOUBLE)) / sum_sqrt_tok, 6) AS weight,
               round((sqrt(CAST(tokens AS DOUBLE)) / sum_sqrt_tok)
                     / (CAST(tokens AS DOUBLE) / total), 3) AS oversample
        FROM per_src, tot
    """,
}


def q_pipeline_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation→packing pipeline (round 8): the step a training
    run executes after q_pipeline_curate — exact-dedup (keep lowest doc_id
    per normalized text) + quality gate (≥10 tokens, ≥0.3 diversity), then
    pack the survivors into 512-token sequences and report the corpus-wide
    batch-assembly summary: docs kept, sequences produced, boundary
    splits, and utilization (token fill of the produced sequences; the
    last partial sequence per group is why it is < 1).  Shuffles: dedup
    window + packing window (both keyed) + one final O(groups) rollup."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    toks = F.split(_norm(), " ")
    n_tok = F.size(toks)
    diversity = F.round(F.size(F.array_distinct(toks)) / n_tok, 6)
    d = t["documents"].select(
        "doc_id",
        _norm().alias("norm"),
        n_tok.alias("tok"),
        diversity.alias("div"),
    )
    w = W.partitionBy("norm").orderBy("doc_id")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("tok") >= 10) & (F.col("div") >= 0.3))
        .select("doc_id", "tok")
    )
    p = pack_sequences(kept)
    per_grp = p.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("tokens"),
        F.floor(
            F.max(F.col("start") + F.col("tok") - 1) / PACK_BUDGET
        ).alias("last_seq"),
        F.sum((F.col("seq_last") > F.col("seq_first")).cast("long")).alias(
            "n_split"
        ),
    )
    return per_grp.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
        F.sum(F.col("last_seq") + 1).alias("n_seqs"),
        F.sum("n_split").alias("n_split_docs"),
        F.round(
            F.sum("tokens") / (F.sum(F.col("last_seq") + 1) * PACK_BUDGET), 6
        ).alias("utilization"),
    )


QUERIES["q_pipeline_pack"] = q_pipeline_pack

ORACLES["q_pipeline_pack"] = f"""
    WITH d AS (
        SELECT doc_id, {_SQL_NORM} AS norm,
               len(string_split({_SQL_NORM}, ' ')) AS tok,
               round(CAST(len(list_distinct(string_split({_SQL_NORM}, ' ')))
                     AS DOUBLE) / len(string_split({_SQL_NORM}, ' ')), 6)
                   AS div
        FROM documents
    ), kept AS (
        SELECT doc_id, tok,
               md5('pk' || CAST(doc_id AS VARCHAR)) AS h
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY norm ORDER BY doc_id
            ) AS rn FROM d
        )
        WHERE rn = 1 AND tok >= 10 AND div >= 0.3
    ), w AS (
        SELECT *, substr(h, 1, 1) AS grp,
               sum(tok) OVER (
                   PARTITION BY substr(h, 1, 1)
                   ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - tok AS start
        FROM kept
    ), per_grp AS (
        SELECT grp, count(*) AS n_docs, sum(tok) AS tokens,
               CAST(floor(max(start + tok - 1) * 1.0 / {PACK_BUDGET})
                    AS BIGINT) AS last_seq,
               sum(CASE WHEN CAST(floor((start + tok - 1.0) / {PACK_BUDGET})
                             AS BIGINT)
                         > CAST(floor(start * 1.0 / {PACK_BUDGET}) AS BIGINT)
                        THEN 1 ELSE 0 END) AS n_split
        FROM w GROUP BY grp
    )
    SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS total_tokens,
           CAST(sum(last_seq + 1) AS BIGINT) AS n_seqs,
           CAST(sum(n_split) AS BIGINT) AS n_split_docs,
           round(CAST(sum(tokens) AS DOUBLE)
                 / (sum(last_seq + 1) * {PACK_BUDGET}), 6) AS utilization
    FROM per_grp
"""
