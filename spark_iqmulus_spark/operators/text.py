"""Text-analysis operators for training-data pipelines over ``documents``.

All computation is JVM-side (split / regexp / array folds — whole-stage
codegen); nothing here shuffles except the final aggregates.  Every query is
fully oracle-checkable in DuckDB.

- language-ID: marker-token scoring (n-gram heuristic; argmax with a fixed
  tiebreak so results are deterministic)
- quality scoring: length / punctuation / stopword / diversity ratios
- token counting: whitespace tokens and a BPE-ish regex tokenizer
- fingerprinting: min-hash-of-shingles document fingerprint (winnowing-lite,
  using md5 so the oracle reproduces it bit-for-bit)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

def _norm():
    return F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))

#: marker tokens per language for the scoring heuristic (arbitrary but
#: fixed lists over the synthetic vocabulary; the *mechanism* — per-language
#: marker counts + deterministic argmax — is the operator under test).
LANG_MARKERS = {
    "en": ("the", "a", "big"),
    "es": ("small", "fast", "slow"),
    "zh": ("table", "row", "column"),
}

#: stopword list for quality scoring.
STOPWORDS = ("the", "a", "of", "and", "data")

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _tokens():
    return F.split(_norm(), " ")


def _marker_score(lang: str):
    toks = _tokens()
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))



def _docs(t) -> DataFrame:
    """The documents table respread across the session's cores
    (``multimodal._spread``: round-robin repartition ONLY when the scan
    has fewer partitions than defaultParallelism; pass-through with zero
    Exchange on any at-scale input).  Round 14: every tokenize/explode
    map side in this module inherited the parquet scan's 1-2 partitions,
    so the expensive per-row expression work ran on 2 cores at every
    test SF — q_text_perplexity's trigram explode alone measured 18.8 s
    at sf1 on the unspread scan.  Aggregate-only consumers (e.g. the
    1-row corpus count in q_text_tfidf) keep the bare table: an extra
    Exchange buys nothing for a count."""
    from .multimodal import _spread

    return _spread(t["documents"])

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics + per-language rollup."""
    t = load_tables(spark, sf_dir)
    toks = _tokens()
    # sum of token lengths = length of the normalized text minus its
    # separator spaces: the normalized form joins exactly size(toks)-1
    # single spaces (regexp \s+ → ' ' plus trim), so the identity
    # length(norm) - (size(toks) - 1) replaces an interpreted
    # transform+aggregate fold (O(tokens) lambda evals per row) with
    # codegen'd O(1) arithmetic — exact for every row, including the
    # empty/whitespace-only document (1 empty token, 0 = 0)
    sum_tok_len = F.length(_norm()) - (F.size(toks) - F.lit(1))
    return (
        _docs(t)
        .select(
            "lang",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            sum_tok_len.alias("sum_tok_len"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg(F.col("n_distinct") / F.col("n_tokens")), 6).alias("avg_diversity"),
            F.round(F.avg(F.col("sum_tok_len") / F.col("n_tokens")), 6).alias("avg_tok_len"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language classification with deterministic argmax
    (score ties break in en > es > zh order), compared against the labeled
    ``lang`` column as a confusion rollup."""
    t = load_tables(spark, sf_dir)
    s_en, s_es, s_zh = (_marker_score(lang) for lang in ("en", "es", "zh"))
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_zh), "en")
        .when(s_es >= s_zh, "es")
        .otherwise("zh")
    )
    return (
        _docs(t)
        .select(F.col("lang").alias("actual"), pred.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score per document:
    0.3·length_score + 0.3·diversity + 0.2·(1 − punct_ratio) + 0.2·stopword_ratio.
    """
    t = load_tables(spark, sf_dir)
    toks = _tokens()
    n_tok = F.size(toks)
    diversity = F.size(F.array_distinct(toks)) / n_tok
    punct_ratio = (
        F.length(F.regexp_replace(_norm(), "[a-z0-9 ]", "")) / F.length(_norm())
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / n_tok
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = (
        0.3 * length_score + 0.3 * diversity + 0.2 * (1 - punct_ratio) + 0.2 * stop_ratio
    )
    return _docs(t).select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        F.round(diversity, 6).alias("diversity"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
    )


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single punctuation)."""
    t = load_tables(spark, sf_dir)
    ws = F.size(_tokens())
    bpe = F.size(F.regexp_extract_all(_norm(), F.lit(_BPE_RE), 0))
    return (
        _docs(t)
        .select("source", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
        )
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint = lexicographic min of md5(word-3-gram)
    (winnowing-lite: one representative hash per document, reproducible in
    any engine with md5).  Groups sharing a fingerprint are candidate
    near-dups."""
    t = load_tables(spark, sf_dir)
    # materialize the token array first: exprs inside transform lambdas are
    # re-evaluated per element (see dedup._shingles — 12.7× at sf0.1)
    src = _docs(t).select("doc_id", "text", _tokens().alias("words"))
    words = F.col("words")
    grams = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 3),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                    F.element_at(words, i + 3),
                )
            ),
        ),
    ).otherwise(F.array(F.md5(_norm())))
    return src.select(
        "doc_id", F.array_min(grams).alias("fingerprint")
    )


QUERIES = {
    "q_text_stats": q_text_stats,
    "q_text_langid": q_text_langid,
    "q_text_quality": q_text_quality,
    "q_text_tokens": q_text_tokens,
    "q_text_fingerprint": q_text_fingerprint,
}

def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composed pipeline a training-data
    run executes: normalize → exact-dedup (keep lowest doc_id per normalized
    text; at scale the dedup key is ``sha2(norm)`` as in q_dedup_exact —
    equality on the norm itself here keeps the oracle engine-agnostic) →
    quality gate (≥10 tokens, ≥0.3 type/token diversity) → language-ID →
    per (source, predicted-lang) rollup.  One shuffle for the dedup window,
    one for the final aggregate; every scoring expression is codegen'd."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    toks = _tokens()
    n_tok = F.size(toks)
    diversity = F.round(F.size(F.array_distinct(toks)) / n_tok, 6)
    s_en, s_es, s_zh = (_marker_score(lang) for lang in ("en", "es", "zh"))
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_zh), "en")
        .when(s_es >= s_zh, "es")
        .otherwise("zh")
    )
    d = _docs(t).select(
        "doc_id",
        "source",
        _norm().alias("norm"),
        n_tok.alias("n_tok"),
        diversity.alias("div"),
        pred.alias("pred_lang"),
    )
    w = W.partitionBy("norm").orderBy("doc_id")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("n_tok") >= 10) & (F.col("div") >= 0.3))
    )
    return kept.groupBy("source", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


QUERIES["q_pipeline_curate"] = q_pipeline_curate


_SQL_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_SQL_TOKS = f"string_split({_SQL_NORM}, ' ')"


def _sql_marker(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_SQL_TOKS}, t -> t IN ({lst})))"


ORACLES = {
    "q_pipeline_curate": f"""
        WITH d AS (
            SELECT doc_id, source,
                   {_SQL_NORM} AS norm,
                   len({_SQL_TOKS}) AS n_tok,
                   round(CAST(len(list_distinct({_SQL_TOKS})) AS DOUBLE)
                         / len({_SQL_TOKS}), 6) AS div,
                   {_sql_marker(LANG_MARKERS['en'])} AS s_en,
                   {_sql_marker(LANG_MARKERS['es'])} AS s_es,
                   {_sql_marker(LANG_MARKERS['zh'])} AS s_zh
            FROM documents
        ), dd AS (
            SELECT *, row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
            FROM d
        )
        SELECT source,
               CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                    WHEN s_es >= s_zh THEN 'es'
                    ELSE 'zh' END AS pred_lang,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens
        FROM dd
        WHERE rn = 1 AND n_tok >= 10 AND div >= 0.3
        GROUP BY 1, 2
    """,
    "q_text_stats": f"""
        WITH per_doc AS (
            SELECT lang,
                   len({_SQL_TOKS}) AS n_tokens,
                   len(list_distinct({_SQL_TOKS})) AS n_distinct,
                   list_sum(list_transform({_SQL_TOKS}, x -> length(x))) AS sum_tok_len,
                   length(text) AS n_chars
            FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(n_tokens), 4) AS avg_tokens,
               round(avg(CAST(n_distinct AS DOUBLE) / n_tokens), 6) AS avg_diversity,
               round(avg(CAST(sum_tok_len AS DOUBLE) / n_tokens), 6) AS avg_tok_len,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM per_doc GROUP BY lang
    """,
    "q_text_langid": f"""
        WITH scored AS (
            SELECT lang AS actual,
                   {_sql_marker(LANG_MARKERS['en'])} AS s_en,
                   {_sql_marker(LANG_MARKERS['es'])} AS s_es,
                   {_sql_marker(LANG_MARKERS['zh'])} AS s_zh
            FROM documents
        )
        SELECT actual,
               CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                    WHEN s_es >= s_zh THEN 'es'
                    ELSE 'zh' END AS predicted,
               count(*) AS n
        FROM scored GROUP BY 1, 2
    """,
    "q_text_quality": f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len({_SQL_TOKS}) AS DOUBLE) AS n_tok,
                   CAST(len(list_distinct({_SQL_TOKS})) AS DOUBLE) AS n_dist,
                   CAST(length(regexp_replace({_SQL_NORM}, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                     / length({_SQL_NORM}) AS punct_ratio,
                   CAST(len(list_filter({_SQL_TOKS},
                        t -> t IN ({', '.join(f"'{s}'" for s in STOPWORDS)}))) AS DOUBLE)
                     AS n_stop
            FROM documents
        )
        SELECT doc_id,
               round(0.3 * least(n_tok / 100.0, 1.0)
                     + 0.3 * (n_dist / n_tok)
                     + 0.2 * (1 - punct_ratio)
                     + 0.2 * (n_stop / n_tok), 6) AS quality,
               round(n_dist / n_tok, 6) AS diversity,
               round(n_stop / n_tok, 6) AS stop_ratio
        FROM d
    """,
    "q_text_tokens": f"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS total_ws_tokens,
               CAST(sum(len(regexp_extract_all({_SQL_NORM}, '{_BPE_RE}'))) AS BIGINT) AS total_bpe_tokens
        FROM documents GROUP BY source
    """,
    "q_text_fingerprint": f"""
        WITH toks AS (
            SELECT doc_id, {_SQL_TOKS} AS words, {_SQL_NORM} AS norm FROM documents
        )
        SELECT doc_id,
               CASE WHEN len(words) >= 3 THEN
                   list_min(list_transform(generate_series(1, len(words) - 2),
                       i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2])))
               ELSE md5(norm) END AS fingerprint
        FROM toks
    """,
}


#: contamination n-gram width (4 balances recall vs the tiny synthetic
#: vocabulary: 3-grams flag nearly everything, 5-grams almost nothing);
#: benchmark membership = doc_id % 97 == 0
_CONTAM_N = 4


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag corpus documents sharing any
    word-4-gram with a held-out benchmark set (here the deterministic
    ``doc_id % 97 == 0`` slice; in production, the eval suites).  Grams are
    md5-hashed (engine-portable; at scale xxhash64 halves the bytes) and
    the benchmark gram set — small by construction, like real eval suites —
    is broadcast, so the corpus side never shuffles.  The decontamination
    step every training pipeline runs before a data release."""
    t = load_tables(spark, sf_dir)
    # materialized words: no re-split per lambda element (dedup._shingles)
    src = _docs(t).select("doc_id", "source", _tokens().alias("words"))
    words = F.col("words")
    n = _CONTAM_N
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.md5(
                F.concat_ws(
                    " ", *[F.element_at(words, i + k) for k in range(1, n + 1)]
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = src.select(
        "doc_id", "source", F.explode(grams).alias("gram")
    )
    bench = g.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    corpus = g.where(F.col("doc_id") % 97 != 0)
    hits = corpus.join(F.broadcast(bench), "gram").select("doc_id", "source").distinct()
    return hits.groupBy("source").agg(F.count(F.lit(1)).alias("n_contaminated"))


QUERIES["q_contamination"] = q_contamination

ORACLES["q_contamination"] = f"""
    WITH toks AS (
        SELECT doc_id, source, {_SQL_TOKS} AS words FROM documents
    ), g AS (
        SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(words) - 3),
                      i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                               || ' ' || words[i+3]))) AS gram
        FROM toks WHERE len(words) >= 4
    ), bench AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
    ), hits AS (
        SELECT DISTINCT doc_id, source FROM g JOIN bench USING (gram)
        WHERE doc_id % 97 <> 0
    )
    SELECT source, count(*) AS n_contaminated FROM hits GROUP BY source
"""


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    ``tf * ln(N/df)``.  Three aggregations — term frequency per (doc, term),
    document frequency per term, corpus size — then a per-document top-k
    window.  The df and N sides are tiny (vocabulary- and 1-row-sized) and
    broadcast; the only big shuffle is the (doc, term) frequency count,
    partial-aggregated map-side.  Scores are rounded *before* the ranking
    comparison so cross-engine ties resolve identically (term asc)."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    tf = (
        _docs(t)
        .select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # localCheckpoint: tf feeds both the df aggregate and the scored join —
        # without it the tokenize+count pipeline runs twice
        .localCheckpoint()
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = t["documents"].agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")  # per-term frame grows with vocab — AQE decides
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


QUERIES["q_text_tfidf"] = q_text_tfidf

ORACLES["q_text_tfidf"] = f"""
    WITH tf AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ), tfc AS (
        SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2
    ), dfc AS (
        SELECT term, count(*) AS df FROM tfc GROUP BY 1
    ), scored AS (
        SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
               round(tfc.tf * ln((SELECT count(*) FROM documents) * 1.0 / dfc.df),
                     6) AS score
        FROM tfc JOIN dfc USING (term)
    )
    SELECT doc_id, term, tf, df, score, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term ASC) AS rk
          FROM scored)
    WHERE rk <= 3
"""

#: PII patterns (RE2/Java-portable subset): email and a NANP-style phone.
_PII_EMAIL = r"[a-z0-9]+@[a-z]+\.[a-z]+"
_PII_PHONE = r"\+1-555-[0-9]{4}"


def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction scrub + audit: replace email/phone patterns with
    typed placeholders and count what was removed.  The corpus is synthetic
    (no real PII), so deterministic contact strings derived from ``doc_id``
    are appended first — the operator under test is the scrub itself:
    pure ``regexp_replace``/``regexp_count`` column expressions, fully
    codegen'd, no shuffle until the final audit rollup.  The redacted text
    ships as an md5 fingerprint so the oracle certifies the exact output
    bytes without hauling text through the hash compare."""
    t = load_tables(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    per_doc = _docs(t).select(
        "source",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).alias("n_phone"),
        F.md5(redacted).alias("fp"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").alias("emails_redacted"),
        F.sum("n_phone").alias("phones_redacted"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("fp")))).alias(
            "corpus_fp"
        ),
    )


QUERIES["q_text_redact"] = q_text_redact

ORACLES["q_text_redact"] = r"""
    WITH aug AS (
        SELECT source,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    ), per_doc AS (
        SELECT source,
               len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_email,
               len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS n_phone,
               md5(regexp_replace(
                     regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                     '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS fp
        FROM aug
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS emails_redacted,
           CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
           md5(string_agg(fp, '' ORDER BY fp)) AS corpus_fp
    FROM per_doc GROUP BY source
"""

def q_pipeline_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data release pipeline, composed end-to-end:
    normalize → exact-dedup → quality gate → language-ID (the
    `q_pipeline_curate` stages) → benchmark decontamination (drop any doc
    sharing a word-4-gram with the held-out slice, plus the slice itself)
    → deterministic md5-hash train/val split (retry/repartition-stable, as
    in operators.sampling) → per (split, predicted-lang) release stats.

    Composition costs one extra shuffle per stage boundary at most: dedup
    window, gram join (bench side broadcast), final rollup — the anti-join
    and split predicate ride on existing partitionings.  This is the query
    a data-release run actually executes; the oracle reproduces every
    stage in SQL."""
    from pyspark.sql import Window as W

    from .sampling import split_train_test

    t = load_tables(spark, sf_dir)
    toks = _tokens()
    n_tok = F.size(toks)
    diversity = F.round(F.size(F.array_distinct(toks)) / n_tok, 6)
    s_en, s_es, s_zh = (_marker_score(lang) for lang in ("en", "es", "zh"))
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_zh), "en")
        .when(s_es >= s_zh, "es")
        .otherwise("zh")
    )
    d = _docs(t).select(
        "doc_id",
        "source",
        _norm().alias("norm"),
        n_tok.alias("n_tok"),
        diversity.alias("div"),
        pred.alias("pred_lang"),
    )
    w = W.partitionBy("norm").orderBy("doc_id")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("n_tok") >= 10) & (F.col("div") >= 0.3))
    )

    # materialized words: no re-split per lambda element (dedup._shingles)
    gsrc = _docs(t).select("doc_id", _tokens().alias("words"))
    words = F.col("words")
    n = _CONTAM_N
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.md5(
                F.concat_ws(
                    " ", *[F.element_at(words, i + k) for k in range(1, n + 1)]
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = gsrc.select("doc_id", F.explode(grams).alias("gram"))
    bench = g.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    hits = (
        g.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )

    released = (
        kept.where(F.col("doc_id") % 97 != 0)
        .join(hits, "doc_id", "left_anti")
    )
    released = split_train_test(
        released, "doc_id", {"train": 0.9, "val": 0.1}, salt="release"
    )
    return released.groupBy("split", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


QUERIES["q_pipeline_release"] = q_pipeline_release


ORACLES["q_pipeline_release"] = f"""
    WITH d AS (
        SELECT doc_id, source,
               {_SQL_NORM} AS norm,
               len({_SQL_TOKS}) AS n_tok,
               round(CAST(len(list_distinct({_SQL_TOKS})) AS DOUBLE)
                     / len({_SQL_TOKS}), 6) AS div,
               {_sql_marker(LANG_MARKERS['en'])} AS s_en,
               {_sql_marker(LANG_MARKERS['es'])} AS s_es,
               {_sql_marker(LANG_MARKERS['zh'])} AS s_zh
        FROM documents
    ), dd AS (
        SELECT *, row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
        FROM d
    ), kept AS (
        SELECT doc_id, n_tok,
               CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                    WHEN s_es >= s_zh THEN 'es'
                    ELSE 'zh' END AS pred_lang
        FROM dd WHERE rn = 1 AND n_tok >= 10 AND div >= 0.3
    ), toks AS (
        SELECT doc_id, {_SQL_TOKS} AS words FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(words) - 3),
                      i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                               || ' ' || words[i+3]))) AS gram
        FROM toks WHERE len(words) >= 4
    ), bench AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
    ), hits AS (
        SELECT DISTINCT doc_id FROM g JOIN bench USING (gram)
        WHERE doc_id % 97 <> 0
    ), released AS (
        SELECT k.*,
               CASE WHEN substring(md5('release' || CAST(doc_id AS VARCHAR)), 1, 4)
                         < 'e666' THEN 'train' ELSE 'val' END AS split
        FROM kept k
        WHERE doc_id % 97 <> 0
          AND NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = k.doc_id)
    )
    SELECT split, pred_lang, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens, min(doc_id) AS first_doc
    FROM released GROUP BY 1, 2
"""


def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary construction: top-50 word bigrams by document
    frequency (the counting pass behind tokenizer/vocab building and BPE
    merge selection).  Explode → two-level aggregate (distinct per doc,
    then df count) → global top-k via TakeOrderedAndProject with a
    deterministic (df desc, gram asc) tiebreak."""
    t = load_tables(spark, sf_dir)
    # materialized words: no re-split per lambda element (dedup._shingles)
    src = _docs(t).select("doc_id", _tokens().alias("words"))
    words = F.col("words")
    grams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = (
        src
        .select("doc_id", F.explode(grams).alias("gram"))
        .distinct()
    )
    return (
        per_doc.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("gram"))
        .limit(50)
    )


QUERIES["q_text_vocab"] = q_text_vocab

ORACLES["q_text_vocab"] = f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS words FROM documents
    ), g AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(words) - 1),
                      i -> words[i] || ' ' || words[i+1])) AS gram
        FROM toks WHERE len(words) >= 2
    )
    SELECT gram, count(*) AS df
    FROM g GROUP BY gram
    ORDER BY df DESC, gram ASC
    LIMIT 50
"""


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (feature hashing): map every token into one of 64
    buckets via a portable md5-derived hash and build the global bucket
    histogram — the fixed-dimension featurization step that needs no
    vocabulary (and therefore no shuffle to build one).  The bucket
    function uses ascii(md5-hex) arithmetic so DuckDB reproduces it
    byte-for-byte; at scale the only shuffle is the 64-row aggregate."""
    t = load_tables(spark, sf_dir)
    tok = F.explode(_tokens()).alias("tok")
    h = F.md5(F.col("tok"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 64
    return (
        _docs(t)
        .select(tok)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )


QUERIES["q_feature_hash"] = q_feature_hash

ORACLES["q_feature_hash"] = f"""
    WITH tok AS (
        SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    )
    SELECT (ascii(substring(md5(tok), 1, 1)) * 256
            + ascii(substring(md5(tok), 2, 1))) % 64 AS bucket,
           count(*) AS n_tokens
    FROM tok GROUP BY 1
"""


#: Count-Min sketch layout: 4 hash rows × 64 buckets, md5-derived (portable).
_CMS_SEEDS = ("r0", "r1", "r2", "r3")


def q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters with a full oracle: build a 4×64 CMS
    of token frequencies (hash rows are md5-salted, so DuckDB constructs
    the *identical* sketch), then report the 10 most frequent tokens with
    their true counts and CMS estimates.  The estimate is min over rows of
    the token's bucket count — always >= truth, the classic sketch
    guarantee, here certified exactly rather than asserted
    probabilistically.  At scale the sketch build is one 256-row aggregate
    regardless of corpus size; the sketch is mergeable across partitions
    and days."""
    t = load_tables(spark, sf_dir)
    toks = _docs(t).select(F.explode(_tokens()).alias("tok"))

    def bucket(seed: str):
        h = F.md5(F.concat(F.lit(seed), F.col("tok")))
        return (
            F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
        ) % 64

    # ONE corpus pass: per-token occurrence counts (checkpointed — they
    # feed all four sketch rows AND the true top-10).  Before, each seed's
    # sketch row re-ran the tokenize+explode over the whole corpus and the
    # top-10 paid a sixth pass (guide §2.3 "aggregate before you shuffle"
    # applied to the pass count: 5 corpus-wide explodes → 1).
    tok_counts = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .localCheckpoint()
    )
    # the sketch: counts per (row, bucket), derived from the vocabulary
    # table — bucket count = Σ true_count over the tokens hashing to it,
    # the same integers the per-occurrence groupBy produced
    rows = None
    for seed in _CMS_SEEDS:
        r = tok_counts.groupBy(bucket(seed).alias("bucket")).agg(
            F.sum("true_count").alias("cnt")
        ).withColumn("row", F.lit(seed))
        rows = r if rows is None else rows.unionByName(r)
    # true top-10 tokens
    top = (
        tok_counts
        .orderBy(F.desc("true_count"), F.asc("tok"))
        .limit(10)
    )
    # estimate: min over rows of the token's bucket count
    est = None
    for seed in _CMS_SEEDS:
        e = top.withColumn("row", F.lit(seed)).withColumn(
            "bucket",
            (
                F.ascii(F.substring(F.md5(F.concat(F.lit(seed), F.col("tok"))), 1, 1))
                * 256
                + F.ascii(F.substring(F.md5(F.concat(F.lit(seed), F.col("tok"))), 2, 1))
            )
            % 64,
        )
        est = e if est is None else est.unionByName(e)
    joined = est.join(F.broadcast(rows), ["row", "bucket"])
    return joined.groupBy("tok", "true_count").agg(
        F.min("cnt").alias("cms_estimate")
    )


QUERIES["q_sketch_cms"] = q_sketch_cms

ORACLES["q_sketch_cms"] = f"""
    WITH toks AS (
        SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    rows_ AS (
        SELECT seed,
               (ascii(substring(md5(seed || tok), 1, 1)) * 256
                + ascii(substring(md5(seed || tok), 2, 1))) % 64 AS bucket,
               count(*) AS cnt
        FROM toks, (SELECT unnest(['r0','r1','r2','r3']) AS seed)
        GROUP BY 1, 2
    ),
    top AS (
        SELECT tok, count(*) AS true_count
        FROM toks GROUP BY tok
        ORDER BY true_count DESC, tok ASC LIMIT 10
    ),
    est AS (
        SELECT t.tok, t.true_count, s.seed,
               (ascii(substring(md5(s.seed || t.tok), 1, 1)) * 256
                + ascii(substring(md5(s.seed || t.tok), 2, 1))) % 64 AS bucket
        FROM top t, (SELECT unnest(['r0','r1','r2','r3']) AS seed) s
    )
    SELECT e.tok, e.true_count, min(r.cnt) AS cms_estimate
    FROM est e JOIN rows_ r ON r.seed = e.seed AND r.bucket = e.bucket
    GROUP BY 1, 2
"""


def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus frequency profile (the Zipf-curve audit a tokenizer/vocab
    build starts from): per-token corpus frequency, bucketed by decimal
    magnitude (``length(tf)`` in digits — pure integer arithmetic, exactly
    portable across engines).  One explode + two hash aggregates; shuffle
    volume is bounded by vocabulary size, not corpus size."""
    t = load_tables(spark, sf_dir)
    # explode_outer + isnotnull(text): a plain explode makes the optimizer
    # infer `size(words) > 0` BELOW the Generate, re-inlining the whole
    # tokenizer into a non-codegen Filter (a second interpreted tokenize
    # pass per row — measured 22× on the q_text_repetition bigram stage).
    # split() never returns an empty array and is NULL only for NULL text,
    # so isnotnull(text) (pushed to the parquet scan) + explode_outer is
    # row-identical to the inner explode for every input.
    src = _docs(t).where(F.col("text").isNotNull()).select(
        _tokens().alias("words")
    )
    tf = (
        src.select(F.explode_outer("words").alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    bucket = F.length(F.col("tf").cast("string")).alias("tf_digits")
    return (
        tf.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("tf").alias("total_occurrences"),
            F.max("tf").alias("max_tf"),
        )
        .orderBy("tf_digits")
    )


QUERIES["q_text_zipf"] = q_text_zipf

ORACLES["q_text_zipf"] = f"""
    WITH toks AS (
        SELECT unnest({_SQL_TOKS}) AS token FROM documents
    ), tf AS (
        SELECT token, count(*) AS tf FROM toks
        WHERE token != '' GROUP BY token
    )
    SELECT CAST(length(CAST(tf AS VARCHAR)) AS INTEGER) AS tf_digits,
           count(*) AS n_tokens,
           CAST(sum(tf) AS BIGINT) AS total_occurrences,
           CAST(max(tf) AS BIGINT) AS max_tf
    FROM tf GROUP BY 1
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filters (Gopher, Rae et al. 2021 §A1.1):
    flag documents whose most frequent word-bigram covers >= 10% of all
    bigrams (``top-2-gram fraction``) or whose duplicated word-trigrams
    cover >= 20% of all trigrams (``duplicate-3-gram fraction``), rolled
    up per source.  Thresholds are compared with integer arithmetic
    (``max_bi*10 >= total_bi``) so both engines agree bit-for-bit.

    Scale shape: n-gram arrays are built per row in codegen (no explode
    for the duplicate count — ``size - size(array_distinct)`` stays
    inside the row); only the top-bigram pass explodes, and its two
    aggregates are keyed by doc_id so partial aggregation bounds the
    shuffle by per-doc vocabulary, never corpus size."""
    t = load_tables(spark, sf_dir)
    # materialized words: no re-split per lambda element (dedup._shingles)
    src = (
        _docs(t)
        .select("doc_id", "source", _tokens().alias("words"))
        .where(F.size("words") >= 3)
    )
    w = F.col("words")
    bi = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    tri = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(w, i),
            F.element_at(w, i + 1),
            F.element_at(w, i + 2),
        ),
    )
    base = src.select("doc_id", "source", bi.alias("bi"), tri.alias("tri"))
    per_doc = base.select(
        "doc_id",
        "source",
        F.size("bi").alias("total_bi"),
        F.size("tri").alias("total_tri"),
        (F.size("tri") - F.size(F.array_distinct("tri"))).alias("dup_tri"),
        "bi",
    )
    # explode_outer: the size(words) >= 3 filter above makes `bi` non-null
    # with ≥ 2 elements, so outer ≡ inner row-for-row — while the inner
    # form makes the optimizer infer `size(bi) > 0` below the Generate,
    # re-inlining the whole bigram transform (with the tokenizer re-split
    # per element) into a non-codegen Filter: measured 9.0 s → 0.4 s for
    # this stage at sf0.1 (22×), identical rows (exceptAll both ways 0)
    max_bi = (
        per_doc.select("doc_id", F.explode_outer("bi").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_bi"))
    )
    m = per_doc.drop("bi").join(max_bi, "doc_id")
    flag_top2 = F.col("max_bi") * 10 >= F.col("total_bi")
    flag_dup3 = F.col("dup_tri") * 5 >= F.col("total_tri")
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(flag_top2.cast("long")).alias("n_flag_top2"),
            F.sum(flag_dup3.cast("long")).alias("n_flag_dup3"),
            F.sum((flag_top2 | flag_dup3).cast("long")).alias("n_flag_any"),
        )
    )


QUERIES["q_text_repetition"] = q_text_repetition

ORACLES["q_text_repetition"] = f"""
    WITH toks AS (
        SELECT doc_id, source, {_SQL_TOKS} AS words FROM documents
    ), base AS (
        SELECT doc_id, source,
               list_transform(generate_series(1, len(words) - 1),
                      i -> words[i] || ' ' || words[i+1]) AS bi,
               list_transform(generate_series(1, len(words) - 2),
                      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS tri
        FROM toks WHERE len(words) >= 3
    ), bic AS (
        SELECT doc_id, max(cnt) AS max_bi FROM (
            SELECT doc_id, gram, count(*) AS cnt FROM (
                SELECT doc_id, unnest(bi) AS gram FROM base
            ) GROUP BY 1, 2
        ) GROUP BY 1
    ), m AS (
        SELECT b.doc_id, source, len(bi) AS total_bi, len(tri) AS total_tri,
               len(tri) - len(list_distinct(tri)) AS dup_tri, max_bi
        FROM base b JOIN bic USING (doc_id)
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN max_bi * 10 >= total_bi THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_top2,
           CAST(sum(CASE WHEN dup_tri * 5 >= total_tri THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup3,
           CAST(sum(CASE WHEN max_bi * 10 >= total_bi
                          OR dup_tri * 5 >= total_tri THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_any
    FROM m GROUP BY source
"""


def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift monitor: per-source word-distribution L1 distance from
    the corpus-wide distribution, entirely in integer parts-per-million —
    the curation dashboard that flags a source whose vocabulary has
    shifted (scraper broke, new domain mixed in, language drift).

    Exactness: per-word frequencies are integer-divided to ppm
    (``obs·10⁶ div total``), so the sum of |p_src − p_corpus| is a plain
    integer — no float summation order anywhere, hash-stable at any
    scale.  Plan: one explode + two hash aggregates + a broadcast-sized
    join of per-word corpus counts (vocab-bounded, not corpus-bounded)."""
    t = load_tables(spark, sf_dir)
    # explode_outer + isnotnull(text): see q_text_zipf — avoids the
    # inferred size(ws)>0 filter that re-inlines the tokenizer into an
    # interpreted pre-Generate Filter; row-identical because split() is
    # never empty and NULL only for NULL text.
    words = (
        _docs(t)
        .where(F.col("text").isNotNull())
        .select("source", _tokens().alias("ws"))
        .select("source", F.explode_outer("ws").alias("w"))
    )
    per_src = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("obs"))
    src_tot = per_src.groupBy("source").agg(F.sum("obs").alias("st"))
    corpus = per_src.groupBy("w").agg(F.sum("obs").alias("cw"))
    ct = words.count()  # scalar: corpus token count (one job, O(1) result)
    joined = (
        per_src.join(F.broadcast(corpus), "w")
        .join(F.broadcast(src_tot), "source")
        .withColumn("p_src", F.expr("obs * 1000000 div st"))
        .withColumn("p_cor", F.expr(f"cw * 1000000 div {ct}"))
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_used"),
        F.sum(F.abs(F.col("p_src") - F.col("p_cor"))).alias("l1_ppm"),
        F.max(F.abs(F.col("p_src") - F.col("p_cor"))).alias("max_word_ppm"),
    )


QUERIES["q_vocab_drift"] = q_vocab_drift

ORACLES["q_vocab_drift"] = f"""
    WITH words AS (
        SELECT source, unnest({_SQL_TOKS}) AS w FROM documents
    ),
    per_src AS (
        SELECT source, w, count(*) AS obs FROM words GROUP BY source, w
    ),
    src_tot AS (
        SELECT source, sum(obs) AS st FROM per_src GROUP BY source
    ),
    corpus AS (
        SELECT w, sum(obs) AS cw FROM per_src GROUP BY w
    ),
    ct AS (SELECT count(*) AS n FROM words),
    joined AS (
        SELECT p.source,
               p.obs * 1000000 // t.st AS p_src,
               c.cw * 1000000 // ct.n AS p_cor
        FROM per_src p
        JOIN corpus c ON c.w = p.w
        JOIN src_tot t ON t.source = p.source
        CROSS JOIN ct
    )
    SELECT source,
           count(*) AS vocab_used,
           CAST(sum(abs(p_src - p_cor)) AS BIGINT) AS l1_ppm,
           CAST(max(abs(p_src - p_cor)) AS BIGINT) AS max_word_ppm
    FROM joined GROUP BY source
"""


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-prep document chunking: overlapping token windows (16 tokens,
    stride 12), rolled up per source with a chunk-level dedup count.

    The chunk table itself is the operator (``doc_id, chunk_idx, chunk``);
    the rollup keeps the oracle output bounded at any SF.  ``n_unique_
    chunks`` counts distinct md5(chunk) — overlapping windows from
    near-identical docs collapse here, the signal a retrieval index cares
    about before embedding.

    Scale shape: chunking is pure per-row codegen (sequence → slice →
    array_join — no explode until the final rollup's single shuffle);
    stride/window are literals so Catalyst folds the arithmetic.  At
    100 TB this is a map-only pass plus one partial-aggregated hash agg.
    """
    t = load_tables(spark, sf_dir)
    src = _docs(t).select("doc_id", "source", _tokens().alias("words"))
    w = F.col("words")
    starts = F.sequence(F.lit(1), F.size(w), F.lit(12))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(w, s, 16), " ")
    )
    per_chunk = src.select(
        "doc_id", "source", F.explode(chunks).alias("chunk")
    )
    n_tok = F.size(F.split("chunk", " "))
    return per_chunk.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct(F.md5("chunk")).alias("n_unique_chunks"),
        F.sum(n_tok).alias("total_chunk_tokens"),
        F.max(n_tok).cast("long").alias("max_chunk_tokens"),
    )


QUERIES["q_chunk_docs"] = q_chunk_docs

ORACLES["q_chunk_docs"] = f"""
    WITH toks AS (
        SELECT doc_id, source, {_SQL_TOKS} AS words FROM documents
    ), chunks AS (
        SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(words), 12),
                      s -> array_to_string(words[s:s+15], ' '))) AS chunk
        FROM toks
    )
    SELECT source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           count(DISTINCT md5(chunk)) AS n_unique_chunks,
           CAST(sum(len(string_split(chunk, ' '))) AS BIGINT)
               AS total_chunk_tokens,
           CAST(max(len(string_split(chunk, ' '))) AS BIGINT)
               AS max_chunk_tokens
    FROM chunks GROUP BY source
"""


def q_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal (CCNet-style line dedup, over
    fixed 10-token spans since the synthetic corpus has no newlines): a
    span is boilerplate when its md5 appears in >= 3 DISTINCT documents;
    report, per source, how many spans/tokens removal would strip.

    Scale shape: segment per-row in codegen → explode → ONE hash
    aggregate keyed by span hash (count distinct docs; partial agg bounds
    the shuffle by span vocabulary) → equi-join occurrences back on the
    hash.  The join's per-key output equals the span's occurrence count
    (each hash carries one count row), so a viral boilerplate span adds
    linear — never quadratic — work; contrast the pair-joins in dedup.py
    which need the MAX_DF stop-shingle cap.
    """
    t = load_tables(spark, sf_dir)
    src = _docs(t).select("doc_id", "source", _tokens().alias("words"))
    w = F.col("words")
    starts = F.sequence(F.lit(1), F.size(w), F.lit(10))
    spans = F.transform(
        starts, lambda s: F.array_join(F.slice(w, s, 10), " ")
    )
    per_span = src.select(
        "doc_id", "source", F.explode(spans).alias("span")
    ).select(
        "doc_id",
        "source",
        F.md5("span").alias("h"),
        F.size(F.split("span", " ")).alias("n_tok"),
    )
    by_hash = per_span.groupBy("h").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    joined = per_span.join(by_hash, "h")
    flagged = (F.col("ndocs") >= 3).cast("long")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(flagged).alias("n_boilerplate_spans"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(F.col("n_tok") * flagged).alias("tokens_removed"),
        F.countDistinct(
            F.when(F.col("ndocs") >= 3, F.col("doc_id"))
        ).alias("n_docs_affected"),
    )


QUERIES["q_boilerplate_spans"] = q_boilerplate_spans

ORACLES["q_boilerplate_spans"] = f"""
    WITH toks AS (
        SELECT doc_id, source, {_SQL_TOKS} AS words FROM documents
    ), spans AS (
        SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(words), 10),
                      s -> array_to_string(words[s:s+9], ' '))) AS span
        FROM toks
    ), hashed AS (
        SELECT doc_id, source, md5(span) AS h,
               len(string_split(span, ' ')) AS n_tok
        FROM spans
    ), by_hash AS (
        SELECT h, count(DISTINCT doc_id) AS ndocs FROM hashed GROUP BY h
    )
    SELECT source,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate_spans,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN ndocs >= 3 THEN n_tok ELSE 0 END) AS BIGINT)
               AS tokens_removed,
           count(DISTINCT CASE WHEN ndocs >= 3 THEN doc_id END)
               AS n_docs_affected
    FROM hashed JOIN by_hash USING (h)
    GROUP BY source
"""
