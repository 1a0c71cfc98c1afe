"""Extended relational surface: pivot/unpivot, ntile, exact percentiles,
correlated subqueries, grouping sets, lateral explode, conditional
aggregation, null-handling scalars.  Same contract as operators.relational:
every query paired with a DuckDB oracle, deterministic orderings, rounded
float aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import load_tables


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (wide aggregation)."""
    t = load_tables(spark, sf_dir)
    p = (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot two measures into (measure, value) rows + aggregate."""
    t = load_tables(spark, sf_dir)
    stacked = t["lineitem"].selectExpr(
        "l_returnflag",
        "stack(2, 'qty', l_quantity, 'price', l_extendedprice) AS (measure, value)",
    )
    # exact integer cents: the stacked price sum reaches 1e11 at sf1, where
    # a raw double sum is order-dependent past the round-4 boundary
    return stacked.groupBy("l_returnflag", "measure").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("total_cents")
    )


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) quartiles over a total order (unique tiebreak)."""
    t = load_tables(spark, sf_dir)
    w = W.orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        t["orders"]
        .withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): five-way join
    where both ends of each lineitem resolve to a nation and only two
    nation *pairs* survive (OR of the two directions).  The nation filter
    lands on broadcast dims, so the only fact-side work is lineitem joining
    broadcast supplier/orders paths — Catalyst pushes the pair predicate
    below the aggregate."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_0")
                & (F.col("cust_nation") == "NATION_1")
            )
            | (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_0")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            )
        ).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (`<=>`): NULL keys match each other instead of
    dropping out.  Keys are nulled where the comment lacks a marker, so
    both engines see real NULL matches; Spark still plans `<=>` as a hash
    join (EqualNullSafe is an equi-key), not a nested loop."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].select(
        F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("k"),
        F.col("o_totalprice"),
    )
    b = (
        t["customer"]
        .select(F.nullif(F.col("c_custkey") % 50, F.lit(0)).alias("k2"))
        .groupBy("k2")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    joined = a.join(b, a.k.eqNullSafe(F.col("k2")))
    return joined.groupBy(F.coalesce("k", F.lit(-1)).alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_cust").alias("sum_cust"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).alias(
            "sum_price_cents"
        ),
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE walk AS (
        SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth FROM part
        UNION ALL
        SELECT node, CAST(floor(cur / 10) AS BIGINT), depth + 1
        FROM walk WHERE cur > 0
    )
    SELECT depth, count(*) AS n, CAST(sum(node) AS BIGINT) AS sum_node
    FROM walk GROUP BY depth
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x WITH RECURSIVE): walk a derived hierarchy
    (parent = child div 10, an acyclic digit-truncation tree over part
    keys) and aggregate per depth.  Bounded recursion — each iteration is
    a distributed self-join on the previous frontier only, so state is
    O(frontier), never O(closure).  Note Spark supports only UNION ALL in
    the recursive branch (no UNION-distinct), which is why cyclic-graph
    closure (q_dedup_clusters) stays on the explicit iterative path.
    Identical SQL runs on the DuckDB side."""
    load_tables(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregate the fact table,
    HAVING-filter the groups, join the surviving keys back to the dims,
    global top-k.  The HAVING filter runs before the join, so only
    qualifying orderkeys (a tiny fraction) reach the join — at scale the
    aggregate output is broadcast-able and the plan never shuffles the
    fact table twice."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .where(F.col("tot_qty") > 300)
    )
    return (
        big.join(t["orders"], big.l_orderkey == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "tot_qty")
        .orderBy(F.desc("tot_qty"), F.col("o_orderkey"))
        .limit(100)
    )


def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) — Spark ``percentile``
    == DuckDB ``quantile_cont``."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_discount, 0.25)"), 4).alias("p25_disc"),
    )


def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into a join):
    orders above their customer's average order value."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_totalprice > 1.5 * (
            SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               round(sum(l_quantity), 4) AS sum_qty,
               count(1) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def q_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral posexplode over the embedding array (first 3 positions)."""
    t = load_tables(spark, sf_dir)
    return (
        t["embeddings"]
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .where(F.col("pos") < 3)
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("val").cast("double")), 4).alias("sum_val"),
        )
    )


def q_cond_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: FILTER-style counts without multiple scans."""
    t = load_tables(spark, sf_dir)
    return t["orders"].agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        # exact integer cents: raw double sums at sf1 magnitudes (1e10) are
        # order-dependent past the round-4 boundary (caught by the full sf1
        # verification, round 6)
        F.sum(
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                F.floor(F.col("o_totalprice") * 100 + 0.5),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("urgent_cents"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_totalprice") > 50000,
                    F.floor(F.col("o_totalprice") * 100 + 0.5),
                )
            )
            / F.count(F.when(F.col("o_totalprice") > 50000, 1))
            / 100.0,
            4,
        ).alias("avg_big"),
    )


def q_null_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalars over an outer-join result: coalesce / nullif /
    null-safe equality."""
    t = load_tables(spark, sf_dir)
    j = t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_outer"
    )
    return (
        j.select(
            "c_custkey",
            F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("price0"),
            F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("status_nf"),
            F.col("o_orderkey").eqNullSafe(F.lit(None).cast("long")).alias("is_orderless"),
        )
        .groupBy("c_custkey")
        .agg(
            F.round(F.sum("price0"), 4).alias("total"),
            F.count("status_nf").alias("n_nonf"),
            F.sum(F.col("is_orderless").cast("int")).alias("n_null_rows"),
        )
    )


def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape 6-table join: two big fact tables (lineitem, orders)
    joined on their keys, dims reduced via customer/supplier nation match,
    tiny nation/region explicitly broadcast.  The declarative plan lets
    Catalyst reorder the join tree and AQE pick broadcast vs shuffle per
    side — the scale property is that only the lineitem⋈orders edge ever
    shuffles fact-sized data."""
    t = load_tables(spark, sf_dir)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.floor(revenue * 100 + 0.5)).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue_cents").desc(), "n_name")
    )


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance —
    all partial-aggregatable (single shuffle on the group key)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
        F.count(F.lit(1)).alias("n"),
    )


def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist within
    order-status partitions."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: distinct sorted market segments per
    nation (collect_set is partial-aggregatable; sort is per-group O(k))."""
    t = load_tables(spark, sf_dir)
    return t["customer"].groupBy("c_nationkey").agg(
        # driver-canon: serialize the array to a delimited string (list
        # outputs are unhashable in the external comparator)
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.count(F.lit(1)).alias("n_customers"),
    )


def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): 7-day trailing
    revenue per order within its status partition.  RANGE frames include
    all ties of the current order value, so the result is deterministic
    without a unique tiebreaker — unlike ROWS frames.

    The trailing revenue is summed in exact integer cents and divided
    once at the end: a double running sum drifts with accumulation order
    (measured +1e-4 at sf5, 7.5M orders — past the round-4 guard), while
    the cents sum is associative and engine-exact at any scale (the
    stream-enrich floor-cents pattern)."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return t["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.sum(cents).over(w) / 100.0, 4).alias("trailing_7d"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics without a table format: full-outer join of
    target (orders) with an updates source (10% price correction for
    urgent orders), coalescing matched rows — matched→update,
    unmatched-source→insert, unmatched-target→keep.  One shuffle on the
    merge key; at scale the same plan runs over bucketed tables with zero
    shuffle (operators/partitioning.py)."""
    t = load_tables(spark, sf_dir)
    target = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("new_price"),
        )
    )
    merged = target.join(updates, "o_orderkey", "full_outer")
    return merged.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.coalesce(F.col("new_price"), F.col("o_totalprice")), 4).alias(
            "o_totalprice"
        ),
        F.col("new_price").isNotNull().alias("was_updated"),
    )


def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group capping (domain-balancing a training corpus): keep the
    K = 10 longest documents per source.  Window top-k per key — Spark
    executes rank-filter windows with partial per-partition pruning; the
    shuffle carries only the group key."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        t["documents"]
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .select("source", "doc_id", "n_chars", "rk")
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build (CDC pattern without a table format):
    per-user purchase events become versioned rows with
    [valid_from, valid_to) intervals and an is_current flag — lead() over
    the change stream; one shuffle on the entity key."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    changes = t["events"].where(F.col("event_type") == "purchase")
    return changes.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.date_format(F.lead("ts").over(w), fmt).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: build a map from entries, look up / inspect with
    map functions — all codegen'd JVM expressions."""
    t = load_tables(spark, sf_dir)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return (
        t["orders"]
        .select(
            "o_orderkey",
            m.alias("m"),
        )
        .select(
            "o_orderkey",
            F.col("m")["status"].alias("status"),
            F.col("m")["priority"].alias("priority"),
            F.size("m").alias("n_keys"),
            # driver-canon: array outputs are unhashable in the external
            # comparator — serialize to a delimited string
            F.array_join(F.sort_array(F.map_keys("m")), ",").alias("keys"),
        )
    )


_JSON_CACHE: dict[str, str] = {}


def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round-trip: supplier → .jsonl → schema'd read →
    rollup.  Line-delimited JSON splits by newline, so reads parallelize
    like any text source; an explicit schema avoids the inference scan."""
    import tempfile

    t = load_tables(spark, sf_dir)
    out = _JSON_CACHE.get(sf_dir)
    if out is None:
        out = tempfile.mkdtemp(prefix="src_json_")
        t["supplier"].write.mode("overwrite").json(out)
        _JSON_CACHE[sf_dir] = out
    back = spark.read.schema(t["supplier"].schema).json(out)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("s_acctbal"), 4).alias("total_bal"),
    )


def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through ``spark.sql`` — TPC-H Q3 shape over the
    registered views (CTE + join + agg + order/limit).  Demonstrates that
    the declared surface is reachable from raw SQL, not just the DataFrame
    API; the plan is identical (same Catalyst pipeline)."""
    load_tables(spark, sf_dir)  # registers temp views
    return spark.sql(
        """
        WITH big_cust AS (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        SELECT o.o_orderkey,
               sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
                        AS BIGINT)) AS revenue_cents,
               count(*) AS n_items
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN big_cust c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY o.o_orderkey
        ORDER BY revenue_cents DESC, o_orderkey
        LIMIT 50
        """
    )


def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined *table* function (PySpark 4 UDTF API): one row
    in, N rows out — each document chunked into 10-word windows, applied
    via SQL LATERAL.  Arrow-batched like other Python UDFs; the lateral
    expansion happens executor-side, never on the driver.

    The ``doc_id < 50`` predicate is applied in a subquery BELOW the
    lateral join: Catalyst does not push filters beneath a Python UDTF
    (the plan showed ``Filter doc_id < 50`` ABOVE BatchEvalPythonUDTF),
    so the flat form ran the Python chunker over the ENTIRE corpus and
    discarded all but 50 documents' chunks — at scale, a full-corpus
    Python pass for a 50-doc answer.  The predicate references only an
    input column, so filtering first is row-identical; the filter now
    reaches the parquet scan (PushedFilters: LessThan(doc_id,50))."""
    from pyspark.sql.functions import udtf

    load_tables(spark, sf_dir)

    @udtf(returnType="chunk_idx int, n_words int, first_word string")
    class ChunkWords:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(0, len(words), 10):
                chunk = words[i : i + 10]
                yield i // 10, len(chunk), chunk[0]

    spark.udtf.register("chunk_words", ChunkWords)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_words, c.first_word
        FROM (SELECT doc_id, text FROM documents WHERE doc_id < 50) d,
             LATERAL chunk_words(d.text) c
        """
    )


def q_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via df.stat.crosstab (pairwise frequency counts —
    a single hash aggregate + pivot under the hood)."""
    t = load_tables(spark, sf_dir)
    ct = t["lineitem"].stat.crosstab("l_returnflag", "l_linestatus")
    first = ct.columns[0]
    value_cols = sorted(ct.columns[1:])
    return ct.select(
        F.col(first).alias("returnflag"),
        *[F.col(f"`{c}`").alias(f"n_{c.lower()}") for c in value_cols],
    )


def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: parse the events JSON props column into
    variant, extract typed fields with variant_get — the semi-structured
    path that replaces string-JSON reparsing at every access."""
    t = load_tables(spark, sf_dir)
    v = t["events"].select(
        "event_id", F.parse_json("props").alias("v")
    )
    return (
        v.select(
            "event_id",
            F.try_variant_get(F.col("v"), "$.k", "int").alias("k"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_if(F.col("k").isNull()).alias("n_null"),
        )
    )


def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and / bit_or / bit_xor) — partial-aggregatable
    like any commutative monoid."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.bit_and(F.col("l_linenumber")).alias("band"),
        F.bit_or(F.col("l_linenumber")).alias("bor"),
        F.bit_xor(F.col("l_linenumber")).alias("bxor"),
        F.count(F.lit(1)).alias("n"),
    )


def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp interval arithmetic: shifted timestamps, week truncation,
    month deltas — the temporal scalar family beyond q_date_funcs."""
    t = load_tables(spark, sf_dir)
    fmt = "yyyy-MM-dd HH:mm:ss"
    base = t["orders"].select(
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("od"),
    )
    return base.select(
        "o_orderkey",
        F.date_format(F.col("od") + F.expr("INTERVAL 90 MINUTES"), fmt).alias(
            "plus_90m"
        ),
        F.date_format(F.date_trunc("week", "od"), fmt).alias("week_start"),
        F.round(
            F.months_between(F.lit("2001-01-01").cast("timestamp"), F.col("od")), 4
        ).alias("months_to_2001"),
        F.dayofweek("od").alias("dow"),
    )


def q_percentile_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (interpolating, DuckDB quantile_cont
    semantics).  At scale the approximate t-digest (percentile_approx) is
    the plan; exact is the correctness baseline."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last window values with explicit frames — per order-status,
    every order sees the cheapest and priciest order keys."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w).alias("priciest_key"),
    )


QUERIES = {
    "q_agg_stats": q_agg_stats,
    "q_agg_bitwise": q_agg_bitwise,
    "q_interval_arith": q_interval_arith,
    "q_percentile_group": q_percentile_group,
    "q_window_firstlast": q_window_firstlast,
    "q_sql_api": q_sql_api,
    "q_source_json": q_source_json,
    "q_udtf": q_udtf,
    "q_crosstab": q_crosstab,
    "q_variant": q_variant,
    "q_scd2": q_scd2,
    "q_map_funcs": q_map_funcs,
    "q_merge_upsert": q_merge_upsert,
    "q_cap_per_source": q_cap_per_source,
    "q_window_range": q_window_range,
    "q_window_dist": q_window_dist,
    "q_array_agg": q_array_agg,
    "q_join_multiway": q_join_multiway,
    "q_pivot": q_pivot,
    "q_unpivot": q_unpivot,
    "q_window_ntile": q_window_ntile,
    "q_tpch_q18": q_tpch_q18,
    "q_recursive_cte": q_recursive_cte,
    "q_join_nullsafe": q_join_nullsafe,
    "q_tpch_q7": q_tpch_q7,
    "q_percentile": q_percentile,
    "q_subquery_correlated": q_subquery_correlated,
    "q_grouping_sets": q_grouping_sets,
    "q_explode_lateral": q_explode_lateral,
    "q_cond_agg": q_cond_agg,
    "q_null_scalars": q_null_scalars,
}

ORACLES = {
    "q_agg_bitwise": """
        SELECT l_returnflag,
               bit_and(l_linenumber) AS band,
               bit_or(l_linenumber) AS bor,
               bit_xor(l_linenumber) AS bxor,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_interval_arith": """
        SELECT o_orderkey,
               strftime(o_orderdate + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S')
                   AS plus_90m,
               strftime(date_trunc('week', o_orderdate), '%Y-%m-%d %H:%M:%S')
                   AS week_start,
               round(12.0 * (2001 - year(o_orderdate))
                     + (1 - month(o_orderdate))
                     + (1 - day(o_orderdate)) / 31.0, 4) AS months_to_2001,
               dayofweek(o_orderdate) + 1 AS dow
        FROM orders
    """,
    "q_percentile_group": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_window_firstlast": """
        SELECT o_orderkey, o_orderstatus,
               first_value(o_orderkey) OVER w AS cheapest_key,
               last_value(o_orderkey) OVER w AS priciest_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "q_crosstab": """
        SELECT l_returnflag AS returnflag,
               count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
               count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_variant": """
        SELECT count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
               max(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
               count(*) FILTER (WHERE json_extract(props, '$.k') IS NULL) AS n_null
        FROM events
    """,
    "q_udtf": """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM documents WHERE doc_id < 50
        ), chunks AS (
            SELECT doc_id,
                   unnest(generate_series(
                       0, CAST(ceil(len(words) / 10.0) AS INT) - 1)) AS chunk_idx,
                   words
            FROM w
        )
        SELECT doc_id, chunk_idx,
               least(10, len(words) - chunk_idx * 10) AS n_words,
               words[chunk_idx * 10 + 1] AS first_word
        FROM chunks
    """,
    "q_source_json": """
        SELECT s_nationkey, count(*) AS n,
               round(sum(s_acctbal), 4) AS total_bal
        FROM supplier GROUP BY s_nationkey
    """,
    "q_sql_api": """
        WITH big_cust AS (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        SELECT o.o_orderkey,
               CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN big_cust c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY o.o_orderkey
        ORDER BY revenue_cents DESC, o_orderkey
        LIMIT 50
    """,
    "q_scd2": """
        SELECT user_id, event_id, round(value, 4) AS value,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q_map_funcs": """
        SELECT o_orderkey,
               o_orderstatus AS status,
               o_orderpriority AS priority,
               2 AS n_keys,
               'priority,status' AS keys
        FROM orders
    """,
    "q_merge_upsert": """
        SELECT t.o_orderkey, t.o_orderstatus,
               round(coalesce(u.new_price, t.o_totalprice), 4) AS o_totalprice,
               u.new_price IS NOT NULL AS was_updated
        FROM orders t
        FULL OUTER JOIN (
            SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS new_price
            FROM orders WHERE o_orderpriority = '1-URGENT'
        ) u USING (o_orderkey)
    """,
    "q_cap_per_source": """
        SELECT source, doc_id, n_chars, rk FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents
        ) WHERE rk <= 10
    """,
    "q_window_range": """
        SELECT o_orderkey, o_orderstatus,
               round(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                         OVER w / 100.0, 4) AS trailing_7d,
               count(*) OVER w AS n_in_window
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    """,
    "q_agg_stats": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_quantity), 4) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_window_dist": """
        SELECT o_orderkey, o_orderstatus,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    "q_array_agg": """
        SELECT c_nationkey,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
                   AS segments,
               count(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    """,
    "q_join_multiway": """
        SELECT n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue_cents DESC, n_name
    """,
    "q_pivot": """
        SELECT l_returnflag,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS qty_f,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 4) AS qty_o
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_unpivot": """
        SELECT l_returnflag, measure,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM (
            SELECT l_returnflag, 'qty' AS measure, l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
        ) GROUP BY 1, 2
    """,
    "q_recursive_cte": _RECURSIVE_SQL,
    "q_tpch_q7": """
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(CAST(floor(volume * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               count(*) AS n_items
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
               OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0')
        )
        GROUP BY 1, 2, 3
    """,
    "q_join_nullsafe": """
        WITH a AS (
            SELECT nullif(o_custkey % 50, 0) AS k, o_totalprice FROM orders
        ), b AS (
            SELECT nullif(c_custkey % 50, 0) AS k2, count(*) AS n_cust
            FROM customer GROUP BY 1
        )
        SELECT coalesce(k, -1) AS key, count(*) AS n, CAST(sum(n_cust) AS BIGINT) AS sum_cust,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k2
        GROUP BY 1
    """,
    "q_tpch_q18": """
        SELECT c_name, o_orderkey, o_orderdate, o_totalprice, tot_qty
        FROM (
            SELECT l_orderkey, sum(l_quantity) AS tot_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
        ) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY tot_qty DESC, o_orderkey
        LIMIT 100
    """,
    "q_window_ntile": """
        SELECT quartile, count(*) AS n,
               round(min(o_totalprice), 4) AS lo, round(max(o_totalprice), 4) AS hi
        FROM (
            SELECT o_totalprice,
                   ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
            FROM orders
        ) GROUP BY quartile
    """,
    "q_percentile": """
        SELECT round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               round(quantile_cont(l_discount, 0.25), 4) AS p25_disc
        FROM lineitem
    """,
    "q_subquery_correlated": """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_totalprice > 1.5 * (
            SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        )
    """,
    "q_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               round(sum(l_quantity), 4) AS sum_qty,
               count(1) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "q_explode_lateral": """
        SELECT pos, count(*) AS n, round(sum(val), 4) AS sum_val FROM (
            SELECT 0 AS pos, CAST(embedding[1] AS DOUBLE) AS val FROM embeddings
            UNION ALL
            SELECT 1, CAST(embedding[2] AS DOUBLE) FROM embeddings
            UNION ALL
            SELECT 2, CAST(embedding[3] AS DOUBLE) FROM embeddings
        ) GROUP BY pos
    """,
    "q_cond_agg": """
        SELECT count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS urgent_cents,
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                              FILTER (WHERE o_totalprice > 50000) AS DOUBLE)
                     / count(*) FILTER (WHERE o_totalprice > 50000) / 100.0,
                     4) AS avg_big
        FROM orders
    """,
    "q_null_scalars": """
        SELECT c_custkey,
               round(sum(coalesce(o_totalprice, 0.0)), 4) AS total,
               count(nullif(o_orderstatus, 'F')) AS n_nonf,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_rows
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
}
