"""More TPC-H-shaped declared queries + binning / gap-fill / ORC source.

Same contract as operators.relational: every query has a co-located DuckDB
oracle, deterministic results, identical column aliases on both sides.
These shapes exercise optimizer paths the earlier corpus doesn't:
left-join-then-reaggregate distributions (Q13), aggregate-vs-its-own-max
(Q15), correlated EXISTS/NOT EXISTS self-joins on the fact table (Q21),
anti-join + uncorrelated scalar subquery (Q22), correlated min subquery
over a distinct pair set (Q2), fixed-width binning, and date-spine gap
filling (sequence/explode vs generate_series).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

_ORC_CACHE: dict[str, str] = {}


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left join with
    a join-side predicate, per-customer count, then re-aggregate the counts
    into a histogram.  Customers with no orders land in the c_count=0
    bucket — the left join is what keeps them.  Two shuffles: by custkey,
    then by the (tiny-cardinality) count."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): aggregate
    joined against its own global max.  The 1-row max aggregate is
    broadcast — no global sort, no single-partition window — so the plan
    is two scans of the *already aggregated* (small) revenue table, not of
    lineitem."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                )
            ).alias("tr")
        )
    )
    mx = rev.agg(F.max("tr").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("tr") == F.col("mx"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("tr").alias("total_revenue_cents")
        )
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting): finished orders where
    this supplier's item shipped late (>60 days after the order date),
    at least one other supplier contributed to the order (EXISTS), and no
    *other* supplier shipped late (NOT EXISTS).  Catalyst rewrites the
    EXISTS pair into a left-semi and a left-anti join on l_orderkey — three
    passes over lineitem co-partitioned on the same key, so AQE can reuse
    one shuffle exchange.  (The testdata has no commit/receipt dates; the
    60-day ship lag stands in for Q21's receipt>commit predicate.)"""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL '60' DAY)
        GROUP BY s_name
        """
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average positive balance and no *recent* orders — an uncorrelated
    scalar subquery (1-row broadcast) plus a left-anti join against the
    filtered orders, grouped by a derived customer segment."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(c_custkey % 10 AS INT) AS cntrycode,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY 1
        """
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier per part): for small parts,
    the supplier(s) with the minimum account balance among suppliers that
    actually shipped that part.  The correlated min subquery decorrelates
    into an aggregate-then-join on l_partkey; the distinct (part, supplier)
    pair set stands in for partsupp.  Equality is on a *stored* double
    (selection, not arithmetic), so cross-engine equality is exact."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size <= 3
          AND s.s_acctbal = (SELECT min(s2.s_acctbal)
                             FROM ps ps2
                             JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                             WHERE ps2.l_partkey = p.p_partkey)
        """
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning (width_bucket shape): order totals into 20k-wide
    buckets with per-bucket count/min/max.  Pure column arithmetic + one
    hash aggregate — bucket count is bounded by the value range, not the
    row count, so the final aggregate is always tiny."""
    t = load_tables(spark, sf_dir)
    bucket = F.floor(F.col("o_totalprice") / 20000).cast("int")
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily event counts: a generated date spine (sequence +
    explode) cross-joined with the event-type dimension, left-joined with
    actual daily counts so zero-activity days appear explicitly.  The spine
    is O(days × types) — generated, never scanned — and the only shuffle is
    the daily pre-aggregation of events."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_raw"))
    return (
        spine.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n_raw", F.lit(0)).alias("n_events"),
        )
    )


def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round-trip: orders → ORC (zlib, Spark-native columnar
    writer) → read back → aggregate.  ORC scans get the same Catalyst
    pushdown/pruning treatment as parquet; this pins the second columnar
    format end-to-end."""
    t = load_tables(spark, sf_dir)
    out = _ORC_CACHE.get(sf_dir)
    if out is None:
        out = tempfile.mkdtemp(prefix="src_orc_")
        t["orders"].write.mode("overwrite").orc(out)
        _ORC_CACHE[sf_dir] = out
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).alias(
            "total_cents"
        ),
    )




def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict sequential funnel (view → click → purchase): per user, the
    first view, the first click *after* that view, the first purchase
    *after* that click; one row of per-step user counts.  Three
    aggregate-then-join steps, each keyed on user_id so all three shuffles
    share one partitioning (AQE reuses the exchange); step outputs shrink
    monotonically, and the final counts are 1-row cross-joins."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity date, distinct
    active users per (cohort, day-offset).  Two aggregations over the same
    user_id-keyed shuffle plus a broadcast-sized cohort join — the classic
    engagement triangle every events pipeline maintains."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", F.to_date("ts").alias("d"))
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    act = ev.distinct()
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "d0").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )




def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate grouped percentiles (KLL-style sketch via
    ``percentile_approx``): the scale path for `q_percentile_group` — one
    pass, mergeable per-partition sketches, no sort, memory bounded by the
    accuracy parameter instead of group size.  Sketch internals are
    engine-specific, so the hash-checked output is the ERROR BOUND: exact
    percentiles plus booleans asserting the sketch landed within 2% of
    them (the oracle recomputes the exact side and asserts ``true``) —
    the same bound-as-oracle reformulation as ``q_approx_distinct``."""
    t = load_tables(spark, sf_dir)
    approx_p50 = F.percentile_approx("l_quantity", 0.5, 10000)
    approx_p90 = F.percentile_approx("l_extendedprice", 0.9, 10000)
    exact_p50 = F.percentile("l_quantity", 0.5)
    exact_p90 = F.percentile("l_extendedprice", 0.9)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(exact_p50, 4).alias("exact_p50_qty"),
            F.round(exact_p90, 4).alias("exact_p90_price"),
            (F.abs(approx_p50 - exact_p50) <= 0.02 * exact_p50).alias("p50_ok"),
            (F.abs(approx_p90 - exact_p90) <= 0.02 * exact_p90).alias("p90_ok"),
        )
    )




def q_udaf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via Spark 4's ``applyInArrow`` — the zero-copy sibling
    of applyInPandas (`q_udaf`): group batches arrive as ``pyarrow.Table``
    with no pandas conversion, the cheapest Python exit Spark offers.
    Same contract as every UDF-surface key: the Python step computes an
    exactly SQL-expressible aggregate so the oracle fully certifies it."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(table: "pa.Table") -> "pa.Table":
        q = table.column("l_quantity")
        return pa.table(
            {
                "l_linestatus": [table.column("l_linestatus")[0].as_py()],
                "sum_qty": [round(pc.sum(q).as_py(), 4)],
                "n": [table.num_rows],
            }
        )

    t = load_tables(spark, sf_dir)
    return (
        # project BEFORE the opaque group map (guide §4.1) — without it
        # the scan and the Arrow boundary carried all 12 lineitem columns
        # for a 2-column aggregate
        t["lineitem"]
        .select("l_linestatus", "l_quantity")
        .groupBy("l_linestatus")
        .applyInArrow(summarize, schema="l_linestatus string, sum_qty double, n long")
    )




def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in a quarter with
    at least one late line item, counted per priority.  The EXISTS
    decorrelates to a left-semi hash join on orderkey — the fact table is
    touched once, and the date filter prunes the orders side before the
    join."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
        GROUP BY o_orderpriority
        """
    )


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: for each nation, its top-2 suppliers
    by account balance.  Catalyst rewrites the lateral into a ranked
    window over the (broadcast-joined) supplier side — per-group top-k
    without a driver loop; DuckDB executes the identical SQL natively."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.s_name, t.s_acctbal
        FROM nation n,
             LATERAL (SELECT s_name, s_acctbal FROM supplier s
                      WHERE s.s_nationkey = n.n_nationkey
                      ORDER BY s_acctbal DESC, s_name
                      LIMIT 2) t
        """
    )




def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-way join where customer
    and supplier must share a nation, restricted to one region and one
    year.  nation/region are broadcast dims; the c_nationkey = s_nationkey
    constraint rides as a join predicate on the fact path, so the only big
    shuffles are the lineitem-orders and orders-customer joins."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                        AS BIGINT)) AS revenue_cents
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        """
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    per customer in a quarter, top 20.  Ordering is on the *rounded*
    exact per-item *cents* (the per-item product and round are bit-identical
    IEEE ops in both engines; the integer sum is then order-independent —
    a rounded double sum sits exactly on cent boundaries and flips) with a
    custkey tiebreak so the top-20 cut is identical across engines; the plan is broadcast dims + one orders-lineitem shuffle +
    TakeOrderedAndProject (never a global sort)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                        AS BIGINT)) AS revenue_cents,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue_cents DESC, c_custkey
        LIMIT 20
        """
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): disjunction of three
    brand/size/quantity conjunctions across the join.  Catalyst extracts
    the common l_partkey equi-key and pushes the OR'd per-table residuals
    below the join (partial predicate pushdown from a disjunction) — the
    shape that distinguishes real predicate extraction from naive
    post-join filtering."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                        AS BIGINT)) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
        """
    )




def q_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scalar surface (Spark 4 ``from_xml``): serialize order fields
    into XML, parse them back with a typed schema, aggregate the parsed
    values.  The oracle computes the same aggregate straight from the
    columns — a hash match certifies the serialize→parse round trip
    without DuckDB needing an XML parser."""
    t = load_tables(spark, sf_dir)
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey"),
        F.lit("</k><p>"), F.col("o_totalprice"),
        F.lit("</p><s>"), F.col("o_orderstatus"), F.lit("</s></o>"),
    )
    parsed = t["orders"].select(
        F.from_xml(xml, "k BIGINT, p DOUBLE, s STRING").alias("x")
    )
    return parsed.groupBy(F.col("x.s").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x.k").alias("sum_keys"),
        F.sum(F.floor(F.col("x.p") * 100 + 0.5)).alias("sum_price_cents"),
    )


def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar surface: ``try_divide`` (NULL on zero divisor)
    and ``try_cast`` (NULL on malformed input) — the ANSI-mode-safe
    idioms a pipeline uses instead of letting one bad row kill a 100 TB
    job.  Oracle expresses the same semantics with CASE / TRY_CAST."""
    t = load_tables(spark, sf_dir)
    div = F.try_divide(F.col("o_totalprice"), (F.col("o_custkey") % 7).cast("double"))
    first_char = F.substring("o_orderpriority", 1, 1)
    return t["orders"].agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(div.isNull(), 1)).alias("n_null_div"),
        # fixed-point 1e-4 quantization per term before the sum: the raw
        # double sum reaches 1.3e11 at sf1, where its low digits are
        # order-dependent; the per-term floor is deterministic because IEEE
        # division produces identical bits on both engines
        F.sum(F.floor(div * 10000 + 0.5).cast("long")).alias("sum_div_e4"),
        F.count(first_char.try_cast("int")).alias("n_numeric_prio"),
    )


def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Spark 4 datasketches HLL):
    per-event-type user cardinality via ``hll_sketch_agg`` — the
    re-aggregatable scale path for count-distinct (sketches union across
    partitions/days; exact distinct needs a full shuffle of the keys).
    Sketch bytes are engine-specific, so the hash-checked output is the
    ERROR BOUND: exact distinct counts plus a boolean asserting the HLL
    estimate landed within 5% (the oracle recomputes the exact side and
    asserts ``true``)."""
    t = load_tables(spark, sf_dir)
    est = F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
    exact = F.countDistinct("user_id")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact.alias("exact_users"),
            (F.abs(est - exact) <= 0.05 * exact).alias("within_5pct"),
        )
    )




def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: merge a late-arriving
    delta into an existing daily rollup by unioning the two *partial*
    rollups and re-aggregating — never re-touching base facts.  Valid
    because sum/count are re-aggregatable (the algebraic-aggregate
    property every incremental pipeline relies on); avg is re-derived
    from the merged sums.  The oracle computes the same rollup from the
    full fact table directly, so a hash match proves partial + delta ==
    full.  At 100 TB the base rollup is O(days × types) while the fact
    table is the 100 TB — this pattern is why."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn("day", F.to_date("ts"))

    def rollup(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_v"),
        )

    base = rollup(ev.where(F.col("event_id") % 10 != 0))       # "yesterday's" rollup
    delta = rollup(ev.where(F.col("event_id") % 10 == 0))      # late batch
    merged = (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v"))
    )
    return merged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.round("sum_v", 4).alias("sum_value"),
        F.round(F.col("sum_v") / F.col("n"), 6).alias("avg_value"),
    )




def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report analytics: each nation's share of total revenue.
    Per-nation revenue in exact integer cents; the 1-row grand total is
    broadcast back (never a single-partition window), and the share is a
    ratio of exact integers rounded once."""
    t = load_tables(spark, sf_dir)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    )
    per_nation = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
    )
    total = per_nation.agg(F.sum("revenue_cents").alias("total_cents"))
    return per_nation.crossJoin(F.broadcast(total)).select(
        "n_name",
        "revenue_cents",
        F.round(F.col("revenue_cents") / F.col("total_cents"), 6).alias("share"),
    )




def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation sweep (the dbt-test / expectations surface):
    referential integrity via anti-joins, domain checks as conditional
    counts, primary-key uniqueness via a grouped HAVING — one row per rule
    with its violation count (0 rows is a passing rule set; counts make
    the failures diagnosable).  Each rule is an independent aggregate, so
    Spark runs them as parallel jobs over cached scans; none shuffles more
    than its own rule needs."""
    t = load_tables(spark, sf_dir)

    def one(rule, df):
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(rule).alias("rule"), "n_violations"
        )

    orphan_li = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
    )
    orphan_ord = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    bad_qty = t["lineitem"].where(F.col("l_quantity") <= 0)
    bad_disc = t["lineitem"].where(
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    )
    null_keys = t["orders"].where(F.col("o_orderkey").isNull())
    dup_pk = (
        t["orders"].groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
    )
    out = (
        one("lineitem_orphan_orderkey", orphan_li)
        .unionByName(one("orders_orphan_custkey", orphan_ord))
        .unionByName(one("lineitem_nonpositive_quantity", bad_qty))
        .unionByName(one("lineitem_discount_out_of_range", bad_disc))
        .unionByName(one("orders_null_pk", null_keys))
        .unionByName(one("orders_duplicate_pk", dup_pk))
    )
    return out




def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute deviation
    (median of |x - median|), then count points beyond 3·MAD.  Two exact
    percentile passes + one conditional count — all on the same
    event_type partitioning, so the three aggregations reuse one shuffle.
    MAD is the robust scale estimate monitoring pipelines prefer over
    stddev (one bad batch can't drag it)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad"), F.first("med").alias("med2")
    )
    flagged = dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first(F.col("med")), 6).alias("median"),
        F.round(F.first(F.col("mad")), 6).alias("mad"),
        F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias("n_outliers"),
    )




def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): within one region's revenue per
    year, the share contributed by one supplier nation — a conditional
    share inside a grouped aggregate (sum(CASE)/sum), computed on exact
    integer cents so the ratio is deterministic."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH base AS (
            SELECT year(o.o_orderdate) AS o_year,
                   CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                        AS BIGINT) AS cents,
                   n2.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN cents ELSE 0 END)
                   AS BIGINT) AS nation_cents,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN cents
                              ELSE 0 END) AS DOUBLE)
                     / CAST(sum(cents) AS DOUBLE), 6) AS mkt_share
        FROM base GROUP BY o_year
        """
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-delay priority audit): per delay bucket
    (shipped within 30 days vs later), conditional counts of urgent vs
    other orders — CASE aggregation after one fact join.  (The testdata
    has no ship mode; the delay bucket plays its role.)"""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL '30' DAY
                    THEN 'fast' ELSE 'slow' END AS ship_bucket,
               CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   AS BIGINT) AS urgent_count,
               CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
                   AS BIGINT) AS other_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        """
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): promo-part revenue share of one
    month's revenue — conditional cents over total cents, single join +
    single aggregate."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(
                 CAST(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) ELSE 0 END)
                      AS DOUBLE) * 100.0 /
                 CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                          AS BIGINT)) AS DOUBLE), 6) AS promo_revenue_pct,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-02-01'
        """
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (dominant suppliers): suppliers that shipped more
    than half of some part's total shipped quantity — an EXISTS over a
    correlated aggregate threshold, decorrelated into two aggregates
    joined on (part, supplier) and part.  Quantities are integer-valued
    and the threshold is 0.15 (parts here spread across ~26 suppliers, so
    a 15% share already marks a dominant supplier; the comparison stays
    exact because 0.15·int is computed identically in both engines)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH per_ps AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        per_p AS (
            SELECT l_partkey, sum(qty) AS total_qty FROM per_ps
            GROUP BY l_partkey
        )
        SELECT s.s_suppkey, s.s_name,
               count(*) AS n_dominated_parts
        FROM per_ps ps
        JOIN per_p p ON p.l_partkey = ps.l_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        WHERE ps.qty > 0.15 * p.total_qty
        GROUP BY s.s_suppkey, s.s_name
        """
    )




def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier diversity per part attribute): distinct
    supplier counts per (brand, size-band), excluding blacklisted
    suppliers (NOT IN → anti join).  The distinct aggregate runs after the
    exclusion, so the anti join prunes before the expensive expand."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        excluded AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        SELECT p.p_brand,
               CAST(floor(p.p_size / 10) AS INT) AS size_band,
               count(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE ps.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
        GROUP BY p.p_brand, 2
        """
    )




def q_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature scaling per group (the ML-preprocessing step): z-score and
    min-max normalization of event values per event type, certified by
    the group moments plus aggregate functionals of the normalized values
    (mean |z| and mean of the min-max-scaled value).  One pass for the
    moments, broadcast back, one pass for the normalized aggregates — the
    two-pass shape any distributed scaler uses."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    scaled = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        ((F.col("value") - F.col("mu")) / F.col("sigma")).alias("z"),
        ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias("mm"),
        "mu",
        "sigma",
    )
    return scaled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("mu"), 6).alias("mean"),
        F.round(F.first("sigma"), 6).alias("stddev"),
        F.round(F.avg(F.abs("z")), 6).alias("mean_abs_z"),
        F.round(F.avg("mm"), 6).alias("mean_minmax"),
    )




def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly detection on the daily event series: 7-day trailing
    moving average and sample stddev per event type (frame excludes the
    current day), flagging days whose count deviates by more than 2σ.
    The pre-aggregation shrinks the fact table to O(days × types) before
    any window runs, so the sort inside the window is trivial at every
    scale."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    scored = daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.round(F.avg("n").over(w), 6).alias("ma7"),
        F.round(F.stddev_samp("n").over(w), 6).alias("sd7"),
    )
    return scored.withColumn(
        "is_anomaly",
        F.when(
            F.col("sd7").isNotNull()
            & (F.abs(F.col("n") - F.col("ma7")) > 2 * F.col("sd7")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )




def q_equiheight_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram — the column statistic a
    cost-based optimizer collects: quartile breakpoints via one exact
    percentile aggregate (1-row, broadcast back), then per-bucket
    count/min/max.  Buckets hold ~equal row counts by construction, so
    selectivity estimates stay accurate under skew where equi-width bins
    collapse."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select("o_totalprice")
    breaks = o.agg(
        F.percentile("o_totalprice", 0.25).alias("b1"),
        F.percentile("o_totalprice", 0.50).alias("b2"),
        F.percentile("o_totalprice", 0.75).alias("b3"),
    )
    bucketed = o.crossJoin(F.broadcast(breaks)).select(
        "o_totalprice",
        (
            F.when(F.col("o_totalprice") < F.col("b1"), 0)
            .when(F.col("o_totalprice") < F.col("b2"), 1)
            .when(F.col("o_totalprice") < F.col("b3"), 2)
            .otherwise(3)
        ).alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )




def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (the first-order Markov statistics a
    sequence model starts from): per user, consecutive event pairs in
    (ts, event_id) order via lag(), counted per (from, to) transition.
    One window sort inside user partitions + one tiny aggregate; the
    deterministic (ts, event_id) tiebreak makes the pairing identical in
    both engines."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = t["events"].select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    return (
        pairs.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


QUERIES = {
    "q_tpch_q13": q_tpch_q13,
    "q_tpch_q15": q_tpch_q15,
    "q_tpch_q21": q_tpch_q21,
    "q_tpch_q22": q_tpch_q22,
    "q_tpch_q2": q_tpch_q2,
    "q_histogram": q_histogram,
    "q_events_funnel": q_events_funnel,
    "q_percentile_approx": q_percentile_approx,
    "q_udaf_arrow": q_udaf_arrow,
    "q_tpch_q4": q_tpch_q4,
    "q_lateral_topk": q_lateral_topk,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q19": q_tpch_q19,
    "q_xml_funcs": q_xml_funcs,
    "q_try_funcs": q_try_funcs,
    "q_sketch_hll": q_sketch_hll,
    "q_incremental_rollup": q_incremental_rollup,
    "q_share_of_total": q_share_of_total,
    "q_data_quality": q_data_quality,
    "q_outlier_mad": q_outlier_mad,
    "q_tpch_q8": q_tpch_q8,
    "q_tpch_q12": q_tpch_q12,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q20": q_tpch_q20,
    "q_tpch_q16": q_tpch_q16,
    "q_feature_scale": q_feature_scale,
    "q_events_anomaly": q_events_anomaly,
    "q_equiheight_hist": q_equiheight_hist,
    "q_events_transitions": q_events_transitions,
    "q_events_retention": q_events_retention,
    "q_date_spine": q_date_spine,
    "q_source_orc": q_source_orc,
}

ORACLES = {
    "q_percentile_approx": """
        SELECT l_returnflag, count(*) AS n,
               round(quantile_cont(l_quantity, 0.5), 4) AS exact_p50_qty,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90_price,
               true AS p50_ok,
               true AS p90_ok
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_sketch_hll": """
        SELECT event_type, count(*) AS n_events,
               count(DISTINCT user_id) AS exact_users,
               true AS within_5pct
        FROM events GROUP BY event_type
    """,
    "q_events_transitions": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS from_type,
                   event_type AS to_type
            FROM events
        )
        SELECT from_type, to_type, count(*) AS n_transitions
        FROM pairs WHERE from_type IS NOT NULL
        GROUP BY 1, 2
    """,
    "q_equiheight_hist": """
        WITH breaks AS (
            SELECT quantile_cont(o_totalprice, 0.25) AS b1,
                   quantile_cont(o_totalprice, 0.50) AS b2,
                   quantile_cont(o_totalprice, 0.75) AS b3
            FROM orders
        )
        SELECT CASE WHEN o_totalprice < b1 THEN 0
                    WHEN o_totalprice < b2 THEN 1
                    WHEN o_totalprice < b3 THEN 2
                    ELSE 3 END AS bucket,
               count(*) AS n,
               round(min(o_totalprice), 4) AS lo,
               round(max(o_totalprice), 4) AS hi
        FROM orders, breaks
        GROUP BY 1
    """,
    "q_events_anomaly": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        ), scored AS (
            SELECT strftime(day, '%Y-%m-%d') AS day, event_type, n,
                   round(avg(n) OVER w, 6) AS ma7,
                   round(stddev_samp(n) OVER w, 6) AS sd7
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT day, event_type, n, ma7, sd7,
               CASE WHEN sd7 IS NOT NULL AND abs(n - ma7) > 2 * sd7
                    THEN 1 ELSE 0 END AS is_anomaly
        FROM scored
    """,
    "q_feature_scale": """
        WITH stats AS (
            SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma,
                   min(value) AS lo, max(value) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, count(*) AS n,
               round(any_value(s.mu), 6) AS mean,
               round(any_value(s.sigma), 6) AS stddev,
               round(avg(abs((e.value - s.mu) / s.sigma)), 6) AS mean_abs_z,
               round(avg((e.value - s.lo) / (s.hi - s.lo)), 6) AS mean_minmax
        FROM events e JOIN stats s USING (event_type)
        GROUP BY e.event_type
    """,
    "q_tpch_q16": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        excluded AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        SELECT p.p_brand,
               CAST(floor(p.p_size / 10) AS INT) AS size_band,
               count(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE ps.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
        GROUP BY p.p_brand, 2
    """,
    "q_tpch_q8": """
        WITH base AS (
            SELECT year(o.o_orderdate) AS o_year,
                   CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                        AS BIGINT) AS cents,
                   n2.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN cents ELSE 0 END)
                   AS BIGINT) AS nation_cents,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN cents
                              ELSE 0 END) AS DOUBLE)
                     / CAST(sum(cents) AS DOUBLE), 6) AS mkt_share
        FROM base GROUP BY o_year
    """,
    "q_tpch_q12": """
        SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                    THEN 'fast' ELSE 'slow' END AS ship_bucket,
               CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   AS BIGINT) AS urgent_count,
               CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
                   AS BIGINT) AS other_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
    "q_tpch_q14": """
        SELECT round(
                 CAST(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) ELSE 0 END)
                      AS DOUBLE) * 100.0 /
                 CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                          AS BIGINT)) AS DOUBLE), 6) AS promo_revenue_pct,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-02-01'
    """,
    "q_tpch_q20": """
        WITH per_ps AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        per_p AS (
            SELECT l_partkey, sum(qty) AS total_qty FROM per_ps
            GROUP BY l_partkey
        )
        SELECT s.s_suppkey, s.s_name,
               count(*) AS n_dominated_parts
        FROM per_ps ps
        JOIN per_p p ON p.l_partkey = ps.l_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        WHERE ps.qty > 0.15 * p.total_qty
        GROUP BY s.s_suppkey, s.s_name
    """,
    "q_outlier_mad": """
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ), mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type, count(*) AS n,
               round(any_value(d.med), 6) AS median,
               round(any_value(m.mad), 6) AS mad,
               count(*) FILTER (WHERE d.adev > 3 * m.mad) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type
    """,
    "q_data_quality": """
        SELECT 'lineitem_orphan_orderkey' AS rule,
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                   AS n_violations
        UNION ALL
        SELECT 'orders_orphan_custkey',
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'lineitem_nonpositive_quantity',
               (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
        UNION ALL
        SELECT 'lineitem_discount_out_of_range',
               (SELECT count(*) FROM lineitem
                WHERE l_discount < 0 OR l_discount > 1)
        UNION ALL
        SELECT 'orders_null_pk',
               (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
        UNION ALL
        SELECT 'orders_duplicate_pk',
               (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                      GROUP BY o_orderkey HAVING count(*) > 1))
    """,
    "q_share_of_total": """
        WITH per_nation AS (
            SELECT n_name,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                            AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        )
        SELECT n_name, revenue_cents,
               round(revenue_cents * 1.0 /
                     (SELECT sum(revenue_cents) FROM per_nation), 6) AS share
        FROM per_nation
    """,
    "q_incremental_rollup": """
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
               count(*) AS n,
               round(sum(value), 4) AS sum_value,
               round(sum(value) / count(*), 6) AS avg_value
        FROM events GROUP BY 1, 2
    """,
    "q_xml_funcs": """
        SELECT o_orderstatus AS status, count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM orders GROUP BY o_orderstatus
    """,
    "q_try_funcs": """
        SELECT count(*) AS n,
               count(*) FILTER (WHERE o_custkey % 7 = 0) AS n_null_div,
               CAST(sum(CAST(floor(CASE WHEN o_custkey % 7 = 0 THEN NULL
                                        ELSE o_totalprice / (o_custkey % 7)
                                   END * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_div_e4,
               count(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT))
                   AS n_numeric_prio
        FROM orders
    """,
    "q_tpch_q5": """
        SELECT n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q_tpch_q10": """
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue_cents DESC, c_custkey
        LIMIT 20
    """,
    "q_tpch_q19": """
        SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q_tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    "q_lateral_topk": """
        SELECT n.n_name, t.s_name, t.s_acctbal
        FROM nation n,
             LATERAL (SELECT s_name, s_acctbal FROM supplier s
                      WHERE s.s_nationkey = n.n_nationkey
                      ORDER BY s_acctbal DESC, s_name
                      LIMIT 2) t
    """,
    "q_udaf_arrow": """
        SELECT l_linestatus, round(sum(l_quantity), 4) AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY l_linestatus
    """,
    "q_events_funnel": """
        WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e
               JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e
               JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM s1) AS n_view,
               (SELECT count(*) FROM s2) AS n_view_click,
               (SELECT count(*) FROM s3) AS n_view_click_purchase
    """,
    "q_events_retention": """
        WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        cohort AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY user_id)
        SELECT strftime(d0, '%Y-%m-%d') AS cohort_day,
               date_diff('day', d0, d) AS day_offset,
               count(DISTINCT user_id) AS n_active
        FROM ev JOIN cohort USING (user_id)
        GROUP BY 1, 2
    """,

    "q_tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey
                              AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "q_tpch_q15": """
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                            AS BIGINT)) AS BIGINT) AS tr
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, tr AS total_revenue_cents
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE tr = (SELECT max(tr) FROM rev)
    """,
    "q_tpch_q21": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
    """,
    "q_tpch_q22": """
        SELECT CAST(c_custkey % 10 AS INT) AS cntrycode,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY 1
    """,
    "q_tpch_q2": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size <= 3
          AND s.s_acctbal = (SELECT min(s2.s_acctbal)
                             FROM ps ps2
                             JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                             WHERE ps2.l_partkey = p.p_partkey)
    """,
    "q_histogram": """
        SELECT CAST(floor(o_totalprice / 20000) AS INT) AS bucket,
               count(*) AS n,
               round(min(o_totalprice), 4) AS lo,
               round(max(o_totalprice), 4) AS hi
        FROM orders GROUP BY 1
    """,
    "q_date_spine": """
        WITH bounds AS (
            SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_raw
            FROM events GROUP BY 1, 2
        )
        SELECT strftime(s.day, '%Y-%m-%d') AS day,
               t.event_type,
               coalesce(d.n_raw, 0) AS n_events
        FROM spine s
        CROSS JOIN types t
        LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
    """,
    "q_source_orc": """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders GROUP BY o_orderstatus
    """,
}
