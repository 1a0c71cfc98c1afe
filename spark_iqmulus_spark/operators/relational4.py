"""The six TPC-H shapes the earlier corpora left out: Q1, Q3, Q6, Q9,
Q11, Q17 — completing the full 22-query suite.

Same contract as operators.relational: every query has a co-located DuckDB
oracle, deterministic results, identical column aliases on both sides.
Monetary aggregates are summed as integer cents (``CAST(floor(x * 100 + 0.5) AS
BIGINT)``) so cross-engine hashes are exact regardless of double summation
order; derived averages divide those exact integers, so both engines round
the same value.

The testdata has no ``partsupp`` table, so Q9's supply cost and Q11's
stock value are derived from ``p_retailprice`` × ``l_quantity`` (the same
adaptation ``q_tpch_q2``/``q_tpch_q20`` already use) — the *plan shapes*
(multiway fact join with grouped profit; group-by + uncorrelated scalar
threshold subquery) are the point, not the constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables


def _cents(col):
    """Exact integer cents for a monetary double expression."""
    return F.floor(col * 100 + 0.5)


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): one full scan of lineitem with a
    shipdate filter pushed to the parquet reader, grouped on the
    2-value x 2-value (returnflag, linestatus) key.  All sums are partial
    (map-side combine) so the shuffle moves ~8 rows per task no matter the
    input size; averages are derived from the exact integer sums after the
    aggregate, not re-aggregated."""
    t = load_tables(spark, sf_dir)
    agg = (
        t["lineitem"]
        .where(F.col("l_shipdate") <= F.lit("1998-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_cents",
        "sum_disc_cents",
        "sum_charge_cents",
        F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_cents") / F.col("count_order") / 100.0, 6).alias(
            "avg_price"
        ),
        "count_order",
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): revenue of not-yet-shipped lineitems
    for one market segment's orders placed before a cutoff.  customer is a
    dim (broadcast); orders->lineitem is the one real shuffle, on
    orderkey.  Top-10 via sort+limit = distributed TakeOrdered, never a
    global sort; orderkey added to the sort key for a deterministic
    tiebreak."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-06-30")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    return (
        t["orders"]
        .where(F.col("o_orderdate") < cutoff)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["lineitem"].where(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): a single lineitem scan with
    every predicate pushed to parquet row-group stats (shipdate range,
    discount band, quantity cap) reduced to one row — the canonical
    scan-dominated query; no shuffle beyond the final 1-row combine."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * F.col("l_discount"))
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): profit on
    'widget' parts = revenue minus a retail-price-based unit cost
    (stand-in for ps_supplycost; see module docstring), grouped by the
    supplier's nation and order year.  part/supplier/nation broadcast;
    lineitem->orders is the only fact-fact shuffle.  Profit stays in
    exact integer cents end to end (retail cents x integer quantity), so
    negative-profit rows hash identically across engines."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               year(o.o_orderdate) AS o_year,
               CAST(sum(
                 CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                      AS BIGINT)
                 - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                   * CAST(l.l_quantity AS BIGINT)
               ) AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY n.n_name, year(o.o_orderdate)
        """
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part consumed value for one
    nation's suppliers, kept only where the part's value exceeds a fixed
    fraction of the grand total.  The total is an uncorrelated scalar
    subquery — a 1-row broadcast against the already-aggregated per-part
    table, so lineitem is scanned once.  The threshold compare is integer
    x integer (value*1000 > total), no double boundary."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH val AS (
            SELECT l.l_partkey,
                   CAST(sum(CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                            * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_1'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, value_cents
        FROM val
        WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM val)
        """
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost to orders
    below 20% of a part's average order quantity, for one brand.  The
    correlated avg-per-part subquery becomes a pre-aggregate joined back
    on partkey — both sides pre-filtered to the brand's parts (broadcast
    dim filter), so the re-join touches only the brand's lineitems.
    avg_yearly is derived from the exact cents total after the 1-row
    aggregate."""
    t = load_tables(spark, sf_dir)
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("part_avg_qty")
    ).withColumnRenamed("l_partkey", "ap_partkey")
    small = li.join(
        F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey")
    ).where(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
    agg = small.agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("total_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agg.select(
        "total_cents",
        "n_lines",
        F.round(F.col("total_cents") / 700.0, 4).alias("avg_yearly"),
    )


def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts over the events stream — the standard
    product-analytics rollup: users grouped by first-activity week, counted
    per week-since-signup.  Two shuffles: one min-aggregate on user_id for
    the cohort assignment (broadcast back while small, AQE decides), one
    final (cohort, week_n) aggregate.  Week arithmetic is epoch-exact
    (Monday-aligned UTC week starts differ by exact 604800-second
    multiples), so the engine-neutral division is lossless."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", F.date_trunc("week", "ts").alias("wk"))
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = ev.distinct()
    return (
        act.join(cohort, "user_id")
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort"),
            (
                (
                    F.unix_timestamp("wk") - F.unix_timestamp("cohort_wk")
                ) / 604800
            )
            .cast("int")
            .alias("week_n"),
            "user_id",
        )
        .groupBy("cohort", "week_n")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


QUERIES = {
    "q_retention_cohort": q_retention_cohort,
    "q_tpch_q1": q_tpch_q1,
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q9": q_tpch_q9,
    "q_tpch_q11": q_tpch_q11,
    "q_tpch_q17": q_tpch_q17,
}

ORACLES = {
    "q_retention_cohort": """
        WITH ev AS (
            SELECT user_id, date_trunc('week', ts) AS wk FROM events
        ), cohort AS (
            SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id
        ), act AS (
            SELECT DISTINCT user_id, wk FROM ev
        )
        SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort,
               CAST((epoch(a.wk) - epoch(c.cohort_wk)) / 604800 AS INTEGER)
                   AS week_n,
               count(DISTINCT a.user_id) AS n_users
        FROM act a JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    """,
    "q_tpch_q1": """
        WITH agg AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_disc_cents,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * (1 + l_tax) * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_charge_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-12-01'
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus, sum_qty, sum_base_cents,
               sum_disc_cents, sum_charge_cents,
               round(CAST(sum_qty AS DOUBLE) / count_order, 6) AS avg_qty,
               round(CAST(sum_base_cents AS DOUBLE) / count_order / 100.0, 6)
                   AS avg_price,
               count_order
        FROM agg
    """,
    "q_tpch_q3": """
        SELECT l.l_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o.o_orderpriority,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-30'
          AND l.l_shipdate > TIMESTAMP '1998-06-30'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_cents DESC, o_orderdate, l.l_orderkey
        LIMIT 10
    """,
    "q_tpch_q6": """
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.04 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "q_tpch_q9": """
        SELECT n.n_name AS nation,
               year(o.o_orderdate) AS o_year,
               CAST(sum(
                 CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                      AS BIGINT)
                 - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                   * CAST(l.l_quantity AS BIGINT)
               ) AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY n.n_name, year(o.o_orderdate)
    """,
    "q_tpch_q11": """
        WITH val AS (
            SELECT l.l_partkey,
                   CAST(sum(CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                            * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_1'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, value_cents
        FROM val
        WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM val)
    """,
    "q_tpch_q17": """
        WITH li AS (
            SELECT l.*
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#1'
        ), avg_qty AS (
            SELECT l_partkey AS ap_partkey, avg(l_quantity) AS part_avg_qty
            FROM li GROUP BY l_partkey
        ), agg AS (
            SELECT CAST(sum(CAST(floor(li.l_extendedprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS total_cents,
                   count(*) AS n_lines
            FROM li JOIN avg_qty a ON li.l_partkey = a.ap_partkey
            WHERE li.l_quantity < 0.2 * a.part_avg_qty
        )
        SELECT total_cents, n_lines,
               round(CAST(total_cents AS DOUBLE) / 700.0, 4) AS avg_yearly
        FROM agg
    """,
}


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with last-observation-carried-forward
    (the TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape): hourly
    per-event-type aggregates left-joined onto a dense generated time
    spine, missing buckets zero-counted, and the running value carried
    forward with an ignore-nulls window.

    Scale shape: the raw stream is touched once (one keyed aggregate);
    the dense spine is O(hours × types) — it grows with the *time range*,
    never the event count — and the LOCF window partitions by type over
    that small spine.  Sums are exact integer cents."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        F.floor(F.col("value") * 100 + 0.5).alias("cents"),
    )
    actual = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )
    bounds = ev.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(bounds)  # 1-row bounds frame — a broadcast by size
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hr"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(actual, ["event_type", "hr"], "left")
        .withColumn(
            "locf_cents",
            F.coalesce(F.last("sum_cents", ignorenulls=True).over(w), F.lit(0)),
        )
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_cents", F.lit(0)).alias("sum_cents"),
            "locf_cents",
        )
    )


QUERIES["q_gapfill_locf"] = q_gapfill_locf

ORACLES["q_gapfill_locf"] = """
    WITH ev AS (
        SELECT event_type,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), actual AS (
        SELECT event_type, hr, count(*) AS n_events, sum(cents) AS sum_cents
        FROM ev GROUP BY 1, 2
    ), bounds AS (SELECT min(hr) AS mn, max(hr) AS mx FROM ev),
    spine AS (
        SELECT t.event_type, g.hr
        FROM (SELECT DISTINCT event_type FROM ev) t
        CROSS JOIN (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
            FROM bounds
        ) g
    ), filled AS (
        SELECT s.event_type, s.hr,
               COALESCE(a.n_events, 0) AS n_events,
               a.sum_cents
        FROM spine s
        LEFT JOIN actual a ON a.event_type = s.event_type AND a.hr = s.hr
    )
    SELECT event_type,
           strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(COALESCE(sum_cents, 0) AS BIGINT) AS sum_cents,
           CAST(COALESCE(last_value(sum_cents IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                AS BIGINT) AS locf_cents
    FROM filled
"""


def q_user_value_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per user, in EXACT integer
    arithmetic — the streaming-ops monitoring shape (flag a value more
    than k·σ from its trailing window) made engine-portable by clearing
    denominators instead of computing floats:

        (v − mean)² > k²·var  ⇔  (n·v − Σ)²·(n−1) > k²·n·(n·Σx² − Σ²)

    with v in integer cents and Σ/Σx² exact window sums (ROWS frame of
    the 10 preceding events + current).  One window shuffle on user_id,
    one final aggregate; no doubles anywhere near the decision."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    v = F.floor(F.col("value") * 100 + 0.5)  # exact cents
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, 0)
    )
    e = (
        t["events"]
        .withColumn("v", v)
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("v").over(w))
        .withColumn("ss", F.sum(F.col("v") * F.col("v")).over(w))
    )
    K2 = 4  # k = 2 sigma
    lhs = (
        (F.col("n") * F.col("v") - F.col("s"))
        * (F.col("n") * F.col("v") - F.col("s"))
        * (F.col("n") - 1)
    )
    rhs = F.lit(K2) * F.col("n") * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    flagged = e.withColumn(
        "is_anomaly", (F.col("n") >= 5) & (lhs > rhs)
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("is_anomaly").cast("long")).alias("n_anomalies"),
        F.sum(F.when(F.col("is_anomaly"), F.col("v")).otherwise(0)).alias(
            "anomaly_cents"
        ),
    )


QUERIES["q_user_value_anomaly"] = q_user_value_anomaly

ORACLES["q_user_value_anomaly"] = """
    WITH e AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    stats AS (
        SELECT user_id, v,
               count(*) OVER w AS n,
               sum(v) OVER w AS s,
               sum(v * v) OVER w AS ss
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
    ),
    flagged AS (
        SELECT user_id, v,
               (n >= 5 AND
                (n * v - s) * (n * v - s) * (n - 1)
                  > 4 * n * (n * ss - s * s)) AS is_anomaly
        FROM stats
    )
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalies,
           CAST(sum(CASE WHEN is_anomaly THEN v ELSE 0 END) AS BIGINT)
               AS anomaly_cents
    FROM flagged GROUP BY user_id
"""
