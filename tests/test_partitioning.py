"""Bucketed co-located joins (zero Exchange) and skew-salted join parity."""

from __future__ import annotations

import pytest

from tests.test_plans import plan_text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    from spark_iqmulus_spark.session import load_tables

    return load_tables(spark, SF_DIR)


def test_bucketed_join_no_exchange(spark, tables, tmp_path_factory):
    """Two tables bucketed on the join key must join with zero shuffle."""
    from spark_iqmulus_spark.operators.partitioning import write_bucketed

    base = tmp_path_factory.mktemp("buckets")
    write_bucketed(
        tables["lineitem"], "li_b", str(base / "li"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        tables["orders"].withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_b", str(base / "ord"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    # At test scale the dim side fits the broadcast threshold and the planner
    # (correctly) prefers a broadcast join, ignoring buckets.  Force the
    # at-scale scenario — both sides too big to broadcast — to verify the
    # bucket layout carries the join with zero shuffle.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        p = plan_text(joined, "simple")
        assert "Exchange" not in p, p
        assert "Bucketed: true" in p, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # sanity: same row count as the plain join
    plain = tables["lineitem"].join(
        tables["orders"], tables["lineitem"].l_orderkey == tables["orders"].o_orderkey
    )
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_salted_join_matches_plain_inner(spark, tables):
    from spark_iqmulus_spark.operators.partitioning import salted_join

    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    ords = tables["orders"].select(
        tables["orders"].o_orderkey.alias("l_orderkey"), "o_orderstatus"
    )
    salted = salted_join(li, ords, "l_orderkey", n_salt=4, salt_from="l_quantity")
    plain = li.join(ords, "l_orderkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_matches_plain_left(spark, tables):
    from spark_iqmulus_spark.operators.partitioning import salted_join

    cust = tables["customer"].select("c_custkey", "c_name")
    ords = tables["orders"].select(
        tables["orders"].o_custkey.alias("c_custkey"), "o_orderstatus"
    )
    salted = salted_join(cust, ords, "c_custkey", n_salt=4, how="left")
    plain = cust.join(ords, "c_custkey", "left")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land in more than one salt bucket."""
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.partitioning import salted_join

    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "x")], "k int, v string")
    out = salted_join(hot, dim, "k", n_salt=8, salt_from="payload")
    assert out.count() == 10_000
    n_buckets = (
        hot.withColumn("s", F.pmod(F.abs(F.hash("payload")), F.lit(8)))
        .select("s").distinct().count()
    )
    assert n_buckets > 1


def test_viral_shingle_cap_bounds_skew(spark):
    """Skew hardening (VERDICT r4 item 6): one viral boilerplate shingle at
    ~all-docs frequency must NOT drive the near-dup self-join.  The MAX_DF
    stop-shingle cap bounds per-join-key work to MAX_DF² rows, which is the
    task-time variance bound at any scale (a shuffle-join task's work is the
    sum of its keys' df² costs); without the cap the viral key alone would
    contribute C(n_docs, 2) intersection rows to a single task."""
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.dedup import (
        MAX_DF,
        _shingles,
        ngram_pairs,
    )

    n = 300  # 3 × MAX_DF: viral shingles clearly over the cap
    rows = []
    for i in range(n):
        # every doc shares the viral boilerplate prefix; bodies are unique
        rows.append(
            (i, f"shared viral boilerplate preamble sentence here body{i} "
                f"tok{i * 7} tok{i * 13} tok{i * 29}")
        )
    # planted near-dup pair with RARE shared content (must survive the cap)
    rows.append((1000, "rare alpha beta gamma delta epsilon zeta payload one"))
    rows.append((1001, "rare alpha beta gamma delta epsilon zeta payload two"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = _shingles(docs)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    viral = df_counts.where(F.col("df") > MAX_DF)
    assert viral.count() > 0  # the fixture really is skewed
    capped = sh.join(
        df_counts.where(F.col("df") <= MAX_DF).select("shingle"), "shingle"
    )
    # the invariant that bounds any join task: per-key frequency ≤ MAX_DF
    max_df_after = capped.groupBy("shingle").count().agg(
        F.max("count")
    ).collect()[0][0]
    assert max_df_after <= MAX_DF

    pairs = ngram_pairs(docs).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1000, 1001) in found  # rare near-dup still detected
    # viral-only doc pairs must NOT appear (their only overlap was capped);
    # without the cap there would be C(300,2) = 44850 such pairs
    assert all(a >= 1000 for a, _ in found), sorted(found)[:5]


def test_global_row_number_matches_window(spark, tables):
    """Two-phase distributed ranking == single-partition window ranking,
    and the full-data window in its plan is bucket-partitioned (the only
    unpartitioned window is over the O(buckets) offsets side)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from spark_iqmulus_spark.operators.partitioning import with_global_row_number

    ords = tables["orders"].select("o_orderkey", "o_totalprice")
    scalable = with_global_row_number(
        ords, "o_totalprice", "o_orderkey", num_buckets=8
    ).select("o_orderkey", "rn")
    reference = ords.withColumn(
        "rn", F.row_number().over(W.orderBy("o_totalprice", "o_orderkey"))
    ).select("o_orderkey", "rn")
    assert scalable.exceptAll(reference).count() == 0
    assert reference.exceptAll(scalable).count() == 0
    p = plan_text(scalable, "formatted")
    assert "row_number()windowspecdefinition(__bucket" in p.replace(" ", ""), p


def test_ntile_scalable_matches_window_ntile(spark):
    from spark_iqmulus_spark.operators.partitioning import q_window_ntile_scalable
    from spark_iqmulus_spark.operators.relational2 import q_window_ntile

    a = {tuple(r) for r in q_window_ntile_scalable(spark, SF_DIR).collect()}
    b = {tuple(r) for r in q_window_ntile(spark, SF_DIR).collect()}
    assert a == b


def test_morton_clustering_tightens_bounds(spark):
    """After cluster_by_morton, per-partition x/y bounding boxes must be
    far tighter than random partitioning — the property that makes
    file-level min/max skipping effective."""
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.spatial import cluster_by_morton

    n = 40_000
    pts = spark.range(n).select(
        (F.col("id") * 2654435761 % 1024).cast("int").alias("x"),
        (F.col("id") * 40503 % 1024).cast("int").alias("y"),
    )

    def mean_area(df):
        part = df.withColumn("p", F.spark_partition_id())
        boxes = part.groupBy("p").agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        row = boxes.agg(F.avg(F.col("dx") * F.col("dy"))).collect()[0][0]
        return float(row)

    random_area = mean_area(pts.repartition(16))
    clustered_area = mean_area(cluster_by_morton(pts, "x", "y", 16))
    assert clustered_area < random_area / 3, (clustered_area, random_area)


def test_compact_parquet_merges_small_files(spark, tables, tmp_path):
    """Many small files -> few target-sized files, zero row loss; sorted
    variant keeps rows clustered for min/max page-stat selectivity."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from spark_iqmulus_spark.operators.partitioning import compact_parquet

    src = str(tmp_path / "small")
    tables["lineitem"].repartition(64).write.parquet(src)
    import os

    assert sum(f.endswith(".parquet") for f in os.listdir(src)) == 64

    dest = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dest, target_file_bytes=64 * 1024 * 1024)
    assert n <= 2
    assert spark.read.parquet(dest).count() == tables["lineitem"].count()

    dest2 = str(tmp_path / "compact_sorted")
    compact_parquet(
        spark, src, dest2, target_file_bytes=1 << 20, sort_within=["l_orderkey"]
    )
    sorted_df = spark.read.parquet(dest2)
    assert sorted_df.count() == tables["lineitem"].count()
    # within every output partition the sort key must be non-decreasing
    bad = (
        sorted_df.select(
            "l_orderkey", F.spark_partition_id().alias("p")
        )
        .withColumn(
            "prev",
            F.lag("l_orderkey").over(
                W.partitionBy("p").orderBy(F.monotonically_increasing_id())
            ),
        )
        .where("prev IS NOT NULL AND prev > l_orderkey")
        .count()
    )
    assert bad == 0


def test_observe_counts_single_pass(spark):
    """Observation metrics must match a separately computed aggregate while
    being collected during the action itself (no second scan)."""
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.partitioning import observe_counts
    from spark_iqmulus_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    kept = docs.where(F.col("n_chars") >= 100)
    observed, obs = observe_counts(
        kept,
        "curation",
        {"n_kept": F.count(F.lit(1)), "chars": F.sum("n_chars")},
    )
    n_rows = observed.count()  # the action that materializes the metrics
    assert obs.get["n_kept"] == n_rows
    assert obs.get["chars"] == kept.agg(F.sum("n_chars")).collect()[0][0]


def test_partition_stats_balance(spark):
    """After an explicit round-robin repartition, partition_stats must see
    the requested partition count with near-uniform row counts."""
    from spark_iqmulus_spark.operators.partitioning import partition_stats
    from spark_iqmulus_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    stats = partition_stats(docs.repartition(8)).collect()
    assert len(stats) == 8
    counts = [r["n_rows"] for r in stats]
    assert sum(counts) == docs.count()
    assert max(counts) - min(counts) <= 2  # round-robin is near-uniform


def test_radius_join_dense_cell_skew(spark):
    """Adversarial spatial skew (VERDICT r5 item 6): EVERY point lands in
    one grid cell, so the equi-join on (cx, cy) has a single join key.
    Correctness must hold and the job must finish in bounded time — AQE
    splits the skewed partition (skewJoin) instead of serializing all
    candidate pairs through one task.  Pair math is verified against a
    numpy brute force on a subsample."""
    import time

    import numpy as np

    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.spatial import radius_join

    n, r = 4000, 1000.0  # all points inside one r×r cell
    rng = np.random.default_rng(11)
    xs = rng.uniform(0, r * 0.1, n)  # clustered: most pairs also qualify
    ys = rng.uniform(0, r * 0.1, n)
    pts = spark.createDataFrame(
        [(i, float(xs[i]), float(ys[i])) for i in range(n)],
        "pid long, x double, y double",
    ).repartition(32)

    # the fixture really is maximally skewed: exactly one populated cell
    cells = pts.select(
        F.floor(F.col("x") / r).alias("cx"), F.floor(F.col("y") / r).alias("cy")
    ).distinct()
    assert cells.count() == 1

    t0 = time.perf_counter()
    got = radius_join(pts, r).count()
    wall = time.perf_counter() - t0
    # truth: every pair is within r·√2·0.1 < r ⇒ all C(n,2) pairs qualify
    assert got == n * (n - 1) // 2
    # tripwire: 8M candidate pairs through a JVM codegen equi-join should
    # take ~seconds; minutes would mean the plan degraded to one task or
    # a nested loop
    assert wall < 60, f"dense-cell radius_join took {wall:.1f}s"
