"""Graph algorithm unit tests on handcrafted graphs (known answers).

The declared q_graph_* queries are hash-checked against DuckDB by
tools/check.py; these tests pin the *algorithms* on graphs where the
answers are computable by hand — K4, a path, and a disconnected extra
component — independent of the similarity-graph edge derivation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_iqmulus_spark.operators.graph import (
    bfs_levels,
    common_neighbors,
    degrees,
    pagerank,
    triangles,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangles_k4(spark):
    # K4 has exactly C(4,3) = 4 triangles.
    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    tris = {tuple(r) for r in triangles(k4).collect()}
    assert tris == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}


def test_triangles_path_has_none(spark):
    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert triangles(path).count() == 0


def test_degrees_and_common_neighbors_path(spark):
    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    deg = {r["node"]: r["degree"] for r in degrees(path).collect()}
    assert deg == {1: 1, 2: 2, 3: 2, 4: 2, 5: 1}
    # friend-of-friend pairs on a path: skip-one neighbors only
    cn = {(r["node_x"], r["node_z"]): r["n_common"]
          for r in common_neighbors(path, min_common=1).collect()}
    assert cn == {(1, 3): 1, (2, 4): 1, (3, 5): 1}


def test_bfs_levels_path_with_island(spark):
    # component of 1: a path; nodes 10-11 unreachable -> absent from result
    g = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    lv = {r["node"]: r["level"] for r in bfs_levels(g, max_hops=3).collect()}
    assert lv == {1: 0, 2: 1, 3: 2, 4: 3}


def test_pagerank_symmetry_and_mass(spark):
    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    pr = {r["node"]: r["pr"] for r in pagerank(path, iterations=5).collect()}
    # symmetric graph -> symmetric ranks; total mass conserved (no dangling)
    assert math.isclose(pr[1], pr[5], abs_tol=1e-9)
    assert math.isclose(pr[2], pr[4], abs_tol=1e-9)
    assert math.isclose(sum(pr.values()), 1.0, abs_tol=1e-4)
    # endpoints of a path rank below the middle's neighbors
    assert pr[1] < pr[2]


def test_graph_queries_registered():
    from spark_iqmulus_spark.registry import all_oracles, all_queries

    QUERIES, ORACLES = all_queries(), all_oracles()
    for k in (
        "q_graph_degree",
        "q_graph_triangles",
        "q_graph_common_neighbors",
        "q_graph_bfs",
        "q_graph_pagerank",
    ):
        assert k in QUERIES and k in ORACLES


def test_clustering_coef_k4_and_path(spark):
    """K4 nodes are fully clustered (coef 1.0); path nodes have no
    triangles (coef 0.0)."""
    from spark_iqmulus_spark.operators.graph import degrees, triangles

    # compose the metric the query computes, on handcrafted graphs
    def coef(edges_df):
        from pyspark.sql import functions as F

        tri = triangles(edges_df)
        corners = (
            tri.select(F.col("ta").alias("node"))
            .union(tri.select(F.col("tb").alias("node")))
            .union(tri.select(F.col("tc").alias("node")))
        )
        tpn = corners.groupBy("node").count()
        deg = degrees(edges_df).where(F.col("degree") >= 2)
        out = deg.join(tpn, "node", "left").select(
            "node",
            (F.coalesce("count", F.lit(0))
             / (F.col("degree") * (F.col("degree") - 1) / 2)).alias("c"),
        )
        return {r["node"]: r["c"] for r in out.collect()}

    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    assert all(abs(c - 1.0) < 1e-9 for c in coef(k4).values())
    path = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert all(c == 0.0 for c in coef(path).values())


def test_staged_edges_guard(spark, tmp_path, monkeypatch):
    """ADVICE r9: a stale/wrong SPARK_GRAFT_EDGES_PARQUET must fail loudly,
    not silently substitute a different graph."""
    import json
    import os

    import pytest

    from spark_iqmulus_spark.operators import graph

    good = str(tmp_path / "edges_ok")
    spark.createDataFrame([(1, 2), (2, 3)], "a int, b int").write.parquet(good)
    with open(os.path.join(good, graph._EDGES_META), "w") as f:
        json.dump({"sf_dir": os.path.abspath("/root/testdata/sf0.001"),
                   "source": "sim_edges"}, f)

    monkeypatch.setenv("SPARK_GRAFT_EDGES_PARQUET", good)
    graph._STAGED_OK.clear()
    df = graph.sim_edges(spark, "/root/testdata/sf0.001")
    assert df.columns == ["a", "b"] and df.count() == 2

    # provenance mismatch: staged for sf0.001, asked for sf0.01 — must
    # re-validate WITHOUT clearing the cache (keyed per dataset, not per
    # path: a path-only cache would skip exactly this check)
    with pytest.raises(ValueError, match="stale"):
        graph.sim_edges(spark, "/root/testdata/sf0.01")

    # contract violation: an a >= b row (sidecar present, so the check
    # proceeds past provenance)
    bad = str(tmp_path / "edges_bad")
    spark.createDataFrame([(5, 2)], "a int, b int").write.parquet(bad)
    with open(os.path.join(bad, graph._EDGES_META), "w") as f:
        json.dump({"sf_dir": os.path.abspath("/root/testdata/sf0.001"),
                   "source": "sim_edges"}, f)
    monkeypatch.setenv("SPARK_GRAFT_EDGES_PARQUET", bad)
    graph._STAGED_OK.clear()
    with pytest.raises(ValueError, match="a < b"):
        graph.sim_edges(spark, "/root/testdata/sf0.001")

    # missing sidecar: strict by default (ADVICE r10 — stage_edges always
    # writes one, so absence means unknown provenance), warn-only behind
    # the explicit legacy opt-in
    nosc = str(tmp_path / "edges_nosidecar")
    spark.createDataFrame([(1, 2)], "a int, b int").write.parquet(nosc)
    monkeypatch.setenv("SPARK_GRAFT_EDGES_PARQUET", nosc)
    graph._STAGED_OK.clear()
    with pytest.raises(ValueError, match="sidecar"):
        graph.sim_edges(spark, "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_EDGES_ALLOW_NOSIDECAR", "1")
    graph._STAGED_OK.clear()
    df = graph.sim_edges(spark, "/root/testdata/sf0.001")
    assert df.count() == 1
    monkeypatch.delenv("SPARK_GRAFT_EDGES_ALLOW_NOSIDECAR")

    # wrong shape: missing edge columns
    shapeless = str(tmp_path / "edges_shapeless")
    spark.createDataFrame([(1,)], "x int").write.parquet(shapeless)
    monkeypatch.setenv("SPARK_GRAFT_EDGES_PARQUET", shapeless)
    graph._STAGED_OK.clear()
    with pytest.raises(ValueError, match="edge"):
        graph.sim_edges(spark, "/root/testdata/sf0.001")


def test_graph_no_persist():
    """Module policy (round 14 — VERDICT r13 wrong #2): graph.py must
    materialize with ``localCheckpoint``, never ``persist``.  A persist
    without a paired release leaks cached RDDs for the session AND lets
    the CacheManager plan-match a later invocation's identical sub-plan
    against a prior run's cache, flattering repeat timings (the r7
    honesty fix).  Source-level pin: zero ``.persist(`` call sites."""
    import inspect

    from spark_iqmulus_spark.operators import graph

    src = inspect.getsource(graph)
    assert ".persist(" not in src
    assert ".localCheckpoint(" in src
