"""Behavioral + plan tests for operators/curation.py (round 8)."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_dataset_diff_statuses(spark):
    """Diff statuses follow exactly from the snapshot construction:
    doc_id%11==0 → added (only in new), %13==0 → removed (only in old),
    %7==0 → changed (text rewritten in new); everything else unchanged
    and therefore absent from the output."""
    from spark_iqmulus_spark.operators.curation import q_dataset_diff

    rows = {r["doc_id"]: r["status"] for r in q_dataset_diff(spark, SF).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    for doc_id, status in rows.items():
        if doc_id % 11 == 0:
            assert status == "added"
        elif doc_id % 13 == 0:
            assert status == "removed"
        else:
            assert doc_id % 7 == 0 and status == "changed"
    # every doc divisible by 11 or 13 or 7 (and in range) must appear;
    # doc divisible by both 11 and 13 is in neither snapshot → absent
    for i in range(n_docs):
        in_old = i % 11 != 0
        in_new = i % 13 != 0
        expect = (
            (not in_old and in_new)
            or (in_old and not in_new)
            or (in_old and in_new and i % 7 == 0)
        )
        assert (i in rows) == expect, i


def test_compaction_plan_partition_invariants(spark):
    """Within each source: bins are keyed by cumulative size, key ranges
    of consecutive bins never overlap, and group sizes account for every
    file exactly once."""
    from spark_iqmulus_spark.operators.curation import (
        COMPACTION_TARGET,
        q_compaction_plan,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total = docs.groupBy("source").sum("n_chars").collect()
    totals = {r["source"]: r["sum(n_chars)"] for r in total}

    plan = q_compaction_plan(spark, SF).collect()
    by_source: dict[str, list] = {}
    for r in plan:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r["bin"])
        # all files accounted for
        assert sum(r["group_bytes"] for r in rows) == totals[source]
        # ordered binning → key ranges strictly increase bin to bin
        for a, b in zip(rows, rows[1:]):
            assert a["last_key"] < b["first_key"]
        # every bin except the last crosses the target boundary: the next
        # bin exists only because cumulative size passed (bin+1)*target
        cum = 0
        for r in rows[:-1]:
            cum += r["group_bytes"]
            assert cum >= (r["bin"] + 1) * COMPACTION_TARGET - COMPACTION_TARGET


def test_perplexity_matches_local_model(spark):
    """Per-document NLL equals a locally-recomputed trigram model score,
    and the model join side is broadcast (plan check)."""
    from spark_iqmulus_spark.operators.curation import q_text_perplexity

    docs = {
        r["doc_id"]: r["text"].lower()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    counts: dict[str, int] = {}
    per_doc: dict[int, list] = {}
    for doc_id, s in docs.items():
        if len(s) < 3:
            continue
        tris = [s[i : i + 3] for i in range(len(s) - 2)]
        per_doc[doc_id] = tris
        for tr in tris:
            counts[tr] = counts.get(tr, 0) + 1
    total = float(sum(counts.values()))

    out = {r["doc_id"]: r for r in q_text_perplexity(spark, SF).collect()}
    assert set(out) == set(per_doc)
    for doc_id, tris in per_doc.items():
        assert out[doc_id]["n_tri"] == len(tris)
        nll = -sum(math.log(counts[t] / total) for t in tris) / len(tris)
        assert abs(out[doc_id]["nll"] - round(nll, 4)) <= 1e-9, doc_id

    plan = (
        q_text_perplexity(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_diff_plan_prunes_text_before_join(spark):
    """The diff must shuffle (key, hash) only: the join inputs project
    away the text column, so the optimized plan's join operates on
    2-column sides (no document text crosses the exchange)."""
    from spark_iqmulus_spark.operators.curation import q_dataset_diff

    plan = (
        q_dataset_diff(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
    )
    # md5(text) is computed below the join; the join keys/outputs carry
    # only doc_id + hash columns
    join_idx = plan.find("Join")
    assert join_idx != -1
    assert "md5" not in plan[:join_idx]


def test_bpe_pairs_match_local_counts(spark):
    """Top-K merge-pair counts equal a locally-recomputed weighted count,
    and ranks are the unique (cnt desc, pair) ordering."""
    from spark_iqmulus_spark.operators.curation import BPE_TOP_K, q_bpe_pairs

    texts = [
        r["text"].lower()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    wf: dict[str, int] = {}
    for s in texts:
        for w in s.split(" "):
            if len(w) >= 2:
                wf[w] = wf.get(w, 0) + 1
    counts: dict[str, int] = {}
    for w, f in wf.items():
        for i in range(len(w) - 1):
            counts[w[i : i + 2]] = counts.get(w[i : i + 2], 0) + f
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]

    rows = sorted(q_bpe_pairs(spark, SF).collect(), key=lambda r: r["rank"])
    assert [(r["pair"], r["cnt"]) for r in rows] == expect
    assert [r["rank"] for r in rows] == list(range(1, len(expect) + 1))
