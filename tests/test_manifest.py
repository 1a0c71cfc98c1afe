"""Tile-manifest catalog tests: pruning correctness, actually-prunes, and
staleness detection."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from .fixtures import make_las


@pytest.fixture()
def tile_dir(spark, tmp_path):
    """Three tiles with disjoint x bounds: [0,100), [1000,1100), [5000,5100)
    in world coords (scale 0.01 → raw = world / 0.01)."""
    import numpy as np

    d = str(tmp_path / "tiles")
    os.makedirs(d)
    for i, base in enumerate((0, 1000, 5000)):
        p = os.path.join(d, f"t{i}.las")
        arr = make_las(p, n=100, fmt=1, seed=i)
        # rewrite x into the tile's band: raw ints so world = 0.01 * raw
        from spark_iqmulus_spark.sources.las_format import LasHeader

        hdr = LasHeader.parse_file(p)
        raw = np.arange(100, dtype=np.int32) * 100 + int(base / 0.01)
        with open(p, "r+b") as f:
            for pid in range(100):
                f.seek(hdr.offset_to_points + pid * hdr.stride)
                f.write(raw[pid].tobytes())
        # refresh header bounds to match the new x values
        hdr.pmin = (float(base), hdr.pmin[1], hdr.pmin[2])
        hdr.pmax = (float(base) + 0.01 * 9900, hdr.pmax[1], hdr.pmax[2])
        with open(p, "r+b") as f:
            f.write(hdr.to_bytes()[: hdr.offset_to_points])
        del arr
    return d


def test_manifest_prunes_and_matches(spark, tile_dir, tmp_path):
    from spark_iqmulus_spark.plans.manifest import (
        pruned_paths,
        read_pruned,
        write_manifest,
    )

    man = str(tmp_path / "man")
    paths = [os.path.join(tile_dir, f) for f in os.listdir(tile_dir)]
    write_manifest(spark, paths, man)

    # bounds query touching only the middle tile
    hit = pruned_paths(spark, man, x_range=(1000.0, 1100.0))
    assert [os.path.basename(p) for p in hit] == ["t1.las"]

    # read through the manifest == read everything then filter
    via_manifest = (
        read_pruned(spark, man, "las", x_range=(1000.0, 1100.0))
        .where((F.col("x") >= 100000) & (F.col("x") <= 110000))
        .count()
    )
    full = (
        spark.read.format("las")
        .load(tile_dir)
        .where((F.col("x") >= 100000) & (F.col("x") <= 110000))
        .count()
    )
    assert via_manifest == full == 100

    # no-match range → empty frame, schema intact
    empty = read_pruned(spark, man, "las", x_range=(90000.0, 99000.0))
    assert empty.count() == 0
    assert "x" in empty.columns


def test_manifest_staleness_detection(spark, tile_dir, tmp_path):
    from spark_iqmulus_spark.plans.manifest import pruned_paths, write_manifest

    man = str(tmp_path / "man")
    paths = [os.path.join(tile_dir, f) for f in os.listdir(tile_dir)]
    write_manifest(spark, paths, man)
    # touch a tile after manifest build → verify=True must flag it
    victim = os.path.join(tile_dir, "t0.las")
    with open(victim, "ab") as f:
        f.write(b"\0")
    with pytest.raises(ValueError, match="stale"):
        pruned_paths(spark, man, x_range=(0.0, 10000.0), verify=True)
    # without verify, pruning is advisory and still returns candidates
    assert pruned_paths(spark, man, x_range=(0.0, 10000.0))


def test_manifest_incremental_update(spark, tile_dir, tmp_path):
    """New and modified tiles fold in with O(new) header reads; untouched
    rows survive; counts stay exact."""
    from spark_iqmulus_spark.plans.manifest import (
        update_manifest,
        write_manifest,
    )

    man = str(tmp_path / "man")
    paths = sorted(
        os.path.join(tile_dir, f) for f in os.listdir(tile_dir)
    )
    write_manifest(spark, paths[:2], man)  # t0, t1 only
    assert spark.read.parquet(man).count() == 2

    # nothing new → no-op
    assert update_manifest(spark, man, paths[:2]) == 0

    # t2 arrives → one new row
    assert update_manifest(spark, man, tile_dir) == 1
    m = spark.read.parquet(man)
    assert m.count() == 3
    assert {os.path.basename(r["path"]) for r in m.collect()} == {
        "t0.las",
        "t1.las",
        "t2.las",
    }

    # modify t0 → exactly its row refreshes
    make_las(paths[0], n=50, fmt=1, seed=9)
    assert update_manifest(spark, man, tile_dir) == 1
    row = (
        spark.read.parquet(man)
        .where(F.col("path") == paths[0])
        .collect()[0]
    )
    assert row["n_points"] == 50


def test_manifest_crash_recovery_from_old(spark, tile_dir, tmp_path):
    """ADVICE r7: a crash between the two swap renames strands the data at
    '.old' with no manifest at the target — the next update_manifest must
    recover it instead of failing on a missing path."""
    import shutil

    from spark_iqmulus_spark.plans.manifest import (
        update_manifest,
        write_manifest,
    )

    man = str(tmp_path / "man")
    paths = sorted(os.path.join(tile_dir, f) for f in os.listdir(tile_dir))
    write_manifest(spark, paths[:2], man)
    # simulate the mid-swap crash: manifest moved aside, tmp never landed
    os.rename(man, man + ".old")
    assert not os.path.exists(man)
    assert update_manifest(spark, man, paths[:3]) == 1  # recovered + t2 added
    m = spark.read.parquet(man)
    assert m.count() == 3
    assert not os.path.exists(man + ".old")
    shutil.rmtree(man)


def test_update_plan_is_join_based(spark):
    """Plan pin: the incremental update compares and removes via anti-joins
    — the existing manifest is never collected and no literal IN-list of
    fresh paths enters the plan (at 1M tiles both are driver bottlenecks)."""
    from spark_iqmulus_spark.plans.manifest import _fresh_and_kept

    manifest = spark.range(0, 100_000).selectExpr(
        "concat('/tiles/t', id, '.las') as path",
        "id as mtime_ns",
        "id as size",
        "id as n_points",
    )
    stats = spark.range(0, 100_000, 7).selectExpr(
        "concat('/tiles/t', id, '.las') as path",
        "id + 1 as mtime_ns",  # every listed file looks changed
        "id as size",
    )
    fresh, kept = _fresh_and_kept(manifest, stats)
    plan = kept.sparkSession._jvm.PythonSQLUtils.explainString(
        kept._jdf.queryExecution(), "extended"
    )
    assert plan.count("LeftAnti") >= 2
    assert " IN (" not in plan and "path IN" not in plan
    # functional: fresh = changed listed files; kept = manifest minus fresh
    n_listed = stats.count()
    assert fresh.count() == n_listed
    assert kept.count() == 100_000 - n_listed


def test_manifest_update_detects_content_change(spark, tile_dir, tmp_path):
    """A rewritten tile (same path, different mtime/size) is re-parsed and
    its manifest row replaced via the join path."""
    import glob
    import time

    from spark_iqmulus_spark.plans.manifest import (
        update_manifest,
        write_manifest,
    )

    paths = sorted(glob.glob(os.path.join(tile_dir, "*.las")))
    man = str(tmp_path / "man")
    write_manifest(spark, paths, man)
    assert update_manifest(spark, man, tile_dir) == 0
    # touch one tile: mtime change alone must refresh exactly one row
    future = time.time() + 5
    os.utime(paths[1], (future, future))
    assert update_manifest(spark, man, tile_dir) == 1
    m = spark.read.parquet(man)
    assert m.count() == len(paths)
    assert m.select("path").distinct().count() == len(paths)


def test_scan_manifest_prunes_ply(spark, tmp_path):
    """Stats-from-data manifest (PLY has no header bounds): bounds come
    from one distributed scan; read_pruned then prunes tiles by x-range
    and re-reads only candidates."""
    import numpy as np

    from spark_iqmulus_spark.sources.ply_format import (
        PlyElement,
        PlyHeader,
        PlyProperty,
    )
    from spark_iqmulus_spark.plans.manifest import (
        pruned_paths,
        read_pruned,
        write_manifest_scan,
    )

    d = tmp_path / "tiles"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i, base in enumerate((0.0, 1000.0, 5000.0)):
        arr = np.zeros(200, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
        arr["x"] = (base + rng.uniform(0, 100, 200)).astype(np.float32)
        arr["y"] = rng.uniform(0, 50, 200).astype(np.float32)
        arr["z"] = rng.uniform(0, 10, 200).astype(np.float32)
        hdr = PlyHeader(
            location=str(d / f"t{i}.ply"),
            little_endian=True,
            elements=[
                PlyElement(
                    "vertex",
                    200,
                    [PlyProperty(c, "f4") for c in ("x", "y", "z")],
                )
            ],
        )
        with open(d / f"t{i}.ply", "wb") as f:
            f.write(hdr.to_bytes())
            f.write(arr.tobytes())

    import glob

    paths = sorted(glob.glob(str(d / "*.ply")))
    man = str(tmp_path / "man")
    write_manifest_scan(spark, paths, man, fmt="ply")
    m = spark.read.parquet(man)
    assert m.count() == 3
    assert {"path", "n_points", "x_min", "x_max"} <= set(m.columns)
    # prune to the middle tile only
    hit = pruned_paths(spark, man, x_range=(900.0, 1200.0), verify=True)
    assert [p.endswith("t1.ply") for p in hit] == [True]
    df = read_pruned(spark, man, "ply", x_range=(900.0, 1200.0))
    assert df.count() == 200
    # nothing matches far outside
    assert read_pruned(spark, man, "ply", x_range=(9e6, 9.1e6)).count() == 0
