"""Z-order clustering (Delta OPTIMIZE ZORDER / Iceberg sort-order analog):
interleave correctness vs a pure-python Morton reference, and the skipping
payoff — a trailing-column predicate prunes files on a z-ordered table
where a linear-sorted table must read everything."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.cdc.tableio import SnapshotTable, _zorder_col


def _morton(vals: list[int], nbits: int) -> int:
    n = len(vals)
    z = 0
    for ci, v in enumerate(vals):
        for j in range(nbits):
            z |= ((v >> j) & 1) << (j * n + (n - 1 - ci))
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (63, 63), (17, 42), (5, 60)]
    df = spark.createDataFrame(rows, "x long, y long")
    # bounds [0, 64) with 6 bits → rank is the value itself
    z = _zorder_col(["x", "y"], {"x": [0, 64], "y": [0, 64]}, nbits=6)
    got = [r["z"] for r in df.select(z.alias("z")).collect()]
    want = [_morton([x, y], 6) for x, y in rows]
    assert got == want


def test_clamp_and_null_rank_zero(spark):
    df = spark.createDataFrame(
        [(-5.0, 200.0), (None, None)], "x double, y double"
    )
    z = _zorder_col(["x", "y"], {"x": [0, 64], "y": [0, 64]}, nbits=6)
    lo_hi, nulls = [r["z"] for r in df.select(z.alias("z")).collect()]
    assert lo_hi == _morton([0, 63], 6)  # clamped to edge buckets
    assert nulls == 0


def test_create_validates_zorder_props(spark, tmp_path):
    with pytest.raises(ValueError, match="zorder_bounds"):
        SnapshotTable.create(
            spark, str(tmp_path / "a"), keys=["id"],
            props={"zorder_cols": ["x"], "stats_cols": ["x"]},
        )
    with pytest.raises(ValueError, match="stats_cols"):
        SnapshotTable.create(
            spark, str(tmp_path / "b"), keys=["id"],
            props={"zorder_cols": ["x"], "zorder_bounds": {"x": [0, 1]}},
        )


@pytest.fixture(scope="module")
def grid_tables(spark, tmp_path_factory):
    """64x64 grid (id = x*64+y), one bucket, 256-row files → 16 files.
    linear: sorted (x, y); zorder: Morton-clustered on (x, y)."""
    root = tmp_path_factory.mktemp("zorder")
    rows = [(x * 64 + y, x, y) for x in range(64) for y in range(64)]
    df = (
        spark.createDataFrame(rows, "id long, x long, y long")
        .withColumn("op", F.lit("upsert"))
        .withColumn("seq", F.col("id"))
    )
    base = {"stats_cols": ["x", "y"], "max_file_rows": 256}
    tables = {}
    for name, extra in (
        ("linear", {}),
        ("zorder", {"zorder_cols": ["x", "y"],
                    "zorder_bounds": {"x": [0, 64], "y": [0, 64]}}),
    ):
        t = SnapshotTable.create(
            spark, str(root / name), keys=["id"], nbuckets=1,
            props={**base, **extra},
        )
        t.merge(df, batch_id="g0")
        tables[name] = t
    return tables


def test_trailing_column_predicate_prunes_only_on_zorder(grid_tables):
    filters = [("y", ">=", 16), ("y", "<", 24)]
    want = 64 * 8
    got = {}
    for name, t in grid_tables.items():
        assert t.scan(filters).count() == want  # identical results either way
        got[name] = dict(t.last_scan)
    # linear (x, y) sort: every file spans the full y range → nothing prunable
    assert got["linear"]["files_pruned"] == 0
    # z-order localizes y too: the y-stripe lives in a strict subset of files
    assert got["zorder"]["files_pruned"] >= got["zorder"]["files_total"] // 2
    assert got["zorder"]["files_read"] < got["linear"]["files_read"]


def test_leading_column_predicate_still_prunes_on_zorder(grid_tables):
    filters = [("x", ">=", 16), ("x", "<", 24)]
    t = grid_tables["zorder"]
    assert t.scan(filters).count() == 8 * 64
    assert t.last_scan["files_pruned"] >= t.last_scan["files_total"] // 2


def test_zorder_compact_preserves_state_and_clustering(spark, grid_tables):
    t = grid_tables["zorder"]
    before = sorted(tuple(r) for r in t.read().collect())
    t.compact(min_files=1)
    after = sorted(tuple(r) for r in t.read().collect())
    assert after == before
    t.scan([("y", ">=", 16), ("y", "<", 24)])
    # re-clustered rewrite keeps multi-dim skipping effective
    assert t.last_scan["files_pruned"] > 0
