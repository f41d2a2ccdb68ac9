"""Column rename/drop schema evolution — SnapshotTable.rename_column /
drop_column (the Iceberg RENAME/DROP COLUMN analog for a name-addressed
layout: metadata-only commits, read-time alias coalescing, migrate-on-touch
rewrites, name-registry pruning at snapshot expiry). Reference analogs:
pyetl's ren/supp attribute commands (traitement_alpha.py)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path, **kw):
    props = {"stats_cols": ["x"], "max_file_rows": 8}
    props.update(kw.pop("props", {}))
    return SnapshotTable.create(
        spark, str(tmp_path / "t"), keys=["k"], nbuckets=2, props=props, **kw
    )


def _delta(spark, rows, cols=("k", "x", "op", "seq")):
    return spark.createDataFrame(rows, list(cols))


def _state(t, col="x") -> dict:
    return {r["k"]: r[col] for r in t.read().collect()}


def _live_files(t) -> list[str]:
    m = t.manifest()
    return sorted(f for fs in m["buckets"].values() for f in fs)


def test_rename_is_metadata_only_and_reads_old_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i * 10, "upsert", i) for i in range(12)]), "b1")
    files = _live_files(t)
    t.rename_column("x", "amount")
    assert _live_files(t) == files  # no data rewritten
    assert t.read().columns == ["k", "amount"]
    assert _state(t, "amount") == {i: i * 10 for i in range(12)}
    # manifest records the retirement
    m = t.manifest()
    assert m["aliases"] == {"x": "amount"}
    assert m["props"]["stats_cols"] == ["amount"]


def test_merge_after_rename_mixes_old_and_new_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", 1) for i in range(8)]), "b1")
    t.rename_column("x", "amount")
    # new batches write under the NEW name; old files still answer reads
    t.merge(
        _delta(spark, [(i, i * 100, "upsert", 2) for i in range(4)],
               cols=("k", "amount", "op", "seq")),
        "b2",
    )
    expect = {i: (i * 100 if i < 4 else i) for i in range(8)}
    assert _state(t, "amount") == expect
    # scan with filters on the new name stays exact across mixed files
    got = {r["k"]: r["amount"] for r in t.scan([("amount", ">=", 4)]).collect()}
    assert got == {k: v for k, v in expect.items() if v >= 4}


def test_chained_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 7, "upsert", 1)]), "b1")
    t.rename_column("x", "y")
    t.rename_column("y", "z")
    assert t.manifest()["aliases"] == {"x": "z", "y": "z"}
    assert _state(t, "z") == {1: 7}
    t.merge(_delta(spark, [(2, 9, "upsert", 2)], cols=("k", "z", "op", "seq")), "b2")
    assert _state(t, "z") == {1: 7, 2: 9}


def test_rename_key_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", 1) for i in range(10)]), "b1")
    t.rename_column("k", "id")
    assert t.manifest()["keys"] == ["id"]
    assert {r["id"] for r in t.read().collect()} == set(range(10))
    # bucketing hashes values, not names: an upsert under the new key name
    # must land in the SAME bucket and supersede the old row
    t.merge(
        _delta(spark, [(3, 333, "upsert", 5)], cols=("id", "x", "op", "seq")), "b2"
    )
    assert {r["x"] for r in t.read().filter(F.col("id") == 3).collect()} == {333}
    assert t.read().count() == 10


def test_delta_under_old_name_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    t.rename_column("x", "amount")
    with pytest.raises(ValueError, match="retired"):
        t.merge(_delta(spark, [(2, 2, "upsert", 2)]), "b2")  # still says "x"
    assert _state(t, "amount") == {1: 1}


def test_rename_target_collisions_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(
        _delta(spark, [(1, 1, 2, "upsert", 1)], cols=("k", "x", "w", "op", "seq")),
        "b1",
    )
    with pytest.raises(ValueError, match="already a column|retained"):
        t.rename_column("x", "w")
    t.rename_column("x", "y")
    with pytest.raises(ValueError, match="retained|retired"):
        t.rename_column("w", "x")  # x is retired but files/history carry it


def test_compact_plus_expire_frees_the_name(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", 1) for i in range(8)]), "b1")
    t.rename_column("x", "amount")
    # full rewrite migrates every file to the new physical name...
    t.compact(min_files=1)
    # ...and expiry retires the pre-rename manifests, freeing the name
    res = t.expire_snapshots(keep_last=1)
    assert res["freed_names"] == 1
    assert not t.manifest().get("aliases")
    # the freed name is reusable as a brand-new column
    t.merge(
        _delta(spark, [(1, 1, 99, "upsert", 9)], cols=("k", "amount", "x", "op", "seq")),
        "b2",
    )
    row = t.read().filter(F.col("k") == 1).collect()[0]
    assert row["amount"] == 1 and row["x"] == 99
    # pre-existing rows never had the new x: it must be null, not resurrected
    assert t.read().filter(F.col("k") == 2).collect()[0]["x"] is None


def test_drop_column_hides_and_blocks_resurrection(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"stats_cols": []})
    t.merge(
        _delta(spark, [(i, i, i * 2, "upsert", 1) for i in range(8)],
               cols=("k", "x", "w", "op", "seq")),
        "b1",
    )
    files = _live_files(t)
    t.drop_column("w")
    assert _live_files(t) == files  # metadata-only
    assert t.read().columns == ["k", "x"]
    # merging without it is fine; re-introducing the name is refused
    t.merge(_delta(spark, [(9, 9, "upsert", 2)]), "b2")
    with pytest.raises(ValueError, match="retired"):
        t.merge(
            _delta(spark, [(1, 1, 5, "upsert", 3)], cols=("k", "x", "w", "op", "seq")),
            "b3",
        )
    # rewrite + expiry frees it; old values must NOT resurrect
    t.compact(min_files=1)
    assert t.expire_snapshots(keep_last=1)["freed_names"] == 1
    t.merge(
        _delta(spark, [(1, 1, 555, "upsert", 4)], cols=("k", "x", "w", "op", "seq")),
        "b4",
    )
    vals = {r["k"]: r["w"] for r in t.read().collect()}
    assert vals[1] == 555
    assert all(v is None for k, v in vals.items() if k != 1)


def test_drop_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    with pytest.raises(ValueError, match="key/bucket"):
        t.drop_column("k")
    with pytest.raises(ValueError, match="layout props"):
        t.drop_column("x")  # in stats_cols
    t.add_constraint("x_pos", "x > 0")
    t.alter_props(set_props={"stats_cols": []})
    with pytest.raises(ValueError, match="x_pos"):
        t.drop_column("x")  # constraint references it
    t.drop_constraint("x_pos")
    t.drop_column("x")
    assert t.read().columns == ["k"]


def test_rename_blocked_by_constraint(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    t.add_constraint("x_pos", "x > 0")
    with pytest.raises(ValueError, match="x_pos"):
        t.rename_column("x", "amount")
    t.drop_constraint("x_pos")
    t.rename_column("x", "amount")
    assert t.read().columns == ["k", "amount"]


def test_time_travel_keeps_historical_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    v1 = t.current_version()
    t.rename_column("x", "amount")
    assert t.read(version=v1).columns == ["k", "x"]
    assert t.read().columns == ["k", "amount"]


def test_cdf_emits_ending_names_across_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 1)]), "b1")
    t.rename_column("x", "amount")
    t.merge(
        _delta(spark, [(1, 100, "upsert", 5)], cols=("k", "amount", "op", "seq")),
        "b2",
    )
    feed = t.changes(0).collect()
    cols = t.changes(0).columns
    assert "amount" in cols and "x" not in cols
    ins = {r["k"]: r["amount"] for r in feed if r["_change_type"] == "insert"}
    assert ins == {1: 1, 2: 2}
    post = {r["k"]: r["amount"] for r in feed if r["_change_type"] == "update_postimage"}
    assert post == {1: 100}


def test_cdf_drops_dropped_columns(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"stats_cols": []})
    t.merge(
        _delta(spark, [(1, 1, 9, "upsert", 1)], cols=("k", "x", "w", "op", "seq")),
        "b1",
    )
    t.drop_column("w")
    t.merge(_delta(spark, [(2, 2, "upsert", 2)]), "b2")
    cols = t.changes(0).columns
    assert "w" not in cols and "x" in cols


def test_skipping_stats_probe_retired_names(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"max_file_rows": 4})
    t.merge(_delta(spark, [(i, float(i), "upsert", 1) for i in range(32)]), "b1")
    t.rename_column("x", "amount")
    # pre-rename files carry footer stats under "x"; the alias probe keeps
    # pruning effective AND exact for filters on the new name
    out = t.scan([("amount", ">=", 28.0)])
    assert {r["k"] for r in out.collect()} == {28, 29, 30, 31}
    assert t.last_scan["files_pruned"] > 0


def test_clone_carries_registries(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    t.rename_column("x", "amount")
    c = t.clone(str(tmp_path / "c"))
    assert c.manifest()["aliases"] == {"x": "amount"}
    assert _state(c, "amount") == {1: 1}
    with pytest.raises(ValueError, match="retired"):
        c.merge(_delta(spark, [(2, 2, "upsert", 2)]), "b2")  # old name


def test_mor_after_rename(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"merge_mode": "mor", "stats_cols": []})
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 1)]), "b1")
    t.rename_column("x", "amount")
    t.merge(
        _delta(spark, [(1, 10, "upsert", 5)], cols=("k", "amount", "op", "seq")),
        "b2",
    )
    assert _state(t, "amount") == {1: 10, 2: 2}
    t.compact()
    assert _state(t, "amount") == {1: 10, 2: 2}


def test_coalesce_dropped_once_files_rewritten(spark, tmp_path):
    # the alias read-shim costs parquet pushdown on the renamed column, so
    # it must vanish as soon as no requested file can still carry the old
    # physical name — compaction rewrites them, and the plan goes back to
    # a plain scan BEFORE expiry ever prunes the alias registry
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", 1) for i in range(8)]), "b1")
    t.rename_column("x", "amount")
    plan = t.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "coalesce" in plan.lower()  # old files still on the taint list
    t.compact(min_files=1)
    assert t.manifest().get("aliases")  # registry not yet pruned (no expiry)
    plan = t.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "coalesce" not in plan.lower()
    assert _state(t, "amount") == {i: i for i in range(8)}


def test_add_column_explicit(spark, tmp_path):
    # declared-up-front widening: readers see the typed null column before
    # any write carries it; the first write that does simply fills it
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    t.add_column("score", "double")
    assert t.read().columns == ["k", "x", "score"]
    assert t.read().collect()[0]["score"] is None
    assert dict(t.read().dtypes)["score"] == "double"
    t.merge(
        spark.createDataFrame([(2, 2, 0.5, "upsert", 2)],
                              "k bigint, x bigint, score double, op string, seq long"),
        "b2",
    )
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: None, 2: 0.5}
    # the add is metadata-only and feed-silent
    assert t.changes(t.current_version() - 2, t.current_version() - 1).count() == 0


def test_add_column_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="no schema yet"):
        t.add_column("y", "int")
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("x", "int")
    with pytest.raises(Exception):  # bad type string fails analysis
        t.add_column("y", "notatype")
    t.rename_column("x", "amount")
    with pytest.raises(ValueError, match="retired"):
        t.add_column("x", "int")  # old physical name still in live files
