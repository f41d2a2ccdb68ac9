"""Per-file bloom-filter sidecars + equality/in-list file skipping
(SnapshotTable.scan with ``bloom_cols`` — Iceberg puffin-blob analog).

Blooms cover the case min/max metrics can't: point lookups on a
high-cardinality column whose values are NOT clustered, so every file's
min/max range spans ~the whole domain. Reference analog: pyetl's keyed
`preload` store does per-key probes against a dict (traitement_db.py);
here the probe is a planning-time file-pruning decision instead.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import (  # noqa: E402
    BLOOM_SUFFIX,
    SnapshotTable,
    _bloom_hash_pair,
    _bloom_keep_file,
    _bloom_might_contain,
)


def _mk(spark, tmp_path, name="t", **props):
    return SnapshotTable.create(
        spark,
        str(tmp_path / name),
        keys=["k"],
        nbuckets=2,
        props={"bloom_cols": ["name"], "max_file_rows": 8, "bloom_bits": 1 << 12, **props},
    )


def _delta(spark, lo, hi, seq0=0):
    # high-cardinality string column `name`, unsorted w.r.t. file layout
    return spark.createDataFrame(
        [(i, f"u{i:06d}", "upsert", seq0 + i) for i in range(lo, hi)],
        ["k", "name", "op", "seq"],
    )


def test_sidecars_written_and_point_lookup_prunes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, 0, 64), "b1")
    m = t.manifest()
    files = [f for fs in m["buckets"].values() for f in fs]
    assert len(files) >= 4
    for f in files:
        assert os.path.exists(f + BLOOM_SUFFIX), "every data file gets a sidecar"
    got = t.scan([("name", "=", "u000042")]).collect()
    assert [(r["k"], r["name"]) for r in got] == [(42, "u000042")]
    # one 8-row file holds u000042; blooms must prune (almost) all others
    assert t.last_scan["files_bloom_pruned"] > 0
    assert t.last_scan["files_read"] < t.last_scan["files_total"]


def test_absent_value_prunes_every_file(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, 0, 32), "b1")
    out = t.scan([("name", "=", "nope")])
    assert out.count() == 0
    assert t.last_scan["files_read"] == 0, "a never-present value reads nothing"


def test_in_list_scan_matches_plain_filter(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, 0, 64), "b1")
    want = [f"u{i:06d}" for i in range(0, 64, 7)] + ["missing1", "missing2"]
    got = t.scan([("name", "in", want)])
    ref = t.read().filter(F.col("name").isin(want))
    assert sorted(r["k"] for r in got.collect()) == sorted(r["k"] for r in ref.collect())


def test_bloom_results_equal_unpruned_read(spark, tmp_path):
    # pruning may only cut I/O, never rows — across merges and a delete
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, 0, 40), "b1")
    t.merge(
        spark.createDataFrame(
            [(3, "u000003", "delete", 1000), (40, "u000040", "upsert", 1001)],
            ["k", "name", "op", "seq"],
        ),
        "b2",
    )
    for probe in ["u000003", "u000040", "u000007"]:
        got = sorted(r["k"] for r in t.scan([("name", "=", probe)]).collect())
        ref = sorted(
            r["k"] for r in t.read().filter(F.col("name") == probe).collect()
        )
        assert got == ref, probe
    assert t.scan([("name", "=", "u000003")]).count() == 0  # tombstoned


def test_compact_rewrites_sidecars(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for b in range(3):
        t.merge(_delta(spark, b * 16, (b + 1) * 16, seq0=0), f"b{b}")
    t.compact(min_files=1)
    files = [f for fs in t.manifest()["buckets"].values() for f in fs]
    for f in files:
        assert os.path.exists(f + BLOOM_SUFFIX)
    got = t.scan([("name", "=", "u000030")]).collect()
    assert [r["k"] for r in got] == [30]


def test_expire_gc_removes_orphan_sidecars(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, 0, 24), "b1")
    t.merge(_delta(spark, 0, 24, seq0=100), "b2")  # rewrites both buckets
    t.expire_snapshots(keep_last=1)
    root = str(tmp_path / "t")
    orphans = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.endswith(BLOOM_SUFFIX):
                assert os.path.exists(os.path.join(dirpath, n[: -len(BLOOM_SUFFIX)])), (
                    "sidecar must not outlive its data file"
                )
            if n.endswith(".parquet"):
                orphans.append(os.path.join(dirpath, n))
    assert orphans, "expiry must keep the live files"


def test_schema_evolution_absent_column_prunes(spark, tmp_path):
    # files written before `name` existed are provably all-null for it
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        nbuckets=2,
        props={"bloom_cols": ["name"], "max_file_rows": 8},
    )
    t.merge(
        spark.createDataFrame([(i, "upsert", i) for i in range(16)], ["k", "op", "seq"]),
        "old",
    )
    t.merge(_delta(spark, 100, 116, seq0=1000), "new")
    got = t.scan([("name", "=", "u000100")]).collect()
    assert [r["k"] for r in got] == [100]
    read = t.read()
    assert read.filter(F.col("name").isNull()).count() == 16


def test_unsupported_type_never_prunes(spark, tmp_path):
    # bloom on a double column: sidecar records None, scan falls back to
    # row filtering with identical results
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        nbuckets=2,
        props={"bloom_cols": ["x"], "max_file_rows": 8},
    )
    t.merge(
        spark.createDataFrame(
            [(i, i * 1.5, "upsert", i) for i in range(16)], ["k", "x", "op", "seq"]
        ),
        "b1",
    )
    got = t.scan([("x", "=", 6.0)]).collect()
    assert [r["k"] for r in got] == [4]
    assert t.last_scan["files_bloom_pruned"] == 0


def test_hash_pair_determinism_and_membership():
    p1 = _bloom_hash_pair("u000042")
    assert p1 == _bloom_hash_pair("u000042")
    assert p1 != _bloom_hash_pair("u000043")
    # int/str canonical-encoding equality (both hash str(v))
    assert _bloom_hash_pair(42) == _bloom_hash_pair("42")
    bits = bytearray(512)
    m_bits, k = 4096, 7
    h1, h2 = p1
    for i in range(k):
        p = (h1 + i * h2) % m_bits
        bits[p >> 3] |= 1 << (p & 7)
    assert _bloom_might_contain(bytes(bits), m_bits, k, p1)
    assert not _bloom_might_contain(bytes(bits), m_bits, k, _bloom_hash_pair("other"))


def test_missing_sidecar_keeps_file(tmp_path):
    # stats-less/legacy file: never pruned
    f = tmp_path / "x.parquet"
    f.write_bytes(b"")
    assert _bloom_keep_file(str(f), [(("name",), [_bloom_hash_pair("v")])])


def test_mor_dirty_buckets_not_bloom_pruned(spark, tmp_path):
    # merge-on-read appends leave the bucket dirty: scan must LWW-resolve
    # it whole, so a stale row version can't satisfy a probe its winner
    # doesn't — blooms only apply to clean buckets
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, 0, 16), "b1")
    t.merge(
        spark.createDataFrame(
            [(2, "renamed", "upsert", 999)], ["k", "name", "op", "seq"]
        ),
        "b2",
        mode="mor",
    )
    assert t.scan([("name", "=", "u000002")]).count() == 0, "superseded version"
    got = t.scan([("name", "=", "renamed")]).collect()
    assert [r["k"] for r in got] == [2]
