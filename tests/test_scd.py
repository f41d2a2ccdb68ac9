"""SCD Type 2 dimension maintenance (cdc/scd.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import rows  # noqa: E402
from pyetl_spark.cdc.scd import scd2_apply, scd2_build  # noqa: E402

CH = [
    # (user, plan, ts, seq)
    (1, "free", 10, 0),
    (1, "free", 20, 1),   # no-op: same attrs, must NOT cut a version
    (1, "pro", 30, 2),
    (1, "free", 40, 3),   # back to an old value: IS a new version
    (2, "pro", 15, 4),
    (3, None, 5, 5),      # null attr first
    (3, "ent", 25, 6),
]
COLS = ["user_id", "plan", "ts", "seq"]


def test_scd2_build_versions(spark):
    hist = scd2_build(
        spark.createDataFrame(CH, COLS), ["user_id"], ["plan"], "ts", "seq"
    )
    got = {
        tuple(r)
        for r in hist.select(
            "user_id", "plan", "valid_from", "valid_to", "is_current"
        ).collect()
    }
    assert got == {
        (1, "free", 10, 30, 0),
        (1, "free", 40, None, 1),
        (1, "pro", 30, 40, 0),
        (2, "pro", 15, None, 1),
        (3, None, 5, 25, 0),
        (3, "ent", 25, None, 1),
    }
    # exactly one current row per key
    assert hist.filter("is_current = 1").count() == 3


def test_scd2_apply_matches_build(spark):
    full = spark.createDataFrame(CH, COLS)
    expected = sorted(map(tuple, scd2_build(full, ["user_id"], ["plan"], "ts", "seq").collect()), key=repr)
    # fold in three batches split by ts
    hist = scd2_build(
        spark.createDataFrame([r for r in CH if r[2] <= 10], COLS),
        ["user_id"], ["plan"], "ts", "seq",
    )
    for lo, hi in [(10, 25), (25, 99)]:
        batch = spark.createDataFrame(
            [r for r in CH if lo < r[2] <= hi], COLS
        )
        hist = scd2_apply(hist, batch, ["user_id"], ["plan"], "ts", "seq")
    assert sorted(map(tuple, hist.collect()), key=repr) == expected


def test_scd2_apply_leaves_untouched_keys_alone(spark):
    hist = scd2_build(
        spark.createDataFrame(CH, COLS), ["user_id"], ["plan"], "ts", "seq"
    )
    batch = spark.createDataFrame([(2, "ent", 50, 9)], COLS)
    out = scd2_apply(hist, batch, ["user_id"], ["plan"], "ts", "seq")
    # user 2 gains a version; users 1 and 3 byte-identical
    got = sorted((tuple(r) for r in out.select(
        "user_id", "plan", "valid_from", "valid_to", "is_current").collect()), key=repr)
    assert (2, "pro", 15, 50, 0) in got and (2, "ent", 50, None, 1) in got
    before = sorted((tuple(r) for r in hist.select(
        "user_id", "plan", "valid_from", "valid_to", "is_current").collect()), key=repr)
    assert [g for g in got if g[0] != 2] == [g for g in before if g[0] != 2]


def test_scd2_multi_key_multi_attr(spark):
    ch = [
        ("a", 1, "x", 10, 100, 0),
        ("a", 1, "x", 11, 100, 1),  # second attr changes only
        ("a", 2, "x", 10, 100, 2),  # different composite key
    ]
    df = spark.createDataFrame(ch, ["k1", "k2", "a1", "a2", "ts", "seq"])
    hist = scd2_build(df, ["k1", "k2"], ["a1", "a2"], "ts", "seq")
    got = rows(hist, "k1", "k2", "a1", "a2", "valid_from", "is_current")
    assert got == [
        ("a", 1, "x", 10, 100, 0),
        ("a", 1, "x", 11, 100, 1),
        ("a", 2, "x", 10, 100, 1),
    ]
