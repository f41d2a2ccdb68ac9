"""Tests for the relational layer (SURVEY §2.4-§2.8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.operators import (
    anti_join,
    changed,
    compare,
    getkey,
    join_lookup,
    merge_rows,
    multiplex,
    objgroup,
    sample_1_in_n,
    semi_join,
    sessionize,
    stat,
    topk,
    unique,
    unique_n,
)

from tests.conftest import rows


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "a", "FR", 10.0, 1),
            (2, "b", "FR", 20.0, 2),
            (3, "c", "DE", 30.0, 3),
            (4, "d", "XX", 40.0, 4),
            (1, "a2", "FR", 15.0, 5),  # duplicate key 1, later seq
        ],
        "id int, name string, country string, amount double, seq int",
    )


@pytest.fixture(scope="module")
def countries(spark):
    return spark.createDataFrame(
        [("FR", "France", "EU"), ("DE", "Germany", "EU"), ("US", "USA", "NA")],
        "country string, label string, zone string",
    )


def test_join_lookup(people, countries):
    out = join_lookup(
        people,
        countries,
        "country",
        select={"label": "country_name"},
        defaults={"country_name": "unknown"},
    )
    got = dict(rows(out, "id", "country_name"))
    assert got[3] == "Germany" and got[4] == "unknown"


def test_semi_anti(people, countries):
    assert semi_join(people, countries, "country").count() == 4
    assert anti_join(people, countries, "country").count() == 1


def test_unique_and_unique_n(people):
    assert unique(people, "id").count() == 4
    lww = unique_n(people, "id", "seq", n=1, desc=True)
    got = dict(rows(lww, "id", "name"))
    assert got[1] == "a2"  # last writer wins
    assert lww.filter(F.col("occurrence") != 1).count() == 0


def test_merge_rows(people):
    out = merge_rows(
        people,
        "country",
        {"amount": "sum", "name": "last", "seq": "max"},
        order="seq",
    )
    got = {r["country"]: r for r in out.collect()}
    assert got["FR"]["amount"] == 45.0
    assert got["FR"]["name"] == "a2"  # last by seq


def test_merge_rows_ordered_list(people):
    out = merge_rows(people, "country", {"name": "list"}, order="seq")
    got = {r["country"]: r["name"] for r in out.collect()}
    assert got["FR"] == ["a", "b", "a2"]


def test_objgroup(people):
    out = objgroup(people, "country", ["name", "amount"], as_struct=True, order="seq")
    fr = out.filter(F.col("country") == "FR").first()["items"]
    assert [x["name"] for x in fr] == ["a", "b", "a2"]


def test_stat(people):
    out = stat(
        people,
        "country",
        {
            "n": ("cnt", "id"),
            "total": ("somme", "amount"),
            "avg_amt": ("moy", "amount"),
            "names": ("valtri", "name"),
            "n_ids": ("cnt_val_uniq", "id"),
        },
    )
    fr = out.filter(F.col("country") == "FR").first()
    assert fr["n"] == 3 and fr["total"] == 45.0 and fr["n_ids"] == 2
    assert fr["names"] == ["a", "a2", "b"]


def test_stat_pivot(people):
    out = stat(people, "country", {"n": ("cnt", "id")}, pivot="name", pivot_values=["a", "b"])
    fr = out.filter(F.col("country") == "FR").first()
    assert fr["a"] == 1 and fr["b"] == 1


def test_compare_cdc_classifier(spark):
    new_state = spark.createDataFrame(
        [(1, "same"), (2, "changed-after"), (5, "brand-new")], "k int, v string"
    )
    old_state = spark.createDataFrame(
        [(1, "same"), (2, "changed-before"), (9, "deleted")], "k int, v string"
    )
    out = compare(new_state, old_state, "k")
    got = dict(rows(out, "k", "cdc_status"))
    assert got == {1: "unchanged", 2: "diff", 5: "new", 9: "supp"}
    # supp rows carry the reference payload
    assert out.filter("k = 9").first()["v"] == "deleted"


def test_multiplex(people):
    branches = multiplex(people, "country", ["FR", "DE"])
    assert branches["FR"].count() == 3
    assert branches["DE"].count() == 1
    assert branches["#autre"].count() == 1


def test_topk(people):
    out = topk(people, "country", "amount", k=1)
    got = dict(rows(out, "country", "name"))
    assert got["FR"] == "b"


def test_sample(people):
    n = sample_1_in_n(people, 2, key="id").count()
    assert 0 <= n <= 5


def test_getkey(people):
    out = getkey(unique(people, "country"), "country", out="ck")
    got = dict(rows(out, "country", "ck"))
    assert got == {"DE": 1, "FR": 2, "XX": 3}


def test_changed(people):
    import pytest as _pytest

    # unpartitioned = single-partition global window: must be an explicit
    # opt-in, not a silent serialization point
    with _pytest.raises(ValueError, match="single-partition"):
        changed(people, "country", order="seq")
    out = changed(
        people.filter("country = 'FR'"), "name", order="seq", allow_global=True
    )
    assert [r["changed"] for r in out.orderBy("seq").collect()] == [True, True, True]
    out2 = changed(people, "country", order="seq", allow_global=True)
    assert [r["changed"] for r in out2.orderBy("seq").collect()] == [
        True,
        False,
        True,
        True,
        True,
    ]


def test_sessionize(spark):
    df = spark.createDataFrame(
        [("u", 1), ("u", 2), ("u", 3), ("u", 10), ("u", 11), ("v", 1)],
        "user string, t int",
    )
    out = sessionize(df, "user", "t")
    got = rows(out, "user", "t", "session_id")
    by_t = {(u, t): s for u, t, s in got}
    assert by_t[("u", 1)] == by_t[("u", 3)] == 1
    assert by_t[("u", 10)] == by_t[("u", 11)] == 2
    assert by_t[("v", 1)] == 1


def test_asof_join(spark):
    """latest right value at-or-before each left time, per key."""
    from pyetl_spark.operators import asof_join

    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 2), ("b", 7), ("c", 1)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("a", 3, "a@3"), ("a", 10, "a@10"), ("b", 1, "b@1"), ("b", 9, "b@9"), ("d", 1, "d@1")],
        "k string, rt long, rv string",
    )
    out = asof_join(left, right, keys="k", left_on="t", right_on="rt", right_values=["rv"])
    got = {(r["k"], r["t"]): r["rv"] for r in out.collect()}
    assert got == {
        ("a", 2): None,      # nothing at or before 2
        ("a", 5): "a@3",
        ("a", 10): "a@10",   # tie: right row AT left time is visible
        ("b", 7): "b@1",
        ("c", 1): None,      # key absent on right
    }
    assert out.count() == left.count()  # every left row survives


def test_range_join_window(spark):
    """bucketed range join == naive range condition, without the nested loop."""
    from pyetl_spark.operators import range_join_window

    left = spark.createDataFrame(
        [("a", 100.0, "L1"), ("a", 200.0, "L2"), ("b", 50.0, "L3")], "k string, t double, lid string"
    )
    right = spark.createDataFrame(
        [("a", 95.0, "R1"), ("a", 112.0, "R2"), ("a", 190.0, "R3"), ("b", 70.0, "R4"), ("b", 20.0, "R5")],
        "k string, rt double, rid string",
    )
    out = range_join_window(left, right, keys="k", left_on="t", right_on="rt", lower=-10, upper=15)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    # naive mirror
    want = sorted(
        (lr["lid"], rr["rid"])
        for lr in left.collect()
        for rr in right.collect()
        if lr["k"] == rr["k"] and lr["t"] - 10 <= rr["rt"] <= lr["t"] + 15
    )
    assert got == want and ("L1", "R1") in got and ("L1", "R2") in got
    # plan: equi join, not a nested-loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_asof_join_null_value_not_backfilled(spark):
    """a matched right row whose value column is NULL must yield NULL, not
    the previous non-null value (SQL ASOF semantics; ADVICE r01)."""
    from pyetl_spark.operators import asof_join

    left = spark.createDataFrame([("a", 5), ("a", 12)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 3, "early"), ("a", 10, None)], "k string, rt long, rv string"
    )
    out = asof_join(left, right, keys="k", left_on="t", right_on="rt", right_values=["rv"])
    got = {r["t"]: r["rv"] for r in out.collect()}
    assert got == {5: "early", 12: None}


def test_asof_join_collision_with_key_raises(spark):
    from pyetl_spark.operators import asof_join

    left = spark.createDataFrame([("a", 5)], "k string, t long")
    right = spark.createDataFrame([("a", 3)], "k string, rt long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, keys="k", left_on="t", right_on="rt", right_values=["k"])
    with _pytest.raises(ValueError):
        asof_join(left, right, keys="k", left_on="t", right_on="rt", right_values=["t"])


def test_getkey_dim_matches_window_and_handles_nulls(spark):
    """distributed key-dimension getkey == dense_rank window getkey,
    including a NULL value (null-safe join keeps its rank)."""
    from pyetl_spark.operators import getkey

    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",), (None,), ("b",)], "v string"
    ).repartition(4)
    via_dim = {(r["v"], r["k"]) for r in getkey(df, "v", out="k").collect()}
    via_win = {(r["v"], r["k"]) for r in getkey(df, "v", out="k", method="window").collect()}
    assert via_dim == via_win
    assert {r for r in via_dim} == {(None, 1), ("a", 2), ("b", 3), ("c", 4)}


def test_getkey_dim_large_cardinality(spark):
    """dense 1..N over more distinct values than any single partition should
    sort — exercises the range-partition + offset path."""
    from pyetl_spark.operators import getkey

    df = spark.range(0, 5000).select(
        F.concat(F.lit("v"), F.format_string("%06d", (F.col("id") * 7919) % 5000)).alias("v")
    )
    out = getkey(df, "v", out="k")
    ks = [r["k"] for r in out.select("k").distinct().collect()]
    assert sorted(ks) == list(range(1, 5001))
    # key order follows value order
    two = {r["v"]: r["k"] for r in out.filter(F.col("v").isin("v000000", "v004999")).collect()}
    assert two["v000000"] == 1 and two["v004999"] == 5000


def test_merge_rows_first_last_require_order(spark):
    from pyetl_spark.operators import merge_rows

    df = spark.createDataFrame([("a", 1, "x")], "k string, o long, v string")
    with pytest.raises(ValueError, match="need order="):
        merge_rows(df, "k", {"v": "first"})
    with pytest.raises(ValueError, match="need order="):
        merge_rows(df, "k", {"v": "list"})
    # 'set' stays the explicit any-value escape hatch
    assert merge_rows(df, "k", {"v": "set"}).collect()[0]["v"] == "x"
