"""Schema operators (SURVEY §2.11): cast layer, type inference, diff,
merge, enum conformance, fuzzy match, FK write order."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pyetl_spark.schema import (
    cast_layer,
    enum_recode,
    fk_write_order,
    infer_type_codes,
    match_schema,
    schema_diff,
    schema_merge,
    validate_enum,
)


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(
        [
            ("1", "3.5", "2024-01-02", "true", '"a" => "1", "b" => "2"', "x"),
            ("2", "bad", "2024-02-03", "false", '"c" => "3"', "y"),
        ],
        "e string, f string, ds string, b string, h string, t string",
    )


def test_cast_layer_types_and_bad_values(spark, text_df):
    out = cast_layer(text_df, {"e": "E", "f": "F", "ds": "DS", "b": "B", "h": "H"})
    dt = dict(out.dtypes)
    assert dt == {
        "e": "int", "f": "double", "ds": "date", "b": "boolean",
        "h": "map<string,string>", "t": "string",
    }
    r1, r2 = out.orderBy("e").collect()
    assert r1.e == 1 and r1.f == 3.5 and r1.ds == datetime.date(2024, 1, 2) and r1.b is True
    assert r1.h == {"a": "1", "b": "2"}
    assert r2.f is None  # best-effort: bad value -> null, never a job failure


def test_infer_type_codes(spark):
    df = spark.createDataFrame(
        [("1", "2.5", "2024-01-01", "true", "abc", str(2**40)),
         ("2", "3", "2024-02-01", "false", "1x", str(2**41))],
        "i string, f string, d string, b string, t string, big string",
    )
    codes = infer_type_codes(df)
    assert codes == {"i": "E", "f": "F", "d": "DS", "b": "B", "t": "T", "big": "EL"}


def test_schema_diff(spark):
    a = spark.createDataFrame([], "x int, y string, z double").schema
    b = spark.createDataFrame([], "y string, z string, w int").schema
    d = schema_diff(a, b)
    assert d["added"] == ["w"] and d["removed"] == ["x"]
    assert d["retyped"] == [("z", "double", "string")]


def test_schema_merge_union_with_nulls(spark):
    a = spark.createDataFrame([(1, "a")], "k int, x string")
    b = spark.createDataFrame([(2, 9.5)], "k int, y double")
    m = schema_merge([a, b]).orderBy("k")
    assert set(m.columns) == {"k", "x", "y"}
    r1, r2 = m.collect()
    assert r1.x == "a" and r1.y is None and r2.x is None and r2.y == 9.5


def test_enum_recode_and_validate(spark):
    df = spark.createDataFrame([("PT",), ("point",), ("???",)], "g string")
    out = enum_recode(df, "g", {"PT": "point", "LN": "line"})
    vals = [r.g for r in out.collect()]
    assert vals == ["point", "point", "???"]
    flagged = validate_enum(out, "g", ["point", "line"])
    assert [r.g__conforme for r in flagged.collect()] == [True, True, False]
    dropped = enum_recode(df, "g", {"PT": "point"}, keep_unknown=False)
    assert [r.g for r in dropped.collect()] == ["point", None, None]


def test_match_schema():
    tables = {
        "customer": ["c_custkey", "c_name", "c_address"],
        "orders": ["o_orderkey", "o_custkey", "o_orderdate"],
    }
    assert match_schema(["o_orderkey", "o_orderdate"], tables) == "orders"
    assert match_schema(["c_name", "c_address"], tables) == "customer"


def test_fk_write_order_and_cycle():
    deps = {"lineitem": ["orders", "part"], "orders": ["customer"], "customer": [], "part": []}
    order = fk_write_order(deps)
    assert order.index("customer") < order.index("orders") < order.index("lineitem")
    assert order.index("part") < order.index("lineitem")
    with pytest.raises(ValueError, match="FK cycle"):
        fk_write_order({"a": ["b"], "b": ["a"]})


def test_cast_layer_with_date_format(spark):
    df = spark.createDataFrame([("02/01/2024 13:30",)], "d string")
    out = cast_layer(df, {"d": "D"}, date_fmt="dd/MM/yyyy HH:mm")
    assert out.first().d == datetime.datetime(2024, 1, 2, 13, 30)


def test_apply_mapping_bulk_remap(spark):
    """table-driven wholesale remap (f_map traitement_mapping.py:328-397):
    exact + wildcard class renames, attribute renames, missing source attr
    created empty, unmapped classes untouched."""
    from pyetl_spark.schema import apply_mapping

    tables = {
        "stock_items": spark.createDataFrame([("i1", "5")], "code string, qty string"),
        "stock_moves": spark.createDataFrame([("m1",)], "code string"),
        "clients": spark.createDataFrame([("c1",)], "id string"),
    }
    mapping = [
        ("stock_*", "inv_", {"code": "ref", "missing_att": "extra"}),
        ("clients", "customers", {"id": "customer_id"}),
    ]
    out = apply_mapping(tables, mapping)
    assert set(out) == {"inv_items", "inv_moves", "customers"}
    assert out["inv_items"].columns == ["ref", "qty", "extra"]
    row = out["inv_items"].collect()[0]
    assert (row["ref"], row["qty"], row["extra"]) == ("i1", "5", "")
    assert out["customers"].columns == ["customer_id"]


def test_apply_mapping_inline_spec(spark):
    """the reference's inline {src,dst,a=>b:...} spec string parses and
    applies (charge_mapping traitement_mapping.py:139-146)."""
    from pyetl_spark.schema import apply_mapping, parse_mapping_spec

    spec = "{old_cls,new_cls,a=>b:keepme,keepme}"
    parsed = parse_mapping_spec(spec)
    assert parsed == [("old_cls", "new_cls", {"a": "b"}), ("keepme", "keepme", {})]
    tables = {"old_cls": spark.createDataFrame([("x",)], "a string")}
    out = apply_mapping(tables, spec)
    assert set(out) == {"new_cls"} and out["new_cls"].columns == ["b"]
