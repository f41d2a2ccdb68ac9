"""Sources/sinks layer (SURVEY §2.1): format registry round-trips, system
columns, read-filter/limit pushdown, fixed-width, attreader/attwriter,
preload, partitioned sink fan-out."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyetl_spark.sources import (
    attreader,
    attwriter,
    preload,
    read_any,
    read_fixed_width,
    sink,
    write_any,
)

from tests.conftest import rows


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [("A", "alpha", 12), ("B", "beta", 34), ("C", "gamma", 56), ("D", "delta", 78)],
        "clef string, nom string, valeur int",
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "xml", "orc"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    p = str(tmp_path / f"t_{fmt}")
    write_any(sample, p, fmt=fmt)
    back = read_any(spark, p, fmt=fmt)
    got = sorted((r.clef, r.nom, str(r.valeur)) for r in back.collect())
    assert got == [("A", "alpha", "12"), ("B", "beta", "34"), ("C", "gamma", "56"), ("D", "delta", "78")]


def test_csv_all_text_and_system_columns(spark, sample, tmp_path):
    """pyetl semantics: attributes are text; #chemin/#fichier/#ext set per row."""
    p = str(tmp_path / "t.csv")
    write_any(sample, p, fmt="csv")
    df = read_any(spark, p, fmt="csv", all_text=True, system_columns=True)
    assert all(t == "string" for _, t in df.select("clef", "nom", "valeur").dtypes)
    r = df.filter(F.col("clef") == "A").first()
    assert r._ext == "csv" and r._fichier.endswith(".csv") and "t.csv" in r._chemin


def test_read_filter_and_limit_pushed_down(spark, sample, tmp_path):
    p = str(tmp_path / "t_parquet")
    write_any(sample, p, fmt="parquet")
    df = read_any(spark, p, read_filter=F.col("valeur") > 30, columns=["clef", "valeur"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(valeur), GreaterThan(valeur,30)]" in plan
    assert "nom" not in plan.split("ReadSchema")[1][:80]
    assert rows(df) == [("B", 34), ("C", 56), ("D", 78)]
    assert read_any(spark, p, max_rows=2).count() == 2


def test_fixed_width(spark, tmp_path):
    p = str(tmp_path / "fw.txt")
    with open(p, "w") as f:
        f.write("AB  12 x\nCD  34 y\n")
    df = read_fixed_width(spark, p, [("code", 1, 4), ("num", 5, 2), ("flag", 8, 1)])
    assert rows(df) == [("AB", "12", "x"), ("CD", "34", "y")]


def test_attreader_json_struct_and_explode(spark):
    df = spark.createDataFrame(
        [("k1", '{"a": 1, "b": "x"}'), ("k2", '{"a": 2, "b": "y"}')], "k string, payload string"
    )
    got = attreader(df, "payload", fmt="json", schema="a int, b string")
    assert rows(got) == [("k1", 1, "x"), ("k2", 2, "y")]

    arr = spark.createDataFrame([("k", '[{"a": 1}, {"a": 2}]')], "k string, payload string")
    got = attreader(arr, "payload", fmt="json", schema="a int", explode_rows=True)
    assert rows(got) == [("k", 1), ("k", 2)]


def test_attreader_csv(spark):
    df = spark.createDataFrame([("k", "1;deux;3.5")], "k string, payload string")
    got = attreader(df, "payload", fmt="csv", schema="a int, b string, c double")
    assert rows(got) == [("k", 1, "deux", 3.5)]


def test_attwriter_roundtrip(spark, sample):
    out = attwriter(sample, "payload", ["nom", "valeur"], fmt="json")
    back = attreader(out.select("clef", "payload"), "payload", "json", "nom string, valeur int")
    assert rows(back) == rows(sample.select("clef", "nom", "valeur"))


def test_preload_dedups_and_caches(spark, sample, tmp_path):
    p = str(tmp_path / "dim.csv")
    write_any(sample.union(sample), p, fmt="csv")
    dim = preload(spark, p, key=["clef"])
    assert dim.count() == 4 and dim.is_cached
    dim.unpersist()


def test_sink_fanout_partition_pruning(spark, tmp_path):
    """sortir fan-out by class → partitionBy; read-back prunes partitions."""
    df = spark.createDataFrame(
        [("g1", "ca", 1), ("g1", "cb", 2), ("g2", "ca", 3)], "groupe string, classe string, v int"
    )
    p = str(tmp_path / "out")
    write_any(df, p, fmt="parquet", partition_by=["groupe", "classe"])
    assert os.path.isdir(os.path.join(p, "groupe=g1", "classe=ca"))
    pruned = read_any(spark, p).filter("groupe = 'g1'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 2 and "PartitionFilters" in plan


def test_special_sinks(spark, sample):
    assert sink(sample, "#comptage") == 4
    assert len(sink(sample, "#store")) == 4
    assert sink(sample, "#poubelle") is None
