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


def test_xlsx_roundtrip(spark, tmp_path):
    """xlsx write → read_any roundtrip (reference format_excel.py); all-text
    model, header row, shared/inline string handling."""
    from pyetl_spark.sources import read_any, write_any

    df = spark.createDataFrame(
        [("alice", "10", "a & b <c>"), ("bob", "2.5", None), ("carol", "-3", "été")],
        "name string, amount string, note string",
    )
    p = str(tmp_path / "t.xlsx")
    write_any(df, p, fmt="xlsx")
    back = read_any(spark, p)
    assert back.columns == ["name", "amount", "note"]
    got = sorted((r["name"], r["amount"], r["note"] or "") for r in back.collect())
    assert got == [("alice", "10", "a & b <c>"), ("bob", "2.5", ""), ("carol", "-3", "été")]


def test_xlsx_shared_strings_and_sheet_select(spark, tmp_path):
    """a hand-built workbook with sharedStrings + two sheets reads the
    requested sheet by name."""
    import zipfile

    from pyetl_spark.sources.smallfiles import (
        _XLSX_CONTENT_TYPES, _XLSX_RELS, read_xlsx,
    )

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    shared = (
        f'<sst xmlns="{ns}"><si><t>h1</t></si><si><t>val</t></si></sst>'
    )
    sheet1 = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    sheet2 = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>other</t></is></c></row>'
        '<row r="2"><c r="A2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<workbook xmlns="{ns}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="first" sheetId="1" r:id="rId1"/>'
        '<sheet name="second" sheetId="2" r:id="rId2"/></sheets></workbook>'
    )
    p = str(tmp_path / "two.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _XLSX_RELS)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)

    got1 = read_xlsx(spark, p, sheet="first")
    assert got1.columns == ["h1"] and [r["h1"] for r in got1.collect()] == ["val"]
    got2 = read_xlsx(spark, p, sheet="second")
    assert got2.columns == ["other"] and [r["other"] for r in got2.collect()] == ["42"]


def test_dbf_roundtrip(spark, tmp_path):
    """dbf write → read_any roundtrip (reference format_dbf.py); deleted
    records skipped, accents via cp1252."""
    from pyetl_spark.sources import read_any, write_any

    df = spark.createDataFrame(
        [("r1", "café", "100"), ("r2", "plain", None)],
        "id string, label string, qty string",
    )
    p = str(tmp_path / "t.dbf")
    write_any(df, p, fmt="dbf")
    back = read_any(spark, p)
    assert back.columns == ["id", "label", "qty"]
    got = sorted((r["id"], r["label"], r["qty"]) for r in back.collect())
    assert got == [("r1", "café", "100"), ("r2", "plain", None)]

    # flip r2's deletion flag by hand → only r1 survives
    raw = bytearray(open(p, "rb").read())
    header_size = int.from_bytes(raw[8:10], "little")
    record_size = int.from_bytes(raw[10:12], "little")
    raw[header_size + record_size] = ord("*")
    open(p, "wb").write(bytes(raw))
    assert [r["id"] for r in read_any(spark, p).collect()] == ["r1"]


def test_zip_delivery_roundtrip(spark, tmp_path):
    """zipped csv delivery (traitement_archives.py f_zipextract): read_any
    transparently extracts and reads the inner files."""
    import zipfile

    from pyetl_spark.sources.io import read_any, write_any
    from pyetl_spark.sources.smallfiles import zip_list

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    csv_dir = tmp_path / "out.csv"
    write_any(df, str(csv_dir), fmt="csv")
    zpath = tmp_path / "delivery.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in csv_dir.glob("*.csv"):
            z.write(p, p.name)
    assert any(n.endswith(".csv") for n in zip_list(str(zpath)))
    back = read_any(spark, str(zpath), schema="k int, v string")
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_zip_slip_refused(tmp_path):
    import zipfile

    import pytest as _pytest

    from pyetl_spark.sources.smallfiles import zip_extract

    zpath = tmp_path / "evil.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("../escape.txt", "x")
    with _pytest.raises(ValueError, match="escapes"):
        zip_extract(str(zpath), str(tmp_path / "x"))
