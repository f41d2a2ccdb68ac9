"""JDBC layer roundtrips against embedded Apache Derby.

Derby ships on Spark's own classpath (jars/derby-10.16.*, pulled in for the
Hive metastore), so this sandbox CAN exercise the real
``spark.read/write.format("jdbc")`` path end-to-end: executor tasks open
JDBC connections, Spark generates the dialect SQL, the database evaluates
pushed-down queries. Embedded Derby runs inside the local-mode JVM — the
exact property that makes it usable without a network; a real deployment
swaps the URL for a networked database and nothing else changes
(reference analog: the 18-backend registry formats/db/__init__.py:35-80,
collapsed onto Spark's one JDBC code path).

The probe below skips the module gracefully if a future sandbox drops the
Derby jars — the probe RESULT is then the documentation (COVERAGE.md).
"""

from __future__ import annotations

import shutil

import pytest

from pyetl_spark.sources import jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("no Derby jars on the Spark classpath")
    root = tmp_path_factory.mktemp("derby")
    # keep derby.log out of the repo cwd
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(root))  # noqa: SLF001
    url = f"jdbc:derby:{root}/db;create=true"
    opts = {"driver": DRIVER}
    src = spark.range(200).selectExpr(
        "id", "cast(id * 1.5 as double) as v", "concat('repo-', id % 7) as repo"
    )
    # Derby maps StringType to CLOB by default, and CLOB columns cannot be
    # grouped/compared — give the key column a real VARCHAR DDL type
    write_opts = {**opts, "createTableColumnTypes": "repo VARCHAR(64)"}
    jdbc.write_table(src, url, "EVENTS", mode="overwrite", options=write_opts)
    yield url, opts
    shutil.rmtree(root, ignore_errors=True)


def test_write_then_read_table(spark, derby):
    url, opts = derby
    back = jdbc.read_table(spark, url, "EVENTS", options=opts)
    assert back.count() == 200
    assert set(back.columns) == {"id", "v", "repo"}


def test_read_table_pushdown_and_limit(spark, derby):
    url, opts = derby
    got = jdbc.read_table(
        spark, url, "EVENTS",
        columns=["id", "repo"], predicate="id >= 100", limit=5,
        options=opts,
    )
    rows = got.collect()
    assert len(rows) == 5
    assert all(r["id"] >= 100 for r in rows)
    assert got.columns == ["id", "repo"]


def test_read_table_partitioned_scan(spark, derby):
    url, opts = derby
    got = jdbc.read_table(
        spark, url, "EVENTS",
        partition_col="id", bounds=(0, 200), num_partitions=4,
        options=opts,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 200


def test_read_query_templating(spark, derby):
    url, opts = derby
    got = jdbc.read_query(
        spark, url,
        'SELECT "repo", COUNT(*) AS "n" FROM EVENTS WHERE "id" < %cutoff% GROUP BY "repo"',
        params={"cutoff": 70},
        options=opts,
    )
    assert got.count() == 7
    assert sum(r["n"] for r in got.collect()) == 70


def test_append_and_max_val(spark, derby):
    url, opts = derby
    jdbc.write_table(
        spark.range(200, 250).selectExpr(
            "id", "cast(0.0 as double) as v", "'extra' as repo"
        ),
        url, "EVENTS", mode="append", transaction_size=16, options=opts,
    )
    assert jdbc.max_val(spark, url, "EVENTS", "id", options=opts) == 249


def test_max_val_unquoted_fallback_by_sqlstate(spark, derby, caplog):
    """a table created by plain case-folding DDL stores the column as ID, so
    the quoted probe MAX("id") fails with SQLSTATE 42X04; max_val must
    detect that BY SQLSTATE (walking the JDBC exception chain, never prose
    matching — ADVICE r03), log the fallback, and return the unquoted
    result. A genuinely missing table must still raise, not be masked."""
    import logging

    url, opts = derby
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    st = conn.createStatement()
    try:
        st.execute("CREATE TABLE PLAINDDL (id INT)")
        st.execute("INSERT INTO PLAINDDL VALUES (1),(5),(3)")
    finally:
        st.close()
        conn.close()
    with caplog.at_level(logging.WARNING, logger="pyetl_spark.sources.jdbc"):
        assert jdbc.max_val(spark, url, "PLAINDDL", "id", options=opts) == 5
    assert any("retrying unquoted" in r.getMessage() for r in caplog.records)
    # non-resolution errors surface: both quoted and unquoted forms fail on
    # a missing table, so the retry (42X05 IS a resolution state) re-raises
    with pytest.raises(Exception):
        jdbc.max_val(spark, url, "NO_SUCH_TABLE", "id", options=opts)


def test_dbset_decorrelated_lookup(spark, derby):
    """dbset (traitement_db.py:633-700) is a per-row correlated lookup in
    the reference; the scale form is decorrelated — read the lookup relation
    once and broadcast-join it."""
    from pyspark.sql import functions as F

    url, opts = derby
    dim = jdbc.read_query(
        spark, url,
        'SELECT "repo", MAX("id") AS "last_id" FROM EVENTS GROUP BY "repo"',
        options=opts,
    )
    fact = spark.range(50).selectExpr("concat('repo-', id % 7) as repo", "id")
    out = fact.join(F.broadcast(dim), "repo", "left")
    assert out.count() == 50
    assert out.filter(F.col("last_id").isNull()).count() == 0
