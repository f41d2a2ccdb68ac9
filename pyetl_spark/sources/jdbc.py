"""JDBC database backends — pyetl's DB layer (formats/db/*, 18 backends)
recast on ``spark.read.jdbc`` / ``DataFrameWriter.jdbc``.

Reference surfaces (citations into /root/reference):

- per-backend connect/request/insert (``formats/db/database.py`` 1238 LoC,
  ``formats/db/__init__.py:35-80`` backend registry) → one code path: Spark's
  JDBC source with a driver-class option; the per-dialect SQL quirks live in
  Spark's JdbcDialects, not here.
- ``dbalpha`` table scan with attribute/selector templating and LIMIT
  pushdown (``traitement_db.py:169-273``, LIMIT push ``:412-418``) →
  :func:`read_table` — predicates/limit/columns land in the generated SQL
  via Catalyst's JDBC pushdown.
- ``dbrequest`` raw SQL with ``%#niveau/%#classe/%#attr`` templating
  (``traitement_db.py:395-631``) → :func:`read_query` (the query ships to
  the database; Spark reads the result set in partitioned ranges).
- ``dbwrite`` buffered block load, ``transaction_size`` blocks
  (``traitement_db.py:763-835``) → :func:`write_table` — ``batchsize``
  maps the block size; executors stream inserts in parallel.
- ``dbmaxval`` incremental watermark (``traitement_db.py:848-885``) →
  :func:`max_val` — one MAX() pushed to the database.
- partitioned parallel scans (the reference reads one cursor; Spark shards
  on a numeric column) → ``partition_col``/``num_partitions``.

Tested in this sandbox against embedded Apache Derby (the one JDBC engine
on Spark's own classpath, jars/derby-10.16.*): tests/test_jdbc.py runs real
read_table/read_query/write_table/max_val and partitioned-scan roundtrips.
Embedded Derby lives inside the (single) local-mode JVM, which is exactly
why it works here; production uses a networked JDBC URL on the same code
path. The module is a thin, declarative veneer over Spark's battle-tested
JDBC source — every function returns/consumes plain DataFrames so the rest
of the engine is storage-agnostic.
"""

from __future__ import annotations

import logging
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)


def _opts(url: str, options: Mapping[str, str] | None) -> dict[str, str]:
    return {"url": url, **(options or {})}


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    columns: Sequence[str] | None = None,
    predicate: str | None = None,
    limit: int | None = None,
    partition_col: str | None = None,
    num_partitions: int = 8,
    bounds: tuple[int, int] | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """``dbalpha``: declarative table scan; filters/column pruning/limit are
    pushed into the database's SQL. With ``partition_col`` + ``bounds`` the
    scan runs as ``num_partitions`` parallel range queries."""
    reader = spark.read.format("jdbc").options(**_opts(url, options)).option("dbtable", table)
    if partition_col and bounds:
        reader = (
            reader.option("partitionColumn", partition_col)
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
            .option("numPartitions", str(num_partitions))
        )
    df = reader.load()
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    if limit:
        df = df.limit(limit)
    return df


def read_query(
    spark: SparkSession,
    url: str,
    sql: str,
    params: Mapping[str, str] | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """``dbrequest``: ship a SQL query to the database. ``params`` performs
    the reference's ``%name%`` templating (plan-time string substitution —
    values come from the job context, never from row data)."""
    for k, v in (params or {}).items():
        sql = sql.replace(f"%{k}%", str(v))
    return (
        spark.read.format("jdbc")
        .options(**_opts(url, options))
        .option("query", sql)
        .load()
    )


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    transaction_size: int = 1000,
    options: Mapping[str, str] | None = None,
) -> None:
    """``dbwrite``: block-buffered bulk load. ``transaction_size`` (reference
    default 1000, traitement_db.py:782) maps to JDBC ``batchsize``; each
    executor task streams its partition in batches."""
    (
        df.write.format("jdbc")
        .options(**_opts(url, options))
        .option("dbtable", table)
        .option("batchsize", str(transaction_size))
        .mode(mode)
        .save()
    )


def max_val(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    options: Mapping[str, str] | None = None,
    quote: str = '"',
):
    """``dbmaxval``: incremental-read watermark — one MAX() evaluated by the
    database, one row back. The column identifier is quoted (ANSI double
    quotes by default; pass ``quote='`'`` for MySQL) because Spark's JDBC
    writer creates case-preserving quoted columns while most databases fold
    unquoted identifiers — ``MAX(id)`` on a Derby/Postgres table written by
    Spark would look up ``ID``/``id`` per THEIR folding rule, not ours.
    Tables created by plain unquoted DDL have the OPPOSITE need (the column
    is stored folded, so ``MAX("id")`` misses it) — when the quoted form
    errors, the unquoted form is retried automatically before raising."""
    q = f"{quote}{column}{quote}" if quote else column
    a = f"{quote}m{quote}" if quote else "m"  # unquoted aliases fold too
    try:
        row = read_query(
            spark, url, f"SELECT MAX({q}) AS {a} FROM {table}", options=options
        ).first()
    except Exception as exc:
        # retry unquoted ONLY for identifier-resolution failures — a
        # transient error (connection reset, lock timeout) must surface,
        # not be masked by a second query that could even resolve to a
        # DIFFERENT (folded) column and return a wrong watermark. The check
        # is by SQLSTATE (class 42 = syntax/access-rule violation: Derby
        # 42X04/42X05, standard 42703 undefined column, SQLServer 42S22),
        # walked down the real JDBC exception chain — never by free-text
        # substrings, which would fire on any message that merely mentions
        # a column (ADVICE r03).
        if not quote or not _is_identifier_resolution_error(exc):
            raise
        log.warning(
            "max_val: quoted identifier %s did not resolve on %s.%s; "
            "retrying unquoted (table likely created by case-folding DDL)",
            q, table, column,
        )
        # positional access: the unquoted alias folds per the database's rule
        # (Derby/Postgres fold opposite ways), so the result column may be
        # "M" or "m" — it is the single column either way
        row = read_query(
            spark, url, f"SELECT MAX({column}) AS m FROM {table}", options=options
        ).first()
    return row[0] if row else None


_RESOLUTION_SQLSTATES = ("42X04", "42X05", "42703", "42S22", "42P01")


def _is_identifier_resolution_error(exc: Exception) -> bool:
    """True iff the exception chain carries a SQLSTATE meaning an
    identifier failed to resolve. Walks the py4j Java exception's cause
    chain calling ``getSQLState()`` where present; falls back to scanning
    the message for an explicit ``SQLSTATE: 42xxx`` token (Derby and the
    Spark JDBC dialect both embed it verbatim), never for prose."""
    states: list[str] = []
    # py4j errors expose .java_exception; pyspark CapturedException wraps
    # the py4j error as ._origin — reach through both to the JVM chain
    je = getattr(exc, "java_exception", None)
    if je is None:
        origin = getattr(exc, "_origin", None)
        je = getattr(origin, "java_exception", None)
    depth = 0
    while je is not None and depth < 10:
        try:
            st = je.getSQLState()
            if st:
                states.append(str(st).upper())
        except Exception:  # noqa: BLE001 — not a SQLException; keep walking
            pass
        try:
            je = je.getCause()
        except Exception:  # noqa: BLE001
            break
        depth += 1
    if states:
        return any(s in _RESOLUTION_SQLSTATES for s in states)
    import re as _re

    tokens = _re.findall(r"SQLSTATE:?\s*([0-9A-Z]{5})", str(exc), _re.IGNORECASE)
    return any(t.upper() in _RESOLUTION_SQLSTATES for t in tokens)
