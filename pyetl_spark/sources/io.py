"""Format readers/writers with pyetl ingest semantics, Spark-first.

Reference surfaces re-expressed here (all citations into /root/reference):

- format registry by extension, lazily bound readers/writers
  (formats/fichiers/__init__.py:52-104; cache_readers.csv, cache_writers.csv)
- ``Reader``: per-file loop, read filter, max-rows, attribute remap
  (formats/generic_io.py:206-759) → one ``spark.read`` with pushed-down
  ``filter``/``limit`` and system columns from ``input_file_name()``
- system attributes ``#chemin``/``#fichier``/``#ext`` set per object
  (generic_io.py:420-424) → ``_chemin``/``_fichier``/``_ext`` columns
- "tous les attributs sont stockes en texte" (objet.py:523) → ``all_text``
  casts every column to string so the rule layer sees pyetl's type model
- CSV sep/header/codec handling (formats/fichiers/format_csv.py)
- JSON lines + document mode (formats/fichiers/format_json.py)
- XML element extraction (format_xml.py) → Spark 4 native xml source
- fixed-width & raw-line text (format_textfile.py) → ``spark.read.text``
  + substring slicing
- ``sortir`` sink fan-out by (groupe, classe) (traitement_divers.py:313-534)
  → ``partitionBy`` writes; special sinks ``#print``/``#store``/
  ``#comptage``/``#poubelle`` (generic_io.py:804-812)
- ``attreader``/``attwriter``: one attribute's content parsed as an input
  file / serialized as an output payload (traitement_workflow.py:1031-1056,
  traitement_divers.py:945-967) → ``from_csv``/``from_json`` on a column
- ``preload``: sub-file loaded into a keyed in-memory store
  (traitement_divers.py:545-672) → small cached DataFrame the join layer
  broadcasts

Scale notes: readers never materialize on the driver; a directory of files
is one distributed scan (file listing is driver-side metadata only, as on
any Spark deployment). ``filter``/``limit``/column selection are applied on
the DataFrame so Catalyst pushes them into the scan (PushedFilters /
ReadSchema in `.explain`).
"""

from __future__ import annotations

import os
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → (spark format, default reader options, default writer options)
# mirrors cache_readers.csv / cache_writers.csv; out-of-scope GIS formats
# (shp/mif/dxf/osm/gpkg — SURVEY §2.1) are intentionally absent.
FORMATS: dict[str, tuple[str, dict, dict]] = {
    "csv": ("csv", {"header": "true", "sep": ";", "encoding": "UTF-8"}, {"header": "true", "sep": ";"}),
    "txt": ("csv", {"header": "true", "sep": "\t"}, {"header": "true", "sep": "\t"}),
    "tsv": ("csv", {"header": "true", "sep": "\t"}, {"header": "true", "sep": "\t"}),
    "json": ("json", {"multiLine": "true"}, {}),
    "jsonl": ("json", {}, {}),
    "geojson": ("json", {"multiLine": "true"}, {}),
    "xml": ("xml", {"rowTag": "row"}, {"rowTag": "row", "rootTag": "rows"}),
    "parquet": ("parquet", {}, {}),
    "orc": ("orc", {}, {}),
    "avro": ("avro", {}, {}),
    "text": ("text", {}, {}),
    "line": ("text", {}, {}),
    # driver-side small-file formats (pyetl format_excel.py / format_dbf.py):
    # handled by pyetl_spark.sources.smallfiles, dispatched in read_any/write_any
    "xlsx": ("xlsx", {}, {}),
    "xls": ("xlsx", {}, {}),
    "dbf": ("dbf", {}, {}),
}


def _fmt_for(path: str, fmt: str | None) -> tuple[str, dict, dict]:
    if fmt is None:
        base = path.rstrip("/").rsplit("/", 1)[-1]
        ext = base.rsplit(".", 1)[-1].lower() if "." in base else ""
        return FORMATS.get(ext, FORMATS["parquet"])  # lake default: parquet dir
    return FORMATS.get(fmt, (fmt, {}, {}))  # pass-through: any registered source


def with_system_columns(df: DataFrame) -> DataFrame:
    """#chemin / #fichier / #ext per row (generic_io.py:420-424)."""
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return (
        df.withColumn("_chemin", F.input_file_name())
        .withColumn("_fichier", fname)
        .withColumn(
            "_ext",
            F.when(fname.contains("."), F.element_at(F.split(fname, r"\."), -1)).otherwise(
                F.lit("")
            ),
        )
    )


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    options: Mapping[str, str] | None = None,
    schema: str | None = None,
    all_text: bool = False,
    read_filter: Column | str | None = None,
    columns: Sequence[str] | None = None,
    max_rows: int | None = None,
    system_columns: bool = False,
) -> DataFrame:
    """Generic scan: format detect by extension, read filter, keep-list,
    max-rows — the Reader contract (generic_io.py:206-759) on one
    declarative plan so every constraint reaches the source scan.
    """
    if (fmt or "").lower() == "zip" or path.lower().endswith(".zip"):
        # zipped delivery (reference traitement_archives.py f_zipextract):
        # extract once driver-side, then read the extracted tree with the
        # same format detection. The extraction dir must outlive the lazy
        # DataFrame, so it is NOT deleted here (OS temp cleanup owns it).
        from pyetl_spark.sources import smallfiles

        extracted_dir, inner_ext = smallfiles.zip_extract(path)
        inner_fmt = (fmt if fmt and fmt.lower() != "zip" else inner_ext).lower()
        if inner_fmt in ("xlsx", "xls", "dbf"):
            # driver-side formats: open() does not glob — walk the tree and
            # union every matching member (zip deliveries nest folders)
            members = sorted(
                os.path.join(d, f)
                for d, _, files in os.walk(extracted_dir)
                for f in files
                if f.lower().endswith(f".{inner_ext}")
            )
            parts = [
                read_any(spark, m, fmt=inner_fmt, options=options,
                         read_filter=read_filter, columns=columns)
                for m in members
            ]
            if not parts:
                raise FileNotFoundError(f"no .{inner_ext} members in {path}")
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p, allowMissingColumns=True)
            return out.limit(max_rows) if max_rows else out
        # Spark-native formats: read the whole extracted tree; zip members
        # commonly live in subfolders, so recurse + glob-filter by extension
        return read_any(
            spark,
            extracted_dir,
            fmt=inner_fmt,
            options={
                "recursiveFileLookup": "true",
                "pathGlobFilter": f"*.{inner_ext}",
                **(options or {}),
            },
            schema=schema,
            all_text=all_text,
            read_filter=read_filter,
            columns=columns,
            max_rows=max_rows,
            system_columns=system_columns,
        )
    spark_fmt, ropts, _ = _fmt_for(path, fmt)
    if spark_fmt in ("xlsx", "xls", "dbf"):  # driver-side small-file formats
        from pyetl_spark.sources import smallfiles

        if spark_fmt == "dbf":
            df = smallfiles.read_dbf(spark, path, **(options or {}))
        else:
            df = smallfiles.read_xlsx(spark, path, **(options or {}))
        if read_filter is not None:
            df = df.filter(read_filter)
        if columns:
            df = df.select(*columns)
        if max_rows:
            df = df.limit(max_rows)
        return df
    reader = spark.read.format(spark_fmt).options(**{**ropts, **(options or {})})
    if schema is not None:
        reader = reader.schema(schema)
    elif spark_fmt == "csv":
        reader = reader.option("inferSchema", "false")  # pyetl: text until schema says otherwise
    df = reader.load(path)
    if system_columns:
        df = with_system_columns(df)
    if all_text:
        df = df.select(
            *[F.col(c).cast("string").alias(c) for c in df.columns]
        )
    if read_filter is not None:  # readfilter generic_io.py:625-663 → pushed predicate
        df = df.filter(read_filter)
    if columns:  # garder keep-list → pruned ReadSchema
        df = df.select(*columns)
    if max_rows:  # lire_maxi generic_io.py:237 → pushed LIMIT
        df = df.limit(max_rows)
    return df


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: Sequence[tuple[str, int, int]],
    trim: bool = True,
) -> DataFrame:
    """Fixed-width text (format_textfile.py): ``fields`` is
    ``(name, start_1_based, length)``; slicing happens in the JVM
    (``substring``), one codegen'd projection, no Python in the row path.
    """
    df = spark.read.text(path)
    cols = []
    for name, start, length in fields:
        c = F.substring(F.col("value"), start, length)
        cols.append((F.trim(c) if trim else c).alias(name))
    return df.select(*cols)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    options: Mapping[str, str] | None = None,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Generic sink (sortir traitement_divers.py:313-534). ``partition_by``
    is the fan-out-by-(groupe, classe) analog: one distributed write, files
    laid out per class directory, readable back with partition pruning.
    """
    spark_fmt, _, wopts = _fmt_for(path, fmt)
    if spark_fmt in ("xlsx", "xls", "dbf"):  # driver-side small-file formats
        from pyetl_spark.sources import smallfiles

        if spark_fmt == "dbf":
            smallfiles.write_dbf(df, path, **(options or {}))
        else:
            smallfiles.write_xlsx(df, path, **(options or {}))
        return
    writer = df.write.format(spark_fmt).options(**{**wopts, **(options or {})}).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def sink(df: DataFrame, kind: str, n: int = 20) -> object:
    """Special sinks (cache_writers.csv; generic_io.py:804-812):
    ``#print`` → show, ``#store`` → local rows, ``#comptage`` → count,
    ``#poubelle`` → noop write (full plan executes, output discarded —
    exactly the bench harness's measurement sink).
    """
    kind = kind.lstrip("#")
    if kind == "print":
        df.show(n, truncate=False)
        return None
    if kind == "store":
        return df.collect()  # explicitly driver-side, small results only
    if kind == "comptage":
        return df.count()
    if kind == "poubelle":
        df.write.format("noop").mode("overwrite").save()
        return None
    raise ValueError(f"unknown special sink #{kind}")


def attreader(
    df: DataFrame,
    column: str,
    fmt: str = "json",
    schema: str = "",
    options: Mapping[str, str] | None = None,
    explode_rows: bool = False,
) -> DataFrame:
    """Treat one attribute's content as an input payload
    (traitement_workflow.py:1031-1056): parse it in place with the
    vectorized ``from_json``/``from_csv``/``from_xml`` expressions and
    flatten the struct fields into columns. ``explode_rows`` handles a
    payload that is a JSON array of records (one output row per element —
    the reference's gen-branch object generation)."""
    c = F.col(column)
    if fmt == "json":
        parsed = F.from_json(c, f"array<struct<{schema}>>" if explode_rows else f"struct<{schema}>")
    elif fmt == "csv":
        parsed = F.from_csv(c, schema, dict(options or {"sep": ";"}))
    elif fmt == "xml":
        parsed = F.from_xml(c, f"struct<{schema}>")
    else:
        raise ValueError(f"attreader: unsupported fmt {fmt!r}")
    out = df.withColumn("_parsed", parsed)
    if explode_rows:
        out = out.withColumn("_parsed", F.explode("_parsed"))
    return out.select(*df.columns, "_parsed.*").drop(column)


def attwriter(
    df: DataFrame,
    out: str,
    columns: Sequence[str],
    fmt: str = "json",
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """Serialize a set of columns into one payload attribute
    (traitement_divers.py:945-967): ``to_json``/``to_csv``/``to_xml`` over a
    struct — JVM expressions, no Python."""
    s = F.struct(*[F.col(c) for c in columns])
    if fmt == "json":
        v = F.to_json(s)
    elif fmt == "csv":
        v = F.to_csv(s, dict(options or {"sep": ";"}))
    elif fmt == "xml":
        v = F.to_xml(s)
    else:
        raise ValueError(f"attwriter: unsupported fmt {fmt!r}")
    return df.withColumn(out, v)


def preload(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    key: Sequence[str] | None = None,
    **read_kwargs,
) -> DataFrame:
    """Load a reference file into a cached DataFrame (the ``preload`` keyed
    store, traitement_divers.py:545-672). The relational layer broadcasts it
    on join (`pyetl_spark.operators.relational`), which is exactly the
    reference's whole-file-in-a-dict hash join (pyetl.py:1057-1077) made
    cluster-safe: the dim ships once per executor, the fact side never
    shuffles."""
    df = read_any(spark, path, fmt=fmt, **read_kwargs)
    if key:
        df = df.dropDuplicates(list(key))
    return df.cache()
