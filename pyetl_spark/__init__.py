"""pyetl_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the query & data-processing capabilities of the reference ETL
engine (Ville-Eurometropole-Strasbourg/pyetl, studied read-only) as an
idiomatic Spark stack:

- ``rules``      : pyetl-style per-attribute transform rules (regle semantics:
                   selector, selector, out, default, in, command, p1, p2)
                   compiled to native ``Column`` expressions / pandas UDFs.
- ``operators``  : relational layer — broadcast joins, LWW dedup, merge/objgroup
                   aggregations, stat tables, the ``compare`` CDC diff classifier.
- ``functions``  : training-data pipeline functions — text quality / language id /
                   tokenization / fingerprints, MinHash-LSH & SimHash dedup,
                   embedding similarity search, multimodal column plumbing.
- ``cdc``        : the CDC runtime — deterministic change-event generation,
                   salted last-writer-wins dedup, exactly-once MERGE upserts into
                   a snapshot table (Iceberg when available, a manifest-based
                   parquet snapshot store otherwise), Structured Streaming tail,
                   per-batch/per-partition lineage + metrics.

Nothing here is ported from the reference implementation; reference files are
cited in docstrings (``path:line`` relative to the reference checkout) only to
document *behavioral* parity.
"""

__version__ = "0.1.0"

from pyetl_spark.session import get_spark  # noqa: F401
