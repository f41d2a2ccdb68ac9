"""Kafka-shaped CDC source adapter.

Spark's Kafka source (``readStream.format("kafka")``) yields a fixed
envelope: ``(key binary, value binary, topic string, partition int,
offset long, timestamp timestamp, timestampType int)``. No broker exists in
this sandbox, so the adapter is split the way a production job is anyway:

- :func:`parse_kafka_envelope` — envelope rows → typed change events
  (``from_json`` over the value bytes, pure Column expressions). Malformed
  payloads are FLAGGED (``_corrupt``), never dropped silently and never
  stream-killing; callers route them to a dead-letter sink. This function is
  source-agnostic: it works identically on a real Kafka stream.
- :func:`events_to_envelope` / :func:`write_kafka_envelope_batches` /
  :func:`kafka_envelope_stream` — a deterministic file-backed simulation of
  a topic (same envelope schema, key-hash partitioning, offset = seq), so
  tests drive the parse path end-to-end.
- :func:`kafka_ingest` — StreamingIngest over the simulated topic; swapping
  in a real broker is the one-line source swap promised in
  ``stream.py``'s module docstring.

Reference: pyetl has only polling file/DB readers (generic_io.py,
parallel.py:729-763 iter_boucle); a binlog/WAL tail has no direct analog —
this is the SURVEY §2.9 scale recast of its streaming seam.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.cdc.datagen import EVENT_SCHEMA
from pyetl_spark.cdc.stream import StreamingIngest
from pyetl_spark.cdc.tableio import SnapshotTable

KAFKA_ENVELOPE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

_KAFKA_META = ["_topic", "_partition", "_offset", "_corrupt", "_tombstone"]

# full-microsecond timestamps in the JSON payload: to_json always writes
# ISO millis (it ignores timestampFormat), silently losing event-time
# precision — so the producer formats timestamp columns explicitly with
# date_format at this pattern, and the parser hands the same pattern to
# from_json.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_JSON_OPTS = {"timestampFormat": _TS_FMT}


def events_to_envelope(
    events: DataFrame,
    topic: str = "code_changes",
    n_partitions: int = 8,
    key_cols: tuple[str, ...] = ("repo", "path"),
    offset_col: str = "seq",
) -> DataFrame:
    """Wrap typed events in the Kafka envelope (the producer side of the
    simulation). Deterministic: key = the join of ``key_cols`` (Kafka's
    same-key→same-partition contract via hash), offset = ``offset_col``,
    timestamp derived from the offset — no wall clock, so the same input
    always yields a byte-identical topic."""
    key = F.concat_ws("\x00", *[F.col(c) for c in key_cols])
    fields = [
        F.date_format(f.name, _TS_FMT).alias(f.name)
        if f.dataType.typeName().startswith("timestamp")
        else F.col(f.name)
        for f in events.schema.fields
    ]
    value = F.to_json(F.struct(*fields))
    return events.select(
        key.cast("binary").alias("key"),
        value.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.xxhash64(key), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col(offset_col).cast("long").alias("offset"),
        F.timestamp_millis(F.col(offset_col).cast("long")).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def parse_kafka_envelope(
    df: DataFrame,
    value_schema: str = EVENT_SCHEMA,
    keep_meta: bool = True,
) -> DataFrame:
    """Envelope → typed events: ``from_json`` over the value bytes.

    A payload that fails to parse gets ``_corrupt = true`` with its event
    columns null (PERMISSIVE mode + ``columnNameOfCorruptRecord`` — Spark
    yields an all-null row for malformed JSON, and the corrupt-record column
    carries the raw text, which is the reliable malformed signal). A record
    with a NULL value — a Kafka tombstone, routine on real topics — gets
    ``_tombstone = true`` instead: it is a deletion marker, not garbage, and
    must not reach the MERGE as a null-key upsert. Dead-letter / route them
    via the flags — at-scale streams always carry some. Kafka metadata
    survives as ``_topic/_partition/_offset`` for lineage."""
    j = F.from_json(
        F.col("value").cast("string"),
        value_schema + ", __cr string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "__cr", **_JSON_OPTS},
    )
    out = (
        df.select(
            j.alias("__j"),
            F.col("topic").alias("_topic"),
            F.col("partition").alias("_partition"),
            F.col("offset").alias("_offset"),
            (F.col("value").isNotNull() & j["__cr"].isNotNull()).alias("_corrupt"),
            F.col("value").isNull().alias("_tombstone"),
        )
        .select("__j.*", *_KAFKA_META)
        .drop("__cr")
    )
    if not keep_meta:  # drop lineage columns, keep the routing flags
        out = out.drop("_topic", "_partition", "_offset")
    return out


def write_kafka_envelope_batches(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    n_batches: int = 4,
    offset_col: str = "seq",
    **envelope_kw,
) -> int:
    """Simulated topic on disk: ``n_batches`` parquet file groups in offset
    ranges (a file source's offset log replays them in deterministic order —
    the property a broker's (partition, offset) pairs give a real consumer).
    Returns total events written."""
    env = events_to_envelope(events, offset_col=offset_col, **envelope_kw)
    hi = env.agg(F.max("offset")).collect()[0][0]
    total = 0
    if hi is None:
        return 0
    step = (hi + n_batches) // n_batches
    for b in range(n_batches):
        part = env.filter(
            (F.col("offset") >= b * step) & (F.col("offset") < (b + 1) * step)
        )
        total += part.count()
        part.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/batch={b:04d}")
    return total


def kafka_envelope_stream(
    spark: SparkSession, topic_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """readStream over the simulated topic — same schema a broker source
    yields, so downstream code cannot tell the difference."""
    return (
        spark.readStream.schema(KAFKA_ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("recursiveFileLookup", "true")
        .parquet(topic_dir)
    )


def kafka_ingest(
    spark: SparkSession,
    topic_dir: str,
    table: SnapshotTable,
    checkpoint_dir: str,
    value_schema: str = EVENT_SCHEMA,
    transform=None,
    dead_letter_dir: str | None = None,
    max_files_per_trigger: int = 4,
    **ingest_kw,
) -> StreamingIngest:
    """StreamingIngest whose source is the (simulated) Kafka topic: envelope
    → parse → route (corrupt rows to the dead-letter sink, tombstones
    dropped as deletion markers) → the unchanged exactly-once sink path.
    Corrupt rows are NEVER silently discarded: they are counted per batch in
    ``ingest.dead_letters`` and, when ``dead_letter_dir`` is set, appended
    there as parquet with their kafka identity. For a real broker, replace
    :func:`kafka_envelope_stream` with ``spark.readStream.format("kafka")``
    — nothing else changes."""
    dead_letters: list[dict] = []
    _dl_counts: dict[int, int] = {}

    def _parse_then_transform(batch: DataFrame, epoch_id: int) -> DataFrame:
        import shutil

        parsed = parse_kafka_envelope(batch, value_schema, keep_meta=True)
        bad = parsed.filter(F.col("_corrupt"))
        n_bad = bad.count()
        if dead_letter_dir:
            dl_path = os.path.join(dead_letter_dir, f"batch={epoch_id}")
            if n_bad:
                # keyed by batch + overwrite: foreachBatch is at-least-once,
                # so a replayed epoch REPLACES its own dead-letter partition
                # instead of appending duplicates — idempotent like the
                # ledger-guarded MERGE path (ADVICE r02). Readers just
                # spark.read.parquet(dead_letter_dir); `batch` is a normal
                # partition column.
                bad.select("_topic", "_partition", "_offset").write.mode(
                    "overwrite"
                ).parquet(dl_path)
            elif os.path.isdir(dl_path):
                # a replayed epoch that now parses CLEAN (e.g. after a
                # value_schema fix) voids its previous attempt's dead
                # letters — idempotency must hold for the zero-bad case
                # too, or stale corrupt rows outlive the replay (ADVICE r03)
                shutil.rmtree(dl_path)
        # latest attempt wins per epoch: a replay may legitimately change
        # the count (schema fixed → 0), so entries are rebuilt, not
        # appended. Only CORRUPT epochs are tracked — a long-lived tail
        # processes millions of clean epochs and must not grow driver state
        # (or pay a per-batch rebuild) proportional to stream age.
        if n_bad:
            _dl_counts[epoch_id] = n_bad
        elif _dl_counts.pop(epoch_id, None) is None:
            n_bad = None  # clean epoch, nothing tracked: skip the rebuild
        if n_bad is not None:
            dead_letters[:] = [
                {"batch": e, "corrupt": c} for e, c in sorted(_dl_counts.items())
            ]
        typed = parsed.filter(~F.col("_corrupt") & ~F.col("_tombstone")).drop(
            *_KAFKA_META
        )
        return transform(typed) if transform else typed

    ingest = StreamingIngest(
        spark,
        events_dir=topic_dir,
        table=table,
        checkpoint_dir=checkpoint_dir,
        transform=_parse_then_transform,
        max_files_per_trigger=max_files_per_trigger,
        reader_factory=lambda spark_: kafka_envelope_stream(
            spark_, topic_dir, max_files_per_trigger
        ),
        **ingest_kw,
    )
    ingest.dead_letters = dead_letters
    return ingest
