"""Deployable CDC ingest job over a Kafka-shaped topic — the broker-source
sibling of jobs/cdc_ingest.py.

Consumes the standard Kafka envelope (key/value binary, topic, partition,
offset, timestamp): here from a file-backed simulated topic written by
``pyetl_spark.cdc.kafka_source.write_kafka_envelope_batches``; on a real bus,
replace the reader with ``spark.readStream.format("kafka")`` — the parse,
transform, dedup, and exactly-once MERGE path is byte-identical (see
pyetl_spark/cdc/kafka_source.py). Malformed payloads are dead-lettered out of
the MERGE, never stream-killing.

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/kafka_cdc_ingest.py <topic_dir> <table_dir> <checkpoint_dir> \
        [--nbuckets 32] [--keys repo,path]

Same operational probes as cdc_ingest.py: re-submit after completion is a
fast no-op (committed-batch ledger); deleting the checkpoint forces full
topic redelivery, absorbed without double-applying.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from pyetl_spark.cdc import SnapshotTable
from pyetl_spark.cdc.kafka_source import kafka_ingest
from pyetl_spark.rules import Rule, RuleContext, compile_rules


def default_rules() -> list[Rule]:
    return [
        Rule(op="upper", out="lang", inp="lang"),
        Rule(op="checksum", out="content_sha", inp="content"),
        Rule(op="set", out="origin", default="kafka:[repo]"),
    ]


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("topic_dir")
    ap.add_argument("table_dir")
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--nbuckets", type=int, default=32)
    ap.add_argument("--keys", default="repo,path")
    ap.add_argument("--no-transform", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pyetl_spark_kafka_ingest").getOrCreate()
    keys = [k.strip() for k in args.keys.split(",")]

    if SnapshotTable.exists(args.table_dir):
        table = SnapshotTable(spark, args.table_dir)
    else:
        table = SnapshotTable.create(
            spark, args.table_dir, keys=keys, nbuckets=args.nbuckets
        )

    transform = (
        None if args.no_transform else compile_rules(default_rules(), RuleContext())
    )
    ingest = kafka_ingest(
        spark, args.topic_dir, table, args.checkpoint_dir, transform=transform
    )
    ingest.run_until_drained()

    m = table.manifest()
    print(
        f"rows={table.read().count()} version={m['version']} "
        f"batches={len(m['committed_batches'])} max_seq={table.max_seq()}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
