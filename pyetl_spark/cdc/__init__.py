"""CDC runtime: change-event generation, LWW dedup, snapshot-table MERGE,
Structured Streaming tail, lineage/metrics (SURVEY §2.9, north_rule)."""

from pyetl_spark.cdc.datagen import change_events, write_event_batches
from pyetl_spark.cdc.dedup import lww_dedup, lww_dedup_salted
from pyetl_spark.cdc.ivm import IncrementalAgg, delta_aggregate
from pyetl_spark.cdc.tableio import ConstraintViolationError, SnapshotTable
from pyetl_spark.cdc.oracle import replay_oracle

__all__ = [
    "change_events",
    "write_event_batches",
    "lww_dedup",
    "lww_dedup_salted",
    "IncrementalAgg",
    "delta_aggregate",
    "SnapshotTable",
    "ConstraintViolationError",
    "replay_oracle",
]
