"""Incremental view maintenance over the change feed (Delta/Flink
"materialized view over CDF" analog; reference analog: pyetl recomputes its
stat tables from scratch per run — traitement_stats.py — which at 10^10
events is exactly what a change feed exists to avoid).

``delta_aggregate`` turns a :meth:`SnapshotTable.changes` slice into
ADDITIVE per-group deltas (inserts/post-images count +1, deletes/pre-images
count −1 — an update that moves a row between groups therefore debits the
old group and credits the new one with no special casing).
:class:`IncrementalAgg` folds those deltas into a persistent aggregate
table: cost per apply ∝ the groups the batch touched (bucket-pruned state
read + one small merge), never the size of the base table or of the view.

Sums are maintained in DECIMAL so incremental (+x then −x) arithmetic is
exact — float sums drift under reordering, and a maintained view must stay
byte-equal to the recomputed truth indefinitely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.cdc.tableio import MergeStats, SnapshotTable

_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def delta_aggregate(
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    decimal: str = "decimal(28,6)",
) -> DataFrame:
    """Per-group additive deltas for a CDF slice: ``d_count`` plus one
    ``d_sum_<col>`` per ``sum_cols`` entry (cast to ``decimal`` for exact
    fold-in/fold-out). One hash aggregate; groups whose net effect cancels
    within the slice (e.g. a row updated without changing group or summed
    values) still emit a zero row — harmless, and filtering them would cost
    more than merging them."""
    sign = F.col("_change_type")
    expr = F.lit(None).cast("int")
    for ct, s in _SIGN.items():
        expr = F.when(sign == ct, F.lit(s)).otherwise(expr)
    base = changes.withColumn("__sign", expr)
    aggs = [F.sum("__sign").cast("long").alias("d_count")]
    for c in sum_cols:
        aggs.append(
            F.sum(F.col("__sign") * F.col(c).cast(decimal))
            .cast(decimal)
            .alias(f"d_sum_{c}")
        )
    return base.groupBy(*group_cols).agg(*aggs)


class IncrementalAgg:
    """A persistent COUNT/SUM-per-group view maintained from change-feed
    slices. State lives in a :class:`SnapshotTable` keyed on the group
    columns, so applies inherit the table's exactly-once batch ledger
    (a replayed slice is a no-op), atomic commits, time travel, expiry and
    rollback. Groups whose count returns to zero are deleted from the view
    (tombstoned), mirroring what a recompute would show."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_cols: Sequence[str],
        sum_cols: Sequence[str] = (),
        nbuckets: int = 16,
    ):
        self.spark = spark
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        cfg = {
            "view_group_cols": self.group_cols,
            "view_sum_cols": self.sum_cols,
        }
        if SnapshotTable.exists(root):
            self.table = SnapshotTable(spark, root)
            got = {k: self.table.props().get(k) for k in cfg}
            if got != cfg:
                raise ValueError(
                    f"IncrementalAgg at {root} was created with {got}, "
                    f"reopened with {cfg} — refusing to mix view definitions"
                )
        else:
            self.table = SnapshotTable.create(
                spark, root, keys=self.group_cols, nbuckets=nbuckets, props=cfg
            )

    def apply(self, changes: DataFrame, batch_id: str) -> MergeStats:
        """Fold one CDF slice into the view. Reads ONLY the state buckets
        the slice's groups hash into (cost ∝ touched groups); emits
        upserts for surviving groups and deletes for groups whose count
        reaches zero. Idempotent per ``batch_id`` via the table ledger."""
        if self.table.is_committed(batch_id):
            return MergeStats(batch_id, self.table.current_version(), 0, 0, 0, 0, skipped=True)
        deltas = delta_aggregate(changes, self.group_cols, self.sum_cols)
        # pin the (small) delta frame: bucket_ids collects from it, and the
        # join below reuses it — without this the CDF diff recomputes twice
        deltas = deltas.localCheckpoint(eager=True)
        touched = self.table.bucket_ids(deltas)
        cur = self.table.read(buckets=touched)
        sum_names = [f"sum_{c}" for c in self.sum_cols]
        if "count" not in cur.columns:  # first apply: empty-schema state
            cur = deltas.select(
                *self.group_cols,
                F.lit(0).cast("long").alias("count"),
                *[
                    F.lit(0).cast(deltas.schema[f"d_sum_{c}"].dataType).alias(n)
                    for c, n in zip(self.sum_cols, sum_names)
                ],
            ).limit(0)
        j = cur.join(deltas, on=self.group_cols, how="full")
        folded = j.select(
            *self.group_cols,
            (
                F.coalesce(F.col("count"), F.lit(0))
                + F.coalesce(F.col("d_count"), F.lit(0))
            ).alias("count"),
            *[
                (
                    F.coalesce(F.col(n), F.lit(0))
                    + F.coalesce(F.col(f"d_sum_{c}"), F.lit(0))
                )
                .cast(cur.schema[n].dataType if n in cur.columns else "decimal(28,6)")
                .alias(n)
                for c, n in zip(self.sum_cols, sum_names)
            ],
        )
        seq = self.table.max_seq() + 1
        delta_rows = folded.select(
            *self.group_cols,
            "count",
            *sum_names,
            F.when(F.col("count") <= 0, F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
            F.lit(seq).alias("seq"),
        )
        return self.table.merge(delta_rows, batch_id=batch_id)

    def state(self) -> DataFrame:
        """Current view contents (group_cols, count, sum_<col>…)."""
        return self.table.read()
