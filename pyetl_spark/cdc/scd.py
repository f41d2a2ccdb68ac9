"""Slowly-changing-dimension Type 2 over a change stream.

The reference's `compare` command (pyetl/moteur/commandes.py, full-outer
diff tagged insert/update/delete) answers "what changed between two
snapshots"; SCD2 is the warehouse-side continuation it stops short of:
keep EVERY version of a dimension row, stamped with its validity interval,
so facts can join to the attribute values that were true at event time.

Two entry points:

* ``scd2_build(changes)`` — from a full changelog, build the complete
  history: one row per (key, version) with ``valid_from`` / ``valid_to``
  (null = open) / ``is_current``. Consecutive deliveries of the SAME
  attribute values collapse into one version (no-op updates don't cut a
  new interval).
* ``scd2_apply(history, batch)`` — incremental maintenance: close out
  current rows whose attributes changed and append the new versions.
  Equivalence contract (property-tested): applying batches one at a time
  reproduces ``scd2_build`` over the concatenated changelog.

Scale shape: everything is one shuffle on the dimension key. scd2_build
is two window passes over (key, ts) partitions — no joins, no driver
state; keys are unique-ish so no skew salt is needed (a hot key with
millions of versions is a data bug, not a plan problem). scd2_apply
touches only the keys present in the batch: history is SEMI-JOINED down
to the affected slice (batch keys are broadcast), so per-batch cost is
proportional to the batch, not the dimension — the same
"probe only your slice" invariant as functions/incremental.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ordered(seq_cols: Sequence[str]) -> list:
    return [F.col(c) for c in seq_cols]


def scd2_build(
    changes: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """Full history from a changelog of (key, attrs, ts[, seq]) deliveries.

    ``seq_col`` breaks ties when two deliveries share a timestamp (same
    contract as lww_dedup's sequence column); without one, equal-ts
    deliveries would make version order nondeterministic, so pass it
    whenever the source can emit same-ts updates.

    Output: key + attrs + ``valid_from`` (ts of first delivery of this
    version), ``valid_to`` (ts of the next version's first delivery; null
    while current), ``is_current``.
    """
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # change-point detection: a row starts a new version iff any attr
    # differs from the previous delivery (null-safe), or it's the first
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1
    pts = changes.withColumn("__new_version", (first | changed).cast("int"))
    starts = pts.filter("__new_version = 1").drop("__new_version")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    out = starts.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull().cast("int"))


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """Incrementally fold one change batch into an existing SCD2 history.

    Requires in-order delivery per key: every batch ``ts`` must be >= the
    key's current ``valid_from`` (late/out-of-order deliveries belong in
    the lww/stateful layer upstream). Untouched keys pass through without
    being rewritten — only the batch's key slice is recomputed, via a
    broadcast semi/anti split — so a small batch against a huge dimension
    reads the history once and shuffles only the affected rows.
    """
    keys = list(key_cols)
    batch_keys = F.broadcast(batch.select(*keys).distinct())
    untouched = history.join(batch_keys, keys, "left_anti")
    affected = history.join(batch_keys, keys, "left_semi")
    # replay = affected history re-expressed as a changelog (each version's
    # opening delivery) + the new batch, rebuilt by the same change-point
    # pass. seq: closed historical versions must order before the batch at
    # equal ts; their original seq is not retained, so synthesize -inf.
    hist_as_changes = affected.select(
        *keys, *attr_cols, F.col("valid_from").alias(ts_col)
    )
    if seq_col:
        hist_as_changes = hist_as_changes.withColumn(
            seq_col, F.lit(-(2**62)).cast("long")
        )
    replay = hist_as_changes.unionByName(
        batch.select(*keys, *attr_cols, ts_col, *([seq_col] if seq_col else []))
    )
    rebuilt = scd2_build(replay, keys, attr_cols, ts_col, seq_col)
    return untouched.unionByName(rebuilt)
