"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference's only stateful constructs are in-memory dict accumulators on
a single ordered stream (``tmpstore =cnt`` keyed counters,
traitement_divers.py:57-134; global counters ``cnt``/``padd``
traitement_alpha.py:845-873, pyetl.py:1011-1022). In Structured Streaming
that state must live in the checkpointed state store, keyed and partitioned:
this module keeps per-(repo, path) running CDC statistics across
micro-batches with Arrow-batched pandas state functions (no per-row Python).

Scale notes: state is hash-partitioned by key across executors (same
partitioning as the shuffle that feeds it); each key's state is a few ints —
10^8 keys ≈ a few GB spread over the cluster's state stores, checkpointed
incrementally. Use watermark-based timeouts (``GroupStateTimeout``) to expire
idle keys when the keyspace is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = (
    "repo string, path string, events_seen long, upserts long, deletes long, max_seq long"
)
_STATE_SCHEMA = "events_seen long, upserts long, deletes long, max_seq long"


def _update_key_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """running totals per (repo, path): events seen, upserts vs deletes,
    high-water commit seq — the keyed-counter semantics of ``tmpstore =cnt``
    made restart-safe by the state store."""
    if state.exists:
        events_seen, upserts, deletes, max_seq = state.get
    else:
        events_seen, upserts, deletes, max_seq = 0, 0, 0, -1
    for pdf in pdfs:
        events_seen += len(pdf)
        is_del = pdf["op"] == "delete"
        deletes += int(is_del.sum())
        upserts += int((~is_del).sum())
        if len(pdf):
            max_seq = max(max_seq, int(pdf["seq"].max()))
    state.update((events_seen, upserts, deletes, max_seq))
    yield pd.DataFrame(
        [
            {
                "repo": key[0],
                "path": key[1],
                "events_seen": events_seen,
                "upserts": upserts,
                "deletes": deletes,
                "max_seq": max_seq,
            }
        ]
    )


def running_key_stats(event_stream: DataFrame) -> DataFrame:
    """Attach the stateful per-key stats operator to a streaming DataFrame of
    change events (schema per ``datagen.EVENT_SCHEMA``). Output mode
    ``update``: one refreshed row per key per micro-batch it appears in."""
    return event_stream.groupBy("repo", "path").applyInPandasWithState(
        _update_key_stats,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
