"""Last-writer-wins deduplication by commit sequence (north_rule).

Reference parity: ``f_uniq``/``f_uniqcnt`` (traitement_divers.py:137-198)
keep the *first* occurrence in stream order; in the CDC recast the winner is
the *highest commit seq* per ``(repo, path)`` key and order is explicit.

Two implementations, both shuffle-minimal:

``lww_dedup`` (default) — single hash aggregation
    ``groupBy(keys).agg(max_by(struct(payload), seq))``. Spark's hash
    aggregate performs **map-side partial combine**: each input partition
    pre-reduces its own duplicates before the shuffle, so a hot (repo, path)
    key contributes at most one row *per upstream partition* to the
    exchange. That is precisely the load-spreading that manual salting
    buys, obtained for free from partial aggregation — and it's why this is
    the 100 TB-safe default.

``lww_dedup_salted`` — explicit two-phase salted variant (north_rule names
    salting explicitly; also the right shape when the winner function is not
    expressible as an aggregate, e.g. windowed top-N with ties):
    phase 1 dedups within ``(key, salt)`` where ``salt = pmod(hash(commit),
    nsalt)`` — a hot key is spread over ``nsalt`` reducers; phase 2 dedups the
    ≤nsalt survivors per key. Both phases are the same max_by aggregate.

Ties on seq cannot occur in a well-formed stream (seq is unique); if fed
duplicate seqs the winner includes the lexicographically-greatest commit to
stay deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _payload_cols(df: DataFrame, keys: Sequence[str], seq: str) -> list[str]:
    return [c for c in df.columns if c not in keys]


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    seq: str = "seq",
) -> DataFrame:
    """Keep the highest-seq row per key via one map-side-combinable agg."""
    keys = list(keys)
    payload = _payload_cols(df, keys, seq)
    # tie-break on (seq, commit-ish payload) by ordering on a struct
    order = F.struct(F.col(seq), *[F.col(c) for c in payload if c != seq])
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("__w")
    out = df.groupBy(*keys).agg(winner)
    return out.select(*keys, *[F.col(f"__w.{c}").alias(c) for c in payload])


def stream_dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str] = ("repo", "path", "commit"),
    event_time_col: str = "event_ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """At-source streaming dedup of redelivered events:
    ``withWatermark + dropDuplicatesWithinWatermark`` (SURVEY §2.9 — the
    reference's unbounded in-memory ``unique`` set becomes bounded,
    checkpointed state that expires with the watermark).

    This is an OPTIMIZATION stage, not the correctness mechanism: the MERGE
    sink is already idempotent (LWW by seq + batch ledger), so dropping
    duplicate deliveries here only saves downstream work. Key includes the
    commit so distinct updates to the same path are NOT collapsed."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(list(keys))


def lww_dedup_salted(
    df: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    seq: str = "seq",
    nsalt: int = 16,
    salt_on: str = "commit",
) -> DataFrame:
    """Explicit two-phase salted LWW dedup (hot-key spreading)."""
    keys = list(keys)
    payload = _payload_cols(df, keys, seq)
    order = F.struct(F.col(seq), *[F.col(c) for c in payload if c != seq])
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("__w")

    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(nsalt)))
    phase1 = salted.groupBy(*keys, "__salt").agg(winner)
    phase1 = phase1.select(*keys, *[F.col(f"__w.{c}").alias(c) for c in payload])
    return lww_dedup(phase1, keys, seq)
