"""Scale-tier correctness: the full flagship pipeline (transform rules →
LWW dedup → batched MERGE, out-of-order + redelivered) at 200k events with
heavy hot-repo skew, byte-equal to the sequential oracle.

This is deliberately the largest test in the suite (~1 min): the same
invariants as test_cdc_batch, at a size where partial-aggregation, AQE and
multi-batch bucket rewrites all genuinely engage.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pyetl_spark.cdc import SnapshotTable, change_events, replay_oracle
from pyetl_spark.rules import Rule, RuleContext, compile_rules

N = 200_000
GEN = dict(n_repos=300, paths_per_repo=80, seed=42, alpha=4.0)  # extreme skew


@pytest.fixture(scope="module")
def events(spark):
    df = change_events(spark, N, partitions=8, **GEN)
    df.cache().count()
    return df


def test_scale_replay_with_transforms_matches_oracle(spark, events, tmp_path):
    transform = compile_rules(
        [
            Rule(op="upper", out="lang", inp="lang"),
            Rule(op="checksum", out="content_sha", inp="content"),
        ],
        RuleContext(),
    )
    table = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=16)
    # out-of-order batches + a redelivered duplicate in the middle
    for b in (2, 0, 2, 3, 1):
        lo, hi = b * 50_000, (b + 1) * 50_000
        batch = events.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        table.merge(transform(batch), batch_id=f"s:{b}", prune=False)

    expect = replay_oracle(events.toPandas())
    got = (
        table.read()
        .orderBy("repo", "path")
        .select("repo", "path", "lang", "content", "content_sha")
        .toPandas()
    )
    assert len(got) == len(expect)
    assert list(got["repo"]) == list(expect["repo"]) and list(got["path"]) == list(expect["path"])
    # per-row invariants: sha256(content) equality vs oracle, rules applied
    expect_sha = expect["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    assert list(got["content_sha"]) == list(expect_sha)
    assert list(got["lang"]) == list(expect["lang"].str.upper())

    # skew really was extreme: the hottest repo received >10% of all EVENTS
    # (keys per repo are capped at paths_per_repo — the hot-key pressure is
    # on the dedup aggregation, which partial combine absorbs)
    top_events = events.groupBy("repo").count().agg(F.max("count")).first()[0]
    assert top_events > 0.1 * N
