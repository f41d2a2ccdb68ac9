"""Plan-shape audit across the whole driver contract: no contract query may
plan a nested-loop or cartesian join (the O(L*R) shapes that die at scale),
except the two documented exactness baselines whose unbounded side is a
broadcast of a few rows. Catches silent plan regressions when queries or
operators change."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

# queries that EXECUTE on construction (eager localCheckpoint / table
# writes): excluded — this audit is plan-only and must stay cheap
EAGER = {
    "dedup_minhash_lsh",
    "cdc_merge_table",
    "cdc_schema_evolution",
    "csv_roundtrip",
    "xlsx_roundtrip",
    "dbf_roundtrip",
    "sortir_fanout",
    "dedup_components",   # iterative: star rounds localCheckpoint eagerly
    "cdc_stateful_stats", # runs an availableNow stream on construction
    "dedup_incremental",  # 3 registry merges run on construction
    "dedup_incremental_lsh",  # 3 registry merges run on construction
    "sim_incremental_ann",    # 3 registry merges run on construction
    "shard_pack",         # distributed prefix sum collects O(P) offsets eagerly
    "pipeline_curate",    # ends in shard packing (same eager prefix sum)
}

# documented exceptions: nested-loop is the POINT (exact baselines), and the
# build side is a broadcast of <=20 probe rows / 1 query vector
ALLOWED_NESTED = {
    "sim_knn_brute",   # probe-bounded exact k-NN baseline
    "sim_brute_topk",  # crossJoin against a broadcast 1-row query vector
}


@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - EAGER))
def test_no_nested_loop_or_cartesian(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    if name in ALLOWED_NESTED:
        return
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a nested loop"
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
