"""Subprocess worker for tests/test_ledger_compaction.py — drives 500+
REAL merges through one SnapshotTable and reports per-commit manifest byte
size + wall time, plus replay-idempotency probes (VERDICT r04 finding #1
"done" criterion).

Runs in its own JVM on purpose: a 500-commit loop generates enough JIT'd
methods to fill the test session's capped code cache (observed: compilation
disabled mid-loop), which would degrade every later test sharing the JVM.
The worker uses a lean conf (codegen/AQE off — per-commit latency here is
sandbox job-scheduling overhead, not compute) and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.session import get_spark  # noqa: E402


def main(n_commits: int = 510, ledger_keep: int = 64) -> None:
    spark = get_spark(
        app_name="ledger_flatness",
        master="local[2]",
        shuffle_partitions=1,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": "-XX:TieredStopAtLevel=1 -XX:+UseSerialGC",
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    from pyetl_spark.cdc.tableio import SnapshotTable

    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="ledger_flat_", dir=fast)
    schema = "k string, v string, op string, seq long"

    def delta(key: str, val: str, seq: int):
        return spark.createDataFrame([(key, val, "upsert", seq)], schema)

    try:
        # warmup table: pay one-time JIT/codegen for the merge stages
        warm = SnapshotTable.create(spark, os.path.join(root, "warm"), keys=["k"], nbuckets=4)
        for i in range(5):
            warm.merge(delta(f"k{i}", "w", i), batch_id=f"w:{i}")

        t = SnapshotTable.create(
            spark,
            os.path.join(root, "t"),
            keys=["k"],
            nbuckets=4,
            props={"ledger_keep": ledger_keep},
        )
        sizes: list[int] = []
        walls: list[int] = []
        alpha_version = -1
        for i in range(n_commits):
            if i == 100:
                # one writer with an UNPARSEABLE batch id (no trailing int):
                # exact only inside the ledger window, state-idempotent beyond
                s = t.merge(delta("kalpha", "valpha", 10_000), batch_id="alpha")
                alpha_version = s.version
            s = t.merge(delta(f"k{i % 16}", f"v{i}", i), batch_id=f"s:{i}")
            walls.append(s.wall_ms)
            sizes.append(os.path.getsize(t._manifest_path(s.version)))

        m = t.manifest()
        # replay probes (all batch ids below are long-evicted from the window)
        evicted_replay_skipped = t.merge(delta("k5", "STALE", 5), batch_id="s:5").skipped
        pre_state = sorted(
            (r["k"], r["v"]) for r in t.read().select("k", "v").collect()
        )
        # unparseable-id replay beyond the window: re-merged (not skipped),
        # but LWW makes it a no-op on state and an EMPTY change-feed commit
        v_before = t.current_version()
        alpha2 = t.merge(delta("kalpha", "valpha", 10_000), batch_id="alpha")
        post_state = sorted(
            (r["k"], r["v"]) for r in t.read().select("k", "v").collect()
        )
        feed_rows = t.changes(v_before, alpha2.version).count()

        expected = {f"k{i % 16}": f"v{i}" for i in range(n_commits)}
        expected["kalpha"] = "valpha"
        print(
            json.dumps(
                {
                    "n_commits": n_commits,
                    "ledger_keep": ledger_keep,
                    "ledger_size": len(m["committed_batches"]),
                    "hwm": m["batch_hwm"],
                    "manifest_sizes": sizes,
                    "wall_ms": walls,
                    "evicted_replay_skipped": evicted_replay_skipped,
                    "alpha_replay_skipped": alpha2.skipped,
                    "alpha_first_version_ok": alpha_version > 0,
                    "alpha_feed_rows": feed_rows,
                    "state_unchanged_by_alpha_replay": pre_state == post_state,
                    "state_ok": dict(pre_state) == expected,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(
        n_commits=int(sys.argv[1]) if len(sys.argv) > 1 else 510,
        ledger_keep=int(sys.argv[2]) if len(sys.argv) > 2 else 64,
    )
