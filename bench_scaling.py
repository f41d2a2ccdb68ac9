"""Scaling-efficiency evidence for the north rule: the same CDC replay job on
the SAME input at two parallelism levels (local[N] and local[4N]), reporting
events/s at both plus efficiency = (rate_4N / rate_N) / 4, target >= 0.8.

No real cluster exists in this sandbox, so "N vs 4N executors" is evidenced by
core count inside a single JVM per run (one fresh subprocess per level — Spark
masters can't change within a JVM, and a fresh JVM gives each level identical
JIT/codegen starting conditions). The job is size-oblivious (no driver-side
state proportional to rows), so the same measurement applies to real
multi-executor clusters; shuffle partitions scale with cores exactly as they
would with `spark-submit --num-executors`.

Usage:
    python bench_scaling.py                 # driver: runs both levels, prints JSON
    python bench_scaling.py --worker N      # internal: one level, prints JSON

Env knobs: SPARK_GRAFT_SCALE_EVENTS (default 2_000_000),
           SPARK_GRAFT_SCALE_BASE_CPUS (default 8; the 4x level is derived).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "2000000"))
BASE_CPUS = int(os.environ.get("SPARK_GRAFT_SCALE_BASE_CPUS", "8"))
N_BATCHES = 4
GEN = dict(n_repos=2000, paths_per_repo=500, seed=42)


def run_level(cpus: int) -> dict:
    """one parallelism level: full batched replay, events/s over the whole job."""
    from pyspark.sql import functions as F

    from pyetl_spark.cdc import SnapshotTable, change_events
    from pyetl_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # warmup: pay the one-time JIT/codegen toll outside the timing
    spark.range(100000).select(F.sum(F.col("id") * 2)).collect()

    root = tempfile.mkdtemp(prefix=f"scale_{cpus}_")
    try:
        table = SnapshotTable.create(
            spark, os.path.join(root, "t"), keys=["repo", "path"], nbuckets=cpus
        )
        per = N_EVENTS // N_BATCHES
        t0 = time.time()
        for b in range(N_BATCHES):
            lo = b * per
            hi = (b + 1) * per if b < N_BATCHES - 1 else N_EVENTS
            batch = change_events(spark, hi, start=lo, partitions=cpus, **GEN)
            table.merge(batch, batch_id=f"scale:{b}")
        dt = time.time() - t0
        rows = table.read().count()
        return {
            "cpus": cpus,
            "events": N_EVENTS,
            "sec": round(dt, 2),
            "events_per_sec": int(N_EVENTS / dt),
            "final_rows": rows,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return

    results = []
    for cpus in (BASE_CPUS, BASE_CPUS * 4):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))

    lo, hi = results
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4
    print(
        json.dumps(
            {
                "metric": "cdc_replay_scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "target": 0.8,
                "levels": results,
                "note": (
                    "same job, same deterministic input (seed=42), fresh JVM per "
                    "level; efficiency = (rate_4N/rate_N)/4"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
