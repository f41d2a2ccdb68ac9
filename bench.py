"""Benchmark harness — prints ONE JSON line per the driver contract:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. The flagship number is the CDC replay
(events/s through generate → LWW dedup → bucket-pruned MERGE), reported in
"extras" alongside per-query seconds.

Full JIT (no TieredStopAtLevel cap — unlike the test session) and a warmup
action, because the sandbox's first codegen'd stage pays a 30-70s gVisor JIT
toll that would otherwise pollute the first measured query.

Scaling evidence (north_rule: >=0.8 efficiency from N to 4N executors) is
produced by bench_scaling.py (separate JVMs per parallelism level).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pyetl_spark.session import get_spark  # noqa: E402


BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "stat_table",
    "merge_rows",
    "join_denorm",
    "semi_join",
    "topk_per_group",
    "cdc_lww_events",
    "window_hourly",
    "compare_cdc",
    "asof_join",
    "range_join",
    "supplier_rollup",
    "rules_scalar",
    "text_tokens",
    "text_quality",
    "text_lang_id",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_brute_topk",
    "sim_knn_blocked",
    # round 3: the composed curation pipeline (gate → stratified sample →
    # exact dedup → token-budget shard packing) — the training-data flagship
    "pipeline_curate",
    # round 4: the new curation-tier operators (PII redaction, Gopher
    # repetition profile, C4 span removal, SemDeDup within-cell pairs)
    "text_pii_redact",
    "text_repetition",
    "quality_gopher_gate",
    "text_decontaminate",
    "cdc_scd2",
    "dedup_chunks",
    "sim_semdedup",
    "rebalance_mix",
    # round 4, CDC tier: change-data-feed reads, file-metric data skipping,
    # incremental view maintenance over the feed
    "cdc_table_changes",
    "cdc_skipping_scan",
    "cdc_incremental_agg",
    # round 5: DSIR-style importance scoring (hashed n-gram log-ratio /
    # integer-exact cross-multiplied variant) and z-order-clustered
    # multi-column data skipping
    "quality_dsir",
    # round 5: CCNet-style bigram-LM perplexity scoring (fit on the en
    # slice + score every doc: two count aggs, two int-key joins, one
    # per-doc ordered fold)
    "quality_perplexity",
    "cdc_zorder_scan",
    # round 5: bloom-sidecar file skipping, batched point lookup (in-list)
    "cdc_bloom_scan",
    # round 5: bucket-spec evolution — merge through the migration window
    "cdc_rescale",
    # round 5: row-level predicate delete (skipping-scan planned tombstones)
    "cdc_delete_where",
    # round 5: row-level predicate update (same scan-planned shape)
    "cdc_update_where",
    # round 5: general conditional MERGE INTO (clause layer over merge())
    "cdc_merge_into",
    # round 5: shallow clone (metadata-only clone + CoW divergence + the
    # state-invariant maintenance pass, both sides read back)
    "cdc_clone",
    # round 5: metadata tables (per-version answers from manifests only)
    # and the Structured-Streaming change-feed source (Python Data Source
    # API) — the latter times a full stream lifecycle per run
    "cdc_metadata",
    "cdc_stream_feed",
    # round 5: incremental AVG/VARIANCE view via additive sum-of-squares
    # (3 full CDC commits + per-commit view folds inside the query)
    "cdc_ivm_stats",
    # round 5: CHECK constraints — 2 full commits + one REFUSED poison
    # batch (validation piggybacks on the merge's bucket-count job)
    "cdc_constraints",
    # round 5: column rename/drop — metadata-only evolution mid-replay,
    # mixed old/new-physical-name file reads coalesced at scan time
    "cdc_rename_drop",
    # round 5: cherry-pick — branch commit's change-feed slice replayed
    # onto a diverged head (2 commits + branch + DML + feed + pick)
    "cdc_cherry_pick",
]


def bench_cdc_replay(spark, n_events: int, nbuckets: int = 32, n_batches: int = 4) -> dict:
    """flagship: batched CDC replay into a snapshot table; events/s."""
    import shutil
    import tempfile

    from pyetl_spark.cdc import SnapshotTable, change_events

    # tmpfs when available: /tmp goes through gVisor's serialized gofer
    # channel; /dev/shm is the sandbox analog of executor-local NVMe
    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="bench_cdc_", dir=fast)
    try:
        # warmup replay into a throwaway table: the merge stages are
        # distinct codegen classes that pay the sandbox's one-time JIT toll;
        # steady-state is the honest throughput (executors on a real
        # cluster are long-lived).
        wt = SnapshotTable.create(
            spark, os.path.join(root, "warm"), keys=["repo", "path"], nbuckets=nbuckets
        )
        warm = change_events(spark, 100_000, n_repos=2000, paths_per_repo=500, seed=42)
        wt.merge(warm, batch_id="warm:0")
        wt.merge(
            change_events(spark, 200_000, start=100_000, n_repos=2000, paths_per_repo=500, seed=42),
            batch_id="warm:1",
        )

        table = SnapshotTable.create(
            spark, os.path.join(root, "t"), keys=["repo", "path"], nbuckets=nbuckets
        )
        per = n_events // n_batches
        t0 = time.time()
        for b in range(n_batches):
            lo, hi = b * per, (b + 1) * per if b < n_batches - 1 else n_events
            batch = change_events(
                spark, hi, start=lo, n_repos=2000, paths_per_repo=500, seed=42,
                partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            )
            table.merge(batch, batch_id=f"bench:{b}", prune=False)
        dt = time.time() - t0
        rows = table.read().count()
        return {"events": n_events, "sec": round(dt, 2), "events_per_sec": int(n_events / dt), "final_rows": rows}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_incremental(spark, sf_dir: str, n_batches: int = 3) -> dict:
    """the production ingest path (VERDICT r03 #4): replay the documents
    table as ``n_batches`` ordered deliveries through the persistent exact
    and LSH registries — per-batch cost must stay batch-proportional, and a
    throughput regression here must show up in BENCH_rN."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F2

    from pyetl_spark.functions.incremental import IncrementalDedup, IncrementalLsh

    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="bench_inc_", dir=fast)
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        n = docs.count()
        step = n // n_batches + 1
        batches = [
            docs.filter(
                (F2.col("doc_id") >= b * step) & (F2.col("doc_id") < (b + 1) * step)
            )
            for b in range(n_batches)
        ]
        # warmup replay into throwaway roots: the registry merge/probe
        # stages are fresh codegen classes (one-time gVisor JIT toll)
        warm = IncrementalDedup(spark, os.path.join(root, "warm_e"), nbuckets=16)
        warm.ingest(batches[0].limit(200), batch_id="w0")
        warm_l = IncrementalLsh(spark, os.path.join(root, "warm_l"), nbuckets=16)
        warm_l.ingest(batches[0].limit(200), batch_id="w0")

        exact = IncrementalDedup(spark, os.path.join(root, "exact"), nbuckets=16)
        t0 = time.time()
        for b, batch in enumerate(batches):
            exact.ingest(batch, batch_id=f"b{b}")
        exact_sec = time.time() - t0

        lsh = IncrementalLsh(spark, os.path.join(root, "lsh"), nbuckets=16)
        t0 = time.time()
        pairs = 0
        for b, batch in enumerate(batches):
            pairs += lsh.ingest(batch, batch_id=f"b{b}").count()
        lsh_sec = time.time() - t0
        return {
            "docs": n,
            "batches": n_batches,
            "exact_sec": round(exact_sec, 2),
            "exact_docs_per_sec": int(n / exact_sec),
            "lsh_sec": round(lsh_sec, 2),
            "lsh_docs_per_sec": int(n / lsh_sec),
            "lsh_candidate_pairs": pairs,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_ivm_catchup(spark, n_seed: int = 200_000, n_batch: int = 20_000) -> dict:
    """Incremental view maintenance end-to-end at bench scale (VERDICT r04
    #6): a repo-level COUNT/SUM view maintained from the live change feed.
    Reports (a) a 10-batch catch-up (merge → CDF slice → fold), and (b) the
    touched-groups scaling probe — one batch confined to 1% of the repo
    groups vs one spread over ~100% of them, same event count. The apply
    has two components: the CDF slice read (pruned by the BASE buckets the
    merge touched — equal here, since both batches' (repo,path) keys cover
    all base buckets) and the view-state read (pruned by the GROUP buckets
    the delta touches — ~1% of repos hash to a strict subset). So the 1%
    apply must come in under the 100% apply by the state-read share, not by
    100x; the structural guarantee (cost ∝ touched buckets, never view
    size) is what the probe evidences."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F2

    from pyetl_spark.cdc import SnapshotTable, change_events
    from pyetl_spark.cdc.ivm import IncrementalAgg

    N_REPOS = 2000
    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="bench_ivm_", dir=fast)

    def _ev(lo: int, hi: int, **kw) -> "object":
        kw.setdefault("n_repos", N_REPOS)
        kw.setdefault("paths_per_repo", 500)
        df = change_events(spark, hi, start=lo, seed=42, **kw)
        return df.withColumn("bytes", F2.length("content"))

    try:
        # warmup: the merge/CDF/fold stages are fresh codegen classes
        wt = SnapshotTable.create(spark, os.path.join(root, "w"), keys=["repo", "path"], nbuckets=8)
        wt.merge(_ev(0, 5000), batch_id="w0")
        wv = IncrementalAgg(spark, os.path.join(root, "wv"), ["repo"], ["bytes"], nbuckets=8)
        wv.apply(wt.changes(0), batch_id="w0")

        base = SnapshotTable.create(spark, os.path.join(root, "t"), keys=["repo", "path"], nbuckets=64)
        view = IncrementalAgg(spark, os.path.join(root, "v"), ["repo"], ["bytes"], nbuckets=64)
        base.merge(_ev(0, n_seed), batch_id="seed")
        t0 = time.time()
        view.apply(base.changes(0), batch_id="seed")
        initial_sec = time.time() - t0

        # 10-batch live catch-up: each batch merges into the base table and
        # the view folds that commit's feed slice
        lo = n_seed
        t0 = time.time()
        for b in range(10):
            va = base.current_version()
            base.merge(_ev(lo, lo + n_batch), batch_id=f"b{b}")
            view.apply(base.changes(va), batch_id=f"b{b}")
            lo += n_batch
        catchup_sec = time.time() - t0

        def _probe(tag: str, **kw) -> float:
            nonlocal lo
            va = base.current_version()
            base.merge(_ev(lo, lo + n_batch, **kw), batch_id=tag)
            lo += n_batch
            t0 = time.time()
            view.apply(base.changes(va), batch_id=tag)
            return round(time.time() - t0, 3)

        # 1% of groups: events confined to repo indices [0, 20); 100%: the
        # same event count spread uniformly over all 2000 repos. Two
        # alternating reps per leg, best-of (shared-host noise is one-sided
        # — same discipline as bench_scaling.py)
        p1a = _probe("p1a", n_repos=N_REPOS // 100)
        p100a = _probe("p100a", alpha=1.0)
        p1b = _probe("p1b", n_repos=N_REPOS // 100)
        p100b = _probe("p100b", alpha=1.0)
        apply_1pct, apply_100pct = min(p1a, p1b), min(p100a, p100b)
        groups = view.state().count()
        return {
            "seed_events": n_seed,
            "batch_events": n_batch,
            "view_groups": groups,
            "initial_build_sec": round(initial_sec, 2),
            "catchup_10_batches_sec": round(catchup_sec, 2),
            "catchup_events_per_sec": int(10 * n_batch / catchup_sec),
            "apply_1pct_groups_sec": apply_1pct,
            "apply_100pct_groups_sec": apply_100pct,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_mor_commits(spark, n_seed: int = 300_000, n_batch: int = 2_000, n_commits: int = 8) -> dict:
    """Merge-on-read vs copy-on-write commit latency for a streaming tail's
    worst case: SMALL batches whose hash-bucketed keys touch every bucket of
    a LARGE table. COW rewrites the whole touched-bucket data per commit
    (cost ∝ table); MOR appends the in-batch-deduped delta (cost ∝ batch).
    Also reports the MOR read tax (resolved read over the appended versions)
    and the compaction that retires it — the full Iceberg v2 lifecycle."""
    import shutil
    import tempfile

    from pyetl_spark.cdc import SnapshotTable, change_events

    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="bench_mor_", dir=fast)

    def _ev(lo: int, hi: int):
        return change_events(spark, hi, start=lo, n_repos=2000, paths_per_repo=500, seed=42)

    try:
        legs: dict[str, "object"] = {}
        for mode in ("cow", "mor"):
            t = SnapshotTable.create(
                spark, os.path.join(root, mode), keys=["repo", "path"], nbuckets=32
            )
            t.merge(_ev(0, n_seed), batch_id="seed", prune=False)
            legs[mode] = t
        out: dict = {"seed_rows": n_seed, "batch_events": n_batch, "commits": n_commits}
        for mode, t in legs.items():
            lo = n_seed
            t0 = time.time()
            for b in range(n_commits):
                t.merge(_ev(lo, lo + n_batch), batch_id=f"c{b}", mode=mode)
                lo += n_batch
            dt = time.time() - t0
            out[f"{mode}_commits_sec"] = round(dt, 2)
            out[f"{mode}_sec_per_commit"] = round(dt / n_commits, 3)
        mor = legs["mor"]
        t0 = time.time()
        rows = mor.read().count()
        out["mor_resolved_read_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        mor.compact(min_files=2)
        out["mor_compact_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        assert mor.read().count() == rows
        out["post_compact_read_sec"] = round(time.time() - t0, 2)
        out["commit_speedup"] = round(
            out["cow_commits_sec"] / max(out["mor_commits_sec"], 1e-9), 1
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_bloom_lookup(spark, n_events: int = 500_000) -> dict:
    """Bloom-sidecar point lookup vs full filtered read on the same table:
    the key-value-shaped probe a 10^10-row CDC table serves constantly
    ("what is the current content of repo X path Y"). min/max stats can't
    prune a high-cardinality unsorted id, so the full read opens every
    file; blooms open ~1. Reports both latencies and the files_read /
    files_total evidence. Alternating best-of-2 per leg (one-sided
    shared-host noise discipline, as bench_scaling.py)."""
    import shutil
    import tempfile

    from pyetl_spark.cdc import SnapshotTable, change_events

    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="bench_bloom_", dir=fast)
    try:
        ev = change_events(
            spark, n_events, n_repos=2000, paths_per_repo=500, seed=42
        ).withColumn("uid", F.concat_ws("/", "repo", "path"))
        table = SnapshotTable.create(
            spark,
            os.path.join(root, "t"),
            keys=["repo", "path"],
            nbuckets=32,
            props={"bloom_cols": ["uid"], "max_file_rows": max(2000, n_events // 200)},
        )
        table.merge(ev, batch_id="b0", prune=False)
        # 8 probe keys SPREAD across the table (hash-sampled, not limit()'s
        # first-file prefix) so the lookup exercises several buckets' blooms
        probes = [
            r["uid"]
            for r in table.read()
            .select("uid")
            .filter(F.pmod(F.xxhash64("uid"), F.lit(10007)) == 0)
            .limit(8)
            .collect()
        ]

        def _scan() -> float:
            t0 = time.time()
            n = table.scan([("uid", "in", probes)]).count()
            assert n == len(probes)
            return round(time.time() - t0, 3)

        def _full() -> float:
            t0 = time.time()
            n = table.read().filter(F.col("uid").isin(probes)).count()
            assert n == len(probes)
            return round(time.time() - t0, 3)

        _scan(), _full()  # codegen warmup for both plan shapes
        s1, f1, s2, f2 = _scan(), _full(), _scan(), _full()
        scan_sec, full_sec = min(s1, s2), min(f1, f2)
        return {
            "rows": n_events,
            "probes": len(probes),
            "files_total": table.last_scan["files_total"],
            "files_read": table.last_scan["files_read"],
            "bloom_scan_sec": scan_sec,
            "full_filter_sec": full_sec,
            "speedup": round(full_sec / max(scan_sec, 1e-9), 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    fast_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        app_name="pyetl_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            **(
                {"spark.local.dir": f"{fast_dir}/bench_shuffle"} if fast_dir else {}
            ),
        },
    )

    # warmup: pay the one-time JIT/codegen toll outside the timings
    spark.range(1000).select(F.sum(F.col("id") * 2)).collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).collect()

    def _calibration() -> float:
        """fixed CPU-bound probe (hash-agg over 20M generated rows): its
        wall time depends only on host load, never on this repo's code, so
        a contended BENCH run is self-identifying. Idle local[32] ≈ 0.3-0.5s
        (see BASELINE.md); 2x+ that means shared-host noise inflates every
        number in this file's output."""
        t0 = time.time()
        spark.range(20_000_000).select(
            F.count_distinct(F.pmod(F.xxhash64("id"), F.lit(1_000_003)))
        ).collect()
        return round(time.time() - t0, 3)

    _calibration()  # its own codegen warmup
    calib_start = _calibration()

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        # two passes: the first pays this sandbox's one-time per-stage JIT
        # toll (30-70s for a fresh codegen class under gVisor); the second is
        # the steady-state number a long-lived cluster would see. Both are
        # reported; `queries` (the graded figure) is steady-state.
        # One failing query must not lose the whole bench line.
        try:
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.time() - t0, 3)
            # clear persisted intermediates: the timed pass must recompute
            # the full lineage, not read the warmup pass's cache
            spark.catalog.clearCache()
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        finally:
            spark.catalog.clearCache()

    calib_end = _calibration()

    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1000000"))
    # flagship replay runs in a FRESH process/JVM: ~45 prior query executions
    # leave the shared JVM measurably degraded (GC/listener/codegen residue —
    # observed 4-7x slower replay), and a production ingest job gets its own
    # driver anyway.
    spark.stop()
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--replay-worker", str(n_events)],
            capture_output=True,
            text=True,
            timeout=1200,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        worker = json.loads(out.stdout.strip().splitlines()[-1])
        cdc = worker["cdc_replay"]
        incremental = worker.get("incremental_ingest", {})
        ivm = worker.get("ivm_catchup", {})
        mor = worker.get("mor_commits", {})
        bloom = worker.get("bloom_lookup", {})
    except Exception as e:  # noqa: BLE001
        cdc = {"error": f"{type(e).__name__}: {e}"[:200], "sec": 0}
        incremental = {}
        ivm = {}
        mor = {}
        bloom = {}

    # headline total stays queries + flagship replay (comparable across
    # rounds); the incremental tier is reported alongside in extras
    total = round(sum(timings.values()) + cdc["sec"], 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "extras": {
                    "cdc_replay": cdc,
                    "incremental_ingest": incremental,
                    "ivm_catchup": ivm,
                    "mor_commits": mor,
                    "bloom_lookup": bloom,
                    "cpus": int(cpus),
                    "calibration": {"start_sec": calib_start, "end_sec": calib_end},
                    "cold_first_run": cold,
                    **({"errors": errors} if errors else {}),
                },
            },
        ),
        flush=True,
    )


def _replay_worker(n_events: int) -> None:
    """Fresh-JVM flagship replay + incremental-registry tier (invoked by
    main via subprocess — a long query session measurably degrades a shared
    JVM, and the production ingest jobs get their own drivers anyway)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fast_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        app_name="pyetl_spark_bench_cdc",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            **({"spark.local.dir": f"{fast_dir}/bench_shuffle"} if fast_dir else {}),
        },
    )
    out = {"cdc_replay": bench_cdc_replay(spark, n_events)}
    try:
        # a failure in the secondary tier must not lose the flagship number
        out["incremental_ingest"] = bench_incremental(spark, sf_dir)
    except Exception as e:  # noqa: BLE001
        out["incremental_ingest"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    try:
        out["ivm_catchup"] = bench_ivm_catchup(spark)
    except Exception as e:  # noqa: BLE001
        out["ivm_catchup"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    try:
        out["mor_commits"] = bench_mor_commits(spark)
    except Exception as e:  # noqa: BLE001
        out["mor_commits"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    try:
        out["bloom_lookup"] = bench_bloom_lookup(spark)
    except Exception as e:  # noqa: BLE001
        out["bloom_lookup"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--replay-worker":
        _replay_worker(int(sys.argv[2]))
    else:
        main()
