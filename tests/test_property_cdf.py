"""Property test for the change-data-feed (VERDICT r04 #5).

Randomized op sequences — merge (upsert/delete mixes, stale and in-batch
duplicate seqs, random copy-on-write vs merge-on-read commit modes),
compact, rollback, expire — are driven against a
:class:`SnapshotTable` and, in lockstep, against a sequential dict oracle
that models LWW state per version plus the parent lineage. After each
sequence, for every retained adjacent ``(parent, v]`` pair on the current
lineage AND for the widest fully-retained range, the feed emitted by
``SnapshotTable.changes`` must equal the oracle's live-state diff exactly
(key, change type, commit version, and both pre- and post-image values),
and the final table read must equal the oracle's live state.

This is adversarial input for the trickiest CDF edges (tombstone-first
keys, tombstone refreshes, stale events losing LWW, pure-rewrite commits,
post-rollback divergent lineages, expired intermediates).

Sequence count: ``PYETL_CDF_SEQUENCES`` (default 48 for the routine suite;
the certified full run uses 200 — see COVERAGE.md). Sequences run in
parallel threads: each drives its own table directory, and Spark job
submission is thread-safe, so wall time is bounded by jobs/threads rather
than jobs.
"""

from __future__ import annotations

import os
import random
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc import cdf_source  # noqa: E402
from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402

N_SEQUENCES = int(os.environ.get("PYETL_CDF_SEQUENCES", "48"))
# the table_changes source (streaming + batch share one planner and one
# executor-side diff) gets its own adversarial pass: fewer seeds, same
# oracle — cdf_source must agree with the dict oracle wherever changes()
# does, including MOR dirty buckets, rollback-forked lineages and expiry
N_SOURCE_SEQUENCES = int(os.environ.get("PYETL_CDF_SOURCE_SEQUENCES", "12"))
KEYS = list(range(6))


def _oracle_merge(state: dict, events: list[tuple]) -> dict:
    """Apply one delta to a state dict {k: (val, seq, deleted)} with the
    same semantics as merge(): in-batch LWW then cross-snapshot LWW,
    tombstones retained, stale events dropped."""
    winners: dict = {}
    for k, val, op, seq in events:
        if k not in winners or seq > winners[k][2]:
            winners[k] = (val, op, seq)
    out = dict(state)
    for k, (val, op, seq) in winners.items():
        cur = out.get(k)
        if cur is None or seq > cur[1]:
            out[k] = (val, seq, op == "delete")
    return out


def _live(state: dict) -> dict:
    return {k: (v, s) for k, (v, s, dead) in state.items() if not dead}


def _expected_diff(parent: dict, child: dict, version: int) -> set:
    """Oracle feed rows for one commit: diff of LIVE rows between adjacent
    states, as (k, val, _change_type, _commit_version) tuples."""
    a, b = _live(parent), _live(child)
    rows = set()
    for k in a.keys() | b.keys():
        if k not in a and k in b:
            rows.add((k, b[k][0], "insert", version))
        elif k in a and k not in b:
            rows.add((k, a[k][0], "delete", version))
        elif a[k][1] != b[k][1]:
            rows.add((k, a[k][0], "update_preimage", version))
            rows.add((k, b[k][0], "update_postimage", version))
    return rows


def _run_sequence(spark, root: str, seed: int, use_format_reader: bool = False) -> None:
    rng = random.Random(seed)
    t = SnapshotTable.create(
        spark, os.path.join(root, f"t{seed}"), keys=["k"], nbuckets=rng.choice([1, 2, 4])
    )
    states: dict[int, dict] = {0: {}}
    parents: dict[int, int] = {}
    current = 0
    seq_counter = [2]  # even seqs; odd ones are reserved for stale events
    merge_counter = [0]  # contiguous per-sequence ids, exercising the HWM path

    def do_merge() -> None:
        nonlocal current
        events = []
        for _ in range(rng.randint(1, 4)):
            k = rng.choice(KEYS)
            op = "delete" if rng.random() < 0.3 else "upsert"
            cur = states[current].get(k)
            if cur is not None and cur[1] > 3 and rng.random() < 0.25:
                seq = cur[1] - 1  # odd, unused, strictly below the winner: stale
            else:
                seq = seq_counter[0]
                seq_counter[0] += 2
            events.append((k, f"v{seq}", op, seq))
        if rng.random() < 0.2 and events:  # in-batch duplicate key
            k, _, _, _ = rng.choice(events)
            seq = seq_counter[0]
            seq_counter[0] += 2
            events.append((k, f"v{seq}", "upsert", seq))
        df = spark.createDataFrame(events, ["k", "val", "op", "seq"])
        merge_counter[0] += 1
        # commit strategy is part of the adversarial surface: merge-on-read
        # appends (read-time LWW resolution) interleave with copy-on-write
        # rewrites; the oracle is mode-oblivious because the visible state
        # and the feed must be too
        mode = rng.choice(["cow", "mor", "mor"])
        stats = t.merge(df, f"s{seed}-m{merge_counter[0]}", mode=mode)
        assert not stats.skipped, f"seed={seed} fresh batch id wrongly skipped"
        states[stats.version] = _oracle_merge(states[current], events)
        parents[stats.version] = current
        current = stats.version

    def do_compact() -> None:
        nonlocal current
        out = t.compact(min_files=1)
        if out["compacted_buckets"]:
            v = t.current_version()
            states[v] = states[current]
            parents[v] = current
            current = v

    def chain(v: int) -> list[int]:
        c = [v]
        while c[-1] in parents:
            c.append(parents[c[-1]])
        return c  # v .. 0

    def do_rollback() -> None:
        nonlocal current
        anc = [v for v in chain(current)[1:] if os.path.exists(t._manifest_path(v))]
        if anc:
            v = rng.choice(anc)
            t.rollback(v)
            current = v

    do_merge()  # every sequence has at least one commit
    for _ in range(rng.randint(3, 5)):
        r = rng.random()
        if r < 0.65:
            do_merge()
        elif r < 0.78:
            do_compact()
        elif r < 0.9:
            do_rollback()
        else:
            t.expire_snapshots(keep_last=rng.randint(1, 3))

    lineage = list(reversed(chain(current)))  # root .. current
    retained = [v for v in lineage if os.path.exists(t._manifest_path(v))]
    if len(retained) < 2:
        # an aggressive trailing expire can retain only `current`; append one
        # more commit so the sequence always ends with a verifiable edge
        do_merge()
        lineage = list(reversed(chain(current)))
        retained = [v for v in lineage if os.path.exists(t._manifest_path(v))]

    # ---- verify: the feed equals the oracle diff on every retained edge

    def feed(va: int, vb: int) -> set:
        df = (
            cdf_source.read_changes(
                spark, t.root, startingVersion=va, endingVersion=vb
            )
            if use_format_reader
            else t.changes(va, vb)
        )
        return {
            (r["k"], r["val"], r["_change_type"], r["_commit_version"])
            for r in df.collect()
        }

    checked = 0
    for i, v in enumerate(lineage[1:], start=1):
        pa = lineage[i - 1]
        if pa in retained and v in retained:
            assert feed(pa, v) == _expected_diff(states[pa], states[v], v), (
                f"seed={seed} adjacent ({pa},{v}]"
            )
            checked += 1

    # widest fully-retained suffix range (changes() needs every intermediate)
    lo = len(lineage) - 1
    while lo > 0 and lineage[lo - 1] in retained:
        lo -= 1
    va, vb = lineage[lo], current
    if va != vb:
        expect = set()
        for i in range(lo + 1, len(lineage)):
            expect |= _expected_diff(
                states[lineage[i - 1]], states[lineage[i]], lineage[i]
            )
        assert feed(va, vb) == expect, f"seed={seed} range ({va},{vb}]"
        checked += 1
    assert checked > 0, f"seed={seed} produced no verifiable edge"

    # final table read state == oracle live state
    read = t.read()
    got = (
        {(r["k"], r["val"]) for r in read.select("k", "val").collect()}
        if read is not None
        else set()
    )
    assert got == {(k, v) for k, (v, _) in _live(states[current]).items()}, (
        f"seed={seed} final state"
    )


def test_cdf_random_sequences_match_dict_oracle(spark, tmp_path):
    root = str(tmp_path)
    with ThreadPoolExecutor(max_workers=8) as ex:
        futures = [
            ex.submit(_run_sequence, spark, root, seed)
            for seed in range(N_SEQUENCES)
        ]
        for f in futures:
            f.result()  # re-raise the first failing sequence's assertion


def test_table_changes_source_matches_dict_oracle(spark, tmp_path):
    root = str(tmp_path)
    with ThreadPoolExecutor(max_workers=8) as ex:
        futures = [
            ex.submit(_run_sequence, spark, root, 1000 + seed, True)
            for seed in range(N_SOURCE_SEQUENCES)
        ]
        for f in futures:
            f.result()
