"""Property test for the change-data-feed (VERDICT r04 #5).

Randomized op sequences — merge (upsert/delete mixes, stale and in-batch
duplicate seqs, random copy-on-write vs merge-on-read commit modes),
merge_into (random conditional update/delete/insert clauses, oracle
mirroring the engine's bucket-pruned next-seq rule), delete_where /
update_where (predicate DML at global max_seq+1, oracle mirroring the
scan-over-visible-rows semantics), alter_props
(metadata-only layout commits, feed-silent), compact, rollback, expire —
are driven against a
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
    nb = rng.choice([1, 2, 4])
    t = SnapshotTable.create(
        spark, os.path.join(root, f"t{seed}"), keys=["k"], nbuckets=nb
    )
    # key → bucket map (engine hash), so the oracle can mirror merge_into's
    # bucket-pruned next-seq computation exactly
    from pyspark.sql import functions as F

    bmap = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in KEYS], "k long")
        .select("k", F.pmod(F.xxhash64("k"), F.lit(nb)).cast("int").alias("b"))
        .collect()
    }
    states: dict[int, dict] = {0: {}}
    parents: dict[int, int] = {}
    current = 0
    # payload column name per version: do_rename flips it between val/val2
    # (metadata-only, feed-silent); the oracle stores values name-free and
    # the verification reads the name as of each feed's ENDING version
    cname = "val"
    names: dict[int, str] = {0: "val"}
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
        df = spark.createDataFrame(events, ["k", cname, "op", "seq"])
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
        names[current] = cname

    def do_merge_into() -> None:
        """Random conditional MERGE INTO (NEW r5): matched & act='d' →
        DELETE, matched else → UPDATE val := s.val, unmatched & act≠'d' →
        INSERT. The oracle mirrors the engine's sequencing rule — emitted
        rows get one past the TOUCHED buckets' max stored seq (sound
        because a key's rows only live in its own bucket)."""
        nonlocal current
        picks: dict = {}
        for _ in range(rng.randint(1, 3)):
            k = rng.choice(KEYS)
            seqv = seq_counter[0]
            seq_counter[0] += 2
            picks[k] = (f"v{seqv}", "d" if rng.random() < 0.3 else "u")
        src = spark.createDataFrame(
            [(k, v, a) for k, (v, a) in picks.items()], ["k", cname, "act"]
        )
        merge_counter[0] += 1
        stats = t.merge_into(
            src,
            when_matched_update={cname: f"s.{cname}"},
            when_matched_delete="s.act = 'd'",
            when_not_matched_insert={cname: f"s.{cname}"},
            not_matched_condition="s.act <> 'd'",
            batch_id=f"s{seed}-mi{merge_counter[0]}",
        )
        assert not stats.skipped, f"seed={seed} fresh merge_into wrongly skipped"
        touched = {bmap[k] for k in picks}
        tmax = max(
            (s for k, (_, s, _dead) in states[current].items() if bmap[k] in touched),
            default=-1,
        )
        nseq = tmax + 1
        new = dict(states[current])
        for k, (val, act) in picks.items():
            cur = new.get(k)
            visible = cur is not None and not cur[2]
            if visible and act == "d":
                new[k] = (cur[0], nseq, True)  # tombstone keeps t's payload
            elif visible:
                new[k] = (val, nseq, False)  # update
            elif act != "d":
                new[k] = (val, nseq, False)  # insert
            # absent/tombstoned & act='d': no clause applies, no row
        states[stats.version] = new
        parents[stats.version] = current
        current = stats.version
        names[current] = cname

    def do_delete_where() -> None:
        """Predicate delete (NEW r5): visible rows matching k >= K are
        tombstoned at max_seq+1. Oracle mirrors the global-max sequencing
        (max over ALL stored rows incl. tombstones, like read_raw)."""
        nonlocal current
        kmin = rng.choice(KEYS)
        merge_counter[0] += 1
        stats = t.delete_where(
            [("k", ">=", kmin)], batch_id=f"s{seed}-dw{merge_counter[0]}"
        )
        if stats.skipped:  # empty-root guard: no commit, lineage unchanged
            return
        nseq = max(
            (s for (_v, s, _d) in states[current].values()), default=-1
        ) + 1
        new = dict(states[current])
        for k, (val, s, dead) in list(new.items()):
            if not dead and k >= kmin:
                new[k] = (val, nseq, True)
        states[stats.version] = new
        parents[stats.version] = current
        current = stats.version
        names[current] = cname

    def do_update_where() -> None:
        """Predicate update (NEW r5): visible rows matching k < K get
        val := concat(val, '+') re-emitted at max_seq+1 — every matching
        row bumps seq, so the feed must carry a pre/post pair for each."""
        nonlocal current
        kmax = rng.choice(KEYS)
        merge_counter[0] += 1
        stats = t.update_where(
            {cname: f"concat({cname}, '+')"},
            [("k", "<", kmax)],
            batch_id=f"s{seed}-uw{merge_counter[0]}",
        )
        if stats.skipped:  # empty-root guard: no commit, lineage unchanged
            return
        nseq = max(
            (s for (_v, s, _d) in states[current].values()), default=-1
        ) + 1
        new = dict(states[current])
        for k, (val, s, dead) in list(new.items()):
            if not dead and k < kmax:
                new[k] = (val + "+", nseq, False)
        states[stats.version] = new
        parents[stats.version] = current
        current = stats.version
        names[current] = cname

    def do_alter() -> None:
        """Metadata-only layout-prop commit (NEW r5): state identical, the
        feed must be silent across the edge."""
        nonlocal current
        spec = rng.choice(
            [
                {"max_file_rows": rng.choice([4, 8, 16])},
                {"merge_mode": rng.choice(["cow", "mor"])},
                {"stats_cols": [cname]},
            ]
        )
        v = t.alter_props(spec)
        states[v] = states[current]
        parents[v] = current
        current = v
        names[v] = cname

    def do_compact() -> None:
        nonlocal current
        out = t.compact(min_files=1)
        if out["compacted_buckets"]:
            v = t.current_version()
            states[v] = states[current]
            parents[v] = current
            current = v
            names[v] = cname

    def chain(v: int) -> list[int]:
        c = [v]
        while c[-1] in parents:
            c.append(parents[c[-1]])
        return c  # v .. 0

    def do_rollback() -> None:
        nonlocal current, cname
        anc = [v for v in chain(current)[1:] if os.path.exists(t._manifest_path(v))]
        if anc:
            v = rng.choice(anc)
            t.rollback(v)
            current = v
            cname = names[v]  # a pre-rename version restores the old name

    def do_rename() -> None:
        """Metadata-only column rename (NEW r5): state identical under the
        new name, feed silent across the edge, mixed-physical-name files
        coalesced by every later read. A refusal (target still in retained
        history after a rename-back, or schema-less post-rollback root) is
        a legal no-op."""
        nonlocal current, cname
        new = "val2" if cname == "val" else "val"
        try:
            v = t.rename_column(cname, new)
        except ValueError:
            return
        cname = new
        states[v] = states[current]
        parents[v] = current
        current = v
        names[v] = cname

    do_merge()  # every sequence has at least one commit
    for _ in range(rng.randint(3, 5)):
        r = rng.random()
        if r < 0.42:
            do_merge()
        elif r < 0.52:
            do_merge_into()
        elif r < 0.60:
            do_delete_where()
        elif r < 0.68:
            do_update_where()
        elif r < 0.76:
            do_compact()
        elif r < 0.84:
            do_rollback()
        elif r < 0.89:
            do_alter()
        elif r < 0.94:
            do_rename()
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
        col = names[vb]  # the feed anchors at the ENDING version's names
        return {
            (r["k"], r[col], r["_change_type"], r["_commit_version"])
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

    # final table read state == oracle live state. A sequence can end on a
    # rollback to the create version followed only by metadata commits —
    # the table is then schema-less (keys-only read) and must be empty.
    read = t.read()
    got = (
        {(r["k"], r[cname]) for r in read.select("k", cname).collect()}
        if read is not None and cname in read.columns
        else set()
    )
    assert got == {(k, v) for k, (v, _) in _live(states[current]).items()}, (
        f"seed={seed} final state"
    )

    # metadata fsck holds after EVERY op sequence: pointer/ref retention,
    # referenced-file existence, stats liveness, ledger bounds (orphans
    # from rollback-then-diverge are reported, never an issue)
    rep = t.verify(all_versions=True)
    assert rep["ok"], f"seed={seed} fsck: {rep['issues']}"


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
