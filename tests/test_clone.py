"""Shallow clone (SnapshotTable.clone — Delta SHALLOW CLONE analog):
metadata-only clones that share source data files, diverge copy-on-write,
and can never damage the source."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _delta(spark, rows):
    return spark.createDataFrame(rows, ["k", "val", "op", "seq"])


def _state(t, version=None):
    df = t.read(version=version)
    return {} if df is None else {r["k"]: r["val"] for r in df.collect()}


@pytest.fixture()
def source(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "src"), keys=["k"], nbuckets=4)
    t.merge(_delta(spark, [(1, "a", "upsert", 1), (2, "b", "upsert", 2)]), "b1")
    t.merge(_delta(spark, [(3, "c", "upsert", 3), (1, "a2", "upsert", 4)]), "b2")
    return t


def test_clone_reads_source_state_without_copying(source, spark, tmp_path):
    c = source.clone(str(tmp_path / "c"))
    assert _state(c) == _state(source) == {1: "a2", 2: "b", 3: "c"}
    # zero data files copied: the clone's data dir is empty, its manifest
    # points into the source
    assert os.listdir(os.path.join(c.root, "data")) == []
    src_data = os.path.abspath(os.path.join(source.root, "data"))
    for fs in c.manifest()["buckets"].values():
        for f in fs:
            assert os.path.abspath(f).startswith(src_data)
    assert c.verify()["ok"]
    s = c.manifest()["summary"]
    assert s["operation"] == "clone" and s["source_version"] == 2


def test_time_travel_clone(source, spark, tmp_path):
    c = source.clone(str(tmp_path / "c"), version=1)
    assert _state(c) == {1: "a", 2: "b"}


def test_clone_refuses_existing_dest(source, tmp_path):
    source.clone(str(tmp_path / "c"))
    with pytest.raises(ValueError, match="already exists"):
        source.clone(str(tmp_path / "c"))


def test_divergence_is_cow_and_isolated(source, spark, tmp_path):
    c = source.clone(str(tmp_path / "c"))
    c.merge(_delta(spark, [(2, "B!", "upsert", 10), (4, "d", "upsert", 11)]), "cb1")
    # clone diverged, source untouched
    assert _state(c) == {1: "a2", 2: "B!", 3: "c", 4: "d"}
    assert _state(source) == {1: "a2", 2: "b", 3: "c"}
    # new files live under the clone root; untouched buckets still source-shared
    roots = set()
    for fs in c.manifest()["buckets"].values():
        for f in fs:
            roots.add(os.path.abspath(f).startswith(os.path.abspath(c.root)))
    assert roots == {True, False}
    # the clone's own change feed starts at the clone point
    feed = {(r["k"], r["_change_type"]) for r in c.changes(0).collect()}
    assert feed == {(2, "update_preimage"), (2, "update_postimage"), (4, "insert")}


def test_ledger_resets_on_clone(source, spark, tmp_path):
    """A batch id the SOURCE committed must still apply to the clone (a
    clone is a new sink — Delta drops txn metadata on clone too)."""
    c = source.clone(str(tmp_path / "c"))
    assert c.committed_batches() == {}
    c.merge(_delta(spark, [(9, "z", "upsert", 99)]), "b1")  # same id as source's
    assert _state(c)[9] == "z"
    # and redelivery to the CLONE is still a no-op
    v = c.current_version()
    c.merge(_delta(spark, [(9, "zz", "upsert", 100)]), "b1")
    assert c.current_version() == v and _state(c)[9] == "z"


def test_clone_expiry_never_reclaims_source_files(source, spark, tmp_path):
    c = source.clone(str(tmp_path / "c"))
    # rewrite every bucket in the clone so no source file is referenced by
    # the clone's CURRENT version anymore
    c.merge(
        _delta(
            spark,
            [(1, "x", "upsert", 20), (2, "y", "upsert", 21), (3, "z", "upsert", 22)],
        ),
        "cb1",
    )
    c.merge(_delta(spark, [(1, "x2", "upsert", 23)]), "cb2")
    c.expire_snapshots(keep_last=1)
    # source remains fully intact and readable
    assert source.verify(all_versions=True)["ok"]
    assert _state(source) == {1: "a2", 2: "b", 3: "c"}
    assert _state(c) == {1: "x2", 2: "y", 3: "z"}


def test_compact_fully_dereferences_source(source, spark, tmp_path):
    c = source.clone(str(tmp_path / "c"))
    c.merge(_delta(spark, [(1, "q", "upsert", 30)]), "cb1")
    c.compact(min_files=1)
    croot = os.path.abspath(c.root)
    for fs in c.manifest()["buckets"].values():
        for f in fs:
            assert os.path.abspath(f).startswith(croot)
    assert _state(c) == {1: "q", 2: "b", 3: "c"}
    assert c.verify()["ok"]


def test_clone_missing_source_file_refused(source, spark, tmp_path):
    m = source.manifest()
    victim = next(f for fs in m["buckets"].values() for f in fs)
    os.rename(victim, victim + ".hidden")
    try:
        with pytest.raises(ValueError, match="missing files"):
            source.clone(str(tmp_path / "c"))
    finally:
        os.rename(victim + ".hidden", victim)


def test_clone_property_random_divergence(spark, tmp_path):
    """Property: clone at a random retained version, then evolve source and
    clone independently with random upsert/delete batches — each side must
    match its own sequential dict oracle (LWW, tombstones), fscks stay
    green, and maintenance on either side never perturbs the other."""
    import random

    KEYS = list(range(8))

    def apply(state, events):
        winners = {}
        for k, val, op, seq in events:
            if k not in winners or seq > winners[k][2]:
                winners[k] = (val, op, seq)
        out = dict(state)
        for k, (val, op, seq) in winners.items():
            cur = out.get(k)
            if cur is None or seq > cur[1]:
                out[k] = (val, seq, op == "delete")
        return out

    def live(state):
        return {k: v for k, (v, s, dead) in state.items() if not dead}

    for seed in range(6):
        rng = random.Random(1000 + seed)
        t = SnapshotTable.create(
            spark, str(tmp_path / f"s{seed}"), keys=["k"], nbuckets=rng.choice([2, 4])
        )
        seqc = [1]
        states = {0: {}}

        def batch(rng, seqc):
            ev = []
            for _ in range(rng.randint(1, 4)):
                k = rng.choice(KEYS)
                op = "delete" if rng.random() < 0.3 else "upsert"
                ev.append((k, f"v{seqc[0]}", op, seqc[0]))
                seqc[0] += 1
            return ev

        def merge(t, ev, bid):
            df = spark.createDataFrame(ev, ["k", "val", "op", "seq"])
            return t.merge(df, bid).version

        src_state = {}
        for i in range(rng.randint(1, 3)):
            ev = batch(rng, seqc)
            src_state = apply(src_state, ev)
            states[merge(t, ev, f"b{i}")] = src_state
        clone_at = rng.choice(sorted(states))
        c = t.clone(str(tmp_path / f"c{seed}"), version=clone_at)
        clone_state = states[clone_at]

        for i in range(rng.randint(1, 3)):
            ev = batch(rng, seqc)
            if rng.random() < 0.5:
                src_state = apply(src_state, ev)
                merge(t, ev, f"sb{i}")
                if rng.random() < 0.4:
                    t.compact(min_files=1)
            else:
                clone_state = apply(clone_state, ev)
                merge(c, ev, f"cb{i}")
                if rng.random() < 0.4:
                    c.compact(min_files=1)
                    c.expire_snapshots(keep_last=1)

        assert _state(t) == live(src_state), f"seed {seed} source diverged"
        assert _state(c) == live(clone_state), f"seed {seed} clone diverged"
        assert t.verify(all_versions=True)["ok"], f"seed {seed} source fsck"
        assert c.verify()["ok"], f"seed {seed} clone fsck"
