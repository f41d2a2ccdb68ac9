"""Incremental (CDC-shaped) deduplication: a persistent fingerprint
registry, so a continuously-ingesting corpus checks each NEW batch against
the store instead of re-deduplicating 100 TB of history per delivery.

The batch operators in ``dedup`` answer "what is duplicated in this
DataFrame"; a training-data ingest pipeline asks a different question —
"which of TODAY's documents are novel against everything ever accepted".
The registry is a :class:`~pyetl_spark.cdc.tableio.SnapshotTable` keyed on
the content fingerprint, which buys the same properties the CDC MERGE path
already certifies: atomic commits, a batch ledger (re-delivered batches are
skipped), snapshot expiry/compaction, and bucket layout independent of
cluster size.

Three tiers:

- **exact** (`IncrementalDedup`): fingerprint = md5 over normalized text
  (identical to ``dedup.exact_dedup`` and SQL-recomputable). One hash-agg
  for within-batch first-wins, one anti-join against the store (both keyed
  on fp — co-shuffled), one MERGE of the novel rows.
- **near-dup** (`IncrementalLsh`): the store holds (band_idx, band_hash →
  doc ids), bucketed by the band key; a new batch reads only the store
  buckets its band keys hash into, so cost scales with the batch and its
  collision slice, never with corpus size. (Same banding math as
  ``dedup.minhash_lsh_pairs``.)
- **embedding** (`IncrementalAnn`): same registry discipline over random-
  hyperplane sign signatures — the CDC tier of ``similarity``'s blocked
  k-NN (candidate neighbour pairs of each batch against all history).

Scale notes (100 TB): the registry is fingerprints + ids only — a few
hundred bytes per document, ~1-2% of corpus bytes; both the anti-join and
the MERGE touch only the buckets the batch's fingerprints hash into.
At-least-once replays: ``merge`` consults the ledger, so a re-delivered
batch cannot double-insert, and ``ingest``'s accepted set is computed
against the POST-merge registry, so a replay returns the identical rows —
idempotent end state AND idempotent return value. Use inside
``foreachBatch`` with the streaming batch id for exactly-once.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.cdc.tableio import SnapshotTable
from pyetl_spark.functions.text import fingerprint_md5

log = logging.getLogger(__name__)


def _oversize_buckets(
    src: DataFrame, bucket_key: list[str], max_bucket: int, side: str
) -> DataFrame | None:
    """collect the bucket KEYS whose population exceeds ``max_bucket`` (one
    tiny job — the aggregate holds sizes, never members; the result is at
    most a handful of degenerate keys) and log the drop. Returns a literal
    DataFrame of those keys for an anti-join, or None when every bucket is
    sane — the common case, which then costs the main join NOTHING."""
    big = (
        src.groupBy(*bucket_key)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > max_bucket)
        .select(*bucket_key)
    )
    rows = big.collect()
    if not rows:
        return None
    log.warning(
        "incremental registry: dropping %d %s bucket(s) larger than "
        "max_bucket=%d (degenerate/boilerplate content; raise max_bucket "
        "to keep them)",
        len(rows),
        side,
        max_bucket,
    )
    return big.sparkSession.createDataFrame(rows, big.schema)


def _candidate_pairs(
    table: SnapshotTable,
    keys: DataFrame,
    bucket_key: list[str],
    member_col: str,
    max_bucket: int | None,
) -> DataFrame:
    """shared banding-candidate stage for the LSH and ANN registries:
    within-batch + against-history collision pairs on ``bucket_key``,
    canonicalized to ``(a, b)`` with ``a < b`` — sorted member ids, never
    self-pairs, replay-idempotent (a pair arrives in one orientation only
    regardless of which side was the batch and which the history).

    Degenerate buckets are capped on BOTH sides (log-and-drop, never
    silent; ``max_bucket=None`` disables the cap — the oracle-replay
    configuration): store buckets larger than ``max_bucket`` are dropped
    from the history probe, and batch buckets larger than ``max_bucket``
    are dropped from the within-batch self-join — without the latter, one
    boilerplate-heavy delivery (500 identical headers → one band bucket)
    quadratically explodes its OWN self-join no matter how clean the store
    is. Batch-vs-history output is linear in the batch (≤ |batch| ×
    max_bucket), so the batch cap applies only to the self-join. Cost
    shape: one sizes aggregate per side (≤ a few result rows collected);
    when nothing exceeds the cap — the steady state — the pair join itself
    carries no extra operator at all.

    The history probe is bucket-pruned ONLY when the store was created with
    ``bucket_cols == bucket_key`` — a legacy store bucketed by its full row
    key (member id included) would scatter one band bucket across all
    nbuckets, and pruning by the batch's ids would silently miss ~(1-1/n)
    of history collisions; such stores fall back to a full scan."""
    new = keys.select(*bucket_key, F.col(member_col).alias("new_id"))

    history = None
    m = table.manifest()
    if m["buckets"]:
        if m.get("bucket_cols") == bucket_key:
            probe = table.resolved_raw(buckets=table.bucket_ids(keys))
        else:  # legacy / foreign bucketing: pruning would drop collisions
            probe = table.resolved_raw()
        if probe is not None:
            history = (
                probe.filter(~F.col("_deleted"))
                .select(*bucket_key, F.col(member_col).alias("old_id"))
                .join(new.select(*bucket_key).distinct(), bucket_key, "left_semi")
            )

    bounded_new = new
    if max_bucket is not None:
        big = _oversize_buckets(keys, bucket_key, max_bucket, "within-batch")
        if big is not None:
            bounded_new = new.join(F.broadcast(big), bucket_key, "left_anti")
    within = (
        bounded_new.alias("l")
        .join(
            bounded_new.select(*bucket_key, F.col("new_id").alias("old_id")).alias("r"),
            bucket_key,
        )
        .where(F.col("new_id") > F.col("old_id"))
    )
    if history is not None:
        bounded = history
        if max_bucket is not None:
            big = _oversize_buckets(history, bucket_key, max_bucket, "store")
            if big is not None:
                bounded = history.join(F.broadcast(big), bucket_key, "left_anti")
        against = new.join(bounded, bucket_key).where(
            F.col("new_id") != F.col("old_id")
        )
        pairs = within.unionByName(against)
    else:
        pairs = within
    return pairs.select(
        F.least("new_id", "old_id").alias("a"),
        F.greatest("new_id", "old_id").alias("b"),
        "band_idx",
    ).distinct()


def _check_registry_props(table: SnapshotTable, kind: str, cfg: dict) -> None:
    """refuse to open a registry with parameters incompatible with the ones
    it was created with (ADVICE r03): band keys computed under different
    n_hashes/bands/k_shingle/hash_family (or dim/bits/seed) never collide
    with the stored history, so every probe would silently return "no
    near-dups". The config is persisted in the SnapshotTable manifest at
    create time; legacy stores without it get a warning and are trusted."""
    stored = table.props()
    if not stored:
        log.warning(
            "%s registry at %s predates banding-config persistence; cannot "
            "validate parameters %s against the store — history probes are "
            "only correct if they match the creating job's",
            kind,
            table.root,
            cfg,
        )
        return
    mismatch = {k: (stored.get(k), v) for k, v in cfg.items() if stored.get(k) != v}
    if mismatch:
        raise ValueError(
            f"{kind} registry at {table.root} was created with "
            f"{ {k: s for k, (s, _) in mismatch.items()} } but reopened with "
            f"{ {k: g for k, (_, g) in mismatch.items()} }; incompatible band "
            "keys would silently miss every stored near-dup. Reopen with the "
            "original parameters or create a new registry root."
        )


class _RegistryMaintenance:
    """shared housekeeping for long-lived registries (all hold ``self.table``)."""

    table: SnapshotTable

    def maintain(self, keep_last: int = 2, min_files: int = 2) -> dict:
        """periodic housekeeping: every ingest is a copy-on-write MERGE, so
        without expiry the store accumulates one obsolete copy of each
        touched bucket per batch. Compacts fragmented buckets, then expires
        all but the last ``keep_last`` snapshots."""
        compacted = self.table.compact(min_files=min_files)
        expired = self.table.expire_snapshots(keep_last=keep_last)
        return {"compacted": compacted, "expired": expired}


class IncrementalDedup(_RegistryMaintenance):
    """persistent exact-dedup registry (content fingerprint, first-wins)."""

    def __init__(self, spark: SparkSession, root: str, nbuckets: int = 32):
        self.spark = spark
        table_root = os.path.join(root, "fingerprints")
        if SnapshotTable.exists(table_root):
            self.table = SnapshotTable(spark, table_root)
        else:
            self.table = SnapshotTable.create(
                spark, table_root, keys=["fp"], nbuckets=nbuckets
            )

    def ingest(
        self,
        docs: DataFrame,
        batch_id: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """register a batch; return its ACCEPTED rows as (doc_id, fp) — the
        batch's rows that are the stored representative of their
        fingerprint. Within the batch the minimum id wins (deterministic
        under any partitioning); across batches the store wins — a
        fingerprint ever accepted is never re-accepted.

        The return value is **idempotent under replay and closed under
        re-delivery**: each registry row records the batch that accepted it
        (``src_batch``), and the return is the post-merge registry slice
        whose ``src_batch`` is THIS batch id. A re-delivered epoch
        (at-least-once foreachBatch, or a checkpoint-wipe full replay) gets
        the identical accepted set back — so a per-epoch overwrite sink
        converges on retry — while the same document arriving again under a
        NEW batch id returns nothing (its row belongs to the original
        batch): the accepted corpus can never contain a document twice."""
        fps = docs.select(
            F.col(id_col).alias("doc_id"), fingerprint_md5(F.col(text_col)).alias("fp")
        )
        firsts = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        m = self.table.manifest()
        replayed = self.table.is_committed(batch_id, manifest=m)
        novel = firsts
        if m["buckets"]:  # empty-store check is driver-side (manifest), not a job
            novel = firsts.join(self.table.read().select("fp"), "fp", "left_anti")
        novel = novel.localCheckpoint(eager=True)  # merge runs 2 jobs over it
        self.table.merge(
            novel.select(
                "fp",
                "doc_id",
                F.lit(str(batch_id)).alias("src_batch"),
                F.lit("upsert").alias("op"),
                F.col("doc_id").alias("seq"),
            ),
            batch_id=batch_id,
        )
        post = self.table.read()  # post-merge registry: who accepted each fp, and when
        if "src_batch" not in post.columns:  # registry predates src_batch tracking
            if replayed:  # pre-upgrade epoch: its reps ARE the stored rows
                return firsts.join(post, ["fp", "doc_id"], "left_semi").select("doc_id", "fp")
            return novel.select("doc_id", "fp")
        mine = post.filter(F.col("src_batch") == str(batch_id))
        if replayed:
            # rows accepted by this batch BEFORE src_batch tracking existed
            # carry a null src_batch; on a ledger-confirmed replay they must
            # still come back, or a per-epoch overwrite sink would wipe the
            # epoch's pre-upgrade output with an empty set
            legacy = post.filter(F.col("src_batch").isNull()).join(
                firsts, ["fp", "doc_id"], "left_semi"
            )
            mine = mine.unionByName(legacy)
        return mine.select("doc_id", "fp")

    def accepted(self) -> DataFrame:
        """the full registry: (fp, doc_id of the accepted representative)."""
        return self.table.read().select("fp", "doc_id")


class IncrementalLsh(_RegistryMaintenance):
    """persistent near-dup registry: MinHash band keys against history.

    ``ingest`` returns candidate sorted (a, b) collisions of the batch
    against everything previously registered (plus within-batch collisions),
    for downstream exact verification — the incremental counterpart of
    ``dedup.minhash_lsh_pairs``'s banding stage. The store is keyed on
    (band_idx, band_hash); a batch joins only its own band buckets.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_hashes: int = 32,
        bands: int = 8,
        k_shingle: int = 3,
        nbuckets: int = 32,
        hash_family: str = "xx",
    ):
        self.spark = spark
        self.n_hashes, self.bands, self.k = n_hashes, bands, k_shingle
        self.hash_family = hash_family
        cfg = {
            "n_hashes": n_hashes,
            "bands": bands,
            "k_shingle": k_shingle,
            "hash_family": hash_family,
        }
        table_root = os.path.join(root, "bands")
        if SnapshotTable.exists(table_root):
            self.table = SnapshotTable(spark, table_root)
            _check_registry_props(self.table, "IncrementalLsh", cfg)
        else:
            # key = band bucket + member id: every (bucket, doc) pair is one
            # immutable registry row; MERGE dedups re-deliveries by key
            # bucket by the BAND KEY (not the full row key): a batch can then
            # read exactly the store buckets its own band keys hash into —
            # the probe's scan cost is the batch's collision slice, never the
            # full registry (same-key rows still co-locate, MERGE-safe)
            self.table = SnapshotTable.create(
                spark,
                table_root,
                keys=["band_idx", "band_hash", "doc_id"],
                bucket_cols=["band_idx", "band_hash"],
                nbuckets=nbuckets,
                props=cfg,
            )

    def _band_keys(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        from pyetl_spark.functions.dedup import band_keys

        return band_keys(
            docs,
            text_col=text_col,
            id_col=id_col,
            n_hashes=self.n_hashes,
            bands=self.bands,
            k_shingle=self.k,
            hash_family=self.hash_family,
        )

    def ingest(
        self,
        docs: DataFrame,
        batch_id: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        max_bucket: int | None = 50,
    ) -> DataFrame:
        """register a batch; return candidate near-dup pairs
        (a, b, band_idx) of this batch against the store and itself,
        canonicalized to ``a < b`` (sorted ids — so replays and cross-batch
        orientation produce one distinct row per unordered pair, never
        (d, d) self-pairs). Buckets larger than ``max_bucket`` — in the
        STORE or within the batch itself — are degenerate boilerplate:
        their collisions are dropped with a logged warning (note a replayed
        epoch re-evaluates the cap against the post-merge store, so a
        bucket the batch itself pushed past the cap drops out on replay).

        Scale shape: the history probe reads ONLY the store buckets this
        batch's band keys hash into (``bucket_ids`` + bucket-pruned read),
        then semi-joins that slice down to the batch's exact band keys —
        per-batch cost ∝ the batch and its collision slice, never the
        registry size."""
        keys = self._band_keys(docs, text_col, id_col).localCheckpoint(eager=True)
        out = _candidate_pairs(
            self.table, keys, ["band_idx", "band_hash"], "doc_id", max_bucket
        )

        self.table.merge(
            keys.select(
                "band_idx", "band_hash", "doc_id",
                F.lit("upsert").alias("op"), F.col("doc_id").alias("seq"),
            ),
            batch_id=batch_id,
        )
        return out


class IncrementalAnn(_RegistryMaintenance):
    """persistent embedding near-neighbour registry: RHP sign-signature
    buckets against history — the CDC tier of the similarity family
    (``similarity.knn_join_blocked`` is the one-shot sibling).

    ``bands`` independent hyperplane sets (seeds ``seed+b``), each ``bits``
    wide; two vectors are candidates iff they share a (band_idx, sig)
    bucket in ANY band. The store is bucketed by (band_idx, sig) — a
    batch's history probe reads only its own signature buckets — and
    ``ingest`` returns canonical sorted ``(a, b)`` pairs, idempotent
    under re-delivered epochs (same discipline as :class:`IncrementalLsh`).
    Signatures are built as single SQL strings (``rhp_signature_sql``), so
    plan construction stays O(1) py4j calls per band.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        dim: int,
        bands: int = 2,
        bits: int = 8,
        nbuckets: int = 32,
        seed: int = 42,
    ):
        from pyetl_spark.functions.similarity import hyperplanes

        self.spark = spark
        self.planes = [hyperplanes(dim, bits, seed=seed + b) for b in range(bands)]
        cfg = {"dim": dim, "bands": bands, "bits": bits, "seed": seed}
        table_root = os.path.join(root, "rhp")
        if SnapshotTable.exists(table_root):
            self.table = SnapshotTable(spark, table_root)
            _check_registry_props(self.table, "IncrementalAnn", cfg)
        else:
            self.table = SnapshotTable.create(
                spark,
                table_root,
                keys=["band_idx", "sig", "vec_id"],
                bucket_cols=["band_idx", "sig"],
                nbuckets=nbuckets,
                props=cfg,
            )

    def _signatures(self, df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
        """(vec_id, band_idx, sig) bucket membership, one row per band."""
        from pyetl_spark.functions.similarity import rhp_signature_sql

        dfv = df.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("__v")
        )
        sigs = F.array(
            *[F.expr(rhp_signature_sql("__v", p)).cast("long") for p in self.planes]
        )
        return dfv.select(
            "vec_id", F.posexplode(sigs).alias("band_idx", "sig")
        )

    def ingest(
        self,
        vecs: DataFrame,
        batch_id: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        max_bucket: int | None = 200,
    ) -> DataFrame:
        """register a batch of embeddings; return candidate neighbour pairs
        (a, b, band_idx), canonical sorted ``a < b``, of the batch against
        the store and itself. Buckets larger than ``max_bucket`` (store or
        within-batch) are dropped with a logged warning (degenerate
        direction clusters)."""
        keys = self._signatures(vecs, vec_col, id_col).localCheckpoint(eager=True)
        out = _candidate_pairs(self.table, keys, ["band_idx", "sig"], "vec_id", max_bucket)

        self.table.merge(
            keys.select(
                "band_idx", "sig", "vec_id",
                F.lit("upsert").alias("op"), F.col("vec_id").alias("seq"),
            ),
            batch_id=batch_id,
        )
        return out
