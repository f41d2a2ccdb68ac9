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

Two tiers:

- **exact** (`IncrementalDedup`): fingerprint = md5 over normalized text
  (identical to ``dedup.exact_dedup`` and SQL-recomputable). One hash-agg
  for within-batch first-wins, one anti-join against the store (both keyed
  on fp — co-shuffled), one MERGE of the novel rows.
- **near-dup** (`IncrementalLsh`): the store holds (band_idx, band_hash →
  doc ids); a new batch's band keys join only the MATCHING historical
  buckets, so cost scales with the batch and its collision set, never with
  corpus size. (Same banding math as ``dedup.minhash_lsh_pairs``.)

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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.cdc.tableio import SnapshotTable
from pyetl_spark.functions.text import fingerprint_md5


class IncrementalDedup:
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

        The return value is **idempotent under replay**: it is computed as a
        semi-join of the batch's first-wins rows against the POST-merge
        registry, so a re-delivered batch (at-least-once foreachBatch) gets
        the identical accepted set back — its novel merge is ledger-skipped,
        but its rows are still the stored representatives. A downstream
        per-epoch overwrite sink therefore converges instead of wiping the
        epoch's output on retry."""
        fps = docs.select(
            F.col(id_col).alias("doc_id"), fingerprint_md5(F.col(text_col)).alias("fp")
        )
        firsts = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        firsts = firsts.localCheckpoint(eager=True)  # computed once: anti-join, merge, return
        seen = self.table.read()
        novel = firsts
        if seen is not None and not seen.isEmpty():
            novel = firsts.join(seen.select("fp"), "fp", "left_anti")
        self.table.merge(
            novel.select(
                "fp", "doc_id", F.lit("upsert").alias("op"), F.col("doc_id").alias("seq")
            ),
            batch_id=batch_id,
        )
        post = self.table.read()  # post-merge registry: who actually represents each fp
        return firsts.join(post, ["fp", "doc_id"], "left_semi").select("doc_id", "fp")

    def accepted(self) -> DataFrame:
        """the full registry: (fp, doc_id of the accepted representative)."""
        return self.table.read().select("fp", "doc_id")


class IncrementalLsh:
    """persistent near-dup registry: MinHash band keys against history.

    ``ingest`` returns candidate (new_id, old_id) collisions of the batch
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
        table_root = os.path.join(root, "bands")
        if SnapshotTable.exists(table_root):
            self.table = SnapshotTable(spark, table_root)
        else:
            # key = band bucket + member id: every (bucket, doc) pair is one
            # immutable registry row; MERGE dedups re-deliveries by key
            self.table = SnapshotTable.create(
                spark,
                table_root,
                keys=["band_idx", "band_hash", "doc_id"],
                nbuckets=nbuckets,
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
        max_bucket: int = 50,
    ) -> DataFrame:
        """register a batch; return candidate near-dup pairs
        (new_id, old_id, band_idx) of this batch against the store and
        itself (new_id > old_id for within-batch pairs). Buckets larger
        than ``max_bucket`` in the STORE are degenerate boilerplate — their
        collisions are dropped (same documented cap as the batch LSH)."""
        keys = self._band_keys(docs, text_col, id_col).localCheckpoint(eager=True)

        seen = self.table.read()
        history = (
            seen.select("band_idx", "band_hash", F.col("doc_id").alias("old_id"))
            if seen is not None and not seen.isEmpty()
            else None
        )
        new = keys.select("band_idx", "band_hash", F.col("doc_id").alias("new_id"))

        within = (
            new.alias("l")
            .join(
                new.select("band_idx", "band_hash", F.col("new_id").alias("old_id")).alias("r"),
                ["band_idx", "band_hash"],
            )
            .where(F.col("new_id") > F.col("old_id"))
        )
        if history is not None:
            # cap degenerate store buckets BEFORE the join output explodes
            sizes = history.groupBy("band_idx", "band_hash").agg(F.count("*").alias("__n"))
            bounded = history.join(
                sizes.where(F.col("__n") <= max_bucket).drop("__n"),
                ["band_idx", "band_hash"],
                "left_semi",
            )
            against = new.join(bounded, ["band_idx", "band_hash"])
            pairs = within.unionByName(against)
        else:
            pairs = within
        out = pairs.select("new_id", "old_id", "band_idx").distinct()

        self.table.merge(
            keys.select(
                "band_idx", "band_hash", "doc_id",
                F.lit("upsert").alias("op"), F.col("doc_id").alias("seq"),
            ),
            batch_id=batch_id,
        )
        return out
