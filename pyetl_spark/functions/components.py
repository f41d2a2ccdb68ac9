"""Distributed connected components over candidate-pair edges.

Near-dup pipelines (MinHash-LSH, SimHash banding, embedding buckets — this
package's ``dedup``/``similarity`` modules) emit PAIRS; deduplication needs
the transitive closure of those pairs: one representative per connected
cluster. The reference does this with an in-memory dict walk
(pyetl/moteur/traitement_divers.py `unique` keeps one pass of a key set),
which caps at one process's RAM; at 100 TB the closure itself must be
distributed.

This module implements the **alternating large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14): each round is one groupBy + one join over the edge list, both
keyed on a node id (shuffle-partitionable, no driver state), and the edge
list converges to a star forest — every node pointing at its component's
minimum id — in O(log n) rounds even for path graphs, where naive min-label
propagation needs O(diameter). Duplicate clusters are shallow in practice
(2-5 docs), so typical convergence is 2-3 rounds.

Scale notes:
- per-round cost: two shuffles of the CURRENT edge list (which only ever
  shrinks toward one edge per non-root node — the star forest is the
  smallest representation of the closure);
- per-round ``localCheckpoint(eager=True)`` cuts lineage so round k+1 does
  not replay rounds 1..k (and survives executor loss without recomputing a
  divergent plan);
- convergence is detected with a one-row aggregate (count + order-invariant
  hash-sum) — no ``collect()`` of data rows to the driver;
- skew: a giant component funnels its edges through its min node's
  partition during small-star; AQE's skew-join handling splits that
  partition. The hot key is by construction the component ROOT, so this is
  the same bounded hotspot a groupBy on the final labels would have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_fingerprint(e: DataFrame) -> tuple[int, int]:
    """(row count, order-invariant hash combine) in ONE one-row job.
    bit_xor, not sum: xor never overflows ANSI LONG arithmetic, and the
    edge list is distinct so no pair cancels itself."""
    r = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(r["n"]), int(r["h"])


def _large_star(e: DataFrame) -> DataFrame:
    """connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.min("dst").alias("m"))
    m = m.select("src", F.least("m", "src").alias("m"))
    return (
        sym.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """canonicalize edges as (larger, smaller); connect every smaller
    neighbor of u (and u itself) to min(smaller-Γ(u) ∪ {u})."""
    d = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    m = d.groupBy("src").agg(F.min("dst").alias("m"))
    nbrs = d.union(d.select("src", F.col("src").alias("dst"))).distinct()
    return (
        nbrs.join(m, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    left: str = "a",
    right: str = "b",
    max_rounds: int = 20,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; ``component``
    is the minimum id in the node's connected cluster (the min id labels
    itself). Alternates large-star/small-star until the edge list is a
    fixed point (a star forest), then reads the labels off the stars.

    ``max_rounds`` is a guard far above the O(log n) bound (20 rounds
    covers > 2^20-node path graphs); hitting it raises rather than
    returning a half-contracted labeling.
    """
    e = (
        pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.isEmpty():
        return e.select(F.col("src").alias("id"), F.col("dst").alias("component"))

    fp = _edge_fingerprint(e)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        nfp = _edge_fingerprint(nxt)
        e, fp, done = nxt, nfp, nfp == fp
        if done:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # fixed point = star forest: every edge is (member, root). Roots label
    # themselves.
    members = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("id"), F.col("dst").alias("component")).distinct()
    return members.union(roots).distinct()


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left: str = "a",
    right: str = "b",
) -> DataFrame:
    """end-to-end near-dedup: keep one representative row (the cluster's min
    id) per connected cluster of ``pairs``; rows in no pair pass through.
    A broadcast-safe anti-join shape: the label table is (id, component) —
    two longs per clustered doc, tiny next to the corpus."""
    labels = connected_components(pairs, left, right)
    drop = labels.where(F.col("id") != F.col("component")).select("id")
    return df.join(drop, df[id_col] == drop["id"], "left_anti")
