"""Training-shard packing: deterministic shuffle + token-budget sharding +
stratified sampling — the last mile of an LLM training-data pipeline (after
dedup/quality filtering, documents are shuffled, sampled per-stratum, and
packed into fixed-token-budget shards for the data loader).

Not a reference operator (pyetl stops at file sinks — sortir fan-out,
traitement_fichiers.py); these are the beyond-reference training-data ops the
project brief lists as first-class. The fan-out WRITE of packed shards reuses
the `sortir` sink (sources/io.py) with ``shard_id`` as the partition column.

Scale notes (the whole point):

* The global running token count is a **distributed prefix sum**, not a
  global-order window. A ``Window.orderBy`` without a partition collapses to
  one task; instead we range-partition on the order key, take a
  partition-LOCAL cumsum window, and add per-partition offsets collected to
  the driver — O(num_partitions) driver state, exactly the
  ``dense_key_dimension`` recipe (operators/relational.py:431). One range
  shuffle total; the cumsum itself is partition-parallel.
* ``localCheckpoint(eager=True)`` pins the range partitioning before the
  offsets collect: ``repartitionByRange`` re-samples its bounds per
  execution, so without pinning, the offsets job and the output job could
  see different boundaries (the round-2 dense-key bug).
* Shard assignment is by **token offset** (a document lands in the shard
  where its first token falls, shards hold ~budget tokens each) — the
  concatenate-then-split semantics real packers use, and a closed form a SQL
  window states exactly; a close-shard-on-overflow greedy variant is a
  sequential recurrence with no distributed form.
* The deterministic shuffle key is md5 (oracle family) or xxhash64 (scale
  family) of the id — reshuffling per epoch = changing ``seed``, no RNG
  state, identical at any parallelism.
* Stratified sampling filters on a pure hash threshold per stratum — no
  shuffle at all, map-side only, fraction exact in expectation and
  reproducible row-for-row at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyetl_spark.functions.text import md5_int60

# md5_int60 yields 60-bit uniform ints; fractions compare against this scale
_HASH_SCALE = 1 << 60


def shuffle_key(id_col: Column, seed: int = 0, hash_family: str = "md5") -> Column:
    """deterministic per-epoch shuffle order for an id column. md5 family is
    the cross-engine (DuckDB-checkable) variant; xx is the cheap scale path."""
    seeded = F.concat_ws(":", F.lit(str(seed)), id_col.cast("string"))
    if hash_family == "md5":
        return F.md5(seeded)
    return F.xxhash64(id_col.cast("string"), F.lit(seed))


def global_cumsum(
    df: DataFrame, value_col: str, order_col: str, out: str = "cum"
) -> DataFrame:
    """exclusive global prefix sum of ``value_col`` in ``order_col`` order
    (ties broken by nothing — ``order_col`` must be unique), fully
    distributed: range shuffle + local window + O(P) driver offsets.
    Output adds ``out`` = sum of ``value_col`` over all STRICTLY preceding
    rows (exclusive, so row 1 gets 0)."""
    ranged = df.repartitionByRange(F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(F.col(order_col))
    local = ranged.withColumn(
        "__lcum", F.sum(F.col(value_col)).over(w)
    ).localCheckpoint(eager=True)
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):  # range partitions are ordered by pid
        offsets[pid] = acc
        acc += totals[pid] or 0
    if not offsets:
        return df.withColumn(out, F.lit(0).cast("long"))
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("__pid")
    )
    return local.withColumn(
        out,
        (F.col("__lcum") - F.col(value_col) + F.coalesce(off, F.lit(0))).cast("long"),
    ).drop("__pid", "__lcum")


def pack_shards(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    budget: int,
    seed: int = 0,
    hash_family: str = "md5",
    shard_col: str = "shard_id",
    offset_col: str = "token_offset",
) -> DataFrame:
    """assign every document to a fixed-token-budget training shard.

    Documents are ordered by a deterministic seeded shuffle of ``id_col``
    (new ``seed`` = new epoch order), then packed by token offset:
    ``shard_id = floor(exclusive_cumsum(tokens) / budget)`` and
    ``token_offset`` = position of the document's first token within its
    shard. Every shard except the last spans exactly ``budget`` tokens of
    the concatenated stream. Returns the input columns +
    (shard_col, offset_col)."""
    if budget <= 0:
        raise ValueError(f"pack_shards: budget must be positive, got {budget}")
    # the prefix sum runs on a NARROW (id, tokens, ord) projection — its
    # localCheckpoint then materializes a few ints per document, not the
    # corpus (checkpointing the full row width would write every payload
    # column to executor storage); assignments join back on the unique id
    narrow = df.select(id_col, tokens_col).withColumn(
        "__ord", shuffle_key(F.col(id_col), seed, hash_family)
    )
    cum = global_cumsum(narrow, tokens_col, "__ord", out="__cum")
    # ``id_col`` must be unique and non-null (it is both the shuffle-order
    # seed and the join-back key), and ``tokens_col`` must be non-null and
    # non-negative (a null token count makes the running sum — and so the
    # row's shard_id/token_offset — silently null; a negative one corrupts
    # every later offset). Validate in ONE aggregate over the
    # already-checkpointed narrow data.
    chk = cum.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("d"),
        F.sum(F.col(id_col).isNull().cast("int")).alias("nulls"),
        F.sum(
            (F.col(tokens_col).isNull() | (F.col(tokens_col) < 0)).cast("int")
        ).alias("badtok"),
    ).first()
    if chk["nulls"]:
        raise ValueError(f"pack_shards: {chk['nulls']} null values in id column {id_col!r}")
    if chk["d"] != chk["n"]:
        raise ValueError(
            f"pack_shards: id column {id_col!r} is not unique "
            f"({chk['n']} rows, {chk['d']} distinct ids)"
        )
    if chk["badtok"]:
        raise ValueError(
            f"pack_shards: {chk['badtok']} null/negative values in token "
            f"column {tokens_col!r} — every document needs a non-negative "
            "token count to hold the packing contract"
        )
    assign = cum.select(
        id_col,
        (F.col("__cum") / F.lit(budget)).cast("long").alias(shard_col),
        F.pmod(F.col("__cum"), F.lit(budget)).cast("long").alias(offset_col),
    )
    return df.join(assign, id_col).select(*df.columns, shard_col, offset_col)


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    seed: int = 0,
    default_fraction: float = 0.0,
    hash_family: str = "md5",
) -> DataFrame:
    """deterministic per-stratum sampling (per-language mixing weights):
    keep a row iff hash(seed, id) < fraction[stratum] — map-side only, no
    shuffle, reproducible row-for-row at any parallelism, disjoint seeds
    give independent samples. Strata missing from ``fractions`` fall back to
    ``default_fraction`` (0 drops them). Thresholds are integerized
    (``int(frac * 2^60)``) so the keep decision is an exact BIGINT compare
    in both Spark and a SQL oracle — no float-boundary disagreement."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"sample_stratified: fraction for {k!r} is {v}, not in [0,1]")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"sample_stratified: default_fraction {default_fraction} not in [0,1]")
    seeded = F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    if hash_family == "md5":
        u = md5_int60(seeded)
    else:
        u = F.pmod(F.xxhash64(seeded), F.lit(_HASH_SCALE))
    thr = F.lit(int(default_fraction * _HASH_SCALE))
    for k, v in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(k), F.lit(int(v * _HASH_SCALE))).otherwise(thr)
    return df.filter(u < thr)


def rebalance_mix(
    df: DataFrame,
    strata_col: str,
    target: dict[str, float],
    id_col: str,
    seed: int = 0,
    buckets: int = 1024,
) -> DataFrame:
    """Domain-mix rebalancing with EXACT per-stratum quotas: draw the
    largest corpus whose stratum proportions equal ``target`` (weights are
    normalized; strata absent from ``target`` are dropped). The feasible
    size is N = min_s floor(count_s / frac_s); each stratum keeps its
    n_s = floor(frac_s * N) smallest-hash rows — deterministic in
    ``seed``, reproducible at any parallelism, and statable in one SQL
    window (the oracle) as rank-by-hash <= n_s.

    ``sample_stratified`` is the zero-shuffle cousin with binomial counts;
    this one trades one bounded shuffle for exact counts (what a training
    run's data card actually promises).

    Scale shape — deliberately NOT a whole-stratum window (at 100 TB a
    single-domain window partition is one task): selection runs in two
    phases on the 60-bit hash,

    1. rows land in ``buckets`` equal-width hash ranges; a (stratum,
       bucket) count aggregate (K*buckets rows, tiny) is cumsum'd to find,
       per stratum, which buckets fit entirely under the quota and which
       single bucket straddles it;
    2. keep-all buckets pass with no further work; ONLY the straddling
       bucket's rows (~stratum/buckets of the data) get an exact
       row_number, partitioned per stratum.

    Driver state is the O(K) quota map (same O(P)-scalars discipline as
    pack_shards). Raises if a targeted stratum is missing from the data —
    an empty mandatory domain makes N = 0, which is never what the caller
    meant.

    Quota arithmetic is exact rational (floats go through their DECIMAL
    string: 0.15 means 15/100, not the nearest binary double), so
    floor(count * W / w) here equals integer SQL arithmetic in an oracle —
    no float-boundary disagreement on quota edges.
    """
    from fractions import Fraction

    fracs = {
        k: (Fraction(v) if isinstance(v, int) else Fraction(str(v)))
        for k, v in target.items()
        if v > 0
    }
    if not fracs:
        raise ValueError("rebalance_mix: target has no positive weights")
    tot_w = sum(fracs.values())
    fracs = {k: v / tot_w for k, v in fracs.items()}

    counts = {
        r[strata_col]: r["__n"]
        for r in df.filter(F.col(strata_col).isin(*fracs))
        .groupBy(strata_col)
        .agg(F.count("*").alias("__n"))
        .collect()
    }
    missing = sorted(set(fracs) - set(counts))
    if missing:
        raise ValueError(
            f"rebalance_mix: targeted strata absent from data: {missing}"
        )
    n_total = min(counts[s] // f for s, f in fracs.items())
    quotas = {s: int(f * n_total) for s, f in fracs.items()}

    seeded = F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    width = _HASH_SCALE // buckets
    sub = df.filter(F.col(strata_col).isin(*fracs)).withColumn(
        "__h", md5_int60(seeded)
    )
    sub = sub.withColumn("__b", (F.col("__h") / F.lit(width)).cast("long"))

    quota_col = F.lit(None).cast("long")
    for s, q in sorted(quotas.items()):
        quota_col = F.when(F.col(strata_col) == s, F.lit(q)).otherwise(quota_col)

    bcnt = sub.groupBy(strata_col, "__b").agg(F.count("*").alias("__bn"))
    wcum = Window.partitionBy(strata_col).orderBy("__b")
    meta = bcnt.select(
        strata_col,
        "__b",
        (F.sum("__bn").over(wcum) - F.col("__bn")).alias("__before"),
        F.col("__bn").alias("__bn"),
        quota_col.alias("__q"),
    )
    meta = meta.select(
        strata_col,
        "__b",
        "__before",
        # full: the whole bucket fits under the quota; cut: it straddles
        ((F.col("__before") + F.col("__bn")) <= F.col("__q")).alias("__full"),
        (F.col("__before") < F.col("__q")).alias("__reach"),
        (F.col("__q") - F.col("__before")).alias("__room"),
    ).filter(F.col("__reach"))

    routed = sub.join(F.broadcast(meta), [strata_col, "__b"], "inner")
    keep_full = routed.filter(F.col("__full")).drop(
        "__h", "__b", "__before", "__full", "__reach", "__room"
    )
    cut = routed.filter(~F.col("__full"))
    wrank = Window.partitionBy(strata_col).orderBy("__h", id_col)
    keep_cut = (
        cut.withColumn("__rk", F.row_number().over(wrank))
        .filter(F.col("__rk") <= F.col("__room"))
        .drop("__h", "__b", "__before", "__full", "__reach", "__room", "__rk")
    )
    return keep_full.unionByName(keep_cut)
