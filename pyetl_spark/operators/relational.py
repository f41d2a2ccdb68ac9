"""Relational operators: joins, dedup, grouped fusion, stat tables, CDC diff.

Reference parity citations (relative to /root/reference):

- ``join_lookup``   → ``f_join``/``f_sjoin`` (traitement_alpha.py:876-1000):
  equi hash join whose build side is a preloaded file/store — here a
  broadcast left join (build side small by construction in the reference,
  since it had to fit in a Python dict).
- ``semi_join``/``anti_join`` → ``in:mem`` condition (traitement_conditions.py:335-369)
  and the ``compare`` leftover branch.
- ``unique``        → ``f_uniq`` (traitement_divers.py:137-165).
- ``unique_n``      → ``f_uniqcnt`` (traitement_divers.py:168-198) — first N
  per key with occurrence counter; the LWW-dedup shape.
- ``merge_rows``    → ``f_merge`` (traitement_divers.py:201-310): group-by-key
  row fusion with per-column reducers add/set/list/min/max/first/last.
- ``objgroup``      → traitement_divers.py:807-915 (collect attrs per key).
- ``stat``          → the compteur/statistics engine (traitement_aux.py:259-326,
  formats/interne/stats.py:16-533): declarative agg table with functions
  cnt somme min max moy minc maxc val valtri val_uniq cnt_val_uniq; the
  indirect-column mode is ``groupBy().pivot()``.
- ``compare``       → ``f_compare`` (traitement_divers.py:675-759): full-outer
  CDC classifier new/diff/unchanged/supp — the table-state diff verifier.
- ``multiplex``     → ``filter`` routing command (traitement_workflow.py:940-985).
- ``topk``          → compose of sort + unique;N (SURVEY §2.6).
- ``getkey``        → dense incremental key (traitement_divers.py:770-790).
- ``changed``       → ``<>:`` changed-since-last-row condition
  (traitement_conditions.py:372-381) — made order-explicit with a Window.
- ``sessionize``    → ``merge`` seq adjacency mode (traitement_divers.py:289-309).

Scale notes: every operator is expressed on built-in DataFrame ops so
Catalyst/AQE pick physical strategies (broadcast vs sort-merge, skew split,
partial aggregation). ``unique``/LWW use ``max_by`` aggregation rather than a
global window where possible — hash aggregation gets map-side partial
combine, which is the scalable form of "salting": each input partition
pre-reduces its own duplicates before the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _keys(keys: str | Sequence[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


# --------------------------------------------------------------------- joins


def join_lookup(
    df: DataFrame,
    ref: DataFrame,
    keys: str | Sequence[str],
    select: dict[str, str] | None = None,
    how: str = "left",
    broadcast: bool = True,
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Equi join against a lookup table, pulling selected attrs.

    ``select`` maps ref-column → output name (the reference pulls chosen
    fields out of the joined dict, traitement_alpha.py:930-960); ``defaults``
    fill non-matching rows (left join semantics with defaut field).
    """
    keys = _keys(keys)
    if select:
        ref = ref.select(*keys, *[F.col(src).alias(dst) for src, dst in select.items()])
    right = F.broadcast(ref) if broadcast else ref
    out = df.join(right, on=keys, how=how)
    for col, dflt in (defaults or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(dflt)))
    return out


def semi_join(df: DataFrame, ref: DataFrame, keys: str | Sequence[str], broadcast: bool = True) -> DataFrame:
    """keep rows whose key exists in ref (``in:mem`` semi join)."""
    right = F.broadcast(ref) if broadcast else ref
    return df.join(right, on=_keys(keys), how="left_semi")


def anti_join(df: DataFrame, ref: DataFrame, keys: str | Sequence[str], broadcast: bool = True) -> DataFrame:
    """keep rows whose key does NOT exist in ref (except / NOT EXISTS)."""
    right = F.broadcast(ref) if broadcast else ref
    return df.join(right, on=_keys(keys), how="left_anti")


# --------------------------------------------------------------------- dedup


def unique(df: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """dedup on key list, arbitrary survivor — ``f_uniq``. Spark's
    ``dropDuplicates`` (hash-agg based, map-side partial combine)."""
    return df.dropDuplicates(_keys(keys))


def unique_n(
    df: DataFrame,
    keys: str | Sequence[str],
    order: str | Column,
    n: int = 1,
    desc: bool = True,
    counter: str | None = "occurrence",
) -> DataFrame:
    """first N rows per key in explicit order, with occurrence counter —
    ``f_uniqcnt``. The reference relied on stream order; Spark needs the
    explicit ``order`` column (SURVEY §2.8)."""
    ocol = F.col(order) if isinstance(order, str) else order
    w = Window.partitionBy(*_keys(keys)).orderBy(ocol.desc() if desc else ocol.asc())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n)
    if counter:
        out = out.withColumnRenamed("__rn", counter)
    else:
        out = out.drop("__rn")
    return out


# ------------------------------------------------------------- grouped fusion

_REDUCERS = {
    "add": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "moy": F.avg,
    "avg": F.avg,
    "first": F.first,
    "last": F.last,
    "set": F.first,  # reference 'set': any single value
    "list": F.collect_list,
    "uniq": F.collect_set,
    "cnt": F.count,
}


def merge_rows(
    df: DataFrame,
    keys: str | Sequence[str],
    reducers: dict[str, str],
    order: str | None = None,
) -> DataFrame:
    """group-by-key row fusion with per-column reducers — ``f_merge``.

    ``reducers``: column → one of add/sum/min/max/moy/first/last/set/list/
    uniq/cnt. With ``order`` given, first/last/list respect that order
    (implemented via ``min_by``/``max_by``/sorted ``collect_list`` so the
    aggregation stays hash-based and partially combinable).

    ``first``/``last``/``list`` REQUIRE ``order``: the reference had stream
    order, but an unordered hash agg silently depends on partitioning — a
    non-deterministic answer at scale is a bug, not a default. Use ``set``
    for the explicit any-value semantic.
    """
    keys = _keys(keys)
    missing_order = [c for c, r in reducers.items() if r in ("first", "last", "list") and not order]
    if missing_order:
        raise ValueError(
            f"merge_rows: reducers on {missing_order} need order= for deterministic "
            "results (use 'set' for the explicit any-value semantic)"
        )
    aggs: list[Column] = []
    for col, red in reducers.items():
        if order and red in ("first", "last"):
            fn = F.min_by if red == "first" else F.max_by
            aggs.append(fn(F.col(col), F.col(order)).alias(col))
        elif order and red == "list":
            aggs.append(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(order).alias("o"), F.col(col).alias("v")))),
                    lambda s: s["v"],
                ).alias(col)
            )
        else:
            aggs.append(_REDUCERS[red](F.col(col)).alias(col))
    return df.groupBy(*keys).agg(*aggs)


def objgroup(
    df: DataFrame,
    keys: str | Sequence[str],
    attrs: Sequence[str],
    as_struct: bool = False,
    order: str | None = None,
) -> DataFrame:
    """accumulate attrs into arrays per key — traitement_divers.py:807-915."""
    keys = _keys(keys)
    if as_struct:
        inner = F.struct(*[F.col(a) for a in attrs])
        if order:
            lst = F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order).alias("o"), inner.alias("v")))),
                lambda s: s["v"],
            )
        else:
            lst = F.collect_list(inner)
        return df.groupBy(*keys).agg(lst.alias("items"))
    aggs = [F.collect_list(F.col(a)).alias(a) for a in attrs]
    return df.groupBy(*keys).agg(*aggs)


# ----------------------------------------------------------------- stat table

_STAT_FNS = {
    "cnt": lambda c: F.count(c),
    "somme": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "moy": lambda c: F.avg(c),
    "minc": lambda c: F.min(c),  # min over string compare
    "maxc": lambda c: F.max(c),
    "val": lambda c: F.collect_list(c),
    "valtri": lambda c: F.sort_array(F.collect_list(c)),
    "val_uniq": lambda c: F.sort_array(F.collect_set(c)),
    "cnt_val_uniq": lambda c: F.count_distinct(c),
    "approx_cnt_uniq": lambda c: F.approx_count_distinct(c),  # scale extension
}


def stat(
    df: DataFrame,
    keys: str | Sequence[str],
    stats: dict[str, tuple[str, str]],
    pivot: str | None = None,
    pivot_values: Sequence[str] | None = None,
) -> DataFrame:
    """declarative aggregate table — the compteur/``stat`` engine.

    ``stats``: output column → (function, input column); functions per
    ``formats/interne/stats.py:277-329`` plus ``approx_cnt_uniq``.
    ``pivot``: the reference's indirect ``[attr]`` columns (one stat column
    per observed value) → ``groupBy().pivot()``; pass ``pivot_values`` at
    scale so Spark skips the distinct-value pre-pass.
    """
    keys = _keys(keys)
    gb = df.groupBy(*keys)
    if pivot:
        gb = gb.pivot(pivot, list(pivot_values) if pivot_values else None)
        if len(stats) == 1:
            name, (fn, col) = next(iter(stats.items()))
            return gb.agg(_STAT_FNS[fn](F.col(col)).alias(name))
    aggs = [_STAT_FNS[fn](F.col(col)).alias(name) for name, (fn, col) in stats.items()]
    return gb.agg(*aggs)


# ----------------------------------------------------------------- CDC diff


def compare(
    df: DataFrame,
    ref: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Sequence[str] | None = None,
    status_col: str = "cdc_status",
) -> DataFrame:
    """full-outer CDC classifier — ``f_compare`` traitement_divers.py:675-759.

    Routes each key to ``new`` (only in df), ``supp`` (only in ref),
    ``diff`` (both, payload differs) or ``unchanged``. Comparison covers
    ``compare_cols`` or all shared non-key columns. Null-safe equality via a
    struct comparison (eqNullSafe over a packed struct). Rows carry df's
    payload except ``supp`` rows, which carry ref's.

    This operator doubles as the engine's table-state equality checker
    (SURVEY §5): two tables match iff every status is ``unchanged``.
    """
    keys = _keys(keys)
    if compare_cols is None:
        compare_cols = [c for c in df.columns if c in set(ref.columns) and c not in keys]
    # rename the ref side wholesale: immune to self-join column ambiguity
    rn = {c: f"__r_{c}" for c in ref.columns}
    ref2 = ref.withColumnsRenamed(rn).withColumn("__rpresent", F.lit(True))
    df2 = df.withColumn("__lpresent", F.lit(True))
    joined = df2.join(
        ref2,
        on=[F.col(k).eqNullSafe(F.col(f"__r_{k}")) for k in keys],
        how="full_outer",
    )
    in_l = F.col("__lpresent").isNotNull()
    in_r = F.col("__rpresent").isNotNull()
    same = F.struct(*[F.col(c) for c in compare_cols]).eqNullSafe(
        F.struct(*[F.col(f"__r_{c}") for c in compare_cols])
    )
    status = (
        F.when(in_l & ~in_r, F.lit("new"))
        .when(~in_l & in_r, F.lit("supp"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("diff"))
    )
    key_cols = [F.coalesce(F.col(k), F.col(f"__r_{k}")).alias(k) for k in keys]
    payload = [
        F.when(in_l, F.col(c)).otherwise(F.col(f"__r_{c}")).alias(c) for c in compare_cols
    ]
    return joined.select(*key_cols, *payload, status.alias(status_col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: str | Sequence[str],
    left_on: str,
    right_on: str,
    right_values: Sequence[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row per key with
    ``right_on <= left_on`` (absent in the reference — SURVEY §2.4 notes
    Spark composition gives it; the CDC shape is "state of key K as of
    sequence S").

    Implementation: union both sides on (key, time), one window pass with
    ``last(value, ignorenulls=True)`` over rows-unbounded-preceding, keep
    left rows. ONE shuffle on (key), linear in |L|+|R| — never the O(|L|·|R|)
    theta join a naive ``right_on <= left_on`` condition would plan. Ties
    (right_on == left_on) are visible to the left row, matching SQL ASOF
    (``l.t >= r.t``); duplicate right timestamps per key should be deduped
    upstream for determinism.
    """
    keys = _keys(keys)
    lcols = [c for c in left.columns if c not in keys and c != left_on]
    if set(right_values) & (set(lcols) | set(keys) | {left_on}):
        raise ValueError("asof_join: right_values collide with left columns — alias upstream")
    # right values travel inside ONE struct: the struct itself is non-null for
    # every right row, so last(ignorenulls) picks the latest right ROW and a
    # legitimately-NULL value column propagates as NULL (SQL ASOF semantics)
    # instead of being backfilled from an earlier row (ADVICE r01).
    r2 = right.select(
        *keys,
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(v) for v in right_values]).alias("__rv"),
    )
    l2 = left.select(
        *keys,
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
    )
    unioned = l2.unionByName(r2, allowMissingColumns=True)
    # right rows sort before left rows at equal time → "<=" visibility
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *keys,
        "__t",
        "__side",
        *[F.col(c) for c in lcols],
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__rv"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *keys,
            F.col("__t").alias(left_on),
            *[F.col(c) for c in lcols],
            *[F.col("__rv")[v].alias(v) for v in right_values],
        )
    )


def range_join_window(
    left: DataFrame,
    right: DataFrame,
    keys: str | Sequence[str],
    left_on: str,
    right_on: str,
    lower: float,
    upper: float,
    bucket_width: float | None = None,
) -> DataFrame:
    """Inner join of rows with ``left_on + lower <= right_on <= left_on +
    upper`` per key (absent in the reference; the GIS analog is the spatial
    bbox join ``dbgeo`` traitement_db.py:337-392).

    Implementation: both sides are bucketed to ``bucket_width`` (default =
    window span); the left side explodes to the buckets its window overlaps
    (a small constant), the join runs as a plain EQUI join on (key, bucket)
    — shuffle-hash/broadcast-able, cost ∝ matches — then the exact range
    predicate filters. A naive range condition would force a
    BroadcastNestedLoopJoin: O(|L|·|R|) and a 100 TB non-starter.
    """
    keys = _keys(keys)
    span = upper - lower
    width = bucket_width or max(span, 1e-9)
    n_buckets = int(span / width) + 2

    l2 = left.withColumn(
        "__b0", F.floor((F.col(left_on) + F.lit(lower)) / F.lit(width)).cast("long")
    ).withColumn(
        "__b", F.explode(F.sequence(F.col("__b0"), F.col("__b0") + F.lit(n_buckets - 1)))
    ).drop("__b0")
    r2 = right.withColumn("__b", F.floor(F.col(right_on) / F.lit(width)).cast("long"))
    joined = l2.join(r2, [*keys, "__b"]).drop("__b")
    # no dedup needed: the right row has exactly ONE bucket, so each
    # (left, right) pair meets in at most one exploded bucket
    return joined.filter(
        (F.col(right_on) >= F.col(left_on) + F.lit(lower))
        & (F.col(right_on) <= F.col(left_on) + F.lit(upper))
    )


# ------------------------------------------------------------------- routing


def multiplex(df: DataFrame, col: str, values: Sequence[str], other: str = "#autre") -> dict[str, DataFrame]:
    """route rows to named branches by attr value — ``filter`` command
    (traitement_workflow.py:940-985) with the ``#autre`` fallback branch."""
    out = {v: df.filter(F.col(col) == v) for v in values}
    out[other] = df.filter(~F.col(col).isin(list(values)) | F.col(col).isNull())
    return out


# --------------------------------------------------------- window-ish helpers


def topk(df: DataFrame, keys: str | Sequence[str], order: str | Column, k: int, desc: bool = True) -> DataFrame:
    """top-k per group (SURVEY §2.6: sort + unique;N composition)."""
    return unique_n(df, keys, order, n=k, desc=desc, counter="rank")


def sample_1_in_n(df: DataFrame, n: int, key: str | None = None) -> DataFrame:
    """deterministic 1-in-N sample — ``sel %;N`` traitement_conditions.py:143-162.
    Hash-based (not modulo-counter) so it is partition-order independent."""
    col = F.xxhash64(F.col(key)) if key else F.xxhash64(F.struct(*df.columns))
    return df.filter(F.pmod(col, F.lit(n)) == 0)


def dense_key_dimension(values: DataFrame, value_col: str, out: str = "key") -> DataFrame:
    """distinct values → dense 1..N keys in value order, fully distributed
    (the zipWithIndex recipe in DataFrame terms): range-repartition the
    distinct values, local ``row_number`` per partition, then add the
    per-partition offsets (ONE driver-side collect bounded by the partition
    count, never by cardinality). No single-partition global sort anywhere.
    """
    dims = values.select(value_col).distinct()
    ranged = dims.repartitionByRange(F.col(value_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(F.col(value_col))
    # materialize BEFORE the counts collect: repartitionByRange re-SAMPLES
    # its range bounds on every execution, so without pinning this exact
    # partitioning the offsets (computed in the counts job) could be applied
    # to a differently-bounded partitioning in the output job — duplicate /
    # non-dense keys at large cardinality. localCheckpoint (not persist):
    # it cuts lineage, so cache eviction / executor loss can never silently
    # re-sample the bounds (Spark fails loudly instead of recomputing), and
    # it leaks no storage blocks in a long-lived session — persist() here
    # had no matching unpersist on the success path (ADVICE r02).
    local = ranged.withColumn("__rn", F.row_number().over(w)).localCheckpoint(eager=True)
    # partition counts → offsets: ≤ shuffle-partition-count rows on the driver
    counts = {r["__pid"]: r["n"] for r in local.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    if not counts:  # empty input → empty keyed dimension, not an analysis error
        return values.select(value_col).limit(0).withColumn(out, F.lit(None).cast("int"))
    offsets, acc = {}, 0
    for pid in sorted(counts):  # range partitions are ordered by pid
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("__pid")
    )
    return local.select(
        F.col(value_col), (F.col("__rn") + F.coalesce(off_expr, F.lit(0))).cast("int").alias(out)
    )


def getkey(df: DataFrame, value_col: str, out: str = "key", method: str = "dim") -> DataFrame:
    """dense incremental integer key per distinct value — traitement_divers.py:770-790.

    ``method="dim"`` (default): build the key dimension distributed
    (:func:`dense_key_dimension`) and join it back — scale-safe at any
    cardinality (Spark broadcasts the dimension when small).
    ``method="window"``: the small-dim parity fast path — ``dense_rank`` over
    a global ORDER BY (single-partition sort; only for dims that fit one
    partition). Both orderings are identical (dense, ascending value order).
    """
    if method == "window":
        w = Window.orderBy(F.col(value_col))
        return df.withColumn(out, F.dense_rank().over(w))
    dim = dense_key_dimension(df, value_col, out).withColumnRenamed(value_col, "__gv")
    # null-safe equi join (<=> is a hash-join key) so NULL values keep their
    # rank like dense_rank gives them
    return df.join(dim, F.col(value_col).eqNullSafe(F.col("__gv")), "left").drop("__gv")


def changed(
    df: DataFrame,
    col: str,
    order: str,
    partition: str | Sequence[str] | None = None,
    out: str = "changed",
    allow_global: bool = False,
) -> DataFrame:
    """true when attr differs from previous row in explicit order — ``<>:``.

    ``partition`` is REQUIRED at scale: an unpartitioned lag window is one
    global sort on a single partition — semantically the reference's
    single-stream ``<>:`` but a serialization point Spark cannot
    parallelize. Pass ``allow_global=True`` to opt into that explicitly
    (small data / strict reference parity), mirroring ``merge_rows``'s
    required ``order`` contract."""
    if partition is None and not allow_global:
        raise ValueError(
            "changed() without `partition` builds a single-partition global "
            "window (every row through one task). Pass partition=<keys> for "
            "the scale path, or allow_global=True to accept the serial scan."
        )
    w = Window.partitionBy(*_keys(partition)) if partition else Window.partitionBy()
    w = w.orderBy(F.col(order))
    prev = F.lag(F.col(col)).over(w)
    return df.withColumn(out, ~prev.eqNullSafe(F.col(col)))


def sessionize(
    df: DataFrame,
    keys: str | Sequence[str],
    order: str,
    gap: Column | None = None,
    new_group: Column | None = None,
    out: str = "session_id",
) -> DataFrame:
    """adjacency grouping — ``merge`` seq mode: cumulative sum of
    change/gap flags over an ordered window yields a group id."""
    w = Window.partitionBy(*_keys(keys)).orderBy(F.col(order))
    if new_group is None:
        prev = F.lag(F.col(order)).over(w)
        flag = F.when(prev.isNull() | (gap if gap is not None else (F.col(order) - prev > 1)), 1).otherwise(0)
    else:
        flag = F.when(new_group, 1).otherwise(0)
    return df.withColumn(out, F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)))
