"""Similarity search over embedding columns (``array<float>``).

- ``cosine(a, b)``: pure Column expression (``zip_with`` dot product +
  ``aggregate`` norms) — JVM-side, no Python.
- ``brute_force_topk``: exact top-k against a query vector — the baseline;
  one narrow projection + one top-k (no shuffle beyond the final k-row
  ordering with AQE-coalesced partitions).
- ``rhp_signature`` / ``ann_topk``: random-hyperplane LSH — the scale path:
  the corpus is bucketed once by sign-bit signature; a query probes its own
  bucket (optionally hamming-adjacent buckets) and re-ranks exactly. At
  100 TB the signature column is precomputed and the table is clustered by
  it, so a query touches ~1/2^bits of the data.
- ``knn_join_blocked``: k-NN join between two embedding sets, blocked by
  shared signature bucket (the IVF-style coarse quantization analog).

Hyperplanes are deterministic (numpy PCG64 with fixed seed, shipped as
plan-time literals — tiny: bits × dim floats).
"""

from __future__ import annotations

import logging
import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """generic (unknown-dim) dot product via higher-order functions.

    NOTE: Spark evaluates zip_with/aggregate in interpreted mode
    (CodegenFallback) — correct but ~10x slower than the unrolled form.
    Use ``dot_fixed`` whenever the dimension is known at plan time."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """dim known at plan time → unrolled Σ a[i]*b[i]: stays inside
    whole-stage codegen AND adds left-to-right (bit-identical to a
    sequential-loop oracle)."""
    out = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    return dot_fixed(a, b, dim) / F.greatest(
        norm_fixed(a, dim) * norm_fixed(b, dim), F.lit(1e-12)
    )


def _vec_lit(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


# ---------------------------------------------------------------- SQL builders
#
# Unrolled fixed-dim expressions built Column-by-Column cost thousands of
# py4j driver round-trips (seconds of plan-CONSTRUCTION latency per query at
# dim=64). These builders emit the identical expression as ONE SQL string
# parsed JVM-side by a single F.expr call — same operators, same
# left-to-right evaluation order, same values (repr(float) round-trips
# exactly and the 'D' suffix parses as double). Operand strings should be
# plain (possibly alias-qualified) column names of array<double> columns —
# cast/alias the array first, then reference it by name.


def _flit(x: float) -> str:
    # repr(float) round-trips exactly and 'D' parses as double — but only
    # for finite values: repr(inf/nan) is not valid SQL, and a NaN query
    # vector or hyperplane is a caller bug (cosine against it is undefined),
    # so fail with a clear message instead of a parser error (ADVICE r02)
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(
            f"non-finite vector component {x!r}: query vectors / hyperplanes "
            "must contain only finite floats"
        )
    return f"{x!r}D"


def dot_fixed_sql(a: str, b: str, dim: int) -> str:
    """Σ a[i]*b[i], left-to-right (Spark SQL subscripts are 0-based)."""
    return " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))


def dot_const_sql(a: str, q: list[float]) -> str:
    """Σ a[i]*q_i against a literal vector."""
    return " + ".join(f"{a}[{i}] * {_flit(q[i])}" for i in range(len(q)))


def norm_fixed_sql(a: str, dim: int) -> str:
    return f"sqrt({dot_fixed_sql(a, a, dim)})"


def cosine_fixed_sql(a: str, b: str, dim: int) -> str:
    """same float ops/order as :func:`cosine_fixed`."""
    return (
        f"({dot_fixed_sql(a, b, dim)}) / "
        f"greatest(({norm_fixed_sql(a, dim)}) * ({norm_fixed_sql(b, dim)}), 1e-12D)"
    )


def cosine_const_sql(a: str, q: list[float]) -> str:
    """same float ops/order as :func:`cosine_const`."""
    qnorm = float(np.sqrt(sum(x * x for x in q))) or 1e-12
    return (
        f"({dot_const_sql(a, q)}) / "
        f"greatest(({norm_fixed_sql(a, len(q))}) * {_flit(qnorm)}, 1e-12D)"
    )


def rhp_signature_sql(vexpr: str, planes: list[list[float]]) -> str:
    """same bit tests/order as :func:`rhp_signature` (sum type widens to
    BIGINT, value-identical)."""
    return " + ".join(
        f"(CASE WHEN {dot_const_sql(vexpr, p)} >= 0 THEN {1 << i}L ELSE 0L END)"
        for i, p in enumerate(planes)
    )


def cosine_const(vec: Column, query: list[float]) -> Column:
    """cosine(vec, literal query): the query norm folds to a literal, so the
    expression is ONE unrolled dot + one self-dot — half the codegen of
    ``cosine_fixed`` against a literal."""
    dim = len(query)
    qnorm = float(np.sqrt(sum(x * x for x in query))) or 1e-12
    return dot_fixed(vec, _vec_lit(query), dim) / F.greatest(
        norm_fixed(vec, dim) * F.lit(qnorm), F.lit(1e-12)
    )


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """exact cosine top-k vs one query vector (the correctness baseline)."""
    scored = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql("__v", query)), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def _seq_dot(a, b) -> float:
    """strict left-to-right float64 dot — the same operation order as the
    unrolled ``dot_fixed`` Column and a ``v[1]*p1 + v[2]*p2 + …`` SQL
    expression, for cross-engine sign agreement."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def rhp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """random-hyperplane sign signature as an int bucket id."""
    bits = [
        F.when(dot_fixed(vec, _vec_lit(p), len(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 6,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """approximate top-k: probe the query's RHP bucket (± hamming-1 buckets),
    exact cosine re-rank inside. Recall/efficiency dial = bits, multiprobe."""
    dim = len(query)
    planes = hyperplanes(dim, bits, seed)
    # sequential left-to-right dot (NOT np.dot's pairwise summation): matches
    # bit-for-bit the unrolled dot_fixed the corpus side and the SQL oracle
    # evaluate, so a near-zero projection can't flip a signature bit on one
    # side only.
    qsig = sum(
        (1 << i)
        for i, p in enumerate(planes)
        if _seq_dot(query, p) >= 0
    )
    probe = {qsig}
    if multiprobe_hamming >= 1:
        probe |= {qsig ^ (1 << i) for i in range(bits)}

    dfv = df.withColumn("__vecd", F.col(vec_col).cast("array<double>"))
    sig = F.expr(rhp_signature_sql("__vecd", planes))
    cand = dfv.withColumn("__sig", sig).filter(F.col("__sig").isin(list(probe)))
    scored = cand.select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql("__vecd", query)), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def knn_join_blocked(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """for each left row, top-k right rows by cosine, meeting only within the
    shared RHP bucket (IVF-coarse analog). Output: (left_id, right_id,
    cos_sim, rank)."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(left.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)

    def prep(df: DataFrame, side: str) -> DataFrame:
        # norms are per-ROW properties: hoist them before the join so the
        # per-pair work is ONE dot, not dot + two 64-term self-dots (3x)
        vc = f"{side}_vec"
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).cast("array<double>").alias(vc),
        ).select(
            "*",
            F.expr(norm_fixed_sql(vc, dim)).alias(f"{side}_norm"),
            F.expr(rhp_signature_sql(vc, planes)).alias("__sig"),
        )

    l, r = prep(left, "left"), prep(right, "right")
    # shuffle-hash join on the signature, NOT broadcast: (a) at corpus scale
    # the right side is the full dataset — never broadcastable — and
    # co-partitioning both sides on __sig is the plan that survives 100x;
    # (b) the exchange MATERIALIZES the hoisted sig/norm projections.
    # Under a broadcast join Catalyst collapses them into the join's output
    # projection and re-evaluates the 448-term expressions once per OUTPUT
    # PAIR instead of once per row — measured 2.2s vs 0.9s at sf0.1 (the
    # round-2 norm hoisting was silently defeated by projection collapse).
    pairs = l.hint("shuffle_hash").join(r, "__sig").filter(
        F.col("left_id") != F.col("right_id")
    )
    # same float ops in the same order as cosine_fixed, just hoisted
    cos = F.expr(dot_fixed_sql("left_vec", "right_vec", dim)) / F.greatest(
        F.col("left_norm") * F.col("right_norm"), F.lit(1e-12)
    )
    scored = pairs.select(
        "left_id",
        "right_id",
        F.round(cos, 6).alias("cos_sim"),
    )
    w = Window.partitionBy("left_id").orderBy(F.desc("cos_sim"), F.col("right_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 6,
    seed: int = 42,
) -> DataFrame:
    """embedding-cosine near-duplicate pairs (a < b) within RHP buckets."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).select(
        "*",
        F.expr(norm_fixed_sql("vec", dim)).alias("nrm"),
        F.expr(rhp_signature_sql("vec", planes)).alias("__sig"),
    )
    l = base.alias("l")
    r = base.alias("r")
    # shuffle-hash on __sig for the same two reasons as knn_join_blocked:
    # a self-join's build side is never broadcastable at corpus scale, and
    # the exchange pins the hoisted nrm/__sig projections so they are
    # computed once per ROW, not re-inlined once per candidate PAIR.
    pairs = l.hint("shuffle_hash").join(
        r, (F.col("l.__sig") == F.col("r.__sig")) & (F.col("l.id") < F.col("r.id"))
    )
    # norms hoisted per row (same float ops/order as cosine_fixed)
    cos = F.expr(dot_fixed_sql("l.vec", "r.vec", dim)) / F.greatest(
        F.col("l.nrm") * F.col("r.nrm"), F.lit(1e-12)
    )
    return (
        pairs.select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------- IVF


def ivf_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    sample_rows: int = 100_000,
    max_iter: int = 20,
) -> list[list[float]]:
    """Train the IVF coarse quantizer (k-means centroids) — the scale path
    for ANN when RHP buckets are too coarse.

    Training runs driver-side in numpy on a bounded SAMPLE (the standard
    IVF recipe — a quantizer fit on ~10^5 vectors serves billions; faiss
    does the same), so no iterative distributed job is needed; the
    distributed parts are assignment (:func:`ivf_assign`, pure codegen'd
    Columns) and the probed scan (:func:`ivf_topk`). Deterministic via
    seeded k-means++ init + Lloyd iterations."""
    pdf = df.select(F.col(vec_col).cast("array<double>").alias("v")).limit(sample_rows).toPandas()
    x = np.array(pdf["v"].tolist(), dtype=np.float64)
    rng = np.random.default_rng(seed)

    # k-means++ init
    centers = [x[rng.integers(len(x))]]
    for _ in range(1, n_centroids):
        d2 = np.min([np.sum((x - c) ** 2, axis=1) for c in centers], axis=0)
        probs = d2 / max(d2.sum(), 1e-12)
        centers.append(x[rng.choice(len(x), p=probs)])
    c = np.array(centers)

    for _ in range(max_iter):  # Lloyd
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        newc = np.array(
            [x[assign == i].mean(axis=0) if (assign == i).any() else c[i] for i in range(n_centroids)]
        )
        if np.allclose(newc, c):
            break
        c = newc
    return c.tolist()


def ivf_fit_seeds(
    df: DataFrame,
    ids: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic coarse quantizer: centroids = the embeddings of the
    given row ids, in the given order (the "random seeds" IVF variant —
    no Lloyd iterations). Data-derived but reproducible from the table
    alone, so a SQL oracle can recompute the full IVF pipeline
    (assignment → probe → scan) value-exactly; :func:`ivf_fit` (sampled
    k-means) remains the quality path."""
    rows = {
        r[id_col]: r[vec_col]
        for r in df.filter(F.col(id_col).isin(list(ids))).select(id_col, vec_col).collect()
    }
    missing = [i for i in ids if i not in rows]
    if missing:
        raise ValueError(f"ivf_fit_seeds: ids not in table: {missing}")
    return [[float(x) for x in rows[i]] for i in ids]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out: str = "ivf_cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (L2) as a cell id — pure
    Column expressions (unrolled distances + array argmin), codegen'd; at
    write time this column is the partition key of the vector table."""
    dim = len(centroids[0])
    # ||v||^2 hoisted once (argmin is invariant to it, kept for clarity of
    # true distances); per-centroid work = one unrolled dot + two literals
    with_vv = df.withColumn("__vd", F.col(vec_col).cast("array<double>")).withColumn(
        "__vv", F.expr(dot_fixed_sql("__vd", "__vd", dim))
    )
    dists = F.array(
        *[
            F.col("__vv")
            - F.lit(2.0) * F.expr(dot_const_sql("__vd", c))
            + F.lit(float(sum(x * x for x in c)))
            for c in centroids
        ]
    )
    cell = F.array_position(dists, F.array_min(dists)) - 1
    return with_vv.withColumn(out, cell.cast("int")).drop("__vv", "__vd")


def ivf_topk(
    df: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank centroids by distance to the query driver-side, scan
    only the ``nprobe`` nearest cells, exact cosine re-rank inside. With the
    table partitioned by cell, the scan prunes to nprobe/n_centroids of the
    data before any distance math."""
    # expanded form (qq - 2 q·c + cc) with strict left-to-right sums — the
    # same operation order as ivf_assign's Column expression and the SQL
    # oracle, so probe ranking agrees across engines even on near-ties.
    qq = _seq_dot(query, query)
    qdists = [qq - 2.0 * _seq_dot(query, c) + _seq_dot(c, c) for c in centroids]
    order = np.argsort(qdists, kind="stable")
    probe = [int(x) for x in order[:nprobe]]
    cand = ivf_assign(df, centroids, vec_col).filter(F.col("ivf_cell").isin(probe))
    scored = cand.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql("__v", query)), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


# ------------------------------------------------------------- SemDeDup

_sd_log = logging.getLogger(__name__)


def semdedup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    tau: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023) candidate stage: assign every vector
    to its nearest centroid (``ivf_assign`` — unrolled L2, first-min
    argmin), then emit within-cell pairs with cosine ≥ ``tau`` as
    ``(cell, a, b, cos_sim)`` with a < b and cos rounded to 6.

    Scale shape: the pair join is an equi join on the cell id (shuffle-hash
    hinted, co-partitioned — never all-pairs across cells); norms are
    hoisted per ROW before the join so per-pair work is one dot product.
    ``max_cell`` caps degenerate cells (log + drop, never silently): the
    cell-size probe is one tiny aggregate — at most ``len(centroids)``
    rows — so the guard costs one scan of the assignment, not a join.

    The assignment is PINNED (localCheckpoint) before the self-join: the
    argmin-over-centroids expression is enormous, and left un-pinned it is
    re-evaluated on BOTH join inputs and inlined into the join stage,
    blowing generated code past JIT limits (interpreted fallback). The
    per-pair dot is zip_with+aggregate, not the dim-unrolled expression —
    same left-to-right IEEE sum, but constant codegen size; measured 3×
    faster at dim 64 inside the join stage (the unrolled form still wins
    for SINGLE-row norms/centroid distances, where it stays in one
    whole-stage-codegen projection)."""
    dim = len(centroids[0])
    cells = ivf_assign(df, centroids, vec_col, out="cell")
    base = (
        cells.select(
            id_col,
            "cell",
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .withColumn("__n", F.expr(norm_fixed_sql("__v", dim)))
        .localCheckpoint(eager=True)
    )
    if max_cell is not None:
        sizes = base.groupBy("cell").agg(F.count("*").alias("n"))
        big = [r["cell"] for r in sizes.filter(F.col("n") > max_cell).collect()]
        if big:
            _sd_log.warning(
                "semdedup_pairs: dropping %d cell(s) over max_cell=%d: %s",
                len(big), max_cell, sorted(big),
            )
            base = base.filter(~F.col("cell").isin(big))
    l, r = base.alias("l"), base.alias("r")
    pairs = l.hint("shuffle_hash").join(
        r,
        (F.col("l.cell") == F.col("r.cell"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    cos = F.aggregate(
        F.zip_with("l.__v", "r.__v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.greatest(F.col("l.__n") * F.col("r.__n"), F.lit(1e-12))
    return pairs.select(
        F.col("l.cell").alias("cell"),
        F.col(f"l.{id_col}").alias("a"),
        F.col(f"r.{id_col}").alias("b"),
        F.round(cos, 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= tau)


def semdedup_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Drop every pair's higher id (the SemDeDup keep-one-per-near-dup-set
    policy with lowest-id canonical): one distinct + one anti join."""
    drops = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(drops, id_col, "left_anti")
