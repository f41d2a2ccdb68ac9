"""DSIR-style data selection: hashed n-gram importance weights.

Public method (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): featurize each document as a bag of
hashed word n-grams (unigrams + bigrams), fit multinomial bucket
distributions over a TARGET subset (p-hat) and the RAW corpus (q-hat), score
every raw document by its log-likelihood ratio
``sum_g log(p-hat(bucket(g)) / q-hat(bucket(g)))``, then select the top-k
(or Gumbel-top-k resample, the paper's estimator). The reference engine has
no analog — this is part of the training-data curation tier alongside
``quality.py`` / ``packing.py`` (domain-mix rebalancing covers *quota*
selection; DSIR covers *distribution-matching* selection).

100 TB shape: two corpus-linear passes and nothing else. Pass 1 explodes
grams and hash-aggregates per-bucket counts (map-side combinable, result is
at most ``num_buckets`` rows — kilobytes, broadcast back). Pass 2 re-explodes
grams, joins the BROADCAST bucket table, and hash-aggregates per-doc sums
(map-side combinable on the doc key). No wide join, no sort; selection is
``TakeOrdered`` (per-partition top-k, no global sort shuffle). Driver state
is two scalars (corpus totals). All gram hashing is the md5/Horner family
from :mod:`pyetl_spark.functions.text`, so every stage has a value-exact
DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from pyetl_spark.functions.text import word_shingle_hashes_md5

__all__ = [
    "ngram_buckets",
    "dsir_bucket_stats",
    "dsir_log_weights",
    "dsir_scores_exact",
    "dsir_select",
    "dsir_resample",
]


def ngram_buckets(col: Column, num_buckets: int = 8192, ns: tuple[int, ...] = (1, 2)) -> Column:
    """``array<long>`` of hashed word n-gram feature buckets for one text.

    DSIR's hashed unigram+bigram featurization: every occurrence counts
    (no distinct — the weight is a sum over gram OCCURRENCES), buckets are
    ``gram_hash % num_buckets`` over the md5/Horner family, so DuckDB can
    recompute identical values (see ``__spark_entry__._duck_gram_list``)."""
    parts = [word_shingle_hashes_md5(col, k) for k in ns]
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    return F.transform(grams, lambda g: F.pmod(g, F.lit(num_buckets)))


def dsir_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    target: Column | None = None,
    num_buckets: int = 8192,
) -> DataFrame:
    """Per-bucket gram-occurrence counts: ``(b, n_raw, n_tgt)``.

    ``target`` is a boolean Column marking the target subset (evaluated on
    ``df``'s rows). One explode + one map-side-combinable hash agg; at most
    ``num_buckets`` output rows regardless of corpus size."""
    if target is None:
        target = F.lit(False)
    return (
        df.select(
            target.cast("long").alias("__t"),
            F.explode(ngram_buckets(F.col(text_col), num_buckets)).alias("b"),
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_raw"), F.sum("__t").alias("n_tgt"))
    )


def _totals(stats: DataFrame) -> tuple[int, int]:
    """Corpus gram totals — a bounded collect of ONE row (two scalars)."""
    r = stats.agg(F.sum("n_raw").alias("r"), F.sum("n_tgt").alias("t")).collect()[0]
    return int(r["r"] or 0), int(r["t"] or 0)


def _doc_fold(
    df: DataFrame,
    stats: DataFrame,
    per_bucket: Column,
    out_name: str,
    zero,
    id_col: str,
    text_col: str,
    num_buckets: int,
) -> DataFrame:
    """Shared pass 2: explode grams, broadcast-join the bucket table, fold
    ``per_bucket`` per document. Docs with no grams keep ``zero``."""
    grams = df.select(
        F.col(id_col),
        F.explode(ngram_buckets(F.col(text_col), num_buckets)).alias("b"),
    )
    per_doc = (
        grams.join(F.broadcast(stats), "b")
        .groupBy(id_col)
        .agg(
            F.sum(per_bucket).alias(out_name),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_name), F.lit(zero)).alias(out_name),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target: Column | None = None,
    num_buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight (the paper's estimator).

    ``weight = sum_g [ log p-hat(b(g)) - log q-hat(b(g)) ]`` with Laplace
    smoothing ``alpha`` on both multinomials. Returns
    ``(id, weight double, n_grams long)``; documents with no grams weigh 0.
    This is the production scoring path; for the cross-engine contract the
    integer-exact :func:`dsir_scores_exact` avoids float-sum ordering
    differences between engines."""
    stats = dsir_bucket_stats(df, text_col, target, num_buckets)
    n_raw, n_tgt = _totals(stats)
    log_tgt_denom = math.log(n_tgt + alpha * num_buckets)
    log_raw_denom = math.log(n_raw + alpha * num_buckets)
    w = (
        F.log(F.col("n_tgt") + F.lit(float(alpha)))
        - F.lit(log_tgt_denom)
        - F.log(F.col("n_raw") + F.lit(float(alpha)))
        + F.lit(log_raw_denom)
    )
    return _doc_fold(
        df, stats, w, "weight", 0.0, id_col, text_col, num_buckets
    )


def dsir_scores_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target: Column | None = None,
    num_buckets: int = 8192,
) -> DataFrame:
    """Integer-exact DSIR score: per-bucket cross-multiplied frequency test.

    ``score_b = n_tgt(b) * N_raw - n_raw(b) * N_tgt`` is positive exactly
    when the bucket is over-represented in the target (``p-hat > q-hat``
    before smoothing); the per-doc score sums it over gram occurrences. All
    arithmetic is int64 (sums commute exactly in any order), so Spark and a
    SQL oracle agree bit-for-bit — the parity-friendly sibling of
    :func:`dsir_log_weights`, same two-pass shape. int64 headroom: products
    are bounded by ``per_bucket_count * corpus_grams``; at corpus sizes
    where that nears 2^63 (> ~10^9 grams per bucket) use the log path."""
    stats = dsir_bucket_stats(df, text_col, target, num_buckets)
    n_raw, n_tgt = _totals(stats)
    score = F.col("n_tgt") * F.lit(n_raw) - F.col("n_raw") * F.lit(n_tgt)
    return _doc_fold(
        df, stats, score, "dsir_score", 0, id_col, text_col, num_buckets
    )


def dsir_select(weights: DataFrame, k: int, id_col: str = "doc_id", weight_col: str = "weight") -> DataFrame:
    """Deterministic top-k by (weight desc, id asc) — ``TakeOrdered``
    (per-partition heap + driver merge of k rows), never a global sort."""
    return weights.orderBy(F.col(weight_col).desc(), F.col(id_col).asc()).limit(k)


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k resampling (the paper's sampler: top-k of
    ``weight + Gumbel(0,1)`` draws the same distribution as sampling
    proportional-to-exp(weight) without replacement). The Gumbel noise is
    DETERMINISTIC — ``u = (md5(seed || id) as 60-bit int + 1) / (2^60 + 1)``
    in (0,1), ``g = -log(-log(u))`` — so replays and retries pick the same
    sample (the engine-wide seeded-md5 discipline, cf. packing.py's
    deterministic shuffle)."""
    from pyetl_spark.functions.text import md5_int60

    two60 = float(2**60)
    u = (md5_int60(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))) + 1) / F.lit(two60 + 1)
    key = F.col(weight_col) + -F.log(-F.log(u))
    return (
        weights.withColumn("__gumbel_key", key)
        .orderBy(F.col("__gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__gumbel_key")
    )
