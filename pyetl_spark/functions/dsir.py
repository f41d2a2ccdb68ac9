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
at most ``num_buckets`` rows — kilobytes, collected to the driver and
re-broadcast so the final plan never re-derives it from the corpus). Pass 2
re-explodes grams, joins the BROADCAST bucket table, and hash-aggregates
per-doc sums (map-side combinable on the doc key). No wide join, no sort;
selection is ``TakeOrdered`` (per-partition top-k, no global sort shuffle).
Driver state is the bounded stats table (≤ ``num_buckets`` rows). All gram
hashing is the md5/Horner family from :mod:`pyetl_spark.functions.text`, so
every stage has a value-exact DuckDB oracle.
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


def _gram_buckets_arrow(
    df: DataFrame, id_col: str, text_col: str, target: Column, num_buckets: int,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """``(id, __t, gs array<long>)`` — the Arrow fast path for
    :func:`ngram_buckets`, value-identical (asserted by
    tests/test_dsir.py::test_arrow_gram_parity) but avoiding the
    interpreted per-word md5 HOF eval: hashlib.md5 once per *distinct* word
    (bounded vocabulary memo), Horner bigram combine as vectorized numpy
    ops. Map-only — text never leaves its input partition. Same discipline
    as dedup._shingle_sets_md5_arrow (the measured ~5x on the minhash
    path)."""
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    from pyetl_spark.functions.text import MERSENNE31 as P
    from pyetl_spark.functions.text import SHINGLE_A as A

    # Java \s (ASCII-only), mirroring normalize_text's regexp_replace
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np

        memo: dict[str, int] = {}
        memo_cap = 2_000_000

        def whash(w: str) -> int:
            h = memo.get(w)
            if h is None:
                h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16) % P
                if len(memo) < memo_cap:
                    memo[w] = h
            return h

        for pdf in batches:
            out = []
            for text in pdf["__text"]:
                if text is None:
                    out.append([])
                    continue
                t = ws.sub(" ", str(text).lower()).strip(" ")
                wl = t.split(" ") if t else []
                n = len(wl)
                if n == 0:
                    out.append([])
                    continue
                wm = np.fromiter((whash(w) for w in wl), dtype=np.int64, count=n)
                parts = []
                for k in ns:
                    if n < k:
                        continue
                    acc = wm[: n - k + 1].copy()
                    for j in range(1, k):
                        acc = (acc * A + wm[j : j + acc.size]) % P
                    parts.append(acc)
                gs = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
                out.append((gs % num_buckets).tolist())
            yield pd.DataFrame({"id": pdf["__id"], "__t": pdf["__tgt"], "gs": out})

    id_type = df.schema[id_col].dataType.simpleString()
    src = df.select(
        F.col(id_col).alias("__id"),
        target.cast("boolean").alias("__tgt"),
        F.col(text_col).alias("__text"),
    )
    return src.mapInPandas(run, schema=f"id {id_type}, __t boolean, gs array<long>")


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


def _stats_local(stats: DataFrame) -> tuple[DataFrame, int, int]:
    """Materialize the bucket-stats table on the driver (bounded: at most
    ``num_buckets`` rows, kilobytes) and rebuild it as a local DataFrame.

    This caps the whole scorer at TWO corpus passes: without it, the corpus
    text is re-hashed three times (totals action, the stats subtree inside
    the final plan's broadcast build, and the fold side). Totals come from
    the same collected rows — no extra action."""
    rows = [(int(r["b"]), int(r["n_raw"]), int(r["n_tgt"] or 0)) for r in stats.collect()]
    n_raw = sum(r[1] for r in rows)
    n_tgt = sum(r[2] for r in rows)
    local = stats.sparkSession.createDataFrame(
        rows or [(0, 0, 0)], "b long, n_raw long, n_tgt long"
    )
    if not rows:
        local = local.limit(0)
    return local, n_raw, n_tgt


def _score_frames(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column | None,
    num_buckets: int,
    use_arrow: bool,
) -> tuple[DataFrame, DataFrame]:
    """``(stats, grams)`` for the two scoring passes — Arrow gram hashing by
    default, the pure-Column path kept for parity checks (``use_arrow=False``
    is value-identical; tests/test_dsir.py asserts it)."""
    if target is None:
        target = F.lit(False)
    if use_arrow:
        gmat = _gram_buckets_arrow(df, id_col, text_col, target, num_buckets)
        stats = (
            gmat.select(
                F.col("__t").cast("long").alias("__t"), F.explode("gs").alias("b")
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n_raw"), F.sum("__t").alias("n_tgt"))
        )
        grams = gmat.select(F.col("id").alias(id_col), F.explode("gs").alias("b"))
    else:
        stats = dsir_bucket_stats(df, text_col, target, num_buckets)
        grams = df.select(
            F.col(id_col),
            F.explode(ngram_buckets(F.col(text_col), num_buckets)).alias("b"),
        )
    return stats, grams


def _doc_fold(
    df: DataFrame,
    grams: DataFrame,
    stats: DataFrame,
    per_bucket: Column,
    out_name: str,
    zero,
    id_col: str,
) -> DataFrame:
    """Shared pass 2: broadcast-join the bucket table onto the exploded
    grams, fold ``per_bucket`` per document. Docs with no grams are restored
    with ``zero`` by a doc-keyed left join from a column-pruned id scan (no
    re-hash of the text)."""
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
    use_arrow: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight (the paper's estimator).

    ``weight = sum_g [ log p-hat(b(g)) - log q-hat(b(g)) ]`` with Laplace
    smoothing ``alpha`` on both multinomials. Returns
    ``(id, weight double, n_grams long)``; documents with no grams weigh 0.
    This is the production scoring path; for the cross-engine contract the
    integer-exact :func:`dsir_scores_exact` avoids float-sum ordering
    differences between engines."""
    stats_d, grams = _score_frames(df, id_col, text_col, target, num_buckets, use_arrow)
    stats, n_raw, n_tgt = _stats_local(stats_d)
    log_tgt_denom = math.log(n_tgt + alpha * num_buckets)
    log_raw_denom = math.log(n_raw + alpha * num_buckets)
    w = (
        F.log(F.col("n_tgt") + F.lit(float(alpha)))
        - F.lit(log_tgt_denom)
        - F.log(F.col("n_raw") + F.lit(float(alpha)))
        + F.lit(log_raw_denom)
    )
    return _doc_fold(df, grams, stats, w, "weight", 0.0, id_col)


def dsir_scores_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target: Column | None = None,
    num_buckets: int = 8192,
    use_arrow: bool = True,
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
    stats_d, grams = _score_frames(df, id_col, text_col, target, num_buckets, use_arrow)
    stats, n_raw, n_tgt = _stats_local(stats_d)
    score = F.col("n_tgt") * F.lit(n_raw) - F.col("n_raw") * F.lit(n_tgt)
    return _doc_fold(df, grams, stats, score, "dsir_score", 0, id_col)


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
