"""CCNet-style n-gram language-model perplexity filtering.

Public method (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020): fit a word-level LM on a trusted
target slice of the corpus (CCNet uses Wikipedia; here any boolean target
predicate, e.g. ``lang = 'en'``), score every document by its per-token
cross-entropy under that model, and keep the low-perplexity head. The model
here is an add-one-smoothed bigram LM over hashed words:

    p(w2 | w1) = (B(w1,w2) + 1) / (U(w1) + V + 1)

where ``B`` is the bigram occurrence count in the training slice, ``U`` the
context (first-word) occurrence count, and ``V`` the training vocabulary
size (the +1 reserves mass for unseen words, so the distribution sums to
exactly 1 over vocab ∪ {OOV}). The reference engine has no analog — this is
the training-data curation tier alongside ``quality.py`` (Gopher gates) and
``dsir.py`` (distribution-matching selection): DSIR *matches* a target
distribution, the perplexity filter *ranks by fluency* under it.

Word identity is the md5/Horner family from :mod:`.text` (word hash
``md5_int60(w) mod (2^31-1)``, bigram hash Horner-combined), so every count
and every log-probability is recomputable by a DuckDB oracle — and the
per-document sum is folded in token order over a position-sorted array, so
the float accumulation order is deterministic and engine-independent (IEEE
``+`` is exact per operation; only ``ln`` may differ in the last ulp, which
``round(ce, 4)`` absorbs).

100 TB shape: training is two map-side-combinable hash aggregates over the
exploded target slice (bigram counts + context counts) plus one distinct
count; scoring is one explode and two equi joins on 64-bit int keys —
broadcast when the model is small (AQE decides), shuffle-hash on hashed
words (near-uniform keys, no skew) when it is not — then a per-document
hash aggregate. No global sort anywhere; the head/middle/tail bucketing
uses ``approxQuantile`` thresholds (driver state: 2 scalars), not a
corpus-wide window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from pyetl_spark.functions.text import (
    MERSENNE31,
    SHINGLE_A,
    md5_int60,
    normalize_text,
    words,
)

__all__ = [
    "LMModel",
    "lm_fit",
    "lm_cross_entropy",
    "lm_ppl_buckets",
    "lm_filter_head",
]


def _word_hashes(col: Column) -> Column:
    """array<long> of per-word hashes in [0, 2^31-1) — oracle-exact."""
    return F.transform(
        words(normalize_text(col)), lambda w: F.pmod(md5_int60(w), F.lit(MERSENNE31))
    )


def _bigram_pairs(wm: Column) -> Column:
    """array<struct<ctx,big>> aligned per bigram position (len n-1).

    ``ctx`` is the first word's hash (the conditioning context), ``big`` the
    Horner combine ``(ctx * A + w2) mod P`` — identical to
    ``word_shingle_hashes_md5(col, 2)`` values, recomputable in SQL."""
    n1 = F.greatest(F.size(wm) - 1, F.lit(0))
    # zip_with pads the shorter side with null, so slice BOTH arrays to n-1
    # (the inner zip's last element combines the final word with null)
    big = F.slice(
        F.zip_with(
            wm,
            F.slice(wm, 2, F.size(wm)),
            lambda a, b: F.pmod(a * F.lit(SHINGLE_A) + b, F.lit(MERSENNE31)),
        ),
        1,
        n1,
    )
    return F.zip_with(
        F.slice(wm, 1, n1), big, lambda c, b: F.struct(c.alias("ctx"), b.alias("big"))
    )


@dataclass
class LMModel:
    """A fitted bigram LM: two count tables + the vocabulary size.

    ``bigrams``: (big: long, bc: long); ``contexts``: (ctx: long, uc: long);
    ``vocab``: distinct training words (driver-side scalar — bounded state).
    Both DataFrames are unpersisted corpus aggregates; cache them for
    repeated scoring passes."""

    bigrams: DataFrame
    contexts: DataFrame
    vocab: int


def lm_fit(df: DataFrame, text_col: str, target: Column) -> LMModel:
    """Fit the add-one bigram LM on ``df`` rows where ``target`` holds.

    Two corpus-linear passes over the slice: one explode → two hash
    aggregates (map-side combinable; result sizes are vocab- not
    corpus-bounded), one distinct count for V."""
    tr = df.filter(target).select(_word_hashes(F.col(text_col)).alias("__wm"))
    grams = tr.select(F.explode(_bigram_pairs(F.col("__wm"))).alias("g")).select(
        F.col("g.ctx").alias("ctx"), F.col("g.big").alias("big")
    )
    bigrams = grams.groupBy("big").agg(F.count("*").alias("bc"))
    contexts = grams.groupBy("ctx").agg(F.count("*").alias("uc"))
    vocab = (
        tr.select(F.explode("__wm").alias("w")).agg(F.countDistinct("w")).collect()[0][0]
    )
    return LMModel(bigrams=bigrams, contexts=contexts, vocab=int(vocab))


def lm_cross_entropy(
    df: DataFrame, id_col: str, text_col: str, model: LMModel, round_to: int | None = 4
) -> DataFrame:
    """Per-document cross-entropy (nats/token) under ``model``.

    Returns one row per input row: ``(id_col, n_bigrams, oov_bigrams,
    cross_entropy)``. Documents with fewer than 2 words have no bigrams and
    score NULL (callers decide their fate; CCNet drops them). The per-doc
    log-prob sum folds a position-sorted array left-to-right so the value is
    bit-deterministic regardless of shuffle order; ``round_to=None`` skips
    the rounding for production ranking (ranking never needs it — it exists
    for cross-engine value equality)."""
    base = df.select(F.col(id_col), _word_hashes(F.col(text_col)).alias("__wm"))
    tok = base.select(
        id_col, F.posexplode(_bigram_pairs(F.col("__wm"))).alias("pos", "g")
    ).select(id_col, "pos", F.col("g.ctx").alias("ctx"), F.col("g.big").alias("big"))
    j = (
        tok.join(model.bigrams, "big", "left")
        .join(model.contexts, "ctx", "left")
        .select(
            id_col,
            "pos",
            (
                F.log(F.coalesce(F.col("bc"), F.lit(0)) + F.lit(1).cast("double"))
                - F.log(
                    F.coalesce(F.col("uc"), F.lit(0))
                    + F.lit(model.vocab + 1).cast("double")
                )
            ).alias("logp"),
            F.when(F.col("bc").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
        )
    )
    folded = j.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("oov").alias("oov_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["logp"],
        ).alias("__lp"),
    )
    ce = -F.col("__lp") / F.col("n_bigrams")
    if round_to is not None:
        ce = F.round(ce, round_to)
    return (
        df.select(id_col)
        .join(folded, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("oov_bigrams", F.lit(0)).alias("oov_bigrams"),
            ce.alias("cross_entropy"),
        )
    )


def lm_ppl_buckets(
    scored: DataFrame,
    ce_col: str = "cross_entropy",
    head_frac: float = 0.33,
    tail_frac: float = 0.33,
    rel_err: float = 0.001,
) -> DataFrame:
    """CCNet head/middle/tail labels from approx cross-entropy quantiles.

    Thresholds come from ``approxQuantile`` (two driver scalars, no global
    sort); NULL-scored docs (under 2 words) label ``'tail'`` as CCNet drops
    them. Production path — bucketing by approximate quantile is not
    value-stable enough for a hash-exact contract, so this is pytest-only."""
    lo, hi = scored.approxQuantile(ce_col, [head_frac, 1.0 - tail_frac], rel_err)
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col(ce_col).isNull(), F.lit("tail"))
        .when(F.col(ce_col) <= F.lit(lo), F.lit("head"))
        .when(F.col(ce_col) > F.lit(hi), F.lit("tail"))
        .otherwise(F.lit("middle")),
    )


def lm_filter_head(
    df: DataFrame,
    scored: DataFrame,
    id_col: str,
    keep: tuple[str, ...] = ("head", "middle"),
    **bucket_kw,
) -> DataFrame:
    """Keep the documents whose perplexity bucket is in ``keep`` — the
    CCNet filtering step, one broadcast-friendly semi join on the id."""
    kept = lm_ppl_buckets(scored, **bucket_kw).filter(
        F.col("ppl_bucket").isin(*keep)
    )
    return df.join(kept.select(id_col), id_col, "semi")
