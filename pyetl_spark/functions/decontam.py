"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (the GPT-3 / Pile discipline —
any doc carrying a verbatim eval n-gram is quarantined before training).

The reference has no analog (its nearest machinery is the `in:fich`
membership predicate, pyetl/moteur/fonctions_externes.py — row-at-a-time
key lookup); this is the corpus-scale generalization: membership of any
SUBSTRING-shaped feature of the row, not the row's key.

Scale shape (100 TB corpus, MB-GB eval set): the corpus side is a linear
explode of word n-grams; the eval side — tiny by construction — is
distinct-hashed and BROADCAST, so the probe is a map-side hash semi-join
with no corpus shuffle. The only shuffle is the final per-doc count
aggregation (map-side combinable). If the eval set ever outgrows
broadcast range, drop `broadcast=` to False and the same plan becomes a
shuffle hash join on the 8-byte gram hash — never on the gram text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality import word_ngrams


def normalize_text(col: Column) -> Column:
    """Matching-canonical form: lowercase, every non-alphanumeric run
    collapsed to one space, trimmed. Deliberately expressible verbatim in
    DuckDB (lower + regexp_replace + trim) so oracles stay value-exact."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def eval_grams(
    eval_df: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """Distinct md5-hashed word n-grams of the eval set — the (small)
    build side of the probe. md5 (not xxhash64) so DuckDB oracles can
    recompute the identical key."""
    g = word_ngrams(normalize_text(F.col(text_col)), n)
    return (
        eval_df.select(F.explode(g).alias("gram"))
        .select(F.md5("gram").alias("gram_h"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 13,
    broadcast: bool = True,
) -> DataFrame:
    """Per-document contamination profile against an eval set:
    ``(id, n_grams, n_hits, contaminated)`` where n_hits counts the doc's
    n-gram OCCURRENCES (not distinct grams) found in the eval set and
    contaminated = n_hits > 0. Every input doc appears exactly once —
    routing (quarantine vs train) is the caller's filter, mirroring
    gopher_gate's flag-don't-delete contract.

    Plan: corpus explode → broadcast-hash semi-probe (inner join counted
    as LEFT so misses keep zero) → one map-side-combinable hash-agg on id.
    """
    ev = eval_grams(eval_df, eval_text_col, n)
    if broadcast:
        ev = F.broadcast(ev)
    g = docs.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(normalize_text(F.col(text_col)), n)).alias(
            "gram"
        ),
    ).select(id_col, F.md5("gram").alias("gram_h"))
    hits = g.join(ev, "gram_h", "left_semi").groupBy(id_col).agg(
        F.count("*").alias("n_hits")
    )
    totals = g.filter(F.col("gram_h").isNotNull()).groupBy(id_col).agg(
        F.count("*").alias("n_grams")
    )
    base = docs.select(id_col)
    out = base.join(totals, id_col, "left").join(hits, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )
