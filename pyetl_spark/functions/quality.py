"""Corpus quality / safety signals for training-data curation.

Two families the reference has no analog for (its closest machinery is the
per-attribute regex layer, pyetl/moteur/fonctions_externes.py `sub`/`re:`
predicates — row-at-a-time CPython): PII scan/redaction and
repetition-based quality scoring (the Gopher/"rep-frac" family).  Both are
pure JVM-side ``Column`` expressions or plain hash-aggregations — no Python
in the hot path — so they run inside whole-stage codegen and scale with
the scan.

Regex portability: the patterns below deliberately avoid lookarounds and
backreferences so the SAME pattern string is valid and equivalent in Java
regex (Spark) and RE2 (DuckDB oracles, Go tooling).  Keep it that way when
adding kinds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: emails first so an address's digit runs are consumed before the
# ip/phone passes see them (redaction is a sequential rewrite)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}

PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of matches of one PII kind (codegen'd regexp_extract_all)."""
    return F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def pii_redact(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its typed token, in PII_PATTERNS order
    (order matters: kinds are rewritten sequentially)."""
    out = col
    for k in kinds if kinds is not None else list(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[k], PII_TOKENS[k])
    return out


def word_counts(col: Column) -> tuple[Column, Column]:
    """(n_words, n_distinct_words) over a single-space-tokenized column."""
    w = F.split(col, " ")
    return F.size(w), F.size(F.array_distinct(w))


def word_repetition_frac(col: Column) -> Column:
    """Gopher-style duplicate-word fraction: 1 - distinct/total (0 for
    all-distinct text; → 1 as the text degenerates to one repeated word)."""
    n, d = word_counts(col)
    return F.round((n - d) / n, 6)


def word_ngrams(col: Column, n: int = 2) -> Column:
    """array<string> of space-joined word n-grams (empty when the text has
    fewer than ``n`` words — guarded so F.sequence never runs descending).

    The split array is bound as a LAMBDA VARIABLE (via a singleton-array
    transform) before the per-gram loop touches it: Catalyst does no common
    subexpression elimination across higher-order-function boundaries, so
    referencing ``split(col)`` directly inside the inner lambda would
    re-split the whole text for every element_at — measured 35 s → 4 s on
    211k 13-grams at sf0.1 (the n× full-text re-parse dwarfed the actual
    n-gram work)."""

    def per_words(w: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        )
        return F.when(F.size(w) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return F.get(F.transform(F.array(F.split(col, " ")), per_words), 0)


def gram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram repetition profile: ``(id, n_grams,
    n_distinct_grams, top_gram_cnt, top_gram_frac)`` where top_gram_frac is
    the fraction of all n-gram occurrences held by the single most frequent
    n-gram (the Gopher "fraction of characters in the most common n-gram"
    signal, occurrence-weighted).

    Plan shape: explode → two chained hash-aggregations (both map-side
    partial), one shuffle each on (id, gram) then id — linear in corpus
    size, no window, no driver state.  The top gram itself is deliberately
    NOT returned: on ties it would be nondeterministic across engines,
    while its count/fraction are exact.
    """
    grams = df.select(id_col, F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    prof = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.count("*").alias("n_distinct_grams"),
        F.max("cnt").alias("top_gram_cnt"),
    )
    out = df.select(id_col).join(prof, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_distinct_grams", F.lit(0)).alias("n_distinct_grams"),
        F.coalesce("top_gram_cnt", F.lit(0)).alias("top_gram_cnt"),
        F.when(
            F.col("n_grams") > 0, F.round(F.col("top_gram_cnt") / F.col("n_grams"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("top_gram_frac"),
    )


def gopher_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 10_000,
    max_word_rep: float = 0.6,
    max_top_gram: float = 0.05,
    n: int = 2,
) -> DataFrame:
    """The composed Gopher-style quality gate: word-count bounds +
    duplicate-word fraction + top-n-gram occurrence share, as one
    DataFrame op returning ``(id, n_words, word_rep_frac, top_gram_frac,
    kept)``.  Callers drop rejected docs with ``.filter("kept")`` — the
    flag is returned (not pre-filtered) so curation pipelines can route
    rejects to a quarantine sink, mirroring the reference's fail/abort
    data-quality gates (pyetl/moteur/commandes.py `fail`) which divert
    rather than delete.

    Plan shape: the scalar signals are pure Columns on the scan; the only
    shuffles are gram_repetition's two chained hash-aggregations plus the
    id-equi join back — all map-side combinable, no window, no skew key
    (ids are unique).
    """
    nw, _nd = word_counts(F.col(text_col))
    sig = df.select(
        id_col,
        nw.alias("n_words"),
        word_repetition_frac(F.col(text_col)).alias("word_rep_frac"),
    )
    prof = gram_repetition(df, id_col, text_col, n).select(id_col, "top_gram_frac")
    out = sig.join(prof, id_col)
    kept = (
        F.col("n_words").between(min_words, max_words)
        & (F.col("word_rep_frac") <= max_word_rep)
        & (F.col("top_gram_frac") <= max_top_gram)
    )
    return out.withColumn("kept", kept)
