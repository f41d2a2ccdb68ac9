"""Text analysis for training-data pipelines: language id, quality scoring,
token counting, fingerprinting, shingling.

All hot-path functions are native Column expressions (JVM, codegen) — no
Python in the per-row path. Hash-based fingerprints use ``md5`` where the
result must be oracle-checkable across engines (DuckDB has md5 too) and
``xxhash64`` where only internal consistency matters (faster, 8 bytes).

Reference tie-in: these generalize the reference's per-attribute text
commands (len/sub/format, traitement_alpha.py) into corpus-level operators
the reference never needed at GIS scale but a 100 TB text pipeline does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal per-language stopword beacons for the n-gram/stopword heuristic
LANG_BEACONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "fr": ["le", "la", "les", "et", "de", "un", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "los", "y", "de", "que", "es"],
}

EN_STOPWORDS = LANG_BEACONS["en"] + ["it", "for", "on", "with", "as", "at", "by"]


def words(col: Column) -> Column:
    """whitespace tokenization (empty text → empty array)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != "")


def token_count(col: Column) -> Column:
    """whitespace token count."""
    return F.size(words(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: alpha runs + digit runs + individual
    punctuation, the standard cheap proxy for subword token count."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    pat = r"(?i)\b(" + "|".join(sw) + r")\b"
    return F.regexp_count(col, F.lit(pat)) / F.greatest(token_count(col), F.lit(1))


def punct_ratio(col: Column) -> Column:
    return F.regexp_count(col, F.lit(r"[^\w\s]")) / F.greatest(F.length(col), F.lit(1))


def mean_word_len(col: Column) -> Column:
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return total / F.greatest(F.size(w), F.lit(1))


def quality_score(col: Column) -> Column:
    """heuristic document quality in [0,1]: rewards sane word length and
    some stopword presence, penalizes punctuation soup and trivial length.
    Deterministic and SQL-mirrorable (the DuckDB oracle recomputes it)."""
    n = token_count(col)
    mwl = mean_word_len(col)
    len_ok = F.when((n >= 5) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    wl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
    return F.round((len_ok + wl_ok + sw + punct_pen) / 4.0, 6)


def lang_scores(col: Column) -> dict[str, Column]:
    """per-language stopword-beacon hit counts."""
    return {
        lang: F.regexp_count(F.lower(col), F.lit(r"\b(" + "|".join(ws) + r")\b"))
        for lang, ws in LANG_BEACONS.items()
    }


def lang_id(col: Column, default: str = "und") -> Column:
    """argmax language by beacon hits; deterministic tie-break by language
    code order; ``und`` when nothing matches."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    out: Column = F.lit(default)
    for lang in sorted(scores, reverse=True):  # earlier codes win ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace — the canonical form for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_md5(col: Column) -> Column:
    """content fingerprint over normalized text (cross-engine checkable)."""
    return F.md5(normalize_text(col))


def fingerprint_xx(col: Column) -> Column:
    """fast 64-bit internal fingerprint."""
    return F.xxhash64(normalize_text(col))


def word_shingles(col: Column, k: int = 3) -> Column:
    """array of word-level k-shingles (rolling window, space-joined)."""
    w = words(normalize_text(col))
    n = F.size(w)
    # sequence(1, 0) would DESCEND in Spark; emit an empty index array instead
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, k)))


def word_shingle_hashes(col: Column, k: int = 3) -> Column:
    """array<long> of 64-bit hashes of word-level k-shingles — the corpus-
    scale form of :func:`word_shingles`.

    Why not the string form: building shingle strings costs one array-slice
    allocation + string concat PER SHINGLE (interpreted HOF); here each word
    is hashed ONCE (one cheap pass) and adjacent word-hashes are combined
    with ``xxhash64`` under ``zip_with`` — k-1 whole-array zips, no string
    materialization. Downstream set ops (MinHash, Jaccard) only need shingle
    *identity*, and 64-bit collisions are negligible at corpus scale, so
    Jaccard/minhash values are identical to the string form.
    """
    wh = F.transform(words(normalize_text(col)), lambda w: F.xxhash64(w))
    acc = wh
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(wh, j + 1, F.size(wh)), lambda a, b: F.xxhash64(a, b))
    # zip_with pads the shorter side with null (xxhash64 skips nulls), so the
    # last k-1 entries are prefix hashes — drop them
    n = F.size(wh)
    return F.slice(acc, 1, F.greatest(n - (k - 1), F.lit(0)))


def md5_int60(col: Column) -> Column:
    """60-bit non-negative int64 from the md5 hex prefix (15 hex chars).

    The cross-engine-checkable hash primitive: DuckDB computes the identical
    value as ``('0x' || substr(md5(x),1,15))::BIGINT``, so any operator built
    on it (MinHash families, SimHash sketches) gets a value-exact SQL oracle.
    60 bits keeps universal-hash arithmetic (a*h+b, a,h < 2^31) far from
    ANSI-mode int64 overflow."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# shingle combine constants for the md5 hash family: values stay in
# [0, MERSENNE31) so Horner steps (h*A + w) peak below 2^62 — safe under
# ANSI int64 in Spark AND DuckDB's overflow-checked BIGINT arithmetic.
MERSENNE31 = (1 << 31) - 1
SHINGLE_A = 1_000_003


def word_shingle_hashes_md5(col: Column, k: int = 3) -> Column:
    """array<long> of md5-derived hashes of word k-shingles — the
    oracle-checkable sibling of :func:`word_shingle_hashes` (which chains
    xxhash64, engine-internal).

    Each WORD is md5-hashed once (mod 2^31-1), then adjacent word hashes are
    Horner-combined arithmetically (``(h*A + w) mod P``) with whole-array
    ``zip_with`` — no per-shingle string materialization, no per-shingle
    md5. That keeps the only interpreted-HOF cost at one md5+conv per word;
    a SQL oracle mirrors the exact values with ``list_transform`` over the
    same literals (see __spark_entry__._duck_shingle_hash_list). 31-bit
    shingle identities are fine for parity corpora; the 64-bit xxhash64
    family remains the corpus-scale default."""
    p = F.lit(MERSENNE31)
    wm = F.transform(words(normalize_text(col)), lambda w: F.pmod(md5_int60(w), p))
    acc = wm
    for j in range(1, k):
        # zip_with pads the shorter slice with null; null propagates through
        # the arithmetic and the tail is sliced off below
        acc = F.zip_with(
            acc,
            F.slice(wm, j + 1, F.size(wm)),
            lambda a, b: F.pmod(a * F.lit(SHINGLE_A) + b, p),
        )
    n = F.size(wm)
    return F.slice(acc, 1, F.greatest(n - (k - 1), F.lit(0)))


def char_ngrams(col: Column, n: int = 5) -> Column:
    """array of character n-grams over normalized text."""
    t = normalize_text(col)
    ln = F.length(t)
    idx = F.when(ln >= n, F.sequence(F.lit(1), ln - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.substr(t, i, F.lit(n)))
