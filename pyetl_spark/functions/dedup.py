"""Corpus deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the whole point of these shapes at 100 TB):

- **exact**: one hash aggregation on a content fingerprint — map-side
  combinable, no pairwise work ever.
- **MinHash + LSH banding**: signatures are pure Column expressions —
  words hashed once, shingle hashes combined arithmetically (zip_with),
  n_hashes universal-hash permutations derived by multiply-mod, min-agg'd.
  Banding turns the O(n²) pair problem into groupBy(band_idx, band_hash) —
  only docs sharing a band bucket meet, and the verify join touches just the
  candidate pairs. Bucket explosion on degenerate data is capped with
  ``max_bucket`` (log + drop, never silently).
- **SimHash**: 64-bit sketch per doc via one Arrow-batched pandas UDF
  (bit-majority over word hashes is not expressible as a Column without 64
  aggregates); near-dups = identical sketch (or banded sketch bytes for
  hamming tolerance).
- **n-gram Jaccard**: exact verify primitive over shingle arrays
  (array_intersect/array_union) — used as the re-rank stage after LSH.
- **embedding cosine**: random-hyperplane LSH bucketing then exact cosine
  within buckets (see similarity.py for the shared primitives).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyetl_spark.functions.text import (
    fingerprint_md5,
    md5_int60,
    normalize_text,
    word_shingle_hashes,
    word_shingle_hashes_md5,
    word_shingles,
    words,
)


# ----------------------------------------------------------------- exact


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """duplicate groups by content fingerprint: representative = min id,
    n_dups = group size. Output: fp, keep_id, n_dups (n_dups >= 2)."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") >= 2)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """keep one row per distinct content (min id survivor)."""
    fp = df.withColumn("__fp", fingerprint_md5(F.col(text_col)))
    winners = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(winners, ["__fp", id_col], "left_semi").drop("__fp")


# --------------------------------------------------------------- MinHash/LSH

# universal-hash family over the Mersenne prime 2^31-1: h_i = (a_i*h + b_i) mod p.
# One string hash per shingle + n_hashes fused multiply-mods (all codegen'd
# int64 arithmetic, overflow-free: a,b,h < p so a*h+b < 2^62), instead of
# n_hashes full string hashes per shingle — ~10x less hash CPU at corpus scale.
_MERSENNE_P = (1 << 31) - 1


def _uh_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """deterministic (a, b) pairs, a != 0."""
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _MERSENNE_P), rnd.randrange(0, _MERSENNE_P)) for _ in range(n_hashes)]


def _uh(base: Column, a: int, b: int) -> Column:
    return F.pmod(F.lit(a) * base + F.lit(b), F.lit(_MERSENNE_P))


def minhash_signature(text: Column, n_hashes: int = 32, k_shingle: int = 3) -> Column:
    """array<long> MinHash signature — min over shingles of universal hashes.

    NOTE: higher-order functions (transform/array_min) run interpreted
    (CodegenFallback); fine for ad-hoc per-row use, but the corpus-scale
    path is ``minhash_signatures_agg`` (explode + hash aggregation), which
    stays in whole-stage codegen and gets map-side partial combine."""
    sh = F.array_distinct(word_shingle_hashes(text, k_shingle))
    base = F.transform(sh, lambda h: F.pmod(h, F.lit(_MERSENNE_P)))
    mins = [
        F.array_min(F.transform(base, lambda h, ab=ab: _uh(h, *ab)))
        for ab in _uh_params(n_hashes)
    ]
    return F.array(*mins)


def _shingle_sets_md5_arrow(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, sh) distinct md5-family word-k-shingle hashes via an
    Arrow-batched ``mapInPandas`` — value-identical to
    ``array_distinct(word_shingle_hashes_md5(text, k))`` (asserted by
    tests/test_functions.py::test_md5_shingle_arrow_parity) but ~5x faster:
    Spark higher-order-function lambdas run INTERPRETED (one md5+conv
    expression-tree eval per word), while this path does hashlib.md5 per
    *distinct* word (vocabulary memo across the batch) and the Horner
    combine as three vectorized numpy ops per doc. Map-only — no shuffle,
    text never leaves its input partition."""
    import hashlib
    import re

    from pyetl_spark.functions.text import MERSENNE31 as P
    from pyetl_spark.functions.text import SHINGLE_A as A

    # Java \s (ASCII-only), mirroring normalize_text's regexp_replace;
    # Python \s would additionally eat unicode whitespace and diverge
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # bounded memo: web-scale vocabulary (typos/URLs/ids) is unbounded,
        # and this dict lives for the whole partition — cap it so a multi-GB
        # partition can't push the Python worker OOM; past the cap new words
        # are hashed without being remembered (hot words are already in)
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
            out_sh = []
            for text in pdf["__text"]:
                if text is None:
                    out_sh.append([])
                    continue
                t = ws.sub(" ", str(text).lower()).strip(" ")
                wl = t.split(" ") if t else []
                n = len(wl)
                if n < k:
                    out_sh.append([])
                    continue
                wm = np.fromiter((whash(w) for w in wl), dtype=np.int64, count=n)
                acc = wm[: n - k + 1].copy()
                for j in range(1, k):
                    acc = (acc * A + wm[j : j + acc.size]) % P
                out_sh.append(np.unique(acc).tolist())
            yield pd.DataFrame({"id": pdf["__id"], "sh": out_sh})

    # preserve the caller's id type (string URIs, decimals, …) — only the
    # text column's derived shingle schema is fixed
    id_type = df.schema[id_col].dataType.simpleString()
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    return src.mapInPandas(run, schema=f"id {id_type}, sh array<long>")


def shingle_sets(
    df: DataFrame, text_col: str, id_col: str, k: int, hash_family: str
) -> DataFrame:
    """(id, sh) distinct word-k-shingle hash sets. ``md5`` family routes to
    the Arrow fast path (same values, see _shingle_sets_md5_arrow); ``xx``
    stays on the Column expression (xxhash64 has no Python twin)."""
    if hash_family == "md5":
        return _shingle_sets_md5_arrow(df, text_col, id_col, k)
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingle_hashes(F.col(text_col), k)).alias("sh"),
    )


def minhash_signatures_agg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    k_shingle: int = 3,
    hash_family: str = "xx",
) -> DataFrame:
    """per-doc MinHash signature via explode + n_hashes min-aggregates — the
    codegen'd, partially-combinable formulation. Output: (id, h0..h{n-1},
    n_shingles). Cost: one shuffle keyed by id over (doc × shingle) rows;
    each WORD is string-hashed once (shingle identity = combined word
    hashes), per-permutation values derived arithmetically (universal
    hashing).

    ``hash_family``: ``"xx"`` (xxhash64 chain — fastest, engine-internal) or
    ``"md5"`` (md5-derived 60-bit shingle hashes a SQL oracle can recompute
    value-exactly — the contract/parity configuration)."""
    sets = shingle_sets(df, text_col, id_col, k_shingle, hash_family)
    ex = sets.select("id", F.explode("sh").alias("s")).select(
        "id", F.pmod(F.col("s"), F.lit(_MERSENNE_P)).alias("h")
    )
    aggs = [F.min(_uh(F.col("h"), a, b)).alias(f"h{i}") for i, (a, b) in enumerate(_uh_params(n_hashes))]
    return ex.groupBy("id").agg(*aggs, F.count("*").alias("n_shingles"))


def _band_key_col(cols: list[Column], b: int, hash_family: str) -> Column:
    """one band's bucket key from its signature components — shared by the
    batch LSH and the incremental registry so their keys are identical."""
    if hash_family == "md5" and len(cols) == 2:
        # exact packing: h values live in [0, P), so h0*P + h1 is a
        # bijective BIGINT key (< 2^62) — collision-free, cheaper to
        # shuffle/join than a string, and trivially oracle-recomputable
        return (cols[0] * F.lit(_MERSENNE_P) + cols[1]).alias(f"bh{b}")
    joined = F.concat_ws(",", *[c.cast("string") for c in cols])
    if hash_family == "md5":
        return joined.alias(f"bh{b}")  # oracle-recomputable string key
    return F.xxhash64(joined, F.lit(b)).alias(f"bh{b}")


def band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    hash_family: str = "xx",
) -> DataFrame:
    """(doc_id, band_idx, band_hash) LSH band membership — the row unit the
    incremental near-dup registry (functions/incremental.py) persists; two
    docs are banding candidates iff they share any (band_idx, band_hash)."""
    rows = n_hashes // bands
    sig = minhash_signatures_agg(df, text_col, id_col, n_hashes, k_shingle, hash_family)
    band_cols = [
        _band_key_col([F.col(f"h{i}") for i in range(b * rows, (b + 1) * rows)], b, hash_family)
        for b in range(bands)
    ]
    return sig.select("id", *band_cols).select(
        F.col("id").alias("doc_id"),
        F.posexplode(F.array(*[F.col(f"bh{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )


def lsh_min_agree(n_hashes: int, threshold: float, est_margin: float) -> int:
    """minimum agreeing signature components for the estimate pre-filter:
    ceil((threshold - est_margin) * n_hashes). Shared by the engine and the
    SQL-oracle generator so both compute the identical cut."""
    import math

    return math.ceil(max(0.0, threshold - est_margin) * n_hashes)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 50,
    hash_family: str = "xx",
    est_margin: float | None = None,
) -> DataFrame:
    """near-duplicate pairs (a < b) with exact-Jaccard verification.

    signature → ``bands`` bands of ``n_hashes/bands`` rows; docs sharing any
    band bucket become candidates; candidates are verified with exact
    Jaccard over distinct shingles. Returns (a, b, jaccard).

    ``hash_family="md5"`` makes the whole pipeline value-exact against a SQL
    oracle: md5-derived shingle hashes and plain concatenated band keys
    (instead of xxhash64 band hashes) — both recomputable in DuckDB.

    ``est_margin`` enables estimate-then-verify: candidates whose signatures
    agree on fewer than ``lsh_min_agree(n_hashes, threshold, est_margin)``
    of the ``n_hashes`` components are pruned BEFORE the exact-Jaccard
    verify. The estimate join touches only the narrow signature rows
    (n_hashes ints/doc); the wide shingle-set join then sees only the
    survivors — at a low threshold (where banding passes many junk pairs)
    this removes most of the verify cost. The prune is part of the pipeline
    spec (same role as the signature distance in Spark ML's
    ``approxSimilarityJoin``): a pair with true Jaccard just above
    ``threshold`` has expected agreement ``threshold*n_hashes`` and may fall
    under the cut with binomial probability — choose ``est_margin`` so
    ``(threshold-est_margin)*n_hashes`` sits the desired number of
    σ=sqrt(n*j*(1-j)) below that. ``None`` disables the stage (exact verify
    for every band candidate — the strict-recall configuration).
    """
    rows = n_hashes // bands

    # distinct shingle-hash sets, computed ONCE and persisted: both the
    # signature path (explode + min-agg) and the exact-Jaccard verification
    # consume them, and the string→hash work is the most expensive scalar
    # stage — paying it twice doubled the whole query's cost. The md5
    # family runs it on the Arrow fast path (see _shingle_sets_md5_arrow).
    sh = shingle_sets(df, text_col, id_col, k_shingle, hash_family).persist()

    ex = sh.select("id", F.explode("sh").alias("s")).select(
        "id", F.pmod(F.col("s"), F.lit(_MERSENNE_P)).alias("h")
    )
    aggs = [
        F.min(_uh(F.col("h"), a, b)).alias(f"h{i}")
        for i, (a, b) in enumerate(_uh_params(n_hashes))
    ]
    # signatures are narrow (n_hashes ints per doc) and consumed by up to
    # three downstream jobs (bucket-size count, bucket collect, estimate
    # join) — materialize once, lineage cut, nothing cached long-term
    sig = ex.groupBy("id").agg(*aggs).localCheckpoint(eager=True)

    # band keys as plain columns (codegen'd), melted to (id, band_idx, band_hash)
    band_cols = [
        _band_key_col([F.col(f"h{i}") for i in range(b * rows, (b + 1) * rows)], b, hash_family)
        for b in range(bands)
    ]
    melted = sig.select("id", *band_cols).select(
        "id",
        F.posexplode(F.array(*[F.col(f"bh{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    # bucket-size count pre-filter BEFORE any collect_list: the count agg is
    # map-side combinable (its shuffle carries one row per bucket per map
    # partition), and it guarantees no aggregation buffer ever materializes
    # a degenerate bucket's id array — collecting first and capping on
    # F.size afterwards would build an unbounded in-memory array for exactly
    # the pathological bucket max_bucket exists to guard (ADVICE r02).
    # melted is consumed twice, but it derives from the CHECKPOINTED sig by
    # pure projection — recompute is a posexplode, not a re-aggregation.
    # Oversize buckets are log-and-drop, never silent at scale.
    sizes = (
        melted.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("__n"))
        .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket))
    )
    # expand pairs IN-ARRAY (a<b via sorted ids): bucket size is now bounded
    # by max_bucket, so both the collected array and the per-group expansion
    # are tiny
    grouped = (
        melted.join(sizes, ["band_idx", "band_hash"], "left_semi")
        .groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cand = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )

    # estimate-then-verify: prune candidates on signature agreement before
    # touching the wide shingle sets. Sharing one band already implies
    # `rows` agreeing components, so the cut only bites above that.
    if est_margin is not None:
        min_agree = lsh_min_agree(n_hashes, threshold, est_margin)
        if min_agree > rows:
            sa = sig.select(F.col("id").alias("a"), *[F.col(f"h{i}").alias(f"__ha{i}") for i in range(n_hashes)])
            sb = sig.select(F.col("id").alias("b"), *[F.col(f"h{i}").alias(f"__hb{i}") for i in range(n_hashes)])
            agree = sum(
                F.when(F.col(f"__ha{i}") == F.col(f"__hb{i}"), 1).otherwise(0)
                for i in range(n_hashes)
            )
            cand = (
                cand.join(sa, "a")
                .join(sb, "b")
                .filter(agree >= F.lit(min_agree))
                .select("a", "b")
            )

    # exact-Jaccard verification over the same persisted shingle sets (at
    # corpus scale this is the stage to give StorageLevel.DISK_ONLY or to
    # re-derive per side if storage is tighter than CPU)
    verified = (
        cand.join(sh.select(F.col("id").alias("a"), F.col("sh").alias("sha_")), "a")
        .join(sh.select(F.col("id").alias("b"), F.col("sh").alias("shb_")), "b")
    )
    jac = (
        F.size(F.array_intersect("sha_", "shb_"))
        / F.greatest(F.size(F.array_union("sha_", "shb_")), F.lit(1))
    )
    result = (
        verified.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    # materialize once (localCheckpoint cuts the lineage) so the persisted
    # shingle sets can be released HERE — repeated calls in a long-lived
    # session (bench loop, notebook) must not accumulate cached blocks in
    # executor storage (ADVICE r01). The checkpointed result is small
    # (verified pairs only).
    result = result.localCheckpoint(eager=True)
    sh.unpersist()
    return result


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    k_shingle: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """exact n-gram Jaccard pairs within a blocking key (a < b).

    Without LSH this is the verify-everything form: the self-join is
    restricted to ``block_col`` groups (at scale: always block — by LSH
    band, length bucket, or source partition)."""
    base = df.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(0)).alias("blk"),
        F.array_distinct(word_shingle_hashes(F.col(text_col), k_shingle)).alias("sh"),
    )
    l = base.alias("l")
    r = base.alias("r")
    pairs = l.join(r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")))
    jac = (
        F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
        / F.greatest(F.size(F.array_union(F.col("l.sh"), F.col("r.sh"))), F.lit(1))
    )
    return (
        pairs.select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------------- SimHash


def _word_hash64(w: str) -> int:
    """deterministic 64-bit word hash (Python's builtin hash is salted
    per-process — useless across executors)."""
    import hashlib

    return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little", signed=False)


from pyspark.sql import types as T  # noqa: E402


@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word hashes (Arrow-batched; numpy bit-majority)."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        ws = t.lower().split()
        if not ws:
            continue
        hs = np.array(
            [np.uint64(_word_hash64(w)) for w in set(ws)],
            dtype=np.uint64,
        )
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
        maj = (bits * 2 >= len(hs)).astype(np.uint64)
        val = np.uint64(0)
        for b in np.nonzero(maj)[0]:
            val |= np.uint64(1) << np.uint64(b)
        out[i] = val.astype(np.int64)
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    return df.withColumn(out, _simhash64(normalize_text(F.col(text_col))))


SIMHASH_AGG_BITS = 60  # md5_int60 width; keeps 1<<b inside ANSI int64


def simhash_agg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "simhash",
) -> DataFrame:
    """SimHash as pure Column expressions: explode distinct words, md5-derived
    60-bit word hashes (:func:`pyetl_spark.functions.text.md5_int60`), one
    hash-aggregate with 60 per-bit popcounts, sketch assembled from strict
    bit majorities (``2*cnt >= n_words``).

    Two wins over the pandas-UDF sketch (:func:`simhash`): stays in
    whole-stage codegen with map-side partial aggregation (the 100 TB shape),
    and every step is value-exact recomputable in DuckDB SQL, so the driver
    oracle can certify it. Docs with no words get sketch 0 (same as the UDF).

    Output: ``df`` columns ``(id_col, out)`` for every input row.
    """
    bits = SIMHASH_AGG_BITS
    ex = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(words(normalize_text(F.col(text_col))))).alias("__w"),
    ).select(F.col(id_col), md5_int60(F.col("__w")).alias("__h"))
    aggs = [
        F.sum(F.shiftrightunsigned("__h", b).bitwiseAND(F.lit(1))).alias(f"__c{b}")
        for b in range(bits)
    ] + [F.count("*").alias("__n")]
    counts = ex.groupBy(id_col).agg(*aggs)
    sketch = F.lit(0).cast("long")
    for b in range(bits):
        sketch = sketch + F.when(
            F.col(f"__c{b}") * 2 >= F.col("__n"), F.lit(1 << b)
        ).otherwise(F.lit(0))
    sk = counts.select(F.col(id_col), sketch.alias(out))
    # keep empty-word docs (explode dropped them): sketch 0
    return df.select(id_col).join(sk, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col(out), F.lit(0).cast("long")).alias(out)
    )


def simhash_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "udf",
) -> DataFrame:
    """identical-sketch duplicate groups (hamming-0); near-miss tolerance is
    :func:`simhash_near_dup_pairs`. ``method="agg"`` uses the codegen'd,
    oracle-checkable sketch (:func:`simhash_agg`)."""
    sk = (
        simhash_agg(df, text_col, id_col)
        if method == "agg"
        else simhash(df, text_col).select(id_col, "simhash")
    )
    return (
        sk.groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") >= 2)
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | None = 200,
    method: str = "udf",
) -> DataFrame:
    """near-duplicate pairs with Hamming distance <= ``max_hamming`` on the
    SimHash sketch — the classic banded pigeonhole: split the sketch into
    ``bands`` slices; two sketches within hamming k < bands must agree
    EXACTLY on at least one slice, so candidates come from an equi
    groupBy/join on (band_idx, slice-bits), never an all-pairs scan. The
    exact popcount filter then verifies. Requires ``max_hamming < bands``
    for zero false negatives (pigeonhole); with ``max_bucket=None``
    (uncapped) the output is therefore IDENTICAL to the all-pairs scan — the
    oracle-checkable configuration. ``method="agg"`` uses the codegen'd
    60-bit :func:`simhash_agg` sketch.
    """
    if max_hamming >= bands:
        raise ValueError("pigeonhole guarantee needs max_hamming < bands")
    nbits = SIMHASH_AGG_BITS if method == "agg" else 64
    width = nbits // bands
    if method == "agg":
        sk = simhash_agg(df, text_col, id_col, out="sk").withColumnRenamed(id_col, "id")
    else:
        sk = simhash(df.select(F.col(id_col).alias("id"), F.col(text_col)), text_col, out="sk")

    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("sk"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_bits"),
            )
            for b in range(bands)
        ]
    )
    melted = sk.select("id", "sk", F.explode(slices).alias("s")).select(
        "id", "sk", F.col("s.band_idx").alias("band_idx"), F.col("s.band_bits").alias("band_bits")
    )
    sizes = melted.groupBy("band_idx", "band_bits").agg(F.count("*").alias("n"))
    keep = F.col("n") >= 2
    if max_bucket is not None:
        keep = keep & (F.col("n") <= max_bucket)
    ok = sizes.filter(keep).drop("n")
    melted = melted.join(ok, ["band_idx", "band_bits"], "left_semi")

    l, r = melted.alias("l"), melted.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_bits") == F.col("r.band_bits"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.sk").alias("ska"),
            F.col("r.sk").alias("skb"),
        )
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("ska").bitwiseXOR(F.col("skb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# --------------------------------------------- C4-style duplicate chunks


def chunk_words(col: Column, size: int = 4) -> Column:
    """array<string> of non-overlapping ``size``-word chunks (the "line"
    unit for corpora whose documents carry no newlines).  The last chunk may
    be shorter; empty/whitespace-free text yields one chunk ([""])."""
    w = F.split(col, " ")
    n = F.greatest(F.ceil(F.size(w) / size).cast("int"), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(w, i * size + 1, size), " "),
    )


def dedup_duplicate_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 4,
    min_docs: int = 3,
) -> DataFrame:
    """C4-style intra-corpus span removal: any chunk that appears in at
    least ``min_docs`` DISTINCT documents is cut from every document; the
    survivors are re-joined in original order.  Returns ``(id, clean_text,
    n_kept, n_chunks)`` (clean_text = '' when everything was boilerplate).

    The reference's nearest machinery is ``unique``'s whole-object key walk
    (pyetl/moteur/traitements.py) — per-object, in-memory; this is the
    span-level corpus-wide form C4/RefinedWeb use against boilerplate.

    Plan shape at 100 TB: posexplode (linear) → count-distinct hash-agg on
    the chunk's md5 (16-byte shuffle key instead of the span text) → anti
    join back → one sort-free re-aggregation (order restored by sorting the
    collected (pos, chunk) structs per doc, not by a global sort).  No
    window over the corpus, no driver state; AQE is free to broadcast the
    duplicate-chunk side when it is small.
    """
    ex = df.select(
        id_col, F.posexplode(chunk_words(F.col(text_col), chunk_size)).alias("pos", "chunk")
    ).withColumn("chash", F.md5(F.col("chunk")))
    dup = (
        ex.groupBy("chash")
        .agg(F.countDistinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("chash")
    )
    kept = ex.join(dup, "chash", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = ex.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
        )
    )
