"""Deterministic synthetic change-event generation (north_rule input_hint).

Event schema: ``(seq:long, op:string, repo:string, path:string,
commit:string, lang:string, content:string)`` — the Iceberg source-code table
shape plus the CDC envelope (seq = monotonically increasing commit sequence,
op ∈ {upsert, delete}).

Generation is **fully distributed**: ``spark.range(n)`` + pure Column
expressions of ``seq`` and ``seed`` — no driver-side data, no RNG state, so
the same (n, seed) always produces the identical dataset at any parallelism
(this is what lets the two-cluster-size scaling runs consume byte-identical
input). Hot-repo skew is power-law: repo index = floor(R * u^alpha) for
uniform u, alpha>1 concentrating mass on low indices (Zipf-like head).

The reference has no generator; its test fixtures are tiny CSVs
(outils/tests/fichiers/refdata). This module is the 10^10-scale analog: at
sf targets you raise ``n`` — the plan is O(1) driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "js", "go", "rs", "java", "c", "cpp", "rb", "ts", "sql"]

EVENT_SCHEMA = (
    "seq long, op string, repo string, path string, commit string, "
    "lang string, content string"
)


def _u(col, seed: int, salt: int):
    """deterministic uniform [0,1) from a column + seed."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def change_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 1000,
    paths_per_repo: int = 200,
    seed: int = 42,
    alpha: float = 3.0,
    delete_pct: int = 5,
    content_repeat: int = 4,
    partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Build the event DataFrame for seq ∈ [start, n_events). Every column is
    a pure function of seq+seed, so any sub-range is consistent with the
    whole. ``alpha`` controls hot-repo skew."""
    if partitions:
        df = spark.range(start, n_events, numPartitions=partitions)
    else:
        df = spark.range(start, n_events)
    seq = F.col("id")

    repo_idx = F.floor(F.lit(n_repos) * F.pow(_u(seq, seed, 1), F.lit(alpha))).cast("int")
    path_idx = F.pmod(F.xxhash64(seq, F.lit(seed), F.lit(2)), F.lit(paths_per_repo)).cast("int")
    commit = F.lower(F.hex(F.xxhash64(seq, F.lit(seed), F.lit(3))))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64(seq, F.lit(seed), F.lit(4)), F.lit(len(LANGS))) + 1).cast("int"),
    )
    op = F.when(
        F.pmod(F.xxhash64(seq, F.lit(seed), F.lit(5)), F.lit(100)) < delete_pct,
        F.lit("delete"),
    ).otherwise(F.lit("upsert"))
    body = F.lower(F.hex(F.xxhash64(seq, F.lit(seed), F.lit(6))))
    content = F.concat_ws(
        "\n",
        F.format_string("// %s", commit),
        F.repeat(F.concat(F.lit("line "), body, F.lit(";\n")), content_repeat),
    )

    return df.select(
        seq.alias("seq"),
        op.alias("op"),
        F.format_string("repo-%05d", repo_idx).alias("repo"),
        F.format_string("src/f_%04d.txt", path_idx).alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def write_event_batches(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_batches: int = 10,
    **kwargs,
) -> list[str]:
    """Materialize the event stream as ``n_batches`` parquet sub-batches
    (``batch_00000/``, ...) — the replayable file source for Structured
    Streaming (deterministic offsets → checkpoint resume is exact,
    SURVEY §7.3). Returns the batch directories in order."""
    per = n_events // n_batches
    dirs = []
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per if b < n_batches - 1 else n_events
        df = change_events(spark, hi, start=lo, **kwargs)
        path = f"{out_dir}/batch_{b:05d}"
        df.write.mode("overwrite").parquet(path)
        dirs.append(path)
    return dirs
