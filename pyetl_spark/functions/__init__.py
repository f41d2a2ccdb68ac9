"""Training-data pipeline functions: text analysis, dedup, similarity,
multimodal column plumbing (project brief: first-class components alongside
the reference operator inventory)."""

from pyetl_spark.functions import (  # noqa: F401
    components,
    decontam,
    dedup,
    dsir,
    incremental,
    lm,
    multimodal,
    packing,
    quality,
    similarity,
    text,
)
