"""Relational operator layer (SURVEY §2.4-§2.8)."""

from pyetl_spark.operators.relational import (
    join_lookup,
    semi_join,
    anti_join,
    unique,
    unique_n,
    merge_rows,
    objgroup,
    stat,
    compare,
    multiplex,
    topk,
    asof_join,
    sample_1_in_n,
    getkey,
    changed,
    sessionize,
)

__all__ = [
    "join_lookup",
    "semi_join",
    "anti_join",
    "unique",
    "unique_n",
    "merge_rows",
    "objgroup",
    "stat",
    "compare",
    "multiplex",
    "topk",
    "asof_join",
    "sample_1_in_n",
    "getkey",
    "changed",
    "sessionize",
]
