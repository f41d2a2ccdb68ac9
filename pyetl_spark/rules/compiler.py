"""Rule-list → DataFrame-pipeline compiler.

This is the engine's analog of the reference's parse/bind/compile chain
(``moteur/interpreteur_csv.py:282-376`` prepare_regle,
``moteur/compilateur.py:172-256`` compile_regles) and interpreter loop
(``moteur/moteur.py:174-309`` traite_objet) — except that instead of walking a
pointer graph per row, we emit a declarative DataFrame lineage once and let
Catalyst optimize and whole-stage-codegen it (SURVEY §4.2).

Semantics preserved:

- selectors guard the command; non-matching rows keep their prior value
  (``when(cond, new).otherwise(old)`` — pyetl's ok/fail branches that
  reconverge on the next rule).
- modifier ``-``: rows failing the selection are eaten (filter) —
  ``interpreteur_csv.py:208-216``.
- modifier ``+``: matching rows are duplicated down a copy branch carrying the
  transform, then reunified — ``moteur.py:188-196``.
- row-dropping commands (``suppobj``) remove the selected rows.
- cardinality-changing commands (``splitgen``, ``extractbloc``) apply via
  filter-split + ``unionByName`` when guarded.

Scale note: consecutive ColumnEffects compile to chained ``withColumns``
calls; Catalyst's CollapseProject folds them into ONE projection inside one
WholeStageCodegen span, so a 50-rule transform script costs the same as a
single ``select`` — verified in tests/test_compiler_plan.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyetl_spark.rules.predicates import compile_selectors
from pyetl_spark.rules.scalar import COMMANDS, ColumnEffect, DataFrameEffect
from pyetl_spark.rules.spec import Rule, RuleContext


def _safe(cond: Column) -> Column:
    """null-safe condition (null → False), so ~cond keeps null-key rows."""
    return F.coalesce(cond, F.lit(False))


def compile_rules(
    rules: list[Rule], ctx: RuleContext | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Compile an ordered rule list into a reusable DataFrame transform."""
    ctx = ctx or RuleContext()

    def pipeline(df: DataFrame) -> DataFrame:
        for rule in rules:
            df = _apply_one(df, rule, ctx)
        return df

    return pipeline


def apply_rules(df: DataFrame, rules: list[Rule], ctx: RuleContext | None = None) -> DataFrame:
    return compile_rules(rules, ctx)(df)


def _apply_one(df: DataFrame, rule: Rule, ctx: RuleContext) -> DataFrame:
    if rule.op not in COMMANDS:
        raise KeyError(
            f"unknown command {rule.op!r}; registered: {sorted(COMMANDS)}"
        )
    effect = COMMANDS[rule.op](rule, ctx)
    has_cond = bool(rule.sel1 or rule.sel2)
    cond = compile_selectors(rule.sel1, rule.sel2, ctx) if has_cond else None

    if isinstance(effect, DataFrameEffect) and effect.drops:
        # selected rows are removed; no selector → drop everything
        return df.filter(~_safe(cond)) if cond is not None else df.limit(0)

    if rule.mod == "-" and cond is not None:
        # eat rows failing the rule, then apply unconditionally
        df = df.filter(_safe(cond))
        cond = None

    if rule.mod == "+":
        # duplicate matching rows down a transformed copy branch
        src = df.filter(_safe(cond)) if cond is not None else df
        copy = _apply_effect(src, effect, None)
        return df.unionByName(copy, allowMissingColumns=True)

    return _apply_effect(df, effect, cond)


def _apply_effect(df: DataFrame, effect, cond: Column | None) -> DataFrame:
    if isinstance(effect, ColumnEffect):
        if cond is None:
            return df.withColumns(effect.assigns)
        existing = set(df.columns)
        guarded = {
            out: F.when(_safe(cond), expr).otherwise(
                F.col(out) if out in existing else F.lit(None)
            )
            for out, expr in effect.assigns.items()
        }
        return df.withColumns(guarded)

    # DataFrameEffect
    if cond is None:
        return effect.fn(df)
    matched = effect.fn(df.filter(_safe(cond)))
    rest = df.filter(~_safe(cond))
    return matched.unionByName(rest, allowMissingColumns=True)
