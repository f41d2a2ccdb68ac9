"""Physical-plan assertions: the rule compiler must produce plans Catalyst
can fuse — N chained column rules == ONE projection in one WholeStageCodegen
span — plus macro expansion and K: conditional compilation (SURVEY §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.rules import Rule, RuleContext, apply_rules
from pyetl_spark.rules.macros import MacroStore, when_param


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("a", "hello world", "3"), ("b", "bye", "4")], "k string, txt string, n string"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chained_column_rules_collapse_to_one_projection(df):
    rules = [
        Rule(op="upper", out="txt", inp="txt"),
        Rule(op="sub", out="txt", inp="txt", p1="L+", p2="L"),
        Rule(op="len", out="txt_len", inp="txt"),
        Rule(op="checksum", out="sha", inp="txt"),
        Rule(op="set", out="tag", default="x:[k]"),
        Rule(op="calc", out="n2", p1="cast(n as int) * 2"),
    ]
    out = apply_rules(df, rules, RuleContext())
    plan = _plan(out)
    # all six rules fuse into ONE WholeStageCodegen span over the scan: no
    # exchange, no extra stages, every operator codegen'd (stage id 1).
    # (Catalyst may keep >1 Project node to avoid re-evaluating a reused
    # non-cheap expression — that is the plan we want, still one stage.)
    assert "Exchange" not in plan and "CodegenFallback" not in plan
    assert plan.count("*(") == plan.count("*(1)") > 0
    r = out.filter("k = 'a'").first()
    assert r.txt == "HELO WORLD" and r.txt_len == 10 and r.n2 == 6 and r.tag == "x:a"


def test_macro_expand_positional_and_named(df):
    store = MacroStore()
    store.define(
        "norm_and_hash",
        [
            Rule(op="upper", out="%1", inp="%1"),
            Rule(op="checksum", out="%out%", inp="%1"),
        ],
    )
    rules = store.expand("norm_and_hash", "txt", out="txt_sha")
    assert rules[0].out == "txt" and rules[1].out == "txt_sha"
    out = apply_rules(df, rules, RuleContext())
    assert out.first().txt == out.first().txt.upper()
    assert len(out.first().txt_sha) == 64

    # unbound %var% passes through for the context layer
    store.define("tagger", [Rule(op="set", out="tag", default="%env%")])
    assert store.expand("tagger")[0].default == "%env%"
    with pytest.raises(KeyError):
        store.expand("nope")


def test_when_param_conditional_compilation(df):
    ctx = RuleContext(params={"mode": "full"})
    rules = [Rule(op="upper", out="txt", inp="txt")] + when_param(
        ctx, "mode", "debug", [Rule(op="set", out="dbg", default="1")]
    )
    out = apply_rules(df, rules, ctx)
    assert "dbg" not in out.columns  # elided at plan time

    ctx2 = RuleContext(params={"mode": "debug"})
    rules2 = [Rule(op="upper", out="txt", inp="txt")] + when_param(
        ctx2, "mode", "debug", [Rule(op="set", out="dbg", default="1")]
    )
    assert "dbg" in apply_rules(df, rules2, ctx2).columns
