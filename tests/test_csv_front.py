"""regle-CSV front-end: a pyetl-format rule script drives the Spark engine."""

from __future__ import annotations

import pytest

from pyetl_spark.rules import RuleContext
from pyetl_spark.rules.csv_front import ScriptError, parse_script, run_script

HEADER = "!att_tri1;valeur_tri1;att_tri2;valeur_tri2;att_sortie;defaut;att_entree;mode;param1;param2;fin;\n"


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("alice", "FR", "10"), ("bob", "", "200"), ("carol", "DE", "5")],
        "name string, country string, amount string",
    )


def test_basic_script(spark, df):
    script = HEADER + (
        ";;;;name_u;;name;upper;;;;\n"
        ";;;;country;XX;country;default;;;;\n"
        ";;;;amount_n;;amount;num;;;;\n"
        "country;FR;;;tag;domestic;;set;;;;\n"
    )
    out = run_script(df, script)
    rows = {r["name"]: r for r in out.collect()}
    assert rows["alice"]["name_u"] == "ALICE"
    assert rows["bob"]["country"] == "XX"       # default filled the empty
    assert rows["alice"]["amount_n"] == 10.0
    assert rows["alice"]["tag"] == "domestic"   # selector matched FR only
    assert rows["bob"]["tag"] is None or rows["bob"]["tag"] == ""


def test_vars_conditionals_macros(spark, df):
    script = HEADER + (
        "$env=prod\n"
        "&&#define;normalize\n"
        ";;;;%1;;%1;upper;;;;\n"
        "&&#enddefine\n"
        "<normalize;country\n"
        "K:%env%=prod;;;;;stage;%env%;;set;;;;\n"
        "K:%env%=dev;;;;;dbg;1;;set;;;;\n"
        "K:%unsetvar%;;;;;never;1;;set;;;;\n"
    )
    ctx = RuleContext()
    out = run_script(df, script, ctx)
    r = out.filter("name = 'alice'").first()
    assert r["country"] == "FR" and r["stage"] == "prod"
    assert "dbg" not in out.columns and "never" not in out.columns


def test_selector_translation_and_row_drop(spark, df):
    script = HEADER + (
        "country;!FR;;;;;;suppobj;;;;\n"           # drop rows where country != FR
        "name;re:^a;;;initial;;name;sub;^(.).*;$1;;\n"
    )
    out = run_script(df, script)
    rows = {r["name"]: r for r in out.collect()}
    assert set(rows) == {"alice"}
    assert rows["alice"]["initial"] == "a"


def test_unknown_command_strict_and_lax():
    script = HEADER + ";;;;x;;y;setpoint;1,2;;;\n"  # geometry: out of scope
    with pytest.raises(ScriptError, match="setpoint"):
        parse_script(script)
    rules, warnings = parse_script(script, strict=False)
    assert rules == [] and any("setpoint" in w for w in warnings)


def test_calc_predicate_and_negation(spark, df):
    script = HEADER + (
        ";N:amount > 50;;;big;1;;set;;;;\n"
    )
    # calc predicate: the reference's N: numeric expression → expr:
    rules, _ = parse_script(script)
    assert rules[0].sel1 == "expr:amount > 50"
    out = run_script(df, script)
    got = {r["name"]: r["big"] for r in out.collect()}
    assert got["bob"] == "1" and got["alice"] in (None, "")


def test_modifier_only_command_warns_not_crashes():
    """a command field of only modifier chars ('>' / '+-') must warn like an
    empty command, not IndexError (ADVICE r01)."""
    script = HEADER + ";;;;x;;name;>;;;;\n" + ";;;;y;;name;+-;;;;\n"
    rules, warnings = parse_script(script, strict=False)
    assert rules == []
    assert sum("no command" in w for w in warnings) == 2
