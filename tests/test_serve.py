"""Serving seam (pyetl_spark/serve.py — getpyetl(mode="web") worker pool,
reference pyetl.py:727-735 / 280-294 / 1387-1420)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.serve import ScriptService  # noqa: E402

HEADER = (
    "!att_tri1;valeur_tri1;att_tri2;valeur_tri2;att_sortie;defaut;"
    "att_entree;mode;param1;param2;fin;\n"
)
UPPER = HEADER + ";;;;up;;name;upper;;;;\n"


@pytest.fixture
def src(spark):
    return spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["id", "name"]
    )


def test_named_worker_reuse_and_context_persistence(spark, src):
    svc = ScriptService(spark, max_workers=4)
    w = svc.worker("mapper")
    assert svc.worker("mapper") is w  # same name → same worker

    stats1 = svc.run("mapper", UPPER, src, sortie="#comptage")
    stats2 = svc.run(
        "mapper", UPPER, src, sortie="#comptage", params={"seuil": "2"}
    )
    assert (stats1["runs"], stats2["runs"]) == (1, 2)
    assert stats2["obj"] == 3
    # engine vars persist on the worker between requests
    assert w.ctx.param("seuil") == "2"
    script = HEADER + ";;;;flag;;;set;%seuil%;;;\n"
    svc.run("mapper", script, src, sortie="#store")
    results, _ = svc.get_results("mapper")
    assert [r["flag"] for r in results["store"][0]] == ["2", "2", "2"]


def test_lru_eviction_keeps_recently_used(spark):
    svc = ScriptService(spark, max_workers=2)
    w1 = svc.worker("a")
    svc.worker("b")
    svc.worker("a")  # refresh a's LRU stamp → b is now oldest
    svc.worker("c")  # pool full → evicts b
    assert set(svc.workers) == {"a", "c"}
    assert svc.workers["a"] is w1  # survivor is the same instance
    # an evicted name comes back as a FRESH worker, displacing the oldest
    # survivor (a's stamp predates c's)
    w2 = svc.worker("b")
    assert w2.runs == 0 and set(svc.workers) == {"b", "c"}


def test_print_sink_collects_into_webstore(spark, src):
    svc = ScriptService(spark, max_workers=2)
    svc.run("viewer", UPPER, src, sortie="#print")
    svc.run("viewer", UPPER, src, sortie="#print")
    results, name = svc.get_results("viewer")
    assert name == "viewer"
    assert len(results["print"]) == 2  # one rendered block per run
    block = "\n".join(results["print"][0])
    assert "ALPHA" in block and "up" in block
    # the drain RESETS the store (reference get_results contract)
    again, _ = svc.get_results("viewer")
    assert again == {}


def test_store_and_unknown_sinks(spark, src):
    svc = ScriptService(spark)
    svc.run("w", UPPER, src, sortie="#store")
    results, _ = svc.get_results("w")
    assert {r["name"]: r["up"] for r in results["store"][0]} == {
        "alpha": "ALPHA",
        "beta": "BETA",
        "gamma": "GAMMA",
    }
    with pytest.raises(ValueError, match="unknown special sink"):
        svc.run("w", UPPER, src, sortie="#nosuch")
    assert svc.get_results("missing") == ({}, "missing")


def test_path_entree_and_path_sortie(spark, src, tmp_path):
    inp = str(tmp_path / "in.parquet")
    outp = str(tmp_path / "out.parquet")
    src.write.parquet(inp)
    svc = ScriptService(spark)
    stats = svc.run("io", UPPER, inp, sortie=outp)
    assert stats["obj"] == 3
    back = spark.read.parquet(outp)
    assert {r["up"] for r in back.collect()} == {"ALPHA", "BETA", "GAMMA"}


def test_preloaded_store_survives_requests(spark, src):
    svc = ScriptService(spark)
    w = svc.worker("joiner")
    lookup = spark.createDataFrame([(1, "x")], ["id", "tag"])
    w.preload("dims", lookup)
    svc.run("joiner", UPPER, src, sortie="#comptage")
    assert svc.worker("joiner").ctx.stores["dims"] is lookup
