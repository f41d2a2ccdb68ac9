"""e2e for the deployable DSIR selection job (jobs/dsir_select.py):
in-process spark-submit shape — main() builds its session via getOrCreate,
which picks up the test session."""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from pyetl_spark.functions import dsir


def _load_job():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "dsir_select_job", os.path.join(repo, "jobs", "dsir_select.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def job():
    return _load_job()


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsir_docs"))
    rows = [
        (i, f"common words {'alpha beta gamma ' * 3}{i % 4}", "en" if i % 3 == 0 else "fr")
        for i in range(30)
    ] + [(100 + i, f"outlier zig zag {'qux ' * 5}{i}", "fr") for i in range(6)]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_topk_matches_library_path(spark, job, docs_dir, tmp_path, capsys):
    out = str(tmp_path / "sel")
    rc = job.main([docs_dir, out, "--target", "lang = 'en'", "--k", "8", "--buckets", "256"])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 8
    assert "weight" in got.columns and "text" in got.columns
    # same ids as the library path, independently computed
    docs = spark.read.parquet(docs_dir)
    w = dsir.dsir_log_weights(docs, target=F.col("lang") == "en", num_buckets=256)
    want = {r["doc_id"] for r in dsir.dsir_select(w, 8).collect()}
    assert {r["doc_id"] for r in got.collect()} == want
    assert "selected=8" in capsys.readouterr().out


def test_resample_is_seed_deterministic(spark, job, docs_dir, tmp_path):
    outs = []
    for tag in ("a", "b"):
        out = str(tmp_path / tag)
        rc = job.main(
            [docs_dir, out, "--target", "lang = 'en'", "--k", "6",
             "--buckets", "256", "--resample", "--seed", "7"]
        )
        assert rc == 0
        outs.append({r["doc_id"] for r in spark.read.parquet(out).collect()})
    assert outs[0] == outs[1] and len(outs[0]) == 6
