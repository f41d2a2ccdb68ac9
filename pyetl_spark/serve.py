"""Long-lived serving seam — the web-service surface recast (SURVEY §3.2).

The reference runs rule scripts behind a Flask app (``mapper_web.py:1-22``,
``pyetl_webapp/routes.py``, macro micro-webservices ``mws.py``) through a
pool of NAMED, REUSABLE worker instances: ``getpyetl(mode="web")`` caches a
``Pyetl`` per name in ``self.webworkers`` (``pyetl.py:727-735``), refreshes
its ``lasttime`` on reuse, and evicts the least-recently-used worker when
the pool exceeds ``webmaxworkers`` (``getoldest``/``cleanoldest``,
``pyetl.py:280-294``). Results of ``#print``/``#store`` sinks accumulate in
the worker's ``webstore`` and are drained by ``get_results``
(``pyetl.py:1387-1420``), which strips the leading ``#`` from store keys
and resets the store.

The Spark recast keeps exactly that lifecycle around one long-lived
``SparkSession`` (the Spark Connect / thriftserver deployment shape): a
:class:`ScriptService` owns the pool; each :class:`ScriptWorker` keeps a
persistent :class:`RuleContext` across calls — engine ``$var`` params and
preloaded broadcast ``stores`` survive between requests, which is the whole
point of naming workers (the reference reuses parsed rule sets; here the
reusable asset is preloaded lookup tables + cached source DataFrames).
Scripts compile to one declarative Spark plan per request (Catalyst does
the per-request optimization; nothing is interpreted per row), so a pooled
worker adds no executor-side state — scale-out is the session's, not the
pool's.

No network listener is included on purpose: the sandbox has no network, and
the HTTP glue is trivially layered on top of this API (every method takes /
returns plain Python values). Tests drive the service in-process.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pyetl_spark.rules.csv_front import parse_script
from pyetl_spark.rules.compiler import apply_rules
from pyetl_spark.rules.spec import RuleContext
from pyetl_spark.sources import io as sio


@dataclass
class ScriptWorker:
    """One named pooled worker (``Pyetl(parent=self, nom=nom)`` analog,
    ``pyetl.py:727-735``): persistent rule context + result store."""

    name: str
    spark: SparkSession
    ctx: RuleContext = field(default_factory=RuleContext)
    webstore: dict[str, Any] = field(default_factory=dict)
    lasttime: float = field(default_factory=time.time)
    runs: int = 0

    def settime(self) -> None:  # pyetl.py:277-278
        self.lasttime = time.time()

    def preload(self, name: str, df: DataFrame) -> None:
        """Pin a lookup table into the worker's context (the reference's
        preloaded ``#store`` object stores, traitement_divers.py:545-672) —
        loaded once, reused by every later script on this worker."""
        self.ctx.stores[name] = df

    def transform(
        self,
        script: str,
        entree: DataFrame | str,
        params: dict[str, str] | None = None,
    ) -> DataFrame:
        """Compile + apply one script and return the LAZY result DataFrame
        (no sink, no action) — the embedding API for callers that compose
        the worker's output into a larger plan. Engine vars and preloaded
        stores persist on the worker across calls, same as :meth:`run`."""
        self.settime()
        self.runs += 1
        if params:
            self.ctx.params.update(params)
        df = (
            sio.read_any(self.spark, entree)
            if isinstance(entree, str)
            else entree
        )
        rules, _ = parse_script(script, self.ctx)
        return apply_rules(df, rules, self.ctx)

    def run(
        self,
        script: str,
        entree: DataFrame | str,
        sortie: str = "#store",
        params: dict[str, str] | None = None,
        n: int = 20,
    ) -> dict[str, Any]:
        """Parse + apply one regle-CSV script and route the result to a
        sink. ``entree`` is a DataFrame or a path (format by extension,
        ``read_any``); ``sortie`` is a special sink (``#print`` captured
        text, ``#store`` collected rows, ``#comptage`` count) or an output
        path (``write_any``). Returns this run's stats (the reference's
        ``wstats`` block, pyetl.py:1370-1385); sink payloads accumulate in
        ``webstore`` until :meth:`ScriptService.get_results` drains them.
        """
        t0 = time.time()
        out = self.transform(script, entree, params)

        if sortie.startswith("#"):
            kind = sortie.lstrip("#")
            if kind == "print":
                # the web-mode #print: rendered text into the store, not
                # stdout (reference webstore/logbrut capture)
                payload: Any = (
                    out._jdf.showString(n, 0, False).rstrip("\n").split("\n")
                )
                rows = min(out.count(), n)
            elif kind == "store":
                payload = [r.asDict() for r in out.collect()]
                rows = len(payload)
            elif kind == "comptage":
                payload = rows = out.count()
            else:
                raise ValueError(f"serve: unknown special sink {sortie!r}")
            self.webstore.setdefault(kind, []).append(payload)
        else:
            sio.write_any(out, sortie)
            rows = out.count()
        duree = max(time.time() - t0, 1e-9)
        return {
            "worker": self.name,
            "runs": self.runs,
            "duree": duree,
            "obj": rows,
            "perf": int(rows / duree),
        }


class ScriptService:
    """Pooled named-worker registry — ``getpyetl(mode="web")`` recast.

    ``max_workers`` is the reference's ``webmaxworkers``; requesting a new
    name with a full pool evicts the least-recently-used worker
    (``cleanoldest``, pyetl.py:291-294). Requesting an existing name reuses
    the worker and refreshes its LRU stamp.
    """

    def __init__(self, spark: SparkSession, max_workers: int = 4):
        self.spark = spark
        self.max_workers = max_workers
        self.workers: dict[str, ScriptWorker] = {}

    # -- pool lifecycle (pyetl.py:280-294,727-735)
    def worker(self, name: str) -> ScriptWorker:
        w = self.workers.get(name)
        if w is not None:
            w.settime()
            return w
        if len(self.workers) >= self.max_workers:
            self._clean_oldest()
        w = ScriptWorker(name=name, spark=self.spark)
        self.workers[name] = w
        return w

    def _get_oldest(self) -> str | None:
        if not self.workers:
            return None
        return min(self.workers.items(), key=lambda kv: kv[1].lasttime)[0]

    def _clean_oldest(self) -> None:
        name = self._get_oldest()
        if name is not None:
            del self.workers[name]

    # -- request entry points
    def run(
        self,
        name: str,
        script: str,
        entree: DataFrame | str,
        sortie: str = "#store",
        params: dict[str, str] | None = None,
    ) -> dict[str, Any]:
        return self.worker(name).run(script, entree, sortie, params)

    def get_results(self, name: str) -> tuple[dict[str, Any], str]:
        """Drain a worker's accumulated sink payloads (``get_results``,
        pyetl.py:1387-1420): returns ``(results, name)`` and resets the
        store. Unknown / evicted names return an empty dict."""
        w = self.workers.get(name)
        if w is None:
            return {}, name
        out, w.webstore = w.webstore, {}
        return out, name
