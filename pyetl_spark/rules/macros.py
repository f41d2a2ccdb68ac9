"""Macro layer — named reusable rule blocks with parameter substitution.

Reference parity (citations into /root/reference):

- macro definition/invocation ``&&#define`` … / ``<name`` / ``##name`` /
  ``call`` (``moteur/moteur.py:325-507`` Macro/MacroStore;
  ``moteur/interpreteur_csv.py:1004-1037``), including the internal macro
  library (``moteur/fonctions/commandes_internes.csv``).
- positional macro arguments ``%1..%n`` and named ``%var%`` substitution
  (``moteur.py:420-470``; resolution regexes ``moteur.py:513-526``).
- ``K:var=value;rule`` conditional compilation (``interpreteur_csv.py:922-950``)
  → :func:`when_param` — rules are included or dropped at PLAN time, exactly
  like the reference's parse-time elision (and like Catalyst constant
  folding, this costs nothing at run time).

Everything here happens before compilation: a macro expands to plain
``Rule`` objects, so the compiler/optimizer sees one flat rule list — the
reference's call/return plumbing (``compilateur.py:62-83``) has no runtime
analog because there is nothing to return *to* in a declarative plan.
"""

from __future__ import annotations

import re
from dataclasses import replace

from pyetl_spark.rules.spec import Rule, RuleContext

_SUB_FIELDS = ("out", "inp", "default", "p1", "p2", "sel1", "sel2")
# %name% named args; %N positional args (reference forms, moteur.py:420-470)
_VAR_RE = re.compile(r"%([A-Za-z_]\w*)%|%(\d+)")


class MacroStore:
    """Registry of named rule blocks (``MacroStore`` moteur.py:325-507)."""

    def __init__(self) -> None:
        self._macros: dict[str, list[Rule]] = {}

    def define(self, name: str, rules: list[Rule]) -> None:
        self._macros[name] = list(rules)

    def __contains__(self, name: str) -> bool:
        return name in self._macros

    def expand(self, name: str, *args: str, **kwargs: str) -> list[Rule]:
        """Instantiate a macro: ``%1..%n`` bind positional args, ``%key%``
        binds keyword args. Unbound ``%var%`` tokens are left intact so the
        compile-time RuleContext can still resolve them."""
        if name not in self._macros:
            raise KeyError(f"unknown macro {name!r}")
        subs = {str(i + 1): v for i, v in enumerate(args)}
        subs.update(kwargs)

        def sub_text(text: str) -> str:
            return _VAR_RE.sub(
                lambda m: str(subs.get(m.group(1) or m.group(2), m.group(0))), text
            )

        return [
            replace(r, **{f: sub_text(getattr(r, f)) for f in _SUB_FIELDS})
            for r in self._macros[name]
        ]


def when_param(ctx: RuleContext, name: str, value: str, rules: list[Rule]) -> list[Rule]:
    """``K:`` conditional compilation: include ``rules`` only when the
    context param matches — plan-time, the excluded rules never reach the
    compiler (interpreteur_csv.py:922-950)."""
    return list(rules) if str(ctx.param(name)) == value else []
