"""Rule spec and parameter binding.

Reference parity (citations relative to /root/reference):

- rule fields: ``moteur/regles.py:566-579`` (``NOMS_CHAMPS``).
- parameter binding classes Valdef/Vals/Valp/Valatt/Valmix
  ``moteur/regles.py:74-220``: a parameter is static text (→ ``F.lit``),
  an engine variable ``P:name`` (→ context parameter, plan-time literal),
  an attribute indirection ``[attr]`` (→ ``F.col``), or a mixed template
  ``pre[attr]post`` (→ ``F.concat``).
- command modifiers ``+`` (duplicate object down a copy branch), ``-``
  (eat rows failing the rule), ``>`` (final rule):
  ``moteur/interpreteur_csv.py:202-216``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_ATTR_RE = re.compile(r"\[([A-Za-z_#][\w#.]*)\]")


@dataclass
class RuleContext:
    """Plan-time context: engine variables (the reference's ``%var%`` /
    ``P:name`` scopes, ``moteur/moteur.py:510-882``) and shared resources
    (preloaded broadcast tables for join/in-file rules)."""

    params: dict[str, Any] = field(default_factory=dict)
    # name -> DataFrame for join/in:mem style rules (the reference's
    # preloaded "#store" object stores, traitement_divers.py:545-672)
    stores: dict[str, Any] = field(default_factory=dict)

    def param(self, name: str, default: Any = "") -> Any:
        return self.params.get(name, default)


@dataclass
class Rule:
    """One transform rule.

    ``sel1``/``sel2``: predicate strings (see predicates.py grammar); both
    must hold for the command to apply (``regles.py:928-955``).
    ``out``: output attribute name(s) (comma-separated for multi-output ops).
    ``default``: default value when input is missing/empty.
    ``inp``: input attribute name(s).
    ``op``: command name (see scalar.COMMANDS and the relational layer).
    ``p1``/``p2``: command parameters.
    ``mod``: '' | '+' (duplicate) | '-' (drop failing rows) | '>' (final).
    """

    op: str
    out: str = ""
    inp: str = ""
    default: str = ""
    p1: str = ""
    p2: str = ""
    sel1: str = ""
    sel2: str = ""
    mod: str = ""

    def outs(self) -> list[str]:
        return [a.strip() for a in self.out.split(",") if a.strip()]

    def inps(self) -> list[str]:
        return [a.strip() for a in self.inp.split(",") if a.strip()]


def bind_param(value: str, ctx: RuleContext | None = None) -> Column:
    """Bind one textual parameter to a Column (Valdef/Vals/Valp/Valatt/Valmix).

    - ``"[attr]"``          → ``F.col("attr")``
    - ``"P:name"``          → plan-time literal from ``ctx.params``
    - ``"pre[attr]post"``   → ``F.concat(lit, col, lit)`` (mixed template)
    - anything else         → ``F.lit(value)``
    """
    ctx = ctx or RuleContext()
    if value.startswith("P:"):
        return F.lit(ctx.param(value[2:]))
    parts = _ATTR_RE.split(value)
    if len(parts) == 1:  # static
        return F.lit(value)
    if len(parts) == 3 and parts[0] == "" and parts[2] == "":  # pure [attr]
        return F.col(parts[1])
    cols: list[Column] = []
    for i, part in enumerate(parts):
        if i % 2 == 1:  # captured attribute name
            cols.append(F.coalesce(F.col(part).cast("string"), F.lit("")))
        elif part:
            cols.append(F.lit(part))
    return F.concat(*cols)


def bind_value(value: str, ctx: RuleContext | None = None) -> Any:
    """Plan-time (driver-side) binding for parameters that must be Python
    scalars (e.g. regex patterns, separators): resolves ``P:name`` from the
    context, returns other strings verbatim."""
    ctx = ctx or RuleContext()
    if isinstance(value, str) and value.startswith("P:"):
        return ctx.param(value[2:])
    return value


def is_attr_ref(value: str) -> bool:
    m = _ATTR_RE.fullmatch(value or "")
    return m is not None


def attr_ref(value: str) -> str:
    m = _ATTR_RE.fullmatch(value)
    assert m is not None
    return m.group(1)
