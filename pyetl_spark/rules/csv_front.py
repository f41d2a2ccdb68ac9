"""regle-CSV front-end — run a pyetl rule script against this engine.

Parses the reference's 12-field semicolon CSV rule format
(``NOMS_CHAMPS`` moteur/regles.py:566-579: sel1; val_sel1; sel2; val_sel2;
sortie; defaut; entree; commande; cmp1; cmp2; debug; vlocs) into
:class:`~pyetl_spark.rules.spec.Rule` objects, so a pyetl user's existing
transformation scripts drive the Spark pipeline without rewriting.

Supported surface (the mainstream transform-script subset):

- ``!…`` comment/banner lines and the header line (interpreteur_csv.py)
- ``$name=value`` engine-variable assignments (interpreteur_csv.py:571-611)
  → plan-time ``RuleContext.params``
- ``%name%`` substitution in any field (moteur.py:513-526) from params
- ``K:%var%=value;…`` / ``K:%var%;…`` conditional lines
  (interpreteur_csv.py:922-950) → plan-time include/drop
- ``&&#define;name;…`` … ``&&#enddefine`` macro blocks and ``<name;a;b``
  invocation (moteur.py:325-507) → :class:`MacroStore` expansion
  (terminator is explicit here; the reference infers block ends from its
  link-level machinery, which has no plan-time analog)
- selector pairs → the predicate grammar (regles.py:928-955 semantics):
  empty/empty → always; attr alone → exists-and-non-empty; attr+value →
  equality; ``!`` negation; ``re:`` ``in:`` ``is:null`` ``is:not_null``
  pass through; ``N:``/``C:`` calc predicates → ``expr:``
- command modifiers ``+`` (duplicate) ``-`` (drop-failing) ``>`` (final)
  (interpreteur_csv.py:202-216) → ``Rule.mod``

Commands must exist in the engine registry (``rules.scalar.COMMANDS``);
unknown commands raise (or are collected with ``strict=False``) — the
out-of-scope families (geometry, DB side effects, OS calls) are exactly the
reference features this engine replaces with lake/stream equivalents.
"""

from __future__ import annotations

import re

from pyetl_spark.rules.macros import MacroStore
from pyetl_spark.rules.scalar import COMMANDS
from pyetl_spark.rules.spec import Rule, RuleContext

_VAR = re.compile(r"%(\w+)%")


def _subst(text: str, params: dict) -> str:
    return _VAR.sub(lambda m: str(params.get(m.group(1), m.group(0))), text)


def _selector(attr: str, val: str) -> str:
    """(attribut, valeur) pair → predicate-grammar string."""
    attr, val = attr.strip(), val.strip()
    if not attr and not val:
        return ""
    neg = val.startswith("!")
    if neg:
        val = val[1:].strip()
    if not val:
        out = attr  # bare attr: exists & non-empty
    elif val.startswith(("re:", "in:", "is:")):
        out = f"{attr} {val}"
    elif val.startswith(("N:", "C:")):
        out = f"expr:{val[2:]}"  # calc predicate → Spark SQL boolean
    else:
        out = f"{attr} =:{val}"
    return ("!" + out) if neg else out


class ScriptError(ValueError):
    pass


def parse_script(
    text: str,
    ctx: RuleContext | None = None,
    macros: MacroStore | None = None,
    strict: bool = True,
) -> tuple[list[Rule], list[str]]:
    """Parse a regle-CSV script into (rules, warnings).

    ``ctx.params`` receives ``$var=`` assignments and feeds ``%var%``
    substitution and ``K:`` conditionals — the same plan-time variable
    model as the reference's parse step.
    """
    ctx = ctx or RuleContext()
    macros = macros or MacroStore()
    rules: list[Rule] = []
    warnings: list[str] = []
    defining: str | None = None
    def_body: list[Rule] = []

    def emit(fields: list[str], lineno: int, target: list[Rule]) -> None:
        fields = (fields + [""] * 12)[:12]
        sel1, val1, sel2, val2, sortie, defaut, entree, commande, cmp1, cmp2, _dbg, _vl = fields
        commande = commande.strip()
        if not commande:
            if any(f.strip() for f in fields):
                warnings.append(f"line {lineno}: no command, skipped")
            return
        mod = ""
        # NB: guard on non-empty first — '' is a substring of "+->" and a
        # modifier-only field ('>' or '+-') must warn, not IndexError
        while commande and commande[0] in "+->":
            mod += commande[0]
            commande = commande[1:]
        if not commande:
            warnings.append(f"line {lineno}: no command, skipped")
            return
        if commande not in COMMANDS:
            msg = f"line {lineno}: command {commande!r} not supported by the engine"
            if strict:
                raise ScriptError(msg)
            warnings.append(msg)
            return
        target.append(
            Rule(
                op=commande,
                out=sortie.strip(),
                inp=entree.strip(),
                default=defaut.strip(),
                p1=cmp1.strip(),
                p2=cmp2.strip(),
                sel1=_selector(sel1, val1),
                sel2=_selector(sel2, val2),
                mod=mod,
            )
        )

    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.rstrip("\n")
        if not line.strip() or line.lstrip().startswith("!"):
            continue
        line = _subst(line, ctx.params)

        if line.startswith("&&#enddefine"):
            if defining is None:
                raise ScriptError(f"line {lineno}: enddefine without define")
            macros.define(defining, def_body)
            defining, def_body = None, []
            continue
        if line.startswith("&&#define"):
            parts = line.split(";")
            if defining is not None:
                raise ScriptError(f"line {lineno}: nested define")
            defining = parts[1].strip().lstrip("#")
            def_body = []
            continue

        if line.startswith("$"):  # $name=value
            name, _, value = line[1:].partition("=")
            ctx.params[name.strip()] = value.strip().rstrip(";")
            continue

        if line.startswith("K:"):  # conditional compilation
            cond, _, rest = line[2:].partition(";")
            name, eq, want = cond.partition("=")
            # %var% already substituted: an unresolved %…% means var unset
            unresolved = bool(_VAR.search(name))
            have = "" if unresolved else name.strip()
            keep = (have == want.strip()) if eq else bool(have)
            if not keep:
                continue
            line = rest

        if line.startswith("<"):  # macro invocation <name;arg1;arg2
            parts = line[1:].split(";")
            name = parts[0].strip()
            args = [a for a in (p.strip() for p in parts[1:]) if a]
            try:
                expanded = macros.expand(name, *args)
            except KeyError as e:
                if strict:
                    raise ScriptError(f"line {lineno}: {e}") from e
                warnings.append(f"line {lineno}: unknown macro {name!r}")
                continue
            (def_body if defining else rules).extend(expanded)
            continue

        emit(line.split(";"), lineno, def_body if defining else rules)

    if defining is not None:
        raise ScriptError(f"unterminated macro definition {defining!r}")
    return rules, warnings


def run_script(df, text: str, ctx: RuleContext | None = None, strict: bool = True):
    """Parse and apply a regle-CSV script to a DataFrame in one call."""
    from pyetl_spark.rules.compiler import apply_rules

    ctx = ctx or RuleContext()
    rules, _ = parse_script(text, ctx, strict=strict)
    return apply_rules(df, rules, ctx)
