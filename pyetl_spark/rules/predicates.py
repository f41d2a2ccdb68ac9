"""Condition predicates → Spark Column expressions.

Reference parity: the ~46 ``sel_*`` condition functions in
``moteur/fonctions/traitement_conditions.py`` (987 LoC). Each rule carries up
to two predicates (``regles.py:928-955``); negation via leading ``!``
(``regles.py:490-516``).

Grammar (one predicate string): ``[!]<attr>[ <cond>]`` where cond is:

==================  =========================================================
``=:v``             strict equality (v may be ``[attr]``)          (sel ``egal``, :61,:50)
``!=:v``            inequality
``>:v <:v >=:v <=:v``  numeric comparison                          (``calc N:`` common cases, :114)
``re:pat``          regex search → ``rlike``                       (:83)
``in:a|b|c``        value ∈ literal list → ``isin``                (:287-332)
``is:null``         empty or missing ('' ≡ null)                   (:402-417)
``is:not_null``     non-empty                                      (:402-417)
``haskey:k``        map attr contains key                          (:425-459)
``hasval:v``        map attr contains value                        (:425-459)
``kv:k=>v``         map attr[k] == v                               (:425-459)
``sample:N``        deterministic 1-in-N by hash of attr           (:143-162)
``expr:<sql>``      arbitrary Spark-SQL boolean over the row       (``calc C:``, :133)
(no cond)           attribute exists & non-empty                   (``attexiste``, :17)
==================  =========================================================

Missing and empty string are interchangeable, matching the reference's
``obj.attributs.get(i, "")`` convention (``regles.py:1010-1013``).

Static predicates over context params (the reference's ``P;`` variable tests
:512-533 and ``C:C`` constants :536-567) are folded at compile time: use
``const:true`` / ``const:false`` or test params in Python before building the
rule — mirroring the reference's parse-time rule elision
(``regles.py:915-926``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyetl_spark.rules.spec import RuleContext, bind_param, is_attr_ref, attr_ref


def nullif_empty(col: Column) -> Column:
    """'' → null (single empty/missing convention, SURVEY §7.3)."""
    return F.when(col.cast("string") == "", F.lit(None)).otherwise(col)


def coalesce_empty(col: Column) -> Column:
    """null → '' (text view of a possibly-missing attribute)."""
    return F.coalesce(col.cast("string"), F.lit(""))


def compile_predicate(pred: str, ctx: RuleContext | None = None) -> Column:
    """Compile one predicate string to a boolean Column."""
    ctx = ctx or RuleContext()
    pred = (pred or "").strip()
    if not pred:
        return F.lit(True)
    negate = pred.startswith("!")
    if negate:
        pred = pred[1:].strip()
    col_expr = _compile(pred, ctx)
    return ~col_expr if negate else col_expr


def _compile(pred: str, ctx: RuleContext) -> Column:
    if pred.startswith("const:"):
        return F.lit(pred[6:].strip().lower() == "true")
    if pred.startswith("expr:"):
        return F.expr(pred[5:])
    if " " not in pred:  # bare attribute: exists & non-empty
        return nullif_empty(F.col(pred)).isNotNull()

    attr, cond = pred.split(" ", 1)
    col = F.col(attr)
    cond = cond.strip()

    if cond.startswith("=:"):
        rhs = cond[2:]
        if is_attr_ref(rhs):
            return coalesce_empty(col) == coalesce_empty(F.col(attr_ref(rhs)))
        return coalesce_empty(col) == F.lit(rhs)
    if cond.startswith("!=:"):
        rhs = cond[3:]
        if is_attr_ref(rhs):
            return coalesce_empty(col) != coalesce_empty(F.col(attr_ref(rhs)))
        return coalesce_empty(col) != F.lit(rhs)
    for op_txt, fn in ((">=:", "__ge__"), ("<=:", "__le__"), (">:", "__gt__"), ("<:", "__lt__")):
        if cond.startswith(op_txt):
            rhs_txt = cond[len(op_txt):]
            rhs = (
                F.col(attr_ref(rhs_txt)).cast("double")
                if is_attr_ref(rhs_txt)
                else F.lit(float(rhs_txt))
            )
            return getattr(col.cast("double"), fn)(rhs)
    if cond.startswith("re:"):
        return coalesce_empty(col).rlike(cond[3:])
    if cond.startswith("in:"):
        return coalesce_empty(col).isin(cond[3:].split("|"))
    if cond == "is:null":
        return nullif_empty(col).isNull()
    if cond == "is:not_null":
        return nullif_empty(col).isNotNull()
    if cond.startswith("haskey:"):
        return F.array_contains(F.map_keys(col), cond[7:])
    if cond.startswith("hasval:"):
        return F.array_contains(F.map_values(col), cond[7:])
    if cond.startswith("kv:"):
        k, _, v = cond[3:].partition("=>")
        return F.coalesce(F.element_at(col, k.strip()) == F.lit(v.strip()), F.lit(False))
    if cond.startswith("sample:"):
        n = int(cond[7:])
        return F.pmod(F.xxhash64(col), F.lit(n)) == 0
    if cond.startswith("samplemd5:"):
        # cross-engine-checkable sampling sibling: md5-keyed, identical
        # value in any SQL engine (see functions.text.md5_int60); xxhash64
        # `sample:` stays the corpus-scale default
        from pyetl_spark.functions.text import md5_int60

        n = int(cond[10:])
        return F.pmod(md5_int60(col.cast("string")), F.lit(n)) == 0
    if cond in ("is:file", "is:dir"):
        # attr value names an existing file/dir — f_is_file/f_is_dir
        # traitement_conditions.py:781-817. Arrow-batched os.path check;
        # on a cluster this requires the path visible from executors
        # (shared FS), same contract as any file-path-driven rule.
        kind = cond[3:]

        @F.pandas_udf("boolean")
        def _check(s):
            import os

            fn = os.path.isfile if kind == "file" else os.path.isdir
            return s.fillna("").map(fn)

        return _check(col)
    raise ValueError(f"unknown predicate condition: {pred!r}")


def compile_selectors(sel1: str, sel2: str, ctx: RuleContext | None = None) -> Column:
    """Conjoin a rule's two selector predicates (``regles.py:928-955``)."""
    c1 = compile_predicate(sel1, ctx)
    c2 = compile_predicate(sel2, ctx)
    return c1 & c2
