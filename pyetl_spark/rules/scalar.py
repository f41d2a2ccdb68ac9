"""Scalar transform commands (the per-attribute "regle" operators).

Reference parity: ``moteur/fonctions/traitement_alpha.py`` (1390 LoC) plus the
hstore ops (``traitement_hstore.py``), crypto/hash (``traitement_crypt.py``),
path ops (``traitement_os.py``), value recodes (``traitement_mapping.py``).
Each command here cites its reference twin; the implementation is a native
Spark ``Column`` expression wherever expressible (Catalyst fuses consecutive
assignments into one whole-stage-codegen'd projection), with vectorized
pandas UDFs only for the genuinely-Python cases (balanced-block extraction) —
never per-row Python (north-rule input_hint).

A command builder takes ``(rule, ctx)`` and returns either:

- ``ColumnEffect(assigns)``: pure per-row column assignments, condition-able
  via ``when/otherwise`` (pyetl's ok/fail reconverging branches), or
- ``DataFrameEffect(fn)``: a whole-DataFrame transform (rename, drop, keep,
  explode) — conditions apply via filter-split + ``unionByName``.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyetl_spark.rules.predicates import coalesce_empty, nullif_empty
from pyetl_spark.rules.spec import Rule, RuleContext, bind_param, bind_value


@dataclass
class ColumnEffect:
    assigns: dict[str, Column]


@dataclass
class DataFrameEffect:
    fn: Callable[[DataFrame], DataFrame]
    # explode-style commands change cardinality; '+'/condition handling
    # must split-union rather than when/otherwise
    generates: bool = False
    # row-drop semantics: the selectors choose rows to REMOVE (f_supp row mode)
    drops: bool = False


Effect = ColumnEffect | DataFrameEffect
Builder = Callable[[Rule, RuleContext], Effect]

COMMANDS: dict[str, Builder] = {}


def command(name: str) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        COMMANDS[name] = fn
        return fn

    return deco


def _in_or_default(rule: Rule, ctx: RuleContext) -> Column:
    """value = input attr if present & non-empty, else bound default.

    Reference: ``f_setval`` falls back to the rule's defaut field
    (``traitement_alpha.py:84``)."""
    if rule.inp and rule.default:
        return F.coalesce(nullif_empty(F.col(rule.inp)), bind_param(rule.default, ctx))
    if rule.inp:
        return F.col(rule.inp)
    return bind_param(rule.default or rule.p1, ctx)


# ---------------------------------------------------------------- assignments


@command("set")
def cmd_set(rule: Rule, ctx: RuleContext) -> Effect:
    """assign out = input attr (or default) — ``f_setval`` traitement_alpha.py:84."""
    return ColumnEffect({rule.outs()[0]: _in_or_default(rule, ctx)})


@command("setlist")
def cmd_setlist(rule: Rule, ctx: RuleContext) -> Effect:
    """multi-assign with defaults — ``f_setliste`` traitement_alpha.py:45."""
    outs = rule.outs()
    inps = rule.inps()
    defaults = [d.strip() for d in rule.default.split(",")] if rule.default else []
    assigns: dict[str, Column] = {}
    for i, out in enumerate(outs):
        inp = inps[i] if i < len(inps) else ""
        dflt = defaults[i] if i < len(defaults) else ""
        if inp and dflt:
            assigns[out] = F.coalesce(nullif_empty(F.col(inp)), bind_param(dflt, ctx))
        elif inp:
            assigns[out] = F.col(inp)
        else:
            assigns[out] = bind_param(dflt, ctx)
    return ColumnEffect(assigns)


@command("setmatch")
def cmd_setmatch(rule: Rule, ctx: RuleContext) -> Effect:
    """assign regex capture group — ``f_setmatch`` traitement_alpha.py:116."""
    group = int(rule.p2) if rule.p2 else 1
    pat = bind_value(rule.p1, ctx)
    return ColumnEffect({rule.outs()[0]: F.regexp_extract(coalesce_empty(F.col(rule.inp)), pat, group)})


@command("uuid")
def cmd_uuid(rule: Rule, ctx: RuleContext) -> Effect:
    """uuid per row — ``set =UUID`` traitement_alpha.py:106 (uuid1 → uuid4 analog)."""
    return ColumnEffect({rule.outs()[0]: F.expr("uuid()")})


@command("setnonvide")
def cmd_setnonvide(rule: Rule, ctx: RuleContext) -> Effect:
    """first non-empty of input list — ``f_setnonvide`` traitement_alpha.py:190."""
    cols = [nullif_empty(F.col(a)) for a in rule.inps()]
    if rule.default:
        cols.append(bind_param(rule.default, ctx))
    return ColumnEffect({rule.outs()[0]: F.coalesce(*cols)})


@command("setjoin")
def cmd_setjoin(rule: Rule, ctx: RuleContext) -> Effect:
    """concat attrs with separator — ``f_setjoin`` traitement_alpha.py:219."""
    sep = bind_value(rule.p1, ctx) or ""
    return ColumnEffect(
        {rule.outs()[0]: F.concat_ws(sep, *[coalesce_empty(F.col(a)) for a in rule.inps()])}
    )


@command("setarray")
def cmd_setarray(rule: Rule, ctx: RuleContext) -> Effect:
    """build array value from attrs — list mode of ``f_setjoin`` traitement_alpha.py:219."""
    arr = F.array(*[F.col(a) for a in rule.inps()])
    if rule.p1 == "set":
        arr = F.array_distinct(arr)
    return ColumnEffect({rule.outs()[0]: arr})


@command("calc")
def cmd_calc(rule: Rule, ctx: RuleContext) -> Effect:
    """free expression over attrs — ``f_setcalc`` traitement_alpha.py:347,
    compiler ``regles.py:405-421``. The reference eval's a Python lambda per
    row; here the expression is Spark SQL, evaluated by Catalyst/codegen."""
    return ColumnEffect({rule.outs()[0]: F.expr(bind_value(rule.p1, ctx))})


@command("default")
def cmd_default(rule: Rule, ctx: RuleContext) -> Effect:
    """fill empty attr with default (in-place ``set`` idiom)."""
    out = rule.outs()[0]
    src = rule.inp or out
    return ColumnEffect({out: F.coalesce(nullif_empty(F.col(src)), bind_param(rule.default or rule.p1, ctx))})


# ------------------------------------------------------------- string / regex


@command("sub")
def cmd_sub(rule: Rule, ctx: RuleContext) -> Effect:
    """regex substitution — ``f_sub`` traitement_alpha.py:248-318."""
    out = rule.outs()[0] if rule.out else rule.inp
    pat = bind_value(rule.p1, ctx)
    rep = bind_value(rule.p2, ctx)
    # python \1 backrefs → spark $1
    rep = re.sub(r"\\(\d)", r"$\1", rep or "")
    return ColumnEffect({out: F.regexp_replace(coalesce_empty(F.col(rule.inp or out)), pat, rep)})


@command("upper")
def cmd_upper(rule: Rule, ctx: RuleContext) -> Effect:
    """uppercase — ``f_upper`` traitement_alpha.py:371-487 (incl. in-place)."""
    out = rule.outs()[0] if rule.out else rule.inp
    return ColumnEffect({out: F.upper(F.col(rule.inp or out))})


@command("lower")
def cmd_lower(rule: Rule, ctx: RuleContext) -> Effect:
    """lowercase — traitement_alpha.py:371-487."""
    out = rule.outs()[0] if rule.out else rule.inp
    return ColumnEffect({out: F.lower(F.col(rule.inp or out))})


@command("capitalize")
def cmd_capitalize(rule: Rule, ctx: RuleContext) -> Effect:
    """initcap — traitement_alpha.py:371-487 (casefold family)."""
    out = rule.outs()[0] if rule.out else rule.inp
    return ColumnEffect({out: F.initcap(F.col(rule.inp or out))})


@command("strip")
def cmd_strip(rule: Rule, ctx: RuleContext) -> Effect:
    """trim chars — ``f_strip`` traitement_alpha.py:589-619."""
    out = rule.outs()[0] if rule.out else rule.inp
    col = coalesce_empty(F.col(rule.inp or out))
    if rule.p1:
        chars = re.escape(bind_value(rule.p1, ctx))
        stripped = F.regexp_replace(
            F.regexp_replace(col, f"^[{chars}]+", ""), f"[{chars}]+$", ""
        )
        return ColumnEffect({out: stripped})
    return ColumnEffect({out: F.trim(col)})


@command("len")
def cmd_len(rule: Rule, ctx: RuleContext) -> Effect:
    """string length — ``f_len`` traitement_alpha.py:622."""
    return ColumnEffect({rule.outs()[0]: F.length(coalesce_empty(F.col(rule.inp)))})


@command("round")
def cmd_round(rule: Rule, ctx: RuleContext) -> Effect:
    """round to n decimals — ``f_round`` traitement_alpha.py:1003-1045."""
    out = rule.outs()[0] if rule.out else rule.inp
    n = int(rule.p1 or 0)
    return ColumnEffect({out: F.round(F.col(rule.inp or out).cast("double"), n)})


@command("vround")
def cmd_vround(rule: Rule, ctx: RuleContext) -> Effect:
    """round a numeric attr OR every element of a numeric array —
    ``f_vround`` traitement_alpha.py:1032-1045 extended to the engine's
    typed arrays (the reference's list attrs)."""
    out = rule.outs()[0] if rule.out else rule.inp
    n = int(rule.p1 or 0)
    inp = rule.inp or out

    def fn(df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        if isinstance(df.schema[inp].dataType, T.ArrayType):
            col = F.transform(F.col(inp), lambda x: F.round(x.cast("double"), n))
        else:
            col = F.round(F.col(inp).cast("double"), n)
        return df.withColumn(out, col)

    return DataFrameEffect(fn)


@command("format")
def cmd_format(rule: Rule, ctx: RuleContext) -> Effect:
    """printf formatting of attr list — ``f_format`` traitement_alpha.py:1048-1131."""
    fmt = bind_value(rule.p1, ctx)
    return ColumnEffect({rule.outs()[0]: F.format_string(fmt, *[F.col(a) for a in rule.inps()])})


@command("to_date")
def cmd_to_date(rule: Rule, ctx: RuleContext) -> Effect:
    """strptime parse — ``f_todate`` traitement_alpha.py:1134-1159."""
    out = rule.outs()[0] if rule.out else rule.inp
    fmt = bind_value(rule.p1, ctx)
    col = F.col(rule.inp or out)
    return ColumnEffect({out: F.to_timestamp(col, fmt) if fmt else F.to_timestamp(col)})


@command("date_format")
def cmd_date_format(rule: Rule, ctx: RuleContext) -> Effect:
    """date → text (exit format analog, ``attribut.py:301-318``)."""
    out = rule.outs()[0] if rule.out else rule.inp
    return ColumnEffect({out: F.date_format(F.col(rule.inp or out), bind_value(rule.p1, ctx))})


@command("num")
def cmd_num(rule: Rule, ctx: RuleContext) -> Effect:
    """best-effort numeric conversion — ``atget_n`` objet.py:523-546."""
    out = rule.outs()[0] if rule.out else rule.inp
    return ColumnEffect({out: F.col(rule.inp or out).cast("double")})


# ----------------------------------------------------------------- splitting


@command("split")
def cmd_split(rule: Rule, ctx: RuleContext) -> Effect:
    """split attr by separator into N attrs — ``f_asplit`` traitement_alpha.py:490-586."""
    sep = re.escape(bind_value(rule.p1, ctx) or ",")
    parts = F.split(coalesce_empty(F.col(rule.inp)), sep)
    return ColumnEffect({out: parts.getItem(i) for i, out in enumerate(rule.outs())})


@command("splitgen")
def cmd_splitgen(rule: Rule, ctx: RuleContext) -> Effect:
    """explode into one row per piece — ``f_asplit`` gen branch
    traitement_alpha.py:578-585 (object-generating command → ``explode``)."""
    sep = re.escape(bind_value(rule.p1, ctx) or ",")
    out = rule.outs()[0]
    inp = rule.inp

    def fn(df: DataFrame) -> DataFrame:
        return df.withColumn(out, F.explode(F.split(coalesce_empty(F.col(inp)), sep)))

    return DataFrameEffect(fn, generates=True)


@command("extractbloc")
def cmd_extractbloc(rule: Rule, ctx: RuleContext) -> Effect:
    """extract delimiter-balanced blocks following a regex key, one row per
    block — ``f_extractbloc`` traitement_alpha.py:1162-1229. Genuinely stateful
    paren-matching → vectorized pandas UDF + explode (SURVEY §2.2)."""
    key_pat = bind_value(rule.p1, ctx)
    open_c, close_c = (bind_value(rule.p2, ctx) or "{}")[:2]
    out = rule.outs()[0]
    inp = rule.inp

    @F.pandas_udf("array<string>")
    def extract(s: pd.Series) -> pd.Series:
        key_re = re.compile(key_pat)

        def blocks(text: str) -> list[str]:
            if not text:
                return []
            found = []
            for m in key_re.finditer(text):
                i = text.find(open_c, m.end())
                if i < 0:
                    continue
                depth, j = 0, i
                while j < len(text):
                    if text[j] == open_c:
                        depth += 1
                    elif text[j] == close_c:
                        depth -= 1
                        if depth == 0:
                            found.append(text[i : j + 1])
                            break
                    j += 1
            return found

        return s.fillna("").map(blocks)

    def fn(df: DataFrame) -> DataFrame:
        return df.withColumn(out, F.explode(extract(F.col(inp))))

    return DataFrameEffect(fn, generates=True)


# ---------------------------------------------------- rename / drop / keep


@command("ren")
def cmd_ren(rule: Rule, ctx: RuleContext) -> Effect:
    """rename attribute(s) — ``f_rename``/``f_renamelist`` traitement_alpha.py:661-693."""
    mapping = dict(zip(rule.inps(), rule.outs()))

    def fn(df: DataFrame) -> DataFrame:
        return df.withColumnsRenamed(mapping)

    return DataFrameEffect(fn)


@command("cnt")
def cmd_cnt(rule: Rule, ctx: RuleContext) -> Effect:
    """per-rule row counter — ``f_cnt`` traitement_alpha.py:845-873.

    The reference counted rows in single-stream arrival order; Spark needs
    the order made explicit (SURVEY §2.8): ``p1`` = order column (required),
    ``inp`` = optional partition key(s) for a per-key counter (the
    ``unique;N`` occurrence-rank shape)."""
    if not rule.p1:
        raise ValueError("cnt requires p1 = explicit order column (no stream order in Spark)")
    out = rule.outs()[0]
    order = F.col(rule.p1)
    keys = rule.inps()

    def fn(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(order)
        return df.withColumn(out, F.row_number().over(w))

    return DataFrameEffect(fn)


@command("getkey")
def cmd_getkey(rule: Rule, ctx: RuleContext) -> Effect:
    """dense incremental key per distinct value — ``f_getkey``
    traitement_divers.py:770-790. Delegates to the scale-safe
    distributed key-dimension operator (no global single-partition sort);
    ``p1="window"`` selects the small-dim dense_rank fast path."""
    out = rule.outs()[0]
    val = rule.inp
    method = bind_value(rule.p1, ctx) or "dim"

    def fn(df: DataFrame) -> DataFrame:
        from pyetl_spark.operators import getkey as op_getkey

        return op_getkey(df, val, out=out, method=method)

    return DataFrameEffect(fn)


@command("supp")
def cmd_supp(rule: Rule, ctx: RuleContext) -> Effect:
    """drop attributes — ``f_supp`` traitement_alpha.py:696-783."""
    cols = rule.inps()

    def fn(df: DataFrame) -> DataFrame:
        return df.drop(*cols)

    return DataFrameEffect(fn)


@command("suppobj")
def cmd_suppobj(rule: Rule, ctx: RuleContext) -> Effect:
    """drop whole rows (row-drop branch of ``f_supp`` traitement_alpha.py:761).
    The rule's selectors choose the rows to drop; with no selector drops all."""

    def fn(df: DataFrame) -> DataFrame:  # compiler inverts the condition
        return df

    return DataFrameEffect(fn, drops=True)


@command("garder")
def cmd_garder(rule: Rule, ctx: RuleContext) -> Effect:
    """keep-only listed attrs (column pruning) — ``f_keep`` traitement_alpha.py:786-842."""
    cols = rule.inps()

    def fn(df: DataFrame) -> DataFrame:
        return df.select(*cols)

    return DataFrameEffect(fn)


# -------------------------------------------------------- hash / b64 / encode


@command("checksum")
def cmd_checksum(rule: Rule, ctx: RuleContext) -> Effect:
    """sha256/md5 of an attr — ``f_checksum`` traitement_crypt.py:393-460.
    ``sha2(content,256)`` is the engine's per-row CDC invariant (input_hint)."""
    algo = (rule.p1 or "sha256").lower()
    col = coalesce_empty(F.col(rule.inp))
    h = F.md5(col) if algo == "md5" else F.sha2(col, int(algo.replace("sha", "") or 256))
    return ColumnEffect({rule.outs()[0]: h})


@command("b64encode")
def cmd_b64encode(rule: Rule, ctx: RuleContext) -> Effect:
    """file_to_b64 analog — traitement_crypt.py:393-460."""
    return ColumnEffect({rule.outs()[0]: F.base64(F.col(rule.inp).cast("binary"))})


@command("b64decode")
def cmd_b64decode(rule: Rule, ctx: RuleContext) -> Effect:
    """b64_to_file analog — traitement_crypt.py:393-460."""
    return ColumnEffect({rule.outs()[0]: F.unbase64(F.col(rule.inp)).cast("string")})


@command("attencode")
def cmd_attencode(rule: Rule, ctx: RuleContext) -> Effect:
    """bytes↔text recode — ``f_attencode`` traitement_workflow.py:1058-1076."""
    out = rule.outs()[0] if rule.out else rule.inp
    charset = bind_value(rule.p1, ctx) or "UTF-8"
    return ColumnEffect({out: F.decode(F.encode(F.col(rule.inp or out), "UTF-8"), charset)})


def _fernet(key: str):
    """Fernet instance from a passphrase (sha256-derived urlsafe key).
    Gated: the ``cryptography`` wheel ships in most Spark images but stays
    an optional dependency of this engine."""
    try:
        from cryptography.fernet import Fernet
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("crypt/decrypt need the 'cryptography' package") from e
    import base64
    import hashlib

    return Fernet(base64.urlsafe_b64encode(hashlib.sha256(key.encode()).digest()))


@command("crypt")
def cmd_crypt(rule: Rule, ctx: RuleContext) -> Effect:
    """symmetric-encrypt an attr with a passphrase — ``f_crypt``
    traitement_crypt.py:393-408 (Fernet level; key from p1 or the
    ``defaultkey`` variable). Arrow-batched pandas UDF: Fernet is Python-only
    but the batch path keeps it off the per-row interpreter."""
    key = bind_value(rule.p1, ctx) or str(ctx.param("defaultkey", ""))
    inp = rule.inp

    @F.pandas_udf("string")
    def do_crypt(s: pd.Series) -> pd.Series:
        f = _fernet(key)
        return s.map(lambda v: None if v is None else f.encrypt(str(v).encode()).decode())

    # Fernet tokens embed a random IV: mark nondeterministic so Catalyst
    # neither collapses nor reorders the call across filters
    return ColumnEffect({rule.outs()[0]: do_crypt.asNondeterministic()(F.col(inp))})


@command("decrypt")
def cmd_decrypt(rule: Rule, ctx: RuleContext) -> Effect:
    """decrypt an attr — ``f_decrypt`` traitement_crypt.py:410-422; on a bad
    token the reference keeps the input value (``decrypte if decrypte else
    val``), mirrored here."""
    key = bind_value(rule.p1, ctx) or str(ctx.param("defaultkey", ""))
    inp = rule.inp

    @F.pandas_udf("string")
    def do_decrypt(s: pd.Series) -> pd.Series:
        from cryptography.fernet import InvalidToken

        f = _fernet(key)

        def dec(v):
            if v is None:
                return None
            try:
                return f.decrypt(str(v).encode()).decode()
            except (InvalidToken, ValueError):
                return v

        return s.map(dec)

    return ColumnEffect({rule.outs()[0]: do_decrypt(F.col(inp))})


# ------------------------------------------------------------------ map / json


class RuleAbort(RuntimeError):
    """raised by the ``fail``/``abort`` gate commands when guarded rows
    reach them (reference ``f_fail`` traitement_workflow.py:52,
    ``f_abort`` :223 — job-stop semantics)."""


@command("fail")
@command("abort")
def cmd_fail(rule: Rule, ctx: RuleContext) -> Effect:
    """data-quality gate: abort the run if ANY row reaches this rule.
    Selectors route rows to the gate, so ``bad_col is:null ... fail`` stops
    the job on the first violation batch. Recast as an EAGER existence check
    (one ``limit(1)`` job at compile time — the price of a gate); rows pass
    through unchanged when the gate holds."""
    msg = bind_value(rule.p1, ctx) or f"{rule.op} rule triggered"

    def fn(df: DataFrame) -> DataFrame:
        if df.limit(1).count():
            raise RuleAbort(str(msg))
        return df

    return DataFrameEffect(fn)


@command("xmlextract")
def cmd_xmlextract(rule: Rule, ctx: RuleContext) -> Effect:
    """first matching element value from an XML attr — ``f_xmlextract``
    traitement_xml.py:79-121. Path forms: ``tag`` / ``tag.#text`` (element
    text), ``tag.attr`` (attribute value). Native ``xpath_string`` — JVM
    XML parsing, no Python in the row path."""
    path = bind_value(rule.p1, ctx)
    tag, _, attr = path.partition(".")
    if not attr or attr == "#text":
        xp = f"(//{tag})[1]"
    else:
        xp = f"(//{tag}/@{attr})[1]"
    return ColumnEffect({rule.outs()[0]: F.xpath_string(F.col(rule.inp), F.lit(xp))})


@command("xmlsplit")
def cmd_xmlsplit(rule: Rule, ctx: RuleContext) -> Effect:
    """one row per matching XML element — ``f_xmlsplit``
    traitement_xml.py:124-160 (object-per-element), recast as explode over
    an xpath nodeset. The per-row value is the selected attribute
    (``tag.attr``) or element text (``tag``); rows with no match are
    dropped, like the reference's zero-element case."""
    path = bind_value(rule.p1, ctx)
    tag, _, attr = path.partition(".")
    if not attr or attr == "#text":
        xp = f"//{tag}/text()"
    else:
        xp = f"//{tag}/@{attr}"
    out = rule.outs()[0]
    inp = rule.inp

    def fn(df: DataFrame) -> DataFrame:
        return df.withColumn(out, F.explode(F.xpath(F.col(inp), F.lit(xp))))

    return DataFrameEffect(fn, generates=True)


@command("map_data")
def cmd_map_data(rule: Rule, ctx: RuleContext) -> Effect:
    """value recode via mapping — ``f_map_data`` traitement_mapping.py:400-471.
    p1 names a ctx param holding a {from: to} dict (small dim → plan-time
    literal map; large dims use the relational ``join`` operator instead)."""
    mapping: dict[str, str] = ctx.param(rule.p1, {})
    out = rule.outs()[0] if rule.out else rule.inp
    col = coalesce_empty(F.col(rule.inp or out))
    if not mapping:
        return ColumnEffect({out: col})
    kv: list[Column] = []
    for k, v in mapping.items():
        kv.extend([F.lit(k), F.lit(v)])
    lookup = F.element_at(F.create_map(*kv), col)
    default = bind_param(rule.default, ctx) if rule.default else col
    return ColumnEffect({out: F.coalesce(lookup, default)})


@command("tojson")
def cmd_tojson(rule: Rule, ctx: RuleContext) -> Effect:
    """dump attrs to json — ``f_json`` traitement_alpha.py:1291-1391."""
    return ColumnEffect({rule.outs()[0]: F.to_json(F.struct(*[F.col(a) for a in rule.inps()]))})


@command("json_get")
def cmd_json_get(rule: Rule, ctx: RuleContext) -> Effect:
    """extract one json path — jsonsplit family traitement_alpha.py:1291-1391."""
    path = bind_value(rule.p1, ctx)
    if not path.startswith("$"):
        path = "$." + path
    return ColumnEffect({rule.outs()[0]: F.get_json_object(F.col(rule.inp), path)})


@command("jsonsplit")
def cmd_jsonsplit(rule: Rule, ctx: RuleContext) -> Effect:
    """json → hstore map attr — ``f_jsonsplit1`` traitement_alpha.py:1312-1357.

    Default: one-level map (non-string values re-serialized as json by the
    oracle-friendly ``map<string,string>`` cast). ``p2="flat"``: RECURSIVE
    flatten via ``jflatten`` semantics (traitement_alpha.py:1301-1310) —
    nested dict keys joined with '_' (reference keeps a leading '_' from the
    empty root prefix; mirrored), lists/scalars json-encoded. Unknown nested
    schema → Arrow-batched pandas UDF (schema-free json has no Column form).
    """
    out = rule.outs()[0] if rule.out else rule.inp
    if (rule.p2 or "").strip() != "flat":
        return ColumnEffect({out: F.from_json(F.col(rule.inp), "map<string,string>")})

    @F.pandas_udf("map<string,string>")
    def flat(s: pd.Series) -> pd.Series:
        import json

        def jflatten(struct, fields, racine=""):
            for nom, valeur in struct.items():
                nom_champ = racine + "_" + nom
                if isinstance(valeur, dict):
                    jflatten(valeur, fields, racine=nom_champ)
                else:
                    fields[nom_champ] = valeur if isinstance(valeur, str) else json.dumps(valeur)

        def parse(v):
            if v is None:
                return None
            try:
                struct = json.loads(v)
            except (ValueError, TypeError):
                return None
            if not isinstance(struct, dict):
                return None
            fields: dict[str, str] = {}
            jflatten(struct, fields)
            return fields

        return s.map(parse)

    return ColumnEffect({out: flat(F.col(rule.inp))})


def _stringify_nested(col: Column, dtype) -> Column:
    """recursively cast every LEAF of a nested column to string, preserving
    structure — the typed-Spark recast of ``txtstruct``'s repr-leaves walk
    (traitement_alpha.py:1261-1271): struct → struct, array → array,
    map → map, leaf → string."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.StructType):
        return F.struct(
            *[_stringify_nested(col[f.name], f.dataType).alias(f.name) for f in dtype.fields]
        )
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: _stringify_nested(x, dtype.elementType))
    if isinstance(dtype, T.MapType):
        return F.map_from_arrays(
            F.transform(F.map_keys(col), lambda k: k.cast("string")),
            F.transform(F.map_values(col), lambda v: _stringify_nested(v, dtype.valueType)),
        )
    return col.cast("string")


@command("txtstruct")
def cmd_txtstruct(rule: Rule, ctx: RuleContext) -> Effect:
    """complex attr → same structure with all-text leaves — ``f_txtstruct``
    traitement_alpha.py:1274-1289. Schema-driven Column recursion (codegen),
    no Python in the row path: Spark's typed schema replaces the reference's
    runtime type sniffing."""
    inp = rule.inp
    out = rule.outs()[0] if rule.out else inp

    def fn(df: DataFrame) -> DataFrame:
        dtype = df.schema[inp].dataType
        return df.withColumn(out, _stringify_nested(F.col(inp), dtype))

    return DataFrameEffect(fn)


def describe_dtype(dtype, indent: int = 0) -> str:
    """recursive type tree of a (possibly nested) column type — the metadata
    half of ``f_infoatt``/``affiche_iterable`` traitement_alpha.py:1232-1259
    (schema-time in Spark: no data scan needed)."""
    from pyspark.sql import types as T

    pad = "--" * indent
    if isinstance(dtype, T.StructType):
        lines = [f"{pad}struct"]
        lines += [
            f"{'--' * (indent + 1)}{f.name}: {describe_dtype(f.dataType, 0)}" for f in dtype.fields
        ]
        return "\n".join(lines)
    if isinstance(dtype, T.ArrayType):
        return f"{pad}array<{describe_dtype(dtype.elementType, 0)}>"
    if isinstance(dtype, T.MapType):
        return (
            f"{pad}map<{describe_dtype(dtype.keyType, 0)}, "
            f"{describe_dtype(dtype.valueType, 0)}>"
        )
    return f"{pad}{dtype.simpleString()}"


@command("infoatt")
def cmd_infoatt(rule: Rule, ctx: RuleContext) -> Effect:
    """print an attribute's recursive type info — ``f_infoatt``
    traitement_alpha.py:1249-1259. Driver-side metadata only (the schema IS
    the type info; the reference had to walk a sample object)."""
    inp = rule.inp

    def fn(df: DataFrame) -> DataFrame:
        print(f"analyse attribut {inp}\n{describe_dtype(df.schema[inp].dataType)}")
        return df

    return DataFrameEffect(fn)


# ----------------------------------------------------------------- hstore ops


@command("hset")
def cmd_hset(rule: Rule, ctx: RuleContext) -> Effect:
    """build map from attrs — ``hset*`` traitement_hstore.py:42-263."""
    keys = rule.inps()
    kv: list[Column] = []
    for k in keys:
        kv.extend([F.lit(k), coalesce_empty(F.col(k))])
    return ColumnEffect({rule.outs()[0]: F.create_map(*kv)})


@command("hget")
def cmd_hget(rule: Rule, ctx: RuleContext) -> Effect:
    """map value → attr — ``hget*`` traitement_hstore.py:42-263."""
    key = bind_value(rule.p1, ctx)
    return ColumnEffect({rule.outs()[0]: F.element_at(F.col(rule.inp), key)})


@command("hdel")
def cmd_hdel(rule: Rule, ctx: RuleContext) -> Effect:
    """delete map key — ``hdel`` traitement_hstore.py:42-263."""
    key = bind_value(rule.p1, ctx)
    out = rule.outs()[0] if rule.out else rule.inp
    return ColumnEffect(
        {out: F.map_filter(F.col(rule.inp or out), lambda k, v: k != F.lit(key))}
    )


@command("hsplit")
def cmd_hsplit(rule: Rule, ctx: RuleContext) -> Effect:
    """map keys → attrs — ``hsplit`` traitement_hstore.py:42-263 (p1: key list)."""
    keys = [k.strip() for k in bind_value(rule.p1, ctx).split(",")]
    inp = rule.inp
    return ColumnEffect({k: F.element_at(F.col(inp), k) for k in keys})


# ------------------------------------------------------------------ path ops


@command("namesplit")
def cmd_namesplit(rule: Rule, ctx: RuleContext) -> Effect:
    """path → dir/name/ext — ``f_namesplit`` traitement_os.py:364-432.
    outs: up to 3 names (dir, base, ext)."""
    col = coalesce_empty(F.col(rule.inp))
    outs = rule.outs()
    assigns: dict[str, Column] = {}
    if len(outs) > 0:
        assigns[outs[0]] = F.regexp_extract(col, r"^(.*)/[^/]*$", 1)
    if len(outs) > 1:
        assigns[outs[1]] = F.regexp_extract(col, r"([^/]+?)(?:\.[^./]+)?$", 1)
    if len(outs) > 2:
        assigns[outs[2]] = F.regexp_extract(col, r"\.([^./]+)$", 1)
    return ColumnEffect(assigns)


@command("namejoin")
def cmd_namejoin(rule: Rule, ctx: RuleContext) -> Effect:
    """path join — ``f_namejoin`` traitement_os.py:364-432."""
    return ColumnEffect(
        {rule.outs()[0]: F.concat_ws("/", *[coalesce_empty(F.col(a)) for a in rule.inps()])}
    )
