"""Schema operators (SURVEY §2.11) — DDL-level manipulation, Spark-first.

Reference surfaces (citations into /root/reference):

- type system ``TYPES_A`` (schema/elements/attribut.py:11-68) and the
  typeconv map (attribut.py:88) → :data:`TYPE_CODES` + :func:`cast_layer`
- type inference from observed values ``Attribut.ajout_valeur``/``set_type``
  (attribut.py:376-392,320-341) → :func:`infer_type_codes` (one aggregate
  over the data, not per-row driver logic)
- ``diff_schema`` (traitement_schema.py:599) → :func:`schema_diff`
- schema fusion across workers ``fusion_schema``/``integre_schemas``
  (schema/schema_io.py:18-43,476-501) → :func:`schema_merge`
- enum domains ``Conformite`` with alias maps (attribut.py:91-260),
  ``force_alias`` (traitement_schema.py:158), ``valide_schema``
  (traitement_schema.py:194) → :func:`enum_recode` / :func:`validate_enum`
- fuzzy class match ``match_schema``/``guess_classe``
  (traitement_schema.py:510; schema_interne.py:290-302) → :func:`match_schema`
- FK topological write order ``tablesorter2`` (schema_interne.py:678-741)
  → :func:`fk_write_order` (driver-side metadata, as in the reference)

Everything data-touching is a single declarative plan; everything else is
plan-time metadata work on ``df.schema`` (the reference's "virtual object"
schema propagation ≡ Spark computing an output schema without executing).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# pyetl type code → Spark type (SURVEY §1.2; attribut.py:11-88)
TYPE_CODES: dict[str, T.DataType] = {
    "T": T.StringType(),
    "E": T.IntegerType(),
    "EL": T.LongType(),
    "F": T.DoubleType(),
    "N": T.DecimalType(38, 18),
    "D": T.TimestampNTZType(),
    "DS": T.DateType(),
    "Z": T.TimestampType(),
    "B": T.BooleanType(),
    "H": T.MapType(T.StringType(), T.StringType()),
    "S": T.LongType(),
    "BS": T.LongType(),
    "I": T.DayTimeIntervalType(),
    "J": T.StringType(),
    "XML": T.StringType(),
    "BIN": T.BinaryType(),
}


def cast_layer(df: DataFrame, codes: Mapping[str, str], date_fmt: str | None = None) -> DataFrame:
    """Apply a pyetl-typed schema to an all-text DataFrame: one projection of
    ``try_cast``-style conversions (``Attribut.typeconv`` attribut.py:88,297;
    printf entry formats attribut.py:301-318). Unknown columns pass through.
    Bad values become null (the reference's best-effort ``atget_n`` contract,
    objet.py:523-546) instead of failing the job."""
    out: list[Column] = []
    for c in df.columns:
        code = codes.get(c)
        if code is None or code == "T":
            out.append(F.col(c))
            continue
        col = F.col(c)
        if code in ("D", "Z") and date_fmt:
            conv = F.try_to_timestamp(col, F.lit(date_fmt))
            if code == "D":
                conv = conv.cast(T.TimestampNTZType())
        elif code == "H":
            # '"k" => "v", ...' hstore text form (objet.py:638-684); simple
            # values only — quoted commas are the relational layer's job
            conv = F.str_to_map(
                F.regexp_replace(col, '"', ""), F.lit(r",\s*"), F.lit(r"\s*=>\s*")
            )
        else:
            conv = col.try_cast(TYPE_CODES[code])
        out.append(conv.alias(c))
    return df.select(*out)


def infer_type_codes(df: DataFrame, sample_rows: int | None = None) -> dict[str, str]:
    """Infer pyetl type codes for string columns from the data — the
    engine-side ``ajout_valeur`` (attribut.py:376-392): a column is E/EL if
    every non-null value casts to int, F if to double, DS/D if to date/
    timestamp, B for boolean literals, else T. ONE aggregate job over all
    columns (each check is a codegen'd conditional count, partially combined
    map-side); optionally on a row sample."""
    str_cols = [c for c, t in df.dtypes if t == "string"]
    if not str_cols:
        return {}
    if sample_rows:
        df = df.limit(sample_rows)
    aggs = []
    for c in str_cols:
        v = F.nullif(F.trim(F.col(c)), F.lit(""))
        aggs += [
            F.count(v).alias(f"{c}__n"),
            F.count(F.when(v.try_cast("long").isNotNull(), 1)).alias(f"{c}__int"),
            F.count(F.when(v.try_cast("long").isNotNull() & (F.abs(v.try_cast("long")) > 2**31 - 1), 1)).alias(f"{c}__big"),
            F.count(F.when(v.try_cast("double").isNotNull(), 1)).alias(f"{c}__num"),
            F.count(F.when(v.try_cast("date").isNotNull(), 1)).alias(f"{c}__date"),
            F.count(F.when(v.try_cast("timestamp").isNotNull(), 1)).alias(f"{c}__ts"),
            F.count(F.when(F.lower(v).isin("true", "false", "t", "f", "0", "1"), 1)).alias(f"{c}__bool"),
        ]
    row = df.agg(*aggs).first().asDict()
    codes: dict[str, str] = {}
    for c in str_cols:
        n = row[f"{c}__n"]
        if n == 0:
            codes[c] = "T"
        elif row[f"{c}__bool"] == n and row[f"{c}__int"] < n:
            codes[c] = "B"
        elif row[f"{c}__int"] == n:
            codes[c] = "EL" if row[f"{c}__big"] > 0 else "E"
        elif row[f"{c}__num"] == n:
            codes[c] = "F"
        elif row[f"{c}__date"] == n:
            codes[c] = "DS"
        elif row[f"{c}__ts"] == n:
            codes[c] = "D"
        else:
            codes[c] = "T"
    return codes


def schema_diff(a: T.StructType, b: T.StructType) -> dict[str, list]:
    """Structural diff a → b (``diff_schema`` traitement_schema.py:599):
    added / removed / retyped columns. Plan-time only."""
    fa = {f.name: f.dataType for f in a.fields}
    fb = {f.name: f.dataType for f in b.fields}
    return {
        "added": sorted(set(fb) - set(fa)),
        "removed": sorted(set(fa) - set(fb)),
        "retyped": sorted(
            (n, fa[n].simpleString(), fb[n].simpleString())
            for n in set(fa) & set(fb)
            if fa[n] != fb[n]
        ),
    }


def schema_merge(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union heterogeneous-schema DataFrames with missing columns nulled —
    the cross-worker schema fusion (schema_io.py:18-43) as one plan."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def enum_recode(
    df: DataFrame,
    column: str,
    aliases: Mapping[str, str],
    keep_unknown: bool = True,
) -> DataFrame:
    """Recode a column through an enum alias map (``Conformite`` alias maps
    attribut.py:91-260, ``force_alias`` traitement_schema.py:158). Small
    literal map → ``element_at(create_map(...))``, folded into codegen; a
    big map should come through the relational layer as a broadcast join."""
    m = F.create_map(*[F.lit(x) for kv in aliases.items() for x in kv])
    recoded = F.element_at(m, F.col(column))
    fallback = F.col(column) if keep_unknown else F.lit(None).cast("string")
    return df.withColumn(column, F.coalesce(recoded, fallback))


def parse_mapping_spec(text: str) -> list[tuple[str, str, dict[str, str]]]:
    """Parse the reference's inline mapping spec
    ``{src_class,dst_class,a=>b,c=>d:src2,dst2:...}``
    (charge_mapping traitement_mapping.py:139-146) into
    ``[(src_class, dst_class, {src_att: dst_att}), ...]``."""
    text = text.strip()
    if text.startswith("{") and text.endswith("}"):
        text = text[1:-1]
    out: list[tuple[str, str, dict[str, str]]] = []
    for block in text.split(":"):
        if not block.strip():
            continue
        parts = [p.strip() for p in block.split(",")]
        src, dst = parts[0], parts[1] if len(parts) > 1 else parts[0]
        atts = {}
        for pair in parts[2:]:
            if "=>" in pair:
                a, b = pair.split("=>", 1)
                atts[a.strip()] = b.strip()
        out.append((src, dst, atts))
    return out


def apply_mapping(
    tables: Mapping[str, DataFrame],
    mapping: Sequence[tuple[str, str, Mapping[str, str]]] | str,
) -> dict[str, DataFrame]:
    """Wholesale class + attribute remap driven by a mapping table —
    ``f_map``/``_map_schemas`` traitement_mapping.py:328-397.

    ``mapping`` entries are ``(src_class, dst_class, {src_att: dst_att})``;
    ``src_class`` may end with ``*`` — the wildcard expansion
    (traitement_mapping.py:231-245): every class starting with the prefix is
    renamed with the prefix replaced by ``dst_class``'s, and the entry's
    attribute renames apply to all of them. A mapped attribute missing from
    a class is created empty (``obj.attributs.get(orig, "")``,
    traitement_mapping.py:385). Unmapped classes pass through untouched.

    Plan-time-only metadata work (withColumnsRenamed, zero data movement) —
    the scale cost of a remap is nothing, which is exactly why it's modeled
    declaratively rather than per-object as in the reference.
    """
    if isinstance(mapping, str):
        mapping = parse_mapping_spec(mapping)
    # expand wildcards against the actual class list
    expanded: dict[str, tuple[str, Mapping[str, str]]] = {}
    for src, dst, atts in mapping:
        if src.endswith("*"):
            prefix = src[:-1]
            for cls in tables:
                if cls.startswith(prefix):
                    expanded.setdefault(cls, (cls.replace(prefix, dst, 1), atts))
        else:
            expanded[src] = (dst, atts)

    out: dict[str, DataFrame] = {}
    for cls, df in tables.items():
        if cls not in expanded:
            out[cls] = df
            continue
        dst, atts = expanded[cls]
        cols = set(df.columns)
        missing = [a for a in atts if a not in cols]
        for a in missing:  # reference: absent source attr → empty value
            df = df.withColumn(a, F.lit(""))
        df = df.withColumnsRenamed(dict(atts))
        if dst in out:  # two sources onto one destination = silent data loss
            raise ValueError(
                f"apply_mapping: destination class {dst!r} produced by more "
                "than one source class; merge sources explicitly first"
            )
        out[dst] = df
    return out


def validate_enum(df: DataFrame, column: str, domain: Sequence[str]) -> DataFrame:
    """Conformance check (``valide_schema`` traitement_schema.py:194):
    flags out-of-domain values in ``<column>__conforme`` instead of dropping
    them (the reference reports, the caller decides)."""
    return df.withColumn(f"{column}__conforme", F.col(column).isin(list(domain)))


def _name_tokens(name: str) -> set[str]:
    return set(name.lower().replace("-", "_").split("_"))


def match_schema(candidate_cols: Sequence[str], tables: Mapping[str, Sequence[str]]) -> str | None:
    """Fuzzy-match a column set to the best-known table (``match_schema``
    traitement_schema.py:510, ``guess_classe`` schema_interne.py:290-302):
    highest Jaccard over column-name token sets, ties broken by name."""
    cand = {t for c in candidate_cols for t in _name_tokens(c)}
    best, best_score = None, 0.0
    for tname in sorted(tables):
        cols = {t for c in tables[tname] for t in _name_tokens(c)}
        denom = len(cand | cols)
        score = len(cand & cols) / denom if denom else 0.0
        if score > best_score:
            best, best_score = tname, score
    return best


def fk_write_order(deps: Mapping[str, Sequence[str]]) -> list[str]:
    """Topological write order over FK dependencies (``tablesorter2``
    schema_interne.py:678-741): parents before children; cycles raise (the
    reference logs & breaks them — we fail loudly, a cyclic FK write order
    is a modeling bug). Driver-side metadata only."""
    order: list[str] = []
    state: dict[str, int] = {}  # 0=visiting 1=done

    def visit(t: str, chain: tuple[str, ...]) -> None:
        if state.get(t) == 1:
            return
        if state.get(t) == 0:
            raise ValueError(f"FK cycle: {' -> '.join(chain + (t,))}")
        state[t] = 0
        for parent in sorted(deps.get(t, ())):
            visit(parent, chain + (t,))
        state[t] = 1
        order.append(t)

    for t in sorted(deps):
        visit(t, ())
    return order
