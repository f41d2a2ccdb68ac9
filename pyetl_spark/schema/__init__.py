"""Schema layer — pyetl's dynamic schema system recast on StructType
(reference: schema/schema_interne.py, schema/elements/attribut.py,
moteur/fonctions/traitement_schema.py; see SURVEY §1.2-1.3, §2.11)."""

from pyetl_spark.schema.ops import (
    apply_mapping,
    parse_mapping_spec,
    TYPE_CODES,
    cast_layer,
    enum_recode,
    fk_write_order,
    infer_type_codes,
    match_schema,
    schema_diff,
    schema_merge,
    validate_enum,
)

__all__ = [
    "apply_mapping",
    "parse_mapping_spec",
    "TYPE_CODES",
    "cast_layer",
    "infer_type_codes",
    "schema_diff",
    "schema_merge",
    "enum_recode",
    "validate_enum",
    "match_schema",
    "fk_write_order",
]
