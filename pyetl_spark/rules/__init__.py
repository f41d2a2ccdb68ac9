"""Rule layer: pyetl-style regle semantics compiled to Spark Column pipelines.

A rule mirrors the reference's 12-field regle line (``moteur/regles.py:566-579``
``NOMS_CHAMPS``: sel1; val_sel1; sel2; val_sel2; sortie; defaut; entree;
commande; cmp1; cmp2; debug; vlocs) as a typed Python structure — the
*semantics*, not the CSV syntax. The compiler turns an ordered list of rules
into a single DataFrame→DataFrame pipeline; per-attribute commands become
native Column expressions (fused by Catalyst's CollapseProject into one
projection), the rest become declarative DataFrame transforms.
"""

from pyetl_spark.rules.spec import Rule, RuleContext, bind_param
from pyetl_spark.rules.predicates import compile_predicate
from pyetl_spark.rules.compiler import compile_rules, apply_rules
from pyetl_spark.rules.scalar import COMMANDS
from pyetl_spark.rules.csv_front import parse_script, run_script
from pyetl_spark.rules.macros import MacroStore, when_param

__all__ = [
    "Rule",
    "RuleContext",
    "bind_param",
    "compile_predicate",
    "compile_rules",
    "apply_rules",
    "COMMANDS",
    "parse_script",
    "run_script",
    "MacroStore",
    "when_param",
]
