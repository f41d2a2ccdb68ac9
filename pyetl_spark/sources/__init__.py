"""Sources & sinks layer — the engine's recast of pyetl's format registry
(reference: formats/fichiers/__init__.py:52-104, cache_readers.csv 29 readers /
cache_writers.csv 20 writers, Reader generic_io.py:206-759, Output
generic_io.py:762-976, sortir traitement_divers.py:313-534).

Everything routes through ``spark.read`` / ``df.write`` so Catalyst keeps
predicate pushdown, column pruning and partition pruning on every path.
"""

from pyetl_spark.sources.io import (
    FORMATS,
    attreader,
    attwriter,
    preload,
    read_any,
    read_fixed_width,
    sink,
    write_any,
)
from pyetl_spark.sources.smallfiles import read_dbf, read_xlsx, write_dbf, write_xlsx

__all__ = [
    "FORMATS",
    "read_any",
    "write_any",
    "read_fixed_width",
    "attreader",
    "attwriter",
    "preload",
    "sink",
    "read_xlsx",
    "write_xlsx",
    "read_dbf",
    "write_dbf",
]
