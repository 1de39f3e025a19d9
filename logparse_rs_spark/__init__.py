"""logparse_rs_spark — a PySpark-native log parse→enrich→anonymize→route→aggregate
engine with the query/data-processing capabilities of rmarnold/logparse_rs,
re-expressed Spark-first (DataFrame/SQL + Arrow-vectorized kernels).
"""

__version__ = "0.1.0"

from .anonymizer import (  # noqa: F401
    CompiledAnonymizer,
    anonymizer_from_json,
    compile_anonymizer,
    load_anonymizer,
)
from .schema import CompiledSchema, compile_schema_dict, load_schema  # noqa: F401
