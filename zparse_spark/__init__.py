"""zparse_spark — a PySpark-native schema + constraint validation engine.

A from-scratch distributed generalization of the strict-parser contract of
the reference (pixincreate/zParse, studied read-only at /root/reference):
type checks, structural well-formedness, error-position reporting,
duplicate-key / uniqueness rules, referential consistency, and limits —
lifted from "one byte buffer in one thread" to "an Iceberg-style table of
interleaved text+media documents on a 1000-executor cluster".

Design stance (NOT a port): no lexers, no cursors, no event loops. The
engine is a *rule compiler*: each rule contributes vectorized column
expressions (Spark higher-order functions over the spans array, or Arrow
pandas UDFs), a violation projection, and a metric aggregate; one
``read → rules → write`` Catalyst DAG per run.

Error taxonomy and position contract mirror the reference
(crates/zparse/src/error.rs:8-12,48-64) so golden fixtures byte-match.
"""

__version__ = "0.1.0"

from zparse_spark.schema import (  # noqa: F401
    DOCUMENTS_SCHEMA,
    MEDIA_CATALOG_SCHEMA,
    VIOLATION_SCHEMA,
    VERDICT_SCHEMA,
    ErrorKind,
)
from zparse_spark.plans.engine import ValidationEngine, ValidationConfig  # noqa: F401
