"""Source readers + format dispatch.

The reference routes bytes to a parser by file extension
(crates/zparse/src/lib.rs:43-54 ``detect_format_from_path``) and wraps
input with a filename for diagnostics (src/input.rs:12-31). The engine's
analogs: ``spark.read.<format>`` dispatch by suffix, and
``input_file_name()`` provenance stamped into every row so violations can
cite their source file — the table-scale version of "filename in the
error message".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → spark reader format; mirrors detect_format_from_path's
# case-insensitive suffix match (lib.rs:43-54). jsonc maps to json like the
# reference maps Jsonc → lenient Json config.
_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".jsonc": "json",
    ".orc": "orc",
}


def detect_format_from_path(path: str) -> str | None:
    """Case-insensitive extension sniff (lib.rs:43-54 analog)."""
    _, ext = os.path.splitext(path.lower())
    return _EXT_FORMAT.get(ext)


def load_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    with_provenance: bool = False,
    **options,
) -> DataFrame:
    """Read any supported source; format from ``fmt`` else extension.

    CSV defaults to PERMISSIVE mode with a corrupt-record column — the
    distributed analog of the reference's collect-don't-abort violation
    contract (vs its CSV parser's fail-fast, csv/parser.rs:151-177).
    """
    fmt = fmt or detect_format_from_path(path)
    if fmt is None:
        raise ValueError(f"cannot detect format for {path!r}; pass fmt=")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("mode", "PERMISSIVE")
        if path.lower().endswith(".tsv"):
            reader = reader.option("sep", "\t")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path)
    if with_provenance:
        df = df.withColumn("_source_file", F.input_file_name())
    return df


def normalize_headers(df: DataFrame) -> DataFrame:
    """CSV header normalization (csv/parser.rs:313-342): trim names,
    empty → column_N (1-based position), duplicates deduped with _2/_3
    suffixes in encounter order."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for i, name in enumerate(df.columns):
        base = name.strip() or f"column_{i + 1}"
        n = seen.get(base, 0) + 1
        seen[base] = n
        out.append(base if n == 1 else f"{base}_{n}")
    return df.toDF(*out)


_FORBIDDEN_DELIMS = {"\n", "\r", '"'}


def validate_delimiter(delim: str) -> str:
    """Delimiter contract (csv/parser.rs:87-94): one ASCII char, not a
    quote or record terminator."""
    if len(delim) != 1 or ord(delim) > 127 or delim in _FORBIDDEN_DELIMS:
        raise ValueError(f"invalid CSV delimiter {delim!r}: must be one ASCII char, not quote/CR/LF")
    return delim


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the driver's flat documents table for an SF tier."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_tpch(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load driver tables by name (TESTDATA.md)."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
