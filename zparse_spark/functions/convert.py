"""Conversion / serialization surface — the reference's any-to-any
converter (crates/zparse/src/convert.rs) re-expressed over DataFrames.

What maps (and what deliberately doesn't): the reference converts one
value tree between five text formats; the engine converts *tables*
between columnar/text representations. The behavioral contracts worth
preserving are serialization semantics, not format grammars:

- C3 JSON serializer: non-finite numbers → null (convert.rs:258-260)
  → ``sanitize_doubles`` + ``to_json``.
- C4 CSV serializer: header = UNION of keys across all rows
  (convert.rs:160-175, tested tests/csv_tests.rs:261-267) →
  ``unionByName(allowMissingColumns=True)``; missing keys → empty;
  strings force-quoted (convert.rs:222-247) → ``quoteAll`` +
  type-aware writer.
- C1 same-format fast path (convert.rs:43-51) → identity projection
  elision (return the input DataFrame untouched).
- string → JSON value (lib.rs:69-87) → ``from_json`` with
  PERMISSIVE-style null-on-malformed via try semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sanitize_doubles(df: DataFrame) -> DataFrame:
    """Non-finite floats → NULL before serialization (the reference
    serializes NaN/inf as JSON null, convert.rs:258-260)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            c = F.col(f.name)
            out = out.withColumn(
                f.name, F.when(F.isnan(c) | (F.abs(c) == float("inf")), None).otherwise(c)
            )
    return out


def to_json_lines(df: DataFrame) -> DataFrame:
    """Rows → compact JSON strings (C3): struct(*) → to_json, with the
    non-finite sanitization applied first."""
    clean = sanitize_doubles(df)
    return clean.select(F.to_json(F.struct(*[F.col(c) for c in clean.columns])).alias("json"))


def from_json_lines(df: DataFrame, schema: str | T.StructType, col: str = "json") -> DataFrame:
    """JSON strings → typed columns; malformed rows are kept (collect-
    don't-abort) and surfaced via the ``_corrupt`` flag, using
    PERMISSIVE mode's corrupt-record column (from_json returns an
    all-NULL struct on malformed input, so a plain null check can't
    distinguish corruption from legitimate nulls)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    with_cr = T.StructType(schema.fields + [T.StructField("_corrupt_record", T.StringType())])
    parsed = df.select(
        F.from_json(
            F.col(col), with_cr, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"}
        ).alias("v")
    )
    return parsed.select(
        *[F.col(f"v.{f.name}") for f in schema.fields],
        F.col("v._corrupt_record").isNotNull().alias("_corrupt"),
    )


def header_union(frames: list[DataFrame]) -> DataFrame:
    """CSV header-union semantics (C4): the output schema is the union of
    all input schemas in first-seen order; missing columns are NULL."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def write_csv(df: DataFrame, path: str, force_quote_strings: bool = True) -> None:
    """CSV sink with the reference's quoting contract: strings always
    quoted so type inference round-trips them as strings
    (convert.rs:222-227, csv_tests.rs:270-278)."""
    writer = df.write.mode("overwrite").option("header", "true")
    if force_quote_strings:
        writer = writer.option("quoteAll", "true")
    writer.csv(path)


def convert(df: DataFrame, target: str, path: str | None = None):
    """C1 dispatch: 'json' → JSON-lines DataFrame; 'csv'/'parquet' →
    sink write (path required); 'dataframe' → identity fast path."""
    if target == "dataframe":
        return df  # same-format fast path: no reparse, no copy
    if target == "json":
        return to_json_lines(df)
    if target == "csv":
        if path is None:
            raise ValueError("csv target requires path")
        write_csv(df, path)
        return None
    if target == "parquet":
        if path is None:
            raise ValueError("parquet target requires path")
        df.write.mode("overwrite").parquet(path)
        return None
    raise ValueError(f"unknown target {target!r}")
