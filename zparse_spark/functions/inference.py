"""Scalar typing rules: the CSV type-inference cascade, TOML numeric
grammar, and multi-format datetime parsing — as pure column expressions.

Reference semantics reproduced (file:line in /root/reference):
- CSV cell inference (crates/zparse/src/csv.rs:7-34): unquoted '' → null;
  null/true/false case-insensitive → null/bool; i64-then-f64 parse,
  finite only; everything else string. QUOTED cells stay strings
  (csv/parser.rs:344-351, tested tests/csv_tests.rs:270-278).
- YAML scalar guard (yaml/parser.rs:509-524): inf/nan-looking strings
  are NOT numbers (only exact case variants of null/bool tokens map).
- TOML ints (lexer/toml.rs:426-501): 0x/0o/0b radix, '_' separators.
- TOML datetimes (toml/parser.rs:492-536): RFC3339 offset, local
  datetime (T or space), local date, local time — first match wins.

Everything is try_cast-based: malformed input yields NULL (the engine's
collect-don't-abort contract), never an exception.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NULL_TOKENS = ("", "null")
_BOOL_TOKENS = ("true", "false")
# strict JSON number grammar (lexer/json.rs:313-394)
JSON_NUMBER_RE = "^-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def infer_cell_type(
    raw: Column, quoted: Column | None = None, allow_special_floats: bool = False
) -> Column:
    """Classify a raw cell into {'null','bool','long','double','string'}
    with the reference CSV cascade. ``quoted`` cells are always 'string'
    (quote-preservation contract).

    ``allow_special_floats`` picks the side of the reference's
    inf/nan fork: TOML accepts the exact tokens inf/+inf/-inf/nan/+nan/
    -nan as floats (parse_special_float, lexer/toml.rs:504-511), while
    CSV (is_finite, csv.rs:24-28) and YAML (yaml/parser.rs:509-524)
    keep all inf/nan-looking strings as strings."""
    lowered = F.lower(F.trim(raw))
    special_float = F.trim(raw).isin("inf", "+inf", "-inf", "nan", "+nan", "-nan")
    unquoted_type = (
        F.when(raw.isNull() | lowered.isin(*_NULL_TOKENS), "null")
        .when(lowered.isin(*_BOOL_TOKENS), "bool")
        # inf/nan fork (see above): TOML-mode types the exact special
        # tokens as doubles; CSV/YAML-mode strings the whole deny-list
        .when(special_float, "double" if allow_special_floats else "string")
        .when(lowered.isin("inf", "+inf", "-inf", "nan", "infinity", "-infinity"), "string")
        # i64-then-f64: a long-parseable cell is 'long', else double.
        # The long branch must NOT accept '1.0' (try_cast(long) truncates),
        # so require an integral grammar first.
        .when(F.trim(raw).rlike("^[+-]?[0-9]+$") & F.trim(raw).try_cast("long").isNotNull(), "long")
        .when(F.trim(raw).try_cast("double").isNotNull(), "double")
        .otherwise("string")
    )
    if quoted is None:
        return unquoted_type
    return F.when(quoted, F.lit("string")).otherwise(unquoted_type)


def try_cast_cascade(raw: Column) -> Column:
    """Best-effort typed value as a struct(type, long_v, double_v, bool_v,
    string_v) — the columnar stand-in for the reference's Value enum."""
    t = infer_cell_type(raw)
    trimmed = F.trim(raw)
    return F.struct(
        t.alias("type"),
        F.when(t == "long", trimmed.try_cast("long")).alias("long_v"),
        F.when(t == "double", trimmed.try_cast("double")).alias("double_v"),
        F.when(t == "bool", F.lower(trimmed) == "true").alias("bool_v"),
        F.when(t == "string", raw).alias("string_v"),
    )


def parse_int_any(raw: Column) -> Column:
    """TOML integer grammar: optional sign, '_' separators, 0x/0o/0b
    radix (lexer/toml.rs:426-501). Returns long or NULL."""
    cleaned = F.regexp_replace(F.trim(raw), "_", "")
    hexish = F.regexp_extract(cleaned, "^[+-]?0[xX]([0-9a-fA-F]+)$", 1)
    octish = F.regexp_extract(cleaned, "^[+-]?0[oO]([0-7]+)$", 1)
    binish = F.regexp_extract(cleaned, "^[+-]?0[bB]([01]+)$", 1)
    sign = F.when(cleaned.startswith("-"), F.lit(-1)).otherwise(F.lit(1)).cast("long")
    return (
        F.when(hexish != "", sign * F.conv(hexish, 16, 10).try_cast("long"))
        .when(octish != "", sign * F.conv(octish, 8, 10).try_cast("long"))
        .when(binish != "", sign * F.conv(binish, 2, 10).try_cast("long"))
        .otherwise(cleaned.try_cast("long"))
    )


# datetime formats, first-match-wins (toml/parser.rs:492-536 order)
_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd",
]


def parse_datetime_any(raw: Column) -> Column:
    """Multi-format timestamp cascade; NULL when nothing matches.
    The rlike pre-filter mirrors is_datetime_like (lexer/toml.rs:513-528):
    cheap gate before the expensive format attempts."""
    looks = raw.rlike("^\\d{4}-\\d{2}-\\d{2}")
    cascade = F.coalesce(*[F.try_to_timestamp(F.trim(raw), F.lit(f)) for f in _TS_FORMATS])
    return F.when(looks, cascade).otherwise(F.lit(None).cast("timestamp"))
