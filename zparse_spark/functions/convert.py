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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


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


# --------------------------------------------------------------------------
# XML entity escape / decode (convert.rs:652-659, xml/parser.rs:341-390)
# --------------------------------------------------------------------------

_XML_NAMED = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]

# tokenizer: terminated entity | bare '&' run (always invalid) | text run.
# Alternation order matters — Java regex takes the first alternative.
_XML_TOKEN = "(&[^;&]*;|&[^&]*|[^&]+)"
_DEC_ENTITY = "^#0*([0-9]{1,7})$"
_HEX_ENTITY = "^#x0*([0-9a-fA-F]{1,6})$"


def xml_escape(text: Column) -> Column:
    """Escape the five XML entities, '&' first so already-produced
    entities are never double-escaped (exact replace order of the
    reference's escape_xml, convert.rs:652-659)."""
    out = text
    for ch, ent in _XML_NAMED:
        out = F.replace(out, F.lit(ch), F.lit(ent))
    return out


def _chr_utf8(cp: Column) -> Column:
    """Codepoint → one-character string, entirely JVM-side: the UTF-8
    byte sequence is computed arithmetically (shift/mask per the UTF-8
    spec), hex-assembled, and decoded — Spark has no unicode chr(), and
    dropping to Python for one character would poison the whole plan."""
    def byte_hex(b: Column) -> Column:
        return F.lpad(F.conv(b.cast("string"), 10, 16), 2, "0")

    def cont(shift: int) -> Column:
        piece = F.shiftright(cp, shift).bitwiseAND(F.lit(0x3F)) if shift else cp.bitwiseAND(
            F.lit(0x3F)
        )
        return byte_hex(F.lit(0x80).bitwiseOR(piece))

    hexes = (
        F.when(cp < 0x80, byte_hex(cp))
        .when(
            cp < 0x800,
            F.concat(byte_hex(F.lit(0xC0).bitwiseOR(F.shiftright(cp, 6))), cont(0)),
        )
        .when(
            cp < 0x10000,
            F.concat(byte_hex(F.lit(0xE0).bitwiseOR(F.shiftright(cp, 12))), cont(6), cont(0)),
        )
        .otherwise(
            F.concat(
                byte_hex(F.lit(0xF0).bitwiseOR(F.shiftright(cp, 18))), cont(12), cont(6), cont(0)
            )
        )
    )
    return F.decode(F.unhex(hexes), "UTF-8")


def _decode_entity_token(tok: Column) -> Column:
    """One tokenizer token → decoded text, or NULL if it is an invalid
    entity (the reference's InvalidToken 'invalid xml entity')."""
    body = F.regexp_extract(tok, "^&(.*);$", 1)  # strip '&' and ';'
    # significant digits only (leading zeros stripped by the capture), so
    # the numeric cast never sees an over-long string
    dec_digits = F.regexp_extract(body, _DEC_ENTITY, 1)
    hex_digits = F.regexp_extract(body, _HEX_ENTITY, 1)
    cp = F.when(dec_digits != "", dec_digits.cast("long")).when(
        hex_digits != "", F.conv(hex_digits, 16, 10).cast("long")
    )
    cp_ok = cp.isNotNull() & (cp <= 0x10FFFF) & ~((cp >= 0xD800) & (cp <= 0xDFFF))
    named = dict((ent[1:-1], ch) for ch, ent in _XML_NAMED)
    decoded = F.when(body == "amp", named["amp"])
    for name, ch in named.items():
        if name != "amp":
            decoded = decoded.when(body == name, ch)
    decoded = decoded.when(cp_ok, _chr_utf8(cp)).otherwise(F.lit(None).cast("string"))
    return (
        F.when(tok.rlike("^&.*;$"), decoded)
        .when(tok.startswith("&"), F.lit(None).cast("string"))  # bare/unterminated '&'
        .otherwise(tok)
    )


def xml_unescape(text: Column) -> Column:
    """Decode XML entities — named (amp/lt/gt/quot/apos) and numeric
    (&#NN; / &#xHH;, validated against the unicode scalar range like
    char::from_u32). A text containing any invalid entity decodes to
    NULL, mirroring the reference's hard error (xml/parser.rs:371-380);
    pair with ``xml_invalid_entity`` to surface those rows as rule
    violations. Tokenize → per-token decode → reassemble, all JVM-side.
    """
    toks = F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(_XML_TOKEN), F.lit(1))
    decoded = F.transform(toks, _decode_entity_token)
    any_bad = F.exists(decoded, lambda d: d.isNull())
    joined = F.array_join(decoded, "")
    return F.when(text.isNull() | any_bad, F.lit(None).cast("string")).otherwise(joined)


def xml_invalid_entity(text: Column) -> Column:
    """True iff the text contains an '&' that does not start a valid,
    range-checked entity — the rule-predicate twin of ``xml_unescape``'s
    NULL result."""
    return text.contains("&") & xml_unescape(text).isNull()


# --------------------------------------------------------------------------
# datetime formatting (convert.rs:471-490 format_datetime)
# --------------------------------------------------------------------------

_DT_PATTERNS = {
    "offset": "yyyy-MM-dd'T'HH:mm:ss'Z'",  # Rfc3339, UTC 'Z' suffix
    "local": "yyyy-MM-dd'T'HH:mm:ss",
    "date": "yyyy-MM-dd",
    "time": "HH:mm:ss",
}


def format_datetime(ts: Column, variant: str = "offset") -> Column:
    """The reference's four-way TOML datetime serialization
    (OffsetDateTime→RFC3339 / LocalDateTime / LocalDate / LocalTime,
    convert.rs:471-490) as date_format patterns. The session runs UTC,
    so 'offset' appends the RFC3339 'Z' designator."""
    if variant not in _DT_PATTERNS:
        raise ValueError(f"unknown variant {variant!r}")
    return F.date_format(ts, _DT_PATTERNS[variant])


# --------------------------------------------------------------------------
# C8/C9: Value→XML serialization and XML→table (convert.rs:545-659, 341-430)
# --------------------------------------------------------------------------


def to_xml_lines(df: DataFrame) -> DataFrame:
    """Rows → XML element strings (C8, Value→XML: convert.rs:545-659).
    Non-finite doubles are nulled first (same contract as the JSON
    serializer); entity escaping of text content is handled by the
    built-in ``to_xml`` (the &amp;/&lt;/... set of escape_xml,
    convert.rs:652-659)."""
    clean = sanitize_doubles(df)
    return clean.select(
        F.to_xml(F.struct(*[F.col(c) for c in clean.columns])).alias("xml")
    )


_XML_TAG_PATTERN = "<[A-Za-z_][^<>]*>"
_XML_ATTR_PATTERN = "([A-Za-z_][\\w.:-]*)\\s*=\\s*(?:\"[^\"]*\"|'[^']*')"


def xml_duplicate_attr(col: Column) -> Column:
    """First duplicated attribute name across the document's start tags,
    or NULL when every tag's attributes are unique — the reference
    REJECTS duplicated attributes (xml/parser.rs:175-177, kind
    DuplicateKey); Spark's from_xml also fails the parse but silently
    (an all-NULL row with no reason), so this column is the attribution.
    Pure JVM expression (regexp_extract_all + HOFs, no Python): extract
    start tags, extract each tag's attribute-name list, keep names whose
    first occurrence index differs from their own (i.e. later
    duplicates). Scan-level heuristic: a literal ``>`` inside a quoted
    attribute value truncates that tag's scan window (the reference's
    full lexer tracks quote state; this advisory detector trades that
    corner for staying inside codegen)."""
    tags = F.regexp_extract_all(col, F.lit(_XML_TAG_PATTERN), F.lit(0))
    attr_lists = F.transform(
        tags, lambda t: F.regexp_extract_all(t, F.lit(_XML_ATTR_PATTERN), F.lit(1))
    )
    dup_names = F.flatten(
        F.transform(
            attr_lists,
            lambda a: F.filter(a, lambda x, i: F.array_position(a, x) - 1 != i),
        )
    )
    return F.get(dup_names, 0)


def from_xml_lines(
    df: DataFrame, schema: str, col: str = "xml", flag_duplicate_attrs: bool = False
) -> DataFrame:
    """XML element strings → typed columns (C9 direction XML→table,
    convert.rs:341-430). Repeated child elements fold into arrays when
    the schema says ARRAY — the reference's repeated-element→array rule
    (element_to_value, convert.rs:562-588); entities are decoded by the
    built-in parser (xml/parser.rs:341-390 analog).

    ``flag_duplicate_attrs=True`` appends a ``_dup_attr`` column (the
    first duplicated attribute name, NULL when clean): the reference
    rejects duplicate attributes as DuplicateKey (xml/parser.rs:175-177)
    and from_xml rejects them too — but anonymously, as an all-NULL
    row indistinguishable from missing fields; the flag lets ingest
    emit an attributed violation row instead. Non-XML columns of ``df``
    pass through unchanged (provenance/id columns survive the parse)."""
    passthrough = [c for c in df.columns if c != col]
    out = df.select(
        *passthrough, F.col(col).alias("_src"), F.from_xml(F.col(col), schema).alias("_r")
    )
    cols = [*passthrough, F.col("_r.*")]
    if flag_duplicate_attrs:
        cols.append(xml_duplicate_attr(F.col("_src")).alias("_dup_attr"))
    return out.select(*cols)


def normalize_for_target(df: DataFrame, target: str) -> DataFrame:
    """C2 (convert.rs:84-93): a CSV rows-array must be wrapped in a root
    object when targeting TOML (TOML's root is necessarily a table,
    convert.rs:295-303). Tabular analog: fold the frame into ONE row
    ``{rows: array<struct<...>>}``.

    Scale contract: this is by definition a global fold to a single
    value — the reference applies it to one in-memory document, and the
    engine applies it to bounded slices (a partition's violation sample,
    a report page), never to an unbounded table. The aggregate itself
    is still distributed (partial collect_lists merge at the final
    reducer); only the RESULT is single-row. Other targets return the
    input verbatim (the C1 fast path).
    """
    if target != "toml":
        return df
    return df.agg(
        F.collect_list(F.struct(*[F.col(c) for c in df.columns])).alias("rows")
    )


def xml_rows_to_table(df: DataFrame, columns: list[str], col: str = "xml") -> DataFrame:
    """C9 return path (convert.rs:341-430): ``<row><col>text</col>…``
    strings → a typed table. Every cell comes back as TEXT and is
    re-inferred through the CSV cascade (the reference re-parses each
    leaf through ``infer_type``, convert.rs:411-430) — here each column
    becomes the ``try_cast_cascade`` struct(type, long_v, double_v,
    bool_v, string_v), the columnar stand-in for the Value enum.

    The reference's leaf-only constraint (row children must not have
    element children, convert.rs:399-409) surfaces as ``_leaf_violation``
    instead of aborting: ``from_xml`` hands nested content back as raw
    inner XML, so a cell matching an element tag marks the row (collect,
    don't abort — same stance as the CSV corrupt-record column).
    Malformed XML rows carry ``_corrupt`` true.
    """
    from zparse_spark.functions.inference import try_cast_cascade

    schema = ", ".join(f"`{c}` STRING" for c in columns) + ", `_corrupt_record` STRING"
    parsed = df.select(
        F.from_xml(
            F.col(col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("_r")
    )
    cell = lambda c: F.col(f"_r.`{c}`")  # noqa: E731
    nested = lambda c: cell(c).rlike("<[^<>]+>")  # noqa: E731
    leaf_bad = None
    for c in columns:
        leaf_bad = nested(c) if leaf_bad is None else (leaf_bad | nested(c))
    return parsed.select(
        *[
            try_cast_cascade(F.when(~nested(c), cell(c))).alias(c)
            for c in columns
        ],
        F.coalesce(leaf_bad, F.lit(False)).alias("_leaf_violation"),
        F.col("_r._corrupt_record").isNotNull().alias("_corrupt"),
    )


# --------------------------------------------------------------------------
# C5/C6: TOML / YAML text serializers (convert.rs:295-339, 436-465)
# --------------------------------------------------------------------------

_TEXT_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]

_INTEGRALS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATS = (T.FloatType, T.DoubleType)
_INF = float("inf")


def escape_text(col: Column) -> Column:
    """The reference's shared escape_string (convert.rs:276-289): \\\\,
    double quote, LF, CR, TAB — backslash first, so escapes produced by
    the later replacements are never themselves re-escaped.
    escape_json/escape_toml/escape_yaml are all aliases of this one
    function in the reference (convert.rs:291-292, 432-433, 467-468)."""
    out = col
    for ch, esc in _TEXT_ESCAPES:
        out = F.replace(out, F.lit(ch), F.lit(esc))
    return out


def _toml_value(col: Column, dt: T.DataType) -> Column:
    """One typed column → its TOML value text (serialize_toml_value,
    convert.rs:313-338). Null → ``\"\"`` (TOML has no null; the
    reference serializes Value::Null as an empty string literal),
    non-finite floats → ``nan``, arrays inline ``[a, b]``, structs as
    inline tables ``{k = v}``. Typed long columns keep integer rendering
    (the reference collapses every number to f64 and relies on Rust's
    shortest-repr Display; with real column types the int/float split is
    schema knowledge, and float text uses the JVM/DuckDB-portable
    ``1.0``-style rendering — structure/escaping/null/non-finite are the
    preserved contract, not float digit cosmetics)."""
    if isinstance(dt, T.StringType):
        base = F.concat(F.lit('"'), escape_text(col), F.lit('"'))
    elif isinstance(dt, T.BooleanType):
        base = F.when(col, F.lit("true")).otherwise(F.lit("false"))
    elif isinstance(dt, _INTEGRALS):
        base = col.cast("string")
    elif isinstance(dt, _FLOATS):
        base = F.when(F.isnan(col) | (F.abs(col) == _INF), F.lit("nan")).otherwise(
            col.cast("string")
        )
    elif isinstance(dt, T.TimestampType):
        base = format_datetime(col, "offset")
    elif isinstance(dt, T.DateType):
        base = format_datetime(col, "date")
    elif isinstance(dt, T.ArrayType):
        et = dt.elementType
        base = F.concat(
            F.lit("["),
            F.array_join(F.transform(col, lambda x: _toml_value(x, et)), ", "),
            F.lit("]"),
        )
    elif isinstance(dt, T.StructType):
        base = F.concat(
            F.lit("{"),
            F.concat_ws(
                ", ",
                *[
                    F.concat(
                        F.lit(f.name + " = "), _toml_value(col.getField(f.name), f.dataType)
                    )
                    for f in dt.fields
                ],
            ),
            F.lit("}"),
        )
    else:
        raise TypeError(f"no TOML serialization for {dt.simpleString()}")
    return F.when(col.isNull(), F.lit('""')).otherwise(base)


def toml_doc(fields: list[T.StructField]) -> Column:
    """The per-row TOML root table as one Column — ``key = value`` per
    field, newline-joined (serialize_toml_object, convert.rs:305-311)."""
    return F.concat_ws(
        "\n",
        *[
            F.concat(F.lit(f.name + " = "), _toml_value(F.col(f.name), f.dataType))
            for f in fields
        ],
    )


def to_toml_lines(df: DataFrame) -> DataFrame:
    """Rows → TOML documents (C5, serialize_toml: convert.rs:295-311).
    Each row is the reference's root table — one ``key = value`` line
    per column, newline-joined; the root-must-be-object error
    (convert.rs:299-303) cannot fire because a row IS an object.
    Compiled from the static schema into one JVM expression tree:
    map-only, no Python, no shuffle, scale-free."""
    return df.select(toml_doc(df.schema.fields).alias("toml"))


def _yaml_scalar(col: Column, dt: T.DataType) -> Column:
    """Unpadded YAML scalar text (the scalar arms of serialize_yaml,
    convert.rs:439-444): strings always double-quoted + escaped,
    non-finite floats keep Rust Display's NaN/inf/-inf spellings."""
    if isinstance(dt, T.StringType):
        return F.concat(F.lit('"'), escape_text(col), F.lit('"'))
    if isinstance(dt, T.BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if isinstance(dt, _INTEGRALS):
        return col.cast("string")
    if isinstance(dt, _FLOATS):
        return (
            F.when(F.isnan(col), F.lit("NaN"))
            .when(col == _INF, F.lit("inf"))
            .when(col == -_INF, F.lit("-inf"))
            .otherwise(col.cast("string"))
        )
    if isinstance(dt, T.TimestampType):
        return format_datetime(col, "offset")
    if isinstance(dt, T.DateType):
        return format_datetime(col, "date")
    raise TypeError(f"no YAML scalar serialization for {dt.simpleString()}")


def _yaml_value(col: Column, dt: T.DataType, indent: int) -> Column:
    """One typed column → a padded, possibly multi-line YAML block
    (serialize_yaml, convert.rs:436-465). Arrays become ``- item`` lines
    (first line of a nested item folded onto the dash, exactly the
    reference's trim_start), structs become ``key: scalar`` /
    ``key:`` + nested block at indent+2. A NULL array/struct renders
    ``null`` like the reference's Value::Null arm. Indentation is
    schema-static, so the whole block compiles to JVM concat/transform
    expressions — no Python in the plan."""
    pad = " " * indent
    if isinstance(dt, T.ArrayType):
        et = dt.elementType
        items = F.transform(
            col, lambda x: F.concat(F.lit(pad + "- "), F.ltrim(_yaml_value(x, et, indent + 2)))
        )
        return F.when(col.isNull(), F.lit(pad + "null")).otherwise(F.array_join(items, "\n"))
    if isinstance(dt, T.StructType):
        lines = []
        for f in dt.fields:
            v = col.getField(f.name)
            if isinstance(f.dataType, (T.ArrayType, T.StructType)):
                line = F.when(v.isNull(), F.lit(f"{pad}{f.name}: null")).otherwise(
                    F.concat(
                        F.lit(f"{pad}{f.name}:\n"), _yaml_value(v, f.dataType, indent + 2)
                    )
                )
            else:
                line = F.concat(
                    F.lit(f"{pad}{f.name}: "),
                    F.when(v.isNull(), F.lit("null")).otherwise(_yaml_scalar(v, f.dataType)),
                )
            lines.append(line)
        return F.when(col.isNull(), F.lit(pad + "null")).otherwise(
            F.concat_ws("\n", *lines)
        )
    return F.concat(
        F.lit(pad), F.when(col.isNull(), F.lit("null")).otherwise(_yaml_scalar(col, dt))
    )


def yaml_doc(schema: T.StructType) -> Column:
    """The per-row YAML root mapping (indent 0) as one Column."""
    row = F.struct(*[F.col(f.name) for f in schema.fields])
    return _yaml_value(row, schema, 0)


def to_yaml_lines(df: DataFrame) -> DataFrame:
    """Rows → YAML documents (C6, serialize_yaml: convert.rs:436-465).
    Each row serializes as the root mapping at indent 0."""
    return df.select(yaml_doc(df.schema).alias("yaml"))


# --------------------------------------------------------------------------
# TOML / YAML ingest: document strings → typed columns (the source side of
# the reference's any→any format router, convert.rs:95-119; parsers at
# toml/parser.rs:88-122 and yaml/parser.rs:63-144). Closes the X18
# round-trip: from_toml_lines(to_toml_lines(df)) == df for flat rows.
# --------------------------------------------------------------------------


def _jsonable(v):
    """Normalize a parsed TOML/YAML value tree to JSON-serializable:
    datetimes/dates/times → ISO-8601 strings (Spark's from_json casts
    them back to timestamp/date per the target schema — the reference's
    TomlDatetime cascade, toml/parser.rs datetime arms, carried as
    text), non-finite floats → null (the C3 non-finite contract),
    tuples → lists, keys → str."""
    import datetime as _dt
    import math

    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, (_dt.date, _dt.time)):
        return v.isoformat()
    if isinstance(v, float) and not math.isfinite(v):
        return None
    return v


def _from_parsed_lines(
    df: DataFrame, schema: str | T.StructType, col: str, parse_one
) -> DataFrame:
    """Shared ingest shape for formats Spark has no native reader for:
    an Arrow pandas UDF parses each document string to a JSON string
    (parsing text is inherently per-document — same unit of work as the
    reference's per-input parse), then the JVM's from_json does ALL the
    typing/casting against the target schema. Malformed documents and
    non-mapping roots are kept and flagged ``_corrupt`` (collect-don't-
    abort, same contract as from_json_lines); typing errors inside a
    well-formed document surface through from_json's PERMISSIVE
    corrupt-record column. Map-only: no shuffle, one Python stage."""
    import json as _json

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    @pandas_udf(T.StringType())
    def _to_json(s: pd.Series) -> pd.Series:
        def one(txt):
            if txt is None:
                return None
            try:
                obj = parse_one(txt)
            except Exception:
                return None
            if not isinstance(obj, dict):
                # root must be a table/mapping for table-shaped ingest —
                # the TOML root IS a table by grammar; a YAML scalar/list
                # root is legal YAML but has no row shape (the reference
                # returns Value trees; a table engine needs columns)
                return None
            try:
                return _json.dumps(_jsonable(obj), allow_nan=False)
            except (TypeError, ValueError):
                return None

        return s.map(one)

    with_cr = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    staged = df.select(F.col(col).alias("_src"), _to_json(F.col(col)).alias("_json"))
    parsed = staged.select(
        "_src",
        "_json",
        F.from_json(
            F.col("_json"),
            with_cr,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("v"),
    )
    return parsed.select(
        *[F.col(f"v.{f.name}") for f in schema.fields],
        (
            (F.col("_src").isNotNull() & F.col("_json").isNull())
            | F.col("v._corrupt_record").isNotNull()
        ).alias("_corrupt"),
    )


def from_toml_lines(
    df: DataFrame, schema: str | T.StructType, col: str = "toml"
) -> DataFrame:
    """TOML document strings → typed columns (source side of the format
    router, convert.rs:95-119; parser semantics = TOML 1.0 via stdlib
    tomllib: radix ints, inf/nan, the four-way datetime cascade of
    toml/parser.rs — offset/local datetimes and dates arrive as ISO
    strings and cast per the schema; local times stay strings).
    Dotted keys/[table] headers nest like the reference's
    insert_dotted_key — address them with struct fields in the schema.
    Malformed rows are kept with ``_corrupt = true``."""
    import tomllib

    return _from_parsed_lines(df, schema, col, tomllib.loads)


def from_yaml_lines(
    df: DataFrame, schema: str | T.StructType, col: str = "yaml"
) -> DataFrame:
    """YAML document strings → typed columns (yaml/parser.rs:63-144:
    indent-scoped mappings/sequences, core-schema scalar typing).
    Root must be a mapping (table-shaped ingest); malformed rows and
    non-mapping roots are kept with ``_corrupt = true``. Requires
    PyYAML (import-gated: raises ImportError at call time, not module
    import, when absent)."""
    import yaml

    def _load(txt: str):
        return yaml.safe_load(txt)

    return _from_parsed_lines(df, schema, col, _load)


# --------------------------------------------------------------------------
# JSONC ingest: comment + trailing-comma stripping (lexer/json.rs:165-217,
# json/parser.rs:20-23 Config.with_comments / with_trailing_commas)
# --------------------------------------------------------------------------

# Quote-aware via alternation-capture: a complete string literal matches
# FIRST (group 1, kept), so '//', '/*' and ',' inside strings can never
# match the comment/comma alternatives. Deliberately lookaround-free —
# the identical patterns run under Java regex (Spark) and RE2 (DuckDB),
# so the stripper is oracle-checkable cross-engine. The block-comment
# branch is the classic lookahead-free form.
JSONC_STRING = '("(?:[^"\\\\]|\\\\.)*")'
JSONC_LINE_COMMENT = "//[^\\n\\r]*"
JSONC_BLOCK_COMMENT = "/\\*[^*]*\\*+(?:[^/*][^*]*\\*+)*/"
JSONC_COMMENT_PATTERN = f"{JSONC_STRING}|{JSONC_LINE_COMMENT}|{JSONC_BLOCK_COMMENT}"
JSONC_TRAILING_COMMA_PATTERN = JSONC_STRING + "|,(\\s*[}\\]])"


def strip_jsonc(col: Column, trailing_commas: bool = True) -> Column:
    """JSONC → strict JSON: remove ``//`` and ``/* */`` comments (and,
    by default, trailing commas) OUTSIDE string literals, so the result
    feeds ``from_json``/``get_json_object`` directly. Two JVM
    ``regexp_replace`` passes — whole-stage codegen, no Python, no
    shuffle; the map-only shape holds at any scale.

    Mirrors the reference's lenient JSON mode
    (lexer/json.rs:165-217 skips both comment forms;
    json/parser.rs:20-23 gates comments/trailing commas behind Config) —
    there the lexer skips comments in-stream; here the same token
    classes vanish in one vectorized pass before parsing."""
    out = F.regexp_replace(col, JSONC_COMMENT_PATTERN, "$1")
    if trailing_commas:
        out = F.regexp_replace(out, JSONC_TRAILING_COMMA_PATTERN, "$1$2")
    return out
