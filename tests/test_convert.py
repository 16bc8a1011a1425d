"""Conversion-surface contracts from the reference test suite:
header union (csv_tests.rs:261-267), quoted-string round-trip
(csv_tests.rs:270-278), non-finite → null (convert.rs:258-260)."""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from zparse_spark.functions.convert import (
    from_json_lines,
    header_union,
    sanitize_doubles,
    to_json_lines,
    write_csv,
)


def test_header_union_across_heterogeneous_rows(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "a"])
    b = spark.createDataFrame([(2, "y")], ["id", "b"])
    out = header_union([a, b])
    assert out.columns == ["id", "a", "b"]
    rows = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert rows == {1: ("x", None), 2: (None, "y")}


def test_nonfinite_serializes_null(spark):
    df = spark.createDataFrame(
        [(1.5,), (float("nan"),), (float("inf",),), (float("-inf"),)], ["v"]
    )
    lines = [json.loads(r["json"]) for r in to_json_lines(df).collect()]
    assert lines[0] == {"v": 1.5}
    for l in lines[1:]:
        assert "v" not in l or l["v"] is None  # to_json drops nulls or emits null


def test_json_roundtrip_identity(spark):
    df = spark.createDataFrame([(1, "a", 2.5), (2, "b", None)], ["id", "s", "v"])
    back = from_json_lines(to_json_lines(df), "id BIGINT, s STRING, v DOUBLE")
    got = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
    assert got == [(1, "a", 2.5), (2, "b", None)]
    assert back.filter("_corrupt").count() == 0


def test_malformed_json_flagged_not_fatal(spark):
    df = spark.createDataFrame([('{"id": 1}',), ("{oops",)], ["json"])
    out = from_json_lines(df, "id BIGINT")
    assert out.filter("_corrupt").count() == 1
    assert out.filter("id = 1").count() == 1


def test_csv_force_quoted_strings_roundtrip(spark, tmp_path):
    """'001' stays a string through a CSV round-trip because strings are
    force-quoted on write — the reference's quoted-preservation rule."""
    path = str(tmp_path / "csv_out")
    df = spark.createDataFrame([("001", 1), ("2.50", 2)], ["code", "n"])
    write_csv(df, path)
    raw = spark.read.text(path).filter(F.col("value").contains("001")).collect()
    assert '"001"' in raw[0]["value"]
    back = spark.read.option("header", "true").csv(path)  # no inference
    codes = sorted(r["code"] for r in back.collect())
    assert codes == ["001", "2.50"]


def test_sanitize_doubles_only_touches_float_cols(spark):
    df = spark.createDataFrame([(1, float("nan"), "x")], ["i", "d", "s"])
    out = sanitize_doubles(df).collect()[0]
    assert out["i"] == 1 and out["s"] == "x" and out["d"] is None


# ---------------------------------------------------------------------------
# XML entity decode/escape (xml/parser.rs:341-390, convert.rs:652-659)
# + datetime formatting (convert.rs:471-490)
# ---------------------------------------------------------------------------


def test_xml_escape_and_unescape_matrix(spark):
    from zparse_spark.functions.convert import xml_escape, xml_invalid_entity, xml_unescape

    rows = [
        ("named", "&amp;&lt;&gt;&quot;&apos;", "&<>\"'"),
        ("numeric", "A&#66;C &#x44; &#x1F600;", "ABC D \U0001F600"),
        ("leading_zeros", "&#0000065;&#x0041;", "AA"),
        ("plain", "no entities", "no entities"),
        ("empty", "", ""),
        ("bad_name", "oops &bogus; x", None),
        ("bare_amp", "a & b", None),
        ("unterminated", "a &amp", None),
        ("lone_surrogate", "&#xD800;", None),
        ("beyond_unicode", "&#x110000;", None),
    ]
    df = spark.createDataFrame([(k, t) for k, t, _ in rows], ["k", "t"])
    got = {
        r["k"]: (r["dec"], r["bad"])
        for r in df.select(
            "k",
            xml_unescape(F.col("t")).alias("dec"),
            xml_invalid_entity(F.col("t")).alias("bad"),
        ).collect()
    }
    for k, _, want in rows:
        dec, bad = got[k]
        assert dec == want, (k, dec, want)
        assert bad == (want is None), (k, bad)

    # escape matches the reference's replace order ('&' first) and
    # roundtrips arbitrary text through unescape
    nasty = "a<b & c>'d'\"e\" &amp; tail"
    df2 = spark.createDataFrame([(nasty,)], ["t"])
    esc, rt = df2.select(
        xml_escape(F.col("t")).alias("e"), xml_unescape(xml_escape(F.col("t"))).alias("rt")
    ).collect()[0]
    assert esc == "a&lt;b &amp; c&gt;&apos;d&apos;&quot;e&quot; &amp;amp; tail"
    assert rt == nasty


def test_format_datetime_variants(spark):
    from zparse_spark.functions.convert import format_datetime

    df = spark.createDataFrame([("2024-03-05 07:32:09",)], ["s"]).select(
        F.to_timestamp("s").alias("ts")
    )
    got = df.select(
        *[format_datetime(F.col("ts"), v).alias(v) for v in ["offset", "local", "date", "time"]]
    ).collect()[0]
    assert got["offset"] == "2024-03-05T07:32:09Z"
    assert got["local"] == "2024-03-05T07:32:09"
    assert got["date"] == "2024-03-05"
    assert got["time"] == "07:32:09"


def test_xml_lines_roundtrip_and_repeated_elements(spark):
    """C8/C9: rows → XML strings → rows roundtrips (entities escaped on
    the way out, decoded on the way in), and repeated child elements
    fold into an array like the reference's element_to_value."""
    from zparse_spark.functions.convert import from_xml_lines, to_xml_lines

    df = spark.createDataFrame(
        [(1, "x & <y>", 2.5), (2, "plain", float("inf"))], ["k", "s", "v"]
    )
    xml = to_xml_lines(df)
    lines = [r["xml"] for r in xml.collect()]
    # built-in to_xml escapes '&' and '<' (bare '>' is valid XML text)
    assert "&amp;" in lines[0] and "&lt;y>" in lines[0]
    back = from_xml_lines(xml, "k INT, s STRING, v DOUBLE").orderBy("k").collect()
    assert [(r["k"], r["s"]) for r in back] == [(1, "x & <y>"), (2, "plain")]
    assert back[0]["v"] == 2.5 and back[1]["v"] is None  # inf nulled pre-serialization

    rep = spark.createDataFrame(
        [("<row><v>1</v><v>2</v><v>3</v></row>",), ("<row><v>9</v></row>",)], ["xml"]
    )
    arr = from_xml_lines(rep, "v ARRAY<INT>").collect()
    assert sorted(tuple(r["v"]) for r in arr) == [(1, 2, 3), (9,)]


def test_normalize_for_target_toml_root_object(spark):
    """C2: targeting TOML folds the rows array into one root object
    {rows: [...]} (convert.rs:84-93); any other target is the C1
    fast path (input returned verbatim)."""
    from pyspark.sql import functions as F

    from zparse_spark.functions.convert import normalize_for_target

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    assert normalize_for_target(df, "json") is df
    out = normalize_for_target(df, "toml")
    rows = out.collect()
    assert len(rows) == 1
    inner = sorted((r["k"], r["s"]) for r in rows[0]["rows"])
    assert inner == [(1, "a"), (2, "b")]


def test_xml_rows_to_table_reinfers_types(spark):
    """C9 return path: each leaf cell is re-inferred through the CSV
    cascade (convert.rs:411-430) — '42'→long, '3.5'→double, 'true'→bool,
    'hi'→string; nested children flag _leaf_violation (convert.rs:399-
    409); malformed XML flags _corrupt."""
    from zparse_spark.functions.convert import xml_rows_to_table

    df = spark.createDataFrame(
        [
            ("<row><a>42</a><b>hi</b></row>",),
            ("<row><a>3.5</a><b>true</b></row>",),
            ("<row><a><x>1</x></a><b>ok</b></row>",),
            ("<<not xml",),
        ],
        ["xml"],
    )
    out = xml_rows_to_table(df, ["a", "b"]).collect()

    r0 = out[0]
    assert (r0["a"]["type"], r0["a"]["long_v"]) == ("long", 42)
    assert (r0["b"]["type"], r0["b"]["string_v"]) == ("string", "hi")
    assert not r0["_leaf_violation"] and not r0["_corrupt"]

    r1 = out[1]
    assert (r1["a"]["type"], r1["a"]["double_v"]) == ("double", 3.5)
    assert (r1["b"]["type"], r1["b"]["bool_v"]) == ("bool", True)

    r2 = out[2]
    assert r2["_leaf_violation"] and r2["a"]["type"] == "null"
    assert r2["b"]["string_v"] == "ok"

    assert out[3]["_corrupt"]


def test_strip_jsonc_matrix(spark):
    """tests/jsonc_tests.rs:29-69 behaviors: comments + trailing commas
    vanish, strings survive untouched, and every stripped result parses
    as strict JSON."""
    from zparse_spark.functions.convert import strip_jsonc

    cases = [
        # (jsonc, expected_strict)
        ('{"a": 1}', '{"a": 1}'),
        ('{ // c\n"a": 1}', '{ \n"a": 1}'),
        ('{"a": 1 /* block */}', '{"a": 1 }'),
        ('{"a": 1, /* multi\nline */ "b": 2}', '{"a": 1,  "b": 2}'),
        # comment-lookalikes inside strings are data, not comments
        ('{"u": "http://x/y", "c": "/* keep */ // keep"}',
         '{"u": "http://x/y", "c": "/* keep */ // keep"}'),
        # escaped quote does not end the string early
        ('{"q": "a\\" // still-string"}', '{"q": "a\\" // still-string"}'),
        # trailing commas in object and array (jsonc_tests.rs:29-42)
        ('{"arr": [1, 2, 3,],}', '{"arr": [1, 2, 3]}'),
        # star-heavy block comment (lookahead-free grammar edge)
        ('{"a": 1 /*** x ***/}', '{"a": 1 }'),
        # comma inside a string is untouched by the trailing-comma pass
        ('{"s": ", ]",}', '{"s": ", ]"}'),
    ]
    df = spark.createDataFrame(cases, ["jsonc", "expected"]).withColumn(
        "strict", strip_jsonc(F.col("jsonc"))
    )
    for r in df.collect():
        assert r["strict"] == r["expected"], (r["jsonc"], r["strict"])
    # every stripped result is valid strict JSON (convert_jsonc_to_json
    # contract, jsonc_tests.rs:45-69): from_json returns non-null
    parsed = df.select(
        F.from_json("strict", "map<string,string>").alias("m"), "strict"
    ).collect()
    assert all(r["m"] is not None for r in parsed), [r for r in parsed if r["m"] is None]
    # comments-only mode keeps trailing commas (with_trailing_commas=false)
    one = spark.range(1).select(
        strip_jsonc(F.lit('{"a": 1, /* c */}'), trailing_commas=False).alias("s")
    ).collect()[0]["s"]
    assert one == '{"a": 1, }'


def test_toml_serializer_matrix(spark):
    """serialize_toml (convert.rs:295-339): key = value lines, null →
    '""', non-finite → nan, escaped strings, inline arrays + tables,
    RFC3339 datetimes."""
    import datetime

    from zparse_spark.functions.convert import to_toml_lines

    df = spark.createDataFrame(
        [
            (
                1,
                'say "hi"\\now\n\tdone',
                None,
                float("nan"),
                2.5,
                True,
                ["a", None],
                {"k": 7, "s": "v"},
                datetime.datetime(1979, 5, 27, 7, 32, 0),
            )
        ],
        "id long, s string, missing string, bad double, ok double, flag boolean, "
        "arr array<string>, obj struct<k: long, s: string>, ts timestamp",
    )
    out = to_toml_lines(df).collect()[0]["toml"]
    assert out == "\n".join(
        [
            "id = 1",
            's = "say \\"hi\\"\\\\now\\n\\tdone"',
            'missing = ""',
            "bad = nan",
            "ok = 2.5",
            "flag = true",
            'arr = ["a", ""]',
            'obj = {k = 7, s = "v"}',
            "ts = 1979-05-27T07:32:00Z",
        ]
    )


def test_yaml_serializer_matrix(spark):
    """serialize_yaml (convert.rs:436-465): block mappings, '- ' list
    items with the first nested line folded onto the dash (trim_start),
    indent+2 nesting, null arm, always-quoted strings."""
    from zparse_spark.functions.convert import to_yaml_lines

    df = spark.createDataFrame(
        [
            (
                1,
                'a "q" b',
                None,
                [1, 2],
                [{"k": 1, "t": "x"}, {"k": 2, "t": None}],
                {"inner": {"deep": "d"}, "n": 5},
            )
        ],
        "id long, s string, missing string, nums array<long>, "
        "objs array<struct<k: long, t: string>>, nest struct<inner: struct<deep: string>, n: long>",
    )
    out = to_yaml_lines(df).collect()[0]["yaml"]
    assert out == "\n".join(
        [
            "id: 1",
            's: "a \\"q\\" b"',
            "missing: null",
            "nums:",
            "  - 1",
            "  - 2",
            "objs:",
            "  - k: 1",
            '    t: "x"',
            "  - k: 2",
            "    t: null",
            "nest:",
            "  inner:",
            '    deep: "d"',
            "  n: 5",
        ]
    )


def test_yaml_nonfinite_and_null_containers(spark):
    from zparse_spark.functions.convert import to_yaml_lines

    df = spark.createDataFrame(
        [(float("nan"), float("inf"), float("-inf"), None, None)],
        "a double, b double, c double, arr array<long>, obj struct<k: long>",
    )
    out = to_yaml_lines(df).collect()[0]["yaml"]
    assert out == "a: NaN\nb: inf\nc: -inf\narr: null\nobj: null"


_ADVERSARIAL_STRINGS = [
    "",
    '"',
    "\\",
    "\n",
    "\t",
    "\r",
    'a"b\\c',
    "uni ü 中 🎉",
    "trailing backslash\\",
    '""\\""',
    "tab\tnl\nmix\r\\\"",
]


def test_toml_output_parses_with_real_parser(spark):
    """Validity oracle beyond string matching: every emitted document
    must round-trip through the stdlib TOML parser back to the original
    values (the reference's escape set \\ \" \\n \\r \\t is exactly what
    tomllib requires for these inputs)."""
    import math
    import tomllib

    rows = [(i, s) for i, s in enumerate(_ADVERSARIAL_STRINGS)]
    df = spark.createDataFrame(rows, "i long, s string")
    from zparse_spark.functions.convert import to_toml_lines

    parsed_by_i = {p["i"]: p["s"] for p in
                   (tomllib.loads(r["toml"]) for r in to_toml_lines(df).collect())}
    assert parsed_by_i == dict(rows)

    typed = spark.createDataFrame(
        [(float("nan"), True, [1, 2], {"k": "v"})],
        "f double, b boolean, arr array<long>, obj struct<k: string>",
    )
    parsed = tomllib.loads(to_toml_lines(typed).collect()[0]["toml"])
    assert math.isnan(parsed["f"]) and parsed["b"] is True
    assert parsed["arr"] == [1, 2] and parsed["obj"] == {"k": "v"}


def test_yaml_output_parses_with_real_parser(spark):
    """Same validity oracle for YAML: double-quoted scalars with the
    shared escape set are valid YAML escapes, so safe_load must recover
    the original values (non-finite floats excluded — the reference
    emits Rust Display spellings, parity-tested in the matrix test)."""
    import yaml

    rows = [(i, s) for i, s in enumerate(_ADVERSARIAL_STRINGS)]
    df = spark.createDataFrame(rows, "i long, s string")
    from zparse_spark.functions.convert import to_yaml_lines

    parsed_by_i = {p["i"]: p["s"] for p in
                   (yaml.safe_load(r["yaml"]) for r in to_yaml_lines(df).collect())}
    assert parsed_by_i == dict(rows)

    typed = spark.createDataFrame(
        [(None, [{"k": 1}, {"k": 2}], {"deep": {"x": "y"}})],
        "miss string, arr array<struct<k: long>>, obj struct<deep: struct<x: string>>",
    )
    parsed = yaml.safe_load(to_yaml_lines(typed).collect()[0]["yaml"])
    assert parsed == {"miss": None, "arr": [{"k": 1}, {"k": 2}], "obj": {"deep": {"x": "y"}}}


def test_from_toml_lines_scalar_matrix(spark):
    """TOML ingest scalar semantics (source side of the format router,
    convert.rs:95-119), mirroring toml_parser_tests.rs: basic table +
    [table] header nesting (test_parse_basic_table), the four-way
    datetime cascade (test_parse_datetime_values — offset/local
    datetimes and dates cast per schema, local time stays a string),
    radix ints, inf/nan floats, inline tables (test_parse_inline_table)
    and arrays."""
    from zparse_spark.functions.convert import from_toml_lines

    doc = (
        'title = "TOML"\n'
        "hexa = 0xDEADBEEF\n"
        "octal = 0o755\n"
        "binary = 0b1101\n"
        "big = 5_349_221\n"
        "naninf = inf\n"
        "offset = 1979-05-27T07:32:00Z\n"
        "local_date = 1979-05-27\n"
        "local_time = 07:32:00\n"
        "point = { x = 1, y = 2 }\n"
        "arr = [1, 2, 3]\n"
        "[owner]\n"
        'name = "Tom"\n'
    )
    schema = (
        "title string, hexa long, octal int, binary int, big long, "
        "naninf double, offset timestamp, local_date date, local_time string, "
        "point struct<x:int,y:int>, arr array<int>, owner struct<name:string>"
    )
    df = spark.createDataFrame([(doc,), ("not = valid = toml",), (None,)], "toml string")
    rows = from_toml_lines(df, schema).collect()
    good = next(r for r in rows if not r["_corrupt"] and r["title"] is not None)
    assert (good["hexa"], good["octal"], good["binary"], good["big"]) == (
        0xDEADBEEF, 0o755, 0b1101, 5349221,
    )
    assert good["naninf"] is None  # non-finite -> null (C3 contract)
    assert good["offset"].year == 1979 and str(good["local_date"]) == "1979-05-27"
    assert good["local_time"] == "07:32:00"
    assert (good["point"]["x"], good["point"]["y"]) == (1, 2)
    assert good["arr"] == [1, 2, 3] and good["owner"]["name"] == "Tom"
    # malformed row kept + flagged; NULL input is not corruption
    by_corrupt = sorted((r["_corrupt"] or False) for r in rows)
    assert by_corrupt == [False, False, True]


def test_from_yaml_lines_scalar_matrix(spark):
    """YAML ingest (yaml/parser.rs:63-144): indent-scoped nested
    mappings, block sequences, core-schema scalars (int/float/bool/
    null), quoted strings with escapes; non-mapping roots and malformed
    docs flag _corrupt."""
    from zparse_spark.functions.convert import from_yaml_lines

    doc = (
        "name: \"A \\\"q\\\" and\\nnewline\"\n"
        "count: 42\n"
        "ratio: 2.5\n"
        "ok: true\n"
        "missing: null\n"
        "tags:\n  - a\n  - b\n"
        "meta:\n  source: web\n  depth: 3\n"
    )
    schema = (
        "name string, count long, ratio double, ok boolean, missing string, "
        "tags array<string>, meta struct<source:string,depth:int>"
    )
    df = spark.createDataFrame(
        [(doc,), ("- just\n- a\n- list\n",), ("a: [unclosed",)], "yaml string"
    )
    rows = from_yaml_lines(df, schema).collect()
    good = next(r for r in rows if not r["_corrupt"])
    assert good["name"] == 'A "q" and\nnewline'
    assert (good["count"], good["ratio"], good["ok"], good["missing"]) == (42, 2.5, True, None)
    assert good["tags"] == ["a", "b"]
    assert (good["meta"]["source"], good["meta"]["depth"]) == ("web", 3)
    # list root (no row shape) and malformed both flagged
    assert sum(1 for r in rows if r["_corrupt"]) == 2


def test_toml_yaml_roundtrip_closure(spark):
    """X18 closure: from_*_lines(to_*_lines(df)) == df for flat typed
    rows (strings with the adversarial escape set, ints, floats, bools,
    arrays, structs)."""
    from zparse_spark.functions.convert import (
        from_toml_lines,
        from_yaml_lines,
        to_toml_lines,
        to_yaml_lines,
    )

    rows = [
        (i, s, float(i) / 4.0, i % 2 == 0, [s, "x"], (s, i))
        for i, s in enumerate(_ADVERSARIAL_STRINGS)
    ]
    schema = (
        "i long, s string, f double, b boolean, tags array<string>, "
        "meta struct<s:string,i:long>"
    )
    df = spark.createDataFrame(rows, schema)
    want = sorted(df.collect())
    got_t = sorted(from_toml_lines(to_toml_lines(df), schema).drop("_corrupt").collect())
    got_y = sorted(from_yaml_lines(to_yaml_lines(df), schema).drop("_corrupt").collect())
    assert got_t == want
    assert got_y == want


def test_xml_duplicate_attr_detection(spark):
    """Duplicate-attribute matrix (xml/parser.rs:175-177): the detector
    flags dups within one tag (first duplicated name), across quote
    styles, and stays silent for unique attrs, repeated attrs on
    DIFFERENT tags, and attr-less documents; from_xml_lines surfaces it
    as _dup_attr alongside the last-wins parse."""
    from zparse_spark.functions.convert import from_xml_lines

    rows = [
        (1, '<r a="1" b="2" a="3"><v>x</v></r>'),          # dup a
        (2, '<r a="1" b="2"><v>x</v></r>'),                 # clean
        (3, "<r a='1' a='2'/>"),                            # single quotes
        (4, '<r a="1"><c a="2"/></r>'),                     # same name, different tags
        (5, '<r><v>no attrs</v></r>'),                      # attr-less
        (6, '<r b="1" b="2" c="3" c="4"/>'),                # first dup reported
    ]
    df = spark.createDataFrame(rows, "i int, xml string")
    got = {
        r["i"]: r["_dup_attr"]
        for r in from_xml_lines(
            df, "_a string, v string", flag_duplicate_attrs=True
        ).collect()
    }
    assert got == {1: "a", 2: None, 3: "a", 4: None, 5: None, 6: "b"}
    # pass-through column survived; from_xml itself REJECTS the dup-attr
    # rows (all-NULL parse) — _dup_attr is what attributes that rejection
    parsed = from_xml_lines(df, "_a string, v string", flag_duplicate_attrs=True)
    assert set(parsed.columns) == {"i", "_a", "v", "_dup_attr"}
    vals = {r["i"]: (r["_a"], r["v"]) for r in parsed.collect()}
    assert vals[1] == (None, None) and vals[2] == ("1", "x")
    # no Python in the plan: detection is regexp/HOF expressions
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
