"""Per-rule unit tests: exact violation rows incl. position contract.

Mirrors the reference's error-kind + error-position assertions
(crates/zparse/tests/json_parser_tests.rs:380-454 asserts both the
ErrorKind and the exact Pos) — here we assert (rule_id, kind, span_pos,
offset) for every planted breach.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import make_docs
from zparse_spark.operators.rules import (
    RuleParams,
    drift_violations,
    referential_violations,
    span_rule_violations,
    uniqueness_violations,
)

T = lambda text, off: ("text", text, None, off)  # noqa: E731
M = lambda ref, off, kind="image": (kind, "", ref, off)  # noqa: E731


def rows(df):
    return sorted(
        (r["doc_id"], r["rule_id"], r["kind"], r["span_pos"], r["offset"])
        for r in df.collect()
    )


def test_s1_offset_regression(spark):
    docs = make_docs(
        spark,
        [
            ("ok", [T("a", 0), T("b", 5), T("c", 9)], "p0"),
            ("bad", [T("a", 0), T("b", 0), T("c", 9)], "p0"),  # equal → regression at pos 1
            ("bad2", [T("a", 5), T("b", 3), T("c", 9)], "p0"),  # decrease at pos 1
        ],
    )
    got = rows(span_rule_violations(docs).filter(F.col("rule_id") == "S1"))
    assert got == [
        ("bad", "S1", "InvalidArray", 1, 0),
        ("bad2", "S1", "InvalidArray", 1, 3),
    ]


def test_s2_kind_domain(spark):
    docs = make_docs(
        spark,
        [
            ("ok", [T("a", 0), M("m1", 1)], "p0"),
            ("nullk", [(None, "a", None, 0)], "p0"),
            ("badk", [("blob", "a", None, 0)], "p0"),
        ],
    )
    got = rows(span_rule_violations(docs).filter(F.col("rule_id") == "S2"))
    assert got == [
        ("badk", "S2", "InvalidToken", 0, 0),
        ("nullk", "S2", "InvalidToken", 0, 0),
    ]


def test_s3_max_spans_and_unlimited(spark):
    docs = make_docs(spark, [("big", [T(str(i), i) for i in range(10)], "p0")])
    got = rows(span_rule_violations(docs, RuleParams(max_spans=5)))
    assert got == [("big", "S3", "MaxDepthExceeded", None, None)]
    # 0 = unlimited, like the reference Config (json/parser.rs Config docs)
    assert span_rule_violations(docs, RuleParams(max_spans=0)).count() == 0


def test_s4_max_text_bytes(spark):
    docs = make_docs(
        spark,
        [
            ("big", [T("x" * 100, 0), T("y" * 100, 1)], "p0"),
            ("small", [T("x", 0)], "p0"),
        ],
    )
    got = rows(span_rule_violations(docs, RuleParams(max_text_bytes=150)))
    assert got == [("big", "S4", "MaxSizeExceeded", None, None)]
    # multi-byte UTF-8 counts bytes, not chars (octet_length)
    docs2 = make_docs(spark, [("utf", [T("é" * 80, 0)], "p0")])  # 160 bytes
    assert (
        span_rule_violations(docs2, RuleParams(max_text_bytes=150)).count() == 1
    )


def test_s5_control_chars(spark):
    docs = make_docs(
        spark,
        [("ok", [T("clean text", 0)], "p0"), ("bad", [T("a\x01b", 0), T("c\nd", 3)], "p0")],
    )
    got = rows(span_rule_violations(docs).filter(F.col("rule_id") == "S5"))
    # \n is also a raw control char, as in strict JSON strings
    assert got == [
        ("bad", "S5", "InvalidToken", 0, 0),
        ("bad", "S5", "InvalidToken", 1, 3),
    ]


def test_s6_bad_escape(spark):
    docs = make_docs(
        spark,
        [
            ("ok", [T(r"valid \n \t \\ \" \/ A", 0)], "p0"),
            ("bad", [T(r"oops \q here", 0)], "p0"),
        ],
    )
    got = rows(span_rule_violations(docs).filter(F.col("rule_id") == "S6"))
    assert got == [("bad", "S6", "InvalidEscapeSequence", 0, 0)]


def test_s7_bad_unicode(spark):
    docs = make_docs(
        spark,
        [
            ("ok", [T(r"pair 😀 and bmp é", 0)], "p0"),
            ("badhex", [T(r"\uDZZZ", 0)], "p0"),
            ("lonehigh", [T(r"\uD800 alone", 0)], "p0"),
            ("lonelow", [T(r"\uDC00 alone", 0)], "p0"),
            # escaped backslash + literal 'u...': the first backslash
            # consumes the second, so there is NO \u escape here — the
            # lexer accepts it and S7 must too (consuming grammar, not a
            # bad-substring search)
            ("escbackslash", [T(r"fine \\uZZZZ and \\uD800 too", 0)], "p0"),
            ("okpair", [T("pair \\uD83D\\uDE00 and bmp \\u00e9 ok", 0)], "p0"),
            # trailing lone backslash is S6's unterminated-escape, not S7
            ("trailing", [T("dangling \\u0041 then \\", 0)], "p0"),
        ],
    )
    got = rows(span_rule_violations(docs).filter(F.col("rule_id") == "S7"))
    assert got == [
        ("badhex", "S7", "InvalidUnicodeEscape", 0, 0),
        ("lonehigh", "S7", "InvalidUnicodeEscape", 0, 0),
        ("lonelow", "S7", "InvalidUnicodeEscape", 0, 0),
    ]


def test_s8_text_media_exclusivity(spark):
    docs = make_docs(
        spark,
        [
            ("ok", [T("a", 0), M("m", 1)], "p0"),
            ("textref", [("text", "a", "m1", 0)], "p0"),
            ("mediamissing", [("image", "", None, 0)], "p0"),
        ],
    )
    got = rows(span_rule_violations(docs).filter(F.col("rule_id") == "S8"))
    assert got == [
        ("mediamissing", "S8", "Expected", 0, 0),
        ("textref", "S8", "Expected", 0, 0),
    ]


def test_u1_uniqueness(spark):
    docs = make_docs(
        spark,
        [
            ("a", [T("x", 0)], "p0"),
            ("a", [T("y", 0)], "p1"),  # dup across partitions
            ("b", [T("z", 0)], "p0"),
        ],
    )
    got = rows(uniqueness_violations(docs))
    assert got == [
        ("a", "U1", "DuplicateKey", None, None),
        ("a", "U1", "DuplicateKey", None, None),
    ]


def test_r1_referential(spark):
    docs = make_docs(
        spark,
        [
            ("ok", [T("a", 0), M("known", 1)], "p0"),
            ("bad", [T("a", 0), M("ghost", 1)], "p0"),
        ],
    )
    cat = spark.createDataFrame([("known", "image", 10)], ["media_ref", "media_kind", "bytes"])
    for strategy in ("auto", "broadcast", "smj"):
        got = rows(referential_violations(docs, cat, strategy))
        assert got == [("bad", "R1", "DanglingMediaRef", 1, 1)], strategy


def test_d1_drift(spark):
    # normal partitions share a 50/50 text/image mix (so their PSI vs the
    # global stays small); p_drift is all-image → PSI blows past 0.25
    normal = [(f"n{i}", [T("a", 0), M(f"n{i}m", 1)], f"p{i % 3}") for i in range(30)]
    drifted = [(f"d{i}", [M(f"m{i}", 0), M(f"m{i}x", 1)], "p_drift") for i in range(10)]
    docs = make_docs(spark, normal + drifted)
    got = drift_violations(docs).collect()
    assert [r["partition"] for r in got] == ["p_drift"]
    assert got[0]["rule_id"] == "D1" and got[0]["kind"] == "DriftExceeded"


def test_empty_and_null_spans_do_not_crash(spark):
    docs = make_docs(spark, [("empty", [], "p0"), ("none", None, "p0")])
    assert span_rule_violations(docs).count() == 0
