"""Reader contracts: format dispatch (lib.rs:43-54), header
normalization (csv/parser.rs:313-342), delimiter validation
(csv/parser.rs:87-94), permissive CSV ingest, provenance column."""

from __future__ import annotations

import pytest

from zparse_spark.sources.readers import (
    detect_format_from_path,
    load_table,
    normalize_headers,
    validate_delimiter,
)


def test_detect_format_case_insensitive():
    assert detect_format_from_path("a/b/data.PARQUET") == "parquet"
    assert detect_format_from_path("x.JsonC") == "json"  # jsonc → json
    assert detect_format_from_path("x.tsv") == "csv"
    assert detect_format_from_path("x.unknown") is None


def test_normalize_headers(spark):
    df = spark.createDataFrame([(1, 2, 3, 4, 5)], [" a ", "", "b", "b ", "a"])
    out = normalize_headers(df)
    assert out.columns == ["a", "column_2", "b", "b_2", "a_2"]


def test_validate_delimiter():
    assert validate_delimiter(";") == ";"
    assert validate_delimiter("\t") == "\t"
    for bad in ("", ",,", '"', "\n", "\r", "é"):
        with pytest.raises(ValueError):
            validate_delimiter(bad)


def test_permissive_csv_ingest(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text('id,name\n1,"ok"\n2,"unterminated\n3,fine\n')
    df = load_table(spark, str(p))
    # PERMISSIVE mode: malformed rows become nulls, ingest never throws
    assert df.count() >= 2


def test_provenance_column(spark, tmp_path, sf_dir):
    df = load_table(spark, f"{sf_dir}/region.parquet", with_provenance=True)
    rows = df.collect()
    assert all(r["_source_file"].endswith("region.parquet") or "region.parquet" in r["_source_file"] for r in rows)


def test_lenient_offsets_mode(spark):
    """The JSONC-style relaxation: equal offsets pass in lenient mode,
    fail in strict (Config.with_* analog)."""
    from tests.conftest import make_docs
    from zparse_spark.operators.rules import RuleParams, span_rule_violations

    docs = make_docs(spark, [("d", [("text", "a", None, 0), ("text", "b", None, 0)], "p0")])
    assert span_rule_violations(docs).filter("rule_id = 'S1'").count() == 1
    lenient = RuleParams(allow_equal_offsets=True)
    assert span_rule_violations(docs, lenient).filter("rule_id = 'S1'").count() == 0
