from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zparse_spark.operators.checksum import table_checksum


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_partitioning_and_order_insensitive(spark):
    rows = [(i, f"t{i}", None if i % 3 == 0 else f"l{i%5}") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "text", "lang"])
    a = _one(table_checksum(df))
    b = _one(table_checksum(df.repartition(7, "lang").sortWithinPartitions("text")))
    c = _one(table_checksum(df.orderBy(F.desc("id"))))
    assert a == b == c
    assert a.n_rows == 200


def test_column_order_does_not_matter_row_order_inside_does(spark):
    df1 = spark.createDataFrame([(1, "x")], ["a", "b"])
    df2 = spark.createDataFrame([("x", 1)], ["b", "a"]).select("b", "a")
    assert _one(table_checksum(df1)) == _one(table_checksum(df2))
    # but swapping VALUES across columns must change the digest
    df3 = spark.createDataFrame([("1", "x")], ["a", "b"])  # a as string "1"
    assert _one(table_checksum(df1)).xor_hash == _one(table_checksum(df3)).xor_hash
    df4 = spark.createDataFrame([(2, "x")], ["a", "b"])
    assert _one(table_checksum(df1)).xor_hash != _one(table_checksum(df4)).xor_hash


def test_null_vs_empty_and_sentinel_framing(spark):
    a = _one(table_checksum(spark.createDataFrame([(1, None)], "a bigint, b string")))
    b = _one(table_checksum(spark.createDataFrame([(1, "")], "a bigint, b string")))
    assert a.xor_hash != b.xor_hash
    # NULL placement matters: (NULL,'x') != ('x',NULL)
    c = _one(table_checksum(spark.createDataFrame([(None, "x")], "a string, b string")))
    d = _one(table_checksum(spark.createDataFrame([("x", None)], "a string, b string")))
    assert c.xor_hash != d.xor_hash


def test_duplicate_pair_caught_by_sum_not_xor(spark):
    one = spark.createDataFrame([(1, "x")], ["a", "b"])
    three = spark.createDataFrame([(1, "x")] * 3, ["a", "b"])
    r1, r3 = _one(table_checksum(one)), _one(table_checksum(three))
    # xor of an odd multiplicity collapses to the single-row xor
    assert r1.xor_hash == r3.xor_hash
    assert r1.n_rows != r3.n_rows
    assert (r1.sum_hash * 3) % (1 << 60) == r3.sum_hash


def test_grouped_matches_filtered(spark):
    rows = [(i, "g" + str(i % 3), f"t{i}") for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "g", "t"])
    per = {r.g: r for r in table_checksum(df, group_cols=["g"]).collect()}
    for g in ("g0", "g1", "g2"):
        whole = _one(table_checksum(df.filter(F.col("g") == g).drop("g")))
        assert (whole.n_rows, whole.xor_hash, whole.sum_hash) == (
            per[g].n_rows,
            per[g].xor_hash,
            per[g].sum_hash,
        )


def test_float_columns_rejected(spark):
    df = spark.createDataFrame([(1, 2.5)], ["a", "b"])
    with pytest.raises(ValueError, match="non-portable"):
        table_checksum(df)
    # explicit decimal cast is the documented escape hatch
    ok = table_checksum(df.withColumn("b", F.col("b").cast("decimal(10,2)")))
    assert _one(ok).n_rows == 1


def test_bucket_checksum_diff_identical_and_planted(spark):
    """X146: identical tables diff to EMPTY; an edited row flags only
    its bucket as 'changed'; a row present on one side only flags
    'only_left'/'only_right' when its bucket vanishes, 'changed' when
    the bucket still holds other rows; repartitioning changes nothing."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.checksum import bucket_checksum_diff

    rows = [(f"d{i}", f"text {i}", i) for i in range(200)]
    a = spark.createDataFrame(rows, "doc_id string, text string, n int")
    assert bucket_checksum_diff(a, a, "doc_id", n_buckets=16).collect() == []
    assert (
        bucket_checksum_diff(a.repartition(7), a.repartition(3), "doc_id", 16).collect()
        == []
    )

    edited = a.withColumn(
        "text", F.when(F.col("doc_id") == "d7", F.lit("EDITED")).otherwise(F.col("text"))
    )
    d1 = bucket_checksum_diff(a, edited, "doc_id", n_buckets=16).collect()
    assert len(d1) == 1 and d1[0]["status"] == "changed"
    assert d1[0]["n_rows_left"] == d1[0]["n_rows_right"]  # same count, content differs
    assert d1[0]["xor_left"] != d1[0]["xor_right"]

    dropped = a.filter(F.col("doc_id") != "d7")
    d2 = bucket_checksum_diff(a, dropped, "doc_id", n_buckets=16).collect()
    assert len(d2) == 1 and d2[0]["status"] == "changed"
    assert d2[0]["n_rows_left"] == d2[0]["n_rows_right"] + 1

    only = spark.createDataFrame([("z1", "t", 1)], "doc_id string, text string, n int")
    d3 = bucket_checksum_diff(only, only.limit(0), "doc_id", n_buckets=16).collect()
    assert len(d3) == 1 and d3[0]["status"] == "only_left"


def test_schema_evolution_classes(spark):
    """Every change class fires once; unchanged columns are silent;
    widening is safe, narrowing is breaking."""
    from zparse_spark.operators.checksum import schema_evolution_report

    old = spark.createDataFrame(
        [
            ("keep", "string", True),
            ("gone", "string", True),
            ("widen", "int", True),
            ("narrow", "bigint", True),
            ("tighten", "string", True),
            ("relax", "string", False),
        ],
        "col_name string, col_type string, nullable boolean",
    )
    new = spark.createDataFrame(
        [
            ("keep", "string", True),
            ("widen", "bigint", True),
            ("narrow", "int", True),
            ("tighten", "string", False),
            ("relax", "string", True),
            ("born_opt", "double", True),
            ("born_req", "double", False),
        ],
        "col_name string, col_type string, nullable boolean",
    )
    out = {r["name"]: (r["status"], r["breaking"]) for r in schema_evolution_report(old, new).collect()}
    assert out == {
        "gone": ("dropped", True),
        "widen": ("type_widened", False),
        "narrow": ("type_changed", True),
        "tighten": ("nullability_tightened", True),
        "relax": ("nullability_relaxed", False),
        "born_opt": ("added_optional", False),
        "born_req": ("added_required", True),
    }
