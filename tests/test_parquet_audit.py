from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from zparse_spark.sources.parquet_audit import parquet_footer_audit


def test_footer_counts_match_data_and_duckdb(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"s{i}") for i in range(1000)],
        "id bigint, s string",
    )
    df.repartition(3).write.parquet(path)

    audit = parquet_footer_audit(spark, path)
    rows = audit.collect()
    # every file contributes both columns
    assert {r.column for r in rows} == {"id", "s"}
    # physical row count across row groups == logical count
    total = sum(r.row_group_num_rows for r in rows if r.column == "id")
    assert total == 1000
    # null accounting: footer nulls for 's' equal the data's null count
    s_nulls = sum(r.null_count for r in rows if r.column == "s")
    assert s_nulls == df.filter(F.col("s").isNull()).count()

    # cross-engine: DuckDB's independent footer parser agrees row-wise
    duck = duckdb.connect().execute(
        """
        SELECT regexp_extract(file_name, '([^/]+)$', 1),
               CAST(row_group_id AS INT), path_in_schema,
               CAST(row_group_num_rows AS BIGINT), CAST(num_values AS BIGINT),
               CAST(stats_null_count AS BIGINT),
               CAST(total_compressed_size AS BIGINT)
        FROM parquet_metadata(?)
        """,
        [path + "/*.parquet"],
    ).fetchall()
    got = {
        (
            r.file, r.row_group_id, r.column, r.row_group_num_rows,
            r.num_values, r.null_count, r.compressed_bytes,
        )
        for r in rows
    }
    assert got == set(map(tuple, duck))


def test_footer_audit_stays_arrow_only_and_raises_on_empty(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(10).write.parquet(path)
    plan = (
        parquet_footer_audit(spark, path)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    with pytest.raises(Exception):
        parquet_footer_audit(spark, str(tmp_path / "missing"))
