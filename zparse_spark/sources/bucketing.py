"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the documents table is joined repeatedly on doc_id (dedup
compaction, violation backfills, incremental revalidation). Writing both
sides bucketed by the join key (``bucketBy(n, key).sortBy(key)``) makes
every subsequent join a zipper over co-located buckets: NO Exchange on
either side (asserted in tests). This is the Iceberg
``bucket(n, doc_id)`` partition-transform analog expressed through the
Spark catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; Catalyst elides both shuffles when
    bucket specs match (check: no Exchange in the plan)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
