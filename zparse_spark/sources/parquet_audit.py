"""Storage-layer audit: distributed parquet-footer inspection.

Every other check in this engine validates ROW CONTENT. At 100 TB the
storage layer itself is a failure surface: a writer that stopped
mid-job leaves truncated row groups, a mis-configured compactor leaves
thousand-row files, a schema-evolved writer drops column chunks, and
corrupted statistics silently break min/max pruning. The footers carry
the ground truth — row counts, per-chunk value/null counts, compressed
sizes — and reading them costs KILOBYTES per file, not the data.

``parquet_footer_audit`` distributes footer reads across executors:
the file manifest (driver-side, one row per file — the same size any
Spark scan planner already holds) is repartitioned and each task opens
only the footer of its files via pyarrow (no row groups are read).
Output is one row per (file, row_group, column chunk). At a million
files this is a million footer fetches spread over the cluster and a
~30M-row result — trivially parallel, no shuffle at all until the
caller aggregates.

The DuckDB oracle is ``parquet_metadata()`` over the same files — a
fully independent footer parser, so a green row cross-checks pyarrow's
and DuckDB's reading of the physical layout against each other.

Reference parity: zParse validates the BYTES of its inputs (UTF-8
enforcement, size limits — lexer.rs) before trusting any content;
this is the same stance toward the table's physical files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

AUDIT_SCHEMA = (
    "file string, row_group_id int, column string, row_group_num_rows long,"
    " num_values long, null_count long, compressed_bytes long"
)


def parquet_footer_audit(spark: SparkSession, path: str) -> DataFrame:
    """One row per (file, row group, column chunk) of every parquet
    file under ``path``: physical row/value/null counts and compressed
    size, read from footers only (never the data pages)."""
    files = sorted(spark.read.parquet(path).inputFiles())
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    fdf = spark.createDataFrame([(f,) for f in files], "uri string").repartition(
        min(len(files), 64)
    )

    def _read_footers(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        cols = [
            "file",
            "row_group_id",
            "column",
            "row_group_num_rows",
            "num_values",
            "null_count",
            "compressed_bytes",
        ]
        for pdf in batches:
            rows = []
            for uri in pdf["uri"]:
                local = uri
                if local.startswith("file:"):
                    local = local[len("file:") :]
                md = pq.ParquetFile(local).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        st = c.statistics
                        nulls = (
                            st.null_count
                            if st is not None and st.has_null_count
                            else None
                        )
                        rows.append(
                            (
                                os.path.basename(local),
                                rg,
                                c.path_in_schema,
                                g.num_rows,
                                c.num_values,
                                nulls,
                                c.total_compressed_size,
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    return fdf.mapInPandas(_read_footers, AUDIT_SCHEMA)
