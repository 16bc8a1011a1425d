"""Order-insensitive, engine-portable table checksums — the parity
primitive under every cross-run / cross-cluster validation story.

The engine's whole premise is "this table is what the contract says it
is". The final reduction of that premise is a single number two
independent runs — different cluster, different partitioning, different
engine — can compare: a content checksum that is

  * ORDER-INSENSITIVE: commutative-monoid aggregates (count, bit_xor,
    modular sum) over per-row hashes, so partitioning, shuffle order
    and merge order cannot change it;
  * MERGEABLE: each aggregate has a map-side partial, so the plan is
    one scan + one tiny exchange of (group, 3×int64) — at 10^12 rows
    the shuffle is bytes per group, not rows;
  * PORTABLE: the per-row hash is md5 over a canonical serialization
    (columns sorted by name, chr(1) separators, chr(0) NULL sentinel)
    with the first 15 hex nibbles read as a 60-bit integer — the same
    md5-nibble idiom every sampler/bucketer in this repo uses, exactly
    reproducible in DuckDB SQL (and any engine with md5).

Why three aggregates: bit_xor alone is blind to duplicate row PAIRS
(x ⊕ x = 0); the modular sum catches multiplicity; count catches
cardinality. The modular sum accumulates in decimal(38,0) (Spark) /
hugeint (DuckDB) so the reduction NEVER overflows en route at any row
count, then reduces mod 2^60 — both engines mod the exact integer sum,
so the results agree regardless of accumulation order or width.

Float columns are rejected loudly: engines render doubles differently
("1.0" vs "1"), which would make the "portable" claim silently false.
Callers round/cast floats to decimal or string explicitly first.

Reference parity: zParse's tests pin byte-exact outputs (golden files,
error-position equality, tests/*.rs); this is the table-scale
generalization — a byte-exact digest a golden fixture can pin and a
resumed/repartitioned re-run must reproduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 1 << 60
_NULL_SENTINEL = "\x00"
_SEP = "\x01"

_TEXTY = {"string", "boolean", "date", "timestamp"}


def _is_portable(dt: str) -> bool:
    return (
        dt in _TEXTY
        or dt.startswith(("int", "bigint", "smallint", "tinyint", "long", "decimal"))
    )


def row_hash60(cols: list[str]) -> Column:
    """60-bit integer hash of the canonical row serialization: columns
    in the given order, cast to string, chr(0) for NULL, chr(1) joins,
    md5, first 15 hex nibbles as a base-16 integer."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols
    ]
    return F.conv(F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 15), 16, 10).cast(
        "long"
    )


def table_checksum(
    df: DataFrame,
    group_cols: list[str] | None = None,
    cols: list[str] | None = None,
) -> DataFrame:
    """Per-group (or whole-table) content checksum. Returns
    ``group_cols + [n_rows, xor_hash, sum_hash]``.

    ``cols`` defaults to every non-group column, SORTED BY NAME so the
    digest is a function of the table's content, not its column order.
    """
    group_cols = list(group_cols or [])
    if cols is None:
        cols = sorted(c for c in df.columns if c not in group_cols)
    bad = [
        (c, t) for c, t in df.select(*cols).dtypes if not _is_portable(t)
    ]
    if bad:
        raise ValueError(
            f"non-portable column types for checksum {bad}: engines render "
            "floats differently; round/cast to decimal or string first"
        )
    hv = df.select(*group_cols, row_hash60(cols).alias("_hv"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_hv)").alias("xor_hash"),
        (F.sum(F.col("_hv").cast("decimal(38,0)")) % F.lit(_MOD))
        .cast("long")
        .alias("sum_hash"),
    ]
    if group_cols:
        return hv.groupBy(*group_cols).agg(*aggs)
    return hv.agg(*aggs)


def bucket_checksum_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    n_buckets: int = 1024,
    cols: list[str] | None = None,
) -> DataFrame:
    """X146: Merkle-style table diff — compare two snapshots of a
    10^12-row table WITHOUT shipping rows: hash-bucket both sides on
    the key (portable md5 bucket, so the bucketing is identical on any
    engine or cluster layout), reduce each bucket to the X112 checksum
    triple (n_rows, xor_hash, sum_hash), and join the two bounded
    digest tables. Equal buckets vanish; what remains is the work list
    — re-validate / re-replicate / drill into ONLY the differing
    buckets (recurse with a finer bucket count on the shortlist for
    row-level attribution). This is how a resumable engine answers "did
    anything change since the manifest checkpoint" at a cost of two
    scans + a |buckets|-row join, instead of a row-level anti-join.

    Output: one row per DIFFERING bucket: (bucket, status
    'changed'/'only_left'/'only_right', per-side row counts and
    digests). Empty result == content-identical tables (up to the
    checksum's 60-bit collision bound, doubled by the xor+sum pair).

    Scale shape: each side is ONE map-only hash projection + ONE
    groupBy(bucket) with map-side combine (the same shuffle a
    uniqueness check pays, but onto n_buckets cells); the join runs on
    two n_buckets-row frames. Deterministic: no floats allowed
    (table_checksum rejects them), bucket id is a pure key function.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    ).alias("_bucket")

    def digest(df: DataFrame) -> DataFrame:
        return table_checksum(
            df.select(bucket, *[c for c in df.columns]), ["_bucket"], cols
        )

    ca, cb = digest(a), digest(b)
    j = ca.alias("l").join(cb.alias("r"), "_bucket", "full_outer")
    same = (
        F.col("l.n_rows").eqNullSafe(F.col("r.n_rows"))
        & F.col("l.xor_hash").eqNullSafe(F.col("r.xor_hash"))
        & F.col("l.sum_hash").eqNullSafe(F.col("r.sum_hash"))
    )
    status = (
        F.when(F.col("r.n_rows").isNull(), "only_left")
        .when(F.col("l.n_rows").isNull(), "only_right")
        .otherwise("changed")
    )
    return j.filter(~same).select(
        F.col("_bucket").alias("bucket"),
        status.alias("status"),
        F.col("l.n_rows").alias("n_rows_left"),
        F.col("r.n_rows").alias("n_rows_right"),
        F.col("l.xor_hash").alias("xor_left"),
        F.col("r.xor_hash").alias("xor_right"),
    )


def schema_evolution_report(
    old: DataFrame,
    new: DataFrame,
) -> DataFrame:
    """Schema-evolution compatibility gate between two schema snapshots
    (rows of (col_name, col_type, nullable)) — the check an Iceberg
    writer runs before committing a schema change, classified by blast
    radius:

    - added_optional   new nullable column: safe, readers see NULLs
    - added_required   new non-nullable column: breaks old writers
    - dropped          column gone: breaks every reader that names it
    - type_widened     int->bigint / float->double / decimal growth:
                       safe (every old value representable)
    - type_changed     anything else: breaking
    - nullability_relaxed  required -> optional: safe for readers
    - nullability_tightened optional -> required: breaks old data

    The snapshots are schema-sized (tens of rows): full outer join on
    the column name, pure classification arithmetic, no data scan —
    the DATA-level diff lives in checksum/bucket-diff (X112/X146);
    this is the metadata-level gate next to it.
    """
    widen = {
        ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
        ("smallint", "int"), ("smallint", "bigint"),
        ("int", "bigint"),
        ("float", "double"),
    }
    widen_expr = F.array(
        *[F.struct(F.lit(a).alias("f"), F.lit(b).alias("t")) for a, b in sorted(widen)]
    )
    o = old.select(
        F.col("col_name").alias("name"),
        F.lower(F.col("col_type")).alias("t_old"),
        F.col("nullable").cast("boolean").alias("n_old"),
    )
    n = new.select(
        F.col("col_name").alias("name"),
        F.lower(F.col("col_type")).alias("t_new"),
        F.col("nullable").cast("boolean").alias("n_new"),
    )
    j = o.join(n, "name", "full_outer")
    is_widen = F.exists(
        widen_expr,
        lambda w: (w["f"] == F.col("t_old")) & (w["t"] == F.col("t_new")),
    )
    status = (
        F.when(F.col("t_old").isNull() & F.col("n_new"), F.lit("added_optional"))
        .when(F.col("t_old").isNull(), F.lit("added_required"))
        .when(F.col("t_new").isNull(), F.lit("dropped"))
        .when(F.col("t_old") == F.col("t_new"),
              F.when(F.col("n_old") & ~F.col("n_new"), F.lit("nullability_tightened"))
              .when(~F.col("n_old") & F.col("n_new"), F.lit("nullability_relaxed"))
              .otherwise(F.lit("unchanged")))
        .when(is_widen, F.lit("type_widened"))
        .otherwise(F.lit("type_changed"))
    )
    breaking = status.isin("added_required", "dropped", "type_changed", "nullability_tightened")
    return j.select(
        "name",
        "t_old",
        "t_new",
        status.alias("status"),
        breaking.alias("breaking"),
    ).filter(F.col("status") != "unchanged")
