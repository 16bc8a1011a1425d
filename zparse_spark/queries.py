"""Registry of oracle-checked queries over the driver test tables.

Each function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/values match the DuckDB oracle SQL in ``ORACLES`` exactly
(the driver hash-compares values after sorting columns by name). Floats
are rounded on BOTH sides to dodge last-ulp drift between engines.

The set mirrors SURVEY.md §2's operator inventory: each query is the
driver-table incarnation of an engine operator (stats, uniqueness,
referential, windows, cube, top-k, histograms, text analysis, dedup,
similarity), so the correctness gate exercises the same Spark primitives
the validation engine runs on span-structured data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# A2: per-column stats in one aggregate pass (SURVEY.md §2.4 A2)
# ---------------------------------------------------------------------------


@register(
    "stats_lineitem",
    """
    SELECT count(*) AS n_rows,
           count(l_quantity) AS qty_nonnull,
           round(min(l_quantity), 4) AS qty_min,
           round(max(l_quantity), 4) AS qty_max,
           round(avg(l_quantity), 4) AS qty_avg,
           round(min(l_extendedprice), 4) AS price_min,
           round(max(l_extendedprice), 4) AS price_max,
           round(sum(l_extendedprice), 2) AS price_sum,
           count(DISTINCT l_returnflag) AS returnflag_distinct
    FROM lineitem
    """,
)
def stats_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("qty_nonnull"),
        F.round(F.min("l_quantity"), 4).alias("qty_min"),
        F.round(F.max("l_quantity"), 4).alias("qty_max"),
        F.round(F.avg("l_quantity"), 4).alias("qty_avg"),
        F.round(F.min("l_extendedprice"), 4).alias("price_min"),
        F.round(F.max("l_extendedprice"), 4).alias("price_max"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
        F.countDistinct("l_returnflag").alias("returnflag_distinct"),
    )


@register(
    "null_rate_orders",
    """
    SELECT round(avg(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END), 6) AS custkey_null_rate,
           round(avg(CASE WHEN o_totalprice IS NULL THEN 1.0 ELSE 0.0 END), 6) AS totalprice_null_rate,
           count(*) AS n_rows
    FROM orders
    """,
)
def null_rate_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.round(F.avg(F.when(F.col("o_custkey").isNull(), 1.0).otherwise(0.0)), 6).alias(
            "custkey_null_rate"
        ),
        F.round(F.avg(F.when(F.col("o_totalprice").isNull(), 1.0).otherwise(0.0)), 6).alias(
            "totalprice_null_rate"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# A3: uniqueness / distinct (DuplicateKey lifted, toml/parser.rs:918-924)
# ---------------------------------------------------------------------------


@register(
    "uniqueness_lineitem_orderkey",
    """
    SELECT l_orderkey AS dup_key, count(*) AS n
    FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    """,
)
def uniqueness_lineitem_orderkey(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("dup_key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


@register(
    "uniqueness_orders_orderkey_verdict",
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_distinct,
           (count(*) = count(DISTINCT o_orderkey)) AS unique_ok
    FROM orders
    """,
)
def uniqueness_orders_orderkey_verdict(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct"),
        (F.count(F.lit(1)) == F.countDistinct("o_orderkey")).alias("unique_ok"),
    )


# ---------------------------------------------------------------------------
# A4: referential checks via anti-join (xml close-tag pairing analog)
# ---------------------------------------------------------------------------


@register(
    "referential_lineitem",
    """
    SELECT
      (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS dangling_orders,
      (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS dangling_parts,
      (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS dangling_suppliers
    """,
)
def referential_lineitem(spark, sf_dir):
    # ONE job, ONE scan of the fact table: three broadcast left joins
    # against the (unique-keyed) dimension key sets, then one aggregate
    # of three conditional counts. The earlier three-anti-join version
    # scanned lineitem three times and assembled the row driver-side.
    li = _t(spark, sf_dir, "lineitem")
    probes = [
        ("orders", "o_orderkey", "l_orderkey", "dangling_orders"),
        ("part", "p_partkey", "l_partkey", "dangling_parts"),
        ("supplier", "s_suppkey", "l_suppkey", "dangling_suppliers"),
    ]
    joined = li
    for table, key, fact_key, _ in probes:
        dim = _t(spark, sf_dir, table).select(F.col(key))
        joined = joined.join(F.broadcast(dim), joined[fact_key] == F.col(key), "left")
    return joined.agg(
        *[
            F.count(F.when(F.col(key).isNull(), 1)).alias(out)
            for _, key, _, out in probes
        ]
    )


# ---------------------------------------------------------------------------
# Aggregation / join / sort flagships (TPC-H shapes)
# ---------------------------------------------------------------------------


@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "topk_customer_revenue",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def topk_customer_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # dims broadcast; the single shuffle is the groupBy on c_custkey
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_name")), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "cube_lineitem",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# A5: window functions — ordered-sequence rules (event-order analog)
# ---------------------------------------------------------------------------


@register(
    "window_events_monotonic",
    """
    WITH seq AS (
      SELECT user_id, event_type, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN prev_value IS NOT NULL AND value < prev_value THEN 1 ELSE 0 END) AS BIGINT) AS regressions
    FROM seq GROUP BY event_type
    """,
)
def window_events_monotonic(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_value", F.lag("value").over(w))
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("prev_value").isNotNull() & (F.col("value") < F.col("prev_value")), 1
            ).otherwise(0)
        ).alias("regressions"),
    )


@register(
    "window_running_rank",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM orders
    )
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
           rn, round(running, 2) AS running
    FROM ranked WHERE rn <= 2
    """,
)
def window_running_rank(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "running",
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
            F.round("running", 2).alias("running"),
        )
    )


# ---------------------------------------------------------------------------
# Histogram (width_bucket analog — floor arithmetic both sides)
# ---------------------------------------------------------------------------


@register(
    "histogram_extendedprice",
    """
    SELECT least(greatest(CAST(floor((l_extendedprice - 900.0) / 5000.0) AS BIGINT), 0), 19) AS bucket,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def histogram_extendedprice(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.greatest(F.floor((F.col("l_extendedprice") - 900.0) / 5000.0).cast("long"), F.lit(0)),
        F.lit(19),
    )
    return li.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "drift_numeric_totalprice",
    """
    WITH vals AS (
      SELECT o_orderpriority AS grp,
             least(greatest(CAST(floor((o_totalprice - 0.0) / 18750.0) AS BIGINT), 0), 31) AS bin
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    counts AS (SELECT grp, bin, count(*) AS n FROM vals GROUP BY 1, 2),
    grid AS (SELECT g.grp, b.bin
             FROM (SELECT DISTINCT grp FROM counts) g, range(32) b(bin)),
    dense AS (SELECT grid.grp, grid.bin, coalesce(c.n, 0) AS n
              FROM grid LEFT JOIN counts c ON c.grp = grid.grp AND c.bin = grid.bin),
    per AS (SELECT grp, bin,
                   sum(n) OVER (PARTITION BY grp ORDER BY bin) AS cum,
                   sum(n) OVER (PARTITION BY grp) AS tot
            FROM dense),
    gl AS (SELECT bin,
                  sum(gn) OVER (ORDER BY bin) AS gcum,
                  sum(gn) OVER () AS gtot
           FROM (SELECT bin, sum(n) AS gn FROM dense GROUP BY bin))
    SELECT per.grp AS o_orderpriority,
           round(max(abs(cum / tot - gcum / gtot)), 6) AS ks
    FROM per JOIN gl USING (bin) GROUP BY 1
    """,
)
def drift_numeric_totalprice(spark, sf_dir):
    """Numeric-distribution drift: binned two-sample KS statistic of
    each order-priority group's o_totalprice distribution vs the global
    one — the numeric companion of the span-kind KL/PSI drift rule,
    value-oracled (every CDF point is an integer-ratio division on a
    fixed 32-bin grid, so the hashes match exactly)."""
    from zparse_spark.operators.stats import ks_drift_scores

    o = _t(spark, sf_dir, "orders")
    return ks_drift_scores(
        o, "o_totalprice", "o_orderpriority", lo=0.0, hi=600000.0, n_bins=32
    ).select("o_orderpriority", F.round("ks", 6).alias("ks"))


@register(
    "drift_emd_totalprice",
    """
    WITH vals AS (
      SELECT o_orderpriority AS grp,
             least(greatest(CAST(floor((o_totalprice - 0.0) / 18750.0) AS BIGINT), 0), 31) AS bin
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    counts AS (SELECT grp, bin, count(*) AS n FROM vals GROUP BY 1, 2),
    grid AS (SELECT g.grp, b.bin
             FROM (SELECT DISTINCT grp FROM counts) g, range(32) b(bin)),
    dense AS (SELECT grid.grp, grid.bin, coalesce(c.n, 0) AS n
              FROM grid LEFT JOIN counts c ON c.grp = grid.grp AND c.bin = grid.bin),
    per AS (SELECT grp, bin,
                   sum(n) OVER (PARTITION BY grp ORDER BY bin) AS cum,
                   sum(n) OVER (PARTITION BY grp) AS tot
            FROM dense),
    gl AS (SELECT bin,
                  sum(gn) OVER (ORDER BY bin) AS gcum,
                  sum(gn) OVER () AS gtot
           FROM (SELECT bin, sum(n) AS gn FROM dense GROUP BY bin))
    SELECT per.grp AS o_orderpriority,
           round(CAST(sum(abs(CAST(cum AS HUGEINT) * gtot - CAST(gcum AS HUGEINT) * tot)) AS DOUBLE)
                 * 18750.0 / (CAST(max(tot) AS DOUBLE) * CAST(max(gtot) AS DOUBLE)), 6) AS emd
    FROM per JOIN gl USING (bin) GROUP BY 1
    """,
)
def drift_emd_totalprice(spark, sf_dir):
    """X134: binned 1-Wasserstein (earth-mover's) drift of each order
    priority's o_totalprice distribution vs the global one — the
    magnitude companion of the KS max-gap on the SAME 32-bin grid and
    the same one-scan shape. The per-bin CDF gap is kept as the exact
    integer |cum*gtot - gcum*tot| (order-insensitive decimal sum; the
    DuckDB twin accumulates in HUGEINT) with ONE trailing division per
    group, so the value hashes match bit-for-bit."""
    from zparse_spark.operators.stats import wasserstein_drift_scores

    o = _t(spark, sf_dir, "orders")
    return wasserstein_drift_scores(
        o, "o_totalprice", "o_orderpriority", lo=0.0, hi=600000.0, n_bins=32
    )


def _cms_oracle_sql(width: int = 64, depth: int = 4) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql("CAST(user_id AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR)")
    return f"""
    WITH fan AS (
      SELECT user_id, dd.d AS d, ({hv}) % {width} AS bucket
      FROM events, range({depth}) dd(d)
      WHERE user_id IS NOT NULL
    ),
    sk AS (SELECT d, bucket, count(*) AS n FROM fan GROUP BY 1, 2),
    probe AS (SELECT DISTINCT user_id, d, bucket FROM fan),
    est AS (SELECT user_id, min(coalesce(n, 0)) AS cms_est
            FROM probe LEFT JOIN sk USING (d, bucket) GROUP BY 1),
    ex AS (SELECT user_id, count(*) AS exact_n FROM events
           WHERE user_id IS NOT NULL GROUP BY 1)
    SELECT CAST(ex.user_id AS BIGINT) AS user_id,
           ex.exact_n,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           CAST(est.cms_est - ex.exact_n AS BIGINT) AS overcount
    FROM ex JOIN est USING (user_id)
    WHERE est.cms_est < ex.exact_n OR est.cms_est - ex.exact_n > 0
       OR (CAST(ex.user_id AS BIGINT)) % 17 = 0
    """


@register("sketch_cms_user_counts", _cms_oracle_sql())
def sketch_cms_user_counts(spark, sf_dir):
    """X135: Count-Min sketch point-frequency estimates over
    events.user_id at width=64/depth=4 (cardinality >> width, so
    collisions are real): build the mergeable (d, bucket) counter grid,
    probe every distinct user, and report (exact_n, cms_est, overcount)
    for the interesting rows — any undercount (there must be NONE: the
    structural est>=exact guarantee is part of the value-matched
    output), any collision overcount, plus a deterministic 1/17 id
    sample of exact hits. Sketch cells come from the portable md5
    bucket idiom, so the DuckDB twin rebuilds the identical grid."""
    from zparse_spark.operators.stats import cms_estimate, cms_sketch

    ev = _t(spark, sf_dir, "events")
    width, depth = 64, 4
    sk = cms_sketch(ev, "user_id", width=width, depth=depth)
    est = cms_estimate(sk, ev, "user_id", width=width, depth=depth)
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    out = exact.join(est, "user_id").select(
        F.col("user_id").cast("long").alias("user_id"),
        "exact_n",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_n")).cast("long").alias("overcount"),
    )
    return out.filter(
        (F.col("cms_est") < F.col("exact_n"))
        | (F.col("overcount") > 0)
        | (F.col("user_id") % 17 == 0)
    )


@register(
    "privacy_k_anonymity_customer",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) AS class_size,
             count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END)
               AS l_diversity
      FROM customer GROUP BY 1, 2
    )
    SELECT * FROM g WHERE class_size < 8 OR l_diversity < 2
    """,
)
def privacy_k_anonymity_customer(spark, sf_dir):
    """X137: k-anonymity / l-diversity audit over customer with
    quasi-identifiers (nation, market segment) and account-balance sign
    as the sensitive attribute: every QI class smaller than k=8, plus
    any class whose members all share the sensitive value (l==1), is a
    re-identification risk row. One groupBy, same shuffle as a
    uniqueness check; output bounded by the rare classes."""
    from zparse_spark.operators.stats import k_anonymity_audit

    c = _t(spark, sf_dir, "customer").withColumn(
        "balance_sign",
        F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise(F.lit("nonneg")),
    )
    return k_anonymity_audit(
        c, ["c_nationkey", "c_mktsegment"], k=8, sensitive="balance_sign"
    )


def _negatives_oracle_sql(k: int = 3, n_buckets: int = 16, seed: int = 5) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    leads = ", ".join(f"lead(key, {i}) OVER win" for i in range(1, k + 1))
    return f"""
    WITH base AS (
      SELECT CAST(doc_id AS VARCHAR) AS key,
             ({hv}) / 4294967296.0 AS u
      FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL)
    ),
    b2 AS (SELECT key, u, CAST(floor(u * {n_buckets}) AS BIGINT) AS bucket FROM base),
    w AS (
      SELECT key, bucket,
             list_filter([{leads}], x -> x IS NOT NULL) AS ld
      FROM b2
      WINDOW win AS (PARTITION BY bucket ORDER BY u, key)
    ),
    hr AS (
      SELECT bucket, key, row_number() OVER (PARTITION BY bucket ORDER BY u, key) AS rn
      FROM b2
    ),
    heads AS (
      SELECT bucket, list(key ORDER BY rn) AS head FROM hr WHERE rn <= {k + 1} GROUP BY bucket
    ),
    j AS (
      SELECT w.key,
             list_concat(
               ld,
               (list_filter(head, x -> x <> w.key AND NOT list_contains(ld, x)))
                 [1 : {k} - len(ld)]
             ) AS negs
      FROM w JOIN heads USING (bucket)
    )
    SELECT key AS doc_id,
           CAST(generate_subscripts(negs, 1) - 1 AS INT) AS neg_rank,
           unnest(negs) AS negative_id
    FROM j
    """


@register("corpus_sample_negatives", _negatives_oracle_sql())
def corpus_sample_negatives(spark, sf_dir):
    """X138: deterministic negative sampling for contrastive pairs —
    each doc paired with k=3 ring-successor negatives on a seeded md5
    hash ring split into 16 arcs (wrap at arc tail). Pure function of
    (doc_id set, seed): the DuckDB twin rebuilds the identical ring and
    must emit the identical (doc, rank, negative) triples."""
    from zparse_spark.operators.filtering import sample_negatives

    d = _t(spark, sf_dir, "documents")
    return sample_negatives(d, "doc_id", k=3, seed=5, n_buckets=16)


@register(
    "drift_embedding_centroids",
    """
    WITH ex AS (
      SELECT label AS grp,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    per AS (SELECT grp, dim, sum(v) AS s, count(*) AS n FROM ex GROUP BY 1, 2),
    gcent AS (SELECT dim, sum(s) / sum(n) AS gc FROM per GROUP BY 1),
    cent AS (SELECT grp, dim, s / n AS c, n FROM per),
    j AS (SELECT * FROM cent JOIN gcent USING (dim))
    SELECT grp AS label, max(n) AS n_vecs,
           round(sum(c * gc) / (sqrt(sum(c * c)) * sqrt(sum(gc * gc))), 6)
             AS centroid_cosine,
           round(sqrt(sum(c * c)) / sqrt(sum(gc * gc)), 6) AS norm_ratio
    FROM j GROUP BY 1
    """,
)
def drift_embedding_centroids(spark, sf_dir):
    """X139: embedding-space drift per label — cosine and norm ratio of
    each label's centroid vs the global centroid. One posexplode
    reduced by groupBy(label, dim) map-side combine (shuffle carries
    |labels| x 64 partials, never vectors); global centroid derived
    from the same reduced table and broadcast."""
    from zparse_spark.operators.similarity import centroid_drift

    e = _t(spark, sf_dir, "embeddings")
    return centroid_drift(e, "embedding", "label")


@register(
    "profile_incremental_documents",
    """
    SELECT 'n_chars' AS "column",
           count(*) AS n_rows,
           count(n_chars) AS n_nonnull,
           CAST(min(n_chars) AS DOUBLE) AS min,
           CAST(max(n_chars) AS DOUBLE) AS max,
           round(sum(CAST(n_chars AS DOUBLE)) / count(n_chars), 6) AS avg,
           round((count(*) - count(n_chars)) * 1.0 / count(*), 6) AS null_rate
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(lang),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           round((count(*) - count(lang)) * 1.0 / count(*), 6)
    FROM documents
    """,
)
def profile_incremental_documents(spark, sf_dir):
    """X140: incremental profiling — per-source MERGEABLE partials
    (counts/extrema/sums, the primitives that fold exactly) merged into
    the finalized table profile; the DuckDB oracle computes the profile
    DIRECTLY over the whole table, so the gate proves
    finalize(merge(per-unit partials)) == direct(table) cross-engine.
    n_chars is integer-summed, so even avg is bit-exact."""
    from zparse_spark.operators.stats import (
        column_profile_partials,
        merge_column_profile_partials,
    )

    d = _t(spark, sf_dir, "documents")
    partials = column_profile_partials(d, ["n_chars", "lang"], unit_col="source")
    return merge_column_profile_partials(partials)


@register(
    "corpus_mixed_script_audit",
    """
    WITH docs2 AS (
      SELECT doc_id, source,
             CASE WHEN CAST(doc_id AS BIGINT) % 37 = 0
                  THEN text || ' pаypal login'
                  WHEN CAST(doc_id AS BIGINT) % 41 = 0
                  THEN text || ' Ηello world'
                  ELSE text END AS text
      FROM documents
    ),
    f AS (
      SELECT source AS partition, CAST(doc_id AS VARCHAR) AS id,
             regexp_matches(text,
               '[A-Za-z][^\\s]*[Ͱ-ϿЀ-ӿ]|[Ͱ-ϿЀ-ӿ][^\\s]*[A-Za-z]') AS bad
      FROM docs2 WHERE text IS NOT NULL
    )
    SELECT partition, count(*) AS n_docs,
           sum(CASE WHEN bad THEN 1 ELSE 0 END) AS n_mixed,
           round(sum(CASE WHEN bad THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS mixed_rate,
           min(CASE WHEN bad THEN id END) AS example_doc_id
    FROM f GROUP BY 1
    """,
)
def corpus_mixed_script_audit(spark, sf_dir):
    """X141: homoglyph / mixed-script audit per source with planted
    confusables (every 37th doc gets a Cyrillic-а 'pаypal', every 41st
    a Greek-Η 'Ηello' — derived deterministically from doc_id so both
    engines plant identical positives). One map-only rlike, no explode;
    partition-bounded groupBy."""
    from zparse_spark.functions.text import mixed_script_audit

    d = _t(spark, sf_dir, "documents")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id").cast("long") % 37 == 0,
            F.concat(F.col("text"), F.lit(" pаypal login")),
        )
        .when(
            F.col("doc_id").cast("long") % 41 == 0,
            F.concat(F.col("text"), F.lit(" Ηello world")),
        )
        .otherwise(F.col("text")),
    )
    return mixed_script_audit(planted, "text", "source", "doc_id")


@register(
    "pipeline_entity_resolution",
    """
    WITH RECURSIVE pairs AS (
      SELECT CAST(a.c_custkey AS VARCHAR) AS id_a,
             CAST(b.c_custkey AS VARCHAR) AS id_b
      FROM customer a JOIN customer b
        ON CAST(a.c_custkey AS VARCHAR) < CAST(b.c_custkey AS VARCHAR)
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    scored AS (
      SELECT comp.node, comp.component, c.c_acctbal AS q, c.c_name
      FROM comp JOIN customer c ON CAST(c.c_custkey AS VARCHAR) = comp.node
    ),
    best AS (
      SELECT component, node AS rep_id, c_name AS rep_name,
             row_number() OVER (PARTITION BY component
                                ORDER BY q DESC, node ASC) AS rk
      FROM scored
    )
    SELECT s.node AS c_custkey, s.c_name AS c_name,
           b.rep_id AS rep_custkey, b.rep_name AS rep_name,
           (s.node = b.rep_id) AS is_rep
    FROM scored s
    JOIN best b ON b.component = s.component AND b.rk = 1
    """,
)
def pipeline_entity_resolution(spark, sf_dir):
    """X142: entity resolution END TO END — the composition a reference
    user runs as one job: (1) blocking + exact fuzzy matching via the
    deletion-neighborhood edit-distance join (X111, never all-pairs),
    (2) connected components via the O(log n) large-star/small-star
    rounds (X12 — name-typo graphs chain, so the propagation variant's
    O(diameter) is the wrong tool), (3) quality-prior canonical record
    per entity (X30: argmax account balance, ties to min key). The
    DuckDB twin is the textbook definition: quadratic levenshtein join
    + recursive-CTE closure + argmax window — a green row certifies the
    entire pruned pipeline equals the brute-force semantics."""
    from zparse_spark.operators.dedup import resolve_duplicate_clusters_star
    from zparse_spark.operators.editdist import bounded_edit_distance_join

    c = _t(spark, sf_dir, "customer")
    pairs = bounded_edit_distance_join(
        c.select("c_custkey", "c_name"), id_col="c_custkey", key_col="c_name", k=1
    ).select("id_a", "id_b")
    labels = resolve_duplicate_clusters_star(pairs).withColumnRenamed(
        "rep_id", "component"
    )
    meta = c.select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("q"),
        F.col("c_name").alias("name"),
    )
    scored = labels.join(meta, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("q").desc_nulls_last(), F.col("doc_id").asc()
    )
    best = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "component",
            F.col("doc_id").alias("rep_custkey"),
            F.col("name").alias("rep_name"),
        )
    )
    return scored.join(F.broadcast(best), "component").select(
        F.col("doc_id").alias("c_custkey"),
        F.col("name").alias("c_name"),
        "rep_custkey",
        "rep_name",
        (F.col("doc_id") == F.col("rep_custkey")).alias("is_rep"),
    )


@register(
    "events_json_schema_rules",
    """
    WITH ev AS (
      SELECT event_id,
             CASE WHEN event_id % 13 = 0 THEN '{"k": "str"}'
                  WHEN event_id % 17 = 0 THEN '{"x": 1}'
                  WHEN event_id % 19 = 0 THEN 'not json'
                  WHEN event_id % 23 = 0 THEN '{"k": null}'
                  WHEN event_id % 29 = 0 THEN '{"k": 1.5}'
                  ELSE props END AS props
      FROM events WHERE props IS NOT NULL
    )
    SELECT event_id, 'J0' AS rule_id, CAST(NULL AS VARCHAR) AS path,
           'malformed json' AS message
    FROM ev WHERE NOT json_valid(props)
    UNION ALL
    SELECT event_id, 'J1', '$.k', 'required path missing'
    FROM ev WHERE json_valid(props)
      AND (json_extract(props, '$.k') IS NULL OR json_type(props, '$.k') = 'NULL')
    UNION ALL
    SELECT event_id, 'J2', '$.k',
           'expected int, got ' ||
           CASE json_type(props, '$.k')
                WHEN 'VARCHAR' THEN 'string' WHEN 'DOUBLE' THEN 'number'
                WHEN 'BOOLEAN' THEN 'bool' WHEN 'OBJECT' THEN 'object'
                WHEN 'ARRAY' THEN 'array' ELSE lower(json_type(props, '$.k')) END
    FROM ev WHERE json_valid(props)
      AND json_extract(props, '$.k') IS NOT NULL
      AND json_type(props, '$.k') NOT IN ('NULL', 'UBIGINT', 'BIGINT')
    """,
)
def events_json_schema_rules(spark, sf_dir):
    """X143: declarative JSON-path schema rules (J0 malformed /
    J1 required-missing incl. JSON null / J2 type-mismatch) over the
    events.props payload column, with violations planted
    deterministically from event_id (wrong-type string, missing key,
    malformed cell, JSON null, float-for-int) so both engines inject
    identical positives. One map-only variant projection, no Python."""
    from zparse_spark.functions.json_profile import json_schema_violations

    ev = _t(spark, sf_dir, "events").withColumn(
        "props",
        F.when(F.col("event_id") % 13 == 0, F.lit('{"k": "str"}'))
        .when(F.col("event_id") % 17 == 0, F.lit('{"x": 1}'))
        .when(F.col("event_id") % 19 == 0, F.lit("not json"))
        .when(F.col("event_id") % 23 == 0, F.lit('{"k": null}'))
        .when(F.col("event_id") % 29 == 0, F.lit('{"k": 1.5}'))
        .otherwise(F.col("props")),
    )
    return json_schema_violations(ev, "props", {"$.k": "int"}, id_cols=["event_id"])


@register(
    "drift_null_rate_orders",
    """
    WITH o AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0 THEN NULL
                  ELSE o_custkey END AS k
      FROM orders
    ),
    parts AS (
      SELECT o_orderpriority AS partition, count(*) AS n_rows,
             sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS n_null
      FROM o GROUP BY 1
    ),
    pooled AS (SELECT sum(n_rows) AS tn, sum(n_null) AS tnull FROM parts)
    SELECT partition, n_rows, n_null,
           round(n_null * 1.0 / n_rows, 6) AS null_rate,
           round(tnull * 1.0 / tn, 6) AS pooled_rate,
           round((n_null * 1.0 / n_rows - tnull * 1.0 / tn)
                 / sqrt((tnull * 1.0 / tn) * (1.0 - tnull * 1.0 / tn) / n_rows), 6)
             AS z,
           true AS drifted
    FROM parts, pooled
    WHERE abs((n_null * 1.0 / n_rows - tnull * 1.0 / tn)
              / sqrt((tnull * 1.0 / tn) * (1.0 - tnull * 1.0 / tn) / n_rows)) >= 4.0
    """,
)
def drift_null_rate_orders(spark, sf_dir):
    """X145: per-partition null-rate drift with planted nulls (a ~9%
    baseline everywhere plus an inflated rate in 1-URGENT, derived
    deterministically from o_orderkey so both engines plant the same
    cells): the one-proportion z against the pooled rate flags the
    poisoned partition, |z| >= 4. One groupBy carrying two integer
    counts; pooled rate broadcast from the partials."""
    from zparse_spark.operators.stats import null_rate_drift

    o = _t(spark, sf_dir, "orders").withColumn(
        "k",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None).cast("long"))
        .when(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") % 3 == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(F.col("o_custkey")),
    )
    return null_rate_drift(o, "k", "o_orderpriority", z_threshold=4.0)


@register(
    "corpus_code_switching_audit",
    """
    WITH docs2 AS (
      SELECT doc_id, source,
             text ||
             CASE WHEN CAST(doc_id AS BIGINT) % 7 = 0
                  THEN chr(10) || 'der die und das' ELSE '' END ||
             CASE WHEN CAST(doc_id AS BIGINT) % 11 = 0
                  THEN chr(10) || 'el que la los' || chr(10) || 'le les des est'
                  ELSE '' END AS text
      FROM documents WHERE text IS NOT NULL
    ),
    lines AS (
      SELECT source AS partition, CAST(doc_id AS VARCHAR) AS id,
             unnest(string_split(text, chr(10))) AS line
      FROM docs2
    ),
    nz AS (SELECT partition, id, line FROM lines WHERE trim(line) <> ''),
    scored AS (
      SELECT partition, id,
        len(list_filter(regexp_split_to_array(lower(line), '\\s+'),
            w -> w IN ('the','and','is','of'))) AS s_en,
        len(list_filter(regexp_split_to_array(lower(line), '\\s+'),
            w -> w IN ('el','la','que','los'))) AS s_es,
        len(list_filter(regexp_split_to_array(lower(line), '\\s+'),
            w -> w IN ('der','die','und','das'))) AS s_de,
        len(list_filter(regexp_split_to_array(lower(line), '\\s+'),
            w -> w IN ('le','les','des','est'))) AS s_fr
      FROM nz
    ),
    guessed AS (
      SELECT partition, id,
        CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
             WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
             WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
             WHEN s_fr > 0 THEN 'fr'
             ELSE 'und' END AS g
      FROM scored
    ),
    per_doc AS (
      SELECT partition, id,
             sum(CASE WHEN g = 'en' THEN 1 ELSE 0 END) AS c_en,
             sum(CASE WHEN g = 'es' THEN 1 ELSE 0 END) AS c_es,
             sum(CASE WHEN g = 'de' THEN 1 ELSE 0 END) AS c_de,
             sum(CASE WHEN g = 'fr' THEN 1 ELSE 0 END) AS c_fr
      FROM guessed GROUP BY 1, 2
    ),
    m AS (
      SELECT partition, id, (c_en + c_es + c_de + c_fr) AS n,
             greatest(c_en, c_es, c_de, c_fr) AS dom
      FROM per_doc
    ),
    f AS (
      SELECT partition, id, (n - dom) >= n * 0.25 AS mixed
      FROM m WHERE n > 0
    )
    SELECT partition, count(*) AS n_docs,
           sum(CASE WHEN mixed THEN 1 ELSE 0 END) AS n_mixed,
           round(sum(CASE WHEN mixed THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS mixed_rate,
           min(CASE WHEN mixed THEN id END) AS example_doc_id
    FROM f GROUP BY 1
    """,
)
def corpus_code_switching_audit(spark, sf_dir):
    """X147: code-switching audit per source — line-level lang_guess
    votes, mixed when the minority classified lines reach 25%. Foreign
    lines planted deterministically from doc_id (every 7th doc gains a
    German line, every 11th a Spanish + French line) so both engines
    build the identical corpus. One line explode -> per-doc conditional
    counts in one groupBy; integer mix decision."""
    from zparse_spark.functions.text import code_switching_audit

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    planted = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id").cast("long") % 7 == 0, F.lit("\nder die und das")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id").cast("long") % 11 == 0,
                F.lit("\nel que la los\nle les des est"),
            ).otherwise(F.lit("")),
        ),
    )
    return code_switching_audit(planted, "text", "source", "doc_id")


@register(
    "quantiles_quantity",
    """
    SELECT round(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS q25,
           round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS q50,
           round(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS q75,
           round(CAST(quantile_cont(l_quantity, 0.99) AS DOUBLE), 4) AS q99
    FROM lineitem
    """,
)
def quantiles_quantity(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # exact percentile (interpolating, matches quantile_cont); the scale
    # path for 10^12 rows is percentile_approx / t-digest (operators.stats)
    return li.agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("q50"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q75"),
        F.round(F.percentile("l_quantity", F.lit(0.99)), 4).alias("q99"),
    )


@register(
    "corpus_cap_per_source",
    """
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
)
def corpus_cap_per_source(spark, sf_dir):
    """Per-source document cap (the web-corpus "max N docs per domain"
    curation rule): deterministic total order (n_chars desc, doc_id asc
    tiebreak), row_number <= N inside one hash-partitioned window —
    rank-per-key, never a global sort."""
    from zparse_spark.operators.filtering import cap_per_group

    d = _t(spark, sf_dir, "documents")
    return cap_per_group(d, "source", 10, "n_chars").select("doc_id", "source", "n_chars")


@register(
    "outliers_quantity_iqr",
    """
    WITH f AS (
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.75) AS q3
      FROM lineitem GROUP BY l_returnflag
    ),
    fe AS (
      SELECT l_returnflag, q1, q3,
             q1 - 0.25 * (q3 - q1) AS lo_fence,
             q3 + 0.25 * (q3 - q1) AS hi_fence
      FROM f
    )
    SELECT li.l_returnflag, any_value(fe.q1) AS q1, any_value(fe.q3) AS q3,
           any_value(fe.lo_fence) AS lo_fence, any_value(fe.hi_fence) AS hi_fence,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN li.l_quantity < fe.lo_fence
                           OR li.l_quantity > fe.hi_fence THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           min(CASE WHEN li.l_quantity < fe.lo_fence OR li.l_quantity > fe.hi_fence
                    THEN li.l_quantity END) AS min_outlier,
           max(CASE WHEN li.l_quantity < fe.lo_fence OR li.l_quantity > fe.hi_fence
                    THEN li.l_quantity END) AS max_outlier
    FROM lineitem li JOIN fe USING (l_returnflag)
    GROUP BY li.l_returnflag
    """,
)
def outliers_quantity_iqr(spark, sf_dir):
    """Tukey-fence outlier rule per group — EXACT interpolated quartiles
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``: q = v[lo] +
    frac*(v[hi]-v[lo])); with integer-valued l_quantity every quartile,
    IQR product, and fence is a dyadic rational, so both engines compute
    bit-identical doubles and the outlier comparisons cannot flip.
    k=0.25 tightens the fences so the uniform 1..50 quantity actually
    has tails to flag (the classic 1.5 leaves none)."""
    from zparse_spark.operators.stats import iqr_outliers

    li = _t(spark, sf_dir, "lineitem")
    return iqr_outliers(li, "l_quantity", ["l_returnflag"], k=0.25)


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]


def _corr_oracle_sql() -> str:
    aggs = ",\n           ".join(
        f"round(corr({a}, {b}), 6) AS c_{i}, round(covar_samp({a}, {b}), 6) AS v_{i}"
        for i, (a, b) in enumerate(_CORR_PAIRS)
    )
    arms = "\n    UNION ALL ".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, c_{i} AS corr, v_{i} AS cov FROM m"
        for i, (a, b) in enumerate(_CORR_PAIRS)
    )
    return f"WITH m AS (SELECT {aggs} FROM lineitem)\n    {arms}"


@register(
    "repair_clamp_quantity",
    """
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(l_quantity AS DOUBLE) AS v
      FROM lineitem
    ),
    f AS (
      SELECT l_returnflag AS g,
             quantile_cont(v, 0.25) AS q1,
             quantile_cont(v, 0.75) AS q3
      FROM src GROUP BY 1
    )
    SELECT s.l_orderkey, s.l_linenumber, s.l_returnflag, s.v AS l_quantity,
           CASE WHEN s.v IS NULL THEN s.v
                ELSE least(greatest(s.v, q1 - 0.25 * (q3 - q1)), q3 + 0.25 * (q3 - q1))
           END AS l_quantity_clamped,
           s.v IS NOT NULL AND (s.v < q1 - 0.25 * (q3 - q1) OR s.v > q3 + 0.25 * (q3 - q1))
             AS l_quantity_was_clamped
    FROM src s JOIN f ON f.g = s.l_returnflag
    """,
)
def repair_clamp_quantity(spark, sf_dir):
    """Numeric repair (the winsorize arm of the repair family): clamp
    l_quantity into its return-flag group's Tukey fences at k=0.25 —
    detection (iqr_outliers) and repair share the exact interpolated-
    quartile contract, so they agree on the boundary by construction.
    One fences aggregate broadcast back, map-only clamp (see
    clamp_outliers)."""
    from zparse_spark.operators.stats import clamp_outliers

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.col("l_quantity").cast("double").alias("l_quantity"),
    )
    return clamp_outliers(li, "l_quantity", ["l_returnflag"], k=0.25)


_EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]
# the planted machine: signup may only follow error (a re-registration
# flow); every other transition is legal
_ALLOWED_TRANSITIONS = [
    (a, b) for a in _EVENT_TYPES for b in _EVENT_TYPES
    if not (b == "signup" and a != "error")
]


@register(
    "events_transition_violations",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT user_id, event_id, ts, prev_type, event_type
    FROM o
    WHERE prev_type IS NOT NULL AND event_type = 'signup' AND prev_type <> 'error'
    """,
)
def events_transition_violations(spark, sf_dir):
    """Sequence-constraint validation — the reference's parser-state
    legality (json/parser.rs state transitions) lifted to event streams:
    per user, ordered by (ts, event_id) for a deterministic violation
    set, every consecutive type pair must be in the allowed machine
    (here: signup only after error). One lag window = one shuffle on
    user_id, allowed set a codegen literal array; the oracle expresses
    the same machine as its complement predicate."""
    from zparse_spark.operators.rules import transition_violations

    return transition_violations(_t(spark, sf_dir, "events"), _ALLOWED_TRANSITIONS)


@register(
    "diff_documents_changed_columns",
    """
    WITH n AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN text || '!' ELSE text END AS text,
             CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang,
             source,
             CASE WHEN doc_id % 7 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
      FROM documents
    ),
    j AS (
      SELECT o.doc_id,
             list_filter([
               CASE WHEN o.text IS DISTINCT FROM n.text THEN 'text' END,
               CASE WHEN o.lang IS DISTINCT FROM n.lang THEN 'lang' END,
               CASE WHEN o.source IS DISTINCT FROM n.source THEN 'source' END,
               CASE WHEN o.n_chars IS DISTINCT FROM n.n_chars THEN 'n_chars' END
             ], x -> x IS NOT NULL) AS changed_columns
      FROM documents o JOIN n USING (doc_id)
    )
    SELECT doc_id, changed_columns, len(changed_columns) AS n_changed
    FROM j WHERE len(changed_columns) > 0
    """,
)
def diff_documents_changed_columns(spark, sf_dir):
    """Changed-column attribution between snapshots — the drill-down
    under snapshot_diff's 'changed' bucket: WHICH fields moved, per key,
    null-safe, array in declaration order. Planted mutations on three
    independent residue classes (lang, n_chars, text-append). One
    equi-join + map-only array build; output delta-sparse (see
    row_diff_columns)."""
    from zparse_spark.operators.canonical import row_diff_columns

    old = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    new = old.select(
        "doc_id",
        F.when(did % 11 == 0, F.concat("text", F.lit("!"))).otherwise(F.col("text")).alias("text"),
        F.when(did % 5 == 0, F.lit("xx")).otherwise(F.col("lang")).alias("lang"),
        "source",
        F.when(did % 7 == 0, F.col("n_chars") + 1).otherwise(F.col("n_chars")).alias("n_chars"),
    )
    return row_diff_columns(old, new, ["doc_id"])


@register(
    "profile_inclusion_lineitem_orders",
    """
    WITH c AS (
      SELECT DISTINCT v FROM (
        SELECT l_orderkey AS v FROM lineitem
        UNION ALL SELECT * FROM (VALUES (-1), (-2), (-3)) x(v)
      ) WHERE v IS NOT NULL
    ),
    p AS (SELECT DISTINCT o_orderkey AS v FROM orders WHERE o_orderkey IS NOT NULL),
    m AS (SELECT c.v, p.v IS NOT NULL AS hit FROM c LEFT JOIN p ON p.v = c.v)
    SELECT count(*) AS n_child_distinct,
           sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_matched,
           round(sum(CASE WHEN hit THEN 1 ELSE 0 END) / count(*), 6) AS inclusion,
           (list_sort(list(CAST(v AS VARCHAR)) FILTER (WHERE NOT hit)))[1:3] AS examples
    FROM m
    """,
)
def profile_inclusion_lineitem_orders(spark, sf_dir):
    """Inclusion-dependency profiling (FK discovery — the IND half of
    the TANE family next to fd_confidence): l_orderkey ⊆ o_orderkey
    with three planted orphans, so inclusion lands just under 1 and the
    bounded example list names them. Both sides reduce to distinct
    domains before the join — never row×row (see
    inclusion_coefficient)."""
    from zparse_spark.operators.stats import inclusion_coefficient

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    planted = spark.createDataFrame([(-1,), (-2,), (-3,)], "l_orderkey long")
    return inclusion_coefficient(
        li.unionByName(planted), "l_orderkey", _t(spark, sf_dir, "orders"), "o_orderkey"
    )


@register(
    "profile_key_candidates",
    """
    SELECT 'l_orderkey' AS combo, count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_distinct,
           sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS n_null_combos,
           round(count(DISTINCT l_orderkey) / count(*), 6) AS uniqueness
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey,l_linenumber', count(*),
           count(DISTINCT (l_orderkey, l_linenumber)),
           sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL THEN 1 ELSE 0 END),
           round(count(DISTINCT (l_orderkey, l_linenumber)) / count(*), 6)
    FROM lineitem
    UNION ALL
    SELECT 'lang,source', count(*),
           count(DISTINCT (lang, source)),
           sum(CASE WHEN lang IS NULL OR source IS NULL THEN 1 ELSE 0 END),
           round(count(DISTINCT (lang, source)) / count(*), 6)
    FROM documents
    """,
)
def profile_key_candidates(spark, sf_dir):
    """Primary-key candidacy scores (the discovery side of U1): distinct
    combos / rows per candidate combination, NULL-bearing combos counted
    separately (SQL uniqueness ignores NULLs — a high ratio with nulls
    is the trap this surfaces). (l_orderkey, l_linenumber) scores 1.0,
    l_orderkey alone does not; one aggregate pass per combo."""
    from zparse_spark.operators.stats import key_candidate_score

    li = _t(spark, sf_dir, "lineitem")
    d = _t(spark, sf_dir, "documents")
    return (
        key_candidate_score(li, ["l_orderkey"]).select(F.lit("l_orderkey").alias("combo"), "*")
        .unionByName(
            key_candidate_score(li, ["l_orderkey", "l_linenumber"]).select(
                F.lit("l_orderkey,l_linenumber").alias("combo"), "*"
            )
        )
        .unionByName(
            key_candidate_score(d, ["lang", "source"]).select(
                F.lit("lang,source").alias("combo"), "*"
            )
        )
    )


_PROFILE_DRIFT_SQL = """
    WITH new_t AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
             CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang,
             n_chars,
             CASE WHEN doc_id % 10 = 0 THEN 'val' ELSE 'train' END AS split
      FROM documents
    ),
    o AS (
      SELECT 'doc_id' AS "column", 'bigint' AS old_type,
             round((count(*) - count(doc_id)) / CAST(count(*) AS DOUBLE), 6) AS old_null_rate,
             count(DISTINCT doc_id) AS old_distinct FROM documents
      UNION ALL
      SELECT 'text', 'string', round((count(*) - count(text)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT text) FROM documents
      UNION ALL
      SELECT 'lang', 'string', round((count(*) - count(lang)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT lang) FROM documents
      UNION ALL
      SELECT 'source', 'string', round((count(*) - count(source)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT source) FROM documents
      UNION ALL
      SELECT 'n_chars', 'bigint', round((count(*) - count(n_chars)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT n_chars) FROM documents
    ),
    n AS (
      SELECT 'doc_id' AS "column", 'string' AS new_type,
             round((count(*) - count(doc_id)) / CAST(count(*) AS DOUBLE), 6) AS new_null_rate,
             count(DISTINCT doc_id) AS new_distinct FROM new_t
      UNION ALL
      SELECT 'text', 'string', round((count(*) - count(text)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT text) FROM new_t
      UNION ALL
      SELECT 'lang', 'string', round((count(*) - count(lang)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT lang) FROM new_t
      UNION ALL
      SELECT 'n_chars', 'bigint', round((count(*) - count(n_chars)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT n_chars) FROM new_t
      UNION ALL
      SELECT 'split', 'string', round((count(*) - count(split)) / CAST(count(*) AS DOUBLE), 6),
             count(DISTINCT split) FROM new_t
    ),
    j AS (
      SELECT coalesce(o."column", n."column") AS "column",
             o.old_type, n.new_type, o.old_null_rate, n.new_null_rate,
             o.old_distinct, n.new_distinct
      FROM o FULL OUTER JOIN n ON o."column" = n."column"
    ),
    calc AS (
      SELECT *,
             round(new_null_rate - old_null_rate, 6) AS nd,
             CASE WHEN old_distinct > 0 AND new_distinct > 0
                  THEN round(CAST(new_distinct AS DOUBLE) / old_distinct, 6) END AS ratio
      FROM j
    )
    SELECT "column",
           CASE WHEN old_type IS NULL THEN 'added'
                WHEN new_type IS NULL THEN 'removed'
                WHEN old_type <> new_type THEN 'type_changed'
                WHEN abs(nd) > 0.05
                     OR (ratio IS NULL AND coalesce(old_distinct, new_distinct) > 0
                         AND old_distinct <> new_distinct)
                     OR ratio > 2.0 OR ratio < 0.5
                  THEN 'drifted'
                ELSE 'stable' END AS status,
           old_type, new_type, old_null_rate, new_null_rate,
           CASE WHEN old_type IS NOT NULL AND new_type IS NOT NULL THEN nd END AS null_rate_delta,
           old_distinct, new_distinct,
           CASE WHEN old_type IS NOT NULL AND new_type IS NOT NULL THEN ratio END AS distinct_ratio
    FROM calc
"""

@register("profile_drift_documents", _PROFILE_DRIFT_SQL)
def profile_drift_documents(spark, sf_dir):
    """Column-level snapshot drift (X68): the new snapshot retypes
    doc_id (bigint -> string), nulls every 5th lang (null-rate leg),
    drops source (removed), adds split (added); text/n_chars stay
    stable. One aggregate pass per side, k-row join — see
    profile_snapshot_diff."""
    from zparse_spark.operators.stats import profile_snapshot_diff

    old = _t(spark, sf_dir, "documents")
    new = old.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "n_chars",
        F.when(F.col("doc_id") % 10 == 0, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )
    return profile_snapshot_diff(old, new)


@register("stats_correlation_lineitem", _corr_oracle_sql())
def stats_correlation_lineitem(spark, sf_dir):
    """Pairwise Pearson correlation + sample covariance over the four
    lineitem measures, long format — the joint-moment companion to
    stats_lineitem's marginals (a drift rule watching "discount stopped
    tracking price" needs these). ONE aggregate pass: all 12 co-moment
    states ride a single scan of the 4-column pruned projection, then a
    shuffle-free stack() unpivot (operators/stats.py::correlation_matrix
    for the 100 TB shape). corr is O(1)-normalized and cov's Welford
    merge error is ~1e-14 relative, so round-6 is stable cross-engine.
    """
    from zparse_spark.operators.stats import correlation_matrix

    li = _t(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


@register(
    "stats_robust_source_anomaly",
    """
    WITH d AS (
      SELECT CASE WHEN doc_id % 20 = 7 THEN 'src_planted' ELSE source END AS grp,
             CASE WHEN doc_id % 20 = 7 THEN n_chars + 5000 ELSE n_chars END AS v
      FROM documents
    ),
    g AS (SELECT grp, count(*) AS n, avg(v) AS x FROM d GROUP BY grp),
    m AS (SELECT quantile_cont(x, 0.5) AS med FROM g),
    md AS (SELECT quantile_cont(abs(g.x - m.med), 0.5) AS mad FROM g, m)
    SELECT grp, n, round(x, 6) AS x,
           round((x - med) / nullif(1.4826 * mad, 0), 6) AS robust_z,
           CASE WHEN nullif(1.4826 * mad, 0) IS NULL THEN NULL
                ELSE CAST(abs((x - med) / (1.4826 * mad)) > 3.5 AS INT)
           END AS is_anomaly
    FROM g, m, md
    """,
)
def stats_robust_source_anomaly(spark, sf_dir):
    """Median/MAD modified z-score over per-source mean doc length — the
    partition-anomaly screen (mean/stddev screening breaks exactly when
    the anomaly inflates the stddev it is judged against). Fixture
    plants a 21st source whose docs carry n_chars+5000, guaranteeing one
    |z|>3.5 hit against 20 organic sources. Exact cross-engine: BIGINT
    sums make every group mean deterministic, and the two medians use
    the interpolated percentile ≡ quantile_cont contract established by
    outliers_quantity_iqr. 100 TB shape: one shuffled group-avg pass;
    medians/MAD/joins all run on the one-row-per-source table
    (operators/stats.py::robust_group_anomalies).
    """
    from zparse_spark.operators.stats import robust_group_anomalies

    d = _t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 20 == 7, F.lit("src_planted"))
        .otherwise(F.col("source"))
        .alias("grp_src"),
        F.when(F.col("doc_id") % 20 == 7, F.col("n_chars") + 5000)
        .otherwise(F.col("n_chars"))
        .alias("v"),
    )
    return robust_group_anomalies(d, "grp_src", "v", threshold=3.5)


@register(
    "reconcile_orders_lineitem",
    """
    WITH a AS (
      SELECT l_orderkey AS key,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS cv
      FROM lineitem GROUP BY 1
    ),
    parent AS (
      SELECT key,
             CASE WHEN key % 37 = 0 THEN round(cv * 1.2, 2) ELSE cv END AS stored_total
      FROM a
    )
    SELECT a.key, a.cv AS child_value,
           round(p.stored_total, 2) AS parent_value,
           round(abs(a.cv - p.stored_total), 2) AS abs_err,
           round(abs(a.cv - p.stored_total) / nullif(abs(p.stored_total), 0), 6)
             AS rel_err
    FROM a JOIN parent p USING (key)
    WHERE abs(a.cv - p.stored_total) > 0.0 + 0.05 * abs(p.stored_total)
    """,
)
def reconcile_orders_lineitem(spark, sf_dir):
    """Parent↔child aggregate reconciliation: orders' stored total vs the
    sum of its lineitems' net charge. Fixture derives the parent from the
    true sums and corrupts every 37th orderkey by +20%, so exactly the
    planted keys violate at rel_tol=0.05 (rel_err ≈ 0.1667) and the inner
    join keeps the check orthogonal to R1. See
    operators/rules.py::aggregate_reconciliation for the 100 TB shape
    (one map-side-combined child shuffle to parent cardinality, SMJ,
    violation-sparse output, round-before-compare determinism contract).
    """
    from zparse_spark.operators.rules import aggregate_reconciliation

    li = _t(spark, sf_dir, "lineitem")
    net = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    sums = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.round(net, 2).alias("cv")
    )
    parent = sums.select(
        "key",
        F.when(F.col("key") % 37 == 0, F.round(F.col("cv") * 1.2, 2))
        .otherwise(F.col("cv"))
        .alias("stored_total"),
    )
    return aggregate_reconciliation(
        li, parent, "l_orderkey", "key", net, "stored_total", rel_tol=0.05
    )


@register(
    "skew_profile_events_user",
    """
    WITH keyed AS (
      SELECT CASE WHEN event_id % 3 = 0 THEN 'hot_user'
                  ELSE coalesce(CAST(user_id AS VARCHAR), 'NULL') END AS key
      FROM events
    ),
    counts AS (SELECT key, count(*) AS n FROM keyed GROUP BY key),
    agg AS (
      SELECT sum(n) AS n_rows, count(*) AS n_keys, max(n) AS max_count,
             sum(n * ln(n)) AS s
      FROM counts
    )
    SELECT CAST(n_rows AS BIGINT) AS n_rows, n_keys,
           (SELECT min(key) FROM counts, agg WHERE counts.n = agg.max_count)
             AS max_key,
           max_count,
           round(max_count / n_rows, 6) AS top_share,
           round(ln(n_rows) - s / n_rows, 6) AS entropy_nats,
           CAST(ceil(max_count / 1000.0) AS BIGINT) AS salt_factor
    FROM agg
    """,
)
def skew_profile_events_user(spark, sf_dir):
    """Key-distribution profiler — the measurement behind every salting
    decision (salted_join's n_salts, R1 strategy, AQE thresholds).
    Fixture funnels every 3rd event onto one hot user so the profile has
    real skew to report: top_share ≈ 1/3, salt_factor =
    ceil(max_count/1000) > 1. See operators/skew.py::key_skew_profile
    for the 100 TB shape (one map-side-combined groupBy; entropy rides
    the same aggregate via H = ln N − Σ n·ln n / N; hottest key is a
    broadcast filter, never a global sort).
    """
    from zparse_spark.operators.skew import key_skew_profile

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 3 == 0, F.lit("hot_user"))
        .otherwise(F.col("user_id").cast("string"))
        .alias("user_key")
    )
    return key_skew_profile(ev, "user_key", target_rows_per_task=1000)


@register(
    "drift_timeline_events",
    """
    WITH counts AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             event_type AS cat, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT b.bucket, c.cat, coalesce(counts.n, 0) AS n
      FROM (SELECT DISTINCT bucket FROM counts) b
      CROSS JOIN (SELECT DISTINCT cat FROM counts) c
      LEFT JOIN counts ON counts.bucket = b.bucket AND counts.cat = c.cat
    ),
    g1 AS (
      SELECT bucket, cat, n, sum(n) OVER (PARTITION BY bucket) AS tot FROM grid
    ),
    g2 AS (
      SELECT bucket, cat, n, tot,
             lag(n) OVER (PARTITION BY cat ORDER BY bucket) AS n_prev,
             lag(tot) OVER (PARTITION BY cat ORDER BY bucket) AS tot_prev,
             lag(bucket) OVER (PARTITION BY cat ORDER BY bucket) AS prev_bucket
      FROM g1
    )
    SELECT bucket, prev_bucket,
           CAST(max(tot) AS BIGINT) AS n_rows,
           CAST(max(tot_prev) AS BIGINT) AS n_rows_prev,
           round(sum((n / tot + 1e-6 - (n_prev / tot_prev + 1e-6))
                     * ln((n / tot + 1e-6) / (n_prev / tot_prev + 1e-6))), 6) AS psi,
           round(sum((n / tot + 1e-6)
                     * ln((n / tot + 1e-6) / (n_prev / tot_prev + 1e-6))), 6) AS kl
    FROM g2 WHERE n_prev IS NOT NULL
    GROUP BY bucket, prev_bucket
    """,
)
def drift_timeline_events(spark, sf_dir):
    """Day-over-day PSI/KL of the event-type mix — D1 drift sliced along
    time instead of along partitions (the "did yesterday's ingest change
    the distribution?" monitor). Dense bucket×category grid so vanished
    categories contribute drift; epsilon-floored shares match
    rules.py::drift_scores. See operators/stats.py::drift_timeline —
    one map-side-combined count pass, everything else on the tiny grid.
    """
    from zparse_spark.operators.stats import drift_timeline

    return drift_timeline(_t(spark, sf_dir, "events"), "ts", "event_type", "day")


@register(
    "corpus_pmi_collocations",
    """
    WITH toks AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    uni AS (SELECT unnest(t) AS w FROM toks),
    uc AS (SELECT w, count(*) AS c FROM uni WHERE w <> '' GROUP BY w),
    n1 AS (SELECT sum(c) AS n FROM uc),
    big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    ),
    n2 AS (SELECT count(*) AS n FROM big),
    bc AS (
      SELECT w1, w2, count(*) AS c_xy FROM big GROUP BY w1, w2
      HAVING count(*) >= 3
    )
    SELECT bc.w1, bc.w2, bc.c_xy,
           round(ln((bc.c_xy / n2.n) / ((u1.c / n1.n) * (u2.c / n1.n))), 6) AS pmi
    FROM bc
    JOIN uc u1 ON u1.w = bc.w1
    JOIN uc u2 ON u2.w = bc.w2
    CROSS JOIN n1 CROSS JOIN n2
    ORDER BY pmi DESC, bc.w1 ASC, bc.w2 ASC LIMIT 40
    """,
)
def corpus_pmi_collocations(spark, sf_dir):
    """Top-40 bigram collocations by PMI — phrase induction /
    tokenizer-merge candidates over the documents corpus. The rounded
    score drives the rank (ties w1,w2 asc) so the top-n set is
    engine-portable, the tfidf_top_terms contract. See
    functions/text.py::pmi_collocations for the 100 TB shape (map-side
    arrays_zip bigrams, min_count pruning before the vocabulary joins,
    broadcast totals, TakeOrdered)."""
    from zparse_spark.functions.text import pmi_collocations

    return pmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=3, top_n=40
    )


@register(
    "stats_benford_totalprice",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL AND floor(abs(o_totalprice)) >= 1
    ),
    counts AS (
      SELECT g.digit, count(d.digit) AS n
      FROM (SELECT unnest(generate_series(1, 9)) AS digit) g
      LEFT JOIN d ON d.digit = g.digit GROUP BY g.digit
    ),
    tot AS (SELECT sum(n) AS total_n FROM counts)
    SELECT digit, n,
           round(n / total_n, 6) AS p_obs,
           round(log10(1.0 + 1.0 / digit), 6) AS p_benford,
           round(abs(n / total_n - log10(1.0 + 1.0 / digit)), 6) AS abs_dev,
           round(sum(pow(n - total_n * log10(1.0 + 1.0 / digit), 2)
                     / (total_n * log10(1.0 + 1.0 / digit))) OVER (), 4) AS chi2_total
    FROM counts, tot
    """,
)
def stats_benford_totalprice(spark, sf_dir):
    """Benford first-digit screen on order totals — the forensic check
    for fabricated/truncated numerics (real multiplicative quantities
    follow log10(1+1/d); capped or synthetic fields don't). Leading
    digit comes from the decimal STRING of floor(|v|), never
    floor(log10(v)) whose libm last-ulp can misclassify exact powers of
    ten cross-engine. See operators/stats.py::benford_deviation — one
    map-only projection + one 9-group aggregate; chi2 folds on the
    9-row table."""
    from zparse_spark.operators.stats import benford_deviation

    return benford_deviation(_t(spark, sf_dir, "orders"), "o_totalprice")


@register(
    "fd_confidence_source_lang",
    """
    WITH pairs AS (
      SELECT source AS x, coalesce(lang, 'NULL') AS y, count(*) AS n_xy
      FROM documents WHERE source IS NOT NULL GROUP BY 1, 2
    ),
    g AS (
      SELECT x, y, n_xy,
             sum(n_xy) OVER (PARTITION BY x) AS n_x,
             count(*) OVER (PARTITION BY x) AS n_variants,
             row_number() OVER (PARTITION BY x ORDER BY n_xy DESC, y ASC) AS rk
      FROM pairs
    )
    SELECT x AS determinant, y AS majority_value, n_xy AS majority_count,
           CAST(n_x AS BIGINT) AS group_count,
           CAST(n_variants AS BIGINT) AS n_variants,
           round(n_xy / n_x, 6) AS confidence
    FROM g WHERE rk = 1 AND round(n_xy / n_x, 6) < 0.99
    """,
)
def fd_confidence_source_lang(spark, sf_dir):
    """Approximate FD source → lang: per-source majority-language
    confidence (TANE g3-style) — the profiling companion to the exact
    fd_documents_source_lang violation enumeration ("mostly holds" vs
    "must hold"). Every multi-lingual source lands below the 0.99
    threshold with its majority language named. See
    operators/rules.py::fd_confidence — groupBy(X,Y) map-side combine
    to the distinct-pair table, window + filter on that reduced table.
    """
    from zparse_spark.operators.rules import fd_confidence

    return fd_confidence(
        _t(spark, sf_dir, "documents"), "source", "lang", min_confidence=0.99
    )


@register(
    "embedding_validation_rules",
    """
    WITH planted AS (
      SELECT vec_id,
        CASE WHEN vec_id % 41 = 0 THEN NULL
             WHEN vec_id % 41 = 1 THEN embedding[1:10]
             WHEN vec_id % 41 = 2 THEN list_transform(embedding, x -> 'nan'::FLOAT)
             WHEN vec_id % 41 = 3 THEN list_transform(embedding, x -> 0.0::FLOAT)
             WHEN vec_id % 41 = 4 THEN list_transform(embedding, x -> x * 100.0::FLOAT)
             ELSE embedding END AS v
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, v, len(v) AS dim,
             coalesce(len(list_filter(v, x -> isnan(x::DOUBLE)
                                           OR abs(x::DOUBLE) = 'infinity'::DOUBLE)), 0)
               AS nnf,
             list_sum(list_transform(v, x -> x::DOUBLE * x::DOUBLE)) AS sumsq
      FROM planted
    )
    SELECT vec_id, 'E1_NULL_VECTOR' AS rule_id, 'vector is NULL' AS detail
    FROM m WHERE v IS NULL
    UNION ALL
    SELECT vec_id, 'E2_WRONG_DIM', 'dim=' || dim FROM m
    WHERE v IS NOT NULL AND dim <> 64
    UNION ALL
    SELECT vec_id, 'E3_NON_FINITE', 'n_nonfinite=' || nnf FROM m
    WHERE v IS NOT NULL AND nnf > 0
    UNION ALL
    SELECT vec_id, 'E4_ZERO_NORM', 'zero vector' FROM m
    WHERE v IS NOT NULL AND nnf = 0 AND sumsq = 0
    UNION ALL
    SELECT vec_id, 'E5_NORM_RANGE', 'norm out of [0.5, 50.0]' FROM m
    WHERE v IS NOT NULL AND nnf = 0 AND sumsq > 0
      AND (sqrt(sumsq) > 50.0 OR sqrt(sumsq) < 0.5)
    """,
)
def embedding_validation_rules(spark, sf_dir):
    """ANN-ingest gate over the embeddings table: one violation row per
    malformed vector (NULL / wrong dim / NaN / zero norm / norm range),
    with every damage class planted by vec_id mod 41 so all five rules
    fire. Null fires only E1; E4/E5 are finiteness-guarded so one bad
    element doesn't cascade. See
    operators/similarity.py::embedding_validation — one map-only
    array-expression projection, no explode of the vector, no Python,
    violation-sparse output."""
    from zparse_spark.operators.similarity import embedding_validation

    em = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    k = F.col("vec_id") % 41
    f100 = F.lit(100.0).cast("float")
    planted = em.select(
        "vec_id",
        F.when(k == 0, F.lit(None).cast("array<float>"))
        .when(k == 1, F.slice(v, 1, 10))
        .when(k == 2, F.transform(v, lambda x: F.lit(float("nan")).cast("float")))
        .when(k == 3, F.transform(v, lambda x: F.lit(0.0).cast("float")))
        .when(k == 4, F.transform(v, lambda x: x * f100))
        .otherwise(v)
        .alias("embedding"),
    )
    return embedding_validation(
        planted, expected_dim=64, norm_lo=0.5, norm_hi=50.0
    )


@register(
    "stats_mi_lang_source",
    """
    WITH pairs AS (
      SELECT coalesce(CAST(lang AS VARCHAR), 'NULL') AS x,
             coalesce(CAST(source AS VARCHAR), 'NULL') AS y,
             count(*) AS n_xy
      FROM documents GROUP BY 1, 2
    ),
    g AS (
      SELECT n_xy,
             CAST(sum(n_xy) OVER (PARTITION BY x) AS DOUBLE) AS n_x,
             CAST(sum(n_xy) OVER (PARTITION BY y) AS DOUBLE) AS n_y,
             CAST(sum(n_xy) OVER () AS DOUBLE) AS n,
             x, y
      FROM pairs
    ),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n_rows,
             count(DISTINCT x) AS n_x_card,
             count(DISTINCT y) AS n_y_card,
             sum((n_xy / n) * ln((n_xy * n) / (n_x * n_y))) AS mi_raw,
             sum(-(n_xy / n) * ln(n_x / n)) AS hx_raw,
             sum(-(n_xy / n) * ln(n_y / n)) AS hy_raw
      FROM g
    )
    SELECT n_rows, n_x_card AS n_x, n_y_card AS n_y,
           round(mi_raw, 6) AS mi,
           round(hx_raw, 6) AS h_x,
           round(hy_raw, 6) AS h_y,
           round(mi_raw / nullif(round(hx_raw, 12), 0), 6) AS u_x_given_y,
           round(mi_raw / nullif(round(hy_raw, 12), 0), 6) AS u_y_given_x
    FROM agg
    """,
)
def stats_mi_lang_source(spark, sf_dir):
    """Mutual information + Theil's U between lang and source — the
    categorical dependency metric (is the language mix independent of
    the source?), complementing correlation_matrix's numeric joint
    moments and fd_confidence's per-group view. One
    groupBy(x,y) to the distinct-pair table; marginals are window sums
    there and every entropy/MI term folds in a single aggregate (see
    operators/stats.py::mutual_information)."""
    from zparse_spark.operators.stats import mutual_information

    return mutual_information(_t(spark, sf_dir, "documents"), "lang", "source")


# ---------------------------------------------------------------------------
# Set ops (header-union analog, convert.rs:160-175)
# ---------------------------------------------------------------------------


@register(
    "setops_customers",
    """
    SELECT
      (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer
        INTERSECT SELECT DISTINCT o_custkey FROM orders)) AS with_orders,
      (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer
        EXCEPT SELECT DISTINCT o_custkey FROM orders)) AS without_orders
    """,
)
def setops_customers(spark, sf_dir):
    # intersect/except as ONE job: left join the distinct key sets and
    # count hit/miss in a single aggregate (the two-action
    # intersect().count() + exceptAll().count() version ran two jobs)
    c = _t(spark, sf_dir, "customer").select("c_custkey").distinct()
    o = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return c.join(o, "c_custkey", "left").agg(
        F.count(F.when(F.col("_hit").isNotNull(), 1)).alias("with_orders"),
        F.count(F.when(F.col("_hit").isNull(), 1)).alias("without_orders"),
    )


# ---------------------------------------------------------------------------
# Flat-document validation — the engine's rule pack re-expressed over the
# driver's flat documents table so DuckDB can oracle it (engine-level rules
# on the span table are pytest-verified instead).
# ---------------------------------------------------------------------------


@register(
    "validate_documents_flat",
    """
    SELECT doc_id, 'V1' AS rule_id, 'InvalidNumber' AS kind FROM documents
      WHERE n_chars <> length(text)
    UNION ALL
    SELECT doc_id, 'V2' AS rule_id, 'InvalidToken' AS kind FROM documents
      WHERE regexp_matches(text, '[\\x00-\\x1f]')
    UNION ALL
    SELECT doc_id, 'V3' AS rule_id, 'InvalidKey' AS kind FROM documents
      WHERE lang NOT IN ('en','es','de','fr','zh')
    UNION ALL
    SELECT doc_id, 'V4' AS rule_id, 'UnterminatedString' AS kind FROM documents
      WHERE text IS NULL OR length(text) = 0
    UNION ALL
    SELECT doc_id, 'V5' AS rule_id, 'MaxSizeExceeded' AS kind FROM documents
      WHERE n_chars > 500
    """,
)
def validate_documents_flat(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    v1 = d.filter(F.col("n_chars") != F.length("text")).select(
        "doc_id", F.lit("V1").alias("rule_id"), F.lit("InvalidNumber").alias("kind")
    )
    v2 = d.filter(F.col("text").rlike("[\\x00-\\x1f]")).select(
        "doc_id", F.lit("V2").alias("rule_id"), F.lit("InvalidToken").alias("kind")
    )
    v3 = d.filter(~F.col("lang").isin("en", "es", "de", "fr", "zh")).select(
        "doc_id", F.lit("V3").alias("rule_id"), F.lit("InvalidKey").alias("kind")
    )
    v4 = d.filter(F.col("text").isNull() | (F.length("text") == 0)).select(
        "doc_id", F.lit("V4").alias("rule_id"), F.lit("UnterminatedString").alias("kind")
    )
    # V5: the MaxSizeExceeded limit rule (json/parser.rs:127-136 analog)
    # with a cap the driver data actually exceeds, so the gate sees a
    # non-empty violation set.
    v5 = d.filter(F.col("n_chars") > 500).select(
        "doc_id", F.lit("V5").alias("rule_id"), F.lit("MaxSizeExceeded").alias("kind")
    )
    return v1.unionByName(v2).unionByName(v3).unionByName(v4).unionByName(v5)


# Driver-gate ordering: see _gate_order below. The per-round driver
# correctness gate evaluates exactly the FIRST 50 registry entries
# (r1 recorded 36/36, r2 44/44, r3 covered registry positions 1-50 of
# 57, r4 positions 1-50 of 85), so all_queries()/all_oracles() return a
# rotated order computed from the committed CORRECTNESS_r*.json
# artifacts — stale-first, new-registrations first. Demoted entries
# remain fully oracle-checked every round by scripts/check_oracles.py
# (identical row/col/hash protocol), committed as ORACLES_LOCAL_r{N}.json.


def _last_green_rounds() -> dict[str, int]:
    """Most recent round in which each query earned a driver-green row,
    read from the committed CORRECTNESS_r*.json gate artifacts. Green =
    no check recorded false and no error (rows-only checks for
    non-SQL-expressible ops count — that is the strongest row the
    driver produces for them)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict) or rec.get("err"):
                continue
            checks = [rec.get(k) for k in ("rows_match", "schema_match", "hash_match")]
            if any(c is False for c in checks) or not any(c is True for c in checks):
                continue
            last[name] = max(last.get(name, 0), rnd)
    return last


def _gate_order(d: dict) -> dict:
    """STALE-FIRST rotation, computed (not hand-curated) from the
    committed driver-gate artifacts: the per-round driver gate evaluates
    exactly the first 50 registry entries, so entries with NO driver-
    green row ever (this round's new registrations) sort first, then by
    oldest most-recent-green round, ties broken by registration order.
    Every query therefore re-accumulates a fresh driver row within
    ceil(registry_size/50) rounds of its last one, and a regression in
    a demoted query surfaces in driver-produced evidence at its next
    rotation — the round-4 process nit. The full registry additionally
    stays locally gated every round via scripts/check_oracles.py
    (ORACLES_LOCAL_r{N}.json)."""
    last = _last_green_rounds()
    names = list(d)
    order = sorted(range(len(names)), key=lambda i: (last.get(names[i], -1), i))
    return {names[i]: d[names[i]] for i in order}


def all_queries():
    return _gate_order(QUERIES)


def all_oracles():
    return _gate_order(ORACLES)


# ---------------------------------------------------------------------------
# Text analysis (training-data pipeline ops) over documents
# ---------------------------------------------------------------------------


@register(
    "doc_token_stats",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN trim(text) = '' OR text IS NULL THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens,
           round(avg(CASE WHEN trim(text) = '' OR text IS NULL THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END), 4) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def doc_token_stats(spark, sf_dir):
    from zparse_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    tc = token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
        F.round(F.avg(tc), 4).alias("avg_tokens"),
    )


@register(
    "doc_quality_components",
    """
    SELECT source,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(CAST(len(regexp_extract_all(text, '[a-z]')) AS DOUBLE)
                     / greatest(length(text), 1)), 6) AS lower_ratio,
           round(avg(CAST(len(regexp_extract_all(text, ' ')) AS DOUBLE)
                     / greatest(length(text), 1)), 6) AS space_ratio
    FROM documents GROUP BY source
    """,
)
def doc_quality_components(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n = F.greatest(F.length("text"), F.lit(1))
    lower_ratio = F.length(F.regexp_replace("text", "[^a-z]", "")) / n
    space_ratio = F.length(F.regexp_replace("text", "[^ ]", "")) / n
    return d.groupBy("source").agg(
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(lower_ratio), 6).alias("lower_ratio"),
        F.round(F.avg(space_ratio), 6).alias("space_ratio"),
    )


@register(
    "doc_langid_markers",
    """
    WITH scored AS (
      SELECT lang,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            w -> w IN ('the','and','is','of'))) AS s_en,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            w -> w IN ('el','la','que','los'))) AS s_es,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            w -> w IN ('der','die','und','das'))) AS s_de,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            w -> w IN ('le','les','des','est'))) AS s_fr
      FROM documents
    ), guessed AS (
      SELECT lang,
        CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
             WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
             WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
             WHEN s_fr > 0 THEN 'fr'
             ELSE 'und' END AS guess
      FROM scored
    )
    SELECT lang, guess, count(*) AS n FROM guessed GROUP BY lang, guess
    """,
)
def doc_langid_markers(spark, sf_dir):
    from zparse_spark.functions.text import lang_guess

    d = _t(spark, sf_dir, "documents")
    return d.select("lang", lang_guess(F.col("text")).alias("guess")).groupBy(
        "lang", "guess"
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "doc_fingerprint_stats",
    """
    SELECT count(*) AS n_docs,
           count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_distinct_fp
    FROM documents
    """,
)
def doc_fingerprint_stats(spark, sf_dir):
    from zparse_spark.functions.text import doc_fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(doc_fingerprint(F.col("text"))).alias("n_distinct_fp"),
    )


@register(
    "doc_repetition_signals",
    r"""
    WITH base AS (SELECT doc_id, text FROM documents),
    lines AS (
      SELECT doc_id, trim(x) AS line
      FROM base, unnest(string_split(text, chr(10))) AS t(x)
      WHERE trim(x) <> ''
    ),
    lc AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
           FROM lines GROUP BY 1, 2),
    lstat AS (
      SELECT doc_id,
             sum(c) AS n_lines,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
             sum(len * c) AS char_mass,
             sum(CASE WHEN c > 1 THEN len * c ELSE 0 END) AS dup_char_mass
      FROM lc GROUP BY 1
    ),
    wl AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\s+'),
                              x -> x <> '') AS ws
           FROM base),
    wc AS (SELECT doc_id, w, count(*) AS c
           FROM wl, unnest(ws) AS t(w) GROUP BY 1, 2),
    wstat AS (SELECT doc_id, sum(c) AS n_words, max(c) AS top_word
              FROM wc GROUP BY 1),
    bl AS (SELECT doc_id,
                  list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1]) AS bs
           FROM wl),
    bc AS (SELECT doc_id, b, count(*) AS c
           FROM bl, unnest(bs) AS t(b) GROUP BY 1, 2),
    bstat AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram
              FROM bc GROUP BY 1)
    SELECT d.doc_id,
           round(coalesce(l.dup_lines / l.n_lines, 0), 6) AS dup_line_frac,
           round(coalesce(l.dup_char_mass / l.char_mass, 0), 6) AS dup_char_frac,
           round(coalesce(w.top_word / w.n_words, 0), 6) AS top_word_frac,
           round(coalesce(b.top_bigram / b.n_bigrams, 0), 6) AS top_bigram_frac
    FROM base d
    LEFT JOIN lstat l USING (doc_id)
    LEFT JOIN wstat w USING (doc_id)
    LEFT JOIN bstat b USING (doc_id)
    """,
)
def doc_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals per doc (dup-line
    fraction / dup-line char mass / top word / top adjacent bigram
    share) — Arrow pandas UDF, map-only, value-oracled per doc. The
    DuckDB twin re-derives every fraction via group-by-count; each is
    one integer-ratio division, so the hash comparison is exact."""
    from zparse_spark.functions.text import repetition_signals

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", repetition_signals(F.col("text")).alias("_s"))
        .select(
            "doc_id",
            F.round(F.col("_s.dup_line_frac"), 6).alias("dup_line_frac"),
            F.round(F.col("_s.dup_char_frac"), 6).alias("dup_char_frac"),
            F.round(F.col("_s.top_word_frac"), 6).alias("top_word_frac"),
            F.round(F.col("_s.top_bigram_frac"), 6).alias("top_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Deduplication over documents (dups planted in-query: union a re-keyed
# 10% sample so both engines see identical duplicate structure)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_documents",
    """
    WITH extended AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
           count(*) AS n_docs,
           min(doc_id) AS keep_id,
           max(doc_id) AS max_id
    FROM extended GROUP BY 1 HAVING count(*) > 1
    """,
)
def dedup_exact_documents(spark, sf_dir):
    from zparse_spark.operators.dedup import exact_duplicates

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extended = d.unionByName(
        d.filter(F.col("doc_id") % 10 == 0).withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    return exact_duplicates(extended)


@register(
    "dedup_incremental_admission",
    """
    WITH corpus AS (
      SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
      FROM documents
    ),
    delta0 AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' uniq' FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 3000000, text || ' uniq' FROM documents WHERE doc_id % 14 = 0
    ),
    delta AS (
      SELECT doc_id, md5(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))) AS content_hash
      FROM delta0
    ),
    hits AS (
      SELECT content_hash, min(doc_id) AS corpus_dup FROM corpus
      WHERE content_hash IN (SELECT content_hash FROM delta) GROUP BY 1
    ),
    keep AS (
      SELECT *, min(doc_id) OVER (PARTITION BY content_hash) AS delta_keep FROM delta
    )
    SELECT k.doc_id, k.content_hash,
           CASE WHEN h.corpus_dup IS NOT NULL THEN 'dup_of_corpus'
                WHEN k.doc_id <> k.delta_keep THEN 'dup_in_delta'
                ELSE 'admitted' END AS status,
           CASE WHEN h.corpus_dup IS NOT NULL THEN h.corpus_dup
                WHEN k.doc_id <> k.delta_keep THEN k.delta_keep END AS dup_of
    FROM keep k LEFT JOIN hits h ON h.content_hash = k.content_hash
    """,
)
def dedup_incremental_admission(spark, sf_dir):
    """Incremental exact-dedup admission of a synthetic delta batch
    against the documents corpus: re-keyed copies (dup_of_corpus), a
    '+uniq' variant family repeated within the batch (admitted min-id +
    dup_in_delta), corpus untouched. Scale shape per
    ``incremental_exact_dedup``: the corpus streams through ONE scan
    against a broadcast probe of the delta's distinct hashes; only
    colliding corpus rows ever shuffle — the batch-vs-batch
    ``dedup_exact_documents`` re-pairing is exactly what a daily ingest
    at 10^12 docs must not do."""
    from zparse_spark.operators.dedup import incremental_exact_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    delta = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat("text", F.lit(" uniq")).alias("text"),
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 14 == 0).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat("text", F.lit(" uniq")).alias("text"),
            )
        )
    )
    return incremental_exact_dedup(d, delta)


@register(
    "dedup_ngram_jaccard_documents",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) - 2, 1)),
               i -> substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), i, 3)
             )) AS sh
      FROM documents WHERE doc_id < 50
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.4
    """,
)
def dedup_ngram_jaccard_documents(spark, sf_dir):
    """Exact pairwise char-3-gram Jaccard on a bounded slice (doc_id < 50)
    — the verify stage of the dedup pipeline, oracle-checked; LSH provides
    candidates at scale (rows-only queries above)."""
    from zparse_spark.operators.dedup import ngram_jaccard_pairs

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(F.col("doc_id").alias("doc_id"), "text")
    )
    ids = d.select(F.col("doc_id").alias("id_a"))
    ids_b = d.select(F.col("doc_id").alias("id_b"))
    cands = ids.crossJoin(ids_b).filter(F.col("id_a") < F.col("id_b"))
    return ngram_jaccard_pairs(d, cands, k_shingle=3, mode="char", threshold=0.4)


_WINNOW_PAIRS_CTES = r"""d AS (
      SELECT doc_id, lower(trim(regexp_replace(coalesce(text,''), '\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CASE WHEN length(t) >= 8
                  THEN list_transform(range(1, length(t) - 8 + 2),
                                      i -> md5(substring(t, CAST(i AS INT), 8)))
                  ELSE [md5(t)] END AS hs
      FROM d
    ),
    f AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(hs) >= 4
                    THEN list_transform(range(1, len(hs) - 4 + 2),
                                        j -> list_min(list_slice(hs, CAST(j AS INT), CAST(j + 3 AS INT))))
                    ELSE [list_min(hs)] END) AS fps
      FROM h
    ),
    post AS (SELECT doc_id, unnest(fps) AS fp FROM f),
    sz AS (SELECT doc_id, len(fps) AS n_fp FROM f),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fp
      FROM post a JOIN post b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    wpairs AS (
      SELECT s.id_a, s.id_b, s.shared_fp, za.n_fp AS n_fp_a, zb.n_fp AS n_fp_b,
             round(CAST(s.shared_fp AS DOUBLE) / (za.n_fp + zb.n_fp - s.shared_fp), 6) AS jaccard
      FROM shared s
      JOIN sz za ON za.doc_id = s.id_a
      JOIN sz zb ON zb.doc_id = s.id_b
      WHERE CAST(s.shared_fp AS DOUBLE) / (za.n_fp + zb.n_fp - s.shared_fp) >= 0.5
    )"""


@register(
    "dedup_winnowing_documents",
    f"""
    WITH {_WINNOW_PAIRS_CTES}
    SELECT id_a, id_b, shared_fp, n_fp_a, n_fp_b, jaccard FROM wpairs
    """,
)
def dedup_winnowing_documents(spark, sf_dir):
    """Winnowing (MOSS) fingerprint near-dup pairs over the WHOLE
    documents table — the exact-local member of the dedup family:
    MinHash/SimHash bound global similarity probabilistically, winnowing
    GUARANTEES any shared run of >= w + k - 1 = 11 normalized chars
    yields a shared fingerprint. Map-only fingerprinting, one explode,
    and a posting-list self-join that carries ~2/(w+1) of the raw k-gram
    index — the selection itself is engine-portable (lexicographic min
    over md5 hex), so DuckDB rebuilds identical fingerprint sets."""
    from zparse_spark.operators.dedup import winnowing_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return winnowing_pairs(d, k=8, w=4, threshold=0.5)


@register(
    "dedup_winnowing_quality",
    f"""
    WITH {_WINNOW_PAIRS_CTES},
    wsel AS (SELECT id_a, id_b FROM wpairs WHERE id_a < 200 AND id_b < 200),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) - 2, 1)),
               i -> substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), i, 3)
             )) AS sh
      FROM documents WHERE doc_id < 200
    ),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.5
    )
    SELECT (SELECT count(*) FROM truth) AS n_true,
           (SELECT count(*) FROM wsel) AS n_winnow,
           (SELECT count(*) FROM truth t JOIN wsel w
              ON t.id_a = w.id_a AND t.id_b = w.id_b) AS n_both
    """,
)
def dedup_winnowing_quality(spark, sf_dir):
    """Candidate-quality harness for winnowing (the X151 analogue of
    dedup_lsh_candidate_quality): winnowing pairs at fingerprint-Jaccard
    >= 0.5 vs the EXACT char-3-gram Jaccard >= 0.5 truth on the doc_id
    < 200 slice — n_true / n_winnow / n_both quantify how the
    exact-LOCAL guarantee translates to global-similarity recall
    (winnowing certifies shared runs, not global overlap, so the gap IS
    the documented semantics, measured not hand-waved). Truth is the
    quadratic all-pairs definition; Spark computes it via the bounded
    crossJoin verify stage, DuckDB natively."""
    from zparse_spark.operators.dedup import ngram_jaccard_pairs, winnowing_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = (
        winnowing_pairs(d, k=8, w=4, threshold=0.5)
        .filter((F.col("id_a") < 200) & (F.col("id_b") < 200))
        .select("id_a", "id_b")
    )
    slice_ = d.filter(F.col("doc_id") < 200)
    ids = slice_.select(F.col("doc_id").alias("id_a"))
    ids_b = slice_.select(F.col("doc_id").alias("id_b"))
    cands = ids.crossJoin(ids_b).filter(F.col("id_a") < F.col("id_b"))
    truth = ngram_jaccard_pairs(slice_, cands, k_shingle=3, mode="char", threshold=0.5).select(
        "id_a", "id_b"
    )
    both = truth.join(w, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_both"))
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(w.agg(F.count(F.lit(1)).alias("n_winnow")))
        .crossJoin(both)
    )


# fixed boilerplate paragraphs planted for chunk-level dedup: B60 is 3
# exact 20-word chunks; B40 is its 40-word prefix (2 chunks), so the
# planted docs share chunk content at aligned offsets in BOTH engines
_B60 = " ".join(f"b{i:02d}" for i in range(1, 61))
_B40 = " ".join(f"b{i:02d}" for i in range(1, 41))


def _chunk_dedup_oracle_sql() -> str:
    return f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN '{_B60}'
                  WHEN doc_id % 10 = 5 THEN '{_B40}'
                  ELSE text END AS text
      FROM documents
    ),
    base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM planted WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(words, i*20 + 1, i*20 + 20), ' ') AS chunk
      FROM base, UNNEST(generate_series(0, CAST(ceil(len(words) / 20.0) AS INT) - 1)) AS t(i)
    ),
    ranked AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rk
      FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks_total,
           count(*) FILTER (WHERE rk = 1) AS n_chunks_kept,
           md5(coalesce(
             string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rk = 1), ''
           )) AS dedup_hash
    FROM ranked GROUP BY doc_id
    """


@register("dedup_chunks_global", _chunk_dedup_oracle_sql())
def dedup_chunks_global(spark, sf_dir):
    """Sub-document global dedup: every 20-word chunk kept only at its
    first corpus occurrence (C4/RefinedWeb repeated-substring removal —
    what document-level dedup misses). Fixture plants a 60-word
    boilerplate paragraph as every 10th doc's text and its 40-word
    prefix as every (10k+5)th doc's, so the oracle sees cross-doc full
    AND partial chunk duplication at aligned offsets: doc 0 keeps all
    3 planted chunks, every other planted doc keeps 0 (md5('') path).
    The value-matched dedup_hash pins the full reassembly, not just
    counts (see operators/dedup.py::chunk_dedup for the 100 TB shape).
    """
    from zparse_spark.operators.dedup import chunk_dedup

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.lit(_B60))
        .when(F.col("doc_id") % 10 == 5, F.lit(_B40))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return chunk_dedup(d, chunk_words=20)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "embedding_norm_stats",
    """
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norm_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.zip_with(vec, vec, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
    )
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg(norm), 4).alias("avg_norm")
    )


@register(
    "embedding_quantization",
    """
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             coalesce(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 0.0) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, v, scale,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER))
                  ELSE list_transform(v, x -> 0) END AS qv
      FROM s
    ),
    d AS (SELECT *, list_transform(qv, x -> x * scale / 127.0) AS dq FROM q)
    SELECT vec_id, round(scale, 6) AS scale_r,
           coalesce(CAST(list_sum(qv) AS BIGINT), 0) AS q_sum,
           list_min(qv) AS q_min, list_max(qv) AS q_max,
           md5(array_to_string(qv, ',')) AS q_hash,
           CASE WHEN scale > 0 THEN
             list_dot_product(v, dq)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dq, dq))) >= 0.995
           END AS within_tol
    FROM d
    """,
)
def embedding_quantization(spark, sf_dir):
    """int8 scalar quantization of the embedding corpus: the quantized
    arrays themselves are value-matched via md5 checksum (floor/div are
    exact IEEE, so both engines produce bit-identical grids — the
    property that makes a quantized index reproducible), and the
    dequantized cosine against the original must stay ≥ 0.995 per
    vector (the recall-preservation gate; rounding error is ≲0.4% of
    max amplitude per component). Map-only array expressions — at 10^9
    vectors this is the 4× memory-bandwidth cut for every brute-force /
    IVF scan downstream."""
    from zparse_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qd = dequantize_embeddings(quantize_embeddings(e))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, t: s + t)

    cos = dot(v, F.col("dq")) / (F.sqrt(dot(v, v)) * F.sqrt(dot(F.col("dq"), F.col("dq"))))
    return qd.select(
        "vec_id",
        F.round("scale", 6).alias("scale_r"),
        F.coalesce(
            F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda s, x: s + x), F.lit(0)
        ).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        F.md5(F.array_join(F.transform(F.col("q"), lambda x: x.cast("string")), ",")).alias(
            "q_hash"
        ),
        F.when(F.col("scale") > 0, cos >= 0.995).alias("within_tol"),
    )


@register(
    "similarity_quantized_topk",
    """
    WITH qset AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings ORDER BY vec_id LIMIT 5
    ),
    s AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             coalesce(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 0.0) AS scale
      FROM embeddings
    ),
    g AS (
      SELECT vec_id, v,
             list_transform(v, x -> CAST(CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER) AS DOUBLE)) AS qd
      FROM s WHERE scale > 0
    ),
    s1 AS (
      SELECT q.query_id, g.vec_id AS corpus_id, g.v,
             round(list_cosine_similarity(g.qd, q.qv), 6) AS quantized_cosine
      FROM g, qset q
    ),
    c1 AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY quantized_cosine DESC, corpus_id) AS r
      FROM s1
    ),
    cand AS (SELECT query_id, corpus_id, v, quantized_cosine FROM c1 WHERE r <= 20),
    re AS (
      SELECT cand.query_id, corpus_id, quantized_cosine,
             round(list_cosine_similarity(q.qv, cand.v), 6) AS cosine
      FROM cand JOIN qset q ON q.query_id = cand.query_id
    ),
    rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
      FROM re
    )
    SELECT query_id, corpus_id, quantized_cosine, cosine, rank FROM rk WHERE rank <= 5
    """,
)
def similarity_quantized_topk(spark, sf_dir):
    """Two-stage quantized ANN end-to-end: the int8 grid (scale cancels
    out of cosine) ranks the full scan at 1/4 the bytes, k·rerank=20
    candidates re-score exact per query via a broadcast-candidate
    equi-join, final exact top-5. Both ranks order by the
    6-decimal-rounded score + corpus_id tiebreak, so the candidate set
    is engine-portable; impl='expr' pinned here so the fold matches
    DuckDB (the X4/IVF precedent), 'arrow' is the production int8
    matmul."""
    from zparse_spark.operators.similarity import quantized_topk

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = e.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return quantized_topk(e, qs, k=5, rerank=4, impl="expr")


@register(
    "similarity_topk_embeddings",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      FROM q, embeddings c
    ), ranked AS (
      SELECT query_id, corpus_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, round(cos, 6) AS cosine, rank
    FROM ranked WHERE rank <= 5
    """,
)
def similarity_topk_embeddings(spark, sf_dir):
    from zparse_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = (
        e.orderBy("vec_id").limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return brute_force_topk(e, queries, k=5)


def _lsh_ann_oracle_sql(n_planes: int = 6, k: int = 5) -> str:
    """The LSH-ANN twin: hyperplane signatures are seeded plan literals
    (same doubles emitted into SQL), bucket = MSB-first bit fold, probes
    = bucket plus its hamming-1 xor flips — every stage DuckDB-exact."""
    from zparse_spark.operators.dedup import _hyperplanes

    planes = _hyperplanes(64, n_planes, 42)
    bucket = " + ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(w) for w in p)
        + f"]) > 0 THEN {1 << (n_planes - 1 - j)} ELSE 0 END)"
        for j, p in enumerate(planes)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << b})" for b in range(n_planes)]
    )
    return f"""WITH input AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
sig AS (SELECT vec_id, v, ({bucket}) AS bucket FROM input),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sig ORDER BY vec_id LIMIT 5),
probes AS (SELECT query_id, qv, unnest([{probes}]) AS bucket FROM q),
cand AS (
  SELECT p.query_id, s.vec_id AS corpus_id,
         list_dot_product(p.qv, s.v)
           / greatest(sqrt(list_dot_product(p.qv, p.qv))
                      * sqrt(list_dot_product(s.v, s.v)), 1e-12) AS c
  FROM probes p JOIN sig s ON s.bucket = p.bucket
),
ranked AS (
  SELECT query_id, corpus_id, c,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, corpus_id ASC) AS rank
  FROM cand
)
SELECT query_id, corpus_id, round(c, 6) AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""


_BF_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      FROM q, embeddings c
    ), ranked AS (
      SELECT query_id, corpus_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id FROM ranked WHERE rank <= 5
"""


@register(
    "similarity_lsh_recall",
    f"""WITH bf AS ({_BF_TOPK_SQL}),
lsh AS (SELECT query_id, corpus_id FROM ({_lsh_ann_oracle_sql()})),
hits AS (
  SELECT bf.query_id, count(*) AS n
  FROM bf JOIN lsh USING (query_id, corpus_id) GROUP BY 1
)
SELECT q.query_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n, 0) / 5.0, 6) AS recall_at_5
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN hits h USING (query_id)""",
)
def similarity_lsh_recall(spark, sf_dir):
    """ANN quality monitoring: recall@5 of the LSH-bucketed top-k
    against the exact brute-force top-k, per query — THE standard
    ANN acceptance metric, here value-oracled end to end because both
    retrieval paths (hyperplane literals, hamming-1 multiprobe, tie
    ordering) are reproduced exactly by the DuckDB twin. Scale shape:
    both sides are broadcast-query plans over one corpus scan each;
    the recall join touches only 25 rows."""
    from zparse_spark.operators.similarity import brute_force_topk, lsh_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = (
        e.orderBy("vec_id").limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    )
    bf = brute_force_topk(e, queries, k=5)
    lsh = lsh_topk(e, queries, k=5, n_planes=6)
    hits = (
        bf.join(lsh.select("query_id", "corpus_id"), ["query_id", "corpus_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(F.coalesce("n", F.lit(0)) / 5.0, 6).alias("recall_at_5"),
        )
    )


@register("similarity_lsh_topk_embeddings", _lsh_ann_oracle_sql())
def similarity_lsh_topk_embeddings(spark, sf_dir):
    """LSH-bucketed ANN top-k — bucketing, hamming-1 multiprobe, and
    cosine re-rank reproduced by DuckDB from the identical hyperplane
    literals (recall vs brute force additionally asserted in pytest)."""
    from zparse_spark.operators.similarity import lsh_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = (
        e.orderBy("vec_id").limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return lsh_topk(e, queries, k=5, n_planes=6)


# ---------------------------------------------------------------------------
# Event-stream analytics (batch shape of the streaming ops)
# ---------------------------------------------------------------------------


@register(
    "events_hourly_counts",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


# ---------------------------------------------------------------------------
# JSON parsing surface (from_json — the lib.rs:69-87 analog): events.props
# ---------------------------------------------------------------------------


@register(
    "events_props_json",
    """
    SELECT round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
           count(CASE WHEN json_valid(props) THEN 1 END) AS n_valid_json
    FROM events
    """,
)
def events_props_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.agg(
        F.round(F.avg(parsed["k"]), 4).alias("avg_k"),
        F.count(F.when(parsed.isNotNull(), 1)).alias("n_valid_json"),
    )


# ---------------------------------------------------------------------------
# Broader relational coverage: multi-join, simple predicate agg, approx
# ---------------------------------------------------------------------------


@register(
    "tpch_q5_region_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def tpch_q5_region_revenue(spark, sf_dir):
    """Five-table star join: dims broadcast (customer/nation/region are
    tiny), the only shuffles are fact-side groupBy."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Pure filter+agg: every predicate pushes to the parquet scan."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "approx_distinct_tolerance",
    """
    SELECT count(DISTINCT l_partkey) AS exact_distinct,
           true AS approx_within_5pct
    FROM lineitem
    """,
)
def approx_distinct_tolerance(spark, sf_dir):
    """A11 cardinality sanity: HLL approx_count_distinct must land within
    5% of exact. The boolean (not the approx value, which differs by
    sketch implementation across engines) is the oracle-stable output."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("exact_distinct"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey"))
            / F.countDistinct("l_partkey")
            < 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "corpus_split_windows",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(coalesce(text, ''))) > 0
                  THEN string_split_regex(trim(coalesce(text, '')), '\s+')
                  ELSE [] END AS toks
      FROM documents
    ),
    w AS (
      SELECT doc_id, len(toks) AS n, toks,
             unnest(range(0, greatest(len(toks), 1), 30)) AS start,
             generate_subscripts(range(0, greatest(len(toks), 1), 30), 1) - 1 AS window_pos
      FROM t
    )
    SELECT doc_id, CAST(window_pos AS INT) AS window_pos,
           CAST(least(40, n - start) AS INT) AS n_tokens,
           array_to_string(toks[start + 1 : start + 40], ' ') AS window_text
    FROM w WHERE start < n
    """,
)
def corpus_split_windows(spark, sf_dir):
    """Training-example chunker: every document cut into 40-token
    windows at stride 30 (10-token overlap), last window short, empty
    docs dropped — pure array expressions + one explode, map-only (see
    split_into_windows). The oracle recomputes every window's exact
    re-joined text, so slice arithmetic and tokenization agree
    token-for-token cross-engine."""
    from zparse_spark.operators.filtering import split_into_windows

    d = _t(spark, sf_dir, "documents")
    return split_into_windows(d, window=40, stride=30)


_Z_BITS = 8
_Z_TERMS = " + ".join(
    f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
    for b in range(_Z_BITS)
)


@register(
    "layout_zorder_values",
    f"""
    WITH g AS (
      SELECT l_orderkey, l_linenumber,
             l_orderkey % 256 AS x, l_suppkey % 256 AS y
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, ({_Z_TERMS}) AS z_value
    FROM g
    """,
)
def layout_zorder_values(spark, sf_dir):
    """Z-order (Morton) interleave as plain shift/mask arithmetic — the
    clustering key behind multi-dimensional min-max pruning
    (``cluster_by_zorder`` range-shuffles on it so every output file
    covers a tight z-interval; a query box then opens O(perimeter)
    files). Map-only, whole-stage codegen, bit-identical in any SQL
    engine — which is the property this oracle certifies."""
    from zparse_spark.operators.layout import zorder_value

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_value(
            [F.pmod(F.col("l_orderkey"), F.lit(256)), F.pmod(F.col("l_suppkey"), F.lit(256))],
            bits=_Z_BITS,
        ).alias("z_value"),
    )


@register(
    "corpus_domain_profile",
    r"""
    WITH t AS (
      SELECT doc_id,
             coalesce(text, '')
             || CASE WHEN doc_id % 3 = 0
                     THEN ' see https://site' || (doc_id % 7) || '.example.com/p/' || (doc_id % 13)
                     ELSE '' END
             || CASE WHEN doc_id % 9 = 0
                     THEN ' and http://mirror' || (doc_id % 5) || '.example.org'
                     ELSE '' END AS text2
      FROM documents
    ),
    ex AS (
      SELECT doc_id, unnest(regexp_extract_all(text2, 'https?://[A-Za-z0-9.-]+(?:/\S*)?')) AS url
      FROM t
    )
    SELECT regexp_extract(url, 'https?://([^/\s]+)', 1) AS domain,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_urls,
           count(DISTINCT url) AS n_distinct_urls
    FROM ex GROUP BY 1
    """,
)
def corpus_domain_profile(spark, sf_dir):
    """Per-domain provenance profile (the C4/RefinedWeb bookkeeping that
    drives per-domain quality decisions): URLs planted deterministically
    into the synthetic texts, extracted with the portable URL grammar
    (one codegen regexp pass, no Python), domain keyed by host. One
    explode + one groupBy(domain) — count aggregates combine map-side,
    so a hot domain (half the web is a handful of hosts) never
    concentrates raw rows on one reducer."""
    from zparse_spark.functions.text import extract_urls, url_domain

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    text2 = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" see https://site"), (did % 7).cast("string"),
                F.lit(".example.com/p/"), (did % 13).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 9 == 0,
            F.concat(
                F.lit(" and http://mirror"), (did % 5).cast("string"),
                F.lit(".example.org"),
            ),
        ).otherwise(F.lit("")),
    )
    ex = d.select("doc_id", F.explode(extract_urls(text2)).alias("url"))
    return ex.groupBy(url_domain(F.col("url")).alias("domain")).agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").alias("n_distinct_urls"),
    )


_TD_PROBS = [0.1, 0.5, 0.9, 0.99]
_TD_TOL = 0.02


@register(
    "quantiles_tdigest_tolerance",
    "\nUNION ALL\n".join(
        f"""SELECT CAST({p} AS DOUBLE) AS prob,
           round(quantile_cont(l_extendedprice, {p}), 6) AS exact_value,
           true AS within_tol
    FROM lineitem"""
        for p in _TD_PROBS
    ),
)
def quantiles_tdigest_tolerance(spark, sf_dir):
    """The north-star's t-digest quantile sketch, oracle-gated the way
    sketches can be (the approx_distinct_tolerance pattern): the
    distributed sketch (applyInPandas partial digests per hash bucket →
    one bounded merge task, no driver collect) must land within 2% rel
    error of the exact interpolated quantile at every probe — the exact
    value (Spark percentile ≡ DuckDB quantile_cont, the
    outliers_quantity_iqr contract) is the value-matched column, the
    boolean is the sketch gate. Sketch cost: one scan + ≤ n_partials
    Arrow tasks + one delta-bounded merge; the exact percentile here
    exists only to judge it and would be the thing a 10^12-row job
    cannot afford."""
    from zparse_spark.operators.stats import tdigest_quantiles_df

    li = _t(spark, sf_dir, "lineitem")
    td = tdigest_quantiles_df(li, "l_extendedprice", _TD_PROBS)
    wide = li.agg(
        *[
            F.expr(f"percentile(l_extendedprice, {p})").alias(f"_e{i}")
            for i, p in enumerate(_TD_PROBS)
        ]
    )
    stack = ", ".join(f"{p}D, `_e{i}`" for i, p in enumerate(_TD_PROBS))
    exact = wide.selectExpr(f"stack({len(_TD_PROBS)}, {stack}) as (prob, exact)")
    return (
        td.join(exact, "prob")
        .select(
            "prob",
            F.round("exact", 6).alias("exact_value"),
            (
                F.abs(F.col("value") - F.col("exact"))
                / F.greatest(F.abs("exact"), F.lit(1.0))
                <= _TD_TOL
            ).alias("within_tol"),
        )
    )


@register(
    "quantiles_tdigest_grouped",
    "\nUNION ALL\n".join(
        f"""SELECT lang, CAST({p} AS DOUBLE) AS prob,
           round(quantile_cont(n_chars, {p}), 6) AS exact_value,
           true AS within_tol
    FROM documents WHERE lang IS NOT NULL GROUP BY lang"""
        for p in _TD_PROBS
    ),
)
def quantiles_tdigest_grouped(spark, sf_dir):
    """Per-group t-digest (X74): each lang's n_chars distribution
    sketched in ONE grouped applyInPandas stage. The gate is RANK error
    — the bound t-digest actually guarantees (≈4q(1−q)/δ on the
    quantile, NOT on the value, which is unbounded where density is
    low: the first cut of this query gated |Δvalue| ≤ 2% and a sparse
    p=0.1 'de' tail measured 5.9%): the sketched value's empirical rank
    within its group must sit within ±0.015 of the probe (measured
    ≤ 0.007 across all 20 cells at δ=200). The exact interpolated
    quantile (percentile ≡ quantile_cont) is the value-matched column;
    the rank check re-scans docs against the broadcast 20-row sketch."""
    from zparse_spark.operators.stats import tdigest_quantiles_grouped

    d = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    td = tdigest_quantiles_grouped(d, "n_chars", "lang", _TD_PROBS)
    rank_hat = (
        d.join(F.broadcast(td), "lang")
        .groupBy("lang", "prob")
        .agg(
            (
                F.sum((F.col("n_chars") <= F.col("value")).cast("long")) / F.count(F.lit(1))
            ).alias("_rank_hat")
        )
    )
    wide = d.groupBy("lang").agg(
        *[
            F.expr(f"percentile(n_chars, {p})").alias(f"_e{i}")
            for i, p in enumerate(_TD_PROBS)
        ]
    )
    stack = ", ".join(f"{p}D, `_e{i}`" for i, p in enumerate(_TD_PROBS))
    exact = wide.selectExpr("lang", f"stack({len(_TD_PROBS)}, {stack}) as (prob, exact)")
    return rank_hat.join(exact, ["lang", "prob"]).select(
        "lang",
        "prob",
        F.round("exact", 6).alias("exact_value"),
        (F.abs(F.col("_rank_hat") - F.col("prob")) <= 0.015).alias("within_tol"),
    )


@register(
    "delta_documents_snapshot",
    """
    WITH old_snap AS (
      SELECT doc_id, md5(concat_ws(chr(1), text, lang, source)) AS fp FROM documents
    ),
    new_snap AS (
      SELECT doc_id,
             md5(concat_ws(chr(1),
                 CASE WHEN doc_id % 31 = 5 THEN text || '!' ELSE text END,
                 lang, source)) AS fp
      FROM documents WHERE doc_id % 97 <> 3
      UNION ALL
      SELECT doc_id + 10000000, md5(concat_ws(chr(1), text, lang, source))
      FROM documents WHERE doc_id % 101 = 7
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed' END AS change
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp
    """,
)
def delta_documents_snapshot(spark, sf_dir):
    """Snapshot diff for incremental re-validation: classify ids as
    added/removed/changed between two corpus versions by joining 16-byte
    row fingerprints (shuffle O(ids), never payload bytes) — the rule
    pack then re-runs only on added ∪ changed. The 'new' snapshot is a
    deterministic mutation of the same table (drop %97, edit %31, add
    %101 under shifted ids) so both engines derive identical versions."""
    from zparse_spark.operators.canonical import snapshot_diff

    d = _t(spark, sf_dir, "documents")
    changed_text = F.when(
        F.col("doc_id") % 31 == 5, F.concat(F.col("text"), F.lit("!"))
    ).otherwise(F.col("text"))
    new = (
        d.filter(F.col("doc_id") % 97 != 3)
        .withColumn("text", changed_text)
        .unionByName(
            d.filter(F.col("doc_id") % 101 == 7).withColumn(
                "doc_id", F.col("doc_id") + 10000000
            )
        )
    )
    fp = F.md5(F.concat_ws("\x01", "text", "lang", "source"))
    return snapshot_diff(d, new, fingerprint=fp)


@register(
    "stats_heavy_hitters_events",
    """
    SELECT event_type, count(*) AS freq
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type
    HAVING count(*) * 11 > (SELECT count(*) FROM events WHERE event_type IS NOT NULL)
    """,
)
def stats_heavy_hitters_events(spark, sf_dir):
    """Exact heavy hitters (freq > n/(k+1)) via two-pass Misra–Gries:
    a map-only k-counter sketch per partition (≤k candidates each, a
    provable superset of the true heavy hitters), then an exact recount
    restricted to the broadcast candidate set. The shuffle is bounded
    by tasks×k rows regardless of column cardinality — the shape that
    replaces groupBy-the-whole-domain on URL/shingle-sized columns at
    100 TB. Output is exact, hence SQL-oracle-able."""
    from zparse_spark.operators.stats import heavy_hitters

    return heavy_hitters(_t(spark, sf_dir, "events"), "event_type", k=10)


@register(
    "corpus_vocabulary",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    agg AS (
      SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM toks WHERE token <> '' GROUP BY token
    )
    SELECT token, tf, df FROM agg WHERE df >= 2
    ORDER BY df DESC, tf DESC, token ASC LIMIT 200
    """,
)
def corpus_vocabulary(spark, sf_dir):
    """Corpus vocabulary: exact term frequency + document frequency per
    whitespace token, min_df-pruned, top-200 under a deterministic
    total order (df desc, tf desc, token asc — token is unique, so the
    LIMIT selects a well-defined SET). tf+df ride one groupBy with
    Spark's two-phase distinct expand; min_df drops the hapax tail
    post-agg; top_n is TakeOrdered, never a global sort of the full
    vocabulary (see functions/text.py::build_vocabulary)."""
    from zparse_spark.functions.text import build_vocabulary

    return build_vocabulary(
        _t(spark, sf_dir, "documents"), min_df=2, top_n=200
    )


@register(
    "doc_unicode_signals",
    """
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL ELSE
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' caf' || chr(233) || ' ' || chr(65533) ELSE '' END
               || CASE WHEN doc_id % 7 = 0 THEN ' e' || chr(769) ELSE '' END
               || CASE WHEN doc_id % 11 = 0 THEN chr(7) ELSE '' END
             END AS text
      FROM documents
    )
    SELECT doc_id,
           length(text) - length(regexp_replace(text, chr(65533), '', 'g'))
             AS n_replacement,
           length(text) - length(regexp_replace(
             text, '[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))
             AS n_control,
           length(text) - length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
             AS n_non_ascii,
           CAST(nfc_normalize(text) <> text AS INT) AS nfc_changed
    FROM planted
    """,
)
def doc_unicode_signals(spark, sf_dir):
    """Encoding-health signals with planted damage (every 5th doc gets
    a lossy-transcode marker + non-ASCII, every 7th a decomposed
    combining sequence NFC recomposes, every 11th a C0 control). The
    NFC path runs through pandas' normalizer on Spark and DuckDB's
    nfc_normalize on the oracle — two independent Unicode
    implementations agreeing is the check. See
    functions/text.py::unicode_signals for the map-only shape."""
    from zparse_spark.functions.text import unicode_signals

    t = F.col("text")
    planted = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(t.isNull(), F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                t,
                F.when(F.col("doc_id") % 5 == 0, F.lit(" caf\u00e9 \ufffd")).otherwise(
                    F.lit("")
                ),
                F.when(F.col("doc_id") % 7 == 0, F.lit(" e\u0301")).otherwise(F.lit("")),
                F.when(F.col("doc_id") % 11 == 0, F.lit("\x07")).otherwise(F.lit("")),
            )
        )
        .alias("text"),
    )
    return unicode_signals(planted)


@register(
    "corpus_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    clean AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM clean GROUP BY 1, 2),
    docfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM clean GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM clean),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, docfreq.df,
             round(tf.tf * ln((1.0 + n.n) / (1.0 + docfreq.df)), 6) AS score
      FROM tf JOIN docfreq USING (token) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, token, tf, df, score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, token ASC
             ) AS term_rank
      FROM scored
    )
    SELECT doc_id, term_rank, token, tf, df, score
    FROM ranked WHERE term_rank <= 3
    """,
)
def corpus_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (smoothed idf, rounded score
    drives a deterministic rank). Two aggregates over the token stream
    + a reduced-domain equi-join + a per-doc bounded window — see
    functions/text.py::tfidf_top_terms for the 100 TB shape."""
    from zparse_spark.functions.text import tfidf_top_terms

    out = tfidf_top_terms(_t(spark, sf_dir, "documents"), top_k=3)
    return out.withColumnRenamed("rank", "term_rank")


@register(
    "fd_documents_source_lang",
    """
    WITH pairs AS (
      SELECT DISTINCT source, lang FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL
    ),
    counts AS (
      SELECT source, count(*) AS n_variants FROM pairs
      GROUP BY source HAVING count(*) > 1
    ),
    ranked AS (
      SELECT source, lang,
             row_number() OVER (PARTITION BY source ORDER BY lang) AS rk
      FROM pairs
    )
    SELECT c.source, c.n_variants,
           string_agg(r.lang, ',' ORDER BY r.lang) AS variants
    FROM counts c JOIN ranked r ON r.source = c.source AND r.rk <= 8
    GROUP BY c.source, c.n_variants
    """,
)
def fd_documents_source_lang(spark, sf_dir):
    """Functional-dependency check source → lang over documents: every
    violating determinant with its exact variant count and the first 8
    sorted variants. Scale shape: distinct (X,Y) pairs are the only
    full-data shuffle; the example window runs on the violation-sparse
    semi-joined pair set, so per-key state is bounded by max_examples
    even for pathological hot keys (see
    operators/rules.py::functional_dependency_violations)."""
    from zparse_spark.operators.rules import functional_dependency_violations

    return functional_dependency_violations(
        _t(spark, sf_dir, "documents"), "source", "lang", max_examples=8
    )


# ---------------------------------------------------------------------------
# As-of join (custom operator: union+window, oracled vs DuckDB ASOF JOIN)
# + pivot / rollup coverage
# ---------------------------------------------------------------------------


@register(
    "asof_events_purchase",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), joined AS (
      SELECT c.user_id, c.event_id, p.value AS last_purchase_value
      FROM clicks c
      ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
    )
    SELECT user_id,
           count(*) AS n_clicks,
           count(last_purchase_value) AS clicks_after_purchase,
           round(sum(coalesce(last_purchase_value, 0)), 4) AS sum_last_purchase
    FROM joined GROUP BY user_id
    """,
)
def asof_events_purchase(spark, sf_dir):
    """For every click, the user's most recent prior (or simultaneous)
    purchase value — asof_join via union+window (one shuffle), aggregated
    per user so float ordering can't destabilize the hash."""
    from zparse_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(clicks, purchases, on="ts", by="user_id")
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("asof_purchase_value").alias("clicks_after_purchase"),
        F.round(F.sum(F.coalesce("asof_purchase_value", F.lit(0.0))), 4).alias(
            "sum_last_purchase"
        ),
    )


@register(
    "pivot_lineitem_status",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_lineitem_status(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
    )


@register(
    "rollup_orders_priority",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rollup_orders_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total",
        )
    )


@register(
    "sql_customer_segments",
    """
    SELECT c_mktsegment AS segment,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           count(*) AS n,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY 1, 2
    """,
)
def sql_customer_segments(spark, sf_dir):
    """SQL-API surface: the engine accepts spark.sql text verbatim —
    Catalyst produces the same plan as the DataFrame API."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_mktsegment AS segment,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'low'
                    ELSE 'high' END AS balance_band,
               count(*) AS n,
               round(avg(c_acctbal), 4) AS avg_bal
        FROM customer_v
        GROUP BY 1, 2
        """
    )


@register(
    "doc_xml_escape_roundtrip",
    """
    WITH esc AS (
      SELECT lang, text,
             replace(replace(replace(replace(replace(text,
               '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), chr(39), '&apos;') AS e
      FROM documents WHERE text IS NOT NULL
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN replace(replace(replace(replace(replace(e,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', chr(39)), '&amp;', '&') = text
             THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
           min(md5(e)) AS min_escaped_md5
    FROM esc GROUP BY lang
    """,
)
def doc_xml_escape_roundtrip(spark, sf_dir):
    """XML entity escape parity: byte-identical escaped text (md5) and a
    full unescape roundtrip, vs DuckDB's replace-chain twin. The Spark
    side runs the real tokenizing decoder (numeric entities included);
    escape output contains only named entities, so the chains agree."""
    from zparse_spark.functions.convert import xml_escape, xml_unescape

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    e = xml_escape(F.col("text"))
    return d.select("lang", e.alias("e"), "text").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(xml_unescape(F.col("e")) == F.col("text"), 1).otherwise(0))
        .cast("long")
        .alias("n_roundtrip"),
        F.min(F.md5("e")).alias("min_escaped_md5"),
    )


@register(
    "doc_xml_dup_attrs",
    """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CASE WHEN doc_id % 5 = 0 THEN 'a' END AS dup_attr,
           CASE WHEN doc_id % 5 = 0 THEN 'DuplicateKey' END AS kind,
           CASE WHEN doc_id % 5 = 0 THEN NULL ELSE '1' END AS a_val,
           CASE WHEN doc_id % 5 = 0 THEN NULL
                ELSE trim(substr(text, 1, 8)) END AS t
    FROM documents WHERE text IS NOT NULL
    """,
)
def doc_xml_dup_attrs(spark, sf_dir):
    """XML ingest duplicate-attribute rejection (xml/parser.rs:175-177:
    the reference errors with DuplicateKey; Spark's from_xml ALSO
    rejects — the whole row parses to NULLs — but silently and without
    attribution). Every 5th document's XML is planted with a duplicated
    ``a`` attribute; ``from_xml_lines(flag_duplicate_attrs=True)`` must
    flag exactly those rows (kind DuplicateKey) so the anonymous
    all-NULL parse becomes an attributed violation row — the
    collect-don't-abort table analog of the reference's hard error.
    Detection is pure JVM regexp/HOF expressions; the DuckDB twin
    recomputes the planted truth directly (with trim(): from_xml's
    ignoreSurroundingSpaces default strips element-text edge
    whitespace; parsed fields are NULL on the flagged rows)."""
    from zparse_spark.functions.convert import from_xml_lines, xml_escape

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    esc = xml_escape(F.substring("text", 1, 8))
    dup = F.col("doc_id") % 5 == 0
    xml = F.concat(
        F.lit('<r a="1" b="'),
        F.col("lang"),
        F.when(dup, F.lit('" a="2')).otherwise(F.lit("")),
        F.lit('"><t>'),
        esc,
        F.lit("</t></r>"),
    )
    parsed = from_xml_lines(
        d.select(F.col("doc_id").cast("string").alias("doc_id"), xml.alias("xml")),
        "_a string, _b string, t string",
        flag_duplicate_attrs=True,
    )
    return parsed.select(
        "doc_id",
        F.col("_dup_attr").alias("dup_attr"),
        F.when(F.col("_dup_attr").isNotNull(), F.lit("DuplicateKey")).alias("kind"),
        F.col("_a").alias("a_val"),
        "t",
    )


# span-pack oracle queries register themselves on import (kept in a
# separate module: the SQL twins of the engine rules are sizeable)
from zparse_spark import queries_span  # noqa: E402,F401  (registration side effect)
from zparse_spark import queries_lsh  # noqa: E402,F401  (registration side effect)
from zparse_spark import queries_media  # noqa: E402,F401  (registration side effect)
from zparse_spark import queries_stream  # noqa: E402,F401  (registration side effect)


_FILTER_QUALITY_SQL = """
      round(greatest(least(
        0.4 * least(length(t) / 200.0, 1.0)
        + 0.2 * (1 - least(CAST(len(regexp_extract_all(t, '[!-/:-@\\[-`{-~]')) AS DOUBLE)
                           / greatest(length(t), 1) * 5, 1.0))
        + 0.2 * (1 - least(CAST(len(regexp_extract_all(t, '[A-Z]')) AS DOUBLE)
                           / greatest(length(t), 1) * 5, 1.0))
        + 0.2 * least(CAST(len(list_filter(regexp_split_to_array(lower(trim(t)), '\\s+'),
                                w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE)
                      / greatest(len(regexp_split_to_array(lower(trim(t)), '\\s+')), 1) * 5, 1.0)
      , 1.0), 0.0), 6)
"""


@register(
    "corpus_filter_report",
    f"""
    WITH base AS (SELECT coalesce(text, '') AS t FROM documents),
    ann AS (
      SELECT
        CASE WHEN length(trim(t)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(t), '\\s+')) END AS tokens,
        {_FILTER_QUALITY_SQL} AS q,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('the','and','is','of'))) AS s_en,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('el','la','que','los'))) AS s_es,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('der','die','und','das'))) AS s_de,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('le','les','des','est'))) AS s_fr
      FROM base
    ), decided AS (
      SELECT CASE
        WHEN tokens < 10 THEN 'too_short'
        WHEN tokens > 100000 THEN 'too_long'
        WHEN q < 0.3 THEN 'low_quality'
        WHEN (CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                   WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
                   WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
                   WHEN s_fr > 0 THEN 'fr'
                   ELSE 'und' END) <> 'en' THEN 'wrong_lang'
        ELSE 'kept' END AS outcome
      FROM ann
    )
    SELECT outcome, count(*) AS n FROM decided GROUP BY outcome
    """,
)
def corpus_filter_report(spark, sf_dir):
    """Training-data admission pipeline: token/quality/language gates in
    one map-only projection, rejection breakdown as the report — every
    gate formula reproduced by the DuckDB oracle."""
    from zparse_spark.operators.filtering import corpus_filter, filter_report

    d = _t(spark, sf_dir, "documents")
    return filter_report(corpus_filter(d))


# ---------------------------------------------------------------------------
# Decorrelation flagships: correlated EXISTS / NOT EXISTS (TPC-H q4/q21
# shapes adapted to the driver tables' columns). The Spark side is
# deliberately written as SQL with correlated subqueries so the oracle
# gate exercises Catalyst's decorrelation (RewritePredicateSubquery →
# left-semi / left-anti joins); tests/test_plans.py asserts the rewritten
# plans contain the semi/anti joins and no CartesianProduct.
# ---------------------------------------------------------------------------


def _register_tpch_views(spark, sf_dir):
    for t in ("orders", "lineitem", "supplier", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("tpch_q4_exists", _Q4_SQL)
def tpch_q4_exists(spark, sf_dir):
    """TPC-H q4 shape: per-priority order counts gated on a correlated
    EXISTS — Catalyst decorrelates to a left-semi join (plan-asserted);
    DuckDB runs the identical SQL."""
    _register_tpch_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND n.n_name IN ('NATION_3', 'NATION_7')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
"""


@register("tpch_q21_lite", _Q21_SQL)
def tpch_q21_lite(spark, sf_dir):
    """TPC-H q21 shape: the anti-join-heavy 'only late supplier of a
    finished order' query — one correlated EXISTS (semi), one correlated
    NOT EXISTS with an outer-column comparison (anti), three dimension
    joins, top-k. The NOT EXISTS references the OUTER query's
    o_orderdate inside the subquery predicate, the harder decorrelation
    case. (numwait, s_name) totally orders the result, so the LIMIT
    cutoff is deterministic cross-engine."""
    _register_tpch_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


# ---------------------------------------------------------------------------
# End-to-end training-set pipeline: filter → exact dedup → near-dup
# clusters → representatives. The COMPOSITION is the point: a user of
# the engine chains admission, exact dedup, MinHash clustering and the
# keep/drop action into one lazy plan, and the oracle re-derives every
# stage (filter gates, content-hash keep rule, md5-MinHash pipeline,
# recursive-CTE components) plus a per-stage id fingerprint.
# ---------------------------------------------------------------------------

_PIPE_T = 0.8


def _pipe_sql() -> str:
    from zparse_spark import queries_lsh as L

    stage_row = (
        "SELECT '{name}' AS stage, CAST(count(*) AS BIGINT) AS n_docs, "
        "md5(coalesce(string_agg(doc_id, ',' ORDER BY doc_id), '')) AS ids_md5 FROM {src}"
    )
    return f"""WITH RECURSIVE base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source AS part, text AS rawtext,
         n_chars, coalesce(text, '') AS t
  FROM documents
),
badkeys AS (
  SELECT DISTINCT part, doc_id FROM base
  WHERE n_chars <> length(rawtext)
     OR regexp_matches(rawtext, '[\\x00-\\x1f]')
     OR rawtext IS NULL OR length(rawtext) = 0
     OR n_chars > 500
),
clean AS (
  SELECT b.doc_id, b.t FROM base b
  LEFT JOIN badkeys k ON k.part = b.part AND k.doc_id = b.doc_id
  WHERE k.doc_id IS NULL
),
ann AS (
  SELECT doc_id, t,
        CASE WHEN length(trim(t)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(t), '\\s+')) END AS tokens,
        {_FILTER_QUALITY_SQL} AS q,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('the','and','is','of'))) AS s_en,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('el','la','que','los'))) AS s_es,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('der','die','und','das'))) AS s_de,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('le','les','des','est'))) AS s_fr
  FROM clean
),
decided AS (
  SELECT doc_id, t, CASE
        WHEN tokens < 10 THEN 'too_short'
        WHEN tokens > 100000 THEN 'too_long'
        WHEN q < 0.3 THEN 'low_quality'
        WHEN (CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                   WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
                   WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
                   WHEN s_fr > 0 THEN 'fr'
                   ELSE 'und' END) <> 'en' THEN 'wrong_lang'
        ELSE 'kept' END AS outcome
  FROM ann
),
admitted AS (SELECT doc_id, t FROM decided WHERE outcome = 'kept'),
hashed AS (
  SELECT doc_id, t,
         md5(lower(trim(regexp_replace(t, '\\s+', ' ', 'g')))) AS ch
  FROM admitted
),
after_exact AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, t, min(doc_id) OVER (PARTITION BY ch) AS k FROM hashed
  ) WHERE doc_id = k
),
input AS (SELECT doc_id, t AS text FROM after_exact){L._NORM_SH_TAIL},
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sig AS (
  SELECT doc_id,
         {L._min_cols}
  FROM ex GROUP BY doc_id
),
banded AS (
{L._band_rows}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
ver AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS j
  FROM cand
  JOIN sh a ON a.doc_id = cand.id_a
  JOIN sh b ON b.doc_id = cand.id_b
),
pairs AS (SELECT id_a, id_b FROM ver WHERE j >= {_PIPE_T}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, min(r) AS rep FROM reach GROUP BY node),
final AS (
  SELECT a.doc_id FROM after_exact a LEFT JOIN comp c ON c.node = a.doc_id
  WHERE c.rep IS NULL OR c.rep = a.doc_id
)
{stage_row.format(name='input', src='base')}
UNION ALL
{stage_row.format(name='clean', src='clean')}
UNION ALL
{stage_row.format(name='admitted', src='admitted')}
UNION ALL
{stage_row.format(name='after_exact', src='after_exact')}
UNION ALL
{stage_row.format(name='final', src='final')}"""


@register("pipeline_training_set", _pipe_sql())
def pipeline_training_set(spark, sf_dir):
    """Corpus → training set in one composed lazy plan: VALIDATION
    QUARANTINE GATE (error-severity rules route offending docs out of
    the pipeline; advisory rules are reported but never gate — the
    warn/error policy of partition_verdicts applied at ingestion),
    then admission filter (map-only), exact dedup (content-hash
    min-keep), md5-MinHash near-dup pairs, cluster resolution,
    keep-representatives — with per-stage doc counts AND an md5
    fingerprint over the sorted surviving ids, all re-derived
    stage-for-stage by DuckDB. The gate uses quarantine_split over the
    flat V-rule violations (partition = source, the violation
    attribution grain): V1/V2/V4/V5 (structural + the reference's hard
    MaxSizeExceeded, json/parser.rs:127-136) are error-severity and
    quarantine; V3 (lang whitelist) stays WARN — evaluated, never
    gating."""
    from zparse_spark.functions.text import normalize_text
    from zparse_spark.operators.dedup import (
        exact_duplicates,
        keep_representatives,
        minhash_dedup,
    )
    from zparse_spark.operators.filtering import corpus_filter
    from zparse_spark.plans.engine import quarantine_split

    dsrc = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("source").alias("partition"),
        F.col("text").alias("rawtext"),
        F.col("n_chars"),
        F.coalesce("text", F.lit("")).alias("text"),
    )
    d = dsrc.select("doc_id", "text")
    # flat V-rule violations at the (partition, doc_id) grain; V3 is
    # built too (warn severity) but deliberately excluded from the gate
    viol = (
        dsrc.filter(F.col("n_chars") != F.length("rawtext"))
        .select("partition", "doc_id", F.lit("V1").alias("rule_id"))
        .unionByName(
            dsrc.filter(F.col("rawtext").rlike("[\\x00-\\x1f]")).select(
                "partition", "doc_id", F.lit("V2").alias("rule_id")
            )
        )
        .unionByName(
            dsrc.filter(
                F.col("rawtext").isNull() | (F.length("rawtext") == 0)
            ).select("partition", "doc_id", F.lit("V4").alias("rule_id"))
        )
        .unionByName(
            dsrc.filter(F.col("n_chars") > 500).select(
                "partition", "doc_id", F.lit("V5").alias("rule_id")
            )
        )
    )
    clean_docs, _quarantined = quarantine_split(
        dsrc, viol, rule_ids=["V1", "V2", "V4", "V5"]
    )
    clean = clean_docs.select("doc_id", "text")
    admitted = corpus_filter(clean).filter("kept").select("doc_id", "text")
    groups = exact_duplicates(admitted).select(
        F.col("content_hash").alias("_ch"), "keep_id"
    )
    after_exact = (
        admitted.withColumn("_ch", F.md5(normalize_text(F.col("text"))))
        .join(groups, "_ch", "left")
        .filter(F.col("keep_id").isNull() | (F.col("doc_id") == F.col("keep_id")))
        .select("doc_id", "text")
    )
    pairs = minhash_dedup(
        after_exact, threshold=_PIPE_T, hash_fn="md5", max_bucket=0, seed=42
    ).select("id_a", "id_b")
    final = keep_representatives(after_exact, pairs)

    def stage(df, name):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))).alias(
                "ids_md5"
            ),
        ).select(F.lit(name).alias("stage"), "n_docs", "ids_md5")

    return (
        stage(d, "input")
        .unionByName(stage(clean, "clean"))
        .unionByName(stage(admitted, "admitted"))
        .unionByName(stage(after_exact, "after_exact"))
        .unionByName(stage(final, "final"))
    )


@register(
    "range_join_value_bands",
    """
    WITH bands AS (
      SELECT r AS band_id, CAST(r * 7.5 AS DOUBLE) AS lo,
             CAST(r * 7.5 + 12.0 AS DOUBLE) AS hi
      FROM unnest(range(31)) t(r)
    ),
    j AS (
      SELECT b.band_id, e.value
      FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi
    )
    SELECT band_id, count(*) AS n_points, round(sum(value), 2) AS sum_value
    FROM j GROUP BY band_id
    """,
)
def range_join_value_bands(spark, sf_dir):
    """Point-in-interval join via the shared-grid binning operator
    (range_join_binned: explode intervals onto bins, equi-join, exact
    filter — never a cross product; plan-asserted in test_asof) against
    DuckDB's native theta join over overlapping value bands."""
    from zparse_spark.operators.asof import range_join_binned

    events = _t(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.range(31).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 7.5).alias("lo"),
        (F.col("id") * 7.5 + 12.0).alias("hi"),
    )
    joined = range_join_binned(events, bands, "value", "lo", "hi", bin_width=10.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# JSONC ingest parity: comment/trailing-comma strip (lexer/json.rs:165-217)
# ---------------------------------------------------------------------------


def _jsonc_oracle_sql() -> str:
    """Built by concatenation (no f-string: the patterns and the JSON
    payload are brace-heavy). The regex literals are IMPORTED from the
    stripper itself and are single-quote-free, so they embed verbatim;
    DuckDB replacement groups are backslash-style where Spark uses $n."""
    from zparse_spark.functions.convert import (
        JSONC_COMMENT_PATTERN,
        JSONC_TRAILING_COMMA_PATTERN,
    )

    nl = " || chr(10) || "
    jsonc = (
        "'{'" + nl + "'  // line comment'" + nl
        + "'  \"name\": \"doc-' || CAST(doc_id AS VARCHAR) || '\", /* block'" + nl
        + "' comment */'" + nl
        + "'  \"note\": \"slash // and /* inside strings stay\",'" + nl
        + "'  \"n\": ' || CAST(n_chars AS VARCHAR) || ','" + nl
        + "'  \"arr\": [1, 2, 3,],'" + nl + "'}'"
    )
    return (
        "WITH src AS (\n"
        "  SELECT CAST(doc_id AS VARCHAR) AS doc_id,\n"
        "         " + jsonc + " AS jsonc\n"
        "  FROM documents\n"
        ")\n"
        "SELECT doc_id,\n"
        "       regexp_replace(regexp_replace(jsonc,\n"
        "         '" + JSONC_COMMENT_PATTERN + "', '\\1', 'g'),\n"
        "         '" + JSONC_TRAILING_COMMA_PATTERN + "', '\\1\\2', 'g') AS strict,\n"
        "       CAST(length(regexp_replace(regexp_replace(jsonc,\n"
        "         '" + JSONC_COMMENT_PATTERN + "', '\\1', 'g'),\n"
        "         '" + JSONC_TRAILING_COMMA_PATTERN + "', '\\1\\2', 'g')) AS BIGINT)"
        " AS strict_len\n"
        "FROM src"
    )


@register("jsonc_strip_documents", _jsonc_oracle_sql())
def jsonc_strip_documents(spark, sf_dir):
    """JSONC lenient-mode ingest parity (lexer/json.rs:165-217 skips //
    and /* */; json/parser.rs:20-23 gates comments + trailing commas):
    a JSONC envelope synthesized per document — line comment, multi-line
    block comment, comment-lookalikes INSIDE a string literal, trailing
    commas in object and array — is normalized to strict JSON by ONE
    vectorized quote-aware regex pass per token class, byte-matched by
    DuckDB running the identical RE2-compatible patterns. The pytest
    matrix (test_convert) additionally proves from_json parses every
    stripped result."""
    from zparse_spark.functions.convert import strip_jsonc

    d = _t(spark, sf_dir, "documents")
    nl = "\n"
    jsonc = F.concat(
        F.lit("{" + nl + "  // line comment" + nl + '  "name": "doc-'),
        F.col("doc_id").cast("string"),
        F.lit('", /* block' + nl + " comment */" + nl
              + '  "note": "slash // and /* inside strings stay",' + nl + '  "n": '),
        F.col("n_chars").cast("string"),
        F.lit("," + nl + '  "arr": [1, 2, 3,],' + nl + "}"),
    )
    strict = strip_jsonc(jsonc)
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        strict.alias("strict"),
        F.length(strict).cast("long").alias("strict_len"),
    )


# ---------------------------------------------------------------------------
# C5/C6 TOML/YAML text serializers (convert.rs:295-339, 436-465)
# ---------------------------------------------------------------------------

# DuckDB twin of escape_text: the same five literal replacements in the
# same order (backslash first). SQL single-quoted strings are
# escape-free, so '\' is one backslash and '\\' is two.
_ESC_SQL = (
    "replace(replace(replace(replace(replace({x}, '\\', '\\\\'), "
    "'\"', '\\\"'), chr(10), '\\n'), chr(13), '\\r'), chr(9), '\\t')"
)


def _toml_yaml_oracle_sql() -> str:
    esc = _ESC_SQL.format
    lang_q_toml = "CASE WHEN lang_e IS NULL THEN '\"\"' ELSE '\"' || lang_e || '\"' END"
    lang_q_yaml = "CASE WHEN lang_e IS NULL THEN 'null' ELSE '\"' || lang_e || '\"' END"
    n = " || chr(10)\n  || "
    return (
        "WITH base AS (\n"
        "  SELECT doc_id, n_chars, source,\n"
        "         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang2,\n"
        "         substr(text, 1, 32) || '\"\\' || chr(10) || chr(9) || 'end' AS excerpt,\n"
        "         CASE WHEN doc_id % 11 = 0 THEN CAST('infinity' AS DOUBLE)\n"
        "              ELSE n_chars / 4.0 END AS fval\n"
        "  FROM documents\n"
        "), esc AS (\n"
        "  SELECT doc_id, fval,\n"
        "         CASE WHEN lang2 IS NULL THEN NULL ELSE " + esc(x="lang2") + " END AS lang_e,\n"
        "         " + esc(x="excerpt") + " AS exc_e,\n"
        "         " + esc(x="source") + " AS src_e\n"
        "  FROM base\n"
        ")\n"
        "SELECT CAST(doc_id AS VARCHAR) AS doc_id,\n"
        "  'doc_id = ' || CAST(doc_id AS VARCHAR)" + n
        + "'lang = ' || " + lang_q_toml + n
        + "'excerpt = \"' || exc_e || '\"'" + n
        + "'fval = ' || CASE WHEN isinf(fval) OR isnan(fval) THEN 'nan'\n"
        "                   ELSE CAST(fval AS VARCHAR) END" + n
        + "'tags = [' || " + lang_q_toml + " || ', \"' || src_e || '\"]'" + n
        + "'meta = {source = \"' || src_e || '\", lang = ' || " + lang_q_toml + " || '}'"
        "  AS toml,\n"
        "  'doc_id: ' || CAST(doc_id AS VARCHAR)" + n
        + "'lang: ' || " + lang_q_yaml + n
        + "'excerpt: \"' || exc_e || '\"'" + n
        + "'fval: ' || CASE WHEN isnan(fval) THEN 'NaN'\n"
        "                  WHEN fval = CAST('infinity' AS DOUBLE) THEN 'inf'\n"
        "                  WHEN fval = CAST('-infinity' AS DOUBLE) THEN '-inf'\n"
        "                  ELSE CAST(fval AS VARCHAR) END" + n
        + "'tags:'" + n + "'  - ' || " + lang_q_yaml + n + "'  - \"' || src_e || '\"'" + n
        + "'meta:'" + n + "'  source: \"' || src_e || '\"'" + n
        + "'  lang: ' || " + lang_q_yaml
        + " AS yaml\n"
        "FROM esc"
    )


@register("doc_toml_yaml_serialize", _toml_yaml_oracle_sql())
def doc_toml_yaml_serialize(spark, sf_dir):
    """C5/C6 TOML + YAML text serializers (serialize_toml
    convert.rs:295-339, serialize_yaml convert.rs:436-465) byte-matched
    by a hand-built DuckDB twin. The shaped row exercises every branch
    the reference tests: string escaping (a quote/backslash/newline/tab
    tail is appended to the excerpt on both sides), TOML null → '""' vs
    YAML null (every 7th doc's lang), non-finite floats (every 11th
    doc's fval is +inf → TOML 'nan', YAML 'inf'), inline array, inline
    table vs YAML nested block mapping. Serialization is one schema-
    compiled JVM expression per format — map-only, no Python."""
    from zparse_spark.functions.convert import toml_doc, yaml_doc

    d = _t(spark, sf_dir, "documents")
    lang2 = F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.col("lang")
    )
    shaped = d.select(
        F.col("doc_id"),
        lang2.alias("lang"),
        F.concat(F.substring("text", 1, 32), F.lit('"\\\n\tend')).alias("excerpt"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(float("inf")))
        .otherwise(F.col("n_chars") / 4.0)
        .alias("fval"),
        F.array(lang2, F.col("source")).alias("tags"),
        F.struct(F.col("source"), lang2.alias("lang")).alias("meta"),
    )
    return shaped.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toml_doc(shaped.schema.fields).alias("toml"),
        yaml_doc(shaped.schema).alias("yaml"),
    )


def _roundtrip_oracle_sql() -> str:
    # the expected output of a LOSSLESS round trip is the input itself,
    # so the oracle never parses TOML/YAML: it recomputes the shaped
    # projection directly — any serializer/parser asymmetry (escaping,
    # typing, nesting) lands as a value-hash mismatch
    return (
        "SELECT CAST(d.doc_id AS BIGINT) AS doc_id,\n"
        "       coalesce(d.lang, '') AS lang,\n"
        "       substr(d.text, 1, 24) || '\"\\' || chr(10) || chr(9) || 'end' AS excerpt,\n"
        "       d.n_chars / 4.0 AS fval,\n"
        "       [d.source, coalesce(d.lang, '')] AS tags,\n"
        "       f.fmt AS fmt\n"
        "FROM documents d, (VALUES ('toml'), ('yaml')) AS f(fmt)"
    )


@register("doc_format_roundtrip", _roundtrip_oracle_sql())
def doc_format_roundtrip(spark, sf_dir):
    """TOML/YAML INGEST parity (the source side of the reference's
    any→any format router, convert.rs:95-119; parsers toml/parser.rs:
    88-122, yaml/parser.rs:63-144): serialize a typed projection with
    the C5/C6 serializers, parse it back with from_toml_lines /
    from_yaml_lines, and emit the recovered typed columns. The DuckDB
    twin recomputes the projection directly — round trip == identity is
    the correctness claim (the reference's convert_tests round-trip
    closure), so every escape/typing asymmetry between serializer and
    parser breaks the value hash. Exercises string escaping (quote/
    backslash/newline/tab tail), exact-binary floats, arrays, and the
    TOML-null asymmetry avoided by pre-coalescing lang (TOML has no
    null; the reference serializes Null as '\"\"')."""
    from zparse_spark.functions.convert import (
        from_toml_lines,
        from_yaml_lines,
        to_toml_lines,
        to_yaml_lines,
    )

    d = _t(spark, sf_dir, "documents")
    lang = F.coalesce(F.col("lang"), F.lit(""))
    shaped = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        lang.alias("lang"),
        F.concat(F.substring("text", 1, 24), F.lit('"\\\n\tend')).alias("excerpt"),
        (F.col("n_chars") / 4.0).alias("fval"),
        F.array(F.col("source"), lang).alias("tags"),
    )
    schema = "doc_id long, lang string, excerpt string, fval double, tags array<string>"
    t = from_toml_lines(to_toml_lines(shaped), schema).drop("_corrupt")
    y = from_yaml_lines(to_yaml_lines(shaped), schema).drop("_corrupt")
    return t.withColumn("fmt", F.lit("toml")).unionByName(
        y.withColumn("fmt", F.lit("yaml"))
    )


# ---------------------------------------------------------------------------
# Token-budget pack: greedy best-first prefix under a training budget
# ---------------------------------------------------------------------------


def _pack_oracle_sql(budget: int = 5000) -> str:
    return f"""
    WITH base AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
    ann AS (
      SELECT doc_id,
        CASE WHEN length(trim(t)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(t), '\\s+')) END AS tokens,
        {_FILTER_QUALITY_SQL} AS q,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('the','and','is','of'))) AS s_en,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('el','la','que','los'))) AS s_es,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('der','die','und','das'))) AS s_de,
        len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
            w -> w IN ('le','les','des','est'))) AS s_fr
      FROM base
    ), kept AS (
      SELECT doc_id, tokens, q FROM ann
      WHERE NOT (tokens < 10 OR tokens > 100000 OR q < 0.3
                 OR (CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                          WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
                          WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
                          WHEN s_fr > 0 THEN 'fr'
                          ELSE 'und' END) <> 'en')
    ), c AS (
      SELECT doc_id, tokens, q,
             SUM(tokens) OVER (ORDER BY q DESC, doc_id ASC
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM kept
    )
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CAST(tokens AS BIGINT) AS tokens,
           q AS quality,
           CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= {budget}
    """


@register("corpus_pack_token_budget", _pack_oracle_sql())
def corpus_pack_token_budget(spark, sf_dir):
    """Training-set construction under a token budget: admit documents
    best-quality-first until the running token total would exceed the
    budget (greedy prefix — the contract a plain SQL running-sum filter
    states). The engine never runs a global sort: order buckets are
    aggregated to a tiny per-bucket frame, buckets past the budget are
    pruned before any shuffle, and the cumulative window is partitioned
    by bucket (operators/filtering.py::token_budget_pack). DuckDB's
    single ORDER BY running sum is the semantic oracle."""
    from zparse_spark.operators.filtering import corpus_filter, token_budget_pack

    d = _t(spark, sf_dir, "documents")
    ann = corpus_filter(d).filter(F.col("kept")).select("doc_id", "tokens", "quality")
    packed = token_budget_pack(ann, budget=5000)
    return packed.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("tokens").cast("long").alias("tokens"),
        F.col("quality"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (reproducible corpus subsets)
# ---------------------------------------------------------------------------


def _sample_oracle_sql(seed: int = 7) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang
    FROM documents
    WHERE {hv} / 4294967296.0 <
          CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25 WHEN 'de' THEN 0.25
               ELSE 0.1 END
    """


@register("corpus_sample_stratified", _sample_oracle_sql())
def corpus_sample_stratified(spark, sf_dir):
    """Reproducible stratified sampling: the keep/drop decision is a
    pure function of (doc_id, seed) — md5-nibble uniform over 2^32 —
    so re-runs, resumed jobs, and DuckDB select the IDENTICAL subset
    (df.sample/sampleBy are rng-per-task and change with partitioning
    and retries). Map-only; the filter pushes into the scan."""
    from zparse_spark.operators.filtering import stratified_hash_sample

    d = _t(spark, sf_dir, "documents")
    s = stratified_hash_sample(
        d, "lang", {"en": 0.5, "es": 0.25, "de": 0.25},
        key_col="doc_id", seed=7, default_fraction=0.1,
    )
    return s.select(F.col("doc_id").cast("string").alias("doc_id"), "lang")


def _mixture_oracle_sql(seed: int = 5) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
    WITH cnt AS (
      SELECT lang, count(*) AS n FROM documents
      WHERE lang IN ('en', 'de', 'es') GROUP BY lang
    ),
    tgt(lang, share) AS (VALUES ('en', 0.6), ('de', 0.2), ('es', 0.2)),
    nout AS (SELECT min(n / share) AS n_out FROM cnt JOIN tgt USING (lang)),
    keepf AS (
      SELECT c.lang, (SELECT n_out FROM nout) * t.share / c.n AS keep
      FROM cnt c JOIN tgt t USING (lang)
    )
    SELECT d.lang, count(*) AS n_kept
    FROM documents d JOIN keepf k ON k.lang = d.lang
    WHERE {hv} / 4294967296.0 < k.keep
    GROUP BY d.lang
    """


@register("corpus_rebalance_mixture", _mixture_oracle_sql())
def corpus_rebalance_mixture(spark, sf_dir):
    """Mixture rebalancing toward 60/20/20 en/de/es by downsampling
    only: the bottleneck stratum keeps 100%, everything else keeps
    n_out*share/count via the portable hash filter, non-target langs
    drop. The per-stratum fractions derive from counts with the SAME
    IEEE operation order on both engines (min(n/share), then
    n_out*share/n), so the kept SET is identical bit-for-bit. Output is
    the per-lang kept counts — the mixture the run actually achieved."""
    from zparse_spark.operators.filtering import rebalance_mixture

    d = _t(spark, sf_dir, "documents")
    out = rebalance_mixture(
        d, "lang", {"en": 0.6, "de": 0.2, "es": 0.2}, key_col="doc_id", seed=5
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def _splits_oracle_sql(seed: int = 11) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
    WITH u AS (
      SELECT lang, {hv} / 4294967296.0 AS uv FROM documents
    )
    SELECT CASE WHEN uv < 0.9 THEN 'train'
                WHEN uv < 0.95 THEN 'val'
                ELSE 'test' END AS split,
           lang, count(*) AS n
    FROM u GROUP BY 1, 2
    """


@register("corpus_assign_splits", _splits_oracle_sql())
def corpus_assign_splits(spark, sf_dir):
    """Deterministic train/val/test assignment: the split is a pure
    function of (doc_id, seed) via the portable md5-nibble uniform, so
    the same document lands in the same split across re-runs, engines,
    and corpus versions — adding documents never moves an existing one
    between splits (frozen eval sets under corpus growth). Map-only;
    checked here as per-(split, lang) counts so the oracle verifies the
    full assignment without hashing 500 one-row labels."""
    from zparse_spark.operators.filtering import assign_splits

    d = _t(spark, sf_dir, "documents")
    out = assign_splits(
        d, {"train": 0.9, "val": 0.05, "test": 0.05}, key_col="doc_id", seed=11
    )
    return out.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n"))


def _split_leakage_oracle_sql(seed: int = 11) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
    WITH {_WINNOW_PAIRS_CTES},
    sp AS (
      SELECT doc_id,
             CASE WHEN {hv} / 4294967296.0 < 0.9 THEN 'train'
                  WHEN {hv} / 4294967296.0 < 0.95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT p.id_a, p.id_b, p.jaccard, a.split AS split_a, b.split AS split_b
    FROM wpairs p
    JOIN sp a ON a.doc_id = p.id_a
    JOIN sp b ON b.doc_id = p.id_b
    WHERE a.split <> b.split
    """


@register("corpus_split_leakage", _split_leakage_oracle_sql())
def corpus_split_leakage(spark, sf_dir):
    """Train/test contamination audit: winnowing near-dup pairs (>= 0.5
    fingerprint Jaccard) whose members landed in DIFFERENT splits under
    the frozen deterministic assignment — each row is a document whose
    near-copy sits in an eval split and silently inflates eval scores.
    Pure composition of two oracled stages (dedup_winnowing_documents x
    corpus_assign_splits), so the leak set is a pure function of
    (corpus, seed, k, w, threshold); the split lookups are two
    id-keyed joins against a map-only projection — no text rescan."""
    from zparse_spark.operators.dedup import winnowing_pairs
    from zparse_spark.operators.filtering import assign_splits, split_leakage_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = winnowing_pairs(d.select("doc_id", "text"), k=8, w=4, threshold=0.5)
    splits = assign_splits(
        d, {"train": 0.9, "val": 0.05, "test": 0.05}, key_col="doc_id", seed=11
    )
    return split_leakage_pairs(
        pairs.select("id_a", "id_b", "jaccard"), splits.select("doc_id", "split")
    )


# ---------------------------------------------------------------------------
# Line-level boilerplate removal (CCNet-style corpus cleaning)
# ---------------------------------------------------------------------------


@register(
    "corpus_strip_boilerplate",
    """
    WITH docs2 AS (
      SELECT doc_id,
             text || chr(10) || 'banner ' || source || chr(10)
                  || 'copyright footer 2026' AS t
      FROM documents
    ), ls AS (
      SELECT doc_id, string_split(t, chr(10)) AS arr FROM docs2
    ), lines AS (
      SELECT doc_id, unnest(arr) AS line,
             unnest(generate_series(1, len(arr))) AS pos
      FROM ls
    ), bl AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM lines
        WHERE length(trim(line)) >= 1 GROUP BY line
      ) WHERE nd >= 20
    ), kept AS (
      SELECT * FROM lines WHERE line NOT IN (SELECT line FROM bl)
    )
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           string_agg(line, chr(10) ORDER BY pos) AS text_clean,
           CAST(count(*) AS BIGINT) AS n_lines_kept
    FROM kept GROUP BY doc_id
    """,
)
def corpus_strip_boilerplate(spark, sf_dir):
    """Line-level boilerplate removal: detect lines shared by ≥20
    distinct documents (a per-source banner ~50 docs each and a global
    footer are planted on both sides — the fixture's texts are
    single-line, so the multi-line shape is synthesized deterministically
    like the JSONC/TOML envelope queries), strip them, and reassemble
    each document in original line order. DuckDB's zip-unnest +
    NOT IN + ordered string_agg is the semantic twin of explode →
    count_distinct ≥ k → broadcast anti-join → sorted reassembly."""
    from zparse_spark.operators.filtering import boilerplate_lines, strip_boilerplate

    d = _t(spark, sf_dir, "documents")
    docs2 = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\nbanner "), F.col("source"),
            F.lit("\ncopyright footer 2026"),
        ).alias("text"),
    )
    bl = boilerplate_lines(docs2, min_docs=20)
    out = strip_boilerplate(docs2, bl)
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "text_clean",
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
    )


# ---------------------------------------------------------------------------
# PII-style redaction scrub
# ---------------------------------------------------------------------------


def _pii_oracle_sql() -> str:
    from zparse_spark.functions.text import PII_PATTERNS

    planted = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@site'"
        " || CAST(doc_id % 7 AS VARCHAR) || '.org or 10.0.'"
        " || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)"
        " || ' call +1 555 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
    )
    red = "t"
    for k, p in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{p}', '<{k.upper()}>', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(t, '{p}')) AS INT) AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    return (
        "WITH src AS (SELECT doc_id, " + planted + " AS t FROM documents)\n"
        "SELECT CAST(doc_id AS VARCHAR) AS doc_id,\n"
        "           " + red + " AS redacted,\n"
        "           " + counts + "\n"
        "FROM src"
    )


@register("corpus_redact_pii", _pii_oracle_sql())
def corpus_redact_pii(spark, sf_dir):
    """PII scrub before training: email/IPv4/phone patterns (planted
    deterministically — the fixture texts carry none) are replaced with
    typed placeholders in documented order, with per-class match counts
    as the monitoring artifact. The pattern strings are shared verbatim
    between Java regex and RE2 (lookaround-free, the JSONC-stripper
    contract), so DuckDB reproduces both the redacted text and the
    counts byte-for-byte. Map-only, chained regexp_replace, no Python."""
    from zparse_spark.functions.text import pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".org or 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 100).cast("string"),
        F.lit(" call +1 555 01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    c = pii_counts(planted)
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        redact_pii(planted).alias("redacted"),
        c["email"].alias("n_email"),
        c["ipv4"].alias("n_ipv4"),
        c["phone"].alias("n_phone"),
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination gate (test-set decontamination)
# ---------------------------------------------------------------------------


def _contamination_oracle_sql() -> str:
    from zparse_spark.queries_lsh import _NORM_SH_TAIL

    return (
        "WITH input AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text"
        " FROM documents)" + _NORM_SH_TAIL + """,
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    probe AS (SELECT DISTINCT s FROM ex WHERE CAST(doc_id AS BIGINT) % 97 = 0),
    hits AS (SELECT e.doc_id, e.s FROM ex e JOIN probe p ON e.s = p.s)
    SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_hits
    FROM hits GROUP BY doc_id
    """
    )


@register("corpus_contamination_flags", _contamination_oracle_sql())
def corpus_contamination_flags(spark, sf_dir):
    """Decontamination gate: every doc sharing a word-3-shingle with the
    probe set (docs with doc_id % 97 = 0 stand in for an eval set) is
    flagged with its distinct-hit count — probes flag themselves, their
    near-duplicates flag with partial overlap. Explode + broadcast
    semi-equi-join + count_distinct; the DuckDB twin reuses the shared
    normalize/shingle SQL so both sides tokenize identically."""
    from zparse_spark.operators.filtering import contamination_flags

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    probes = d.filter(F.col("doc_id").cast("long") % 97 == 0)
    return contamination_flags(d, probes)


# ---------------------------------------------------------------------------
# Gap-based sessionization (operators/sessionize.py)
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 6 * 3600 * 1_000_000  # 6h: ~1.75 events/session at sf0.01


@register(
    "events_sessionize",
    f"""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type, value,
             epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ),
    sess AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           max(us) - min(us) AS duration_us,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           round(sum(value), 2) AS sum_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization + per-session rollup: the reference's
    boundary-scan tokenization (json/lexer.rs cursor advance closing a
    token at a delimiter class) lifted to event streams — a >6h silence
    closes the session. One shuffle on user_id carries the lag window,
    the running boundary sum AND the per-session aggregate (same key
    prefix); gaps compared in exact integer microseconds so the
    boundary decision is bit-identical in DuckDB."""
    from zparse_spark.operators.sessionize import sessionize

    ev = sessionize(
        _t(spark, sf_dir, "events"), key="user_id", ts_col="ts", gap_us=_SESSION_GAP_US
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Exact threshold set-similarity join with prefix filtering (operators/setsim.py)
# ---------------------------------------------------------------------------


def _setsim_allpairs_oracle() -> str:
    from zparse_spark.queries_lsh import _NORM_SH_TAIL

    # The oracle is deliberately ALL-PAIRS: the Spark side must produce
    # the identical pair set THROUGH its prefix-filter pruning, proving
    # the optimization lossless (an LSH pipeline could not pass this).
    return (
        "WITH input AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text"
        " FROM documents)" + _NORM_SH_TAIL + """,
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, inter, uni, round(inter * 1.0 / uni, 6) AS jaccard
    FROM p WHERE inter * 1.0 / uni >= 0.8
    """
    )


@register("dedup_setsim_prefix_join", _setsim_allpairs_oracle())
def dedup_setsim_prefix_join(spark, sf_dir):
    """Exact (lossless) threshold similarity self-join: every pair with
    word-3-shingle Jaccard >= 0.8, found via frequency-ordered prefix
    filtering (AllPairs/PPJoin) — never an all-pairs join, never an LSH
    miss. The DuckDB oracle IS the quadratic all-pairs definition, so a
    green row certifies the pruning dropped nothing. Complements
    dedup_minhash_*: LSH for throughput, this for completeness
    receipts (audit-grade dedup, decontamination attestations)."""
    from zparse_spark.operators.setsim import prefix_filter_jaccard_join

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return prefix_filter_jaccard_join(d, threshold=0.8, k_shingle=3)


# ---------------------------------------------------------------------------
# Ordered funnel + retention cohorts (operators/funnel.py)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "events_funnel_ordered",
    """
    WITH t1 AS (
      SELECT user_id, min(epoch_us(ts)) AS us1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS us2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.us1
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS us3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.us2
      GROUP BY e.user_id
    ), counts AS (
      SELECT 1 AS step_no, 'view' AS step, (SELECT count(*) FROM t1) AS n_users
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM t3)
    )
    SELECT step_no, step, n_users,
           round(CAST(n_users AS DOUBLE)
                 / nullif(max(CASE WHEN step_no = 1 THEN n_users END) OVER (), 0),
                 6) AS pct_of_first
    FROM counts
    """,
)
def events_funnel_ordered(spark, sf_dir):
    """Ordered conversion funnel view->click->purchase: stage i+1 counts
    only strictly AFTER the stage-i match — the reference's ordered
    token-acceptance machine (json/parser.rs advances state only on the
    next expected class) over a user's event stream. The Spark side runs
    the machine as a JVM ``aggregate`` fold over each user's sorted
    candidate events (one shuffle, pre-filtered to funnel traffic); the
    oracle is the equivalent greedy min-chain of per-stage CTEs —
    greedy-earliest is optimal for reach-depth, so the two agree
    exactly. Strictly-later compared in integer microseconds."""
    from zparse_spark.operators.funnel import funnel_report

    return funnel_report(_t(spark, sf_dir, "events"), list(_FUNNEL_STEPS))


@register(
    "events_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_period
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS period FROM events
    ), grid AS (
      SELECT f.cohort_period,
             CAST((epoch_us(a.period) - epoch_us(f.cohort_period))
                  / (7 * 86400 * 1000000.0) AS INTEGER) AS period_offset,
             count(*) AS n_active
      FROM active a JOIN firsts f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT cohort_period, period_offset, n_active,
           round(CAST(n_active AS DOUBLE)
                 / nullif(max(CASE WHEN period_offset = 0 THEN n_active END)
                          OVER (PARTITION BY cohort_period), 0),
                 6) AS retention
    FROM grid
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts: users bucketed by first-seen week, a
    user is active in every distinct week it has an event, retention is
    the cohort share still active k weeks on. Two map-side-combining
    aggregations (first-seen; distinct user-week) joined on user —
    shuffles carry one row per user(-week), far below the event count;
    the cohort grid itself is tiny and the share rides a window over
    it. Offsets are exact week multiples (both sides truncate to the
    Monday week boundary) so the int cast is lossless."""
    from zparse_spark.operators.funnel import retention_cohorts

    out = retention_cohorts(_t(spark, sf_dir, "events"), key="user_id", ts_col="ts")
    # DuckDB's date_trunc('week') yields DATE; align the grid key type.
    return out.withColumn("cohort_period", F.col("cohort_period").cast("date"))


# ---------------------------------------------------------------------------
# Semi-structured JSON schema profiling (functions/json_profile.py)
# ---------------------------------------------------------------------------

# Deterministic JSON-variety fixture over events.props: nested objects,
# arrays, int->string type flips, a malformed doc class and a missing
# class — the same SQL fragment evaluates identically in Spark and
# DuckDB (|| concat, CAST AS STRING), so both engines profile the SAME
# corpus.
_JPROPS_FIXTURE = """
    CASE CAST(event_id % 7 AS INT)
      WHEN 0 THEN '{"k": ' || CAST(event_id % 100 AS STRING)
                  || ', "tags": ["a", "b"], "meta": {"lang": "en", "score": 1.5}}'
      WHEN 1 THEN '{"k": "' || CAST(event_id % 100 AS STRING) || '"}'
      WHEN 2 THEN '{"k": null, "extra": true}'
      WHEN 3 THEN '{"tags": [], "meta": {"lang": "de", "deep": {"x": [1, "s", null]}}}'
      WHEN 4 THEN '{bro'
      WHEN 5 THEN NULL
      ELSE props
    END
"""


@register(
    "profile_json_schema",
    f"""
    WITH RECURSIVE src AS (
      SELECT {_JPROPS_FIXTURE} AS props FROM events
    ), nodes(path, j) AS (
      SELECT '$', CAST(props AS JSON) FROM src
      WHERE props IS NOT NULL AND json_valid(props)
      UNION ALL
      SELECT n.path || s.suffix, s.child
      FROM nodes n, LATERAL (
        SELECT '.' || k AS suffix, json_extract(n.j, '$."' || k || '"') AS child
        FROM unnest(json_keys(n.j)) AS t(k)
        WHERE json_type(n.j) = 'OBJECT'
        UNION ALL
        SELECT '[]' AS suffix, json_extract(n.j, '$[' || i || ']') AS child
        FROM unnest(range(CAST(json_array_length(n.j) AS BIGINT))) AS r(i)
        WHERE json_type(n.j) = 'ARRAY'
      ) s
    ), prof AS (
      SELECT path,
             CASE WHEN j IS NULL THEN 'null' ELSE
               CASE json_type(j)
                 WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array'
                 WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'bool'
                 WHEN 'DOUBLE' THEN 'double' WHEN 'NULL' THEN 'null'
                 WHEN 'BIGINT' THEN 'int' WHEN 'UBIGINT' THEN 'int'
               END
             END AS vtype,
             count(*) AS n
      FROM nodes GROUP BY 1, 2
      UNION ALL
      SELECT '$', 'malformed', count(*) FROM src
      WHERE props IS NOT NULL AND NOT json_valid(props) HAVING count(*) > 0
      UNION ALL
      SELECT '$', 'missing', count(*) FROM src
      WHERE props IS NULL HAVING count(*) > 0
    ), tot AS (
      SELECT sum(CASE WHEN path = '$' THEN n ELSE 0 END) AS t FROM prof
    )
    SELECT prof.path, prof.vtype, CAST(prof.n AS BIGINT) AS n,
           round(prof.n * 1.0 / tot.t, 6) AS row_share
    FROM prof, tot
    """,
)
def profile_json_schema(spark, sf_dir):
    """Semi-structured schema profile of a JSON column: every (path,
    value-type) pair observed anywhere in the corpus with counts — the
    reference's typed-value construction (json/parser.rs) lifted to
    schema DISCOVERY over an undeclared column. Array indices collapse
    to a `[]` wildcard; malformed and missing documents are profiled,
    not skipped. Spark side is one Arrow flatten + one partial-combined
    groupBy; the DuckDB twin re-derives the profile with a recursive
    path-expansion CTE, so the engines agree on an arbitrarily nested
    corpus, not just on happy-path scalars."""
    from zparse_spark.functions.json_profile import json_schema_profile

    ev = _t(spark, sf_dir, "events").select(F.expr(_JPROPS_FIXTURE).alias("props"))
    return json_schema_profile(ev, "props")


# ---------------------------------------------------------------------------
# Unigram LM quality score (functions/text.py::unigram_logprob_scores)
# ---------------------------------------------------------------------------


@register(
    "corpus_lm_quality",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ), doc_tok AS (
      SELECT doc_id, token, count(*) AS c
      FROM toks WHERE token <> '' GROUP BY doc_id, token
    ), model AS (
      SELECT token, sum(c) AS tf FROM doc_tok GROUP BY token
    ), tot AS (
      SELECT sum(tf) AS t FROM model
    ), m AS (
      SELECT token, CAST(round(ln(tf / tot.t) * 1000000) AS BIGINT) AS ulp6
      FROM model, tot
    )
    SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_tokens,
           round(sum(d.c * m.ulp6) / (sum(d.c) * 1000000.0), 6) AS avg_logprob
    FROM doc_tok d JOIN m ON d.token = m.token
    GROUP BY d.doc_id
    """,
)
def corpus_lm_quality(spark, sf_dir):
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the cheap LM quality filter (CCNet's shape with no
    external model artifact). Per-token log-probs quantize once to
    integer micro-nats so the per-doc aggregation is exact integer
    arithmetic in both engines; the only float ops are one libm ln per
    distinct token and the final display division."""
    from zparse_spark.functions.text import unigram_logprob_scores

    return unigram_logprob_scores(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Daily-volume anomaly screen (operators/stats.py::timeseries_anomalies)
# ---------------------------------------------------------------------------


@register(
    "anomaly_events_daily",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    grid AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
             t.event_type
      FROM mm, (SELECT DISTINCT event_type FROM daily) t
    ), dense AS (
      SELECT g.day, g.event_type, coalesce(daily.n, 0) AS n
      FROM grid g LEFT JOIN daily
        ON g.day = daily.day AND g.event_type = daily.event_type
    ), win AS (
      SELECT day, event_type, n,
             sum(n) OVER w AS s, sum(n * n) OVER w AS q, count(n) OVER w AS k
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           CASE WHEN k = 7 AND (k * q - s * s) > 0
                THEN round(((k * n - s) * 1.0 / k)
                           / sqrt((k * q - s * s) * 1.0 / (k * (k - 1))), 6)
           END AS z,
           CASE WHEN k = 7 AND (k * q - s * s) > 0
                THEN abs(round(((k * n - s) * 1.0 / k)
                               / sqrt((k * q - s * s) * 1.0 / (k * (k - 1))),
                         6)) > 3.0
           END AS is_anomaly
    FROM win
    """,
)
def anomaly_events_daily(spark, sf_dir):
    """Per-event-type daily-volume anomaly screen over a densified
    day×type grid (a silent day IS the signal): trailing-7-day sample-z
    from exact BIGINT window sums, so the only float ops are IEEE
    correctly-rounded divide/sqrt on identical integer operands —
    bit-identical cross-engine with no libm and no accumulation-order
    dependence. Short history and zero-variance baselines yield NULL."""
    from zparse_spark.operators.stats import timeseries_anomalies

    return timeseries_anomalies(_t(spark, sf_dir, "events"))


@register(
    "events_path_ngrams",
    """
    WITH seqs AS (
      SELECT user_id, array_agg(event_type ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ), grams AS (
      SELECT unnest(list_transform(range(1, len(seq) - 1),
                                   i -> array_to_string(seq[i:i+2], '>'))) AS path
      FROM seqs WHERE len(seq) >= 3
    )
    SELECT path, count(*) AS n_occurrences
    FROM grams GROUP BY path
    ORDER BY n_occurrences DESC, path ASC LIMIT 50
    """,
)
def events_path_ngrams(spark, sf_dir):
    """Top-50 three-step user journeys (consecutive event-type trigrams
    over each user's time-ordered stream) — path analysis, the
    exploratory companion to the X84 funnel machine. One shuffle
    collects per-user ordered sequences, the slide is a map-only array
    transform, the count map-side-combines to the path domain, and the
    top-50 is a TakeOrdered under a deterministic total order."""
    from zparse_spark.operators.funnel import event_path_ngrams

    return event_path_ngrams(_t(spark, sf_dir, "events"), n=3, top_n=50)


# ---------------------------------------------------------------------------
# Deterministic weighted upsampling (operators/filtering.py::upsample_by_weight)
# ---------------------------------------------------------------------------

_UPSAMPLE_WT = (
    "CASE lang WHEN 'en' THEN 1.7 WHEN 'de' THEN 0.4 WHEN 'es' THEN 2.0 ELSE 1.0 END"
)


def _upsample_oracle_sql(seed: int = 7) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
    WITH w AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
             {_UPSAMPLE_WT} AS wt
      FROM documents
    ), n AS (
      SELECT doc_id, lang,
             least(CAST(floor(wt) AS BIGINT)
                   + CASE WHEN {hv} * 1.0 / 4294967296 < wt - floor(wt)
                          THEN 1 ELSE 0 END,
                   16) AS n_copies
      FROM w
    )
    SELECT doc_id, lang, CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_no
    FROM n WHERE n_copies >= 1
    """


@register("corpus_upsample_mixture", _upsample_oracle_sql())
def corpus_upsample_mixture(spark, sf_dir):
    """Deterministic weighted upsampling (epoch-repeat weighting for
    scarce high-quality sources — the UPSAMPLE half of the mixture
    story; X35 rebalancing is downsample-only): floor(w) copies plus a
    hash-coin extra with probability frac(w), expected copies exactly
    w, the whole multiset a pure function of (doc_id, seed). The
    md5-nibble coin divides by a power of two, so the comparison is
    bit-identical in DuckDB."""
    from zparse_spark.operators.filtering import upsample_by_weight

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "lang",
        F.expr(_UPSAMPLE_WT).alias("wt"),
    )
    return upsample_by_weight(d, "wt", key_col="doc_id", seed=7).select(
        "doc_id", "lang", "copy_no"
    )


@register(
    "trend_events_volume",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    grid AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
             t.event_type, d0
      FROM mm, (SELECT DISTINCT event_type FROM daily) t
    ), dense AS (
      SELECT g.event_type, CAST(g.day - g.d0 AS BIGINT) AS x,
             CAST(coalesce(daily.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN daily
        ON g.day = daily.day AND g.event_type = daily.event_type
    ), agg AS (
      SELECT event_type, count(*) AS k, sum(x) AS sx, sum(n) AS sy,
             sum(x * n) AS sxy, sum(x * x) AS sxx
      FROM dense GROUP BY event_type
    )
    SELECT event_type, CAST(k AS BIGINT) AS n_days, CAST(sy AS BIGINT) AS total,
           CASE WHEN k * sxx - sx * sx > 0
                THEN round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) END
             AS slope_per_day,
           CASE WHEN k * sxx - sx * sx > 0 AND sy > 0
                THEN round(((k * sxy - sx * sy) / (k * sxx - sx * sx)) / (sy / k), 6)
           END AS rel_slope
    FROM agg
    """,
)
def trend_events_volume(spark, sf_dir):
    """Per-event-type daily-volume trend: closed-form least-squares
    slope over the densified day grid, from exact BIGINT sums with one
    IEEE division — bit-identical cross-engine (X87's discipline, for
    the DIRECTION question: a slow bleed no single-day z-score sees).
    rel_slope = slope / mean daily volume is the alertable per-day
    fractional drift."""
    from zparse_spark.operators.stats import volume_trend

    return volume_trend(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Missingness co-occurrence (operators/stats.py::null_cooccurrence)
# ---------------------------------------------------------------------------

# Planted null classes: props nulls are a SUBSET of value nulls (one
# upstream failure domain -> jaccard 0.5, lift 10), event_type nulls are
# independent of both (lift ~= 1).
_NULLS_FIXTURE = """
      SELECT CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 10 = 0 THEN NULL ELSE props END AS props,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS event_type
      FROM events
"""


@register(
    "profile_null_cooccurrence",
    f"""
    WITH src AS ({_NULLS_FIXTURE}),
    a AS (
      SELECT count(*) AS N,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS n2,
             sum(CASE WHEN value IS NULL AND props IS NULL THEN 1 ELSE 0 END) AS b01,
             sum(CASE WHEN value IS NULL AND event_type IS NULL THEN 1 ELSE 0 END) AS b02,
             sum(CASE WHEN props IS NULL AND event_type IS NULL THEN 1 ELSE 0 END) AS b12
      FROM src
    )
    SELECT 'value' AS col_a, 'props' AS col_b, n0 AS n_null_a, n1 AS n_null_b,
           b01 AS n_both,
           CASE WHEN n0 + n1 - b01 > 0 THEN round(b01 / (n0 + n1 - b01), 6) END AS jaccard,
           CASE WHEN n0 * n1 > 0 THEN round((b01 * N) / (n0 * n1), 6) END AS lift
    FROM a
    UNION ALL
    SELECT 'value', 'event_type', n0, n2, b02,
           CASE WHEN n0 + n2 - b02 > 0 THEN round(b02 / (n0 + n2 - b02), 6) END,
           CASE WHEN n0 * n2 > 0 THEN round((b02 * N) / (n0 * n2), 6) END
    FROM a
    UNION ALL
    SELECT 'props', 'event_type', n1, n2, b12,
           CASE WHEN n1 + n2 - b12 > 0 THEN round(b12 / (n1 + n2 - b12), 6) END,
           CASE WHEN n1 * n2 > 0 THEN round((b12 * N) / (n1 * n2), 6) END
    FROM a
    """,
)
def profile_null_cooccurrence(spark, sf_dir):
    """Missingness co-occurrence over planted null classes: props nulls
    a strict subset of value nulls (one failure domain — jaccard 0.5,
    lift 10 at the %5/%10 plant rates), event_type nulls independent
    (lift ≈ 1). All pair sums ride ONE map-side-combining aggregate over
    the pruned projection; the pair table explodes from the one-row
    result. X54/X63 profile values — this profiles their ABSENCE."""
    from zparse_spark.operators.stats import null_cooccurrence

    ev = _t(spark, sf_dir, "events").selectExpr(
        "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value",
        "CASE WHEN event_id % 10 = 0 THEN NULL ELSE props END AS props",
        "CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS event_type",
    )
    return null_cooccurrence(ev, ["value", "props", "event_type"])


@register(
    "events_active_users",
    """
    WITH kd AS (
      SELECT DISTINCT user_id AS k, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM kd),
    dau AS (SELECT day, count(DISTINCT k) AS dau FROM kd GROUP BY day),
    fan AS (
      SELECT k, CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                            INTERVAL 1 DAY)) AS DATE) AS day
      FROM kd
    ),
    wau AS (SELECT day, count(DISTINCT k) AS wau FROM fan GROUP BY day),
    grid AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM mm
    )
    SELECT g.day, CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
           CAST(coalesce(wau.wau, 0) AS BIGINT) AS wau,
           CASE WHEN coalesce(wau.wau, 0) > 0
                THEN round(coalesce(dau.dau, 0) / wau.wau, 6) END AS stickiness
    FROM grid g LEFT JOIN dau ON g.day = dau.day LEFT JOIN wau ON g.day = wau.day
    """,
)
def events_active_users(spark, sf_dir):
    """Exact DAU / rolling 7-day WAU / stickiness per day. The rolling
    distinct is non-decomposable, so each (user, active-day) — already
    reduced to the distinct pair table — fans out to the 7 report days
    it supports; the second shuffle carries user-days × 7, far below
    event volume. Dead days densify to zero rows. The one float op is
    an IEEE division of exact integers."""
    from zparse_spark.operators.funnel import active_users

    return active_users(_t(spark, sf_dir, "events"), window_days=7)


@register(
    "events_survival_km",
    """
    WITH day AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    ),
    per AS (SELECT user_id, min(d) AS fd, max(d) AS ld FROM day GROUP BY 1),
    oe AS (SELECT max(d) AS obs_end FROM day),
    lf AS (
      SELECT date_diff('day', fd, ld) AS dur_days,
             CASE WHEN date_diff('day', ld, obs_end) < 1 THEN 1 ELSE 0 END AS censored
      FROM per, oe
    ),
    tab AS (
      SELECT dur_days, count(*) AS n_ending,
             sum(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS n_events
      FROM lf GROUP BY 1
    ),
    km AS (
      SELECT dur_days, n_events,
             sum(n_ending) OVER (ORDER BY dur_days DESC) AS n_risk
      FROM tab
    ),
    km2 AS (
      SELECT dur_days, n_risk, n_events,
             round(product(CAST(n_risk - n_events AS DOUBLE) / n_risk)
                   OVER (ORDER BY dur_days), 6) AS survival
      FROM km
    )
    SELECT dur_days, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_events AS BIGINT) AS n_events, survival
    FROM km2 WHERE n_events > 0
    """,
)
def events_survival_km(spark, sf_dir):
    """Kaplan-Meier retention curve of user activity lifetimes with
    honest right-censoring (last event on the observation-end day =
    still alive: at-risk, never a death — the driver events table is
    dense, every user active into the final days, so the horizon is one
    day; a sparser table would use 7+). The cumulative survival
    product runs as a window product() in identical duration order on
    both engines — same association order, round-6 is last-ulp
    insurance. Events reduce to lifetimes in one keyed pass; every
    window runs on the bounded |distinct durations| curve table."""
    from zparse_spark.operators.funnel import survival_curve

    return survival_curve(_t(spark, sf_dir, "events"), censor_days=1)


@register(
    "layout_skipping_audit",
    """
    WITH li AS (
      SELECT l_orderkey, l_extendedprice AS p FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    mm AS (SELECT min(p) AS mn, max(p) AS mx FROM li),
    assigned AS (
      SELECT 'hash' AS layout, l_orderkey % 32 AS file_id, p FROM li
      UNION ALL
      SELECT 'range' AS layout,
             least(31, CAST(floor((p - mm.mn) / ((mm.mx - mm.mn) / 32.0)) AS BIGINT)) AS file_id,
             p
      FROM li, mm
    ),
    zm AS (
      SELECT layout, file_id, min(p) AS mn, max(p) AS mx
      FROM assigned GROUP BY 1, 2
    ),
    probes AS (SELECT DISTINCT p FROM li WHERE l_orderkey % 997 = 0),
    pl AS (SELECT p, layout FROM probes CROSS JOIN (SELECT DISTINCT layout FROM zm)),
    hits AS (
      SELECT pl.layout, pl.p, count(zm.file_id) AS files_hit
      FROM pl LEFT JOIN zm
        ON zm.layout = pl.layout AND pl.p >= zm.mn AND pl.p <= zm.mx
      GROUP BY 1, 2
    ),
    nf AS (SELECT layout, count(*) AS n_files FROM zm GROUP BY 1)
    SELECT h.layout, nf.n_files, count(*) AS n_probes,
           round(avg(h.files_hit), 6) AS avg_files_hit,
           max(h.files_hit) AS max_files_hit,
           round(avg(h.files_hit) / nf.n_files, 6) AS avg_hit_frac
    FROM hits h JOIN nf ON nf.layout = h.layout
    GROUP BY 1, 2
    """,
)
def layout_skipping_audit(spark, sf_dir):
    """Zone-map data-skipping effectiveness, hash layout vs range
    layout over the same column: per-file min/max (what Iceberg footers
    keep), probed with a deterministic value set — files-hit per point
    predicate IS the read amplification a selective query pays at
    100 TB. The range layout should prune to ~1 file per probe while
    the hash layout touches nearly all 32 — the measured, oracled
    version of 'cluster your sort keys'. Zone maps and probes are
    bounded tables; the audit never rescans the data after the one
    groupBy per layout."""
    from zparse_spark.operators.layout import skipping_audit, zone_maps

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select("l_orderkey", F.col("l_extendedprice").alias("p"))
    )
    mm = li.agg(F.min("p").alias("gmn"), F.max("p").alias("gmx"))
    hash_files = li.select(
        F.lit("hash").alias("layout"), (F.col("l_orderkey") % 32).alias("f"), "p"
    )
    range_files = li.crossJoin(F.broadcast(mm)).select(
        F.lit("range").alias("layout"),
        F.least(
            F.lit(31),
            F.floor(
                (F.col("p") - F.col("gmn")) / ((F.col("gmx") - F.col("gmn")) / 32.0)
            ),
        ).alias("f"),
        "p",
    )
    assigned = hash_files.unionByName(range_files)
    zm = (
        assigned.groupBy("layout", F.col("f"))
        .agg(F.min("p").alias("mn"), F.max("p").alias("mx"), F.count("p").alias("n_rows"))
        .select("layout", F.col("f").alias("file_id"), "mn", "mx", "n_rows")
    )
    probes = li.filter(F.col("l_orderkey") % 997 == 0).select("p").distinct()
    return skipping_audit(zm, probes, probe_col="p", layout_col="layout")


@register(
    "layout_compaction_bins",
    """
    WITH manifest AS (
      SELECT source AS partition, doc_id % 7 AS file_id,
             sum(n_chars) AS bytes
      FROM documents GROUP BY 1, 2
    ),
    staged AS (
      SELECT partition, file_id, bytes,
             sum(bytes) OVER (PARTITION BY partition
                              ORDER BY bytes DESC, file_id
                              ROWS UNBOUNDED PRECEDING) - bytes AS pre
      FROM manifest
    )
    SELECT partition, CAST(floor(pre / 2500.0) AS BIGINT) AS bin,
           count(*) AS n_files, sum(bytes) AS bin_bytes,
           sum(bytes) > 2500 AS over_target
    FROM staged GROUP BY 1, 2
    """,
)
def layout_compaction_bins(spark, sf_dir):
    """Small-file compaction plan (Iceberg binPack rewrite shape):
    deterministic scan packing of each partition's file manifest into
    ~target-byte merge bins via ONE window cumsum — no iterative
    first-fit loop, bounded one-file overflow, and a total-order sort
    key so re-runs and other engines emit the identical plan (bins can
    commit independently on resume). Runs on the manifest (|files|
    rows), never the data."""
    from zparse_spark.operators.layout import compaction_bins

    manifest = (
        _t(spark, sf_dir, "documents")
        .groupBy(
            F.col("source").alias("partition"),
            (F.col("doc_id") % 7).alias("file_id"),
        )
        .agg(F.sum("n_chars").alias("bytes"))
    )
    return compaction_bins(manifest, target_bytes=2500)


@register(
    "stats_chi2_orders",
    """
    WITH obs AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS o
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1),
    cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM obs),
    grid AS (
      SELECT ra.a, cb.b, coalesce(obs.o, 0) AS o,
             CAST(ra.ra AS DOUBLE) * cb.cb / tot.n AS e, tot.n AS n
      FROM ra CROSS JOIN cb
      LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
      CROSS JOIN tot
    ),
    s AS (
      SELECT max(n) AS n, count(DISTINCT a) AS r, count(DISTINCT b) AS c,
             sum((o - e) * (o - e) / e) AS chi2r,
             sum(CASE WHEN o > 0 THEN 2.0 * o * ln(o / e) ELSE 0.0 END) AS g2r
      FROM grid
    )
    SELECT CAST(n AS BIGINT) AS n, r, c, (r - 1) * (c - 1) AS dof,
           round(chi2r, 6) AS chi2, round(g2r, 6) AS g2,
           round(sqrt(chi2r / (n * (least(r, c) - 1))), 6) AS cramers_v
    FROM s
    """,
)
def stats_chi2_orders(spark, sf_dir):
    """Pearson chi-squared + G-test + Cramér's V for independence of
    order priority x status — the hypothesis-test seat of the drift
    family (a statistic with dof and a null distribution, so monitors
    alarm at a chosen false-positive rate instead of an ad-hoc PSI
    cut). Full-grid densification (zero cells contribute e), exact
    integer counts into one bounded-grid aggregate; both engines sum
    the same <=18 cells."""
    from zparse_spark.operators.stats import chi2_independence

    return chi2_independence(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


@register(
    "events_contribution_analysis",
    """
    WITH g AS (
      SELECT event_type AS value,
             sum(CASE WHEN CAST(date_trunc('day', ts) AS DATE) <= DATE '2024-01-15'
                      THEN value ELSE 0.0 END) AS m_ref,
             sum(CASE WHEN CAST(date_trunc('day', ts) AS DATE) > DATE '2024-01-15'
                      THEN value ELSE 0.0 END) AS m_cur
      FROM events
      GROUP BY 1
    ),
    t AS (
      SELECT *, sum(m_ref) OVER () AS t_ref, sum(m_cur) OVER () AS t_cur FROM g
    )
    SELECT value,
           round(m_ref, 6) AS measure_ref,
           round(m_cur, 6) AS measure_cur,
           round(m_ref / t_ref, 6) AS share_ref,
           round(m_cur / t_cur, 6) AS share_cur,
           round(m_cur / t_cur - m_ref / t_ref, 6) AS delta_share,
           round(CASE WHEN t_cur <> t_ref THEN (m_cur - m_ref) / (t_cur - t_ref) END, 6)
             AS explains_frac,
           round(0.5 * (
             CASE WHEN m_ref / t_ref > 0
                  THEN (m_ref / t_ref) * ln(2.0 * (m_ref / t_ref) / (m_ref / t_ref + m_cur / t_cur))
                  ELSE 0.0 END
             + CASE WHEN m_cur / t_cur > 0
                    THEN (m_cur / t_cur) * ln(2.0 * (m_cur / t_cur) / (m_ref / t_ref + m_cur / t_cur))
                    ELSE 0.0 END), 6) AS js_surprise
    FROM t
    """,
)
def events_contribution_analysis(spark, sf_dir):
    """Root-cause contribution analysis (Adtributor, NSDI 2014): when
    the monitored total moves between two halves of the month, rank
    event types by how much of the move each explains (explains_frac)
    and how surprising its share shift is (per-value Jensen-Shannon
    term) — the "which segment broke the metric" operator next to the
    drift family. ONE variety-bounded groupBy over the data; totals via
    a window on the bounded table."""
    from zparse_spark.operators.stats import contribution_analysis

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.when(F.to_date("ts") <= F.lit("2024-01-15").cast("date"), F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("period"),
    )
    return contribution_analysis(ev, "event_type", "value")


@register(
    "drift_category_births",
    """
    WITH cur AS (
      SELECT CASE WHEN doc_id % 37 = 0 THEN 'tlh' ELSE lang END AS lang
      FROM documents
      WHERE lang <> 'de' OR doc_id % 37 = 0
    ),
    c AS (SELECT lang AS value, count(*) AS n_cur FROM cur GROUP BY 1),
    r AS (SELECT lang AS value, count(*) AS n_ref FROM documents GROUP BY 1),
    j AS (
      SELECT coalesce(c.value, r.value) AS value, c.n_cur, r.n_ref
      FROM c FULL OUTER JOIN r ON c.value IS NOT DISTINCT FROM r.value
    ),
    tt AS (SELECT *, sum(n_cur) OVER () AS t_cur, sum(n_ref) OVER () AS t_ref FROM j)
    SELECT 'new' AS status, value, n_cur AS n, round(CAST(n_cur AS DOUBLE) / t_cur, 6) AS share
    FROM tt WHERE n_ref IS NULL
    UNION ALL
    SELECT 'gone' AS status, value, n_ref AS n, round(CAST(n_ref AS DOUBLE) / t_ref, 6) AS share
    FROM tt WHERE n_cur IS NULL
    """,
)
def drift_category_births(spark, sf_dir):
    """New/vanished category detector — the support-change drift PSI/KL
    cannot express: a derived current snapshot plants a new language
    ('tlh', every 37th doc) and retires one ('de' fully excluded), and
    the operator must emit exactly those births/deaths with counts and
    shares. Two variety-bounded groupBys + a null-safe full outer join
    on the category value."""
    from zparse_spark.operators.stats import category_drift

    ref = _t(spark, sf_dir, "documents").select("lang")
    cur = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("lang") != "de") | (F.col("doc_id") % 37 == 0))
        .select(
            F.when(F.col("doc_id") % 37 == 0, F.lit("tlh"))
            .otherwise(F.col("lang"))
            .alias("lang")
        )
    )
    return category_drift(cur, ref, "lang")


@register(
    "anomaly_events_seasonal",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1
    ),
    d AS (SELECT day, n, dayofweek(day) + 1 AS dow FROM daily),
    b AS (
      SELECT *, median(n) OVER (PARTITION BY dow) AS baseline_med FROM d
    ),
    m AS (
      SELECT *, median(abs(n - baseline_med)) OVER (PARTITION BY dow) AS mad FROM b
    )
    SELECT day, dow, n,
           round(baseline_med, 6) AS baseline_med,
           round(mad, 6) AS mad,
           round((n - baseline_med) / greatest(mad, 0.5), 6) AS deviation,
           abs((n - baseline_med) / greatest(mad, 0.5)) >= 3.0 AS flagged
    FROM m
    """,
)
def anomaly_events_seasonal(spark, sf_dir):
    """Weekday-seasonal volume monitor: each day's exact count against
    its own weekday's median, deviation in robust MAD units — the
    seasonality-aware sibling of the CUSUM monitor: a Tuesday at Sunday
    volume flags, a Sunday looking like a Sunday does not. One
    groupBy(day) over events; medians are exact interpolated
    percentiles on the bounded day table (DuckDB's dayofweek is
    0=Sunday, Spark's 1=Sunday — the oracle shifts to Spark's
    convention)."""
    from zparse_spark.operators.stats import seasonal_volume_anomaly

    return seasonal_volume_anomaly(_t(spark, sf_dir, "events"))


@register(
    "schema_evolution_documents",
    """
    WITH old_s AS (
      SELECT column_name AS col_name,
             CASE lower(column_type)
               WHEN 'varchar' THEN 'string'
               ELSE lower(column_type) END AS col_type,
             ("null" = 'YES') AS nullable
      FROM (DESCRIBE SELECT * FROM documents)
    ),
    new_s AS (
      SELECT * FROM (VALUES
        ('doc_id', 'bigint', TRUE),
        ('text', 'string', TRUE),
        ('source', 'string', FALSE),
        ('n_chars', 'int', TRUE),
        ('quality', 'double', TRUE)
      ) AS t(col_name, col_type, nullable)
    ),
    j AS (
      SELECT coalesce(o.col_name, n.col_name) AS name,
             o.col_type AS t_old, n.col_type AS t_new,
             o.nullable AS n_old, n.nullable AS n_new
      FROM old_s o FULL OUTER JOIN new_s n ON o.col_name = n.col_name
    ),
    cls AS (
      SELECT name, t_old, t_new,
             CASE
               WHEN t_old IS NULL AND n_new THEN 'added_optional'
               WHEN t_old IS NULL THEN 'added_required'
               WHEN t_new IS NULL THEN 'dropped'
               WHEN t_old = t_new AND n_old AND NOT n_new THEN 'nullability_tightened'
               WHEN t_old = t_new AND NOT n_old AND n_new THEN 'nullability_relaxed'
               WHEN t_old = t_new THEN 'unchanged'
               WHEN (t_old, t_new) IN (('tinyint','smallint'),('tinyint','int'),
                                       ('tinyint','bigint'),('smallint','int'),
                                       ('smallint','bigint'),('int','bigint'),
                                       ('float','double')) THEN 'type_widened'
               ELSE 'type_changed'
             END AS status
      FROM j
    )
    SELECT name, t_old, t_new, status,
           status IN ('added_required','dropped','type_changed','nullability_tightened')
             AS breaking
    FROM cls WHERE status <> 'unchanged'
    """,
)
def schema_evolution_documents(spark, sf_dir):
    """Schema-evolution compatibility gate: the documents table's LIVE
    schema (introspected from the parquet footer by each engine
    independently — Spark's StructType vs DuckDB's DESCRIBE, normalized
    to one type vocabulary) diffed against a proposed evolved schema
    that plants one of each change class: a dropped column, an added
    optional column, a bigint->int narrowing (breaking — not the safe
    widening direction), and a nullability tightening. Metadata-sized
    full outer join; the data-level diff is X112/X146's job."""
    from zparse_spark.operators.checksum import schema_evolution_report

    live = _t(spark, sf_dir, "documents").schema
    old = spark.createDataFrame(
        [(f.name, f.dataType.simpleString(), bool(f.nullable)) for f in live.fields],
        "col_name string, col_type string, nullable boolean",
    )
    new = spark.createDataFrame(
        [
            ("doc_id", "bigint", True),
            ("text", "string", True),
            ("source", "string", False),
            ("n_chars", "int", True),
            ("quality", "double", True),
        ],
        "col_name string, col_type string, nullable boolean",
    )
    return schema_evolution_report(old, new)


def _pagerank_oracle_sql(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled power iteration: one CTE per step — the textbook
    definition, no iteration framework, so a green row certifies the
    Spark loop (cached transition matrix, per-step join+groupBy,
    lineage checkpointing) against the math itself."""
    head = """
    WITH e0 AS (
      SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
             's:' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(count(*) AS DOUBLE) AS w
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
      GROUP BY 1, 2
    ),
    e AS (SELECT src, dst, w FROM e0 UNION ALL SELECT dst AS src, src AS dst, w FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst AS node FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
    trans AS (SELECT e.src, e.dst, e.w / o.ow AS p FROM e JOIN outw o ON e.src = o.src),
    r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn),
    """
    steps = []
    for i in range(1, iterations + 1):
        steps.append(
            f"""r{i} AS (
      SELECT n.node,
             (1.0 - {damping}) / nn.n + {damping} * coalesce(c.s, 0.0) AS pr
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (SELECT t.dst, sum(r.pr * t.p) AS s
                 FROM r{i - 1} r JOIN trans t ON t.src = r.node GROUP BY 1) c
        ON c.dst = n.node
    )"""
        )
    return (
        head
        + ",\n".join(steps)
        + f"\nSELECT node, round(pr, 6) AS pr FROM r{iterations}"
    )


@register("graph_pagerank_suppliers", _pagerank_oracle_sql())
def graph_pagerank_suppliers(spark, sf_dir):
    """PageRank over the weighted customer<->supplier bipartite graph
    (edges = lineitem counts through orders, both directions): the
    importance prior for source weighting. 5 fixed power steps, d=0.85;
    the DuckDB oracle is the same recurrence UNROLLED as 5 CTEs, so the
    iterative machinery (cached transition matrix, one join + one
    map-side-combined groupBy per step, localCheckpoint lineage
    truncation) is value-checked against the bare definition for every
    node. Float sums re-associate across engines; round-6 on ranks of
    order 1/N absorbs the ~1e-13 drift."""
    from zparse_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey").isNotNull())
    e0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    edges = e0.unionByName(
        e0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    ranks = pagerank(edges, iterations=5, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("pr"))


@register(
    "corpus_search_conjunctive",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ), m AS (
      SELECT doc_id, count(DISTINCT token) AS n_terms, count(*) AS score
      FROM toks WHERE token IN ('scan', 'merge', 'window') GROUP BY doc_id
    )
    SELECT doc_id, score FROM m WHERE n_terms = 3
    """,
)
def corpus_search_conjunctive(spark, sf_dir):
    """Conjunctive posting-list search: docs containing ALL of
    {scan, merge, window}, scored by summed term frequency. The term
    filter prunes the token stream to the query's own postings before
    the one groupBy(doc); tokenization is byte-identical to the
    vocabulary/TF-IDF index side."""
    from zparse_spark.functions.text import conjunctive_search

    return conjunctive_search(
        _t(spark, sf_dir, "documents"), ["scan", "merge", "window"]
    )


@register(
    "stats_inter_arrival",
    """
    WITH g AS (
      SELECT event_type,
             CAST(floor((epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (PARTITION BY event_type, user_id
                                                   ORDER BY epoch_us(ts)))
                        / 1000000) AS BIGINT) AS gap_s
      FROM events
    )
    SELECT event_type, count(*) AS n_gaps,
           quantile_cont(gap_s, 0.25) AS q1_s,
           quantile_cont(gap_s, 0.5) AS median_s,
           quantile_cont(gap_s, 0.75) AS q3_s
    FROM g WHERE gap_s IS NOT NULL GROUP BY event_type
    """,
)
def stats_inter_arrival(spark, sf_dir):
    """Inter-arrival cadence per event type: exact quartiles of the
    within-user gap in whole seconds — 'errors now arrive 3× more
    often' surfaces here while daily totals still look plausible.
    Dyadic probes only (X37's percentile ≡ quantile_cont contract is
    exact on integer data at .25/.5/.75); floor(), not cast, for the
    second delta (Spark's double→long truncates, DuckDB's rounds)."""
    from zparse_spark.operators.stats import inter_arrival_stats

    return inter_arrival_stats(_t(spark, sf_dir, "events"))


@register(
    "profile_suggest_checks",
    """
    WITH nq AS (
      SELECT 'l_quantity' AS c, quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.75) AS q3,
             count(*) AS n, count(*) - count(l_quantity) AS nn
      FROM lineitem
      UNION ALL
      SELECT 'l_linenumber', quantile_cont(l_linenumber, 0.25),
             quantile_cont(l_linenumber, 0.75),
             count(*), count(*) - count(l_linenumber)
      FROM lineitem
    ), ranges AS (
      SELECT c AS "column", 'numeric_range' AS family,
             c || ' IS NULL OR ' || c || ' BETWEEN '
               || printf('%.4f', q1 - 1.5 * (q3 - q1)) || ' AND '
               || printf('%.4f', q3 + 1.5 * (q3 - q1)) AS suggested_predicate,
             CAST(n - nn AS BIGINT) AS n_support,
             round(nn * 1.0 / n, 6) AS null_share
      FROM nq
    ), nn_num AS (
      SELECT c AS "column", 'not_null' AS family,
             c || ' IS NOT NULL' AS suggested_predicate,
             CAST(n AS BIGINT) AS n_support, 0.0 AS null_share
      FROM nq WHERE nn = 0
    ), doms AS (
      SELECT 'l_returnflag' AS c,
             (SELECT string_agg('''' || v || '''', ', ' ORDER BY v)
              FROM (SELECT DISTINCT l_returnflag AS v FROM lineitem
                    WHERE l_returnflag IS NOT NULL)) AS lits,
             (SELECT count(*) FROM lineitem) AS n,
             (SELECT count(*) - count(l_returnflag) FROM lineitem) AS nn
      UNION ALL
      SELECT 'l_linestatus',
             (SELECT string_agg('''' || v || '''', ', ' ORDER BY v)
              FROM (SELECT DISTINCT l_linestatus AS v FROM lineitem
                    WHERE l_linestatus IS NOT NULL)),
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) - count(l_linestatus) FROM lineitem)
    ), dom_rows AS (
      SELECT c AS "column", 'categorical_domain' AS family,
             c || ' IS NULL OR ' || c || ' IN (' || lits || ')' AS suggested_predicate,
             CAST(n - nn AS BIGINT) AS n_support,
             round(nn * 1.0 / n, 6) AS null_share
      FROM doms
    ), nn_cat AS (
      SELECT c AS "column", 'not_null' AS family,
             c || ' IS NOT NULL' AS suggested_predicate,
             CAST(n AS BIGINT) AS n_support, 0.0 AS null_share
      FROM doms WHERE nn = 0
    )
    SELECT * FROM ranges UNION ALL SELECT * FROM nn_num
    UNION ALL SELECT * FROM dom_rows UNION ALL SELECT * FROM nn_cat
    """,
)
def profile_suggest_checks(spark, sf_dir):
    """Constraint discovery → authoring bridge: profile lineitem and
    emit ready-to-paste CHECK predicates (X36 grammar) — Tukey-fence
    numeric ranges (fixed %.4f formatting so any engine reproduces the
    string), observed not-null invariants, and small categorical
    domains. Suggestions carry support stats: evidence for a human to
    promote, never auto-enforced."""
    from zparse_spark.operators.stats import suggest_check_constraints

    return suggest_check_constraints(
        _t(spark, sf_dir, "lineitem"),
        numeric_cols=["l_quantity", "l_linenumber"],
        categorical_cols=["l_returnflag", "l_linestatus"],
    )


@register(
    "anomaly_events_cusum",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    grid AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
             t.event_type
      FROM mm, (SELECT DISTINCT event_type FROM daily) t
    ), dense AS (
      SELECT g.day, g.event_type, CAST(coalesce(daily.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN daily
        ON g.day = daily.day AND g.event_type = daily.event_type
    ), tot AS (
      SELECT event_type, sum(n) AS tot_n, count(*) AS kd FROM dense GROUP BY event_type
    ), d AS (
      SELECT dense.day, dense.event_type, dense.n, tot.tot_n, tot.kd
      FROM dense JOIN tot ON dense.event_type = tot.event_type
    ), w AS (
      SELECT *, CAST(row_number() OVER wo AS BIGINT) AS rn,
             sum(kd * n - tot_n) OVER wr AS s_int
      FROM d
      WINDOW wo AS (PARTITION BY event_type ORDER BY day),
             wr AS (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING)
    ), u AS (
      SELECT *, s_int - rn * (kd * 2.0) AS s_up, s_int + rn * (kd * 2.0) AS s_dn FROM w
    ), v AS (
      SELECT *, min(s_up) OVER wr2 AS mn, max(s_dn) OVER wr2 AS mx
      FROM u
      WINDOW wr2 AS (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, day, n,
           round((s_up - least(mn, 0.0)) / kd, 6) AS cusum_up,
           round((greatest(mx, 0.0) - s_dn) / kd, 6) AS cusum_down,
           ((s_up - least(mn, 0.0)) / kd > 10.0)
             OR ((greatest(mx, 0.0) - s_dn) / kd > 10.0) AS alarm
    FROM v
    """,
)
def anomaly_events_cusum(spark, sf_dir):
    """CUSUM change-point detection per event type (slack 2/day,
    threshold 10): the persistent-shift detector — accumulates small
    sustained level changes the single-day z-score and the global
    slope both miss. Window-expressible closed form (prefix sums minus
    running min) on exact BIGINT scaled counts; the slack correction is
    one pointwise IEEE multiply-subtract, never a float accumulation —
    bit-identical cross-engine."""
    from zparse_spark.operators.stats import cusum_shift_detection

    return cusum_shift_detection(_t(spark, sf_dir, "events"), slack=2.0, threshold=10.0)


# ---------------------------------------------------------------------------
# HTML/markup stripping (functions/text.py::strip_markup)
# ---------------------------------------------------------------------------

# Deterministic HTML-ish wrapper: script/style bodies that MUST NOT leak
# (code with a '<' inside), comments, entities incl. the &amp;lt;
# double-escape trap, and the doc's own text split across two elements.
_HTML_FIXTURE = (
    "'<html><head><style>p {{ color: red }}</style>"
    "<script>var x = 1 < 2 && y > 0;</script></head>"
    "<body><h1 class=\"t\">' || substr(text, 1, 40) || '</h1>"
    "<!-- hidden comment --><p>' || substr(text, 41, 80) || '</p>"
    "<p>&amp;lt;kept&amp;gt; &lt;b&gt;bold&lt;/b&gt; "
    "&quot;q&#39;s&quot;&nbsp;end</p></body></html>'"
)


@register(
    "corpus_strip_markup",
    f"""
    WITH src AS (
      SELECT doc_id, {_HTML_FIXTURE.replace('{{', '{').replace('}}', '}')} AS html
      FROM documents WHERE text IS NOT NULL
    ), s1 AS (
      SELECT doc_id,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
            '(?s)<!--.*?-->', ' ', 'g'),
          '(?s)<[^>]*>', ' ', 'g') AS t
      FROM src
    ), s2 AS (
      SELECT doc_id,
        replace(replace(replace(replace(replace(replace(t,
          '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
          '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
      FROM s1
    )
    SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS clean_text
    FROM s2
    """,
)
def corpus_strip_markup(spark, sf_dir):
    """HTML→training-text over a deterministic markup wrapper: script
    and style BODIES must vanish (tag-only stripping would leak code
    into the corpus), comments and tags drop, core entities decode with
    &amp; last so &amp;lt; correctly yields a literal '<'-escape, and
    whitespace collapses. Map-only lookaround-free regexp cascade,
    valid under both Java regex and RE2 — the DuckDB twin applies the
    identical chain (entity pass via plain replace: fixed strings need
    no regex engine at all there)."""
    from zparse_spark.functions.text import strip_markup

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    html = F.expr(
        _HTML_FIXTURE.replace("{{", "{").replace("}}", "}")
    )
    return d.select("doc_id", strip_markup(html).alias("clean_text"))


def _shuffle_oracle_sql(seed: int = 0, n_shards: int = 16) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    hv2 = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed + 1_000_003}'")
    return f"""
    WITH a AS (
      SELECT doc_id, CAST({hv} % {n_shards} AS INT) AS shard, {hv2} AS ord
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY ord, CAST(doc_id AS VARCHAR)) AS BIGINT)
             AS pos
    FROM a
    """


@register("corpus_shuffle_assign", _shuffle_oracle_sql())
def corpus_shuffle_assign(spark, sf_dir):
    """Reproducible training-order shuffle: (shard, pos) is a pure
    function of (doc_id, seed) — retries, resumes, engines and
    partitioning all deal the identical permutation (orderBy(rand())
    re-deals on every retry). Never a global sort: md5 bucket map-side,
    rank within shard only."""
    from zparse_spark.operators.filtering import shuffle_assign

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_assign(d, key_col="doc_id", n_shards=16, seed=0).select(
        "doc_id", "shard", "pos"
    )


# ---------------------------------------------------------------------------
# Bounded edit-distance fuzzy key join (operators/editdist.py)
# ---------------------------------------------------------------------------


@register(
    "dedup_fuzzy_customer_names",
    """
    SELECT CAST(a.c_custkey AS VARCHAR) AS id_a,
           CAST(b.c_custkey AS VARCHAR) AS id_b,
           a.c_name AS key_a, b.c_name AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b
      ON CAST(a.c_custkey AS VARCHAR) < CAST(b.c_custkey AS VARCHAR)
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_fuzzy_customer_names(spark, sf_dir):
    """Exact fuzzy-key matching: every customer-name pair within
    Levenshtein distance 1, found via deletion-neighborhood candidate
    generation (FastSS/SymSpell) and verified with Spark's built-in
    JVM levenshtein — never an all-pairs join, never Python, never a
    probabilistic miss. The DuckDB oracle IS the quadratic all-pairs
    definition, so a green row certifies the pruning lossless. The
    entity-key sibling of dedup_setsim_prefix_join (set semantics) for
    keys mangled in re-ingestion (reference contract: exact duplicate-
    key rejection, toml/parser.rs:100-122, lifted to distance <= 1)."""
    from zparse_spark.operators.editdist import bounded_edit_distance_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return bounded_edit_distance_join(
        c, id_col="c_custkey", key_col="c_name", k=1
    )


@register(
    "fuzzy_jw_customer_names",
    """
    SELECT CAST(a.c_custkey AS VARCHAR) AS id_a,
           CAST(b.c_custkey AS VARCHAR) AS id_b,
           a.c_name AS key_a, b.c_name AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist,
           round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
    FROM customer a JOIN customer b
      ON CAST(a.c_custkey AS VARCHAR) < CAST(b.c_custkey AS VARCHAR)
    WHERE levenshtein(a.c_name, b.c_name) <= 1
      AND jaro_winkler_similarity(a.c_name, b.c_name) >= 0.9
    """,
)
def fuzzy_jw_customer_names(spark, sf_dir):
    """Record-linkage scoring: Jaro-Winkler over the complete lev<=1
    candidate set. Spark has no built-in JW, so this exercises the one
    sanctioned Python seat — an Arrow-batched pandas UDF running ONLY on
    blocked pairs — against DuckDB's INDEPENDENT built-in
    ``jaro_winkler_similarity``: two implementations of the textbook
    spec (0.7 boost threshold, prefix cap 4, p=0.1) agreeing to 6
    decimals row-for-row across every surviving pair."""
    from zparse_spark.operators.editdist import jaro_winkler_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return jaro_winkler_join(
        c, id_col="c_custkey", key_col="c_name", k_block=1, threshold=0.9
    )


# ---------------------------------------------------------------------------
# Order-insensitive portable table checksum (operators/checksum.py)
# ---------------------------------------------------------------------------


def _hv60_sql(expr: str) -> str:
    """First 15 hex nibbles of md5(expr) as a 60-bit integer — the SQL
    twin of checksum.row_hash60's F.conv(substring(md5,1,15),16,10)."""
    m = f"md5({expr})"
    terms = []
    for k in range(15):
        c = f"ascii(substr({m}, {k + 1}, 1))"
        nib = f"CAST(CASE WHEN {c} >= 97 THEN {c} - 87 ELSE {c} - 48 END AS BIGINT)"
        terms.append(f"{nib} * {16 ** (14 - k)}")
    return "(" + " + ".join(terms) + ")"


def _checksum_docs_oracle() -> str:
    row = (
        "concat_ws(chr(1), coalesce(CAST(doc_id AS VARCHAR), chr(0)),"
        " coalesce(lang, chr(0)), coalesce(CAST(n_chars AS VARCHAR), chr(0)),"
        " coalesce(text, chr(0)))"
    )
    return f"""
    WITH hv AS (SELECT source, {_hv60_sql(row)} AS h FROM documents)
    SELECT source,
           count(*) AS n_rows,
           bit_xor(h) AS xor_hash,
           CAST(sum(h) % {1 << 60} AS BIGINT) AS sum_hash
    FROM hv GROUP BY source
    """


@register("checksum_documents_by_source", _checksum_docs_oracle())
def checksum_documents_by_source(spark, sf_dir):
    """Engine-portable content checksum of the documents table per
    source: count + bit_xor + modular sum over 60-bit md5-nibble row
    hashes of the canonical serialization (columns sorted by name,
    chr(1)/chr(0) framing). Order- and partitioning-insensitive,
    map-side mergeable — at 10^12 rows the exchange carries three
    int64s per source. A resumed, repartitioned, or cross-engine rerun
    must reproduce these digests bit-for-bit; the DuckDB oracle proves
    the cross-engine leg. Table-scale analog of the reference's
    byte-exact golden-file tests (tests/json_parser_tests.rs)."""
    from zparse_spark.operators.checksum import table_checksum

    d = _t(spark, sf_dir, "documents")
    return table_checksum(d, group_cols=["source"])


def _bucket_diff_oracle_sql(n_buckets: int = 64) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    row = (
        "concat_ws(chr(1), coalesce(CAST(doc_id AS VARCHAR), chr(0)),"
        " coalesce(lang, chr(0)), coalesce(CAST(n_chars AS VARCHAR), chr(0)),"
        " coalesce(source, chr(0)), coalesce(text, chr(0)))"
    )
    bkt = f"({_hv_sql('CAST(doc_id AS VARCHAR)')}) % {n_buckets}"
    digest = f"""
      SELECT {bkt} AS bucket, count(*) AS n_rows,
             bit_xor({{h}}) AS xor_hash,
             CAST(sum(CAST({{h}} AS HUGEINT)) % 1152921504606846976 AS BIGINT)
               AS sum_hash
      FROM {{src}} GROUP BY 1"""
    h = _hv60_sql(row)
    return f"""
    WITH rgt_rows AS (
      SELECT doc_id,
             CASE WHEN CAST(doc_id AS BIGINT) % 101 = 0
                  THEN text || ' EDITED' ELSE text END AS text,
             lang, source, n_chars
      FROM documents WHERE CAST(doc_id AS BIGINT) % 103 <> 0
    ),
    dl AS ({digest.format(h=h, src="documents")}),
    dr AS ({digest.format(h=h, src="rgt_rows")}),
    j AS (
      SELECT coalesce(dl.bucket, dr.bucket) AS bucket,
             dl.n_rows AS nl, dr.n_rows AS nr,
             dl.xor_hash AS xl, dr.xor_hash AS xr,
             dl.sum_hash AS sl, dr.sum_hash AS sr
      FROM dl FULL JOIN dr ON dl.bucket = dr.bucket
    )
    SELECT bucket,
           CASE WHEN nr IS NULL THEN 'only_left'
                WHEN nl IS NULL THEN 'only_right'
                ELSE 'changed' END AS status,
           nl AS n_rows_left, nr AS n_rows_right,
           xl AS xor_left, xr AS xor_right
    FROM j
    WHERE NOT (nl IS NOT DISTINCT FROM nr AND xl IS NOT DISTINCT FROM xr
               AND sl IS NOT DISTINCT FROM sr)
    """


@register("diff_documents_buckets", _bucket_diff_oracle_sql())
def diff_documents_buckets(spark, sf_dir):
    """X146: Merkle-style snapshot diff — documents vs a derived
    second snapshot (every 101st doc edited, every 103rd dropped,
    derived from doc_id so both engines build the identical snapshot):
    64 portable hash buckets reduced to checksum triples per side,
    full-outer join, ONLY differing buckets emitted. Equal buckets
    vanish — the 100 TB answer to 'what changed since the checkpoint'
    without a row-level anti-join."""
    from zparse_spark.operators.checksum import bucket_checksum_diff

    d = _t(spark, sf_dir, "documents")
    edited = (
        d.filter(F.col("doc_id").cast("long") % 103 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id").cast("long") % 101 == 0,
                F.concat(F.col("text"), F.lit(" EDITED")),
            ).otherwise(F.col("text")),
        )
    )
    return bucket_checksum_diff(d, edited, "doc_id", n_buckets=64)




# ---------------------------------------------------------------------------
# Gaps-and-islands key continuity (operators/stats.py key_gaps)
# ---------------------------------------------------------------------------


@register(
    "gaps_orders_by_priority",
    """
    WITH k AS (
      SELECT DISTINCT o_orderpriority AS pri, CAST(o_orderkey AS BIGINT) AS k
      FROM orders
    ), lagged AS (
      SELECT pri, k AS next_key,
             lag(k) OVER (PARTITION BY pri ORDER BY k) AS prev_key
      FROM k
    )
    SELECT pri, prev_key, next_key, next_key - prev_key - 1 AS n_missing
    FROM lagged
    WHERE prev_key IS NOT NULL AND next_key - prev_key > 1
    """,
)
def gaps_orders_by_priority(spark, sf_dir):
    """Key-continuity audit: every maximal run of orderkeys missing
    from each priority class's keyset (the per-group keyspace is sparse
    even though the global one is dense — exactly the 'which keys did
    this partition lose' validation question). Computed with the
    two-level binned decomposition (parallel intra-bin windows + a
    bin-summary stitch), never a global-sort window; the oracle is the
    textbook global lag(), so a green row proves the decomposition
    exact."""
    from zparse_spark.operators.stats import key_gaps

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"), "o_orderkey"
    )
    return key_gaps(o, key_col="o_orderkey", group_cols=["pri"], bin_size=1024)


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (functions/text.py bm25_search)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("merge", "spark", "window")


@register(
    "corpus_search_bm25",
    f"""
    WITH toks AS (
      SELECT doc_id AS d,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    clean AS (SELECT d, token FROM toks WHERE token <> ''),
    dl AS (SELECT d, count(*) AS dl FROM clean GROUP BY 1),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    hits AS (SELECT d, token FROM clean
             WHERE token IN {repr(_BM25_TERMS)}),
    tf AS (SELECT d, token, count(*) AS tf FROM hits GROUP BY 1, 2),
    docfreq AS (SELECT token, count(DISTINCT d) AS df FROM hits GROUP BY 1),
    scored AS (
      SELECT tf.d,
             round(
               ln(1.0 + (corpus.n - docfreq.df + 0.5) / (docfreq.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl)),
               6) AS contrib
      FROM tf JOIN docfreq USING (token) JOIN dl USING (d) CROSS JOIN corpus
    ),
    per_doc AS (
      SELECT d, round(sum(contrib), 6) AS score, count(*) AS n_hit
      FROM scored GROUP BY d
    ),
    ranked AS (
      SELECT d AS doc_id,
             row_number() OVER (ORDER BY score DESC, d ASC) AS rank,
             score, n_hit
      FROM per_doc
    )
    SELECT doc_id, rank, score, n_hit FROM ranked WHERE rank <= 10
    """,
)
def corpus_search_bm25(spark, sf_dir):
    """Okapi BM25 top-10 for a literal 3-term query over documents.
    The token stream is filtered to the query terms BEFORE tf/df
    aggregation (pushed isin over the explode); doc length + corpus
    stats ride one full-stream groupBy; ranking is a TakeOrdered of
    the scored doc set, and the trailing row_number window runs on the
    ALREADY-limited top-k rows (k rows, one partition — bounded by
    construction). Per-term contributions are rounded to 6 decimals
    before the per-doc sum so the ranking is engine-portable (same
    contract as corpus_tfidf_top_terms)."""
    from zparse_spark.functions.text import bm25_search

    return bm25_search(
        _t(spark, sf_dir, "documents"), list(_BM25_TERMS), top_k=10
    ).withColumn("rank", F.col("rank").cast("long"))


@register(
    "corpus_search_ndcg",
    f"""
    WITH toks AS (
      SELECT doc_id AS d,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    clean AS (SELECT d, token FROM toks WHERE token <> ''),
    dl AS (SELECT d, count(*) AS dl FROM clean GROUP BY 1),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    hits AS (SELECT d, token FROM clean
             WHERE token IN {repr(_BM25_TERMS)}),
    tf AS (SELECT d, token, count(*) AS tf FROM hits GROUP BY 1, 2),
    docfreq AS (SELECT token, count(DISTINCT d) AS df FROM hits GROUP BY 1),
    scored AS (
      SELECT tf.d,
             round(
               ln(1.0 + (corpus.n - docfreq.df + 0.5) / (docfreq.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl)),
               6) AS contrib
      FROM tf JOIN docfreq USING (token) JOIN dl USING (d) CROSS JOIN corpus
    ),
    per_doc AS (
      SELECT d, round(sum(contrib), 6) AS score, count(*) AS n_hit
      FROM scored GROUP BY d
    ),
    ranked AS (
      SELECT d, row_number() OVER (ORDER BY score DESC, d ASC) AS rank
      FROM per_doc
    ),
    grades AS (SELECT d, count(DISTINCT token) AS grade FROM hits GROUP BY 1),
    topk AS (
      SELECT rank, grade FROM ranked JOIN grades USING (d) WHERE rank <= 10
    ),
    dcg AS (
      SELECT count(*) AS n_ranked,
             round(sum(round((power(2.0, grade) - 1.0) / log2(rank + 1.0), 6)), 6)
               AS dcg,
             min(CASE WHEN grade >= 2 THEN rank END) AS first_good
      FROM topk
    ),
    ideal AS (
      SELECT grade,
             row_number() OVER (ORDER BY grade DESC, d ASC) AS irank
      FROM grades
    ),
    idcg AS (
      SELECT round(sum(round((power(2.0, grade) - 1.0) / log2(irank + 1.0), 6)), 6)
               AS idcg
      FROM ideal WHERE irank <= 10
    )
    SELECT CAST(n_ranked AS BIGINT) AS n_ranked, dcg.dcg AS dcg, idcg.idcg AS idcg,
           round(dcg.dcg / idcg.idcg, 6) AS ndcg,
           round(1.0 / first_good, 6) AS mrr
    FROM dcg, idcg
    """,
)
def corpus_search_ndcg(spark, sf_dir):
    """X144: nDCG@10 + MRR@10 of the BM25 ranking against the
    independent deterministic judgment grade = distinct query terms
    contained (judged corpus-wide, so IDCG can exceed the scorer's
    picks). Every gain summand rounded before the sum; one trailing
    division each for nDCG and MRR — bit-matched cross-engine."""
    from zparse_spark.functions.text import retrieval_ndcg

    return retrieval_ndcg(
        _t(spark, sf_dir, "documents"), list(_BM25_TERMS), top_k=10
    )


# ---------------------------------------------------------------------------
# Interval-overlap self-join (operators/asof.py interval_overlap_join)
# ---------------------------------------------------------------------------


@register(
    "overlap_shipment_windows",
    """
    WITH iv2 AS (
      SELECT l_partkey AS partkey,
             concat_ws('-', CAST(l_orderkey AS VARCHAR),
                            CAST(l_linenumber AS VARCHAR)) AS id,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(l_shipdate AS DATE)) AS BIGINT)
               + CAST(l_quantity AS BIGINT) AS e
      FROM lineitem
    )
    SELECT a.partkey, a.id AS id_a, b.id AS id_b,
           greatest(a.s, b.s) AS overlap_start,
           least(a.e, b.e) AS overlap_end
    FROM iv2 a JOIN iv2 b
      ON a.partkey = b.partkey AND a.id < b.id
     AND greatest(a.s, b.s) <= least(a.e, b.e)
    """,
)
def overlap_shipment_windows(spark, sf_dir):
    """Concurrent-shipment audit: all pairs of shipment windows
    [shipdate, shipdate + quantity days] for the SAME part that
    overlap in time, with the exact intersection. Grid-binned
    equi-join with the count-once-bin filter standing in for pair
    dedup (no distinct shuffle); the oracle is the per-group theta
    join, so a green row proves the binning complete AND the
    count-once rule exact (a dropped bin loses a pair, a wrong rule
    duplicates one — either flips the row count)."""
    from zparse_spark.operators.asof import interval_overlap_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("id"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("s"),
        F.col("l_quantity").cast("long").alias("q"),
    ).withColumn("e", F.col("s") + F.col("q"))
    return interval_overlap_join(
        li, id_col="id", start_col="s", end_col="e",
        group_cols=["partkey"], bin_width=32,
    )


# ---------------------------------------------------------------------------
# Cross-table CHECK constraint (operators/rules.py cross_table_check_violations)
# ---------------------------------------------------------------------------


@register(
    "check_lineitem_ship_after_order",
    """
    SELECT CAST(l.l_orderkey AS BIGINT) AS orderkey,
           CAST(l.l_linenumber AS INT) AS linenumber,
           'K10' AS rule_id,
           concat('shipped ',
                  CAST(date_diff('day', CAST(l.l_shipdate AS DATE),
                                 CAST(o.o_orderdate AS DATE)) AS VARCHAR),
                  ' days before order') AS detail
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)
    """,
)
def check_lineitem_ship_after_order(spark, sf_dir):
    """Cross-table CHECK: a lineitem may not ship before its order was
    placed — the predicate reads columns from BOTH sides of the
    fact→dimension join. Both inputs are pruned to the predicate's
    columns before the join (the 100 TB dimension never ships unused
    columns through the exchange); ANSI NULL-passes semantics; the
    29k-violation output proves the check exercises the join, not an
    empty fixture."""
    from zparse_spark.operators.rules import cross_table_check_violations

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").cast("int").alias("linenumber"),
        F.col("l_shipdate").cast("date").alias("shipdate"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").cast("date").alias("orderdate"),
    )
    detail = F.concat(
        F.lit("shipped "),
        F.datediff(F.col("orderdate"), F.col("shipdate")).cast("string"),
        F.lit(" days before order"),
    )
    return cross_table_check_violations(
        li,
        o,
        on=["orderkey"],
        predicate="shipdate >= orderdate",
        rule_id="K10",
        fact_cols=["orderkey", "linenumber"],
        detail=detail,
    )


# ---------------------------------------------------------------------------
# Dataset card: one-pass corpus summary in long form
# ---------------------------------------------------------------------------

_CARD_FP = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


@register(
    "corpus_dataset_card",
    f"""
    WITH agg AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
             CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
             round(100.0 * (count(*) - count(text)) / count(*), 6) AS null_text_pct,
             round(100.0 * (count(text) - count(DISTINCT {_CARD_FP}))
                   / count(*), 6) AS exact_dup_pct,
             round(avg(n_chars), 6) AS mean_chars,
             round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
             CAST(max(n_chars) AS DOUBLE) AS max_chars
      FROM documents
    )
    SELECT m.metric, m.value FROM agg, LATERAL (
      VALUES ('n_docs', n_docs), ('n_sources', n_sources),
             ('n_langs', n_langs), ('null_text_pct', null_text_pct),
             ('exact_dup_pct', exact_dup_pct), ('mean_chars', mean_chars),
             ('p50_chars', p50_chars), ('max_chars', max_chars)
    ) m(metric, value)
    """,
)
def corpus_dataset_card(spark, sf_dir):
    """Dataset card: the eight headline numbers a training-data consumer
    asks first (size, source/lang mix, null rate, exact-dup rate on the
    canonical fingerprint, length profile), in long (metric, value)
    form ready for a manifest or report sink. ONE aggregate pass — the
    dup rate rides the same reduce as the counts via count_distinct on
    the md5 fingerprint, the median is the exact interpolated
    percentile (≡ DuckDB quantile_cont on integer inputs), and the
    long-form pivot is a stack() over the single result row (8 rows,
    driver-side cost zero)."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))))
    agg = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.round(
            100.0 * (F.count(F.lit(1)) - F.count("text")) / F.count(F.lit(1)), 6
        ).alias("null_text_pct"),
        F.round(
            100.0 * (F.count("text") - F.countDistinct(fp)) / F.count(F.lit(1)), 6
        ).alias("exact_dup_pct"),
        F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.max("n_chars").cast("double").alias("max_chars"),
    )
    return agg.select(
        F.expr(
            "stack(8, 'n_docs', n_docs, 'n_sources', n_sources,"
            " 'n_langs', n_langs, 'null_text_pct', null_text_pct,"
            " 'exact_dup_pct', exact_dup_pct, 'mean_chars', mean_chars,"
            " 'p50_chars', p50_chars, 'max_chars', max_chars) AS (metric, value)"
        )
    )


# ---------------------------------------------------------------------------
# Storage-layer parquet footer audit (sources/parquet_audit.py)
# ---------------------------------------------------------------------------


@register(
    "audit_parquet_footers",
    """
    SELECT regexp_extract(file_name, '([^/]+)$', 1) AS file,
           CAST(row_group_id AS INT) AS row_group_id,
           path_in_schema AS column,
           CAST(row_group_num_rows AS BIGINT) AS row_group_num_rows,
           CAST(num_values AS BIGINT) AS num_values,
           CAST(stats_null_count AS BIGINT) AS null_count,
           CAST(total_compressed_size AS BIGINT) AS compressed_bytes
    FROM parquet_metadata('/root/testdata/sf0.01/documents.parquet')
    """,
)
def audit_parquet_footers(spark, sf_dir):
    """Physical-layout audit of the documents table: per column chunk
    row/value/null counts and compressed bytes, read from parquet
    FOOTERS distributed over executors (pyarrow inside mapInPandas —
    kilobytes per file, data pages untouched). The DuckDB oracle is
    parquet_metadata(), an independent footer parser, so a green row
    is two engines agreeing on the physical bytes of the storage
    layer. NOTE: the oracle pins the sf0.01 path (the driver's
    correctness tier) because oracle SQL is static; the Spark side
    follows sf_dir as usual."""
    from zparse_spark.sources.parquet_audit import parquet_footer_audit

    return parquet_footer_audit(spark, f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Categorical entropy/gini profile + mergeable HLL sketches (operators/stats.py)
# ---------------------------------------------------------------------------


def _entropy_leg_sql(table: str, col: str) -> str:
    return f"""
    SELECT '{col}' AS "column", sum(c) AS n, count(*) AS n_distinct,
           round(1.0 - CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
                 / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)), 9)
             AS gini_impurity,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(round(c * ln(CAST(c AS DOUBLE)), 6))
                   / CAST(sum(c) AS DOUBLE), 6) AS entropy_nats
    FROM (SELECT CAST({col} AS VARCHAR) AS v, count(*) AS c FROM {table}
          WHERE {col} IS NOT NULL GROUP BY 1)
    """


@register(
    "profile_category_entropy",
    " UNION ALL ".join(
        [
            _entropy_leg_sql("documents", "lang"),
            _entropy_leg_sql("documents", "source"),
            _entropy_leg_sql("orders", "o_orderpriority"),
            _entropy_leg_sql("orders", "o_orderstatus"),
        ]
    ),
)
def profile_category_entropy(spark, sf_dir):
    """Categorical concentration profile for four columns across two
    tables: gini impurity from EXACT integer count sums (decimal
    accumulate, one double division — bit-identical cross-engine) and
    Shannon entropy under the standard portable-float contract
    (per-value terms rounded pre-sum). The shuffles are the
    vocabulary-sized frequency tables; everything after is rows =
    distinct values."""
    from zparse_spark.operators.stats import column_category_profile

    d = _t(spark, sf_dir, "documents")
    o = _t(spark, sf_dir, "orders")
    return column_category_profile(d, ["lang", "source"]).unionByName(
        column_category_profile(o, ["o_orderpriority", "o_orderstatus"])
    )


@register(
    "approx_distinct_sketch_merge",
    """
    SELECT CAST(source AS VARCHAR) AS source,
           count(DISTINCT text) AS n_exact,
           TRUE AS est_ok
    FROM documents GROUP BY source
    UNION ALL
    SELECT '__all__', count(DISTINCT text), TRUE FROM documents
    """,
)
def approx_distinct_sketch_merge(spark, sf_dir):
    """Mergeable cardinality sketches (DataSketches HLL, lg_k=14):
    per-source sketches estimate within 5% of the exact distinct, and
    the GLOBAL estimate is produced by UNIONING the per-source sketches
    — never re-touching the rows. That union is the 10^12-row
    contract: per-partition/per-day sketches persist at a few KB and
    tomorrow's load merges them associatively. The oracle carries the
    exact counts and TRUE gates, so a green row means every estimate
    (including the merged one) landed inside tolerance in Spark."""
    from zparse_spark.operators.stats import (
        sketch_distinct_by_group,
        sketch_merge_estimate,
    )

    d = _t(spark, sf_dir, "documents")
    sk = sketch_distinct_by_group(d, "text", ["source"]).cache()
    per = sk.select(
        F.col("source").cast("string").alias("source"),
        "n_exact",
        (
            F.abs(
                F.hll_sketch_estimate("sketch").cast("double") - F.col("n_exact")
            )
            / F.col("n_exact")
            <= 0.05
        ).alias("est_ok"),
    )
    merged = sketch_merge_estimate(sk).crossJoin(
        d.agg(F.count_distinct("text").alias("n_exact"))
    )
    glob = merged.select(
        F.lit("__all__").alias("source"),
        "n_exact",
        (
            F.abs(F.col("estimate").cast("double") - F.col("n_exact"))
            / F.col("n_exact")
            <= 0.05
        ).alias("est_ok"),
    )
    return per.unionByName(glob)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (operators/filtering.py
# weighted_sample_wor — Efraimidis–Spirakis A-ES, exponential-race form)
# ---------------------------------------------------------------------------


def _weighted_sample_oracle_sql(n: int = 50, seed: int = 11) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
    WITH pos AS (
      SELECT doc_id, lang, n_chars,
             ({hv} + 0.5) / 4294967296.0 AS u
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    m AS (
      SELECT max(CAST(n_chars AS DOUBLE)) AS mx FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    clocked AS (
      SELECT doc_id, lang, n_chars,
             round((0.0 - ln(u)) * m.mx / CAST(n_chars AS DOUBLE), 6) AS sample_clock
      FROM pos, m
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY sample_clock ASC, doc_id ASC) AS rk
      FROM clocked
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars, sample_clock
    FROM r WHERE rk <= {n}
    """


@register("corpus_sample_weighted", _weighted_sample_oracle_sql())
def corpus_sample_weighted(spark, sf_dir):
    """Quality-weighted corpus subsampling WITHOUT replacement: 50 docs
    per lang stratum, inclusion probability proportional to n_chars —
    the A-ES exponential race (smallest -ln(u)/w clocks win). Pure
    function of (doc_id, seed): re-runs, resumes, and the DuckDB twin
    select the identical set. One map-only clock projection + the
    cap_per_group rank discipline; the global max-weight normalizer
    (which pins the 6-decimal rounding's dynamic range) is a one-row
    broadcast. See weighted_sample_wor for the determinism contract."""
    from zparse_spark.operators.filtering import weighted_sample_wor

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample_wor(
        d, n=50, weight_col="n_chars", key_col="doc_id", seed=11, strata_col="lang"
    ).select("doc_id", "lang", "n_chars", "sample_clock")


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and dense embedding
# ranking (functions/text.py rrf_fuse)
# ---------------------------------------------------------------------------


_RRF_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id AS d,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    clean AS (SELECT d, token FROM toks WHERE token <> ''),
    dl AS (SELECT d, count(*) AS dl FROM clean GROUP BY 1),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    hits AS (SELECT d, token FROM clean
             WHERE token IN {repr(_BM25_TERMS)}),
    tf AS (SELECT d, token, count(*) AS tf FROM hits GROUP BY 1, 2),
    docfreq AS (SELECT token, count(DISTINCT d) AS df FROM hits GROUP BY 1),
    scored AS (
      SELECT tf.d,
             round(
               ln(1.0 + (corpus.n - docfreq.df + 0.5) / (docfreq.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl)),
               6) AS contrib
      FROM tf JOIN docfreq USING (token) JOIN dl USING (d) CROSS JOIN corpus
    ),
    per_doc AS (
      SELECT d, round(sum(contrib), 6) AS score FROM scored GROUP BY d
    ),
    lexr AS (
      SELECT d AS doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, d ASC) AS INT) AS lex_rank
      FROM per_doc
    ),
    lex AS (SELECT doc_id, lex_rank FROM lexr WHERE lex_rank <= 20),
    q1 AS (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1),
    dsc AS (
      SELECT c.vec_id AS doc_id,
             list_cosine_similarity(q1.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      FROM q1, embeddings c
    ),
    dr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS INT) AS dense_rank
      FROM dsc
    ),
    dense AS (SELECT doc_id, dense_rank FROM dr WHERE dense_rank <= 20),
    fused AS (
      SELECT doc_id, lex_rank, dense_rank,
             round(coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 0.0)
                 + coalesce(CAST(1.0 AS DOUBLE) / (60 + dense_rank), 0.0), 6) AS rrf
      FROM lex FULL OUTER JOIN dense USING (doc_id)
    ),
    top AS (
      SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT)
               AS fused_rank
      FROM fused
    )
    SELECT doc_id, lex_rank, dense_rank, rrf, fused_rank
    FROM top WHERE fused_rank <= 10
"""


@register("corpus_search_hybrid_rrf", _RRF_ORACLE)
def corpus_search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval the way production RAG stacks fuse lexical and
    dense: BM25 top-20 for the literal 3-term query over documents.text
    PLUS exact-cosine top-20 around a probe embedding (the corpus' first
    vector, embeddings.vec_id doubling as doc_id), combined with
    reciprocal-rank fusion 1/(60+rank) — rank-only, so the incomparable
    BM25/cosine score scales never meet. Both input lists are bounded
    (top-20), so the fusion join, sort, and final row_number all run on
    ≤40 rows; the corpus is touched exactly twice (the BM25 token pass,
    the dense scan — each with its own oracled query already). Ranks are
    integers and each contribution is one IEEE division, so the fused
    scores are bit-identical on any engine (see rrf_fuse)."""
    from zparse_spark.functions.text import bm25_search, rrf_fuse
    from zparse_spark.operators.similarity import brute_force_topk

    d = _t(spark, sf_dir, "documents")
    lex = bm25_search(d, list(_BM25_TERMS), top_k=20).select("doc_id", "rank")
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q1 = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = brute_force_topk(e, q1, k=20).select(
        F.col("corpus_id").alias("doc_id"), "rank"
    )
    return rrf_fuse({"lex": lex, "dense": dense}, top_k=10).select(
        "doc_id", "lex_rank", "dense_rank", "rrf", "fused_rank"
    )


# ---------------------------------------------------------------------------
# Equi-depth binning (operators/stats.py equidepth_bins — NTILE semantics
# from value boundaries, no global sort)
# ---------------------------------------------------------------------------


def _equidepth_oracle_sql(n_bins: int = 10) -> str:
    probs = ", ".join(repr(i / n_bins) for i in range(1, n_bins))
    case_sum = " + ".join(
        f"(CASE WHEN v > bs[{k}] THEN 1 ELSE 0 END)" for k in range(1, n_bins)
    )
    return f"""
    WITH r AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    b AS (SELECT quantile_cont(v, [{probs}]) AS bs FROM r),
    a AS (SELECT v, ({case_sum}) AS bin FROM r, b),
    g AS (
      SELECT bin, count(*) AS n_rows, min(v) AS min_v, max(v) AS max_v
      FROM a GROUP BY bin
    )
    SELECT g.bin,
           CASE WHEN g.bin >= 1 THEN round(bs[g.bin], 6) END AS lo,
           CASE WHEN g.bin <= {n_bins - 2} THEN round(bs[g.bin + 1], 6) END AS hi,
           n_rows, min_v, max_v
    FROM g, b
    """


@register("histogram_equidepth_extendedprice", _equidepth_oracle_sql())
def histogram_equidepth_extendedprice(spark, sf_dir):
    """Price deciles of lineitem.l_extendedprice as VALUE-boundary
    equi-depth bins — what SQL spells NTILE(10), minus NTILE's global
    range-sort and its arbitrary tie splitting. Boundaries are the
    exact interpolated quantiles (one percentile aggregate, the
    X37/IQR cross-engine contract); assignment is nine static codegen
    comparisons against the broadcast boundary row; output is one
    bin-keyed groupBy. Bin populations differ from n/10 exactly where
    ties straddle a boundary — deterministically, identically in both
    engines."""
    from zparse_spark.operators.stats import equidepth_bins

    li = _t(spark, sf_dir, "lineitem")
    return equidepth_bins(li, "l_extendedprice", n_bins=10).withColumn(
        "bin", F.col("bin").cast("int")
    )


# ---------------------------------------------------------------------------
# Per-column length histograms (operators/stats.py length_histogram)
# ---------------------------------------------------------------------------


def _length_hist_oracle_sql(cols=("text", "lang", "source"), max_pow: int = 20) -> str:
    case_sum = " + ".join(
        f"(CASE WHEN len >= {2**k} THEN 1 ELSE 0 END)" for k in range(1, max_pow + 1)
    )
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", length({c}) AS len FROM documents "
        f"WHERE {c} IS NOT NULL"
        for c in cols
    )
    return f"""
    WITH lens AS ({legs})
    SELECT "column", ({case_sum}) AS bucket,
           count(*) AS n_rows,
           CAST(min(len) AS INT) AS min_len,
           CAST(max(len) AS INT) AS max_len
    FROM lens GROUP BY 1, 2
    """


@register("profile_length_histograms", _length_hist_oracle_sql())
def profile_length_histograms(spark, sf_dir):
    """Log-scaled length histograms for the three string columns of
    documents in ONE scan + ONE bounded groupBy — the per-column
    "length histogram" of the north-star's stats list, engine-portable
    because the bucket is a ladder of integer comparisons against
    literal powers of two (never floor(log2): its float rounding at
    exact powers of two is engine-dependent). Text bytes die inside
    the scan stage — only (column, len) pairs reach the exchange."""
    from zparse_spark.operators.stats import length_histogram

    d = _t(spark, sf_dir, "documents")
    return length_histogram(d, ["text", "lang", "source"]).withColumn(
        "bucket", F.col("bucket").cast("int")
    )


# ---------------------------------------------------------------------------
# Value-pattern profiling (operators/stats.py pattern_profile)
# ---------------------------------------------------------------------------


def _pattern_profile_oracle_sql(
    cols=("lang", "source", "text"),
    top_n: int = 10,
    max_sig_len: int = 16,
) -> str:
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", {c} AS v FROM documents" for c in cols
    )
    s = (
        "regexp_replace(regexp_replace(regexp_replace("
        "v, '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g')"
    )
    return f"""
    WITH vals AS ({legs}),
    sigs AS (
      SELECT "column",
             CASE WHEN v IS NULL THEN '<null>'
                  WHEN length({s}) > {max_sig_len}
                    THEN substring({s}, 1, {max_sig_len}) || '…'
                  ELSE {s} END AS signature,
             v
      FROM vals
    ),
    freq AS (
      SELECT "column", signature, count(*) AS n_rows, min(v) AS example
      FROM sigs GROUP BY 1, 2
    ),
    r AS (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY "column" ORDER BY n_rows DESC, signature ASC) AS INT) AS rank
      FROM freq
    )
    SELECT "column", signature, n_rows, example, rank FROM r WHERE rank <= {top_n}
    """


@register("profile_value_patterns", _pattern_profile_oracle_sql())
def profile_value_patterns(spark, sf_dir):
    """Top-10 character-class signatures for the three string columns
    of documents — 'lang is ``aa`` everywhere, source is ``aaa-9``' —
    the format-discovery profile that catches
    ID-scheme and locale regressions before any typed rule exists.
    One map-only signature projection (three chained single-class
    regexp_replace calls, identical RE2 semantics in DuckDB with the
    'g' flag), one vocabulary-bounded groupBy, rank-per-column top-n;
    the example is min(v), never an arbitrary first."""
    from zparse_spark.operators.stats import pattern_profile

    d = _t(spark, sf_dir, "documents")
    return pattern_profile(d, ["lang", "source", "text"])


# ---------------------------------------------------------------------------
# Conditional functional dependency (operators/rules.py
# conditional_fd_violations — CFD, the scoped strengthening of X31)
# ---------------------------------------------------------------------------


@register(
    "fd_conditional_long_docs",
    """
    WITH scoped AS (
      SELECT source, lang FROM documents WHERE n_chars >= 400
    ),
    pairs AS (
      SELECT DISTINCT source, lang FROM scoped
      WHERE lang IS NOT NULL AND source IS NOT NULL
    ),
    counts AS (
      SELECT source, count(*) AS n_variants FROM pairs
      GROUP BY source HAVING count(*) > 1
    ),
    ranked AS (
      SELECT source, lang,
             row_number() OVER (PARTITION BY source ORDER BY lang) AS rk
      FROM pairs
    )
    SELECT c.source, c.n_variants,
           string_agg(r.lang, ',' ORDER BY r.lang) AS variants
    FROM counts c JOIN ranked r ON r.source = c.source AND r.rk <= 8
    GROUP BY c.source, c.n_variants
    """,
)
def fd_conditional_long_docs(spark, sf_dir):
    """CFD: within long documents (n_chars >= 400) each source must
    carry one lang — the scoped form of X31's source → lang FD, the
    shape real catalog rules take ("within source 'wiki', domain
    determines license"). The condition filters BEFORE the distinct-
    pair shuffle (predicate pushes to the scan), so the refinement is
    strictly cheaper than the global FD; everything downstream is the
    X31 machinery verbatim — bounded examples, no per-key state."""
    from zparse_spark.operators.rules import conditional_fd_violations

    d = _t(spark, sf_dir, "documents")
    return conditional_fd_violations(d, "n_chars >= 400", "source", "lang")


# ---------------------------------------------------------------------------
# Join-cardinality profiling (operators/stats.py join_cardinality_profile)
# ---------------------------------------------------------------------------


@register(
    "profile_join_cardinality",
    """
    WITH cl AS (
      SELECT o_custkey AS key, count(*) AS n_left FROM orders
      WHERE o_custkey IS NOT NULL GROUP BY 1
    ),
    cr AS (
      SELECT c_custkey AS key, count(*) AS n_right FROM customer
      WHERE c_custkey IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT cl.key, n_left, n_right, n_left * n_right AS n_pairs
      FROM cl JOIN cr USING (key)
    ),
    top AS (
      SELECT 'key' AS kind, CAST(key AS VARCHAR) AS key, n_left, n_right,
             n_pairs,
             CAST(row_number() OVER (ORDER BY n_pairs DESC, key ASC) AS INT) AS rank
      FROM pairs
    )
    SELECT kind, key, n_left, n_right, n_pairs, rank FROM top WHERE rank <= 10
    UNION ALL
    SELECT 'total', NULL, count(*), count(*), sum(n_pairs), NULL FROM pairs
    """,
)
def profile_join_cardinality(spark, sf_dir):
    """Exact predicted cardinality + hot keys of orders ⋈ customer on
    custkey WITHOUT executing the join: two key histograms (shuffle =
    distinct keys, not rows), a histogram-sized equi-join, TakeOrdered
    top-10 contributors and the one-row total a GO/NO-GO gate reads.
    The measurement behind every broadcast/salt/skew-split decision —
    and exact, because sampling misses exactly the hot keys that blow
    up production joins."""
    from zparse_spark.operators.stats import join_cardinality_profile

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return join_cardinality_profile(o, "o_custkey", c, "c_custkey")


# ---------------------------------------------------------------------------
# Temporal (SCD2) referential integrity (operators/rules.py
# asof_referential_violations) and audit-by-sampling with Wilson bounds
# (operators/stats.py sampled_audit)
# ---------------------------------------------------------------------------


_ASOF_REF_SQL = """
    WITH base AS (
      SELECT s_suppkey AS k,
             DATE '1994-01-01' + CAST((s_suppkey * 37) % 700 AS INTEGER) AS b1
      FROM supplier WHERE s_suppkey % 13 <> 5
    ),
    base2 AS (
      SELECT k, b1, b1 + CAST(400 + (k * 13) % 300 AS INTEGER) AS b2 FROM base
    ),
    dim AS (
      SELECT k, DATE '1992-01-01' AS vf, b1 AS vt FROM base2
      UNION ALL
      SELECT k, b1 - CAST(CASE WHEN k % 11 = 3 THEN 30 ELSE 0 END AS INTEGER), b2
      FROM base2 WHERE k % 7 <> 0
      UNION ALL
      SELECT k, b2, NULL FROM base2
    ),
    pairs AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key, l_shipdate AS ts,
             count(*) AS n_facts
      FROM lineitem
      WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
      GROUP BY 1, 2
    ),
    resolved AS (
      SELECT p.key, p.ts, p.n_facts,
             max(CASE WHEN d.vf IS NOT NULL THEN 1 ELSE 0 END) AS key_exists,
             coalesce(sum(CASE WHEN d.vf <= p.ts
                                AND (d.vt IS NULL OR p.ts < d.vt)
                           THEN 1 ELSE 0 END), 0) AS n_cover
      FROM pairs p LEFT JOIN dim d ON CAST(d.k AS VARCHAR) = p.key
      GROUP BY 1, 2, 3
    )
    SELECT key, ts, n_facts, CAST(n_cover AS BIGINT) AS n_versions,
           CASE WHEN key_exists = 0 THEN 'unmatched_key'
                WHEN n_cover = 0 THEN 'no_valid_version'
                ELSE 'ambiguous_version' END AS violation
    FROM resolved
    WHERE key_exists = 0 OR n_cover <> 1
"""


@register("referential_asof_supplier_versions", _ASOF_REF_SQL)
def referential_asof_supplier_versions(spark, sf_dir):
    """SCD2 referential integrity of lineitem (l_suppkey, l_shipdate)
    against a deterministically versioned supplier dimension (pure
    function of s_suppkey, built identically by the DuckDB twin):
    every shipment must resolve to EXACTLY ONE validity window. The
    dimension plants all three corruption classes — keys with no rows
    (k%13=5 → unmatched_key), a retired middle version (k%7=0 →
    no_valid_version gaps), and a version loaded 30 days early (k%11=3
    → ambiguous_version overlaps). Fact side reduces to distinct
    (key, ts) pairs first — the only fact-sized shuffle — then a
    broadcast key-equi join with the window predicate in codegen."""
    from zparse_spark.operators.rules import asof_referential_violations

    s = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("k"))
        .filter((F.col("k") % 13) != 5)
    )
    b = s.select(
        "k",
        F.date_add(
            F.to_date(F.lit("1994-01-01")), ((F.col("k") * 37) % 700).cast("int")
        ).alias("b1"),
    ).withColumn(
        "b2",
        F.date_add(F.col("b1"), (F.lit(400) + (F.col("k") * 13) % 300).cast("int")),
    )
    v1 = b.select(
        "k",
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
        F.col("b1").alias("valid_to"),
    )
    v2 = b.filter((F.col("k") % 7) != 0).select(
        "k",
        F.date_sub(
            F.col("b1"),
            F.when((F.col("k") % 11) == 3, F.lit(30)).otherwise(F.lit(0)),
        ).alias("valid_from"),
        F.col("b2").alias("valid_to"),
    )
    v3 = b.select(
        "k",
        F.col("b2").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2).unionByName(v3)
    li = _t(spark, sf_dir, "lineitem")
    return asof_referential_violations(li, "l_suppkey", "l_shipdate", dim, "k")


def _wilson_audit_sql(fraction: float = 0.25, seed: int = 0, z: float = 1.96) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    z2 = repr(z * z)
    zs = repr(float(z))
    return f"""
    WITH s AS (
      SELECT source,
             coalesce(CAST(n_chars > 450 AS INT), 0) AS v
      FROM documents
      WHERE {hv} / 4294967296.0 < {fraction}
    ),
    a AS (
      SELECT source AS partition, count(*) AS n_sampled,
             sum(v) AS n_violations
      FROM s GROUP BY 1
    )
    SELECT partition, n_sampled, n_violations,
           round(CAST(n_violations AS DOUBLE) / CAST(n_sampled AS DOUBLE), 6)
             AS p_hat,
           round(greatest(0.0,
             ((CAST(n_violations AS DOUBLE) / CAST(n_sampled AS DOUBLE))
              + {z2} / (2.0 * CAST(n_sampled AS DOUBLE)))
             / (1.0 + {z2} / CAST(n_sampled AS DOUBLE))
             - {zs} * sqrt(
                 (CAST(n_violations AS DOUBLE) / CAST(n_sampled AS DOUBLE))
                 * (1.0 - CAST(n_violations AS DOUBLE) / CAST(n_sampled AS DOUBLE))
                 / CAST(n_sampled AS DOUBLE)
                 + {z2} / (4.0 * CAST(n_sampled AS DOUBLE)
                           * CAST(n_sampled AS DOUBLE)))
               / (1.0 + {z2} / CAST(n_sampled AS DOUBLE))), 6) AS wilson_lo,
           round(least(1.0,
             ((CAST(n_violations AS DOUBLE) / CAST(n_sampled AS DOUBLE))
              + {z2} / (2.0 * CAST(n_sampled AS DOUBLE)))
             / (1.0 + {z2} / CAST(n_sampled AS DOUBLE))
             + {zs} * sqrt(
                 (CAST(n_violations AS DOUBLE) / CAST(n_sampled AS DOUBLE))
                 * (1.0 - CAST(n_violations AS DOUBLE) / CAST(n_sampled AS DOUBLE))
                 / CAST(n_sampled AS DOUBLE)
                 + {z2} / (4.0 * CAST(n_sampled AS DOUBLE)
                           * CAST(n_sampled AS DOUBLE)))
               / (1.0 + {z2} / CAST(n_sampled AS DOUBLE))), 6) AS wilson_hi
    FROM a
"""


@register("audit_sampled_wilson", _wilson_audit_sql())
def audit_sampled_wilson(spark, sf_dir):
    """Audit-by-sampling certificate: deterministic md5-hash 25% sample
    of documents (pure function of doc_id — DuckDB selects the
    identical rows), violation predicate n_chars > 450, per-source
    sampled rate with its 95% Wilson score interval. The sample filter
    is map-only and pushes to the scan; the groupBy is bounded by the
    source count; at 10^12 docs the certificate costs a quarter of one
    scan instead of a full re-validation."""
    from zparse_spark.operators.stats import sampled_audit

    d = _t(spark, sf_dir, "documents")
    return sampled_audit(
        d, "source", "n_chars > 450", fraction=0.25, key_col="doc_id", seed=0
    )


# ---------------------------------------------------------------------------
# Unicode NFC audit (functions/text.py nfc_audit) and distinctive-terms
# log-odds (functions/text.py distinctive_terms)
# ---------------------------------------------------------------------------


_NFC_AUDIT_SQL = """
    WITH planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 17 = 3 THEN text || 'e' || chr(769)
                  ELSE text END AS text
      FROM documents
    ),
    f AS (
      SELECT source AS partition, CAST(doc_id AS VARCHAR) AS id,
             CASE WHEN nfc_normalize(text) <> text THEN 1 ELSE 0 END AS bad
      FROM planted WHERE text IS NOT NULL
    )
    SELECT partition, count(*) AS n_docs, sum(bad) AS n_non_nfc,
           round(CAST(sum(bad) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS non_nfc_rate,
           min(CASE WHEN bad = 1 THEN id END) AS example_doc_id
    FROM f GROUP BY 1
"""


@register("corpus_nfc_audit", _NFC_AUDIT_SQL)
def corpus_nfc_audit(spark, sf_dir):
    """Unicode normalization audit per source with planted decomposed
    text (doc_id % 17 = 3 gets a combining acute appended): count and
    rate of non-NFC documents plus a deterministic example id. The NFC
    test is one Arrow-batched pandas_udf map stage (CPython
    unicodedata), value-verified against DuckDB's independent utf8proc
    normalizer — two implementations agreeing on every row."""
    from zparse_spark.functions.text import nfc_audit

    d = _t(spark, sf_dir, "documents")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 17 == 3, F.concat(F.col("text"), F.lit("é"))
        ).otherwise(F.col("text")),
    )
    out = nfc_audit(planted, "text", "source", "doc_id")
    return out.withColumn("n_non_nfc", F.col("n_non_nfc").cast("bigint"))


_DISTINCTIVE_SQL = """
    WITH toks0 AS (
      SELECT source AS grp,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    toks AS (SELECT grp, token FROM toks0 WHERE token <> ''),
    grid AS (SELECT grp, token, count(*) AS y_g FROM toks GROUP BY 1, 2),
    tok_tot AS (
      SELECT token, sum(y_g) AS y_w FROM grid GROUP BY 1
      HAVING sum(y_g) >= 10
    ),
    totals AS (SELECT count(*) AS vocab, sum(y_w) AS n_total FROM tok_tot),
    grp_tot AS (
      SELECT grp, sum(y_g) AS n_grp
      FROM grid JOIN tok_tot USING (token) GROUP BY 1
    ),
    g AS (
      SELECT grid.grp, grid.token,
             CAST(grid.y_g AS DOUBLE) AS yg,
             CAST(y_w - grid.y_g AS DOUBLE) AS yr,
             CAST(n_grp AS DOUBLE) AS n_g,
             CAST(n_total - n_grp AS DOUBLE) AS n_r,
             0.5 * CAST(vocab AS DOUBLE) AS a0,
             grid.y_g AS y_g_i, y_w - grid.y_g AS y_r_i
      FROM grid JOIN tok_tot USING (token) JOIN grp_tot USING (grp)
      CROSS JOIN totals
    ),
    scored AS (
      SELECT grp AS source, token,
             y_g_i AS n_in_group, y_r_i AS n_in_rest,
             round(ln((yg + 0.5) / (n_g + a0 - yg - 0.5))
                 - ln((yr + 0.5) / (n_r + a0 - yr - 0.5)), 6) AS log_odds,
             round((ln((yg + 0.5) / (n_g + a0 - yg - 0.5))
                  - ln((yr + 0.5) / (n_r + a0 - yr - 0.5)))
                   / sqrt(1.0 / (yg + 0.5) + 1.0 / (yr + 0.5)), 6) AS z
      FROM g
    )
    SELECT source, token, n_in_group, n_in_rest, log_odds, z, rank
    FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY source ORDER BY z DESC, token ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


@register("corpus_distinctive_terms", _DISTINCTIVE_SQL)
def corpus_distinctive_terms(spark, sf_dir):
    """Per-source distinctive vocabulary: log-odds ratio with Dirichlet
    prior + z-score (Monroe/Colaresi/Quinn 2008) of each token in the
    source vs the REST of the corpus, top 5 per source. One
    token-occurrence shuffle to the (source × vocab) grid, then grid-
    sized arithmetic and a per-source window rank — no second data
    pass. Ranking deterministic cross-engine (z rounded to 6, token
    tiebreak)."""
    from zparse_spark.functions.text import distinctive_terms

    d = _t(spark, sf_dir, "documents")
    return distinctive_terms(d, "source", "text", top_n=5, alpha=0.5, min_count=10)


def _dsir_oracle_sql(n_buckets: int = 256, quant: int = 1_000_000, top_k: int = 100) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql("token")
    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                t -> t <> '')) AS token
      FROM documents
      WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    bt AS (
      SELECT doc_id, lang, ({hv} % {n_buckets}) AS bucket FROM toks
    ),
    dist AS (
      SELECT bucket, count(*) AS raw_n,
             count(*) FILTER (WHERE lang = 'en') AS tgt_n
      FROM bt GROUP BY bucket
    ),
    tot AS (SELECT sum(raw_n) AS raw_total, sum(tgt_n) AS tgt_total FROM dist),
    lr AS (
      SELECT bucket,
             CAST(round((ln(tgt_n + 1) - ln(tgt_total + {n_buckets})
                       - ln(raw_n + 1) + ln(raw_total + {n_buckets})) * {quant})
                  AS BIGINT) AS lmr
      FROM dist, tot
    ),
    scored AS (
      SELECT bt.doc_id, any_value(bt.lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(lr.lmr) AS BIGINT) AS sum_lmr
      FROM bt JOIN lr USING (bucket)
      GROUP BY bt.doc_id
    )
    SELECT doc_id, lang, n_tokens, sum_lmr,
           round(sum_lmr / (n_tokens * {quant}.0), 6) AS avg_lmr_nats
    FROM scored
    ORDER BY avg_lmr_nats DESC, doc_id ASC
    LIMIT {top_k}
    """


@register("corpus_dsir_weights", _dsir_oracle_sql())
def corpus_dsir_weights(spark, sf_dir):
    """X150: DSIR-style importance weighting (Xie et al. 2023) — fit
    hashed-unigram (256 portable md5 buckets) log-ratios of the
    target slice (lang='en') vs the whole corpus, add-1 smoothed and
    quantized to integer micro-nats, then score every document by its
    exact integer token-sum and return the top-100 by length-
    normalized average log-ratio: the docs whose n-gram profile most
    resembles the target, the canonical pretraining-data selection
    signal. Fit is one token explode -> 256-row map-side-combined
    groupBy + a 256-integer collect (a driver-side model, like the
    trained IVF codebook); scoring is MAP-ONLY via a constant-folded
    map literal, the sole shuffle being the top-k TakeOrdered. The
    DuckDB twin recomputes fit+score from the definition with an
    explode-join instead of the map fold — identical integers, so the
    match certifies both the bucketing and the quantized arithmetic."""
    from zparse_spark.operators.filtering import dsir_fit, dsir_score

    d = _t(spark, sf_dir, "documents")
    model, default = dsir_fit(d, F.col("lang") == "en", n_buckets=256)
    return dsir_score(d, model, default, n_buckets=256, top_k=100)


@register(
    "trend_theil_sen_events",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    grid AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
             t.event_type, d0
      FROM mm, (SELECT DISTINCT event_type FROM daily) t
    ), dense AS (
      SELECT g.event_type, CAST(g.day - g.d0 AS BIGINT) AS x,
             CAST(coalesce(daily.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN daily
        ON g.day = daily.day AND g.event_type = daily.event_type
    ), pairs AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM dense a JOIN dense b
        ON a.event_type = b.event_type AND b.x > a.x
    )
    SELECT event_type, count(*) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6) AS ts_slope_per_day
    FROM pairs GROUP BY 1
    """,
)
def trend_theil_sen_events(spark, sf_dir):
    """Theil–Sen robust per-type volume trend: median of all pairwise
    daily slopes on the densified day grid — the 29%-breakdown robust
    leg next to trend_events_volume's least-squares slope (one
    corrupted ingest day can swing LS arbitrarily; it moves one row of
    the pairwise median). Every slope is one IEEE division of exact
    integers; the median is the interpolated percentile ↔ quantile_cont
    halves rule. The quadratic pair join runs on the DAILY table
    (|days|² pairs per key), never on raw events."""
    from zparse_spark.operators.stats import theil_sen_trend

    return theil_sen_trend(_t(spark, sf_dir, "events"))


@register(
    "outliers_mahalanobis_lineitem",
    """
    WITH m AS (
      SELECT round(avg(l_quantity), 6) AS mx,
             round(avg(l_extendedprice), 6) AS my,
             round(avg(l_quantity * l_quantity) - avg(l_quantity) * avg(l_quantity), 6) AS vxx,
             round(avg(l_extendedprice * l_extendedprice)
                   - avg(l_extendedprice) * avg(l_extendedprice), 6) AS vyy,
             round(avg(l_quantity * l_extendedprice)
                   - avg(l_quantity) * avg(l_extendedprice), 6) AS vxy
      FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ), scored AS (
      SELECT l_returnflag,
             CASE WHEN vxx * vyy - vxy * vxy <> 0 THEN
               ((l_quantity - mx) * (l_quantity - mx) * vyy
                - 2 * (l_quantity - mx) * (l_extendedprice - my) * vxy
                + (l_extendedprice - my) * (l_extendedprice - my) * vxx)
               / (vxx * vyy - vxy * vxy) END AS md2
      FROM lineitem, m
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    )
    SELECT l_returnflag, count(*) AS n_rows,
           coalesce(sum(CAST(md2 > 13.8155 AS BIGINT)), 0) AS n_outliers,
           round(max(md2), 4) AS max_md2
    FROM scored GROUP BY 1
    """,
)
def outliers_mahalanobis_lineitem(spark, sf_dir):
    """Bivariate Mahalanobis screen on (l_quantity, l_extendedprice)
    per returnflag: a row 3× off the price-for-this-quantity ridge is
    invisible to BOTH marginal IQR fences but lights up the covariance
    ellipse. Moment parameters are rounded to 6 decimals before the
    per-row closed-form distance, so md² is a pure function of exact
    column values and digit-identical parameters in both engines
    (operators/stats.py::mahalanobis_outliers; threshold = χ²₂@0.999)."""
    from zparse_spark.operators.stats import mahalanobis_outliers

    return mahalanobis_outliers(
        _t(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )


@register(
    "corpus_zipf_anchors",
    """
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    tf AS (SELECT token, count(*) AS tf FROM toks WHERE token <> '' GROUP BY token),
    ranked AS (
      SELECT token, tf, row_number() OVER (ORDER BY tf DESC, token ASC) AS rnk
      FROM tf
    ),
    top1 AS (SELECT tf AS f1 FROM ranked WHERE rnk = 1)
    SELECT rnk AS rank_anchor, token, tf,
           CASE WHEN rnk > 1 THEN round(ln(CAST(f1 AS DOUBLE) / tf) / ln(CAST(rnk AS DOUBLE)), 6) END
             AS zipf_slope
    FROM ranked, top1 WHERE rnk IN (1, 10, 100, 1000)
    """,
)
def corpus_zipf_anchors(spark, sf_dir):
    """Zipf rank-frequency anchors: term frequency at ranks 1/10/100/
    1000 under the deterministic (tf desc, token asc) total order, and
    the implied Zipf exponent ln(f₁/f_k)/ln(k) at each anchor — the
    one-line language-health check (natural corpora sit near 1.0;
    boilerplate floods or template spam push it far off). Each
    exponent is a pure function of two EXACT integer frequencies, so
    no sum-order drift exists; the whole query is one groupBy plus a
    4-row probe of the ranked vocabulary (rank via one narrow sort of
    the distinct-term table, not the corpus)."""
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    # orderBy().limit(k) compiles to TakeOrderedAndProject (per-partition
    # partial top-k + driver merge); the row_number window then ranks the
    # BOUNDED 1000-row result. The previous partitionless window ranked
    # the entire vocabulary through one Exchange SinglePartition + full
    # Sort (r5 verdict item 2 — measured, the plan had no
    # WindowGroupLimit). Same total order, identical output rows.
    top = tf.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(1000)
    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    ranked = top.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk").isin(1, 10, 100, 1000)
    )
    top1 = ranked.filter(F.col("rnk") == 1).select(F.col("tf").alias("f1"))
    return ranked.crossJoin(F.broadcast(top1)).select(
        F.col("rnk").alias("rank_anchor"),
        "token",
        "tf",
        F.when(
            F.col("rnk") > 1,
            F.round(
                F.log(F.col("f1").cast("double") / F.col("tf"))
                / F.log(F.col("rnk").cast("double")),
                6,
            ),
        ).alias("zipf_slope"),
    )


@register(
    "profile_mcv_orders",
    """
    WITH long AS (
      SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ),
    counts AS (
      SELECT col_name, value, count(*) AS n
      FROM long WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    ranked AS (
      SELECT col_name, value, n,
             sum(n) OVER (PARTITION BY col_name) AS tot,
             row_number() OVER (PARTITION BY col_name ORDER BY n DESC, value ASC) AS rnk
      FROM counts
    )
    SELECT col_name, value, n, round(CAST(n AS DOUBLE) / tot, 6) AS frac, rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def profile_mcv_orders(spark, sf_dir):
    """ANALYZE-style most-common-values profile: top-5 values with
    frequency fraction per categorical column, long format under the
    deterministic (n desc, value asc) order — the MCV list a cost
    model or a drift monitor baselines against (profile_value_patterns
    covers SHAPE; this covers the actual heavy values). One groupBy on
    the unpivoted pair stream; the rank window runs on the distinct
    (column, value) table, never the raw rows."""
    o = _t(spark, sf_dir, "orders")
    long = o.select(
        F.lit("o_orderstatus").alias("col_name"),
        F.col("o_orderstatus").alias("value"),
    ).unionByName(
        o.select(
            F.lit("o_orderpriority").alias("col_name"),
            F.col("o_orderpriority").alias("value"),
        )
    )
    counts = (
        long.filter(F.col("value").isNotNull())
        .groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("col_name")
    wr = wp.orderBy(F.col("n").desc(), F.col("value").asc())
    return (
        counts.withColumn("tot", F.sum("n").over(wp))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 5)
        .select(
            "col_name",
            "value",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("frac"),
            "rnk",
        )
    )


@register(
    "referential_cardinality_orders",
    """
    WITH child AS (
      SELECT l_orderkey, count(*) AS cc FROM lineitem GROUP BY 1
    ),
    per_parent AS (
      SELECT o.o_orderkey, coalesce(c.cc, 0) AS cc
      FROM orders o LEFT JOIN child c ON o.o_orderkey = c.l_orderkey
    )
    SELECT cc AS child_count, count(*) AS n_orders,
           (cc < 1 OR cc > 7) AS violates_bounds
    FROM per_parent GROUP BY cc
    """,
)
def referential_cardinality_orders(spark, sf_dir):
    """Referential CARDINALITY conformance: the orders→lineitem
    child-count distribution with a declared 1..7 bound — the third
    leg of referential checking (R1 catches dangling children;
    profile_inclusion catches orphan direction; this catches a parent
    with zero or 40 children, which both pass). The child side is one
    map-combined groupBy on the key; the parent join moves only
    (key, count) pairs — at 100 TB the shuffle is keys, not rows."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    child = li.groupBy(F.col("l_orderkey")).agg(F.count(F.lit(1)).alias("cc"))
    per_parent = (
        o.select("o_orderkey")
        .join(child, o["o_orderkey"] == child["l_orderkey"], "left")
        .select(F.coalesce(F.col("cc"), F.lit(0)).alias("cc"))
    )
    return per_parent.groupBy("cc").agg(
        F.count(F.lit(1)).alias("n_orders"),
    ).select(
        F.col("cc").alias("child_count"),
        "n_orders",
        ((F.col("cc") < 1) | (F.col("cc") > 7)).alias("violates_bounds"),
    )


@register(
    "tpch_q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3
    HAVING round(sum(l.l_quantity), 2) > 180
    ORDER BY total_qty DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 (large-volume customers) adapted to the driver
    schema: three-way join customer⋈orders⋈lineitem, per-order
    quantity rollup, HAVING on the ROUNDED sum (both engines filter
    the identical post-round value, so a last-ulp sum cannot flip a
    row across the threshold), top-100 under the (qty desc, orderkey)
    total order. Scale shape: the lineitem→orders join pre-aggregates
    quantity per orderkey BEFORE joining customer, so the wide join
    moves one row per qualifying order, not one per lineitem."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey").agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        per_order.join(o, per_order["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "trend_acf_events",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    grid AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
             t.event_type, d0
      FROM mm, (SELECT DISTINCT event_type FROM daily) t
    ), dense AS (
      SELECT g.event_type, CAST(g.day - g.d0 AS BIGINT) AS x,
             CAST(coalesce(daily.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN daily
        ON g.day = daily.day AND g.event_type = daily.event_type
    ), pairs AS (
      SELECT a.event_type, CAST(l.lag AS BIGINT) AS lag, a.n AS y0, b.n AS y1
      FROM dense a
      CROSS JOIN (VALUES (1), (7)) l(lag)
      JOIN dense b ON a.event_type = b.event_type AND b.x = a.x + l.lag
    ), g AS (
      SELECT event_type, lag, count(*) AS m,
             sum(y0) AS s0, sum(y1) AS s1,
             sum(y0 * y0) AS s00, sum(y1 * y1) AS s11, sum(y0 * y1) AS s01
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, m AS n_pairs,
           CASE WHEN m * s00 - s0 * s0 > 0 AND m * s11 - s1 * s1 > 0 THEN
             round(CAST(m * s01 - s0 * s1 AS DOUBLE)
                   / sqrt(CAST(m * s00 - s0 * s0 AS DOUBLE)
                          * CAST(m * s11 - s1 * s1 AS DOUBLE)), 6)
           END AS acf
    FROM g
    """,
)
def trend_acf_events(spark, sf_dir):
    """Lag-1/lag-7 autocorrelation of each type's daily-count series:
    the seasonality-STRENGTH number that decides whether X163's
    weekday-conditional baseline is warranted at all (lag-7 high =
    weekly rhythm; lag-1 high = momentum; both ~0 = white noise, use a
    global baseline). Pearson r from six exact BIGINT sums on the
    dense grid; one IEEE sqrt + one division — bit-identical with no
    rounding tricks (operators/stats.py::volume_acf)."""
    from zparse_spark.operators.stats import volume_acf

    return volume_acf(_t(spark, sf_dir, "events"), lags=(1, 7))


@register(
    "repair_impute_value_events",
    """
    SELECT event_type, count(*) AS n_rows,
           sum(CAST(value IS NULL AS BIGINT)) AS n_null,
           round(quantile_cont(value, 0.5), 6) AS median_used,
           round(sum(value) / count(value), 6) AS mean_before,
           round((sum(value) + sum(CAST(value IS NULL AS BIGINT)) * quantile_cont(value, 0.5))
                 / (count(value) + sum(CAST(value IS NULL AS BIGINT))), 6) AS mean_after
    FROM events GROUP BY 1
    """,
)
def repair_impute_value_events(spark, sf_dir):
    """Median-imputation audit for events.value per type — the
    MISSINGNESS leg of the repair family (repair_clamp fixes
    out-of-range; this fixes absent, sharing the exact interpolated-
    percentile contract with the detection side). Returns the audit
    (median used, fill count, mean shift), not the rewritten rows: at
    100 TB the rewrite is a map-only broadcast-join the caller applies
    (operators/stats.py::impute_group_median)."""
    from zparse_spark.operators.stats import impute_group_median

    return impute_group_median(_t(spark, sf_dir, "events"), "value", "event_type")


@register(
    "corpus_char_bigram_lm",
    """
    WITH s AS (
      SELECT doc_id, lower(trim(text)) AS s FROM documents
      WHERE text IS NOT NULL AND length(lower(trim(text))) >= 2
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, length(s) - 1),
                                   i -> substr(s, i, 2))) AS g
      FROM s
    ),
    dg AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    model AS (SELECT g, sum(c) AS tf FROM dg GROUP BY 1),
    tot AS (SELECT sum(tf) AS t FROM model),
    m2 AS (SELECT g, CAST(round(ln(CAST(tf AS DOUBLE) / t) * 1e6) AS BIGINT) AS ulp6
           FROM model, tot)
    SELECT dg.doc_id, sum(c) AS n_bigrams,
           round(CAST(sum(c * ulp6) AS DOUBLE) / (sum(c) * 1e6), 6) AS avg_logprob
    FROM dg JOIN m2 USING (g) GROUP BY 1
    """,
)
def corpus_char_bigram_lm(spark, sf_dir):
    """Char-bigram LM quality score per document — the context-
    sensitive leg of the LM-filter pair (corpus_lm_quality's unigram
    cannot see scrambled text: same token multiset, same score;
    impossible character PAIRS crater this one). Micro-nat integer
    quantization makes the per-doc sum exact cross-engine
    (functions/text.py::char_bigram_logprob_scores)."""
    from zparse_spark.functions.text import char_bigram_logprob_scores

    return char_bigram_logprob_scores(_t(spark, sf_dir, "documents"))


@register(
    "layout_expire_snapshots",
    """
    WITH files AS (
      SELECT o_orderkey % 200 AS file_id, count(*) * 512 AS bytes
      FROM orders GROUP BY 1
    ),
    f2 AS (
      SELECT file_id, bytes, file_id % 8 AS add_s, 1 + file_id % 5 AS life
      FROM files
    ),
    refs AS (
      SELECT file_id, bytes,
             unnest(generate_series(add_s, least(add_s + life, 9))) AS snapshot_id
      FROM f2
    ),
    g AS (
      SELECT file_id, min(snapshot_id) AS first_ref, max(snapshot_id) AS last_ref,
             count(*) AS n_refs, max(bytes) AS bytes
      FROM refs GROUP BY 1
    )
    SELECT file_id, first_ref, last_ref, n_refs, bytes,
           last_ref < 5 AS reclaimable
    FROM g
    """,
)
def layout_expire_snapshots(spark, sf_dir):
    """Snapshot-expiry GC plan over a snapshot→file reference table
    derived deterministically from orders (file = orderkey mod 200,
    bytes from its real row count, a staggered add/retire schedule
    across 10 snapshots): expiring snapshots 0-4 must reclaim exactly
    the files whose NEWEST reference is below the cutoff — Iceberg's
    expireSnapshots decision, metadata-sized, one map-combined groupBy
    (operators/layout.py::expire_snapshots_plan; compaction_bins plans
    merges of live files, this plans deletion of dead ones)."""
    from zparse_spark.operators.layout import expire_snapshots_plan

    o = _t(spark, sf_dir, "orders")
    files = (
        o.groupBy((F.col("o_orderkey") % 200).alias("file_id"))
        .agg((F.count(F.lit(1)) * 512).alias("bytes"))
        .select(
            "file_id",
            "bytes",
            (F.col("file_id") % 8).alias("add_s"),
            (F.lit(1) + F.col("file_id") % 5).alias("life"),
        )
    )
    refs = files.select(
        "file_id",
        "bytes",
        F.explode(
            F.sequence(
                F.col("add_s"), F.least(F.col("add_s") + F.col("life"), F.lit(9))
            )
        ).alias("snapshot_id"),
    )
    return expire_snapshots_plan(refs, cutoff_snapshot=5)


@register(
    "layout_overlap_depth",
    """
    WITH li AS (
      SELECT l_orderkey, l_extendedprice AS p FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    mm AS (SELECT min(p) AS mn, max(p) AS mx FROM li),
    assigned AS (
      SELECT 'hash' AS layout, l_orderkey % 32 AS file_id, p FROM li
      UNION ALL
      SELECT 'range' AS layout,
             least(31, CAST(floor((p - mm.mn) / ((mm.mx - mm.mn) / 32.0)) AS BIGINT)) AS file_id,
             p
      FROM li, mm
    ),
    zm AS (
      SELECT layout, file_id, min(p) AS mn, max(p) AS mx, count(p) AS n_rows
      FROM assigned GROUP BY 1, 2
    ),
    depth AS (
      SELECT a.layout, a.file_id, a.n_rows, count(b.file_id) AS overlap_depth
      FROM zm a LEFT JOIN zm b
        ON a.layout = b.layout AND a.mn <= b.mx AND b.mn <= a.mx
           AND a.file_id <> b.file_id
      GROUP BY 1, 2, 3
    )
    SELECT layout, count(*) AS n_files,
           round(avg(overlap_depth), 6) AS avg_depth,
           max(overlap_depth) AS max_depth,
           CAST(sum(CAST(overlap_depth = 0 AS BIGINT)) AS BIGINT) AS n_disjoint
    FROM depth GROUP BY 1
    """,
)
def layout_overlap_depth(spark, sf_dir):
    """Clustering-depth audit, hash vs range layout over the same
    column: per-file count of OTHER files whose [min,max] intersects
    it — the CAUSE metric behind layout_skipping_audit's symptom
    (files-hit per probe). Range layout must come out fully disjoint
    (depth 0 everywhere), hash layout fully overlapped (depth 31) —
    the number an Iceberg table-maintenance job thresholds to decide a
    re-sort. Quadratic interval join on the 64-row zone table
    (operators/layout.py::zone_overlap_depth)."""
    from zparse_spark.operators.layout import zone_maps, zone_overlap_depth

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select("l_orderkey", F.col("l_extendedprice").alias("p"))
    )
    mm = li.agg(F.min("p").alias("gmn"), F.max("p").alias("gmx"))
    hash_files = li.select(
        F.lit("hash").alias("layout"), (F.col("l_orderkey") % 32).alias("f"), "p"
    )
    range_files = li.crossJoin(F.broadcast(mm)).select(
        F.lit("range").alias("layout"),
        F.least(
            F.lit(31),
            F.floor(
                (F.col("p") - F.col("gmn")) / ((F.col("gmx") - F.col("gmn")) / 32.0)
            ),
        ).alias("f"),
        "p",
    )
    zm = (
        hash_files.unionByName(range_files)
        .groupBy("layout", F.col("f"))
        .agg(F.min("p").alias("mn"), F.max("p").alias("mx"), F.count("p").alias("n_rows"))
        .select("layout", F.col("f").alias("file_id"), "mn", "mx", "n_rows")
    )
    depth = zone_overlap_depth(zm, layout_col="layout")
    return depth.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.round(F.avg("overlap_depth"), 6).alias("avg_depth"),
        F.max("overlap_depth").alias("max_depth"),
        F.sum((F.col("overlap_depth") == 0).cast("long")).alias("n_disjoint"),
    )


@register(
    "anomaly_events_ewma",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    grid AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
             t.event_type, d0
      FROM mm, (SELECT DISTINCT event_type FROM daily) t
    ), dense AS (
      SELECT g.event_type, g.day, CAST(g.day - g.d0 AS BIGINT) AS x,
             CAST(coalesce(daily.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN daily
        ON g.day = daily.day AND g.event_type = daily.event_type
    ), pairs AS (
      SELECT a.event_type, a.day, a.x, a.n, least(a.x, 30) AS l,
             b.n AS bn, a.x - b.x AS lag_i
      FROM dense a JOIN dense b
        ON a.event_type = b.event_type AND b.x <= a.x AND b.x >= a.x - 30
    ), g AS (
      SELECT event_type, day, x, n, l,
             sum((CAST(1 AS BIGINT) << CAST(l - lag_i AS INT)) * bn) AS num
      FROM pairs GROUP BY 1, 2, 3, 4, 5
    ), e AS (
      SELECT event_type, day, n,
             round(CAST(num AS DOUBLE)
                   / CAST((CAST(1 AS BIGINT) << CAST(l + 1 AS INT)) - 1 AS DOUBLE),
                   6) AS ewma
      FROM g
    )
    SELECT event_type, day, n, ewma,
           round(n - lag(ewma) OVER (PARTITION BY event_type ORDER BY day), 6)
             AS residual
    FROM e
    """,
)
def anomaly_events_ewma(spark, sf_dir):
    """EWMA control chart (α=1/2, 30-day window) per event type — the
    slow-level-shift detector next to CUSUM and the weekday screen.
    Dyadic weights make the whole smoother EXACT integer arithmetic
    (shiftleft sums, one trailing division): bit-identical
    cross-engine with no per-term float accumulation at all
    (operators/stats.py::ewma_control_chart). Residual = today's count
    minus yesterday's smoothed level, the one-step forecast miss."""
    from zparse_spark.operators.stats import ewma_control_chart

    return ewma_control_chart(_t(spark, sf_dir, "events"), window_days=30)


@register(
    "profile_gini_customer_revenue",
    """
    WITH rev AS (
      SELECT c.c_mktsegment, c.c_custkey,
             CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS cents
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT c_mktsegment, cents,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents ASC) AS i
      FROM rev
    ),
    g AS (
      SELECT c_mktsegment, count(*) AS n, sum(cents) AS sx, sum(i * cents) AS six
      FROM ranked GROUP BY 1
    )
    SELECT c_mktsegment, n, sx AS total,
           CASE WHEN sx > 0 AND n > 1 THEN
             round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                   / CAST(n * sx AS DOUBLE), 6) END AS gini
    FROM g
    """,
)
def profile_gini_customer_revenue(spark, sf_dir):
    """Gini concentration of per-customer revenue within each market
    segment — the inequality audit a mean/stddev profile cannot
    express (the number that answers "does 1% of the corpus carry 60%
    of the tokens" when pointed at sources). Revenue is fixed to exact
    CENTS before ranking, so every sum is exact integer arithmetic,
    ties commute, and the single trailing division is bit-identical
    (operators/stats.py::gini_concentration)."""
    from zparse_spark.operators.stats import gini_concentration

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents")
        )
    )
    return gini_concentration(rev, "cents", "c_mktsegment")


@register(
    "doc_readability_scores",
    """
    WITH s AS (
      SELECT doc_id, lower(trim(text)) AS s FROM documents WHERE text IS NOT NULL
    ),
    c AS (
      SELECT doc_id,
             CAST(CASE WHEN s = '' THEN 0
                       ELSE len(regexp_extract_all(s, '\\S+')) END AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(s, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(s, '[aeiouy]+')) AS BIGINT) AS n_syllables
      FROM s
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             round(206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) END AS flesch
    FROM c
    """,
)
def doc_readability_scores(spark, sf_dir):
    """Flesch-style readability per document from three exact integer
    regexp counts (words, sentence enders, vowel-group syllable
    proxies) — the corpus-quality filter signal a pure length screen
    misses in both directions. Map-only codegen projection, no
    explode, no Python (functions/text.py::readability_scores)."""
    from zparse_spark.functions.text import readability_scores

    out = readability_scores(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        "flesch",
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth, Simpson's-paradox audit, magnitude/unit
# audit, winnowing containment (X182-X185)
# ---------------------------------------------------------------------------


def _heaps_oracle_sql(seed: int = 0) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
    WITH du AS (
      SELECT {hv} / 4294967296.0 AS u, text FROM documents
    ),
    tk AS (
      SELECT u, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM du WHERE text IS NOT NULL
    ),
    tok AS (SELECT u, token FROM tk WHERE token <> ''),
    firstu AS (SELECT token, min(u) AS fu FROM tok GROUP BY token),
    grid AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 1.0]) AS fraction),
    curve AS (
      SELECT g.fraction,
             (SELECT count(*) FROM du WHERE du.u < g.fraction) AS n_docs,
             (SELECT count(*) FROM tok WHERE tok.u < g.fraction) AS n_tokens,
             (SELECT count(*) FROM firstu WHERE firstu.fu < g.fraction) AS n_vocab
      FROM grid g
    ),
    lagd AS (
      SELECT fraction, n_docs, n_tokens, n_vocab,
             lag(n_vocab) OVER (ORDER BY fraction) AS pv,
             lag(n_tokens) OVER (ORDER BY fraction) AS pt
      FROM curve
    )
    SELECT fraction, n_docs, n_tokens, n_vocab,
           CASE WHEN pv IS NOT NULL AND pv > 0 AND pt > 0
                     AND n_vocab > pv AND n_tokens > pt
                THEN round(ln(CAST(n_vocab AS DOUBLE) / pv)
                           / ln(CAST(n_tokens AS DOUBLE) / pt), 6) END AS beta
    FROM lagd
    """


@register("corpus_heaps_curve", _heaps_oracle_sql())
def corpus_heaps_curve(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve (X182): V and T at nested
    deterministic hash-prefix samples of the corpus plus the implied
    exponent beta between consecutive prefixes — the corpus-health
    signal per-doc scorers can't see (template floods push beta to 0,
    id/binary spill toward 1). Prefix membership is hash_unit(doc_id)
    < f (filtering.py:141), NEVER a global sort; V_j/T_j come from
    interval-bucketing two bounded aggregates
    (functions/text.py::vocab_growth_curve)."""
    from zparse_spark.functions.text import vocab_growth_curve

    return vocab_growth_curve(
        _t(spark, sf_dir, "documents"), fractions=(0.1, 0.25, 0.5, 0.75, 1.0), seed=0
    )


_SIMPSON_SQL = """
    WITH base AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    per AS (
      SELECT grp, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM base GROUP BY grp
    ),
    pooled AS (
      SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
             sum(sxx) AS sxx, sum(syy) AS syy, sum(sxy) AS sxy
      FROM per
    ),
    pr AS (
      SELECT CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                  THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             END AS r_pooled
      FROM pooled
    )
    SELECT per.grp AS l_returnflag, per.n,
           CASE WHEN per.n >= 2 AND per.n * per.sxx - per.sx * per.sx > 0
                     AND per.n * per.syy - per.sy * per.sy > 0
                THEN round(CAST(per.n * per.sxy - per.sx * per.sy AS DOUBLE)
                           / sqrt(CAST(per.n * per.sxx - per.sx * per.sx AS DOUBLE)
                                  * CAST(per.n * per.syy - per.sy * per.sy AS DOUBLE)), 6)
           END AS r_group,
           pr.r_pooled,
           CASE WHEN per.n >= 2 AND per.n * per.sxx - per.sx * per.sx > 0
                     AND per.n * per.syy - per.sy * per.sy > 0
                     AND pr.r_pooled IS NOT NULL
                THEN (round(CAST(per.n * per.sxy - per.sx * per.sy AS DOUBLE)
                            / sqrt(CAST(per.n * per.sxx - per.sx * per.sx AS DOUBLE)
                                   * CAST(per.n * per.syy - per.sy * per.sy AS DOUBLE)), 6)
                      * pr.r_pooled) < 0
           END AS sign_flip
    FROM per, pr
"""


@register("stats_simpson_lineitem", _SIMPSON_SQL)
def stats_simpson_lineitem(spark, sf_dir):
    """Simpson's-paradox audit (X183): per-group Pearson r of
    (quantity, extendedprice cents) next to the POOLED r, flagging
    groups whose association runs opposite the pooled sign — the
    confounded-metric trap a single corr matrix can't show. Six exact
    BIGINT moment sums per group in ONE map-side-combined groupBy;
    pooled moments fold from the bounded per-group table
    (operators/stats.py::simpson_audit)."""
    from zparse_spark.operators.stats import simpson_audit

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    return simpson_audit(li, "x", "y", "l_returnflag")


_MAGNITUDE_SQL = """
    WITH base AS (
      SELECT o_orderpriority AS grp,
             CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
                  THEN o_totalprice * 100 ELSE o_totalprice END AS v
      FROM orders
    ),
    nz AS (SELECT grp, abs(v) AS av FROM base WHERE v IS NOT NULL AND abs(v) > 0),
    dec AS (
      SELECT grp,
             CASE WHEN av >= 1
                  THEN length(CAST(CAST(floor(av) AS BIGINT) AS VARCHAR)) - 1
                  ELSE -1 END AS decade
      FROM nz
    ),
    counts AS (SELECT grp, decade, count(*) AS n FROM dec GROUP BY grp, decade),
    ranked AS (
      SELECT grp, decade, n,
             sum(n) OVER (PARTITION BY grp) AS n_group,
             row_number() OVER (PARTITION BY grp ORDER BY n DESC, decade ASC) AS rk
      FROM counts
    ),
    top AS (
      SELECT grp, n_group,
             max(CASE WHEN rk = 1 THEN decade END) AS top_decade,
             max(CASE WHEN rk = 1 THEN n END) AS top_n,
             max(CASE WHEN rk = 2 THEN decade END) AS second_decade,
             max(CASE WHEN rk = 2 THEN n END) AS second_n
      FROM ranked WHERE rk <= 2 GROUP BY grp, n_group
    )
    SELECT grp AS o_orderpriority, n_group AS n_values,
           top_decade,
           round(CAST(top_n AS DOUBLE) / n_group, 6) AS top_share,
           second_decade,
           CASE WHEN second_n IS NOT NULL
                THEN round(CAST(second_n AS DOUBLE) / n_group, 6) END AS second_share,
           coalesce(CAST(second_n AS DOUBLE) / n_group >= 0.2
                    AND CAST(top_n AS DOUBLE) / n_group >= 0.2
                    AND abs(top_decade - second_decade) >= 3, FALSE) AS split_flag
    FROM top
"""


@register("audit_magnitude_orders", _MAGNITUDE_SQL)
def audit_magnitude_orders(spark, sf_dir):
    """Unit-consistency audit (X184): per-priority decimal-magnitude
    modes of |o_totalprice|, with a planted cents-into-dollars mixup
    (URGENT ∧ even orderkey scaled ×100) that must trip split_flag —
    two >=20%-mass decades >=3 apart is the signature of a units
    mixup that variance smears into noise. Decades are EXACT integer
    digit counts, never float log10; one map-side-combined groupBy on
    (group, decade), windows only on that bounded table
    (operators/stats.py::magnitude_profile)."""
    from zparse_spark.operators.stats import magnitude_profile

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.when(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") % 2 == 0),
            F.col("o_totalprice") * 100,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
    )
    return magnitude_profile(o, "v", "o_orderpriority", min_share=0.2, min_gap=3)


_CONTAIN_CTES = r"""inp AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT 'q_' || CAST(doc_id AS VARCHAR), substr(text, 40, 160)
      FROM documents WHERE doc_id % 9 = 0 AND length(text) >= 240
    ),
    d AS (
      SELECT doc_id, lower(trim(regexp_replace(coalesce(text,''), '\s+', ' ', 'g'))) AS t
      FROM inp
    ),
    h AS (
      SELECT doc_id,
             CASE WHEN length(t) >= 8
                  THEN list_transform(range(1, length(t) - 8 + 2),
                                      i -> md5(substring(t, CAST(i AS INT), 8)))
                  ELSE [md5(t)] END AS hs
      FROM d
    ),
    f AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(hs) >= 4
                    THEN list_transform(range(1, len(hs) - 4 + 2),
                                        j -> list_min(list_slice(hs, CAST(j AS INT), CAST(j + 3 AS INT))))
                    ELSE [list_min(hs)] END) AS fps
      FROM h
    ),
    post AS (SELECT doc_id, unnest(fps) AS fp FROM f),
    sz AS (SELECT doc_id, len(fps) AS n_fp FROM f),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fp
      FROM post a JOIN post b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    cpairs AS (
      SELECT s.id_a, s.id_b, s.shared_fp, za.n_fp AS n_fp_a, zb.n_fp AS n_fp_b,
             round(CAST(s.shared_fp AS DOUBLE) / (za.n_fp + zb.n_fp - s.shared_fp), 6) AS jaccard,
             round(CAST(s.shared_fp AS DOUBLE) / za.n_fp, 6) AS containment_a_in_b,
             round(CAST(s.shared_fp AS DOUBLE) / zb.n_fp, 6) AS containment_b_in_a
      FROM shared s
      JOIN sz za ON za.doc_id = s.id_a
      JOIN sz zb ON zb.doc_id = s.id_b
    )"""


@register(
    "dedup_containment_documents",
    f"""
    WITH {_CONTAIN_CTES}
    SELECT * FROM cpairs
    WHERE containment_a_in_b >= 0.8 OR containment_b_in_a >= 0.8
    """,
)
def dedup_containment_documents(spark, sf_dir):
    """Asymmetric containment over winnowing fingerprints (X185):
    |FP(A)∩FP(B)| / |FP(A)| — the quote-inclusion relation Jaccard
    structurally misses (a 160-char excerpt inside a 550-char page has
    tiny Jaccard but ~1.0 containment from the excerpt side). Planted
    'q_<id>' excerpt docs (substr 40..200 of every 9th long doc) must
    surface with high containment_a_in_b. Same bucketed inverted-index
    pipeline as X151 — only the trailing filter changes
    (operators/dedup.py::winnowing_containment)."""
    from zparse_spark.operators.dedup import winnowing_containment

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    planted = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 9 == 0) & (F.length("text") >= 240))
        .select(
            F.concat(F.lit("q_"), F.col("doc_id").cast("string")).alias("doc_id"),
            F.substring("text", 40, 160).alias("text"),
        )
    )
    return winnowing_containment(
        d.unionByName(planted), k=8, w=4, threshold=0.8
    )


# ---------------------------------------------------------------------------
# Dedup threshold-calibration sweep + freshness audit (X187-X188)
# ---------------------------------------------------------------------------


_SWEEP_SQL = r"""
    WITH inp AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + 1000000, text || ' extra mutant tokens appended here'
      FROM documents WHERE doc_id < 200 AND doc_id % 5 = 0
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 2, 1)),
               i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i, 3)
             )) AS sh
      FROM inp
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6) AS j
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    pb AS (
      SELECT least(CAST(floor(j * 20) AS INT), 20) AS bin, count(*) AS np
      FROM pairs GROUP BY 1
    ),
    dm AS (
      SELECT id, max(j) AS m FROM (
        SELECT id_a AS id, j FROM pairs UNION ALL SELECT id_b, j FROM pairs
      ) GROUP BY id
    ),
    db AS (
      SELECT least(CAST(floor(m * 20) AS INT), 20) AS bin, count(*) AS nd
      FROM dm GROUP BY 1
    ),
    grid AS (SELECT unnest(range(10, 21)) AS bin),
    curve AS (
      SELECT g.bin,
             sum(coalesce(pb.np, 0)) OVER (ORDER BY g.bin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_pairs,
             sum(coalesce(db.nd, 0)) OVER (ORDER BY g.bin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_docs
      FROM grid g
      LEFT JOIN pb ON pb.bin = g.bin
      LEFT JOIN db ON db.bin = g.bin
    )
    SELECT round(CAST(bin AS DOUBLE) / 20, 6) AS threshold, n_pairs, n_docs
    FROM curve
"""


@register("dedup_threshold_sweep", _SWEEP_SQL)
def dedup_threshold_sweep(spark, sf_dir):
    """Threshold-calibration sweep (X187): pairs and touched docs at
    every candidate verify threshold 0.5..1.0, from ONE scoring pass
    over a bounded calibration slice (doc_id < 200 + planted partial
    mutants spreading the mid-range) — the sensitivity curve that turns
    'pick 0.8' into a measured decision before committing the threshold
    to a 100 TB run. Cumulatives are windows over a <=21-row bin table
    (operators/dedup.py::pair_threshold_sweep)."""
    from zparse_spark.operators.dedup import ngram_jaccard_pairs, pair_threshold_sweep

    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    mut = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" extra mutant tokens appended here")).alias("text"),
    )
    d = base.select("doc_id", "text").unionByName(mut)
    ids = d.select(F.col("doc_id").alias("id_a"))
    ids_b = d.select(F.col("doc_id").alias("id_b"))
    cands = ids.crossJoin(ids_b).filter(F.col("id_a") < F.col("id_b"))
    pairs = ngram_jaccard_pairs(d, cands, k_shingle=3, mode="char", threshold=0.0)
    return pair_threshold_sweep(pairs, step=20, min_bin=10)


_FRESH_SQL = """
    WITH inp AS (
      SELECT event_type, ts FROM events
      UNION ALL
      SELECT 'legacy_import', ts - INTERVAL 20 DAY FROM events
      WHERE event_type = 'click'
    ),
    g AS (SELECT max(ts) AS gmax FROM inp),
    per AS (
      SELECT event_type, count(*) AS n, max(ts) AS last_ts
      FROM inp GROUP BY event_type
    )
    SELECT per.event_type, per.n, per.last_ts,
           (epoch_us(g.gmax) - epoch_us(per.last_ts)) // 3600000000 AS lag_hours,
           ((epoch_us(g.gmax) - epoch_us(per.last_ts)) // 3600000000) >= 72 AS stale
    FROM per, g
"""


@register("audit_freshness_events", _FRESH_SQL)
def audit_freshness_events(spark, sf_dir):
    """Ingestion-freshness audit (X188): per event type, the lag from
    its newest event to the stream's global high-water mark — the
    silently-dead-feed detector (a type whose loader stopped three
    weeks ago still has rows, counts, and healthy distributions; only
    its lag betrays it — planted here as 'legacy_import', a 20-day-old
    shadow of click). Deterministic: anchored to the data's OWN max,
    never wall-clock now(). Lag is exact integer microsecond
    arithmetic floor-divided to hours. Two tiny aggs: one
    map-side-combined groupBy(type) + a 1-row global max broadcast
    back — nothing rescans the events."""
    ev = _t(spark, sf_dir, "events")
    inp = ev.select("event_type", "ts").unionByName(
        ev.filter(F.col("event_type") == "click").select(
            F.lit("legacy_import").alias("event_type"),
            (F.col("ts") - F.expr("INTERVAL 20 DAYS")).alias("ts"),
        )
    )
    per = inp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
    )
    g = inp.agg(F.max("ts").alias("_gmax"))
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the cast's tz
    # interpretation cancels in the difference, so the lag is exact
    lag = F.floor(
        (
            F.unix_micros(F.col("_gmax").cast("timestamp"))
            - F.unix_micros(F.col("last_ts").cast("timestamp"))
        )
        / F.lit(3600000000)
    ).cast("bigint")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n",
            "last_ts",
            lag.alias("lag_hours"),
            (lag >= 72).alias("stale"),
        )
    )


# ---------------------------------------------------------------------------
# Source-influence jackknife + embedding dimension profile (X190-X191)
# ---------------------------------------------------------------------------


_INFLUENCE_SQL = """
    WITH per AS (
      SELECT source, count(*) AS n, sum(n_chars) AS t
      FROM documents GROUP BY source
    ),
    g AS (SELECT sum(n) AS gn, sum(t) AS gt FROM per)
    SELECT per.source, per.n AS n_docs,
           round(CAST(per.t AS DOUBLE) / per.n, 6) AS mean_source,
           round(CAST(g.gt - per.t AS DOUBLE) / (g.gn - per.n), 6) AS mean_excl,
           round(CAST(g.gt AS DOUBLE) / g.gn
                 - CAST(g.gt - per.t AS DOUBLE) / (g.gn - per.n), 6) AS influence
    FROM per, g
    WHERE g.gn > per.n
"""


@register("audit_source_influence", _INFLUENCE_SQL)
def audit_source_influence(spark, sf_dir):
    """Leave-one-out source influence (X190): how much each source
    MOVES the corpus-wide mean doc length — the jackknife robustness
    check for any headline corpus metric ("is our average quality
    carried by one crawl?"). influence_s = mean_all − mean_without_s,
    recombined ALGEBRAICALLY from exact integer (count, sum) partials:
    one map-side-combined groupBy(source), the global totals fold from
    that bounded table and broadcast back — the corpus is scanned once,
    and no per-source rescan ever happens (the naive jackknife is
    |sources| scans; this is the same number exactly)."""
    per = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("t"))
    )
    g = per.agg(F.sum("n").alias("gn"), F.sum("t").alias("gt"))
    mean_excl = (F.col("gt") - F.col("t")).cast("double") / (
        F.col("gn") - F.col("n")
    )
    return (
        per.crossJoin(F.broadcast(g))
        .filter(F.col("gn") > F.col("n"))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(F.col("t").cast("double") / F.col("n"), 6).alias("mean_source"),
            F.round(mean_excl, 6).alias("mean_excl"),
            F.round(
                F.col("gt").cast("double") / F.col("gn") - mean_excl, 6
            ).alias("influence"),
        )
    )


_DIM_PROFILE_SQL = """
    WITH q AS (
      SELECT u.dim - 1 AS dim, CAST(round(u.x * 1000000) AS BIGINT) AS xq
      FROM (
        SELECT unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
      ) u
    ),
    per AS (
      SELECT dim, count(*) AS n, sum(xq) AS s, sum(xq * xq) AS ss
      FROM q GROUP BY dim
    ),
    v AS (
      SELECT dim, n,
             round(CAST(s AS DOUBLE) / n / 1000000, 6) AS mean,
             (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s) AS vnum,
             CAST(n AS HUGEINT) * n AS vden
      FROM per
    ),
    tr AS (SELECT sum(CAST(vnum AS DOUBLE) / CAST(vden AS DOUBLE)) AS trace FROM v)
    SELECT v.dim, v.n, v.mean,
           round(CAST(v.vnum AS DOUBLE) / CAST(v.vden AS DOUBLE) / 1e12, 6) AS variance,
           round((CAST(v.vnum AS DOUBLE) / CAST(v.vden AS DOUBLE)) / tr.trace, 6)
             AS share_of_trace
    FROM v, tr
"""


@register("embedding_dim_profile", _DIM_PROFILE_SQL)
def embedding_dim_profile(spark, sf_dir):
    """Per-dimension embedding profile (X191): mean, variance and each
    dimension's SHARE of the total variance (trace) — the dimensional-
    collapse detector for embedding health (a healthy encoder spreads
    variance; one dimension hogging the trace means the ANN distances
    are effectively 1-D and recall claims are fiction). Values are
    quantized to exact integer micro-units BEFORE summing (the X150
    micro-nat discipline) so every moment is exact DECIMAL/HUGEINT
    arithmetic — float sum order can never flip a 6dp digit
    cross-engine. One posexplode (bounded: 64 dims/row) + ONE
    map-side-combined groupBy(dim); the trace folds from the 64-row
    table."""
    e = _t(spark, sf_dir, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    q = e.select(
        "dim", F.round(F.col("x") * 1000000).cast("bigint").alias("xq")
    )
    per = q.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("s"),
        F.sum(F.col("xq").cast("decimal(19,0)") * F.col("xq")).alias("ss"),
    )
    vnum = (
        F.col("n").cast("decimal(38,0)") * F.col("ss")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    vden = F.col("n").cast("decimal(38,0)") * F.col("n")
    v = per.select(
        "dim",
        "n",
        F.round(F.col("s").cast("double") / F.col("n") / 1000000, 6).alias("mean"),
        (vnum.cast("double") / vden.cast("double")).alias("_var"),
    )
    tr = v.agg(F.sum("_var").alias("_trace"))
    return (
        v.crossJoin(F.broadcast(tr))
        .select(
            "dim",
            "n",
            "mean",
            F.round(F.col("_var") / 1e12, 6).alias("variance"),
            F.round(F.col("_var") / F.col("_trace"), 6).alias("share_of_trace"),
        )
    )


# ---------------------------------------------------------------------------
# Binned Mann-Whitney rank drift (X192)
# ---------------------------------------------------------------------------


_MWU_SQL = """
    WITH inp AS (
      SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
      UNION ALL
      SELECT '9-SHIFTED', o_totalprice * 1.5 FROM orders WHERE o_orderkey % 11 = 0
    ),
    vals AS (
      SELECT g,
             least(greatest(CAST(floor((v - 0.0) / 18750.0) AS BIGINT), 0), 31) AS bin
      FROM inp WHERE v IS NOT NULL
    ),
    counts AS (SELECT g, bin, count(*) AS b FROM vals GROUP BY 1, 2),
    grid AS (SELECT gg.g, r.bin
             FROM (SELECT DISTINCT g FROM counts) gg, range(32) r(bin)),
    dense AS (SELECT grid.g, grid.bin, coalesce(c.b, 0) AS b
              FROM grid LEFT JOIN counts c ON c.g = grid.g AND c.bin = grid.bin),
    gbin AS (SELECT bin, sum(b) AS gn FROM dense GROUP BY bin),
    tg AS (SELECT sum(CAST(gn AS HUGEINT) * gn * gn - gn) AS T FROM gbin),
    j AS (SELECT d.g, d.bin, d.b, gl.gn - d.b AS a
          FROM dense d JOIN gbin gl ON gl.bin = d.bin),
    terms AS (
      SELECT g, b, a,
             CAST(b AS HUGEINT)
               * (2 * coalesce(sum(a) OVER (PARTITION BY g ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + a)
               AS u2
      FROM j
    ),
    per AS (
      SELECT g, sum(b) AS nb, sum(a) AS na, sum(u2) AS two_u
      FROM terms GROUP BY g
    )
    SELECT per.g AS o_orderpriority,
           per.nb AS n_group, per.na AS n_rest,
           CAST(per.two_u AS BIGINT) AS two_u,
           CASE WHEN per.na > 0 AND per.nb > 0 THEN
             round((CAST(per.two_u AS DOUBLE) - CAST(per.na AS DOUBLE) * per.nb)
                   / (CAST(per.na AS DOUBLE) * per.nb), 6) END AS r_rank_biserial,
           CASE WHEN per.na > 0 AND per.nb > 0 AND
                     CAST(per.na AS DOUBLE) * per.nb
                     * ((CAST(per.na + per.nb AS DOUBLE) + 1.0)
                        - CAST(tg.T AS DOUBLE)
                          / (CAST(per.na + per.nb AS DOUBLE)
                             * (CAST(per.na + per.nb AS DOUBLE) - 1.0)))
                     / 12.0 > 0 THEN
             round((CAST(per.two_u AS DOUBLE) - CAST(per.na AS DOUBLE) * per.nb)
                   / (2.0 * sqrt(CAST(per.na AS DOUBLE) * per.nb
                       * ((CAST(per.na + per.nb AS DOUBLE) + 1.0)
                          - CAST(tg.T AS DOUBLE)
                            / (CAST(per.na + per.nb AS DOUBLE)
                               * (CAST(per.na + per.nb AS DOUBLE) - 1.0)))
                       / 12.0)), 6) END AS z
    FROM per, tg
"""


@register("drift_mwu_totalprice", _MWU_SQL)
def drift_mwu_totalprice(spark, sf_dir):
    """Binned Mann-Whitney rank drift (X192): each priority's
    o_totalprice vs the rest, with a planted '9-SHIFTED' group (x1.5
    prices) that must show z >> 0 while the organic priorities sit near
    the null — the rank-location leg of the drift family (KS: max CDF
    gap; EMD: transported mass; PSI/KL: density ratio; MWU: is the
    shift bigger than chance, outlier-robustly). 2U and the
    tie-corrected variance are exact DECIMAL/HUGEINT integer arithmetic
    from ONE groupBy(group,bin) scan
    (operators/stats.py::mwu_drift_scores)."""
    from zparse_spark.operators.stats import mwu_drift_scores

    o = _t(spark, sf_dir, "orders")
    inp = o.select(
        F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("v")
    ).unionByName(
        o.filter(F.col("o_orderkey") % 11 == 0).select(
            F.lit("9-SHIFTED").alias("g"),
            (F.col("o_totalprice") * 1.5).alias("v"),
        )
    )
    out = mwu_drift_scores(inp, "v", "g", lo=0.0, hi=600000.0, n_bins=32)
    return out.select(
        F.col("g").alias("o_orderpriority"),
        "n_group",
        "n_rest",
        F.col("two_u").cast("bigint").alias("two_u"),
        "r_rank_biserial",
        "z",
    )


# ---------------------------------------------------------------------------
# Declarative expectation suite (X193)
# ---------------------------------------------------------------------------


_SUITE_SQL = """
    WITH oagg AS (
      SELECT count(*) AS n,
             count(DISTINCT o_orderkey) AS d1, count(o_orderkey) AS c1,
             count(o_custkey) AS c2,
             quantile_cont(o_totalprice, 0.95) AS q3,
             count(CASE WHEN o_orderstatus IS NOT NULL
                        AND o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS b4
      FROM orders
    ),
    lagg AS (
      SELECT count(*) AS n, min(l_quantity) AS m5, max(l_quantity) AS m6,
             count(DISTINCT (l_orderkey, l_linenumber)) AS d10,
             count(CASE WHEN l_orderkey IS NOT NULL
                        AND l_linenumber IS NOT NULL THEN 1 END) AS c10
      FROM lineitem
    ),
    dagg AS (
      SELECT count(*) AS n, count(lang) AS c7,
             quantile_cont(n_chars, 0.5) AS q8
      FROM documents
    )
    SELECT 'E1' AS rule_id, 'orders' AS "table", 'o_orderkey' AS "column",
           'unique' AS kind, CAST(c1 - d1 AS DOUBLE) AS observed,
           0.0 AS bound_lo, 0.0 AS bound_hi, c1 = d1 AS passed FROM oagg
    UNION ALL
    SELECT 'E2', 'orders', 'o_custkey', 'null_rate_max',
           round(CAST(n - c2 AS DOUBLE) / greatest(n, 1), 6),
           NULL, 0.02, round(CAST(n - c2 AS DOUBLE) / greatest(n, 1), 6) <= 0.02
    FROM oagg
    UNION ALL
    SELECT 'E3', 'orders', 'o_totalprice', 'quantile_band',
           round(CAST(q3 AS DOUBLE), 6), 150000.0, 400000.0,
           round(CAST(q3 AS DOUBLE), 6) >= 150000.0
             AND round(CAST(q3 AS DOUBLE), 6) <= 400000.0 FROM oagg
    UNION ALL
    SELECT 'E4', 'orders', 'o_orderstatus', 'accepted_values',
           CAST(b4 AS DOUBLE), 0.0, 0.0, b4 = 0 FROM oagg
    UNION ALL
    SELECT 'E5', 'lineitem', NULL, 'row_count_between',
           CAST(n AS DOUBLE), 1000.0, 1000000000.0,
           n >= 1000 AND n <= 1000000000 FROM lagg
    UNION ALL
    SELECT 'E6', 'lineitem', 'l_quantity', 'min_at_least',
           CAST(m5 AS DOUBLE), 0.0, NULL, m5 >= 0.0 FROM lagg
    UNION ALL
    SELECT 'E7', 'lineitem', 'l_quantity', 'max_at_most',
           CAST(m6 AS DOUBLE), NULL, 25.0, m6 <= 25.0 FROM lagg
    UNION ALL
    SELECT 'E8', 'documents', 'lang', 'null_rate_max',
           round(CAST(n - c7 AS DOUBLE) / greatest(n, 1), 6),
           NULL, 0.5, round(CAST(n - c7 AS DOUBLE) / greatest(n, 1), 6) <= 0.5
    FROM dagg
    UNION ALL
    SELECT 'E9', 'documents', 'n_chars', 'quantile_band',
           round(CAST(q8 AS DOUBLE), 6), 100.0, 500.0,
           round(CAST(q8 AS DOUBLE), 6) >= 100.0
             AND round(CAST(q8 AS DOUBLE), 6) <= 500.0 FROM dagg
    UNION ALL
    SELECT 'E10', 'lineitem', 'l_orderkey,l_linenumber', 'unique',
           CAST(c10 - d10 AS DOUBLE), 0.0, 0.0, c10 = d10 FROM lagg
"""


@register("contract_expectation_suite", _SUITE_SQL)
def contract_expectation_suite(spark, sf_dir):
    """Declarative expectation suite (X193): the table-level altitude
    of the contract family — the reference enforces per-document
    strictness (json/parser.rs), the rule pack enforces per-row/span
    rules, and this runs the release-gate suite over AGGREGATE facts
    (uniqueness, null-rate bounds, exact p95/p50 bands, row-count
    bounds, accepted values, min/max bounds) in the uniform verdict
    schema. K expectations on a table compile into ONE agg pass
    (conditional aggregates + exact interpolated percentiles in the
    same agg, materialized once); K tables = K scans, never K x |suite|
    (operators/expectations.py::expectation_suite). E7's deliberate
    tight bound (l_quantity <= 25, real max 50) keeps a planted FAIL in
    the gate so a silently-all-green suite cannot masquerade as
    health."""
    from zparse_spark.operators.expectations import expectation_suite

    tables = {
        "orders": _t(spark, sf_dir, "orders"),
        "lineitem": _t(spark, sf_dir, "lineitem"),
        "documents": _t(spark, sf_dir, "documents"),
    }
    spec = [
        {"rule_id": "E1", "table": "orders", "kind": "unique", "column": "o_orderkey"},
        {"rule_id": "E2", "table": "orders", "kind": "null_rate_max",
         "column": "o_custkey", "max_rate": 0.02},
        {"rule_id": "E3", "table": "orders", "kind": "quantile_band",
         "column": "o_totalprice", "p": 0.95, "lo": 150000.0, "hi": 400000.0},
        {"rule_id": "E4", "table": "orders", "kind": "accepted_values",
         "column": "o_orderstatus", "values": ["O", "F", "P"]},
        {"rule_id": "E5", "table": "lineitem", "kind": "row_count_between",
         "lo": 1000, "hi": 1000000000},
        {"rule_id": "E6", "table": "lineitem", "kind": "min_at_least",
         "column": "l_quantity", "lo": 0.0},
        {"rule_id": "E7", "table": "lineitem", "kind": "max_at_most",
         "column": "l_quantity", "hi": 25.0},
        {"rule_id": "E8", "table": "documents", "kind": "null_rate_max",
         "column": "lang", "max_rate": 0.5},
        {"rule_id": "E9", "table": "documents", "kind": "quantile_band",
         "column": "n_chars", "p": 0.5, "lo": 100.0, "hi": 500.0},
        {"rule_id": "E10", "table": "lineitem", "kind": "unique",
         "column": ["l_orderkey", "l_linenumber"]},
    ]
    return expectation_suite(tables, spec)


# ---------------------------------------------------------------------------
# PSI null-band calibration (X194)
# ---------------------------------------------------------------------------


def _psi_null_oracle_sql(n_seeds: int = 8, eps: float = 1e-4) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(seed AS VARCHAR)")
    return f"""
    WITH seeded AS (
      SELECT d.lang, s.seed,
             CASE WHEN {hv} / 4294967296.0 < 0.5 THEN 1 ELSE 0 END AS in_a
      FROM documents d, range({n_seeds}) s(seed)
      WHERE d.lang IS NOT NULL
    ),
    counts AS (
      SELECT seed, lang,
             sum(in_a) AS ca, sum(1 - in_a) AS cb
      FROM seeded GROUP BY seed, lang
    ),
    tot AS (
      SELECT seed, sum(ca) AS ta, sum(cb) AS tb FROM counts GROUP BY seed
    ),
    terms AS (
      SELECT c.seed, t.ta, t.tb,
             CAST(round(
               ((CASE WHEN t.ta > 0 THEN CAST(c.ca AS DOUBLE) / t.ta ELSE 0 END + {eps!r})
                - (CASE WHEN t.tb > 0 THEN CAST(c.cb AS DOUBLE) / t.tb ELSE 0 END + {eps!r}))
               * ln(((CASE WHEN t.ta > 0 THEN CAST(c.ca AS DOUBLE) / t.ta ELSE 0 END + {eps!r}))
                    / ((CASE WHEN t.tb > 0 THEN CAST(c.cb AS DOUBLE) / t.tb ELSE 0 END + {eps!r})))
               * 1000000000) AS BIGINT) AS nano
      FROM counts c JOIN tot t ON t.seed = c.seed
    )
    SELECT seed, max(ta) AS n_a, max(tb) AS n_b,
           round(CAST(sum(nano) AS DOUBLE) / 1000000000, 6) AS psi
    FROM terms GROUP BY seed
    """


@register("drift_psi_null_band", _psi_null_oracle_sql())
def drift_psi_null_band(spark, sf_dir):
    """PSI null-band calibration (X194): the PSI of the lang mix
    between two DETERMINISTIC hash-halves of the same corpus, for 8
    disjoint seeds — an empirical answer to "what PSI is just noise for
    OUR data?" that replaces the 0.1/0.2 folklore thresholds with a
    data-calibrated band (observed drift above max(null band) is
    signal; inside it, sampling noise). Same eps-floored D1 arithmetic
    as the drift rule; every PSI term is quantized to integer
    nano-units PRE-SUM (the X150 discipline) so the per-seed sum is
    order-independent and bit-identical cross-engine. ONE scan: the
    seed fan-out rides an 8-element explode, everything after the
    groupBy(seed, lang) is bounded."""
    n_seeds, eps = 8, 1e-4
    d = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    seeded = d.select(
        "lang", F.explode(F.array(*[F.lit(s) for s in range(n_seeds)])).alias("seed"),
        "doc_id",
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("seed").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / float(0x100000000)
    )
    seeded = seeded.select(
        "seed", "lang", F.when(u < 0.5, F.lit(1)).otherwise(F.lit(0)).alias("in_a")
    )
    counts = seeded.groupBy("seed", "lang").agg(
        F.sum("in_a").alias("ca"), F.sum(1 - F.col("in_a")).alias("cb")
    )
    tot = counts.groupBy("seed").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    j = counts.join(F.broadcast(tot), "seed")
    pa = (
        F.when(F.col("ta") > 0, F.col("ca").cast("double") / F.col("ta")).otherwise(
            F.lit(0.0)
        )
        + eps
    )
    pb = (
        F.when(F.col("tb") > 0, F.col("cb").cast("double") / F.col("tb")).otherwise(
            F.lit(0.0)
        )
        + eps
    )
    nano = F.round((pa - pb) * F.log(pa / pb) * 1000000000).cast("bigint")
    return (
        j.select("seed", "ta", "tb", nano.alias("nano"))
        .groupBy("seed")
        .agg(
            F.max("ta").alias("n_a"),
            F.max("tb").alias("n_b"),
            F.round(F.sum("nano").cast("double") / 1000000000, 6).alias("psi"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted (multiset) Jaccard (X195)
# ---------------------------------------------------------------------------


_WJACCARD_SQL = r"""
    WITH inp AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 120
      UNION ALL
      SELECT doc_id + 5000,
             text || ' ' || repeat(
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '')[1] || ' ', 30)
      FROM documents WHERE doc_id < 120 AND doc_id % 7 = 0
    ),
    tok AS (
      SELECT doc_id, token, count(*) AS c FROM (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'),
                                  x -> x <> '')) AS token
        FROM inp
      ) GROUP BY doc_id, token
    ),
    n AS (SELECT doc_id, sum(c) AS ntok FROM tok GROUP BY doc_id),
    ids AS (SELECT DISTINCT doc_id FROM inp),
    prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ids a JOIN ids b ON a.doc_id < b.doc_id),
    inter AS (
      SELECT p.id_a, p.id_b, sum(least(ta.c, tb.c)) AS w_inter
      FROM prs p
      JOIN tok ta ON ta.doc_id = p.id_a
      JOIN tok tb ON tb.doc_id = p.id_b AND tb.token = ta.token
      GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b,
           coalesce(i.w_inter, 0) AS w_inter,
           na.ntok + nb.ntok - coalesce(i.w_inter, 0) AS w_union,
           round(CAST(coalesce(i.w_inter, 0) AS DOUBLE)
                 / (na.ntok + nb.ntok - coalesce(i.w_inter, 0)), 6) AS w_jaccard
    FROM prs p
    LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    JOIN n na ON na.doc_id = p.id_a
    JOIN n nb ON nb.doc_id = p.id_b
    WHERE round(CAST(coalesce(i.w_inter, 0) AS DOUBLE)
                / (na.ntok + nb.ntok - coalesce(i.w_inter, 0)), 6) >= 0.3
"""


@register("dedup_weighted_jaccard_documents", _WJACCARD_SQL)
def dedup_weighted_jaccard_documents(spark, sf_dir):
    """Weighted multiset Jaccard (X195): the repetition-aware seat of
    the similarity family — set Jaccard scores a template-spam balloon
    (one token repeated 30x, planted as the doc_id+5000 twins) as
    near-identical to its source; the weighted form charges every
    repeated occurrence, which is what a keep-rule wants for spam.
    Exact integer token counts, one trailing division; candidates here
    are the bounded slice's all-pairs (production: LSH/winnowing
    buckets feed the same operator)
    (operators/dedup.py::weighted_jaccard_pairs)."""
    from zparse_spark.operators.dedup import weighted_jaccard_pairs

    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    first_tok = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )[0]
    balloon = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat(
            "text", F.lit(" "), F.repeat(F.concat(first_tok, F.lit(" ")), 30)
        ).alias("text"),
    )
    d = base.select("doc_id", "text").unionByName(balloon)
    ids = d.select(F.col("doc_id").alias("id_a"))
    ids_b = d.select(F.col("doc_id").alias("id_b"))
    cands = ids.crossJoin(ids_b).filter(F.col("id_a") < F.col("id_b"))
    return weighted_jaccard_pairs(d, cands, threshold=0.3)


# ---------------------------------------------------------------------------
# Context-window chunking (X196)
# ---------------------------------------------------------------------------


_CHUNK_SQL = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'),
                         x -> x <> '') AS ts
      FROM documents WHERE doc_id < 300
    ),
    c AS (
      SELECT doc_id, ts, CAST(ceil(len(ts) / 16.0) AS INT) AS nch
      FROM toks WHERE len(ts) > 0
    ),
    ex AS (
      SELECT doc_id,
             unnest(list_transform(range(nch), i -> struct_pack(
               chunk_id := i,
               n_tokens := least(len(ts) - i * 16, 16),
               chunk_text := array_to_string(list_slice(ts, i * 16 + 1, i * 16 + 16), ' ')
             ))) AS u
      FROM c
    )
    SELECT doc_id, CAST(u.chunk_id AS BIGINT) AS chunk_id,
           CAST(u.n_tokens AS BIGINT) AS n_tokens, u.chunk_text
    FROM ex
"""


@register("corpus_chunk_documents", _CHUNK_SQL)
def corpus_chunk_documents(spark, sf_dir):
    """Fixed-size token chunking (X196): each doc becomes order-
    preserving 16-token context blocks keyed (doc_id, chunk_id) — the
    block-prep step between admission filtering and pack/shuffle in a
    training-set build. MAP-ONLY until the unavoidable output explode:
    token array, chunk count and every slice are HOFs over one
    projection with the array bound once (the CollapseProject trap,
    dedup.py:1004); plan = scan + Generate, no shuffle, no Python
    (operators/filtering.py::chunk_documents)."""
    from zparse_spark.operators.filtering import chunk_documents

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out = chunk_documents(d, max_tokens=16)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "chunk_text",
    )


# ---------------------------------------------------------------------------
# Salted-join equivalence (X197)
# ---------------------------------------------------------------------------


_SALTED_SQL = """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
"""


@register("join_salted_equivalence", _SALTED_SQL)
def join_salted_equivalence(spark, sf_dir):
    """Salted-join equivalence (X197): the skew-resilient join the
    north rule names — the big side spread over 16 salt sub-keys, the
    dimension side replicated to match — must produce EXACTLY the plain
    join's aggregate (salting redistributes rows, never changes the
    relation). DuckDB's twin is the plain join, so this green row is
    the end-to-end certificate for the salting path that was previously
    pytest-only (operators/skew.py::salted_join; the rand salt is
    harmless to correctness because the replicated side carries every
    salt value). Revenue in exact cents so the sum is integer-exact."""
    from zparse_spark.operators.skew import salted_join

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(o, c, "c_custkey", n_salts=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Expectation-suite regression diff (X198)
# ---------------------------------------------------------------------------


_SUITE_DIFF_SQL = """
    WITH oldagg AS (
      SELECT count(*) AS n, count(DISTINCT doc_id) AS d, count(doc_id) AS c,
             count(lang) AS cl, quantile_cont(n_chars, 0.5) AS q
      FROM documents
    ),
    newagg AS (
      SELECT count(*) AS n, count(DISTINCT doc_id) AS d, count(doc_id) AS c,
             count(CASE WHEN doc_id % 3 = 0 THEN lang END) AS cl,
             quantile_cont(n_chars, 0.5) AS q
      FROM documents
    ),
    oldv AS (
      SELECT 'E1' AS rule_id, 'unique' AS kind,
             CAST(c - d AS DOUBLE) AS observed, c = d AS passed FROM oldagg
      UNION ALL
      SELECT 'E2', 'null_rate_max',
             round(CAST(n - cl AS DOUBLE) / greatest(n, 1), 6),
             round(CAST(n - cl AS DOUBLE) / greatest(n, 1), 6) <= 0.5 FROM oldagg
      UNION ALL
      SELECT 'E3', 'quantile_band', round(CAST(q AS DOUBLE), 6),
             round(CAST(q AS DOUBLE), 6) >= 100.0
               AND round(CAST(q AS DOUBLE), 6) <= 500.0 FROM oldagg
      UNION ALL
      SELECT 'E4', 'row_count_between', CAST(n AS DOUBLE),
             n >= 100 AND n <= 1000000000 FROM oldagg
    ),
    newv AS (
      SELECT 'E1' AS rule_id, 'unique' AS kind,
             CAST(c - d AS DOUBLE) AS observed, c = d AS passed FROM newagg
      UNION ALL
      SELECT 'E2', 'null_rate_max',
             round(CAST(n - cl AS DOUBLE) / greatest(n, 1), 6),
             round(CAST(n - cl AS DOUBLE) / greatest(n, 1), 6) <= 0.5 FROM newagg
      UNION ALL
      SELECT 'E3', 'quantile_band', round(CAST(q AS DOUBLE), 6),
             round(CAST(q AS DOUBLE), 6) >= 100.0
               AND round(CAST(q AS DOUBLE), 6) <= 500.0 FROM newagg
      UNION ALL
      SELECT 'E4', 'row_count_between', CAST(n AS DOUBLE),
             n >= 100 AND n <= 1000000000 FROM newagg
    )
    SELECT o.rule_id, o.kind,
           o.observed AS observed_old, n.observed AS observed_new,
           o.passed AS passed_old, n.passed AS passed_new,
           o.passed <> n.passed AS flipped
    FROM oldv o JOIN newv n ON n.rule_id = o.rule_id
"""


@register("contract_suite_regression", _SUITE_DIFF_SQL)
def contract_suite_regression(spark, sf_dir):
    """Expectation-suite regression diff (X198): the same suite run on
    the last snapshot and the candidate snapshot, joined on rule_id —
    the release gate's actual question is not "is the suite green" but
    "WHAT FLIPPED since the version we shipped" (a long-red expectation
    is known debt; a fresh flip is the regression). Planted: the new
    snapshot nulls lang on 2/3 of docs, so the null-rate expectation
    must flip red while uniqueness/quantile/row-count hold. Two 1-row
    agg passes (one per snapshot) + a |suite|-row join — scan cost is
    exactly two suite runs, the diff is free."""
    from zparse_spark.operators.expectations import expectation_suite

    old = _t(spark, sf_dir, "documents")
    new = old.select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.col("lang")).alias("lang"),
        "source",
        "n_chars",
    )
    spec = [
        {"rule_id": "E1", "table": "documents", "kind": "unique", "column": "doc_id"},
        {"rule_id": "E2", "table": "documents", "kind": "null_rate_max",
         "column": "lang", "max_rate": 0.5},
        {"rule_id": "E3", "table": "documents", "kind": "quantile_band",
         "column": "n_chars", "p": 0.5, "lo": 100.0, "hi": 500.0},
        {"rule_id": "E4", "table": "documents", "kind": "row_count_between",
         "lo": 100, "hi": 1000000000},
    ]
    o = expectation_suite({"documents": old}, spec).select(
        "rule_id", "kind",
        F.col("observed").alias("observed_old"),
        F.col("passed").alias("passed_old"),
    )
    nw = expectation_suite({"documents": new}, spec).select(
        "rule_id",
        F.col("observed").alias("observed_new"),
        F.col("passed").alias("passed_new"),
    )
    return o.join(nw, "rule_id").select(
        "rule_id", "kind", "observed_old", "observed_new",
        "passed_old", "passed_new",
        (F.col("passed_old") != F.col("passed_new")).alias("flipped"),
    )


# ---------------------------------------------------------------------------
# Tokenizer-coverage / OOV-rate audit (X199)
# ---------------------------------------------------------------------------


_OOV_SQL = r"""
    WITH tok AS (
      SELECT source, token FROM (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'),
                                  x -> x <> '')) AS token
        FROM documents
      )
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, count(*) AS tf FROM tok GROUP BY token
        ORDER BY tf DESC, token ASC LIMIT 500
      )
    )
    SELECT t.source,
           count(*) AS n_tokens,
           count(CASE WHEN v.token IS NULL THEN 1 END) AS n_oov,
           round(CAST(count(CASE WHEN v.token IS NULL THEN 1 END) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.source
"""


@register("corpus_oov_rate", _OOV_SQL)
def corpus_oov_rate(spark, sf_dir):
    """Tokenizer-coverage audit (X199): per-source share of token
    occurrences falling OUTSIDE a frozen top-500 vocabulary — the
    question a tokenizer owner asks of every new crawl ("how much of
    this is byte-fallback?"), which the continuous LM scores
    deliberately smooth over (an OOV token has a probability; a frozen
    tokenizer has a cliff). Deterministic vocab: tf desc, token asc —
    a TakeOrdered, never a global sort. Two passes over the token
    stream (vocab fit + coverage scan), the join side is the bounded
    vocab (broadcast), per-source rates from exact integer counts."""
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(
                F.filter(
                    F.split(
                        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                        r"\s+",
                    ),
                    lambda x: x != "",
                )
            ).alias("token"),
        )
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(500)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "token", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("_in_vocab").isNull(), 1)).alias("n_oov"),
        F.round(
            F.count(F.when(F.col("_in_vocab").isNull(), 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# BH-FDR control over the drift alarms (X200)
# ---------------------------------------------------------------------------


def _phi_tail_sql(z: str) -> str:
    """Two-sided normal p-value 2(1-Phi(|z|)) via the Abramowitz-Stegun
    26.2.17 polynomial — plain exp + arithmetic, identical text in both
    engines, |error| < 7.5e-8 (far below the 6dp rounding)."""
    az = f"abs({z})"
    t = f"(1.0 / (1.0 + 0.2316419 * {az}))"
    pdf = f"(exp(-({az} * {az}) / 2.0) / sqrt(2.0 * pi()))"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * (1.781477937 "
        f"+ {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    return f"round(least(2.0 * {pdf} * {poly}, 1.0), 6)"


_FDR_SQL = f"""
    WITH mwu AS ({{mwu_sql}}),
    scored AS (
      SELECT o_orderpriority, z, {_phi_tail_sql('z')} AS p
      FROM mwu WHERE z IS NOT NULL
    ),
    ranked AS (
      SELECT o_orderpriority, z, p,
             row_number() OVER (ORDER BY p ASC, o_orderpriority ASC) AS rk,
             count(*) OVER () AS m
      FROM scored
    ),
    flag AS (
      SELECT *, round(CAST(rk AS DOUBLE) / m * 0.05, 6) AS bh_threshold,
             CASE WHEN p <= CAST(rk AS DOUBLE) / m * 0.05 THEN rk END AS hit
      FROM ranked
    ),
    kmax AS (SELECT coalesce(max(hit), 0) AS k FROM flag)
    SELECT f.o_orderpriority, f.z, f.p, f.rk AS rank, f.bh_threshold,
           f.rk <= kmax.k AS significant
    FROM flag f, kmax
"""


@register("drift_mwu_fdr", _FDR_SQL.format(mwu_sql=_MWU_SQL))
def drift_mwu_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR control over the drift alarms (X200): at
    10^12-doc scale a monitor runs thousands of group x metric tests
    per day — at alpha=0.05 that is hundreds of guaranteed false
    alarms, the failure mode that teaches operators to ignore the
    dashboard. BH step-up (rank p ascending, alarm iff rank <=
    max{{k: p_(k) <= k*q/m}}) caps the EXPECTED FALSE SHARE of fired
    alarms at q=5%. p-values come from the MWU z via the
    Abramowitz-Stegun normal-tail polynomial — plain exp+arithmetic
    written identically in both engines (no erf built-in exists in
    either), |err| < 7.5e-8. All ranking/threshold work on the bounded
    per-group table. At this n (16k rows/group) even the organic
    groups' small contamination shifts reach significance — the
    classic large-n caveat, honestly visible here: BH controls the
    false-discovery SHARE among alarms, and pairing it with the
    rank-biserial effect size (r ~ 0.32 planted vs |r| < 0.06 organic)
    is what separates actionable drift from significant-but-tiny."""
    from pyspark.sql import Window

    from zparse_spark.operators.stats import mwu_drift_scores

    o = _t(spark, sf_dir, "orders")
    inp = o.select(
        F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("v")
    ).unionByName(
        o.filter(F.col("o_orderkey") % 11 == 0).select(
            F.lit("9-SHIFTED").alias("g"),
            (F.col("o_totalprice") * 1.5).alias("v"),
        )
    )
    mwu = mwu_drift_scores(inp, "v", "g", lo=0.0, hi=600000.0, n_bins=32)
    z = F.col("z")
    az = F.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    pdf = F.exp(-(az * az) / 2.0) / F.sqrt(F.lit(2.0) * F.lit(3.141592653589793))
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    p = F.round(F.least(2.0 * pdf * poly, F.lit(1.0)), 6)
    scored = mwu.filter(z.isNotNull()).select(
        F.col("g").alias("o_orderpriority"), "z", p.alias("p")
    )
    wr = Window.orderBy(F.col("p").asc(), F.col("o_orderpriority").asc())
    ranked = scored.select(
        "*",
        F.row_number().over(wr).alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("_m"),
    )
    thr = F.col("rank").cast("double") / F.col("_m") * 0.05
    flagged = ranked.select(
        "*",
        F.round(thr, 6).alias("bh_threshold"),
        F.when(F.col("p") <= thr, F.col("rank")).alias("_hit"),
    )
    kmax = flagged.agg(F.coalesce(F.max("_hit"), F.lit(0)).alias("_k"))
    return (
        flagged.crossJoin(F.broadcast(kmax))
        .select(
            "o_orderpriority",
            "z",
            "p",
            "rank",
            "bh_threshold",
            (F.col("rank") <= F.col("_k")).alias("significant"),
        )
    )


# ---------------------------------------------------------------------------
# Median order-statistic CI (X201)
# ---------------------------------------------------------------------------


_MEDIAN_CI_SQL = """
    WITH v AS (
      SELECT o_orderpriority AS g, o_totalprice AS _v FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    ranked AS (
      SELECT g, _v,
             row_number() OVER (PARTITION BY g ORDER BY _v ASC) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM v
    ),
    marked AS (
      SELECT g, _v, rn, n,
             greatest(1, CAST(floor(CAST(n AS DOUBLE) / 2
                 - 1.96 * sqrt(CAST(n AS DOUBLE)) / 2) AS INT)) AS lo_rk,
             least(n, CAST(ceil(CAST(n AS DOUBLE) / 2 + 1
                 + 1.96 * sqrt(CAST(n AS DOUBLE)) / 2) AS INT)) AS hi_rk
      FROM ranked
    )
    SELECT g AS o_orderpriority, max(n) AS n,
           round(CAST(quantile_cont(_v, 0.5) AS DOUBLE), 6) AS median,
           CASE WHEN max(n) >= 2 THEN
             round(CAST(max(CASE WHEN rn = lo_rk THEN _v END) AS DOUBLE), 6) END AS ci_lo,
           CASE WHEN max(n) >= 2 THEN
             round(CAST(max(CASE WHEN rn = hi_rk THEN _v END) AS DOUBLE), 6) END AS ci_hi
    FROM marked GROUP BY g
"""


@register("quantiles_median_ci", _MEDIAN_CI_SQL)
def quantiles_median_ci(spark, sf_dir):
    """Order-statistic median CI (X201): "median = X ± what?" with no
    distributional assumption — binomial rank bounds z·sqrt(n)/2 either
    side of n/2, emitted as EXACT order statistics (values that occur
    in the data). One sort-within-group window, same cost as any exact
    per-group percentile; bounded everything after
    (operators/stats.py::median_ci)."""
    from zparse_spark.operators.stats import median_ci

    return median_ci(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# Capture-recapture coverage estimate (X202) + hash-bootstrap SE (X203)
# ---------------------------------------------------------------------------


def _capture_oracle_sql() -> str:
    from zparse_spark.queries_lsh import _hv_sql

    h1 = _hv_sql("CAST(doc_id AS VARCHAR) || ':101'")
    h2 = _hv_sql("CAST(doc_id AS VARCHAR) || ':202'")
    return f"""
    WITH flags AS (
      SELECT doc_id,
             {h1} / 4294967296.0 < 0.4 AS in_a,
             {h2} / 4294967296.0 < 0.4 AS in_b
      FROM documents
    ),
    c AS (
      SELECT count(*) AS n_true,
             count(CASE WHEN in_a THEN 1 END) AS n1,
             count(CASE WHEN in_b THEN 1 END) AS n2,
             count(CASE WHEN in_a AND in_b THEN 1 END) AS m
      FROM flags
    )
    SELECT n_true, n1, n2, m,
           round(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 6)
             AS chapman_estimate,
           round((CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1 - n_true)
                 / n_true, 6) AS rel_error
    FROM c
    """


@register("corpus_capture_recapture", _capture_oracle_sql())
def corpus_capture_recapture(spark, sf_dir):
    """Capture-recapture corpus-coverage estimate (X202): two
    independent deterministic hash-"crawls" (40% each, disjoint seeds)
    and their exact-id overlap give the Chapman estimator
    N = (n1+1)(n2+1)/(m+1) - 1 of the TOTAL population — the answer to
    "how much of the web did our two crawls actually see?" that no
    single-crawl count can give; here the truth is known, so rel_error
    is emitted as the estimator's own calibration. One scan, two hash
    flags, a 1-row aggregate, one trailing division."""
    from zparse_spark.operators.filtering import hash_unit

    d = _t(spark, sf_dir, "documents").select(
        hash_unit("doc_id", 101).alias("u1"), hash_unit("doc_id", 202).alias("u2")
    )
    flags = d.select(
        (F.col("u1") < 0.4).alias("in_a"), (F.col("u2") < 0.4).alias("in_b")
    )
    c = flags.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.count(F.when(F.col("in_a"), 1)).alias("n1"),
        F.count(F.when(F.col("in_b"), 1)).alias("n2"),
        F.count(F.when(F.col("in_a") & F.col("in_b"), 1)).alias("m"),
    )
    est = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1) - 1
    return c.select(
        "n_true",
        "n1",
        "n2",
        "m",
        F.round(est, 6).alias("chapman_estimate"),
        F.round((est - F.col("n_true")) / F.col("n_true"), 6).alias("rel_error"),
    )


def _bootstrap_oracle_sql(n_reps: int = 8) -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql("CAST(doc_id AS VARCHAR) || ':b' || CAST(rep AS VARCHAR)")
    return f"""
    WITH seeded AS (
      SELECT d.n_chars, r.rep, {hv} / 4294967296.0 AS u
      FROM documents d, range({n_reps}) r(rep)
    ),
    w AS (
      SELECT rep, n_chars,
             CASE WHEN u < 0.367879441 THEN 0
                  WHEN u < 0.735758882 THEN 1
                  WHEN u < 0.919698603 THEN 2
                  WHEN u < 0.981011843 THEN 3
                  WHEN u < 0.996340153 THEN 4
                  ELSE 5 END AS wt
      FROM seeded
    ),
    reps AS (
      SELECT rep, sum(wt) AS n_eff, sum(CAST(wt AS BIGINT) * n_chars) AS s
      FROM w GROUP BY rep
    ),
    means AS (
      SELECT rep, round(CAST(s AS DOUBLE) / n_eff, 6) AS mean_rep FROM reps
    ),
    moments AS (
      SELECT count(*) AS k, sum(mean_rep) AS sm, sum(mean_rep * mean_rep) AS sm2
      FROM means
    ),
    base AS (
      SELECT count(*) AS n, sum(n_chars) AS t,
             sum(CAST(n_chars AS BIGINT) * n_chars) AS t2
      FROM documents
    )
    SELECT base.n,
           round(CAST(base.t AS DOUBLE) / base.n, 6) AS mean,
           round(sqrt((moments.sm2 - moments.sm * moments.sm / moments.k)
                      / (moments.k - 1)), 6) AS bootstrap_se,
           round(sqrt((CAST(base.t2 AS DOUBLE)
                       - CAST(base.t AS DOUBLE) * base.t / base.n)
                      / (base.n - 1) / base.n), 6) AS analytic_se
    FROM base, moments
    """


@register("stats_bootstrap_se", _bootstrap_oracle_sql())
def stats_bootstrap_se(spark, sf_dir):
    """Deterministic Poisson-bootstrap standard error (X203): 8
    resampling replicates of the corpus-mean doc length in ONE scan —
    each row's weight per replicate is a Poisson(1) draw taken from the
    INVERSE CDF of a hash-uniform (a 6-step CASE ladder, identical text
    in both engines; truncated at 5, mass 6e-4), so the whole bootstrap
    is a pure function of the keys: re-runs, resumes and other engines
    produce the identical SE. Emitted beside the analytic SE
    (sd/sqrt(n)) as its own calibration — for the mean they must agree
    to within bootstrap noise; the bootstrap's value is every statistic
    for which NO analytic formula exists (the engine's medians, Ginis,
    drift scores), and this query certifies the machinery. Replicate
    sums are exact integers; per-replicate means rounded pre-variance
    (the portable-float contract)."""
    n_reps = 8
    d = _t(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.array(*[F.lit(r) for r in range(n_reps)])).alias("rep"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":b"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / float(0x100000000)
    )
    wt = (
        F.when(u < 0.367879441, 0)
        .when(u < 0.735758882, 1)
        .when(u < 0.919698603, 2)
        .when(u < 0.981011843, 3)
        .when(u < 0.996340153, 4)
        .otherwise(5)
    )
    w = seeded.select("rep", "n_chars", wt.alias("wt"))
    reps = w.groupBy("rep").agg(
        F.sum("wt").alias("n_eff"),
        F.sum(F.col("wt").cast("bigint") * F.col("n_chars")).alias("s"),
    )
    means = reps.select(
        F.round(F.col("s").cast("double") / F.col("n_eff"), 6).alias("mean_rep")
    )
    moments = means.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("mean_rep").alias("sm"),
        F.sum(F.col("mean_rep") * F.col("mean_rep")).alias("sm2"),
    )
    base = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("t"),
        F.sum(F.col("n_chars").cast("bigint") * F.col("n_chars")).alias("t2"),
    )
    return base.crossJoin(F.broadcast(moments)).select(
        "n",
        F.round(F.col("t").cast("double") / F.col("n"), 6).alias("mean"),
        F.round(
            F.sqrt(
                (F.col("sm2") - F.col("sm") * F.col("sm") / F.col("k"))
                / (F.col("k") - 1)
            ),
            6,
        ).alias("bootstrap_se"),
        F.round(
            F.sqrt(
                (
                    F.col("t2").cast("double")
                    - F.col("t").cast("double") * F.col("t") / F.col("n")
                )
                / (F.col("n") - 1)
                / F.col("n")
            ),
            6,
        ).alias("analytic_se"),
    )


# ---------------------------------------------------------------------------
# Changepoint estimation (X206)
# ---------------------------------------------------------------------------


_CHANGEPOINT_SQL = """
    WITH inp AS (
      SELECT event_type AS g, ts FROM events
      UNION ALL
      SELECT 'surge', ts FROM events
      WHERE event_type = 'view'
      UNION ALL
      SELECT 'surge', ts FROM events
      WHERE event_type = 'view' AND CAST(ts AS DATE) >= DATE '2024-01-16'
    ),
    daily AS (
      SELECT g, CAST(ts AS DATE) AS day, count(*) AS n
      FROM inp GROUP BY g, CAST(ts AS DATE)
    ),
    pre AS (
      SELECT g, day, n,
             sum(n) OVER (PARTITION BY g ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl,
             row_number() OVER (PARTITION BY g ORDER BY day) AS i,
             sum(n) OVER (PARTITION BY g) AS tot,
             count(*) OVER (PARTITION BY g) AS m
      FROM daily
    ),
    cand AS (
      SELECT g, day,
             round(CAST(cl * cl AS DOUBLE) / i
                   + CAST((tot - cl) * (tot - cl) AS DOUBLE) / (m - i)
                   - CAST(tot * tot AS DOUBLE) / m, 6) AS gain
      FROM pre WHERE i < m AND m >= 3
    ),
    best AS (
      SELECT g, day, gain,
             row_number() OVER (PARTITION BY g ORDER BY gain DESC, day ASC) AS rk
      FROM cand
    )
    SELECT g AS event_type, day AS change_day, gain AS sse_reduction
    FROM best WHERE rk = 1
"""


@register("trend_changepoint_events", _CHANGEPOINT_SQL)
def trend_changepoint_events(spark, sf_dir):
    """Single-changepoint estimate per event type (X206): CUSUM/EWMA
    say WHETHER the level shifted; this names WHEN — the binary-
    segmentation argmax of the between-segment SSE reduction, all exact
    BIGINT prefix arithmetic on the bounded daily table, 6dp-rounded
    before the argmax (ties → earliest day, deterministic). Planted
    'surge' type doubles its volume from Jan 16 and must localize the
    split at the regime edge (operators/stats.py::changepoint_day)."""
    from zparse_spark.operators.stats import changepoint_day

    ev = _t(spark, sf_dir, "events")
    inp = ev.select(F.col("event_type").alias("g"), "ts").unionByName(
        ev.filter(F.col("event_type") == "view").select(
            F.lit("surge").alias("g"), "ts"
        )
    ).unionByName(
        ev.filter(
            (F.col("event_type") == "view")
            & (F.to_date("ts") >= F.lit("2024-01-16").cast("date"))
        ).select(F.lit("surge").alias("g"), "ts")
    )
    return changepoint_day(inp, "ts", "g").select(
        F.col("g").alias("event_type"), "change_day", "sse_reduction"
    )


# ---------------------------------------------------------------------------
# Embedding kNN label-noise audit (X208)
# ---------------------------------------------------------------------------


_LABEL_NOISE_SQL = """
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            (x, i) -> x + CASE WHEN i - 1 = label THEN 3.0 ELSE 0.0 END) AS v,
             CASE WHEN vec_id % 25 = 0 THEN (label + 1) % 10 ELSE label END AS label
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, a.label, b.vec_id AS nb, b.label AS nb_label,
             list_cosine_similarity(a.v, b.v) AS cos
      FROM base a, base b WHERE a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT vec_id, label, nb_label,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nb ASC) AS rk
      FROM scored
    )
    SELECT vec_id, label,
           count(CASE WHEN nb_label = label THEN 1 END) AS n_agree,
           round(CAST(count(CASE WHEN nb_label = label THEN 1 END) AS DOUBLE) / 5, 6)
             AS agreement,
           count(CASE WHEN nb_label = label THEN 1 END) <= 1 AS suspect
    FROM ranked WHERE rk <= 5
    GROUP BY vec_id, label
"""


@register("embedding_label_noise", _LABEL_NOISE_SQL)
def embedding_label_noise(spark, sf_dir):
    """kNN label-noise audit (X208): each point's share of its 5
    nearest neighbors agreeing with its OWN label — the standard
    mislabeled-example detector for classifier training data (a point
    whose neighborhood outvotes its label is a labeling error or an
    ambiguous example; both belong in review before training). The
    fixture's embeddings are near-random, so class structure is
    PLANTED deterministically (dim[label] boosted — note DuckDB's
    lambda index is 1-based vs Spark's 0-based, aligned explicitly)
    and every 25th label is flipped: flipped points must surface as
    suspects. Brute-force neighbors here (bounded fixture); at scale
    the same audit runs over the IVF/LSH candidate lists (X4/X13) —
    agreement needs candidates, not exact ranks."""
    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x
            + F.when(i == F.col("label"), F.lit(3.0)).otherwise(F.lit(0.0)),
        ).alias("v"),
        F.when(F.col("vec_id") % 25 == 0, (F.col("label") + 1) % 10)
        .otherwise(F.col("label"))
        .alias("label"),
    )
    a = base.select(
        F.col("vec_id"), F.col("label"), F.col("v").alias("va")
    )
    b = base.select(
        F.col("vec_id").alias("nb"), F.col("label").alias("nb_label"),
        F.col("v").alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(
            F.zip_with("va", "va", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x
        )
    )
    nb_ = F.sqrt(
        F.aggregate(
            F.zip_with("vb", "vb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x
        )
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("nb"))
        .select("vec_id", "label", "nb", "nb_label", (dot / (na * nb_)).alias("cos"))
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("nb").asc())
    top = scored.withColumn("_rk", F.row_number().over(wr)).filter(F.col("_rk") <= 5)
    agree = F.count(F.when(F.col("nb_label") == F.col("label"), 1))
    return top.groupBy("vec_id", "label").agg(
        agree.alias("n_agree"),
        F.round(agree.cast("double") / 5, 6).alias("agreement"),
        (agree <= 1).alias("suspect"),
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator (X209)
# ---------------------------------------------------------------------------


_HILL_SQL = """
    WITH act AS (
      SELECT user_id, count(*) AS n FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    topk AS (
      SELECT CAST(n AS DOUBLE) AS x,
             row_number() OVER (ORDER BY n DESC, user_id ASC) AS rk
      FROM act
    ),
    kth AS (SELECT x AS xk FROM topk WHERE rk = 101),
    hill AS (
      SELECT count(*) AS k,
             sum(CAST(round(ln(t.x / kth.xk) * 1000000000) AS BIGINT)) AS s_nano
      FROM topk t, kth WHERE t.rk <= 100
    )
    SELECT hill.k,
           round(CAST(s_nano AS DOUBLE) / 1000000000 / hill.k, 6) AS hill_mean_log_excess,
           CASE WHEN s_nano > 0 THEN
             round(hill.k / (CAST(s_nano AS DOUBLE) / 1000000000), 6) END AS tail_index_alpha
    FROM hill
"""


@register("stats_hill_tail_index", _HILL_SQL)
def stats_hill_tail_index(spark, sf_dir):
    """Hill tail-index estimator (X209) over per-user activity counts:
    alpha = k / Σ ln(x_(i)/x_(k+1)) on the top-k order statistics — the
    quantitative answer to "how heavy is this key's tail?" that every
    partitioning decision in this engine consumes qualitatively
    (skew_profile names the hottest key; Hill says whether the WHOLE
    tail is power-law, i.e. whether salting one key is enough or the
    distribution itself fights equal-width partitioning; alpha <= 2 ~
    infinite variance). Top-(k+1) is a TakeOrdered, the estimator is
    one bounded agg; ties contribute equal log terms so tie order
    cannot move the sum."""
    act = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    # TakeOrdered(101) first, then rank the bounded result — the
    # partitionless window alone ranked the whole user domain through
    # one Exchange SinglePartition (r5 verdict item 2). Identical rows.
    top101 = act.orderBy(F.col("n").desc(), F.col("user_id").asc()).limit(101)
    wr = Window.orderBy(F.col("n").desc(), F.col("user_id").asc())
    topk = top101.select(
        F.col("n").cast("double").alias("x"), F.row_number().over(wr).alias("rk")
    ).filter(F.col("rk") <= 101)
    kth = topk.filter(F.col("rk") == 101).select(F.col("x").alias("xk"))
    hill = (
        topk.filter(F.col("rk") <= 100)
        .crossJoin(F.broadcast(kth))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(
                F.round(F.log(F.col("x") / F.col("xk")) * 1000000000).cast("bigint")
            ).alias("s_nano"),
        )
    )
    # log terms quantized to integer nano-units PRE-SUM (X150
    # discipline): a 100-term float sum is partition-order-dependent in
    # the last ulp, and a 6dp round at a boundary would flip cross-engine
    s = F.col("s_nano").cast("double") / 1000000000
    return hill.select(
        "k",
        F.round(s / F.col("k"), 6).alias("hill_mean_log_excess"),
        F.when(F.col("s_nano") > 0, F.round(F.col("k") / s, 6)).alias(
            "tail_index_alpha"
        ),
    )


# ---------------------------------------------------------------------------
# Markov transition drift (X210)
# ---------------------------------------------------------------------------


_MARKOV_DRIFT_SQL = """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type,
             CAST(ts AS DATE) < DATE '2024-01-16' AS early
      FROM events WHERE user_id IS NOT NULL
    ),
    tr AS (
      SELECT event_type AS from_type, next_type AS to_type, early
      FROM seq WHERE next_type IS NOT NULL
    ),
    counts AS (
      SELECT from_type, to_type,
             count(CASE WHEN early THEN 1 END) AS ce,
             count(CASE WHEN NOT early THEN 1 END) AS cl
      FROM tr GROUP BY from_type, to_type
    ),
    tot AS (
      SELECT from_type, sum(ce) AS te, sum(cl) AS tl
      FROM counts GROUP BY from_type
    ),
    terms AS (
      SELECT c.from_type, t.te, t.tl,
             CAST(round(
               ((CASE WHEN t.te > 0 THEN CAST(c.ce AS DOUBLE) / t.te ELSE 0 END + 0.0001)
                - (CASE WHEN t.tl > 0 THEN CAST(c.cl AS DOUBLE) / t.tl ELSE 0 END + 0.0001))
               * ln(((CASE WHEN t.te > 0 THEN CAST(c.ce AS DOUBLE) / t.te ELSE 0 END + 0.0001))
                    / ((CASE WHEN t.tl > 0 THEN CAST(c.cl AS DOUBLE) / t.tl ELSE 0 END + 0.0001)))
               * 1000000000) AS BIGINT) AS nano
      FROM counts c JOIN tot t ON t.from_type = c.from_type
    )
    SELECT from_type, max(te) AS n_early, max(tl) AS n_late,
           round(CAST(sum(nano) AS DOUBLE) / 1000000000, 6) AS psi
    FROM terms GROUP BY from_type
"""


@register("drift_markov_transitions", _MARKOV_DRIFT_SQL)
def drift_markov_transitions(spark, sf_dir):
    """Markov transition drift (X210): per from-state PSI between the
    early and late halves' NEXT-event distributions — behavior-change
    detection at the sequence level (volume drift says "more clicks";
    this says "clicks now lead somewhere else", which volume and
    per-type mixes both miss). Transitions from one lead() window per
    user (ordered ts, event_id tie-break); the drift arithmetic is
    D1's eps-floored PSI with nano-unit pre-sum quantization (X194
    discipline). One window pass + two bounded groupBys — transition
    variety is |types|², never row-scale."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        (F.to_date("ts") < F.lit("2024-01-16").cast("date")).alias("early"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.when(F.col("early"), 1)).alias("ce"),
        F.count(F.when(~F.col("early"), 1)).alias("cl"),
    )
    tot = counts.groupBy("from_type").agg(
        F.sum("ce").alias("te"), F.sum("cl").alias("tl")
    )
    j = counts.join(F.broadcast(tot), "from_type")
    eps = 0.0001
    pe = (
        F.when(F.col("te") > 0, F.col("ce").cast("double") / F.col("te")).otherwise(
            F.lit(0.0)
        )
        + eps
    )
    pl = (
        F.when(F.col("tl") > 0, F.col("cl").cast("double") / F.col("tl")).otherwise(
            F.lit(0.0)
        )
        + eps
    )
    nano = F.round((pe - pl) * F.log(pe / pl) * 1000000000).cast("bigint")
    return (
        j.select("from_type", "te", "tl", nano.alias("nano"))
        .groupBy("from_type")
        .agg(
            F.max("te").alias("n_early"),
            F.max("tl").alias("n_late"),
            F.round(F.sum("nano").cast("double") / 1000000000, 6).alias("psi"),
        )
    )


# ---------------------------------------------------------------------------
# Lorenz concentration curve (X212)
# ---------------------------------------------------------------------------


_LORENZ_SQL = """
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey,
             CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS cents
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT seg, cents,
             row_number() OVER (PARTITION BY seg ORDER BY cents ASC, c_custkey ASC) AS i,
             count(*) OVER (PARTITION BY seg) AS n,
             sum(cents) OVER (PARTITION BY seg) AS tot,
             sum(cents) OVER (PARTITION BY seg ORDER BY cents ASC, c_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    ),
    decile AS (
      SELECT seg, CAST(ceil(i * 10.0 / n) AS INT) AS decile,
             max(i) AS i_hi, max(n) AS n, max(cum) AS cum_hi, max(tot) AS tot
      FROM ranked GROUP BY seg, CAST(ceil(i * 10.0 / n) AS INT)
    )
    SELECT seg AS c_mktsegment, decile,
           round(CAST(i_hi AS DOUBLE) / n, 6) AS pop_share,
           round(CAST(cum_hi AS DOUBLE) / tot, 6) AS value_share
    FROM decile
"""


@register("profile_lorenz_customer_revenue", _LORENZ_SQL)
def profile_lorenz_customer_revenue(spark, sf_dir):
    """Lorenz concentration curve (X212): per segment, the cumulative
    revenue share held by the bottom d/10 of customers — the CURVE
    behind the X180 Gini number, i.e. the literal "the top 10% of
    customers carry 1−value_share(9) of revenue" statement a single
    coefficient compresses away. Exact cents, the same
    sort-within-group window Gini pays, reduced to 10 points per group
    by a bounded decile rollup (max of cum at each decile's upper
    rank)."""
    from pyspark.sql import Window

    rev = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("cents"))
    )
    wr = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").asc(), F.col("c_custkey").asc()
    )
    wall = Window.partitionBy("c_mktsegment")
    ranked = rev.select(
        F.col("c_mktsegment").alias("seg"),
        "cents",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cents").over(wall).alias("tot"),
        F.sum("cents")
        .over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    dec = (
        ranked.groupBy(
            "seg", F.ceil(F.col("i") * 10.0 / F.col("n")).cast("int").alias("decile")
        )
        .agg(
            F.max("i").alias("i_hi"),
            F.max("n").alias("n"),
            F.max("cum").alias("cum_hi"),
            F.max("tot").alias("tot"),
        )
    )
    return dec.select(
        F.col("seg").alias("c_mktsegment"),
        "decile",
        F.round(F.col("i_hi").cast("double") / F.col("n"), 6).alias("pop_share"),
        F.round(F.col("cum_hi").cast("double") / F.col("tot"), 6).alias("value_share"),
    )


# ---------------------------------------------------------------------------
# Tail-vs-median trend (X213)
# ---------------------------------------------------------------------------


_TAIL_TREND_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
             round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 6) AS p90
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    idx AS (
      SELECT event_type, day, p50, p90,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM daily
    ),
    pairs AS (
      SELECT a.event_type,
             round((b.p50 - a.p50) / (b.i - a.i), 6) AS s50,
             round((b.p90 - a.p90) / (b.i - a.i), 6) AS s90
      FROM idx a JOIN idx b ON b.event_type = a.event_type AND b.i > a.i
    )
    SELECT event_type,
           round(CAST(quantile_cont(s50, 0.5) AS DOUBLE), 6) AS slope_p50,
           round(CAST(quantile_cont(s90, 0.5) AS DOUBLE), 6) AS slope_p90
    FROM pairs GROUP BY event_type
"""


@register("trend_tail_vs_median", _TAIL_TREND_SQL)
def trend_tail_vs_median(spark, sf_dir):
    """Tail-vs-median trend (X213): Theil–Sen slopes of the DAILY p50
    and p90 of event value, per type — the monitoring question a mean
    trend can't answer: "is the TAIL growing faster than the typical
    value?" (a p90 slope outrunning p50 means the distribution is
    stretching — fraud spikes, runaway payloads — while the median
    says all-clear). Exact interpolated percentiles per day (one
    groupBy over the scan), then the X166 pairwise-median machinery on
    the BOUNDED day grid — per-day quantiles rounded 6dp before
    pairing so both engines difference identical numbers."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )
    wi = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type", "p50", "p90", F.row_number().over(wi).alias("i")
    )
    a = idx.select(
        "event_type",
        F.col("i").alias("ia"),
        F.col("p50").alias("pa50"),
        F.col("p90").alias("pa90"),
    )
    b = idx.select(
        "event_type",
        F.col("i").alias("ib"),
        F.col("p50").alias("pb50"),
        F.col("p90").alias("pb90"),
    )
    pairs = a.join(b, "event_type").filter(F.col("ib") > F.col("ia")).select(
        "event_type",
        F.round((F.col("pb50") - F.col("pa50")) / (F.col("ib") - F.col("ia")), 6).alias("s50"),
        F.round((F.col("pb90") - F.col("pa90")) / (F.col("ib") - F.col("ia")), 6).alias("s90"),
    )
    return pairs.groupBy("event_type").agg(
        F.round(F.expr("percentile(s50, 0.5)"), 6).alias("slope_p50"),
        F.round(F.expr("percentile(s90, 0.5)"), 6).alias("slope_p90"),
    )


# ---------------------------------------------------------------------------
# Cross-source containment matrix (X215)
# ---------------------------------------------------------------------------


_SOURCE_CONTAIN_SQL = r"""
    WITH d AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
             lower(trim(regexp_replace(coalesce(text,''), '\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CASE WHEN length(t) >= 8
                  THEN list_transform(range(1, length(t) - 8 + 2),
                                      i -> md5(substring(t, CAST(i AS INT), 8)))
                  ELSE [md5(t)] END AS hs
      FROM d
    ),
    f AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(hs) >= 4
                    THEN list_transform(range(1, len(hs) - 4 + 2),
                                        j -> list_min(list_slice(hs, CAST(j AS INT), CAST(j + 3 AS INT))))
                    ELSE [list_min(hs)] END) AS fps
      FROM h
    ),
    post AS (SELECT doc_id, unnest(fps) AS fp FROM f),
    sz AS (SELECT doc_id, len(fps) AS n_fp FROM f),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fp
      FROM post a JOIN post b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    directed AS (
      SELECT CASE WHEN CAST(s.shared_fp AS DOUBLE) / za.n_fp
                       >= CAST(s.shared_fp AS DOUBLE) / zb.n_fp
                  THEN s.id_a ELSE s.id_b END AS contained_id,
             CASE WHEN CAST(s.shared_fp AS DOUBLE) / za.n_fp
                       >= CAST(s.shared_fp AS DOUBLE) / zb.n_fp
                  THEN s.id_b ELSE s.id_a END AS container_id,
             greatest(round(CAST(s.shared_fp AS DOUBLE) / za.n_fp, 6),
                      round(CAST(s.shared_fp AS DOUBLE) / zb.n_fp, 6)) AS containment
      FROM shared s
      JOIN sz za ON za.doc_id = s.id_a
      JOIN sz zb ON zb.doc_id = s.id_b
    )
    SELECT dc.source AS contained_source, db.source AS container_source,
           count(*) AS n_pairs,
           round(avg(containment), 6) AS avg_containment
    FROM directed x
    JOIN d dc ON dc.doc_id = x.contained_id
    JOIN d db ON db.doc_id = x.container_id
    WHERE containment >= 0.6
    GROUP BY dc.source, db.source
"""


@register("dedup_source_containment_matrix", _SOURCE_CONTAIN_SQL)
def dedup_source_containment_matrix(spark, sf_dir):
    """Cross-source containment matrix (X215): directional
    quote-inclusion aggregated by source pair — WHO COPIES FROM WHOM,
    the provenance question behind scraper-vs-origin disputes and the
    keep-rule's source priority ("prefer the container's source" is
    wrong when the container is the aggregator). The containment
    DIRECTION (X185) picks contained = the side with the higher share
    of its fingerprints covered; pairs >= 0.6 roll up to (contained
    source, container source) with counts and mean containment. Same
    winnowing pipeline shape as X151/X185 — the matrix is one extra
    bounded groupBy."""
    from zparse_spark.operators.dedup import winnowing_containment

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source"
    )
    pairs = winnowing_containment(
        d.select("doc_id", "text"), k=8, w=4, threshold=0.0
    ).filter(
        F.greatest("containment_a_in_b", "containment_b_in_a") >= 0.6
    )
    a_contained = F.col("containment_a_in_b") >= F.col("containment_b_in_a")
    directed = pairs.select(
        F.when(a_contained, F.col("id_a")).otherwise(F.col("id_b")).alias(
            "contained_id"
        ),
        F.when(a_contained, F.col("id_b")).otherwise(F.col("id_a")).alias(
            "container_id"
        ),
        F.greatest("containment_a_in_b", "containment_b_in_a").alias("containment"),
    )
    src = d.select("doc_id", "source")
    j = (
        directed.join(
            src.select(
                F.col("doc_id").alias("contained_id"),
                F.col("source").alias("contained_source"),
            ),
            "contained_id",
        )
        .join(
            src.select(
                F.col("doc_id").alias("container_id"),
                F.col("source").alias("container_source"),
            ),
            "container_id",
        )
    )
    return j.groupBy("contained_source", "container_source").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("containment"), 6).alias("avg_containment"),
    )


# ---------------------------------------------------------------------------
# Hour-of-day p95 heatmap (X217) + dedup review sampler (X218)
# ---------------------------------------------------------------------------


_HOURLY_P95_SQL = """
    SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day,
           count(*) AS n,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50_value,
           round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 6) AS p95_value
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, CAST(hour(ts) AS INT)
"""


@register("events_hourly_p95_value", _HOURLY_P95_SQL)
def events_hourly_p95_value(spark, sf_dir):
    """Hour-of-day × type p50/p95 heatmap (X217): the canonical ops
    latency/value artifact — a daily mean hides the 3am batch window
    that doubles p95 while p50 sleeps; the (24 × types) grid shows it.
    One groupBy over the scan with exact interpolated percentiles;
    the grid is bounded, the sort cost is percentile's own."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95_value"),
    )


def _review_sample_oracle_sql() -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql("CAST(id_a AS VARCHAR) || '|' || CAST(id_b AS VARCHAR) || ':7'")
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) - 2, 1)),
               i -> substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), i, 3)
             )) AS sh
      FROM documents WHERE doc_id < 200
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    banded AS (
      SELECT id_a, id_b, jaccard,
             CAST(floor(jaccard * 20) AS INT) AS band,
             row_number() OVER (
               PARTITION BY CAST(floor(jaccard * 20) AS INT)
               ORDER BY {hv} ASC, id_a ASC, id_b ASC) AS rk
      FROM pairs WHERE jaccard >= 0.3
    )
    SELECT band, id_a, id_b, jaccard, rk
    FROM banded WHERE rk <= 3
    """


@register("dedup_review_sample", _review_sample_oracle_sql())
def dedup_review_sample(spark, sf_dir):
    """Deterministic dedup review sampler (X218): up to 3 pairs per
    0.05-Jaccard band, selected by md5 hash order — the human-QA
    labeling budget allocated EVENLY across the similarity range
    instead of wherever volume piles up (band-stratified labels are
    what calibrates the X187 threshold sweep into precision/recall).
    Hash-ordered selection is a pure function of the pair keys: the
    reviewed set is stable across runs, resumes and engines. One
    rank window per band on the bounded scored-pair table."""
    from pyspark.sql import Window

    from zparse_spark.operators.dedup import ngram_jaccard_pairs
    from zparse_spark.operators.filtering import hash_unit

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    ids = d.select(F.col("doc_id").alias("id_a"))
    ids_b = d.select(F.col("doc_id").alias("id_b"))
    cands = ids.crossJoin(ids_b).filter(F.col("id_a") < F.col("id_b"))
    pairs = ngram_jaccard_pairs(d, cands, k_shingle=3, mode="char", threshold=0.3)
    band = F.floor(F.col("jaccard") * 20).cast("int")
    u = hash_unit(
        F.concat(
            F.col("id_a").cast("string"), F.lit("|"), F.col("id_b").cast("string")
        ),
        7,
    )
    w = Window.partitionBy(band).orderBy(
        u.asc(), F.col("id_a").asc(), F.col("id_b").asc()
    )
    return (
        pairs.select(
            band.alias("band"), "id_a", "id_b", "jaccard",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# Grouped expectation suite (X219)
# ---------------------------------------------------------------------------


_GROUPED_SUITE_SQL = """
    WITH snap AS (
      SELECT source,
             CASE WHEN source = 'src7' THEN NULL ELSE lang END AS lang,
             n_chars
      FROM documents
    ),
    per AS (
      SELECT source AS g, count(*) AS n, count(lang) AS c_lang,
             sum(n_chars) AS s_chars, count(n_chars) AS c_chars
      FROM snap GROUP BY source
    ),
    g1s AS (
      SELECT g, round(CAST(n - c_lang AS DOUBLE) / greatest(n, 1), 6) AS obs,
             round(CAST(n - c_lang AS DOUBLE) / greatest(n, 1), 6) > 0.1 AS bad
      FROM per
    ),
    g1r AS (
      SELECT g, obs, bad,
             row_number() OVER (ORDER BY bad DESC, obs DESC, g ASC) AS rk
      FROM g1s
    ),
    g1 AS (
      SELECT 'G1' AS rule_id, 'documents' AS "table", 'source' AS "by",
             'lang' AS "column", 'null_rate_max' AS kind,
             count(*) AS n_groups,
             count(CASE WHEN bad THEN 1 END) AS n_failing,
             max(CASE WHEN rk = 1 THEN g END) AS worst_group,
             max(CASE WHEN rk = 1 THEN obs END) AS worst_observed,
             count(CASE WHEN bad THEN 1 END) = 0 AS passed
      FROM g1r
    ),
    g2s AS (SELECT g, CAST(n AS DOUBLE) AS obs, n < 10 AS bad FROM per),
    g2r AS (
      SELECT g, obs, bad,
             row_number() OVER (ORDER BY bad DESC, obs DESC, g ASC) AS rk
      FROM g2s
    ),
    g2 AS (
      SELECT 'G2', 'documents', 'source', NULL, 'row_count_min',
             count(*), count(CASE WHEN bad THEN 1 END),
             max(CASE WHEN rk = 1 THEN g END),
             max(CASE WHEN rk = 1 THEN obs END),
             count(CASE WHEN bad THEN 1 END) = 0
      FROM g2r
    ),
    g3s AS (
      SELECT g, round(CAST(s_chars AS DOUBLE) / greatest(c_chars, 1), 6) AS obs,
             round(CAST(s_chars AS DOUBLE) / greatest(c_chars, 1), 6) < 100
               OR round(CAST(s_chars AS DOUBLE) / greatest(c_chars, 1), 6) > 600 AS bad
      FROM per
    ),
    g3r AS (
      SELECT g, obs, bad,
             row_number() OVER (ORDER BY bad DESC, obs DESC, g ASC) AS rk
      FROM g3s
    ),
    g3 AS (
      SELECT 'G3', 'documents', 'source', 'n_chars', 'mean_between',
             count(*), count(CASE WHEN bad THEN 1 END),
             max(CASE WHEN rk = 1 THEN g END),
             max(CASE WHEN rk = 1 THEN obs END),
             count(CASE WHEN bad THEN 1 END) = 0
      FROM g3r
    )
    SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3
"""


@register("contract_grouped_suite", _GROUPED_SUITE_SQL)
def contract_grouped_suite(spark, sf_dir):
    """Grouped expectation suite (X219): per-GROUP bounds with
    worst-offender reporting — the release-gate difference between
    "the table is fine" (corpus null rate 5%) and "src7 is poisoned"
    (its lang nulled 100%, planted): the flat suite X193 passes the
    pooled number while this names the group. All expectations
    sharing (table, by) compile into ONE map-side-combined groupBy;
    verdicts project from the bounded per-group table
    (operators/expectations.py::grouped_expectation_suite)."""
    from zparse_spark.operators.expectations import grouped_expectation_suite

    snap = _t(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("source") == "src7", F.lit(None).cast("string"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "n_chars",
    )
    spec = [
        {"rule_id": "G1", "table": "documents", "by": "source",
         "kind": "null_rate_max", "column": "lang", "max_rate": 0.1},
        {"rule_id": "G2", "table": "documents", "by": "source",
         "kind": "row_count_min", "min_rows": 10},
        {"rule_id": "G3", "table": "documents", "by": "source",
         "kind": "mean_between", "column": "n_chars", "lo": 100.0, "hi": 600.0},
    ]
    return grouped_expectation_suite({"documents": snap}, spec)


# ---------------------------------------------------------------------------
# Content-addressed corpus version id (X220) + chunk-level split leakage (X221)
# ---------------------------------------------------------------------------


_VERSION_ID_SQL = """
    WITH row_h AS (
      SELECT md5(CAST(doc_id AS VARCHAR) || '|' || coalesce(text, '<NULL>')
                 || '|' || coalesce(lang, '<NULL>')
                 || '|' || coalesce(source, '<NULL>')) AS h
      FROM documents
    ),
    buckets AS (
      SELECT CAST(ascii(substr(h, 1, 1)) AS INT) * 16
             + CASE WHEN ascii(substr(h, 2, 1)) >= 97
                    THEN ascii(substr(h, 2, 1)) - 87
                    ELSE ascii(substr(h, 2, 1)) - 48 END AS b,
             md5(string_agg(h, '' ORDER BY h)) AS bh,
             count(*) AS n
      FROM row_h GROUP BY 1
    )
    SELECT count(*) AS n_buckets, sum(n) AS n_docs,
           md5(string_agg(bh, '' ORDER BY b)) AS version_id
    FROM buckets
"""


@register("corpus_version_id", _VERSION_ID_SQL)
def corpus_version_id(spark, sf_dir):
    """Content-addressed corpus version id (X220): ONE hex string that
    names the exact corpus contents, order- and partitioning-
    independent — the dataset-card field that turns "trained on the
    August crawl" into a verifiable claim ("trained on corpus
    a3f9..."). Two-level Merkle fold: per-row md5 over the canonical
    field serialization, rows grouped into 256+ hash-prefix buckets
    whose sorted-concat digests fold (sorted by bucket) into the root —
    the only sort is within buckets of ~n/256 hashes and over the
    bounded bucket table (the X146 checksum shape, reduced to one
    root). Any single changed/added/dropped row changes the id."""
    row_h = _t(spark, sf_dir, "documents").select(
        F.md5(
            F.concat_ws(
                "|",
                F.col("doc_id").cast("string"),
                F.coalesce(F.col("text"), F.lit("<NULL>")),
                F.coalesce(F.col("lang"), F.lit("<NULL>")),
                F.coalesce(F.col("source"), F.lit("<NULL>")),
            )
        ).alias("h")
    )
    nib = lambda i: F.when(
        F.ascii(F.substring("h", i, 1)) >= 97, F.ascii(F.substring("h", i, 1)) - 87
    ).otherwise(F.ascii(F.substring("h", i, 1)) - 48)
    bucket = (F.ascii(F.substring("h", 1, 1)) * 16 + nib(2)).cast("int")
    buckets = (
        row_h.groupBy(bucket.alias("b"))
        .agg(
            F.md5(F.concat_ws("", F.array_sort(F.collect_list("h")))).alias("bh"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    root = buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").alias("n_docs"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("b"), F.col("bh")))
                    ),
                    lambda s: s["bh"],
                ),
            )
        ).alias("version_id"),
    )
    return root


_CHUNK_LEAK_SQL = r"""
    WITH inp AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents
    ),
    su AS (
      SELECT doc_id, text,
             ({HV}) / 4294967296.0 AS uv
      FROM inp
    ),
    sp AS (
      SELECT doc_id, text,
             CASE WHEN uv < 0.8 THEN 'train'
                  WHEN uv < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM su
    ),
    toks AS (
      SELECT doc_id, split,
             list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'),
                         x -> x <> '') AS ts
      FROM sp
    ),
    c AS (SELECT doc_id, split, ts, CAST(ceil(len(ts) / 16.0) AS INT) AS nch
          FROM toks WHERE len(ts) > 0),
    chunks AS (
      SELECT doc_id, split,
             unnest(list_transform(range(nch),
               i -> md5(array_to_string(list_slice(ts, i * 16 + 1, i * 16 + 16), ' '))))
               AS ch
      FROM c
    ),
    leak AS (
      SELECT ch, count(DISTINCT split) AS n_splits,
             count(DISTINCT doc_id) AS n_docs,
             array_to_string(list_sort(list(DISTINCT split)), ',') AS splits
      FROM chunks GROUP BY ch
      HAVING count(DISTINCT split) > 1
    )
    SELECT count(*) AS n_leaked_chunks,
           sum(n_docs) AS n_doc_slots,
           count(CASE WHEN splits LIKE '%test%' THEN 1 END) AS n_touching_test
    FROM leak
"""


def _chunk_leak_sql() -> str:
    from zparse_spark.queries_lsh import _hv_sql

    return _CHUNK_LEAK_SQL.replace(
        "{HV}", _hv_sql("CAST(doc_id AS VARCHAR) || ':0'")
    )


@register("corpus_chunk_split_leakage", _chunk_leak_sql())
def corpus_chunk_split_leakage(spark, sf_dir):
    """Chunk-level split leakage (X221): EXACT 16-token blocks shared
    across train/val/test — the contamination X153's winnowing audit
    bounds probabilistically, measured exactly at the block granularity
    a next-token loss actually leaks through (an eval doc whose chunks
    appear verbatim in train is memorization, not generalization;
    planted re-keyed duplicates land in different splits by hash and
    must surface). Chunks via the X196 HOF pipeline, chunk identity =
    md5 of the joined block, leakage = one groupBy(chunk hash)
    carrying distinct-split counts; the summary row is what a
    release gate thresholds on."""
    from zparse_spark.operators.filtering import assign_splits, chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    inp = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    sp = assign_splits(
        inp, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id", seed=0
    )
    ch = chunk_documents(sp.select("doc_id", "text"), max_tokens=16).select(
        "doc_id", F.md5("chunk_text").alias("ch")
    )
    j = ch.join(sp.select("doc_id", "split"), "doc_id")
    leak = (
        j.groupBy("ch")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
        )
        .filter(F.col("n_splits") > 1)
    )
    return leak.agg(
        F.count(F.lit(1)).alias("n_leaked_chunks"),
        F.sum("n_docs").alias("n_doc_slots"),
        F.count(F.when(F.col("splits").contains("test"), 1)).alias(
            "n_touching_test"
        ),
    )


# ---------------------------------------------------------------------------
# Quality-score agreement (Spearman) (X224) + trimmed mean (X225)
# ---------------------------------------------------------------------------


_SPEARMAN_SQL = """
    WITH s AS (
      SELECT doc_id,
             length(text) AS a,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS b
      FROM documents WHERE text IS NOT NULL
    ),
    r AS (
      SELECT row_number() OVER (ORDER BY a ASC, doc_id ASC) AS ra,
             row_number() OVER (ORDER BY b ASC, doc_id ASC) AS rb
      FROM s
    ),
    m AS (
      SELECT count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
             sum(CAST(ra AS HUGEINT) * ra) AS saa,
             sum(CAST(rb AS HUGEINT) * rb) AS sbb,
             sum(CAST(ra AS HUGEINT) * rb) AS sab
      FROM r
    )
    SELECT n,
           CASE WHEN n >= 2
                     AND CAST(n AS HUGEINT) * saa - CAST(sa AS HUGEINT) * sa > 0
                     AND CAST(n AS HUGEINT) * sbb - CAST(sb AS HUGEINT) * sb > 0
                THEN round(CAST(CAST(n AS HUGEINT) * sab
                                - CAST(sa AS HUGEINT) * sb AS DOUBLE)
                           / sqrt(CAST(CAST(n AS HUGEINT) * saa
                                       - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                                  * CAST(CAST(n AS HUGEINT) * sbb
                                         - CAST(sb AS HUGEINT) * sb AS DOUBLE)), 6)
           END AS spearman_rho
    FROM m
"""


@register("stats_score_agreement", _SPEARMAN_SQL)
def stats_score_agreement(spark, sf_dir):
    """Quality-signal agreement (X224): Spearman rank correlation
    between two per-doc signals (here char length vs token count) —
    the redundancy question every filter pipeline owner faces: two
    scores at rho ~ 1 gate the same documents and one can be dropped;
    rho near 0 means they buy independent coverage. Ranks are
    row_number under a DETERMINISTIC total order (value, doc_id) —
    documented tie semantics, identical both engines — so rho is
    Pearson on exact integer rank sums (the X183 DECIMAL discipline;
    rank² sums overflow BIGINT at ~2M rows). One sort per signal, one
    1-row moment agg."""
    from pyspark.sql import Window

    s = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.length("text").alias("a"),
            F.size(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("b"),
        )
    )
    # Distributed global ranking (r5 verdict item 2: the two
    # partitionless row_number windows ranked the ENTIRE documents
    # table through one Exchange SinglePartition each — the corpus-
    # sized single-reducer sort). token_budget_pack's bucket
    # discipline instead: the integer signal value IS the bucket, so
    # rank = (# rows in strictly smaller buckets, a prefix sum over
    # the bounded per-value count table) + row_number WITHIN the
    # value partition ordered by doc_id — equal to the global
    # row_number under (value, doc_id) by construction, with every
    # window partitioned and parallel. The only global ordering ever
    # materialized is over the per-value count frame (bounded by the
    # signal's domain — doc lengths/token counts, not docs).
    def _ranked(sdf, val, out):
        counts = sdf.groupBy(F.col(val).alias("_bv")).agg(
            F.count(F.lit(1)).alias("_n")
        )
        woff = Window.orderBy("_bv").rowsBetween(Window.unboundedPreceding, -1)
        off = counts.select(
            "_bv", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
        )
        win = Window.partitionBy(F.col(val)).orderBy(F.col("doc_id").asc())
        return (
            sdf.join(F.broadcast(off), F.col(val) == F.col("_bv"))
            .withColumn(out, (F.col("_off") + F.row_number().over(win)).cast("int"))
            .drop("_bv", "_off")
        )

    r = _ranked(_ranked(s, "a", "ra"), "b", "rb").select("ra", "rb")
    ra = F.col("ra").cast("decimal(19,0)")
    rb = F.col("rb").cast("decimal(19,0)")
    m = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(ra * ra).alias("saa"),
        F.sum(rb * rb).alias("sbb"),
        F.sum(ra * rb).alias("sab"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    va = nd * F.col("saa") - F.col("sa").cast("decimal(38,0)") * F.col("sa")
    vb = nd * F.col("sbb") - F.col("sb").cast("decimal(38,0)") * F.col("sb")
    num = nd * F.col("sab") - F.col("sa").cast("decimal(38,0)") * F.col("sb")
    rho = F.when(
        (F.col("n") >= 2) & (va > 0) & (vb > 0),
        F.round(num.cast("double") / F.sqrt(va.cast("double") * vb.cast("double")), 6),
    )
    return m.select("n", rho.alias("spearman_rho"))


_TRIMMED_SQL = """
    WITH b AS (
      SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    q AS (
      SELECT g,
             round(CAST(quantile_cont(v, 0.05) AS DOUBLE), 6) AS lo,
             round(CAST(quantile_cont(v, 0.95) AS DOUBLE), 6) AS hi
      FROM b GROUP BY g
    )
    SELECT b.g AS o_orderpriority,
           count(*) AS n_total,
           count(CASE WHEN b.v >= q.lo AND b.v <= q.hi THEN 1 END) AS n_kept,
           round(CAST(sum(CAST(round(b.v * 100) AS BIGINT)) AS DOUBLE)
                 / count(*) / 100, 6) AS mean_raw,
           round(CAST(sum(CASE WHEN b.v >= q.lo AND b.v <= q.hi
                               THEN CAST(round(b.v * 100) AS BIGINT) END) AS DOUBLE)
                 / count(CASE WHEN b.v >= q.lo AND b.v <= q.hi THEN 1 END) / 100,
                 6) AS mean_trimmed
    FROM b JOIN q ON q.g = b.g
    GROUP BY b.g
"""


@register("stats_trimmed_mean", _TRIMMED_SQL)
def stats_trimmed_mean(spark, sf_dir):
    """Per-group 5/95 trimmed mean (X225): the robust-location leg
    between the mean (outlier-hostage) and the median (throws away 98%
    of the data) — the default a metrics pipeline should quote for
    skewed value columns. Exact interpolated percentile bounds
    (rounded 6dp so the keep set is identical cross-engine), then the
    trimmed sum in exact integer cents; the raw mean is emitted beside
    it so the trim's effect is visible. Two passes: one percentile
    agg, one conditional rescan with the bounds broadcast."""
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("v"))
    )
    q = b.groupBy("g").agg(
        F.round(F.expr("percentile(v, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(v, 0.95)"), 6).alias("hi"),
    )
    j = b.join(F.broadcast(q), "g")
    kept = (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
    return j.groupBy(F.col("g").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.round(
            F.sum(F.round(F.col("v") * 100).cast("bigint")).cast("double")
            / F.count(F.lit(1))
            / 100,
            6,
        ).alias("mean_raw"),
        F.round(
            F.sum(F.when(kept, F.round(F.col("v") * 100).cast("bigint"))).cast(
                "double"
            )
            / F.count(F.when(kept, 1))
            / 100,
            6,
        ).alias("mean_trimmed"),
    )


# ---------------------------------------------------------------------------
# k-center greedy diverse seeds (X226)
# ---------------------------------------------------------------------------


def _kcenter_oracle_sql(rounds: int = 8) -> str:
    parts = [
        """inp AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
c1 AS (SELECT vec_id, v FROM inp ORDER BY vec_id ASC LIMIT 1),
d1 AS MATERIALIZED (
  SELECT i.vec_id, i.v,
         round(1 - list_cosine_similarity(i.v, c1.v), 6) AS dist
  FROM inp i, c1
)"""
    ]
    for r in range(2, rounds + 1):
        p = r - 1
        parts.append(
            f"""p{r} AS (SELECT vec_id FROM d{p} ORDER BY dist DESC, vec_id ASC LIMIT 1),
v{r} AS (SELECT i.v FROM inp i, p{r} WHERE i.vec_id = p{r}.vec_id),
d{r} AS MATERIALIZED (
  SELECT d.vec_id, d.v,
         least(d.dist, round(1 - list_cosine_similarity(d.v, v{r}.v), 6)) AS dist
  FROM d{p} d, v{r}
)"""
        )
    sel = ["SELECT 1 AS round, vec_id FROM c1"] + [
        f"SELECT {r}, vec_id FROM p{r}" for r in range(2, rounds + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
chosen AS ({' UNION ALL '.join(sel)}),
radius AS (SELECT round(max(dist), 6) AS coverage_radius FROM d{rounds})
SELECT c.round, c.vec_id, r.coverage_radius
FROM chosen c, radius r"""
    )


@register("embedding_kcenter_seeds", _kcenter_oracle_sql())
def embedding_kcenter_seeds(spark, sf_dir):
    """k-center greedy diverse seeds (X226): 8 farthest-point rounds
    over cosine distance — the maximally-spread subset an eval-set or
    annotation budget wants (random sampling oversamples dense
    regions; greedy k-center guarantees every point is within the
    reported coverage_radius of a seed, a 2-approximation of the
    optimal cover). Deterministic: distances rounded 6dp BEFORE each
    argmax, ties to min vec_id, seed = min id. Each round is one
    bounded argmax + one map rescan against ONE literal vector
    (collected driver-side — 8 rows total, the X13 codebook
    discipline); the DuckDB twin unrolls the same 8 rounds as
    MATERIALIZED CTEs (the X214 inlining discipline)."""
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).localCheckpoint(eager=True)

    def dist_to(vec: list) -> "F.Column":
        lit = F.array(*[F.lit(float(x)) for x in vec])
        dot = F.aggregate(
            F.zip_with("v", lit, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        nv = F.sqrt(
            F.aggregate(
                F.zip_with("v", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        nl = float(sum(x * x for x in vec)) ** 0.5
        return F.round(1 - dot / (nv * F.lit(nl)), 6)

    first = e.orderBy(F.col("vec_id").asc()).limit(1).collect()[0]
    chosen = [(1, first["vec_id"])]
    cur = e.select("vec_id", "v", dist_to(list(first["v"])).alias("dist"))
    cur = cur.localCheckpoint(eager=True)
    for r in range(2, 9):
        far = (
            cur.orderBy(F.col("dist").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()[0]
        )
        chosen.append((r, far["vec_id"]))
        cur = cur.select(
            "vec_id",
            "v",
            F.least(F.col("dist"), dist_to(list(far["v"]))).alias("dist"),
        ).localCheckpoint(eager=True)
    radius = cur.agg(F.round(F.max("dist"), 6).alias("coverage_radius"))
    chosen_df = spark.createDataFrame(chosen, "round int, vec_id long")
    return chosen_df.crossJoin(F.broadcast(radius))
