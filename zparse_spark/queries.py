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
    li = _t(spark, sf_dir, "lineitem")
    # broadcast the dimension side: anti-join against a small-ish key set
    # never shuffles the fact table at scale
    d_orders = li.join(
        F.broadcast(_t(spark, sf_dir, "orders").select("o_orderkey")),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).count()
    d_parts = li.join(
        F.broadcast(_t(spark, sf_dir, "part").select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_anti",
    ).count()
    d_supp = li.join(
        F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "left_anti",
    ).count()
    return spark.createDataFrame(
        [(d_orders, d_parts, d_supp)],
        "dangling_orders long, dangling_parts long, dangling_suppliers long",
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
           sum(CASE WHEN prev_value IS NOT NULL AND value < prev_value THEN 1 ELSE 0 END) AS regressions
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
    c = _t(spark, sf_dir, "customer").select("c_custkey").distinct()
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey")).distinct()
    with_orders = c.intersect(o).count()
    without = c.exceptAll(o).count()
    return spark.createDataFrame([(with_orders, without)], "with_orders long, without_orders long")


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


def all_queries():
    return dict(QUERIES)


def all_oracles():
    return dict(ORACLES)
