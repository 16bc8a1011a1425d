"""Skew-handling join utilities (SURVEY.md §4.3).

AQE's skew-join splitting handles skewed *shuffle partitions*, but a
single pathological key (one doc_id duplicated 10^8 times, one media_ref
used by half the corpus) still lands every matching row on one reducer
in a plain shuffle join. ``salted_join`` explicitly spreads the skewed
side over ``n_salts`` sub-keys and replicates the small side to match —
the classic salting scheme, as a reusable operator.

``broadcast_threshold_join`` picks broadcast vs salted-SMJ by a row
estimate — the engine's referential rule uses the same decision via its
``strategy`` flag; this utility generalizes it to any equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``.

    big rows get a random salt in [0, n_salts); small rows are replicated
    n_salts times (explode of a literal range — n_salts × |small| rows,
    fine for dimension-sized tables). The join key becomes (key, salt),
    so a hot key's rows spread over n_salts reducers instead of one.
    Output schema = normal join output (salt column dropped).
    """
    salted_big = big.withColumn("_salt", F.pmod(F.xxhash64(F.rand(seed=11)), F.lit(n_salts)))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = salted_big.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")


def broadcast_threshold_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    broadcast_max_rows: int = 1_000_000,
    n_salts: int = 16,
) -> DataFrame:
    """Broadcast when the small side is provably small; otherwise salted
    sort-merge. The probe is ``limit(threshold+1).count()`` so deciding
    against broadcast costs bounded work even when the 'small' side turns
    out to be a 10^9-row table — at 100 TB the catalog size is known from
    table metadata instead and the probe disappears entirely."""
    if small.limit(broadcast_max_rows + 1).count() <= broadcast_max_rows:
        return big.join(F.broadcast(small), key, how)
    return salted_join(big, small, key, n_salts=n_salts, how=how)


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int = 5_000_000,
) -> DataFrame:
    """Profile a join/groupBy key's distribution BEFORE shuffling on it —
    the measurement step behind every salting decision in this package
    (``salted_join``'s ``n_salts``, the engine's R1 strategy pick, AQE's
    skew thresholds). One row: total rows, distinct keys, the hottest
    key (ties → min key string, deterministic), its absolute count and
    share, Shannon entropy of the key distribution in nats (ln n_keys =
    perfectly uniform; → 0 = one key owns the table), and
    ``salt_factor`` = ceil(max_count / target_rows_per_task) — the
    ``n_salts`` that caps the hottest key's per-task rows at the target
    (1 = no salting needed).

    NULL keys count as a real (and often the hottest) key — profiled as
    the string 'NULL' rather than silently dropped, since a shuffle
    hashes them to one partition like any other value.

    Scale shape (100 TB): pass 1 is the same map-side-combined
    groupBy(key) any join would pay; everything after runs on the
    counts table (one row per DISTINCT key). Entropy needs no second
    data pass: H = ln(N) − Σ n·ln(n) / N, so Σ n·ln(n) rides the same
    single aggregate as N/n_keys/max_count; the hottest key is a
    broadcast-filtered min() on counts, never a global sort.
    """
    counts = df.groupBy(
        F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")).alias("key")
    ).agg(F.count(F.lit(1)).alias("n"))
    agg = counts.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_count"),
        F.sum(F.col("n") * F.log(F.col("n"))).alias("_s"),
    )
    hot = (
        counts.join(F.broadcast(agg.select("max_count")), counts["n"] == F.col("max_count"))
        .agg(F.min("key").alias("max_key"))
    )
    return (
        agg.crossJoin(F.broadcast(hot))
        .select(
            "n_rows",
            "n_keys",
            "max_key",
            "max_count",
            F.round(F.col("max_count") / F.col("n_rows"), 6).alias("top_share"),
            F.round(F.log(F.col("n_rows")) - F.col("_s") / F.col("n_rows"), 6).alias(
                "entropy_nats"
            ),
            F.ceil(F.col("max_count") / F.lit(float(target_rows_per_task)))
            .cast("bigint")
            .alias("salt_factor"),
        )
    )
