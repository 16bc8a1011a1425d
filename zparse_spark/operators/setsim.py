"""Exact set-similarity self-join with prefix filtering — the LOSSLESS
counterpart to MinHash LSH for threshold near-dup detection.

``minhash_lsh_candidates`` (dedup.py) is probabilistic: a true pair can
miss every band and silently vanish. When the contract is "EVERY pair
with Jaccard >= t" (legal dedup audits, eval-set decontamination
receipts), the AllPairs/PPJoin prefix-filter family gives the same
no-all-pairs shuffle shape with a completeness GUARANTEE:

  1. canonicalize each doc's shingle set in ascending global document
     frequency (rarest token first, ties by token — deterministic);
  2. a pair with J(x,y) >= t must share a token inside each side's
     first ``|x| - ceil(t*|x|) + 1`` tokens (the prefix; Chaudhuri et
     al. ICDE'06 SSJoin, Bayardo et al. WWW'07 AllPairs), so the
     candidate join only explodes PREFIXES — rare tokens by
     construction, so bucket sizes stay small where LSH banding would
     need a hot-bucket cap;
  3. the Jaccard length filter t*|x| <= |y| <= |x|/t prunes before the
     verify fetch;
  4. exact intersect/union verification on the full sets.

Reference parity: the reference's dedup contract is exact key equality
(toml/parser.rs duplicate-key REJECTION — never "probably duplicate");
this operator is that exactness lifted to near-duplicate sets.

100 TB shape: one explode of prefix tokens (a few per doc), one
equi-join on token (shuffle keyed by rare tokens — skew-resistant
because frequency ordering puts frequent tokens OUTSIDE prefixes),
verify join fetches each side's set once. No cartesian stage anywhere;
the frequency table is a groupBy the size of the vocabulary. The
epsilon slack on the FP prefix/length arithmetic only ever relaxes
pruning, never tightens it — completeness cannot be lost to a rounding
edge (and the all-pairs DuckDB oracle would catch it if it were).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zparse_spark.operators.dedup import shingle_sets

_EPS = 1e-9  # FP slack: prune strictly less, never a boundary pair


def _freq_ordered_sets(
    df: DataFrame, id_col: str, text_col: str, k_shingle: int
) -> DataFrame:
    """(_id, toks) with toks = distinct word-k-shingles sorted by
    (global document frequency asc, token asc)."""
    sets = shingle_sets(
        df.select(F.col(id_col).cast("string").alias("_id"), F.col(text_col)),
        "_id",
        text_col,
        k=k_shingle,
    )
    tok = sets.select("_id", F.explode("sh").alias("s"))
    freq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        tok.join(freq, "s")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("os"))
        .select("_id", F.transform("os", lambda x: x["s"]).alias("toks"))
    )


def _prefix_len(n: Column, threshold: float) -> Column:
    # |x| - ceil(t*|x|) + 1, with the ceil argument nudged DOWN so an
    # FP product landing epsilon above an exact integer cannot shorten
    # the prefix below the completeness bound.
    return (n - F.ceil(n * F.lit(threshold) - F.lit(_EPS)) + 1).cast("int")


def prefix_filter_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k_shingle: int = 3,
) -> DataFrame:
    """All pairs (id_a < id_b) with exact word-k-shingle-set Jaccard >=
    ``threshold`` — complete (no LSH miss probability). Columns:
    id_a, id_b, inter, uni, jaccard (round 6)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    ordered = _freq_ordered_sets(df, id_col, text_col, k_shingle)
    with_len = ordered.select(
        "_id", "toks", F.size("toks").alias("n")
    )
    prefixes = with_len.select(
        "_id",
        "n",
        F.explode(F.slice("toks", 1, _prefix_len(F.col("n"), threshold))).alias("s"),
    )
    cand = (
        prefixes.alias("l")
        .join(
            prefixes.alias("r"),
            (F.col("l.s") == F.col("r.s")) & (F.col("l._id") < F.col("r._id")),
        )
        # length filter: J >= t forces min >= t * max (epsilon-relaxed)
        .filter(
            F.least("l.n", "r.n").cast("double")
            >= F.greatest("l.n", "r.n") * F.lit(threshold) - F.lit(_EPS)
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    sets = with_len.select("_id", "toks")
    return (
        cand.join(
            sets.select(F.col("_id").alias("id_a"), F.col("toks").alias("ta")), "id_a"
        )
        .join(sets.select(F.col("_id").alias("id_b"), F.col("toks").alias("tb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("inter"),
            F.size(F.array_union("ta", "tb")).cast("long").alias("uni"),
        )
        .filter(F.col("inter") / F.col("uni") >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            "inter",
            "uni",
            F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard"),
        )
    )
