"""Seed-pinned synthetic fixture generator with planted violations.

Table-scale analog of the reference's golden fixture corpus
(crates/zparse/tests/fixtures/{valid,invalid}/* iterated by
tests/fixtures_test.rs:5-37): every generated row carries a
``_fixture_class`` label so golden verdict/violation matrices are
derivable without running the engine. Generation is distributed
(``spark.range`` + column expressions + a little per-class literal
injection) and fully deterministic in ``seed``.

Planted classes (FIXTURES.md T1): valid, dup_doc_id, offset_regression,
null_kind, bad_kind, oversize_spans, oversize_text, control_chars,
bad_escape, bad_unicode, dangling_media, text_with_media_ref,
drift_partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zparse_spark.sources.interleave import derive_media_catalog, interleave_documents

_WORDS = [
    "spark", "table", "scan", "merge", "join", "window", "batch", "stream",
    "filter", "column", "vector", "query", "order", "group", "hash", "sort",
]


def _base_flat(spark: SparkSession, n_docs: int, seed: int) -> DataFrame:
    """Deterministic flat text docs built distributively from spark.range."""
    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(40)) + 5).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: F.element_at(
                word_arr,
                (F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(len(_WORDS))) + 1).cast("int"),
            ),
        ),
        " ",
    )
    return spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))


def generate_documents(
    spark: SparkSession,
    n_docs: int = 2000,
    seed: int = 42,
    n_partitions: int = 8,
    n_media_refs: int = 512,
    hot_dup_copies: int = 0,
    max_spans_cap: int = 128,
) -> DataFrame:
    """Interleaved documents with planted violations.

    ~1% of docs per violation class, assigned deterministically from
    ``pmod(xxhash64(doc_id, seed), 100)`` buckets; ``_fixture_class``
    labels each row. ``hot_dup_copies`` > 0 additionally replicates one
    doc_id that many times (the skew tier: U1's hot key).
    """
    flat = _base_flat(spark, n_docs, seed)
    docs = interleave_documents(
        flat, n_partitions=n_partitions, media_every=3, n_media_refs=n_media_refs
    )

    bucket = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed), F.lit("cls")), F.lit(100))
    cls = (
        F.when(bucket == 0, "offset_regression")
        .when(bucket == 1, "null_kind")
        .when(bucket == 2, "bad_kind")
        .when(bucket == 3, "oversize_spans")
        .when(bucket == 4, "control_chars")
        .when(bucket == 5, "bad_escape")
        .when(bucket == 6, "bad_unicode")
        .when(bucket == 7, "dangling_media")
        .when(bucket == 8, "text_with_media_ref")
        .when(bucket == 9, "dup_doc_id")
        .otherwise("valid")
    )
    docs = docs.withColumn("_fixture_class", cls)

    s = F.col("spans")
    first = F.element_at(s, 1)

    def _mutate_first(new_span):
        return F.concat(F.array(new_span), F.slice(s, 2, 1_000_000))

    mutated = (
        # offset regression: prepend a copy of span[0] with a HIGHER offset
        # than span[0], so pair (0,1) regresses at span_pos 1
        F.when(
            F.col("_fixture_class") == "offset_regression",
            F.concat(
                F.array(
                    F.struct(
                        first["kind"].alias("kind"),
                        first["text"].alias("text"),
                        first["media_ref"].alias("media_ref"),
                        (first["offset"] + 10).cast("int").alias("offset"),
                    )
                ),
                s,
            ),
        )
        .when(
            F.col("_fixture_class") == "null_kind",
            _mutate_first(
                F.struct(
                    F.lit(None).cast("string").alias("kind"),
                    first["text"].alias("text"),
                    first["media_ref"].alias("media_ref"),
                    first["offset"].alias("offset"),
                )
            ),
        )
        .when(
            F.col("_fixture_class") == "bad_kind",
            _mutate_first(
                F.struct(
                    F.lit("hologram").alias("kind"),
                    first["text"].alias("text"),
                    first["media_ref"].alias("media_ref"),
                    first["offset"].alias("offset"),
                )
            ),
        )
        .when(
            F.col("_fixture_class") == "oversize_spans",
            # pad with max_spans_cap extra empty text spans (offsets keep increasing)
            F.concat(
                s,
                F.transform(
                    F.sequence(F.lit(1), F.lit(max_spans_cap + 1)),
                    lambda i: F.struct(
                        F.lit("text").alias("kind"),
                        F.lit("pad").alias("text"),
                        F.lit(None).cast("string").alias("media_ref"),
                        (F.element_at(s, -1)["offset"] + i).cast("int").alias("offset"),
                    ),
                ),
            ),
        )
        .when(
            F.col("_fixture_class") == "control_chars",
            # span 0 gains a trailing '\n' (itself a control char — S5
            # fires at line 1 — AND it advances the line counter), and
            # span 1 (when present) gains '\x01' so its S5 violation
            # lands at line 2, col 1: the fixture exercises BOTH the
            # newline-reset and the no-newline column accumulation paths
            # of the Pos derivation.
            F.concat(
                F.array(
                    F.struct(
                        first["kind"].alias("kind"),
                        F.concat(F.coalesce(first["text"], F.lit("")), F.lit("\n")).alias(
                            "text"
                        ),
                        first["media_ref"].alias("media_ref"),
                        first["offset"].alias("offset"),
                    )
                ),
                F.when(
                    F.size(s) >= 2,
                    F.concat(
                        F.array(
                            F.struct(
                                F.element_at(s, 2)["kind"].alias("kind"),
                                F.concat(
                                    F.coalesce(F.element_at(s, 2)["text"], F.lit("")),
                                    F.lit("\x01"),
                                ).alias("text"),
                                F.element_at(s, 2)["media_ref"].alias("media_ref"),
                                F.element_at(s, 2)["offset"].alias("offset"),
                            )
                        ),
                        F.slice(s, 3, 1_000_000),
                    ),
                ).otherwise(F.slice(s, 2, 1_000_000)),
            ),
        )
        .when(
            F.col("_fixture_class") == "bad_escape",
            _mutate_first(
                F.struct(
                    first["kind"].alias("kind"),
                    F.concat(first["text"], F.lit(" \\q")).alias("text"),
                    first["media_ref"].alias("media_ref"),
                    first["offset"].alias("offset"),
                )
            ),
        )
        .when(
            F.col("_fixture_class") == "bad_unicode",
            _mutate_first(
                F.struct(
                    first["kind"].alias("kind"),
                    F.concat(first["text"], F.lit(" \\uDZZZ")).alias("text"),
                    first["media_ref"].alias("media_ref"),
                    first["offset"].alias("offset"),
                )
            ),
        )
        .when(
            F.col("_fixture_class") == "dangling_media",
            # append a media span whose ref is outside the catalog key space
            F.concat(
                s,
                F.array(
                    F.struct(
                        F.lit("image").alias("kind"),
                        F.lit("").alias("text"),
                        F.concat(F.lit("ghost_"), F.col("doc_id")).alias("media_ref"),
                        (F.element_at(s, -1)["offset"] + 1).cast("int").alias("offset"),
                    )
                ),
            ),
        )
        .when(
            F.col("_fixture_class") == "text_with_media_ref",
            _mutate_first(
                F.struct(
                    F.lit("text").alias("kind"),
                    first["text"].alias("text"),
                    F.lit("media_00000").alias("media_ref"),
                    first["offset"].alias("offset"),
                )
            ),
        )
        .otherwise(s)
    )
    docs = docs.withColumn("spans", mutated)

    # dup_doc_id: emit a second copy of flagged docs (2x). Hot-key tier:
    # replicate doc_id 0 hot_dup_copies times via a range cross join.
    dups = docs.filter(F.col("_fixture_class") == "dup_doc_id")
    docs = docs.unionByName(dups)
    if hot_dup_copies > 0:
        hot = docs.filter(F.col("doc_id") == "0").limit(1)
        hot_rep = spark.range(hot_dup_copies).crossJoin(F.broadcast(hot)).drop("id")
        docs = docs.unionByName(hot_rep.select(*docs.columns))
    return docs


def generate_media_catalog(
    spark: SparkSession, n_media_refs: int = 512, drop_fraction: float = 0.0, seed: int = 42
) -> DataFrame:
    """Catalog covering the interleaver's key space; ``drop_fraction`` > 0
    removes ~that share of keys to create additional dangling refs
    (FIXTURES.md T2 invalid tier)."""
    cat = derive_media_catalog(spark, n_media_refs)
    if drop_fraction > 0:
        keep = F.pmod(F.xxhash64("media_ref", F.lit(seed)), F.lit(1000)) >= int(drop_fraction * 1000)
        cat = cat.filter(keep)
    return cat
