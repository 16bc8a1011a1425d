"""Deterministic flat-text → interleaved span-structured documents.

The driver's ``documents`` parquet is flat ``(doc_id, text, lang, source,
n_chars)``; the engine's primary input shape (BASELINE.json
``input_hint``) is ``(doc_id, spans: array<struct<kind,text,media_ref,
offset>>, partition)``. This module lifts the flat table into that shape
with pure JVM column expressions — ``sequence`` + ``transform`` +
``substring`` — no Python in the loop, no shuffle, no explode: a narrow
map-only stage that scales linearly with input splits.

Determinism: everything keys off ``xxhash64(doc_id, …)``, so the same
input rows produce the same spans at any parallelism / any scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zparse_spark.schema import MEDIA_KIND_DOMAIN

# Media kinds a non-text span may carry, in deterministic rotation.
_MEDIA_KINDS = list(MEDIA_KIND_DOMAIN)


def _media_ref_expr(doc_id: Column, i: Column, n_refs: int) -> Column:
    """Deterministic media key: 'media_NNNNN'. The catalog in
    ``derive_media_catalog`` enumerates the same key space, so valid data
    always joins (FIXTURES.md T2)."""
    bucket = F.pmod(F.xxhash64(doc_id, i), F.lit(n_refs))
    return F.concat(F.lit("media_"), F.lpad(bucket.cast("string"), 5, "0"))


def interleave_documents(
    flat: DataFrame,
    n_partitions: int = 16,
    chunk_chars: int = 120,
    media_every: int = 3,
    n_media_refs: int = 4096,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lift a flat text table into the interleaved documents schema.

    Each document's text is cut into ``ceil(len/chunk_chars)`` text spans
    at character offsets; every ``media_every``-th document gets media
    spans interleaved after each text chunk (kind rotated through the
    media domain, ref drawn from the shared key space). Offsets are
    strictly increasing by construction — the valid-data invariant the
    structural rules check.
    """
    doc_id = F.col(doc_id_col).cast("string")
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = F.greatest(F.lit(1), F.ceil(F.length(text) / F.lit(chunk_chars))).cast("int")

    has_media = F.pmod(F.xxhash64(doc_id), F.lit(media_every)) == 0

    def make_pair(i: Column) -> Column:
        """Text chunk i, plus (for media docs) one media span after it.

        The media span's offset slots between this chunk's end and the
        next chunk's start cannot overlap because we give text chunks
        even offsets (2*i*chunk) and media spans odd (2*i*chunk + chunk).
        Offsets are therefore *positions in an interleaving order*,
        strictly increasing — matching the input_hint contract where
        offset orders the span sequence.
        """
        chunk = F.substring(text, i * chunk_chars + 1, chunk_chars)
        text_span = F.struct(
            F.lit("text").alias("kind"),
            chunk.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (i * 2 * chunk_chars).cast("int").alias("offset"),
        )
        kind_idx = F.pmod(F.xxhash64(doc_id, i, F.lit("kind")), F.lit(len(_MEDIA_KINDS)))
        media_kind = F.element_at(
            F.array(*[F.lit(k) for k in _MEDIA_KINDS]), (kind_idx + 1).cast("int")
        )
        media_span = F.struct(
            media_kind.alias("kind"),
            F.lit("").alias("text"),
            _media_ref_expr(doc_id, i, n_media_refs).alias("media_ref"),
            (i * 2 * chunk_chars + chunk_chars).cast("int").alias("offset"),
        )
        return F.when(has_media, F.array(text_span, media_span)).otherwise(F.array(text_span))

    spans = F.flatten(F.transform(F.sequence(F.lit(0), n_chunks - 1), make_pair))
    partition = F.concat(
        F.lit("p"),
        F.lpad(F.pmod(F.xxhash64(doc_id, F.lit("part")), F.lit(n_partitions)).cast("string"), 3, "0"),
    )
    return flat.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        partition.alias("partition"),
    )


def derive_media_catalog(spark, n_media_refs: int = 4096) -> DataFrame:
    """Enumerate the media key space as the referential target table.

    At production scale this is the real Iceberg media catalog; here it is
    the deterministic closure of ``_media_ref_expr`` so the valid tier has
    zero dangling refs. Built with ``spark.range`` — distributed, no
    driver-side materialization.
    """
    kinds = F.array(*[F.lit(k) for k in _MEDIA_KINDS])
    return spark.range(n_media_refs).select(
        F.concat(F.lit("media_"), F.lpad(F.col("id").cast("string"), 5, "0")).alias("media_ref"),
        F.element_at(kinds, (F.pmod(F.col("id"), F.lit(len(_MEDIA_KINDS))) + 1).cast("int")).alias(
            "media_kind"
        ),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)) + 1024).alias("bytes"),
    )
