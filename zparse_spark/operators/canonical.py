"""Span canonicalization + stable fingerprints.

The reference guarantees order preservation through parse→serialize
(IndexMap, crates/zparse/src/value.rs:226; test tests/value_tests.rs:
102-120) and rejects structural disorder (mismatched tags,
xml/parser.rs:125-134). The engine's analog is the **span-sequence
equality invariant** (BASELINE.json input_hint): two documents are
equivalent iff their spans match on (kind, text, media_ref) *in offset
order*. Canonical form = spans sorted by (offset, original position),
fingerprint = xxhash64 over the canonical JSON — stable across partition
layout, task order, and cluster size.

Two implementations, same semantics:
- ``canonicalize_spans``: array_sort with a comparator — map-only, no
  shuffle. The scale path.
- ``canonicalize_spans_exploded``: posexplode → window ordered by
  (offset, pos) → collect_list — the shuffle-based reference shape
  mandated by the north_star (used in tests to prove both agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sorted_spans(spans: Column) -> Column:
    # array_sort comparator: order by offset; ties keep deterministic
    # order by comparing (kind, media_ref, text) so the canonical form is
    # layout-independent even for degenerate equal-offset data.
    return F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(
            F.when(a["kind"] < b["kind"], -1)
            .when(a["kind"] > b["kind"], 1)
            .otherwise(
                F.when(
                    F.coalesce(a["media_ref"], F.lit("")) < F.coalesce(b["media_ref"], F.lit("")),
                    -1,
                )
                .when(
                    F.coalesce(a["media_ref"], F.lit("")) > F.coalesce(b["media_ref"], F.lit("")),
                    1,
                )
                .otherwise(
                    F.when(F.coalesce(a["text"], F.lit("")) < F.coalesce(b["text"], F.lit("")), -1)
                    .when(F.coalesce(a["text"], F.lit("")) > F.coalesce(b["text"], F.lit("")), 1)
                    .otherwise(0)
                )
            )
        ),
    )


def canonicalize_spans(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Map-only canonical ordering of the span array (scale path)."""
    return docs.withColumn(spans_col, _sorted_spans(F.col(spans_col)))


def span_fingerprint(spans: Column) -> Column:
    """64-bit stable fingerprint of the canonical span sequence.

    to_json of an array of structs serializes fields in declared order
    with deterministic text, so equal canonical sequences hash equal on
    any executor. Used for oracle byte-match and exact near-dup joins.
    """
    canon = F.transform(
        _sorted_spans(spans),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return F.xxhash64(F.to_json(canon))


def canonicalize_spans_exploded(docs: DataFrame) -> DataFrame:
    """Shuffle-based canonicalization: posexplode → window ordered by
    (offset, pos) → collect_list (north_star reference shape).

    Kept as the cross-check implementation: tests assert it produces
    identical fingerprints to the map-only path. At scale prefer
    ``canonicalize_spans`` — this one shuffles every span once.

    Precondition: (doc_id, partition) is unique — groupBy-based
    reassembly merges duplicate rows' spans into one (run U1 first, or
    dropDuplicates). The map-only path has no such precondition.
    """
    w = Window.partitionBy("doc_id", "partition").orderBy("offset", "pos")
    exploded = docs.select(
        "doc_id", "partition", F.posexplode("spans").alias("pos", "s")
    ).select("doc_id", "partition", "pos", F.col("s.offset").alias("offset"), "s")
    reassembled = (
        exploded.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id", "partition")
        .agg(F.array_sort(F.collect_list(F.struct("rn", "s"))).alias("rs"))
        .select(
            "doc_id",
            "partition",
            F.transform(F.col("rs"), lambda x: x["s"]).alias("spans"),
        )
    )
    return reassembled


def canonical_violation_lines(violations: DataFrame) -> DataFrame:
    """Violations in canonical byte-compare form (FIXTURES.md T3): rows
    sorted by (partition, doc_id, rule_id, span_pos), serialized as
    stable JSON lines with declared field order and integral longs —
    deterministic bytes on any cluster, so golden-file comparison is a
    plain diff. ``agg(sha2(...))`` over the lines gives a single digest
    for manifest stamping."""
    ordered = violations.orderBy(
        F.asc_nulls_first("partition"),
        F.asc_nulls_first("doc_id"),
        F.asc("rule_id"),
        F.asc_nulls_first("span_pos"),
    )
    return ordered.select(_line_expr().alias("line"))


def _line_expr() -> Column:
    return F.to_json(
        F.struct(
            F.col("partition"),
            F.col("doc_id"),
            F.col("rule_id"),
            F.col("kind"),
            F.col("span_pos").cast("int").alias("span_pos"),
            F.col("offset").cast("long").alias("offset"),
            F.col("message"),
        )
    )


def violations_digest(violations: DataFrame, n_chunks: int = 64) -> str:
    """One stable sha256 over the violation set — computed WITHOUT ever
    materializing lines on the driver (a systemic rule firing on every
    doc of a 10^12-doc table would OOM a collect-based digest).

    Two-level scheme: each line is assigned to a chunk by content hash
    (pmod(xxhash64(line), n_chunks) — deterministic and independent of
    cluster layout, unlike range partitioning, whose sampled boundaries
    shift with the input split). Within a chunk, lines are sorted and
    reduced to one sha256 entirely JVM-side (sort_array + concat_ws +
    sha2); only the ≤ n_chunks (chunk, digest, count) rows reach the
    driver, where the final sha256 hashes them in chunk order. Size
    n_chunks so a chunk's lines fit executor memory (lines/chunk ≈
    |violations|/n_chunks).
    """
    import hashlib

    per_chunk = (
        violations.select(_line_expr().alias("line"))
        .withColumn("chunk", F.pmod(F.xxhash64("line"), F.lit(n_chunks)))
        .groupBy("chunk")
        .agg(
            F.sha2(F.concat_ws("\n", F.sort_array(F.collect_list("line"))), 256).alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("chunk")
        .collect()
    )
    h = hashlib.sha256()
    for r in per_chunk:
        h.update(f"{r['chunk']}:{r['n']}:{r['d']}\n".encode())
    return h.hexdigest()


def sequence_equality(docs_a: DataFrame, docs_b: DataFrame) -> DataFrame:
    """Per-doc span-sequence equality verdict between two tables.

    Full-outer join on doc_id over fingerprints; rows where either side is
    missing or hashes differ are violations of the equality invariant.
    """
    fa = docs_a.select("doc_id", span_fingerprint(F.col("spans")).alias("fp_a"))
    fb = docs_b.select("doc_id", span_fingerprint(F.col("spans")).alias("fp_b"))
    return (
        fa.join(fb, "doc_id", "full_outer")
        .select(
            "doc_id",
            (F.col("fp_a").isNotNull() & F.col("fp_b").isNotNull() & (F.col("fp_a") == F.col("fp_b"))).alias(
                "equal"
            ),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint: Column | None = None,
) -> DataFrame:
    """Classify every id across two table snapshots as ``added`` /
    ``removed`` / ``changed`` — the incremental-validation primitive:
    at 10^12 docs a nightly full re-validation is off the table, so the
    engine re-runs the rule pack ONLY on ``added ∪ changed`` (compose:
    ``new.join(snapshot_diff(...).filter(change != 'removed'), id)``).

    ``fingerprint`` is a Column evaluated against EACH side (default:
    md5 of the span fingerprint — for flat tables pass e.g.
    ``F.md5(F.concat_ws('\\x01', 'text', 'lang'))``); unchanged rows are
    dropped pre-join is impossible (membership needs both sides), but
    the join carries only (id, 16-byte hash) — never row payloads — so
    the shuffle is O(ids), not O(bytes). Unchanged ids are filtered out
    of the result.
    """
    fp = fingerprint if fingerprint is not None else F.md5(
        span_fingerprint(F.col("spans")).cast("string")
    )
    # presence is decided by an explicit per-side marker, never by
    # fingerprint nullness: a user-supplied fingerprint that evaluates to
    # NULL (e.g. F.md5(F.col('text')) with NULL text) must not make an
    # existing row classify as added/removed — that would silently drop
    # it from the added ∪ changed re-validation set. Fingerprints are
    # compared null-safely: NULL vs NULL is "same", NULL vs value differs.
    a = old.select(
        F.col(id_col).alias("_id"), fp.alias("fp_old"), F.lit(True).alias("_in_old")
    )
    b = new.select(
        F.col(id_col).alias("_id"), fp.alias("fp_new"), F.lit(True).alias("_in_new")
    )
    return (
        a.join(b, "_id", "full_outer")
        .withColumn(
            "change",
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(~F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit("changed")),
        )
        .filter(F.col("change").isNotNull())
        .select(F.col("_id").alias(id_col), "change")
    )


def render_training_text(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Render an interleaved document into the flat training-text form a
    tokenizer consumes: spans in canonical offset order, text spans
    contributing their text verbatim and media spans a typed placeholder
    token ``<|kind|>`` (the slot a downstream embedder fills). This is
    the materialization step between validated interleaved storage and a
    packed training batch — run the rule pack first (S1 guarantees
    offset order is meaningful; R1/M1 that every slot resolves).

    Map-only: canonical sort + transform + array_join are all array
    expressions inside codegen — no explode, no shuffle, no Python. At
    10^12 docs this is a pure map stage that pipelines into whatever
    sink or pack step follows.

    Output: (partition?, doc_id, training_text, n_chars, n_media_slots)
    — n_chars of the RENDERED text (placeholders included), media slots
    counted per span occurrence (a NULL-kind span renders ``<|unknown|>``
    and counts as a slot — whatever is in the rendered text is what a
    downstream embedder must fill).

    Ordering is TOTAL even on degenerate data: the sort key coalesces
    every field (offset→2^31-1, strings→''), so NULL offsets/kinds get a
    deterministic layout-independent position and the order matches a
    SQL ``ORDER BY`` over the same coalesced keys exactly (the generic
    ``_sorted_spans`` comparator skips NULL comparisons, which is
    intransitive under NULL kinds — fine for fingerprints of valid data,
    wrong for a byte-stable render).
    """
    spans = F.coalesce(F.col(spans_col), F.array())
    big = F.lit(2147483647)

    def _cmp_key(s, field, null_sub):
        return F.coalesce(s[field], null_sub)

    ordered = F.array_sort(
        spans,
        lambda a, b: F.when(_cmp_key(a, "offset", big) < _cmp_key(b, "offset", big), -1)
        .when(_cmp_key(a, "offset", big) > _cmp_key(b, "offset", big), 1)
        .when(_cmp_key(a, "kind", F.lit("")) < _cmp_key(b, "kind", F.lit("")), -1)
        .when(_cmp_key(a, "kind", F.lit("")) > _cmp_key(b, "kind", F.lit("")), 1)
        .when(_cmp_key(a, "media_ref", F.lit("")) < _cmp_key(b, "media_ref", F.lit("")), -1)
        .when(_cmp_key(a, "media_ref", F.lit("")) > _cmp_key(b, "media_ref", F.lit("")), 1)
        .when(_cmp_key(a, "text", F.lit("")) < _cmp_key(b, "text", F.lit("")), -1)
        .when(_cmp_key(a, "text", F.lit("")) > _cmp_key(b, "text", F.lit("")), 1)
        .otherwise(0),
    )
    rendered = F.array_join(
        F.transform(
            ordered,
            lambda s: F.when(s["kind"] == "text", F.coalesce(s["text"], F.lit("")))
            .otherwise(F.concat(F.lit("<|"), F.coalesce(s["kind"], F.lit("unknown")), F.lit("|>"))),
        ),
        "",
    )
    keep = [c for c in ("partition", "doc_id") if c in docs.columns]
    return docs.select(
        *keep,
        rendered.alias("training_text"),
        F.length(rendered).alias("n_chars"),
        F.size(
            # null-safe: NULL kind renders a placeholder, so it IS a slot
            F.filter(spans, lambda s: s["kind"].isNull() | (s["kind"] != "text"))
        ).alias("n_media_slots"),
    )
