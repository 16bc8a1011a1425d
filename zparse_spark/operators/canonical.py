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


def repair_documents(
    docs: DataFrame,
    params=None,
    spans_col: str = "spans",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic rule-aligned REPAIR — the salvage path between
    "passes" and "quarantined" (quarantine_split routes whole documents
    out; this fixes what has a canonical fix and logs every action, the
    engine-side analog of the reference's lenient modes):

    - drop spans with NULL/out-of-domain kind (S2) or a non-text kind
      missing its media_ref (S8 — nothing to dereference);
    - null the media_ref on text spans (S8's other arm — the ref is
      meaningless there);
    - strip raw control characters from text (S5);
    - canonical-sort (S1) and truncate to ``max_spans`` (S3);
    - reindex offsets to 0..n−1: repaired documents are in canonical
      COMPACT form (offset = position), the strongest S1/S9-clean shape.

    NOT repaired (no canonical fix exists, quarantine instead): S4
    size overflow (which bytes to cut is a policy), S6/S7 escape
    damage (any rewrite invents content).

    Returns ``(repaired, repair_log)`` — repaired keeps the input
    schema; the log is (doc_id, span_pos, action, rule_id) with
    doc-level actions (truncate:S3, reindex:S1) carrying a NULL
    span_pos. Both outputs are map-only plans over ``docs``; reading
    from storage they share the scan, but materialize first if ``docs``
    is itself an expensive derived plan (the quarantine_split lesson).
    """
    from zparse_spark.operators.rules import _CONTROL_CHARS, RuleParams

    p = params or RuleParams()
    domain = F.array(*[F.lit(k) for k in p.kind_domain])
    spans = F.coalesce(F.col(spans_col), F.array())

    bad_kind = lambda s: s["kind"].isNull() | ~F.array_contains(domain, s["kind"])  # noqa: E731
    drop_s8 = lambda s: (s["kind"] != "text") & s["media_ref"].isNull()  # noqa: E731

    kept = F.filter(spans, lambda s: ~(bad_kind(s) | drop_s8(s)))
    fixed = F.transform(
        kept,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.regexp_replace(s["text"], _CONTROL_CHARS, "").alias("text"),
            F.when(s["kind"] == "text", F.lit(None).cast("string"))
            .otherwise(s["media_ref"])
            .alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    sorted_ = _sorted_spans(fixed)
    truncated = F.slice(sorted_, 1, p.max_spans) if p.max_spans > 0 else sorted_
    reindexed = F.transform(
        truncated,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    repaired = docs.withColumn(spans_col, reindexed)

    # --- repair log: original spans, first-reason precedence ---------
    prev_off = F.when(
        F.size(spans) > 0,
        F.concat(
            F.array(F.lit(None).cast("int")),
            F.slice(F.col(f"{spans_col}.offset"), 1, F.greatest(F.size(spans) - 1, F.lit(0))),
        ),
    ).otherwise(F.array().cast("array<int>"))
    not_monotonic = F.exists(
        F.zip_with(spans, prev_off, lambda s, po: s["offset"] <= po),
        lambda x: F.coalesce(x, F.lit(False)),
    )
    n_kept = F.size(kept)
    ex = docs.select(
        "doc_id",
        n_kept.alias("_n_kept"),
        not_monotonic.alias("_reindex"),
        F.posexplode_outer(spans).alias("span_pos", "s"),
    )
    s = F.col("s")
    action = (
        F.when(bad_kind(s), F.array(F.struct(F.lit("drop").alias("a"), F.lit("S2").alias("r"))))
        .when(drop_s8(s), F.array(F.struct(F.lit("drop").alias("a"), F.lit("S8").alias("r"))))
        .otherwise(
            F.array_compact(
                F.array(
                    F.when(
                        (s["kind"] == "text") & s["media_ref"].isNotNull(),
                        F.struct(F.lit("fix").alias("a"), F.lit("S8").alias("r")),
                    ),
                    F.when(
                        s["text"].rlike(_CONTROL_CHARS),
                        F.struct(F.lit("fix").alias("a"), F.lit("S5").alias("r")),
                    ),
                )
            )
        )
    )
    span_log = ex.filter(s.isNotNull()).select(
        "doc_id", "span_pos", F.explode(action).alias("ar")
    ).select("doc_id", "span_pos", F.col("ar.a").alias("action"), F.col("ar.r").alias("rule_id"))
    null_i = F.lit(None).cast("int")
    doc_flags = docs.select(
        "doc_id",
        n_kept.alias("_n_kept"),
        not_monotonic.alias("_reindex"),
    )
    doc_log = (
        doc_flags.filter(
            (F.lit(p.max_spans) > 0) & (F.col("_n_kept") > p.max_spans)
        ).select("doc_id", null_i.alias("span_pos"), F.lit("truncate").alias("action"),
                 F.lit("S3").alias("rule_id"))
    ).unionByName(
        doc_flags.filter(F.col("_reindex")).select(
            "doc_id", null_i.alias("span_pos"), F.lit("reindex").alias("action"),
            F.lit("S1").alias("rule_id"),
        )
    )
    return repaired, span_log.unionByName(doc_log)


def row_diff_columns(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Changed-COLUMN attribution for rows present in both snapshots —
    the drill-down under snapshot_diff's 'changed' bucket: which fields
    moved? Output one row per changed key: (keys…, changed_columns
    array<string> in declaration order, n_changed).

    Comparison is null-safe (NULL→value and value→NULL both count as a
    change; NULL→NULL does not). Columns present in only one snapshot
    are a SCHEMA change — profile_snapshot_diff's job — so only the
    intersection is compared (minus the keys).

    Scale shape: one equi-join on the key + a map-only array build; the
    filter keeps changed rows only, so output is delta-sparse.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in set(key_cols)
        ]
    o = old.select(*key_cols, *[F.col(c).alias(f"_o_{c}") for c in compare_cols])
    n = new.select(*key_cols, *[F.col(c).alias(f"_n_{c}") for c in compare_cols])
    j = o.join(n, list(key_cols))
    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    return (
        j.withColumn("changed_columns", changed)
        .filter(F.size("changed_columns") > 0)
        .select(*key_cols, "changed_columns", F.size("changed_columns").alias("n_changed"))
    )


def duplicate_resolution_key(spans: Column) -> Column:
    """Portable deterministic content key for duplicate resolution: md5
    of a canonical serialization (spans in canonical order, fields
    k/t/m/o joined with unit separators). Unlike ``span_fingerprint``
    (xxhash64 of to_json — faster, JVM-only), every piece here has an
    exact twin in any SQL engine, so resolution decisions are
    oracle-checkable."""
    ser = F.array_join(
        F.transform(
            _sorted_spans(F.coalesce(spans, F.array())),
            lambda s: F.concat_ws(
                "\x1f",
                F.coalesce(s["kind"], F.lit("")),
                F.coalesce(s["text"], F.lit("")),
                F.coalesce(s["media_ref"], F.lit("")),
                F.coalesce(s["offset"].cast("string"), F.lit("")),
            ),
        ),
        "\x1e",
    )
    return F.md5(ser)


def resolve_duplicate_docs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """U1 REPAIR: collapse duplicate doc_ids to one deterministic
    representative — keep the copy with the most spans (the
    most-complete heuristic), ties broken by (partition,
    content-key) so any engine and any partitioning keeps the same row;
    byte-identical copies are interchangeable by construction.

    Returns ``(resolved, log)``: resolved has unique doc_ids and the
    input schema; the log lists every dropped copy as (doc_id,
    partition, action='drop_duplicate', rule_id='U1').

    Scale shape: ONE shuffle on doc_id for the rank window (the same
    key U1's count aggregate shuffles); the content key is map-side.
    The skewed-key caveat from uniqueness_violations applies — a
    pathological 10^8-copy doc_id lands one window partition; cap such
    keys upstream (hot_bucket_stats-style probe) before resolving.
    """
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("_n"), F.asc("partition"), F.asc("_ser")
    )
    ranked = (
        docs.withColumn("_n", F.coalesce(F.size("spans"), F.lit(0)))
        .withColumn("_ser", duplicate_resolution_key(F.col("spans")))
        .withColumn("_rn", F.row_number().over(w))
    )
    resolved = ranked.filter(F.col("_rn") == 1).drop("_n", "_ser", "_rn")
    log = ranked.filter(F.col("_rn") > 1).select(
        "doc_id",
        "partition",
        F.lit("drop_duplicate").alias("action"),
        F.lit("U1").alias("rule_id"),
    )
    return resolved, log


def repair_dangling_refs(
    docs: DataFrame,
    media_catalog: DataFrame,
    spans_col: str = "spans",
) -> tuple[DataFrame, DataFrame]:
    """R1 REPAIR: drop media spans whose media_ref has no catalog entry
    (nothing downstream could dereference them) and re-compact the
    remaining spans — the referential arm of the repair family. Text
    spans (NULL ref) always survive.

    Returns ``(repaired, log)``: repaired keeps the input schema with
    surviving spans reindexed to compact form (offset = position in the
    original order — gaps from dropped spans close up); the log lists
    every dropped span as (doc_id, partition, span_pos, media_ref,
    action='drop_span', rule_id='R1').

    Scale shape: the catalog reduces to its distinct key set and joins
    the exploded span stream (broadcast when it fits — AQE decides, the
    same regime analysis as referential_violations' strategies); docs
    re-assemble via collect_list over a per-doc window ordered by the
    original position, so span order is preserved exactly. One explode
    + one shuffle on the doc identity. Precondition (like
    canonicalize_spans_exploded): (partition, doc_id) unique — resolve
    duplicates first (X80); reassembly would otherwise merge copies.
    """
    cat_keys = media_catalog.select("media_ref").distinct().withColumn("_hit", F.lit(True))
    ex = docs.select(
        "partition", "doc_id", F.posexplode_outer(F.col(spans_col)).alias("_pos", "_s")
    ).join(F.broadcast(cat_keys), F.col("_s.media_ref") == F.col("media_ref"), "left")
    dangling = (
        F.col("_s").isNotNull()
        & F.col("_s.media_ref").isNotNull()
        & F.col("_hit").isNull()
    )
    log = ex.filter(dangling).select(
        "doc_id",
        "partition",
        F.col("_pos").alias("span_pos"),
        F.col("_s.media_ref").alias("media_ref"),
        F.lit("drop_span").alias("action"),
        F.lit("R1").alias("rule_id"),
    )
    # posexplode_outer keeps empty/NULL-span docs as one NULL-pos row, so
    # the groupBy still emits them; collect_list skips the NULL entry that
    # row contributes, leaving an empty (never NULL) array. No window:
    # collect_list's arbitrary order is fixed by array_sort on the unique
    # original position, and the compact offset is the transform index.
    # dangling rows stay in the aggregate with a NULL entry (filtering
    # them out would vanish docs whose EVERY span dangled — they must
    # survive as empty arrays, like originally-empty docs)
    entry = F.when(
        F.col("_pos").isNotNull() & ~dangling,
        F.struct(F.col("_pos").alias("p"), F.col("_s").alias("s")),
    )
    repaired = (
        ex.groupBy("partition", "doc_id")
        .agg(F.array_sort(F.collect_list(entry)).alias("_rs"))
        .select(
            "partition",
            "doc_id",
            F.transform(
                F.col("_rs"),
                lambda x, i: F.struct(
                    x["s"]["kind"].alias("kind"),
                    x["s"]["text"].alias("text"),
                    x["s"]["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias(spans_col),
        )
    )
    return repaired, log


def span_layout_profile(
    docs: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Document layout census for interleaved corpora: the span-KIND
    sequence in canonical offset order, collapsed to one signature per
    doc ('text>image>text'), counted corpus-wide — "which interleaving
    templates exist, and how common is each?" is the first question a
    multimodal training mix owner asks, and per-span rules can't answer
    it (a layout is a per-DOC shape). NULL spans profile as '(none)',
    empty arrays as '(empty)' — broken producers are classes, never
    skipped rows (collect-don't-abort); NULL kinds/offsets get pinned
    sentinels so the canonical order is total cross-engine.

    Map-only array expressions build the signature (no explode, no
    Python); the only shuffle is the groupBy over the signature domain
    (bounded by layout variety, not corpus size); the share denominator
    rides a one-partition window on that tiny profile table.
    """
    sorted_kinds = F.transform(
        F.array_sort(
            F.transform(
                F.col(spans_col),
                lambda s: F.struct(
                    F.coalesce(s["offset"].cast("long"), F.lit(-1)).alias("o"),
                    F.coalesce(s["kind"], F.lit("(null)")).alias("k"),
                ),
            )
        ),
        lambda x: x["k"],
    )
    sig = (
        F.when(F.col(spans_col).isNull(), F.lit("(none)"))
        .when(F.size(spans_col) == 0, F.lit("(empty)"))
        .otherwise(F.array_join(sorted_kinds, ">"))
    )
    sigs = docs.select(F.col(id_col).alias("_id"), sig.alias("layout"))
    prof = sigs.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("_id").alias("example_doc")
    )
    total = F.sum("n_docs").over(Window.partitionBy(F.lit(1)))
    return prof.select(
        "layout",
        "n_docs",
        F.round(F.col("n_docs") / total, 6).alias("doc_share"),
        "example_doc",
    )


def media_cooccurrence(
    docs: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Which media assets appear TOGETHER in documents — the basket
    view of the interleaved corpus (X93 asks "what layouts exist?";
    this asks "which assets travel together?", the signal behind asset
    packs, shared templates, and near-dup families that text dedup
    can't see because the text differs while the media payload set
    repeats). One row per unordered ref pair with doc counts and the
    per-ref marginals for lift downstream.

    Scale shape: spans reduce to the DISTINCT (doc, ref) pair table
    map-side (a doc repeating one asset adds no pairs); the pair
    self-join keys on the doc — fan-out is refs-per-doc², bounded by
    document structure, never corpus size; marginals ride one more
    groupBy on the reduced table. ``min_count`` prunes the singleton
    tail post-agg.
    """
    dr = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.explode(spans_col).alias("s"),
        )
        .filter(F.col("s.media_ref").isNotNull())
        .select("_doc", F.col("s.media_ref").alias("ref"))
        .distinct()
    )
    marg = dr.groupBy("ref").agg(F.count(F.lit(1)).alias("n"))
    a, b = dr.alias("a"), dr.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._doc") == F.col("b._doc")) & (F.col("a.ref") < F.col("b.ref")),
        )
        .groupBy(F.col("a.ref").alias("ref_a"), F.col("b.ref").alias("ref_b"))
        .agg(F.count(F.lit(1)).alias("n_docs_both"))
        .filter(F.col("n_docs_both") >= min_count)
    )
    return (
        pairs.join(marg.withColumnRenamed("ref", "ref_a"), "ref_a")
        .withColumnRenamed("n", "n_docs_a")
        .join(marg.withColumnRenamed("ref", "ref_b"), "ref_b")
        .withColumnRenamed("n", "n_docs_b")
        .select("ref_a", "ref_b", "n_docs_both", "n_docs_a", "n_docs_b")
    )
