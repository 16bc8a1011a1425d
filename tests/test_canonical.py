"""Span-sequence equality invariant (BASELINE.json input_hint): the
canonical form is order-stable, the two canonicalization paths agree,
and fingerprints detect any (kind, text, media_ref, order) difference —
the table-scale analog of IndexMap order preservation
(value.rs:226, tests/value_tests.rs:102-120)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import make_docs
from zparse_spark.operators.canonical import (
    canonicalize_spans,
    canonicalize_spans_exploded,
    sequence_equality,
    span_fingerprint,
)


def fps(df):
    return {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", span_fingerprint(F.col("spans")).alias("fp")).collect()
    }


def test_canonicalize_is_identity_on_sorted(spark):
    docs = make_docs(
        spark, [("a", [("text", "x", None, 0), ("image", "", "m", 5)], "p0")]
    )
    out = canonicalize_spans(docs).collect()[0]["spans"]
    assert [s["offset"] for s in out] == [0, 5]


def test_shuffled_spans_canonicalize_equal(spark):
    spans = [("text", "x", None, 0), ("image", "", "m", 5), ("text", "y", None, 9)]
    a = make_docs(spark, [("d", spans, "p0")])
    b = make_docs(spark, [("d", list(reversed(spans)), "p0")])
    assert fps(a)["d"] == fps(b)["d"]


def test_fingerprint_sensitive_to_content_and_order(spark):
    base = [("text", "x", None, 0), ("image", "", "m", 5)]
    a = make_docs(spark, [("d", base, "p0")])
    # different text
    b = make_docs(spark, [("d", [("text", "X", None, 0), ("image", "", "m", 5)], "p0")])
    # different order (swapped offsets → different sequence)
    c = make_docs(spark, [("d", [("text", "x", None, 5), ("image", "", "m", 0)], "p0")])
    assert fps(a)["d"] != fps(b)["d"]
    assert fps(a)["d"] != fps(c)["d"]


def test_exploded_path_agrees_with_map_only_path(spark):
    from zparse_spark.sources.datagen import generate_documents

    # exploded-path precondition: unique (doc_id, partition) — dedup the
    # planted duplicate rows first (see canonicalize_spans_exploded docs)
    docs = (
        generate_documents(spark, n_docs=60, seed=9, n_partitions=2)
        .drop("_fixture_class")
        .dropDuplicates(["doc_id"])
    )
    map_only = canonicalize_spans(docs)
    exploded = canonicalize_spans_exploded(docs)
    a = fps(map_only)
    b = fps(exploded)
    assert a == b


def test_sequence_equality_frame(spark):
    a = make_docs(
        spark,
        [("same", [("text", "x", None, 0)], "p0"), ("diff", [("text", "x", None, 0)], "p0"),
         ("only_a", [("text", "z", None, 0)], "p0")],
    )
    b = make_docs(
        spark,
        [("same", [("text", "x", None, 0)], "p0"), ("diff", [("text", "y", None, 0)], "p0"),
         ("only_b", [("text", "z", None, 0)], "p0")],
    )
    got = {r["doc_id"]: r["equal"] for r in sequence_equality(a, b).collect()}
    assert got == {"same": True, "diff": False, "only_a": False, "only_b": False}


def test_canonical_violation_lines_stable_across_layout(spark):
    """The byte-compare contract (FIXTURES.md T3): identical violations in
    any partition layout produce identical canonical bytes."""
    from zparse_spark.operators.canonical import violations_digest
    from zparse_spark.operators.rules import span_rule_violations
    from zparse_spark.sources.datagen import generate_documents

    docs = generate_documents(spark, n_docs=200, seed=17, n_partitions=4).drop("_fixture_class")
    v1 = span_rule_violations(docs)
    v2 = span_rule_violations(docs.repartition(13))
    d1, d2 = violations_digest(v1), violations_digest(v2)
    assert d1 == d2
    assert len(d1) == 64
    assert v1.count() > 0  # digest covers real rows


def test_violations_digest_distributed_at_1m_rows(spark):
    """The digest must scale: 1M synthetic violations reduce to one
    sha256 with only n_chunks tiny rows ever collected (no line
    materialization on the driver), and the value is layout-independent."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.canonical import violations_digest

    v = spark.range(1_000_000).select(
        F.concat(F.lit("p"), (F.col("id") % 16).cast("string")).alias("partition"),
        F.col("id").cast("string").alias("doc_id"),
        F.lit("S1").alias("rule_id"),
        F.lit("InvalidArray").alias("kind"),
        (F.col("id") % 7).cast("int").alias("span_pos"),
        (F.col("id") % 1000).cast("long").alias("offset"),
        F.concat(F.lit("offset regression: "), F.col("id").cast("string")).alias("message"),
    )
    d1 = violations_digest(v, n_chunks=32)
    d2 = violations_digest(v.repartition(7), n_chunks=32)
    assert d1 == d2 and len(d1) == 64


def test_snapshot_diff_classification(spark):
    from pyspark.sql import functions as F

    from zparse_spark.operators.canonical import snapshot_diff

    old = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")], "doc_id string, text string"
    )
    new = spark.createDataFrame(
        [("1", "a"), ("2", "B"), ("4", "d")], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(old, new, fingerprint=F.md5("text")).collect()
    }
    # '1' unchanged -> absent; '2' changed; '3' removed; '4' added
    assert got == {"2": "changed", "3": "removed", "4": "added"}


def test_snapshot_diff_null_fingerprint(spark):
    """Presence is decided by per-side markers, not fingerprint nullness:
    a user fingerprint that evaluates to NULL (md5 of a NULL text) must
    classify by membership — NULL vs NULL is unchanged, NULL vs value is
    changed — never as added/removed (which would silently drop the row
    from the added ∪ changed re-validation set)."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.canonical import snapshot_diff

    old = spark.createDataFrame(
        [("1", None), ("2", None), ("3", "c"), ("5", None)],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [("1", None), ("2", "b"), ("3", None), ("4", None)],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(old, new, fingerprint=F.md5("text")).collect()
    }
    # '1' NULL==NULL unchanged; '2' NULL->value changed; '3' value->NULL
    # changed; '4' added with NULL fp; '5' removed with NULL fp
    assert got == {"2": "changed", "3": "changed", "4": "added", "5": "removed"}


def test_render_training_text(spark):
    from tests.conftest import make_docs
    from zparse_spark.operators.canonical import render_training_text

    docs = make_docs(
        spark,
        [
            # out-of-order offsets: render must follow canonical order
            ("d1", [("image", None, "m1", 5), ("text", "ab", None, 0), ("audio", None, "a1", 9)], "p0"),
            ("d2", [("text", "xy", None, 0)], "p0"),
            ("d3", [], "p1"),
            ("d4", None, "p1"),
        ],
    )
    out = {r.doc_id: r for r in render_training_text(docs).collect()}
    assert out["d1"].training_text == "ab<|image|><|audio|>"
    assert (out["d1"].n_chars, out["d1"].n_media_slots) == (20, 2)
    assert out["d2"].training_text == "xy" and out["d2"].n_media_slots == 0
    assert out["d3"].training_text == "" and out["d3"].n_chars == 0
    assert out["d4"].training_text == "" and out["d4"].n_media_slots == 0
    # map-only plan: no Exchange, no Python
    plan = render_training_text(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_render_training_text_degenerate_nulls(spark):
    """NULL offsets/kinds: total deterministic order (NULL offset sorts
    last via the coalesced key) and NULL-kind spans count as slots."""
    from tests.conftest import make_docs
    from zparse_spark.operators.canonical import render_training_text

    docs = make_docs(
        spark,
        [("d1", [(None, None, "m1", None), ("text", "a", None, 0)], "p0")],
    )
    r = render_training_text(docs).collect()[0]
    assert r.training_text == "a<|unknown|>"
    assert r.n_media_slots == 1
    # layout independence: reversed input array renders identically
    docs2 = make_docs(
        spark,
        [("d1", [("text", "a", None, 0), (None, None, "m1", None)], "p0")],
    )
    assert render_training_text(docs2).collect()[0].training_text == "a<|unknown|>"


def test_repair_documents(spark):
    """Every repair arm on one hand corpus: S2/S8 drops, S8/S5 fixes,
    S1 canonical reindex, S3 truncation, clean doc untouched except
    compaction; log carries first-reason precedence."""
    from tests.conftest import make_docs
    from zparse_spark.operators.canonical import repair_documents
    from zparse_spark.operators.rules import RuleParams

    docs = make_docs(
        spark,
        [
            # out-of-order offsets + bad kind + media-without-ref +
            # text-with-ref + control char
            ("d1", [
                ("text", "b\x01ad", None, 9),          # S5 fix, offset regressed
                ("blob", "x", None, 1),                 # S2 drop
                ("image", "", None, 2),                 # S8 drop (no ref)
                ("text", "ok", "m1", 3),                # S8 fix (ref nulled)
            ], "p0"),
            ("d2", [("text", "clean", None, 5)], "p0"),  # only compaction
            ("d3", [("text", str(i), None, i) for i in range(6)], "p0"),  # S3
            ("empty", [], "p0"),
            ("null", None, "p0"),
        ],
    )
    repaired, log = repair_documents(docs, RuleParams(max_spans=4))
    got = {r["doc_id"]: r["spans"] for r in repaired.collect()}
    # d1: kept spans sorted by offset (3 then 9), reindexed 0,1; fixes applied
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["d1"]] == [
        ("text", "ok", None, 0),
        ("text", "bad", None, 1),
    ]
    assert [(s["text"], s["offset"]) for s in got["d2"]] == [("clean", 0)]
    assert len(got["d3"]) == 4 and [s["offset"] for s in got["d3"]] == [0, 1, 2, 3]
    assert got["empty"] == [] and got["null"] == []
    actions = sorted(
        ((r["doc_id"], r["span_pos"], r["action"], r["rule_id"]) for r in log.collect()),
        key=lambda t: (t[0], -1 if t[1] is None else t[1], t[2]),
    )
    assert actions == [
        ("d1", None, "reindex", "S1"),
        ("d1", 0, "fix", "S5"),
        ("d1", 1, "drop", "S2"),
        ("d1", 2, "drop", "S8"),
        ("d1", 3, "fix", "S8"),
        ("d3", None, "truncate", "S3"),
    ]
    # repaired output passes the span pack it was repaired against
    from zparse_spark.operators.rules import span_rule_violations

    viol = span_rule_violations(repaired, RuleParams(max_spans=4))
    bad = viol.filter("rule_id in ('S1','S2','S3','S5','S8')")
    assert bad.count() == 0


def test_row_diff_columns(spark):
    from zparse_spark.operators.canonical import row_diff_columns

    old = spark.createDataFrame(
        [(1, "a", 10, None), (2, "b", 20, "x"), (3, "c", 30, "y")],
        "k long, s string, n long, opt string",
    )
    new = spark.createDataFrame(
        [(1, "a", 10, None), (2, "B", 21, None), (3, "c", 30, "y"), (4, "d", 0, None)],
        "k long, s string, n long, opt string",
    )
    got = {r["k"]: (r["changed_columns"], r["n_changed"])
           for r in row_diff_columns(old, new, ["k"]).collect()}
    # row 1 unchanged (NULL==NULL is not a change); row 3 unchanged;
    # row 4 exists only in new (snapshot_diff's job, not ours)
    assert got == {2: (["s", "n", "opt"], 3)}
    # declaration order is the old frame's column order
    assert got[2][0] == ["s", "n", "opt"]
    # restricted compare set
    got2 = {r["k"]: r["changed_columns"]
            for r in row_diff_columns(old, new, ["k"], compare_cols=["n"]).collect()}
    assert got2 == {2: ["n"]}


def test_resolve_duplicate_docs(spark):
    """Most-spans keep with deterministic tie chain; singletons pass
    through; the log names every dropped copy; unique output ids."""
    from tests.conftest import make_docs
    from zparse_spark.operators.canonical import resolve_duplicate_docs

    docs = make_docs(
        spark,
        [
            ("a", [("text", "x", None, 0)], "p0"),                         # singleton
            ("b", [("text", "x", None, 0)], "p1"),                         # 1 span
            ("b", [("text", "x", None, 0), ("text", "y", None, 1)], "p2"),  # 2 spans: kept
            ("c", [("text", "same", None, 0)], "p3"),                      # identical copies:
            ("c", [("text", "same", None, 0)], "p2"),                      # partition asc keeps p2
            ("d", [("text", "A", None, 0)], "p0"),                         # same size/partition:
            ("d", [("text", "B", None, 0)], "p0"),                         # md5 key decides ('A'<'B' by md5? deterministic either way)
        ],
    )
    resolved, log = resolve_duplicate_docs(docs)
    kept = {(r["doc_id"], r["partition"]) for r in resolved.collect()}
    assert ("a", "p0") in kept and ("b", "p2") in kept and ("c", "p2") in kept
    assert len(kept) == 4 and len({k[0] for k in kept}) == 4
    dropped = sorted((r["doc_id"], r["partition"], r["action"]) for r in log.collect())
    assert [d[:1][0] for d in dropped] == ["b", "c", "d"]
    assert ("b", "p1", "drop_duplicate") in dropped and ("c", "p3", "drop_duplicate") in dropped
    # deterministic across runs and partitioning
    r2, _ = resolve_duplicate_docs(docs.repartition(7))
    assert {(r["doc_id"], r["partition"]) for r in r2.collect()} == kept


def test_repair_dangling_refs(spark):
    """R1 repair: dangling media spans dropped and logged, survivors
    re-compacted in original order, text spans immune, empty/NULL docs
    preserved as empty arrays."""
    from tests.conftest import make_docs
    from zparse_spark.operators.canonical import repair_dangling_refs

    docs = make_docs(
        spark,
        [
            ("d1", [
                ("text", "a", None, 0),
                ("image", "", "ghost", 1),   # dangling -> dropped
                ("image", "", "known", 2),
                ("text", "b", None, 3),
            ], "p0"),
            ("d2", [("audio", "", "ghost2", 0)], "p0"),  # all spans dropped
            ("d3", [("text", "t", None, 0)], "p1"),
            ("empty", [], "p1"),
            ("null", None, "p1"),
        ],
    )
    cat = spark.createDataFrame([("known",)], "media_ref string")
    repaired, log = repair_dangling_refs(docs, cat)
    got = {r["doc_id"]: r["spans"] for r in repaired.collect()}
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["d1"]] == [
        ("text", "a", None, 0),
        ("image", "", "known", 1),
        ("text", "b", None, 2),
    ]
    assert got["d2"] == [] and got["empty"] == [] and got["null"] == []
    assert [s["text"] for s in got["d3"]] == ["t"]
    assert len(got) == 5  # every doc row survives
    dropped = sorted(
        (r["doc_id"], r["span_pos"], r["media_ref"], r["rule_id"]) for r in log.collect()
    )
    assert dropped == [("d1", 1, "ghost", "R1"), ("d2", 0, "ghost2", "R1")]


def test_span_layout_profile(spark):
    from zparse_spark.operators.canonical import span_layout_profile

    from tests.conftest import make_docs

    docs = make_docs(
        spark,
        [
            ("1", [("text", "a", None, 0), ("image", "", "m1", 10)], "p0"),
            # same layout, arrives with spans OUT of offset order
            ("2", [("image", "", "m2", 10), ("text", "b", None, 0)], "p0"),
            ("3", [("text", "c", None, 0)], "p1"),
            ("4", [], "p1"),
            ("5", None, "p1"),
            # NULL kind and NULL offset get pinned sentinels
            ("6", [(None, "x", None, None), ("text", "y", None, 5)], "p1"),
        ],
    )
    out = {r.layout: r for r in span_layout_profile(docs).collect()}
    assert out["text>image"].n_docs == 2
    assert out["text>image"].example_doc == "1"
    assert abs(out["text>image"].doc_share - round(2 / 6, 6)) < 1e-9
    assert out["text"].n_docs == 1
    assert out["(empty)"].n_docs == 1 and out["(none)"].n_docs == 1
    # null offset (-1 sentinel) sorts FIRST, null kind renders '(null)'
    assert out["(null)>text"].n_docs == 1


def test_media_cooccurrence(spark):
    from zparse_spark.operators.canonical import media_cooccurrence

    from tests.conftest import make_docs

    docs = make_docs(
        spark,
        [
            # doc 1 carries m1+m2 (m1 TWICE: distinct-reduction -> one pair)
            ("1", [("image", "", "m1", 0), ("image", "", "m1", 5),
                   ("audio", "", "m2", 10)], "p0"),
            ("2", [("image", "", "m1", 0), ("audio", "", "m2", 5),
                   ("video", "", "m3", 10)], "p0"),
            ("3", [("text", "x", None, 0)], "p0"),  # no refs
        ],
    )
    out = {(r.ref_a, r.ref_b): r for r in media_cooccurrence(docs).collect()}
    m12 = out[("m1", "m2")]
    assert (m12.n_docs_both, m12.n_docs_a, m12.n_docs_b) == (2, 2, 2)
    assert out[("m1", "m3")].n_docs_both == 1
    assert out[("m2", "m3")].n_docs_both == 1
    assert len(out) == 3
