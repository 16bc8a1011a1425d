"""The rule pack: zParse's strict-parser contract, table-scale.

Every *span/doc-level* rule compiles to plain JVM column expressions over
a map-side posexplode of the spans array. The scale decisions:

- **Explode without shuffle, checks inside codegen.** posexplode is a
  narrow Generate — no Exchange anywhere in the span-rule plan (asserted
  in tests/test_plans.py). Rule predicates over the exploded rows are
  ordinary columns, so they run inside whole-stage codegen; the earlier
  higher-order-function formulation (filter/transform lambdas over the
  array) was measured ~25% slower because Spark interprets HOF lambdas.
  The monotonicity rule needs no window: each span is zipped with its
  predecessor's offset (a shifted copy of spans.offset) before exploding.
  Doc-level limits (S3/S4) ride the same explode as per-doc scalars and
  fire on the first span row — the whole pack is ONE scan + ONE Generate.
- **No per-row Python.** The escape/unicode/control-char grammars from
  the reference lexer (crates/zparse/src/lexer/json.rs:86-262) are
  compiled to Java regexes evaluated JVM-side. The ONE stage that leaves
  the JVM by default is the Pos line/col derivation — an Arrow-batched
  pandas UDF (the north-star's blessed vectorized path), because its
  running fold is exactly what Catalyst interprets worst (measured 2.4×);
  ``RuleParams(line_col_impl='expr')`` keeps the pack 100% Python-free.
  A vectorized Arrow pandas_udf fallback also exists in
  ``zparse_spark.functions.text`` for grammars regex can't express.

Table-level rules (uniqueness, referential, drift) are the operators the
reference *couldn't* have (single-thread, single buffer) and are where
shuffle strategy matters; see each function's docstring.

Reference parity map (file:line in /root/reference):
  S1 offset monotonicity   ← event-order state machine  json/parser.rs:356-381
  S2 kind domain           ← InvalidToken               lexer/json.rs:69-77
  S3 max spans             ← MaxDepthExceeded           json/parser.rs:432-445
  S4 max text bytes        ← MaxSizeExceeded            json/parser.rs:127-136
  S5 control chars         ← string lexing              lexer/json.rs:146-155
  S6 invalid escapes       ← InvalidEscapeSequence      lexer/json.rs:133-140
  S7 invalid \\u escapes    ← InvalidUnicodeEscape       lexer/json.rs:220-262
  S8 text/media exclusivity← Expected{expected,found}    error.rs:54
  U1 doc_id uniqueness     ← DuplicateKey               toml/parser.rs:918-924
  R1 media_ref referential ← close-tag-must-match-open  xml/parser.rs:125-134
  D1 span-kind drift       ← (north_star extension)
  line/col on violations   ← Pos{offset,line,col}       error.rs:7-18 (display
      "offset:line:col", tests/error_tests.rs:4-7); derived for span-level
      rules from the canonical text reconstruction, see span_rule_violations
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zparse_spark.schema import ErrorKind, SPAN_KIND_DOMAIN


@dataclass(frozen=True)
class Rule:
    rule_id: str
    kind: str
    level: str  # 'span' | 'doc' | 'table'
    description: str


# --------------------------------------------------------------------------
# configuration (the reference's per-parser Config, json/parser.rs:14-23)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class RuleParams:
    """Limits + domains. 0 = unlimited, like the reference Config."""

    max_spans: int = 128  # analog of max_depth (default 128, json/parser.rs:9)
    max_text_bytes: int = 10 * 1024 * 1024  # analog of max_size 10 MiB
    kind_domain: tuple[str, ...] = SPAN_KIND_DOMAIN
    # lenient flags, mirroring Config.with_comments / with_trailing_commas
    # (json/parser.rs:20-23): strict mode demands strictly increasing
    # offsets; lenient tolerates ties (the JSONC-style relaxation)
    allow_equal_offsets: bool = False
    # opt-in S9: span EXTENTS must not overlap — offset must be >= the
    # previous span's offset + char length of its text. Strictly
    # stronger than S1's start-order check; off by default because
    # extent semantics only bind when offsets are character positions
    # in the canonical reconstruction (the input_hint leaves offset an
    # opaque ordering key). Part of rules_hash via RuleParams' repr.
    check_span_overlap: bool = False
    # derive the reference's Pos line/col (error.rs:8-18) for span-level
    # violations: the 1-based start of the violating span in the doc's
    # canonical text reconstruction. One extra O(text) pass per doc in
    # the span-rule stage; disable for position-free pipelines. Part of
    # rules_hash via RuleParams' repr.
    emit_line_col: bool = True
    # 'arrow' (default): Arrow-batched pandas UDF — the north-star's
    # blessed vectorized path; measured 2.4× the pure-JVM fold at 100k
    # docs/local[8] because Spark interprets HOF lambdas. 'expr': the
    # Catalyst fold — keeps the plan 100% Python-free for clusters
    # without Python workers. Identical integers either way.
    line_col_impl: str = "arrow"
    psi_threshold: float = 0.25
    # probability floor for PSI's zero buckets; 1e-4 keeps a kind that is
    # merely absent-by-chance in a small partition from exploding the score
    drift_epsilon: float = 1e-4
    # optional second drift metric: KL(partition ‖ global) with the same
    # eps floor. None = PSI-only (the historical D1); setting it changes
    # rule semantics and therefore rules_hash (via RuleParams' repr)
    kl_threshold: float | None = None


# --------------------------------------------------------------------------
# span-level rules S1..S8 — exploded, whole-stage-codegen formulation
# --------------------------------------------------------------------------

# Java-regex grammars distilled from the reference lexer:
# raw control characters are illegal inside strings (lexer/json.rs:146-155)
_CONTROL_CHARS = "[\\x00-\\x1F]"
# escape set \" \\ \/ \b \f \n \r \t \uXXXX (lexer/json.rs:117-144).
# Validity must CONSUME two-char escapes (in `\\x` the second backslash
# belongs to the first escape), so we anchor a full-match grammar and
# negate it rather than searching for a bad pair: text is valid iff it is
# a sequence of (non-backslash | complete escape). A trailing lone
# backslash fails the grammar too (the reference's unterminated-escape).
_VALID_ESCAPES = '^(?:[^\\\\]|\\\\["\\\\/bfnrtu])*$'
# \u escape validity as a CONSUMING full-match grammar, like S6: text is
# unicode-valid iff it is a sequence of (non-backslash | two-char escape
# that is not \u — this consumes \\ so an escaped backslash followed by a
# literal 'u' never false-positives | \u + non-surrogate hex4 | full
# surrogate pair \uD800-DBFF\uDC00-DFFF | trailing lone backslash, which
# is S6's unterminated-escape, not a unicode problem). Malformed hex and
# lone surrogates fail the match (lexer/json.rs:220-262). Deliberately
# lookaround-free: the same pattern runs under Java regex AND RE2
# (DuckDB), so the rule is oracle-checkable cross-engine.
_VALID_UNICODE = (
    "^(?:[^\\\\]"
    "|\\\\$"
    "|\\\\[^u]"
    "|\\\\u(?:[0-9a-cA-Ce-fE-F][0-9a-fA-F]{3}|[dD][0-7][0-9a-fA-F]{2})"
    "|\\\\u[dD][89abAB][0-9a-fA-F]{2}\\\\u[dD][c-fC-F][0-9a-fA-F]{2}"
    ")*$"
)


def _span_checks(p: RuleParams) -> list[tuple[str, str, Column]]:
    """(rule_id, kind, predicate) over the exploded span frame with
    columns kind/text/media_ref/offset/prev_offset/span_pos. Plain
    column expressions — whole-stage codegen, unlike HOF lambdas which
    Spark interprets (measured ~25% slower on the same data). Violation
    MESSAGES are deliberately not built here: they are attached after
    the explode+filter (see span_rule_violations) so the hot path never
    pays for string construction."""
    domain = F.array(*[F.lit(k) for k in p.kind_domain])
    kind, text, media_ref = F.col("kind"), F.col("text"), F.col("media_ref")
    offset, prev_offset = F.col("offset"), F.col("prev_offset")
    regressed = offset < prev_offset if p.allow_equal_offsets else offset <= prev_offset
    overlap = (
        [
            (
                "S9",
                ErrorKind.INVALID_ARRAY,
                (F.col("span_pos") >= 1) & (offset < F.col("prev_end")),
            )
        ]
        if p.check_span_overlap
        else []
    )
    return overlap + [
        ("S1", ErrorKind.INVALID_ARRAY, (F.col("span_pos") >= 1) & regressed),
        ("S2", ErrorKind.INVALID_TOKEN, kind.isNull() | ~F.array_contains(domain, kind)),
        ("S5", ErrorKind.INVALID_TOKEN, text.rlike(_CONTROL_CHARS)),
        (
            "S6",
            ErrorKind.INVALID_ESCAPE_SEQUENCE,
            # cheap contains() gate: a text with no backslash can't have a
            # bad escape, and skipping the anchored full-match regex on
            # the (overwhelmingly common) clean case is a large win
            text.contains("\\") & ~text.rlike(_VALID_ESCAPES),
        ),
        (
            "S7",
            ErrorKind.INVALID_UNICODE_ESCAPE,
            # the contains gate doubles as a semantic filter: every S7
            # failure mode requires a literal "\u" substring, and pure-S6
            # problems (trailing backslash, \q) never contain one
            text.contains("\\u") & ~text.rlike(_VALID_UNICODE),
        ),
        (
            "S8",
            ErrorKind.EXPECTED,
            ((kind == "text") & media_ref.isNotNull()) | ((kind != "text") & media_ref.isNull()),
        ),
    ]


SPAN_RULES = [
    Rule("S1", ErrorKind.INVALID_ARRAY, "span", "offset strictly increasing within doc"),
    Rule("S2", ErrorKind.INVALID_TOKEN, "span", "span kind in domain"),
    Rule("S3", ErrorKind.MAX_DEPTH_EXCEEDED, "doc", "span count under cap"),
    Rule("S4", ErrorKind.MAX_SIZE_EXCEEDED, "doc", "total text bytes under cap"),
    Rule("S5", ErrorKind.INVALID_TOKEN, "span", "no raw control chars in text"),
    Rule("S6", ErrorKind.INVALID_ESCAPE_SEQUENCE, "span", "escape sequences valid"),
    Rule("S7", ErrorKind.INVALID_UNICODE_ESCAPE, "span", "\\u escapes valid incl. surrogates"),
    Rule("S8", ErrorKind.EXPECTED, "span", "media_ref iff non-text kind"),
]

TABLE_RULES = [
    Rule("U1", ErrorKind.DUPLICATE_KEY, "table", "doc_id unique table-wide"),
    Rule("R1", ErrorKind.DANGLING_MEDIA_REF, "table", "media_ref exists in catalog"),
    Rule("D1", ErrorKind.DRIFT_EXCEEDED, "table", "span-kind PSI under threshold per partition"),
]

# Opt-in (RuleParams.check_span_overlap): span EXTENTS must not overlap —
# strictly stronger than S1's start-order check. Out of ALL_RULES because
# extent semantics only bind when offsets are character positions in the
# canonical reconstruction; the input_hint leaves offset an opaque
# ordering key, so existing manifests never evaluated S9.
OVERLAP_RULES = [
    Rule("S9", ErrorKind.INVALID_ARRAY, "span",
         "span extent (offset + text length) must not overlap the next span"),
]

# Opt-in (ValidationConfig.enable_media_decode): referenced payloads must
# exist and decode. Kept out of ALL_RULES so the default dense verdict
# grid is unchanged for callers without a payload table.
MEDIA_RULES = [
    Rule("M1", ErrorKind.MEDIA_DECODE_FAILED, "media",
         "referenced media payload present and decodes"),
]

# Opt-in (ValidationConfig.enable_media_kind_fd): the same media_ref must
# carry the same span kind table-wide. Out of ALL_RULES for the same
# reason as M1 — the default verdict grid must not grow a rule existing
# manifests never evaluated.
FD_RULES = [
    Rule("F1", ErrorKind.INCONSISTENT_MEDIA_KIND, "table",
         "media_ref kind consistent table-wide"),
]

ALL_RULES = SPAN_RULES + TABLE_RULES


def span_rule_violations(
    docs: DataFrame,
    params: RuleParams | None = None,
    media_catalog: DataFrame | None = None,
) -> DataFrame:
    """Evaluate S1..S8 in ONE narrow map stage — no shuffle anywhere.

    Span rules (S1/S2/S5-S8): the spans array is zipped with its own
    shifted offsets (prev_offset — so the monotonicity rule needs no
    window/shuffle), posexploded, and every predicate is a plain column
    expression inside whole-stage codegen. Violating rows project a
    small violation array that is immediately filtered — HOF lambdas
    were measured ~25% slower because Spark interprets them.

    Doc-level limits (S3/S4): computed per document BEFORE the explode
    (they are properties of the whole array) and unioned in.

    Fused referential (R1): when ``media_catalog`` is passed, the
    exploded frame takes a broadcast left join against the catalog keys
    and R1 becomes one more codegen check — saving the separate
    referential branch's full scan + explode. Only valid for a
    broadcastable catalog; the engine falls back to the standalone
    SMJ-based ``referential_violations`` otherwise.
    """
    p = params or RuleParams()
    spans = F.col("spans")

    # -- span-level: zip with shifted offsets, posexplode, codegen checks.
    # arrays_zip pads to the longer side, so prev_offsets must be EMPTY
    # (not [null]) when spans is empty or the zip would fabricate a row.
    prev_offsets = F.when(
        F.coalesce(F.size(spans), F.lit(0)) > 0,
        F.concat(
            F.array(F.lit(None).cast("int")),
            F.slice(F.col("spans.offset"), 1, F.greatest(F.size(spans) - 1, F.lit(0))),
        ),
    ).otherwise(F.array().cast("array<int>"))
    # (line, col) where each span STARTS in the canonical reconstruction
    # (span texts concatenated in array order) — the reference Pos
    # contract (error.rs:8-18) at table scale. One O(total text) pass per
    # doc, riding the same narrow map stage (no shuffle either way).
    if p.emit_line_col and p.line_col_impl == "arrow":
        # Arrow-batched vectorized UDF over the pruned spans.text array —
        # the one pack stage that leaves the JVM, because the running
        # fold is exactly what Catalyst interprets worst: measured
        # 1.0 s vs 2.4 s (expr fold) vs 3.8 s (two-extraction fold) on
        # the +line/col delta at 100k docs / local[8].
        from zparse_spark.functions.text import span_start_positions

        pos_arr = span_start_positions(F.col("spans.text"))
    elif p.emit_line_col:
        # pure-JVM fold: each step appends this span's start cursor and
        # advances it — ONE aggregate evaluation (an earlier shape that
        # zipped two field-extractions of a struct-state fold evaluated
        # the whole fold twice; measured 1.6× slower)
        def _pos_step(acc, s):
            text = F.coalesce(s["text"], F.lit(""))
            nls = F.length(text) - F.length(F.replace(text, F.lit("\n"), F.lit("")))
            prv = F.element_at(acc, -1)
            return F.concat(
                acc,
                F.array(
                    F.struct(
                        prv["nline"].alias("line"),
                        prv["ncol"].alias("col"),
                        (prv["nline"] + nls).cast("int").alias("nline"),
                        F.when(
                            nls > 0,
                            F.length(F.substring_index(text, "\n", -1)) + 1,
                        )
                        .otherwise(prv["ncol"] + F.length(text))
                        .cast("int")
                        .alias("ncol"),
                    )
                ),
            )

        seed = F.array(
            F.struct(
                F.lit(1).cast("int").alias("line"),
                F.lit(1).cast("int").alias("col"),
                F.lit(1).cast("int").alias("nline"),
                F.lit(1).cast("int").alias("ncol"),
            )
        )
        safe_spans = F.coalesce(spans, F.array())
        pos_arr = F.slice(
            F.aggregate(safe_spans, seed, _pos_step),
            2,
            F.greatest(F.size(safe_spans), F.lit(1)),
        )
    else:
        pos_arr = F.transform(
            F.coalesce(spans, F.array()),
            lambda s: F.lit(None).cast("struct<line:int,col:int>"),
        )
    zip_cols = [
        spans.alias("s"),
        prev_offsets.alias("prev_offset"),
        pos_arr.alias("p"),
    ]
    if p.check_span_overlap:
        # shifted extent ends (prev offset + char length of prev text) —
        # same shape as prev_offsets, so S9 needs no window/shuffle either
        ends = F.transform(
            spans,
            lambda s: s["offset"].cast("long")
            + F.length(F.coalesce(s["text"], F.lit(""))).cast("long"),
        )
        prev_ends = F.when(
            F.coalesce(F.size(spans), F.lit(0)) > 0,
            F.concat(
                F.array(F.lit(None).cast("long")),
                F.slice(ends, 1, F.greatest(F.size(spans) - 1, F.lit(0))),
            ),
        ).otherwise(F.array().cast("array<long>"))
        zip_cols.append(prev_ends.alias("prev_end"))
    zipped = F.arrays_zip(*zip_cols)
    # doc-level scalars (S3/S4 inputs) ride along the explode so the whole
    # pack needs exactly ONE scan and ONE Generate
    n_spans = F.coalesce(F.size(spans), F.lit(0))
    total_bytes = F.aggregate(
        F.coalesce(spans, F.array()),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.octet_length(s["text"]), F.lit(0)),
    )
    # Two-step select: the per-doc scalars must be computed BELOW the
    # Generate. A single select puts every non-generator column in the
    # projection ABOVE the Generate (ExtractGenerator), where the
    # interpreted total-bytes aggregate re-runs once per EXPLODED SPAN
    # instead of once per doc (r6 plan audit: `aggregate(coalesce(spans,
    # []), ...)` in the post-Generate Project) — ~|spans| duplicated
    # folds per doc. The pre-projection pins them per doc (the Generate
    # between the projections blocks CollapseProject from re-inlining).
    # The zip itself stays INLINE in posexplode: aliasing it to a column
    # makes InferFiltersFromGenerate add a `size(zip) > 0` filter on the
    # bare attribute, which pushdown re-expands below the pre-projection
    # — duplicating the zip AND the Arrow line/col stage at the scan
    # (observed: 4 ArrowEvalPython nodes). With the PythonUDF visible
    # inside the generator expression the rule skips the inference.
    pre = docs.select(
        "partition",
        "doc_id",
        "spans",
        n_spans.alias("_n_spans"),
        total_bytes.alias("_total_bytes"),
    )
    ex = pre.select(
        "partition",
        "doc_id",
        "_n_spans",
        "_total_bytes",
        F.posexplode(zipped).alias("span_pos", "z"),
    ).select(
        "partition",
        "doc_id",
        "span_pos",
        "_n_spans",
        "_total_bytes",
        F.col("z.s.kind").alias("kind"),
        F.col("z.s.text").alias("text"),
        F.col("z.s.media_ref").alias("media_ref"),
        F.col("z.s.offset").alias("offset"),
        F.col("z.prev_offset").alias("prev_offset"),
        (
            F.col("z.prev_end") if p.check_span_overlap else F.lit(None).cast("long")
        ).alias("prev_end"),
        F.col("z.p.line").alias("line"),
        F.col("z.p.col").alias("col"),
    )

    def _item(rule_id, kind, span_pos, offset, line=None, col=None):
        # deliberately message-free: the item struct carries only small
        # scalars. Building messages here looks lazy (when(cond, item))
        # but codegen's common-subexpression elimination hoists the
        # shared string concats OUT of the lazy branches — measured 2×
        # on the whole write-shaped pass at 16M docs (string allocation
        # per exploded row for violations that almost never fire).
        null_i = F.lit(None).cast("int")
        return F.struct(
            F.lit(rule_id).alias("rule_id"),
            F.lit(kind).alias("kind"),
            span_pos.cast("int").alias("span_pos"),
            offset.cast("long").alias("offset"),
            (line if line is not None else null_i).cast("int").alias("line"),
            (col if col is not None else null_i).cast("int").alias("col"),
        )

    checks = [
        (
            cond,
            _item(
                rule_id, kind, F.col("span_pos"), F.col("offset"),
                F.col("line"), F.col("col"),
            ),
        )
        for rule_id, kind, cond in _span_checks(p)
    ]
    if media_catalog is not None:
        # broadcast hash join is a streaming pass over the exploded rows
        # (build side = catalog keys); R1 fires when a non-null media_ref
        # found no catalog hit
        cat_keys = F.broadcast(
            media_catalog.select("media_ref").distinct().withColumn("_cat_hit", F.lit(True))
        )
        ex = ex.join(cat_keys, "media_ref", "left")
        checks.append(
            (
                F.col("media_ref").isNotNull() & F.col("_cat_hit").isNull(),
                _item(
                    "R1",
                    ErrorKind.DANGLING_MEDIA_REF,
                    F.col("span_pos"),
                    F.col("offset"),
                ),
            )
        )
    # S3/S4 document-level limits fire once per doc, on the first span row
    # (span_pos/offset null in the emitted violation — the reference's
    # error-at-opener position lifted to error-at-document); a doc that
    # could violate them always has at least one span.
    first = F.col("span_pos") == 0
    null_i, null_l = F.lit(None).cast("int"), F.lit(None).cast("long")
    if p.max_spans > 0:
        checks.append(
            (
                first & (F.col("_n_spans") > p.max_spans),
                _item("S3", ErrorKind.MAX_DEPTH_EXCEEDED, null_i, null_l),
            )
        )
    if p.max_text_bytes > 0:
        checks.append(
            (
                first & (F.col("_total_bytes") > p.max_text_bytes),
                _item("S4", ErrorKind.MAX_SIZE_EXCEEDED, null_i, null_l),
            )
        )
    viol_arr = F.array_compact(
        F.array(
            *[
                F.when(F.coalesce(cond, F.lit(False)), item).otherwise(F.lit(None))
                for cond, item in checks
            ]
        )
    )
    # Pre-filter on "any rule fired" BEFORE the item-array build: the
    # struct construction, array_compact (a RuntimeReplaceable filter
    # HOF, interpreted) and the second Generate cost ~2 s per 1M clean
    # span rows that emit nothing (r6 measurement: viol_arr projection
    # +0.8 s, its explode +1.3 s). The disjunction re-tests each
    # predicate once per row — comparisons plus the gated regexes, far
    # cheaper than building throwaway arrays — and the explode then
    # runs on actual violations only. Output rows are identical: the
    # filter keeps exactly the rows whose viol_arr is non-empty.
    import functools
    import operator

    fired = functools.reduce(
        operator.or_, (F.coalesce(cond, F.lit(False)) for cond, _ in checks)
    )
    # Explode matched items FIRST, carry the (cheap scalar) message
    # inputs through, and only THEN build the message strings: after the
    # filter implied by explode(array_compact(...)), these expressions
    # run on actual violations only — a vanishing fraction of rows. The
    # span text does NOT ride through the explode (S5-S7 messages are
    # constants), so no text bytes move past the scan stage.
    matched = ex.filter(fired).select(
        "partition",
        "doc_id",
        F.col("kind").alias("_span_kind"),
        "media_ref",
        "offset",
        "prev_offset",
        "prev_end",
        "_n_spans",
        "_total_bytes",
        F.explode(viol_arr).alias("v"),
    )
    kind_str = F.coalesce(F.col("_span_kind"), F.lit("<null>"))
    message = (
        F.when(
            F.col("v.rule_id") == "S1",
            F.concat(
                F.lit("offset regression: "),
                F.col("offset").cast("string"),
                F.lit(" <= prev "),
                F.col("prev_offset").cast("string"),
            ),
        )
        .when(
            F.col("v.rule_id") == "S9",
            F.concat(
                F.lit("span overlap: offset "),
                F.col("offset").cast("string"),
                F.lit(" < prev end "),
                F.col("prev_end").cast("string"),
            ),
        )
        .when(F.col("v.rule_id") == "S2", F.concat(F.lit("kind not in domain: "), kind_str))
        .when(F.col("v.rule_id") == "S5", F.lit("control character in text"))
        .when(F.col("v.rule_id") == "S6", F.lit("invalid escape sequence"))
        .when(F.col("v.rule_id") == "S7", F.lit("invalid unicode escape"))
        .when(
            F.col("v.rule_id") == "S8",
            F.when(
                F.col("_span_kind") == "text", F.lit("expected media_ref=null for kind=text")
            ).otherwise(F.concat(F.lit("expected media_ref for kind="), kind_str)),
        )
        .when(
            F.col("v.rule_id") == "R1",
            F.concat(F.lit("dangling media_ref: "), F.col("media_ref")),
        )
        .when(
            F.col("v.rule_id") == "S3",
            F.concat(
                F.lit("span count "),
                F.col("_n_spans").cast("string"),
                F.lit(f" > max {p.max_spans}"),
            ),
        )
        .when(
            F.col("v.rule_id") == "S4",
            F.concat(
                F.lit("text bytes "),
                F.col("_total_bytes").cast("string"),
                F.lit(f" > max {p.max_text_bytes}"),
            ),
        )
    )
    return matched.select(
        "partition",
        "doc_id",
        F.col("v.rule_id").alias("rule_id"),
        F.col("v.kind").alias("kind"),
        F.col("v.span_pos").alias("span_pos"),
        F.col("v.offset").alias("offset"),
        F.col("v.line").alias("line"),
        F.col("v.col").alias("col"),
        message.cast("string").alias("message"),
    )


# --------------------------------------------------------------------------
# table-level rules
# --------------------------------------------------------------------------


def uniqueness_violations(docs: DataFrame) -> DataFrame:
    """U1: doc_id must be unique table-wide (DuplicateKey lifted from
    toml/parser.rs:918-924).

    Shuffle strategy: ONE ``groupBy(doc_id).count()``. A count aggregate
    needs no salting against hot keys — map-side partial aggregation
    collapses a pathological doc_id (FIXTURES.md plants ×1000; at 10^12
    scale think ×10^8) to at most one ``(key, local_count)`` row per
    input task before anything shuffles, so the reducer for the hot key
    receives ≤ #tasks rows, not #duplicates. (When the partial-agg hash
    map overflows on high-cardinality tasks, Spark falls back to
    sort-based aggregation, which still combines.) Round 1 shipped a
    two-phase salted variant; measured at 16M unique keys / 32 cores it
    shuffles |docs| rows twice and ran 2.99 s vs 1.94 s for this
    single-phase form — salting solves a problem count aggregates don't
    have, at the price of doubling shuffle volume (the former
    ``n_salts`` knob is gone with it). The hot-key guard that still
    matters is on the emit join below, where AQE skew-join splitting
    spreads a duplicated key's violation rows.

    Violations are emitted per duplicated *row* by joining the dup keys
    back (AQE broadcasts the dup-key side when small; skew-join splits
    otherwise). The scan prunes to (doc_id, partition) — nothing here
    touches ``spans``, so no text bytes move.
    """
    dups = (
        docs.select("doc_id")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        docs.join(dups, "doc_id")
        .select(
            "partition",
            "doc_id",
            F.lit("U1").alias("rule_id"),
            F.lit(ErrorKind.DUPLICATE_KEY).alias("kind"),
            F.lit(None).cast("int").alias("span_pos"),
            F.lit(None).cast("long").alias("offset"),
            F.lit(None).cast("int").alias("line"),
            F.lit(None).cast("int").alias("col"),
            F.concat(F.lit("doc_id appears "), F.col("n").cast("string"), F.lit(" times")).alias(
                "message"
            ),
        )
    )


def referential_violations(
    docs: DataFrame,
    media_catalog: DataFrame,
    strategy: str = "auto",
    distinct_broadcast_max: int = 1_000_000,
) -> DataFrame:
    """R1: every non-null spans.media_ref must exist in the catalog
    (referential pairing generalizing xml/parser.rs:125-134).

    Scale shape: prune the array *before* exploding — only media spans
    (sparse) are generated, so the explode output is a fraction of total
    spans. The anti-join is broadcast when the catalog fits
    (``strategy='broadcast'`` forces it; 'auto' lets AQE decide; 'smj'
    hints shuffle merge for a catalog too big to broadcast).

    ``strategy='distinct'`` is the shape for the BIG-catalog × BIG-docs
    regime where the SMJ shuffles every ref *occurrence*: anti-join the
    catalog against the DISTINCT ref values first (shuffle volume drops
    from occurrences to distinct values — partial-distinct combines
    map-side, and media refs repeat heavily in real corpora), producing
    the dangling-ref SET, which is violation-sparse and therefore tiny;
    broadcast-join that set back onto the occurrence stream (map-only).
    Output is exactly the single-phase anti-join's — the rewrite is an
    algebraic identity (anti-join distributes over the distinct because
    membership depends only on the key).

    ``strategy='bloom'`` is 'distinct' plus an exact Bloom prune of the
    catalog side first (see ``bloom_prune``): the giant catalog is cut
    to ~the refs actually used before it ever reaches an exchange —
    the shape for catalogs orders of magnitude wider than any one
    table's ref domain (a global media store serving many corpora).
    """
    # GetArrayStructFields projections (spans.media_ref / spans.offset)
    # are visible to nested-schema pruning, so the parquet scan reads ONLY
    # those two subfields — a HOF over F.col("spans") would force the
    # full struct (all text bytes) through the reader. posexplode keeps
    # the span_pos position contract; text spans are filtered right after.
    zipped = F.arrays_zip(
        F.col("spans.media_ref").alias("media_ref"), F.col("spans.offset").alias("offset")
    )
    refs = (
        docs.select("partition", "doc_id", F.posexplode(zipped).alias("span_pos", "x"))
        .filter(F.col("x.media_ref").isNotNull())
        .select(
            "partition",
            "doc_id",
            F.col("span_pos").cast("int").alias("span_pos"),
            F.col("x.offset").cast("long").alias("offset"),
            F.col("x.media_ref").alias("media_ref"),
        )
    )
    cat = media_catalog.select("media_ref").distinct()
    if strategy == "broadcast":
        cat = F.broadcast(cat)
    elif strategy == "smj":
        cat = cat.hint("merge")
    if strategy == "bloom":
        # EXACT probe-side catalog pruning for the 10^9-row-catalog
        # regime: build a Bloom bitmap over the DISTINCT refs actually
        # used (one agg, ≤n_words rows), then drop catalog rows whose
        # key misses it BEFORE any join — no false negatives means
        # every catalog row that matches some ref survives, so the
        # anti-join result is unchanged; what changes is that the
        # catalog side of the exchange shrinks from |catalog| to
        # ~|used refs| (+FP). The surviving two-phase below then runs
        # on the pruned side. This is what Spark's runtime Bloom join
        # would do for us if it fired for anti-joins (it does not).
        distinct_refs = refs.select("media_ref").distinct()
        cat = bloom_prune(
            cat, "media_ref", bloom_bitmap(distinct_refs, "media_ref")
        )
        strategy = "distinct"
    if strategy == "distinct":
        dangling_set = refs.select("media_ref").distinct().join(
            cat, "media_ref", "left_anti"
        )
        # the forced broadcast rides on the sparsity ASSUMPTION that
        # dangling refs are rare; when it fails (wrong/empty catalog →
        # most refs dangling) a forced broadcast OOMs the driver at the
        # scale this path targets, turning a data problem into a job
        # failure. Probe with limit(max+1).count() — bounded either way,
        # the scan stops after max+1 rows — and fall back to the plain
        # occurrence anti-join when the set exceeds the broadcast budget
        # (in the catastrophic regime the two-phase rewrite saves
        # nothing anyway: the dangling set ≈ the distinct refs).
        if (
            dangling_set.limit(distinct_broadcast_max + 1).count()
            <= distinct_broadcast_max
        ):
            dangling = refs.join(F.broadcast(dangling_set), "media_ref", "left_semi")
        else:
            dangling = refs.join(cat, "media_ref", "left_anti")
    else:
        dangling = refs.join(cat, "media_ref", "left_anti")
    return dangling.select(
        "partition",
        "doc_id",
        F.lit("R1").alias("rule_id"),
        F.lit(ErrorKind.DANGLING_MEDIA_REF).alias("kind"),
        "span_pos",
        "offset",
        # null by design: this branch's scan prunes to (media_ref, offset)
        # — deriving line/col would read every text byte
        F.lit(None).cast("int").alias("line"),
        F.lit(None).cast("int").alias("col"),
        F.concat(F.lit("dangling media_ref: "), F.col("media_ref")).alias("message"),
    )


def bloom_bitmap(
    keys: DataFrame, key_col: str, n_words: int = 4096, n_hashes: int = 5
) -> DataFrame:
    """Mergeable Bloom bitmap over a key column as a ≤``n_words``-row
    table ``(word_idx int, word long)`` — 64 bits per word, ``n_hashes``
    bits set per key via ``xxhash64(key, i)`` for i in 0..n_hashes-1
    (the two-argument form hashes the (key, i) tuple, so the i-th probe
    is an independent hash family member; both build and probe spell
    the IDENTICAL SQL expression, so the bit positions agree by
    construction).

    Scale shape: ONE scan of the key set with a k-way explode, then a
    groupBy(word_idx) + bit_or — map-side partial bit_or collapses each
    task's contribution to ≤ n_words rows before the shuffle, so the
    exchange carries at most n_words × tasks tiny rows no matter how
    many keys went in. The result is a TABLE (not a driver value): it
    merges across incremental builds with another bit_or, and it
    broadcasts (n_words=4096 → 32 KB; even 2^22 words → 32 MB fits the
    default broadcast budget) — the property ``bloom_prune`` rides."""
    m = n_words * 64
    probes = F.array(
        *[
            F.struct(
                F.expr(
                    f"CAST(pmod(xxhash64({key_col}, {i}), {m}) DIV 64 AS INT)"
                ).alias("w"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(pmod(xxhash64({key_col}, {i}), {m}) % 64 AS INT))"
                ).alias("b"),
            )
            for i in range(n_hashes)
        ]
    )
    return (
        keys.select(F.explode(probes).alias("x"))
        .select(F.col("x.w").alias("word_idx"), F.col("x.b").alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    n_words: int = 4096,
    n_hashes: int = 5,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the set the bitmap was built
    over — Bloom filters have NO false negatives, so every row whose key
    IS in the set survives; false positives only cost bytes downstream.
    This makes the prune EXACT for join work: filtering the non-probe
    side of an equi/semi/anti join by a Bloom of the probe side's keys
    never changes the join result (rows dropped here match nothing).

    The probe is ``n_hashes`` broadcast hash joins of the ≤n_words-row
    bitmap (word lookup) plus a codegen bit test — map-only, no shuffle
    of ``df``, no driver collect, no Python. This is the engine-level
    form of Spark's runtime row-level Bloom join (which does not fire
    for anti-joins); n_words scales to the key cardinality (~10 bits/key
    for ~1% FP at k=5) bounded only by the broadcast budget."""
    m = n_words * 64
    out = df
    keep = F.lit(True)
    tmp = []
    for i in range(n_hashes):
        wi, wv = f"__bloom_w{i}", f"__bloom_v{i}"
        tmp += [wi, wv]
        out = out.withColumn(
            wi, F.expr(f"CAST(pmod(xxhash64({key_col}, {i}), {m}) DIV 64 AS INT)")
        ).join(
            F.broadcast(
                bitmap.select(
                    F.col("word_idx").alias(f"__bm_w{i}"),
                    F.col("word").alias(wv),
                )
            ),
            F.col(wi) == F.col(f"__bm_w{i}"),
            "left",
        ).drop(f"__bm_w{i}")
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64({key_col}, {i}), {m}) % 64 AS INT))"
        )
        keep = keep & F.col(wv).isNotNull() & (F.col(wv).bitwiseAND(mask) != 0)
    return out.filter(keep).drop(*tmp)


def media_payload_violations(
    docs: DataFrame, payload_verdicts: DataFrame, check_missing: bool = True
) -> DataFrame:
    """M1: every referenced media payload must exist and decode.

    ``payload_verdicts`` is the output of ``multimodal.decode_verdicts``
    (media_ref, ok, error_kind) — decode classification runs ONCE per
    payload row, never per referencing span. The rule itself is the R1
    shape: prune the scan to (spans.media_ref, spans.offset), explode
    only media spans, and join against the bad-ref set (undecodable ∪
    referenced-but-absent), which is sparse in practice — AQE broadcasts
    it. Referenced-but-absent needs one distinct over referenced refs
    plus an anti-join against the payload key set — a shuffle of the
    payload KEYS (not payloads) on media_ref; when the payload table is
    authoritative-complete (ingest guarantees a row per ref), pass
    ``check_missing=False`` to skip that whole branch and keep the rule
    broadcast-only.
    """
    zipped = F.arrays_zip(
        F.col("spans.media_ref").alias("media_ref"), F.col("spans.offset").alias("offset")
    )
    refs = (
        docs.select("partition", "doc_id", F.posexplode(zipped).alias("span_pos", "x"))
        .filter(F.col("x.media_ref").isNotNull())
        .select(
            "partition",
            "doc_id",
            F.col("span_pos").cast("int").alias("span_pos"),
            F.col("x.offset").cast("long").alias("offset"),
            F.col("x.media_ref").alias("media_ref"),
        )
    )
    undecodable = payload_verdicts.filter(~F.col("ok")).select("media_ref", "error_kind")
    bad = undecodable
    if check_missing:
        missing = (
            refs.select("media_ref")
            .distinct()
            .join(payload_verdicts.select("media_ref"), "media_ref", "left_anti")
            .withColumn("error_kind", F.lit("missing"))
        )
        bad = undecodable.unionByName(missing)
    return refs.join(bad, "media_ref").select(
        "partition",
        "doc_id",
        F.lit("M1").alias("rule_id"),
        F.lit(ErrorKind.MEDIA_DECODE_FAILED).alias("kind"),
        "span_pos",
        "offset",
        F.lit(None).cast("int").alias("line"),
        F.lit(None).cast("int").alias("col"),
        F.concat(
            F.lit("media payload "), F.col("error_kind"), F.lit(": "), F.col("media_ref")
        ).alias("message"),
    )


def drift_scores(docs: DataFrame, params: RuleParams | None = None) -> DataFrame:
    """D1's raw score: (partition, psi) for every partition — the
    pre-threshold surface, exposed so the oracle gate can compare the
    actual PSI values (not just the fired/not-fired verdict).

    Scale shape: per-doc kind counts are computed in the map stage with
    higher-order functions (no explode), so the shuffle input is
    |docs| × |kinds| tiny rows → groupBy(partition, kind) → the global
    side is a broadcast-sized |kinds| table.
    """
    p = params or RuleParams()
    eps = p.drift_epsilon
    kind_domain = list(p.kind_domain)
    # per-doc counts per kind in ONE pass. The kinds array is projected
    # with GetArrayStructFields (spans.kind) BEFORE the aggregate so
    # nested-schema pruning reaches the scan: a HOF over F.col("spans")
    # would read every text byte just to count kinds (measured 6x
    # anti-scaling at 32 cores from the wasted decode bandwidth).
    domain_arr = F.array(*[F.lit(k) for k in kind_domain])
    zero = F.array(*[F.lit(0).cast("long") for _ in kind_domain])
    counts = F.aggregate(
        F.coalesce(F.col("_kinds"), F.array()),
        zero,
        lambda acc, k0: F.zip_with(
            acc, domain_arr, lambda c, k: c + F.when(k0 == k, 1).otherwise(0)
        ),
    )
    per_doc = (
        docs.select("partition", F.col("spans.kind").alias("_kinds"))
        .select("partition", counts.alias("_counts"))
        .select(
            "partition",
            *[F.element_at("_counts", j + 1).alias(f"_c_{k}") for j, k in enumerate(kind_domain)],
        )
    )
    per_part = per_doc.groupBy("partition").agg(
        *[F.sum(f"_c_{k}").alias(f"c_{k}") for k in kind_domain]
    )
    total_expr = sum((F.col(f"c_{k}") for k in kind_domain), F.lit(0))
    per_part = per_part.withColumn("_tot", total_expr)

    glob = per_part.agg(
        *[F.sum(f"c_{k}").alias(f"g_{k}") for k in kind_domain],
        F.sum("_tot").alias("g_tot"),
    )
    joined = per_part.crossJoin(F.broadcast(glob))
    psi_terms = []
    kl_terms = []
    for k in kind_domain:
        # zero-span guard (ANSI mode makes x/0 a job-killer, and a
        # partition of span-less docs is DATA, not a reason to abort —
        # collect-don't-abort): an empty partition's shares floor to
        # eps across every kind, which reads as maximal drift and
        # flags the partition instead of crashing the run
        pk = (
            F.when(F.col("_tot") > 0, F.col(f"c_{k}") / F.col("_tot")).otherwise(
                F.lit(0.0)
            )
            + eps
        )
        qk = (
            F.when(F.col("g_tot") > 0, F.col(f"g_{k}") / F.col("g_tot")).otherwise(
                F.lit(0.0)
            )
            + eps
        )
        psi_terms.append((pk - qk) * F.log(pk / qk))
        # KL(p‖q) with the same eps floor — asymmetric by design: it
        # penalizes mass the partition has that the global lacks, the
        # direction that flags an over-represented kind in one shard
        kl_terms.append(pk * F.log(pk / qk))
    psi = sum(psi_terms[1:], psi_terms[0])
    kl = sum(kl_terms[1:], kl_terms[0])
    return joined.select("partition", psi.alias("psi"), kl.alias("kl"))


def drift_violations(docs: DataFrame, params: RuleParams | None = None) -> DataFrame:
    """D1: per-partition span-kind frequency must not drift from the
    global distribution — thresholded ``drift_scores`` projected into
    violation rows. PSI is always enforced (psi > psi_threshold); KL is
    additionally enforced when ``params.kl_threshold`` is set (the
    north-star names both metrics). One violation row per partition
    regardless of which metric(s) fired; the message names each."""
    p = params or RuleParams()
    scored = drift_scores(docs, p)
    fired = F.col("psi") > p.psi_threshold
    msg = F.concat(
        F.lit("PSI "), F.round("psi", 6).cast("string"), F.lit(f" > {p.psi_threshold}")
    )
    if p.kl_threshold is not None:
        kl_fired = F.col("kl") > p.kl_threshold
        kl_msg = F.concat(
            F.lit("KL "), F.round("kl", 6).cast("string"), F.lit(f" > {p.kl_threshold}")
        )
        msg = F.concat_ws(
            "; ",
            F.when(fired, msg),
            F.when(kl_fired, kl_msg),
        )
        fired = fired | kl_fired
    return scored.filter(fired).select(
        "partition",
        F.lit(None).cast("string").alias("doc_id"),
        F.lit("D1").alias("rule_id"),
        F.lit(ErrorKind.DRIFT_EXCEEDED).alias("kind"),
        F.lit(None).cast("int").alias("span_pos"),
        F.lit(None).cast("long").alias("offset"),
        F.lit(None).cast("int").alias("line"),
        F.lit(None).cast("int").alias("col"),
        msg.alias("message"),
    )


def functional_dependency_violations(
    df: DataFrame,
    determinant: str | list[str],
    dependent: str,
    max_examples: int = 8,
) -> DataFrame:
    """F1: functional-dependency check X → Y — every determinant value
    must map to exactly ONE dependent value (catalog consistency: the
    same ``media_ref`` must always carry the same ``media_kind``; the
    same source the same license tag, …). Generalizes the reference's
    duplicate-key rule (a TOML/YAML table is the degenerate case where
    X is the key path and Y its value — ``map.rs`` keeps last-write and
    zParse flags the re-assignment) from one document's key space to a
    whole table's column space.

    Returns one row per violating determinant value: the determinant
    column(s), ``n_variants`` (exact distinct-Y count) and ``variants``
    (the first ``max_examples`` distinct Y values, sorted, joined with
    ','). Null Y values are ignored (profile contract, like null_rate);
    null X groups are skipped (SQL GROUP BY would keep them, but a null
    determinant cannot "determine" anything — documented divergence).

    Scale shape (100 TB): NO unbounded per-key state anywhere —
    1. distinct (X, Y) pairs: the only full-data shuffle, map-side
       partial distinct, volume = distinct pairs not rows;
    2. exact variant counts: groupBy(X) over the distinct-pair table;
    3. example values: row_number window over the pairs SEMI-JOINED to
       the violating keys first — the window input is violation-sparse,
       and the collect_list after ``rk <= max_examples`` holds at most
       ``max_examples`` elements per key regardless of how pathological
       a key is (a collect_set in the count pass would buffer ALL
       variants of a hot key — the OOM this shape exists to avoid).
    """
    xs = [determinant] if isinstance(determinant, str) else list(determinant)
    # dependent cast to string in the initial projection: the variants
    # reassembly (array_join over array_sort(collect_list)) requires
    # array<string>, and Y is advertised as any atomic type (license
    # tags, int codes, …) — without the cast a non-string Y fails at
    # analysis time. Null check runs BEFORE the cast semantics matter:
    # cast preserves nullness for atomic types.
    pairs = (
        df.select(*[F.col(c) for c in xs], F.col(dependent).cast("string").alias("_y"))
        .filter(F.col("_y").isNotNull())
        .na.drop(subset=xs)
        .distinct()
    )
    counts = (
        pairs.groupBy(*xs)
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .filter(F.col("n_variants") > 1)
    )
    from pyspark.sql import Window

    sparse = pairs.join(counts.select(*xs), xs, "left_semi")
    w = Window.partitionBy(*xs).orderBy(F.col("_y").asc())
    examples = (
        sparse.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_examples)
        .groupBy(*xs)
        .agg(
            F.array_join(F.array_sort(F.collect_list("_y")), ",").alias("variants")
        )
    )
    return counts.join(examples, xs).select(*xs, "n_variants", "variants")


def conditional_fd_violations(
    df: DataFrame,
    condition,
    determinant: str | list[str],
    dependent: str,
    max_examples: int = 8,
) -> DataFrame:
    """Conditional functional dependency (Bohannon et al.'s CFD — the
    standard strengthening of X31's FD in the data-quality literature):
    X → Y must hold only on the rows satisfying ``condition``. The real
    catalogs FDs describe are usually conditional — "within source
    'wiki', every domain has one license tag" holds where the global
    domain → license FD is legitimately violated by other sources —
    so a global FD either misses the rule (never checked) or drowns in
    false positives (checked everywhere). ``condition`` is a Column or
    SQL boolean string.

    Semantics: exactly ``functional_dependency_violations`` on
    σ_condition(df) — rows where the condition is NULL are outside the
    scope, matching SQL WHERE. The filter lands BEFORE the distinct-
    pair shuffle, so the only full-data cost is the (pushed-down)
    predicate scan: at 100 TB a selective condition makes the CFD
    strictly cheaper than the global FD it refines.
    """
    pred = F.expr(condition) if isinstance(condition, str) else condition
    return functional_dependency_violations(
        df.filter(pred), determinant, dependent, max_examples
    )


def media_kind_consistency_violations(
    docs: DataFrame, max_examples: int = 4
) -> DataFrame:
    """F1: the same ``media_ref`` must be referenced with the same span
    kind everywhere in the table — a ref that one document embeds as
    ``image`` and another as ``audio`` means the catalog entry and at
    least one referent disagree about what the asset IS. The span-level
    application of ``functional_dependency_violations`` (X31), attributed
    back to every offending occurrence so the output keys by
    (partition, doc_id, rule_id) like every other rule.

    Scale shape mirrors R1's 'distinct' strategy: nested-pruned
    projection of (media_ref, kind, offset) only — no text bytes through
    the scan — then the FD core runs on distinct (ref, kind) pairs and
    the violating-ref set (violation-sparse, carries the preformatted
    variant list) broadcasts back onto the occurrence stream map-only.
    line/col are null by design: deriving them would drag every text
    byte through this branch's scan (same trade as R1).
    """
    zipped = F.arrays_zip(
        F.col("spans.media_ref").alias("media_ref"),
        F.col("spans.kind").alias("kind"),
        F.col("spans.offset").alias("offset"),
    )
    occ = (
        docs.select("partition", "doc_id", F.posexplode(zipped).alias("span_pos", "x"))
        .filter(F.col("x.media_ref").isNotNull())
        .select(
            "partition",
            "doc_id",
            F.col("span_pos").cast("int").alias("span_pos"),
            F.col("x.offset").cast("long").alias("offset"),
            F.col("x.media_ref").alias("media_ref"),
            F.col("x.kind").alias("kind"),
        )
    )
    bad = functional_dependency_violations(
        occ, "media_ref", "kind", max_examples=max_examples
    )
    return occ.join(F.broadcast(bad), "media_ref").select(
        "partition",
        "doc_id",
        F.lit("F1").alias("rule_id"),
        F.lit(ErrorKind.INCONSISTENT_MEDIA_KIND).alias("kind"),
        "span_pos",
        "offset",
        F.lit(None).cast("int").alias("line"),
        F.lit(None).cast("int").alias("col"),
        F.concat(
            F.lit("inconsistent media kind: "),
            F.col("media_ref"),
            F.lit(" -> "),
            F.col("variants"),
        ).alias("message"),
    )


# --------------------------------------------------------------------------
# declarative CHECK constraints (K-rules) — user-supplied SQL predicates
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class CheckConstraint:
    """A user-declared CHECK constraint: a boolean Spark-SQL expression a
    row must satisfy, SQL-standard semantics (NULL result PASSES — only a
    definite FALSE is a violation, exactly like ``CHECK`` in ANSI SQL).

    This is the open end of the rule pack: the built-in S/U/R/D/M/F rules
    are the reference's closed error enum (error.rs:48-64) lifted to
    tables, while CheckConstraints let a user bolt domain rules onto the
    same engine — same violation schema, same verdict grid, same
    rules_hash/resume discipline — without touching engine code. The
    predicate compiles via ``F.expr`` into the same whole-stage-codegen
    map stage as the built-in rules: declarative in, Catalyst out, no
    Python anywhere.

    ``level``:
      'doc'  — predicate over one document row; columns in scope:
               ``doc_id, partition, spans, n_spans, total_text_bytes``
               (the latter two derived, so common limits need no lambdas).
      'span' — predicate over one exploded span occurrence; in scope:
               ``doc_id, partition, span_pos, kind, text, media_ref,
               offset, n_spans``.
    """

    rule_id: str
    level: str  # 'doc' | 'span'
    predicate: str
    description: str = ""


_RESERVED_RULE_IDS = frozenset(
    {"S1", "S2", "S3", "S4", "S5", "S6", "S7", "S8", "U1", "R1", "D1", "M1", "F1"}
)


def _validate_checks(checks: tuple[CheckConstraint, ...] | list[CheckConstraint]) -> None:
    seen: set[str] = set()
    for c in checks:
        if c.level not in ("doc", "span"):
            raise ValueError(f"CheckConstraint {c.rule_id!r}: level must be 'doc' or 'span', got {c.level!r}")
        if c.rule_id in _RESERVED_RULE_IDS:
            raise ValueError(f"CheckConstraint rule_id {c.rule_id!r} collides with a built-in rule")
        if c.rule_id in seen:
            raise ValueError(f"duplicate CheckConstraint rule_id {c.rule_id!r}")
        seen.add(c.rule_id)


def check_constraint_violations(
    docs: DataFrame, checks: tuple[CheckConstraint, ...] | list[CheckConstraint]
) -> DataFrame:
    """Evaluate user CHECK constraints → violation rows.

    Scale shape: pure map stages — no Exchange, no Python — and ONE
    scan per level, not one per constraint: all k predicates of a level
    are evaluated as a per-row array of failing rule indices which is
    then exploded (the same project-array-then-explode shape the S-pack
    uses), so k span checks share one posexplode + one Generate and k
    doc checks share one derived-scalar projection (``total_text_bytes``
    computed once, not k times). A union of k filtered branches was the
    first implementation — each branch re-ran its own scan/explode,
    which is exactly the k-scan cost this formulation avoids.

    A FALSE predicate emits a violation row; NULL passes (ANSI CHECK),
    so authors write ``x IS NOT NULL AND <cond>`` when null itself
    should violate.

    line/col are null by design: a user predicate has no single text
    position; span-level rows carry (span_pos, offset) like R1/F1.
    """
    _validate_checks(checks)
    doc_checks = [c for c in checks if c.level == "doc"]
    span_checks = [c for c in checks if c.level == "span"]
    parts: list[DataFrame] = []

    def _fails(cs: list[CheckConstraint]):
        # per-row array of the indices whose predicate is definite FALSE
        return F.filter(
            F.array(*[
                F.when(~F.coalesce(F.expr(c.predicate), F.lit(True)), F.lit(i)).otherwise(
                    F.lit(None).cast("int")
                )
                for i, c in enumerate(cs)
            ]),
            lambda x: x.isNotNull(),
        )

    def _attrs(cs: list[CheckConstraint], idx: Column):
        # rule_id / message literals selected by the failing index —
        # element_at is 1-based
        rid = F.element_at(F.array(*[F.lit(c.rule_id) for c in cs]), idx + 1)
        msg = F.element_at(
            F.array(*[F.lit(f"check failed: {c.description or c.predicate}") for c in cs]),
            idx + 1,
        )
        return rid, msg

    def _rows(base: DataFrame, cs: list[CheckConstraint], span_pos, offset) -> DataFrame:
        ex = base.select(
            "partition", "doc_id",
            *( [span_pos.cast("int").alias("_sp"), offset.cast("long").alias("_off")] ),
            F.explode(_fails(cs)).alias("_ci"),
        )
        rid, msg = _attrs(cs, F.col("_ci"))
        return ex.select(
            "partition",
            "doc_id",
            rid.alias("rule_id"),
            F.lit(ErrorKind.CHECK_FAILED).alias("kind"),
            F.col("_sp").alias("span_pos"),
            F.col("_off").alias("offset"),
            F.lit(None).cast("int").alias("line"),
            F.lit(None).cast("int").alias("col"),
            msg.alias("message"),
        )

    if doc_checks:
        spans = F.coalesce(F.col("spans"), F.array())
        base = docs.select(
            "partition",
            "doc_id",
            "spans",
            F.size(F.col("spans")).alias("n_spans"),  # null spans -> null (predicate sees SQL null)
            F.aggregate(
                spans,
                F.lit(0).cast("long"),
                lambda a, s: a + F.coalesce(F.octet_length(s["text"]), F.lit(0)),
            ).alias("total_text_bytes"),
        )
        parts.append(_rows(base, doc_checks, F.lit(None).cast("int"), F.lit(None).cast("long")))

    if span_checks:
        ex = docs.select(
            "partition",
            "doc_id",
            F.size(F.col("spans")).alias("n_spans"),
            F.posexplode(F.col("spans")).alias("span_pos", "s"),
        ).select(
            "partition",
            "doc_id",
            "n_spans",
            F.col("span_pos").cast("int").alias("span_pos"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").cast("long").alias("offset"),
        )
        parts.append(_rows(ex, span_checks, F.col("span_pos"), F.col("offset")))

    if not parts:
        from zparse_spark.schema import VIOLATION_SCHEMA

        return docs.sparkSession.createDataFrame([], VIOLATION_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def aggregate_reconciliation(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    child_value,
    parent_value: str,
    rel_tol: float = 0.0,
    abs_tol: float = 0.0,
) -> DataFrame:
    """Parent↔child aggregate reconciliation (K-rule family member the
    CHECK predicates can't express — it needs a cross-table aggregate):
    does the parent's stored summary column equal the aggregate of its
    child rows within tolerance?  The classic instance is a fact/summary
    ledger check: ``orders.o_totalprice`` vs
    ``sum(l_extendedprice·(1−l_discount)·(1+l_tax))`` of the order's
    lineitems.  The reference validates one document's internal
    consistency (e.g. declared sizes vs actual, json/parser.rs:127-136);
    this is the table-level generalization where "declared" lives in a
    different table than "actual".

    ``child_value`` is a Column aggregate expression evaluated under
    ``child.groupBy(child_key)``.  Returns ONLY violating keys:
    (key, child_value, parent_value, abs_err, rel_err) with
    |child−parent| > abs_tol + rel_tol·|parent|.  Keys missing from
    either side are R1's job (referential), not a tolerance violation —
    the inner join drops them by design.

    Cross-engine determinism contract: child_value is rounded to 2
    decimals BEFORE the error/threshold math, so the keep-set and every
    emitted value derive from the identical rounded double in Spark and
    the SQL twin (raw float-sum last-ulp drift cannot flip the verdict
    unless the true value sits within ~1e-13 of a rounding boundary).

    Scale shape (100 TB): the child aggregate is ONE shuffle with
    map-side combine (partial sums), reducing the child to parent
    cardinality; the join is then key-to-key SMJ (or broadcast under
    AQE when the violating side is small) — never a row-level child ×
    parent join.  Output is violation-sparse.  No Python anywhere.
    """
    agg = child.groupBy(F.col(child_key).alias("key")).agg(
        F.round(child_value, 2).alias("child_value")
    )
    par = parent.select(
        F.col(parent_key).alias("key"),
        F.col(parent_value).cast("double").alias("parent_value"),
    )
    j = agg.join(par, "key", "inner")
    abs_err = F.abs(F.col("child_value") - F.col("parent_value"))
    return (
        j.filter(
            abs_err
            > F.lit(abs_tol) + F.lit(rel_tol) * F.abs(F.col("parent_value"))
        )
        .select(
            "key",
            "child_value",
            F.round("parent_value", 2).alias("parent_value"),
            F.round(abs_err, 2).alias("abs_err"),
            F.round(
                abs_err / F.nullif(F.abs(F.col("parent_value")), F.lit(0.0)), 6
            ).alias("rel_err"),
        )
    )


def fd_confidence(
    df: DataFrame,
    determinant: str,
    dependent: str,
    min_confidence: float = 0.99,
) -> DataFrame:
    """Approximate functional dependency X → Y: for each determinant
    value, confidence = count of the MAJORITY dependent value / group
    size (TANE's g3-style measure).  ``functional_dependency_violations``
    enumerates every violating pair for an FD that must hold exactly;
    this is the profiling companion for FDs that mostly hold ("same
    source ⇒ same lang, 99% of the time") — it returns the determinant
    groups BELOW ``min_confidence`` with their majority value, so the
    output names what the exception looks like, not just that one
    exists.

    Ties for majority break to the MIN dependent string (deterministic
    cross-engine).  NULL determinants are skipped (no identity to
    check); NULL dependents count as the string 'NULL' — a determinant
    that maps to null half the time is a real inconsistency.

    Scale shape (100 TB): groupBy(X, Y) with map-side combine reduces
    to the distinct-pair table; the majority pick and confidence are a
    window + filter on that reduced table (bounded by distinct pairs,
    not rows); output is violation-sparse.
    """
    from pyspark.sql import Window

    pairs = (
        df.filter(F.col(determinant).isNotNull())
        .select(
            F.col(determinant).cast("string").alias("x"),
            F.coalesce(F.col(dependent).cast("string"), F.lit("NULL")).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    w = Window.partitionBy("x")
    wr = Window.partitionBy("x").orderBy(F.col("n_xy").desc(), F.col("y").asc())
    g = (
        pairs.withColumn("n_x", F.sum("n_xy").over(w))
        .withColumn("n_variants", F.count(F.lit(1)).over(w))
        .withColumn("_rk", F.row_number().over(wr))
    )
    return (
        g.filter(F.col("_rk") == 1)
        .select(
            F.col("x").alias("determinant"),
            F.col("y").alias("majority_value"),
            F.col("n_xy").alias("majority_count"),
            F.col("n_x").alias("group_count"),
            F.col("n_variants").alias("n_variants"),
            F.round(F.col("n_xy") / F.col("n_x"), 6).alias("confidence"),
        )
        .filter(F.col("confidence") < F.lit(min_confidence))
    )


def transition_violations(
    events: DataFrame,
    allowed: list[tuple[str, str]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Sequence-constraint validation: within each user's event stream
    (ordered by time, ties broken by ``tiebreak_col`` so the order —
    and therefore the violation set — is deterministic under any
    partitioning), every consecutive (prev → next) event-type pair must
    be in the ``allowed`` set; a user's first event is unconstrained.
    The state-machine generalization of the monotonicity window checks
    — the reference's parser-state legality (json/parser.rs state
    transitions) lifted to event tables.

    Scale shape: ONE shuffle on ``user_col`` for the lag window (the
    same partitioning sessionization uses — share it when composing);
    the allowed set is a literal array in the plan (codegen `IN`),
    sized for hand-curated machines (10s-100s of pairs), never a join.
    """
    from pyspark.sql import Window

    pair_lits = F.array(*[F.lit(f"{a}\x1f{b}") for a, b in allowed])
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    prev = F.lag(type_col).over(w)
    # pair is built from the materialized column, not the window expr —
    # a window function may not appear inside a WHERE clause
    pair = F.concat_ws("\x1f", F.col("_prev_type"), F.col(type_col))
    return (
        events.withColumn("_prev_type", prev)
        .filter(F.col("_prev_type").isNotNull() & ~F.array_contains(pair_lits, pair))
        .select(
            user_col,
            tiebreak_col,
            ts_col,
            F.col("_prev_type").alias("prev_type"),
            type_col,
        )
    )


def rule_cooccurrence(violations: DataFrame, n_docs: int | None = None) -> DataFrame:
    """Which rules fire TOGETHER on the same document — the X92
    discipline (missingness co-occurrence) applied to the violation
    table itself: correlated rules mean one root cause (a producer
    emitting truncated docs trips S2+S4+R1 at once), and triage wants
    the failure DOMAIN, not len(rules) separate tickets. ``lift``
    (vs independence over the n_docs universe, when given) and
    ``jaccard`` of the per-rule doc sets quantify it; pairs are
    emitted for every rule pair observed on ≥1 common doc.

    Scale shape: violations reduce to the distinct (partition, doc_id,
    rule_id) table first — violation rows per doc can be huge, the
    distinct is grid-bounded per doc by the rule count; the pair
    self-join keys on the doc (per-doc fan-out ≤ rules², a constant);
    per-rule doc counts ride one more groupBy on the reduced table.
    """
    d = violations.select("partition", "doc_id", "rule_id").distinct()
    per_rule = d.groupBy("rule_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.partition").eqNullSafe(F.col("b.partition")))
            & (F.col("a.doc_id").eqNullSafe(F.col("b.doc_id")))
            & (F.col("a.rule_id") < F.col("b.rule_id")),
        )
        .groupBy(
            F.col("a.rule_id").alias("rule_a"), F.col("b.rule_id").alias("rule_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    out = (
        pairs.join(per_rule.withColumnRenamed("rule_id", "rule_a"), "rule_a")
        .withColumnRenamed("n", "n_a")
        .join(per_rule.withColumnRenamed("rule_id", "rule_b"), "rule_b")
        .withColumnRenamed("n", "n_b")
    )
    uni = F.col("n_a") + F.col("n_b") - F.col("n_both")
    sel = [
        "rule_a",
        "rule_b",
        "n_a",
        "n_b",
        "n_both",
        F.when(uni > 0, F.round(F.col("n_both") / uni, 6)).alias("jaccard"),
    ]
    if n_docs is not None:
        sel.append(
            F.when(
                (F.col("n_a") * F.col("n_b")) > 0,
                F.round(F.col("n_both") * F.lit(int(n_docs)) / (F.col("n_a") * F.col("n_b")), 6),
            ).alias("lift")
        )
    return out.select(*sel)


def cross_table_check_violations(
    fact: DataFrame,
    ref: DataFrame,
    on: list[str],
    predicate: str,
    rule_id: str,
    fact_cols: list[str],
    detail: Column | None = None,
    strategy: str = "auto",
    on_missing: str = "pass",
) -> DataFrame:
    """K-rule CHECK constraints across a JOIN: evaluate ``predicate``
    (a SQL boolean over fact ∪ ref columns) on each fact row joined to
    its reference row, and emit a violation row per definite-FALSE
    (ANSI CHECK: NULL passes — including every column the predicate
    reads on a fact row with NO reference match, unless
    ``on_missing='violate'``, which emits a row for unmatched facts;
    dangling keys as such are R1/referential_violations' job).

    Output: ``fact_cols + [rule_id, detail]`` (detail NULL unless
    given).

    Scale shape: both sides are projected to exactly the columns the
    check reads BEFORE the join (explicit column pruning — ``ref`` may
    be a 400-column dimension; the join input is ``on`` + the predicate
    columns only). ``strategy='broadcast'`` forces a broadcast of the
    pruned reference, 'smj' leaves it to sort-merge, 'auto' lets
    AQE/Catalyst pick from the pruned size. The predicate itself is an
    F.expr map stage on the join output — one scan each side, one
    join, zero Python.

    Reference parity: the reference validates values against their
    SCHEMA context one document at a time (typed-value rules,
    toml/parser.rs, json/validator semantics); this is the relational
    lift — a row validated against its referenced row's values.
    """
    if on_missing not in ("pass", "violate"):
        raise ValueError(f"on_missing must be 'pass' or 'violate', got {on_missing!r}")
    if strategy not in ("auto", "broadcast", "smj"):
        raise ValueError(f"unknown strategy {strategy!r}")

    import re as _re

    pred_cols = set(_re.findall(r"[A-Za-z_][A-Za-z0-9_]*", predicate))
    fact_need = sorted(
        {c for c in fact.columns if c in pred_cols or c in fact_cols or c in on}
    )
    ref_need = sorted({c for c in ref.columns if c in pred_cols or c in on})
    f = fact.select(*fact_need)
    r = ref.select(*ref_need)
    if strategy == "broadcast":
        r = F.broadcast(r)
    elif strategy == "smj":
        r = r.hint("merge")

    # _matched marker: ref cols are NULL either way for unmatched
    # facts, so the predicate alone can't tell a missing ref from a
    # NULL ref value — the join marker can.
    joined = f.join(r.withColumn("_matched", F.lit(1)), on=on, how="left")
    fails = ~F.coalesce(F.expr(predicate), F.lit(True))
    if on_missing == "violate":
        fails = fails | F.col("_matched").isNull()
    out = joined.filter(fails).select(
        *fact_cols,
        F.lit(rule_id).alias("rule_id"),
        (detail if detail is not None else F.lit(None).cast("string")).alias("detail"),
    )
    return out


def asof_referential_violations(
    fact: DataFrame,
    fact_key: str,
    fact_ts: str,
    dim: DataFrame,
    dim_key: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    strategy: str = "broadcast",
) -> DataFrame:
    """Temporal (SCD2) referential integrity: every fact row must
    resolve to EXACTLY ONE dimension version whose half-open validity
    window ``[valid_from, valid_to)`` covers the fact's timestamp
    (``valid_to IS NULL`` = open-ended current version). Plain R1
    answers "does the key exist"; at web scale catalogs are versioned,
    and the three corruptions R1 cannot see are exactly the classes
    this emits:

    - ``unmatched_key`` — the key has no dimension rows at all;
    - ``no_valid_version`` — the key exists but no version covers the
      timestamp (a validity GAP: versions were retired or loaded with
      holes);
    - ``ambiguous_version`` — more than one version covers it (window
      OVERLAP: the exactly-once resolution every as-of join silently
      assumes is broken, and picking "the" version is load-order luck).

    Facts with a NULL key or NULL timestamp are out of scope (they
    belong to not-null checks, mirroring how SQL joins treat NULL keys)
    — documented, not silent: they simply cannot match any window.

    Output: one row per violating DISTINCT (key, ts) pair —
    ``(key:string, ts, n_facts, n_versions, violation)`` where
    ``n_facts`` is how many fact rows share the pair and ``n_versions``
    how many windows covered it (0 for gaps, ≥2 for overlaps).

    Scale shape (100 TB facts, versioned catalog): the fact side is
    first reduced to DISTINCT (key, ts) with a map-side-combined count
    — the only fact-sized shuffle, and it's the same reduction an as-of
    join would pay. The dimension joins that reduced table on the key
    equi-condition with the window predicate evaluated in codegen;
    ``strategy='broadcast'`` (default — catalogs are small next to
    facts) makes the whole check exchange-free past the reduction,
    ``'smj'`` hints sort-merge for a dimension too big to ship.
    Per-pair version counting is a second groupBy on the already
    distinct-pair-sized table. Reference parity: generalizes the R1
    dangling-ref contract (convert.rs media_ref lookups) to versioned
    catalogs; exactly-once resolution mirrors the parser's duplicate-key
    rejection (toml/parser.rs:88-122) lifted to time windows.
    """
    if strategy not in ("broadcast", "smj"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    pairs = (
        fact.select(
            F.col(fact_key).cast("string").alias("key"),
            F.col(fact_ts).alias("ts"),
        )
        .filter(F.col("key").isNotNull() & F.col("ts").isNotNull())
        .groupBy("key", "ts")
        .agg(F.count(F.lit(1)).alias("n_facts"))
    )
    d = dim.select(
        F.col(dim_key).cast("string").alias("key"),
        F.col(valid_from).alias("_vf"),
        F.col(valid_to).alias("_vt"),
    )
    if strategy == "broadcast":
        d = F.broadcast(d)
    else:
        d = d.hint("merge")
    covers = (F.col("_vf") <= F.col("ts")) & (
        F.col("_vt").isNull() | (F.col("ts") < F.col("_vt"))
    )
    joined = pairs.join(d, "key", "left")
    resolved = joined.groupBy("key", "ts", "n_facts").agg(
        F.max(F.col("_vf").isNotNull().cast("int")).alias("_key_exists"),
        F.sum(covers.cast("int")).alias("_n_cover"),
    )
    return (
        resolved.withColumn(
            "violation",
            F.when(F.col("_key_exists") == 0, F.lit("unmatched_key"))
            .when(F.coalesce(F.col("_n_cover"), F.lit(0)) == 0, F.lit("no_valid_version"))
            .when(F.col("_n_cover") > 1, F.lit("ambiguous_version")),
        )
        .filter(F.col("violation").isNotNull())
        .select(
            "key",
            "ts",
            "n_facts",
            F.coalesce(F.col("_n_cover"), F.lit(0)).cast("bigint").alias("n_versions"),
            "violation",
        )
    )


def violation_exemplars(
    violations: DataFrame,
    n: int = 3,
    keys: tuple[str, ...] = ("partition", "rule_id"),
) -> DataFrame:
    """X136: bounded, DETERMINISTIC exemplar violations per group — the
    report surface between "show me the count" (partition_verdicts) and
    "dump every row" (violations): each (partition, rule) cell keeps its
    total plus at most ``n`` concrete example rows a human can read.

    Exemplar choice is a pure function of the data, never of partitioning
    or arrival order: rows rank by md5(doc_id ':' span_pos) — the same
    engine-portable sampler as hash_sample — with (doc_id, span_pos,
    message) tiebreak, so re-runs, resumed jobs, and the DuckDB twin
    select the IDENTICAL exemplars (a LIMIT-per-group would be
    nondeterministic under Spark's unordered shuffles).

    Scale shape: ONE window partitioned by the group keys (never a
    global sort; the heavy (partition, rule) cells are exactly the ones
    the engine already shuffles for verdicts), count rides the same
    window frame, and the <=n filter drops everything else before any
    collect. At 10^12 docs the output is |partitions| x |rules| x n rows
    — constant-bounded, safe to sink or broadcast into a report.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws(
            ":",
            F.col("doc_id"),
            F.coalesce(F.col("span_pos").cast("string"), F.lit("-1")),
        )
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        h.asc(),
        F.col("doc_id").asc(),
        F.coalesce(F.col("span_pos"), F.lit(-1)).asc(),
        F.col("message").asc(),
    )
    wc = Window.partitionBy(*[F.col(k) for k in keys])
    return (
        violations.withColumn("exemplar_rank", F.row_number().over(w))
        .withColumn("n_total", F.count(F.lit(1)).over(wc))
        .filter(F.col("exemplar_rank") <= n)
    )


def media_refcounts(
    docs: DataFrame,
    catalog: DataFrame,
    spans_col: str = "spans",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Reverse referential check: reference counts per CATALOG entry,
    zero meaning orphan — R1 asks "does every span's media_ref exist?";
    this asks the storage question "does every catalog payload still
    have a referent?" (GC candidates, the audit an Iceberg
    expire/cleanup pass needs before deleting blobs).

    Scale shape: the doc side collapses FIRST — explode spans, filter
    non-null refs, ONE map-side-combined groupBy(ref) whose output is
    bounded by |catalog|, never by corpus size; the catalog then LEFT
    joins that compact count table (orphans keep n_refs = 0). The
    corpus is scanned once; nothing doc-sized ever shuffles twice.
    """
    refs = (
        docs.select(F.explode(spans_col).alias("_s"))
        .select(F.col(f"_s.{ref_col}").alias(ref_col))
        .filter(F.col(ref_col).isNotNull())
        .groupBy(ref_col)
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
    return (
        catalog.select(ref_col)
        .distinct()
        .join(refs, ref_col, "left")
        .select(ref_col, F.coalesce(F.col("n_refs"), F.lit(0)).alias("n_refs"))
    )


def orphan_media(
    docs: DataFrame,
    catalog: DataFrame,
    spans_col: str = "spans",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Catalog entries no span references (n_refs = 0): the deletion
    shortlist. See ``media_refcounts`` for the plan shape."""
    return (
        media_refcounts(docs, catalog, spans_col, ref_col)
        .filter(F.col("n_refs") == 0)
        .select(ref_col)
    )
