"""The rule pack: zParse's strict-parser contract, table-scale.

Every *span/doc-level* rule compiles to pure JVM column expressions built
from Spark higher-order functions (``transform``/``filter``/``aggregate``
with index lambdas) over the ``spans`` array. That choice is the central
scale decision of the engine:

- **No explode of the full span set.** A naive design posexplodes every
  span (10^12 docs × ~10 spans → 10^13 rows through a shuffle). Here each
  document computes its own violation array in-place inside whole-stage
  codegen; only *violations* (sparse) are ever exploded.
- **No Python.** The escape/unicode/control-char grammars from the
  reference lexer (crates/zparse/src/lexer/json.rs:86-262) are compiled
  to Java regexes evaluated JVM-side. A vectorized Arrow pandas_udf
  fallback exists in ``zparse_spark.functions.text`` for grammars regex
  can't express, but the default pack never leaves the JVM.

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
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

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
    psi_threshold: float = 0.25
    # probability floor for PSI's zero buckets; 1e-4 keeps a kind that is
    # merely absent-by-chance in a small partition from exploding the score
    drift_epsilon: float = 1e-4


# --------------------------------------------------------------------------
# violation-item constructors
# --------------------------------------------------------------------------


def _viol(rule_id: str, kind: str, span_pos: Column, offset: Column, message: Column) -> Column:
    return F.struct(
        F.lit(rule_id).alias("rule_id"),
        F.lit(kind).alias("kind"),
        span_pos.cast("int").alias("span_pos"),
        offset.cast("long").alias("offset"),
        message.cast("string").alias("message"),
    )


def _indexed(spans: Column) -> Column:
    """spans → array<struct<s,i>> so filters can carry the span position
    (the engine's Pos analog, FIXTURES.md position contract)."""
    return F.transform(spans, lambda s, i: F.struct(s.alias("s"), i.alias("i")))


def _span_rule(
    indexed: Column, rule_id: str, kind: str, pred: Callable[[Column, Column], Column], msg: Callable[[Column, Column], Column]
) -> Column:
    """Generic span-level rule over a pre-built indexed span array: keep
    spans where ``pred(span, idx)`` is true, project each to a violation
    item. Entirely JVM-side. ``indexed`` is materialized ONCE per row by
    the caller so the 6 span rules share it instead of re-transforming
    the spans array 6 times."""
    bad = F.filter(indexed, lambda x: F.coalesce(pred(x["s"], x["i"]), F.lit(False)))
    return F.transform(
        bad, lambda x: _viol(rule_id, kind, x["i"], x["s"]["offset"], msg(x["s"], x["i"]))
    )


# --------------------------------------------------------------------------
# span-level rules S1..S8
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
# \u not followed by 4 hex digits, or a lone surrogate: high surrogate
# \uD800-\uDBFF must be followed by a low surrogate \uDC00-\uDFFF, and a
# low surrogate must be preceded by a high one (lexer/json.rs:220-262)
_BAD_UNICODE = (
    "\\\\u(?![0-9a-fA-F]{4})"  # malformed hex
    "|\\\\u[dD][89abAB][0-9a-fA-F]{2}(?!\\\\u[dD][c-fC-F][0-9a-fA-F]{2})"  # lone high
    "|(?<!\\\\u[dD][89abAB][0-9a-fA-F]{2})\\\\u[dD][c-fC-F][0-9a-fA-F]{2}"  # lone low
)


def build_span_rule_columns(
    spans: Column, p: RuleParams, indexed: Column | None = None
) -> list[Column]:
    """All span/doc-level rule arrays for one document row.

    Pass ``indexed`` (a pre-materialized ``_indexed(spans)`` column) so
    the six span rules share one indexed array instead of rebuilding it.
    """
    domain = F.array(*[F.lit(k) for k in p.kind_domain])
    idx = indexed if indexed is not None else _indexed(spans)

    def _s1_regressed(s, i):
        prev = F.element_at(spans, i.cast("int"))["offset"]
        return s["offset"] < prev if p.allow_equal_offsets else s["offset"] <= prev

    s1 = _span_rule(
        idx,
        "S1",
        ErrorKind.INVALID_ARRAY,
        # offset must be strictly increasing (non-decreasing in lenient
        # mode); element_at is 1-based so element_at(spans, i) is the
        # *previous* span for 0-based i >= 1
        lambda s, i: (i >= 1) & _s1_regressed(s, i),
        lambda s, i: F.concat(
            F.lit("offset regression: "),
            s["offset"].cast("string"),
            F.lit(" <= prev "),
            F.element_at(spans, i.cast("int"))["offset"].cast("string"),
        ),
    )
    s2 = _span_rule(
        idx,
        "S2",
        ErrorKind.INVALID_TOKEN,
        lambda s, i: s["kind"].isNull() | ~F.array_contains(domain, s["kind"]),
        lambda s, i: F.concat(F.lit("kind not in domain: "), F.coalesce(s["kind"], F.lit("<null>"))),
    )
    s5 = _span_rule(
        idx,
        "S5",
        ErrorKind.INVALID_TOKEN,
        lambda s, i: s["text"].rlike(_CONTROL_CHARS),
        lambda s, i: F.lit("control character in text"),
    )
    s6 = _span_rule(
        idx,
        "S6",
        ErrorKind.INVALID_ESCAPE_SEQUENCE,
        lambda s, i: s["text"].isNotNull() & ~s["text"].rlike(_VALID_ESCAPES),
        lambda s, i: F.lit("invalid escape sequence"),
    )
    s7 = _span_rule(
        idx,
        "S7",
        ErrorKind.INVALID_UNICODE_ESCAPE,
        lambda s, i: s["text"].rlike(_BAD_UNICODE),
        lambda s, i: F.lit("invalid unicode escape"),
    )
    s8 = _span_rule(
        idx,
        "S8",
        ErrorKind.EXPECTED,
        lambda s, i: ((s["kind"] == "text") & s["media_ref"].isNotNull())
        | ((s["kind"] != "text") & s["media_ref"].isNull()),
        lambda s, i: F.when(
            s["kind"] == "text", F.lit("expected media_ref=null for kind=text")
        ).otherwise(F.concat(F.lit("expected media_ref for kind="), s["kind"])),
    )

    # doc-level limits: span_pos/offset null (whole-document position),
    # matching the reference's error-at-opener-position semantics lifted
    # to "error at document".
    n_spans = F.coalesce(F.size(spans), F.lit(0))
    s3 = F.when(
        F.lit(p.max_spans > 0) & (n_spans > p.max_spans),
        F.array(
            _viol(
                "S3",
                ErrorKind.MAX_DEPTH_EXCEEDED,
                F.lit(None),
                F.lit(None),
                F.concat(F.lit("span count "), n_spans.cast("string"), F.lit(f" > max {p.max_spans}")),
            )
        ),
    ).otherwise(F.array().cast("array<struct<rule_id:string,kind:string,span_pos:int,offset:long,message:string>>"))

    total_bytes = F.aggregate(
        F.coalesce(spans, F.array()),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.octet_length(s["text"]), F.lit(0)),
    )
    s4 = F.when(
        F.lit(p.max_text_bytes > 0) & (total_bytes > p.max_text_bytes),
        F.array(
            _viol(
                "S4",
                ErrorKind.MAX_SIZE_EXCEEDED,
                F.lit(None),
                F.lit(None),
                F.concat(
                    F.lit("text bytes "), total_bytes.cast("string"), F.lit(f" > max {p.max_text_bytes}")
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<rule_id:string,kind:string,span_pos:int,offset:long,message:string>>"))

    return [s1, s2, s3, s4, s5, s6, s7, s8]


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

ALL_RULES = SPAN_RULES + TABLE_RULES


def span_rule_violations(docs: DataFrame, params: RuleParams | None = None) -> DataFrame:
    """Evaluate S1..S8 in ONE narrow map stage; explode only violations.

    Plan shape: Scan → Project(concat of 8 rule arrays) → Generate(explode
    of the sparse violation array) — no shuffle, full whole-stage codegen,
    predicate/column pruning reaches the parquet scan untouched.
    """
    p = params or RuleParams()
    viols = F.concat(*build_span_rule_columns(F.col("spans"), p))
    return (
        docs.select("partition", "doc_id", F.explode(viols).alias("v"))
        .select(
            "partition",
            "doc_id",
            F.col("v.rule_id").alias("rule_id"),
            F.col("v.kind").alias("kind"),
            F.col("v.span_pos").alias("span_pos"),
            F.col("v.offset").alias("offset"),
            F.col("v.message").alias("message"),
        )
    )


# --------------------------------------------------------------------------
# table-level rules
# --------------------------------------------------------------------------


def uniqueness_violations(docs: DataFrame, n_salts: int = 64) -> DataFrame:
    """U1: doc_id must be unique table-wide (DuplicateKey lifted from
    toml/parser.rs:918-924).

    Shuffle strategy: a two-phase salted count. Phase 1 aggregates
    ``(doc_id, salt)`` where salt is derived from the row's content, so a
    pathological hot key (FIXTURES.md plants one doc_id × 1000; at 10^12
    scale think ×10^8) spreads over ``n_salts`` reducers instead of
    melting one. Phase 2 sums the (tiny) per-salt partials. Plain
    ``groupBy(doc_id).count()`` is *mostly* fine thanks to map-side
    partial aggregation, but partial-agg hash maps degrade when a single
    task sees millions of distinct keys plus one hot key; the salt keeps
    phase-2 input bounded at ``n_salts`` rows per key regardless.

    Violations are emitted per duplicated *row* by joining the dup keys
    back (AQE broadcasts the dup-key side when small; skew-join splits
    otherwise).
    """
    # salt must not reference spans: that would drag the whole span
    # struct (all text bytes) through the scan — rand alone spreads the
    # hot key and lets the parquet reader prune to (doc_id, partition)
    salt = F.pmod(F.xxhash64(F.col("partition"), F.rand(seed=7)), F.lit(n_salts))
    partial = (
        docs.select("doc_id", salt.alias("_salt"))
        .groupBy("doc_id", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dups = partial.groupBy("doc_id").agg(F.sum("c").alias("n")).filter(F.col("n") > 1)
    return (
        docs.join(dups, "doc_id")
        .select(
            "partition",
            "doc_id",
            F.lit("U1").alias("rule_id"),
            F.lit(ErrorKind.DUPLICATE_KEY).alias("kind"),
            F.lit(None).cast("int").alias("span_pos"),
            F.lit(None).cast("long").alias("offset"),
            F.concat(F.lit("doc_id appears "), F.col("n").cast("string"), F.lit(" times")).alias(
                "message"
            ),
        )
    )


def referential_violations(
    docs: DataFrame, media_catalog: DataFrame, strategy: str = "auto"
) -> DataFrame:
    """R1: every non-null spans.media_ref must exist in the catalog
    (referential pairing generalizing xml/parser.rs:125-134).

    Scale shape: prune the array *before* exploding — only media spans
    (sparse) are generated, so the explode output is a fraction of total
    spans. The anti-join is broadcast when the catalog fits
    (``strategy='broadcast'`` forces it; 'auto' lets AQE decide; 'smj'
    hints shuffle merge for a catalog too big to broadcast).
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
    dangling = refs.join(cat, "media_ref", "left_anti")
    return dangling.select(
        "partition",
        "doc_id",
        F.lit("R1").alias("rule_id"),
        F.lit(ErrorKind.DANGLING_MEDIA_REF).alias("kind"),
        "span_pos",
        "offset",
        F.concat(F.lit("dangling media_ref: "), F.col("media_ref")).alias("message"),
    )


def drift_violations(docs: DataFrame, params: RuleParams | None = None) -> DataFrame:
    """D1: per-partition span-kind frequency must not drift from the
    global distribution (PSI ≤ threshold) — pure column math, two small
    aggregates over pre-shrunk per-doc kind counts.

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
    for k in kind_domain:
        pk = F.col(f"c_{k}") / F.col("_tot") + eps
        qk = F.col(f"g_{k}") / F.col("g_tot") + eps
        psi_terms.append((pk - qk) * F.log(pk / qk))
    psi = sum(psi_terms[1:], psi_terms[0])
    scored = joined.select("partition", psi.alias("psi"))
    return scored.filter(F.col("psi") > p.psi_threshold).select(
        "partition",
        F.lit(None).cast("string").alias("doc_id"),
        F.lit("D1").alias("rule_id"),
        F.lit(ErrorKind.DRIFT_EXCEEDED).alias("kind"),
        F.lit(None).cast("int").alias("span_pos"),
        F.lit(None).cast("long").alias("offset"),
        F.concat(F.lit("PSI "), F.round("psi", 6).cast("string"), F.lit(f" > {p.psi_threshold}")).alias(
            "message"
        ),
    )
