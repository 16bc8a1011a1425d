"""Span-pack oracle queries — the engine's OWN rule pack, DuckDB-gated.

Round 1's correctness gate only exercised a flat-table proxy
(``validate_documents_flat``); these queries run the real
``ValidationEngine`` over the interleaved span table and hand DuckDB an
UNNEST-based reimplementation of every rule to compare against — the
distributed analog of the reference's fixture-directory oracle
(/root/reference/crates/zparse/tests/fixtures_test.rs:5-37: every
valid/* parses, every invalid/* fails with the expected error).

Mechanics: the seed-pinned fixture corpus (plus one planted drift
partition) is persisted to parquet inside the query, so Spark and DuckDB
read byte-identical data; the driver always executes the Spark side
first, so the oracle sees the freshly persisted files. The rule regexes
are imported from the rule pack itself and are deliberately
lookaround-free, valid under both Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.rules import (
    _CONTROL_CHARS,
    _VALID_ESCAPES,
    _VALID_UNICODE,
    CheckConstraint,
    RuleParams,
    drift_scores,
)
from zparse_spark.plans.engine import ValidationConfig, ValidationEngine
from zparse_spark.queries import register
from zparse_spark.schema import SPAN_KIND_DOMAIN

_W = "/root/repo/spark-warehouse/oracle"
_MAX_SPANS = 128
# small enough that the fixture corpus's long tail (~5% of docs) trips
# S4 — with the reference default (10 MiB) the rule would never fire here
_MAX_BYTES = 256
_PSI_THRESHOLD = 0.25
_EPS = 1e-4

_PARAMS = RuleParams(max_spans=_MAX_SPANS, max_text_bytes=_MAX_BYTES)


_PACK_READY = False


def _pack_input(spark):
    """Persist the fixture corpus + media catalog; read both back from
    parquet so the engine runs on exactly the bytes the oracle reads.

    The extra ``pdrift`` partition holds media-stripped copies of every
    8th doc — an all-text kind distribution that D1 must flag.

    Generated ONCE per process: 13 span-pack queries share this fixture,
    and the dataset is a pure function of its pinned seed, so the 2nd..
    13th gate entries skip the ~8 s datagen+persist and just read the
    bytes the 1st one wrote (measured: ~90 s off the 85-query gate)."""
    global _PACK_READY
    if not _PACK_READY:
        from zparse_spark.sources.datagen import generate_documents, generate_media_catalog

        docs = generate_documents(spark, n_docs=2000, seed=42, n_partitions=8, n_media_refs=512)
        drift = docs.filter(F.col("doc_id").cast("long") % 8 == 0).select(
            F.concat(F.lit("drift_"), F.col("doc_id")).alias("doc_id"),
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")).alias("spans"),
            F.lit("pdrift").alias("partition"),
            F.col("_fixture_class"),
        )
        cat = generate_media_catalog(spark, 512)
        docs.unionByName(drift).write.mode("overwrite").parquet(f"{_W}/span_docs")
        cat.write.mode("overwrite").parquet(f"{_W}/span_catalog")
        _PACK_READY = True
    docs2 = spark.read.parquet(f"{_W}/span_docs").drop("_fixture_class")
    cat2 = spark.read.parquet(f"{_W}/span_catalog")
    return docs2, cat2


# ---------------------------------------------------------------------------
# oracle SQL builders — one rule, one UNION branch, shared CTE prologue
# ---------------------------------------------------------------------------

_DOMAIN_SQL = ", ".join(f"'{k}'" for k in SPAN_KIND_DOMAIN)

# exploded span frame with doc-level scalars riding along — the SQL twin
# of span_rule_violations' posexplode formulation. Parameterized by table
# dir so variant corpora (the S9 overlap plant) reuse the same prologue.
def _sp_cte(table: str = "span_docs", docs_where: str = "") -> str:
    return f"""
docs AS (SELECT doc_id, spans, partition FROM read_parquet('{_W}/{table}/*.parquet') {docs_where}),
cat AS (SELECT DISTINCT media_ref FROM read_parquet('{_W}/span_catalog/*.parquet')),
ex0 AS (
  SELECT partition, doc_id, spans,
         len(spans) AS n_spans,
         coalesce(list_sum(list_transform(spans, x -> strlen(coalesce(x.text, '')))), 0) AS total_bytes,
         unnest(spans) AS s,
         generate_subscripts(spans, 1) AS pos
  FROM docs
),
sp0 AS (
  SELECT partition, doc_id, n_spans, total_bytes,
         CAST(pos - 1 AS INT) AS span_pos,
         s.kind AS kind, s.text AS text, s.media_ref AS media_ref,
         CAST(s."offset" AS BIGINT) AS off,
         CAST(CASE WHEN pos > 1 THEN spans[pos - 1]."offset" END AS BIGINT) AS prev_off,
         -- previous span's extent end (offset + CHAR length of its text),
         -- the S9 overlap bound; length() is character count in DuckDB,
         -- matching Spark's F.length
         CAST(CASE WHEN pos > 1
                   THEN spans[pos - 1]."offset" + length(coalesce(spans[pos - 1].text, ''))
              END AS BIGINT) AS prev_end,
         -- canonical text before this span (concat of prior span texts);
         -- the [1:0] slice for the first span is NULL, hence the coalesce
         coalesce(
           array_to_string(list_transform(spans[1:pos - 1], x -> coalesce(x.text, '')), ''),
           '') AS prefix
  FROM ex0
),
sp AS (
  SELECT * EXCLUDE (prefix),
         CAST(1 + length(prefix) - length(replace(prefix, chr(10), '')) AS INT) AS line,
         CAST(CASE WHEN contains(prefix, chr(10))
                   THEN length(regexp_replace(prefix, '.*' || chr(10), '', 's'))
                   ELSE length(prefix) END + 1 AS INT) AS "col"
  FROM sp0
)"""


_SP_CTE = _sp_cte()

_NULL_LC = 'CAST(NULL AS INT) AS line, CAST(NULL AS INT) AS "col"'
_VIOL_CTE = f"""
viol AS (
  SELECT partition, doc_id, 'S1' AS rule_id, 'InvalidArray' AS kind,
         span_pos, off AS "offset", line, "col",
         'offset regression: ' || off || ' <= prev ' || prev_off AS message
  FROM sp WHERE span_pos >= 1 AND off <= prev_off
  UNION ALL
  SELECT partition, doc_id, 'S2', 'InvalidToken', span_pos, off, line, "col",
         'kind not in domain: ' || coalesce(kind, '<null>')
  FROM sp WHERE kind IS NULL OR kind NOT IN ({_DOMAIN_SQL})
  UNION ALL
  SELECT partition, doc_id, 'S5', 'InvalidToken', span_pos, off, line, "col",
         'control character in text'
  FROM sp WHERE regexp_matches(text, '{_CONTROL_CHARS}')
  UNION ALL
  SELECT partition, doc_id, 'S6', 'InvalidEscapeSequence', span_pos, off, line, "col",
         'invalid escape sequence'
  FROM sp WHERE contains(text, '\\') AND NOT regexp_matches(text, '{_VALID_ESCAPES}')
  UNION ALL
  SELECT partition, doc_id, 'S7', 'InvalidUnicodeEscape', span_pos, off, line, "col",
         'invalid unicode escape'
  FROM sp WHERE contains(text, '\\u') AND NOT regexp_matches(text, '{_VALID_UNICODE}')
  UNION ALL
  SELECT partition, doc_id, 'S8', 'Expected', span_pos, off, line, "col",
         CASE WHEN kind = 'text' THEN 'expected media_ref=null for kind=text'
              ELSE 'expected media_ref for kind=' || coalesce(kind, '<null>') END
  FROM sp WHERE (kind = 'text' AND media_ref IS NOT NULL)
             OR (kind <> 'text' AND media_ref IS NULL)
  UNION ALL
  SELECT partition, doc_id, 'R1', 'DanglingMediaRef', span_pos, off, {_NULL_LC},
         'dangling media_ref: ' || media_ref
  FROM sp WHERE media_ref IS NOT NULL AND media_ref NOT IN (SELECT media_ref FROM cat)
  UNION ALL
  SELECT partition, doc_id, 'S3', 'MaxDepthExceeded', CAST(NULL AS INT), CAST(NULL AS BIGINT),
         {_NULL_LC}, 'span count ' || n_spans || ' > max {_MAX_SPANS}'
  FROM sp WHERE span_pos = 0 AND n_spans > {_MAX_SPANS}
  UNION ALL
  SELECT partition, doc_id, 'S4', 'MaxSizeExceeded', CAST(NULL AS INT), CAST(NULL AS BIGINT),
         {_NULL_LC}, 'text bytes ' || total_bytes || ' > max {_MAX_BYTES}'
  FROM sp WHERE span_pos = 0 AND total_bytes > {_MAX_BYTES}
  UNION ALL
  SELECT d.partition, d.doc_id, 'U1', 'DuplicateKey', CAST(NULL AS INT), CAST(NULL AS BIGINT),
         {_NULL_LC}, 'doc_id appears ' || c.n || ' times'
  FROM docs d
  JOIN (SELECT doc_id, count(*) AS n FROM docs GROUP BY doc_id HAVING count(*) > 1) c
    USING (doc_id)
)"""

# D1 PSI scores, mirroring drift_scores term-for-term (same eps, same
# left-to-right accumulation order over the kind domain)
_kc_cols = ",\n         ".join(
    f"sum(CASE WHEN kind = '{k}' THEN 1 ELSE 0 END) AS c_{k}" for k in SPAN_KIND_DOMAIN
)
_tot = " + ".join(f"c_{k}" for k in SPAN_KIND_DOMAIN)
_g_cols = ", ".join(f"sum(c_{k}) AS g_{k}" for k in SPAN_KIND_DOMAIN)
# zero-span guard mirrors drift_scores (rules.py): an empty partition's
# shares floor to eps rather than dividing by zero
_pk = "(CASE WHEN tot > 0 THEN c_{k} / tot ELSE 0 END + {e})"
_qk = "(CASE WHEN g_tot > 0 THEN g_{k} / g_tot ELSE 0 END + {e})"
_psi_terms = " + ".join(
    f"(({_pk.format(k=k, e=_EPS)} - {_qk.format(k=k, e=_EPS)}) * "
    f"ln({_pk.format(k=k, e=_EPS)} / {_qk.format(k=k, e=_EPS)}))"
    for k in SPAN_KIND_DOMAIN
)
# KL(partition ‖ global), same eps floor and accumulation order as
# drift_scores' kl_terms (rules.py)
_kl_terms = " + ".join(
    f"(({_pk.format(k=k, e=_EPS)}) * "
    f"ln({_pk.format(k=k, e=_EPS)} / {_qk.format(k=k, e=_EPS)}))"
    for k in SPAN_KIND_DOMAIN
)
_PSI_CTE = f"""
kc AS (
  SELECT partition,
         {_kc_cols}
  FROM sp GROUP BY partition
),
kct AS (SELECT *, ({_tot}) AS tot FROM kc),
g AS (SELECT {_g_cols}, sum(tot) AS g_tot FROM kct),
psi AS (
  SELECT partition, ({_psi_terms}) AS psi, ({_kl_terms}) AS kl
  FROM kct, g
)"""

_RULE_IDS = ["S1", "S2", "S3", "S4", "S5", "S6", "S7", "S8", "U1", "R1", "D1"]
_RULES_VALUES = ", ".join(f"('{r}')" for r in _RULE_IDS)


@register(
    "span_pack_violations",
    f"WITH{_SP_CTE},{_VIOL_CTE}\nSELECT * FROM viol",
)
def span_pack_violations(spark, sf_dir):
    """S1–S8 + U1 + fused R1 over the interleaved fixture corpus —
    full violation rows (positions AND messages) vs the DuckDB twin."""
    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS, enable_drift=False))
    return eng.violations(docs, cat)


@register(
    "span_pack_violation_exemplars",
    f"""WITH{_SP_CTE},{_VIOL_CTE},
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY partition, rule_id
           ORDER BY md5(doc_id || ':' || coalesce(CAST(span_pos AS VARCHAR), '-1')),
                    doc_id, coalesce(span_pos, -1), message
         ) AS exemplar_rank,
         count(*) OVER (PARTITION BY partition, rule_id) AS n_total
  FROM viol
)
SELECT partition, doc_id, rule_id, kind, span_pos, "offset", line, "col",
       message, exemplar_rank, n_total
FROM ranked WHERE exemplar_rank <= 3""",
)
def span_pack_violation_exemplars(spark, sf_dir):
    """X136: each (partition, rule) cell of the verdict grid keeps its
    violation total plus <=3 deterministic exemplar rows — chosen by
    the portable md5 sampler, so resumes, re-runs, and the DuckDB twin
    pick the IDENTICAL examples (never a nondeterministic LIMIT). One
    window on the keys the engine already shuffles; output bounded at
    |partitions| x |rules| x 3 regardless of corpus size."""
    from zparse_spark.operators.rules import violation_exemplars

    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS, enable_drift=False))
    return violation_exemplars(eng.violations(docs, cat), n=3)


@register(
    "span_pack_referential_distinct",
    f"""WITH{_SP_CTE}
SELECT partition, doc_id, 'R1' AS rule_id, 'DanglingMediaRef' AS kind,
       span_pos, off AS "offset", {_NULL_LC},
       'dangling media_ref: ' || media_ref AS message
FROM sp
WHERE media_ref IS NOT NULL AND media_ref NOT IN (SELECT media_ref FROM cat)""",
)
def span_pack_referential_distinct(spark, sf_dir):
    """R1 via the two-phase distinct-ref rewrite (anti-join on DISTINCT
    ref values → broadcast the sparse dangling SET back onto the
    occurrence stream) — the shape for the big-catalog × big-docs
    regime where the single-phase SMJ would shuffle every occurrence.
    The rewrite is an algebraic identity, so the SAME R1 oracle branch
    must match row-for-row."""
    from zparse_spark.operators.rules import referential_violations

    docs, cat = _pack_input(spark)
    return referential_violations(docs, cat, strategy="distinct")


@register(
    "span_pack_referential_bloom",
    f"""WITH{_SP_CTE}
SELECT partition, doc_id, 'R1' AS rule_id, 'DanglingMediaRef' AS kind,
       span_pos, off AS "offset", {_NULL_LC},
       'dangling media_ref: ' || media_ref AS message
FROM sp
WHERE media_ref IS NOT NULL AND media_ref NOT IN (SELECT media_ref FROM cat)""",
)
def span_pack_referential_bloom(spark, sf_dir):
    """R1 via strategy='bloom': the catalog is cut by an EXACT Bloom
    prune (bitmap over the distinct refs actually used; no false
    negatives ⇒ every matching catalog row survives ⇒ identical
    anti-join output) BEFORE the two-phase distinct rewrite runs — the
    shape for a global media store orders of magnitude wider than one
    table's ref domain, where even the distinct-refs anti-join would
    shuffle 10^9 catalog keys for nothing. The fixture's catalog is
    inflated 50× with decoy refs no document uses, so a green row
    proves the prune kept exactly the rows the oracle's plain NOT IN
    (which never sees the decoys' absence) requires — and the pytest
    grid asserts the decoys were in fact pruned, not carried."""
    from zparse_spark.operators.rules import referential_violations

    docs, cat = _pack_input(spark)
    decoys = (
        cat.sparkSession.range(0, 50 * 512)
        .select(F.concat(F.lit("decoy://"), F.col("id").cast("string")).alias("media_ref"))
    )
    return referential_violations(
        docs, cat.select("media_ref").unionByName(decoys), strategy="bloom"
    )


@register(
    "span_pack_media_kind_fd",
    f"""WITH{_SP_CTE},
fdpairs AS (
  SELECT DISTINCT media_ref, kind FROM sp
  WHERE media_ref IS NOT NULL AND kind IS NOT NULL
),
fdviol AS (
  SELECT media_ref, count(*) AS n_variants FROM fdpairs
  GROUP BY media_ref HAVING count(*) > 1
),
fdex AS (
  SELECT media_ref, kind,
         row_number() OVER (PARTITION BY media_ref ORDER BY kind) AS rk
  FROM fdpairs
),
fdmsg AS (
  SELECT v.media_ref, string_agg(e.kind, ',' ORDER BY e.kind) AS variants
  FROM fdviol v JOIN fdex e ON e.media_ref = v.media_ref AND e.rk <= 4
  GROUP BY v.media_ref
)
SELECT partition, doc_id, 'F1' AS rule_id, 'InconsistentMediaKind' AS kind,
       span_pos, off AS "offset", {_NULL_LC},
       'inconsistent media kind: ' || sp.media_ref || ' -> ' || m.variants AS message
FROM sp JOIN fdmsg m ON m.media_ref = sp.media_ref""",
)
def span_pack_media_kind_fd(spark, sf_dir):
    """F1: every media_ref must carry ONE span kind table-wide — the
    span-level application of the X31 FD core, attributed back to each
    offending occurrence (same nested-pruned projection + broadcast-
    back shape as R1 'distinct'). The fixture corpus violates this
    naturally (~310 of 512 refs, ~1k occurrence rows)."""
    from zparse_spark.operators.rules import media_kind_consistency_violations

    docs, _cat = _pack_input(spark)
    return media_kind_consistency_violations(docs)


@register(
    "span_pack_verdicts",
    f"""WITH{_SP_CTE},{_VIOL_CTE},{_PSI_CTE},
grid AS (
  SELECT p.partition, r.rule_id
  FROM (SELECT DISTINCT partition FROM docs) p
  CROSS JOIN (VALUES {_RULES_VALUES}) r(rule_id)
),
counts AS (
  SELECT partition, rule_id, count(*) AS violation_count FROM viol GROUP BY 1, 2
  UNION ALL
  SELECT partition, 'D1', 1 FROM psi WHERE psi > {_PSI_THRESHOLD}
)
SELECT g.partition, g.rule_id,
       (c.violation_count IS NULL) AS passed,
       CAST(coalesce(c.violation_count, 0) AS BIGINT) AS violation_count
FROM grid g LEFT JOIN counts c USING (partition, rule_id)""",
)
def span_pack_verdicts(spark, sf_dir):
    """The dense per-(partition, rule) pass/fail matrix — the north
    rule's per-partition verdict contract, oracle-checked (all 11 rules
    including D1, which the planted ``pdrift`` partition must fail)."""
    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS))
    return eng.verdicts(docs, eng.violations(docs, cat))


@register(
    "span_pack_drift",
    f"""WITH{_SP_CTE},{_PSI_CTE}
SELECT partition, round(psi, 4) AS psi, round(kl, 4) AS kl,
       (psi <= {_PSI_THRESHOLD}) AS passed FROM psi""",
)
def span_pack_drift(spark, sf_dir):
    """D1's raw PSI and KL scores per partition — value-level drift
    oracle for BOTH metrics the north-star names (KL/PSI), computed in
    one pass over the same per-partition kind counts."""
    docs, _ = _pack_input(spark)
    return drift_scores(docs, _PARAMS).select(
        "partition",
        F.round("psi", 4).alias("psi"),
        F.round("kl", 4).alias("kl"),
        (F.col("psi") <= _PSI_THRESHOLD).alias("passed"),
    )


@register(
    "span_pack_verdict_diff",
    f"""WITH o AS (SELECT * FROM read_parquet('{_W}/verdicts_a/*.parquet')),
n AS (SELECT * FROM read_parquet('{_W}/verdicts_b/*.parquet')),
j AS (
  SELECT coalesce(o.partition, n.partition) AS partition,
         coalesce(o.rule_id, n.rule_id) AS rule_id,
         o.passed AS op, n.passed AS np,
         o.violation_count AS old_count, n.violation_count AS new_count
  FROM o FULL OUTER JOIN n ON o.partition = n.partition AND o.rule_id = n.rule_id
)
SELECT partition, rule_id,
       CASE WHEN op IS NULL THEN 'appeared'
            WHEN np IS NULL THEN 'removed'
            WHEN op AND NOT np THEN 'regressed'
            WHEN NOT op AND np THEN 'fixed'
            ELSE 'changed' END AS status,
       old_count, new_count
FROM j
WHERE op IS NULL OR np IS NULL OR op <> np OR old_count <> new_count""",
)
def span_pack_verdict_diff(spark, sf_dir):
    """Run-over-run verdict regression report: the pack evaluated under
    the baseline params vs a stricter run (max_text_bytes halved, drift
    disabled), both verdict matrices persisted, then ``verdict_diff`` —
    regressed/fixed/changed/removed cells value-matched by DuckDB's full
    outer join over the same parquet."""
    from zparse_spark.plans.engine import verdict_diff

    docs, cat = _pack_input(spark)
    eng_a = ValidationEngine(ValidationConfig(params=_PARAMS))
    eng_b = ValidationEngine(
        ValidationConfig(
            params=RuleParams(max_spans=_MAX_SPANS, max_text_bytes=_MAX_BYTES // 2),
            enable_drift=False,
        )
    )
    eng_a.verdicts(docs, eng_a.violations(docs, cat)).write.mode("overwrite").parquet(
        f"{_W}/verdicts_a"
    )
    eng_b.verdicts(docs, eng_b.violations(docs, cat)).write.mode("overwrite").parquet(
        f"{_W}/verdicts_b"
    )
    return verdict_diff(
        spark.read.parquet(f"{_W}/verdicts_a"), spark.read.parquet(f"{_W}/verdicts_b")
    )


@register(
    "span_pack_metrics",
    f"""WITH docs AS (
  SELECT doc_id, spans, partition FROM read_parquet('{_W}/span_docs/*.parquet')
),
dm AS (
  SELECT partition,
         len(coalesce(spans, [])) AS n_spans,
         coalesce(list_sum(list_transform(coalesce(spans, []),
                                          x -> strlen(coalesce(x.text, '')))), 0) AS bytes,
         len(list_filter(coalesce(spans, []), x -> x.media_ref IS NOT NULL)) AS n_media
  FROM docs
)
SELECT partition,
       count(*) AS n_docs,
       CAST(sum(n_spans) AS BIGINT) AS n_spans,
       CAST(sum(bytes) AS BIGINT) AS text_bytes,
       CAST(sum(n_media) AS BIGINT) AS n_media_spans,
       round(avg(n_spans), 4) AS avg_spans_per_doc,
       CAST(max(n_spans) AS INT) AS max_spans_per_doc
FROM dm GROUP BY partition""",
)
def span_pack_metrics(spark, sf_dir):
    """The engine's per-partition profile (metrics()) value-matched by
    DuckDB — doc counts, span counts, text BYTES (octet-aware: DuckDB
    strlen is bytes), media-span counts, avg/max spans per doc — over
    the same fixture corpus as the rule pack, null/empty spans included."""
    docs, _ = _pack_input(spark)
    from zparse_spark.plans.engine import ValidationEngine

    m = ValidationEngine().metrics(docs)
    return m.select(
        "partition",
        "n_docs",
        "n_spans",
        "text_bytes",
        "n_media_spans",
        F.round("avg_spans_per_doc", 4).alias("avg_spans_per_doc"),
        "max_spans_per_doc",
    )


# the K-pack under oracle: four user CHECK constraints (two doc-level,
# two span-level) with ANSI NULL-passes semantics — thresholds chosen to
# fire on the fixture corpus (max doc 647 text bytes, offsets up to 609)
_K_CHECKS = (
    CheckConstraint("K1", "doc", "total_text_bytes <= 300", "doc text budget 300 bytes"),
    CheckConstraint(
        "K2", "doc",
        "size(filter(spans, s -> s.media_ref IS NOT NULL)) <= 4",
        "at most 4 media spans per doc",
    ),
    CheckConstraint("K3", "span", "NOT (kind = 'text' AND length(text) > 80)", "text span cap 80 chars"),
    CheckConstraint("K4", "span", "offset < 512", "offset domain"),
)


@register(
    "span_pack_check_constraints",
    f"""WITH{_SP_CTE},
dchk AS (
  SELECT partition, doc_id,
         coalesce(list_sum(list_transform(spans, x -> strlen(coalesce(x.text, '')))), 0) AS total_bytes,
         len(list_filter(spans, x -> x.media_ref IS NOT NULL)) AS n_media
  FROM docs
)
SELECT partition, doc_id, 'K1' AS rule_id, 'CheckFailed' AS kind,
       CAST(NULL AS INT) AS span_pos, CAST(NULL AS BIGINT) AS "offset", {_NULL_LC},
       'check failed: doc text budget 300 bytes' AS message
FROM dchk WHERE NOT coalesce(total_bytes <= 300, TRUE)
UNION ALL
SELECT partition, doc_id, 'K2', 'CheckFailed', CAST(NULL AS INT), CAST(NULL AS BIGINT), {_NULL_LC},
       'check failed: at most 4 media spans per doc'
FROM dchk WHERE NOT coalesce(n_media <= 4, TRUE)
UNION ALL
SELECT partition, doc_id, 'K3', 'CheckFailed', span_pos, off, {_NULL_LC},
       'check failed: text span cap 80 chars'
FROM sp WHERE NOT coalesce(NOT (kind = 'text' AND length(text) > 80), TRUE)
UNION ALL
SELECT partition, doc_id, 'K4', 'CheckFailed', span_pos, off, {_NULL_LC},
       'check failed: offset domain'
FROM sp WHERE NOT coalesce(off < 512, TRUE)""",
)
def span_pack_check_constraints(spark, sf_dir):
    """User-declared CHECK constraints (K-rules) through the REAL engine
    — the open end of the rule pack: arbitrary boolean SQL predicates at
    doc/span level compiled via F.expr into the same map-only plan as the
    built-in rules, ANSI CHECK semantics (NULL passes), full violation
    rows vs a DuckDB twin that re-derives every predicate with
    ``NOT coalesce(pred, TRUE)``."""
    docs, _cat = _pack_input(spark)
    eng = ValidationEngine(
        ValidationConfig(
            check_constraints=_K_CHECKS,
            enable_drift=False,
            enable_uniqueness=False,
            enable_referential=False,
        )
    )
    # restrict to the K rows: span rules S1-S8 are oracled separately in
    # span_pack_violations; this query isolates the user-check surface
    return eng.violations(docs).filter(F.col("rule_id").startswith("K"))


@register(
    "span_pack_render_text",
    f"""WITH{_SP_CTE},
rend AS (
  -- correlated per-ROW aggregation (not GROUP BY doc_id): the fixture
  -- plants duplicate doc_ids (U1), and each physical row renders
  -- independently — grouping by key would merge the copies
  SELECT partition, doc_id,
         coalesce((SELECT string_agg(
             CASE WHEN s.kind = 'text' THEN coalesce(s.text, '')
                  ELSE '<|' || coalesce(s.kind, 'unknown') || '|>' END,
             '' ORDER BY coalesce(s."offset", 2147483647), coalesce(s.kind, ''),
                coalesce(s.media_ref, ''), coalesce(s.text, '')
           ) FROM unnest(d.spans) AS t(s)), '') AS training_text,
         coalesce((SELECT CAST(sum(CASE WHEN s.kind IS NULL OR s.kind <> 'text'
                            THEN 1 ELSE 0 END) AS INT)
           FROM unnest(d.spans) AS t(s)), 0) AS n_media_slots
  FROM docs d
)
SELECT partition, doc_id, training_text,
       CAST(length(training_text) AS INT) AS n_chars, n_media_slots
FROM rend""",
)
def span_pack_render_text(spark, sf_dir):
    """Interleaved-to-training-text rendering: canonical offset order,
    text spans verbatim, media spans as typed ``<|kind|>`` placeholder
    slots — the map-only materialization step between validated storage
    and a packed training batch, value-matched against a DuckDB
    sort-then-string_agg twin (identical (offset, kind, media_ref,
    text) tie-break order)."""
    from zparse_spark.operators.canonical import render_training_text

    docs, _cat = _pack_input(spark)
    r = render_training_text(docs)
    return r.select(
        "partition", "doc_id", "training_text",
        F.col("n_chars").cast("int").alias("n_chars"),
        F.col("n_media_slots").cast("int").alias("n_media_slots"),
    )


@register(
    "span_pack_partition_verdicts",
    f"""WITH{_SP_CTE},{_VIOL_CTE},{_PSI_CTE},
grid AS (
  SELECT p.partition, r.rule_id
  FROM (SELECT DISTINCT partition FROM docs) p
  CROSS JOIN (VALUES {_RULES_VALUES}) r(rule_id)
),
counts AS (
  SELECT partition, rule_id, count(*) AS violation_count FROM viol GROUP BY 1, 2
  UNION ALL
  SELECT partition, 'D1', 1 FROM psi WHERE psi > {_PSI_THRESHOLD}
),
cells AS (
  SELECT g.partition, g.rule_id,
         (c.violation_count IS NULL) AS passed,
         coalesce(c.violation_count, 0) AS violation_count,
         g.rule_id IN ('S4', 'D1') AS is_warn
  FROM grid g LEFT JOIN counts c USING (partition, rule_id)
)
SELECT partition,
       CAST(min(CASE WHEN is_warn THEN TRUE ELSE passed END) AS BOOLEAN) AS passed,
       CAST(sum(CASE WHEN NOT passed AND NOT is_warn THEN 1 ELSE 0 END) AS BIGINT) AS n_error_cells,
       CAST(sum(CASE WHEN NOT passed AND is_warn THEN 1 ELSE 0 END) AS BIGINT) AS n_warn_cells,
       CAST(sum(violation_count) AS BIGINT) AS n_violations
FROM cells GROUP BY partition""",
)
def span_pack_partition_verdicts(spark, sf_dir):
    """Severity-policied per-partition roll-up: S4 (size budget) and D1
    (drift) demoted to WARN — reported in n_warn_cells but never
    failing the partition — the operational gate a recurring job keys
    its exit code on, value-matched cell-for-cell by DuckDB over the
    identical grid."""
    from zparse_spark.plans.engine import partition_verdicts

    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS))
    verd = eng.verdicts(docs, eng.violations(docs, cat))
    return partition_verdicts(verd, warn_rules=["S4", "D1"])


@register(
    "span_pack_quarantine",
    f"""WITH{_SP_CTE},{_VIOL_CTE},
bad AS (
  SELECT DISTINCT partition, doc_id FROM viol
  WHERE doc_id IS NOT NULL AND rule_id IN ('S1','S2','S5','S6','S7','S8','U1')
)
SELECT d.partition, d.doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'clean' ELSE 'quarantined' END AS status
FROM docs d LEFT JOIN bad b
  ON b.partition = d.partition AND b.doc_id = d.doc_id""",
)
def span_pack_quarantine(spark, sf_dir):
    """The ingestion gate: quarantine_split routes every document to
    clean or quarantined on its (partition, doc_id) violation
    attribution, restricted to the structural+uniqueness rules (S-pack
    + U1 — limits S3/S4 and catalog R1 stay advisory here). Both
    streams re-unioned with a status tag so the oracle checks the exact
    split, not just counts."""
    from zparse_spark.plans.engine import quarantine_split

    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS, enable_drift=False))
    viol = eng.violations(docs, cat)
    clean, quarantined = quarantine_split(
        docs, viol, rule_ids=["S1", "S2", "S5", "S6", "S7", "S8", "U1"]
    )
    return clean.select("partition", "doc_id", F.lit("clean").alias("status")).unionByName(
        quarantined.select("partition", "doc_id", F.lit("quarantined").alias("status"))
    )


@register(
    "worst_offenders_report",
    f"""WITH{_SP_CTE},{_VIOL_CTE},{_PSI_CTE},
allviol AS (
  SELECT partition, doc_id, rule_id FROM viol
  UNION ALL
  SELECT partition, CAST(NULL AS VARCHAR), 'D1' FROM psi WHERE psi > {_PSI_THRESHOLD}
),
po AS (
  SELECT partition AS key, count(*) AS n_violations, count(DISTINCT rule_id) AS n_rules
  FROM allviol GROUP BY partition ORDER BY n_violations DESC, key ASC LIMIT 5
),
dd AS (
  SELECT doc_id AS key, count(*) AS n_violations, count(DISTINCT rule_id) AS n_rules
  FROM allviol WHERE doc_id IS NOT NULL GROUP BY doc_id
  ORDER BY n_violations DESC, key ASC LIMIT 5
)
SELECT 'partition' AS level, key, n_violations, n_rules FROM po
UNION ALL
SELECT 'doc', key, n_violations, n_rules FROM dd""",
)
def worst_offenders_report(spark, sf_dir):
    """A8 top-k violation report over the full pack (D1 included) —
    TakeOrderedAndProject on the Spark side, window+limit in DuckDB."""
    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS))
    return eng.worst_offenders(eng.violations(docs, cat), k=5)


# ---------------------------------------------------------------------------
# S9 extent-overlap pack — separate corpus with monotonic-but-overlapping
# plants (S1 clean, S9 dirty), so the rule's independence from the
# start-order check is what the oracle certifies
# ---------------------------------------------------------------------------

_S9_BRANCH = """
  UNION ALL
  SELECT partition, doc_id, 'S9', 'InvalidArray', span_pos, off, line, "col",
         'span overlap: offset ' || off || ' < prev end ' || prev_end
  FROM sp WHERE span_pos >= 1 AND off < prev_end
"""
# the full rule-pack twin plus the S9 branch, over the overlap corpus
_cut = _VIOL_CTE.rfind(")")
_VIOL_CTE_S9 = _VIOL_CTE[:_cut] + _S9_BRANCH + ")"

_OV_READY = False


def _overlap_input(spark):
    """Fixture corpus + planted monotonic-but-overlapping documents.

    Every 16th base doc is re-offset to its span POSITION index
    (0, 1, 2, …): strictly increasing, so S1 stays silent, but any span
    following a non-empty text overlaps its predecessor's extent
    (offset < prev_offset + len(prev_text)) — exactly the class S9
    exists to catch and S1 cannot. Persisted once per process like
    ``_pack_input`` so Spark and DuckDB read identical bytes."""
    global _OV_READY
    docs, cat = _pack_input(spark)
    if not _OV_READY:
        base_id = F.col("doc_id")
        planted = (
            docs.filter(~base_id.startswith("drift_"))
            .filter(F.pmod(base_id.cast("long"), F.lit(16)) == 3)
            .select(
                F.concat(F.lit("overlap_"), base_id).alias("doc_id"),
                F.transform(
                    F.col("spans"),
                    lambda s, i: F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                        i.cast("int").alias("offset"),
                    ),
                ).alias("spans"),
                F.lit("pov").alias("partition"),
            )
        )
        docs.unionByName(planted).write.mode("overwrite").parquet(f"{_W}/span_docs_overlap")
        _OV_READY = True
    return spark.read.parquet(f"{_W}/span_docs_overlap"), cat


# ---------------------------------------------------------------------------
# repair — the salvage path: fix what has a canonical fix, log everything
# ---------------------------------------------------------------------------

# per-ROW list computations throughout (never a doc_id window/group:
# the fixture plants duplicate doc_ids, and a window would merge the
# copies into one 2n-span group while Spark repairs each row alone)
_REPAIR_PRE = f"""
docs AS (SELECT doc_id, spans, partition FROM read_parquet('{_W}/span_docs/*.parquet')),
rep AS (
  SELECT doc_id, partition, spans,
         list_sort(list_transform(
           list_filter(coalesce(spans, []),
                       s -> s.kind IN ({_DOMAIN_SQL})
                            AND NOT (s.kind <> 'text' AND s.media_ref IS NULL)),
           s -> {{
             o: s."offset",
             k: s.kind,
             m: coalesce(CASE WHEN s.kind = 'text' THEN NULL ELSE s.media_ref END, ''),
             t: coalesce(regexp_replace(s.text, '{_CONTROL_CHARS}', '', 'g'), ''),
             xt: regexp_replace(s.text, '{_CONTROL_CHARS}', '', 'g'),
             xm: CASE WHEN s.kind = 'text' THEN NULL ELSE s.media_ref END
           }})) AS fixed
  FROM docs
)"""


@register(
    "span_pack_repair_spans",
    f"""WITH{_REPAIR_PRE}
SELECT doc_id, partition,
       CAST(pos - 1 AS INT) AS span_pos,
       u.k AS kind, u.xt AS text, u.xm AS media_ref,
       CAST(pos - 1 AS INT) AS "offset"
FROM (
  SELECT doc_id, partition,
         unnest(fixed) AS u,
         generate_subscripts(fixed, 1) AS pos
  FROM rep
) WHERE pos <= {_MAX_SPANS}""",
)
def span_pack_repair_spans(spark, sf_dir):
    """Deterministic repair over the fixture corpus — the repaired span
    arrays themselves, exploded and value-matched: S2/S8 drops, S8/S5
    fixes, canonical sort, S3 truncation, compact reindex (offset =
    position). Map-only array expressions; per-row semantics preserved
    under the planted duplicate doc_ids (see repair_documents)."""
    from zparse_spark.operators.canonical import repair_documents

    docs, _cat = _pack_input(spark)
    repaired, _log = repair_documents(docs, _PARAMS)
    return repaired.select(
        "doc_id", "partition", F.posexplode("spans").alias("span_pos", "s")
    ).select(
        "doc_id",
        "partition",
        "span_pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


@register(
    "span_pack_repair_log",
    f"""WITH
docs AS (SELECT doc_id, spans, partition FROM read_parquet('{_W}/span_docs/*.parquet')),
ex AS (
  SELECT doc_id, unnest(spans) AS s,
         CAST(generate_subscripts(spans, 1) - 1 AS INT) AS pos
  FROM docs
),
flags AS (
  SELECT doc_id,
         len(list_filter(range(2, len(coalesce(spans, [])) + 1),
                         i -> spans[i]."offset" <= spans[i - 1]."offset")) > 0 AS reindex_flag,
         len(list_filter(coalesce(spans, []),
                         s -> s.kind IN ({_DOMAIN_SQL})
                              AND NOT (s.kind <> 'text' AND s.media_ref IS NULL))) AS n_kept
  FROM docs
)
SELECT doc_id, pos AS span_pos, 'drop' AS action, 'S2' AS rule_id
FROM ex WHERE s.kind IS NULL OR s.kind NOT IN ({_DOMAIN_SQL})
UNION ALL
SELECT doc_id, pos, 'drop', 'S8'
FROM ex WHERE s.kind IN ({_DOMAIN_SQL}) AND s.kind <> 'text' AND s.media_ref IS NULL
UNION ALL
SELECT doc_id, pos, 'fix', 'S8'
FROM ex WHERE s.kind = 'text' AND s.media_ref IS NOT NULL
UNION ALL
SELECT doc_id, pos, 'fix', 'S5'
FROM ex WHERE s.kind IN ({_DOMAIN_SQL})
          AND NOT (s.kind <> 'text' AND s.media_ref IS NULL)
          AND regexp_matches(s.text, '{_CONTROL_CHARS}')
UNION ALL
SELECT doc_id, CAST(NULL AS INT), 'truncate', 'S3' FROM flags WHERE n_kept > {_MAX_SPANS}
UNION ALL
SELECT doc_id, CAST(NULL AS INT), 'reindex', 'S1' FROM flags WHERE reindex_flag""",
)
def span_pack_repair_log(spark, sf_dir):
    """The repair ACTION log for the same run — every drop/fix with its
    rule attribution (first-reason precedence) plus doc-level
    truncate/reindex rows, so 'what did the repairer change' is itself
    auditable and cross-engine-verified."""
    from zparse_spark.operators.canonical import repair_documents

    docs, _cat = _pack_input(spark)
    _repaired, log = repair_documents(docs, _PARAMS)
    return log


@register(
    "span_pack_dup_resolution",
    f"""WITH
docs AS (SELECT doc_id, spans, partition FROM read_parquet('{_W}/span_docs/*.parquet')),
keyed AS (
  SELECT doc_id, partition,
         coalesce(len(spans), 0) AS n_spans,
         md5(array_to_string(list_transform(
           list_sort(list_transform(coalesce(spans, []),
             s -> {{o: s."offset", k: coalesce(s.kind, ''),
                   m: coalesce(s.media_ref, ''), t: coalesce(s.text, '')}})),
           x -> x.k || chr(31) || x.t || chr(31) || x.m || chr(31)
                || coalesce(CAST(x.o AS VARCHAR), '')), chr(30))) AS ser
  FROM docs
),
rn AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY n_spans DESC, partition, ser) AS r
  FROM keyed
)
SELECT doc_id, partition,
       CASE WHEN r = 1 THEN 'kept' ELSE 'dropped' END AS status,
       n_spans
FROM rn""",
)
def span_pack_dup_resolution(spark, sf_dir):
    """U1 repair: duplicate doc_ids collapse to one deterministic
    representative (most spans, ties by partition then a portable
    md5 content key — duplicate_resolution_key — so both engines keep
    the same copy); every row reported with its kept/dropped status.
    One shuffle on doc_id (see resolve_duplicate_docs)."""
    from zparse_spark.operators.canonical import resolve_duplicate_docs

    docs, _cat = _pack_input(spark)
    resolved, log = resolve_duplicate_docs(docs)
    n_spans = F.coalesce(F.size("spans"), F.lit(0)).alias("n_spans")
    kept = resolved.select("doc_id", "partition", F.lit("kept").alias("status"), n_spans)
    # dropped copies take n_spans from their kept twin (resolved is
    # unique per doc_id, so the join never multiplies; the fixture's
    # copies are byte-identical so the value is the copy's own)
    dropped = log.join(
        resolved.select("doc_id", n_spans), "doc_id"
    ).select("doc_id", "partition", F.lit("dropped").alias("status"), "n_spans")
    return kept.unionByName(dropped)


@register(
    "span_pack_repair_refs",
    f"""WITH
docs AS (SELECT doc_id, spans, partition FROM read_parquet('{_W}/span_docs/*.parquet')),
cat AS (SELECT DISTINCT media_ref FROM read_parquet('{_W}/span_catalog/*.parquet')),
keyed AS (
  SELECT doc_id, partition, spans,
         coalesce(len(spans), 0) AS n_spans,
         md5(array_to_string(list_transform(
           list_sort(list_transform(coalesce(spans, []),
             s -> {{o: s."offset", k: coalesce(s.kind, ''),
                   m: coalesce(s.media_ref, ''), t: coalesce(s.text, '')}})),
           x -> x.k || chr(31) || x.t || chr(31) || x.m || chr(31)
                || coalesce(CAST(x.o AS VARCHAR), '')), chr(30))) AS ser
  FROM docs
),
resolved AS (
  SELECT doc_id, partition, spans FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY n_spans DESC, partition, ser) AS r
    FROM keyed
  ) WHERE r = 1
),
ex AS (
  SELECT partition, doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS pos
  FROM resolved
),
kept AS (
  SELECT * FROM ex
  WHERE s.media_ref IS NULL OR s.media_ref IN (SELECT media_ref FROM cat)
)
SELECT doc_id, partition,
       CAST(row_number() OVER (PARTITION BY partition, doc_id ORDER BY pos) - 1 AS INT)
         AS span_pos,
       s.kind AS kind, s.text AS text, s.media_ref AS media_ref,
       CAST(row_number() OVER (PARTITION BY partition, doc_id ORDER BY pos) - 1 AS INT)
         AS "offset"
FROM kept""",
)
def span_pack_repair_refs(spark, sf_dir):
    """R1 repair composed behind U1 resolution (the reassembly
    precondition — duplicate doc_ids would merge into one 2n-span doc —
    is exactly what X80 discharges): dangling media spans dropped, the
    survivors re-compacted in original order, exploded and
    value-matched. One explode + one doc-identity shuffle (see
    repair_dangling_refs)."""
    from zparse_spark.operators.canonical import (
        repair_dangling_refs,
        resolve_duplicate_docs,
    )

    docs, cat = _pack_input(spark)
    resolved, _dup_log = resolve_duplicate_docs(docs)
    repaired, _log = repair_dangling_refs(resolved, cat)
    return repaired.select(
        "doc_id", "partition", F.posexplode("spans").alias("span_pos", "s")
    ).select(
        "doc_id", "partition", "span_pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


# ---------------------------------------------------------------------------
# sampled-tier validation — violation-rate estimation with Wilson bounds
# ---------------------------------------------------------------------------

_SAMPLE_FRACTION = 0.35
_SAMPLE_SEED = 11
_Z = 1.96
_Z2 = _Z * _Z  # python float, repr-embedded so both engines share the bits


def _sampled_oracle_sql() -> str:
    from zparse_spark.queries_lsh import _hv_sql

    hv = _hv_sql(f"partition || '|' || doc_id || ':{_SAMPLE_SEED}'")
    rules = ", ".join(f"('{r}')" for r in ["S1", "S2", "S3", "S4", "S5", "S6", "S7", "S8", "R1"])
    return f"""WITH{_sp_cte(docs_where=f"WHERE {hv} / 4294967296.0 < {_SAMPLE_FRACTION}")},{_VIOL_CTE},
fulldocs AS (SELECT partition, doc_id FROM read_parquet('{_W}/span_docs/*.parquet')),
totals AS (SELECT partition, count(*) AS n_total_docs FROM fulldocs GROUP BY 1),
sampled AS (SELECT partition, count(*) AS n_sampled FROM docs GROUP BY 1),
viols AS (
  SELECT partition, rule_id, count(*) AS n_violating
  FROM (SELECT DISTINCT partition, rule_id, doc_id FROM viol WHERE doc_id IS NOT NULL)
  GROUP BY 1, 2
),
grid AS (
  SELECT t.partition, r.rule_id, t.n_total_docs,
         coalesce(s.n_sampled, 0) AS n_sampled
  FROM totals t LEFT JOIN sampled s USING (partition)
  CROSS JOIN (VALUES {rules}) r(rule_id)
),
cells AS (
  SELECT g.*, coalesce(v.n_violating, 0) AS n_violating
  FROM grid g LEFT JOIN viols v ON v.partition = g.partition AND v.rule_id = g.rule_id
),
-- Wilson score, expression structure identical to sampled_validation's
-- column tree (plans/engine.py) so the doubles agree bit-for-bit
w1 AS (SELECT *, CAST(n_sampled AS DOUBLE) AS n, CAST(n_violating AS DOUBLE) AS k FROM cells),
w2 AS (SELECT *, k / n AS p, 1.0 + {_Z2!r} / n AS denom FROM w1 WHERE n > 0),
w3 AS (
  SELECT *,
         (p + {_Z2!r} / (2.0 * n)) / denom AS center,
         {_Z!r} * sqrt(p * (1.0 - p) / n + {_Z2!r} / (4.0 * n * n)) / denom AS half
  FROM w2
)
SELECT c.partition, c.rule_id, c.n_total_docs, c.n_sampled, c.n_violating,
       round(w.p, 6) AS p_hat,
       round(greatest(0.0, w.center - w.half), 6) AS ci_lo,
       round(least(1.0, w.center + w.half), 6) AS ci_hi,
       round(w.p * CAST(c.n_total_docs AS DOUBLE), 6) AS est_violating_docs
FROM cells c
LEFT JOIN w3 w ON w.partition = c.partition AND w.rule_id = c.rule_id"""


@register("span_pack_sampled_rates", _sampled_oracle_sql())
def span_pack_sampled_rates(spark, sf_dir):
    """Sampled-tier validation: per-(partition, rule) violation-RATE
    estimates with Wilson 95% bounds from a deterministic 35% document
    sample — the screening pass that bounds every rule's breach rate at
    a fraction of the full job's cost (U1/D1 excluded: duplicate rates
    are biased under sampling, drift needs the full distribution). The
    md5-nibble sample is a pure function of (partition, doc_id, seed),
    so DuckDB draws the identical subset and the Wilson arithmetic is
    mirrored term-for-term."""
    from zparse_spark.plans.engine import sampled_validation

    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS, enable_drift=False))
    return sampled_validation(
        docs, eng, fraction=_SAMPLE_FRACTION, seed=_SAMPLE_SEED, media_catalog=cat, z=_Z
    )


# ---------------------------------------------------------------------------
# waiver suppression — curated exceptions over the violation stream
# ---------------------------------------------------------------------------

_AS_OF = "2026-08-18"
_WAIVERS = [
    # (waiver_id, rule_id, partition, doc_id, reason, expires_at) —
    # NULL scope = wildcard; expires_at is an ISO date STRING so the
    # activity comparison is the same lexicographic > in both engines
    ("w1", "S8", None, None, "known media-stripped batch", "2027-01-01"),
    ("w2", "S2", "p3", None, "vendor kind backlog", None),
    ("w3", "S1", None, None, "expired amnesty", "2026-01-01"),  # inactive
    ("w4", "R1", "p1", None, "catalog refresh pending", "2027-06-30"),
    ("w5", "U1", None, None, "replayed ingest window", None),
]
_WAIVERS_READY = False


def _waiver_input(spark):
    global _WAIVERS_READY
    if not _WAIVERS_READY:
        spark.createDataFrame(
            _WAIVERS,
            "waiver_id string, rule_id string, partition string, doc_id string, "
            "reason string, expires_at string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{_W}/span_waivers")
        _WAIVERS_READY = True
    return spark.read.parquet(f"{_W}/span_waivers")


@register(
    "span_pack_waivers",
    f"""WITH{_SP_CTE},{_VIOL_CTE},
w AS (
  SELECT * FROM read_parquet('{_W}/span_waivers/*.parquet')
  WHERE expires_at IS NULL OR expires_at > '{_AS_OF}'
),
-- MATERIALIZED: DuckDB inlines CTEs, so an unmaterialized vt would
-- assign vrow independently (and differently) at each reference
vt AS MATERIALIZED (
  SELECT *, row_number() OVER (
    ORDER BY partition, doc_id, rule_id, span_pos, "offset", message
  ) AS vrow FROM viol
),
m AS (
  SELECT vrow, min(w.waiver_id) AS waiver_id
  FROM vt v JOIN w
    ON v.rule_id = w.rule_id
   AND (w.partition IS NULL OR w.partition = v.partition)
   AND (w.doc_id IS NULL OR w.doc_id = v.doc_id)
  GROUP BY vrow
)
SELECT v.partition, v.doc_id, v.rule_id, v.kind, v.span_pos, v."offset",
       v.line, v."col", v.message,
       CASE WHEN m.vrow IS NULL THEN 'kept' ELSE 'waived' END AS status,
       m.waiver_id, w2.reason
FROM vt v
LEFT JOIN m ON m.vrow = v.vrow
LEFT JOIN w w2 ON w2.waiver_id = m.waiver_id""",
)
def span_pack_waivers(spark, sf_dir):
    """Curated-exception suppression over the full violation stream:
    rule-wide, partition-scoped and expired waivers split the pack's
    violations into kept (still gate the job) and waived (reported with
    the waiver attribution) — min-waiver_id pick when several match.
    One broadcast anti-join for kept plus one bounded inner join for
    waived; no document data touched (see ``apply_waivers``)."""
    from zparse_spark.plans.engine import apply_waivers

    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS, enable_drift=False))
    # materialize once: kept + waived are two plans over the violations,
    # and the lazy rule pack would otherwise run twice (apply_waivers'
    # documented contract; quarantine_split measured the same 8×)
    viol = eng.violations(docs, cat).localCheckpoint(eager=True)
    kept, waived = apply_waivers(viol, _waiver_input(spark), as_of=_AS_OF)
    null_s = F.lit(None).cast("string")
    return kept.select(
        "*",
        F.lit("kept").alias("status"),
        null_s.alias("waiver_id"),
        null_s.alias("reason"),
    ).unionByName(waived.select("*", F.lit("waived").alias("status")).select(kept.columns + ["status", "waiver_id", "reason"]))


@register(
    "span_pack_overlap",
    f"WITH{_sp_cte('span_docs_overlap')},{_VIOL_CTE_S9}\nSELECT * FROM viol",
)
def span_pack_overlap(spark, sf_dir):
    """S9 span-extent overlap (opt-in ``RuleParams.check_span_overlap``)
    riding the full S-pack over a corpus with planted monotonic-but-
    overlapping docs — full violation rows vs the DuckDB twin. S9 reuses
    the pack's shifted-array zip (prev extent end = prev offset + char
    length of prev text precomputed per array, no window/shuffle), so
    enabling it adds zero stages; strictly stronger than S1 and only
    meaningful when offsets are character positions — the reference's
    lexer advances its cursor by consumed length per token
    (crates/zparse/src/lexer/json.rs), making 'next token starts before
    the previous one ended' a structural impossibility the table-scale
    rule pack otherwise could not express."""
    docs, cat = _overlap_input(spark)
    params = RuleParams(
        max_spans=_MAX_SPANS, max_text_bytes=_MAX_BYTES, check_span_overlap=True
    )
    eng = ValidationEngine(ValidationConfig(params=params, enable_drift=False))
    return eng.violations(docs, cat)


# ---------------------------------------------------------------------------
# Layout census over the interleaved corpus (operators/canonical.py)
# ---------------------------------------------------------------------------

_LAYOUT_SQL = f"""
WITH docs AS (
  SELECT doc_id, spans FROM read_parquet('{_W}/span_docs/*.parquet')
), sigs AS (
  -- row-wise (NOT GROUP BY doc_id): planted duplicate doc_ids are
  -- distinct documents and must census as distinct layout rows
  SELECT doc_id,
         CASE WHEN spans IS NULL THEN '(none)'
              WHEN len(spans) = 0 THEN '(empty)'
              ELSE array_to_string(
                list_transform(
                  list_sort(list_transform(spans,
                    x -> lpad(CAST(coalesce(CAST(x."offset" AS BIGINT), -1) + 2 AS VARCHAR),
                              12, '0')
                         || '|' || coalesce(x.kind, '(null)'))),
                  y -> split_part(y, '|', 2)), '>')
         END AS layout
  FROM docs
), tot AS (SELECT count(*) AS t FROM sigs)
SELECT layout, count(*) AS n_docs,
       round(count(*) * 1.0 / any_value(tot.t), 6) AS doc_share,
       min(doc_id) AS example_doc
FROM sigs, tot GROUP BY layout
"""


@register("span_pack_layout_profile", _LAYOUT_SQL)
def span_pack_layout_profile(spark, sf_dir):
    """Layout census of the interleaved fixture corpus: span-kind
    signatures in canonical offset order, counted corpus-wide, with
    '(none)'/'(empty)' as first-class classes — which multimodal
    templates exist and how common each is. Map-only signature build,
    one groupBy bounded by layout variety, share on the tiny profile."""
    docs, _cat = _pack_input(spark)

    from zparse_spark.operators.canonical import span_layout_profile

    return span_layout_profile(docs)


# ---------------------------------------------------------------------------
# Compaction / file-sizing plan (operators/layout.py::file_sizing_plan)
# ---------------------------------------------------------------------------

_SIZING_TARGET = int(0.05 * 1024 * 1024)  # 50 KiB: small so the plan is non-trivial

_SIZING_SQL = f"""
WITH docs AS (
  SELECT partition, spans FROM read_parquet('{_W}/span_docs/*.parquet')
), b AS (
  SELECT partition,
         coalesce(list_sum(list_transform(spans,
                  x -> length(coalesce(x.text, '')) + 64)), 0) AS db
  FROM docs
), agg AS (
  SELECT partition, count(*) AS n_docs, CAST(sum(db) AS BIGINT) AS est_bytes
  FROM b GROUP BY partition
)
SELECT partition, n_docs, est_bytes,
       greatest(1, CAST(ceil(est_bytes * 1.0 / {_SIZING_TARGET}) AS BIGINT))
         AS recommended_files,
       CAST(ceil(n_docs * 1.0
                 / greatest(1, CAST(ceil(est_bytes * 1.0 / {_SIZING_TARGET}) AS BIGINT)))
            AS BIGINT) AS rows_per_file
FROM agg
"""


@register("span_pack_file_sizing", _SIZING_SQL)
def span_pack_file_sizing(spark, sf_dir):
    """Compaction plan per partition (the planning half of Iceberg
    rewrite_data_files): estimated bytes from a map-only span fold,
    recommended file count at a target size, rows per file for a
    repartitionByRange executor. 50 KiB target so the fixture corpus
    produces a non-trivial plan (multiple files per hot partition)."""
    docs, _cat = _pack_input(spark)

    from zparse_spark.operators.layout import file_sizing_plan

    return file_sizing_plan(docs, target_mb=0.05)


# ---------------------------------------------------------------------------
# Rule co-occurrence forensics (operators/rules.py::rule_cooccurrence)
# ---------------------------------------------------------------------------

_COOC_SQL = f"""WITH{_SP_CTE},{_VIOL_CTE},
dv AS (SELECT DISTINCT partition, doc_id, rule_id FROM viol),
pr AS (SELECT rule_id, count(*) AS n FROM dv GROUP BY rule_id),
pp AS (
  SELECT a.rule_id AS rule_a, b.rule_id AS rule_b, count(*) AS n_both
  FROM dv a JOIN dv b
    ON a.partition IS NOT DISTINCT FROM b.partition
   AND a.doc_id IS NOT DISTINCT FROM b.doc_id
   AND a.rule_id < b.rule_id
  GROUP BY 1, 2
),
nd AS (SELECT count(*) AS n_docs FROM docs)
SELECT rule_a, rule_b, pa.n AS n_a, pb.n AS n_b, n_both,
       CASE WHEN pa.n + pb.n - n_both > 0
            THEN round(n_both / (pa.n + pb.n - n_both), 6) END AS jaccard,
       CASE WHEN pa.n * pb.n > 0
            THEN round((n_both * nd.n_docs) / (pa.n * pb.n), 6) END AS lift
FROM pp
JOIN pr pa ON pp.rule_a = pa.rule_id
JOIN pr pb ON pp.rule_b = pb.rule_id, nd"""


@register("span_pack_rule_cooccurrence", _COOC_SQL)
def span_pack_rule_cooccurrence(spark, sf_dir):
    """Which rules fire together on the same document (X92's
    missingness discipline applied to the violation table): per-rule
    doc-set jaccard + lift vs independence over the corpus — correlated
    rules are one root cause, not k tickets. Violations reduce to the
    distinct (partition, doc_id, rule) grid first; the pair join fans
    out at most rules² per doc."""
    docs, cat = _pack_input(spark)
    eng = ValidationEngine(ValidationConfig(params=_PARAMS, enable_drift=False))
    viol = eng.violations(docs, cat)

    from zparse_spark.operators.rules import rule_cooccurrence

    return rule_cooccurrence(viol, n_docs=docs.count())


# ---------------------------------------------------------------------------
# Media-asset co-occurrence (operators/canonical.py::media_cooccurrence)
# ---------------------------------------------------------------------------

_MEDIA_COOC_SQL = f"""
WITH docs AS (
  SELECT doc_id, spans FROM read_parquet('{_W}/span_docs/*.parquet')
), dr AS (
  SELECT DISTINCT doc_id, s.media_ref AS ref
  FROM (SELECT doc_id, unnest(spans) AS s FROM docs)
  WHERE s.media_ref IS NOT NULL
), marg AS (
  SELECT ref, count(*) AS n FROM dr GROUP BY ref
), pairs AS (
  SELECT a.ref AS ref_a, b.ref AS ref_b, count(*) AS n_docs_both
  FROM dr a JOIN dr b ON a.doc_id = b.doc_id AND a.ref < b.ref
  GROUP BY 1, 2
)
SELECT ref_a, ref_b, n_docs_both, ma.n AS n_docs_a, mb.n AS n_docs_b
FROM pairs JOIN marg ma ON pairs.ref_a = ma.ref
JOIN marg mb ON pairs.ref_b = mb.ref
"""


@register("span_pack_media_cooccurrence", _MEDIA_COOC_SQL)
def span_pack_media_cooccurrence(spark, sf_dir):
    """Media assets appearing together in a document — the basket
    view behind asset packs and template families text dedup can't see.
    Distinct (doc, ref) reduction map-side; doc-keyed pair join bounded
    by per-doc structure; marginals on the reduced table."""
    docs, _cat = _pack_input(spark)

    from zparse_spark.operators.canonical import media_cooccurrence

    return media_cooccurrence(docs, min_count=1)


@register(
    "span_pack_media_orphans",
    f"""WITH
docs AS (SELECT doc_id, spans FROM read_parquet('{_W}/span_docs/*.parquet')),
cat AS (SELECT DISTINCT media_ref FROM read_parquet('{_W}/span_catalog/*.parquet')),
refs AS (
  SELECT s.media_ref AS media_ref, count(*) AS n
  FROM (SELECT unnest(spans) AS s FROM docs)
  WHERE s.media_ref IS NOT NULL
  GROUP BY 1
)
SELECT c.media_ref, coalesce(r.n, 0) AS n_refs
FROM cat c LEFT JOIN refs r ON r.media_ref = c.media_ref
WHERE coalesce(r.n, 0) <= 2""",
)
def span_pack_media_orphans(spark, sf_dir):
    """Reverse referential audit over the span pack: reference counts
    per CATALOG entry, shortlisted to the cold tail (n_refs <= 2,
    including true orphans at 0) — R1's mirror image and the audit a
    payload-GC pass needs before deleting blobs. The corpus collapses
    to a catalog-bounded count table in one map-side-combined groupBy;
    the catalog left-joins that compact table, so orphans survive as
    zeros and nothing doc-sized shuffles twice."""
    from zparse_spark.operators.rules import media_refcounts

    docs, cat = _pack_input(spark)
    return media_refcounts(docs, cat).filter(F.col("n_refs") <= 2)


# --- R1 "did-you-mean" repair suggestions (X204) -----------------------


@register(
    "span_pack_ref_suggestions",
    f"""WITH cat AS (
  SELECT DISTINCT media_ref FROM read_parquet('{_W}/span_catalog/*.parquet')
),
ghost AS (
  SELECT DISTINCT s.media_ref AS dangling
  FROM (SELECT unnest(spans) AS s
        FROM read_parquet('{_W}/span_docs/*.parquet'))
  WHERE s.media_ref IS NOT NULL
    AND s.media_ref NOT IN (SELECT media_ref FROM cat)
),
typos AS (
  SELECT substr(media_ref, 1, 3) || substr(media_ref, 5) AS dangling
  FROM cat WHERE substr(media_ref, length(media_ref), 1) = '3'
),
dangling AS (SELECT dangling FROM ghost UNION SELECT dangling FROM typos),
best AS (
  SELECT d.dangling, c.media_ref AS suggestion,
         levenshtein(d.dangling, c.media_ref) AS dist,
         row_number() OVER (PARTITION BY d.dangling
           ORDER BY levenshtein(d.dangling, c.media_ref) ASC, c.media_ref ASC) AS rk
  FROM dangling d JOIN cat c ON levenshtein(d.dangling, c.media_ref) <= 1
)
SELECT d.dangling AS media_ref, b.suggestion, b.dist
FROM dangling d LEFT JOIN best b ON b.dangling = d.dangling AND b.rk = 1""",
)
def span_pack_ref_suggestions(spark, sf_dir):
    """R1 'did-you-mean' repair suggestions (X204): every dangling
    media_ref resolved against the catalog at edit distance <= 1 —
    the repair leg between 'drop the span' (repair_dangling_refs) and
    'fail the doc': a TYPO'D ref (planted: catalog keys ending in '3'
    with their 4th character deleted) is recoverable and gets its
    unique suggestion; a fabricated ref (the fixture's ghost_* class)
    matches nothing and surfaces with a NULL suggestion — the queue a
    human actually triages. Scale path: deletion-neighborhood variant
    hashes on BOTH sides (editdist.py:55 — k=1 neighborhood provably
    covers one substitution/insert/delete), so the join is
    |variants| x equi-hash, never dangling x catalog; the DuckDB twin
    IS the quadratic brute force, so the green row certifies the
    pruned pipeline end to end (the X142 discipline). Argmin is
    (dist, suggestion) — deterministic."""
    from zparse_spark.operators.editdist import deletion_variants

    docs, cat = _pack_input(spark)
    ghost = (
        docs.select(F.explode("spans").alias("s"))
        .select(F.col("s.media_ref").alias("dangling"))
        .filter(F.col("dangling").isNotNull())
        .join(cat.select(F.col("media_ref").alias("dangling")), "dangling", "left_anti")
        .distinct()
    )
    typos = cat.filter(F.substring(F.col("media_ref"), -1, 1) == "3").select(
        F.concat(
            F.substring("media_ref", 1, 3),
            F.expr("substring(media_ref, 5)"),
        ).alias("dangling")
    )
    dangling = ghost.unionByName(typos).distinct()
    dv = dangling.select(
        "dangling", F.explode(deletion_variants(F.col("dangling"), k=1)).alias("_v")
    ).select("dangling", F.md5("_v").alias("_vh"))
    cv = cat.select(
        "media_ref", F.explode(deletion_variants(F.col("media_ref"), k=1)).alias("_v")
    ).select("media_ref", F.md5("_v").alias("_vh"))
    cand = (
        dv.join(cv, "_vh")
        .select("dangling", "media_ref")
        .distinct()
        .withColumn("dist", F.levenshtein("dangling", "media_ref").cast("bigint"))
        .filter(F.col("dist") <= 1)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dangling").orderBy(
        F.col("dist").asc(), F.col("media_ref").asc()
    )
    best = cand.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    return dangling.join(best, "dangling", "left").select(
        F.col("dangling").alias("media_ref"),
        F.col("media_ref").alias("suggestion"),
        "dist",
    )


# --- Within-doc duplicate media_ref rule (X211) ------------------------


@register(
    "span_pack_intradoc_dup_refs",
    f"""WITH sp AS (
  SELECT partition, doc_id, s.media_ref AS media_ref
  FROM (SELECT partition, doc_id, unnest(spans) AS s
        FROM read_parquet('{_W}/span_docs/*.parquet'))
  WHERE s.media_ref IS NOT NULL
)
SELECT partition, doc_id, media_ref, count(*) AS n_spans
FROM sp GROUP BY partition, doc_id, media_ref
HAVING count(*) > 1""",
)
def span_pack_intradoc_dup_refs(spark, sf_dir):
    """Within-document duplicate media_ref audit (X211): the same
    payload embedded twice in ONE document — neither U1 (doc_id
    uniqueness) nor R1 (catalog existence) can see it, yet for a
    training corpus it is the doc-internal twin of media dedup (a
    page rendering the same image twice inflates media tokens exactly
    like repeated text inflates text tokens). One explode + one
    map-side-combined groupBy(doc, ref); output is violation-sparse."""
    from pyspark.sql import functions as F

    docs, _cat = _pack_input(spark)
    sp = (
        docs.select("partition", "doc_id", F.explode("spans").alias("s"))
        .select("partition", "doc_id", F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
    )
    return (
        sp.groupBy("partition", "doc_id", "media_ref")
        .agg(F.count(F.lit(1)).alias("n_spans"))
        .filter(F.col("n_spans") > 1)
    )


# --- Interleave run-length structure profile (X227) --------------------


@register(
    "span_pack_run_lengths",
    f"""WITH sp AS (
  SELECT partition, doc_id, s.kind AS kind,
         row_number() OVER (PARTITION BY partition, doc_id
                            ORDER BY s.offset) AS pos
  FROM (SELECT partition, doc_id, unnest(spans) AS s
        FROM read_parquet('{_W}/span_docs/*.parquet'))
),
grp AS (
  SELECT partition, doc_id, kind, pos,
         pos - row_number() OVER (PARTITION BY partition, doc_id, kind
                                  ORDER BY pos) AS island
  FROM sp
),
runs AS (
  SELECT partition, kind, count(*) AS run_len
  FROM grp GROUP BY partition, doc_id, kind, island
)
SELECT partition, kind, run_len, count(*) AS n_runs
FROM runs GROUP BY partition, kind, run_len""",
)
def span_pack_run_lengths(spark, sf_dir):
    """Interleave STRUCTURE profile (X227): the distribution of
    same-kind run lengths per partition — the shape signal the
    kind-mix drift rule (D1) cannot see: two partitions with identical
    30% media share look the same to D1 whether media arrives as
    singletons woven through text (healthy interleave) or as one
    glued block (a concatenation bug in the assembler). Classic
    gaps-and-islands: position minus per-kind position is constant
    within a run; runs then reduce to a bounded (partition, kind,
    run_len) histogram. One explode + two windows partitioned by doc —
    per-doc frames are span-count bounded."""
    from pyspark.sql import Window, functions as F

    docs, _cat = _pack_input(spark)
    sp = docs.select(
        "partition", "doc_id", F.posexplode("spans").alias("_i", "s")
    ).select(
        "partition", "doc_id", F.col("s.kind").alias("kind"), F.col("s.offset").alias("offset")
    )
    wd = Window.partitionBy("partition", "doc_id").orderBy("offset")
    wk = Window.partitionBy("partition", "doc_id", "kind").orderBy("offset")
    grp = sp.select(
        "partition",
        "doc_id",
        "kind",
        (F.row_number().over(wd) - F.row_number().over(wk)).alias("island"),
    )
    runs = grp.groupBy("partition", "doc_id", "kind", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("partition", "kind", "run_len").agg(
        F.count(F.lit(1)).alias("n_runs")
    )
