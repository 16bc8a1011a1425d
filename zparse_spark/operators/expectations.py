"""Declarative table-level expectation suite — the data-contract runner.

The reference enforces a PER-DOCUMENT contract (strict parse, type
checks, limits — crates/zparse/src/json/parser.rs, error.rs); the
engine's rule pack generalizes that to per-row/per-span table rules
(operators/rules.py). This module adds the third altitude: TABLE-level
expectations over aggregate statistics — "orderkey is unique",
"null rate of lang <= 2%", "p95 of totalprice in [40k, 400k]",
"row count between A and B", "status values in {O,F,P}" — the suite a
release gate runs before publishing a snapshot, in the style users of
declarative expectation frameworks expect.

Scale contract: a suite of K expectations against one table compiles
into ONE aggregation pass over that table (conditional aggregates +
exact interpolated percentiles in the same agg), producing a single
1-row frame from which the K verdict rows are projected. K tables = K
scans, never K x expectations. Exact percentiles use the same
interpolation contract as the quantile family (percentile() <->
DuckDB quantile_cont); uniqueness uses exact two-phase count distinct.

Verdict schema (uniform across kinds):
    (rule_id, table, column, kind, observed, bound_lo, bound_hi, passed)
observed/bounds are DOUBLE so heterogeneous expectations stack into one
frame; counts are exact integers represented exactly (< 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KINDS = (
    "unique",
    "null_rate_max",
    "quantile_band",
    "row_count_between",
    "accepted_values",
    "min_at_least",
    "max_at_most",
)


def expectation_suite(tables: dict[str, DataFrame], spec: list[dict]) -> DataFrame:
    """Run a declarative expectation suite; returns one verdict row per
    expectation.

    ``spec`` entries (dicts):
      {"rule_id": "E1", "table": "orders", "kind": "unique",
       "column": "o_orderkey"}
      {"rule_id": "E2", "table": "documents", "kind": "null_rate_max",
       "column": "lang", "max_rate": 0.02}
      {"rule_id": "E3", "table": "orders", "kind": "quantile_band",
       "column": "o_totalprice", "p": 0.95, "lo": 4e4, "hi": 4e5}
      {"rule_id": "E4", "table": "orders", "kind": "row_count_between",
       "lo": 100, "hi": 1e9}
      {"rule_id": "E5", "table": "orders", "kind": "accepted_values",
       "column": "o_orderstatus", "values": ["O", "F", "P"]}
      {"rule_id": "E6", "table": "lineitem", "kind": "min_at_least",
       "column": "l_quantity", "lo": 0}
      {"rule_id": "E7", "table": "lineitem", "kind": "max_at_most",
       "column": "l_quantity", "hi": 60}

    One scan per table: every expectation on a table contributes its
    aggregate expressions to a single ``agg`` call; the verdict rows
    are then projected from that 1-row frame (bounded work). The
    result unions the per-table verdict frames — |spec| rows total.
    """
    for e in spec:
        if e["kind"] not in _KINDS:
            raise ValueError(f"unknown expectation kind: {e['kind']!r}")
        if e["table"] not in tables:
            raise ValueError(f"expectation {e['rule_id']}: unknown table {e['table']!r}")

    out: DataFrame | None = None
    by_table: dict[str, list[dict]] = {}
    for e in spec:
        by_table.setdefault(e["table"], []).append(e)

    for tname, exps in by_table.items():
        df = tables[tname]
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, e in enumerate(exps):
            c = e.get("column")
            if e["kind"] == "unique":
                # composite keys: pass a list — distinctness over the
                # struct, presence = every part non-null (the SQL-twin
                # convention count(DISTINCT (a, b)) also drops a row iff
                # any part is NULL, matched here explicitly)
                cols = c if isinstance(c, (list, tuple)) else [c]
                all_present = F.lit(True)
                for cc in cols:
                    all_present = all_present & F.col(cc).isNotNull()
                aggs.append(
                    F.count_distinct(
                        F.when(all_present, F.struct(*[F.col(cc) for cc in cols]))
                    ).alias(f"__d{i}")
                )
                aggs.append(F.count(F.when(all_present, 1)).alias(f"__c{i}"))
            elif e["kind"] == "null_rate_max":
                aggs.append(F.count(F.col(c)).alias(f"__c{i}"))
            elif e["kind"] == "quantile_band":
                aggs.append(
                    F.expr(f"percentile({c}, {float(e['p'])!r})").alias(f"__q{i}")
                )
            elif e["kind"] == "accepted_values":
                aggs.append(
                    F.count(
                        F.when(
                            F.col(c).isNotNull() & ~F.col(c).isin(e["values"]), 1
                        )
                    ).alias(f"__b{i}")
                )
            elif e["kind"] == "min_at_least":
                aggs.append(F.min(F.col(c)).alias(f"__m{i}"))
            elif e["kind"] == "max_at_most":
                aggs.append(F.max(F.col(c)).alias(f"__m{i}"))
        # materialize the 1-row aggregate ONCE: the K verdict projections
        # below are separate union branches, and Spark does no CSE across
        # branches — without this the table would be scanned K times,
        # which is exactly the failure mode this operator exists to avoid
        one = df.agg(*aggs).localCheckpoint(eager=True)

        rows = []
        for i, e in enumerate(exps):
            rid, kind, c = e["rule_id"], e["kind"], e.get("column")
            if kind == "unique":
                observed = (F.col(f"__c{i}") - F.col(f"__d{i}")).cast("double")
                lo, hi = F.lit(0.0), F.lit(0.0)
                passed = F.col(f"__c{i}") == F.col(f"__d{i}")
            elif kind == "null_rate_max":
                observed = F.round(
                    (F.col("__n") - F.col(f"__c{i}")).cast("double")
                    / F.greatest(F.col("__n"), F.lit(1)),
                    6,
                )
                lo, hi = F.lit(None).cast("double"), F.lit(float(e["max_rate"]))
                passed = observed <= float(e["max_rate"])
            elif kind == "quantile_band":
                observed = F.round(F.col(f"__q{i}").cast("double"), 6)
                lo, hi = F.lit(float(e["lo"])), F.lit(float(e["hi"]))
                passed = (observed >= float(e["lo"])) & (observed <= float(e["hi"]))
            elif kind == "row_count_between":
                observed = F.col("__n").cast("double")
                lo, hi = F.lit(float(e["lo"])), F.lit(float(e["hi"]))
                passed = (F.col("__n") >= int(e["lo"])) & (F.col("__n") <= int(e["hi"]))
            elif kind == "accepted_values":
                observed = F.col(f"__b{i}").cast("double")
                lo, hi = F.lit(0.0), F.lit(0.0)
                passed = F.col(f"__b{i}") == 0
            elif kind == "min_at_least":
                observed = F.col(f"__m{i}").cast("double")
                lo, hi = F.lit(float(e["lo"])), F.lit(None).cast("double")
                passed = F.col(f"__m{i}") >= float(e["lo"])
            else:  # max_at_most
                observed = F.col(f"__m{i}").cast("double")
                lo, hi = F.lit(None).cast("double"), F.lit(float(e["hi"]))
                passed = F.col(f"__m{i}") <= float(e["hi"])
            col_label = (
                ",".join(c) if isinstance(c, (list, tuple)) else c
            )
            rows.append(
                one.select(
                    F.lit(rid).alias("rule_id"),
                    F.lit(tname).alias("table"),
                    F.lit(col_label).cast("string").alias("column"),
                    F.lit(kind).alias("kind"),
                    observed.alias("observed"),
                    lo.alias("bound_lo"),
                    hi.alias("bound_hi"),
                    F.coalesce(passed, F.lit(False)).alias("passed"),
                )
            )
        frame = rows[0]
        for r in rows[1:]:
            frame = frame.unionByName(r)
        out = frame if out is None else out.unionByName(frame)
    assert out is not None, "empty expectation spec"
    return out


def grouped_expectation_suite(
    tables: dict[str, DataFrame], spec: list[dict]
) -> DataFrame:
    """Per-GROUP expectations — the release-gate difference between
    "the table is fine" and "this source is poisoned": a corpus-wide
    null rate of 1% passes while one source sits at 80% nulls; the
    grouped form bounds EVERY group and reports the worst offender.

    Spec entries add ``by`` (the group column) to a subset of the flat
    suite's kinds:
      {"rule_id": "G1", "table": "documents", "by": "source",
       "kind": "null_rate_max", "column": "lang", "max_rate": 0.1}
      {"rule_id": "G2", "table": "orders", "by": "o_orderpriority",
       "kind": "row_count_min", "min_rows": 100}
      {"rule_id": "G3", "table": "documents", "by": "source",
       "kind": "mean_between", "column": "n_chars", "lo": 100, "hi": 600}

    Verdict schema: (rule_id, table, by, column, kind, n_groups,
    n_failing, worst_group, worst_observed, passed) — passed iff NO
    group violates. Scale shape: expectations sharing (table, by)
    compile into ONE map-side-combined groupBy (conditional aggregates
    per expectation); the verdict rows project from the bounded
    per-group table.
    """
    kinds = ("null_rate_max", "row_count_min", "mean_between")
    for e in spec:
        if e["kind"] not in kinds:
            raise ValueError(f"unknown grouped expectation kind: {e['kind']!r}")
        if e["table"] not in tables:
            raise ValueError(f"expectation {e['rule_id']}: unknown table {e['table']!r}")

    by_key: dict[tuple, list[dict]] = {}
    for e in spec:
        by_key.setdefault((e["table"], e["by"]), []).append(e)

    out: DataFrame | None = None
    for (tname, by), exps in by_key.items():
        df = tables[tname]
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, e in enumerate(exps):
            c = e.get("column")
            if e["kind"] == "null_rate_max":
                aggs.append(F.count(F.col(c)).alias(f"__c{i}"))
            elif e["kind"] == "mean_between":
                aggs.append(F.sum(F.col(c)).alias(f"__s{i}"))
                aggs.append(F.count(F.col(c)).alias(f"__c{i}"))
        per = df.groupBy(F.col(by).alias("__g")).agg(*aggs)

        for i, e in enumerate(exps):
            rid, kind, c = e["rule_id"], e["kind"], e.get("column")
            if kind == "null_rate_max":
                observed = F.round(
                    (F.col("__n") - F.col(f"__c{i}")).cast("double")
                    / F.greatest(F.col("__n"), F.lit(1)),
                    6,
                )
                bad = observed > float(e["max_rate"])
            elif kind == "row_count_min":
                observed = F.col("__n").cast("double")
                bad = F.col("__n") < int(e["min_rows"])
            else:  # mean_between
                observed = F.round(
                    F.col(f"__s{i}").cast("double")
                    / F.greatest(F.col(f"__c{i}"), F.lit(1)),
                    6,
                )
                bad = (observed < float(e["lo"])) | (observed > float(e["hi"]))
            scored = per.select(
                "__g", observed.alias("__obs"), bad.alias("__bad")
            )
            # worst group: max observed among failing (null_rate/mean high
            # side), else the max observed overall — deterministic tie to
            # min group label
            from pyspark.sql import Window

            w = Window.orderBy(
                F.col("__bad").desc(), F.col("__obs").desc(), F.col("__g").asc()
            )
            ranked = scored.select(
                "*", F.row_number().over(w).alias("__rk")
            )
            verdict = ranked.groupBy().agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.count(F.when(F.col("__bad"), 1)).alias("n_failing"),
                F.max(F.when(F.col("__rk") == 1, F.col("__g").cast("string"))).alias(
                    "worst_group"
                ),
                F.max(F.when(F.col("__rk") == 1, F.col("__obs"))).alias(
                    "worst_observed"
                ),
            ).select(
                F.lit(rid).alias("rule_id"),
                F.lit(tname).alias("table"),
                F.lit(by).alias("by"),
                F.lit(c).cast("string").alias("column"),
                F.lit(kind).alias("kind"),
                "n_groups",
                "n_failing",
                "worst_group",
                "worst_observed",
                (F.col("n_failing") == 0).alias("passed"),
            )
            out = verdict if out is None else out.unionByName(verdict)
    assert out is not None, "empty grouped expectation spec"
    return out
