"""CI / human reporting surface over the verdict grid.

The reference is a CLI whose exit code and stderr ARE its report
(zparse-cli main.rs); a recurring table validator additionally lives
inside CI systems and dashboards, which consume two lingua francas:
JUnit XML (every CI renders it natively — each (partition, rule) cell
becomes a testcase, failing cells carry the violation count and sample
messages) and Markdown (the run summary a human reads in the PR/alert).

Both renderers consume the ALREADY-AGGREGATED verdict grid and a
bounded violation sample — grid cells number |partitions| × |rules|
and the sample is capped per cell, so report generation never touches
document data and collects only kilobytes to the driver.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(verdicts: DataFrame) -> list:
    return sorted(
        verdicts.collect(), key=lambda r: (r["partition"] or "", r["rule_id"])
    )


def _sample_messages(violations: DataFrame | None, per_cell: int = 3) -> dict:
    """Up to ``per_cell`` deterministic example messages per failing
    (partition, rule) — a bounded window on the violation table, never
    an unbounded collect."""
    if violations is None:
        return {}
    from pyspark.sql import Window

    w = Window.partitionBy("partition", "rule_id").orderBy(
        F.col("doc_id").asc_nulls_last(), F.col("message").asc()
    )
    rows = (
        violations.select("partition", "rule_id", "doc_id", "message")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cell)
        .collect()
    )
    out: dict = {}
    for r in rows:
        out.setdefault((r["partition"], r["rule_id"]), []).append(
            f"{r['doc_id']}: {r['message']}"
        )
    return out


def junit_xml(
    verdicts: DataFrame,
    violations: DataFrame | None = None,
    suite_name: str = "zparse_spark_validation",
) -> str:
    """Render the dense verdict grid as a JUnit XML string: testsuite
    per run, testcase per (partition, rule) cell; a failing cell is a
    <failure> whose text carries the violation count and up to three
    sample messages. Passing cells are present (CI totals mean
    something), skipped/error states unused (validation has no flaky
    middle state — a cell passed or it did not)."""
    cells = _cells(verdicts)
    samples = _sample_messages(violations)
    n_fail = sum(1 for c in cells if not c["passed"])
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<testsuite name="{escape(suite_name)}" tests="{len(cells)}" '
        f'failures="{n_fail}" errors="0" skipped="0">',
    ]
    for c in cells:
        name = escape(f"{c['rule_id']}[{c['partition']}]")
        if c["passed"]:
            lines.append(f'  <testcase classname="{escape(str(c["partition"]))}" name="{name}"/>')
        else:
            msgs = samples.get((c["partition"], c["rule_id"]), [])
            body = escape(
                "\n".join([f"violations: {c['violation_count']}"] + msgs)
            )
            lines.append(
                f'  <testcase classname="{escape(str(c["partition"]))}" name="{name}">'
            )
            lines.append(
                f'    <failure message="{c["violation_count"]} violation(s)">{body}</failure>'
            )
            lines.append("  </testcase>")
    lines.append("</testsuite>")
    return "\n".join(lines) + "\n"


def markdown_report(
    verdicts: DataFrame,
    violations: DataFrame | None = None,
    title: str = "Validation report",
) -> str:
    """Human-readable run summary: totals, per-rule rollup, the failing
    cells (worst first), sample messages. Same bounded inputs as
    junit_xml — kilobytes, not data."""
    cells = _cells(verdicts)
    samples = _sample_messages(violations)
    failing = [c for c in cells if not c["passed"]]
    by_rule: dict = {}
    for c in cells:
        agg = by_rule.setdefault(c["rule_id"], [0, 0, 0])
        agg[0] += 1
        if not c["passed"]:
            agg[1] += 1
            agg[2] += c["violation_count"]
    out = [f"# {title}", ""]
    out.append(
        f"**{len(cells)} cells** ({len({c['partition'] for c in cells})} partitions × "
        f"{len(by_rule)} rules) — **{len(failing)} failing**"
    )
    out += ["", "| rule | cells | failing | violations |", "|---|---|---|---|"]
    for rid in sorted(by_rule):
        n, f_, v = by_rule[rid]
        out.append(f"| {rid} | {n} | {f_} | {v} |")
    if failing:
        out += ["", "## Failing cells", ""]
        for c in sorted(failing, key=lambda c: -c["violation_count"]):
            out.append(
                f"- **{c['rule_id']}** @ `{c['partition']}` — "
                f"{c['violation_count']} violation(s)"
            )
            for m in samples.get((c["partition"], c["rule_id"]), []):
                out.append(f"  - `{m}`")
    return "\n".join(out) + "\n"
