"""Data contracts: profile → YAML file → enforcement, as one loop.

X103 turns profiling into ready-to-run CHECK predicates; this module
makes them a durable ARTIFACT — a human-reviewable, versionable YAML
file (the industry "data contract") that the producer checks in and the
validator enforces on every subsequent run. The reference's contract is
its grammar (a JSON document either parses or errors, json/parser.rs);
a table engine's contract is declared the same way the reference's
fixtures are: a file, not code.

Format (YAML 1.1 core schema, the X43/C6-proven subset):

    version: 1
    table: documents
    columns:            # observed schema, informational
      - {name: doc_id, dtype: string}
    checks:             # enforceable K-rules (X36 grammar)
      - {rule_id: K100, level: doc, predicate: "n_spans <= 128",
         family: numeric_range, n_support: 2000}

Import ignores unknown keys (forward compatibility) and returns the
engine's own CheckConstraint objects, so contract checks flow through
the same violation schema, verdict grid, rules_hash and resume
discipline as every built-in rule. Round-trip is pytest-gated:
import(export(df)) enforces cleanly on the data that produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from zparse_spark.operators.rules import CheckConstraint


def export_contract(
    docs: DataFrame,
    table: str = "documents",
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    level: str = "doc",
    rule_id_base: int = 100,
) -> str:
    """Profile ``docs`` (doc-level projection: the same computed columns
    doc-level CHECKs see — n_spans, total_text_bytes — may be passed as
    ``numeric_cols`` after projecting them) and render the suggested
    constraints as a YAML contract string. Deterministic: suggestion
    order is the X103 row order, rule ids are sequential from
    ``rule_id_base``, and keys are emitted in a fixed order."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pyyaml not available in this environment") from e

    from zparse_spark.operators.stats import suggest_check_constraints

    sugg = suggest_check_constraints(
        docs,
        numeric_cols=numeric_cols or [],
        categorical_cols=categorical_cols or [],
    ).collect()
    checks = [
        {
            "rule_id": f"K{rule_id_base + i}",
            "level": level,
            "predicate": r.suggested_predicate,
            "family": r.family,
            "n_support": r.n_support,
        }
        for i, r in enumerate(sugg)
    ]
    doc = {
        "version": 1,
        "table": table,
        "columns": [
            {"name": f.name, "dtype": f.dataType.simpleString()}
            for f in docs.schema.fields
        ],
        "checks": checks,
    }
    return yaml.safe_dump(doc, sort_keys=False)


def import_contract(text: str) -> list[CheckConstraint]:
    """Parse a contract file into engine CheckConstraints. Unknown keys
    are ignored (forward compatibility); a malformed entry raises with
    the entry named — a contract is config, and bad config fails loud
    at construction, never mid-job (the engine re-validates ids/levels
    in ValidationEngine.__init__)."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pyyaml not available in this environment") from e

    doc = yaml.safe_load(text)
    if not isinstance(doc, dict) or "checks" not in doc:
        raise ValueError("contract: expected a mapping with a 'checks' list")
    out: list[CheckConstraint] = []
    for i, c in enumerate(doc["checks"] or []):
        if not isinstance(c, dict) or not {"rule_id", "level", "predicate"} <= set(c):
            raise ValueError(f"contract: checks[{i}] needs rule_id/level/predicate")
        out.append(
            CheckConstraint(
                rule_id=str(c["rule_id"]),
                level=str(c["level"]),
                predicate=str(c["predicate"]),
            )
        )
    return out
