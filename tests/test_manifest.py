"""Resume semantics: a rerun validates only uncommitted partitions and
produces no duplicate violations (SURVEY.md §5.2 item 5); table-wide
rules re-evaluate over the full table into their own sink; sinks are
namespaced by rules_hash; the manifest itself can be JSONL or a parquet
table."""

from __future__ import annotations

import os

from zparse_spark.plans.engine import ValidationConfig, ValidationEngine
from zparse_spark.plans.manifest import Manifest, run_with_manifest
from zparse_spark.sources.datagen import generate_documents, generate_media_catalog


def test_resume_skips_committed_partitions(spark, tmp_path):
    out = str(tmp_path / "run1")
    docs = generate_documents(spark, n_docs=200, seed=5, n_partitions=4).drop("_fixture_class")
    cat = generate_media_catalog(spark)
    eng = ValidationEngine(ValidationConfig(enable_drift=False))

    first = run_with_manifest(eng, docs, cat, out)
    assert sorted(first) == sorted(
        r["partition"] for r in docs.select("partition").distinct().collect()
    )

    # second run: nothing pending
    second = run_with_manifest(eng, docs, cat, out)
    assert second == []

    # violations written exactly once per partition (both sinks combined)
    viol = Manifest(out).read_violations(spark, eng.config.rules_hash())
    base = eng.violations(docs, cat)
    assert viol.count() == base.count()


def test_partial_manifest_resumes_remainder(spark, tmp_path):
    out = str(tmp_path / "run2")
    docs = generate_documents(spark, n_docs=200, seed=5, n_partitions=4).drop("_fixture_class")
    cat = generate_media_catalog(spark)
    eng = ValidationEngine(ValidationConfig(enable_drift=False))
    rh = eng.config.rules_hash()

    parts = sorted(r["partition"] for r in docs.select("partition").distinct().collect())
    m = Manifest(out)
    m.commit(parts[0], rh, 0, 0)  # pretend partition 0 already done

    done = run_with_manifest(eng, docs, cat, out)
    assert sorted(done) == parts[1:]


def test_rules_hash_invalidates_resume(spark, tmp_path):
    out = str(tmp_path / "run3")
    m = Manifest(out)
    m.commit("p000", "stale_hash", 1, 0)
    eng = ValidationEngine()
    assert m.committed_partitions(spark, eng.config.rules_hash()) == set()


def test_resume_runs_table_rules_over_full_table(spark, tmp_path):
    """A doc_id duplicated across a COMMITTED and a PENDING partition
    must flag BOTH copies on resume: U1 runs table-wide into its own
    sink (violations_table), which is never partition-filtered — the
    committed partition's row is no longer silently lost (round-2
    ADVICE)."""
    from tests.conftest import make_docs

    out = str(tmp_path / "run4")
    span = [("text", "hello world", None, 0)]
    docs = make_docs(
        spark,
        [("a", span, "p0"), ("dup", span, "p0"), ("b", span, "p1"), ("dup", span, "p1")],
    )
    eng = ValidationEngine(ValidationConfig(enable_drift=False, enable_referential=False))
    m = Manifest(out)
    m.commit("p0", eng.config.rules_hash(), 2, 0)  # p0 committed before the dup landed in p1

    done = run_with_manifest(eng, docs, None, out)
    assert done == ["p1"]
    viol = m.read_violations(spark, eng.config.rules_hash())
    u1 = sorted(
        (r["partition"], r["doc_id"]) for r in viol.filter("rule_id = 'U1'").collect()
    )
    assert u1 == [("p0", "dup"), ("p1", "dup")]


def test_crash_rerun_does_not_duplicate_violations(spark, tmp_path):
    """Simulate dying between the violations write and the manifest
    commit: the rerun re-validates the partition and must REPLACE its
    violation files (dynamic overwrite), not append a second copy."""
    out = str(tmp_path / "run5")
    docs = generate_documents(spark, n_docs=200, seed=5, n_partitions=4).drop("_fixture_class")
    cat = generate_media_catalog(spark)
    eng = ValidationEngine(ValidationConfig(enable_drift=False))
    rh = eng.config.rules_hash()

    run_with_manifest(eng, docs, cat, out)
    expected = Manifest(out).read_violations(spark, rh).count()

    os.remove(os.path.join(out, "manifest.jsonl"))  # crash: data written, commits lost
    rerun = run_with_manifest(eng, docs, cat, out)
    assert len(rerun) == 4
    got = Manifest(out).read_violations(spark, rh).count()
    assert got == expected


def test_parquet_backed_manifest_resume(spark, tmp_path):
    """The cluster-deployment manifest shape: commit rows live in a
    parquet table next to the data; resume works identically."""
    out = str(tmp_path / "run6")
    docs = generate_documents(spark, n_docs=200, seed=5, n_partitions=4).drop("_fixture_class")
    cat = generate_media_catalog(spark)
    eng = ValidationEngine(ValidationConfig(enable_drift=False))
    m = Manifest(out, fmt="parquet")

    first = run_with_manifest(eng, docs, cat, out, manifest=m)
    assert len(first) == 4
    assert not os.path.exists(os.path.join(out, "manifest.jsonl"))
    assert os.path.isdir(os.path.join(out, "manifest_table"))

    # a FRESH Manifest object (new driver) sees the commits
    m2 = Manifest(out, fmt="parquet")
    assert len(m2.committed_partitions(spark, eng.config.rules_hash())) == 4
    assert run_with_manifest(eng, docs, cat, out, manifest=m2) == []
    assert m2.as_dataframe(spark).count() == 4


def test_rules_hash_change_does_not_mix_stale_violations(spark, tmp_path):
    """After a rule change every partition re-validates under the new
    hash; readback for the new hash must contain ONLY new-rule rows even
    though the old namespace still holds the old files (round-2 ADVICE:
    previously a partition with zero new-rule violations kept stale
    files in the shared directory)."""
    from zparse_spark.operators.rules import RuleParams

    out = str(tmp_path / "run7")
    docs = generate_documents(spark, n_docs=200, seed=5, n_partitions=4).drop("_fixture_class")
    cat = generate_media_catalog(spark)

    strict = ValidationEngine(
        ValidationConfig(params=RuleParams(max_spans=1), enable_drift=False)
    )  # every multi-span doc violates S3
    lax = ValidationEngine(ValidationConfig(enable_drift=False))
    assert strict.config.rules_hash() != lax.config.rules_hash()

    run_with_manifest(strict, docs, cat, out)
    n_strict = Manifest(out).read_violations(spark, strict.config.rules_hash()).count()
    assert n_strict > 0

    run_with_manifest(lax, docs, cat, out)
    lax_viol = Manifest(out).read_violations(spark, lax.config.rules_hash())
    assert lax_viol.filter("rule_id = 'S3'").count() == 0  # no stale strict rows
    # the strict namespace is untouched
    assert Manifest(out).read_violations(spark, strict.config.rules_hash()).count() == n_strict


def test_violation_rate_regressions(spark):
    from zparse_spark.plans.manifest import violation_rate_regressions

    rows = [
        # p0: 1% -> 5% under the same rules: flags (delta .04 > .01, 5x > 2x)
        ("p0", "h1", "done", 1000, 10, "2026-08-01T00:00:00Z"),
        ("p0", "h1", "done", 1000, 50, "2026-08-02T00:00:00Z"),
        # p1: 1% -> 1.5%: ratio < 2 -> no flag
        ("p1", "h1", "done", 1000, 10, "2026-08-01T00:00:00Z"),
        ("p1", "h1", "done", 1000, 15, "2026-08-02T00:00:00Z"),
        # p2: 0 -> 0.5%: below min_delta=0.01 -> noise floor, no flag
        ("p2", "h1", "done", 1000, 0, "2026-08-01T00:00:00Z"),
        ("p2", "h1", "done", 1000, 5, "2026-08-02T00:00:00Z"),
        # p3: first-ever run cannot regress
        ("p3", "h1", "done", 1000, 900, "2026-08-02T00:00:00Z"),
        # p4: jump under a CHANGED rule set -> flagged with rules_changed
        ("p4", "h1", "done", 1000, 10, "2026-08-01T00:00:00Z"),
        ("p4", "h2", "done", 1000, 100, "2026-08-02T00:00:00Z"),
        # p5: three runs; only latest-vs-previous is judged (5% -> 1%: recovery)
        ("p5", "h1", "done", 1000, 50, "2026-08-01T00:00:00Z"),
        ("p5", "h1", "done", 1000, 10, "2026-08-02T00:00:00Z"),
    ]
    m = spark.createDataFrame(
        rows,
        "partition string, rules_hash string, status string, n_docs long, "
        "n_violations long, ts string",
    )
    out = {r.partition: r for r in violation_rate_regressions(m).collect()}
    assert set(out) == {"p0", "p4"}
    p0 = out["p0"]
    assert (p0.prev_rate, p0.rate_now, p0.delta) == (0.01, 0.05, 0.04)
    assert p0.rules_changed is False
    assert out["p4"].rules_changed is True
