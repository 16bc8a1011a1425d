"""Resume semantics: a rerun validates only uncommitted partitions and
produces no duplicate violations (SURVEY.md §5.2 item 5)."""

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

    # violations written exactly once per partition
    viol = spark.read.parquet(os.path.join(out, "violations"))
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
    must still be caught on resume: U1 is not partition-decomposable, so
    the resumed run evaluates it table-wide and emits the pending
    partition's violation row."""
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
    viol = spark.read.parquet(os.path.join(out, "violations"))
    u1 = viol.filter("rule_id = 'U1'").collect()
    # the pending partition's copy is reported; the committed one is not re-emitted
    assert [(r["partition"], r["doc_id"]) for r in u1] == [("p1", "dup")]


def test_crash_rerun_does_not_duplicate_violations(spark, tmp_path):
    """Simulate dying between the violations write and the manifest
    commit: the rerun re-validates the partition and must REPLACE its
    violation files (dynamic overwrite), not append a second copy."""
    out = str(tmp_path / "run5")
    docs = generate_documents(spark, n_docs=200, seed=5, n_partitions=4).drop("_fixture_class")
    cat = generate_media_catalog(spark)
    eng = ValidationEngine(ValidationConfig(enable_drift=False))

    run_with_manifest(eng, docs, cat, out)
    expected = spark.read.parquet(os.path.join(out, "violations")).count()

    os.remove(os.path.join(out, "manifest.jsonl"))  # crash: data written, commits lost
    rerun = run_with_manifest(eng, docs, cat, out)
    assert len(rerun) == 4
    got = spark.read.parquet(os.path.join(out, "violations")).count()
    assert got == expected
