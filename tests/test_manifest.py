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
