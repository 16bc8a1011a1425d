

def test_assign_splits_deterministic_and_stable(spark):
    from pyspark.sql import functions as F

    from zparse_spark.operators.filtering import assign_splits

    docs = spark.range(1000).select(F.col("id").cast("string").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in assign_splits(docs, w, seed=3).collect()}
    # exactly one label per row; rough proportions
    from collections import Counter

    c = Counter(a.values())
    assert sum(c.values()) == 1000 and 700 < c["train"] < 900
    # corpus growth never moves an existing key between splits
    bigger = spark.range(5000).select(F.col("id").cast("string").alias("doc_id"))
    b = {r["doc_id"]: r["split"] for r in assign_splits(bigger, w, seed=3).collect()}
    assert all(b[k] == v for k, v in a.items())
    # repartitioning doesn't change assignments (pure function of key)
    c2 = {
        r["doc_id"]: r["split"]
        for r in assign_splits(docs.repartition(13), w, seed=3).collect()
    }
    assert c2 == a
    import pytest

    with pytest.raises(ValueError):
        assign_splits(docs, {"train": 0.5, "val": 0.2})


def test_rebalance_mixture(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from zparse_spark.operators.filtering import rebalance_mixture

    # 800 en / 100 de / 100 other; target 50/50 en/de -> de is the
    # bottleneck (keeps all 100), en keeps ~100, other dropped
    rows = (
        [(f"e{i}", "en") for i in range(800)]
        + [(f"d{i}", "de") for i in range(100)]
        + [(f"x{i}", "xx") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out = rebalance_mixture(df, "lang", {"en": 0.5, "de": 0.5}, seed=1)
    c = Counter(r["lang"] for r in out.collect())
    assert c["de"] == 100          # bottleneck keeps everything
    assert "xx" not in c           # non-target dropped
    assert 70 < c["en"] < 130      # ~100 in expectation (hash variance)
    # deterministic: same seed, same set, any partitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in rebalance_mixture(
            df.repartition(7), "lang", {"en": 0.5, "de": 0.5}, seed=1
        ).collect()
    )
    assert a == b
    # empty target intersection -> empty result
    assert rebalance_mixture(df, "lang", {"fr": 1.0}).count() == 0


def test_rebalance_mixture_zero_share_drops(spark):
    from pyspark.sql import functions as F

    from zparse_spark.operators.filtering import rebalance_mixture

    df = spark.createDataFrame(
        [("a", "en"), ("b", "en"), ("c", "de")], "doc_id string, lang string"
    )
    out = rebalance_mixture(df, "lang", {"en": 1.0, "de": 0.0}, seed=2)
    assert sorted(r["doc_id"] for r in out.collect()) == ["a", "b"]
