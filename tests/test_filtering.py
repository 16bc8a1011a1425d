

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
