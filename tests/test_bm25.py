from __future__ import annotations

import math

import pytest

from zparse_spark.functions.text import bm25_search

K1, B = 1.2, 0.75


def _brute_bm25(docs: dict[str, str], terms: list[str], top_k: int):
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in docs.items()}
    toks = {d: ts for d, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    df = {
        q: sum(1 for ts in toks.values() if q in ts) for q in terms
    }
    out = []
    for d, ts in toks.items():
        contribs = []
        for q in sorted(set(t.lower() for t in terms)):
            tf = ts.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            c = idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
            contribs.append(round(c, 6))
        if contribs:
            out.append((d, round(sum(contribs), 6), len(contribs)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:top_k]


@pytest.fixture()
def corpus(spark):
    docs = {
        "a": "spark merge window spark spark",
        "b": "merge merge merge merge merge merge merge merge",
        "c": "window",
        "d": "nothing relevant here at all whatsoever in this one",
        "e": "spark window merge spark window merge spark window merge",
        "f": "   ",
        "g": "spark",
    }
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    return docs, df


def test_matches_brute_force(corpus, spark):
    docs, df = corpus
    terms = ["spark", "window", "merge"]
    got = [
        (r.doc_id, r.score, r.n_hit)
        for r in bm25_search(df, terms, top_k=5).orderBy("rank").collect()
    ]
    assert got == _brute_bm25(docs, terms, 5)


def test_rank_is_dense_and_deterministic(corpus, spark):
    _, df = corpus
    a = bm25_search(df, ["spark", "merge"], top_k=10).collect()
    b = bm25_search(df, ["merge", "SPARK", "spark"], top_k=10).collect()
    # case-folded, deduped query terms; identical result either way
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    ranks = sorted(r.rank for r in a)
    assert ranks == list(range(1, len(ranks) + 1))


def test_df_zero_term_and_miss_only_docs_excluded(corpus, spark):
    _, df = corpus
    rows = bm25_search(df, ["unicorn"], top_k=10).collect()
    assert rows == []
    rows = bm25_search(df, ["unicorn", "window"], top_k=10).collect()
    assert {r.doc_id for r in rows} == {"a", "c", "e"}
    assert all(r.n_hit == 1 for r in rows)


def test_empty_query_raises(corpus, spark):
    _, df = corpus
    with pytest.raises(ValueError):
        bm25_search(df, [])


# ---------------------------------------------------------------------------
# rrf_fuse (reciprocal-rank fusion)
# ---------------------------------------------------------------------------


def test_rrf_hand_computed(spark):
    from zparse_spark.functions.text import rrf_fuse

    l1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    l2 = spark.createDataFrame([(3, 1), (4, 2), (1, 3)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse({"lex": l1, "dense": l2}).collect()}
    assert round(1 / 61 + 1 / 63, 6) == out[1].rrf == out[3].rrf
    assert out[2].rrf == round(1 / 62, 6)
    assert out[4].rrf == round(1 / 62, 6)
    # tie → id ascending, both for the top pair and the bottom pair
    ranks = {d: out[d].fused_rank for d in out}
    assert ranks == {1: 1, 3: 2, 2: 3, 4: 4}
    # absent docs carry NULL system ranks
    assert out[2].dense_rank is None and out[4].lex_rank is None


def test_rrf_top_k_and_single_system(spark):
    import pytest

    from zparse_spark.functions.text import rrf_fuse

    l1 = spark.createDataFrame([(i, i) for i in range(1, 9)], "doc_id long, rank int")
    out = rrf_fuse({"only": l1}, top_k=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    with pytest.raises(ValueError):
        rrf_fuse({})


def test_retrieval_ndcg_hand_case(spark):
    """X144: tiny corpus where the ideal ordering differs from BM25's —
    nDCG computed by hand. Query terms (a, b): docA contains both (grade
    2), docB/docC one each (grade 1); with docA long and terms diluted,
    the hand-check asserts the formula, bounds, and MRR semantics."""
    import math

    from zparse_spark.functions.text import retrieval_ndcg

    rows = [
        ("A", "a b " + "x " * 50),
        ("B", "a a a"),
        ("C", "b"),
        ("D", "z z z"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = retrieval_ndcg(df, ["a", "b"], top_k=3).collect()[0]
    assert out["n_ranked"] == 3
    # grades: A=2, B=1, C=1 -> IDCG = 3/log2(2) + 1/log2(3) + 1/log2(4)
    idcg = round(
        round(3 / math.log2(2), 6) + round(1 / math.log2(3), 6) + round(1 / math.log2(4), 6),
        6,
    )
    assert abs(out["idcg"] - idcg) < 1e-9
    assert 0.0 < out["ndcg"] <= 1.0
    assert abs(out["ndcg"] - round(round(out["dcg"], 6) / idcg, 6)) < 1e-9
    # MRR: 1 / rank of the first grade>=2 doc (A)
    assert out["mrr"] in {1.0, 0.5, round(1 / 3, 6)}
    # a ranking that puts A first would make dcg == idcg; verify the
    # relationship is consistent either way
    assert out["dcg"] <= idcg + 1e-9
