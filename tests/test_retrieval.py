"""BM25 invariants on a hand corpus."""
import duckdb
import numpy as np
import pandas as pd

from osmnightwatch_spark.operators.retrieval import bm25_topk, bm25_topk_sql


def _hand_bm25(texts, query, k1=1.2, b=0.75):
    """Independent reference implementation (plain Python)."""
    import math
    toks = [t.split(" ") for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    terms = sorted(set(query.split(" ")))
    dfs = {t: sum(1 for d in toks if t in d) for t in terms}
    out = []
    for i, d in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(d) / avgdl))
        out.append((i, s))
    return sorted(out, key=lambda x: (-x[1], x[0]))


def test_bm25_hand_corpus(spark):
    texts = [
        "spark join hash join fast",          # 2x join + hash
        "hash table scan",                    # hash only
        "sort merge join",                    # join only
        "completely unrelated words here",    # no hit -> score 0
        "join join join join join join",      # tf saturation case
    ]
    pdf = pd.DataFrame({"doc_id": range(5), "text": texts})
    got = bm25_topk(spark.createDataFrame(pdf), "join hash", k=5).toPandas()
    want = _hand_bm25(texts, "join hash")
    assert list(got.doc_id) == [i for i, _ in want]
    assert np.allclose(got.score, [s for _, s in want], rtol=0, atol=1e-12)
    # saturation: doc 4 (6x join) must NOT beat doc 0 (2x join + hash)
    assert got.doc_id.iloc[0] == 0
    # no-hit doc scores exactly 0 and ranks last
    assert got.score.iloc[-1] == 0.0 and got.doc_id.iloc[-1] == 3

    con = duckdb.connect(); con.register("t", pdf)
    twin = con.execute(bm25_topk_sql("t", "join hash", k=5)).fetchdf()
    assert list(twin.doc_id) == list(got.doc_id)
    assert np.allclose(twin.score, got.score, rtol=0, atol=1e-12)


def test_bm25_unseen_term_and_dedup_terms(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a a a"]})
    df = spark.createDataFrame(pdf)
    # duplicate query tokens dedupe; unseen term contributes 0 everywhere
    g1 = bm25_topk(df, "a a zzz", k=2).toPandas()
    g2 = bm25_topk(df, "a zzz", k=2).toPandas()
    pd.testing.assert_frame_equal(g1, g2)
    assert (g1.score > 0).all()


def test_bm25_hostile_terms_and_empty_corpus(spark):
    """Query terms named like internal columns ('_doc', '_len') or
    containing '.' must not collide with the pivot (positional tf_i
    names); an empty corpus raises a clear error, not ZeroDivision."""
    import pytest

    from osmnightwatch_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(
        [(1, "_doc x.y _len"), (2, "_doc _doc plain"), (3, "other words")],
        "doc_id long, text string")
    out = bm25_topk(df, "_doc x.y _len", k=3).collect()
    assert [r.doc_id for r in out[:2]] == [1, 2]  # doc 1 hits all 3 terms
    assert out[2].score == 0.0

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        bm25_topk(empty, "x")
