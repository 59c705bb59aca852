"""BM25 ranked retrieval (operators/retrieval.py).

Reference formula checked against an independent plain-Python scorer on a
hand-built corpus, plus physical-plan guards for the inverted-index access
path (broadcast query-term probe; no Python UDFs).
"""

import math

import pytest
from pyspark.sql import functions as F

from doctr_spark.operators.retrieval import bm25_topk, tokenize_words

DOCS = [
    (1, "spark spark window"),
    (2, "window agg engine"),
    (3, "hash join table"),
    (4, "spark window window agg"),
]
QUERIES = [(0, "spark window"), (1, "join")]


def _py_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Independent scorer: tokenize, tf/df/dl, Lucene non-negative idf."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in query_terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            dl = len(t)
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + s
    return scores


def test_bm25_matches_independent_scorer(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    out = bm25_topk(docs, q, k=10).collect()

    for qid, qtext in QUERIES:
        expect = _py_bm25(DOCS, qtext.split())
        got = {r.doc_id: r.score for r in out if r.query_id == qid}
        assert set(got) == set(expect)
        for d, s in expect.items():
            assert got[d] == pytest.approx(round(s, 6), abs=2e-6)


def test_bm25_rank_and_tiebreak(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame([(0, "spark window")], "query_id long, qtext string")
    rows = sorted(bm25_topk(docs, q, k=2).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == [1, 2]
    # both-term docs outrank the single-term doc; k caps the result
    assert {r.doc_id for r in rows} <= {1, 4}
    assert rows[0].score >= rows[1].score
    # deterministic tie-break: equal scores order by doc_id asc
    tied = spark.createDataFrame(
        [(7, "alpha beta"), (3, "alpha beta")], "doc_id long, text string"
    )
    tq = spark.createDataFrame([(0, "alpha")], "query_id long, qtext string")
    trows = sorted(bm25_topk(tied, tq, k=2).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in trows] == [3, 7]


def test_bm25_n_terms_counts_matched_query_terms(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame([(0, "spark window nosuchterm")], "query_id long, qtext string")
    out = {r.doc_id: r.n_terms for r in bm25_topk(docs, q, k=10).collect()}
    assert out == {1: 2, 4: 2, 2: 1}


def test_tokenizer_lowercases_and_splits_nonalnum(spark):
    df = spark.range(1).select(tokenize_words(F.lit("Spark-SQL, v3.5!")).alias("t"))
    assert df.collect()[0].t == ["spark", "sql", "v3", "5"]


def test_bm25_plan_broadcasts_query_probe(spark):
    """The inverted-index access path: the tiny query-term set reaches the
    postings scan as a broadcast (never a shuffled join), and no Python
    UDF appears anywhere in the plan."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    plan = bm25_topk(docs, q, k=10)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("BroadcastHashJoin") >= 3  # term probe, qterms, df_by_term
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
