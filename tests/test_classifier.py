"""Linear quality-classifier inference (operators/classifier.py)."""

import math

import pytest

from doctr_spark.operators.classifier import (
    DEFAULT_BIAS,
    DEFAULT_OOV_WEIGHT,
    classify_quality,
    default_quality_weights,
)


def _sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_match_independent_computation(spark):
    rows = [
        (1, "the cat and the dog were there because they should"),
        (2, "buy cheap viagra click here free discount sale offer"),
        (3, "zx qv wq xx zz"),  # all OOV
    ]
    out = {r.doc_id: r for r in classify_quality(_docs(spark, rows)).collect()}
    w = dict(default_quality_weights())
    for doc_id, text in rows:
        toks = text.split()
        mean_w = sum(w.get(t, DEFAULT_OOV_WEIGHT) for t in toks) / len(toks)
        expect = _sigmoid(DEFAULT_BIAS + mean_w)
        assert out[doc_id].q_score == pytest.approx(round(expect, 6), abs=2e-6)
        assert out[doc_id].n_tokens == len(toks)
    # prose scores above the spam page, which scores below the OOV page
    assert out[1].q_score > out[3].q_score > out[2].q_score
    assert out[1].q_label and not out[2].q_label


def test_empty_doc_gets_model_prior(spark):
    out = classify_quality(_docs(spark, [(1, ""), (2, "   ")])).collect()
    prior = round(_sigmoid(DEFAULT_BIAS), 6)
    assert {r.doc_id: (r.n_tokens, r.q_score) for r in out} == {1: (0, prior), 2: (0, prior)}


def test_custom_weight_table_drops_in(spark):
    docs = _docs(spark, [(1, "good good"), (2, "bad bad")])
    out = {
        r.doc_id: r.q_label
        for r in classify_quality(
            docs, weights=[("good", 3.0), ("bad", -3.0)], bias=0.0
        ).collect()
    }
    assert out == {1: True, 2: False}


def test_plan_broadcasts_weights_all_jvm(spark):
    docs = _docs(spark, [(1, "the cat"), (2, "buy now")])
    plan = classify_quality(docs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
