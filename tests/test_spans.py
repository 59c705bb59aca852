"""Exact repeated-span dedup (operators/spans.py)."""

from pyspark.sql import functions as F

from doctr_spark.operators.spans import duplicated_spans, strip_duplicated_spans

BOILER = "this content is provided as is without warranty of any kind"  # 11 words


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_boilerplate_is_one_merged_span(spark):
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, f"totally different opening words here {BOILER}"),
            (3, "no duplicated text in this document at all period end stop"),
        ],
    )
    out = {r.doc_id: r for r in duplicated_spans(docs, n=8, min_count=2).collect()}
    assert set(out) == {1, 2}
    # doc 1: boiler occupies word positions 2..12 -> 4 overlapping 8-grams
    # (starts 2..5) merge into one island
    assert (out[1].span_start, out[1].span_end, out[1].n_tokens, out[1].n_grams) == (2, 12, 11, 4)
    # doc 2: boiler at positions 5..15
    assert (out[2].span_start, out[2].span_end) == (5, 15)


def test_within_doc_repeat_counts_toward_min_count(spark):
    docs = _docs(spark, [(1, f"{BOILER} filler one two three four five six seven {BOILER}")])
    spans = duplicated_spans(docs, n=8, min_count=2).collect()
    # the repeated block duplicates itself inside one document: two islands
    assert len(spans) == 2
    assert all(s.n_tokens == 11 for s in spans)


def test_min_count_threshold_filters(spark):
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER}"),
            (2, f"gamma delta {BOILER}"),
        ],
    )
    assert duplicated_spans(docs, n=8, min_count=3).count() == 0
    assert duplicated_spans(docs, n=8, min_count=2).count() == 2


def test_disjoint_islands_stay_separate(spark):
    head = "one two three four five six seven eight"
    tail = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
    docs = _docs(
        spark,
        [
            (1, f"{head} unique middle words in between here now {tail}"),
            (2, f"{head} completely other middle padding text goes here {tail}"),
        ],
    )
    spans = sorted(
        duplicated_spans(docs, n=8, min_count=2).filter(F.col("doc_id") == 1).collect(),
        key=lambda r: r.span_start,
    )
    assert [(s.span_start, s.span_end) for s in spans] == [(0, 7), (15, 22)]


def test_strip_removes_exactly_the_span_tokens(spark):
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, f"totally different opening words here {BOILER}"),
            (3, "unique document stays untouched through the strip pass entirely"),
        ],
    )
    out = {r.doc_id: r for r in strip_duplicated_spans(docs, n=8, min_count=2).collect()}
    assert out[1].clean_text == "alpha beta gamma delta"
    assert (out[1].n_tokens_kept, out[1].n_tokens_dropped) == (4, 11)
    assert out[2].clean_text == "totally different opening words here"
    assert out[3].n_tokens_dropped == 0
    assert out[3].clean_text == "unique document stays untouched through the strip pass entirely"


def test_strip_keeps_token_free_docs(spark):
    docs = _docs(
        spark,
        [(1, f"alpha beta {BOILER}"), (2, f"gamma delta {BOILER}"), (3, ""), (4, "!!! ---")],
    )
    out = {r.doc_id: r for r in strip_duplicated_spans(docs, n=8, min_count=2).collect()}
    assert set(out) == {1, 2, 3, 4}
    for d in (3, 4):
        assert (out[d].clean_text, out[d].n_tokens_kept, out[d].n_tokens_dropped) == ("", 0, 0)


def test_short_docs_below_n_are_ignored(spark):
    docs = _docs(spark, [(1, "short doc"), (2, "short doc")])
    assert duplicated_spans(docs, n=8, min_count=2).count() == 0


def test_plan_is_all_jvm(spark):
    docs = _docs(spark, [(1, f"alpha {BOILER}"), (2, f"beta {BOILER}")])
    plan = duplicated_spans(docs, n=8, min_count=2)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the duplicated-set join runs on the 64-bit hash, not the gram text
    assert "gram_hash" in plan
