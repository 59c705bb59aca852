"""Linear text-classifier inference (fastText / CCNet-style quality filter).

Production training-data pipelines gate documents with a *learned* linear
classifier (CCNet's fastText quality model, the GPT-3 WebText-vs-Common-
Crawl filter), not only hand heuristics like
:func:`doctr_spark.functions.text.quality_score`. This module is the
inference operator for that class of model, with the same committed-
weights discipline as the OCR model seam (``plans/tiny_conv.py``): the
weight table is DATA passed in by the caller, and scoring is pure
DataFrame algebra, so a real trained model drops in as a weight table
with zero plan changes.

Model form — binary logistic over averaged token weights (fastText with
1-dim "vectors", which is exactly a linear bag-of-words model):

    score = sigmoid(bias + mean_t w(t)),  w(t) = oov_weight if unseen

Scale shape:

- The vocabulary is small relative to the corpus (fastText quality models
  ship ~100k-1M rows of a few bytes) → **broadcast** hash join against
  the exploded token stream; tokens never shuffle.
- Per-document aggregation is a map-side-combined groupBy on the doc id —
  the only exchange, carrying one slim row per document.
- All JVM expressions; no Python in the scoring path.

``default_quality_weights()`` ships a deterministic committed stand-in
(function-word and prose-marker tokens positive, boilerplate/spam markers
negative) so the operator is runnable and oracle-checkable in this
sandbox, where no trained fastText artifact is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doctr_spark.operators.retrieval import tokenize_words

# committed stand-in weight table: token -> weight. Prose function words /
# discourse markers score positive, boilerplate-spam markers negative —
# the signal axis a trained quality fastText model learns from
# wiki-vs-crawl labels. Kept alphabetical; values are fixed data, not
# computed at import.
_POSITIVE = """about after although and any because been before being between
both but could does during each few from further had has have having her his
how into its itself just more most not now once only other our over own same
she should some such than that the their them then there these they this
those through under until very was were what when where which while who whom
why will with would your""".split()

_NEGATIVE = """buy cheap click discount free guarantee here lorem ipsum login
offer password price sale shipping signup subscribe unsubscribe viagra win
winner www""".split()

DEFAULT_BIAS = -0.1
DEFAULT_OOV_WEIGHT = -0.05


def default_quality_weights() -> list[tuple[str, float]]:
    return [(t, 0.35) for t in _POSITIVE] + [(t, -0.9) for t in _NEGATIVE]


def classify_quality(
    df: DataFrame,
    weights: list[tuple[str, float]] | DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = DEFAULT_BIAS,
    oov_weight: float = DEFAULT_OOV_WEIGHT,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document: ``(doc_id, n_tokens, q_score, q_label)``.

    ``weights`` is a ``(token, weight)`` table (list or DataFrame);
    ``None`` uses the committed stand-in. Empty/token-free documents get
    ``sigmoid(bias)`` (the model's prior). ``q_score`` is rounded to 6dp,
    ``q_label`` = score >= threshold.
    """
    spark = SparkSession.getActiveSession() or df.sparkSession
    if weights is None:
        weights = default_quality_weights()
    if not isinstance(weights, DataFrame):
        weights = spark.createDataFrame(weights, "token string, w double")

    # explode_outer keeps one null-token row for token-free docs, so a
    # single scan + one map-side-combined groupBy covers every document
    # (no second scan / distinct / re-join); count("token") skips nulls,
    # leaving those docs at the model prior
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode_outer(tokenize_words(F.col(text_col))).alias("token"),
    )
    summed = (
        toks.join(F.broadcast(weights), "token", "left")
        .groupBy("_doc")
        .agg(
            F.count("token").alias("n_tokens"),
            F.sum(
                F.when(F.col("token").isNotNull(), F.coalesce(F.col("w"), F.lit(oov_weight)))
            ).alias("_wsum"),
        )
    )
    score = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.lit(bias) + F.coalesce(F.col("_wsum") / F.col("n_tokens"), F.lit(0.0))))
    )
    return summed.select(
        F.col("_doc").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(score, 6).alias("q_score"),
        (F.round(score, 6) >= F.lit(threshold)).alias("q_label"),
    )


def classify_quality_sql(
    docs_view: str,
    weights: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    bias: float = DEFAULT_BIAS,
    oov_weight: float = DEFAULT_OOV_WEIGHT,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of :func:`classify_quality` (same tokenization, weight
    table inlined as VALUES, same sigmoid + rounding + threshold)."""
    from doctr_spark.operators.retrieval import TOKEN_SPLIT_RE

    weights = weights if weights is not None else default_quality_weights()
    wrows = ",\n    ".join(
        "('{}', {})".format(t.replace("'", "''"), w) for t, w in weights
    )
    return f"""
WITH w(token, w) AS (VALUES
    {wrows}
),
toks AS (
  SELECT {id_col} AS _doc, t.term AS token
  FROM {docs_view},
       unnest(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}')) AS t(term)
  WHERE t.term <> ''
),
summed AS (
  SELECT toks._doc, count(*) AS n_tokens,
         sum(coalesce(w.w, {oov_weight})) AS _wsum
  FROM toks LEFT JOIN w ON w.token = toks.token
  GROUP BY toks._doc
),
base AS (SELECT DISTINCT {id_col} AS _doc FROM {docs_view}),
scored AS (
  SELECT b._doc,
         coalesce(s.n_tokens, 0) AS n_tokens,
         round(1.0 / (1.0 + exp(-({bias} + coalesce(s._wsum / s.n_tokens, 0.0)))), 6) AS q_score
  FROM base b LEFT JOIN summed s ON s._doc = b._doc
)
SELECT _doc AS {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       q_score, q_score >= {threshold} AS q_label
FROM scored
"""
