"""Bigram language-model scoring for corpus quality filtering — the
CCNet/RefinedWeb "perplexity filter" pattern: train token counts on a
reference slice, score every document by its smoothed bigram
log-likelihood, filter or bucket on the score.

Fully relational: counts are two groupBys over exploded tokens, scoring is
two broadcast-able joins plus an aggregation — no Python anywhere, and an
exact DuckDB twin. At 100 TB the counts table is vocabulary-bounded (tiny
vs the corpus), broadcast to the scoring join; the only corpus-sized
shuffle is the per-doc aggregation.

Float determinism: per-bigram log-probs are rounded to 6 decimals BEFORE
the per-doc sum (each term becomes a near-exact multiple of 1e-6, so the
unordered distributed sum stays ~1e-12 from a 1e-6 grid point), and the
total is rounded back to the SAME 1e-6 grid — a coarser final round would
sit exactly on .5 boundaries of the term grid and flip per engine. This
makes the score engine-portable to the last digit, which the driver's
hash comparison requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_tokens as _words


def bigram_counts(train: DataFrame, id_col: str, text_col: str) -> tuple[DataFrame, DataFrame, int]:
    """((w1, w2, c2), (w1, c1), vocab_size) from the training slice —
    Laplace-smoothed bigram LM 'weights'."""
    words = _words(train, id_col, text_col)
    w = Window.partitionBy("id").orderBy("pos")
    bigrams = (
        words.select("id", "w", F.lead("w").over(w).alias("nx"))
        .filter(F.col("nx").isNotNull())
        .select(F.col("w").alias("w1"), F.col("nx").alias("w2"))
    )
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bigrams.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab_size = words.select("w").distinct().count()
    return c2, c1, vocab_size


def lm_bigram_scores(
    train: DataFrame,
    score: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document smoothed bigram log-likelihood against the train-slice
    LM: for each adjacent pair, logp = ln((c2 + 1) / (c1 + V)) (Laplace;
    unseen history -> ln(1 / V)). Returns (id, n_bigrams, n_unseen,
    total_logp) — lower (more negative) total_logp per bigram = higher
    perplexity = further from the reference corpus."""
    c2, c1, vocab = bigram_counts(train, id_col, text_col)
    words = _words(score, id_col, text_col)
    w = Window.partitionBy("id").orderBy("pos")
    bigrams = (
        words.select("id", "w", F.lead("w").over(w).alias("nx"))
        .filter(F.col("nx").isNotNull())
        .select("id", F.col("w").alias("w1"), F.col("nx").alias("w2"))
    )
    scored = (
        bigrams.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .select(
            "id",
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + vocab)
                ),
                6,
            ).alias("logp"),
            F.col("c2").isNull().cast("long").alias("unseen"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("unseen").alias("n_unseen"),
        F.round(F.sum("logp"), 6).alias("total_logp"),
    )


def lm_bigram_scores_sql(train_pred: str, score_pred: str = "TRUE") -> str:
    """DuckDB twin of :func:`lm_bigram_scores` over the documents table
    (``train_pred`` / ``score_pred`` filter the train and score slices)."""
    return f"""
WITH norm AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
         {train_pred} AS is_train, {score_pred} AS is_score
  FROM documents
),
words AS (
  SELECT id, is_train, is_score, unnest(str_split(norm, ' ')) AS w,
         generate_subscripts(str_split(norm, ' '), 1) AS pos
  FROM norm
),
bigrams AS (
  SELECT id, is_train, is_score, w AS w1,
         lead(w) OVER (PARTITION BY id ORDER BY pos) AS w2
  FROM words
  QUALIFY lead(w) OVER (PARTITION BY id ORDER BY pos) IS NOT NULL
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bigrams WHERE is_train GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bigrams WHERE is_train GROUP BY w1),
vocab AS (SELECT count(DISTINCT w) AS v FROM words WHERE is_train),
scored AS (
  SELECT b.id,
         round(ln((coalesce(c2.c2, 0) + 1) * 1.0 / (coalesce(c1.c1, 0) + vocab.v)), 6) AS logp,
         CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS unseen
  FROM bigrams b
  LEFT JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
  LEFT JOIN c1 ON c1.w1 = b.w1
  CROSS JOIN vocab
  WHERE b.is_score
)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(unseen) AS BIGINT) AS n_unseen,
       round(sum(logp), 6) AS total_logp
FROM scored GROUP BY id
"""
