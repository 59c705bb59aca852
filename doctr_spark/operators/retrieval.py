"""Ranked text retrieval (BM25 top-k) over a document corpus.

A large-scale training-data pipeline uses ranked retrieval for
decontamination triage (surface the corpus documents closest to a
benchmark item before the exact n-gram pass — see
:func:`doctr_spark.operators.dedup.decontaminate`), topic probes, and
quality audits. This is pipeline surface beyond the OCR reference
(SURVEY.md "training-data pipeline" mandate), like the dedup/ANN
family it composes with.

Scale shape (the part that matters at 100 TB):

- The postings list ``(term, doc, tf)`` is built in ONE corpus scan
  (explode + partial-aggregated groupBy); document lengths are derived
  from the postings themselves, not a second tokenize pass.
- The query-term set is tiny and broadcast: corpus postings are
  filtered map-side by a broadcast hash join on ``term`` BEFORE any
  shuffle, so only postings that can score reach an exchange —
  exactly the inverted-index access path, expressed declaratively.
- Per-term document frequencies are aggregated over the already-
  filtered postings (slim) and broadcast back.
- Everything is built-in JVM expressions: no Python UDFs anywhere.

The scoring function is the Lucene/Robertson "BM25+"-style variant
with non-negative idf: ``idf = ln(1 + (N - df + .5)/(df + .5))``,
``score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize_words(col: Column) -> Column:
    """Lowercased alphanumeric word tokens (empty strings dropped) —
    byte-identical to the DuckDB twin in :func:`bm25_topk_sql`."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """BM25 top-``k`` documents per query.

    Returns ``(query_id, doc_id, rank, score, n_terms)`` where
    ``n_terms`` is how many distinct query terms matched the document
    and ``rank`` orders by ``(score DESC, doc_id ASC)`` (deterministic
    tie-break). Corpus statistics (N, avgdl, df) are computed over
    ``docs`` itself.
    """
    postings = (
        docs.select(F.col(id_col).alias("_doc"), F.explode(tokenize_words(F.col(text_col))).alias("term"))
        .groupBy("_doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    # doc length from the postings themselves (no second tokenize pass);
    # slim (doc, dl) rows
    dl = postings.groupBy("_doc").agg(F.sum("tf").alias("dl"))
    # corpus constants as a broadcast 1-row frame
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).cast("double").alias("avgdl"),
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tokenize_words(F.col(query_text_col))).alias("term"),
        )
        .distinct()
    )
    # map-side inverted-index probe: broadcast the tiny query-term set so
    # only scoring-relevant postings survive the scan
    hits = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_by_term = hits.groupBy("term").agg(F.count_distinct("_doc").alias("df"))
    scored = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_by_term), "term")
        .join(dl, "_doc")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("query_id", "_doc")
        .agg(F.sum("term_score").alias("score"), F.count("*").alias("n_terms"))
    )
    # rank over the ROUNDED score: the raw double sum is partial-
    # aggregation-order dependent (1-ulp differences), so analytically
    # tied docs could rank oppositely on an engine twin; rounding first
    # makes the (score DESC, doc_id) order deterministic across engines
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.asc("_doc"))
    return (
        scored.withColumn("score_r", F.round(F.col("score"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("_doc").alias(id_col),
            "rank",
            F.col("score_r").alias("score"),
            "n_terms",
        )
    )


def bm25_topk_sql(
    docs_view: str,
    queries_values: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (identical tokenization regex,
    idf and scoring formula; same (score DESC, doc_id) tie-break)."""
    qrows = ",\n    ".join(
        "({}, '{}')".format(qid, text.replace("'", "''")) for qid, text in queries_values
    )
    return f"""
WITH q(query_id, qtext) AS (VALUES
    {qrows}
),
postings AS (
  SELECT doc_id AS _doc, t.term, count(*) AS tf
  FROM {docs_view},
       unnest(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}')) AS t(term)
  WHERE t.term <> ''
  GROUP BY doc_id, t.term
),
dl AS (SELECT _doc, sum(tf) AS dl FROM postings GROUP BY _doc),
stats AS (
  SELECT count(*) AS n_docs, sum(dl) / count(*) AS avgdl FROM dl
),
qterms AS (
  SELECT DISTINCT query_id, t.term
  FROM q, unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_RE}')) AS t(term)
  WHERE t.term <> ''
),
hits AS (
  SELECT p.* FROM postings p
  WHERE p.term IN (SELECT DISTINCT term FROM qterms)
),
df_by_term AS (
  SELECT term, count(DISTINCT _doc) AS df FROM hits GROUP BY term
),
scored AS (
  SELECT qt.query_id, h._doc,
         sum(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (h.tf * {k1 + 1.0}) / (h.tf + {k1} * ({1.0 - b} + {b} * l.dl / s.avgdl))
         ) AS score,
         count(*) AS n_terms
  FROM hits h
  JOIN qterms qt ON qt.term = h.term
  JOIN df_by_term d ON d.term = h.term
  JOIN dl l ON l._doc = h._doc
  CROSS JOIN stats s
  GROUP BY qt.query_id, h._doc
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(_doc AS BIGINT) AS doc_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, _doc ASC) AS BIGINT) AS rank,
       round(score, 6) AS score,
       CAST(n_terms AS BIGINT) AS n_terms
FROM scored
QUALIFY rank <= {k}
"""
