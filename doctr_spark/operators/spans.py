"""Exact repeated-span deduplication (corpus-level duplicated substrings).

The exact-substring pass of training-data dedup ("Deduplicating Training
Data Makes Language Models Better", Lee et al. 2022): find spans of text
that occur verbatim many times across the corpus (boilerplate, license
headers, templated fragments) and mark or strip them per document, even
when the *documents* containing them are not near-duplicates. Complements
the document-level family in :mod:`doctr_spark.operators.dedup` (MinHash /
SimHash / fingerprint), which cannot see sub-document repetition.

Word-level approximation of the suffix-array algorithm, chosen for its
distributed shape:

1. ONE tokenize pass → positions + word ``n``-grams per document (all JVM
   higher-order functions; no Python).
2. Global occurrence counts on ``xxhash64(ngram)`` — a slim
   ``(hash, count)`` aggregation with map-side partial combine; the
   duplicated set (count ≥ ``min_count``) is NOT broadcast because at
   corpus scale it is large; the join back is a shuffle on the same
   64-bit key the aggregation already partitioned by.
3. Per-document interval merge of overlapping/adjacent duplicated n-gram
   hits via one window pass (running-max gaps-and-islands) — no
   ``collect_list`` of positions, state per row is O(1).

A duplicated n-gram marks token interval ``[pos, pos+n-1]``; merged
islands are the output spans. Hash collisions (2^-64 per pair) can only
add a span, never drop one — same trade as the MinHash band keys.

Scale note: step 2's aggregation keys are uniform 64-bit hashes — no skew
by construction; the heavy child (one row per token position) never
carries document bodies, only ``(doc, pos, hash)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from doctr_spark.operators.retrieval import TOKEN_SPLIT_RE, tokenize_words


def _gram_positions(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, pos, gram_hash) for every word n-gram start position."""
    toks = df.select(F.col(id_col).alias("_doc"), tokenize_words(F.col(text_col)).alias("ts"))
    return (
        toks.filter(F.size("ts") >= n)
        .select(
            "_doc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(F.concat_ws(" ", F.slice("ts", i + 1, n))).alias("gram_hash"),
                    ),
                )
            ).alias("g"),
        )
        .select("_doc", F.col("g.pos").alias("pos"), F.col("g.gram_hash").alias("gram_hash"))
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Merged per-document spans of corpus-duplicated word ``n``-grams.

    Returns ``(doc_id, span_start, span_end, n_tokens, n_grams)`` with
    token positions 0-based inclusive; ``min_count`` is the global
    occurrence threshold (within-document repeats count — a doc that
    repeats its own boilerplate twice is already duplicated text).
    """
    grams = _gram_positions(df, id_col, text_col, n)
    dup = (
        grams.groupBy("gram_hash")
        .agg(F.count("*").alias("_occ"))
        .filter(F.col("_occ") >= min_count)
        .select("gram_hash")
    )
    hits = grams.join(dup, "gram_hash").select(
        "_doc", "pos", (F.col("pos") + F.lit(n - 1)).alias("end")
    )
    w = Window.partitionBy("_doc").orderBy("pos")
    prev_max_end = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = hits.withColumn(
        "_new", F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1).otherwise(0)
    ).withColumn("_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        islands.groupBy("_doc", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(
            F.col("_doc").alias(id_col),
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("n_tokens"),
            F.col("n_grams").cast("long"),
        )
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Documents with duplicated spans removed: ``(doc_id, clean_text,
    n_tokens_kept, n_tokens_dropped)``. Token positions covered by any
    duplicated span are dropped; survivors re-join with single spaces
    (tokenized text — same normalization the span detector saw). Docs
    with no duplicated span pass through with ``n_tokens_dropped = 0``,
    including token-free docs (``clean_text = ''``)."""
    spans = duplicated_spans(df, id_col, text_col, n, min_count).select(
        F.col(id_col).alias("_doc"), "span_start", "span_end"
    )
    toks = (
        df.select(F.col(id_col).alias("_doc"), tokenize_words(F.col(text_col)).alias("ts"))
        # posexplode_outer keeps one (null, null) row for token-free docs
        # so they survive to the output at (clean_text='', 0, 0)
        .select("_doc", F.posexplode_outer("ts").alias("pos", "tok"))
    )
    dropped = (
        toks.join(
            spans,
            (toks["_doc"] == spans["_doc"])
            & (F.col("pos") >= F.col("span_start"))
            & (F.col("pos") <= F.col("span_end")),
            "left_semi",
        )
        .select("_doc", "pos")
        .withColumn("_drop", F.lit(1))
    )
    return (
        toks.join(dropped, ["_doc", "pos"], "left")
        .groupBy("_doc")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    # collect_list drops the null entries (dropped or
                    # token-free rows) on its own
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("_drop").isNull() & F.col("tok").isNotNull(),
                                F.struct("pos", "tok"),
                            )
                        )
                    ),
                    lambda s: s["tok"],
                ),
            ).alias("clean_text"),
            F.sum(
                F.when(F.col("_drop").isNull() & F.col("tok").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_tokens_kept"),
            F.sum(F.coalesce(F.col("_drop"), F.lit(0))).cast("long").alias("n_tokens_dropped"),
        )
        .select(F.col("_doc").alias(id_col), "clean_text", "n_tokens_kept", "n_tokens_dropped")
    )


def duplicated_spans_sql(
    docs_view: str, id_col: str = "doc_id", n: int = 8, min_count: int = 2
) -> str:
    """DuckDB twin of :func:`duplicated_spans` — same tokenization, n-gram
    construction (on the raw gram string, no hash), threshold and
    gaps-and-islands merge."""
    return f"""
WITH lists AS (
  SELECT {id_col} AS _doc,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS ts
  FROM {docs_view}
),
grams AS (
  SELECT _doc, CAST(r.i AS BIGINT) AS pos,
         array_to_string(ts[r.i + 1 : r.i + {n}], ' ') AS gram
  FROM lists, unnest(range(len(ts) - {n} + 1)) AS r(i)
  WHERE len(ts) >= {n}
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= {min_count}
),
hits AS (
  SELECT g._doc, g.pos, g.pos + {n - 1} AS "end"
  FROM grams g WHERE g.gram IN (SELECT gram FROM dup)
),
islands AS (
  SELECT _doc, pos, "end",
         CASE WHEN max("end") OVER (PARTITION BY _doc ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR pos > max("end") OVER (PARTITION BY _doc ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS _new
  FROM hits
),
numbered AS (
  SELECT _doc, pos, "end",
         sum(_new) OVER (PARTITION BY _doc ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _island
  FROM islands
)
SELECT _doc AS {id_col},
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max("end") AS BIGINT) AS span_end,
       CAST(max("end") - min(pos) + 1 AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_grams
FROM numbered
GROUP BY _doc, _island
"""
