"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fused extraction over transcripts built
from the sf0.001 documents table plus deterministic OCR page bundles.
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data ops); ``oracle_sql()`` holds the DuckDB twins — literal
VALUES tables for kernel fixtures, real SQL derivations for relational
ops. Non-SQL-expressible stages (fused OCR extraction, MinHash/SimHash/
ANN-LSH, multimodal metadata) are rows-only and covered by pytest goldens.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from doctr_spark.plans import entry_queries as EQ


# --------------------------------------------------------------------- entry


def _transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript table derived from the documents parquet:
    50 conversations, one turn per document; every 3rd turn is wrapped in
    HTML boilerplate. Expected extraction = the original text (both
    derivations are also SQL-expressible — see q_extract_docs oracle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    conv = F.concat(F.lit("doc-"), F.lpad((F.col("doc_id") % 50).cast("string"), 4, "0"))
    turn = F.row_number().over(Window.partitionBy(conv).orderBy("doc_id"))
    html_text = F.concat(
        F.lit("<html><body><nav>Home | About</nav><header>hd</header><div id=\"main\"><p>"),
        F.col("text"),
        F.lit("</p></div><script>track();</script><footer>ft</footer></body></html>"),
    )
    return docs.select(
        conv.alias("conv_id"),
        (turn - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.when(F.col("doc_id") % 3 == 1, html_text).otherwise(F.col("text")).alias("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused per-turn extraction (plain + HTML + OCR payloads)."""
    from doctr_spark.plans.pipeline import extract_turns, ordered_turns
    from doctr_spark.sources.corpus import make_transcripts

    sf_dir = "/root/testdata/sf0.001"
    doc_turns = _transcripts_from_documents(spark, sf_dir)
    ocr_turns = make_transcripts(spark, 8, partitions=2, ocr_ratio=1.0, html_ratio=0.0).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    transcripts = doc_turns.unionByName(ocr_turns)
    return ordered_turns(extract_turns(transcripts)).drop("words")


# ------------------------------------------------------------------- queries


def _q_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused extraction over document-derived transcripts (plain+HTML paths);
    SQL-oracle-checkable because the expected text is the source text."""
    from doctr_spark.plans.pipeline import extract_turns

    transcripts = _transcripts_from_documents(spark, sf_dir)
    return extract_turns(transcripts).select("conv_id", "turn_idx", "payload_kind", "extracted_text")


_EXTRACT_DOCS_ORACLE = """
WITH turns AS (
  SELECT 'doc-' || lpad(CAST(doc_id % 50 AS VARCHAR), 4, '0') AS conv_id,
         CAST(row_number() OVER (PARTITION BY doc_id % 50 ORDER BY doc_id) - 1 AS INT) AS turn_idx,
         CASE WHEN doc_id % 3 = 1 THEN 'html' ELSE 'plain' END AS payload_kind,
         text AS extracted_text
  FROM documents
)
SELECT conv_id, turn_idx, payload_kind, extracted_text FROM turns
"""


def _q_extract_ocr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused OCR extraction (detect->crop->recognize->build) over generated
    page bundles; rows-only for the driver (pytest asserts exact equality)."""
    from doctr_spark.plans.pipeline import extract_turns
    from doctr_spark.sources.corpus import make_transcripts

    gen = make_transcripts(spark, 12, partitions=2, ocr_ratio=1.0, html_ratio=0.0)
    out = extract_turns(gen.select("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    matched = out.join(
        gen.select("conv_id", "turn_idx", "expected_text"), ["conv_id", "turn_idx"]
    ).withColumn("exact_match", (F.col("extracted_text") == F.col("expected_text")).cast("long"))
    return matched.select("conv_id", "turn_idx", "n_pages", "n_boxes", "n_chars", "exact_match")


def _q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doctr_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 200)
    sigs = minhash_signatures(docs, "doc_id", "text")
    cands = lsh_candidate_pairs(sigs)
    return sigs.agg(F.count("*").alias("n_docs")).crossJoin(
        cands.agg(F.count("*").alias("n_candidate_pairs"))
    )


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context-window packing of documents by token count (rows-only:
    pack assignment is partition-local; pytest asserts the invariants)."""
    from doctr_spark.operators.dedup import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    return pack_sequences(docs, "doc_id", "n_tokens", budget=256, partitions=8)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doctr_spark.operators.dedup import simhash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash64(docs, "doc_id", "text")


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doctr_spark.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_planes=8, dim=64)
    return out.select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 4).alias("sim"))


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: nearest-coarse-cell shard + nprobe query probing
    (rows-only: approximate recall; pytest asserts copy-recall invariants)."""
    from doctr_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16, nprobe=4, dim=64)
    return out.select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 4).alias("sim"))


def _q_emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup (the 100 TB path; rows-only since
    bucket recall < 1 — exact twin emb_neardup carries the oracle)."""
    from doctr_spark.operators.similarity import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_near_duplicates(emb, threshold=0.4, method="lsh", n_planes=6, dim=64, n_tables=4)
    return out.select("id_a", "id_b", F.round("sim", 4).alias("sim"))


def _q_bundle_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doctr_spark.operators.multimodal import page_bundle_metadata
    from doctr_spark.sources.corpus import make_transcripts
    from pyspark.sql import functions as F2

    gen = make_transcripts(spark, 10, partitions=2, ocr_ratio=1.0, html_ratio=0.0)
    with_payload = gen.select(
        F2.monotonically_increasing_id().alias("row_id"),
        F2.unbase64(F2.get_json_object("tool", "$.b64")).alias("payload"),
    )
    return page_bundle_metadata(with_payload, "row_id", "payload").select(
        "n_pages", "scale", "heights", "widths"
    )


def _q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window clustering on the events stream (batch-mode session
    windows; same operator the streaming path uses)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- extraction pipeline (flagship + components)
        "extract_docs": _q_extract_docs,
        "extract_ocr": _q_extract_ocr,
        "conversation_docs": EQ.q_conversation_docs,
        # --- kernel operators (reference-fixture goldens)
        "merge_strings": EQ.q_merge_strings,
        "ctc_decode": EQ.q_ctc_decode,
        "html_strip": EQ.q_html_strip,
        "reading_order": EQ.q_reading_order,
        "resolve_lines": EQ.q_resolve_lines,
        "detect_boxes": EQ.q_detect_boxes,
        "render_joins": EQ.q_render_joins,
        "split_crops": EQ.q_split_crops,
        "kie_render": EQ.q_kie_render,
        "orientation": EQ.q_orientation,
        "hocr_export": EQ.q_hocr_export,
        "translate_vocab": EQ.q_translate,
        # --- relational builder analogues
        "sort_key_rank": EQ.q_sort_key_rank,
        "enclosing_bbox": EQ.q_enclosing_bbox,
        "gap_sessionize": EQ.q_gap_sessionize,
        "line_render": EQ.q_line_render,
        "turn_order": EQ.q_turn_order,
        "topk_per_group": EQ.q_topk_per_group,
        "hourly_event_stats": EQ.q_hourly_event_stats,
        "rollup_events": EQ.q_rollup_events,
        "pivot_events": EQ.q_pivot_events,
        "cube_events": EQ.q_cube_events,
        "asof_join": EQ.q_asof_join,
        "pricing_summary": EQ.q_pricing_summary,
        "revenue_by_nation": EQ.q_revenue_by_nation,
        "streaming_sessionize": _q_streaming_sessionize,
        # --- text analysis / quality
        "token_stats": EQ.q_token_stats,
        "subword_tokens": EQ.q_subword_tokens,
        "deterministic_sample": EQ.q_deterministic_sample,
        "corpus_stats": EQ.q_corpus_stats,
        "quality_filter": EQ.q_quality_filter,
        "quality_score": EQ.q_quality_score,
        "lang_id": EQ.q_lang_id,
        "string_match": EQ.q_string_match,
        "fingerprint": EQ.q_fingerprint,
        # --- dedup
        "exact_dedup": EQ.q_exact_dedup_summary,
        "jaccard_pairs": EQ.q_jaccard_pairs,
        "minhash_neardup": _q_minhash_neardup,
        "simhash": _q_simhash,
        "pack_sequences": _q_pack_sequences,
        # --- similarity search
        "knn_cosine": EQ.q_knn_cosine,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "emb_neardup": EQ.q_emb_neardup,
        "emb_neardup_lsh": _q_emb_neardup_lsh,
        # --- geometry metrics
        "polygon_iou": EQ.q_polygon_iou,
        "box_iou": EQ.q_box_iou,
        "nms": EQ.q_nms,
        "page_angle": EQ.q_page_angle,
        "remove_padding": EQ.q_remove_padding,
        "ocr_quality": EQ.q_ocr_quality,
        # --- multimodal
        "bundle_metadata": _q_bundle_metadata,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_docs": _EXTRACT_DOCS_ORACLE,
        "conversation_docs": EQ.CONVERSATION_DOCS_ORACLE,
        "merge_strings": EQ.MERGE_ORACLE,
        "ctc_decode": EQ.CTC_ORACLE,
        "html_strip": EQ.HTML_ORACLE,
        "reading_order": EQ.SORT_ORACLE,
        "resolve_lines": EQ.LINES_ORACLE,
        "detect_boxes": EQ.DETECT_ORACLE,
        "render_joins": EQ.RENDER_ORACLE,
        "split_crops": EQ.SPLIT_ORACLE,
        "kie_render": EQ.KIE_ORACLE,
        "orientation": EQ.ORIENTATION_ORACLE,
        "hocr_export": EQ.HOCR_ORACLE,
        "translate_vocab": EQ.TRANSLATE_ORACLE,
        "sort_key_rank": EQ.SORT_KEY_RANK_ORACLE,
        "enclosing_bbox": EQ.ENCLOSING_BBOX_ORACLE,
        "gap_sessionize": EQ.GAP_SESSIONIZE_ORACLE,
        "line_render": EQ.LINE_RENDER_ORACLE,
        "turn_order": EQ.TURN_ORDER_ORACLE,
        "topk_per_group": EQ.TOPK_ORACLE,
        "hourly_event_stats": EQ.HOURLY_ORACLE,
        "rollup_events": EQ.ROLLUP_ORACLE,
        "pivot_events": EQ.PIVOT_ORACLE,
        "cube_events": EQ.CUBE_ORACLE,
        "asof_join": EQ.ASOF_ORACLE,
        "pricing_summary": EQ.PRICING_ORACLE,
        "revenue_by_nation": EQ.REVENUE_NATION_ORACLE,
        "token_stats": EQ.TOKEN_STATS_ORACLE,
        "subword_tokens": EQ.SUBWORD_ORACLE,
        "deterministic_sample": EQ.SAMPLE_ORACLE,
        "corpus_stats": EQ.CORPUS_STATS_ORACLE,
        "quality_filter": EQ.QUALITY_FILTER_ORACLE,
        "quality_score": EQ.QUALITY_ORACLE,
        "lang_id": EQ.LANG_ID_ORACLE,
        "string_match": EQ.STRING_MATCH_ORACLE,
        "fingerprint": EQ.FINGERPRINT_ORACLE,
        "exact_dedup": EQ.EXACT_DEDUP_ORACLE,
        "jaccard_pairs": EQ.JACCARD_ORACLE,
        "knn_cosine": EQ.KNN_ORACLE,
        "emb_neardup": EQ.EMB_NEARDUP_ORACLE,
        "polygon_iou": EQ.POLY_IOU_ORACLE,
        "box_iou": EQ.BOX_IOU_ORACLE,
        "nms": EQ.NMS_ORACLE,
        "page_angle": EQ.PAGE_ANGLE_ORACLE,
        "remove_padding": EQ.REMOVE_PADDING_ORACLE,
        # rows-only (non-SQL-expressible): extract_ocr, minhash_neardup,
        # simhash, ann_lsh, ann_ivf, emb_neardup_lsh, bundle_metadata,
        # streaming_sessionize
    }
