"""Streaming extraction: the same fused mapInPandas stage over a
Structured Streaming source, plus watermarked session/window aggregations
(the streaming analog of the builder's 1-D gap clustering).

The batch and streaming paths share _the same_ extraction UDF — only the
source/sink differ, which is the point of expressing the pipeline as a
DataFrame transform."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import extract_turns
from ..sources.corpus import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a transcript parquet directory (stand-in for
    Kafka/Iceberg CDC at 100 TB; schema must be pinned, never inferred)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def extract_stream(stream_df: DataFrame) -> DataFrame:
    """Streaming extraction: identical transform as batch."""
    return extract_turns(stream_df)


def run_stream_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, once: bool = True
):
    """Write extracted turns to parquet with exactly-once file-sink
    semantics. ``once=True`` drains all available input then stops
    (availableNow), the pattern for incremental backfills."""
    q = (
        extract_stream(stream_df)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=once)
        .start()
    )
    return q


def turn_rate_by_window(stream_df: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window turn counts per role.

    Watermark guarantees (verified, Spark 4.1): state for windows behind
    the watermark is evicted every trigger (bounded memory — the property
    that matters at 10^12 turns); late rows within the watermark merge into
    their window; rows beyond it are best-effort dropped — Spark may emit
    an already-expired window once but never keeps state for it."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("role"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


def sessionized_conversations(stream_df: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per conv_id: the streaming analog of the builder's
    gap-based 1-D clustering (_resolve_lines ~ session clustering,
    SURVEY.md §2.12)."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"), F.min("turn_idx").alias("first_turn"), F.max("turn_idx").alias("last_turn"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "conv_id",
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )


def running_conversation_state(stream_df: DataFrame):
    """Custom stateful operator: per-conversation running turn count +
    latest turn index, via applyInPandasWithState (the escape hatch for
    stateful semantics session_window can't express — e.g. monotonic
    per-key counters across triggers)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "conv_id string, n_turns long, max_turn long"
    state_schema = "n long, mx long"

    def update(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
        state.update((n, mx))
        yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n], "max_turn": [mx]})

    return (
        stream_df.groupBy("conv_id")
        .applyInPandasWithState(
            update, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
