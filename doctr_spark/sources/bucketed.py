"""Bucketed-table helpers: co-located, shuffle-free joins at 100 TB.

Big fact-to-fact joins (e.g. transcripts joined to a per-conversation
metadata table, or dedup verdicts joined back to bodies) shuffle BOTH
sides on every run unless the tables are bucketed on the join key at write
time. Writing with ``bucketBy(N, key) + sortBy(key)`` pins a deterministic
hash layout into the table; a later join of two tables bucketed on the
same key with the same N runs as a zero-exchange SortMergeJoin — each task
reads matching bucket files from both sides. One shuffle is paid ONCE at
write, then amortized over every subsequent join/groupBy on that key.

These wrap the SparkSession catalog (saveAsTable) because bucket metadata
lives in the table catalog, not in bare parquet paths; on a real cluster
the same calls target the Iceberg/Hive catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed+sorted on ``key`` (the one-time shuffle that
    makes every later equi-join/groupBy on ``key`` exchange-free)."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .mode(mode)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-key/same-count bucketed tables; with bucketing enabled
    (default) Catalyst plans this with NO Exchange on either side — the
    property the test suite asserts on the physical plan."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
