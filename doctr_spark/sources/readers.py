"""Table readers: Iceberg-first with parquet fallback.

The production design reads/writes Iceberg tables (snapshot isolation for
the checkpoint manifest, partition-spec pruning, schema evolution for the
words struct). The Iceberg runtime jars are not in this container, so the
reader is capability-gated: if a catalog is configured it uses
``spark.read.format("iceberg")`` / ``table()``, otherwise it falls back to
plain parquet paths with identical downstream semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_EXTENSION = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured."""
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        if ICEBERG_EXTENSION not in ext:
            return False
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read a transcript table: Iceberg table name (``catalog.db.table``)
    when Iceberg is live, else a parquet path."""
    if iceberg_available(spark) and not source.startswith(("/", "file:", "s3:", "hdfs:")):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_results(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write extraction results: Iceberg table (bucket-partitioned by
    conv_id in the table's partition spec) when live, else parquet."""
    spark = df.sparkSession
    if iceberg_available(spark) and not target.startswith(("/", "file:", "s3:", "hdfs:")):
        df.writeTo(target).append() if mode == "append" else df.writeTo(target).createOrReplace()
        return
    df.write.mode("overwrite" if mode != "append" else "append").parquet(target)
