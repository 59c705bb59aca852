"""Resumable checkpointed extraction + streaming extraction."""

import pytest
from pyspark.sql import functions as F

from doctr_spark.plans.checkpoint import (
    completed_buckets,
    read_extraction_results,
    run_extraction_checkpointed,
)
from doctr_spark.sources.corpus import make_transcripts
from doctr_spark.streaming.stream import (
    run_stream_to_parquet,
    sessionized_conversations,
    stream_transcripts,
    turn_rate_by_window,
)


@pytest.fixture(scope="module")
def corpus(spark):
    gen = make_transcripts(spark, 12, partitions=2).cache()
    gen.count()
    yield gen
    gen.unpersist()


def test_checkpoint_resume(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt"))
    inp = corpus.drop("expected_text", "payload_kind")
    total = inp.count()

    # first run "crashes" after 2 of 4 buckets
    s1 = run_extraction_checkpointed(spark, inp, out, buckets=4, max_buckets_this_run=2)
    assert len(s1["processed"]) == 2 and s1["remaining"] == 2
    assert completed_buckets(spark, f"{out}/manifest") == set(s1["processed"])

    # resume: only the remaining buckets run
    s2 = run_extraction_checkpointed(spark, inp, out, buckets=4)
    assert len(s2["processed"]) == 2
    assert set(s2["skipped"]) == set(s1["processed"])
    assert s2["remaining"] == 0

    # a third run is a no-op
    s3 = run_extraction_checkpointed(spark, inp, out, buckets=4)
    assert s3["processed"] == [] and len(s3["skipped"]) == 4

    # results are complete and correct
    res = read_extraction_results(spark, out)
    assert res.count() == total
    j = res.join(corpus.select("conv_id", "turn_idx", "expected_text"), ["conv_id", "turn_idx"])
    assert j.filter(F.col("extracted_text") != F.col("expected_text")).count() == 0

    # manifest metrics aggregated
    manifest = spark.read.parquet(f"{out}/manifest")
    assert manifest.count() == 4
    assert manifest.agg(F.sum("n_turns")).collect()[0][0] == total


def test_streaming_extraction(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir, out_dir, ck_dir = str(base / "in"), str(base / "out"), str(base / "ck")
    inp = corpus.drop("expected_text", "payload_kind")
    inp.repartition(3).write.mode("overwrite").parquet(in_dir)

    stream = stream_transcripts(spark, in_dir)
    assert stream.isStreaming
    q = run_stream_to_parquet(stream, out_dir, ck_dir, once=True)
    q.awaitTermination(120)

    res = spark.read.parquet(out_dir)
    assert res.count() == inp.count()
    j = res.join(corpus.select("conv_id", "turn_idx", "expected_text"), ["conv_id", "turn_idx"])
    assert j.filter(F.col("extracted_text") != F.col("expected_text")).count() == 0


def test_streaming_window_aggs(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream2")
    in_dir = str(base / "in")
    inp = corpus.drop("expected_text", "payload_kind")
    inp.write.mode("overwrite").parquet(in_dir)

    stream = stream_transcripts(spark, in_dir)
    agg = turn_rate_by_window(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("turn_rates")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; check the query ran
    assert spark.sql("select * from turn_rates").columns == ["window_start", "window_end", "role", "n_turns"]

    sess = sessionized_conversations(stream)
    q2 = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert "conv_id" in spark.sql("select * from sessions").columns
