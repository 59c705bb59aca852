"""Skewed-corpus proof (SURVEY §4's skew story, measured): the fused
extraction's throughput must not depend on the CONVERSATION key
distribution, because parallelism comes from input splits, not from a key
shuffle — a single 10^5-turn conversation spreads over many tasks exactly
like 10^4 normal conversations do.

Protocol: generate one uniform corpus (~10^4 normal conversations plus
enough extra to donate ~10^5 turns), then build the SKEWED corpus from the
SAME ROWS by re-keying the donor conversations into ONE giant conv_id —
identical payload multiset, different key distribution, so any throughput
delta is purely key-skew. Both corpora run through the CHECKPOINTED path
(plans/checkpoint.py grouped mode: bucket by conv_id hash, one file per
bucket — the giant conversation concentrates a whole bucket) at two
parallelism levels.

Pass criterion: skew/uniform throughput ratio within ~10% at both levels.

Usage: python scripts/skew_bench.py [n_normal_convs] [giant_turns]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TMP = os.environ.get("DOCTR_SPARK_BENCH_TMP", "/tmp/doctr_spark_bench")
LEVELS = (8, 32)


def build_corpora(n_normal: int, giant_turns: int) -> tuple[str, str]:
    """Materialize uniform + skewed corpora once (generation untimed)."""
    from pyspark.sql import functions as F

    from doctr_spark.session import get_spark
    from doctr_spark.sources.corpus import make_transcripts

    uniform_dir = os.path.join(TMP, f"skew_uniform_{n_normal}_{giant_turns}")
    skewed_dir = os.path.join(TMP, f"skew_skewed_{n_normal}_{giant_turns}")
    if all(
        os.path.exists(os.path.join(d, "_SUCCESS")) for d in (uniform_dir, skewed_dir)
    ):
        return uniform_dir, skewed_dir
    spark = get_spark(cores=32, app_name="skew-corpus-build")
    try:
        # mean_turns=8 (bench corpus shape): donors contribute ~8 turns each
        n_donor = max(1, giant_turns // 8)
        gen = make_transcripts(
            spark, n_normal + n_donor, partitions=64, long_every=200, long_turns=96
        ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        gen.write.mode("overwrite").parquet(uniform_dir)
        base = spark.read.parquet(uniform_dir)
        # re-key: the first n_donor conv ids collapse into ONE giant conv.
        # conv_id format is 'conv-NNNNNN' (zero-padded), so lexicographic
        # order == numeric order; turn_idx stays as-is (extraction carries
        # it, nothing requires per-conv uniqueness in the timed path).
        cut = f"conv-{n_donor:06d}"
        skew = base.withColumn(
            "conv_id",
            F.when(F.col("conv_id") < F.lit(cut), F.lit("conv-giant")).otherwise(
                F.col("conv_id")
            ),
        )
        skew.write.mode("overwrite").parquet(skewed_dir)
    finally:
        spark.stop()
    return uniform_dir, skewed_dir


def paired_rounds(uniform_dir: str, skewed_dir: str, cores: int, rounds: int) -> dict:
    """Interleaved (uniform, skewed) checkpointed runs in ONE session:
    legs of a round share co-tenant conditions (this box is shared, and
    unpaired short legs sampled 2x throughput swings between visits), so
    the criterion is the MEDIAN of per-round skewed/uniform ratios — the
    same estimator the scaling bench settled on in round 3."""
    import statistics

    from doctr_spark.plans.checkpoint import run_extraction_checkpointed
    from doctr_spark.plans.pipeline import extract_turns
    from doctr_spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"skew-bench-{cores}")
    try:
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        legs = {
            "uniform": spark.read.parquet(uniform_dir).select(*cols),
            "skewed": spark.read.parquet(skewed_dir).select(*cols),
        }
        n = legs["uniform"].count()
        max_conv = int(
            legs["skewed"].groupBy("conv_id").count().agg(F_max_count()).collect()[0][0]
        )
        # warm codegen + python workers (untimed)
        extract_turns(legs["uniform"].limit(512)).write.format("noop").mode(
            "overwrite"
        ).save()
        times: dict[str, list[float]] = {"uniform": [], "skewed": []}
        for _ in range(rounds):
            for name, inp in legs.items():
                out_dir = os.path.join(TMP, f"skew_out_{cores}")
                shutil.rmtree(out_dir, ignore_errors=True)
                t0 = time.time()
                run_extraction_checkpointed(spark, inp, out_dir, buckets=8, grouped=True)
                times[name].append(time.time() - t0)
                shutil.rmtree(out_dir, ignore_errors=True)
        ratios = [u / s for u, s in zip(times["uniform"], times["skewed"])]
        return {
            "turns": n,
            "max_conv_turns": max_conv,
            "uniform_tps": round(n / min(times["uniform"]), 1),
            "skewed_tps": round(n / min(times["skewed"]), 1),
            "round_ratios": [round(r, 3) for r in ratios],
            "skew_over_uniform": round(statistics.median(ratios), 3),
        }
    finally:
        spark.stop()


def F_max_count():
    from pyspark.sql import functions as F

    return F.max("count")


def main() -> None:
    n_normal = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    giant_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    uniform_dir, skewed_dir = build_corpora(n_normal, giant_turns)
    result: dict = {"metric": "skew_tolerance", "levels": {}}
    for cores in LEVELS:
        result["levels"][str(cores)] = paired_rounds(
            uniform_dir, skewed_dir, cores, rounds
        )
    result["pass"] = all(
        lvl["skew_over_uniform"] >= 0.9 for lvl in result["levels"].values()
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
