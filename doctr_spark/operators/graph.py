"""Distributed connected components over near-duplicate pair graphs —
the clustering stage between pair mining (MinHash/SimHash/embedding
near-dup) and survivor selection ("keep one doc per duplicate cluster").

Algorithm: iterative min-label propagation on DataFrames. Every vertex
starts labeled with its own id; each round every vertex takes the min of
its label and its neighbors' labels; fixpoint = components labeled by
their minimum member id (deterministic). Each round is one join + one
groupBy — all shuffles keyed on vertex id, edge list never mutated.
Near-dup clusters are shallow (a dup cluster's diameter is tiny), so a
handful of rounds converges; for adversarially long chains at 10^9+ edges
the same loop upgrades to the large-star/small-star contraction
(Kiveris et al.), which converges in O(log n) rounds — the per-round
dataflow here is the small-star half of that algorithm.

The fixpoint check is one count() action per round (cheap: labels table
is vertex-sized, far smaller than the corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex in the edge list; component = the
    minimum vertex id reachable through the (undirected) pairs."""
    # localCheckpoint (not cache) per round: iterative self-referencing
    # plans grow a lineage Catalyst re-analyzes each round — planning cost
    # explodes around ~8 iterations; checkpointing truncates the logical
    # plan to the materialized result (the standard idiom for DataFrame
    # iteration)
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nb_min"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nb_min, "id", "left").select(
            "id", F.least("label", F.coalesce("nb_min", "label")).alias("label")
        )
        # pointer jump: also adopt the label of one's current label — turns
        # linear label diffusion into doubling, so rounds ~ O(log diameter)
        # instead of O(diameter) (labels are always existing vertex ids)
        ptr = stepped.select(F.col("id").alias("label"), F.col("label").alias("ll"))
        new_labels = (
            stepped.join(ptr, "label", "left")
            .select("id", F.least("label", F.coalesce("ll", "label")).alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # silently-wrong components would corrupt dedup survivors; a graph
        # whose diameter exceeds max_iter needs more rounds (or the
        # large-star/small-star contraction)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b") -> DataFrame:
    """Near-dup pairs -> (id, component, is_survivor): one deterministic
    survivor per duplicate cluster (the minimum id). Docs not in any pair
    are implicitly their own survivors and never enter the computation —
    at 100 TB the pair graph is a tiny fraction of the corpus, so the
    whole clustering runs on the slim pair set."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.select(
        "id", "component", (F.col("id") == F.col("component")).cast("long").alias("is_survivor")
    )
