"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus; dot products with built-in zip_with/aggregate (JVM-side, no
  Python), top-k via window. The baseline and the verify stage.
- LSH-bucketed ANN: deterministic random-hyperplane signatures; candidates
  share a bucket in at least one table. The 100 TB path: buckets shard the
  corpus so each query probes a small fraction.

Deterministic everywhere: hyperplanes come from a seeded generator and are
broadcast as literal arrays; ties break by (sim desc, id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def cosine_similarity_col(a, b, decimals: int = 6):
    """Cosine similarity between two array<numeric> columns (double math)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return F.round(_cosine(ad, bd), decimals)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k neighbors for each query (excluding self).

    queries is broadcast — at 100 TB the corpus scan parallelizes over
    input splits and each task scores its slice against the tiny query set
    (one pass, no corpus shuffle); the window top-k shuffles only
    (query_id, neighbor_id, sim) triples.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_similarity_col(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Bucket id = sign-bit signature against fixed hyperplanes, as an
    Arrow-batched pandas UDF: one (batch x dim) @ (dim x planes) matmul per
    batch — far cheaper than per-plane codegen expressions (a deliberate
    use of the vectorized-UDF escape hatch for dense linear algebra)."""
    planes_t = planes.T.copy()  # (dim, n_planes)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @F.pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float32
        bits = mat.astype(np.float64) @ planes_t >= 0  # (batch, n_planes)
        return pd.Series(bits @ weights)

    return sig(vec_col)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 2,
) -> DataFrame:
    """Approximate top-k: probe only corpus rows sharing an LSH bucket with
    the query in any of ``n_tables`` independent tables, then exact cosine
    rank within candidates."""
    parts = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=7 + t)
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            lsh_signature_col(F.col(vec_col), planes).alias("bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            lsh_signature_col(F.col(vec_col), planes).alias("bucket"),
        )
        parts.append(c.join(F.broadcast(q), "bucket").filter(F.col("neighbor_id") != F.col("query_id")))
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    cands = cands.dropDuplicates(["query_id", "neighbor_id"])
    scored = cands.withColumn("sim", cosine_similarity_col(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
