"""Distributed spherical k-means over embedding columns.

The trained coarse quantizer for IVF ANN (replaces the seeded stand-in
codebook in :mod:`doctr_spark.operators.similarity`) and the cluster stage
of semantic dedup (SemDeDup, Abbas et al. 2023). Part of the
training-data-pipeline surface, not a docTR-reference operator.

Scale shape (designed for a 100 TB corpus, tested at sf0.01):
- **init**: k-means++ on a bounded deterministic hash-sample — O(s*k*dim)
  driver work on <= ``sample_rows`` vectors regardless of corpus size; the
  corpus itself is never collected.
- **each Lloyd iteration is ONE corpus pass**: an Arrow-batched
  ``mapInPandas`` emits at most ``k`` partial rows ``(cell, cnt, vsum)``
  per *partition* (classic map-side combine), so the driver-side reduce
  sees O(P*k) slim rows — at 10^5 partitions x k=4096 that is megabytes,
  never the corpus. No shuffle: partials flow straight to the driver.
- **assignment for consumers** is a stateless broadcast-matmul column
  (:func:`doctr_spark.operators.similarity.ivf_cell_col`) — no shuffle,
  no state on executors.
- **determinism**: the sample is hash-selected and id-sorted, partials are
  tagged with their partition id and reduced in sorted (cell, pid) order,
  so float summation order — and therefore the codebook — is identical
  run-to-run on the same input.

Spherical (unit-norm) variant because every consumer scores by cosine:
centroids are re-normalized after each update, so nearest-centroid by dot
product == nearest by cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _kmeanspp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """k-means++ seeding on the (unit-norm) sample: squared cosine distance
    ``2 - 2*sim`` weighting, seeded generator — deterministic."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    first = int(rng.integers(0, n))
    chosen = [first]
    # squared distance to nearest chosen centroid so far
    d2 = 2.0 - 2.0 * (sample @ sample[first])
    d2 = np.maximum(d2, 0.0)
    for _ in range(1, k):
        total = float(d2.sum())
        if total <= 0.0:  # degenerate sample (all duplicates): round-robin
            nxt = int((chosen[-1] + 1) % n)
        else:
            r = float(rng.random()) * total
            nxt = int(np.searchsorted(np.cumsum(d2), r))
            nxt = min(nxt, n - 1)
        chosen.append(nxt)
        d2 = np.minimum(d2, np.maximum(2.0 - 2.0 * (sample @ sample[nxt]), 0.0))
    return sample[np.array(chosen)].copy()


def _collect_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_rows: int, dim: int
) -> np.ndarray:
    """Deterministic bounded sample: xxhash64-ranked ids (a seeded uniform
    draw that needs no table count), collected id-sorted. At 100 TB this is
    a full scan of two slim columns — amortized against the training it
    seeds — and the driver holds <= sample_rows vectors. orderBy+limit
    compiles to TakeOrderedAndProject (per-partition top-K merged on the
    driver), NOT a global sort — no corpus shuffle; plan-guarded in
    tests/test_plans.py."""
    sampled = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.xxhash64(F.col("_id").cast("string"), F.lit(41)))
        .orderBy("_h", "_id")
        .limit(sample_rows)
    )
    pdf = sampled.orderBy("_id").select("_id", "_v").toPandas()
    if len(pdf) == 0:
        raise ValueError("kmeans_fit: input has no rows to sample")
    mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
    if mat.shape[1] != dim:
        raise ValueError(f"expected dim={dim}, sample has dim={mat.shape[1]}")
    return _normalize_rows(mat)


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    dim: int = 64,
    n_iter: int = 8,
    seed: int = 11,
    sample_rows: int = 4096,
    deterministic: bool = True,
    det_partitions: int = 8,
) -> np.ndarray:
    """Train a spherical k-means codebook; returns unit-norm (k, dim).

    Each iteration: broadcast current centroids in the UDF closure, one
    Arrow pass computes per-partition partial sums (<= k rows/partition),
    driver reduces in sorted (cell, pid) order and re-normalizes. Empty
    cells keep their previous centroid (stable, deterministic).

    ``deterministic=True`` pins row->partition by hash(id) and sorts rows
    by id within partitions, making the float summation order — and the
    codebook — bit-identical across runs AND across input file layouts
    (the property the pinned driver oracles need). The pinned layout is
    PERSISTED (memory-and-disk) before the Lloyd loop — each of the
    ``n_iter`` passes is an independent action, so without the persist
    the repartition+sort shuffle would re-execute every iteration; with
    it, the shuffle happens once and iterations read cached blocks. A
    100 TB training job that only needs statistical stability can pass
    False and train on raw input splits.
    """
    sample = _collect_sample(df, id_col, vec_col, sample_rows, dim)
    if sample.shape[0] < k:
        raise ValueError(f"sample has {sample.shape[0]} rows < k={k}")
    cents = _kmeanspp_init(sample, k, seed)

    persisted = None
    if deterministic:
        from pyspark import StorageLevel

        vec_only = (
            df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
            .repartition(det_partitions, F.col("_id"))
            .sortWithinPartitions("_id")
            .select("_v")
        )
        persisted = vec_only.persist(StorageLevel.MEMORY_AND_DISK)
    else:
        vec_only = df.select(F.col(vec_col).alias("_v"))
    try:
        return _lloyd_iterations(vec_only, cents, k, dim, n_iter)
    finally:
        if persisted is not None:
            persisted.unpersist()


def _lloyd_iterations(
    vec_only: DataFrame, cents: np.ndarray, k: int, dim: int, n_iter: int
) -> np.ndarray:
    out_schema = "cell int, pid int, cnt long, vsum array<double>"
    for _ in range(n_iter):
        cent_t = cents.T.copy()

        def partials(batches, _ct=cent_t):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            acc_cnt = np.zeros(k, dtype=np.int64)
            acc_sum = np.zeros((k, dim), dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = _normalize_rows(np.stack(pdf["_v"].to_numpy()).astype(np.float64))
                cell = np.argmax(mat @ _ct, axis=1)
                acc_cnt += np.bincount(cell, minlength=k)
                np.add.at(acc_sum, cell, mat)
            nz = np.nonzero(acc_cnt)[0]
            yield pd.DataFrame(
                {
                    "cell": pd.Series(nz, dtype="int32"),
                    "pid": pd.Series(np.full(len(nz), pid), dtype="int32"),
                    "cnt": pd.Series(acc_cnt[nz], dtype="int64"),
                    "vsum": pd.Series(list(acc_sum[nz])),
                }
            )

        part = vec_only.mapInPandas(partials, out_schema).toPandas()
        part = part.sort_values(["cell", "pid"]).reset_index(drop=True)
        new_cents = cents.copy()
        for cell, grp in part.groupby("cell", sort=True):
            s = np.zeros(dim, dtype=np.float64)
            for v in grp["vsum"]:  # sorted pid order -> deterministic float sum
                s += np.asarray(v, dtype=np.float64)
            norm = float(np.linalg.norm(s))
            if norm > 0.0:
                new_cents[int(cell)] = s / norm
        cents = new_cents
    return cents


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stateless nearest-centroid assignment column (one broadcast matmul
    per Arrow batch, no shuffle): (id, cell)."""
    from doctr_spark.operators.similarity import ivf_cell_col

    return df.select(
        F.col(id_col).alias(id_col),
        ivf_cell_col(F.col(vec_col), centroids, nprobe=1)[0].alias("cell"),
    )


def cluster_stats(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell (n_rows, mean cosine-to-centroid) — the balance/quality
    summary a 100 TB training job logs per iteration. One corpus pass; the
    groupBy carries k slim rows."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf("double")
    def sim_to_centroid(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        idx = cells.to_numpy().astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", mat, cents[idx]))

    from doctr_spark.operators.similarity import ivf_cell_col

    assigned = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        ivf_cell_col(F.col(vec_col), cents, nprobe=1)[0].alias("cell"),
    ).withColumn("_sim", sim_to_centroid(F.col("_v"), F.col("cell")))
    return (
        assigned.groupBy("cell")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.avg("_sim"), 6).alias("mean_sim"),
        )
        .orderBy("cell")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.7,
) -> DataFrame:
    """SemDeDup: within each k-means cell, drop every row that has a
    same-cell neighbor with cosine >= threshold and a smaller id (the
    smallest id of each near-identical group survives). Returns
    (id, cell, is_kept, dup_of) where dup_of is the smallest qualifying
    neighbor id (NULL for kept rows).

    Scale shape: candidate pairs exist only WITHIN a cell — the self-join
    shuffles on cell, so worst-case work is sum(|cell|^2) not n^2; a
    trained codebook keeps cells balanced at ~n/k rows (the skew defense
    random codebooks lack on clustered real-world embeddings). Scoring is
    an Arrow matmul on the joined pairs; only slim (id, dup_of) pairs
    survive the aggregation. At 10^12 rows, k scales as n/target_cell so
    per-cell work stays constant.
    """
    from doctr_spark.operators.similarity import cosine_pandas_col, ivf_cell_col

    assigned = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        ivf_cell_col(F.col(vec_col), centroids, nprobe=1)[0].alias("cell"),
    )
    a = assigned.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), "cell")
    b = assigned.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "cell")
    dup_pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_pandas_col(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= F.lit(float(threshold)))
        .select("id_b", "id_a")
    )
    dup_of = dup_pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
    return (
        assigned.select(F.col("_id").alias(id_col), "cell")
        .join(dup_of, F.col(id_col) == F.col("id_b"), "left")
        .select(
            id_col,
            "cell",
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
        )
    )
