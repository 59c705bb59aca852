"""Distributed spherical k-means + SemDeDup (operators/clustering.py).

Not a docTR-reference operator family — part of the training-data-pipeline
surface (SURVEY §2 additions): the trained coarse quantizer for IVF ANN and
cluster-then-dedup semantic deduplication.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from doctr_spark.operators.clustering import (
    assign_cells,
    cluster_stats,
    kmeans_fit,
    semantic_dedup,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """Three well-separated unit clusters in 8-dim + one near-identical
    duplicate pair planted inside cluster 0."""
    rng = np.random.default_rng(3)
    centers = np.eye(8)[:3] * 4.0
    rows = []
    rid = 0
    truth = []
    for c in range(3):
        for _ in range(30):
            v = centers[c] + 0.15 * rng.standard_normal(8)
            rows.append((rid, [float(x) for x in v]))
            truth.append(c)
            rid += 1
    # planted near-dup of row 0 (same direction, tiny perturbation)
    v0 = np.array(rows[0][1])
    rows.append((rid, [float(x) for x in v0 + 1e-3]))
    truth.append(0)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, np.array(truth), rid  # rid == id of the planted dup (90)


def test_kmeans_recovers_separated_clusters(spark, clustered):
    df, truth, _ = clustered
    cents = kmeans_fit(df, k=3, dim=8, n_iter=6, sample_rows=256)
    cells = assign_cells(df, cents).toPandas().sort_values("vec_id")
    # assignment must match ground truth up to a permutation of labels
    mapping = {}
    for cell, t in zip(cells["cell"], truth):
        mapping.setdefault(int(cell), set()).add(int(t))
    assert all(len(v) == 1 for v in mapping.values()), mapping
    assert len(mapping) == 3
    st = cluster_stats(df, cents).toPandas()
    assert sorted(st["n_rows"]) == [30, 30, 31]
    assert (st["mean_sim"] > 0.95).all()  # tight clusters -> near-centroid


def test_kmeans_deterministic_and_unit_norm(spark, clustered):
    df, _, _ = clustered
    c1 = kmeans_fit(df, k=3, dim=8, n_iter=4, sample_rows=256)
    c2 = kmeans_fit(df, k=3, dim=8, n_iter=4, sample_rows=256)
    assert np.array_equal(c1, c2)  # bit-identical (pinned-oracle property)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_kmeans_rejects_k_above_sample(spark, clustered):
    df, _, _ = clustered
    with pytest.raises(ValueError):
        kmeans_fit(df, k=200, dim=8, sample_rows=91)


def test_semantic_dedup_removes_planted_dup_only_smallest_survives(spark, clustered):
    df, _, dup_id = clustered
    cents = kmeans_fit(df, k=3, dim=8, n_iter=6, sample_rows=256)
    out = semantic_dedup(df, cents, threshold=0.999).toPandas()
    removed = {int(r.vec_id): int(r.dup_of) for r in out[~out["is_kept"]].itertuples()}
    assert removed[dup_id] == 0  # planted copy dropped, smallest id survives
    assert 0 not in removed  # the survivor itself is kept
    assert out["is_kept"].sum() == len(out) - len(removed)


def test_semantic_dedup_matches_numpy_within_cells(spark, clustered):
    """Every (removed, dup_of) decision equals the brute-force same-cell
    rule: removed iff a smaller-id same-cell row has cosine >= tau."""
    df, _, _ = clustered
    tau = 0.985
    cents = kmeans_fit(df, k=3, dim=8, n_iter=6, sample_rows=256)
    pdf = df.toPandas().sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cell = np.argmax(matn @ cents.T, axis=1)
    sims = matn @ matn.T
    expect_removed = {}
    for b in range(len(matn)):
        for a in range(b):
            if cell[a] == cell[b] and round(sims[a, b], 6) >= tau:
                expect_removed[b] = min(expect_removed.get(b, a), a)
                break  # min over a asc -> first hit is the min
    out = semantic_dedup(df, cents, threshold=tau).toPandas()
    got = {int(r.vec_id): int(r.dup_of) for r in out[~out["is_kept"]].itertuples()}
    assert got == expect_removed
    assert len(expect_removed) > 0  # fixture exercises the path


SF_DIR = "/root/testdata/sf0.01"
needs_data = pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata absent")


@needs_data
def test_kmeans_balanced_cells_on_corpus(spark):
    """On the (near-uniform) sf0.01 embeddings a trained codebook keeps
    every cell within 2x the mean occupancy — the skew bound a seeded
    random codebook cannot promise on clustered data."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_fit(emb, k=16, dim=64, n_iter=5)
    st = cluster_stats(emb, cents).toPandas()
    assert len(st) == 16
    assert int(st["n_rows"].sum()) == 500
    assert st["n_rows"].max() <= 2 * (500 / 16)


def test_kmeans_empty_corpus_raises_cleanly(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no rows"):
        kmeans_fit(df, k=2, dim=8)
