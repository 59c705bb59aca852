"""Text-analysis / dedup / similarity operator tests (Spark-side)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from doctr_spark.functions.text import (
    char_class_ratio,
    ALPHA_REGEX,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from doctr_spark.operators.dedup import (
    exact_duplicates,
    distinct_by_fingerprint,
    jaccard_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    simhash64,
    simhash_near_duplicates,
)
from doctr_spark.operators.similarity import ann_lsh_topk, cosine_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "THE  quick Brown fox jumps over the lazy dog again and again today"),  # caseless/ws dup of 1
        (3, "the quick brown fox jumps over the lazy cat again and again today"),  # near-dup of 1
        (4, "der hund und die katze und der vogel und die maus"),
        (5, "completely different content about spark shuffles and partitions"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count_and_ratios(spark, docs):
    out = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("toks"),
        char_class_ratio(F.col("text"), ALPHA_REGEX).alias("alpha"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["toks"] == 13
    assert by_id[6]["toks"] == 0
    assert by_id[6]["alpha"] == 0.0
    assert 0.7 < by_id[1]["alpha"] < 0.9


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[4] == "de"
    assert out[6] == "unknown"


def test_quality_score_bounds(spark, docs):
    vals = [r["q"] for r in docs.select(quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_exact_dedup(spark, docs):
    dups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(dups) == 1
    assert dups[0]["survivor_id"] == 1
    assert dups[0]["n"] == 2
    assert dups[0]["sample_ids"] == [1, 2]
    capped = exact_duplicates(docs, "doc_id", "text", max_sample_ids=1).collect()
    assert capped[0]["sample_ids"] == [1]
    assert capped[0]["n"] == 2  # count is exact even when the sample caps
    kept = distinct_by_fingerprint(docs, "doc_id", "text")
    assert kept.count() == 5
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4, 5, 6}


def test_jaccard_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical after normalization
    assert (1, 3) in pairs and 0.2 <= pairs[(1, 3)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_deterministic_and_neardup(spark, docs):
    sigs1 = {r["id"]: list(r["sig"]) for r in minhash_signatures(docs, "doc_id", "text").collect()}
    sigs2 = {r["id"]: list(r["sig"]) for r in minhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs1 == sigs2  # deterministic
    assert sigs1[1] == sigs1[2]  # identical normalized text -> identical signature
    nd = {(r["id_a"], r["id_b"]) for r in minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5).collect()}
    assert (1, 2) in nd
    assert (1, 3) in nd  # single-word change keeps most shingles
    assert (4, 5) not in nd


def test_planes_for_corpus_occupancy():
    """Auto-sized hyperplane count keeps expected bucket occupancy at or
    under target across corpus scales (until the hi clamp, where n_tables /
    multiprobe take over)."""
    from doctr_spark.operators.similarity import planes_for_corpus

    for n in [100, 10_000, 1_000_000, 100_000_000]:
        p = planes_for_corpus(n, target_bucket_rows=16)
        assert n / (1 << p) <= 16
    assert planes_for_corpus(0) == 4  # lo clamp
    assert planes_for_corpus(10**12) == 24  # hi clamp
    # monotone non-decreasing in corpus size
    ps = [planes_for_corpus(10**k) for k in range(2, 10)]
    assert ps == sorted(ps)


def test_minhash_verified_near_duplicates(spark, docs):
    """LSH candidates + exact char-shingle Jaccard verify: near-identical
    docs found with their TRUE jaccard; unrelated docs excluded."""
    from doctr_spark.operators.dedup import minhash_verified_near_duplicates

    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_verified_near_duplicates(
            docs, "doc_id", "text", bands=32, threshold=0.5
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == 1.0  # identical normalized text
    assert all(0.5 <= j <= 1.0 for j in out.values())
    assert (4, 5) not in out


def test_simhash(spark, docs):
    hashes = simhash64(docs, "doc_id", "text").cache()
    vals = {r["id"]: r["simhash"] for r in hashes.collect()}
    assert vals[1] == vals[2]  # same token set
    nd = simhash_near_duplicates(hashes, max_hamming=8)
    got = {(r["id_a"], r["id_b"]) for r in nd.collect()}
    assert (1, 2) in got


def test_simhash_pigeonhole_recall_exhaustive(spark):
    # pigeonhole blocking must find EVERY pair at hamming <= max_hamming,
    # including pairs whose flipped bits span the old top-prefix block;
    # compare against the brute-force all-pairs truth.
    import itertools

    rng = np.random.default_rng(3)
    base = [int(rng.integers(0, 1 << 63)) for _ in range(8)]
    rows = []
    rid = 0
    for b in base:
        rows.append((rid, b))
        rid += 1
        for _ in range(3):  # flip up to 3 random bits anywhere in the word
            flips = rng.choice(64, size=int(rng.integers(1, 4)), replace=False)
            v = b
            for f in flips:
                v ^= 1 << int(f)
            rows.append((rid, np.int64(np.uint64(v))))
            rid += 1
    hashes = spark.createDataFrame([(i, int(v)) for i, v in rows], "id long, simhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_duplicates(hashes, max_hamming=3).collect()
    }
    truth = set()
    for (ia, va), (ib, vb) in itertools.combinations(rows, 2):
        h = bin(int(np.uint64(np.int64(va)) ^ np.uint64(np.int64(vb)))).count("1")
        if h <= 3:
            a, b = sorted((ia, ib))
            truth.add((a, b, h))
    assert got == truth
    assert len(truth) > 10  # the fixture actually exercises the blocking


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # 1 ~ 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 2)
    out = cosine_topk(vectors, queries, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["sim"]))
    assert sorted(by_q[0])[0][1] == 1  # nearest neighbor of 0 is its copy
    assert sorted(by_q[1])[0][1] == 0
    assert all(len(v) == 3 for v in by_q.values())


def test_ann_lsh_finds_copy(spark, vectors):
    queries = vectors.filter(F.col("vec_id") == 0)
    out = ann_lsh_topk(vectors, queries, k=3, n_planes=6, dim=16, n_tables=3).collect()
    assert any(r["neighbor_id"] == 1 and r["rank"] == 1 for r in out)


def test_ann_lsh_multiprobe_recall_floor(spark):
    """Hamming-1 multiprobe holds measured recall@5 >= 4/5 per query at
    sf0.01 (0.26 without it). The driver oracle pins the exact per-query
    counts; this floor invariant is the guard that retuning planes/tables
    cannot silently degrade retrieval quality."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    ann = ann_lsh_topk(emb, q, k=5, n_planes=None, dim=64, n_tables=4, multiprobe=1)
    exact = cosine_topk(emb, q, k=5)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .count()
        .collect()
    )
    per_q = {r["query_id"]: r["count"] for r in hits}
    assert all(per_q.get(i, 0) >= 4 for i in range(10)), per_q


def test_fingerprint_matches_duckdb(spark, docs):
    import duckdb

    got = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    pdf = docs.toPandas()
    for _, row in pdf.iterrows():
        expected = duckdb.sql(
            "select md5(trim(regexp_replace(lower(?), '\\s+', ' ', 'g')))", params=[row["text"]]
        ).fetchone()[0]
        assert got[row["doc_id"]] == expected


def test_ann_ivf_finds_copy(spark, vectors):
    from doctr_spark.operators.similarity import ann_ivf_topk

    queries = vectors.filter(F.col("vec_id") == 0)
    out = ann_ivf_topk(vectors, queries, k=3, n_centroids=4, nprobe=2, dim=16).collect()
    # 1 is a near-copy of 0: identical-direction vectors share the argmax
    # cell, so the copy is always a candidate and must rank first
    assert any(r["neighbor_id"] == 1 and r["rank"] == 1 for r in out)
    assert all(r["query_id"] == 0 for r in out)


def test_ann_ivf_multi_assign_superset(spark, vectors):
    """assign=2 boundary spill: candidates are a superset of single
    assignment at the same nprobe (each corpus row is in its argmax cell
    plus one more), with no duplicate (query, neighbor) rows."""
    from doctr_spark.operators.similarity import ann_ivf_topk

    queries = vectors.filter(F.col("vec_id") < 3)
    k = 50  # >= corpus size: top-k returns ALL candidates, so the result
    # sets compare candidate coverage directly
    single = ann_ivf_topk(vectors, queries, k=k, n_centroids=4, nprobe=2, dim=16)
    spill = ann_ivf_topk(vectors, queries, k=k, n_centroids=4, nprobe=2, dim=16, assign=2)
    s1 = {(r["query_id"], r["neighbor_id"]) for r in single.collect()}
    rows2 = spill.collect()
    s2 = {(r["query_id"], r["neighbor_id"]) for r in rows2}
    assert s1 <= s2
    assert len(s2) > len(s1)  # the fixture has cross-boundary neighbors
    assert len(rows2) == len(s2)  # multi-cell duplicates collapsed


def test_embedding_neardup_exact_matches_numpy(spark, vectors):
    from doctr_spark.operators.similarity import embedding_near_duplicates

    thr = 0.5
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in embedding_near_duplicates(vectors, threshold=thr, method="exact").collect()
    }
    pdf = vectors.toPandas().sort_values("vec_id")
    M = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    expected = {
        (i, j): round(S[i, j], 6)
        for i in range(len(M))
        for j in range(i + 1, len(M))
        if round(S[i, j], 6) >= thr
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9
    assert (0, 1) in got  # the planted near-copy pair


def test_embedding_neardup_lsh_subset_of_exact(spark, vectors):
    from doctr_spark.operators.similarity import embedding_near_duplicates

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(vectors, threshold=0.5, method="exact").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            vectors, threshold=0.5, method="lsh", n_planes=4, dim=16, n_tables=4
        ).collect()
    }
    assert lsh <= exact  # LSH affects recall only, never precision
    assert (0, 1) in lsh  # near-identical vectors collide in every table


def test_bpe_token_count(spark):
    from doctr_spark.functions.text import bpe_token_count

    rows = [
        (1, "don't stop"),          # don + 't + " stop" = 3
        (2, "hello,  world!"),      # hello + , + " world" + ! = 4
        (3, "abc123 x"),            # abc + 123 + " x" = 3
        (4, ""),                    # 0
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in df.select("id", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 3, 2: 4, 3: 3, 4: 0}


def test_deterministic_sample_stability(spark, docs):
    from doctr_spark.operators.sampling import deterministic_sample, sample_threshold_hex

    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in deterministic_sample(big, "doc_id", 0.25).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(big.repartition(7), "doc_id", 0.25).collect()}
    assert s1 == s2                       # partitioning-independent
    assert 0.18 < len(s1) / 2000 < 0.32   # ~rate
    sub = {r["doc_id"] for r in deterministic_sample(big, "doc_id", 0.1).collect()}
    assert sub <= s1                      # nested rates => nested samples
    assert sample_threshold_hex(0.0) == "0000" and sample_threshold_hex(1.0) == "ffff"
    import pytest as _pt
    with _pt.raises(ValueError):
        sample_threshold_hex(1.5)


def test_scrub_pii_and_url_stats(spark):
    from doctr_spark.functions.text import (
        distinct_domains_csv,
        pii_count_cols,
        scrub_pii,
        url_count,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b@c.de, dial +49 30 123456, host 10.0.0.1, ssn 111-22-3333"),
            (2, "no identifiers, just https://example.org/x and https://example.org/y"),
        ],
        "id long, text string",
    )
    counts = pii_count_cols(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            scrub_pii(F.col("text")).alias("s"),
            counts[0].alias("e"), counts[1].alias("n"), counts[2].alias("i"), counts[3].alias("p"),
            url_count(F.col("text")).alias("u"),
            distinct_domains_csv(F.col("text")).alias("d"),
        ).collect()
    }
    assert out[1]["s"] == "mail <EMAIL>, dial <PHONE>, host <IP>, ssn <ID>"
    assert (out[1]["e"], out[1]["n"], out[1]["i"], out[1]["p"]) == (1, 1, 1, 1)
    assert out[2]["s"].startswith("no identifiers")
    assert out[2]["u"] == 2 and out[2]["d"] == "example.org"  # distinct domains


def test_repetition_stats(spark):
    from doctr_spark.operators.dedup import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam eggs"),
            (2, "all words here are totally unique"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_words"] == 5 and out[1]["n_distinct_words"] == 2
    assert out[1]["dup_word_frac"] == 0.6
    assert out[1]["top_bigram"] == "spam spam" and out[1]["top_bigram_count"] == 3
    assert out[1]["top_bigram_frac"] == 0.75  # 3 of 4 bigrams
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["top_bigram_count"] == 1


def test_stratified_sample(spark):
    from doctr_spark.operators.sampling import deterministic_sample, stratified_sample

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    out = stratified_sample(docs, "doc_id", "lang", {"en": 0.1, "fr": 0.9})
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 60 <= by_lang["en"] <= 140   # ~10% of 1000
    assert 840 <= by_lang["fr"] <= 960  # ~90% of 1000
    # coordinated: the en sample is exactly the 10%-rate subset of en rows
    solo = deterministic_sample(docs.filter(F.col("lang") == "en"), "doc_id", 0.1)
    assert {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()} == {
        r["doc_id"] for r in solo.collect()
    }
    # default_rate=0 drops unlisted strata entirely
    assert stratified_sample(docs, "doc_id", "lang", {"en": 0.1}).filter(F.col("lang") == "fr").count() == 0


def test_lang_id_conf_gates(spark):
    from doctr_spark.functions.text import lang_id_conf

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),  # clear en
            (2, "a"),                                  # len <= 1 -> unknown
            (3, "x y z"),                              # no markers -> unknown
        ],
        "id long, text string",
    )
    lang, conf = lang_id_conf(F.col("text"))
    out = {r["id"]: (r["l"], r["c"]) for r in df.select("id", lang.alias("l"), conf.alias("c")).collect()}
    assert out[1][0] == "en" and out[1][1] == 1.0
    assert out[2] == ("unknown", 0.0)
    assert out[3] == ("unknown", 0.0)


def test_lm_bigram_scores(spark):
    from doctr_spark.operators.lm import lm_bigram_scores

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog ran")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz qq")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in lm_bigram_scores(train, score, "doc_id", "text").collect()}
    # V = 6 distinct train words {the,cat,sat,ran,a,dog}. in-domain doc:
    # p(the->cat)=(2+1)/(2+6), p(cat->sat)=(1+1)/(2+6)
    import math

    exp = round(round(math.log(3 / 8), 6) + round(math.log(2 / 8), 6), 6)
    assert out[10]["n_bigrams"] == 2 and out[10]["n_unseen"] == 0
    assert abs(out[10]["total_logp"] - exp) < 1e-9
    # fully out-of-domain doc: every bigram unseen, logp = ln(1/7) each
    assert out[11]["n_unseen"] == 1 and out[11]["n_bigrams"] == 1
    assert abs(out[11]["total_logp"] - round(math.log(1 / 6), 6)) < 1e-9
    # in-domain scores strictly higher than out-of-domain per-bigram
    assert out[10]["total_logp"] / out[10]["n_bigrams"] > out[11]["total_logp"]


def test_connected_components_and_survivors(spark):
    from doctr_spark.operators.graph import connected_components, dedup_clusters

    # two chains and an isolated pair: {1-2-3-4}, {10-11}, {20-21-22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "id_a long, id_b long",
    )
    cc = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    surv = {r["id"]: r["is_survivor"] for r in dedup_clusters(pairs).collect()}
    assert surv == {1: 1, 2: 0, 3: 0, 4: 0, 10: 1, 11: 0, 20: 1, 21: 0, 22: 0}


def test_connected_components_nonconvergence_raises(spark):
    import pytest as _pytest

    from doctr_spark.operators.graph import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # enough rounds: one component labeled by the min id
    ok = connected_components(chain, max_iter=15)
    assert {r["component"] for r in ok.collect()} == {0}


def test_decontaminate(spark):
    from doctr_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the secret eval answer is forty two exactly")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "the secret eval answer is forty two exactly copied"),  # leak
            (2, "the secret handshake"),                                 # 1 shared trigram? none (needs 3-gram overlap)
            (3, "totally unrelated content here"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: (r["n_contaminated_grams"], r["is_contaminated"])
           for r in decontaminate(corpus, bench, "doc_id", "text", n=3, min_hits=2).collect()}
    assert out[1][1] == 1 and out[1][0] >= 5
    assert out[3] == (0, 0)
    assert out[2][1] == 0


def test_split_into_windows(spark):
    from doctr_spark.functions.text import split_into_windows

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "short doc")],
        "doc_id long, text string",
    )
    rows = (
        df.select("doc_id", F.explode(split_into_windows(F.col("text"), window=4, stride=3)).alias("w"))
        .select("doc_id", "w.*")
        .collect()
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["window_idx"], r["start_tok"], r["n_tokens"], r["chunk"]))
    # 10 tokens, window 4, stride 3 -> ceil((10-4)/3)+1 = 3 windows
    assert [w[:3] for w in sorted(by_doc[1])] == [(0, 0, 4), (1, 3, 4), (2, 6, 4)]
    assert sorted(by_doc[1])[0][3] == "t0 t1 t2 t3"
    assert sorted(by_doc[1])[2][3] == "t6 t7 t8 t9"
    # short doc -> single partial window
    assert by_doc[2] == [(0, 0, 2, "short doc")]
    # overlap reconstruction: consecutive windows share stride' = window-stride tokens
    assert sorted(by_doc[1])[0][3].split()[3:] == sorted(by_doc[1])[1][3].split()[:1]


def test_stratified_sample_null_strata_fall_into_default(spark):
    from doctr_spark.operators.sampling import stratified_sample

    docs = spark.range(0, 600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, F.lit(None))
        .otherwise("xx")
        .alias("lang"),
    )
    out = stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, default_rate=1.0)
    # NULL and unlisted strata both keep EVERYTHING at default_rate=1.0
    assert out.filter(F.col("lang").isNull()).count() == 200
    assert out.filter(F.col("lang") == "xx").count() == 200
    # and the SQL twin agrees
    from doctr_spark.operators.sampling import stratified_sample_sql

    import duckdb

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    pred = stratified_sample_sql("doc_id", "lang", {"en": 0.5}, default_rate=1.0)
    n = con.execute(f"SELECT count(*) FROM documents WHERE {pred}").fetchone()[0]
    assert n == out.count()


def test_split_into_windows_stride_gt_window(spark):
    from doctr_spark.functions.text import split_into_windows

    df = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(10)))], "id long, text string")
    rows = (
        df.select(F.explode(split_into_windows(F.col("text"), window=4, stride=20)).alias("w"))
        .select("w.*")
        .collect()
    )
    # only one valid window; no past-the-end starts, no negative n_tokens
    assert [(r["window_idx"], r["start_tok"], r["n_tokens"]) for r in rows] == [(0, 0, 4)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_into_windows(F.col("text"), window=0, stride=1)


def test_exact_embedding_neardup_string_ids(spark):
    """The blocked exact path is id-type agnostic (regression: int64 cast
    broke string-keyed corpora)."""
    from doctr_spark.operators.similarity import embedding_near_duplicates

    rows = [("doc-a", [1.0, 0.0]), ("doc-b", [1.0, 0.001]), ("doc-c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = {(r["id_a"], r["id_b"]) for r in embedding_near_duplicates(df, threshold=0.99).collect()}
    assert out == {("doc-a", "doc-b")}


def test_lang_id_ngram_held_out(spark):
    """Cavnar-Trenkle n-gram language ID + script routing: held-out
    sentences (disjoint from the embedded training samples) classify
    correctly in all 17 supported languages; short text gates to unknown."""
    from doctr_spark.functions.langid import classify_text, lang_id_ngram

    cases = {
        "en": "a small dog ran across the road before the rain started falling",
        "de": "ein kleiner hund lief über die straße bevor der regen anfing zu fallen",
        "fr": "un petit chien a traversé la route avant que la pluie ne commence",
        "es": "un perro pequeño cruzó la carretera antes de que empezara la lluvia",
        "pt": "um cachorro pequeno atravessou a estrada antes que a chuva começasse",
        "nl": "een kleine hond rende de weg over voordat de regen begon te vallen",
        "pl": "mały pies przebiegł przez drogę zanim zaczął padać deszcz",
        "tr": "küçük bir köpek yağmur başlamadan önce yolun karşısına koştu",
        "ru": "маленькая собака перебежала дорогу до начала дождя",
        "ja": "小さな犬が雨が降り始める前に道路を渡った。ひらがなもあります。",
        "ko": "작은 개가 비가 오기 전에 길을 건넜다.",
        "el": "ένας μικρός σκύλος πέρασε τον δρόμο πριν αρχίσει η βροχή",
    }
    for want, text in cases.items():
        got, conf = classify_text(text)
        assert got == want, (want, got, conf)
    assert classify_text("ok") == ("unknown", 0.0)
    assert classify_text("") == ("unknown", 0.0)
    # Spark column path agrees with the driver-side function
    df = spark.createDataFrame([(t,) for t in cases.values()], "text string")
    rows = df.select(lang_id_ngram(F.col("text")).alias("r")).collect()
    assert sorted(r["r"]["lang"] for r in rows) == sorted(cases)
