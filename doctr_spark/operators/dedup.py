"""Deduplication + repetition operators for web-scale corpora.

- exact dedup          : hash-groupBy on a normalized fingerprint (pure SQL)
- n-gram Jaccard       : relational shingle join (pure SQL, oracle-checkable)
- MinHash + LSH        : signature pandas-UDF -> band explode -> bucket join;
                         minhash_verified_near_duplicates adds the exact
                         char-shingle Jaccard verify stage on candidates
- SimHash              : 64-bit weighted token hash; pigeonhole chunk
                         blocking (recall 1.0 at the Hamming budget)
- sequence packing     : partition-local greedy context-window packing
- repetition stats     : Gopher-style dup-word / top-bigram quality filters

Scale notes: the shingle join and LSH bucket join are the shuffle-heavy
paths; both shuffle only (id, shingle/band/chunk) pairs — never document
bodies. Candidate verification re-joins bodies by id. Band/bucket grouping
keys are high-cardinality, so AQE skew handling plus the banding parameters
keep partitions bounded. No driver-side collection anywhere.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalized_text

# ---------------------------------------------------------------- exact dedup


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_sample_ids: int = 100
) -> DataFrame:
    """Groups of exact duplicates (normalized): fingerprint, survivor id
    (the group minimum), group size, and a BOUNDED id sample. One shuffle
    on the 16-byte fingerprint.

    The member list is capped at ``max_sample_ids`` BEFORE aggregation via
    a row_number window over the same shuffle key. Trade-off, stated
    plainly: the window adds no extra exchange but forces a per-partition
    SORT of every group on the reduce side and disables the aggregation's
    map-side combine — what it buys is a BOUNDED agg buffer (sorts spill
    to disk; a collect_list buffer does not): a pathological fingerprint
    with 10^7 members must not build a 10^7-element in-memory array.
    Callers needing the full membership join the source on ``fp``."""
    w = Window.partitionBy("fp").orderBy("id")
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .withColumn("_rn", F.row_number().over(w))
        .groupBy("fp")
        .agg(
            F.min("id").alias("survivor_id"),
            F.count("*").alias("n"),
            F.sort_array(
                F.collect_list(F.when(F.col("_rn") <= max_sample_ids, F.col("id")))
            ).alias("sample_ids"),
        )
        .filter(F.col("n") > 1)
    )


def distinct_by_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the smallest id per fingerprint (deterministic survivor)."""
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )


# ----------------------------------------------------------- n-gram Jaccard


def word_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, w): positional word tokens over normalized text — the
    shared base stream for n-grams, repetition stats, and LM scoring (one
    definition so a tokenizer change cannot silently diverge them)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias("pos", "w"),
    )


def word_ngrams(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, ngram) distinct word n-grams via posexplode + lead windows —
    fully relational, so the DuckDB oracle can mirror it."""
    words = word_tokens(df, id_col, text_col)
    w = Window.partitionBy("id").orderBy("pos")
    cols = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, n)]
    return (
        words.select("id", F.concat_ws(" ", *cols).alias("ngram"), *[cols[-1].alias("_last")])
        .filter(F.col("_last").isNotNull())
        .select("id", "ngram")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, sim >= threshold).

    Quadratic in the worst case; the shingle equi-join bounds it to pairs
    sharing at least one n-gram. At 100 TB you'd front this with MinHash
    LSH (below) and use this as the verify stage on candidates only.
    """
    grams = word_ngrams(df, id_col, text_col, n).cache()
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), "ngram")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- MinHash/LSH

MINHASH_PRIME = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    # a1, a2 < 2^31 and each shingle half-hash < 2^32, so every a*x
    # product < 2^63 stays in native int64 — no Python-object bigint math
    # in the hot loop
    rng = np.random.default_rng(seed)
    a1 = rng.integers(1, 1 << 31, size=num_hashes, dtype=np.int64)
    a2 = rng.integers(1, 1 << 31, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MINHASH_PRIME, size=num_hashes, dtype=np.int64)
    return a1, a2, b


def _shingle_hashes(text: str, shingle: int) -> np.ndarray:
    """(n_shingles, 2) int64 — each distinct shingle as a PAIR of
    independently salted crc32s (~64 bits of identity; a lone 32-bit hash
    gives ~50% birthday collision odds per document at ~77k distinct
    shingles). The permutation family consumes both halves linearly, so
    two shingles collide post-hash only if both crc32s collide (~2^-64)."""
    t = " ".join(text.lower().split())
    views = (
        {t}
        if len(t) < shingle
        else {t[i : i + shingle] for i in range(len(t) - shingle + 1)}
    )
    out = np.empty((len(views), 2), dtype=np.int64)
    for i, s in enumerate(views):
        raw = s.encode()
        out[i, 0] = zlib.crc32(raw)
        out[i, 1] = zlib.crc32(raw + b"\x9e")
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, shingle: int = 5
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures over char shingles.
    Arrow-batched; (a1*x1 + a2*x2 + b) mod p permutation family over the
    64-bit shingle identity (two salted crc32 halves), seeded."""
    a1, a2, b = _minhash_params(num_hashes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col].astype(str):
                x = _shingle_hashes(text, shingle)  # (n, 2)
                # (num_hashes, n_shingles) all-int64: each a*x < 2^63,
                # per-term mods keep every intermediate under 2^63
                vals = (
                    (a1[:, None] * x[None, :, 0]) % MINHASH_PRIME
                    + (a2[:, None] * x[None, :, 1]) % MINHASH_PRIME
                    + b[:, None]
                ) % MINHASH_PRIME
                sigs.append(vals.min(axis=1))
            yield pd.DataFrame({"id": pdf[id_col].values, "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(run, schema="id long, sig array<long>")


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signatures and bucket-join: pairs sharing >=1 band bucket."""
    n_hashes_col = F.size("sig")
    rows_per_band = (n_hashes_col / bands).cast("int")
    banded = signatures.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.concat_ws(",", F.slice("sig", i * rows_per_band + 1, rows_per_band)), i),
            )
        ).alias("band", "bucket"),
    )
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified by signature-estimated Jaccard >= threshold."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes).cache()
    cands = lsh_candidate_pairs(sigs, bands)
    est = (
        cands.join(sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
        .join(sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda p, q: p == q), lambda v: v))
                / F.size("sig_a"),
                6,
            ),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold).select("id_a", "id_b", "est_jaccard")


def char_shingles(df: DataFrame, id_col: str, text_col: str, shingle: int = 5) -> DataFrame:
    """(id, gram) distinct character ``shingle``-grams over normalized text
    (lowercase, whitespace collapsed) — pure JVM exprs with an exact DuckDB
    twin. Texts shorter than ``shingle`` yield the whole string as the one
    gram, matching :func:`_shingle_hashes`."""
    norm = normalized_text(F.col(text_col))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (shingle - 1), F.lit(1))),
            lambda i: F.substring(norm, i, shingle),
        )
    )
    return df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))


def minhash_verified_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    shingle: int = 5,
) -> DataFrame:
    """MinHash-LSH candidates verified by EXACT char-shingle Jaccard — the
    full scale pipeline (blocking controls cost, the verify stage controls
    precision exactly). Returns (id_a, id_b, jaccard) with true Jaccard >=
    threshold; at ``bands=32`` (2 rows/band) a pair at Jaccard s collides
    with prob 1-(1-s^2)^32 (> 1 - 3e-9 at s=0.8), so for high-sim near-dups
    recall is 1 in practice and the output equals the brute-force truth —
    which is what the DuckDB oracle computes all-pairs.

    Scale shape: signatures are one Arrow pass; candidates shuffle slim
    (id, band, bucket) rows; the verify join shuffles (pair, gram) rows for
    candidate pairs only — never all pairs, never document bodies."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle)
    cands = lsh_candidate_pairs(sigs, bands)
    grams = char_shingles(df, id_col, text_col, shingle)
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        cands.join(grams.select(F.col("id").alias("id_a"), "gram"), "id_a")
        .join(grams.select(F.col("id").alias("id_b"), "gram"), ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -------------------------------------------------------------------- SimHash


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long): 64-bit SimHash over word tokens (crc32-seeded
    two-way hash for 64 bits, +/-1 bit votes).

    Vectorized per Arrow batch: token hashing stays a (cheap) Python loop,
    but bit extraction / voting / packing run as three numpy passes over
    the whole batch's token matrix — one (n_tokens, 64) unpack, a cumsum
    segmented per doc, one packed reduction — instead of 64-element
    allocations per token."""
    crc32 = zlib.crc32
    shifts = np.arange(64, dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes: list[int] = []
            offsets = [0]
            for text in pdf[text_col].astype(str):
                for tok in set(text.lower().split()):
                    # NB: string-reverse (not byte-reverse) — multi-byte
                    # UTF-8 tokens hash differently otherwise
                    hashes.append(crc32(tok.encode()) | (crc32(tok[::-1].encode() + b"#") << 32))
                offsets.append(len(hashes))
            h = np.array(hashes, dtype=np.uint64).reshape(-1)
            signs = (((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2) - 1
            cs = np.vstack([np.zeros((1, 64), dtype=np.int64), np.cumsum(signs, axis=0)])
            off = np.asarray(offsets)
            votes = cs[off[1:]] - cs[off[:-1]]  # (n_docs, 64) segment sums
            packed = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame({"id": pdf[id_col].values, "simhash": packed.astype(np.int64)})

    return df.select(id_col, text_col).mapInPandas(run, schema="id long, simhash long")


def simhash_chunk_cols(hash_col, n_chunks: int) -> list:
    """Split a 64-bit hash column into ``n_chunks`` contiguous bit chunks
    (widths as even as possible), each as a long column."""
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    cols, offset = [], 0
    for w in widths:
        c = F.shiftrightunsigned(hash_col, offset)
        if w < 64:
            c = c.bitwiseAND(F.lit((1 << w) - 1))
        cols.append(c)
        offset += w
    return cols


def simhash_near_duplicates(
    hashes: DataFrame, max_hamming: int = 3, n_blocks: int | None = None
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= ``max_hamming``, blocked
    Manku-style (Manku/Jain/Sarma, WWW'07 — multi-block permutation
    tables): the 64 bits split into ``n_blocks`` contiguous blocks
    (default ``max_hamming + 3``) and the join key for each candidate
    combination is the hash of a FULL ``n_blocks - max_hamming``-block
    subset. A pair within distance d has flipped bits in at most d blocks,
    so at least ``n_blocks - d`` blocks agree exactly, and some enumerated
    subset is drawn entirely from them — **recall 1.0 by construction**.

    Why not one-block keys (the round-2 version): a single 64/(d+1)-bit
    chunk has only ~2^16 distinct values at d=3, so bucket size grows
    linearly with the corpus and the within-bucket self-join goes quadratic
    at 10^9+ rows. A 3-block subset key carries ~32 bits of entropy
    (xxhash64 over the block values; collisions only add candidates, and
    the exact ``bit_count(xor)`` re-check removes them), so expected
    occupancy is n/2^32 — worst case, a bucket holds exactly the documents
    agreeing on 32+ specific bits, which at near-dup thresholds are
    overwhelmingly true positives. Cost: C(n_blocks, d) explode copies per
    row (20 at d=3) of slim (id, hash, combo, key) rows — linear shuffle
    volume in exchange for the quadratic bucket fix.
    """
    if max_hamming == 0:
        # exact-hash dedupe: plain self-equi-join on the full 64-bit key
        return (
            hashes.alias("x")
            .join(hashes.alias("y"), "simhash")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), F.lit(0).alias("hamming"))
        )
    if n_blocks is None:
        n_blocks = max_hamming + 3
    if n_blocks <= max_hamming:
        raise ValueError(f"n_blocks ({n_blocks}) must exceed max_hamming ({max_hamming})")
    m = n_blocks - max_hamming  # blocks per key
    chunks = simhash_chunk_cols(F.col("simhash"), n_blocks)
    keys = [
        F.xxhash64(F.lit(ci), *[chunks[i] for i in combo])
        for ci, combo in enumerate(combinations(range(n_blocks), m))
    ]
    blocked = hashes.select("id", "simhash", F.posexplode(F.array(*keys)).alias("combo", "key"))
    return (
        blocked.alias("x")
        .join(blocked.alias("y"), ["combo", "key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .withColumn("hamming", F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


# ------------------------------------------------------- sequence packing


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partitions: int | None = None,
    decreasing: bool = False,
) -> DataFrame:
    """Greedy sequence packing: group documents into packs whose token
    totals stay within ``budget`` (the training-data 'context-window
    packing' op). First-fit over each partition's slice — packing is an
    approximation by design, so partition-local greedy is the scalable
    choice (no global coordination). ``decreasing=True`` sorts each
    partition by token count descending first (first-fit-DECREASING, the
    11/9-optimal bin-packing classic) — a sortWithinPartitions, no
    shuffle — for measurably tighter packs on skewed length mixes.

    Returns (id, n_tokens, pack_id, pack_slot); pack_id is globally unique
    (partition_id * 2^32 + local pack index).
    """
    from collections.abc import Iterator as _It

    src = df.select(F.col(id_col).alias("id"), F.col(token_col).cast("long").alias("n_tokens"))
    if partitions:
        src = src.repartition(partitions, "id")
    if decreasing:
        src = src.sortWithinPartitions(F.desc("n_tokens"), F.asc("id"))

    def run(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        bins: list[int] = []  # remaining budget per open pack
        out_rows = []
        slot_counts: list[int] = []
        for pdf in it:
            for doc_id, n_tok in zip(pdf["id"], pdf["n_tokens"]):
                n_tok = min(int(n_tok), budget)
                placed = None
                for b_idx, rem in enumerate(bins):
                    if rem >= n_tok:
                        placed = b_idx
                        break
                if placed is None:
                    bins.append(budget)
                    slot_counts.append(0)
                    placed = len(bins) - 1
                bins[placed] -= n_tok
                out_rows.append(
                    {
                        "id": doc_id,
                        "n_tokens": n_tok,
                        "pack_id": (pid << 32) + placed,
                        "pack_slot": slot_counts[placed],
                    }
                )
                slot_counts[placed] += 1
        if out_rows:
            yield pd.DataFrame(out_rows)

    return src.mapInPandas(run, "id long, n_tokens long, pack_id long, pack_slot long")


# ------------------------------------------------- repetition filters


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition metrics (the Gopher/RefinedWeb-style
    quality-filter family): duplicate-word fraction and most-frequent
    word-bigram coverage. Fully relational (explode + window + groupBy), so
    the DuckDB oracle re-derives every value — and at 100 TB the whole op
    is two word-keyed aggregations, no Python.

    Returns (id, n_words, n_distinct_words, dup_word_frac, top_bigram,
    top_bigram_count, top_bigram_frac); ties on the top bigram break
    lexicographically."""
    words = word_tokens(df, id_col, text_col)
    word_stats = words.groupBy("id").agg(
        F.count("*").alias("n_words"),
        F.countDistinct("w").alias("n_distinct_words"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    bigrams = (
        words.select("id", "pos", "w", F.lead("w").over(w).alias("nx"))
        .filter(F.col("nx").isNotNull())
        .select("id", F.concat_ws(" ", "w", "nx").alias("bg"))
    )
    bg_counts = bigrams.groupBy("id", "bg").agg(F.count("*").alias("cnt"))
    top_w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("bg"))
    top = (
        bg_counts.withColumn("_rn", F.row_number().over(top_w))
        .filter(F.col("_rn") == 1)
        .select("id", F.col("bg").alias("top_bigram"), F.col("cnt").alias("top_bigram_count"))
    )
    n_bg = bigrams.groupBy("id").agg(F.count("*").alias("n_bigrams"))
    return (
        word_stats.join(top, "id", "left")
        .join(n_bg, "id", "left")
        .select(
            "id",
            "n_words",
            "n_distinct_words",
            F.round(1.0 - F.col("n_distinct_words") / F.col("n_words"), 6).alias("dup_word_frac"),
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_count", F.lit(0)).cast("long").alias("top_bigram_count"),
            F.round(
                F.coalesce(F.col("top_bigram_count") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )


# ------------------------------------------------- decontamination


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_hits`` distinct word n-grams with any benchmark/eval document
    (the standard leak filter run before pretraining). Returns
    (id, n_contaminated_grams, is_contaminated).

    Scale shape: benchmark n-grams are a small distinct set — broadcast to
    the corpus n-gram stream, so the corpus is scanned once and only
    (id, gram) hits aggregate; no corpus self-join."""
    corpus_grams = word_ngrams(corpus, id_col, text_col, n)
    bench_grams = word_ngrams(benchmark, id_col, text_col, n).select("ngram").distinct()
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "ngram")
        .groupBy("id")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    ids = corpus.select(F.col(id_col).alias("id"))
    return (
        ids.join(hits, "id", "left")
        .na.fill({"n_contaminated_grams": 0})
        .select(
            "id",
            F.col("n_contaminated_grams").cast("long").alias("n_contaminated_grams"),
            (F.col("n_contaminated_grams") >= min_hits).cast("long").alias("is_contaminated"),
        )
    )
