"""Deduplication operators for large-scale text corpora.

All operators are pure DataFrame compositions (no Python UDFs) using
md5-based hashing, so every step is portable to an ANSI-SQL oracle and
deterministic across engines and partitionings.

Scale design:
- exact/fingerprint dedup: one shuffle on the hash (groupBy) — the hash is
  uniformly distributed so no skew; at 100 TB bucket the table by the hash.
- MinHash-LSH: explode-to-shingles is map-side; signatures are one groupBy
  per doc; band buckets are one groupBy on (band_id, band_hash). Candidate
  pairs never materialize the full O(n^2) space — only same-bucket pairs.
- n-gram Jaccard: exact pairwise scoring; the shared-shingle self-join is the
  scale hazard, so use it only downstream of LSH candidates (or small dims);
  `jaccard_pairs` keeps a `max_pairs_per_shingle` guard against hot shingles
  (stop-shingle skew — the same reason north_star salts codec hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingle_expr(text_col: str, n: int) -> str:
    """Word n-gram shingles as a Spark SQL expression (empty when < n words)."""
    w = f"split({text_col}, ' ')"
    if n == 1:
        return w
    return (f"CASE WHEN size({w}) >= {n} THEN "
            f"transform(sequence(1, size({w}) - {n - 1}), i -> concat_ws(' ', slice({w}, i, {n}))) "
            f"ELSE array() END")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """(id, shingle) distinct pairs."""
    return (df.select(F.col(id_col), F.explode(F.expr(_shingle_expr(text_col, n))).alias("shingle"))
            .distinct())


def exact_duplicates(df: DataFrame, id_col: str, text_col: str,
                     normalize: bool = False) -> DataFrame:
    """Hash-groupBy exact dedup. ``normalize`` lowercases and collapses
    whitespace first (document fingerprinting)."""
    txt = F.col(text_col)
    if normalize:
        txt = F.regexp_replace(F.lower(txt), r"\s+", " ")
    h = df.select(F.md5(txt).alias("fp"), F.col(id_col))
    groups = h.groupBy("fp").agg(F.count(F.lit(1)).alias("cnt"))
    return groups.filter(F.col("cnt") > 1)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 8, shingle_n: int = 2) -> DataFrame:
    """K min-hashes per doc. Each 'permutation' is min(md5(seed || shingle)) —
    the lexicographic min over hex digests is a valid uniform min-hash and is
    identical across engines (no 64-bit int conv needed)."""
    sh = shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_buckets(signatures: DataFrame, id_col: str, num_hashes: int = 8,
                band_size: int = 2) -> DataFrame:
    """(band_id, band_hash, id): same-bucket docs are near-dup candidates."""
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        bands.append(F.struct(F.lit(b).alias("band_id"),
                              F.md5(F.concat(*cols)).alias("band_hash")))
    return (signatures
            .select(F.col(id_col), F.explode(F.array(*bands)).alias("band"))
            .select(id_col, "band.band_id", "band.band_hash"))


def lsh_candidate_stats(df: DataFrame, id_col: str, text_col: str,
                        num_hashes: int = 8, band_size: int = 2,
                        shingle_n: int = 2) -> DataFrame:
    """One-row summary: #buckets, #multi-doc buckets, #candidate pairs."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    buckets = lsh_buckets(sigs, id_col, num_hashes, band_size)
    per_bucket = buckets.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("n"))
    return per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(F.sum(F.when(F.col("n") > 1, 1).otherwise(0)), F.lit(0)).alias("multi_buckets"),
        F.coalesce(F.sum(F.expr("n * (n - 1) / 2")).cast("bigint"), F.lit(0)).alias("candidate_pairs"))


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  shingle_n: int = 1, threshold: float = 0.8,
                  max_pairs_per_shingle: int | None = 1_000_000,
                  materialize: bool = True) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.
    Returns (id_a, id_b, jaccard). At scale, feed LSH candidates instead of
    the raw self-join.

    ``max_pairs_per_shingle`` guards the self-join against hot shingles
    (stop-shingle skew): a shingle occurring in df documents contributes
    df*(df-1)/2 pairs, so one stopword shared by every doc makes the join
    quadratic in corpus size. Shingles whose pair contribution exceeds the
    cap are dropped from the shingle space entirely — from the join AND the
    size counts, keeping the jaccard consistent on the filtered space (such
    shingles carry ~zero similarity signal anyway; they appear everywhere).
    Pass None to disable (exact semantics, unbounded skew)."""
    sh = shingles(df, id_col, text_col, shingle_n)
    # sh feeds four consumers (hot-list, both self-join sides, sizes); as a
    # plan subtree each would re-scan + re-explode + re-distinct the corpus
    # (measured: 9 FileScans). A lazy localCheckpoint rebases them all on ONE
    # materialized RDD — computed once at first use, blocks reused by every
    # consumer (MEMORY_AND_DISK, so it spills rather than OOMs). Lifecycle:
    # the blocks are released by Spark's ContextCleaner once the returned
    # DataFrame is garbage-collected (no explicit unpersist hook exists at
    # this layer). Tradeoff: localCheckpoint truncates lineage, so losing an
    # executor mid-job fails the job instead of recomputing — pass
    # materialize=False on preemptible clusters (costs the repeated scans).
    if materialize:
        sh = sh.localCheckpoint(eager=False)
    if max_pairs_per_shingle is not None:
        # df*(df-1)/2 <= cap  <=>  df <= (1 + sqrt(1+8*cap)) / 2
        max_df = int((1 + (1 + 8 * max_pairs_per_shingle) ** 0.5) // 2)
        # the HOT set is tiny by construction (each member appears in >max_df
        # docs), so broadcast it into an anti-join — the big side never
        # shuffles for the guard
        hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
               .filter(F.col("__df") > max_df).select("shingle"))
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (a.join(b, "shingle")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("shared")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (shared.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.col("shared") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("shared")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             bucket_col: str, threshold: float = 0.8,
                             round_digits: int = 6,
                             max_cell_size: int | None = 10_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed by ``bucket_col``
    (IVF-style: only same-bucket pairs are scored — at 100 TB the bucket is a
    coarse-quantizer cell, here any precomputed cluster/label column).
    Cosine via native zip_with/aggregate — no Python UDF. Returns
    (id_a, id_b, cos) with cos rounded for engine-portable comparisons.

    ``max_cell_size`` caps the within-cell all-pairs blowup: a cell of c
    vectors costs O(c^2) comparisons, so one degenerate coarse cell (all-zero
    embeddings, a catch-all label) can dominate the whole job. Cells larger
    than the cap are dropped — at scale, re-cluster such cells with a finer
    quantizer rather than brute-forcing them. Pass None to disable."""
    a = df.select(F.col(bucket_col).alias("__b"), F.col(id_col).alias("id_a"),
                  F.col(vec_col).alias("__va"))
    b = df.select(F.col(bucket_col).alias("__b"), F.col(id_col).alias("id_b"),
                  F.col(vec_col).alias("__vb"))
    if max_cell_size is not None:
        keep = (df.groupBy(F.col(bucket_col).alias("__b"))
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") <= max_cell_size).select("__b"))
        a = a.join(keep, "__b", "left_semi")
        b = b.join(keep, "__b", "left_semi")
    pairs = a.join(b, "__b").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("__va", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))
    nb = F.sqrt(F.aggregate("__vb", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))
    return (pairs.withColumn("cos", F.round(dot / (na * nb), round_digits))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))


_HEX_HIGH = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over word tokens: bit j is the sign of the sum of
    (+1 / -1) votes from the j-th hex nibble's high bit of each token's md5.
    Engine-portable (md5 + CASE only)."""
    tok = df.select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " ")).alias("t"))
    tok = tok.withColumn("h", F.md5(F.col("t")))
    votes = [
        F.sum(F.when(F.substring(F.col("h"), j + 1, 1).isin(_HEX_HIGH), 1)
              .otherwise(-1)).alias(f"v{j}")
        for j in range(16)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    bits = [F.when(F.col(f"v{j}") >= 0, 2 ** j).otherwise(0) for j in range(16)]
    expr = bits[0]
    for b in bits[1:]:
        expr = expr + b
    return per_doc.select(F.col(id_col), expr.cast("int").alias("simhash"))


def hamming16(a, b):
    """Hamming distance between two 16-bit simhash columns (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                           max_hamming: int = 2) -> DataFrame:
    """Near-duplicate pairs by 16-bit SimHash within `max_hamming` bits.

    Pigeonhole multi-index: split the 16-bit hash into max_hamming+1 bit
    bands — any pair within hamming distance max_hamming agrees EXACTLY on
    at least one band, so candidates are same-(band, band-value) pairs (one
    groupBy-sized join key, never O(n^2)); candidates are then verified with
    bit_count(xor). Pure Catalyst (shifts/masks), engine-portable.
    Returns (id_a, id_b, hamming) distinct verified pairs."""
    n_bands = max_hamming + 1
    sigs = simhash16(df, id_col, text_col)
    # band boundaries: split 16 bits as evenly as possible
    sizes = [(16 // n_bands) + (1 if i < 16 % n_bands else 0)
             for i in range(n_bands)]
    bands = []
    shift = 0
    for i, width in enumerate(sizes):
        mask = (1 << width) - 1
        bands.append(F.struct(
            F.lit(i).alias("band_id"),
            F.shiftright(F.col("simhash"), shift).bitwiseAND(F.lit(mask))
            .alias("band_val")))
        shift += width
    banded = (sigs.select(id_col, "simhash",
                          F.explode(F.array(*bands)).alias("b"))
              .select(id_col, "simhash", "b.band_id", "b.band_val"))
    a = banded.select(F.col(id_col).alias("id_a"),
                      F.col("simhash").alias("h_a"), "band_id", "band_val")
    b = banded.select(F.col(id_col).alias("id_b"),
                      F.col("simhash").alias("h_b"), "band_id", "band_val")
    cand = (a.join(b, ["band_id", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "h_a", "h_b").distinct())
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
