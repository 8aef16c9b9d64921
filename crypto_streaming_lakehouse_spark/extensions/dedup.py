"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design (the point of each algorithm):
- exact: one shuffle on the content hash — the cheapest possible pass.
- n-gram Jaccard: candidate pairs come from an equi-join on shared n-grams
  (inverted index), never a cross join; the gram join key distributes
  uniformly, and intersection counting is a grouped aggregation.
- MinHash LSH: per-doc signature is a per-row map (no shuffle); candidates
  come from an equi-join on band keys — O(#collisions), not O(n²); the
  final exact-Jaccard verify touches only candidate pairs via
  array_intersect on the already-computed gram arrays.
- SimHash: 32-bit signature per doc; candidates share one of four 8-bit
  bands, which is EXACT for hamming ≤ 3 by pigeonhole — banding is a
  lossless index, not an approximation.
- embedding cosine: documented as the brute-force baseline; the LSH-bucketed
  scale path lives in extensions.similarity.

Every hash is md5-based (functions.hashing) so the DuckDB oracle computes
bit-identical signatures; all expressions are native Columns (JVM-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int32, seeded_hash

N_HASHES = 16
N_BANDS = 4  # rows per band = N_HASHES // N_BANDS
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8-bit bands → exact for hamming <= SIMHASH_BANDS - 1


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column (empty array if < n words)."""
    w = F.split(F.trim(text), r"\s+")
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]
        ),
    )
    # Spark's sequence(1, k) with k < 1 counts DOWN; guard to empty instead.
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct text."""
    return (
        docs.withColumn("text_hash", F.md5(F.col(text_col).cast("binary")))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def _with_grams(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    return docs.select(
        "doc_id", word_ngrams(F.col(text_col), n).alias("grams")
    ).withColumn("n_grams", F.size("grams"))


def _jaccard(inter: Column, na: Column, nb: Column) -> Column:
    return inter.cast("double") / (na + nb - inter)


def ngram_jaccard_pairs(
    docs: DataFrame, *, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard.

    Inverted-index formulation: explode grams, equi-join on the gram,
    count shared grams per pair, then filter on Jaccard — no cross join.
    """
    g = _with_grams(docs, "text", n)
    posting = g.select("doc_id", F.explode("grams").alias("gram"))
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sizes = g.select("doc_id", "n_grams")
    sa = sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "n_grams", "na"
    )
    sb = sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "n_grams", "nb"
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", _jaccard(F.col("inter"), F.col("na"), F.col("nb")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(grams: Column, n_hashes: int = N_HASHES) -> list[Column]:
    """MinHash signature: per seed, min over the gram set of a seeded hash."""
    def hasher(seed: int):
        return lambda g: seeded_hash(seed, g)

    return [
        F.array_min(F.transform(grams, hasher(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified by exact Jaccard.

    shingle → minhash → band → bucket-join → array_intersect verify.
    """
    r = n_hashes // n_bands
    g = _with_grams(docs, "text", n).where(F.col("n_grams") > 0)
    sig = g.select("doc_id", "grams", "n_grams", *minhash_signature(g["grams"], n_hashes))

    band_keys = [
        F.concat_ws(
            "_", F.lit(str(b)), *[F.col(f"mh{b * r + j}") for j in range(r)]
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_keys)).alias("band_key")
    )
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ga = g.select(
        F.col("doc_id").alias("id_a"),
        F.col("grams").alias("grams_a"),
        F.col("n_grams").alias("na"),
    )
    gb = g.select(
        F.col("doc_id").alias("id_b"),
        F.col("grams").alias("grams_b"),
        F.col("n_grams").alias("nb"),
    )
    return (
        candidates.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("grams_a", "grams_b"))
        )
        .withColumn("jaccard", _jaccard(F.col("inter"), F.col("na"), F.col("nb")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_column(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over distinct word tokens: bit j set iff the majority of
    token hashes have bit j set."""
    tokens = F.array_distinct(F.split(F.trim(text), r"\s+"))
    hashes = F.transform(tokens, md5_int32)
    n = F.size(hashes)
    sim = F.lit(0).cast("long")
    for j in range(bits):
        # NB: a 2-arg lambda would make F.filter pass the array index as the
        # second argument — bind the bit via a closure factory instead.
        def bit_set(mask: int):
            return lambda h: h.bitwiseAND(F.lit(mask)) != 0

        cnt = F.size(F.filter(hashes, bit_set(1 << j)))
        sim = sim + F.when(2 * cnt > n, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sim


def simhash_pairs(
    docs: DataFrame, *, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.

    Banded: 4 bands of 8 bits; a pair within hamming ≤ 3 shares ≥ 1 exact
    band (pigeonhole), so the band join is lossless — no cross join.
    """
    s = docs.select("doc_id", simhash_column(F.col(text_col)).alias("simhash"))
    width = SIMHASH_BITS // SIMHASH_BANDS
    band_keys = [
        F.concat_ws(
            "_",
            F.lit(str(b)),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(
                F.lit((1 << width) - 1)
            ),
        )
        for b in range(SIMHASH_BANDS)
    ]
    bands = s.select("doc_id", "simhash", F.explode(F.array(*band_keys)).alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
