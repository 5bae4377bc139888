"""Deduplication operators for large-scale text corpora.

All operators are pure DataFrame compositions — built-in functions
only, no Python row loops — so every stage is whole-stage-codegen'd
and shuffle-parallel at 100 TB:

- exact: content-hash groupBy (map-side combine).
- MinHash + LSH: shingle -> k minhashes -> b bands -> bucket join.
  Candidate generation never compares all pairs; the band bucket join
  is the only shuffle and is skew-safe under AQE.
- SimHash: 64-bit signature via bitwise majority vote of token
  hashes; near-dup candidates via banded signature chunks.

Hashing uses xxhash64 (Spark built-in, JVM-side); signatures are
deterministic per engine but not portable to other engines, hence the
rows-only correctness tier for the candidate-pair queries (SURVEY.md
section 2d note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tokens(col: str = "text"):
    """Whitespace tokenization (stays a Spark array column)."""
    return F.split(F.col(col), r"\s+", -1)


def word_shingles(col: str = "text", n: int = 3):
    """n-word shingles as an array column: slice a sliding window over
    the token array (JVM-side transform, no explode until needed)."""
    toks = tokens(col)
    return F.expr(
        f"transform(sequence(0, greatest(size(split({col}, '\\\\s+', -1)) - {n}, 0)),"
        f" i -> concat_ws(' ', slice(split({col}, '\\\\s+', -1), i + 1, {n})))"
    )


def minhash_signature(df: DataFrame, id_col: str, text_col: str = "text",
                      k: int = 32, n_shingle: int = 3) -> DataFrame:
    """(id, sig: array<bigint> of k minhashes).

    h_i(s) = xxhash64(s, i); min over the doc's shingle set — computed
    as one aggregate fold over the shingle array, so the whole
    signature is a single narrow projection, no explode, no shuffle.
    """
    sig = F.expr(
        "transform(sequence(0, {k}), i -> "
        " aggregate(sh, 9223372036854775807L,"
        "  (acc, s) -> least(acc, xxhash64(s, i))))".replace("{k}", str(k - 1))
    )
    return (df.select(F.col(id_col), word_shingles(text_col, n_shingle).alias("sh"))
            .select(id_col, sig.alias("sig")))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                      k: int = 32, bands: int = 8,
                      n_shingle: int = 3, min_est_jaccard: float = 0.5
                      ) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, est_jaccard).

    LSH banding: split the k-minhash signature into `bands` chunks of
    r = k/bands; docs sharing any chunk hash land in one bucket; pairs
    are generated per bucket (self-join on (band_id, band_hash)), then
    scored by signature agreement. Buckets — not pairs — bound the
    shuffle, which is what makes this viable at corpus scale.
    """
    r = k // bands
    sigs = minhash_signature(df, id_col, text_col, k, n_shingle)
    banded = sigs.select(
        id_col, "sig",
        F.posexplode(F.expr(
            f"transform(sequence(0, {bands - 1}),"
            f" b -> xxhash64(concat_ws(',', slice(sig, b * {r} + 1, {r})), b))"
        )).alias("band_id", "band_hash"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
                      "band_id", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
                      "band_id", "band_hash")
    pairs = (a.join(b, ["band_id", "band_hash"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b").distinct())
    est = (F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
        .cast("double") / F.size("sig_a"))
    return (pairs.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= min_est_jaccard)
            .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard")))


def simhash_signature(df: DataFrame, id_col: str, text_col: str = "text"
                      ) -> DataFrame:
    """(id, simhash: bigint) — 64-bit SimHash of the token multiset.

    Bit i of the signature is the sign of sum over tokens of
    (+1 if bit i of xxhash64(token) else -1): a bitwise majority vote,
    folded JVM-side over the token array.
    """
    votes = F.expr(
        "aggregate(split(text, '\\\\s+', -1), array_repeat(0L, 64),"
        " (acc, t) -> zip_with(acc,"
        "   transform(sequence(0, 63),"
        "     i -> CASE WHEN (shiftright(xxhash64(t), i) & 1) = 1"
        "          THEN 1L ELSE -1L END),"
        "   (a, v) -> a + v))".replace("text", text_col)
    )
    bits_to_long = F.expr(
        "aggregate(transform(sequence(0, 63),"
        " i -> IF(votes[i] > 0, shiftleft(1L, i), 0L)),"
        " 0L, (acc, x) -> acc | x)")
    return (df.select(id_col, votes.alias("votes"))
            .select(id_col, bits_to_long.alias("simhash")))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                  max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates: pairs whose 64-bit SimHash differs in at
    most `max_hamming` bits. Banding on 4x16-bit chunks (a pair within
    hamming<=3 must share a chunk exactly; wider radii still surface
    via any equal chunk) keeps the join bucketed, never all-pairs."""
    sigs = simhash_signature(df, id_col, text_col)
    chunked = sigs.select(
        id_col, "simhash",
        F.posexplode(F.expr(
            "transform(sequence(0, 3),"
            " c -> shiftright(simhash, c * 16) & 65535)"
        )).alias("chunk_id", "chunk_val"))
    a = chunked.select(F.col(id_col).alias("id_a"),
                       F.col("simhash").alias("sh_a"), "chunk_id", "chunk_val")
    b = chunked.select(F.col(id_col).alias("id_b"),
                       F.col("simhash").alias("sh_b"), "chunk_id", "chunk_val")
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (a.join(b, ["chunk_id", "chunk_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct()
            .withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text"
                ) -> DataFrame:
    """Keep one row per distinct content hash (min id wins)."""
    keep = (df.groupBy(F.md5(F.col(text_col)).alias("h"))
            .agg(F.min(id_col).alias(id_col)))
    return df.join(keep, on=id_col, how="left_semi")
