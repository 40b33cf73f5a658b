"""Deduplication operators over the documents/pages tables.

Large-scale training-data dedup, Spark-first:

* dedup_exact      — hash-groupBy on md5(text): one shuffle, map-side
                     partial agg; canonical doc = min(doc_id)
* ngram_jaccard    — exact n-gram (shingle) Jaccard over candidate
                     pairs discovered by a shared-shingle join; the
                     candidate join prunes the O(n²) space to pairs
                     sharing ≥1 shingle
* minhash_lsh      — MinHash signatures from arithmetic (a·x+b) mod p
                     permutations over a *query-local token dictionary*
                     (dense_rank over distinct tokens), banded into LSH
                     buckets; fully SQL-expressible so the DuckDB oracle
                     can verify the bucket-join pair set
* simhash64        — 64-bit SimHash from the same token dictionary

Scale notes: every operator is groupBy/join-shaped (no driver
collects); shingle/token explosion is the dominant cost and is done
once and reused; at 100 TB the shingle join runs bucketed on
(shingle_hash) with AQE skew splitting for stop-shingles, and the
band-bucket join replaces the all-pairs join entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# arithmetic MinHash permutation parameters (a, b) mod a 61-bit prime;
# values chosen once, shared with the SQL oracle
MINHASH_PRIME = 2305843009213693951  # 2^61 - 1
MINHASH_PERMS = [(2 * i + 3, 7919 * i + 1) for i in range(16)]
LSH_BANDS = 4  # 16 hashes → 4 bands × 4 rows


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lowercased whitespace tokens, one row per (doc, token)."""
    return df.select(
        id_col,
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("token"),
    ).where(F.col("token") != "")


def shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document, built natively:
    split → slide via transform over index sequence → concat."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return df.select(
        id_col, F.explode(F.array_distinct(grams)).alias("shingle")
    ).where(F.length("shingle") > 0)


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → (canonical_id, n_dups)."""
    return (
        df.select(id_col, F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle.

    candidate join → per-pair intersection count → |A∪B| = |A|+|B|−|A∩B|.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    sh = shingles(df, n=n, id_col=id_col).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def token_dictionary(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Dense token ids from a deterministic global ordering (dense_rank
    over distinct tokens).  Engine-independent — the SQL oracle builds
    the identical dictionary — unlike murmur/xxhash which differ across
    engines."""
    toks = tokens(df, id_col=id_col)
    dict_df = (
        toks.select("token")
        .distinct()
        .withColumn(
            "token_id", F.dense_rank().over(W.orderBy("token")).cast("bigint")
        )
    )
    return toks.join(dict_df, "token")


def minhash_signatures(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """16 MinHash values per doc: min((a·token_id + b) mod p) per perm.

    Single groupBy after the token join; permutations unroll as columns
    so the whole signature is one aggregation pass."""
    t = token_dictionary(df, id_col=id_col)
    aggs = [
        F.min((F.col("token_id") * a + b) % MINHASH_PRIME).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return t.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH candidate pairs: docs whose signatures agree on all rows of
    at least one band.  Band keys are concatenated minhashes — the
    bucket join replaces the all-pairs comparison."""
    sig = minhash_signatures(df, id_col=id_col)
    rows_per_band = len(MINHASH_PERMS) // LSH_BANDS
    bands = []
    for band in range(LSH_BANDS):
        cols = [
            F.col(f"mh_{band * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        bands.append(
            sig.select(
                F.col(id_col),
                F.lit(band).alias("band"),
                F.concat_ws("|", *cols).alias("bucket"),
            )
        )
    buckets = bands[0]
    for b in bands[1:]:
        buckets = buckets.unionByName(b)
    a = buckets.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash64(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over the token dictionary: bit j of the hash of a
    token is pseudo-random arithmetic ((token_id·A_j + B_j) mod p) & 1;
    the document bit is the majority vote.  Expressed as a cross join
    with a 64-row bit-index table + conditional sum — one shuffle."""
    t = token_dictionary(df, id_col=id_col)
    spark = df.sparkSession
    # 63 bits: sum(2^0..2^62) = int64 max, so the packed hash never
    # overflows signed 64-bit
    bits = spark.range(0, 63).select(F.col("id").alias("bit"))
    scored = (
        t.crossJoin(F.broadcast(bits))
        .withColumn(
            "bitval",
            ((F.col("token_id") * (F.col("bit") * 2654435761 + 40503)
              + F.col("bit") * 97) % MINHASH_PRIME) % 2,
        )
        .groupBy(id_col, "bit")
        .agg(
            (F.sum(F.col("bitval") * 2 - 1) > 0).cast("bigint").alias("bit_on")
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum(F.col("bit_on") * F.pow(F.lit(2.0), F.col("bit")).cast("bigint"))
        .cast("bigint")
        .alias("simhash")
    )
