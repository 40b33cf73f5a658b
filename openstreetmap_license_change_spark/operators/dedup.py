"""Deduplication operators over the documents/pages tables.

Large-scale training-data dedup, Spark-first:

* dedup_exact      — hash-groupBy on md5(text): one shuffle, map-side
                     partial agg; canonical doc = min(doc_id)
* ngram_jaccard    — exact n-gram (shingle) Jaccard over candidate
                     pairs discovered by a shared-shingle join; the
                     candidate join prunes the O(n²) space to pairs
                     sharing ≥1 shingle
* minhash_lsh      — MinHash signatures from arithmetic (a·x+b) mod p
                     permutations over *arithmetic token ids* (31-bit
                     polynomial rolling hash of the token string — no
                     dictionary, no shuffle, no global state), banded
                     into LSH buckets; fully SQL-expressible so the
                     DuckDB oracle can verify the bucket-join pair set
* simhash64        — 63-bit SimHash from the same token ids, one
                     groupBy pass (63 conditional aggregates — no bit
                     cross join, no extra shuffle)

Scale notes: every operator is groupBy/join-shaped (no driver
collects); token ids derive locally per row — the round-1 dense_rank
dictionary was a single-partition global window (a 100-TB
scale-killer) and is gone.  Shingle/token explosion is the dominant
cost and is done once and reused; at 100 TB the shingle join runs
bucketed on (shingle_hash) with AQE skew splitting for stop-shingles,
and the band-bucket join replaces the all-pairs join entirely.
"""

from __future__ import annotations

import logging
import warnings

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

# arithmetic MinHash permutation parameters (a, b) mod a 61-bit prime;
# values chosen once, shared with the SQL oracle
MINHASH_PRIME = 2305843009213693951  # 2^61 - 1
MINHASH_PERMS = [(2 * i + 3, 7919 * i + 1) for i in range(16)]
LSH_BANDS = 4  # 16 hashes → 4 bands × 4 rows

# 31-bit polynomial rolling token hash: h = fold(h*B + codepoint) mod M.
# M is a Mersenne prime < 2^31 so h*B + 0x10FFFF stays far inside int64
# in both engines (DuckDB raises on int64 overflow — silent wraparound
# is not an option), and (h * max(a)) for the MinHash perms and
# (h * m_j) for the SimHash bit multipliers stay < 2^63 too.
TOKEN_HASH_BASE = 131
TOKEN_HASH_MOD = 2147483647  # 2^31 - 1

# SimHash per-bit multipliers, reduced mod 2^31-1 at constant-fold time
# so token_id (< 2^31) times m_j (< 2^31) never overflows int64
SIMHASH_BITS = 63  # sum(2^0..2^62) = int64 max: packed hash stays signed
SIMHASH_MULTS = [
    (j * 2654435761 + 40503) % TOKEN_HASH_MOD for j in range(SIMHASH_BITS)
]
# Hamming-ball LSH: d+1 bands guarantee recall for distance ≤ d
SIMHASH_PAIR_BANDS = 4


def token_hash(col: Column) -> Column:
    """Deterministic token id from the token string alone — pure
    per-row arithmetic (native aggregate over the char array), so the
    id assignment has NO shuffle and no global state, unlike a
    dense_rank dictionary.  Collisions (~V²/2³² for vocab V) merge
    tokens identically in Spark and the oracle; MinHash/SimHash are
    sketches, so a rare merge shifts estimates negligibly."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * TOKEN_HASH_BASE + F.ascii(c)) % TOKEN_HASH_MOD,
    )


def token_hash_sql(expr: str) -> str:
    """The DuckDB twin of :func:`token_hash` (verified char-for-char:
    identical values incl. non-ASCII code points)."""
    return (
        "list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), "
        "c -> CAST(ord(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {TOKEN_HASH_BASE} + x) % {TOKEN_HASH_MOD})"
    )


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lowercased whitespace tokens, one row per (doc, token)."""
    return df.select(
        id_col,
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("token"),
    ).where(F.col("token") != "")


def gram_array(text: Column, n: int) -> Column:
    """Word n-gram array (non-distinct, document order), built
    natively: split → slide via transform over index sequence →
    concat.  A doc shorter than ``n`` tokens yields its single
    short gram (both engines' oracles mirror this)."""
    toks = F.split(F.lower(text), r"\s+")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document (gram_array +
    array_distinct + explode)."""
    return df.select(
        id_col,
        F.explode(
            F.array_distinct(gram_array(F.col(text_col), n))
        ).alias("shingle"),
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
    max_doc_freq: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle.

    candidate join → per-pair intersection count → |A∪B| = |A|+|B|−|A∩B|.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    ``max_doc_freq`` is the stop-shingle guard for scale: with it set
    (fraction of docs), shingles appearing in more than that share of
    documents are excluded from the CANDIDATE join — the quadratic
    blowup term — while the Jaccard itself stays exact over the full
    shingle sets (array_intersect per candidate pair).  Trade, stated:
    a pair sharing ONLY stop-shingles is not generated; at real
    thresholds such pairs essentially never clear the bar, and the
    blowup they cause is the reason shared-shingle joins die at scale.
    Default None = exact candidates (the oracle-checked path)."""
    sh = shingles(df, n=n, id_col=id_col).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    if max_doc_freq is not None:
        n_docs = df.select(id_col).distinct().count()
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= int(max_doc_freq * n_docs))
            .select("shingle")
        )
        cand_src = sh.join(rare, "shingle")
        a_c = cand_src.select(F.col(id_col).alias("doc_a"), "shingle")
        b_c = cand_src.select(F.col(id_col).alias("doc_b"), "shingle")
        cands = (
            a_c.join(b_c, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("_set"))
        inter = (
            cands.join(
                sets.select(F.col(id_col).alias("doc_a"), F.col("_set").alias("_sa")),
                "doc_a",
            )
            .join(
                sets.select(F.col(id_col).alias("doc_b"), F.col("_set").alias("_sb")),
                "doc_b",
            )
            .withColumn(
                "n_inter", F.size(F.array_intersect("_sa", "_sb"))
            )
            .select("doc_a", "doc_b", "n_inter")
        )
    else:
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


def token_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, token_id) rows via :func:`token_hash` — derived locally
    per row, no dictionary join, no window, no shuffle.  Replaces the
    round-1 dense_rank dictionary whose unpartitioned window moved the
    whole vocabulary through one task."""
    return tokens(df, id_col=id_col).withColumn(
        "token_id", token_hash(F.col("token"))
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """16 MinHash values per doc: min((a·token_id + b) mod p) per perm.

    ZERO shuffles (r06): the whole signature is per-row array
    arithmetic — token ids are one ``transform`` over the distinct
    token array (hashed ONCE into a carried ``_ids`` column; the
    projections stay split so CollapseProject cannot re-inline the
    expensive hash 16×), and each permutation is an ``array_min`` over
    a cheap transform of that array.  The former explode → groupBy
    formulation paid a (doc, token_id) exchange for what is a purely
    local min; min over the distinct-token multiset is identical
    either way.  Docs with no non-empty token are absent, exactly the
    old groupBy's membership."""
    raw = F.split(F.lower(F.col("text")), r"\s+")
    toks = F.filter(
        F.array_distinct(raw), lambda x: x != F.lit("")
    )
    with_ids = df.where(
        F.exists(raw, lambda x: x != F.lit(""))
    ).select(id_col, F.transform(toks, token_hash).alias("_ids"))

    def _perm(a: int, b: int):
        # closure-bound constants: a 2-arg lambda would be read by the
        # HOF machinery as (element, index)
        return lambda v: (v * a + b) % MINHASH_PRIME

    return with_ids.select(
        id_col,
        *[
            F.array_min(
                F.transform(F.col("_ids"), _perm(a, b))
            ).alias(f"mh_{i}")
            for i, (a, b) in enumerate(MINHASH_PERMS)
        ],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    observation=None,
) -> DataFrame:
    """LSH candidate pairs: docs whose signatures agree on all rows of
    at least one band.  Band keys are concatenated minhashes — the
    bucket join replaces the all-pairs comparison.

    ``max_bucket_size`` is the mega-bucket guard for scale: the
    band-bucket self-join is QUADRATIC in bucket size, so one
    boilerplate page duplicated 10⁶× (Common-Crawl reality) puts 10⁶
    docs in a bucket and emits 10¹² pairs.  With the cap set, buckets
    larger than it are excluded from pair EMISSION entirely (their
    members still pair through any non-mega bucket they share) — the
    same trade as ``ngram_jaccard_pairs``' ``max_doc_freq`` stop-
    shingle guard, and the honest one: a mega-bucket's pairs belong to
    the clusters path (``minhash_lsh_clusters`` — label propagation,
    never pairwise) rather than a pair list nobody can materialize.

    No silent caps: pass a ``pyspark.sql.Observation`` as
    ``observation`` and the same job that emits the pairs records
    ``overflow_buckets`` / ``overflow_docs`` / ``total_buckets``
    metrics (read ``observation.get`` after an action) — one pass, no
    extra job.  Default ``None`` cap = exact pairs (the oracle-checked
    uncapped path, kept for A/B).

    Exactly-once: docs agreeing on SEVERAL bands meet in each of them.
    On the uncapped path the pair survives only in the FIRST matching
    band — a residual over the carried band-key arrays, the same rule
    as ``simhash_near_dup_pairs`` / ``temporal.interval_overlap_join``
    — which removes the full distinct() shuffle of the emitted pair
    stream.  The CAPPED path keeps distinct(): its contract is that a
    pair still emits through any non-mega band it shares, and "first
    matching band" can't see which earlier bands the cap excluded, so
    the residual would wrongly suppress pairs whose first shared band
    is the mega one; with a cap in force the pair stream is bounded,
    so the distinct is cheap there anyway."""
    sig = minhash_signatures(df, id_col=id_col)
    rows_per_band = len(MINHASH_PERMS) // LSH_BANDS
    band_keys = [
        F.concat_ws(
            "|",
            *[
                F.col(f"mh_{band * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        )
        for band in range(LSH_BANDS)
    ]
    buckets = (
        sig.select(F.col(id_col), F.array(*band_keys).alias("bks"))
        .withColumn(
            "band", F.explode(F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)))
        )
        .withColumn("bucket", F.element_at("bks", F.col("band") + 1))
    )
    if max_bucket_size is not None:
        sizes = buckets.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_n")
        )
        if observation is not None:
            sizes = sizes.observe(
                observation,
                F.count(
                    F.when(F.col("_n") > max_bucket_size, 1)
                ).alias("overflow_buckets"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("_n") > max_bucket_size, F.col("_n"))
                    ),
                    F.lit(0),
                ).alias("overflow_docs"),
                F.count(F.lit(1)).alias("total_buckets"),
            )
        keep = sizes.where(F.col("_n") <= max_bucket_size).select(
            "band", "bucket"
        )
        buckets = buckets.join(keep, ["band", "bucket"])
        a = buckets.select(F.col(id_col).alias("doc_a"), "band", "bucket")
        b = buckets.select(F.col(id_col).alias("doc_b"), "band", "bucket")
        return (
            a.join(b, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
    a = buckets.select(
        F.col(id_col).alias("doc_a"), F.col("bks").alias("bks_a"),
        "band", "bucket",
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), F.col("bks").alias("bks_b"),
        "band", "bucket",
    )
    first_match = (
        F.array_position(
            F.zip_with("bks_a", "bks_b", lambda x, y: x == y), F.lit(True)
        )
        - 1
    )
    return (
        a.join(b, ["band", "bucket"])
        .where((F.col("doc_a") < F.col("doc_b")) & (F.col("band") == first_match))
        .select("doc_a", "doc_b")
    )


def _lsh_buckets(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, band#bucket) membership rows — the bipartite doc–bucket
    graph both the pair join and the cluster propagation run on."""
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
                F.concat_ws(
                    "#", F.lit(str(band)), F.concat_ws("|", *cols)
                ).alias("bk"),
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def minhash_lsh_clusters(
    df: DataFrame, id_col: str = "doc_id", max_iters: int = 10
) -> DataFrame:
    """Near-dup CLUSTER ids: connected components over the doc–bucket
    bipartite graph, label = min doc_id in the component.

    This is the operator a 100-TB dedup actually needs: the pair list
    (`minhash_lsh_pairs`) is O(cluster²) on near-duplicate mega-clusters
    (7.7M pairs from 5k docs measured at sf0.1), while label
    propagation over bucket MEMBERSHIP is O(docs × bands) per
    iteration — two map-side-combined aggregations, never a pairwise
    join.  Each iteration hops two pair-graph edges; near-dup
    components are star/clique shaped, so convergence is fast and
    checked (early exit on zero changes).  Lineage is cut per
    iteration (localCheckpoint — the cascade's staged-commit pattern)
    because ``labels`` is self-referenced."""
    membership = _lsh_buckets(df, id_col=id_col)
    labels = (
        df.select(id_col).distinct().withColumn("label", F.col(id_col))
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        bucket_min = (
            membership.join(labels, id_col)
            .groupBy("bk")
            .agg(F.min("label").alias("bmin"))
        )
        doc_min = (
            membership.join(bucket_min, "bk")
            .groupBy(id_col)
            .agg(F.min("bmin").alias("nl"))
        )
        updated = (
            labels.join(doc_min, id_col, "left")
            .select(
                id_col,
                F.least(
                    F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), id_col)
            .where(F.col("u.label") != F.col("l.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    else:
        # "no silent caps" (SURVEY §4): a pair-graph component with
        # diameter > ~2·max_iters would exit here with wrong cluster
        # ids and, without this signal, no way to know.  Each
        # iteration hops two edges, so near-dup star/clique components
        # converge in 2-3 passes — exhaustion means pathological
        # chain-shaped input or too-low max_iters.
        msg = (
            f"minhash_lsh_clusters: label propagation did NOT converge "
            f"after max_iters={max_iters} ({changed} labels still "
            f"changing); cluster_ids may split true components. "
            f"Raise max_iters."
        )
        _LOG.warning(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(id_col, F.col("label").alias("cluster_id"))


def minhash_dedup_apply(
    df: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 10,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """APPLY the near-dup clustering: keep one canonical document per
    cluster (the min-id member — the cluster label itself) and report
    how many near-duplicates it absorbed.

    This closes the dedup loop: signatures → LSH buckets → cluster ids
    → *surviving corpus*.  Pass a precomputed ``clusters`` frame
    (id, cluster_id) to reuse a previous run — at 100 TB the
    clustering is a staged output, not something to recompute per
    consumer.  The keep-set derives from one aggregation over the
    cluster labels; survivors join back left-semi (broadcastable
    whenever the survivor fraction is small)."""
    if clusters is None:
        clusters = minhash_lsh_clusters(df, id_col=id_col, max_iters=max_iters)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    keep = sizes.withColumnRenamed("cluster_id", id_col)
    return df.join(keep, id_col, "inner")


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, count the
    distinct word ``n``-grams it shares with ANY benchmark document
    (the published training-data hygiene rule — e.g. GPT-3's 13-gram
    overlap test — generalized to a parameterized n).

    Returns one row per corpus doc: ``(id, n_hit_ngrams,
    n_bench_docs, contaminated)`` — docs with no overlap appear with
    zeros, so the caller filters ``NOT contaminated`` to keep the clean
    corpus (never an inner join that silently drops the clean rows).

    Scale shape: the benchmark side is an eval set — KBs-to-MBs
    against a TB-to-PB corpus — so its distinct (bench_id, shingle)
    pairs are explicitly ``broadcast()``; the corpus shingle stream
    joins map-side with NO shuffle of the exploded corpus, and the only
    exchange is the final per-doc groupBy.  If the benchmark ever
    outgrows broadcast range, drop the hint and the same plan runs as a
    shuffle join keyed by shingle.  Shingles join as raw strings for
    oracle parity; at extreme scale hash them to 64-bit first on both
    sides (pure map-side, same plan).
    """
    c_sh = shingles(corpus, n=n, text_col=text_col, id_col=id_col)
    b_sh = (
        shingles(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select(F.col(id_col).alias("_bench_id"), "shingle")
        .distinct()
    )
    hits = (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_hit_ngrams"),
            F.countDistinct("_bench_id").alias("n_bench_docs"),
        )
    )
    return corpus.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_hit_ngrams", F.lit(0)).alias("n_hit_ngrams"),
        F.coalesce("n_bench_docs", F.lit(0)).alias("n_bench_docs"),
        (F.coalesce("n_hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


def _simhash_bitval(j: int) -> Column:
    """±1 vote of bit j for one token: pseudo-random arithmetic
    ((token_id·m_j + j·97) mod p) & 1, mapped to −1/+1."""
    expr = (
        (F.col("token_id") * SIMHASH_MULTS[j] + j * 97) % MINHASH_PRIME
    ) % 2
    return expr * 2 - 1


def simhash_band_bounds(n_bands: int = SIMHASH_PAIR_BANDS) -> list[tuple[int, int]]:
    """(offset, width) per band, splitting the 63 SimHash bits as
    evenly as possible — earlier bands get the extra bit.  Shared with
    the SQL oracle so both engines cut identical band keys."""
    base, extra = divmod(SIMHASH_BITS, n_bands)
    bounds = []
    off = 0
    for k in range(n_bands):
        w = base + (1 if k < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def _band_value(col: Column, off: int, width: int) -> Column:
    # simhash is a non-negative 63-bit value, so arithmetic shiftright
    # never sign-extends
    return F.shiftright(col, off).bitwiseAND(F.lit((1 << width) - 1))


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    observation=None,
) -> DataFrame:
    """EXACT Hamming-ball near-dup pairs (doc_a < doc_b,
    hamming ≤ ``max_hamming``) over :func:`simhash64`, found by
    bit-band LSH instead of the all-pairs scan.

    The 63 signature bits split into ``max_hamming + 1`` bands
    (:func:`simhash_band_bounds`); by pigeonhole a pair differing in
    ≤ ``max_hamming`` bits leaves at least one band untouched, so the
    (band, band_value) equi-join has PERFECT recall and the residual
    ``bit_count(a ⊕ b) ≤ d`` makes it exact — Catalyst plans a hash
    join, never the quadratic cross product the naive predicate
    degrades to.  Each surviving pair is emitted exactly once via the
    first-matching-band rule (keep the match only in the lowest band
    index where the band values agree — computable as a residual from
    the two full signatures, no distinct() shuffle), the same
    exactly-once trick as ``temporal.interval_overlap_join``.

    ``max_bucket_size`` / ``observation`` are the mega-bucket guard,
    identical contract to :func:`minhash_lsh_pairs`: boilerplate
    duplicated 10⁶× collapses to one simhash → one quadratic bucket;
    with the cap set such buckets are excluded from pair emission and
    the same job records ``overflow_buckets`` / ``overflow_docs`` /
    ``total_buckets`` on the Observation.  Uncapped = exact (the
    oracle-checked path)."""
    n_bands = max_hamming + 1
    bounds = simhash_band_bounds(n_bands)
    sig = simhash64(df, id_col=id_col)
    slices = [
        sig.select(
            F.col(id_col),
            F.col("simhash"),
            F.lit(k).alias("band"),
            _band_value(F.col("simhash"), off, w).alias("bucket"),
        )
        for k, (off, w) in enumerate(bounds)
    ]
    buckets = slices[0]
    for s in slices[1:]:
        buckets = buckets.unionByName(s)
    if max_bucket_size is not None:
        sizes = buckets.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_n")
        )
        if observation is not None:
            sizes = sizes.observe(
                observation,
                F.count(
                    F.when(F.col("_n") > max_bucket_size, 1)
                ).alias("overflow_buckets"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("_n") > max_bucket_size, F.col("_n"))
                    ),
                    F.lit(0),
                ).alias("overflow_docs"),
                F.count(F.lit(1)).alias("total_buckets"),
            )
        keep = sizes.where(F.col("_n") <= max_bucket_size).select(
            "band", "bucket"
        )
        buckets = buckets.join(keep, ["band", "bucket"])
    a = buckets.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"),
        "band", "bucket",
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"),
        "band", "bucket",
    )
    first_match = F.lit(n_bands)  # sentinel, never reached on a match
    for k, (off, w) in reversed(list(enumerate(bounds))):
        first_match = F.when(
            _band_value(F.col("sh_a"), off, w)
            == _band_value(F.col("sh_b"), off, w),
            F.lit(k),
        ).otherwise(first_match)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "bucket"])
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (hamming <= max_hamming)
            & (F.col("band") == first_match)
        )
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )


def simhash64(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """63-bit SimHash: bit j of the document hash is the majority vote
    of its tokens' pseudo-random bit-j values.  The 63 bits unroll as
    63 conditional sums in ONE groupBy pass — no bit cross join (the
    round-1 shape amplified the token table 63× and added a second
    shuffle), so the whole sketch is a single exchange."""
    t = token_ids(df, id_col=id_col)
    votes = [
        F.sum(_simhash_bitval(j)).alias(f"v_{j}") for j in range(SIMHASH_BITS)
    ]
    scored = t.groupBy(id_col).agg(*votes)
    packed = None
    for j in range(SIMHASH_BITS):
        term = (F.col(f"v_{j}") > 0).cast("bigint") * F.lit(1 << j).cast(
            "bigint"
        )
        packed = term if packed is None else packed + term
    return scored.select(id_col, packed.alias("simhash"))


def simhash_clusters(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    max_iters: int = 12,
    max_bucket_size: int | None = None,
    observation=None,
) -> DataFrame:
    """Near-duplicate clusters: connected components of the EXACT
    Hamming-ball pair graph (:func:`simhash_near_dup_pairs`), label =
    component min id; every input doc appears, isolated docs are
    singletons — the simhash sibling of :func:`minhash_lsh_clusters`.

    Unlike the minhash clustering, which propagates over the
    doc–bucket BIPARTITE graph and never materializes pairs, exact
    Hamming clusters need the verified pair edges: band-bucket
    co-membership alone is NOT transitive evidence of hamming ≤ d
    (two docs sharing a band can differ in 60 bits), so skipping the
    ``bit_count`` residual would merge unrelated docs.  The scale
    path is therefore the pair cap: ``max_bucket_size`` +
    ``observation`` (identical contract to the pair op — boilerplate
    mega-buckets are excluded LOUDLY, never silently exploded).

    Propagation is the shared pointer-jumping min-label machinery
    (`operators/graph.py`): O(log chain-length) rounds on the
    A~B~C near-dup chains web corpora produce, localCheckpoint per
    round, non-convergence WARNS (minhash_lsh_clusters' contract)."""
    from .graph import min_label_components

    pairs = simhash_near_dup_pairs(
        df,
        max_hamming=max_hamming,
        id_col=id_col,
        max_bucket_size=max_bucket_size,
        observation=observation,
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    edges = pairs.select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    labels = min_label_components(
        ids, edges, max_iters=max_iters, op_name="simhash_clusters"
    )
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    max_dist: int = 1,
    left_id: str = "doc_id",
    right_id: str = "cand_id",
    key_col: str = "key",
) -> DataFrame:
    """Bounded fuzzy key matching: pairs whose keys are within
    Levenshtein distance ``max_dist`` — typo-tolerant url/entity
    reconciliation (the distributed face of the reference's
    `levenshtein_distance` significance check, tags.rb:341-362, which
    compares two tag values in-row; here the same metric drives a
    corpus×corpus join).

    A naive fuzzy join is |L|·|R|; candidates come from the FastSS
    DELETION NEIGHBORHOOD (Bocek et al.): every key fans to itself
    plus its len single-deletion variants, and ``lev(a,b) ≤ 1``
    implies the neighborhoods share a string (a substitution deletes
    the differing position from both; an indel deletes the extra
    char from the longer side) — so the variant equi-join is a
    PROVABLE candidate superset, and the JVM-native levenshtein
    filter makes the result exact.  Fan-out is len+1 rows per key —
    bounded by key length (urls/tokens, not documents; for long text
    use the MinHash family instead).

    Plan: two narrow explode fans, one equi-join on the variant
    string, distinct pairs, native levenshtein filter — no Python,
    no cross join.  Returns (ids, key pair, lev_dist ≤ max_dist)."""
    if max_dist != 1:
        raise ValueError(
            "fuzzy_key_join implements the single-deletion "
            f"neighborhood (exact for max_dist=1); got {max_dist}"
        )

    def fan(df, idc, side):
        k = F.col(key_col)
        # 1-based substring semantics are engine-identical
        variants = F.expr(
            f"array_union(array({key_col}), "
            f"transform(sequence(1, length({key_col})), "
            f"i -> concat(substring({key_col}, 1, i - 1), "
            f"substring({key_col}, i + 1, 1000000))))"
        )
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            k.alias(f"{side}_key"),
            F.explode(variants).alias("variant"),
        )

    lf = fan(left, left_id, "l")
    rf = fan(right, right_id, "r")
    cand = (
        lf.join(rf, "variant")
        .select("l_id", "l_key", "r_id", "r_key")
        .distinct()
    )
    out = cand.withColumn(
        "lev_dist", F.levenshtein("l_key", "r_key")
    ).where(F.col("lev_dist") <= max_dist)
    return out.select(
        F.col("l_id").alias(left_id),
        F.col("r_id").alias(right_id),
        F.col("l_key").alias("left_key"),
        F.col("r_key").alias("right_key"),
        "lev_dist",
    )


def fuzzy_key_join_sql(
    left_src: str,
    right_src: str,
    max_dist: int = 1,
    left_id: str = "doc_id",
    right_id: str = "cand_id",
    key_col: str = "key",
) -> str:
    """DuckDB twin of :func:`fuzzy_key_join` (deletion-neighborhood
    blocking, native levenshtein filter)."""
    if max_dist != 1:
        raise ValueError("twin implements the d=1 neighborhood only")

    def fan(src, idc, side):
        return f"""
            SELECT {idc} AS {side}_id, {key_col} AS {side}_key,
                   UNNEST(list_distinct(list_append(
                       list_transform(
                           range(1, length({key_col}) + 1),
                           i -> substr({key_col}, 1, i - 1)
                                || substr({key_col}, i + 1)),
                       {key_col}))) AS variant
            FROM {src}
        """

    return f"""
        WITH fz_l AS ({fan(left_src, left_id, 'l')}),
        fz_r AS ({fan(right_src, right_id, 'r')}),
        fz_cand AS (
            SELECT DISTINCT l.l_id, l.l_key, r.r_id, r.r_key
            FROM fz_l l JOIN fz_r r USING (variant)
        )
        SELECT l_id AS {left_id}, r_id AS {right_id},
               l_key AS left_key, r_key AS right_key,
               CAST(levenshtein(l_key, r_key) AS INTEGER) AS lev_dist
        FROM fz_cand
        WHERE levenshtein(l_key, r_key) <= {int(max_dist)}
    """


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold_ppm: int = 500_000,
    id_col: str = "doc_id",
    max_doc_freq: float | None = None,
) -> DataFrame:
    """Asymmetric shingle-set CONTAINMENT, C(A→B) = |A∩B| / |A| — the
    quote/subset detector that Jaccard structurally misses: a short
    document fully embedded in a long one (a quoted post, boilerplate
    inclusion, a partial copy) has Jaccard ≈ |A|/|B| → 0 but
    containment → 1 (Broder's resemblance-vs-containment distinction).
    The training-data use case is quote-chain and wrapper-page
    detection, where :func:`ngram_jaccard_pairs` keeps both copies.

    Exact integers end-to-end: per unordered candidate pair (one
    shared-shingle equi-join, each pair once by ``doc_a < doc_b``),
    c_ab_ppm = n_inter·10⁶ DIV |A| and c_ba_ppm likewise — no float
    ratio, so the twin hash-matches every containment.  Pairs emit
    when EITHER direction clears ``threshold_ppm``.

    ``max_doc_freq`` is the same stop-shingle candidate cap as
    :func:`ngram_jaccard_pairs` (the quadratic-blowup guard at scale,
    same stated trade: a pair sharing ONLY stop-shingles is not
    generated; containments of generated pairs stay exact via full
    array_intersect).  Default None = exact candidates.

    Output: (doc_a, doc_b, n_inter, na, nb, c_ab_ppm, c_ba_ppm)."""
    sh = shingles(df, n=n, id_col=id_col).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    if max_doc_freq is not None:
        n_docs = df.select(id_col).distinct().count()
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= int(max_doc_freq * n_docs))
            .select("shingle")
        )
        cand_src = sh.join(rare, "shingle")
        a_c = cand_src.select(F.col(id_col).alias("doc_a"), "shingle")
        b_c = cand_src.select(F.col(id_col).alias("doc_b"), "shingle")
        cands = (
            a_c.join(b_c, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("_set"))
        inter = (
            cands.join(
                sets.select(
                    F.col(id_col).alias("doc_a"), F.col("_set").alias("_sa")
                ),
                "doc_a",
            )
            .join(
                sets.select(
                    F.col(id_col).alias("doc_b"), F.col("_set").alias("_sb")
                ),
                "doc_b",
            )
            .withColumn("n_inter", F.size(F.array_intersect("_sa", "_sb")))
            .select("doc_a", "doc_b", "n_inter")
        )
    else:
        a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
        b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "c_ab_ppm", F.expr("n_inter * 1000000 DIV na").cast("bigint")
        )
        .withColumn(
            "c_ba_ppm", F.expr("n_inter * 1000000 DIV nb").cast("bigint")
        )
        .where(
            F.greatest("c_ab_ppm", "c_ba_ppm") >= F.lit(int(threshold_ppm))
        )
        .select(
            "doc_a", "doc_b", "n_inter", "na", "nb", "c_ab_ppm", "c_ba_ppm"
        )
    )


def containment_pairs_sql(
    src: str,
    n: int = 3,
    threshold_ppm: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`containment_pairs` (exact-candidate
    path): concat_ws mirrors gram_array's short-doc semantics (a doc
    shorter than ``n`` tokens yields its single short gram — DuckDB's
    concat_ws skips the NULL tail exactly like Spark's), integer ppm
    floor-divs match DIV.  CTE names ct_*-namespaced."""
    parts = ", ".join(f"ts[i+{j}]" for j in range(n))
    return f"""
        WITH ct_toks AS (
            SELECT {id_col} AS doc_id,
                   string_split_regex(lower({text_col}), '\\s+') AS ts
            FROM {src}
        ),
        ct_grams AS (
            SELECT DISTINCT doc_id,
                   concat_ws(' ', {parts}) AS shingle
            FROM ct_toks,
                 LATERAL (SELECT UNNEST(range(1,
                     GREATEST(len(ts) - {n - 1}, 1) + 1)) AS i) g
            WHERE length(concat_ws(' ', {parts})) > 0
        ),
        ct_sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM ct_grams GROUP BY 1
        ),
        ct_inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_inter
            FROM ct_grams a JOIN ct_grams b ON a.shingle = b.shingle
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, n_inter,
               sa.n_sh AS na, sb.n_sh AS nb,
               CAST(n_inter * 1000000 // sa.n_sh AS BIGINT) AS c_ab_ppm,
               CAST(n_inter * 1000000 // sb.n_sh AS BIGINT) AS c_ba_ppm
        FROM ct_inter
        JOIN ct_sizes sa ON sa.doc_id = doc_a
        JOIN ct_sizes sb ON sb.doc_id = doc_b
        WHERE GREATEST(n_inter * 1000000 // sa.n_sh,
                       n_inter * 1000000 // sb.n_sh)
              >= {int(threshold_ppm)}
    """


def cluster_audit(
    clusters: DataFrame,
    docs: DataFrame,
    max_cluster_size: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup-cluster QUALITY audit: for every non-singleton cluster,
    the exact pairwise token-Jaccard floor and mean — the check that
    the LSH/banding pipeline grouped actual near-duplicates rather
    than hash-coincidences.  Sketch pipelines are probabilistic; the
    audit is exact, so a weak cluster (min_jaccard_ppm near 0 — a
    chain artifact of transitive closure) is measured, not hoped
    away.  Run it on a SAMPLE of clusters at full scale; the
    quadratic term is bounded per cluster either way.

    ``clusters``: (id, cluster_id) — e.g. minhash_lsh_clusters'
    output.  Pair fan is C(size, 2) per cluster; ``max_cluster_size``
    fails LOUD via assert_true riding the join key (the
    common_neighbor_pairs rule: to audit mega-clusters, sample
    members upstream and own the decision).

    Plan: one token explode (distinct per doc), cluster join, the
    per-cluster pair self-join on (cluster, token) for intersections,
    doc-size join for the union, then one cluster rollup.  Output:
    (cluster_id, n_docs, n_pairs, min_jaccard_ppm, mean_jaccard_ppm)
    — mean as Σjac DIV n_pairs, each pair's jac already an exact
    DIV-floored ppm."""
    cl = clusters.select(
        F.col(id_col), F.col("cluster_id").cast("bigint").alias("cluster_id")
    )
    sizes_c = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).where(F.col("n_docs") >= 2)
    guard = F.assert_true(
        F.col("n_docs") <= F.lit(int(max_cluster_size)),
        F.lit(
            f"cluster_audit: cluster exceeds max_cluster_size="
            f"{max_cluster_size}; pair fan-out is C(n,2) — sample "
            "members upstream or raise the cap"
        ),
    )
    live = cl.join(sizes_c, "cluster_id").select(
        F.when(guard.isNull(), F.col("cluster_id")).alias("cluster_id"),
        id_col,
    )
    toks = tokens(docs, text_col=text_col, id_col=id_col)
    doc_sz = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    ctoks = live.join(toks, id_col)
    inter = (
        ctoks.select("cluster_id", F.col(id_col).alias("_a"), "token")
        .join(
            ctoks.select(
                "cluster_id", F.col(id_col).alias("_b"), "token"
            ),
            ["cluster_id", "token"],
        )
        .where(F.col("_a") < F.col("_b"))
        .groupBy("cluster_id", "_a", "_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    # pairs sharing ZERO tokens never appear in `inter`; rebuild the
    # full pair set from membership so they audit as jaccard 0
    members = live.select("cluster_id", F.col(id_col).alias("_a"))
    all_pairs = (
        members.join(
            live.select("cluster_id", F.col(id_col).alias("_b")),
            "cluster_id",
        )
        .where(F.col("_a") < F.col("_b"))
    )
    pairs = (
        all_pairs.join(inter, ["cluster_id", "_a", "_b"], "left")
        .join(doc_sz.select(F.col(id_col).alias("_a"),
                            F.col("_sz").alias("_sa")), "_a", "left")
        .join(doc_sz.select(F.col(id_col).alias("_b"),
                            F.col("_sz").alias("_sb")), "_b", "left")
        .select(
            "cluster_id",
            F.expr(
                "CAST(COALESCE(_inter, 0) * 1000000 DIV "
                "GREATEST(COALESCE(_sa, 0) + COALESCE(_sb, 0) "
                "- COALESCE(_inter, 0), 1) AS BIGINT)"
            ).alias("_jac"),
        )
    )
    return pairs.groupBy("cluster_id").agg(
        (F.count(F.lit(1))).alias("n_pairs"),
        F.min("_jac").alias("min_jaccard_ppm"),
        F.expr("CAST(SUM(_jac) DIV COUNT(1) AS BIGINT)").alias(
            "mean_jaccard_ppm"
        ),
    ).join(sizes_c, "cluster_id").select(
        "cluster_id", "n_docs", "n_pairs",
        "min_jaccard_ppm", "mean_jaccard_ppm",
    )


def cluster_audit_sql(
    clusters_src: str,
    docs_src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`cluster_audit` (standalone; no size
    guard — the operator owns the loud failure)."""
    return f"""
        WITH ca_cl AS (
            SELECT {id_col}, CAST(cluster_id AS BIGINT) AS cluster_id
            FROM {clusters_src}
        ),
        ca_sizes AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM ca_cl GROUP BY 1 HAVING COUNT(*) >= 2
        ),
        ca_live AS (
            SELECT c.cluster_id, c.{id_col}
            FROM ca_cl c JOIN ca_sizes s USING (cluster_id)
        ),
        ca_toks AS (
            SELECT DISTINCT {id_col}, tok AS token
            FROM {docs_src},
                 LATERAL UNNEST(string_split_regex(lower({text_col}),
                                '\\s+')) AS u(tok)
            WHERE tok <> ''
        ),
        ca_sz AS (
            SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS sz
            FROM ca_toks GROUP BY 1
        ),
        ca_ct AS (
            SELECT l.cluster_id, l.{id_col}, t.token
            FROM ca_live l JOIN ca_toks t USING ({id_col})
        ),
        ca_inter AS (
            SELECT a.cluster_id, a.{id_col} AS ia, b.{id_col} AS ib,
                   CAST(COUNT(*) AS BIGINT) AS inter
            FROM ca_ct a
            JOIN ca_ct b ON a.cluster_id = b.cluster_id
                        AND a.token = b.token
                        AND a.{id_col} < b.{id_col}
            GROUP BY 1, 2, 3
        ),
        ca_pairs AS (
            SELECT a.cluster_id, a.{id_col} AS ia, b.{id_col} AS ib
            FROM ca_live a
            JOIN ca_live b ON a.cluster_id = b.cluster_id
                          AND a.{id_col} < b.{id_col}
        ),
        ca_jac AS (
            SELECT p.cluster_id,
                   CAST(COALESCE(i.inter, 0) * 1000000 //
                        GREATEST(COALESCE(sa.sz, 0) + COALESCE(sb.sz, 0)
                                 - COALESCE(i.inter, 0), 1)
                        AS BIGINT) AS jac
            FROM ca_pairs p
            LEFT JOIN ca_inter i
              ON i.cluster_id = p.cluster_id
             AND i.ia = p.ia AND i.ib = p.ib
            LEFT JOIN ca_sz sa ON sa.{id_col} = p.ia
            LEFT JOIN ca_sz sb ON sb.{id_col} = p.ib
        )
        SELECT j.cluster_id, s.n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               MIN(j.jac) AS min_jaccard_ppm,
               CAST(SUM(j.jac) // COUNT(*) AS BIGINT)
                   AS mean_jaccard_ppm
        FROM ca_jac j JOIN ca_sizes s USING (cluster_id)
        GROUP BY 1, 2
    """


def jaccard_prefix_join(
    tokens: DataFrame,
    threshold_ppm: int = 500_000,
    id_col: str = "doc_id",
    token_col: str = "shingle",
) -> DataFrame:
    """EXACT Jaccard-threshold similarity join via PPJoin-style
    PREFIX FILTERING — the provably-complete scale path this module's
    candidate schemes bracket from both sides: minhash/LSH is
    probabilistic (misses pairs), the shared-any-shingle join of
    :func:`ngram_jaccard_pairs` is complete but quadratic in every
    stop-shingle's document frequency (its ``max_doc_freq`` cap
    trades completeness back away).  Prefix filtering keeps BOTH:
    order all tokens by ascending (df, token) — rarest first, a TOTAL
    order — and take from each size-s set only its first

        prefix_len(s) = s − ⌈τ·s⌉ + 1

    tokens; any two sets with Jaccard ≥ τ MUST share a prefix token
    under the same global order (if they disagreed on all prefix
    tokens, the overlap is confined to the ⌈τ·s⌉−1 suffix, too small
    to reach τ) — so candidates come only from the RARE end of the
    vocabulary and the boilerplate-token blowup term never joins.
    A length filter (τ·s_a ≤ 10⁶·s_b and vice versa, cross-
    multiplied) prunes before verification; verification is the exact
    intersection count, and the Jaccard test is the integer
    cross-multiplication inter·10⁶ ≥ τ_ppm·(s_a+s_b−inter) — no
    float, no approximation anywhere.

    Plan: one (doc, token) distinct + df agg; per-doc prefix rank is
    a window inside the doc partition; the candidate join touches
    only prefix tokens; verification is one equi-join on token
    semi-restricted to candidates + a pair groupBy.  The DuckDB twin
    verifies over the UNFILTERED shared-any-token candidates — a
    superset execution — so the prefix filter's completeness is
    exactly what hash-verification proves.

    Returns (doc_a, doc_b, size_a, size_b, inter, jaccard_ppm) with
    doc_a < doc_b and jaccard_ppm ≥ threshold_ppm."""
    tau = int(threshold_ppm)
    if not 1 <= tau <= 1_000_000:
        raise ValueError(f"threshold_ppm out of range: {tau}")
    tok = tokens.select(
        F.col(id_col).alias("doc"), F.col(token_col).alias("token")
    ).distinct()
    dfreq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    wd = W.partitionBy("doc").orderBy("_df", "token")
    ranked = (
        tok.join(dfreq, "token")
        .withColumn("_rk", F.row_number().over(wd))
        .withColumn("_s", F.count(F.lit(1)).over(W.partitionBy("doc")))
    )
    prefix = ranked.where(
        F.col("_rk")
        <= F.col("_s")
        - F.expr(f"CAST(({tau} * _s + 999999) DIV 1000000 AS BIGINT)")
        + 1
    ).select("doc", "token", "_s")
    pa = prefix.select(
        F.col("doc").alias("doc_a"), "token",
        F.col("_s").alias("size_a"),
    )
    pb = prefix.select(
        F.col("doc").alias("doc_b"), F.col("token"),
        F.col("_s").alias("size_b"),
    )
    cands = (
        pa.join(pb, "token")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.lit(tau) * F.col("size_a")
               <= F.lit(1_000_000) * F.col("size_b"))
            & (F.lit(tau) * F.col("size_b")
               <= F.lit(1_000_000) * F.col("size_a"))
        )
        .select("doc_a", "doc_b", "size_a", "size_b")
        .distinct()
    )
    ta = tok.select(F.col("doc").alias("doc_a"), "token")
    tb = tok.select(F.col("doc").alias("doc_b"), F.col("token"))
    inter = (
        cands.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return inter.where(
        F.col("inter") * F.lit(1_000_000)
        >= F.lit(tau)
        * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    ).selectExpr(
        "doc_a", "doc_b", "size_a", "size_b", "inter",
        "CAST((inter * CAST(1000000 AS DECIMAL(38,0)))"
        " DIV (size_a + size_b - inter) AS BIGINT) AS jaccard_ppm",
    )


def jaccard_prefix_join_sql(
    tokens_src: str,
    threshold_ppm: int = 500_000,
    id_col: str = "doc_id",
    token_col: str = "shingle",
) -> str:
    """DuckDB twin of :func:`jaccard_prefix_join` over the UNFILTERED
    shared-any-token candidate set (any pair with Jaccard ≥ τ > 0
    shares ≥ 1 token, so this superset is trivially complete) — a
    structurally different execution whose agreement proves the
    prefix filter dropped nothing.  Standalone; jp_*-namespaced."""
    tau = int(threshold_ppm)
    if not 1 <= tau <= 1_000_000:
        raise ValueError(f"threshold_ppm out of range: {tau}")
    return f"""
        WITH jp_tok AS (
            SELECT DISTINCT {id_col} AS doc, {token_col} AS token
            FROM {tokens_src}
        ),
        jp_sz AS (
            SELECT doc, CAST(COUNT(*) AS BIGINT) AS s
            FROM jp_tok GROUP BY 1
        ),
        jp_inter AS (
            SELECT a.doc AS doc_a, b.doc AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS inter
            FROM jp_tok a JOIN jp_tok b
              ON b.token = a.token AND a.doc < b.doc
            GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b,
               sa.s AS size_a, sb.s AS size_b, i.inter,
               CAST((i.inter * CAST(1000000 AS HUGEINT))
                    // (sa.s + sb.s - i.inter) AS BIGINT)
                   AS jaccard_ppm
        FROM jp_inter i
        JOIN jp_sz sa ON sa.doc = i.doc_a
        JOIN jp_sz sb ON sb.doc = i.doc_b
        WHERE i.inter * 1000000 >= {tau} * (sa.s + sb.s - i.inter)
    """


def golden_records(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_len_col: str = "n_chars",
    cat_col: str = "lang",
) -> DataFrame:
    """Survivorship / golden-record construction over dedup clusters
    — the step AFTER clustering that entity resolution actually ships:
    one canonical row per cluster with STATED, deterministic
    survivorship rules (silent "first()" survivorship is the classic
    nondeterminism bug this engine bans):

    * representative = the member with the LONGEST text, ties to the
      SMALLEST id — one max(struct(len, −id)) aggregation, so the
      argmax crosses the shuffle as one struct, never a sort;
    * canonical category = the MODAL value, ties to the
      lexicographically smallest — (cluster, cat) counts then a
      row_number window inside the cluster's own partition;
    * conflict visibility: n_members, distinct-category count, and
      the total char mass survive as audit columns (a golden record
      that hides its disagreement count is a silent merge).

    Plan: one id-keyed join (docs × cluster assignment), one cluster
    aggregation + one (cluster, cat) aggregation re-aggregated by the
    window, one cluster-keyed join of two cluster-sized tables —
    everything after the first join is |clusters|-bounded.

    Returns (cluster_id, n_members, rep_doc_id, canonical_len,
    canonical_cat, n_cats, total_chars)."""
    j = clusters.select(
        F.col(id_col), F.col("cluster_id")
    ).join(
        docs.select(
            id_col,
            F.col(text_len_col).cast("bigint").alias("_len"),
            F.col(cat_col).alias("_cat"),
        ),
        id_col,
    )
    base = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max(F.struct(F.col("_len"), (-F.col(id_col)).alias("_nid")))
        .alias("_rep"),
        F.countDistinct("_cat").cast("bigint").alias("n_cats"),
        F.sum("_len").cast("bigint").alias("total_chars"),
    ).select(
        "cluster_id", "n_members",
        (-F.col("_rep._nid")).cast("bigint").alias("rep_doc_id"),
        F.col("_rep._len").cast("bigint").alias("canonical_len"),
        "n_cats", "total_chars",
    )
    modal = (
        j.groupBy("cluster_id", "_cat")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("cluster_id")
                .orderBy(F.col("_cnt").desc(), F.col("_cat").asc())
            ),
        )
        .where(F.col("_rn") == 1)
        .select("cluster_id", F.col("_cat").alias("canonical_cat"))
    )
    return base.join(modal, "cluster_id").select(
        "cluster_id", "n_members", "rep_doc_id", "canonical_len",
        "canonical_cat", "n_cats", "total_chars",
    )


def golden_records_sql(
    docs_src: str,
    clusters_src: str,
    id_col: str = "doc_id",
    text_len_col: str = "n_chars",
    cat_col: str = "lang",
) -> str:
    """DuckDB twin of :func:`golden_records` — identical survivorship
    rules (max(struct) representative, modal-with-lexicographic-tie
    category).  A plain SELECT over derived tables (no WITH), so it
    composes after a clusters-producing prelude."""
    return f"""
        SELECT g.cluster_id, g.n_members, g.rep_doc_id,
               g.canonical_len, m.canonical_cat, g.n_cats,
               g.total_chars
        FROM (
            SELECT c.cluster_id,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(-((MAX({{'l': d.{text_len_col},
                                 'nid': -d.{id_col}}})).nid)
                        AS BIGINT) AS rep_doc_id,
                   CAST((MAX({{'l': d.{text_len_col},
                               'nid': -d.{id_col}}})).l
                        AS BIGINT) AS canonical_len,
                   CAST(COUNT(DISTINCT d.{cat_col}) AS BIGINT)
                       AS n_cats,
                   CAST(SUM(d.{text_len_col}) AS BIGINT)
                       AS total_chars
            FROM {clusters_src} c
            JOIN {docs_src} d USING ({id_col})
            GROUP BY 1
        ) g
        JOIN (
            SELECT cluster_id, cat AS canonical_cat FROM (
                SELECT c.cluster_id, d.{cat_col} AS cat,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.cluster_id
                           ORDER BY COUNT(*) DESC, d.{cat_col} ASC
                       ) AS rn
                FROM {clusters_src} c
                JOIN {docs_src} d USING ({id_col})
                GROUP BY 1, 2
            ) WHERE rn = 1
        ) m USING (cluster_id)
    """


def sorted_neighborhood_pairs(
    rows: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 5,
    n_buckets: int = 4096,
    max_bucket_rows: int = 2_000_000,
) -> DataFrame:
    """Sorted-neighborhood blocking — the third candidate-generation
    family beside LSH (minhash/simhash banding) and prefix filtering
    (PPJoin): sort the corpus by a blocking key, slide a width-w
    window, and emit every pair that co-occurs — the classic ER
    blocker for keys where CLOSENESS IN ORDER means likely match
    (lengths, timestamps, normalized names).

    Scale design: the global sort order is materialized as an EXACT
    two-level rank (the str_pack kit: value-bucket histogram + prefix
    sums + bucket-local row_number — never a single-partition window;
    extreme key skew fails LOUDLY via the bucket guard), and the
    O(n·w) pair stream comes from the followed_by-style forward block
    fan: each row fans to rank-blocks {b, b+1} (block = rank DIV w),
    joins rows of that block with 0 < gap ≤ w−1 — blocks 0/1 apart
    cover every window pair EXACTLY once, so no distinct() is ever
    spent.

    Key bounds are read by one bounded driver aggregate (two scalars
    — the str_pack convention, documented driver work).

    Returns (id_a, id_b, key_a, key_b, rank_gap), id_a = the
    rank-earlier row."""
    from .rtree import _two_level_rank

    if window < 2:
        raise ValueError(f"window must be ≥ 2: {window}")
    base = rows.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).cast("bigint").alias("_k"),
    )
    bounds = base.agg(
        F.min("_k").alias("lo"), F.max("_k").alias("hi")
    ).collect()[0]
    if bounds.lo is None:
        return base.sparkSession.createDataFrame(
            [], "id_a long, id_b long, key_a long, key_b long, "
                "rank_gap long",
        )
    ranked = _two_level_rank(
        base, [], "_k", "_id",
        int(bounds.lo), int(bounds.hi),
        n_buckets=n_buckets, max_bucket_rows=max_bucket_rows,
        out="_r",
    ).withColumn("_blk", F.expr(f"(_r - 1) DIV {int(window)}"))
    left = ranked.select(
        F.col("_id").alias("id_a"), F.col("_k").alias("key_a"),
        F.col("_r").alias("_ra"),
        F.explode(
            F.array(F.col("_blk"), F.col("_blk") + 1)
        ).alias("_jb"),
    )
    right = ranked.select(
        F.col("_id").alias("id_b"), F.col("_k").alias("key_b"),
        F.col("_r").alias("_rb"), F.col("_blk").alias("_jb"),
    )
    return (
        left.join(right, "_jb")
        .where(
            (F.col("_rb") > F.col("_ra"))
            & (F.col("_rb") - F.col("_ra") <= int(window) - 1)
        )
        .select(
            "id_a", "id_b", "key_a", "key_b",
            (F.col("_rb") - F.col("_ra")).alias("rank_gap"),
        )
    )


def sorted_neighborhood_sql(
    src: str,
    id_col: str,
    key_col: str,
    window: int = 5,
) -> str:
    """DuckDB twin of :func:`sorted_neighborhood_pairs` — the
    DEFINITION: one plain global ROW_NUMBER (oracle scale) and the
    |gap| ≤ w−1 self-join, so the two-level rank decomposition AND
    the forward block fan are both what gets verified.  Standalone."""
    return f"""
        WITH sn_ranked AS (
            SELECT {id_col} AS id,
                   CAST({key_col} AS BIGINT) AS k,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST({key_col} AS BIGINT), {id_col}
                   ) AS r
            FROM {src}
        )
        SELECT a.id AS id_a, b.id AS id_b,
               a.k AS key_a, b.k AS key_b,
               CAST(b.r - a.r AS BIGINT) AS rank_gap
        FROM sn_ranked a JOIN sn_ranked b
          ON b.r > a.r AND b.r - a.r <= {int(window) - 1}
    """


def fellegi_sunter(
    pairs: DataFrame,
    fields: list[tuple[str, int, int]],
    upper_odds_ppm: int,
    lower_odds_ppm: int,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (1969) — the
    decision layer of the ER stack: blocking generates candidates
    (sorted_neighborhood / LSH / PPJoin), survivorship merges
    clusters (golden_records), and THIS operator scores each
    candidate pair and routes it match / possible / non_match.

    Each entry of ``fields`` is ``(agree_col, m_ppm, u_ppm)``: a
    boolean agreement column already on ``pairs`` plus the DECLARED
    conditional agreement rates in ppm — m = P(agree | same entity),
    u = P(agree | different entities).  (Declared weights instead of
    EM-estimated ones — the deterministic, auditable form; stated.)
    Under conditional independence the match odds are

        odds = prod_i (agree_i ? m_i : 1e6-m_i)
             / prod_i (agree_i ? u_i : 1e6-u_i)

    computed EXACTLY: both products are integers (ppm factors,
    decimal(38) accumulation), ``odds_ppm = num*1e6 DIV den``, and
    the verdict comparisons are cross-multiplied (num·1e6 ≥ θ·den),
    so no division error can flip a verdict.  Bounds enforced
    loudly: ≤ 5 fields and weights in [1e4, 99e4] with m > u keep
    every ratio ≤ 99 per field, so odds_ppm ≤ 1e6·99⁵ < 2⁶³ and
    num·1e6 ≤ 1e36 < decimal(38).

    Returns pairs' id columns + ``pattern`` (bit i set = field i
    agreed), ``odds_ppm`` and ``verdict`` — all native column
    arithmetic, no shuffle beyond what ``pairs`` already carries."""
    if not 1 <= len(fields) <= 5:
        raise ValueError(f"1..5 fields required: got {len(fields)}")
    for name, m_ppm, u_ppm in fields:
        if not (10_000 <= u_ppm < m_ppm <= 990_000):
            raise ValueError(
                f"field {name}: need 1e4 <= u < m <= 99e4, got "
                f"m={m_ppm} u={u_ppm}"
            )
    if not 0 <= int(lower_odds_ppm) <= int(upper_odds_ppm):
        raise ValueError(
            "need 0 <= lower_odds_ppm <= upper_odds_ppm"
        )
    dec = "decimal(38,0)"
    num = f"CAST(1 AS {dec})"
    den = f"CAST(1 AS {dec})"
    pat = "0"
    for i, (name, m_ppm, u_ppm) in enumerate(fields):
        num = f"({num} * IF({name}, {m_ppm}, {10**6 - m_ppm}))"
        den = f"({den} * IF({name}, {u_ppm}, {10**6 - u_ppm}))"
        pat = f"({pat} + IF({name}, {2 ** i}, 0))"
    up, lo = int(upper_odds_ppm), int(lower_odds_ppm)
    return pairs.select(
        id_cols[0],
        id_cols[1],
        F.expr(f"CAST({pat} AS INT)").alias("pattern"),
        F.expr(
            f"CAST(({num} * 1000000) DIV {den} AS BIGINT)"
        ).alias("odds_ppm"),
        F.expr(
            f"CASE WHEN {num} * 1000000 >= CAST({up} AS {dec}) * {den} "
            f"THEN 'match' "
            f"WHEN {num} * 1000000 >= CAST({lo} AS {dec}) * {den} "
            f"THEN 'possible' ELSE 'non_match' END"
        ).alias("verdict"),
    )


def fellegi_sunter_sql(
    pairs_src: str,
    fields: list[tuple[str, int, int]],
    upper_odds_ppm: int,
    lower_odds_ppm: int,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> str:
    """DuckDB twin of :func:`fellegi_sunter` (HUGEINT products,
    identical cross-multiplied verdicts).  Standalone statement."""
    num = "CAST(1 AS HUGEINT)"
    den = "CAST(1 AS HUGEINT)"
    pat = "0"
    for i, (name, m_ppm, u_ppm) in enumerate(fields):
        num = (
            f"({num} * CASE WHEN {name} THEN {m_ppm} "
            f"ELSE {10**6 - m_ppm} END)"
        )
        den = (
            f"({den} * CASE WHEN {name} THEN {u_ppm} "
            f"ELSE {10**6 - u_ppm} END)"
        )
        pat = f"({pat} + CASE WHEN {name} THEN {2 ** i} ELSE 0 END)"
    up, lo = int(upper_odds_ppm), int(lower_odds_ppm)
    return f"""
        SELECT {id_cols[0]}, {id_cols[1]},
               CAST({pat} AS INTEGER) AS pattern,
               CAST(({num} * 1000000) // {den} AS BIGINT) AS odds_ppm,
               CASE WHEN {num} * 1000000
                         >= CAST({up} AS HUGEINT) * {den}
                    THEN 'match'
                    WHEN {num} * 1000000
                         >= CAST({lo} AS HUGEINT) * {den}
                    THEN 'possible' ELSE 'non_match' END AS verdict
        FROM {pairs_src}
    """
