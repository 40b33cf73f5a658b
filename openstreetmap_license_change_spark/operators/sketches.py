"""Deterministic cardinality sketches.

Spark's native ``approx_count_distinct`` is HyperLogLog++ with an
engine-private hash — its estimates can't be reproduced by any other
system, which breaks this engine's twin-oracle discipline and makes
cross-system audits (the reference's candidate/region counters,
run_candidates.rb / run_regions.rb tallies) unverifiable.  This module
ships the KMV (k-minimum-values / bottom-k) estimator instead: keep
the k smallest values of a deterministic integer hash over the
DISTINCT elements; with F = kth-smallest-hash / 2³², the classic
estimator D̂ = (k−1)/F is ``(k−1)·2³² DIV kth`` — pure int64, so Spark
and DuckDB agree bit-for-bit, and the sketch itself (the k-min set) is
MERGEABLE: union two groups' sets and re-take the k smallest, giving
Iceberg-manifest-style distributed rollups without re-scanning.

Scale: the per-group top-k-by-hash is a rank window that Spark
executes as WindowGroupLimit — each map task keeps only k rows per
group before the shuffle, so the shuffle volume is min(|group|, k)
rows per group regardless of group size (the house group-top-k
pattern, shared with sampling.lang_topk_quality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# Knuth multiplicative constant (2⁶⁴/φ truncated to 32 bits, odd)
_KMV_MULT = 2654435761
_TWO31 = 2_147_483_648
_TWO32 = 4_294_967_296


def kmv_hash(v) -> F.Column:
    """Deterministic 32-bit mix of a non-negative integer column, with
    every intermediate inside int64 (Spark would silently wrap a 64-bit
    overflow while DuckDB raises — so the expression is SIZED never to
    overflow: (v mod 2³¹)·MULT < 2⁶² ).  A single Knuth multiplicative
    round, then a xor-fold of the high bits to de-correlate low-bit
    patterns of sequential ids."""
    h = F.pmod(v, F.lit(_TWO31)) * F.lit(_KMV_MULT) % F.lit(_TWO32)
    return h.bitwiseXOR(F.shiftright(h, 16)) % F.lit(_TWO32)


def kmv_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`kmv_hash` (xor(); same wrap-free sizing)."""
    h = f"((({expr}) % {_TWO31}) * {_KMV_MULT}) % {_TWO32}"
    return f"xor({h}, ({h}) >> 16) % {_TWO32}"


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-cardinality estimate via the bottom-``k``
    hash sketch.  Groups with fewer than ``k`` distinct values are
    EXACT (the sketch holds them all); larger groups estimate with the
    KMV formula, relative error ~ 1/√k.

    Returns (group, n_kept, kth_hash, est_distinct):
      n_kept < k        → est_distinct = n_kept (exact count)
      n_kept = k        → est_distinct = (k−1)·2³² DIV kth_hash
    Hash ties cannot split the verdict: ranking breaks ties by the raw
    value, and the kth hash enters the estimate identically either
    way."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2, got {k}")
    vals = df.select(group_col, value_col).distinct()
    h = kmv_hash(F.col(value_col)).alias("_h")
    w = W.partitionBy(group_col).orderBy("_h", value_col)
    kept = (
        vals.select(group_col, value_col, h)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
    )
    return kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_h").alias("kth_hash"),
    ).select(
        group_col,
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            # GREATEST guards the degenerate all-hashes-zero group
            # (DuckDB raises on //0, Spark nulls on DIV 0)
            F.expr(f"({k - 1} * {_TWO32}) DIV GREATEST(kth_hash, 1)")
        )
        .cast("bigint")
        .alias("est_distinct"),
    )


def kmv_distinct_sql(
    src: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (standalone statement)."""
    return "WITH " + kmv_distinct_ctes(src, group_col, value_col, k)


def kmv_distinct_ctes(
    src: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """The twin WITHOUT the leading WITH, appendable to an existing
    CTE list (the oracle-prelude pattern shared with snapshots)."""
    h = kmv_hash_sql(value_col)
    return f"""
        kmv_vals AS (
            SELECT DISTINCT {group_col}, {value_col} FROM {src}
        ),
        kmv_ranked AS (
            SELECT {group_col}, {h} AS _h,
                   ROW_NUMBER() OVER (PARTITION BY {group_col}
                                      ORDER BY {h}, {value_col}) AS _rk
            FROM kmv_vals
        ),
        kmv_kept AS (
            SELECT {group_col}, _h FROM kmv_ranked WHERE _rk <= {k}
        )
        SELECT {group_col},
               COUNT(*) AS n_kept,
               MAX(_h) AS kth_hash,
               CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                    ELSE ({k - 1} * {_TWO32}) // GREATEST(MAX(_h), 1) END
                    AS BIGINT) AS est_distinct
        FROM kmv_kept GROUP BY {group_col}
    """


def _cm_hash(token_col, row: int) -> "F.Column":
    """Row-salted Count-Min hash: the house polynomial token hash
    offset by a per-row salt, then the KMV avalanche mix (the raw
    polynomial is near-identity on short strings — measured in
    mixture_resample; the mix is what spreads buckets)."""
    from .dedup import token_hash

    return kmv_hash(token_hash(token_col) + F.lit(row * 1_000_003))


def _cm_hash_sql(expr: str, row: int) -> str:
    from .dedup import token_hash_sql

    return kmv_hash_sql(
        "(" + token_hash_sql(expr) + f" + {row * 1_000_003})"
    )


def countmin_build(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min frequency sketch over the corpus token stream — the
    heavy-hitter companion of the KMV cardinality sketch: ``depth``
    salted hash rows × ``width`` buckets of exact int64 counters.
    Point estimates are one-sided (est ≥ true, over-count ≤ ε·N with
    ε ≈ e/width at probability 1−e^-depth) — the classic bound, and
    with THIS engine's fixed deterministic hashes the estimate for a
    given corpus is reproducible bit-for-bit (tested), not merely
    bounded in expectation.

    Mergeable: sketches of two corpora ADD cell-wise (same (row,
    bucket) grid), the same contract as tile_rollup_merge — so
    per-snapshot sketches roll up without rescanning.

    Plan: explode tokens ×depth (a constant fan on the stream), one
    map-side-combining groupBy on (row, bucket): output ≤ depth·width
    rows regardless of corpus size.  Returns (row, bucket, cnt)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth ≥ 1, width ≥ 2: {depth}, {width}")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("token")
    )
    rows = None
    for r in range(depth):
        part = toks.select(
            F.lit(r).alias("row"),
            (_cm_hash(F.col("token"), r) % F.lit(width)).alias("bucket"),
        )
        rows = part if rows is None else rows.unionByName(part)
    return rows.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    width: int = 1024,
    token_col: str = "token",
) -> DataFrame:
    """Point-frequency estimates from a :func:`countmin_build` sketch:
    est = min over rows of the queried token's bucket counter.  The
    sketch is ≤ depth·width rows — broadcast side of every join.
    Returns (token, est_n)."""
    depth = sketch.agg(F.max("row")).collect()[0][0]
    if depth is None:
        raise ValueError("empty sketch")
    probes = None
    for r in range(int(depth) + 1):
        part = queries.select(
            F.col(token_col).alias("token"),
            F.lit(r).alias("row"),
            (_cm_hash(F.col(token_col), r) % F.lit(width)).alias("bucket"),
        )
        probes = part if probes is None else probes.unionByName(part)
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est_n"))
    )


def countmin_sql(
    src: str,
    query_tokens_sql: str,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> str:
    """DuckDB twin of build+estimate in one statement: sketch ``src``'s
    token stream, estimate every token of ``query_tokens_sql`` (a
    relation exposing ``token``).  Returns (token, est_n)."""
    probes = " UNION ALL ".join(
        f"SELECT {r} AS row, ({_cm_hash_sql('t.tok', r)}) % {width} "
        f"AS bucket, t.tok FROM cm_toks t"
        for r in range(depth)
    )
    qprobes = " UNION ALL ".join(
        f"SELECT {r} AS row, ({_cm_hash_sql('q.token', r)}) % {width} "
        f"AS bucket, q.token FROM ({query_tokens_sql}) q"
        for r in range(depth)
    )
    return f"""
        WITH cm_toks AS (
            SELECT u.tok
            FROM (SELECT string_split_regex(lower({text_col}), '\\s+')
                      AS ws FROM {src}) s,
                 LATERAL UNNEST(s.ws) AS u(tok)
            WHERE u.tok <> ''
        ),
        cm_cells AS (
            SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM ({probes}) GROUP BY 1, 2
        ),
        cm_probe AS ({qprobes})
        SELECT p.token, MIN(c.cnt) AS est_n
        FROM cm_probe p JOIN cm_cells c USING (row, bucket)
        GROUP BY p.token
    """


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    k: int = 256,
    qs: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Mergeable approximate per-group quantiles — the third member of
    the deterministic-sketch family: Spark's ``percentile_approx``
    (Greenwald-Khanna) is engine-private exactly like HLL, so its
    numbers can't be audited by another system.  Here the sketch is a
    uniform bottom-``k``-hash sample (same mergeable k-min set as
    KMV — union two groups' samples and re-take the k smallest), and
    the quantiles are EXACT order statistics of the sample with the
    interpolation-free "lower" convention (index ⌊q·(n−1)⌋ — pure
    integer, engine-identical; textops.group_quantiles is the
    full-sort exact sibling when you can afford |group| log |group|).
    Sampling error ~1/√k on the quantile RANK (stated; the regression
    test pins measured accuracy on a known distribution).

    Plan: WindowGroupLimit bottom-k (≤ k rows per group cross the
    shuffle) then one collect_list of ≤ k values per group — shuffle
    volume is capped by k regardless of group size, the whole point
    vs the exact sibling.

    Returns (group, n_sample, q_pct, value) — one row per requested
    quantile, q_pct as integer percent·100 (e.g. 2500 = p25)."""
    if k < 4:
        raise ValueError(f"k must be ≥ 4, got {k}")
    if not qs or any(not 0 <= q <= 1 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    h = kmv_hash(F.col(key_col)).alias("_h")
    w = W.partitionBy(group_col).orderBy("_h", key_col)
    kept = (
        df.select(group_col, value_col, key_col)
        .select(group_col, value_col, h, key_col)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
    )
    agg = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.array_sort(F.collect_list(value_col)).alias("_vals"),
    )
    out = None
    for q in qs:
        # index ⌊q·(n−1)⌋, 1-based element_at — integer arithmetic
        # via DIV so both engines floor identically
        qn = int(round(q * 10_000))
        row = agg.select(
            group_col,
            "n_sample",
            F.lit(qn).alias("q_pct"),
            F.element_at(
                "_vals",
                (
                    F.expr(f"CAST(({qn} * (n_sample - 1)) DIV 10000 AS INT)")
                    + F.lit(1)
                ),
            ).alias("value"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def sampled_quantiles_sql(
    src: str,
    group_col: str,
    value_col: str,
    key_col: str,
    k: int = 256,
    qs: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.9),
) -> str:
    """DuckDB twin of :func:`sampled_quantiles` (standalone)."""
    h = kmv_hash_sql(key_col)
    selects = []
    for q in qs:
        qn = int(round(q * 10_000))
        selects.append(
            f"SELECT {group_col}, n_sample, {qn} AS q_pct, "
            f"vals[CAST(({qn} * (n_sample - 1)) // 10000 AS INTEGER) + 1] "
            f"AS value FROM sq_agg"
        )
    return f"""
        WITH sq_ranked AS (
            SELECT {group_col}, {value_col},
                   ROW_NUMBER() OVER (PARTITION BY {group_col}
                                      ORDER BY {h}, {key_col}) AS _rk
            FROM {src}
        ),
        sq_agg AS (
            SELECT {group_col},
                   COUNT(*) AS n_sample,
                   list_sort(list({value_col})) AS vals
            FROM sq_ranked WHERE _rk <= {k}
            GROUP BY {group_col}
        )
        {" UNION ALL ".join(selects)}
    """


BLOOM_SALT = 1_000_003  # the Count-Min row-salt constant, shared


def _bloom_positions(token_col, n_bits: int, k: int) -> "F.Column":
    """Array of the k salted bit positions for a token (the Count-Min
    row-salt + KMV-mix pipeline, mod n_bits)."""
    return F.array(*[
        _cm_hash(token_col, i) % F.lit(int(n_bits)) for i in range(k)
    ])


def bloom_build(
    docs: DataFrame,
    n_bits: int = 8192,
    k: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Bloom membership sketch over the corpus's distinct token set —
    the third member of the sketch family (KMV answers "how many
    distinct", Count-Min "how often", Bloom "have we seen it"), the
    structure a crawl frontier / dedup pre-filter consults before the
    exact path.

    Stored SPARSE: one row per non-zero 32-bit word
    (``word_idx = pos DIV 32``, ``bits`` = OR of 1<<(pos%32)) — words
    stay positive int64 (a 64-bit word's sign bit would overflow
    DuckDB's checked shift), rows are mergeable cell-wise with
    ``bit_or`` exactly like tile_rollup_merge's counters (union of
    corpora = bit_or of their sketches, tested), and an empty word is
    simply absent.  One-sided like Count-Min: membership may
    false-positive (≈ (1−e^{-kn/m})^k), NEVER false-negative — and
    because the k salted hashes are the deterministic house mix, the
    false positives themselves are reproducible and hash-verified.

    Plan: explode → distinct token (the insert-once set semantics) →
    explode k positions → one groupBy(word) bit_or — two shuffles,
    both map-side combined.  Output: (word_idx, bits)."""
    if n_bits % 32 != 0:
        raise ValueError(f"n_bits must be a multiple of 32: {n_bits}")
    toks = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("token")
        )
        .where(F.col("token") != "")
        .distinct()
    )
    fan = toks.select(
        F.explode(_bloom_positions(F.col("token"), n_bits, k)).alias("pos")
    )
    return (
        fan.select(
            F.expr("pos DIV 32").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
            .alias("_m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_check(
    sketch: DataFrame,
    probes: DataFrame,
    n_bits: int = 8192,
    k: int = 4,
    token_col: str = "token",
) -> DataFrame:
    """Membership test against a :func:`bloom_build` sketch: a probe
    is ``in_bloom`` iff ALL k of its salted bits are set.  Shape: the
    probe fan joins the (tiny, broadcastable) sketch on word_idx and
    counts satisfied positions — no collect, no driver bitmap.
    Output: (token, in_bloom)."""
    fan = probes.select(
        token_col,
        F.explode(
            _bloom_positions(F.col(token_col), n_bits, k)
        ).alias("pos"),
    ).select(
        token_col,
        F.expr("pos DIV 32").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
        .alias("_m"),
    )
    j = fan.join(F.broadcast(sketch), "word_idx", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m"))
        == F.col("_m")
    ).cast("int")
    return (
        j.groupBy(token_col)
        .agg(F.sum(hit).alias("_hits"))
        .select(token_col, (F.col("_hits") == k).alias("in_bloom"))
    )


def bloom_ctes(
    docs_src: str,
    probes_src: str,
    n_bits: int = 8192,
    k: int = 4,
    text_col: str = "text",
    token_col: str = "token",
) -> str:
    """DuckDB twin of bloom_build + bloom_check as one CTE chain
    (prefix bl_*): returns rows (token, in_bloom) for ``probes_src``.
    Standalone statement."""
    pos_fans = " UNION ALL ".join(
        f"SELECT token, ({_cm_hash_sql('token', i)}) % {n_bits} AS pos "
        "FROM bl_toks"
        for i in range(k)
    )
    probe_fans = " UNION ALL ".join(
        f"SELECT {token_col} AS token, "
        f"({_cm_hash_sql(token_col, i)}) % {n_bits} AS pos "
        f"FROM {probes_src}"
        for i in range(k)
    )
    return f"""
        WITH bl_toks AS (
            SELECT DISTINCT token FROM (
                SELECT unnest(string_split_regex(lower({text_col}),
                                                 '\\s+')) AS token
                FROM {docs_src}
            ) WHERE token <> ''
        ),
        bl_words AS (
            SELECT pos // 32 AS word_idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER))
                       AS bits
            FROM ({pos_fans}) GROUP BY 1
        ),
        bl_probe AS (
            SELECT token, pos // 32 AS word_idx,
                   CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER) AS m
            FROM ({probe_fans})
        )
        SELECT p.token,
               (SUM(CASE WHEN (COALESCE(w.bits, 0) & p.m) = p.m
                         THEN 1 ELSE 0 END) = {k}) AS in_bloom
        FROM bl_probe p LEFT JOIN bl_words w USING (word_idx)
        GROUP BY p.token
    """


HRW_STEP = 40503  # Fibonacci-ish odd step decorrelating shard seeds


def hrw_score(key_col, shard: "F.Column | int") -> "F.Column":
    """The rendezvous score h(key, shard): two chained
    :func:`kmv_hash` rounds (mix the key, step by shard, mix again) —
    every intermediate wrap-free in int64, identical in the twin."""
    s = shard if isinstance(shard, F.Column) else F.lit(int(shard))
    return kmv_hash(kmv_hash(key_col) + (s + 1) * F.lit(HRW_STEP))


def hrw_score_sql(key_expr: str, shard_expr: str) -> str:
    """DuckDB twin of :func:`hrw_score`."""
    inner = kmv_hash_sql(key_expr)
    return kmv_hash_sql(f"({inner}) + (({shard_expr}) + 1) * {HRW_STEP}")


def hrw_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
) -> DataFrame:
    """Highest-random-weight (rendezvous) shard assignment — the
    consistent-sharding primitive (Thaler & Ravishankar): each key
    goes to argmax_s h(key, s), so when a shard is ADDED only the
    keys whose new score wins move (≈ 1/(n+1) of them), and they all
    move TO the new shard — no ring, no global remap, the property
    consistent-hashing deployments (partitioned sinks, sticky
    routing, cache sharding) are built on.

    Deterministic and engine-portable by construction: the score is
    two chained :func:`kmv_hash` rounds (wrap-free int64), and the
    argmax is an ARRAY-LOCAL max over the n_shards candidate structs
    (score, shard) — no explode, no join, no shuffle, no Python; ties
    break to the higher shard id (struct-max order, deterministic).

    Scale: purely map-side — a projection over whatever partitioning
    the input already has.  n_shards is a plan-time constant (the
    candidate array is per-row, so keep it ≤ ~10⁴; real deployments
    shard to hundreds).

    Output: all input columns + ``shard`` (0-based bigint)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥ 1: {n_shards}")
    cands = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_shards) - 1)),
        lambda s: F.struct(
            hrw_score(F.col(key_col), s).alias("score"),
            s.cast("bigint").alias("shard"),
        ),
    )
    return df.withColumn("shard", F.array_max(cands)["shard"])


def hrw_assign_sql(src: str, key_expr: str, n_shards: int) -> str:
    """DuckDB twin of :func:`hrw_assign` (the argmax spelled as a
    ROW_NUMBER over score DESC, shard DESC — the struct-max order).
    Emits (key, shard); CTE names hrw_*-namespaced."""
    score = hrw_score_sql("k.key", "sh.s")
    return f"""
        WITH hrw_keys AS (
            SELECT {key_expr} AS key FROM {src}
        ),
        hrw_fan AS (
            SELECT k.key, sh.s,
                   {score} AS score
            FROM hrw_keys k
            CROSS JOIN (SELECT UNNEST(range(0, {int(n_shards)})) AS s) sh
        )
        SELECT key, CAST(s AS BIGINT) AS shard
        FROM (
            SELECT key, s,
                   ROW_NUMBER() OVER (PARTITION BY key
                                      ORDER BY score DESC, s DESC) AS rn
            FROM hrw_fan
        ) WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# HyperLogLog — the register-max sibling of the KMV bottom-k estimator.
# ---------------------------------------------------------------------------

_HLL_M = 64                      # registers (top 6 hash bits index them)
_HLL_MULT2 = 2_246_822_519       # 2nd-round odd multiplier (≠ KMV's)
_HLL_FIELD = 1 << 26             # remaining 26 hash bits feed rho
_HLL_RHO_MAX = 27                # rho(0) = field width + 1
_HLL_ALPHA_PPM = 709_341         # alpha_64 = 0.7213/(1 + 1.079/64), ppm
# ALPHA_PPM * m^2 * 2^27 — precomputed so neither engine multiplies at
# runtime (and neither can overflow differently): fits int64.
_HLL_EST_NUM = 389_964_338_779_127_808
_HLL_LC_CUTOFF = 160             # 2.5 * m — classic small-range switch
# Linear-counting table: round(m * ln(m / V)) for V = 1..64 empty
# registers.  A shared integer CONSTANT table instead of runtime ln()
# keeps both engines bit-identical (ln is float and engine-shaped).
_HLL_LC_TABLE = (
    266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107, 102,
    97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53, 51,
    48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23,
    21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0,
)


def hll_hash(v) -> F.Column:
    """Two-round avalanche for HLL: the house :func:`kmv_hash` round,
    then a second wrap-free multiplicative round with a DIFFERENT odd
    constant and a 15-bit fold.  HLL is far more hash-sensitive than
    KMV — it needs the register index (top 6 bits) independent of the
    leading-zero run of the low 26, and one multiplicative round
    measurably fails that (66–83% error on structured ids); the
    two-constant cascade lands max 18% / avg 7% across adversarial
    sequences (regression-pinned)."""
    h1 = kmv_hash(v)
    h2 = F.pmod(h1, F.lit(_TWO31)) * F.lit(_HLL_MULT2) % F.lit(_TWO32)
    return h2.bitwiseXOR(F.shiftright(h2, 15)) % F.lit(_TWO32)


def hll_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`hll_hash`."""
    h2 = f"((({kmv_hash_sql(expr)}) % {_TWO31}) * {_HLL_MULT2}) % {_TWO32}"
    return f"xor({h2}, ({h2}) >> 15) % {_TWO32}"


def hll_registers(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group HyperLogLog registers: idx = top 6 bits of the house
    32-bit hash, rho = leading-zero run of the remaining 26-bit field
    plus one, register value = MAX(rho).  Unlike KMV there is no
    DISTINCT and no window — duplicates land on the same register with
    the same rho, so ONE map-side-combined groupBy((group, idx),
    max) is the whole sketch: shuffle volume ≤ 64 rows per group
    regardless of group size, strictly cheaper than the bottom-k
    rank window when k > 64.

    The leading-zero count is ``RHO_MAX − length(bin(w))`` — both
    Spark's and DuckDB's ``bin()`` render minimal binary strings, so
    the expression is engine-identical without float log2.

    Mergeable by construction: registers of two corpora combine with
    MAX on (group, idx) — re-aggregating unioned register sets equals
    sketching the union (tested), the same rollup contract as KMV's
    k-min union and Bloom's bit_or.

    Returns (group, idx, rho)."""
    h = hll_hash(F.col(value_col)).alias("_h")
    hashed = df.select(F.col(group_col), h)
    w = F.pmod(F.col("_h"), F.lit(_HLL_FIELD))
    rho = F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(w))
    )
    return (
        hashed.select(
            group_col,
            F.expr(f"_h DIV {_HLL_FIELD}").alias("idx"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(group_col, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, group_col: str) -> DataFrame:
    """Fold per-group registers (from :func:`hll_registers`, possibly
    unioned across corpora) into the cardinality estimate — all-int64:

        S      = Σ_present 2^(RHO_MAX − rho) + (m − present) · 2^RHO_MAX
        E_raw  = (ALPHA_PPM · m² · 2^RHO_MAX) DIV S DIV 10^6
        E      = LC_TABLE[V]  when V > 0 empty registers and
                 E_raw ≤ 2.5·m (the classic linear-counting switch,
                 with ln replaced by the shared constant table)

    Truncating DIV, constant numerator and a constant table make the
    estimate bit-identical across Spark and DuckDB — auditable in a
    way approx_count_distinct's private HLL++ never is.  Relative
    error ~1.04/√64 ≈ 13% (regression-pinned, not flaky: one fixed
    hash).  Returns (group, n_regs, est_distinct)."""
    lc = F.array(*[F.lit(v) for v in _HLL_LC_TABLE])
    agg = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"CAST(shiftleft(1, {_HLL_RHO_MAX} - rho) AS BIGINT)")
        ).alias("_s_present"),
    )
    s = (
        F.col("_s_present")
        + (F.lit(_HLL_M) - F.col("n_regs")) * F.lit(1 << _HLL_RHO_MAX)
    ).alias("_s")
    withs = agg.select(group_col, "n_regs", s).select(
        group_col,
        "n_regs",
        F.expr(f"({_HLL_EST_NUM} DIV _s) DIV 1000000").alias("_e_raw"),
    )
    v = F.lit(_HLL_M) - F.col("n_regs")
    return withs.select(
        group_col,
        "n_regs",
        F.when(
            (v > 0) & (F.col("_e_raw") <= _HLL_LC_CUTOFF),
            F.element_at(lc, v.cast("int")),
        )
        .otherwise(F.col("_e_raw"))
        .cast("bigint")
        .alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group distinct cardinality via HyperLogLog =
    :func:`hll_registers` ∘ :func:`hll_estimate` — the constant-size
    (64 registers), no-DISTINCT, no-window member of the sketch
    family.  Prefer it over :func:`kmv_distinct` on token-stream-like
    inputs where duplicates dominate: KMV must DISTINCT first (a
    data-sized shuffle), HLL's register max absorbs duplicates on the
    map side."""
    return hll_estimate(hll_registers(df, group_col, value_col), group_col)


def hll_distinct_ctes(src: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`hll_distinct`, WITHOUT the leading WITH
    (oracle-prelude appendable; hll_*-namespaced CTEs).  Final SELECT
    emits (group, n_regs, est_distinct)."""
    h = hll_hash_sql(value_col)
    lc = "[" + ", ".join(str(x) for x in _HLL_LC_TABLE) + "]"
    return f"""
        hll_hash AS (
            SELECT {group_col}, {h} AS _h FROM {src}
        ),
        hll_regs AS (
            SELECT {group_col},
                   _h // {_HLL_FIELD} AS idx,
                   MAX(CASE WHEN _h % {_HLL_FIELD} = 0
                            THEN {_HLL_RHO_MAX}
                            ELSE {_HLL_RHO_MAX}
                                 - length(bin(_h % {_HLL_FIELD}))
                       END) AS rho
            FROM hll_hash GROUP BY 1, 2
        ),
        hll_s AS (
            SELECT {group_col},
                   COUNT(*) AS n_regs,
                   CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - rho))
                        AS BIGINT)
                   + ({_HLL_M} - COUNT(*)) * {1 << _HLL_RHO_MAX} AS _s
            FROM hll_regs GROUP BY 1
        )
        SELECT {group_col},
               CAST(n_regs AS BIGINT) AS n_regs,
               CAST(CASE WHEN ({_HLL_M} - n_regs) > 0
                         AND (({_HLL_EST_NUM} // _s) // 1000000)
                             <= {_HLL_LC_CUTOFF}
                    THEN list_extract({lc},
                                      CAST({_HLL_M} - n_regs AS INTEGER))
                    ELSE ({_HLL_EST_NUM} // _s) // 1000000
                    END AS BIGINT) AS est_distinct
        FROM hll_s
    """


def hll_distinct_sql(src: str, group_col: str, value_col: str) -> str:
    """Standalone-statement form of :func:`hll_distinct_ctes`."""
    return "WITH " + hll_distinct_ctes(src, group_col, value_col)


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group set-operation estimates between two value sets from
    their bottom-``k`` KMV sketches (Beyer et al., SIGMOD'07) — the
    mergeable-sketch answer to "how much does corpus slice A's
    vocabulary overlap slice B's?" when the exact intersection would
    be a data-sized join: union, intersection, and Jaccard from two
    k-row sketches per group.

    Method: sketch each side (bottom-k of the same hash used by
    :func:`kmv_distinct`, value tie-break), merge, and keep the
    bottom-k of the UNION of sketch rows with per-row membership
    flags.  With K = the union sketch's kth hash and
    m = union-sketch rows present in BOTH side sketches:

        est_union        = (k−1)·2³² DIV K      (exact if < k kept)
        jaccard_ppm      = m·10⁶ DIV union_kept
        est_intersection = (m · est_union) DIV union_kept

    All integer, all truncating — engine-identical.  When both sides
    hold < k distinct values the sketches ARE the sets and every
    number is exact (the property the contract query verifies at
    sf0.01); above k the relative error is ~1/√k on union and
    Jaccard.  The union sketch is built from KEPT rows only — a
    value outside both bottom-k's can never enter (hash order is
    global), so merging sketches loses nothing: the sketch is
    mergeable, the 1000-executor property.

    Scale: two per-group WindowGroupLimit bottom-k passes (≤ k rows
    per group per side cross the shuffle) + one ≤ 2k-row merge per
    group.  Returns (group, n_a_kept, n_b_kept, union_kept, matches,
    est_union, est_intersection, jaccard_ppm); jaccard/intersection
    NULL when both sides are empty (no union sketch row)."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2, got {k}")

    def _sketch(df: DataFrame, flag: str) -> DataFrame:
        vals = df.select(group_col, value_col).distinct()
        h = kmv_hash(F.col(value_col)).alias("_h")
        w = W.partitionBy(group_col).orderBy("_h", value_col)
        return (
            vals.select(group_col, value_col, h)
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .select(group_col, value_col, "_h",
                    F.lit(1).alias(flag))
        )

    sa = _sketch(a, "_in_a")
    sb = _sketch(b, "_in_b")
    merged = (
        sa.unionByName(sb, allowMissingColumns=True)
        .groupBy(group_col, value_col, "_h")
        .agg(
            F.max(F.coalesce("_in_a", F.lit(0))).alias("_a"),
            F.max(F.coalesce("_in_b", F.lit(0))).alias("_b"),
        )
    )
    w = W.partitionBy(group_col).orderBy("_h", value_col)
    union_kept = (
        merged.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
    )
    agg = union_kept.groupBy(group_col).agg(
        F.sum("_a").alias("n_a_kept"),
        F.sum("_b").alias("n_b_kept"),
        F.count(F.lit(1)).alias("union_kept"),
        F.max("_h").alias("_kth"),
        F.sum(F.expr("_a * _b")).alias("matches"),
    )
    est_union = (
        F.when(F.col("union_kept") < k, F.col("union_kept"))
        .otherwise(
            F.expr(f"({k - 1} * {_TWO32}) DIV GREATEST(_kth, 1)")
        )
        .cast("bigint")
    )
    return agg.withColumn("est_union", est_union).select(
        group_col,
        "n_a_kept",
        "n_b_kept",
        "union_kept",
        "matches",
        "est_union",
        F.expr(
            "CAST(CASE WHEN union_kept = 0 THEN NULL ELSE "
            "(matches * est_union) DIV union_kept END AS BIGINT)"
        ).alias("est_intersection"),
        F.expr(
            "CAST(CASE WHEN union_kept = 0 THEN NULL ELSE "
            "(matches * 1000000) DIV union_kept END AS BIGINT)"
        ).alias("jaccard_ppm"),
    )


def kmv_set_ops_sql(
    a_src: str,
    b_src: str,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> str:
    """DuckDB twin of :func:`kmv_set_ops` (standalone statement;
    kso_*-namespaced CTEs)."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2, got {k}")
    h = kmv_hash_sql(value_col)

    def _sk(src: str, name: str) -> str:
        return f"""{name} AS MATERIALIZED (
            SELECT {group_col}, {value_col}, _h FROM (
                SELECT {group_col}, {value_col}, {h} AS _h,
                       ROW_NUMBER() OVER (PARTITION BY {group_col}
                                          ORDER BY {h}, {value_col})
                           AS _rk
                FROM (SELECT DISTINCT {group_col}, {value_col}
                      FROM {src})
            ) WHERE _rk <= {k}
        )"""

    return f"""
        WITH {_sk(a_src, 'kso_a')},
        {_sk(b_src, 'kso_b')},
        kso_merged AS (
            SELECT {group_col}, {value_col}, _h,
                   MAX(_a) AS _a, MAX(_b) AS _b
            FROM (
                SELECT {group_col}, {value_col}, _h, 1 AS _a, 0 AS _b
                FROM kso_a
                UNION ALL
                SELECT {group_col}, {value_col}, _h, 0 AS _a, 1 AS _b
                FROM kso_b
            ) GROUP BY {group_col}, {value_col}, _h
        ),
        kso_union AS (
            SELECT * FROM (
                SELECT {group_col}, _a, _b, _h,
                       ROW_NUMBER() OVER (PARTITION BY {group_col}
                                          ORDER BY _h, {value_col})
                           AS _rk
                FROM kso_merged
            ) WHERE _rk <= {k}
        ),
        kso_agg AS (
            SELECT {group_col},
                   SUM(_a) AS n_a_kept,
                   SUM(_b) AS n_b_kept,
                   COUNT(*) AS union_kept,
                   MAX(_h) AS _kth,
                   SUM(_a * _b) AS matches
            FROM kso_union GROUP BY {group_col}
        )
        SELECT {group_col},
               CAST(n_a_kept AS BIGINT) AS n_a_kept,
               CAST(n_b_kept AS BIGINT) AS n_b_kept,
               CAST(union_kept AS BIGINT) AS union_kept,
               CAST(matches AS BIGINT) AS matches,
               CAST(CASE WHEN union_kept < {k} THEN union_kept
                    ELSE ({k - 1} * {_TWO32}) // GREATEST(_kth, 1)
                    END AS BIGINT) AS est_union,
               CAST(CASE WHEN union_kept = 0 THEN NULL ELSE
                    (matches * (CASE WHEN union_kept < {k}
                         THEN union_kept
                         ELSE ({k - 1} * {_TWO32})
                              // GREATEST(_kth, 1) END))
                    // union_kept END AS BIGINT) AS est_intersection,
               CAST(CASE WHEN union_kept = 0 THEN NULL ELSE
                    (matches * 1000000) // union_kept END AS BIGINT)
                   AS jaccard_ppm
        FROM kso_agg
    """


_F2_MULT2 = 2246822519


def _f2_sign_bit(key) -> F.Column:
    """AMS sign bit: kmv mix + a SECOND multiplicative round before
    taking the low bit.  One round is not enough — its low bit
    preserves the key's parity (key·odd mod 2³² keeps bit 0), so the
    structured keys an explode produces (v·r + j: constant parity in
    v for even r) collapse every counter to ~0 and F₂ under-estimates
    by orders of magnitude (the uniform-2000 case measured est≈2).
    The second round is sized wrap-free like kmv_hash (h mod 2³¹
    before the multiply)."""
    h = kmv_hash(key)
    h2 = F.pmod(h, F.lit(_TWO31)) * F.lit(_F2_MULT2) % F.lit(_TWO32)
    return h2.bitwiseXOR(F.shiftright(h2, 15)) % F.lit(2)


def _f2_sign_bit_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`_f2_sign_bit`."""
    h = kmv_hash_sql(key_expr)
    h2 = f"((({h}) % {_TWO31}) * {_F2_MULT2}) % {_TWO32}"
    return f"xor({h2}, ({h2}) >> 15) % 2"


def f2_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    r: int = 16,
) -> DataFrame:
    """Per-group second frequency moment F₂ = Σᵥ fᵥ² estimated by the
    AMS sign sketch (Alon–Matias–Szegedy '96) — THE join-size /
    skew-detection primitive: a key column's self-join output size IS
    its F₂, so this sketch prices a join before running it (the
    countmin sibling for the quadratic question; countmin answers
    per-key, F₂ answers the total).

    r sign counters per group:  Sⱼ = Σ_rows sign_j(v)  with
    sign_j(v) = 1 − 2·(mix(v·r + j) & 1) on the house wrap-free kmv
    mix (heuristic independence — variance is regression-pinned in
    tests, not assumed 4-wise);  est = (Σⱼ Sⱼ²) DIV r, unbiased with
    relative error ~√(2/r).  All integers: counters are exact row
    sums (|Sⱼ| ≤ n), squares carried in decimal(38,0)/HUGEINT, one
    truncating division — engine-identical, parallelism-independent.

    Plan: the ×r explode partial-aggregates map-side, so only
    |groups|·r counter rows cross the shuffle regardless of corpus
    size; the final square-sum is a |groups|-sized aggregate.  int64
    output bound: est ≲ F₂ ≤ n² needs n < 3·10⁹ rows per group (drop
    to grouped shards beyond).  Returns (group, n_rows, r, f2_est)."""
    if not 2 <= r <= 256:
        raise ValueError(f"r must be in [2, 256], got {r}")
    keyed = df.select(
        F.col(group_col).alias("_g"),
        F.pmod(F.col(value_col), F.lit(_TWO31)).alias("_v"),
    ).select(
        "_g",
        F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_j"),
        "_v",
    ).select(
        "_g", "_j",
        (F.lit(1) - 2 * _f2_sign_bit(F.col("_v") * r + F.col("_j")))
        .alias("_s"),
    )
    counters = keyed.groupBy("_g", "_j").agg(
        F.sum("_s").alias("_S"), F.count(F.lit(1)).alias("_n")
    )
    dec = "decimal(38,0)"
    return (
        counters.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.max("_n").alias("n_rows"),
            F.sum(F.expr(f"CAST(_S AS {dec}) * CAST(_S AS {dec})"))
            .alias("_sq"),
        )
        .select(
            group_col,
            "n_rows",
            F.lit(r).cast("bigint").alias("r"),
            F.expr(f"CAST(_sq DIV {r} AS BIGINT)").alias("f2_est"),
        )
    )


def f2_sketch_sql(
    src: str,
    group_col: str,
    value_col: str,
    r: int = 16,
) -> str:
    """DuckDB twin of :func:`f2_sketch` (standalone statement;
    f2_*-namespaced CTEs)."""
    if not 2 <= r <= 256:
        raise ValueError(f"r must be in [2, 256], got {r}")
    sbit = _f2_sign_bit_sql(
        f"(({value_col}) % {_TWO31}) * {r} + j.range"
    )
    return f"""
        WITH f2_signed AS (
            SELECT {group_col} AS _g, j.range AS _j,
                   1 - 2 * ({sbit}) AS _s
            FROM {src}, range({r}) j
        ),
        f2_counters AS (
            SELECT _g, _j, SUM(_s) AS _S, COUNT(*) AS _n
            FROM f2_signed GROUP BY 1, 2
        )
        SELECT _g AS {group_col},
               CAST(MAX(_n) AS BIGINT) AS n_rows,
               CAST({r} AS BIGINT) AS r,
               CAST(SUM(CAST(_S AS HUGEINT) * CAST(_S AS HUGEINT))
                    // {r} AS BIGINT) AS f2_est
        FROM f2_counters GROUP BY _g
    """
