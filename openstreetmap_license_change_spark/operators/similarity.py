"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k against a query vector using
  native ``zip_with``/``aggregate`` (JVM-side, whole-stage codegen —
  no Python in the hot path)
* lsh_bucket_topk  — the scale path: random-hyperplane LSH buckets
  (sign of dot product with fixed pseudo-random planes) shrink the
  candidate set before exact re-ranking; planes are derived
  arithmetically so runs are reproducible
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: map-side score + single top-k reduction.

    The global top-k is a TakeOrderedAndProject physical op (no full
    sort); ties broken by id for determinism."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    scored = embeddings.select(
        id_col,
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def _planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (sin-based hash — no RNG
    state, reproducible everywhere)."""
    return [
        [math.sin(0.7 * p + 1.3 * d + 0.001 * p * d) for d in range(dim)]
        for p in range(n_planes)
    ]


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF/LSH-style ANN: bucket by sign pattern against fixed
    hyperplanes, probe the query's bucket, exact re-rank inside.

    ``multiprobe`` additionally probes every Hamming-distance-1 bucket
    (each single plane-sign flip) — the standard recall lever: near
    neighbours that land barely on the other side of one hyperplane are
    recovered at the cost of n_planes extra bucket reads.

    At 100 TB the bucket column is the partition key, so the probe is a
    partition-pruned scan (1 or 1+n_planes partitions) instead of a
    full pass."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes)

    def bucket_of(vec: Column) -> Column:
        bits = [
            (
                _dot(vec, F.array(*[F.lit(w).cast("double") for w in plane]))
                > 0
            ).cast("int")
            for plane in planes
        ]
        # arithmetic bit-pack (Column `|` is boolean OR in PySpark)
        out = F.lit(0)
        for b in bits:
            out = out * 2 + b
        return out

    q_bucket = 0
    for plane in planes:
        q_bucket = (q_bucket << 1) | int(
            sum(w * x for w, x in zip(plane, query_vec)) > 0
        )

    probes = [q_bucket]
    if multiprobe:
        probes += [q_bucket ^ (1 << i) for i in range(n_planes)]

    vec_d = F.col(vec_col).cast("array<double>")
    bucketed = embeddings.withColumn("bucket", bucket_of(vec_d))
    probe = bucketed.where(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    scored = probe.select(
        id_col,
        F.round(cosine(vec_d, q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = 0,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid
    (argmax rounded cosine, lowest-centroid tie-break), probe the
    ``n_probe`` centroids nearest the query, exact re-rank inside.

    ``exclude_id`` drops one id from the search set — default 0, the
    testdata convention that vec_id 0 is the query vector itself (so a
    self-match doesn't occupy a top-k slot).  Pass None to search every
    row (the general-library behavior).

    Centroids are the vectors with ids 1..n_centroids — deterministic
    and oracle-reproducible; production would plug k-means output into
    the same structure.  The centroid set is driver/broadcast-scale by
    construction (an IVF codebook always is), so assignment is a
    map-side expression over literals: no shuffle, no join.  At 100 TB
    ``cluster`` is the partition key and probing is partition pruning —
    the IVF twin of the hyperplane-LSH bucket column."""
    cents = sorted(
        (
            (int(r[0]), [float(x) for x in r[1]])
            for r in embeddings.select(id_col, vec_col)
            .where(F.col(id_col).between(1, n_centroids))
            .collect()
        ),
        key=lambda t: t[0],
    )
    vec_d = F.col(vec_col).cast("array<double>")
    cos_arr = F.array(
        *[
            F.round(
                cosine(vec_d, F.array(*[F.lit(x).cast("double") for x in cv])),
                6,
            )
            for _, cv in cents
        ]
    )
    searchable = (
        embeddings
        if exclude_id is None
        else embeddings.where(F.col(id_col) != exclude_id)
    )
    clustered = searchable.withColumn(
        "cluster", F.array_position(cos_arr, F.array_max(cos_arr))
    )

    def py_cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    # cluster is the 1-based POSITION in the sorted centroid list;
    # translate probe choices to positions so non-contiguous centroid
    # ids stay correct
    ranked = sorted(
        range(len(cents)),
        key=lambda i: (-py_cos(cents[i][1], query_vec), cents[i][0]),
    )
    probes = [i + 1 for i in ranked[:n_probe]]
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    return (
        clustered.where(F.col("cluster").isin(probes))
        .select(
            id_col, F.round(cosine(vec_d, q), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def pairwise_topk_in_bucket(
    embeddings: DataFrame,
    n_planes: int = 6,
    k: int = 3,
    dim: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup: all-pairs cosine within LSH buckets, top-k
    neighbours per vector.  Bucket join bounds the quadratic blowup."""
    planes = _planes(dim, n_planes)
    vec_d = F.col(vec_col).cast("array<double>")

    def bucket_of(vec: Column) -> Column:
        out = F.lit(0)
        for plane in planes:
            b = (
                _dot(vec, F.array(*[F.lit(w).cast("double") for w in plane])) > 0
            ).cast("int")
            out = out * 2 + b
        return out

    left = embeddings.select(
        F.col(id_col).alias("id_a"), vec_d.alias("vec_a")
    ).withColumn("bucket", bucket_of(F.col("vec_a")))
    right = embeddings.select(
        F.col(id_col).alias("id_b"), vec_d.alias("vec_b")
    ).withColumn("bucket", bucket_of(F.col("vec_b")))

    pairs = (
        left.join(right, "bucket")
        .where(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
        )
    )
    w = W.partitionBy("id_a").orderBy(F.desc("cos_sim"), F.col("id_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("id_a", "id_b", "cos_sim", "rk")
    )


def embedding_centroids(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Per-group embedding centroid in EXACT quantized arithmetic —
    the training side of the IVF story (ivf_topk consumes a broadcast
    codebook; this is how such a codebook is built/refreshed at scale:
    one k-means M-step over the assignment column) and the class-
    prototype aggregate for label analysis.

    A float mean would hash-diverge across engines on accumulation
    order, so each component is snapped to ``scale`` ints
    (round(val·10⁶) — float32 inputs carry ≤7 significant digits, so
    the snap is lossless-ish and deterministic) and the mean ships as
    ``sum DIV n`` per dimension.  Overflow: |val| ≤ 1 ⇒ per-dim sum ≤
    n·10⁶ — int64-safe to 9·10¹² vectors per group.

    Plan: posexplode to (group, dim, q) then ONE map-side-combining
    groupBy on (group, dim) — no collect, no window; the output is
    |groups|·dim rows (long form, the join-ready shape for a
    nearest-centroid assignment pass).

    Returns (group, dim, n_vecs, mean_q) with dim 0-based."""
    q = F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    exploded = embeddings.select(
        group_col, F.posexplode(vec_col).alias("dim", "_v")
    ).withColumn("_q", q)
    return (
        exploded.groupBy(group_col, "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("_q").alias("_sum_q"),
        )
        .select(
            group_col, "dim", "n_vecs",
            # sums go negative: both Spark's DIV and DuckDB's integer
            # // truncate toward zero (verified: -7//2 = -3 in both),
            # so plain DIV is the engine-identical choice
            F.expr("_sum_q DIV n_vecs").alias("mean_q"),
        )
    )


def embedding_centroids_sql(
    src: str,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`embedding_centroids` (standalone
    statement; 0-based dim to match posexplode)."""
    return f"""
        WITH ec_long AS (
            SELECT {group_col}, CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q
            FROM {src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1)) AS i) u
        )
        SELECT {group_col}, dim,
               COUNT(*) AS n_vecs,
               CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_q
        FROM ec_long GROUP BY 1, 2
    """


def nearest_centroid_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    scale: int = 10**6,
) -> DataFrame:
    """Nearest-centroid assignment (the k-means E-step) in the SAME
    quantized integers as :func:`embedding_centroids` (the M-step) —
    together they make one exactly-reproducible k-means round, and the
    assignment pass is also the IVF routing step applied corpus-wide.

    ``centroids`` is the M-step's long form (group, dim, mean_q).
    Distance = Σ_dims (q_v − mean_q)² in int64 (per-dim diff ≤ 2·10⁶ ⇒
    square ≤ 4·10¹², safe past 10⁵ dims); winner by min(struct(dist,
    group)) — deterministic smallest-group tie-break.

    Plan: the centroid table is tiny (|groups|·dim rows) and joins
    BROADCAST on dim; per-(vector, group) partial sums aggregate
    map-side; the argmin is a second aggregate on the same vector key
    (AQE reuses the partitioning).  No windows, no collects.

    Returns (id, group, dist_q)."""
    vlong = embeddings.select(
        id_col, F.posexplode(vec_col).alias("dim", "_v")
    ).withColumn(
        "_q", F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    )
    j = vlong.join(
        F.broadcast(centroids.select(group_col, "dim", "mean_q")), "dim"
    )
    d = F.col("_q") - F.col("mean_q")
    per = j.groupBy(id_col, group_col).agg(
        F.sum(d * d).alias("dist_q")
    )
    return (
        per.groupBy(id_col)
        .agg(F.min(F.struct("dist_q", group_col)).alias("_b"))
        .select(
            id_col,
            F.col(f"_b.{group_col}").alias(group_col),
            F.col("_b.dist_q").alias("dist_q"),
        )
    )


def nearest_centroid_assign_sql(
    emb_src: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of one full quantized k-means round: M-step
    (:func:`embedding_centroids_sql` inlined) then E-step assignment
    over the same source.  Standalone statement returning
    (id, group, dist_q)."""
    return f"""
        WITH ec_long AS (
            SELECT {group_col}, CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q
            FROM {emb_src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1)) AS i) u
        ),
        ec_cent AS (
            SELECT {group_col}, dim,
                   CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_q
            FROM ec_long GROUP BY 1, 2
        ),
        vlong AS (
            SELECT {id_col}, CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q
            FROM {emb_src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1)) AS i) u
        ),
        per AS (
            SELECT v.{id_col}, c.{group_col},
                   CAST(SUM((v.q - c.mean_q) * (v.q - c.mean_q))
                        AS BIGINT) AS dist_q
            FROM vlong v JOIN ec_cent c USING (dim)
            GROUP BY 1, 2
        )
        SELECT {id_col},
               (MIN({{'d': dist_q, 'g': {group_col}}})).g AS {group_col},
               (MIN({{'d': dist_q, 'g': {group_col}}})).d AS dist_q
        FROM per GROUP BY {id_col}
    """


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Product-quantization encoding — the embedding-compression step
    of a vector pipeline at corpus scale (an IVF-PQ index stores ``m``
    small codes per vector instead of the float payload; recall drops
    a little, storage drops ~100×): the vector splits into ``m``
    contiguous subvectors, each assigned its nearest subvector
    codebook entry.

    Codebooks are trained in the SAME pass with the deterministic
    seeding of the k-means round (assignment = id mod ``codes``), i.e.
    one quantized M-step per (subvector, code) — at production scale
    you iterate E/M rounds exactly like embedding_centroids /
    nearest_centroid_assign, whose arithmetic this reuses verbatim:
    round(val·scale) int snap, sum DIV n centroids, Σ(q−mean)²
    distances, min(struct) argmin with smallest-code tie-break — so
    the whole train+encode pipeline is engine-exact and the DuckDB
    twin (:func:`pq_encode_sql`) hash-matches.

    Plan: one posexplode; codebook = map-side-combined groupBy on
    (code, dim) — |codes|·D rows, broadcast back; per-(vec, sub, code)
    partial sums then per-(vec, sub) argmin — no window over raw data,
    no collect.  Returns long form (id, sub, code, dist_q): the
    join-ready shape (reassemble codes with array_agg downstream if a
    packed row is wanted).

    ``m`` must divide the (uniform) dimensionality; validated at plan
    time via assert on the first row's length would be a driver
    action, so the contract is documented instead: a non-divisible
    D puts the remainder dims in the last subvector (dim DIV ceil)
    — callers wanting strictness check D upfront."""
    if m < 1 or codes < 1:
        raise ValueError(f"m and codes must be ≥ 1: {m}, {codes}")
    q = F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    vlong = embeddings.select(
        id_col,
        F.size(vec_col).alias("_d"),
        F.posexplode(vec_col).alias("dim", "_v"),
    ).select(
        id_col,
        "dim",
        q.alias("_q"),
        # ceil-split: subvector width ⌈D/m⌉, remainder dims land in
        # the last subvector
        F.expr(f"dim DIV ((_d + {m} - 1) DIV {m})").alias("sub"),
    )
    seeded = vlong.withColumn(
        "_seed", F.expr(f"{id_col} % {int(codes)}")
    )
    codebook = (
        seeded.groupBy("_seed", "dim")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_q").alias("_s"),
        )
        .select(
            F.col("_seed").alias("code"),
            "dim",
            F.expr("_s DIV _n").alias("mean_q"),
        )
    )
    j = vlong.join(F.broadcast(codebook), "dim")
    d = F.col("_q") - F.col("mean_q")
    per = j.groupBy(id_col, "sub", "code").agg(
        F.sum(d * d).alias("dist_q")
    )
    return (
        per.groupBy(id_col, "sub")
        .agg(F.min(F.struct("dist_q", "code")).alias("_b"))
        .select(
            id_col, "sub",
            F.col("_b.code").alias("code"),
            F.col("_b.dist_q").alias("dist_q"),
        )
    )


def pq_encode_sql(
    emb_src: str,
    m: int = 4,
    codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`pq_encode` — identical snap, ceil-split,
    codebook means and argmin."""
    return f"""
        WITH pq_long AS (
            SELECT {id_col},
                   CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q,
                   CAST((u.i - 1) // ((len({vec_col}) + {m} - 1) // {m})
                        AS INTEGER) AS sub
            FROM {emb_src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1)) AS i) u
        ),
        pq_cb AS (
            SELECT {id_col} % {int(codes)} AS code, dim,
                   CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_q
            FROM pq_long GROUP BY 1, 2
        ),
        pq_per AS (
            SELECT v.{id_col}, v.sub, c.code,
                   CAST(SUM((v.q - c.mean_q) * (v.q - c.mean_q))
                        AS BIGINT) AS dist_q
            FROM pq_long v JOIN pq_cb c USING (dim)
            GROUP BY 1, 2, 3
        )
        SELECT {id_col}, sub,
               (MIN({{'d': dist_q, 'c': code}})).c AS code,
               (MIN({{'d': dist_q, 'c': code}})).d AS dist_q
        FROM pq_per GROUP BY {id_col}, sub
    """


def pq_search(
    embeddings: DataFrame,
    query: "list[float]",
    k: int = 10,
    m: int = 4,
    codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """ADC (asymmetric-distance) top-``k`` retrieval over
    :func:`pq_encode` codes — the query half of IVF-PQ: the query
    stays UNquantized-by-codes (asymmetric), its distance to every
    (subvector, code) centroid is precomputed into an ``m·codes``-row
    lookup table, and each vector's approximate distance is the sum
    of ``m`` table lookups on its codes — the corpus is touched only
    through its integer codes, never its floats.

    Exactness contract: given the codes, every ADC arithmetic step is
    engine-exact (the pq_encode quantization discipline), so
    approx_dist_q and the top-k cut (ties → lowest id) hash-match the
    twin — the approximation is PQ itself, measured against exact
    search the same way ann_recall measures the LSH path.

    Plan: codebook + lookup table are tiny broadcasts; per-vector
    score is one groupBy over the m code rows; the global top-k is
    TakeOrderedAndProject.  Returns (id, approx_dist_q)."""
    enc = pq_encode(
        embeddings, m=m, codes=codes,
        id_col=id_col, vec_col=vec_col, scale=scale,
    )
    q = F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    # rebuild the codebook exactly as pq_encode does (same pass shape)
    cb_long = embeddings.select(
        id_col,
        F.size(vec_col).alias("_d"),
        F.posexplode(vec_col).alias("dim", "_v"),
    ).select(
        id_col, "dim",
        q.alias("_q"),
        F.expr(f"dim DIV ((_d + {m} - 1) DIV {m})").alias("sub"),
    )
    codebook = (
        cb_long.withColumn("_seed", F.expr(f"{id_col} % {int(codes)}"))
        .groupBy("_seed", "dim")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_q").alias("_s"))
        .select(
            F.col("_seed").alias("code"), "dim",
            F.expr("_s DIV _n").alias("mean_q"),
        )
    )
    d = len(query)
    width = (d + m - 1) // m
    # quantize IN-ENGINE (F.round), not in Python: Python's banker's
    # round would disagree with both engines' half-away ROUND at .5
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        [(i, i // width, float(query[i])) for i in range(d)],
        "dim int, sub int, qv double",
    ).select(
        "dim", "sub",
        F.round(F.col("qv") * F.lit(float(scale))).cast("bigint")
        .alias("q_q"),
    )
    lut = (
        qdf.join(F.broadcast(codebook), "dim")
        .groupBy("sub", "code")
        .agg(
            F.sum(
                (F.col("q_q") - F.col("mean_q"))
                * (F.col("q_q") - F.col("mean_q"))
            ).alias("lut_q")
        )
    )
    scored = (
        enc.join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.sum("lut_q").alias("approx_dist_q"))
    )
    return scored.orderBy(
        F.col("approx_dist_q").asc(), F.col(id_col).asc()
    ).limit(k)


def pq_search_sql(
    emb_src: str,
    query_src: str,
    k: int = 10,
    m: int = 4,
    codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`pq_search` — the pq_encode twin's CTEs
    plus the query lookup table and the summed-lookup top-k.
    ``query_src`` yields ONE row with a ``{vec_col}`` list; its
    quantization runs in-engine (ROUND), mirroring the operator."""
    enc = pq_encode_sql(
        emb_src, m=m, codes=codes,
        id_col=id_col, vec_col=vec_col, scale=scale,
    ).replace("WITH ", "", 1)
    # reuse the twin's CTE chain; splice before its final SELECT
    head, _, tail = enc.rpartition("SELECT")
    return f"""
        WITH {head.rstrip()},
        pq_enc AS (
            SELECT{tail}
        ),
        pq_q AS (
            SELECT CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST((u.i - 1) // ((len({vec_col}) + {m} - 1) // {m})
                        AS INTEGER) AS sub,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q_q
            FROM {query_src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1)) AS i) u
        ),
        pq_lut AS (
            SELECT q.sub, c.code,
                   CAST(SUM((q.q_q - c.mean_q) * (q.q_q - c.mean_q))
                        AS BIGINT) AS lut_q
            FROM pq_q q JOIN pq_cb c USING (dim)
            GROUP BY 1, 2
        )
        SELECT e.{id_col},
               CAST(SUM(l.lut_q) AS BIGINT) AS approx_dist_q
        FROM pq_enc e JOIN pq_lut l USING (sub, code)
        GROUP BY e.{id_col}
        ORDER BY approx_dist_q ASC, e.{id_col} ASC
        LIMIT {int(k)}
    """


PCA_NORM = 1 << 20


def pca_power_top(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    rounds: int = 4,
) -> DataFrame:
    """Top principal component by QUANTIZED power iteration — the
    dimensionality-analysis member of the embedding family (IVF
    routes, PQ compresses, this tells you which direction carries the
    variance: drift detection between corpus snapshots, whitening
    pre-passes, embedding-quality audits).

    Never materializes the d×d covariance: each round applies
    C·v = Σ_i y_i·(y_iᵀv) as two long-form aggregates over the
    centered data —

        dot(i)      = Σ_d y(i,d)·v(d)        (id-keyed agg, int64)
        contrib(d)  = Σ_i dot(i)·y(i,d)      (dim-keyed agg, decimal)
        v'(d)       = contrib(d)·2²⁰ DIV Σ|contrib|   (L1 requantize)

    with y = q − mean_q, the :func:`embedding_centroids` truncated
    mean (sum DIV n — at most one quantum of centering bias, and the
    move that keeps |y| ≤ 2·scale INDEPENDENT of corpus size: dots
    stay int64 for d·2·scale·2²⁰ < 2⁶³, i.e. d ≤ ~2000 at scale 10⁶;
    the id-keyed contrib sum runs in decimal(38,0) with headroom past
    10¹⁷ vectors).  Covariance is PSD, so iteration from the all-ones
    vector converges sign-stable; every round's integer state is
    identical on both engines (DuckDB twin unrolls the recurrence),
    so the loadings hash-verify round by round.  Constant input
    (all-zero deviations) fails LOUD — a zero L1 would otherwise
    divide by zero silently.

    Plan per round: one broadcast join (v is d rows) + id-keyed agg,
    one id-keyed join + dim-keyed agg — 2 shuffles, map-side
    combined, lineage cut per round (the pagerank_quantized pattern).
    The round state checkpointed is ``contrib`` (d rows) and the L1
    normalizer is a bounded 1-row collect baked into the requantize
    expression as a decimal literal (the pagerank dangling-mass
    pattern): a ``crossJoin(broadcast(l1))`` formulation instead
    re-executes the whole dots→contrib pipeline inside the broadcast
    build (no exchange reuse across the two subtrees — r06 measured
    plan), doubling every round.

    Returns (dim, v_q) with Σ|v_q| ≈ 2²⁰ (L1-quantized loadings)."""
    if rounds < 1:
        raise ValueError(f"rounds must be ≥ 1: {rounds}")
    dec = "decimal(38,0)"
    vlong = embeddings.select(
        id_col, F.posexplode(vec_col).alias("dim", "_v")
    ).withColumn(
        "_q", F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    )
    means = vlong.groupBy("dim").agg(
        F.expr("CAST(SUM(_q) AS BIGINT) DIV COUNT(*)").alias("_mq")
    )
    # (r06 note: pre-partitioning ylong by id was A/B-measured a wash —
    # the per-round aggregates re-hash anyway; kept un-partitioned)
    ylong = (
        vlong.join(F.broadcast(means), "dim")
        .select(
            id_col, "dim", (F.col("_q") - F.col("_mq")).alias("_y")
        )
        .localCheckpoint(eager=True)
    )
    spark = embeddings.sparkSession
    # dims from the checkpointed deviations (the mean join is keyed on
    # dim, so the sets are identical) — avoids re-running the parquet
    # scan + explode + groupBy that means.collect() would cost
    dims = [
        r["dim"] for r in ylong.select("dim").distinct().collect()
    ]
    v = spark.createDataFrame(
        [(d, PCA_NORM) for d in sorted(dims)], "dim int, v_q bigint"
    )
    for _ in range(rounds):
        dots = (
            ylong.join(F.broadcast(v), "dim")
            .groupBy(id_col)
            .agg(F.sum(F.col("_y") * F.col("v_q")).alias("_dot"))
        )
        contrib = (
            ylong.join(dots, id_col)
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("_dot").cast(dec) * F.col("_y")
                ).alias("_c")
            )
            .localCheckpoint(eager=True)
        )
        # bounded 1-row collect over the d checkpointed contrib rows;
        # Σ|contrib| as a decimal(38,0) literal keeps the requantize
        # DIV byte-identical to the column form the twin unrolls
        l1_val = contrib.agg(
            F.sum(F.abs(F.col("_c"))).alias("_l1")
        ).collect()[0]["_l1"]
        if l1_val is None or l1_val <= 0:
            raise RuntimeError(
                "pca_power_top: zero covariance action (constant "
                "input?) — the top component is undefined"
            )
        v = contrib.select(
            "dim",
            F.expr(
                f"CAST((_c * {PCA_NORM}) DIV "
                # int() renders the scale-0 decimal in plain digits
                # (Decimal repr may use exponent notation)
                f"CAST('{int(l1_val)}' AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("v_q"),
        )
    return v.select("dim", "v_q")


def pca_power_top_sql(
    src: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    rounds: int = 4,
) -> str:
    """DuckDB twin of :func:`pca_power_top`: the identical recurrence
    unrolled (HUGEINT for the decimal legs, same trunc DIV).  CTE
    names pc_*-namespaced."""
    ctes = [
        f"""pc_vlong AS MATERIALIZED (
            SELECT {id_col} AS id, CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q
            FROM {src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1))
                          AS i) u
        )""",
        """pc_means AS (
            SELECT dim, CAST(SUM(q) AS BIGINT) // COUNT(*) AS mq
            FROM pc_vlong GROUP BY dim
        )""",
        """pc_ylong AS MATERIALIZED (
            SELECT v.id, v.dim, v.q - m.mq AS y
            FROM pc_vlong v JOIN pc_means m USING (dim)
        )""",
        f"pc_v0 AS (SELECT DISTINCT dim, CAST({PCA_NORM} AS BIGINT) "
        "AS v_q FROM pc_vlong)",
    ]
    for i in range(1, rounds + 1):
        p = f"pc_v{i - 1}"
        ctes.append(f"""pc_d{i} AS MATERIALIZED (
            SELECT y.id, CAST(SUM(y.y * v.v_q) AS BIGINT) AS dot
            FROM pc_ylong y JOIN {p} v USING (dim)
            GROUP BY y.id
        )""")
        ctes.append(f"""pc_c{i} AS MATERIALIZED (
            SELECT y.dim,
                   SUM(CAST(d.dot AS HUGEINT) * y.y) AS c
            FROM pc_ylong y JOIN pc_d{i} d USING (id)
            GROUP BY y.dim
        )""")
        ctes.append(f"""pc_v{i} AS (
            SELECT dim,
                   CAST((c * {PCA_NORM})
                        // (SELECT SUM(abs(c)) FROM pc_c{i})
                        AS BIGINT) AS v_q
            FROM pc_c{i}
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT dim, v_q FROM pc_v{rounds}"
    )


def embedding_dim_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Per-dimension embedding health profile — the pre-training
    feature audit of the embedding family (centroids train, PCA finds
    the variance axis, THIS finds the broken inputs: dead dimensions,
    scale-imbalanced dimensions, constant or near-constant channels
    that silently waste model capacity or break cosine geometry).

    Components snap once to ``scale`` ints (the
    :func:`embedding_centroids` convention — deterministic, engine-
    identical; every statistic is DEFINED over the quantized values)
    and per dimension the profile reports:

    * n_vecs, n_zero (exact zero after quantization — the dead-dim
      counter), n_distinct (exact; a 1-distinct dim is constant),
    * mean_q (sum DIV n, trunc-toward-zero — both engines agree on
      negatives), min_q / max_q,
    * var_q2 = (n·Σq² − (Σq)²) DIV n² — the exact variance in q²
      units under one non-negative floor; products in DECIMAL(38)
      (n·Σq² ≤ n²·scale² — headroom past 10¹² vectors).

    Plan: ONE posexplode + one (dim) hash aggregation, map-side
    combined — dim-bounded output, no window, no join.

    Returns (dim, n_vecs, n_zero, n_distinct, mean_q, min_q, max_q,
    var_q2)."""
    dec = "decimal(38,0)"
    q = F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    exploded = embeddings.select(
        F.posexplode(vec_col).alias("dim", "_v")
    ).withColumn("_q", q)
    agg = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.when(F.col("_q") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_zero"),
        F.countDistinct("_q").cast("bigint").alias("n_distinct"),
        F.sum(F.col("_q").cast(dec)).alias("_s"),
        F.sum(F.expr(f"CAST(_q AS {dec}) * _q")).alias("_s2"),
        F.min("_q").cast("bigint").alias("min_q"),
        F.max("_q").cast("bigint").alias("max_q"),
    )
    return agg.select(
        "dim", "n_vecs", "n_zero", "n_distinct",
        F.expr(
            "CAST(CASE WHEN _s < 0 THEN -((-_s) DIV n_vecs) "
            "ELSE _s DIV n_vecs END AS BIGINT)"
        ).alias("mean_q"),
        "min_q", "max_q",
        F.expr(
            "CAST((n_vecs * _s2 - _s * _s) "
            "DIV (CAST(n_vecs AS DECIMAL(38,0)) * n_vecs) AS BIGINT)"
        ).alias("var_q2"),
    )


def embedding_dim_stats_sql(
    src: str,
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`embedding_dim_stats` (standalone;
    0-based dim, HUGEINT products, identical trunc/floor choices)."""
    return f"""
        WITH eds_long AS (
            SELECT CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q
            FROM {src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1))
                          AS i) u
        ),
        eds_agg AS (
            SELECT dim,
                   CAST(COUNT(*) AS HUGEINT) AS n_vecs,
                   CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zero,
                   CAST(COUNT(DISTINCT q) AS BIGINT) AS n_distinct,
                   SUM(CAST(q AS HUGEINT)) AS s,
                   SUM(CAST(q AS HUGEINT) * q) AS s2,
                   CAST(MIN(q) AS BIGINT) AS min_q,
                   CAST(MAX(q) AS BIGINT) AS max_q
            FROM eds_long GROUP BY 1
        )
        SELECT dim,
               CAST(n_vecs AS BIGINT) AS n_vecs,
               n_zero, n_distinct,
               CAST(CASE WHEN s < 0 THEN -((-s) // n_vecs)
                    ELSE s // n_vecs END AS BIGINT) AS mean_q,
               min_q, max_q,
               CAST((n_vecs * s2 - s * s) // (n_vecs * n_vecs)
                    AS BIGINT) AS var_q2
        FROM eds_agg
    """


def kcenter_seeds(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Greedy k-center seeding (Gonzalez farthest-first traversal) —
    the deterministic diversity sampler: each round picks the vector
    FARTHEST from everything chosen so far, giving the classic
    2-approximation of the k-center cover and the spread-out seed set
    k-means++ randomizes (training-data curation wants the coverage
    without the RNG: the same corpus must yield the same seeds on any
    cluster).

    Same quantized arithmetic as :func:`embedding_centroids`
    (components snapped to ``scale`` ints, distances Σ(Δq)² in
    int64); seed 0 is the MIN id (declared start — farthest-first is
    start-dependent, so the tie rule is part of the contract), later
    rounds argmax by (distance, then smallest id) via one
    max(struct) aggregate.

    Plan: the vector long form is checkpointed once; each of the k−1
    rounds is one BROADCAST join against the newly chosen seed's
    dims (a |dims|-row frame), a map-side-combining per-point sum,
    and a least() update of the running min-distance column — the
    O(n·k) incremental form, never an n×k² rescan.  Driver actions
    are k single-row argmax collects (bounded by construction, the
    IVF-codebook precedent).

    Returns k rows: (seed_rank, id, dist_q) where dist_q is the
    point's distance to the PREVIOUSLY chosen set at selection time
    (NULL for seed 0) — the monotone non-increasing coverage-radius
    schedule."""
    if not 2 <= int(k) <= 64:
        raise ValueError(f"k must be in [2, 64]: {k}")
    head = embeddings.agg(
        F.min(F.col(id_col)).alias("_first"),
        F.count(F.lit(1)).alias("_n"),
    ).collect()[0]
    if head["_n"] < k:
        raise ValueError(
            f"kcenter_seeds: k={k} exceeds corpus size {head['_n']}"
        )
    first_id = head["_first"]
    vlong = embeddings.select(
        F.col(id_col).alias("_id"),
        F.posexplode(vec_col).alias("dim", "_v"),
    ).withColumn(
        "_q", F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    ).select("_id", "dim", "_q").localCheckpoint(eager=True)

    def dist_to(seed_id) -> DataFrame:
        s = vlong.where(F.col("_id") == F.lit(seed_id)).select(
            "dim", F.col("_q").alias("_sq")
        )
        d = F.col("_q") - F.col("_sq")
        return vlong.join(F.broadcast(s), "dim").groupBy("_id").agg(
            F.sum(d * d).alias("_d")
        )

    chosen = [(0, first_id, None)]
    mind = dist_to(first_id).withColumnRenamed("_d", "_mind") \
        .localCheckpoint(eager=True)
    for t in range(1, int(k)):
        pick = mind.agg(
            F.max(F.struct(F.col("_mind"), (-F.col("_id")).alias("_n")))
            .alias("_b")
        ).select(
            (-F.col("_b._n")).alias("pid"), F.col("_b._mind").alias("pd")
        ).collect()[0]
        chosen.append((t, pick["pid"], pick["pd"]))
        if t < int(k) - 1:
            nd = dist_to(pick["pid"])
            mind = mind.join(nd, "_id").select(
                "_id",
                F.least(F.col("_mind"), F.col("_d")).alias("_mind"),
            ).localCheckpoint(eager=True)
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        chosen, f"seed_rank long, {id_col} long, dist_q long"
    )


def kcenter_seeds_sql(
    src: str,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`kcenter_seeds` — the identical greedy
    recurrence unrolled as chained CTEs (one min-distance table and
    one ORDER BY dist DESC, id LIMIT 1 argmax per round).
    Standalone statement."""
    vlong = f"""(
        SELECT {id_col} AS _id, CAST(u.i - 1 AS INTEGER) AS dim,
               CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                    AS BIGINT) AS _q
        FROM {src},
             LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1)) AS i) u
    )"""
    ctes = [
        f"kc_v AS MATERIALIZED {vlong}",
        f"kc_s0 AS (SELECT MIN({id_col}) AS sid FROM {src})",
        """kc_m1 AS MATERIALIZED (
            SELECT v._id, SUM((v._q - s._q) * (v._q - s._q)) AS mind
            FROM kc_v v
            JOIN kc_v s ON s._id = (SELECT sid FROM kc_s0)
                       AND s.dim = v.dim
            GROUP BY v._id
        )""",
    ]
    picks = ["SELECT CAST(0 AS BIGINT) AS seed_rank, "
             f"(SELECT sid FROM kc_s0) AS {id_col}, "
             "CAST(NULL AS BIGINT) AS dist_q"]
    for t in range(1, int(k)):
        ctes.append(f"""kc_p{t} AS MATERIALIZED (
            SELECT _id, mind FROM kc_m{t}
            ORDER BY mind DESC, _id LIMIT 1
        )""")
        picks.append(
            f"SELECT CAST({t} AS BIGINT), _id, CAST(mind AS BIGINT) "
            f"FROM kc_p{t}"
        )
        if t < int(k) - 1:
            ctes.append(f"""kc_m{t + 1} AS MATERIALIZED (
                SELECT m._id, LEAST(m.mind, d.d) AS mind
                FROM kc_m{t} m
                JOIN (
                    SELECT v._id,
                           SUM((v._q - s._q) * (v._q - s._q)) AS d
                    FROM kc_v v
                    JOIN kc_v s ON s._id = (SELECT _id FROM kc_p{t})
                               AND s.dim = v.dim
                    GROUP BY v._id
                ) d USING (_id)
            )""")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + " UNION ALL ".join(picks)
    )


def mmr_rerank(
    cands: DataFrame,
    k: int,
    w_rel: int = 1,
    w_div: int = 1,
    id_col: str = "vec_id",
    rel_col: str = "rel_q",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein
    1998) — the deterministic diversity/relevance trade-off every
    retrieval pipeline needs between "top-k by score" and "k-center
    spread": each round picks the remaining candidate maximizing

        score = w_rel·rel_q + w_div·min_dist²_to_selected

    (the distance form of MMR: instead of subtracting a max-
    similarity term, ADD the min squared quantized distance to the
    already-picked set — monotone-equivalent diversity pressure in
    pure int64, no cosine division, no floats).  The first pick is
    pure relevance, argmax (rel_q, smallest id) — the declared-start
    contract :func:`kcenter_seeds` uses; later rounds break score
    ties by smallest id.  ``w_rel``/``w_div`` are integer weights
    (the caller owns the unit mix — relevance and dist² live on
    different scales, exactly as λ does in float MMR).

    Same quantized arithmetic as :func:`kcenter_seeds` (components
    snapped to ``scale`` ints, distances Σ(Δq)² in int64); overflow
    bound: w_rel·|rel| + w_div·4·scale²·dim per term — at scale 10⁶,
    dim 64, unit-ish vectors that is ~10¹⁵·max(w), nine bits of
    int64 headroom at w ≤ 100 (validated).

    Plan: O(n·k) incremental — the candidate long form is
    checkpointed once; each round is one broadcast |dims|-row join,
    a map-side-combining per-point sum, and a least() update of the
    running min-distance; picked rows leave the state (unlike
    k-center, a picked row's zero distance would NOT sink its score
    — high relevance could re-win — so exclusion is explicit).
    Driver actions are k bounded single-row argmax collects.

    Returns k rows: (pick_rank, id, rel_q, div_q, score_q) — div_q
    is the min squared distance to the previously-picked set at
    selection time (NULL for rank 0), score_q the winning score
    (rank 0: w_rel·rel_q)."""
    if not 2 <= int(k) <= 64:
        raise ValueError(f"k must be in [2, 64]: {k}")
    if not (0 <= int(w_rel) <= 100 and 0 <= int(w_div) <= 100):
        raise ValueError(
            f"weights must be in [0, 100]: w_rel={w_rel} w_div={w_div}"
        )
    if int(w_rel) + int(w_div) < 1:
        raise ValueError("w_rel + w_div must be >= 1")
    w_rel, w_div = int(w_rel), int(w_div)
    first = cands.agg(
        F.max(
            F.struct(
                F.col(rel_col).cast("bigint").alias("_r"),
                (-F.col(id_col)).alias("_n"),
            )
        ).alias("_b"),
        F.count(F.lit(1)).alias("_n_all"),
    ).select(
        (-F.col("_b._n")).alias("pid"),
        F.col("_b._r").alias("prel"),
        "_n_all",
    ).collect()[0]
    if first["_n_all"] < k:
        raise ValueError(
            f"mmr_rerank: k={k} exceeds candidate count "
            f"{first['_n_all']}"
        )
    vlong = cands.select(
        F.col(id_col).alias("_id"),
        F.posexplode(vec_col).alias("dim", "_v"),
    ).withColumn(
        "_q", F.round(F.col("_v").cast("double") * F.lit(float(scale)))
        .cast("bigint")
    ).select("_id", "dim", "_q").localCheckpoint(eager=True)
    rels = cands.select(
        F.col(id_col).alias("_id"),
        F.col(rel_col).cast("bigint").alias("_rel"),
    ).localCheckpoint(eager=True)

    def dist_to(seed_id) -> DataFrame:
        s = vlong.where(F.col("_id") == F.lit(seed_id)).select(
            "dim", F.col("_q").alias("_sq")
        )
        d = F.col("_q") - F.col("_sq")
        return vlong.join(F.broadcast(s), "dim").groupBy("_id").agg(
            F.sum(d * d).alias("_d")
        )

    picked = [(0, first["pid"], first["prel"], None,
               w_rel * first["prel"])]
    state = (
        dist_to(first["pid"])
        .where(F.col("_id") != F.lit(first["pid"]))
        .withColumnRenamed("_d", "_mind")
        .join(rels, "_id")
        .localCheckpoint(eager=True)
    )
    for t in range(1, int(k)):
        score = (F.lit(w_rel) * F.col("_rel")
                 + F.lit(w_div) * F.col("_mind"))
        pick = state.agg(
            F.max(
                F.struct(
                    score.alias("_s"),
                    (-F.col("_id")).alias("_n"),
                    F.col("_rel").alias("_r"),
                    F.col("_mind").alias("_m"),
                )
            ).alias("_b")
        ).select(
            (-F.col("_b._n")).alias("pid"),
            F.col("_b._r").alias("prel"),
            F.col("_b._m").alias("pdiv"),
            F.col("_b._s").alias("pscore"),
        ).collect()[0]
        picked.append(
            (t, pick["pid"], pick["prel"], pick["pdiv"],
             pick["pscore"])
        )
        if t < int(k) - 1:
            nd = dist_to(pick["pid"])
            state = (
                state.where(F.col("_id") != F.lit(pick["pid"]))
                .join(nd, "_id")
                .select(
                    "_id", "_rel",
                    F.least(F.col("_mind"), F.col("_d"))
                    .alias("_mind"),
                )
                .localCheckpoint(eager=True)
            )
    spark = cands.sparkSession
    return spark.createDataFrame(
        picked,
        f"pick_rank long, {id_col} long, rel_q long, div_q long, "
        "score_q long",
    )


def mmr_rerank_sql(
    src: str,
    k: int,
    w_rel: int = 1,
    w_div: int = 1,
    id_col: str = "vec_id",
    rel_col: str = "rel_q",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`mmr_rerank` — the identical greedy
    recurrence unrolled as chained CTEs (every per-round CTE
    MATERIALIZED: the kcenter lesson — naive inlining re-executes
    the whole chain per reference).  Standalone; ``src`` may be a
    parenthesized derived table."""
    w_rel, w_div = int(w_rel), int(w_div)
    vlong = f"""(
        SELECT {id_col} AS _id, CAST(u.i - 1 AS INTEGER) AS dim,
               CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                    AS BIGINT) AS _q
        FROM {src} AS mm_src,
             LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1)) AS i) u
    )"""
    ctes = [
        f"mm_v AS MATERIALIZED {vlong}",
        f"""mm_r AS MATERIALIZED (
            SELECT {id_col} AS _id, CAST({rel_col} AS BIGINT) AS _rel
            FROM {src} AS mm_src2
        )""",
        """mm_p0 AS MATERIALIZED (
            SELECT _id, _rel FROM mm_r
            ORDER BY _rel DESC, _id LIMIT 1
        )""",
        """mm_m1 AS MATERIALIZED (
            SELECT v._id, r._rel,
                   SUM((v._q - s._q) * (v._q - s._q)) AS mind
            FROM mm_v v
            JOIN mm_v s ON s._id = (SELECT _id FROM mm_p0)
                       AND s.dim = v.dim
            JOIN mm_r r ON r._id = v._id
            WHERE v._id <> (SELECT _id FROM mm_p0)
            GROUP BY v._id, r._rel
        )""",
    ]
    picks = [
        "SELECT CAST(0 AS BIGINT) AS pick_rank, "
        f"_id AS {id_col}, CAST(_rel AS BIGINT) AS rel_q, "
        "CAST(NULL AS BIGINT) AS div_q, "
        f"CAST({w_rel} * _rel AS BIGINT) AS score_q FROM mm_p0"
    ]
    for t in range(1, int(k)):
        ctes.append(f"""mm_p{t} AS MATERIALIZED (
            SELECT _id, _rel, mind,
                   {w_rel} * _rel + {w_div} * mind AS score
            FROM mm_m{t}
            ORDER BY score DESC, _id LIMIT 1
        )""")
        picks.append(
            f"SELECT CAST({t} AS BIGINT), _id, CAST(_rel AS BIGINT), "
            "CAST(mind AS BIGINT), CAST(score AS BIGINT) "
            f"FROM mm_p{t}"
        )
        if t < int(k) - 1:
            ctes.append(f"""mm_m{t + 1} AS MATERIALIZED (
                SELECT m._id, m._rel, LEAST(m.mind, d.d) AS mind
                FROM mm_m{t} m
                JOIN (
                    SELECT v._id,
                           SUM((v._q - s._q) * (v._q - s._q)) AS d
                    FROM mm_v v
                    JOIN mm_v s ON s._id = (SELECT _id FROM mm_p{t})
                               AND s.dim = v.dim
                    GROUP BY v._id
                ) d USING (_id)
                WHERE m._id <> (SELECT _id FROM mm_p{t})
            )""")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + " UNION ALL ".join(picks)
    )


def mutual_knn(
    embeddings: DataFrame,
    k: int = 4,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    max_bucket_rows: int = 4_096,
) -> DataFrame:
    """Mutual k-nearest-neighbour graph over embeddings — the
    reciprocal-kNN edge set (a→b AND b→a both in the top-k) that
    graph-based clustering and near-dup mining key on: reciprocity
    filters out hub vectors that appear in everyone's neighbour list
    without being anyone's true peer (the asymmetric-kNN failure
    mode), so the surviving edges are high-precision similarity
    links ready for the pointer-jumping components kit.

    Exact arithmetic: components snap to ``scale`` ints IN-ENGINE
    (ROUND of the DOUBLE-cast float — the embedding_centroids
    quantization discipline) and distances are exact integer
    Σ(Δq)², so the (d2_q, id) neighbour ranking is a total order —
    bit-stable across engines and parallelism, no cosine floats.

    Scale design: candidate pairs come from a REQUIRED blocking
    column (``bucket_col`` — an IVF cluster, LSH bucket, or label
    partition), never a corpus self-join; per-bucket row counts are
    guarded LOUDLY (``max_bucket_rows``, the mega-bucket pattern)
    with the assert riding the distance column so pruning cannot
    silence it.  Within buckets: one equi-join, one window top-k
    (WindowGroupLimit), and the mutual check is a self-join of the
    directed top-k list with itself — O(n·k), not O(n²).

    Returns mutual pairs (id_a < id_b, d2_q, rank_ab, rank_ba):
    rank_ab = b's position in a's neighbour list."""
    if not 1 <= int(k) <= 64:
        raise ValueError(f"k must be in [1, 64]: {k}")
    qv = F.expr(
        f"transform({vec_col}, v -> "
        f"CAST(round(CAST(v AS DOUBLE) * {int(scale)}) AS BIGINT))"
    )
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(bucket_col).alias("_bk"),
        qv.alias("_q"),
    )
    cnt = base.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
    ok = F.assert_true(
        F.col("_n") <= F.lit(int(max_bucket_rows)),
        F.lit(
            f"mutual_knn: a bucket exceeds max_bucket_rows="
            f"{max_bucket_rows}; refine the blocking first"
        ),
    )
    base = base.join(F.broadcast(cnt), "_bk").select(
        "_bk", "_id", F.when(ok.isNull(), F.col("_q")).alias("_q")
    )
    a = base.select(
        "_bk", F.col("_id").alias("_ia"), F.col("_q").alias("_qa")
    )
    b = base.select(
        "_bk", F.col("_id").alias("_ib"), F.col("_q").alias("_qb")
    )
    d2 = F.expr(
        "aggregate(zip_with(_qa, _qb, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v) -> acc + v)"
    )
    scored = (
        a.join(b, "_bk")
        .where(F.col("_ia") != F.col("_ib"))
        .select("_ia", "_ib", d2.alias("d2_q"))
    )
    w = W.partitionBy("_ia").orderBy("d2_q", "_ib")
    topk = scored.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= int(k)
    )
    fwd = topk.select(
        F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b"),
        "d2_q", F.col("_rk").alias("rank_ab"),
    )
    rev = topk.select(
        F.col("_ib").alias("id_a"), F.col("_ia").alias("id_b"),
        F.col("_rk").alias("rank_ba"),
    )
    return (
        fwd.join(rev, ["id_a", "id_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "d2_q", "rank_ab", "rank_ba")
    )


def mutual_knn_sql(
    src: str,
    k: int = 4,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`mutual_knn` — the same quantization on
    the UNNESTED long form (vs the operator's array zip_with — a
    different evaluation shape), window top-k, and reciprocal
    self-join.  Standalone statement."""
    return f"""
        WITH mk_v AS MATERIALIZED (
            SELECT {id_col} AS _id, {bucket_col} AS _bk,
                   CAST(u.i AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE)
                        * {int(scale)}) AS BIGINT) AS _q
            FROM {src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1))
                          AS i) u
        ),
        mk_d AS MATERIALIZED (
            SELECT a._id AS _ia, b._id AS _ib,
                   SUM((a._q - b._q) * (a._q - b._q)) AS d2_q
            FROM mk_v a
            JOIN mk_v b ON a._bk = b._bk AND a.dim = b.dim
                       AND a._id <> b._id
            GROUP BY 1, 2
        ),
        mk_topk AS MATERIALIZED (
            SELECT * FROM (
                SELECT _ia, _ib, d2_q,
                       ROW_NUMBER() OVER (PARTITION BY _ia
                           ORDER BY d2_q, _ib) AS _rk
                FROM mk_d
            ) WHERE _rk <= {int(k)}
        )
        SELECT f._ia AS id_a, f._ib AS id_b,
               CAST(f.d2_q AS BIGINT) AS d2_q,
               CAST(f._rk AS INTEGER) AS rank_ab,
               CAST(r._rk AS INTEGER) AS rank_ba
        FROM mk_topk f
        JOIN mk_topk r ON r._ia = f._ib AND r._ib = f._ia
        WHERE f._ia < f._ib
    """
