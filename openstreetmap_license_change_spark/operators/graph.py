"""Distributed connected components by min-label propagation.

Shared graph machinery for every clustering operator in the engine:
spatial ε-clusters / DBSCAN (`operators/spatial.py`) and the sketch-
based near-dup clusterings (`operators/dedup.py`).  One algorithm,
one convergence contract, one non-convergence warning path.

Scale argument: min-label propagation with pointer jumping per round
(label ← label[label], the parallel union-find path-halving step)
converges in O(log diameter) rounds — plain edge-hop propagation
needs O(diameter) rounds, a 100-TB scale-killer on the chain-shaped
components real data produces (a road of ε-close points, a chain of
near-duplicate documents A~B~C).  Each round is two hash joins and a
groupBy — never a pairwise blow-up — and lineage is cut per round
(localCheckpoint, the staged cascade/LSH pattern) because labels
self-reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

PR_SCALE = 10**12


def _iter_width(df: DataFrame) -> int:
    """Partition width for checkpointed iterative state: the cluster's
    core count (defaultParallelism).  A keyless ``repartition(key)``
    lets AQE coalesce small-at-the-moment state to 1-2 partitions of
    advisoryPartitionSizeInBytes, which then caps EVERY later round's
    scan parallelism at those few partitions — right-sized for shuffle
    IO, wrong for the CPU-bound per-round joins.  Pinning to the core
    count keeps rounds wide locally and on a cluster alike (the value
    scales with the allocation, never a hard-coded constant)."""
    return df.sparkSession.sparkContext.defaultParallelism


def min_label_components(
    ids: DataFrame, edges: DataFrame, max_iters: int, op_name: str
) -> DataFrame:
    """Connected components over an undirected edge list (``id_a``,
    ``id_b``) restricted to the vertex set ``ids`` (one column,
    ``id``): min-label propagation + pointer jumping per round (see
    module docstring for the convergence argument).
    Returns (id, label); isolated ids keep their own label."""
    import warnings as _warnings

    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = ids.withColumn("label", F.col("id")).localCheckpoint(
        eager=True
    )
    changed = -1
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nl"))
        )
        relaxed = labels.select(
            "id", F.col("label").alias("_old")
        ).join(nbr_min, F.col("id") == nbr_min.src, "left").select(
            "id",
            "_old",
            F.least(
                F.col("_old"), F.coalesce(F.col("nl"), F.col("_old"))
            ).alias("label"),
        )
        # pointer jump: label ← label[label]; min-propagation keeps
        # every label a live point id, so the self-join always hits.
        # The change flag rides the jumped row (carried _old), so
        # convergence needs no extra join-and-count pass per round —
        # one checkpoint + an early-exit emptiness probe instead.
        jumped = (
            relaxed.alias("a")
            .join(
                relaxed.select(
                    F.col("id").alias("_jid"), F.col("label").alias("_jl")
                ),
                F.col("a.label") == F.col("_jid"),
            )
            .select(
                F.col("a.id").alias("id"),
                F.col("_jl").alias("label"),
                (F.col("_jl") != F.col("a._old")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = 0 if jumped.where(F.col("_chg")).isEmpty() else 1
        labels = jumped.select("id", "label")
        if changed == 0:
            break
    else:
        # warn path only (never taken when the loop broke early)
        n_chg = (
            jumped.where(F.col("_chg")).count() if max_iters > 0 else -1
        )
        msg = (
            f"{op_name}: propagation did NOT converge after "
            f"max_iters={max_iters} ({n_chg} labels still changing); "
            "cluster ids may split true components. Raise max_iters "
            "(rounds needed ~ log2 of the longest chain)."
        )
        _warnings.warn(msg, RuntimeWarning, stacklevel=3)
    return labels


def pagerank_quantized(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT quantized-integer arithmetic —
    the link-authority signal of a crawl curation pipeline (rank hosts
    / documents to prioritize recrawl and weight training data), and
    the engine's iterative-algorithm representative alongside the
    pointer-jumping components above.

    Float PageRank is engine-divergent (accumulation order changes the
    low bits, so a DuckDB twin can never hash-match); here every rank
    is an int64 multiple of 1/``scale``: r₀ = scale for every node, and

        r'(v) = (100-d)·scale DIV 100
              + d·( Σ_{u→v} r(u) DIV outdeg(u)  +  dangling DIV n ) DIV 100

    with d = ``damping_pct``, dangling = Σ r(u) over nodes with no
    out-edges, n = |nodes|.  Integer division quantizes exactly the
    same way in Spark and DuckDB, so after any fixed number of rounds
    the ranks are bit-identical across engines — the oracle unrolls the
    same recurrence as chained CTEs (``pagerank_sql``).  Floor losses
    leak ≤ 1/scale of mass per node per round (bounded, documented,
    deterministic) — ranking order is unaffected at scale=10¹².

    Scale design: per round, one src-keyed join of the PRE-PARTITIONED
    edge list against ranks and one dst-keyed partial-agg groupBy —
    2 shuffles × a fixed iteration count; hub pages are AQE's
    skew-join case.  The dangling mass is a 1-row broadcast cross
    join.  Lineage is cut per round (localCheckpoint, the iterative
    house pattern — self-referencing plans otherwise stack K rounds of
    Catalyst analysis).  The only driver actions are the bounded
    n-count and the per-round checkpoint.

    Overflow bound: total mass stays ≤ n·scale, and the largest single
    value (a hub's contribution sum, or the dangling total) is < n·scale,
    so n·scale must stay < 2⁶³ — at 10⁹ nodes drop ``scale`` to 10⁹
    (ranks remain exact multiples of 1/scale; only the quantum grows).

    ``nodes``: one column ``node``; ``edges``: (src, dst), assumed
    deduplicated.  Returns (node, rank_q)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100]: {damping_pct}")
    # r06 measured gotcha: under AQE, ``localCheckpoint`` captures the
    # ADAPTIVE plan's outputPartitioning — UnknownPartitioning — so the
    # carefully pre-partitioned edge/state checkpoints were re-shuffled
    # by EVERY round's join anyway (4 Exchanges/round observed, not the
    # intended 1).  The fixed-iteration loop therefore runs with AQE
    # off and shuffle.partitions pinned to the iteration width (scoped
    # to this call, restored after): checkpoints then preserve their
    # hash partitioning and every round is exactly the one dst-keyed
    # aggregate exchange.  Trade, stated: inside the loop there is no
    # runtime skew-splitting — per-edge work is uniform (ranks are
    # pre-divided by outdeg) and hub out-edges spread only as well as
    # hash(src) spreads, the same contract as a bucketed edge table.
    spark = edges.sparkSession
    w = _iter_width(edges)
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(w))
    try:
        return _pagerank_rounds(
            nodes, edges, iterations, damping_pct, scale, w
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def _pagerank_rounds(nodes, edges, iterations, damping_pct, scale, w):
    # Callers routinely derive the edge list FROM the node table (the
    # doc-link graph does), so the expensive node derivation (a
    # distinct over the page table) appears as a subtree of BOTH
    # checkpoints below.  Caching the caller's node frame lets the
    # CacheManager substitute the shared subtree in the edge plan, so
    # the derivation runs once; the cache lives strictly inside this
    # call (filled by the first checkpoint's action, dropped in the
    # finally) — no state survives the invocation.
    nodes_in = nodes.persist()
    try:
        edges = (
            edges.select("src", "dst")
            .repartition(w, "src")
            .localCheckpoint(eager=True)
        )
        outdeg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
        # nodes is consumed twice below (count + state build);
        # checkpoint it so later rounds never touch the cache
        nodes = nodes_in.select("node").localCheckpoint(eager=True)
    finally:
        nodes_in.unpersist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_q", F.lit(0).cast("bigint"))
    base = (100 - damping_pct) * scale // 100
    # plan shape: the per-round state carries (node, outdeg, rank_q)
    # hash-partitioned by node, so each round is exactly ONE exchange
    # (the dst-keyed contribution aggregate) —
    #  * outdeg rides the checkpointed state instead of being re-derived
    #    from the edge list twice per round (a groupBy shuffle each time);
    #  * the dangling mass is a bounded 1-row aggregate collected to a
    #    Python int and baked into the update expression as a literal,
    #    replacing the per-round BroadcastExchange+crossJoin (whose build
    #    re-ran the ranks⋈outdeg join a second time per round);
    #  * edges are pre-partitioned by src and the state by node, so the
    #    src-keyed contribution join and the node-keyed update join both
    #    reuse their children's hash partitioning (zero extra exchanges).
    # Arithmetic is unchanged — same recurrence, same integer division —
    # so ranks stay bit-identical to pagerank_sql round by round.
    state = (
        nodes.join(outdeg.hint("shuffle_hash"), "node", "left")
        .withColumn("rank_q", F.lit(scale).cast("bigint"))
        .repartition(w, "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        dang = state.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank_q"), F.lit(0)).alias("_dang")
        ).collect()[0]["_dang"]
        dd = int(dang) // n  # rank_q ≥ 0 always, so floor == SQL DIV
        # shuffled-hash builds (neither join output needs ordering —
        # the aggregate re-hashes and the checkpoint is order-free), so
        # the per-round SMJ sorts of the edge list / state are waste
        contrib = (
            edges.join(
                state.where(F.col("outdeg").isNotNull()).hint("shuffle_hash"),
                edges.src == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank_q DIV outdeg")).alias("_in"))
        )
        state = (
            state.select("node", "outdeg")
            .join(contrib.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                "outdeg",
                F.expr(
                    f"CAST({base} + ({damping_pct} * (COALESCE(_in, 0) "
                    f"+ {dd})) DIV 100 AS BIGINT)"
                ).alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select("node", "rank_q")


def pagerank_sql(
    nodes_src: str,
    edges_src: str,
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin of :func:`pagerank_quantized`: the identical
    integer recurrence unrolled as ``iterations`` chained CTEs,
    generated by the same constants so the two cannot drift.
    ``nodes_src`` must yield one column ``node``; ``edges_src``
    (src, dst).  Standalone statement returning (node, rank_q)."""
    base = (100 - damping_pct) * scale // 100
    ctes = [
        f"pr_nd AS (SELECT node FROM {nodes_src})",
        f"pr_eg AS (SELECT src, dst FROM {edges_src})",
        "pr_odeg AS (SELECT src AS node, COUNT(*) AS outdeg FROM pr_eg GROUP BY 1)",
        "pr_cnt AS (SELECT COUNT(*) AS n FROM pr_nd)",
        f"pr_r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_q FROM pr_nd)",
    ]
    for i in range(1, iterations + 1):
        p = f"pr_r{i - 1}"
        ctes.append(f"""pr_r{i} AS (
            SELECT pr_nd.node,
                   CAST({base} + ({damping_pct} * (COALESCE(c._in, 0)
                        + dg._dang // pr_cnt.n)) // 100 AS BIGINT) AS rank_q
            FROM pr_nd
            LEFT JOIN (
                SELECT pr_eg.dst AS node,
                       SUM(r.rank_q // o.outdeg) AS _in
                FROM pr_eg
                JOIN {p} r ON pr_eg.src = r.node
                JOIN pr_odeg o ON o.node = pr_eg.src
                GROUP BY pr_eg.dst
            ) c ON c.node = pr_nd.node
            CROSS JOIN (
                SELECT COALESCE(SUM(rank_q), 0) AS _dang
                FROM {p} LEFT JOIN pr_odeg USING (node)
                WHERE pr_odeg.outdeg IS NULL
            ) dg
            CROSS JOIN pr_cnt
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank_q FROM pr_r{iterations}"
    )


def link_distance(
    nodes: DataFrame,
    seeds: DataFrame,
    edges: DataFrame,
    rounds: int,
) -> DataFrame:
    """Multi-source BFS hop distance along directed edges — the crawl-
    depth / seed-proximity signal of a link graph (how many hops is a
    page from the trusted seed set?), and the min-plus companion of
    :func:`pagerank_quantized` (reference parity: the same reachability
    role as the reference's referenced-element closure, cascade.rb's
    candidate set walk, re-expressed as bounded relaxation rounds).

    Exact integers end-to-end: dist(v) after round k is THE true
    min-hop distance for every v within k hops (unit weights make
    relaxation monotone), NULL for nodes not yet reached — so a fixed
    ``rounds`` is a hop-radius bound, not an approximation knob, and
    the DuckDB twin (:func:`link_distance_sql`) unrolls the identical
    recurrence and hash-matches every round's quantization-free result.

    Scale design: per round, contributions come only from the FRONTIER
    (nodes whose distance changed last round — with unit weights a
    settled distance never improves, so re-propagating from the whole
    settled set is pure waste); each round is one src-keyed join of the
    pre-partitioned edge list against the frontier plus a dst-keyed
    partial-agg min — 2 shuffles/round, hub fan-out is AQE's skew-join
    case, lineage cut per round (the iterative house pattern).  An
    empty frontier short-circuits the remaining rounds.

    ``nodes``: one column ``node``; ``seeds``: one column ``node``
    (dist 0); ``edges``: (src, dst).  Returns (node, dist) with dist
    NULL when unreached within ``rounds`` hops."""
    edges = edges.select("src", "dst").repartition("src").localCheckpoint(
        eager=True
    )
    seed_marked = nodes.join(
        seeds.select("node").distinct().withColumn("_s", F.lit(1)),
        "node",
        "left",
    )
    dist = seed_marked.select(
        "node",
        F.when(F.col("_s").isNotNull(), F.lit(0)).cast("bigint").alias("dist"),
    ).localCheckpoint(eager=True)
    frontier = dist.where(F.col("dist") == 0).localCheckpoint(eager=True)
    for _ in range(rounds):
        if frontier.isEmpty():
            break
        nd = (
            edges.join(frontier, edges.src == frontier.node)
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("dist") + 1).alias("_nd"))
        )
        relaxed = dist.join(nd, "node", "left").select(
            "node",
            F.when(F.col("dist").isNull(), F.col("_nd"))
            .when(F.col("_nd").isNull(), F.col("dist"))
            .otherwise(F.least("dist", "_nd"))
            .alias("dist"),
        ).localCheckpoint(eager=True)
        frontier = (
            relaxed.alias("r")
            .join(dist.alias("d"), "node")
            .where(F.col("d.dist").isNull() & F.col("r.dist").isNotNull())
            .select("node", F.col("r.dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist = relaxed
    return dist


def link_distance_sql(
    nodes_src: str, seeds_src: str, edges_src: str, rounds: int
) -> str:
    """DuckDB twin of :func:`link_distance`: the identical unit-weight
    relaxation unrolled as ``rounds`` chained CTEs (no frontier
    short-cut — with unit weights the full relaxation computes the
    same fixpoint prefix, which is the point of the twin).  Returns
    (node, dist)."""
    ctes = [
        f"bf_nd AS (SELECT node FROM {nodes_src})",
        f"bf_eg AS (SELECT src, dst FROM {edges_src})",
        f"""bf_d0 AS (
            SELECT bf_nd.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN CAST(0 AS BIGINT) END AS dist
            FROM bf_nd
            LEFT JOIN (SELECT DISTINCT node FROM {seeds_src}) s
              ON s.node = bf_nd.node
        )""",
    ]
    for i in range(1, rounds + 1):
        p = f"bf_d{i - 1}"
        ctes.append(f"""bf_d{i} AS (
            SELECT {p}.node,
                   CASE WHEN {p}.dist IS NULL THEN c._nd
                        WHEN c._nd IS NULL THEN {p}.dist
                        ELSE LEAST({p}.dist, c._nd) END AS dist
            FROM {p}
            LEFT JOIN (
                SELECT bf_eg.dst AS node, MIN(r.dist) + 1 AS _nd
                FROM bf_eg
                JOIN {p} r ON bf_eg.src = r.node
                WHERE r.dist IS NOT NULL
                GROUP BY bf_eg.dst
            ) c ON c.node = {p}.node
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, dist FROM bf_d{rounds}"
    )


LABEL_BOUND = 1 << 20


def label_spread(
    nodes: DataFrame,
    seed_labels: DataFrame,
    edges: DataFrame,
    rounds: int,
    label_bound: int = LABEL_BOUND,
) -> DataFrame:
    """Fixed-round semi-supervised label propagation over a directed
    link graph — spread sparse ground-truth labels (language, topic,
    quality tier) from labeled seed pages to the rest of the corpus:
    each round every unlabeled node adopts the MODE of its in-
    neighbors' current labels, seeds stay clamped.  The webtext use of
    the reference's membership-propagation idea (cascade membership
    walks a reference graph; here the attribute walks the link graph).

    Determinism without floats: the per-node argmax is packed into one
    int64 — ``cnt * label_bound + (label_bound-1-label)`` — so MAX()
    picks highest count, ties broken by LOWEST label, identically in
    Spark and DuckDB; the twin (:func:`label_spread_sql`) unrolls the
    same recurrence and hash-matches every round.  Labels must be ints
    in [0, label_bound); counts must stay < 2⁶³/label_bound (2⁴³ at
    the default — a per-node in-degree bound, not a corpus bound).

    Scale design: per round one src-keyed join of the pre-partitioned
    edge list against current labels + one (dst,label)-keyed partial
    agg + one dst-keyed packed max — hub fan-in is AQE's skew case;
    lineage cut per round.  Synchronous updates (all nodes flip on the
    previous round's state) keep the result independent of partition
    visit order — an asynchronous variant would be schedule-dependent
    and unverifiable.

    ``nodes``: one column ``node``; ``seed_labels``: (node, label);
    ``edges``: (src, dst) — labels flow src→dst.  Returns
    (node, label), NULL when nothing labeled is within ``rounds``
    hops."""
    edges = edges.select("src", "dst").repartition("src").localCheckpoint(
        eager=True
    )
    seeds = seed_labels.select(
        "node", F.col("label").cast("bigint").alias("_seed")
    ).distinct().localCheckpoint(eager=True)
    lab = nodes.join(seeds, "node", "left").select(
        "node", F.col("_seed").alias("label")
    ).localCheckpoint(eager=True)
    b = int(label_bound)
    for _ in range(rounds):
        mode = (
            edges.join(
                lab.where(F.col("label").isNotNull()),
                edges.src == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .groupBy("node")
            .agg(
                F.max(
                    F.col("_cnt") * b + (F.lit(b - 1) - F.col("label"))
                ).alias("_pk")
            )
            .select(
                "node",
                (F.lit(b - 1) - F.col("_pk") % b).alias("_adopt"),
            )
        )
        lab = (
            lab.join(mode, "node", "left")
            .join(seeds, "node", "left")
            .select(
                "node",
                F.coalesce(
                    F.col("_seed"), F.col("_adopt"), F.col("label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return lab


def label_spread_sql(
    nodes_src: str,
    seeds_src: str,
    edges_src: str,
    rounds: int,
    label_bound: int = LABEL_BOUND,
) -> str:
    """DuckDB twin of :func:`label_spread`: identical packed-argmax
    recurrence unrolled as chained CTEs.  Returns (node, label)."""
    b = int(label_bound)
    ctes = [
        f"ls_nd AS (SELECT node FROM {nodes_src})",
        f"ls_eg AS (SELECT src, dst FROM {edges_src})",
        f"ls_sd AS (SELECT DISTINCT node, CAST(label AS BIGINT) AS _seed "
        f"FROM {seeds_src})",
        """ls_l0 AS (
            SELECT ls_nd.node, ls_sd._seed AS label
            FROM ls_nd LEFT JOIN ls_sd USING (node)
        )""",
    ]
    for i in range(1, rounds + 1):
        p = f"ls_l{i - 1}"
        ctes.append(f"""ls_l{i} AS (
            SELECT {p}.node,
                   COALESCE(ls_sd._seed,
                            {b - 1} - m._pk % {b},
                            {p}.label) AS label
            FROM {p}
            LEFT JOIN (
                SELECT node, MAX(_cnt * {b} + ({b - 1} - label)) AS _pk
                FROM (
                    SELECT ls_eg.dst AS node, r.label,
                           COUNT(*) AS _cnt
                    FROM ls_eg
                    JOIN {p} r ON ls_eg.src = r.node
                    WHERE r.label IS NOT NULL
                    GROUP BY ls_eg.dst, r.label
                )
                GROUP BY node
            ) m ON m.node = {p}.node
            LEFT JOIN ls_sd ON ls_sd.node = {p}.node
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, label FROM ls_l{rounds}"
    )




def common_neighbor_pairs(
    edges: DataFrame,
    mode: str,
    min_count: int = 1,
    max_degree: int = 10_000,
) -> DataFrame:
    """Co-citation / bibliographic-coupling pair counts — the classic
    second-order link-similarity signals (Small 1973 / Kessler 1963):
    ``mode='cocitation'`` counts, for each unordered pair (a, b), the
    common IN-neighbors (how many pages cite both — similarity of
    being-referenced-together); ``mode='coupling'`` counts common
    OUT-neighbors (how many references they share).  The engine's
    two-hop graph operator, feeding near-dup candidate generation and
    topical clustering the way minhash bands feed text dedup.

    Scale shape: one self-join of the edge list on the shared
    endpoint, emitting each unordered pair ONCE (dst_a < dst_b), then
    a map-side-combined count — fan-out per shared node is C(d, 2),
    so a hub would quadratically explode the join; the ``max_degree``
    guard computes degrees first (one cheap agg) and FAILS LOUD via
    ``assert_true`` on any node over the cap (house rule: no silent
    caps — a run that would blow up says so; to actually skip hubs,
    pre-filter the edge list yourself and own the decision).

    Returns (id_a, id_b, n_common), id_a < id_b, n_common ≥
    ``min_count``."""
    if mode == "cocitation":
        shared, item = "src", "dst"
    elif mode == "coupling":
        shared, item = "dst", "src"
    else:
        raise ValueError(
            f"mode must be 'cocitation' or 'coupling', got {mode!r}"
        )
    e = edges.select(shared, item)
    deg = e.groupBy(shared).agg(F.count(F.lit(1)).alias("_d"))
    guard = F.assert_true(
        F.col("_d") <= F.lit(int(max_degree)),
        F.lit(
            f"node degree exceeds max_degree={max_degree} in "
            f"common_neighbor_pairs({mode}); pair fan-out is C(d,2) — "
            "pre-filter hub nodes explicitly or raise the cap"
        ),
    )
    # the guard must ride a column the plan actually USES — hung off a
    # pruned column, Catalyst would optimize the assert away entirely
    e = e.join(deg, shared).select(
        shared, F.when(guard.isNull(), F.col(item)).alias(item)
    )
    a = e.select(F.col(shared).alias("_s"), F.col(item).alias("id_a"))
    b = e.select(F.col(shared).alias("_s"), F.col(item).alias("id_b"))
    pairs = a.join(b, "_s").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= int(min_count))
    )


def common_neighbor_pairs_sql(
    edges_src: str, mode: str, min_count: int = 1
) -> str:
    """DuckDB twin of :func:`common_neighbor_pairs` (no degree guard —
    the operator owns the loud failure)."""
    if mode == "cocitation":
        shared, item = "src", "dst"
    elif mode == "coupling":
        shared, item = "dst", "src"
    else:
        raise ValueError(
            f"mode must be 'cocitation' or 'coupling', got {mode!r}"
        )
    return f"""
        SELECT a.{item} AS id_a, b.{item} AS id_b,
               COUNT(*) AS n_common
        FROM {edges_src} a JOIN {edges_src} b
          ON a.{shared} = b.{shared} AND a.{item} < b.{item}
        GROUP BY 1, 2
        HAVING COUNT(*) >= {int(min_count)}
    """


def triangle_counts(
    edges: DataFrame,
    max_degree: int = 10_000,
) -> DataFrame:
    """Per-node triangle participation counts over the UNDIRECTED
    simplification of the link graph — the local clustering signal
    (link farms and template boilerplate rings show up as dense
    triangle clusters; organic link neighborhoods are sparse), the
    standard third graph statistic after degree and components.

    Algorithm: the two-join MR pattern with the degree-ordering trick —
    orient every undirected edge from the LOWER (degree, id) endpoint
    to the higher, so each triangle is counted from exactly one wedge
    and hub-centered wedge fan-out collapses from C(d_hub,2) to
    C(d_eff,2) with d_eff ≤ √(2·|E|) (the classic Suri-Vassilvitskii
    bound); wedges then semi-join the oriented edge list to close.
    The ``max_degree`` guard (post-orientation, riding a used column —
    the Catalyst lesson from common_neighbor_pairs) still fails LOUD
    on pathological skew.

    Returns (node, n_triangles) for every node in ≥ 1 triangle."""
    fwd = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ranked = (
        sym.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "deg_s")
        .join(
            deg.select(F.col("node").alias("dst"),
                       F.col("deg").alias("deg_d")),
            "dst",
        )
    )
    oriented = ranked.where(
        (F.col("deg_s") < F.col("deg_d"))
        | ((F.col("deg_s") == F.col("deg_d")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", "deg_s")
    guard = F.assert_true(
        F.col("deg_s") <= F.lit(int(max_degree)),
        F.lit(
            f"effective degree exceeds max_degree={max_degree} in "
            "triangle_counts; pre-filter hubs explicitly or raise the cap"
        ),
    )
    oriented = oriented.select(
        F.when(guard.isNull(), F.col("src")).alias("src"), "dst"
    ).localCheckpoint(eager=True)
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    closed = wedges.join(
        oriented.select(
            F.col("src").alias("a"), F.col("dst").alias("c")
        ),
        ["a", "c"],
    )
    per_node = (
        closed.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def triangle_counts_sql(edges_src: str) -> str:
    """DuckDB twin of :func:`triangle_counts` — same degree-ordered
    orientation, wedge close, and per-node explode."""
    return f"""
        WITH tr_sym AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM {edges_src} WHERE src <> dst
                UNION ALL
                SELECT dst AS src, src AS dst FROM {edges_src}
                WHERE src <> dst
            )
        ),
        tr_deg AS (
            SELECT src AS node, COUNT(*) AS deg FROM tr_sym GROUP BY 1
        ),
        tr_or AS MATERIALIZED (
            SELECT s.src, s.dst
            FROM tr_sym s
            JOIN tr_deg a ON a.node = s.src
            JOIN tr_deg b ON b.node = s.dst
            WHERE a.deg < b.deg OR (a.deg = b.deg AND s.src < s.dst)
        ),
        tr_tri AS (
            SELECT w.a, w.b, w.c
            FROM (
                SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                FROM tr_or e1 JOIN tr_or e2 ON e1.dst = e2.src
            ) w
            JOIN tr_or e3 ON e3.src = w.a AND e3.dst = w.c
        )
        SELECT node, COUNT(*) AS n_triangles
        FROM (
            SELECT a AS node FROM tr_tri
            UNION ALL SELECT b FROM tr_tri
            UNION ALL SELECT c FROM tr_tri
        )
        GROUP BY node
    """


def kcore(
    nodes: DataFrame,
    edges: DataFrame,
    k: int,
    max_rounds: int = 16,
) -> DataFrame:
    """k-core extraction over the undirected simplification: the
    maximal subgraph where every node keeps degree ≥ k, found by
    iterative peeling (drop under-degree nodes, recompute, repeat) —
    the dense-region detector of link analysis (link farms and
    boilerplate navigation rings survive high-k cores; organic pages
    fall out), completing the density toolkit beside
    :func:`triangle_counts` and the components machinery.

    Peeling is ORDER-INDEPENDENT (removing any under-degree node can
    only lower other degrees, so the fixpoint is unique) — which is
    what makes the operator deterministic and twin-verifiable: the
    DuckDB twin (:func:`kcore_sql`) unrolls the same peel a fixed
    ``max_rounds`` times, and once the Spark side reaches the
    fixpoint (empty peel set → short-circuit, the BFS pattern) extra
    unrolled rounds are no-ops, so the two agree whenever peeling
    converged.  Non-convergence within ``max_rounds`` raises (the
    min_label_components contract: never return silently-wrong
    cores); rounds needed is the degeneracy-peel depth, ≤ longest
    chain of cascading removals, typically ≪ 16 on web graphs.

    Scale: per round one degree aggregate + one semi-join on the
    surviving set — 2 shuffles, map-side combined, lineage cut per
    round.  Returns (node, degree) for the surviving core."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")
    base = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        base.unionByName(
            base.select(F.col("dst").alias("src"),
                        F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = nodes.select("node").distinct().localCheckpoint(eager=True)
    for _ in range(max_rounds):
        e_alive = sym.join(
            alive.select(F.col("node").alias("src")), "src", "left_semi"
        ).join(
            alive.select(F.col("node").alias("dst")), "dst", "left_semi"
        )
        deg = e_alive.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        keep = deg.where(F.col("degree") >= k).select("node", "degree")
        n_keep = keep.count()
        if n_keep == alive.count():
            return keep.localCheckpoint(eager=True)
        alive = keep.select("node").localCheckpoint(eager=True)
        if n_keep == 0:
            return keep
    raise RuntimeError(
        f"kcore(k={k}) did not converge within max_rounds={max_rounds}; "
        "raise max_rounds (needed ≈ peel-cascade depth)"
    )


def kcore_sql(
    nodes_src: str, edges_src: str, k: int, max_rounds: int = 16
) -> str:
    """DuckDB twin of :func:`kcore`: the identical peel unrolled
    ``max_rounds`` times (fixpoint rounds are no-ops)."""
    ctes = [
        f"""kc_sym AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM {edges_src} WHERE src <> dst
                UNION ALL
                SELECT dst AS src, src AS dst FROM {edges_src}
                WHERE src <> dst
            )
        )""",
        f"kc_a0 AS (SELECT DISTINCT node FROM {nodes_src})",
    ]
    for i in range(1, max_rounds + 1):
        p = f"kc_a{i - 1}"
        ctes.append(f"""kc_a{i} AS MATERIALIZED (
            SELECT s.src AS node
            FROM kc_sym s
            JOIN {p} a ON a.node = s.src
            JOIN {p} b ON b.node = s.dst
            GROUP BY s.src
            HAVING COUNT(*) >= {int(k)}
        )""")
    last = f"kc_a{max_rounds}"
    return f"""
        WITH {",".join(ctes)}
        SELECT s.src AS node, COUNT(*) AS degree
        FROM kc_sym s
        JOIN {last} a ON a.node = s.src
        JOIN {last} b ON b.node = s.dst
        GROUP BY s.src
        HAVING COUNT(*) >= {int(k)}
    """


def weighted_distance(
    nodes: DataFrame,
    seeds: DataFrame,
    edges: DataFrame,
    rounds: int,
) -> DataFrame:
    """Bellman–Ford min-plus distance over INTEGER-weighted directed
    edges — the weighted companion of :func:`link_distance` (which is
    the unit-weight special case): shortest *weighted* path from the
    seed set, the cost-to-reach signal for crawl scheduling and
    link-spam damping where hops are not all equal (reference parity:
    the same bounded-closure role as cascade.rb's candidate walk, with
    edge cost generalizing hop count).

    Exact integers end-to-end: after round k, dist(v) is THE true
    min-weight path over all paths of ≤ k EDGES (min-plus relaxation
    is monotone in path length), NULL when no ≤ k-edge path exists —
    ``rounds`` is a path-length bound, not an approximation knob, and
    the DuckDB twin (:func:`weighted_distance_sql`) unrolls the
    identical recurrence so every round's result hash-matches.

    Scale design (the :func:`link_distance` pattern, weight-adapted):
    only the FRONTIER — nodes whose distance IMPROVED last round —
    propagates (any path of ≤ k+1 edges that beats the current dist
    must extend a path that improved at round k, so settled-and-
    unimproved nodes contribute nothing new); per round one src-keyed
    join of the pre-partitioned edge list against the frontier plus a
    dst-keyed partial-agg min — 2 shuffles/round, AQE handles hub
    skew, lineage cut per round, empty frontier short-circuits.
    Unlike the unit-weight case a node can re-enter the frontier
    (a longer-but-cheaper path arrives later) — the improvement test
    handles that naturally.

    ``edges``: (src, dst, w) with BIGINT-castable non-negative ``w``
    (negative weights would still relax correctly round-by-round but
    break the ≤ k-edge optimality reading; they are rejected loudly).
    Returns (node, dist) with dist NULL when unreached within
    ``rounds`` edges."""
    edges = (
        edges.select("src", "dst", F.col("w").cast("bigint").alias("w"))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    n_neg = edges.where(F.col("w") < 0).count()
    if n_neg:
        raise ValueError(
            f"weighted_distance requires non-negative weights; "
            f"found {n_neg} negative-weight edges"
        )
    seed_marked = nodes.join(
        seeds.select("node").distinct().withColumn("_s", F.lit(1)),
        "node",
        "left",
    )
    dist = seed_marked.select(
        "node",
        F.when(F.col("_s").isNotNull(), F.lit(0))
        .cast("bigint")
        .alias("dist"),
    ).localCheckpoint(eager=True)
    frontier = dist.where(F.col("dist") == 0).localCheckpoint(eager=True)
    for _ in range(rounds):
        if frontier.isEmpty():
            break
        nd = (
            edges.join(frontier, edges.src == frontier.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("_nd"))
        )
        relaxed = dist.join(nd, "node", "left").select(
            "node",
            F.when(F.col("dist").isNull(), F.col("_nd"))
            .when(F.col("_nd").isNull(), F.col("dist"))
            .otherwise(F.least("dist", "_nd"))
            .alias("dist"),
        ).localCheckpoint(eager=True)
        frontier = (
            relaxed.alias("r")
            .join(dist.alias("d"), "node")
            .where(
                F.col("r.dist").isNotNull()
                & (
                    F.col("d.dist").isNull()
                    | (F.col("r.dist") < F.col("d.dist"))
                )
            )
            .select("node", F.col("r.dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist = relaxed
    return dist


def weighted_distance_sql(
    nodes_src: str, seeds_src: str, edges_src: str, rounds: int
) -> str:
    """DuckDB twin of :func:`weighted_distance`: the identical
    min-plus relaxation unrolled as ``rounds`` chained CTEs (no
    frontier cut — the full relaxation computes the same ≤ k-edge
    optimum, which is the point of the twin).  Returns (node, dist)."""
    ctes = [
        f"wd_nd AS (SELECT node FROM {nodes_src})",
        f"wd_eg AS (SELECT src, dst, CAST(w AS BIGINT) AS w "
        f"FROM {edges_src})",
        f"""wd_d0 AS (
            SELECT wd_nd.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN CAST(0 AS BIGINT) END AS dist
            FROM wd_nd
            LEFT JOIN (SELECT DISTINCT node FROM {seeds_src}) s
              ON s.node = wd_nd.node
        )""",
    ]
    for i in range(1, rounds + 1):
        p = f"wd_d{i - 1}"
        ctes.append(f"""wd_d{i} AS MATERIALIZED (
            SELECT {p}.node,
                   CASE WHEN {p}.dist IS NULL THEN c._nd
                        WHEN c._nd IS NULL THEN {p}.dist
                        ELSE LEAST({p}.dist, c._nd) END AS dist
            FROM {p}
            LEFT JOIN (
                SELECT wd_eg.dst AS node, MIN(r.dist + wd_eg.w) AS _nd
                FROM wd_eg
                JOIN {p} r ON wd_eg.src = r.node
                WHERE r.dist IS NOT NULL
                GROUP BY wd_eg.dst
            ) c ON c.node = {p}.node
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, dist FROM wd_d{rounds}"
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Global degree assortativity of the undirected simplification —
    Newman's r: the Pearson correlation of endpoint degrees over
    edges.  Positive r = hubs link to hubs (social-style cores),
    negative = hubs link to leaves (web/star topology, the usual
    shape of crawl graphs) — the one-number mixing summary that tells
    a sampler whether degree-stratified negatives are needed.

    Exact-integer throughout, and — the reason this is twin-friendly —
    SQRT-FREE: on the both-directions edge list the two endpoint
    degree distributions are IDENTICAL (every undirected edge
    contributes its degrees once in each role), so Pearson's two
    denominator factors coincide and

        r = (M·Σjk − S1²) / (M·Σj² − S1²),   S1 = Σj over directed
                                              edges, M = their count

    is a plain ratio, evaluated in decimal(38,0) (HUGEINT in the
    twin) with one truncating DIV to ppm.  NULL when the denominator
    is 0 — a degree-regular graph, the statistic's genuine undefined
    case.  Self-loops dropped, parallel edges collapsed (the kcore
    convention).

    Plan: one distinct over the symmetrized edges, one degree
    aggregate, one broadcast of the ≤|V|-row degree table onto both
    endpoints... no: degrees join via TWO hash joins on src/dst (the
    degree table is data-sized; broadcast only when it fits — AQE
    decides), then a single global aggregate.  Output: one row
    (m_directed, s_jk, s_j, s_jj, assort_ppm)."""
    dec = "decimal(38,0)"
    base = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        base.unionByName(
            base.select(F.col("dst").alias("src"),
                        F.col("src").alias("dst"))
        )
        .distinct()
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    jk = (
        sym.join(deg.select(F.col("node").alias("src"),
                            F.col("degree").alias("_j")), "src")
        .join(deg.select(F.col("node").alias("dst"),
                         F.col("degree").alias("_k")), "dst")
    )
    agg = jk.agg(
        F.count(F.lit(1)).alias("m_directed"),
        F.sum(F.expr(f"CAST(_j AS {dec}) * _k")).alias("_sjk"),
        F.sum(F.expr(f"CAST(_j AS {dec})")).alias("_sj"),
        F.sum(F.expr(f"CAST(_j AS {dec}) * _j")).alias("_sjj"),
    )
    return agg.select(
        "m_directed",
        F.col("_sjk").cast("bigint").alias("s_jk"),
        F.col("_sj").cast("bigint").alias("s_j"),
        F.col("_sjj").cast("bigint").alias("s_jj"),
        F.expr(
            f"CAST(CASE WHEN m_directed = 0 OR "
            f"(CAST(m_directed AS {dec}) * _sjj - _sj * _sj) = 0 "
            f"THEN NULL ELSE "
            f"(CAST(m_directed AS {dec}) * _sjk - _sj * _sj) * 1000000 "
            f"DIV (CAST(m_directed AS {dec}) * _sjj - _sj * _sj) "
            f"END AS BIGINT)"
        ).alias("assort_ppm"),
    )


def degree_assortativity_sql(edges_src: str) -> str:
    """DuckDB twin of :func:`degree_assortativity` (da_*-namespaced;
    HUGEINT mirrors decimal(38,0))."""
    return f"""
        WITH da_sym AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM {edges_src} WHERE src <> dst
                UNION ALL
                SELECT dst AS src, src AS dst FROM {edges_src}
                WHERE src <> dst
            )
        ),
        da_deg AS (
            SELECT src AS node, COUNT(*) AS degree
            FROM da_sym GROUP BY src
        ),
        da_jk AS (
            SELECT dj.degree AS j, dk.degree AS k
            FROM da_sym e
            JOIN da_deg dj ON dj.node = e.src
            JOIN da_deg dk ON dk.node = e.dst
        ),
        da_agg AS (
            SELECT COUNT(*) AS m_directed,
                   SUM(CAST(j AS HUGEINT) * k) AS sjk,
                   SUM(CAST(j AS HUGEINT)) AS sj,
                   SUM(CAST(j AS HUGEINT) * j) AS sjj
            FROM da_jk
        )
        SELECT CAST(m_directed AS BIGINT) AS m_directed,
               CAST(sjk AS BIGINT) AS s_jk,
               CAST(sj AS BIGINT) AS s_j,
               CAST(sjj AS BIGINT) AS s_jj,
               CAST(CASE WHEN m_directed = 0
                         OR (m_directed * sjj - sj * sj) = 0 THEN NULL
                    ELSE (m_directed * sjk - sj * sj) * 1000000
                         // (m_directed * sjj - sj * sj)
                    END AS BIGINT) AS assort_ppm
        FROM da_agg
    """


def resource_allocation_pairs(
    edges: DataFrame,
    mode: str = "cocitation",
    min_count: int = 1,
    max_degree: int = 10_000,
    scale: int = 10**6,
) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lü & Zhang 2009):
    score each unordered pair by Σ_w 1/deg(w) over their COMMON
    neighbors w — :func:`common_neighbor_pairs` with each witness
    down-weighted by how promiscuous it is (a shared hub is weak
    evidence, a shared rare node strong).  RA is the LOG-FREE member
    of the Adamic–Adar family (AA's 1/log d needs floats; RA
    outperforms it in the original study and quantizes exactly), so
    it is the engine's portable link-prediction score.

    mode='cocitation' weights a shared citing page w by its
    OUT-degree (w allocates one unit of resource across its
    references); mode='coupling' weights a shared referenced page by
    its IN-degree.  Weights are ``scale`` DIV deg — one floor per
    witness, the pagerank quantization discipline; deg ≥ 1 by
    construction (w has the witnessing edge).

    Scale shape inherited: one self-join on the shared endpoint
    (pair fan C(d,2), loud ``max_degree`` assert riding a used
    column), map-side-combined sum.  Returns (id_a, id_b, n_common,
    ra_m), id_a < id_b, n_common ≥ ``min_count``."""
    if mode == "cocitation":
        shared, item = "src", "dst"
    elif mode == "coupling":
        shared, item = "dst", "src"
    else:
        raise ValueError(
            f"mode must be 'cocitation' or 'coupling', got {mode!r}"
        )
    e = edges.select(shared, item)
    deg = e.groupBy(shared).agg(F.count(F.lit(1)).alias("_d"))
    guard = F.assert_true(
        F.col("_d") <= F.lit(int(max_degree)),
        F.lit(
            f"node degree exceeds max_degree={max_degree} in "
            "resource_allocation_pairs; pair fan-out is C(d,2) — "
            "pre-filter hub nodes explicitly or raise the cap"
        ),
    )
    w = F.expr(f"CAST({int(scale)} DIV _d AS BIGINT)")
    e = e.join(deg, shared).select(
        shared,
        F.when(guard.isNull(), F.col(item)).alias(item),
        w.alias("_w"),
    )
    a = e.select(
        F.col(shared).alias("_s"), F.col(item).alias("id_a"), "_w"
    )
    b = e.select(F.col(shared).alias("_s"), F.col(item).alias("id_b"))
    pairs = a.join(b, "_s").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("_w").alias("ra_m"),
        )
        .where(F.col("n_common") >= int(min_count))
    )


def resource_allocation_sql(
    edges_src: str,
    mode: str = "cocitation",
    min_count: int = 1,
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`resource_allocation_pairs` (no degree
    guard — the operator owns the loud failure)."""
    if mode == "cocitation":
        shared, item = "src", "dst"
    elif mode == "coupling":
        shared, item = "dst", "src"
    else:
        raise ValueError(
            f"mode must be 'cocitation' or 'coupling', got {mode!r}"
        )
    return f"""
        WITH ra_e AS (
            SELECT {shared} AS s, {item} AS it FROM {edges_src}
        ),
        ra_deg AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS d
            FROM ra_e GROUP BY 1
        ),
        ra_w AS (
            SELECT e.s, e.it, CAST({int(scale)} // g.d AS BIGINT) AS w
            FROM ra_e e JOIN ra_deg g USING (s)
        )
        SELECT a.it AS id_a, b.it AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(a.w) AS BIGINT) AS ra_m
        FROM ra_w a JOIN ra_w b ON a.s = b.s AND a.it < b.it
        GROUP BY 1, 2
        HAVING COUNT(*) >= {int(min_count)}
    """


# ---------------------------------------------------------------------------
# deterministic negative sampling (link-prediction training pairs)
# ---------------------------------------------------------------------------

def negative_edge_samples(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 3,
    n_probes: int = 12,
    n_buckets: int = 256,
    max_bucket_rows: int = 50_000_000,
) -> DataFrame:
    """Deterministic negative-edge sampling — the training-pair
    generator every link-prediction / graph-embedding job needs
    (positives are the observed edges; negatives must be sampled
    uniformly from NON-edges, reproducibly, at graph scale):

    for each distinct source, probe the node universe with the house
    polynomial hash — probe i lands on the node whose DENSE HASH RANK
    is token_hash(src ∥ '#' ∥ i) mod n — drop self-loops and observed
    edges (anti-join), deduplicate probe collisions onto the earliest
    probe, keep the first ``k`` survivors in probe order.  Every step
    is pure arithmetic on (src, i): reruns, re-partitionings and both
    engines produce byte-identical samples (no RNG state, no
    ``rand()``).

    A source may yield FEWER than k negatives when probes exhaust
    (dense sources in tiny graphs); emit what survived rather than
    silently re-probing unboundedly — callers needing exactly k raise
    ``n_probes`` (the fan is explicit, the house no-silent-caps rule).

    Physical plan: the dense 0..n−1 node index uses the exact
    TWO-LEVEL rank (value-bucket histogram + prefix + bucket-local
    row_number — rtree's machinery, never a global window); probes
    explode ×n_probes off the distinct-source list; one equi-join
    maps probe ranks to nodes, one anti-join removes observed edges;
    the final top-k is a src-keyed window.  Nothing is
    corpus-global except the bounded node count.

    Returns (src, neg_dst, probe, rk ∈ [1, k])."""
    from pyspark.sql import Window as W

    from .dedup import TOKEN_HASH_MOD, token_hash
    from .rtree import _two_level_rank

    if k < 1 or n_probes < k:
        raise ValueError(
            f"need n_probes >= k >= 1, got k={k} n_probes={n_probes}"
        )
    base = nodes.select("node").distinct()
    nidx = _two_level_rank(
        base.withColumn("_h", token_hash(F.col("node").cast("string"))),
        [],
        "_h",
        "node",
        0,
        TOKEN_HASH_MOD - 1,
        n_buckets,
        max_bucket_rows,
        "_rk",
    ).select(
        F.col("node").alias("neg_dst"), (F.col("_rk") - 1).alias("_idx")
    )
    n = base.count()
    srcs = edges.select("src").distinct()
    if n == 0:
        return (
            srcs.select(
                "src",
                F.col("src").alias("neg_dst"),
                F.lit(1).alias("probe"),
                F.lit(1).alias("rk"),
            ).limit(0)
        )
    probes = srcs.select(
        "src",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(n_probes)))
        ).alias("probe"),
    ).withColumn(
        "_pi",
        token_hash(
            F.concat(
                F.col("src").cast("string"),
                F.lit("#"),
                F.col("probe").cast("string"),
            )
        )
        % F.lit(n),
    )
    cand = (
        probes.join(nidx, probes["_pi"] == nidx["_idx"])
        .select("src", "probe", "neg_dst")
        .where(F.col("neg_dst") != F.col("src"))
        .join(
            edges.select("src", F.col("dst").alias("neg_dst")),
            ["src", "neg_dst"],
            "left_anti",
        )
    )
    first = cand.groupBy("src", "neg_dst").agg(
        F.min("probe").alias("probe")
    )
    w = W.partitionBy("src").orderBy("probe")
    return (
        first.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def negative_edge_samples_sql(
    nodes_src: str,
    edges_src: str,
    k: int = 3,
    n_probes: int = 12,
) -> str:
    """DuckDB twin of :func:`negative_edge_samples` — the dense rank
    is a plain global window here (single-node oracle), structurally
    different from the engine's two-level rank, so the rank
    construction itself is hash-verified.  ``nodes_src`` exposes
    (node), ``edges_src`` (src, dst)."""
    from .dedup import token_hash_sql

    h_node = token_hash_sql("CAST(node AS VARCHAR)")
    h_probe = token_hash_sql(
        "CAST(s.src AS VARCHAR) || '#' || CAST(g.probe AS VARCHAR)"
    )
    return f"""
        WITH ns_nodes AS (
            SELECT DISTINCT node FROM {nodes_src}
        ),
        ns_idx AS (
            SELECT node AS neg_dst,
                   ROW_NUMBER() OVER (ORDER BY {h_node}, node) - 1
                       AS idx
            FROM ns_nodes
        ),
        ns_n AS (SELECT COUNT(*) AS n FROM ns_nodes),
        ns_src AS (SELECT DISTINCT src FROM {edges_src}),
        ns_probes AS (
            SELECT s.src, g.probe, {h_probe} % t.n AS pi
            FROM ns_src s
            CROSS JOIN ns_n t,
            LATERAL (SELECT UNNEST(range(1, {int(n_probes)} + 1))
                     AS probe) g
        ),
        ns_cand AS (
            SELECT p.src, p.probe, i.neg_dst
            FROM ns_probes p JOIN ns_idx i ON i.idx = p.pi
            WHERE i.neg_dst <> p.src
        ),
        ns_anti AS (
            SELECT c.src, c.probe, c.neg_dst
            FROM ns_cand c
            LEFT JOIN {edges_src} e
              ON e.src = c.src AND e.dst = c.neg_dst
            WHERE e.src IS NULL
        ),
        ns_first AS (
            SELECT src, neg_dst, MIN(probe) AS probe
            FROM ns_anti GROUP BY 1, 2
        )
        SELECT src, neg_dst, probe, rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY src ORDER BY probe) AS rk
            FROM ns_first
        ) ranked
        WHERE rk <= {int(k)}
    """


def clustering_coeff(
    edges: DataFrame,
    max_degree: int = 10_000,
) -> DataFrame:
    """Local clustering coefficient per node over the undirected
    simplification of the link graph — :func:`triangle_counts`
    normalized by each node's wedge count:

        coeff = 2·T(v) / (deg(v)·(deg(v)−1))

    the probability that two random neighbors of v link each other.
    High coefficient + high degree is the link-farm / boilerplate-ring
    fingerprint that raw triangle counts can't separate from organic
    hubs (a hub in many triangles may still have near-zero density).

    Exact arithmetic: coeff_ppm = (2·T·10⁶) DIV (deg·(deg−1)) in
    int64 (T < deg² ≤ 10⁸ at the guarded max_degree, ·2·10⁶ well
    under 2⁶³); deg < 2 → NULL (no wedge exists — the statistic's
    genuine undefined case, not 0).  Every node of the edge list gets
    a row; T = 0 where no triangle closes.

    Plan: the degree agg and the triangle pipeline share one
    symmetrized edge list; triangles use the degree-ordered wedge
    close (Suri–Vassilvitskii bound, LOUD max_degree guard) — the
    join back to degrees is on the |V|-sized aggregate, never the
    wedge stream.  Output: (node, deg, n_triangles, coeff_ppm)."""
    fwd = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    tri = triangle_counts(edges, max_degree=max_degree)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.expr(
                "CASE WHEN deg < 2 THEN NULL ELSE "
                "(COALESCE(n_triangles, 0) * 2 * 1000000) "
                "DIV (deg * (deg - 1)) END"
            ).alias("coeff_ppm"),
        )
    )


def clustering_coeff_sql(edges_src: str) -> str:
    """DuckDB twin of :func:`clustering_coeff` — triangle CTE chain +
    degree normalization (standalone statement)."""
    return f"""
        WITH cc_sym AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM {edges_src} WHERE src <> dst
                UNION ALL
                SELECT dst AS src, src AS dst FROM {edges_src}
                WHERE src <> dst
            )
        ),
        cc_deg AS (
            SELECT src AS node, COUNT(*) AS deg FROM cc_sym GROUP BY 1
        ),
        cc_or AS MATERIALIZED (
            SELECT s.src, s.dst
            FROM cc_sym s
            JOIN cc_deg a ON a.node = s.src
            JOIN cc_deg b ON b.node = s.dst
            WHERE a.deg < b.deg OR (a.deg = b.deg AND s.src < s.dst)
        ),
        cc_tri AS (
            SELECT w.a, w.b, w.c
            FROM (
                SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                FROM cc_or e1 JOIN cc_or e2 ON e1.dst = e2.src
            ) w
            JOIN cc_or e3 ON e3.src = w.a AND e3.dst = w.c
        ),
        cc_cnt AS (
            SELECT node, COUNT(*) AS n_triangles
            FROM (
                SELECT a AS node FROM cc_tri
                UNION ALL SELECT b FROM cc_tri
                UNION ALL SELECT c FROM cc_tri
            )
            GROUP BY node
        )
        SELECT d.node,
               CAST(d.deg AS BIGINT) AS deg,
               CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
               CAST(CASE WHEN d.deg < 2 THEN NULL ELSE
                    (COALESCE(t.n_triangles, 0) * 2 * 1000000)
                    // (d.deg * (d.deg - 1)) END AS BIGINT) AS coeff_ppm
        FROM cc_deg d LEFT JOIN cc_cnt t USING (node)
    """


def components_sql(nodes_src: str, edges_src: str) -> str:
    """DuckDB oracle for :func:`min_label_components` over the
    undirected simplification of a DIRECTED edge list (``src``,
    ``dst``) — deliberately a different algorithm family: a recursive
    transitive-closure walk (one hop per recursion step, UNION-dedup
    fixpoint) instead of the operator's min-label pointer doubling, so
    the driver verifies the doubling shortcut itself, not a re-run of
    it.

    The step keeps only labels smaller than the receiving node
    (``r.lbl < e.dst``): the component minimum m is by definition
    smaller than EVERY other member, so the pair (v, m) survives along
    any path while non-minimal label traffic is halved.  Worst-case
    intermediate is O(|component|²/2) pairs — an oracle-scale cost,
    which is exactly why the distributed side uses doubling instead.
    Returns (node, label)."""
    return f"""
        WITH RECURSIVE cp_nd AS (SELECT node FROM {nodes_src}),
        cp_eg AS (
            SELECT src, dst FROM (
                SELECT src, dst FROM {edges_src} WHERE src <> dst
                UNION
                SELECT dst AS src, src AS dst FROM {edges_src}
                WHERE src <> dst
            )
        ),
        cp_reach(node, lbl) AS (
            SELECT node, node AS lbl FROM cp_nd
            UNION
            SELECT e.dst AS node, r.lbl
            FROM cp_reach r
            JOIN cp_eg e ON e.src = r.node
            WHERE r.lbl < e.dst
        )
        SELECT node, MIN(lbl) AS label FROM cp_reach GROUP BY node
    """


HITS_SCALE = 10**9


def hits_quantized(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 8,
    scale: int = HITS_SCALE,
) -> DataFrame:
    """Fixed-iteration HITS (hubs & authorities) in EXACT quantized-
    integer arithmetic — the directional complement of
    :func:`pagerank_quantized`: PageRank scores endorsement mass,
    HITS separates the two link roles a web corpus actually has
    (directory/hub pages that POINT at good content vs the content
    pages BEING pointed at), the signal a crawl curator uses to keep
    authorities and down-weight link directories.

    Float HITS L2-normalizes per round (sqrt — engine-divergent);
    here each round L1-normalizes both vectors to total mass
    n·``scale`` with truncating division, so every score is an int64
    multiple of 1/scale and any fixed round count is bit-identical
    across engines (the DuckDB twin :func:`hits_sql` unrolls the same
    recurrence from the same constants).  Per round, from hubs h:

        a_raw(v) = Σ_{u→v} h(u);   A = Σ_v a_raw(v)
        a(v)     = (a_raw(v) · n·scale) DIV A          (0 if A = 0)
        h_raw(v) = Σ_{v→u} a(u);   H = Σ_v h_raw(v)
        h(v)     = (h_raw(v) · n·scale) DIV H          (0 if H = 0)

    h₀ = scale everywhere.  L1 (not L2) normalization preserves the
    fixed-point RATIOS HITS ranks by — the principal eigenvector is
    scale-free, only the norm choice differs — while staying in
    integers; truncation loses < 1/scale of relative mass per node
    per round (same bounded-floor argument as PageRank's).

    Overflow bounds (documented, checked by construction): every
    normalized score ≤ n·scale, every raw sum ≤ n·scale (int64 needs
    n·scale < 2⁶³), the normalization product ≤ (n·scale)² held in
    decimal(38,0)/HUGEINT (needs n·scale < 10¹⁹ — same bound), and
    the totals A, H ≤ n·scale·outdeg_max are summed in decimal(38,0)
    so only the PER-NODE bound constrains int64.  At 10⁹ nodes drop
    ``scale`` to 10⁹⁻ᵏ exactly as PageRank documents.

    Scale design: per round two src/dst-keyed joins of the
    PRE-PARTITIONED edge list + two partial-agg groupBys (4 shuffles
    × fixed rounds); the totals are 1-row broadcast cross joins; hub
    fan-in is AQE's skew-join case; lineage cut per round
    (localCheckpoint, the iterative house pattern).

    ``nodes``: one column ``node``; ``edges``: (src, dst), assumed
    deduplicated.  Returns (node, auth_q, hub_q)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    edges = edges.select("src", "dst").repartition("src").localCheckpoint(
        eager=True
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("auth_q"),
            F.lit(0).cast("bigint").alias("hub_q"),
        )
    dec = "decimal(38,0)"
    norm = (
        f"CASE WHEN _tot = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST((CAST(COALESCE(_raw, 0) AS {dec}) * {n} * {scale}) "
        f"DIV _tot AS BIGINT) END"
    )
    hubs = nodes.withColumn("hub_q", F.lit(scale).cast("bigint"))
    auth = None
    for _ in range(iterations):
        a_raw = (
            edges.join(hubs, edges.src == hubs.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_q").alias("_raw"))
        )
        a_tot = a_raw.agg(
            F.coalesce(
                F.sum(F.col("_raw").cast(dec)), F.lit(0).cast(dec)
            ).alias("_tot")
        )
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_tot))
            .select("node", F.expr(norm).alias("auth_q"))
            .localCheckpoint(eager=True)
        )
        h_raw = (
            edges.join(auth, edges.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_q").alias("_raw"))
        )
        h_tot = h_raw.agg(
            F.coalesce(
                F.sum(F.col("_raw").cast(dec)), F.lit(0).cast(dec)
            ).alias("_tot")
        )
        hubs = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_tot))
            .select("node", F.expr(norm).alias("hub_q"))
            .localCheckpoint(eager=True)
        )
    return auth.join(hubs, "node")


def hits_sql(
    nodes_src: str,
    edges_src: str,
    iterations: int = 8,
    scale: int = HITS_SCALE,
) -> str:
    """DuckDB twin of :func:`hits_quantized`: the identical quantized
    recurrence unrolled as chained CTEs from the same constants (the
    pagerank_sql pattern).  Every per-round CTE is MATERIALIZED —
    each is referenced twice (raw join + total), so without it the
    optimizer re-inlines the whole prefix per reference and the plan
    grows exponentially in ``iterations`` (measured ~30× per round).
    ``nodes_src`` yields one column ``node``; ``edges_src``
    (src, dst).  Standalone statement returning
    (node, auth_q, hub_q)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    ctes = [
        f"hx_nd AS (SELECT node FROM {nodes_src})",
        f"hx_eg AS MATERIALIZED (SELECT src, dst FROM {edges_src})",
        "hx_cnt AS (SELECT COUNT(*) AS n FROM hx_nd)",
        f"hx_h0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) "
        "AS hub_q FROM hx_nd)",
    ]

    def _norm(raw_cte: str, out_col: str) -> str:
        return f"""MATERIALIZED (
            SELECT nd.node,
                   CAST(CASE WHEN tt.tot = 0 THEN 0
                        ELSE (CAST(COALESCE(ar.raw, 0) AS HUGEINT)
                              * ct.n * {scale}) // tt.tot
                        END AS BIGINT) AS {out_col}
            FROM hx_nd nd
            LEFT JOIN {raw_cte} ar USING (node)
            CROSS JOIN (
                SELECT COALESCE(SUM(CAST(raw AS HUGEINT)), 0) AS tot
                FROM {raw_cte}
            ) tt
            CROSS JOIN hx_cnt ct
        )"""

    for i in range(1, iterations + 1):
        ctes.append(
            f"hx_ar{i} AS MATERIALIZED "
            f"(SELECT e.dst AS node, SUM(h.hub_q) AS raw "
            f"FROM hx_eg e JOIN hx_h{i - 1} h ON e.src = h.node "
            f"GROUP BY e.dst)"
        )
        ctes.append(f"hx_a{i} AS {_norm(f'hx_ar{i}', 'auth_q')}")
        ctes.append(
            f"hx_hr{i} AS MATERIALIZED "
            f"(SELECT e.src AS node, SUM(a.auth_q) AS raw "
            f"FROM hx_eg e JOIN hx_a{i} a ON e.dst = a.node "
            f"GROUP BY e.src)"
        )
        ctes.append(f"hx_h{i} AS {_norm(f'hx_hr{i}', 'hub_q')}")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.node, a.auth_q, h.hub_q "
        f"FROM hx_a{iterations} a JOIN hx_h{iterations} h USING (node)"
    )


def neighbor_jaccard_pairs(
    edges: DataFrame,
    min_common: int = 1,
    max_degree: int = 10_000,
) -> DataFrame:
    """Neighborhood-Jaccard link prediction over the undirected
    simplification — score each candidate pair by |Γ(a)∩Γ(b)| /
    |Γ(a)∪Γ(b)| in exact ppm: the set-overlap member of the
    link-prediction family (:func:`resource_allocation_pairs` weights
    witnesses by rarity; Jaccard normalizes by BOTH endpoints' total
    degree, so a hub sharing 3 of its 10⁴ neighbors scores near zero
    where RA still accumulates).  Candidates are pairs with ≥
    ``min_common`` common neighbors — exactly the pairs the wedge fan
    emits, so "no common neighbor → score 0" costs nothing.

    Exact arithmetic: jac_ppm = (n_common·10⁶) DIV
    (deg_a + deg_b − n_common); all counts int64 over the DISTINCT
    symmetrized edge list (self-loops excluded — the assortativity
    lesson).

    Plan: one distinct symmetrization shuffle; the wedge self-join on
    the shared neighbor fans C(d,2) per node — LOUD ``max_degree``
    assert riding the emitted neighbor column (the
    resource_allocation discipline: pre-filter hubs explicitly or
    raise the cap, never silently); the degree join back runs on the
    |candidate-pair| aggregate.  Returns (id_a, id_b, n_common,
    deg_a, deg_b, jac_ppm), id_a < id_b."""
    fwd = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    guard = F.assert_true(
        F.col("deg") <= F.lit(int(max_degree)),
        F.lit(
            f"node degree exceeds max_degree={max_degree} in "
            "neighbor_jaccard_pairs; wedge fan-out is C(d,2) — "
            "pre-filter hub nodes explicitly or raise the cap"
        ),
    )
    by_nbr = sym.join(
        deg.withColumnRenamed("node", "src"), "src"
    ).select(
        F.col("src").alias("_w"),
        F.when(guard.isNull(), F.col("dst")).alias("_id"),
    )
    a = by_nbr.select(F.col("_w"), F.col("_id").alias("id_a"))
    b = by_nbr.select(F.col("_w"), F.col("_id").alias("id_b"))
    common = (
        a.join(b, "_w")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= int(min_common))
    )
    return (
        common.join(
            deg.select(F.col("node").alias("id_a"),
                       F.col("deg").alias("deg_a")), "id_a"
        )
        .join(
            deg.select(F.col("node").alias("id_b"),
                       F.col("deg").alias("deg_b")), "id_b"
        )
        .select(
            "id_a", "id_b", "n_common", "deg_a", "deg_b",
            F.expr(
                "CAST((n_common * 1000000) "
                "DIV (deg_a + deg_b - n_common) AS BIGINT)"
            ).alias("jac_ppm"),
        )
    )


def neighbor_jaccard_sql(edges_src: str, min_common: int = 1) -> str:
    """DuckDB twin of :func:`neighbor_jaccard_pairs` (standalone;
    nj_* namespaced; no degree guard — the operator owns the loud
    failure)."""
    return f"""
        WITH nj_sym AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM {edges_src} WHERE src <> dst
                UNION ALL
                SELECT dst AS src, src AS dst FROM {edges_src}
                WHERE src <> dst
            )
        ),
        nj_deg AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM nj_sym GROUP BY 1
        ),
        nj_common AS (
            SELECT a.dst AS id_a, b.dst AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM nj_sym a JOIN nj_sym b
              ON a.src = b.src AND a.dst < b.dst
            GROUP BY 1, 2
            HAVING COUNT(*) >= {int(min_common)}
        )
        SELECT c.id_a, c.id_b, c.n_common,
               da.deg AS deg_a, db.deg AS deg_b,
               CAST((c.n_common * 1000000)
                    // (da.deg + db.deg - c.n_common) AS BIGINT)
                   AS jac_ppm
        FROM nj_common c
        JOIN nj_deg da ON da.node = c.id_a
        JOIN nj_deg db ON db.node = c.id_b
    """


def ppr_quantized(
    nodes: DataFrame,
    seeds: DataFrame,
    edges: DataFrame,
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Personalized PageRank in the same EXACT quantized-integer
    arithmetic as :func:`pagerank_quantized`, with the restart mass
    (and the dangling re-injection) routed to a SEED SET instead of
    uniformly — relevance-to-these-pages authority: rank the crawl
    frontier from known-good hubs, expand a topic corpus from a seed
    list, score "how reachable from the trusted set" per document.

    Recurrence (d = damping_pct, S = seeds, quantum 1/scale):

        r'(v) = [v∈S]·((100−d)·scale DIV 100)
              + d·( Σ_{u→v} r(u) DIV outdeg(u)
                    + [v∈S]·(dangling DIV |S|) ) DIV 100

    with r₀ = scale on seeds, 0 elsewhere — total mass ≤ |S|·scale,
    so the overflow bound is |S|·scale < 2⁶³ (LOOSER than global
    PageRank's n·scale: PPR scales to graphs where uniform restart
    would overflow).  Integer division quantizes identically across
    engines; the oracle (:func:`ppr_sql`) unrolls the same recurrence.

    Plan: identical to pagerank_quantized (2 shuffles/round on the
    pre-partitioned edges, 1-row dangling broadcast, per-round
    localCheckpoint) plus one broadcast seed-flag join per round —
    the seed table is small by definition.  The only driver action
    is the bounded |S| count.  ``seeds``: one column ``node`` (must
    be non-empty and a subset of nodes).  Returns (node, rank_q)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100]: {damping_pct}")
    edges = edges.select("src", "dst").repartition("src").localCheckpoint(
        eager=True
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    seed_flag = seeds.select("node").distinct().withColumn(
        "_seed", F.lit(True)
    ).localCheckpoint(eager=True)
    n_s = seed_flag.count()
    if n_s == 0:
        raise ValueError("ppr_quantized: empty seed set")
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.join(F.broadcast(seed_flag), "node", "left").select(
        "node",
        F.when(F.col("_seed"), F.lit(scale))
        .otherwise(F.lit(0)).cast("bigint").alias("rank_q"),
    )
    for _ in range(iterations):
        with_deg = ranks.join(outdeg, "node", "left")
        dangling = (
            with_deg.where(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).alias("_dang"))
        )
        contrib = (
            edges.join(
                with_deg.where(F.col("outdeg").isNotNull()),
                edges.src == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank_q DIV outdeg")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(seed_flag), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(
                    f"CAST(CASE WHEN _seed THEN {base} ELSE 0 END "
                    f"+ ({damping_pct} * (COALESCE(_in, 0) "
                    f"+ CASE WHEN _seed THEN _dang DIV {n_s} "
                    f"ELSE 0 END)) DIV 100 AS BIGINT)"
                ).alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def ppr_sql(
    nodes_src: str,
    seeds_src: str,
    edges_src: str,
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin of :func:`ppr_quantized`: the identical seeded
    integer recurrence unrolled as chained CTEs (the pagerank_sql
    pattern; dangling + seed-count CTEs per round).  ``seeds_src``
    must yield one column ``node``.  Standalone statement."""
    base = (100 - damping_pct) * scale // 100
    ctes = [
        f"pp_nd AS (SELECT node FROM {nodes_src})",
        f"pp_sd AS (SELECT DISTINCT node FROM {seeds_src})",
        f"pp_eg AS (SELECT src, dst FROM {edges_src})",
        "pp_odeg AS (SELECT src AS node, COUNT(*) AS outdeg "
        "FROM pp_eg GROUP BY 1)",
        "pp_ns AS (SELECT COUNT(*) AS ns FROM pp_sd)",
        f"""pp_r0 AS (
            SELECT pp_nd.node,
                   CAST(CASE WHEN pp_sd.node IS NOT NULL
                        THEN {scale} ELSE 0 END AS BIGINT) AS rank_q
            FROM pp_nd LEFT JOIN pp_sd ON pp_sd.node = pp_nd.node
        )""",
    ]
    for i in range(1, iterations + 1):
        p = f"pp_r{i - 1}"
        ctes.append(f"""pp_r{i} AS (
            SELECT pp_nd.node,
                   CAST(CASE WHEN pp_sd.node IS NOT NULL
                             THEN {base} ELSE 0 END
                        + ({damping_pct} * (COALESCE(c._in, 0)
                           + CASE WHEN pp_sd.node IS NOT NULL
                                  THEN dg._dang // pp_ns.ns
                                  ELSE 0 END)) // 100
                        AS BIGINT) AS rank_q
            FROM pp_nd
            LEFT JOIN pp_sd ON pp_sd.node = pp_nd.node
            LEFT JOIN (
                SELECT pp_eg.dst AS node,
                       SUM(r.rank_q // o.outdeg) AS _in
                FROM pp_eg
                JOIN {p} r ON pp_eg.src = r.node
                JOIN pp_odeg o ON o.node = pp_eg.src
                GROUP BY pp_eg.dst
            ) c ON c.node = pp_nd.node
            CROSS JOIN (
                SELECT COALESCE(SUM(rank_q), 0) AS _dang
                FROM {p} LEFT JOIN pp_odeg USING (node)
                WHERE pp_odeg.outdeg IS NULL
            ) dg
            CROSS JOIN pp_ns
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank_q FROM pp_r{iterations}"
    )


# ---------------------------------------------------------------------------
# redirect-chain resolution (functional graph with cycles)
# ---------------------------------------------------------------------------

def redirect_resolve(
    nodes: DataFrame,
    edges: DataFrame,
    op_name: str = "redirect_resolve",
) -> DataFrame:
    """Resolve HTTP-redirect chains to their canonical terminal — the
    crawl-normalization step a Common-Crawl-style corpus needs before
    any url-keyed dedup or lineage join (the reference keys every
    element history on a stable id; a crawl's "stable id" is the url
    AFTER its 301/302 chain is followed, change_bot.rb's candidate
    keying re-expressed for web pages).

    Input: ``nodes`` (one column ``id`` — the urls to resolve) and
    ``edges`` (``src``, ``dst``) with AT MOST one outgoing redirect
    per src (a functional graph; duplicate srcs fail loud).  A node
    with no outgoing edge is canonical (terminal), including
    off-corpus targets that appear only as ``dst``.

    Algorithm: pointer doubling with hop accumulation — state
    (id, p, s) starts at p = redirect target (s = 1) or self
    (terminal, s = 0); each round composes p ← p∘p, s ← s + s[p],
    covering 2^k hops after k rounds, so ⌈log₂ |V|⌉ + 1 rounds
    saturate every acyclic chain (tail length < |V| by pigeonhole).
    Nodes whose pointer still rests on a NON-terminal after that are
    on (or drain into) a redirect LOOP: canonical/hops are NULL and
    ``is_cycle`` is true — exactly the curl-style "max redirects
    exceeded" verdict, but decided exactly rather than by budget.

    Plan per round: ONE self-equi-join on the pointer + a round-end
    lineage cut (localCheckpoint — the basin_label/min_label house
    pattern); terminals self-loop with s = 0, so saturated rows pass
    through composition unchanged.  No driver collect; the only
    driver-side value is the vertex count that fixes the round
    budget.  The DuckDB twin (:func:`redirect_resolve_sql`) WALKS
    one hop per recursion step, so the doubling shortcut itself is
    hash-verified against the definitional walk.

    Returns (id, canonical, hops, is_cycle)."""
    ids = nodes.select("id")
    e = edges.select("src", "dst")
    # loud functional-graph guard: >1 outgoing edge per src would make
    # "the" redirect target ambiguous — refuse rather than pick one
    dup = (
        e.groupBy("src").count().where(F.col("count") > 1)
    )
    if not dup.isEmpty():
        raise ValueError(
            f"{op_name}: multiple outgoing redirects for at least one "
            "src — the redirect map must be functional (dedupe or "
            "resolve the conflict upstream)"
        )
    universe = (
        ids.unionByName(e.select(F.col("src").alias("id")))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = universe.count()
    state = (
        universe.join(e, universe["id"] == e["src"], "left")
        .select(
            "id",
            F.coalesce("dst", F.col("id")).alias("_p"),
            F.when(F.col("dst").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("bigint")
            .alias("_s"),
        )
        .localCheckpoint(eager=True)
    )
    terminals = state.where(F.col("_s") == 0).select(
        F.col("id").alias("_t")
    )
    rounds = max(1, int(n - 1).bit_length())
    for _ in range(rounds):
        live = state.join(
            terminals, state["_p"] == F.col("_t"), "left_anti"
        )
        if live.isEmpty():
            break
        jump = state.select(
            F.col("id").alias("_jid"),
            F.col("_p").alias("_jp"),
            F.col("_s").alias("_js"),
        )
        state = (
            state.join(jump, state["_p"] == F.col("_jid"))
            .select(
                "id",
                F.col("_jp").alias("_p"),
                (F.col("_s") + F.col("_js")).alias("_s"),
            )
            .localCheckpoint(eager=True)
        )
    resolved = state.join(
        terminals, state["_p"] == F.col("_t"), "left"
    ).select(
        "id",
        F.when(F.col("_t").isNotNull(), F.col("_p")).alias("canonical"),
        F.when(F.col("_t").isNotNull(), F.col("_s")).alias("hops"),
        F.col("_t").isNull().alias("is_cycle"),
    )
    return ids.join(resolved, "id")


def redirect_resolve_sql(nodes_src: str, edges_src: str) -> str:
    """DuckDB twin of :func:`redirect_resolve` — the definitional
    one-hop recursive walk (vs the engine's doubling), bounded by the
    vertex count so redirect loops terminate the recursion instead of
    spinning; a walk that never lands on a terminal IS the cycle
    verdict."""
    return f"""
        WITH RECURSIVE
        rr_ids AS (SELECT id FROM {nodes_src}),
        rr_eg AS (SELECT src, dst FROM {edges_src}),
        rr_uni AS (
            -- explicit DISTINCT over UNION ALL: inside WITH RECURSIVE
            -- DuckDB gives a plain chained UNION the recursive-union
            -- append semantics and does NOT fully dedupe (measured)
            SELECT DISTINCT id FROM (
                SELECT id FROM rr_ids
                UNION ALL SELECT src FROM rr_eg
                UNION ALL SELECT dst FROM rr_eg
            )
        ),
        rr_n AS (SELECT COUNT(*) AS n FROM rr_uni),
        rr_walk AS (
            SELECT id, id AS cur, CAST(0 AS BIGINT) AS hops
            FROM rr_uni
            UNION ALL
            SELECT w.id, e.dst AS cur, w.hops + 1 AS hops
            FROM rr_walk w
            JOIN rr_eg e ON e.src = w.cur
            WHERE w.hops < (SELECT n FROM rr_n)
        ),
        rr_done AS (
            SELECT w.id, w.cur AS canonical, w.hops
            FROM rr_walk w
            WHERE NOT EXISTS (
                SELECT 1 FROM rr_eg e WHERE e.src = w.cur
            )
        )
        SELECT i.id, d.canonical, d.hops,
               d.id IS NULL AS is_cycle
        FROM rr_ids i LEFT JOIN rr_done d ON d.id = i.id
    """


def modularity(
    labels: DataFrame,
    edges: DataFrame,
) -> DataFrame:
    """Newman modularity of a given node partition, exact — the
    community-quality score that grades ANY labeling the engine
    produces (connected components, label_spread, a lang/domain
    attribute) against the degree-preserving null model:

        Q = Σ_c [ e_c/m − (deg_c / 2m)² ]

    computed entirely in the A²-cleared integer form (A = 2m = arc
    count of the symmetrized graph, a_c = 2e_c = intra-community
    arcs):  q_num_c = A·a_c − deg_c², with Q·A² = Σ_c q_num_c.
    Products ride decimal(38)/HUGEINT (A ≤ 2·10¹² arcs exact);
    q_ppm_c = (q_num_c · 10⁶) / A² uses SIGN-DECOMPOSED truncating
    division (q_num_c < 0 is real — a community sparser than the
    null model; DuckDB ``//`` floors, Spark DIV truncates, they agree
    only on non-negatives — the cohen_kappa house pattern).

    Edge convention (the triangle_counts one): self-loops dropped,
    both orientations unioned and deduplicated, so callers may pass
    either directed or undirected edge lists.  Every edge endpoint
    MUST carry a label: an unlabeled endpoint raises LOUDLY (riding
    the used intra-arc flag — an inner join would silently drop the
    arc and understate deg_c).  An edgeless graph (A = 0) leaves Q
    undefined → q_ppm NULL on every community.

    Plan: one symmetrize-distinct, two label hash-joins on the arc
    list, three partial-agg groupBys, 1-row broadcast totals —
    linear in |E|, nothing quadratic, nothing collected.

    Returns one row per community:
    (label, n_nodes, deg_sum, e_in, q_ppm)."""
    lab = labels.select("node", "label")
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    arcs = (
        sym.join(
            lab.select(
                F.col("node").alias("src"), F.col("label").alias("lsrc")
            ),
            "src",
            "left",
        )
        .join(
            lab.select(
                F.col("node").alias("dst"), F.col("label").alias("ldst")
            ),
            "dst",
            "left",
        )
        .select(
            "src",
            F.when(
                F.col("lsrc").isNull() | F.col("ldst").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("modularity: unlabeled edge endpoint "),
                        F.col("src").cast("string"),
                        F.lit("->"),
                        F.col("dst").cast("string"),
                    )
                ).cast("boolean"),
            )
            .otherwise(F.col("lsrc") == F.col("ldst"))
            .alias("intra"),
            F.col("lsrc").alias("label"),
        )
    )
    a_tot = arcs.agg(F.count(F.lit(1)).cast("long").alias("_a"))
    deg_c = arcs.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("deg_sum"),
        F.sum(F.col("intra").cast("long")).cast("long").alias("a_in"),
    )
    n_nodes = lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    dec = "decimal(38,0)"
    num = (
        f"(CAST(_a AS {dec}) * COALESCE(a_in, 0) "
        f"- CAST(COALESCE(deg_sum, 0) AS {dec}) "
        f"* COALESCE(deg_sum, 0))"
    )
    den = f"(CAST(_a AS {dec}) * _a)"
    return (
        n_nodes.join(deg_c, "label", "left")
        .crossJoin(F.broadcast(a_tot))
        .select(
            "label",
            "n_nodes",
            F.coalesce(F.col("deg_sum"), F.lit(0))
            .cast("long")
            .alias("deg_sum"),
            F.expr("CAST(COALESCE(a_in, 0) DIV 2 AS BIGINT)").alias(
                "e_in"
            ),
            F.expr(
                f"CAST(CASE WHEN _a = 0 THEN NULL "
                f"WHEN {num} < 0 THEN "
                f"-((-{num} * 1000000) DIV {den}) "
                f"ELSE ({num} * 1000000) DIV {den} "
                f"END AS BIGINT)"
            ).alias("q_ppm"),
        )
    )


def modularity_sql(labels_src: str, edges_src: str) -> str:
    """DuckDB twin of :func:`modularity` — same symmetrization,
    A²-cleared integer form, sign-decomposed flooring-safe division.
    Standalone."""
    return f"""
        WITH mq_sym AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM {edges_src} WHERE src <> dst
                UNION ALL
                SELECT dst AS src, src AS dst FROM {edges_src}
                WHERE src <> dst
            )
        ),
        mq_lab AS (SELECT node, label FROM {labels_src}),
        mq_arc AS (
            SELECT ls.label AS label,
                   CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END
                       AS intra
            FROM mq_sym s
            JOIN mq_lab ls ON ls.node = s.src
            JOIN mq_lab ld ON ld.node = s.dst
        ),
        mq_a AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS a FROM mq_arc
        ),
        mq_deg AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS deg_sum,
                   CAST(SUM(intra) AS BIGINT) AS a_in
            FROM mq_arc GROUP BY 1
        ),
        mq_n AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM mq_lab GROUP BY 1
        ),
        mq_q AS (
            SELECT n.label, n.n_nodes,
                   COALESCE(d.deg_sum, 0) AS deg_sum,
                   COALESCE(d.a_in, 0) AS a_in,
                   (CAST(t.a AS HUGEINT) * COALESCE(d.a_in, 0)
                    - CAST(COALESCE(d.deg_sum, 0) AS HUGEINT)
                      * COALESCE(d.deg_sum, 0)) AS q_num,
                   CAST(t.a AS HUGEINT) * t.a AS q_den,
                   t.a AS a
            FROM mq_n n
            LEFT JOIN mq_deg d USING (label)
            CROSS JOIN mq_a t
        )
        SELECT label, n_nodes, deg_sum,
               CAST(a_in // 2 AS BIGINT) AS e_in,
               CAST(CASE WHEN a = 0 THEN NULL
                    WHEN q_num < 0 THEN
                        -((-q_num * 1000000) // q_den)
                    ELSE (q_num * 1000000) // q_den
               END AS BIGINT) AS q_ppm
        FROM mq_q
    """


def scc_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_peels: int = 16,
    max_hops: int = 64,
    op_name: str = "scc_components",
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph — the
    structure pass undirected components can't replace on a web
    corpus: mutual-reachability cores (link rings, mirror farms,
    template circular-nav clusters) vs one-way citation tails, and the
    condensation order any incremental recrawl scheduler needs.

    Forward–backward min-label PEELING (the hash-min building block of
    Pregel-style SCC), never a transitive closure:

      per peel round, over the still-active subgraph,
        F(v) = min node id forward-reachable from v,
        B(v) = min node id that reaches v,
      each computed by FRONTIER-ONLY min-label relaxation: only nodes
      whose label improved last round send along the (reversed) edges,
      so a round's shuffle is proportional to the improvement
      frontier, not the graph.  A node with F(v) = B(v) = m has m
      reachable from v AND v reachable from m, i.e. v ∈ SCC(m), and
      membership is decided EXACTLY (labels only ever carry real
      reachability witnesses).  Finalized nodes leave; the loop
      repeats on the residue.

    Rounds per relaxation = the distance min labels travel — the
    active subgraph's diameter (web graphs: tens), NOT log n; pointer
    jumping is deliberately absent because it is UNSOUND as an
    accelerator here: f[f] only leapfrogs along improvement gradients,
    and a directed cycle with ids running against the edges (the
    64-ring test) degrades it to 1 hop/round anyway — transitive-
    closure doubling would fix the round count but explodes to
    closure-sized intermediates on a giant SCC.  The budget is LOUD:
    ``max_hops`` exhaustion raises rather than risk a split SCC (an
    unconverged F is a valid witness but possibly non-canonical — two
    members could finalize under different reps).

    Progress per peel is guaranteed: the active minimum m has
    F(m) = B(m) = m (every label ≥ m), so SCC(m) — and any SCC whose
    own minimum dominates both its reach sets — finalizes each round;
    worst case is the condensation's chain length (adversarial id
    order), bounded LOUDLY by ``max_peels``.  Neither failure mode can
    return wrong rows.

    Self-loops and duplicate edges are harmless; edges touching nodes
    outside ``nodes`` are dropped (the vertex set is the contract).
    One localCheckpoint per relax round and per peel bounds lineage.

    Input: ``nodes`` (node), ``edges`` (src, dst).  Output: one row
    per node (node, scc, scc_size) where scc is the component's
    minimum node id."""
    def _minreach(active, eg, fwd: bool, peel: int):
        s, d = ("src", "dst") if fwd else ("dst", "src")
        lab = active.select(
            "node", F.col("node").alias("f")
        ).localCheckpoint(eager=True)
        frontier = lab
        for _ in range(max_hops):
            msgs = (
                eg.join(
                    frontier.withColumnRenamed("node", d),
                    d,
                )
                .groupBy(s)
                .agg(F.min("f").alias("nf"))
            )
            improved = (
                lab.join(msgs.withColumnRenamed(s, "node"), "node")
                .where(F.col("nf") < F.col("f"))
                .select("node", F.col("nf").alias("f"))
                .localCheckpoint(eager=True)
            )
            if improved.isEmpty():
                return lab
            lab = (
                lab.join(
                    improved.select(
                        "node", F.col("f").alias("_if")
                    ),
                    "node",
                    "left",
                )
                .select(
                    "node",
                    F.least(
                        F.col("f"), F.coalesce("_if", F.col("f"))
                    ).alias("f"),
                )
                .localCheckpoint(eager=True)
            )
            frontier = improved
        raise ValueError(
            f"{op_name}: min-label relaxation did not converge within "
            f"max_hops={max_hops} (peel {peel}, "
            f"{'forward' if fwd else 'backward'}); raise max_hops "
            "(rounds needed ~ the active subgraph's diameter)"
        )

    active = nodes.select("node").distinct().localCheckpoint(eager=True)
    done_parts = []
    for peel in range(max_peels):
        if active.isEmpty():
            break
        eg = (
            edges.select("src", "dst")
            .join(active.select(F.col("node").alias("src")), "src", "semi")
            .join(active.select(F.col("node").alias("dst")), "dst", "semi")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        fw = _minreach(active, eg, True, peel)
        bw = _minreach(active, eg, False, peel)
        done = (
            fw.join(
                bw.select("node", F.col("f").alias("b")), "node"
            )
            .where(F.col("f") == F.col("b"))
            .select("node", F.col("f").alias("scc"))
            .localCheckpoint(eager=True)
        )
        done_parts.append(done)
        active = active.join(done, "node", "anti").localCheckpoint(
            eager=True
        )
    else:
        if not active.isEmpty():
            raise ValueError(
                f"{op_name}: peeling did not exhaust the graph within "
                f"max_peels={max_peels}; raise max_peels (rounds "
                "needed ~ the condensation chain length)"
            )
    if not done_parts:  # empty vertex set
        return nodes.select(
            "node",
            F.col("node").alias("scc"),
            F.lit(1).cast("bigint").alias("scc_size"),
        ).where(F.lit(False))
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    sizes = out.groupBy("scc").agg(
        F.count(F.lit(1)).cast("bigint").alias("scc_size")
    )
    return out.join(F.broadcast(sizes), "scc").select(
        "node", "scc", "scc_size"
    )


def scc_sql(nodes_src: str, edges_src: str) -> str:
    """DuckDB oracle for :func:`scc_components` — deliberately a
    different algorithm family: the full recursive transitive closure
    (one hop per recursion step, UNION-dedup fixpoint), then
    rep(v) = MIN over the mutual pairs closure ⋈ closureᵀ.  O(n·reach)
    intermediates — an oracle-scale cost, which is exactly why the
    distributed side peels with frontier min labels instead.
    Standalone statement."""
    return f"""
        WITH RECURSIVE
        scc_nd AS (SELECT DISTINCT node FROM {nodes_src}),
        scc_eg AS (
            SELECT DISTINCT e.src, e.dst FROM {edges_src} e
            JOIN scc_nd a ON a.node = e.src
            JOIN scc_nd b ON b.node = e.dst
            WHERE e.src <> e.dst
        ),
        scc_fw(a, b) AS (
            SELECT node, node FROM scc_nd
            UNION
            SELECT f.a, e.dst FROM scc_fw f
            JOIN scc_eg e ON e.src = f.b
        ),
        scc_rep AS (
            SELECT f.a AS node, MIN(f.b) AS scc
            FROM scc_fw f
            JOIN scc_fw g ON g.a = f.b AND g.b = f.a
            GROUP BY 1
        )
        SELECT node, scc,
               CAST(COUNT(*) OVER (PARTITION BY scc) AS BIGINT)
                   AS scc_size
        FROM scc_rep
    """


def ktruss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 8,
) -> DataFrame:
    """k-truss extraction over the undirected simplification: the
    maximal subgraph where every EDGE closes ≥ k−2 triangles within
    the subgraph — the edge-level strengthening of :func:`kcore`
    (a k-core keeps well-connected NODES; a truss keeps edges whose
    endpoints share witnesses, so loosely-attached spokes of a hub
    fall away and what survives is genuinely cohesive community
    structure — the standard link-farm/community core detector).

    Peeling is ORDER-INDEPENDENT (dropping an under-supported edge
    only lowers other supports; the fixpoint is unique), so the
    operator is deterministic and twin-verifiable: the DuckDB twin
    unrolls the identical peel ``max_rounds`` times; fixpoint rounds
    are no-ops.  Non-convergence raises (the kcore contract — never
    a silently-wrong truss).

    Per round, support counting is the Suri–Vassilvitskii oriented
    two-join re-run on the SURVIVING edges: recompute degrees, orient
    every edge from the lower (deg, id) endpoint so a hub's wedge fan
    collapses from C(d_hub,2) to C(d_eff,2) with d_eff ≤ √(2|E|);
    wedges close against the canonical edge list; each triangle then
    fans support to its THREE canonical edges (one explode).  Three
    shuffles per round (degree agg, wedge join, support agg), lineage
    cut per round, empty/fixpoint short-circuit.

    Returns surviving canonical edges (src < dst) with their final
    in-truss ``support``."""
    if k < 3:
        raise ValueError(f"k must be ≥ 3 for a k-truss: {k}")
    fwd = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    cur = (
        fwd.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cur = cur.count()
    for _ in range(max_rounds):
        if n_cur == 0:
            return cur.withColumn("support", F.lit(0).cast("long"))
        sym = cur.unionByName(
            cur.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"))
        )
        deg = sym.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        oriented = (
            sym.join(deg.select(F.col("node").alias("src"),
                                F.col("deg").alias("deg_s")), "src")
            .join(deg.select(F.col("node").alias("dst"),
                             F.col("deg").alias("deg_d")), "dst")
            .where(
                (F.col("deg_s") < F.col("deg_d"))
                | ((F.col("deg_s") == F.col("deg_d"))
                   & (F.col("src") < F.col("dst")))
            )
            .select("src", "dst", "deg_d")
        )
        o2 = oriented.select(
            F.col("src").alias("src"),
            F.col("dst").alias("dst2"),
            F.col("deg_d").alias("deg_d2"),
        )
        wedges = (
            oriented.join(o2, on="src")
            .where(
                (F.col("deg_d") < F.col("deg_d2"))
                | ((F.col("deg_d") == F.col("deg_d2"))
                   & (F.col("dst") < F.col("dst2")))
            )
            .select(
                F.col("src").alias("a"),
                F.col("dst").alias("b"),
                F.col("dst2").alias("c"),
            )
        )
        tri = wedges.join(
            cur.select(
                F.least("src", "dst").alias("_bu"),
                F.greatest("src", "dst").alias("_bv"),
            ),
            (F.least("b", "c") == F.col("_bu"))
            & (F.greatest("b", "c") == F.col("_bv")),
            "left_semi",
        )
        support = (
            tri.select(F.array(
                F.struct(F.least("a", "b").alias("u"),
                         F.greatest("a", "b").alias("v")),
                F.struct(F.least("a", "c").alias("u"),
                         F.greatest("a", "c").alias("v")),
                F.struct(F.least("b", "c").alias("u"),
                         F.greatest("b", "c").alias("v")),
            ).alias("_es"))
            .select(F.explode("_es").alias("e"))
            .groupBy(F.col("e.u").alias("src"),
                     F.col("e.v").alias("dst"))
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
        )
        keep = support.where(F.col("support") >= k - 2)
        n_keep = keep.count()
        if n_keep == n_cur:
            return keep.localCheckpoint(eager=True)
        cur = keep.select("src", "dst").localCheckpoint(eager=True)
        n_cur = n_keep
        if n_cur == 0:
            return cur.withColumn("support", F.lit(0).cast("long"))
    raise RuntimeError(
        f"ktruss(k={k}) did not converge within max_rounds="
        f"{max_rounds}; raise max_rounds (needed ≈ peel depth)"
    )


def ktruss_sql(edges_src: str, k: int, max_rounds: int = 8) -> str:
    """DuckDB twin of :func:`ktruss`: the identical degree-oriented
    support peel unrolled ``max_rounds`` times (fixpoint rounds are
    no-ops).  Standalone; kt_*-namespaced CTEs."""
    if k < 3:
        raise ValueError(f"k must be ≥ 3 for a k-truss: {k}")
    ctes = [
        f"""kt_e0 AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS src,
                   GREATEST(src, dst) AS dst
            FROM {edges_src} WHERE src <> dst
        )"""
    ]
    for i in range(1, max_rounds + 1):
        p = f"kt_e{i - 1}"
        ctes.append(f"""kt_e{i} AS MATERIALIZED (
            WITH sym AS (
                SELECT src, dst FROM {p}
                UNION ALL SELECT dst, src FROM {p}
            ),
            deg AS (
                SELECT src AS node, COUNT(*) AS deg
                FROM sym GROUP BY 1
            ),
            ori AS (
                SELECT s.src, s.dst, dd.deg AS deg_d
                FROM sym s
                JOIN deg ds ON ds.node = s.src
                JOIN deg dd ON dd.node = s.dst
                WHERE ds.deg < dd.deg
                   OR (ds.deg = dd.deg AND s.src < s.dst)
            ),
            tri AS (
                SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
                FROM ori o1
                JOIN ori o2 ON o2.src = o1.src
                 AND (o1.deg_d < o2.deg_d
                      OR (o1.deg_d = o2.deg_d AND o1.dst < o2.dst))
                WHERE EXISTS (
                    SELECT 1 FROM {p} e
                    WHERE e.src = LEAST(o1.dst, o2.dst)
                      AND e.dst = GREATEST(o1.dst, o2.dst)
                )
            ),
            sup AS (
                SELECT u AS src, v AS dst, COUNT(*) AS support
                FROM (
                    SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v
                    FROM tri
                    UNION ALL
                    SELECT LEAST(a, c), GREATEST(a, c) FROM tri
                    UNION ALL
                    SELECT LEAST(b, c), GREATEST(b, c) FROM tri
                ) GROUP BY 1, 2
            )
            SELECT src, dst FROM sup WHERE support >= {int(k) - 2}
        )""")
    last = f"kt_e{max_rounds}"
    return f"""
        WITH {",".join(ctes)},
        kt_sym AS (
            SELECT src, dst FROM {last}
            UNION ALL SELECT dst, src FROM {last}
        ),
        kt_deg AS (
            SELECT src AS node, COUNT(*) AS deg
            FROM kt_sym GROUP BY 1
        ),
        kt_ori AS (
            SELECT s.src, s.dst, dd.deg AS deg_d
            FROM kt_sym s
            JOIN kt_deg ds ON ds.node = s.src
            JOIN kt_deg dd ON dd.node = s.dst
            WHERE ds.deg < dd.deg
               OR (ds.deg = dd.deg AND s.src < s.dst)
        ),
        kt_tri AS (
            SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
            FROM kt_ori o1
            JOIN kt_ori o2 ON o2.src = o1.src
             AND (o1.deg_d < o2.deg_d
                  OR (o1.deg_d = o2.deg_d AND o1.dst < o2.dst))
            WHERE EXISTS (
                SELECT 1 FROM {last} e
                WHERE e.src = LEAST(o1.dst, o2.dst)
                  AND e.dst = GREATEST(o1.dst, o2.dst)
            )
        )
        SELECT u AS src, v AS dst,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM (
            SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM kt_tri
            UNION ALL
            SELECT LEAST(a, c), GREATEST(a, c) FROM kt_tri
            UNION ALL
            SELECT LEAST(b, c), GREATEST(b, c) FROM kt_tri
        ) GROUP BY 1, 2
        HAVING COUNT(*) >= {int(k) - 2}
    """


def dag_levels(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int,
) -> DataFrame:
    """Longest-path depth (DAG level) per node within a hop budget —
    the MAX-plus dual of :func:`link_distance` and the scheduling
    readout of a dependency/citation graph: level(v) = length of the
    longest edge chain ENDING at v, the earliest stage at which v can
    run when every edge is a happens-before.

    Bounded-rounds contract (the link_distance convention, inverted
    for max-plus): after R rounds the reported level is THE exact
    longest-chain length for every node whose longest chain is ≤ R;
    a node still improvable at round R+1 — deeper than R, or on/below
    a CYCLE, where "level" is undefined — reports NULL, never a
    wrong number.  (Max-plus can't settle early the way min-plus
    does, so the one extra probe round is what buys the honest NULL.)

    Scale design mirrors link_distance: frontier-only propagation
    (only nodes whose level rose last round can raise a successor),
    pre-partitioned edges, 2 shuffles/round, per-round lineage cuts,
    empty-frontier short-circuit (then every level is exact and no
    NULLs exist).

    ``nodes``: one column ``node``; ``edges``: (src, dst) directed.
    Returns (node, level) with level NULL when the longest chain
    exceeds ``rounds`` (or a cycle feeds the node)."""
    edges = edges.select("src", "dst").repartition("src").localCheckpoint(
        eager=True
    )
    lvl = nodes.select(
        "node", F.lit(0).cast("bigint").alias("level")
    ).localCheckpoint(eager=True)
    frontier = lvl
    exhausted = False
    for _ in range(rounds):
        if frontier.isEmpty():
            exhausted = True
            break
        cand = (
            edges.join(frontier, edges.src == frontier.node)
            .groupBy(F.col("dst").alias("node"))
            .agg((F.max("level") + 1).alias("_nl"))
        )
        relaxed = lvl.join(cand, "node", "left").select(
            "node",
            F.greatest(
                F.col("level"), F.coalesce(F.col("_nl"), F.col("level"))
            ).alias("level"),
        ).localCheckpoint(eager=True)
        frontier = (
            relaxed.alias("r")
            .join(lvl.alias("l"), "node")
            .where(F.col("r.level") > F.col("l.level"))
            .select("node", F.col("r.level").alias("level"))
            .localCheckpoint(eager=True)
        )
        lvl = relaxed
    if exhausted or frontier.isEmpty():
        return lvl
    # probe round: anything still improvable is deeper than the
    # budget (or cycle-fed) — NULL, never a wrong level
    probe = (
        edges.join(frontier, edges.src == frontier.node)
        .groupBy(F.col("dst").alias("node"))
        .agg((F.max("level") + 1).alias("_nl"))
    )
    return (
        lvl.join(probe, "node", "left")
        .select(
            "node",
            F.when(
                F.col("_nl").isNotNull()
                & (F.col("_nl") > F.col("level")),
                F.lit(None).cast("bigint"),
            )
            .otherwise(F.col("level"))
            .alias("level"),
        )
    )


def dag_levels_sql(
    nodes_src: str, edges_src: str, rounds: int
) -> str:
    """DuckDB twin of :func:`dag_levels` — bounded recursive chain
    enumeration (node, depth ≤ rounds+1) UNION-deduped, then max per
    node with depth = rounds+1 collapsing to NULL.  A different
    execution shape from the operator's frontier relaxation (chain
    enumeration vs level propagation), so the relaxation is what
    gets verified.  Standalone."""
    r1 = int(rounds) + 1
    return f"""
        WITH RECURSIVE dl_chain(node, d) AS (
            SELECT node, 0 AS d FROM {nodes_src}
            UNION
            SELECT e.dst AS node, c.d + 1 AS d
            FROM dl_chain c JOIN {edges_src} e ON e.src = c.node
            WHERE c.d < {r1}
        )
        SELECT node,
               CASE WHEN MAX(d) > {int(rounds)} THEN NULL
                    ELSE CAST(MAX(d) AS BIGINT) END AS level
        FROM dl_chain GROUP BY node
    """


def link_graph_profile(
    nodes: DataFrame,
    edges: DataFrame,
) -> DataFrame:
    """One-row structural profile of a directed graph — the pre-flight
    audit the graph family's iterative operators deserve (the
    :func:`~..operators.profile.column_profile` of link tables):
    before spending rounds on PageRank or components, know the shape —
    edge count, self-loop count, duplicate-edge count, reciprocity
    (both directions present), source/sink counts, isolate count, and
    max in/out degree (the skew number that decides salting).

    Exact definitions (stated): n_dup_edges counts rows beyond the
    first per (src, dst); self-loops are counted separately and
    EXCLUDED from reciprocity (a self-loop is trivially its own
    reverse); reciprocity_ppm = (10⁶ · |distinct pairs with both
    directions|·2) DIV |distinct non-loop edges| — the fraction of
    directed edges whose reverse exists; sources/sinks/isolates are
    judged against the NODE table (an id that never appears in edges
    is an isolate, not invisible).

    Plan: one (src, dst) dedup aggregation, one hash-join for
    reciprocity (canonical u<v pair counts — never a second pass over
    raw edges), two degree aggregations joined to nodes. Output is
    ONE row; every aggregate is map-side partial.

    Returns (n_nodes, n_edges, n_self_loops, n_dup_edges,
    n_distinct_edges, reciprocity_ppm, n_sources, n_sinks,
    n_isolates, max_out_deg, max_in_deg)."""
    e = edges.select("src", "dst")
    dedup = e.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("_m")
    ).localCheckpoint(eager=True)
    base = dedup.agg(
        F.sum("_m").cast("bigint").alias("n_edges"),
        F.sum(F.col("_m") - 1).cast("bigint").alias("n_dup_edges"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_edges"),
        F.sum(F.when(F.col("src") == F.col("dst"), F.col("_m"))
              .otherwise(0)).cast("bigint").alias("n_self_loops"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0))
        .cast("bigint").alias("n_distinct_loops"),
    )
    # reciprocity over distinct non-loop edges: canonical pair counts
    pairs = (
        dedup.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("_dirs"))
        .agg(
            F.sum(F.when(F.col("_dirs") == 2, 1).otherwise(0))
            .cast("bigint").alias("n_recip_pairs")
        )
    )
    outd = dedup.groupBy("src").agg(F.sum("_m").alias("_od"))
    ind = dedup.groupBy("dst").agg(F.sum("_m").alias("_id"))
    nd = (
        nodes.select("node")
        .join(outd, nodes.node == outd.src, "left")
        .join(ind, nodes.node == ind.dst, "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(
                F.when(
                    F.col("_od").isNull() & F.col("_id").isNotNull(), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_sinks"),
            F.sum(
                F.when(
                    F.col("_id").isNull() & F.col("_od").isNotNull(), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_sources"),
            F.sum(
                F.when(
                    F.col("_id").isNull() & F.col("_od").isNull(), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_isolates"),
            F.max(F.coalesce("_od", F.lit(0))).cast("bigint")
            .alias("max_out_deg"),
            F.max(F.coalesce("_id", F.lit(0))).cast("bigint")
            .alias("max_in_deg"),
        )
    )
    out = base.crossJoin(pairs).crossJoin(nd)
    return out.select(
        "n_nodes", "n_edges", "n_self_loops", "n_dup_edges",
        "n_distinct_edges",
        F.expr(
            "CAST(CASE WHEN n_distinct_edges - n_distinct_loops = 0 "
            "THEN NULL ELSE (n_recip_pairs * 2 * 1000000) "
            "DIV (n_distinct_edges - n_distinct_loops) END AS BIGINT)"
        ).alias("reciprocity_ppm"),
        "n_sources", "n_sinks", "n_isolates",
        "max_out_deg", "max_in_deg",
    )


def link_graph_profile_sql(nodes_src: str, edges_src: str) -> str:
    """DuckDB twin of :func:`link_graph_profile` — identical
    definitions, one row.  Standalone."""
    return f"""
        WITH gp_dedup AS (
            SELECT src, dst, COUNT(*) AS m
            FROM (SELECT src, dst FROM {edges_src}) GROUP BY 1, 2
        ),
        gp_base AS (
            SELECT CAST(SUM(m) AS BIGINT) AS n_edges,
                   CAST(SUM(m - 1) AS BIGINT) AS n_dup_edges,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_edges,
                   CAST(COALESCE(SUM(CASE WHEN src = dst THEN m END),
                        0) AS BIGINT) AS n_self_loops,
                   CAST(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_distinct_loops
            FROM gp_dedup
        ),
        gp_recip AS (
            SELECT CAST(COALESCE(SUM(CASE WHEN dirs = 2 THEN 1 END),
                        0) AS BIGINT) AS n_recip_pairs
            FROM (
                SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v,
                       COUNT(*) AS dirs
                FROM gp_dedup WHERE src <> dst GROUP BY 1, 2
            )
        ),
        gp_out AS (
            SELECT src, SUM(m) AS od FROM gp_dedup GROUP BY 1
        ),
        gp_in AS (
            SELECT dst, SUM(m) AS idg FROM gp_dedup GROUP BY 1
        ),
        gp_nodes AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(CASE WHEN o.od IS NULL
                                  AND i.idg IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sinks,
                   CAST(SUM(CASE WHEN i.idg IS NULL
                                  AND o.od IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sources,
                   CAST(SUM(CASE WHEN i.idg IS NULL AND o.od IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_isolates,
                   CAST(MAX(COALESCE(o.od, 0)) AS BIGINT)
                       AS max_out_deg,
                   CAST(MAX(COALESCE(i.idg, 0)) AS BIGINT)
                       AS max_in_deg
            FROM {nodes_src} n
            LEFT JOIN gp_out o ON o.src = n.node
            LEFT JOIN gp_in i ON i.dst = n.node
        )
        SELECT n_nodes, n_edges, n_self_loops, n_dup_edges,
               n_distinct_edges,
               CAST(CASE WHEN n_distinct_edges - n_distinct_loops = 0
                 THEN NULL
                 ELSE (n_recip_pairs * 2 * 1000000)
                      // (n_distinct_edges - n_distinct_loops)
               END AS BIGINT) AS reciprocity_ppm,
               n_sources, n_sinks, n_isolates,
               max_out_deg, max_in_deg
        FROM gp_base, gp_recip, gp_nodes
    """


# per-round Katz cap: values past this fail LOUDLY before int64
# arithmetic can wrap (wrap point 2⁶³; the cap leaves 2⁸ headroom per
# round, i.e. safe while attenuation·max_indegree ≤ 256 — far past
# any α anyone would run)
KATZ_CAP = 1 << 55


def katz_quantized(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 6,
    atten_num: int = 5,
    atten_den: int = 100,
    scale: int = 10**9,
) -> DataFrame:
    """Fixed-iteration Katz centrality in EXACT quantized-integer
    arithmetic — the attenuated-path-count authority score.  Distinct
    from :func:`pagerank_quantized` by construction, not parameterage:
    PageRank SPLITS a node's mass across its out-links (outdegree
    division + dangling redistribution), Katz DOESN'T — every in-link
    delivers its source's full attenuated score, so a hub with many
    links amplifies rather than dilutes.  The truncation of
    x = Σ_k α^k·(Aᵀ)^k·1 at k = ``iterations``:

        x₀(v) = scale
        x'(v) = scale + (atten_num · Σ_{u→v} x(u)) DIV atten_den

    Integer division quantizes identically in Spark and DuckDB, so a
    fixed round count is bit-reproducible across engines — the oracle
    (:func:`katz_sql`) unrolls the same recurrence as chained CTEs.

    Convergence/growth: the truncated series is exact as stated for
    any α; it approximates the Katz limit only under α·λ_max < 1
    (caller's choice of ``atten_num/atten_den``).  When the graph
    amplifies instead (α·λ_max > 1) scores grow geometrically — every
    round therefore rides a LOUD assert (values ≤ 2⁵⁵) that fires
    before int64 wrap can corrupt a result silently.

    Scale design: identical to pagerank — per round one src-keyed
    join of the pre-partitioned edge list + one dst-keyed partial-agg
    sum (2 shuffles/round, hub fan-in is AQE's skew case), in-round
    sums ride decimal(38,0), lineage cut per round.

    ``nodes``: one column ``node``; ``edges``: (src, dst), assumed
    deduplicated.  Returns (node, katz_q)."""
    if not (0 < atten_num < atten_den):
        raise ValueError(
            f"attenuation must satisfy 0 < num < den: "
            f"{atten_num}/{atten_den}"
        )
    edges = edges.select("src", "dst").repartition("src").localCheckpoint(
        eager=True
    )
    ranks = nodes.withColumn("katz_q", F.lit(int(scale)).cast("bigint"))
    new_q = (
        f"CAST({int(scale)} + ({int(atten_num)} * "
        f"COALESCE(_in, CAST(0 AS decimal(38,0)))) "
        f"DIV {int(atten_den)} AS BIGINT)"
    )
    guarded = (
        f"CASE WHEN assert_true({new_q} <= {KATZ_CAP}, "
        f"'katz_quantized: score exceeded 2^55 — attenuation too "
        f"large for this graph (geometric growth); lower "
        f"atten_num/atten_den') IS NULL THEN {new_q} END"
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(F.expr("CAST(katz_q AS decimal(38,0))"))
                .alias("_in")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select("node", F.expr(guarded).alias("katz_q"))
            .localCheckpoint(eager=True)
        )
    return ranks


def katz_sql(
    nodes_src: str,
    edges_src: str,
    iterations: int = 6,
    atten_num: int = 5,
    atten_den: int = 100,
    scale: int = 10**9,
) -> str:
    """DuckDB twin of :func:`katz_quantized`: the identical integer
    recurrence unrolled as chained CTEs (HUGEINT sums, ``//``
    truncation on non-negative operands ≡ Spark's DIV).  Standalone
    statement returning (node, katz_q)."""
    ctes = [
        f"kz_nd AS (SELECT node FROM {nodes_src})",
        f"kz_eg AS (SELECT src, dst FROM {edges_src})",
        f"kz_r0 AS (SELECT node, CAST({int(scale)} AS BIGINT) "
        "AS katz_q FROM kz_nd)",
    ]
    for i in range(1, iterations + 1):
        p = f"kz_r{i - 1}"
        ctes.append(f"""kz_r{i} AS (
            SELECT kz_nd.node,
                   CAST({int(scale)} + ({int(atten_num)}
                        * COALESCE(c._in, CAST(0 AS HUGEINT)))
                        // {int(atten_den)} AS BIGINT) AS katz_q
            FROM kz_nd
            LEFT JOIN (
                SELECT kz_eg.dst AS node,
                       SUM(CAST(r.katz_q AS HUGEINT)) AS _in
                FROM kz_eg JOIN {p} r ON kz_eg.src = r.node
                GROUP BY kz_eg.dst
            ) c ON c.node = kz_nd.node
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, katz_q FROM kz_r{iterations}"
    )


def graph_diameter(
    nodes: DataFrame, edges: DataFrame, rounds: int
) -> DataFrame:
    """Double-sweep diameter lower bound over the UNDIRECTED
    simplification of a link graph — the classic 2-BFS estimate (BFS
    from an arbitrary node, then BFS from the farthest node found;
    the second eccentricity is a lower bound on the true diameter
    that is exact on trees and empirically tight on web graphs) —
    the "how many hops wide is this crawl" health metric computed
    without the all-pairs matrix no 10¹²-node graph can afford.

    Deterministic contract: the first sweep starts at the MIN node id
    (declared, like kcenter_seeds' start rule); each sweep's far node
    is the (max dist, then smallest id) argmax over REACHED nodes.
    Distances come from :func:`link_distance`, so within ``rounds``
    hops every reported distance is the true min-hop distance —
    ``rounds`` is the honesty bound: the reported figures are exact
    eccentricities-within-R (a lower bound on both the true
    eccentricity and the diameter), and n_reached says how much of
    the start's component the radius saw.  Both sweeps are frontier-
    only BFS (2 shuffles/round); the two argmax collects are
    single-row, bounded by construction.

    Returns ONE row: (start_node, far_node, end_node, sweep1_ecc,
    diameter_lb, n_reached)."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    spark = nodes.sparkSession
    start = nodes.agg(F.min("node").alias("_s")).collect()[0]["_s"]
    if start is None:
        raise ValueError("graph_diameter: empty node set")
    seeds1 = spark.createDataFrame([(int(start),)], "node long")
    d1 = link_distance(nodes, seeds1, sym, rounds)
    far = (
        d1.where(F.col("dist").isNotNull())
        .agg(F.max(F.struct(F.col("dist"), (-F.col("node")).alias("_n")))
             .alias("_b"))
        .select((-F.col("_b._n")).alias("u"),
                F.col("_b.dist").alias("ecc1"))
        .collect()[0]
    )
    seeds2 = spark.createDataFrame([(int(far["u"]),)], "node long")
    d2 = link_distance(nodes, seeds2, sym, rounds)
    return (
        d2.where(F.col("dist").isNotNull())
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.max(F.struct(F.col("dist"), (-F.col("node")).alias("_n")))
            .alias("_b"),
        )
        .select(
            F.lit(int(start)).cast("bigint").alias("start_node"),
            F.lit(int(far["u"])).cast("bigint").alias("far_node"),
            (-F.col("_b._n")).cast("bigint").alias("end_node"),
            F.lit(int(far["ecc1"])).cast("bigint").alias("sweep1_ecc"),
            F.col("_b.dist").cast("bigint").alias("diameter_lb"),
            "n_reached",
        )
    )


def graph_diameter_sql(
    nodes_src: str, edges_src: str, rounds: int
) -> str:
    """DuckDB twin of :func:`graph_diameter` — two inlined
    :func:`link_distance_sql` sweeps over the identical
    symmetrization, identical (dist DESC, node) argmax rules.  Each
    sweep is AS MATERIALIZED and referenced from the final row —
    inlining an unrolled BFS chain once per output column re-executes
    it (and re-opens its parquet scans) once per reference.
    Standalone statement."""
    sym = f"""(
        SELECT src, dst FROM {edges_src}
        UNION ALL
        SELECT dst AS src, src AS dst FROM {edges_src}
    )"""
    seeds1 = f"(SELECT MIN(node) AS node FROM {nodes_src})"
    d1 = link_distance_sql(nodes_src, seeds1, sym, rounds)
    d2 = link_distance_sql(
        nodes_src, "(SELECT node FROM gd_far1)", sym, rounds
    )
    return f"""
        WITH gd_d1 AS MATERIALIZED (SELECT * FROM ({d1})),
        gd_far1 AS MATERIALIZED (
            SELECT node, dist FROM gd_d1 WHERE dist IS NOT NULL
            ORDER BY dist DESC, node LIMIT 1
        ),
        gd_d2 AS MATERIALIZED (SELECT * FROM ({d2})),
        gd_far2 AS (
            SELECT node, dist FROM gd_d2 WHERE dist IS NOT NULL
            ORDER BY dist DESC, node LIMIT 1
        )
        SELECT (SELECT MIN(node) FROM {nodes_src}) AS start_node,
               (SELECT node FROM gd_far1) AS far_node,
               (SELECT node FROM gd_far2) AS end_node,
               (SELECT dist FROM gd_far1) AS sweep1_ecc,
               (SELECT dist FROM gd_far2) AS diameter_lb,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM gd_d2
                WHERE dist IS NOT NULL) AS n_reached
    """


def hyperball_centrality(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    k: int = 32,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) with DETERMINISTIC bottom-k
    sketches — per-node neighborhood function |B_d(v)| and harmonic
    centrality within a hop radius, the per-node companion of
    :func:`graph_diameter`'s global bound.  All-pairs BFS is O(n²)
    state; HyperBall keeps ONE mergeable ball sketch per node and
    relaxes it along edges, so round d costs the same 2 shuffles as
    a PageRank round.  The published algorithm uses HLL (engine-
    private, unverifiable); this engine substitutes the house KMV
    bottom-k sketch (operators/sketches.py) — same union-merge
    algebra, bit-reproducible in both engines, EXACT below k
    distinct:

        sk₀(v) = {h(v)},   sk_d(v) = bottom-k( sk_{d-1}(v) ∪
                                      ⋃_{v→w} sk_{d-1}(w) )
        est_d  = |sk| if |sk| < k else (k−1)·2³² DIV kth
        harm_q = Σ_d (est_d − est_{d−1}) · (L DIV d),  L = lcm(1..r)

    (est is monotone nondecreasing — the sketch only gains elements
    and the kth hash only shrinks — so the per-ring deltas are ≥ 0;
    the LCM clearing makes the 1/d weights exact integers, the
    krippendorff discipline).  est_d counts the OUT-ball of v —
    feed reversed edges for the in-ball/authority flavor.  Within
    the exact regime (< k reachable) harm_q IS L·harmonic
    centrality truncated at radius r; beyond it the sketch error is
    the KMV ±1/√k, stated.

    Scale: per round one dst-keyed join of the pre-partitioned edge
    list (pulling each out-neighbor's sketch) + one src-keyed merge
    aggregate (arrays ≤ k ints — the shuffle payload is bounded by
    construction), lineage cut per round.  Returns (node, ball_est,
    harm_q)."""
    from math import gcd

    from .sketches import kmv_hash

    if not 1 <= int(rounds) <= 8:
        raise ValueError(f"rounds must be in [1, 8]: {rounds}")
    if not 2 <= int(k) <= 256:
        raise ValueError(f"k must be in [2, 256]: {k}")
    lcm = 1
    for d in range(1, int(rounds) + 1):
        lcm = lcm * d // gcd(lcm, d)
    kk = int(k)
    edges = edges.select("src", "dst").repartition("dst").localCheckpoint(
        eager=True
    )
    est_expr = (
        f"CAST(CASE WHEN size(sk) < {kk} THEN size(sk) "
        f"ELSE ({kk - 1} * 4294967296) "
        f"DIV GREATEST(element_at(sk, {kk}), 1) END AS BIGINT)"
    )
    state = nodes.select(
        "node",
        F.array(kmv_hash(F.col("node"))).alias("sk"),
        F.lit(1).cast("bigint").alias("est"),
        F.lit(0).cast("bigint").alias("hq"),
    ).localCheckpoint(eager=True)
    for d in range(1, int(rounds) + 1):
        nbr = (
            edges.join(
                state.select(
                    F.col("node").alias("dst"),
                    F.col("sk").alias("_nsk"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.flatten(F.collect_list("_nsk")).alias("_nbrs"))
        )
        state = (
            state.join(nbr, "node", "left")
            .select(
                "node", "est", "hq",
                F.expr(
                    f"slice(array_sort(array_distinct(concat(sk, "
                    f"coalesce(_nbrs, array())))), 1, {kk})"
                ).alias("sk"),
            )
            .select(
                "node", "sk", "hq",
                F.col("est").alias("_pe"),
                F.expr(est_expr).alias("est"),
            )
            .select(
                "node", "sk", "est",
                (
                    F.col("hq")
                    + (F.col("est") - F.col("_pe"))
                    * F.lit(lcm // d)
                ).cast("bigint").alias("hq"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node",
        F.col("est").alias("ball_est"),
        F.col("hq").alias("harm_q"),
    )


def hyperball_sql(
    nodes_src: str,
    edges_src: str,
    rounds: int = 4,
    k: int = 32,
) -> str:
    """DuckDB twin of :func:`hyperball_centrality` — identical KMV
    hash, bottom-k union merge, estimator, and LCM-cleared harmonic
    ladder, unrolled as MATERIALIZED CTE rounds.  Standalone,
    returns (node, ball_est, harm_q)."""
    from math import gcd

    from .sketches import kmv_hash_sql

    if not 1 <= int(rounds) <= 8:
        raise ValueError(f"rounds: {rounds}")
    lcm = 1
    for d in range(1, int(rounds) + 1):
        lcm = lcm * d // gcd(lcm, d)
    kk = int(k)
    h = kmv_hash_sql("node")
    est = (
        f"CAST(CASE WHEN len(sk) < {kk} THEN len(sk) "
        f"ELSE ({kk - 1} * 4294967296) "
        f"// GREATEST(sk[{kk}], 1) END AS BIGINT)"
    )
    ctes = [
        f"hb_nd AS (SELECT node FROM {nodes_src})",
        f"hb_eg AS (SELECT src, dst FROM {edges_src})",
        f"""hb_s0 AS MATERIALIZED (
            SELECT node, [{h}] AS sk,
                   CAST(1 AS BIGINT) AS est,
                   CAST(0 AS BIGINT) AS hq
            FROM hb_nd
        )""",
    ]
    for d in range(1, int(rounds) + 1):
        p = f"hb_s{d - 1}"
        ctes.append(f"""hb_m{d} AS MATERIALIZED (
            SELECT s.node,
                   list_sort(list_distinct(s.sk ||
                       COALESCE(n._nbrs, [])))[1:{kk}] AS sk,
                   s.est AS _pe, s.hq AS _ph
            FROM {p} s
            LEFT JOIN (
                SELECT e.src AS node,
                       flatten(list(r.sk)) AS _nbrs
                FROM hb_eg e JOIN {p} r ON e.dst = r.node
                GROUP BY 1
            ) n ON n.node = s.node
        )""")
        ctes.append(f"""hb_s{d} AS MATERIALIZED (
            SELECT node, sk, est,
                   CAST(_ph + (est - _pe) * {lcm // d} AS BIGINT)
                       AS hq
            FROM (SELECT node, sk, _pe, _ph, {est} AS est
                  FROM hb_m{d})
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT node, est AS ball_est, hq AS harm_q
        FROM hb_s{rounds}
    """
    )


def rich_club(
    nodes: DataFrame,
    edges: DataFrame,
    k_list: "list[int]",
) -> DataFrame:
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004) — do the
    high-degree nodes link preferentially to EACH OTHER?  The
    elite-interconnection audit of a link graph (hub collusion /
    link-farm signal next to :func:`degree_assortativity`'s global
    correlation — assortativity averages over everyone, the rich
    club looks only at the top):

        φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1))

    over the UNDIRECTED simplification (distinct endpoint pairs,
    self-loops dropped; degree = distinct neighbours).  Exact ppm
    integers — counts and one cleared division per declared k; NULL
    when fewer than two nodes qualify.

    Plan: one dedup pass for the undirected edge set, one degree
    aggregate, one broadcast-degree join back to edges, then ONE
    conditional-sum aggregate produces every declared k (|k_list| ≤
    16, validated) — the grid never rescans the graph per k.
    Returns one row per k: (k, n_rich, e_rich, phi_ppm)."""
    ks = sorted(set(int(k) for k in k_list))
    if not 1 <= len(ks) <= 16:
        raise ValueError(f"k_list must hold 1..16 values: {k_list}")
    if any(k < 0 for k in ks):
        raise ValueError(f"k values must be >= 0: {k_list}")
    und = (
        edges.select(
            F.least("src", "dst").alias("_a"),
            F.greatest("src", "dst").alias("_b"),
        )
        .where(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("_a").alias("node"))
        .unionAll(und.select(F.col("_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_deg"))
    )
    n_cols = [
        F.coalesce(
            F.sum(F.when(F.col("_deg") > k, 1)), F.lit(0)
        ).cast("bigint").alias(f"_n{k}")
        for k in ks
    ]
    n_row = deg.agg(*n_cols)
    ed = (
        und.join(
            deg.select(F.col("node").alias("_a"),
                       F.col("_deg").alias("_da")),
            "_a",
        )
        .join(
            deg.select(F.col("node").alias("_b"),
                       F.col("_deg").alias("_db")),
            "_b",
        )
    )
    e_cols = [
        F.coalesce(
            F.sum(
                F.when((F.col("_da") > k) & (F.col("_db") > k), 1)
            ),
            F.lit(0),
        ).cast("bigint").alias(f"_e{k}")
        for k in ks
    ]
    e_row = ed.agg(*e_cols)
    stacked = ", ".join(
        f"{k}L, _n{k}, _e{k}" for k in ks
    )
    return (
        n_row.crossJoin(F.broadcast(e_row))
        .selectExpr(
            f"stack({len(ks)}, {stacked}) AS (k, n_rich, e_rich)"
        )
        .select(
            "k", "n_rich", "e_rich",
            F.expr(
                "CAST(CASE WHEN n_rich < 2 THEN NULL ELSE "
                "(2 * e_rich * 1000000) DIV (n_rich * (n_rich - 1)) "
                "END AS BIGINT)"
            ).alias("phi_ppm"),
        )
    )


def rich_club_sql(
    nodes_src: str,
    edges_src: str,
    k_list: "list[int]",
) -> str:
    """DuckDB twin of :func:`rich_club` (identical undirected
    dedup, degree grid, cleared φ).  Standalone."""
    ks = sorted(set(int(k) for k in k_list))
    sel_n = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN _deg > {k} THEN 1 END), 0) "
        f"AS BIGINT) AS _n{k}"
        for k in ks
    )
    sel_e = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN _da > {k} AND _db > {k} "
        f"THEN 1 END), 0) AS BIGINT) AS _e{k}"
        for k in ks
    )
    rows = " UNION ALL ".join(
        f"SELECT {k} AS k, _n{k} AS n_rich, _e{k} AS e_rich "
        f"FROM rc_n, rc_e"
        for k in ks
    )
    return f"""
        WITH rc_und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS _a,
                   GREATEST(src, dst) AS _b
            FROM {edges_src}
            WHERE src <> dst
        ),
        rc_deg AS MATERIALIZED (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS _deg
            FROM (SELECT _a AS node FROM rc_und
                  UNION ALL SELECT _b FROM rc_und)
            GROUP BY 1
        ),
        rc_n AS (SELECT {sel_n} FROM rc_deg),
        rc_e AS (
            SELECT {sel_e} FROM (
                SELECT a._deg AS _da, b._deg AS _db
                FROM rc_und u
                JOIN rc_deg a ON a.node = u._a
                JOIN rc_deg b ON b.node = u._b
            )
        ),
        rc_rows AS ({rows})
        SELECT CAST(k AS BIGINT) AS k, n_rich, e_rich,
               CAST(CASE WHEN n_rich < 2 THEN NULL ELSE
                    (2 * e_rich * 1000000)
                    // (n_rich * (n_rich - 1)) END AS BIGINT)
                   AS phi_ppm
        FROM rc_rows
    """


def bowtie_classify(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 8,
    max_peels: int = 16,
    max_hops: int = 64,
) -> DataFrame:
    """Bow-tie decomposition of a directed graph (Broder et al.
    2000) — THE web-graph structure map: every node lands in one of
    the seven classic regions around the giant strongly connected
    core,

        core          the largest SCC (ties: smallest member id)
        in            reaches the core, not reached from it
        out           reached from the core, not reaching it
        tube          on an in→out path that bypasses the core
        tendril_in    hangs forward off IN  (reachable from IN only)
        tendril_out   feeds into OUT        (reaches OUT only)
        disconnected  none of the above

    — the crawl-frontier atlas (IN = pages that link toward the web's
    center but nothing links back; OUT = link sinks; tubes/tendrils
    = the periphery a frontier scheduler deprioritizes).

    Reachability is hop-bounded by ``rounds`` via
    :func:`link_distance`'s honesty contract — every classification
    is exact FOR PATHS OF ≤ rounds HOPS (a node whose only path to
    the core is longer reads as its periphery class; stated, the
    same truncation the published crawls used).  The core itself is
    exact (:func:`scc_components` raises rather than split an SCC).
    A non-core node can never show BOTH in- and out-reachability:
    real paths both ways would place it inside the core's SCC.

    Cost: one SCC peel + four frontier BFS passes (forward/backward
    from the core, forward from IN, backward from OUT) — each 2
    shuffles/round with frontier-only relaxation.  Returns
    (node, cls)."""
    sccs = scc_components(
        nodes, edges, max_peels=max_peels, max_hops=max_hops,
        op_name="bowtie_classify",
    )
    giant = sccs.agg(
        F.max(
            F.struct(
                F.col("scc_size").alias("_n"),
                (-F.col("scc")).alias("_neg"),
            )
        ).alias("_b")
    ).select((-F.col("_b._neg")).alias("_giant"))
    core = (
        sccs.crossJoin(F.broadcast(giant))
        .where(F.col("scc") == F.col("_giant"))
        .select("node")
        .localCheckpoint(eager=True)
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    fwd = link_distance(nodes, core, edges, rounds).select(
        "node", F.col("dist").alias("_df")
    )
    bwd = link_distance(nodes, core, rev, rounds).select(
        "node", F.col("dist").alias("_db")
    )
    marked = (
        nodes.join(core.withColumn("_c", F.lit(1)), "node", "left")
        .join(fwd, "node")
        .join(bwd, "node")
        .localCheckpoint(eager=True)
    )
    in_set = marked.where(
        F.col("_c").isNull() & F.col("_db").isNotNull()
    ).select("node")
    out_set = marked.where(
        F.col("_c").isNull() & F.col("_df").isNotNull()
    ).select("node")
    from_in = link_distance(nodes, in_set, edges, rounds).select(
        "node", F.col("dist").alias("_fi")
    )
    to_out = link_distance(nodes, out_set, rev, rounds).select(
        "node", F.col("dist").alias("_to")
    )
    return (
        marked.join(from_in, "node")
        .join(to_out, "node")
        .select(
            "node",
            F.expr(
                "CASE WHEN _c IS NOT NULL THEN 'core' "
                "WHEN _db IS NOT NULL THEN 'in' "
                "WHEN _df IS NOT NULL THEN 'out' "
                "WHEN _fi IS NOT NULL AND _to IS NOT NULL "
                "  THEN 'tube' "
                "WHEN _fi IS NOT NULL THEN 'tendril_in' "
                "WHEN _to IS NOT NULL THEN 'tendril_out' "
                "ELSE 'disconnected' END"
            ).alias("cls"),
        )
    )


def bowtie_sql(
    nodes_src: str,
    edges_src: str,
    rounds: int = 8,
) -> str:
    """DuckDB twin of :func:`bowtie_classify` — the transitive-
    closure SCC oracle picks the identical giant core, then four
    :func:`link_distance_sql` chains (each scoped inside its own
    derived table, so the bf_* CTE names never collide) replay the
    bounded reachability; the final CASE mirrors the operator's
    precedence.  Standalone, returns (node, cls)."""
    rev = f"(SELECT dst AS src, src AS dst FROM {edges_src})"
    return f"""
        WITH bt_scc AS MATERIALIZED (
            SELECT * FROM ({scc_sql(nodes_src, edges_src)})
        ),
        bt_giant AS (
            SELECT scc FROM bt_scc
            GROUP BY scc ORDER BY COUNT(*) DESC, scc LIMIT 1
        ),
        bt_core AS MATERIALIZED (
            SELECT node FROM bt_scc
            WHERE scc = (SELECT scc FROM bt_giant)
        ),
        bt_fwd AS MATERIALIZED (
            SELECT * FROM (
                {link_distance_sql(nodes_src, 'bt_core',
                                   edges_src, rounds)}
            )
        ),
        bt_bwd AS MATERIALIZED (
            SELECT * FROM (
                {link_distance_sql(nodes_src, 'bt_core',
                                   rev, rounds)}
            )
        ),
        bt_in AS MATERIALIZED (
            SELECT b.node FROM bt_bwd b
            LEFT JOIN bt_core c USING (node)
            WHERE b.dist IS NOT NULL AND c.node IS NULL
        ),
        bt_out AS MATERIALIZED (
            SELECT f.node FROM bt_fwd f
            LEFT JOIN bt_core c USING (node)
            WHERE f.dist IS NOT NULL AND c.node IS NULL
        ),
        bt_fi AS MATERIALIZED (
            SELECT * FROM (
                {link_distance_sql(nodes_src, 'bt_in',
                                   edges_src, rounds)}
            )
        ),
        bt_to AS MATERIALIZED (
            SELECT * FROM (
                {link_distance_sql(nodes_src, 'bt_out',
                                   rev, rounds)}
            )
        )
        SELECT n.node,
               CASE WHEN c.node IS NOT NULL THEN 'core'
                    WHEN b.dist IS NOT NULL THEN 'in'
                    WHEN f.dist IS NOT NULL THEN 'out'
                    WHEN fi.dist IS NOT NULL
                         AND t.dist IS NOT NULL THEN 'tube'
                    WHEN fi.dist IS NOT NULL THEN 'tendril_in'
                    WHEN t.dist IS NOT NULL THEN 'tendril_out'
                    ELSE 'disconnected' END AS cls
        FROM (SELECT node FROM {nodes_src}) n
        LEFT JOIN bt_core c USING (node)
        LEFT JOIN bt_fwd f USING (node)
        LEFT JOIN bt_bwd b USING (node)
        LEFT JOIN bt_fi fi USING (node)
        LEFT JOIN bt_to t USING (node)
    """


def attack_robustness(
    nodes: DataFrame,
    edges: DataFrame,
    k_list: "list[int]",
    max_iters: int = 16,
    strategy: str = "degree",
) -> DataFrame:
    """Attack-tolerance audit (Albert, Jeong & Barabási 2000) — how
    fast does the graph fall apart when its top hubs are removed?
    Scale-free link graphs survive random failure but shatter under
    targeted hub removal; this measures exactly that curve: for
    each declared k, delete the k highest-degree nodes (undirected
    degree, ties to the smaller id — a deterministic kill list) and
    re-measure the giant component:

        giant_ppm = giant_size · 10⁶ DIV n_remaining

    — the mirror-farm/CDN dependency question for a crawl corpus
    (if the top hub hosts vanish, does the link structure still
    cohere?).  k = 0 rows give the baseline.

    ``strategy`` picks the kill order: ``"degree"`` (the targeted
    attack above) or ``"hash"`` — kmv_hash order, the engine's
    deterministic stand-in for uniform RANDOM failure, so the
    classic contrast (scale-free graphs shrug at random failure,
    shatter under targeting) is measurable as two entries over the
    same graph.

    Components come from the verified min-label pointer-doubling
    kit per residual graph (|k_list| ≤ 6 declared runs, validated —
    the curve is the product, not a per-k rescan surprise).
    Returns one row per k: (k_removed, n_remaining, n_components,
    giant_size, giant_ppm)."""
    from .sketches import kmv_hash
    ks = sorted(set(int(k) for k in k_list))
    if not 1 <= len(ks) <= 6:
        raise ValueError(f"k_list must hold 1..6 values: {k_list}")
    if any(k < 0 for k in ks):
        raise ValueError(f"k values must be >= 0: {k_list}")
    if strategy not in ("degree", "hash"):
        raise ValueError(
            f"strategy must be 'degree' or 'hash': {strategy}"
        )
    und = (
        edges.select(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("id_a").alias("id"))
        .unionAll(und.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    ids_all = nodes.select(F.col("node").alias("id"))
    ranked = (
        ids_all.join(deg, "id", "left")
        .select(
            "id", F.coalesce("_deg", F.lit(0)).alias("_deg")
        )
        .localCheckpoint(eager=True)
    )
    spark = nodes.sparkSession
    rows = []
    for k in ks:
        # orderBy immediately before limit → TakeOrderedAndProject,
        # deterministic regardless of the checkpoint's partitioning
        if strategy == "degree":
            ordered = ranked.orderBy(F.desc("_deg"), "id")
        else:
            ordered = ranked.orderBy(
                kmv_hash(F.col("id")), "id"
            )
        victims = ordered.limit(k).select("id")
        alive = ids_all.join(victims, "id", "left_anti")
        live_edges = (
            und.join(
                victims.select(F.col("id").alias("id_a")), "id_a",
                "left_anti",
            )
            .join(
                victims.select(F.col("id").alias("id_b")), "id_b",
                "left_anti",
            )
        )
        comp = min_label_components(
            alive, live_edges, max_iters, f"attack_robustness_k{k}"
        )
        stat = (
            comp.groupBy("label")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_components"),
                F.coalesce(F.max("_sz"), F.lit(0)).cast("bigint")
                .alias("giant_size"),
                F.coalesce(F.sum("_sz"), F.lit(0)).cast("bigint")
                .alias("n_remaining"),
            )
            .collect()[0]
        )
        n_rem = stat["n_remaining"]
        rows.append(
            (
                k, n_rem, stat["n_components"], stat["giant_size"],
                None if n_rem == 0
                else (stat["giant_size"] * 1_000_000) // n_rem,
            )
        )
    return spark.createDataFrame(
        rows,
        "k_removed long, n_remaining long, n_components long, "
        "giant_size long, giant_ppm long",
    )


def attack_robustness_sql(
    nodes_src: str,
    edges_src: str,
    k_list: "list[int]",
    strategy: str = "degree",
) -> str:
    """DuckDB twin of :func:`attack_robustness` — identical kill
    lists and per-k residual components via the transitive-closure
    oracle, each scoped in its own derived table (the bowtie
    idiom).  Standalone."""
    from .sketches import kmv_hash_sql

    if strategy not in ("degree", "hash"):
        raise ValueError(f"strategy: {strategy}")
    order = (
        "_deg DESC, id" if strategy == "degree"
        else kmv_hash_sql("id") + ", id"
    )
    ks = sorted(set(int(k) for k in k_list))
    parts = []
    for k in ks:
        nodes_k = (
            f"(SELECT id AS node FROM ar_rank "
            f"WHERE _rk > {k})"
        )
        edges_k = (
            f"(SELECT a.id_a AS src, a.id_b AS dst FROM ar_und a "
            f"JOIN ar_rank r1 ON r1.id = a.id_a AND r1._rk > {k} "
            f"JOIN ar_rank r2 ON r2.id = a.id_b AND r2._rk > {k})"
        )
        parts.append(f"""
            SELECT CAST({k} AS BIGINT) AS k_removed,
                   CAST(SUM(_sz) AS BIGINT) AS n_remaining,
                   CAST(COUNT(*) AS BIGINT) AS n_components,
                   CAST(MAX(_sz) AS BIGINT) AS giant_size,
                   CAST(CASE WHEN SUM(_sz) = 0 THEN NULL ELSE
                        (MAX(_sz) * 1000000) // SUM(_sz) END
                        AS BIGINT) AS giant_ppm
            FROM (
                SELECT label, COUNT(*) AS _sz
                FROM ({components_sql(nodes_k, edges_k)})
                GROUP BY 1
            )
        """)
    return f"""
        WITH ar_und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS id_a,
                   GREATEST(src, dst) AS id_b
            FROM {edges_src} WHERE src <> dst
        ),
        ar_rank AS MATERIALIZED (
            SELECT id,
                   ROW_NUMBER() OVER (ORDER BY {order})
                       AS _rk
            FROM (
                SELECT n.node AS id,
                       COALESCE(d._deg, 0) AS _deg
                FROM {nodes_src} n
                LEFT JOIN (
                    SELECT id, COUNT(*) AS _deg
                    FROM (SELECT id_a AS id FROM ar_und
                          UNION ALL SELECT id_b FROM ar_und)
                    GROUP BY 1
                ) d ON d.id = n.node
            )
        )
        {" UNION ALL ".join(parts)}
        ORDER BY k_removed
    """


BC_SCALE = 10**6
BC_SIGMA_CAP = 1 << 50


def betweenness_sampled(
    nodes: DataFrame,
    edges: DataFrame,
    n_sources: int = 4,
    rounds: int = 6,
) -> DataFrame:
    """Source-sampled betweenness centrality (Brandes 2001 with the
    standard pivot sampling) — WHO sits on the shortest paths?  The
    brokerage/chokepoint signal none of the other centralities see
    (degree counts friends, PageRank counts endorsements, harmonic
    counts proximity; betweenness counts being UNAVOIDABLE).  Exact
    all-pairs Brandes is O(nm); the sampled estimator runs the full
    dependency accumulation from ``n_sources`` DETERMINISTIC pivots
    — the smallest ``n_sources`` nodes by (kmv_hash(node), node),
    the engine's RNG-free stand-in for uniform pivots — and reports
    the EXACT sampled quantity (the estimate's variance is the
    published one; which pivots were used is reproducible, stated).

    Per pivot: forward frontier BFS accumulates shortest-path
    counts σ (layer by layer, ≤ ``rounds`` hops — the link_distance
    honesty contract), then the backward pass folds dependencies
    top layer down:

        δ(v) = Σ_{v→w, d(w)=d(v)+1} (σ_v · (10⁶ + δ_w)) DIV σ_w

    — one floor per DAG edge (stated), products in decimal(38); σ
    rides a LOUD 2⁵⁰ cap (path counts explode on dense graphs —
    silence would wrap, the katz discipline).  bc_q(v) = Σ over
    pivots of δ(v), v never its own pivot; ppm units of "paths
    through v per source pair".

    Cost: n_sources × (≤ rounds forward + ≤ rounds backward)
    frontier steps, each 2 shuffles, lineage cut per step.
    Returns (node, bc_q) for every node (0 where untouched)."""
    from .sketches import kmv_hash

    if not 1 <= int(n_sources) <= 16:
        raise ValueError(f"n_sources must be in [1, 16]: {n_sources}")
    if not 1 <= int(rounds) <= 16:
        raise ValueError(f"rounds must be in [1, 16]: {rounds}")
    dec = "decimal(38,0)"
    edges = edges.select("src", "dst").distinct().repartition(
        "src"
    ).localCheckpoint(eager=True)
    pivots = [
        r["node"]
        for r in nodes.select(
            "node", kmv_hash(F.col("node")).alias("_h")
        )
        .orderBy("_h", "node")
        .limit(int(n_sources))
        .collect()
    ]
    acc = None
    sig_guard = (
        f"CASE WHEN assert_true(_sig <= {BC_SIGMA_CAP}, "
        f"'betweenness_sampled: sigma exceeded 2^50 — path counts "
        f"explode on this graph; reduce rounds') IS NULL "
        f"THEN _sig END"
    )
    for s in pivots:
        assigned = nodes.sparkSession.createDataFrame(
            [(s, 0, 1)], "node long, dist int, sigma long"
        ).localCheckpoint(eager=True)
        frontier = assigned
        layers = [assigned]
        for d in range(1, int(rounds) + 1):
            nxt = (
                edges.join(
                    frontier.select(
                        F.col("node").alias("src"),
                        F.col("sigma").alias("_ps"),
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("_ps").alias("_sig"))
                .join(assigned.select("node"), "node", "left_anti")
                .select(
                    "node",
                    F.lit(d).cast("int").alias("dist"),
                    F.expr(sig_guard).cast("long").alias("sigma"),
                )
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            layers.append(nxt)
            assigned = assigned.unionByName(nxt).localCheckpoint(
                eager=True
            )
            frontier = nxt
        # backward dependency fold, deepest layer first
        deltas = {}  # dist -> df(node, delta)
        dmax = len(layers) - 1
        for d in range(dmax, 0, -1):
            w = layers[d].select(
                F.col("node").alias("dst"),
                F.col("sigma").alias("_sw"),
            )
            wd = deltas.get(d)
            if wd is not None:
                w = w.join(
                    wd.select(
                        F.col("node").alias("dst"),
                        F.col("delta").alias("_dw"),
                    ),
                    "dst",
                    "left",
                )
            else:
                w = w.withColumn("_dw", F.lit(None).cast("long"))
            v = layers[d - 1].select(
                F.col("node").alias("src"),
                F.col("sigma").alias("_sv"),
            )
            terms = (
                edges.join(w, "dst")
                .join(v, "src")
                .select(
                    F.col("src").alias("node"),
                    F.expr(
                        f"CAST((CAST(_sv AS {dec}) * "
                        f"(1000000 + COALESCE(_dw, 0))) DIV _sw "
                        f"AS BIGINT)"
                    ).alias("_t"),
                )
                .groupBy("node")
                .agg(F.sum("_t").cast("long").alias("delta"))
                .localCheckpoint(eager=True)
            )
            deltas[d - 1] = terms
        per_src = None
        for d, df in deltas.items():
            part = df.where(F.col("node") != F.lit(s))
            per_src = part if per_src is None else per_src.unionByName(
                part
            )
        if per_src is not None:
            acc = per_src if acc is None else acc.unionByName(per_src)
    base = nodes.select("node")
    if acc is None:
        return base.withColumn("bc_q", F.lit(0).cast("bigint"))
    summed = acc.groupBy("node").agg(
        F.sum("delta").cast("bigint").alias("bc_q")
    )
    return base.join(summed, "node", "left").select(
        "node",
        F.coalesce("bc_q", F.lit(0)).cast("bigint").alias("bc_q"),
    )


def betweenness_sql(
    nodes_src: str,
    edges_src: str,
    n_sources: int = 4,
    rounds: int = 6,
) -> str:
    """DuckDB twin of :func:`betweenness_sampled` — identical pivot
    rank (kmv_hash order), per-pivot forward σ layers and backward
    dependency folds unrolled as MATERIALIZED CTEs (HUGEINT
    products, // floors).  Standalone, returns (node, bc_q)."""
    from .sketches import kmv_hash_sql

    ns, rd = int(n_sources), int(rounds)
    h = kmv_hash_sql("node")
    ctes = [
        f"bc_nd AS (SELECT node FROM {nodes_src})",
        f"""bc_eg AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM {edges_src}
        )""",
        f"""bc_piv AS MATERIALIZED (
            SELECT node,
                   ROW_NUMBER() OVER (ORDER BY {h}, node) AS rk
            FROM bc_nd
        )""",
    ]
    delta_refs = []
    for i in range(ns):
        ctes.append(f"""bc{i}_f0 AS MATERIALIZED (
            SELECT node, 0 AS dist, CAST(1 AS BIGINT) AS sigma
            FROM bc_piv WHERE rk = {i + 1}
        )""")
        ctes.append(f"bc{i}_a0 AS (SELECT * FROM bc{i}_f0)")
        for d in range(1, rd + 1):
            ctes.append(f"""bc{i}_f{d} AS MATERIALIZED (
                SELECT e.dst AS node, {d} AS dist,
                       CAST(SUM(p.sigma) AS BIGINT) AS sigma
                FROM bc_eg e
                JOIN bc{i}_f{d - 1} p ON e.src = p.node
                LEFT JOIN bc{i}_a{d - 1} a ON a.node = e.dst
                WHERE a.node IS NULL
                GROUP BY 1
            )""")
            ctes.append(f"""bc{i}_a{d} AS MATERIALIZED (
                SELECT * FROM bc{i}_a{d - 1}
                UNION ALL SELECT * FROM bc{i}_f{d}
            )""")
        for d in range(rd, 0, -1):
            dw_join = (
                f"LEFT JOIN bc{i}_d{d} dw ON dw.node = e.dst"
                if d < rd else ""
            )
            dw_val = (
                "COALESCE(dw.delta, 0)" if d < rd else "0"
            )
            ctes.append(f"""bc{i}_d{d - 1} AS MATERIALIZED (
                SELECT e.src AS node,
                       CAST(SUM((CAST(v.sigma AS HUGEINT)
                            * (1000000 + {dw_val})) // w.sigma)
                            AS BIGINT) AS delta
                FROM bc_eg e
                JOIN bc{i}_f{d} w ON w.node = e.dst
                {dw_join}
                JOIN bc{i}_f{d - 1} v ON v.node = e.src
                GROUP BY 1
            )""")
            delta_refs.append(
                f"SELECT node, delta FROM bc{i}_d{d - 1} "
                f"WHERE node <> (SELECT node FROM bc_piv "
                f"WHERE rk = {i + 1})"
            )
    union = "\nUNION ALL\n".join(delta_refs)
    return (
        "WITH " + ",\n".join(ctes) + f""",
        bc_all AS ({union})
        SELECT n.node,
               CAST(COALESCE(s.bc_q, 0) AS BIGINT) AS bc_q
        FROM bc_nd n
        LEFT JOIN (
            SELECT node, SUM(delta) AS bc_q
            FROM bc_all GROUP BY 1
        ) s ON s.node = n.node
    """
    )


def onion_layers(
    nodes: DataFrame,
    edges: DataFrame,
    max_layers: int = 32,
) -> DataFrame:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016)
    — the LAYERED refinement of :func:`kcore`: coreness says which
    shell a node survives to, the onion layer says how DEEP inside
    its shell it sits (peripheral 2-core nodes peel in the shell's
    first pass, its inner skeleton peels last), separating tree-like
    and densely-knit regions that share a coreness.

    The standard peel, one LAYER per pass:

        k ← max(k, min residual degree);  layer ← layer + 1;
        remove every residual node with degree ≤ k,
        recording (node, coreness = k, layer)

    over the undirected simplification (distinct pairs, self-loops
    dropped; isolated nodes peel in pass 1 with coreness 0).  The
    pass count is the graph's onion depth — bounded LOUDLY by
    ``max_layers``: exhaustion RAISES rather than emit wrong
    coreness for the survivors (the scc max_peels discipline).

    Cost: one degree aggregate + one anti-join per pass, lineage
    cut per pass; the per-pass driver action is a single-row min.
    Returns (node, coreness, layer)."""
    if not 1 <= int(max_layers) <= 64:
        raise ValueError(f"max_layers in [1, 64]: {max_layers}")
    und = (
        edges.select(
            F.least("src", "dst").alias("_a"),
            F.greatest("src", "dst").alias("_b"),
        )
        .where(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    residual = nodes.select(F.col("node")).localCheckpoint(eager=True)
    spark = nodes.sparkSession
    out = None
    k = 0
    for layer in range(1, int(max_layers) + 1):
        if residual.isEmpty():
            break
        live = (
            und.join(
                residual.select(F.col("node").alias("_a")), "_a"
            )
            .join(residual.select(F.col("node").alias("_b")), "_b")
        )
        deg = (
            residual.join(
                live.select(F.col("_a").alias("node"))
                .unionAll(live.select(F.col("_b").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("_d")),
                "node",
                "left",
            )
            .select("node", F.coalesce("_d", F.lit(0)).alias("_d"))
            .localCheckpoint(eager=True)
        )
        kmin = deg.agg(F.min("_d").alias("_m")).collect()[0]["_m"]
        k = max(k, int(kmin))
        peel = deg.where(F.col("_d") <= k).select(
            "node",
            F.lit(k).cast("bigint").alias("coreness"),
            F.lit(layer).cast("bigint").alias("layer"),
        ).localCheckpoint(eager=True)
        out = peel if out is None else out.unionByName(peel)
        residual = residual.join(
            peel.select("node"), "node", "left_anti"
        ).localCheckpoint(eager=True)
    if not residual.isEmpty():
        raise RuntimeError(
            f"onion_layers: residual nodes remain after "
            f"max_layers={max_layers} passes — raise the bound "
            f"(onion depth exceeds it)"
        )
    if out is None:
        return nodes.select("node").withColumn(
            "coreness", F.lit(0).cast("bigint")
        ).withColumn("layer", F.lit(0).cast("bigint"))
    return out


def onion_layers_sql(
    nodes_src: str,
    edges_src: str,
    max_layers: int = 32,
) -> str:
    """DuckDB twin of :func:`onion_layers` — identical peel passes
    unrolled as MATERIALIZED CTEs, the running k carried as a 1-row
    CTE per pass (GREATEST of the previous k and the pass's min
    residual degree).  Layers beyond convergence are empty; the
    OPERATOR's loud bound guarantees convergence within
    ``max_layers`` wherever the pair runs.  Standalone."""
    ml = int(max_layers)
    ctes = [
        f"""on_und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS _a,
                   GREATEST(src, dst) AS _b
            FROM {edges_src} WHERE src <> dst
        )""",
        f"on_r0 AS (SELECT node FROM {nodes_src})",
        "on_k0 AS (SELECT CAST(0 AS BIGINT) AS k)",
    ]
    peels = []
    for l in range(1, ml + 1):
        p = l - 1
        ctes.append(f"""on_d{l} AS MATERIALIZED (
            SELECT r.node, COALESCE(d._d, 0) AS _d
            FROM on_r{p} r
            LEFT JOIN (
                SELECT node, COUNT(*) AS _d FROM (
                    SELECT u._a AS node FROM on_und u
                    JOIN on_r{p} x ON x.node = u._a
                    JOIN on_r{p} y ON y.node = u._b
                    UNION ALL
                    SELECT u._b FROM on_und u
                    JOIN on_r{p} x ON x.node = u._a
                    JOIN on_r{p} y ON y.node = u._b
                ) GROUP BY 1
            ) d ON d.node = r.node
        )""")
        ctes.append(f"""on_k{l} AS MATERIALIZED (
            SELECT GREATEST(k, COALESCE(
                       (SELECT MIN(_d) FROM on_d{l}), k)) AS k
            FROM on_k{p}
        )""")
        ctes.append(f"""on_p{l} AS MATERIALIZED (
            SELECT node,
                   (SELECT k FROM on_k{l}) AS coreness,
                   CAST({l} AS BIGINT) AS layer
            FROM on_d{l}
            WHERE _d <= (SELECT k FROM on_k{l})
        )""")
        ctes.append(f"""on_r{l} AS MATERIALIZED (
            SELECT d.node FROM on_d{l} d
            LEFT JOIN on_p{l} p ON p.node = d.node
            WHERE p.node IS NULL
        )""")
        peels.append(f"SELECT node, CAST(coreness AS BIGINT) "
                     f"AS coreness, layer FROM on_p{l}")
    return (
        "WITH " + ",\n".join(ctes)
        + "\n" + "\nUNION ALL\n".join(peels)
    )


def boruvka_msf(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    w_col: str = "w",
    max_rounds: int = 20,
    component_iters: int = 24,
) -> DataFrame:
    """Minimum spanning forest by parallel Borůvka — the classic
    distributed MST algorithm, and the backbone of single-linkage
    clustering (the MSF's edges sorted by weight ARE the
    single-linkage dendrogram merges).  Each round every component
    hooks its minimum incident edge (which provably belongs to the
    MSF — the cut property), so the component count at least halves:
    O(log V) rounds, never an edge sort and never a sequential
    union-find.

    Uniqueness/determinism: edge weights are compared under the
    TOTAL order ``(w, a, b)``, so the MSF is unique — the argmin per
    component is deterministic, and the result is independent of
    round structure, partitioning, and merge order (the determinism
    audit's contract).  Self-loops are dropped and parallel edges
    keep their lightest weight (both stated).

    Each round is: two label joins + a per-component min(struct) —
    map-side-combinable, never a pairwise blow-up — followed by the
    house pointer-jumping merge (:func:`min_label_components`) on
    the CONTRACTED component graph (≤ one chosen edge per component,
    so the merge input shrinks with the component count, not the
    edge count).  Rounds cut lineage via localCheckpoint (the staged
    cascade pattern).  Loud non-convergence: if cross-component
    edges survive ``max_rounds`` the operator raises rather than
    return a partial forest.

    The DuckDB twin (:func:`boruvka_msf_sql`) is a STRUCTURALLY
    DIFFERENT characterization — Kruskal's invariant, ``e = (a,b)``
    is in the MSF iff ``b`` is NOT reachable from ``a`` using only
    edges strictly smaller under the total order (recursive-CTE
    closure per probe edge) — so the hash match verifies the
    algorithm against the definition, not the same code twice.

    Returns the forest edges (a_col, b_col, w_col), canonicalized
    ``a < b``."""
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("_a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("_b"),
            F.col(w_col).alias("_w"),
        )
        .where(F.col("_a") != F.col("_b"))
        .groupBy("_a", "_b")
        .agg(F.min("_w").alias("_w"))
        .localCheckpoint(eager=True)
    )
    comp = (
        e.select(F.col("_a").alias("id"))
        .union(e.select("_b"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    msf = None
    # max_rounds+1 probes of the cross-component edge set: the LAST
    # probe exists only to certify convergence, so a forest finished in
    # exactly max_rounds rounds completes instead of raising (the
    # former for/else raised before looking — off-by-one)
    for rnd in range(int(max_rounds) + 1):
        la = comp.select(
            F.col("id").alias("_ja"), F.col("label").alias("_ca")
        )
        lb = comp.select(
            F.col("id").alias("_jb"), F.col("label").alias("_cb")
        )
        cross = (
            e.join(la, e._a == la._ja)
            .join(lb, e._b == lb._jb)
            .where(F.col("_ca") != F.col("_cb"))
            .select("_a", "_b", "_w", "_ca", "_cb")
            .localCheckpoint(eager=True)
        )
        # early-exit probe on the materialized checkpoint, not a full
        # count — mid-cascade rounds answer from the first hit
        if cross.isEmpty():
            break
        if rnd == int(max_rounds):
            raise RuntimeError(
                f"boruvka_msf: cross-component edges remain after "
                f"max_rounds={max_rounds}; raise max_rounds "
                "(rounds needed ~ log2 of the largest component)"
            )
        st = F.struct("_w", "_a", "_b", "_ca", "_cb").alias("_e")
        # one row PER COMPONENT: its minimum incident cross edge under
        # the (w, a, b) total order — kept before the edge-level
        # distinct because it doubles as the merge's hook pointer
        perc = (
            cross.select(F.col("_ca").alias("_c"), st)
            .union(cross.select(F.col("_cb").alias("_c"), st))
            .groupBy("_c")
            .agg(F.min("_e").alias("_e"))
            .localCheckpoint(eager=True)
        )
        picked = perc.select("_e.*").distinct().select("_a", "_b", "_w")
        # msf is a union of ≤max_rounds checkpointed chosen-sets —
        # linear lineage, no per-round checkpoint needed
        msf = picked if msf is None else msf.unionByName(picked)
        # merge by hook + pointer doubling on the FUNCTIONAL pointer
        # graph parent(c) = other endpoint of c's min edge.  Under a
        # total edge order every pointer cycle is a mutual-min 2-cycle
        # (the cycle's lightest edge is chosen from both ends), so
        # rooting each 2-cycle at its smaller label and then doubling
        # parent ← parent[parent] converges to one representative per
        # merge tree in O(log depth) one-self-join rounds — strictly
        # lighter than the generic min_label_components call this
        # replaces (no neighbor-min groupBy, no vertex-set distinct,
        # no symmetrized edge checkpoint).  Label VALUES differ from
        # min-label's (root = 2-cycle min, not component min) but are
        # deterministic and consistent, which is all the next round's
        # grouping uses — the chosen edges and the forest are
        # unchanged (struct order decides on (w, a, b) alone).
        parent = (
            perc.select(
                F.col("_c").alias("id"),
                F.when(F.col("_e._ca") == F.col("_c"), F.col("_e._cb"))
                .otherwise(F.col("_e._ca"))
                .alias("par"),
            )
        )
        pj = parent.select(
            F.col("id").alias("_q"), F.col("par").alias("_qp")
        )
        parent = (
            parent.join(pj, parent.par == pj._q)
            .select(
                "id",
                F.when(
                    (F.col("_qp") == F.col("id"))
                    & (F.col("id") < F.col("par")),
                    F.col("id"),
                )
                .otherwise(F.col("par"))
                .alias("par"),
            )
            .localCheckpoint(eager=True)
        )
        for _ in range(int(component_iters)):
            pj = parent.select(
                F.col("id").alias("_q"), F.col("par").alias("_qp")
            )
            parent = (
                parent.join(pj, parent.par == pj._q)
                .select(
                    "id",
                    F.col("_qp").alias("par"),
                    (F.col("_qp") != F.col("par")).alias("_chg"),
                )
                .localCheckpoint(eager=True)
            )
            if parent.where(F.col("_chg")).isEmpty():
                break
        else:
            raise RuntimeError(
                "boruvka_msf.merge: pointer doubling did not converge "
                f"after component_iters={component_iters}; raise it "
                "(rounds needed ~ log2 of the merge-tree depth)"
            )
        mapping = parent.select(
            F.col("id").alias("_ml"), F.col("par").alias("_nl")
        )
        comp = (
            comp.join(mapping, comp.label == mapping._ml, "left")
            .select(
                "id",
                F.coalesce(F.col("_nl"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    if msf is None:
        msf = e.limit(0).select("_a", "_b", "_w")
    return msf.select(
        F.col("_a").alias(a_col),
        F.col("_b").alias(b_col),
        F.col("_w").alias(w_col),
    )


def boruvka_msf_sql(
    edges_src: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
    w_col: str = "w",
) -> str:
    """DuckDB twin of :func:`boruvka_msf` by Kruskal's invariant
    (cut/cycle property under the total order ``(w, a, b)``): an
    edge is in the unique MSF iff its endpoints are NOT connected
    using only strictly-smaller edges.  The recursive closure walks,
    per probe edge, the nodes reachable from the probe's ``a`` side
    through smaller edges; the probe survives iff its ``b`` is never
    reached — a different algorithm family from the operator's
    Borůvka hooking, so the hash match verifies the forest against
    the definition.  Standalone statement."""
    smaller = (
        "(e.w < r.pw OR (e.w = r.pw AND (e.a < r.pa "
        "OR (e.a = r.pa AND e.b < r.pb))))"
    )
    return f"""
        WITH RECURSIVE
        bmsf_e AS MATERIALIZED (
            SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b,
                   MIN(w) AS w
            FROM (SELECT {a_col} AS a, {b_col} AS b, {w_col} AS w
                  FROM {edges_src})
            WHERE a <> b GROUP BY 1, 2
        ),
        bmsf_reach AS (
            SELECT a AS pa, b AS pb, w AS pw, a AS node FROM bmsf_e
            UNION
            SELECT r.pa, r.pb, r.pw,
                   CASE WHEN e.a = r.node THEN e.b ELSE e.a END
            FROM bmsf_reach r JOIN bmsf_e e
              ON (e.a = r.node OR e.b = r.node) AND {smaller}
        )
        SELECT m.a AS {a_col}, m.b AS {b_col}, m.w AS {w_col}
        FROM bmsf_e m
        WHERE NOT EXISTS (
            SELECT 1 FROM bmsf_reach r
            WHERE r.pa = m.a AND r.pb = m.b AND r.node = m.b
        )
    """


def lt_influence(
    edges: DataFrame,
    seeds: DataFrame,
    theta_ppm: int = 500_000,
    max_rounds: int = 8,
) -> DataFrame:
    """Linear-threshold influence cascade (the Kempe–Kleinberg–Tardos
    LT model with DECLARED uniform thresholds — deterministic, no
    sampled thresholds): an inactive node activates when the summed
    weight of its ACTIVE in-neighbors reaches ``theta_ppm``, with the
    classic uniform weights ``w = 1e6 DIV in_degree`` (so a node's
    in-weights sum to ≤ 1e6 exactly).  The "how far does adoption
    spread from these seeds?" question — the dynamic counterpart of
    attack_robustness' static reachability.

    Exact and monotone: activation sums are integers and activation
    is irreversible, so the cascade has a unique fixpoint and the
    per-node activation ROUND is well-defined — no tie rules needed,
    parallelism-independent by construction.  Self-loops are dropped
    and parallel edges collapse (distinct in-neighbors; both stated).

    Scale: frontier-only propagation — each round joins the edge
    list against the NEWLY active nodes only and folds the delta
    into a cumulative received-weight table (monotone sums make the
    increment exact), so total work is O(E) across all rounds, not
    O(E · rounds); per-round lineage cuts via localCheckpoint.  The
    DuckDB twin (:func:`lt_influence_sql`) recomputes each round's
    activation sums from the FULL active set — a structurally
    different evaluation — so the incremental maintenance is what
    the hash verifies.  If the cascade is still growing after
    ``max_rounds`` the operator raises LOUDLY rather than return a
    truncated spread.

    Returns (node, round) for activated nodes; round 0 = seed."""
    if not 1 <= int(theta_ppm) <= 10**6:
        raise ValueError(f"theta_ppm in [1, 1e6]: {theta_ppm}")
    if int(max_rounds) < 1:
        raise ValueError(f"max_rounds must be >= 1: {max_rounds}")
    # (r06 second-pass note: the pagerank_quantized AQE-scoped loop was
    # tried here too — AQE erases the checkpointed partitioning, so the
    # edge list does re-shuffle per round — but A/B at both bench
    # scales showed the doc-graph is too small to pay AQE-off's static
    # task fan-out: old min 3.92 s vs scoped 4.60 s at sf0.1, parity at
    # 10×.  The scoped loop wins only when per-round shuffled bytes
    # dominate task-scheduling overhead (pagerank's pages-scale graph);
    # kept ambient-AQE here, negative result recorded.)
    # ONE pass builds the weighted edge list: the in-degree is a window
    # count over dst (the former groupBy+join-back recomputed the
    # distinct-edge shuffle twice), and the result is pre-partitioned
    # by src so the per-round frontier join never re-shuffles the edge
    # list — only the (small) frontier moves each round.
    we = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn(
            "_d", F.count(F.lit(1)).over(W.partitionBy("dst"))
        )
        .select(
            "src", "dst",
            F.expr("CAST(1000000 DIV _d AS BIGINT)").alias("_w"),
        )
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    # ONE state table instead of three (received-weight, newly, active):
    # (node, _t, round) with round NULL while inactive — the full-outer
    # merge below folds the round's contributions in, sets round on the
    # rows crossing theta, and is the loop's single checkpoint; the
    # former separate recv-union groupBy + anti-join pass disappear.
    # Monotonicity makes this exactly equivalent: activation is
    # irreversible and sums only grow, so "crossed theta and not yet
    # active" ⟺ "round IS NULL and new _t ≥ theta".
    state = (
        seeds.select("node").distinct()
        .select(
            "node",
            F.lit(0).cast("bigint").alias("_t"),
            F.lit(0).alias("round"),
        )
        .localCheckpoint(eager=True)
    )
    for r in range(1, int(max_rounds) + 2):
        frontier = state.where(F.col("round") == r - 1).select("node")
        # shuffled-hash build over the bounded frontier: downstream is
        # a hash aggregate, so an SMJ sort of the edge list is waste
        contrib = (
            we.join(
                frontier.hint("shuffle_hash"), we.src == frontier.node
            )
            .groupBy("dst")
            .agg(F.sum("_w").alias("_ct"))
            .select(F.col("dst").alias("node"), "_ct")
        )
        nt = F.coalesce(F.col("_t"), F.lit(0)) + F.coalesce(
            F.col("_ct"), F.lit(0)
        )
        state = (
            state.join(contrib, "node", "full_outer")
            .select(
                "node",
                nt.alias("_t"),
                F.coalesce(
                    F.col("round"),
                    F.when(nt >= F.lit(int(theta_ppm)), F.lit(r)),
                ).alias("round"),
            )
            .localCheckpoint(eager=True)
        )
        if state.where(F.col("round") == r).isEmpty():
            break
        if r > int(max_rounds):
            raise RuntimeError(
                f"lt_influence: cascade still growing after "
                f"max_rounds={max_rounds}; raise max_rounds "
                "(a cascade can take up to |V| rounds on a chain)"
            )
    return state.where(F.col("round").isNotNull()).select(
        "node", F.col("round").cast("int")
    )


def lt_influence_sql(
    edges_src: str,
    seeds_src: str,
    theta_ppm: int = 500_000,
    max_rounds: int = 8,
) -> str:
    """DuckDB twin of :func:`lt_influence` — identical weights and
    threshold, but each round's activation sums recomputed from the
    FULL active set (vs the operator's frontier-delta maintenance),
    unrolled as MATERIALIZED per-round CTEs.  Standalone."""
    th = int(theta_ppm)
    ctes = [
        f"""lt_e AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM {edges_src}
            WHERE src <> dst
        )""",
        """lt_we AS MATERIALIZED (
            SELECT e.src, e.dst,
                   CAST(1000000 // d.d AS BIGINT) AS w
            FROM lt_e e JOIN (
                SELECT dst, COUNT(*) AS d FROM lt_e GROUP BY 1
            ) d USING (dst)
        )""",
        f"""lt_a0 AS MATERIALIZED (
            SELECT DISTINCT node, 0 AS round FROM {seeds_src}
        )""",
    ]
    for r in range(1, int(max_rounds) + 1):
        ctes.append(f"""lt_n{r} AS MATERIALIZED (
            SELECT e.dst AS node, {r} AS round
            FROM lt_we e JOIN lt_a{r - 1} a ON a.node = e.src
            WHERE NOT EXISTS (SELECT 1 FROM lt_a{r - 1} x
                              WHERE x.node = e.dst)
            GROUP BY e.dst
            HAVING SUM(e.w) >= {th}
        )""")
        ctes.append(f"""lt_a{r} AS MATERIALIZED (
            SELECT * FROM lt_a{r - 1}
            UNION ALL SELECT * FROM lt_n{r}
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT node, CAST(round AS INTEGER) AS round
        FROM lt_a{int(max_rounds)}
    """
    )


_WP_INF = (1 << 62)  # internal seed-capacity sentinel (> any edge w)


def widest_path(
    nodes: DataFrame,
    seeds: DataFrame,
    edges: DataFrame,
    rounds: int,
) -> DataFrame:
    """Widest-path (bottleneck / maximum-capacity) distance from a
    seed set — the (max, min) semiring sibling of
    :func:`weighted_distance`'s min-plus: width(v) = the best
    achievable bottleneck, max over paths of the minimum edge
    capacity along the path.  The "how much can flow from the
    trusted set to v through its weakest link?" question — trust
    propagation, route capacity, quality-floor reachability — which
    min-plus cost structurally can't ask.

    Exact and bounded-honest: capacities are integers and max-min
    relaxation is monotone in path length, so after round k,
    width(v) is THE true optimum over paths of ≤ k edges (``rounds``
    is a path-length bound, not an approximation), NULL = no ≤
    k-edge path.  Seeds carry infinite source capacity internally
    (a sentinel > any edge; capacities are validated < 2⁶² loudly)
    and are EXCLUDED from the output — they are the query, not the
    answer (stated).

    Scale: the weighted_distance frontier pattern verbatim under
    the swapped semiring — only nodes whose width IMPROVED last
    round propagate (a better ≤ k+1-edge bottleneck must extend an
    improved ≤ k-edge one), 2 shuffles/round, re-entry on
    narrower-but-later-wider paths handled by the improvement test,
    lineage cut per round, empty frontier short-circuits.  The
    DuckDB twin (:func:`widest_path_sql`) unrolls the identical
    recurrence with no frontier cut, so the frontier optimization
    is what the hash verifies.

    ``edges``: (src, dst, w) BIGINT-castable capacities in
    [0, 2⁶²).  Returns (node, width) for non-seed nodes."""
    edges = (
        edges.select("src", "dst", F.col("w").cast("bigint").alias("w"))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    n_bad = edges.where(
        (F.col("w") < 0) | (F.col("w") >= F.lit(_WP_INF))
    ).count()
    if n_bad:
        raise ValueError(
            f"widest_path requires capacities in [0, 2^62); "
            f"found {n_bad} out-of-range edges"
        )
    seed_marked = nodes.join(
        seeds.select("node").distinct().withColumn("_s", F.lit(1)),
        "node",
        "left",
    )
    width = seed_marked.select(
        "node",
        F.when(F.col("_s").isNotNull(), F.lit(_WP_INF))
        .cast("bigint")
        .alias("width"),
    ).localCheckpoint(eager=True)
    frontier = width.where(F.col("width").isNotNull()).localCheckpoint(
        eager=True
    )
    for _ in range(rounds):
        if frontier.isEmpty():
            break
        nd = (
            edges.join(frontier, edges.src == frontier.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.max(F.least(F.col("width"), F.col("w"))).alias("_nw"))
        )
        relaxed = width.join(nd, "node", "left").select(
            "node",
            F.when(F.col("width").isNull(), F.col("_nw"))
            .when(F.col("_nw").isNull(), F.col("width"))
            .otherwise(F.greatest("width", "_nw"))
            .alias("width"),
        ).localCheckpoint(eager=True)
        frontier = (
            relaxed.alias("r")
            .join(width.alias("d"), "node")
            .where(
                F.col("r.width").isNotNull()
                & (
                    F.col("d.width").isNull()
                    | (F.col("r.width") > F.col("d.width"))
                )
            )
            .select("node", F.col("r.width").alias("width"))
            .localCheckpoint(eager=True)
        )
        width = relaxed
    return (
        width.join(seeds.select("node").distinct(), "node", "left_anti")
        .select("node", "width")
    )


def widest_path_sql(
    nodes_src: str, seeds_src: str, edges_src: str, rounds: int
) -> str:
    """DuckDB twin of :func:`widest_path`: the identical max-min
    relaxation unrolled as chained CTEs with NO frontier cut, same
    seed sentinel, seeds excluded at the end.  Standalone."""
    ctes = [
        f"wp_nd AS (SELECT node FROM {nodes_src})",
        f"wp_eg AS (SELECT src, dst, CAST(w AS BIGINT) AS w "
        f"FROM {edges_src})",
        f"wp_sd AS (SELECT DISTINCT node FROM {seeds_src})",
        f"""wp_d0 AS (
            SELECT wp_nd.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN CAST({_WP_INF} AS BIGINT) END AS width
            FROM wp_nd
            LEFT JOIN wp_sd s ON s.node = wp_nd.node
        )""",
    ]
    for i in range(1, rounds + 1):
        p = f"wp_d{i - 1}"
        ctes.append(f"""wp_d{i} AS MATERIALIZED (
            SELECT {p}.node,
                   CASE WHEN {p}.width IS NULL THEN c._nw
                        WHEN c._nw IS NULL THEN {p}.width
                        ELSE GREATEST({p}.width, c._nw) END AS width
            FROM {p}
            LEFT JOIN (
                SELECT wp_eg.dst AS node,
                       MAX(LEAST(r.width, wp_eg.w)) AS _nw
                FROM wp_eg
                JOIN {p} r ON wp_eg.src = r.node
                WHERE r.width IS NOT NULL
                GROUP BY wp_eg.dst
            ) c ON c.node = {p}.node
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT d.node, d.width FROM wp_d{rounds} d
        WHERE NOT EXISTS (SELECT 1 FROM wp_sd s WHERE s.node = d.node)
    """
    )


def greedy_matching(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    w_col: str = "w",
    max_rounds: int = 24,
) -> DataFrame:
    """Greedy maximal matching under the total order ``(w, a, b)`` —
    the one-to-one assignment layer of the ER stack: after blocking
    generates candidates and Fellegi–Sunter scores them, each record
    may match AT MOST ONE partner, best-score-first.  The result is
    exactly the LEXICOGRAPHICALLY FIRST maximal matching (what
    sequential best-first greedy produces), computed in parallel by
    the classic locally-minimal-edge rounds: an edge matches in a
    round iff it is the minimum incident edge of BOTH its endpoints
    among still-alive edges — precisely the edges sequential greedy
    would take before any conflicting neighbour — then matched
    nodes' edges drop out and the next layer becomes locally
    minimal.  Equivalence to sequential greedy is exact (standard
    result; the mirror test IS sequential greedy), so the output is
    deterministic and parallelism-independent.

    Self-loops are dropped, parallel edges keep their lightest
    weight (both stated).  Rounds: expected O(log E) on scored/
    hashed weights; the adversarial worst case (a monotone chain)
    is linear, so exhaustion raises LOUDLY rather than return a
    partial matching (stated; raise ``max_rounds`` or break chains
    upstream).  Each round is two per-node min aggregates + one
    anti-join, lineage cut per round.

    Returns matched edges (a_col, b_col, w_col), ``a < b``."""
    alive = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("_a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("_b"),
            F.col(w_col).cast("bigint").alias("_w"),
        )
        .where(F.col("_a") != F.col("_b"))
        .groupBy("_a", "_b")
        .agg(F.min("_w").alias("_w"))
        .localCheckpoint(eager=True)
    )
    matched = None
    # max_rounds+1 probes: the LAST probe exists only to certify that
    # alive is empty, so a matching finished in exactly max_rounds
    # rounds completes instead of raising (former for/else off-by-one)
    for rnd in range(int(max_rounds) + 1):
        if alive.isEmpty():
            break
        if rnd == int(max_rounds):
            raise RuntimeError(
                f"greedy_matching: alive edges remain after "
                f"max_rounds={max_rounds} (adversarial weight chains "
                "need up to |V|/2 rounds); raise max_rounds"
            )
        st = F.struct("_w", "_a", "_b").alias("_e")
        node_min = (
            alive.select(F.col("_a").alias("_n"), st)
            .union(alive.select(F.col("_b").alias("_n"), st))
            .groupBy("_n")
            .agg(F.min("_e").alias("_m"))
        )
        ma = node_min.select(
            F.col("_n").alias("_na"),
            F.col("_m._w").alias("_wa"),
            F.col("_m._a").alias("_aa"),
            F.col("_m._b").alias("_ba"),
        )
        mb = node_min.select(
            F.col("_n").alias("_nb"),
            F.col("_m._w").alias("_wb"),
            F.col("_m._a").alias("_ab"),
            F.col("_m._b").alias("_bb"),
        )
        local = (
            alive.join(ma, alive._a == ma._na)
            .where(
                (F.col("_wa") == F.col("_w"))
                & (F.col("_aa") == F.col("_a"))
                & (F.col("_ba") == F.col("_b"))
            )
            .join(mb, alive._b == mb._nb)
            .where(
                (F.col("_wb") == F.col("_w"))
                & (F.col("_ab") == F.col("_a"))
                & (F.col("_bb") == F.col("_b"))
            )
            .select("_a", "_b", "_w")
            .localCheckpoint(eager=True)
        )
        # matched is a union of ≤max_rounds checkpointed local-min sets
        # — linear lineage, no per-round checkpoint needed
        matched = local if matched is None else matched.unionByName(
            local
        )
        used = (
            local.select(F.col("_a").alias("_n"))
            .union(local.select("_b"))
            .distinct()
        )
        alive = (
            alive.join(used, alive._a == used._n, "left_anti")
            .join(used, alive._b == used._n, "left_anti")
            .localCheckpoint(eager=True)
        )
    if matched is None:
        matched = alive.limit(0)
    return matched.select(
        F.col("_a").alias(a_col),
        F.col("_b").alias(b_col),
        F.col("_w").alias(w_col),
    )


def greedy_matching_sql(
    edges_src: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
    w_col: str = "w",
    max_rounds: int = 24,
) -> str:
    """DuckDB twin of :func:`greedy_matching` — the identical
    locally-minimal-edge rounds unrolled as MATERIALIZED CTEs (the
    cross-family leg is the tests' sequential-greedy mirror, which
    the rounds provably equal).  Standalone statement."""
    ctes = [
        f"""gm_a0 AS MATERIALIZED (
            SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b,
                   MIN(w) AS w
            FROM (SELECT {a_col} AS a, {b_col} AS b,
                         CAST({w_col} AS BIGINT) AS w
                  FROM {edges_src})
            WHERE a <> b GROUP BY 1, 2
        )""",
    ]
    for r in range(1, int(max_rounds) + 1):
        p = f"gm_a{r - 1}"
        ctes.append(f"""gm_nm{r} AS MATERIALIZED (
            SELECT n, MIN(STRUCT_PACK(w := w, a := a, b := b)) AS m
            FROM (
                SELECT a AS n, a, b, w FROM {p}
                UNION ALL
                SELECT b AS n, a, b, w FROM {p}
            ) GROUP BY 1
        )""")
        ctes.append(f"""gm_m{r} AS MATERIALIZED (
            SELECT e.a, e.b, e.w
            FROM {p} e
            JOIN gm_nm{r} x ON x.n = e.a
                           AND x.m.w = e.w AND x.m.a = e.a
                           AND x.m.b = e.b
            JOIN gm_nm{r} y ON y.n = e.b
                           AND y.m.w = e.w AND y.m.a = e.a
                           AND y.m.b = e.b
        )""")
        ctes.append(f"""gm_a{r} AS MATERIALIZED (
            SELECT e.a, e.b, e.w FROM {p} e
            WHERE NOT EXISTS (
                SELECT 1 FROM gm_m{r} m
                WHERE m.a IN (e.a, e.b) OR m.b IN (e.a, e.b)
            )
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT a, b, w FROM gm_m{r}"
        for r in range(1, int(max_rounds) + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT a AS {a_col}, b AS {b_col}, w AS {w_col}
        FROM ({union})
    """
    )
