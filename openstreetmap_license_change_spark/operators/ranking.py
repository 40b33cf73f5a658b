"""Order-based analytics: Pareto skyline and reciprocal-rank fusion.

Two operators that rank/select rows by ORDER relations rather than
values — the curation counterparts of the retrieval stack (bm25_topk,
ann/ivf search, pagerank):

- :func:`skyline` — the maximal (Pareto-optimal) rows under two
  integer criteria: a row survives iff no other row is ≥ in both and
  > in at least one.  The multi-objective corpus-selection primitive
  ("longest documents that are also the densest" — no single weighting
  collapses the trade-off).  Bucket-pruned two-level max structure:
  never a pairwise comparison, one data shuffle.

- :func:`rrf_fusion` — reciprocal-rank fusion of top-k retrieval runs
  (Cormack & Clarke's 1/(k+rank) vote, the standard hybrid-search
  combiner for lexical × semantic × authority rankings), in exact
  integer arithmetic (scale DIV (k+rank)) so the DuckDB twin
  hash-matches.

Reference parity: the reference picks "best" versions by lexical
order rules (osm_history.rb's max-version selection, tags.rb's
significance ordering); these operators generalize single-key order
selection to multi-criteria and multi-run order selection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def skyline(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    n_buckets: int = 64,
) -> DataFrame:
    """Pareto-maximal rows under integer criteria (``x``, ``y``), both
    maximized (negate a column upstream to minimize): row p survives
    iff NO row q has q.x ≥ p.x ∧ q.y ≥ p.y with at least one strict.
    Duplicates of a frontier point all survive (neither dominates).
    All input columns pass through.

    Plan — never a pairwise comparison (the O(n²) dominance test is
    the ORACLE's job, see the NOT EXISTS twin in `__spark_entry__`):

    1. per-x maxima: groupBy(x) → ymax — the only data-sized shuffle.
    2. coarse x-buckets (fixed width from one bounded 2-value driver
       agg): per-bucket max(ymax) is ≤ ``n_buckets`` rows; the
       strictly-later-bucket suffix max comes from a tiny triangular
       self-join (no global window — the single-partition-window trap
       at scale).
    3. within-bucket strict-x prefix max: ONE window partitioned by
       bucket over the per-x rows, ORDER BY x DESC ROWS UNBOUNDED
       PRECEDING..1 PRECEDING (rows are per-x unique, so the frame is
       exactly {x' > x} within the bucket).
    4. x survives iff ymax > max(within-bucket prefix, bucket suffix)
       (NULL-skipping greatest); the frontier joins back to the input
       on (x, y = ymax) — same-x domination is exactly y < ymax.

    Per-bucket window width is bounded by the bucket's integer range
    (range/n_buckets distinct x values at most), not by row count —
    the partitioned-window contract at 10¹² rows."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be ≥ 1: {n_buckets}")
    # pts feeds THREE consumers (bounds, the per-x aggregate, and the
    # final join-back); checkpoint it so an expensive upstream (e.g. a
    # regex token count over the text corpus) runs once per execution
    pts = df.withColumn("_sx", F.col(x).cast("bigint")).withColumn(
        "_sy", F.col(y).cast("bigint")
    ).localCheckpoint(eager=True)
    bounds = pts.agg(
        F.min("_sx").alias("lo"), F.max("_sx").alias("hi")
    ).head()
    if bounds is None or bounds["lo"] is None:
        return df.limit(0)
    lo, hi = bounds["lo"], bounds["hi"]
    width = max(1, (hi - lo) // n_buckets + 1)

    per_x = pts.groupBy(F.col("_sx").alias("_x")).agg(
        F.max("_sy").alias("_ymax")
    ).withColumn("_b", (F.col("_x") - F.lit(lo)) / F.lit(width))
    per_x = per_x.withColumn("_b", F.floor("_b").cast("bigint"))

    bmax = per_x.groupBy("_b").agg(F.max("_ymax").alias("_bymax"))
    suffix = (
        bmax.alias("a")
        .join(bmax.alias("s"), F.col("s._b") > F.col("a._b"), "left")
        .groupBy(F.col("a._b").alias("_b"))
        .agg(F.max("s._bymax").alias("_suf"))
    )

    w = (
        W.partitionBy("_b")
        .orderBy(F.col("_x").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    marked = (
        per_x.withColumn("_pre", F.max("_ymax").over(w))
        .join(F.broadcast(suffix), "_b")
        .withColumn("_dom", F.greatest("_pre", "_suf"))
        .where(F.col("_dom").isNull() | (F.col("_ymax") > F.col("_dom")))
        .select("_x", "_ymax")
    )
    return pts.join(
        F.broadcast(marked),
        (pts["_sx"] == marked["_x"]) & (pts["_sy"] == marked["_ymax"]),
    ).select(*df.columns)


def skyline_sql(points_cte: str, x: str = "x", y: str = "y") -> str:
    """DuckDB twin of :func:`skyline` — deliberately NOT the bucketed
    algorithm but the dominance CHARACTERIZATION itself (the hull
    witness-edge pattern): p survives iff no q dominates it.  O(n²)
    per call — an oracle, not an engine.  ``points_cte`` must name a
    relation; all its columns pass through."""
    return f"""
        SELECT p.* FROM {points_cte} p
        WHERE NOT EXISTS (
            SELECT 1 FROM {points_cte} q
            WHERE q.{x} >= p.{x} AND q.{y} >= p.{y}
              AND (q.{x} > p.{x} OR q.{y} > p.{y})
        )
    """


RRF_SCALE = 1_000_000_000


def rrf_fusion(
    runs: Sequence[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    scale: int = RRF_SCALE,
    max_run_size: int = 1000,
) -> DataFrame:
    """Reciprocal-rank fusion of top-k retrieval runs: each run votes
    ``scale DIV (rrf_k + rank)`` for its rank-r item (ordinal ranks,
    score DESC, ties broken ``id_col`` ASC — a total order, so the
    fusion is deterministic at any parallelism); fused score = the sum
    over runs, missing items simply get no vote.  Exact integer floor
    division on both engines (Spark ``DIV`` ≡ DuckDB ``//`` on
    non-negatives), so every fused score hash-verifies.

    Ranks are computed with a per-run triangular self-join (count of
    strictly-better rows + 1) rather than a window: runs are TOP-K
    LISTS by contract — the operator fuses retrieval OUTPUTS (bm25's
    orderBy+limit, pq_search's top-k, a pagerank head), never raw
    corpora — so |run| is bounded and the join is |run|² tiny.  The
    bound is enforced LOUDLY (count > ``max_run_size`` raises; the
    kcore/LSH non-convergence contract: never silently quadratic).

    Returns (``id_col``, rrf_score, n_runs) for every item in ≥ 1 run,
    unordered (downstream takes its own top-k)."""
    if len(runs) < 2:
        raise ValueError(f"rrf_fusion needs ≥ 2 runs: {len(runs)}")
    if rrf_k < 1 or scale < 1:
        raise ValueError(f"rrf_k and scale must be ≥ 1: {rrf_k}, {scale}")
    ranked = []
    for i, run in enumerate(runs):
        n = run.count()
        if n > max_run_size:
            raise ValueError(
                f"run {i} has {n} rows > max_run_size={max_run_size}; "
                "rrf_fusion fuses TOP-K lists — truncate the run first"
            )
        r = run.select(
            F.col(id_col).alias("_id"),
            F.col(score_col).cast("bigint").alias("_sc"),
        )
        better = (
            r.alias("p")
            .join(
                r.alias("q"),
                (F.col("q._sc") > F.col("p._sc"))
                | (
                    (F.col("q._sc") == F.col("p._sc"))
                    & (F.col("q._id") < F.col("p._id"))
                ),
                "left",
            )
            .groupBy(F.col("p._id").alias("_id"))
            .agg((F.count(F.col("q._id")) + 1).alias("_rank"))
        )
        ranked.append(
            better.select(
                "_id",
                F.expr(f"{int(scale)} DIV ({int(rrf_k)} + _rank)").alias(
                    "_vote"
                ),
            )
        )
    allv = ranked[0]
    for r in ranked[1:]:
        allv = allv.unionByName(r)
    return allv.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum("_vote").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_runs"),
    )


def rrf_fusion_sql(
    run_sqls: Sequence[str],
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    scale: int = RRF_SCALE,
) -> str:
    """DuckDB twin of :func:`rrf_fusion`: identical ordinal ranking
    (strictly-better count + 1, same tie-break) and identical integer
    floor-div votes over the given run subqueries (each yielding
    (``id_col``, ``score_col``)).  CTE names are rf_*-namespaced."""
    ctes, selects = [], []
    for i, sql in enumerate(run_sqls):
        ctes.append(f"rf_run{i} AS MATERIALIZED (SELECT {id_col} AS _id, "
                    f"CAST({score_col} AS BIGINT) AS _sc FROM ({sql}))")
        ctes.append(f"""rf_rk{i} AS (
            SELECT p._id,
                   1 + (SELECT COUNT(*) FROM rf_run{i} q
                        WHERE q._sc > p._sc
                           OR (q._sc = p._sc AND q._id < p._id)) AS _rank
            FROM rf_run{i} p
        )""")
        selects.append(
            f"SELECT _id, {int(scale)} // ({int(rrf_k)} + _rank) AS _vote "
            f"FROM rf_rk{i}"
        )
    union = " UNION ALL ".join(selects)
    return f"""
        WITH {",".join(ctes)}
        SELECT _id AS {id_col},
               CAST(SUM(_vote) AS BIGINT) AS rrf_score,
               CAST(COUNT(*) AS BIGINT) AS n_runs
        FROM ({union}) GROUP BY _id
    """


def kendall_tau(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group Kendall rank correlation between two integer metrics,
    computed on the deterministic bottom-``k``-hash sample (the house
    mergeable sample shared with sampled_quantiles) — pair agreement
    as ORDER statistics, the correlation the curation stack can trust
    when metric scales are arbitrary (quality score vs length, BM25 vs
    PageRank): invariant under any monotone rescaling of either axis.

    Kendall is inherently pairwise; at 100 TB an exact per-group O(n²)
    is off the table and the O(n·log n) inversion merge doesn't
    distribute.  The scale design is therefore SAMPLE-THEN-EXACT:
    ≤ k rows per group cross the shuffle (WindowGroupLimit bottom-k),
    then the triangular self-join is k²/2 pairs per group REGARDLESS
    of group size — bounded, broadcastable, and the sample itself is
    mergeable.  Sampling error on tau is ~1/√k of rank noise
    (regression-pinned on a planted monotone + noise series).

    Concordance is decided by COMPARISONS ONLY (never the
    (Δx·Δy)-sign product, which can overflow int64 on wide metrics).
    Ties: pairs tied on either axis count in ``tie_pairs`` and are
    excluded from the Goodman-Kruskal ``gamma_ppm`` = (C−D)·10⁶ DIV
    (C+D); ``tau_a_ppm`` = (C−D)·10⁶ DIV (n(n−1)/2) uses all pairs.
    Both truncating-DIV int64, NULL when undefined (n < 2 sampled, or
    all pairs tied for gamma).

    Returns (group, n_sample, concordant, discordant, tie_pairs,
    tau_a_ppm, gamma_ppm)."""
    from .sketches import kmv_hash

    if not 4 <= k <= 2048:
        raise ValueError(f"k must be in [4, 2048], got {k}")
    h = kmv_hash(F.col(key_col)).alias("_h")
    w = W.partitionBy(group_col).orderBy("_h", key_col)
    kept = (
        df.select(group_col, x_col, y_col, key_col)
        .select(group_col, x_col, y_col, key_col, h)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            F.col(group_col).alias("_g"),
            F.col(x_col).alias("_x"),
            F.col(y_col).alias("_y"),
            F.col(key_col).alias("_key"),
        )
    )
    a, b = kept.alias("a"), kept.alias("b")
    ax, ay = F.col("a._x"), F.col("a._y")
    bx, by = F.col("b._x"), F.col("b._y")
    conc = ((ax < bx) & (ay < by)) | ((ax > bx) & (ay > by))
    disc = ((ax < bx) & (ay > by)) | ((ax > bx) & (ay < by))
    pairs = a.join(
        b,
        (F.col("a._g") == F.col("b._g"))
        & (F.col("a._key") < F.col("b._key")),
    ).groupBy(F.col("a._g").alias("_g")).agg(
        F.count_if(conc).alias("concordant"),
        F.count_if(disc).alias("discordant"),
        F.count_if(~conc & ~disc).alias("tie_pairs"),
    )
    n = kept.groupBy("_g").agg(F.count(F.lit(1)).alias("n_sample"))
    return (
        n.join(F.broadcast(pairs), "_g", "left")
        .select(
            F.col("_g").alias(group_col),
            "n_sample",
            F.coalesce("concordant", F.lit(0)).alias("concordant"),
            F.coalesce("discordant", F.lit(0)).alias("discordant"),
            F.coalesce("tie_pairs", F.lit(0)).alias("tie_pairs"),
        )
        .select(
            group_col,
            "n_sample",
            "concordant",
            "discordant",
            "tie_pairs",
            F.when(
                F.col("n_sample") >= 2,
                F.expr(
                    "((concordant - discordant) * 1000000)"
                    " DIV ((n_sample * (n_sample - 1)) DIV 2)"
                ),
            ).cast("bigint").alias("tau_a_ppm"),
            F.when(
                F.col("concordant") + F.col("discordant") > 0,
                F.expr(
                    "((concordant - discordant) * 1000000)"
                    " DIV (concordant + discordant)"
                ),
            ).cast("bigint").alias("gamma_ppm"),
        )
    )


def kendall_tau_sql(
    src: str,
    group_col: str,
    x_col: str,
    y_col: str,
    key_col: str,
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kendall_tau` (standalone statement;
    kt_*-namespaced CTEs)."""
    from .sketches import kmv_hash_sql

    h = kmv_hash_sql(key_col)
    return f"""
        WITH kt_kept AS (
            SELECT {group_col} AS _g, {x_col} AS _x, {y_col} AS _y,
                   {key_col} AS _key
            FROM (
                SELECT {group_col}, {x_col}, {y_col}, {key_col},
                       ROW_NUMBER() OVER (PARTITION BY {group_col}
                                          ORDER BY {h}, {key_col}) AS _rk
                FROM {src}
            ) WHERE _rk <= {k}
        ),
        kt_pairs AS (
            SELECT a._g,
                   COUNT(*) FILTER (
                       (a._x < b._x AND a._y < b._y)
                       OR (a._x > b._x AND a._y > b._y)) AS concordant,
                   COUNT(*) FILTER (
                       (a._x < b._x AND a._y > b._y)
                       OR (a._x > b._x AND a._y < b._y)) AS discordant,
                   COUNT(*) FILTER (
                       a._x = b._x OR a._y = b._y) AS tie_pairs
            FROM kt_kept a JOIN kt_kept b
              ON a._g = b._g AND a._key < b._key
            GROUP BY a._g
        ),
        kt_n AS (
            SELECT _g, COUNT(*) AS n_sample FROM kt_kept GROUP BY _g
        )
        SELECT n._g AS {group_col},
               n.n_sample,
               CAST(COALESCE(p.concordant, 0) AS BIGINT) AS concordant,
               CAST(COALESCE(p.discordant, 0) AS BIGINT) AS discordant,
               CAST(COALESCE(p.tie_pairs, 0) AS BIGINT) AS tie_pairs,
               CAST(CASE WHEN n.n_sample >= 2 THEN
                   ((COALESCE(p.concordant, 0) - COALESCE(p.discordant, 0))
                    * 1000000)
                   // ((n.n_sample * (n.n_sample - 1)) // 2)
               END AS BIGINT) AS tau_a_ppm,
               CAST(CASE WHEN COALESCE(p.concordant, 0)
                              + COALESCE(p.discordant, 0) > 0 THEN
                   ((p.concordant - p.discordant) * 1000000)
                   // (p.concordant + p.discordant)
               END AS BIGINT) AS gamma_ppm
        FROM kt_n n LEFT JOIN kt_pairs p USING (_g)
    """


def spearman_rho(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group Spearman rank correlation on the deterministic
    bottom-``k``-hash sample — the magnitude-sensitive companion of
    :func:`kendall_tau` (tau counts pair inversions; rho is Pearson
    over ranks, so a few far-displaced outliers move it more): the
    standard second opinion when two quality metrics are compared.

    Exact arithmetic end-to-end, including ties: each axis takes
    DOUBLED average ranks (R₂ = 2·min_rank + tie_count − 1 — always
    an integer, exactly 2× the fractional average rank; the 2×
    cancels in the correlation), then the Pearson form

        rho = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    is evaluated as exact integers with the square root taken ONCE on
    the final ratio:  q = (num²·10¹²) DIV (dx·dy)  (≤ 10¹² by
    Cauchy–Schwarz, all operands non-negative), and
    rho_ppm = sign(num)·isqrt(q) where isqrt is the EXACT integer
    square root — a float-sqrt seed (IEEE-correctly-rounded in both
    engines, so off by ≤ 1 on a ≤ 2⁵³ operand) lowered by 2 and
    repaired by three monotone integer comparisons.  No float enters
    the hash-relevant digits.

    Scale design is kendall's sample-then-exact: ≤ k rows per group
    cross the shuffle (WindowGroupLimit bottom-k on the mergeable
    kmv hash), then two rank windows + one aggregation per group —
    never a pair join.  Overflow bound: with doubled ranks ≤ 2k every
    moment term ≤ 4k⁴ and num²·10¹² ≤ 16k⁸·10¹² needs k ≤ 1024 to
    stay inside decimal(38)/HUGEINT — enforced.

    Degenerate groups (n < 2, or a constant axis making dx·dy = 0)
    emit NULL.  Returns (group, n_sample, rho_ppm)."""
    from .sketches import kmv_hash

    if not 4 <= k <= 1024:
        raise ValueError(f"k must be in [4, 1024], got {k}")
    h = kmv_hash(F.col(key_col)).alias("_h")
    w = W.partitionBy(group_col).orderBy("_h", key_col)
    kept = (
        df.select(group_col, x_col, y_col, key_col)
        .select(group_col, x_col, y_col, key_col, h)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            F.col(group_col).alias("_g"),
            F.col(x_col).alias("_x"),
            F.col(y_col).alias("_y"),
        )
    )
    rx = (
        2 * F.rank().over(W.partitionBy("_g").orderBy("_x"))
        + F.count(F.lit(1)).over(W.partitionBy("_g", "_x"))
        - 1
    ).cast("bigint")
    ry = (
        2 * F.rank().over(W.partitionBy("_g").orderBy("_y"))
        + F.count(F.lit(1)).over(W.partitionBy("_g", "_y"))
        - 1
    ).cast("bigint")
    ranked = kept.withColumn("_rx", rx).withColumn("_ry", ry)
    dec = "decimal(38,0)"
    mom = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.expr("_rx * _rx")).alias("_sxx"),
        F.sum(F.expr("_ry * _ry")).alias("_syy"),
        F.sum(F.expr("_rx * _ry")).alias("_sxy"),
    )
    num = f"(CAST(_n AS {dec}) * _sxy - CAST(_sx AS {dec}) * _sy)"
    dx = f"(CAST(_n AS {dec}) * _sxx - CAST(_sx AS {dec}) * _sx)"
    dy = f"(CAST(_n AS {dec}) * _syy - CAST(_sy AS {dec}) * _sy)"
    q = f"CAST(({num} * {num} * 1000000000000) DIV ({dx} * {dy}) AS BIGINT)"
    s0 = f"GREATEST(CAST(SQRT(CAST({q} AS DOUBLE)) AS BIGINT) - 2, 0)"
    isqrt = (
        f"({s0} + IF(({s0}+1)*({s0}+1) <= {q}, 1, 0)"
        f" + IF(({s0}+2)*({s0}+2) <= {q}, 1, 0)"
        f" + IF(({s0}+3)*({s0}+3) <= {q}, 1, 0))"
    )
    return mom.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n_sample"),
        F.expr(
            f"CAST(CASE WHEN _n < 2 OR {dx} = 0 OR {dy} = 0 THEN NULL "
            f"WHEN {num} < 0 THEN -{isqrt} ELSE {isqrt} END AS BIGINT)"
        ).alias("rho_ppm"),
    )


def spearman_rho_sql(
    src: str,
    group_col: str,
    x_col: str,
    y_col: str,
    key_col: str,
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`spearman_rho` (standalone statement;
    sr_*-namespaced CTEs)."""
    from .sketches import kmv_hash_sql

    if not 4 <= k <= 1024:
        raise ValueError(f"k must be in [4, 1024], got {k}")
    h = kmv_hash_sql(key_col)
    num = "(CAST(_n AS HUGEINT) * _sxy - CAST(_sx AS HUGEINT) * _sy)"
    dx = "(CAST(_n AS HUGEINT) * _sxx - CAST(_sx AS HUGEINT) * _sx)"
    dy = "(CAST(_n AS HUGEINT) * _syy - CAST(_sy AS HUGEINT) * _sy)"
    q = (
        f"CAST(({num} * {num} * 1000000000000)"
        f" // ({dx} * {dy}) AS BIGINT)"
    )
    s0 = f"GREATEST(CAST(SQRT(CAST({q} AS DOUBLE)) AS BIGINT) - 2, 0)"
    isqrt = (
        f"({s0} + CASE WHEN ({s0}+1)*({s0}+1) <= {q} THEN 1 ELSE 0 END"
        f" + CASE WHEN ({s0}+2)*({s0}+2) <= {q} THEN 1 ELSE 0 END"
        f" + CASE WHEN ({s0}+3)*({s0}+3) <= {q} THEN 1 ELSE 0 END)"
    )
    return f"""
        WITH sr_kept AS (
            SELECT _g, _x, _y FROM (
                SELECT {group_col} AS _g, {x_col} AS _x, {y_col} AS _y,
                       ROW_NUMBER() OVER (PARTITION BY {group_col}
                                          ORDER BY {h}, {key_col}) AS _rk
                FROM {src}
            ) WHERE _rk <= {k}
        ),
        sr_ranked AS (
            SELECT _g,
                   CAST(2 * RANK() OVER (PARTITION BY _g ORDER BY _x)
                        + COUNT(*) OVER (PARTITION BY _g, _x) - 1
                        AS BIGINT) AS _rx,
                   CAST(2 * RANK() OVER (PARTITION BY _g ORDER BY _y)
                        + COUNT(*) OVER (PARTITION BY _g, _y) - 1
                        AS BIGINT) AS _ry
            FROM sr_kept
        ),
        sr_mom AS (
            SELECT _g, COUNT(*) AS _n,
                   SUM(_rx) AS _sx, SUM(_ry) AS _sy,
                   SUM(_rx * _rx) AS _sxx, SUM(_ry * _ry) AS _syy,
                   SUM(_rx * _ry) AS _sxy
            FROM sr_ranked GROUP BY _g
        )
        SELECT _g AS {group_col},
               CAST(_n AS BIGINT) AS n_sample,
               CAST(CASE WHEN _n < 2 OR {dx} = 0 OR {dy} = 0 THEN NULL
                    WHEN {num} < 0 THEN -{isqrt} ELSE {isqrt}
                    END AS BIGINT) AS rho_ppm
        FROM sr_mom
    """
