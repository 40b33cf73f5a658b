"""Deterministic sampling / data-curation operators.

A training-data pipeline needs samples that are REPRODUCIBLE across
runs, engines, and cluster sizes — `rand()` is none of those.  Every
operator here derives its randomness from the house 31-bit polynomial
rolling hash (`dedup.token_hash`, DuckDB twin `token_hash_sql`), so
the selected set is a pure function of the data and fully
oracle-checkable:

* deterministic_sample — keep ~1/denom of rows by key-hash residue.
  Map-side filter, zero shuffle, pushes below joins; at 100 TB this is
  the only sampling shape that costs nothing (no shuffle, no state).
* stratified_sample  — EXACTLY k rows per stratum, chosen by hash
  order (a deterministic reservoir).  One shuffle on the stratum key;
  Spark's WindowGroupLimit pushes the top-k below the exchange, so
  only ~k·partitions rows cross the wire per stratum.
* group_topk         — top-k rows per group by an explicit order
  (quality curation: "best k documents per language").  Same
  WindowGroupLimit shape.

Reference tie-in: the reference bot throttles work per region/batch
(run_bot.rb:41-103) but has no sampling; these operators are part of
the beyond-the-reference LLM-pipeline surface (SURVEY §6 scope).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import token_hash


def sample_hash_col(key: Column) -> Column:
    """The sampling hash: house polynomial hash of the stringified
    key — stable across engines, sessions, and partitionings."""
    return token_hash(key.cast("string"))


def deterministic_sample(
    df: DataFrame, denom: int = 10, key_col: str = "doc_id"
) -> DataFrame:
    """Keep rows whose key-hash ≡ 0 (mod denom) — a reproducible
    ~1/denom sample.  The filter is a scan-level predicate: no
    shuffle, no state, and the SAME rows are kept no matter how the
    data is partitioned or how many executors run."""
    if denom < 1:
        raise ValueError(f"denom must be >= 1, got {denom}")
    return df.where(sample_hash_col(F.col(key_col)) % denom == 0)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum — hash-ordered, so
    the choice is deterministic and unbiased by physical row order.
    Ties on the hash break by the key itself (total order)."""
    h = sample_hash_col(F.col(key_col))
    w = W.partitionBy(stratum_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_sr", F.row_number().over(w))
        .where(F.col("_sr") <= k)
        .drop("_sr")
    )


def group_topk(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k rows per group under an explicit (deterministic!) order —
    the curation primitive ("best k documents per language by
    quality").  Callers must include a unique tie-break in
    ``order_cols`` or ranks are nondeterministic.  Physical shape:
    row_number window → WindowGroupLimit partial/final, so only local
    top-k rows cross the exchange (same pushdown knn_in_cell relies
    on, see PLANS.md)."""
    w = W.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn(rank_name, F.row_number().over(w)).where(
        F.col(rank_name) <= k
    )


def mixture_resample(
    docs: DataFrame,
    targets: "dict[str, int]",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    scale: int = 10**6,
) -> DataFrame:
    """Data-mixture rebalancing: downsample each language (or any
    stratum) so token totals match the INTEGER weight ratios in
    ``targets`` — the Pile/ROOTS-style mixture step between curation
    and training.  The largest feasible corpus is taken: the binding
    stratum keeps ~everything and every other stratum downsamples to
    weight-proportional token mass (no upsampling — duplication is a
    training-recipe choice, not a sampling one).

    All arithmetic is integer: with toks_l the stratum token total and
    w_l its weight, budget = min_l(toks_l·scale DIV w_l) and the
    per-stratum keep threshold is (budget·w_l) DIV toks_l ∈ [0,
    scale]; a document survives iff its id's house-hash residue mod
    ``scale`` falls below its stratum threshold — reproducible across
    engines, partitionings, and cluster sizes (the
    deterministic_sample contract).  Selection is doc-level, so the
    ACHIEVED token share fluctuates by ~1/√docs around the target
    (stated, not hidden); strata absent from ``targets`` are dropped.

    Plan: one stratum aggregate (n_strata rows) → 1-row min → both
    broadcast back; the keep filter is a MAP-SIDE predicate after
    broadcast-only joins — the fact table never shuffles (plan-
    pinned).  Returns the surviving rows + (n_tokens, keep_thresh).
    """
    from .textops import token_count

    if not targets or any(w <= 0 for w in targets.values()):
        raise ValueError("targets must be non-empty positive weights")
    wdf = docs.sparkSession.createDataFrame(
        sorted(targets.items()), f"{lang_col} string, _w bigint"
    )
    base = (
        docs.join(F.broadcast(wdf), lang_col)
        .withColumn("n_tokens", token_count(F.col(text_col)))
    )
    per = base.groupBy(lang_col, "_w").agg(
        F.sum("n_tokens").cast("bigint").alias("_toks")
    )
    budget = per.agg(
        F.min(F.expr(f"(_toks * {int(scale)}) DIV _w")).alias("_budget")
    )
    thr = per.crossJoin(F.broadcast(budget)).select(
        lang_col,
        F.expr("CAST((_budget * _w) DIV _toks AS BIGINT)").alias(
            "keep_thresh"
        ),
    )
    # residue: the polynomial hash alone is near-identity on short
    # numeric ids (contiguous id ranges land in contiguous residue
    # bands — an all-or-nothing selection per range), so it is routed
    # through the KMV avalanche mix before taking the residue
    from .sketches import kmv_hash

    r = kmv_hash(sample_hash_col(F.col(id_col))) % F.lit(int(scale))
    return (
        base.join(F.broadcast(thr), lang_col)
        .where(r < F.col("keep_thresh"))
        .drop("_w")
    )


def mixture_resample_sql(
    src: str,
    targets: "dict[str, int]",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`mixture_resample` (standalone; same
    integer budget/threshold algebra and house hash residue)."""
    from .dedup import token_hash_sql
    from .sketches import kmv_hash_sql

    wvals = ", ".join(
        f"('{k}', {int(v)})" for k, v in sorted(targets.items())
    )
    ntok = (
        f"CASE WHEN trim({text_col}) = '' THEN 0 ELSE "
        f"len(string_split_regex(trim({text_col}), '\\s+')) END"
    )
    h = kmv_hash_sql(
        "(" + token_hash_sql(f"CAST({id_col} AS VARCHAR)") + ")"
    )
    return f"""
        WITH mx_w({lang_col}, _w) AS (VALUES {wvals}),
        mx_base AS (
            SELECT s.*, {ntok} AS n_tokens, w._w
            FROM {src} s JOIN mx_w w USING ({lang_col})
        ),
        mx_per AS (
            SELECT {lang_col}, _w,
                   CAST(SUM(n_tokens) AS BIGINT) AS _toks
            FROM mx_base GROUP BY 1, 2
        ),
        mx_budget AS (
            SELECT MIN((_toks * {int(scale)}) // _w) AS _budget
            FROM mx_per
        ),
        mx_thr AS (
            SELECT {lang_col},
                   CAST((b._budget * _w) // _toks AS BIGINT)
                       AS keep_thresh
            FROM mx_per CROSS JOIN mx_budget b
        )
        SELECT b.* EXCLUDE (_w), t.keep_thresh
        FROM mx_base b JOIN mx_thr t USING ({lang_col})
        WHERE ({h}) % {int(scale)} < t.keep_thresh
    """


WS_REPLICA_PRIME = 999_983


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    max_weight: int = 4096,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    replica-minimum race: item i gets priority = min over its
    ``weight`` virtual replicas of mix(id·P + r), and the bottom-``n``
    priorities win — the integer-exact stand-in for A-Res/A-ExpJ
    (whose u^(1/w) keys are float-divergent across engines): the
    minimum of w discrete uniforms stochastically dominates the
    minimum of fewer, so selection probability is monotone in weight,
    zero-weight items are never drawn, and a fixed corpus always
    yields the SAME sample (the reproducibility a training-data
    pipeline needs for lineage).

    Selection routes through :func:`sketches.kmv_hash` (the
    mixture_resample lesson: the raw polynomial hash is near-identity
    on short numeric ids — contiguous ids would race in id order).

    Scale shape: one bounded explode (Σ min(w, max_weight) rows —
    the ``assert_true`` guard fails LOUD on an oversized weight
    instead of silently fanning out), a map-side-combined min per id,
    and a TakeOrderedAndProject bottom-n — no window, no full sort.
    Priorities are also MERGEABLE (min per id across corpus shards,
    then global bottom-n), the sketch-family contract.

    Ties break by ``id_col`` ascending.  Returns (id, weight,
    priority) for the ``n`` winners."""
    from .sketches import kmv_hash

    if n < 1:
        raise ValueError(f"n must be ≥ 1: {n}")
    w = F.col(weight_col).cast("bigint")
    guard = F.assert_true(
        w <= F.lit(int(max_weight)),
        F.lit(
            f"weight exceeds max_weight={max_weight}; quantize weights "
            "or raise the cap (explode fan-out is Σ weights)"
        ),
    )
    base = df.select(
        F.col(id_col), w.alias("_w"), F.when(guard.isNull(), w).alias("_wg")
    ).where(F.col("_w") > 0)
    fan = base.select(
        id_col, "_w",
        F.explode(F.sequence(F.lit(0), F.col("_wg") - 1)).alias("_r"),
    )
    pri = fan.select(
        id_col, "_w",
        kmv_hash(
            F.col(id_col) * F.lit(WS_REPLICA_PRIME) + F.col("_r")
        ).alias("_p"),
    )
    best = pri.groupBy(id_col).agg(
        # _w is constant per id; MIN mirrors the SQL twin exactly
        F.min("_p").alias("priority"), F.min("_w").alias("weight")
    )
    return (
        best.orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(n)
        .select(id_col, "weight", "priority")
    )


def weighted_sample_sql(
    src: str,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (no cap guard — the
    oracle mirrors values, the operator owns the loud failure)."""
    from .sketches import kmv_hash_sql

    mix = kmv_hash_sql(f"({id_col} * {WS_REPLICA_PRIME} + r)")
    return f"""
        WITH ws_fan AS (
            SELECT {id_col},
                   CAST({weight_col} AS BIGINT) AS weight,
                   unnest(generate_series(
                       0, CAST({weight_col} AS BIGINT) - 1)) AS r
            FROM {src}
            WHERE CAST({weight_col} AS BIGINT) > 0
        ),
        ws_best AS (
            SELECT {id_col}, MIN(weight) AS weight,
                   MIN({mix}) AS priority
            FROM ws_fan GROUP BY 1
        )
        SELECT {id_col}, weight, priority
        FROM ws_best
        ORDER BY priority ASC, {id_col} ASC
        LIMIT {n}
    """


def grouped_split(
    df: DataFrame,
    group_col: str,
    splits: "Sequence[tuple[str, int]]",
    scale: int = 10**6,
) -> DataFrame:
    """Leakage-safe dataset split: every GROUP (domain, source, author
    — whatever correlates rows) lands WHOLLY in one split, chosen by
    its hash residue against cumulative integer-millionth ratios.
    The train/val/test assignment step a dedup pipeline feeds into —
    splitting by row leaks near-duplicate group members across the
    boundary and inflates eval; splitting by group is the standard fix
    (the contamination_check's preventive sibling).

    Determinism/stability contract: the split of a group depends ONLY
    on the group key and the ratio table — not on which rows are
    present, row order, partitioning, or corpus size — so an
    incremental crawl NEVER migrates an existing group between splits
    (tested).  The residue routes through the KMV avalanche mix (the
    mixture_resample lesson: the raw polynomial hash is near-identity
    on short keys, making contiguous key ranges select all-or-nothing).

    ``splits``: ordered (name, millionths) with Σ = ``scale``; ratio 0
    is allowed (a declared-but-empty split).  The residue → split map
    is a chained CASE over cumulative thresholds — map-side, no
    shuffle, no join (plan: pure projection over the scan).

    Returns ``df`` + a ``split`` column."""
    from .sketches import kmv_hash

    splits = list(splits)
    if len(splits) < 2:
        raise ValueError("grouped_split: need at least 2 splits")
    if any(m < 0 for _, m in splits):
        raise ValueError("grouped_split: negative ratio")
    total = sum(m for _, m in splits)
    if total != scale:
        raise ValueError(
            f"grouped_split: ratios sum to {total}, expected {scale}"
        )
    r = kmv_hash(sample_hash_col(F.col(group_col))) % F.lit(int(scale))
    cum = 0
    expr = None
    for name, m in splits[:-1]:
        cum += m
        branch = F.when(r < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(
            r < F.lit(cum), F.lit(name)
        )
    expr = expr.otherwise(F.lit(splits[-1][0]))
    return df.withColumn("split", expr)


def grouped_split_sql(
    src: str,
    group_col: str,
    splits: "Sequence[tuple[str, int]]",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`grouped_split` (standalone; emits
    SELECT *, split FROM src)."""
    from .dedup import token_hash_sql
    from .sketches import kmv_hash_sql

    splits = list(splits)
    r = f"({kmv_hash_sql(token_hash_sql(f'CAST({group_col} AS VARCHAR)'))}) % {int(scale)}"
    cum = 0
    cases = []
    for name, m in splits[:-1]:
        cum += m
        cases.append(f"WHEN ({r}) < {cum} THEN '{name}'")
    case = (
        "CASE " + " ".join(cases) + f" ELSE '{splits[-1][0]}' END"
    )
    return f"SELECT *, {case} AS split FROM {src}"


def kfold_assign(
    df: DataFrame,
    stratum_col: str,
    group_col: str,
    k: int = 5,
) -> DataFrame:
    """Leakage-safe stratified k-fold assignment — the
    cross-validation complement of :func:`grouped_split`: every
    GROUP lands wholly in one fold (no near-dup leakage across the
    boundary), and within every STRATUM the folds are EXACTLY
    balanced in group count (±1) — the property hash-ratio splitting
    cannot give and k-fold evaluation needs.

    Mechanism: distinct (stratum, group) pairs are ranked inside
    their stratum by the avalanche-mixed group hash with the group
    key as the total-order tie-break (the mixture_resample lesson —
    the raw polynomial hash is near-identity on short keys), and
    fold = (rank − 1) mod k.  The rank window runs over the GROUP
    table (|groups| rows, not |rows|), then one hash join assigns
    rows.  Deterministic and parallelism-exact; the complementary
    contract to grouped_split is stated: balance is exact, but
    adding groups to a stratum MAY renumber existing folds (use
    grouped_split when subset-stability matters more than balance).

    Returns ``df`` + a ``fold`` column in [0, k)."""
    from .sketches import kmv_hash

    if not 2 <= int(k) <= 1000:
        raise ValueError(f"k must be in [2, 1000]: {k}")
    groups = df.select(
        F.col(stratum_col).alias("_st"),
        F.col(group_col).alias("_gr"),
    ).distinct()
    mixed = groups.withColumn(
        "_h", kmv_hash(sample_hash_col(F.col("_gr")))
    )
    w = W.partitionBy("_st").orderBy("_h", "_gr")
    folds = mixed.select(
        "_st", "_gr",
        ((F.row_number().over(w) - 1) % int(k))
        .cast("int").alias("fold"),
    )
    return df.join(
        folds,
        (df[stratum_col] == folds._st) & (df[group_col] == folds._gr),
    ).drop("_st", "_gr")


def kfold_assign_sql(
    src: str,
    stratum_col: str,
    group_col: str,
    k: int = 5,
) -> str:
    """DuckDB twin of :func:`kfold_assign` (identical mix, rank, and
    modulus).  Standalone; emits SELECT *, fold FROM src."""
    from .dedup import token_hash_sql
    from .sketches import kmv_hash_sql

    h = kmv_hash_sql(token_hash_sql("CAST(_gr AS VARCHAR)"))
    return f"""
        WITH kf_g AS (
            SELECT DISTINCT {stratum_col} AS _st, {group_col} AS _gr
            FROM {src}
        ),
        kf_f AS (
            SELECT _st, _gr,
                   CAST((ROW_NUMBER() OVER (PARTITION BY _st
                       ORDER BY ({h}), _gr)
                       - 1) % {int(k)} AS INTEGER) AS fold
            FROM kf_g
        )
        SELECT s.*, f.fold
        FROM {src} s
        JOIN kf_f f ON f._st = s.{stratum_col}
                   AND f._gr = s.{group_col}
    """
