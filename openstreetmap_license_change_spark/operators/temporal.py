"""Temporal joins Spark lacks as built-ins.

asof_join — for each left row, the most recent right row at-or-before
its timestamp within the key.  Implemented as the UNION + window trick
(the scalable form): tag both sides, union them, sort once per key by
(time, side), and carry the right side's values forward with
``last(..., ignorenulls=True)``.  ONE shuffle on the key, no per-key
loop, no range-condition join that Catalyst would plan as a
broadcast-nested-loop.  DuckDB's native ASOF JOIN is the oracle twin
(`events_asof_join` in the driver contract).

Ties: a right row at exactly the left row's timestamp matches
(ASOF's >= convention) — the union sorts right rows (side 0) before
left rows (side 1) at equal times.  Right rows must be unique per
(key, time); dedupe upstream or the carried value is engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: left columns + ``value_cols`` from the latest
    right row with ``right_ts <= left_ts`` (null when none)."""
    lcols = left.columns
    l = (
        left.withColumn("_t", F.col(left_ts))
        .withColumn("_side", F.lit(1))
    )
    for c in value_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*lcols, "_t", "_side", *[f"_r_{c}" for c in value_cols]).unionByName(
        r.select(*lcols, "_t", "_side", *[f"_r_{c}" for c in value_cols])
    )
    w = (
        W.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = u
    for c in value_cols:
        out = out.withColumn(
            f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return out.where(F.col("_side") == 1).select(
        *lcols, *[f"asof_{c}" for c in value_cols]
    )


def _require_disjoint(a: DataFrame, b: DataFrame, key: str) -> None:
    clash = (set(a.columns) & set(b.columns)) - {key}
    if clash:
        raise ValueError(
            f"interval join sides share columns {sorted(clash)}; "
            "alias one side before joining"
        )


def _epoch(df: DataFrame, col: str):
    # TIMESTAMP_NTZ can't cast straight to double (Spark 4); hop via
    # TIMESTAMP (session tz is pinned UTC in get_spark, so no shift).
    # Numerics cast directly — the operators accept plain epoch columns.
    if "timestamp" in df.schema[col].dataType.simpleString():
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def _bucket(df: DataFrame, col: str, bucket_s: float):
    return F.floor(_epoch(df, col) / F.lit(float(bucket_s)))


def _last_bucket(df: DataFrame, end_col: str, bucket_s: float):
    # half-open [start, end): the last bucket that can contain a point
    # strictly below `end` is ceil(end/W)-1 — exact on the boundary
    # (end exactly on a bucket edge never reaches the next bucket)
    # without a floating-point epsilon
    return F.ceil(_epoch(df, end_col) / F.lit(float(bucket_s))) - 1


def _explode_buckets(
    df: DataFrame,
    start: str,
    end: str,
    bucket_s: float,
    max_buckets_per_interval: int | None,
) -> DataFrame:
    first = _bucket(df, start, bucket_s)
    last = _last_bucket(df, end, bucket_s)
    # empty/degenerate intervals ([t, t) and worse) match nothing under
    # half-open semantics; drop them here or F.sequence runs backwards
    df = df.where(F.col(end) > F.col(start))
    if max_buckets_per_interval is not None:
        n = last - first + 1
        first = F.when(
            n > max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit("interval join: interval spans "),
                    n.cast("string"),
                    F.lit(
                        f" buckets > max_buckets_per_interval="
                        f"{max_buckets_per_interval}; raise bucket_s or "
                        "split the interval upstream"
                    ),
                )
            ).cast("long"),
        ).otherwise(first)
    return df.withColumn("_b", F.explode(F.sequence(first, last)))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_s: float,
    max_buckets_per_interval: int | None = None,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair of the same
    ``key`` with ``start <= ts < end``.

    Catalyst plans the naive range condition as an equi-join on ``key``
    with a residual filter — fine until keys are few or hot, when one
    task owns a key's full |points|x|intervals| cross product (and with
    no key at all it degrades to a broadcast-nested-loop).  The
    scalable form decomposes time into fixed ``bucket_s``-second
    buckets: intervals explode to the buckets they cover, points map to
    exactly ONE bucket, and the join becomes a plain (key, bucket)
    hash equi-join with the range predicate as residual.  Point buckets
    are unique, so no pair is emitted twice and no dedup pass is
    needed.  Hot (key, bucket) cells are ordinary shuffle skew — AQE's
    skew-join split applies (see tests/test_aqe_skew.py).

    ``bucket_s`` trades replication for selectivity: intervals explode
    to ceil(len/W)+1 rows, so pick W near the median interval length.
    ``max_buckets_per_interval`` is the no-silent-blowup guard (house
    rule): a pathological interval (e.g. an open-ended window coded as
    year-9999) would otherwise explode to millions of rows per input
    row; when set, such a row fails the job with an explicit error
    instead.

    The reference has no temporal-join analogue; this generalizes its
    changeset-window semantics (change_bot.rb processes edits grouped
    by changeset windows) to arbitrary intervals.
    """
    _require_disjoint(points, intervals, key)
    pb = points.withColumn("_b", _bucket(points, ts, bucket_s))
    ib = _explode_buckets(
        intervals, start, end, bucket_s, max_buckets_per_interval
    )
    return (
        pb.join(ib, on=[key, "_b"])
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_b")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_s: float,
    max_buckets_per_interval: int | None = None,
) -> DataFrame:
    """Interval-overlap join: every (a, b) pair of the same ``key``
    whose half-open intervals intersect (``a_start < b_end AND
    b_start < a_end``).

    Same bucket decomposition as :func:`interval_join`, but BOTH sides
    explode to their covering buckets, so an overlapping pair meets in
    every shared bucket.  The pair is emitted exactly once via the
    first-shared-bucket rule: keep the match only in bucket
    ``floor(max(a_start, b_start)/W)`` — that bucket is shared by
    construction (the later-starting interval begins in it, and the
    earlier one must still be live there or they would not overlap), so
    the dedup is a cheap residual predicate, not a distinct() shuffle.
    """
    _require_disjoint(a, b, key)
    ab = _explode_buckets(a, a_start, a_end, bucket_s,
                          max_buckets_per_interval)
    bb = _explode_buckets(b, b_start, b_end, bucket_s,
                          max_buckets_per_interval)
    # schema lookup only picks the epoch cast; the expressions are
    # unbound F.col references, so they resolve against the joined df
    # (column disjointness is enforced above)
    first_shared = F.greatest(
        _bucket(a, a_start, bucket_s), _bucket(b, b_start, bucket_s)
    )
    return (
        ab.join(bb, on=[key, "_b"])
        .where(
            (F.col(a_start) < F.col(b_end))
            & (F.col(b_start) < F.col(a_end))
            & (F.col("_b") == first_shared)
        )
        .drop("_b")
    )


def event_funnel(
    events: DataFrame,
    steps: "list[str]",
    max_gap_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel: for each user, the EARLIEST-completion
    walk through ``steps`` — step k counts only if a matching event
    occurs strictly after the user's step-(k−1) completion time and
    within ``max_gap_sec`` of it.  The classic event-analytics
    conversion query (view → click → purchase), computed greedily on
    earliest timestamps (the standard funnel convention: taking the
    earliest feasible step-k event never shrinks the feasible set for
    step k+1, so greedy = optimal and the count is well-defined).

    Exactness: all comparisons on integer epoch MICROseconds
    (unix_micros / epoch_us — both engines carry timestamps at micro
    precision), gap arithmetic in int64.

    Plan: one filtered min-aggregate per step plus one user-keyed join
    per step beyond the first — a FIXED number (len(steps)) of
    shuffles over per-user 1-row frames that shrink monotonically;
    the event table is scanned once per step with the type filter
    pushed down, never self-joined row×row.

    Returns one row per step: (step, event_type, n_users) — the
    funnel's conversion profile; n_users is non-increasing in step."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    gap_us = int(max_gap_sec) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        # cast: parquet TIMESTAMP_NTZ → session-tz timestamp (session
        # is pinned UTC in get_spark, so the instant is unchanged and
        # matches DuckDB's tz-naive epoch_us)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    spark = events.sparkSession
    cur = (
        ev.where(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("_prev"))
    )
    out = None
    for k, s in enumerate(steps, start=1):
        if k > 1:
            cur = (
                ev.where(F.col("_t") == s)
                .join(cur, "_u")
                .where(
                    (F.col("_us") > F.col("_prev"))
                    & (F.col("_us") <= F.col("_prev") + F.lit(gap_us))
                )
                .groupBy("_u")
                .agg(F.min("_us").alias("_prev"))
            )
        row = cur.agg(
            F.lit(k).alias("step"),
            F.lit(s).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def event_funnel_sql(
    src: str,
    steps: "list[str]",
    max_gap_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`event_funnel` (standalone statement) —
    the same chained earliest-completion CTEs on epoch_us."""
    gap_us = int(max_gap_sec) * 1_000_000
    ctes = [
        f"fn_ev AS (SELECT {user_col} AS u, {type_col} AS t, "
        f"epoch_us({ts_col}) AS us FROM {src})",
        f"fn_s1 AS (SELECT u, MIN(us) AS prev FROM fn_ev "
        f"WHERE t = '{steps[0]}' GROUP BY u)",
    ]
    for k, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"fn_s{k} AS (SELECT e.u, MIN(e.us) AS prev "
            f"FROM fn_ev e JOIN fn_s{k - 1} p ON e.u = p.u "
            f"WHERE e.t = '{s}' AND e.us > p.prev "
            f"AND e.us <= p.prev + {gap_us} GROUP BY e.u)"
        )
    selects = [
        f"SELECT {k} AS step, '{s}' AS event_type, "
        f"COUNT(*) AS n_users FROM fn_s{k}"
        for k, s in enumerate(steps, start=1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def event_retention(
    events: DataFrame,
    max_offset: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day
    (the cohort), counted per whole-day offset they return on — the
    second classic event-analytics rollup next to the funnel, and the
    recrawl-scheduling view of the pages table (how often does a
    source re-appear after first capture?).

    Day index = epoch_us DIV 86 400 000 000 — pure integer bucketing,
    no calendar/timezone functions to diverge on (both engines carry
    micros; the session tz is pinned UTC so NTZ inputs agree).

    Plan: first-day per user is one min-aggregate; activity is one
    DISTINCT (user, day) aggregate of the same scan; the join back is
    user-keyed; the final rollup groups |users|·offsets rows.  All
    map-side combinable, no windows.

    Returns (cohort_day, day_offset, n_users): n_users at offset 0 is
    the cohort size; offsets beyond ``max_offset`` are dropped."""
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.expr(
            f"CAST(unix_micros(CAST({ts_col} AS TIMESTAMP)) "
            "DIV 86400000000 AS BIGINT)"
        ).alias("_d"),
    )
    first = ev.groupBy("_u").agg(F.min("_d").alias("_d0"))
    active = ev.distinct()
    return (
        active.join(first, "_u")
        .select(
            F.col("_d0").alias("cohort_day"),
            (F.col("_d") - F.col("_d0")).cast("int").alias("day_offset"),
        )
        .where(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_retention_sql(
    src: str,
    max_offset: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`event_retention` (standalone)."""
    return f"""
        WITH rt_ev AS (
            SELECT {user_col} AS u,
                   CAST(epoch_us({ts_col}) // 86400000000 AS BIGINT) AS d
            FROM {src}
        ),
        rt_first AS (SELECT u, MIN(d) AS d0 FROM rt_ev GROUP BY u),
        rt_active AS (SELECT DISTINCT u, d FROM rt_ev)
        SELECT f.d0 AS cohort_day,
               CAST(a.d - f.d0 AS INTEGER) AS day_offset,
               COUNT(*) AS n_users
        FROM rt_active a JOIN rt_first f ON a.u = f.u
        WHERE a.d - f.d0 <= {max_offset}
        GROUP BY 1, 2
    """


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    scale: int = 10**6,
) -> DataFrame:
    """First-order journey transition matrix: counts of consecutive
    (from → to) event-type pairs within each user's timeline, with the
    conditional transition rate in exact ppm
    (``p_ppm = n_pairs·10⁶ DIV n_from``) — the Markov-chain view of
    the event stream that funnels/retention summarize along one path.

    Ordering ties: events sharing a user timestamp are ordered by
    (ts, event_type, event_id-free deterministic tiebreak) — the sort
    key is (epoch µs, type string), so equal-time pairs are stable and
    engine-identical.

    Plan: one LEAD window per user (the stream's only wide shuffle),
    one pair groupBy, one from-keyed rollup joined back broadcast-
    style.  Returns (from_type, to_type, n_pairs, p_ppm)."""
    w = W.partitionBy("_u").orderBy("_us", "_t")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    pairs = (
        ev.select(
            F.col("_t").alias("from_type"),
            F.lead("_t").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    froms = pairs.groupBy("from_type").agg(
        F.sum("n_pairs").alias("_nf")
    )
    return pairs.join(F.broadcast(froms), "from_type").select(
        "from_type", "to_type", "n_pairs",
        F.expr(f"(n_pairs * {int(scale)}) DIV _nf").alias("p_ppm"),
    )


def event_transitions_sql(
    src: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`event_transitions` (standalone)."""
    return f"""
        WITH tr_ev AS (
            SELECT {user_col} AS u, {type_col} AS t,
                   epoch_us({ts_col}) AS us
            FROM {src}
        ),
        tr_pairs AS (
            SELECT from_type, to_type, COUNT(*) AS n_pairs
            FROM (
                SELECT t AS from_type,
                       LEAD(t) OVER (PARTITION BY u
                                     ORDER BY us, t) AS to_type
                FROM tr_ev
            )
            WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        ),
        tr_from AS (
            SELECT from_type, SUM(n_pairs) AS nf
            FROM tr_pairs GROUP BY 1
        )
        SELECT p.from_type, p.to_type, p.n_pairs,
               CAST((p.n_pairs * {int(scale)}) // f.nf AS BIGINT) AS p_ppm
        FROM tr_pairs p JOIN tr_from f USING (from_type)
    """


def geofence_transitions(
    points: DataFrame,
    fences: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: "Sequence[str]" = (),
) -> DataFrame:
    """Geofence enter/exit event extraction: for every (entity, fence)
    pair, emit an event each time the entity's timestamp-ordered
    trajectory crosses the fence boundary — the alerting primitive of
    every location platform, and the temporal extension of the
    engine's point-in-rect family (same [min, max) containment
    convention as pip_join_rect).

    Semantics: an 'enter' fires on the first point inside (including
    the trajectory's very first point), an 'exit' on the first point
    outside after being inside; a trajectory still inside at its last
    point has an unmatched enter — real-time state, not an artifact.
    A single outside point between two inside points yields a full
    exit+enter pair (no debouncing; compose with stay_points for
    dwell-filtered semantics).

    Scale shape: fences are the broadcast dimension (dozens–thousands
    of rows — the region-tracker scale of the reference); the
    trajectory stream crossJoins the broadcast fence list to get one
    boolean flag stream per (entity, fence), then ONE window sort per
    (entity, fence) finds flag flips via lag.  Integer-µs timestamps;
    pass ``tiebreak`` when ``ts`` is not unique per entity (the
    trip_segments rule).

    Output: (id, fence_id, event ∈ {'enter','exit'}, ts_us)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    flagged = points.crossJoin(F.broadcast(fences)).select(
        F.col(id_col),
        F.col("fence_id"),
        us.alias("ts_us"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tiebreak)],
        (
            (F.col(lon) >= F.col("min_lon"))
            & (F.col(lon) < F.col("max_lon"))
            & (F.col(lat) >= F.col("min_lat"))
            & (F.col(lat) < F.col("max_lat"))
        ).alias("_in"),
    )
    w = W.partitionBy(id_col, "fence_id").orderBy(
        "ts_us", *[f"_tb{i}" for i in range(len(tiebreak))]
    )
    seg = flagged.withColumn("_prev", F.lag("_in").over(w))
    enter = F.col("_in") & (
        F.col("_prev").isNull() | ~F.col("_prev")
    )
    exit_ = ~F.col("_in") & F.coalesce(F.col("_prev"), F.lit(False))
    return (
        seg.withColumn(
            "event",
            F.when(enter, F.lit("enter")).when(exit_, F.lit("exit")),
        )
        .where(F.col("event").isNotNull())
        .select(id_col, "fence_id", "event", "ts_us")
    )


def geofence_transitions_sql(
    points_src: str,
    fences_src: str,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: "Sequence[str]" = (),
) -> str:
    """DuckDB twin of :func:`geofence_transitions`."""
    tb = "".join(f", {c}" for c in tiebreak)
    return f"""
        WITH gf_flag AS (
            SELECT p.{id_col}, f.fence_id,
                   epoch_us(p.{ts_col}) AS ts_us{tb and
                       ''.join(f', p.{c}' for c in tiebreak)},
                   (p.{lon} >= f.min_lon AND p.{lon} < f.max_lon AND
                    p.{lat} >= f.min_lat AND p.{lat} < f.max_lat) AS _in
            FROM {points_src} p CROSS JOIN {fences_src} f
        ),
        gf_seg AS (
            SELECT *, LAG(_in) OVER (
                PARTITION BY {id_col}, fence_id
                ORDER BY ts_us{tb}) AS _prev
            FROM gf_flag
        )
        SELECT {id_col}, fence_id,
               CASE WHEN _in AND (_prev IS NULL OR NOT _prev)
                    THEN 'enter'
                    WHEN NOT _in AND COALESCE(_prev, FALSE)
                    THEN 'exit' END AS event,
               ts_us
        FROM gf_seg
        WHERE (_in AND (_prev IS NULL OR NOT _prev))
           OR (NOT _in AND COALESCE(_prev, FALSE))
    """


DECAY_SHIFT = 30


def decayed_rollup(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_s: int = 86_400,
    shift: int = DECAY_SHIFT,
) -> DataFrame:
    """Exponentially-decayed per-key rollup in exact integers — the
    recency-weighted score behind recrawl prioritization and activity
    ranking (yesterday's signal counts half as much), WITHOUT float
    pow/exp: ages quantize to whole half-lives
    (``age_h = Δt_us DIV (halflife_s·10⁶)``), values quantize to
    cents, and each event contributes ``cents · 2^(shift − age_h)``
    (0 beyond ``shift`` half-lives — a 2⁻³⁰ tail is genuinely
    negligible and the cutoff is explicit, not a float underflow).
    The fixed-point total ``score_q`` is an exact multiple of
    2^-shift cents, identical across engines and mergeable (plain
    SUM), so incremental maintenance follows the tile_rollup_merge
    contract.

    The reference epoch is the corpus max timestamp (one broadcast
    1-row agg), making the query self-contained and deterministic;
    pass a production ``now`` upstream by filtering instead.

    Plan: one broadcast cross of the 1-row max, one map-side-combined
    groupBy.  Output: (key, n_events, score_q) with
    score ≈ score_q / 2^shift cents."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(key_col),
        us.alias("_us"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("_cents"),
    )
    ref = base.agg(F.max("_us").alias("_ref"))
    contrib = F.when(
        F.col("_age_h") <= shift,
        F.expr(
            f"_cents * shiftleft(CAST(1 AS BIGINT), "
            f"CAST({shift} - _age_h AS INT))"
        ),
    ).otherwise(F.lit(0))
    return (
        base.crossJoin(F.broadcast(ref))
        .withColumn(
            "_age_h",
            F.expr(f"(_ref - _us) DIV {int(halflife_s) * 1_000_000}"),
        )
        .withColumn("_q", contrib)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_q").alias("score_q"),
        )
    )


def decayed_rollup_sql(
    src: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_s: int = 86_400,
    shift: int = DECAY_SHIFT,
) -> str:
    """DuckDB twin of :func:`decayed_rollup`."""
    hl_us = int(halflife_s) * 1_000_000
    return f"""
        WITH dr_base AS (
            SELECT {key_col},
                   epoch_us({ts_col}) AS _us,
                   CAST(ROUND({value_col} * 100) AS BIGINT) AS _cents
            FROM {src}
        ),
        dr_ref AS (SELECT MAX(_us) AS _ref FROM dr_base)
        SELECT {key_col},
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE
                   WHEN (_ref - _us) // {hl_us} <= {shift}
                   THEN _cents * (CAST(1 AS BIGINT) << CAST(
                        {shift} - (_ref - _us) // {hl_us} AS INTEGER))
                   ELSE 0 END) AS BIGINT) AS score_q
        FROM dr_base CROSS JOIN dr_ref
        GROUP BY {key_col}
    """


def slot_anomalies(
    events: DataFrame,
    z_num: int = 2,
    z_den: int = 1,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-slot count anomalies: for each (event_type, calendar day,
    hour-of-day), flag days whose count deviates from that slot's
    across-days profile by ≥ z standard deviations — the temporal
    sibling of ``spatial.tile_hotspots`` (weekly seasonality is
    handled by conditioning on hour-of-day; extend the slot key for
    day-of-week).  Same discipline: the z-test is an EXACT
    cross-multiplied integer inequality —

        (x·n − S)²·z_den² ≥ z_num²·(n·Q − S²),  S = Σx, Q = Σx²

    over the population of days in the slot (x's own day included,
    the population convention) — no float mean, no sqrt, no variance
    rounding, so the DuckDB twin agrees bit-for-bit and the verdict
    is parallelism-independent.  Carried in decimal(38,0)/HUGEINT:
    per-term headroom to x ≈ 10⁹ events/slot-day over n ≤ 10⁴ days.

    Plan: (type, day, hour) partial-agg → (type, hour) re-agg joined
    back to the day rows on the slot key — two shuffles plus one
    slot-keyed join (slots are low-cardinality: broadcastable).

    Output: (event_type, day, hour, n, n_days, spike, dip)."""
    day = F.to_date(F.col(ts_col))
    hour = F.hour(F.col(ts_col))
    per_day = events.groupBy(
        F.col(type_col).alias("event_type"),
        day.alias("day"),
        hour.alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    slot = per_day.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    j = per_day.join(F.broadcast(slot), ["event_type", "hour"])
    dec = "decimal(38,0)"
    dev = (
        F.col("n").cast(dec) * F.col("n_days") - F.col("s")
    )
    lhs = dev * dev * F.lit(int(z_den) * int(z_den))
    rhs = (
        F.lit(int(z_num) * int(z_num))
        * (
            F.col("n_days").cast(dec) * F.col("q")
            - F.col("s").cast(dec) * F.col("s")
        )
    )
    return j.select(
        "event_type", "day", "hour", "n", "n_days",
        ((lhs >= rhs) & (dev > 0)).alias("spike"),
        ((lhs >= rhs) & (dev < 0)).alias("dip"),
    )


def slot_anomalies_sql(
    src: str,
    z_num: int = 2,
    z_den: int = 1,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`slot_anomalies`."""
    return f"""
        WITH sa_day AS (
            SELECT {type_col} AS event_type,
                   CAST({ts_col} AS DATE) AS day,
                   EXTRACT(hour FROM {ts_col}) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM {src} GROUP BY 1, 2, 3
        ),
        sa_slot AS (
            SELECT event_type, hour,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(n) AS HUGEINT) AS s,
                   CAST(SUM(n * n) AS HUGEINT) AS q
            FROM sa_day GROUP BY 1, 2
        )
        SELECT d.event_type, d.day, CAST(d.hour AS INTEGER) AS hour,
               d.n, s.n_days,
               ((CAST(d.n AS HUGEINT) * s.n_days - s.s)
                * (CAST(d.n AS HUGEINT) * s.n_days - s.s)
                * {int(z_den) * int(z_den)}
                >= {int(z_num) * int(z_num)} * (s.n_days * s.q - s.s * s.s)
                AND CAST(d.n AS HUGEINT) * s.n_days - s.s > 0) AS spike,
               ((CAST(d.n AS HUGEINT) * s.n_days - s.s)
                * (CAST(d.n AS HUGEINT) * s.n_days - s.s)
                * {int(z_den) * int(z_den)}
                >= {int(z_num) * int(z_num)} * (s.n_days * s.q - s.s * s.s)
                AND CAST(d.n AS HUGEINT) * s.n_days - s.s < 0) AS dip
        FROM sa_day d JOIN sa_slot s USING (event_type, hour)
    """


def rolling_rollup(
    events: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing-window per-key daily rollup: for every (key, active
    day), the day's own totals AND the trailing ``window_days``
    totals — the 7-day-active / rolling-revenue query every analytics
    deployment runs.  Exact integers: days are epoch-day ints, values
    cent-quantized, and the trailing frame is a RANGE window on the
    integer day (value-based, so ABSENT days correctly fall out of
    the frame without densification — a ROWS frame would silently
    treat a 3-day gap as adjacent).

    One shuffle: the per-day pre-aggregation and the range window
    both key on ``key_col`` — the window reuses the aggregation's
    partitioning, and each frame spans ≤ window_days pre-aggregated
    rows, not raw events.

    Output: (key, day, n_day, cents_day, n_win, cents_win)."""
    if window_days < 1:
        raise ValueError(f"window_days must be ≥ 1: {window_days}")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_day = events.select(
        F.col(key_col),
        us.alias("_us"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("_cents"),
    ).withColumn(
        "day", F.expr("_us DIV 86400000000")
    ).groupBy(key_col, "day").agg(
        F.count(F.lit(1)).alias("n_day"),
        F.sum("_cents").alias("cents_day"),
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("day")
        .rangeBetween(-(int(window_days) - 1), 0)
    )
    return per_day.select(
        key_col, "day", "n_day", "cents_day",
        F.sum("n_day").over(w).alias("n_win"),
        F.sum("cents_day").over(w).alias("cents_win"),
    )


def rolling_rollup_sql(
    src: str,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`rolling_rollup`."""
    return f"""
        WITH rr_day AS (
            SELECT {key_col},
                   epoch_us({ts_col}) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_day,
                   CAST(SUM(CAST(ROUND({value_col} * 100) AS BIGINT))
                        AS BIGINT) AS cents_day
            FROM {src} GROUP BY 1, 2
        )
        SELECT {key_col}, day, n_day, cents_day,
               CAST(SUM(n_day) OVER w AS BIGINT) AS n_win,
               CAST(SUM(cents_day) OVER w AS BIGINT) AS cents_win
        FROM rr_day
        WINDOW w AS (PARTITION BY {key_col} ORDER BY day
                     RANGE BETWEEN {int(window_days) - 1} PRECEDING
                     AND CURRENT ROW)
    """


def interval_coverage(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Per-key interval-union coverage: total time covered by the
    UNION of possibly-overlapping intervals, plus the island count —
    the utilization/SLA query (how long was the device online, the
    cell observed, the session active) that naive SUM(end−start)
    double-counts.

    The sweep-line re-expressed as windows (gaps-and-islands, the
    stay_points machinery on the time axis): order each key's
    intervals by (start, end); an interval OPENS a new island iff its
    start exceeds the running max of all previous ends (strictly —
    touching intervals [a,b][b,c] merge); islands then aggregate
    min(start)/max(end) and coverage sums their spans.  All integer
    µs — no floats, no densification, engine-identical.

    Plan: ONE window sort per key (running max is the same frame as
    the island counter) + two key-local aggregations — a single hash
    shuffle.  Empty/negative intervals (end ≤ start) contribute
    nothing but still count in n_intervals.

    Output: (key, n_intervals, n_islands, covered_us)."""
    w = W.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    seg = intervals.select(
        key_col,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        prev_max.alias("_pm"),
    ).withColumn(
        "_new",
        (F.col("_pm").isNull() | (F.col("_s") > F.col("_pm"))).cast("int"),
    ).withColumn(
        "_isl",
        F.sum("_new").over(
            W.partitionBy(key_col)
            .orderBy("_s", "_e")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    islands = seg.groupBy(key_col, "_isl").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_s").alias("_is"),
        F.max("_e").alias("_ie"),
    )
    return islands.groupBy(key_col).agg(
        F.sum("_n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(
            F.greatest(F.col("_ie") - F.col("_is"), F.lit(0))
        ).alias("covered_us"),
    )


def interval_coverage_sql(
    src: str,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> str:
    """DuckDB twin of :func:`interval_coverage`."""
    return f"""
        WITH ic_seg AS (
            SELECT {key_col}, {start_col} AS _s, {end_col} AS _e,
                   MAX({end_col}) OVER (
                       PARTITION BY {key_col}
                       ORDER BY {start_col}, {end_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS _pm
            FROM {src}
        ),
        ic_isl AS (
            SELECT *,
                   SUM(CASE WHEN _pm IS NULL OR _s > _pm
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY {key_col} ORDER BY _s, _e
                       ROWS UNBOUNDED PRECEDING) AS _isl
            FROM ic_seg
        ),
        ic_agg AS (
            SELECT {key_col}, _isl, COUNT(*) AS _n,
                   MIN(_s) AS _is, MAX(_e) AS _ie
            FROM ic_isl GROUP BY 1, 2
        )
        SELECT {key_col},
               CAST(SUM(_n) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(GREATEST(_ie - _is, 0)) AS BIGINT) AS covered_us
        FROM ic_agg GROUP BY 1
    """


def cusum_split(
    series: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-key CUSUM change-point detection over integer-valued time
    series — where does each series most look like a mean shift?
    (crawl-rate regime changes, per-tile activity breaks, per-user
    behavior shifts).  The classic statistic max_k |Σ_{i≤k}(x_i − x̄)|
    cross-multiplied by n into the EXACT integer form

        D_k = n·S_k − k·S_n        (S_k = prefix sum, k = 1..n−1)

    so the argmax is float-free and the DuckDB twin hash-matches the
    chosen split, its |D| and both segment means (emitted as exact
    S·10⁶ DIV k ppm rationals — the house's divide-once discipline).
    Ties break to the EARLIEST k (struct-max on (|D|, −k) — a total
    order, deterministic at any parallelism).  Keys with n < 2 have
    no admissible split and are absent.

    Plan: ONE partitionBy(key) orderBy(ts, tiebreak) sort carries the
    prefix sum, the row number, and the full-frame n/S_n — a single
    hash shuffle — then one map-side-combining groupBy(key) argmax.
    |D_k| ≤ n·|S| keeps int64 through ~10⁹-point keys of 10⁹-scale
    values only if pre-quantized sensibly; overflow-prone inputs
    should drop the value quantum (the BM25_IDF_SCALE move).

    Output: key, n, split_k (prefix length), split_ts, d_abs,
    mean_before_ppm, mean_after_ppm."""
    order_cols = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy(key_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    pre = series.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col).cast("bigint").alias("_v"),
        F.row_number().over(wo).alias("_k"),
        F.sum(F.col(value_col).cast("bigint")).over(wrun).alias("_sk"),
        F.count(F.lit(1)).over(wall).alias("_n"),
        F.sum(F.col(value_col).cast("bigint")).over(wall).alias("_sn"),
    ).where(F.col("_k") < F.col("_n"))
    d = F.col("_n") * F.col("_sk") - F.col("_k") * F.col("_sn")
    cand = pre.select(
        F.col(key_col),
        F.struct(
            F.abs(d).alias("d_abs"),
            (-F.col("_k")).alias("neg_k"),
            F.col(ts_col).alias("split_ts"),
            F.col("_sk").alias("s_k"),
            F.col("_n").alias("n"),
            F.col("_sn").alias("s_n"),
        ).alias("_c"),
    )
    best = cand.groupBy(key_col).agg(F.max("_c").alias("_c"))
    return best.select(
        key_col,
        F.col("_c.n").alias("n"),
        (-F.col("_c.neg_k")).alias("split_k"),
        F.col("_c.split_ts").alias("split_ts"),
        F.col("_c.d_abs").alias("d_abs"),
        F.expr("_c.s_k * 1000000 DIV (-_c.neg_k)").alias(
            "mean_before_ppm"
        ),
        F.expr(
            "(_c.s_n - _c.s_k) * 1000000 DIV (_c.n - (-_c.neg_k))"
        ).alias("mean_after_ppm"),
    )


def cusum_split_sql(
    src: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`cusum_split`: identical prefix/full-frame
    windows and the struct-max spelled as ROW_NUMBER over
    (|D| DESC, k ASC).  CTE names cu_*-namespaced."""
    ob = ", ".join([ts_col] + list(tiebreak))
    return f"""
        WITH cu_pre AS (
            SELECT {key_col}, {ts_col},
                   ROW_NUMBER() OVER (PARTITION BY {key_col}
                                      ORDER BY {ob}) AS k,
                   SUM(CAST({value_col} AS BIGINT)) OVER (
                       PARTITION BY {key_col} ORDER BY {ob}
                       ROWS UNBOUNDED PRECEDING) AS sk,
                   COUNT(*) OVER (PARTITION BY {key_col}) AS n,
                   SUM(CAST({value_col} AS BIGINT)) OVER (
                       PARTITION BY {key_col}) AS sn
            FROM {src}
        ),
        cu_cand AS (
            SELECT {key_col}, {ts_col}, k, sk, n, sn,
                   abs(n * sk - k * sn) AS d_abs,
                   ROW_NUMBER() OVER (
                       PARTITION BY {key_col}
                       ORDER BY abs(n * sk - k * sn) DESC, k ASC) AS rn
            FROM cu_pre WHERE k < n
        )
        SELECT {key_col},
               CAST(n AS BIGINT) AS n,
               CAST(k AS BIGINT) AS split_k,
               {ts_col} AS split_ts,
               CAST(d_abs AS BIGINT) AS d_abs,
               CAST(sk * 1000000 // k AS BIGINT) AS mean_before_ppm,
               CAST((sn - sk) * 1000000 // (n - k) AS BIGINT)
                   AS mean_after_ppm
        FROM cu_cand WHERE rn = 1
    """


def followed_by_counts(
    events: DataFrame,
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_user_bucket: int = 10_000,
) -> DataFrame:
    """Within-window episode counts: for every ordered type pair
    (A → B), how many event pairs have B strictly after A in the SAME
    user's timeline within ``window_s`` seconds — the windowed
    generalization of :func:`event_transitions` (which counts only
    ADJACENT pairs; marketing-attribution and co-trigger analyses
    need "A leads to B within T" over everything in between).

    Exactly-once pair enumeration, the colocation_pairs recipe in one
    dimension: bucket width = window, the A side fans to
    {bk, bk+1} only (a strictly-later B within the window lives in
    A's bucket or the next one), the B side keeps its raw bucket, so
    each qualifying event pair matches exactly one fan row; the exact
    0 < Δt ≤ window filter (integer µs) runs after the equi-join.
    Equal-timestamp pairs are NOT counted (Δt > 0 — "followed by"
    means strictly after; an equal-time tie has no direction).

    The per-(user, bucket) quadratic risk is guarded LOUDLY
    (``assert_true`` riding a used column over the B-side occupancy,
    the house contract: a run that would blow up says so).

    Returns (from_type, to_type, n_pairs)."""
    win_us = int(window_s) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        us.alias("_us"),
        (us - F.pmod(us, F.lit(win_us))).alias("_bk0"),
    ).withColumn("_bk", (F.col("_bk0") / F.lit(win_us)).cast("bigint"))
    right = base.select(
        F.col("_u"), F.col("_t").alias("to_type"),
        F.col("_us").alias("_usb"), F.col("_bk"),
    )
    occ = right.groupBy("_u", "_bk").agg(F.count(F.lit(1)).alias("_occ"))
    guard = F.assert_true(
        F.col("_occ") <= F.lit(int(max_user_bucket)),
        F.lit(
            f"user×bucket occupancy exceeds max_user_bucket="
            f"{max_user_bucket} in followed_by_counts; the pair join "
            "is quadratic per key — thin hyperactive users explicitly "
            "or raise the cap"
        ),
    )
    right = right.join(occ, ["_u", "_bk"]).select(
        "_u", "to_type",
        F.when(guard.isNull(), F.col("_usb")).alias("_usb"),
        "_bk",
    )
    fan = base.select(
        "_u", F.col("_t").alias("from_type"),
        F.col("_us").alias("_usa"),
        F.explode(
            F.array(F.col("_bk"), F.col("_bk") + 1)
        ).alias("_bk"),
    )
    paired = fan.join(right, ["_u", "_bk"]).where(
        (F.col("_usb") > F.col("_usa"))
        & (F.col("_usb") - F.col("_usa") <= F.lit(win_us))
    )
    return paired.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def followed_by_counts_sql(
    src: str,
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`followed_by_counts` (no occupancy guard —
    the operator owns the loud failure).  CTE names fb_*-namespaced."""
    win_us = int(window_s) * 1_000_000
    return f"""
        WITH fb_base AS (
            SELECT {user_col} AS u, {type_col} AS t,
                   epoch_us({ts_col}) AS us,
                   epoch_us({ts_col}) // {win_us} AS bk
            FROM {src}
        ),
        fb_fan AS (
            SELECT u, t AS from_type, us AS usa, bk + d.d AS bk
            FROM fb_base CROSS JOIN (VALUES (0), (1)) d(d)
        ),
        fb_pairs AS (
            SELECT f.from_type, r.t AS to_type
            FROM fb_fan f
            JOIN fb_base r ON r.u = f.u AND r.bk = f.bk
            WHERE r.us > f.usa AND r.us - f.usa <= {win_us}
        )
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM fb_pairs GROUP BY 1, 2
    """


ALLEN_RELATIONS = (
    "equals", "starts", "started_by", "finishes", "finished_by",
    "during", "contains", "meets", "met_by", "overlaps",
    "overlapped_by",
)


def _allen_case(a_start: str, a_end: str, b_start: str, b_end: str):
    asr, ae = F.col(a_start), F.col(a_end)
    bs, be = F.col(b_start), F.col(b_end)
    return (
        F.when((asr == bs) & (ae == be), "equals")
        .when((asr == bs) & (ae < be), "starts")
        .when((asr == bs) & (ae > be), "started_by")
        .when((ae == be) & (asr > bs), "finishes")
        .when((ae == be) & (asr < bs), "finished_by")
        .when((asr > bs) & (ae < be), "during")
        .when((asr < bs) & (ae > be), "contains")
        .when(ae == bs, "meets")
        .when(be == asr, "met_by")
        .when((asr < bs) & (ae > bs) & (ae < be), "overlaps")
        .when((bs < asr) & (be > asr) & (be < ae), "overlapped_by")
        # unreachable for non-degenerate pairs under the join
        # condition — loud, never a silent NULL bucket
        .otherwise(
            F.raise_error(
                F.lit("allen_classify: unclassifiable pair "
                      "(degenerate interval slipped the guard?)")
            )
        )
    )


def _allen_case_sql(a_start: str, a_end: str,
                    b_start: str, b_end: str) -> str:
    return f"""CASE
        WHEN {a_start} = {b_start} AND {a_end} = {b_end} THEN 'equals'
        WHEN {a_start} = {b_start} AND {a_end} < {b_end} THEN 'starts'
        WHEN {a_start} = {b_start} AND {a_end} > {b_end}
            THEN 'started_by'
        WHEN {a_end} = {b_end} AND {a_start} > {b_start}
            THEN 'finishes'
        WHEN {a_end} = {b_end} AND {a_start} < {b_start}
            THEN 'finished_by'
        WHEN {a_start} > {b_start} AND {a_end} < {b_end} THEN 'during'
        WHEN {a_start} < {b_start} AND {a_end} > {b_end}
            THEN 'contains'
        WHEN {a_end} = {b_start} THEN 'meets'
        WHEN {b_end} = {a_start} THEN 'met_by'
        WHEN {a_start} < {b_start} AND {a_end} > {b_start}
             AND {a_end} < {b_end} THEN 'overlaps'
        WHEN {b_start} < {a_start} AND {b_end} > {a_start}
             AND {b_end} < {a_end} THEN 'overlapped_by'
        ELSE error('allen: unclassifiable pair')
    END"""


def _explode_buckets_closed(
    df: DataFrame,
    start: str,
    end: str,
    bucket_s: float,
    max_buckets_per_interval: int | None,
) -> DataFrame:
    """Like :func:`_explode_buckets` but each interval ALSO covers the
    bucket containing its end point (closed-end coverage): needed by
    touch-inclusive joins (Allen's meets/met_by happen at a_end ==
    b_start, which half-open coverage drops exactly when the touch
    lands on a bucket edge).  Degenerate intervals (end <= start) fail
    LOUDLY here — Allen relations are defined on proper intervals."""
    first = _bucket(df, start, bucket_s)
    first = F.when(
        F.col(end) <= F.col(start),
        F.raise_error(
            F.concat(
                F.lit("allen_classify: degenerate interval ["),
                F.col(start).cast("string"),
                F.lit(", "),
                F.col(end).cast("string"),
                F.lit(") — end must be > start"),
            )
        ).cast("long"),
    ).otherwise(first)
    last = _bucket(df, end, bucket_s)
    if max_buckets_per_interval is not None:
        n = last - first + 1
        first = F.when(
            n > max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit("allen_classify: interval spans "),
                    n.cast("string"),
                    F.lit(
                        f" buckets > max_buckets_per_interval="
                        f"{max_buckets_per_interval}; raise bucket_s or "
                        "split the interval upstream"
                    ),
                )
            ).cast("long"),
        ).otherwise(first)
    return df.withColumn("_b", F.explode(F.sequence(first, last)))


def allen_classify(
    a: DataFrame,
    b: DataFrame,
    key: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_s: float,
    max_buckets_per_interval: int | None = None,
) -> DataFrame:
    """Allen's interval algebra over two interval tables: every
    same-``key`` (a, b) pair that touches or intersects, labeled with
    its exact Allen relation — equals / starts / started_by /
    finishes / finished_by / during / contains / meets / met_by /
    overlaps / overlapped_by.  The two disjoint relations (before /
    after) are deliberately NOT enumerated: they are the quadratic
    complement of this output and carry no per-pair information.

    The relation label is decided by six comparisons on the raw
    endpoints (half-open [start, end) intervals; ``meets`` is
    ``a_end == b_start``), so downstream temporal reasoners
    (containment rollups, schedule conflict classes, dwell-vs-window
    audits) get the full 11-class taxonomy from ONE join instead of
    eleven range predicates.

    Scale shape is the house bucketed interval join with CLOSED-end
    coverage (each side also explodes to its end bucket — half-open
    coverage silently drops a ``meets`` pair exactly when the touch
    lands on a bucket edge, tested): equi-join on (key, bucket),
    first-shared-bucket dedup as a residual predicate (no distinct),
    degenerate intervals and bucket blowups fail loudly.

    Returns all a columns + b columns + ``relation``."""
    _require_disjoint(a, b, key)
    ab = _explode_buckets_closed(a, a_start, a_end, bucket_s,
                                 max_buckets_per_interval)
    bb = _explode_buckets_closed(b, b_start, b_end, bucket_s,
                                 max_buckets_per_interval)
    first_shared = F.greatest(
        _bucket(a, a_start, bucket_s), _bucket(b, b_start, bucket_s)
    )
    return (
        ab.join(bb, on=[key, "_b"])
        .where(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (F.col("_b") == first_shared)
        )
        .drop("_b")
        .withColumn(
            "relation", _allen_case(a_start, a_end, b_start, b_end)
        )
    )


def allen_classify_sql(
    a_src: str,
    b_src: str,
    key: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
) -> str:
    """DuckDB twin of :func:`allen_classify` — the naive touch-or-
    intersect range join plus the same endpoint CASE (the oracle
    verifies the DEFINITION; bucketing and dedup are the engine's
    job).  Emits a.* , b.* , relation."""
    return f"""
        SELECT a.*, b.*,
               {_allen_case_sql(
                   f"a.{a_start}", f"a.{a_end}",
                   f"b.{b_start}", f"b.{b_end}")} AS relation
        FROM ({a_src}) a JOIN ({b_src}) b USING ({key})
        WHERE a.{a_start} <= b.{b_end} AND b.{b_start} <= a.{a_end}
    """


def series_autocorr(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    lags: "tuple[int, ...]" = (1,),
) -> DataFrame:
    """Per-key lag-k autocorrelation of an integer series — the
    TEMPORAL sibling of spatial.morans_i (identical exact-integer
    discipline, adjacency replaced by the lag shift): the
    periodicity/persistence detector for per-key event-rate series
    (hourly counts, rollup deltas) that slot_anomalies' fixed
    daily-slot model can't express.

    Standard biased ACF estimator, sqrt-free by construction (one
    shared denominator, unlike Pearson's two):

        d_t     = n·v_t − S          (N-scaled deviations, no float mean)
        num_k   = Σ_{t≤n−k} d_t·d_{t+k}
        den     = Σ_t d_t²
        acf_ppm = num_k·10⁶ DIV den  (decimal(38,0) / HUGEINT,
                                      truncation toward zero on both
                                      engines; NULL when den = 0 —
                                      constant series — or n ≤ k)

    Series order is (``order_col``) per key, which must be UNIQUE per
    key (enforced: duplicate positions raise rather than silently
    correlating an arbitrary permutation).

    Plan: ONE shuffle on the key serves all three windows (row_number,
    n, S share the partitioning); each lag is a (key, pos) equi-join
    of the deviation table against itself shifted — Spark reuses the
    same hash partitioning, and the lag fan is a constant ≤ len(lags)
    multiplier on the series, not a window over unbounded frames.

    Returns (key, lag, n, n_pairs, num, den, acf_ppm)."""
    if not lags or any(int(k) < 1 for k in lags):
        raise ValueError(f"lags must be ≥ 1: {lags}")
    lags = tuple(sorted(set(int(k) for k in lags)))
    dec = "decimal(38,0)"
    wk = W.partitionBy("_k").orderBy("_o")
    wall = W.partitionBy("_k")
    dup_guard = F.when(
        F.count(F.lit(1)).over(W.partitionBy("_k", "_o")) > 1,
        F.raise_error(
            F.concat(
                F.lit("series_autocorr: duplicate order value within "
                      "key at "),
                F.col("_o").cast("string"),
            )
        ).cast("long"),
    )
    dev = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("bigint").alias("_v"),
    ).select(
        "_k",
        F.coalesce(dup_guard, F.row_number().over(wk)).alias("_pos"),
        F.count(F.lit(1)).over(wall).alias("_n"),
        (
            F.count(F.lit(1)).over(wall) * F.col("_v")
            - F.sum("_v").over(wall)
        ).alias("_d"),
    )
    den = dev.groupBy("_k").agg(
        F.max("_n").alias("n"),
        F.sum(F.expr(f"CAST(_d AS {dec}) * _d")).alias("_den"),
    )
    shifted = None
    for k in lags:
        part = dev.select(
            "_k",
            F.lit(k).alias("lag"),
            (F.col("_pos") + F.lit(k)).alias("_tpos"),
            F.col("_d").alias("_d1"),
        )
        shifted = part if shifted is None else shifted.unionByName(part)
    pairs = shifted.join(
        dev.select("_k", F.col("_pos").alias("_tpos"),
                   F.col("_d").alias("_d2")),
        ["_k", "_tpos"],
    ).groupBy("_k", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.expr(f"CAST(_d1 AS {dec}) * _d2")).alias("_num"),
    )
    lag_lit = F.explode(F.array(*[F.lit(k) for k in lags])).alias("lag")
    frame = den.select("_k", "n", "_den", lag_lit)
    return (
        frame.join(pairs, ["_k", "lag"], "left")
        .select(
            F.col("_k").alias(key_col),
            "lag",
            "n",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce(F.col("_num"), F.lit(0).cast(dec))
            .cast("bigint").alias("num"),
            F.col("_den").cast("bigint").alias("den"),
            F.expr(
                "CAST(CASE WHEN _den = 0 OR n_pairs IS NULL THEN NULL "
                "ELSE (_num * 1000000) DIV _den END AS BIGINT)"
            ).alias("acf_ppm"),
        )
    )


def series_autocorr_sql(
    src: str,
    key_col: str,
    order_col: str,
    value_col: str,
    lags: "tuple[int, ...]" = (1,),
) -> str:
    """DuckDB twin of :func:`series_autocorr` (sa_*-namespaced;
    HUGEINT mirrors decimal(38,0), // truncates like DIV)."""
    lags = tuple(sorted(set(int(k) for k in lags)))
    lag_vals = ", ".join(f"({k})" for k in lags)
    return f"""
        WITH sa_dev AS (
            SELECT {key_col} AS _k,
                   ROW_NUMBER() OVER (PARTITION BY {key_col}
                                      ORDER BY {order_col}) AS _pos,
                   COUNT(*) OVER (PARTITION BY {key_col}) AS _n,
                   COUNT(*) OVER (PARTITION BY {key_col})
                       * CAST({value_col} AS BIGINT)
                   - SUM(CAST({value_col} AS BIGINT))
                       OVER (PARTITION BY {key_col}) AS _d
            FROM {src}
        ),
        sa_den AS (
            SELECT _k, MAX(_n) AS n,
                   SUM(CAST(_d AS HUGEINT) * _d) AS _den
            FROM sa_dev GROUP BY _k
        ),
        sa_pairs AS (
            SELECT a._k, l.lag,
                   COUNT(*) AS n_pairs,
                   SUM(CAST(a._d AS HUGEINT) * b._d) AS _num
            FROM sa_dev a
            CROSS JOIN (VALUES {lag_vals}) l(lag)
            JOIN sa_dev b
              ON b._k = a._k AND b._pos = a._pos + l.lag
            GROUP BY a._k, l.lag
        )
        SELECT d._k AS {key_col}, l.lag, d.n,
               CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(p._num, 0) AS BIGINT) AS num,
               CAST(d._den AS BIGINT) AS den,
               CAST(CASE WHEN d._den = 0 OR p.n_pairs IS NULL THEN NULL
                    ELSE (p._num * 1000000) // d._den
                    END AS BIGINT) AS acf_ppm
        FROM sa_den d
        CROSS JOIN (VALUES {lag_vals}) l(lag)
        LEFT JOIN sa_pairs p ON p._k = d._k AND p.lag = l.lag
    """


def peak_overlap(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Per-key PEAK concurrency: the maximum number of simultaneously
    open half-open intervals [start, end) and the earliest instant the
    peak is reached — capacity planning's question (max concurrent
    sessions/requests/devices) where :func:`interval_coverage` answers
    utilization's.  The same sweep-line, aggregated the other way:
    coverage integrates the level, this takes its max.

    Half-open semantics make endpoint ties exact: an interval ending
    at t does NOT overlap one starting at t, so at each distinct
    timestamp all ends apply before all starts.  The sweep therefore
    pre-aggregates ±1 deltas per (key, t) — net(t) = starts − ends —
    and the level after processing t is the running sum of net;
    because the intra-t trajectory dips first and rises monotonically
    afterwards, every intra-t maximum equals some level_after, so
    peak = max over t of the running sum.  Pre-grouping also makes the
    window ORDER BY key unique per partition — running sums over
    duplicate sort keys are the classic nondeterminism trap this
    engine bans.

    Empty intervals (end ≤ start, an empty [s,e)) open nothing — they
    are excluded from the sweep but still counted in n_intervals (no
    silent drops); a key with ONLY empty intervals reports peak 0,
    peak_at_us NULL.  All integer µs.

    Plan: one map-side-combining groupBy(key, t), one key-partitioned
    window sort, one groupBy(key) for the peak, and a key-local
    join-back for the earliest argmax — two hash shuffles on the key,
    nothing global.  Output: (key, n_intervals, peak, peak_at_us)."""
    counts = intervals.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_intervals")
    )
    live = intervals.where(F.col(end_col) > F.col(start_col))
    deltas = (
        live.select(
            key_col, F.col(start_col).alias("_t"), F.lit(1).alias("_d")
        )
        .unionByName(
            live.select(
                key_col, F.col(end_col).alias("_t"),
                F.lit(-1).alias("_d"),
            )
        )
        .groupBy(key_col, "_t")
        .agg(F.sum("_d").alias("_net"))
    )
    levels = deltas.select(
        key_col,
        "_t",
        F.sum("_net")
        .over(
            W.partitionBy(key_col)
            .orderBy("_t")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .alias("_lvl"),
    )
    peaks = levels.groupBy(key_col).agg(F.max("_lvl").alias("peak"))
    peak_at = (
        levels.join(peaks, key_col)
        .where(F.col("_lvl") == F.col("peak"))
        .groupBy(key_col)
        .agg(F.min("_t").alias("peak_at_us"), F.max("peak").alias("peak"))
    )
    return counts.join(peak_at, key_col, "left").select(
        key_col,
        "n_intervals",
        F.coalesce("peak", F.lit(0)).cast("bigint").alias("peak"),
        "peak_at_us",
    )


def peak_overlap_sql(
    src: str,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> str:
    """DuckDB twin of :func:`peak_overlap`."""
    return f"""
        WITH po_counts AS (
            SELECT {key_col}, CAST(COUNT(*) AS BIGINT) AS n_intervals
            FROM {src} GROUP BY 1
        ),
        po_live AS (
            SELECT {key_col}, {start_col} AS s, {end_col} AS e
            FROM {src} WHERE {end_col} > {start_col}
        ),
        po_deltas AS (
            SELECT {key_col}, t, SUM(d) AS net FROM (
                SELECT {key_col}, s AS t, 1 AS d FROM po_live
                UNION ALL
                SELECT {key_col}, e AS t, -1 AS d FROM po_live
            ) GROUP BY 1, 2
        ),
        po_levels AS (
            SELECT {key_col}, t,
                   SUM(net) OVER (PARTITION BY {key_col} ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS lvl
            FROM po_deltas
        ),
        po_peaks AS (
            SELECT {key_col}, MAX(lvl) AS peak
            FROM po_levels GROUP BY 1
        ),
        po_at AS (
            SELECT l.{key_col}, MIN(l.t) AS peak_at_us,
                   MAX(p.peak) AS peak
            FROM po_levels l
            JOIN po_peaks p ON p.{key_col} = l.{key_col}
                           AND l.lvl = p.peak
            GROUP BY 1
        )
        SELECT c.{key_col}, c.n_intervals,
               CAST(COALESCE(a.peak, 0) AS BIGINT) AS peak,
               a.peak_at_us
        FROM po_counts c
        LEFT JOIN po_at a ON a.{key_col} = c.{key_col}
    """


def session_rules(
    events: DataFrame,
    gap_s: int = 1800,
    min_support: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    max_items_per_basket: int = 64,
) -> DataFrame:
    """Association rules over session baskets (the market-basket
    classic on the event stream): sessions are the baskets (gap_s
    inactivity splits, the engine's sessionize convention), DISTINCT
    event types the items, and each ordered rule A→B scores

        conf_m = n_both·10⁶ DIV n_A                  (confidence)
        lift_m = (n_both·N·10⁶) DIV (n_A·n_B)        (lift)

    in exact integers (lift's wide product in decimal(38)/HUGEINT —
    the collocations discipline on baskets instead of bigrams).
    Rules below ``min_support`` joint sessions are dropped — the
    standard small-sample guard.

    Scale shape: the basket self-join fans C(t,2)·2 per session — a
    pathological basket (bot session touching every item) would blow
    it up, so distinct-items-per-basket is guarded by a loud
    assert_true riding the join key (house rule: no silent caps).
    One window sort for sessionization, two map-side-combining
    groupBys, a broadcast 1-row total.

    Output: (antecedent, consequent, n_both, n_ante, conf_m, lift_m),
    antecedent ≠ consequent, both directions emitted."""
    w = W.partitionBy(user_col).orderBy(ts_col)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    sess = events.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "_sid",
        F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    baskets = sess.select(
        user_col, "_sid", F.col(item_col).alias("_item")
    ).distinct()
    sizes = baskets.groupBy(user_col, "_sid").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    guard = F.assert_true(
        F.col("_bn") <= F.lit(int(max_items_per_basket)),
        F.lit(
            f"session_rules: basket exceeds max_items_per_basket="
            f"{max_items_per_basket}; pair fan-out is C(t,2) — "
            "pre-filter bot sessions or raise the cap"
        ),
    )
    b = baskets.join(sizes, [user_col, "_sid"]).select(
        user_col,
        F.when(guard.isNull(), F.col("_sid")).alias("_sid"),
        "_item",
    )
    n_sessions = sizes.agg(F.count(F.lit(1)).alias("_ns"))
    item_n = b.groupBy("_item").agg(F.count(F.lit(1)).alias("_cnt"))
    pairs = (
        b.select(user_col, "_sid", F.col("_item").alias("antecedent"))
        .join(
            b.select(user_col, "_sid", F.col("_item").alias("consequent")),
            [user_col, "_sid"],
        )
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= int(min_support))
    )
    dec = "decimal(38,0)"
    return (
        pairs.join(
            item_n.select(
                F.col("_item").alias("antecedent"),
                F.col("_cnt").alias("n_ante"),
            ),
            "antecedent",
        )
        .join(
            item_n.select(
                F.col("_item").alias("consequent"),
                F.col("_cnt").alias("_nc"),
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            "n_ante",
            F.expr("CAST(n_both * 1000000 DIV n_ante AS BIGINT)").alias(
                "conf_m"
            ),
            F.expr(
                f"CAST((CAST(n_both AS {dec}) * _ns * 1000000) "
                f"DIV (CAST(n_ante AS {dec}) * _nc) AS BIGINT)"
            ).alias("lift_m"),
        )
    )


def session_rules_sql(
    src: str,
    gap_s: int = 1800,
    min_support: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`session_rules` (standalone; no basket
    guard — the operator owns the loud failure)."""
    return f"""
        WITH sr_sess AS (
            SELECT {user_col}, {item_col},
                   SUM(CASE WHEN prev IS NULL
                            OR epoch_us({ts_col}) - prev
                               > {int(gap_s)} * 1000000
                       THEN 1 ELSE 0 END) OVER (
                       PARTITION BY {user_col} ORDER BY {ts_col}
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM (
                SELECT *, LAG(epoch_us({ts_col})) OVER (
                       PARTITION BY {user_col} ORDER BY {ts_col})
                       AS prev
                FROM {src}
            )
        ),
        sr_baskets AS (
            SELECT DISTINCT {user_col}, sid, {item_col} AS item
            FROM sr_sess
        ),
        sr_ns AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM (
                SELECT DISTINCT {user_col}, sid FROM sr_baskets
            )
        ),
        sr_item AS (
            SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM sr_baskets GROUP BY 1
        ),
        sr_pairs AS (
            SELECT a.item AS antecedent, b.item AS consequent,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM sr_baskets a
            JOIN sr_baskets b
              ON a.{user_col} = b.{user_col} AND a.sid = b.sid
             AND a.item <> b.item
            GROUP BY 1, 2
            HAVING COUNT(*) >= {int(min_support)}
        )
        SELECT p.antecedent, p.consequent, p.n_both,
               ia.cnt AS n_ante,
               CAST(p.n_both * 1000000 // ia.cnt AS BIGINT) AS conf_m,
               CAST((CAST(p.n_both AS HUGEINT) * t.ns * 1000000)
                    // (CAST(ia.cnt AS HUGEINT) * ic.cnt) AS BIGINT)
                   AS lift_m
        FROM sr_pairs p
        JOIN sr_item ia ON ia.item = p.antecedent
        JOIN sr_item ic ON ic.item = p.consequent
        CROSS JOIN sr_ns t
    """


def rolling_active_users(
    events: DataFrame,
    short_days: int = 7,
    long_days: int = 28,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU / WAU / MAU — exact trailing-window DISTINCT user counts
    per activity day.  Distinct counts don't merge across days
    (:func:`rolling_rollup`'s RANGE-frame SUM is unavailable — a
    7-day frame over per-day distincts double-counts returning
    users), so the exact construction fans each DISTINCT (day, user)
    fact forward to the ``long_days`` target days it keeps alive, and
    one aggregation computes both trailing windows with conditional
    distincts (offset < short_days → the short window).

    Scale shape: the fan runs on the (day, user) DISTINCT aggregate —
    long_days × |active user-days|, NOT × events — and the two
    COUNT(DISTINCT CASE…) share one Expand in the same aggregate.
    Only days with actual activity emit rows (the day grid is the
    data's own support; zero-activity days inside a window still
    count their carried users on REAL days).

    Output: (day epoch-day, dau, active_short, active_long)."""
    if not (0 < short_days <= long_days):
        raise ValueError(
            f"rolling_active_users: need 0 < short_days <= long_days, "
            f"got {short_days}, {long_days}"
        )
    day = F.expr(
        f"CAST(unix_micros(CAST({ts_col} AS TIMESTAMP)) "
        "DIV 86400000000 AS BIGINT)"
    )
    facts = events.select(
        day.alias("_day"), F.col(user_col).alias("_u")
    ).distinct()
    real_days = facts.select("_day").distinct()
    fan = facts.select(
        "_u",
        F.col("_day").alias("_src_day"),
        F.explode(
            F.sequence(
                F.col("_day"),
                F.col("_day") + F.lit(int(long_days) - 1),
            )
        ).alias("day"),
    )
    agg = (
        fan.join(real_days.select(F.col("_day").alias("day")), "day")
        .groupBy("day")
        .agg(
            F.countDistinct(
                F.when(F.col("_src_day") == F.col("day"), F.col("_u"))
            ).alias("dau"),
            F.countDistinct(
                F.when(
                    F.col("day") - F.col("_src_day")
                    < F.lit(int(short_days)),
                    F.col("_u"),
                )
            ).alias("active_short"),
            F.countDistinct("_u").alias("active_long"),
        )
    )
    return agg


def rolling_active_users_sql(
    src: str,
    short_days: int = 7,
    long_days: int = 28,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`rolling_active_users` (standalone)."""
    return f"""
        WITH rau_facts AS (
            SELECT DISTINCT
                   epoch_us({ts_col}) // 86400000000 AS d,
                   {user_col} AS u
            FROM {src}
        ),
        rau_days AS (SELECT DISTINCT d AS day FROM rau_facts),
        rau_fan AS (
            SELECT f.u, f.d AS src_day, f.d + o.o AS day
            FROM rau_facts f,
                 LATERAL (SELECT UNNEST(range(0, {int(long_days)}))
                          AS o) o
        )
        SELECT f.day,
               CAST(COUNT(DISTINCT CASE WHEN f.src_day = f.day
                    THEN f.u END) AS BIGINT) AS dau,
               CAST(COUNT(DISTINCT CASE WHEN f.day - f.src_day
                    < {int(short_days)} THEN f.u END) AS BIGINT)
                   AS active_short,
               CAST(COUNT(DISTINCT f.u) AS BIGINT) AS active_long
        FROM rau_fan f JOIN rau_days d USING (day)
        GROUP BY 1
    """


def attribution_credits(
    events: DataFrame,
    conversion_type: str,
    lookback_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution: every ``conversion_type``
    event distributes exactly 10⁶ ppm of credit over the user's
    preceding touch events (any other type) since the previous
    conversion and within ``lookback_s`` — under the three standard
    models at once, rolled up per channel (= event type):

        first_ppm  — 10⁶ to the earliest touch in the window
        last_ppm   — 10⁶ to the latest touch
        linear_ppm — 10⁶ DIV n to each touch, truncation remainder
                     to the LAST touch (mass-conserving: each
                     converted conversion distributes exactly 10⁶)

    Membership is decided by SEQUENCE order (each touch belongs to
    the next conversion in the user's (ts, event_id) order — a
    reverse-cumulative conversion count, one pass, no interval join),
    then the lookback filter drops stale touches (conv_ts − ts >
    lookback).  Equal-timestamp touch/conversion pairs resolve by the
    same total order, deterministically.  Touches after a user's
    last conversion credit nothing.

    Exactness: integer epoch microseconds, integer ppm; per-channel
    sums ≤ 10⁶·conversions (int64 to ~9·10¹² conversions).

    Plan: two per-user window passes (group assignment, in-group
    rank) + one per-(user, conversion) count join + one channel
    groupBy — never a touches×conversions join; windows are
    user-keyed, so no single-partition stage.  Returns (channel,
    n_touches, n_conversions, first_ppm, last_ppm, linear_ppm);
    n_conversions counts conversions the channel touched."""
    if lookback_s <= 0:
        raise ValueError(f"lookback_s must be > 0: {lookback_s}")
    lb_us = int(lookback_s) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_id"),
        (F.col(type_col) == conversion_type).cast("int").alias("_c"),
    )
    wrev = W.partitionBy("_u").orderBy(
        F.col("_us").desc(), F.col("_id").desc()
    )
    grouped = ev.withColumn("_grp", F.sum("_c").over(wrev))
    convs = grouped.where(F.col("_c") == 1).select(
        "_u", "_grp",
        F.col("_us").alias("_conv_us"),
    )
    touches = (
        grouped.where((F.col("_c") == 0) & (F.col("_grp") > 0))
        .join(convs, ["_u", "_grp"])
        .where(F.col("_conv_us") - F.col("_us") <= lb_us)
    )
    wasc = W.partitionBy("_u", "_grp").orderBy("_us", "_id")
    ranked = touches.withColumn("_rk", F.row_number().over(wasc))
    sizes = ranked.groupBy("_u", "_grp").agg(
        F.count(F.lit(1)).alias("_n")
    )
    credited = ranked.join(sizes, ["_u", "_grp"]).select(
        "_u", "_grp", "_t",
        F.when(F.col("_rk") == 1, F.lit(1_000_000))
        .otherwise(F.lit(0)).alias("_first"),
        F.when(F.col("_rk") == F.col("_n"), F.lit(1_000_000))
        .otherwise(F.lit(0)).alias("_last"),
        F.expr(
            "(1000000 DIV _n) + CASE WHEN _rk = _n THEN "
            "1000000 - _n * (1000000 DIV _n) ELSE 0 END"
        ).alias("_linear"),
    )
    return (
        credited.groupBy(F.col("_t").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct(F.struct("_u", "_grp")).alias(
                "n_conversions"
            ),
            F.sum("_first").alias("first_ppm"),
            F.sum("_last").alias("last_ppm"),
            F.sum("_linear").alias("linear_ppm"),
        )
    )


def attribution_credits_sql(
    src: str,
    conversion_type: str,
    lookback_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`attribution_credits` (standalone
    statement; at_*-namespaced CTEs)."""
    if lookback_s <= 0:
        raise ValueError(f"lookback_s must be > 0: {lookback_s}")
    lb_us = int(lookback_s) * 1_000_000
    return f"""
        WITH at_ev AS (
            SELECT {user_col} AS _u, {type_col} AS _t,
                   epoch_us({ts_col}) AS _us, {id_col} AS _id,
                   CASE WHEN {type_col} = '{conversion_type}'
                        THEN 1 ELSE 0 END AS _c
            FROM {src}
        ),
        at_grp AS MATERIALIZED (
            SELECT *, SUM(_c) OVER (PARTITION BY _u
                                    ORDER BY _us DESC, _id DESC) AS _grp
            FROM at_ev
        ),
        at_conv AS (
            SELECT _u, _grp, _us AS _conv_us
            FROM at_grp WHERE _c = 1
        ),
        at_touch AS MATERIALIZED (
            SELECT t._u, t._grp, t._t, t._us, t._id
            FROM at_grp t JOIN at_conv c USING (_u, _grp)
            WHERE t._c = 0 AND t._grp > 0
              AND c._conv_us - t._us <= {lb_us}
        ),
        at_ranked AS (
            SELECT _u, _grp, _t,
                   ROW_NUMBER() OVER (PARTITION BY _u, _grp
                                      ORDER BY _us, _id) AS _rk,
                   COUNT(*) OVER (PARTITION BY _u, _grp) AS _n
            FROM at_touch
        ),
        at_credit AS (
            SELECT _u, _grp, _t,
                   CASE WHEN _rk = 1 THEN 1000000 ELSE 0 END AS _first,
                   CASE WHEN _rk = _n THEN 1000000 ELSE 0 END AS _last,
                   (1000000 // _n) + CASE WHEN _rk = _n THEN
                       1000000 - _n * (1000000 // _n) ELSE 0 END
                       AS _linear
            FROM at_ranked
        )
        SELECT _t AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(COUNT(DISTINCT (_u, _grp)) AS BIGINT)
                   AS n_conversions,
               CAST(SUM(_first) AS BIGINT) AS first_ppm,
               CAST(SUM(_last) AS BIGINT) AS last_ppm,
               CAST(SUM(_linear) AS BIGINT) AS linear_ppm
        FROM at_credit GROUP BY _t
    """


def funnel_latency(
    events: DataFrame,
    steps: "list[str]",
    max_gap_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Step-transition latency profile of :func:`event_funnel`'s
    earliest-completion walk — the funnel's TIME dimension (the count
    funnel says who converts; this says how long each hop takes, the
    number a product team actually tunes): for every user completing
    step k, latency_k = t_k − t_{k−1} in exact integer µs, summarized
    per step with nearest-rank quantiles:

        p50 = value at rank (n+1) DIV 2,  p90 = value at rank
        ⌈9n/10⌉ = (9n+9) DIV 10           (LOWER nearest-rank, the
                                           mad_outliers convention —
                                           exact, no interpolation)

    The walk is event_funnel's greedy earliest-completion recurrence
    (same join chain, same gap window), so the two operators agree on
    who converts by construction; ties inside a step resolve by the
    min aggregate, parallelism-independent.

    Plan: len(steps)−1 user-keyed join+agg rounds over 1-row-per-user
    frames (the funnel shape), then ONE step-keyed window rank for
    the quantiles (group-keyed, never a global window — the
    mad_outliers discipline).  Returns one row per step ≥ 2:
    (step, event_type, n_users, min_us, p50_us, p90_us, max_us)."""
    if len(steps) < 2:
        raise ValueError("funnel_latency needs at least 2 steps")
    gap_us = int(max_gap_sec) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    cur = (
        ev.where(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("_prev"))
    )
    lats = None
    for k, s in enumerate(steps[1:], start=2):
        done = (
            ev.where(F.col("_t") == s)
            .join(cur, "_u")
            .where(
                (F.col("_us") > F.col("_prev"))
                & (F.col("_us") <= F.col("_prev") + F.lit(gap_us))
            )
            .groupBy("_u")
            .agg(
                F.min("_us").alias("_now"),
                F.min("_prev").alias("_from"),
            )
        )
        lat = done.select(
            F.lit(k).alias("step"),
            F.lit(s).alias("event_type"),
            "_u",
            (F.col("_now") - F.col("_from")).alias("_lat"),
        )
        lats = lat if lats is None else lats.unionByName(lat)
        cur = done.select("_u", F.col("_now").alias("_prev"))
    w = W.partitionBy("step").orderBy("_lat", "_u")
    ranked = lats.withColumn("_rk", F.row_number().over(w))
    stats = ranked.groupBy("step", "event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("_lat").alias("min_us"),
        F.max("_lat").alias("max_us"),
    )
    p50 = ranked.join(
        stats.select(
            "step", F.expr("(n_users + 1) DIV 2").alias("_rk")
        ),
        ["step", "_rk"],
    ).select("step", F.col("_lat").alias("p50_us"))
    p90 = ranked.join(
        stats.select(
            "step", F.expr("(9 * n_users + 9) DIV 10").alias("_rk")
        ),
        ["step", "_rk"],
    ).select("step", F.col("_lat").alias("p90_us"))
    return (
        stats.join(F.broadcast(p50), "step")
        .join(F.broadcast(p90), "step")
        .select("step", "event_type", "n_users", "min_us",
                "p50_us", "p90_us", "max_us")
    )


def funnel_latency_sql(
    src: str,
    steps: "list[str]",
    max_gap_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_latency` (standalone statement) —
    the same chained walk carrying transition times, same nearest-rank
    quantile ranks."""
    if len(steps) < 2:
        raise ValueError("funnel_latency needs at least 2 steps")
    gap_us = int(max_gap_sec) * 1_000_000
    ctes = [
        f"fl_ev AS (SELECT {user_col} AS u, {type_col} AS t, "
        f"epoch_us({ts_col}) AS us FROM {src})",
        f"fl_s1 AS (SELECT u, MIN(us) AS prev FROM fl_ev "
        f"WHERE t = '{steps[0]}' GROUP BY u)",
    ]
    lat_selects = []
    for k, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"fl_s{k} AS MATERIALIZED (SELECT e.u, MIN(e.us) AS prev, "
            f"MIN(p.prev) AS came_from "
            f"FROM fl_ev e JOIN fl_s{k - 1} p ON e.u = p.u "
            f"WHERE e.t = '{s}' AND e.us > p.prev "
            f"AND e.us <= p.prev + {gap_us} GROUP BY e.u)"
        )
        lat_selects.append(
            f"SELECT {k} AS step, '{s}' AS event_type, u, "
            f"prev - came_from AS _lat FROM fl_s{k}"
        )
    ctes.append(
        "fl_lat AS (" + "\nUNION ALL\n".join(lat_selects) + ")"
    )
    ctes.append(
        """fl_ranked AS (
            SELECT step, event_type, _lat,
                   ROW_NUMBER() OVER (PARTITION BY step
                                      ORDER BY _lat, u) AS _rk
            FROM fl_lat
        )"""
    )
    ctes.append(
        """fl_stats AS (
            SELECT step, event_type, COUNT(*) AS n_users,
                   MIN(_lat) AS min_us, MAX(_lat) AS max_us
            FROM fl_lat GROUP BY 1, 2
        )"""
    )
    return (
        "WITH " + ",\n".join(ctes) + """
        SELECT s.step, s.event_type,
               CAST(s.n_users AS BIGINT) AS n_users,
               CAST(s.min_us AS BIGINT) AS min_us,
               CAST(m.p50 AS BIGINT) AS p50_us,
               CAST(n.p90 AS BIGINT) AS p90_us,
               CAST(s.max_us AS BIGINT) AS max_us
        FROM fl_stats s
        JOIN (SELECT r.step, r._lat AS p50 FROM fl_ranked r
              JOIN fl_stats t ON t.step = r.step
              AND r._rk = (t.n_users + 1) // 2) m ON m.step = s.step
        JOIN (SELECT r.step, r._lat AS p90 FROM fl_ranked r
              JOIN fl_stats t ON t.step = r.step
              AND r._rk = (9 * t.n_users + 9) // 10) n
          ON n.step = s.step
    """
    )


HOLT_SCALE_SHIFT = 20  # level/trend fixed-point: value · 2^20


def holt_smoothing(
    series: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    alpha: "tuple[int, int]" = (1, 4),
    beta: "tuple[int, int]" = (1, 8),
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) per group in
    exact fixed-point integers — the forecasting layer over the
    engine's time buckets: the one-step-ahead residual is the
    trend-aware anomaly score (a traffic series that doubles every
    hour has a huge EWMA residual but a small HOLT residual — and
    vice versa when the trend breaks), the seasonal-naive
    slot_anomalies' aseasonal sibling.

    With rational α = a₁/a₂, β = b₁/b₂ and x_q = x·2²⁰:

        l_t = (a₁·x_q(t) + (a₂−a₁)·(l_{t−1} + b_{t−1})) DIV a₂
        b_t = (b₁·(l_t − l_{t−1}) + (b₂−b₁)·b_{t−1}) DIV b₂
        resid_t = x_q(t) − (l_{t−1} + b_{t−1})     (t ≥ 1; 0 at t=0)

    l₀ = x_q(0), b₀ = 0 (declared init).  Truncating division loses
    < 1 fixed-point quantum (2⁻²⁰ of a unit) per step,
    deterministically and identically in both engines — the DuckDB
    twin walks the SAME recurrence as a recursive CTE (one row per
    (group, t) per recursion depth), a different execution family
    than the operator's per-group loop, so the recurrence itself is
    what gets verified.

    The recurrence is inherently sequential in t, so the operator
    runs per-group in ``applyInPandas`` (the custom-stateful house
    pattern, fold's sibling): groups process in parallel, each
    group's series loops locally — right for bucketed series whose
    per-group length is bounded (hours in the corpus window), wrong
    for one giant ungrouped series (shard it first; stated).

    ``t_col`` must be a dense 0-based index per group (row_number
    upstream).  int64 bound: |x|·2²⁰·a₂ < 2⁶³ → |x| < 2³⁴ at the
    defaults.  Returns (group, t, x_q, level_q, trend_q, resid_q)."""
    a1, a2 = alpha
    b1, b2 = beta
    if not (0 < a1 <= a2 and 0 < b1 <= b2):
        raise ValueError(f"bad alpha/beta rationals: {alpha}, {beta}")
    import pandas as pd

    shift = HOLT_SCALE_SHIFT
    out_schema = (
        f"{group_col} string, t bigint, x_q bigint, level_q bigint, "
        f"trend_q bigint, resid_q bigint"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_t")
        g = pdf[group_col].iloc[0]
        xs = [int(v) << shift for v in pdf["_x"]]
        recs = []
        lv = tr = None
        for t, xq in enumerate(xs):
            if t == 0:
                lv, tr, resid = xq, 0, 0
            else:
                fc = lv + tr
                resid = xq - fc
                # Python // floors; quotients here must TRUNCATE
                # like Spark DIV — fix the sign explicitly
                num = a1 * xq + (a2 - a1) * fc
                nl = -((-num) // a2) if num < 0 else num // a2
                numb = b1 * (nl - lv) + (b2 - b1) * tr
                tr = -((-numb) // b2) if numb < 0 else numb // b2
                lv = nl
            recs.append((g, t, xq, lv, tr, resid))
        return pd.DataFrame(
            recs,
            columns=[group_col, "t", "x_q", "level_q", "trend_q",
                     "resid_q"],
        )

    base = series.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    return base.groupBy(group_col).applyInPandas(run, out_schema)


def holt_smoothing_sql(
    src: str,
    group_col: str,
    t_col: str,
    value_col: str,
    alpha: "tuple[int, int]" = (1, 4),
    beta: "tuple[int, int]" = (1, 8),
) -> str:
    """DuckDB twin of :func:`holt_smoothing` — the identical
    recurrence as a recursive CTE walking t (standalone statement).
    Quotients are sign-decomposed so the truncation contract is
    explicit in the SQL rather than an engine detail (the
    annotator_kappa discipline; DuckDB's integer // already
    truncates, Python's // does not — the operator fixes its own
    sign the same way)."""
    a1, a2 = alpha
    b1, b2 = beta
    if not (0 < a1 <= a2 and 0 < b1 <= b2):
        raise ValueError(f"bad alpha/beta rationals: {alpha}, {beta}")
    shift = HOLT_SCALE_SHIFT

    def trunc(num: str, den: int) -> str:
        return (
            f"(CASE WHEN ({num}) < 0 THEN -((-({num})) // {den}) "
            f"ELSE ({num}) // {den} END)"
        )

    lnum = f"{a1} * s.x_q + {a2 - a1} * (h.level_q + h.trend_q)"
    lexpr = trunc(lnum, a2)
    bnum = f"{b1} * ({lexpr} - h.level_q) + {b2 - b1} * h.trend_q"
    bexpr = trunc(bnum, b2)
    return f"""
        WITH RECURSIVE hs_series AS (
            SELECT CAST({group_col} AS VARCHAR) AS g,
                   CAST({t_col} AS BIGINT) AS t,
                   CAST({value_col} AS BIGINT) * {2 ** shift} AS x_q
            FROM {src}
        ),
        hs_walk(g, t, x_q, level_q, trend_q, resid_q) AS (
            SELECT g, t, x_q, x_q, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM hs_series WHERE t = 0
            UNION ALL
            SELECT s.g, s.t, s.x_q,
                   {lexpr},
                   {bexpr},
                   s.x_q - (h.level_q + h.trend_q)
            FROM hs_walk h
            JOIN hs_series s ON s.g = h.g AND s.t = h.t + 1
        )
        SELECT g AS {group_col}, t, x_q, level_q, trend_q, resid_q
        FROM hs_walk
    """


def gap_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 3600,
    max_buckets: int = 100_000,
) -> DataFrame:
    """Densify each key's bucketed series over its OWN [first, last]
    span and forward-fill the value — the gap-filling every
    time-series consumer needs before a window/rate computation
    (:func:`rolling_rollup`'s RANGE frame dodges densification for
    trailing sums; anything reading "the value AS OF each hour" —
    rates, diffs, charts, feature matrices — needs the grid rows to
    exist).  Absent buckets emit n_events = 0, NULL cents, is_gap =
    true, and cents_ffill = the last OBSERVED bucket's total (the
    as-of carry; never an interpolation — exact by construction).

    Scale design: one (key, bucket) partial-agg groupBy touches the
    events; the span and the densify fan run per key on the
    AGGREGATE; per-key spans beyond ``max_buckets`` fail LOUD via an
    assert riding the span column (a dormant key spanning years would
    otherwise silently explode the grid ×10⁵).  The forward-fill
    window partitions by key over ≤ span rows — never a global
    window.

    Returns (key, bucket, n_events, cents, cents_ffill, is_gap);
    bucket = epoch_micros DIV (bucket_s·10⁶), values cent-quantized
    exact int64."""
    if bucket_s <= 0 or max_buckets <= 0:
        raise ValueError("bucket_s and max_buckets must be positive")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    agg = (
        events.select(
            F.col(key_col).alias("key"),
            us.alias("_us"),
            F.round(F.col(value_col) * 100).cast("bigint").alias("_c"),
        )
        .withColumn(
            "bucket", F.expr(f"_us DIV {int(bucket_s) * 1_000_000}")
        )
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_c").alias("cents"),
        )
    )
    span = agg.groupBy("key").agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    ).select(
        "key",
        "_b0",
        F.when(
            F.col("_b1") - F.col("_b0") >= F.lit(int(max_buckets)),
            F.assert_true(
                F.lit(False),
                F.lit(f"gap_fill: key span exceeds {max_buckets} buckets"),
            ).cast("bigint"),
        ).otherwise(F.col("_b1")).alias("_b1"),
    )
    dense = span.select(
        "key",
        F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias("bucket"),
    )
    w = (
        W.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        dense.join(agg, ["key", "bucket"], "left")
        .select(
            F.col("key").alias(key_col),
            "bucket",
            F.coalesce(F.col("n_events"), F.lit(0))
            .cast("bigint").alias("n_events"),
            "cents",
            F.last("cents", ignorenulls=True).over(w)
            .alias("cents_ffill"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


def gap_fill_sql(
    src: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 3600,
    max_buckets: int = 100_000,
) -> str:
    """DuckDB twin of :func:`gap_fill` (standalone; gf_*
    namespaced).  Same densify + carry; the span guard is an
    error() CASE riding the emitted _b1 (DuckDB prunes standalone
    guard columns — the cube_rollup lesson)."""
    bus = int(bucket_s) * 1_000_000
    return f"""
        WITH gf_agg AS (
            SELECT {key_col} AS key,
                   epoch_us({ts_col}) // {bus} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND({value_col} * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM {src} GROUP BY 1, 2
        ),
        gf_span AS (
            SELECT key, MIN(bucket) AS b0,
                   CASE WHEN MAX(bucket) - MIN(bucket)
                             >= {int(max_buckets)}
                        THEN CAST(error(
                            'gap_fill: key span exceeds {int(max_buckets)} buckets'
                        ) AS BIGINT)
                        ELSE MAX(bucket) END AS b1
            FROM gf_agg GROUP BY 1
        ),
        gf_dense AS (
            SELECT key, UNNEST(range(b0, b1 + 1)) AS bucket
            FROM gf_span
        )
        SELECT d.key AS {key_col}, d.bucket,
               COALESCE(a.n_events, 0) AS n_events,
               a.cents,
               LAST_VALUE(a.cents IGNORE NULLS) OVER (
                   PARTITION BY d.key ORDER BY d.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cents_ffill,
               a.n_events IS NULL AS is_gap
        FROM gf_dense d
        LEFT JOIN gf_agg a ON a.key = d.key AND a.bucket = d.bucket
    """


def theil_sen(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_points: int = 2_048,
) -> DataFrame:
    """Theil–Sen robust line fit per key — the ESTIMATION companion
    of spatial.tile_trend's Mann–Kendall DIRECTION test: MK says "is
    there a monotone trend"; Theil–Sen says "how steep is it", with
    the same outlier immunity (the slope is the MEDIAN of all pairwise
    slopes, so up to ~29% wild points move it not at all — an OLS
    slope chases every spike, which on event-rate series means every
    incident reprices the trend):

        slope_ppm     = median over i<j of (y_j−y_i)·10⁶ DIV (t_j−t_i)
        intercept_ppm = median over i of (y_i·10⁶ − slope_ppm·t_i)

    Exact integers: DIV truncates toward zero in BOTH engines
    (measured: Spark DIV and DuckDB // agree at −7/2 = −3; Python
    mirrors must use trunc, not floor //); medians are LOWER medians
    (rank (k+1) DIV 2 under slope value order) so no averaging of the
    two middle elements can reintroduce halves; quotients fit int64
    for |slope| ≤ 9·10¹².

    Scale design: the pairwise fan is O(n²) per key — inherent to the
    estimator, NOT hidden: a LOUD ``max_points`` guard raises on any
    key longer than the cap (default 2048 → ≤ ~2M pairs/key; segment
    or bucket longer series upstream).  ONE shuffle on the key serves
    the self-join (both sides share the hash partitioning) and the
    two median windows; nothing crosses keys.  ``order_col`` must be
    unique per key (duplicate t would make dt = 0: division by zero
    in DuckDB, NULL in Spark — the guard raises first).

    Keys with a single point have no pairs: emitted with n_pairs = 0
    and NULL slope/intercept (absence of evidence).

    Returns (key, n_pts, n_pairs, slope_ppm, intercept_ppm)."""
    if not 2 <= int(max_points) <= 100_000:
        raise ValueError(f"max_points out of range: {max_points}")
    dec = "decimal(38,0)"
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_y"),
    )
    wall = W.partitionBy("_k")
    guarded = base.withColumn("_n", F.count(F.lit(1)).over(wall)) \
        .withColumn("_dup", F.count(F.lit(1)).over(
            W.partitionBy("_k", "_t")))
    ok = F.when(
        F.col("_n") > int(max_points),
        F.raise_error(F.concat(
            F.lit("theil_sen: key holds "),
            F.col("_n").cast("string"),
            F.lit(f" points > max_points={int(max_points)}; "
                  "segment the series upstream"),
        )).cast("long"),
    ).when(
        F.col("_dup") > 1,
        F.raise_error(F.concat(
            F.lit(f"theil_sen: duplicate {order_col} within a key "),
            F.lit("(dt=0 would divide by zero); aggregate first"),
        )).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    pts = guarded.select(
        "_k", (F.col("_t") + ok).alias("_t"), "_y", "_n"
    )
    a = pts.select("_k", F.col("_t").alias("_ta"),
                   F.col("_y").alias("_ya"))
    b = pts.select("_k", F.col("_t").alias("_tb"),
                   F.col("_y").alias("_yb"))
    slopes = (
        a.join(b, on="_k")
        .where(F.col("_ta") < F.col("_tb"))
        .selectExpr(
            "_k",
            "_ta", "_tb",
            f"CAST((CAST(_yb AS {dec}) - _ya) * 1000000 "
            f"DIV (_tb - _ta) AS BIGINT) AS _s",
        )
    )
    wsl = W.partitionBy("_k").orderBy("_s", "_ta", "_tb")
    med = (
        slopes
        .withColumn("_rn", F.row_number().over(wsl))
        .withColumn("_np", F.count(F.lit(1)).over(W.partitionBy("_k")))
        .where(F.col("_rn") == F.expr("(_np + 1) DIV 2"))
        .select("_k", "_np", F.col("_s").alias("slope_ppm"))
    )
    with_slope = pts.join(med, on="_k", how="left")
    wic = W.partitionBy("_k").orderBy("_b", "_t")
    icept = (
        with_slope
        .where(F.col("slope_ppm").isNotNull())
        .selectExpr(
            "_k", "_t",
            f"CAST(CAST(_y AS {dec}) * 1000000 "
            f"- CAST(slope_ppm AS {dec}) * _t AS BIGINT) AS _b",
        )
        .withColumn("_rn", F.row_number().over(wic))
        .withColumn("_nn", F.count(F.lit(1)).over(W.partitionBy("_k")))
        .where(F.col("_rn") == F.expr("(_nn + 1) DIV 2"))
        .select("_k", F.col("_b").alias("intercept_ppm"))
    )
    heads = pts.groupBy("_k").agg(
        F.max("_n").cast("long").alias("n_pts")
    )
    return (
        heads.join(med, on="_k", how="left")
        .join(icept, on="_k", how="left")
        .select(
            F.col("_k").alias(key_col),
            "n_pts",
            F.coalesce(F.col("_np"), F.lit(0))
            .cast("long").alias("n_pairs"),
            "slope_ppm",
            "intercept_ppm",
        )
    )


def theil_sen_sql(
    src: str,
    key_col: str,
    order_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`theil_sen` (pairwise-slope self-join,
    lower-median row_number picks, HUGEINT ppm arithmetic, the same
    truncating division).  The operator's guards are the loud ones;
    the twin assumes valid input.  Standalone."""
    return f"""
        WITH ts_pts AS (
            SELECT {key_col} AS k,
                   CAST({order_col} AS BIGINT) AS t,
                   CAST({value_col} AS BIGINT) AS y
            FROM {src}
        ),
        ts_slopes AS (
            SELECT a.k, a.t AS ta, b.t AS tb,
                   CAST((CAST(b.y AS HUGEINT) - a.y) * 1000000
                        // (b.t - a.t) AS BIGINT) AS s
            FROM ts_pts a JOIN ts_pts b
              ON b.k = a.k AND a.t < b.t
        ),
        ts_med AS (
            SELECT k, np, s AS slope_ppm FROM (
                SELECT k, s,
                       ROW_NUMBER() OVER (
                           PARTITION BY k ORDER BY s, ta, tb) AS rn,
                       COUNT(*) OVER (PARTITION BY k) AS np
                FROM ts_slopes
            ) WHERE rn = (np + 1) // 2
        ),
        ts_icept AS (
            SELECT k, b AS intercept_ppm FROM (
                SELECT p.k,
                       CAST(CAST(p.y AS HUGEINT) * 1000000
                            - CAST(m.slope_ppm AS HUGEINT) * p.t
                            AS BIGINT) AS b,
                       ROW_NUMBER() OVER (
                           PARTITION BY p.k
                           ORDER BY CAST(p.y AS HUGEINT) * 1000000
                                    - CAST(m.slope_ppm AS HUGEINT)
                                      * p.t, p.t) AS rn,
                       COUNT(*) OVER (PARTITION BY p.k) AS nn
                FROM ts_pts p JOIN ts_med m ON m.k = p.k
            ) WHERE rn = (nn + 1) // 2
        ),
        ts_heads AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pts
            FROM ts_pts GROUP BY 1
        )
        SELECT h.k AS {key_col}, h.n_pts,
               CAST(COALESCE(m.np, 0) AS BIGINT) AS n_pairs,
               m.slope_ppm, i.intercept_ppm
        FROM ts_heads h
        LEFT JOIN ts_med m ON m.k = h.k
        LEFT JOIN ts_icept i ON i.k = h.k
    """


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    period: int = 24,
) -> DataFrame:
    """Classical additive seasonal decomposition per key — the
    STRUCTURE-splitting companion of :func:`holt_smoothing` (Holt
    tracks level+trend forward; this factors a whole regular series
    into trend + repeating seasonal shape + remainder, which is how
    an hourly event series separates its daily rhythm from genuine
    growth and from anomalies):

        trend_t    = centered MA over one period (half-weight ends
                     when ``period`` is even — the textbook 2×p MA)
        seasonal_φ = mean of (y − trend) per phase φ = t mod p,
                     re-centered so the p phase effects sum to ~0
        remainder  = y − trend − seasonal

    Exact integers: the MA rides a ×2p scaling (trend_2p = ends +
    2·interior for even p; 2·window for odd), so no division happens
    until the final ppm projections; every division is a truncating
    DIV with engine-agreed toward-zero semantics.  Trend (hence
    remainder) is NULL on the first/last half-period — edge
    extrapolation is a modeling choice this operator refuses to make
    silently.

    The series must be REGULAR per key: consecutive ``order_col``
    with no gaps or duplicates (loud guard — run events_gap_fill
    first; a silent gap would smear the MA window across missing
    hours).  Plan: one shuffle on the key serves the lag/lead/window
    family; the seasonal means are a (key, phase) groupBy re-joined
    on phase — never a second key-wide pass.

    Returns (key, t, phase, y, trend_ppm, seasonal_ppm,
    remainder_ppm); seasonal_ppm is present on every row (phases
    learn from interior rows), trend/remainder NULL at edges."""
    p = int(period)
    if not 2 <= p <= 10_000:
        raise ValueError(f"period out of range: {period}")
    dec = "decimal(38,0)"
    h = p // 2
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_y"),
    )
    wall = W.partitionBy("_k")
    g = (
        base
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_lo", F.min("_t").over(wall))
        .withColumn("_hi", F.max("_t").over(wall))
        .withColumn("_dup", F.count(F.lit(1)).over(
            W.partitionBy("_k", "_t")))
    )
    ok = F.when(
        (F.col("_hi") - F.col("_lo") + 1 != F.col("_n"))
        | (F.col("_dup") > 1),
        F.raise_error(F.concat(
            F.lit("seasonal_decompose: irregular series for a key "
                  "(gaps or duplicate "),
            F.lit(order_col),
            F.lit("); densify with events_gap_fill first"),
        )).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    pts = g.select("_k", (F.col("_t") + ok).alias("_t"), "_y")
    wo = W.partitionBy("_k").orderBy("_t")
    if p % 2 == 0:
        interior = (
            F.sum("_y").over(wo.rowsBetween(-(h - 1), h - 1))
        )
        trend2p = F.when(
            F.lag("_y", h).over(wo).isNotNull()
            & F.lead("_y", h).over(wo).isNotNull(),
            F.lag("_y", h).over(wo)
            + F.lit(2) * interior
            + F.lead("_y", h).over(wo),
        )
    else:
        cnt_w = F.count("_y").over(wo.rowsBetween(-h, h))
        trend2p = F.when(
            cnt_w == F.lit(2 * h + 1),
            F.lit(2) * F.sum("_y").over(wo.rowsBetween(-h, h)),
        )
    t2p = pts.withColumn("_tr2p", trend2p).withColumn(
        "_phase", F.pmod(F.col("_t"), F.lit(p)).cast("long")
    )
    det = t2p.withColumn(
        "_det2p",
        F.when(
            F.col("_tr2p").isNotNull(),
            F.lit(2 * p) * F.col("_y") - F.col("_tr2p"),
        ),
    )
    seas_raw = (
        det.where(F.col("_det2p").isNotNull())
        .groupBy("_k", "_phase")
        .agg(
            F.sum(F.col("_det2p").cast(dec)).alias("_sd"),
            F.count(F.lit(1)).cast("long").alias("_cd"),
        )
        .selectExpr(
            "_k", "_phase",
            f"CAST((_sd * 1000000) DIV (CAST({2 * p} AS {dec}) * _cd)"
            f" AS BIGINT) AS _sraw",
        )
    )
    wk = W.partitionBy("_k")
    seas = seas_raw.select(
        "_k", "_phase",
        (
            F.col("_sraw")
            - F.expr(
                f"CAST(SUM(CAST(_sraw AS {dec})) "
                f"OVER (PARTITION BY _k) DIV "
                f"COUNT(*) OVER (PARTITION BY _k) AS BIGINT)"
            )
        ).alias("seasonal_ppm"),
    )
    out = (
        det.join(seas, on=["_k", "_phase"], how="left")
        .selectExpr(
            "_k", "_t", "_phase", "_y",
            f"CAST((CAST(_tr2p AS {dec}) * 1000000) "
            f"DIV {2 * p} AS BIGINT) AS trend_ppm",
            "seasonal_ppm",
        )
        .selectExpr(
            f"_k AS {key_col}",
            f"_t AS {order_col}",
            "_phase AS phase",
            f"_y AS {value_col}",
            "trend_ppm",
            "seasonal_ppm",
            f"CAST(CASE WHEN trend_ppm IS NOT NULL THEN "
            f"CAST(_y AS {dec}) * 1000000 - trend_ppm "
            f"- COALESCE(seasonal_ppm, 0) END AS BIGINT)"
            f" AS remainder_ppm",
        )
    )
    return out


def seasonal_decompose_sql(
    src: str,
    key_col: str,
    order_col: str,
    value_col: str,
    period: int = 24,
) -> str:
    """DuckDB twin of :func:`seasonal_decompose` (2×p centered MA via
    lag/lead + interior window sum, per-phase HUGEINT means, the same
    truncating divisions and re-centering).  Assumes regular series —
    the operator's guard is the loud one.  Standalone."""
    p = int(period)
    if not 2 <= p <= 10_000:
        raise ValueError(f"period out of range: {period}")
    h = p // 2
    if p % 2 == 0:
        tr = f"""CASE WHEN LAG(y, {h}) OVER wo IS NOT NULL
                      AND LEAD(y, {h}) OVER wo IS NOT NULL THEN
                 LAG(y, {h}) OVER wo
                 + 2 * SUM(y) OVER (PARTITION BY k ORDER BY t
                       ROWS BETWEEN {h - 1} PRECEDING
                       AND {h - 1} FOLLOWING)
                 + LEAD(y, {h}) OVER wo END"""
    else:
        tr = f"""CASE WHEN COUNT(y) OVER ww = {2 * h + 1} THEN
                 2 * SUM(y) OVER ww END"""
    return f"""
        WITH sd_pts AS (
            SELECT {key_col} AS k,
                   CAST({order_col} AS BIGINT) AS t,
                   CAST({value_col} AS BIGINT) AS y
            FROM {src}
        ),
        sd_tr AS (
            SELECT k, t, y,
                   CAST(t % {p} + CASE WHEN t % {p} < 0
                        THEN {p} ELSE 0 END AS BIGINT) AS phase,
                   {tr} AS tr2p
            FROM sd_pts
            WINDOW wo AS (PARTITION BY k ORDER BY t),
                   ww AS (PARTITION BY k ORDER BY t
                          ROWS BETWEEN {h} PRECEDING
                          AND {h} FOLLOWING)
        ),
        sd_det AS (
            SELECT k, t, y, phase,
                   tr2p,
                   CASE WHEN tr2p IS NOT NULL
                        THEN {2 * p} * y - tr2p END AS det2p
            FROM sd_tr
        ),
        sd_seas_raw AS (
            SELECT k, phase,
                   CAST((SUM(CAST(det2p AS HUGEINT)) * 1000000)
                        // (CAST({2 * p} AS HUGEINT) * COUNT(*))
                        AS BIGINT) AS sraw
            FROM sd_det WHERE det2p IS NOT NULL
            GROUP BY 1, 2
        ),
        sd_seas AS (
            SELECT k, phase,
                   CAST(sraw - SUM(CAST(sraw AS HUGEINT))
                        OVER (PARTITION BY k)
                        // COUNT(*) OVER (PARTITION BY k)
                        AS BIGINT) AS seasonal_ppm
            FROM sd_seas_raw
        )
        SELECT d.k AS {key_col}, d.t AS {order_col}, d.phase,
               d.y AS {value_col},
               CAST((CAST(d.tr2p AS HUGEINT) * 1000000)
                    // {2 * p} AS BIGINT) AS trend_ppm,
               s.seasonal_ppm,
               CAST(CASE WHEN d.tr2p IS NOT NULL THEN
                    CAST(d.y AS HUGEINT) * 1000000
                    - (CAST(d.tr2p AS HUGEINT) * 1000000)
                      // {2 * p}
                    - COALESCE(s.seasonal_ppm, 0)
               END AS BIGINT) AS remainder_ppm
        FROM sd_det d
        LEFT JOIN sd_seas s ON s.k = d.k AND s.phase = d.phase
    """


def pettitt_split(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Pettitt rank change-point per key — the RANK-ROBUST companion
    of :func:`cusum_split`: CUSUM finds the strongest MEAN shift, so
    one monster outlier can claim the split; Pettitt maximizes the
    Mann–Whitney statistic between the two sides,

        U_t = Σ_{i≤t} Σ_{j>t} sgn(x_j − x_i),   t = 1..n−1
        split = argmax_t |U_t|  (earliest tie)

    so only the ORDERING of values matters — a spike is one rank, not
    an unbounded lever.  Never the O(n²) pair sum: the antisymmetric
    identity U_t = Σ_{i≤t} V_i with V_i = #{x_j > x_i} − #{x_j < x_i}
    turns it into a per-key VALUE-histogram cumulative (V from one
    ordered window over the key's distinct values) plus one prefix
    sum in time order — two windows sharing one hash shuffle on the
    key, O(n log n) per key, exact integers throughout (|U| < n²/2
    keeps int64 to ~4·10⁹ points per key).

    Argmax ties break to the EARLIEST t via max_by on (|U|, −t) — a
    total order, deterministic at any parallelism.  ``order_col``
    must be unique per key (duplicate positions would make the
    prefix ambiguous — loud guard).  Keys with n < 2 have no
    admissible split and are absent.

    Output: (key, n, split_k, split_t, u_abs, u_signed)."""
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_y"),
    )
    wall = W.partitionBy("_k")
    wdup = W.partitionBy("_k", "_t")
    g = base.withColumn("_n", F.count(F.lit(1)).over(wall)) \
        .withColumn("_dup", F.count(F.lit(1)).over(wdup))
    ok = F.when(
        F.col("_dup") > 1,
        F.raise_error(F.lit(
            f"pettitt_split: duplicate {order_col} within a key; "
            "aggregate to unique positions first"
        )).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    rows = g.select("_k", (F.col("_t") + ok).alias("_t"), "_y", "_n")
    hist = rows.groupBy("_k", "_y").agg(
        F.count(F.lit(1)).cast("long").alias("_c"),
        F.max("_n").alias("_n"),
    )
    wv = (
        W.partitionBy("_k").orderBy("_y")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    vmap = hist.select(
        "_k", "_y",
        (
            F.col("_n")
            - F.lit(2) * F.coalesce(F.sum("_c").over(wv), F.lit(0))
            - F.col("_c")
        ).alias("_v"),
    )
    wt = (
        W.partitionBy("_k").orderBy("_t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wrn = W.partitionBy("_k").orderBy("_t")
    scored = (
        rows.join(vmap, on=["_k", "_y"])
        .withColumn("_u", F.sum("_v").over(wt))
        .withColumn("_i", F.row_number().over(wrn))
        .where(F.col("_i") <= F.col("_n") - 1)
    )
    pick = F.struct(
        F.abs(F.col("_u")).alias("a"),
        (-F.col("_i")).alias("negi"),
        F.col("_u").alias("u"),
        F.col("_i").alias("i"),
        F.col("_t").alias("t"),
    )
    return (
        scored.groupBy("_k")
        .agg(
            F.max("_n").cast("long").alias("n"),
            F.max(pick).alias("_best"),
        )
        .select(
            F.col("_k").alias(key_col),
            "n",
            F.col("_best.i").cast("long").alias("split_k"),
            F.col("_best.t").cast("long").alias("split_t"),
            F.col("_best.a").cast("long").alias("u_abs"),
            F.col("_best.u").cast("long").alias("u_signed"),
        )
    )


def pettitt_split_sql(
    src: str,
    key_col: str,
    order_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`pettitt_split` (histogram V-map, time
    prefix sum, earliest-tie argmax via the same (|U|, −t) struct
    order expressed as ORDER BY).  Standalone; pt_*-namespaced."""
    return f"""
        WITH pt_rows AS (
            SELECT {key_col} AS k,
                   CAST({order_col} AS BIGINT) AS t,
                   CAST({value_col} AS BIGINT) AS y,
                   COUNT(*) OVER (PARTITION BY {key_col}) AS n
            FROM {src}
        ),
        pt_hist AS (
            SELECT k, y, CAST(COUNT(*) AS BIGINT) AS c,
                   MAX(n) AS n
            FROM pt_rows GROUP BY 1, 2
        ),
        pt_v AS (
            SELECT k, y,
                   n - 2 * COALESCE(SUM(c) OVER (
                       PARTITION BY k ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) - c AS v
            FROM pt_hist
        ),
        pt_u AS (
            SELECT r.k, r.t, r.n,
                   SUM(v.v) OVER (PARTITION BY r.k ORDER BY r.t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS u,
                   ROW_NUMBER() OVER (PARTITION BY r.k
                       ORDER BY r.t) AS i
            FROM pt_rows r JOIN pt_v v ON v.k = r.k AND v.y = r.y
        ),
        pt_rank AS (
            SELECT k, n, i, t, u,
                   ROW_NUMBER() OVER (PARTITION BY k
                       ORDER BY ABS(u) DESC, i ASC) AS rn
            FROM pt_u WHERE i <= n - 1
        )
        SELECT k AS {key_col}, CAST(n AS BIGINT) AS n,
               CAST(i AS BIGINT) AS split_k,
               CAST(t AS BIGINT) AS split_t,
               CAST(ABS(u) AS BIGINT) AS u_abs,
               CAST(u AS BIGINT) AS u_signed
        FROM pt_rank WHERE rn = 1
    """


def ols_fit(
    series: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Exact ordinary-least-squares trend per key — the ESTIMATION
    twin of :func:`theil_sen` from the other end of the robustness
    spectrum (OLS is the efficient fit under well-behaved noise;
    Theil–Sen is the one an incident hour can't reprice — shipping
    both makes the disagreement itself a diagnostic):

        slope     = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²)
        intercept = (Σy·Σt² − Σt·Σty) / (n·Σt² − (Σt)²)   at t = t₀
        R²        = (n·Σty − Σt·Σy)² / ((n·Σt² − (Σt)²)·(n·Σy² − (Σy)²))

    evaluated EXACTLY in cleared-integer form: ppm quantities are the
    cross-multiplied rationals under one declared trunc-toward-zero
    division each (sign-decomposed in the twin — the cohen_kappa
    discipline, since slope and intercept go negative).  t is rebased
    to the key's own min ALGEBRAICALLY from the raw sums
    (Σ(t−m) = Σt − n·m etc.), so the rebase costs no second pass and
    the intercept is defined at t₀ = min(t) — raw epoch hours never
    enter a product.

    Physical plan: ONE hash aggregation over (key) — six sums and a
    min, map-side partial — then pure per-key arithmetic.  No window,
    no self-join (Theil–Sen's O(n²) pair join is exactly what this
    avoids), no float.

    Exactness bounds (stated): per-key products are exact while
    |n·Σ′ty| < 10¹⁶ (then Nm² < 10³²·10⁶ fits DECIMAL(38)) — hourly
    rollup scales sit orders of magnitude inside this.

    Degenerate cases: n = 1 or all-equal t → D = 0 → all three
    outputs NULL; constant y (Dy = 0) → slope/intercept exact,
    r2_ppm NULL (0/0 is undefined, not 1).

    Output: (key, n, t0, slope_ppm, intercept_ppm, r2_ppm)."""
    dec = "DECIMAL(38,0)"
    agg = (
        series.select(
            F.col(key_col).alias("k"),
            F.col(t_col).cast("bigint").alias("t"),
            F.col(value_col).cast("bigint").alias("y"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("t").alias("m"),
            F.sum(F.col("t").cast(dec)).alias("st"),
            F.sum(F.col("y").cast(dec)).alias("sy"),
            F.sum((F.col("t") * F.col("t")).cast(dec)).alias("stt"),
            F.sum((F.col("t") * F.col("y")).cast(dec)).alias("sty"),
            F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        )
    )
    # algebraic rebase to s = t − m (shift-invariant D and Nm; the
    # intercept becomes the fitted value at t₀ = m)
    reb = agg.select(
        "k", "n", "m", "sy", "syy",
        F.expr("st - CAST(n AS DECIMAL(38,0)) * m").alias("st_r"),
        F.expr(
            "stt - 2 * CAST(m AS DECIMAL(38,0)) * st"
            " + CAST(n AS DECIMAL(38,0)) * m * m"
        ).alias("stt_r"),
        F.expr("sty - CAST(m AS DECIMAL(38,0)) * sy").alias("sty_r"),
    )
    def _trunc(num: str, den: str) -> str:
        return (
            f"CAST(CASE WHEN {den} = 0 THEN NULL "
            f"WHEN ({num}) < 0 THEN -(((-({num})) * 1000000) DIV ({den})) "
            f"ELSE (({num}) * 1000000) DIV ({den}) END AS BIGINT)"
        )
    d = "(n * stt_r - st_r * st_r)"
    nm = "(n * sty_r - st_r * sy)"
    dy = "(n * syy - sy * sy)"
    return reb.select(
        F.col("k").alias(key_col),
        "n",
        F.col("m").alias("t0"),
        F.expr(_trunc(nm, d)).alias("slope_ppm"),
        F.expr(_trunc("sy * stt_r - st_r * sty_r", d)).alias(
            "intercept_ppm"
        ),
        F.expr(
            f"CAST(CASE WHEN {d} = 0 OR {dy} = 0 THEN NULL "
            f"ELSE ({nm} * {nm} * 1000000) DIV ({d} * {dy}) "
            f"END AS BIGINT)"
        ).alias("r2_ppm"),
    )


def ols_fit_sql(
    src: str,
    key_col: str,
    t_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`ols_fit` — identical cleared-integer
    closed form over HUGEINT sums, sign-decomposed truncating
    divisions.  Standalone statement."""
    return f"""
        WITH ols_pts AS (
            SELECT {key_col} AS k,
                   CAST({t_col} AS BIGINT) AS t,
                   CAST({value_col} AS BIGINT) AS y
            FROM {src}
        ),
        ols_agg AS (
            SELECT k,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   MIN(t) AS m,
                   SUM(CAST(t AS HUGEINT)) AS st,
                   SUM(CAST(y AS HUGEINT)) AS sy,
                   SUM(CAST(t AS HUGEINT) * t) AS stt,
                   SUM(CAST(t AS HUGEINT) * y) AS sty,
                   SUM(CAST(y AS HUGEINT) * y) AS syy
            FROM ols_pts GROUP BY 1
        ),
        ols_reb AS (
            SELECT k, n, m, sy, syy,
                   st - n * m AS st_r,
                   stt - 2 * CAST(m AS HUGEINT) * st + n * m * m
                       AS stt_r,
                   sty - CAST(m AS HUGEINT) * sy AS sty_r
            FROM ols_agg
        )
        SELECT k AS {key_col},
               CAST(n AS BIGINT) AS n,
               CAST(m AS BIGINT) AS t0,
               CAST(CASE WHEN n * stt_r - st_r * st_r = 0 THEN NULL
                 WHEN n * sty_r - st_r * sy < 0 THEN
                   -(((-(n * sty_r - st_r * sy)) * 1000000)
                     // (n * stt_r - st_r * st_r))
                 ELSE ((n * sty_r - st_r * sy) * 1000000)
                      // (n * stt_r - st_r * st_r)
               END AS BIGINT) AS slope_ppm,
               CAST(CASE WHEN n * stt_r - st_r * st_r = 0 THEN NULL
                 WHEN sy * stt_r - st_r * sty_r < 0 THEN
                   -(((-(sy * stt_r - st_r * sty_r)) * 1000000)
                     // (n * stt_r - st_r * st_r))
                 ELSE ((sy * stt_r - st_r * sty_r) * 1000000)
                      // (n * stt_r - st_r * st_r)
               END AS BIGINT) AS intercept_ppm,
               CAST(CASE WHEN n * stt_r - st_r * st_r = 0
                         OR n * syy - sy * sy = 0 THEN NULL
                 ELSE ((n * sty_r - st_r * sy) * (n * sty_r - st_r * sy)
                       * 1000000)
                      // ((n * stt_r - st_r * st_r)
                          * (n * syy - sy * sy))
               END AS BIGINT) AS r2_ppm
        FROM ols_reb
    """


RUNS_CHI2_05_PPM = 3_841_459  # χ²₁ 0.05 critical value, ppm (declared)


def runs_test(
    series: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test per key — is the series RANDOM around
    its own median, or does it clump (regimes, weekly waves) / flip
    (overdispersed alternation)?  The third change-detection axis
    beside pettitt_split (single break) and cusum_split (mean drift):
    a series can pass both and still fail runs.

    Exact integer form: signs are y > median (median = the
    deterministic lower nearest-rank element, the mad_outliers
    convention; ties AT the median are excluded — standard, declared),
    R = sign-change count + 1 in t order, and with n = n₁+n₂,
    A = R·n − 2n₁n₂ − n (the n-cleared R − μ):

        z² = A²·(n−1) / (2n₁n₂·(2n₁n₂ − n))

    emitted as z2_ppm under ONE declared floor division
    (non-negative operands — no sign decomposition needed), with
    `significant` = the exact cross-multiplied z² > 3.841459
    comparison (the ab_test discipline; no float, no sqrt).
    Degenerate variance (n₁ = 0, n₂ = 0, or 2n₁n₂ ≤ n) → NULL z²,
    NULL significant.

    Physical plan: one key shuffle serves everything — the median
    rank window (order by y), the median join back (same key), and
    the LAG sign-change window (order by t).  Exactness bound
    (stated): A²·(n−1)·10⁶ fits DECIMAL(38) for n ≲ 3·10⁶ points per
    key.

    Output: (key, n_above, n_below, runs, z2_ppm, significant)."""
    base = series.select(
        F.col(key_col).alias("k"),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(value_col).cast("bigint").alias("y"),
    )
    kw = W.partitionBy("k")
    med = (
        base.withColumn("rn", F.row_number().over(kw.orderBy("y", "t")))
        .withColumn("cnt", F.count(F.lit(1)).over(kw))
        .where(F.expr("rn = (cnt + 1) DIV 2"))
        .select("k", F.col("y").alias("med"))
    )
    signed = (
        base.join(med, "k")
        .where(F.col("y") != F.col("med"))
        .select("k", "t", (F.col("y") > F.col("med")).alias("s"))
    )
    flips = signed.withColumn(
        "chg",
        F.when(
            F.lag("s").over(kw.orderBy("t")).isNull()
            | (F.lag("s").over(kw.orderBy("t")) == F.col("s")),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    agg = flips.groupBy("k").agg(
        F.sum(F.when(F.col("s"), 1).otherwise(0)).cast("bigint")
        .alias("n_above"),
        F.sum(F.when(F.col("s"), 0).otherwise(1)).cast("bigint")
        .alias("n_below"),
        (F.sum("chg") + 1).cast("bigint").alias("runs"),
    )
    dec = "DECIMAL(38,0)"
    a = (
        f"(CAST(runs AS {dec}) * (n_above + n_below)"
        " - 2 * CAST(n_above AS DECIMAL(38,0)) * n_below"
        " - (n_above + n_below))"
    )
    den = (
        f"(2 * CAST(n_above AS {dec}) * n_below"
        f" * (2 * CAST(n_above AS {dec}) * n_below"
        " - (n_above + n_below)))"
    )
    z2 = (
        f"CASE WHEN n_above = 0 OR n_below = 0 OR {den} <= 0 THEN NULL "
        f"ELSE CAST(({a} * {a} * (n_above + n_below - 1) * 1000000) "
        f"DIV {den} AS BIGINT) END"
    )
    sig = (
        f"CASE WHEN n_above = 0 OR n_below = 0 OR {den} <= 0 THEN NULL "
        f"ELSE {a} * {a} * (n_above + n_below - 1) * 1000000 "
        f"> CAST({RUNS_CHI2_05_PPM} AS {dec}) * {den} END"
    )
    return agg.select(
        F.col("k").alias(key_col),
        "n_above", "n_below", "runs",
        F.expr(z2).alias("z2_ppm"),
        F.expr(sig).alias("significant"),
    )


def runs_test_sql(
    src: str,
    key_col: str,
    t_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`runs_test` — identical lower nearest-rank
    median, tie exclusion, LAG flip count, HUGEINT cleared z², and
    the same ppm critical-value comparison.  Standalone."""
    return f"""
        WITH rt_pts AS (
            SELECT {key_col} AS k,
                   CAST({t_col} AS BIGINT) AS t,
                   CAST({value_col} AS BIGINT) AS y
            FROM {src}
        ),
        rt_med AS (
            SELECT k, y AS med FROM (
                SELECT k, y,
                       ROW_NUMBER() OVER (PARTITION BY k
                           ORDER BY y, t) AS rn,
                       COUNT(*) OVER (PARTITION BY k) AS cnt
                FROM rt_pts
            ) WHERE rn = (cnt + 1) // 2
        ),
        rt_signed AS (
            SELECT p.k, p.t, p.y > m.med AS s
            FROM rt_pts p JOIN rt_med m USING (k)
            WHERE p.y <> m.med
        ),
        rt_flips AS (
            SELECT k, s,
                   CASE WHEN LAG(s) OVER (PARTITION BY k ORDER BY t)
                             IS NULL
                         OR LAG(s) OVER (PARTITION BY k ORDER BY t) = s
                        THEN 0 ELSE 1 END AS chg
            FROM rt_signed
        ),
        rt_agg AS (
            SELECT k,
                   CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS HUGEINT)
                       AS n_above,
                   CAST(SUM(CASE WHEN s THEN 0 ELSE 1 END) AS HUGEINT)
                       AS n_below,
                   CAST(SUM(chg) + 1 AS HUGEINT) AS runs
            FROM rt_flips GROUP BY 1
        )
        SELECT k AS {key_col},
               CAST(n_above AS BIGINT) AS n_above,
               CAST(n_below AS BIGINT) AS n_below,
               CAST(runs AS BIGINT) AS runs,
               CASE WHEN n_above = 0 OR n_below = 0
                     OR 2 * n_above * n_below
                        * (2 * n_above * n_below - (n_above + n_below))
                        <= 0 THEN NULL
                 ELSE CAST(((runs * (n_above + n_below)
                             - 2 * n_above * n_below
                             - (n_above + n_below))
                            * (runs * (n_above + n_below)
                               - 2 * n_above * n_below
                               - (n_above + n_below))
                            * (n_above + n_below - 1) * 1000000)
                      // (2 * n_above * n_below
                          * (2 * n_above * n_below
                             - (n_above + n_below))) AS BIGINT)
               END AS z2_ppm,
               CASE WHEN n_above = 0 OR n_below = 0
                     OR 2 * n_above * n_below
                        * (2 * n_above * n_below - (n_above + n_below))
                        <= 0 THEN NULL
                 ELSE (runs * (n_above + n_below)
                       - 2 * n_above * n_below - (n_above + n_below))
                      * (runs * (n_above + n_below)
                         - 2 * n_above * n_below - (n_above + n_below))
                      * (n_above + n_below - 1) * 1000000
                      > {RUNS_CHI2_05_PPM}
                        * (2 * n_above * n_below
                           * (2 * n_above * n_below
                              - (n_above + n_below)))
               END AS significant
        FROM rt_agg
    """


def time_weighted_avg(
    series: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Exact time-weighted average per key — the state-signal
    aggregate plain AVG gets WRONG whenever sampling is irregular
    (a sensor that reports rarely while healthy and rapidly while
    failing would drag a row-average toward the failure value; the
    TWA weights each reading by how long it was the live state):

        twa = Σᵢ vᵢ·(tᵢ₊₁ − tᵢ) / (t_max − t_min)

    last-observation-carried-forward over [t_min, t_max], the final
    reading carrying no duration (standard, stated).  t is integer
    microseconds, v an integer (pre-quantized upstream); the weighted
    sum is exact in DECIMAL(38)/HUGEINT and the single division is
    sign-decomposed trunc-toward-zero (values may be negative).
    Ordering is the TOTAL order (t, v): duplicate timestamps
    contribute zero duration deterministically.

    Single-reading keys (span 0) emit NULL twa (nothing was held for
    any time), with n and the raw value still reported via v_last.

    Physical plan: one key shuffle serves the LEAD window and the
    final aggregation.  Output: (key, n, t_span_us, v_last, twa_q)
    — twa_q in the value's own quantized units."""
    base = series.select(
        F.col(key_col).alias("k"),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    kw = W.partitionBy("k").orderBy("t", "v")
    stepped = base.select(
        "k", "t", "v",
        (F.lead("t").over(kw) - F.col("t")).alias("dt"),
    )
    agg = stepped.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.max("t") - F.min("t")).cast("bigint").alias("t_span_us"),
        F.max_by("v", F.struct("t", "v")).cast("bigint")
        .alias("v_last"),
        F.sum(
            F.expr("CAST(v AS DECIMAL(38,0)) * coalesce(dt, 0)")
        ).alias("wsum"),
    )
    return agg.select(
        F.col("k").alias(key_col),
        "n", "t_span_us", "v_last",
        F.expr(
            "CAST(CASE WHEN t_span_us = 0 THEN NULL "
            "WHEN wsum < 0 THEN -((-wsum) DIV t_span_us) "
            "ELSE wsum DIV t_span_us END AS BIGINT)"
        ).alias("twa_q"),
    )


def time_weighted_avg_sql(
    src: str,
    key_col: str,
    t_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` — identical (t, v)
    total order, LOCF durations, HUGEINT weighted sum,
    sign-decomposed truncating division.  Standalone."""
    return f"""
        WITH twa_pts AS (
            SELECT {key_col} AS k,
                   CAST({t_col} AS BIGINT) AS t,
                   CAST({value_col} AS BIGINT) AS v
            FROM {src}
        ),
        twa_step AS (
            SELECT k, t, v,
                   LEAD(t) OVER (PARTITION BY k ORDER BY t, v) - t
                       AS dt
            FROM twa_pts
        ),
        twa_agg AS (
            SELECT k,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MAX(t) - MIN(t) AS BIGINT) AS t_span_us,
                   CAST((MAX({{'t': t, 'v': v}})).v AS BIGINT)
                       AS v_last,
                   SUM(CAST(v AS HUGEINT) * COALESCE(dt, 0)) AS wsum
            FROM twa_step GROUP BY 1
        )
        SELECT k AS {key_col}, n, t_span_us, v_last,
               CAST(CASE WHEN t_span_us = 0 THEN NULL
                 WHEN wsum < 0 THEN -((-wsum) // t_span_us)
                 ELSE wsum // t_span_us END AS BIGINT) AS twa_q
        FROM twa_agg
    """


def session_entry_exit(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    gap_s: int = 1800,
) -> DataFrame:
    """Entry→exit session matrix with bounce accounting — the classic
    web-analytics rollup the sessionizer feeds (where do sessions
    START, where do they END, how many never get past the first
    event), as one table: per (entry_type, exit_type) the session
    count, bounce count (single-event sessions — necessarily on the
    diagonal), and total event volume.

    Sessions are gap-split (> ``gap_s`` seconds of silence starts a
    new one — the events_sessionize convention); entry/exit are the
    first/last events under the TOTAL order (ts, tiebreak), so
    same-timestamp edges are deterministic, and both ride ONE
    min/max(struct) pair per session — the argmax crosses the shuffle
    as a struct, never a second sort.

    Plan: one key shuffle serves the gap window, the running session
    sum, and the per-session aggregation (same partitioning); the
    final (entry, exit) rollup is a |types|²-bounded aggregate.

    Returns (entry_type, exit_type, n_sessions, n_bounces,
    total_events)."""
    kw = W.partitionBy("_k").orderBy("_t", "_tb")
    base = events.select(
        F.col(key_col).alias("_k"),
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))").alias("_t"),
        F.col(type_col).alias("_ty"),
        F.col(tiebreak_col).alias("_tb"),
    )
    gap_us = int(gap_s) * 1_000_000
    sess = base.withColumn(
        "_new",
        F.when(
            F.lag("_t").over(kw).isNull()
            | (F.col("_t") - F.lag("_t").over(kw) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "_sid",
        F.sum("_new").over(
            kw.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    per = sess.groupBy("_k", "_sid").agg(
        F.min(F.struct("_t", "_tb", "_ty")).alias("_first"),
        F.max(F.struct("_t", "_tb", "_ty")).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    return (
        per.groupBy(
            F.col("_first._ty").alias("entry_type"),
            F.col("_last._ty").alias("exit_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("_n") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_bounces"),
            F.sum("_n").cast("bigint").alias("total_events"),
        )
    )


def session_entry_exit_sql(
    src: str,
    key_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    gap_s: int = 1800,
) -> str:
    """DuckDB twin of :func:`session_entry_exit` (standalone; the
    identical gap split, (ts, tiebreak) total order, and struct
    min/max entry/exit picks)."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH se_base AS (
            SELECT {key_col} AS k,
                   epoch_us(CAST({ts_col} AS TIMESTAMP)) AS t,
                   {type_col} AS ty,
                   {tiebreak_col} AS tb
            FROM {src}
        ),
        se_gap AS (
            SELECT *,
                   CASE WHEN LAG(t) OVER w IS NULL
                         OR t - LAG(t) OVER w > {gap_us}
                        THEN 1 ELSE 0 END AS new_s
            FROM se_base
            WINDOW w AS (PARTITION BY k ORDER BY t, tb)
        ),
        se_sess AS (
            SELECT *,
                   SUM(new_s) OVER (PARTITION BY k ORDER BY t, tb
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS sid
            FROM se_gap
        ),
        se_per AS (
            SELECT k, sid,
                   (MIN({{'t': t, 'tb': tb, 'ty': ty}})).ty AS entry,
                   (MAX({{'t': t, 'tb': tb, 'ty': ty}})).ty AS exit,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM se_sess GROUP BY 1, 2
        )
        SELECT entry AS entry_type, exit AS exit_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounces,
               CAST(SUM(n) AS BIGINT) AS total_events
        FROM se_per GROUP BY 1, 2
    """


def attribution_decay(
    events: DataFrame,
    conversion_type: str,
    lookback_s: int,
    halflife_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-decay multi-touch attribution — the fourth standard model
    beside :func:`attribution_credits`' first/last/linear: a touch's
    credit halves with every ``halflife_s`` of age at conversion
    time, so recent touches dominate without the last-touch model's
    winner-take-all cliff.

    Exact-integer weights, the decayed_rollup convention: age
    quantizes to half-life buckets k = (conv_ts − ts) DIV halflife
    (one declared floor; non-negative) and the weight is the
    power-of-two  w = 2^(K − k),  K = lookback DIV halflife — integer
    by construction, no float exp.  Per conversion, touch i earns

        credit_i = (10⁶·wᵢ) DIV Σw,   remainder → the LATEST touch

    so every conversion distributes EXACTLY 10⁶ ppm (mass conserving
    — property-tested).  K is validated ≤ 40 loudly: Σw ≤ n·2^K must
    stay far inside int64 at any per-conversion touch count.

    Group assignment, total order, and lookback semantics are
    attribution_credits' verbatim (reverse-cumulative conversion
    count, (ts, event_id) order).  One extra per-(user, conversion)
    aggregation carries the floored-credit sum for the remainder.

    Returns (channel, n_touches, n_conversions, decay_ppm)."""
    if lookback_s <= 0 or halflife_s <= 0:
        raise ValueError(
            f"lookback_s and halflife_s must be > 0: "
            f"{lookback_s}, {halflife_s}"
        )
    k_max = int(lookback_s) // int(halflife_s)
    if k_max > 40:
        raise ValueError(
            f"attribution_decay: lookback/halflife = {k_max} buckets "
            "> 40 — weights 2^K would risk int64 overflow; coarsen "
            "halflife_s or shorten lookback_s"
        )
    lb_us = int(lookback_s) * 1_000_000
    hl_us = int(halflife_s) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_id"),
        (F.col(type_col) == conversion_type).cast("int").alias("_c"),
    )
    wrev = W.partitionBy("_u").orderBy(
        F.col("_us").desc(), F.col("_id").desc()
    )
    grouped = ev.withColumn("_grp", F.sum("_c").over(wrev))
    convs = grouped.where(F.col("_c") == 1).select(
        "_u", "_grp", F.col("_us").alias("_conv_us")
    )
    touches = (
        grouped.where((F.col("_c") == 0) & (F.col("_grp") > 0))
        .join(convs, ["_u", "_grp"])
        .where(F.col("_conv_us") - F.col("_us") <= lb_us)
        .withColumn(
            "_w",
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), "
                f"{k_max} - CAST((_conv_us - _us) DIV {hl_us} AS INT))"
                f" AS BIGINT)"
            ),
        )
    )
    wasc = W.partitionBy("_u", "_grp").orderBy("_us", "_id")
    ranked = touches.withColumn("_rk", F.row_number().over(wasc))
    sizes = ranked.groupBy("_u", "_grp").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_w").alias("_sw"),
    )
    based = ranked.join(sizes, ["_u", "_grp"]).withColumn(
        "_base", F.expr("(1000000 * _w) DIV _sw")
    )
    rems = based.groupBy("_u", "_grp").agg(
        (F.lit(1_000_000) - F.sum("_base")).alias("_rem")
    )
    credited = based.join(rems, ["_u", "_grp"]).select(
        "_u", "_grp", "_t",
        (F.col("_base")
         + F.when(F.col("_rk") == F.col("_n"), F.col("_rem"))
         .otherwise(F.lit(0))).alias("_credit"),
    )
    return (
        credited.groupBy(F.col("_t").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct(F.struct("_u", "_grp")).alias(
                "n_conversions"
            ),
            F.sum("_credit").cast("bigint").alias("decay_ppm"),
        )
    )


def attribution_decay_sql(
    src: str,
    conversion_type: str,
    lookback_s: int,
    halflife_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`attribution_decay` (standalone;
    ad_*-namespaced; identical bucket floors, power-of-two weights,
    remainder-to-latest)."""
    if lookback_s <= 0 or halflife_s <= 0:
        raise ValueError(
            f"lookback_s and halflife_s must be > 0: "
            f"{lookback_s}, {halflife_s}"
        )
    k_max = int(lookback_s) // int(halflife_s)
    lb_us = int(lookback_s) * 1_000_000
    hl_us = int(halflife_s) * 1_000_000
    return f"""
        WITH ad_ev AS (
            SELECT {user_col} AS _u, {type_col} AS _t,
                   epoch_us({ts_col}) AS _us, {id_col} AS _id,
                   CASE WHEN {type_col} = '{conversion_type}'
                        THEN 1 ELSE 0 END AS _c
            FROM {src}
        ),
        ad_grp AS MATERIALIZED (
            SELECT *, SUM(_c) OVER (PARTITION BY _u
                                    ORDER BY _us DESC, _id DESC)
                          AS _grp
            FROM ad_ev
        ),
        ad_conv AS (
            SELECT _u, _grp, _us AS _conv_us
            FROM ad_grp WHERE _c = 1
        ),
        ad_touch AS MATERIALIZED (
            SELECT t._u, t._grp, t._t, t._us, t._id,
                   CAST(1 AS BIGINT) << ({k_max} -
                       CAST((c._conv_us - t._us) // {hl_us} AS INT))
                       AS _w
            FROM ad_grp t JOIN ad_conv c USING (_u, _grp)
            WHERE t._c = 0 AND t._grp > 0
              AND c._conv_us - t._us <= {lb_us}
        ),
        ad_ranked AS (
            SELECT _u, _grp, _t, _w,
                   ROW_NUMBER() OVER (PARTITION BY _u, _grp
                                      ORDER BY _us, _id) AS _rk,
                   COUNT(*) OVER (PARTITION BY _u, _grp) AS _n,
                   SUM(_w) OVER (PARTITION BY _u, _grp) AS _sw
            FROM ad_touch
        ),
        ad_based AS (
            SELECT *, (1000000 * _w) // _sw AS _base
            FROM ad_ranked
        ),
        ad_credit AS (
            SELECT _u, _grp, _t,
                   _base + CASE WHEN _rk = _n THEN
                       1000000 - SUM(_base) OVER
                           (PARTITION BY _u, _grp)
                       ELSE 0 END AS _credit
            FROM ad_based
        )
        SELECT _t AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(COUNT(DISTINCT (_u, _grp)) AS BIGINT)
                   AS n_conversions,
               CAST(SUM(_credit) AS BIGINT) AS decay_ppm
        FROM ad_credit GROUP BY _t
    """


def series_crosscorr(
    df: DataFrame,
    key_col: str,
    order_col: str,
    x_col: str,
    y_col: str,
    lags: "tuple[int, ...]" = (-2, -1, 0, 1, 2),
) -> DataFrame:
    """Per-key lag-scan CROSS-correlation between two aligned integer
    series — the lead/lag detector :func:`series_autocorr`
    structurally can't ask ("do clicks LEAD purchases, and by how
    many hours?"): correlate x_t against y_{t+k} over a symmetric
    lag window and read the argmax lag.

    Same exact-integer discipline as the autocorr sibling (N-scaled
    deviations dˣ = n·x_t − Sₓ, dʸ likewise; no float means), but the
    Pearson normalization has TWO denominators and their product
    squares past decimal(38) at scale — so the score is the SIGNED
    SQUARED correlation under the rank_sum staged-division precedent:

        a = (|num_k|·10⁶) DIV denₓ,  b = (|num_k|·10⁶) DIV den_y
        xcf2_ppm = sign(num_k) · (a·b DIV 10⁶)

    |a|,|b| ≤ 10⁶ by Cauchy–Schwarz, every stage fits int64 quotients
    inside decimal(38) operands, staging truncation is sub-ppm and
    IDENTICAL in both engines, and the |·|/sign decomposition dodges
    the DIV-truncates / //-floors divergence on negatives.  NULL when
    either series is constant (den = 0) or the lag leaves no pairs.

    ``order_col`` must be unique per key (duplicate positions raise —
    the autocorr guard); rows align the two series on one grid, the
    caller densifies gaps (zeros are values, not missing — a
    half-densified series would correlate a permutation).

    Plan: one key shuffle serves the ranking windows; each lag is a
    (key, pos) equi-join on the same partitioning; |lags| is a
    constant fan.  Returns (key, lag, n, n_pairs, num, xcf2_ppm)."""
    if not lags:
        raise ValueError("lags must be non-empty")
    lags = tuple(sorted(set(int(k) for k in lags)))
    dec = "decimal(38,0)"
    wk = W.partitionBy("_k").orderBy("_o")
    wall = W.partitionBy("_k")
    dup_guard = F.when(
        F.count(F.lit(1)).over(W.partitionBy("_k", "_o")) > 1,
        F.raise_error(
            F.concat(
                F.lit("series_crosscorr: duplicate order value within "
                      "key at "),
                F.col("_o").cast("string"),
            )
        ).cast("long"),
    )
    dev = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    ).select(
        "_k",
        F.coalesce(dup_guard, F.row_number().over(wk)).alias("_pos"),
        F.count(F.lit(1)).over(wall).alias("_n"),
        (F.count(F.lit(1)).over(wall) * F.col("_x")
         - F.sum("_x").over(wall)).alias("_dx"),
        (F.count(F.lit(1)).over(wall) * F.col("_y")
         - F.sum("_y").over(wall)).alias("_dy"),
    )
    den = dev.groupBy("_k").agg(
        F.max("_n").alias("n"),
        F.sum(F.expr(f"CAST(_dx AS {dec}) * _dx")).alias("_denx"),
        F.sum(F.expr(f"CAST(_dy AS {dec}) * _dy")).alias("_deny"),
    )
    shifted = None
    for k in lags:
        part = dev.select(
            "_k",
            F.lit(k).alias("lag"),
            (F.col("_pos") + F.lit(k)).alias("_tpos"),
            F.col("_dx").alias("_d1"),
        )
        shifted = part if shifted is None else shifted.unionByName(part)
    pairs = shifted.join(
        dev.select("_k", F.col("_pos").alias("_tpos"),
                   F.col("_dy").alias("_d2")),
        ["_k", "_tpos"],
    ).groupBy("_k", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.expr(f"CAST(_d1 AS {dec}) * _d2")).alias("_num"),
    )
    lag_lit = F.explode(F.array(*[F.lit(k) for k in lags])).alias("lag")
    frame = den.select("_k", "n", "_denx", "_deny", lag_lit)
    score = (
        "CASE WHEN _denx = 0 OR _deny = 0 OR n_pairs IS NULL THEN NULL "
        "ELSE (CASE WHEN _num < 0 THEN -1 ELSE 1 END) * ("
        "((ABS(_num) * 1000000) DIV _denx)"
        " * ((ABS(_num) * 1000000) DIV _deny)"
        " DIV 1000000) END"
    )
    return (
        frame.join(pairs, ["_k", "lag"], "left")
        .select(
            F.col("_k").alias(key_col),
            "lag",
            "n",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce(F.col("_num"), F.lit(0).cast(dec))
            .cast("bigint").alias("num"),
            F.expr(f"CAST({score} AS BIGINT)").alias("xcf2_ppm"),
        )
    )


def series_crosscorr_sql(
    src: str,
    key_col: str,
    order_col: str,
    x_col: str,
    y_col: str,
    lags: "tuple[int, ...]" = (-2, -1, 0, 1, 2),
) -> str:
    """DuckDB twin of :func:`series_crosscorr` (sx_*-namespaced;
    HUGEINT, identical staged sign-decomposed score)."""
    lags = tuple(sorted(set(int(k) for k in lags)))
    lag_vals = ", ".join(f"({k})" for k in lags)
    return f"""
        WITH sx_dev AS (
            SELECT {key_col} AS _k,
                   ROW_NUMBER() OVER (PARTITION BY {key_col}
                                      ORDER BY {order_col}) AS _pos,
                   COUNT(*) OVER (PARTITION BY {key_col}) AS _n,
                   COUNT(*) OVER (PARTITION BY {key_col})
                       * CAST({x_col} AS BIGINT)
                   - SUM(CAST({x_col} AS BIGINT))
                       OVER (PARTITION BY {key_col}) AS _dx,
                   COUNT(*) OVER (PARTITION BY {key_col})
                       * CAST({y_col} AS BIGINT)
                   - SUM(CAST({y_col} AS BIGINT))
                       OVER (PARTITION BY {key_col}) AS _dy
            FROM {src}
        ),
        sx_den AS (
            SELECT _k, MAX(_n) AS n,
                   SUM(CAST(_dx AS HUGEINT) * _dx) AS _denx,
                   SUM(CAST(_dy AS HUGEINT) * _dy) AS _deny
            FROM sx_dev GROUP BY _k
        ),
        sx_pairs AS (
            SELECT a._k, l.lag,
                   COUNT(*) AS n_pairs,
                   SUM(CAST(a._dx AS HUGEINT) * b._dy) AS _num
            FROM sx_dev a
            CROSS JOIN (VALUES {lag_vals}) l(lag)
            JOIN sx_dev b
              ON b._k = a._k AND b._pos = a._pos + l.lag
            GROUP BY a._k, l.lag
        )
        SELECT d._k AS {key_col}, l.lag, d.n,
               CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(p._num, 0) AS BIGINT) AS num,
               CAST(CASE WHEN d._denx = 0 OR d._deny = 0
                         OR p.n_pairs IS NULL THEN NULL
                    ELSE (CASE WHEN p._num < 0 THEN -1 ELSE 1 END) * (
                        ((ABS(p._num) * 1000000) // d._denx)
                        * ((ABS(p._num) * 1000000) // d._deny)
                        // 1000000)
               END AS BIGINT) AS xcf2_ppm
        FROM sx_den d
        CROSS JOIN (VALUES {lag_vals}) l(lag)
        LEFT JOIN sx_pairs p ON p._k = d._k AND p.lag = l.lag
    """


def session_paths(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    gap_s: int = 1800,
    k: int = 20,
    max_path_len: int = 64,
) -> DataFrame:
    """Top-k session JOURNEYS — the full ordered event-type path per
    session, ranked by frequency: the navigation-pattern table
    between :func:`session_entry_exit`'s endpoints-only matrix and
    :func:`event_transitions`' memoryless pairs (a path is the whole
    Markov trajectory, so "view→click→view→purchase beats
    view→purchase 3:1" is readable directly).

    Same sessionizer as the session family (gap > ``gap_s`` splits;
    the events_sessionize convention) and the same TOTAL order
    (ts, tiebreak), so same-timestamp events serialize
    deterministically and the assembled path string is
    parallelism-independent.  Paths assemble as
    ``array_join(array_agg ... within the session sort)`` — one
    collect_list over the already-keyed window, bounded LOUDLY by
    ``max_path_len`` (assert_true riding the path column: an
    unbounded per-session array is the collect-blowup trap; a
    64-event session is a bot signature, not a journey).

    Rank is dense by (count DESC, path ASC) — a total order, so the
    top-k cut is deterministic; ties share counts but not ranks.

    Plan: one key shuffle serves the gap window, the running session
    id and the per-session ordered collect (same partitioning); the
    path rollup is one hash aggregate over |sessions| rows; the final
    cut is TakeOrderedAndProject-shaped (ORDER BY + LIMIT after a
    rank filter keeps ties intact instead).

    Returns (rank, path, n_sessions) — ≤ k rows plus count-ties."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")
    kw = W.partitionBy("_k").orderBy("_t", "_tb")
    base = events.select(
        F.col(key_col).alias("_k"),
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))").alias("_t"),
        F.col(type_col).alias("_ty"),
        F.col(tiebreak_col).alias("_tb"),
    )
    gap_us = int(gap_s) * 1_000_000
    sess = base.withColumn(
        "_new",
        F.when(
            F.lag("_t").over(kw).isNull()
            | (F.col("_t") - F.lag("_t").over(kw) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "_sid",
        F.sum("_new").over(
            kw.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    paths = sess.groupBy("_k", "_sid").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(_t, _tb, _ty))), s -> s._ty), '>')"
        ).alias("path"),
        F.count(F.lit(1)).alias("_len"),
    )
    guarded = paths.select(
        F.when(
            F.expr(
                f"assert_true(_len <= {int(max_path_len)}, "
                "'session_paths: a session exceeds max_path_len="
                f"{int(max_path_len)} events — raise the bound or "
                "pre-filter bot keys')"
            ).isNull(),
            F.col("path"),
        ).alias("path")
    )
    counted = guarded.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    wrank = W.orderBy(F.desc("n_sessions"), "path")
    # the global rank window runs over |distinct paths| rows AFTER a
    # pre-cut: keep only paths whose count reaches the k-th largest
    # count (a broadcast threshold), so the unpartitioned window sees
    # a k-bounded frame, not the full path vocabulary
    thresh = (
        counted.select("n_sessions")
        .orderBy(F.desc("n_sessions"))
        .limit(int(k))
        .agg(F.min("n_sessions").alias("_thr"))
    )
    trimmed = counted.crossJoin(F.broadcast(thresh)).where(
        F.col("n_sessions") >= F.col("_thr")
    )
    return (
        trimmed.select(
            F.row_number().over(wrank).alias("rank"),
            "path", "n_sessions",
        )
        .where(F.col("rank") <= int(k))
    )


def session_paths_sql(
    src: str,
    key_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    gap_s: int = 1800,
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`session_paths` — identical sessionizer,
    string_agg under the identical (ts, tiebreak) total order,
    identical (count DESC, path) rank cut.  Standalone."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH sp_base AS (
            SELECT {key_col} AS _k,
                   CAST(epoch_us(CAST({ts_col} AS TIMESTAMP))
                        AS BIGINT) AS _t,
                   {type_col} AS _ty, {tiebreak_col} AS _tb
            FROM {src}
        ),
        sp_sess AS (
            SELECT *,
                   SUM(CASE WHEN _prev IS NULL
                             OR _t - _prev > {gap_us}
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY _k ORDER BY _t, _tb
                             ROWS UNBOUNDED PRECEDING) AS _sid
            FROM (
                SELECT *, LAG(_t) OVER (PARTITION BY _k
                                        ORDER BY _t, _tb) AS _prev
                FROM sp_base
            )
        ),
        sp_paths AS (
            SELECT _k, _sid,
                   STRING_AGG(_ty, '>' ORDER BY _t, _tb) AS path
            FROM sp_sess GROUP BY 1, 2
        ),
        sp_counts AS (
            SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM sp_paths GROUP BY 1
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path)
                    AS INTEGER) AS rank,
               path, n_sessions
        FROM sp_counts
        ORDER BY 1 LIMIT {int(k)}
    """


def survival_km(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_s: int = 3600,
    horizon: int = 24,
    max_steps: int = 4096,
) -> DataFrame:
    """Kaplan–Meier survival curve with right-censoring — the churn
    question :func:`event_retention` structurally can't answer: a
    cohort table counts RETURNS per offset, but "what fraction of
    subjects is still alive at lifetime t" needs subjects whose fate
    is UNKNOWN (still active when the corpus ends) to leave the risk
    set without being counted as churn.  KM is the standard estimator
    for exactly that (Kaplan & Meier 1958), and its product form has
    an exact integer ladder.

    Subject model over an event stream: lifetime = last-activity
    bucket − first-activity bucket (``bucket_s``-second integer
    buckets: ``unix_micros DIV (bucket_s·10⁶)`` — no calendar
    functions to diverge on); a subject CHURNED (death observed at
    its lifetime) iff the corpus outlives its last activity by
    strictly more than ``horizon`` buckets, else it is censored at
    its lifetime (the trailing-window subjects may still be alive).

    Estimator, quantized exactly: at each distinct lifetime t with
    d_t observed deaths and n_t = |{lifetime ≥ t}| at risk
    (censored-at-t subjects count in n_t — the standard convention),

        S_ppm(t) = floor( S_ppm(prev) · (n_t − d_t) / n_t ),
        H_ppm(t) = H_ppm(prev) + floor( d_t·10⁶ / n_t ),

    S_ppm(start) = 10⁶.  Every operand is a non-negative int64, so
    both engines truncate identically; bound: S·n ≤ 10⁶·N — exact up
    to ~9·10¹² subjects.  H is the Nelson–Aalen cumulative hazard
    with per-term flooring (stated; terms are summed, never
    compounded, so the error is < 1 ppm per death time).

    The ladder is inherently sequential, but it runs over the
    |distinct lifetimes| step table — corpus-size-INDEPENDENT (≤
    span/bucket_s rows), never over subjects.  Plan: one key shuffle
    (per-subject min/max), a broadcast 1-row corpus-end join, one
    map-side-combinable rollup to the step table, then ONE
    sort_array + aggregate() higher-order fold in a single row —
    no windows, no Python, no driver collect.  ``max_steps`` bounds
    the collected step array LOUDLY (a blowup means bucket_s is too
    fine for the span, not more data).

    Returns one row per distinct lifetime with observed deaths:
    (dur_buckets, n_at_risk, deaths, surv_ppm, cumhaz_ppm), in
    lifetime order.  Reference anchor: the reference grades per-user
    edit eligibility over whole histories (change_bot.rb); this is
    the population-level lifetime view of the same user-activity
    stream."""
    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1: {bucket_s}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0: {horizon}")
    unit_us = int(bucket_s) * 1_000_000
    per_user = (
        events.select(
            F.col(key_col).alias("_u"),
            F.expr(
                f"CAST(unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                f"DIV {unit_us} AS BIGINT)"
            ).alias("_b"),
        )
        .groupBy("_u")
        .agg(F.min("_b").alias("_f"), F.max("_b").alias("_l"))
    )
    corpus_end = per_user.agg(F.max("_l").alias("_end"))
    durs = per_user.crossJoin(F.broadcast(corpus_end)).select(
        (F.col("_l") - F.col("_f")).alias("dur"),
        F.when(
            F.col("_end") - F.col("_l") > int(horizon), F.lit(1)
        ).otherwise(F.lit(0)).cast("bigint").alias("ch"),
    )
    steps = durs.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("ch").cast("bigint").alias("dths"),
    )
    one = steps.agg(
        F.sort_array(
            F.collect_list(F.struct("dur", "m", "dths"))
        ).alias("_steps"),
        F.coalesce(F.sum("m"), F.lit(0)).cast("bigint").alias("_n"),
    )
    guarded = one.select(
        F.when(
            F.expr(
                f"assert_true(size(_steps) <= {int(max_steps)}, "
                f"'survival_km: step table exceeds max_steps="
                f"{int(max_steps)} distinct lifetimes — coarsen "
                f"bucket_s or raise the bound')"
            ).isNull(),
            F.col("_steps"),
        ).alias("_steps"),
        "_n",
    )
    out_t = (
        "ARRAY<STRUCT<dur_buckets: BIGINT, n_at_risk: BIGINT, "
        "deaths: BIGINT, surv_ppm: BIGINT, cumhaz_ppm: BIGINT>>"
    )
    folded = guarded.select(
        F.expr(
            "aggregate(_steps, "
            "named_struct('seen', 0L, 's', 1000000L, 'h', 0L, "
            f"  'out', CAST(array() AS {out_t})), "
            "(acc, x) -> named_struct("
            "  'seen', acc.seen + x.m, "
            "  's', CASE WHEN x.dths > 0 THEN "
            "    (acc.s * ((_n - acc.seen) - x.dths)) "
            "      DIV (_n - acc.seen) "
            "    ELSE acc.s END, "
            "  'h', CASE WHEN x.dths > 0 THEN "
            "    acc.h + (x.dths * 1000000L) DIV (_n - acc.seen) "
            "    ELSE acc.h END, "
            "  'out', CASE WHEN x.dths > 0 THEN array_append("
            "    acc.out, named_struct("
            "      'dur_buckets', x.dur, "
            "      'n_at_risk', _n - acc.seen, "
            "      'deaths', x.dths, "
            "      'surv_ppm', (acc.s * ((_n - acc.seen) - x.dths)) "
            "        DIV (_n - acc.seen), "
            "      'cumhaz_ppm', acc.h + (x.dths * 1000000L) "
            "        DIV (_n - acc.seen))) "
            "    ELSE acc.out END), "
            "acc -> acc.out)"
        ).alias("_curve")
    )
    return folded.select(F.explode("_curve").alias("_r")).select(
        F.col("_r.dur_buckets").alias("dur_buckets"),
        F.col("_r.n_at_risk").alias("n_at_risk"),
        F.col("_r.deaths").alias("deaths"),
        F.col("_r.surv_ppm").alias("surv_ppm"),
        F.col("_r.cumhaz_ppm").alias("cumhaz_ppm"),
    )


def survival_km_sql(
    src: str,
    key_col: str,
    ts_col: str,
    bucket_s: int = 3600,
    horizon: int = 24,
) -> str:
    """DuckDB twin of :func:`survival_km` — identical bucketing,
    churn rule, at-risk suffix counts, and floor ladder; the
    sequential product runs as a recursive CTE over the step index
    (a DIFFERENT mechanism than Spark's aggregate() fold, so the
    ladder itself is cross-verified).  Standalone."""
    unit_us = int(bucket_s) * 1_000_000
    return f"""
        WITH RECURSIVE
        km_user AS MATERIALIZED (
            SELECT {key_col} AS _u,
                   MIN(CAST(epoch_us(CAST({ts_col} AS TIMESTAMP))
                            // {unit_us} AS BIGINT)) AS _f,
                   MAX(CAST(epoch_us(CAST({ts_col} AS TIMESTAMP))
                            // {unit_us} AS BIGINT)) AS _l
            FROM {src} GROUP BY 1
        ),
        km_dur AS MATERIALIZED (
            SELECT _l - _f AS dur,
                   CASE WHEN (SELECT MAX(_l) FROM km_user) - _l
                             > {int(horizon)}
                        THEN 1 ELSE 0 END AS ch
            FROM km_user
        ),
        km_steps AS MATERIALIZED (
            SELECT dur, CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(ch) AS BIGINT) AS dths
            FROM km_dur GROUP BY 1
        ),
        km_rn AS MATERIALIZED (
            SELECT dur, m, dths,
                   CAST(ROW_NUMBER() OVER (ORDER BY dur)
                        AS BIGINT) AS rn,
                   CAST((SELECT SUM(m) FROM km_steps)
                        - COALESCE(SUM(m) OVER (ORDER BY dur
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0)
                        AS BIGINT) AS n_at_risk
            FROM km_steps
        ),
        km_fold AS (
            SELECT CAST(0 AS BIGINT) AS rn,
                   CAST(1000000 AS BIGINT) AS s,
                   CAST(0 AS BIGINT) AS h
            UNION ALL
            SELECT r.rn,
                   CAST(CASE WHEN r.dths > 0
                        THEN (f.s * (r.n_at_risk - r.dths))
                             // r.n_at_risk
                        ELSE f.s END AS BIGINT),
                   CAST(CASE WHEN r.dths > 0
                        THEN f.h + (r.dths * 1000000) // r.n_at_risk
                        ELSE f.h END AS BIGINT)
            FROM km_fold f JOIN km_rn r ON r.rn = f.rn + 1
        )
        SELECT r.dur AS dur_buckets, r.n_at_risk, r.dths AS deaths,
               f.s AS surv_ppm, f.h AS cumhaz_ppm
        FROM km_rn r JOIN km_fold f ON f.rn = r.rn
        WHERE r.dths > 0
        ORDER BY 1
    """


def markov_attribution(
    events: DataFrame,
    channels: list[str],
    conv_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    rounds: int = 12,
) -> DataFrame:
    """Markov removal-effect attribution — the data-driven
    alternative to :func:`attribution_credits`' positional rules
    (first/last/linear are DECLARED splits; the removal effect asks
    the model: how much does conversion probability DROP if channel
    c stopped existing?).  First-order chain over journeys:

        START → touch → … → CONV (absorbing)  or  NULL (absorbing)

    A journey is a user's touch sequence up to each conversion
    (conversions split journeys; a trailing unconverted sequence
    ends in NULL).  Transition probabilities are the exact count
    ratios; the absorption probability P(reach CONV | START) is the
    ``rounds``-truncated iteration

        P_k(s) = floor( Σ_t n(s→t)·P_{k−1}(t) / n_out(s) )

    in exact ppm integers (P counts conversion paths of ≤ rounds
    hops — exact as stated, the link_distance honesty contract; the
    per-round floor is engine-identical).  Removal of channel c pins
    P(c) = 0 every round — transitions into c lead nowhere, the
    standard removal semantics — and

        effect_ppm(c) = 10⁶ − P_removed·10⁶ DIV P_full
        share_ppm(c)  = effect·10⁶ DIV Σ effects   (NULL if Σ = 0)

    (removal can only lower P, preserved under flooring by
    induction, so effects are non-negative by construction).

    Scale: the data-sized work is ONE (ts, tiebreak)-ordered lag
    window per user plus a transition-count aggregate — the chain
    itself is a ≤ (|channels|+2)² count matrix, collected bounded
    (channels are DECLARED, ≤ 16, validated loudly against the
    corpus) and solved in exact Python ints on the driver; at 10¹²
    events the collect is still ≤ 18×18 rows.  A type outside
    channels ∪ {conv_type} raises (assert_true) rather than
    silently folding into a phantom state.

    Returns one row per declared channel: (channel, n_touches,
    conv_full_ppm, conv_removed_ppm, effect_ppm, share_ppm)."""
    if not 1 <= len(channels) <= 16:
        raise ValueError(
            f"channels must list 1..16 states: {len(channels)}"
        )
    if len(set(channels)) != len(channels):
        raise ValueError("channels must be distinct")
    if conv_type in channels:
        raise ValueError("conv_type must not be a channel")
    reserved = {"START", "CONV", "NULL"}
    if reserved & set(channels) or conv_type in reserved:
        raise ValueError(f"reserved state names: {reserved}")
    if not 1 <= int(rounds) <= 32:
        raise ValueError(f"rounds must be in [1, 32]: {rounds}")
    ch_list = ", ".join(f"'{c}'" for c in channels)
    state = (
        f"CASE WHEN {type_col} = '{conv_type}' THEN 'CONV' "
        f"WHEN {type_col} IN ({ch_list}) THEN {type_col} "
        f"ELSE CAST(assert_true(false, CONCAT("
        f"'markov_attribution: event_type outside declared "
        f"channels: ', {type_col})) AS STRING) END"
    )
    uw = W.partitionBy("_u").orderBy("_t", "_tb")
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.expr(state).alias("_s"),
    ).select(
        "_u", "_s",
        F.row_number().over(uw).alias("_rn"),
        F.coalesce(
            F.sum(F.when(F.col("_s") == "CONV", 1).otherwise(0)).over(
                uw.rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_jid"),
    )
    jw = W.partitionBy("_u", "_jid").orderBy("_rn")
    steps = base.select(
        F.coalesce(F.lag("_s").over(jw), F.lit("START")).alias("_src"),
        F.col("_s").alias("_dst"),
    )
    jwd = W.partitionBy("_u", "_jid").orderBy(F.desc("_rn"))
    tails = (
        base.withColumn("_rd", F.row_number().over(jwd))
        .where((F.col("_rd") == 1) & (F.col("_s") != "CONV"))
        .select(
            F.col("_s").alias("_src"), F.lit("NULL").alias("_dst")
        )
    )
    cnt_rows = (
        steps.unionAll(tails)
        .groupBy("_src", "_dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    cnt = {(r["_src"], r["_dst"]): r["n"] for r in cnt_rows}
    n_out: dict[str, int] = {}
    for (s, _), n in cnt.items():
        n_out[s] = n_out.get(s, 0) + n
    transient = ["START"] + list(channels)

    def absorb(pin: str | None) -> int:
        p = {s: 0 for s in transient}

        def pval(t: str) -> int:
            if t == "CONV":
                return 1_000_000
            if t == "NULL":
                return 0
            return p[t]

        for _ in range(int(rounds)):
            nxt = {}
            for s in transient:
                if (pin is not None and s == pin) or not n_out.get(s):
                    nxt[s] = 0
                    continue
                acc = sum(
                    n * pval(t)
                    for (src, t), n in cnt.items()
                    if src == s
                )
                nxt[s] = acc // n_out[s]
            p = nxt
        return p["START"]

    full = absorb(None)
    rows = []
    effects = {}
    for c in channels:
        removed = absorb(c)
        eff = (
            0 if full == 0
            else 1_000_000 - (removed * 1_000_000) // full
        )
        effects[c] = eff
        rows.append((c, n_out.get(c, 0), full, removed, eff))
    total = sum(effects.values())
    out = [
        (c, nt, fu, rm, ef,
         None if total == 0 else (ef * 1_000_000) // total)
        for c, nt, fu, rm, ef in rows
    ]
    spark = events.sparkSession
    return spark.createDataFrame(
        out,
        "channel string, n_touches long, conv_full_ppm long, "
        "conv_removed_ppm long, effect_ppm long, share_ppm long",
    )


def markov_attribution_sql(
    src: str,
    channels: list[str],
    conv_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    rounds: int = 12,
) -> str:
    """DuckDB twin of :func:`markov_attribution` — identical journey
    split, transition counts, and per-round floor ladder; the
    (1 + |channels|) absorption chains unroll as MATERIALIZED CTE
    rounds (the graph-twin discipline).  Standalone."""
    ch_list = ", ".join(f"'{c}'" for c in channels)
    states_vals = ", ".join(
        f"('{s}')" for s in ["START", *channels, "CONV", "NULL"]
    )
    ctes = [
        f"""mk_ord AS MATERIALIZED (
            SELECT {user_col} AS _u,
                   CASE WHEN {type_col} = '{conv_type}' THEN 'CONV'
                        ELSE {type_col} END AS _s,
                   ROW_NUMBER() OVER (PARTITION BY {user_col}
                       ORDER BY {ts_col}, {tiebreak_col}) AS _rn,
                   COALESCE(SUM(CASE WHEN {type_col} = '{conv_type}'
                                THEN 1 ELSE 0 END)
                       OVER (PARTITION BY {user_col}
                             ORDER BY {ts_col}, {tiebreak_col}
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS _jid
            FROM {src}
            WHERE {type_col} IN ({ch_list}, '{conv_type}')
        )""",
        """mk_tr AS MATERIALIZED (
            SELECT COALESCE(LAG(_s) OVER (PARTITION BY _u, _jid
                       ORDER BY _rn), 'START') AS _src,
                   _s AS _dst
            FROM mk_ord
            UNION ALL
            SELECT _s, 'NULL'
            FROM (SELECT _s,
                         ROW_NUMBER() OVER (PARTITION BY _u, _jid
                             ORDER BY _rn DESC) AS _rd
                  FROM mk_ord)
            WHERE _rd = 1 AND _s <> 'CONV'
        )""",
        """mk_cnt AS MATERIALIZED (
            SELECT _src, _dst, CAST(COUNT(*) AS BIGINT) AS n
            FROM mk_tr GROUP BY 1, 2
        )""",
        """mk_out AS MATERIALIZED (
            SELECT _src, CAST(SUM(n) AS BIGINT) AS n_out
            FROM mk_cnt GROUP BY 1
        )""",
        f"mk_states AS (SELECT * FROM (VALUES {states_vals}) "
        "s(state))",
    ]

    def chain(tag: str, pin: str | None) -> None:
        pin_case = (
            f"WHEN st.state = '{pin}' THEN CAST(0 AS BIGINT)"
            if pin is not None else ""
        )
        ctes.append(f"""mk_{tag}_0 AS (
            SELECT state,
                   CASE WHEN state = 'CONV'
                        THEN CAST(1000000 AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS p
            FROM mk_states
        )""")
        for r in range(1, int(rounds) + 1):
            ctes.append(f"""mk_{tag}_{r} AS MATERIALIZED (
                SELECT st.state,
                       CASE WHEN st.state = 'CONV'
                                THEN CAST(1000000 AS BIGINT)
                            WHEN st.state = 'NULL'
                                THEN CAST(0 AS BIGINT)
                            {pin_case}
                            WHEN o.n_out IS NULL
                                THEN CAST(0 AS BIGINT)
                            ELSE CAST(COALESCE(a.acc, 0) // o.n_out
                                      AS BIGINT) END AS p
                FROM mk_states st
                LEFT JOIN mk_out o ON o._src = st.state
                LEFT JOIN (
                    SELECT c._src AS state, SUM(c.n * p.p) AS acc
                    FROM mk_cnt c
                    JOIN mk_{tag}_{r - 1} p ON p.state = c._dst
                    GROUP BY 1
                ) a ON a.state = st.state
            )""")

    chain("full", None)
    eff_rows = []
    for i, c in enumerate(channels):
        chain(f"rm{i}", c)
        eff_rows.append(f"""
            SELECT '{c}' AS channel,
                   CAST(COALESCE(
                       (SELECT n_out FROM mk_out WHERE _src = '{c}'),
                       0) AS BIGINT) AS n_touches,
                   (SELECT p FROM mk_full_{rounds}
                    WHERE state = 'START') AS conv_full_ppm,
                   (SELECT p FROM mk_rm{i}_{rounds}
                    WHERE state = 'START') AS conv_removed_ppm
        """)
    return (
        "WITH " + ",\n".join(ctes) + f""",
        mk_base AS ({" UNION ALL ".join(eff_rows)}),
        mk_eff AS (
            SELECT channel, n_touches, conv_full_ppm,
                   conv_removed_ppm,
                   CAST(CASE WHEN conv_full_ppm = 0 THEN 0
                        ELSE 1000000 - (conv_removed_ppm * 1000000)
                             // conv_full_ppm END AS BIGINT)
                       AS effect_ppm
            FROM mk_base
        )
        SELECT channel, n_touches, conv_full_ppm, conv_removed_ppm,
               effect_ppm,
               CAST(CASE WHEN (SELECT SUM(effect_ppm) FROM mk_eff)
                              = 0 THEN NULL
                    ELSE (effect_ppm * 1000000)
                         // (SELECT SUM(effect_ppm) FROM mk_eff)
                    END AS BIGINT) AS share_ppm
        FROM mk_eff
    """
    )


# Frozen N(0,1) quantile breakpoints in ppm (round(Φ⁻¹(i/a)·10⁶)) —
# the SAX alphabet tables, frozen at import like the DCT constants:
# engine arithmetic never touches a transcendental at runtime.
SAX_BREAKPOINTS_PPM = {
    4: [-674490, 0, 674490],
    8: [-1150349, -674490, -318639, 0, 318639, 674490, 1150349],
}
_SAX_LETTERS = "abcdefgh"


def sax_words(
    series: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    segments: int = 12,
    alphabet: int = 4,
) -> DataFrame:
    """SAX symbolization (Lin, Keogh et al. 2003) — each key's
    numeric series becomes a short SYMBOLIC word: PAA segment means,
    z-scored against the series' own mean/variance, bucketed by the
    frozen N(0,1) quantile breakpoints.  The word is the
    motif/novelty index every series-similarity pipeline builds on
    (two keys with the same word have the same coarse shape
    regardless of level or spread — exactly what raw counts can't
    say).

    Exactness: z-normalization needs σ = √(nQ−S²)/n, so instead of
    computing σ the symbol test evaluates the EQUIVALENT
    cross-multiplied comparison (the tile_hotspots discipline).
    With L = (Sseg·n − w·S)·10⁶ and D = nQ − S² (both exact in
    decimal(38)), PAA z > β ⟺

        β = 0:  L > 0
        β > 0:  L > 0  ∧  L² > b²·w²·D
        β < 0:  L ≥ 0  ∨  L² < b²·w²·D        (b = round(β·10⁶))

    symbol index = #{breakpoints strictly below the segment} — the
    STRICT rule, so a constant series (D = 0, every L = 0) maps to
    the letter just above the midpoint's lower half ('b' at a=4),
    stated.  Bounds: L² ≤ (2·|x|max·n·10⁶)² must stay inside
    decimal(38) — |x| ≤ 10⁶ with n ≤ 10⁴ leaves two digits spare;
    re-check per corpus like the other decimal operators.

    Segmentation, declared: w = n DIV segments points per segment;
    the tail n − w·segments points are DROPPED (the audio_haar
    convention — zero-padding would fabricate a phantom level), and
    mean/variance are computed over the USED prefix so the word is
    self-consistent; keys with n < segments cannot form a word and
    are dropped.

    Plan: one key shuffle serves the order window, the per-segment
    rollup and the per-key stats; symbols are pure per-row decimal
    arithmetic; the word is one bounded (≤ segments) ordered
    collect.  Returns (key, n_used, sax_word)."""
    if alphabet not in SAX_BREAKPOINTS_PPM:
        raise ValueError(
            f"alphabet must be one of "
            f"{sorted(SAX_BREAKPOINTS_PPM)}: {alphabet}"
        )
    if not 1 <= int(segments) <= 64:
        raise ValueError(f"segments must be in [1, 64]: {segments}")
    segs = int(segments)
    kw = W.partitionBy("_k").orderBy("_t", "_x")
    base = series.select(
        F.col(key_col).alias("_k"),
        F.col(t_col).alias("_t"),
        F.col(value_col).cast("bigint").alias("_x"),
    ).select("_k", "_x", F.row_number().over(kw).alias("_rn"))
    cnt = base.groupBy("_k").agg(F.count(F.lit(1)).alias("_n"))
    used = (
        base.join(cnt, "_k")
        .withColumn("_w", F.expr(f"_n DIV {segs}"))
        .where(
            (F.col("_n") >= segs)
            & (F.col("_rn") <= F.col("_w") * segs)
        )
    )
    stats = used.groupBy("_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nu"),
        F.max("_w").cast("bigint").alias("_wp"),
        F.sum("_x").cast("bigint").alias("_s"),
        F.sum(
            F.expr("CAST(_x AS DECIMAL(38,0)) * _x")
        ).alias("_q"),
    )
    per_seg = (
        used.withColumn("_seg", F.expr("CAST((_rn - 1) DIV _w AS INT)"))
        .groupBy("_k", "_seg")
        .agg(F.sum("_x").cast("bigint").alias("_sseg"))
        .join(stats, "_k")
    )
    dec = "DECIMAL(38,0)"
    l_expr = (
        f"(CAST(_sseg AS {dec}) * _nu - CAST(_wp AS {dec}) * _s) "
        f"* 1000000"
    )
    d_expr = (
        f"(CAST(_nu AS {dec}) * _q - CAST(_s AS {dec}) * _s)"
    )
    terms = []
    for b in SAX_BREAKPOINTS_PPM[alphabet]:
        if b == 0:
            terms.append("(CASE WHEN _l > 0 THEN 1 ELSE 0 END)")
        elif b > 0:
            terms.append(
                f"(CASE WHEN _l > 0 AND _l * _l > "
                f"CAST({b * b} AS {dec}) * _wp * _wp * _d "
                f"THEN 1 ELSE 0 END)"
            )
        else:
            terms.append(
                f"(CASE WHEN _l >= 0 OR _l * _l < "
                f"CAST({b * b} AS {dec}) * _wp * _wp * _d "
                f"THEN 1 ELSE 0 END)"
            )
    sym = (
        f"substr('{_SAX_LETTERS[:alphabet]}', "
        f"({' + '.join(terms)}) + 1, 1)"
    )
    symbols = per_seg.select(
        "_k", "_seg", "_nu", "_wp",
        F.expr(l_expr).alias("_l"),
        F.expr(d_expr).alias("_d"),
    ).select("_k", "_seg", "_nu", F.expr(sym).alias("_sym"))
    return symbols.groupBy("_k").agg(
        F.max("_nu").alias("n_used"),
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(_seg, _sym))), s -> s._sym), '')"
        ).alias("sax_word"),
    ).select(F.col("_k").alias(key_col), "n_used", "sax_word")


def sax_words_sql(
    src: str,
    key_col: str,
    t_col: str,
    value_col: str,
    segments: int = 12,
    alphabet: int = 4,
) -> str:
    """DuckDB twin of :func:`sax_words` — identical prefix
    truncation, PAA rollup, frozen breakpoints, and cross-multiplied
    strict symbol rule (HUGEINT products ≡ Spark's decimal(38)).
    Standalone."""
    if alphabet not in SAX_BREAKPOINTS_PPM:
        raise ValueError(f"alphabet: {alphabet}")
    segs = int(segments)
    terms = []
    for b in SAX_BREAKPOINTS_PPM[alphabet]:
        if b == 0:
            terms.append("(CASE WHEN _l > 0 THEN 1 ELSE 0 END)")
        elif b > 0:
            terms.append(
                f"(CASE WHEN _l > 0 AND _l * _l > "
                f"CAST({b * b} AS HUGEINT) * _wp * _wp * _d "
                f"THEN 1 ELSE 0 END)"
            )
        else:
            terms.append(
                f"(CASE WHEN _l >= 0 OR _l * _l < "
                f"CAST({b * b} AS HUGEINT) * _wp * _wp * _d "
                f"THEN 1 ELSE 0 END)"
            )
    sym = (
        f"substr('{_SAX_LETTERS[:alphabet]}', "
        f"CAST(({' + '.join(terms)}) + 1 AS INT), 1)"
    )
    return f"""
        WITH sx_base AS MATERIALIZED (
            SELECT {key_col} AS _k,
                   CAST({value_col} AS BIGINT) AS _x,
                   ROW_NUMBER() OVER (PARTITION BY {key_col}
                       ORDER BY {t_col}, CAST({value_col} AS BIGINT))
                       AS _rn
            FROM {src}
        ),
        sx_cnt AS (
            SELECT _k, COUNT(*) AS _n FROM sx_base GROUP BY 1
        ),
        sx_used AS MATERIALIZED (
            SELECT b._k, b._x, b._rn, c._n // {segs} AS _w
            FROM sx_base b JOIN sx_cnt c USING (_k)
            WHERE c._n >= {segs}
              AND b._rn <= (c._n // {segs}) * {segs}
        ),
        sx_stats AS MATERIALIZED (
            SELECT _k, CAST(COUNT(*) AS BIGINT) AS _nu,
                   CAST(MAX(_w) AS HUGEINT) AS _wp,
                   CAST(SUM(_x) AS HUGEINT) AS _s,
                   SUM(CAST(_x AS HUGEINT) * _x) AS _q
            FROM sx_used GROUP BY 1
        ),
        sx_seg AS MATERIALIZED (
            SELECT u._k, CAST((u._rn - 1) // u._w AS INT) AS _seg,
                   CAST(SUM(u._x) AS HUGEINT) AS _sseg
            FROM sx_used u GROUP BY 1, 2
        ),
        sx_sym AS (
            SELECT g._k, g._seg, s._nu, s._wp, s._s, s._q,
                   (g._sseg * s._nu - s._wp * s._s) * 1000000 AS _l,
                   (s._nu * s._q - s._s * s._s) AS _d
            FROM sx_seg g JOIN sx_stats s USING (_k)
        )
        SELECT _k AS {key_col},
               CAST(MAX(_nu) AS BIGINT) AS n_used,
               STRING_AGG({sym}, '' ORDER BY _seg) AS sax_word
        FROM sx_sym GROUP BY 1
    """


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 5,
    r_bucket_s: int = 3600,
    m_unit: int = 100,
    cents: int = 100,
) -> DataFrame:
    """RFM segmentation — the marketing-analytics classic: score
    every user 1..``n_bins`` on Recency (time since last activity,
    recent = high), Frequency (event count), and Monetary (summed
    value), and name the segment "rfm" (a "555" is a champion, a
    "155" a lapsing whale).  The event-stream counterpart of the
    static quality-percentile calibrators.

    Exactness + scale, the two usual traps solved together: bins
    are GLOBAL quantiles, but ranking users globally would be a
    single-partition window over the user table.  Instead each
    metric is DECLARED-bucketed first (R into ``r_bucket_s``-second
    buckets, M into ``m_unit`` cent-units after a ×``cents`` snap,
    F raw — quantization stated, engine-identical), and the bin
    map is built on the DISTINCT-bucKET frequency table:

        bin(v) = min(n_bins, 1 + cum_users_below(v)·n_bins DIV n)

    — a window over |distinct buckets| rows per dimension, never
    over users; ties share a bucket hence a bin (the
    percentile_calibrate tie discipline); users join the broadcast
    bin map back.  R scores REVERSE (smaller gap ⇒ higher score).

    Plan: one user aggregate (3 metrics in one pass + a broadcast
    corpus-end), one melt to (dim, bucket), one tiny frequency
    window, one map-back join, one pivot aggregate.  Returns
    (user, r_buckets, f_raw, m_units, r_score, f_score, m_score,
    segment)."""
    if not 2 <= int(n_bins) <= 9:
        raise ValueError(f"n_bins must be in [2, 9]: {n_bins}")
    if r_bucket_s < 1 or m_unit < 1 or cents < 1:
        raise ValueError("r_bucket_s, m_unit, cents must be >= 1")
    nb = int(n_bins)
    per_user = (
        events.select(
            F.col(user_col).alias("_u"),
            F.expr(
                f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
            ).alias("_t"),
            F.expr(
                f"CAST(ROUND({value_col} * {int(cents)}) AS BIGINT)"
            ).alias("_v"),
        )
        .groupBy("_u")
        .agg(
            F.max("_t").alias("_last"),
            F.count(F.lit(1)).cast("bigint").alias("_f"),
            F.coalesce(F.sum("_v"), F.lit(0)).cast("bigint")
            .alias("_m"),
        )
    )
    end = per_user.agg(F.max("_last").alias("_end"))
    metrics = (
        per_user.crossJoin(F.broadcast(end))
        .select(
            "_u",
            F.expr(
                f"CAST((_end - _last) DIV {int(r_bucket_s) * 1_000_000}"
                " AS BIGINT)"
            ).alias("r"),
            F.col("_f").alias("f"),
            F.expr(
                f"CAST(CASE WHEN _m >= 0 THEN _m DIV {int(m_unit)} "
                f"ELSE -((-_m) DIV {int(m_unit)}) END AS BIGINT)"
            ).alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    melted = metrics.selectExpr(
        "_u", "stack(3, 'r', r, 'f', f, 'm', m) AS (dim, v)"
    )
    freq = melted.groupBy("dim", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nat")
    )
    wd = (
        W.partitionBy("dim").orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    tot = freq.groupBy("dim").agg(F.sum("_nat").alias("_n"))
    binmap = (
        freq.withColumn(
            "_below", F.coalesce(F.sum("_nat").over(wd), F.lit(0))
        )
        .join(tot, "dim")
        .select(
            "dim", "v",
            F.least(
                F.lit(nb),
                F.lit(1)
                + F.expr(f"(_below * {nb}) DIV _n").cast("int"),
            ).alias("_bin"),
        )
    )
    scored = (
        melted.join(binmap, ["dim", "v"])
        .groupBy("_u")
        .agg(
            F.max(F.when(F.col("dim") == "r", F.col("v")))
            .alias("r_buckets"),
            F.max(F.when(F.col("dim") == "f", F.col("v")))
            .alias("f_raw"),
            F.max(F.when(F.col("dim") == "m", F.col("v")))
            .alias("m_units"),
            F.max(F.when(F.col("dim") == "r", F.col("_bin")))
            .alias("_rb"),
            F.max(F.when(F.col("dim") == "f", F.col("_bin")))
            .alias("f_score"),
            F.max(F.when(F.col("dim") == "m", F.col("_bin")))
            .alias("m_score"),
        )
    )
    return scored.select(
        F.col("_u").alias(user_col),
        "r_buckets", "f_raw", "m_units",
        (F.lit(nb + 1) - F.col("_rb")).cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        F.expr(
            f"CONCAT(CAST({nb + 1} - _rb AS STRING), "
            "CAST(f_score AS STRING), CAST(m_score AS STRING))"
        ).alias("segment"),
    )


def rfm_segments_sql(
    src: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 5,
    r_bucket_s: int = 3600,
    m_unit: int = 100,
    cents: int = 100,
) -> str:
    """DuckDB twin of :func:`rfm_segments` — identical bucketing,
    distinct-bucket cumulative bin map, reversed R.  Standalone."""
    nb = int(n_bins)
    ru = int(r_bucket_s) * 1_000_000
    return f"""
        WITH rfm_u AS MATERIALIZED (
            SELECT {user_col} AS _u,
                   MAX(epoch_us(CAST({ts_col} AS TIMESTAMP)))
                       AS _last,
                   CAST(COUNT(*) AS BIGINT) AS _f,
                   CAST(COALESCE(SUM(CAST(ROUND({value_col}
                        * {int(cents)}) AS BIGINT)), 0) AS BIGINT)
                       AS _m
            FROM {src} GROUP BY 1
        ),
        rfm_met AS MATERIALIZED (
            SELECT _u,
                   CAST(((SELECT MAX(_last) FROM rfm_u) - _last)
                        // {ru} AS BIGINT) AS r,
                   _f AS f,
                   CAST(CASE WHEN _m >= 0 THEN _m // {int(m_unit)}
                        ELSE -((-_m) // {int(m_unit)}) END
                        AS BIGINT) AS m
            FROM rfm_u
        ),
        rfm_melt AS MATERIALIZED (
            SELECT _u, 'r' AS dim, r AS v FROM rfm_met
            UNION ALL
            SELECT _u, 'f', f FROM rfm_met
            UNION ALL
            SELECT _u, 'm', m FROM rfm_met
        ),
        rfm_freq AS (
            SELECT dim, v, CAST(COUNT(*) AS BIGINT) AS _nat
            FROM rfm_melt GROUP BY 1, 2
        ),
        rfm_bin AS MATERIALIZED (
            SELECT dim, v,
                   LEAST({nb}, 1 + CAST(
                       (COALESCE(SUM(_nat) OVER (PARTITION BY dim
                            ORDER BY v ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING), 0) * {nb})
                       // (SUM(_nat) OVER (PARTITION BY dim))
                       AS INT)) AS _bin
            FROM rfm_freq
        ),
        rfm_scored AS (
            SELECT m._u,
                   MAX(CASE WHEN m.dim = 'r' THEN m.v END)
                       AS r_buckets,
                   MAX(CASE WHEN m.dim = 'f' THEN m.v END) AS f_raw,
                   MAX(CASE WHEN m.dim = 'm' THEN m.v END)
                       AS m_units,
                   MAX(CASE WHEN m.dim = 'r' THEN b._bin END)
                       AS _rb,
                   MAX(CASE WHEN m.dim = 'f' THEN b._bin END)
                       AS f_score,
                   MAX(CASE WHEN m.dim = 'm' THEN b._bin END)
                       AS m_score
            FROM rfm_melt m JOIN rfm_bin b USING (dim, v)
            GROUP BY 1
        )
        SELECT _u AS {user_col}, r_buckets, f_raw, m_units,
               CAST({nb + 1} - _rb AS INT) AS r_score,
               CAST(f_score AS INT) AS f_score,
               CAST(m_score AS INT) AS m_score,
               CAST({nb + 1} - _rb AS VARCHAR)
                   || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS segment
        FROM rfm_scored
    """


def seasonal_mase(
    series: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    season: int = 24,
) -> DataFrame:
    """Mean Absolute Scaled Error of the seasonal-naive forecast
    (Hyndman & Koehler 2006) — the scale-free forecast-skill number:
    how much better is "same as one season ago" than "same as one
    step ago"?  MASE < 1 means the seasonal structure is REAL
    (exploitable by any forecaster); ≥ 1 means the series has no
    usable seasonality at that period — the go/no-go audit before
    fitting anything fancier (holt_smoothing / seasonal_decompose
    model the structure; this certifies it exists):

        MASE = mean|x_t − x_{t−m}|  /  mean|x_t − x_{t−1}|
        mase_ppm = Σ|e_m|·n₁·10⁶ DIV (n_m·Σ|e₁|)

    cross-multiplied exactly (integer values, no division until the
    single ppm floor); NULL when the naive denominator is zero (a
    constant series has no scale to measure against).  The series
    must be DENSE per key (the gap_fill/xcorr grid convention —
    missing slots would silently shrink the lags); positions are
    whatever ``t_col`` orders, seasonality ``season`` positions.

    One key shuffle serves both lag windows and the rollup.
    Returns (key, n_season, sum_abs_season, n_naive, sum_abs_naive,
    mase_ppm)."""
    if season < 2:
        raise ValueError(f"season must be >= 2: {season}")
    kw = W.partitionBy("_k").orderBy("_t")
    base = series.select(
        F.col(key_col).alias("_k"),
        F.col(t_col).alias("_t"),
        F.col(value_col).cast("bigint").alias("_x"),
    ).select(
        "_k", "_x",
        F.lag("_x", 1).over(kw).alias("_l1"),
        F.lag("_x", int(season)).over(kw).alias("_lm"),
    )
    agg = base.groupBy("_k").agg(
        F.count(F.when(F.col("_lm").isNotNull(), 1))
        .cast("bigint").alias("n_season"),
        F.coalesce(
            F.sum(F.abs(F.col("_x") - F.col("_lm"))), F.lit(0)
        ).cast("bigint").alias("sum_abs_season"),
        F.count(F.when(F.col("_l1").isNotNull(), 1))
        .cast("bigint").alias("n_naive"),
        F.coalesce(
            F.sum(F.abs(F.col("_x") - F.col("_l1"))), F.lit(0)
        ).cast("bigint").alias("sum_abs_naive"),
    )
    dec = "decimal(38,0)"
    return agg.select(
        F.col("_k").alias(key_col),
        "n_season", "sum_abs_season", "n_naive", "sum_abs_naive",
        F.expr(
            f"CAST(CASE WHEN sum_abs_naive = 0 OR n_season = 0 "
            f"THEN NULL ELSE "
            f"(CAST(sum_abs_season AS {dec}) * n_naive * 1000000) "
            f"DIV (CAST(n_season AS {dec}) * sum_abs_naive) "
            f"END AS BIGINT)"
        ).alias("mase_ppm"),
    )


def seasonal_mase_sql(
    src: str,
    key_col: str,
    t_col: str,
    value_col: str,
    season: int = 24,
) -> str:
    """DuckDB twin of :func:`seasonal_mase` (HUGEINT clearing,
    identical lags).  Standalone."""
    return f"""
        WITH ms_b AS (
            SELECT {key_col} AS _k,
                   CAST({value_col} AS BIGINT) AS _x,
                   LAG(CAST({value_col} AS BIGINT), 1) OVER (
                       PARTITION BY {key_col} ORDER BY {t_col})
                       AS _l1,
                   LAG(CAST({value_col} AS BIGINT), {int(season)})
                       OVER (PARTITION BY {key_col}
                             ORDER BY {t_col}) AS _lm
            FROM {src}
        ),
        ms_a AS (
            SELECT _k,
                   CAST(COUNT(_lm) AS BIGINT) AS n_season,
                   CAST(COALESCE(SUM(ABS(_x - _lm)), 0) AS BIGINT)
                       AS sum_abs_season,
                   CAST(COUNT(_l1) AS BIGINT) AS n_naive,
                   CAST(COALESCE(SUM(ABS(_x - _l1)), 0) AS BIGINT)
                       AS sum_abs_naive
            FROM ms_b GROUP BY 1
        )
        SELECT _k AS {key_col}, n_season, sum_abs_season, n_naive,
               sum_abs_naive,
               CAST(CASE WHEN sum_abs_naive = 0 OR n_season = 0
                    THEN NULL ELSE
                    (CAST(sum_abs_season AS HUGEINT) * n_naive
                     * 1000000)
                    // (CAST(n_season AS HUGEINT) * sum_abs_naive)
                    END AS BIGINT) AS mase_ppm
        FROM ms_a
    """


LN2_PPM = 693_147  # frozen round(ln 2 * 1e6) — the declared-constant
# discipline (the Benford/NDCG table pattern): never call ln() on
# either engine.


def kleinberg_bursts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    s_exp: int = 1,
    switch_ppm: int = 2 * LN2_PPM,
    max_events: int = 128,
) -> DataFrame:
    """Kleinberg burst detection (Kleinberg 2002, the two-state
    automaton) over per-key event streams: label every inter-event
    gap with the Viterbi-optimal state — 0 (base rate) or 1 (burst,
    rate ``s = 2**s_exp`` times base) — the "is this activity spike a
    burst or noise?" question that slot_anomalies answers only
    per-calendar-bucket and event_rate_autocorr only in aggregate.

    Exact-integer cost model (every path cost is an integer, so the
    argmin is engine-portable):  gaps quantize to integer
    milliseconds ``g = (us_next - us) DIV 1000``; with ``m = n - 1``
    gaps spanning ``T = sum(g)`` ms, the exponential-NLL costs are
    multiplied through by ``T * 1e6`` and the per-gap constant
    ``-T*1e6*ln(base_rate)`` (equal on every path) is dropped:

        E0(g) = m * g * 1e6
        E1(g) = s * m * g * 1e6  -  T * s_exp * LN2_PPM
        enter-burst transition (0 -> 1): B = switch_ppm * T

    ``ln s = s_exp * ln 2`` is exact because ``s`` is restricted to
    powers of two, so the only logarithm is the FROZEN ``LN2_PPM``
    constant; ``switch_ppm`` is the declared stand-in for
    Kleinberg's ``gamma * ln n`` (a deterministic parameter instead
    of a data-dependent float log — stated deviation).  Declared tie
    rules make the path unique: the best predecessor per state
    minimizes ``(cost + trans, prev_state)`` and the final state
    minimizes ``(cost, state)``.

    Keys with fewer than 3 events or zero total span are DROPPED
    (stated: one gap cannot burst; a zero span has no rate); a key
    with more than ``max_events`` events fails LOUDLY (pre-segment
    upstream).  Costs accumulate in arbitrary-precision Python ints
    (the twin uses HUGEINT), so no overflow at any gap scale.

    Scale: candidate state space is 2, so the DP is O(n) per key;
    the only shuffle is the per-key groupBy, Arrow-batched per key
    (the track-DP family pattern, spatial.py viterbi_match).  The
    DuckDB twin (:func:`kleinberg_bursts_sql`) unrolls the DP per
    step with MIN(STRUCT) argmins and a carried path string, so
    every state label is hash-verified.

    Returns (key, seq, gap_ms, state) — one row per gap, seq
    1-based in time order."""
    import pandas as _pd

    if not 1 <= int(s_exp) <= 6:
        raise ValueError(f"s_exp in [1, 6]: {s_exp}")
    if int(switch_ppm) < 0:
        raise ValueError(f"switch_ppm must be >= 0: {switch_ppm}")
    if not 3 <= int(max_events) <= 4_096:
        raise ValueError(f"max_events out of range: {max_events}")
    s = 2 ** int(s_exp)
    lns = int(s_exp) * LN2_PPM
    sw = int(switch_ppm)

    per_key = (
        events.select(
            F.col(key_col).alias("_k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        )
        .groupBy("_k")
        .agg(F.sort_array(F.collect_list("_us")).alias("_ts"))
        .where(F.size("_ts") >= 3)
    )
    ok = F.assert_true(
        F.size("_ts") <= F.lit(int(max_events)),
        F.lit(
            f"kleinberg_bursts: a key exceeds max_events={max_events} "
            "events; segment keys first"
        ),
    )
    per_key = per_key.select(
        "_k", F.when(ok.isNull(), F.col("_ts")).alias("_ts")
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for k, ts in zip(pdf["_k"], pdf["_ts"]):
                us = [int(t) for t in ts]
                gaps = [
                    (us[i + 1] - us[i]) // 1000
                    for i in range(len(us) - 1)
                ]
                m = len(gaps)
                tt = sum(gaps)
                if tt == 0:
                    continue

                def e_cost(q, g):
                    if q == 0:
                        return m * g * 1_000_000
                    return s * m * g * 1_000_000 - tt * lns

                b_cost = sw * tt
                # dp[q] = (cost, path list ending in state q)
                dp = {
                    0: (e_cost(0, gaps[0]), [0]),
                    1: (b_cost + e_cost(1, gaps[0]), [1]),
                }
                for i in range(1, m):
                    nxt = {}
                    for q in (0, 1):
                        best = min(
                            (
                                dp[p][0]
                                + (b_cost if p == 0 and q == 1 else 0),
                                p,
                            )
                            for p in (0, 1)
                        )
                        nxt[q] = (
                            best[0] + e_cost(q, gaps[i]),
                            dp[best[1]][1] + [q],
                        )
                    dp = nxt
                _, state = min((dp[q][0], q) for q in (0, 1))
                path = dp[state][1]
                for i in range(m):
                    recs.append((k, i + 1, gaps[i], path[i]))
            yield _pd.DataFrame(
                recs, columns=["_k", "seq", "gap_ms", "state"]
            )

    ktype = dict(per_key.dtypes)["_k"]
    out = per_key.mapInPandas(
        run, schema=f"_k {ktype}, seq int, gap_ms bigint, state int"
    )
    return out.select(
        F.col("_k").alias(key_col), "seq", "gap_ms", "state"
    )


def kleinberg_bursts_sql(
    src: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    s_exp: int = 1,
    switch_ppm: int = 2 * LN2_PPM,
    max_events: int = 128,
) -> str:
    """DuckDB twin of :func:`kleinberg_bursts` — identical gap
    quantization and HUGEINT cost arithmetic, the DP unrolled per
    step (two states per key per step) with MIN(STRUCT_PACK(...))
    argmins reproducing the declared tie rules, the winning path
    carried as a '0'/'1' string the final SELECT re-explodes (the
    viterbi_match twin convention).  Keys longer than ``max_events``
    would silently truncate here — the operator's guard is the loud
    one.  Standalone statement."""
    s = 2 ** int(s_exp)
    lns = int(s_exp) * LN2_PPM
    sw = int(switch_ppm)
    max_gaps = int(max_events) - 1
    ctes = [
        f"""kb_us AS (
            SELECT {key_col} AS k,
                   epoch_us(CAST({ts_col} AS TIMESTAMP)) AS us
            FROM {src}
        )""",
        """kb_seq AS MATERIALIZED (
            SELECT k, us,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY us)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY k) AS n
            FROM kb_us
        )""",
        """kb_gaps AS MATERIALIZED (
            SELECT k, t, g FROM (
                SELECT k, rn AS t,
                       (LEAD(us) OVER (PARTITION BY k ORDER BY rn)
                        - us) // 1000 AS g
                FROM kb_seq WHERE n >= 3
            ) WHERE g IS NOT NULL
        )""",
        f"""kb_keys AS MATERIALIZED (
            SELECT k, CAST(COUNT(*) AS HUGEINT) AS m,
                   CAST(SUM(g) AS HUGEINT) AS tt
            FROM kb_gaps GROUP BY 1
            HAVING SUM(g) > 0
        )""",
        f"""kb_em AS MATERIALIZED (
            SELECT g.k, g.t,
                   y.m * g.g * 1000000 AS e0,
                   {s} * y.m * g.g * 1000000 - y.tt * {lns} AS e1,
                   {sw} * y.tt AS b
            FROM kb_gaps g JOIN kb_keys y ON y.k = g.k
        )""",
        """kb_s1 AS MATERIALIZED (
            SELECT e.k, v.st,
                   CASE WHEN v.st = 0 THEN e.e0
                        ELSE e.b + e.e1 END AS cost,
                   CAST(v.st AS VARCHAR) AS path
            FROM kb_em e CROSS JOIN (VALUES (0), (1)) v(st)
            WHERE e.t = 1
        )""",
    ]
    for t in range(2, max_gaps + 1):
        ctes.append(f"""kb_s{t} AS MATERIALIZED (
            SELECT e.k, v.st,
                   b._b.ct + CASE WHEN v.st = 0 THEN e.e0
                                  ELSE e.e1 END AS cost,
                   b._b.pth || CAST(v.st AS VARCHAR) AS path
            FROM kb_em e
            CROSS JOIN (VALUES (0), (1)) v(st)
            JOIN (
                SELECT p.k, v2.st AS st,
                       MIN(STRUCT_PACK(
                           ct := p.cost
                                 + CASE WHEN p.st = 0 AND v2.st = 1
                                        THEN e2.b
                                        ELSE CAST(0 AS HUGEINT) END,
                           ps := p.st,
                           pth := p.path)) AS _b
                FROM kb_s{t - 1} p
                CROSS JOIN (VALUES (0), (1)) v2(st)
                JOIN (SELECT k, b FROM kb_em WHERE t = {t}) e2
                     ON e2.k = p.k
                GROUP BY 1, 2
            ) b ON b.k = e.k AND b.st = v.st
            WHERE e.t = {t}
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT k, {t} AS t, st, cost, path FROM kb_s{t}"
        for t in range(1, max_gaps + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f""",
        kb_all AS ({union}),
        kb_best AS (
            SELECT a.k,
                   MIN(STRUCT_PACK(c := a.cost, s := a.st,
                                   pth := a.path)) AS _b
            FROM kb_all a
            JOIN kb_keys y ON y.k = a.k AND a.t = CAST(y.m AS BIGINT)
            GROUP BY 1
        )
        SELECT b.k AS {key_col}, CAST(u.i AS INTEGER) AS seq,
               CAST(g.g AS BIGINT) AS gap_ms,
               CAST(substr(b.pth, CAST(u.i AS INTEGER), 1)
                    AS INTEGER) AS state
        FROM (SELECT k, _b.pth AS pth FROM kb_best) b,
             LATERAL (SELECT UNNEST(range(1, length(b.pth) + 1))
                      AS i) u
        JOIN kb_gaps g ON g.k = b.k AND g.t = u.i
    """
    )


def max_subarray(
    series: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    max_points: int = 100_000,
) -> DataFrame:
    """Maximum-sum contiguous run (Kadane 1984) per key — the "best
    streak" question over a signed series (peak demand window,
    longest net-positive momentum, worst drawdown via negation)
    that the window family can't ask without an O(n²) frame scan.

    Declared scan semantics make the answer unique: process points
    in (t) order with the restart-on-nonpositive rule — the running
    sum restarts at x when the carried sum is ≤ 0 (so an exactly-
    zero carry restarts: the base moves to the LATEST prefix
    minimum) — and the reported run is the FIRST one to achieve the
    maximal sum (best updates only on strict improvement).  Exact
    integer sums, so the argmax is engine-portable; every key
    yields exactly one row (a 1-point series reports that point).

    The fold runs as ONE sort_array + aggregate() struct
    accumulator per key (the survival_km mechanism — no Python, no
    window, the sequential part is per-key and corpus-size-
    independent) behind a loud ``max_points`` guard.  The DuckDB
    twin (:func:`max_subarray_sql`) derives the same answer from
    the PREFIX-SUM characterization — cur_i = S_i − min_{j<i} S_j
    with the (S asc, j desc) argmin reproducing the latest-minimum
    base rule — a different mechanism, so the fold's restart/tie
    algebra is what the hash verifies.

    Returns (key, best_sum, t_start, t_end, n_points)."""
    one = (
        series.select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.col(t_col).cast("bigint").alias("_t"),
                F.col(x_col).cast("bigint").alias("_x"),
            ).alias("_p"),
        )
        .groupBy("_k")
        .agg(F.sort_array(F.collect_list("_p")).alias("_s"))
    )
    guarded = one.select(
        "_k",
        F.when(
            F.expr(
                f"assert_true(size(_s) <= {int(max_points)}, "
                f"'max_subarray: a key exceeds max_points="
                f"{int(max_points)}; bucket the series first')"
            ).isNull(),
            F.col("_s"),
        ).alias("_s"),
    )
    cur = (
        "CASE WHEN acc.i = 0 OR acc.cur <= 0 THEN p._x "
        "ELSE acc.cur + p._x END"
    )
    cs = (
        "CASE WHEN acc.i = 0 OR acc.cur <= 0 THEN acc.i + 1 "
        "ELSE acc.cs END"
    )
    better = f"(acc.best IS NULL OR ({cur}) > acc.best)"
    folded = guarded.select(
        "_k",
        F.col("_s").alias("_arr"),
        F.expr(
            "aggregate(_s, "
            "named_struct('i', 0, 'cur', CAST(0 AS BIGINT), "
            "  'cs', 1, 'best', CAST(NULL AS BIGINT), "
            "  'bs', 1, 'be', 1), "
            "(acc, p) -> named_struct("
            f"  'i', acc.i + 1, "
            f"  'cur', {cur}, "
            f"  'cs', {cs}, "
            f"  'best', CASE WHEN {better} THEN ({cur}) "
            "     ELSE acc.best END, "
            f"  'bs', CASE WHEN {better} THEN ({cs}) ELSE acc.bs END, "
            f"  'be', CASE WHEN {better} THEN acc.i + 1 "
            "     ELSE acc.be END), "
            "acc -> acc)"
        ).alias("_f"),
    )
    return folded.where(F.col("_f.i") > 0).select(
        F.col("_k").alias(key_col),
        F.col("_f.best").alias("best_sum"),
        F.expr("_arr[_f.bs - 1]._t").alias("t_start"),
        F.expr("_arr[_f.be - 1]._t").alias("t_end"),
        F.col("_f.i").cast("bigint").alias("n_points"),
    )


def max_subarray_sql(
    src: str,
    key_col: str,
    t_col: str,
    x_col: str,
) -> str:
    """DuckDB twin of :func:`max_subarray` via the prefix-sum
    characterization (see operator docstring): a synthetic S_0 = 0
    row per key, base = argmin (S asc, index desc) over the strict
    prefix, cur = S_i − base, winner = (cur DESC, i ASC) first.
    Standalone statement."""
    return f"""
        WITH msx_s AS MATERIALIZED (
            SELECT {key_col} AS k, CAST({t_col} AS BIGINT) AS t,
                   CAST({x_col} AS BIGINT) AS x,
                   ROW_NUMBER() OVER (PARTITION BY {key_col}
                       ORDER BY {t_col}) AS i
            FROM {src}
        ),
        msx_p AS MATERIALIZED (
            SELECT k, t, i,
                   SUM(x) OVER (PARTITION BY k ORDER BY i) AS s
            FROM msx_s
            UNION ALL
            SELECT DISTINCT k, NULL, 0, 0 FROM msx_s
        ),
        msx_cur AS MATERIALIZED (
            SELECT * FROM (
                SELECT i.k, i.i, i.t,
                       i.s - j.s AS cur, j.i + 1 AS bs,
                       ROW_NUMBER() OVER (PARTITION BY i.k, i.i
                           ORDER BY j.s ASC, j.i DESC) AS _r
                FROM msx_p i
                JOIN msx_p j ON j.k = i.k AND j.i < i.i
                WHERE i.i >= 1
            ) WHERE _r = 1
        ),
        msx_best AS (
            SELECT * FROM (
                SELECT k, cur, bs, i,
                       ROW_NUMBER() OVER (PARTITION BY k
                           ORDER BY cur DESC, i ASC) AS _r
                FROM msx_cur
            ) WHERE _r = 1
        )
        SELECT b.k AS {key_col},
               CAST(b.cur AS BIGINT) AS best_sum,
               ts.t AS t_start, te.t AS t_end,
               (SELECT CAST(MAX(i) AS BIGINT) FROM msx_s m
                WHERE m.k = b.k) AS n_points
        FROM msx_best b
        JOIN msx_s ts ON ts.k = b.k AND ts.i = b.bs
        JOIN msx_s te ON te.k = b.k AND te.i = b.i
    """
