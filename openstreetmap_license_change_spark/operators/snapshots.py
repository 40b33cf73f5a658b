"""Corpus snapshot state + snapshot-to-snapshot diff.

The reference diffs consecutive VERSIONS of one element to build its
edit script (diff.rb, geom.rb:56-92); this module lifts the same
question to corpus granularity: what changed between crawl time A and
crawl time B?  That is the operational query of an incremental crawl
pipeline (recrawl scheduling, delta exports, Iceberg snapshot diffs —
the engine's resume story, SURVEY.md §3) and the corpus analogue of
the reference's `current_*` snapshot tables (extract_loader.rb:320-360):
a snapshot state IS `current_*` as of a timestamp.

Design for 100 TB — the naive plan is two latest-version windows plus
a url full-outer join (three shuffles of the wide table).  Here both
snapshot states come out of ONE aggregation: per url, two conditional
`max(struct(warc_epoch, …))` aggregates (rows after the cutoff enter
as NULL and are skipped by max), partially aggregated map-side, so the
whole diff costs a single shuffle of pre-combined rows and never
joins.  (Struct-typed max buffers aren't hash-aggregable, so Spark
plans partial+final SortAggregate — the map-side combine and the
single exchange, the two things that matter at scale, are retained;
tests pin the shape.)  Struct comparison is lexicographic with
``warc_epoch`` leading in BOTH engines, and warc_epoch is strictly
increasing per url, so the argmax is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_STATE_FIELDS = ("warc_epoch", "version", "lon", "lat", "visible")


def _state(cond) -> F.Column:
    return F.max(F.when(cond, F.struct(*_STATE_FIELDS)))


def snapshot_diff(
    pages: DataFrame, epoch_a: int, epoch_b: int
) -> DataFrame:
    """Diff the corpus state at ``epoch_a`` vs ``epoch_b`` (unix
    seconds, inclusive cutoffs on ``warc_epoch``).

    A url is PRESENT at a cutoff iff it has a capture at or before the
    cutoff and the latest such capture is visible (an invisible latest
    is the reference's deleted element, osm.rb `visible` semantics).
    Statuses over (present_a, present_b):
        added      absent → present   (includes re-added after delete)
        removed    present → absent
        changed    present both, geocode position moved
        unchanged  present both, position identical
    urls absent at BOTH cutoffs (never captured, or deleted on both
    sides) are dropped — they are not part of either snapshot.

    Output: url, status, old_version, new_version, old_lon, old_lat,
    new_lon, new_lat (old_*/new_* NULL where absent)."""
    if epoch_a > epoch_b:
        raise ValueError(f"epoch_a {epoch_a} > epoch_b {epoch_b}")
    agg = pages.groupBy("url").agg(
        _state(F.col("warc_epoch") <= F.lit(int(epoch_a))).alias("a"),
        _state(F.col("warc_epoch") <= F.lit(int(epoch_b))).alias("b"),
    )
    pa = F.col("a").isNotNull() & F.col("a.visible")
    pb = F.col("b").isNotNull() & F.col("b.visible")
    moved = (F.col("a.lon") != F.col("b.lon")) | (
        F.col("a.lat") != F.col("b.lat")
    )
    return (
        agg.withColumn(
            "status",
            F.when(~pa & pb, F.lit("added"))
            .when(pa & ~pb, F.lit("removed"))
            .when(pa & pb & moved, F.lit("changed"))
            .when(pa & pb, F.lit("unchanged")),
        )
        .where(F.col("status").isNotNull())
        .select(
            "url",
            "status",
            F.when(pa, F.col("a.version")).alias("old_version"),
            F.when(pb, F.col("b.version")).alias("new_version"),
            F.when(pa, F.col("a.lon")).alias("old_lon"),
            F.when(pa, F.col("a.lat")).alias("old_lat"),
            F.when(pb, F.col("b.lon")).alias("new_lon"),
            F.when(pb, F.col("b.lat")).alias("new_lat"),
        )
    )


def snapshot_diff_sql(src: str, epoch_a: int, epoch_b: int) -> str:
    """DuckDB twin of :func:`snapshot_diff` as a standalone statement."""
    return "WITH " + snapshot_diff_ctes(src, epoch_a, epoch_b)


def snapshot_diff_ctes(src: str, epoch_a: int, epoch_b: int) -> str:
    """The twin's CTE chain + final SELECT WITHOUT the leading WITH,
    so callers can append it to an existing WITH list (the oracle
    prelude).  Same conditional max(struct) aggregation (DuckDB
    structs also compare lexicographically, field order preserved),
    CASE statuses, and absent-both filter.  ``src`` must expose url,
    warc_epoch, version, lon, lat, visible."""
    st = "{'warc_epoch': warc_epoch, 'version': version, " \
         "'lon': lon, 'lat': lat, 'visible': visible}"
    return f"""
        agg AS (
            SELECT url,
                   MAX(CASE WHEN warc_epoch <= {int(epoch_a)}
                            THEN {st} END) AS a,
                   MAX(CASE WHEN warc_epoch <= {int(epoch_b)}
                            THEN {st} END) AS b
            FROM {src} GROUP BY url
        ), flagged AS (
            SELECT url, a, b,
                   (a IS NOT NULL AND a.visible) AS pa,
                   (b IS NOT NULL AND b.visible) AS pb
            FROM agg
        )
        SELECT url,
               CASE WHEN NOT pa AND pb THEN 'added'
                    WHEN pa AND NOT pb THEN 'removed'
                    WHEN pa AND pb AND (a.lon <> b.lon OR a.lat <> b.lat)
                         THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN pa THEN a.version END AS old_version,
               CASE WHEN pb THEN b.version END AS new_version,
               CASE WHEN pa THEN a.lon END AS old_lon,
               CASE WHEN pa THEN a.lat END AS old_lat,
               CASE WHEN pb THEN b.lon END AS new_lon,
               CASE WHEN pb THEN b.lat END AS new_lat
        FROM flagged WHERE pa OR pb
    """


def diff_states(state_a: DataFrame, state_b: DataFrame) -> DataFrame:
    """Diff two MATERIALIZED current-state tables — the streaming side
    of :func:`snapshot_diff`: where the batch operator derives both
    as-of states from the raw capture log in one aggregation, this
    takes two already-maintained states (the output of
    ``streaming.incremental.foreach_batch_latest_state`` at two cut
    points, or two Iceberg snapshot reads of a ``current_*`` table)
    and emits the identical statuses.

    Shape argument: a full-outer url join is exactly right HERE —
    state tables are 1-row-per-url aggregates (|urls|, not |captures|),
    so the join is over pre-aggregated rows; the batch operator's
    join-free design matters when the input is the 100-TB capture log,
    not its distilled state.  Both inputs must expose url, warc_epoch,
    version, lon, lat, visible (visible=False rows are tombstones:
    present-at-cut means latest capture visible, same as batch).

    Equivalence with the batch operator is pinned by
    ``tests/test_streaming.py`` — streaming-maintained states at two
    cuts, diffed here, must equal ``snapshot_diff`` on the unioned
    capture log row-for-row."""
    a = state_a.select(
        "url", F.struct(*_STATE_FIELDS).alias("a")
    )
    b = state_b.select(
        "url", F.struct(*_STATE_FIELDS).alias("b")
    )
    j = a.join(b, "url", "full_outer")
    pa = F.col("a").isNotNull() & F.col("a.visible")
    pb = F.col("b").isNotNull() & F.col("b.visible")
    moved = (F.col("a.lon") != F.col("b.lon")) | (
        F.col("a.lat") != F.col("b.lat")
    )
    return (
        j.withColumn(
            "status",
            F.when(~pa & pb, F.lit("added"))
            .when(pa & ~pb, F.lit("removed"))
            .when(pa & pb & moved, F.lit("changed"))
            .when(pa & pb, F.lit("unchanged")),
        )
        .where(F.col("status").isNotNull())
        .select(
            "url",
            "status",
            F.when(pa, F.col("a.version")).alias("old_version"),
            F.when(pb, F.col("b.version")).alias("new_version"),
            F.when(pa, F.col("a.lon")).alias("old_lon"),
            F.when(pa, F.col("a.lat")).alias("old_lat"),
            F.when(pb, F.col("b.lon")).alias("new_lon"),
            F.when(pb, F.col("b.lat")).alias("new_lat"),
        )
    )


def scd2_history(
    versions: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_epoch",
    attr_cols: "tuple[str, ...]" = ("lon", "lat", "visible"),
) -> DataFrame:
    """Slowly-Changing-Dimension type-2 history table: per key, one
    VALIDITY INTERVAL per distinct consecutive attribute state —
    (key, attrs, valid_from, valid_to, is_current).  The warehouse
    materialization every as-of query reads (snapshot_diff answers
    ONE A→B question; the SCD2 table answers all of them with a
    BETWEEN predicate — the classic space/latency trade).

    Consecutive versions with IDENTICAL attributes COLLAPSE into one
    interval (the SCD2 contract: a recrawl that changed nothing is
    not a new dimension row); change detection is null-safe
    struct equality (<=> — NULL attrs compare equal to NULL, not
    unknown).  valid_to is the NEXT change's timestamp (half-open
    [from, to)), NULL on the current row.  ``ts_col`` must be
    strictly increasing per key (the pages contract); duplicate
    timestamps would make "previous state" undefined — the window
    order stays total because equal-(key, ts) rows don't occur.

    Plan: one keyed window sort shared by the LAG change flag, the
    running interval counter, and (after the interval groupBy) the
    LEAD valid_to — a single hash shuffle on the key, no self-joins.

    Output: (key, *attrs of the interval's state, valid_from,
    valid_to, n_versions, is_current)."""
    attrs = list(attr_cols)
    w = W.partitionBy(key_col).orderBy(ts_col)
    state = F.struct(*[F.col(c) for c in attrs])
    flagged = versions.select(key_col, ts_col, *attrs).withColumn(
        "_chg",
        F.when(
            F.lag(state).over(w).isNull()
            | ~F.lag(state).over(w).eqNullSafe(state),
            1,
        ).otherwise(0),
    ).withColumn(
        "_iv",
        F.sum("_chg").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    intervals = flagged.groupBy(key_col, "_iv").agg(
        *[F.first(c).alias(c) for c in attrs],
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    w2 = W.partitionBy(key_col).orderBy("valid_from")
    return intervals.select(
        key_col,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_versions",
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def scd2_history_sql(
    src: str,
    key_col: str = "url",
    ts_col: str = "warc_epoch",
    attr_cols: "tuple[str, ...]" = ("lon", "lat", "visible"),
) -> str:
    """DuckDB twin of :func:`scd2_history` (standalone)."""
    attrs = list(attr_cols)
    a_list = ", ".join(attrs)
    eq = " AND ".join(
        f"LAG({c}) OVER w IS NOT DISTINCT FROM {c}" for c in attrs
    )
    firsts = ", ".join(
        f"MIN({c}) AS {c}" for c in attrs
    )
    return f"""
        WITH s2_flag AS (
            SELECT {key_col}, {ts_col}, {a_list},
                   CASE WHEN LAG({ts_col}) OVER w IS NULL
                             OR NOT ({eq})
                        THEN 1 ELSE 0 END AS chg
            FROM {src}
            WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col})
        ),
        s2_iv AS (
            SELECT *, SUM(chg) OVER (PARTITION BY {key_col}
                       ORDER BY {ts_col} ROWS UNBOUNDED PRECEDING)
                       AS iv
            FROM s2_flag
        ),
        s2_agg AS (
            SELECT {key_col}, iv, {firsts},
                   MIN({ts_col}) AS valid_from,
                   CAST(COUNT(*) AS BIGINT) AS n_versions
            FROM s2_iv GROUP BY 1, 2
        )
        SELECT {key_col}, {a_list}, valid_from,
               LEAD(valid_from) OVER w2 AS valid_to,
               n_versions,
               (LEAD(valid_from) OVER w2 IS NULL) AS is_current
        FROM s2_agg
        WINDOW w2 AS (PARTITION BY {key_col} ORDER BY valid_from)
    """


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "url",
    seq_col: str = "seq",
    op_col: str = "op",
    attr_cols: "tuple[str, ...]" = ("lon", "lat", "visible"),
) -> DataFrame:
    """Change-data-capture compaction: apply an upsert/delete stream
    to a base snapshot and emit the resulting state — the MERGE INTO
    primitive of the incremental-pipeline story (StageRunner commits
    stage outputs; cdc_apply is how the NEXT run folds a delta onto
    them without rewriting the base).

    Semantics: per key, the highest-``seq_col`` record wins (the base
    enters the race at seq = 0, so any change beats it); a winning
    'delete' removes the key, a winning 'upsert' sets the attrs.
    Keys only in the base pass through; keys only in the stream
    insert.  ``seq_col`` must be > 0 and unique per key within the
    stream (CDC log position) — duplicate seqs would make the winner
    undefined, so the argmax struct carries the op and attrs BEHIND
    the seq and equal seqs fail loud via assert_true riding the
    output state.

    Plan: ONE union + one max_by aggregation (map-side combined) —
    never a join, the snapshot_diff discipline.  Output:
    (key, *attrs) of the surviving state."""
    attrs = list(attr_cols)
    b = base.select(
        key_col,
        F.lit(0).cast("bigint").alias("_seq"),
        F.lit("upsert").alias("_op"),
        *[F.col(c) for c in attrs],
    )
    c = changes.select(
        key_col,
        F.col(seq_col).cast("bigint").alias("_seq"),
        F.col(op_col).alias("_op"),
        *[F.col(a) for a in attrs],
    )
    unioned = b.unionByName(c)
    state = F.struct(
        F.col("_seq"), F.col("_op"), *[F.col(a) for a in attrs]
    )
    agg = unioned.groupBy(key_col).agg(
        F.max(state).alias("_win"),
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct("_seq").alias("_nseq"),
    )
    dup_guard = F.assert_true(
        F.col("_n") == F.col("_nseq"),
        F.lit(
            "cdc_apply: duplicate seq for a key — CDC log positions "
            "must be unique per key; the winner would be undefined"
        ),
    )
    # the guard rides every emitted attr (all are plan-used outputs),
    # so no projection prunes it away
    return (
        agg.where(F.col("_win._op") != F.lit("delete"))
        .select(
            key_col,
            *[
                F.when(dup_guard.isNull(), F.col(f"_win.{a}")).alias(a)
                for a in attrs
            ],
        )
    )


def cdc_apply_sql(
    base_src: str,
    changes_src: str,
    key_col: str = "url",
    seq_col: str = "seq",
    op_col: str = "op",
    attr_cols: "tuple[str, ...]" = ("lon", "lat", "visible"),
) -> str:
    """DuckDB twin of :func:`cdc_apply` (standalone; no dup guard —
    the operator owns the loud failure)."""
    attrs = list(attr_cols)
    a_list = ", ".join(attrs)
    win = ", ".join(
        f"arg_max({a}, s) AS {a}" for a in attrs
    )
    return f"""
        WITH cdc_u AS (
            SELECT {key_col}, CAST(0 AS BIGINT) AS s,
                   'upsert' AS o, {a_list}
            FROM {base_src}
            UNION ALL
            SELECT {key_col}, CAST({seq_col} AS BIGINT) AS s,
                   {op_col} AS o, {a_list}
            FROM {changes_src}
        ),
        cdc_w AS (
            SELECT {key_col}, arg_max(o, s) AS op, {win}
            FROM cdc_u GROUP BY 1
        )
        SELECT {key_col}, {a_list}
        FROM cdc_w WHERE op <> 'delete'
    """
