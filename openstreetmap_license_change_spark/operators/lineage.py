"""Version-lineage operators over the pages table.

Native-Catalyst re-expressions of the reference's history machinery:

* latest_version   — A3 `DISTINCT ON (id) ... ORDER BY version DESC`
                     (extract_loader.rb:320-360, pg_db.rb:38-43)
* reverse_cumulative_flag — A8 odbl-clean backward propagation
                     (change_bot.rb:17-28) as a window-frame min, no UDF
* with_accept_flags — J2 per-version changeset-acceptance lookup
                     (change_bot.rb:193-199) via broadcast join
* candidate_filter — P1 decliner-touched pre-filter
                     (run_candidates.rb:73-80) as a semi-join
* version_ordered  — W1/W2 prev-version access via lag

All are single-shuffle (by url) or shuffle-free (broadcast); the window
operators share the same (url, version) sort so Catalyst reuses one
exchange across them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def latest_version(
    pages: DataFrame, key: str = "url", cols: list[str] | None = None
) -> DataFrame:
    """Latest state per element — the `current_*` tables.

    Expressed as ``max_by(struct(*), version)`` rather than a
    row_number window: the aggregate gets a map-side partial combine
    (each input partition reduces to its local winners before the
    shuffle) and skips the per-group sort — at 10^12 rows that is the
    difference between shuffling every version and shuffling ~one row
    per element per input partition.

    ``cols`` limits the struct to the named columns (plus ``version``,
    which max_by always needs): the winner struct rides the shuffle,
    so a caller that only wants (version, lat, lon) should not pay to
    shuffle ``text``/``html`` inside it.  Projection happens INSIDE
    the operator rather than relying on caller discipline — Catalyst
    cannot prune struct fields out of an aggregate buffer on its own.
    Default None keeps every column (the full current_* snapshot)."""
    if cols is None:
        others = [c for c in pages.columns if c != key]
    else:
        others = [c for c in cols if c != key]
        if "version" not in others:
            others = ["version", *others]
        pages = pages.select(key, *others)
    agg = pages.groupBy(key).agg(
        F.max_by(F.struct(*others), F.col("version")).alias("_s")
    )
    return agg.select(key, *[F.col(f"_s.{c}").alias(c) for c in others])


def latest_version_window(pages: DataFrame, key: str = "url") -> DataFrame:
    """Window-based variant (A3 literal form) — kept for A/B tests."""
    w = W.partitionBy(key).orderBy(F.desc("version"))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def reverse_cumulative_flag(
    pages: DataFrame, flag_col: str, out_col: str, key: str = "url"
) -> DataFrame:
    """flag holds only from the last version backwards:
    out[i] = AND(flag[i..n]) — a reverse-cumulative AND expressed as a
    window-frame min over the int-cast flag (change_bot.rb:17-28)."""
    w = (
        W.partitionBy(key)
        .orderBy("version")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return pages.withColumn(
        out_col, F.min(F.col(flag_col).cast("int")).over(w) == 1
    )


def with_accept_flags(pages: DataFrame, cs_status: DataFrame) -> DataFrame:
    """J2: per-version accepted flag via broadcast join on changeset_id."""
    return pages.join(F.broadcast(cs_status), "changeset_id", "left").withColumn(
        "accepted", F.coalesce(F.col("accepted"), F.lit(False))
    )


def candidate_filter(pages_flagged: DataFrame, key: str = "url") -> DataFrame:
    """P1: keep only elements touched by at least one non-accepted
    version — the cheap pre-filter that shrinks the heavy per-history
    work ("only an optimisation, not a decision-making step",
    run_candidates.rb:8-12)."""
    dirty = (
        pages_flagged.where(~F.col("accepted")).select(key).distinct()
    )
    return pages_flagged.join(dirty, key, "left_semi")


def version_ordered(pages: DataFrame, key: str = "url") -> DataFrame:
    """W1/W2: versions in order with prev-text access for diffing."""
    w = W.partitionBy(key).orderBy("version")
    return pages.withColumn("prev_text", F.lag("text").over(w))
