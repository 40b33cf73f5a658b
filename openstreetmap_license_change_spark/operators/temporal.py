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
