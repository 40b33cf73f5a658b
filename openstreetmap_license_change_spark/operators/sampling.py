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
