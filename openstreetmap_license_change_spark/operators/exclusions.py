"""Spark-side exclusion path (P3).

The reference short-circuits excluded elements before the normal fold:
``db.exclude?(klass, id)`` membership (db.rb:38-48) routes the whole
history to "delete it and redact every version as hidden"
(change_bot.rb:213-218) without running the per-version lattice.

Spark shape: the exclusion list is a broadcast semi/anti join key set
— tiny next to the history table — so the split costs no extra
shuffle; the redact fan-out needs no ``explode`` because the history
input is already one row per version.  Excluded action rows carry the
same schema as the fold's output (fold.ACTION_SCHEMA), so the union
composes with ``classify_histories`` downstream untouched.

At 100 TB: exclusion lists are human-curated (thousands of ids), far
below any broadcast threshold; the semi/anti pair reuses one
broadcast exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import fold as fold_ops

#: key columns identifying an element across both inputs
KEY_COLS = ("element_type", "url")


def _key(exclusions: DataFrame) -> DataFrame:
    return F.broadcast(exclusions.select(*KEY_COLS).distinct())


def split_exclusions(
    histories: DataFrame, exclusions: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(excluded action rows, remainder histories).

    Excluded elements yield one delete row plus one hidden-redact row
    per version (change_bot.rb:214-218); the remainder passes through
    for normal classification.
    """
    exc = _key(exclusions)
    excluded = histories.join(exc, list(KEY_COLS), "left_semi")
    remainder = histories.join(exc, list(KEY_COLS), "left_anti")

    nulls = [
        F.lit(None).cast(t).alias(c)
        for c, t in (
            ("new_tags_json", "string"),
            ("new_lon", "double"),
            ("new_lat", "double"),
            ("new_nodes", "array<bigint>"),
            ("new_members_json", "string"),
        )
    ]
    deletes = excluded.select(*KEY_COLS).distinct().select(
        "url",
        "element_type",
        F.lit("delete").alias("action"),
        F.lit(None).cast("int").alias("version"),
        F.lit(None).cast("string").alias("mode"),
        *nulls,
    )
    redactions = excluded.select(
        "url",
        "element_type",
        F.lit("redact").alias("action"),
        F.col("version").cast("int").alias("version"),
        F.lit("hidden").alias("mode"),
        *nulls,
    )
    return deletes.unionByName(redactions), remainder


def classify_with_exclusions(
    histories: DataFrame,
    exclusions: DataFrame,
    assume_partitioned: bool = False,
) -> DataFrame:
    """The fold with the exclusion fast path in front: excluded
    elements never reach Python — their delete+redact rows are pure
    column expressions — and the fold runs only on the remainder.
    The exclusion split is a broadcast (anti-)join, so
    ``assume_partitioned`` co-location survives it and passes through
    to the fold."""
    excluded_actions, remainder = split_exclusions(histories, exclusions)
    return fold_ops.classify_histories(
        remainder, assume_partitioned=assume_partitioned
    ).unionByName(excluded_actions)
