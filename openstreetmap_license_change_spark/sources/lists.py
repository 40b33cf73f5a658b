"""List-file ingestion (S6/P7) and the agreed-uid shortcut (S5).

The reference's actual input interface for license agreements is
plain text files of ids, one per line, with ``#`` comment lines
filtered out (check_history.rb:73-75, pg_db.rb:65-77), plus a
user-id floor: accounts created after the license change have
``uid >= limit`` and count as agreed without a list lookup
(check_history.rb:88-97, default limit 286582 at :114).

Spark shape: ``spark.read.text`` scans the list in parallel, the
comment filter is a native predicate, and membership tests join
against the (tiny) id set — callers get a DataFrame they can
broadcast-join (J6) rather than a driver-side Python set, so the
same code path works whether the list has 40 ids or 40 million.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: uid floor above which users are agreed by construction
#: (check_history.rb:114)
DEFAULT_USER_LIMIT = 286582

#: lines that are comments: optional spaces then '#'
#: (check_history.rb:74  /^ *#/)
_COMMENT_RE = r"^ *#"


def load_id_list(spark: SparkSession, path: str) -> DataFrame:
    """Text list → one ``id bigint`` row per non-comment line (P7).

    Mirrors get_url_lines: drop ``/^ *#/`` lines, then Ruby ``to_i``
    each remainder (leading integer prefix, 0 if none).
    """
    return (
        spark.read.text(path)
        .where(~F.col("value").rlike(_COMMENT_RE))
        .select(
            F.coalesce(
                F.regexp_extract(F.trim("value"), r"^(-?\d+)", 1).cast(
                    "bigint"
                ),
                F.lit(0),
            ).alias("id")
        )
        .where(F.col("id").isNotNull())
    )


def load_edit_list(spark: SparkSession, path: str) -> DataFrame:
    """Edit white/blacklists are raw strings, one per line
    (pg_db.rb:74-77) — no comment filter, no to_i."""
    return (
        spark.read.text(path)
        .where(F.length("value") > 0)
        .select(F.col("value").alias("edit_key"))
    )


def membership_flag(
    df: DataFrame,
    ids: DataFrame,
    key_col: str,
    flag_col: str,
    limit: int | None = None,
) -> DataFrame:
    """J6: broadcast membership join — ``flag_col`` true iff
    ``key_col`` is in ``ids`` (or ``>= limit`` when given, the S5
    agreed-uid shortcut).  One broadcast exchange, no shuffle of
    ``df``."""
    hits = F.broadcast(
        ids.select(F.col(ids.columns[0]).alias("__list_id")).distinct()
    )
    joined = df.join(
        hits, df[key_col] == F.col("__list_id"), "left"
    )
    in_list: Column = F.col("__list_id").isNotNull()
    if limit is not None:
        in_list = in_list | (F.col(key_col) >= F.lit(limit))
    return joined.withColumn(flag_col, in_list).drop("__list_id")
