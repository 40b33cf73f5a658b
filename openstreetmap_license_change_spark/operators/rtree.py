"""STR (Sort-Tile-Recursive) R-tree bulk packing.

Reference analogue: the regions sink's 1° grid (S8) assigns geometry
to FIXED cells; an R-tree leaf layout instead adapts leaf extents to
the data, and STR is the classic one-pass bulk loader for it
(Leutenegger et al.): sort by center-x, cut √P vertical slices, sort
each slice by center-y, cut runs of B — every leaf holds ≤ B rects
and leaves tile the data with near-minimal MBR perimeter.  The output
(rect → leaf) is exactly the manifest a spatial file layout needs:
write each leaf's rects together and footer min-max pruning discards
non-intersecting files wholesale (the adaptive sibling of
cluster_by_hilbert's fixed-curve layout).

Scale design — exact global ranks WITHOUT a global window (the
single-partition trap bench.py treats as FAIL):

1. one bounded driver agg reads (N, min, max) of the center keys;
2. a fixed-width histogram over ``n_buckets`` value buckets (bucket
   id is monotone in the key, so bucket-major order IS global order);
3. the ≤ n_buckets-row histogram takes its prefix sums in a window
   over CONSTANT-bounded input and broadcasts back;
4. global rank = bucket prefix + row_number within the bucket — every
   window partition is one value bucket, never the whole table.
   A bucket holding more than ``max_bucket_rows`` rows fails LOUDLY
   (extreme key skew needs a wider histogram, not a silent hot task).

The y-stage repeats the same two-level rank PER SLICE (slice-local
histograms; window partitions are (slice, bucket)).

The DuckDB twin is the DEFINITION: plain global ROW_NUMBERs — so the
oracle verifies that the two-level decomposition reproduces textbook
STR bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _two_level_rank(
    df: DataFrame,
    part_cols: "list[str]",
    key_col: str,
    id_col: str,
    lo: int,
    hi: int,
    n_buckets: int,
    max_bucket_rows: int,
    out: str,
) -> DataFrame:
    """Exact rank of ``key_col`` (ties broken by ``id_col``) within
    each ``part_cols`` group, via value-bucket histogram + prefix +
    bucket-local row_number.  ``lo``/``hi`` bound the key globally."""
    span = max(hi - lo + 1, 1)
    df = df.withColumn("_rb", F.expr(
        f"(({key_col} - {lo}) * {n_buckets}) DIV {span}"
    ))
    hist = df.groupBy(*part_cols, "_rb").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    # the skew guard rides the prefix arithmetic (adds 0 or raises) so
    # column pruning can never drop it
    guard0 = F.when(
        F.col("_bn") > max_bucket_rows,
        F.raise_error(
            F.concat(
                F.lit("str_pack: value bucket holds "),
                F.col("_bn").cast("string"),
                F.lit(f" rows > max_bucket_rows={max_bucket_rows}; "
                      "raise n_buckets (key skew)"),
            )
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    # prefix sums over the ≤ n_buckets-row histogram via the tiny
    # triangular self-join (the skyline suffix-max pattern) — never an
    # unpartitioned window, even over bounded input
    earlier = hist.select(
        *[F.col(c).alias(f"_p{c}") for c in part_cols],
        F.col("_rb").alias("_prb"),
        F.col("_bn").alias("_pbn"),
    )
    cond = F.col("_prb") < F.col("_rb")
    for c in part_cols:
        cond = cond & (F.col(f"_p{c}") == F.col(c))
    prefix = (
        hist.join(F.broadcast(earlier), cond, "left")
        .groupBy(*part_cols, "_rb")
        .agg(
            (
                F.coalesce(F.sum("_pbn"), F.lit(0)) + F.max(guard0)
            ).alias("_off")
        )
    )
    wr = W.partitionBy(*(part_cols + ["_rb"])).orderBy(key_col, id_col)
    return (
        df.join(F.broadcast(prefix), part_cols + ["_rb"])
        .withColumn(out, F.col("_off") + F.row_number().over(wr))
        .drop("_rb", "_off")
    )


def str_pack(
    rects: DataFrame,
    leaf_size: int = 256,
    n_buckets: int = 1024,
    max_bucket_rows: int = 50_000_000,
    id_col: str = "rect_id",
) -> DataFrame:
    """STR-pack integer rectangles (``id_col``, minx, miny, maxx,
    maxy — e.g. microdegrees) into R-tree leaves of ≤ ``leaf_size``:

        P = ⌈N/B⌉ leaves,  S = ⌈√P⌉ slices
        slice  = (xrank − 1) DIV (S·B)     xrank by center-x (2·cx =
                                           minx+maxx, exact integer)
        leaf   = slice·S + (yrank − 1) DIV B    yrank slice-local by
                                                center-y

    Ranks are exact two-level (histogram-prefix + bucket window, see
    module docstring) — no global window at any stage; the one
    driver-side agg reads 5 bounded values.  Ties (identical centers)
    break by ``id_col``: the packing is a deterministic function of
    the rect set at any parallelism.

    Returns input columns + (slice, leaf_id)."""
    if leaf_size < 1:
        raise ValueError(f"leaf_size must be ≥ 1, got {leaf_size}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be ≥ 2, got {n_buckets}")
    pts = rects.withColumn(
        "_cx2", F.col("minx") + F.col("maxx")
    ).withColumn("_cy2", F.col("miny") + F.col("maxy"))
    n, xlo, xhi, ylo, yhi = pts.agg(
        F.count(F.lit(1)),
        F.min("_cx2"), F.max("_cx2"),
        F.min("_cy2"), F.max("_cy2"),
    ).collect()[0]
    if n == 0:
        return pts.withColumn("slice", F.lit(0).cast("bigint")) \
            .withColumn("leaf_id", F.lit(0).cast("bigint")) \
            .drop("_cx2", "_cy2").where(F.lit(False))
    p = -(-n // leaf_size)
    s = math.isqrt(p)
    if s * s < p:
        s += 1
    xr = _two_level_rank(
        pts, [], "_cx2", id_col, xlo, xhi,
        n_buckets, max_bucket_rows, "_xrank",
    ).withColumn(
        "slice", F.expr(f"(_xrank - 1) DIV {s * leaf_size}")
    ).drop("_xrank")
    yr = _two_level_rank(
        xr, ["slice"], "_cy2", id_col, ylo, yhi,
        n_buckets, max_bucket_rows, "_yrank",
    )
    return yr.withColumn(
        "leaf_id",
        F.col("slice") * F.lit(s)
        + F.expr(f"(_yrank - 1) DIV {leaf_size}"),
    ).drop("_yrank", "_cx2", "_cy2")


def str_leaf_stats(packed: DataFrame) -> DataFrame:
    """Per-leaf manifest rollup of a :func:`str_pack` result: row
    count, the leaf MBR, and its semi-perimeter (the R-tree quality
    measure STR minimizes — the pruning power of the layout is
    1 − overlap, and overlap scales with perimeter).  Output:
    (leaf_id, n_rects, minx, miny, maxx, maxy, semi_perimeter)."""
    return packed.groupBy("leaf_id").agg(
        F.count(F.lit(1)).alias("n_rects"),
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"),
        F.max("maxy").alias("maxy"),
    ).select(
        "leaf_id", "n_rects", "minx", "miny", "maxx", "maxy",
        (
            (F.col("maxx") - F.col("minx"))
            + (F.col("maxy") - F.col("miny"))
        ).alias("semi_perimeter"),
    )


def str_pack_sql(
    rects_src: str,
    leaf_size: int = 256,
    id_col: str = "rect_id",
) -> str:
    """DuckDB twin of :func:`str_pack` ∘ :func:`str_leaf_stats` — the
    textbook definition with plain global ROW_NUMBERs (the oracle's
    job; the engine's two-level rank must reproduce it exactly).
    S is computed in SQL from COUNT(*); CEIL/SQRT are exact for any
    realistic N (< 2⁵²).  Emits the leaf manifest."""
    b = int(leaf_size)
    return f"""
        WITH str_in AS (
            SELECT *, minx + maxx AS cx2, miny + maxy AS cy2
            FROM ({rects_src})
        ),
        str_s AS (
            SELECT CAST(CEIL(SQRT(CEIL(CAST(COUNT(*) AS DOUBLE) / {b})))
                        AS BIGINT) AS s
            FROM str_in
        ),
        str_x AS (
            SELECT i.*, s.s,
                   (ROW_NUMBER() OVER (ORDER BY cx2, {id_col}) - 1)
                       // (s.s * {b}) AS slice
            FROM str_in i CROSS JOIN str_s s
        ),
        str_y AS (
            SELECT *,
                   slice * s
                   + (ROW_NUMBER() OVER (PARTITION BY slice
                                         ORDER BY cy2, {id_col}) - 1)
                       // {b} AS leaf_id
            FROM str_x
        )
        SELECT leaf_id,
               CAST(COUNT(*) AS BIGINT) AS n_rects,
               MIN(minx) AS minx, MIN(miny) AS miny,
               MAX(maxx) AS maxx, MAX(maxy) AS maxy,
               (MAX(maxx) - MIN(minx)) + (MAX(maxy) - MIN(miny))
                   AS semi_perimeter
        FROM str_y GROUP BY leaf_id
    """
