"""Per-group convex hulls: exact minimal hulls (Arrow-batched
monotone chain) and the native directional-extremes sketch.

Two operators, one contract:

- :func:`convex_hull` — the EXACT minimal hull vertex set per group,
  Andrew's monotone chain over integer-snapped coordinates (×10⁴, the
  house scaled-int convention) so every orientation test is an exact
  int64 cross product — no float ε anywhere.  Python (applyInPandas)
  because the chain is inherently sequential per group; groups are
  independent, so the stage is embarrassingly parallel after one hash
  shuffle on the group key.  The DuckDB oracle twin is the O(n³)
  witness-edge characterization (p is a minimal-hull vertex iff some
  edge p→q has every other point strictly left OR collinear-between),
  so the driver hash-verifies the hull SET exactly.

- :func:`directional_extremes` — the scale path: the argmax point per
  group along k fixed integer direction vectors.  Pure DataFrame ops
  (explode k directions → one window rank), exact integer scores, and
  every emitted point is a true hull vertex (generic position); k=8
  gives the standard bounding-octagon sketch used for broadcast-side
  geometry pruning.  At 10¹² points the exact hull's per-group sort
  still scales (hulls are computed per group, never globally), but
  the k-direction sketch is ONE aggregate pass with no per-group
  sort at all.

Reference analogue: the region bbox/geometry handling of
run_candidates.rb (bounding shapes for eligibility), generalized to
proper convex geometry.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# k=8 integer direction lattice: E, NE, N, NW, W, SW, S, SE
DIRECTIONS_8 = [
    (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1),
]


def _snap(col: Column) -> Column:
    return F.round(col * 10_000).cast("bigint")


def convex_hull(
    points: DataFrame,
    id_col: str,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Exact minimal convex hull vertices per group (unordered set
    semantics; the driver compare is order-insensitive).  Coordinates
    snap once to 10⁻⁴-degree integers; duplicates dedup before the
    chain; collinear boundary midpoints are NOT vertices (strict
    turns only); a single-point group is its own hull, two points are
    both vertices.

    Output: id, ulon, ulat (bigint 10⁻⁴-degree units) — one row per
    hull vertex."""
    snapped = points.select(
        F.col(id_col).alias("gid"),
        _snap(F.col(lon)).alias("ulon"),
        _snap(F.col(lat)).alias("ulat"),
    ).distinct()

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf["gid"].iloc[0]
        pts = sorted(set(zip(pdf["ulon"], pdf["ulat"])))
        if len(pts) <= 2:
            hull = pts
        else:
            def cross(o, a, b):
                return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (
                    b[0] - o[0]
                )

            lower: list = []
            for p in pts:
                while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                    lower.pop()
                lower.append(p)
            upper: list = []
            for p in reversed(pts):
                while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                    upper.pop()
                upper.append(p)
            hull = lower[:-1] + upper[:-1]
        return pd.DataFrame(
            {
                "gid": [gid] * len(hull),
                "ulon": [p[0] for p in hull],
                "ulat": [p[1] for p in hull],
            }
        )

    out = snapped.groupBy("gid").applyInPandas(
        chain, "gid bigint, ulon bigint, ulat bigint"
    )
    return out.select(F.col("gid").alias(id_col), "ulon", "ulat")


def convex_hull_sql(
    points_cte: str, id_expr: str = "gid", ulon: str = "ulon",
    ulat: str = "ulat",
) -> str:
    """DuckDB witness-edge twin of :func:`convex_hull`: p is a
    minimal-hull vertex iff ∃ q ≠ p with every other point r strictly
    left of p→q (cross > 0) or collinear AND strictly between
    (cross = 0 ∧ 0 < dot < |q−p|²).  O(n³) per group — an oracle, not
    an engine.  ``points_cte`` must name a relation with columns
    (gid, ulon, ulat), pre-deduped."""
    return f"""
        SELECT p.gid AS {id_expr}, p.{ulon}, p.{ulat}
        FROM {points_cte} p
        WHERE (SELECT COUNT(*) FROM {points_cte} s
               WHERE s.gid = p.gid) = 1
           OR EXISTS (
            SELECT 1 FROM {points_cte} q
            WHERE q.gid = p.gid
              AND (q.{ulon} <> p.{ulon} OR q.{ulat} <> p.{ulat})
              AND NOT EXISTS (
                SELECT 1 FROM {points_cte} r
                WHERE r.gid = p.gid
                  AND (r.{ulon} <> p.{ulon} OR r.{ulat} <> p.{ulat})
                  AND (r.{ulon} <> q.{ulon} OR r.{ulat} <> q.{ulat})
                  AND NOT (
                    (q.{ulon} - p.{ulon}) * (r.{ulat} - p.{ulat})
                    - (q.{ulat} - p.{ulat}) * (r.{ulon} - p.{ulon}) > 0
                    OR (
                      (q.{ulon} - p.{ulon}) * (r.{ulat} - p.{ulat})
                      - (q.{ulat} - p.{ulat}) * (r.{ulon} - p.{ulon}) = 0
                      AND (r.{ulon} - p.{ulon}) * (q.{ulon} - p.{ulon})
                          + (r.{ulat} - p.{ulat}) * (q.{ulat} - p.{ulat}) > 0
                      AND (r.{ulon} - p.{ulon}) * (q.{ulon} - p.{ulon})
                          + (r.{ulat} - p.{ulat}) * (q.{ulat} - p.{ulat})
                          < (q.{ulon} - p.{ulon}) * (q.{ulon} - p.{ulon})
                            + (q.{ulat} - p.{ulat}) * (q.{ulat} - p.{ulat})
                    )
                  )
              )
          )
    """


def directional_extremes(
    points: DataFrame,
    id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    directions: list[tuple[int, int]] = DIRECTIONS_8,
) -> DataFrame:
    """k-direction extreme points per group (the bounding-polygon
    sketch): for each integer direction (a, b), the point maximizing
    a·ulon + b·ulat, ties broken by (ulon, ulat) so the result is
    deterministic at any parallelism.  One explode(k) + one window
    rank — no per-group sort of the whole group beyond the rank's
    top-1 (WindowGroupLimit pushes the k×|group| sort down to a
    running max).

    Output: id, dir_idx, score, ulon, ulat."""
    snapped = points.select(
        F.col(id_col).alias("gid"),
        _snap(F.col(lon)).alias("ulon"),
        _snap(F.col(lat)).alias("ulat"),
    )
    dirs = F.array(
        *[
            F.struct(
                F.lit(i).alias("dir_idx"),
                F.lit(a).alias("a"),
                F.lit(b).alias("b"),
            )
            for i, (a, b) in enumerate(directions)
        ]
    )
    fan = snapped.select(
        "gid", "ulon", "ulat", F.explode(dirs).alias("d")
    ).select(
        "gid",
        F.col("d.dir_idx").alias("dir_idx"),
        (F.col("d.a") * F.col("ulon") + F.col("d.b") * F.col("ulat"))
        .alias("score"),
        "ulon",
        "ulat",
    )
    w = W.partitionBy("gid", "dir_idx").orderBy(
        F.col("score").desc(), F.col("ulon"), F.col("ulat")
    )
    top = fan.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return top.select(
        F.col("gid").alias(id_col), "dir_idx", "score", "ulon", "ulat"
    )


def hull_diameter(
    points: DataFrame,
    id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    max_hull_size: int = 2000,
) -> DataFrame:
    """Farthest-pair (diameter) per group, in exact integer
    10⁻⁴-degree units — the spatial-extent statistic (how spread is
    this cluster / region / user's activity?).  The diameter's
    endpoints are always CONVEX HULL vertices (d² is convex, so its
    max over a point set is attained at extreme points), so the
    quadratic pair scan runs on the hull (h vertices, h ≪ n), never
    on the raw group: :func:`convex_hull` first, then one gid-keyed
    self-join over hull vertices with an exact int64 d² (coordinates
    ≤ 3.6·10⁶ units ⇒ d² ≤ 2.6·10¹³, far inside int64).

    The h² fan is guarded LOUDLY (``assert_true`` riding the used
    coordinate column, the common_neighbor_pairs pattern): degenerate
    near-circular groups can have h → n, and a silent quadratic
    blow-up is the house's forbidden failure mode.

    Ties (several pairs at max d²) break by the lexicographically
    greatest (a_ulon, a_ulat, b_ulon, b_ulat) struct — deterministic
    at any parallelism.  Pairs enumerate once (a ≤ b lexicographic,
    self-pair included), so a single-distinct-point group emits
    d2 = 0 with identical endpoints.

    Output: id, d2, a_ulon, a_ulat, b_ulon, b_ulat."""
    h = convex_hull(points, id_col, lon, lat).select(
        F.col(id_col).alias("gid"), "ulon", "ulat"
    )
    hn = h.groupBy("gid").agg(F.count(F.lit(1)).alias("_hn"))
    guard = F.assert_true(
        F.col("_hn") <= F.lit(int(max_hull_size)),
        F.lit(
            f"hull size exceeds max_hull_size={max_hull_size} in "
            "hull_diameter; the pair scan is h² — simplify the group "
            "geometry or raise the cap"
        ),
    )
    # the guard must ride a column the plan USES (pruned ⇒ optimized away)
    g = h.join(hn, "gid").select(
        "gid", F.when(guard.isNull(), F.col("ulon")).alias("ulon"), "ulat"
    )
    a = g.select(
        "gid", F.col("ulon").alias("a_ulon"), F.col("ulat").alias("a_ulat")
    )
    b = g.select(
        "gid", F.col("ulon").alias("b_ulon"), F.col("ulat").alias("b_ulat")
    )
    pairs = a.join(b, "gid").where(
        (F.col("a_ulon") < F.col("b_ulon"))
        | (
            (F.col("a_ulon") == F.col("b_ulon"))
            & (F.col("a_ulat") <= F.col("b_ulat"))
        )
    )
    scored = pairs.select(
        "gid",
        F.struct(
            (
                (F.col("b_ulon") - F.col("a_ulon"))
                * (F.col("b_ulon") - F.col("a_ulon"))
                + (F.col("b_ulat") - F.col("a_ulat"))
                * (F.col("b_ulat") - F.col("a_ulat"))
            ).alias("d2"),
            "a_ulon", "a_ulat", "b_ulon", "b_ulat",
        ).alias("_p"),
    )
    best = scored.groupBy("gid").agg(F.max("_p").alias("_p"))
    return best.select(
        F.col("gid").alias(id_col),
        F.col("_p.d2").alias("d2"),
        F.col("_p.a_ulon").alias("a_ulon"),
        F.col("_p.a_ulat").alias("a_ulat"),
        F.col("_p.b_ulon").alias("b_ulon"),
        F.col("_p.b_ulat").alias("b_ulat"),
    )


def hull_diameter_sql(points_cte: str) -> str:
    """DuckDB twin of :func:`hull_diameter`: the witness-edge hull
    twin (:func:`convex_hull_sql`) composed with the identical
    once-per-pair max (same lexicographic tie-break via ordered
    ROW_NUMBER — the struct-max's relational spelling).
    ``points_cte`` must name a relation with (gid, ulon, ulat),
    pre-deduped."""
    return f"""
        SELECT gid, d2, a_ulon, a_ulat, b_ulon, b_ulat FROM (
            SELECT gid, d2, a_ulon, a_ulat, b_ulon, b_ulat,
                   ROW_NUMBER() OVER (
                       PARTITION BY gid
                       ORDER BY d2 DESC, a_ulon DESC, a_ulat DESC,
                                b_ulon DESC, b_ulat DESC) AS rn
            FROM (
                SELECT a.gid,
                       (b.ulon - a.ulon) * (b.ulon - a.ulon)
                       + (b.ulat - a.ulat) * (b.ulat - a.ulat) AS d2,
                       a.ulon AS a_ulon, a.ulat AS a_ulat,
                       b.ulon AS b_ulon, b.ulat AS b_ulat
                FROM ({convex_hull_sql(points_cte)}) a
                JOIN ({convex_hull_sql(points_cte)}) b
                  ON a.gid = b.gid
                 AND (a.ulon < b.ulon
                      OR (a.ulon = b.ulon AND a.ulat <= b.ulat))
            )
        ) WHERE rn = 1
    """
