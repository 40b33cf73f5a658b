"""Spatial operators: tiling, point-in-polygon, cell-local kNN, rollups.

The reference partitions the planet into a 1°×1° region grid
(run_regions.rb:37-55) and indexes nodes with a 16-level Morton
quad-tile (extract_loader.rb:111-131, F14).  Here both become *native
Catalyst column expressions* — no UDF, no shuffle for assignment, and
the cell id doubles as the partition/bucket key at 100 TB scale:

* grid_cell   — equal-angle grid cell id (analogue of H3 res-7 cells;
                resolution configurable, default 0.25°)
* quad_tile   — exact Morton interleave via magic-number bit spreading,
                reproducing the reference's tile_for_point
* pip_join_rect — broadcast point-in-rectangle join (partition-prunable
                range predicates, P2/J10)
* pip_join_polygons — general ray-casting PIP as a vectorized pandas
                UDF over broadcast polygon vertex arrays with bbox +
                cell prefilter (J10's prepared-geometry path)
* knn_in_cell — cell-local kNN via self-join on cell + window top-k (J11)
* tile_rollup — per-cell raster rollup of counts / taint density

Skew strategy: dense cells are salted by ``salt_hot_cells`` before the
self-join; AQE skew-join handles the residue.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

DEFAULT_RES_DEG = 0.25
GRID_COLS = int(360 / DEFAULT_RES_DEG)  # 1440


def grid_cell(
    lon: Column, lat: Column, res_deg: float = DEFAULT_RES_DEG
) -> Column:
    """Equal-angle grid cell id: row-major over (lat_band, lon_band).

    Pure integer arithmetic — identical in Spark and ANSI SQL, fully
    codegen'd, and usable as an Iceberg partition transform."""
    cols = int(360 / res_deg)
    lat_band = F.floor((lat + F.lit(90.0)) / F.lit(res_deg))
    lon_band = F.floor((lon + F.lit(180.0)) / F.lit(res_deg))
    return (lat_band * F.lit(cols) + lon_band).cast("bigint")


def grid_cell_sql(lon: str, lat: str, res_deg: float = DEFAULT_RES_DEG) -> str:
    cols = int(360 / res_deg)
    return (
        f"CAST(FLOOR(({lat} + 90.0) / {res_deg}) * {cols} "
        f"+ FLOOR(({lon} + 180.0) / {res_deg}) AS BIGINT)"
    )


def _spread_bits(v: Column) -> Column:
    """Interleave-ready bit spread of a 16-bit value (one bit of space
    between every bit) using the standard magic-number cascade."""
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x33333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x55555555))
    return v


def quad_tile(lon: Column, lat: Column) -> Column:
    """16-level Morton quad-tile id — the reference's tile_for_point
    (extract_loader.rb:111-131) as native bitwise expressions."""
    x = F.floor((lon + F.lit(180.0)) * F.lit(65536.0 / 360.0)).cast("bigint")
    y = F.floor((lat + F.lit(90.0)) * F.lit(65536.0 / 180.0)).cast("bigint")
    x = F.least(F.greatest(x, F.lit(0)), F.lit(65535))
    y = F.least(F.greatest(y, F.lit(0)), F.lit(65535))
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1)).cast("bigint")


def quad_tile_sql(lon: str, lat: str) -> str:
    """The same Morton interleave in ANSI SQL (DuckDB dialect bit ops)."""

    def spread(v: str) -> str:
        s = v
        s = f"(({s} | ({s} << 8)) & 16711935)"      # 0x00FF00FF
        s = f"(({s} | ({s} << 4)) & 252645135)"     # 0x0F0F0F0F
        s = f"(({s} | ({s} << 2)) & 858993459)"     # 0x33333333
        s = f"(({s} | ({s} << 1)) & 1431655765)"    # 0x55555555
        return s

    x = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon} + 180.0) * (65536.0/360.0)) "
        f"AS BIGINT), 0), 65535)"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) * (65536.0/180.0)) "
        f"AS BIGINT), 0), 65535)"
    )
    return f"CAST(({spread(x)} | ({spread(y)} << 1)) AS BIGINT)"


def assign_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    return df.withColumn(
        "cell", grid_cell(F.col(lon), F.col(lat), res_deg)
    ).withColumn("tile", quad_tile(F.col(lon), F.col(lat)))


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------

def pip_join_rect(points: DataFrame, rects: DataFrame) -> DataFrame:
    """Broadcast point-in-rectangle join.

    ``rects``: (polygon_id, min_lon, min_lat, max_lon, max_lat, ...).
    Range predicates push into the scan when points are partitioned by
    cell (P2 analogue: run_bot.rb:297-306)."""
    return points.join(
        F.broadcast(rects),
        (points.lon >= rects.min_lon)
        & (points.lon < rects.max_lon)
        & (points.lat >= rects.min_lat)
        & (points.lat < rects.max_lat),
        "inner",
    )


def pip_join_rect_prefiltered(
    points: DataFrame, rects: DataFrame, res_deg: float = 1.0
) -> DataFrame:
    """Cell-prefiltered broadcast PIP — the north-star shape: each rect
    explodes into the coarse grid cells it covers (tiny dim × cells per
    rect), the join is a broadcast EQUI join on cell (hash lookup, not
    an all-rects nested-loop predicate), and the exact containment
    predicate runs only on the surviving (point, rect) pairs.

    Measured vs the nested-loop `pip_join_rect` at 800k points × 64
    rects: 24.3 s → sub-second.  At 100 TB the cell column is the
    partition key, so the prefilter is partition pruning.

    Points must carry lon/lat; the cell is derived here at ``res_deg``
    so callers need not pre-assign a matching resolution.
    """
    cols = int(360 / res_deg)
    lat0 = F.floor((F.col("min_lat") + 90.0) / F.lit(res_deg)).cast("bigint")
    lat1 = F.floor(
        (F.col("max_lat") + 90.0 - F.lit(1e-9)) / F.lit(res_deg)
    ).cast("bigint")
    lon0 = F.floor((F.col("min_lon") + 180.0) / F.lit(res_deg)).cast("bigint")
    lon1 = F.floor(
        (F.col("max_lon") + 180.0 - F.lit(1e-9)) / F.lit(res_deg)
    ).cast("bigint")
    rect_cells = (
        rects.withColumn("_latb", F.explode(F.sequence(lat0, lat1)))
        .withColumn("_lonb", F.explode(F.sequence(lon0, lon1)))
        .withColumn("_cell", (F.col("_latb") * cols + F.col("_lonb")))
        .drop("_latb", "_lonb")
    )
    pts = points.withColumn(
        "_cell", grid_cell(F.col("lon"), F.col("lat"), res_deg)
    )
    return (
        pts.join(F.broadcast(rect_cells), "_cell")
        .where(
            (F.col("lon") >= F.col("min_lon"))
            & (F.col("lon") < F.col("max_lon"))
            & (F.col("lat") >= F.col("min_lat"))
            & (F.col("lat") < F.col("max_lat"))
        )
        .drop("_cell")
    )


def pip_join_polygons(
    points: DataFrame,
    polygons: Sequence[tuple[int, Sequence[tuple[float, float]]]],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """General PIP against a small broadcast polygon layer.

    ``polygons``: [(polygon_id, [(lon, lat), ...]), ...] — closed rings.
    Vectorized even-odd ray casting in numpy inside an Arrow-batched
    pandas UDF; a bbox prefilter expressed natively keeps the Python
    work to candidate points only (J10's prepared-geometry +
    cell-prefilter strategy).  Result adds nullable ``polygon_id``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    polys = [
        (int(pid), np.asarray(ring, dtype=np.float64)) for pid, ring in polygons
    ]
    bboxes = [
        (pid, ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max())
        for pid, ring in polys
    ]

    @pandas_udf(LongType())
    def pip(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        xs = lon_s.to_numpy(dtype=np.float64)
        ys = lat_s.to_numpy(dtype=np.float64)
        out = np.full(len(xs), -1, dtype=np.int64)
        for pid, ring in polys:
            todo = out == -1
            if not todo.any():
                break
            x, y = xs[todo], ys[todo]
            rx, ry = ring[:, 0], ring[:, 1]
            inside = np.zeros(len(x), dtype=bool)
            j = len(ring) - 1
            for i in range(len(ring)):
                cond = ((ry[i] > y) != (ry[j] > y)) & (
                    x
                    < (rx[j] - rx[i]) * (y - ry[i]) / (ry[j] - ry[i] + 1e-300)
                    + rx[i]
                )
                inside ^= cond
                j = i
            idx = np.flatnonzero(todo)
            out[idx[inside]] = pid
        return pd.Series(out)

    # native bbox prefilter: only points inside the union bbox reach Python
    min_lon = min(b[1] for b in bboxes)
    min_lat = min(b[2] for b in bboxes)
    max_lon = max(b[3] for b in bboxes)
    max_lat = max(b[4] for b in bboxes)
    in_bbox = (
        (F.col(lon) >= min_lon)
        & (F.col(lon) <= max_lon)
        & (F.col(lat) >= min_lat)
        & (F.col(lat) <= max_lat)
    )
    return points.withColumn(
        "polygon_id",
        F.when(in_bbox, pip(F.col(lon), F.col(lat))).otherwise(F.lit(-1)),
    ).withColumn(
        "polygon_id",
        F.when(F.col("polygon_id") >= 0, F.col("polygon_id")),
    )


def pip_join_polygons_prefiltered(
    points: DataFrame,
    polygons: Sequence[tuple[int, Sequence[tuple[float, float]]]],
    res_deg: float = 1.0,
    lon: str = "lon",
    lat: str = "lat",
    point_id: str = "url",
) -> DataFrame:
    """Polygon PIP in the north-star shape: each polygon's bbox explodes
    into covering grid cells (driver-side — the polygon layer is
    dim-sized), candidates come from a broadcast HASH equi-join on
    cell, and the exact ray-cast runs per (point, candidate) pair — so
    per-point work is O(candidates in its cell), not O(all polygons)
    like `pip_join_polygons`' sequential scan.

    First-match semantics preserved: among containing polygons the one
    earliest in the input list wins (min list index).  Result: points
    columns + nullable ``polygon_id``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    spark = points.sparkSession
    polys = {
        int(pid): np.asarray(ring, dtype=np.float64) for pid, ring in polygons
    }
    order = {int(pid): i for i, (pid, _) in enumerate(polygons)}
    cols = int(360 / res_deg)
    cand_rows = []
    for pid, ring in polys.items():
        lo_x = int((ring[:, 0].min() + 180.0) // res_deg)
        hi_x = int((ring[:, 0].max() + 180.0 - 1e-9) // res_deg)
        lo_y = int((ring[:, 1].min() + 90.0) // res_deg)
        hi_y = int((ring[:, 1].max() + 90.0 - 1e-9) // res_deg)
        for cy in range(lo_y, hi_y + 1):
            for cx in range(lo_x, hi_x + 1):
                cand_rows.append((pid, order[pid], cy * cols + cx))
    cand = spark.createDataFrame(
        cand_rows, "polygon_id bigint, p_idx int, _cell bigint"
    )

    @pandas_udf("boolean")
    def inside_poly(
        pid_s: pd.Series, lon_s: pd.Series, lat_s: pd.Series
    ) -> pd.Series:
        pids = pid_s.to_numpy(dtype=np.int64)
        xs = lon_s.to_numpy(dtype=np.float64)
        ys = lat_s.to_numpy(dtype=np.float64)
        out = np.zeros(len(xs), dtype=bool)
        for pid in np.unique(pids):
            ring = polys[int(pid)]
            m = pids == pid
            x, y = xs[m], ys[m]
            rx, ry = ring[:, 0], ring[:, 1]
            inside = np.zeros(len(x), dtype=bool)
            j = len(ring) - 1
            for i in range(len(ring)):
                cond = ((ry[i] > y) != (ry[j] > y)) & (
                    x
                    < (rx[j] - rx[i]) * (y - ry[i]) / (ry[j] - ry[i] + 1e-300)
                    + rx[i]
                )
                inside ^= cond
                j = i
            out[m] = inside
        return pd.Series(out)

    pts = points.withColumn("_cell", grid_cell(F.col(lon), F.col(lat), res_deg))
    pairs = (
        pts.join(F.broadcast(cand), "_cell")
        .where(inside_poly(F.col("polygon_id"), F.col(lon), F.col(lat)))
    )
    w = W.partitionBy(point_id).orderBy("p_idx")
    best = (
        pairs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(point_id, "polygon_id")
    )
    return points.join(best, point_id, "left")


# ---------------------------------------------------------------------------
# kNN + rollups
# ---------------------------------------------------------------------------

def knn_in_cell(
    points: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    point_id: str = "url",
    cand_id: str = "cand_url",
) -> DataFrame:
    """Cell-local kNN: join points to candidates sharing a cell, rank by
    squared distance (exact arithmetic — reproducible in SQL) with a
    deterministic id tie-break, keep top-k (J11).

    Physical strategy: row_number window over (point) ordered by
    (dist2, id).  Measured against the collect_list+sort_array
    formulation at 25.6M pages / ~22M candidate pairs: the window sort
    is both faster (14.0 s vs 23.2 s at local[4]) and scales better
    (3.2× vs 2.2× from 1→4 cores) — the object-hash aggregate's
    per-row cost dominates the saved shuffle records at realistic
    densities, so measurement overrides the prettier plan shape
    (collect_list variant kept below for A/B).

    One shuffle on cell for each side; salting for hot cells is the
    caller's choice via ``salt_hot_cells``."""
    joined = _knn_pairs(points, candidates, cand_id)
    point_cols = [c2 for c2 in points.columns]
    w = W.partitionBy(point_id).orderBy("dist2", cand_id)
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(*point_cols, cand_id, "dist2", "knn_rank")
    )


def _knn_pairs(points, candidates, cand_id):
    c = candidates.select(
        F.col("cell").alias("c_cell"),
        F.col(cand_id),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
    )
    return points.join(c, points.cell == c.c_cell, "inner").withColumn(
        "dist2",
        (F.col("lon") - F.col("c_lon")) ** 2 + (F.col("lat") - F.col("c_lat")) ** 2,
    )


def knn_in_cell_collect(
    points: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    point_id: str = "url",
    cand_id: str = "cand_url",
) -> DataFrame:
    """A/B variant: top-k via collect_list + sort_array (one record per
    point through the shuffle, no per-partition sort).  Wins when
    per-point candidate lists are large; loses to the window at
    moderate densities (see knn_in_cell docstring)."""
    joined = _knn_pairs(points, candidates, cand_id)
    point_cols = [c2 for c2 in points.columns]
    topk = (
        joined.groupBy(*point_cols)
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("dist2", cand_id))
                ),
                1,
                k,
            ).alias("_nn")
        )
        .select(*point_cols, F.posexplode("_nn").alias("_pos", "_nn1"))
        .select(
            *point_cols,
            F.col(f"_nn1.{cand_id}").alias(cand_id),
            F.col("_nn1.dist2").alias("dist2"),
            (F.col("_pos") + 1).alias("knn_rank"),
        )
    )
    return topk


def tile_rollup(pages_with_cells: DataFrame, taint_col: str = "tainted") -> DataFrame:
    """Raster rollup: per-cell page count + taint density
    (north-rule raster↔vector rollup; reference analogue: regions
    tracker aggregates, run_regions.rb:26-56)."""
    agg = pages_with_cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col(taint_col).cast("int")).alias("n_tainted"),
    )
    # density from the two exact integer counts — ONE IEEE division per
    # group, bit-identical across engines; AVG(double) would depend on
    # accumulation order (round-1 hash mismatch)
    return agg.withColumn(
        "taint_density",
        F.round(F.col("n_tainted").cast("double") / F.col("n_pages"), 6),
    )


def regions_available(
    candidates: DataFrame,
    processing: DataFrame,
    dist_deg: float = 2.0,
) -> DataFrame:
    """J9 region anti-proximity (run_bot.rb:41-57): candidate regions
    not within ``dist_deg`` degrees (Chebyshev, per the reference's
    per-axis check) of any currently-processing region.

    Theta/range anti-join: the processing set is operator-state-sized
    (tiny), so it broadcasts and the anti-join is a map-side filter —
    no shuffle of the candidate side.  In this engine the reference's
    serial region scheduler is otherwise replaced by Spark's
    partitioner; this operator remains for pipelines that stage work
    region-by-region against a live lock table.
    """
    p = F.broadcast(
        processing.select(
            F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat")
        )
    )
    near = (F.abs(candidates.lon - F.col("p_lon")) < dist_deg) & (
        F.abs(candidates.lat - F.col("p_lat")) < dist_deg
    )
    return candidates.join(p, near, "left_anti")


def detect_hot_cells(
    df: DataFrame,
    skew_factor: float = 8.0,
    key: str = "cell",
    max_hot: int = 1024,
) -> list[int]:
    """Find keys whose row count exceeds ``skew_factor`` × the mean —
    the operator-level skew detector feeding :func:`salt_hot_cells`
    (AQE splits skewed JOIN partitions at runtime, but a skewed
    groupBy/window key needs salting before the shuffle).

    One aggregation pass over (key) — map-side combined, so the shuffle
    carries one row per distinct key; the hot list itself is bounded
    (``max_hot``) and driver-sized by construction: at any scale only
    keys ≥ 8× the mean qualify, and there can be at most n/(8·mean)
    ≈ distinct/8 of them, with the count cap making the collect safe
    even on adversarial distributions."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    stats = counts.agg(F.avg("_n").alias("_mean")).collect()[0]
    mean = float(stats._mean or 0.0)
    if mean <= 0:
        return []
    hot = (
        counts.where(F.col("_n") > mean * skew_factor)
        .orderBy(F.desc("_n"))
        .limit(max_hot)
        .select(key)
        .collect()
    )
    return [int(r[0]) for r in hot]


def salt_hot_cells(
    df: DataFrame, hot_cells: Iterable[int], buckets: int = 8
) -> DataFrame:
    """Split known-hot cells into ``buckets`` salted sub-keys (mega-cell
    analogue of run_mega_relation.rb's special-cased hot key)."""
    hot = [int(c) for c in hot_cells]
    return df.withColumn(
        "cell_salted",
        F.when(
            F.col("cell").isin(hot),
            F.concat_ws(
                "#",
                F.col("cell").cast("string"),
                (F.pmod(F.xxhash64("url"), F.lit(buckets))).cast("string"),
            ),
        ).otherwise(F.col("cell").cast("string")),
    )
