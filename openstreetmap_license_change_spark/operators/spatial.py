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

    One shuffle on cell for each side; salting for hot cells is the
    caller's choice via ``salt_hot_cells``."""
    c = candidates.select(
        F.col("cell").alias("c_cell"),
        F.col(cand_id),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
    )
    joined = points.join(c, points.cell == c.c_cell, "inner").withColumn(
        "dist2",
        (F.col("lon") - F.col("c_lon")) ** 2 + (F.col("lat") - F.col("c_lat")) ** 2,
    )
    # top-k via collect_list + sort_array instead of a row_number sort
    # window: a point's candidates all live in one cell partition, so
    # the partial aggregate completes locally and the shuffle carries
    # one record per point; the per-partition global sort the window
    # would need disappears entirely
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
