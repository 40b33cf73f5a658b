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

# shared with the sketch-based near-dup clusterings (operators/dedup.py)
from .graph import min_label_components as _min_label_components

DEFAULT_RES_DEG = 0.25
GRID_COLS = int(360 / DEFAULT_RES_DEG)  # 1440


def _broadcast_threshold_bytes(spark) -> int:
    """The session's own autoBroadcastJoinThreshold in bytes (−1 → 0).

    Used where a localCheckpoint has erased Catalyst's size estimate
    (LogicalRDD defaults to 'huge') and an operator re-derives the
    broadcast-vs-shuffle decision from the REAL materialized row count
    — the same policy knob Catalyst itself would have consulted."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suf, m in (("kb", 1024), ("mb", 1024**2), ("gb", 1024**3),
                   ("k", 1024), ("m", 1024**2), ("g", 1024**3),
                   ("b", 1)):
        if raw.endswith(suf):
            raw = raw[: -len(suf)]
            mult = m
            break
    try:
        val = int(float(raw)) * mult
    except ValueError:
        val = 10 * 1024**2
    return max(val, 0)



def _auto_join_hint(df, join_hint):
    """Resolve the kNN family's ``join_hint="auto"`` default.

    With AQE on, the right move is NO static hint: the runtime planner
    broadcast-converts the candidate side whenever its real size fits
    (a static shuffle_hash hint pins the plan and was A/B-measured 4×
    slower at density-matched bench scale), and the session's
    maxShuffledHashJoinLocalMapThreshold still gives shuffled-hash
    (sort-free) when the side is too big to broadcast.  With AQE off —
    the pinned scaling protocol — the static shuffled-hash build is
    kept (measured best there; see knn_in_cell's docstring)."""
    if join_hint != "auto":
        return join_hint
    aqe = str(
        df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true")
    ).lower()
    return None if aqe == "true" else "shuffle_hash"


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


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_xy_bits(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= 6:
        raise ValueError("geohash precision must be in [1, 6] "
                         "(spread cascade is 16-bit)")
    nbits = 5 * precision
    return (nbits + 1) // 2, nbits // 2


def geohash(lon: Column, lat: Column, precision: int = 5) -> Column:
    """Standard base-32 geohash of (lon, lat) at ``precision`` chars —
    pure column arithmetic (the same magic-number bit spread as
    :func:`quad_tile`), so encoding is codegen'd, shuffle-free, and
    the prefix property makes the string a drop-in hierarchical
    partition / clustering key alongside the Morton ids.

    Geohash interleaves bits lon-first: for an odd total bit count the
    lon axis gets the extra bit and occupies the even LSB positions;
    for an even count it occupies the odd ones.  Verified against the
    published test vectors (e.g. (-5.6, 42.6) → ``ezs42``) and a pure
    bit-at-a-time reference in tests."""
    xb, yb = _geohash_xy_bits(precision)
    x = F.floor((lon + F.lit(180.0)) * F.lit((1 << xb) / 360.0)).cast("bigint")
    y = F.floor((lat + F.lit(90.0)) * F.lit((1 << yb) / 180.0)).cast("bigint")
    x = F.least(F.greatest(x, F.lit(0)), F.lit((1 << xb) - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit((1 << yb) - 1))
    sx, sy = _spread_bits(x), _spread_bits(y)
    v = sy.bitwiseOR(F.shiftleft(sx, 1)) if 5 * precision % 2 == 0 \
        else sx.bitwiseOR(F.shiftleft(sy, 1))
    chars = [
        F.substr(
            F.lit(GEOHASH_BASE32),
            (
                F.shiftrightunsigned(v, 5 * (precision - 1 - k))
                .bitwiseAND(F.lit(31)) + F.lit(1)
            ).cast("int"),
            F.lit(1),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lon: str, lat: str, precision: int = 5) -> str:
    """The identical geohash in DuckDB SQL (same spread cascade as
    :func:`quad_tile_sql`) — the oracle twin."""
    xb, yb = _geohash_xy_bits(precision)

    def spread(v: str) -> str:
        s = v
        s = f"(({s} | ({s} << 8)) & 16711935)"
        s = f"(({s} | ({s} << 4)) & 252645135)"
        s = f"(({s} | ({s} << 2)) & 858993459)"
        s = f"(({s} | ({s} << 1)) & 1431655765)"
        return s

    x = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon} + 180.0) * ({1 << xb}/360.0)) "
        f"AS BIGINT), 0), {(1 << xb) - 1})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) * ({1 << yb}/180.0)) "
        f"AS BIGINT), 0), {(1 << yb) - 1})"
    )
    if 5 * precision % 2 == 0:
        v = f"({spread(y)} | ({spread(x)} << 1))"
    else:
        v = f"({spread(x)} | ({spread(y)} << 1))"
    parts = [
        f"SUBSTR('{GEOHASH_BASE32}', "
        f"CAST((({v} >> {5 * (precision - 1 - k)}) & 31) AS INT) + 1, 1)"
        for k in range(precision)
    ]
    return "(" + " || ".join(parts) + ")"


def quadkey(lon: Column, lat: Column, level: int = 6) -> Column:
    """Bing-style quadkey string at ``level`` digits, sliced straight
    out of the :func:`quad_tile` Morton id (one bit pair per level,
    MSB first) — no re-encoding.  Convention divergence from Bing:
    our y axis counts from the south pole (the reference's tile
    scheme, extract_loader.rb:111-131), Bing's from the north; digits
    are otherwise the same base-4 alphabet, and the prefix property
    (parent quadkey = child prefix) holds identically."""
    if not 1 <= level <= 16:
        raise ValueError("quadkey level must be in [1, 16]")
    qt = quad_tile(lon, lat)
    chars = [
        F.substr(
            F.lit("0123"),
            (
                F.shiftrightunsigned(qt, 2 * (16 - l))
                .bitwiseAND(F.lit(3)) + F.lit(1)
            ).cast("int"),
            F.lit(1),
        )
        for l in range(1, level + 1)
    ]
    return F.concat(*chars)


def quadkey_sql(lon: str, lat: str, level: int = 6) -> str:
    """The identical quadkey in DuckDB SQL over :func:`quad_tile_sql`."""
    if not 1 <= level <= 16:
        raise ValueError("quadkey level must be in [1, 16]")
    qt = quad_tile_sql(lon, lat)
    parts = [
        f"SUBSTR('0123', "
        f"CAST((({qt} >> {2 * (16 - l)}) & 3) AS INT) + 1, 1)"
        for l in range(1, level + 1)
    ]
    return "(" + " || ".join(parts) + ")"


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
# hierarchical cell ids (H3-res / S2-level analogue on the Morton tree)
#
# The Morton quad-tile is NATURALLY hierarchical: the level-L cell of a
# point is its level-16 tile shifted right 2·(16−L) bits, and a
# parent's id is any child's id >> 2 — the same parent/child algebra
# as S2 cell levels and quadkeys.  Cell ids pack the resolution into
# the high bits (H3-style), so one BIGINT column is self-describing
# and ids never collide across resolutions; the id is pure integer
# arithmetic (Spark ⇔ ANSI SQL ⇔ Iceberg partition transform).
#
# S2 level-12 / H3 res-7 named by the north rule map onto this scheme
# as resolutions of the equal-angle tree (no spherical-projection lib
# in this environment; the hierarchy algebra — parent, children,
# containment, multi-res rollup — is the part the engine owns, and is
# projection-agnostic).
# ---------------------------------------------------------------------------

MAX_TILE_RES = 16          # level-16 Morton = 32 payload bits
_RES_SHIFT = 36            # resolution tag sits above the payload
_BASE_MASK = (1 << _RES_SHIFT) - 1


def hier_cell(lon: Column, lat: Column, res: int) -> Column:
    """Hierarchical cell id at ``res`` ∈ [0, 16]: resolution-tagged
    Morton prefix.  id = res·2³⁶ | (morton₁₆ >> 2·(16−res))."""
    if not 0 <= res <= MAX_TILE_RES:
        raise ValueError(f"res must be in [0, {MAX_TILE_RES}], got {res}")
    base = F.shiftright(quad_tile(lon, lat), 2 * (MAX_TILE_RES - res))
    return (F.lit(res << _RES_SHIFT) + base).cast("bigint")


def hier_cell_sql(lon: str, lat: str, res: int) -> str:
    """DuckDB twin of :func:`hier_cell` (oracle parity)."""
    if not 0 <= res <= MAX_TILE_RES:
        raise ValueError(f"res must be in [0, {MAX_TILE_RES}], got {res}")
    return (
        f"CAST({res << _RES_SHIFT} + "
        f"({quad_tile_sql(lon, lat)} >> {2 * (MAX_TILE_RES - res)}) AS BIGINT)"
    )


def cell_res(cell: Column) -> Column:
    """Resolution encoded in a hierarchical cell id."""
    return F.shiftright(cell, _RES_SHIFT).cast("int")


def cell_parent(cell: Column, parent_res: int, res: int | None = None) -> Column:
    """Ancestor of ``cell`` at ``parent_res``.

    With ``res`` given (the common case — a column of uniform
    resolution, e.g. the finest level of a rollup) the shift is a
    literal and the whole expression stays in codegen.  Without it the
    per-row resolution is read from the id (shiftright with a column
    shift amount); a row whose cell is COARSER than ``parent_res``
    has no ancestor at that resolution and yields NULL — a negative
    shift amount would otherwise silently produce a garbage id."""
    if not 0 <= parent_res <= MAX_TILE_RES:
        raise ValueError(
            f"parent_res must be in [0, {MAX_TILE_RES}], got {parent_res}"
        )
    base = cell.bitwiseAND(F.lit(_BASE_MASK))
    if res is not None:
        if parent_res > res:
            raise ValueError(f"parent_res {parent_res} > res {res}")
        pbase = F.shiftright(base, 2 * (res - parent_res))
        return (F.lit(parent_res << _RES_SHIFT) + pbase).cast("bigint")
    delta = (cell_res(cell) - F.lit(parent_res)) * 2
    pbase = F.call_function("shiftright", base, delta)
    return F.when(
        cell_res(cell) >= F.lit(parent_res),
        (F.lit(parent_res << _RES_SHIFT) + pbase).cast("bigint"),
    )


def cell_children(cell: Column, res: int | None = None) -> Column:
    """Array of the 4 direct children (one resolution finer).  Use with
    ``F.explode``.  ``res`` as in :func:`cell_parent`.

    The tree bottoms out at ``MAX_TILE_RES``: a static ``res`` of 16
    raises; on the dynamic path a res-16 row yields NULL rather than a
    fabricated beyond-max id."""
    if res is not None and not 0 <= res < MAX_TILE_RES:
        raise ValueError(
            f"res must be in [0, {MAX_TILE_RES - 1}] for children "
            f"(res-{MAX_TILE_RES} cells are leaves), got {res}"
        )
    base = cell.bitwiseAND(F.lit(_BASE_MASK))
    child_res = (
        F.lit(res + 1) if res is not None else cell_res(cell) + F.lit(1)
    )
    tag = child_res.cast("bigint") * F.lit(1 << _RES_SHIFT)
    children = F.array(
        *[(tag + F.shiftleft(base, 2) + F.lit(i)).cast("bigint") for i in range(4)]
    )
    if res is not None:
        return children
    return F.when(cell_res(cell) < F.lit(MAX_TILE_RES), children)


def cell_contains(ancestor: Column, descendant: Column) -> Column:
    """True iff ``descendant`` lies in ``ancestor``'s subtree (any
    depth; a cell contains itself).  Prefix test on the Morton path —
    no geometry evaluated."""
    ra, rd = cell_res(ancestor), cell_res(descendant)
    ba = ancestor.bitwiseAND(F.lit(_BASE_MASK))
    bd = descendant.bitwiseAND(F.lit(_BASE_MASK))
    delta = (rd - ra) * 2
    return (rd >= ra) & (F.call_function("shiftright", bd, delta) == ba)


def compact_cells(
    cells: DataFrame, res: int, cell_col: str = "cell"
) -> DataFrame:
    """H3 ``compactCells``-style cover compaction over the
    hierarchical cell tree: the minimal mixed-resolution cell set
    covering exactly the input region — every complete group of 4
    siblings is replaced by its parent, recursively, until no
    complete group remains.  The index-maintenance half of the tiling
    engine: a city-dense crawl cover stored compacted is orders of
    magnitude smaller than its uniform-resolution expansion, and
    :func:`cell_contains` prefix joins work unchanged against it.

    Input: ``cell_col`` of UNIFORM resolution ``res`` (validated with
    one bounded probe; duplicates are dropped — a cover is a set).

    Physical plan: bottom-up promote loop, one hash aggregation per
    level on the SHRINKING frontier — level L's shuffle is at most
    |input|/4^(res−L) rows, so the whole loop costs ≤ 4/3 of one
    pass over the input regardless of depth.  Each level
    ``localCheckpoint``s (the house iterative-operator rule: bounded
    lineage, cheap early-exit counts); the loop exits as soon as no
    group promoted.  At 100 TB the input arrives cell-bucketed and
    every level's groupBy is a map-side-partial aggregation.

    The DuckDB oracle is the structurally different CLOSED FORM —
    output = complete ancestors (subtree fully present) whose parent
    is not complete — so the iterative promotion's equivalence to the
    definition is itself what the driver hash verifies.

    Output: (cell, res) — maximal complete ancestors plus never-
    completed input cells."""
    if not 0 <= res <= MAX_TILE_RES:
        raise ValueError(f"res must be in [0, {MAX_TILE_RES}], got {res}")
    frontier = cells.select(F.col(cell_col).alias("cell")).distinct()
    stray = (
        frontier.where(cell_res(F.col("cell")) != res).limit(1).count()
    )
    if stray:
        raise ValueError(
            f"compact_cells: input must be uniform resolution {res}"
        )
    frontier = frontier.localCheckpoint(eager=True)
    kept_parts: list[DataFrame] = []
    cur = res
    while cur > 0 and frontier.limit(1).count() > 0:
        g = frontier.groupBy(
            cell_parent(F.col("cell"), cur - 1, cur).alias("parent")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_list("cell").alias("children"),
        )
        promoted = g.where(F.col("n") == 4).select(
            F.col("parent").alias("cell")
        )
        kept = g.where(F.col("n") < 4).select(
            F.explode("children").alias("cell")
        )
        kept_parts.append(kept.localCheckpoint(eager=True))
        frontier = promoted.localCheckpoint(eager=True)
        cur -= 1
    out = frontier
    for part in kept_parts:
        out = out.unionByName(part)
    return out.select(
        "cell", cell_res(F.col("cell")).alias("res")
    )


def uncompact_cells(
    cells: DataFrame,
    target_res: int,
    cell_col: str = "cell",
    max_fan_res_delta: int = 8,
) -> DataFrame:
    """Inverse of :func:`compact_cells`: expand every cell to ALL its
    descendants at ``target_res`` (a cell already at target passes
    through) — ``uncompact(compact(S)) == S`` for any uniform-res set
    S (property-tested).

    One explode, no loop: a row at resolution r fans into
    4^(target−r) arithmetic children (tag + base·4^Δ + i).  The fan
    is data-INDEPENDENT per row and loudly guarded: resolution deltas
    above ``max_fan_res_delta`` (default 4⁸ = 65 536 children/row)
    raise instead of silently materializing a memory bomb, and a cell
    FINER than the target (the cover would not be representable)
    raises rather than truncating — both checked with one bounded
    aggregate before the explode."""
    if not 0 <= target_res <= MAX_TILE_RES:
        raise ValueError(
            f"target_res must be in [0, {MAX_TILE_RES}], got {target_res}"
        )
    rcol = cell_res(F.col(cell_col))
    stats = cells.agg(
        F.min(rcol).alias("mn"), F.max(rcol).alias("mx")
    ).first()
    if stats["mn"] is not None:
        if stats["mx"] > target_res:
            raise ValueError(
                f"uncompact_cells: input contains resolution "
                f"{stats['mx']} finer than target {target_res}"
            )
        if target_res - stats["mn"] > max_fan_res_delta:
            raise ValueError(
                f"uncompact_cells: fan 4^{target_res - stats['mn']} "
                f"exceeds the 4^{max_fan_res_delta} guard; compact "
                "coarse levels separately or raise max_fan_res_delta"
            )
    delta = (F.lit(target_res) - rcol).cast("int")
    base = F.col(cell_col).bitwiseAND(F.lit(_BASE_MASK))
    fan = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), delta * 2
    )
    child = (
        F.lit(target_res << _RES_SHIFT)
        + F.call_function("shiftleft", base, delta * 2)
        + F.col("_i")
    ).cast("bigint")
    return (
        cells.select(
            F.col(cell_col),
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), fan - 1)
            ).alias("_i"),
        )
        .select(child.alias("cell"))
    )


def filter_by_cover(
    points: DataFrame,
    cover: DataFrame,
    point_res: int,
    cell_col: str = "cell",
    cover_cell_col: str = "cell",
    mode: str = "semi",
) -> DataFrame:
    """Filter rows by membership in a (possibly mixed-resolution)
    cell COVER — the practical consumer of :func:`compact_cells`: a
    region of interest stored compacted (city blocks at res 5,
    stragglers at res 7) filters a point table WITHOUT uncompacting,
    because subtree membership is pure prefix arithmetic.

    A row matches iff some cover cell is an ancestor-or-equal of the
    row's ``cell_col`` (uniform resolution ``point_res``).  ``mode``:
    'semi' keeps matching rows, 'anti' the complement — both
    duplicate-free regardless of cover overlaps (left_semi/left_anti
    join semantics).

    Physical plan: the DISTINCT resolutions present in the cover are
    collected (≤ 17 values — a bounded driver action, the compact
    loop's own budget), each point explodes into its ancestor at
    exactly those resolutions (fan ≤ 17, data-independent), and ONE
    equi-join against the cover decides membership — never a
    theta-join or a per-row loop.  At 100 TB the cover is broadcast
    (a compacted region of interest is KB–MB) and the filter is
    map-side.  Cover cells FINER than the points (res > point_res)
    cannot contain any point cell and raise rather than silently
    never matching.

    The DuckDB twin decides membership with the structurally
    different EXISTS prefix-shift predicate, so the ancestor-fan
    construction is itself hash-verified."""
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode}")
    if not 0 <= point_res <= MAX_TILE_RES:
        raise ValueError(
            f"point_res must be in [0, {MAX_TILE_RES}], got {point_res}"
        )
    cov = cover.select(F.col(cover_cell_col).alias("_cov")).distinct()
    res_rows = cov.select(
        cell_res(F.col("_cov")).alias("_r")
    ).distinct().collect()
    res_list = sorted(r["_r"] for r in res_rows)
    if res_list and res_list[-1] > point_res:
        raise ValueError(
            f"cover contains resolution {res_list[-1]} finer than "
            f"point_res {point_res}: such cells can never contain a "
            "point cell — uncompact the points or coarsen the cover"
        )
    if not res_list:
        return points.where(F.lit(mode == "anti"))
    # decide membership once per DISTINCT point cell, then semi/anti
    # join the rows — duplicate input rows pass through untouched and
    # the ancestor fan never multiplies row counts
    pcells = points.select(F.col(cell_col).alias("_pc")).distinct()
    ancestors = F.array(
        *[cell_parent(F.col("_pc"), r, point_res) for r in res_list]
    )
    matched = (
        pcells.withColumn("_anc", F.explode(ancestors))
        .join(F.broadcast(cov), F.col("_anc") == F.col("_cov"),
              "left_semi")
        .select("_pc")
        .distinct()
    )
    how = "left_semi" if mode == "semi" else "left_anti"
    return points.join(
        matched, points[cell_col] == F.col("_pc"), how
    )


def cover_filter_sql(
    points_src: str,
    cover_src: str,
    point_res: int,
    cell_col: str = "cell",
    cover_cell_col: str = "cell",
    mode: str = "semi",
) -> str:
    """DuckDB twin of :func:`filter_by_cover` — EXISTS with the
    per-row prefix shift (vs the engine's bounded ancestor fan)."""
    neg = "NOT " if mode == "anti" else ""
    return f"""
        SELECT p.* FROM {points_src} p
        WHERE {neg}EXISTS (
            SELECT 1 FROM {cover_src} c
            WHERE (c.{cover_cell_col} >> {_RES_SHIFT})
                      <= {int(point_res)}
              AND (p.{cell_col} & {_BASE_MASK})
                  >> (2 * ({int(point_res)}
                       - (c.{cover_cell_col} >> {_RES_SHIFT})))
                  = c.{cover_cell_col} & {_BASE_MASK}
        )
    """


def compact_cells_sql(src: str, res: int, cell_col: str = "cell") -> str:
    """DuckDB twin of :func:`compact_cells` — the closed form: for
    every level q ≤ res, an ancestor is COMPLETE iff all 4^(res−q)
    of its res-level descendants are present; the compacted cover is
    the complete cells whose parent is not complete (input cells
    count as complete at q = res).  ``src`` exposes ``cell_col`` at
    uniform resolution ``res``."""
    levels = []
    for q in range(res + 1):
        shift = 2 * (res - q)
        levels.append(f"""
        SELECT CAST({q << _RES_SHIFT} + (base >> {shift}) AS BIGINT)
                   AS cell,
               {q} AS res,
               COUNT(*) = {4 ** (res - q)} AS complete,
               base >> {shift} AS qbase
        FROM cc_base GROUP BY base >> {shift}
        """)
    all_levels = " UNION ALL ".join(levels)
    return f"""
        WITH cc_base AS (
            SELECT DISTINCT {cell_col} & {_BASE_MASK} AS base FROM {src}
        ),
        cc_levels AS ({all_levels}),
        cc_complete AS (
            SELECT cell, res, qbase FROM cc_levels WHERE complete
        )
        SELECT c.cell, c.res
        FROM cc_complete c
        LEFT JOIN cc_complete p
          ON p.res = c.res - 1 AND p.qbase = c.qbase >> 2
        WHERE c.res = 0 OR p.cell IS NULL
    """


def uncompact_cells_sql(
    src: str, target_res: int, cell_col: str = "cell"
) -> str:
    """DuckDB twin of :func:`uncompact_cells` (arithmetic child fan
    via a range join; mixed input resolutions)."""
    return f"""
        SELECT CAST({target_res << _RES_SHIFT}
                    + ((s.{cell_col} & {_BASE_MASK})
                       << (2 * ({target_res} - (s.{cell_col}
                           >> {_RES_SHIFT}))))
                    + g.i AS BIGINT) AS cell
        FROM {src} s
        CROSS JOIN LATERAL (
            SELECT UNNEST(RANGE(0, CAST(POW(4, {target_res}
                  - (s.{cell_col} >> {_RES_SHIFT})) AS BIGINT)))
                AS i
        ) g
    """


def _compact_bits(v: Column) -> Column:
    """Inverse of :func:`_spread_bits`: gather the even bits of a
    32-bit interleave back into 16 contiguous bits."""
    v = v.bitwiseAND(F.lit(0x55555555))
    v = v.bitwiseOR(F.shiftright(v, 1)).bitwiseAND(F.lit(0x33333333))
    v = v.bitwiseOR(F.shiftright(v, 2)).bitwiseAND(F.lit(0x0F0F0F0F))
    v = v.bitwiseOR(F.shiftright(v, 4)).bitwiseAND(F.lit(0x00FF00FF))
    v = v.bitwiseOR(F.shiftright(v, 8)).bitwiseAND(F.lit(0x0000FFFF))
    return v


def cell_center(cell: Column, res: int) -> tuple[Column, Column]:
    """(lon, lat) of the cell's center — the raster→vector direction.
    De-interleaves the Morton prefix and scales back to degrees."""
    base = cell.bitwiseAND(F.lit(_BASE_MASK))
    x = _compact_bits(base)  # _compact_bits masks the even bits itself
    y = _compact_bits(F.shiftright(base, 1))
    n = float(1 << res) if res > 0 else 1.0
    lon = (x.cast("double") + 0.5) * F.lit(360.0 / n) - F.lit(180.0)
    lat = (y.cast("double") + 0.5) * F.lit(180.0 / n) - F.lit(90.0)
    return lon, lat


def cluster_by_cell(
    points: DataFrame,
    res: int = 12,
    lon: str = "lon",
    lat: str = "lat",
    num_partitions: int | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """Spatial WRITE-LAYOUT pass: range-repartition on the
    hierarchical Morton cell id (:func:`hier_cell`) and sort within
    partitions, so a parquet/Iceberg sink written from the result has
    files AND row groups spanning tight, near-disjoint cell ranges.

    This is the Z-order data-clustering step of the 100-TB story: the
    Morton id already interleaves lon/lat bits, so a 1-D range
    partition of the id is a 2-D space-filling-curve clustering.
    Downstream ``WHERE cell BETWEEN …`` scans (bbox pushdown via
    :func:`cell_descendant_range`, Iceberg partition transforms) then
    prune whole files by footer min/max instead of reading the planet.  The range exchange samples the key distribution, so
    skewed urban density still yields balanced output files — the same
    reason the writer-side sort is ``sortWithinPartitions``, never a
    global ``orderBy`` (no second exchange, no driver-side range
    metadata beyond the sampled bounds).

    Replaces nothing semantically — row content is unchanged; callers
    chain ``.write`` directly.  (S8's regions sink + change_bot.rb's
    1° region grid write is the reference analogue; there the layout
    was implicit in the grid loop, here it is an explicit operator.)"""
    keyed = points.withColumn(cell_col, hier_cell(F.col(lon), F.col(lat), res))
    if num_partitions is not None:
        out = keyed.repartitionByRange(num_partitions, cell_col)
    else:
        out = keyed.repartitionByRange(cell_col)
    return out.sortWithinPartitions(cell_col)


def cell_descendant_range(cell_id: int, child_res: int) -> tuple[int, int]:
    """Driver-side (plain-int) hierarchy algebra for scan pruning: the
    CONTIGUOUS :func:`hier_cell` id range at ``child_res`` covered by
    ancestor ``cell_id`` — Morton prefixes own contiguous child
    ranges, so a bbox expressed as covering ancestor cells becomes an
    OR of ``BETWEEN`` predicates that reach parquet footers / Iceberg
    manifests as plain int comparisons (``PushedFilters``), pruning
    files written by :func:`cluster_by_cell` without evaluating any
    geometry.  Raises if ``child_res`` is coarser than the cell's own
    resolution (same bounds discipline as :func:`cell_parent`)."""
    res = cell_id >> _RES_SHIFT
    if not 0 <= res <= MAX_TILE_RES:
        raise ValueError(f"bad cell id {cell_id}: resolution tag {res}")
    if not res <= child_res <= MAX_TILE_RES:
        raise ValueError(
            f"child_res must be in [{res}, {MAX_TILE_RES}], got {child_res}"
        )
    base = cell_id & _BASE_MASK
    shift = 2 * (child_res - res)
    tag = child_res << _RES_SHIFT
    return tag + (base << shift), tag + (((base + 1) << shift) - 1)


# ---------------------------------------------------------------------------
# polygon geometry (vector side of the raster<->vector story)
# ---------------------------------------------------------------------------

def ring_from_points(
    points: DataFrame,
    id_col: str,
    order_col: str,
    scale: int = 1000,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Assemble one closed ring per ``id_col`` group: vertices are the
    group's points in ``order_col`` order, coordinates scaled to
    integers (``round(coord · scale)`` — the reference stores
    coordinates as scaled ints too, osm.rb fixed-point lat/lon, F13).
    Output: (id_col, ring: array<struct<x bigint, y bigint>>).

    The collect is a map-side-combining ``collect_list`` + in-row
    ``array_sort`` on the (order, x, y) struct — deterministic without
    a global sort; ring sizes are the per-group cardinality, so groups
    must be bounded (same contract as every collect-based operator
    here — cap or sample the group upstream)."""
    vert = F.struct(
        F.col(order_col).alias("o"),
        F.round(F.col(lon) * F.lit(int(scale))).cast("bigint").alias("x"),
        F.round(F.col(lat) * F.lit(int(scale))).cast("bigint").alias("y"),
    )
    return (
        points.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(vert)).alias("_vs"))
        .select(
            id_col,
            F.transform(
                "_vs", lambda v: F.struct(v.x.alias("x"), v.y.alias("y"))
            ).alias("ring"),
        )
    )


def polygon_stats(polys: DataFrame, id_col: str = "polygon_id") -> DataFrame:
    """Shoelace signed area + centroid of closed rings, in EXACT
    scaled-integer arithmetic (order-independent int64 sums — the
    driver-hash rule; float accumulation would be ordering-sensitive).

    Input: (id_col, ring: array<struct<x bigint, y bigint>>) — scaled
    integer vertices (:func:`ring_from_points`).  Output per ring:

    * ``n_vertices``
    * ``area2_scaled`` — twice the signed area, in scale² units: exact
      int64 (positive = counter-clockwise; the shoelace value is
      well-defined for ANY closed ring, self-intersecting included)
    * ``centroid_x`` / ``centroid_y`` — the polygon-centroid formula
      (Σ(xᵢ+xⱼ)·crossᵢⱼ) / (3·area2), computed as ONE float division
      of two exact int64 sums (identical doubles in any engine); NULL
      when area2 = 0 (degenerate ring).

    Overflow bounds, checked math: |x| ≤ 180·scale; each cross term ≤
    2·(180·scale)²; each centroid term ≤ 2·180·scale·cross.  At the
    default scale 1000 a centroid term is ≤ 2.4e16, so rings up to
    ~380 vertices are provably safe in int64 — raise ``scale`` only
    with a matching ring-size cap (a 100-TB deployment keeping 1e7
    OSM-style precision needs decimal(38) sums instead; stated, not
    hidden).  All per-ring — whole-stage codegen higher-order
    functions, no shuffle beyond what built the rings."""
    ring = F.col("ring")
    n = F.size(ring)
    # edges i -> i+1 with the wrap edge (last -> first)
    rot = F.concat(F.slice(ring, 2, n - 1), F.slice(ring, 1, 1))
    edges = F.arrays_zip(ring.alias("a"), rot.alias("b"))
    cross = lambda e: e["a"]["x"] * e["b"]["y"] - e["b"]["x"] * e["a"]["y"]
    zero = F.lit(0).cast("bigint")
    area2 = F.aggregate(edges, zero, lambda acc, e: acc + cross(e))
    cx_num = F.aggregate(
        edges, zero,
        lambda acc, e: acc + (e["a"]["x"] + e["b"]["x"]) * cross(e),
    )
    cy_num = F.aggregate(
        edges, zero,
        lambda acc, e: acc + (e["a"]["y"] + e["b"]["y"]) * cross(e),
    )
    out = polys.select(
        id_col,
        n.cast("bigint").alias("n_vertices"),
        area2.alias("area2_scaled"),
        cx_num.alias("_cxn"),
        cy_num.alias("_cyn"),
    )
    safe = F.col("area2_scaled") != 0
    div = lambda num: (
        num.cast("double")
        / (F.lit(3.0) * F.col("area2_scaled").cast("double"))
    )
    return out.select(
        id_col,
        "n_vertices",
        "area2_scaled",
        F.when(safe, F.round(div(F.col("_cxn")), 6)).alias("centroid_x"),
        F.when(safe, F.round(div(F.col("_cyn")), 6)).alias("centroid_y"),
    )


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


def pip_join_multipolygons(
    points: DataFrame,
    multipolygons: "Sequence[tuple[int, Sequence[Sequence[tuple[float, float]]]]]",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """General PIP with HOLES and ISLANDS: each polygon is a list of
    closed rings [outer, hole…, island…] and containment is even-odd
    parity across ALL of the polygon's rings — a point in a hole
    crosses outer+hole = even = outside; a point on an island inside
    the hole crosses three rings = odd = inside.  This is the OGC
    multipolygon semantics the reference's region polygons would need
    for real coastline/enclave layers (osm.rb relation multipolygons;
    the single-ring :func:`pip_join_polygons` is the simple-region
    fast path).

    Same execution shape as the single-ring variant: broadcast
    geometry, native union-bbox prefilter so only candidates reach the
    Arrow-batched numpy ray cast, first-listed polygon wins when
    layers overlap (list polygons in ascending id order so the oracle's
    MIN(pid) matches).  Rings must avoid exactly-horizontal edges
    (same layer contract as PIP_POLYGONS — keeps the crossing
    predicate division-safe in both engines)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    polys = [
        (int(pid), [np.asarray(r, dtype=np.float64) for r in rings])
        for pid, rings in multipolygons
    ]

    @pandas_udf(LongType())
    def pip(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        xs = lon_s.to_numpy(dtype=np.float64)
        ys = lat_s.to_numpy(dtype=np.float64)
        out = np.full(len(xs), -1, dtype=np.int64)
        for pid, rings in polys:
            todo = out == -1
            if not todo.any():
                break
            x, y = xs[todo], ys[todo]
            inside = np.zeros(len(x), dtype=bool)
            for ring in rings:
                rx, ry = ring[:, 0], ring[:, 1]
                j = len(ring) - 1
                for i in range(len(ring)):
                    cond = ((ry[i] > y) != (ry[j] > y)) & (
                        x
                        < (rx[j] - rx[i]) * (y - ry[i])
                        / (ry[j] - ry[i] + 1e-300)
                        + rx[i]
                    )
                    inside ^= cond
                    j = i
            idx = np.flatnonzero(todo)
            out[idx[inside]] = pid
        return pd.Series(out)

    outers = [rings[0] for _, rings in polys]
    min_lon = min(r[:, 0].min() for r in outers)
    min_lat = min(r[:, 1].min() for r in outers)
    max_lon = max(r[:, 0].max() for r in outers)
    max_lat = max(r[:, 1].max() for r in outers)
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


def pip_join_multipolygons_prefiltered(
    points: DataFrame,
    multipolygons: "Sequence[tuple[int, Sequence[Sequence[tuple[float, float]]]]]",
    res_deg: float = 1.0,
    lon: str = "lon",
    lat: str = "lat",
    point_id: str = "url",
) -> DataFrame:
    """The holes/islands PIP in the north-star cell-prefiltered shape:
    candidate (point, polygon) pairs from a broadcast hash equi-join
    on the OUTER ring's covering grid cells (holes/islands lie inside
    the outer bbox by definition, so the outer bbox is the correct
    cover), then the exact even-odd parity across ALL of the
    candidate's rings runs per pair — per-point work is O(candidates
    in its cell), not O(all polygons).  First-listed polygon wins
    among containers (min list index), matching
    :func:`pip_join_multipolygons` exactly (A/B-tested)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    spark = points.sparkSession
    polys = {
        int(pid): [np.asarray(r, dtype=np.float64) for r in rings]
        for pid, rings in multipolygons
    }
    order = {int(pid): i for i, (pid, _) in enumerate(multipolygons)}
    cols = int(360 / res_deg)
    cand_rows = []
    for pid, rings in polys.items():
        outer = rings[0]
        lo_x = int((outer[:, 0].min() + 180.0) // res_deg)
        hi_x = int((outer[:, 0].max() + 180.0 - 1e-9) // res_deg)
        lo_y = int((outer[:, 1].min() + 90.0) // res_deg)
        hi_y = int((outer[:, 1].max() + 90.0 - 1e-9) // res_deg)
        for cy in range(lo_y, hi_y + 1):
            for cx in range(lo_x, hi_x + 1):
                cand_rows.append((pid, order[pid], cy * cols + cx))
    cand = spark.createDataFrame(
        cand_rows, "polygon_id bigint, p_idx int, _cell bigint"
    )

    @pandas_udf("boolean")
    def inside_multi(
        pid_s: pd.Series, lon_s: pd.Series, lat_s: pd.Series
    ) -> pd.Series:
        pids = pid_s.to_numpy(dtype=np.int64)
        xs = lon_s.to_numpy(dtype=np.float64)
        ys = lat_s.to_numpy(dtype=np.float64)
        out = np.zeros(len(xs), dtype=bool)
        for pid in np.unique(pids):
            m = pids == pid
            x, y = xs[m], ys[m]
            inside = np.zeros(len(x), dtype=bool)
            for ring in polys[int(pid)]:
                rx, ry = ring[:, 0], ring[:, 1]
                j = len(ring) - 1
                for i in range(len(ring)):
                    cond = ((ry[i] > y) != (ry[j] > y)) & (
                        x
                        < (rx[j] - rx[i]) * (y - ry[i])
                        / (ry[j] - ry[i] + 1e-300)
                        + rx[i]
                    )
                    inside ^= cond
                    j = i
            out[m] = inside
        return pd.Series(out)

    pts = points.withColumn(
        "_cell", grid_cell(F.col(lon), F.col(lat), res_deg)
    )
    pairs = pts.join(F.broadcast(cand), "_cell").where(
        inside_multi(F.col("polygon_id"), F.col(lon), F.col(lat))
    )
    w = W.partitionBy(point_id).orderBy("p_idx")
    best = (
        pairs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(point_id, "polygon_id")
    )
    return points.join(best, point_id, "left")


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


EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius


def haversine_km(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Great-circle distance in km — native trig columns only (stays
    in whole-stage codegen; the planar dist² used by the kNN/radius
    operators is the right *ranking* metric inside a cell, this is
    the right *measurement* metric for lengths).  The asin argument
    is clamped to 1 against float drift on antipodal pairs.  The
    expression shape is mirrored verbatim by the SQL oracle so both
    engines evaluate the identical IEEE op sequence."""
    a = (
        F.pow(F.sin(F.radians(lat2 - lat1) / F.lit(2.0)), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / F.lit(2.0)), 2)
    )
    return (
        F.lit(2.0 * EARTH_RADIUS_KM)
        * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
    )


HAVERSINE_SQL = (
    "2.0 * {r} * ASIN(SQRT(LEAST("
    "POWER(SIN(RADIANS({lat2} - {lat1}) / 2.0), 2)"
    " + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
    " * POWER(SIN(RADIANS({lon2} - {lon1}) / 2.0), 2), 1.0)))"
)


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    return HAVERSINE_SQL.format(
        r=EARTH_RADIUS_KM, lon1=lon1, lat1=lat1, lon2=lon2, lat2=lat2
    )


def polyline_length(
    points: DataFrame,
    id_col: str,
    order_col: str,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-group great-circle polyline length (way/track length — the
    measurement rollup over the reference's ordered way-node lists,
    geom.rb's node sequences).

    One LAG window per (id, order) — a single hash shuffle on the
    group key, then a map-side-combining groupBy on the SAME key, so
    AQE coalesces the second exchange into the first's partitioning.
    Per-segment distances are snapped to integer micro-km
    (round(km·10⁶) — ~1 mm) and summed as int64: the sum is exact and
    partition-order-free, so results are deterministic under any
    parallelism (the house scaled-int pattern; a double SUM would
    hash-diverge from the oracle on accumulation order).  Overflow
    headroom: 2⁶³ µkm ≈ 9.2×10¹² km ≈ 4.6×10⁸ equators per group.

    Output: id, n_segments, length_km (single division at the end).
    Groups with a single point have n_segments 0 and length 0."""
    wu = W.partitionBy(id_col).orderBy(order_col)
    seg = points.select(
        F.col(id_col),
        F.col(lon).alias("_lon"),
        F.col(lat).alias("_lat"),
        F.lag(lon).over(wu).alias("_plon"),
        F.lag(lat).over(wu).alias("_plat"),
    )
    seg_km = haversine_km(
        F.col("_plon"), F.col("_plat"), F.col("_lon"), F.col("_lat")
    )
    seg = seg.withColumn(
        "_ukm",
        F.when(
            F.col("_plon").isNotNull(),
            F.round(seg_km * F.lit(1_000_000.0)).cast("bigint"),
        ),
    )
    return seg.groupBy(id_col).agg(
        F.count("_ukm").alias("n_segments"),
        (
            F.coalesce(F.sum("_ukm"), F.lit(0)).cast("double")
            / F.lit(1_000_000.0)
        ).alias("length_km"),
    )


def simplify_lines(
    points: DataFrame,
    id_col: str,
    order_col: str,
    min_area2: int,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> DataFrame:
    """One-pass Visvalingam line simplification: drop every INTERIOR
    point whose effective-triangle area (with its immediate original
    neighbors) is below the threshold; endpoints always survive.

    This is the partition-parallel member of the Visvalingam family —
    the textbook algorithm iterates (remove the global minimum,
    recompute its neighbors, repeat), which is inherently sequential
    per line; the one-pass thresholded variant used by tile pipelines
    evaluates every point against the ORIGINAL line in one window
    sweep, so a billion lines simplify in a single shuffle.  The
    variants differ when removals cascade (a surviving point whose
    area grows after its neighbor is dropped) — callers wanting the
    exact iterative result on a handful of display lines should loop
    this operator to a fixpoint; at corpus scale the one-pass verdict
    is the one that ships.  (Vector-side sibling of the raster
    smoothers; reference analogue: the way-node sequences of
    geom.rb:56-92, whose LCS diffing this engine already carries —
    simplification is the other classic transform on those sequences.)

    Exact arithmetic: coordinates snap to ``scale`` ints (default 10⁻⁴
    degrees) and the doubled area 2A = |cross((p⁻→p), (p⁻→p⁺))| stays
    int64 (≤ ~5·10¹³ at planet extent ×10⁴ — >10⁵ headroom), so the
    DuckDB twin hash-matches.  ``min_area2`` is in (1/scale degree)²
    units, compared against 2A.

    Plan: ONE hash shuffle on the line key feeds the lag/lead window,
    the filter, and the survivor renumbering (same partitioning —
    no second exchange).  Output: id, new_seq (1-based among
    survivors), the original order value, lon, lat, area2 (NULL for
    endpoints)."""
    wu = W.partitionBy(id_col).orderBy(order_col)
    pts = points.select(
        F.col(id_col), F.col(order_col), F.col(lon), F.col(lat),
        F.round(F.col(lon) * scale).cast("bigint").alias("_x"),
        F.round(F.col(lat) * scale).cast("bigint").alias("_y"),
    ).select(
        id_col, order_col, lon, lat, "_x", "_y",
        F.lag("_x").over(wu).alias("_px"),
        F.lag("_y").over(wu).alias("_py"),
        F.lead("_x").over(wu).alias("_nx"),
        F.lead("_y").over(wu).alias("_ny"),
    )
    area2 = F.abs(
        (F.col("_x") - F.col("_px")) * (F.col("_ny") - F.col("_py"))
        - (F.col("_nx") - F.col("_px")) * (F.col("_y") - F.col("_py"))
    )
    interior = F.col("_px").isNotNull() & F.col("_nx").isNotNull()
    kept = pts.withColumn(
        "area2", F.when(interior, area2)
    ).where(~interior | (F.col("area2") >= F.lit(int(min_area2))))
    return kept.select(
        id_col,
        F.row_number().over(wu).alias("new_seq"),
        order_col, lon, lat, "area2",
    )


def simplify_lines_sql(
    src: str,
    id_col: str,
    order_col: str,
    min_area2: int,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`simplify_lines` (standalone SELECT over
    ``src``) — identical scaled-int cross product, endpoint rule, and
    survivor renumbering."""
    return f"""
        SELECT {id_col},
               CAST(ROW_NUMBER() OVER (PARTITION BY {id_col}
                                       ORDER BY {order_col}) AS INT)
                   AS new_seq,
               {order_col}, {lon}, {lat}, area2
        FROM (
            SELECT *,
                   CASE WHEN _px IS NOT NULL AND _nx IS NOT NULL
                        THEN ABS((_x - _px) * (_ny - _py)
                                 - (_nx - _px) * (_y - _py)) END AS area2
            FROM (
                SELECT {id_col}, {order_col}, {lon}, {lat}, _x, _y,
                       LAG(_x)  OVER w AS _px, LAG(_y)  OVER w AS _py,
                       LEAD(_x) OVER w AS _nx, LEAD(_y) OVER w AS _ny
                FROM (
                    SELECT {id_col}, {order_col}, {lon}, {lat},
                           CAST(ROUND({lon} * {scale}) AS BIGINT) AS _x,
                           CAST(ROUND({lat} * {scale}) AS BIGINT) AS _y
                    FROM {src}
                )
                WINDOW w AS (PARTITION BY {id_col} ORDER BY {order_col})
            )
        )
        WHERE area2 IS NULL OR area2 >= {int(min_area2)}
    """


def trip_segments(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    max_gap_s: int = 3600,
    max_jump_km: float = 50.0,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Trajectory segmentation: split each entity's timestamp-ordered
    point stream into trips at temporal gaps (> ``max_gap_s``) or
    spatial jumps (> ``max_jump_km`` great-circle), and roll up each
    trip — the GPS-trace sibling of the reference's ordered way-node
    handling (geom.rb node sequences), applied to the crawl/event
    layer.

    Plan shape: every window (lag ts, lag lon/lat, running trip
    counter) shares ONE partitionBy(id) orderBy(ts, tiebreak) sort —
    a single hash shuffle + sort, then a map-side-combining groupBy
    on (id, trip_no).  Per-trip length uses the house scaled-int
    convention (round(km·10⁶) per within-trip edge, int64 sum, one
    division) so results are exact and parallelism-independent; the
    jump edge that OPENS a trip contributes no length.  Gap tests
    compare integer microseconds (``unix_micros`` ↔ DuckDB
    ``epoch_us``), never floats.  Pass ``tiebreak`` columns whenever
    ``ts`` is not unique per entity — the running trip counter uses a
    ROWS frame, so a non-deterministic tie order would otherwise make
    trip boundaries run-dependent.

    Output: id, trip_no (1-based per id), n_points, start_us, end_us,
    length_km."""
    order_cols = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    wu = W.partitionBy(id_col).orderBy(*order_cols)
    # parquet timestamps arrive as TIMESTAMP_NTZ; the session runs in
    # UTC, so the cast is instant-preserving and unix_micros matches
    # DuckDB's epoch_us on the naive value
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    tb_aliases = [
        F.col(c).alias(f"_tb{i}") for i, c in enumerate(tiebreak)
    ]
    seg = points.select(
        F.col(id_col),
        us.alias("_us"),
        *tb_aliases,
        F.col(lon).alias("_lon"),
        F.col(lat).alias("_lat"),
        F.lag(us).over(wu).alias("_pus"),
        F.lag(lon).over(wu).alias("_plon"),
        F.lag(lat).over(wu).alias("_plat"),
    )
    jump_km = haversine_km(
        F.col("_plon"), F.col("_plat"), F.col("_lon"), F.col("_lat")
    )
    new_trip = (
        F.col("_pus").isNull()
        | (F.col("_us") - F.col("_pus") > F.lit(int(max_gap_s) * 1_000_000))
        | (jump_km > F.lit(float(max_jump_km)))
    )
    w2 = (
        W.partitionBy(id_col)
        .orderBy("_us", *[f"_tb{i}" for i in range(len(tiebreak))])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seg = seg.withColumn("_new", new_trip.cast("int")).withColumn(
        "trip_no", F.sum("_new").over(w2).cast("bigint")
    )
    edge_ukm = F.when(
        F.col("_new") == 0,
        F.round(jump_km * F.lit(1_000_000.0)).cast("bigint"),
    )
    seg = seg.withColumn("_ukm", edge_ukm)
    return seg.groupBy(F.col(id_col), F.col("trip_no")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (
            F.coalesce(F.sum("_ukm"), F.lit(0)).cast("double")
            / F.lit(1_000_000.0)
        ).alias("length_km"),
    )


def pip_anti_join(
    points: DataFrame,
    polygons: Sequence[tuple[int, Sequence[tuple[float, float]]]],
    res_deg: float = 1.0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Spatial ANTI join: the points contained in NO polygon (the
    complement of :func:`pip_join_polygons_prefiltered` — "everything
    outside the exclusion regions", P3's spatial analogue).

    Plan shape — deliberately not `prefiltered + left_anti`: that
    would spend a wide anti-join exchange on a matched-id set that is
    data-sized at scale.  Instead the broadcast side is pre-grouped
    driver-side into (cell → candidate polygon-id list); points LEFT
    join it 1:1 on their cell (broadcast hash join, no fan-out, no
    shuffle), and one Arrow-batched UDF evaluates "inside any
    candidate" per point.  Every stage is map-side — a 100-TB input
    never shuffles at all; points whose cell has no candidate list
    skip Python entirely via the native null check.

    Exactness: the even-odd ray cast is byte-identical to
    `pip_join_polygons` (same formula, same epsilon guard)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    spark = points.sparkSession
    polys = {
        int(pid): np.asarray(ring, dtype=np.float64) for pid, ring in polygons
    }
    cols = int(360 / res_deg)
    by_cell: dict[int, list[int]] = {}
    for pid, ring in polys.items():
        lo_x = int((ring[:, 0].min() + 180.0) // res_deg)
        hi_x = int((ring[:, 0].max() + 180.0 - 1e-9) // res_deg)
        lo_y = int((ring[:, 1].min() + 90.0) // res_deg)
        hi_y = int((ring[:, 1].max() + 90.0 - 1e-9) // res_deg)
        for cy in range(lo_y, hi_y + 1):
            for cx in range(lo_x, hi_x + 1):
                by_cell.setdefault(cy * cols + cx, []).append(pid)
    cand = spark.createDataFrame(
        [(c, pids) for c, pids in by_cell.items()],
        "_cell bigint, _pids array<bigint>",
    )

    @pandas_udf("boolean")
    def inside_any(
        pids_s: pd.Series, lon_s: pd.Series, lat_s: pd.Series
    ) -> pd.Series:
        xs = lon_s.to_numpy(dtype=np.float64)
        ys = lat_s.to_numpy(dtype=np.float64)
        out = np.zeros(len(xs), dtype=bool)
        keys = pids_s.map(lambda v: tuple(v) if v is not None else ())
        for key in keys.unique():
            m = (keys == key).to_numpy()
            for pid in key:
                todo = m & ~out
                if not todo.any():
                    break
                ring = polys[int(pid)]
                x, y = xs[todo], ys[todo]
                rx, ry = ring[:, 0], ring[:, 1]
                inside = np.zeros(len(x), dtype=bool)
                j = len(ring) - 1
                for i in range(len(ring)):
                    cond = ((ry[i] > y) != (ry[j] > y)) & (
                        x
                        < (rx[j] - rx[i]) * (y - ry[i])
                        / (ry[j] - ry[i] + 1e-300)
                        + rx[i]
                    )
                    inside ^= cond
                    j = i
                idx = np.flatnonzero(todo)
                out[idx[inside]] = True
        return pd.Series(out)

    pts = points.withColumn("_cell", grid_cell(F.col(lon), F.col(lat), res_deg))
    joined = pts.join(F.broadcast(cand), "_cell", "left")
    keep = F.col("_pids").isNull() | ~inside_any(
        F.col("_pids"), F.col(lon), F.col(lat)
    )
    return joined.where(keep).drop("_cell", "_pids")


# ---------------------------------------------------------------------------
# kNN + rollups
# ---------------------------------------------------------------------------

def knn_in_cell(
    points: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    point_id: str = "url",
    cand_id: str = "cand_url",
    join_hint: str | None = "auto",
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
    caller's choice via ``salt_hot_cells``.

    ``join_hint="auto"`` (default) resolves per session: no static
    hint under AQE (runtime broadcast/shuffled-hash conversion — see
    :func:`_auto_join_hint`), shuffled-hash when AQE is off.  A
    shuffled-hash build makes a per-partition hash
    map over the candidate side instead of sort-merging: the pair join
    needs no ordering (the window's partial top-k sorts its OWN output
    anyway), so the two join-input sorts are pure waste.  The build
    side per partition is candidates/shuffle-partitions — bounded
    under the density-matched-grid contract, and AQE's skew-join
    splitting (OptimizeSkewedJoin) covers shuffled-hash joins for hot
    cells.  Pass ``None`` to fall back to Catalyst's choice
    (sort-merge) when the candidate side is not density-bounded."""
    joined = _knn_pairs(points, candidates, cand_id, join_hint=join_hint)
    point_cols = [c2 for c2 in points.columns]
    w = W.partitionBy(point_id).orderBy("dist2", cand_id)
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(*point_cols, cand_id, "dist2", "knn_rank")
    )


def _knn_pairs(points, candidates, cand_id, join_hint=None):
    c = candidates.select(
        F.col("cell").alias("c_cell"),
        F.col(cand_id),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
    )
    join_hint = _auto_join_hint(c, join_hint)
    if join_hint:
        c = c.hint(join_hint)
    return points.join(c, points.cell == c.c_cell, "inner").withColumn(
        "dist2",
        (F.col("lon") - F.col("c_lon")) ** 2 + (F.col("lat") - F.col("c_lat")) ** 2,
    )


def neighbor_cells(
    lon: Column, lat: Column, res_deg: float = DEFAULT_RES_DEG
) -> Column:
    """The 3×3 grid-cell neighborhood of a point (own cell + up to 8
    neighbors): longitude wraps at ±180°, latitude bands clamp at the
    poles.  Pure per-row arithmetic — no lookup table, identical in
    ANSI SQL (see the knn_neighborhood oracle).

    ``res_deg`` must divide 180 exactly: with a non-divisor resolution
    the top latitude band (floor(180/res)) falls outside the computed
    row count and its points would silently lose their own cell from
    the probe set — raise instead (all shipped ladders are
    binary/decimal divisors)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols * res_deg != 360 or rows_n * res_deg != 180:
        raise ValueError(
            f"res_deg={res_deg} does not divide 180/360 exactly; the "
            "3x3 probe topology needs an integral grid (use a divisor "
            "resolution, e.g. 9 instead of 8)"
        )
    lat_b = F.floor((lat + F.lit(90.0)) / F.lit(res_deg))
    lon_b = F.floor((lon + F.lit(180.0)) / F.lit(res_deg))
    cells = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb_lat = lat_b + F.lit(dy)
            nb_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            cells.append(
                F.when(
                    (nb_lat >= 0) & (nb_lat < rows_n),
                    (nb_lat * F.lit(cols) + nb_lon).cast("bigint"),
                )
            )
    # distinct: with very coarse grids (≤2 longitude columns) the ±1
    # wraparound collapses probes onto the same cell — a duplicate
    # probe would double-count candidate pairs downstream
    return F.array_distinct(F.array_compact(F.array(*cells)))


def knn_neighborhood(
    points: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    res_deg: float = DEFAULT_RES_DEG,
    point_id: str = "url",
    cand_id: str = "cand_url",
    strategy: str = "window",
    join_hint: str | None = "auto",
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """kNN with 3×3 neighbor-cell probing: like :func:`knn_in_cell`
    but a point also sees candidates in the 8 surrounding cells, so
    nearest neighbors are not lost across a cell boundary (exact for
    any true neighbor within one cell size; the cell-local variant
    misses a candidate 1 m away across an edge).

    Physical strategy: the PROBE side explodes into its ≤9
    neighborhood cells (×9 on the smaller, dirty side — candidates
    stay un-replicated), equi-join on the candidate's single cell,
    then the same window top-k as knn_in_cell.  One shuffle per side;
    at 100 TB the candidate side is bucketed by cell and the exploded
    probe side shuffles to it.

    Inputs carry raw lon/lat; cells are derived here at ``res_deg``
    (both sides must use the same resolution for the probe to be
    sound).

    The longitude delta wraps at ±180°: the probe cells already wrap
    (``neighbor_cells``), so a raw ``lon − c_lon`` would join a true
    antimeridian neighbor with dist2 ≈ (360−ε)² and it could never win
    a top-k slot — the wrapped probe would be ineffective.  dist2 uses
    ``least(|Δlon|, 360−|Δlon|)²`` in both the operator and the DuckDB
    oracle (equirectangular degrees² either way; great-circle metric
    is out of scope, as documented for the whole kNN family).

    ``strategy``: ``"window"`` (pair stream + partial WindowGroupLimit
    — robust to per-cell skew) or ``"agg"`` (sort-free per-cell-array
    plan, :func:`knn_neighborhood_agg` — wins on density-matched grids
    where the window's per-partition pair sort spills under task
    concurrency).  Identical results either way (A/B-tested).

    ``payload_cols``: candidate-side columns carried through to the
    output unchanged (e.g. the clean neighbor's ``lang`` for
    attribution) — they ride inside the top-k machinery instead of a
    second join back to the candidate table, so attribution costs no
    extra shuffle.  Payloads never affect ranking: the order key stays
    (dist2, cand_id) in both strategies (in the agg strategy's struct
    sort the unique cand_id decides before any payload field is
    compared)."""
    if strategy == "agg":
        return knn_neighborhood_agg(
            points, candidates, k=k, res_deg=res_deg,
            point_id=point_id, cand_id=cand_id, join_hint=join_hint,
            payload_cols=payload_cols,
        )
    if strategy != "window":
        raise ValueError(f"unknown strategy {strategy!r}")
    probes = points.withColumn(
        "probe_cell",
        F.explode(neighbor_cells(F.col("lon"), F.col("lat"), res_deg)),
    )
    c = candidates.select(
        grid_cell(F.col("lon"), F.col("lat"), res_deg).alias("c_cell"),
        F.col(cand_id),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
        *[F.col(p) for p in payload_cols],
    )
    join_hint = _auto_join_hint(c, join_hint)
    if join_hint:
        # the pair join needs no ordering (the partial WindowGroupLimit
        # sorts its own output anyway): a shuffled-hash build over the
        # density-bounded candidate side skips both join-input sorts —
        # measured 4.1 → 3.1 s at ×512/8 cores (AQE-off protocol); see
        # knn_in_cell's docstring + _auto_join_hint for the AQE-on path
        c = c.hint(join_hint)
    dlon_raw = F.abs(F.col("lon") - F.col("c_lon"))
    dlon = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
    dlat = F.col("lat") - F.col("c_lat")
    joined = probes.join(c, probes.probe_cell == c.c_cell, "inner").withColumn(
        "dist2", dlon * dlon + dlat * dlat
    )
    point_cols = [c2 for c2 in points.columns]
    w = W.partitionBy(point_id).orderBy("dist2", cand_id)
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(*point_cols, cand_id, "dist2", "knn_rank", *payload_cols)
    )


def knn_neighborhood_agg(
    points: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    res_deg: float = DEFAULT_RES_DEG,
    point_id: str = "url",
    cand_id: str = "cand_url",
    join_hint: str | None = "auto",
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`knn_neighborhood` semantics (3×3 probing, wrapped-lon
    distance, (dist2, id) tie-break) with a SORT-FREE physical
    strategy for density-matched grids.

    The window variant materializes the full (point × neighborhood
    candidate) pair stream and SORTS it per partition to feed the
    partial WindowGroupLimit — at 25.6M points that sort is hundreds
    of MB per task and SPILLS when multiple tasks share executor
    memory (per-task memory shrinks with concurrency), which is
    exactly the asymmetry that tanks N→4N scaling on one box.  Here
    candidates aggregate into per-cell arrays instead (one
    map-side-combined groupBy), the exploded probes join those ~small
    arrays, the per-(point, cell) top-k is computed INSIDE the row
    with native higher-order functions (transform → array_sort →
    slice — whole-stage codegen, no row explosion), and the final
    per-point merge combines ≤9 small arrays via a partially-
    aggregated collect_list.  No pair row is ever materialized, no
    large sort runs anywhere.

    Trade, stated: per-cell collect_list makes a hot cell's array as
    big as its population — correct only when the grid is density-
    matched (the operator's contract everywhere); for skewed planetary
    data at a fixed coarse grid, use the window variant or
    ``salt_hot_cells``/``detect_hot_cells`` first."""
    c_cell = grid_cell(F.col("lon"), F.col("lat"), res_deg)
    cand_cells = candidates.groupBy(c_cell.alias("c_cell")).agg(
        F.collect_list(
            F.struct(
                F.col(cand_id).alias("cid"),
                F.col("lon").alias("clon"),
                F.col("lat").alias("clat"),
                *[F.col(p).alias(p) for p in payload_cols],
            )
        ).alias("cands")
    )
    probes = points.withColumn(
        "probe_cell",
        F.explode(neighbor_cells(F.col("lon"), F.col("lat"), res_deg)),
    )

    def scored(c):
        dlon_raw = F.abs(F.col("lon") - c["clon"])
        dlon = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
        dlat = F.col("lat") - c["clat"]
        # payload fields sit AFTER the unique cand id, so the struct
        # array_sort never reaches them — order stays (dist2, cand)
        return F.struct(
            (dlon * dlon + dlat * dlat).alias("dist2"),
            c["cid"].alias("cand"),
            *[c[p].alias(p) for p in payload_cols],
        )

    join_hint = _auto_join_hint(cand_cells, join_hint)
    if join_hint:
        cand_cells = cand_cells.hint(join_hint)
    point_cols = [c2 for c2 in points.columns]
    tops = probes.join(
        cand_cells, probes.probe_cell == cand_cells.c_cell, "inner"
    ).withColumn(
        "top",
        F.slice(F.array_sort(F.transform("cands", scored)), 1, k),
    )
    merged = tops.groupBy(*point_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("top"))), 1, k
        ).alias("_nn")
    )
    return (
        merged.select(*point_cols, F.posexplode("_nn").alias("_pos", "_n1"))
        .select(
            *point_cols,
            F.col("_n1.cand").alias(cand_id),
            F.col("_n1.dist2").alias("dist2"),
            (F.col("_pos") + 1).alias("knn_rank"),
            *[F.col(f"_n1.{p}").alias(p) for p in payload_cols],
        )
    )


def eps_neighbor_edges(
    points: DataFrame,
    eps_deg: float,
    id_col: str = "url",
    res_deg: float | None = None,
    join_hint: str | None = "auto",
) -> DataFrame:
    """All point pairs within ``eps_deg`` (equirectangular degrees,
    wrapped lon — the kNN family's metric), found by the 3×3
    neighbor-cell probe instead of the quadratic cross join.

    ``res_deg`` (default = ``eps_deg``) must be ≥ ``eps_deg`` or the
    3×3 probe provably misses cross-cell pairs — enforced with a
    ValueError, not a silent recall loss.  Each unordered pair is
    emitted exactly once by construction: the probe of A visits B's
    unique home cell, and ``id_a < id_b`` orients it.  Scale shape is
    knn_neighborhood's: probe side explodes ≤9×, candidates stay
    un-replicated, shuffled-hash pair join, AQE skew split on hot
    cells."""
    if res_deg is None:
        res_deg = eps_deg
    if res_deg < eps_deg:
        raise ValueError(
            f"res_deg={res_deg} < eps_deg={eps_deg}: the 3x3 probe "
            "cannot see all eps-neighbors; use res_deg >= eps_deg"
        )
    probes = points.select(
        F.col(id_col).alias("id_a"),
        F.col("lon"),
        F.col("lat"),
        F.explode(
            neighbor_cells(F.col("lon"), F.col("lat"), res_deg)
        ).alias("probe_cell"),
    )
    cand = points.select(
        grid_cell(F.col("lon"), F.col("lat"), res_deg).alias("c_cell"),
        F.col(id_col).alias("id_b"),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
    )
    join_hint = _auto_join_hint(cand, join_hint)
    if join_hint:
        cand = cand.hint(join_hint)
    dlon_raw = F.abs(F.col("lon") - F.col("c_lon"))
    dlon = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
    dlat = F.col("lat") - F.col("c_lat")
    return (
        probes.join(cand, probes.probe_cell == cand.c_cell)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (dlon * dlon + dlat * dlat <= F.lit(float(eps_deg) ** 2))
        )
        .select("id_a", "id_b")
    )


def radius_join(
    points: DataFrame,
    candidates: DataFrame,
    radius_deg: float,
    point_id: str = "url",
    cand_id: str = "cand_url",
    res_deg: float | None = None,
    join_hint: str | None = "auto",
) -> DataFrame:
    """Two-table spatial radius join: every (point, candidate) pair
    within ``radius_deg`` (wrapped-lon equirectangular degrees — the
    kNN family's metric), with the exact ``dist2`` attached.  The
    general spatial-join primitive :func:`eps_neighbor_edges`
    specializes (self-join, unordered pairs, no distance output).

    Same physical shape as :func:`knn_neighborhood`: the probe side
    explodes into ≤9 neighborhood cells at ``res_deg`` (default =
    ``radius_deg``; must be ≥ it — enforced, same soundness argument
    as eps_neighbor_edges), candidates stay un-replicated and keyed by
    their single home cell, shuffled-hash pair join, exact residual.
    Each pair emits exactly once (the candidate's home cell is
    unique)."""
    if res_deg is None:
        res_deg = radius_deg
    if res_deg < radius_deg:
        raise ValueError(
            f"res_deg={res_deg} < radius_deg={radius_deg}: the 3x3 "
            "probe cannot see all in-radius candidates; use "
            "res_deg >= radius_deg"
        )
    probes = points.select(
        F.col(point_id),
        F.col("lon"),
        F.col("lat"),
        F.explode(
            neighbor_cells(F.col("lon"), F.col("lat"), res_deg)
        ).alias("probe_cell"),
    )
    c = candidates.select(
        grid_cell(F.col("lon"), F.col("lat"), res_deg).alias("c_cell"),
        F.col(cand_id),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
    )
    join_hint = _auto_join_hint(c, join_hint)
    if join_hint:
        c = c.hint(join_hint)
    dlon_raw = F.abs(F.col("lon") - F.col("c_lon"))
    dlon = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
    dlat = F.col("lat") - F.col("c_lat")
    dist2 = dlon * dlon + dlat * dlat
    return (
        probes.join(c, probes.probe_cell == c.c_cell)
        .where(dist2 <= F.lit(float(radius_deg) ** 2))
        .select(point_id, cand_id, dist2.alias("dist2"))
    )


def covered_cells(
    lon_min: Column,
    lon_max: Column,
    lat_min: Column,
    lat_max: Column,
    res_deg: float,
    max_cells: int | None = 256,
) -> Column:
    """All grid cells a lon/lat EXTENT overlaps at ``res_deg``, as an
    array of synthetic cell keys (``lat_band * 1e6 + lon_band`` — pure
    join keys, no 3×3 topology, so no wrap/clamp normalization is
    needed: both sides of a join compute the same floor arithmetic).
    Extents are closed intervals and must not wrap the antimeridian
    (split a wrapping extent into two rows first).

    ``max_cells`` guards the fan-out: a continent-sized extent at a
    fine resolution would silently explode the join (the PBSM
    replication factor is the #cells covered) — the check runs
    per-row in the plan via ``assert_true`` and FAILS the job instead
    of degrading it.  Pass ``None`` to disable."""
    x0 = F.floor((lon_min + F.lit(180.0)) / F.lit(res_deg))
    x1 = F.floor((lon_max + F.lit(180.0)) / F.lit(res_deg))
    y0 = F.floor((lat_min + F.lit(90.0)) / F.lit(res_deg))
    y1 = F.floor((lat_max + F.lit(90.0)) / F.lit(res_deg))
    cells = F.flatten(
        F.transform(
            F.sequence(y0, y1),
            lambda y: F.transform(
                F.sequence(x0, x1),
                lambda x: y * F.lit(1_000_000) + x,
            ),
        )
    )
    if max_cells is not None:
        n = (x1 - x0 + 1) * (y1 - y0 + 1)
        ok = F.assert_true(
            n <= F.lit(int(max_cells)),
            F.concat(
                F.lit(
                    f"extent covers more than max_cells={max_cells} "
                    "grid cells at res_deg="
                ),
                F.lit(str(res_deg)),
                F.lit("; coarsen res_deg or split the extent"),
            ),
        )
        # assert_true yields NULL on success; tying it into the value
        # keeps Catalyst from pruning the check away
        cells = F.when(ok.isNull(), cells)
    return cells


def extent_cell(lon: Column, lat: Column, res_deg: float) -> Column:
    """The single :func:`covered_cells` key containing a POINT — the
    reference-point side of the PBSM dedup."""
    return (
        F.floor((lat + F.lit(90.0)) / F.lit(res_deg)) * F.lit(1_000_000)
        + F.floor((lon + F.lit(180.0)) / F.lit(res_deg))
    )


def extent_overlap_join(
    rects_a: DataFrame,
    rects_b: DataFrame,
    res_deg: float,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_cells: int | None = 256,
    join_hint: str | None = "auto",
) -> DataFrame:
    """Rectangle×rectangle overlap join (closed intervals, shared-edge
    touch counts) — the extent analogue of :func:`radius_join`, via
    the PBSM (Partition-Based Spatial-Merge) grid: each side
    replicates a rect to every grid cell its extent covers, cells
    equi-join, the exact overlap predicate filters, and the classic
    REFERENCE-POINT rule deduplicates WITHOUT a distinct(): a
    qualifying pair is emitted only from the cell containing the
    south-west corner of the intersection — a point inside both
    rects, so exactly one of the joined cells matches and no
    pair-stream shuffle is ever spent on dedup.

    Inputs carry (id, lon_min, lon_max, lat_min, lat_max); extents
    must not wrap the antimeridian.  Output: id_a, id_b, and the
    intersection extent (inter_* columns) computed exactly.

    Scale shape: replication factor is the per-rect covered-cell
    count (guarded by ``max_cells``), the join shuffles once per side
    on the cell key, AQE splits hot cells (dense urban tiles), and
    the no-distinct emission keeps the output pipeline-able into a
    downstream aggregate without a second wide exchange."""
    a = rects_a.select(
        F.col(id_a),
        F.col("lon_min").alias("a_lon_min"),
        F.col("lon_max").alias("a_lon_max"),
        F.col("lat_min").alias("a_lat_min"),
        F.col("lat_max").alias("a_lat_max"),
        F.explode(
            covered_cells(
                F.col("lon_min"), F.col("lon_max"),
                F.col("lat_min"), F.col("lat_max"),
                res_deg, max_cells=max_cells,
            )
        ).alias("a_cell"),
    )
    b = rects_b.select(
        F.col(id_b),
        F.col("lon_min").alias("b_lon_min"),
        F.col("lon_max").alias("b_lon_max"),
        F.col("lat_min").alias("b_lat_min"),
        F.col("lat_max").alias("b_lat_max"),
        F.explode(
            covered_cells(
                F.col("lon_min"), F.col("lon_max"),
                F.col("lat_min"), F.col("lat_max"),
                res_deg, max_cells=max_cells,
            )
        ).alias("b_cell"),
    )
    join_hint = _auto_join_hint(b, join_hint)
    if join_hint:
        b = b.hint(join_hint)
    inter_lon_min = F.greatest("a_lon_min", "b_lon_min")
    inter_lat_min = F.greatest("a_lat_min", "b_lat_min")
    overlaps = (
        (F.col("a_lon_min") <= F.col("b_lon_max"))
        & (F.col("b_lon_min") <= F.col("a_lon_max"))
        & (F.col("a_lat_min") <= F.col("b_lat_max"))
        & (F.col("b_lat_min") <= F.col("a_lat_max"))
    )
    ref_cell = extent_cell(inter_lon_min, inter_lat_min, res_deg)
    return (
        a.join(b, a.a_cell == b.b_cell, "inner")
        .where(overlaps & (F.col("a_cell") == ref_cell))
        .select(
            id_a,
            id_b,
            inter_lon_min.alias("inter_lon_min"),
            F.least("a_lon_max", "b_lon_max").alias("inter_lon_max"),
            inter_lat_min.alias("inter_lat_min"),
            F.least("a_lat_max", "b_lat_max").alias("inter_lat_max"),
        )
    )


def _idiv(a: Column, b: int) -> Column:
    """Exact floor division of a NON-NEGATIVE bigint column by a
    positive int literal, staying in integer arithmetic: ``(a - a%b)/b``
    divides an exact multiple, so the intermediate double division is
    exact for any quotient below 2^53."""
    bl = F.lit(int(b))
    return ((a - F.pmod(a, bl)) / bl).cast("bigint")


def segment_crossing_join(
    segs_a: DataFrame,
    segs_b: DataFrame,
    res_deg: float,
    id_a: str = "id_a",
    id_b: str = "id_b",
    scale: int = 10_000,
    max_cells: int | None = 256,
    join_hint: str | None = "auto",
) -> DataFrame:
    """Segment×segment PROPER-crossing join (road/way intersection
    detection — the line-layer analogue of :func:`extent_overlap_join`)
    with an EXACT integer predicate.

    Inputs carry (id, lon1, lat1, lon2, lat2) in degrees.  Coordinates
    are snapped to fixed-point ``scale`` (default ×10⁴ — the pages
    geocode's native precision, so the snap is exact on this corpus;
    the reference stores node coordinates exactly this way,
    osm.rb F13) and EVERYTHING downstream — grid cells, the crossing
    predicate, the dedup reference point — is int64 arithmetic, so the
    operator and its SQL twin agree bit-for-bit with no float
    epsilons.  Overflow bound: |coord| ≤ 360·scale ⇒ each 2×2 cross
    determinant ≤ 2·(720·scale)², within int64 for scale ≤ 10⁶
    (signs are compared, never products of determinants).

    Semantics: PROPER crossings only — the segments intersect at a
    single interior point of both (strict sign alternation on both
    orientation pairs).  Endpoint touches and collinear overlaps do
    NOT match; they are boundary cases a road-crossing query does not
    want, and excluding them keeps the predicate a pure sign test.

    Plan shape (PBSM, same as the extent join): each segment
    replicates to the grid cells its bbox covers (``max_cells``
    fan-out guard fails loud via ``assert_true`` — a near-antipodal
    segment's bbox at a fine grid would silently explode the join),
    one hash shuffle per side on the cell key, exact predicate as the
    join residual, and the classic reference-point rule dedups
    WITHOUT a distinct(): the pair is emitted only from the cell
    containing the SW corner of the two bboxes' intersection — a
    point inside both bboxes, computed in the SAME int arithmetic as
    the cell assignment, so exactly one joined cell matches.

    Output: id_a, id_b, and the crossing point (ix, iy in degrees) —
    the exact rational intersection evaluated with one double
    division; at a proper crossing the denominator is the (nonzero)
    int determinant.
    """
    if res_deg * scale != int(res_deg * scale):
        raise ValueError("res_deg * scale must be integral")
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 cross bound")
    cell_u = int(res_deg * scale)
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))

    def prep(df, p, idc):
        out = df.select(
            F.col(idc),
            F.round(F.col("lon1") * sc).cast("bigint").alias(f"{p}x1"),
            F.round(F.col("lat1") * sc).cast("bigint").alias(f"{p}y1"),
            F.round(F.col("lon2") * sc).cast("bigint").alias(f"{p}x2"),
            F.round(F.col("lat2") * sc).cast("bigint").alias(f"{p}y2"),
        )
        x0 = _idiv(F.least(f"{p}x1", f"{p}x2") + offx, cell_u)
        x1 = _idiv(F.greatest(f"{p}x1", f"{p}x2") + offx, cell_u)
        y0 = _idiv(F.least(f"{p}y1", f"{p}y2") + offy, cell_u)
        y1 = _idiv(F.greatest(f"{p}y1", f"{p}y2") + offy, cell_u)
        cells = F.flatten(
            F.transform(
                F.sequence(y0, y1),
                lambda yy: F.transform(
                    F.sequence(x0, x1),
                    lambda xx: yy * F.lit(1_000_000) + xx,
                ),
            )
        )
        if max_cells is not None:
            n = (x1 - x0 + 1) * (y1 - y0 + 1)
            ok = F.assert_true(
                n <= F.lit(int(max_cells)),
                F.lit(
                    f"segment bbox covers more than max_cells={max_cells} "
                    f"cells at res_deg={res_deg}; coarsen the grid or "
                    "split the segment"
                ),
            )
            cells = F.when(ok.isNull(), cells)
        return out.withColumn(f"{p}cell", F.explode(cells))

    a = prep(segs_a, "a", id_a)
    b = prep(segs_b, "b", id_b)
    join_hint = _auto_join_hint(b, join_hint)
    if join_hint:
        b = b.hint(join_hint)

    def cross(px, py, qx, qy, rx, ry):
        return (F.col(qx) - F.col(px)) * (F.col(ry) - F.col(py)) - (
            F.col(qy) - F.col(py)
        ) * (F.col(rx) - F.col(px))

    o1 = cross("ax1", "ay1", "ax2", "ay2", "bx1", "by1")
    o2 = cross("ax1", "ay1", "ax2", "ay2", "bx2", "by2")
    o3 = cross("bx1", "by1", "bx2", "by2", "ax1", "ay1")
    o4 = cross("bx1", "by1", "bx2", "by2", "ax2", "ay2")
    crossing = (F.signum(o1) * F.signum(o2) < 0) & (
        F.signum(o3) * F.signum(o4) < 0
    )
    ref_x = F.greatest(
        F.least("ax1", "ax2"), F.least("bx1", "bx2")
    )
    ref_y = F.greatest(
        F.least("ay1", "ay2"), F.least("by1", "by2")
    )
    ref_cell = (
        _idiv(ref_y + offy, cell_u) * F.lit(1_000_000)
        + _idiv(ref_x + offx, cell_u)
    )
    # exact rational crossing point: B1 + (B2-B1)·o1/(o1-o2), one
    # double division (denominator o1-o2 ≠ 0 at a proper crossing)
    t = o1.cast("double") / (o1 - o2).cast("double")
    ix = (F.col("bx1").cast("double") + (F.col("bx2") - F.col("bx1")).cast("double") * t) / sc
    iy = (F.col("by1").cast("double") + (F.col("by2") - F.col("by1")).cast("double") * t) / sc
    return (
        a.join(b, F.col("acell") == F.col("bcell"), "inner")
        .where(crossing & (F.col("acell") == ref_cell))
        .select(
            id_a,
            id_b,
            ix.alias("ix"),
            iy.alias("iy"),
        )
    )


def nearest_attribution(
    points: DataFrame,
    candidates: DataFrame,
    res_deg: float = DEFAULT_RES_DEG,
    point_id: str = "url",
    cand_id: str = "cand_url",
    payload_cols: tuple[str, ...] = (),
    join_hint: str | None = "auto",
) -> DataFrame:
    """Nearest-clean-version attribution: for each point, the SINGLE
    nearest candidate within the 3×3 cell neighborhood (wrapped-lon
    equirectangular dist², (dist2, cand_id) tie-break — the kNN
    family's exact metric and order), with ``payload_cols`` from the
    winning candidate attached.

    This is 1-NN as a pure MIN-aggregation rather than a window top-k:
    ``min(struct(dist2, cand_id, payload…))`` is lexicographic over
    the struct and partial-aggregates map-side, so the exchange
    carries AT MOST ONE candidate per (point, task) — no rank column,
    no WindowGroupLimit machinery.  Plan shape, stated honestly: a
    struct buffer is not hash-aggregable, so Spark picks a partial
    SortAggregate (local sort on the grouping key only — same
    local-sort cost class as the window variant's partial
    WindowGroupLimit, but a k× smaller shuffle payload and no rank
    evaluation).  ``knn_neighborhood(k=1)`` gives identical rows; this
    shape exists because argmin-without-rank is the common attribution
    case (the reference walks each element's history to find the last
    clean version to revert to, change_bot.rb:115-160; the spatial
    analogue attributes a tainted page to its nearest accepted page).

    Points with an empty neighborhood drop out (inner join), same as
    the kNN family.  Ties beyond (dist2, cand_id) cannot occur while
    cand_id is unique — payload fields sit after it in the struct and
    never decide the min."""
    probes = points.withColumn(
        "probe_cell",
        F.explode(neighbor_cells(F.col("lon"), F.col("lat"), res_deg)),
    )
    c = candidates.select(
        grid_cell(F.col("lon"), F.col("lat"), res_deg).alias("c_cell"),
        F.col(cand_id),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
        *[F.col(p) for p in payload_cols],
    )
    join_hint = _auto_join_hint(c, join_hint)
    if join_hint:
        c = c.hint(join_hint)
    dlon_raw = F.abs(F.col("lon") - F.col("c_lon"))
    dlon = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
    dlat = F.col("lat") - F.col("c_lat")
    point_cols = list(points.columns)
    best = (
        probes.join(c, probes.probe_cell == c.c_cell, "inner")
        .groupBy(*point_cols)
        .agg(
            F.min(
                F.struct(
                    (dlon * dlon + dlat * dlat).alias("dist2"),
                    F.col(cand_id).alias("cand"),
                    *[F.col(p).alias(p) for p in payload_cols],
                )
            ).alias("_b")
        )
    )
    return best.select(
        *point_cols,
        F.col("_b.cand").alias(cand_id),
        F.col("_b.dist2").alias("dist2"),
        *[F.col(f"_b.{p}").alias(p) for p in payload_cols],
    )


def knn_attribute_mode(
    points: DataFrame,
    candidates: DataFrame,
    attr_col: str,
    k: int = 3,
    res_deg: float = DEFAULT_RES_DEG,
    point_id: str = "url",
    cand_id: str = "cand_url",
    strategy: str = "window",
    join_hint: str | None = "auto",
) -> DataFrame:
    """Majority-vote attribution: each point takes the MODAL value of
    ``attr_col`` among its k nearest candidates (3×3-probed, wrapped
    lon — :func:`knn_neighborhood` order), deterministically: most
    votes wins, ties break to the lexicographically smallest attribute
    value.  Output: point_id, attr_col, votes.

    The attribute rides through the kNN as a payload column (no join
    back to the candidate table), then two partial-aggregating
    groupBys — count per (point, value), then ``min(struct(-votes,
    value))`` for the deterministic mode.  Spark's native ``mode()``
    is tie-nondeterministic, which would break driver/oracle parity;
    the struct-min is exactly reproducible in ANSI SQL."""
    knn = knn_neighborhood(
        points, candidates, k=k, res_deg=res_deg, point_id=point_id,
        cand_id=cand_id, strategy=strategy, join_hint=join_hint,
        payload_cols=(attr_col,),
    )
    counts = knn.groupBy(point_id, attr_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    return (
        counts.groupBy(point_id)
        .agg(
            F.min(
                F.struct(
                    (-F.col("votes")).alias("_nv"),
                    F.col(attr_col).alias("_a"),
                )
            ).alias("_m")
        )
        .select(
            point_id,
            F.col("_m._a").alias(attr_col),
            (-F.col("_m._nv")).alias("votes"),
        )
    )


def eps_clusters(
    points: DataFrame,
    eps_deg: float,
    id_col: str = "url",
    res_deg: float | None = None,
    max_iters: int = 12,
) -> DataFrame:
    """Density-connectivity clustering (the DBSCAN ε-graph with
    min_pts=1, i.e. single-linkage at radius ε): connected components
    of :func:`eps_neighbor_edges`, label = component min id.

    Propagation is min-label over the symmetrized edge list PLUS
    pointer jumping each round (label ← label[label], the parallel
    union-find path-halving step), so convergence is O(log diameter)
    rounds even for the chain-shaped components real geodata produces
    (a road of points each within ε of the next) — plain edge-hop
    propagation alone needs O(diameter) rounds, a 100-TB scale-killer
    on long chains.  Lineage is cut per round (localCheckpoint, the
    cascade/LSH staged pattern) because labels self-reference; early
    exit on zero changes, and exhaustion WARNS (no silent wrong
    clusters — minhash_lsh_clusters' contract).

    Every input point appears in the output; ε-isolated points are
    singleton clusters labeled by their own id."""
    edges = eps_neighbor_edges(
        points, eps_deg, id_col=id_col, res_deg=res_deg
    )
    labels = _min_label_components(
        points.select(F.col(id_col).alias("id")).distinct(),
        edges,
        max_iters=max_iters,
        op_name="eps_clusters",
    )
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def dbscan(
    points: DataFrame,
    eps_deg: float,
    min_pts: int,
    id_col: str = "url",
    res_deg: float | None = None,
    max_iters: int = 12,
) -> DataFrame:
    """Full DBSCAN over the ε-graph: ``role`` ∈ {core, border, noise}
    and a nullable ``cluster_id``.

    * **core** — at least ``min_pts`` points within ε (the point
      itself counts, the standard convention); clusters are connected
      components of the core-core ε-edges (same pointer-jumping
      propagation as :func:`eps_clusters`), labeled by component min.
    * **border** — non-core with ≥1 core ε-neighbor; classic DBSCAN
      assigns it to whichever core claims it first (scan-order
      dependent!), here deterministically to the MIN cluster id among
      its core neighbors — documented replacement, same cluster set.
    * **noise** — everything else; ``cluster_id`` is NULL.

    Everything derives from ONE :func:`eps_neighbor_edges` pass
    (localCheckpointed): degrees are a groupBy over the symmetrized
    edges, core filtering is a semi-join, and border assignment is a
    single join from non-core edge endpoints to core labels — no
    second spatial join anywhere."""
    if min_pts < 1:
        raise ValueError(f"min_pts={min_pts} must be >= 1")
    edges = eps_neighbor_edges(
        points, eps_deg, id_col=id_col, res_deg=res_deg
    ).localCheckpoint(eager=True)
    ids = points.select(F.col(id_col).alias("id")).distinct()
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("_nb"))
    counts = ids.join(deg, ids.id == deg.src, "left").select(
        "id", (F.coalesce(F.col("_nb"), F.lit(0)) + 1).alias("n_in_eps")
    )
    core_ids = counts.where(F.col("n_in_eps") >= min_pts).select("id")
    core_edges = (
        edges.join(core_ids.withColumnRenamed("id", "id_a"), "id_a", "semi")
        .join(core_ids.withColumnRenamed("id", "id_b"), "id_b", "semi")
    )
    core_labels = _min_label_components(
        core_ids, core_edges, max_iters=max_iters, op_name="dbscan"
    )
    border = (
        sym.join(
            core_ids.withColumnRenamed("id", "dst"), "dst", "semi"
        )  # edges INTO a core
        .join(
            core_ids.withColumnRenamed("id", "src"), "src", "anti"
        )  # from a non-core
        .join(core_labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src")
        .agg(F.min("label").alias("_border_label"))
    )
    return (
        ids.join(core_labels, "id", "left")
        .join(border.withColumnRenamed("src", "id"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("label").isNotNull(), F.lit("core"))
            .when(F.col("_border_label").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("label"), F.col("_border_label")).alias(
                "cluster_id"
            ),
        )
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


def tile_rollup_merge(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two :func:`tile_rollup` outputs into the rollup of the
    union of their inputs — the incremental-processing contract of the
    Iceberg snapshot story (SURVEY §3): a new crawl delta re-aggregates
    against yesterday's materialized rollup instead of rescanning the
    corpus, because count/sum are MERGEABLE aggregates and density is
    re-derived from the merged exact integers (never averaged —
    averaging densities is the classic wrong answer the tests pin).

    Cost: one shuffle over |cells| aggregate rows (map-side combined),
    independent of corpus size.  Exactness: merge(rollup(A), rollup(B))
    == rollup(A ∪ B) bit-for-bit for disjoint A/B — asserted in tests
    and, via the q_tile_rollup_incremental oracle, against a DuckDB
    twin that computes the FULL rollup directly."""
    cols = ["cell", "n_pages", "n_tainted"]
    u = base.select(*cols).unionByName(delta.select(*cols))
    agg = u.groupBy("cell").agg(
        F.sum("n_pages").alias("n_pages"),
        F.sum("n_tainted").alias("n_tainted"),
    )
    return agg.withColumn(
        "taint_density",
        F.round(F.col("n_tainted").cast("double") / F.col("n_pages"), 6),
    )


def tile_focal_stats(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    scale: int = 1_000_000,
) -> DataFrame:
    """3×3 focal (moving-window) statistics over a per-cell raster:
    for every input cell, the count / sum / scaled mean of
    ``value_col`` across the up-to-9 INPUT cells in its neighborhood
    (itself included).  Longitude columns wrap at ±180°, latitude rows
    clamp at the poles — same topology as :func:`neighbor_cells`, but
    derived from the CELL ID by integer div/mod (no lon/lat needed).

    The classic raster smoothing pass (focal mean / kernel density at
    kernel=1), run on the *aggregate* raster: after ``tile_rollup``
    the input is |cells| rows, so the ×9 fan-out shuffles ~9·|cells| —
    never the point table.  Mean is ``(sum · scale) DIV n`` in exact
    int64 (``value_col`` must be integral; sums of per-cell counts stay
    far below 2⁶³ / scale at any real raster size... at 10¹² points and
    scale 10⁶ the per-neighborhood sum bound is 2⁴³, checked math, not
    hope).  Cells absent from the input contribute nothing and produce
    no output row (the raster's support does not dilate — output keys
    are semi-joined back to the input)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    targets = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            targets.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    # distinct for ultra-coarse grids where lon wrap collapses columns
    fan = cells.select(
        F.col(value_col).alias("_v"),
        F.explode(
            F.array_distinct(F.array_compact(F.array(*targets)))
        ).alias("t_cell"),
    )
    agg = fan.groupBy("t_cell").agg(
        F.count(F.lit(1)).alias("n_nbrs"),
        F.sum("_v").alias("nbr_sum"),
    )
    out = cells.select(F.col("cell")).join(
        agg, cells.cell == agg.t_cell, "inner"
    )
    return out.select(
        "cell",
        "n_nbrs",
        "nbr_sum",
        F.expr(f"(nbr_sum * {int(scale)}) DIV n_nbrs").alias("focal_mean_m"),
    )


def tile_hotspots(
    cells: DataFrame,
    value_col: str = "n_pages",
    res_deg: float = DEFAULT_RES_DEG,
    z_num: int = 2,
    z_den: int = 1,
) -> DataFrame:
    """Getis-Ord Gi* hot/cold-spot classification over the aggregate
    raster — the local spatial statistic behind every "where is
    activity anomalously dense" map (the inferential upgrade of
    detect_hot_cells' plain quantile cut: a cell is HOT only when its
    3×3 neighborhood sum exceeds the global mean by ≥ z standard
    errors under the randomization null).

    Exactness: the Gi* z-score is float-and-sqrt territory, so instead
    of computing z the operator evaluates the EQUIVALENT cross-
    multiplied integer inequality

        hot  ⟺  A > 0  ∧  A²·(N−1)·z_den² ≥ z_num²·X·Y
        cold ⟺  A < 0  ∧  same magnitude test
        A = N·S_i − T·nᵢ,  X = N·SS − T²,  Y = N·nᵢ − nᵢ²

    (S_i focal sum, nᵢ neighborhood size, N cells, T total, SS sum of
    squares) with the wide products in decimal(38,0) — Spark's decimal
    math and DuckDB's HUGEINT both evaluate them exactly, so the flag
    is hash-stable across engines.  Headroom: A²·N·z_den² tops out
    ~10³⁶ at N=10⁸ cells, T=10¹² points, 10× hotspots — inside
    decimal(38)'s 10³⁸ with two digits to spare (bounds are per-term,
    stated so a 1000× scale-up re-checks them, the polygon_stats
    discipline).

    Plan: tile_focal_stats' one ×9 aggregate-raster fan-out + one
    global 1-row aggregate broadcast-cross-joined back — the point
    table is never touched.  Neighborhood support follows the raster
    (absent cells contribute nothing), the standard Gi* convention on
    sparse rasters.

    Returns (cell, n_nbrs, nbr_sum, gi_num=A, hot, cold)."""
    dec = "decimal(38,0)"
    # the aggregate raster is consumed THREE times below (focal fan,
    # focal's support semi-join, global moments) — without a checkpoint
    # the upstream rollup (a full pass over the point table) runs once
    # per consumer; the raster is |cells| rows, so materializing it is
    # the cheap side of that trade at any scale
    cells = cells.localCheckpoint(eager=True)
    focal = tile_focal_stats(cells, value_col, res_deg).select(
        "cell", "n_nbrs", "nbr_sum"
    )
    tot = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(value_col).cast("bigint").alias("tot_v"),
        F.sum(F.col(value_col).cast(dec) * F.col(value_col))
        .cast(dec).alias("tot_sq"),
    )
    j = focal.crossJoin(F.broadcast(tot))
    a = (
        F.col("n_cells").cast(dec) * F.col("nbr_sum")
        - F.col("tot_v").cast(dec) * F.col("n_nbrs")
    )
    x = (
        F.col("n_cells").cast(dec) * F.col("tot_sq")
        - F.col("tot_v").cast(dec) * F.col("tot_v")
    )
    y = (
        F.col("n_cells").cast(dec) * F.col("n_nbrs")
        - F.col("n_nbrs").cast(dec) * F.col("n_nbrs")
    )
    sig = (
        a * a * (F.col("n_cells").cast(dec) - 1) * F.lit(z_den * z_den)
        >= F.lit(z_num * z_num).cast(dec) * x * y
    )
    return j.select(
        "cell",
        "n_nbrs",
        "nbr_sum",
        a.cast("bigint").alias("gi_num"),
        (sig & (a > 0)).alias("hot"),
        (sig & (a < 0)).alias("cold"),
    )


def tile_trend(
    pages_with_cells: DataFrame,
    time_col: str = "version",
    n_bins: int = 4,
    min_s: int = 2,
) -> DataFrame:
    """Mann-Kendall trend classification per cell — the temporal
    companion of :func:`tile_hotspots` (ArcGIS calls the pair
    "emerging hotspot analysis"): is a cell's activity RISING or
    FALLING across time bins, judged by the rank-based S statistic

        S = Σ_{i<j} sign(cₜⱼ − cₜᵢ)   over bins 1..n_bins

    which is pure integer arithmetic (no mean, no variance, no float)
    and immune to outlier magnitudes.  Bins a cell never saw count as
    ZERO activity — the series is densified per cell, the standard MK
    convention on count series (skipping absent bins would silently
    turn "appeared recently" into "flat").

    ``trend`` is 'up' if S ≥ ``min_s``, 'down' if S ≤ −min_s, else
    'flat'; with n_bins=4, |S| ≤ 6 and min_s=2 ≈ one-sided p<0.2 under
    the permutation null — callers wanting significance pass a larger
    min_s (the full normal-approximation variance needs tie terms;
    over a 4-to-12-bin series the exact integer threshold is both
    simpler and honest).

    Plan: counts aggregate per (cell, bin) first (the point table's
    only shuffle); densify via one explode(sequence) on the DISTINCT
    cell list; the pairwise sign sum fans each cell ×n_bins(n_bins−1)/2
    on the AGGREGATE (6 rows per cell at 4 bins) via a bin range-join
    that Spark broadcasts.  Returns (cell, s_stat, trend)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be ≥ 2, got {n_bins}")
    counts = pages_with_cells.groupBy(
        "cell", F.col(time_col).cast("int").alias("_bin")
    ).agg(F.count(F.lit(1)).alias("_c"))
    dense = (
        counts.select("cell").distinct()
        .select(
            "cell",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(n_bins)))
            ).alias("_bin"),
        )
        .join(counts, ["cell", "_bin"], "left")
        .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
    )
    a = dense.select(
        "cell", F.col("_bin").alias("_bi"), F.col("_c").alias("_ci")
    )
    b = dense.select(
        F.col("cell").alias("_cell2"),
        F.col("_bin").alias("_bj"),
        F.col("_c").alias("_cj"),
    )
    pairs = a.join(
        b,
        (a.cell == F.col("_cell2")) & (F.col("_bi") < F.col("_bj")),
    )
    s = pairs.groupBy("cell").agg(
        F.sum(F.signum(F.col("_cj") - F.col("_ci")).cast("int"))
        .cast("bigint")
        .alias("s_stat")
    )
    return s.select(
        "cell",
        "s_stat",
        F.when(F.col("s_stat") >= min_s, F.lit("up"))
        .when(F.col("s_stat") <= -min_s, F.lit("down"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
    )


def tile_trend_sql(
    src: str, time_col: str = "version", n_bins: int = 4, min_s: int = 2
) -> str:
    """DuckDB twin of :func:`tile_trend`; ``src`` must expose cell +
    ``time_col`` (one row per page).  Standalone statement."""
    return "WITH " + tile_trend_ctes(src, time_col, n_bins, min_s)


def tile_trend_ctes(
    src: str, time_col: str = "version", n_bins: int = 4, min_s: int = 2,
    final_cte: str | None = None,
) -> str:
    """The twin without the leading WITH (oracle-prelude appendable).
    With ``final_cte`` the trailing SELECT is wrapped as one more CTE
    of that name so the block composes into larger twins
    (emerging_hotspots)."""
    body = _tile_trend_body(src, time_col, n_bins, min_s)
    if final_cte is None:
        return body
    head, _, tail = body.rpartition("SELECT cell, s_stat,")
    return (
        head
        + f", {final_cte} AS (\n            SELECT cell, s_stat,"
        + tail
        + "\n        )"
    )


def _tile_trend_body(
    src: str, time_col: str, n_bins: int, min_s: int
) -> str:
    return f"""
        mk_counts AS (
            SELECT cell, CAST({time_col} AS INTEGER) AS b,
                   COUNT(*) AS c
            FROM {src} GROUP BY 1, 2
        ),
        mk_dense AS (
            SELECT g.cell, g.b, COALESCE(mk_counts.c, 0) AS c
            FROM (
                SELECT DISTINCT cell, UNNEST(range(1, {n_bins} + 1)) AS b
                FROM mk_counts
            ) g
            LEFT JOIN mk_counts USING (cell, b)
        ),
        mk_s AS (
            SELECT i.cell,
                   CAST(SUM(SIGN(j.c - i.c)) AS BIGINT) AS s_stat
            FROM mk_dense i
            JOIN mk_dense j ON i.cell = j.cell AND i.b < j.b
            GROUP BY i.cell
        )
        SELECT cell, s_stat,
               CASE WHEN s_stat >= {min_s} THEN 'up'
                    WHEN s_stat <= -{min_s} THEN 'down'
                    ELSE 'flat' END AS trend
        FROM mk_s
    """


def od_flows(
    points: DataFrame,
    id_col: str,
    order_col: str,
    res_deg: float = 4.0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Origin-destination flow matrix: consecutive point pairs of each
    ordered track, rolled up to (cell_from, cell_to) counts — the
    standard mobility/flow aggregation (desire-line maps, recrawl
    routing between regions), and the directed-graph view of the same
    track layer ``polyline_length`` and ``trip_segments`` measure.

    Self-flows (both endpoints in one cell) are KEPT and flagged
    (``intra``) rather than dropped — at coarse resolutions they are
    the majority of movement and dropping them silently would misstate
    totals (Σ n_flows == Σ per-track segments, asserted in tests).

    Plan: one LAG window per (id, order) — the single shuffle of the
    point table — then a map-side-combining groupBy on the cell pair.
    Output: cell_from, cell_to, n_flows, intra."""
    wu = W.partitionBy(id_col).orderBy(order_col)
    cells = points.select(
        F.col(id_col),
        grid_cell(F.col(lon), F.col(lat), res_deg).alias("_cell"),
        F.col(order_col),
    ).select(
        "_cell",
        F.lag("_cell").over(wu).alias("_pcell"),
    )
    return (
        cells.where(F.col("_pcell").isNotNull())
        .groupBy(
            F.col("_pcell").alias("cell_from"),
            F.col("_cell").alias("cell_to"),
        )
        .agg(F.count(F.lit(1)).alias("n_flows"))
        .withColumn("intra", F.col("cell_from") == F.col("cell_to"))
    )


def od_flows_sql(
    src: str,
    id_col: str,
    order_col: str,
    res_deg: float = 4.0,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """DuckDB twin of :func:`od_flows` (standalone SELECT)."""
    cell = grid_cell_sql(lon, lat, res_deg)
    return f"""
        SELECT _pcell AS cell_from, _cell AS cell_to,
               COUNT(*) AS n_flows,
               (_pcell = _cell) AS intra
        FROM (
            SELECT {cell} AS _cell,
                   LAG({cell}) OVER (PARTITION BY {id_col}
                                     ORDER BY {order_col}) AS _pcell
            FROM {src}
        )
        WHERE _pcell IS NOT NULL
        GROUP BY 1, 2
    """


def tile_join_counts(
    cells: DataFrame,
    flag_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Global join-count statistic over a binary raster — the classic
    test for spatial autocorrelation of a two-color map (Cliff & Ord):
    count queen-adjacent cell pairs by color class, BB (both flagged),
    WW (neither), BW (mixed).  Clustered taint shows as BB ≫ expected
    and BW ≪; a checkerboard inverts it.  The GLOBAL companion of the
    local :func:`tile_hotspots` — same raster, opposite scope — and
    all plain integers, so the DuckDB twin hash-matches without any
    variance approximation (callers compare against the permutation
    null themselves; the raw counts are the sufficient statistics).

    Adjacency = queen (8-neighbor) among PRESENT cells only, each
    undirected pair counted ONCE: every cell emits its 4 "forward"
    neighbors (E, SW, S, SE) and the pair is joined against the
    raster, so a pair appears exactly once — by its west/north member.
    Longitude wraps at ±180°; requires ≥ 5 grid columns so a forward
    wrap can't re-emit a pair its partner already emitted (raises
    otherwise — degenerate 1-4-column planets are display toys).

    Plan: the ×4 fan-out runs on the AGGREGATE raster and the join
    back is an equi-join on the neighbor cell id; one final 1-row
    aggregation.  Output: (n_cells, n_pairs, bb, bw, ww)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "for once-per-pair forward adjacency under lon wrap"
        )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    fwd = []
    for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
        t_lat = lat_b + F.lit(dy)
        t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
        fwd.append(
            F.when(
                (t_lat >= 0) & (t_lat < rows_n),
                (t_lat * F.lit(cols) + t_lon).cast("bigint"),
            )
        )
    fan = cells.select(
        F.col(flag_col).cast("int").alias("_b1"),
        F.explode(F.array_compact(F.array(*fwd))).alias("_nbr"),
    )
    paired = fan.join(
        cells.select(
            F.col("cell").alias("_nbr"),
            F.col(flag_col).cast("int").alias("_b2"),
        ),
        "_nbr",
    )
    n_cells = cells.count()
    return paired.agg(
        F.lit(n_cells).cast("bigint").alias("n_cells"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(F.col("_b1") * F.col("_b2")), F.lit(0))
        .cast("bigint").alias("bb"),
        F.coalesce(
            F.sum((F.col("_b1") + F.col("_b2") == 1).cast("int")),
            F.lit(0),
        ).cast("bigint").alias("bw"),
        F.coalesce(
            F.sum(((F.col("_b1") == 0) & (F.col("_b2") == 0)).cast("int")),
            F.lit(0),
        ).cast("bigint").alias("ww"),
    )


def tile_join_counts_sql(
    src: str, flag_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`tile_join_counts`; ``src`` must expose
    cell + ``flag_col`` (boolean), one row per present cell."""
    return "WITH " + tile_join_counts_ctes(src, flag_col, res_deg)


def tile_join_counts_ctes(
    src: str, flag_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """The twin without the leading WITH (oracle-prelude appendable)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    return f"""
        jc_src AS (
            SELECT cell, CAST({flag_col} AS INTEGER) AS b FROM {src}
        ),
        jc_fan AS (
            SELECT s.b AS b1,
                   (((s.cell // {cols}) + d.dy) * {cols}
                    + ((s.cell % {cols}) + d.dx + {cols}) % {cols}) AS nbr
            FROM jc_src s CROSS JOIN (VALUES
                 (0,1),(1,-1),(1,0),(1,1)) d(dy, dx)
            WHERE (s.cell // {cols}) + d.dy >= 0
              AND (s.cell // {cols}) + d.dy < {rows_n}
        ),
        jc_pairs AS (
            SELECT f.b1, s.b AS b2
            FROM jc_fan f JOIN jc_src s ON s.cell = f.nbr
        )
        SELECT (SELECT COUNT(*) FROM jc_src) AS n_cells,
               COUNT(*) AS n_pairs,
               CAST(COALESCE(SUM(b1 * b2), 0) AS BIGINT) AS bb,
               CAST(COALESCE(SUM(CASE WHEN b1 + b2 = 1 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS bw,
               CAST(COALESCE(SUM(CASE WHEN b1 = 0 AND b2 = 0
                                      THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS ww
        FROM jc_pairs
    """


def tile_dilate(
    cells: DataFrame, res_deg: float = DEFAULT_RES_DEG
) -> DataFrame:
    """Morphological DILATION of the raster support: every cell within
    one queen step of an occupied cell (occupied cells included) — the
    buffer/halo pass of raster algebra (coverage maps, search-region
    expansion before an expensive exact join; the raster sibling of
    covered_cells' vector buffers).  Same wrap/clamp topology as
    :func:`tile_focal_stats`, same aggregate-only cost (×9 fan on
    |cells| rows, one distinct-by-groupBy).  Output: (cell,
    n_sources) where n_sources = how many occupied cells reach it —
    the dilation with multiplicity, so erosion/opening compose from
    the same pass."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    targets = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            targets.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = cells.select(
        F.explode(
            F.array_distinct(F.array_compact(F.array(*targets)))
        ).alias("cell")
    )
    return fan.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_sources")
    )


def tile_erode(
    cells: DataFrame, res_deg: float = DEFAULT_RES_DEG
) -> DataFrame:
    """Morphological EROSION: occupied cells whose ENTIRE queen
    neighborhood (every in-bounds neighbor; pole rows have smaller
    neighborhoods by construction) is also occupied — the interior of
    the support, whose complement against the input is the raster
    BOUNDARY.  Computed from the SAME fan as :func:`tile_dilate` by
    counting occupied neighbors and comparing against the cell's own
    in-bounds neighborhood size (wrap-aware, no densified grid).
    Output: the surviving (cell) rows."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 3:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; erosion "
            "needs ≥ 3 so the 8 queen neighbors are distinct cells"
        )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    # in-bounds neighborhood size: 9, minus 3 per clamped lat row
    nbhd = (
        F.lit(9)
        - F.when(lat_b == 0, 3).otherwise(0)
        - F.when(lat_b == rows_n - 1, 3).otherwise(0)
    )
    focal = tile_focal_stats(
        cells.withColumn("_one", F.lit(1)), "_one", res_deg
    ).select("cell", "n_nbrs")
    return (
        focal.join(cells.select("cell"), "cell")
        .where(F.col("n_nbrs") == nbhd)
        .select("cell")
    )


def tile_morphology_sql(
    src: str, op: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`tile_dilate` / :func:`tile_erode`
    (``op`` ∈ {'dilate', 'erode'}); ``src`` exposes one ``cell`` row
    per occupied cell.  Standalone statement."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    fan = f"""
        SELECT s.cell AS src_cell,
               (((s.cell // {cols}) + d.dy) * {cols}
                + ((s.cell % {cols}) + d.dx + {cols}) % {cols}) AS cell
        FROM {src} s CROSS JOIN (VALUES
             (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
             (1,-1),(1,0),(1,1)) d(dy, dx)
        WHERE (s.cell // {cols}) + d.dy >= 0
          AND (s.cell // {cols}) + d.dy < {rows_n}
    """
    if op == "dilate":
        return (
            f"SELECT cell, COUNT(DISTINCT src_cell) AS n_sources "
            f"FROM ({fan}) GROUP BY 1"
        )
    if op == "erode":
        return f"""
            SELECT f.cell FROM ({fan}) f
            JOIN {src} o ON o.cell = f.cell
            GROUP BY f.cell
            HAVING COUNT(DISTINCT f.src_cell) =
                   9 - (CASE WHEN f.cell // {cols} = 0 THEN 3 ELSE 0 END)
                     - (CASE WHEN f.cell // {cols} = {rows_n - 1}
                             THEN 3 ELSE 0 END)
        """
    raise ValueError(f"op must be 'dilate' or 'erode', got {op!r}")


def grid_cell_center(
    cell, res_deg: float = DEFAULT_RES_DEG
) -> tuple[Column, Column]:
    """(lon, lat) center of a row-major :func:`grid_cell` id — exact
    dyadic arithmetic at power-of-two-friendly resolutions (0.25°:
    ±0.125 offsets are exact doubles), so both engines compute
    identical centers."""
    cols = int(360 / res_deg)
    c = F.col(cell) if isinstance(cell, str) else cell
    lon = ((c % F.lit(cols)).cast("double") + 0.5) * F.lit(res_deg) \
        - F.lit(180.0)
    lat = (F.floor(c / F.lit(cols)).cast("double") + 0.5) * F.lit(res_deg) \
        - F.lit(90.0)
    return lon, lat


def zonal_stats(
    raster: DataFrame,
    polygons,
    value_cols: "Sequence[str]" = ("n_pages", "n_tainted"),
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Zonal statistics — the polygon×raster overlay that closes the
    raster↔vector loop (north star: "raster↔vector rollups of taint
    density per tile"): aggregate each polygon's raster cells by the
    CENTER-containment rule (a cell belongs to the polygon containing
    its center — the standard GDAL/PostGIS zonal convention; no
    partial-cell area weighting, stated rather than approximated).

    Runs entirely on the AGGREGATE raster: centers are exact dyadic
    arithmetic from the cell id (:func:`grid_cell_center`), the PIP is
    the broadcast even-odd ray cast over candidate centers only, and
    the final rollup is one groupBy over |cells-in-bbox| rows — corpus
    bytes are never touched.  Output: polygon_id, n_cells, plus
    sum_<col> for every value column."""
    lon_c, lat_c = grid_cell_center("cell", res_deg)
    centered = raster.withColumn("_clon", lon_c).withColumn("_clat", lat_c)
    assigned = pip_join_polygons(
        centered, polygons, lon="_clon", lat="_clat"
    )
    aggs = [F.count(F.lit(1)).alias("n_cells")] + [
        F.sum(c).cast("bigint").alias(f"sum_{c}") for c in value_cols
    ]
    return (
        assigned.where(F.col("polygon_id").isNotNull())
        .groupBy("polygon_id")
        .agg(*aggs)
    )


def tile_kernel_density(
    cells: DataFrame,
    value_col: str,
    radius: int = 2,
    res_deg: float = DEFAULT_RES_DEG,
    scale: int = 1_000_000,
) -> DataFrame:
    """Weighted kernel smoothing over a per-cell raster — the KDE
    generalization of :func:`tile_focal_stats`: every input cell
    spreads its (integral) value to the (2r+1)² neighborhood with
    separable binomial weights w(dx,dy)=C(2r,r+dx)·C(2r,r+dy), the
    discrete Gaussian.  Same wrap/clamp topology, same exact-integer
    contract: contributions are v·w in int64, the normalized estimate
    is ``(wsum · scale) DIV wnorm`` where wnorm sums the weights that
    actually landed (edge cells normalize over their real support, the
    standard renormalized-kernel boundary rule).

    Fan-out is (2r+1)² on the AGGREGATE raster (|cells| rows, never
    the point table) — at radius 2 that is 25·|cells| counter rows
    through one hash aggregate.  Output rows keep the raster support
    (semi-join back), as in focal stats."""
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols <= 2 * radius + 1:
        raise ValueError(
            f"grid of {cols} columns too coarse for radius {radius}: "
            "longitude wrap would fold kernel taps onto one cell"
        )
    binom = [math.comb(2 * radius, i) for i in range(2 * radius + 1)]
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    taps = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            w = binom[dy + radius] * binom[dx + radius]
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            taps.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    F.struct(
                        (t_lat * F.lit(cols) + t_lon)
                        .cast("bigint").alias("t_cell"),
                        F.lit(w).cast("bigint").alias("w"),
                    ),
                )
            )
    fan = cells.select(
        F.col(value_col).cast("bigint").alias("_v"),
        F.explode(F.array_compact(F.array(*taps))).alias("tap"),
    ).select(
        F.col("tap.t_cell").alias("t_cell"),
        F.col("tap.w").alias("w"),
        "_v",
    )
    agg = fan.groupBy("t_cell").agg(
        F.sum(F.col("_v") * F.col("w")).alias("wsum"),
        F.sum("w").alias("wnorm"),
    )
    out = cells.select(F.col("cell")).join(
        agg, cells.cell == agg.t_cell, "inner"
    )
    return out.select(
        "cell",
        "wsum",
        "wnorm",
        F.expr(f"(wsum * {int(scale)}) DIV wnorm").alias("kde_m"),
    )


def idw_to_cells(
    points: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    weight_scale: int = 1_000_000_000,
    min_d2: int = 10_000,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Inverse-distance-weighted interpolation of scattered samples
    onto the cell grid (the vector→raster surface-estimation pass):
    every SUPPORT cell (a cell containing ≥1 sample) gets
    ``Σ vᵢ·wᵢ / Σ wᵢ`` over the samples in its 3×3 neighborhood,
    with quantized inverse-square weights
    ``wᵢ = weight_scale DIV max(d²ᵢ, min_d2)``.

    Exactness contract (the house scaled-int rule): coordinates snap
    to 10⁻⁴-degree integer units (round once), d² is exact int64 with
    the wrapped-lon delta (the kNN family's metric), weights are exact
    integer divisions, and both Σ are int64 — so the single final
    division is the only IEEE op and results are identical at any
    parallelism and in the DuckDB twin.  ``min_d2`` bounds the weight
    of a sample sitting on the cell center (classic IDW singularity)
    and bounds overflow: |Σ v·w| ≤ n·v_max·(scale DIV min_d2) — with
    the defaults, 10⁶ co-cell samples of |v|≤10⁴ stay < 2⁶³ (values
    must be non-negative: integer DIV truncation differs between
    engines below zero).

    Plan shape: one narrow projection snaps/assigns samples, support
    cells explode ≤9 probe cells, one hash join on the probe cell
    against the samples (both sides shuffled once on the cell key —
    the knn_neighborhood shape), one aggregate.  Output: cell,
    n_samples, vw_sum, w_sum, idw (double, one division)."""
    cols = int(360 / res_deg)
    res_u = int(round(res_deg * 10_000))
    if abs(res_u - res_deg * 10_000) > 1e-9:
        raise ValueError(
            f"res_deg {res_deg} is not a multiple of 1e-4 degrees"
        )
    full_u = 360 * 10_000
    pts = points.select(
        F.round(F.col(lon) * 10_000).cast("bigint").alias("ulon"),
        F.round(F.col(lat) * 10_000).cast("bigint").alias("ulat"),
        F.round(F.col(value_col) * 10_000).cast("bigint").alias("v"),
        grid_cell(F.col(lon), F.col(lat), res_deg).alias("pcell"),
    )
    support = pts.groupBy("pcell").agg(F.count(F.lit(1))).select(
        F.col("pcell").alias("cell")
    )
    rows_n = int(180 / res_deg)
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    probes = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            probes.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    targets = support.select(
        "cell",
        # exact integer cell-center coordinates in 1e-4-degree units
        (lon_b * F.lit(res_u) + F.lit(res_u // 2)
         - F.lit(180 * 10_000)).alias("c_ulon"),
        (lat_b * F.lit(res_u) + F.lit(res_u // 2)
         - F.lit(90 * 10_000)).alias("c_ulat"),
        F.explode(
            F.array_distinct(F.array_compact(F.array(*probes)))
        ).alias("probe"),
    )
    # a weight of 0 would silently drop far samples: require the scale
    # to beat the worst-case 3×3 distance (1.5 cells per axis)
    max_d2 = int(4.5 * res_u * res_u)
    if weight_scale < max_d2:
        raise ValueError(
            f"weight_scale {weight_scale} < max neighborhood d² "
            f"{max_d2} at res {res_deg}°: far samples would get "
            "weight 0; raise weight_scale"
        )
    j = targets.join(pts, targets.probe == pts.pcell)
    dlon_raw = F.abs(F.col("ulon") - F.col("c_ulon"))
    dlon = F.least(dlon_raw, F.lit(full_u) - dlon_raw)
    dlat = F.abs(F.col("ulat") - F.col("c_ulat"))
    d2 = dlon * dlon + dlat * dlat
    j = j.select("cell", F.col("v"), d2.alias("_d2"))
    j = j.select(
        "cell", "v",
        F.expr(
            f"{int(weight_scale)} DIV greatest(_d2, {int(min_d2)})"
        ).alias("w"),
    )
    agg = j.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.col("v") * F.col("w")).alias("vw_sum"),
        F.sum("w").alias("w_sum"),
    )
    # support cells always have >=1 sample at d2 <= 2*(res_u/2)^2 <
    # max_d2, so w_sum >= 1 and the division below can't hit zero
    return agg.select(
        "cell",
        "n_samples",
        "vw_sum",
        "w_sum",
        (
            F.col("vw_sum").cast("double")
            / F.col("w_sum").cast("double") / F.lit(10_000.0)
        ).alias("idw"),
    )


def tile_rollup_multires(
    points: DataFrame,
    resolutions: Sequence[int],
    lon: str = "lon",
    lat: str = "lat",
    taint_col: str = "tainted",
) -> DataFrame:
    """Multi-resolution raster rollup (cube over the cell hierarchy):
    per-cell page count + taint count + density at EVERY requested
    resolution, returned long-form as (res, cell, n_pages, n_tainted,
    taint_density).

    Physical shape — hierarchical re-aggregation, not GROUPING SETS:
    the points shuffle ONCE on the finest cell; every coarser level
    re-aggregates the finest *aggregate* via the parent operation
    (sums are associative and ``cell_parent`` commutes with point
    assignment: parent(hier_cell(p, f)) == hier_cell(p, r) exactly,
    both are Morton-prefix truncations).  At 10^12 points the coarser
    passes touch ~|cells(finest)| rows, not the point table; GROUPING
    SETS would instead replicate every point row once per level into
    the shuffle.  The finest aggregate is cached for the fan-out."""
    rs = sorted(set(resolutions))
    if not rs:
        raise ValueError("resolutions must be non-empty")
    finest = rs[-1]
    base = points.groupBy(
        hier_cell(F.col(lon), F.col(lat), finest).alias("cell")
    ).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col(taint_col).cast("int")).alias("n_tainted"),
    )
    if len(rs) > 1:
        # localCheckpoint(eager) materializes the finest aggregate ONCE
        # for the coarser-level fan-out and — unlike cache() — holds no
        # storage-level entry that would leak across repeated calls in
        # a long-lived session (the truncated lineage is GC'd with the
        # DataFrame; the repo's staged-commit pattern).
        base = base.localCheckpoint(eager=True)
    levels = [base.withColumn("res", F.lit(finest))]
    for r in rs[:-1]:
        levels.append(
            base.groupBy(
                cell_parent(F.col("cell"), r, res=finest).alias("cell")
            )
            .agg(
                F.sum("n_pages").alias("n_pages"),
                F.sum("n_tainted").alias("n_tainted"),
            )
            .withColumn("res", F.lit(r))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "res",
        "cell",
        "n_pages",
        "n_tainted",
        F.round(
            F.col("n_tainted").cast("double") / F.col("n_pages"), 6
        ).alias("taint_density"),
    )


def tile_vectorize(
    points: DataFrame,
    res_deg: float = DEFAULT_RES_DEG,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Raster→VECTOR: per occupied cell, the cell's exact bounding box
    plus the member-point centroid and count — the feature layer a GIS
    consumer draws (the reverse direction of tile_rollup's
    vector→raster aggregation; north-rule "raster↔vector rollups").

    Cell bounds derive from any member point by the same floor
    arithmetic that assigned the cell — no inverse Morton needed, so
    the whole operator is one map-side-combined groupBy (exactly
    tile_rollup's single-exchange shape).  The centroid divides two
    exact scaled-int sums once (1e-6° grid ≈ 0.1 m), keeping the
    result bit-identical across engines and accumulation orders — the
    house rule for cross-engine float aggregation."""
    lon_c, lat_c = F.col(lon), F.col(lat)
    cell = grid_cell(lon_c, lat_c, res_deg)
    min_lon = F.floor((lon_c + 180.0) / res_deg) * res_deg - 180.0
    min_lat = F.floor((lat_c + 90.0) / res_deg) * res_deg - 90.0
    agg = points.groupBy(cell.alias("cell")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min(min_lon).alias("cell_min_lon"),
        F.min(min_lat).alias("cell_min_lat"),
        F.sum(F.round(lon_c * 1e6).cast("bigint")).alias("_slon"),
        F.sum(F.round(lat_c * 1e6).cast("bigint")).alias("_slat"),
    )
    return agg.select(
        "cell",
        "n_points",
        "cell_min_lon",
        "cell_min_lat",
        (F.col("cell_min_lon") + res_deg).alias("cell_max_lon"),
        (F.col("cell_min_lat") + res_deg).alias("cell_max_lat"),
        F.round(F.col("_slon") / F.col("n_points") / 1e6, 6).alias(
            "centroid_lon"
        ),
        F.round(F.col("_slat") / F.col("n_points") / 1e6, 6).alias(
            "centroid_lat"
        ),
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


def _idivc(a: Column, b: Column) -> Column:
    """Exact floor division of a NON-NEGATIVE bigint column by a
    positive bigint COLUMN (the column-divisor twin of :func:`_idiv`):
    ``(a - a%b)/b`` divides an exact multiple, so the intermediate
    double division is exact for any quotient below 2^53."""
    return ((a - F.pmod(a, b)) / b).cast("bigint")


def segment_cells(
    segs: DataFrame,
    res_deg: float,
    id_col: str = "seg_id",
    scale: int = 10_000,
    max_span_cells: int = 4_096,
) -> DataFrame:
    """Supercover rasterization: EVERY grid cell a line segment
    touches, in exact int64 arithmetic — the line-layer analogue of
    point ``assign_cells`` and the rigorous form of the reference's
    way→region assignment (run_candidates.rb derives a way's regions
    from its nodes' tiles; a long segment also crosses tiles that
    contain NO node, which this operator emits and the node-based
    assignment silently misses).

    Inputs carry (id, lon1, lat1, lon2, lat2) in degrees.  Coordinates
    snap to fixed-point ``scale`` (exact on the pages geocode, same
    convention as :func:`segment_crossing_join`) and are shifted
    non-negative; everything downstream is integer, so the SQL twin
    agrees bit-for-bit with no float epsilons.

    Algorithm — column sweep, one explode per axis, no iteration:
    normalize the segment so x is non-decreasing, explode the integer
    column range [x_lo/g, x_hi/g]; within column ``ix`` the segment is
    monotone in y, so its row span is bracketed by y evaluated at the
    clipped column ends — kept RATIONAL as (num = y0·dx + dy·(x−x0),
    den = dx·g) and floored with exact integer division, never a
    float.  A second explode emits the row range.  Cells touched only
    at a boundary point are included on BOTH sides (conservative
    supercover — the join-safety property a downstream cell-keyed
    spatial join needs: a candidate touching a cell edge must land in
    every cell it grazes).

    Overflow bound: num ≤ 180·scale · 360·scale ≤ 2.4e13 at the
    default scale — comfortably inside both int64 and the 2^53 exact
    double window `_idivc` relies on.

    Scale shape: narrow projection + two ``explode(sequence)`` — no
    shuffle at all; the expected downstream ``groupBy(cell)`` is the
    single shuffle.  Fan-out is guarded per row by ``assert_true``
    (column count AND per-segment row span ≤ ``max_span_cells``) — a
    near-antipodal segment at a fine grid fails LOUD, never silently
    explodes the job (house rule: no silent caps/blowups).

    Output: (id, cell_x, cell_y) ints in shifted cell units
    (cell_x = floor((lon+180)·scale / g)), one row per touched cell,
    no duplicates by construction (each (ix, iy) emitted once).
    """
    if res_deg * scale != int(res_deg * scale):
        raise ValueError("res_deg * scale must be integral")
    g = int(res_deg * scale)
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))

    x1 = (F.round(F.col("lon1") * sc) + offx).cast("bigint")
    y1 = (F.round(F.col("lat1") * sc) + offy).cast("bigint")
    x2 = (F.round(F.col("lon2") * sc) + offx).cast("bigint")
    y2 = (F.round(F.col("lat2") * sc) + offy).cast("bigint")

    # normalize so ax <= bx (supercover is endpoint-order symmetric)
    swap = x2 < x1
    ax = F.when(swap, x2).otherwise(x1)
    ay = F.when(swap, y2).otherwise(y1)
    bx = F.when(swap, x1).otherwise(x2)
    by = F.when(swap, y1).otherwise(y2)

    base = segs.select(
        F.col(id_col),
        ax.alias("ax"), ay.alias("ay"), bx.alias("bx"), by.alias("by"),
    ).withColumns({
        "dx": F.col("bx") - F.col("ax"),
        "dy": F.col("by") - F.col("ay"),
        "icx0": _idiv(F.col("ax"), g),
        "icx1": _idiv(F.col("bx"), g),
    })

    # fan-out guard, house pattern (see covered_cells): assert_true
    # yields NULL on success; tying it into the exploded value keeps
    # Catalyst from pruning the check away, and a violating row FAILS
    # the job instead of silently exploding it
    ok = F.assert_true(
        (F.col("icx1") - F.col("icx0") < F.lit(max_span_cells))
        & (
            _idiv(F.greatest("ay", "by"), g) - _idiv(F.least("ay", "by"), g)
            < F.lit(max_span_cells)
        ),
        F.lit(
            f"segment_cells: per-segment fan-out exceeds max_span_cells="
            f"{max_span_cells}; coarsen res_deg or split the segment"
        ),
    )
    cols = base.select(
        id_col, "ax", "ay", "bx", "by", "dx", "dy",
        F.explode(
            F.when(ok.isNull(), F.sequence("icx0", "icx1"))
        ).alias("cell_x"),
    )
    gl = F.lit(g).cast("bigint")
    xa = F.greatest(F.col("ax"), F.col("cell_x") * gl)
    xb = F.least(F.col("bx"), (F.col("cell_x") + 1) * gl)
    # rational y·dx at the clipped column ends (dx > 0 branch)
    num_a = F.col("ay") * F.col("dx") + F.col("dy") * (xa - F.col("ax"))
    num_b = F.col("ay") * F.col("dx") + F.col("dy") * (xb - F.col("ax"))
    den = F.col("dx") * gl
    iy_lo = F.when(
        F.col("dx") == 0, _idiv(F.least("ay", "by"), g)
    ).otherwise(_idivc(F.least(num_a, num_b), den))
    iy_hi = F.when(
        F.col("dx") == 0, _idiv(F.greatest("ay", "by"), g)
    ).otherwise(_idivc(F.greatest(num_a, num_b), den))

    return cols.select(
        id_col,
        "cell_x",
        F.explode(F.sequence(iy_lo, iy_hi)).alias("cell_y"),
    )


def stay_points(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    min_duration_s: int = 1800,
    min_points: int = 2,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Stay-point (stop) detection over entity trajectories: a stay is
    a MAXIMAL run of consecutive points inside one grid cell whose
    dwell time reaches ``min_duration_s`` — where did each device /
    user linger, the companion of :func:`trip_segments` (trips are the
    moving runs, stays the stationary ones).  This is the grid-stay
    formulation: runs are defined by cell membership, so detection is
    one window pass — the classic anchor-radius scan (Li et al.'s
    first-point-outside-ε walk) is inherently sequential per entity
    and is NOT what you want over 10¹² points; at res_deg≈0.25° the
    two agree up to cell-boundary straddle, which a 3×3 follow-up
    join could resolve (same trade as knn_in_cell vs knn_neighborhood).

    Plan shape: cell id is pure integer arithmetic on the scan; the
    run counter is gaps-and-islands (cell ≠ lag(cell) → running sum)
    over ONE partitionBy(id) orderBy(ts, tiebreak) window sort — a
    single hash shuffle — then a map-side-combining groupBy on
    (id, run).  Dwell tests compare integer microseconds; the stay
    centroid is the mean of µdeg-quantized coordinates (floor(x·10⁶),
    int64 sum, one DIV) so output is exact and parallelism-
    independent.  Pass ``tiebreak`` whenever ``ts`` is not unique per
    entity (ROWS-frame counter, the trip_segments rule).

    Output: id, stay_no (1-based per id over KEPT stays), cell,
    n_points, enter_us, exit_us, dwell_s, lat_udeg, lon_udeg."""
    order_cols = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    wu = W.partitionBy(id_col).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cell = grid_cell(F.col(lon), F.col(lat), res_deg)
    seg = points.select(
        F.col(id_col),
        us.alias("_us"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tiebreak)],
        cell.alias("cell"),
        F.floor(F.col(lat) * F.lit(1_000_000.0)).cast("bigint").alias("_latq"),
        F.floor(F.col(lon) * F.lit(1_000_000.0)).cast("bigint").alias("_lonq"),
        F.lag(cell).over(wu).alias("_pcell"),
    )
    w2 = (
        W.partitionBy(id_col)
        .orderBy("_us", *[f"_tb{i}" for i in range(len(tiebreak))])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seg = seg.withColumn(
        "_new",
        (
            F.col("_pcell").isNull() | (F.col("cell") != F.col("_pcell"))
        ).cast("int"),
    ).withColumn("_run", F.sum("_new").over(w2).cast("bigint"))
    runs = seg.groupBy(F.col(id_col), F.col("_run")).agg(
        # cell is constant within a run; MIN (not first) keeps the agg
        # order-insensitive and mirrors the SQL twin exactly
        F.min("cell").alias("cell"),
        F.count(F.lit(1)).alias("n_points"),
        F.min("_us").alias("enter_us"),
        F.max("_us").alias("exit_us"),
        F.expr("SUM(_latq) DIV COUNT(*)").alias("lat_udeg"),
        F.expr("SUM(_lonq) DIV COUNT(*)").alias("lon_udeg"),
    )
    kept = runs.where(
        (F.col("exit_us") - F.col("enter_us")
         >= F.lit(int(min_duration_s) * 1_000_000))
        & (F.col("n_points") >= int(min_points))
    )
    w3 = W.partitionBy(id_col).orderBy("enter_us", "_run")
    return kept.withColumn(
        "stay_no", F.row_number().over(w3).cast("bigint")
    ).select(
        id_col, "stay_no", "cell", "n_points", "enter_us", "exit_us",
        F.expr("(exit_us - enter_us) DIV 1000000").alias("dwell_s"),
        "lat_udeg", "lon_udeg",
    )


def stay_points_sql(
    points_src: str,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    min_duration_s: int = 1800,
    min_points: int = 2,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`stay_points` — same gaps-and-islands
    recurrence, same µs/µdeg quantization, generated from the same
    thresholds."""
    cell = grid_cell_sql(lon, lat, res_deg)
    tb = "".join(f", {c}" for c in tiebreak)
    return f"""
        WITH sp_pts AS (
            SELECT {id_col},
                   epoch_us({ts_col}) AS _us{tb},
                   {cell} AS cell,
                   CAST(FLOOR({lat} * 1000000.0) AS BIGINT) AS _latq,
                   CAST(FLOOR({lon} * 1000000.0) AS BIGINT) AS _lonq
            FROM {points_src}
        ),
        sp_seg AS (
            SELECT *,
                   CASE WHEN LAG(cell) OVER w IS NULL
                             OR cell <> LAG(cell) OVER w
                        THEN 1 ELSE 0 END AS _new
            FROM sp_pts
            WINDOW w AS (PARTITION BY {id_col} ORDER BY _us{tb})
        ),
        sp_run AS (
            SELECT *,
                   SUM(_new) OVER (PARTITION BY {id_col} ORDER BY _us{tb}
                                   ROWS UNBOUNDED PRECEDING) AS _run
            FROM sp_seg
        ),
        sp_agg AS (
            SELECT {id_col}, _run,
                   MIN(cell) AS cell,
                   CAST(COUNT(*) AS BIGINT) AS n_points,
                   MIN(_us) AS enter_us,
                   MAX(_us) AS exit_us,
                   CAST(SUM(_latq) // COUNT(*) AS BIGINT) AS lat_udeg,
                   CAST(SUM(_lonq) // COUNT(*) AS BIGINT) AS lon_udeg
            FROM sp_run GROUP BY 1, 2
        )
        SELECT {id_col},
               CAST(ROW_NUMBER() OVER (PARTITION BY {id_col}
                                       ORDER BY enter_us, _run)
                    AS BIGINT) AS stay_no,
               cell, n_points, enter_us, exit_us,
               (exit_us - enter_us) // 1000000 AS dwell_s,
               lat_udeg, lon_udeg
        FROM sp_agg
        WHERE exit_us - enter_us >= {int(min_duration_s) * 1_000_000}
          AND n_points >= {int(min_points)}
    """


# marching-squares case → number of contour segments through the block
# (saddle cases 5 and 10 carry two segments; 0 and 15 carry none)
MS_SEGMENTS = (0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0)


def tile_contours(
    cells: DataFrame, res_deg: float = DEFAULT_RES_DEG
) -> DataFrame:
    """Marching-squares contour topology over the raster support — the
    raster→vector iso-line step (where does the taint-density field
    cross the threshold?): every 2×2 block of grid cells gets its
    classic case index from which corners are occupied, and blocks on
    the boundary (case ∉ {0, 15}) are exactly the blocks a contour
    passes through.  Corner weights follow the canonical order —
    anchor (lat,lon)=1, lon+1=2, lat+1&lon+1=4, lat+1=8 — so saddle
    cases 5/10 are distinguishable downstream.

    Scale design: the same sparse-fan shape as :func:`tile_dilate` —
    each OCCUPIED cell contributes its weight to the ≤4 blocks it
    corners (wrap-aware in lon, clamped in lat: a block must fit
    inside the grid), then one map-side-combining groupBy sums
    weights into the case index.  Cost is ×4 fan on |occupied| rows,
    never a densified grid; absent corners contribute 0 implicitly,
    and all-inside blocks (15) are filtered at the end — so output is
    |boundary blocks|, the contour's own length scale.

    ``cells``: one row per occupied cell (column ``cell``).
    Output: (cell = block anchor, ms_case 1..14, n_segments)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 3:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 3 "
            "for distinct block corners under lon wrap"
        )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    contribs = []
    # (dy, dx) = this cell's corner position within the anchored block
    for dy, dx, weight in ((0, 0, 1), (0, 1, 2), (1, 1, 4), (1, 0, 8)):
        a_lat = lat_b - F.lit(dy)
        a_lon = (lon_b - F.lit(dx) + F.lit(cols)) % F.lit(cols)
        contribs.append(
            F.when(
                (a_lat >= 0) & (a_lat < rows_n - 1),
                F.struct(
                    (a_lat * F.lit(cols) + a_lon).cast("bigint")
                    .alias("cell"),
                    F.lit(weight).alias("w"),
                ),
            )
        )
    fan = cells.select(
        F.explode(F.array_compact(F.array(*contribs))).alias("c")
    ).select("c.cell", "c.w")
    seg_map = F.array(*[F.lit(s) for s in MS_SEGMENTS])
    return (
        fan.groupBy("cell")
        .agg(F.sum("w").cast("int").alias("ms_case"))
        .where(F.col("ms_case") != 15)
        .select(
            "cell",
            "ms_case",
            seg_map.getItem(F.col("ms_case")).alias("n_segments"),
        )
    )


def tile_contours_sql(src: str, res_deg: float = DEFAULT_RES_DEG) -> str:
    """DuckDB twin of :func:`tile_contours`; ``src`` exposes one
    ``cell`` row per occupied cell.  Standalone statement."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    seg_case = " ".join(
        f"WHEN {i} THEN {s}"
        for i, s in enumerate(MS_SEGMENTS)
        if i not in (0, 15)
    )
    return f"""
        SELECT cell, ms_case,
               CASE ms_case {seg_case} END AS n_segments
        FROM (
            SELECT (((s.cell // {cols}) - d.dy) * {cols}
                    + ((s.cell % {cols}) - d.dx + {cols}) % {cols})
                       AS cell,
                   CAST(SUM(d.w) AS INTEGER) AS ms_case
            FROM {src} s CROSS JOIN (VALUES
                 (0,0,1),(0,1,2),(1,1,4),(1,0,8)) d(dy, dx, w)
            WHERE (s.cell // {cols}) - d.dy >= 0
              AND (s.cell // {cols}) - d.dy < {rows_n - 1}
            GROUP BY 1
        )
        WHERE ms_case <> 15
    """


def adaptive_tiles(
    points: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    min_res: int = 2,
    max_res: int = 6,
    max_count: int = 1000,
) -> DataFrame:
    """Adaptive quadtree tiling: refine the hierarchical grid ONLY
    where the data is dense — every output leaf holds ≤ ``max_count``
    points or sits at ``max_res``, and the leaves exactly partition
    the input.  The variable-resolution answer to fixed-res
    tile_rollup's skew problem (a uniform res either under-resolves
    cities or drowns in empty ocean cells), and the write-layout story
    for density-balanced Iceberg file splits: one leaf ≈ one
    bounded-size file regardless of skew.

    Scale design: one counting aggregate per ladder level, each over
    ONLY the points still inside over-threshold cells — the working
    set shrinks geometrically wherever the data is not pathological,
    and each level is a map-side-combined groupBy + a semi-join
    against the (small) hot-cell list, which AQE broadcasts when it
    fits.  Levels are bounded by the ladder depth (≤ 17), not the
    data; the DuckDB twin (:func:`adaptive_tiles_sql`) unrolls the
    identical per-level recurrence, so every leaf and count is
    hash-verified.

    Output: (cell, res, n_points) — hierarchical ids
    (:func:`hier_cell`), so leaves at different resolutions never
    collide."""
    if not 0 <= min_res <= max_res <= MAX_TILE_RES:
        raise ValueError(
            f"need 0 ≤ min_res ≤ max_res ≤ {MAX_TILE_RES}: "
            f"{min_res}, {max_res}"
        )
    if max_count < 1:
        raise ValueError(f"max_count must be ≥ 1: {max_count}")
    pts = points.select(F.col(lon).alias("_lon"), F.col(lat).alias("_lat"))
    leaves = []
    for r in range(min_res, max_res + 1):
        cells = pts.select(
            hier_cell(F.col("_lon"), F.col("_lat"), r).alias("cell"),
            "_lon", "_lat",
        )
        counts = cells.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n_points")
        )
        if r == max_res:
            leaves.append(counts)
            break
        # lineage cut per level (the iterative house pattern): counts
        # feeds BOTH the kept-leaf branch and the next level's
        # semi-join, and pts otherwise re-derives every prior level's
        # join on each iteration — K chained levels would stack K
        # rounds of Catalyst analysis and recompute
        counts = counts.localCheckpoint(eager=True)
        leaves.append(counts.where(F.col("n_points") <= max_count))
        hot = counts.where(F.col("n_points") > max_count).select("cell")
        if hot.isEmpty():
            # nothing left to split — the deeper ladder levels would
            # all run on an empty frontier (the BFS short-circuit)
            break
        pts = cells.join(hot, "cell", "left_semi").select(
            "_lon", "_lat"
        ).localCheckpoint(eager=True)
    out = leaves[0]
    for df in leaves[1:]:
        out = out.unionByName(df)
    return out.select(
        "cell", cell_res(F.col("cell")).alias("res"), "n_points"
    )


def adaptive_tiles_sql(
    src: str,
    lon: str = "lon",
    lat: str = "lat",
    min_res: int = 2,
    max_res: int = 6,
    max_count: int = 1000,
) -> str:
    """DuckDB twin of :func:`adaptive_tiles`: the per-level
    count/split recurrence unrolled as chained CTEs, generated from
    the same ladder and threshold.  Standalone statement returning
    (cell, res, n_points)."""
    if not 0 <= min_res <= max_res <= MAX_TILE_RES:
        raise ValueError(
            f"need 0 ≤ min_res ≤ max_res ≤ {MAX_TILE_RES}: "
            f"{min_res}, {max_res}"
        )
    ctes = [
        f"at_p{min_res} AS (SELECT {lon} AS _lon, {lat} AS _lat "
        f"FROM {src})"
    ]
    finals = []
    for r in range(min_res, max_res + 1):
        cell = hier_cell_sql("_lon", "_lat", r)
        ctes.append(
            f"at_c{r} AS (SELECT {cell} AS cell, COUNT(*) AS n_points "
            f"FROM at_p{r} GROUP BY 1)"
        )
        if r == max_res:
            finals.append(f"SELECT cell, {r} AS res, n_points FROM at_c{r}")
            break
        finals.append(
            f"SELECT cell, {r} AS res, n_points FROM at_c{r} "
            f"WHERE n_points <= {max_count}"
        )
        ctes.append(f"""at_p{r + 1} AS (
            SELECT _lon, _lat FROM (
                SELECT {cell} AS cell, _lon, _lat FROM at_p{r}
            ) x
            WHERE x.cell IN (SELECT cell FROM at_c{r}
                             WHERE n_points > {max_count})
        )""")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + " UNION ALL ".join(finals)
    )


def snap_to_segments(
    points: DataFrame,
    segs: DataFrame,
    res_deg: float,
    scale: int = 10_000,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    d2_scale: int = 1000,
    max_span_cells: int = 4_096,
) -> DataFrame:
    """Map-matching lite: snap each point to its nearest line segment
    within a one-cell search radius — the GPS-trace → road-network
    attachment every trajectory pipeline runs before distance/flow
    accounting (the line-layer analogue of knn_neighborhood's
    nearest-clean attribution).

    EXACT arithmetic end-to-end: coordinates quantize to the house
    ×``scale`` fixed-point ints (the segment_cells / crossing-join
    convention); the point-to-segment squared distance is the exact
    rational  (|AP|²·|AB|² − ⟨AP,AB⟩²) / |AB|²  in its interior-
    projection region and |AP|² / |BP|² at the clamped ends, carried
    in decimal(38,0)/HUGEINT and quantized ONCE to
    ``d2_q = num·d2_scale DIV den`` (int64: quotient ≤ |AP|²·d2_scale
    ≈ 10¹⁷ at the defaults) — so the per-point argmin
    (min(struct(d2_q, seg_id)), count-tie → lowest id) is engine-
    identical and the DuckDB twin (:func:`snap_to_segments_sql`)
    hash-matches.

    Candidate generation: segments explode their bbox cell cover
    (the crossing-join idiom, assert-guarded by ``max_span_cells`` —
    a near-antipodal segment fails LOUD); points probe their 3×3 cell
    neighborhood; candidates are the cell-equijoin of the two fans,
    deduped per (point, segment).  Bound: any segment NOT in the
    probe is entirely outside the 3×3 block, hence ≥ one cell away —
    so a match with d² < (res_deg·scale)² is provably the TRUE global
    nearest, and points with no candidate (nothing within ~res_deg)
    are absent from the output, the bounded-radius non-match.  No lon
    wrap (the segment-layer convention; see segment_cells).

    Output: (point_id, seg_id, d2_q) — nearest segment per matched
    point; d2_q in (1/scale °)²·d2_scale units."""
    if res_deg * scale != int(res_deg * scale):
        raise ValueError("res_deg * scale must be integral")
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 cross bound")
    g = int(res_deg * scale)
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))

    sq = segs.select(
        F.col(seg_id),
        (F.round(F.col("lon1") * sc).cast("bigint") + offx).alias("sx1"),
        (F.round(F.col("lat1") * sc).cast("bigint") + offy).alias("sy1"),
        (F.round(F.col("lon2") * sc).cast("bigint") + offx).alias("sx2"),
        (F.round(F.col("lat2") * sc).cast("bigint") + offy).alias("sy2"),
    )
    x0 = _idiv(F.least("sx1", "sx2"), g)
    x1 = _idiv(F.greatest("sx1", "sx2"), g)
    y0 = _idiv(F.least("sy1", "sy2"), g)
    y1 = _idiv(F.greatest("sy1", "sy2"), g)
    n = (x1 - x0 + 1) * (y1 - y0 + 1)
    ok = F.assert_true(
        n <= F.lit(int(max_span_cells)),
        F.lit(
            f"segment bbox covers more than max_span_cells="
            f"{max_span_cells} cells at res_deg={res_deg}; coarsen "
            "the grid or split the segment"
        ),
    )
    cells = F.flatten(
        F.transform(
            F.sequence(y0, y1),
            lambda yy: F.transform(
                F.sequence(x0, x1),
                lambda xx: yy * F.lit(1_000_000) + xx,
            ),
        )
    )
    seg_fan = sq.withColumn(
        "_cell", F.explode(F.when(ok.isNull(), cells))
    )

    pq = points.select(
        F.col(point_id),
        (F.round(F.col("lon") * sc).cast("bigint") + offx).alias("px"),
        (F.round(F.col("lat") * sc).cast("bigint") + offy).alias("py"),
    )
    probes = F.array(
        *[
            (_idiv(F.col("py"), g) + F.lit(dy)) * F.lit(1_000_000)
            + (_idiv(F.col("px"), g) + F.lit(dx))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    pt_fan = pq.withColumn("_cell", F.explode(probes))

    cand = (
        pt_fan.join(seg_fan, "_cell")
        .select(point_id, "px", "py", seg_id, "sx1", "sy1", "sx2", "sy2")
        .distinct()
    )
    apx = F.col("px") - F.col("sx1")
    apy = F.col("py") - F.col("sy1")
    abx = F.col("sx2") - F.col("sx1")
    aby = F.col("sy2") - F.col("sy1")
    bpx = F.col("px") - F.col("sx2")
    bpy = F.col("py") - F.col("sy2")
    dot = apx * abx + apy * aby
    ab2 = abx * abx + aby * aby
    ap2 = apx * apx + apy * apy
    bp2 = bpx * bpx + bpy * bpy
    d = F.lit(int(d2_scale))
    dec = "decimal(38,0)"
    interior = (
        (ap2.cast(dec) * ab2.cast(dec) - dot.cast(dec) * dot.cast(dec))
        * d
    )
    d2_q = (
        F.when(ab2 == 0, ap2 * d)          # degenerate zero-length seg
        .when(dot <= 0, ap2 * d)
        .when(dot >= ab2, bp2 * d)
        .otherwise(F.expr("CAST(_num DIV _den AS BIGINT)"))
    )
    scored = cand.withColumn("_num", interior).withColumn(
        "_den", ab2.cast(dec)
    ).withColumn("d2_q", d2_q)
    return (
        scored.groupBy(point_id)
        .agg(
            F.min(F.struct(F.col("d2_q"), F.col(seg_id).alias("sid")))
            .alias("_best")
        )
        .select(
            point_id,
            F.col("_best.sid").alias(seg_id),
            F.col("_best.d2_q").alias("d2_q"),
        )
    )


def snap_to_segments_sql(
    points_src: str,
    segs_src: str,
    res_deg: float,
    scale: int = 10_000,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    d2_scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`snap_to_segments` — same quantization,
    same bbox-fan × 3×3-probe candidate rule, same decimal/HUGEINT
    rational distance and one-shot quantization.  ``points_src``
    exposes (point_id, lon, lat); ``segs_src`` (seg_id, lon1, lat1,
    lon2, lat2).  Standalone statement."""
    g = int(res_deg * scale)
    offx, offy = 180 * scale, 90 * scale
    return f"""
        WITH sn_sq AS (
            SELECT {seg_id},
                   CAST(ROUND(lon1 * {scale}) AS BIGINT) + {offx} AS sx1,
                   CAST(ROUND(lat1 * {scale}) AS BIGINT) + {offy} AS sy1,
                   CAST(ROUND(lon2 * {scale}) AS BIGINT) + {offx} AS sx2,
                   CAST(ROUND(lat2 * {scale}) AS BIGINT) + {offy} AS sy2
            FROM {segs_src}
        ),
        sn_segfan AS (
            SELECT *,
                   UNNEST(flatten(list_transform(
                       generate_series(
                           (LEAST(sy1, sy2) - LEAST(sy1, sy2) % {g}) // {g},
                           (GREATEST(sy1, sy2)
                            - GREATEST(sy1, sy2) % {g}) // {g}),
                       yy -> list_transform(
                           generate_series(
                               (LEAST(sx1, sx2)
                                - LEAST(sx1, sx2) % {g}) // {g},
                               (GREATEST(sx1, sx2)
                                - GREATEST(sx1, sx2) % {g}) // {g}),
                           xx -> yy * 1000000 + xx)))) AS _cell
            FROM sn_sq
        ),
        sn_pq AS (
            SELECT {point_id},
                   CAST(ROUND(lon * {scale}) AS BIGINT) + {offx} AS px,
                   CAST(ROUND(lat * {scale}) AS BIGINT) + {offy} AS py
            FROM {points_src}
        ),
        sn_ptfan AS (
            SELECT *,
                   ((py - py % {g}) // {g} + d.dy) * 1000000
                   + ((px - px % {g}) // {g} + d.dx) AS _cell
            FROM sn_pq CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
        ),
        sn_cand AS (
            SELECT DISTINCT p.{point_id}, p.px, p.py,
                   s.{seg_id}, s.sx1, s.sy1, s.sx2, s.sy2
            FROM sn_ptfan p JOIN sn_segfan s USING (_cell)
        ),
        sn_scored AS (
            SELECT {point_id}, {seg_id},
                   CASE
                     WHEN (sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1) = 0
                       THEN ((px-sx1)*(px-sx1) + (py-sy1)*(py-sy1))
                            * {d2_scale}
                     WHEN (px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1) <= 0
                       THEN ((px-sx1)*(px-sx1) + (py-sy1)*(py-sy1))
                            * {d2_scale}
                     WHEN (px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1)
                          >= (sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1)
                       THEN ((px-sx2)*(px-sx2) + (py-sy2)*(py-sy2))
                            * {d2_scale}
                     ELSE CAST(
                       ((CAST((px-sx1)*(px-sx1) + (py-sy1)*(py-sy1)
                              AS HUGEINT)
                         * ((sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1))
                         - CAST((px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1)
                                AS HUGEINT)
                           * ((px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1)))
                        * {d2_scale})
                       // ((sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1))
                       AS BIGINT)
                   END AS d2_q
            FROM sn_cand
        ),
        sn_best AS (
            SELECT {point_id},
                   MIN(STRUCT_PACK(d2_q := d2_q, sid := {seg_id}))
                       AS _best
            FROM sn_scored GROUP BY 1
        )
        SELECT {point_id},
               _best.sid AS {seg_id},
               _best.d2_q AS d2_q
        FROM sn_best
    """


def trip_cell_paths(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Run-length-encoded trajectory cell paths: each entity's
    timestamp-ordered point stream compressed to its sequence of
    DISTINCT consecutive grid cells, rendered ``"cell:count,…"`` — the
    trajectory analogue of the inverted index's delta postings (store
    the path, not the points), and the canonical input for map-scale
    route mining (two entities share a corridor iff their RLE paths
    share a substring of cells).

    Reuses the gaps-and-islands run machinery of :func:`stay_points`:
    ONE window sort per entity (run counter), a (id, run) groupBy,
    then an (id) groupBy whose ordered rendering comes from
    ``array_sort`` over (run, entry) structs — all three stages key on
    the entity id, so Spark reuses a single hash partitioning; no
    collect_list arrival-order dependence.  Row width is bounded by
    the run count, not the point count — a parked device compresses
    to one entry.

    Output: (id, n_points, n_runs, path)."""
    order_cols = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    wu = W.partitionBy(id_col).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cell = grid_cell(F.col(lon), F.col(lat), res_deg)
    seg = points.select(
        F.col(id_col),
        us.alias("_us"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tiebreak)],
        cell.alias("_cell"),
        F.lag(cell).over(wu).alias("_pcell"),
    )
    w2 = (
        W.partitionBy(id_col)
        .orderBy("_us", *[f"_tb{i}" for i in range(len(tiebreak))])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = (
        seg.withColumn(
            "_new",
            (
                F.col("_pcell").isNull()
                | (F.col("_cell") != F.col("_pcell"))
            ).cast("int"),
        )
        .withColumn("_run", F.sum("_new").over(w2).cast("bigint"))
        .groupBy(F.col(id_col), F.col("_run"))
        .agg(
            F.min("_cell").alias("_c"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    entry = F.concat_ws(
        ":", F.col("_c").cast("string"), F.col("_n").cast("string")
    )
    return (
        runs.withColumn("_entry", entry)
        .groupBy(id_col)
        .agg(
            F.sum("_n").alias("n_points"),
            F.count(F.lit(1)).alias("n_runs"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_run"), "_entry"))
                    ),
                    lambda s: s["_entry"],
                ),
                ",",
            ).alias("path"),
        )
    )


def trip_cell_paths_sql(
    points_src: str,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`trip_cell_paths`."""
    cell = grid_cell_sql(lon, lat, res_deg)
    tb = "".join(f", {c}" for c in tiebreak)
    return f"""
        WITH tp_pts AS (
            SELECT {id_col}, epoch_us({ts_col}) AS _us{tb},
                   {cell} AS _cell
            FROM {points_src}
        ),
        tp_seg AS (
            SELECT *,
                   CASE WHEN LAG(_cell) OVER w IS NULL
                             OR _cell <> LAG(_cell) OVER w
                        THEN 1 ELSE 0 END AS _new
            FROM tp_pts
            WINDOW w AS (PARTITION BY {id_col} ORDER BY _us{tb})
        ),
        tp_run AS (
            SELECT *,
                   SUM(_new) OVER (PARTITION BY {id_col} ORDER BY _us{tb}
                                   ROWS UNBOUNDED PRECEDING) AS _run
            FROM tp_seg
        ),
        tp_agg AS (
            SELECT {id_col}, _run, MIN(_cell) AS _c,
                   CAST(COUNT(*) AS BIGINT) AS _n
            FROM tp_run GROUP BY 1, 2
        )
        SELECT {id_col},
               CAST(SUM(_n) AS BIGINT) AS n_points,
               CAST(COUNT(*) AS BIGINT) AS n_runs,
               string_agg(_c || ':' || _n, ',' ORDER BY _run) AS path
        FROM tp_agg GROUP BY 1
    """


def cell_gini(
    points: DataFrame,
    class_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-cell class-diversity via Gini impurity in exact integer
    ppm — "how mixed is each tile?" (language mixing per region,
    source-domain diversity per crawl tile).  Shannon entropy is the
    textbook choice but needs log (float-divergent); Gini
    ``1 − Σ pᵢ²`` is its standard decision-tree stand-in, and clears
    to the integer form  ``gini_ppm = 10⁶·(n² − Σcᵢ²) DIV n²``  —
    0 = monoculture, → 10⁶·(1−1/k) for k even classes.

    Overflow: n²·10⁶ < 2⁶³ bounds a cell at ~3·10⁶ points; beyond
    that coarsen classes or lift to decimal(38) (the tile_hotspots
    pattern).  Plan: (cell, class) partial-agg → (cell) re-agg of the
    already-unique class rows — two map-side-combined shuffles.

    Output: (cell, n_points, n_classes, gini_ppm)."""
    cell = grid_cell(F.col(lon), F.col(lat), res_deg)
    cc = points.select(cell.alias("cell"), F.col(class_col).alias("_k"))
    counts = cc.groupBy("cell", "_k").agg(F.count(F.lit(1)).alias("_c"))
    return (
        counts.groupBy("cell")
        .agg(
            F.sum("_c").alias("n_points"),
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.col("_c") * F.col("_c")).alias("_s2"),
        )
        .select(
            "cell", "n_points", "n_classes",
            F.expr(
                "(1000000 * (n_points * n_points - _s2)) "
                "DIV (n_points * n_points)"
            ).alias("gini_ppm"),
        )
    )


def cell_gini_sql(
    src: str,
    class_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """DuckDB twin of :func:`cell_gini`; ``src`` exposes lon/lat +
    the class column."""
    cell = grid_cell_sql(lon, lat, res_deg)
    return f"""
        WITH cg_cc AS (
            SELECT {cell} AS cell, {class_col} AS _k, COUNT(*) AS _c
            FROM {src} GROUP BY 1, 2
        )
        SELECT cell,
               CAST(SUM(_c) AS BIGINT) AS n_points,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST((1000000 * (SUM(_c) * SUM(_c) - SUM(_c * _c)))
                    // (SUM(_c) * SUM(_c)) AS BIGINT) AS gini_ppm
        FROM cg_cc GROUP BY 1
    """


def raster_distance(
    cells: DataFrame,
    seeds: DataFrame,
    rounds: int,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Grid cost-distance (unit weights): minimum queen-step count
    from any seed cell to every occupied cell, walking ONLY occupied
    cells — "is there a connected corridor of coverage from here to
    there, and how long" (coverage-gap analysis, corridor routing over
    a presence raster).  A pure composition of verified pieces: the
    queen-adjacency fan of :func:`tile_dilate` (wrap in lon, clamped
    in lat) builds the edge list, and :func:`graph.link_distance`
    runs the frontier-only relaxation — so the scale/correctness
    arguments of both carry over unchanged, and the DuckDB twin
    composes their SQL twins the same way.

    ``cells``: one ``cell`` row per occupied cell; ``seeds``: subset
    of occupied cells (rows with ``cell``).  Returns (cell, dist),
    NULL = unreachable within ``rounds`` queen steps."""
    from . import graph

    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    nbrs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            nbrs.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = cells.select(
        F.col("cell").alias("src"),
        F.explode(F.array_compact(F.array(*nbrs))).alias("dst"),
    )
    # adjacency restricted to OCCUPIED targets: the corridor walks the
    # support, never open water
    edges = fan.join(
        cells.select(F.col("cell").alias("dst")), "dst", "left_semi"
    )
    return graph.link_distance(
        cells.select(F.col("cell").alias("node")),
        seeds.select(F.col("cell").alias("node")),
        edges,
        rounds,
    ).select(F.col("node").alias("cell"), "dist")


def raster_distance_sql(
    cells_src: str,
    seeds_src: str,
    rounds: int,
    res_deg: float = DEFAULT_RES_DEG,
) -> str:
    """DuckDB twin of :func:`raster_distance`: the morphology fan's
    adjacency CTE feeding graph.link_distance_sql."""
    from . import graph

    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    edges = f"""(
        SELECT f.src, f.dst FROM (
            SELECT s.cell AS src,
                   (((s.cell // {cols}) + d.dy) * {cols}
                    + ((s.cell % {cols}) + d.dx + {cols}) % {cols}) AS dst
            FROM {cells_src} s CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
            WHERE (s.cell // {cols}) + d.dy >= 0
              AND (s.cell // {cols}) + d.dy < {rows_n}
        ) f
        WHERE f.dst IN (SELECT cell FROM {cells_src})
    )"""
    inner = graph.link_distance_sql(
        f"(SELECT cell AS node FROM {cells_src})",
        f"(SELECT cell AS node FROM {seeds_src})",
        edges,
        rounds,
    )
    return (
        f"SELECT node AS cell, dist FROM ({inner})"
    )


def morans_i(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Global Moran's I over the occupied-cell raster — the INTERVAL-
    valued sibling of :func:`tile_join_counts` (same queen adjacency,
    same once-per-pair forward fan, but correlating a numeric cell
    value instead of a binary color): positive I = similar values
    cluster, negative = checkerboard, ~0 = spatial randomness.  The
    global companion of the local :func:`tile_hotspots` for graded
    intensity surfaces.

    Exact-integer formulation (the tile_hotspots discipline — no
    float mean, no variance approximation): deviations are scaled by
    N, d_i = N·x_i − S (S = Σx), so

        num = Σ_ij w_ij·d_i·d_j   (directed; = 2 × the forward-pair sum)
        den = Σ_i d_i²
        I   = (N / W) · (num / den)      (the N² scales cancel)

    and the quantized ratio i_ppm = (N·num·10⁶) DIV (W·den) is
    evaluated in decimal(38,0) (HUGEINT in the twin) with truncation
    toward zero on BOTH engines — every output column hash-verifies.
    den = 0 (constant surface) yields NULL i_ppm, the statistic's
    genuine undefined case.  num/den emit as BIGINT: headroom
    |d_i| ≤ N·x_max keeps Σd² < 2⁶³ through ~10⁶ cells of 10⁶-point
    values; beyond that pre-quantize the value column (the
    BM25_IDF_SCALE move — the plan doesn't change).

    Adjacency contract inherited from :func:`tile_join_counts`:
    queen, PRESENT cells only, lon wrap (≥ 5 columns enforced), lat
    clamp.  Plan: the ×4 fan and the pair join run on the AGGREGATE
    raster; the corpus is touched only by the caller's rollup.
    Output: one row (n_cells, w_sum, num, den, i_ppm)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "for once-per-pair forward adjacency under lon wrap"
        )
    vals = cells.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_s")
    )
    dev = vals.crossJoin(F.broadcast(stats)).select(
        "cell",
        "_n",
        (F.col("_n") * F.col("_x") - F.col("_s")).alias("_d"),
    )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    fwd = []
    for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
        t_lat = lat_b + F.lit(dy)
        t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
        fwd.append(
            F.when(
                (t_lat >= 0) & (t_lat < rows_n),
                (t_lat * F.lit(cols) + t_lon).cast("bigint"),
            )
        )
    fan = dev.select(
        F.col("_d").alias("_d1"),
        F.explode(F.array_compact(F.array(*fwd))).alias("_nbr"),
    )
    paired = fan.join(
        dev.select(F.col("cell").alias("_nbr"), F.col("_d").alias("_d2")),
        "_nbr",
    )
    dec = "decimal(38,0)"
    pair_agg = paired.agg(
        (F.count(F.lit(1)) * 2).alias("w_sum"),
        F.coalesce(
            F.sum(F.expr(f"CAST(_d1 AS {dec}) * _d2")) * 2,
            F.lit(0).cast(dec),
        ).alias("_num"),
    )
    dev_agg = dev.agg(
        F.max("_n").alias("n_cells"),
        F.sum(F.expr(f"CAST(_d AS {dec}) * _d")).alias("_den"),
    )
    return (
        dev_agg.crossJoin(pair_agg)
        .select(
            "n_cells",
            "w_sum",
            F.col("_num").cast("bigint").alias("num"),
            F.col("_den").cast("bigint").alias("den"),
            F.expr(
                f"CAST(CASE WHEN _den = 0 OR w_sum = 0 THEN NULL ELSE "
                f"(CAST(n_cells AS {dec}) * _num * 1000000) DIV "
                f"(CAST(w_sum AS {dec}) * _den) END AS BIGINT)"
            ).alias("i_ppm"),
        )
    )


def morans_i_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`morans_i` (standalone statement)."""
    return "WITH " + morans_i_ctes(src, value_col, res_deg)


def morans_i_ctes(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """The twin without the leading WITH (oracle-prelude appendable);
    ``src`` must expose (cell, ``value_col``), one row per present
    cell.  HUGEINT arithmetic mirrors the decimal(38,0) path; DuckDB
    ``//`` truncates toward zero exactly like Spark DIV."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    return f"""
        mi_src AS (
            SELECT cell, CAST({value_col} AS BIGINT) AS x FROM {src}
        ),
        mi_stats AS (
            SELECT COUNT(*) AS n, CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s
            FROM mi_src
        ),
        mi_dev AS (
            SELECT v.cell, t.n, t.n * v.x - t.s AS d
            FROM mi_src v CROSS JOIN mi_stats t
        ),
        mi_fan AS (
            SELECT s.d AS d1,
                   (((s.cell // {cols}) + dd.dy) * {cols}
                    + ((s.cell % {cols}) + dd.dx + {cols}) % {cols}) AS nbr
            FROM mi_dev s CROSS JOIN (VALUES
                 (0,1),(1,-1),(1,0),(1,1)) dd(dy, dx)
            WHERE (s.cell // {cols}) + dd.dy >= 0
              AND (s.cell // {cols}) + dd.dy < {rows_n}
        ),
        mi_pairs AS (
            SELECT f.d1, s.d AS d2
            FROM mi_fan f JOIN mi_dev s ON s.cell = f.nbr
        ),
        mi_pagg AS (
            SELECT CAST(COUNT(*) * 2 AS BIGINT) AS w_sum,
                   COALESCE(SUM(CAST(d1 AS HUGEINT) * d2) * 2,
                            CAST(0 AS HUGEINT)) AS num
            FROM mi_pairs
        ),
        mi_dagg AS (
            SELECT MAX(n) AS n_cells,
                   SUM(CAST(d AS HUGEINT) * d) AS den
            FROM mi_dev
        )
        SELECT CAST(d.n_cells AS BIGINT) AS n_cells,
               p.w_sum,
               CAST(p.num AS BIGINT) AS num,
               CAST(d.den AS BIGINT) AS den,
               CAST(CASE WHEN d.den = 0 OR p.w_sum = 0 THEN NULL ELSE
                    (CAST(d.n_cells AS HUGEINT) * p.num * 1000000)
                    // (CAST(p.w_sum AS HUGEINT) * d.den) END
                    AS BIGINT) AS i_ppm
        FROM mi_dagg d CROSS JOIN mi_pagg p
    """


def local_morans(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Local Moran's I_i (Anselin's LISA) per occupied cell — the
    PER-CELL decomposition of :func:`morans_i`: which cells drive the
    global clustering, and in which direction (HH hotspot, LL
    coldspot, HL/LH spatial outliers).  The quadrant label is the
    deterministic half of the classic LISA map (the significance
    filter is permutation inference — a Monte-Carlo layer a caller
    adds on top; every quantity HERE is exact and engine-portable).

    Exact-integer formulation (shared with the global statistic):
    d_i = N·x_i − S, lag_i = Σ_{j∈nbr(i)} d_j over queen adjacency of
    PRESENT cells, and with m2 = Σ d²/N (in d-units) the local
    statistic I_i = z_i·(Σ w_ij z_j)/m2 becomes

        i_ppm_i = (N · d_i · lag_i · 10⁶) DIV (Σ d²)

    evaluated in decimal(38,0)/HUGEINT with identical truncation on
    both engines.  Headroom: |d| ≤ N·x_max, |lag| ≤ 8·N·x_max, so the
    numerator is ≤ 8·N³·x_max²·10⁶ — with 10⁵ cells of ≤10⁷-point
    values that is ~8·10³⁵ < 10³⁸; beyond that pre-quantize the value
    column (the BM25_IDF_SCALE move).  Σd² = 0 (constant surface) →
    NULL i_ppm/quadrant, the genuine undefined case.  A cell whose 8
    neighbors are all ABSENT keeps lag = 0, i_ppm = 0, quadrant 'M0'
    — absent cells are outside the support, exactly as in
    :func:`tile_join_counts`.

    Quadrants: 'HH' (d>0, lag>0), 'LL' (d<0, lag<0), 'HL' (d>0,
    lag<0), 'LH' (d<0, lag>0), 'M0' when either side sits exactly on
    the mean (d = 0 or lag = 0) — ties are real under integer
    arithmetic and deserve their own label rather than a biased
    assignment.

    Plan: the ×8 fan and the adjacency join run on the AGGREGATE
    raster (|cells| rows, not the corpus); one groupBy(cell) builds
    the lag, one broadcast carries (N, S, Σd²).  Adjacency contract
    inherited: queen, present cells only, lon wrap (≥ 5 columns
    enforced), lat clamp.  Output: one row per present cell
    (cell, n_nbrs, d, lag, i_ppm, quadrant)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "for distinct queen neighbors under lon wrap"
        )
    vals = cells.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
    )
    dev = vals.crossJoin(F.broadcast(stats)).select(
        "cell",
        "_n",
        (F.col("_n") * F.col("_x") - F.col("_s")).alias("_d"),
    )
    dec = "decimal(38,0)"
    den = dev.agg(
        F.sum(F.expr(f"CAST(_d AS {dec}) * _d")).alias("_den")
    )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    nbrs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            nbrs.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = dev.select(
        F.col("_d").alias("_d_src"),
        F.explode(F.array_compact(F.array(*nbrs))).alias("cell"),
    )
    lag = (
        fan.join(dev.select("cell"), "cell")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("_d_src").alias("_lag"),
        )
    )
    return (
        dev.join(lag, "cell", "left")
        .crossJoin(F.broadcast(den))
        .select(
            "cell",
            F.coalesce("n_nbrs", F.lit(0)).cast("bigint").alias("n_nbrs"),
            F.col("_d").alias("d"),
            F.coalesce("_lag", F.lit(0)).cast("bigint").alias("lag"),
            F.expr(
                f"CAST(CASE WHEN _den = 0 THEN NULL ELSE "
                f"(CAST(_n AS {dec}) * _d * COALESCE(_lag, 0) * 1000000) "
                f"DIV _den END AS BIGINT)"
            ).alias("i_ppm"),
            F.expr(
                "CASE WHEN _den = 0 THEN NULL "
                "WHEN _d > 0 AND COALESCE(_lag, 0) > 0 THEN 'HH' "
                "WHEN _d < 0 AND COALESCE(_lag, 0) < 0 THEN 'LL' "
                "WHEN _d > 0 AND COALESCE(_lag, 0) < 0 THEN 'HL' "
                "WHEN _d < 0 AND COALESCE(_lag, 0) > 0 THEN 'LH' "
                "ELSE 'M0' END"
            ).alias("quadrant"),
        )
    )


def local_morans_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`local_morans` (standalone statement)."""
    return "WITH " + local_morans_ctes(src, value_col, res_deg)


def local_morans_ctes(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """The twin without the leading WITH; ``src`` must expose
    (cell, ``value_col``), one row per present cell.  HUGEINT mirrors
    decimal(38,0); ``//`` and DIV truncate identically."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    return f"""
        lm_src AS (
            SELECT cell, CAST({value_col} AS BIGINT) AS x FROM {src}
        ),
        lm_stats AS (
            SELECT COUNT(*) AS n, CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s
            FROM lm_src
        ),
        lm_dev AS (
            SELECT v.cell, t.n, t.n * v.x - t.s AS d
            FROM lm_src v CROSS JOIN lm_stats t
        ),
        lm_den AS (
            SELECT SUM(CAST(d AS HUGEINT) * d) AS den FROM lm_dev
        ),
        lm_fan AS (
            SELECT s.d AS d_src,
                   (((s.cell // {cols}) + dd.dy) * {cols}
                    + ((s.cell % {cols}) + dd.dx + {cols}) % {cols}) AS cell
            FROM lm_dev s CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                 (1,-1),(1,0),(1,1)) dd(dy, dx)
            WHERE (s.cell // {cols}) + dd.dy >= 0
              AND (s.cell // {cols}) + dd.dy < {rows_n}
        ),
        lm_lag AS (
            SELECT f.cell,
                   CAST(COUNT(*) AS BIGINT) AS n_nbrs,
                   CAST(SUM(f.d_src) AS BIGINT) AS lag
            FROM lm_fan f JOIN lm_dev s ON s.cell = f.cell
            GROUP BY 1
        )
        SELECT v.cell,
               COALESCE(l.n_nbrs, 0) AS n_nbrs,
               v.d,
               COALESCE(l.lag, 0) AS lag,
               CAST(CASE WHEN t.den = 0 THEN NULL ELSE
                    (CAST(v.n AS HUGEINT) * v.d * COALESCE(l.lag, 0)
                     * 1000000) // t.den END AS BIGINT) AS i_ppm,
               CASE WHEN t.den = 0 THEN NULL
                    WHEN v.d > 0 AND COALESCE(l.lag, 0) > 0 THEN 'HH'
                    WHEN v.d < 0 AND COALESCE(l.lag, 0) < 0 THEN 'LL'
                    WHEN v.d > 0 AND COALESCE(l.lag, 0) < 0 THEN 'HL'
                    WHEN v.d < 0 AND COALESCE(l.lag, 0) > 0 THEN 'LH'
                    ELSE 'M0' END AS quadrant
        FROM lm_dev v
        LEFT JOIN lm_lag l ON l.cell = v.cell
        CROSS JOIN lm_den t
    """


def bivariate_morans(
    cells: DataFrame,
    x_col: str,
    y_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Bivariate (cross-variable) local Moran's I — does field X here
    co-locate with field Y NEXT DOOR?  The two-phenomena question the
    univariate :func:`local_morans` can't ask: tainted-page intensity
    vs total crawl density, river cells vs flood-damage cells.  Per
    present cell, Anselin's bivariate LISA in the house integer form:

        dx_i = N·xᵢ − Σx,   lag_y_i = Σ_{j∈queen(i)} dy_j,
        ixy_ppm = (N·dx_i·lag_y_i·10⁶) DIV Σ dx²

    — the Moran-scatterplot-slope normalization (denominator is the
    X field's own scatter), which stays a pure rational: no sqrt, no
    float, decimal(38,0)/HUGEINT wide products, identical truncation
    both engines.  Quadrants label the (dx, lag_y) sign pattern
    (HH = X high amid high Y neighborhoods …), 'M0' for exact-zero
    ties, NULL statistic when X is constant (Σdx² = 0).

    Same physical contract as local_morans: the ×8 queen fan and the
    adjacency join run on the AGGREGATE raster; one groupBy(cell)
    builds the Y-lag; one broadcast carries (N, Σx, Σy, Σdx²); lon
    wrap (≥ 5 columns enforced), lat clamp, present cells only.

    Output: (cell, n_nbrs, dx, lag_y, ixy_ppm, quadrant)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "for distinct queen neighbors under lon wrap"
        )
    vals = cells.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
    )
    dev = vals.crossJoin(F.broadcast(stats)).select(
        "cell",
        "_n",
        (F.col("_n") * F.col("_x") - F.col("_sx")).alias("_dx"),
        (F.col("_n") * F.col("_y") - F.col("_sy")).alias("_dy"),
    )
    dec = "decimal(38,0)"
    den = dev.agg(
        F.sum(F.expr(f"CAST(_dx AS {dec}) * _dx")).alias("_den")
    )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    nbrs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            nbrs.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = dev.select(
        F.col("_dy").alias("_dy_src"),
        F.explode(F.array_compact(F.array(*nbrs))).alias("cell"),
    )
    lag = (
        fan.join(dev.select("cell"), "cell")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("_dy_src").alias("_lag"),
        )
    )
    return (
        dev.join(lag, "cell", "left")
        .crossJoin(F.broadcast(den))
        .select(
            "cell",
            F.coalesce("n_nbrs", F.lit(0)).cast("bigint").alias("n_nbrs"),
            F.col("_dx").alias("dx"),
            F.coalesce("_lag", F.lit(0)).cast("bigint").alias("lag_y"),
            F.expr(
                f"CAST(CASE WHEN _den = 0 THEN NULL ELSE "
                f"(CAST(_n AS {dec}) * _dx * COALESCE(_lag, 0) * 1000000) "
                f"DIV _den END AS BIGINT)"
            ).alias("ixy_ppm"),
            F.expr(
                "CASE WHEN _den = 0 THEN NULL "
                "WHEN _dx > 0 AND COALESCE(_lag, 0) > 0 THEN 'HH' "
                "WHEN _dx < 0 AND COALESCE(_lag, 0) < 0 THEN 'LL' "
                "WHEN _dx > 0 AND COALESCE(_lag, 0) < 0 THEN 'HL' "
                "WHEN _dx < 0 AND COALESCE(_lag, 0) > 0 THEN 'LH' "
                "ELSE 'M0' END"
            ).alias("quadrant"),
        )
    )


def bivariate_morans_ctes(
    src: str,
    x_col: str,
    y_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> str:
    """DuckDB twin of :func:`bivariate_morans` without the leading
    WITH; ``src`` exposes (cell, x, y), one row per present cell."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    return f"""
        bm_src AS (
            SELECT cell, CAST({x_col} AS BIGINT) AS x,
                   CAST({y_col} AS BIGINT) AS y
            FROM {src}
        ),
        bm_stats AS (
            SELECT COUNT(*) AS n,
                   CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
                   CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy
            FROM bm_src
        ),
        bm_dev AS (
            SELECT v.cell, t.n,
                   t.n * v.x - t.sx AS dx,
                   t.n * v.y - t.sy AS dy
            FROM bm_src v CROSS JOIN bm_stats t
        ),
        bm_den AS (
            SELECT SUM(CAST(dx AS HUGEINT) * dx) AS den FROM bm_dev
        ),
        bm_fan AS (
            SELECT s.dy AS dy_src,
                   (((s.cell // {cols}) + dd.dy) * {cols}
                    + ((s.cell % {cols}) + dd.dx + {cols}) % {cols})
                       AS cell
            FROM bm_dev s CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                 (1,-1),(1,0),(1,1)) dd(dy, dx)
            WHERE (s.cell // {cols}) + dd.dy >= 0
              AND (s.cell // {cols}) + dd.dy < {rows_n}
        ),
        bm_lag AS (
            SELECT f.cell,
                   CAST(COUNT(*) AS BIGINT) AS n_nbrs,
                   CAST(SUM(f.dy_src) AS BIGINT) AS lag_y
            FROM bm_fan f JOIN bm_dev s ON s.cell = f.cell
            GROUP BY 1
        )
        SELECT v.cell,
               COALESCE(l.n_nbrs, 0) AS n_nbrs,
               v.dx,
               COALESCE(l.lag_y, 0) AS lag_y,
               CAST(CASE WHEN t.den = 0 THEN NULL ELSE
                    (CAST(v.n AS HUGEINT) * v.dx * COALESCE(l.lag_y, 0)
                     * 1000000) // t.den END AS BIGINT) AS ixy_ppm,
               CASE WHEN t.den = 0 THEN NULL
                    WHEN v.dx > 0 AND COALESCE(l.lag_y, 0) > 0 THEN 'HH'
                    WHEN v.dx < 0 AND COALESCE(l.lag_y, 0) < 0 THEN 'LL'
                    WHEN v.dx > 0 AND COALESCE(l.lag_y, 0) < 0 THEN 'HL'
                    WHEN v.dx < 0 AND COALESCE(l.lag_y, 0) > 0 THEN 'LH'
                    ELSE 'M0' END AS quadrant
        FROM bm_dev v
        LEFT JOIN bm_lag l ON l.cell = v.cell
        CROSS JOIN bm_den t
    """


def turn_stats(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-entity heading-sector and turn statistics over timestamp-
    ordered point streams — the movement-pattern profile of a
    trajectory (commute-like straight runs vs zigzag search patterns
    vs U-turn-heavy loops), the directional companion of
    :func:`trip_segments`' length/gap profile.

    EXACT-integer geometry: coordinates snap once to µdeg
    (round(deg·10⁶) → bigint), step vectors are integer (dx, dy), and
    the 8 compass sectors (0=E, 1=NE, 2=N, … 7=SE, counter-clockwise)
    come from sign/|·| comparisons only — |dx| > |dy| picks the
    cardinal, |dx| = |dy| ≠ 0 the diagonal; no atan2, no floats, so
    both engines agree bit-for-bit.  A zero-motion step is STATIONARY
    (NULL sector) and breaks the turn chain (no turn on either side).
    Turns classify by the CCW sector delta pmod 8: 0 straight, 1–3
    left, 4 U-turn, 5–7 right.

    Plan: both lags (prev point, prev sector) ride ONE
    partitionBy(id) orderBy(ts, tiebreak) sort — a single hash
    shuffle — then one map-side-combining groupBy(id) with 8 fixed
    conditional sector counts; the modal sector is a chained-CASE
    argmax over those 8 columns (ties → lowest sector), never a
    second aggregation.  Pass ``tiebreak`` whenever ``ts`` is not
    unique per entity (the trip_segments determinism contract).

    Output: id, n_steps, n_moving, n_straight, n_left, n_right,
    n_uturn, modal_sector (NULL when no moving steps)."""
    order_cols = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    wu = W.partitionBy(id_col).orderBy(*order_cols)
    ux = F.round(F.col(lon) * 1_000_000).cast("bigint")
    uy = F.round(F.col(lat) * 1_000_000).cast("bigint")
    pt = points.select(
        F.col(id_col),
        *[F.col(c) for c in tiebreak],
        F.col(ts_col),
        ux.alias("_x"),
        uy.alias("_y"),
        F.lag(ux).over(wu).alias("_px"),
        F.lag(uy).over(wu).alias("_py"),
    )
    steps = pt.where(F.col("_px").isNotNull()).select(
        F.col(id_col),
        *[F.col(c) for c in tiebreak],
        F.col(ts_col),
        (F.col("_x") - F.col("_px")).alias("_dx"),
        (F.col("_y") - F.col("_py")).alias("_dy"),
    )
    adx, ady = F.abs(F.col("_dx")), F.abs(F.col("_dy"))
    sector = (
        F.when((F.col("_dx") == 0) & (F.col("_dy") == 0), F.lit(None))
        .when((adx > ady) & (F.col("_dx") > 0), F.lit(0))
        .when((adx > ady), F.lit(4))
        .when((ady > adx) & (F.col("_dy") > 0), F.lit(2))
        .when((ady > adx), F.lit(6))
        .when((F.col("_dx") > 0) & (F.col("_dy") > 0), F.lit(1))
        .when((F.col("_dx") < 0) & (F.col("_dy") > 0), F.lit(3))
        .when((F.col("_dx") < 0) & (F.col("_dy") < 0), F.lit(5))
        .otherwise(F.lit(7))
        .cast("int")
    )
    ws = W.partitionBy(id_col).orderBy(*order_cols)
    st = steps.withColumn("_s", sector).withColumn(
        "_ps", F.lag("_s").over(ws)
    )
    delta = F.pmod(F.col("_s") - F.col("_ps"), F.lit(8))
    turn = F.when(
        F.col("_s").isNotNull() & F.col("_ps").isNotNull(), delta
    )
    st = st.withColumn("_t", turn)
    cnts = [
        F.sum((F.col("_s") == i).cast("bigint")).alias(f"_c{i}")
        for i in range(8)
    ]
    agg = st.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum(F.col("_s").isNotNull().cast("bigint")).alias("n_moving"),
        F.sum((F.col("_t") == 0).cast("bigint")).alias("n_straight"),
        F.sum(F.col("_t").isin(1, 2, 3).cast("bigint")).alias("n_left"),
        F.sum(F.col("_t").isin(5, 6, 7).cast("bigint")).alias("n_right"),
        F.sum((F.col("_t") == 4).cast("bigint")).alias("n_uturn"),
        *cnts,
    )
    m = F.greatest(*[F.col(f"_c{i}") for i in range(8)])
    modal = F.when(m == 0, F.lit(None))
    for i in range(8):
        modal = modal.when(F.col(f"_c{i}") == m, F.lit(i))
    return agg.select(
        id_col, "n_steps", "n_moving", "n_straight", "n_left",
        "n_right", "n_uturn", modal.cast("int").alias("modal_sector"),
    )


def turn_stats_sql(
    src: str,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`turn_stats` — identical µdeg snap,
    sector CASE, pmod spelling ``((d % 8) + 8) % 8``, and chained-CASE
    modal argmax.  CTE names tn_*-namespaced."""
    ob = ", ".join([ts_col] + list(tiebreak))
    tb_cols = "".join(f", {c}" for c in tiebreak)
    sec = """
        CASE WHEN _dx = 0 AND _dy = 0 THEN NULL
             WHEN abs(_dx) > abs(_dy) AND _dx > 0 THEN 0
             WHEN abs(_dx) > abs(_dy) THEN 4
             WHEN abs(_dy) > abs(_dx) AND _dy > 0 THEN 2
             WHEN abs(_dy) > abs(_dx) THEN 6
             WHEN _dx > 0 AND _dy > 0 THEN 1
             WHEN _dx < 0 AND _dy > 0 THEN 3
             WHEN _dx < 0 AND _dy < 0 THEN 5
             ELSE 7 END
    """
    c_cols = ",\n".join(
        f"CAST(COALESCE(SUM(CASE WHEN _s = {i} THEN 1 ELSE 0 END), 0) "
        f"AS BIGINT) AS _c{i}"
        for i in range(8)
    )
    modal_case = " ".join(
        f"WHEN _c{i} = _m THEN {i}" for i in range(8)
    )
    return f"""
        WITH tn_pt AS (
            SELECT {id_col}{tb_cols}, {ts_col},
                   CAST(round({lon} * 1000000) AS BIGINT) AS _x,
                   CAST(round({lat} * 1000000) AS BIGINT) AS _y,
                   LAG(CAST(round({lon} * 1000000) AS BIGINT))
                       OVER (PARTITION BY {id_col} ORDER BY {ob}) AS _px,
                   LAG(CAST(round({lat} * 1000000) AS BIGINT))
                       OVER (PARTITION BY {id_col} ORDER BY {ob}) AS _py
            FROM {src}
        ),
        tn_step AS (
            SELECT {id_col}{tb_cols}, {ts_col},
                   _x - _px AS _dx, _y - _py AS _dy
            FROM tn_pt WHERE _px IS NOT NULL
        ),
        tn_sec AS (
            SELECT {id_col}{tb_cols}, {ts_col}, ({sec}) AS _s
            FROM tn_step
        ),
        tn_turn AS (
            SELECT {id_col}, _s,
                   CASE WHEN _s IS NOT NULL AND _ps IS NOT NULL
                        THEN (((_s - _ps) % 8) + 8) % 8 END AS _t
            FROM (SELECT {id_col}{tb_cols}, {ts_col}, _s,
                         LAG(_s) OVER (PARTITION BY {id_col}
                                       ORDER BY {ob}) AS _ps
                  FROM tn_sec)
        ),
        tn_agg AS (
            SELECT {id_col},
                   CAST(COUNT(*) AS BIGINT) AS n_steps,
                   CAST(COALESCE(SUM(CASE WHEN _s IS NOT NULL
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_moving,
                   CAST(COALESCE(SUM(CASE WHEN _t = 0 THEN 1 ELSE 0 END),
                                 0) AS BIGINT) AS n_straight,
                   CAST(COALESCE(SUM(CASE WHEN _t IN (1,2,3)
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_left,
                   CAST(COALESCE(SUM(CASE WHEN _t IN (5,6,7)
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_right,
                   CAST(COALESCE(SUM(CASE WHEN _t = 4 THEN 1 ELSE 0 END),
                                 0) AS BIGINT) AS n_uturn,
                   {c_cols}
            FROM tn_turn GROUP BY {id_col}
        )
        SELECT {id_col}, n_steps, n_moving, n_straight, n_left,
               n_right, n_uturn,
               CAST(CASE WHEN _m = 0 THEN NULL {modal_case} END
                    AS INTEGER) AS modal_sector
        FROM (SELECT *,
                     GREATEST(_c0,_c1,_c2,_c3,_c4,_c5,_c6,_c7) AS _m
              FROM tn_agg)
    """


def colocation_pairs(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    window_s: int = 3600,
    max_cell_bucket: int = 10_000,
) -> DataFrame:
    """Spatio-temporal co-location: unordered entity pairs with events
    in the SAME-OR-ADJACENT grid cell (the kNN family's 3×3 wrapped
    topology) within ``window_s`` seconds — the contact/co-presence
    detector (shared-session devices, convoy detection, same-place-
    same-time dedup of crawl sources).  Cell-granular by contract:
    the cell size IS the spatial tolerance (compose with
    :func:`radius_join` for exact-distance refinement).

    Exactly-once pair counting by construction: only the LEFT side
    fans out (9 spatial probes × {−1, 0, +1} time buckets = 27), the
    right side keeps its raw (cell, bucket), so a qualifying event
    pair matches exactly ONE probe; the ``id_a < id_b`` restriction
    then keeps exactly one of the two directions.  Bucket width =
    ``window_s`` guarantees any |Δt| ≤ window_s pair differs by at
    most one bucket (the as-of union trick's bucketed sibling); the
    exact |Δt| filter runs AFTER the equi-join, all integer µs.

    Scale: one equi-join on (cell, bucket) — dense cell×bucket keys
    are the quadratic risk, guarded LOUDLY (``assert_true`` over the
    right-side (cell, bucket) occupancy riding a used column; the
    common_neighbor_pairs contract: pre-thin hot cells yourself and
    own the decision).  AQE's skew-join covers moderate skew.

    Output: (id_a, id_b, n_moments, first_us, last_us) — pair
    totals over all co-located event pairs."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "for wrap-unambiguous 3×3 probing"
        )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    win_us = int(window_s) * 1_000_000
    # base is consumed twice (fan + right side); checkpoint it so an
    # expensive upstream (the typical per-entity window geocode) runs
    # once per execution instead of once per consumer
    base = points.select(
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        grid_cell(F.col(lon), F.col(lat), res_deg).alias("_cell"),
        (us - F.pmod(us, F.lit(win_us))).alias("_bk0"),
    ).withColumn(
        "_bk", (F.col("_bk0") / F.lit(win_us)).cast("bigint")
    ).localCheckpoint(eager=True)
    guard = F.assert_true(
        F.col("_occ") <= F.lit(int(max_cell_bucket)),
        F.lit(
            f"cell×bucket occupancy exceeds max_cell_bucket="
            f"{max_cell_bucket} in colocation_pairs; the pair join is "
            "quadratic per key — thin hot cells explicitly or raise "
            "the cap"
        ),
    )
    # occupancy as a window count over the join key the right side must
    # shuffle on anyway — replaces the former groupBy + join-back (one
    # exchange and one whole extra pass over the right side removed);
    # identical _occ per row, identical guard semantics
    right = base.select(
        F.col("_id").alias("id_b"),
        F.col("_us").alias("us_b"),
        F.col("_cell").alias("_rcell"),
        F.col("_bk").alias("_rbk"),
    ).withColumn(
        "_occ", F.count(F.lit(1)).over(W.partitionBy("_rcell", "_rbk"))
    ).select(
        "id_b",
        F.when(guard.isNull(), F.col("us_b")).alias("us_b"),
        "_rcell", "_rbk",
    )
    lat_b = F.floor(F.col("_cell") / F.lit(cols))
    lon_b = F.col("_cell") % F.lit(cols)
    probes = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            probes.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = base.select(
        F.col("_id").alias("id_a"),
        F.col("_us").alias("us_a"),
        F.explode(
            F.array_distinct(F.array_compact(F.array(*probes)))
        ).alias("_rcell"),
        F.col("_bk"),
    ).select(
        "id_a", "us_a", "_rcell",
        F.explode(
            F.array(F.col("_bk") - 1, F.col("_bk"), F.col("_bk") + 1)
        ).alias("_rbk"),
    )
    # join-side choice, size-adaptive at runtime: the checkpoint above
    # erases Catalyst's size estimate (LogicalRDD defaults to "huge"),
    # which would silently force a sort-merge join here — so re-derive
    # the decision from the REAL row count (a bounded single-value
    # action on the already-materialized base).  Small right side →
    # broadcast (the 27× fan side is then never shuffled at all);
    # otherwise shuffled-hash with the un-fanned side as build (the
    # pair stream feeds a hash aggregate, so an SMJ sort could never
    # be reused; build memory per partition is bounded by the
    # occupancy guard).  Same rows either way — strategy only.
    thresh = _broadcast_threshold_bytes(points.sparkSession)
    if base.count() * 48 <= thresh:  # ~48 B/row of 4 int64 + overhead
        right = F.broadcast(right)
    else:
        right = right.hint("shuffle_hash")
    paired = (
        fan.join(right, ["_rcell", "_rbk"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= F.lit(win_us))
        )
    )
    return paired.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_moments"),
        F.least(F.min("us_a"), F.min("us_b")).alias("first_us"),
        F.greatest(F.max("us_a"), F.max("us_b")).alias("last_us"),
    )


def colocation_pairs_sql(
    src: str,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    window_s: int = 3600,
) -> str:
    """DuckDB twin of :func:`colocation_pairs` (no occupancy guard —
    the operator owns the loud failure): identical grid/bucket
    arithmetic, 27-probe fan, exactly-once predicate.  CTE names
    cl_*-namespaced."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    win_us = int(window_s) * 1_000_000
    return f"""
        WITH cl_base AS (
            -- eid gives duplicate events distinct identities, so the
            -- probe-dedup DISTINCT below (the twin of Spark's per-row
            -- array_distinct) can never merge two real events
            SELECT {id_col} AS id, epoch_us({ts_col}) AS us,
                   {grid_cell_sql(lon, lat, res_deg)} AS cell,
                   epoch_us({ts_col}) // {win_us} AS bk,
                   ROW_NUMBER() OVER (ORDER BY {id_col}, {ts_col}) AS eid
            FROM {src}
        ),
        cl_fan AS (
            SELECT DISTINCT b.eid, b.id, b.us, b.bk + db.db AS rbk,
                   (((b.cell // {cols}) + d.dy) * {cols}
                    + ((b.cell % {cols}) + d.dx + {cols}) % {cols})
                       AS rcell
            FROM cl_base b
            CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                               (1,-1),(1,0),(1,1)) d(dy, dx)
            CROSS JOIN (VALUES (-1),(0),(1)) db(db)
            WHERE (b.cell // {cols}) + d.dy >= 0
              AND (b.cell // {cols}) + d.dy < {rows_n}
        ),
        cl_pairs AS (
            SELECT f.id AS id_a, r.id AS id_b, f.us AS us_a, r.us AS us_b
            FROM cl_fan f
            JOIN cl_base r ON r.cell = f.rcell AND r.bk = f.rbk
            WHERE f.id < r.id AND abs(f.us - r.us) <= {win_us}
        )
        SELECT id_a, id_b,
               CAST(COUNT(*) AS BIGINT) AS n_moments,
               LEAST(MIN(us_a), MIN(us_b)) AS first_us,
               GREATEST(MAX(us_a), MAX(us_b)) AS last_us
        FROM cl_pairs GROUP BY 1, 2
    """


def resample_track(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    step_s: int = 900,
) -> DataFrame:
    """Fixed-grid trajectory resampling with exact LINEAR
    interpolation — the normalization step trajectory analytics needs
    before cross-entity comparison (irregular GPS fixes → one row per
    entity per grid tick): at every ``step_s``-aligned instant inside
    an entity's observation span, the position interpolated between
    the bracketing fixes.  The as-of family answers "last known
    value" (step interpolation); this is the between-fixes estimate.

    Exact arithmetic: fixes quantize once to (µs, µdeg); the
    interpolated coordinate is prev + (Δcoord·(g−t₁)) DIV (t₂−t₁) —
    one trunc division per axis in decimal(38,0)/HUGEINT (Δ·gap can
    pass int64 on day-long gaps), identical on both engines, so every
    resampled point hash-verifies.  A fix exactly on a grid tick is
    reproduced verbatim (t₂ = t₁ guard).  Duplicate fixes at one
    (entity, instant) reduce deterministically to the min (x, y)
    struct BEFORE bracketing.

    Plan: the grid generates from a per-entity (min, max) aggregate
    (one explode of an arithmetic sequence — never a calendar table);
    both bracket carries (prev fix, next fix) are IGNORE-NULLS window
    carries over the fixes ∪ grid union, sharing ONE hash shuffle on
    the entity key (two sorts, the asof_join union trick run in both
    directions; equal-instant ordering puts the fix before the grid
    row on both passes, so an on-tick fix is its own bracket).

    Output: (id, g_us, x_u, y_u) — µs grid instant, µdeg position."""
    if step_s < 1:
        raise ValueError(f"step_s must be ≥ 1: {step_s}")
    step_us = int(step_s) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    fixes = (
        points.select(
            F.col(id_col).alias("_id"),
            us.alias("_t"),
            F.struct(
                F.round(F.col(lon) * 1_000_000).cast("bigint").alias("x"),
                F.round(F.col(lat) * 1_000_000).cast("bigint").alias("y"),
            ).alias("_p"),
        )
        .groupBy("_id", "_t")
        .agg(F.min("_p").alias("_p"))
        .select(
            "_id", "_t",
            F.col("_p.x").alias("_x"), F.col("_p.y").alias("_y"),
        )
    )
    span = fixes.groupBy("_id").agg(
        F.min("_t").alias("_tmin"), F.max("_t").alias("_tmax")
    )
    gstart = F.expr(f"((_tmin + {step_us} - 1) DIV {step_us}) * "
                    f"CAST({step_us} AS BIGINT)")
    gend = F.expr(f"(_tmax DIV {step_us}) * CAST({step_us} AS BIGINT)")
    grid = (
        span.select(
            "_id", gstart.alias("_gs"), gend.alias("_ge")
        )
        .where(F.col("_gs") <= F.col("_ge"))
        .select(
            "_id",
            F.explode(
                F.sequence("_gs", "_ge", F.lit(step_us))
            ).alias("_t"),
        )
    )
    u = fixes.select(
        "_id", "_t", F.lit(0).alias("_side"), "_x", "_y"
    ).unionByName(
        grid.select(
            "_id", "_t", F.lit(1).alias("_side"),
            F.lit(None).cast("bigint").alias("_x"),
            F.lit(None).cast("bigint").alias("_y"),
        )
    )
    wf = (
        W.partitionBy("_id")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wb = (
        W.partitionBy("_id")
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ft = F.when(F.col("_side") == 0, F.col("_t"))
    carried = (
        u.withColumn("_pt", F.last(ft, ignorenulls=True).over(wf))
        .withColumn("_px", F.last("_x", ignorenulls=True).over(wf))
        .withColumn("_py", F.last("_y", ignorenulls=True).over(wf))
        .withColumn("_nt", F.last(ft, ignorenulls=True).over(wb))
        .withColumn("_nx", F.last("_x", ignorenulls=True).over(wb))
        .withColumn("_ny", F.last("_y", ignorenulls=True).over(wb))
    )
    dec = "decimal(38,0)"
    interp_x = F.expr(
        f"CASE WHEN _nt = _pt THEN _px ELSE CAST(_px + "
        f"(CAST(_nx - _px AS {dec}) * (_t - _pt)) DIV (_nt - _pt) "
        f"AS BIGINT) END"
    )
    interp_y = F.expr(
        f"CASE WHEN _nt = _pt THEN _py ELSE CAST(_py + "
        f"(CAST(_ny - _py AS {dec}) * (_t - _pt)) DIV (_nt - _pt) "
        f"AS BIGINT) END"
    )
    return carried.where(F.col("_side") == 1).select(
        F.col("_id").alias(id_col),
        F.col("_t").alias("g_us"),
        interp_x.alias("x_u"),
        interp_y.alias("y_u"),
    )


def resample_track_sql(
    src: str,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    step_s: int = 900,
) -> str:
    """DuckDB twin of :func:`resample_track` — identical quantization,
    grid arithmetic, IGNORE NULLS carries, and HUGEINT trunc-div
    interpolation.  CTE names rs_*-namespaced."""
    step_us = int(step_s) * 1_000_000
    return f"""
        WITH rs_fix AS (
            SELECT id, t, MIN({{'x': x, 'y': y}}) AS p
            FROM (
                SELECT {id_col} AS id, epoch_us({ts_col}) AS t,
                       CAST(round({lon} * 1000000) AS BIGINT) AS x,
                       CAST(round({lat} * 1000000) AS BIGINT) AS y
                FROM {src}
            ) GROUP BY id, t
        ),
        rs_fix2 AS (
            SELECT id, t, (p).x AS x, (p).y AS y FROM rs_fix
        ),
        rs_span AS (
            SELECT id,
                   ((MIN(t) + {step_us} - 1) // {step_us}) * {step_us}
                       AS gs,
                   (MAX(t) // {step_us}) * {step_us} AS ge
            FROM rs_fix2 GROUP BY id
        ),
        rs_grid AS (
            SELECT id, g.g AS t
            FROM rs_span,
                 LATERAL (SELECT UNNEST(generate_series(gs, ge,
                     CAST({step_us} AS BIGINT))) AS g) g
            WHERE gs <= ge
        ),
        rs_u AS (
            SELECT id, t, 0 AS side, x, y FROM rs_fix2
            UNION ALL
            SELECT id, t, 1 AS side, NULL, NULL FROM rs_grid
        ),
        rs_c AS (
            SELECT id, t, side,
                   last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
                       OVER wf AS pt,
                   last_value(x IGNORE NULLS) OVER wf AS px,
                   last_value(y IGNORE NULLS) OVER wf AS py,
                   last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
                       OVER wb AS nt,
                   last_value(x IGNORE NULLS) OVER wb AS nx,
                   last_value(y IGNORE NULLS) OVER wb AS ny
            FROM rs_u
            WINDOW wf AS (PARTITION BY id ORDER BY t ASC, side ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW),
                   wb AS (PARTITION BY id ORDER BY t DESC, side ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
        )
        SELECT id AS {id_col}, t AS g_us,
               CAST(CASE WHEN nt = pt THEN px ELSE
                    px + (CAST(nx - px AS HUGEINT) * (t - pt))
                         // (nt - pt) END AS BIGINT) AS x_u,
               CAST(CASE WHEN nt = pt THEN py ELSE
                    py + (CAST(ny - py AS HUGEINT) * (t - pt))
                         // (nt - pt) END AS BIGINT) AS y_u
        FROM rs_c WHERE side = 1
    """


def flow_direction(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """D8 flow direction over the aggregate raster — each cell points
    at its steepest-DESCENT queen neighbor (strictly lower only; a
    cell with no lower present neighbor is a sink/pit, d8_cell NULL).
    The hydrology classic generalizes to any intensity surface: on a
    traffic raster the pointers trace drainage toward low-activity
    basins, and :func:`flow_accumulation` then sizes each cell's
    upstream catchment.

    Determinism: ties on the drop resolve to the SMALLEST neighbor
    cell id — a total order, so the pointer forest is unique at any
    parallelism.  Strict descent (drop > 0) makes the pointer graph
    acyclic by construction: every edge strictly decreases the value,
    so no cycle can close — the invariant flow_accumulation's
    convergence proof rides on.  Adjacency contract inherited from the
    raster family: queen, PRESENT cells only, lon wrap, lat clamp.

    Plan: ×8 fan + one equi-join on the AGGREGATE raster, then the
    per-cell argmax inside a cell-partitioned window (keyed — never a
    global sort).  Output: (cell, v, d8_cell, drop_v); drop_v NULL on
    sinks."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    vals = cells.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    nbrs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            nbrs.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = vals.select(
        "cell",
        "v",
        F.explode(
            F.array_distinct(F.array_compact(F.array(*nbrs)))
        ).alias("_nbr"),
    )
    dropped = fan.join(
        vals.select(F.col("cell").alias("_nbr"), F.col("v").alias("_nv")),
        "_nbr",
    ).where(F.col("v") > F.col("_nv"))
    w = W.partitionBy("cell").orderBy(
        (F.col("v") - F.col("_nv")).desc(), F.col("_nbr")
    )
    best = (
        dropped.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "cell",
            F.col("_nbr").alias("d8_cell"),
            (F.col("v") - F.col("_nv")).alias("drop_v"),
        )
    )
    return vals.join(best, "cell", "left").select(
        "cell", "v", "d8_cell", "drop_v"
    )


def flow_accumulation(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    max_rounds: int = 40,
) -> DataFrame:
    """D8 flow accumulation: for every cell, the EXACT number of
    upstream cells whose flow path (following :func:`flow_direction`
    pointers) passes through it — catchment size on a terrain raster,
    cumulative drainage on an intensity surface.  acc = 0 at ridges,
    large at basin mouths.

    Algorithm — Wyllie pointer jumping with weighted carries, O(log L)
    rounds for longest flow path L (never the O(L) one-hop push):
    every cell starts with val = 1 (itself), acc = 0, succ = its D8
    pointer.  Each synchronous round, every cell with a live pointer
    sends its round-start val to succ; receivers fold the received sum
    into BOTH acc and val; then every pointer doubles
    (succ ← succ∘succ, round-start values).  Invariant (induction on
    r): after round r, val(u) counts the cells within 2ʳ−1 upstream of
    u inclusive, acc(u) the strict ones, and succ(u) = s^(2ʳ)(u);
    round r+1 delivers exactly the [2ʳ, 2ʳ⁺¹−1] band — each upstream
    w at distance d from v routes through the UNIQUE intermediate
    u = s^(d−2ʳ)(w) with s^(2ʳ)(u) = v, so no band element is dropped
    or double-counted.  Termination: flow_direction's strict descent
    makes the pointer graph a forest toward sinks, so pointers null
    out in ⌈log₂ L⌉+1 rounds; a non-converged loop after
    ``max_rounds`` (impossible on a forest unless L > 2^max_rounds)
    raises — the house loud-failure contract, not a silent partial
    count.

    Plan per round: one (succ) equi-join for the carry delivery + one
    self-join for the doubling, lineage cut by localCheckpoint (the
    iterative-operator pattern shared with graph.min_label_components
    / pagerank).  All counts int64.  Output:
    (cell, v, d8_cell, acc)."""
    d8 = flow_direction(cells, value_col, res_deg).localCheckpoint(
        eager=True
    )
    state = d8.select(
        "cell",
        F.col("d8_cell").alias("_succ"),
        F.lit(1).cast("bigint").alias("_val"),
        F.lit(0).cast("bigint").alias("_acc"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        live = state.where(F.col("_succ").isNotNull())
        if live.isEmpty():
            break
        recv = live.groupBy(F.col("_succ").alias("cell")).agg(
            F.sum("_val").alias("_in")
        )
        jump = state.select(
            F.col("cell").alias("_jc"), F.col("_succ").alias("_js")
        )
        state = (
            state.join(recv, "cell", "left")
            .join(jump, F.col("_succ") == F.col("_jc"), "left")
            .select(
                "cell",
                F.col("_js").alias("_succ"),
                (F.col("_val") + F.coalesce("_in", F.lit(0))).alias("_val"),
                (F.col("_acc") + F.coalesce("_in", F.lit(0))).alias("_acc"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"flow_accumulation: pointers still live after "
            f"max_rounds={max_rounds} (flow path longer than "
            f"2^{max_rounds} cells, or a cycle — which strict descent "
            "forbids). Raise max_rounds."
        )
    return d8.join(
        state.select("cell", F.col("_acc").alias("acc")), "cell"
    ).select("cell", "v", "d8_cell", "acc")


def basin_label(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    max_rounds: int = 40,
) -> DataFrame:
    """Watershed labeling over the D8 pointer forest — every cell
    labeled by its TERMINAL SINK (the pit its flow path drains into)
    plus the basin's size: the segmentation companion of
    :func:`flow_accumulation` (accumulation says how much drains
    THROUGH a cell; basins say which cells drain TOGETHER — drainage
    regions on terrain, attraction regions around low-activity pits
    on an intensity raster).

    Algorithm: pointer jumping on p(u) = d8(u), sinks self-looped —
    p ← p∘p each round squares the distance-to-sink covered, so the
    forest collapses onto its roots in ⌈log₂ L⌉ rounds (the
    flow_accumulation / min-label-components doubling family); a
    round whose pointers all rest on sinks terminates.  Strict
    descent guarantees the forest (no cycles), and the smallest-id
    tie-break in :func:`flow_direction` makes the label assignment
    unique at any parallelism.  ``max_rounds`` exhaustion raises
    (loud, the house rule).

    Plan per round: ONE self-equi-join (the composition) + one
    broadcastable sink-flag join for the convergence test, lineage
    cut per round.  Basin sizes are one groupBy over the final
    labels.  The DuckDB oracle WALKS each path with a recursive CTE
    — one hop per recursion step — so the doubling shortcut itself
    is hash-verified against the definitional walk.

    Output: (cell, v, basin, basin_size, is_sink)."""
    d8 = flow_direction(cells, value_col, res_deg).localCheckpoint(
        eager=True
    )
    flags = d8.select(
        F.col("cell").alias("_fc"),
        F.col("d8_cell").isNull().alias("_fsink"),
    )
    # the state carries "does my pointer rest on a sink" (_ps) — the
    # jump join hands over the target's flag for free, so the per-round
    # convergence test is an isEmpty probe on the checkpoint instead of
    # a separate sink-flag join job; same rounds, same final pointers
    state = (
        d8.select(
            "cell", F.coalesce("d8_cell", F.col("cell")).alias("_p")
        )
        .join(flags, F.col("_p") == flags["_fc"])
        .select("cell", "_p", F.col("_fsink").alias("_ps"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        if state.where(~F.col("_ps")).isEmpty():
            break
        jump = state.select(
            F.col("cell").alias("_jc"),
            F.col("_p").alias("_jp"),
            F.col("_ps").alias("_jps"),
        )
        state = (
            state.join(jump, state["_p"] == F.col("_jc"))
            .select(
                "cell",
                F.col("_jp").alias("_p"),
                F.col("_jps").alias("_ps"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"basin_label: pointers not settled after "
            f"max_rounds={max_rounds} (flow path longer than "
            f"2^{max_rounds} cells, or a cycle — which strict descent "
            "forbids). Raise max_rounds."
        )
    labels = state.select("cell", F.col("_p").alias("basin"))
    sizes = labels.groupBy("basin").agg(
        F.count(F.lit(1)).cast("bigint").alias("basin_size")
    )
    return (
        d8.join(labels, "cell")
        .join(sizes, "basin")
        .select(
            "cell",
            "v",
            "basin",
            "basin_size",
            F.col("d8_cell").isNull().alias("is_sink"),
        )
    )


def basin_label_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`basin_label` — the definitional one-hop
    recursive walk to the sink (vs the engine's doubling), standalone
    WITH RECURSIVE."""
    return (
        "WITH RECURSIVE "
        + basin_label_ctes(src, value_col, res_deg)
    )


def basin_label_ctes(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """Twin CTE chain without the leading WITH RECURSIVE (for
    composition into the pages prelude)."""
    return f"""
        {_flow_d8_ctes(src, value_col, res_deg)},
        bl_d8 AS (
            SELECT s.cell, s.v, b.d8_cell
            FROM fd_src s LEFT JOIN fd_best b ON b.cell = s.cell
        ),
        bl_walk AS (
            SELECT cell, COALESCE(d8_cell, cell) AS cur FROM bl_d8
            UNION ALL
            SELECT w.cell, b.d8_cell AS cur
            FROM bl_walk w JOIN bl_d8 b ON b.cell = w.cur
            WHERE b.d8_cell IS NOT NULL
        ),
        bl_basin AS (
            SELECT w.cell, w.cur AS basin
            FROM bl_walk w JOIN bl_d8 s ON s.cell = w.cur
            WHERE s.d8_cell IS NULL
        ),
        bl_sizes AS (
            SELECT basin, CAST(COUNT(*) AS BIGINT) AS basin_size
            FROM bl_basin GROUP BY 1
        )
        SELECT d.cell, d.v, b.basin, z.basin_size,
               d.d8_cell IS NULL AS is_sink
        FROM bl_d8 d
        JOIN bl_basin b ON b.cell = d.cell
        JOIN bl_sizes z ON z.basin = b.basin
    """


def _flow_d8_ctes(src: str, value_col: str, res_deg: float) -> str:
    """Shared D8 CTE chain for the DuckDB twins (no leading WITH)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    return f"""
        fd_src AS (
            SELECT cell, CAST({value_col} AS BIGINT) AS v FROM {src}
        ),
        fd_fan AS (
            SELECT s.cell, s.v,
                   (((s.cell // {cols}) + d.dy) * {cols}
                    + ((s.cell % {cols}) + d.dx + {cols}) % {cols}) AS nbr
            FROM fd_src s CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
            WHERE (s.cell // {cols}) + d.dy >= 0
              AND (s.cell // {cols}) + d.dy < {rows_n}
        ),
        fd_best AS (
            SELECT cell, nbr AS d8_cell, dv AS drop_v FROM (
                SELECT f.cell, f.nbr, f.v - t.v AS dv,
                       ROW_NUMBER() OVER (PARTITION BY f.cell
                                          ORDER BY f.v - t.v DESC, f.nbr)
                           AS rn
                FROM fd_fan f JOIN fd_src t ON t.cell = f.nbr
                WHERE f.v > t.v
            ) WHERE rn = 1
        )
    """


def flow_direction_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`flow_direction` (standalone)."""
    return f"""
        WITH {_flow_d8_ctes(src, value_col, res_deg)}
        SELECT s.cell, s.v, b.d8_cell, b.drop_v
        FROM fd_src s LEFT JOIN fd_best b USING (cell)
    """


def flow_accumulation_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`flow_accumulation` — a structurally
    DIFFERENT algorithm (recursive-CTE path membership: acc(v) =
    |{(u, k): s^k(u) = v}|), so the hash match verifies the pointer-
    jumping band argument against the plain transitive definition.
    Standalone statement (WITH RECURSIVE)."""
    return f"""
        WITH RECURSIVE {_flow_d8_ctes(src, value_col, res_deg)},
        fa_up(u, v) AS (
            SELECT cell AS u, d8_cell AS v FROM fd_best
            UNION ALL
            SELECT fa_up.u, d.d8_cell
            FROM fa_up JOIN fd_best d ON d.cell = fa_up.v
        ),
        fa_acc AS (
            SELECT v AS cell, CAST(COUNT(*) AS BIGINT) AS acc
            FROM fa_up GROUP BY 1
        )
        SELECT s.cell, s.v, b.d8_cell, COALESCE(a.acc, 0) AS acc
        FROM fd_src s
        LEFT JOIN fd_best b USING (cell)
        LEFT JOIN fa_acc a USING (cell)
    """


def areal_interp(
    src_rects: DataFrame,
    tgt_rects: DataFrame,
    res_udeg: int,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
    value_col: str = "value",
    max_cells: int = 256,
) -> DataFrame:
    """Areal interpolation (area-weighted reaggregation): transfer an
    extensive value (population, bytes, token counts) from SOURCE
    rectangles to an incompatible TARGET zone layer, each source
    contributing value·|src ∩ tgt| DIV |src| — the GIS answer to
    "re-base census blocks onto my tiles" under the standard uniform-
    density assumption.

    EXACT integer geometry end-to-end: bounds are integer µdeg
    (callers snap once — the stay_points float-boundary lesson), the
    PBSM grid is integer division on POLE-SHIFTED coordinates
    (+180e6/+90e6 keeps every operand non-negative, so Spark's
    truncating DIV and DuckDB's flooring // agree — the negative-
    division trap dodged structurally), overlap areas are int64
    (µdeg² ≤ 1.3·10¹⁷ even for world-sized extents), and each
    contribution quantizes by one decimal(38) DIV (numerator ≤
    value·1.3·10¹⁷ ≪ 10³⁸).  Per-pair flooring loses < 1 unit per
    (src, tgt) pair — deterministic, and the only quantization in the
    chain.

    Half-open area semantics: rects touching along an edge share ZERO
    area and transfer nothing (strict < in the join predicate) — the
    join-dedup REFERENCE-POINT rule emits a pair only from the grid
    cell containing the intersection's SW corner, so no distinct() is
    ever spent (the extent_overlap_join discipline on the integer
    grid).  Per-rect cell fan-out is guarded by a loud assert_true
    riding the id column.

    Inputs: src (src_id, minx, miny, maxx, maxy, value µdeg/int64),
    tgt (tgt_id, minx, miny, maxx, maxy).  Output per target:
    (tgt_id, n_src, overlap_area, est_value) — targets with no
    overlapping source keep a zero row (no silent drops).  Sources
    overlapping each other double-transfer by design (the value is
    per-source mass)."""
    res = int(res_udeg)
    if res < 1:
        raise ValueError(f"areal_interp: res_udeg must be >= 1, got {res}")

    def shifted(df, idc, prefix):
        mk = (F.col(c) for c in ("minx", "miny", "maxx", "maxy"))
        minx, miny, maxx, maxy = mk
        sx0 = (minx + F.lit(180_000_000)).cast("bigint")
        sy0 = (miny + F.lit(90_000_000)).cast("bigint")
        sx1 = (maxx + F.lit(180_000_000)).cast("bigint")
        sy1 = (maxy + F.lit(90_000_000)).cast("bigint")
        cx0, cx1 = _idiv(sx0, res), _idiv(sx1, res)
        cy0, cy1 = _idiv(sy0, res), _idiv(sy1, res)
        n = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        guard = F.assert_true(
            n <= F.lit(int(max_cells)),
            F.lit(
                f"areal_interp: extent covers more than "
                f"max_cells={max_cells} grid cells at res_udeg={res}; "
                "coarsen the grid or split the extent"
            ),
        )
        # the guard rides the CELL expression — the one column every
        # downstream join consumes, so Catalyst can never prune it
        # (the 4j dead-column-assert lesson)
        pad = F.coalesce(guard.cast("bigint"), F.lit(0))
        cells = F.explode(
            F.flatten(
                F.transform(
                    F.sequence(cy0, cy1),
                    lambda y: F.transform(
                        F.sequence(cx0, cx1),
                        lambda x: y * F.lit(1_000_000_000) + x + pad,
                    ),
                )
            )
        ).alias(f"{prefix}cell")
        keep = [
            F.col(c).alias(f"{prefix}{c}")
            for c in df.columns if c != idc
        ]
        return df.select(F.col(idc), *keep, cells)

    a = shifted(src_rects, src_id, "s_")
    b = shifted(tgt_rects, tgt_id, "t_")
    ix0 = F.greatest("s_minx", "t_minx")
    iy0 = F.greatest("s_miny", "t_miny")
    ix1 = F.least("s_maxx", "t_maxx")
    iy1 = F.least("s_maxy", "t_maxy")
    ref_cell = (
        _idiv((iy0 + F.lit(90_000_000)).cast("bigint"), res)
        * F.lit(1_000_000_000)
        + _idiv((ix0 + F.lit(180_000_000)).cast("bigint"), res)
    )
    dec = "decimal(38,0)"
    pairs = (
        a.join(b, F.col("s_cell") == F.col("t_cell"))
        .where((ix0 < ix1) & (iy0 < iy1) & (F.col("s_cell") == ref_cell))
        .select(
            tgt_id,
            ((ix1 - ix0) * (iy1 - iy0)).alias("_ia"),
            F.col("s_value"),
            (
                (F.col("s_maxx") - F.col("s_minx"))
                * (F.col("s_maxy") - F.col("s_miny"))
            ).alias("_sa"),
        )
    )
    contrib = pairs.select(
        tgt_id,
        "_ia",
        F.expr(
            f"CAST((CAST(s_value AS {dec}) * _ia) DIV _sa AS BIGINT)"
        ).alias("_c"),
    )
    agg = contrib.groupBy(tgt_id).agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum("_ia").alias("overlap_area"),
        F.sum("_c").alias("est_value"),
    )
    return (
        tgt_rects.select(tgt_id)
        .join(agg, tgt_id, "left")
        .select(
            tgt_id,
            F.coalesce("n_src", F.lit(0)).cast("bigint").alias("n_src"),
            F.coalesce("overlap_area", F.lit(0)).cast("bigint").alias(
                "overlap_area"
            ),
            F.coalesce("est_value", F.lit(0)).cast("bigint").alias(
                "est_value"
            ),
        )
    )


def areal_interp_sql(
    src: str,
    tgt: str,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
) -> str:
    """DuckDB twin of :func:`areal_interp` — the naive O(n²) overlap
    join with the identical HUGEINT quantization, so the PBSM grid,
    pole shift, and reference-point dedup are all hash-verified
    against the plain definition.  Standalone statement."""
    return f"""
        WITH ai_pairs AS (
            SELECT t.{tgt_id},
                   (LEAST(s.maxx, t.maxx) - GREATEST(s.minx, t.minx))
                   * (LEAST(s.maxy, t.maxy) - GREATEST(s.miny, t.miny))
                       AS ia,
                   CAST((CAST(s.value AS HUGEINT) *
                        ((LEAST(s.maxx, t.maxx) - GREATEST(s.minx, t.minx))
                         * (LEAST(s.maxy, t.maxy) - GREATEST(s.miny, t.miny))))
                        // ((s.maxx - s.minx) * (s.maxy - s.miny))
                        AS BIGINT) AS c
            FROM {src} s JOIN {tgt} t
              ON GREATEST(s.minx, t.minx) < LEAST(s.maxx, t.maxx)
             AND GREATEST(s.miny, t.miny) < LEAST(s.maxy, t.maxy)
        )
        SELECT t.{tgt_id},
               CAST(COALESCE(COUNT(p.ia), 0) AS BIGINT) AS n_src,
               CAST(COALESCE(SUM(p.ia), 0) AS BIGINT) AS overlap_area,
               CAST(COALESCE(SUM(p.c), 0) AS BIGINT) AS est_value
        FROM {tgt} t LEFT JOIN ai_pairs p USING ({tgt_id})
        GROUP BY 1
    """


def ripley_k_counts(
    points: DataFrame,
    radii_udeg: "Sequence[int]",
    id_col: str = "url",
    res_deg: float | None = None,
    join_hint: str | None = "auto",
) -> DataFrame:
    """Ripley's K point-pattern statistic, the exact-count core: for
    each radius r, the number of unordered point pairs within r
    (equirectangular wrapped-lon degrees — the kNN family's metric).
    K̂(r) = A·2·n_pairs/(n(n−1)) is one float division the analyst
    applies; the engine emits the exact integers (the house split:
    portable counts, presentation-layer normalization).  Reading:
    n_pairs growing faster than r² ⇒ clustering at that scale, slower
    ⇒ dispersion/inhibition — the multi-SCALE companion of the
    single-grid morans_i/join-counts.

    Radii are integer µdeg, strictly ascending (validated); the pair
    sweep runs ONCE at the largest radius via the 3×3 cell probe
    (res_deg ≥ max radius enforced — the eps_neighbor_edges soundness
    rule), each unordered pair emitted exactly once (candidate home
    cell + id_a < id_b), then every band aggregates from the same
    pair stream with conditional counts — one shuffle for the pairs,
    one 1-row aggregate, never k passes.  Coincident points (d = 0)
    count in every band; identical ids never pair.

    Output: (r_udeg, n_pairs, n_points), one row per radius,
    cumulative."""
    radii = [int(r) for r in radii_udeg]
    if not radii:
        raise ValueError("ripley_k_counts: need at least one radius")
    if any(r <= 0 for r in radii) or sorted(set(radii)) != radii:
        raise ValueError(
            "ripley_k_counts: radii must be positive, strictly "
            f"ascending, got {radii}"
        )
    max_deg = radii[-1] / 1_000_000.0
    if res_deg is None:
        res_deg = max_deg
    if res_deg < max_deg:
        raise ValueError(
            f"res_deg={res_deg} < max radius {max_deg}: the 3x3 probe "
            "cannot see all pairs; use res_deg >= the largest radius"
        )
    probes = points.select(
        F.col(id_col).alias("id_a"),
        F.col("lon"),
        F.col("lat"),
        F.explode(
            neighbor_cells(F.col("lon"), F.col("lat"), res_deg)
        ).alias("probe_cell"),
    )
    cand = points.select(
        grid_cell(F.col("lon"), F.col("lat"), res_deg).alias("c_cell"),
        F.col(id_col).alias("id_b"),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
    )
    join_hint = _auto_join_hint(cand, join_hint)
    if join_hint:
        cand = cand.hint(join_hint)
    dlon_raw = F.abs(F.col("lon") - F.col("c_lon"))
    dlon = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
    dlat = F.col("lat") - F.col("c_lat")
    d2 = (dlon * dlon + dlat * dlat).alias("d2")
    pairs = (
        probes.join(cand, probes.probe_cell == cand.c_cell)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (dlon * dlon + dlat * dlat <= F.lit(max_deg * max_deg))
        )
        .select(d2)
    )
    aggs = [
        F.count_if(
            F.col("d2") <= F.lit((r / 1_000_000.0) ** 2)
        ).alias(f"_n_{i}")
        for i, r in enumerate(radii)
    ]
    row = pairs.agg(*aggs).crossJoin(
        F.broadcast(points.agg(F.count(F.lit(1)).alias("_np")))
    )
    stack = ", ".join(
        f"{r}L, _n_{i}" for i, r in enumerate(radii)
    )
    return row.select(
        F.expr(
            f"stack({len(radii)}, {stack}) AS (r_udeg, n_pairs)"
        ),
        F.col("_np").alias("n_points"),
    ).select("r_udeg", "n_pairs", "n_points")


def ripley_k_sql(
    src: str,
    radii_udeg: "Sequence[int]",
    id_col: str = "url",
) -> str:
    """DuckDB twin of :func:`ripley_k_counts` — the naive O(n²) pair
    join, so the 3×3 probe and the single-sweep banding are verified
    against the definition.  ``src`` exposes (id, lon, lat)."""
    radii = [int(r) for r in radii_udeg]
    branches = " UNION ALL ".join(
        f"""
        SELECT CAST({r} AS BIGINT) AS r_udeg,
               CAST(COALESCE(SUM(CASE WHEN p.d2 <=
                    ({r} / 1000000.0) * ({r} / 1000000.0)
                    THEN 1 END), 0) AS BIGINT) AS n_pairs
        FROM rk_pairs p
        """
        for r in radii
    )
    max_deg_sq = f"({radii[-1]} / 1000000.0) * ({radii[-1]} / 1000000.0)"
    return f"""
        WITH rk_pts AS (
            SELECT {id_col} AS pid, lon, lat FROM {src}
        ),
        rk_pairs AS (
            SELECT LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                   * LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                   + (a.lat - b.lat) * (a.lat - b.lat) AS d2
            FROM rk_pts a JOIN rk_pts b ON a.pid < b.pid
            WHERE LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                  * LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                  + (a.lat - b.lat) * (a.lat - b.lat) <= {max_deg_sq}
        ),
        rk_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM rk_pts)
        SELECT b.r_udeg, b.n_pairs, n.n_points
        FROM ({branches}) b CROSS JOIN rk_n n
    """


def semivariogram_counts(
    points: DataFrame,
    band_edges_udeg: "Sequence[int]",
    value_col: str,
    id_col: str = "url",
    res_deg: float | None = None,
    join_hint: str | None = "auto",
) -> DataFrame:
    """Empirical semivariogram, the exact-count core — the VALUE-field
    companion of :func:`ripley_k_counts` (where Ripley asks "do the
    POINTS cluster at scale h", the variogram asks "do the point
    VALUES decorrelate with distance"): for each distance band
    (prev, r] the number of unordered point pairs whose separation
    falls in the band and the exact integer Σ(vᵢ−vⱼ)².  The analyst's
    γ̂(h) = Σ(vᵢ−vⱼ)² / (2·n_pairs) is one presentation-layer
    division (the house split: the engine emits portable integers);
    γ̂ rising toward a sill ⇒ spatial dependence with that range,
    flat ⇒ no spatial structure in the value field.

    ``band_edges_udeg`` are ascending integer-µdeg upper edges; bands
    are NON-cumulative, band 1 is [0, r₁] (coincident points land
    there), band i>1 is (rᵢ₋₁, rᵢ].  Distances are equirectangular
    wrapped-lon degrees — the exact metric of the kNN/ripley family.
    Values must be integral (validated by cast).

    Physical plan (the ripley_k discipline): ONE pair sweep at the
    LARGEST edge via the 3×3 cell probe (``res_deg`` ≥ max edge
    enforced — the probe-soundness rule), each unordered pair emitted
    exactly once (candidate home cell + id order), then every band
    aggregates from that single pair stream with conditional sums —
    one shuffle for the pairs, one 1-row aggregate, never k passes.
    At 100 TB the sweep cost is governed by pair density within the
    max band, not by k.

    Output: (band_udeg, n_pairs, sum_sq_diff, n_points), one row per
    band edge."""
    edges = [int(r) for r in band_edges_udeg]
    if not edges:
        raise ValueError("semivariogram_counts: need at least one edge")
    if any(r <= 0 for r in edges) or sorted(set(edges)) != edges:
        raise ValueError(
            "semivariogram_counts: band edges must be positive, "
            f"strictly ascending, got {edges}"
        )
    max_deg = edges[-1] / 1_000_000.0
    if res_deg is None:
        res_deg = max_deg
    if res_deg < max_deg:
        raise ValueError(
            f"res_deg={res_deg} < max band edge {max_deg}: the 3x3 "
            "probe cannot see all pairs; use res_deg >= the largest "
            "band edge"
        )
    probes = points.select(
        F.col(id_col).alias("id_a"),
        F.col("lon"),
        F.col("lat"),
        F.col(value_col).cast("bigint").alias("v_a"),
        F.explode(
            neighbor_cells(F.col("lon"), F.col("lat"), res_deg)
        ).alias("probe_cell"),
    )
    cand = points.select(
        grid_cell(F.col("lon"), F.col("lat"), res_deg).alias("c_cell"),
        F.col(id_col).alias("id_b"),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
        F.col(value_col).cast("bigint").alias("v_b"),
    )
    join_hint = _auto_join_hint(cand, join_hint)
    if join_hint:
        cand = cand.hint(join_hint)
    dlon_raw = F.abs(F.col("lon") - F.col("c_lon"))
    dlon = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
    dlat = F.col("lat") - F.col("c_lat")
    d2_expr = dlon * dlon + dlat * dlat
    dv = F.col("v_a") - F.col("v_b")
    pairs = (
        probes.join(cand, probes.probe_cell == cand.c_cell)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (d2_expr <= F.lit(max_deg * max_deg))
        )
        .select(d2_expr.alias("d2"), (dv * dv).alias("sq"))
    )
    lo = [0.0] + [(r / 1_000_000.0) ** 2 for r in edges[:-1]]
    hi = [(r / 1_000_000.0) ** 2 for r in edges]
    aggs = []
    for i, (a, b) in enumerate(zip(lo, hi)):
        in_band = (
            (F.col("d2") <= F.lit(b))
            if i == 0
            else (F.col("d2") > F.lit(a)) & (F.col("d2") <= F.lit(b))
        )
        aggs.append(F.count_if(in_band).alias(f"_n_{i}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(in_band, F.col("sq"))), F.lit(0)
            ).cast("bigint").alias(f"_s_{i}")
        )
    row = pairs.agg(*aggs).crossJoin(
        F.broadcast(points.agg(F.count(F.lit(1)).alias("_np")))
    )
    stack = ", ".join(
        f"{r}L, _n_{i}, _s_{i}" for i, r in enumerate(edges)
    )
    return row.select(
        F.expr(
            f"stack({len(edges)}, {stack}) AS "
            "(band_udeg, n_pairs, sum_sq_diff)"
        ),
        F.col("_np").alias("n_points"),
    ).select("band_udeg", "n_pairs", "sum_sq_diff", "n_points")


def semivariogram_sql(
    src: str,
    band_edges_udeg: "Sequence[int]",
    value_col: str,
    id_col: str = "url",
) -> str:
    """DuckDB twin of :func:`semivariogram_counts` — the naive O(n²)
    pair join over the definition, so the 3×3 probe and the
    single-sweep banding are what the hash verifies.  ``src`` exposes
    (id, lon, lat, value)."""
    edges = [int(r) for r in band_edges_udeg]
    lo = ["0.0"] + [
        f"({r} / 1000000.0) * ({r} / 1000000.0)" for r in edges[:-1]
    ]
    hi = [f"({r} / 1000000.0) * ({r} / 1000000.0)" for r in edges]
    branches = " UNION ALL ".join(
        f"""
        SELECT CAST({r} AS BIGINT) AS band_udeg,
               CAST(COALESCE(SUM(CASE WHEN {cond} THEN 1 END), 0)
                    AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(CASE WHEN {cond} THEN p.sq END), 0)
                    AS BIGINT) AS sum_sq_diff
        FROM sv_pairs p
        """
        for r, cond in zip(
            edges,
            [
                f"p.d2 <= {hi[0]}"
            ]
            + [
                f"p.d2 > {a} AND p.d2 <= {b}"
                for a, b in zip(lo[1:], hi[1:])
            ],
        )
    )
    max_deg_sq = hi[-1]
    return f"""
        WITH sv_pts AS (
            SELECT {id_col} AS pid, lon, lat,
                   CAST({value_col} AS BIGINT) AS v
            FROM {src}
        ),
        sv_pairs AS (
            SELECT LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                   * LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                   + (a.lat - b.lat) * (a.lat - b.lat) AS d2,
                   (a.v - b.v) * (a.v - b.v) AS sq
            FROM sv_pts a JOIN sv_pts b ON a.pid < b.pid
            WHERE LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                  * LEAST(ABS(a.lon - b.lon), 360.0 - ABS(a.lon - b.lon))
                  + (a.lat - b.lat) * (a.lat - b.lat) <= {max_deg_sq}
        ),
        sv_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM sv_pts)
        SELECT b.band_udeg, b.n_pairs, b.sum_sq_diff, n.n_points
        FROM ({branches}) b CROSS JOIN sv_n n
    """


def od_gravity_residuals(
    flows: DataFrame,
    min_flows: int = 1,
) -> DataFrame:
    """Gravity-model residuals over an OD flow matrix — which origin–
    destination pairs move MORE than their endpoints' sizes predict
    (corridors, anomalous routing) and which move less (barriers):
    under the zero-deterrence gravity null, expected flow is
    out(o)·in(d)/total, so the residual ratio

        ratio_ppm = (n·total·10⁶) DIV (out_o·in_d)

    is the flow-matrix sibling of the collocations PMI score and the
    od matrix's answer to tile_hotspots (which cells are hot → which
    LINKS are hot).  Exact decimal(38)/HUGEINT wide product; 10⁶ =
    exactly as predicted.  Marginals come from the SAME matrix (one
    pass each, broadcast back); pairs below ``min_flows`` drop (the
    PMI hapax guard).

    Input: (cell_from, cell_to, n_flows) — :func:`od_flows` output.
    Output: (cell_from, cell_to, n_flows, out_o, in_d, ratio_ppm)."""
    f = flows.select(
        "cell_from", "cell_to",
        F.col("n_flows").cast("bigint").alias("n_flows"),
    )
    out_m = f.groupBy("cell_from").agg(F.sum("n_flows").alias("out_o"))
    in_m = f.groupBy("cell_to").agg(F.sum("n_flows").alias("in_d"))
    total = f.agg(F.sum("n_flows").alias("_tot"))
    dec = "decimal(38,0)"
    return (
        f.where(F.col("n_flows") >= int(min_flows))
        .join(out_m, "cell_from")
        .join(in_m, "cell_to")
        .crossJoin(F.broadcast(total))
        .select(
            "cell_from", "cell_to", "n_flows", "out_o", "in_d",
            F.expr(
                f"CAST((CAST(n_flows AS {dec}) * _tot * 1000000) "
                f"DIV (CAST(out_o AS {dec}) * in_d) AS BIGINT)"
            ).alias("ratio_ppm"),
        )
    )


def od_gravity_residuals_sql(flows_src: str, min_flows: int = 1) -> str:
    """DuckDB twin of :func:`od_gravity_residuals`; ``flows_src``
    exposes (cell_from, cell_to, n_flows)."""
    return f"""
        WITH og_f AS (
            SELECT cell_from, cell_to,
                   CAST(n_flows AS BIGINT) AS n_flows
            FROM {flows_src}
        ),
        og_out AS (
            SELECT cell_from, CAST(SUM(n_flows) AS BIGINT) AS out_o
            FROM og_f GROUP BY 1
        ),
        og_in AS (
            SELECT cell_to, CAST(SUM(n_flows) AS BIGINT) AS in_d
            FROM og_f GROUP BY 1
        ),
        og_t AS (SELECT CAST(SUM(n_flows) AS BIGINT) AS tot FROM og_f)
        SELECT f.cell_from, f.cell_to, f.n_flows, o.out_o, i.in_d,
               CAST((CAST(f.n_flows AS HUGEINT) * t.tot * 1000000)
                    // (CAST(o.out_o AS HUGEINT) * i.in_d) AS BIGINT)
                   AS ratio_ppm
        FROM og_f f
        JOIN og_out o USING (cell_from)
        JOIN og_in i USING (cell_to)
        CROSS JOIN og_t t
        WHERE f.n_flows >= {int(min_flows)}
    """


def gearys_c(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Global Geary's C over the occupied-cell raster — the squared-
    difference companion of :func:`morans_i` (same queen adjacency,
    same once-per-pair forward fan): where Moran's I correlates
    deviations from the mean (a global covariance), Geary's C sums the
    raw squared differences between neighbors, so it reacts to LOCAL
    roughness that a few extreme cells can hide from I.  C < 1 means
    neighbors are more similar than chance (clustering), C > 1 means
    checkerboard contrast, C = 1 spatial randomness.

        C = (N−1) · Σ_ij w_ij (x_i − x_j)²
            ─────────────────────────────────
              2W · Σ_i (x_i − x̄)²

    Exact-integer formulation (the :func:`morans_i` discipline): the
    numerator needs no mean at all — num = Σ_ij w_ij (x_i − x_j)² over
    DIRECTED pairs (= 2 × the forward-pair sum); the denominator uses
    the N-scaled deviations d_i = N·x_i − S, so Σ(x_i − x̄)² =
    den_N / N² and the N² re-enters the numerator:

        c_ppm = ((N−1) · N² · num · 10⁶) DIV (2 · W · den_N)

    evaluated in decimal(38,0) (HUGEINT in the twin) with truncation
    toward zero on both engines.  Headroom: at N ≤ 10⁶ cells of
    ≤ 10⁶-point values, (N−1)·N²·num·10⁶ < 10⁷·10¹²·(8·10⁶·10¹²)·…
    is bounded by regrouping — num ≤ W·(Δx)² ≤ 8N·10¹² so the product
    is ≤ 10⁶·10¹²·8·10⁶·10¹²·10⁶ ≈ 8·10⁴² — beyond that pre-quantize
    the value column (same caveat as morans_i; at the shipped rollup
    magnitudes every factor is orders below the bound).  den_N = 0
    (constant surface) or W = 0 (no adjacent pairs) → NULL c_ppm.

    Adjacency contract inherited from :func:`tile_join_counts`: queen,
    PRESENT cells only, lon wrap (≥ 5 columns enforced), lat clamp.
    Plan: fan and pair join run on the AGGREGATE raster only.
    Output: one row (n_cells, w_sum, num, den, c_ppm)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "for once-per-pair forward adjacency under lon wrap"
        )
    vals = cells.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_s")
    )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    fwd = []
    for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
        t_lat = lat_b + F.lit(dy)
        t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
        fwd.append(
            F.when(
                (t_lat >= 0) & (t_lat < rows_n),
                (t_lat * F.lit(cols) + t_lon).cast("bigint"),
            )
        )
    fan = vals.select(
        F.col("_x").alias("_x1"),
        F.explode(F.array_compact(F.array(*fwd))).alias("_nbr"),
    )
    paired = fan.join(
        vals.select(F.col("cell").alias("_nbr"), F.col("_x").alias("_x2")),
        "_nbr",
    )
    dec = "decimal(38,0)"
    pair_agg = paired.agg(
        (F.count(F.lit(1)) * 2).alias("w_sum"),
        F.coalesce(
            F.sum(
                F.expr(f"CAST(_x1 - _x2 AS {dec}) * (_x1 - _x2)")
            ) * 2,
            F.lit(0).cast(dec),
        ).alias("_num"),
    )
    dev = vals.crossJoin(F.broadcast(stats)).select(
        "_n", (F.col("_n") * F.col("_x") - F.col("_s")).alias("_d")
    )
    dev_agg = dev.agg(
        F.max("_n").alias("n_cells"),
        F.sum(F.expr(f"CAST(_d AS {dec}) * _d")).alias("_den"),
    )
    return (
        dev_agg.crossJoin(pair_agg)
        .select(
            "n_cells",
            "w_sum",
            F.col("_num").cast("bigint").alias("num"),
            F.col("_den").cast("bigint").alias("den"),
            F.expr(
                f"CAST(CASE WHEN _den = 0 OR w_sum = 0 THEN NULL ELSE "
                f"(CAST(n_cells - 1 AS {dec}) * n_cells * n_cells "
                f" * _num * 1000000) DIV "
                f"(CAST(2 AS {dec}) * w_sum * _den) END AS BIGINT)"
            ).alias("c_ppm"),
        )
    )


def gearys_c_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`gearys_c` (standalone statement)."""
    return "WITH " + gearys_c_ctes(src, value_col, res_deg)


def gearys_c_ctes(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """The twin without the leading WITH (oracle-prelude appendable);
    ``src`` must expose (cell, ``value_col``), one row per present
    cell.  HUGEINT mirrors the decimal(38,0) path; ``//`` truncates
    toward zero exactly like Spark DIV on the non-negative den."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    return f"""
        gc_src AS (
            SELECT cell, CAST({value_col} AS BIGINT) AS x FROM {src}
        ),
        gc_stats AS (
            SELECT COUNT(*) AS n, CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s
            FROM gc_src
        ),
        gc_fan AS (
            SELECT s.x AS x1,
                   (((s.cell // {cols}) + dd.dy) * {cols}
                    + ((s.cell % {cols}) + dd.dx + {cols}) % {cols}) AS nbr
            FROM gc_src s CROSS JOIN (VALUES
                 (0,1),(1,-1),(1,0),(1,1)) dd(dy, dx)
            WHERE (s.cell // {cols}) + dd.dy >= 0
              AND (s.cell // {cols}) + dd.dy < {rows_n}
        ),
        gc_pairs AS (
            SELECT f.x1, s.x AS x2
            FROM gc_fan f JOIN gc_src s ON s.cell = f.nbr
        ),
        gc_pagg AS (
            SELECT CAST(COUNT(*) * 2 AS BIGINT) AS w_sum,
                   COALESCE(SUM(CAST(x1 - x2 AS HUGEINT) * (x1 - x2)) * 2,
                            CAST(0 AS HUGEINT)) AS num
            FROM gc_pairs
        ),
        gc_dagg AS (
            SELECT MAX(t.n) AS n_cells,
                   SUM(CAST(t.n * v.x - t.s AS HUGEINT)
                       * (t.n * v.x - t.s)) AS den
            FROM gc_src v CROSS JOIN gc_stats t
        )
        SELECT CAST(d.n_cells AS BIGINT) AS n_cells,
               p.w_sum,
               CAST(p.num AS BIGINT) AS num,
               CAST(d.den AS BIGINT) AS den,
               CAST(CASE WHEN d.den = 0 OR p.w_sum = 0 THEN NULL ELSE
                    (CAST(d.n_cells - 1 AS HUGEINT) * d.n_cells
                     * d.n_cells * p.num * 1000000)
                    // (CAST(2 AS HUGEINT) * p.w_sum * d.den) END
                    AS BIGINT) AS c_ppm
        FROM gc_dagg d CROSS JOIN gc_pagg p
    """


def raster_aspect(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Slope and D8 aspect of a per-cell raster — the vector-field
    view of the surface that :func:`flow_accumulation` routes over:
    central-difference gradients from the four rook neighbors,

        gx = x(E) − x(W)      (value grows eastward when gx > 0)
        gy = x(N) − x(S)      (value grows northward when gy > 0)

    with absent neighbors (off-raster or beyond the pole rows)
    contributing 0 — the zero-fill convention; the raster's SUPPORT
    does not dilate (output rows only for present cells).  Longitude
    wraps at ±180°.

    ``slope_sq = gx² + gy²`` is the exact squared gradient magnitude
    (no sqrt — monotone, so thresholds/rankings are unchanged), and
    ``aspect`` is the DOWNHILL compass direction under the exact
    D8-dominant rule (pure integer comparisons, no tan(22.5°)
    sectors): the axis with the strictly larger |gradient| wins; an
    exact tie |gx| = |gy| ≠ 0 goes diagonal; gx = gy = 0 is 'flat'.
    Downhill means *against* the gradient: gx > 0 (uphill to the
    east) → aspect faces W.

    Plan: one ×4 fan + groupBy on the AGGREGATE raster (|cells| rows,
    never the point table), then an inner join back to the support —
    the same shuffle shape as :func:`tile_focal_stats`.
    Output: (cell, gx, gy, slope_sq, aspect)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "so E/W neighbors stay distinct under lon wrap"
        )
    vals = cells.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col(value_col).cast("bigint").alias("_v"),
    )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    # source at (dy,dx) relative to target ⇒ source fans to the
    # OPPOSITE-tagged slot of the target cell
    slots = []
    for tag, dy, dx in (("w", 0, 1), ("e", 0, -1), ("s", 1, 0),
                        ("n", -1, 0)):
        t_lat = lat_b + F.lit(dy)
        t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
        slots.append(
            F.when(
                (t_lat >= 0) & (t_lat < rows_n),
                F.struct(
                    (t_lat * F.lit(cols) + t_lon)
                    .cast("bigint").alias("t_cell"),
                    F.lit(tag).alias("tag"),
                ),
            )
        )
    fan = vals.select(
        "_v", F.explode(F.array_compact(F.array(*slots))).alias("s")
    ).select("_v", F.col("s.t_cell").alias("t_cell"),
             F.col("s.tag").alias("tag"))
    grads = fan.groupBy("t_cell").agg(
        (
            F.coalesce(F.sum(F.when(F.col("tag") == "e", F.col("_v"))),
                       F.lit(0))
            - F.coalesce(F.sum(F.when(F.col("tag") == "w", F.col("_v"))),
                         F.lit(0))
        ).alias("gx"),
        (
            F.coalesce(F.sum(F.when(F.col("tag") == "n", F.col("_v"))),
                       F.lit(0))
            - F.coalesce(F.sum(F.when(F.col("tag") == "s", F.col("_v"))),
                         F.lit(0))
        ).alias("gy"),
    )
    out = (
        vals.select("cell")
        .join(grads, vals.cell == grads.t_cell, "left")
        .select(
            "cell",
            F.coalesce("gx", F.lit(0)).alias("gx"),
            F.coalesce("gy", F.lit(0)).alias("gy"),
        )
    )
    return out.select(
        "cell", "gx", "gy",
        (F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy"))
        .alias("slope_sq"),
        F.when((F.col("gx") == 0) & (F.col("gy") == 0), F.lit("flat"))
        .when(
            F.abs("gx") > F.abs("gy"),
            F.when(F.col("gx") > 0, F.lit("W")).otherwise(F.lit("E")),
        )
        .when(
            F.abs("gy") > F.abs("gx"),
            F.when(F.col("gy") > 0, F.lit("S")).otherwise(F.lit("N")),
        )
        .otherwise(
            F.concat(
                F.when(F.col("gy") > 0, F.lit("S")).otherwise(F.lit("N")),
                F.when(F.col("gx") > 0, F.lit("W")).otherwise(F.lit("E")),
            )
        )
        .alias("aspect"),
    )


def raster_aspect_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`raster_aspect` (standalone statement)."""
    return "WITH " + raster_aspect_ctes(src, value_col, res_deg)


def raster_aspect_ctes(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """The twin without the leading WITH; ``src`` exposes
    (cell, ``value_col``), one row per present cell."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    return f"""
        ra_src AS (
            SELECT cell, CAST({value_col} AS BIGINT) AS v FROM {src}
        ),
        ra_fan AS (
            SELECT s.v, dd.tag,
                   (((s.cell // {cols}) + dd.dy) * {cols}
                    + ((s.cell % {cols}) + dd.dx + {cols}) % {cols})
                       AS t_cell
            FROM ra_src s CROSS JOIN (VALUES
                 ('w', 0, 1), ('e', 0, -1), ('s', 1, 0), ('n', -1, 0))
                 dd(tag, dy, dx)
            WHERE (s.cell // {cols}) + dd.dy >= 0
              AND (s.cell // {cols}) + dd.dy < {rows_n}
        ),
        ra_grad AS (
            SELECT t_cell,
                   COALESCE(SUM(CASE WHEN tag = 'e' THEN v END), 0)
                 - COALESCE(SUM(CASE WHEN tag = 'w' THEN v END), 0) AS gx,
                   COALESCE(SUM(CASE WHEN tag = 'n' THEN v END), 0)
                 - COALESCE(SUM(CASE WHEN tag = 's' THEN v END), 0) AS gy
            FROM ra_fan GROUP BY 1
        ),
        ra_out AS (
            SELECT s.cell,
                   CAST(COALESCE(g.gx, 0) AS BIGINT) AS gx,
                   CAST(COALESCE(g.gy, 0) AS BIGINT) AS gy
            FROM ra_src s LEFT JOIN ra_grad g ON g.t_cell = s.cell
        )
        SELECT cell, gx, gy,
               CAST(gx * gx + gy * gy AS BIGINT) AS slope_sq,
               CASE
                   WHEN gx = 0 AND gy = 0 THEN 'flat'
                   WHEN abs(gx) > abs(gy) THEN
                       CASE WHEN gx > 0 THEN 'W' ELSE 'E' END
                   WHEN abs(gy) > abs(gx) THEN
                       CASE WHEN gy > 0 THEN 'S' ELSE 'N' END
                   ELSE (CASE WHEN gy > 0 THEN 'S' ELSE 'N' END)
                        || (CASE WHEN gx > 0 THEN 'W' ELSE 'E' END)
               END AS aspect
        FROM ra_out
    """


def hausdorff_pairs(
    points: DataFrame,
    pairs: DataFrame,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 1_000_000,
    max_points: int = 4_096,
) -> DataFrame:
    """Exact symmetric Hausdorff distance (squared, fixed-point)
    between entity point sets for CANDIDATE pairs — the
    trajectory-similarity join of the track layer (which users walk
    the same route? which map edits trace the same road?), the
    set-distance companion of snap_to_segments' point-to-line
    attachment:

        h(A→B) = max_{a∈A} min_{b∈B} d²(a, b)
        H(A,B) = greatest(h(A→B), h(B→A))

    Exact arithmetic: coordinates quantize to the house ×``scale``
    fixed-point ints, d² in int64 (Δ ≤ 360·10⁶ at the default scale
    → d² ≤ 2.6·10¹⁷, guarded by the scale bound below); max-of-min
    over integers is order-free, so the result is
    parallelism-independent with no tie-break needed.

    Scale design: Hausdorff needs every aᵢ's min over ALL of B, so
    the pair fan is inherently |A|·|B| — the operator therefore takes
    a ``pairs`` DataFrame (id_a, id_b) produced by a blocking stage
    (shared coarse cell, LSH bucket, same road corridor …) and NEVER
    self-joins the corpus; both directions come from ONE candidate
    join (two groupBys on opposite point identities).  A LOUD
    ``max_points`` guard fails any entity whose point count would
    make the per-pair fan quadratic-unbounded (the crossing-join /
    session_rules house pattern).  Duplicate coordinates collapse by
    point identity (= the quantized pair), which leaves the max-min
    unchanged.

    Returns (id_a, id_b, n_a, n_b, h_ab_q, h_ba_q, hausdorff_q) —
    n_* are DISTINCT quantized points, *_q in (1/scale°)² units."""
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 d² bound")
    sc = F.lit(float(scale))
    pts = points.select(
        F.col(entity_col).alias("_e"),
        F.round(F.col(lon_col) * sc).cast("bigint").alias("_x"),
        F.round(F.col(lat_col) * sc).cast("bigint").alias("_y"),
    ).distinct()
    cnt = pts.groupBy("_e").agg(F.count(F.lit(1)).alias("_n"))
    # fan guard, house pattern (see covered_cells): assert_true is
    # NULL on success, so gating the coordinate through when(ok
    # IS NULL) keeps the check in the plan and fails LOUD on breach
    ok = F.assert_true(
        F.col("_n") <= F.lit(int(max_points)),
        F.lit(
            f"hausdorff_pairs: an entity exceeds max_points="
            f"{max_points}; block or downsample tracks first"
        ),
    )
    pts = pts.join(F.broadcast(cnt), "_e").select(
        "_e",
        F.when(ok.isNull(), F.col("_x")).alias("_x"),
        "_y",
    )

    pr = pairs.select("id_a", "id_b")
    a = pr.join(pts, pr.id_a == pts._e).select(
        "id_a", "id_b",
        F.col("_x").alias("_ax"), F.col("_y").alias("_ay"),
    )
    cand = a.join(
        pts.select(
            F.col("_e").alias("id_b2"),
            F.col("_x").alias("_bx"), F.col("_y").alias("_by"),
        ),
        F.col("id_b") == F.col("id_b2"),
    ).select(
        "id_a", "id_b", "_ax", "_ay", "_bx", "_by",
        (
            (F.col("_ax") - F.col("_bx")) * (F.col("_ax") - F.col("_bx"))
            + (F.col("_ay") - F.col("_by")) * (F.col("_ay") - F.col("_by"))
        ).alias("_d2"),
    )
    h_ab = (
        cand.groupBy("id_a", "id_b", "_ax", "_ay")
        .agg(F.min("_d2").alias("_m"))
        .groupBy("id_a", "id_b")
        .agg(F.max("_m").alias("h_ab_q"))
    )
    h_ba = (
        cand.groupBy("id_a", "id_b", "_bx", "_by")
        .agg(F.min("_d2").alias("_m"))
        .groupBy("id_a", "id_b")
        .agg(F.max("_m").alias("h_ba_q"))
    )
    na = cnt.select(F.col("_e").alias("id_a"), F.col("_n").alias("n_a"))
    nb = cnt.select(F.col("_e").alias("id_b"), F.col("_n").alias("n_b"))
    return (
        h_ab.join(h_ba, ["id_a", "id_b"])
        .join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "id_a", "id_b", "n_a", "n_b", "h_ab_q", "h_ba_q",
            F.greatest("h_ab_q", "h_ba_q").alias("hausdorff_q"),
        )
    )


def hausdorff_pairs_sql(
    points_src: str,
    pairs_src: str,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`hausdorff_pairs` (standalone statement;
    hd_*-namespaced CTEs; no guard — the oracle grades values, the
    operator owns the loud cap)."""
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 d² bound")
    return f"""
        WITH hd_pts AS MATERIALIZED (
            SELECT DISTINCT {entity_col} AS _e,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT) AS _x,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT) AS _y
            FROM {points_src}
        ),
        hd_cnt AS (
            SELECT _e, COUNT(*) AS _n FROM hd_pts GROUP BY 1
        ),
        hd_cand AS MATERIALIZED (
            SELECT p.id_a, p.id_b, a._x AS _ax, a._y AS _ay,
                   b._x AS _bx, b._y AS _by,
                   (a._x - b._x) * (a._x - b._x)
                   + (a._y - b._y) * (a._y - b._y) AS _d2
            FROM (SELECT id_a, id_b FROM {pairs_src}) p
            JOIN hd_pts a ON a._e = p.id_a
            JOIN hd_pts b ON b._e = p.id_b
        ),
        hd_ab AS (
            SELECT id_a, id_b, MAX(_m) AS h_ab_q FROM (
                SELECT id_a, id_b, _ax, _ay, MIN(_d2) AS _m
                FROM hd_cand GROUP BY 1, 2, 3, 4
            ) GROUP BY 1, 2
        ),
        hd_ba AS (
            SELECT id_a, id_b, MAX(_m) AS h_ba_q FROM (
                SELECT id_a, id_b, _bx, _by, MIN(_d2) AS _m
                FROM hd_cand GROUP BY 1, 2, 3, 4
            ) GROUP BY 1, 2
        )
        SELECT ab.id_a, ab.id_b,
               CAST(ca._n AS BIGINT) AS n_a,
               CAST(cb._n AS BIGINT) AS n_b,
               CAST(ab.h_ab_q AS BIGINT) AS h_ab_q,
               CAST(ba.h_ba_q AS BIGINT) AS h_ba_q,
               CAST(GREATEST(ab.h_ab_q, ba.h_ba_q) AS BIGINT)
                   AS hausdorff_q
        FROM hd_ab ab
        JOIN hd_ba ba USING (id_a, id_b)
        JOIN hd_cnt ca ON ca._e = ab.id_a
        JOIN hd_cnt cb ON cb._e = ab.id_b
    """


def _paired_tracks(
    points: DataFrame,
    pairs: DataFrame,
    entity_col: str,
    lon_col: str,
    lat_col: str,
    order_col: str,
    scale: int,
    max_points: int,
    op_name: str,
) -> DataFrame:
    """Shared candidate-pair track materialization for the ordered
    track-DP family (frechet_pairs / dtw_pairs): quantize once, build
    per-entity ordered coordinate arrays behind a LOUD ``max_points``
    guard (every DP is O(|A|·|B|) per pair — a monster track would go
    quadratic silently), attach both arrays to each candidate pair.
    Returns (id_a, id_b, _ax, _ay, _bx, _by)."""
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 d² bound")
    if not 2 <= max_points <= 4_096:
        raise ValueError(f"max_points out of range: {max_points}")
    sc = F.lit(float(scale))
    pts = points.select(
        F.col(entity_col).alias("_e"),
        F.col(order_col).alias("_o"),
        F.round(F.col(lon_col) * sc).cast("bigint").alias("_x"),
        F.round(F.col(lat_col) * sc).cast("bigint").alias("_y"),
    )
    ok = F.assert_true(
        F.size("_trk") <= F.lit(int(max_points)),
        F.lit(
            f"{op_name}: an entity exceeds max_points="
            f"{max_points}; segment or downsample tracks first"
        ),
    )
    tracks = (
        pts.groupBy("_e")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_o", "_x", "_y"))
            ).alias("_trk")
        )
        .select("_e", F.when(ok.isNull(), F.col("_trk")).alias("_trk"))
    )
    return (
        pairs.select("id_a", "id_b")
        .join(
            tracks.select(
                F.col("_e").alias("id_a"),
                F.col("_trk._x").alias("_ax"),
                F.col("_trk._y").alias("_ay"),
            ),
            "id_a",
        )
        .join(
            tracks.select(
                F.col("_e").alias("id_b"),
                F.col("_trk._x").alias("_bx"),
                F.col("_trk._y").alias("_by"),
            ),
            "id_b",
        )
    )


def frechet_pairs(
    points: DataFrame,
    pairs: DataFrame,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    scale: int = 1_000_000,
    max_points: int = 64,
) -> DataFrame:
    """Discrete Fréchet distance (squared, fixed-point) between
    ORDERED tracks for candidate pairs — the order-aware sibling of
    :func:`hausdorff_pairs`: Hausdorff treats a track as a point set
    (an out-and-back road matches its one-way half), Fréchet walks
    both tracks monotonically (the dog-leash distance), so direction
    and revisits matter:

        F(A,B) = min over monotone walks of max d²(aᵢ, bⱼ) on the walk
        dp(i,j) = max(d²(i,j), min(dp(i−1,j), dp(i,j−1), dp(i−1,j−1)))

    Exact integers: the house ×``scale`` quantization and int64 d²
    (same bound as hausdorff_pairs); max/min over integers need no
    tie-break, so the value is parallelism-independent.

    Scale design: the DP is inherently sequential per pair, so tracks
    materialize ONCE as per-entity ordered arrays (one groupBy; LOUD
    ``max_points`` guard — shared with :func:`dtw_pairs` via
    ``_paired_tracks``) and candidate pairs each carry two
    ≤ max_points arrays into an Arrow-batched ``mapInPandas`` DP —
    pairs parallelize, the walk stays local, nothing shuffles per DP
    cell.  The DuckDB twin unrolls the SAME recurrence by
    ANTI-DIAGONALS (dp cells with i+j = k as the k-th chained CTE —
    the pagerank-unroll pattern applied to dynamic programming), a
    different execution shape, so the recurrence is what gets
    verified.

    ``order_col`` must totally order each track (ties would make the
    walk ambiguous; quantized duplicates are fine — unlike Hausdorff
    they are NOT collapsed, the walk visits them).  Returns
    (id_a, id_b, n_a, n_b, frechet_q)."""
    import pandas as _pd

    joined = _paired_tracks(
        points, pairs, entity_col, lon_col, lat_col, order_col,
        scale, max_points, "frechet_pairs",
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            recs = []
            for ida, idb, ax, ay, bx, by in zip(
                pdf["id_a"], pdf["id_b"], pdf["_ax"], pdf["_ay"],
                pdf["_bx"], pdf["_by"],
            ):
                ax = np.asarray(ax, dtype=np.int64)
                ay = np.asarray(ay, dtype=np.int64)
                bx = np.asarray(bx, dtype=np.int64)
                by = np.asarray(by, dtype=np.int64)
                n, m = len(ax), len(bx)
                d = (
                    (ax[:, None] - bx[None, :]) ** 2
                    + (ay[:, None] - by[None, :]) ** 2
                )
                dp = np.empty((n, m), dtype=np.int64)
                dp[0, 0] = d[0, 0]
                for i in range(1, n):
                    dp[i, 0] = max(dp[i - 1, 0], d[i, 0])
                for j in range(1, m):
                    dp[0, j] = max(dp[0, j - 1], d[0, j])
                for i in range(1, n):
                    row_d, prev, cur = d[i], dp[i - 1], dp[i]
                    for j in range(1, m):
                        best = prev[j]
                        if prev[j - 1] < best:
                            best = prev[j - 1]
                        if cur[j - 1] < best:
                            best = cur[j - 1]
                        cur[j] = best if best > row_d[j] else row_d[j]
                recs.append(
                    (int(ida), int(idb), n, m, int(dp[n - 1, m - 1]))
                )
            yield _pd.DataFrame(
                recs,
                columns=["id_a", "id_b", "n_a", "n_b", "frechet_q"],
            )

    schema = (
        "id_a bigint, id_b bigint, n_a bigint, n_b bigint, "
        "frechet_q bigint"
    )
    return joined.mapInPandas(run, schema=schema)


def dtw_pairs(
    points: DataFrame,
    pairs: DataFrame,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    scale: int = 1_000_000,
    max_points: int = 64,
) -> DataFrame:
    """Dynamic-time-warping distance (sum of squared deviations,
    fixed-point) between ORDERED tracks for candidate pairs — the
    accumulating sibling of :func:`frechet_pairs`: Fréchet scores a
    walk by its WORST leash (one outlier fix dominates), DTW by the
    TOTAL squared deviation along the optimal monotone alignment, so
    consistent small offsets and time-axis stretching are what it
    measures:

        dtw(i,j) = d²(i,j) + min(dp(i−1,j), dp(i,j−1), dp(i−1,j−1))

    Exact integers with an OVERFLOW-LOUD bound: unlike the max-based
    Fréchet, DTW *sums* up to n+m−1 cells, so the kernel checks
    (n+m−1)·max d² < 2⁶³ per pair and raises rather than let numpy
    wrap silently (the DuckDB twin's BIGINT arithmetic raises on its
    own, so both engines fail loud instead of diverging).  Same
    track materialization, guard, and Arrow-batched per-pair DP as
    Fréchet (``_paired_tracks``); the twin unrolls by anti-diagonals
    with the sum recurrence.  Returns
    (id_a, id_b, n_a, n_b, dtw_q)."""
    import pandas as _pd

    joined = _paired_tracks(
        points, pairs, entity_col, lon_col, lat_col, order_col,
        scale, max_points, "dtw_pairs",
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            recs = []
            for ida, idb, ax, ay, bx, by in zip(
                pdf["id_a"], pdf["id_b"], pdf["_ax"], pdf["_ay"],
                pdf["_bx"], pdf["_by"],
            ):
                ax = np.asarray(ax, dtype=np.int64)
                ay = np.asarray(ay, dtype=np.int64)
                bx = np.asarray(bx, dtype=np.int64)
                by = np.asarray(by, dtype=np.int64)
                n, m = len(ax), len(bx)
                d = (
                    (ax[:, None] - bx[None, :]) ** 2
                    + (ay[:, None] - by[None, :]) ** 2
                )
                if (n + m - 1) * int(d.max()) >= 2**63:
                    raise ValueError(
                        "dtw_pairs: path-sum bound (n+m-1)*max_d2 "
                        "overflows int64; shrink scale or track span"
                    )
                dp = np.empty((n, m), dtype=np.int64)
                dp[0, 0] = d[0, 0]
                for i in range(1, n):
                    dp[i, 0] = dp[i - 1, 0] + d[i, 0]
                for j in range(1, m):
                    dp[0, j] = dp[0, j - 1] + d[0, j]
                for i in range(1, n):
                    row_d, prev, cur = d[i], dp[i - 1], dp[i]
                    for j in range(1, m):
                        best = prev[j]
                        if prev[j - 1] < best:
                            best = prev[j - 1]
                        if cur[j - 1] < best:
                            best = cur[j - 1]
                        cur[j] = best + row_d[j]
                recs.append(
                    (int(ida), int(idb), n, m, int(dp[n - 1, m - 1]))
                )
            yield _pd.DataFrame(
                recs,
                columns=["id_a", "id_b", "n_a", "n_b", "dtw_q"],
            )

    schema = (
        "id_a bigint, id_b bigint, n_a bigint, n_b bigint, "
        "dtw_q bigint"
    )
    return joined.mapInPandas(run, schema=schema)


def _track_dp_sql(
    points_src: str,
    pairs_src: str,
    entity_col: str,
    lon_col: str,
    lat_col: str,
    order_col: str,
    scale: int,
    max_points: int,
    cell_fmt: str,
    base_fmt: str,
    out_col: str,
) -> str:
    """Shared anti-diagonal DP unroll for the ordered track-DP twins:
    chained CTE k holds dp cells with i+j = k, computed from diagonals
    k−1 (left, up) and k−2 (diagonal) — out-of-range predecessors are
    NULL and LEAST ignores them (both engines' semantics).
    ``cell_fmt`` interpolates {d2}, {up}, {lf}, {dg} into the
    recurrence cell (the cell's own ``c.i``/``c.j`` are in scope for
    recurrences with virtual edge terms, e.g. EDR's dp(i,−1)=i+1);
    2·max_points−1 CTEs.  Standalone statement; fp_*-namespaced
    CTEs."""
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 d² bound")
    if not 2 <= max_points <= 64:
        raise ValueError(
            f"max_points out of range for CTE unroll: {max_points}"
        )
    kmax = 2 * max_points - 2
    ctes = [
        f"""fp_pts AS MATERIALIZED (
            SELECT {entity_col} AS _e,
                   ROW_NUMBER() OVER (PARTITION BY {entity_col}
                                      ORDER BY {order_col}) - 1 AS _i,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT) AS _x,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT) AS _y
            FROM {points_src}
        )""",
        "fp_cnt AS (SELECT _e, COUNT(*) AS _n FROM fp_pts GROUP BY 1)",
        f"""fp_d AS MATERIALIZED (
            SELECT p.id_a, p.id_b, a._i AS i, b._i AS j,
                   (a._x - b._x) * (a._x - b._x)
                   + (a._y - b._y) * (a._y - b._y) AS d2
            FROM (SELECT id_a, id_b FROM {pairs_src}) p
            JOIN fp_pts a ON a._e = p.id_a
            JOIN fp_pts b ON b._e = p.id_b
        )""",
        f"""fp_dp0 AS MATERIALIZED (
            SELECT id_a, id_b, i, j, {base_fmt.format(d2='d2')} AS v
            FROM fp_d WHERE i = 0 AND j = 0
        )""",
    ]
    for k in range(1, kmax + 1):
        p1 = f"fp_dp{k - 1}"
        p2 = f"fp_dp{k - 2}" if k >= 2 else None
        diag_join = (
            f"LEFT JOIN {p2} dg ON dg.id_a = c.id_a "
            f"AND dg.id_b = c.id_b AND dg.i = c.i - 1 "
            f"AND dg.j = c.j - 1"
            if p2
            else ""
        )
        diag_val = "dg.v" if p2 else "NULL"
        cell = cell_fmt.format(
            d2="c.d2", up="up.v", lf="lf.v", dg=diag_val
        )
        ctes.append(f"""fp_dp{k} AS MATERIALIZED (
            SELECT c.id_a, c.id_b, c.i, c.j,
                   {cell} AS v
            FROM fp_d c
            LEFT JOIN {p1} up ON up.id_a = c.id_a
                AND up.id_b = c.id_b AND up.i = c.i - 1 AND up.j = c.j
            LEFT JOIN {p1} lf ON lf.id_a = c.id_a
                AND lf.id_b = c.id_b AND lf.i = c.i AND lf.j = c.j - 1
            {diag_join}
            WHERE c.i + c.j = {k}
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM fp_dp{k}" for k in range(kmax + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f""",
        fp_all AS ({union})
        SELECT t.id_a, t.id_b,
               CAST(ca._n AS BIGINT) AS n_a,
               CAST(cb._n AS BIGINT) AS n_b,
               CAST(t.v AS BIGINT) AS {out_col}
        FROM fp_all t
        JOIN fp_cnt ca ON ca._e = t.id_a
        JOIN fp_cnt cb ON cb._e = t.id_b
        WHERE t.i = ca._n - 1 AND t.j = cb._n - 1
    """
    )


def frechet_pairs_sql(
    points_src: str,
    pairs_src: str,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    scale: int = 1_000_000,
    max_points: int = 16,
) -> str:
    """DuckDB twin of :func:`frechet_pairs` (anti-diagonal unroll of
    the max/min leash recurrence via ``_track_dp_sql``).  Tracks
    longer than ``max_points`` would silently lose cells, so size the
    parameter to the corpus (the operator's guard is the loud one).
    Standalone statement."""
    return _track_dp_sql(
        points_src, pairs_src, entity_col, lon_col, lat_col,
        order_col, scale, max_points,
        cell_fmt="GREATEST({d2}, LEAST({up}, {lf}, {dg}))",
        base_fmt="{d2}",
        out_col="frechet_q",
    )


def dtw_pairs_sql(
    points_src: str,
    pairs_src: str,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    scale: int = 1_000_000,
    max_points: int = 16,
) -> str:
    """DuckDB twin of :func:`dtw_pairs` (anti-diagonal unroll of the
    accumulating recurrence via ``_track_dp_sql``; BIGINT sums raise
    on overflow, mirroring the operator's loud path-sum bound).
    Standalone statement."""
    return _track_dp_sql(
        points_src, pairs_src, entity_col, lon_col, lat_col,
        order_col, scale, max_points,
        cell_fmt="{d2} + LEAST({up}, {lf}, {dg})",
        base_fmt="{d2}",
        out_col="dtw_q",
    )


def edr_pairs(
    points: DataFrame,
    pairs: DataFrame,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    eps: float = 1e-4,
    scale: int = 1_000_000,
    max_points: int = 64,
) -> DataFrame:
    """Edit Distance on Real sequences between ORDERED tracks for
    candidate pairs — the OUTLIER-ROBUST member of the track-DP trio:
    Fréchet scores the worst leash (one GPS glitch dominates), DTW
    sums every deviation (a glitch still pays its full squared cost),
    EDR counts EDITS — a point either matches within ``eps`` (cost 0)
    or costs exactly 1 (substitute/insert/delete), so a single wild
    fix costs 1 regardless of how far it jumped:

        dp(i,j) = min(dp(i−1,j−1) + [d²(i,j) > ε²],
                      dp(i−1,j) + 1, dp(i,j−1) + 1)
        dp(i,−1) = i+1,  dp(−1,j) = j+1  (virtual empty-prefix edges)

    Exact integers throughout: the match test compares quantized
    int64 d² against round(eps·scale)² — no floats, no tolerance
    drift between engines — and dp values are bounded by n+m, so
    overflow is impossible (unlike DTW's loud path-sum bound).

    Same track materialization, guard, and Arrow-batched per-pair DP
    as its siblings (``_paired_tracks``); the DuckDB twin unrolls the
    SAME recurrence by anti-diagonals with the virtual edge terms
    expressed as COALESCE over the out-of-range diagonal.  Returns
    (id_a, id_b, n_a, n_b, edr_q)."""
    import pandas as _pd

    if eps <= 0:
        raise ValueError("eps must be positive")
    eps_q2 = int(round(eps * scale)) ** 2
    joined = _paired_tracks(
        points, pairs, entity_col, lon_col, lat_col, order_col,
        scale, max_points, "edr_pairs",
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            recs = []
            for ida, idb, ax, ay, bx, by in zip(
                pdf["id_a"], pdf["id_b"], pdf["_ax"], pdf["_ay"],
                pdf["_bx"], pdf["_by"],
            ):
                ax = np.asarray(ax, dtype=np.int64)
                ay = np.asarray(ay, dtype=np.int64)
                bx = np.asarray(bx, dtype=np.int64)
                by = np.asarray(by, dtype=np.int64)
                n, m = len(ax), len(bx)
                cost = (
                    (ax[:, None] - bx[None, :]) ** 2
                    + (ay[:, None] - by[None, :]) ** 2
                    > eps_q2
                ).astype(np.int64)
                dp = np.empty((n, m), dtype=np.int64)
                dp[0, 0] = cost[0, 0]
                for i in range(1, n):
                    dp[i, 0] = min(dp[i - 1, 0] + 1, i + cost[i, 0])
                for j in range(1, m):
                    dp[0, j] = min(dp[0, j - 1] + 1, j + cost[0, j])
                for i in range(1, n):
                    row_c, prev, cur = cost[i], dp[i - 1], dp[i]
                    for j in range(1, m):
                        best = prev[j - 1] + row_c[j]
                        if prev[j] + 1 < best:
                            best = prev[j] + 1
                        if cur[j - 1] + 1 < best:
                            best = cur[j - 1] + 1
                        cur[j] = best
                recs.append(
                    (int(ida), int(idb), n, m, int(dp[n - 1, m - 1]))
                )
            yield _pd.DataFrame(
                recs,
                columns=["id_a", "id_b", "n_a", "n_b", "edr_q"],
            )

    schema = (
        "id_a bigint, id_b bigint, n_a bigint, n_b bigint, "
        "edr_q bigint"
    )
    return joined.mapInPandas(run, schema=schema)


def edr_pairs_sql(
    points_src: str,
    pairs_src: str,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    eps: float = 1e-4,
    scale: int = 1_000_000,
    max_points: int = 16,
) -> str:
    """DuckDB twin of :func:`edr_pairs` (anti-diagonal unroll via
    ``_track_dp_sql``).  The virtual empty-prefix edges dp(i,−1)=i+1
    / dp(−1,j)=j+1 surface only through the DIAGONAL term of border
    cells — dp(i,0)'s diagonal predecessor is the virtual dp(i−1,−1)
    = i — so the cell expression COALESCEs the missing diagonal onto
    CASE i=0 → j, else i (exactly those virtual values); up/left
    border terms are NULL and LEAST ignores them, matching the
    operator's explicit border recurrence.  Standalone statement."""
    if eps <= 0:
        raise ValueError("eps must be positive")
    eps_q2 = int(round(eps * scale)) ** 2
    edge = "CASE WHEN c.i = 0 THEN c.j ELSE c.i END"
    return _track_dp_sql(
        points_src, pairs_src, entity_col, lon_col, lat_col,
        order_col, scale, max_points,
        cell_fmt=(
            "LEAST({up} + 1, {lf} + 1, "
            f"COALESCE({{dg}}, {edge}) + "
            f"(CASE WHEN {{d2}} > {eps_q2} THEN 1 ELSE 0 END))"
        ),
        base_fmt=f"CASE WHEN {{d2}} > {eps_q2} THEN 1 ELSE 0 END",
        out_col="edr_q",
    )


def lcss_pairs(
    points: DataFrame,
    pairs: DataFrame,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    eps: float = 1e-4,
    delta: int | None = None,
    scale: int = 1_000_000,
    max_points: int = 64,
) -> DataFrame:
    """Longest Common SubSequence similarity between ORDERED tracks
    for candidate pairs (Vlachos et al. 2002) — the fourth member of
    the track-DP family and the only one that REWARDS agreement
    instead of charging disagreement: Fréchet takes the worst leash,
    DTW sums every deviation, EDR counts edits, LCSS counts the
    longest order-preserving chain of ε-matched fixes and simply
    SKIPS everything else — so two tracks that share a common
    corridor score high even when one detours wildly in between
    (the noise mode that still costs EDR one edit per junk fix):

        lcss(i,j) = max( lcss(i−1,j−1) + match(i,j),
                         lcss(i−1,j), lcss(i,j−1) ),     borders 0
        match(i,j) = [ d²(i,j) ≤ ε² ]  ∧  [ |i−j| ≤ δ ]

    (the single GREATEST form is valid because adding one element
    raises an LCS by at most 1, so the diagonal term dominates both
    neighbors whenever it matches).  ``delta`` is the optional
    Vlachos time-warp window — matches farther than δ positions
    apart are forbidden, the standard guard against pathological
    alignments between tracks sampled at different rates; None
    disables it.

    Exact integers: the match test compares quantized int64 d²
    against round(ε·scale)² — no float tolerance can drift between
    engines — and dp values are bounded by min(n,m), so overflow is
    impossible.  sim_ppm = lcss·10⁶ DIV min(n,m), the standard
    normalization.

    Same track materialization, loud ``max_points`` guard, and
    Arrow-batched per-pair DP as its siblings (``_paired_tracks``);
    the DuckDB twin unrolls the same recurrence by anti-diagonals.
    Returns (id_a, id_b, n_a, n_b, lcss_q, sim_ppm)."""
    import pandas as _pd

    if eps <= 0:
        raise ValueError("eps must be positive")
    if delta is not None and int(delta) < 0:
        raise ValueError(f"delta must be None or >= 0: {delta}")
    eps_q2 = int(round(eps * scale)) ** 2
    dlt = None if delta is None else int(delta)
    joined = _paired_tracks(
        points, pairs, entity_col, lon_col, lat_col, order_col,
        scale, max_points, "lcss_pairs",
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            recs = []
            for ida, idb, ax, ay, bx, by in zip(
                pdf["id_a"], pdf["id_b"], pdf["_ax"], pdf["_ay"],
                pdf["_bx"], pdf["_by"],
            ):
                ax = np.asarray(ax, dtype=np.int64)
                ay = np.asarray(ay, dtype=np.int64)
                bx = np.asarray(bx, dtype=np.int64)
                by = np.asarray(by, dtype=np.int64)
                n, m = len(ax), len(bx)
                match = (
                    (ax[:, None] - bx[None, :]) ** 2
                    + (ay[:, None] - by[None, :]) ** 2
                    <= eps_q2
                )
                if dlt is not None:
                    ii = np.arange(n)[:, None]
                    jj = np.arange(m)[None, :]
                    match &= np.abs(ii - jj) <= dlt
                match = match.astype(np.int64)
                dp = np.zeros((n + 1, m + 1), dtype=np.int64)
                for i in range(1, n + 1):
                    row_m, prev, cur = match[i - 1], dp[i - 1], dp[i]
                    for j in range(1, m + 1):
                        best = prev[j - 1] + row_m[j - 1]
                        if prev[j] > best:
                            best = prev[j]
                        if cur[j - 1] > best:
                            best = cur[j - 1]
                        cur[j] = best
                lc = int(dp[n, m])
                recs.append(
                    (int(ida), int(idb), n, m, lc,
                     (lc * 1_000_000) // min(n, m))
                )
            yield _pd.DataFrame(
                recs,
                columns=["id_a", "id_b", "n_a", "n_b", "lcss_q",
                         "sim_ppm"],
            )

    schema = (
        "id_a bigint, id_b bigint, n_a bigint, n_b bigint, "
        "lcss_q bigint, sim_ppm bigint"
    )
    return joined.mapInPandas(run, schema=schema)


def lcss_pairs_sql(
    points_src: str,
    pairs_src: str,
    entity_col: str = "entity",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "seq",
    eps: float = 1e-4,
    delta: int | None = None,
    scale: int = 1_000_000,
    max_points: int = 16,
) -> str:
    """DuckDB twin of :func:`lcss_pairs` (anti-diagonal unroll of the
    maximizing recurrence via ``_track_dp_sql``; missing borders
    COALESCE to 0 — the empty-prefix LCS).  Standalone statement."""
    if eps <= 0:
        raise ValueError("eps must be positive")
    if delta is not None and int(delta) < 0:
        raise ValueError(f"delta must be None or >= 0: {delta}")
    eps_q2 = int(round(eps * scale)) ** 2
    win = (
        f" AND ABS(c.i - c.j) <= {int(delta)}"
        if delta is not None
        else ""
    )
    inner = _track_dp_sql(
        points_src, pairs_src, entity_col, lon_col, lat_col,
        order_col, scale, max_points,
        cell_fmt=(
            f"GREATEST(COALESCE({{dg}}, 0) + (CASE WHEN "
            f"{{d2}} <= {eps_q2}{win} THEN 1 ELSE 0 END), "
            "COALESCE({up}, 0), COALESCE({lf}, 0))"
        ),
        base_fmt=f"CASE WHEN {{d2}} <= {eps_q2} THEN 1 ELSE 0 END",
        out_col="lcss_q",
    )
    return f"""
        SELECT id_a, id_b, n_a, n_b, lcss_q,
               CAST((lcss_q * 1000000) // LEAST(n_a, n_b)
                    AS BIGINT) AS sim_ppm
        FROM ({inner})
    """


def tile_hotspots_ctes(
    rollup_src: str,
    value_col: str = "n_pages",
    res_deg: float = DEFAULT_RES_DEG,
    z_num: int = 2,
    z_den: int = 1,
    final_cte: str | None = None,
) -> str:
    """Twin CTE block for :func:`tile_hotspots` over an existing
    rollup CTE exposing (cell, value_col) — the inline oracle body
    factored so composed twins (emerging_hotspots) replay the exact
    same Gi* arithmetic.  gi_* namespaced; no leading WITH.  With
    ``final_cte`` the output select is wrapped as a CTE of that
    name."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    zn2 = int(z_num) * int(z_num)
    zd2 = int(z_den) * int(z_den)
    out = f"""
        SELECT cell, n_nbrs, nbr_sum,
               CAST(A AS BIGINT) AS gi_num,
               (A > 0 AND A*A*(n_cells-1)*{zd2} >= {zn2}*X*Y) AS hot,
               (A < 0 AND A*A*(n_cells-1)*{zd2} >= {zn2}*X*Y) AS cold
        FROM gi_z"""
    if final_cte is not None:
        out = f", {final_cte} AS ({out}\n        )"
    return f"""
        gi_fan AS (
            SELECT r.{value_col} AS v,
                   (((r.cell // {cols}) + d.dy) * {cols}
                    + ((r.cell % {cols}) + d.dx + {cols}) % {cols})
                       AS t_cell
            FROM {rollup_src} r CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
            WHERE (r.cell // {cols}) + d.dy >= 0
              AND (r.cell // {cols}) + d.dy < {rows_n}
        ),
        gi_agg AS (
            SELECT t_cell AS cell,
                   COUNT(*) AS n_nbrs,
                   CAST(SUM(v) AS BIGINT) AS nbr_sum
            FROM gi_fan GROUP BY 1
        ),
        gi_tot AS (
            SELECT COUNT(*) AS n_cells,
                   CAST(SUM({value_col}) AS BIGINT) AS tot_v,
                   SUM(CAST({value_col} AS HUGEINT) * {value_col})
                       AS tot_sq
            FROM {rollup_src}
        ),
        gi_z AS (
            SELECT r.cell, a.n_nbrs, a.nbr_sum,
                   CAST(t.n_cells AS HUGEINT) * a.nbr_sum
                     - CAST(t.tot_v AS HUGEINT) * a.n_nbrs AS A,
                   CAST(t.n_cells AS HUGEINT) * t.tot_sq
                     - CAST(t.tot_v AS HUGEINT) * t.tot_v AS X,
                   CAST(t.n_cells AS HUGEINT) * a.n_nbrs
                     - CAST(a.n_nbrs AS HUGEINT) * a.n_nbrs AS Y,
                   t.n_cells
            FROM {rollup_src} r JOIN gi_agg a ON a.cell = r.cell
            CROSS JOIN gi_tot t
        ){out}
    """


EMERGING_LABELS = {
    ("hot", "up"): "intensifying-hot",
    ("hot", "flat"): "persistent-hot",
    ("hot", "down"): "diminishing-hot",
    ("cold", "up"): "diminishing-cold",
    ("cold", "flat"): "persistent-cold",
    ("cold", "down"): "intensifying-cold",
    ("none", "up"): "emerging",
    ("none", "down"): "receding",
    ("none", "flat"): "none",
}


def emerging_hotspots(
    pages_with_cells: DataFrame,
    time_col: str = "version",
    n_bins: int = 4,
    min_s: int = 2,
    res_deg: float = DEFAULT_RES_DEG,
    z_num: int = 2,
    z_den: int = 1,
) -> DataFrame:
    """Emerging-hotspot analysis — the space-time classification
    joining WHERE activity is anomalously dense (:func:`tile_hotspots`
    Gi* on the all-time rollup) with WHETHER it is rising or falling
    (:func:`tile_trend` Mann-Kendall S over time bins): the ArcGIS
    space-time-cube headline readout, here as a pure composition of
    the two exact-integer statistics — no new arithmetic, so the
    twin replays both components and the join.

    Label algebra (one CASE over the 3×3 state space, see
    ``EMERGING_LABELS``): a significant hotspot is 'intensifying-',
    'persistent-' or 'diminishing-hot' by trend; cold spots mirror
    ('intensifying-cold' = cooling FURTHER, i.e. trend down); cells
    significant in neither direction are 'emerging' (trend up),
    'receding' (down) or 'none'.

    Plan: the rollup and the trend's (cell, bin) counts are two
    partial-agg groupBys of the SAME point pass; everything after
    runs on aggregate rasters (fan ×9, bins ×C(n,2)); the final join
    is cell-keyed between two cell-sized tables.  Input:
    (cell, time_col) rows, one per point.

    Returns (cell, n_pages, gi_num, hot, cold, s_stat, trend,
    label)."""
    rollup = pages_with_cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    hs = tile_hotspots(rollup, "n_pages", res_deg, z_num, z_den)
    tr = tile_trend(
        pages_with_cells.select("cell", time_col),
        time_col=time_col, n_bins=n_bins, min_s=min_s,
    )
    spot = (
        F.when(F.col("hot"), F.lit("hot"))
        .when(F.col("cold"), F.lit("cold"))
        .otherwise(F.lit("none"))
    )
    label = F.lit(None).cast("string")
    for (sp, t), lab in EMERGING_LABELS.items():
        label = F.when(
            (spot == sp) & (F.col("trend") == t), F.lit(lab)
        ).otherwise(label)
    return (
        rollup.join(hs.select("cell", "gi_num", "hot", "cold"), "cell")
        .join(tr, "cell")
        .select(
            "cell", "n_pages", "gi_num", "hot", "cold",
            "s_stat", "trend", label.alias("label"),
        )
    )


def emerging_hotspots_ctes(
    src: str,
    time_col: str = "version",
    n_bins: int = 4,
    min_s: int = 2,
    res_deg: float = DEFAULT_RES_DEG,
    z_num: int = 2,
    z_den: int = 1,
) -> str:
    """Twin CTE block + final SELECT for :func:`emerging_hotspots`
    over a CTE ``src`` exposing (cell, time_col) point rows; composes
    :func:`tile_hotspots_ctes` and :func:`tile_trend_ctes` verbatim —
    the composition itself is what this twin hash-verifies."""
    labels = " ".join(
        f"WHEN spot = '{sp}' AND trend = '{t}' THEN '{lab}'"
        for (sp, t), lab in EMERGING_LABELS.items()
    )
    return f"""
        eh_rollup AS (
            SELECT cell, COUNT(*) AS n_pages FROM {src} GROUP BY 1
        ),
        {tile_hotspots_ctes('eh_rollup', 'n_pages', res_deg,
                            z_num, z_den, final_cte='eh_hs')[1:]},
        {tile_trend_ctes(src, time_col, n_bins, min_s,
                         final_cte='eh_tr')[1:]}
        SELECT r.cell, r.n_pages, h.gi_num, h.hot, h.cold,
               t.s_stat, t.trend,
               CASE {labels} END AS label
        FROM eh_rollup r
        JOIN (SELECT cell, gi_num, hot, cold,
                     CASE WHEN hot THEN 'hot'
                          WHEN cold THEN 'cold'
                          ELSE 'none' END AS spot
              FROM eh_hs) h ON h.cell = r.cell
        JOIN eh_tr t ON t.cell = r.cell
    """


def _correlogram_offsets(max_band: int) -> "list[tuple[int, int, int]]":
    """Forward half-plane (dy, dx, band) offsets for Chebyshev rings
    1..max_band: dy > 0 with dx ∈ [−b, b], plus dy = 0 with dx ∈
    [1, b] — each unordered pair visited from exactly one side
    (the morans_i forward-adjacency rule generalized to ring k)."""
    out = []
    b = int(max_band)
    for dy in range(0, b + 1):
        for dx in range(-b if dy > 0 else 1, b + 1):
            out.append((dy, dx, max(dy, abs(dx))))
    return out


def morans_correlogram(
    cells: DataFrame,
    value_col: str,
    max_band: int = 3,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Spatial correlogram — Moran's I per Chebyshev ring distance
    band k = 1..``max_band`` over the occupied-cell raster: I(1) is
    :func:`morans_i` restricted to its queen ring; the decay of I(k)
    with k is the autocorrelation RANGE (how far the clustering
    reaches), the grid-statistics sibling of :func:`semivariogram`
    (which sums squared value differences; the correlogram correlates
    N-scaled deviations, so the two disagree exactly where outlier
    magnitude matters).  Non-cumulative bands: ring k only.

    Exact arithmetic inherited from morans_i: d_i = N·x_i − S,
    num_k = Σ_{ring k} w·d_i·d_j (directed = 2× forward sum),
    den = Σd², i_ppm(k) = (N·num_k·10⁶) DIV (w_sum_k·den) in
    decimal(38,0)/HUGEINT with shared truncation; empty bands and
    den = 0 emit NULL.

    Plan: ONE forward fan at the largest ring (≈ 2·max_band² + max_band
    offsets per cell, on the AGGREGATE raster), each unordered pair
    emitted once with its band; per-band aggregation from the same
    pair stream — never k passes (the ripley_k sweep discipline);
    the band axis densifies from a literal sequence so every k
    appears.  Grid: lon wrap + lat clamp; cols ≥ 2·max_band + 3
    enforced so forward fan targets stay distinct under wrap.

    Returns (band, n_cells, w_sum, num, den, i_ppm), band ascending."""
    if max_band < 1:
        raise ValueError(f"max_band must be ≥ 1, got {max_band}")
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 2 * max_band + 3:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ "
            f"{2 * max_band + 3} for once-per-pair ring-{max_band} "
            "adjacency under lon wrap"
        )
    vals = cells.select(
        "cell", F.col(value_col).cast("bigint").alias("_x")
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_s")
    )
    dev = vals.crossJoin(F.broadcast(stats)).select(
        "cell",
        "_n",
        (F.col("_n") * F.col("_x") - F.col("_s")).alias("_d"),
    )
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    fwd = []
    for dy, dx, band in _correlogram_offsets(max_band):
        t_lat = lat_b + F.lit(dy)
        t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
        fwd.append(
            F.when(
                (t_lat >= 0) & (t_lat < rows_n),
                F.struct(
                    (t_lat * F.lit(cols) + t_lon)
                    .cast("bigint").alias("nbr"),
                    F.lit(band).cast("int").alias("band"),
                ),
            )
        )
    fan = dev.select(
        F.col("_d").alias("_d1"),
        F.explode(F.array_compact(F.array(*fwd))).alias("_t"),
    ).select("_d1", F.col("_t.nbr").alias("_nbr"),
             F.col("_t.band").alias("band"))
    dec = "decimal(38,0)"
    paired = fan.join(
        dev.select(F.col("cell").alias("_nbr"), F.col("_d").alias("_d2")),
        "_nbr",
    )
    per_band = paired.groupBy("band").agg(
        (F.count(F.lit(1)) * 2).alias("w_sum"),
        (F.sum(F.expr(f"CAST(_d1 AS {dec}) * _d2")) * 2).alias("_num"),
    )
    dev_agg = dev.agg(
        F.max("_n").alias("n_cells"),
        F.sum(F.expr(f"CAST(_d AS {dec}) * _d")).alias("_den"),
    )
    bands = cells.sparkSession.range(1, max_band + 1).select(
        F.col("id").cast("int").alias("band")
    )
    return (
        bands.join(per_band, "band", "left")
        .crossJoin(F.broadcast(dev_agg))
        .select(
            "band",
            "n_cells",
            F.coalesce("w_sum", F.lit(0)).cast("bigint").alias("w_sum"),
            F.col("_num").cast("bigint").alias("num"),
            F.col("_den").cast("bigint").alias("den"),
            F.expr(
                f"CAST(CASE WHEN _den = 0 OR COALESCE(w_sum, 0) = 0 "
                f"THEN NULL ELSE "
                f"(CAST(n_cells AS {dec}) * _num * 1000000) DIV "
                f"(CAST(w_sum AS {dec}) * _den) END AS BIGINT)"
            ).alias("i_ppm"),
        )
        .orderBy("band")
    )


def morans_correlogram_ctes(
    src: str,
    value_col: str,
    max_band: int = 3,
    res_deg: float = DEFAULT_RES_DEG,
) -> str:
    """Twin CTE block + final SELECT for :func:`morans_correlogram`
    over a CTE ``src`` exposing (cell, value_col) — mc_* namespaced,
    HUGEINT mirror of the decimal(38,0) path, identical offset table
    generated from the same Python enumeration so the two cannot
    drift."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    offs = ", ".join(
        f"({dy},{dx},{band})"
        for dy, dx, band in _correlogram_offsets(max_band)
    )
    return f"""
        mc_vals AS (
            SELECT cell, CAST({value_col} AS BIGINT) AS x FROM {src}
        ),
        mc_stats AS (
            SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s
            FROM mc_vals
        ),
        mc_dev AS (
            SELECT cell, t.n, t.n * v.x - t.s AS d
            FROM mc_vals v CROSS JOIN mc_stats t
        ),
        mc_fan AS (
            SELECT v.d AS d1, o.band,
                   (((v.cell // {cols}) + o.dy) * {cols}
                    + ((v.cell % {cols}) + o.dx + {cols}) % {cols})
                       AS nbr
            FROM mc_dev v CROSS JOIN (VALUES {offs}) o(dy, dx, band)
            WHERE (v.cell // {cols}) + o.dy >= 0
              AND (v.cell // {cols}) + o.dy < {rows_n}
        ),
        mc_pair AS (
            SELECT f.band,
                   CAST(COUNT(*) * 2 AS BIGINT) AS w_sum,
                   SUM(CAST(f.d1 AS HUGEINT) * w.d) * 2 AS num
            FROM mc_fan f JOIN mc_dev w ON w.cell = f.nbr
            GROUP BY 1
        ),
        mc_glob AS (
            SELECT MAX(n) AS n_cells,
                   SUM(CAST(d AS HUGEINT) * d) AS den
            FROM mc_dev
        )
        SELECT CAST(b.band AS INTEGER) AS band,
               CAST(g.n_cells AS BIGINT) AS n_cells,
               CAST(COALESCE(p.w_sum, 0) AS BIGINT) AS w_sum,
               CAST(p.num AS BIGINT) AS num,
               CAST(g.den AS BIGINT) AS den,
               CAST(CASE WHEN g.den = 0 OR COALESCE(p.w_sum, 0) = 0
                    THEN NULL ELSE
                    (CAST(g.n_cells AS HUGEINT) * p.num * 1000000)
                    // (CAST(p.w_sum AS HUGEINT) * g.den)
               END AS BIGINT) AS i_ppm
        FROM (SELECT UNNEST(range(1, {int(max_band)} + 1)) AS band) b
        LEFT JOIN mc_pair p ON p.band = b.band
        CROSS JOIN mc_glob g
    """


def contact_episodes(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    window_s: int = 3600,
    max_cell_bucket: int = 10_000,
) -> DataFrame:
    """Contact EPISODES — :func:`colocation_pairs` upgraded from pair
    totals to maximal runs of consecutive contact buckets: the
    exposure-duration readout (how LONG were these two entities
    co-present, how many separate encounters) that epidemiology /
    convoy / shared-session analyses need, where a bare moment count
    can't distinguish one 8-hour convoy from eight scattered pings.

    Contact definition (crisper than colocation_pairs, stated): a
    pair is in contact in bucket b iff BOTH have an event in b (bucket
    width = ``window_s``) within the 3×3 wrapped cell neighborhood —
    the ±1-bucket slack is dropped so each bucket is an unambiguous
    episode atom.  Episodes are maximal runs of consecutive contact
    buckets (gap ≥ 1 empty bucket splits).

    Exactly-once per (pair, bucket, event-pair): only the left side
    fans (9 spatial probes, same bucket), right side raw, id_a <
    id_b — the colocation_pairs argument verbatim.  The quadratic
    cell×bucket risk carries the same LOUD occupancy guard.

    Plan: one (cell, bucket) equi-join → per-(pair, bucket) partial
    agg → the gaps-and-islands window INSIDE the pair's own
    partition (bucket − row_number island key; ≤ one row per contact
    bucket, never raw events).  Returns (id_a, id_b, episode,
    start_bucket, end_bucket, n_buckets, n_moments), episode 1-based
    per pair in bucket order."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    if cols < 5:
        raise ValueError(
            f"res_deg {res_deg} gives {cols} grid columns; need ≥ 5 "
            "for wrap-unambiguous 3×3 probing"
        )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    win_us = int(window_s) * 1_000_000
    base = points.select(
        F.col(id_col).alias("_id"),
        grid_cell(F.col(lon), F.col(lat), res_deg).alias("_cell"),
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
               f"DIV {win_us}").alias("_bk"),
    )
    right = base.select(
        F.col("_id").alias("id_b"),
        F.col("_cell").alias("_rcell"),
        F.col("_bk").alias("_rbk"),
    )
    occ = right.groupBy("_rcell", "_rbk").agg(
        F.count(F.lit(1)).alias("_occ")
    )
    guard = F.assert_true(
        F.col("_occ") <= F.lit(int(max_cell_bucket)),
        F.lit(
            f"cell×bucket occupancy exceeds max_cell_bucket="
            f"{max_cell_bucket} in contact_episodes; the pair join is "
            "quadratic per key — thin hot cells explicitly or raise "
            "the cap"
        ),
    )
    right = right.join(occ, ["_rcell", "_rbk"]).select(
        F.when(guard.isNull(), F.col("id_b")).alias("id_b"),
        "_rcell", "_rbk",
    )
    lat_b = F.floor(F.col("_cell") / F.lit(cols))
    lon_b = F.col("_cell") % F.lit(cols)
    probes = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            probes.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = base.select(
        F.col("_id").alias("id_a"),
        F.explode(
            F.array_distinct(F.array_compact(F.array(*probes)))
        ).alias("_rcell"),
        F.col("_bk").alias("_rbk"),
    )
    moments = (
        fan.join(right, ["_rcell", "_rbk"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", F.col("_rbk").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_moments"))
    )
    w = W.partitionBy("id_a", "id_b").orderBy("bucket")
    islands = moments.withColumn(
        "_isl", F.col("bucket") - F.row_number().over(w)
    )
    we = W.partitionBy("id_a", "id_b").orderBy("start_bucket")
    return (
        islands.groupBy("id_a", "id_b", "_isl")
        .agg(
            F.min("bucket").alias("start_bucket"),
            F.max("bucket").alias("end_bucket"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n_moments").alias("n_moments"),
        )
        .select(
            "id_a", "id_b",
            F.row_number().over(we).cast("bigint").alias("episode"),
            "start_bucket", "end_bucket", "n_buckets", "n_moments",
        )
    )


def contact_episodes_sql(
    src: str,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    window_s: int = 3600,
) -> str:
    """DuckDB twin of :func:`contact_episodes` (standalone; ce_*
    namespaced; no occupancy guard — the operator owns the loud
    failure)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    win_us = int(window_s) * 1_000_000
    return f"""
        WITH ce_base AS (
            SELECT {id_col} AS id,
                   {grid_cell_sql(lon, lat, res_deg)} AS cell,
                   epoch_us(CAST({ts_col} AS TIMESTAMP)) // {win_us}
                       AS bk
            FROM {src}
        ),
        ce_fan AS (
            SELECT b.id AS id_a, b.bk,
                   (((b.cell // {cols}) + d.dy) * {cols}
                    + ((b.cell % {cols}) + d.dx + {cols}) % {cols})
                       AS rcell
            FROM ce_base b CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
            WHERE (b.cell // {cols}) + d.dy >= 0
              AND (b.cell // {cols}) + d.dy < {rows_n}
        ),
        ce_moments AS (
            SELECT f.id_a, r.id AS id_b, f.bk AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_moments
            FROM ce_fan f
            JOIN ce_base r ON r.cell = f.rcell AND r.bk = f.bk
            WHERE f.id_a < r.id
            GROUP BY 1, 2, 3
        ),
        ce_isl AS (
            SELECT *, bucket - ROW_NUMBER() OVER (
                       PARTITION BY id_a, id_b ORDER BY bucket) AS isl
            FROM ce_moments
        ),
        ce_ep AS (
            SELECT id_a, id_b,
                   MIN(bucket) AS start_bucket,
                   MAX(bucket) AS end_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(n_moments) AS BIGINT) AS n_moments
            FROM ce_isl GROUP BY id_a, id_b, isl
        )
        SELECT id_a, id_b,
               CAST(ROW_NUMBER() OVER (PARTITION BY id_a, id_b
                    ORDER BY start_bucket) AS BIGINT) AS episode,
               start_bucket, end_bucket, n_buckets, n_moments
        FROM ce_ep
    """


def rect_union_area(
    rects: DataFrame,
    group_col: str = "gid",
    max_rects_per_group: int = 10_000,
) -> DataFrame:
    """Exact union (dissolved-footprint) area of axis-aligned
    rectangles per group — the GIS *dissolve* the reference's region
    bookkeeping never needs (its 1° cells are disjoint by
    construction, run_regions.rb:37-55) but any layer of per-document
    extents does: overlapping bboxes double-count under plain
    SUM(area), and "how much of the map does this language/domain
    actually cover" is a union question.

    Classic sweep, re-expressed as three window passes — never a
    per-group Python geometry kernel and never inclusion–exclusion
    (exponential in overlap depth):

      1. the group's distinct x bounds become vertical SLABS
         [x_i, x_{i+1}) via one LEAD window; inside a slab the union's
         cross-section is constant;
      2. each rect joins the slabs it fully spans (group-key hash
         equi-join + range residual — per-group fan is O(R·S) ≤ O(R²),
         guarded LOUDLY by ``max_rects_per_group`` with the raise
         riding the slab key every downstream row consumes);
      3. per (group, slab) the y-interval union length is
         gaps-and-islands: ordered by (miny, maxy), a row opens a new
         island iff its miny exceeds the running MAX(maxy) of all
         preceding rows (strict >, so half-open touching intervals
         merge seamlessly); island length = MAX(maxy) − MIN(miny).

    Island assignment is tie-order-insensitive: equal-miny rows can
    never open an island against each other (miny ≤ the other's maxy
    ≤ running max), so the result is partitioning- and
    parallelism-deterministic.

    EXACT integer geometry end-to-end: bounds are integer µdeg
    (half-open [min, max) — degenerate zero-width/height rects
    contribute nothing and empty y-intervals never bridge a real gap,
    both tested), slab_width · y_len ≤ 360e6 · 180e6 ≈ 6.5·10¹⁶ fits
    int64 even for world-sized groups, and the coverage ratio
    union·10⁶ DIV bbox_area rides decimal(38) (numerator up to
    6.5·10²²).  All DIV operands non-negative, so Spark's truncating
    DIV and DuckDB's flooring // agree.

    Inverted rects (maxx < minx or maxy < miny) fail loud — a silent
    abs() would hide an upstream coordinate bug.

    Output: one row per group
    (``group_col``, n_rects, bbox_area, union_area, covered_ppm);
    groups whose rects are all degenerate keep a zero-area row with
    covered_ppm NULL (0/0 is undefined, not zero)."""
    g = group_col
    valid = F.assert_true(
        (F.col("minx") <= F.col("maxx")) & (F.col("miny") <= F.col("maxy")),
        F.lit("rect_union_area: inverted rect (max < min); fix the layer"),
    )
    pad0 = F.coalesce(valid.cast("bigint"), F.lit(0))
    r = rects.select(
        g,
        (F.col("minx").cast("bigint") + pad0).alias("minx"),
        F.col("miny").cast("bigint").alias("miny"),
        F.col("maxx").cast("bigint").alias("maxx"),
        F.col("maxy").cast("bigint").alias("maxy"),
    )
    grp = r.groupBy(g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rects"),
        F.min("minx").alias("_bx0"),
        F.min("miny").alias("_by0"),
        F.max("maxx").alias("_bx1"),
        F.max("maxy").alias("_by1"),
    )
    size_guard = F.when(
        F.col("n_rects") > int(max_rects_per_group),
        F.raise_error(
            F.concat(
                F.lit(f"rect_union_area: group {g}="),
                F.col(g).cast("string"),
                F.lit(
                    f" has more rects than max_rects_per_group="
                    f"{int(max_rects_per_group)}; pre-aggregate or "
                    "raise the cap"
                ),
            )
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    edges = r.select(g, F.col("minx").alias("x")).unionByName(
        r.select(g, F.col("maxx").alias("x"))
    ).groupBy(g, "x").agg(F.count(F.lit(1)).alias("_e"))
    wx = W.partitionBy(g).orderBy("x")
    slabs = (
        edges.select(g, F.col("x").alias("x0"),
                     F.lead("x").over(wx).alias("x1"))
        .where(F.col("x1").isNotNull())
        # the guard rides x0 — the slab key every downstream join,
        # window and aggregate consumes (dead-column-assert lesson)
        .join(F.broadcast(grp.select(g, size_guard.alias("_pad"))), g)
        .select(g, (F.col("x0") + F.col("_pad")).alias("x0"), "x1")
    )
    act = slabs.join(r, g).where(
        (F.col("minx") <= F.col("x0")) & (F.col("x1") <= F.col("maxx"))
    )
    w_isl = W.partitionBy(g, "x0").orderBy("miny", "maxy")
    prev_max = F.max("maxy").over(
        w_isl.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = act.select(
        g, "x0", "x1", "miny", "maxy",
        F.when(
            prev_max.isNull() | (F.col("miny") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)).alias("_new"),
    ).select(
        g, "x0", "x1", "miny", "maxy",
        F.sum("_new").over(
            w_isl.rowsBetween(W.unboundedPreceding, 0)
        ).alias("_isl"),
    )
    ylen = flagged.groupBy(g, "x0", "x1", "_isl").agg(
        (F.max("maxy") - F.min("miny")).alias("_len")
    )
    area = (
        ylen.groupBy(g)
        .agg(
            F.sum((F.col("x1") - F.col("x0")) * F.col("_len"))
            .cast("bigint").alias("union_area")
        )
    )
    dec = "decimal(38,0)"
    return (
        grp.join(area, g, "left")
        .select(
            g,
            "n_rects",
            ((F.col("_bx1") - F.col("_bx0"))
             * (F.col("_by1") - F.col("_by0"))).alias("bbox_area"),
            F.coalesce("union_area", F.lit(0)).cast("bigint")
            .alias("union_area"),
        )
        .select(
            g, "n_rects", "bbox_area", "union_area",
            F.expr(
                f"CAST(CASE WHEN bbox_area > 0 THEN "
                f"(CAST(union_area AS {dec}) * 1000000) DIV bbox_area "
                f"END AS BIGINT)"
            ).alias("covered_ppm"),
        )
    )


def rect_union_area_sql(src: str, group_col: str = "gid") -> str:
    """DuckDB twin of :func:`rect_union_area` (standalone statement)."""
    return "WITH " + rect_union_area_ctes(src, group_col)


def rect_union_area_ctes(src: str, group_col: str = "gid") -> str:
    """The twin without the leading WITH (oracle-prelude appendable) —
    the identical slab sweep + gaps-and-islands in window SQL (the
    *definition* is verified separately by the test suite's
    compressed-grid rasterization mirror, a structurally different
    algorithm)."""
    g = group_col
    return f"""
        ru_r AS (
            SELECT {g} AS g, CAST(minx AS BIGINT) AS minx,
                   CAST(miny AS BIGINT) AS miny,
                   CAST(maxx AS BIGINT) AS maxx,
                   CAST(maxy AS BIGINT) AS maxy
            FROM {src}
        ),
        ru_grp AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rects,
                   MIN(minx) AS bx0, MIN(miny) AS by0,
                   MAX(maxx) AS bx1, MAX(maxy) AS by1
            FROM ru_r GROUP BY 1
        ),
        ru_edges AS (
            SELECT g, x FROM (
                SELECT g, minx AS x FROM ru_r
                UNION ALL SELECT g, maxx FROM ru_r
            ) GROUP BY 1, 2
        ),
        ru_slabs AS (
            SELECT g, x AS x0, LEAD(x) OVER (
                       PARTITION BY g ORDER BY x) AS x1
            FROM ru_edges
        ),
        ru_act AS (
            SELECT s.g, s.x0, s.x1, r.miny, r.maxy
            FROM ru_slabs s JOIN ru_r r ON s.g = r.g
            WHERE s.x1 IS NOT NULL
              AND r.minx <= s.x0 AND s.x1 <= r.maxx
        ),
        ru_flag AS (
            SELECT g, x0, x1, miny, maxy,
                   CASE WHEN MAX(maxy) OVER w IS NULL
                          OR miny > MAX(maxy) OVER w
                        THEN 1 ELSE 0 END AS nw
            FROM ru_act
            WINDOW w AS (PARTITION BY g, x0 ORDER BY miny, maxy
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)
        ),
        ru_isl AS (
            SELECT g, x0, x1, miny, maxy,
                   SUM(nw) OVER (PARTITION BY g, x0
                                 ORDER BY miny, maxy
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS isl
            FROM ru_flag
        ),
        ru_len AS (
            SELECT g, x0, x1, MAX(maxy) - MIN(miny) AS len
            FROM ru_isl GROUP BY g, x0, x1, isl
        ),
        ru_area AS (
            SELECT g, CAST(SUM((x1 - x0) * len) AS BIGINT) AS ua
            FROM ru_len GROUP BY 1
        )
        SELECT gr.g AS {g}, gr.n_rects,
               (gr.bx1 - gr.bx0) * (gr.by1 - gr.by0) AS bbox_area,
               CAST(COALESCE(a.ua, 0) AS BIGINT) AS union_area,
               CAST(CASE WHEN (gr.bx1 - gr.bx0) * (gr.by1 - gr.by0) > 0
                    THEN (CAST(COALESCE(a.ua, 0) AS HUGEINT) * 1000000)
                         // ((gr.bx1 - gr.bx0) * (gr.by1 - gr.by0))
               END AS BIGINT) AS covered_ppm
        FROM ru_grp gr LEFT JOIN ru_area a USING (g)
    """


def polygon_validity(
    points: DataFrame,
    id_col: str = "polygon_id",
    order_col: str = "seq",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 1_000_000,
    max_vertices: int = 1_024,
) -> DataFrame:
    """OGC-style simple-polygon validity report per ring — the
    ingest gate the polygon layer operators (pip_*, polygon_stats,
    areal_interp) all silently assume: a bowtie ring still HAS a
    well-defined shoelace value, so nothing downstream errors — the
    answers are just wrong.  This operator makes the assumption
    checkable, in exact quantized-integer geometry:

    * ``n_vertices`` — after normalizing an explicitly-closed ring
      (last vertex == first is dropped, the common GeoJSON shape);
    * ``area2_q`` — twice the signed shoelace area in scale² units
      (positive = counter-clockwise), exact int64;
    * ``orientation`` — 'ccw' / 'cw' / 'degenerate' (area2 = 0);
    * ``n_zero_edges`` — consecutive duplicate vertices;
    * ``n_cross_pairs`` — edge pairs that intersect where they may
      not: NON-adjacent pairs failing the exact segment-intersection
      predicate (proper crossing via orientation signs — sign
      comparison, never a product of two cross terms, which would
      overflow int64 — plus the four collinear/on-segment touches);
      ADJACENT pairs whose free endpoints fold back collinearly past
      the shared vertex (orient = 0 and positive dot — the spike);
    * ``is_valid`` — n ≥ 3, no zero edges, no cross pairs, area ≠ 0.

    Cross products are bounded by 2·(360·scale)² — scale ≤ 10⁶ keeps
    them < 2.6·10¹⁷, safely int64 (guarded).  The O(k²) edge-pair fan
    is per ring behind a LOUD ``max_vertices`` guard; the self-join
    and every window share one hash partitioning on the ring id, so
    rings parallelize and nothing crosses rings.

    Returns (id_col, n_vertices, area2_q, orientation, n_zero_edges,
    n_cross_pairs, is_valid)."""
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 cross bound")
    if not 3 <= int(max_vertices) <= 8_192:
        raise ValueError(f"max_vertices out of range: {max_vertices}")
    wo = W.partitionBy("_id").orderBy(order_col)
    wall = W.partitionBy("_id")
    raw = (
        points.select(
            F.col(id_col).alias("_id"),
            F.col(order_col),
            F.round(F.col(lon_col) * scale).cast("long").alias("x"),
            F.round(F.col(lat_col) * scale).cast("long").alias("y"),
        )
        .withColumn("_i", F.row_number().over(wo) - 1)
        .withColumn("_n0", F.count(F.lit(1)).over(wall))
        .withColumn(
            "_x0",
            F.first("x").over(
                wo.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .withColumn(
            "_y0",
            F.first("y").over(
                wo.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    opened = (
        raw.withColumn(
            "_closing",
            (F.col("_i") == F.col("_n0") - 1)
            & (F.col("x") == F.col("_x0"))
            & (F.col("y") == F.col("_y0"))
            & (F.col("_n0") > 1),
        )
        .where(~F.col("_closing"))
        .withColumn("_n", F.count(F.lit(1)).over(wall))
    )
    guard = F.when(
        F.col("_n") > int(max_vertices),
        F.raise_error(F.concat(
            F.lit("polygon_validity: ring holds "),
            F.col("_n").cast("string"),
            F.lit(f" vertices > max_vertices={int(max_vertices)}; "
                  "simplify or split the ring first"),
        )).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    verts = opened.select(
        "_id", "_i", (F.col("x") + guard).alias("x"), "y", "_n"
    )
    b = verts.select(
        F.col("_id").alias("_id2"), F.col("_i").alias("_j"),
        F.col("x").alias("bx"), F.col("y").alias("by"),
    )
    edges = (
        verts.join(
            b,
            (F.col("_id") == F.col("_id2"))
            & (F.col("_j") == F.pmod(F.col("_i") + 1, F.col("_n"))),
        )
        .select(
            "_id", "_i", "_n",
            F.col("x").alias("ax"), F.col("y").alias("ay"),
            "bx", "by",
        )
    )
    heads = edges.groupBy("_id").agg(
        F.max("_n").cast("long").alias("n_vertices"),
        F.sum(
            F.col("ax") * F.col("by") - F.col("bx") * F.col("ay")
        ).cast("long").alias("area2_q"),
        F.sum(
            F.when(
                (F.col("ax") == F.col("bx"))
                & (F.col("ay") == F.col("by")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_zero_edges"),
    )
    e2 = edges.select(
        F.col("_id").alias("_idr"), F.col("_i").alias("_k"),
        F.col("ax").alias("cx"), F.col("ay").alias("cy"),
        F.col("bx").alias("dx"), F.col("by").alias("dy"),
    )
    pairs = edges.join(
        e2,
        (F.col("_id") == F.col("_idr"))
        & (F.col("_i") < F.col("_k"))
        & (F.col("_n") >= 3),
    )

    def _sgn(c):
        return (
            F.when(c > 0, 1).when(c < 0, -1).otherwise(0)
        )

    def _orient(px, py, qx, qy, rx, ry):
        return (
            (qx - px) * (ry - py) - (qy - py) * (rx - px)
        )

    d1 = _orient(F.col("cx"), F.col("cy"), F.col("dx"), F.col("dy"),
                 F.col("ax"), F.col("ay"))
    d2 = _orient(F.col("cx"), F.col("cy"), F.col("dx"), F.col("dy"),
                 F.col("bx"), F.col("by"))
    d3 = _orient(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
                 F.col("cx"), F.col("cy"))
    d4 = _orient(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
                 F.col("dx"), F.col("dy"))

    def _onseg(px, py, qx, qy, rx, ry):
        return (
            (rx >= F.least(px, qx)) & (rx <= F.greatest(px, qx))
            & (ry >= F.least(py, qy)) & (ry <= F.greatest(py, qy))
        )

    proper = (
        (_sgn(d1) * _sgn(d2) < 0) & (_sgn(d3) * _sgn(d4) < 0)
    )
    touches = (
        ((d1 == 0) & _onseg(F.col("cx"), F.col("cy"), F.col("dx"),
                            F.col("dy"), F.col("ax"), F.col("ay")))
        | ((d2 == 0) & _onseg(F.col("cx"), F.col("cy"), F.col("dx"),
                              F.col("dy"), F.col("bx"), F.col("by")))
        | ((d3 == 0) & _onseg(F.col("ax"), F.col("ay"), F.col("bx"),
                              F.col("by"), F.col("cx"), F.col("cy")))
        | ((d4 == 0) & _onseg(F.col("ax"), F.col("ay"), F.col("bx"),
                              F.col("by"), F.col("dx"), F.col("dy")))
    )
    adj_next = F.col("_k") == F.col("_i") + 1
    adj_wrap = (F.col("_i") == 0) & (F.col("_k") == F.col("_n") - 1)

    def _spike(sx, sy, ux, uy, vx, vy):
        return (
            (_orient(sx, sy, ux, uy, vx, vy) == 0)
            & (
                (ux - sx) * (vx - sx) + (uy - sy) * (vy - sy) > 0
            )
        )

    bad = F.when(
        adj_next,
        _spike(F.col("bx"), F.col("by"), F.col("ax"), F.col("ay"),
               F.col("dx"), F.col("dy")),
    ).when(
        adj_wrap,
        _spike(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
               F.col("cx"), F.col("cy")),
    ).otherwise(proper | touches)
    crossings = pairs.groupBy("_id").agg(
        F.sum(F.when(bad, 1).otherwise(0)).cast("long")
        .alias("n_cross_pairs")
    )
    return (
        heads.join(crossings, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "n_vertices",
            "area2_q",
            F.when(F.col("area2_q") > 0, F.lit("ccw"))
            .when(F.col("area2_q") < 0, F.lit("cw"))
            .otherwise(F.lit("degenerate")).alias("orientation"),
            "n_zero_edges",
            F.coalesce(F.col("n_cross_pairs"), F.lit(0))
            .cast("long").alias("n_cross_pairs"),
            (
                (F.col("n_vertices") >= 3)
                & (F.col("n_zero_edges") == 0)
                & (F.coalesce(F.col("n_cross_pairs"), F.lit(0)) == 0)
                & (F.col("area2_q") != 0)
            ).alias("is_valid"),
        )
    )


def polygon_validity_sql(
    src: str,
    id_col: str = "polygon_id",
    order_col: str = "seq",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`polygon_validity` (same quantization,
    closing-vertex normalization, exact orientation-sign intersection
    predicate, spike test on adjacent pairs).  The operator's vertex
    cap is the loud one; the twin assumes bounded rings.
    Standalone; pv_*-namespaced CTEs."""
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 cross bound")
    o = ("(({qx}) - ({px})) * (({ry}) - ({py})) "
         "- (({qy}) - ({py})) * (({rx}) - ({px}))")

    def orient(px, py, qx, qy, rx, ry):
        return o.format(px=px, py=py, qx=qx, qy=qy, rx=rx, ry=ry)

    def onseg(px, py, qx, qy, rx, ry):
        return (
            f"({rx} >= LEAST({px}, {qx}) AND {rx} <= "
            f"GREATEST({px}, {qx}) AND {ry} >= LEAST({py}, {qy}) "
            f"AND {ry} <= GREATEST({py}, {qy}))"
        )

    d1 = orient("cx", "cy", "dx", "dy", "ax", "ay")
    d2 = orient("cx", "cy", "dx", "dy", "bx", "by")
    d3 = orient("ax", "ay", "bx", "by", "cx", "cy")
    d4 = orient("ax", "ay", "bx", "by", "dx", "dy")

    def spike(sx, sy, ux, uy, vx, vy):
        return (
            f"({orient(sx, sy, ux, uy, vx, vy)}) = 0 AND "
            f"(({ux}) - ({sx})) * (({vx}) - ({sx})) "
            f"+ (({uy}) - ({sy})) * (({vy}) - ({sy})) > 0"
        )

    return f"""
        WITH pv_raw AS (
            SELECT {id_col} AS id,
                   ROW_NUMBER() OVER (PARTITION BY {id_col}
                       ORDER BY {order_col}) - 1 AS i,
                   COUNT(*) OVER (PARTITION BY {id_col}) AS n0,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT) AS x,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT) AS y,
                   FIRST_VALUE(CAST(ROUND({lon_col} * {scale})
                       AS BIGINT)) OVER (PARTITION BY {id_col}
                       ORDER BY {order_col}) AS x0,
                   FIRST_VALUE(CAST(ROUND({lat_col} * {scale})
                       AS BIGINT)) OVER (PARTITION BY {id_col}
                       ORDER BY {order_col}) AS y0
            FROM {src}
        ),
        pv_open AS (
            SELECT id, i, x, y,
                   COUNT(*) OVER (PARTITION BY id) AS n
            FROM pv_raw
            WHERE NOT (i = n0 - 1 AND x = x0 AND y = y0 AND n0 > 1)
        ),
        pv_edges AS (
            SELECT a.id, a.i, a.n,
                   a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
            FROM pv_open a JOIN pv_open b
              ON b.id = a.id AND b.i = (a.i + 1) % a.n
        ),
        pv_heads AS (
            SELECT id, CAST(MAX(n) AS BIGINT) AS n_vertices,
                   CAST(SUM(ax * by - bx * ay) AS BIGINT) AS area2_q,
                   CAST(SUM(CASE WHEN ax = bx AND ay = by
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_edges
            FROM pv_edges GROUP BY 1
        ),
        pv_pairs AS (
            SELECT e1.id, e1.i, e2.i AS k, e1.n,
                   e1.ax, e1.ay, e1.bx, e1.by,
                   e2.ax AS cx, e2.ay AS cy, e2.bx AS dx, e2.by AS dy
            FROM pv_edges e1 JOIN pv_edges e2
              ON e2.id = e1.id AND e1.i < e2.i AND e1.n >= 3
        ),
        pv_bad AS (
            SELECT id,
                   CASE
                     WHEN k = i + 1 THEN
                       CASE WHEN {spike('bx', 'by', 'ax', 'ay',
                                        'dx', 'dy')}
                            THEN 1 ELSE 0 END
                     WHEN i = 0 AND k = n - 1 THEN
                       CASE WHEN {spike('ax', 'ay', 'bx', 'by',
                                        'cx', 'cy')}
                            THEN 1 ELSE 0 END
                     ELSE CASE WHEN
                       (SIGN({d1}) * SIGN({d2}) < 0
                        AND SIGN({d3}) * SIGN({d4}) < 0)
                       OR (({d1}) = 0 AND {onseg('cx', 'cy', 'dx',
                                                 'dy', 'ax', 'ay')})
                       OR (({d2}) = 0 AND {onseg('cx', 'cy', 'dx',
                                                 'dy', 'bx', 'by')})
                       OR (({d3}) = 0 AND {onseg('ax', 'ay', 'bx',
                                                 'by', 'cx', 'cy')})
                       OR (({d4}) = 0 AND {onseg('ax', 'ay', 'bx',
                                                 'by', 'dx', 'dy')})
                       THEN 1 ELSE 0 END
                   END AS bad
            FROM pv_pairs
        ),
        pv_cross AS (
            SELECT id, CAST(SUM(bad) AS BIGINT) AS n_cross_pairs
            FROM pv_bad GROUP BY 1
        )
        SELECT h.id AS {id_col}, h.n_vertices, h.area2_q,
               CASE WHEN h.area2_q > 0 THEN 'ccw'
                    WHEN h.area2_q < 0 THEN 'cw'
                    ELSE 'degenerate' END AS orientation,
               h.n_zero_edges,
               CAST(COALESCE(c.n_cross_pairs, 0) AS BIGINT)
                   AS n_cross_pairs,
               (h.n_vertices >= 3 AND h.n_zero_edges = 0
                AND COALESCE(c.n_cross_pairs, 0) = 0
                AND h.area2_q <> 0) AS is_valid
        FROM pv_heads h
        LEFT JOIN pv_cross c ON c.id = h.id
    """


def flock_groups(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    window_s: int = 3600,
    min_size: int = 2,
    min_buckets: int = 2,
    max_members: int = 4096,
) -> DataFrame:
    """Flock detection — maximal runs of consecutive time buckets in
    which the SAME grid cell holds the IDENTICAL entity set: the
    group-level sibling of :func:`contact_episodes` (pairs can't see
    a convoy of five; the set-identity run can).  Definition (stated,
    crisper than disc flocks): entity e is present in (bucket, cell)
    iff it has ≥1 event there; a flock is a maximal consecutive-bucket
    run of one cell whose presence SET is identical throughout, with
    ≥ ``min_size`` members and ≥ ``min_buckets`` buckets.  Same cell,
    not 3×3 — flocks are tight by construction; membership change
    (anyone joins or leaves) ENDS the run and may start another.

    Physical plan: distinct (entity, bucket, cell) → one
    (bucket, cell) aggregation building the SORTED member roster
    (numeric sort, then rendered — both engines render BIGINT
    identically) → gaps-and-islands window partitioned by
    (cell, roster) — island key = bucket − row_number — → one run
    aggregation.  Everything after the first aggregation is one row
    per (bucket, cell), never per event.  Hot cells are bounded by a
    LOUD roster cap (``max_members``, assert_true riding the emitted
    member count — Catalyst cannot prune it): a 10⁶-entity stadium
    cell fails with a message, not a 10-MB roster string per bucket.

    Output: (cell, members, n_members, start_bucket, end_bucket,
    n_buckets)."""
    win_us = int(window_s) * 1_000_000
    base = (
        points.select(
            F.col(id_col).alias("_id"),
            grid_cell(F.col(lon), F.col(lat), res_deg).alias("_cell"),
            F.expr(
                f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                f"DIV {win_us}"
            ).alias("_bk"),
        )
        .distinct()
    )
    roster = (
        base.groupBy("_bk", "_cell")
        .agg(F.array_sort(F.collect_set("_id")).alias("_mem"))
        .select(
            "_bk", "_cell",
            F.expr(
                "array_join(transform(_mem, "
                "x -> CAST(x AS STRING)), ',')"
            ).alias("members"),
            F.when(
                F.expr(
                    f"assert_true(size(_mem) <= {int(max_members)}, "
                    f"'flock_groups: cell roster exceeds "
                    f"max_members={int(max_members)} — raise the cap "
                    f"or coarsen res_deg')"
                ).isNull(),
                F.size("_mem"),
            ).cast("bigint").alias("n_members"),
        )
        .where(F.col("n_members") >= int(min_size))
    )
    isl = roster.withColumn(
        "_isl",
        F.col("_bk")
        - F.row_number().over(
            W.partitionBy("_cell", "members").orderBy("_bk")
        ),
    )
    return (
        isl.groupBy("_cell", "members", "n_members", "_isl")
        .agg(
            F.min("_bk").cast("bigint").alias("start_bucket"),
            F.max("_bk").cast("bigint").alias("end_bucket"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        )
        .where(F.col("n_buckets") >= int(min_buckets))
        .select(
            F.col("_cell").cast("bigint").alias("cell"),
            "members", "n_members",
            "start_bucket", "end_bucket", "n_buckets",
        )
    )


def flock_groups_sql(
    src: str,
    id_col: str,
    ts_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res_deg: float = DEFAULT_RES_DEG,
    window_s: int = 3600,
    min_size: int = 2,
    min_buckets: int = 2,
) -> str:
    """DuckDB twin of :func:`flock_groups` (standalone, fl_*
    namespaced; no roster cap — the operator owns the loud
    failure)."""
    win_us = int(window_s) * 1_000_000
    return f"""
        WITH fl_base AS (
            SELECT DISTINCT {id_col} AS id,
                   {grid_cell_sql(lon, lat, res_deg)} AS cell,
                   epoch_us(CAST({ts_col} AS TIMESTAMP)) // {win_us}
                       AS bk
            FROM {src}
        ),
        fl_roster AS (
            SELECT bk, cell,
                   array_to_string(list_transform(
                       list_sort(list(DISTINCT id)),
                       x -> CAST(x AS VARCHAR)), ',') AS members,
                   CAST(COUNT(DISTINCT id) AS BIGINT) AS n_members
            FROM fl_base GROUP BY 1, 2
            HAVING COUNT(DISTINCT id) >= {int(min_size)}
        ),
        fl_isl AS (
            SELECT *, bk - ROW_NUMBER() OVER (
                       PARTITION BY cell, members ORDER BY bk) AS isl
            FROM fl_roster
        )
        SELECT CAST(cell AS BIGINT) AS cell, members, n_members,
               CAST(MIN(bk) AS BIGINT) AS start_bucket,
               CAST(MAX(bk) AS BIGINT) AS end_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM fl_isl
        GROUP BY cell, members, n_members, isl
        HAVING COUNT(*) >= {int(min_buckets)}
    """


def tile_majority(
    cells: DataFrame,
    class_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """3×3 majority (modal) filter over a CLASSIFIED raster — the
    categorical sibling of :func:`tile_focal_stats`: each occupied
    cell is re-labeled with the most common class among its up-to-9
    occupied neighbors (itself included), the standard salt-and-pepper
    cleanup for classification rasters (an isolated 'dense' tile
    inside a 'sparse' field is usually noise, not signal).  Ties
    break to the SMALLEST class value (stated, deterministic).

    Same topology as the focal kit: neighbors from the cell id by
    integer div/mod, lon wrap, lat clamp; same support contract: the
    raster does not dilate (output keys semi-join back to input),
    absent cells cast no vote.

    Plan: ×9 fan of the AGGREGATE raster carrying the class, one
    (cell, class) vote count, the argmax row_number inside the
    cell's own partition, one cell-keyed join back for the old
    class.  Everything is |cells|-bounded.

    Returns (cell, old_class, new_class, n_votes, n_nbrs)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    targets = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            targets.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = cells.select(
        F.col(class_col).alias("_cls"),
        F.explode(
            F.array_distinct(F.array_compact(F.array(*targets)))
        ).alias("t_cell"),
    )
    votes = fan.groupBy("t_cell", "_cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_votes")
    )
    pick = (
        votes.withColumn(
            "n_nbrs",
            F.sum("n_votes").over(W.partitionBy("t_cell")),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("t_cell")
                .orderBy(F.col("n_votes").desc(), F.col("_cls").asc())
            ),
        )
        .where(F.col("_rn") == 1)
    )
    return (
        cells.select("cell", F.col(class_col).alias("old_class"))
        .join(pick, cells.cell == pick.t_cell)
        .select(
            "cell",
            "old_class",
            F.col("_cls").alias("new_class"),
            "n_votes",
            F.col("n_nbrs").cast("bigint").alias("n_nbrs"),
        )
    )


def tile_majority_sql(
    src: str,
    class_col: str,
    res_deg: float = DEFAULT_RES_DEG,
) -> str:
    """DuckDB twin of :func:`tile_majority`; ``src`` exposes
    (cell, {class_col}) one row per occupied cell.  Standalone
    statement (nested subselects, composes after any prelude)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    fan = f"""
        SELECT s.{class_col} AS cls,
               (((s.cell // {cols}) + d.dy) * {cols}
                + ((s.cell % {cols}) + d.dx + {cols}) % {cols})
                   AS t_cell
        FROM {src} s CROSS JOIN (VALUES
             (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
             (1,-1),(1,0),(1,1)) d(dy, dx)
        WHERE (s.cell // {cols}) + d.dy >= 0
          AND (s.cell // {cols}) + d.dy < {rows_n}
    """
    return f"""
        SELECT o.cell, o.{class_col} AS old_class,
               p.cls AS new_class, p.n_votes, p.n_nbrs
        FROM {src} o
        JOIN (
            SELECT t_cell, cls, n_votes,
                   CAST(SUM(n_votes) OVER (PARTITION BY t_cell)
                        AS BIGINT) AS n_nbrs,
                   ROW_NUMBER() OVER (PARTITION BY t_cell
                       ORDER BY n_votes DESC, cls ASC) AS rn
            FROM (
                SELECT t_cell, cls,
                       CAST(COUNT(*) AS BIGINT) AS n_votes
                FROM ({fan}) GROUP BY 1, 2
            )
        ) p ON p.t_cell = o.cell AND p.rn = 1
    """


def drainage_length(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    max_rounds: int = 40,
) -> DataFrame:
    """Longest flow-path length per cell — the MAX-plus member of the
    D8 trio (:func:`flow_accumulation` counts the catchment,
    :func:`basin_label` names it, this measures its longest drainage
    chain in hops): path_len(v) = the most pointer hops any upstream
    ridge takes to reach v; 0 at ridges, the basin's main-stem length
    at its mouth.

    Algorithm — Wyllie doubling with a CONSTANT carry: after round r
    every live pointer spans exactly 2ʳ hops, so the band-delivery
    induction of flow_accumulation holds with max in place of sum and
    2ʳ in place of the weighted count: val_{r+1}(v) =
    max(val_r(v), max over u with s^(2ʳ)(u)=v of val_r(u) + 2ʳ)
    captures precisely the longest upstream path of length ≤ 2ʳ⁺¹−1
    (the d-hop start w routes through the unique u = s^(d−2ʳ)(w)).
    O(log L) rounds on the strict-descent forest; non-convergence
    after ``max_rounds`` raises loudly.

    Plan per round mirrors flow_accumulation: one succ-keyed delivery
    join (max partial agg), one doubling self-join, lineage cut.

    Output: (cell, v, d8_cell, path_len)."""
    d8 = flow_direction(cells, value_col, res_deg).localCheckpoint(
        eager=True
    )
    state = d8.select(
        "cell",
        F.col("d8_cell").alias("_succ"),
        F.lit(0).cast("bigint").alias("_val"),
    ).localCheckpoint(eager=True)
    hop = 1  # pointer span this round = 2^r
    for _ in range(max_rounds):
        live = state.where(F.col("_succ").isNotNull())
        if live.isEmpty():
            break
        recv = live.groupBy(F.col("_succ").alias("cell")).agg(
            F.max(F.col("_val") + F.lit(hop)).alias("_in")
        )
        jump = state.select(
            F.col("cell").alias("_jc"), F.col("_succ").alias("_js")
        )
        state = (
            state.join(recv, "cell", "left")
            .join(jump, F.col("_succ") == F.col("_jc"), "left")
            .select(
                "cell",
                F.col("_js").alias("_succ"),
                F.greatest(
                    F.col("_val"), F.coalesce("_in", F.col("_val"))
                ).alias("_val"),
            )
            .localCheckpoint(eager=True)
        )
        hop *= 2
    else:
        raise RuntimeError(
            f"drainage_length: pointers still live after "
            f"max_rounds={max_rounds} (flow path longer than "
            f"2^{max_rounds} cells, or a cycle — which strict descent "
            "forbids). Raise max_rounds."
        )
    return d8.join(
        state.select("cell", F.col("_val").alias("path_len")), "cell"
    ).select("cell", "v", "d8_cell", "path_len")


def drainage_length_sql(
    src: str, value_col: str, res_deg: float = DEFAULT_RES_DEG
) -> str:
    """DuckDB twin of :func:`drainage_length` — the structurally
    different recursive one-hop walk (every (start, node, hops)
    triple), max hops per node, so the constant-carry doubling
    induction is what gets hash-verified.  Standalone."""
    return f"""
        WITH RECURSIVE {_flow_d8_ctes(src, value_col, res_deg)},
        dl_walk(u, v, d) AS (
            SELECT cell AS u, d8_cell AS v, 1 AS d FROM fd_best
            UNION ALL
            SELECT w.u, p.d8_cell, w.d + 1
            FROM dl_walk w JOIN fd_best p ON p.cell = w.v
        ),
        dl_len AS (
            SELECT v AS cell, CAST(MAX(d) AS BIGINT) AS path_len
            FROM dl_walk GROUP BY 1
        )
        SELECT s.cell, s.v, b.d8_cell,
               COALESCE(l.path_len, 0) AS path_len
        FROM fd_src s
        LEFT JOIN fd_best b USING (cell)
        LEFT JOIN dl_len l USING (cell)
    """


def raster_cost_distance(
    cells: DataFrame,
    seeds: DataFrame,
    rounds: int,
    cost_col: str = "cost",
    res_deg: float = DEFAULT_RES_DEG,
) -> DataFrame:
    """Grid cost-distance over a COST surface — the weighted upgrade
    of :func:`raster_distance` (queen steps all cost 1 there; here
    entering a cell costs that cell's own integer cost — the standard
    cost-surface convention, stated — so corridors route AROUND
    expensive terrain instead of through it).  Same composition-of-
    verified-pieces design: the tile_dilate queen fan builds edges
    (src → dst weighted by dst's cost, restricted to the occupied
    support), :func:`graph.weighted_distance` runs the frontier
    min-plus relaxation — a node re-enters the frontier when a
    longer-but-cheaper detour arrives, which is exactly the
    cost-surface behavior unit BFS can't express.

    Costs must be ≥ 0 (validated loudly — Bellman–Ford's negative
    rejection riding the edge build).  ``rounds`` bounds path EDGES,
    not cost: after R rounds dist is exact over ≤ R-step corridors,
    NULL beyond (the link_distance honesty contract).

    ``cells``: (cell, cost); ``seeds``: rows with ``cell`` (dist
    counts the seed's own cost as 0 — you start there).  Returns
    (cell, dist)."""
    from . import graph

    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    lat_b = F.floor(F.col("cell") / F.lit(cols))
    lon_b = F.col("cell") % F.lit(cols)
    nbrs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            t_lat = lat_b + F.lit(dy)
            t_lon = (lon_b + F.lit(dx) + F.lit(cols)) % F.lit(cols)
            nbrs.append(
                F.when(
                    (t_lat >= 0) & (t_lat < rows_n),
                    (t_lat * F.lit(cols) + t_lon).cast("bigint"),
                )
            )
    fan = cells.select(
        F.col("cell").alias("src"),
        F.explode(F.array_compact(F.array(*nbrs))).alias("dst"),
    )
    costed = cells.select(
        F.col("cell").alias("dst"),
        F.when(
            F.expr(
                f"assert_true({cost_col} >= 0, 'raster_cost_distance:"
                f" negative cell cost — min-plus requires ≥ 0')"
            ).isNull(),
            F.col(cost_col),
        ).cast("bigint").alias("w"),
    )
    edges = fan.join(costed, "dst")
    return graph.weighted_distance(
        cells.select(F.col("cell").alias("node")),
        seeds.select(F.col("cell").alias("node")),
        edges,
        rounds,
    ).select(F.col("node").alias("cell"), "dist")


def raster_cost_distance_sql(
    cells_src: str,
    seeds_src: str,
    rounds: int,
    cost_col: str = "cost",
    res_deg: float = DEFAULT_RES_DEG,
) -> str:
    """DuckDB twin of :func:`raster_cost_distance`: the morphology
    fan weighted by the destination cell's cost feeding
    graph.weighted_distance_sql."""
    from . import graph

    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    edges = f"""(
        SELECT f.src, f.dst, c.{cost_col} AS w FROM (
            SELECT s.cell AS src,
                   (((s.cell // {cols}) + d.dy) * {cols}
                    + ((s.cell % {cols}) + d.dx + {cols}) % {cols})
                       AS dst
            FROM {cells_src} s CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
            WHERE (s.cell // {cols}) + d.dy >= 0
              AND (s.cell // {cols}) + d.dy < {rows_n}
        ) f
        JOIN {cells_src} c ON c.cell = f.dst
    )"""
    inner = graph.weighted_distance_sql(
        f"(SELECT cell AS node FROM {cells_src})",
        f"(SELECT cell AS node FROM {seeds_src})",
        edges,
        rounds,
    )
    return f"SELECT node AS cell, dist FROM ({inner})"


SV_SECTORS = ("D0_45", "D45_90", "D90_135", "D135_180")


def _sv_sector_expr(dlon_s, dlat):
    """Axial 45°-sector classification with EXACT boundaries: only
    |dlat|-vs-dlon comparisons, no tangent constants.  Assumes the
    pair is canonically flipped to dlon ≥ 0; sector semantics are
    documented on :func:`semivariogram_directional`."""
    # after the flip dlon_s ≥ 0; θ ∈ [−90°, 90°] from the east axis
    return (
        F.when((dlat >= 0) & (dlat < dlon_s), F.lit("D0_45"))
        .when((dlat >= 0) & (dlat >= dlon_s), F.lit("D45_90"))
        .when((dlat < 0) & (-dlat >= dlon_s), F.lit("D90_135"))
        .otherwise(F.lit("D135_180"))
    )


def semivariogram_directional(
    points: DataFrame,
    band_edges_udeg: "Sequence[int]",
    value_col: str,
    id_col: str = "url",
    res_deg: float | None = None,
    join_hint: str | None = "auto",
) -> DataFrame:
    """Directional (anisotropic) semivariogram — the
    direction-decomposed upgrade of :func:`semivariogram_counts`:
    geostatistical fields are routinely anisotropic (coastlines,
    valleys, road grids decorrelate faster across than along), and a
    single isotropic γ̂(h) averages that structure away.  Every pair
    lands in one of four AXIAL 45°-wide sectors with EXACT integer-
    free boundaries (no tan 22.5° constant — boundaries sit at 0°/45°
    multiples where the test is |Δlat| vs Δlon):

        canonical flip to Δlon ≥ 0 (axial direction), then
        'D0_45'    = θ ∈ [0°, 45°)    (Δlat ≥ 0, Δlat < Δlon)
        'D45_90'   = θ ∈ [45°, 90°]   (Δlat ≥ 0, Δlat ≥ Δlon)
        'D90_135'  = θ ∈ (90°, 135°]  (Δlat < 0, −Δlat ≥ Δlon)
        'D135_180' = θ ∈ (135°, 180°) (Δlat < 0, −Δlat < Δlon)

    — sectors are NAMED by their exact angular range because exact
    boundaries at 45° multiples put no sector center on a compass
    axis (the classic compass-centered sectors need the irrational
    tan 22.5° tolerance; this engine trades the familiar centers for
    hash-exact boundaries, declared).  A pure-north pair (Δlon = 0)
    lands in 'D45_90' via the inclusive θ = 90° edge (declared;
    (coincident pairs land there too by the ≥ rules; the
    exact-antimeridian pair's sector follows the deterministic
    canonical orientation, declared).  Δlon is the SIGNED shortest
    arc, so the sector is wrap-correct.

    Same single-sweep plan as the isotropic operator: ONE 3×3-probe
    pair stream at the largest edge (res_deg soundness enforced
    there), then a 4-row sector aggregation carrying every band's
    conditional count/Σ(vᵢ−vⱼ)² — never k×4 passes.

    Output: (band_udeg, sector, n_pairs, sum_sq_diff), one row per
    (edge, sector) — zero rows densified so absent structure is a
    visible 0, not a missing row."""
    edges = [int(r) for r in band_edges_udeg]
    if not edges:
        raise ValueError(
            "semivariogram_directional: need at least one edge"
        )
    if any(r <= 0 for r in edges) or sorted(set(edges)) != edges:
        raise ValueError(
            "semivariogram_directional: band edges must be positive, "
            f"strictly ascending, got {edges}"
        )
    max_deg = edges[-1] / 1_000_000.0
    if res_deg is None:
        res_deg = max_deg
    if res_deg < max_deg:
        raise ValueError(
            f"res_deg={res_deg} < max band edge {max_deg}: the 3x3 "
            "probe cannot see all pairs; use res_deg >= the largest "
            "band edge"
        )
    probes = points.select(
        F.col(id_col).alias("id_a"),
        F.col("lon"),
        F.col("lat"),
        F.col(value_col).cast("bigint").alias("v_a"),
        F.explode(
            neighbor_cells(F.col("lon"), F.col("lat"), res_deg)
        ).alias("probe_cell"),
    )
    cand = points.select(
        grid_cell(F.col("lon"), F.col("lat"), res_deg).alias("c_cell"),
        F.col(id_col).alias("id_b"),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
        F.col(value_col).cast("bigint").alias("v_b"),
    )
    join_hint = _auto_join_hint(cand, join_hint)
    if join_hint:
        cand = cand.hint(join_hint)
    raw = F.col("c_lon") - F.col("lon")
    dlon_s = (
        F.when(raw > 180.0, raw - 360.0)
        .when(raw < -180.0, raw + 360.0)
        .otherwise(raw)
    )
    dlat_raw = F.col("c_lat") - F.col("lat")
    # canonical axial flip: dlon ≥ 0
    flip = dlon_s < 0
    dlon_c = F.when(flip, -dlon_s).otherwise(dlon_s)
    dlat_c = F.when(flip, -dlat_raw).otherwise(dlat_raw)
    d2_expr = dlon_c * dlon_c + dlat_c * dlat_c
    dv = F.col("v_a") - F.col("v_b")
    pairs = (
        probes.join(cand, probes.probe_cell == cand.c_cell)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (d2_expr <= F.lit(max_deg * max_deg))
        )
        .select(
            d2_expr.alias("d2"),
            (dv * dv).alias("sq"),
            _sv_sector_expr(dlon_c, dlat_c).alias("sector"),
        )
    )
    lo = [0.0] + [(r / 1_000_000.0) ** 2 for r in edges[:-1]]
    hi = [(r / 1_000_000.0) ** 2 for r in edges]
    aggs = []
    for i, (a, b) in enumerate(zip(lo, hi)):
        in_band = (
            (F.col("d2") <= F.lit(b))
            if i == 0
            else (F.col("d2") > F.lit(a)) & (F.col("d2") <= F.lit(b))
        )
        aggs.append(F.count_if(in_band).alias(f"_n_{i}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(in_band, F.col("sq"))), F.lit(0)
            ).cast("bigint").alias(f"_s_{i}")
        )
    per_sector = pairs.groupBy("sector").agg(*aggs)
    # densify: all 4 sectors × all edges, zeros where absent
    grid = points.sparkSession.createDataFrame(
        [(s,) for s in SV_SECTORS], "sector string"
    )
    per_sector = grid.join(per_sector, "sector", "left")
    stack_args = ", ".join(
        f"CAST({r} AS BIGINT), coalesce(_n_{i}, CAST(0 AS BIGINT)), "
        f"coalesce(_s_{i}, CAST(0 AS BIGINT))"
        for i, r in enumerate(edges)
    )
    return per_sector.select(
        F.expr(
            f"stack({len(edges)}, {stack_args}) AS "
            "(band_udeg, n_pairs, sum_sq_diff)"
        ),
        "sector",
    ).select(
        "band_udeg", "sector",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "sum_sq_diff",
    )


def semivariogram_directional_sql(
    src: str,
    band_edges_udeg: "Sequence[int]",
    value_col: str,
    id_col: str = "url",
) -> str:
    """DuckDB twin of :func:`semivariogram_directional` — the naive
    O(n²) pair join with the identical canonical flip and exact
    sector comparisons, densified over a sector×edge constant grid.
    Standalone."""
    edges = [int(r) for r in band_edges_udeg]
    lo = ["0.0"] + [
        f"({r} / 1000000.0) * ({r} / 1000000.0)" for r in edges[:-1]
    ]
    hi = [f"({r} / 1000000.0) * ({r} / 1000000.0)" for r in edges]
    conds = [f"p.d2 <= {hi[0]}"] + [
        f"p.d2 > {a} AND p.d2 <= {b}"
        for a, b in zip(lo[1:], hi[1:])
    ]
    branches = " UNION ALL ".join(
        f"""
        SELECT CAST({r} AS BIGINT) AS band_udeg, g.sector,
               CAST(COALESCE(SUM(CASE WHEN {cond}
                    AND p.sector = g.sector THEN 1 END), 0)
                    AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(CASE WHEN {cond}
                    AND p.sector = g.sector THEN p.sq END), 0)
                    AS BIGINT) AS sum_sq_diff
        FROM (SELECT UNNEST(['D0_45', 'D45_90', 'D90_135',
                             'D135_180']) AS sector) g
        LEFT JOIN svd_pairs p ON TRUE
        GROUP BY 1, 2
        """
        for r, cond in zip(edges, conds)
    )
    max_deg_sq = hi[-1]
    return f"""
        WITH svd_pts AS (
            SELECT {id_col} AS pid, lon, lat,
                   CAST({value_col} AS BIGINT) AS v
            FROM {src}
        ),
        svd_d AS (
            SELECT CASE WHEN b.lon - a.lon > 180.0
                        THEN b.lon - a.lon - 360.0
                        WHEN b.lon - a.lon < -180.0
                        THEN b.lon - a.lon + 360.0
                        ELSE b.lon - a.lon END AS dlon_s,
                   b.lat - a.lat AS dlat_raw,
                   (a.v - b.v) * (a.v - b.v) AS sq
            FROM svd_pts a JOIN svd_pts b ON a.pid < b.pid
        ),
        svd_pairs AS (
            SELECT dlon_c * dlon_c + dlat_c * dlat_c AS d2, sq,
                   CASE WHEN dlat_c >= 0 AND dlat_c < dlon_c
                        THEN 'D0_45'
                        WHEN dlat_c >= 0 THEN 'D45_90'
                        WHEN -dlat_c >= dlon_c THEN 'D90_135'
                        ELSE 'D135_180' END AS sector
            FROM (
                SELECT CASE WHEN dlon_s < 0 THEN -dlon_s
                       ELSE dlon_s END AS dlon_c,
                       CASE WHEN dlon_s < 0 THEN -dlat_raw
                       ELSE dlat_raw END AS dlat_c,
                       sq
                FROM svd_d
            )
            WHERE dlon_c * dlon_c + dlat_c * dlat_c <= {max_deg_sq}
        )
        SELECT band_udeg, sector, n_pairs, sum_sq_diff
        FROM ({branches})
    """


def line_merge(
    segs: DataFrame,
    scale: int = 10_000,
    max_iters: int = 20,
) -> DataFrame:
    """Stitch segments that share endpoints into maximal connected
    chains — the ST_LineMerge / GIS-dissolve operator (reference
    parity: the reverse of geom.rb's way→segment decomposition; a
    region export wants whole roads back, not the per-edit fragments
    run_candidates.rb processes).

    Endpoints snap to fixed-point ``scale`` (×10⁴ — the pages
    geocode's native precision, the segment_crossing_join convention)
    and pack to one int64 key, so "shares an endpoint" is an EXACT
    integer equality — no float epsilon, no engine divergence.

    Segment adjacency never materializes the C(d,2) pairs of a
    d-way junction: every segment at an endpoint links to the MIN
    segment id there (a star — same components, linear edge count),
    and components resolve by min-label propagation with pointer
    jumping (:func:`~.graph.min_label_components`, O(log diameter)
    rounds — chains are the diameter worst case, exactly why the
    doubling kit exists).  The oracle walks the same star edges with
    a recursive one-hop closure (components_sql — a different
    algorithm family, so the doubling shortcut is what's verified).

    Output (one row per chain): chain_id (min segment id), n_segments,
    n_points (distinct endpoints), n_open_ends (endpoints used by
    exactly one segment-end), is_ring (no open ends — a closed loop;
    a lollipop has 1, a simple path 2, a Y junction 3).  All counts
    exact int64; zero-length segments are legal (both ends one point).
    """
    off_x, off_y = 180 * scale, 90 * scale
    span = 361 * scale

    def ep_key(lon_c: str, lat_c: str):
        px = F.round(F.col(lon_c) * scale).cast("bigint") + off_x
        py = F.round(F.col(lat_c) * scale).cast("bigint") + off_y
        return px * span + py

    pts = segs.select(
        F.col("seg_id"), ep_key("lon1", "lat1").alias("ep")
    ).unionByName(
        segs.select(
            F.col("seg_id"), ep_key("lon2", "lat2").alias("ep")
        )
    ).localCheckpoint(eager=True)
    star = pts.groupBy("ep").agg(F.min("seg_id").alias("_m"))
    edges = (
        pts.join(star, "ep")
        .where(F.col("seg_id") != F.col("_m"))
        .select(F.col("seg_id").alias("id_a"), F.col("_m").alias("id_b"))
    )
    ids = segs.select(F.col("seg_id").alias("id")).distinct()
    labels = _min_label_components(ids, edges, max_iters, "line_merge")
    deg = pts.groupBy("ep").agg(F.count(F.lit(1)).alias("_deg"))
    return (
        pts.join(labels, pts.seg_id == labels.id)
        .join(deg, "ep")
        .groupBy(F.col("label").alias("chain_id"))
        .agg(
            F.countDistinct("seg_id").cast("bigint").alias("n_segments"),
            F.countDistinct("ep").cast("bigint").alias("n_points"),
            F.sum(F.when(F.col("_deg") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_open_ends"),
        )
        .withColumn("is_ring", F.col("n_open_ends") == 0)
    )


def line_merge_sql(segs_src: str, scale: int = 10_000) -> str:
    """DuckDB twin of :func:`line_merge` — identical endpoint
    packing and star edges; components come from the RECURSIVE
    one-hop closure (:func:`~.graph.components_sql`), a different
    algorithm family than the operator's pointer doubling.
    Standalone statement."""
    from .graph import components_sql

    off_x, off_y = 180 * scale, 90 * scale
    span = 361 * scale
    pts = f"""(
        SELECT seg_id,
               (CAST(ROUND(lon1 * {scale}) AS BIGINT) + {off_x})
                   * {span}
               + (CAST(ROUND(lat1 * {scale}) AS BIGINT) + {off_y})
                   AS ep
        FROM {segs_src}
        UNION ALL
        SELECT seg_id,
               (CAST(ROUND(lon2 * {scale}) AS BIGINT) + {off_x})
                   * {span}
               + (CAST(ROUND(lat2 * {scale}) AS BIGINT) + {off_y})
                   AS ep
        FROM {segs_src}
    )"""
    edges = f"""(
        SELECT p.seg_id AS src, s._m AS dst
        FROM {pts} p
        JOIN (SELECT ep, MIN(seg_id) AS _m FROM {pts} GROUP BY ep) s
            USING (ep)
        WHERE p.seg_id <> s._m
    )"""
    nodes = f"(SELECT DISTINCT seg_id AS node FROM {segs_src})"
    return f"""
        SELECT lab.label AS chain_id,
               CAST(COUNT(DISTINCT p.seg_id) AS BIGINT) AS n_segments,
               CAST(COUNT(DISTINCT p.ep) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN d.deg = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_open_ends,
               SUM(CASE WHEN d.deg = 1 THEN 1 ELSE 0 END) = 0
                   AS is_ring
        FROM {pts} p
        JOIN ({components_sql(nodes, edges)}) lab
            ON lab.node = p.seg_id
        JOIN (SELECT ep, COUNT(*) AS deg FROM {pts} GROUP BY ep) d
            USING (ep)
        GROUP BY 1
    """


def route_corridor(
    points: DataFrame,
    segs: DataFrame,
    res_deg: float,
    radius_deg: float,
    scale: int = 10_000,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    d2_scale: int = 1000,
    max_span_cells: int = 4_096,
) -> DataFrame:
    """Corridor query: every point within ``radius_deg`` of a route's
    segments — "which documents geotag within 500 m of this pipeline
    / transit line / border" is the buffered-line filter every
    geospatial review runs, here WITHOUT materializing a buffer
    polygon: a point is in the corridor iff its distance to the
    NEAREST segment is ≤ r, so the operator is a verified composition
    of :func:`snap_to_segments` (exact rational point-segment d²,
    bbox-fan × 3×3-probe candidates) and one integer threshold —
    the raster_distance precedent: compose verified kit, compose the
    twins identically.

    The snap kit's nearest-match guarantee is one cell, so
    ``radius_deg ≤ res_deg`` is REQUIRED (enforced loudly): within
    that bound every corridor member is provably found and every
    non-member provably excluded — the threshold is exact because
    d2_q quantizes once via (num·d2_scale) DIV den ≤ true·d2_scale,
    compared against r²·d2_scale in the same units... strictly: both
    engines quantize IDENTICALLY, so the comparison is
    engine-identical even at the quantization boundary.

    Returns (point_id, seg_id, d2_q): corridor members with their
    nearest segment and its quantized d² — points outside the
    corridor are absent."""
    if radius_deg > res_deg:
        raise ValueError(
            f"route_corridor: radius_deg={radius_deg} exceeds the "
            f"snap kit's one-cell nearest guarantee (res_deg="
            f"{res_deg}); raise res_deg"
        )
    r_units = radius_deg * scale
    if r_units != int(r_units):
        raise ValueError("radius_deg * scale must be integral")
    thr = int(r_units) * int(r_units) * int(d2_scale)
    snapped = snap_to_segments(
        points, segs, res_deg, scale=scale, point_id=point_id,
        seg_id=seg_id, d2_scale=d2_scale,
        max_span_cells=max_span_cells,
    )
    return snapped.where(F.col("d2_q") <= thr)


def route_corridor_sql(
    points_src: str,
    segs_src: str,
    res_deg: float,
    radius_deg: float,
    scale: int = 10_000,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    d2_scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`route_corridor` — the snap twin with the
    identical integer threshold (twins composed identically, the
    raster_distance rule).  Standalone statement."""
    r_units = int(radius_deg * scale)
    thr = r_units * r_units * int(d2_scale)
    return f"""
        SELECT * FROM ({snap_to_segments_sql(
            points_src, segs_src, res_deg, scale=scale,
            point_id=point_id, seg_id=seg_id, d2_scale=d2_scale,
        )}) WHERE d2_q <= {thr}
    """


def cell_polyfill(
    spark,
    polygons: "Sequence[tuple[int, Sequence[tuple[float, float]]]]",
    res_deg: float = DEFAULT_RES_DEG,
    max_cells_per_poly: int = 200_000,
) -> DataFrame:
    """Polyfill — the complete cell cover of each polygon (H3
    `polyfill` / S2 `RegionCoverer` interior analogue on the
    row-major grid): every cell whose CENTER lies inside the polygon,
    by the same center-containment convention as :func:`zonal_stats`.
    This is the geometry→index materialization step: a polygon layer
    polyfilled ONCE turns every later point-in-region query into a
    plain cell equi-join (the pip_rect_prefiltered strategy, with an
    exact cover instead of a bbox overestimate).

    Unlike the pip assignment operators (first polygon wins),
    polyfill emits EVERY (polygon, cell) membership — overlapping
    polygons each get their full cover, which is what an index wants.

    Execution is fully native — no Python ray cast: candidate cells
    enumerate from each polygon's bbox (driver arithmetic on the
    broadcast layer constants; fan guarded LOUDLY by
    ``max_cells_per_poly``), centers are the exact dyadic
    :func:`grid_cell_center` arithmetic, and the even-odd parity is
    the SAME crossing predicate as the pip twins, evaluated as one
    broadcast edge join + one (pid, cell) aggregation — so the whole
    operator is whole-stage codegen and the DuckDB twin is
    character-identical arithmetic.

    Layer contract (the pip family's): closed rings, no exactly-
    horizontal edges (keeps the crossing division safe), small enough
    to broadcast.  Returns (polygon_id, cell)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    cand_rows = []
    edge_rows = []
    for pid, ring in polygons:
        xs = [float(p[0]) for p in ring]
        ys = [float(p[1]) for p in ring]
        x0 = max(0, int(math.floor((min(xs) + 180.0) / res_deg)))
        x1 = min(cols - 1, int(math.floor((max(xs) + 180.0) / res_deg)))
        y0 = max(0, int(math.floor((min(ys) + 90.0) / res_deg)))
        y1 = min(rows_n - 1, int(math.floor((max(ys) + 90.0) / res_deg)))
        n = (x1 - x0 + 1) * (y1 - y0 + 1)
        if n > int(max_cells_per_poly):
            raise ValueError(
                f"cell_polyfill: polygon {pid} bbox covers {n} cells "
                f"at res_deg={res_deg} > max_cells_per_poly="
                f"{max_cells_per_poly}; coarsen the grid or raise "
                "the guard"
            )
        cand_rows.append((int(pid), x0, x1, y0, y1))
        j = len(ring) - 1
        for i in range(len(ring)):
            edge_rows.append(
                (int(pid), xs[j], ys[j], xs[i], ys[i])
            )
            j = i
    cand = (
        spark.createDataFrame(
            cand_rows, "pid long, x0 long, x1 long, y0 long, y1 long"
        )
        .select(
            "pid", "x0", "x1",
            F.explode(F.expr("sequence(y0, y1)")).alias("yb"),
        )
        .select(
            "pid", "yb",
            F.explode(F.expr("sequence(x0, x1)")).alias("xb"),
        )
        .select(
            "pid",
            (F.col("yb") * F.lit(cols) + F.col("xb"))
            .cast("bigint").alias("cell"),
        )
    )
    lon_c, lat_c = grid_cell_center("cell", res_deg)
    cand = cand.withColumn("_clon", lon_c).withColumn("_clat", lat_c)
    edges = spark.createDataFrame(
        edge_rows, "pid long, xi double, yi double, xj double, yj double"
    )
    crossing = F.when(
        ((F.col("yi") > F.col("_clat")) != (F.col("yj") > F.col("_clat")))
        & (
            F.col("_clon")
            < (F.col("xj") - F.col("xi"))
            * (F.col("_clat") - F.col("yi"))
            / (F.col("yj") - F.col("yi"))
            + F.col("xi")
        ),
        1,
    ).otherwise(0)
    return (
        cand.join(F.broadcast(edges), "pid")
        .groupBy(F.col("pid").alias("polygon_id"), "cell")
        .agg(F.sum(crossing).alias("_x"))
        .where(F.col("_x") % 2 == 1)
        .select("polygon_id", "cell")
    )


def cell_polyfill_sql(
    polygons: "Sequence[tuple[int, Sequence[tuple[float, float]]]]",
    res_deg: float = DEFAULT_RES_DEG,
) -> str:
    """DuckDB twin of :func:`cell_polyfill` — identical bbox cell
    enumeration (generate_series), identical dyadic centers and
    crossing predicate over VALUES edge lists.  Standalone."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    bbox_vals = []
    edge_vals = []
    for pid, ring in polygons:
        xs = [float(p[0]) for p in ring]
        ys = [float(p[1]) for p in ring]
        x0 = max(0, int(math.floor((min(xs) + 180.0) / res_deg)))
        x1 = min(cols - 1, int(math.floor((max(xs) + 180.0) / res_deg)))
        y0 = max(0, int(math.floor((min(ys) + 90.0) / res_deg)))
        y1 = min(rows_n - 1, int(math.floor((max(ys) + 90.0) / res_deg)))
        bbox_vals.append(f"({int(pid)}, {x0}, {x1}, {y0}, {y1})")
        j = len(ring) - 1
        for i in range(len(ring)):
            edge_vals.append(
                f"({int(pid)}, {xs[j]!r}::DOUBLE, {ys[j]!r}::DOUBLE, "
                f"{xs[i]!r}::DOUBLE, {ys[i]!r}::DOUBLE)"
            )
            j = i
    return f"""
        WITH pf_bbox(pid, x0, x1, y0, y1) AS (
            VALUES {", ".join(bbox_vals)}
        ),
        pf_edges(pid, xi, yi, xj, yj) AS (
            VALUES {", ".join(edge_vals)}
        ),
        pf_cand AS (
            SELECT b.pid,
                   CAST(yy.yb * {cols} + xx.xb AS BIGINT) AS cell,
                   (CAST(xx.xb AS DOUBLE) + 0.5) * {res_deg!r}
                       - 180.0 AS clon,
                   (CAST(yy.yb AS DOUBLE) + 0.5) * {res_deg!r}
                       - 90.0 AS clat
            FROM pf_bbox b,
                 LATERAL (SELECT UNNEST(generate_series(b.y0, b.y1))
                          AS yb) yy,
                 LATERAL (SELECT UNNEST(generate_series(b.x0, b.x1))
                          AS xb) xx
        )
        SELECT c.pid AS polygon_id, c.cell
        FROM pf_cand c JOIN pf_edges e USING (pid)
        GROUP BY 1, 2
        HAVING SUM(CASE WHEN (e.yi > c.clat) <> (e.yj > c.clat)
                         AND c.clon < (e.xj - e.xi) * (c.clat - e.yi)
                                      / (e.yj - e.yi) + e.xi
                        THEN 1 ELSE 0 END) % 2 = 1
    """


def point_dispersion(
    points: DataFrame,
    group_col: str,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> DataFrame:
    """Mean center + squared standard distance per group — the
    centrographic pair (the crime-mapping / market-area classic):
    WHERE is a group's activity centered and HOW spread is it, the
    two numbers a per-entity spatial profile leads with (compact
    cluster vs continent-wide scatter separates a local business from
    a CDN in the crawl corpus).

    Exact-integer form via the N-scaling identity: with coordinates
    quantized to ``scale`` units (the house ×10⁴ fixed point),

        Σᵢ (xᵢ − x̄)² = (n·Σx² − (Σx)²) / n

    so  disp2_q = ((n·Σx² − Sx²) + (n·Σy² − Sy²)) DIV n²  — the mean
    squared distance from the centroid (the squared standard
    distance) with ONE non-negative truncating division; the mean
    center itself is Sx DIV n / Sy DIV n (integer DIV truncates
    toward zero identically in both engines — verified for DuckDB's
    integer ``//``).  Bounds: n·Σx² ≤ n²·(3.6·10⁶)² rides
    decimal(38,0) to n ~ 10¹² points per group.

    Planar in quantized degree units (the kNN family's convention;
    no lon wrap — groups spanning the antimeridian read wide,
    stated).  One map-side-combining aggregation; output one row per
    group: (group, n, cx_q, cy_q, disp2_q)."""
    dec = "decimal(38,0)"
    sc = F.lit(float(scale))
    q = points.select(
        F.col(group_col).alias("_g"),
        F.round(F.col(lon) * sc).cast("bigint").alias("_x"),
        F.round(F.col(lat) * sc).cast("bigint").alias("_y"),
    )
    agg = q.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(f"CAST(_x AS {dec})")).alias("_sx"),
        F.sum(F.expr(f"CAST(_y AS {dec})")).alias("_sy"),
        F.sum(F.expr(f"CAST(_x AS {dec}) * _x")).alias("_qx"),
        F.sum(F.expr(f"CAST(_y AS {dec}) * _y")).alias("_qy"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        F.expr("CAST(_sx DIV n AS BIGINT)").alias("cx_q"),
        F.expr("CAST(_sy DIV n AS BIGINT)").alias("cy_q"),
        F.expr(
            "CAST(((n * _qx - _sx * _sx) + (n * _qy - _sy * _sy))"
            " DIV (CAST(n AS decimal(38,0)) * n) AS BIGINT)"
        ).alias("disp2_q"),
    )


def point_dispersion_sql(
    src: str,
    group_col: str,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`point_dispersion` (HUGEINT, identical
    N-scaling identity and truncating divisions).  Deliberately
    CTE-free (nested subqueries only) so it composes inside callers'
    own WITH chains — e.g. after the pages CTE prefix."""
    return f"""
        SELECT _g AS {group_col}, n,
               CAST(sx // n AS BIGINT) AS cx_q,
               CAST(sy // n AS BIGINT) AS cy_q,
               CAST(((n * qx - sx * sx) + (n * qy - sy * sy))
                    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS disp2_q
        FROM (
            SELECT _g, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(_x AS HUGEINT)) AS sx,
                   SUM(CAST(_y AS HUGEINT)) AS sy,
                   SUM(CAST(_x AS HUGEINT) * _x) AS qx,
                   SUM(CAST(_y AS HUGEINT) * _y) AS qy
            FROM (
                SELECT {group_col} AS _g,
                       CAST(ROUND({lon} * {scale}) AS BIGINT) AS _x,
                       CAST(ROUND({lat} * {scale}) AS BIGINT) AS _y
                FROM {src}
            ) GROUP BY _g
        )
    """


VIEWSHED_DIRS = (
    (1, 0), (1, 1), (0, 1), (-1, 1),
    (-1, 0), (-1, -1), (0, -1), (1, -1),
)


def raster_viewshed(
    raster: DataFrame,
    observers: DataFrame,
    height_col: str = "n_pages",
    radius: int = 10,
    res_deg: float = DEFAULT_RES_DEG,
    slope_scale: int = 1 << 20,
) -> DataFrame:
    """Eight-ray line-of-sight viewshed over a cell raster — the
    classic DEM visibility sweep (which cells can a tower/observer
    see?), run on the AGGREGATE raster with any integral column as
    the height field (on the taint raster it reads as "which hotspots
    does this hotspot dominate" — the same max-slope-along-ray
    algebra as terrain).

    Semantics (D8 viewshed-lite, declared): along each of the 8
    cardinal/diagonal rays out to ``radius`` steps, a target cell is
    visible iff its elevation angle strictly exceeds every PRIOR
    angle on the ray.  Within a ray the distance is proportional to
    the step count (the diagonal √2 cancels), so the angle ordinal is
    slope_q = ((h_t − h_obs)·slope_scale) DIV step — quantized ONCE
    (truncation toward zero, identical in both engines; ties at the
    quantization boundary are therefore deterministic and DECLARED),
    then visibility is a plain running-max window comparison.  Cells
    absent from the raster have height 0 (a sparse web raster is
    mostly empty — stated).  Rays clamp at the poles and wrap in
    longitude (the focal-stats topology).

    Plan: |observers|·8·radius probe rows (observers are a small
    broadcast set by construction — this is a per-site analysis, not
    an all-cells pass), one broadcast height join, one
    (observer, dir)-keyed window.  Returns (observer_cell, dir, step,
    target_cell, height, slope_q, visible)."""
    if radius < 1:
        raise ValueError(f"radius must be ≥ 1: {radius}")
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    offs = [
        (d, s, dx * s, dy * s)
        for d, (dx, dy) in enumerate(VIEWSHED_DIRS)
        for s in range(1, int(radius) + 1)
    ]
    spark = raster.sparkSession
    off_df = spark.createDataFrame(
        offs, "dir int, step int, dx long, dy long"
    )
    hs = raster.select(
        F.col("cell").alias("_hc"),
        F.col(height_col).cast("bigint").alias("_h"),
    )
    obs = observers.select(
        F.col("cell").alias("observer_cell")
    ).join(
        hs, F.col("observer_cell") == F.col("_hc"), "left"
    ).select(
        "observer_cell",
        F.coalesce("_h", F.lit(0)).alias("_ho"),
        (F.col("observer_cell") % cols).alias("_xb"),
        F.floor(F.col("observer_cell") / cols).alias("_yb"),
    )
    probes = (
        obs.crossJoin(F.broadcast(off_df))
        .withColumn("_ty", F.col("_yb") + F.col("dy"))
        .where((F.col("_ty") >= 0) & (F.col("_ty") < rows_n))
        .withColumn(
            "_tx", F.pmod(F.col("_xb") + F.col("dx"), F.lit(cols))
        )
        .withColumn(
            "target_cell",
            (F.col("_ty") * cols + F.col("_tx")).cast("bigint"),
        )
        .join(hs, F.col("target_cell") == F.col("_hc"), "left")
        .withColumn("height", F.coalesce("_h", F.lit(0)))
        .withColumn(
            "slope_q",
            F.expr(
                f"((height - _ho) * {int(slope_scale)}) DIV step"
            ),
        )
    )
    w = (
        W.partitionBy("observer_cell", "dir")
        .orderBy("step")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return probes.select(
        "observer_cell", "dir", "step", "target_cell", "height",
        "slope_q",
        (
            F.max("slope_q").over(w).isNull()
            | (F.col("slope_q") > F.max("slope_q").over(w))
        ).alias("visible"),
    )


def raster_viewshed_ctes(
    raster_src: str,
    observers_src: str,
    height_col: str = "n_pages",
    radius: int = 10,
    res_deg: float = DEFAULT_RES_DEG,
    slope_scale: int = 1 << 20,
) -> str:
    """Twin CTE chain + final select WITHOUT the leading WITH (the
    local_morans_ctes pattern), so callers can append it to their own
    CTE lists — e.g. after the pages prefix.  ``raster_src`` exposes
    (cell, height_col); ``observers_src`` (cell)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    offs = ", ".join(
        f"({d}, {s}, {dx * s}, {dy * s})"
        for d, (dx, dy) in enumerate(VIEWSHED_DIRS)
        for s in range(1, int(radius) + 1)
    )
    return f"""
        vw_h AS (
            SELECT cell AS hc, CAST({height_col} AS BIGINT) AS h
            FROM {raster_src}
        ),
        vw_obs AS (
            SELECT o.cell AS observer_cell,
                   COALESCE(h.h, 0) AS ho,
                   o.cell % {cols} AS xb,
                   o.cell // {cols} AS yb
            FROM {observers_src} o
            LEFT JOIN vw_h h ON h.hc = o.cell
        ),
        vw_off(dir, step, dx, dy) AS (VALUES {offs}),
        vw_probe AS (
            SELECT ob.observer_cell, f.dir, f.step,
                   CAST((ob.yb + f.dy) * {cols}
                        + ((ob.xb + f.dx) % {cols} + {cols}) % {cols}
                        AS BIGINT) AS target_cell,
                   ob.ho
            FROM vw_obs ob CROSS JOIN vw_off f
            WHERE ob.yb + f.dy >= 0 AND ob.yb + f.dy < {rows_n}
        ),
        vw_sc AS (
            SELECT p.observer_cell,
                   CAST(p.dir AS INTEGER) AS dir,
                   CAST(p.step AS INTEGER) AS step,
                   p.target_cell,
                   COALESCE(h.h, 0) AS height,
                   CAST(((COALESCE(h.h, 0) - p.ho)
                         * {int(slope_scale)}) // p.step AS BIGINT)
                       AS slope_q
            FROM vw_probe p LEFT JOIN vw_h h ON h.hc = p.target_cell
        )
        SELECT observer_cell, dir, step, target_cell, height, slope_q,
               (MAX(slope_q) OVER w IS NULL OR slope_q > MAX(slope_q)
                   OVER w) AS visible
        FROM vw_sc
        WINDOW w AS (PARTITION BY observer_cell, dir ORDER BY step
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """


def raster_viewshed_sql(
    raster_src: str,
    observers_src: str,
    height_col: str = "n_pages",
    radius: int = 10,
    res_deg: float = DEFAULT_RES_DEG,
    slope_scale: int = 1 << 20,
) -> str:
    """DuckDB twin of :func:`raster_viewshed` — identical offset
    table (VALUES), wrap/clamp, once-quantized slope and running-max
    window.  Standalone statement."""
    return "WITH " + raster_viewshed_ctes(
        raster_src, observers_src, height_col=height_col,
        radius=radius, res_deg=res_deg, slope_scale=slope_scale,
    )


def viterbi_match(
    points: DataFrame,
    segs: DataFrame,
    res_deg: float,
    pen_adj: int,
    pen_far: int,
    scale: int = 10_000,
    d2_scale: int = 1000,
    entity_col: str = "entity",
    order_col: str = "seq",
    seg_id: str = "seg_id",
    k_candidates: int = 4,
    max_points: int = 64,
) -> DataFrame:
    """HMM map-matching (the Newson–Krumm shape, exact-integer cost
    model): each track's points match to road segments JOINTLY via
    Viterbi, instead of :func:`snap_to_segments`' independent
    per-point argmin — the upgrade that stops a noisy trace from
    flip-flopping between parallel roads, because switching segments
    costs something:

        path cost = Σᵢ d²_q(pᵢ, sᵢ)  +  Σᵢ trans(sᵢ₋₁, sᵢ)
        trans(a, b) = 0        if a = b
                      pen_adj  if a, b share a quantized endpoint
                      pen_far  otherwise

    (the two-tier switch penalty is the road-topology prior: staying
    on the same polyline is free, crossing a junction is cheap,
    teleporting across the network is expensive; penalties are in
    the same (1/scale°)²·d2_scale units as the emission distances).

    Emission d²_q and the candidate rule are EXACTLY
    snap_to_segments' (bbox-fan × 3×3-probe, exact rational
    point-to-segment distance quantized once — see
    spatial.py:4012); each point keeps its ``k_candidates`` best by
    (d2_q, seg_id).  Points with no candidate within the cell
    radius are DROPPED and the chain continues across the gap
    (stated — the bounded-radius non-match).  Tie rules, declared:
    the best predecessor per state minimizes (cost + trans,
    predecessor seg_id); the final state minimizes (cost, seg_id) —
    a total order, so the matched path is unique.

    Cost bound: ≤ max_points·(max d2_q + pen_far) ≈ 10¹²·max_points
    at the defaults — int64 with room; penalties validated
    non-negative with pen_far ≥ pen_adj.

    Scale: candidate generation is the snap kit's cell equi-join;
    the DP is Arrow-batched per track (the track-DP family pattern)
    over a LOUD ``max_points`` guard, O(len·K²) per track.  The
    DuckDB twin unrolls the DP per step with min(STRUCT) argmins and
    a carried path string, so every match is hash-verified.

    Returns (entity, seq, seg_id, d2_q) — one row per MATCHED
    point."""
    import pandas as _pd

    if res_deg * scale != int(res_deg * scale):
        raise ValueError("res_deg * scale must be integral")
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 cross bound")
    if not (0 <= int(pen_adj) <= int(pen_far)):
        raise ValueError(
            f"penalties must satisfy 0 <= pen_adj <= pen_far: "
            f"{pen_adj}, {pen_far}"
        )
    if not 1 <= int(k_candidates) <= 8:
        raise ValueError(f"k_candidates in [1, 8]: {k_candidates}")
    if not 2 <= int(max_points) <= 4_096:
        raise ValueError(f"max_points out of range: {max_points}")
    g = int(res_deg * scale)
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))
    kc = int(k_candidates)
    p_adj, p_far = int(pen_adj), int(pen_far)

    sq = segs.select(
        F.col(seg_id).alias("_sid"),
        (F.round(F.col("lon1") * sc).cast("bigint") + offx).alias("sx1"),
        (F.round(F.col("lat1") * sc).cast("bigint") + offy).alias("sy1"),
        (F.round(F.col("lon2") * sc).cast("bigint") + offx).alias("sx2"),
        (F.round(F.col("lat2") * sc).cast("bigint") + offy).alias("sy2"),
    )
    x0 = _idiv(F.least("sx1", "sx2"), g)
    x1 = _idiv(F.greatest("sx1", "sx2"), g)
    y0 = _idiv(F.least("sy1", "sy2"), g)
    y1 = _idiv(F.greatest("sy1", "sy2"), g)
    cells = F.flatten(
        F.transform(
            F.sequence(y0, y1),
            lambda yy: F.transform(
                F.sequence(x0, x1),
                lambda xx: yy * F.lit(1_000_000) + xx,
            ),
        )
    )
    seg_fan = sq.withColumn("_cell", F.explode(cells))

    pq = points.select(
        F.col(entity_col).alias("_e"),
        F.col(order_col).alias("_o"),
        (F.round(F.col("lon") * sc).cast("bigint") + offx).alias("px"),
        (F.round(F.col("lat") * sc).cast("bigint") + offy).alias("py"),
    )
    probes = F.array(
        *[
            (_idiv(F.col("py"), g) + F.lit(dy)) * F.lit(1_000_000)
            + (_idiv(F.col("px"), g) + F.lit(dx))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    pt_fan = pq.withColumn("_cell", F.explode(probes))
    cand = (
        pt_fan.join(seg_fan, "_cell")
        .select(
            "_e", "_o", "px", "py", "_sid",
            "sx1", "sy1", "sx2", "sy2",
        )
        .distinct()
    )
    apx = F.col("px") - F.col("sx1")
    apy = F.col("py") - F.col("sy1")
    abx = F.col("sx2") - F.col("sx1")
    aby = F.col("sy2") - F.col("sy1")
    bpx = F.col("px") - F.col("sx2")
    bpy = F.col("py") - F.col("sy2")
    dot = apx * abx + apy * aby
    ab2 = abx * abx + aby * aby
    ap2 = apx * apx + apy * apy
    bp2 = bpx * bpx + bpy * bpy
    d = F.lit(int(d2_scale))
    dec = "decimal(38,0)"
    interior = (
        (ap2.cast(dec) * ab2.cast(dec) - dot.cast(dec) * dot.cast(dec))
        * d
    )
    d2_q = (
        F.when(ab2 == 0, ap2 * d)
        .when(dot <= 0, ap2 * d)
        .when(dot >= ab2, bp2 * d)
        .otherwise(F.expr("CAST(_num DIV _den AS BIGINT)"))
    )
    scored = (
        cand.withColumn("_num", interior)
        .withColumn("_den", ab2.cast(dec))
        .withColumn("d2_q", d2_q)
        .select("_e", "_o", "_sid", "d2_q", "sx1", "sy1", "sx2", "sy2")
    )
    pw = W.partitionBy("_e", "_o").orderBy("d2_q", "_sid")
    topk = scored.withColumn("_rk", F.row_number().over(pw)).where(
        F.col("_rk") <= kc
    )
    per_pt = topk.groupBy("_e", "_o").agg(
        F.sort_array(
            F.collect_list(
                F.struct("d2_q", "_sid", "sx1", "sy1", "sx2", "sy2")
            )
        ).alias("_cands")
    )
    ok = F.assert_true(
        F.size("_steps") <= F.lit(int(max_points)),
        F.lit(
            f"viterbi_match: a track exceeds max_points={max_points} "
            "matched points; segment tracks first"
        ),
    )
    tracks = (
        per_pt.groupBy("_e")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_o", "_cands"))
            ).alias("_steps")
        )
        .select("_e", F.when(ok.isNull(), F.col("_steps")).alias("_steps"))
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for ent, steps in zip(pdf["_e"], pdf["_steps"]):
                seqs = [s["_o"] for s in steps]
                cands = [
                    [
                        (
                            int(c["d2_q"]), c["_sid"],
                            (int(c["sx1"]), int(c["sy1"])),
                            (int(c["sx2"]), int(c["sy2"])),
                        )
                        for c in s["_cands"]
                    ]
                    for s in steps
                ]

                def trans(a, b):
                    if a[1] == b[1]:
                        return 0
                    if a[2] in (b[2], b[3]) or a[3] in (b[2], b[3]):
                        return p_adj
                    return p_far

                n = len(cands)
                dp = [[c[0] for c in cands[0]]]
                back = [[None] * len(cands[0])]
                for t in range(1, n):
                    row, brow = [], []
                    for c in cands[t]:
                        best = None
                        for j, cp in enumerate(cands[t - 1]):
                            key = (dp[t - 1][j] + trans(cp, c), cp[1])
                            if best is None or key < best[0]:
                                best = (key, j)
                        row.append(c[0] + best[0][0])
                        brow.append(best[1])
                    dp.append(row)
                    back.append(brow)
                bi, bkey = None, None
                for i, c in enumerate(cands[n - 1]):
                    key = (dp[n - 1][i], c[1])
                    if bkey is None or key < bkey:
                        bkey, bi = key, i
                path = [None] * n
                i = bi
                for t in range(n - 1, -1, -1):
                    path[t] = i
                    i = back[t][i] if t > 0 else None
                for t in range(n):
                    c = cands[t][path[t]]
                    recs.append((ent, seqs[t], c[1], c[0]))
            yield _pd.DataFrame(
                recs, columns=["_e", "_o", "_sid", "d2_q"]
            )

    schema = (
        f"_e {dict(tracks.dtypes)['_e']}, _o bigint, "
        f"_sid bigint, d2_q bigint"
    )
    out = tracks.mapInPandas(run, schema=schema)
    return out.select(
        F.col("_e").alias(entity_col),
        F.col("_o").alias(order_col),
        F.col("_sid").alias(seg_id),
        "d2_q",
    )


def viterbi_match_sql(
    points_src: str,
    segs_src: str,
    res_deg: float,
    pen_adj: int,
    pen_far: int,
    scale: int = 10_000,
    d2_scale: int = 1000,
    entity_col: str = "entity",
    order_col: str = "seq",
    seg_id: str = "seg_id",
    k_candidates: int = 4,
    max_points: int = 16,
) -> str:
    """DuckDB twin of :func:`viterbi_match` — identical candidate
    arithmetic (the snap twin's cell fans and rational d²), then the
    DP unrolled per step: min(STRUCT_PACK(cost, prev_sid, path))
    argmins reproduce the operator's declared tie rules exactly, and
    the winning path rides along as a '>'-joined string that the
    final select re-explodes.  ``seg_id`` values must be integers
    (the path string round-trips through CAST).  Tracks longer than
    ``max_points`` matched points would silently truncate — the
    operator's guard is the loud one (the frechet-twin convention).
    Standalone statement."""
    g = int(res_deg * scale)
    offx, offy = 180 * scale, 90 * scale
    kc = int(k_candidates)
    p_adj, p_far = int(pen_adj), int(pen_far)
    trans = f"""CASE
        WHEN p._sid = c2._sid THEN 0
        WHEN (p.sx1 = c2.sx1 AND p.sy1 = c2.sy1)
          OR (p.sx1 = c2.sx2 AND p.sy1 = c2.sy2)
          OR (p.sx2 = c2.sx1 AND p.sy2 = c2.sy1)
          OR (p.sx2 = c2.sx2 AND p.sy2 = c2.sy2) THEN {p_adj}
        ELSE {p_far} END"""
    ctes = [
        f"""vm_sq AS (
            SELECT {seg_id} AS _sid,
                   CAST(ROUND(lon1 * {scale}) AS BIGINT) + {offx} AS sx1,
                   CAST(ROUND(lat1 * {scale}) AS BIGINT) + {offy} AS sy1,
                   CAST(ROUND(lon2 * {scale}) AS BIGINT) + {offx} AS sx2,
                   CAST(ROUND(lat2 * {scale}) AS BIGINT) + {offy} AS sy2
            FROM {segs_src}
        )""",
        f"""vm_segfan AS MATERIALIZED (
            SELECT *,
                   UNNEST(flatten(list_transform(
                       generate_series(
                           (LEAST(sy1, sy2) - LEAST(sy1, sy2) % {g}) // {g},
                           (GREATEST(sy1, sy2)
                            - GREATEST(sy1, sy2) % {g}) // {g}),
                       yy -> list_transform(
                           generate_series(
                               (LEAST(sx1, sx2)
                                - LEAST(sx1, sx2) % {g}) // {g},
                               (GREATEST(sx1, sx2)
                                - GREATEST(sx1, sx2) % {g}) // {g}),
                           xx -> yy * 1000000 + xx)))) AS _cell
            FROM vm_sq
        )""",
        f"""vm_pq AS (
            SELECT {entity_col} AS _e, {order_col} AS _o,
                   CAST(ROUND(lon * {scale}) AS BIGINT) + {offx} AS px,
                   CAST(ROUND(lat * {scale}) AS BIGINT) + {offy} AS py
            FROM {points_src}
        )""",
        f"""vm_ptfan AS MATERIALIZED (
            SELECT *,
                   ((py - py % {g}) // {g} + d.dy) * 1000000
                   + ((px - px % {g}) // {g} + d.dx) AS _cell
            FROM vm_pq CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
        )""",
        """vm_cand AS MATERIALIZED (
            SELECT DISTINCT p._e, p._o, p.px, p.py,
                   s._sid, s.sx1, s.sy1, s.sx2, s.sy2
            FROM vm_ptfan p JOIN vm_segfan s USING (_cell)
        )""",
        f"""vm_scored AS MATERIALIZED (
            SELECT _e, _o, _sid, sx1, sy1, sx2, sy2,
                   CASE
                     WHEN (sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1) = 0
                       THEN ((px-sx1)*(px-sx1) + (py-sy1)*(py-sy1))
                            * {d2_scale}
                     WHEN (px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1) <= 0
                       THEN ((px-sx1)*(px-sx1) + (py-sy1)*(py-sy1))
                            * {d2_scale}
                     WHEN (px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1)
                          >= (sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1)
                       THEN ((px-sx2)*(px-sx2) + (py-sy2)*(py-sy2))
                            * {d2_scale}
                     ELSE CAST(
                       ((CAST((px-sx1)*(px-sx1) + (py-sy1)*(py-sy1)
                              AS HUGEINT)
                         * ((sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1))
                         - CAST((px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1)
                                AS HUGEINT)
                           * ((px-sx1)*(sx2-sx1) + (py-sy1)*(sy2-sy1)))
                        * {d2_scale})
                       // ((sx2-sx1)*(sx2-sx1) + (sy2-sy1)*(sy2-sy1))
                       AS BIGINT)
                   END AS d2_q
            FROM vm_cand
        )""",
        f"""vm_topk AS MATERIALIZED (
            SELECT * FROM (
                SELECT _e, _o, _sid, d2_q, sx1, sy1, sx2, sy2,
                       ROW_NUMBER() OVER (PARTITION BY _e, _o
                           ORDER BY d2_q, _sid) AS _rk
                FROM vm_scored
            ) WHERE _rk <= {kc}
        )""",
        """vm_seqs AS MATERIALIZED (
            SELECT _e, _o,
                   ROW_NUMBER() OVER (PARTITION BY _e ORDER BY _o)
                       AS t
            FROM (SELECT DISTINCT _e, _o FROM vm_topk)
        )""",
        """vm_c AS MATERIALIZED (
            SELECT k.*, s.t
            FROM vm_topk k JOIN vm_seqs s USING (_e, _o)
        )""",
        """vm_s1 AS MATERIALIZED (
            SELECT _e, _sid, sx1, sy1, sx2, sy2,
                   d2_q AS cost, CAST(_sid AS VARCHAR) AS path
            FROM vm_c WHERE t = 1
        )""",
    ]
    for t in range(2, int(max_points) + 1):
        ctes.append(f"""vm_s{t} AS MATERIALIZED (
            SELECT c._e, c._sid, c.sx1, c.sy1, c.sx2, c.sy2,
                   c.d2_q + b._b.ct AS cost,
                   b._b.pth || '>' || CAST(c._sid AS VARCHAR) AS path
            FROM vm_c c
            JOIN (
                SELECT c2._e, c2._sid AS sid,
                       MIN(STRUCT_PACK(
                           ct := p.cost + {trans},
                           ps := p._sid,
                           pth := p.path)) AS _b
                FROM vm_c c2
                JOIN vm_s{t - 1} p ON p._e = c2._e
                WHERE c2.t = {t}
                GROUP BY 1, 2
            ) b ON b._e = c._e AND b.sid = c._sid
            WHERE c.t = {t}
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT _e, {t} AS t, _sid, cost, path FROM vm_s{t}"
        for t in range(1, int(max_points) + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f""",
        vm_all AS ({union}),
        vm_len AS (SELECT _e, MAX(t) AS tmax FROM vm_c GROUP BY 1),
        vm_best AS (
            SELECT a._e,
                   MIN(STRUCT_PACK(cost := a.cost, sid := a._sid,
                                   pth := a.path)) AS _b
            FROM vm_all a JOIN vm_len l ON l._e = a._e
                                       AND a.t = l.tmax
            GROUP BY 1
        )
        SELECT b._e AS {entity_col},
               CAST(s._o AS BIGINT) AS {order_col},
               CAST(b.els[u.i] AS BIGINT) AS {seg_id},
               k.d2_q
        FROM (SELECT _e, string_split(_b.pth, '>') AS els
              FROM vm_best) b,
             LATERAL (SELECT UNNEST(range(1, len(b.els) + 1)) AS i) u
        JOIN vm_seqs s ON s._e = b._e AND s.t = u.i
        JOIN vm_topk k ON k._e = b._e AND k._o = s._o
                      AND k._sid = CAST(b.els[u.i] AS BIGINT)
    """
    )


def knox_test(
    points: DataFrame,
    delta_deg: float,
    tau: int,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    t_col: str = "t",
    scale: int = 10_000,
    max_bucket: int = 65_536,
) -> DataFrame:
    """Knox space–time interaction test (Knox 1964) — ARE events
    that happen close together in space also close together in
    time?  The question behind outbreak detection, coordinated-edit
    forensics, and burst-locality audits, answered with pure pair
    counts (no distribution assumptions):

        ns = #{pairs with d² ≤ δ²},  nt = #{pairs with |Δt| ≤ τ},
        x  = #{pairs close in BOTH},  P = n(n−1)/2
        E[x | independence] = ns·nt / P
        ratio_ppm = x·P·10⁶ DIV (ns·nt)   (10⁶ ⇒ no interaction)

    All exact integers: coordinates quantize to ×``scale``
    fixed-point, the space test compares int64 d² against
    round(δ·scale)², the time test |Δt| ≤ τ on integer timestamps;
    the expectation clears in decimal(38)/HUGEINT (bound:
    ns·nt·10⁶ < 10³⁸ — fine to ~10⁹ points, stated).

    Pair counting NEVER goes quadratic in n: space pairs come from
    the house cell equi-join (grid at δ, 3×3 probe on one side, home
    cell on the other, id< order — each unordered pair meets exactly
    once), time pairs from the 1-D analogue (τ-buckets, ±1 probe).
    The fan is bounded by the densest cell/bucket — guarded LOUDLY
    by ``max_bucket`` (a denser instance needs a smaller δ/τ or a
    pre-aggregation, not silence).

    Returns ONE row: (n, n_pairs, ns, nt, x_obs, exp_x_ppm,
    ratio_ppm) — exp_x_ppm is E[x]·10⁶; ratio NULL when ns·nt = 0."""
    if delta_deg * scale != int(delta_deg * scale):
        raise ValueError("delta_deg * scale must be integral")
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 d2 bound")
    if tau < 1:
        raise ValueError(f"tau must be >= 1: {tau}")
    g = int(delta_deg * scale)
    d2max = g * g
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))
    pq = points.select(
        F.col(id_col).alias("_i"),
        (F.round(F.col(lon_col) * sc).cast("bigint") + offx)
        .alias("_x"),
        (F.round(F.col(lat_col) * sc).cast("bigint") + offy)
        .alias("_y"),
        F.col(t_col).cast("bigint").alias("_t"),
    ).localCheckpoint(eager=True)

    cell = (_idiv(F.col("_y"), g) * F.lit(1_000_000)
            + _idiv(F.col("_x"), g))
    home = pq.select("_i", "_x", "_y", "_t", cell.alias("_cell"))
    probes = F.array(
        *[
            (_idiv(F.col("_y"), g) + F.lit(dy)) * F.lit(1_000_000)
            + (_idiv(F.col("_x"), g) + F.lit(dx))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    fan = pq.select(
        F.col("_i").alias("_ia"), F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"), F.col("_t").alias("_ta"),
        F.explode(probes).alias("_cell"),
    )
    dd = (
        (F.col("_xa") - F.col("_x")) * (F.col("_xa") - F.col("_x"))
        + (F.col("_ya") - F.col("_y")) * (F.col("_ya") - F.col("_y"))
    )
    close_s = (
        fan.join(home, "_cell")
        .where(F.col("_ia") < F.col("_i"))
        .where(dd <= F.lit(d2max))
    )
    s_counts = close_s.agg(
        F.count(F.lit(1)).cast("bigint").alias("ns"),
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("_ta") - F.col("_t")) <= F.lit(int(tau)),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("bigint").alias("x_obs"),
    )

    tb = _idiv(F.col("_t"), int(tau))
    t_home = pq.select("_i", "_t", tb.alias("_tb"))
    t_fan = pq.select(
        F.col("_i").alias("_ia"), F.col("_t").alias("_ta"),
        F.explode(
            F.array(*[tb + F.lit(d) for d in (-1, 0, 1)])
        ).alias("_tb"),
    )
    close_t = (
        t_fan.join(t_home, "_tb")
        .where(F.col("_ia") < F.col("_i"))
        .where(F.abs(F.col("_ta") - F.col("_t")) <= F.lit(int(tau)))
    )
    t_count = close_t.agg(
        F.count(F.lit(1)).cast("bigint").alias("nt")
    )

    guard = (
        home.groupBy("_cell").agg(F.count(F.lit(1)).alias("_nc"))
        .agg(F.coalesce(F.max("_nc"), F.lit(0)).alias("_mc"))
        .crossJoin(
            t_home.groupBy("_tb").agg(F.count(F.lit(1)).alias("_nb"))
            .agg(F.coalesce(F.max("_nb"), F.lit(0)).alias("_mb"))
        )
        .select(
            F.when(
                F.expr(
                    f"assert_true(_mc <= {int(max_bucket)} AND "
                    f"_mb <= {int(max_bucket)}, 'knox_test: a "
                    f"cell/bucket exceeds max_bucket={max_bucket} "
                    "points — shrink delta/tau or pre-aggregate')"
                ).isNull(),
                F.lit(1),
            ).alias("_g")
        )
    )
    n_row = pq.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dec = "decimal(38,0)"
    return (
        n_row.crossJoin(s_counts)
        .crossJoin(t_count)
        .crossJoin(guard)
        .select(
            # n rides the guard product (×1 when the assert passes),
            # so column pruning can never drop the loud bucket check
            F.expr("CAST(n * _g AS BIGINT)").alias("n"),
            F.expr("CAST(n * (n - 1) DIV 2 AS BIGINT)")
            .alias("n_pairs"),
            "ns", "nt", "x_obs",
            F.expr(
                f"CAST(CASE WHEN n < 2 THEN NULL ELSE "
                f"(CAST(ns AS {dec}) * nt * 1000000) "
                f"DIV (n * (n - 1) DIV 2) END AS BIGINT)"
            ).alias("exp_x_ppm"),
            F.expr(
                f"CAST(CASE WHEN ns = 0 OR nt = 0 THEN NULL ELSE "
                f"(CAST(x_obs AS {dec}) * (n * (n - 1) DIV 2) "
                f"* 1000000) DIV (CAST(ns AS {dec}) * nt) "
                f"END AS BIGINT)"
            ).alias("ratio_ppm"),
        )
    )


def knox_test_sql(
    src: str,
    delta_deg: float,
    tau: int,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    t_col: str = "t",
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`knox_test` — identical quantization,
    cell/bucket pair joins, id< order, and cleared HUGEINT
    expectation arithmetic.  Standalone."""
    g = int(delta_deg * scale)
    d2max = g * g
    offx, offy = 180 * scale, 90 * scale
    return f"""
        WITH kx_p AS MATERIALIZED (
            SELECT {id_col} AS _i,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT)
                       + {offx} AS _x,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT)
                       + {offy} AS _y,
                   CAST({t_col} AS BIGINT) AS _t
            FROM {src}
        ),
        kx_s AS MATERIALIZED (
            SELECT a._i AS ia, b._i AS ib,
                   ABS(a._t - b._t) <= {int(tau)} AS tclose
            FROM (SELECT *,
                         ((_y - _y % {g}) // {g} + d.dy) * 1000000
                         + ((_x - _x % {g}) // {g} + d.dx) AS _cell
                  FROM kx_p CROSS JOIN (VALUES
                       (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                       (1,-1),(1,0),(1,1)) d(dy, dx)) a
            JOIN (SELECT *,
                         ((_y - _y % {g}) // {g}) * 1000000
                         + ((_x - _x % {g}) // {g}) AS _cell
                  FROM kx_p) b USING (_cell)
            WHERE a._i < b._i
              AND (a._x - b._x) * (a._x - b._x)
                  + (a._y - b._y) * (a._y - b._y) <= {d2max}
        ),
        kx_t AS MATERIALIZED (
            SELECT COUNT(*) AS nt
            FROM (SELECT *,
                         (_t - _t % {int(tau)}) // {int(tau)} + d.o
                             AS _tb
                  FROM kx_p CROSS JOIN (VALUES (-1),(0),(1)) d(o)) a
            JOIN (SELECT _i, _t,
                         (_t - _t % {int(tau)}) // {int(tau)} AS _tb
                  FROM kx_p) b USING (_tb)
            WHERE a._i < b._i AND ABS(a._t - b._t) <= {int(tau)}
        ),
        kx_agg AS (
            SELECT (SELECT COUNT(*) FROM kx_p) AS n,
                   (SELECT COUNT(*) FROM kx_s) AS ns,
                   (SELECT COALESCE(SUM(CASE WHEN tclose THEN 1
                                        ELSE 0 END), 0)
                    FROM kx_s) AS x_obs,
                   (SELECT nt FROM kx_t) AS nt
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs,
               CAST(ns AS BIGINT) AS ns,
               CAST(nt AS BIGINT) AS nt,
               CAST(x_obs AS BIGINT) AS x_obs,
               CAST(CASE WHEN n < 2 THEN NULL ELSE
                    (CAST(ns AS HUGEINT) * nt * 1000000)
                    // (n * (n - 1) // 2) END AS BIGINT)
                   AS exp_x_ppm,
               CAST(CASE WHEN ns = 0 OR nt = 0 THEN NULL ELSE
                    (CAST(x_obs AS HUGEINT) * (n * (n - 1) // 2)
                     * 1000000) // (CAST(ns AS HUGEINT) * nt)
                    END AS BIGINT) AS ratio_ppm
        FROM kx_agg
    """


def dispersion_ellipse(
    points: DataFrame,
    group_col: str,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> DataFrame:
    """Standard deviational ellipse per group — the DIRECTIONAL
    upgrade of :func:`point_dispersion`'s scalar spread (the ArcGIS
    centrographic trio's third member): not just HOW spread a
    group's activity is but ALONG WHICH AXIS (a coastline crawl, a
    highway corridor, and a city blob all share a disp2 but not an
    orientation).

    The ellipse is the eigendecomposition of the 2×2 centered
    moment matrix, reported in EXACT cleared integers (σ and θ
    themselves need √/atan, so the operator reports the equivalent
    exact quantities, the tile_hotspots discipline):

        vxx = (n·Σx² − Sx²) DIV n,  vyy analogous,
        vxy = (n·Σxy − Sx·Sy) tdiv n       (per-point central
              moments — ONE stated truncating division each, so the
              squared terms below shrink by n² and stay in range)
        tan2t_ppm = 2·vxy·10⁶ DIV (vxx − vyy)    (trunc toward 0;
              NULL when vxx = vyy — θ is ±45° by sign(vxy), or the
              distribution is circular when vxy = 0 too, stated)
        elong_ppm = ((vxx−vyy)² + 4·vxy²)·10⁶ DIV (vxx+vyy)²

    elong_ppm is (λmax−λmin)²/(λmax+λmin)² — 0 for a perfect
    circle, 10⁶ for a degenerate line — the scale-free anisotropy
    score; tan(2θ) pins the major-axis bearing.  Bounds: vxx ≤
    n·spread²·scale², so the squared-times-10⁶ terms need
    n·spread²·scale² < 10¹⁶ — ~10³ points per group at worst-case
    GLOBAL spread, ~10⁹ at city spread (re-check per corpus,
    stated); groups with n < 3 or zero spread return NULL
    analytics.

    One map-side-combining aggregation, planar quantized degrees
    (the kNN convention, no lon wrap).  Returns (group, n, cx_q,
    cy_q, vxx, vyy, vxy, tan2t_ppm, elong_ppm)."""
    dec = "decimal(38,0)"
    sc = F.lit(float(scale))
    q = points.select(
        F.col(group_col).alias("_g"),
        F.round(F.col(lon) * sc).cast("bigint").alias("_x"),
        F.round(F.col(lat) * sc).cast("bigint").alias("_y"),
    )
    agg = q.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(f"CAST(_x AS {dec})")).alias("_sx"),
        F.sum(F.expr(f"CAST(_y AS {dec})")).alias("_sy"),
        F.sum(F.expr(f"CAST(_x AS {dec}) * _x")).alias("_qx"),
        F.sum(F.expr(f"CAST(_y AS {dec}) * _y")).alias("_qy"),
        F.sum(F.expr(f"CAST(_x AS {dec}) * _y")).alias("_qxy"),
    )
    c = agg.select(
        F.col("_g"),
        "n",
        F.expr("CAST(_sx DIV n AS BIGINT)").alias("cx_q"),
        F.expr("CAST(_sy DIV n AS BIGINT)").alias("cy_q"),
        F.expr("(n * _qx - _sx * _sx) DIV n").alias("_cxx"),
        F.expr("(n * _qy - _sy * _sy) DIV n").alias("_cyy"),
        F.expr("(n * _qxy - _sx * _sy) DIV n").alias("_cxy"),
    )
    # DIV yields BIGINT, so re-lift to decimal(38) before squaring
    dx = "CAST(_cxx AS DECIMAL(38,0))"
    dy_ = "CAST(_cyy AS DECIMAL(38,0))"
    dxy = "CAST(_cxy AS DECIMAL(38,0))"
    tan2t = (
        f"CASE WHEN _cxx = _cyy THEN NULL "
        f"WHEN 2 * {dxy} * 1000000 >= 0 AND _cxx - _cyy > 0 "
        f"  THEN (2 * {dxy} * 1000000) DIV ({dx} - _cyy) "
        f"WHEN 2 * {dxy} * 1000000 < 0 AND _cxx - _cyy > 0 "
        f"  THEN -((-(2 * {dxy} * 1000000)) DIV ({dx} - _cyy)) "
        f"WHEN 2 * {dxy} * 1000000 >= 0 "
        f"  THEN -((2 * {dxy} * 1000000) DIV ({dy_} - _cxx)) "
        f"ELSE ((-(2 * {dxy} * 1000000)) DIV ({dy_} - _cxx)) END"
    )
    elong = (
        f"CASE WHEN _cxx + _cyy = 0 THEN NULL ELSE "
        f"((({dx} - _cyy) * ({dx} - _cyy) + 4 * {dxy} * _cxy) "
        f"* 1000000) DIV (({dx} + _cyy) * ({dx} + _cyy)) END"
    )
    return c.select(
        F.col("_g").alias(group_col),
        "n", "cx_q", "cy_q",
        F.expr("CAST(_cxx AS BIGINT)").alias("vxx"),
        F.expr("CAST(_cyy AS BIGINT)").alias("vyy"),
        F.expr("CAST(_cxy AS BIGINT)").alias("vxy"),
        F.expr(
            f"CAST(CASE WHEN n < 3 THEN NULL ELSE {tan2t} END "
            "AS BIGINT)"
        ).alias("tan2t_ppm"),
        F.expr(
            f"CAST(CASE WHEN n < 3 THEN NULL ELSE {elong} END "
            "AS BIGINT)"
        ).alias("elong_ppm"),
    )


def dispersion_ellipse_sql(
    src: str,
    group_col: str,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`dispersion_ellipse` (HUGEINT, identical
    cleared moments, sign-decomposed truncation).  Standalone."""
    tan2t = (
        "CASE WHEN _cxx = _cyy THEN NULL "
        "WHEN 2 * _cxy * 1000000 >= 0 AND _cxx - _cyy > 0 "
        "  THEN (2 * _cxy * 1000000) // (_cxx - _cyy) "
        "WHEN 2 * _cxy * 1000000 < 0 AND _cxx - _cyy > 0 "
        "  THEN -((-(2 * _cxy * 1000000)) // (_cxx - _cyy)) "
        "WHEN 2 * _cxy * 1000000 >= 0 "
        "  THEN -((2 * _cxy * 1000000) // (_cyy - _cxx)) "
        "ELSE ((-(2 * _cxy * 1000000)) // (_cyy - _cxx)) END"
    )
    elong = (
        "CASE WHEN _cxx + _cyy = 0 THEN NULL ELSE "
        "(((_cxx - _cyy) * (_cxx - _cyy) + 4 * _cxy * _cxy) "
        "* 1000000) // ((_cxx + _cyy) * (_cxx + _cyy)) END"
    )
    return f"""
        WITH de_q AS (
            SELECT {group_col} AS _g,
                   CAST(ROUND({lon} * {scale}) AS BIGINT) AS _x,
                   CAST(ROUND({lat} * {scale}) AS BIGINT) AS _y
            FROM {src}
        ),
        de_agg AS (
            SELECT _g, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(_x AS HUGEINT)) AS _sx,
                   SUM(CAST(_y AS HUGEINT)) AS _sy,
                   SUM(CAST(_x AS HUGEINT) * _x) AS _qx,
                   SUM(CAST(_y AS HUGEINT) * _y) AS _qy,
                   SUM(CAST(_x AS HUGEINT) * _y) AS _qxy
            FROM de_q GROUP BY 1
        ),
        de_c AS (
            SELECT _g, n,
                   CAST(CASE WHEN _sx >= 0 THEN _sx // n
                        ELSE -((-_sx) // n) END AS BIGINT) AS cx_q,
                   CAST(CASE WHEN _sy >= 0 THEN _sy // n
                        ELSE -((-_sy) // n) END AS BIGINT) AS cy_q,
                   (n * _qx - _sx * _sx) // n AS _cxx,
                   (n * _qy - _sy * _sy) // n AS _cyy,
                   CASE WHEN n * _qxy - _sx * _sy >= 0
                        THEN (n * _qxy - _sx * _sy) // n
                        ELSE -((-(n * _qxy - _sx * _sy)) // n)
                   END AS _cxy
            FROM de_agg
        )
        SELECT _g AS {group_col}, n, cx_q, cy_q,
               CAST(_cxx AS BIGINT) AS vxx,
               CAST(_cyy AS BIGINT) AS vyy,
               CAST(_cxy AS BIGINT) AS vxy,
               CAST(CASE WHEN n < 3 THEN NULL ELSE {tan2t} END
                    AS BIGINT) AS tan2t_ppm,
               CAST(CASE WHEN n < 3 THEN NULL ELSE {elong} END
                    AS BIGINT) AS elong_ppm
        FROM de_c
    """


def quadrat_test(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    res_deg: float,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> DataFrame:
    """Quadrat test of complete spatial randomness — the FIRST
    question of point-pattern analysis (clustered, random, or
    uniform?), answered by cell counts over a declared grid with the
    classic χ² identity so EMPTY cells count without ever being
    materialized:

        χ² = Σ_c (n_c − N/C)² / (N/C) = (C·Σn_c² − N²) / N
        VMR = χ² / (C − 1)        (the index of dispersion)

    VMR ≈ 1 under CSR, > 1 clustered (σ² > μ: hot quadrats), < 1
    more-uniform-than-random (a low-discrepancy layout — exactly
    what a sharded crawl's round-robin geocode looks like).  Exact
    ppm integers: counts are integers, the single division clears
    through decimal(38)/HUGEINT (bound: C·N²·10⁶ < 10³⁸ — fine to
    N ~ 10¹² at C ~ 10⁶ cells, stated).

    Grid, declared: ``bbox`` = (lon0, lat0, lon1, lat1) with spans
    integral multiples of ``res_deg``; cells are half-open
    [edge, edge+res) so boundary points land in exactly one cell;
    points outside the bbox are EXCLUDED and reported (n_out) — an
    unnoticed out-of-frame mass would silently deflate χ².

    One filter + one cell groupBy + one global aggregate — all
    map-side combinable; C comes from arithmetic, not a scan.
    Returns ONE row: (n_in, n_out, n_cells, occupied, chi2_ppm,
    vmr_ppm) — NULLs when N = 0 or C < 2."""
    lon0, lat0, lon1, lat1 = bbox
    for v in (lon0, lat0, lon1, lat1):
        if v * scale != int(v * scale):
            raise ValueError("bbox * scale must be integral")
    if res_deg * scale != int(res_deg * scale):
        raise ValueError("res_deg * scale must be integral")
    g = int(res_deg * scale)
    qx0, qy0 = int(lon0 * scale), int(lat0 * scale)
    qx1, qy1 = int(lon1 * scale), int(lat1 * scale)
    if qx1 <= qx0 or qy1 <= qy0:
        raise ValueError("bbox must have positive spans")
    if (qx1 - qx0) % g or (qy1 - qy0) % g:
        raise ValueError("bbox spans must be multiples of res_deg")
    cols = (qx1 - qx0) // g
    rows_n = (qy1 - qy0) // g
    n_cells = cols * rows_n
    sc = F.lit(float(scale))
    q = points.select(
        (F.round(F.col(lon) * sc).cast("bigint")).alias("_x"),
        (F.round(F.col(lat) * sc).cast("bigint")).alias("_y"),
    )
    inside = (
        (F.col("_x") >= qx0) & (F.col("_x") < qx1)
        & (F.col("_y") >= qy0) & (F.col("_y") < qy1)
    )
    tagged = q.select(inside.cast("int").alias("_in"), "_x", "_y")
    outs = tagged.agg(
        F.coalesce(
            F.sum(F.lit(1) - F.col("_in")), F.lit(0)
        ).cast("bigint").alias("n_out")
    )
    cells = (
        tagged.where(F.col("_in") == 1)
        .select(
            (
                _idiv(F.col("_y") - qy0, g) * F.lit(cols)
                + _idiv(F.col("_x") - qx0, g)
            ).alias("_cell")
        )
        .groupBy("_cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nc"))
    )
    dec = "decimal(38,0)"
    agg = cells.agg(
        F.coalesce(F.sum("_nc"), F.lit(0)).cast("bigint").alias("n_in"),
        F.count(F.lit(1)).cast("bigint").alias("occupied"),
        F.coalesce(
            F.sum(F.expr(f"CAST(_nc AS {dec}) * _nc")),
            F.expr(f"CAST(0 AS {dec})"),
        ).alias("_sq"),
    )
    return (
        agg.crossJoin(F.broadcast(outs))
        .select(
            "n_in", "n_out",
            F.lit(int(n_cells)).cast("bigint").alias("n_cells"),
            "occupied",
            F.expr(
                f"CAST(CASE WHEN n_in = 0 THEN NULL ELSE "
                f"(({n_cells} * _sq - CAST(n_in AS {dec}) * n_in) "
                f"* 1000000) DIV n_in END AS BIGINT)"
            ).alias("chi2_ppm"),
            F.expr(
                f"CAST(CASE WHEN n_in = 0 OR {n_cells} < 2 THEN NULL "
                f"ELSE (({n_cells} * _sq - CAST(n_in AS {dec}) * n_in)"
                f" * 1000000) DIV (CAST(n_in AS {dec}) "
                f"* {n_cells - 1}) END AS BIGINT)"
            ).alias("vmr_ppm"),
        )
    )


def quadrat_test_sql(
    src: str,
    bbox: tuple[float, float, float, float],
    res_deg: float,
    lon: str = "lon",
    lat: str = "lat",
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`quadrat_test` (HUGEINT clearing,
    identical half-open grid).  Standalone."""
    lon0, lat0, lon1, lat1 = bbox
    g = int(res_deg * scale)
    qx0, qy0 = int(lon0 * scale), int(lat0 * scale)
    qx1, qy1 = int(lon1 * scale), int(lat1 * scale)
    cols = (qx1 - qx0) // g
    rows_n = (qy1 - qy0) // g
    n_cells = cols * rows_n
    return f"""
        WITH qt_q AS (
            SELECT CAST(ROUND({lon} * {scale}) AS BIGINT) AS _x,
                   CAST(ROUND({lat} * {scale}) AS BIGINT) AS _y
            FROM {src}
        ),
        qt_out AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_out FROM qt_q
            WHERE NOT (_x >= {qx0} AND _x < {qx1}
                       AND _y >= {qy0} AND _y < {qy1})
        ),
        qt_cells AS (
            SELECT ((_y - {qy0}) - (_y - {qy0}) % {g}) // {g}
                       * {cols}
                   + ((_x - {qx0}) - (_x - {qx0}) % {g}) // {g}
                       AS _cell,
                   CAST(COUNT(*) AS BIGINT) AS _nc
            FROM qt_q
            WHERE _x >= {qx0} AND _x < {qx1}
              AND _y >= {qy0} AND _y < {qy1}
            GROUP BY 1
        ),
        qt_agg AS (
            SELECT CAST(COALESCE(SUM(_nc), 0) AS BIGINT) AS n_in,
                   CAST(COUNT(*) AS BIGINT) AS occupied,
                   COALESCE(SUM(CAST(_nc AS HUGEINT) * _nc),
                            CAST(0 AS HUGEINT)) AS _sq
            FROM qt_cells
        )
        SELECT n_in, (SELECT n_out FROM qt_out) AS n_out,
               CAST({n_cells} AS BIGINT) AS n_cells, occupied,
               CAST(CASE WHEN n_in = 0 THEN NULL ELSE
                    (({n_cells} * _sq - CAST(n_in AS HUGEINT) * n_in)
                     * 1000000) // n_in END AS BIGINT) AS chi2_ppm,
               CAST(CASE WHEN n_in = 0 OR {n_cells} < 2 THEN NULL
                    ELSE (({n_cells} * _sq
                           - CAST(n_in AS HUGEINT) * n_in)
                          * 1000000) // (CAST(n_in AS HUGEINT)
                                         * {n_cells - 1})
                    END AS BIGINT) AS vmr_ppm
        FROM qt_agg
    """


CE_PI_PPM = 3_141_593  # round(π·10⁶), frozen at import


def clark_evans2(
    points: DataFrame,
    delta_deg: float,
    bbox: tuple[float, float, float, float],
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 10_000,
) -> DataFrame:
    """Squared Clark–Evans nearest-neighbour index — the
    DISTANCE-based CSR companion of :func:`quadrat_test`'s counts
    (quadrats see density variation at the grid scale; CE sees
    repulsion/attraction at the point scale — a lattice passes
    quadrats yet screams "uniform" here).  Classic R uses mean NN
    distance (a √ per point); this engine reports the SQUARED
    variant, whose CSR expectation is exactly rational — for a 2-D
    Poisson process the NN² is exponential with rate πλ, so

        E[d²_NN] = 1/(πλ),   λ = n / A   (A = declared bbox area)
        ce2_ppm  = Σd²_NN · π_ppm · n  DIV  (n_matched · A)

    with π frozen at round(π·10⁶) (the DCT/SAX constant
    discipline).  ce2 ≈ 10⁶ under CSR, < 10⁶ clustered, > 10⁶
    regular/repulsed.

    NN search is the house cell equi-join (grid at ``delta_deg``,
    3×3 probe), so a point's nearest neighbour is EXACT whenever it
    lies within one cell; points with nothing inside the radius are
    EXCLUDED from Σd² and REPORTED (n_far) — the bounded-radius
    bias is visible, never silent (their true NN² > δ², so dropping
    them biases ce2 DOWN; a large n_far means δ is too small for
    the density).  Edge effects are the classic CE caveat, stated.
    Bound: Σd²·π_ppm·n ≤ n²·(2δ·scale)²·10⁷ — decimal(38) to
    n ~ 10¹⁰ at δ = 10°, stated.

    Returns ONE row: (n, n_matched, n_far, sum_d2, ce2_ppm) —
    NULL ce2 when n < 2 or nothing matched."""
    if delta_deg * scale != int(delta_deg * scale):
        raise ValueError("delta_deg * scale must be integral")
    lon0, lat0, lon1, lat1 = bbox
    ax = int(round((lon1 - lon0) * scale))
    ay = int(round((lat1 - lat0) * scale))
    if ax <= 0 or ay <= 0:
        raise ValueError("bbox must have positive spans")
    area_q = ax * ay
    g = int(delta_deg * scale)
    d2max = g * g
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))
    pq = points.select(
        F.col(id_col).alias("_i"),
        (F.round(F.col(lon_col) * sc).cast("bigint") + offx)
        .alias("_x"),
        (F.round(F.col(lat_col) * sc).cast("bigint") + offy)
        .alias("_y"),
    ).localCheckpoint(eager=True)
    cell = (_idiv(F.col("_y"), g) * F.lit(1_000_000)
            + _idiv(F.col("_x"), g))
    home = pq.select("_i", "_x", "_y", cell.alias("_cell"))
    probes = F.array(
        *[
            (_idiv(F.col("_y"), g) + F.lit(dy)) * F.lit(1_000_000)
            + (_idiv(F.col("_x"), g) + F.lit(dx))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    fan = pq.select(
        F.col("_i").alias("_ia"), F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"), F.explode(probes).alias("_cell"),
    )
    dd = (
        (F.col("_xa") - F.col("_x")) * (F.col("_xa") - F.col("_x"))
        + (F.col("_ya") - F.col("_y")) * (F.col("_ya") - F.col("_y"))
    )
    nn = (
        fan.join(home, "_cell")
        .where(F.col("_ia") != F.col("_i"))
        .select("_ia", dd.alias("_d2"))
        .where(F.col("_d2") <= F.lit(d2max))
        .groupBy("_ia")
        .agg(F.min("_d2").alias("_nn2"))
    )
    dec = "decimal(38,0)"
    stats = nn.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.coalesce(
            F.sum(F.expr(f"CAST(_nn2 AS {dec})")),
            F.expr(f"CAST(0 AS {dec})"),
        ).alias("_sd2"),
    )
    n_row = pq.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        n_row.crossJoin(F.broadcast(stats))
        .select(
            "n", "n_matched",
            (F.col("n") - F.col("n_matched")).cast("bigint")
            .alias("n_far"),
            F.expr("CAST(_sd2 AS BIGINT)").alias("sum_d2"),
            F.expr(
                f"CAST(CASE WHEN n < 2 OR n_matched = 0 THEN NULL "
                f"ELSE (_sd2 * {CE_PI_PPM} * n) "
                f"DIV (CAST(n_matched AS {dec}) * {area_q}) "
                f"END AS BIGINT)"
            ).alias("ce2_ppm"),
        )
    )


def clark_evans2_sql(
    src: str,
    delta_deg: float,
    bbox: tuple[float, float, float, float],
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`clark_evans2` (HUGEINT clearing,
    identical cell probe and frozen π).  Standalone."""
    lon0, lat0, lon1, lat1 = bbox
    area_q = int(round((lon1 - lon0) * scale)) * int(
        round((lat1 - lat0) * scale)
    )
    g = int(delta_deg * scale)
    d2max = g * g
    offx, offy = 180 * scale, 90 * scale
    return f"""
        WITH ce_p AS MATERIALIZED (
            SELECT {id_col} AS _i,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT)
                       + {offx} AS _x,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT)
                       + {offy} AS _y
            FROM {src}
        ),
        ce_nn AS MATERIALIZED (
            SELECT a._i AS _ia, MIN((a._x - b._x) * (a._x - b._x)
                   + (a._y - b._y) * (a._y - b._y)) AS _nn2
            FROM (SELECT *,
                         ((_y - _y % {g}) // {g} + d.dy) * 1000000
                         + ((_x - _x % {g}) // {g} + d.dx) AS _cell
                  FROM ce_p CROSS JOIN (VALUES
                       (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                       (1,-1),(1,0),(1,1)) d(dy, dx)) a
            JOIN (SELECT *,
                         ((_y - _y % {g}) // {g}) * 1000000
                         + ((_x - _x % {g}) // {g}) AS _cell
                  FROM ce_p) b USING (_cell)
            WHERE a._i <> b._i
              AND (a._x - b._x) * (a._x - b._x)
                  + (a._y - b._y) * (a._y - b._y) <= {d2max}
            GROUP BY 1
        ),
        ce_agg AS (
            SELECT (SELECT COUNT(*) FROM ce_p) AS n,
                   (SELECT COUNT(*) FROM ce_nn) AS n_matched,
                   (SELECT COALESCE(SUM(CAST(_nn2 AS HUGEINT)),
                                    CAST(0 AS HUGEINT))
                    FROM ce_nn) AS _sd2
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n_matched AS BIGINT) AS n_matched,
               CAST(n - n_matched AS BIGINT) AS n_far,
               CAST(_sd2 AS BIGINT) AS sum_d2,
               CAST(CASE WHEN n < 2 OR n_matched = 0 THEN NULL
                    ELSE (_sd2 * {CE_PI_PPM} * n)
                         // (CAST(n_matched AS HUGEINT) * {area_q})
                    END AS BIGINT) AS ce2_ppm
        FROM ce_agg
    """


def ipf_balance(
    seed: DataFrame,
    row_targets: DataFrame,
    col_targets: DataFrame,
    rounds: int = 6,
    scale: int = 10**6,
) -> DataFrame:
    """Iterative proportional fitting (RAS balancing) of an OD
    matrix — update yesterday's flow structure to today's margins:
    the standard small-area/trip-table estimator (Deming–Stephan
    1940) that keeps the seed's interaction PATTERN while matching
    new row (outflow) and column (inflow) totals.  The missing
    third of the OD family: :func:`od_flows` observes a matrix,
    :func:`od_gravity_residuals` scores it, IPF PROJECTS it onto
    new margins.

    Quantized exactly: weights live in ×``scale`` integers; each
    half-round rescales one axis by target/current-sum with ONE
    floor per cell,

        w' = (w · t·scale) DIV rowsum(w)      (then columns)

    so a fixed round count is bit-reproducible (the pagerank/katz
    discipline; floors leak ≤ 1/scale per cell per half-round,
    stated).  Declared zero semantics: a cell's row (or column)
    with zero current sum stays zero — the classic IPF structural-
    zero rule (mass cannot be created where the seed has none); a
    row/column ABSENT from the targets is target 0 and empties
    (silently inventing "no change" would un-balance the other
    axis).

    Scale: per round 2 margin aggregates + 2 broadcast-size joins
    keyed by the margin cells — the matrix itself shuffles on
    cell_from then cell_to, the natural partitioning; lineage cut
    per round.  Bound: w·t·scale ≤ total²·scale² — decimal(38) to
    ~10¹³ total flow at scale 10⁶.

    ``seed``: (cell_from, cell_to, n_flows);  ``row_targets``:
    (cell_from, target);  ``col_targets``: (cell_to, target).
    Returns (cell_from, cell_to, w_ppm) — balanced flows ×scale."""
    if not 1 <= int(rounds) <= 32:
        raise ValueError(f"rounds must be in [1, 32]: {rounds}")
    dec = "decimal(38,0)"
    w = seed.select(
        "cell_from", "cell_to",
        F.expr(f"CAST(n_flows AS {dec}) * {int(scale)}").alias("_w"),
    ).localCheckpoint(eager=True)
    rt = row_targets.select(
        "cell_from", F.col("target").cast("bigint").alias("_tr")
    ).localCheckpoint(eager=True)
    ct = col_targets.select(
        "cell_to", F.col("target").cast("bigint").alias("_tc")
    ).localCheckpoint(eager=True)
    for _ in range(int(rounds)):
        rs = w.groupBy("cell_from").agg(F.sum("_w").alias("_rs"))
        w = (
            w.join(rs, "cell_from")
            .join(rt, "cell_from", "left")
            .select(
                "cell_from", "cell_to",
                F.expr(
                    f"CASE WHEN _rs = 0 OR _tr IS NULL "
                    f"THEN CAST(0 AS {dec}) ELSE "
                    f"(_w * (CAST(_tr AS {dec}) * {int(scale)})) "
                    f"DIV _rs END"
                ).alias("_w"),
            )
        )
        cs = w.groupBy("cell_to").agg(F.sum("_w").alias("_cs"))
        w = (
            w.join(cs, "cell_to")
            .join(ct, "cell_to", "left")
            .select(
                "cell_from", "cell_to",
                F.expr(
                    f"CASE WHEN _cs = 0 OR _tc IS NULL "
                    f"THEN CAST(0 AS {dec}) ELSE "
                    f"(_w * (CAST(_tc AS {dec}) * {int(scale)})) "
                    f"DIV _cs END"
                ).alias("_w"),
            )
            .localCheckpoint(eager=True)
        )
    return w.select(
        "cell_from", "cell_to",
        F.expr("CAST(_w AS BIGINT)").alias("w_ppm"),
    )


def ipf_balance_sql(
    seed_src: str,
    row_targets_src: str,
    col_targets_src: str,
    rounds: int = 6,
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`ipf_balance` — identical half-round
    floor rescales unrolled as MATERIALIZED CTEs (HUGEINT).
    Standalone; sources expose (cell_from, cell_to, n_flows) /
    (cell_from, target) / (cell_to, target)."""
    ctes = [
        f"""ipf_w0 AS MATERIALIZED (
            SELECT cell_from, cell_to,
                   CAST(n_flows AS HUGEINT) * {int(scale)} AS _w
            FROM {seed_src}
        )""",
        f"""ipf_rt AS (
            SELECT cell_from, CAST(target AS BIGINT) AS _tr
            FROM {row_targets_src}
        )""",
        f"""ipf_ct AS (
            SELECT cell_to, CAST(target AS BIGINT) AS _tc
            FROM {col_targets_src}
        )""",
    ]
    for r in range(1, int(rounds) + 1):
        p = f"ipf_w{r - 1}" if r == 1 else f"ipf_c{r - 1}"
        ctes.append(f"""ipf_r{r} AS MATERIALIZED (
            SELECT w.cell_from, w.cell_to,
                   CASE WHEN s._rs = 0 OR t._tr IS NULL
                        THEN CAST(0 AS HUGEINT)
                        ELSE (w._w * (CAST(t._tr AS HUGEINT)
                                      * {int(scale)})) // s._rs
                   END AS _w
            FROM {p} w
            JOIN (SELECT cell_from, SUM(_w) AS _rs FROM {p}
                  GROUP BY 1) s USING (cell_from)
            LEFT JOIN ipf_rt t USING (cell_from)
        )""")
        ctes.append(f"""ipf_c{r} AS MATERIALIZED (
            SELECT w.cell_from, w.cell_to,
                   CASE WHEN s._cs = 0 OR t._tc IS NULL
                        THEN CAST(0 AS HUGEINT)
                        ELSE (w._w * (CAST(t._tc AS HUGEINT)
                                      * {int(scale)})) // s._cs
                   END AS _w
            FROM ipf_r{r} w
            JOIN (SELECT cell_to, SUM(_w) AS _cs FROM ipf_r{r}
                  GROUP BY 1) s USING (cell_to)
            LEFT JOIN ipf_ct t USING (cell_to)
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT cell_from, cell_to, CAST(_w AS BIGINT) AS w_ppm
        FROM ipf_c{rounds}
    """
    )


def huff_shares(
    points: DataFrame,
    sites: DataFrame,
    radius_deg: float,
    point_id: str = "doc_id",
    site_id: str = "site_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 10_000,
    u_scale: int = 10**12,
) -> DataFrame:
    """Huff gravity market shares (Huff 1964) — the probabilistic
    catchment model: each point splits its patronage across nearby
    sites in proportion to attractiveness over squared distance,

        u_ij      = (A_j · u_scale) DIV max(d²_ij, 1)
        share_ppm = u_ij · 10⁶ DIV Σ_k u_ik

    — the demand-allocation layer between :func:`knn_neighborhood`'s
    winner-take-all nearest and :func:`od_gravity_residuals`'
    after-the-fact scoring (Huff PREDICTS the flow split before any
    flow exists; retail siting, service catchments, recrawl load
    allocation across mirrors).  β = 2 exactly so the deterrence is
    the exact integer d² — no float power anywhere; the utility
    floor and the share floor are the only two quantizations,
    stated; a point sitting ON a site (d² = 0) clamps to one
    quantum and dominates, stated.  ``u_scale`` must be ≥ radius²
    in quantized units (validated) so every in-radius utility is ≥
    its attractiveness ≥ 1 (asserted in-plan) — the per-point
    denominator can never floor to zero.

    Candidate sites come from the house cell equi-join at
    ``radius_deg`` (3×3 probe) — mass beyond one cell is TRUNCATED
    from the choice set (stated; n_sites in the output makes thin
    choice sets visible); points with no site in radius are absent.
    Utilities and the denominator ride decimal(38)/HUGEINT — no
    int64 ceiling on attractiveness.

    ``sites``: (site_id, lon, lat, attract ≥ 1).  Returns one row
    per (point, candidate site): (point, site, d2_q, n_sites,
    share_ppm); shares per point sum to ≤ 10⁶ (floor loss < n_sites
    ppm)."""
    if radius_deg * scale != int(radius_deg * scale):
        raise ValueError("radius_deg * scale must be integral")
    if scale > 1_000_000:
        raise ValueError("scale > 1e6 overflows the int64 d2 bound")
    g = int(radius_deg * scale)
    d2max = g * g
    if int(u_scale) < d2max:
        raise ValueError(
            f"u_scale must be >= radius^2 in quantized units "
            f"({d2max}) so utilities cannot floor to zero: {u_scale}"
        )
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))
    pq = points.select(
        F.col(point_id).alias("_i"),
        (F.round(F.col(lon_col) * sc).cast("bigint") + offx)
        .alias("_px"),
        (F.round(F.col(lat_col) * sc).cast("bigint") + offy)
        .alias("_py"),
    )
    sq = sites.select(
        F.col(site_id).alias("_s"),
        (F.round(F.col(lon_col) * sc).cast("bigint") + offx)
        .alias("_sx"),
        (F.round(F.col(lat_col) * sc).cast("bigint") + offy)
        .alias("_sy"),
        F.expr(
            "CASE WHEN assert_true(attract >= 1, 'huff_shares: "
            "attract must be >= 1') IS NULL "
            "THEN CAST(attract AS BIGINT) END"
        ).alias("_a"),
    )
    cell = (_idiv(F.col("_sy"), g) * F.lit(1_000_000)
            + _idiv(F.col("_sx"), g))
    s_home = sq.select("_s", "_sx", "_sy", "_a", cell.alias("_cell"))
    probes = F.array(
        *[
            (_idiv(F.col("_py"), g) + F.lit(dy)) * F.lit(1_000_000)
            + (_idiv(F.col("_px"), g) + F.lit(dx))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    p_fan = pq.withColumn("_cell", F.explode(probes))
    dd = (
        (F.col("_px") - F.col("_sx")) * (F.col("_px") - F.col("_sx"))
        + (F.col("_py") - F.col("_sy")) * (F.col("_py") - F.col("_sy"))
    )
    cand = (
        p_fan.join(s_home, "_cell")
        .select("_i", "_s", dd.alias("_d2"), "_a")
        .where(F.col("_d2") <= F.lit(d2max))
        .withColumn(
            "_u",
            F.expr(
                f"(CAST(_a AS decimal(38,0)) * {int(u_scale)}) "
                f"DIV GREATEST(_d2, 1)"
            ),
        )
    )
    dec = "decimal(38,0)"
    denom = cand.groupBy("_i").agg(
        F.sum(F.expr(f"CAST(_u AS {dec})")).alias("_du"),
        F.count(F.lit(1)).cast("bigint").alias("n_sites"),
    )
    return (
        cand.join(denom, "_i")
        .select(
            F.col("_i").alias(point_id),
            F.col("_s").alias(site_id),
            F.col("_d2").alias("d2_q"),
            "n_sites",
            F.expr(
                f"CAST((CAST(_u AS {dec}) * 1000000) DIV _du "
                "AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


def huff_shares_sql(
    points_src: str,
    sites_src: str,
    radius_deg: float,
    point_id: str = "doc_id",
    site_id: str = "site_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 10_000,
    u_scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`huff_shares` — identical quantization,
    cell probe, clamped deterrence, and floor shares (HUGEINT
    denominator).  ``sites_src`` exposes (site_id, lon, lat,
    attract).  Standalone."""
    g = int(radius_deg * scale)
    d2max = g * g
    offx, offy = 180 * scale, 90 * scale
    return f"""
        WITH hf_p AS (
            SELECT {point_id} AS _i,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT)
                       + {offx} AS _px,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT)
                       + {offy} AS _py
            FROM {points_src}
        ),
        hf_s AS (
            SELECT {site_id} AS _s,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT)
                       + {offx} AS _sx,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT)
                       + {offy} AS _sy,
                   CAST(attract AS BIGINT) AS _a
            FROM {sites_src}
        ),
        hf_cand AS MATERIALIZED (
            SELECT p._i, s._s,
                   (p._px - s._sx) * (p._px - s._sx)
                   + (p._py - s._sy) * (p._py - s._sy) AS _d2,
                   s._a
            FROM (SELECT *,
                         ((_py - _py % {g}) // {g} + d.dy) * 1000000
                         + ((_px - _px % {g}) // {g} + d.dx) AS _cell
                  FROM hf_p CROSS JOIN (VALUES
                       (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                       (1,-1),(1,0),(1,1)) d(dy, dx)) p
            JOIN (SELECT *,
                         ((_sy - _sy % {g}) // {g}) * 1000000
                         + ((_sx - _sx % {g}) // {g}) AS _cell
                  FROM hf_s) s USING (_cell)
            WHERE (p._px - s._sx) * (p._px - s._sx)
                  + (p._py - s._sy) * (p._py - s._sy) <= {d2max}
        ),
        hf_u AS MATERIALIZED (
            SELECT _i, _s, _d2,
                   (CAST(_a AS HUGEINT) * {int(u_scale)})
                       // GREATEST(_d2, 1) AS _u
            FROM hf_cand
        ),
        hf_den AS (
            SELECT _i, SUM(CAST(_u AS HUGEINT)) AS _du,
                   CAST(COUNT(*) AS BIGINT) AS n_sites
            FROM hf_u GROUP BY 1
        )
        SELECT u._i AS {point_id}, u._s AS {site_id},
               u._d2 AS d2_q, d.n_sites,
               CAST((CAST(u._u AS HUGEINT) * 1000000) // d._du
                    AS BIGINT) AS share_ppm
        FROM hf_u u JOIN hf_den d USING (_i)
    """


# Light vector for hillshading, frozen at import (the Benford/NDCG
# declared-constant discipline): azimuth 315° (NW), altitude 45° —
# the cartographic default — as round(1e6 · (cos alt · sin az,
# cos alt · cos az, sin alt)).  |L|² is NOT exactly 1e12 (707107² =
# 500000307449); both engines divide by the same declared square.
HILLSHADE_LIGHT = (-500_000, 500_000, 707_107)


def raster_hillshade(
    cells: DataFrame,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    z_scale: int = 1,
    light: tuple[int, int, int] = HILLSHADE_LIGHT,
) -> DataFrame:
    """Analytic hillshade of a per-cell raster — the cartographic
    rendering of the terrain family (aspect's direction labels and
    viewshed's visibility verdicts, but as a continuous illumination
    value): the cosine of the angle between the surface normal and a
    frozen light vector,

        n = (-gx, -gy, z_scale)          (unnormalized normal)
        shade_ppm = 1e6 · (n · L) / (|n| · |L|)   ∈ [-1e6, 1e6]

    computed EXACTLY: gradients are :func:`raster_aspect`'s integer
    central differences (this operator is a verified composition —
    the twin nests the identical aspect CTEs), the light vector is a
    declared integer-ppm constant (no trig on either engine), and
    the normalization runs as sign(n·L) · isqrt((n·L)²·10¹² DIV
    (|n|²·|L|²)) with the exact integer sqrt (float seed − 2, three
    upward corrections — the spearman pattern), so every shade value
    is engine-identical.  ``z_scale`` (declared, ≥ 1) is the
    vertical exaggeration: how many value units span one cell width;
    a flat cell shades to ≈ cos(45°)·10⁶ by the algebra, no special
    case.  Bounds: the cleared numerator is (n·L)²·10¹², so staying
    inside decimal(38)/HUGEINT needs |n·L| ≤ 10¹³, i.e. |g| ≲
    (10¹³ − z·lz)/(|lx|+|ly|) ≈ 10⁷ at the default light — NOT the
    10¹³ an earlier revision claimed (that would clear ~10⁵⁰ and
    overflow asymmetrically: Spark nulls, DuckDB errors).  A LOUD
    guard enforces the derived per-light limit on |gx|,|gy| so an
    out-of-envelope raster raises here instead of silently nulling.

    Plan: raster_aspect's ×4 fan + groupBy on the aggregate raster,
    then pure per-row column arithmetic — no extra shuffle.
    Output: (cell, gx, gy, shade_ppm)."""
    lx, ly, lz = (int(v) for v in light)
    if int(z_scale) < 1:
        raise ValueError(f"z_scale must be >= 1: {z_scale}")
    if lz <= 0:
        raise ValueError("light altitude must be positive (lz > 0)")
    z = int(z_scale)
    l2 = lx * lx + ly * ly + lz * lz
    # derived overflow envelope (see docstring): |n·L| must stay ≤ 10¹³
    # so the cleared numerator (n·L)²·10¹² fits decimal(38); guard the
    # gradient magnitude loudly instead of letting Spark null on
    # overflow where DuckDB would error
    g_lim = (10**13 - z * lz) // max(abs(lx) + abs(ly), 1)
    g_guard = F.assert_true(
        (F.abs(F.col("gx")) <= F.lit(g_lim))
        & (F.abs(F.col("gy")) <= F.lit(g_lim)),
        F.lit(
            f"raster_hillshade: |gradient| exceeds the overflow-safe "
            f"envelope {g_lim} for this light vector — the cleared "
            "(n·L)²·10¹² term would leave decimal(38); rescale the "
            "raster or lower z_scale"
        ),
    )
    g = raster_aspect(cells, value_col, res_deg).select(
        "cell",
        F.when(g_guard.isNull(), F.col("gx")).alias("gx"),
        "gy",
    )
    dec = "decimal(38,0)"
    dot = f"(CAST(-gx AS {dec}) * {lx} + CAST(-gy AS {dec}) * {ly} " \
          f"+ CAST({z * lz} AS {dec}))"
    n2 = f"(CAST(gx AS {dec}) * gx + CAST(gy AS {dec}) * gy " \
         f"+ {z * z})"
    q = (
        f"CAST(({dot} * {dot} * 1000000000000) "
        f"DIV ({n2} * {l2}) AS BIGINT)"
    )
    s0 = f"GREATEST(CAST(SQRT(CAST({q} AS DOUBLE)) AS BIGINT) - 2, 0)"
    isq = (
        f"({s0} + IF(({s0}+1)*({s0}+1) <= {q}, 1, 0)"
        f" + IF(({s0}+2)*({s0}+2) <= {q}, 1, 0)"
        f" + IF(({s0}+3)*({s0}+3) <= {q}, 1, 0))"
    )
    return g.select(
        "cell", "gx", "gy",
        F.expr(
            f"CAST(CASE WHEN {dot} < 0 THEN -{isq} ELSE {isq} END "
            "AS BIGINT)"
        ).alias("shade_ppm"),
    )


def raster_hillshade_sql(
    src: str,
    value_col: str,
    res_deg: float = DEFAULT_RES_DEG,
    z_scale: int = 1,
    light: tuple[int, int, int] = HILLSHADE_LIGHT,
) -> str:
    """DuckDB twin of :func:`raster_hillshade` — the identical
    raster_aspect gradient CTEs (the composition is what's verified)
    with the same declared light constants, HUGEINT clearing and the
    same seeded-isqrt.  Standalone statement."""
    lx, ly, lz = (int(v) for v in light)
    z = int(z_scale)
    l2 = lx * lx + ly * ly + lz * lz
    dot = f"(CAST(-gx AS HUGEINT) * {lx} + CAST(-gy AS HUGEINT) " \
          f"* {ly} + CAST({z * lz} AS HUGEINT))"
    n2 = f"(CAST(gx AS HUGEINT) * gx + CAST(gy AS HUGEINT) * gy " \
         f"+ {z * z})"
    q = (
        f"CAST(({dot} * {dot} * 1000000000000::HUGEINT) "
        f"// ({n2} * {l2}) AS BIGINT)"
    )
    s0 = (
        f"GREATEST(CAST(SQRT(CAST({q} AS DOUBLE)) AS BIGINT) - 2, "
        "0::BIGINT)"
    )
    isq = (
        f"({s0} + CASE WHEN ({s0}+1)*({s0}+1) <= {q} THEN 1 ELSE 0 END"
        f" + CASE WHEN ({s0}+2)*({s0}+2) <= {q} THEN 1 ELSE 0 END"
        f" + CASE WHEN ({s0}+3)*({s0}+3) <= {q} THEN 1 ELSE 0 END)"
    )
    # reuse the aspect twin's CTE chain up to ra_out (drop its final
    # SELECT — the last 'SELECT cell,' marks it), append our readout
    return (
        "WITH "
        + raster_aspect_ctes(src, value_col, res_deg)
        .rsplit("SELECT cell,", 1)[0]
        + f"""
        SELECT cell, gx, gy,
               CAST(CASE WHEN {dot} < 0 THEN -{isq} ELSE {isq} END
                    AS BIGINT) AS shade_ppm
        FROM ra_out
    """
    )


def nn_g_counts(
    points: DataFrame,
    delta_deg: float,
    radii_q: "list[int]",
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 10_000,
) -> DataFrame:
    """Empirical G function — the nearest-neighbour distance CDF,
    completing the classical point-pattern trio (Ripley's K counts
    pairs at all ranges, Clark–Evans summarizes NN² to one index,
    G shows the whole NN distribution): per declared radius r,

        G(r) = #{points with NN distance ≤ r} · 1e6 DIV n

    in exact integers (squared comparison NN² ≤ r² — no sqrt).  The
    bounded-radius censoring is EXACT here, not a bias: radii are
    validated ≤ the cell radius δ, and a point whose 3×3 probe finds
    no neighbour has true NN > δ ≥ r, so it contributes 0 to every
    band — the censored tail lands in n_far, reported.  One NN pass
    (the clark_evans2 cell kit: grid at δ, 3×3 probe, exact min d²),
    then every band is a conditional count over the same stream (the
    ripley_k shape).

    Returns one row per radius: (radius_q, n, n_matched, n_far,
    n_le, g_ppm); NULL g when n = 0."""
    if delta_deg * scale != int(delta_deg * scale):
        raise ValueError("delta_deg * scale must be integral")
    g = int(delta_deg * scale)
    rs = sorted(set(int(r) for r in radii_q))
    if not 1 <= len(rs) <= 16:
        raise ValueError(f"radii_q must hold 1..16 values: {radii_q}")
    if any(r < 1 or r > g for r in rs):
        raise ValueError(
            f"every radius must be in [1, delta*scale={g}] so the "
            f"3x3-probe NN is exact at that range: {radii_q}"
        )
    offx, offy = 180 * scale, 90 * scale
    sc = F.lit(float(scale))
    pq = points.select(
        F.col(id_col).alias("_i"),
        (F.round(F.col(lon_col) * sc).cast("bigint") + offx)
        .alias("_x"),
        (F.round(F.col(lat_col) * sc).cast("bigint") + offy)
        .alias("_y"),
    ).localCheckpoint(eager=True)
    cell = (_idiv(F.col("_y"), g) * F.lit(1_000_000)
            + _idiv(F.col("_x"), g))
    home = pq.select("_i", "_x", "_y", cell.alias("_cell"))
    probes = F.array(
        *[
            (_idiv(F.col("_y"), g) + F.lit(dy)) * F.lit(1_000_000)
            + (_idiv(F.col("_x"), g) + F.lit(dx))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    fan = pq.select(
        F.col("_i").alias("_ia"), F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"), F.explode(probes).alias("_cell"),
    )
    dd = (
        (F.col("_xa") - F.col("_x")) * (F.col("_xa") - F.col("_x"))
        + (F.col("_ya") - F.col("_y")) * (F.col("_ya") - F.col("_y"))
    )
    nn = (
        fan.join(home, "_cell")
        .where(F.col("_ia") != F.col("_i"))
        .select("_ia", dd.alias("_d2"))
        .where(F.col("_d2") <= F.lit(g * g))
        .groupBy("_ia")
        .agg(F.min("_d2").alias("_nn2"))
    )
    counts = nn.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        *[
            # COALESCE to 0 on the empty-nn degenerate case (no point
            # has a neighbour within delta): SUM over zero rows is
            # NULL, which would break 'censored points contribute 0 to
            # every band' and hash-diverge from the twin's
            # COALESCE(SUM(...), 0)
            F.coalesce(
                F.sum(
                    F.when(F.col("_nn2") <= F.lit(r * r), 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("bigint").alias(f"_le{r}")
            for r in rs
        ],
    )
    n_row = pq.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    base = n_row.crossJoin(F.broadcast(counts))
    rows = None
    for r in rs:
        one = base.select(
            F.lit(r).cast("bigint").alias("radius_q"),
            "n", "n_matched",
            (F.col("n") - F.col("n_matched")).cast("bigint")
            .alias("n_far"),
            F.col(f"_le{r}").alias("n_le"),
            F.expr(
                f"CAST(CASE WHEN n = 0 THEN NULL ELSE "
                f"(_le{r} * 1000000) DIV n END AS BIGINT)"
            ).alias("g_ppm"),
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows


def nn_g_counts_sql(
    src: str,
    delta_deg: float,
    radii_q: "list[int]",
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`nn_g_counts` (identical cell kit, NN
    min, conditional band counts).  Standalone statement."""
    g = int(delta_deg * scale)
    rs = sorted(set(int(r) for r in radii_q))
    offx, offy = 180 * scale, 90 * scale
    les = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN nn2 <= {r * r} THEN 1 END), 0)"
        f" AS BIGINT) AS le{r}"
        for r in rs
    )
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS radius_q, n, n_matched, "
        f"n - n_matched AS n_far, le{r} AS n_le, "
        f"CAST(CASE WHEN n = 0 THEN NULL ELSE (le{r} * 1000000) // n "
        f"END AS BIGINT) AS g_ppm "
        f"FROM gf_n, gf_c"
        for r in rs
    )
    return f"""
        WITH gf_p AS MATERIALIZED (
            SELECT {id_col} AS i,
                   CAST(ROUND({lon_col} * {scale}) AS BIGINT)
                       + {offx} AS x,
                   CAST(ROUND({lat_col} * {scale}) AS BIGINT)
                       + {offy} AS y
            FROM {src}
        ),
        gf_nn AS MATERIALIZED (
            SELECT a.i AS ia, MIN((a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y)) AS nn2
            FROM (
                SELECT p.*, ((p.y // {g}) + d.dy) * 1000000
                       + ((p.x // {g}) + d.dx) AS cell
                FROM gf_p p CROSS JOIN (VALUES
                     (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                     (1,-1),(1,0),(1,1)) d(dy, dx)
            ) a
            JOIN (
                SELECT p.*, (p.y // {g}) * 1000000 + (p.x // {g})
                       AS cell
                FROM gf_p p
            ) b USING (cell)
            WHERE a.i <> b.i
              AND (a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y) <= {g * g}
            GROUP BY 1
        ),
        gf_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gf_p),
        gf_c AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_matched, {les}
            FROM gf_nn
        )
        {rows}
    """
