"""Driver contract for the spark-graft builder (PySpark target).

Queries re-express the reference's operator inventory (SURVEY.md §2)
over the graft input: a deterministic Common-Crawl-style ``pages``
table derived from the driver's ``documents`` parquet by pure
arithmetic (openstreetmap_license_change_spark/sources/pages.py — the
same derivation ships as a SQL CTE for the DuckDB oracle), plus the
training-data operators (dedup / similarity / text analysis) and
TPC-H-shaped checks on lineitem/orders.

Every ``queries()`` entry with SQL-expressible semantics has a
matching ``oracle_sql()`` entry; the UDF-bound history fold
(classify_actions) is rows-only and is separately golden-tested in
tests/ against the reference's behavioral suites; its per-element-type
restrictions (classify_actions_nodes / _ways / _relations) ARE fully
hash-verified against DuckDB twins — all three element types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import (
    dedup,
    fold,
    graph,
    hexgrid,
    hilbert,
    hull,
    lineage,
    ranking,
    similarity,
    sketches,
    snapshots,
    spatial,
    textops,
)
from openstreetmap_license_change_spark.operators import (
    evaluation,
    multimodal as multimodal_mod,
    profile as profile_mod,
    rtree as rtree_mod,
    sampling,
    temporal as temporal_mod,
)
from openstreetmap_license_change_spark.sources import pages as pages_src

SF_DEFAULT = "/root/testdata/sf0.001"

# Shared polygon layer for the general-PIP entry + its oracle: three
# non-overlapping rings with NO horizontal edges (a y-equal edge never
# crosses, but naive SQL would still evaluate its 0-division branch).
# Coordinates are exact dyadic doubles so both engines see identical
# literals.
PIP_POLYGONS = [
    (1, [(-150.0, -60.0), (-100.0, -59.0), (-125.0, -20.0)]),
    (2, [(0.0, 30.0), (25.0, 55.0), (50.0, 30.0), (25.0, 5.0)]),
    (3, [(100.0, -40.0), (140.0, -39.0), (145.0, 0.0), (105.0, 5.0)]),
]


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pages_src.pages_from_documents(spark, sf_dir)


def _pages_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lineage.with_accept_flags(
        _pages(spark, sf_dir), pages_src.cs_status(spark)
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: geocode pages → cell assignment → acceptance
    flags → per-cell taint rollup ordered by density (the north-rule
    spatial-join + tile-assignment pipeline at sf0.001)."""
    flagged = _pages_flagged(spark, SF_DEFAULT)
    cells = spatial.assign_cells(flagged)
    rollup = spatial.tile_rollup(
        cells.withColumn("tainted", ~F.col("accepted")), taint_col="tainted"
    )
    return rollup.orderBy(F.desc("n_pages"), F.col("cell")).limit(100)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_latest_version(spark, sf_dir):
    """A3: latest-version snapshot per url (current_* tables)."""
    pages = _pages(spark, sf_dir)
    return lineage.latest_version(
        pages, cols=["version", "changeset_id", "visible"]
    ).select(
        "url",
        F.col("version").alias("last_version"),
        F.col("changeset_id").alias("last_changeset"),
        F.col("visible").alias("last_visible"),
    )


def q_reverse_cumulative_clean(spark, sf_dir):
    """A8: odbl-clean backward propagation as a window-frame AND."""
    flagged = _pages_flagged(spark, sf_dir)
    out = lineage.reverse_cumulative_flag(flagged, "accepted", "clean_from_here")
    return out.select("url", "version", "accepted", "clean_from_here")


def q_candidate_filter(spark, sf_dir):
    """P1: decliner-touched candidate pre-filter (distinct urls)."""
    flagged = _pages_flagged(spark, sf_dir)
    return (
        lineage.candidate_filter(flagged)
        .select("url")
        .distinct()
    )


def q_changeset_accept_join(spark, sf_dir):
    """J1/J2: pages ⋈ broadcast changeset-status (+adopter self-join),
    aggregated per changeset for a stable small result."""
    flagged = _pages_flagged(spark, sf_dir)
    return flagged.groupBy("changeset_id", "accepted").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.count(F.when(F.col("visible"), 1)).alias("n_visible"),
    )


def q_reverse_reference_join(spark, sf_dir):
    """J5: reverse-reference join on exploded arrays — orders as 'ways'
    over part 'nodes'; find orders referencing small parts (deletes)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    ways = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("part_nodes")
    )
    deletes = part.where(F.col("p_size") < 5).select(
        F.col("p_partkey").alias("del_part")
    )
    exploded = ways.select(
        "l_orderkey", F.explode("part_nodes").alias("ref_part")
    )
    return (
        exploded.join(F.broadcast(deletes), exploded.ref_part == deletes.del_part)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregate pushdown check on lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: customer ⨝ orders ⨝ lineitem, revenue top-10.
    Dim side broadcasts (autoBroadcastJoinThreshold); revenue sums as a
    scaled int64 so accumulation order can't change the result."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust.where(F.col("c_mktsegment") == "BUILDING"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .where(
            (F.col("o_orderdate") < F.lit("1998-01-01"))
            & (F.col("l_shipdate") > F.lit("1998-01-01"))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
            "revenue",
        )
    )


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table star join (region→nation broadcast dims,
    fact-side shuffle joins), revenue per nation."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .where(F.col("o_orderdate") < F.lit("1999-01-01"))
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum(rev).cast("double") / 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: part dim broadcast onto lineitem, promo share
    of revenue per month — exact via scaled-int sums, one division."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.substring("l_shipdate", 1, 7).alias("ship_month"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                .cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_cell_assignment(spark, sf_dir):
    """F14': grid cell + Morton quad-tile per latest page version."""
    pages = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    return spatial.assign_cells(pages).select("url", "lon", "lat", "cell", "tile")


def q_clark_evans(spark, sf_dir):
    """Squared Clark–Evans NN index (spatial.clark_evans2) over
    latest pages — the distance-scale CSR reading beside
    quadrat_csr's grid-scale one.  NN² via the 20° cell equi-join
    (every point matched at every sf), CSR expectation 1/(πλ) with
    π frozen at round(π·10⁶); out-of-radius isolates would be
    reported, never swallowed.  Exact cleared integers end-to-end."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["doc_id", "lon", "lat"]
    )
    return spatial.clark_evans2(
        pages.select("doc_id", "lon", "lat"),
        20.0, (-180.0, -90.0, 180.0, 90.0),
    )


NN_G_RADII = [25_000, 50_000, 100_000, 200_000]


def q_nn_g_function(spark, sf_dir):
    """Empirical G function (spatial.nn_g_counts) over latest pages
    — the NN-distance CDF completing the point-pattern trio beside
    ripley_k (pair counts) and clark_evans (one-number NN index):
    exact band counts at 2.5°/5°/10°/20° radii via the same 20°
    cell kit, with the bounded-radius censoring EXACT by
    construction (radii ≤ the probe radius, so a censored point's
    NN provably exceeds every band).  One NN pass, conditional
    counts per band."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["doc_id", "lon", "lat"]
    )
    return spatial.nn_g_counts(
        pages.select("doc_id", "lon", "lat"), 20.0, NN_G_RADII
    )


def q_quadrat(spark, sf_dir):
    """Quadrat CSR test (spatial.quadrat_test) over latest pages on
    the global 10° grid (648 quadrats, empties entering through C —
    never materialized): clustered, random, or uniform?  The
    synthetic corpus geocode is a low-discrepancy spread, so
    VMR ≪ 10⁶ (more uniform than random) — the χ² identity
    (C·Σn² − N²)/N clears exactly in decimal(38)/HUGEINT and the
    out-of-frame count is reported, not swallowed."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat"]
    )
    return spatial.quadrat_test(
        pages, (-180.0, -90.0, 180.0, 90.0), 10.0
    )


def q_dispersion_ellipse(spark, sf_dir):
    """Standard deviational ellipse (spatial.dispersion_ellipse):
    the directional upgrade of point_dispersion — per-language
    centered moment matrix in exact cleared integers, the
    major-axis bearing as sign-decomposed tan(2θ) ppm and the
    scale-free anisotropy score (λmax−λmin)²/(λmax+λmin)² — WHERE a
    language's crawl footprint points, not just how wide it is.
    One map-side-combining aggregation; σ/θ equivalents reported as
    the exact cross-multiplied quantities (the tile_hotspots
    discipline)."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat", "lang"]
    )
    return spatial.dispersion_ellipse(pages, "lang")


def q_point_dispersion(spark, sf_dir):
    """Centrographics (spatial.point_dispersion): per-language mean
    center + squared standard distance over latest page versions —
    the two numbers a spatial profile leads with (compact cluster vs
    continent-wide scatter), exact via the N-scaling identity with
    one non-negative truncating division; one map-side-combining
    aggregation."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat", "lang"]
    )
    return spatial.point_dispersion(pages, "lang")


def q_spatial_eps_clusters(spark, sf_dir):
    """Density-connectivity clustering (spatial.eps_clusters): the
    DBSCAN ε-graph (min_pts=1) over ALL page versions — versions of a
    url sit ~0.002° apart by the geocode derivation, so ε=0.01° links
    them into per-url components while cross-url gaps (~10°) stay
    unlinked.  Edges come from the 3×3 neighbor-cell probe (never the
    cross join); labels from min-propagation + pointer jumping.  The
    oracle is the naive quadratic ε-join + recursive-CTE transitive
    closure."""
    pages = _pages(spark, sf_dir)
    pts = pages.select(
        F.concat(
            F.col("url"), F.lit("#"), F.col("version").cast("string")
        ).alias("pid"),
        "lon",
        "lat",
    )
    return spatial.eps_clusters(pts, eps_deg=0.01, id_col="pid",
                                res_deg=0.25)


def q_radius_join(spark, sf_dir):
    """Two-table spatial radius join (spatial.radius_join): latest
    English pages probe latest German pages within 8° (grid res 9°, a
    divisor of 180 — res must be ≥ radius); exact wrapped-lon dist²
    attached.  Oracle is the naive range join."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat"]
    )
    en = pages.where(F.col("lang") == "en").select("url", "lon", "lat")
    de = pages.where(F.col("lang") == "de").select(
        F.col("url").alias("cand_url"), "lon", "lat"
    )
    return spatial.radius_join(en, de, radius_deg=8.0, res_deg=9.0)


def q_hex_rollup(spark, sf_dir):
    """Hex-grid taint rollup (hexgrid.hex_rollup): latest pages
    assigned to pointy-top axial hexes (cube rounding, pure column
    arithmetic — the H3-style half of the north rule's cell story,
    next to the S2-style quad tiles), one map-side-combining groupBy
    on the bigint hex key; exact integer counts + decoded centers.
    The oracle runs the character-identical SQL twin
    (hexgrid.hex_key_sql), so the cube-rounding branches themselves
    are hash-verified."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    return hexgrid.hex_rollup(latest, size_deg=5.0)


def q_polygon_stats(spark, sf_dir):
    """Vector-side polygon geometry (spatial.ring_from_points +
    polygon_stats): one closed ring per lang from its sampled latest
    pages (doc_id-ordered, fixed-point ×1000 vertices — the
    reference's scaled-coordinate convention, osm.rb F13), then exact
    int64 shoelace signed area and the centroid as one float division
    of two exact integer sums.  The shoelace value is well-defined for
    any closed ring, so an arbitrary-ordered ring is a legitimate
    computational-parity target."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    pts = latest.where(F.col("doc_id") % 17 == 0)
    rings = spatial.ring_from_points(pts, id_col="lang", order_col="doc_id")
    return spatial.polygon_stats(rings, id_col="lang")


def q_hex_focal_mean(spark, sf_dir):
    """7-cell focal mean over the hex raster (hexgrid.hex_focal_stats)
    — the hex twin of tile_focal_mean: self + 6 axial neighbors, exact
    integer scaled mean, no wrap/clamp cases (the axial plane is
    unbounded)."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    rollup = hexgrid.hex_rollup(latest, size_deg=5.0)
    return hexgrid.hex_focal_stats(rollup, "n_pages")


def q_extent_overlap(spark, sf_dir):
    """PBSM rect×rect overlap join (spatial.extent_overlap_join):
    every latest page gets a deterministic doc_id-sized bbox around
    its position (planar, unwrapped — the operator's documented
    domain); English extents join overlapping German extents at a 5°
    PBSM grid, deduped by the reference-point rule (no distinct), the
    exact intersection box attached.  Oracle is the naive O(n²)
    overlap predicate join."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    w = (F.pmod(F.col("doc_id"), F.lit(97)) + 1).cast("double") / F.lit(10.0)
    h = (F.pmod(F.col("doc_id") * 7, F.lit(89)) + 1).cast("double") / F.lit(10.0)
    boxes = latest.select(
        "url", "lang",
        (F.col("lon") - w).alias("lon_min"),
        (F.col("lon") + w).alias("lon_max"),
        (F.col("lat") - h).alias("lat_min"),
        (F.col("lat") + h).alias("lat_max"),
    )
    a = boxes.where(F.col("lang") == "en").select(
        F.col("url").alias("url_a"),
        "lon_min", "lon_max", "lat_min", "lat_max",
    )
    b = boxes.where(F.col("lang") == "de").select(
        F.col("url").alias("url_b"),
        "lon_min", "lon_max", "lat_min", "lat_max",
    )
    out = spatial.extent_overlap_join(
        a, b, res_deg=5.0, id_a="url_a", id_b="url_b"
    )
    return out.select(
        "url_a", "url_b",
        F.round("inter_lon_min", 6).alias("ilon_min"),
        F.round("inter_lon_max", 6).alias("ilon_max"),
        F.round("inter_lat_min", 6).alias("ilat_min"),
        F.round("inter_lat_max", 6).alias("ilat_max"),
    )


def _lang_segments(spark, sf_dir):
    """Shared corpus for the line-layer entries: per-lang polylines
    over latest pages in doc_id order (LEAD window) — long random
    great-room segments, so crossings and lengths are non-trivial."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    wl = W.partitionBy("lang").orderBy("doc_id")
    return (
        latest.select(
            "url", "lang", "doc_id",
            F.col("lon").alias("lon1"),
            F.col("lat").alias("lat1"),
            F.lead("lon").over(wl).alias("lon2"),
            F.lead("lat").over(wl).alias("lat2"),
        )
        .where(F.col("lon2").isNotNull())
    )


def q_segments_crossing(spark, sf_dir):
    """Segment×segment proper-crossing join
    (spatial.segment_crossing_join): English-polyline segments vs
    German-polyline segments on a 30° PBSM grid, EXACT ×10⁴
    fixed-point orientation predicate (sign tests on int64 cross
    determinants — no float epsilon anywhere), reference-point
    dedup, rational crossing point.  Oracle is the naive O(n²) join
    with the identical integer predicate."""
    segs = _lang_segments(spark, sf_dir)
    a = segs.where(F.col("lang") == "en").select(
        F.col("url").alias("url_a"), "lon1", "lat1", "lon2", "lat2"
    )
    b = segs.where(F.col("lang") == "de").select(
        F.col("url").alias("url_b"), "lon1", "lat1", "lon2", "lat2"
    )
    out = spatial.segment_crossing_join(
        a, b, res_deg=30.0, id_a="url_a", id_b="url_b", max_cells=128
    )
    return out.select(
        "url_a", "url_b",
        F.round("ix", 6).alias("ix"),
        F.round("iy", 6).alias("iy"),
    )


def q_polyline_length(spark, sf_dir):
    """Per-lang great-circle polyline length
    (spatial.polyline_length): latest pages in doc_id order as one
    track per lang, haversine per segment, summed as exact integer
    micro-km (order-free under any parallelism), one division at the
    end.  Oracle is the identical formula over a LAG window."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    out = spatial.polyline_length(latest, id_col="lang", order_col="doc_id")
    return out.select(
        "lang", "n_segments", F.round("length_km", 6).alias("length_km")
    )


# one-pass Visvalingam threshold for q_simplify_lines, in the
# operator's (10⁻⁴ °)² doubled-area units: the per-lang doc-ordered
# tracks hop ~10⁴–10⁵ scaled units between consecutive docs (the
# arithmetic geocode is near-linear in doc_id), putting the measured
# area2 median at ~1.4·10¹⁰ — this cut keeps/drops roughly half, so
# both branches stay populated at every sf
SIMPLIFY_MIN_AREA2 = 15_000_000_000


def q_simplify_lines(spark, sf_dir):
    """One-pass Visvalingam simplification (spatial.simplify_lines)
    over the per-lang doc-ordered tracks (the polyline_length layer):
    exact scaled-int effective areas, endpoint rule, survivor
    renumbering — all inside ONE line-keyed shuffle.  Oracle is the
    identical windowed cross product in DuckDB."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    return spatial.simplify_lines(
        latest, id_col="lang", order_col="doc_id",
        min_area2=SIMPLIFY_MIN_AREA2,
    )


def q_od_flows(spark, sf_dir):
    """Origin-destination flow matrix (spatial.od_flows) over the
    per-lang doc-ordered tracks at 4°: one LAG window + one pair
    groupBy; self-flows kept and flagged."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    return spatial.od_flows(latest, id_col="lang", order_col="doc_id")


def q_huff(spark, sf_dir):
    """Huff gravity market shares (spatial.huff_shares): the top-20
    densest 4° cells act as service sites (attractiveness = their
    page count) and every latest page splits its patronage across
    in-radius sites by attractiveness over exact squared distance —
    the demand-allocation layer between knn's winner-take-all and
    od_gravity's after-the-fact scoring.  β = 2 exactly (integer
    d², no float powers); utilities ride decimal with u_scale ≥
    radius² so the denominator provably never floors to zero;
    out-of-radius mass is truncated visibly via n_sites."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["doc_id", "lon", "lat"]
    )
    pts = latest.select("doc_id", "lon", "lat")
    cx = F.floor(F.col("lon") / 4).cast("bigint")
    cy = F.floor(F.col("lat") / 4).cast("bigint")
    sites = (
        latest.groupBy(cx.alias("_cx"), cy.alias("_cy"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("attract"))
        .orderBy(F.desc("attract"), "_cy", "_cx")
        .limit(20)
        .select(
            ((F.col("_cy") + 90) * 1000 + F.col("_cx") + 180)
            .alias("site_id"),
            (F.col("_cx") * 4 + F.lit(2.0)).alias("lon"),
            (F.col("_cy") * 4 + F.lit(2.0)).alias("lat"),
            "attract",
        )
    )
    return spatial.huff_shares(pts, sites, 4.0)


def q_ipf_balance(spark, sf_dir):
    """IPF / RAS balancing (spatial.ipf_balance): project one OD
    matrix onto another period's margins — seed = the even-doc
    half's per-lang track flows at 4°, targets = the odd half's
    out/in margins; 6 quantized floor half-rounds keep the seed's
    interaction pattern while matching the new totals (the
    Deming–Stephan trip-table update, the third member of the OD
    family).  Structural zeros stay zero, absent targets empty a
    row/column loudly-by-design; the oracle unrolls the identical
    half-rounds, so every balanced cell hash-verifies."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    even = latest.where(F.col("doc_id") % 2 == 0)
    odd = latest.where(F.col("doc_id") % 2 == 1)
    seed = spatial.od_flows(even, id_col="lang", order_col="doc_id")
    tgt = spatial.od_flows(odd, id_col="lang", order_col="doc_id")
    rt = tgt.groupBy("cell_from").agg(
        F.sum("n_flows").cast("bigint").alias("target")
    )
    ct = tgt.groupBy("cell_to").agg(
        F.sum("n_flows").cast("bigint").alias("target")
    )
    return spatial.ipf_balance(seed, rt, ct, rounds=6)


def q_od_gravity(spark, sf_dir):
    """Gravity-model OD residuals (spatial.od_gravity_residuals) over
    the od_flows matrix: (n·total·10⁶) DIV (out_o·in_d) in
    decimal(38)/HUGEINT — which links flow hotter than their endpoint
    marginals predict; the flow-matrix sibling of the collocations
    PMI score."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    flows = spatial.od_flows(latest, id_col="lang", order_col="doc_id")
    return spatial.od_gravity_residuals(flows.select(
        "cell_from", "cell_to", "n_flows"
    ))


def q_collocations(spark, sf_dir):
    """PMI-monotone collocation mining (textops.collocations): exact
    integer association scores over adjacent token pairs, min_count
    small-sample guard, decimal(38)/HUGEINT wide product."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.collocations(docs, min_count=3)


_GAZETTEER = [
    "hash value", "table part", "row scan", "fast merge batch",
    "sort table window", "big table", "hash", "window", "table",
]


def q_gazetteer_tag(spark, sf_dir):
    """Dictionary phrase tagging (textops.gazetteer_tag): multi-token
    gazetteer occurrences via one broadcast token join +
    COUNT(DISTINCT idx) full-match vote, maximal-occurrence
    suppression (unigram 'table' inside 'big table' is dropped, that
    drop being live in this fixture — the gazetteer mixes unigrams
    with their covering bigrams/trigrams) as an order-free containment
    anti-join."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.gazetteer_tag(docs, _GAZETTEER)


def q_segment_cells_rollup(spark, sf_dir):
    """Supercover segment→tile rollup (spatial.segment_cells): every
    5° grid cell each per-lang polyline segment TOUCHES — the rigorous
    way→region assignment (run_candidates.rb assigns ways to regions
    via node tiles; long segments also cross node-free tiles, which
    the supercover emits) — counted per cell.  Exact ×10⁴ fixed-point
    column sweep with rational row brackets; the oracle runs the
    character-identical integer arithmetic through two
    generate_series explodes."""
    segs = _lang_segments(spark, sf_dir).select(
        F.col("url").alias("seg_id"), "lon1", "lat1", "lon2", "lat2"
    )
    cells = spatial.segment_cells(segs, res_deg=5.0, id_col="seg_id")
    return cells.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("n_segments")
    )


def q_geohash_rollup(spark, sf_dir):
    """Taint rollup keyed by base-32 geohash (spatial.geohash, p=3 —
    the odd-bit-count path: lon gets the extra bit): the third cell
    encoding next to the Morton quad tiles and the axial hexes, with
    the prefix property making the string a hierarchical clustering
    key.  Oracle runs the character-identical SQL twin
    (spatial.geohash_sql), so the bit-spread cascade and base-32
    digit slicing are hash-verified."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    return (
        latest.groupBy(
            spatial.geohash(F.col("lon"), F.col("lat"), 3).alias("geohash")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(~F.col("accepted"), 1).otherwise(0))
            .cast("bigint").alias("n_tainted"),
        )
    )


def q_quadkey_rollup(spark, sf_dir):
    """Taint rollup keyed by level-5 Bing-style quadkey
    (spatial.quadkey) — the Morton id re-expressed as a prefix-coded
    string (one bit pair per digit, MSB first; y from the south pole
    per the reference's tile scheme).  Oracle slices the identical
    digits out of quad_tile_sql."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    return (
        latest.groupBy(
            spatial.quadkey(F.col("lon"), F.col("lat"), 5).alias("quadkey")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(~F.col("accepted"), 1).otherwise(0))
            .cast("bigint").alias("n_tainted"),
        )
    )


def q_hilbert_rollup(spark, sf_dir):
    """Taint rollup keyed by the order-8 Hilbert cell id
    (operators/hilbert.py) — the locality-optimal curve next to the
    Morton quad tiles: consecutive ids are edge-adjacent cells, so the
    range-partitioned write layout (hilbert.cluster_by_hilbert) owns
    connected blobs instead of Z seams.  The oracle runs the
    nested-subquery DuckDB twin generated from the SAME DFA tables
    (hilbert.hilbert_sql), hash-verifying all 8 lookup levels."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    return (
        hilbert.with_hilbert(latest, order=8)
        .groupBy("hcell")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(~F.col("accepted"), 1).otherwise(0))
            .cast("bigint").alias("n_tainted"),
        )
    )


# snapshot cutoffs for q_snapshot_diff: A catches doc_ids ≤ 250 with
# version 1 only for doc 250 (its +90 s lands between v1 at +60 and v2
# at +120), so at any sf ≥ 0.001 the diff exercises added (docs > 250),
# changed (doc 250 when it has >1 version), removed (invisible-latest
# docs ≤ 250), and unchanged.
SNAPSHOT_EPOCH_A = pages_src.EPOCH_2024 + 250 * 3600 + 90
SNAPSHOT_EPOCH_B = pages_src.EPOCH_2024 + 10**9


def q_snapshot_diff(spark, sf_dir):
    """Corpus snapshot diff (operators/snapshots.py): the reference's
    version diff lifted to crawl-snapshot granularity — current_*
    as-of-timestamp states (extract_loader.rb:320-360) compared in ONE
    hash aggregation (two conditional max(struct) aggregates, map-side
    combined; no self-join, no second shuffle).  Oracle runs the same
    conditional-struct-max in DuckDB."""
    return snapshots.snapshot_diff(
        _pages(spark, sf_dir), SNAPSHOT_EPOCH_A, SNAPSHOT_EPOCH_B
    )


def q_cdc_apply(spark, sf_dir):
    """CDC compaction (snapshots.cdc_apply): the version-1 captures as
    the base snapshot, later versions as the change stream (seq =
    version; an invisible capture is a delete) — one union + one
    max_by-struct aggregation, never a join; duplicate log positions
    fail loud.  The MERGE INTO primitive of the incremental story."""
    pages = _pages(spark, sf_dir)
    base = pages.where(F.col("version") == 1).select(
        "url", "lon", "lat", "visible"
    )
    changes = pages.where(F.col("version") >= 2).select(
        "url",
        F.col("version").cast("bigint").alias("seq"),
        F.when(F.col("visible"), F.lit("upsert"))
        .otherwise(F.lit("delete")).alias("op"),
        "lon", "lat", "visible",
    )
    return snapshots.cdc_apply(base, changes)


def q_scd2_history(spark, sf_dir):
    """SCD2 validity-interval table (snapshots.scd2_history): per url,
    one row per consecutive distinct (lon, lat, visible) state with
    half-open [valid_from, valid_to) epochs — unchanged recrawls
    collapse (null-safe struct equality), valid_to chains from the
    next change, one keyed window shuffle end-to-end.  The
    materialized all-as-of-queries answer beside snapshot_diff's
    single A→B question."""
    return snapshots.scd2_history(_pages(spark, sf_dir))


def q_spatial_dbscan(spark, sf_dir):
    """Full DBSCAN (spatial.dbscan) over all page versions at ε=0.01°,
    min_pts=3: urls with ≥3 versions form all-core clusters, 2-version
    urls and singletons are noise (no border points arise on this
    corpus — the unit tests plant them).  Oracle replays core/border/
    noise + the recursive closure over core-core edges."""
    pages = _pages(spark, sf_dir)
    pts = pages.select(
        F.concat(
            F.col("url"), F.lit("#"), F.col("version").cast("string")
        ).alias("pid"),
        "lon",
        "lat",
    )
    return spatial.dbscan(pts, eps_deg=0.01, min_pts=3, id_col="pid",
                          res_deg=0.25)


def q_tile_rollup(spark, sf_dir):
    """Raster rollup: per-cell page count + taint density."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    return spatial.tile_rollup(cells)


def q_raster_viewshed(spark, sf_dir):
    """8-ray viewshed (spatial.raster_viewshed) from the three
    densest cells of the page raster: the classic DEM line-of-sight
    sweep with n_pages as the height field — max-slope-along-ray as
    a once-quantized integer ordinal (the diagonal √2 cancels within
    a ray), strict running-max visibility, pole clamp + lon wrap.
    |observers|·8·radius probe rows, one broadcast height join, one
    keyed window."""
    cells = spatial.assign_cells(_pages(spark, sf_dir))
    raster = cells.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages")
    )
    observers = (
        raster.orderBy(F.desc("n_pages"), "cell").limit(3)
        .select("cell")
    )
    return spatial.raster_viewshed(raster, observers, radius=10)


def q_tile_focal_mean(spark, sf_dir):
    """3×3 focal mean over the tile_rollup raster
    (spatial.tile_focal_stats): neighborhood page-count smoothing on
    the AGGREGATE (|cells| rows fan out ×9, never the point table);
    wrap/clamp topology derived from the cell id by integer div/mod.
    Oracle replays the fan-out arithmetic in SQL."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.tile_focal_stats(rollup, "n_pages")


def q_tile_hotspots(spark, sf_dir):
    """Getis-Ord Gi* hot/cold-spot flags over the tile_rollup raster
    (spatial.tile_hotspots): the z≥2 significance test evaluated as an
    exact cross-multiplied integer inequality (decimal(38,0) on Spark,
    HUGEINT in the DuckDB twin) — no float z, no sqrt, hash-stable."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.tile_hotspots(rollup, "n_pages")


def q_tile_majority(spark, sf_dir):
    """3×3 majority filter (spatial.tile_majority) over a 3-class
    density classification of the tile_rollup raster — categorical
    salt-and-pepper cleanup (an isolated 'dense' tile inside a
    'sparse' field re-labels), ties to the smallest class; same
    wrap/clamp id-algebra topology and non-dilating support contract
    as the focal kit, everything |cells|-bounded."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    classed = rollup.select(
        "cell",
        F.when(F.col("n_pages") >= 20, "dense")
        .when(F.col("n_pages") >= 5, "mid")
        .otherwise("sparse").alias("density"),
    )
    return spatial.tile_majority(classed, "density")


def q_tile_trend(spark, sf_dir):
    """Mann-Kendall per-cell activity trend (spatial.tile_trend) over
    the version axis — rank-based S in pure integers, zero-densified
    bins, the 'emerging hotspot' temporal half next to tile_hotspots."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged)
    return spatial.tile_trend(
        cells.select("cell", "version"), time_col="version", n_bins=4
    )


def q_morans_i(spark, sf_dir):
    """Global Moran's I (spatial.morans_i) of page intensity over the
    tile_rollup raster — the interval-valued sibling of
    tile_join_counts (same queen adjacency, numeric values instead of
    a binary color): N-scaled integer deviations, directed pair sum,
    and the (N·num·10⁶) DIV (W·den) ratio evaluated in
    decimal(38,0)/HUGEINT with identical truncation — one fully
    hash-verified row."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.morans_i(rollup, "n_pages")


def q_gearys_c(spark, sf_dir):
    """Global Geary's C (spatial.gearys_c) of page intensity over the
    SAME tile_rollup raster as q_morans_i — the squared-difference
    companion statistic: Moran correlates deviations (covariance-like,
    a few extreme cells dominate), Geary sums raw neighbor squared
    differences, so local roughness that I smooths over moves C.  No
    mean enters the numerator at all; the denominator's N-scaled
    deviations re-inject N² into ((N−1)·N²·num·10⁶) DIV (2W·den),
    evaluated in decimal(38,0)/HUGEINT with identical truncation —
    one fully hash-verified row."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.gearys_c(rollup, "n_pages")


def q_raster_aspect(spark, sf_dir):
    """Slope + D8 downhill aspect (spatial.raster_aspect) of the page-
    intensity surface — the vector field flow_accum routes over, as a
    first-class raster derivative: central-difference rook gradients
    with zero-fill edges and lon wrap, exact squared magnitude (no
    sqrt), and the integer D8-dominant aspect rule (strict |g| axis
    win, exact tie → diagonal, both gradients 0 → flat).  Every
    gradient and label hash-verifies against the identical fan in
    SQL."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.raster_aspect(rollup, "n_pages")


def q_raster_hillshade(spark, sf_dir):
    """Analytic hillshade (spatial.raster_hillshade) of the page-
    intensity surface — the cartographic readout of the terrain
    family: cosine of the angle between the surface normal (from
    raster_aspect's exact central-difference gradients) and the
    frozen 315°/45° light vector, as sign(n·L)·isqrt((n·L)²·10¹²
    DIV (|n|²·|L|²)) — no trig, no float normalization, the
    declared-constant + exact-isqrt discipline, so every shade value
    hash-verifies against the twin that nests the identical aspect
    CTEs (the composition itself is verified)."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.raster_hillshade(rollup, "n_pages", z_scale=2)


def q_ripley_k(spark, sf_dir):
    """Ripley's K pair counts (spatial.ripley_k_counts) over the
    latest page positions at 0.25°/0.5°/1°/2° radii — the multi-scale
    clustering statistic: ONE pair sweep at the largest radius via the
    3×3 probe (exactly-once by home cell + id order), every band
    aggregated from the same stream with conditional counts.  Oracle
    is the naive O(n²) pair join."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat"]
    )
    return spatial.ripley_k_counts(
        latest, [250_000, 500_000, 1_000_000, 2_000_000],
        id_col="url", res_deg=2.0,
    )


def q_semivariogram(spark, sf_dir):
    """Empirical semivariogram (spatial.semivariogram_counts) of the
    page-intensity surface — the VALUE-field companion of q_ripley_k:
    per distance band the exact pair count and integer Σ(vᵢ−vⱼ)² over
    cell-center points valued by n_pages, ONE pair sweep at the
    largest band edge via the 3×3 probe, every band aggregated from
    the same stream.  γ̂(h) = Σ/(2n) is the analyst's one division.
    Oracle is the naive O(n²) pair join over the same rollup."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    lon_c, lat_c = spatial.grid_cell_center("cell")
    pts = rollup.select(
        "cell", lon_c.alias("lon"), lat_c.alias("lat"), "n_pages"
    )
    return spatial.semivariogram_counts(
        pts, [500_000, 1_000_000, 2_000_000], "n_pages",
        id_col="cell", res_deg=2.0,
    )


def q_semivariogram_directional(spark, sf_dir):
    """Anisotropic semivariogram
    (spatial.semivariogram_directional): q_semivariogram's pair sweep
    decomposed into four exact-boundary 45° axial sectors (named by
    angular range — exact |Δlat|-vs-Δlon comparisons instead of the
    irrational tan 22.5° tolerance; signed shortest-arc Δlon keeps
    sectors wrap-correct) — does the page-intensity field decorrelate
    faster across the grid's axes than along them?  Densified: every
    (band, sector) emits a row."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    lon_c, lat_c = spatial.grid_cell_center("cell")
    pts = rollup.select(
        "cell", lon_c.alias("lon"), lat_c.alias("lat"), "n_pages"
    )
    return spatial.semivariogram_directional(
        pts, [500_000, 1_000_000, 2_000_000], "n_pages",
        id_col="cell", res_deg=2.0,
    )


def q_ab_test(spark, sf_dir):
    """Exact 2×2 chi-square per event type (evaluation.chi2_2x2):
    split users into deterministic A/B halves (user_id parity) and
    test whether high-value events (value ≥ 10) occur at different
    rates — the N-cleared rational χ² in decimal/HUGEINT, with the
    cross-multiplied α=0.05 significance flag.  One contingency
    aggregation, no joins."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return evaluation.chi2_2x2(
        events.select(
            "event_type",
            (F.col("user_id") % 2 == 1).alias("is_b"),
            (F.col("value") >= 10.0).alias("ok"),
        ),
        "event_type",
        "is_b",
        "ok",
    )


def q_basin_label(spark, sf_dir):
    """Watershed basins (spatial.basin_label) over the page raster as
    a terrain surface: D8 steepest-descent pointers collapse onto
    their terminal sinks by pointer-DOUBLING (⌈log₂L⌉ rounds, one
    self-join each); the oracle walks every path one hop at a time
    with a recursive CTE, so the doubling shortcut itself is
    hash-verified.  Output labels each cell with its drainage pit and
    basin size."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.basin_label(rollup, "n_pages")


def q_kn_score(spark, sf_dir):
    """LM-fit document scoring (textops.kn_score_docs) — the CCNet
    move with exact integers: train the interpolated KN bigram model
    on the even-doc_id half of the corpus, score the odd half; one
    closed form covers seen bigrams (reproducing p_kn_ppm exactly)
    and in-vocab unseen bigrams (the c=0 backoff mass); OOV counted,
    never guessed.  Oracle chains the model twin into the scoring
    twin."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.where(F.col("doc_id") % 2 == 0)
    test = docs.where(F.col("doc_id") % 2 == 1)
    model = textops.kn_bigram_model(train, min_count=1)
    return textops.kn_score_docs(test, model)


def q_negative_samples(spark, sf_dir):
    """Deterministic negative-edge sampling
    (graph.negative_edge_samples) over the doc link graph — the
    link-prediction training-pair generator: hash-probed non-edges
    via the exact two-level dense rank (never a global window),
    anti-joined against observed edges, earliest-probe dedup, top-k
    per source.  The oracle rebuilds the same samples from a plain
    global-window rank, hash-verifying the two-level construction."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    return graph.negative_edge_samples(nodes, edges, k=3, n_probes=12)


def q_bivariate_morans(spark, sf_dir):
    """Bivariate local Moran's I (spatial.bivariate_morans): does
    TAINT intensity here co-locate with CRAWL density next door —
    the cross-variable LISA over the page raster, X = n_tainted,
    Y = n_pages, Moran-scatterplot-slope normalization (Σdx², no
    sqrt), exact decimal/HUGEINT arithmetic, deterministic
    HH/LL/HL/LH/M0 quadrants."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select(
        "cell", "n_tainted", "n_pages"
    )
    return spatial.bivariate_morans(rollup, "n_tainted", "n_pages")


def q_mad_outliers(spark, sf_dir):
    """Robust per-language document-length outlier flags
    (profile.mad_outliers): exact nearest-rank median + MAD with the
    cross-multiplied 3.5-MAD test — the heavy-tail-safe curation
    filter (a single 100 MB page can't move a median).  Group-keyed
    window passes only, decimal/HUGEINT products."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return profile_mod.mad_outliers(docs, "lang", "doc_id", "n_chars")


def q_image_equalize(spark, sf_dir):
    """Exact histogram-equalization LUT rows
    (multimodal.image_equalize) over the deterministic raw-RGB
    images: per present gray level (channel-sum luma) the pixel
    count, running CDF, and the truncating-DIV equalized level.  The
    oracle regenerates every pixel arithmetically and replays the
    same integer formula — decode, histogram, and rescale are all
    hash-verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_equalize(media)


def q_hist_emd(spark, sf_dir):
    """Perceptual near-duplicate image pairs by exact 1-D earth-mover
    distance over ppm-quantized luma histograms
    (multimodal.hist_emd_pairs): band join on width-T mean buckets
    (complete because |Σ prefix diffs| ≤ Σ|prefix diffs| = emd), the
    twin running UNFILTERED all-pairs over the regenerated pixel
    closed form — parity proves the prefilter dropped nothing."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.hist_emd_pairs(media, n_bins=16,
                                     max_emd_ppm=300_000)


def q_image_otsu(spark, sf_dir):
    """Exact Otsu binarization threshold (multimodal.image_otsu):
    per-image argmax of the integer between-class objective
    (sumB·W − S·wB)²/(wB·(W−wB)) over present gray levels, ranked by
    the identically-quantized num·2²⁰ DIV den score with the
    lowest-threshold tie-break — bit-stable across engines and
    parallelism.  The oracle regenerates every pixel and replays
    prefix masses as window sums, so decode, score, and argmax all
    hash-verify."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_otsu(media)


AUDIO_TEMPO_ARGS = dict(
    n=12, n_samples=8192, burst=256, frame_samples=256,
    levels=3, lag_min=2, lag_max=8, flux_shift=20,
)


def q_audio_tempo(spark, sf_dir):
    """Tempo induction (multimodal.audio_tempo): the autocorrelation
    argmax of the spectral-flux envelope over a declared lag band —
    the periodicity readout that completes the audio ladder (energy
    → Haar bands → onsets → period).  The gated PCM synth repeats
    its loud/quiet pattern every 3 frames, and every clip's detected
    period is exactly 3; the declared flux-quantization shift keeps
    every product-sum in int64, and the (R desc, k asc) tie rule
    picks the fundamental over its harmonics.  The oracle replays
    every sample through the haar twin's ±1 grouped sums and the
    identical lag self-join."""
    from openstreetmap_license_change_spark.operators import multimodal

    a = AUDIO_TEMPO_ARGS
    media = multimodal.synthetic_gated_pcm_media(
        spark, n=a["n"], n_samples=a["n_samples"], burst=a["burst"]
    )
    return multimodal.audio_tempo(
        media, frame_samples=a["frame_samples"], levels=a["levels"],
        lag_min=a["lag_min"], lag_max=a["lag_max"],
        flux_shift=a["flux_shift"],
    )


def q_image_moments(spark, sf_dir):
    """Exact image moments (multimodal.image_moments): centroid in
    micro-pixels, M00²-cleared central second moments, the sqrt-free
    eigenvalue anisotropy ((λmax−λmin)²/(λmax+λmin)² as one exact
    ppm ratio — the dispersion_ellipse algebra on pixel mass) and
    the D8-sector principal-axis orientation in 2θ space, all pure
    integer arithmetic behind the raw-RGB Arrow decode.  The oracle
    regenerates every pixel from the synthetic closed form and
    aggregates the same HUGEINT sums, so decode, clearing, and
    sector rule hash-verify."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_moments(media)


MASK_N, MASK_W, MASK_H = 16, 48, 32

_MASK_FGPX_SQL = f"""(
    SELECT m.range AS mask_id,
           y.range * {MASK_W} + x.range AS px
    FROM range({MASK_N}) m, range({MASK_H}) y, range({MASK_W}) x
    WHERE (x.range * 3 + y.range * 7 + m.range * 13) % 256 < 96
)"""


def q_mask_rle(spark, sf_dir):
    """COCO-style RLE of the deterministic binary masks
    (multimodal.mask_rle_encode): row-major flat foreground runs via
    a vectorized np.diff transition scan in mapInPandas — shuffle-
    free.  The oracle regenerates the foreground pixel SET from the
    closed form and rebuilds runs with gaps-and-islands (a different
    derivation), so the transition scan itself hash-verifies."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_masks(
        spark, n=MASK_N, w=MASK_W, h=MASK_H
    )
    return multimodal.mask_rle_encode(media)


def q_mask_iou(spark, sf_dir):
    """Pairwise mask IoU over the RLE runs
    (multimodal.mask_iou_pairs): interval-algebra intersection on a
    block equi-join with the owner-bucket dedupe — never an all-pairs
    conditional join, never re-materialized pixels.  The oracle is
    pixel-level (offset self-join on the closed-form foreground set),
    a different algorithm family, so the run-overlap arithmetic is
    what gets verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_masks(
        spark, n=MASK_N, w=MASK_W, h=MASK_H
    )
    runs = multimodal.mask_rle_encode(media)
    return multimodal.mask_iou_pairs(runs, bucket=256)


def q_mask_components(spark, sf_dir):
    """Blob extraction (multimodal.mask_components): 4-connectivity
    connected components of the deterministic masks straight from
    their RLE runs — row-segment split by bounded explode, interval-
    residual adjacency join, shared min-label pointer-jumping kit;
    areas/bboxes per component without re-materializing pixels.  The
    oracle walks a recursive ONE-HOP closure over per-row
    gaps-and-islands segments from the closed-form pixel set — a
    different algorithm family, so the pointer doubling is what gets
    hash-verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_masks(
        spark, n=MASK_N, w=MASK_W, h=MASK_H
    )
    runs = multimodal.mask_rle_encode(media)
    return multimodal.mask_components(
        runs, width=MASK_W, height=MASK_H
    )


def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (textops.rake_keywords): per-document
    top-3 keyphrases by the exact deg/freq ppm score — stopword/
    punctuation-broken candidate runs via the gaps-and-islands trick,
    document-keyed windows throughout, total-order tie-break."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textops.rake_keywords(docs, k=3)


def q_blocking_eval(spark, sf_dir):
    """Blocking quality (evaluation.blocking_eval) of the repo's own
    MinHash-LSH candidate generator against exact-duplicate truth
    (md5 text clusters): pair completeness (did LSH keep every true
    duplicate pair) and reduction ratio (how much of the C(n,2)
    quadratic it avoided), both exact ppm — the dedup pipeline's
    recall/efficiency report card, closing the loop on
    minhash_lsh_pairs exactly as langid_eval closes lang_id."""
    docs = pages_src.documents(spark, sf_dir)
    cand = dedup.minhash_lsh_pairs(docs)
    keyed = docs.select(F.md5("text").alias("k"), "doc_id")
    other = keyed.select(
        F.col("k").alias("k2"), F.col("doc_id").alias("doc_b")
    )
    truth = keyed.join(
        other,
        (F.col("k") == F.col("k2")) & (F.col("doc_id") < F.col("doc_b")),
    ).select(F.col("doc_id").alias("doc_a"), "doc_b")
    return evaluation.blocking_eval(cand, truth, docs)


def q_topic_gaps(spark, sf_dir):
    """TextTiling-style topic-shift gaps (textops.topic_gaps): exact
    vocabulary Jaccard between adjacent 20-token blocks per document,
    flat-threshold boundary flags — the semantic-chunking signal;
    everything doc-keyed, tail blocks at true size."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textops.topic_gaps(docs, block_size=20,
                              threshold_ppm=100_000)


def q_langid_eval(spark, sf_dir):
    """Per-class precision/recall/F1 (evaluation.confusion_metrics)
    of the in-repo stopword-vote language id against the labeled
    lang column — the report card closing the loop on q_lang_id's
    confusion matrix; F1 cleared to ONE truncating division
    (2tp/(2tp+fp+fn)), invented classes ('und') kept with NULL
    recall."""
    docs = pages_src.documents(spark, sf_dir)
    confusion = textops.lang_id(docs).groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return evaluation.confusion_metrics(
        confusion, "lang", "lang_pred", "n_docs"
    )


def q_cover_filter(spark, sf_dir):
    """Cover-membership filter (spatial.filter_by_cover): latest page
    positions semi-joined against a MIXED-resolution region of
    interest (dense res-5 neighborhoods + selected res-7 singles)
    without uncompacting — bounded ancestor fan + one broadcast
    equi-join.  The oracle decides membership with the structurally
    different EXISTS prefix-shift predicate."""
    pages = _pages(spark, sf_dir)
    latest = lineage.latest_version(pages, cols=["lon", "lat"])
    pts = latest.select(
        "url",
        spatial.hier_cell(F.col("lon"), F.col("lat"), 7).alias("cell"),
    )
    cells7 = pages.select(
        spatial.hier_cell(F.col("lon"), F.col("lat"), 7).alias("cell")
    )
    rollup = cells7.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    dense5 = (
        rollup.where(F.col("n") >= 3)
        .select(spatial.cell_parent(F.col("cell"), 5, 7).alias("cell"))
        .distinct()
    )
    singles7 = rollup.where(F.col("n") == 2).select("cell")
    cover = dense5.unionByName(singles7)
    return spatial.filter_by_cover(pts, cover, 7)


def q_auc_eval(spark, sf_dir):
    """Exact tie-corrected ROC-AUC (evaluation.roc_auc) of document
    length as a predictor of digit-bearing documents, per language —
    the quality-classifier evaluation op: Mann–Whitney doubled-rank
    integer form over distinct scores (never a pair join), degenerate
    groups NULL, decimal(38)/HUGEINT wide terms."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        "lang",
        F.col("n_chars").cast("bigint").alias("score"),
        F.col("text").rlike("[0-9]").alias("label"),
    )
    return evaluation.roc_auc(scored, "lang", "score", "label")


def q_annotator_kappa(spark, sf_dir):
    """Exact Cohen's kappa (evaluation.cohen_kappa) between two
    deterministic annotators of document keep/drop decisions per
    language — the labeling-QA op: annotator A thresholds n_chars at
    300, annotator B applies a doc_id-keyed perturbation before the
    same threshold (a reproducible 'noisy second rater').  N-cleared
    contingency closed form, sign-decomposed truncating division."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.select(
        "lang",
        F.when(F.col("n_chars") >= 300, "keep").otherwise("drop")
        .alias("la"),
        F.when(
            F.col("n_chars") + (F.col("doc_id") * 37) % 120 - 60 >= 300,
            "keep",
        ).otherwise("drop").alias("lb"),
    )
    return evaluation.cohen_kappa(labeled, "lang", "la", "lb")


def q_cell_compact(spark, sf_dir):
    """H3-style cover compaction (spatial.compact_cells): build the
    crawl's cell cover — dense res-5 neighborhoods expanded to res 7
    via uncompact_cells (complete 4²-blocks by construction) plus
    sparse res-7 singles — then compact it back to the minimal
    mixed-resolution set.  Spark runs the bottom-up 4-sibling promote
    loop (per-level shuffle shrinking 4×); the oracle computes the
    structurally different closed form (maximal complete ancestors),
    so the loop's equivalence to the definition is hash-verified."""
    pages = _pages(spark, sf_dir)
    cells7 = pages.select(
        spatial.hier_cell(F.col("lon"), F.col("lat"), 7).alias("cell")
    )
    rollup = cells7.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    dense5 = (
        rollup.where(F.col("n") >= 3)
        .select(spatial.cell_parent(F.col("cell"), 5, 7).alias("cell"))
        .distinct()
    )
    dense7 = spatial.uncompact_cells(dense5, 7)
    sparse7 = rollup.where(F.col("n") < 3).select("cell")
    cover = dense7.unionByName(sparse7).distinct()
    return spatial.compact_cells(cover, 7)


def q_areal_interp(spark, sf_dir):
    """Areal interpolation (spatial.areal_interp): page bounding boxes
    (the str_leaves deterministic µdeg rects) re-based onto a 15° zone
    grid — each source transfers value·|∩| DIV |src| in exact integer
    µdeg², PBSM integer grid with pole shift (trunc-DIV == floor-//
    structurally), reference-point dedup, loud fan-out guard riding
    the join key.  Oracle is the naive O(n²) overlap join."""
    pages = _pages(spark, sf_dir)
    rid = (F.col("doc_id") * 16 + F.col("version")).cast("bigint")
    base = pages.select(
        rid.alias("src_id"),
        F.floor(F.col("lon") * 1_000_000.0).cast("bigint").alias("_x"),
        F.floor(F.col("lat") * 1_000_000.0).cast("bigint").alias("_y"),
    )
    srcs = base.select(
        "src_id",
        (F.col("_x") - F.col("src_id") % 997).alias("minx"),
        (F.col("_y") - (F.col("src_id") * 3) % 997).alias("miny"),
        (F.col("_x") + (F.col("src_id") * 7) % 997 + 1).alias("maxx"),
        (F.col("_y") + (F.col("src_id") * 11) % 997 + 1).alias("maxy"),
        (F.col("src_id") % 1000 + 1).alias("value"),
    )
    Z = 15_000_000
    tgts = spark.range(0, 288).select(
        F.col("id").alias("tgt_id"),
        ((F.col("id") % 24) * Z - 180_000_000).alias("minx"),
        (F.floor(F.col("id") / 24) * Z - 90_000_000).cast("bigint")
        .alias("miny"),
        ((F.col("id") % 24) * Z - 180_000_000 + Z).alias("maxx"),
        (F.floor(F.col("id") / 24) * Z - 90_000_000 + Z).cast("bigint")
        .alias("maxy"),
    )
    return spatial.areal_interp(srcs, tgts, res_udeg=Z)


def q_rect_union(spark, sf_dir):
    """Dissolved per-language footprint (spatial.rect_union_area):
    every latest page gets a deterministic doc_id-sized µdeg extent
    around its position (the areal_interp layer recipe, scaled up so
    extents genuinely overlap), and the per-language UNION area — not
    the double-counting SUM — is computed by the exact slab sweep +
    gaps-and-islands windows, never inclusion–exclusion and never a
    per-group geometry kernel."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat", "doc_id"]
    )
    base = latest.select(
        "lang",
        F.floor(F.col("lon") * 1_000_000.0).cast("bigint").alias("_x"),
        F.floor(F.col("lat") * 1_000_000.0).cast("bigint").alias("_y"),
        "doc_id",
    )
    rects = base.select(
        "lang",
        (F.col("_x") - (F.col("doc_id") % 9973) * 100).alias("minx"),
        (F.col("_y") - ((F.col("doc_id") * 3) % 9973) * 100).alias("miny"),
        (F.col("_x") + ((F.col("doc_id") * 7) % 9973) * 100 + 1)
        .alias("maxx"),
        (F.col("_y") + ((F.col("doc_id") * 11) % 9973) * 100 + 1)
        .alias("maxy"),
    )
    return spatial.rect_union_area(
        rects, group_col="lang", max_rects_per_group=200_000
    )


def q_flow_accum(spark, sf_dir):
    """D8 flow accumulation (spatial.flow_accumulation) over the page
    raster as a terrain surface: strict-descent steepest-neighbor
    pointers (deterministic smallest-id tie-break), then exact
    upstream-catchment counts via Wyllie pointer jumping with weighted
    carries — O(log L) rounds, localCheckpoint per round.  The oracle
    is the structurally different recursive-CTE path-membership count,
    so the doubling band argument itself is hash-verified."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.flow_accumulation(rollup, "n_pages")


def q_drainage_length(spark, sf_dir):
    """Longest flow path (spatial.drainage_length): the MAX-plus
    member of the D8 trio — Wyllie doubling with a CONSTANT 2ʳ carry
    (each round's pointers span exactly 2ʳ hops, so band delivery
    holds with max in place of sum), O(log L) rounds; the oracle's
    recursive one-hop walk over the same strict-descent pointers is a
    different algorithm family, so the constant-carry induction is
    what gets hash-verified."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.drainage_length(rollup, "n_pages")


def q_local_morans(spark, sf_dir):
    """Local Moran's I (spatial.local_morans) of page intensity —
    Anselin's LISA decomposition of q_morans_i's global statistic:
    per-cell N-scaled deviation, queen-lag, exact
    (N·d·lag·10⁶) DIV Σd² statistic in decimal(38,0)/HUGEINT, and the
    deterministic HH/LL/HL/LH/M0 quadrant label.  Σᵢ dᵢ·lagᵢ equals
    the global directed numerator exactly (tested)."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.local_morans(rollup, "n_pages")


def q_tile_join_counts(spark, sf_dir):
    """Global join-count spatial autocorrelation
    (spatial.tile_join_counts) of the tainted/clean binary raster:
    BB/BW/WW queen-pair counts, each undirected pair once, all
    integers."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select(
        "cell", (F.col("n_tainted") > 0).alias("any_taint")
    )
    return spatial.tile_join_counts(rollup, "any_taint")


def _q_rollup_cells(spark, sf_dir):
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    return spatial.tile_rollup(cells).select("cell")


def q_tile_rollup_incremental(spark, sf_dir):
    """Incremental rollup exactness (spatial.tile_rollup_merge): Spark
    splits pages at version 2 (yesterday's corpus vs the crawl delta),
    rolls each side up independently, and MERGES the aggregates; the
    DuckDB oracle computes the full rollup directly.  Hash equality
    proves merge(rollup(A), rollup(B)) == rollup(A∪B) — the Iceberg
    snapshot-increment contract, driver-verified."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    base = spatial.tile_rollup(cells.where(F.col("version") <= 2))
    delta = spatial.tile_rollup(cells.where(F.col("version") > 2))
    return spatial.tile_rollup_merge(base, delta)


def q_tile_dilate(spark, sf_dir):
    """Raster dilation (spatial.tile_dilate): queen-step buffer of the
    occupied-cell support with source multiplicity — aggregate-only ×9
    fan, wrap/clamp topology."""
    return spatial.tile_dilate(_q_rollup_cells(spark, sf_dir))


KCORE_K = 5


KTRUSS_K = 3


def q_ktruss_links(spark, sf_dir):
    """k-truss extraction (graph.ktruss, k=3): iterative edge peeling
    of the doc link graph to the subgraph where every edge closes a
    triangle among survivors — the edge-level strengthening of kcore
    (spokes of well-connected hubs fall away; what remains is
    community structure).  Per round, support is the Suri–
    Vassilvitskii degree-oriented two-join recomputed on survivors;
    order-independent peel, loud non-convergence.  The twin unrolls
    the identical peel, fixpoint rounds no-ops."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.ktruss(edges, k=KTRUSS_K).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"),
        "support",
    )


def q_kcore(spark, sf_dir):
    """k-core extraction (graph.kcore, k=5): iterative order-
    independent peeling of the undirected doc link graph down to the
    dense core (96/500 docs survive at sf0.001 — real multi-round
    cascades); 2 shuffles/round, empty/fixpoint short-circuit, raises
    on non-convergence.  The DuckDB twin unrolls the same peel
    (fixpoint rounds are no-ops), so the surviving core and its
    degrees are hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    return graph.kcore(nodes, edges, k=KCORE_K).select(
        F.col("node").alias("doc_id"), "degree"
    )


def q_triangle_counts(spark, sf_dir):
    """Per-node triangle counts (graph.triangle_counts) over the
    undirected doc link graph: degree-ordered orientation (each
    triangle counted from one wedge, Suri–Vassilvitskii effective-
    degree bound), wedge self-join + closing semi-join, loud degree
    guard.  The DuckDB twin runs the identical orientation and close,
    hash-verified."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.triangle_counts(edges)


def q_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient (graph.clustering_coeff) over the
    undirected doc link graph — triangle_counts normalized by each
    node's wedge count (2T·10⁶) DIV (deg(deg−1)): the density signal
    that separates link-farm rings (high coeff at high degree) from
    organic hubs (many triangles, near-zero density).  deg < 2 emits
    NULL — undefined, not zero.  The twin reruns the orientation,
    close, and normalization; every row hash-verifies."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.clustering_coeff(edges).select(
        F.col("node").alias("doc_id"), "deg", "n_triangles", "coeff_ppm"
    )


def q_link_components(spark, sf_dir):
    """Connected components (graph.min_label_components) of the
    undirected doc link graph — min-label propagation with pointer
    jumping (label ← label[label]), O(log diameter) rounds, per-round
    lineage cuts, LOUD non-convergence.  The oracle is a DIFFERENT
    algorithm family: DuckDB's recursive one-hop transitive-closure
    walk (graph.components_sql), so the driver hash-verifies the
    doubling shortcut itself rather than replaying it."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.min_label_components(
        nodes.select(F.col("node").alias("id")),
        edges.select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        ),
        max_iters=16,
        op_name="link_components",
    )
    return out.select(F.col("id").alias("doc_id"), "label")


# Redirect map over the documents corpus (the link-graph convention:
# arithmetic-derived so the twin replays it exactly): every doc_id not
# divisible by 5 redirects one step down toward its multiple-of-5
# canonical (chains of length ≤ 4), EXCEPT two planted pathologies per
# 50-id block — doc_id ≡ 3 redirects UP to ≡ 4 (whose base rule points
# back at 3: a 2-cycle redirect loop), and doc_id ≡ 23 redirects into
# that loop (a tail that must inherit the cycle verdict, not hang).
_REDIRECT_EDGES_SQL = """(
    SELECT doc_id AS src,
           CASE WHEN doc_id % 50 = 3  THEN doc_id + 1
                WHEN doc_id % 50 = 23 THEN doc_id - 20
                WHEN doc_id % 5 <> 0  THEN doc_id - 1
           END AS dst
    FROM documents
    WHERE doc_id % 5 <> 0 OR doc_id % 50 = 3 OR doc_id % 50 = 23
)"""


def _redirect_edges(spark, sf_dir):
    docs = pages_src.documents(spark, sf_dir).select("doc_id")
    d = F.col("doc_id")
    return docs.select(
        d.alias("src"),
        F.when(d % 50 == 3, d + 1)
        .when(d % 50 == 23, d - 20)
        .when(d % 5 != 0, d - 1)
        .alias("dst"),
    ).where(F.col("dst").isNotNull())


def q_redirect_resolve(spark, sf_dir):
    """Redirect-chain canonicalization (graph.redirect_resolve):
    pointer doubling with hop accumulation over the functional
    redirect map — ⌈log₂|V|⌉+1 rounds saturate every acyclic chain,
    one self-equi-join per round with per-round lineage cuts; nodes
    that never land on a terminal are redirect LOOPS (canonical/hops
    NULL, is_cycle true) — decided exactly, not by a hop budget.  The
    DuckDB twin walks one hop per recursion step bounded by |V|, so
    the doubling shortcut is hash-verified against the definitional
    walk, including the planted 2-cycle and its feeder tail."""
    docs = pages_src.documents(spark, sf_dir)
    out = graph.redirect_resolve(
        docs.select(F.col("doc_id").alias("id")),
        _redirect_edges(spark, sf_dir),
    )
    return out.select(
        F.col("id").alias("doc_id"), "canonical", "hops", "is_cycle"
    )


def q_scc_components(spark, sf_dir):
    """Strongly connected components (graph.scc_components) of the
    DIRECTED doc link graph — the mutual-reachability structure the
    undirected link_components can't see (link rings vs one-way
    citation tails): forward–backward frontier-only min-label peeling,
    membership decided exactly, both convergence budgets loud.  The
    DuckDB twin is a different algorithm family — the full recursive
    transitive closure joined with its own transpose — so the peeling
    shortcut itself is hash-verified against the mutual-reachability
    definition."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.scc_components(nodes, edges)
    return out.select(F.col("node").alias("doc_id"), "scc", "scc_size")


HITS_ITERATIONS = 4


def q_hits(spark, sf_dir):
    """Quantized-integer HITS hubs & authorities (graph.hits_quantized)
    over the doc link graph — the directional complement of
    q_doc_pagerank: L1-normalized integer iterations, so every score
    is engine-exact and the DuckDB twin (graph.hits_sql) unrolls the
    identical recurrence; all 4 rounds hash-verify."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.hits_quantized(nodes, edges, iterations=HITS_ITERATIONS)
    return out.select(F.col("node").alias("doc_id"), "auth_q", "hub_q")


def q_modularity(spark, sf_dir):
    """Newman modularity of the language partition over the doc link
    graph (graph.modularity): the A²-cleared exact integer form with
    sign-decomposed ppm division — grades whether links concentrate
    within languages against the degree-preserving null model
    (negative q_ppm = a slice SPARSER than chance).  Symmetrize +
    two label joins + three partial aggs; the twin replays the same
    algebra over the shared edge closed form."""
    docs = pages_src.documents(spark, sf_dir)
    _, edges = _doc_link_graph(spark, sf_dir)
    labels = docs.select(
        F.col("doc_id").alias("node"), F.col("lang").alias("label")
    )
    return graph.modularity(labels, edges).select(
        F.col("label").alias("lang"), "n_nodes", "deg_sum", "e_in",
        "q_ppm",
    )


RE_K = 10
RE_QUERIES = 8


def _ranking_runs_qrels(spark, sf_dir):
    """Deterministic synthetic retrieval runs + relevance sets over the
    documents table (the link-graph convention: arithmetic-derived so
    the twin replays them exactly).  Per query q, docs are ranked by
    score = (doc_id·(2q+3) + q) mod 997 ascending (doc_id tiebreak,
    top RE_K), and a doc is relevant iff score < 150 and
    doc_id % 3 != 0 — a planted partial overlap: low-ranked docs are
    mostly relevant but every third doc is a miss, so MRR/MAP/P@k all
    take non-trivial values."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id")
    queries = spark.range(RE_QUERIES).select(
        F.col("id").alias("query_id")
    )
    scored = docs.crossJoin(queries).select(
        "query_id",
        "doc_id",
        (
            (F.col("doc_id") * (F.col("query_id") * 2 + 3)
             + F.col("query_id")) % 997
        ).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy("score", "doc_id")
    runs = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= RE_K)
        .select("query_id", "doc_id", "rank")
    )
    qrels = scored.where(
        (F.col("score") < 150) & (F.col("doc_id") % 3 != 0)
    ).select("query_id", "doc_id")
    return runs, qrels


def q_ranking_eval(spark, sf_dir):
    """Per-query MRR / MAP / P@k / recall@k (evaluation.ranking_eval)
    of the planted synthetic runs against their relevance sets — the
    retrieval report card in exact ppm integers (per-hit truncating
    terms, full-relevant AP denominator); the twin rebuilds runs,
    qrels, and every metric from the same constants."""
    runs, qrels = _ranking_runs_qrels(spark, sf_dir)
    return evaluation.ranking_eval(runs, qrels, k=RE_K)


def q_ndcg_eval(spark, sf_dir):
    """Per-query nDCG@k (evaluation.ndcg_eval) over the same planted
    runs/qrels as q_ranking_eval — the position-discounted metric the
    flat report card lacks, with the irrational log discount frozen
    as DECLARED ppm constants (the Benford-table discipline) so every
    value is exactly rational; IDCG is one prefix-sum array lookup,
    never a join."""
    from openstreetmap_license_change_spark.operators import evaluation

    runs, qrels = _ranking_runs_qrels(spark, sf_dir)
    return evaluation.ndcg_eval(runs, qrels, k=RE_K)


def q_cocitation_pairs(spark, sf_dir):
    """Co-citation pair counts (graph.common_neighbor_pairs): for each
    unordered doc pair, how many docs link to BOTH — the second-order
    link-similarity signal; once-per-pair self-join on the shared
    citing node with a loud C(d,2) degree guard, min_count=2.  The
    DuckDB twin is the same once-per-pair self-join, hash-verified."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.common_neighbor_pairs(edges, "cocitation", min_count=2)


def q_link_prediction(spark, sf_dir):
    """Resource-allocation link prediction
    (graph.resource_allocation_pairs): cocitation witnesses
    down-weighted by out-degree (10⁶ DIV d per witness, the pagerank
    quantization) — the log-free Adamic–Adar; shared rare citers
    outrank shared hubs at equal n_common.  Same once-per-pair
    self-join + loud degree guard as the count operators."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.resource_allocation_pairs(
        edges, "cocitation", min_count=2
    )


def q_coupling_pairs(spark, sf_dir):
    """Bibliographic-coupling pair counts: docs sharing ≥ 2 out-links
    (references) — the coupling mode of the same operator and twin."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.common_neighbor_pairs(edges, "coupling", min_count=2)


WS_N = 50


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (sampling.weighted_sample): docs weighted by whitespace token
    count race via replica-minimum avalanche priorities, bottom-50
    win through TakeOrderedAndProject — reproducible ∝-weight
    selection for mixture building; the DuckDB twin runs the same mix
    arithmetic, so the exact winner set and priorities hash-match."""
    from openstreetmap_license_change_spark.operators import sampling

    docs = pages_src.documents(spark, sf_dir)
    weighted = docs.select(
        "doc_id", textops.token_count(F.col("text")).alias("n_tokens")
    )
    return sampling.weighted_sample(
        weighted, n=WS_N, weight_col="n_tokens"
    )



PQ_M, PQ_CODES = 4, 8


def q_pq_encode(spark, sf_dir):
    """Product-quantization encoding (similarity.pq_encode): 64-dim
    embeddings → 4 subvector codes from an 8-entry-per-subvector
    codebook trained in the same pass (deterministic mod seeding, the
    quantized k-means arithmetic reused verbatim) — the embedding-
    compression step of an IVF-PQ index.  Long-form output
    (vec, sub, code, dist_q); every code and quantization error is
    hash-verified against the DuckDB twin."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.pq_encode(emb, m=PQ_M, codes=PQ_CODES)


def q_pq_search(spark, sf_dir):
    """ADC top-10 retrieval over PQ codes (similarity.pq_search): the
    query's distances to every (subvector, code) centroid become an
    m·codes lookup table; each corpus vector scores as the sum of m
    lookups on its codes — the corpus is touched only through its
    integer codes.  Query = the vec_id=0 embedding (the house ANN
    convention); the DuckDB twin splices the pq_encode twin's CTEs
    with the same lookup sum, so the top-k and every approx distance
    hash-match."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0)
        .select("embedding").head()[0]
    ]
    return similarity.pq_search(
        emb.where(F.col("vec_id") != 0), qvec, k=10,
        m=PQ_M, codes=PQ_CODES,
    )


PCA_ROUNDS = 4


def q_pca_top(spark, sf_dir):
    """Top principal component of the embedding corpus by quantized
    power iteration (similarity.pca_power_top): C·v applied as two
    long-form aggregates per round (never materializing the d×d
    covariance), truncated-mean centering (the embedding_centroids
    convention — |deviation| independent of corpus size), L1
    requantization to 2²⁰ ints each round, loud zero-covariance
    failure.  The DuckDB twin unrolls the identical recurrence, so
    all 64 loadings hash-verify after every round."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.pca_power_top(emb, rounds=PCA_ROUNDS)


BLOOM_BITS, BLOOM_K = 4096, 4


def q_bloom_membership(spark, sf_dir):
    """Bloom membership sketch (sketches.bloom_build/bloom_check):
    sparse 32-bit-word rows mergeable via bit_or (the
    tile_rollup_merge contract for bitmaps), k=4 salted house-mix
    hashes; probes = every distinct corpus token plus 10 synthetic
    absent tokens — one-sided semantics (present tokens are ALWAYS
    in_bloom; absent ones may deterministically false-positive, and
    the twin reproduces those exact false positives)."""
    docs = pages_src.documents(spark, sf_dir)
    sk = sketches.bloom_build(docs, n_bits=BLOOM_BITS, k=BLOOM_K)
    corpus_toks = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
        .distinct()
    )
    absent = spark.range(10).select(
        F.concat(F.lit("absent_"), F.col("id").cast("string")).alias("token")
    )
    probes = corpus_toks.unionByName(absent)
    out = sketches.bloom_check(sk, probes, n_bits=BLOOM_BITS, k=BLOOM_K)
    return out.select(
        "token", "in_bloom",
        (~F.col("token").startswith("absent_")).alias("present"),
    )


KWIC_TERM, KWIC_WINDOW = "dup", 3


def q_concordance(spark, sf_dir):
    """KWIC concordance (textops.concordance) for the corpus's rare
    term: 1-based positions, ±3-token clamped contexts, pure row-local
    array algebra — ZERO shuffles, the audit tool you run before
    filtering on a token.  The DuckDB twin slices the same arrays, so
    every context string is hash-verified."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.concordance(docs, KWIC_TERM, window=KWIC_WINDOW)


II_SHARD = 128


def q_inverted_index(spark, sf_dir):
    """Sharded inverted index (textops.inverted_index): per
    (token, doc-range shard) one bounded posting row with delta-
    encoded "doc:tf,+gap:tf" postings — the materialized IR artifact
    behind bm25_topk; the lag window and final collect share one
    (token, shard) partitioning.  The DuckDB twin renders the same
    gaps via ordered string_agg, so every posting byte is
    hash-verified."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.inverted_index(docs, shard_size=II_SHARD)


def q_snap_to_segments(spark, sf_dir):
    """Map-matching lite (spatial.snap_to_segments): every latest page
    snaps to its nearest per-lang polyline segment within a one-cell
    (5°) radius — bbox-fan × 3×3-probe candidates, exact rational
    point-to-segment distance in decimal(38)/HUGEINT quantized once,
    min(struct) argmin with lowest-id ties.  The DuckDB twin runs the
    identical arithmetic, so every match and distance hash-matches."""
    latest = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    pts = latest.select(F.col("url").alias("point_id"), "lon", "lat")
    segs = _lang_segments(spark, sf_dir).select(
        F.col("url").alias("seg_id"), "lon1", "lat1", "lon2", "lat2"
    )
    return spatial.snap_to_segments(pts, segs, res_deg=5.0)


ADAPT_ARGS = dict(min_res=1, max_res=8, max_count=50)


def q_adaptive_tiles(spark, sf_dir):
    """Adaptive quadtree tiling (spatial.adaptive_tiles): per-level
    count → split-over-threshold recurrence on the hierarchical Morton
    ladder; leaves ≤ 50 points or res 8, exactly partitioning the
    corpus — one shrinking aggregate per level, AQE-broadcast hot-cell
    semi-joins.  The DuckDB twin unrolls the identical recurrence, so
    every leaf and count is hash-verified."""
    return spatial.adaptive_tiles(_pages(spark, sf_dir), **ADAPT_ARGS)


# q_raster_distance runs on the 5° grid (cols=72): at 0.25° the 500
# occupied cells are isolated scatter (no adjacency, every distance
# NULL); at 5° the ~19% fill forms multi-cell clusters so the corridor
# walk produces real finite distances.  Seed window: 4 lat × 8 lon bands.
RD_RES = 5.0
RD_COLS = 72
RD_BANDS = (14, 22, 0, 8)  # lat_lo, lat_hi, lon_lo, lon_hi
RD_ROUNDS = 8


def q_raster_distance(spark, sf_dir):
    """Grid corridor distance (spatial.raster_distance): frontier BFS
    over the queen adjacency of OCCUPIED rollup cells from a 20×20
    seed window — the composition of the tile_dilate fan and
    graph.link_distance, twins composed identically; NULL = no
    corridor within 8 steps."""
    latest = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    cells = latest.select(
        spatial.grid_cell(F.col("lon"), F.col("lat"), RD_RES).alias("cell")
    ).distinct()
    lat_b = F.floor(F.col("cell") / RD_COLS)
    lon_b = F.col("cell") % RD_COLS
    la0, la1, lo0, lo1 = RD_BANDS
    seeds = cells.where(
        (lat_b >= la0) & (lat_b < la1) & (lon_b >= lo0) & (lon_b < lo1)
    )
    return spatial.raster_distance(
        cells, seeds, rounds=RD_ROUNDS, res_deg=RD_RES
    )


def q_raster_cost_distance(spark, sf_dir):
    """Cost-surface corridor routing (spatial.raster_cost_distance):
    the weighted upgrade of q_raster_distance over the SAME occupied
    support — entering a cell costs 1 + its tainted-page count, so
    corridors detour around contaminated tiles; the tile_dilate fan
    feeds graph.weighted_distance (a cell re-enters the frontier when
    a longer-but-cheaper detour arrives), twins composed
    identically."""
    flagged = _pages_flagged(spark, sf_dir)
    pts = spatial.assign_cells(flagged, res_deg=RD_RES).withColumn(
        "tainted", ~F.col("accepted")
    )
    cost = pts.groupBy("cell").agg(
        (F.lit(1) + F.sum(F.col("tainted").cast("long")))
        .cast("long").alias("cost")
    )
    lat_b = F.floor(F.col("cell") / RD_COLS)
    lon_b = F.col("cell") % RD_COLS
    la0, la1, lo0, lo1 = RD_BANDS
    seeds = cost.where(
        (lat_b >= la0) & (lat_b < la1) & (lon_b >= lo0) & (lon_b < lo1)
    ).select("cell")
    return spatial.raster_cost_distance(
        cost, seeds, rounds=RD_ROUNDS, res_deg=RD_RES
    )


def q_tile_contours(spark, sf_dir):
    """Marching-squares contour topology (spatial.tile_contours) over
    the occupied-cell support: sparse ×4 corner fan → per-block case
    index 1..14 + segment count, the raster→vector iso-line step;
    wrap-aware in lon, block-clamped in lat.  The DuckDB twin runs the
    identical weight fan, so every boundary block and saddle case is
    hash-verified."""
    return spatial.tile_contours(_q_rollup_cells(spark, sf_dir))


def q_tile_erode(spark, sf_dir):
    """Raster erosion (spatial.tile_erode): interior cells whose whole
    in-bounds queen neighborhood is occupied (complement vs the input
    = the support boundary).  Runs at 10° where the sf0.01 support is
    ~50% occupied — real erosion (at 0.25° the raster is all boundary,
    at 20° it is fully dense; both ends are trivial)."""
    flagged = _pages_flagged(spark, sf_dir)
    support = flagged.groupBy(
        spatial.grid_cell(F.col("lon"), F.col("lat"), 10.0).alias("cell")
    ).agg(F.count(F.lit(1)).alias("_n")).select("cell")
    return spatial.tile_erode(support, res_deg=10.0)


def q_tile_kde(spark, sf_dir):
    """Separable-binomial kernel density over the tile_rollup raster
    (spatial.tile_kernel_density, radius 2 → 5×5 discrete Gaussian,
    weights C(4,·)⊗C(4,·)): each aggregate cell spreads v·w integer
    contributions to 25 taps; edge cells renormalize over their real
    support ((wsum·10⁶) DIV wnorm, exact int64)."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.tile_kernel_density(rollup, "n_pages", radius=2)


def q_idw_cells(spark, sf_dir):
    """Inverse-distance-weighted vector→raster interpolation
    (spatial.idw_to_cells): latest page versions become samples
    (value = doc_id % 997), support cells estimate Σv·w/Σw over the
    3×3 neighborhood with quantized 1/d² integer weights — exact
    int64 sums, one final division."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat", "doc_id"]
    )
    pts = pages.select(
        "lon", "lat",
        (F.col("doc_id") % 997).cast("double").alias("value"),
    )
    return spatial.idw_to_cells(
        pts, "value", res_deg=2.0, weight_scale=2_000_000_000
    )


POLY_VALID_MAX_RN = 8


def q_polygon_validity(spark, sf_dir):
    """OGC-style validity report (spatial.polygon_validity) over
    per-user rings built from each user's first ≤8 events: lon walks
    forward; lat is a concave parabola for user_id % 4 == 0 — a
    SIMPLE valid ring closed under its chain — and a residue-stride
    zigzag otherwise (bowties/spikes/degenerates), so the layer
    structurally mixes all four verdict classes — exactly the dirty layer the pip_*/polygon_stats
    operators silently assume away.  Exact quantized orientation
    predicates; proper crossings by SIGN comparison (a product of two
    cross terms would overflow int64); closing-vertex normalization;
    adjacent-pair spike test."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = (
        ev.select("user_id", "ts", "event_id", rn.alias("rn"))
        .where(F.col("rn") <= POLY_VALID_MAX_RN)
        .select(
            F.col("user_id").alias("polygon_id"),
            F.col("rn").alias("seq"),
            (F.lit(0.002) * F.col("rn")).alias("lon"),
            (F.lit(0.001) * F.when(
                F.pmod(F.col("user_id"), F.lit(4)) == 0,
                F.col("rn") * (F.lit(8) - F.col("rn")),
            ).otherwise(F.pmod(
                F.col("rn") * (F.lit(1) + F.pmod(F.col("user_id"),
                                                 F.lit(4))),
                F.lit(7),
            ))).alias("lat"),
        )
    )
    return spatial.polygon_validity(pts)


_POLY_VALID_PTS_SQL = """(
    SELECT user_id AS polygon_id, rn AS seq,
           0.002 * rn AS lon,
           0.001 * (CASE WHEN user_id % 4 = 0 THEN rn * (8 - rn)
                    ELSE (rn * (1 + user_id % 4)) % 7 END) AS lat
    FROM (SELECT user_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events) t
    WHERE rn <= 8
)"""


def q_convex_hull(spark, sf_dir):
    """Exact minimal convex hull per 30° supercell
    (hull.convex_hull): Arrow-batched monotone chain over integer-
    snapped coordinates — every orientation test an exact int64 cross
    product.  The oracle is the O(n³) witness-edge characterization
    (p is a vertex iff some edge p→q has all other points strictly
    left or collinear-between), so the hull SET is hash-verified."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat"]
    )
    pts = pages.select(
        spatial.grid_cell(F.col("lon"), F.col("lat"), 30.0).alias("gid"),
        "lon", "lat",
    )
    return hull.convex_hull(pts, "gid")


def q_directional_extremes(spark, sf_dir):
    """Bounding-octagon sketch per 30° supercell
    (hull.directional_extremes): argmax point along 8 integer
    directions, deterministic (ulon, ulat) tiebreak — one explode +
    one window rank, no Python, every emitted point a true hull
    vertex."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat"]
    )
    pts = pages.select(
        spatial.grid_cell(F.col("lon"), F.col("lat"), 30.0).alias("gid"),
        "lon", "lat",
    )
    return hull.directional_extremes(pts, "gid")


def q_hull_diameter(spark, sf_dir):
    """Farthest-pair extent per 30° supercell (hull.hull_diameter):
    the diameter endpoints are hull vertices (d² is convex), so the
    quadratic scan runs on the monotone-chain hull, never the raw
    points, with a loud h² guard; exact int64 d² in 10⁻⁴-degree
    units, struct-max tie-break.  The oracle composes the witness-edge
    hull twin with the identical once-per-pair max, so every diameter
    and endpoint pair is hash-verified."""
    pages = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat"]
    )
    pts = pages.select(
        spatial.grid_cell(F.col("lon"), F.col("lat"), 30.0).alias("gid"),
        "lon", "lat",
    )
    return hull.hull_diameter(pts, "gid")


def q_tile_rollup_multires(spark, sf_dir):
    """Multi-resolution raster rollup (cube over the Morton cell
    hierarchy, SURVEY §2.4 / north-rule H3-res analogue): taint
    density per cell at resolutions 5, 7, 9.  One shuffle over the
    points at the finest level; coarser levels re-aggregate the finest
    aggregate via cell_parent (exact — Morton-prefix truncation
    commutes with point assignment)."""
    flagged = _pages_flagged(spark, sf_dir)
    pts = flagged.withColumn("tainted", ~F.col("accepted"))
    return spatial.tile_rollup_multires(pts, resolutions=[5, 7, 9])


def q_pip_polygons(spark, sf_dir):
    """J10 (general path): ray-cast PIP against the 3-ring broadcast
    polygon layer via the cell-prefiltered candidate join — the exact
    predicate runs only on (point, covering-cell-candidate) pairs."""
    latest = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    out = spatial.pip_join_polygons_prefiltered(
        latest, PIP_POLYGONS, res_deg=30.0
    )
    return (
        out.where(F.col("polygon_id").isNotNull())
        .groupBy("polygon_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("url").alias("first_url"),
        )
    )


# Multipolygon layer for q_pip_multipolygons: polygon 1 is a donut
# WITH an island (outer ⊃ hole ⊃ island — parity 1/2/3 crossings walks
# inside/outside/inside), 2 and 3 are plain rings elsewhere.  Diamond/
# quad rings: integer (dyadic) coords, no horizontal edges (layer
# contract shared with PIP_POLYGONS), listed in ascending id so the
# first-match UDF agrees with the oracle's MIN(pid).
PIP_MULTIPOLYGONS = [
    (1, [
        [(-10.0, 0.0), (20.0, 30.0), (50.0, 0.0), (20.0, -30.0)],
        [(5.0, 0.0), (20.0, 15.0), (35.0, 0.0), (20.0, -15.0)],
        [(14.0, 0.0), (20.0, 6.0), (26.0, 0.0), (20.0, -6.0)],
    ]),
    (2, [[(-150.0, 20.0), (-100.0, 21.0), (-125.0, 60.0)]]),
    (3, [[(100.0, -40.0), (140.0, -39.0), (145.0, 0.0), (105.0, 5.0)]]),
]


def q_pip_multipolygons(spark, sf_dir):
    """J10 (multipolygon path): even-odd PIP with holes and islands
    (spatial.pip_join_multipolygons) — a point inside polygon 1's hole
    is OUTSIDE, inside its island is INSIDE again.  The oracle sums
    crossing parity over ALL rings' edges, so the donut semantics are
    hash-verified."""
    latest = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    out = spatial.pip_join_multipolygons(latest, PIP_MULTIPOLYGONS)
    return (
        out.where(F.col("polygon_id").isNotNull())
        .groupBy("polygon_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("url").alias("first_url"),
        )
    )


def q_zonal_stats(spark, sf_dir):
    """Zonal statistics (spatial.zonal_stats): per-polygon aggregation
    of the tile_rollup raster by center containment — the raster→
    vector overlay; centers are exact dyadic arithmetic, the PIP is
    the shared even-odd ray cast, all on the aggregate."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    raster = spatial.tile_rollup(cells).select(
        "cell", "n_pages", "n_tainted"
    )
    return spatial.zonal_stats(raster, PIP_POLYGONS)


def q_pip_multipolygons_prefiltered(spark, sf_dir):
    """The multipolygon PIP's cell-prefiltered strategy (broadcast
    hash equi-join on the outer ring's covering cells, exact parity
    residual) — shares q_pip_multipolygons' oracle, so the driver
    hash-verifies the strategy A/B every round (the knn A/B pattern)."""
    latest = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    out = spatial.pip_join_multipolygons_prefiltered(
        latest, PIP_MULTIPOLYGONS, res_deg=15.0
    )
    return (
        out.where(F.col("polygon_id").isNotNull())
        .groupBy("polygon_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("url").alias("first_url"),
        )
    )


def q_pip_outside(spark, sf_dir):
    """Spatial ANTI join (spatial.pip_anti_join): latest pages in NONE
    of the 3 broadcast polygons — fully map-side (cell→candidate-list
    broadcast left join + one Arrow batch for candidates only, zero
    shuffles before the final rollup).  Aggregated per lang so the
    result is small and the complement-of-pip_polygons relationship is
    hash-checked end to end."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lang", "lon", "lat"]
    )
    out = spatial.pip_anti_join(latest, PIP_POLYGONS, res_deg=30.0)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_outside"),
        F.min("url").alias("first_url"),
    )


def q_tile_vectorize(spark, sf_dir):
    """Raster→vector: per occupied 15° cell, exact cell bbox + member
    centroid (scaled-int sums, one division) + count."""
    latest = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    return spatial.tile_vectorize(latest, res_deg=15.0)


def q_pip_rect(spark, sf_dir):
    """J10 (rectangle fast path): broadcast PIP against 4 region rects."""
    pages = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    rects = spark.createDataFrame(
        [
            (1, -180.0, -90.0, -60.0, 0.0),
            (2, -60.0, -90.0, 60.0, 0.0),
            (3, -180.0, 0.0, 0.0, 90.0),
            (4, 0.0, 0.0, 180.0, 90.0),
        ],
        "polygon_id INT, min_lon DOUBLE, min_lat DOUBLE, max_lon DOUBLE, max_lat DOUBLE",
    )
    return spatial.pip_join_rect(pages, rects).groupBy("polygon_id").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.min("url").alias("first_url"),
    )


def q_knn_in_cell(spark, sf_dir):
    """J11: cell-local kNN — for each tainted page, the 3 nearest
    accepted pages in the same (coarse) cell."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    cells = spatial.assign_cells(latest, res_deg=30.0)
    dirty = cells.where(~F.col("accepted"))
    clean = cells.where(F.col("accepted")).select(
        F.col("cell"), F.col("url").alias("cand_url"), "lon", "lat"
    )
    out = spatial.knn_in_cell(
        dirty.select("url", "cell", "lon", "lat"), clean, k=3
    )
    return out.select(
        "url", "cand_url", F.col("knn_rank"), F.round("dist2", 6).alias("dist2_r")
    )


def q_knn_neighborhood(spark, sf_dir):
    """J11b: kNN with 3×3 neighbor-cell probing — nearest accepted
    pages are found even across a cell boundary (the cell-local
    variant's known miss)."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    dirty = latest.where(~F.col("accepted")).select("url", "lon", "lat")
    clean = latest.where(F.col("accepted")).select(
        F.col("url").alias("cand_url"), "lon", "lat"
    )
    out = spatial.knn_neighborhood(dirty, clean, k=3, res_deg=30.0)
    return out.select(
        "url", "cand_url", F.col("knn_rank"), F.round("dist2", 6).alias("dist2_r")
    )


def q_knn_neighborhood_agg(spark, sf_dir):
    """J11b (sort-free physical strategy): identical semantics to
    ``knn_neighborhood`` — 3×3 probing, wrapped-lon distance,
    (dist2, id) tie-break — computed via per-cell candidate arrays +
    native higher-order functions instead of the pair-stream window
    (no per-partition pair sort anywhere; see
    ``spatial.knn_neighborhood_agg``).  Shares the window variant's
    DuckDB oracle, so the driver hash-verifies the A/B equivalence."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(flagged, cols=["accepted", "lon", "lat"])
    dirty = latest.where(~F.col("accepted")).select("url", "lon", "lat")
    clean = latest.where(F.col("accepted")).select(
        F.col("url").alias("cand_url"), "lon", "lat"
    )
    out = spatial.knn_neighborhood(
        dirty, clean, k=3, res_deg=30.0, strategy="agg"
    )
    return out.select(
        "url", "cand_url", F.col("knn_rank"), F.round("dist2", 6).alias("dist2_r")
    )


def q_nearest_clean_attribution(spark, sf_dir):
    """1-NN attribution (spatial.nearest_attribution): every tainted
    latest page attributed to its nearest accepted latest page in the
    3×3 30° neighborhood (wrapped-lon dist², (dist2, cand_url)
    tie-break), carrying the clean page's lang through the argmin —
    the north rule's "nearest-clean-version attribution", as a pure
    partial-aggregating min_by (no window, no pair sort)."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(
        flagged, cols=["accepted", "lon", "lat", "lang"]
    )
    dirty = latest.where(~F.col("accepted")).select("url", "lon", "lat")
    clean = latest.where(F.col("accepted")).select(
        F.col("url").alias("cand_url"), "lon", "lat",
        F.col("lang").alias("near_lang"),
    )
    out = spatial.nearest_attribution(
        dirty, clean, res_deg=30.0, payload_cols=("near_lang",)
    )
    return out.select(
        "url", "cand_url",
        F.round("dist2", 6).alias("dist2_r"), "near_lang",
    )


def q_knn_lang_vote(spark, sf_dir):
    """Majority-vote attribution (spatial.knn_attribute_mode): each
    tainted page takes the modal lang of its 3 nearest accepted
    neighbors (ties → most votes, then smallest lang) — the lang rides
    the kNN as a payload column, so attribution adds zero joins."""
    flagged = _pages_flagged(spark, sf_dir)
    latest = lineage.latest_version(
        flagged, cols=["accepted", "lon", "lat", "lang"]
    )
    dirty = latest.where(~F.col("accepted")).select("url", "lon", "lat")
    clean = latest.where(F.col("accepted")).select(
        F.col("url").alias("cand_url"), "lon", "lat", "lang"
    )
    return spatial.knn_attribute_mode(
        dirty, clean, attr_col="lang", k=3, res_deg=30.0
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups by md5(text)."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.dedup_exact(docs)


def q_ngram_jaccard(spark, sf_dir):
    """3-gram Jaccard near-dup pairs ≥ 0.2.

    max_doc_freq=1.0 keeps the RESULT exact (every shingle passes the
    df filter) while exercising the df-capped CODE path — the
    candidate-join guard the 100-TB story depends on — so the
    oracle-verified path is the scale-safe one."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=1.0)


def q_ngram_jaccard_capped(spark, sf_dir):
    """3-gram Jaccard with a BITING stop-shingle cap (df ≤ 5% of
    docs): shingles in more than 5% of documents are excluded from the
    candidate join; Jaccard stays exact over full shingle sets.  The
    oracle mirrors the exclusion, so the cap's semantics (not just its
    plumbing) are verified."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_doc_freq=0.05
    )


def q_jaccard_prefix(spark, sf_dir):
    """EXACT Jaccard ≥ 0.2 pairs via PPJoin-style prefix filtering
    (dedup.jaccard_prefix_join): tokens ordered rarest-first, each doc
    contributes only its s − ⌈τ·s⌉ + 1 rarest shingles to the
    candidate join, so stop-shingle buckets never blow up AND no pair
    is lost (any τ-similar pair must collide in the prefix).  The
    DuckDB twin verifies over the UNFILTERED shared-any-shingle
    candidate superset — structurally different execution, so the
    hash match proves the prefix filter's completeness, not just its
    arithmetic."""
    docs = pages_src.documents(spark, sf_dir)
    toks = dedup.shingles(docs, n=3)
    return dedup.jaccard_prefix_join(toks, threshold_ppm=200_000)


def q_containment_pairs(spark, sf_dir):
    """Asymmetric shingle containment ≥ 0.4 either direction
    (dedup.containment_pairs): the quote/subset detector Jaccard
    structurally misses (a short doc embedded in a long one), with
    exact n_inter·10⁶ DIV |set| ppm ratios — the df-capped code path
    runs with max_doc_freq=1.0 (exact result, scale-safe plumbing,
    the ngram_jaccard convention); every containment hash-verifies
    against the concat_ws-mirrored twin."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.containment_pairs(
        docs, n=3, threshold_ppm=400_000, max_doc_freq=1.0
    )


def q_minhash_dedup_apply(spark, sf_dir):
    """Dedup APPLIED: one canonical doc per near-dup cluster with the
    absorbed-member count — the surviving corpus, not just labels."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.minhash_dedup_apply(docs).select(
        "doc_id", "lang", "cluster_size"
    )


def q_sample_hash(spark, sf_dir):
    """Deterministic ~1/8 corpus sample by key-hash residue (shuffle-
    free, reproducible at any parallelism)."""
    from openstreetmap_license_change_spark.operators import sampling

    docs = pages_src.documents(spark, sf_dir)
    return sampling.deterministic_sample(docs, denom=8).select(
        "doc_id", "lang"
    )


def q_dataset_split(spark, sf_dir):
    """Leakage-safe train/val/test split (sampling.grouped_split):
    every source domain lands wholly in one split by its avalanche-
    mixed hash residue against cumulative 80/10/10 millionth ratios —
    map-side CASE, no shuffle, no join; assignment depends only on the
    group key, so incremental crawls never migrate a group (tested)."""
    docs = pages_src.documents(spark, sf_dir)
    return sampling.grouped_split(
        docs, "source",
        [("train", 800_000), ("val", 100_000), ("test", 100_000)],
    ).select("doc_id", "source", "split")


def q_sample_stratified(spark, sf_dir):
    """Exactly 3 docs per language, hash-ordered (deterministic
    reservoir) — the balanced-subsample curation primitive."""
    from openstreetmap_license_change_spark.operators import sampling

    docs = pages_src.documents(spark, sf_dir)
    return sampling.stratified_sample(docs, "lang", k=3).select(
        "doc_id", "lang"
    )


def q_lang_topk_quality(spark, sf_dir):
    """Top-5 documents per language by length (quality proxy) with a
    deterministic tie-break — group_topk / WindowGroupLimit shape."""
    from openstreetmap_license_change_spark.operators import sampling

    docs = pages_src.documents(spark, sf_dir).withColumn(
        "n_chars", F.length("text")
    )
    return sampling.group_topk(
        docs,
        ["lang"],
        [F.desc("n_chars"), F.col("doc_id")],
        k=5,
    ).select("lang", "doc_id", "n_chars", "rank")


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (16 arithmetic permutations over the
    query-local token dictionary)."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.minhash_signatures(docs)


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs (4 bands × 4 rows)."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.minhash_lsh_pairs(docs)


LSH_PAIR_CAP = 16  # bites on testdata: sf0.01 has buckets ≫ 16 docs


def q_minhash_lsh_pairs_capped(spark, sf_dir):
    """LSH pairs with the mega-bucket guard BITING (bucket-size cap
    16): buckets above the cap emit no pairs — the scale-safe pair
    path.  The oracle mirrors the cap semantically (bucket sizes in
    SQL), so the exclusion rule itself is hash-verified, like
    ngram_jaccard_capped verifies the df cap."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.minhash_lsh_pairs(docs, max_bucket_size=LSH_PAIR_CAP)


def q_minhash_lsh_clusters(spark, sf_dir):
    """Near-dup cluster ids: connected components over the doc–bucket
    graph by min-label propagation — the O(n²)-free form of the pair
    list (the operator a 100-TB dedup keeps)."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.minhash_lsh_clusters(docs)


def q_golden_records(spark, sf_dir):
    """Survivorship over the REAL minhash clusters
    (dedup.golden_records): one canonical row per near-dup cluster
    with stated deterministic rules — longest text wins (ties to the
    smallest id, one max(struct) argmax), modal lang (ties
    lexicographic), disagreement counts kept as audit columns.  The
    oracle nests the full clusters twin, so the survivorship verifies
    on top of the verified clustering, end to end."""
    docs = pages_src.documents(spark, sf_dir)
    clusters = dedup.minhash_lsh_clusters(docs)
    return dedup.golden_records(docs, clusters)


def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (dedup.sorted_neighborhood_pairs)
    on document length — the third candidate-generation family beside
    LSH banding and PPJoin prefixes: exact two-level global rank (the
    str_pack kit, never a single-partition window, loud skew guard),
    width-5 window pairs via the exactly-once forward block fan (no
    distinct).  The twin IS the definition — one plain global
    ROW_NUMBER — so both the rank decomposition and the fan verify."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.sorted_neighborhood_pairs(
        docs, "doc_id", "n_chars", window=5
    )


FS_FIELDS = [("f_lang", 950_000, 300_000),
             ("f_src", 900_000, 250_000),
             ("f_pre", 700_000, 20_000)]
FS_UP, FS_LO = 50_000_000, 2_000_000


def q_fs_linkage(spark, sf_dir):
    """Fellegi–Sunter probabilistic linkage (dedup.fellegi_sunter)
    over sorted-neighborhood candidates — the ER decision layer that
    completes the stack (blocking → THIS scoring → survivorship):
    per-pair agreement pattern on (lang, source, 16-char text
    prefix), exact-integer odds under declared m/u ppm rates, and
    cross-multiplied match/possible/non_match verdicts, so no
    division error can flip a verdict and every row hash-verifies.
    All three verdicts carry mass at every sf (probed: 1 match / 34
    possible / 1955 non_match at sf0.01)."""
    docs = pages_src.documents(spark, sf_dir)
    cand = dedup.sorted_neighborhood_pairs(
        docs, "doc_id", "n_chars", window=5
    )
    da = docs.select(
        F.col("doc_id").alias("id_a"), F.col("lang").alias("la"),
        F.col("source").alias("sa"),
        F.substring("text", 1, 16).alias("ta"),
    )
    db = docs.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("lb"),
        F.col("source").alias("sb"),
        F.substring("text", 1, 16).alias("tb"),
    )
    j = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a", "id_b",
            (F.col("la") == F.col("lb")).alias("f_lang"),
            (F.col("sa") == F.col("sb")).alias("f_src"),
            (F.col("ta") == F.col("tb")).alias("f_pre"),
        )
    )
    return dedup.fellegi_sunter(j, FS_FIELDS, FS_UP, FS_LO)


def q_match_assignment(spark, sf_dir):
    """One-to-one match assignment (graph.greedy_matching) over the
    Fellegi–Sunter-scored candidates — the ER stack's final layer
    (blocking → scoring → THIS assignment → survivorship): each doc
    pairs with at most one partner, best odds first, as the exact
    lexicographically-first maximal matching under the
    (−odds, id_a, id_b) total order.  Computed by parallel
    locally-minimal-edge rounds that provably equal sequential
    best-first greedy (the mirror test IS sequential greedy); the
    twin unrolls the identical rounds.  Returns matched pairs with
    their (negated) odds weight."""
    fs = q_fs_linkage(spark, sf_dir)
    edges = fs.select(
        "id_a", "id_b", (-F.col("odds_ppm")).alias("w")
    )
    return graph.greedy_matching(edges, max_rounds=24)


def q_cluster_audit(spark, sf_dir):
    """Dedup-cluster QUALITY audit (dedup.cluster_audit): exact
    pairwise token-Jaccard floor/mean per minhash_lsh_clusters
    cluster — the measured answer to "did the sketch pipeline group
    real near-dups or chain artifacts"; zero-overlap pairs audit as
    0 (rebuilt from membership, not just the shared-token join), loud
    C(n,2) size guard."""
    # audit a deterministic half of the corpus: the synthetic corpus
    # is duplicate-dense by design (its largest true-dup cluster is
    # ~78% of one source), and the audit's SAMPLE-of-clusters usage
    # note is exactly this move; the cap is raised explicitly as the
    # guard's message instructs
    docs = pages_src.documents(spark, sf_dir).where(
        F.col("doc_id") % 2 == 0
    )
    clusters = dedup.minhash_lsh_clusters(docs)
    return dedup.cluster_audit(clusters, docs, max_cluster_size=4096)


def q_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints from the token dictionary."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.simhash64(docs)


def q_simhash_pairs(spark, sf_dir):
    """EXACT Hamming-≤3 near-dup pairs by bit-band LSH
    (dedup.simhash_near_dup_pairs): 4 bands → perfect pigeonhole
    recall → hash equi-join + bit_count residual, exactly-once via the
    first-matching-band rule.  The oracle is the naive quadratic
    self-join over the same signatures — the operator's claim is
    identical output from a linear-shuffle plan."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.simhash_near_dup_pairs(docs, max_hamming=3)


def q_simhash_clusters(spark, sf_dir):
    """Near-dup clusters over the EXACT Hamming-≤3 pair graph
    (dedup.simhash_clusters): banded pair emission + bit_count
    residual, then the shared pointer-jumping min-label propagation
    (operators/graph.py — O(log chain) rounds).  Every doc appears;
    isolated docs are singletons.  Oracle: naive quadratic Hamming
    edges + recursive-CTE transitive closure, min label."""
    docs = pages_src.documents(spark, sf_dir)
    return dedup.simhash_clusters(docs, max_hamming=3)


def q_passage_dedup(spark, sf_dir):
    """Passage-level exact dedup (textops.passage_dedup): the corpus
    is documents plus a 32-word-prefix clone of every doc (ids
    +10000) — the clones' aligned 16-word windows all lose to the
    originals (first-global-occurrence rule), originals keep
    everything.  One md5-keyed window-min + one doc groupBy, no
    joins.  Oracle replays the same chunking with list_slice."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id", "text")
    prefix = docs.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 32), " "
        ).alias("text"),
    )
    return textops.passage_dedup(docs.union(prefix), window=16)


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing (textops.scrub_pii): documents get deterministic
    synthetic emails (doc_id%3==0) and 555-line phone numbers
    (doc_id%4==1) appended, then the native regexp_count/replace pass
    redacts them.  The patterns are lookaround-free so Java regex and
    the oracle's RE2 agree match-for-match."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id", "text")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" reach user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.org"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return textops.scrub_pii(injected).select(
        "doc_id", "n_emails", "n_phones", "scrubbed"
    )


def q_html_extract(spark, sf_dir):
    """The input-contract invariant, driver-verified: the pages table
    carries ``html:binary`` (sources/pages.html_of — entity-escaped
    body in a title/nav/footer envelope) and the Arrow-batched
    extractor (textops.extract_text) recovers ``text`` BYTE-IDENTICALLY
    per url/version.  Aggregated per url: version count, count of
    byte-exact extractions (== versions when the invariant holds),
    extracted and raw-html byte totals.  The oracle recomputes the
    extraction natively in DuckDB (decode + regexp + inverse-order
    unescape), so a drift in EITHER the envelope or the extractor
    hash-mismatches."""
    pages = pages_src.pages_from_documents(spark, sf_dir)
    ext = textops.extract_text(pages)
    return ext.groupBy("url").agg(
        F.count(F.lit(1)).alias("versions"),
        F.sum((F.col("extracted") == F.col("text")).cast("int"))
        .cast("bigint").alias("ok_versions"),
        F.sum(F.octet_length("extracted")).cast("bigint")
        .alias("extracted_bytes"),
        F.sum(F.octet_length("html")).cast("bigint").alias("html_bytes"),
    )


def q_canonical_url(spark, sf_dir):
    """URL canonicalization (textops.canonical_url): deterministic
    messy variants (upper-case scheme/host, :80 port, utm params,
    shuffled param order, fragments) collapse to one canonical form —
    the groupBy shows pairs of variants merging (250 canonical urls
    from 500 docs)."""
    docs = pages_src.documents(spark, sf_dir)
    base = (F.col("doc_id") % 250).cast("string")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("HTTP://WWW.Example.COM:80"))
        .otherwise(F.lit("http://www.example.com")),
        F.lit("/p/"), base,
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("?utm_source=feed&id="), base))
        .otherwise(F.concat(F.lit("?id="), base)),
        F.when(F.col("doc_id") % 2 == 0, F.lit("&z=9&a=1"))
        .otherwise(F.lit("&a=1&z=9")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag"))
        .otherwise(F.lit("")),
    )
    return (
        docs.select(textops.canonical_url(url).alias("curl"), "doc_id")
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def q_boilerplate_strip(spark, sf_dir):
    """Cross-document boilerplate removal (textops.boilerplate_strip):
    documents are re-lined into 8-word lines wrapped in a newsletter
    header + copyright footer shared by EVERY doc; the df≥50 filter
    drops the chrome everywhere while unique content lines survive
    and reassemble in order."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n_chunks = F.floor((F.size(words) - 1) / F.lit(8)).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_chunks),
            lambda i: F.array_join(
                F.slice(words, i * F.lit(8) + 1, F.lit(8)), " "
            ),
        ),
        "\n",
    )
    lined = docs.select(
        "doc_id",
        F.concat(
            F.lit("subscribe to our newsletter\n"),
            body,
            F.lit("\ncopyright example corp"),
        ).alias("text"),
    )
    return textops.boilerplate_strip(lined, min_df=50)


def q_geotag_cells(spark, sf_dir):
    """The north-star chain end-to-end: geocode pages FROM the
    byte-identical extracted text.  Documents get a deterministic
    integer micro-degree geotag token appended ('geo:<µlat>,<µlon>'),
    the crawl envelope is built around the tagged text
    (sources/pages.html_of), the Arrow-batched extractor recovers it,
    the coordinate is parsed back out of the EXTRACTED text with one
    native regexp, and the points roll up per hierarchical res-6 cell.
    A drift anywhere in envelope → extraction → parse → cell algebra
    hash-mismatches the oracle."""
    docs = pages_src.documents(spark, sf_dir)
    ulat = (F.col("doc_id") * 104729 % 1800000 - 900000).cast("bigint")
    ulon = (F.col("doc_id") * 7919 % 3600000 - 1800000).cast("bigint")
    tagged = docs.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.col("text"), F.lit(" geo:"),
            ulat.cast("string"), F.lit(","), ulon.cast("string"),
        ).alias("text"),
    ).withColumn("html", pages_src.html_of(F.col("url"), F.col("text")))
    ext = textops.extract_text(tagged).select("url", "extracted")
    pat = r"geo:(-?\d+),(-?\d+)"
    pts = ext.select(
        "url",
        (F.regexp_extract("extracted", pat, 1).cast("bigint")
         / F.lit(10000.0)).alias("lat"),
        (F.regexp_extract("extracted", pat, 2).cast("bigint")
         / F.lit(10000.0)).alias("lon"),
    )
    return (
        pts.groupBy(
            spatial.hier_cell(F.col("lon"), F.col("lat"), 6).alias("cell")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("url").alias("first_url"),
        )
    )


def q_domain_rollup(spark, sf_dir):
    """Per-domain curation rollup (textops.domain_rollup): pages
    grouped by the regexp-extracted host of their url — page count,
    distinct-url count, taint count.  The two-phase distinct expands
    inside the one aggregate."""
    flagged = _pages_flagged(spark, sf_dir).withColumn(
        "tainted", ~F.col("accepted")
    )
    return textops.domain_rollup(flagged, taint_col="tainted")


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition filter signals (textops.repetition_stats):
    top-2-gram and duplicate-2-gram occurrence shares in exact integer
    millionths, plus the published drop rule."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.repetition_stats(docs, n=2)


# deterministic robots rules for q_robots_filter: per source domain,
# a root allow, a one-digit disallow, and a longer two-digit re-allow —
# longest-match precedence and the allow-wins tie both get exercised
# on real doc ids.  Shared verbatim with the oracle's VALUES literal.
_ROBOTS_RULES = [
    rule
    for k in range(20)
    for rule in (
        (f"src{k}", "/", True),
        (f"src{k}", f"/{k % 10}", False),
        (f"src{k}", f"/{k % 10}3", True),
    )
]


def q_quality_calibrate(spark, sf_dir):
    """Per-language percentile-rank calibration
    (textops.percentile_calibrate) of document lengths: raw n_chars →
    within-lang rank percentile (ties share the rank — equal scores
    calibrate equally; RANK not row_number, the nondeterminism rule),
    making one uniform pct_m threshold comparable across languages."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.percentile_calibrate(
        docs, "n_chars", ["lang"], ["doc_id"]
    )


def q_robots_filter(spark, sf_dir):
    """robots.txt compliance filtering (textops.robots_filter, RFC
    9309): per document url, the longest matching rule prefix on its
    domain decides, allow wins exact-length ties, no rule ⇒ allowed;
    broadcast rule join with the prefix condition IN the join (a left
    join + WHERE would silently drop urls whose domain has rules but
    none matching — tested), keyed window for the most-specific pick.
    Decisions are emitted, not applied — denied urls stay auditable."""
    docs = pages_src.documents(spark, sf_dir).select(
        F.concat(
            F.lit("doc://"), F.col("source"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "domain string, prefix string, allow boolean"
    )
    return textops.robots_filter(docs, rules)


def q_winnow(spark, sf_dir):
    """Winnowing fingerprints (textops.winnow_fingerprints, the MOSS
    algorithm): character 8-gram hashes, 4-window minima with the
    rightmost tie rule — encoded as ONE integer min over the frame
    (h·2²⁰ + reversed pos; struct-min in frames is engine-fragile) —
    dedup of overlapping selections.  The winnowing guarantee (any
    ≥ w+k−1 substring match shares a fingerprint) is property-tested
    on planted plagiarism."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.winnow_fingerprints(docs, k=8, window=4)


def q_charset_profile(spark, sf_dir):
    """Per-document script/charset profile (textops.charset_profile):
    exact character-class counts for eight disjoint codepoint ranges
    + the exact OTHER remainder — the mojibake/script-mix detector;
    all native regexp_count in one whole-stage-codegen projection
    (the twin counts the identical classes via RE2 \\x{} syntax)."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.charset_profile(docs)


def q_token_burstiness(spark, sf_dir):
    """Token burstiness (textops.token_burstiness): exact Fano factor
    of per-doc counts with zeros included — ((N·Q − S²)·10⁶) DIV (N·S)
    in decimal(38)/HUGEINT — separating content words (bursty) from
    glue (Poisson-ish) with no stopword list; min_df=2."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.token_burstiness(docs, min_df=2)


def q_vocab_drift(spark, sf_dir):
    """Vocabulary drift (textops.vocab_drift) between the even- and
    odd-doc_id halves of the corpus (two deterministic sub-corpora
    standing in for crawl snapshots): per-token df in each side,
    corpus-size-normalized rate ratio in decimal(38)/HUGEINT ppm,
    new/gone/present status, hapax floor min_df=2."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.vocab_drift(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        min_df=2,
    )


def q_kn_bigrams(spark, sf_dir):
    """Interpolated Kneser–Ney bigram model (textops.kn_bigram_model,
    D = 3/4 cleared to the exact ppm closed form (max(4c−3,0)·T +
    3·R·L)·10⁶ DIV (4·c_w1·T)): continuation counts, not raw counts,
    drive the backoff (the Francisco effect, tested); vocabulary-sum
    normalization property-tested.  min_count=3 bounds the emitted
    table; the discount statistics still come from the FULL stream."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.kn_bigram_model(docs, min_count=3)


def q_lexical_diversity(spark, sf_dir):
    """Per-document lexical diversity (textops.lexical_diversity):
    type count, type-token ratio, and the exact-integer Gini–Simpson
    index (the log-free diversity stand-in for Shannon — same
    monotone ranking, engine-portable arithmetic); one explode + two
    map-side-combining groupBys, no windows."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.lexical_diversity(docs)


VOCAB_GROWTH_CPS = [4, 16, 64, 256, 1024, 4096, 16384, 65536]


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth curve (textops.vocab_growth):
    cumulative docs/tokens/types after each power-of-4 doc_id-prefix
    checkpoint — natural text grows types sublinearly; near-linear
    growth is the serial-number smell.  A type's first occurrence is
    min(doc_id) over ONE token groupBy (never a corpus-ordered
    window); cumulation runs on the ≤8 aggregate rows via a tiny
    triangular self-join."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.vocab_growth(docs, VOCAB_GROWTH_CPS)


def q_zipf_buckets(spark, sf_dir):
    """Zipf rank–frequency diagnostics (textops.zipf_buckets) over
    token BIGRAMS: frequencies histogrammed by exact power-of-two
    bucket (length(bin(c))−1 — no float log in either engine) with
    the per-doubling type ratio (≈½ under Zipf s=1).  Bigrams because
    the synthetic corpus is flat at n=1 (31 near-uniform tokens — a
    structurally degenerate 2-bucket histogram) but spreads across 6
    buckets at n=2 — exactly the template-corpus diagnosis the n>1
    mode exists for.  Grams are row-local array algebra; one gram
    groupBy → ≤63 rows; ratio via self-join on the tiny table."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.zipf_buckets(docs, ngram=2)


def q_chi2_tokens(spark, sf_dir):
    """χ² token–slice association (textops.chi2_tokens): top-15
    tokens per lang by the exact document-level χ² in ppm —
    feature-selection / slice-fingerprint ranking with degenerate
    margins excluded (χ² undefined, not zero) and a min-df floor.
    Presence is row-local array_distinct (one map-side-combinable
    shuffle); wide products decimal(38)/HUGEINT with truncating
    division on non-negative operands; WindowGroupLimit top-k."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.chi2_tokens(docs)


def q_lang_divergence(spark, sf_dir):
    """Slice-vs-rest total-variation divergence
    (textops.slice_divergence): each lang's unigram distribution
    against the rest of the corpus as the exact rational
    ½Σ|p−q| in ppm — absent types folded in CLOSED FORM (never
    enumerated), wide products in decimal(38)/HUGEINT, one explode
    shuffle + two re-aggregations of the reduced (lang, token)
    table.  The log-free distribution-shift audit beside vocab_drift
    (snapshots) and zipf_buckets (shape)."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.slice_divergence(docs)


def q_token_runs(spark, sf_dir):
    """Longest same-token run per document (textops.token_runs):
    adjacent-repetition curation signal computed with ROW-LOCAL
    higher-order array functions — boundary positions, pairwise run
    lengths, and the longest-run-earliest-start winner packed into
    ONE integer max (len·2²⁰ + reversed start, loud 2²⁰ guard); zero
    shuffles.  The DuckDB twin is a structurally different windowed
    LEAD formulation, so the packing algebra itself is
    hash-verified."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.token_runs(docs)


def q_cube_rollup(spark, sf_dir):
    """Warehouse CUBE over (lang, source) with char-mass sums
    (profile.cube_rollup): all 2² grouping combinations in ONE
    Expand-planned pass with the standard grouping bitmask (leftmost
    dim = MSB — probed to agree between Spark grouping_id() and
    DuckDB GROUPING()); NULL dimension values fail loud via an
    assert riding the count (both engines — a pruned standalone
    guard column would be dead code)."""
    docs = pages_src.documents(spark, sf_dir)
    return profile_mod.cube_rollup(
        docs, ["lang", "source"], sum_col="n_chars"
    )


def q_events_gap_fill(spark, sf_dir):
    """Densified per-type hourly series with forward carry
    (temporal.gap_fill): every hour in each event_type's own
    [first, last] span exists as a row — absent hours emit zero
    counts, NULL cents, and the last OBSERVED hour's total as the
    as-of carry (exact, never interpolated).  One (type, hour)
    partial agg touches the events; densify + the per-key ffill
    window run on the aggregate; spans beyond max_buckets fail loud
    via an assert riding the span column."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.gap_fill(ev, key_col="event_type")


def q_seasonal_hourly(spark, sf_dir):
    """Classical additive decomposition of per-type hourly activity
    (temporal.seasonal_decompose over temporal.gap_fill): the dense
    hourly grid from gap_fill feeds the 2×24 centered MA, the daily
    seasonal shape is the per-phase mean of the ×48-scaled detrended
    series, remainder isolates anomalies — trend/season/anomaly split
    as one exact-integer composition, gaps carrying explicit zero
    counts rather than smearing the MA window.  The twin nests
    gap_fill_sql verbatim as the decompose twin's source, so the
    COMPOSITION is what the driver hash-verifies."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dense = temporal_mod.gap_fill(ev, key_col="event_type")
    return temporal_mod.seasonal_decompose(
        dense.select("event_type", "bucket", "n_events"),
        "event_type", "bucket", "n_events", period=24,
    )


def q_emerging_hotspots(spark, sf_dir):
    """Space-time emerging-hotspot classification
    (spatial.emerging_hotspots): Gi* hot/cold flags on the all-time
    tile rollup joined with the per-cell Mann-Kendall version trend,
    labelled over the 3×3 (spot × trend) state space — the ArcGIS
    space-time-cube readout as a pure composition of the two
    exact-integer statistics.  The twin composes tile_hotspots_ctes
    and tile_trend_ctes verbatim, so the COMPOSITION is what the
    driver hash-verifies."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged)
    return spatial.emerging_hotspots(cells.select("cell", "version"))


def q_neighbor_jaccard(spark, sf_dir):
    """Neighborhood-Jaccard link prediction
    (graph.neighbor_jaccard_pairs) over the deterministic doc link
    graph: |Γa∩Γb| DIV |Γa∪Γb| in exact ppm per candidate pair —
    the set-overlap companion of link_prediction's resource
    allocation (Jaccard discounts hubs by BOTH endpoints' degree);
    one distinct symmetrization, C(d,2) wedge fan behind the loud
    max_degree assert, degree join on the pair aggregate."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.neighbor_jaccard_pairs(edges, min_common=2)


PPR_SEED_MOD = 97


def q_doc_ppr(spark, sf_dir):
    """Personalized PageRank (graph.ppr_quantized) from the
    deterministic doc_id % 97 == 0 seed set: restart AND dangling
    mass route to seeds, exact quantized-integer recurrence (total
    mass |S|·scale — a LOOSER overflow bound than global PageRank's
    n·scale), 2 shuffles/round + a broadcast seed flag; the DuckDB
    oracle (graph.ppr_sql) unrolls the identical seeded recurrence,
    so every round of quantization is hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    seeds = nodes.where(F.col("node") % PPR_SEED_MOD == 0)
    out = graph.ppr_quantized(nodes, seeds, edges,
                              iterations=PR_ITERATIONS)
    return out.select(F.col("node").alias("doc_id"), "rank_q")


def q_morans_correlogram(spark, sf_dir):
    """Spatial correlogram (spatial.morans_correlogram): Moran's I
    per Chebyshev ring band 1..3 over the SAME tile rollup as
    q_morans_i — band 1 is exactly the global statistic's queen ring
    (pinned by test), the decay across bands is the autocorrelation
    RANGE.  One forward fan at the largest ring on the aggregate
    raster, per-band aggregation from one pair stream, never k
    passes; decimal(38)/HUGEINT ratios with shared truncation."""
    flagged = _pages_flagged(spark, sf_dir)
    cells = spatial.assign_cells(flagged).withColumn(
        "tainted", ~F.col("accepted")
    )
    rollup = spatial.tile_rollup(cells).select("cell", "n_pages")
    return spatial.morans_correlogram(rollup, "n_pages", max_band=3)


def q_video_ssim(spark, sf_dir):
    """Exact per-block SSIM between consecutive frames
    (multimodal.video_block_ssim) over the cut-video synth: float
    SSIM is engine-divergent, so the formula clears by n⁴ into one
    integer rational (declared C1/C2 luma constants, sign-decomposed
    ppm division) — a static block scores exactly 10⁶ by algebra and
    the planted cuts drop every body block below it.  The oracle
    regenerates every pixel and rebuilds the cross term from a
    consecutive-frame pixel self-join, so decode, block sums and
    every ratio are hash-verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_cut_video_media(
        spark, n=8, w=16, h=12, n_frames=24, scene_len=8
    )
    return multimodal.video_block_ssim(media, block=4)


def q_audio_haar(spark, sf_dir):
    """Haar wavelet band energies (multimodal.audio_haar_energy) over
    the gated PCM synth: the float-free spectral profile — an FFT's
    irrational twiddles can never hash-match across engines, but the
    unnormalized Haar ladder is pure integer adds/subtracts, and its
    band energies still separate the planted regimes (the quiet
    sawtooth's energy concentrates in band 1; the loud ramp's in the
    band-0 trend).  The oracle replays every sample through the
    CLOSED-FORM ±1 sign pattern — grouped sums, no recursion — so the
    operator's reshape ladder is what's verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_gated_pcm_media(
        spark, n=8, n_samples=2048, burst=256
    )
    return multimodal.audio_haar_energy(
        media, frame_samples=256, levels=3
    )


def q_audio_onsets(spark, sf_dir):
    """Spectral-flux onsets (multimodal.audio_onsets) over the gated
    PCM synth: half-wave-rectified Haar-band energy flux,
    thresholded against 1.5× the clip's own mean flux with the
    comparison cross-multiplied — onsets land exactly on the
    planted quiet→loud burst attacks while the releases stay
    silent.  Composes on the verified float-free haar layer; the
    oracle feeds the haar twin's grouped ±1 sums through the
    identical flux + threshold."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_gated_pcm_media(
        spark, n=8, n_samples=2048, burst=256
    )
    return multimodal.audio_onsets(
        media, frame_samples=256, levels=3, thr_num=3, thr_den=2
    )


def q_audio_zcr(spark, sf_dir):
    """Per-frame zero-crossing + peak stats
    (multimodal.audio_zcr_frames) over the gated PCM synth: the
    spectral-content proxy beside audio_silence's energy — the
    planted quiet bursts are period-7 sawtooths whose ZCR is ~18×
    the loud ramp's (structural regime separation).  Crossings are
    strict sign flips counted frame-locally; the oracle replays
    every sample via LAG inside the (clip, frame) partition."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_gated_pcm_media(
        spark, n=8, n_samples=2048, burst=256
    )
    return multimodal.audio_zcr_frames(media, frame_samples=256)


def q_audio_pitch(spark, sf_dir):
    """Per-frame autocorrelation pitch (multimodal.audio_pitch_frames)
    over square-wave PCM with STRUCTURAL planted periods: clip id has
    period P = 16 + (id mod 5)*8, and exact integer R(tau) peaks at
    tau = P among lags 8..64 with a smallest-lag tie-break.  The
    oracle regenerates every sample from the closed form and computes
    R(tau) as a frame-local lag self-join — decode, window algebra,
    and argmax all hash-verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_square_pcm_media(
        spark, n=8, n_samples=1024
    )
    return multimodal.audio_pitch_frames(
        media, frame_samples=256, min_lag=8, max_lag=64
    )


def q_image_gradients(spark, sf_dir):
    """Exact Sobel gradient rollup (multimodal.image_gradients) over
    the deterministic raw-RGB images: channel-sum luma, the standard
    3×3 kernel pair on interior pixels, L1 magnitudes (no sqrt),
    per-image interior count / total energy / max / edge count.  The
    oracle regenerates every pixel and replays the kernel as a 3×3
    VALUES join — decode, kernel, and rollup all hash-verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_gradients(media)


def q_image_box_contrast(spark, sf_dir):
    """Integral-image local contrast (multimodal.image_box_contrast)
    over the deterministic raw-RGB images: per-pixel |A·g − boxsum|
    against the (2r+1)² neighborhood via ONE 2-D prefix sum (O(1) per
    pixel), rolled to per-image blur/blank stats.  The oracle
    regenerates every pixel and computes the same boxes by the DIRECT
    25-tap join, so the integral-image shortcut is what's verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_box_contrast(media)


def q_curation_verdict(spark, sf_dir):
    """End-to-end curation verdict (textops.curation_verdict): the
    gopher rule battery, the published repetition drop rule, the
    hapax-gibberish ratio, and the per-lang median/MAD length
    outlier, composed into one keep/drop row with a reason bitmask —
    the table a pretraining run materializes before dedup.  Pure
    composition; the twin joins the four component oracles, so the
    driver hash-verifies the composition itself."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.curation_verdict(docs)


def q_embedding_silhouette(spark, sf_dir):
    """Centroid silhouette of the labeled embedding set
    (evaluation.silhouette_centroid): per point the exact quantized
    cohesion/separation pair and the (b−a)·10⁶ DIV max(a,b) score in
    decimal(38)/HUGEINT — the clustering report card (negative =
    closer to a foreign centroid).  One posexplode + broadcast
    centroid join + two conditional aggregates; the oracle inlines
    the M-step exactly like the k-means round."""
    from openstreetmap_license_change_spark.operators import evaluation

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return evaluation.silhouette_centroid(emb)


def q_quality_calibration(spark, sf_dir):
    """Reliability bins (evaluation.calibration_bins): does the
    within-lang length percentile (quality_calibrate's pct_m) predict
    the gopher keep verdict?  Per equal-width score decile the count,
    mean predicted ppm, and observed keep rate — exact ints,
    densified bins, loud out-of-range guard on BOTH engines.  The
    twin composes the percentile and gopher oracles under the same
    binning."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    pc = textops.percentile_calibrate(
        docs, "n_chars", ["lang"], ["doc_id"]
    ).select("doc_id", "pct_m")
    gf = textops.gopher_filter(docs).select("doc_id", "keep")
    return evaluation.calibration_bins(
        pc.join(gf, "doc_id"), "pct_m", "keep"
    )


def q_ece_quality(spark, sf_dir):
    """Expected/maximum calibration error (evaluation.ece_eval) of
    the length-percentile score against the gopher keep verdict —
    the single thresholdable number over q_quality_calibration's
    diagram.  The bin weights cancel the bin denominators
    (ECE·N = Σ_b |p_b·10⁶ − s_b|), so ECE is ONE floored division of
    an exact integer sum; MCE keeps one bounded division per
    occupied bin."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    pc = textops.percentile_calibrate(
        docs, "n_chars", ["lang"], ["doc_id"]
    ).select("doc_id", "pct_m")
    gf = textops.gopher_filter(docs).select("doc_id", "keep")
    return evaluation.ece_eval(
        pc.join(gf, "doc_id"), "pct_m", "keep"
    )


def q_brier_quality(spark, sf_dir):
    """Brier score (evaluation.brier_score) per language: how well
    does the within-lang length percentile PREDICT the gopher keep
    verdict, as the single proper-scoring number (confident wrongness
    punished) beside q_quality_calibration's bin table — exact ppm²
    square sums, one declared floor each for the score and the
    no-skill uncertainty floor."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    pc = textops.percentile_calibrate(
        docs, "n_chars", ["lang"], ["doc_id"]
    ).select("doc_id", "lang", "pct_m")
    gf = textops.gopher_filter(docs).select("doc_id", "keep")
    return evaluation.brier_score(
        pc.join(gf, "doc_id"), "lang", "pct_m", "keep"
    )


def q_isotonic_calibration(spark, sf_dir):
    """Isotonic (PAVA) calibration fit per lang
    (evaluation.isotonic_calibrate): the monotone repair of the
    quality_calibration reliability curve, computed by the order-free
    min-max closed form over ppm-floored block rates (floor commutes
    with min/max, so the integer nest equals ⌊10⁶·exact fit⌋); same
    percentile-score → gopher-keep pairing as quality_calibration,
    keyed by lang so the per-key joins stay bounded."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    pc = textops.percentile_calibrate(
        docs, "n_chars", ["lang"], ["doc_id"]
    ).select("doc_id", "lang", "pct_m")
    gf = textops.gopher_filter(docs).select("doc_id", "keep")
    return evaluation.isotonic_calibrate(
        pc.join(gf, "doc_id"), "pct_m", "keep", ["lang"], n_bins=10
    )


def q_bootstrap_doclen(spark, sf_dir):
    """Poisson-bootstrap replicate means of document length
    (evaluation.bootstrap_means): 20 deterministic replicates — each
    row reweighted by the frozen Poisson(1) inverse-CDF of the
    avalanche-mixed (id, rep) hash — giving the error bar on the
    corpus mean; one literal fan + one tiny groupBy, identical
    replicates on any engine/parallelism."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    return evaluation.bootstrap_means(docs, "doc_id", "n_chars",
                                      n_reps=20)


def q_ks_lang_lengths(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov drift test
    (evaluation.ks_two_sample): per-language one-vs-rest D over the
    document-length distribution — the exact cross-multiplied integer
    form evaluated at every pooled distinct length (a rest-side jump
    between group points can carry the max), smallest-v argmax
    tie-break, d_ppm by non-negative truncating division.  Histogram
    collapse + broadcast group grid + one window per group — never a
    pair join or permutation job."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    return evaluation.ks_two_sample(docs, "lang", "n_chars")


def q_anova_doclen(spark, sf_dir):
    """One-way ANOVA (evaluation.anova_oneway): does language explain
    document-length variance within each source slice?  The
    PARAMETRIC third axis beside ks_lang_lengths (shape) and
    rank_sum_lengths (robust location) on the same corpus — exact
    totals-form SSB/SSW in once-floored micro-units, F and η² each
    under one declared division, two nested map-side-partial
    aggregations and nothing else."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    return evaluation.anova_oneway(docs, "source", "lang", "n_chars")


def q_fleiss_raters(spark, sf_dir):
    """Fleiss' kappa (evaluation.fleiss_kappa) per language over a
    3-rater keep/drop panel — three independent curation heuristics
    (length window 150–400, whitespace-token window 30–80, ' the '
    stopword presence) treated as anonymous annotators: do the repo's
    cheap filters agree beyond chance, per language?  Cleared-integer
    κ, sign-decomposed division, rectangular panel by construction
    (every doc gets exactly three ratings)."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    verd = docs.select(
        "doc_id", "lang",
        F.col("n_chars").between(150, 400).alias("v_len"),
        F.expr(
            "size(filter(split(text, '\\\\s+'), t -> t <> ''))"
        ).between(30, 80).alias("v_tok"),
        (F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
         .like("% the %")).alias("v_stop"),
    )
    long = verd.select(
        F.col("lang").alias("grp"), F.col("doc_id").alias("it"),
        F.explode(
            F.array(
                F.when(F.col("v_len"), "keep").otherwise("drop"),
                F.when(F.col("v_tok"), "keep").otherwise("drop"),
                F.when(F.col("v_stop"), "keep").otherwise("drop"),
            )
        ).alias("cat"),
    )
    return evaluation.fleiss_kappa(long, "grp", "it", "cat")


def q_graph_diameter(spark, sf_dir):
    """Double-sweep diameter bound (graph.graph_diameter) over the
    shared doc link graph (undirected): BFS from the min node, BFS
    again from the farthest node found — the crawl-width health
    metric without an all-pairs matrix, exact-within-rounds by the
    link_distance honesty contract.  Both sweeps are frontier-only
    (2 shuffles/round); the twin inlines two unrolled BFS chains with
    the identical (dist DESC, node) argmax, so the sweep composition
    itself is hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    return graph.graph_diameter(nodes, edges, rounds=BFS_ROUNDS)


def q_dq_orders(spark, sf_dir):
    """Declarative data-quality suite (profile.dq_checks) over the
    orders table — the pre-ingest expectation gate as one verdict
    table: null/range/accepted checks fold into a SINGLE scan
    (stack-unpivoted aggregate row), uniqueness is one key-hash
    aggregation counting the full blast radius, and referential
    integrity is a distinct-build anti-join against customer.  The
    price range is deliberately biting so the exact violation COUNT
    (not just the flag) is hash-verified."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return profile_mod.dq_checks(
        orders, _DQ_ORDERS_SUITE, refs={"customer": customer}
    )


_DQ_ORDERS_SUITE = [
    ("not_null", "o_custkey"),
    ("range", "o_totalprice", 0, 200000),
    ("accepted", "o_orderstatus", ["O", "F", "P"]),
    ("unique", ("o_orderkey",)),
    ("subset", "o_custkey", ("customer", "c_custkey")),
]


_LINE_MERGE_SEGS_SQL = """(
    SELECT doc_id AS seg_id,
           CAST((doc_id // 10) % 50 AS DOUBLE)
               + (doc_id % 10) * CAST(0.0625 AS DOUBLE) AS lon1,
           CAST(((doc_id // 10) // 50) % 80 AS DOUBLE) AS lat1,
           CASE WHEN (doc_id // 10) % 5 = 0 AND doc_id % 10 = 9
                THEN CAST((doc_id // 10) % 50 AS DOUBLE)
                ELSE CAST((doc_id // 10) % 50 AS DOUBLE)
                     + (doc_id % 10 + 1) * CAST(0.0625 AS DOUBLE)
           END AS lon2,
           CAST(((doc_id // 10) // 50) % 80 AS DOUBLE) AS lat2
    FROM documents
)"""


def q_cell_polyfill(spark, sf_dir):
    """Polyfill (spatial.cell_polyfill): the complete center-in cell
    cover of the shared PIP polygon layer — the geometry→index
    materialization that turns later point-in-region queries into
    plain cell equi-joins.  Fully native: bbox enumeration from the
    broadcast layer constants (loud fan guard), exact dyadic centers,
    and the pip twins' even-odd crossing predicate as one broadcast
    edge join + parity aggregation — whole-stage codegen end to end,
    no Python ray cast."""
    return spatial.cell_polyfill(spark, PIP_POLYGONS, res_deg=0.25)


def q_line_merge(spark, sf_dir):
    """Segment stitching (spatial.line_merge): deterministic
    10-segment chains from the documents table (every 5th chain
    closed into a ring) dissolve back into whole polylines — star
    adjacency at shared fixed-point endpoints (never the C(d,2)
    junction pairs), components by min-label pointer jumping, and the
    oracle re-derives them with a recursive one-hop closure, so the
    doubling shortcut itself is hash-verified along with the
    ring/open-end readout.  All endpoint coords are 1/16° lattice
    points — double-exact in both engines."""
    return spatial.line_merge(_line_merge_segs(spark, sf_dir))


def _line_merge_segs(spark, sf_dir):
    """Deterministic chain/ring segment corpus shared by q_line_merge
    (dissolve) and q_route_corridor (buffered-line filter) — one
    derivation, one SQL twin (_LINE_MERGE_SEGS_SQL)."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id")
    g = F.expr("doc_id DIV 10")
    pp = F.expr("doc_id % 10")
    lon_base = (g % 50).cast("double")
    lat = ((g / F.lit(50)).cast("long") % 80).cast("double")
    return docs.select(
        F.col("doc_id").alias("seg_id"),
        (lon_base + pp * F.lit(0.0625)).alias("lon1"),
        lat.alias("lat1"),
        F.when(
            (g % 5 == 0) & (pp == 9), lon_base
        ).otherwise(
            lon_base + (pp + 1) * F.lit(0.0625)
        ).alias("lon2"),
        lat.alias("lat2"),
    )


_CORRIDOR_PTS_SQL = """(
    SELECT doc_id AS point_id,
           CAST(doc_id % 50 AS DOUBLE)
               + (doc_id % 16) * CAST(0.0625 AS DOUBLE) AS lon,
           CAST(((doc_id // 10) // 50) % 80 AS DOUBLE)
               + (doc_id % 3) * CAST(0.046875 AS DOUBLE) AS lat
    FROM documents
)"""


def q_route_corridor(spark, sf_dir):
    """Corridor query (spatial.route_corridor): documents geotagged
    within 0.0625° of the chain/ring route network — the buffered-
    line filter WITHOUT a buffer polygon, as the verified composition
    of snap_to_segments (bbox-fan × 3×3 probe, exact rational d²) and
    one integer threshold; radius ≤ res is enforced so the one-cell
    nearest guarantee makes membership provably exact.  The planted
    point offsets (0 / 0.046875° in, 0.09375° out — binary-exact
    doubles) give the threshold real work at every sf."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id")
    pts = docs.select(
        F.col("doc_id").alias("point_id"),
        ((F.col("doc_id") % 50).cast("double")
         + (F.col("doc_id") % 16) * F.lit(0.0625)).alias("lon"),
        ((F.expr("(doc_id DIV 10) DIV 50") % 80).cast("double")
         + (F.col("doc_id") % 3) * F.lit(0.046875)).alias("lat"),
    )
    return spatial.route_corridor(
        pts, _line_merge_segs(spark, sf_dir), 0.25, 0.0625
    )


KNOX_ARGS = dict(delta_deg=0.25, tau=3_600)


def q_knox(spark, sf_dir):
    """Knox space–time interaction test (spatial.knox_test) over the
    drift-geocoded event stream: are events close on the map
    (≤ 0.25°) also close in time (≤ 1 h)?  Same-user tracks cluster
    tightly in space while their events spread across the corpus
    window, so interaction is real but partial (ratio ≈ 2.8·10⁶ —
    every branch of the statistic carries nonzero mass at every sf).
    Pure exact pair counts — the space side via the house cell
    equi-join (3×3 probe, id< order), the time side via the 1-D
    τ-bucket analogue, the independence expectation cleared in
    decimal(38).  The loud max_bucket guard rides the output row
    (the assert multiplies n), so column pruning can never silence
    it."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        F.col("event_id").alias("doc_id"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) "
            "DIV 1000000 AS BIGINT)"
        ).alias("t"),
    )
    return spatial.knox_test(pts, **KNOX_ARGS)


VITERBI_PENS = dict(pen_adj=20_000_000, pen_far=4_000_000_000)


def q_viterbi_match(spark, sf_dir):
    """HMM map-matching (spatial.viterbi_match): tracks wobbling
    ±0.03125° around the chain/ring lattice network match JOINTLY
    via Viterbi — emission = the snap kit's exact rational d²,
    transition = the two-tier switch penalty (same segment free,
    endpoint-adjacent cheap, jump expensive), so the matched path
    hugs each chain through the junctions instead of flip-flopping.
    Candidate generation is the snap cell equi-join; the DP is
    Arrow-batched per track; the oracle unrolls the DP per step with
    min(STRUCT) argmins and a carried path string, so every match
    and distance is hash-verified."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id")
    g = F.expr("doc_id DIV 10")
    j = F.expr("doc_id % 10")
    pts = docs.select(
        g.alias("entity"),
        j.alias("seq"),
        ((g % 50).cast("double") + j * F.lit(0.0625)
         + F.lit(0.03125)).alias("lon"),
        (((g / F.lit(50)).cast("long") % 80).cast("double")
         + ((j % 3) - 1) * F.lit(0.03125)).alias("lat"),
    )
    return spatial.viterbi_match(
        pts, _line_merge_segs(spark, sf_dir), 0.25,
        max_points=16, **VITERBI_PENS,
    )


def q_krippendorff(spark, sf_dir):
    """Krippendorff's alpha (evaluation.krippendorff_alpha) per
    language over a RAGGED version of the fleiss_raters panel — the
    same three curation heuristics, but each rater skips a
    deterministic residue class of documents (rater availability in a
    real annotation job), producing items with 3, 2, 1, or 0 ratings.
    α handles exactly the panels fleiss_kappa refuses loudly:
    single-rating items drop per the definition, the rest clear to
    one exact rational via the shared LCM(1..12) constant."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    verd = docs.select(
        "doc_id", "lang",
        F.col("n_chars").between(150, 400).alias("v_len"),
        F.expr(
            "size(filter(split(text, '\\\\s+'), t -> t <> ''))"
        ).between(30, 80).alias("v_tok"),
        (F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
         .like("% the %")).alias("v_stop"),
    )
    cat = (lambda v: F.when(F.col(v), "keep").otherwise("drop"))
    long = verd.select(
        F.col("lang").alias("grp"), F.col("doc_id").alias("it"),
        F.explode(
            F.array(
                F.when(F.expr("doc_id % 5 <> 0"), cat("v_len")),
                F.when(F.expr("doc_id % 3 <> 0"), cat("v_tok")),
                F.when(F.expr("doc_id % 7 <> 2"), cat("v_stop")),
            )
        ).alias("cat"),
    ).where(F.col("cat").isNotNull())
    return evaluation.krippendorff_alpha(long, "grp", "it", "cat")


def q_benford_chars(spark, sf_dir):
    """Benford first-digit audit (profile.benford_profile) of the
    document-length column per language — the forensic
    synthetic-data detector as a dense 9-digit grid with exact
    floored obs/dev/TVD ppm against the declared log10(1+1/d)
    constants; non-positive rows counted, never silently dropped."""
    docs = pages_src.documents(spark, sf_dir)
    return profile_mod.benford_profile(docs, "lang", "n_chars")


def q_gini_gain_tokens(spark, sf_dir):
    """Decision-split token scoring (textops.gini_gain_tokens): top
    tokens by exact ppm Gini-impurity gain of their presence split
    against the language label — the purity-delta companion of
    chi2_tokens' significance ranking (they disagree on
    rare-but-perfect separators by design).  Per-branch declared
    floors in DECIMAL(38), absent branch from the ΣC²−2ΣCp+Σp²
    identity (never densified), TakeOrderedAndProject top-k."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.gini_gain_tokens(docs, k=25, min_df=2)


def q_quantile_normalize(spark, sf_dir):
    """Cross-language quantile normalization
    (profile.quantile_normalize) of document lengths: per-lang
    nearest-rank 20-point grids mapped onto the cross-slice reference
    mean — the mapping table that makes a per-slice score comparable
    corpus-wide (quality_calibrate ranks WITHIN a slice; this aligns
    scales ACROSS slices).  (value, id) total order; sign-decomposed
    reference floor; Q·|slices|-bounded after the one window pass."""
    docs = pages_src.documents(spark, sf_dir)
    return profile_mod.quantile_normalize(
        docs, "lang", "doc_id", "n_chars", q_bins=20
    )


def q_trimmed_mean(spark, sf_dir):
    """Per-language 10% trimmed mean of document length
    (profile.trimmed_mean): the robust location estimate between the
    mean (one 100 MB doc wrecks it) and the median (one rank) —
    positional nearest-rank trim (k = (n·ppm) DIV 10⁶ each side,
    stated), exact sums, one sign-decomposed division, one key
    shuffle for rank window + filtered aggregation."""
    docs = pages_src.documents(spark, sf_dir)
    return profile_mod.trimmed_mean(
        docs, "lang", "n_chars", trim_ppm=100_000
    )


def q_k_anonymity(spark, sf_dir):
    """k-anonymity generalization ladder (profile.k_anonymity_ladder)
    over (lang, source) × length quasi-identifiers: per level the
    class count, violating-class count, and exact row-suppression
    cost — the privacy gate a dataset release runs, as one table
    instead of k manual queries.  Fixed |levels| passes, each one
    map-side-partial aggregation."""
    docs = pages_src.documents(spark, sf_dir)
    return profile_mod.k_anonymity_ladder(
        docs, ["lang", "source"], "n_chars", k=5,
        dividers=(1, 100, 0),
    )


def q_l_diversity(spark, sf_dir):
    """Distinct l-diversity ladder (profile.l_diversity_ladder) over
    the k_anonymity quasi-identifiers with `source` as the SENSITIVE
    attribute: per generalization level the classes whose sensitive
    diversity falls below l and the exact suppression cost — the
    homogeneity-attack gate k-anonymity cannot see (a k-anonymous
    class that is all one source still leaks provenance).  Fixed
    |levels| passes, each one aggregation with a single-Expand exact
    count(DISTINCT)."""
    docs = pages_src.documents(spark, sf_dir)
    return profile_mod.l_diversity_ladder(
        docs, ["lang"], "n_chars", "source", l=3,
        dividers=(1, 100, 0),
    )


def q_t_closeness(spark, sf_dir):
    """t-closeness report (profile.t_closeness_report): per
    (lang, length-bucket) equivalence class the EXACT total-variation
    distance between the class's source distribution and the
    corpus-wide one, in cross-multiplied decimal(38) integers with the
    absent-flavor tail folded to one closed term (the class × value
    grid is never densified).  The third privacy gate: l-diversity is
    satisfied by ANY l flavors even when a class's distribution
    screams.  One (cats, v) aggregation + keyed window + broadcast
    global histogram."""
    docs = pages_src.documents(spark, sf_dir).withColumn(
        "len_b", F.expr("CAST(n_chars AS BIGINT) DIV 200")
    )
    return profile_mod.t_closeness_report(
        docs, ["lang", "len_b"], "source", t_ppm=250_000,
    )


def q_rank_sum_lengths(spark, sf_dir):
    """Mann–Whitney rank-sum drift test (evaluation.rank_sum_test):
    per-language one-vs-rest over document lengths — the DIRECTIONAL
    companion of ks_lang_lengths (KS detects any CDF gap; the rank
    sum asks whether the slice sits above or below the rest, which is
    what 'slice X got shorter' means).  Doubled-U midranks, staged
    truncating divisions sized for Spark's int64 DIV quotients,
    tie-corrected z² with the T=0 NULL guard; the pooled cumulative
    rides the two-level bucket prefix — no unpartitioned window."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    return evaluation.rank_sum_test(docs, "lang", "n_chars")


def q_contact_episodes(spark, sf_dir):
    """Contact episodes (spatial.contact_episodes) over the same
    drift geocode as q_colocation_pairs: maximal runs of consecutive
    same-bucket 3×3-cell contacts per user pair — exposure duration
    and separate-encounter counts, which bare moment totals can't
    distinguish.  Exactly-once fan + loud occupancy guard inherited;
    the islands window runs inside each pair's own partition on the
    (pair, bucket) aggregate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    return spatial.contact_episodes(
        pts, "user_id", "ts", res_deg=COLOC_RES, window_s=COLOC_WIN_S
    )


def q_flock_groups(spark, sf_dir):
    """Flock detection (spatial.flock_groups) over the same drift
    geocode: maximal consecutive-bucket runs of one cell holding an
    IDENTICAL user set (≥2 users, ≥2 buckets) — the group-level
    convoy readout pairwise contact_episodes structurally can't see.
    Roster built once per (bucket, cell) with numeric sort + loud
    size cap; gaps-and-islands on (cell, roster)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    return spatial.flock_groups(
        pts, "user_id", "ts", res_deg=COLOC_RES, window_s=COLOC_WIN_S
    )


def q_theil_sen_hourly(spark, sf_dir):
    """Theil–Sen robust activity trend (temporal.theil_sen) per event
    type over hourly counts — the ESTIMATION companion of tile_trend's
    Mann–Kendall direction test: the slope is the MEDIAN pairwise
    slope (ppm/hour), so a single incident hour can't reprice the
    trend the way it would an OLS fit.  Truncating ppm division
    (engine-agreed toward-zero), lower medians, loud O(n²) guard on
    series length (~686 hourly points per type here)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.date_trunc("hour", "ts").cast("long") / 3600)
            .cast("long").alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return temporal_mod.theil_sen(hourly, "event_type", "h", "n")


def q_session_paths(spark, sf_dir):
    """Top-k session journeys (temporal.session_paths): the full
    ordered event-type path per session ranked by frequency — the
    navigation table between session_matrix's endpoints and
    event_transitions' memoryless pairs.  Same sessionizer and
    (ts, event_id) total order as the session family; per-session
    ordered collect bounded by a loud bot guard; the global rank
    window runs over a k-th-count pre-cut, never the full path
    vocabulary."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.session_paths(
        ev, "user_id", "ts", "event_type", "event_id",
        gap_s=1800, k=25,
    )


def q_sax_hourly(spark, sf_dir):
    """SAX symbolization (temporal.sax_words) of each event type's
    hourly-count series over the densified global hour grid: PAA
    segment means z-scored by the exact cross-multiplied comparison
    (no σ, no floats) against the frozen N(0,1) quartile table,
    12-letter words at a=4 — the motif index for series similarity.
    Zeros are values, not missing (the xcorr grid convention), so
    both engines symbolize the same aligned series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = (F.date_trunc("hour", "ts").cast("long") / 3600).cast("long")
    cnt = ev.groupBy(F.col("event_type"), h.alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    span = ev.agg(
        F.min(h).alias("h0"), F.max(h).alias("h1")
    )
    grid = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1)")).alias("h"),
        )
    )
    dense = grid.join(cnt, ["event_type", "h"], "left").select(
        "event_type", "h",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )
    return temporal_mod.sax_words(
        dense, "event_type", "h", "n", segments=12, alphabet=4
    )


def q_rfm(spark, sf_dir):
    """RFM segmentation (temporal.rfm_segments): every user scored
    1..5 on recency / frequency / monetary with GLOBAL quantile
    bins built on the declared-bucket frequency tables (hourly R
    buckets, cent-snapped dollar-unit M) — a window over distinct
    buckets per dimension, never over the user table, so the
    ranking survives 10⁹ users.  R reverses (recent = high);
    segment string "rfm" names the cell."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.rfm_segments(ev)


def q_mase_hourly(spark, sf_dir):
    """Seasonal MASE (temporal.seasonal_mase) of each event type's
    densified hourly counts at period 24 — the go/no-go seasonality
    certificate before fitting anything fancier: MASE < 10⁶ means
    "same hour yesterday" genuinely beats "same as last hour".
    Cross-multiplied exactly, zeros are values (the shared hourly
    grid), NULL only for constant series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = (F.date_trunc("hour", "ts").cast("long") / 3600).cast("long")
    cnt = ev.groupBy(F.col("event_type"), h.alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    span = ev.agg(F.min(h).alias("h0"), F.max(h).alias("h1"))
    grid = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1)")).alias("h"),
        )
    )
    dense = grid.join(cnt, ["event_type", "h"], "left").select(
        "event_type", "h",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )
    return temporal_mod.seasonal_mase(
        dense, "event_type", "h", "n", season=24
    )


def q_survival_km(spark, sf_dir):
    """Kaplan–Meier survival with right-censoring
    (temporal.survival_km): the churn curve event_retention can't
    ask — users whose fate is unknown at corpus end leave the risk
    set without counting as churn.  Lifetime = hourly-bucket
    activity span; churn iff the corpus outlives the last activity
    by > 24 buckets.  Exact quantized floor ladder over the
    |distinct lifetimes| step table via ONE aggregate() fold — no
    windows, no Python, corpus-size-independent sequential part."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.survival_km(
        ev, "user_id", "ts", bucket_s=3600, horizon=24,
    )


EMST_SCALE = 10_000
EMST_RES = 30 * EMST_SCALE
EMST_CAP = 12


def q_emst_tiles(spark, sf_dir):
    """Per-tile Euclidean minimum spanning forest
    (graph.boruvka_msf): the latest page positions, capped at 12
    per 30° tile by a declared deterministic rule (smallest doc_id
    — a bounded planning sample, stated), pair up within their tile
    with exact fixed-point d² weights, and the GLOBAL parallel
    Borůvka operator extracts the unique minimum spanning forest
    under the (w, a, b) total order — the single-linkage backbone /
    minimal-backhaul answer per region.  The oracle re-derives the
    forest from Kruskal's cut-property invariant via a recursive
    smaller-edge closure — a different algorithm family — so the
    hooking + pointer-jumping rounds are what the hash verifies."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["doc_id", "lon", "lat"]
    )
    sc = EMST_SCALE
    pts = latest.select(
        F.col("doc_id").alias("pid"),
        (F.round(F.col("lon") * sc).cast("bigint") + 180 * sc)
        .alias("x"),
        (F.round(F.col("lat") * sc).cast("bigint") + 90 * sc)
        .alias("y"),
    ).withColumn(
        "cell",
        F.expr(f"(y DIV {EMST_RES}) * 1000000 + (x DIV {EMST_RES})"),
    )
    capped = (
        pts.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("cell").orderBy("pid")),
        )
        .where(F.col("rn") <= EMST_CAP)
        .select("pid", "x", "y", "cell")
    )
    a = capped.select(
        F.col("pid").alias("_pa"), F.col("x").alias("_xa"),
        F.col("y").alias("_ya"), "cell",
    )
    b = capped.select(
        F.col("pid").alias("_pb"), F.col("x").alias("_xb"),
        F.col("y").alias("_yb"), "cell",
    )
    edges = (
        a.join(b, "cell")
        .where(F.col("_pa") < F.col("_pb"))
        .select(
            F.col("_pa").alias("id_a"),
            F.col("_pb").alias("id_b"),
            (
                (F.col("_xa") - F.col("_xb"))
                * (F.col("_xa") - F.col("_xb"))
                + (F.col("_ya") - F.col("_yb"))
                * (F.col("_ya") - F.col("_yb"))
            ).alias("w"),
        )
    )
    return graph.boruvka_msf(edges)


def q_kfold_assign(spark, sf_dir):
    """Stratified k-fold assignment (sampling.kfold_assign): 5-fold
    cross-validation folds per language with GROUP atomicity (the
    source/id-bundle stands in for a near-dup cluster — a group
    never straddles folds) and EXACT ±1 per-stratum balance — the
    property grouped_split's hash-ratio routing cannot give.  Rank
    runs over the distinct-group table by the avalanche-mixed hash
    with a total-order tie-break, so folds are deterministic and
    parallelism-exact."""
    docs = pages_src.documents(spark, sf_dir)
    grouped = docs.select(
        "doc_id", "lang",
        F.concat(
            F.col("source"), F.lit("/"),
            (F.col("doc_id") / 20).cast("bigint").cast("string"),
        ).alias("bundle"),
    )
    out = sampling.kfold_assign(grouped, "lang", "bundle", k=5)
    return out.select("doc_id", "lang", "bundle", "fold")


def q_conformal_bounds(spark, sf_dir):
    """Split-conformal length bounds (evaluation.conformal_thresholds)
    per language: the even-doc half calibrates the exact
    ceil((n+1)(1−α)) nearest-rank threshold on n_chars at α = 0.1
    (abstain = NULL when the rank exceeds n — the honest branch),
    the odd-doc half audits the finite-sample coverage with exact
    counts — the distribution-free certificate for a length-based
    curation filter.  One window rank + one conditional count; every
    value integer."""
    docs = pages_src.documents(spark, sf_dir)
    calib = docs.where(F.col("doc_id") % 2 == 0)
    test = docs.where(F.col("doc_id") % 2 == 1)
    return evaluation.conformal_thresholds(
        calib, test, "lang", "n_chars", alpha_ppm=100_000
    )


SPRT_C1, SPRT_C0 = 200_671, -200_671   # ln(.55/.45) ppm, frozen
SPRT_A, SPRT_B = 2_944_439, -2_944_439  # ln(19) ppm (α=β=0.05)


def q_sprt_decision(spark, sf_dir):
    """Wald sequential probability ratio test
    (evaluation.sprt_decision) per event type — the sequential
    sibling of ab_test's fixed-horizon chi-square: conversion trials
    (success = even (user_id + event_id), a deterministic balanced
    Bernoulli) scanned in event order, stopping at the FIRST exit
    from the Wald band under frozen ln-constants (H0 p=.45 vs H1
    p=.55 at α=β=.05 — no engine calls ln()).  One keyed window
    cumsum + one min(struct) argmin; the uniqueness of the trial
    order is loudly guarded."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    trials = ev.select(
        "event_type",
        F.col("event_id").alias("t"),
        ((F.col("user_id") + F.col("event_id")) % 2 == 0)
        .alias("s"),
    )
    return evaluation.sprt_decision(
        trials, "event_type", "t", "s",
        SPRT_C1, SPRT_C0, SPRT_A, SPRT_B,
    )


def q_best_streak(spark, sf_dir):
    """Peak demand window (temporal.max_subarray): per event type,
    the maximum-sum contiguous run of hourly count deviations
    (count − floor-mean) over the DENSIFIED global hour grid —
    Kadane's scan as one aggregate() struct fold with the declared
    restart/first-maximal tie rules, hash-verified against the
    prefix-sum + latest-argmin characterization (a different
    mechanism).  Zeros are values, not missing — the event_xcorr
    densify convention."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hb = ev.select(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) "
            "DIV 3600000000 AS BIGINT)"
        ).alias("h"),
    )
    span = hb.agg(
        F.min("h").alias("_h0"), F.max("h").alias("_h1")
    )
    grid = (
        hb.select("event_type").distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type", "_h0", "_h1",
            F.explode(F.sequence("_h0", "_h1")).alias("h"),
        )
    )
    cnt = hb.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("_n")
    )
    tot = hb.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_tot")
    )
    x = (
        grid.join(cnt, ["event_type", "h"], "left")
        .join(tot, "event_type")
        .select(
            "event_type", F.col("h").alias("t"),
            (
                F.coalesce("_n", F.lit(0))
                - F.expr("_tot DIV (_h1 - _h0 + 1)")
            ).alias("x"),
        )
    )
    return temporal_mod.max_subarray(x, "event_type", "t", "x")


def q_event_bursts(spark, sf_dir):
    """Kleinberg burst detection (temporal.kleinberg_bursts): every
    per-user inter-event gap labeled base/burst by the two-state
    Viterbi automaton — the "is this activity spike a burst?"
    question slot_anomalies answers only per calendar bucket.  All
    path costs are exact integers (gaps in ms, emission and switch
    costs cleared by T·1e6, ln 2 as the frozen LN2_PPM constant,
    burst rate 2× base), and the declared predecessor/final tie
    rules make the path unique, so every state label hash-verifies
    against the DuckDB unrolled-DP twin (MIN(STRUCT) argmins with a
    carried path string).  The per-key DP is O(n) over 2 states,
    Arrow-batched, behind a loud max_events guard."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.kleinberg_bursts(
        ev, "user_id", "ts",
        s_exp=1, switch_ppm=temporal_mod.LN2_PPM, max_events=128,
    )


def q_event_xcorr(spark, sf_dir):
    """Lag-scan cross-correlation (temporal.series_crosscorr):
    click-rate vs purchase-rate per user shard over the DENSIFIED
    hourly grid — the lead/lag question autocorr structurally can't
    ask, scored as signed squared correlation under the staged
    sign-decomposed division (two denominators would square past
    decimal(38) at scale).  Zeros are values, not missing: the grid
    is the global [hmin, hmax] hour range per shard, so both engines
    correlate the same aligned series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = (F.date_trunc("hour", "ts").cast("long") / 3600).cast("long")
    cnt = ev.groupBy(
        (F.col("user_id") % 8).alias("shard"), h.alias("h")
    ).agg(
        F.count_if(F.col("event_type") == "click").alias("x"),
        F.count_if(F.col("event_type") == "purchase").alias("y"),
    )
    grid = (
        ev.agg(F.min(h).alias("_h0"), F.max(h).alias("_h1"))
        .selectExpr("explode(sequence(_h0, _h1)) AS h")
        .crossJoin(spark.range(8).select(F.col("id").alias("shard")))
    )
    series = grid.join(cnt, ["shard", "h"], "left").select(
        "shard", "h",
        F.coalesce("x", F.lit(0)).alias("x"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    return temporal_mod.series_crosscorr(
        series, "shard", "h", "x", "y", lags=(-3, -2, -1, 0, 1, 2, 3)
    )


def q_pettitt_hourly(spark, sf_dir):
    """Pettitt rank change-point (temporal.pettitt_split) per event
    type over hourly counts — the RANK-ROBUST companion of
    cusum_split: a single incident hour is one discordant rank, not
    an unbounded mean lever.  Never the O(n²) pair sum: the
    antisymmetric identity U_t = Σ_{i≤t} V_i reduces it to a value-
    histogram cumulative plus one time-order prefix sum, two windows
    on one key shuffle."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.date_trunc("hour", "ts").cast("long") / 3600)
            .cast("long").alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return temporal_mod.pettitt_split(hourly, "event_type", "h", "n")


def q_ols_hourly(spark, sf_dir):
    """Exact OLS activity trend (temporal.ols_fit) per event type
    over hourly counts — the efficient-estimator A/B row beside
    theil_sen_hourly on the SAME series (disagreement between the two
    slopes is itself the robustness diagnostic).  One hash
    aggregation, cleared-integer slope/intercept/R² in ppm,
    sign-decomposed truncating division, algebraic rebase to the
    key's own first hour."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.date_trunc("hour", "ts").cast("long") / 3600)
            .cast("long").alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return temporal_mod.ols_fit(hourly, "event_type", "h", "n")


def q_runs_test_hourly(spark, sf_dir):
    """Wald–Wolfowitz runs test (temporal.runs_test) per event type
    over hourly counts — the randomness-of-sequence axis beside
    pettitt (single break) and cusum (mean drift): clumping or
    alternation around the series' own median, exact n-cleared z² in
    ppm with the cross-multiplied χ²₁ 0.05 verdict.  One key shuffle
    serves the median window, the join-back, and the flip window."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.date_trunc("hour", "ts").cast("long") / 3600)
            .cast("long").alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return temporal_mod.runs_test(hourly, "event_type", "h", "n")


def q_twa_value(spark, sf_dir):
    """Time-weighted average (temporal.time_weighted_avg) of the
    event value signal per event type — the irregular-sampling-safe
    state aggregate (LOCF over exact µs durations, ×10⁴-quantized
    values, one sign-decomposed division) that a row-average gets
    wrong whenever reporting cadence correlates with level.  One key
    shuffle serves the LEAD window and the aggregation."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t_us"),
        F.round(F.col("value") * 10000).cast("bigint").alias("v_q"),
    )
    return temporal_mod.time_weighted_avg(
        pts, "event_type", "t_us", "v_q"
    )


def q_session_matrix(spark, sf_dir):
    """Session entry→exit matrix (temporal.session_entry_exit) over
    the 30-minute gap sessionization: where sessions start, where
    they end, and the bounce diagonal — first/last picked by ONE
    min/max(struct) pair under the (ts, event_id) total order; one
    user shuffle serves the gap window, the running session sum, and
    the per-session aggregation."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.session_entry_exit(
        ev, "user_id", "ts", "event_type", "event_id", gap_s=1800
    )


def q_bpe_pairs(spark, sf_dir):
    """First BPE merge round (textops.bpe_pair_counts): adjacent-
    symbol pair counts over the documents corpus, word-frequency
    weighted via the Sennrich vocabulary decomposition (corpus-sized
    scan → vocab-sized fan), '</w>' end markers, exact int64 counts,
    deterministic top-200 under the (n DESC, sym_a, sym_b) total
    order (TakeOrderedAndProject, no global window)."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.bpe_pair_counts(docs, top_k=200)


def q_tfidf_topk(spark, sf_dir):
    """Top-5 characteristic terms per doc by exact-integer tf-idf
    (textops.tfidf_topk, raw-inverse-frequency idf): two partial-agg
    groupBys + a token-keyed join + a WindowGroupLimit top-k."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.tfidf_topk(docs, k=5)


def q_text_tiles(spark, sf_dir):
    """TextTiling segmentation (textops.text_tiles): where does a
    document change subject?  Squared-cosine similarity between
    adjacent 20-token term-count blocks (the √-free exact form,
    cross-multiplied in decimal/HUGEINT), boundaries at strict
    valleys below ⅘ of the document's own mean gap similarity —
    the topic-aware cut chunk_documents' size-based splitter can't
    see.  Adjacent-block dot via a (doc, token)-keyed join, never
    block×block; one doc-keyed gap window."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.text_tiles(docs, block_tokens=20)


def q_textrank(spark, sf_dir):
    """TextRank corpus keywords (textops.textrank_keywords):
    PageRank over the token co-occurrence graph — the
    graph-structural counterweight to tfidf_topk (centrality among
    travel-companion tokens, not rarity).  Window-2 raw-position
    edges built by offset-explode + (doc, position) equi-join (fan
    ≤ window per token — never the per-doc quadratic self-join),
    then the exact quantized pagerank_quantized recurrence; top-25
    cut is a total-order ORDER BY + LIMIT, no unpartitioned window.
    The oracle splices the UNMODIFIED pagerank_sql rounds over
    MATERIALIZED token/edge CTEs, so the whole composition
    hash-verifies."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.textrank_keywords(
        docs, window=2, min_len=4, iterations=6, k=25
    )


# deterministic doc-level link graph for q_doc_pagerank: 3 modular
# out-edges per doc (self-loops removed), docs ≡ 0 (mod 5) emit none —
# so the dangling-mass path is exercised at every sf.  A stand-in for
# the crawl link extractor (the synthetic html envelope carries no
# anchors); the OPERATOR is graph-agnostic.
PR_EDGE_PARAMS = ((7, 1), (13, 2), (29, 3))
PR_ITERATIONS = 6

# the same link-graph derivation as a DuckDB relation (oracle side)
_PR_EDGES_SQL = (
    "(SELECT DISTINCT src, dst FROM ("
    + " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {p} + {j}) % "
        f"(SELECT COUNT(*) FROM documents) AS dst "
        f"FROM documents WHERE doc_id % 5 <> 0"
        for p, j in PR_EDGE_PARAMS
    )
    + ") WHERE src <> dst)"
)


def _doc_link_graph(spark, sf_dir):
    """(nodes, edges) of the deterministic doc link graph shared by
    every graph-operator query (pagerank / link_distance /
    label_spread) — one derivation, one SQL twin (_PR_EDGES_SQL)."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").alias("node"))
    parts = [
        docs.where(F.col("doc_id") % 5 != 0).select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * p + j) % n).alias("dst"),
        )
        for p, j in PR_EDGE_PARAMS
    ]
    edges = (
        parts[0].unionByName(parts[1]).unionByName(parts[2])
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return nodes, edges


def q_doc_pagerank(spark, sf_dir):
    """Fixed-iteration quantized-integer PageRank
    (graph.pagerank_quantized) over the deterministic doc link graph:
    2 shuffles per round on a pre-partitioned edge list, per-round
    lineage cuts, exact int64 ranks — the DuckDB oracle unrolls the
    identical recurrence as chained CTEs (graph.pagerank_sql), so all
    6 rounds of quantization are hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.pagerank_quantized(nodes, edges, iterations=PR_ITERATIONS)
    return out.select(F.col("node").alias("doc_id"), "rank_q")


def q_betweenness(spark, sf_dir):
    """Sampled Brandes betweenness (graph.betweenness_sampled) over
    the doc link graph: the brokerage centrality none of the others
    see — 4 deterministic kmv-ranked pivots run the full forward-σ /
    backward-δ dependency accumulation at 6 hop-bounded rounds,
    one floor per DAG edge (stated), σ under a loud 2⁵⁰ cap.  The
    oracle unrolls every pivot's layers and folds, so every
    dependency quantum hash-verifies."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.betweenness_sampled(
        nodes, edges, n_sources=4, rounds=6
    )
    return out.select(F.col("node").alias("doc_id"), "bc_q")


ATTACK_KS = [0, 2, 8, 32]


def q_attack_robustness(spark, sf_dir):
    """Attack-tolerance curve (graph.attack_robustness) of the doc
    link graph: remove the top-k undirected hubs (deterministic
    kill list — degree desc, id) and re-measure the giant
    component at k ∈ {0, 2, 8, 32} — the scale-free
    shatter-under-targeting signature (Albert–Jeong–Barabási), and
    the mirror-farm dependency question for a crawl corpus.
    Components from the verified pointer-doubling kit per residual;
    the oracle replays each k through the transitive-closure twin
    in its own scope."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    return graph.attack_robustness(nodes, edges, ATTACK_KS)


def q_onion(spark, sf_dir):
    """Onion decomposition (graph.onion_layers) of the doc link
    graph: coreness + peel layer per doc — the layered refinement
    of kcore that separates a shell's periphery (peels in its first
    pass) from its inner skeleton (peels last).  One degree
    aggregate + one anti-join per pass with a loud depth bound
    (exhaustion raises rather than emit wrong coreness); the twin
    unrolls the identical passes with the running k carried as
    single-reference MATERIALIZED 1-row CTEs (the exponential
    k-chain inlining was caught by the gate)."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.onion_layers(nodes, edges, max_layers=32)
    return out.select(
        F.col("node").alias("doc_id"), "coreness", "layer"
    )


LT_THETA, LT_ROUNDS, LT_SEEDS = 300_000, 24, 8


def q_lt_influence(spark, sf_dir):
    """Linear-threshold influence cascade (graph.lt_influence) from
    the top-8 out-degree hubs of the doc link graph — the
    Kempe–Kleinberg–Tardos LT model with declared uniform
    thresholds: a doc adopts when ≥ 30% of its in-link weight
    (1e6 DIV in_degree per link, exact) is already active.  The
    operator propagates frontier-only with incremental received-
    weight sums; the oracle recomputes every round's sums from the
    FULL active set — structurally different — so the incremental
    maintenance is what the hash verifies.  A 10-round cascade with
    mass in every round at sf0.01 (probed: 8 seeds → 498 active)."""
    _, edges = _doc_link_graph(spark, sf_dir)
    seeds = (
        edges.groupBy("src").count()
        .orderBy(F.desc("count"), "src")
        .limit(LT_SEEDS)
        .select(F.col("src").alias("node"))
    )
    return graph.lt_influence(
        edges, seeds, theta_ppm=LT_THETA, max_rounds=LT_ROUNDS
    )


def q_random_failure(spark, sf_dir):
    """Random-failure tolerance (graph.attack_robustness with the
    hash kill order — the deterministic stand-in for uniform node
    failure) over the same doc graph and k grid as
    attack_robustness: the classic Albert–Jeong–Barabási contrast
    measured as a pair — scale-free structure shrugs at random
    failure and shatters under targeting, and both curves
    hash-verify."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    return graph.attack_robustness(
        nodes, edges, ATTACK_KS, strategy="hash"
    )


def q_bowtie(spark, sf_dir):
    """Bow-tie decomposition (graph.bowtie_classify) of the shared
    doc link graph — the Broder web atlas: every doc classified
    core / in / out / tube / tendril_in / tendril_out /
    disconnected around the giant SCC.  The core is exact (the SCC
    peel raises rather than split); the four region BFS passes are
    hop-bounded at 6 rounds under link_distance's honesty contract.
    One SCC peel + four frontier BFS passes, 2 shuffles/round; the
    oracle composes the transitive-closure SCC twin with four
    scoped link_distance chains, so every class hash-verifies."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.bowtie_classify(nodes, edges, rounds=6)
    return out.select(F.col("node").alias("doc_id"), "cls")


RICH_CLUB_KS = [1, 2, 4, 6, 8]


def q_rich_club(spark, sf_dir):
    """Rich-club coefficients (graph.rich_club) over the shared doc
    link graph: do the high-degree docs link preferentially to each
    other?  The hub-collusion audit beside link_assortativity's
    global correlation — φ(k) = 2E/(N(N−1)) over the undirected
    simplification at five declared degree thresholds, computed by
    ONE conditional-sum pass (never a rescan per k), exact ppm."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    return graph.rich_club(nodes, edges, RICH_CLUB_KS)


def q_hyperball(spark, sf_dir):
    """HyperBall neighborhood function + harmonic centrality
    (graph.hyperball_centrality) over the shared doc link graph —
    the all-pairs-BFS answer at one-sketch-per-node cost, with the
    engine's deterministic KMV bottom-k sketch standing in for the
    published HLL so both engines are bit-identical (exact below
    k=16 reachable, KMV-estimated above).  4 rounds, LCM-cleared
    1/d weights; 2 shuffles/round on the pre-partitioned edge list.
    The oracle unrolls the identical merge/estimate/ladder rounds,
    so every ball estimate and harmonic score hash-verifies."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.hyperball_centrality(nodes, edges, rounds=4, k=16)
    return out.select(
        F.col("node").alias("doc_id"), "ball_est", "harm_q"
    )


def q_katz_centrality(spark, sf_dir):
    """Katz centrality (graph.katz_quantized) over the shared doc
    link graph: attenuated-path-count authority as the structural
    contrast to doc_pagerank — every in-link delivers its source's
    FULL attenuated score (no outdegree split, no dangling mass), so
    hubs amplify instead of diluting.  Exact quantized int64 after 6
    rounds, 2 shuffles/round, loud 2^55 growth guard; the oracle
    unrolls the identical recurrence as chained CTEs, so every
    round's quantization is hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    out = graph.katz_quantized(nodes, edges, iterations=PR_ITERATIONS)
    return out.select(F.col("node").alias("doc_id"), "katz_q")


BFS_ROUNDS = 6
LS_ROUNDS = 5

# BM25 query mixes the one genuinely rare term (df≈5% of docs) with two
# near-ubiquitous ones, so the idf spread — not just tf — decides ranks
BM25_QUERY = ["dup", "scan", "merge"]
BM25_K = 10


# stay-point query shares q_trip_segments' drift geocode: the 1°-jump-
# every-25th-point makes cell runs ~25 points long, so dwell filtering
# has real work at every sf
# every literal is ::DOUBLE-pinned: DuckDB would otherwise run the
# geocode in exact DECIMAL and floor(lon·10⁶) lands one ulp away from
# Spark's double arithmetic (the float32-promotion trap's decimal twin)
_STAY_PTS_SQL = """(
    SELECT user_id, ts, event_id,
           CAST(-45.0 AS DOUBLE) + (user_id % 120) * CAST(0.5 AS DOUBLE)
               + CAST(0.001 AS DOUBLE) * rn
               + CAST(1.0 AS DOUBLE) * floor(rn / 25) AS lat,
           CAST(-100.0 AS DOUBLE) + (user_id % 140) * CAST(1.0 AS DOUBLE)
               + CAST(0.002 AS DOUBLE) * rn AS lon
    FROM (SELECT user_id, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events) t
)"""


def q_stay_points(spark, sf_dir):
    """Stay-point detection (spatial.stay_points): the gaps-and-
    islands grid-stay formulation — maximal same-cell runs per user
    with integer-µs dwell filtering and µdeg-quantized centroids, one
    window sort + one groupBy; the DuckDB twin runs the identical
    recurrence, so every stay boundary, dwell and centroid is
    hash-verified."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts", "event_id",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    return spatial.stay_points(
        pts, "user_id", "ts",
        min_duration_s=1800, min_points=3, tiebreak=("event_id",),
    )


HAUS_MAX_RN = 64

_HAUS_PTS_SQL = """(
    SELECT user_id AS entity, lon, lat FROM (
        SELECT user_id, rn,
               CAST(-45.0 AS DOUBLE)
                   + (user_id % 120) * CAST(0.5 AS DOUBLE)
                   + CAST(0.001 AS DOUBLE) * rn
                   + CAST(1.0 AS DOUBLE) * floor(rn / 25) AS lat,
               CAST(-100.0 AS DOUBLE)
                   + (user_id % 140) * CAST(1.0 AS DOUBLE)
                   + CAST(0.002 AS DOUBLE) * rn AS lon
        FROM (SELECT user_id, ts, event_id,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events) t
    ) WHERE rn <= 64
)"""

_HAUS_PAIRS_SQL = f"""(
    SELECT DISTINCT a.entity AS id_a, b.entity AS id_b
    FROM (SELECT DISTINCT entity, floor(lon / 2) AS bx,
                 floor(lat / 2) AS by FROM {_HAUS_PTS_SQL}) a
    JOIN (SELECT DISTINCT entity, floor(lon / 2) AS bx,
                 floor(lat / 2) AS by FROM {_HAUS_PTS_SQL}) b
      ON a.bx = b.bx AND a.by = b.by AND a.entity < b.entity
)"""


def q_hausdorff_tracks(spark, sf_dir):
    """Symmetric Hausdorff distance between user trajectories
    (spatial.hausdorff_pairs) over the drift geocode capped at 64
    points per track: candidate pairs are users whose tracks share a
    2° cell (the blocking stage the operator contractually requires —
    never an all-pairs join), then ONE candidate point-join feeds
    both directed max-min distances in exact µdeg² integers."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = (
        ev.select("user_id", "ts", "event_id", rn.alias("rn"))
        .where(F.col("rn") <= HAUS_MAX_RN)
        .select(
            F.col("user_id").alias("entity"),
            (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
             + F.lit(0.002) * F.col("rn")).alias("lon"),
            (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
             + F.lit(0.001) * F.col("rn")
             + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        )
    )
    cells = pts.select(
        "entity",
        F.floor(F.col("lon") / 2).alias("bx"),
        F.floor(F.col("lat") / 2).alias("by"),
    ).distinct()
    pairs = (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (F.col("a.bx") == F.col("b.bx"))
            & (F.col("a.by") == F.col("b.by"))
            & (F.col("a.entity") < F.col("b.entity")),
        )
        .select(
            F.col("a.entity").alias("id_a"),
            F.col("b.entity").alias("id_b"),
        )
        .distinct()
    )
    return spatial.hausdorff_pairs(pts, pairs, entity_col="entity")


FRECHET_MAX_RN = 16

_FRECHET_PTS_SQL = """(
    SELECT user_id AS entity, rn AS seq, lon, lat FROM (
        SELECT user_id, rn,
               CAST(-45.0 AS DOUBLE)
                   + (user_id % 120) * CAST(0.5 AS DOUBLE)
                   + CAST(0.001 AS DOUBLE) * rn
                   + CAST(1.0 AS DOUBLE) * floor(rn / 25) AS lat,
               CAST(-100.0 AS DOUBLE)
                   + (user_id % 140) * CAST(1.0 AS DOUBLE)
                   + CAST(0.002 AS DOUBLE) * rn AS lon
        FROM (SELECT user_id, ts, event_id,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events) t
    ) WHERE rn <= 16
)"""

_FRECHET_PAIRS_SQL = f"""(
    SELECT DISTINCT a.entity AS id_a, b.entity AS id_b
    FROM (SELECT DISTINCT entity, floor(lon / 2) AS bx,
                 floor(lat / 2) AS by FROM {_FRECHET_PTS_SQL}) a
    JOIN (SELECT DISTINCT entity, floor(lon / 2) AS bx,
                 floor(lat / 2) AS by FROM {_FRECHET_PTS_SQL}) b
      ON a.bx = b.bx AND a.by = b.by AND a.entity < b.entity
)"""


def _drift_track_inputs(spark, sf_dir):
    """Shared (pts, pairs) build for the ordered track-DP contract
    entries (frechet_tracks / dtw_tracks): ≤16-point drift-geocode
    trajectories per user, candidate pairs = users sharing a 2° cell
    (mirrors _FRECHET_PTS_SQL / _FRECHET_PAIRS_SQL)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = (
        ev.select("user_id", "ts", "event_id", rn.alias("rn"))
        .where(F.col("rn") <= FRECHET_MAX_RN)
        .select(
            F.col("user_id").alias("entity"),
            F.col("rn").alias("seq"),
            (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
             + F.lit(0.002) * F.col("rn")).alias("lon"),
            (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
             + F.lit(0.001) * F.col("rn")
             + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        )
    )
    cells = pts.select(
        "entity",
        F.floor(F.col("lon") / 2).alias("bx"),
        F.floor(F.col("lat") / 2).alias("by"),
    ).distinct()
    pairs = (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (F.col("a.bx") == F.col("b.bx"))
            & (F.col("a.by") == F.col("b.by"))
            & (F.col("a.entity") < F.col("b.entity")),
        )
        .select(
            F.col("a.entity").alias("id_a"),
            F.col("b.entity").alias("id_b"),
        )
        .distinct()
    )
    return pts, pairs


def q_frechet_tracks(spark, sf_dir):
    """Discrete Fréchet distance between user trajectories
    (spatial.frechet_pairs) — the ORDER-AWARE sibling of
    hausdorff_tracks over the same drift geocode, capped at 16 points
    per track (the DuckDB twin unrolls the DP by anti-diagonals into
    2·16−1 chained CTEs, so the contract cap is the twin's unroll
    budget; the operator itself takes up to 4096).  Candidate pairs
    are users sharing a 2° cell; each pair carries two ≤16-point
    ordered arrays into one Arrow-batched DP — the leash walk stays
    local, pairs parallelize."""
    pts, pairs = _drift_track_inputs(spark, sf_dir)
    return spatial.frechet_pairs(
        pts, pairs, entity_col="entity", max_points=FRECHET_MAX_RN
    )


def q_dtw_tracks(spark, sf_dir):
    """Dynamic-time-warping distance between user trajectories
    (spatial.dtw_pairs) — the ACCUMULATING sibling of frechet_tracks
    over the identical drift-geocode inputs: Fréchet scores the worst
    leash on the optimal monotone walk, DTW the TOTAL squared
    deviation, so consistent small offsets (and the rn/25 lat jumps)
    add up instead of being dominated by one extremum.  Same
    per-pair Arrow-batched DP, same anti-diagonal DuckDB twin with
    the sum recurrence; the int64 path-sum bound is loud in both
    engines (operator raises, BIGINT twin raises)."""
    pts, pairs = _drift_track_inputs(spark, sf_dir)
    return spatial.dtw_pairs(
        pts, pairs, entity_col="entity", max_points=FRECHET_MAX_RN
    )


EDR_EPS_DEG = 0.6
LCSS_DELTA = 4


def q_lcss_tracks(spark, sf_dir):
    """LCSS similarity between user trajectories
    (spatial.lcss_pairs) — the REWARD-side closer of the track-DP
    family over the identical drift-geocode inputs: Fréchet takes
    the worst leash, DTW sums deviations, EDR counts edits, LCSS
    counts the longest order-preserving chain of 0.6°-matched fixes
    under the Vlachos |i−j| ≤ 4 warp window and skips everything
    else — detours are ignored, not charged.  sim_ppm normalizes by
    min(n,m); exact quantized match test shared with EDR."""
    pts, pairs = _drift_track_inputs(spark, sf_dir)
    return spatial.lcss_pairs(
        pts, pairs, entity_col="entity", eps=EDR_EPS_DEG,
        delta=LCSS_DELTA, max_points=FRECHET_MAX_RN,
    )


def q_edr_tracks(spark, sf_dir):
    """Edit Distance on Real sequences between user trajectories
    (spatial.edr_pairs) — the OUTLIER-ROBUST closer of the track-DP
    trio over the identical drift-geocode inputs: a fix either
    matches within 0.6° (cost 0) or costs exactly one edit, so the
    drift geocode's half-degree lat neighbors alignment-match while
    integer-degree lon offsets substitute — the result is a small
    edit count, not a distance a single extremum can dominate.  The
    ε-match compares quantized int64 d² against round(ε·10⁶)² in both
    engines — no float tolerance can drift between them."""
    pts, pairs = _drift_track_inputs(spark, sf_dir)
    return spatial.edr_pairs(
        pts, pairs, entity_col="entity", eps=EDR_EPS_DEG,
        max_points=FRECHET_MAX_RN,
    )


RESAMPLE_STEP_S = 900


def q_resample_track(spark, sf_dir):
    """Fixed-grid trajectory resampling (spatial.resample_track) over
    the drift geocode: one row per user per 15-min tick inside the
    observation span, positions linearly interpolated between the
    bracketing fixes in exact µdeg/µs integers (one trunc division
    per axis in decimal(38)/HUGEINT); on-tick fixes verbatim.  Both
    bracket carries share one entity shuffle (the asof union trick in
    both directions); the DuckDB twin runs the identical carries and
    division, hash-verified per resampled point."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    return spatial.resample_track(
        pts, "user_id", "ts", step_s=RESAMPLE_STEP_S
    )


def q_turn_stats(spark, sf_dir):
    """Heading-sector and turn statistics (spatial.turn_stats) over a
    zigzag variant of the drift geocode (the lon axis follows a
    triangle wave, so trajectories carry straights, U-turns at the
    folds, and left/right turns at the every-25th-point lat jumps —
    every turn class is populated at every sf).  Exact integer µdeg
    sectors (sign/|·| comparisons, no atan2), stationary steps break
    the chain, chained-CASE modal argmax; the DuckDB twin runs the
    identical recurrence, so every count and modal sector is
    hash-verified."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts", "event_id",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.abs(F.lit(10) - F.col("rn") % 20))
        .alias("lon"),
    )
    return spatial.turn_stats(
        pts, "user_id", "ts", tiebreak=("event_id",)
    )


def q_props_rollup(spark, sf_dir):
    """Semi-structured extraction (the source-layer JSON story): the
    events table's ``props`` JSON column parsed natively
    (get_json_object — JVM-side, no UDF), typed to BIGINT, and rolled
    up per event_type: count, non-null count, exact sum, and the
    divide-once mean in ppm.  Malformed/missing keys become NULLs and
    are counted separately — the quarantine accounting a crawl-dump
    reader needs.  DuckDB twin uses json_extract_string with the same
    cast, hash-verified."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_k").alias("n_with_k"),
            F.coalesce(F.sum("_k"), F.lit(0)).alias("k_sum"),
        )
        .select(
            "event_type", "n_events", "n_with_k", "k_sum",
            F.expr(
                "CASE WHEN n_with_k = 0 THEN NULL "
                "ELSE k_sum * 1000000 DIV n_with_k END"
            ).alias("k_mean_ppm"),
        )
    )


FOLLOW_WIN_S = 3600


def q_followed_by(spark, sf_dir):
    """Windowed episode counts (temporal.followed_by_counts): how
    often does type A lead to type B within 1 h of the same user's
    timeline — the windowed generalization of event_transitions
    (adjacent-only) for attribution/co-trigger analysis.  Exactly-once
    pair enumeration via the {bk, bk+1} forward bucket fan, strict
    Δt > 0, loud user×bucket occupancy guard; the DuckDB twin runs
    the identical fan, hash-verified."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.followed_by_counts(ev, FOLLOW_WIN_S)


COLOC_RES, COLOC_WIN_S = 2.0, 7200


def q_colocation_pairs(spark, sf_dir):
    """Spatio-temporal co-location (spatial.colocation_pairs) over the
    drift geocode: user pairs with events in the same-or-adjacent 2°
    cell within 2 h — 27-probe (3×3 cells × ±1 buckets) exactly-once
    fan on the left side only, id_a < id_b dedup, loud cell×bucket
    occupancy guard, exact integer µs; the DuckDB twin runs the
    identical fan (with per-event identity so duplicates never
    merge), so every pair's moment count and time span hash-verify."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    return spatial.colocation_pairs(
        pts, "user_id", "ts", res_deg=COLOC_RES, window_s=COLOC_WIN_S
    )


HRW_SHARDS = 16


def q_hrw_assign(spark, sf_dir):
    """Rendezvous (HRW) shard assignment (sketches.hrw_assign): every
    doc routes to argmax_s h(doc, s) over 16 shards via chained
    wrap-free kmv_hash rounds — the consistent-sharding primitive
    whose add-a-shard disruption is minimal by construction (tested);
    purely map-side (array-local argmax, no shuffle).  The DuckDB
    twin spells the same argmax as a windowed rank, hash-verified
    per key."""
    docs = pages_src.documents(spark, sf_dir).select("doc_id")
    return sketches.hrw_assign(docs, "doc_id", HRW_SHARDS).select(
        "doc_id", "shard"
    )


def q_cusum_split(spark, sf_dir):
    """Per-user CUSUM change-point (temporal.cusum_split) over
    milli-quantized event values: the classic max|Σ(x−x̄)| statistic
    cross-multiplied into the exact integer D_k = n·S_k − k·S_n, so
    the chosen split, its |D| and both segment means (ppm rationals)
    are float-free; earliest-k struct-max tie-break; one key sort
    carries every window.  The DuckDB twin runs the identical
    recurrence, hash-verified."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    series = ev.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_mil"),
    )
    return temporal.cusum_split(
        series, "user_id", "ts", "v_mil", tiebreak=("event_id",)
    )


# geofence layer for q_geofence_transitions: dyadic-exact bounds so
# literal typing (DuckDB decimal vs Spark double) cannot shift the
# [min,max) containment comparisons
GEOFENCES = [
    # bounds sit inside the drift geocode's envelope (lon −100..+40,
    # lat −45 upward with 1° jumps every 25 points), so trajectories
    # actually cross them at every sf
    (1, -100.0, -44.0, -85.0, -42.0),
    (2, -100.0, -41.5, -85.0, -40.0),
    (3, -95.0, -45.0, -90.0, -35.0),
    (4, -100.0, -40.0, 40.0, 20.0),
]


def q_geofence_transitions(spark, sf_dir):
    """Geofence enter/exit extraction (temporal.geofence_transitions):
    the drift-geocoded user trajectories against 4 broadcast fences,
    one window sort per (user, fence), flag-flip lag events — same
    [min,max) convention as pip_join_rect.  The DuckDB twin runs the
    identical flag stream, so every event and timestamp is
    hash-verified."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts", "event_id",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    fences = spark.createDataFrame(
        GEOFENCES,
        "fence_id INT, min_lon DOUBLE, min_lat DOUBLE, "
        "max_lon DOUBLE, max_lat DOUBLE",
    )
    from openstreetmap_license_change_spark.operators import temporal

    return temporal.geofence_transitions(
        pts, fences, tiebreak=("event_id",)
    )


def q_cell_gini(spark, sf_dir):
    """Per-cell language-diversity Gini impurity (spatial.cell_gini):
    exact integer ppm (10⁶·(n²−Σc²) DIV n²) over latest pages at the
    default grid — two map-side-combined shuffles, no log, no float;
    DuckDB twin identical."""
    latest = lineage.latest_version(_pages(spark, sf_dir), cols=["lang", "lon", "lat"])
    return spatial.cell_gini(latest, "lang", res_deg=15.0)


def q_decayed_rollup(spark, sf_dir):
    """Exponentially-decayed per-user value rollup
    (temporal.decayed_rollup): whole-half-life integer ages, cent-
    quantized values, contribution = cents·2^(30−age) with an
    explicit 30-half-life cutoff — a mergeable fixed-point SUM, the
    recency weighting of recrawl scheduling.  DuckDB twin identical
    shift arithmetic."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.decayed_rollup(ev, halflife_s=7 * 86_400)


def q_interval_coverage(spark, sf_dir):
    """Per-user interval-union coverage (temporal.interval_coverage):
    events become [ts, ts + value minutes] intervals (cent-quantized
    duration, so both engines build identical µs endpoints), then the
    sweep-line-as-windows union — running-max island detection, exact
    covered_us that naive SUM(end−start) would double-count.  Twin
    identical."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.round(F.col("value") * 100).cast("bigint") * 600_000
        ).alias("end_us"),
    )
    return temporal.interval_coverage(iv)


def q_rolling_rollup(spark, sf_dir):
    """Trailing 7-day per-user rollup (temporal.rolling_rollup):
    epoch-day ints + cent-quantized values, RANGE frame over the
    integer day so absent days fall out of the window without
    densification; the per-day pre-agg and the window share one
    user partitioning.  Twin identical."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.rolling_rollup(ev, window_days=7)


def q_slot_anomalies(spark, sf_dir):
    """Per-(type, day, hour-of-day) count anomalies
    (temporal.slot_anomalies): the tile_hotspots discipline in the
    time domain — exact cross-multiplied z-test in decimal(38)/
    HUGEINT, population convention, spike/dip directions; twin
    identical."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.slot_anomalies(ev)


def q_trip_cell_paths(spark, sf_dir):
    """RLE trajectory cell paths (spatial.trip_cell_paths): each
    user's drift trace compressed to its distinct-consecutive-cell
    sequence "cell:count,…" — one window sort + two groupBys all
    keyed on the user, ordered rendering via array_sort.  The DuckDB
    twin renders via ordered string_agg, so every path byte is
    hash-verified."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select("user_id", "ts", "event_id", rn.alias("rn")).select(
        "user_id", "ts", "event_id",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    return spatial.trip_cell_paths(
        pts, "user_id", "ts", tiebreak=("event_id",)
    )


def q_fuzzy_url_pairs(spark, sf_dir):
    """Typo-radius url reconciliation (dedup.fuzzy_key_join): distinct
    corpus urls self-joined at Levenshtein ≤ 1 via the FastSS
    deletion-neighborhood blocking (provable candidate superset, fan
    = len+1 variants) + the JVM-native levenshtein filter; emitted
    once per unordered pair.  The DuckDB twin runs the identical
    neighborhood and filter, hash-verified."""
    urls = _pages(spark, sf_dir).select("url").distinct()
    out = dedup.fuzzy_key_join(
        urls.select(F.col("url").alias("a_id"), F.col("url").alias("key")),
        urls.select(F.col("url").alias("b_id"), F.col("url").alias("key")),
        left_id="a_id", right_id="b_id",
    )
    return out.where(F.col("a_id") < F.col("b_id")).select(
        "a_id", "b_id", "lev_dist"
    )


def q_gopher_filter(spark, sf_dir):
    """Gopher-style composite quality filter (textops.gopher_filter):
    seven cross-multiplied integer rules (length bounds, mean word
    length window, symbol density, stopword evidence, top-token
    dominance, numeric density) emitted as a per-rule bitmask + keep
    verdict — char features on the scan, token features from one
    explode + two partial aggs; the DuckDB twin is generated from the
    same thresholds, so every flag bit is hash-verified.

    min_stop_hits=1 because the synthetic corpus's vocabulary carries
    exactly one stoplist word — at the Gopher default of 2 the verdict
    would be degenerately all-drop; at 1 the corpus splits ~4:1 on the
    length rule, exercising both keep values and two rule bits."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.gopher_filter(docs, min_stop_hits=1)


def q_mcnemar_filters(spark, sf_dir):
    """McNemar paired-filter comparison (evaluation.mcnemar_paired):
    does the Gopher composite filter keep DIFFERENT documents than a
    bare length window (150–400 chars), per language?  Only the
    discordant cells carry evidence; Edwards continuity correction
    clamped at zero; b+c = 0 → NULL in both engines.  The gopher twin
    is NESTED verbatim in the oracle, so the comparison's input
    classifier — not just the cell arithmetic — is hash-verified."""
    from openstreetmap_license_change_spark.operators import evaluation

    docs = pages_src.documents(spark, sf_dir)
    goph = textops.gopher_filter(docs, min_stop_hits=1).select(
        "doc_id", "keep"
    )
    paired = docs.select(
        "doc_id", "lang",
        F.col("n_chars").between(150, 400).alias("len_keep"),
    ).join(goph, "doc_id")
    return evaluation.mcnemar_paired(paired, "lang", "keep",
                                     "len_keep")


def q_bm25_topk(spark, sf_dir):
    """Global BM25 top-k retrieval (textops.bm25_topk): exact-integer
    Okapi scoring (k1=6/5, b=3/4 as cleared rationals, log-free odds
    idf quantized once) over one explode pass, broadcast query-term
    stats, and a TakeOrderedAndProject global top-k — no
    single-partition window, no float; the DuckDB twin is generated
    from the same constants, so every quantized score hash-matches."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.bm25_topk(docs, BM25_QUERY, k=BM25_K)


def q_link_distance(spark, sf_dir):
    """Multi-source BFS hop distance (graph.link_distance) from the
    sparse trusted-seed set (doc_id ≡ 0 mod 97) over the doc link
    graph — crawl-depth / seed-proximity labeling with frontier-only
    propagation; the DuckDB oracle (graph.link_distance_sql) unrolls
    the identical unit-weight relaxation, so the full distance table
    (including NULL = unreached within 6 hops) is hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    seeds = nodes.where(F.col("node") % 97 == 0)
    out = graph.link_distance(nodes, seeds, edges, rounds=BFS_ROUNDS)
    return out.select(F.col("node").alias("doc_id"), "dist")


def q_dag_levels(spark, sf_dir):
    """DAG scheduling depth (graph.dag_levels): longest-chain level
    per node over the CITATION restriction of the doc link graph
    (src < dst — edges point at newer ids, a DAG by construction),
    the max-plus dual of link_distance with the same bounded-rounds
    honesty contract: exact level within 6 rounds, NULL (never a
    wrong number) for deeper nodes; frontier-only propagation, one
    probe round buys the NULL.  The oracle enumerates bounded chains
    recursively — a different execution shape, so the relaxation is
    what gets verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    dag = edges.where(F.col("src") < F.col("dst"))
    out = graph.dag_levels(nodes, dag, rounds=BFS_ROUNDS)
    return out.select(F.col("node").alias("doc_id"), "level")


def q_graph_profile(spark, sf_dir):
    """One-row structural audit of the doc link graph
    (graph.link_graph_profile): edge/dup/self-loop counts, exact
    reciprocity over distinct non-loop edges, source/sink/isolate
    counts against the node table, and the max in/out degree that
    decides salting — the pre-flight the iterative operators run
    before spending rounds."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    return graph.link_graph_profile(nodes, edges)


WD_ROUNDS = 6


def q_weighted_distance(spark, sf_dir):
    """Bellman–Ford weighted distance (graph.weighted_distance) from
    the same trusted-seed set over the doc link graph with
    deterministic integer edge costs (w = 1 + (3·src + dst) mod 7 —
    a stand-in for per-link crawl cost): min-plus frontier relaxation
    where a settled node can re-enter the frontier when a
    longer-but-cheaper path arrives; the DuckDB oracle
    (graph.weighted_distance_sql) unrolls the identical ≤ 6-edge
    min-plus recurrence, so the full cost table (including NULL =
    unreached) is hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    seeds = nodes.where(F.col("node") % 97 == 0)
    wedges = edges.select(
        "src", "dst",
        (F.lit(1) + (F.col("src") * 3 + F.col("dst")) % 7).alias("w"),
    )
    out = graph.weighted_distance(nodes, seeds, wedges, rounds=WD_ROUNDS)
    return out.select(F.col("node").alias("doc_id"), "dist")


def q_bottleneck_width(spark, sf_dir):
    """Widest-path bottleneck capacity (graph.widest_path) from the
    trusted-seed set over the doc link graph with deterministic
    integer capacities (w = 1 + (src + 5·dst) mod 13): the (max,
    min) semiring sibling of weighted_distance — how much trust can
    flow to each doc through its weakest link, exact within the
    ≤ 6-edge honesty bound.  Frontier-only with re-entry on
    later-but-wider paths; the oracle unrolls the identical
    recurrence with NO frontier cut, so the frontier optimization is
    what the hash verifies.  Seeds are excluded from the output —
    the query, not the answer."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    seeds = nodes.where(F.col("node") % 97 == 0)
    cedges = edges.select(
        "src", "dst",
        (F.lit(1) + (F.col("src") + F.col("dst") * 5) % 13).alias("w"),
    )
    out = graph.widest_path(nodes, seeds, cedges, rounds=WD_ROUNDS)
    return out.select(F.col("node").alias("doc_id"), "width")


RRF_RUN_K = 50


def q_rrf_hybrid(spark, sf_dir):
    """Hybrid retrieval by reciprocal-rank fusion (ranking.rrf_fusion):
    the BM25 top-50 lexical run for the house query fused with the
    PageRank top-50 authority run — the classic relevance × authority
    web ranking, combined by exact integer 1/(60+rank) votes
    (scale DIV, identical on both engines).  Ranks come from bounded
    triangular self-joins over the top-k lists (loud size guard —
    never silently quadratic); the DuckDB twin splices the bm25 and
    pagerank twins into the same vote arithmetic, so every fused
    score is hash-verified."""
    docs = pages_src.documents(spark, sf_dir)
    run_lex = textops.bm25_topk(
        docs, BM25_QUERY, k=RRF_RUN_K
    ).withColumnRenamed("score_m", "score")
    nodes, edges = _doc_link_graph(spark, sf_dir)
    pr = graph.pagerank_quantized(nodes, edges, iterations=PR_ITERATIONS)
    run_auth = (
        pr.select(
            F.col("node").alias("doc_id"), F.col("rank_q").alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(RRF_RUN_K)
    )
    return ranking.rrf_fusion([run_lex, run_auth], score_col="score")


def q_skyline_docs(spark, sf_dir):
    """Pareto-optimal corpus selection (ranking.skyline): the
    documents maximal under (whitespace token count, chars-per-token
    millis) — the longest docs that are also the densest, no single
    weighting collapsing the trade-off.  Bucket-pruned two-level max
    structure, never a pairwise comparison; the DuckDB oracle is the
    O(n²) dominance CHARACTERIZATION itself (NOT EXISTS q dominating
    p — the hull witness pattern), so the frontier set is
    hash-verified against the definition, not the algorithm."""
    docs = pages_src.documents(spark, sf_dir)
    pts = docs.select(
        "doc_id",
        textops.token_count(F.col("text")).alias("n_tokens"),
        "n_chars",
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("n_chars * 1000 DIV greatest(n_tokens, 1)").alias("cpt_m"),
    )
    return ranking.skyline(pts, "n_tokens", "cpt_m")


def q_label_spread(spark, sf_dir):
    """Fixed-round label propagation (graph.label_spread): language-
    tier seeds on doc_id ≡ 0 mod 11 (label = doc_id mod 7) spread to
    unlabeled docs by in-neighbor MODE with packed-int64 argmax
    (highest count, lowest label on ties) — seeds clamped, synchronous
    rounds; the DuckDB twin unrolls the same packed recurrence, so
    every adopted label is hash-verified."""
    nodes, edges = _doc_link_graph(spark, sf_dir)
    seeds = nodes.where(F.col("node") % 11 == 0).select(
        "node", (F.col("node") % 7).alias("label")
    )
    out = graph.label_spread(nodes, seeds, edges, rounds=LS_ROUNDS)
    return out.select(F.col("node").alias("doc_id"), "label")


CM_DEPTH, CM_WIDTH, CM_TOPK = 4, 1024, 20


def q_countmin_topk(spark, sf_dir):
    """Count-Min heavy-hitter estimates (sketches.countmin_build /
    countmin_estimate): 4×1024 exact-integer sketch of the corpus
    token stream, point estimates for the exact top-20 tokens joined
    against their TRUE counts — est_n ≥ true_n is the sketch's
    one-sided guarantee, and the whole pipeline is deterministic, so
    the DuckDB twin hash-matches every estimate."""
    docs = pages_src.documents(spark, sf_dir)
    exact = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    top = exact.orderBy(F.desc("true_n"), "token").limit(CM_TOPK)
    sk = sketches.countmin_build(docs, depth=CM_DEPTH, width=CM_WIDTH)
    est = sketches.countmin_estimate(
        sk, top.select("token"), width=CM_WIDTH
    )
    return top.join(est, "token")


def q_sampled_quantiles(spark, sf_dir):
    """Mergeable sampled per-lang token-length quantiles
    (sketches.sampled_quantiles, k=128): bottom-k-hash uniform sample
    + exact lower-convention order statistics — the auditable twin of
    percentile_approx; shuffle volume capped at k per group."""
    docs = pages_src.documents(spark, sf_dir).select(
        "doc_id", "lang", textops.token_count(F.col("text")).alias("n_tok")
    )
    return sketches.sampled_quantiles(
        docs, "lang", "n_tok", "doc_id", k=128
    )


def q_kmv_distinct_docs(spark, sf_dir):
    """Per-lang distinct-document cardinality via the deterministic
    KMV bottom-k sketch (operators/sketches.py) at k=16 — exercising
    the estimator path (every lang holds ≫16 docs at sf ≥ 0.01) with
    a WindowGroupLimit partial top-k.  The DuckDB oracle replays the
    identical hash and estimator, so the sketch is hash-verified —
    something approx_count_distinct's engine-private HLL can never be."""
    pages = _pages(spark, sf_dir).select("lang", "doc_id")
    return sketches.kmv_distinct(pages, "lang", "doc_id", k=16)


def q_postings_cost(spark, sf_dir):
    """Index-size planning (textops.postings_varint_cost): exact
    LEB128 byte cost of every ≥50-doc token's delta-gap posting lists
    — the storage budget an index build over 10¹² docs runs before
    materializing, because a handful of stopword-like tokens dominate
    index size and the stop-list/tiering decision needs true encoded
    bytes (gap locality included), not document frequencies.  Costs
    the exact wire format inverted_index renders; ratio_ppm is the
    compression vs fixed 16-byte postings."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.postings_varint_cost(docs, shard_size=1024,
                                        min_docs=50)


def q_kendall_len_tokens(spark, sf_dir):
    """Per-lang Kendall rank correlation between character length and
    whitespace token count (ranking.kendall_tau, k=128 bottom-k-hash
    sample, key doc_id) — monotone-invariant pair-order agreement in
    exact integers (comparisons only, never the overflow-prone Δ·Δ
    product).  The scale design is sample-then-exact: ≤ 128 rows per
    lang cross the shuffle (WindowGroupLimit), then the triangular
    pair stage is ≤ k²/2 pairs per lang regardless of corpus size."""
    docs = pages_src.documents(spark, sf_dir).select(
        "doc_id",
        "lang",
        "n_chars",
        textops.token_count(F.col("text")).alias("n_tok"),
    )
    return ranking.kendall_tau(
        docs, "lang", "n_chars", "n_tok", "doc_id", k=128
    )


def q_spearman_len_tokens(spark, sf_dir):
    """Per-lang Spearman rank correlation between character length and
    whitespace token count (ranking.spearman_rho, same k=128 bottom-k
    sample and key as the Kendall entry) — Pearson over DOUBLED
    average ranks with the square root taken once as an exact integer
    isqrt, so rho_ppm hash-matches the DuckDB twin including tie
    blocks; magnitude-sensitive where tau is inversion-counting."""
    docs = pages_src.documents(spark, sf_dir).select(
        "doc_id",
        "lang",
        "n_chars",
        textops.token_count(F.col("text")).alias("n_tok"),
    )
    return ranking.spearman_rho(
        docs, "lang", "n_chars", "n_tok", "doc_id", k=128
    )


def q_hll_token_distinct(spark, sf_dir):
    """Per-lang distinct-token cardinality via HyperLogLog
    (sketches.hll_registers/hll_estimate) — the register-max sibling
    of kmv_distinct_docs on the input KMV is worst at: a token stream
    where duplicates dominate.  KMV must DISTINCT first (a data-sized
    shuffle); HLL's per-(lang, register) MAX absorbs duplicates in the
    map-side combine, so at most 64 rows per lang ever cross the
    shuffle.  All-int64 estimator (constant numerator, truncating DIV,
    constant linear-counting table), so the DuckDB twin replays it
    bit-for-bit — auditable where approx_count_distinct's
    engine-private HLL++ is not."""
    docs = pages_src.documents(spark, sf_dir)
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda t: t != "",
            )
        ).alias("token"),
    ).select("lang", dedup.token_hash(F.col("token")).alias("tok_h"))
    return sketches.hll_distinct(toks, "lang", "tok_h")


F2_R = 16


def q_token_f2(spark, sf_dir):
    """Per-lang second frequency moment of the token stream
    (sketches.f2_sketch, r=16 AMS sign counters): the self-join-size
    / skew price of joining on tokens within a lang — 16 counter rows
    per lang cross the shuffle regardless of corpus size (map-side
    partial sums), squares in decimal(38)/HUGEINT, one truncating
    division; the twin replays the two-round sign mix exactly."""
    docs = pages_src.documents(spark, sf_dir)
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda t: t != "",
            )
        ).alias("token"),
    ).select("lang", dedup.token_hash(F.col("token")).alias("tok_h"))
    return sketches.f2_sketch(toks, "lang", "tok_h", r=F2_R)


def q_vocab_overlap(spark, sf_dir):
    """Per-lang vocabulary overlap between the even-doc and odd-doc
    corpus halves via merged KMV sketches (sketches.kmv_set_ops) —
    union / intersection / Jaccard estimates from two k-row sketches
    per lang instead of a data-sized token join, the mergeable-sketch
    drift check (a lang whose halves share little vocabulary is
    heterogeneous or mis-identified).  Vocabularies exceed k=64, so
    these rows are ESTIMATES — the twin replays the identical sketch
    algebra hash-for-hash, and exact sub-k behavior plus estimator
    accuracy are pinned in tests/test_kmv_set_ops.py."""
    docs = pages_src.documents(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda t: t != "",
            )
        ).alias("token"),
    ).select(
        "doc_id", "lang", dedup.token_hash(F.col("token")).alias("tok_h")
    )
    a = toks.where(F.col("doc_id") % 2 == 0)
    b = toks.where(F.col("doc_id") % 2 == 1)
    return sketches.kmv_set_ops(a, b, "lang", "tok_h", k=64)


def q_chunk_documents(spark, sf_dir):
    """Pretraining chunker (textops.chunk_documents): 64-token windows
    with 48-token stride (overlapping, tail kept) — pure row-local
    array algebra, zero shuffles."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.chunk_documents(docs, chunk_tokens=64, stride=48)


MIXTURE_TARGETS = {"en": 50, "de": 20, "fr": 15, "es": 10, "it": 5}


def q_mixture_resample(spark, sf_dir):
    """Data-mixture rebalancing (sampling.mixture_resample): largest
    feasible corpus at 50/20/15/10/5 token weights, integer budget
    algebra, house-hash doc selection — scan-level predicate, two tiny
    broadcast aggregates."""
    from openstreetmap_license_change_spark.operators import sampling

    docs = pages_src.documents(spark, sf_dir)
    out = sampling.mixture_resample(docs, MIXTURE_TARGETS)
    return out.select("doc_id", "lang", "n_tokens", "keep_thresh")


def q_length_batches(spark, sf_dir):
    """Length-grouped batch construction (textops.length_batches):
    hash-grouped streams, per-group length-desc windows (never a
    global window), exact padding-waste accounting per batch."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.length_batches(docs, batch_size=16, n_groups=8)


def q_rare_token_ratio(spark, sf_dir):
    """Cross-document vocabulary-rarity quality signal
    (textops.rare_token_ratio): fraction of each doc's distinct tokens
    that are corpus hapax legomena, as exact integer ppm — three
    partial-agg shuffles + one token-keyed join, no windows."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.rare_token_ratio(docs, max_df=1)


def q_contamination(spark, sf_dir):
    """Benchmark decontamination (dedup.contamination_check): docs with
    doc_id % 29 == 0 stand in for the eval set; every other doc gets
    its distinct shared word 8-grams counted against it via a broadcast
    join of the (tiny) benchmark shingle set — corpus side never
    shuffles before the final per-doc groupBy.  Oracle is the naive SQL
    n-gram intersection."""
    docs = pages_src.documents(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 29 == 0)
    corpus = docs.where(F.col("doc_id") % 29 != 0)
    return dedup.contamination_check(corpus, bench, n=8)


def q_readability(spark, sf_dir):
    """Flesch reading-ease + Flesch–Kincaid grade
    (textops.readability): exact floored-milli integer scores from
    whitespace words, [.!?]+ sentence runs, and the max(1,
    vowel-group) syllable heuristic — map-only native projection, no
    UDF, no shuffle; non-negative operands by construction so DIV
    vs // can't diverge even on negative FRE."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.readability(docs)


def q_text_quality(spark, sf_dir):
    """Quality features: token count, punct ratio, stopword hits."""
    docs = pages_src.documents(spark, sf_dir)
    return textops.quality_score(docs).select(
        "doc_id", "n_tokens", "n_chars_m", "punct_ratio",
        "stop_hits_en", "quality_keep",
    )


def q_lang_id(spark, sf_dir):
    """Stopword-vote language id vs the labeled lang column."""
    docs = pages_src.documents(spark, sf_dir)
    out = textops.lang_id(docs)
    return out.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def q_kcenter_seeds(spark, sf_dir):
    """Farthest-first k-center seeding (similarity.kcenter_seeds)
    over the embeddings table: the deterministic diversity sampler —
    greedy 2-approximate k-center cover with a declared min-id start
    and (distance, smallest-id) argmax, in the shared quantized
    embedding integers.  k−1 broadcast-join rounds over a
    checkpointed long form (the O(n·k) incremental), k bounded
    single-row collects; the oracle unrolls the identical greedy
    recurrence as chained CTEs, so every pick AND its coverage
    radius is hash-verified."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.kcenter_seeds(emb, k=5)


def q_mmr_rerank(spark, sf_dir):
    """MMR diversity reranking (similarity.mmr_rerank) of the 64
    candidates nearest the min-id probe vector: rel_q = −dist², the
    brute-force retrieval stage, then the greedy
    w_rel·rel + w_div·min-dist²-to-picked argmax at k=10 — the
    relevance/diversity trade-off between ann_cosine_topk's pure
    top-k and kcenter_seeds' pure spread.  Exact quantized integers
    throughout; the oracle reruns the candidate stage AND unrolls
    the identical greedy recurrence, so every pick, its diversity
    margin, and its winning score are hash-verified."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pid = emb.agg(F.min("vec_id").alias("pid"))
    vlong = emb.select(
        F.col("vec_id").alias("_id"),
        F.posexplode("embedding").alias("dim", "_v"),
    ).withColumn(
        "_q",
        F.round(F.col("_v").cast("double") * F.lit(1e6)).cast("bigint"),
    ).select("_id", "dim", "_q")
    pdims = vlong.join(
        F.broadcast(pid), F.col("_id") == F.col("pid")
    ).select("dim", F.col("_q").alias("_pq"))
    d = F.col("_q") - F.col("_pq")
    dists = (
        vlong.join(F.broadcast(pdims), "dim")
        .groupBy("_id")
        .agg(F.sum(d * d).alias("_d"))
    )
    cands = (
        dists.crossJoin(F.broadcast(pid))
        .where(F.col("_id") != F.col("pid"))
        .orderBy("_d", "_id")
        .limit(64)
        .select(
            F.col("_id").alias("vec_id"),
            (-F.col("_d")).cast("bigint").alias("rel_q"),
        )
        .join(emb.select("vec_id", "embedding"), "vec_id")
    )
    return similarity.mmr_rerank(cands, k=10, w_rel=2, w_div=1)


def q_embedding_centroids(spark, sf_dir):
    """Per-label embedding centroids in exact quantized integers
    (similarity.embedding_centroids) — the k-means M-step / IVF
    codebook-refresh aggregate: one map-side-combining groupBy over
    the exploded (label, dim) stream, floor-division means."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.embedding_centroids(emb)


def q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding health profile
    (similarity.embedding_dim_stats): dead/constant/imbalanced
    channel detection over the quantized components — exact n_zero /
    n_distinct / trunc mean / min / max / floored variance in q²
    units, one posexplode + one dim-keyed aggregation."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.embedding_dim_stats(emb)


def q_kmeans_assign(spark, sf_dir):
    """One full quantized k-means round, hash-verified end-to-end:
    M-step centroids (similarity.embedding_centroids) feed the E-step
    nearest-centroid assignment (similarity.nearest_centroid_assign) —
    broadcast centroid join, exact int64 distances, deterministic
    tie-break.  The DuckDB oracle replays both steps."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.embedding_centroids(emb)
    return similarity.nearest_centroid_assign(emb, cents)


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = (
        emb.where(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    )
    return similarity.brute_force_topk(
        emb.where(F.col("vec_id") != 0), [float(x) for x in qvec], k=10
    )


ANN_PLANES = 4  # 16 buckets over 500-2000 vectors: ~30+ per bucket


def _query_vec(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return emb, [float(x) for x in qvec]


def q_lsh_bucket_topk(spark, sf_dir):
    """ANN scale path: hyperplane-LSH bucket probe + exact re-rank
    inside the query's bucket (partition-prunable at 100 TB)."""
    emb, qvec = _query_vec(spark, sf_dir)
    return similarity.lsh_bucket_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10,
        n_planes=ANN_PLANES, multiprobe=True,
    )


def q_ann_recall(spark, sf_dir):
    """Recall@10 of the LSH bucket probe vs the exact brute-force
    top-10 — the quality metric that justifies the bucketed plan."""
    emb, qvec = _query_vec(spark, sf_dir)
    rest = emb.where(F.col("vec_id") != 0)
    brute = similarity.brute_force_topk(rest, qvec, k=10).select("vec_id")
    lsh = similarity.lsh_bucket_topk(
        rest, qvec, k=10, n_planes=ANN_PLANES, multiprobe=True
    ).select("vec_id")
    return brute.join(lsh, "vec_id").agg(
        (F.count(F.lit(1)) / 10.0).alias("recall_at_10")
    )


def q_ivf_topk(spark, sf_dir):
    """IVF ANN scale path: nearest-centroid assignment (centroids =
    vectors 1..16, argmax rounded cosine), 2-centroid probe, exact
    re-rank — the partition-prunable IVF twin of the LSH bucket."""
    emb, qvec = _query_vec(spark, sf_dir)
    return similarity.ivf_topk(emb, qvec, k=10, n_centroids=16, n_probe=2)


def q_mutual_knn(spark, sf_dir):
    """Mutual-kNN graph (similarity.mutual_knn) over the embeddings
    table, blocked by the label partition: reciprocal top-4
    neighbours under the exact quantized Σ(Δq)² metric (in-engine
    ROUND of the DOUBLE-cast float32 — the embedding_centroids
    discipline), so the edge set is a total-order ranking with no
    cosine floats.  Reciprocity filters hub vectors — the
    high-precision edge set graph clustering consumes.  The twin
    scores on the UNNESTED long form vs the operator's array
    zip_with, so the quantization and ranking verify across two
    evaluation shapes."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.mutual_knn(emb, k=4, bucket_col="label")


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup: all-pairs cosine *within* LSH buckets
    (bounded quadratic — the 100-TB shape), top-3 neighbours per
    vector."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.pairwise_topk_in_bucket(
        emb, n_planes=ANN_PLANES, k=3, dim=64
    )


def q_pip_rect_prefiltered(spark, sf_dir):
    """J10b: the same PIP result as `pip_rect` through the
    cell-prefiltered broadcast equi-join (rects explode into covering
    cells; exact predicate only on surviving pairs)."""
    pages = lineage.latest_version(_pages(spark, sf_dir), cols=["lon", "lat"])
    rects = spark.createDataFrame(
        [
            (1, -180.0, -90.0, -60.0, 0.0),
            (2, -60.0, -90.0, 60.0, 0.0),
            (3, -180.0, 0.0, 0.0, 90.0),
            (4, 0.0, 0.0, 180.0, 90.0),
        ],
        "polygon_id INT, min_lon DOUBLE, min_lat DOUBLE, max_lon DOUBLE, max_lat DOUBLE",
    )
    return (
        spatial.pip_join_rect_prefiltered(pages, rects, res_deg=30.0)
        .groupBy("polygon_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("url").alias("first_url"),
        )
    )


def q_regions_available(spark, sf_dir):
    """J9: region anti-proximity — latest pages not within 25° Chebyshev
    of any currently-processing region (run_bot.rb:41-57), as a
    broadcast theta anti-join."""
    latest = lineage.latest_version(
        _pages(spark, sf_dir), cols=["lon", "lat"]
    ).select("url", "lon", "lat")
    processing = spark.createDataFrame(
        [(-120.0, 40.0), (10.0, 50.0), (140.0, -30.0)], "lon double, lat double"
    )
    return spatial.regions_available(latest, processing, dist_deg=25.0)


def q_token_stats(spark, sf_dir):
    """Token budgeting: whitespace count vs BPE-ish regex pre-token
    count (punct/digit runs counted separately) per document."""
    docs = pages_src.documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        textops.token_count(F.col("text")).alias("n_ws_tokens"),
        textops.token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


def q_token_quantiles(spark, sf_dir):
    """EXACT nearest-rank token-count quantiles per language
    (textops.group_quantiles): p50/p90/p99 at integer-millionth levels
    with pure int64 rank arithmetic — no percentile_approx sketch, no
    engine-dependent interpolation."""
    docs = pages_src.documents(spark, sf_dir)
    vals = docs.select(
        "lang", textops.token_count(F.col("text")).alias("n_tokens")
    )
    return textops.group_quantiles(vals, "n_tokens", ["lang"])


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprint: polynomial rolling hash (Horner mod p) over
    the 64-char prefix — pure per-row arithmetic, no dictionary."""
    docs = pages_src.documents(spark, sf_dir)
    return docs.select(
        "doc_id", textops.rolling_fingerprint(F.col("text")).alias("fingerprint")
    )


def q_osmchange_render(spark, sf_dir):
    """S9 at data scale: latest page versions → node edit/delete action
    rows → osmChange XML fragments, rendered entirely JVM-side.

    Coordinates are re-derived as quarter-degree values (exact dyadic
    doubles) so the double→string render is bit-identical across
    engines; raw-float rendering fidelity is covered by the sink's
    golden tests."""
    from openstreetmap_license_change_spark.plans import osmchange

    latest = lineage.latest_version(
        _pages(spark, sf_dir),
        cols=["visible", "version", "changeset_id", "uid"],
    )
    actions = latest.select(
        F.lit("node").alias("etype"),
        dedup.token_hash(F.col("url")).alias("element_id"),
        F.when(F.col("visible"), F.lit("edit"))
        .otherwise(F.lit("delete"))
        .alias("action"),
        F.col("version"),
        F.create_map(F.lit("source"), F.lit("bot")).alias("tags"),
        ((F.col("changeset_id") % 1441) / 4.0 - 180.0).alias("lon"),
        ((F.col("uid") % 721) / 4.0 - 90.0).alias("lat"),
    )
    return osmchange.osmchange_fragments(actions).select(
        "action_rank", "type_rank", "element_id", "fragment"
    )


def q_media_decode_stats(spark, sf_dir):
    """Multimodal decode path end-to-end: deterministic raw-RGB24 media
    → binary payload → mapInPandas decode + bilinear resize (identity
    size ⇒ exact) → per-image channel means.  The oracle regenerates
    the pixel pattern arithmetically — so a payload-byte or decode bug
    breaks the match."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    out = multimodal.resize_images(media, out_w=48, out_h=32)
    return out.select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


DHASH_HAMMING, DHASH_BANDS = 7, 8


def q_image_phash(spark, sf_dir):
    """Perceptual DCT hash (multimodal.image_phash) per synthetic
    raw-RGB image: the frequency-domain near-dup hash beside dHash —
    block SUMS (8-aligned grid makes the mean denominators cancel),
    two integer matmuls against the FROZEN round(DCT·2¹⁴) constants,
    one bit per AC coefficient vs the exact rank-32 median.  The
    oracle replays every pixel and the same matmul through a VALUES
    join of the identical 64 integers with a rank-window median — a
    different execution shape of the same arithmetic."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_phash(media)


def q_media_dhash(spark, sf_dir):
    """Perceptual image dHash (multimodal.image_dhash): raw-RGB decode
    → exact integer equal-area block means → cross-multiplied
    neighbor comparisons packed into a 56-bit hash (no float resize,
    no rounding — the engine-portable dHash variant).  The oracle
    regenerates the pixel pattern arithmetically and runs the
    identical block/bit algebra in SQL, so every hash bit is
    payload-derived and hash-verified."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_dhash(media)


def q_dhash_pairs(spark, sf_dir):
    """Near-duplicate image pairs (multimodal.dhash_pairs): banded
    Hamming join over the dHashes — 8 band equi-joins (pigeonhole:
    hamming ≤ 7 < 8 bands ⇒ some band matches exactly, a provable
    candidate superset), native bit_count(xor) exact filter.  The
    oracle brute-forces all pairs, so the banding's losslessness is
    what the hash check verifies."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    hashes = multimodal.image_dhash(media)
    return multimodal.dhash_pairs(
        hashes, max_hamming=DHASH_HAMMING, bands=DHASH_BANDS
    )


def q_audio_decode_stats(spark, sf_dir):
    """Audio decode path end-to-end: deterministic PCM16-LE clips →
    payload bytes → mapInPandas decode → exact integer amplitude stats;
    the oracle regenerates the waveform arithmetically, so an
    endianness/width/offset bug in the decode breaks the match."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_pcm_media(spark, n=16, n_samples=2000)
    return multimodal.audio_features(media)


def q_audio_silence(spark, sf_dir):
    """Audio silence segmentation (multimodal.audio_frame_energy ∘
    audio_silence_segments): exact per-frame Σx² energies (tail frame
    kept with its true length), the division-free RMS test
    Σx² < n·thr², native flag-flip gaps-and-islands into alternating
    loud/silent segments.  Synthetic clips plant quiet bursts at
    (i DIV 256 + id) mod 3 = 1; the oracle replays every sample."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_gated_pcm_media(
        spark, n=8, n_samples=2048, burst=256
    )
    energy = multimodal.audio_frame_energy(media, frame_samples=256)
    return multimodal.audio_silence_segments(energy, thr_amp=100)


def q_image_patches(spark, sf_dir):
    """ViT-style patch extraction (multimodal.image_patches): 16×16
    non-overlapping patch grid over raw-RGB images, exact integer
    channel sums + pixel counts per patch, edge patches kept at their
    true extent (coverage sums to every pixel exactly once, tested).
    The oracle replays every pixel from the closed form."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    return multimodal.image_patches(media, patch=16)


def q_video_shots(spark, sf_dir):
    """Shot-boundary detection end-to-end (multimodal.video_frame_dhash
    ∘ video_shot_segments): per-frame block-mean dHash (vectorized
    across the clip's frame axis, exact cross-multiplied comparisons),
    then native LAG + bit_count(xor) Hamming steps, threshold cuts,
    running shot ids and per-shot summaries.  Synthetic clips carry
    hard cuts every 8 frames with intra-scene Hamming structurally
    ≤ 8 (only the top pixel row animates), so threshold 10 recovers
    the planted segmentation; the oracle replays every pixel from the
    closed form."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_cut_video_media(
        spark, n=8, w=16, h=12, n_frames=24, scene_len=8
    )
    hashes = multimodal.video_frame_dhash(media)
    return multimodal.video_shot_segments(hashes, threshold=10)


# the q_video_shots frame-hash pixel replay as a standalone subquery,
# reused by the keyframes oracle (the video_shots oracle keeps its
# original inline copy — identical arithmetic, pinned by both gates)
_VS_FH_SRC_SQL = """(
    WITH kvs_clips AS (SELECT UNNEST(range(0, 8)) AS media_id),
    kvs_pix AS (
        SELECT cl.media_id, CAST(f.f AS INTEGER) AS frame_idx,
               (y.y * 7) // 12 AS yb, (x.x * 9) // 16 AS xb,
               CASE WHEN y.y = 0 THEN
                     (x.x*3 + 0  + cl.media_id*13 + f.f*29) % 256
                   + (x.x*3 + 11 + cl.media_id*13 + f.f*29) % 256
                   + (x.x*3 + 22 + cl.media_id*13 + f.f*29) % 256
               ELSE
                     (x.x*3 + y.y*7 + 0  + cl.media_id*13
                      + (f.f//8)*41*x.x) % 256
                   + (x.x*3 + y.y*7 + 11 + cl.media_id*13
                      + (f.f//8)*41*x.x) % 256
                   + (x.x*3 + y.y*7 + 22 + cl.media_id*13
                      + (f.f//8)*41*x.x) % 256
               END AS gray
        FROM kvs_clips cl, range(0, 24) f(f),
             range(0, 16) x(x), range(0, 12) y(y)
    ),
    kvs_blocks AS (
        SELECT media_id, frame_idx, yb, xb,
               CAST(SUM(gray) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM kvs_pix GROUP BY 1, 2, 3, 4
    )
    SELECT a.media_id, a.frame_idx,
           CAST(SUM(CASE WHEN a.s * b.n > b.s * a.n
                THEN CAST(1 AS BIGINT) << (a.yb * 8 + a.xb)
                ELSE 0 END) AS BIGINT) AS fhash
    FROM kvs_blocks a
    JOIN kvs_blocks b ON b.media_id = a.media_id
                     AND b.frame_idx = a.frame_idx
                     AND b.yb = a.yb AND b.xb = a.xb + 1
    GROUP BY 1, 2
)"""


def q_video_keyframes(spark, sf_dir):
    """Per-shot medoid keyframes (multimodal.video_keyframes) over the
    planted cut clips: shot boundaries shared with q_video_shots (same
    helper), then within each shot the frame minimizing the summed
    dHash Hamming distance — shot-local pair fan, loud size guard,
    total-ordered tie-break.  The oracle replays the pixels to the
    frame hashes and reruns the medoid algebra."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_cut_video_media(
        spark, n=8, w=16, h=12, n_frames=24, scene_len=8
    )
    hashes = multimodal.video_frame_dhash(media)
    return multimodal.video_keyframes(hashes, threshold=10)


def q_video_frame_stats(spark, sf_dir):
    """Video path end-to-end: native frame-sample plan (metadata
    explode) joined back to multi-frame rawvideo payloads; ONLY the
    sampled frames are sliced+decoded; exact integer channel sums per
    sampled frame vs an arithmetic oracle."""
    from openstreetmap_license_change_spark.operators import multimodal

    media = multimodal.synthetic_raw_video_media(
        spark, n=8, w=16, h=12, n_frames=24
    )
    return multimodal.sampled_frame_stats(media, every_ms=1000)


FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_GAP_SEC = 6 * 3600


def q_event_funnel(spark, sf_dir):
    """Ordered conversion funnel over the events table
    (temporal.event_funnel): earliest-completion view→click→purchase
    within a 6 h step gap, exact epoch-microsecond comparisons; one
    filtered min-aggregate + user-keyed join per step.  The oracle
    chains the identical CTEs on epoch_us."""
    from openstreetmap_license_change_spark.operators import temporal

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.event_funnel(events, FUNNEL_STEPS, FUNNEL_GAP_SEC)


def q_funnel_latency(spark, sf_dir):
    """Step-transition latency quantiles of the same funnel
    (temporal.funnel_latency): per converting user the exact µs hop
    time, per step the min / lower-nearest-rank p50 / p90 / max —
    the funnel's time dimension, sharing event_funnel's greedy walk
    so both operators agree on who converts by construction."""
    from openstreetmap_license_change_spark.operators import temporal

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.funnel_latency(events, FUNNEL_STEPS, FUNNEL_GAP_SEC)


def q_holt_hourly(spark, sf_dir):
    """Holt level+trend smoothing (temporal.holt_smoothing) over each
    event type's hourly count series: exact fixed-point recurrence in
    per-group applyInPandas, one-step residuals as the trend-aware
    anomaly score.  t is the observed-bucket index (row_number over
    hours — gaps skipped, declared).  The twin walks the identical
    recurrence as a recursive CTE, so every level/trend/residual
    hash-verifies."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.select(
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp"))
             / F.lit(3_600_000_000)).cast("bigint").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = hourly.withColumn(
        "t",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("hour")
        ) - 1,
    )
    return temporal.holt_smoothing(series, "event_type", "t", "n")


def q_event_retention(spark, sf_dir):
    """Cohort retention over the events table
    (temporal.event_retention): first-activity-day cohorts × whole-day
    return offsets, integer day bucketing, three map-side-combining
    aggregates and one user-keyed join."""
    from openstreetmap_license_change_spark.operators import temporal

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.event_retention(events, max_offset=7)


def q_event_transitions(spark, sf_dir):
    """User-journey transition matrix (temporal.event_transitions):
    consecutive event-type pairs per user with exact ppm conditional
    rates — one LEAD window + two aggregates."""
    from openstreetmap_license_change_spark.operators import temporal

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.event_transitions(events)


def q_events_asof_join(spark, sf_dir):
    """As-of join (union+window form — one shuffle, no range nested
    loop): each event picks up the value of the user's most recent
    "update" event (event_id % 10 == 0) at or before its timestamp.
    DuckDB's native ASOF JOIN is the oracle."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    updates = (
        ev.where(F.col("event_id") % 10 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("update_value"))
    )
    left = ev.where(F.col("event_id") % 10 != 0).select(
        "user_id", "event_id", "ts"
    )
    out = temporal.asof_join(
        left, updates, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["update_value"],
    )
    return out.select(
        "user_id", "event_id",
        F.round(F.coalesce("asof_update_value", F.lit(-1.0)), 4).alias(
            "last_update_value"
        ),
    )


def q_events_hourly_rollup(spark, sf_dir):
    """Hypertable-style time-bucket rollup: hourly event counts,
    distinct users, exact scaled-int value sum.  At scale the hour
    bucket is the partition key (time-partitioned table), so the
    rollup is partition-local — one map-side-combined exchange."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    scaled = F.round(F.col("value") * 10000).cast("bigint")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(scaled).cast("double") / 10000).alias("sum_value"),
        )
    )


def q_trip_segments(spark, sf_dir):
    """Trajectory segmentation (spatial.trip_segments): events become
    per-user GPS traces via a closed-form drift geocode (~110 m steps
    with a 1° jump every 25th point, so both the spatial-jump and the
    1-day-gap split criteria fire), then each user's stream splits
    into trips with exact µkm lengths.  event_id tiebreaks the
    ordering so trip boundaries are parallelism-independent."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pts = ev.select(
        "user_id", "ts", "event_id", rn.alias("rn")
    ).select(
        "user_id", "ts", "event_id",
        (F.lit(-45.0) + (F.col("user_id") % 120) * F.lit(0.5)
         + F.lit(0.001) * F.col("rn")
         + F.lit(1.0) * F.floor(F.col("rn") / 25)).alias("lat"),
        (F.lit(-100.0) + (F.col("user_id") % 140) * F.lit(1.0)
         + F.lit(0.002) * F.col("rn")).alias("lon"),
    )
    return spatial.trip_segments(
        pts, "user_id", "ts",
        max_gap_s=86400, max_jump_km=50.0, tiebreak=("event_id",),
    )


def q_events_sessionize(spark, sf_dir):
    """Stateful-style sessionization as pure windows: 30-minute gaps
    split sessions; counts per (user, session)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    # sum on a scaled integer: SUM(double) is accumulation-order-
    # dependent (round-1 hash mismatch); values are ~2-dp so
    # round(value·10⁴) is far from .5 ties and bit-identical across
    # engines, the int64 sum is exact, and the final division is one
    # deterministic IEEE op
    scaled = F.round(F.col("value") * 10000).cast("bigint")
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(scaled).cast("double") / 10000).alias("sum_value"),
    )


def q_active_users(spark, sf_dir):
    """Exact DAU/WAU/MAU (temporal.rolling_active_users): distinct
    (day, user) facts fanned forward to the days they keep alive, both
    trailing windows from ONE aggregate via conditional distincts —
    returning users counted once per window (a RANGE-frame SUM of
    daily distincts would double-count, tested)."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.rolling_active_users(ev, short_days=7, long_days=28)


def q_session_rules(spark, sf_dir):
    """Association rules over session baskets (temporal.session_rules):
    30-min sessions as baskets, distinct event types as items, exact
    integer confidence and decimal(38)/HUGEINT lift per ordered rule,
    min_support 2, loud basket-size guard on the C(t,2) fan."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.session_rules(ev, gap_s=1800, min_support=2)


def q_attribution(spark, sf_dir):
    """Multi-touch conversion attribution
    (temporal.attribution_credits): every purchase distributes
    exactly 10⁶ ppm over the user's preceding touches (sequence-order
    membership via a reverse-cumulative conversion count — one window
    pass, never an interval join; 1-hour lookback) under first-touch,
    last-touch, and mass-conserving linear models at once, rolled up
    per channel."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.attribution_credits(ev, "purchase", 3600)


def q_attribution_decay(spark, sf_dir):
    """Time-decay attribution (temporal.attribution_decay): the
    fourth standard model beside q_attribution's first/last/linear —
    credit halves per 15-minute half-life within the 1-hour lookback
    (exact power-of-two bucket weights, the decayed_rollup
    convention), remainder to the latest touch so every purchase
    distributes exactly 10⁶ ppm."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.attribution_decay(ev, "purchase", 3600, 900)


MARKOV_CHANNELS = ["click", "error", "signup", "view"]


def q_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution
    (temporal.markov_attribution): the data-driven fifth model next
    to the positional/decay rules — a first-order chain over
    purchase-split user journeys, absorption probability
    P(CONV|START) as a 12-round exact ppm floor ladder, and each
    channel's effect = the drop in that probability when the channel
    is removed (transitions into it lead nowhere).  The data-sized
    work is one lag window + one transition-count aggregate; the
    chain solve runs on the ≤ 6×6 count matrix.  The oracle unrolls
    all five absorption chains (full + four removals) as
    MATERIALIZED CTE rounds, so every probability, effect, and share
    is hash-verified."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal_mod.markov_attribution(
        ev, MARKOV_CHANNELS, "purchase", rounds=12
    )


def q_peak_concurrency(spark, sf_dir):
    """Peak interval concurrency (temporal.peak_overlap): every event
    opens a half-open 30-minute activity window; per event type,
    the maximum number of simultaneously open windows and the earliest
    µs instant it is reached — the capacity-planning sibling of
    interval_coverage's utilization.  Sweep deltas pre-aggregated per
    (key, t) so the running-sum window has unique sort keys; empty
    intervals counted, never swept."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = ev.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(1_800_000_000)
        ).alias("end_us"),
    )
    return temporal.peak_overlap(iv, key_col="event_type")


def q_events_interval_join(spark, sf_dir):
    """Point-in-interval join via the bucket decomposition
    (operators/temporal.py interval_join): each error event opens a
    30-minute window; every same-user non-error event inside a window
    pairs with it.  The oracle is the naive range join — the operator's
    claim is identical output from a (key, bucket) hash equi-join
    instead of the range condition Catalyst would otherwise evaluate as
    a residual over a full per-key cross product."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    windows = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    points = ev.where(F.col("event_type") != "error").select(
        "user_id", "event_id", "ts"
    )
    out = temporal.interval_join(
        points, windows, key="user_id", ts="ts",
        start="w_start", end="w_end", bucket_s=600,
        max_buckets_per_interval=16,
    )
    return out.select("user_id", "event_id", "window_id")


def q_events_overlap_join(spark, sf_dir):
    """Interval-overlap join (operators/temporal.py
    interval_overlap_join): per-user activity sessions (the 30-minute
    gap rule, spanned as [first_ts, last_ts + 1s)) overlapped with the
    30-minute error windows.  First-shared-bucket dedup — no
    distinct() pass; oracle is the naive overlap range join over the
    same session construction."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    spans = (
        ev.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("s_end"),
        )
    )
    windows = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    out = temporal.interval_overlap_join(
        spans, windows, key="user_id",
        a_start="s_start", a_end="s_end",
        b_start="w_start", b_end="w_end",
        bucket_s=3600, max_buckets_per_interval=1024,
    )
    return out.select("user_id", "session_id", "window_id")


def q_allen_relations(spark, sf_dir):
    """Allen interval algebra (temporal.allen_classify): per-user
    activity sessions × 30-minute error windows classified into the
    11 touch-or-intersect Allen relations from ONE bucketed
    (key, bucket) equi-join — closed-end bucket coverage keeps a
    `meets` that touches exactly on a bucket edge (tested),
    first-shared-bucket dedup, loud degenerate/blowup guards.  Rolled
    up to (relation, n_pairs); oracle is the naive range join over
    the same session construction plus the identical endpoint CASE —
    verifying the DEFINITION while bucketing stays the engine's job."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    spans = (
        ev.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("s_end"),
        )
    )
    windows = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    pairs = temporal.allen_classify(
        spans, windows, key="user_id",
        a_start="s_start", a_end="s_end",
        b_start="w_start", b_end="w_end",
        bucket_s=3600, max_buckets_per_interval=1024,
    )
    return pairs.groupBy("relation").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def q_documents_profile(spark, sf_dir):
    """Column profiling (profile.column_profile) of the documents
    table — the pre-ingest schema audit a 10¹²-row load gates on:
    per-column null share, exact distinct cardinality, native-type
    extremes, as one long-form row a snapshot diff can track.  One
    scan, one aggregate (multi-column COUNT DISTINCT plans as a
    single Expand), then a stack() unpivot."""
    from openstreetmap_license_change_spark.operators import profile

    docs = pages_src.documents(spark, sf_dir)
    return profile.column_profile(
        docs, ["doc_id", "lang", "source", "n_chars"]
    )


def q_winsorize_lengths(spark, sf_dir):
    """Per-lang winsorization audit of document token counts
    (textops.winsorize at [p1, p99] exact nearest-rank cuts): the
    outlier-capping decision artifact — how far do pathological
    documents move each language's token-budget sum — in pure int64
    (integer-millionth rank arithmetic, least/greatest clamp, exact
    clamp counts).  Quantile window and rollup share the lang
    partitioning; the 1-row-per-lang cut table broadcasts back."""
    docs = pages_src.documents(spark, sf_dir).select(
        "lang", textops.token_count(F.col("text")).alias("n_tok")
    )
    return textops.winsorize(docs, "n_tok", ["lang"],
                             lo_m=10_000, hi_m=990_000)


def q_str_leaves(spark, sf_dir):
    """STR R-tree bulk packing (rtree.str_pack ∘ str_leaf_stats):
    page geocodes expanded to deterministic microdegree rectangles,
    packed into ≤64-rect leaves by textbook sort-tile-recursive — the
    ADAPTIVE spatial write layout beside cluster_by_hilbert's fixed
    curve.  Ranks are exact two-level (value-bucket histogram prefix
    + bucket-local row_number, never a global window); the oracle is
    the plain global-ROW_NUMBER textbook definition, so the
    decomposition itself is hash-verified.  Output is the per-leaf
    manifest (count, MBR, semi-perimeter) footer pruning consumes."""
    from openstreetmap_license_change_spark.operators import rtree

    pages = _pages(spark, sf_dir)
    rid = (F.col("doc_id") * 16 + F.col("version")).alias("rect_id")
    rects = pages.select(
        rid,
        F.floor(F.col("lon") * 1_000_000.0).cast("bigint").alias("_x"),
        F.floor(F.col("lat") * 1_000_000.0).cast("bigint").alias("_y"),
    ).select(
        "rect_id",
        (F.col("_x") - F.col("rect_id") % 997).alias("minx"),
        (F.col("_y") - (F.col("rect_id") * 3) % 997).alias("miny"),
        (F.col("_x") + (F.col("rect_id") * 7) % 997 + 1).alias("maxx"),
        (F.col("_y") + (F.col("rect_id") * 11) % 997 + 1).alias("maxy"),
    )
    return rtree.str_leaf_stats(
        rtree.str_pack(rects, leaf_size=64, n_buckets=256)
    )


def q_link_assortativity(spark, sf_dir):
    """Global degree assortativity (graph.degree_assortativity) of
    the undirected doc link graph — Newman's r as an exact sqrt-free
    decimal(38) ratio (on the symmetrized edge list both endpoint
    degree distributions coincide, collapsing Pearson's denominator
    to one factor): the one-number mixing summary (hub-hub vs
    hub-leaf) behind degree-stratified sampling decisions.  NULL on
    degree-regular graphs, the genuine undefined case."""
    _, edges = _doc_link_graph(spark, sf_dir)
    return graph.degree_assortativity(edges)


def q_event_rate_autocorr(spark, sf_dir):
    """Per-cohort lag-{1,2,3} autocorrelation of the hourly event-rate
    series (temporal.series_autocorr) — the periodicity detector for
    ingest monitoring: ACF spikes at a daily lag reveal load cycles
    that slot_anomalies' fixed daily-slot model assumes rather than
    measures.  Exact-integer ACF (N-scaled deviations, one shared
    denominator so no sqrt, decimal(38)/HUGEINT ppm ratio); one key
    shuffle serves all series windows, each lag is a constant-fan
    (key, pos) equi-join."""
    from openstreetmap_license_change_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.select(
            (F.col("user_id") % 8).alias("cohort"),
            F.expr("CAST(ts AS TIMESTAMP)").cast("long").alias("_ep"),
        )
        .select("cohort", F.expr("_ep DIV 3600").alias("hour"))
        .groupBy("cohort", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return temporal.series_autocorr(
        hourly, "cohort", "hour", "n_events", lags=(1, 2, 3)
    )


def q_significance_prefilter(spark, sf_dir):
    """F1-F5 native tier of the significance kernel: normalize
    consecutive page text versions and compute levenshtein-based
    triviality, entirely JVM-side (tags.rb:264-295's cheap path)."""
    from openstreetmap_license_change_spark.functions import significance

    pages = _pages(spark, sf_dir)
    w = W.partitionBy("url").orderBy("version")
    pairs = (
        pages.withColumn("prev_text", F.lag(F.substring("text", 1, 64)).over(w))
        .withColumn("cur_text", F.substring("text", 1, 64))
        .where(F.col("prev_text").isNotNull())
    )
    o = significance.normalize(F.col("prev_text"))
    n = significance.normalize(F.col("cur_text"))
    return pairs.select(
        "url",
        "version",
        F.levenshtein(o, n).alias("lev_dist"),
        (o == n).alias("norm_equal"),
        (
            F.levenshtein(o, n)
            < F.floor(F.least(F.length(o), F.length(n)) / F.lit(8))
        ).alias("small_edit"),
    )


def q_classify_actions(spark, sf_dir):
    """A7: the history fold (grouped pandas UDF) over page lineages —
    non-SQL-expressible; golden-checked against the reference suites in
    tests/, rows-only here."""
    flagged = _pages_flagged(spark, sf_dir)
    hist = fold.pages_histories(flagged)
    return fold.classify_histories(hist)


def q_classify_actions_nodes(spark, sf_dir):
    """A7 (nodes-only oracle twin): the REAL fold (same mapInPandas
    path as q_classify_actions) restricted to node histories whose
    tags are exactly {'text': ...} (odbl-marked docs excluded).  With
    text byte-identical per url, the sequential lattice
    (change_bot.rb:91-105), taint bookkeeping (:136-151), ε-redaction
    (:156-162) and final edit/delete (:165-189) collapse to
    window-expressible rules, so the DuckDB oracle can verify the
    fold's actual output — action, version, mode, new tags/position —
    at data scale, not just on hand-written goldens."""
    flagged = _pages_flagged(spark, sf_dir).where(F.col("doc_id") % 23 != 0)
    hist = fold.pages_histories(flagged)
    return fold.classify_histories(hist).select(
        "url",
        "action",
        "version",
        "mode",
        F.get_json_object("new_tags_json", "$.text").alias("new_text"),
        "new_lon",
        "new_lat",
    )


def _way_corpus(spark, sf_dir):
    """Synthetic WAY histories with append/tail-delete-only node-list
    evolution, derived from the pages scaffold by pure arithmetic so
    the DuckDB oracle rebuilds the identical corpus.

    Per url, version v gets list length L_v = 2 + (doc_id·37 + 11v² +
    5v) mod 5 ∈ [2,6]; a transition only ever appends fresh node ids
    at the tail or truncates the tail (ids never reappear), so the
    reference's WayDiff/compose OT algebra (geom.rb:56-92, diff.rb)
    collapses to a closed form: the clean reconstruction keeps exactly
    the nodes INTRODUCED by accepted versions (unaccepted inserts park
    in the pending diff-state; deletes apply to whichever side holds
    them) — validated against core.history.element_actions on 3000
    randomized histories, then against the real mapInPandas fold by
    the driver's hash compare.

    Node ids are append ordinals; the occupant of position p at
    version v was appended by the LAST version w ≤ v whose transition
    filled p (L_{w−1} ≤ p < L_w), giving ordinal p + 1 + max D_w over
    filling w, where D = cumulative deletes (A − L) strictly increases
    between consecutive refills of the same position.  Versions carry
    the pages table's real visibility, so segment resets
    (change_bot.rb:77-83) are exercised too — see
    _append_delete_corpus; tags are the constant {"kind": "way"}."""
    return _append_delete_corpus(
        spark, sf_dir,
        l_expr=F.lit(2) + F.pmod(
            F.col("doc_id") * 37
            + F.col("version") * F.col("version") * 11
            + F.col("version") * 5,
            F.lit(5),
        ),
        element_type="way",
        tags_json='{"kind": "way"}',
    )


def _append_delete_corpus(spark, sf_dir, l_expr, element_type, tags_json):
    """Shared ordinal machinery for the way/relation oracle corpora:
    given a per-(doc_id, version) list-length expression, rebuild every
    version's member-ordinal list relationally (see _way_corpus).

    Versions carry the pages table's REAL visibility, so the corpora
    also exercise segment resets (change_bot.rb:77-83: an invisible
    version resets geometry to version-zero, tags to {}, and clears
    the pending diff state).  The closed form extends cleanly: within
    a segment the next visible version diffs against EMPTY, so the
    segment-start version re-introduces its whole list — member
    attribution becomes max(global intro version, segment start) —
    and the list evolution stays pure append/tail-delete between
    ADJACENT versions, which is all the in-segment diffs ever see.
    Validated vs core element_actions on 4000 randomized histories
    with ~25% invisible versions, per element type."""
    flagged = _pages_flagged(spark, sf_dir)
    vers = (
        flagged.select(
            "url", "doc_id",
            F.col("version").cast("int").alias("version"),
            "accepted", "visible",
        )
        .withColumn("L", l_expr.cast("int"))
    )
    wu = W.partitionBy("url").orderBy("version")
    vers = (
        vers.withColumn(
            "Lprev", F.coalesce(F.lag("L").over(wu), F.lit(0))
        )
        .withColumn(
            "A",
            F.sum(F.greatest(F.col("L") - F.col("Lprev"), F.lit(0))).over(
                wu
            ),
        )
        .withColumn("D", F.col("A") - F.col("L"))
    )
    pos = vers.select("url", "version", "L").withColumn(
        "p", F.explode(F.sequence(F.lit(0), F.col("L") - F.lit(1)))
    )
    fills = vers.select(
        F.col("url").alias("f_url"),
        F.col("version").alias("f_v"),
        F.col("Lprev").alias("f_lp"),
        F.col("L").alias("f_l"),
        F.col("D").alias("f_d"),
    )
    ords = (
        pos.join(
            fills,
            (pos.url == fills.f_url)
            & (fills.f_lp <= pos.p)
            & (pos.p < fills.f_l)
            & (fills.f_v <= pos.version),
        )
        .groupBy("url", "version", "p")
        .agg(
            (F.col("p") + F.lit(1) + F.max("f_d"))
            .cast("bigint")
            .alias("ordinal")
        )
    )
    node_lists = ords.groupBy("url", "version").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "ordinal"))),
            lambda s: s.ordinal,
        ).alias("nodes")
    )
    out = vers.join(node_lists, ["url", "version"]).select(
        "url",
        F.lit(element_type).alias("element_type"),
        "version",
        "visible",
        "accepted",
        F.lit(tags_json).alias("tags_json"),
        "nodes",
    )
    if element_type == "way":
        return out
    # relations: members are ("node", ordinal, "") triples carried as
    # the fold's members_json column, byte-matching json.dumps format
    return out.select(
        "url", "element_type", "version", "visible", "accepted",
        "tags_json",
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    "nodes",
                    lambda o: F.concat(
                        F.lit('["node", '),
                        o.cast("string"),
                        F.lit(', ""]'),
                    ),
                ),
                ", ",
            ),
            F.lit("]"),
        ).alias("members_json"),
    )


def q_classify_actions_relations(spark, sf_dir):
    """A7 (relations oracle twin): the REAL fold over an append/tail-
    delete RELATION corpus — members ("node", ordinal, "") with
    constant non-multipolygon tags, real page visibility.  On this
    restriction RelationDiff (geom.rb:120-170: detect_alter+move diff,
    the geom==@old shortcut, compose/split_deletes) reduces to the
    same closed form as ways — the shortcut is a no-op because
    B == prev-geom ⟺ pending-insert state is empty, members never
    reappear so no alters/moves — except validity is ≥1 member
    (osm.rb:224-226).  Validated vs core element_actions on 3000
    randomized histories; with classify_actions_nodes and
    classify_actions_ways this hash-verifies the fold on ALL THREE
    element types."""
    hist = _relation_corpus(spark, sf_dir)
    out = fold.classify_histories(hist)
    return out.select(
        "url",
        "action",
        "version",
        "mode",
        F.col("new_tags_json").alias("new_tags"),
        "new_members_json",
    )


def _relation_corpus(spark, sf_dir):
    return _append_delete_corpus(
        spark, sf_dir,
        l_expr=F.lit(1) + F.pmod(
            F.col("doc_id") * 41
            + F.col("version") * F.col("version") * 13
            + F.col("version") * 9,
            F.lit(5),
        ),
        element_type="relation",
        tags_json='{"kind": "rel"}',
    )


def q_classify_actions_ways(spark, sf_dir):
    """A7 (ways oracle twin): the REAL fold — same mapInPandas path,
    now exercising WayDiff/compose/split_deletes (geom.rb:56-92,
    diff.rb OT) — on the append/tail-delete way corpus, where the
    sequence algebra is SQL-expressible (see _way_corpus).  Together
    with classify_actions_nodes and classify_actions_relations this
    driver-hash-verifies the fold on all three element types."""
    hist = _way_corpus(spark, sf_dir)
    out = fold.classify_histories(hist)
    return out.select(
        "url",
        "action",
        "version",
        "mode",
        F.col("new_tags_json").alias("new_tags"),
        F.array_join(
            F.transform("new_nodes", lambda x: x.cast("string")), ","
        ).alias("new_nodes_str"),
    )


# synthetic cascade world: node ids are doc_ids; ways group 3
# consecutive docs; one relation per way (node member + way member);
# one super-relation per lang over its relations.  Id spaces are
# disjoint by offset so the derivation is pure arithmetic in both
# engines.  At sf0.01 this exercises every cascade path: way kills
# AND edits (pass 1), relation deletes AND edits (passes 1-2), and
# pass-3 relation-member removal in the super-relations.
CASCADE_WAY_OFF = 1_000_000_000_000
CASCADE_REL_OFF = 2_000_000_000_000
CASCADE_SUP_OFF = 3_000_000_000_000


def _member(mtype: str, ref):
    return F.struct(
        F.lit(mtype).alias("mtype"),
        ref.cast("bigint").alias("ref"),
        F.lit("").alias("role"),
    )


def q_cascade_deletes(spark, sf_dir):
    """G1/G2: the full delete cascade (node→way→relation→relation) as
    bounded joins over a derived 3-level world.  Node deletes come
    from the REAL fold (same restriction as classify_actions_nodes);
    the DuckDB oracle replays the reference's ≤3 passes
    (change_bot.rb:280-372) as explicit CTE stages."""
    from openstreetmap_license_change_spark.operators import cascade as casc

    flagged = _pages_flagged(spark, sf_dir).where(F.col("doc_id") % 23 != 0)
    actions = fold.classify_histories(fold.pages_histories(flagged))
    node_deletes = (
        actions.where(F.col("action") == "delete")
        .join(
            flagged.select("url", "doc_id").distinct(), "url", "inner"
        )
        .select(F.col("doc_id").alias("element_id"))
        .distinct()
    )
    docs = pages_src.documents(spark, sf_dir).where(F.col("doc_id") % 23 != 0)
    ways = docs.groupBy(F.expr("doc_id DIV 3").alias("g")).agg(
        F.sort_array(F.collect_list("doc_id")).alias("nodes"),
        F.min("doc_id").alias("min_doc"),
        F.min_by("lang", "doc_id").alias("way_lang"),
    ).select(
        (F.lit(CASCADE_WAY_OFF) + F.col("g")).alias("element_id"),
        F.lit(1).alias("version"),
        F.lit('{"kind": "way"}').alias("tags_json"),
        "nodes", "g", "min_doc", "way_lang",
    )
    rels = ways.select(
        (F.lit(CASCADE_REL_OFF) + F.col("g")).alias("element_id"),
        F.lit(1).alias("version"),
        F.lit('{"kind": "rel"}').alias("tags_json"),
        F.array(
            _member("node", F.col("min_doc")),
            _member("way", F.col("element_id")),
        ).alias("members"),
        "way_lang",
    )
    supers = rels.groupBy("way_lang").agg(
        F.sort_array(F.collect_list("element_id")).alias("rel_ids"),
        F.min("element_id").alias("min_rel"),
    ).select(
        (F.col("min_rel") - CASCADE_REL_OFF + CASCADE_SUP_OFF).alias(
            "element_id"
        ),
        F.lit(1).alias("version"),
        F.lit('{"kind": "super"}').alias("tags_json"),
        F.transform(
            "rel_ids",
            lambda r: F.struct(
                F.lit("relation").alias("mtype"),
                r.cast("bigint").alias("ref"),
                F.lit("").alias("role"),
            ),
        ).alias("members"),
    )
    current_ways = ways.select("element_id", "version", "tags_json", "nodes")
    current_relations = rels.drop("way_lang").unionByName(supers)

    empty_del = spark.createDataFrame([], "element_id bigint")
    empty_way_edits = spark.createDataFrame(
        [], "element_id bigint, version int, tags_json string, nodes array<bigint>"
    )
    empty_rels = spark.createDataFrame(
        [],
        "element_id bigint, version int, tags_json string, "
        "members array<struct<mtype:string, ref:bigint, role:string>>",
    )
    way_state, rel_state, all_deletes = casc.cascade(
        node_deletes, empty_del, empty_del,
        empty_way_edits, empty_rels, current_ways, current_relations,
    )
    return (
        all_deletes.select(
            "etype", "element_id", F.lit("delete").alias("outcome"),
            F.lit(-1).cast("bigint").alias("n_after"),
        )
        .unionByName(
            way_state.where("is_edit").select(
                F.lit("way").alias("etype"), "element_id",
                F.lit("edit").alias("outcome"),
                F.size("nodes").cast("bigint").alias("n_after"),
            )
        )
        .unionByName(
            rel_state.where("is_edit").select(
                F.lit("relation").alias("etype"), "element_id",
                F.lit("edit").alias("outcome"),
                F.size("members").cast("bigint").alias("n_after"),
            )
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "latest_version": q_latest_version,
        "reverse_cumulative_clean": q_reverse_cumulative_clean,
        "candidate_filter": q_candidate_filter,
        "changeset_accept_join": q_changeset_accept_join,
        "reverse_reference_join": q_reverse_reference_join,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "local_supplier_volume": q_local_supplier_volume,
        "promo_revenue": q_promo_revenue,
        "cell_assignment": q_cell_assignment,
        "point_dispersion": q_point_dispersion,
        "dispersion_ellipse": q_dispersion_ellipse,
        "quadrat_csr": q_quadrat,
        "clark_evans": q_clark_evans,
        "nn_g_function": q_nn_g_function,
        "spatial_eps_clusters": q_spatial_eps_clusters,
        "spatial_dbscan": q_spatial_dbscan,
        "radius_join": q_radius_join,
        "extent_overlap": q_extent_overlap,
        "segments_crossing": q_segments_crossing,
        "geohash_rollup": q_geohash_rollup,
        "polyline_length": q_polyline_length,
        "segment_cells_rollup": q_segment_cells_rollup,
        "quadkey_rollup": q_quadkey_rollup,
        "hilbert_rollup": q_hilbert_rollup,
        "snapshot_diff": q_snapshot_diff,
        "scd2_history": q_scd2_history,
        "cdc_apply": q_cdc_apply,
        "simplify_lines": q_simplify_lines,
        "tile_hotspots": q_tile_hotspots,
        "tile_trend": q_tile_trend,
        "od_flows": q_od_flows,
        "od_gravity": q_od_gravity,
        "ipf_balance": q_ipf_balance,
        "huff_shares": q_huff,
        "tile_join_counts": q_tile_join_counts,
        "morans_i": q_morans_i,
        "gearys_c": q_gearys_c,
        "raster_aspect": q_raster_aspect,
        "local_morans": q_local_morans,
        "flow_accum": q_flow_accum,
        "areal_interp": q_areal_interp,
        "rect_union": q_rect_union,
        "raster_hillshade": q_raster_hillshade,
        "ripley_k": q_ripley_k,
        "semivariogram": q_semivariogram,
        "semivariogram_directional": q_semivariogram_directional,
        "cell_compact": q_cell_compact,
        "rake_keywords": q_rake_keywords,
        "image_equalize": q_image_equalize,
        "audio_tempo": q_audio_tempo,
        "image_moments": q_image_moments,
        "image_otsu": q_image_otsu,
        "hist_emd": q_hist_emd,
        "mask_rle": q_mask_rle,
        "mask_iou": q_mask_iou,
        "mask_components": q_mask_components,
        "mad_outliers": q_mad_outliers,
        "bivariate_morans": q_bivariate_morans,
        "negative_samples": q_negative_samples,
        "kn_score": q_kn_score,
        "basin_label": q_basin_label,
        "ab_test": q_ab_test,
        "cover_filter": q_cover_filter,
        "langid_eval": q_langid_eval,
        "topic_gaps": q_topic_gaps,
        "blocking_eval": q_blocking_eval,
        "auc_eval": q_auc_eval,
        "annotator_kappa": q_annotator_kappa,
        "ranking_eval": q_ranking_eval,
        "ndcg_eval": q_ndcg_eval,
        "tile_rollup_incremental": q_tile_rollup_incremental,
        "tile_dilate": q_tile_dilate,
        "tile_erode": q_tile_erode,
        "collocations": q_collocations,
        "gazetteer_tag": q_gazetteer_tag,
        "hex_rollup": q_hex_rollup,
        "hex_focal_mean": q_hex_focal_mean,
        "polygon_stats": q_polygon_stats,
        "tile_rollup": q_tile_rollup,
        "raster_viewshed": q_raster_viewshed,
        "tile_focal_mean": q_tile_focal_mean,
        "tile_majority": q_tile_majority,
        "drainage_length": q_drainage_length,
        "tile_kde": q_tile_kde,
        "idw_cells": q_idw_cells,
        "convex_hull": q_convex_hull,
        "hull_diameter": q_hull_diameter,
        "directional_extremes": q_directional_extremes,
        "tile_rollup_multires": q_tile_rollup_multires,
        "tile_vectorize": q_tile_vectorize,
        "pip_polygons": q_pip_polygons,
        "pip_outside": q_pip_outside,
        "pip_rect": q_pip_rect,
        "knn_in_cell": q_knn_in_cell,
        "knn_neighborhood": q_knn_neighborhood,
        "knn_neighborhood_agg": q_knn_neighborhood_agg,
        "nearest_clean_attribution": q_nearest_clean_attribution,
        "knn_lang_vote": q_knn_lang_vote,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_jaccard_capped": q_ngram_jaccard_capped,
        "containment_pairs": q_containment_pairs,
        "jaccard_prefix": q_jaccard_prefix,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "minhash_lsh_pairs_capped": q_minhash_lsh_pairs_capped,
        "minhash_lsh_clusters": q_minhash_lsh_clusters,
        "golden_records": q_golden_records,
        "sorted_neighborhood": q_sorted_neighborhood,
        "cluster_audit": q_cluster_audit,
        "minhash_dedup_apply": q_minhash_dedup_apply,
        "sample_hash": q_sample_hash,
        "sample_stratified": q_sample_stratified,
        "dataset_split": q_dataset_split,
        "lang_topk_quality": q_lang_topk_quality,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "simhash_clusters": q_simhash_clusters,
        "contamination": q_contamination,
        "tfidf_topk": q_tfidf_topk,
        "textrank_keywords": q_textrank,
        "text_tiles": q_text_tiles,
        "bpe_pairs": q_bpe_pairs,
        "lexical_diversity": q_lexical_diversity,
        "vocab_growth": q_vocab_growth,
        "zipf_buckets": q_zipf_buckets,
        "lang_divergence": q_lang_divergence,
        "chi2_tokens": q_chi2_tokens,
        "token_runs": q_token_runs,
        "cube_rollup": q_cube_rollup,
        "events_gap_fill": q_events_gap_fill,
        "emerging_hotspots": q_emerging_hotspots,
        "neighbor_jaccard": q_neighbor_jaccard,
        "doc_ppr": q_doc_ppr,
        "morans_correlogram": q_morans_correlogram,
        "audio_zcr": q_audio_zcr,
        "audio_haar": q_audio_haar,
        "audio_onsets": q_audio_onsets,
        "video_ssim": q_video_ssim,
        "audio_pitch": q_audio_pitch,
        "image_gradients": q_image_gradients,
        "curation_verdict": q_curation_verdict,
        "embedding_silhouette": q_embedding_silhouette,
        "quality_calibration": q_quality_calibration,
        "ece_quality": q_ece_quality,
        "brier_quality": q_brier_quality,
        "isotonic_calibration": q_isotonic_calibration,
        "bootstrap_doclen": q_bootstrap_doclen,
        "ks_lang_lengths": q_ks_lang_lengths,
        "anova_doclen": q_anova_doclen,
        "fleiss_raters": q_fleiss_raters,
        "krippendorff": q_krippendorff,
        "benford_chars": q_benford_chars,
        "gini_gain_tokens": q_gini_gain_tokens,
        "quantile_normalize": q_quantile_normalize,
        "trimmed_mean": q_trimmed_mean,
        "k_anonymity": q_k_anonymity,
        "dq_orders": q_dq_orders,
        "line_merge": q_line_merge,
        "cell_polyfill": q_cell_polyfill,
        "route_corridor": q_route_corridor,
        "viterbi_match": q_viterbi_match,
        "knox_events": q_knox,
        "l_diversity": q_l_diversity,
        "t_closeness": q_t_closeness,
        "rank_sum_lengths": q_rank_sum_lengths,
        "theil_sen_hourly": q_theil_sen_hourly,
        "best_streak": q_best_streak,
        "conformal_bounds": q_conformal_bounds,
        "kfold_assign": q_kfold_assign,
        "sprt_decision": q_sprt_decision,
        "emst_tiles": q_emst_tiles,
        "fs_linkage": q_fs_linkage,
        "match_assignment": q_match_assignment,
        "event_bursts": q_event_bursts,
        "event_xcorr": q_event_xcorr,
        "session_paths": q_session_paths,
        "survival_km": q_survival_km,
        "sax_hourly": q_sax_hourly,
        "rfm_segments": q_rfm,
        "mase_hourly": q_mase_hourly,
        "ols_hourly": q_ols_hourly,
        "runs_test_hourly": q_runs_test_hourly,
        "twa_value": q_twa_value,
        "session_matrix": q_session_matrix,
        "pettitt_hourly": q_pettitt_hourly,
        "mcnemar_filters": q_mcnemar_filters,
        "seasonal_hourly": q_seasonal_hourly,
        "polygon_validity_report": q_polygon_validity,
        "image_box_contrast": q_image_box_contrast,
        "contact_episodes": q_contact_episodes,
        "flock_groups": q_flock_groups,
        "kn_bigrams": q_kn_bigrams,
        "vocab_drift": q_vocab_drift,
        "token_burstiness": q_token_burstiness,
        "charset_profile": q_charset_profile,
        "winnow_fingerprints": q_winnow,
        "robots_filter": q_robots_filter,
        "quality_calibrate": q_quality_calibrate,
        "rare_token_ratio": q_rare_token_ratio,
        "chunk_documents": q_chunk_documents,
        "length_batches": q_length_batches,
        "mixture_resample": q_mixture_resample,
        "doc_pagerank": q_doc_pagerank,
        "katz_centrality": q_katz_centrality,
        "hyperball_harmonic": q_hyperball,
        "rich_club": q_rich_club,
        "bowtie_regions": q_bowtie,
        "attack_robustness": q_attack_robustness,
        "random_failure": q_random_failure,
        "lt_influence": q_lt_influence,
        "onion_layers": q_onion,
        "betweenness": q_betweenness,
        "graph_diameter": q_graph_diameter,
        "link_distance": q_link_distance,
        "dag_levels": q_dag_levels,
        "graph_profile": q_graph_profile,
        "bottleneck_width": q_bottleneck_width,
        "weighted_distance": q_weighted_distance,
        "rrf_hybrid": q_rrf_hybrid,
        "skyline_docs": q_skyline_docs,
        "label_spread": q_label_spread,
        "bm25_topk": q_bm25_topk,
        "gopher_filter": q_gopher_filter,
        "stay_points": q_stay_points,
        "hausdorff_tracks": q_hausdorff_tracks,
        "frechet_tracks": q_frechet_tracks,
        "dtw_tracks": q_dtw_tracks,
        "edr_tracks": q_edr_tracks,
        "lcss_tracks": q_lcss_tracks,
        "turn_stats": q_turn_stats,
        "resample_track": q_resample_track,
        "cusum_split": q_cusum_split,
        "hrw_assign": q_hrw_assign,
        "colocation_pairs": q_colocation_pairs,
        "followed_by": q_followed_by,
        "props_rollup": q_props_rollup,
        "geofence_transitions": q_geofence_transitions,
        "trip_cell_paths": q_trip_cell_paths,
        "cell_gini": q_cell_gini,
        "decayed_rollup": q_decayed_rollup,
        "slot_anomalies": q_slot_anomalies,
        "rolling_rollup": q_rolling_rollup,
        "interval_coverage": q_interval_coverage,
        "fuzzy_url_pairs": q_fuzzy_url_pairs,
        "concordance": q_concordance,
        "raster_distance": q_raster_distance,
        "raster_cost_distance": q_raster_cost_distance,
        "tile_contours": q_tile_contours,
        "adaptive_tiles": q_adaptive_tiles,
        "snap_to_segments": q_snap_to_segments,
        "inverted_index": q_inverted_index,
        "bloom_membership": q_bloom_membership,
        "weighted_sample": q_weighted_sample,
        "cocitation_pairs": q_cocitation_pairs,
        "link_prediction": q_link_prediction,
        "triangle_counts": q_triangle_counts,
        "clustering_coeff": q_clustering_coeff,
        "link_components": q_link_components,
        "scc_components": q_scc_components,
        "redirect_resolve": q_redirect_resolve,
        "hits": q_hits,
        "modularity": q_modularity,
        "kcore": q_kcore,
        "ktruss_links": q_ktruss_links,
        "pq_encode": q_pq_encode,
        "pq_search": q_pq_search,
        "pca_top": q_pca_top,
        "coupling_pairs": q_coupling_pairs,
        "kmv_distinct_docs": q_kmv_distinct_docs,
        "hll_token_distinct": q_hll_token_distinct,
        "token_f2": q_token_f2,
        "vocab_overlap": q_vocab_overlap,
        "kendall_len_tokens": q_kendall_len_tokens,
        "spearman_len_tokens": q_spearman_len_tokens,
        "postings_cost": q_postings_cost,
        "countmin_topk": q_countmin_topk,
        "sampled_quantiles": q_sampled_quantiles,
        "repetition_stats": q_repetition_stats,
        "passage_dedup": q_passage_dedup,
        "pii_scrub": q_pii_scrub,
        "html_extract": q_html_extract,
        "boilerplate_strip": q_boilerplate_strip,
        "canonical_url": q_canonical_url,
        "geotag_cells": q_geotag_cells,
        "domain_rollup": q_domain_rollup,
        "text_quality": q_text_quality,
        "readability": q_readability,
        "lang_id": q_lang_id,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_centroids": q_embedding_centroids,
        "kcenter_seeds": q_kcenter_seeds,
        "mmr_rerank": q_mmr_rerank,
        "embedding_dim_stats": q_embedding_dim_stats,
        "kmeans_assign": q_kmeans_assign,
        "pip_multipolygons": q_pip_multipolygons,
        "pip_multipolygons_prefiltered": q_pip_multipolygons_prefiltered,
        "zonal_stats": q_zonal_stats,
        "lsh_bucket_topk": q_lsh_bucket_topk,
        "ann_recall": q_ann_recall,
        "ivf_topk": q_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "mutual_knn": q_mutual_knn,
        "pip_rect_prefiltered": q_pip_rect_prefiltered,
        "regions_available": q_regions_available,
        "doc_fingerprint": q_doc_fingerprint,
        "token_stats": q_token_stats,
        "token_quantiles": q_token_quantiles,
        "osmchange_render": q_osmchange_render,
        "media_decode_stats": q_media_decode_stats,
        "media_dhash": q_media_dhash,
        "image_phash": q_image_phash,
        "dhash_pairs": q_dhash_pairs,
        "audio_decode_stats": q_audio_decode_stats,
        "video_frame_stats": q_video_frame_stats,
        "video_shots": q_video_shots,
        "video_keyframes": q_video_keyframes,
        "audio_silence": q_audio_silence,
        "image_patches": q_image_patches,
        "events_sessionize": q_events_sessionize,
        "trip_segments": q_trip_segments,
        "events_asof_join": q_events_asof_join,
        "event_funnel": q_event_funnel,
        "funnel_latency": q_funnel_latency,
        "holt_hourly": q_holt_hourly,
        "event_retention": q_event_retention,
        "event_transitions": q_event_transitions,
        "events_hourly_rollup": q_events_hourly_rollup,
        "events_interval_join": q_events_interval_join,
        "peak_concurrency": q_peak_concurrency,
        "session_rules": q_session_rules,
        "attribution": q_attribution,
        "attribution_decay": q_attribution_decay,
        "markov_attribution": q_markov_attribution,
        "active_users": q_active_users,
        "events_overlap_join": q_events_overlap_join,
        "allen_relations": q_allen_relations,
        "event_rate_autocorr": q_event_rate_autocorr,
        "link_assortativity": q_link_assortativity,
        "str_leaves": q_str_leaves,
        "winsorize_lengths": q_winsorize_lengths,
        "documents_profile": q_documents_profile,
        "significance_prefilter": q_significance_prefilter,
        "classify_actions": q_classify_actions,
        "classify_actions_nodes": q_classify_actions_nodes,
        "classify_actions_ways": q_classify_actions_ways,
        "classify_actions_relations": q_classify_actions_relations,
        "cascade_deletes": q_cascade_deletes,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def lt_influence_oracle() -> str:
    """Seeds (top out-degree hubs, deterministic order) + the
    unrolled full-recompute LT twin over the shared link graph."""
    return f"""
        WITH lts_deg AS (
            SELECT src, COUNT(*) AS cnt FROM {_PR_EDGES_SQL} e
            GROUP BY 1
        ),
        lts_seeds AS (
            SELECT src AS node FROM lts_deg
            ORDER BY cnt DESC, src LIMIT {LT_SEEDS}
        )
        SELECT * FROM ({graph.lt_influence_sql(
            _PR_EDGES_SQL, 'lts_seeds',
            theta_ppm=LT_THETA, max_rounds=LT_ROUNDS)})
    """


def _with_pages(body: str) -> str:
    return pages_src.oracle_prelude() + "\n" + body


def _with_pages_recursive(body: str) -> str:
    """Pages prelude with the WITH promoted to WITH RECURSIVE so the
    body may append recursive CTEs to the same chain (DuckDB scopes the
    RECURSIVE keyword to the whole WITH list)."""
    return (
        pages_src.oracle_prelude().replace("WITH ", "WITH RECURSIVE ", 1)
        + "\n"
        + body
    )


def _fold_restriction_sql(
    l_sql: str,
    min_len: int,
    tags_lit: str,
    member_agg: str,
    member_render: str,
    out_col: str,
) -> str:
    """DuckDB twin of the fold over an append/tail-delete corpus WITH
    segment resets (see _append_delete_corpus).  Closed form, validated
    against core element_actions on 4000 randomized histories per
    element type: members introduced by accepted versions survive into
    the clean reconstruction, where a member's introducer inside a
    segment is max(global append version, segment start); tags taint
    at any unaccepted segment start and never launder; final
    delete/edit only when the last version is visible."""
    return _with_pages(f"""
        , wv AS (
            SELECT p.url, p.doc_id,
                   CAST(p.version AS INT) AS version, s.accepted,
                   p.visible,
                   CAST({l_sql} AS INT) AS L
            FROM pages p JOIN cs_status s USING (changeset_id)
        ),
        wv2 AS (
            SELECT *,
                   COALESCE(LAG(L) OVER (PARTITION BY url
                                         ORDER BY version), 0) AS Lprev,
                   COALESCE(SUM(CASE WHEN NOT visible THEN 1 ELSE 0 END)
                       OVER (PARTITION BY url ORDER BY version
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS seg_id
            FROM wv
        ),
        wv3 AS (
            SELECT *,
                   CAST(SUM(GREATEST(L - Lprev, 0)) OVER (
                       PARTITION BY url ORDER BY version)
                       AS BIGINT) AS A
            FROM wv2
        ),
        wv4 AS (SELECT *, A - L AS D FROM wv3),
        segstarts AS (
            SELECT url, seg_id, MIN(version) AS seg_start
            FROM wv4 WHERE visible GROUP BY url, seg_id
        ),
        pos AS (
            SELECT url, version, L,
                   UNNEST(range(0, CAST(L AS BIGINT))) AS p
            FROM wv4
        ),
        ords AS (
            SELECT po.url, po.version, po.p,
                   po.p + 1 + MAX(f.D) AS ordinal
            FROM pos po
            JOIN wv4 f ON f.url = po.url
                      AND f.Lprev <= po.p AND po.p < f.L
                      AND f.version <= po.version
            GROUP BY po.url, po.version, po.p
        ),
        intro AS (
            SELECT url, version AS gv,
                   UNNEST(range(A - GREATEST(L - Lprev, 0) + 1,
                                A + 1)) AS o
            FROM wv4
        ),
        attr AS (
            SELECT o.url, o.version, o.p, o.ordinal,
                   iw.accepted AS intro_acc
            FROM ords o
            JOIN wv4 v ON v.url = o.url AND v.version = o.version
            JOIN segstarts ss ON ss.url = o.url
                             AND ss.seg_id = v.seg_id
            JOIN intro i ON i.url = o.url AND i.o = o.ordinal
            JOIN wv4 iw ON iw.url = o.url
                       AND iw.version = GREATEST(i.gv, ss.seg_start)
            WHERE v.visible
        ),
        verbad AS (
            SELECT url, version,
                   MAX(CASE WHEN NOT intro_acc THEN 1 ELSE 0 END)
                       AS geom_bad
            FROM attr GROUP BY url, version
        ),
        flags AS (
            SELECT v.*,
                   (v.version = ss.seg_start) AS is_seg_start,
                   MAX(CASE WHEN v.version = ss.seg_start
                             AND NOT v.accepted
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY v.url ORDER BY v.version)
                       AS tainted_upto
            FROM wv4 v
            JOIN segstarts ss ON ss.url = v.url
                             AND ss.seg_id = v.seg_id
            WHERE v.visible
        ),
        redacts AS (
            SELECT v.url, 'redact' AS action, v.version,
                   CASE WHEN v.accepted THEN 'visible'
                        WHEN v.is_seg_start THEN 'hidden'
                        WHEN v.L > v.Lprev THEN 'hidden'
                        ELSE 'visible' END AS mode,
                   CAST(NULL AS VARCHAR) AS new_tags,
                   CAST(NULL AS VARCHAR) AS {out_col}
            FROM flags v
            JOIN verbad b ON b.url = v.url AND b.version = v.version
            WHERE b.geom_bad = 1 OR v.tainted_upto = 1
        ),
        firsts AS (
            SELECT url, MAX(version) AS n,
                   arg_max(visible, version) AS last_visible
            FROM wv4 GROUP BY url
        ),
        taints AS (
            SELECT url,
                   MAX(CASE WHEN is_seg_start AND NOT accepted
                            THEN 1 ELSE 0 END) AS tainted_any
            FROM flags GROUP BY url
        ),
        bfinal AS (
            SELECT a.url,
                   SUM(CASE WHEN a.intro_acc THEN 1 ELSE 0 END) AS nb,
                   COUNT(*) AS ntot,
                   {member_agg} AS mstr
            FROM attr a
            JOIN firsts f ON a.url = f.url AND a.version = f.n
            GROUP BY a.url
        ),
        deletes AS (
            SELECT b.url, 'delete' AS action,
                   CAST(NULL AS INT) AS version,
                   CAST(NULL AS VARCHAR) AS mode,
                   CAST(NULL AS VARCHAR) AS new_tags,
                   CAST(NULL AS VARCHAR) AS {out_col}
            FROM bfinal b WHERE b.nb < {min_len}
        ),
        edits AS (
            SELECT b.url, 'edit' AS action,
                   CAST(f.n AS INT) AS version,
                   CAST(NULL AS VARCHAR) AS mode,
                   CASE WHEN t.tainted_any = 1 THEN '{{}}'
                        ELSE {tags_lit} END AS new_tags,
                   {member_render} AS {out_col}
            FROM bfinal b
            JOIN firsts f USING (url)
            JOIN taints t USING (url)
            WHERE b.nb >= {min_len}
              AND (t.tainted_any = 1 OR b.nb <> b.ntot)
        )
        SELECT * FROM redacts
        UNION ALL SELECT * FROM deletes
        UNION ALL SELECT * FROM edits
    """)


_RARE_TOKEN_SQL = """
            WITH toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            dfq AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY 1)
            SELECT doc_id,
                   COUNT(*) AS n_distinct,
                   CAST(SUM(CASE WHEN df <= 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rare,
                   CAST((SUM(CASE WHEN df <= 1 THEN 1 ELSE 0 END)
                         * 1000000) // COUNT(*) AS BIGINT) AS rare_ppm
            FROM toks JOIN dfq USING (token)
            GROUP BY doc_id
        """

_REPETITION_SQL = """
            WITH g AS (
                SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS gram
                FROM (SELECT doc_id,
                             string_split_regex(lower(text), '\\s+') AS ts
                      FROM documents) t,
                     LATERAL (SELECT UNNEST(
                                  range(1, GREATEST(len(ts) - 1, 1) + 1))
                              AS i) u
                WHERE length(array_to_string(ts[i:i+1], ' ')) > 0
            ),
            counts AS (
                SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2
            ),
            agg AS (
                SELECT doc_id,
                       CAST(SUM(c) AS BIGINT) AS n_ngrams,
                       MAX(c) AS top_ngram_count,
                       CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c END), 0)
                            AS BIGINT) AS dup_ngram_occurrences
                FROM counts GROUP BY 1
            )
            SELECT doc_id, n_ngrams, top_ngram_count,
                   dup_ngram_occurrences,
                   (top_ngram_count * 1000000) // n_ngrams AS top_share_m,
                   (dup_ngram_occurrences * 1000000) // n_ngrams
                       AS dup_share_m,
                   ((top_ngram_count * 1000000) // n_ngrams > 200000
                    OR (dup_ngram_occurrences * 1000000) // n_ngrams
                       > 600000) AS repetitive
            FROM agg
        """


def oracle_sql() -> dict[str, str]:
    from openstreetmap_license_change_spark.operators import (
        sampling as sampling_ops,
        temporal,
    )

    cell = spatial.grid_cell_sql("lon", "lat")
    # 5×5 separable binomial kernel taps (dy, dx, C(4,dy+2)·C(4,dx+2))
    _b = [1, 4, 6, 4, 1]
    kde_taps = ",".join(
        f"({dy},{dx},{_b[dy + 2] * _b[dx + 2]})"
        for dy in range(-2, 3) for dx in range(-2, 3)
    )
    cell30 = spatial.grid_cell_sql("lon", "lat", 30.0)
    hex5 = hexgrid.hex_key_sql("lon", "lat", 5.0)
    tile = spatial.quad_tile_sql("lon", "lat")
    mh_aggs = ", ".join(
        f"MIN((token_id * {a} + {b}) % {dedup.MINHASH_PRIME}) AS mh_{i}"
        for i, (a, b) in enumerate(dedup.MINHASH_PERMS)
    )
    bands = []
    rows_per_band = len(dedup.MINHASH_PERMS) // dedup.LSH_BANDS
    for band in range(dedup.LSH_BANDS):
        cols = " || '|' || ".join(
            f"CAST(mh_{band * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        bands.append(f"SELECT doc_id, {band} AS band, {cols} AS bucket FROM sig")

    sw = {
        lang: ", ".join(f"'{w}'" for w in ws)
        for lang, ws in textops.STOPWORDS.items()
    }

    # shared by the lang_id entry and its confusion-metrics evaluation
    _langid_sql = f"""
            WITH hits AS (
                SELECT lang,
                       len(list_intersect(
                           list_distinct(string_split_regex(lower(text), '\\s+')),
                           [{sw['en']}])) AS h_en,
                       len(list_intersect(
                           list_distinct(string_split_regex(lower(text), '\\s+')),
                           [{sw['de']}])) AS h_de,
                       len(list_intersect(
                           list_distinct(string_split_regex(lower(text), '\\s+')),
                           [{sw['fr']}])) AS h_fr,
                       len(list_intersect(
                           list_distinct(string_split_regex(lower(text), '\\s+')),
                           [{sw['es']}])) AS h_es
                FROM documents
            ),
            pred AS (
                SELECT lang,
                       CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                            WHEN h_es > GREATEST(h_en, h_de, h_fr) THEN 'es'
                            WHEN h_fr > GREATEST(h_en, h_de) THEN 'fr'
                            WHEN h_de > h_en THEN 'de'
                            ELSE 'en' END AS lang_pred
                FROM hits
            )
            SELECT lang, lang_pred, COUNT(*) AS n_docs
            FROM pred GROUP BY 1, 2
        """

    # hyperplane-LSH twin: the same sin-derived planes as
    # similarity._planes, dot products via list_dot_product; the query
    # bucket is computed in-SQL from vec_id=0 so both engines bucket
    # from identical double arithmetic
    planes = similarity._planes(64, ANN_PLANES)
    n_pl = len(planes)
    bucket_sql = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(w) for w in p)}]) > 0 "
        f"THEN {1 << (n_pl - 1 - i)} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    masks = ", ".join(f"({m})" for m in [0] + [1 << i for i in range(n_pl)])
    lsh_prelude = f"""
            WITH bucketed AS (
                SELECT vec_id, embedding, {bucket_sql} AS bucket
                FROM embeddings
            ),
            qb AS (SELECT bucket AS b, embedding AS qv FROM bucketed
                   WHERE vec_id = 0),
            probe AS (
                SELECT vec_id,
                       ROUND(list_cosine_similarity(
                           CAST(embedding AS DOUBLE[]),
                           CAST((SELECT qv FROM qb) AS DOUBLE[])), 6)
                           AS cos_sim
                FROM bucketed
                WHERE vec_id <> 0 AND bucket IN (
                    SELECT xor((SELECT b FROM qb), m.m)
                    FROM (VALUES {masks}) m(m)
                )
            )
    """

    # simhash twin: 63 conditional sums then a bit-pack, mirroring
    # dedup._simhash_bitval / dedup.simhash64 constant-for-constant
    sim_votes = ", ".join(
        f"SUM(((token_id * {dedup.SIMHASH_MULTS[j]} + {j * 97})"
        f" % {dedup.MINHASH_PRIME}) % 2 * 2 - 1) AS v_{j}"
        for j in range(dedup.SIMHASH_BITS)
    )
    sim_pack = " + ".join(
        f"CAST(v_{j} > 0 AS BIGINT) * {1 << j}"
        for j in range(dedup.SIMHASH_BITS)
    )

    # PIP polygon layer → edge rows (vertex i paired with predecessor j,
    # wrapping — matching the even-odd UDF's loop, spatial.py)
    pip_edges = []
    for pid, ring in PIP_POLYGONS:
        jj = len(ring) - 1
        for ii in range(len(ring)):
            xi, yi = ring[ii]
            xj, yj = ring[jj]
            pip_edges.append(f"({pid}, {xi!r}, {yi!r}, {xj!r}, {yj!r})")
            jj = ii
    pip_edges_sql = ", ".join(pip_edges)

    # multipolygon layer → edge rows over ALL rings (holes/islands
    # share the pid; combined parity = XOR of per-ring parities)
    pip_multi_edges = []
    for pid, rings in PIP_MULTIPOLYGONS:
        for ring in rings:
            jj = len(ring) - 1
            for ii in range(len(ring)):
                xi, yi = ring[ii]
                xj, yj = ring[jj]
                pip_multi_edges.append(
                    f"({pid}, {xi!r}, {yi!r}, {xj!r}, {yj!r})"
                )
                jj = ii
    pip_multi_edges_sql = ", ".join(pip_multi_edges)

    # shared by minhash_lsh_clusters and minhash_dedup_apply: transitive
    # closure over the doc–bucket graph (recursive CTE), label = min id
    # shared by the minhash_lsh_pairs entry and blocking_eval
    _lsh_pairs_sql = f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            joined AS (
                SELECT doc_id, {dedup.token_hash_sql('token')} AS token_id
                FROM toks
            ),
            sig AS (SELECT doc_id, {mh_aggs} FROM joined GROUP BY doc_id),
            buckets AS ({" UNION ALL ".join(bands)})
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.doc_id < b.doc_id
        """

    lsh_clusters_prelude = f"""
            WITH RECURSIVE toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            joined AS (
                SELECT doc_id, {dedup.token_hash_sql('token')} AS token_id
                FROM toks
            ),
            sig AS (SELECT doc_id, {mh_aggs} FROM joined GROUP BY doc_id),
            membership AS (
                SELECT doc_id,
                       CAST(band AS VARCHAR) || '#' || bucket AS bk
                FROM ({" UNION ALL ".join(bands)})
            ),
            reach(doc_id, label) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT m2.doc_id, r.label
                FROM reach r
                JOIN membership m1 ON m1.doc_id = r.doc_id
                JOIN membership m2 ON m2.bk = m1.bk
            ),
            clusters AS (
                SELECT doc_id, MIN(label) AS cluster_id
                FROM reach GROUP BY doc_id
            )
    """

    d = {
        "latest_version": _with_pages("""
            SELECT url,
                   version AS last_version,
                   changeset_id AS last_changeset,
                   visible AS last_visible
            FROM (
                SELECT p.*,
                       ROW_NUMBER() OVER (PARTITION BY url ORDER BY version DESC)
                           AS rn
                FROM pages p
            ) t WHERE rn = 1
        """),
        "reverse_cumulative_clean": _with_pages("""
            SELECT p.url, p.version, s.accepted,
                   MIN(CAST(s.accepted AS INT)) OVER (
                       PARTITION BY p.url ORDER BY p.version
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) = 1 AS clean_from_here
            FROM pages p JOIN cs_status s USING (changeset_id)
        """),
        "candidate_filter": _with_pages("""
            SELECT DISTINCT p.url
            FROM pages p JOIN cs_status s USING (changeset_id)
            WHERE p.url IN (
                SELECT url FROM pages p2 JOIN cs_status s2 USING (changeset_id)
                WHERE NOT s2.accepted
            )
        """),
        "changeset_accept_join": _with_pages("""
            SELECT p.changeset_id, s.accepted,
                   COUNT(*) AS n_versions,
                   COUNT(CASE WHEN p.visible THEN 1 END) AS n_visible
            FROM pages p JOIN cs_status s USING (changeset_id)
            GROUP BY p.changeset_id, s.accepted
        """),
        "reverse_reference_join": """
            WITH deletes AS (
                SELECT p_partkey AS del_part FROM part WHERE p_size < 5
            )
            SELECT l.l_orderkey, COUNT(*) AS n_refs
            FROM lineitem l JOIN deletes d ON l.l_partkey = d.del_part
            GROUP BY l.l_orderkey
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "shipping_priority": """
            SELECT l_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_date,
                   o_orderpriority,
                   CAST(SUM(CAST(ROUND(
                       l_extendedprice * (1 - l_discount) * 10000
                   ) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > DATE '1998-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "local_supplier_volume": """
            SELECT r_name, n_name,
                   CAST(SUM(CAST(ROUND(
                       l_extendedprice * (1 - l_discount) * 10000
                   ) AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
              AND o_orderdate < TIMESTAMP '1999-01-01'
            GROUP BY r_name, n_name
        """,
        "promo_revenue": """
            SELECT substring(CAST(l_shipdate AS VARCHAR), 1, 7) AS ship_month,
                   CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
                       CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT) ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(
                       l_extendedprice * (1 - l_discount) * 10000
                   ) AS BIGINT)) AS DOUBLE) AS promo_share,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        "point_dispersion": _with_pages(
            """, pd_latest AS (
                SELECT lang, lon, lat FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC)
                               AS rn
                    FROM pages p
                ) WHERE rn = 1
            )
            """
            + spatial.point_dispersion_sql("pd_latest", "lang")
        ),
        "dispersion_ellipse": _with_pages(
            """, de_latest AS (
                SELECT lang, lon, lat FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC)
                               AS rn
                    FROM pages p
                ) WHERE rn = 1
            ),
            """
            + spatial.dispersion_ellipse_sql("de_latest", "lang")
            .lstrip()[len("WITH"):]
        ),
        "quadrat_csr": _with_pages(
            """, qt_latest AS (
                SELECT lon, lat FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC)
                               AS rn
                    FROM pages p
                ) WHERE rn = 1
            ),
            """
            + spatial.quadrat_test_sql(
                "qt_latest", (-180.0, -90.0, 180.0, 90.0), 10.0
            ).lstrip()[len("WITH"):]
        ),
        "nn_g_function": _with_pages(
            """, gfq_latest AS (
                SELECT doc_id, lon, lat FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC)
                               AS rn
                    FROM pages p
                ) WHERE rn = 1
            )
            SELECT * FROM ("""
            + spatial.nn_g_counts_sql("gfq_latest", 20.0, NN_G_RADII)
            + ")"
        ),
        "clark_evans": _with_pages(
            """, ce_latest AS (
                SELECT doc_id, lon, lat FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC)
                               AS rn
                    FROM pages p
                ) WHERE rn = 1
            ),
            """
            + spatial.clark_evans2_sql(
                "ce_latest", 20.0, (-180.0, -90.0, 180.0, 90.0)
            ).lstrip()[len("WITH"):]
        ),
        "cell_assignment": _with_pages(f"""
            SELECT url, lon, lat,
                   {cell} AS cell,
                   {tile} AS tile
            FROM (
                SELECT p.*,
                       ROW_NUMBER() OVER (PARTITION BY url ORDER BY version DESC)
                           AS rn
                FROM pages p
            ) t WHERE rn = 1
        """),
        "spatial_eps_clusters": _with_pages_recursive("""
            , pts AS (
                SELECT url || '#' || CAST(version AS VARCHAR) AS pid,
                       lon, lat
                FROM pages
            ),
            edges AS (
                SELECT a.pid AS src, b.pid AS dst
                FROM pts a JOIN pts b ON a.pid <> b.pid
                WHERE POWER(LEAST(ABS(a.lon - b.lon),
                                  360 - ABS(a.lon - b.lon)), 2)
                      + POWER(a.lat - b.lat, 2) <= 0.0001
            ),
            reach(pid, lbl) AS (
                SELECT pid, pid FROM pts
                UNION
                SELECT e.dst, r.lbl
                FROM reach r JOIN edges e ON e.src = r.pid
            )
            SELECT pid, MIN(lbl) AS cluster_id
            FROM reach GROUP BY 1
        """),
        "radius_join": _with_pages("""
            , latest AS (
                SELECT url, lang, lon, lat FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            SELECT a.url, b.url AS cand_url,
                   LEAST(ABS(a.lon - b.lon), 360 - ABS(a.lon - b.lon))
                     * LEAST(ABS(a.lon - b.lon), 360 - ABS(a.lon - b.lon))
                     + (a.lat - b.lat) * (a.lat - b.lat) AS dist2
            FROM latest a JOIN latest b
              ON a.lang = 'en' AND b.lang = 'de'
            WHERE LEAST(ABS(a.lon - b.lon), 360 - ABS(a.lon - b.lon))
                    * LEAST(ABS(a.lon - b.lon), 360 - ABS(a.lon - b.lon))
                    + (a.lat - b.lat) * (a.lat - b.lat) <= 64.0
        """),
        "hex_rollup": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            ),
            keyed AS (
                SELECT {hex5} AS hex_id, accepted FROM latest
            ),
            agg AS (
                SELECT hex_id,
                       COUNT(*) AS n_pages,
                       SUM(CASE WHEN NOT accepted THEN 1 ELSE 0 END)
                           AS n_tainted
                FROM keyed GROUP BY 1
            ),
            dec AS (
                SELECT *,
                       CAST(FLOOR(hex_id / 2097152.0) AS BIGINT)
                           - 1048576 AS hex_q,
                       (hex_id % 2097152) - 1048576 AS hex_r
                FROM agg
            )
            SELECT hex_id, hex_q, hex_r,
                   n_pages, CAST(n_tainted AS BIGINT) AS n_tainted,
                   ROUND(5.0 * 1.7320508075688772
                         * (CAST(hex_q AS DOUBLE)
                            + CAST(hex_r AS DOUBLE) / 2.0), 6)
                       AS center_lon,
                   ROUND(5.0 * 1.5 * CAST(hex_r AS DOUBLE), 6)
                       AS center_lat
            FROM dec
        """),
        "polygon_stats": _with_pages("""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            pts AS (
                SELECT lang, doc_id,
                       CAST(ROUND(lon * 1000) AS BIGINT) AS x,
                       CAST(ROUND(lat * 1000) AS BIGINT) AS y
                FROM latest WHERE doc_id % 17 = 0
            ),
            edges AS (
                SELECT lang, x AS ax, y AS ay,
                       COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS bx,
                       COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS by
                FROM pts
                WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING)
            ),
            agg AS (
                SELECT lang,
                       COUNT(*) AS n_vertices,
                       CAST(SUM(ax * by - bx * ay) AS BIGINT)
                           AS area2_scaled,
                       CAST(SUM((ax + bx) * (ax * by - bx * ay)) AS BIGINT)
                           AS cxn,
                       CAST(SUM((ay + by) * (ax * by - bx * ay)) AS BIGINT)
                           AS cyn
                FROM edges GROUP BY 1
            )
            SELECT lang, n_vertices, area2_scaled,
                   CASE WHEN area2_scaled <> 0 THEN
                       ROUND(cxn / (3.0 * area2_scaled), 6)
                   END AS centroid_x,
                   CASE WHEN area2_scaled <> 0 THEN
                       ROUND(cyn / (3.0 * area2_scaled), 6)
                   END AS centroid_y
            FROM agg
        """),
        "hex_focal_mean": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            ),
            rollup AS (
                SELECT {hex5} AS hex_id, COUNT(*) AS n_pages
                FROM latest GROUP BY 1
            ),
            dec AS (
                SELECT hex_id, n_pages,
                       CAST(FLOOR(hex_id / 2097152.0) AS BIGINT)
                           - 1048576 AS hex_q,
                       (hex_id % 2097152) - 1048576 AS hex_r
                FROM rollup
            ),
            fan AS (
                SELECT ((d.hex_q + o.dq + 1048576) * 2097152
                        + (d.hex_r + o.dr + 1048576)) AS t_hex,
                       d.n_pages AS v
                FROM dec d CROSS JOIN (VALUES
                     (0,0),(1,0),(1,-1),(0,-1),(-1,0),(-1,1),(0,1)
                ) o(dq, dr)
            ),
            fagg AS (
                SELECT t_hex,
                       COUNT(*) AS n_nbrs,
                       CAST(SUM(v) AS BIGINT) AS nbr_sum
                FROM fan GROUP BY 1
            )
            SELECT r.hex_id, a.n_nbrs, a.nbr_sum,
                   (a.nbr_sum * 1000000) // a.n_nbrs AS focal_mean_m
            FROM rollup r JOIN fagg a ON a.t_hex = r.hex_id
        """),
        "extent_overlap": _with_pages("""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            boxes AS (
                SELECT url, lang,
                       lon - (doc_id % 97 + 1) / 10.0 AS lon_min,
                       lon + (doc_id % 97 + 1) / 10.0 AS lon_max,
                       lat - ((doc_id * 7) % 89 + 1) / 10.0 AS lat_min,
                       lat + ((doc_id * 7) % 89 + 1) / 10.0 AS lat_max
                FROM latest
            )
            SELECT a.url AS url_a, b.url AS url_b,
                   ROUND(GREATEST(a.lon_min, b.lon_min), 6) AS ilon_min,
                   ROUND(LEAST(a.lon_max, b.lon_max), 6) AS ilon_max,
                   ROUND(GREATEST(a.lat_min, b.lat_min), 6) AS ilat_min,
                   ROUND(LEAST(a.lat_max, b.lat_max), 6) AS ilat_max
            FROM boxes a JOIN boxes b
              ON a.lang = 'en' AND b.lang = 'de'
             AND a.lon_min <= b.lon_max AND b.lon_min <= a.lon_max
             AND a.lat_min <= b.lat_max AND b.lat_min <= a.lat_max
        """),
        "segments_crossing": _with_pages("""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            segs AS (
                SELECT url, lang,
                       CAST(ROUND(lon * 10000) AS BIGINT) AS x1,
                       CAST(ROUND(lat * 10000) AS BIGINT) AS y1,
                       CAST(ROUND(LEAD(lon) OVER w * 10000) AS BIGINT) AS x2,
                       CAST(ROUND(LEAD(lat) OVER w * 10000) AS BIGINT) AS y2
                FROM latest
                WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
            ),
            pairs AS (
                SELECT a.url AS url_a, b.url AS url_b,
                       b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2,
                       (a.x2-a.x1)*(b.y1-a.y1)
                         - (a.y2-a.y1)*(b.x1-a.x1) AS o1,
                       (a.x2-a.x1)*(b.y2-a.y1)
                         - (a.y2-a.y1)*(b.x2-a.x1) AS o2,
                       (b.x2-b.x1)*(a.y1-b.y1)
                         - (b.y2-b.y1)*(a.x1-b.x1) AS o3,
                       (b.x2-b.x1)*(a.y2-b.y1)
                         - (b.y2-b.y1)*(a.x2-b.x1) AS o4
                FROM segs a JOIN segs b
                  ON a.lang = 'en' AND b.lang = 'de'
                WHERE a.x2 IS NOT NULL AND b.x2 IS NOT NULL
            )
            SELECT url_a, url_b,
                   ROUND((CAST(bx1 AS DOUBLE)
                          + CAST(bx2 - bx1 AS DOUBLE)
                            * (CAST(o1 AS DOUBLE)
                               / CAST(o1 - o2 AS DOUBLE))) / 10000.0,
                         6) AS ix,
                   ROUND((CAST(by1 AS DOUBLE)
                          + CAST(by2 - by1 AS DOUBLE)
                            * (CAST(o1 AS DOUBLE)
                               / CAST(o1 - o2 AS DOUBLE))) / 10000.0,
                         6) AS iy
            FROM pairs
            WHERE SIGN(o1) * SIGN(o2) < 0 AND SIGN(o3) * SIGN(o4) < 0
        """),
        "segment_cells_rollup": _with_pages("""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            segs AS (
                SELECT url,
                       CAST(ROUND(lon * 10000) AS BIGINT) + 1800000 AS x1,
                       CAST(ROUND(lat * 10000) AS BIGINT) + 900000 AS y1,
                       CAST(ROUND(LEAD(lon) OVER w * 10000) AS BIGINT)
                           + 1800000 AS x2,
                       CAST(ROUND(LEAD(lat) OVER w * 10000) AS BIGINT)
                           + 900000 AS y2
                FROM latest
                WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
            ),
            norm AS (
                SELECT url,
                       CASE WHEN x2 < x1 THEN x2 ELSE x1 END AS ax,
                       CASE WHEN x2 < x1 THEN y2 ELSE y1 END AS ay,
                       CASE WHEN x2 < x1 THEN x1 ELSE x2 END AS bx,
                       CASE WHEN x2 < x1 THEN y1 ELSE y2 END AS ey
                FROM segs WHERE x2 IS NOT NULL
            ),
            cols AS (
                SELECT url, ax, ay, bx, ey,
                       bx - ax AS dx, ey - ay AS dy,
                       UNNEST(generate_series(
                           CAST((ax - ax % 50000) / 50000 AS BIGINT),
                           CAST((bx - bx % 50000) / 50000 AS BIGINT)
                       )) AS cell_x
                FROM norm
            ),
            clip AS (
                SELECT url, cell_x, dx, ay, ey,
                       ay * dx + dy * (GREATEST(ax, cell_x * 50000) - ax)
                           AS na,
                       ay * dx + dy * (LEAST(bx, (cell_x + 1) * 50000) - ax)
                           AS nb,
                       dx * 50000 AS den
                FROM cols
            ),
            rowspan AS (
                SELECT url, cell_x,
                       CASE WHEN dx = 0 THEN CAST((LEAST(ay, ey)
                                - LEAST(ay, ey) % 50000) / 50000 AS BIGINT)
                            ELSE CAST((LEAST(na, nb)
                                - LEAST(na, nb) % den) / den AS BIGINT)
                       END AS iy_lo,
                       CASE WHEN dx = 0 THEN CAST((GREATEST(ay, ey)
                                - GREATEST(ay, ey) % 50000) / 50000 AS BIGINT)
                            ELSE CAST((GREATEST(na, nb)
                                - GREATEST(na, nb) % den) / den AS BIGINT)
                       END AS iy_hi
                FROM clip
            ),
            cells AS (
                SELECT url, cell_x,
                       UNNEST(generate_series(iy_lo, iy_hi)) AS cell_y
                FROM rowspan
            )
            SELECT cell_x, cell_y, COUNT(*) AS n_segments
            FROM cells GROUP BY 1, 2
        """),
        "huff_shares": _with_pages(
            """, hf_latest AS (
                SELECT doc_id, lon, lat FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            hf_sites AS MATERIALIZED (
                SELECT (_cy + 90) * 1000 + _cx + 180 AS site_id,
                       CAST(_cx * 4 + 2.0 AS DOUBLE) AS lon,
                       CAST(_cy * 4 + 2.0 AS DOUBLE) AS lat,
                       attract
                FROM (
                    SELECT CAST(FLOOR(lon / 4) AS BIGINT) AS _cx,
                           CAST(FLOOR(lat / 4) AS BIGINT) AS _cy,
                           CAST(COUNT(*) AS BIGINT) AS attract
                    FROM hf_latest GROUP BY 1, 2
                    ORDER BY attract DESC, _cy, _cx LIMIT 20
                )
            ),
            """
            + spatial.huff_shares_sql(
                "hf_latest", "hf_sites", 4.0
            ).lstrip()[len("WITH"):]
        ),
        "ipf_balance": _with_pages(
            f"""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            ipf_le AS (SELECT * FROM latest WHERE doc_id % 2 = 0),
            ipf_lo AS (SELECT * FROM latest WHERE doc_id % 2 = 1),
            ipf_seed AS MATERIALIZED (
                {spatial.od_flows_sql('ipf_le', 'lang', 'doc_id')}
            ),
            ipf_tgt AS MATERIALIZED (
                {spatial.od_flows_sql('ipf_lo', 'lang', 'doc_id')}
            ),
            ipf_rt0 AS (
                SELECT cell_from,
                       CAST(SUM(n_flows) AS BIGINT) AS target
                FROM ipf_tgt GROUP BY 1
            ),
            ipf_ct0 AS (
                SELECT cell_to,
                       CAST(SUM(n_flows) AS BIGINT) AS target
                FROM ipf_tgt GROUP BY 1
            ),
            """
            + spatial.ipf_balance_sql(
                "ipf_seed", "ipf_rt0", "ipf_ct0", rounds=6
            ).lstrip()[len("WITH"):]
        ),
        "od_flows": _with_pages(f"""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            {spatial.od_flows_sql('latest', 'lang', 'doc_id')}
        """),
        "collocations": textops.collocations_sql(
            "documents", min_count=3
        ),
        "gazetteer_tag": textops.gazetteer_tag_sql(
            "documents", _GAZETTEER
        ),
        "od_gravity": _with_pages(f"""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            og_flows AS (
                SELECT cell_from, cell_to, n_flows FROM (
                    {spatial.od_flows_sql('latest', 'lang', 'doc_id')}
                )
            )
            SELECT * FROM (
                {spatial.od_gravity_residuals_sql('og_flows')}
            )
        """),
        "simplify_lines": _with_pages(f"""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            {spatial.simplify_lines_sql(
                'latest', 'lang', 'doc_id', SIMPLIFY_MIN_AREA2)}
        """),
        "polyline_length": _with_pages(f"""
            , latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            segs AS (
                SELECT lang, lon, lat,
                       LAG(lon) OVER w AS plon,
                       LAG(lat) OVER w AS plat
                FROM latest
                WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
            ),
            ukms AS (
                SELECT lang,
                       CASE WHEN plon IS NOT NULL THEN CAST(ROUND(
                           ({spatial.haversine_sql('plon', 'plat',
                                                   'lon', 'lat')})
                           * 1000000.0) AS BIGINT)
                       END AS ukm
                FROM segs
            )
            SELECT lang, COUNT(ukm) AS n_segments,
                   ROUND(CAST(COALESCE(SUM(ukm), 0) AS DOUBLE)
                         / 1000000.0, 6) AS length_km
            FROM ukms GROUP BY 1
        """),
        "geohash_rollup": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            )
            SELECT {spatial.geohash_sql('lon', 'lat', 3)} AS geohash,
                   COUNT(*) AS n_pages,
                   CAST(SUM(CASE WHEN NOT accepted THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tainted
            FROM latest GROUP BY 1
        """),
        "quadkey_rollup": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            )
            SELECT {spatial.quadkey_sql('lon', 'lat', 5)} AS quadkey,
                   COUNT(*) AS n_pages,
                   CAST(SUM(CASE WHEN NOT accepted THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tainted
            FROM latest GROUP BY 1
        """),
        "hilbert_rollup": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            )
            SELECT hcell,
                   COUNT(*) AS n_pages,
                   CAST(SUM(CASE WHEN NOT accepted THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tainted
            FROM ({hilbert.hilbert_sql('latest', 'url, accepted', order=8)})
            GROUP BY 1
        """),
        "cdc_apply": _with_pages(
            "SELECT * FROM ("
            + snapshots.cdc_apply_sql(
                "(SELECT url, lon, lat, visible FROM pages "
                "WHERE version = 1)",
                "(SELECT url, CAST(version AS BIGINT) AS seq, "
                "CASE WHEN visible THEN 'upsert' ELSE 'delete' END "
                "AS op, lon, lat, visible FROM pages "
                "WHERE version >= 2)",
            )
            + ")"
        ),
        "scd2_history": _with_pages(
            "SELECT * FROM (" + snapshots.scd2_history_sql("pages") + ")"
        ),
        "snapshot_diff": _with_pages(
            ", " + snapshots.snapshot_diff_ctes(
                "pages", SNAPSHOT_EPOCH_A, SNAPSHOT_EPOCH_B
            )
        ),
        "spatial_dbscan": _with_pages_recursive("""
            , pts AS (
                SELECT url || '#' || CAST(version AS VARCHAR) AS pid,
                       lon, lat
                FROM pages
            ),
            edges AS (  -- directed both ways (a.pid <> b.pid)
                SELECT a.pid AS src, b.pid AS dst
                FROM pts a JOIN pts b ON a.pid <> b.pid
                WHERE POWER(LEAST(ABS(a.lon - b.lon),
                                  360 - ABS(a.lon - b.lon)), 2)
                      + POWER(a.lat - b.lat, 2) <= 0.0001
            ),
            deg AS (SELECT src AS pid, COUNT(*) AS nb FROM edges GROUP BY 1),
            core AS (
                SELECT p.pid FROM pts p LEFT JOIN deg d ON d.pid = p.pid
                WHERE COALESCE(d.nb, 0) + 1 >= 3
            ),
            cedges AS (
                SELECT e.src, e.dst FROM edges e
                JOIN core c1 ON c1.pid = e.src
                JOIN core c2 ON c2.pid = e.dst
            ),
            reach(pid, lbl) AS (
                SELECT pid, pid FROM core
                UNION
                SELECT e.dst, r.lbl
                FROM reach r JOIN cedges e ON e.src = r.pid
            ),
            clab AS (
                SELECT pid, MIN(lbl) AS cluster_id FROM reach GROUP BY 1
            ),
            border AS (
                SELECT e.src AS pid, MIN(cl.cluster_id) AS cluster_id
                FROM edges e
                JOIN core c2 ON c2.pid = e.dst
                JOIN clab cl ON cl.pid = e.dst
                WHERE e.src NOT IN (SELECT pid FROM core)
                GROUP BY 1
            )
            SELECT p.pid,
                   CASE WHEN cl.pid IS NOT NULL THEN 'core'
                        WHEN b.pid IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   COALESCE(cl.cluster_id, b.cluster_id) AS cluster_id
            FROM pts p
            LEFT JOIN clab cl ON cl.pid = p.pid
            LEFT JOIN border b ON b.pid = p.pid
        """),
        "raster_viewshed": _with_pages(
            ", vw_raster AS (SELECT " + cell + " AS cell, "
            "CAST(COUNT(*) AS BIGINT) AS n_pages FROM pages "
            "GROUP BY 1), "
            "vw_top AS (SELECT cell FROM vw_raster "
            "ORDER BY n_pages DESC, cell LIMIT 3), "
            + spatial.raster_viewshed_ctes(
                "vw_raster", "vw_top", radius=10
            )
        ),
        "tile_rollup": _with_pages(f"""
            SELECT cell, n_pages, n_tainted,
                   ROUND(CAST(n_tainted AS DOUBLE) / n_pages, 6)
                       AS taint_density
            FROM (
                SELECT {cell} AS cell,
                       COUNT(*) AS n_pages,
                       -- CAST: DuckDB promotes SUM(INTEGER) to HUGEINT,
                       -- which the driver's type-sensitive hash rejects.
                       CAST(SUM(CAST(NOT s.accepted AS INT)) AS BIGINT)
                           AS n_tainted
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ) t
        """),
        "tile_focal_mean": _with_pages(f"""
            , rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            fan AS (
                SELECT r.n_pages AS v,
                       (((r.cell // 1440) + d.dy) * 1440
                        + ((r.cell % 1440) + d.dx + 1440) % 1440) AS t_cell
                FROM rollup r CROSS JOIN (VALUES
                     (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                     (1,-1),(1,0),(1,1)) d(dy, dx)
                WHERE (r.cell // 1440) + d.dy >= 0
                  AND (r.cell // 1440) + d.dy < 720
            ),
            agg AS (
                SELECT t_cell AS cell,
                       COUNT(*) AS n_nbrs,
                       CAST(SUM(v) AS BIGINT) AS nbr_sum
                FROM fan GROUP BY 1
            )
            SELECT r.cell, a.n_nbrs, a.nbr_sum,
                   (a.nbr_sum * 1000000) // a.n_nbrs AS focal_mean_m
            FROM rollup r JOIN agg a ON a.cell = r.cell
        """),
        "tile_majority": _with_pages(f"""
            , tm_classed AS (
                SELECT cell,
                       CASE WHEN n_pages >= 20 THEN 'dense'
                            WHEN n_pages >= 5 THEN 'mid'
                            ELSE 'sparse' END AS density
                FROM (
                    SELECT {cell} AS cell, COUNT(*) AS n_pages
                    FROM pages p JOIN cs_status s USING (changeset_id)
                    GROUP BY 1
                )
            )
            {spatial.tile_majority_sql('tm_classed', 'density')}
        """),
        "tile_trend": _with_pages(
            ", " + spatial.tile_trend_ctes(
                "(SELECT " + spatial.grid_cell_sql("lon", "lat")
                + " AS cell, version FROM pages p "
                + "JOIN cs_status s USING (changeset_id))",
                time_col="version", n_bins=4,
            )
        ),
        # the incremental query's oracle is deliberately the DIRECT
        # full rollup: hash equality proves the merge path exact
        "tile_rollup_incremental": _with_pages(f"""
            SELECT cell, n_pages, n_tainted,
                   ROUND(CAST(n_tainted AS DOUBLE) / n_pages, 6)
                       AS taint_density
            FROM (
                SELECT {cell} AS cell,
                       COUNT(*) AS n_pages,
                       CAST(SUM(CAST(NOT s.accepted AS INT)) AS BIGINT)
                           AS n_tainted
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ) t
        """),
        "tile_dilate": _with_pages(f"""
            , morph_src AS (
                SELECT {cell} AS cell
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            {spatial.tile_morphology_sql('morph_src', 'dilate')}
        """),
        "inverted_index": textops.inverted_index_sql(
            "documents", shard_size=II_SHARD
        ),
        "pca_top": similarity.pca_power_top_sql(
            "embeddings", rounds=PCA_ROUNDS
        ),
        "pq_encode": similarity.pq_encode_sql(
            "embeddings", m=PQ_M, codes=PQ_CODES
        ),
        "pq_search": similarity.pq_search_sql(
            "(SELECT * FROM embeddings WHERE vec_id <> 0)",
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)",
            k=10, m=PQ_M, codes=PQ_CODES,
        ),
        "bloom_membership": (
            "SELECT token, in_bloom, "
            "NOT starts_with(token, 'absent_') AS present FROM ("
            + sketches.bloom_ctes(
                "documents",
                "(SELECT DISTINCT token FROM ("
                "SELECT unnest(string_split_regex(lower(text), '\\s+'))"
                " AS token FROM documents) WHERE token <> '' "
                "UNION ALL "
                "SELECT 'absent_' || CAST(i AS VARCHAR) "
                "FROM generate_series(0, 9) g(i))",
                n_bits=BLOOM_BITS,
                k=BLOOM_K,
            )
            + ")"
        ),
        "snap_to_segments": _with_pages(
            """
            , sn_latest AS (
                SELECT url, lang, lon, lat, doc_id FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            sn_points AS (
                SELECT url AS point_id, lon, lat FROM sn_latest
            ),
            sn_segs AS (
                SELECT url AS seg_id, lon1, lat1, lon2, lat2 FROM (
                    SELECT url, lon AS lon1, lat AS lat1,
                           LEAD(lon) OVER w AS lon2,
                           LEAD(lat) OVER w AS lat2
                    FROM sn_latest
                    WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
                ) s WHERE lon2 IS NOT NULL
            )
            """
            + spatial.snap_to_segments_sql(
                "sn_points", "sn_segs", res_deg=5.0
            ).replace("WITH ", ", ", 1)
        ),
        "adaptive_tiles": _with_pages(
            spatial.adaptive_tiles_sql("pages", **ADAPT_ARGS)
            .replace("WITH ", ", ", 1)
        ),
        "raster_distance": _with_pages(f"""
            , rd_latest AS (
                SELECT lon, lat FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            morph_src AS (
                SELECT DISTINCT {spatial.grid_cell_sql('lon', 'lat', 5.0)}
                    AS cell
                FROM rd_latest
            ),
            rd_seeds AS (
                SELECT cell FROM morph_src
                WHERE cell // {RD_COLS} >= {RD_BANDS[0]}
                  AND cell // {RD_COLS} < {RD_BANDS[1]}
                  AND cell % {RD_COLS} >= {RD_BANDS[2]}
                  AND cell % {RD_COLS} < {RD_BANDS[3]}
            )
            {spatial.raster_distance_sql(
                'morph_src', 'rd_seeds', rounds=RD_ROUNDS, res_deg=RD_RES,
            )}
        """),
        "raster_cost_distance": _with_pages(f"""
            , rcd_cost AS (
                SELECT {spatial.grid_cell_sql('lon', 'lat', 5.0)}
                           AS cell,
                       1 + CAST(SUM(CASE WHEN s.accepted THEN 0
                                    ELSE 1 END) AS BIGINT) AS cost
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            rcd_seeds AS (
                SELECT cell FROM rcd_cost
                WHERE cell // {RD_COLS} >= {RD_BANDS[0]}
                  AND cell // {RD_COLS} < {RD_BANDS[1]}
                  AND cell % {RD_COLS} >= {RD_BANDS[2]}
                  AND cell % {RD_COLS} < {RD_BANDS[3]}
            )
            {spatial.raster_cost_distance_sql(
                'rcd_cost', 'rcd_seeds', rounds=RD_ROUNDS,
                res_deg=RD_RES,
            )}
        """),
        "tile_contours": _with_pages(f"""
            , morph_src AS (
                SELECT {cell} AS cell
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            {spatial.tile_contours_sql('morph_src')}
        """),
        "tile_erode": _with_pages(f"""
            , morph_src AS (
                SELECT {spatial.grid_cell_sql('lon', 'lat', 10.0)} AS cell
                FROM pages GROUP BY 1
            )
            {spatial.tile_morphology_sql('morph_src', 'erode',
                                         res_deg=10.0)}
        """),
        "tile_join_counts": _with_pages(f"""
            , jc_rollup AS (
                SELECT {cell} AS cell,
                       (SUM(CASE WHEN NOT accepted THEN 1 ELSE 0 END) > 0)
                           AS any_taint
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            , {spatial.tile_join_counts_ctes('jc_rollup', 'any_taint')}
        """),
        "morans_i": _with_pages(f"""
            , mi_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            , {spatial.morans_i_ctes('mi_rollup', 'n_pages')}
        """),
        "gearys_c": _with_pages(f"""
            , gc_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            , {spatial.gearys_c_ctes('gc_rollup', 'n_pages')}
        """),
        "raster_aspect": _with_pages(f"""
            , ra_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            , {spatial.raster_aspect_ctes('ra_rollup', 'n_pages')}
        """),
        "raster_hillshade": _with_pages(f"""
            , rh_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            SELECT * FROM ({spatial.raster_hillshade_sql(
                'rh_rollup', 'n_pages', z_scale=2)})
        """),
        "ripley_k": _with_pages(f"""
            , rk_latest AS (
                SELECT url, lon, lat FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            SELECT * FROM ({spatial.ripley_k_sql(
                'rk_latest',
                [250_000, 500_000, 1_000_000, 2_000_000],
            )})
        """),
        "rake_keywords": textops.rake_keywords_sql("documents", k=3),
        "topic_gaps": textops.topic_gaps_sql(
            "documents", block_size=20, threshold_ppm=100_000
        ),
        "cover_filter": _with_pages(f"""
            , cf_latest AS (
                SELECT url, lon, lat FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            cf_pts AS (
                SELECT url, {spatial.hier_cell_sql('lon', 'lat', 7)}
                           AS cell
                FROM cf_latest
            ),
            cf_cells AS (
                SELECT {spatial.hier_cell_sql('lon', 'lat', 7)} AS cell,
                       COUNT(*) AS n
                FROM pages p GROUP BY 1
            ),
            cf_cov AS (
                SELECT DISTINCT CAST({5 << 36}
                       + ((cell & {spatial._BASE_MASK}) >> 4) AS BIGINT)
                       AS cell
                FROM cf_cells WHERE n >= 3
                UNION
                SELECT cell FROM cf_cells WHERE n = 2
            )
            {spatial.cover_filter_sql('cf_pts', 'cf_cov', 7)}
        """),
        "ab_test": evaluation.chi2_2x2_sql(
            "(SELECT event_type, user_id % 2 = 1 AS is_b, "
            "value >= 10.0 AS ok FROM events)",
            "event_type",
            "is_b",
            "ok",
        ),
        "basin_label": _with_pages(f"""
            , bl_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            SELECT * FROM (
                {spatial.basin_label_sql('bl_rollup', 'n_pages')}
            )
        """),
        "kn_score": textops.kn_score_docs_sql(
            "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
            textops.kn_bigram_model_sql(
                "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
                min_count=1,
            ),
        ),
        "negative_samples": graph.negative_edge_samples_sql(
            "(SELECT doc_id AS node FROM documents)",
            _PR_EDGES_SQL,
            k=3,
            n_probes=12,
        ),
        "bivariate_morans": _with_pages(f"""
            , bmq_rollup AS (
                SELECT {cell} AS cell,
                       CAST(SUM(CASE WHEN NOT s.accepted THEN 1
                                ELSE 0 END) AS BIGINT) AS n_tainted,
                       CAST(COUNT(*) AS BIGINT) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            , {spatial.bivariate_morans_ctes(
                'bmq_rollup', 'n_tainted', 'n_pages'
            )}
        """),
        "mad_outliers": profile_mod.mad_outliers_sql(
            "documents", "lang", "doc_id", "n_chars"
        ),
        "mask_rle": multimodal_mod.mask_rle_runs_sql(_MASK_FGPX_SQL),
        "audio_tempo": multimodal_mod.audio_tempo_sql(
            **AUDIO_TEMPO_ARGS
        ),
        "image_moments": multimodal_mod.image_moments_sql(16, 48, 32),
        "image_otsu": multimodal_mod.image_otsu_sql(16, 48, 32),
        "hist_emd": multimodal_mod.hist_emd_sql(
            16, 48, 32, n_bins=16, max_emd_ppm=300_000
        ),
        "mask_iou": multimodal_mod.mask_iou_sql(_MASK_FGPX_SQL),
        "mask_components": multimodal_mod.mask_components_sql(
            _MASK_FGPX_SQL, width=MASK_W
        ),
        "image_equalize": """
            WITH eq_imgs AS (SELECT UNNEST(range(0, 16)) AS media_id),
            eq_pix AS (
                SELECT i.media_id,
                       (x.x * 3 + y.y * 7 + 0 + i.media_id * 13) % 256
                     + (x.x * 3 + y.y * 7 + 11 + i.media_id * 13) % 256
                     + (x.x * 3 + y.y * 7 + 22 + i.media_id * 13) % 256
                           AS gray
                FROM eq_imgs i, range(0, 48) x(x), range(0, 32) y(y)
            ),
            eq_hist AS (
                SELECT media_id, gray,
                       CAST(COUNT(*) AS BIGINT) AS n_pixels
                FROM eq_pix GROUP BY 1, 2
            ),
            eq_cdf AS (
                SELECT media_id, gray, n_pixels,
                       CAST(SUM(n_pixels) OVER (
                            PARTITION BY media_id ORDER BY gray
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cdf,
                       CAST(FIRST_VALUE(n_pixels) OVER (
                            PARTITION BY media_id ORDER BY gray
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cdf_min,
                       CAST(SUM(n_pixels) OVER (
                            PARTITION BY media_id) AS BIGINT) AS n
                FROM eq_hist
            )
            SELECT media_id, CAST(gray AS INT) AS gray, n_pixels, cdf,
                   CAST(CASE WHEN n - cdf_min = 0 THEN 0
                        ELSE ((cdf - cdf_min) * 255) // (n - cdf_min)
                   END AS INT) AS lut
            FROM eq_cdf
        """,
        "auc_eval": f"""
            WITH auc_src AS (
                SELECT lang,
                       CAST(n_chars AS BIGINT) AS score,
                       regexp_matches(text, '[0-9]') AS label
                FROM documents
            )
            SELECT * FROM ({evaluation.roc_auc_sql(
                'auc_src', 'lang', 'score', 'label'
            )})
        """,
        "ranking_eval": evaluation.ranking_eval_sql(
            f"""(
            SELECT query_id, doc_id, rank FROM (
                SELECT q.query_id, d.doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.query_id
                           ORDER BY (d.doc_id * (q.query_id * 2 + 3)
                                     + q.query_id) % 997, d.doc_id
                       ) AS rank
                FROM documents d
                CROSS JOIN (SELECT range AS query_id
                            FROM range({RE_QUERIES})) q
            ) WHERE rank <= {RE_K}
        )""",
            f"""(
            SELECT q.query_id, d.doc_id
            FROM documents d
            CROSS JOIN (SELECT range AS query_id
                        FROM range({RE_QUERIES})) q
            WHERE (d.doc_id * (q.query_id * 2 + 3) + q.query_id) % 997
                      < 150
                  AND d.doc_id % 3 <> 0
        )""",
            k=RE_K,
        ),
        "ndcg_eval": evaluation.ndcg_eval_sql(
            f"""(
            SELECT query_id, doc_id, rank FROM (
                SELECT q.query_id, d.doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.query_id
                           ORDER BY (d.doc_id * (q.query_id * 2 + 3)
                                     + q.query_id) % 997, d.doc_id
                       ) AS rank
                FROM documents d
                CROSS JOIN (SELECT range AS query_id
                            FROM range({RE_QUERIES})) q
            ) WHERE rank <= {RE_K}
        )""",
            f"""(
            SELECT q.query_id, d.doc_id
            FROM documents d
            CROSS JOIN (SELECT range AS query_id
                        FROM range({RE_QUERIES})) q
            WHERE (d.doc_id * (q.query_id * 2 + 3) + q.query_id) % 997
                      < 150
                  AND d.doc_id % 3 <> 0
        )""",
            k=RE_K,
        ),
        "hits": f"""
            SELECT node AS doc_id, auth_q, hub_q
            FROM ({graph.hits_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                iterations=HITS_ITERATIONS,
            )})
        """,
        "modularity": f"""
            SELECT label AS lang, n_nodes, deg_sum, e_in, q_ppm
            FROM ({graph.modularity_sql(
                '(SELECT doc_id AS node, lang AS label '
                'FROM documents)',
                _PR_EDGES_SQL,
            )})
        """,
        "annotator_kappa": f"""
            WITH ck_src AS (
                SELECT lang,
                       CASE WHEN n_chars >= 300 THEN 'keep'
                            ELSE 'drop' END AS la,
                       CASE WHEN n_chars + (doc_id * 37) % 120 - 60
                                 >= 300 THEN 'keep'
                            ELSE 'drop' END AS lb
                FROM documents
            )
            SELECT * FROM ({evaluation.cohen_kappa_sql(
                'ck_src', 'lang', 'la', 'lb'
            )})
        """,
        "cell_compact": _with_pages(f"""
            , ccq_cells AS (
                SELECT {spatial.hier_cell_sql('lon', 'lat', 7)} AS cell,
                       COUNT(*) AS n
                FROM pages p GROUP BY 1
            ),
            ccq_dense5 AS (
                SELECT DISTINCT CAST({5 << 36}
                       + ((cell & {spatial._BASE_MASK}) >> 4) AS BIGINT)
                       AS cell
                FROM ccq_cells WHERE n >= 3
            ),
            ccq_dense7 AS (
                {spatial.uncompact_cells_sql('ccq_dense5', 7)}
            ),
            ccq_cover AS (
                SELECT DISTINCT cell FROM (
                    SELECT cell FROM ccq_dense7
                    UNION ALL
                    SELECT cell FROM ccq_cells WHERE n < 3
                )
            )
            SELECT * FROM ({spatial.compact_cells_sql('ccq_cover', 7)})
        """),
        "semivariogram": _with_pages(f"""
            , sv_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            sv_src AS (
                SELECT cell,
                       (cell % 1440 + 0.5) * 0.25 - 180.0 AS lon,
                       (cell // 1440 + 0.5) * 0.25 - 90.0 AS lat,
                       n_pages
                FROM sv_rollup
            )
            SELECT * FROM ({spatial.semivariogram_sql(
                'sv_src',
                [500_000, 1_000_000, 2_000_000],
                'n_pages',
                id_col='cell',
            )})
        """),
        "semivariogram_directional": _with_pages(f"""
            , svd_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            svd_src AS (
                SELECT cell,
                       (cell % 1440 + 0.5) * 0.25 - 180.0 AS lon,
                       (cell // 1440 + 0.5) * 0.25 - 90.0 AS lat,
                       n_pages
                FROM svd_rollup
            )
            SELECT * FROM ({spatial.semivariogram_directional_sql(
                'svd_src',
                [500_000, 1_000_000, 2_000_000],
                'n_pages',
                id_col='cell',
            )})
        """),
        "areal_interp": _with_pages(f"""
            , ai_src AS (
                SELECT rect_id AS src_id,
                       _x - rect_id % 997 AS minx,
                       _y - (rect_id * 3) % 997 AS miny,
                       _x + (rect_id * 7) % 997 + 1 AS maxx,
                       _y + (rect_id * 11) % 997 + 1 AS maxy,
                       rect_id % 1000 + 1 AS value
                FROM (
                    SELECT doc_id * 16 + version AS rect_id,
                           CAST(FLOOR(lon * 1000000.0) AS BIGINT) AS _x,
                           CAST(FLOOR(lat * 1000000.0) AS BIGINT) AS _y
                    FROM pages
                )
            ),
            ai_tgt AS (
                SELECT z AS tgt_id,
                       (z % 24) * 15000000 - 180000000 AS minx,
                       (z // 24) * 15000000 - 90000000 AS miny,
                       (z % 24) * 15000000 - 165000000 AS maxx,
                       (z // 24) * 15000000 - 75000000 AS maxy
                FROM (SELECT UNNEST(range(0, 288)) AS z)
            )
            SELECT * FROM (
                {spatial.areal_interp_sql('ai_src', 'ai_tgt')}
            )
        """),
        "rect_union": _with_pages(f"""
            , ru_latest AS (
                SELECT lang, doc_id,
                       CAST(FLOOR(lon * 1000000.0) AS BIGINT) AS _x,
                       CAST(FLOOR(lat * 1000000.0) AS BIGINT) AS _y
                FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            ru_src AS (
                SELECT lang,
                       _x - (doc_id % 9973) * 100 AS minx,
                       _y - ((doc_id * 3) % 9973) * 100 AS miny,
                       _x + ((doc_id * 7) % 9973) * 100 + 1 AS maxx,
                       _y + ((doc_id * 11) % 9973) * 100 + 1 AS maxy
                FROM ru_latest
            ),
            {spatial.rect_union_area_ctes('ru_src', 'lang')}
        """),
        "drainage_length": _with_pages(f"""
            , dl_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            SELECT * FROM (
                {spatial.drainage_length_sql('dl_rollup', 'n_pages')}
            )
        """),
        "flow_accum": _with_pages(f"""
            , fa_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            SELECT * FROM (
                {spatial.flow_accumulation_sql('fa_rollup', 'n_pages')}
            )
        """),
        "local_morans": _with_pages(f"""
            , lmi_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            )
            , {spatial.local_morans_ctes('lmi_rollup', 'n_pages')}
        """),
        "tile_hotspots": _with_pages(f"""
            , rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            fan AS (
                SELECT r.n_pages AS v,
                       (((r.cell // 1440) + d.dy) * 1440
                        + ((r.cell % 1440) + d.dx + 1440) % 1440) AS t_cell
                FROM rollup r CROSS JOIN (VALUES
                     (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                     (1,-1),(1,0),(1,1)) d(dy, dx)
                WHERE (r.cell // 1440) + d.dy >= 0
                  AND (r.cell // 1440) + d.dy < 720
            ),
            agg AS (
                SELECT t_cell AS cell,
                       COUNT(*) AS n_nbrs,
                       CAST(SUM(v) AS BIGINT) AS nbr_sum
                FROM fan GROUP BY 1
            ),
            tot AS (
                SELECT COUNT(*) AS n_cells,
                       CAST(SUM(n_pages) AS BIGINT) AS tot_v,
                       SUM(CAST(n_pages AS HUGEINT) * n_pages) AS tot_sq
                FROM rollup
            ),
            gi AS (
                SELECT r.cell, a.n_nbrs, a.nbr_sum,
                       CAST(t.n_cells AS HUGEINT) * a.nbr_sum
                         - CAST(t.tot_v AS HUGEINT) * a.n_nbrs AS A,
                       CAST(t.n_cells AS HUGEINT) * t.tot_sq
                         - CAST(t.tot_v AS HUGEINT) * t.tot_v AS X,
                       CAST(t.n_cells AS HUGEINT) * a.n_nbrs
                         - CAST(a.n_nbrs AS HUGEINT) * a.n_nbrs AS Y,
                       t.n_cells
                FROM rollup r JOIN agg a ON a.cell = r.cell
                CROSS JOIN tot t
            )
            SELECT cell, n_nbrs, nbr_sum,
                   CAST(A AS BIGINT) AS gi_num,
                   (A > 0 AND A*A*(n_cells-1)*1 >= 4*X*Y) AS hot,
                   (A < 0 AND A*A*(n_cells-1)*1 >= 4*X*Y) AS cold
            FROM gi
        """),
        "tile_kde": _with_pages(f"""
            , rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            fan AS (
                SELECT r.n_pages * d.w AS vw,
                       d.w AS w,
                       (((r.cell // 1440) + d.dy) * 1440
                        + ((r.cell % 1440) + d.dx + 1440) % 1440) AS t_cell
                FROM rollup r CROSS JOIN (VALUES {kde_taps}) d(dy, dx, w)
                WHERE (r.cell // 1440) + d.dy >= 0
                  AND (r.cell // 1440) + d.dy < 720
            ),
            agg AS (
                SELECT t_cell AS cell,
                       CAST(SUM(vw) AS BIGINT) AS wsum,
                       CAST(SUM(w) AS BIGINT) AS wnorm
                FROM fan GROUP BY 1
            )
            SELECT r.cell, a.wsum, a.wnorm,
                   (a.wsum * 1000000) // a.wnorm AS kde_m
            FROM rollup r JOIN agg a ON a.cell = r.cell
        """),
        "idw_cells": _with_pages(f"""
            , latest AS (
                SELECT lon, lat, doc_id
                FROM (
                    SELECT p.lon, p.lat, p.doc_id,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            pts AS (
                SELECT CAST(round(lon * 10000) AS BIGINT) AS ulon,
                       CAST(round(lat * 10000) AS BIGINT) AS ulat,
                       CAST(round(CAST(doc_id % 997 AS DOUBLE) * 10000)
                            AS BIGINT) AS v,
                       {spatial.grid_cell_sql("lon", "lat", 2.0)} AS pcell
                FROM latest
            ),
            support AS (SELECT DISTINCT pcell AS cell FROM pts),
            targets AS (
                SELECT s.cell,
                       (s.cell % 180) * 20000 + 10000 - 1800000 AS c_ulon,
                       (s.cell // 180) * 20000 + 10000 - 900000 AS c_ulat,
                       (((s.cell // 180) + d.dy) * 180
                        + ((s.cell % 180) + d.dx + 180) % 180) AS probe
                FROM support s CROSS JOIN (VALUES
                     (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                     (1,-1),(1,0),(1,1)) d(dy, dx)
                WHERE (s.cell // 180) + d.dy >= 0
                  AND (s.cell // 180) + d.dy < 90
            ),
            joined AS (
                SELECT t.cell, p.v,
                       2000000000 // greatest(
                           least(abs(p.ulon - t.c_ulon),
                                 3600000 - abs(p.ulon - t.c_ulon))
                           * least(abs(p.ulon - t.c_ulon),
                                   3600000 - abs(p.ulon - t.c_ulon))
                           + abs(p.ulat - t.c_ulat)
                           * abs(p.ulat - t.c_ulat),
                           10000) AS w
                FROM targets t JOIN pts p ON p.pcell = t.probe
            )
            SELECT cell,
                   COUNT(*) AS n_samples,
                   CAST(SUM(v * w) AS BIGINT) AS vw_sum,
                   CAST(SUM(w) AS BIGINT) AS w_sum,
                   CAST(SUM(v * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
                       / 10000.0 AS idw
            FROM joined GROUP BY 1
        """),
        "convex_hull": _with_pages(f"""
            , latest AS (
                SELECT lon, lat
                FROM (
                    SELECT p.lon, p.lat,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            hpts AS (
                SELECT DISTINCT
                       {spatial.grid_cell_sql('lon', 'lat', 30.0)} AS gid,
                       CAST(round(lon * 10000) AS BIGINT) AS ulon,
                       CAST(round(lat * 10000) AS BIGINT) AS ulat
                FROM latest
            )
            {hull.convex_hull_sql('hpts')}
        """),
        "hull_diameter": _with_pages(f"""
            , latest AS (
                SELECT lon, lat
                FROM (
                    SELECT p.lon, p.lat,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            hpts AS (
                SELECT DISTINCT
                       {spatial.grid_cell_sql('lon', 'lat', 30.0)} AS gid,
                       CAST(round(lon * 10000) AS BIGINT) AS ulon,
                       CAST(round(lat * 10000) AS BIGINT) AS ulat
                FROM latest
            )
            {hull.hull_diameter_sql('hpts')}
        """),
        "directional_extremes": _with_pages(f"""
            , latest AS (
                SELECT lon, lat
                FROM (
                    SELECT p.lon, p.lat,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            hpts AS (
                SELECT {spatial.grid_cell_sql('lon', 'lat', 30.0)} AS gid,
                       CAST(round(lon * 10000) AS BIGINT) AS ulon,
                       CAST(round(lat * 10000) AS BIGINT) AS ulat
                FROM latest
            ),
            fan AS (
                SELECT h.gid, d.dir_idx,
                       d.a * h.ulon + d.b * h.ulat AS score,
                       h.ulon, h.ulat
                FROM hpts h CROSS JOIN (VALUES {", ".join(
                    f"({i},{a},{b})"
                    for i, (a, b) in enumerate(hull.DIRECTIONS_8)
                )}) d(dir_idx, a, b)
            )
            SELECT gid, dir_idx, score, ulon, ulat
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY gid, dir_idx
                    ORDER BY score DESC, ulon, ulat) AS rn
                FROM fan
            ) WHERE rn = 1
        """),
        "tile_rollup_multires": _with_pages(f"""
            , tainted_pts AS (
                SELECT p.lon, p.lat,
                       CASE WHEN s.accepted THEN 0 ELSE 1 END AS t
                FROM pages p JOIN cs_status s USING (changeset_id)
            )
            SELECT res, cell, n_pages, n_tainted,
                   ROUND(CAST(n_tainted AS DOUBLE) / n_pages, 6)
                       AS taint_density
            FROM (
                {" UNION ALL ".join(
                    f'''SELECT {r} AS res,
                           {spatial.hier_cell_sql("lon", "lat", r)} AS cell,
                           COUNT(*) AS n_pages,
                           CAST(SUM(t) AS BIGINT) AS n_tainted
                    FROM tainted_pts GROUP BY 2'''
                    for r in (5, 7, 9)
                )}
            ) lv
        """),
        "pip_polygons": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            edges(pid, xi, yi, xj, yj) AS (VALUES {pip_edges_sql}),
            -- even-odd ray cast: same crossing predicate as the Spark
            -- UDF, odd crossing count => inside
            hits AS (
                SELECT l.url, e.pid,
                       SUM(CASE WHEN (e.yi > l.lat) <> (e.yj > l.lat)
                                 AND l.lon < (e.xj - e.xi) * (l.lat - e.yi)
                                             / (e.yj - e.yi) + e.xi
                                THEN 1 ELSE 0 END) AS crossings
                FROM latest l CROSS JOIN edges e
                GROUP BY 1, 2
            ),
            inside AS (
                SELECT url, MIN(pid) AS polygon_id
                FROM hits WHERE crossings % 2 = 1 GROUP BY url
            )
            SELECT CAST(polygon_id AS BIGINT) AS polygon_id,
                   COUNT(*) AS n_pages, MIN(url) AS first_url
            FROM inside GROUP BY 1
        """),
        "zonal_stats": _with_pages(f"""
            , zs_raster AS (
                SELECT {cell} AS cell,
                       COUNT(*) AS n_pages,
                       CAST(SUM(CASE WHEN NOT accepted THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_tainted
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            zs_centered AS (
                SELECT cell, n_pages, n_tainted,
                       (CAST(cell % 1440 AS DOUBLE) + 0.5) * 0.25 - 180.0
                           AS clon,
                       (CAST(cell // 1440 AS DOUBLE) + 0.5) * 0.25 - 90.0
                           AS clat
                FROM zs_raster
            ),
            zs_edges(pid, xi, yi, xj, yj) AS (VALUES {pip_edges_sql}),
            zs_hits AS (
                SELECT c.cell, c.n_pages, c.n_tainted, e.pid,
                       SUM(CASE WHEN (e.yi > c.clat) <> (e.yj > c.clat)
                                 AND c.clon < (e.xj - e.xi)
                                              * (c.clat - e.yi)
                                              / (e.yj - e.yi) + e.xi
                                THEN 1 ELSE 0 END) AS crossings
                FROM zs_centered c CROSS JOIN zs_edges e
                GROUP BY 1, 2, 3, 4
            ),
            zs_in AS (
                SELECT cell, n_pages, n_tainted, MIN(pid) AS polygon_id
                FROM zs_hits WHERE crossings % 2 = 1
                GROUP BY 1, 2, 3
            )
            SELECT CAST(polygon_id AS BIGINT) AS polygon_id,
                   COUNT(*) AS n_cells,
                   CAST(SUM(n_pages) AS BIGINT) AS sum_n_pages,
                   CAST(SUM(n_tainted) AS BIGINT) AS sum_n_tainted
            FROM zs_in GROUP BY 1
        """),
        "pip_multipolygons": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            medges(pid, xi, yi, xj, yj) AS (VALUES {pip_multi_edges_sql}),
            -- even-odd parity over ALL rings of a polygon: a hole's
            -- crossings cancel the outer's, an island's restore them
            mhits AS (
                SELECT l.url, e.pid,
                       SUM(CASE WHEN (e.yi > l.lat) <> (e.yj > l.lat)
                                 AND l.lon < (e.xj - e.xi) * (l.lat - e.yi)
                                             / (e.yj - e.yi) + e.xi
                                THEN 1 ELSE 0 END) AS crossings
                FROM latest l CROSS JOIN medges e
                GROUP BY 1, 2
            ),
            minside AS (
                SELECT url, MIN(pid) AS polygon_id
                FROM mhits WHERE crossings % 2 = 1 GROUP BY url
            )
            SELECT CAST(polygon_id AS BIGINT) AS polygon_id,
                   COUNT(*) AS n_pages, MIN(url) AS first_url
            FROM minside GROUP BY 1
        """),
        "pip_outside": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            edges(pid, xi, yi, xj, yj) AS (VALUES {pip_edges_sql}),
            hits AS (
                SELECT l.url, e.pid,
                       SUM(CASE WHEN (e.yi > l.lat) <> (e.yj > l.lat)
                                 AND l.lon < (e.xj - e.xi) * (l.lat - e.yi)
                                             / (e.yj - e.yi) + e.xi
                                THEN 1 ELSE 0 END) AS crossings
                FROM latest l CROSS JOIN edges e
                GROUP BY 1, 2
            ),
            inside AS (
                SELECT DISTINCT url FROM hits WHERE crossings % 2 = 1
            )
            SELECT l.lang, COUNT(*) AS n_outside, MIN(l.url) AS first_url
            FROM latest l
            WHERE NOT EXISTS (SELECT 1 FROM inside i WHERE i.url = l.url)
            GROUP BY 1
        """),
        "tile_vectorize": _with_pages("""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            agg AS (
                SELECT CAST(FLOOR((lat + 90.0) / 15.0) * 24
                            + FLOOR((lon + 180.0) / 15.0) AS BIGINT) AS cell,
                       COUNT(*) AS n_points,
                       MIN(FLOOR((lon + 180.0) / 15.0) * 15.0 - 180.0)
                           AS cell_min_lon,
                       MIN(FLOOR((lat + 90.0) / 15.0) * 15.0 - 90.0)
                           AS cell_min_lat,
                       CAST(SUM(CAST(ROUND(lon * 1000000) AS BIGINT))
                            AS BIGINT) AS _slon,
                       CAST(SUM(CAST(ROUND(lat * 1000000) AS BIGINT))
                            AS BIGINT) AS _slat
                FROM latest GROUP BY 1
            )
            SELECT cell, n_points, cell_min_lon, cell_min_lat,
                   cell_min_lon + 15.0 AS cell_max_lon,
                   cell_min_lat + 15.0 AS cell_max_lat,
                   ROUND(CAST(_slon AS DOUBLE) / n_points / 1000000, 6)
                       AS centroid_lon,
                   ROUND(CAST(_slat AS DOUBLE) / n_points / 1000000, 6)
                       AS centroid_lat
            FROM agg
        """),
        "pip_rect": _with_pages("""
            , rects AS (
                SELECT * FROM (VALUES
                    (1, -180.0, -90.0, -60.0, 0.0),
                    (2,  -60.0, -90.0,  60.0, 0.0),
                    (3, -180.0,   0.0,   0.0, 90.0),
                    (4,    0.0,   0.0, 180.0, 90.0)
                ) AS v(polygon_id, min_lon, min_lat, max_lon, max_lat)
            ),
            latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            SELECT r.polygon_id, COUNT(*) AS n_pages, MIN(l.url) AS first_url
            FROM latest l JOIN rects r
              ON l.lon >= r.min_lon AND l.lon < r.max_lon
             AND l.lat >= r.min_lat AND l.lat < r.max_lat
            GROUP BY r.polygon_id
        """),
        "knn_in_cell": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            ),
            cells AS (
                SELECT url, lon, lat, accepted, {cell30} AS cell FROM latest
            ),
            pairs AS (
                SELECT d.url, c.url AS cand_url,
                       (d.lon - c.lon) * (d.lon - c.lon)
                     + (d.lat - c.lat) * (d.lat - c.lat) AS dist2
                FROM cells d JOIN cells c ON d.cell = c.cell
                WHERE NOT d.accepted AND c.accepted
            )
            SELECT url, cand_url, knn_rank, ROUND(dist2, 6) AS dist2_r
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY url
                                             ORDER BY dist2, cand_url)
                           AS knn_rank
                FROM pairs
            ) t WHERE knn_rank <= 3
        """),
        "knn_neighborhood": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            ),
            dirty AS (SELECT url, lon, lat FROM latest WHERE NOT accepted),
            clean AS (
                SELECT url AS cand_url, lon, lat, {cell30} AS c_cell
                FROM latest WHERE accepted
            ),
            probes AS (
                SELECT d.url, d.lon, d.lat,
                       CAST(FLOOR((d.lat + 90.0) / 30.0) AS BIGINT)
                           + dy.v AS nb_lat,
                       (CAST(FLOOR((d.lon + 180.0) / 30.0) AS BIGINT)
                           + dx.v + 12) % 12 AS nb_lon
                FROM dirty d,
                     (VALUES (-1), (0), (1)) dy(v),
                     (VALUES (-1), (0), (1)) dx(v)
            ),
            probe_cells AS (
                SELECT DISTINCT url, lon, lat,
                       nb_lat * 12 + nb_lon AS probe_cell
                FROM probes WHERE nb_lat >= 0 AND nb_lat < 6
            ),
            pairs AS (
                -- antimeridian-wrapped lon delta, mirroring the
                -- operator: least(|dlon|, 360-|dlon|)
                SELECT url, cand_url, dlon * dlon + dlat * dlat AS dist2
                FROM (
                    SELECT p.url, c.cand_url,
                           LEAST(ABS(p.lon - c.lon),
                                 360.0 - ABS(p.lon - c.lon)) AS dlon,
                           p.lat - c.lat AS dlat
                    FROM probe_cells p
                    JOIN clean c ON p.probe_cell = c.c_cell
                )
            )
            SELECT url, cand_url, knn_rank, ROUND(dist2, 6) AS dist2_r
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY url
                                             ORDER BY dist2, cand_url)
                           AS knn_rank
                FROM pairs
            ) t WHERE knn_rank <= 3
        """),
        "nearest_clean_attribution": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            ),
            dirty AS (SELECT url, lon, lat FROM latest WHERE NOT accepted),
            clean AS (
                SELECT url AS cand_url, lon, lat, lang AS near_lang,
                       {cell30} AS c_cell
                FROM latest WHERE accepted
            ),
            probes AS (
                SELECT d.url, d.lon, d.lat,
                       CAST(FLOOR((d.lat + 90.0) / 30.0) AS BIGINT)
                           + dy.v AS nb_lat,
                       (CAST(FLOOR((d.lon + 180.0) / 30.0) AS BIGINT)
                           + dx.v + 12) % 12 AS nb_lon
                FROM dirty d,
                     (VALUES (-1), (0), (1)) dy(v),
                     (VALUES (-1), (0), (1)) dx(v)
            ),
            probe_cells AS (
                SELECT DISTINCT url, lon, lat,
                       nb_lat * 12 + nb_lon AS probe_cell
                FROM probes WHERE nb_lat >= 0 AND nb_lat < 6
            ),
            pairs AS (
                SELECT url, cand_url, near_lang,
                       dlon * dlon + dlat * dlat AS dist2
                FROM (
                    SELECT p.url, c.cand_url, c.near_lang,
                           LEAST(ABS(p.lon - c.lon),
                                 360.0 - ABS(p.lon - c.lon)) AS dlon,
                           p.lat - c.lat AS dlat
                    FROM probe_cells p
                    JOIN clean c ON p.probe_cell = c.c_cell
                )
            )
            SELECT url, cand_url, ROUND(dist2, 6) AS dist2_r, near_lang
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY url
                                             ORDER BY dist2, cand_url)
                           AS nn_rank
                FROM pairs
            ) t WHERE nn_rank = 1
        """),
        "knn_lang_vote": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*, s.accepted,
                           ROW_NUMBER() OVER (PARTITION BY p.url
                                              ORDER BY p.version DESC) AS rn
                    FROM pages p JOIN cs_status s USING (changeset_id)
                ) t WHERE rn = 1
            ),
            dirty AS (SELECT url, lon, lat FROM latest WHERE NOT accepted),
            clean AS (
                SELECT url AS cand_url, lon, lat, lang,
                       {cell30} AS c_cell
                FROM latest WHERE accepted
            ),
            probes AS (
                SELECT d.url, d.lon, d.lat,
                       CAST(FLOOR((d.lat + 90.0) / 30.0) AS BIGINT)
                           + dy.v AS nb_lat,
                       (CAST(FLOOR((d.lon + 180.0) / 30.0) AS BIGINT)
                           + dx.v + 12) % 12 AS nb_lon
                FROM dirty d,
                     (VALUES (-1), (0), (1)) dy(v),
                     (VALUES (-1), (0), (1)) dx(v)
            ),
            probe_cells AS (
                SELECT DISTINCT url, lon, lat,
                       nb_lat * 12 + nb_lon AS probe_cell
                FROM probes WHERE nb_lat >= 0 AND nb_lat < 6
            ),
            pairs AS (
                SELECT url, cand_url, lang,
                       dlon * dlon + dlat * dlat AS dist2
                FROM (
                    SELECT p.url, c.cand_url, c.lang,
                           LEAST(ABS(p.lon - c.lon),
                                 360.0 - ABS(p.lon - c.lon)) AS dlon,
                           p.lat - c.lat AS dlat
                    FROM probe_cells p
                    JOIN clean c ON p.probe_cell = c.c_cell
                )
            ),
            ranked AS (
                SELECT url, lang,
                       ROW_NUMBER() OVER (PARTITION BY url
                                          ORDER BY dist2, cand_url)
                           AS knn_rank
                FROM pairs
            ),
            votes AS (
                SELECT url, lang, COUNT(*) AS votes
                FROM ranked WHERE knn_rank <= 3 GROUP BY 1, 2
            )
            SELECT url, lang, votes FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY url
                                             ORDER BY votes DESC, lang)
                           AS vr
                FROM votes
            ) t WHERE vr = 1
        """),
        "dedup_exact": """
            SELECT md5(text) AS text_md5,
                   MIN(doc_id) AS canonical_id,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "ngram_jaccard": """
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(lower(text), '\\s+') AS ts
                FROM documents
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
                FROM toks,
                     LATERAL (SELECT UNNEST(range(1, GREATEST(len(ts) - 2, 1) + 1))
                              AS i) g
                WHERE len(ts) >= 1 AND ts[i] IS NOT NULL
                  AND length(COALESCE(ts[i], '') ||
                             COALESCE(ts[i+1], '') ||
                             COALESCE(ts[i+2], '')) > 0
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
                FROM grams a JOIN grams b ON a.shingle = b.shingle
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6)
                       AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.2
        """,
        "containment_pairs": dedup.containment_pairs_sql(
            "documents", n=3, threshold_ppm=400_000
        ),
        "jaccard_prefix": dedup.jaccard_prefix_join_sql(
            """(
                SELECT DISTINCT doc_id,
                       concat_ws(' ', ts[i], ts[i+1], ts[i+2]) AS shingle
                FROM (SELECT doc_id,
                             string_split_regex(lower(text), '\\s+') AS ts
                      FROM documents) jp_toks,
                     LATERAL (SELECT UNNEST(range(1,
                         GREATEST(len(ts) - 2, 1) + 1)) AS i) g
                WHERE length(concat_ws(' ', ts[i], ts[i+1], ts[i+2])) > 0
            ) jp_src""",
            threshold_ppm=200_000,
        ),
        "ngram_jaccard_capped": """
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(lower(text), '\\s+') AS ts
                FROM documents
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
                FROM toks,
                     LATERAL (SELECT UNNEST(range(1, GREATEST(len(ts) - 2, 1) + 1))
                              AS i) g
                WHERE len(ts) >= 1 AND ts[i] IS NOT NULL
                  AND length(COALESCE(ts[i], '') ||
                             COALESCE(ts[i+1], '') ||
                             COALESCE(ts[i+2], '')) > 0
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
            ndocs AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
            -- stop-shingle cap: df > floor(0.05 * n_docs) excluded
            -- from the CANDIDATE join (matches Python int() truncation)
            rare AS (
                SELECT shingle FROM (
                    SELECT shingle, COUNT(*) AS df FROM grams GROUP BY 1
                ) d, ndocs
                WHERE df <= CAST(FLOOR(0.05 * nd) AS BIGINT)
            ),
            cands AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM grams a
                JOIN rare r ON a.shingle = r.shingle
                JOIN grams b ON a.shingle = b.shingle
                WHERE a.doc_id < b.doc_id
            ),
            inter AS (
                SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
                FROM cands c
                JOIN grams a ON a.doc_id = c.doc_a
                JOIN grams b ON b.doc_id = c.doc_b
                            AND b.shingle = a.shingle
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6)
                       AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.2
        """,
        "minhash_signatures": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            joined AS (
                SELECT doc_id, {dedup.token_hash_sql('token')} AS token_id
                FROM toks
            )
            SELECT doc_id, {mh_aggs} FROM joined GROUP BY doc_id
        """,
        "readability": textops.readability_sql("documents"),
        "text_quality": f"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS n_tokens,
                   length(text) AS n_chars_m,
                   ROUND(CAST(length(text)
                         - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                         AS DOUBLE)
                         / GREATEST(length(text), 1), 6) AS punct_ratio,
                   len(list_intersect(
                       list_distinct(string_split_regex(lower(text), '\\s+')),
                       [{sw['en']}])) AS stop_hits_en,
                   (CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+')) END >= 5
                    AND CAST(length(text)
                        - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                        AS DOUBLE) / GREATEST(length(text), 1) < 0.3
                    AND length(text) >= 20) AS quality_keep
            FROM documents
        """,
        "events_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS bucket_hour,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users,
                   CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
                       / 10000 AS sum_value
            FROM events
            GROUP BY 1
        """,
        "event_funnel": temporal.event_funnel_sql(
            "events", FUNNEL_STEPS, FUNNEL_GAP_SEC
        ),
        "funnel_latency": temporal.funnel_latency_sql(
            "events", FUNNEL_STEPS, FUNNEL_GAP_SEC
        ),
        "holt_hourly": temporal.holt_smoothing_sql(
            """(SELECT event_type,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY hour) - 1 AS t,
                       n
                FROM (SELECT event_type,
                             epoch_us(ts) // 3600000000 AS hour,
                             COUNT(*) AS n
                      FROM events GROUP BY 1, 2))""",
            "event_type", "t", "n",
        ),
        "event_retention": temporal.event_retention_sql(
            "events", max_offset=7
        ),
        "event_transitions": temporal.event_transitions_sql("events"),
        "events_asof_join": """
            WITH updates AS (
                SELECT user_id, ts, MAX(value) AS update_value
                FROM events WHERE event_id % 10 = 0
                GROUP BY user_id, ts
            ),
            lhs AS (
                SELECT user_id, event_id, ts
                FROM events WHERE event_id % 10 <> 0
            )
            SELECT l.user_id, l.event_id,
                   ROUND(COALESCE(u.update_value, -1.0), 4)
                       AS last_update_value
            FROM lhs l
            ASOF LEFT JOIN updates u
              ON l.user_id = u.user_id AND l.ts >= u.ts
        """,
        "trip_segments": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id,
                       -45.0 + (user_id % 120) * 0.5
                           + 0.001 * rn + 1.0 * floor(rn / 25) AS lat,
                       -100.0 + (user_id % 140) * 1.0 + 0.002 * rn AS lon
                FROM (SELECT user_id, ts, event_id,
                             ROW_NUMBER() OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS rn
                      FROM events) t
            ),
            seg AS (
                SELECT user_id, epoch_us(ts) AS us, event_id, lon, lat,
                       LAG(epoch_us(ts)) OVER w AS pus,
                       LAG(lon) OVER w AS plon,
                       LAG(lat) OVER w AS plat
                FROM pts
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            flags AS (
                SELECT user_id, us, event_id, lon, lat, plon, plat,
                       CASE WHEN pus IS NULL
                              OR us - pus > 86400000000
                              OR {spatial.haversine_sql('plon', 'plat',
                                                        'lon', 'lat')} > 50.0
                            THEN 1 ELSE 0 END AS newt
                FROM seg
            ),
            trips AS (
                SELECT user_id, us,
                       SUM(newt) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS trip_no,
                       CASE WHEN newt = 0 THEN
                           CAST(round({spatial.haversine_sql('plon', 'plat',
                                                             'lon', 'lat')}
                                      * 1000000.0) AS BIGINT)
                       END AS ukm
                FROM flags
            )
            SELECT user_id,
                   CAST(trip_no AS BIGINT) AS trip_no,
                   COUNT(*) AS n_points,
                   MIN(us) AS start_us,
                   MAX(us) AS end_us,
                   CAST(COALESCE(SUM(ukm), 0) AS DOUBLE) / 1000000.0
                       AS length_km
            FROM trips GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH gaps AS (
                SELECT user_id, event_id, value, ts,
                       CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                              OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
                SELECT user_id, value,
                       -- CAST: windowed SUM promotes to HUGEINT in DuckDB
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)
                           AS session_id
                FROM gaps
            )
            SELECT user_id, session_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
                       / 10000 AS sum_value
            FROM sess GROUP BY 1, 2
        """,
        "active_users": temporal.rolling_active_users_sql(
            "events", short_days=7, long_days=28
        ),
        "attribution_decay": temporal_mod.attribution_decay_sql(
            "events", "purchase", 3600, 900
        ),
        "attribution": temporal_mod.attribution_credits_sql(
            "events", "purchase", 3600
        ),
        "markov_attribution": temporal_mod.markov_attribution_sql(
            "events", MARKOV_CHANNELS, "purchase", rounds=12
        ),
        "session_rules": temporal.session_rules_sql(
            "events", gap_s=1800, min_support=2
        ),
        "peak_concurrency": temporal.peak_overlap_sql(
            "(SELECT event_type, epoch_us(ts) AS start_us, "
            "epoch_us(ts) + 1800000000 AS end_us FROM events)",
            key_col="event_type",
        ),
        "events_interval_join": """
            SELECT p.user_id, p.event_id, e.event_id AS window_id
            FROM events p JOIN events e ON p.user_id = e.user_id
            WHERE e.event_type = 'error' AND p.event_type <> 'error'
              AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 30 MINUTE
        """,
        "events_overlap_join": """
            WITH gaps AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                              OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
                SELECT user_id, ts,
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)
                           AS session_id
                FROM gaps
            ),
            spans AS (
                SELECT user_id, session_id,
                       MIN(ts) AS s_start,
                       MAX(ts) + INTERVAL 1 SECOND AS s_end
                FROM sess GROUP BY 1, 2
            ),
            wins AS (
                SELECT user_id, event_id AS window_id, ts AS w_start,
                       ts + INTERVAL 30 MINUTE AS w_end
                FROM events WHERE event_type = 'error'
            )
            SELECT s.user_id, s.session_id, w.window_id
            FROM spans s JOIN wins w ON s.user_id = w.user_id
            WHERE s.s_start < w.w_end AND w.w_start < s.s_end
        """,
        "link_assortativity": graph.degree_assortativity_sql(
            _PR_EDGES_SQL
        ),
        "documents_profile": profile_mod.column_profile_sql(
            "documents", ["doc_id", "lang", "source", "n_chars"]
        ),
        "winsorize_lengths": textops.winsorize_sql(
            "(SELECT lang, CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END "
            "AS n_tok FROM documents)",
            "n_tok", ["lang"], lo_m=10_000, hi_m=990_000,
        ),
        "str_leaves": _with_pages(
            """
            , str_rects AS (
                SELECT rect_id,
                       _x - rect_id % 997 AS minx,
                       _y - (rect_id * 3) % 997 AS miny,
                       _x + (rect_id * 7) % 997 + 1 AS maxx,
                       _y + (rect_id * 11) % 997 + 1 AS maxy
                FROM (
                    SELECT doc_id * 16 + version AS rect_id,
                           CAST(FLOOR(lon * 1000000.0) AS BIGINT) AS _x,
                           CAST(FLOOR(lat * 1000000.0) AS BIGINT) AS _y
                    FROM pages
                )
            )
            SELECT * FROM (
            """
            + rtree_mod.str_pack_sql("SELECT * FROM str_rects",
                                     leaf_size=64)
            + ")"
        ),
        "event_rate_autocorr": temporal_mod.series_autocorr_sql(
            "(SELECT user_id % 8 AS cohort, "
            "epoch_us(ts) // 3600000000 AS hour, "
            "CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1, 2)",
            "cohort", "hour", "n_events", lags=(1, 2, 3),
        ),
        "allen_relations": f"""
            WITH al_gaps AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                              OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            al_sess AS (
                SELECT user_id, ts,
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)
                           AS session_id
                FROM al_gaps
            ),
            al_spans AS (
                SELECT user_id, session_id,
                       MIN(ts) AS s_start,
                       MAX(ts) + INTERVAL 1 SECOND AS s_end
                FROM al_sess GROUP BY 1, 2
            ),
            al_wins AS (
                SELECT user_id, event_id AS window_id, ts AS w_start,
                       ts + INTERVAL 30 MINUTE AS w_end
                FROM events WHERE event_type = 'error'
            ),
            al_pairs AS ({temporal_mod.allen_classify_sql(
                "SELECT * FROM al_spans", "SELECT * FROM al_wins",
                "user_id", "s_start", "s_end", "w_start", "w_end")})
            SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM al_pairs GROUP BY relation
        """,
        "embedding_dim_stats": similarity.embedding_dim_stats_sql(
            "embeddings"
        ),
        "kcenter_seeds": similarity.kcenter_seeds_sql(
            "embeddings", k=5
        ),
        "mmr_rerank": similarity.mmr_rerank_sql(
            """(
            WITH mmq_v AS MATERIALIZED (
                SELECT vec_id AS _id, u.i AS dim,
                       CAST(ROUND(CAST(embedding[u.i] AS DOUBLE)
                                  * 1000000) AS BIGINT) AS _q
                FROM embeddings,
                     LATERAL (SELECT UNNEST(range(1,
                              len(embedding) + 1)) AS i) u
            ),
            mmq_p AS (SELECT MIN(vec_id) AS pid FROM embeddings),
            mmq_d AS MATERIALIZED (
                SELECT v._id, SUM((v._q - s._q) * (v._q - s._q)) AS d
                FROM mmq_v v
                JOIN mmq_v s ON s._id = (SELECT pid FROM mmq_p)
                            AND s.dim = v.dim
                WHERE v._id <> (SELECT pid FROM mmq_p)
                GROUP BY v._id
            ),
            mmq_c AS (
                SELECT _id, CAST(-d AS BIGINT) AS rel_q
                FROM mmq_d ORDER BY d, _id LIMIT 64
            )
            SELECT e.vec_id AS vec_id, e.embedding AS embedding,
                   c.rel_q AS rel_q
            FROM embeddings e JOIN mmq_c c ON c._id = e.vec_id
            )""",
            k=10, w_rel=2, w_div=1,
        ),
        "embedding_centroids": similarity.embedding_centroids_sql(
            "embeddings"
        ),
        "kmeans_assign": similarity.nearest_centroid_assign_sql(
            "embeddings"
        ),
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       CAST((SELECT qv FROM q) AS DOUBLE[])), 6) AS cos_sim
            FROM embeddings
            WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id
            LIMIT 10
        """,
        "lsh_bucket_topk": lsh_prelude + """
            SELECT vec_id, cos_sim FROM probe
            ORDER BY cos_sim DESC, vec_id LIMIT 10
        """,
        "ann_recall": lsh_prelude + """
            , lsh AS (
                SELECT vec_id FROM probe
                ORDER BY cos_sim DESC, vec_id LIMIT 10
            ),
            brute AS (
                SELECT vec_id FROM (
                    SELECT vec_id,
                           ROUND(list_cosine_similarity(
                               CAST(embedding AS DOUBLE[]),
                               CAST((SELECT qv FROM qb) AS DOUBLE[])), 6)
                               AS cos_sim
                    FROM embeddings WHERE vec_id <> 0
                ) t ORDER BY cos_sim DESC, vec_id LIMIT 10
            )
            SELECT CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_10
            FROM brute JOIN lsh USING (vec_id)
        """,
        "ivf_topk": """
            WITH cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
                FROM embeddings WHERE vec_id BETWEEN 1 AND 16
            ),
            qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id = 0),
            assign AS (
                SELECT e.vec_id, e.embedding, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                               CAST(e.embedding AS DOUBLE[]), c.cvec), 6)
                               DESC, c.cid
                       ) AS rk
                FROM embeddings e, cents c
                WHERE e.vec_id <> 0
            ),
            clustered AS (
                SELECT vec_id, embedding, cid FROM assign WHERE rk = 1
            ),
            qprobe AS (
                SELECT cid FROM cents, qv
                ORDER BY ROUND(list_cosine_similarity(cvec, v), 6) DESC, cid
                LIMIT 2
            )
            SELECT vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT v FROM qv)), 6) AS cos_sim
            FROM clustered
            WHERE cid IN (SELECT cid FROM qprobe)
            ORDER BY cos_sim DESC, vec_id
            LIMIT 10
        """,
        "mutual_knn": similarity.mutual_knn_sql("embeddings", k=4),
        "embedding_near_dup": f"""
            WITH bucketed AS (
                SELECT vec_id, embedding, {bucket_sql} AS bucket
                FROM embeddings
            ),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       ROUND(list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
                FROM bucketed a JOIN bucketed b
                  ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
            )
            SELECT id_a, id_b, cos_sim, rk FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a
                                             ORDER BY cos_sim DESC, id_b)
                           AS rk
                FROM pairs
            ) t WHERE rk <= 3
        """,
        "pip_rect_prefiltered": _with_pages("""
            , rects AS (
                SELECT * FROM (VALUES
                    (1, -180.0, -90.0, -60.0, 0.0),
                    (2,  -60.0, -90.0,  60.0, 0.0),
                    (3, -180.0,   0.0,   0.0, 90.0),
                    (4,    0.0,   0.0, 180.0, 90.0)
                ) AS v(polygon_id, min_lon, min_lat, max_lon, max_lat)
            ),
            latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            SELECT r.polygon_id, COUNT(*) AS n_pages, MIN(l.url) AS first_url
            FROM latest l JOIN rects r
              ON l.lon >= r.min_lon AND l.lon < r.max_lon
             AND l.lat >= r.min_lat AND l.lat < r.max_lat
            GROUP BY r.polygon_id
        """),
        "regions_available": _with_pages("""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            SELECT l.url, l.lon, l.lat
            FROM latest l
            WHERE NOT EXISTS (
                SELECT 1 FROM (VALUES
                    (-120.0, 40.0), (10.0, 50.0), (140.0, -30.0)
                ) pr(plon, plat)
                WHERE abs(l.lon - pr.plon) < 25.0
                  AND abs(l.lat - pr.plat) < 25.0
            )
        """),
        "token_stats": f"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '{textops.BPE_TOKEN_PATTERN}')) AS n_bpe_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "doc_fingerprint": f"""
            SELECT doc_id,
                   {textops.rolling_fingerprint_sql('text')} AS fingerprint
            FROM documents
        """,
        "token_quantiles": """
            WITH vals AS (
                SELECT lang,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+'))
                            END AS n_tokens
                FROM documents
            ),
            ranked AS (
                SELECT lang, n_tokens,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY n_tokens) AS rn,
                       COUNT(*) OVER (PARTITION BY lang) AS n
                FROM vals
            )
            SELECT lang, CAST(q_m AS BIGINT) AS q_m,
                   n_tokens AS quantile_value
            FROM ranked,
                 (VALUES (500000), (900000), (990000)) q(q_m)
            WHERE rn = (q_m * n + 999999) // 1000000
        """,
        "osmchange_render": _with_pages(f"""
            , latest AS (
                SELECT * FROM (
                    SELECT p.*,
                           ROW_NUMBER() OVER (PARTITION BY url
                                              ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            act AS (
                SELECT {dedup.token_hash_sql('url')} AS element_id,
                       visible, version,
                       CAST(changeset_id % 1441 AS DOUBLE) / 4.0 - 180.0 AS lon,
                       CAST(uid % 721 AS DOUBLE) / 4.0 - 90.0 AS lat
                FROM latest
            )
            SELECT CASE WHEN visible THEN 0 ELSE 1 END AS action_rank,
                   2 AS type_rank,
                   element_id,
                   CASE WHEN visible THEN
                       '  <modify>' || chr(10)
                       || '    <node id="' || CAST(element_id AS VARCHAR)
                       || '" changeset="-1" user="Redaction bot" uid="0"'
                       || ' visible="true"'
                       || ' timestamp="2012-04-01T00:00:00Z" version="'
                       || CAST(version AS VARCHAR)
                       || '" lat="' || CAST(lat AS VARCHAR)
                       || '" lon="' || CAST(lon AS VARCHAR) || '">' || chr(10)
                       || '      <tag k="source" v="bot"/>' || chr(10)
                       || '    </node>' || chr(10)
                       || '  </modify>' || chr(10)
                   ELSE
                       '  <delete>' || chr(10)
                       || '    <node id="' || CAST(element_id AS VARCHAR)
                       || '" changeset="-1" user="Redaction bot" uid="0"'
                       || ' visible="false"'
                       || ' timestamp="2012-04-01T00:00:00Z" version="'
                       || CAST(version AS VARCHAR)
                       || '" lat="0" lon="0"/>' || chr(10)
                       || '  </delete>' || chr(10)
                   END AS fragment
            FROM act
        """),
        "media_decode_stats": """
            WITH imgs AS (SELECT UNNEST(range(0, 16)) AS media_id),
            pix AS (
                SELECT i.media_id, c.c AS chan,
                       (x.x * 3 + y.y * 7 + c.c * 11 + i.media_id * 13) % 256
                           AS v
                FROM imgs i,
                     range(0, 48) x(x),
                     range(0, 32) y(y),
                     range(0, 3) c(c)
            )
            SELECT media_id,
                   48 AS width, 32 AS height,
                   CAST(CAST(SUM(CASE WHEN chan = 0 THEN v END) AS DOUBLE)
                        / 1536.0 AS REAL) AS mean_r,
                   CAST(CAST(SUM(CASE WHEN chan = 1 THEN v END) AS DOUBLE)
                        / 1536.0 AS REAL) AS mean_g,
                   CAST(CAST(SUM(CASE WHEN chan = 2 THEN v END) AS DOUBLE)
                        / 1536.0 AS REAL) AS mean_b
            FROM pix GROUP BY media_id
        """,
        "media_dhash": f"""
            WITH dh_imgs AS (SELECT UNNEST(range(0, 16)) AS media_id),
            dh_pix AS (
                SELECT i.media_id,
                       (y.y * 7) // 32 AS yb, (x.x * 9) // 48 AS xb,
                       (x.x * 3 + y.y * 7 + 0 + i.media_id * 13) % 256
                       + (x.x * 3 + y.y * 7 + 11 + i.media_id * 13) % 256
                       + (x.x * 3 + y.y * 7 + 22 + i.media_id * 13) % 256
                           AS gray
                FROM dh_imgs i, range(0, 48) x(x), range(0, 32) y(y)
            ),
            dh_blocks AS (
                SELECT media_id, yb, xb,
                       CAST(SUM(gray) AS BIGINT) AS s,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM dh_pix GROUP BY 1, 2, 3
            )
            SELECT a.media_id,
                   CAST(SUM(CASE WHEN a.s * b.n > b.s * a.n
                        THEN CAST(1 AS BIGINT) << (a.yb * 8 + a.xb)
                        ELSE 0 END) AS BIGINT) AS dhash
            FROM dh_blocks a
            JOIN dh_blocks b ON b.media_id = a.media_id
                            AND b.yb = a.yb AND b.xb = a.xb + 1
            GROUP BY a.media_id
        """,
        "dhash_pairs": f"""
            WITH dh_imgs AS (SELECT UNNEST(range(0, 16)) AS media_id),
            dh_pix AS (
                SELECT i.media_id,
                       (y.y * 7) // 32 AS yb, (x.x * 9) // 48 AS xb,
                       (x.x * 3 + y.y * 7 + 0 + i.media_id * 13) % 256
                       + (x.x * 3 + y.y * 7 + 11 + i.media_id * 13) % 256
                       + (x.x * 3 + y.y * 7 + 22 + i.media_id * 13) % 256
                           AS gray
                FROM dh_imgs i, range(0, 48) x(x), range(0, 32) y(y)
            ),
            dh_blocks AS (
                SELECT media_id, yb, xb,
                       CAST(SUM(gray) AS BIGINT) AS s,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM dh_pix GROUP BY 1, 2, 3
            ),
            dh_hash AS (
                SELECT a.media_id,
                       CAST(SUM(CASE WHEN a.s * b.n > b.s * a.n
                            THEN CAST(1 AS BIGINT) << (a.yb * 8 + a.xb)
                            ELSE 0 END) AS BIGINT) AS dhash
                FROM dh_blocks a
                JOIN dh_blocks b ON b.media_id = a.media_id
                                AND b.yb = a.yb AND b.xb = a.xb + 1
                GROUP BY a.media_id
            )
            SELECT a.media_id AS id_a, b.media_id AS id_b,
                   CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER)
                       AS hamming
            FROM dh_hash a JOIN dh_hash b ON a.media_id < b.media_id
            WHERE bit_count(xor(a.dhash, b.dhash)) <= {DHASH_HAMMING}
        """,
        "audio_decode_stats": """
            WITH clips AS (SELECT UNNEST(range(0, 16)) AS media_id),
            samp AS (
                SELECT c.media_id,
                       ((i.i * 7 + c.media_id * 13) % 2001) - 1000 AS s,
                       CASE WHEN i.i > 0 THEN
                           (((i.i - 1) * 7 + c.media_id * 13) % 2001) - 1000
                       END AS prev_s
                FROM clips c, range(0, 2000) i(i)
            )
            SELECT media_id,
                   COUNT(*) AS n_samples,
                   CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
                   CAST(SUM(s * s) AS BIGINT) AS sum_sq,
                   CAST(SUM(CASE WHEN prev_s IS NOT NULL AND s * prev_s < 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
            FROM samp GROUP BY media_id
        """,
        "image_patches": """
            WITH ip_imgs AS (SELECT UNNEST(range(0, 16)) AS media_id),
            ip_pix AS (
                SELECT i.media_id,
                       CAST(y.y // 16 AS INTEGER) AS patch_row,
                       CAST(x.x // 16 AS INTEGER) AS patch_col,
                       c.c AS chan,
                       (x.x * 3 + y.y * 7 + c.c * 11 + i.media_id * 13)
                           % 256 AS v
                FROM ip_imgs i, range(0, 48) x(x), range(0, 32) y(y),
                     range(0, 3) c(c)
            )
            SELECT media_id, patch_row, patch_col,
                   CAST(COUNT(*) FILTER (chan = 0) AS BIGINT) AS n_px,
                   CAST(SUM(CASE WHEN chan = 0 THEN v END) AS BIGINT)
                       AS sum_r,
                   CAST(SUM(CASE WHEN chan = 1 THEN v END) AS BIGINT)
                       AS sum_g,
                   CAST(SUM(CASE WHEN chan = 2 THEN v END) AS BIGINT)
                       AS sum_b
            FROM ip_pix GROUP BY 1, 2, 3
        """,
        "audio_silence": """
            WITH as_clips AS (SELECT UNNEST(range(0, 8)) AS media_id),
            as_samp AS (
                SELECT c.media_id, i.i,
                       CASE WHEN ((i.i // 256) + c.media_id) % 3 = 1
                            THEN (i.i * 3) % 21 - 10
                            ELSE (i.i * 7 + c.media_id * 13) % 2001 - 1000
                       END AS s
                FROM as_clips c, range(0, 2048) i(i)
            ),
            as_frames AS (
                SELECT media_id, CAST(i // 256 AS INTEGER) AS frame_idx,
                       CAST(COUNT(*) AS BIGINT) AS n_samples,
                       CAST(SUM(s * s) AS BIGINT) AS sum_sq
                FROM as_samp GROUP BY 1, 2
            ),
            as_flag AS (
                SELECT *, (sum_sq < n_samples * 10000) AS is_silent
                FROM as_frames
            ),
            as_flip AS (
                SELECT *, CASE WHEN LAG(is_silent) OVER (
                            PARTITION BY media_id ORDER BY frame_idx)
                            IS DISTINCT FROM is_silent
                          THEN 1 ELSE 0 END AS flip
                FROM as_flag
            ),
            as_seg AS (
                SELECT *, CAST(SUM(flip) OVER (PARTITION BY media_id
                          ORDER BY frame_idx ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS seg_id
                FROM as_flip
            )
            SELECT media_id, seg_id,
                   bool_and(is_silent) AS is_silent,
                   MIN(frame_idx) AS start_frame,
                   MAX(frame_idx) AS end_frame,
                   CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(SUM(n_samples) AS BIGINT) AS n_samples,
                   CAST(SUM(sum_sq) AS BIGINT) AS sum_sq
            FROM as_seg GROUP BY 1, 2
        """,
        "video_keyframes": multimodal_mod.video_keyframes_sql(
            _VS_FH_SRC_SQL, threshold=10
        ),
        "video_shots": """
            WITH vs_clips AS (SELECT UNNEST(range(0, 8)) AS media_id),
            vs_pix AS (
                SELECT cl.media_id, CAST(f.f AS INTEGER) AS frame_idx,
                       (y.y * 7) // 12 AS yb, (x.x * 9) // 16 AS xb,
                       CASE WHEN y.y = 0 THEN
                             (x.x*3 + 0  + cl.media_id*13 + f.f*29) % 256
                           + (x.x*3 + 11 + cl.media_id*13 + f.f*29) % 256
                           + (x.x*3 + 22 + cl.media_id*13 + f.f*29) % 256
                       ELSE
                             (x.x*3 + y.y*7 + 0  + cl.media_id*13
                              + (f.f//8)*41*x.x) % 256
                           + (x.x*3 + y.y*7 + 11 + cl.media_id*13
                              + (f.f//8)*41*x.x) % 256
                           + (x.x*3 + y.y*7 + 22 + cl.media_id*13
                              + (f.f//8)*41*x.x) % 256
                       END AS gray
                FROM vs_clips cl, range(0, 24) f(f),
                     range(0, 16) x(x), range(0, 12) y(y)
            ),
            vs_blocks AS (
                SELECT media_id, frame_idx, yb, xb,
                       CAST(SUM(gray) AS BIGINT) AS s,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM vs_pix GROUP BY 1, 2, 3, 4
            ),
            vs_fh AS (
                SELECT a.media_id, a.frame_idx,
                       CAST(SUM(CASE WHEN a.s * b.n > b.s * a.n
                            THEN CAST(1 AS BIGINT) << (a.yb * 8 + a.xb)
                            ELSE 0 END) AS BIGINT) AS fhash
                FROM vs_blocks a
                JOIN vs_blocks b ON b.media_id = a.media_id
                                AND b.frame_idx = a.frame_idx
                                AND b.yb = a.yb AND b.xb = a.xb + 1
                GROUP BY 1, 2
            ),
            vs_steps AS (
                SELECT media_id, frame_idx,
                       CAST(bit_count(xor(fhash,
                            LAG(fhash) OVER (PARTITION BY media_id
                                             ORDER BY frame_idx)))
                            AS INTEGER) AS ham
                FROM vs_fh
            ),
            vs_cut AS (
                SELECT media_id, frame_idx, ham,
                       CASE WHEN ham IS NULL OR ham > 10
                            THEN 1 ELSE 0 END AS cut
                FROM vs_steps
            ),
            vs_sh AS (
                SELECT media_id, frame_idx, ham, cut,
                       CAST(SUM(cut) OVER (PARTITION BY media_id
                            ORDER BY frame_idx ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS shot_id
                FROM vs_cut
            )
            SELECT media_id, shot_id,
                   MIN(frame_idx) AS start_frame,
                   MAX(frame_idx) AS end_frame,
                   CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(COALESCE(MAX(CASE WHEN cut = 0 THEN ham END), 0)
                        AS INTEGER) AS max_step_hamming
            FROM vs_sh GROUP BY 1, 2
        """,
        "video_frame_stats": """
            WITH clips AS (SELECT UNNEST(range(0, 8)) AS media_id),
            frames AS (
                SELECT CAST(ms.ms * 8 / 1000 AS INTEGER) AS frame_idx
                FROM (SELECT UNNEST(range(0, 3000, 1000)) AS ms) ms
            ),
            pix AS (
                SELECT cl.media_id, fr.frame_idx, c.c AS chan,
                       (x.x * 3 + y.y * 7 + c.c * 11
                        + cl.media_id * 13 + fr.frame_idx * 17) % 256 AS v
                FROM clips cl, frames fr,
                     range(0, 16) x(x), range(0, 12) y(y), range(0, 3) c(c)
            )
            SELECT media_id, frame_idx,
                   CAST(SUM(CASE WHEN chan = 0 THEN v END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN chan = 1 THEN v END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN chan = 2 THEN v END) AS BIGINT) AS sum_b
            FROM pix GROUP BY media_id, frame_idx
        """,
        "minhash_lsh_pairs": _lsh_pairs_sql,
        "blocking_eval": evaluation.blocking_eval_sql(
            f"({_lsh_pairs_sql})",
            """(
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM (SELECT md5(text) AS k, doc_id FROM documents) a
                JOIN (SELECT md5(text) AS k, doc_id FROM documents) b
                  ON a.k = b.k AND a.doc_id < b.doc_id
            )""",
            "documents",
        ),
        # the capped variant: buckets with more than LSH_PAIR_CAP
        # members are excluded from pair emission (members still pair
        # through any shared non-mega bucket) — the cap rule mirrored
        # semantically, not just the happy path
        "minhash_lsh_pairs_capped": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            joined AS (
                SELECT doc_id, {dedup.token_hash_sql('token')} AS token_id
                FROM toks
            ),
            sig AS (SELECT doc_id, {mh_aggs} FROM joined GROUP BY doc_id),
            buckets AS ({" UNION ALL ".join(bands)}),
            keep AS (
                SELECT band, bucket FROM buckets
                GROUP BY band, bucket
                HAVING COUNT(*) <= {LSH_PAIR_CAP}
            ),
            kept AS (
                SELECT b.doc_id, b.band, b.bucket
                FROM buckets b JOIN keep USING (band, bucket)
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM kept a JOIN kept b
              ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.doc_id < b.doc_id
        """,
        "minhash_lsh_clusters": lsh_clusters_prelude + """
            SELECT doc_id, cluster_id FROM clusters
        """,
        "golden_records": lsh_clusters_prelude
        + dedup.golden_records_sql("documents", "clusters"),
        "sorted_neighborhood": dedup.sorted_neighborhood_sql(
            "documents", "doc_id", "n_chars", window=5
        ),
        "cluster_audit": lsh_clusters_prelude.replace(
            "FROM documents",
            "FROM (SELECT * FROM documents WHERE doc_id % 2 = 0)",
        ) + (
            "SELECT * FROM ("
            + dedup.cluster_audit_sql(
                "clusters",
                "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
            )
            + ")"
        ),
        "sample_hash": f"""
            SELECT doc_id, lang FROM documents
            WHERE {dedup.token_hash_sql("CAST(doc_id AS VARCHAR)")} % 8 = 0
        """,
        "dataset_split": sampling.grouped_split_sql(
            "(SELECT doc_id, source FROM documents)",
            "source",
            [("train", 800_000), ("val", 100_000), ("test", 100_000)],
        ),
        "sample_stratified": f"""
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY {dedup.token_hash_sql("CAST(doc_id AS VARCHAR)")},
                                    doc_id
                       ) AS sr
                FROM documents
            ) t WHERE sr <= 3
        """,
        "lang_topk_quality": """
            SELECT lang, doc_id, n_chars, rank FROM (
                SELECT lang, doc_id, LENGTH(text) AS n_chars,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY LENGTH(text) DESC, doc_id
                       ) AS rank
                FROM documents
            ) t WHERE rank <= 5
        """,
        "minhash_dedup_apply": lsh_clusters_prelude + """
            , sizes AS (
                SELECT cluster_id, COUNT(*) AS cluster_size
                FROM clusters GROUP BY 1
            )
            SELECT d.doc_id, d.lang, s.cluster_size
            FROM documents d JOIN sizes s ON d.doc_id = s.cluster_id
        """,
        "significance_prefilter": _with_pages("""
            , pairs AS (
                SELECT url, version,
                       LAG(substring(text, 1, 64)) OVER (
                           PARTITION BY url ORDER BY version) AS prev_text,
                       substring(text, 1, 64) AS cur_text
                FROM pages
            ),
            norm AS (
                SELECT url, version,
                       regexp_replace(regexp_replace(regexp_replace(
                           lower(prev_text), '[＇''ʼʹ]', '', 'g'),
                           'ß', 'ss', 'g'),
                           '[\\W_]+', ' ', 'g') AS o,
                       regexp_replace(regexp_replace(regexp_replace(
                           lower(cur_text), '[＇''ʼʹ]', '', 'g'),
                           'ß', 'ss', 'g'),
                           '[\\W_]+', ' ', 'g') AS n
                FROM pairs WHERE prev_text IS NOT NULL
            )
            SELECT url, version,
                   levenshtein(o, n) AS lev_dist,
                   o = n AS norm_equal,
                   levenshtein(o, n) <
                       FLOOR(LEAST(length(o), length(n)) / 8) AS small_edit
            FROM norm
        """),
        "lang_id": _langid_sql,
        "langid_eval": evaluation.confusion_metrics_sql(
            f"({_langid_sql})", "lang", "lang_pred", "n_docs"
        ),
        "simhash": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            joined AS (
                SELECT doc_id, {dedup.token_hash_sql('token')} AS token_id
                FROM toks
            ),
            scored AS (
                SELECT doc_id, {sim_votes}
                FROM joined GROUP BY doc_id
            )
            SELECT doc_id, {sim_pack} AS simhash
            FROM scored
        """,
        "simhash_pairs": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            joined AS (
                SELECT doc_id, {dedup.token_hash_sql('token')} AS token_id
                FROM toks
            ),
            scored AS (
                SELECT doc_id, {sim_votes}
                FROM joined GROUP BY doc_id
            ),
            sh AS (
                SELECT doc_id, {sim_pack} AS simhash
                FROM scored
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                       AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "simhash_clusters": """
            WITH RECURSIVE toks AS (
                SELECT DISTINCT doc_id, tok AS token
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
            ),
            joined AS (
                SELECT doc_id, {token_hash} AS token_id
                FROM toks
            ),
            scored AS (
                SELECT doc_id, {sim_votes}
                FROM joined GROUP BY doc_id
            ),
            sh AS (
                SELECT doc_id, {sim_pack} AS simhash
                FROM scored
            ),
            edges AS (
                SELECT a.doc_id AS src, b.doc_id AS dst
                FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ),
            reach(doc_id, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.dst, r.lbl
                FROM reach r JOIN edges e ON e.src = r.doc_id
            )
            SELECT doc_id, MIN(lbl) AS cluster_id
            FROM reach GROUP BY 1
        """.format(
            token_hash=dedup.token_hash_sql("token"),
            sim_votes=sim_votes,
            sim_pack=sim_pack,
        ),
        "contamination": """
            WITH grams AS (
                SELECT DISTINCT doc_id,
                       array_to_string(ts[i:i+7], ' ') AS shingle
                FROM (SELECT doc_id,
                             string_split_regex(lower(text), '\\s+') AS ts
                      FROM documents) t,
                     LATERAL (SELECT UNNEST(
                                  range(1, GREATEST(len(ts) - 7, 1) + 1))
                              AS i) g
                WHERE length(array_to_string(ts[i:i+7], ' ')) > 0
            ),
            bench AS (
                SELECT doc_id AS bench_id, shingle
                FROM grams WHERE doc_id % 29 = 0
            ),
            corpus AS (
                SELECT doc_id, shingle FROM grams WHERE doc_id % 29 <> 0
            ),
            hits AS (
                SELECT c.doc_id,
                       COUNT(DISTINCT c.shingle) AS n_hit_ngrams,
                       COUNT(DISTINCT b.bench_id) AS n_bench_docs
                FROM corpus c JOIN bench b USING (shingle)
                GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(h.n_hit_ngrams, 0) AS n_hit_ngrams,
                   COALESCE(h.n_bench_docs, 0) AS n_bench_docs,
                   COALESCE(h.n_hit_ngrams, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 29 <> 0
        """,
        "bpe_pairs": textops.bpe_pair_counts_sql("documents", top_k=200),
        "lexical_diversity": textops.lexical_diversity_sql("documents"),
        "vocab_growth": textops.vocab_growth_sql(
            "documents", VOCAB_GROWTH_CPS
        ),
        "zipf_buckets": textops.zipf_buckets_sql("documents", ngram=2),
        "lang_divergence": textops.slice_divergence_sql("documents"),
        "chi2_tokens": textops.chi2_tokens_sql("documents"),
        "token_runs": textops.token_runs_sql("documents"),
        "cube_rollup": profile_mod.cube_rollup_sql(
            "documents", ["lang", "source"], sum_col="n_chars"
        ),
        "events_gap_fill": temporal_mod.gap_fill_sql(
            "events", key_col="event_type"
        ),
        "embedding_silhouette": evaluation.silhouette_centroid_sql(
            "embeddings"
        ),
        "brier_quality": evaluation.brier_score_sql(
            "(SELECT p.doc_id, p.lang, p.pct_m, g.keep FROM ("
            + textops.percentile_calibrate_sql(
                "documents", "n_chars", ["lang"], ["doc_id"]
            )
            + ") p JOIN ("
            + textops.gopher_filter_sql("documents")
            + ") g USING (doc_id))",
            "lang", "pct_m", "keep",
        ),
        "ece_quality": evaluation.ece_eval_sql(
            "(SELECT p.doc_id, p.pct_m, g.keep FROM ("
            + textops.percentile_calibrate_sql(
                "documents", "n_chars", ["lang"], ["doc_id"]
            )
            + ") p JOIN ("
            + textops.gopher_filter_sql("documents")
            + ") g USING (doc_id))",
            "pct_m", "keep",
        ),
        "quality_calibration": evaluation.calibration_bins_sql(
            "(SELECT p.doc_id, p.pct_m, g.keep FROM ("
            + textops.percentile_calibrate_sql(
                "documents", "n_chars", ["lang"], ["doc_id"]
            )
            + ") p JOIN ("
            + textops.gopher_filter_sql("documents")
            + ") g USING (doc_id))",
            "pct_m", "keep",
        ),
        "isotonic_calibration": evaluation.isotonic_calibrate_sql(
            "(SELECT p.doc_id, p.lang, p.pct_m, g.keep FROM ("
            + textops.percentile_calibrate_sql(
                "documents", "n_chars", ["lang"], ["doc_id"]
            )
            + ") p JOIN ("
            + textops.gopher_filter_sql("documents")
            + ") g USING (doc_id))",
            "pct_m", "keep", ["lang"], n_bins=10,
        ),
        "bootstrap_doclen": evaluation.bootstrap_means_sql(
            "documents", "doc_id", "n_chars", n_reps=20
        ),
        "ks_lang_lengths": evaluation.ks_two_sample_sql(
            "documents", "lang", "n_chars"
        ),
        "anova_doclen": evaluation.anova_oneway_sql(
            "documents", "source", "lang", "n_chars"
        ),
        "benford_chars": profile_mod.benford_profile_sql(
            "documents", "lang", "n_chars"
        ),
        "gini_gain_tokens": textops.gini_gain_tokens_sql(
            "documents", k=25, min_df=2
        ),
        "quantile_normalize": profile_mod.quantile_normalize_sql(
            "documents", "lang", "doc_id", "n_chars", q_bins=20
        ),
        "trimmed_mean": profile_mod.trimmed_mean_sql(
            "documents", "lang", "n_chars", trim_ppm=100_000
        ),
        "k_anonymity": profile_mod.k_anonymity_ladder_sql(
            "documents", ["lang", "source"], "n_chars", k=5,
            dividers=(1, 100, 0),
        ),
        "line_merge": spatial.line_merge_sql(_LINE_MERGE_SEGS_SQL),
        "cell_polyfill": spatial.cell_polyfill_sql(
            PIP_POLYGONS, res_deg=0.25
        ),
        "route_corridor": spatial.route_corridor_sql(
            _CORRIDOR_PTS_SQL, _LINE_MERGE_SEGS_SQL, 0.25, 0.0625
        ),
        "knox_events": spatial.knox_test_sql(
            """(
            SELECT event_id AS doc_id,
                   CAST(-100.0 AS DOUBLE)
                     + (user_id % 140) * CAST(1.0 AS DOUBLE)
                     + CAST(0.002 AS DOUBLE) * rn AS lon,
                   CAST(-45.0 AS DOUBLE)
                     + (user_id % 120) * CAST(0.5 AS DOUBLE)
                     + CAST(0.001 AS DOUBLE) * rn
                     + CAST(1.0 AS DOUBLE) * (rn // 25) AS lat,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
                        AS BIGINT) AS t
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY user_id
                      ORDER BY ts, event_id) AS rn
                  FROM events)
            )""",
            **KNOX_ARGS,
        ),
        "viterbi_match": spatial.viterbi_match_sql(
            """(
            SELECT doc_id // 10 AS entity, doc_id % 10 AS seq,
                   CAST((doc_id // 10) % 50 AS DOUBLE)
                     + (doc_id % 10) * CAST(0.0625 AS DOUBLE)
                     + CAST(0.03125 AS DOUBLE) AS lon,
                   CAST(((doc_id // 10) // 50) % 80 AS DOUBLE)
                     + ((doc_id % 10) % 3 - 1)
                       * CAST(0.03125 AS DOUBLE) AS lat
            FROM documents
            )""",
            _LINE_MERGE_SEGS_SQL, 0.25, max_points=16,
            **VITERBI_PENS,
        ),
        "dq_orders": profile_mod.dq_checks_sql(
            "orders", _DQ_ORDERS_SUITE,
            refs={"customer": "customer"},
        ),
        "l_diversity": profile_mod.l_diversity_ladder_sql(
            "documents", ["lang"], "n_chars", "source", l=3,
            dividers=(1, 100, 0),
        ),
        "t_closeness": profile_mod.t_closeness_report_sql(
            "(SELECT *, CAST(n_chars AS BIGINT) // 200 AS len_b"
            " FROM documents)",
            ["lang", "len_b"], "source", t_ppm=250_000,
        ),
        "fleiss_raters": evaluation.fleiss_kappa_sql(
            """(SELECT lang AS grp, doc_id AS it,
                       CASE WHEN v THEN 'keep' ELSE 'drop' END AS cat
                FROM (
                    SELECT doc_id, lang,
                           unnest([
                               n_chars BETWEEN 150 AND 400,
                               len(list_filter(
                                   string_split_regex(text, '\\s+'),
                                   t -> t <> '')) BETWEEN 30 AND 80,
                               (' ' || lower(text) || ' ')
                                   LIKE '% the %'
                           ]) AS v
                    FROM documents
                ))""",
            "grp", "it", "cat",
        ),
        "krippendorff": evaluation.krippendorff_alpha_sql(
            """(SELECT lang AS grp, doc_id AS it,
                       CASE WHEN v THEN 'keep' ELSE 'drop' END AS cat
                FROM (
                    SELECT doc_id, lang,
                           n_chars BETWEEN 150 AND 400 AS v
                    FROM documents WHERE doc_id % 5 <> 0
                    UNION ALL
                    SELECT doc_id, lang,
                           len(list_filter(
                               string_split_regex(text, '\\s+'),
                               t -> t <> '')) BETWEEN 30 AND 80 AS v
                    FROM documents WHERE doc_id % 3 <> 0
                    UNION ALL
                    SELECT doc_id, lang,
                           (' ' || lower(text) || ' ')
                               LIKE '% the %' AS v
                    FROM documents WHERE doc_id % 7 <> 2
                ))""",
            "grp", "it", "cat",
        ),
        "rank_sum_lengths": evaluation.rank_sum_test_sql(
            "documents", "lang", "n_chars"
        ),
        "polygon_validity_report": spatial.polygon_validity_sql(
            _POLY_VALID_PTS_SQL
        ),
        "seasonal_hourly": temporal_mod.seasonal_decompose_sql(
            "(" + temporal_mod.gap_fill_sql(
                "events", key_col="event_type"
            ) + ")",
            "event_type", "bucket", "n_events", period=24,
        ),
        "pettitt_hourly": temporal_mod.pettitt_split_sql(
            """(SELECT event_type,
                       CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600 AS h,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2)""",
            "event_type", "h", "n",
        ),
        "session_paths": temporal_mod.session_paths_sql(
            "events", "user_id", "ts", "event_type", "event_id",
            gap_s=1800, k=25,
        ),
        "rfm_segments": temporal_mod.rfm_segments_sql("events"),
        "mase_hourly": temporal_mod.seasonal_mase_sql(
            """(
            WITH msq_b AS (
                SELECT MIN(epoch_us(ts) // 3600000000) AS h0,
                       MAX(epoch_us(ts) // 3600000000) AS h1
                FROM events
            ),
            msq_ty AS (SELECT DISTINCT event_type FROM events),
            msq_cnt AS (
                SELECT event_type,
                       epoch_us(ts) // 3600000000 AS h,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            ),
            msq_grid AS MATERIALIZED (
                SELECT t.event_type, g.h
                FROM msq_ty t, msq_b b,
                     LATERAL (SELECT
                              UNNEST(generate_series(b.h0, b.h1))
                              AS h) g
            )
            SELECT gr.event_type, gr.h,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM msq_grid gr
            LEFT JOIN msq_cnt c ON c.event_type = gr.event_type
                               AND c.h = gr.h
            )""",
            "event_type", "h", "n", season=24,
        ),
        "survival_km": temporal_mod.survival_km_sql(
            "events", "user_id", "ts", bucket_s=3600, horizon=24,
        ),
        "sax_hourly": temporal_mod.sax_words_sql(
            """(
            WITH sxq_b AS (
                SELECT MIN(epoch_us(ts) // 3600000000) AS h0,
                       MAX(epoch_us(ts) // 3600000000) AS h1
                FROM events
            ),
            sxq_ty AS (SELECT DISTINCT event_type FROM events),
            sxq_cnt AS (
                SELECT event_type,
                       epoch_us(ts) // 3600000000 AS h,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            ),
            sxq_grid AS MATERIALIZED (
                SELECT t.event_type, g.h
                FROM sxq_ty t, sxq_b b,
                     LATERAL (SELECT
                              UNNEST(generate_series(b.h0, b.h1))
                              AS h) g
            )
            SELECT gr.event_type, gr.h,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM sxq_grid gr
            LEFT JOIN sxq_cnt c ON c.event_type = gr.event_type
                               AND c.h = gr.h
            )""",
            "event_type", "h", "n", segments=12, alphabet=4,
        ),
        "kfold_assign": sampling.kfold_assign_sql(
            "(SELECT doc_id, lang, source || '/' || "
            "CAST(doc_id // 20 AS VARCHAR) AS bundle FROM documents)",
            "lang", "bundle", k=5,
        ),
        "conformal_bounds": evaluation.conformal_thresholds_sql(
            "(SELECT lang, n_chars FROM documents "
            "WHERE doc_id % 2 = 0)",
            "(SELECT lang, n_chars FROM documents "
            "WHERE doc_id % 2 = 1)",
            "lang", "n_chars", alpha_ppm=100_000,
        ),
        "sprt_decision": evaluation.sprt_decision_sql(
            "(SELECT event_type, event_id AS t, "
            "(user_id + event_id) % 2 = 0 AS s FROM events)",
            "event_type", "t", "s",
            SPRT_C1, SPRT_C0, SPRT_A, SPRT_B,
        ),
        "best_streak": f"""
            WITH eb_h AS (
                SELECT event_type,
                       CAST(epoch_us(CAST(ts AS TIMESTAMP))
                            // 3600000000 AS BIGINT) AS h
                FROM events
            ),
            eb_span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM eb_h),
            eb_grid AS (
                SELECT t.event_type, g.h, s.h0, s.h1
                FROM (SELECT DISTINCT event_type FROM eb_h) t
                CROSS JOIN eb_span s,
                LATERAL (SELECT UNNEST(generate_series(s.h0, s.h1))
                         AS h) g
            ),
            eb_cnt AS (
                SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS n
                FROM eb_h GROUP BY 1, 2
            ),
            eb_tot AS (
                SELECT event_type, CAST(COUNT(*) AS BIGINT) AS tot
                FROM eb_h GROUP BY 1
            ),
            eb_x AS (
                SELECT g.event_type, g.h AS t,
                       COALESCE(c.n, 0)
                       - (t.tot // (g.h1 - g.h0 + 1)) AS x
                FROM eb_grid g
                LEFT JOIN eb_cnt c USING (event_type, h)
                JOIN eb_tot t USING (event_type)
            )
            SELECT * FROM ({temporal_mod.max_subarray_sql(
                'eb_x', 'event_type', 't', 'x')})
        """,
        "match_assignment": f"""
            WITH msq_cand AS (
                SELECT id_a, id_b
                FROM ({dedup.sorted_neighborhood_sql(
                    'documents', 'doc_id', 'n_chars', window=5)})
            ),
            msq_pairs AS (
                SELECT c.id_a, c.id_b,
                       a.lang = b.lang AS f_lang,
                       a.source = b.source AS f_src,
                       substr(a.text, 1, 16) = substr(b.text, 1, 16)
                           AS f_pre
                FROM msq_cand c
                JOIN documents a ON a.doc_id = c.id_a
                JOIN documents b ON b.doc_id = c.id_b
            ),
            msq_edges AS (
                SELECT id_a, id_b, -odds_ppm AS w
                FROM ({dedup.fellegi_sunter_sql(
                    'msq_pairs', FS_FIELDS, FS_UP, FS_LO)})
            )
            SELECT * FROM ({graph.greedy_matching_sql(
                'msq_edges', max_rounds=24)})
        """,
        "fs_linkage": f"""
            WITH fsq_cand AS (
                SELECT id_a, id_b
                FROM ({dedup.sorted_neighborhood_sql(
                    'documents', 'doc_id', 'n_chars', window=5)})
            ),
            fsq_pairs AS (
                SELECT c.id_a, c.id_b,
                       a.lang = b.lang AS f_lang,
                       a.source = b.source AS f_src,
                       substr(a.text, 1, 16) = substr(b.text, 1, 16)
                           AS f_pre
                FROM fsq_cand c
                JOIN documents a ON a.doc_id = c.id_a
                JOIN documents b ON b.doc_id = c.id_b
            )
            SELECT * FROM ({dedup.fellegi_sunter_sql(
                'fsq_pairs', FS_FIELDS, FS_UP, FS_LO)})
        """,
        "emst_tiles": _with_pages(f"""
            , em_latest AS (
                SELECT doc_id, lon, lat FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            ),
            em_pts AS (
                SELECT pid, x, y,
                       (y // {EMST_RES}) * 1000000
                       + (x // {EMST_RES}) AS cell
                FROM (
                    SELECT doc_id AS pid,
                           CAST(ROUND(lon * {EMST_SCALE}) AS BIGINT)
                               + {180 * EMST_SCALE} AS x,
                           CAST(ROUND(lat * {EMST_SCALE}) AS BIGINT)
                               + {90 * EMST_SCALE} AS y
                    FROM em_latest)
            ),
            em_cap AS (
                SELECT pid, x, y, cell FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY cell ORDER BY pid) AS rn
                    FROM em_pts) WHERE rn <= {EMST_CAP}
            ),
            em_edges AS (
                SELECT a.pid AS id_a, b.pid AS id_b,
                       (a.x - b.x) * (a.x - b.x)
                       + (a.y - b.y) * (a.y - b.y) AS w
                FROM em_cap a JOIN em_cap b
                  ON a.cell = b.cell AND a.pid < b.pid
            )
            SELECT * FROM ({graph.boruvka_msf_sql('em_edges')})
        """),
        "event_bursts": temporal_mod.kleinberg_bursts_sql(
            "events", "user_id", "ts",
            s_exp=1, switch_ppm=temporal_mod.LN2_PPM, max_events=128,
        ),
        "event_xcorr": temporal_mod.series_crosscorr_sql(
            """(
            WITH xb AS (
                SELECT MIN(CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600) AS h0,
                       MAX(CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600) AS h1
                FROM events
            ),
            xg AS (
                SELECT s.range AS shard, g.h
                FROM range(0, 8) s,
                     (SELECT UNNEST(generate_series(h0, h1)) AS h
                      FROM xb) g
            ),
            xc AS (
                SELECT user_id % 8 AS shard,
                       CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600 AS h,
                       COUNT(*) FILTER (event_type = 'click') AS x,
                       COUNT(*) FILTER (event_type = 'purchase') AS y
                FROM events GROUP BY 1, 2
            )
            SELECT xg.shard, xg.h,
                   COALESCE(xc.x, 0) AS x, COALESCE(xc.y, 0) AS y
            FROM xg LEFT JOIN xc USING (shard, h)
            )""",
            "shard", "h", "x", "y", lags=(-3, -2, -1, 0, 1, 2, 3),
        ),
        "theil_sen_hourly": temporal_mod.theil_sen_sql(
            """(SELECT event_type,
                       CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600 AS h,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2)""",
            "event_type", "h", "n",
        ),
        "session_matrix": temporal_mod.session_entry_exit_sql(
            "events", "user_id", "ts", "event_type", "event_id",
            gap_s=1800,
        ),
        "twa_value": temporal_mod.time_weighted_avg_sql(
            """(SELECT event_type,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
                       CAST(round(value * 10000) AS BIGINT) AS v_q
                FROM events)""",
            "event_type", "t_us", "v_q",
        ),
        "runs_test_hourly": temporal_mod.runs_test_sql(
            """(SELECT event_type,
                       CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600 AS h,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2)""",
            "event_type", "h", "n",
        ),
        "ols_hourly": temporal_mod.ols_fit_sql(
            """(SELECT event_type,
                       CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600 AS h,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2)""",
            "event_type", "h", "n",
        ),
        "curation_verdict": f"""
            SELECT d.doc_id, d.lang, g.flags AS gopher_flags,
                   COALESCE(r.repetitive, FALSE) AS repetitive,
                   rt.rare_ppm,
                   m.is_outlier AS len_outlier,
                   CAST(CASE WHEN g.flags <> 0 THEN 1 ELSE 0 END
                      + CASE WHEN COALESCE(r.repetitive, FALSE)
                             THEN 2 ELSE 0 END
                      + CASE WHEN COALESCE(rt.rare_ppm > 500000, FALSE)
                             THEN 4 ELSE 0 END
                      + CASE WHEN m.is_outlier THEN 8 ELSE 0 END
                      AS BIGINT) AS reasons,
                   (g.flags = 0 AND NOT COALESCE(r.repetitive, FALSE)
                    AND NOT COALESCE(rt.rare_ppm > 500000, FALSE)
                    AND NOT m.is_outlier) AS keep
            FROM documents d
            JOIN ({textops.gopher_filter_sql("documents")}) g
                USING (doc_id)
            LEFT JOIN ({_REPETITION_SQL}) r USING (doc_id)
            LEFT JOIN ({_RARE_TOKEN_SQL}) rt USING (doc_id)
            JOIN ({profile_mod.mad_outliers_sql(
                "documents", "lang", "doc_id", "n_chars")}) m
                ON m.doc_id = d.doc_id
        """,
        "audio_zcr": multimodal_mod.audio_zcr_sql(8),
        "audio_haar": multimodal_mod.audio_haar_sql(8),
        "audio_onsets": multimodal_mod.audio_onsets_sql(
            8, n_samples=2048, burst=256, frame_samples=256,
            levels=3, thr_num=3, thr_den=2,
        ),
        "image_phash": multimodal_mod.image_phash_sql(16, w=48, h=32),
        "video_ssim": multimodal_mod.video_block_ssim_sql(
            8, w=16, h=12, n_frames=24, scene_len=8, block=4
        ),
        "audio_pitch": multimodal_mod.audio_pitch_sql(
            8, 1024, 256, 8, 64
        ),
        "image_gradients": multimodal_mod.image_gradients_sql(
            16, 48, 32
        ),
        "image_box_contrast": multimodal_mod.image_box_contrast_sql(
            16, 48, 32
        ),
        "morans_correlogram": _with_pages(f"""
            , mc_rollup AS (
                SELECT {cell} AS cell, COUNT(*) AS n_pages
                FROM pages p JOIN cs_status s USING (changeset_id)
                GROUP BY 1
            ),
            {spatial.morans_correlogram_ctes('mc_rollup', 'n_pages',
                                             max_band=3)}
        """),
        "neighbor_jaccard": graph.neighbor_jaccard_sql(
            _PR_EDGES_SQL, min_common=2
        ),
        "doc_ppr": f"""
            SELECT node AS doc_id, rank_q
            FROM ({graph.ppr_sql(
                '(SELECT doc_id AS node FROM documents)',
                f'(SELECT doc_id AS node FROM documents '
                f'WHERE doc_id % {PPR_SEED_MOD} = 0)',
                _PR_EDGES_SQL,
                iterations=PR_ITERATIONS,
            )})
        """,
        "emerging_hotspots": _with_pages(
            ", eh_src AS (SELECT "
            + spatial.grid_cell_sql("lon", "lat")
            + " AS cell, version FROM pages p "
            + "JOIN cs_status s USING (changeset_id)), "
            + spatial.emerging_hotspots_ctes("eh_src")
        ),
        "kn_bigrams": textops.kn_bigram_model_sql("documents", min_count=3),
        "token_burstiness": textops.token_burstiness_sql(
            "documents", min_df=2
        ),
        "charset_profile": textops.charset_profile_sql("documents"),
        "vocab_drift": textops.vocab_drift_sql(
            "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)",
            "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)",
            min_df=2,
        ),
        "winnow_fingerprints": textops.winnow_fingerprints_sql(
            "documents", k=8, window=4
        ),
        "textrank_keywords": textops.textrank_keywords_sql(
            "documents", window=2, min_len=4, iterations=6, k=25
        ),
        "text_tiles": textops.text_tiles_sql(
            "documents", block_tokens=20
        ),
        "quality_calibrate": textops.percentile_calibrate_sql(
            "documents", "n_chars", ["lang"], ["doc_id"]
        ),
        "robots_filter": textops.robots_filter_sql(
            "(SELECT 'doc://' || source || '/' || CAST(doc_id AS VARCHAR)"
            " AS url FROM documents)",
            "(SELECT * FROM (VALUES "
            + ", ".join(
                f"('{d}', '{p}', {str(a).upper()})"
                for d, p, a in _ROBOTS_RULES
            )
            + ") t(domain, prefix, allow))",
        ),
        "tfidf_topk": """
            WITH tf AS (
                SELECT doc_id, tok AS token, COUNT(*) AS tf
                FROM documents,
                     LATERAL UNNEST(string_split_regex(lower(text), '\\s+'))
                         AS u(tok)
                WHERE tok <> ''
                GROUP BY 1, 2
            ),
            dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            scored AS (
                SELECT doc_id, token, tf, df,
                       (tf * 1000000) // df AS score_m
                FROM tf JOIN dfq USING (token)
            ),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id
                    ORDER BY score_m DESC, token) AS rnk
                FROM scored
            )
            SELECT doc_id, token, tf, df, score_m,
                   CAST(rnk AS INTEGER) AS rank
            FROM ranked WHERE rnk <= 5
        """,
        "doc_pagerank": f"""
            SELECT node AS doc_id, rank_q
            FROM ({graph.pagerank_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                iterations=PR_ITERATIONS,
            )})
        """,
        "betweenness": f"""
            SELECT node AS doc_id, bc_q
            FROM ({graph.betweenness_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                n_sources=4, rounds=6,
            )})
        """,
        "attack_robustness": graph.attack_robustness_sql(
            "(SELECT doc_id AS node FROM documents)",
            _PR_EDGES_SQL,
            ATTACK_KS,
        ),
        "lt_influence": lt_influence_oracle(),
        "onion_layers": f"""
            SELECT node AS doc_id, coreness, layer
            FROM ({graph.onion_layers_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                max_layers=32,
            )})
        """,
        "random_failure": graph.attack_robustness_sql(
            "(SELECT doc_id AS node FROM documents)",
            _PR_EDGES_SQL,
            ATTACK_KS,
            strategy="hash",
        ),
        "bowtie_regions": f"""
            SELECT node AS doc_id, cls
            FROM ({graph.bowtie_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                rounds=6,
            )})
        """,
        "rich_club": graph.rich_club_sql(
            "(SELECT doc_id AS node FROM documents)",
            _PR_EDGES_SQL,
            RICH_CLUB_KS,
        ),
        "hyperball_harmonic": f"""
            SELECT node AS doc_id, ball_est, harm_q
            FROM ({graph.hyperball_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                rounds=4, k=16,
            )})
        """,
        "katz_centrality": f"""
            SELECT node AS doc_id, katz_q
            FROM ({graph.katz_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                iterations=PR_ITERATIONS,
            )})
        """,
        "graph_diameter": graph.graph_diameter_sql(
            "(SELECT doc_id AS node FROM documents)",
            _PR_EDGES_SQL,
            rounds=BFS_ROUNDS,
        ),
        "bm25_topk": textops.bm25_topk_sql("documents", BM25_QUERY, k=BM25_K),
        "gopher_filter": textops.gopher_filter_sql(
            "documents", min_stop_hits=1
        ),
        "mcnemar_filters": evaluation.mcnemar_paired_sql(
            "(SELECT d.lang, g.keep AS keep, "
            "d.n_chars BETWEEN 150 AND 400 AS len_keep "
            "FROM documents d JOIN ("
            + textops.gopher_filter_sql("documents", min_stop_hits=1)
            + ") g ON g.doc_id = d.doc_id)",
            "lang", "keep", "len_keep",
        ),
        "cell_gini": _with_pages(f"""
            , cg_latest AS (
                SELECT url, lang, lon, lat FROM (
                    SELECT p.*, ROW_NUMBER() OVER (
                        PARTITION BY url ORDER BY version DESC) AS rn
                    FROM pages p
                ) t WHERE rn = 1
            )
            {spatial.cell_gini_sql('cg_latest', 'lang', res_deg=15.0)
                .replace('WITH ', ', ', 1)}
        """),
        "decayed_rollup": temporal.decayed_rollup_sql(
            "events", halflife_s=7 * 86_400
        ),
        "slot_anomalies": temporal.slot_anomalies_sql("events"),
        "rolling_rollup": temporal.rolling_rollup_sql(
            "events", window_days=7
        ),
        "fuzzy_url_pairs": _with_pages(f"""
            , fu_urls AS (SELECT DISTINCT url FROM pages)
            SELECT a_id, b_id, lev_dist FROM ({dedup.fuzzy_key_join_sql(
                "(SELECT url AS a_id, url AS key FROM fu_urls)",
                "(SELECT url AS b_id, url AS key FROM fu_urls)",
                left_id="a_id", right_id="b_id",
            )}) WHERE a_id < b_id
        """),
        "interval_coverage": temporal.interval_coverage_sql(
            """(SELECT user_id,
                       epoch_us(ts) AS start_us,
                       epoch_us(ts) + CAST(ROUND(value * 100) AS BIGINT)
                           * 600000 AS end_us
                FROM events)"""
        ),
        "concordance": textops.concordance_sql(
            "documents", KWIC_TERM, window=KWIC_WINDOW
        ),
        "trip_cell_paths": spatial.trip_cell_paths_sql(
            _STAY_PTS_SQL, "user_id", "ts", tiebreak=("event_id",)
        ),
        "geofence_transitions": temporal.geofence_transitions_sql(
            _STAY_PTS_SQL,
            "(SELECT * FROM (VALUES "
            + ", ".join(
                f"({fid}, CAST({a} AS DOUBLE), CAST({b} AS DOUBLE), "
                f"CAST({c} AS DOUBLE), CAST({d} AS DOUBLE))"
                for fid, a, b, c, d in GEOFENCES
            )
            + ") f(fence_id, min_lon, min_lat, max_lon, max_lat))",
            tiebreak=("event_id",),
        ),
        "hausdorff_tracks": spatial.hausdorff_pairs_sql(
            _HAUS_PTS_SQL, _HAUS_PAIRS_SQL
        ),
        "frechet_tracks": spatial.frechet_pairs_sql(
            _FRECHET_PTS_SQL, _FRECHET_PAIRS_SQL,
            max_points=FRECHET_MAX_RN,
        ),
        "dtw_tracks": spatial.dtw_pairs_sql(
            _FRECHET_PTS_SQL, _FRECHET_PAIRS_SQL,
            max_points=FRECHET_MAX_RN,
        ),
        "edr_tracks": spatial.edr_pairs_sql(
            _FRECHET_PTS_SQL, _FRECHET_PAIRS_SQL,
            eps=EDR_EPS_DEG, max_points=FRECHET_MAX_RN,
        ),
        "lcss_tracks": spatial.lcss_pairs_sql(
            _FRECHET_PTS_SQL, _FRECHET_PAIRS_SQL,
            eps=EDR_EPS_DEG, delta=LCSS_DELTA,
            max_points=FRECHET_MAX_RN,
        ),
        "stay_points": spatial.stay_points_sql(
            _STAY_PTS_SQL, "user_id", "ts",
            min_duration_s=1800, min_points=3, tiebreak=("event_id",),
        ),
        "followed_by": temporal.followed_by_counts_sql(
            "events", FOLLOW_WIN_S
        ),
        "props_rollup": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(k) AS BIGINT) AS n_with_k,
                   CAST(COALESCE(SUM(k), 0) AS BIGINT) AS k_sum,
                   CAST(CASE WHEN COUNT(k) = 0 THEN NULL
                        ELSE COALESCE(SUM(k), 0) * 1000000 // COUNT(k)
                        END AS BIGINT) AS k_mean_ppm
            FROM (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT)
                           AS k
                FROM events
            ) GROUP BY event_type
        """,
        "contact_episodes": spatial.contact_episodes_sql(
            _STAY_PTS_SQL, "user_id", "ts",
            res_deg=COLOC_RES, window_s=COLOC_WIN_S,
        ),
        "colocation_pairs": spatial.colocation_pairs_sql(
            _STAY_PTS_SQL, "user_id", "ts",
            res_deg=COLOC_RES, window_s=COLOC_WIN_S,
        ),
        "flock_groups": spatial.flock_groups_sql(
            _STAY_PTS_SQL, "user_id", "ts",
            res_deg=COLOC_RES, window_s=COLOC_WIN_S,
        ),
        "hrw_assign": f"""
            SELECT key AS doc_id, shard
            FROM ({sketches.hrw_assign_sql(
                "documents", "doc_id", HRW_SHARDS
            )})
        """,
        "cusum_split": temporal.cusum_split_sql(
            "(SELECT user_id, ts, event_id, "
            "CAST(floor(value * 1000) AS BIGINT) AS v_mil FROM events)",
            "user_id", "ts", "v_mil", tiebreak=("event_id",),
        ),
        "resample_track": spatial.resample_track_sql(
            _STAY_PTS_SQL, "user_id", "ts", step_s=RESAMPLE_STEP_S
        ),
        # zigzag variant of the drift geocode (triangle-wave lon):
        # same ::DOUBLE pinning discipline as _STAY_PTS_SQL
        "turn_stats": spatial.turn_stats_sql(
            """(
    SELECT user_id, ts, event_id,
           CAST(-45.0 AS DOUBLE) + (user_id % 120) * CAST(0.5 AS DOUBLE)
               + CAST(0.001 AS DOUBLE) * rn
               + CAST(1.0 AS DOUBLE) * floor(rn / 25) AS lat,
           CAST(-100.0 AS DOUBLE) + (user_id % 140) * CAST(1.0 AS DOUBLE)
               + CAST(0.002 AS DOUBLE) * abs(10 - (rn % 20)) AS lon
    FROM (SELECT user_id, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events) t
)""",
            "user_id", "ts", tiebreak=("event_id",),
        ),
        "weighted_sample": sampling_ops.weighted_sample_sql(
            """(SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text),
                                                        '\\s+')) END
                           AS n_tokens
                FROM documents)""",
            n=WS_N,
            weight_col="n_tokens",
        ),
        "triangle_counts": graph.triangle_counts_sql(_PR_EDGES_SQL),
        "clustering_coeff": f"""
            SELECT node AS doc_id, deg, n_triangles, coeff_ppm
            FROM ({graph.clustering_coeff_sql(_PR_EDGES_SQL)})
        """,
        "link_components": f"""
            SELECT node AS doc_id, label
            FROM ({graph.components_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
            )})
        """,
        "scc_components": f"""
            SELECT node AS doc_id, scc, scc_size
            FROM ({graph.scc_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
            )})
        """,
        "redirect_resolve": f"""
            SELECT id AS doc_id, canonical, hops, is_cycle
            FROM ({graph.redirect_resolve_sql(
                '(SELECT doc_id AS id FROM documents)',
                _REDIRECT_EDGES_SQL,
            )})
        """,
        "ktruss_links": f"""
            SELECT src AS doc_a, dst AS doc_b, support
            FROM ({graph.ktruss_sql(_PR_EDGES_SQL, k=KTRUSS_K)})
        """,
        "kcore": f"""
            SELECT node AS doc_id, degree
            FROM ({graph.kcore_sql(
                '(SELECT doc_id AS node FROM documents)',
                _PR_EDGES_SQL,
                k=KCORE_K,
            )})
        """,
        "cocitation_pairs": graph.common_neighbor_pairs_sql(
            _PR_EDGES_SQL, "cocitation", min_count=2
        ),
        "coupling_pairs": graph.common_neighbor_pairs_sql(
            _PR_EDGES_SQL, "coupling", min_count=2
        ),
        "link_prediction": graph.resource_allocation_sql(
            _PR_EDGES_SQL, "cocitation", min_count=2
        ),
        "link_distance": f"""
            SELECT node AS doc_id, dist
            FROM ({graph.link_distance_sql(
                '(SELECT doc_id AS node FROM documents)',
                '(SELECT doc_id AS node FROM documents '
                'WHERE doc_id % 97 = 0)',
                _PR_EDGES_SQL,
                rounds=BFS_ROUNDS,
            )})
        """,
        "graph_profile": graph.link_graph_profile_sql(
            "(SELECT doc_id AS node FROM documents)", _PR_EDGES_SQL
        ),
        "dag_levels": f"""
            SELECT node AS doc_id, level
            FROM ({graph.dag_levels_sql(
                '(SELECT doc_id AS node FROM documents)',
                f'(SELECT src, dst FROM {_PR_EDGES_SQL} '
                'WHERE src < dst)',
                rounds=BFS_ROUNDS,
            )})
        """,
        "rrf_hybrid": ranking.rrf_fusion_sql(
            [
                f"""SELECT doc_id, score_m AS score FROM ({
                    textops.bm25_topk_sql(
                        "documents", BM25_QUERY, k=RRF_RUN_K
                    )})""",
                f"""SELECT node AS doc_id, rank_q AS score
                    FROM ({graph.pagerank_sql(
                        '(SELECT doc_id AS node FROM documents)',
                        _PR_EDGES_SQL,
                        iterations=PR_ITERATIONS,
                    )})
                    ORDER BY score DESC, doc_id ASC LIMIT {RRF_RUN_K}""",
            ],
            score_col="score",
        ),
        "skyline_docs": f"""
            WITH sky_raw AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text),
                                                        '\\s+')) END
                           AS n_tokens,
                       n_chars
                FROM documents
            ),
            sky_pts AS (
                SELECT doc_id, n_tokens,
                       n_chars * 1000 // greatest(n_tokens, 1) AS cpt_m
                FROM sky_raw
            )
            {ranking.skyline_sql('sky_pts', 'n_tokens', 'cpt_m')}
        """,
        "bottleneck_width": f"""
            SELECT node AS doc_id, width
            FROM ({graph.widest_path_sql(
                '(SELECT doc_id AS node FROM documents)',
                '(SELECT doc_id AS node FROM documents '
                'WHERE doc_id % 97 = 0)',
                f'(SELECT src, dst, 1 + (src + dst * 5) % 13 AS w '
                f'FROM {_PR_EDGES_SQL})',
                rounds=WD_ROUNDS,
            )})
        """,
        "weighted_distance": f"""
            SELECT node AS doc_id, dist
            FROM ({graph.weighted_distance_sql(
                '(SELECT doc_id AS node FROM documents)',
                '(SELECT doc_id AS node FROM documents '
                'WHERE doc_id % 97 = 0)',
                f'(SELECT src, dst, 1 + (src * 3 + dst) % 7 AS w '
                f'FROM {_PR_EDGES_SQL})',
                rounds=WD_ROUNDS,
            )})
        """,
        "label_spread": f"""
            SELECT node AS doc_id, label
            FROM ({graph.label_spread_sql(
                '(SELECT doc_id AS node FROM documents)',
                '(SELECT doc_id AS node, doc_id % 7 AS label '
                'FROM documents WHERE doc_id % 11 = 0)',
                _PR_EDGES_SQL,
                rounds=LS_ROUNDS,
            )})
        """,
        "sampled_quantiles": sketches.sampled_quantiles_sql(
            "(SELECT doc_id, lang, CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END "
            "AS n_tok FROM documents)",
            "lang", "n_tok", "doc_id", k=128,
        ),
        "postings_cost": textops.postings_varint_cost_sql(
            "documents", shard_size=1024, min_docs=50
        ),
        "kendall_len_tokens": ranking.kendall_tau_sql(
            "(SELECT doc_id, lang, n_chars, "
            "CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END "
            "AS n_tok FROM documents)",
            "lang", "n_chars", "n_tok", "doc_id", k=128,
        ),
        "spearman_len_tokens": ranking.spearman_rho_sql(
            "(SELECT doc_id, lang, n_chars, "
            "CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END "
            "AS n_tok FROM documents)",
            "lang", "n_chars", "n_tok", "doc_id", k=128,
        ),
        "countmin_topk": f"""
            WITH cm_exact AS (
                SELECT u.tok AS token, COUNT(*) AS true_n
                FROM (SELECT string_split_regex(lower(text), '\\s+') AS ws
                      FROM documents) s,
                     LATERAL UNNEST(s.ws) AS u(tok)
                WHERE u.tok <> ''
                GROUP BY 1
            ),
            cm_top AS (
                SELECT token, true_n FROM cm_exact
                ORDER BY true_n DESC, token LIMIT {CM_TOPK}
            ),
            cm_est AS (
                SELECT * FROM ({sketches.countmin_sql(
                    'documents', 'SELECT token FROM cm_top',
                    depth=CM_DEPTH, width=CM_WIDTH)})
            )
            SELECT t.token, t.true_n, e.est_n
            FROM cm_top t JOIN cm_est e USING (token)
        """,
        "kmv_distinct_docs": _with_pages(
            ", " + sketches.kmv_distinct_ctes(
                "(SELECT lang, doc_id FROM pages)", "lang", "doc_id", k=16
            )
        ),
        "token_f2": sketches.f2_sketch_sql(
            f"""(SELECT s.lang,
                        {dedup.token_hash_sql('u.tok')} AS tok_h
                 FROM (SELECT lang,
                              string_split_regex(lower(text), '\\s+')
                                  AS ws
                       FROM documents) s,
                      LATERAL UNNEST(s.ws) AS u(tok)
                 WHERE u.tok <> '')""",
            "lang", "tok_h", r=F2_R,
        ),
        "vocab_overlap": sketches.kmv_set_ops_sql(
            f"""(SELECT s.lang,
                        {dedup.token_hash_sql('u.tok')} AS tok_h
                 FROM (SELECT doc_id, lang,
                              string_split_regex(lower(text), '\\s+')
                                  AS ws
                       FROM documents WHERE doc_id % 2 = 0) s,
                      LATERAL UNNEST(s.ws) AS u(tok)
                 WHERE u.tok <> '')""",
            f"""(SELECT s.lang,
                        {dedup.token_hash_sql('u.tok')} AS tok_h
                 FROM (SELECT doc_id, lang,
                              string_split_regex(lower(text), '\\s+')
                                  AS ws
                       FROM documents WHERE doc_id % 2 = 1) s,
                      LATERAL UNNEST(s.ws) AS u(tok)
                 WHERE u.tok <> '')""",
            "lang", "tok_h", k=64,
        ),
        "hll_token_distinct": f"""
            WITH hllq_toks AS (
                SELECT s.lang,
                       {dedup.token_hash_sql('u.tok')} AS tok_h
                FROM (SELECT lang,
                             string_split_regex(lower(text), '\\s+') AS ws
                      FROM documents) s,
                     LATERAL UNNEST(s.ws) AS u(tok)
                WHERE u.tok <> ''
            ),
            {sketches.hll_distinct_ctes('hllq_toks', 'lang', 'tok_h')}
        """,
        "chunk_documents": textops.chunk_documents_sql(
            "documents", chunk_tokens=64, stride=48
        ),
        "length_batches": textops.length_batches_sql(
            "documents", batch_size=16, n_groups=8
        ),
        "mixture_resample": (
            "SELECT doc_id, lang, n_tokens, keep_thresh FROM ("
            + sampling_ops.mixture_resample_sql(
                "documents", MIXTURE_TARGETS
            )
            + ")"
        ),
        "rare_token_ratio": _RARE_TOKEN_SQL,
        "passage_dedup": """
            WITH corp AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000 AS doc_id,
                       array_to_string(
                           list_slice(string_split(text, ' '), 1, 32), ' ')
                           AS text
                FROM documents
            ),
            p AS (
                SELECT doc_id, CAST(i AS INT) AS chunk,
                       array_to_string(
                           list_slice(ws, i * 16 + 1, i * 16 + 16), ' ')
                           AS passage
                FROM (SELECT doc_id, string_split(text, ' ') AS ws
                      FROM corp) t,
                     LATERAL (SELECT UNNEST(
                                  range(0, ((len(ws) - 1) // 16) + 1))
                              AS i) u
            ),
            r AS (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY md5(passage)
                    ORDER BY doc_id, chunk) AS rn
                FROM p
            )
            SELECT doc_id,
                   COUNT(*) AS n_passages,
                   CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   COALESCE(STRING_AGG(CASE WHEN rn = 1 THEN passage END,
                                       ' ' ORDER BY chunk), '') AS text_kept
            FROM r GROUP BY 1
        """,
        "pii_scrub": f"""
            WITH injected AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 3 = 0
                               THEN ' reach user' || CAST(doc_id AS VARCHAR)
                                    || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                                    || '.example.org'
                               ELSE '' END
                       || CASE WHEN doc_id % 4 = 1
                               THEN ' call 555-'
                                    || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                            4, '0')
                               ELSE '' END AS text
                FROM documents
            )
            SELECT doc_id,
                   CAST(array_length(regexp_extract_all(text,
                        '{textops.EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
                   CAST(array_length(regexp_extract_all(text,
                        '{textops.PHONE_PATTERN}')) AS BIGINT) AS n_phones,
                   regexp_replace(
                       regexp_replace(text, '{textops.EMAIL_PATTERN}',
                                      '<EMAIL>', 'g'),
                       '{textops.PHONE_PATTERN}', '<PHONE>', 'g') AS scrubbed
            FROM injected
        """,
        "html_extract": _with_pages(f"""
            SELECT url,
                   COUNT(*) AS versions,
                   CAST(SUM(CASE WHEN {textops.extract_text_sql('html')} = text
                            THEN 1 ELSE 0 END) AS BIGINT) AS ok_versions,
                   CAST(SUM(strlen({textops.extract_text_sql('html')}))
                        AS BIGINT) AS extracted_bytes,
                   CAST(SUM(octet_length(html)) AS BIGINT) AS html_bytes
            FROM pages
            GROUP BY 1
        """),
        "canonical_url": f"""
            WITH urls AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 2 = 0
                             THEN 'HTTP://WWW.Example.COM:80'
                             ELSE 'http://www.example.com' END)
                       || '/p/' || CAST(doc_id % 250 AS VARCHAR)
                       || (CASE WHEN doc_id % 3 = 0
                                THEN '?utm_source=feed&id='
                                     || CAST(doc_id % 250 AS VARCHAR)
                                ELSE '?id='
                                     || CAST(doc_id % 250 AS VARCHAR) END)
                       || (CASE WHEN doc_id % 2 = 0
                                THEN '&z=9&a=1' ELSE '&a=1&z=9' END)
                       || (CASE WHEN doc_id % 5 = 0
                                THEN '#frag' ELSE '' END) AS url
                FROM documents
            )
            SELECT {textops.canonical_url_sql('url')} AS curl,
                   COUNT(*) AS n_variants,
                   MIN(doc_id) AS first_doc
            FROM urls GROUP BY 1
        """,
        "boilerplate_strip": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS ws,
                       CAST(floor((len(string_split(text, ' ')) - 1) / 8)
                            AS INT) AS nc
                FROM documents
            ),
            lines AS (
                SELECT doc_id, 0 AS lineno,
                       'subscribe to our newsletter' AS line FROM t
                UNION ALL
                SELECT doc_id, u.i + 1,
                       array_to_string(ws[u.i*8+1 : u.i*8+8], ' ')
                FROM t, LATERAL (SELECT UNNEST(range(0, nc + 1)) AS i) u
                UNION ALL
                SELECT doc_id, nc + 2, 'copyright example corp' FROM t
            ),
            nonempty AS (
                SELECT * FROM lines WHERE length(trim(line)) > 0
            ),
            dfreq AS (
                SELECT line, COUNT(DISTINCT doc_id) AS df
                FROM nonempty GROUP BY 1
            ),
            v AS (
                SELECT n.doc_id, n.lineno, n.line, d.df < 50 AS kept
                FROM nonempty n JOIN dfreq d ON n.line = d.line
            )
            SELECT doc_id,
                   COUNT(*) AS n_lines,
                   CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   COALESCE(STRING_AGG(CASE WHEN kept THEN line END,
                                       chr(10) ORDER BY lineno), '')
                       AS text_kept
            FROM v GROUP BY 1
        """,
        "geotag_cells": f"""
            WITH tagged AS (
                SELECT 'doc://' || source || '/' || CAST(doc_id AS VARCHAR)
                           AS url,
                       text || ' geo:'
                       || CAST(doc_id * 104729 % 1800000 - 900000 AS VARCHAR)
                       || ','
                       || CAST(doc_id * 7919 % 3600000 - 1800000 AS VARCHAR)
                           AS text
                FROM documents
            ),
            h AS (
                SELECT url, {pages_src.html_of_sql('url', 'text')} AS html
                FROM tagged
            ),
            e AS (
                SELECT url, {textops.extract_text_sql('html')} AS extracted
                FROM h
            ),
            pts AS (
                SELECT url,
                       CAST(regexp_extract(extracted,
                            'geo:(-?\\d+),(-?\\d+)', 1) AS BIGINT) / 10000.0
                           AS lat,
                       CAST(regexp_extract(extracted,
                            'geo:(-?\\d+),(-?\\d+)', 2) AS BIGINT) / 10000.0
                           AS lon
                FROM e
            )
            SELECT {spatial.hier_cell_sql('lon', 'lat', 6)} AS cell,
                   COUNT(*) AS n_pages,
                   MIN(url) AS first_url
            FROM pts GROUP BY 1
        """,
        "domain_rollup": _with_pages("""
            SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/]+)/', 1)
                       AS domain,
                   COUNT(*) AS n_pages,
                   CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
                   CAST(SUM(CASE WHEN NOT s.accepted THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tainted
            FROM pages p JOIN cs_status s USING (changeset_id)
            GROUP BY 1
        """),
        "repetition_stats": _REPETITION_SQL,
        # classify_actions (full, all element types) stays rows-only by
        # design (golden-tested in tests/); the nodes-only restriction
        # below oracle-verifies the same fold at data scale.
        #
        # Derivation (verified MATCH vs the mapInPandas fold at sf0.001
        # and sf0.01): with tags constant per url, the fold reduces to:
        # segments split at invisible versions (state reset,
        # change_bot.rb:77-83); text enters the reconstructed state only
        # at an *accepted* segment-start; an unaccepted segment-start
        # taints ('text', T) forever (:136-151); every unaccepted
        # visible version redacts hidden (position always differs by
        # ≥1.3e-3 ≫ ε=2e-7); an accepted version redacts visible iff a
        # taint exists at-or-before it; final state invalid (no accepted
        # visible version in the last segment) → delete if last version
        # visible; else edit iff tainted or last version not the last
        # accepted one (:165-189).
        "classify_actions_nodes": _with_pages("""
            , hist AS (
                SELECT p.url, p.doc_id, p.version, p.visible, s.accepted,
                       p.lon, p.lat, p.text
                FROM pages p JOIN cs_status s USING (changeset_id)
                WHERE p.doc_id % 23 <> 0
            ),
            seg AS (
                SELECT *,
                       COALESCE(SUM(CASE WHEN NOT visible THEN 1 ELSE 0 END)
                           OVER (PARTITION BY url ORDER BY version
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS seg_id
                FROM hist
            ),
            vis AS (SELECT * FROM seg WHERE visible),
            segstart AS (
                SELECT *,
                       version = MIN(version) OVER (PARTITION BY url, seg_id)
                           AS is_seg_start
                FROM vis
            ),
            flags AS (
                SELECT *,
                       MAX(CASE WHEN is_seg_start AND NOT accepted
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY url ORDER BY version)
                           AS tainted_upto
                FROM segstart
            ),
            redacts AS (
                SELECT url, 'redact' AS action, version,
                       CASE WHEN NOT accepted THEN 'hidden'
                            ELSE 'visible' END AS mode,
                       CAST(NULL AS VARCHAR) AS new_text,
                       CAST(NULL AS DOUBLE) AS new_lon,
                       CAST(NULL AS DOUBLE) AS new_lat
                FROM flags
                WHERE (NOT accepted) OR tainted_upto = 1
            ),
            summary AS (
                SELECT url,
                       MAX(version) AS n,
                       SUM(CASE WHEN NOT visible THEN 1 ELSE 0 END) AS n_invis,
                       arg_max(visible, version) AS last_visible,
                       arg_max(text, version) AS text
                FROM seg GROUP BY url
            ),
            taints AS (
                SELECT url,
                       MAX(CASE WHEN is_seg_start AND NOT accepted
                                THEN 1 ELSE 0 END) AS tainted_any
                FROM segstart GROUP BY url
            ),
            finalacc AS (
                SELECT v.url,
                       MAX(v.version) AS last_acc_vis,
                       arg_max(v.lon, v.version) AS base_lon,
                       arg_max(v.lat, v.version) AS base_lat
                FROM vis v JOIN summary su USING (url)
                WHERE v.accepted AND v.seg_id = su.n_invis
                GROUP BY v.url
            ),
            finals AS (
                SELECT su.url, su.n, su.last_visible, su.text,
                       COALESCE(t.tainted_any, 0) AS tainted_any,
                       fa.last_acc_vis, fa.base_lon, fa.base_lat
                FROM summary su
                LEFT JOIN taints t USING (url)
                LEFT JOIN finalacc fa USING (url)
            ),
            deletes AS (
                SELECT url, 'delete' AS action, CAST(NULL AS INT) AS version,
                       CAST(NULL AS VARCHAR) AS mode,
                       CAST(NULL AS VARCHAR) AS new_text,
                       CAST(NULL AS DOUBLE) AS new_lon,
                       CAST(NULL AS DOUBLE) AS new_lat
                FROM finals WHERE last_acc_vis IS NULL AND last_visible
            ),
            edits AS (
                SELECT url, 'edit' AS action, CAST(n AS INT) AS version,
                       CAST(NULL AS VARCHAR) AS mode,
                       CASE WHEN tainted_any = 1 THEN NULL
                            ELSE text END AS new_text,
                       base_lon AS new_lon, base_lat AS new_lat
                FROM finals
                WHERE last_acc_vis IS NOT NULL
                  AND (tainted_any = 1 OR last_acc_vis <> n)
            )
            SELECT * FROM redacts
            UNION ALL SELECT * FROM deletes
            UNION ALL SELECT * FROM edits
        """),
        # A7 ways/relations restrictions: corpus derivation identical
        # to _append_delete_corpus (same arithmetic, real visibility),
        # then the segment-aware closed form of the fold — see
        # _fold_restriction_sql for the derivation and validation.
        "classify_actions_ways": _fold_restriction_sql(
            l_sql=(
                "2 + (p.doc_id*37 + p.version*p.version*11"
                " + p.version*5) % 5"
            ),
            min_len=2,
            tags_lit="'{\"kind\": \"way\"}'",
            member_agg=(
                "string_agg(CAST(a.ordinal AS VARCHAR), ','"
                " ORDER BY a.p) FILTER (WHERE a.intro_acc)"
            ),
            member_render="b.mstr",
            out_col="new_nodes_str",
        ),
        "classify_actions_relations": _fold_restriction_sql(
            l_sql=(
                "1 + (p.doc_id*41 + p.version*p.version*13"
                " + p.version*9) % 5"
            ),
            min_len=1,
            tags_lit="'{\"kind\": \"rel\"}'",
            member_agg=(
                "string_agg('[\"node\", ' || CAST(a.ordinal AS VARCHAR)"
                " || ', \"\"]', ', ' ORDER BY a.p)"
                " FILTER (WHERE a.intro_acc)"
            ),
            member_render="'[' || b.mstr || ']'",
            out_col="new_members_json",
        ),
        # G1/G2 cascade: the reference's ≤3 bounded passes
        # (change_bot.rb:280-372) replayed as explicit CTE stages over
        # the same derived 3-level world.  Node deletes reuse the
        # nodes-only fold rule (verified equal to the real fold above);
        # members are kept exploded (one row per member), so removal is
        # an anti-join and emptiness is a count.
        "cascade_deletes": _with_pages(f"""
            , hist AS (
                SELECT p.url, p.doc_id, p.version, p.visible, s.accepted
                FROM pages p JOIN cs_status s USING (changeset_id)
                WHERE p.doc_id % 23 <> 0
            ),
            seg AS (
                SELECT *,
                       COALESCE(SUM(CASE WHEN NOT visible THEN 1 ELSE 0 END)
                           OVER (PARTITION BY url ORDER BY version
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS seg_id
                FROM hist
            ),
            summary AS (
                SELECT url, MAX(doc_id) AS doc_id,
                       SUM(CASE WHEN NOT visible THEN 1 ELSE 0 END) AS n_invis,
                       arg_max(visible, version) AS last_visible
                FROM seg GROUP BY url
            ),
            node_del AS (
                SELECT su.doc_id AS ref
                FROM summary su
                WHERE su.last_visible
                  AND NOT EXISTS (
                      SELECT 1 FROM seg v
                      WHERE v.url = su.url AND v.visible AND v.accepted
                        AND v.seg_id = su.n_invis
                  )
            ),
            docs AS (SELECT * FROM documents WHERE doc_id % 23 <> 0),
            ways AS (
                SELECT doc_id // 3 AS g,
                       {CASCADE_WAY_OFF} + doc_id // 3 AS way_id,
                       MIN(doc_id) AS min_doc,
                       arg_min(lang, doc_id) AS way_lang
                FROM docs GROUP BY 1, 2
            ),
            way_nodes AS (
                SELECT w.way_id, d.doc_id AS ref
                FROM docs d JOIN ways w ON d.doc_id // 3 = w.g
            ),
            way_hit AS (
                SELECT wn.way_id,
                       COUNT(*) AS n_total,
                       -- CAST: SUM(INTEGER) is HUGEINT in DuckDB; keep the
                       -- downstream n_total - n_removed arithmetic BIGINT
                       CAST(SUM(CASE WHEN nd.ref IS NOT NULL
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_removed
                FROM way_nodes wn LEFT JOIN node_del nd ON wn.ref = nd.ref
                GROUP BY wn.way_id
            ),
            way_out AS (
                SELECT way_id,
                       CAST(n_total - n_removed AS BIGINT) AS n_after,
                       n_removed > 0 AS touched,
                       (n_removed > 0 AND n_total - n_removed < 2) AS killed
                FROM way_hit
            ),
            way_del AS (SELECT way_id AS ref FROM way_out WHERE killed),
            rels AS (
                SELECT {CASCADE_REL_OFF} + g AS rel_id, way_id, min_doc,
                       way_lang
                FROM ways
            ),
            supers AS (
                SELECT {CASCADE_SUP_OFF} + MIN(rel_id) - {CASCADE_REL_OFF}
                           AS sup_id,
                       way_lang
                FROM rels GROUP BY way_lang
            ),
            rm0 AS (
                SELECT rel_id, 'node' AS mtype, min_doc AS ref FROM rels
                UNION ALL
                SELECT rel_id, 'way', way_id FROM rels
                UNION ALL
                SELECT s.sup_id, 'relation', r.rel_id
                FROM supers s JOIN rels r USING (way_lang)
            ),
            p1_hit AS (
                SELECT DISTINCT rm.rel_id FROM rm0 rm
                JOIN node_del d ON rm.mtype = 'node' AND rm.ref = d.ref
            ),
            rm1 AS (
                SELECT rm.* FROM rm0 rm
                LEFT JOIN node_del d ON rm.mtype = 'node' AND rm.ref = d.ref
                WHERE d.ref IS NULL
            ),
            del1 AS (
                SELECT h.rel_id FROM p1_hit h
                WHERE NOT EXISTS (SELECT 1 FROM rm1
                                  WHERE rm1.rel_id = h.rel_id)
            ),
            rm1b AS (
                SELECT * FROM rm1
                WHERE rel_id NOT IN (SELECT rel_id FROM del1)
            ),
            p2_hit AS (
                SELECT DISTINCT rm.rel_id FROM rm1b rm
                JOIN way_del d ON rm.mtype = 'way' AND rm.ref = d.ref
            ),
            rm2 AS (
                SELECT rm.* FROM rm1b rm
                LEFT JOIN way_del d ON rm.mtype = 'way' AND rm.ref = d.ref
                WHERE d.ref IS NULL
            ),
            del2 AS (
                SELECT h.rel_id FROM p2_hit h
                WHERE NOT EXISTS (SELECT 1 FROM rm2
                                  WHERE rm2.rel_id = h.rel_id)
            ),
            rel_del_acc AS (
                SELECT rel_id FROM del1 UNION SELECT rel_id FROM del2
            ),
            rm2b AS (
                SELECT * FROM rm2
                WHERE rel_id NOT IN (SELECT rel_id FROM rel_del_acc)
            ),
            p3_hit AS (
                SELECT DISTINCT rm.rel_id FROM rm2b rm
                JOIN rel_del_acc d
                  ON rm.mtype = 'relation' AND rm.ref = d.rel_id
            ),
            rm3 AS (
                SELECT rm.* FROM rm2b rm
                LEFT JOIN rel_del_acc d
                  ON rm.mtype = 'relation' AND rm.ref = d.rel_id
                WHERE d.rel_id IS NULL
            ),
            del3 AS (
                SELECT h.rel_id FROM p3_hit h
                WHERE NOT EXISTS (SELECT 1 FROM rm3
                                  WHERE rm3.rel_id = h.rel_id)
            ),
            rel_del_all AS (
                SELECT rel_id FROM del1 UNION SELECT rel_id FROM del2
                UNION SELECT rel_id FROM del3
            ),
            rel_touched AS (
                SELECT rel_id FROM p1_hit UNION SELECT rel_id FROM p2_hit
                UNION SELECT rel_id FROM p3_hit
            ),
            rel_edit AS (
                SELECT t.rel_id, CAST(COUNT(m.ref) AS BIGINT) AS n_after
                FROM rel_touched t
                LEFT JOIN rm3 m USING (rel_id)
                WHERE t.rel_id NOT IN (SELECT rel_id FROM rel_del_all)
                GROUP BY t.rel_id
            )
            SELECT 'node' AS etype, ref AS element_id,
                   'delete' AS outcome, CAST(-1 AS BIGINT) AS n_after
            FROM node_del
            UNION ALL
            SELECT 'way', way_id, 'edit', n_after FROM way_out
            WHERE touched AND NOT killed
            UNION ALL
            SELECT 'way', way_id, 'delete', -1 FROM way_out WHERE killed
            UNION ALL
            SELECT 'relation', rel_id, 'edit', n_after FROM rel_edit
            UNION ALL
            SELECT 'relation', rel_id, 'delete', -1 FROM rel_del_all
        """),
    }
    # the agg-strategy kNN is semantically identical to the window
    # variant (A/B-tested in test_spatial_scheduling.py); sharing the
    # oracle makes the driver hash-verify that equivalence every round
    d["knn_neighborhood_agg"] = d["knn_neighborhood"]
    # same A/B contract for the multipolygon PIP strategies: the
    # cell-prefiltered join must reproduce the sequential scan
    d["pip_multipolygons_prefiltered"] = d["pip_multipolygons"]
    return d
