"""J9 (region anti-proximity) + hot-cell salting tests."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest-sched", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_regions_available_anti_proximity(spark):  # run_bot.rb:41-57
    from openstreetmap_license_change_spark.operators import spatial

    cands = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.5, 1.5), (3, 10.0, 10.0), (4, 11.9, 10.0),
         (5, 12.1, 10.0)],
        "region_id int, lon double, lat double",
    )
    processing = spark.createDataFrame(
        [(0.5, 0.5), (10.0, 10.0)], "lon double, lat double"
    )
    out = spatial.regions_available(cands, processing)
    got = sorted(r.region_id for r in out.collect())
    # 1,2 within 2 deg of (0.5,0.5); 3,4 within 2 deg of (10,10);
    # 5 is 2.1 deg away in lon -> available
    assert got == [5]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan  # tiny lock table broadcasts


def test_salt_hot_cells_splits_and_preserves_totals(spark):
    from openstreetmap_license_change_spark.operators import spatial

    rows = [(f"u{i}", 7 if i < 900 else i % 5) for i in range(1000)]
    df = spark.createDataFrame(rows, "url string, cell int")
    salted = spatial.salt_hot_cells(df, hot_cells=[7], buckets=8)

    # hot cell fans out into up to 8 sub-keys; cold cells unchanged
    keys = {r.cell_salted for r in salted.select("cell_salted").distinct().collect()}
    hot_keys = {k for k in keys if k.startswith("7#")}
    assert 2 <= len(hot_keys) <= 8
    assert "3" in keys and "7" not in keys

    # two-stage aggregation over the salted key preserves exact totals
    stage1 = salted.groupBy("cell_salted").agg(
        F.count(F.lit(1)).alias("n"),
        F.split(F.col("cell_salted"), "#")[0].alias("cell"),
    )
    stage2 = stage1.groupBy("cell").agg(F.sum("n").alias("n"))
    got = {int(r.cell): r.n for r in stage2.collect()}
    assert got[7] == 900 and sum(got.values()) == 1000


def test_pip_prefiltered_equals_nested_loop(spark):
    """Cell-prefiltered PIP must select exactly the same (point, rect)
    pairs as the nested-loop broadcast join, including rect-boundary
    points, and must plan as a broadcast HASH join on the cell key."""
    from openstreetmap_license_change_spark.operators import spatial

    pts = spark.createDataFrame(
        [(f"p{i}", -180.0 + (i * 7.31) % 360.0, -90.0 + (i * 3.17) % 180.0)
         for i in range(2000)]
        + [("edge1", 0.0, 0.0), ("edge2", -45.0, 22.5), ("edge3", 179.99, 89.99)],
        "url string, lon double, lat double",
    )
    rects = spark.createDataFrame(
        [(r * 8 + c + 1, -180.0 + c * 45.0, -90.0 + r * 22.5,
          -180.0 + (c + 1) * 45.0, -90.0 + (r + 1) * 22.5)
         for r in range(8) for c in range(8)],
        "polygon_id INT, min_lon DOUBLE, min_lat DOUBLE, "
        "max_lon DOUBLE, max_lat DOUBLE",
    )
    a = {(r.url, r.polygon_id)
         for r in spatial.pip_join_rect(pts, rects).collect()}
    b = {(r.url, r.polygon_id)
         for r in spatial.pip_join_rect_prefiltered(pts, rects, 7.5).collect()}
    assert a == b and len(a) == 2003  # every point in exactly one rect

    plan = spatial.pip_join_rect_prefiltered(pts, rects, 7.5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_detect_hot_cells_finds_planted_skew(spark):
    """One planted mega-cell (1000 rows vs ~1/cell elsewhere) is
    detected; salting it then preserves aggregate totals."""
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import spatial

    base = spark.range(0, 200).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.col("id").alias("cell"),
    )
    hot = spark.range(0, 1000).select(
        F.concat(F.lit("h"), F.col("id")).alias("url"),
        F.lit(777000).alias("cell"),
    )
    df = base.unionByName(hot)
    detected = spatial.detect_hot_cells(df, skew_factor=8.0)
    assert detected == [777000]

    salted = spatial.salt_hot_cells(df, detected, buckets=8)
    agg = salted.groupBy("cell_salted").count()
    # the hot cell split into >1 sub-keys, and no rows were lost
    n_sub = agg.where(F.col("cell_salted").startswith("777000#")).count()
    assert 2 <= n_sub <= 8
    assert agg.agg(F.sum("count")).collect()[0][0] == 1200


def test_detect_hot_cells_uniform_returns_empty(spark):
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import spatial

    df = spark.range(0, 500).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 100).alias("cell"),
    )
    assert spatial.detect_hot_cells(df, skew_factor=8.0) == []


def test_knn_neighborhood_vs_bruteforce(spark):
    """3×3 neighbor-probed kNN == brute force restricted to the
    neighborhood, on random points; and it finds cross-boundary
    neighbors the cell-local variant misses."""
    import random

    from pyspark.sql import functions as F

    from openstreetmap_license_change_spark.operators import spatial

    rng = random.Random(7)
    res = 10.0
    cols = int(360 / res)
    dirty_rows = [
        (f"d{i}", rng.uniform(-179.9, 179.9), rng.uniform(-89.9, 89.9))
        for i in range(60)
    ]
    cand_rows = [
        (f"c{i}", rng.uniform(-179.9, 179.9), rng.uniform(-89.9, 89.9))
        for i in range(400)
    ]
    # plant a cross-boundary pair: dirty point just left of a cell
    # edge, candidate just right of it (cell-local would miss it)
    dirty_rows.append(("d_edge", 9.999, 0.5))
    cand_rows.append(("c_edge", 10.001, 0.5))
    # plant an ANTIMERIDIAN pair: 0.2° apart across ±180°.  With a raw
    # lon delta this pair joins (wrapped probe cell) but scores
    # (360-0.2)² and can never win a slot — the wrapped dist2 must
    # rank it first (ADVICE r3).
    dirty_rows.append(("d_anti", 179.9, 40.5))
    cand_rows.append(("c_anti", -179.9, 40.5))

    dirty = spark.createDataFrame(dirty_rows, "url string, lon double, lat double")
    clean = spark.createDataFrame(
        cand_rows, "cand_url string, lon double, lat double"
    )
    got = {}
    for r in spatial.knn_neighborhood(dirty, clean, k=3, res_deg=res).collect():
        got.setdefault(r.url, []).append((r.knn_rank, r.cand_url, r.dist2))

    import math

    def band(v, off):
        return math.floor((v + off) / res)

    def cell(lon, lat):
        return band(lat, 90.0) * cols + band(lon, 180.0)

    def neighborhood(lon, lat):
        lb, gb = band(lat, 90.0), band(lon, 180.0)
        out = set()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nl = lb + dy
                if 0 <= nl < int(180 / res):
                    out.add(nl * cols + (gb + dx + cols) % cols)
        return out

    def wdist2(lon, lat, cl, cla):
        d = abs(lon - cl)
        dl = min(d, 360.0 - d)  # antimeridian wrap, like the operator
        return dl * dl + (lat - cla) ** 2

    for url, lon, lat in dirty_rows:
        hood = neighborhood(lon, lat)
        cands = sorted(
            (
                (wdist2(lon, lat, cl, cla), cu)
                for cu, cl, cla in cand_rows
                if cell(cl, cla) in hood
            ),
        )[:3]
        want = [(i + 1, cu, d2) for i, (d2, cu) in enumerate(cands)]
        have = sorted(got.get(url, []))
        assert [(r, c) for r, c, _ in have] == [(r, c) for r, c, _ in want], url
        for (_, _, d_have), (_, _, d_want) in zip(have, want):
            assert abs(d_have - d_want) < 1e-9

    # A/B: the sort-free aggregation variant returns IDENTICAL rows
    # (same wrapped distance, same (dist2, id) tie-break)
    got_agg = {}
    for r in spatial.knn_neighborhood_agg(
        dirty, clean, k=3, res_deg=res
    ).collect():
        got_agg.setdefault(r.url, []).append((r.knn_rank, r.cand_url, r.dist2))
    assert {u: sorted(v) for u, v in got.items()} == {
        u: sorted(v) for u, v in got_agg.items()
    }

    # A/B: the join_hint=None fallback (Catalyst's sort-merge choice)
    # is a pure physical-strategy switch — identical rows
    got_smj = {}
    for r in spatial.knn_neighborhood(
        dirty, clean, k=3, res_deg=res, join_hint=None
    ).collect():
        got_smj.setdefault(r.url, []).append((r.knn_rank, r.cand_url, r.dist2))
    assert {u: sorted(v) for u, v in got.items()} == {
        u: sorted(v) for u, v in got_smj.items()
    }

    # the planted pair: neighborhood kNN finds it at rank 1
    assert got["d_edge"][0][1] == "c_edge"
    # the antimeridian pair: found at rank 1 with the WRAPPED distance
    # (0.2° apart), not the raw-delta (359.8°)² that could never win
    anti = sorted(got["d_anti"])
    assert anti[0][1] == "c_anti", anti
    assert abs(anti[0][2] - 0.2 * 0.2) < 1e-9, anti
    # ...and the cell-local variant does NOT see it
    dirty_cells = spatial.assign_cells(dirty, res_deg=res)
    clean_cells = spatial.assign_cells(clean, res_deg=res).select(
        "cell", "cand_url", "lon", "lat"
    )
    local = spatial.knn_in_cell(
        dirty_cells.where(F.col("url") == "d_edge").select(
            "url", "cell", "lon", "lat"
        ),
        clean_cells,
        k=3,
    )
    assert all(r.cand_url != "c_edge" for r in local.collect())


def test_tile_vectorize_bbox_and_centroid(spark):
    """Raster→vector: exact cell bounds + scaled-int centroid on a
    hand-built set spanning negative coords and cell edges."""
    from pyspark.sql import functions as F

    from openstreetmap_license_change_spark.operators import spatial

    rows = [
        # two points in the cell [-10,0)x[-10,0) at res 10
        (-9.5, -0.5), (-0.5, -9.5),
        # one point exactly on a cell corner (belongs to [0,10)x[0,10))
        (0.0, 0.0),
        # antimeridian-adjacent cell
        (-179.75, 89.25),
    ]
    df = spark.createDataFrame(rows, "lon double, lat double")
    out = {r.cell: r for r in spatial.tile_vectorize(df, res_deg=10.0).collect()}
    cols = 36

    def cell(lon, lat):
        import math

        return math.floor((lat + 90) / 10.0) * cols + math.floor((lon + 180) / 10.0)

    c1 = cell(-9.5, -0.5)
    r1 = out[c1]
    assert r1.n_points == 2
    assert (r1.cell_min_lon, r1.cell_min_lat) == (-10.0, -10.0)
    assert (r1.cell_max_lon, r1.cell_max_lat) == (0.0, 0.0)
    assert r1.centroid_lon == -5.0 and r1.centroid_lat == -5.0

    r2 = out[cell(0.0, 0.0)]
    assert r2.n_points == 1
    assert (r2.cell_min_lon, r2.cell_min_lat) == (0.0, 0.0)

    r3 = out[cell(-179.75, 89.25)]
    assert (r3.cell_min_lon, r3.cell_min_lat) == (-180.0, 80.0)
    assert r3.centroid_lon == -179.75 and r3.centroid_lat == 89.25

    # plan: single exchange, map-side partial aggregation
    plan = (
        spatial.tile_vectorize(df, res_deg=10.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # AQE wrapper may show one reused
    assert "partial_" in plan
