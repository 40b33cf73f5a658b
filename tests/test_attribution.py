"""Nearest-clean attribution operators (operators/spatial.py
nearest_attribution / knn_attribute_mode) + payload_cols threading in
both knn_neighborhood strategies."""

import random

import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("attribution-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _pts(spark, rows):
    return spark.createDataFrame(rows, "url string, lon double, lat double")


def _cands(spark, rows):
    return spark.createDataFrame(
        rows, "cand_url string, lon double, lat double, lang string"
    )


def _wrapped_dist2(a, b):
    dl = abs(a[0] - b[0])
    dl = min(dl, 360 - dl)
    return dl * dl + (a[1] - b[1]) ** 2


def test_nearest_matches_bruteforce_within_neighborhood(spark):
    rng = random.Random(7)
    pts = [(f"p{i}", rng.uniform(-179, 179), rng.uniform(-89, 89))
           for i in range(60)]
    cands = [(f"c{i}", rng.uniform(-179, 179), rng.uniform(-89, 89),
              rng.choice(["en", "de", "fr"])) for i in range(60)]
    res = 30.0
    got = {
        r.url: (r.cand_url, r.dist2, r.lang)
        for r in spatial.nearest_attribution(
            _pts(spark, pts), _cands(spark, cands), res_deg=res,
            payload_cols=("lang",),
        ).collect()
    }

    def cell(lon, lat):
        return (int((lat + 90) // res), int((lon + 180) // res) % 12)

    want = {}
    for u, plon, plat in pts:
        crow, ccol = cell(plon, plat)
        best = None
        for cu, clon, clat, lang in cands:
            r2, c2 = cell(clon, clat)
            if abs(r2 - crow) > 1 or min(abs(c2 - ccol),
                                         12 - abs(c2 - ccol)) > 1:
                continue
            key = (_wrapped_dist2((plon, plat), (clon, clat)), cu)
            if best is None or key < best[0]:
                best = (key, lang)
        if best is not None:
            want[u] = (best[0][1], best[0][0], best[1])
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], u
        assert got[u][1] == pytest.approx(want[u][1])
        assert got[u][2] == want[u][2]


def test_nearest_equals_knn_k1_both_strategies(spark):
    rng = random.Random(11)
    pts = _pts(spark, [(f"p{i}", rng.uniform(-50, 50), rng.uniform(-50, 50))
                       for i in range(40)])
    cands = _cands(spark, [(f"c{i}", rng.uniform(-50, 50),
                            rng.uniform(-50, 50), "xx")
                           for i in range(40)])
    near = {
        (r.url, r.cand_url)
        for r in spatial.nearest_attribution(
            pts, cands, res_deg=30.0).collect()
    }
    for strat in ("window", "agg"):
        k1 = {
            (r.url, r.cand_url)
            for r in spatial.knn_neighborhood(
                pts, cands, k=1, res_deg=30.0, strategy=strat,
                payload_cols=("lang",),
            ).collect()
        }
        assert k1 == near, strat


def test_payload_rides_without_changing_ranking(spark):
    pts = _pts(spark, [("p", 0.0, 0.0)])
    # same dist2 is impossible here; payload sorts AFTER cand id anyway:
    # two candidates, nearer one has the lexicographically LARGER lang
    cands = _cands(spark, [("a", 1.0, 0.0, "zz"), ("b", 2.0, 0.0, "aa")])
    for strat in ("window", "agg"):
        rows = spatial.knn_neighborhood(
            pts, cands, k=2, res_deg=30.0, strategy=strat,
            payload_cols=("lang",),
        ).orderBy("knn_rank").collect()
        assert [(r.cand_url, r.lang) for r in rows] == [("a", "zz"),
                                                        ("b", "aa")]


def test_mode_vote_deterministic_tiebreak(spark):
    pts = _pts(spark, [("p", 0.0, 0.0)])
    # 2 votes de (nearer), 2 votes en — tie at k=4 breaks to "de"
    cands = _cands(spark, [
        ("c1", 1.0, 0.0, "de"), ("c2", 2.0, 0.0, "en"),
        ("c3", 3.0, 0.0, "de"), ("c4", 4.0, 0.0, "en"),
        ("c5", 5.0, 0.0, "en"),  # outside k=4, must not count
    ])
    rows = spatial.knn_attribute_mode(
        pts, cands, attr_col="lang", k=4, res_deg=30.0
    ).collect()
    assert [(r.url, r.lang, r.votes) for r in rows] == [("p", "de", 2)]


def test_nearest_attribution_plan_partial_aggregates(spark):
    """The argmin must be a partial-aggregating min (shuffle carries
    ≤1 row per point per task), with no Window/rank machinery — the
    whole point vs knn k=1.  (Struct buffers plan as SortAggregate,
    not HashAggregate — documented in the operator.)"""
    pts = _pts(spark, [("p", 0.0, 0.0)])
    cands = _cands(spark, [("c", 1.0, 0.0, "en")])
    plan = spatial.nearest_attribution(
        pts, cands, res_deg=30.0, payload_cols=("lang",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan
